"""Per-source uploader registry — the reference's 51 uploader chains as data.

Every reference source ships an uploader whose ``load_data`` is a chain
of the same stage vocabulary in per-source order (SURVEY §2.11;
e.g. zenodo/uploader.py: version-merge -> doi promote -> wrapper;
ncbi_sra: fan-out -> wrapper; pubtator-enriched sources: reclassify ->
wrapper). Here the registry IS that mapping: each spec names the column
transformations its source family needs, and ``run_uploader`` dispatches
rows by their ``source`` value and applies the right chain — one
DataFrame program, no per-source processes.

Scale shape: every stage is a row-local projection or an operator from
``operators/`` with its own audited plan; the dispatch itself is a
filter-union (Catalyst collapses the common scan), so adding a source is
adding a dict entry, not a container.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators import nde_schema as NS
from .operators import wrapper as W


@dataclass
class UploaderSpec:
    """One source family's chain: which optional stages run, in the
    reference's canonical order (corrections -> source stages ->
    wrapper)."""
    promote_doi: bool = False            # zenodo-style doi -> _id
    placeholder_fields: list[str] = field(default_factory=list)  # entity cols to scrub
    casefold_id: bool = True             # utils.py:394 — every uploader
    extra: dict = field(default_factory=dict)


UPLOADERS: dict[str, UploaderSpec] = {
    # zenodo-like: versioned records carry DOIs -> promote
    "src0": UploaderSpec(promote_doi=True),
    "src1": UploaderSpec(promote_doi=True),
    # geo/sra-like: plain records, placeholder-scrubbed keywords
    "src2": UploaderSpec(placeholder_fields=["author"]),
    "src3": UploaderSpec(placeholder_fields=["author"]),
}
DEFAULT_SPEC = UploaderSpec()


def run_uploader(docs: DataFrame, source_col: str = "source") -> DataFrame:
    """Apply each source's chain to its rows and union the results
    (unionByName — the merge_struct schema-union analog). ``docs`` must
    carry ``_id``, ``doi`` (array<string>), ``author``
    (array<struct<name,identifier>>) and the source column; unknown
    sources get the default chain."""
    sources = [r[0] for r in docs.select(source_col).distinct().collect()]
    parts: list[DataFrame] = []
    for src in sorted(sources):
        spec = UPLOADERS.get(src, DEFAULT_SPEC)
        part = docs.filter(F.col(source_col) == src)
        if spec.promote_doi:
            new_id, new_doi = NS.promote_doi_id(F.col("_id"), F.col("doi"))
            part = part.withColumn("_id", new_id).withColumn("doi", new_doi)
        for c in spec.placeholder_fields:
            part = part.withColumn(c, W.placeholder_filter(F.col(c)))
        if spec.casefold_id:
            part = part.withColumn("_id", W.casefold_id(F.col("_id")))
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
