"""Per-source uploader registry — the reference's 51 uploader chains as data.

Every reference source ships an uploader whose ``load_data`` is a chain
over the same stage vocabulary in per-source order (SURVEY §2.11). The
chains group into a handful of FAMILIES; the registry maps each source to
its family's spec and ``run_uploader`` applies every chain in one
DataFrame program:

- zenodo family  (zenodo/files/uploader.py:27-111): records carry DOIs ->
  version merge happens upstream, the uploader promotes single DOIs into
  ``_id`` (utils/utils.py:189-204 merge_duplicates).
- immport family (hub/dataload/sources/immport/uploader.py:27-40:
  ``standardize_data -> standardize_funding -> ...``): PubTator
  species/infectiousAgent reclassification (utils/pubtator.py:839-927)
  plus the funder lookup (utils/funding_helper.py).
- ncbi_sra family (ncbi_sra/uploader.py + utils/lineage.py:140-307):
  taxonomy lineage annotation into ``_meta.lineage``.
- pubtator-NER family (utils/extract.py:23-59 ADVANCED_DROP_RULES):
  heuristic entity drops incl. subtree rules.
- geo family (ncbi_geo/uploader.py): placeholder-term scrubbing of
  entity lists (utils/utils.py:34-66).
- every uploader ends in the wrapper's ``_id`` casefold (utils.py:394).

Scale shape — the two dispatch classes:

1. **Row-local stages** (doi promote, placeholder scrub, casefold) are
   ``when(source IN family)`` column expressions — ONE scan and one
   codegen'd projection regardless of how many sources the registry
   holds. No filter-union, no per-source branch in the plan.
2. **Operator stages** (reclassify, lineage, drop rules, funding) each
   run ONCE over the subset of rows whose family opted in and join back
   on the doc id — cost is one subset scan + one join per stage KIND
   (bounded vocabulary, ~4), never per source. The funding lookup is a
   broadcast join on the full frame (no subset scan at all), masked to
   the family.

Adding a source is adding a dict entry; the physical plan's scan count
does not change (tests/test_enrichment_plans.py::test_uploader_plan_scans).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators import lineage as LN
from .operators import nde_schema as NS
from .operators import standardize as SD
from .operators import wrapper as W

_ENTITY_SQL = "array<struct<name:string,identifier:string>>"
_NER_SQL = "array<struct<name:string,taxid:int>>"
_LIN_SQL = "array<struct<taxon:int,parent_taxon:int>>"


@dataclass(frozen=True)
class UploaderSpec:
    """One source family's chain: which stages run, in the reference's
    canonical order (source stages -> doi promote -> wrapper casefold)."""
    family: str = "default"
    promote_doi: bool = False            # zenodo-style doi -> _id
    placeholder_fields: tuple[str, ...] = ()  # geo-style entity-col scrub
    reclassify: bool = False             # pubtator species/agent standardization
    lineage: bool = False                # taxonomy _meta.lineage annotation
    drop_rules: bool = False             # NER heuristic drops (+subtrees)
    funding: bool = False                # funder lookup enrichment
    casefold_id: bool = True             # utils.py:394 — every uploader


UPLOADERS: dict[str, UploaderSpec] = {
    # zenodo-like: versioned records carry DOIs -> promote into _id
    "src0": UploaderSpec(family="zenodo", promote_doi=True),
    "src1": UploaderSpec(family="zenodo", promote_doi=True),
    # geo/sra-like: plain records, placeholder-scrubbed author entities
    "src2": UploaderSpec(family="geo", placeholder_fields=("author",)),
    "src3": UploaderSpec(family="geo", placeholder_fields=("author",)),
    # immport-like: PubTator reclassification + funder standardization
    "src4": UploaderSpec(family="immport", reclassify=True, funding=True),
    "src5": UploaderSpec(family="immport", reclassify=True, funding=True),
    # ncbi_sra-like: taxonomy lineage annotation
    "src6": UploaderSpec(family="ncbi_sra", lineage=True),
    "src7": UploaderSpec(family="ncbi_sra", lineage=True),
    # pubtator-NER-like: heuristic entity drop rules
    "src8": UploaderSpec(family="pubtator_ner", drop_rules=True),
    "src9": UploaderSpec(family="pubtator_ner", drop_rules=True),
}
DEFAULT_SPEC = UploaderSpec()


def _family(registry: dict[str, UploaderSpec], pred) -> list[str]:
    return sorted(s for s, sp in registry.items() if pred(sp))


def run_uploader(
    docs: DataFrame,
    registry: dict[str, UploaderSpec] | None = None,
    *,
    species_lookup: DataFrame | None = None,
    closure: DataFrame | None = None,
    ner_rules: list[dict] | None = None,
    funding_lookup: DataFrame | None = None,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply each source's registered chain to its rows — one lazy plan.

    ``docs`` must carry ``_id``; stage columns are required only when a
    registered family uses the stage: ``doi`` (array<string>) for doi
    promotion, entity columns for placeholder scrubbing,
    ``species``/``infectiousAgent`` for reclassification, ``taxids`` for
    lineage, ``ner`` (array<struct<name,taxid>>) for drop rules, and
    ``funding_id`` for the funder lookup. Unknown sources get the
    default chain (casefold only)."""
    reg = registry if registry is not None else UPLOADERS
    out = docs

    # ---- operator stages: one subset + one join per stage KIND --------
    # Subsets are carved from the ORIGINAL frame (stage inputs are
    # original columns), so stage plans stay independent and the base is
    # scanned 1 + #operator-stage-kinds times total.
    rs = _family(reg, lambda sp: sp.reclassify)
    if rs and species_lookup is not None and {"species", "infectiousAgent"} <= set(docs.columns):
        sub = docs.filter(F.col(source_col).isin(rs)).select(
            id_col, "species", "infectiousAgent"
        )
        red = SD.reclassify_species(sub, species_lookup).select(
            id_col,
            F.col("species").alias("__r_species"),
            F.col("infectiousAgent").alias("__r_agents"),
        )
        in_f = F.col(source_col).isin(rs)
        out = (
            out.join(red, id_col, "left")
            .withColumn("species", F.when(in_f, F.col("__r_species")).otherwise(F.col("species")))
            .withColumn(
                "infectiousAgent",
                F.when(in_f, F.col("__r_agents")).otherwise(F.col("infectiousAgent")),
            )
            .drop("__r_species", "__r_agents")
        )

    ls = _family(reg, lambda sp: sp.lineage)
    if ls and closure is not None and "taxids" in docs.columns:
        sub = docs.filter(F.col(source_col).isin(ls)).select(id_col, "taxids")
        lin = LN.expand_lineage(sub, closure).select(
            id_col, F.col("_meta_lineage").alias("__lin")
        )
        out = (
            out.join(lin, id_col, "left")
            .withColumn(
                "_meta_lineage",
                F.when(F.col(source_col).isin(ls), F.col("__lin")).otherwise(
                    F.array().cast(_LIN_SQL)
                ),
            )
            .drop("__lin")
        )

    ds = _family(reg, lambda sp: sp.drop_rules)
    if ds and ner_rules and "ner" in docs.columns:
        sub = (
            docs.filter(F.col(source_col).isin(ds))
            .select(id_col, F.posexplode("ner").alias("pos", "e"))
            .select(id_col, "pos", F.col("e.name").alias("name"), F.col("e.taxid").alias("taxid"))
        )
        kept = SD.apply_drop_rules(sub, ner_rules, closure, id_col=id_col)
        regrouped = kept.groupBy(id_col).agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "name", "taxid"))),
                lambda s: F.struct(
                    s.getField("name").alias("name"), s.getField("taxid").alias("taxid")
                ),
            ).alias("__ner")
        )
        in_f = F.col(source_col).isin(ds)
        out = (
            out.join(regrouped, id_col, "left")
            .withColumn(
                "ner",
                F.when(in_f, F.coalesce(F.col("__ner"), F.array().cast(_NER_SQL))).otherwise(
                    F.col("ner")
                ),
            )
            .drop("__ner")
        )

    fs = _family(reg, lambda sp: sp.funding)
    if fs and funding_lookup is not None and "funding_id" in out.columns:
        # broadcast join on the whole frame (no subset scan), masked to
        # the family — the funder_cache hit path (utils/funding_helper.py)
        out = out.join(F.broadcast(funding_lookup), on="funding_id", how="left").withColumn(
            "funder_name",
            F.when(F.col(source_col).isin(fs), F.col("funder_name")).otherwise(
                F.lit(None).cast("string")
            ),
        )

    # ---- row-local stages: when() dispatch, zero extra scans ----------
    dois = _family(reg, lambda sp: sp.promote_doi)
    if dois and "doi" in out.columns:
        new_id, new_doi = NS.promote_doi_id(F.col("_id"), F.col("doi"))
        in_f = F.col(source_col).isin(dois)
        out = out.withColumn("_id", F.when(in_f, new_id).otherwise(F.col("_id"))).withColumn(
            "doi", F.when(in_f, new_doi).otherwise(F.col("doi"))
        )

    scrub: dict[str, list[str]] = {}
    for s, sp in reg.items():
        for c in sp.placeholder_fields:
            if c in out.columns:  # stage inputs a source family may lack
                scrub.setdefault(c, []).append(s)
    for c, srcs in sorted(scrub.items()):
        out = out.withColumn(
            c,
            F.when(
                F.col(source_col).isin(sorted(srcs)), W.placeholder_filter(F.col(c))
            ).otherwise(F.col(c)),
        )

    folds = _family(reg, lambda sp: sp.casefold_id)
    if DEFAULT_SPEC.casefold_id:
        unknown_is_folded = ~F.col(source_col).isin(list(reg)) | F.col(source_col).isin(folds)
    else:
        unknown_is_folded = F.col(source_col).isin(folds)
    out = out.withColumn(
        "_id", F.when(unknown_is_folded, W.casefold_id(F.col("_id"))).otherwise(F.col("_id"))
    )
    return out
