"""Text-analysis operators over the ``documents`` table.

Language-ID, quality scoring, token counting, fingerprinting — the
per-document column passes a training-data pipeline runs before dedup and
filtering. All column-expression compositions of functions/text.py, i.e.
one map-only whole-stage-codegen pass over the corpus; at 100 TB this is
scan-bound, exactly what you want.

Reference analogs: HTML-strip + casefold + size-gate single pass
(utils/utils.py:352-403), completeness scoring (utils/utils.py:265-349),
placeholder-term filter (utils/utils.py:34-66).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX


def analyze(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One-pass per-document analysis: token count, predicted language,
    quality score, fingerprint, simhash."""
    toks = TX.tokens(F.col(text_col))
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        TX.lang_id(F.col(text_col)).alias("lang_pred"),
        TX.quality_score(F.col(text_col)).alias("quality"),
        TX.fingerprint(F.col(text_col)).alias("fingerprint"),
        TX.simhash16(toks).alias("simhash"),
    )


def quality_filter(
    docs: DataFrame, text_col: str = "text", min_tokens: int = 10, min_quality: float = 0.4
) -> DataFrame:
    """Drop low-quality rows (the placeholder/size-gate analog)."""
    return docs.filter(
        (TX.token_count(F.col(text_col)) >= min_tokens)
        & (TX.quality_score(F.col(text_col)) >= min_quality)
    )


def lang_agreement(docs: DataFrame, text_col: str = "text", lang_col: str = "lang") -> DataFrame:
    """Diagnostics: predicted-vs-labeled language confusion counts
    (group-and-count diagnostics analog, zenodo/files/zenodo.py:291-293)."""
    return (
        docs.select(F.col(lang_col).alias("lang_label"), TX.lang_id(F.col(text_col)).alias("lang_pred"))
        .groupBy("lang_label", "lang_pred")
        .agg(F.count("*").alias("n"))
    )


def html_strip(col: F.Column) -> F.Column:
    """Strip HTML tags, <br> -> newline (utils/utils.py:379-385 analog —
    regexp-only; full lxml fidelity would be a pandas UDF, not needed for
    the synthetic corpus)."""
    brs = F.regexp_replace(col, r"(?i)<br\s*/?>", "\n")
    return F.trim(F.regexp_replace(brs, r"<[^>]+>", ""))
