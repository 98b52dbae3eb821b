"""Cross-source merge/dedup joins — the builder layer.

Spark-first re-expressions of the reference's MongoDB merge pipeline:

- ``priority_merge``      <- merge_order last-writer-wins by source rank
                            (hub/databuild/builder.py:13-32)
- ``version_group_merge`` <- Zenodo version self-merge: keep max-date doc
                            per versionId, union the losers' arrays
                            (hub/dataload/sources/zenodo/uploader.py:27-111)
- ``key_dedup_1x1``       <- cross-source DOI dedup with the 1x1-group
                            guard (builder.py:34-160: only merge when the
                            key maps to exactly one doc on each side)

All are window/groupBy compositions — no custom shuffle logic; Catalyst
plans them as hash aggregations / sort-merge joins and AQE handles skewed
keys (a viral DOI shared by thousands of records).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def priority_merge(docs: DataFrame, key: Column, rank: Column, id_col: str = "doc_id") -> DataFrame:
    """Last-writer-wins by source rank: per merge key keep the row with the
    highest rank (ties -> lowest id, deterministic). Mirrors merge_order
    moving priority sources last so their upsert wins."""
    w = Window.partitionBy(key.alias("__k")).orderBy(
        rank.desc(), F.col(id_col).asc()
    )
    return (
        docs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def version_group_merge(
    docs: DataFrame,
    group_cols: list[str],
    date_col: Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per version group keep the doc with max date (tie -> min id) and
    collect the merged member list (the sameAs/distribution union analog):
    returns group cols + keep_id + keep_date + member_ids + group_size."""
    w = Window.partitionBy(*group_cols).orderBy(date_col.desc(), F.col(id_col).asc())
    ranked = docs.withColumn("__rn", F.row_number().over(w)).withColumn("__d", date_col)
    return (
        ranked.groupBy(*group_cols)
        .agg(
            F.min(F.when(F.col("__rn") == 1, F.struct(F.col(id_col).alias("id"), F.col("__d").alias("d")))).alias("keep"),
            F.array_sort(F.collect_list(F.col(id_col))).alias("member_ids"),
            F.count("*").alias("group_size"),
        )
        .select(
            *group_cols,
            F.col("keep.id").alias("keep_id"),
            F.col("keep.d").alias("keep_date"),
            "member_ids",
            "group_size",
        )
    )


def key_dedup_1x1(
    side_a: DataFrame, side_b: DataFrame, key_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Cross-source key dedup with the reference's 1x1 guard: a key merges
    only when exactly one doc holds it on each side; ambiguous groups are
    skipped (and logged by count in the reference, builder.py:126-134).
    Returns (key, keep_id, drop_id) — survivor from side_a, loser from b.
    """
    a1 = (
        side_a.groupBy(key_col)
        .agg(F.count("*").alias("na"), F.min(id_col).alias("keep_id"))
        .filter(F.col("na") == 1)
    )
    b1 = (
        side_b.groupBy(key_col)
        .agg(F.count("*").alias("nb"), F.min(id_col).alias("drop_id"))
        .filter(F.col("nb") == 1)
    )
    return a1.join(b1, key_col).select(key_col, "keep_id", "drop_id")
