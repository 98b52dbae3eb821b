"""Bucketed seen-table co-partitioning: the join against a table bucketed
by url_hash must plan with no Exchange (shuffle) on the bucketed side —
the property that makes the per-round seen anti-join feasible at 10^10
URLs (PLANS.md shuffle inventory)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nde_crawlers_spark.operators import seen as SN


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_seen_join_has_no_exchange_on_build_side(spark):
    seen = spark.range(5000).select(F.sha2(F.col("id").cast("string"), 256).alias("url_hash"))
    SN.write_seen_bucketed(seen, "url_seen_bucketed", buckets=8)
    cand = spark.range(2000, 7000).select(
        F.sha2(F.col("id").cast("string"), 256).alias("url_hash")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        bucketed = spark.table("url_seen_bucketed")
        joined = cand.join(bucketed, "url_hash", "left_anti")
        plan = _plan(joined)
        # probe side shuffles to align with the 8 buckets; bucketed side must not
        assert plan.count("Exchange hashpartitioning") == 1, plan
        # and results are correct
        assert joined.count() == 2000
        # control: the same join against a non-bucketed table shuffles both sides
        plain = cand.join(seen, "url_hash", "left_anti")
        assert _plan(plain).count("Exchange hashpartitioning") == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS url_seen_bucketed")
