"""Stateful streaming politeness: token-bucket decisions, rate cap, and
state persistence across restarted availableNow queries (checkpoint)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from nde_crawlers_spark.streaming.politeness import schedule_with_state

CAND_SCHEMA = "host string, url_hash string, priority int, seq long, asof_s double"


def _write_batch(spark, src_dir: str, name: str, rows: list[tuple]) -> None:
    spark.createDataFrame(rows, CAND_SCHEMA).coalesce(1).write.mode("append").parquet(
        os.path.join(src_dir)
    )
    del name


def _run(spark, src_dir: str, out_dir: str, ckpt: str) -> None:
    stream = spark.readStream.schema(CAND_SCHEMA).parquet(src_dir)
    q = (
        schedule_with_state(stream, crawl_delay_ms=1000)  # 1 token/sec, burst 4
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_token_bucket_rate_and_checkpoint_resume(spark):
    src = tempfile.mkdtemp(prefix="pol_src_")
    out = tempfile.mkdtemp(prefix="pol_out_")
    ckpt = tempfile.mkdtemp(prefix="pol_ck_")

    # batch 1: 6 urls for host-a at t=0 -> burst of 4 fetches, 2 deferred
    rows1 = [("host-a", f"u{i:02d}", i % 3, i, 0.0) for i in range(6)]
    _write_batch(spark, src, "b1", rows1)
    _run(spark, src, out, ckpt)
    res1 = spark.read.parquet(out)
    fetched1 = res1.filter(F.col("decision") == "fetch").count()
    assert fetched1 == 4 and res1.count() == 6

    # batch 2: 3 more urls at t=2 -> bucket refilled by 2 tokens ONLY if
    # state survived the restart (fresh state would grant a 4-burst)
    rows2 = [("host-a", f"v{i}", 0, 100 + i, 2.0) for i in range(3)]
    _write_batch(spark, src, "b2", rows2)
    _run(spark, src, out, ckpt)
    res2 = spark.read.parquet(out).filter(F.col("url_hash").startswith("v"))
    decisions = {r["url_hash"]: r["decision"] for r in res2.collect()}
    assert sorted(decisions.values()) == ["defer", "fetch", "fetch"], decisions

    # ordering: fetches go to the best (priority, seq) urls of batch 1
    got_fetch = {
        r["url_hash"]
        for r in res1.filter(F.col("decision") == "fetch").collect()
    }
    expect = {u for u, _p, _s in sorted(((f"u{i:02d}", i % 3, i) for i in range(6)), key=lambda x: (x[1], x[2]))[:4]}
    assert got_fetch == expect
