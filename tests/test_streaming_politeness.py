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


def test_run_vectorized_bucket_matches_per_row_loop():
    """The refill-run closed form must be BIT-IDENTICAL to the per-row
    token-bucket loop it replaced (decisions, tokens_left, final state),
    including ties in asof_s, out-of-order times (no refill on backward
    rows), burst clamping, and the infinite-rate path."""
    import numpy as np

    BURST = 4.0

    def per_row(times, tokens, last_refill, rate):
        decisions, toks, emitted = [], [], 0
        for now in times:
            if now > last_refill:
                tokens = min(BURST, tokens + (now - last_refill) * rate)
                last_refill = now
            if tokens >= 1.0:
                tokens -= 1.0
                emitted += 1
                decisions.append(True)
            else:
                decisions.append(False)
            toks.append(tokens)
        return decisions, toks, tokens, last_refill, emitted

    from nde_crawlers_spark.streaming.politeness import bucket_schedule

    def run_vectorized(times, tokens, last_refill, rate):
        d, tk, tok, lr, em = bucket_schedule(times, tokens, last_refill, 0, rate)
        return d, tk, tok, lr, em

    rng = np.random.default_rng(7)
    for rate in (2.0, 0.37, float("inf")):
        for trial in range(30):
            n = int(rng.integers(1, 200))
            # duplicate-heavy, occasionally backward times
            base = np.sort(rng.choice(np.arange(0, 20, 0.5), size=n))
            if trial % 3 == 0:
                rng.shuffle(base)  # out-of-order event times
            tokens0 = float(rng.uniform(0, 4))
            lr0 = float(rng.uniform(0, 5))
            a = per_row(base, tokens0, lr0, rate)
            b = run_vectorized(base, tokens0, lr0, rate)
            assert a[0] == b[0], (rate, trial)
            assert a[1] == b[1], (rate, trial)          # exact float equality
            assert (a[2], a[3], a[4]) == (b[2], b[3], b[4])
