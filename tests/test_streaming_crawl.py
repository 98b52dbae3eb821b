"""Streaming crawl pipeline: scheduler -> foreachBatch fetch+parse with
persistent seen table, deferred re-emission, and incremental second
drain that does not re-fetch."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from nde_crawlers_spark.sources.synthetic import make_seeds
from nde_crawlers_spark.streaming.crawl_stream import StreamingCrawl


def _write_candidates(spark, root: str, name: str, rows: list[tuple]) -> None:
    del name  # file-stream sources don't recurse: append flat part files
    spark.createDataFrame(rows, "url string, priority int, asof_s double").coalesce(1) \
        .write.mode("append").parquet(os.path.join(root, "candidates"))


def test_streaming_crawl_drain_and_incremental(spark):
    root = tempfile.mkdtemp(prefix="scrawl_")
    sc = StreamingCrawl(spark, root, num_hosts=10, crawl_delay_ms=500)

    seeds = make_seeds(30, 10)
    _write_candidates(spark, root, "b1", [(s["url"], s["priority"], 0.0) for s in seeds])
    sc.run_available_now()

    docs1 = sc.documents()
    n1 = docs1.count()
    seen1 = {r["url_hash"] for r in sc.seen().collect()}
    assert n1 > 0
    assert len(seen1) >= n1  # failures are seen but produce no doc
    # spans well-formed
    row = docs1.first()
    kinds = [s["kind"] for s in row["spans"]]
    assert kinds[:2] == ["title", "description"]
    # politeness: hosts over budget got deferred
    assert sc.deferred().count() + len(seen1) == 30

    # second drain with NEW candidates + a repeat of already-seen URLs:
    # repeats must not re-fetch (seen table), new ones must
    more = make_seeds(60, 10)[30:]
    repeat = seeds[:5]
    _write_candidates(
        spark, root, "b2",
        [(s["url"], s["priority"], 10.0) for s in more + repeat],
    )
    sc.run_available_now()
    seen2 = {r["url_hash"] for r in sc.seen().collect()}
    assert seen1 <= seen2
    assert len(seen2) > len(seen1)
    # no url_hash appears in two seen batches (never fetched twice)
    dup = (
        sc.seen().groupBy("url_hash").count().filter(F.col("count") > 1).count()
    )
    assert dup == 0
