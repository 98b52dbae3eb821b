"""Fetch dispatch: Arrow-batched pandas-UDF fetcher with bounded retries.

The reference fetches with Twisted-async Scrapy downloaders or
requests+retry decorators (utils/utils.py:69-100); throughput is
politeness-bound, not CPU-bound. Here fetch is a ``mapInPandas`` stage
over the round's selected URLs, repartitioned by host_bucket so one task
owns a host's batch (the analog of AUTOTHROTTLE_TARGET_CONCURRENCY=1.0 —
no two tasks hit the same host concurrently) and rows are ordered by the
frontier's total order inside each batch.

In the sandbox the "network" is the deterministic synthetic corpus
(sources/synthetic.py); on a real cluster the body of ``_fetch_batch``
swaps for an HTTP client with the same (status, attempts, kind, body,
bytes) contract — the Spark plumbing (schema, partitioning, batching,
lineage metrics) is identical.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.synthetic import synth_fetch

FETCH_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.StringType()),
        T.StructField("canonical_url", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("host_bucket", T.IntegerType()),
        T.StructField("priority", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("attempts", T.IntegerType()),
        T.StructField("kind", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField("bytes", T.LongType()),
        T.StructField("fetch_wall_ms", T.LongType()),
    ]
)


def fetch_selected(selected: DataFrame, num_hosts: int, max_attempts: int = 3) -> DataFrame:
    """Fetch the round's selected URLs.

    ``repartition(host_bucket)`` co-locates each host in one task;
    ``sortWithinPartitions`` applies the politeness order so a real
    fetcher would issue requests in frontier order with inter-request
    delays. Wall time is recorded per batch for the lineage table.
    """

    def _fetch_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            t0 = time.monotonic()
            recs = [synth_fetch(u, num_hosts, max_attempts) for u in pdf["canonical_url"]]
            wall = int((time.monotonic() - t0) * 1000)
            out = pd.DataFrame(
                {
                    "url_hash": pdf["url_hash"].values,
                    "canonical_url": pdf["canonical_url"].values,
                    "host": pdf["host"].values,
                    "host_bucket": pdf["host_bucket"].values,
                    "priority": pdf["priority"].values,
                    "seq": pdf["seq"].values,
                    "status": [r["status"] for r in recs],
                    "attempts": [r["attempts"] for r in recs],
                    "kind": [r["kind"] for r in recs],
                    "body": [r["body"] for r in recs],
                    "bytes": [r["bytes"] for r in recs],
                    "fetch_wall_ms": wall,
                }
            )
            yield out

    cols = selected.select(
        "url_hash", "canonical_url", "host", "host_bucket", "priority", "seq"
    )
    return (
        cols.repartition(F.col("host_bucket"))
        .sortWithinPartitions("host", "priority", "seq", "url_hash")
        .mapInPandas(_fetch_batch, schema=FETCH_SCHEMA)
    )
