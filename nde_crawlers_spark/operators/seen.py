"""URL-seen filter: exact left-anti join + bloom prefilter.

Replaces the reference's record-seen structure — a SQLite
``cache(_id TEXT PRIMARY KEY)`` with upsert-on-conflict
(figshare_oai-pmh/files/sql_database.py:158-164,229-235) and the in-memory
cache-miss set difference ``[p for p in pmids if p not in cached]``
(utils/pmid_helper.py:770-771).

Scale design (10^10 URLs): the seen set cannot be a broadcast, so:

1. **Exact path** — ``candidates LEFT ANTI JOIN seen ON url_hash``. Both
   sides hash-partition on url_hash; with the seen table stored bucketed
   by url_hash (Iceberg bucket transform in production) the join is
   co-partitioned and shuffle-free on the big side. AQE handles skew.
2. **Bloom prefilter** — a per-round bloom built over the seen deltas via
   Spark's native ``bloom_filter_agg`` cuts the anti-join's probe-side
   shuffle by ~the hit rate: definite-new URLs skip the join entirely,
   only might-contain positives go to the exact join for confirmation
   (false positives never drop a URL — the exact join has the final say).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_unseen_exact(candidates: DataFrame, seen: DataFrame, key: str = "url_hash") -> DataFrame:
    """Exact unseen filter: left-anti join on the hash key."""
    return candidates.join(seen.select(key).distinct(), on=key, how="left_anti")


def build_bloom(seen: DataFrame, key: str = "url_hash", expected: int = 1_000_000, fpp: float = 0.03):
    """Aggregate the seen keys into a single bloom filter (JVM-side,
    Spark's BloomFilterAggregate over xxhash64 of the key). Returns the
    one-row binary; None if the native expression is unavailable."""
    nbits = max(int(-expected * 2.08 * __import__("math").log(fpp)), 64)
    try:
        row = seen.select(
            F.expr(f"bloom_filter_agg(xxhash64({key}), cast({expected} as long), cast({nbits} as long))").alias("bf")
        ).first()
        return row["bf"]
    except Exception:
        return None


def filter_unseen_bloom(
    candidates: DataFrame,
    seen: DataFrame,
    key: str = "url_hash",
    expected: int = 1_000_000,
) -> DataFrame:
    """Bloom-prefiltered unseen filter.

    definite_new  = candidates where NOT might_contain(bloom, key)
    maybe_seen    = the rest -> confirmed via exact anti-join
    result        = definite_new UNION confirmed_new  (exact semantics)

    Falls back to the exact path when bloom_filter_agg isn't available.
    """
    bf = build_bloom(seen, key=key, expected=expected)
    if bf is None:
        return filter_unseen_exact(candidates, seen, key)
    probed = candidates.withColumn(
        "__maybe_seen", F.expr(f"might_contain(X'{bf.hex()}', xxhash64({key}))")
    )
    definite_new = probed.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
    maybe = probed.filter(F.col("__maybe_seen")).drop("__maybe_seen")
    confirmed_new = filter_unseen_exact(maybe, seen, key)
    return definite_new.unionByName(confirmed_new)
