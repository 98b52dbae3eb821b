"""Cuckoo filter: no false negatives, bounded false positives, delete
re-admits keys (the TTL-recrawl property blooms lack), serialization
round-trip, and Spark integration as a seen prefilter."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from nde_crawlers_spark.operators.cuckoo import CuckooFilter


def _hashes(lo: int, hi: int) -> np.ndarray:
    return (np.arange(lo, hi, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ np.uint64(42)


def test_cuckoo_basic_properties():
    cf = CuckooFilter(capacity=10_000)
    seen = _hashes(0, 10_000)
    assert cf.insert_hashes(seen) == 10_000
    assert cf.contains_hashes(seen).all()  # no false negatives
    fresh = _hashes(1_000_000, 1_020_000)
    fp = cf.contains_hashes(fresh).sum()
    assert fp < 100  # ~2^-16 * slots-probed per key, generous bound

    # delete -> key reads as unseen again (TTL recrawl)
    victim = seen[:500]
    assert cf.delete_hashes(victim) == 500
    assert not cf.contains_hashes(victim).any() or cf.contains_hashes(victim).sum() < 5
    assert cf.contains_hashes(seen[500:]).all()  # others unaffected

    # serialization round-trip
    cf2 = CuckooFilter.from_bytes(cf.to_bytes(), cf.nbuckets, cf.slots)
    assert (cf2.contains_hashes(seen[500:]) == cf.contains_hashes(seen[500:])).all()


def test_cuckoo_as_spark_seen_prefilter(spark):
    seen_df = spark.range(2000).select(F.xxhash64(F.sha2(F.col("id").cast("string"), 256)).alias("h"))
    cand_df = spark.range(1000, 4000).select(
        F.sha2(F.col("id").cast("string"), 256).alias("url_hash"),
        F.xxhash64(F.sha2(F.col("id").cast("string"), 256)).alias("h"),
    )
    cf = CuckooFilter(capacity=4000)
    hs = np.array([r["h"] for r in seen_df.collect()], dtype=np.int64).astype(np.uint64)
    cf.insert_hashes(hs)
    blob, nb, sl = cf.to_bytes(), cf.nbuckets, cf.slots

    import pandas as pd

    def probe(batches):
        local = CuckooFilter.from_bytes(blob, nb, sl)
        for pdf in batches:
            maybe = local.contains_hashes(pdf["h"].values.astype(np.uint64))
            out = pdf.copy()
            out["maybe_seen"] = maybe
            yield out

    schema = "url_hash string, h long, maybe_seen boolean"
    probed = cand_df.mapInPandas(probe, schema=schema)
    # every truly-seen candidate (1000..1999) must be flagged
    flagged = {r["url_hash"] for r in probed.filter("maybe_seen").collect()}
    truly_seen = {
        r["url_hash"]
        for r in spark.range(1000, 2000).select(
            F.sha2(F.col("id").cast("string"), 256).alias("url_hash")
        ).collect()
    }
    assert truly_seen <= flagged
    assert len(flagged) < 1000 + 50  # few false positives
