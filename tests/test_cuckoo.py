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


def test_segmented_cuckoo_build_probe_delete(spark):
    """Partitioned cuckoo table (north rule: 'partitioned cuckoo/bloom
    URL-seen filter'): per-segment filters built executor-side, probed
    by cogroup with routing from the TABLE's recorded geometry, and —
    the capability blooms lack — per-segment DELETE that re-admits
    expired keys with no rebuild."""
    from nde_crawlers_spark.operators import cuckoo as CK
    from nde_crawlers_spark.operators.seen import filter_unseen_exact

    cand = spark.range(0, 600).select(F.sha2(F.col("id").cast("string"), 256).alias("url_hash"))
    seen = spark.range(0, 600, 2).select(F.sha2(F.col("id").cast("string"), 256).alias("url_hash"))
    segs = CK.build_cuckoo_segments(seen, nseg=8, capacity=1000)
    assert CK.cuckoo_segments_sizing(segs)[0] == 8

    # no false negatives: every seen key reads maybe-seen
    probed = CK.probe_cuckoo_segmented(seen, segs, nseg=8)
    assert probed.filter(~F.col("__maybe_seen")).count() == 0

    # exact filter semantics vs the plain anti-join
    exact = {r["url_hash"] for r in filter_unseen_exact(cand, seen).collect()}
    got = {
        r["url_hash"]
        for r in CK.filter_unseen_cuckoo_segmented(cand, seen, segments=segs).collect()
    }
    assert got == exact

    # TTL delete: evict a third of the seen keys -> they read unseen
    # again, the rest keep no-false-negative
    expired = spark.range(0, 600, 6).select(
        F.sha2(F.col("id").cast("string"), 256).alias("url_hash")
    )
    active = seen.join(expired, "url_hash", "left_anti")
    segs2 = CK.delete_from_cuckoo_segments(segs, expired)
    p2 = CK.probe_cuckoo_segmented(active, segs2, nseg=8)
    assert p2.filter(~F.col("__maybe_seen")).count() == 0
    got2 = {
        r["url_hash"]
        for r in CK.filter_unseen_cuckoo_segmented(cand, active, segments=segs2).collect()
    }
    exact2 = {r["url_hash"] for r in filter_unseen_exact(cand, active).collect()}
    assert got2 == exact2
    # expired keys really flow through again (recrawl-eligible)
    assert {r["url_hash"] for r in expired.collect()} <= got2


def test_segmented_cuckoo_incremental_insert_and_persistence(spark, tmp_path):
    """Insert a delta into an EXISTING persisted segment table (the
    per-round maintenance step) and probe through a parquet round-trip
    with table-derived routing (no explicit nseg)."""
    from nde_crawlers_spark.operators import cuckoo as CK

    s1 = spark.range(0, 300).select(F.sha2(F.col("id").cast("string"), 256).alias("url_hash"))
    delta = spark.range(300, 500).select(F.sha2(F.col("id").cast("string"), 256).alias("url_hash"))
    segs = CK.build_cuckoo_segments(s1, nseg=4, capacity=800)
    segs = CK.insert_into_cuckoo_segments(segs, delta, per_seg_capacity=200)
    path = str(tmp_path / "csegs")
    segs.write.parquet(path)
    back = spark.read.parquet(path)
    allk = s1.unionByName(delta)
    probed = CK.probe_cuckoo_segmented(allk, back)  # routing from the table
    assert probed.filter(~F.col("__maybe_seen")).count() == 0
    fresh = spark.range(10_000, 11_000).select(
        F.sha2(F.col("id").cast("string"), 256).alias("url_hash")
    )
    fp = CK.probe_cuckoo_segmented(fresh, back).filter(F.col("__maybe_seen")).count()
    assert fp < 20  # ~2^-16 per slot probed, generous bound
