"""URL-seen filter: exact left-anti join + partitioned bloom prefilter.

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
2. **Bloom prefilter** — a bloom filter built over the seen keys cuts the
   anti-join's probe-side shuffle: definite-new URLs skip the join
   entirely; only might-contain positives go to the exact join for
   confirmation (false positives never drop a URL — the exact join has
   the final say).

Spark 4.1 does not expose ``bloom_filter_agg`` as a SQL-registered
function (it is an internal runtime-filter expression), so the bloom is
built here: the two 64-bit key hashes are computed JVM-side
(``xxhash64``), and the bit array is built/probed with vectorized numpy
inside Arrow batches — no per-row Python. Per round the build scans only
the seen *delta*; blooms are unionable (bitwise OR), so the full-seen
bloom is maintained incrementally, exactly how the production version
would persist per-partition bloom segments alongside the Iceberg table.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class Bloom:
    bits: np.ndarray  # uint8 array of nbits/8 bytes
    nbits: int
    nhashes: int

    def union(self, other: "Bloom") -> "Bloom":
        assert self.nbits == other.nbits and self.nhashes == other.nhashes
        return Bloom(np.bitwise_or(self.bits, other.bits), self.nbits, self.nhashes)


def _params(expected: int, fpp: float) -> tuple[int, int]:
    nbits = max(64, int(-expected * math.log(fpp) / (math.log(2) ** 2)))
    nbits = (nbits + 7) // 8 * 8
    k = max(1, round(nbits / expected * math.log(2)))
    return nbits, min(k, 8)


def _with_key_hashes(df: DataFrame, key: str) -> DataFrame:
    """Two independent 64-bit hashes, computed JVM-side."""
    return df.select(
        F.xxhash64(F.col(key)).alias("__h1"),
        F.xxhash64(F.concat(F.col(key), F.lit("#bloom2"))).alias("__h2"),
    )


def _positions(h1: np.ndarray, h2: np.ndarray, nhashes: int, nbits: int) -> np.ndarray:
    """Double hashing: pos_i = (h1 + i*h2) mod nbits, vectorized.
    -> int64 array of shape (len, nhashes)."""
    i = np.arange(nhashes, dtype=np.uint64)
    u1 = h1.astype(np.uint64)[:, None]
    u2 = h2.astype(np.uint64)[:, None]
    return ((u1 + i[None, :] * u2) % np.uint64(nbits)).astype(np.int64)


def build_bloom(
    seen: DataFrame, key: str = "url_hash", expected: int = 1_000_000, fpp: float = 0.01
) -> Bloom | None:
    """Build a bloom over the seen keys: per-partition numpy bit arrays
    (Arrow batches), OR-combined. Returns None for an empty input."""
    nbits, k = _params(max(expected, 1), fpp)
    nbytes = nbits // 8

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(nbytes, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            any_rows = True
            pos = _positions(pdf["__h1"].values, pdf["__h2"].values, k, nbits).ravel()
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        if any_rows:
            yield pd.DataFrame({"bloom": [bits.tobytes()]})

    parts = _with_key_hashes(seen, key).mapInPandas(
        _build, schema=T.StructType([T.StructField("bloom", T.BinaryType())])
    ).collect()
    if not parts:
        return None
    acc = np.zeros(nbytes, dtype=np.uint8)
    for row in parts:
        acc |= np.frombuffer(row["bloom"], dtype=np.uint8)
    return Bloom(acc, nbits, k)


def probe_bloom(candidates: DataFrame, bloom: Bloom, key: str = "url_hash") -> DataFrame:
    """Add boolean ``__maybe_seen`` via vectorized numpy probe of the
    broadcast bit array."""
    nbits, k = bloom.nbits, bloom.nhashes
    blob = bloom.bits.tobytes()  # broadcast via task closure (small, <= a few MB)

    def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.frombuffer(blob, dtype=np.uint8)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pos = _positions(pdf["__h1"].values, pdf["__h2"].values, k, nbits)
            hit = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
            out = pdf.drop(columns=["__h1", "__h2"]).copy()
            out["__maybe_seen"] = hit.all(axis=1).astype(bool)
            yield out

    withh = candidates.withColumn("__h1", F.xxhash64(F.col(key))).withColumn(
        "__h2", F.xxhash64(F.concat(F.col(key), F.lit("#bloom2")))
    )
    schema = T.StructType(
        candidates.schema.fields + [T.StructField("__maybe_seen", T.BooleanType())]
    )
    return withh.mapInPandas(_probe, schema=schema)


def filter_unseen_exact(candidates: DataFrame, seen: DataFrame, key: str = "url_hash") -> DataFrame:
    """Exact unseen filter: left-anti join on the hash key."""
    return candidates.join(seen.select(key).distinct(), on=key, how="left_anti")


def write_seen_bucketed(seen: DataFrame, table: str, buckets: int = 64, key: str = "url_hash") -> None:
    """Persist the seen set hash-bucketed (and sorted) by the key — the
    sandbox stand-in for Iceberg's bucket(url_hash) transform. A join or
    anti-join against the bucketed table needs NO Exchange on this side
    (verified in tests/test_bucketing.py), which at 10^10 rows is the
    difference between re-shuffling the entire seen set every round and
    touching only matching buckets."""
    (
        seen.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def filter_unseen_bloom(
    candidates: DataFrame,
    seen: DataFrame,
    key: str = "url_hash",
    expected: int = 1_000_000,
    fpp: float = 0.01,
) -> DataFrame:
    """Bloom-prefiltered unseen filter.

    definite_new  = candidates where NOT might_contain(bloom, key)
    maybe_seen    = the rest -> confirmed via exact anti-join
    result        = definite_new UNION confirmed_new  (exact semantics)
    """
    bloom = build_bloom(seen, key=key, expected=expected, fpp=fpp)
    if bloom is None:
        return filter_unseen_exact(candidates, seen, key)
    probed = probe_bloom(candidates, bloom, key=key)
    definite_new = probed.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
    maybe = probed.filter(F.col("__maybe_seen")).drop("__maybe_seen")
    confirmed_new = filter_unseen_exact(maybe, seen, key)
    return definite_new.unionByName(confirmed_new)
