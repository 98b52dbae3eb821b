"""Cuckoo filter: the deletable alternative to the bloom prefilter.

The north-star design names a "partitioned cuckoo/bloom URL-seen
filter". Bloom (operators/seen.py) is append-only; a cuckoo filter also
supports DELETE, which matters for the engine's recrawl story: when a
URL's cache TTL expires (EXPIRE, figshare_oai-pmh/files/sql_database.py:75)
it must become fetchable again — with a bloom you rebuild the whole
filter, with a cuckoo you evict one fingerprint.

Vectorized numpy implementation (buckets x slots of uint16 fingerprints)
with the standard partial-cuckoo-hashing layout:

    b1 = hash(key) mod nbuckets
    b2 = b1 XOR hash(fingerprint) mod nbuckets     (partner bucket)

so membership needs only (fingerprint, one bucket index) — and eviction
relocation never re-reads the key. Same integration points as the bloom:
build over the seen delta per partition (Arrow batches), OR... cuckoo
tables merge by re-inserting fingerprints; probe via broadcast bytes.

False positives (~2^-16 per slot probed) are confirmed by the exact
anti-join, exactly like the bloom path — a false positive can cost a
join lookup, never a dropped URL.
"""

from __future__ import annotations

import numpy as np

_FP_BITS = 16
_EMPTY = 0  # fingerprints are 1..65535; 0 marks an empty slot


def _hash64(arr: np.ndarray, seed: int) -> np.ndarray:
    """Cheap splitmix-style 64-bit mix, vectorized (uint64 in/out)."""
    x = arr.astype(np.uint64) + np.uint64(seed * 0x9E3779B97F4A7C15 & (2**64 - 1))
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


class CuckooFilter:
    def __init__(self, capacity: int, slots_per_bucket: int = 4):
        nb = 1
        while nb * slots_per_bucket < capacity * 1.25:
            nb <<= 1  # power of two so XOR partner stays in range
        self.nbuckets = nb
        self.slots = slots_per_bucket
        self.table = np.zeros((nb, slots_per_bucket), dtype=np.uint16)
        self.count = 0
        self.max_kicks = 500
        # victim stash (standard cuckoo design): when an eviction walk
        # exhausts max_kicks, the final displaced fingerprint lands here
        # instead of being dropped — a previously-inserted key must never
        # become a false negative (it would be re-fetched as definite-new).
        self.stash: list[tuple[int, int]] = []  # (bucket1_of_victim, fp)

    # --- key derivation (vectorized over uint64 pre-hashes) ---
    def _fingerprint(self, h: np.ndarray) -> np.ndarray:
        fp = (_hash64(h, 1) & np.uint64(0xFFFF)).astype(np.uint16)
        return np.where(fp == _EMPTY, np.uint16(1), fp)

    def _bucket1(self, h: np.ndarray) -> np.ndarray:
        return (_hash64(h, 2) & np.uint64(self.nbuckets - 1)).astype(np.int64)

    def _partner(self, b: np.ndarray, fp: np.ndarray) -> np.ndarray:
        return (
            b.astype(np.uint64) ^ (_hash64(fp.astype(np.uint64), 3) & np.uint64(self.nbuckets - 1))
        ).astype(np.int64)

    # --- single-key ops (driver-side state maintenance) ---
    def _insert_one(self, b1: int, fp: int) -> bool:
        for b in (b1, int(self._partner(np.array([b1]), np.array([fp], np.uint16))[0])):
            row = self.table[b]
            empty = np.nonzero(row == _EMPTY)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        # evict: random-walk relocation
        rng = np.random.default_rng(fp * 2654435761 % 2**32)  # deterministic kicks
        b, cur = b1, fp
        for _ in range(self.max_kicks):
            slot = int(rng.integers(self.slots))
            cur, self.table[b, slot] = int(self.table[b, slot]), cur
            b = int(self._partner(np.array([b]), np.array([cur], np.uint16))[0])
            row = self.table[b]
            empty = np.nonzero(row == _EMPTY)[0]
            if len(empty):
                row[empty[0]] = cur
                self.count += 1
                return True
        # walk exhausted: the final displaced victim goes to the stash
        # (b is one of ITS two valid buckets), never silently dropped —
        # the new key is in the table, the victim stays queryable.
        self.stash.append((b, cur))
        self.count += 1
        return True

    def insert_hashes(self, h: np.ndarray) -> int:
        """Insert pre-hashed keys (uint64, e.g. xxhash64 of url_hash).
        Returns number inserted."""
        fps = self._fingerprint(h)
        b1s = self._bucket1(h)
        return sum(1 for b1, fp in zip(b1s, fps) if self._insert_one(int(b1), int(fp)))

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        """Vectorized membership for pre-hashed keys -> bool array."""
        fps = self._fingerprint(h)
        b1 = self._bucket1(h)
        b2 = self._partner(b1, fps)
        hit = (self.table[b1] == fps[:, None]).any(axis=1)
        hit |= (self.table[b2] == fps[:, None]).any(axis=1)
        # a stash entry (sb, sfp) matches a key iff fingerprints agree and
        # sb is one of the key's two buckets (the bucket pair is fully
        # determined by (fp, either bucket) via the XOR partner map)
        for sb, sfp in self.stash:
            hit |= (fps == np.uint16(sfp)) & ((b1 == sb) | (b2 == sb))
        return hit

    def delete_hashes(self, h: np.ndarray) -> int:
        """Delete one fingerprint copy per key (TTL eviction). Returns
        number actually removed."""
        fps = self._fingerprint(h)
        b1s = self._bucket1(h)
        b2s = self._partner(b1s, fps)
        removed = 0
        for fp, b1, b2 in zip(fps, b1s, b2s):
            done = False
            for b in (int(b1), int(b2)):
                row = self.table[b]
                hit = np.nonzero(row == fp)[0]
                if len(hit):
                    row[hit[0]] = _EMPTY
                    self.count -= 1
                    removed += 1
                    done = True
                    break
            if not done:
                for i, (sb, sfp) in enumerate(self.stash):
                    if sfp == int(fp) and sb in (int(b1), int(b2)):
                        self.stash.pop(i)
                        self.count -= 1
                        removed += 1
                        break
        return removed

    def to_bytes(self) -> bytes:
        """Table bytes followed by stash entries as (bucket, fp) uint64
        pairs; from_bytes splits on the known table size."""
        tail = np.array([x for e in self.stash for x in e], dtype=np.uint64)
        return self.table.tobytes() + tail.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, nbuckets: int, slots: int) -> "CuckooFilter":
        cf = cls.__new__(cls)
        cf.nbuckets, cf.slots, cf.max_kicks = nbuckets, slots, 500
        nbytes = nbuckets * slots * 2
        cf.table = np.frombuffer(blob[:nbytes], dtype=np.uint16).reshape(nbuckets, slots).copy()
        tail = np.frombuffer(blob[nbytes:], dtype=np.uint64)
        cf.stash = [(int(tail[i]), int(tail[i + 1])) for i in range(0, len(tail), 2)]
        cf.count = int((cf.table != _EMPTY).sum()) + len(cf.stash)
        return cf


# --------------------- segmented (partitioned) cuckoo ---------------------
#
# The north rule names a "partitioned cuckoo/bloom URL-seen filter". The
# bloom side lives as per-bucket segments (operators/seen.py); this is
# the same partitioned layout for the cuckoo filter — one serialized
# filter per url_hash segment, built/maintained/probled executor-side
# with applyInPandas/cogroup, never a driver-resident table — plus the
# capability blooms lack: DELETE. When a URL's cache TTL expires
# (EXPIRE, figshare_oai-pmh/files/sql_database.py:75) its fingerprint is
# evicted from ITS OWN segment only and the URL becomes fetchable again;
# the bloom path would rebuild the full filter. Geometry (nseg,
# nbuckets, slots) is persisted per row exactly like the bloom segments
# (probes route by the TABLE's recorded nseg — same false-negative
# hazard, same fix).

import pandas as pd  # noqa: E402
from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

CUCKOO_SEGMENT_SCHEMA = T.StructType([
    T.StructField("seg", T.IntegerType()),
    T.StructField("nseg", T.IntegerType()),
    T.StructField("nbuckets", T.LongType()),
    T.StructField("slots", T.IntegerType()),
    T.StructField("blob", T.BinaryType()),
])


def _seg_of(col, nseg: int):
    from .seen import segment_of
    return segment_of(col, nseg)


def _key_hash(col):
    """JVM-side 64-bit key hash (xxhash64), independent of the segment
    hash (different salt) and of the filter's internal mixes."""
    return F.xxhash64(col, F.lit("#cuckoo"))


def _u64(series) -> "np.ndarray":
    return series.values.astype("int64").view("uint64")


def build_cuckoo_segments(
    seen: DataFrame, key: str = "url_hash", nseg: int = 64,
    capacity: int = 1_000_000, slots: int = 4,
) -> DataFrame:
    """Per-segment cuckoo filters over the seen keys: one shuffle on the
    segment key, one serialized filter per group, zero driver state.
    ``capacity`` is the TOTAL design point (per-segment = capacity/nseg,
    floored at 64)."""
    per_seg = max(capacity // max(nseg, 1), 64)

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(columns=["seg", "nseg", "nbuckets", "slots", "blob"])
        cf = CuckooFilter(per_seg, slots_per_bucket=slots)
        cf.insert_hashes(_u64(pdf["__h"]))
        return pd.DataFrame({
            "seg": [int(pdf["__seg"].iloc[0])], "nseg": [nseg],
            "nbuckets": [cf.nbuckets], "slots": [cf.slots],
            "blob": [cf.to_bytes()],
        })

    hashed = seen.select(
        _seg_of(F.col(key), nseg).alias("__seg"), _key_hash(F.col(key)).alias("__h")
    )
    return hashed.groupBy("__seg").applyInPandas(_build, schema=CUCKOO_SEGMENT_SCHEMA)


def cuckoo_segments_sizing(segments: DataFrame) -> tuple[int, int, int] | None:
    """(nseg, nbuckets, slots) recorded in the persisted table, None if
    empty — the self-describing-geometry reader (bloom-segment twin)."""
    if "nseg" not in segments.columns:
        return None
    row = segments.select("nseg", "nbuckets", "slots").first()
    if row is None:
        return None
    return int(row["nseg"]), int(row["nbuckets"]), int(row["slots"])


def _apply_keys_to_segments(
    segments: DataFrame, keys: DataFrame, key: str, op: str,
    per_seg_capacity: int, slots: int,
) -> DataFrame:
    """Cogroup each segment with its own keys and insert/delete them —
    the incremental-maintenance step. A key group with no segment row
    creates a fresh filter on insert (and is a no-op on delete)."""
    sizing = cuckoo_segments_sizing(segments)
    nseg = sizing[0] if sizing is not None else 64

    def _merge(kdf: pd.DataFrame, sdf: pd.DataFrame) -> pd.DataFrame:
        if len(sdf) == 0 and (op == "delete" or len(kdf) == 0):
            return pd.DataFrame(columns=["seg", "nseg", "nbuckets", "slots", "blob"])
        if len(sdf) == 0:
            cf = CuckooFilter(per_seg_capacity, slots_per_bucket=slots)
            seg = int(kdf["__seg"].iloc[0])
            ns = nseg
        else:
            cf = CuckooFilter.from_bytes(
                sdf["blob"].iloc[0], int(sdf["nbuckets"].iloc[0]), int(sdf["slots"].iloc[0])
            )
            seg = int(sdf["seg"].iloc[0])
            ns = int(sdf["nseg"].iloc[0])
        if len(kdf):
            if op == "insert":
                cf.insert_hashes(_u64(kdf["__h"]))
            else:
                cf.delete_hashes(_u64(kdf["__h"]))
        return pd.DataFrame({
            "seg": [seg], "nseg": [ns], "nbuckets": [cf.nbuckets],
            "slots": [cf.slots], "blob": [cf.to_bytes()],
        })

    hashed = keys.select(
        _seg_of(F.col(key), nseg).alias("__seg"), _key_hash(F.col(key)).alias("__h")
    )
    return (
        hashed.groupBy("__seg")
        .cogroup(segments.groupBy("seg"))
        .applyInPandas(_merge, schema=CUCKOO_SEGMENT_SCHEMA)
    )


def insert_into_cuckoo_segments(
    segments: DataFrame, delta: DataFrame, key: str = "url_hash",
    per_seg_capacity: int = 15_625, slots: int = 4,
) -> DataFrame:
    return _apply_keys_to_segments(segments, delta, key, "insert", per_seg_capacity, slots)


def delete_from_cuckoo_segments(
    segments: DataFrame, expired: DataFrame, key: str = "url_hash",
    live: DataFrame | None = None, rebuild_counter=None,
) -> DataFrame:
    """TTL recrawl: evict the expired keys' fingerprints from their own
    segments — those URLs read as definitely-unseen again, no rebuild.

    Deletion hazard and its GUARD: cuckoo deletion removes the first
    slot matching (fingerprint, bucket-pair), and two keys colliding on
    the 16-bit fingerprint with a shared bucket are indistinguishable —
    deleting an expired key can evict a LIVE key's copy instead (its
    own copy sits in the partner bucket outside the live key's pair),
    turning that URL into a silent false negative (re-fetched as
    definite-new). With ``live`` (the segment's surviving seen keys —
    the round has them as seen MINUS expired), each segment VERIFIES
    after deletion that every live key still probes present and
    REBUILDS itself from its live set when a collision evicted one;
    rebuilt segments keep their recorded geometry. ``live`` must be the
    COMPLETE post-delete membership, since a rebuilt segment contains
    exactly those keys. Without ``live`` the unguarded single-copy
    delete runs (callers that tolerate ~n²/2¹⁶/nbuckets re-fetches).

    ``rebuild_counter`` (optional Spark accumulator) is incremented once
    per segment that had to rebuild — observability for soak runs; task
    retries/speculation can overcount, so it is reporting-grade, not an
    exactness input."""
    if live is None:
        return _apply_keys_to_segments(segments, expired, key, "delete", 64, 4)
    sizing = cuckoo_segments_sizing(segments)
    nseg = sizing[0] if sizing is not None else 64

    def _tag(df: DataFrame, is_live: int) -> DataFrame:
        return df.select(
            _seg_of(F.col(key), nseg).alias("__seg"),
            _key_hash(F.col(key)).alias("__h"),
            F.lit(is_live).alias("__live"),
        )

    keys = _tag(expired, 0).unionByName(_tag(live, 1))

    def _merge(kdf: pd.DataFrame, sdf: pd.DataFrame) -> pd.DataFrame:
        if len(sdf) == 0:
            # no filter for this segment: delete is a no-op, and there
            # is no membership state for live keys to lose
            return pd.DataFrame(columns=["seg", "nseg", "nbuckets", "slots", "blob"])
        cf = CuckooFilter.from_bytes(
            sdf["blob"].iloc[0], int(sdf["nbuckets"].iloc[0]), int(sdf["slots"].iloc[0])
        )
        exp = kdf[kdf["__live"] == 0]
        liv = kdf[kdf["__live"] == 1]
        if len(exp):
            cf.delete_hashes(_u64(exp["__h"]))
        if len(liv):
            lh = _u64(liv["__h"])
            if not cf.contains_hashes(lh).all():
                # a (fingerprint, bucket) collision evicted a live key:
                # rebuild this segment from its live set, preserving the
                # recorded geometry (per-row geometry keeps probes exact)
                fresh = CuckooFilter.__new__(CuckooFilter)
                fresh.nbuckets, fresh.slots = cf.nbuckets, cf.slots
                fresh.table = np.zeros((cf.nbuckets, cf.slots), dtype=np.uint16)
                fresh.count, fresh.max_kicks, fresh.stash = 0, 500, []
                fresh.insert_hashes(lh)
                cf = fresh
                if rebuild_counter is not None:
                    rebuild_counter.add(1)
        return pd.DataFrame({
            "seg": [int(sdf["seg"].iloc[0])], "nseg": [int(sdf["nseg"].iloc[0])],
            "nbuckets": [cf.nbuckets], "slots": [cf.slots], "blob": [cf.to_bytes()],
        })

    return (
        keys.groupBy("__seg")
        .cogroup(segments.groupBy("seg"))
        .applyInPandas(_merge, schema=CUCKOO_SEGMENT_SCHEMA)
    )


def probe_cuckoo_segmented(
    candidates: DataFrame, segments: DataFrame, key: str = "url_hash",
    nseg: int | None = None,
) -> DataFrame:
    """Add ``__maybe_seen`` by probing each candidate against ITS OWN
    segment (cogroup). Routing uses the TABLE's recorded nseg unless the
    caller just built an un-persisted table and passes it explicitly."""
    if nseg is None:
        sizing = cuckoo_segments_sizing(segments)
        nseg = sizing[0] if sizing is not None else 64
    keep = [f.name for f in candidates.schema.fields]
    out_schema = T.StructType(
        candidates.schema.fields + [T.StructField("__maybe_seen", T.BooleanType())]
    )

    def _probe(cand: pd.DataFrame, seg: pd.DataFrame) -> pd.DataFrame:
        if len(cand) == 0:
            return pd.DataFrame(columns=keep + ["__maybe_seen"])
        out = cand[keep].copy()
        if len(seg) == 0:
            out["__maybe_seen"] = False
            return out
        cf = CuckooFilter.from_bytes(
            seg["blob"].iloc[0], int(seg["nbuckets"].iloc[0]), int(seg["slots"].iloc[0])
        )
        out["__maybe_seen"] = cf.contains_hashes(_u64(cand["__h"]))
        return out

    withh = candidates.withColumns({
        "__seg": _seg_of(F.col(key), nseg),
        "__h": _key_hash(F.col(key)),
    })
    return (
        withh.groupBy("__seg")
        .cogroup(segments.groupBy("seg"))
        .applyInPandas(_probe, schema=out_schema)
    )


def filter_unseen_cuckoo_segmented(
    candidates: DataFrame,
    active_seen: DataFrame,
    segments: DataFrame | None = None,
    key: str = "url_hash",
    nseg: int = 64,
    capacity: int = 1_000_000,
) -> DataFrame:
    """Cuckoo-prefiltered unseen filter, exact semantics (bloom twin):
    definite-new skip the anti-join, might-contain rows are confirmed
    against ``active_seen`` (the seen set MINUS expired keys — with TTL
    recrawl the filter may legitimately contain nothing for an expired
    key, and a stale might-contain is caught by the exact join)."""
    if segments is None:
        segments = build_cuckoo_segments(active_seen, key=key, nseg=nseg, capacity=capacity)
        probe_nseg: int | None = nseg
    else:
        probe_nseg = None
    probed = probe_cuckoo_segmented(candidates, segments, key=key, nseg=probe_nseg)
    definite_new = probed.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
    maybe = probed.filter(F.col("__maybe_seen")).drop("__maybe_seen")
    from .seen import filter_unseen_exact
    confirmed_new = filter_unseen_exact(maybe, active_seen, key)
    return definite_new.unionByName(confirmed_new)
