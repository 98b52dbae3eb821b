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
