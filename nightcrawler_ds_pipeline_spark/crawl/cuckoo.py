"""Cuckoo filter — the deletable-membership fallback (north_rule).

A Bloom filter cannot delete, but the reference's seen-analogue *expires*:
its response cache has TTLs (serpapi 18 h, zyte 7 d−6 h — helpers/api/
serp_api.py:44, zyte_api.py:28-32), so URLs become re-fetchable. When TTL
expiry is enabled, per-partition sketches must support deletion → cuckoo
filter (public construction: Fan et al., "Cuckoo Filter: Practically Better
Than Bloom", CoNEXT 2014). numpy-vectorized lookups; single-item
insert/delete (sketch maintenance is off the hot path — it runs once per
iteration per partition, not per row).

Layout: ``num_buckets`` buckets × 4 slots of 16-bit fingerprints; 0 is the
empty sentinel (fingerprints are mapped into 1..65535).
"""

from __future__ import annotations

import numpy as np

_FP_BITS = 16
_SLOTS = 4
_MAX_KICKS = 500

_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)
_MIX3 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = (x.astype(np.uint64) + _MIX1).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * _MIX2
        z = (z ^ (z >> np.uint64(27))) * _MIX3
        return z ^ (z >> np.uint64(31))


class CuckooFilter:
    def __init__(self, num_buckets: int = 1 << 14, seed: int = 0x5EED):
        if num_buckets & (num_buckets - 1):
            raise ValueError("num_buckets must be a power of two")
        self.num_buckets = num_buckets
        self._mask = np.uint64(num_buckets - 1)
        self.table = np.zeros((num_buckets, _SLOTS), dtype=np.uint16)
        self._rng = np.random.default_rng(seed)
        self.num_items = 0

    # -- hashing ------------------------------------------------------------
    def _fingerprint(self, keys: np.ndarray) -> np.ndarray:
        fp = (_mix(keys) & np.uint64(0xFFFF)).astype(np.uint16)
        return np.where(fp == 0, np.uint16(1), fp)  # 0 = empty sentinel

    def _index1(self, keys: np.ndarray) -> np.ndarray:
        return (_mix(keys >> np.uint64(16)) & self._mask).astype(np.int64)

    def _index2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # partial-key cuckoo: i2 = i1 xor hash(fp)
        return (i1.astype(np.uint64) ^ (_mix(fp.astype(np.uint64)) & self._mask)).astype(np.int64)

    @staticmethod
    def _as_u64(key: int | np.ndarray) -> np.ndarray:
        arr = np.atleast_1d(np.asarray(key, dtype=np.int64))
        return arr.view(np.uint64)

    # -- ops ----------------------------------------------------------------
    def insert(self, key: int) -> bool:
        k = self._as_u64(key)
        fp = self._fingerprint(k)[0]
        i1 = int(self._index1(k)[0])
        i2 = int(self._index2(np.array([i1]), np.array([fp]))[0])
        for idx in (i1, i2):
            row = self.table[idx]
            empty = np.where(row == 0)[0]
            if empty.size:
                row[empty[0]] = fp
                self.num_items += 1
                return True
        # evict loop
        idx = i1 if self._rng.integers(0, 2) else i2
        cur = fp
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(0, _SLOTS))
            cur, self.table[idx, slot] = self.table[idx, slot], cur
            idx = int(
                self._index2(np.array([idx]), np.array([cur], dtype=np.uint16))[0]
            )
            row = self.table[idx]
            empty = np.where(row == 0)[0]
            if empty.size:
                row[empty[0]] = cur
                self.num_items += 1
                return True
        return False  # table full — caller should resize/rebuild

    def delete(self, key: int) -> bool:
        k = self._as_u64(key)
        fp = self._fingerprint(k)[0]
        i1 = int(self._index1(k)[0])
        i2 = int(self._index2(np.array([i1]), np.array([fp]))[0])
        for idx in (i1, i2):
            hit = np.where(self.table[idx] == fp)[0]
            if hit.size:
                self.table[idx, hit[0]] = 0
                self.num_items -= 1
                return True
        return False

    def contains(self, keys: np.ndarray | int) -> np.ndarray:
        """Vectorized membership for an int64 array of keys."""
        k = self._as_u64(keys)
        fp = self._fingerprint(k)
        i1 = self._index1(k)
        i2 = self._index2(i1, fp)
        in1 = (self.table[i1] == fp[:, None]).any(axis=1)
        in2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return in1 | in2

    # -- (de)serialization for persistence as a binary column ---------------
    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, num_buckets: int, seed: int = 0x5EED) -> "CuckooFilter":
        cf = cls(num_buckets=num_buckets, seed=seed)
        cf.table = np.frombuffer(data, dtype=np.uint16).reshape(num_buckets, _SLOTS).copy()
        cf.num_items = int((cf.table != 0).sum())
        return cf
