"""Bloom filter for broadcast semi/anti joins at scale (SURVEY.md
§2.4 / ray_guide "Semi / anti join" row).

A key set of 10^9 urls is too big to ship to every task; a Bloom
filter at 10 bits/key (~1% FP) is ~1.2 GB — broadcastable via
ray.put. Deterministic (md5 double-hashing, no randomness)."""

from __future__ import annotations

import hashlib
import math

import numpy as np

__all__ = ["BloomFilter"]


class BloomFilter:
    def __init__(self, capacity: int, fp_rate: float = 0.01) -> None:
        m = max(64, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
        self.m = (m + 63) // 64 * 64
        self.k = max(1, round(self.m / max(1, capacity) * math.log(2)))
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)

    def _hashes(self, key: str) -> np.ndarray:
        d = hashlib.md5(key.encode("utf-8")).digest()
        h1 = int.from_bytes(d[:8], "big")
        h2 = int.from_bytes(d[8:], "big") | 1
        return (h1 + np.arange(self.k, dtype=object) * h2) % self.m

    def add(self, key: str) -> None:
        for h in self._hashes(key):
            self.bits[int(h) >> 6] |= np.uint64(1 << (int(h) & 63))

    def __contains__(self, key: str) -> bool:
        for h in self._hashes(key):
            if not (int(self.bits[int(h) >> 6]) >> (int(h) & 63)) & 1:
                return False
        return True

    def add_many(self, keys) -> None:
        """Batch insert (md5 per key — the repo's md5-only determinism
        trade, same as shingle_hashes; the Bloom path is the
        beyond-broadcast fallback, never the small-key hot path)."""
        for k in keys:
            self.add(str(k))

    def contains_many(self, keys) -> np.ndarray:
        """Batch membership probe -> bool mask (possible false
        positives, never false negatives)."""
        return np.fromiter(
            (str(k) in self for k in keys), dtype=bool, count=len(keys)
        )

    @classmethod
    def build(cls, keys, fp_rate: float = 0.01) -> "BloomFilter":
        keys = list(keys)
        bf = cls(len(keys) or 1, fp_rate)
        for k in keys:
            bf.add(str(k))
        return bf
