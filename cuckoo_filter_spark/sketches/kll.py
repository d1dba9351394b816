"""KLL — mergeable quantile sketch (Karnin, Lang, Liberty, FOCS 2016).

Array-of-compactors implementation: level h holds items each
representing 2^h originals; when a level overflows its capacity
(k·c^(H−h), c=2/3) it sorts and keeps alternating items (random parity),
pushing the survivors up a level. Rank error ε ≈ O(1/k) with high
probability. Merge = level-wise concatenation + compaction. All
compaction is numpy sort/slice — no per-row Python.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"KLL1"
_C = 2.0 / 3.0


class KLLSketch:
    def __init__(self, k: int = 200, seed: int = 0xC0FFEE):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.zeros(0, dtype=np.float64)]
        self.count = 0
        self._rng_state = np.uint64(seed or 1)

    def _cap(self, level: int, num_levels: int) -> int:
        return max(2, int(np.ceil(self.k * _C ** (num_levels - level - 1))))

    def _rand_bit(self) -> int:
        x = self._rng_state
        x ^= x << np.uint64(13)
        x ^= x >> np.uint64(7)
        x ^= x << np.uint64(17)
        self._rng_state = x
        return int(x & np.uint64(1))

    def update(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.count += len(v)
        self._compact()

    def _compact(self) -> None:
        while True:
            num = len(self.levels)
            total_cap = sum(self._cap(h, num) for h in range(num))
            if sum(len(l) for l in self.levels) <= max(total_cap, self.k):
                return
            # compact the lowest level over capacity
            for h in range(num):
                if len(self.levels[h]) > self._cap(h, num):
                    buf = np.sort(self.levels[h])
                    off = self._rand_bit()
                    survivors = buf[off::2]
                    self.levels[h] = np.zeros(0, dtype=np.float64)
                    if h + 1 == num:
                        self.levels.append(np.zeros(0, dtype=np.float64))
                    self.levels[h + 1] = np.concatenate([self.levels[h + 1], survivors])
                    break
            else:
                return

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if self.k != other.k:
            raise ValueError("kll k mismatch")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.zeros(0, dtype=np.float64))
        for h, lv in enumerate(other.levels):
            if len(lv):
                self.levels[h] = np.concatenate([self.levels[h], lv])
        self.count += other.count
        self._compact()
        return self

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for h, lv in enumerate(self.levels):
            if len(lv):
                vals.append(lv)
                wts.append(np.full(len(lv), 2.0**h))
        if not vals:
            return np.zeros(0), np.zeros(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        v, w = self._weighted()
        if len(v) == 0:
            return float("nan")
        cw = np.cumsum(w)
        target = q * cw[-1]
        j = min(int(np.searchsorted(cw, target, side="left")), len(v) - 1)
        return float(v[j])

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(float(q)) for q in qs])

    def rank(self, x: float) -> float:
        """Approximate fraction of items ≤ x."""
        v, w = self._weighted()
        if len(v) == 0:
            return float("nan")
        cw = np.cumsum(w)
        j = int(np.searchsorted(v, x, side="right"))
        return float(cw[j - 1] / cw[-1]) if j else 0.0

    def to_bytes(self) -> bytes:
        head = _MAGIC + struct.pack("<IQQI", self.k, self.count,
                                    int(self._rng_state), len(self.levels))
        parts = [head]
        for lv in self.levels:
            parts.append(struct.pack("<Q", len(lv)))
            parts.append(lv.tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLLSketch":
        assert data[:4] == _MAGIC
        k, count, rng, nlev = struct.unpack_from("<IQQI", data, 4)
        out = cls(k=k)
        out.count = count
        out._rng_state = np.uint64(rng)
        out.levels = []
        off = 4 + struct.calcsize("<IQQI")
        for _ in range(nlev):
            (n,) = struct.unpack_from("<Q", data, off)
            off += 8
            out.levels.append(np.frombuffer(data, dtype=np.float64, count=n, offset=off).copy())
            off += 8 * n
        return out
