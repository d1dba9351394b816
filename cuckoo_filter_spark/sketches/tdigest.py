"""t-digest — mergeable quantile sketch (Dunning & Ertl, merging
variant). Vectorized: an update is a numpy sort + weighted merge pass;
no per-row Python. Centroid sizes follow the K1 scale function
k(q) = (δ/2π)·asin(2q−1), which bounds centroid weight near the tails →
relative accuracy at extreme quantiles. Merge = concatenate centroids +
one compression pass (associative up to the documented approximation;
estimates are within the digest's accuracy regardless of merge order).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"TDG1"


class TDigestSketch:
    def __init__(self, delta: float = 200.0):
        self.delta = float(delta)
        self.means = np.zeros(0, dtype=np.float64)
        self.weights = np.zeros(0, dtype=np.float64)
        self.count = 0.0
        self.min = np.inf
        self.max = -np.inf
        self._buffer: list[np.ndarray] = []
        self._buffered = 0

    # -- update --
    def update(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self._buffer.append(v)
        self._buffered += len(v)
        if self._buffered >= max(8 * self.delta, 16384):
            self._flush()

    def _flush(self) -> None:
        if not self._buffer:
            return
        v = np.concatenate(self._buffer)
        self._buffer = []
        self._buffered = 0
        means = np.concatenate([self.means, v])
        weights = np.concatenate([self.weights, np.ones(len(v))])
        self._compress(means, weights)

    def _k(self, q: np.ndarray) -> np.ndarray:
        return self.delta / (2 * np.pi) * np.arcsin(np.clip(2 * q - 1, -1, 1))

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        """Fully vectorized k-space clustering (the classic merging-
        digest variant): each input centroid lands in the unit k-interval
        of its cumulative-weight midpoint; consecutive equal intervals
        merge. Size bound is ~2 k-units (a merged cluster whose members'
        midpoints fall near both edges of one interval can span almost
        two units — slightly looser than the greedy scan's strict 1-unit
        K1 bound, same asymptotic tail accuracy; the accuracy pytest
        bound is the guardrail), with no per-item Python loop."""
        order = np.argsort(means, kind="stable")
        means = means[order]
        weights = weights[order]
        total = weights.sum()
        cw = np.cumsum(weights)
        qmid = (cw - weights / 2) / total
        k = self._k(qmid)
        k_lo = self._k(np.array([0.0]))[0]
        bucket = np.floor(k - k_lo)  # k is monotone in q → buckets sorted
        newgrp = np.r_[True, bucket[1:] != bucket[:-1]]
        gid = np.cumsum(newgrp) - 1
        wsum = np.bincount(gid, weights=weights)
        msum = np.bincount(gid, weights=means * weights)
        self.means = msum / wsum
        self.weights = wsum
        self.count = float(total)

    # -- merge --
    def merge(self, other: "TDigestSketch") -> "TDigestSketch":
        if self.delta != other.delta:
            raise ValueError("t-digest delta mismatch")
        other._flush()
        self._flush()
        if other.count == 0:
            return self
        means = np.concatenate([self.means, other.means])
        weights = np.concatenate([self.weights, other.weights])
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._compress(means, weights)
        return self

    # -- quantiles --
    def quantile(self, q: float) -> float:
        self._flush()
        if self.count == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        cw = np.cumsum(self.weights) - self.weights / 2
        target = q * self.count
        if target <= cw[0]:
            return float(self.min + (self.means[0] - self.min) * max(target, 0) / max(cw[0], 1e-12))
        if target >= cw[-1]:
            span = self.count - cw[-1]
            frac = (target - cw[-1]) / max(span, 1e-12)
            return float(self.means[-1] + (self.max - self.means[-1]) * min(frac, 1.0))
        j = np.searchsorted(cw, target)
        lo, hi = cw[j - 1], cw[j]
        frac = (target - lo) / max(hi - lo, 1e-12)
        return float(self.means[j - 1] + (self.means[j] - self.means[j - 1]) * frac)

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(float(q)) for q in qs])

    # -- serialization --
    def to_bytes(self) -> bytes:
        self._flush()
        head = _MAGIC + struct.pack(
            "<dQddd", self.delta, len(self.means), self.count, self.min, self.max
        )
        return head + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigestSketch":
        assert data[:4] == _MAGIC
        delta, n, count, mn, mx = struct.unpack_from("<dQddd", data, 4)
        out = cls(delta=delta)
        off = 4 + 8 * 5
        out.means = np.frombuffer(data, dtype=np.float64, count=n, offset=off).copy()
        out.weights = np.frombuffer(
            data, dtype=np.float64, count=n, offset=off + 8 * n
        ).copy()
        out.count = count
        out.min = mn
        out.max = mx
        return out
