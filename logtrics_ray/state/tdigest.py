"""Deterministic batch t-digest (numpy, no Python-per-value loops).

After Dunning & Ertl, "Computing Extremely Accurate Quantiles Using
t-Digests" (arXiv:1902.04023): k1 (arcsine) scale function, mergeable
centroids; determinism here comes from sorted inputs + fixed merge order.

Percentile sketch for timer rollups (p50/p75/p95/p99/p999 — the
reference's Graphite percentile set, /root/reference/graphite/graphite.go:72).
The reference's go-metrics uses reservoir sampling (nondeterministic);
our conformance contract (SURVEY.md §5) is engine == oracle with THIS
digest, which is deterministic by construction:

  * build: values are sorted ascending, then bucketed by the k1 scale
    function  k(q) = δ·(asin(2q−1)/π + ½)  evaluated at each point's
    midpoint quantile; points in the same integer bucket merge into one
    centroid (weighted mean via sequential ``np.add.reduceat``).
  * merge: centroid lists are concatenated IN THE CALLER-FIXED ORDER
    (salt ascending / child-window ascending), stably sorted by
    (mean, weight), and re-bucketed the same way.  Fixed topology + fixed
    sort ⇒ bit-identical results on every run and at every parallelism.
  * quantile: linear interpolation between centroid means at midpoint
    cumulative weights (the standard t-digest estimate).
"""

from __future__ import annotations

import numpy as np

DELTA = 200  # compression: max ~DELTA centroids


def _compress(means: np.ndarray, weights: np.ndarray, delta: int = DELTA):
    """means ascending (ties broken by weight) -> bucketed centroids."""
    n = means.size
    if n == 0:
        return means, weights
    total = np.add.reduce(weights)
    cum = np.cumsum(weights)
    qmid = (cum - weights / 2.0) / total
    k = delta * (np.arcsin(2.0 * qmid - 1.0) / np.pi + 0.5)
    b = np.minimum(np.floor(k).astype(np.int64), delta - 1)
    starts = np.flatnonzero(np.diff(b, prepend=b[0] - 1))
    w = np.add.reduceat(weights, starts)
    m = np.add.reduceat(means * weights, starts) / w
    return m, w


class TDigest:
    __slots__ = ("means", "weights")

    def __init__(self, means: np.ndarray | None = None, weights: np.ndarray | None = None):
        self.means = means if means is not None else np.empty(0, dtype=np.float64)
        self.weights = weights if weights is not None else np.empty(0, dtype=np.float64)

    @classmethod
    def from_values(cls, values: np.ndarray) -> "TDigest":
        v = np.sort(np.asarray(values, dtype=np.float64), kind="stable")
        m, w = _compress(v, np.ones_like(v))
        return cls(m, w)

    @classmethod
    def merge_all(cls, digests: list["TDigest"]) -> "TDigest":
        """Merge in the given (caller-fixed) order; deterministic."""
        if not digests:
            return cls()
        means = np.concatenate([d.means for d in digests])
        weights = np.concatenate([d.weights for d in digests])
        order = np.lexsort((weights, means))  # stable: by mean, then weight
        m, w = _compress(means[order], weights[order])
        return cls(m, w)

    @property
    def total_weight(self) -> float:
        return float(np.add.reduce(self.weights)) if self.weights.size else 0.0

    def quantile(self, q: float) -> float:
        m, w = self.means, self.weights
        if m.size == 0:
            return float("nan")
        if m.size == 1:
            return float(m[0])
        total = np.add.reduce(w)
        cum = np.cumsum(w)
        mids = cum - w / 2.0
        target = q * total
        if target <= mids[0]:
            return float(m[0])
        if target >= mids[-1]:
            return float(m[-1])
        i = int(np.searchsorted(mids, target, side="right"))
        t = (target - mids[i - 1]) / (mids[i] - mids[i - 1])
        return float(m[i - 1] + t * (m[i] - m[i - 1]))

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in qs], dtype=np.float64)

    # -- serialization: little-endian [n:int64][means f64*n][weights f64*n] --

    def to_bytes(self) -> bytes:
        n = np.int64(self.means.size)
        return n.tobytes() + self.means.astype("<f8").tobytes() + self.weights.astype("<f8").tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        n = int(np.frombuffer(b[:8], dtype="<i8")[0])
        m = np.frombuffer(b[8:8 + 8 * n], dtype="<f8").copy()
        w = np.frombuffer(b[8 + 8 * n:8 + 16 * n], dtype="<f8").copy()
        return cls(m, w)
