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


# ---------------------------------------------------- vectorized group merge --

_EMPTY_BYTES = np.int64(0).tobytes()


def merge_groups_vectorized(means_flat: np.ndarray, weights_flat: np.ndarray,
                            centroid_group: np.ndarray, n_groups: int,
                            qs_list) -> tuple[list, np.ndarray]:
    """Merge pre-flattened centroid parts per group — bit-identical to
    ``TDigest.merge_all(parts_of_group).to_bytes() / .quantiles(qs_list)``
    for every group, but with ONE global stable lexsort + segmented
    reduceat instead of a Python loop per group (the timer-window merge
    was the measured ~40x straggler in hot rollup buckets).

    ``centroid_group[i]`` is the 0-based output group of flat centroid i;
    within a group, flat order must equal the caller-fixed merge order
    (``merge_all``'s concat order).  Exactness argument: centroid weights
    are integer-valued by construction (unit-weight builds, merged by
    sums), so per-group running sums recovered as global-cumsum-minus-
    prefix are exact, and every other expression (qmid, k1 bucket, the
    reduceat weighted means, quantile interpolation) is evaluated
    element-for-element identically to the scalar path.  If a non-integer
    weight ever appears the caller must not use this path; we guard and
    fall back to the scalar loop.

    Returns (serialized bytes per group, (n_groups, len(qs)) quantile
    matrix).  Groups with no centroids get the empty-digest encoding and
    NaN quantiles, matching ``merge_all([])``.
    """
    nq = len(qs_list)
    out_bytes: list = [_EMPTY_BYTES] * n_groups
    out_qs = np.full((n_groups, nq), np.nan)
    if means_flat.size == 0:
        return out_bytes, out_qs
    if not np.all(weights_flat == np.rint(weights_flat)):
        # non-integral weights: prefix-sum trick not exact -> scalar path
        for g in range(n_groups):
            sel = centroid_group == g
            if not sel.any():
                continue
            d = TDigest.merge_all([TDigest(means_flat[sel], weights_flat[sel])])
            out_bytes[g] = d.to_bytes()
            out_qs[g] = d.quantiles(qs_list)
        return out_bytes, out_qs

    order = np.lexsort((weights_flat, means_flat, centroid_group))
    ms, ws, sg = means_flat[order], weights_flat[order], centroid_group[order]

    # ---- segmented _compress ------------------------------------------
    seg_starts = np.flatnonzero(np.diff(sg, prepend=sg[0] - 1))
    seg_lens = np.diff(np.append(seg_starts, sg.size))
    totals = np.add.reduceat(ws, seg_starts)            # exact integers
    gcum = np.cumsum(ws)
    prefix = gcum[seg_starts] - ws[seg_starts]          # exact: sum before seg
    cum = gcum - np.repeat(prefix, seg_lens)            # == per-seg cumsum
    qmid = (cum - ws / 2.0) / np.repeat(totals, seg_lens)
    k = DELTA * (np.arcsin(2.0 * qmid - 1.0) / np.pi + 0.5)
    b = np.minimum(np.floor(k).astype(np.int64), DELTA - 1)
    c_starts = np.flatnonzero(np.diff(sg, prepend=sg[0] - 1).astype(bool)
                              | np.diff(b, prepend=b[0] - 1).astype(bool))
    w_c = np.add.reduceat(ws, c_starts)
    m_c = np.add.reduceat(ms * ws, c_starts) / w_c
    c_seg = sg[c_starts]

    seg_c_starts = np.flatnonzero(np.diff(c_seg, prepend=c_seg[0] - 1))
    sizes_c = np.diff(np.append(seg_c_starts, c_seg.size))
    first_idx = seg_c_starts
    last_idx = np.append(seg_c_starts[1:], c_seg.size) - 1
    seg_groups = c_seg[seg_c_starts]                    # ascending, nonempty
    nseg = seg_groups.size

    # ---- segmented quantiles over the compressed centroids ------------
    ccum = np.cumsum(w_c)
    cprefix = ccum[first_idx] - w_c[first_idx]
    mids = (ccum - np.repeat(cprefix, sizes_c)) - w_c / 2.0
    tot_seg = np.add.reduceat(w_c, first_idx)           # == totals (integers)
    seg_idx_c = np.repeat(np.arange(nseg), sizes_c)
    size1 = sizes_c == 1
    qmat = np.empty((nseg, nq), dtype=np.float64)
    for qi, q in enumerate(qs_list):
        target = q * tot_seg
        cnt = np.bincount(seg_idx_c[mids <= np.repeat(target, sizes_c)],
                          minlength=nseg)               # searchsorted 'right'
        res = np.empty(nseg, dtype=np.float64)
        lowm = target <= mids[first_idx]
        highm = target >= mids[last_idx]
        res[lowm] = m_c[first_idx][lowm]
        res[highm] = m_c[last_idx][highm]
        res[size1] = m_c[first_idx][size1]
        interp = ~(size1 | lowm | highm)
        if interp.any():
            gi = (first_idx + cnt)[interp]
            tgt = target[interp]
            t = (tgt - mids[gi - 1]) / (mids[gi] - mids[gi - 1])
            res[interp] = m_c[gi - 1] + t * (m_c[gi] - m_c[gi - 1])
        qmat[:, qi] = res
    out_qs[seg_groups] = qmat

    # ---- serialization: identical bytes to TDigest.to_bytes -----------
    m_le = m_c.astype("<f8", copy=False)
    w_le = w_c.astype("<f8", copy=False)
    bounds_c = np.append(first_idx, c_seg.size)
    for j in range(nseg):
        lo, hi = int(bounds_c[j]), int(bounds_c[j + 1])
        out_bytes[int(seg_groups[j])] = (
            np.int64(hi - lo).tobytes()
            + m_le[lo:hi].tobytes() + w_le[lo:hi].tobytes())
    return out_bytes, out_qs
