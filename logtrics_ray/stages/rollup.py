"""Windowed rollup: salted two-phase grouped aggregation over the points table.

Replaces the reference's shared mutable metrics registry
(/root/reference/graphite/graphite.go:56,154-183 — get-or-register
accumulators keyed by metric name, mutated in place per event) with a
shuffle-based grouped aggregation; the registry's per-flush snapshot
(/root/reference/graphite/graphite.go:84-90) becomes one output row per
(series_key, metric_type, window_start).

Skew defense AND float determinism come from the same mechanism — the
**salt decomposition**.  Every point deterministically belongs to salt
bucket ``tiebreak % S``.  Per (series, window, salt) a *partial* is
computed over points sorted by (ts, tiebreak, value); per (series,
window) the partials are merged in salt-ascending order.  This fixes the
floating-point reduction order irrespective of physical block layout,
so results are bit-identical:

  * between the fused path (one shuffle; salts split inside the group fn)
    and the two-phase path (two shuffles; hot series split S ways), and
  * vs the single-process test oracle, which implements the identical
    per-salt decomposition (tests/oracle.py).

Aggregates per metric type (≙ /root/reference/graphite/graphite.go:186-218):
  counter -> count, sum (window delta)         [cumulative added in seriesscan]
  gauge   -> last by (ts, tiebreak)            [LWW, graphite.go:193-197]
  meter   -> count, sum (marks)                [rate/EWMA added in seriesscan]
  timer   -> count/sum/min/max/mean + t-digest percentiles (graphite.go:72)
All types get count/sum/min/max/mean/last; type-specific derived columns
come later so one Arrow schema covers every series.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from logtrics_ray.config import EngineConfig
from logtrics_ray.state.tdigest import TDigest, merge_groups_vectorized

PCTL_NAMES = ("p50", "p75", "p95", "p99", "p999")
PCTL_QS = (0.5, 0.75, 0.95, 0.99, 0.999)

CORE_FIELDS = [
    ("series_key", pa.string()),
    ("metric_type", pa.string()),
    ("window_start", pa.int64()),
    ("count", pa.int64()),
    ("sum", pa.float64()),
    ("vmin", pa.float64()),
    ("vmax", pa.float64()),
    ("mean", pa.float64()),
    ("last", pa.float64()),
    ("last_ts", pa.int64()),
    ("last_tb", pa.uint64()),
    ("tdigest", pa.binary()),
] + [(p, pa.float64()) for p in PCTL_NAMES]
CORE_SCHEMA = pa.schema(CORE_FIELDS)

PARTIAL_SCHEMA = pa.schema([
    ("series_key", pa.string()),
    ("metric_type", pa.string()),
    ("salt", pa.int64()),
    ("window_start", pa.int64()),
    ("count", pa.int64()),
    ("sum", pa.float64()),
    ("vmin", pa.float64()),
    ("vmax", pa.float64()),
    ("last", pa.float64()),
    ("last_ts", pa.int64()),
    ("last_tb", pa.uint64()),
    ("tdigest", pa.binary()),
])


def assign_windows(points_ds, width_ms: int, cfg: EngineConfig):
    """Add window_start (tumbling, epoch-aligned) + salt columns. Vectorized."""
    S = np.uint64(cfg.salt_buckets)
    W = np.int64(width_ms)

    def fn(t: pa.Table) -> pa.Table:
        ts = t["ts_ms"].to_numpy()
        tb = t["tiebreak"].to_numpy()
        w = ts - ts % W
        salt = (tb % S).astype(np.int64)
        return (t.append_column("window_start", pa.array(w, pa.int64()))
                 .append_column("salt", pa.array(salt, pa.int64())))

    return points_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def assign_sliding_windows(points_ds, width_ms: int, step_ms: int,
                           cfg: EngineConfig):
    """Sliding (hopping) windows: width W, hop S, W % S == 0.  Each point
    belongs to exactly W/S windows with starts (ts//S - k)*S, k=0..W/S-1 —
    materialized by an explicit W/S-fold expansion of the NARROW points
    table (the standard shuffle-side expansion for hopping windows; the
    wide input never expands).  Emits window_start + salt like
    assign_windows, so every downstream rollup path applies unchanged."""
    if width_ms % step_ms:
        raise ValueError("sliding window width must be a multiple of the step")
    f = width_ms // step_ms
    S = np.uint64(cfg.salt_buckets)
    step = np.int64(step_ms)

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return (t.append_column("window_start", pa.array([], pa.int64()))
                     .append_column("salt", pa.array([], pa.int64())))
        ts = t["ts_ms"].to_numpy()
        tb = t["tiebreak"].to_numpy()
        idx = np.repeat(np.arange(n), f)
        k = np.tile(np.arange(f, dtype=np.int64), n)
        tse = ts[idx]
        w = (tse // step - k) * step
        out = t.take(pa.array(idx, pa.int64()))
        salt = (tb[idx] % S).astype(np.int64)
        return (out.append_column("window_start", pa.array(w, pa.int64()))
                   .append_column("salt", pa.array(salt, pa.int64())))

    return points_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def rollup_windowed(windowed_ds):
    """Grouped rollup over a Dataset that already carries window_start +
    salt (e.g. sliding windows).  Same defining semantics as rollup_base."""
    return windowed_ds.groupby(["series_key", "metric_type"]).map_groups(
        _fused_fn, batch_format="pyarrow")


# ---------------------------------------------------------------- partials --

def _np(t: pa.Table, col: str) -> np.ndarray:
    return t[col].to_numpy(zero_copy_only=False)


def _partials_one_salt(w, ts, tb, v, want_digest: bool):
    """Partial aggregates per window for ONE salt bucket.

    Points are ordered by (window, ts, tiebreak, value); all reductions
    are sequential-left-to-right (np.*.reduceat) — the defining order.
    Returns dict of per-window arrays (windows ascending).
    """
    order = np.lexsort((v, tb, ts, w))
    w, ts, tb, v = w[order], ts[order], tb[order], v[order]
    starts = np.flatnonzero(np.diff(w, prepend=w[0] - 1))
    ends = np.append(starts[1:], w.size) - 1
    out = {
        "window_start": w[starts],
        "count": np.diff(np.append(starts, w.size)).astype(np.int64),
        "sum": np.add.reduceat(v, starts),
        "vmin": np.minimum.reduceat(v, starts),
        "vmax": np.maximum.reduceat(v, starts),
        "last": v[ends],
        "last_ts": ts[ends],
        "last_tb": tb[ends],
    }
    if want_digest:
        bounds = np.append(starts, w.size)
        out["tdigest"] = [
            TDigest.from_values(v[bounds[i]:bounds[i + 1]]).to_bytes()
            for i in range(starts.size)
        ]
    else:
        out["tdigest"] = [None] * starts.size
    return out


def _partials_table(series: str, mtype: str, salt_val: int, p: dict) -> pa.Table:
    n = p["window_start"].size
    return pa.Table.from_arrays([
        pa.array([series] * n, pa.string()),
        pa.array([mtype] * n, pa.string()),
        pa.array(np.full(n, salt_val, dtype=np.int64)),
        pa.array(p["window_start"], pa.int64()),
        pa.array(p["count"], pa.int64()),
        pa.array(p["sum"], pa.float64()),
        pa.array(p["vmin"], pa.float64()),
        pa.array(p["vmax"], pa.float64()),
        pa.array(p["last"], pa.float64()),
        pa.array(p["last_ts"], pa.int64()),
        pa.array(p["last_tb"], pa.uint64()),
        pa.array(p["tdigest"], pa.binary()),
    ], schema=PARTIAL_SCHEMA)


# ------------------------------------------------------------------- merge --

def _merge_partials(series: str, mtype: str, salt, w, count, psum, vmin, vmax,
                    last, last_ts, last_tb, digests: list) -> pa.Table:
    """Merge per-(window, salt) partials -> one core row per window.

    Partials are ordered (window asc, salt asc); sums merge sequentially
    in that order — the engine's defining float semantics.
    """
    order = np.lexsort((salt, w))
    w, count, psum = w[order], count[order], psum[order]
    vmin, vmax = vmin[order], vmax[order]
    last, last_ts, last_tb = last[order], last_ts[order], last_tb[order]
    digests = [digests[i] for i in order]

    starts = np.flatnonzero(np.diff(w, prepend=w[0] - 1))
    bounds = np.append(starts, w.size)
    out_w = w[starts]
    out_count = np.add.reduceat(count, starts)
    out_sum = np.add.reduceat(psum, starts)
    out_min = np.minimum.reduceat(vmin, starts)
    out_max = np.maximum.reduceat(vmax, starts)
    out_mean = out_sum / out_count

    # gauge "last": the partial holding the max (last_ts, last_tb) wins —
    # ≙ last-write-wins over the deterministic order key (graphite.go:193-197).
    order2 = np.lexsort((last_tb, last_ts, w))
    ends2 = bounds[1:] - 1
    out_last = last[order2][ends2]
    out_last_ts = last_ts[order2][ends2]
    out_last_tb = last_tb[order2][ends2]

    n = out_w.size
    if mtype == "timer":
        mparts, wparts, gparts = [], [], []
        for i in range(n):
            for b in digests[bounds[i]:bounds[i + 1]]:
                if b is not None:
                    d = TDigest.from_bytes(b)
                    if d.means.size:
                        mparts.append(d.means)
                        wparts.append(d.weights)
                        gparts.append(i)
        sizes = np.fromiter((m.size for m in mparts), dtype=np.int64,
                            count=len(mparts))
        cg = np.repeat(np.asarray(gparts, dtype=np.int64), sizes)
        mf = (np.concatenate(mparts) if mparts
              else np.empty(0, dtype=np.float64))
        wf = (np.concatenate(wparts) if wparts
              else np.empty(0, dtype=np.float64))
        merged_l, qs = merge_groups_vectorized(mf, wf, cg, n, PCTL_QS)
        merged = merged_l
    else:
        merged = [None] * n
        qs = np.full((n, len(PCTL_QS)), np.nan)

    cols = [
        pa.array([series] * n, pa.string()),
        pa.array([mtype] * n, pa.string()),
        pa.array(out_w, pa.int64()),
        pa.array(out_count, pa.int64()),
        pa.array(out_sum, pa.float64()),
        pa.array(out_min, pa.float64()),
        pa.array(out_max, pa.float64()),
        pa.array(out_mean, pa.float64()),
        pa.array(out_last, pa.float64()),
        pa.array(out_last_ts, pa.int64()),
        pa.array(out_last_tb, pa.uint64()),
        pa.array(merged, pa.binary()),
    ] + [pa.array(qs[:, j], pa.float64()) for j in range(len(PCTL_QS))]
    return pa.Table.from_arrays(cols, schema=CORE_SCHEMA)


# -------------------------------------------------------------- group fns ---

def _phase1_fn(group: pa.Table) -> pa.Table:
    group = group.combine_chunks()
    series = group["series_key"][0].as_py()
    mtype = group["metric_type"][0].as_py()
    salt_val = int(group["salt"][0].as_py())
    p = _partials_one_salt(_np(group, "window_start"), _np(group, "ts_ms"),
                           _np(group, "tiebreak"), _np(group, "value"),
                           want_digest=(mtype == "timer"))
    return _partials_table(series, mtype, salt_val, p)


def _phase2_fn(group: pa.Table) -> pa.Table:
    group = group.combine_chunks()
    series = group["series_key"][0].as_py()
    mtype = group["metric_type"][0].as_py()
    return _merge_partials(
        series, mtype,
        _np(group, "salt"), _np(group, "window_start"), _np(group, "count"),
        _np(group, "sum"), _np(group, "vmin"), _np(group, "vmax"),
        _np(group, "last"), _np(group, "last_ts"), _np(group, "last_tb"),
        group["tdigest"].to_pylist())


def _fused_fn(group: pa.Table) -> pa.Table:
    """One-shuffle path: per-salt partials computed inside the (series,
    metric_type) group, then merged by the same code as phase 2 →
    bit-identical to the two-phase path."""
    group = group.combine_chunks()
    series = group["series_key"][0].as_py()
    mtype = group["metric_type"][0].as_py()
    w = _np(group, "window_start"); ts = _np(group, "ts_ms")
    tb = _np(group, "tiebreak"); v = _np(group, "value")
    salt = _np(group, "salt")
    want_digest = (mtype == "timer")

    parts = []
    for s in np.unique(salt):
        m = salt == s
        p = _partials_one_salt(w[m], ts[m], tb[m], v[m], want_digest)
        p["salt"] = np.full(p["window_start"].size, s, dtype=np.int64)
        parts.append(p)
    cat = {k: (np.concatenate([p[k] for p in parts])
               if isinstance(parts[0][k], np.ndarray)
               else sum((p[k] for p in parts), []))
           for k in parts[0]}
    return _merge_partials(series, mtype, cat["salt"], cat["window_start"],
                           cat["count"], cat["sum"], cat["vmin"], cat["vmax"],
                           cat["last"], cat["last_ts"], cat["last_tb"], cat["tdigest"])


def rollup_base(points_ds, width_ms: int, cfg: EngineConfig, two_phase: bool = False):
    """points Dataset -> core rollup rows at one tier width.

    two_phase=False (default): one shuffle, per-salt decomposition inside
    the group fn.  two_phase=True: hot series are physically split S ways
    first (the skew path).  Identical output bits either way.
    """
    ds = assign_windows(points_ds, width_ms, cfg)
    if two_phase:
        partials = ds.groupby(["series_key", "metric_type", "salt"]).map_groups(
            _phase1_fn, batch_format="pyarrow")
        return partials.groupby(["series_key", "metric_type"]).map_groups(
            _phase2_fn, batch_format="pyarrow")
    return ds.groupby(["series_key", "metric_type"]).map_groups(
        _fused_fn, batch_format="pyarrow")


# ------------------------------------------------- bucket-major fast path --

def _digests_vectorized(v: np.ndarray, bounds: np.ndarray,
                        seg_idx: np.ndarray) -> list[TDigest]:
    """Build per-segment unit-weight t-digests for many segments at once.

    Bit-identical to ``TDigest.from_values(v[bounds[i]:bounds[i+1]])`` per
    segment: with unit weights the cumulative weight is an exact integer
    sequence, the k1 bucket formula is evaluated with the identical
    expression, and the per-centroid weighted means reduce with
    ``np.add.reduceat`` (embedding-invariant).  One global stable lexsort
    replaces per-segment sorts — the 10-50x win for timer-heavy series.
    """
    from logtrics_ray.state.tdigest import DELTA
    lens = (bounds[seg_idx + 1] - bounds[seg_idx]).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return [TDigest() for _ in seg_idx]
    seg_off = np.concatenate([[0], np.cumsum(lens)[:-1]])
    pos = np.repeat(bounds[seg_idx] - seg_off, lens) + np.arange(total)
    vt = v[pos]
    seg_id = np.repeat(np.arange(seg_idx.size), lens)
    order = np.lexsort((vt, seg_id))  # stable: value-ascending within segment
    vs = vt[order]

    rank = np.arange(total) - np.repeat(seg_off, lens)
    cum = (rank + 1).astype(np.float64)            # == cumsum(ones): exact
    n_seg = np.repeat(lens, lens).astype(np.float64)
    qmid = (cum - 0.5) / n_seg                     # == (cum - w/2)/total, w=1
    k = DELTA * (np.arcsin(2.0 * qmid - 1.0) / np.pi + 0.5)
    b = np.minimum(np.floor(k).astype(np.int64), DELTA - 1)

    c_starts = np.flatnonzero(np.diff(seg_id, prepend=seg_id[0] - 1).astype(bool)
                              | np.diff(b, prepend=b[0] - 1).astype(bool))
    ones = np.ones(total, dtype=np.float64)
    w_c = np.add.reduceat(ones, c_starts)
    m_c = np.add.reduceat(vs * ones, c_starts) / w_c   # means*weights, w=1: exact
    c_seg = seg_id[c_starts]
    seg_c_starts = np.flatnonzero(np.diff(c_seg, prepend=c_seg[0] - 1))
    seg_c_bounds = np.append(seg_c_starts, c_seg.size)
    out = []
    for i in range(seg_idx.size):
        lo, hi = seg_c_bounds[i], seg_c_bounds[i + 1]
        out.append(TDigest(m_c[lo:hi].copy(), w_c[lo:hi].copy()))
    return out


def _bucket_partials(group: pa.Table):
    """Phase 1 of the bucket-major rollup: per-(series, metric_type,
    salt, window) partials over points ordered (ts, tiebreak, value).
    Returns (u_sk, u_mt, partials dict) where partial digests are live
    TDigest objects (serialized only if they cross an exchange)."""
    group = group.combine_chunks()
    # (series, metric_type) group codes WITHOUT per-row Python strings:
    # the fused exchange ships these columns dictionary-encoded, so the
    # dictionary indices already are the codes; plain-string inputs (the
    # staged path, tests) pay one C++ dictionary_encode instead.
    skc = group["series_key"].combine_chunks()
    mtc = group["metric_type"].combine_chunks()
    if not pa.types.is_dictionary(skc.type):
        skc = skc.dictionary_encode()
    if not pa.types.is_dictionary(mtc.type):
        mtc = mtc.dictionary_encode()
    sk_labels = np.asarray(skc.dictionary.to_pylist(), dtype=object)
    mt_labels = np.asarray(mtc.dictionary.to_pylist(), dtype=object)
    comb = (skc.indices.to_numpy().astype(np.int64) * len(mt_labels)
            + mtc.indices.to_numpy())
    # comb values are bounded by the (small) dictionary product — bincount
    # remap beats np.unique(return_inverse)'s O(n log n) sort (measured
    # 1.2s -> ms on a 1M-row hot bucket).
    occ = np.bincount(comb, minlength=len(sk_labels) * len(mt_labels))
    uniq_comb = np.flatnonzero(occ)
    lookup = np.zeros(occ.size, dtype=np.int64)
    lookup[uniq_comb] = np.arange(uniq_comb.size)
    code = lookup[comb]
    u_sk = sk_labels[uniq_comb // len(mt_labels)]
    u_mt = mt_labels[uniq_comb % len(mt_labels)]
    w = _np(group, "window_start"); ts = _np(group, "ts_ms")
    tb = _np(group, "tiebreak"); v = _np(group, "value")
    salt = _np(group, "salt")

    # ---- phase 1: partials per (code, salt, window), vectorized --------
    # Pack (code, salt, window) into ONE int64 sort key when ranges allow
    # (codes*salts small, window span < 2^40 ms ~ 35 years): lexsort cost
    # scales with the number of key arrays — 4 passes instead of 6.
    smax = int(salt.max()) + 1 if salt.size else 1
    wmin = np.int64(w.min()) if w.size else np.int64(0)
    wspan = np.int64(w.max()) - wmin if w.size else np.int64(0)
    ncs = uniq_comb.size * smax
    if ncs < (1 << 22) and wspan < (np.int64(1) << 40):
        cs_key = ((code * smax + salt) << np.int64(40)) | (w - wmin)
        o1 = np.lexsort((v, tb, ts, cs_key))
        k1 = cs_key[o1]
        seg_change = np.flatnonzero(np.diff(k1, prepend=k1[0] - 1))
    else:
        o1 = np.lexsort((v, tb, ts, w, salt, code))
        c1a, s1a, w1a = code[o1], salt[o1], w[o1]
        seg_change = np.flatnonzero(
            np.diff(c1a, prepend=c1a[0] - 1).astype(bool)
            | np.diff(s1a, prepend=s1a[0] - 1).astype(bool)
            | np.diff(w1a, prepend=w1a[0] - 1).astype(bool))
    c1, s1, w1 = code[o1], salt[o1], w[o1]
    ts1, tb1, v1 = ts[o1], tb[o1], v[o1]
    bounds1 = np.append(seg_change, c1.size)
    ends1 = bounds1[1:] - 1
    p_code, p_salt, p_w = c1[seg_change], s1[seg_change], w1[seg_change]
    p_count = np.diff(bounds1).astype(np.int64)
    p_sum = np.add.reduceat(v1, seg_change)
    p_min = np.minimum.reduceat(v1, seg_change)
    p_max = np.maximum.reduceat(v1, seg_change)
    p_last, p_lts, p_ltb = v1[ends1], ts1[ends1], tb1[ends1]

    timer_mask_series = (u_mt == "timer")
    p_digest: list = [None] * p_code.size
    if timer_mask_series.any():
        idx = np.flatnonzero(timer_mask_series[p_code])
        for i, d in zip(idx, _digests_vectorized(v1, bounds1, idx)):
            p_digest[i] = d
    return u_sk, u_mt, dict(
        code=p_code, salt=p_salt, w=p_w, count=p_count, sum=p_sum,
        vmin=p_min, vmax=p_max, last=p_last, lts=p_lts, ltb=p_ltb,
        digest=p_digest)


def _merge_partials_arrays(u_sk, u_mt, P: dict) -> pa.Table:
    """Phase 2: merge per-(code, window) partials in salt-ascending order
    (the defining float semantics) -> core rows."""
    p_code, p_salt, p_w = P["code"], P["salt"], P["w"]
    p_count, p_sum = P["count"], P["sum"]
    p_min, p_max = P["vmin"], P["vmax"]
    p_last, p_lts, p_ltb = P["last"], P["lts"], P["ltb"]
    p_digest = P["digest"]
    timer_mask_series = (u_mt == "timer")
    o2 = np.lexsort((p_salt, p_w, p_code))
    c2, w2, s2 = p_code[o2], p_w[o2], p_salt[o2]
    cnt2, sum2 = p_count[o2], p_sum[o2]
    min2, max2 = p_min[o2], p_max[o2]
    last2, lts2, ltb2 = p_last[o2], p_lts[o2], p_ltb[o2]
    dig2 = [p_digest[i] for i in o2]

    starts = np.flatnonzero(np.diff(c2, prepend=c2[0] - 1).astype(bool)
                            | np.diff(w2, prepend=w2[0] - 1).astype(bool))
    bounds = np.append(starts, c2.size)
    out_code, out_w = c2[starts], w2[starts]
    out_count = np.add.reduceat(cnt2, starts)
    out_sum = np.add.reduceat(sum2, starts)
    out_min = np.minimum.reduceat(min2, starts)
    out_max = np.maximum.reduceat(max2, starts)
    out_mean = out_sum / out_count

    o3 = np.lexsort((ltb2, lts2, w2, c2))
    ends3 = bounds[1:] - 1
    out_last = last2[o3][ends3]
    out_lts = lts2[o3][ends3]
    out_ltb = ltb2[o3][ends3]

    n = out_w.size
    merged: list = [None] * n
    qs = np.full((n, len(PCTL_QS)), np.nan)
    if timer_mask_series.any():
        # segment-vectorized digest merge: one lexsort over every timer
        # window's centroids replaces the per-window merge_all loop (the
        # measured ~40x straggler on dense-timer buckets); bit-identical.
        tgroups = np.flatnonzero(timer_mask_series[out_code])
        mparts, wparts, gparts = [], [], []
        for j, i in enumerate(tgroups):
            for d in dig2[bounds[i]:bounds[i + 1]]:
                if d is not None and d.means.size:
                    mparts.append(d.means)
                    wparts.append(d.weights)
                    gparts.append(j)
        sizes = np.fromiter((m.size for m in mparts), dtype=np.int64,
                            count=len(mparts))
        cg = np.repeat(np.asarray(gparts, dtype=np.int64), sizes)
        mf = (np.concatenate(mparts) if mparts
              else np.empty(0, dtype=np.float64))
        wf = (np.concatenate(wparts) if wparts
              else np.empty(0, dtype=np.float64))
        bl, qmat = merge_groups_vectorized(mf, wf, cg, tgroups.size, PCTL_QS)
        for j, i in enumerate(tgroups):
            merged[i] = bl[j]
        qs[tgroups] = qmat

    out_series = u_sk[out_code]
    out_mt = u_mt[out_code]
    cols = [
        pa.array(out_series, pa.string()),
        pa.array(out_mt, pa.string()),
        pa.array(out_w, pa.int64()),
        pa.array(out_count, pa.int64()),
        pa.array(out_sum, pa.float64()),
        pa.array(out_min, pa.float64()),
        pa.array(out_max, pa.float64()),
        pa.array(out_mean, pa.float64()),
        pa.array(out_last, pa.float64()),
        pa.array(out_lts, pa.int64()),
        pa.array(out_ltb, pa.uint64()),
        pa.array(merged, pa.binary()),
    ] + [pa.array(qs[:, j], pa.float64()) for j in range(len(PCTL_QS))]
    return pa.Table.from_arrays(cols, schema=CORE_SCHEMA)


def _bucket_rollup_fn(group: pa.Table) -> pa.Table:
    """Vectorized rollup of ALL series in one hash bucket.

    Same defining semantics as _fused_fn / the two-phase path — partials
    per (series, window, salt) over points ordered (ts, tiebreak, value),
    merged per (series, window) in salt-ascending order — but computed
    with two lexsorts + segmented reduceat over the whole bucket instead
    of one group call per series.  ``np.ufunc.reduceat`` per-segment
    results are invariant to how segments are embedded in a larger array
    (verified property), so the output is bit-identical to the other
    modes; only scheduling granularity differs.
    """
    u_sk, u_mt, P = _bucket_partials(group)
    return _merge_partials_arrays(u_sk, u_mt, P)


#: Partial rows crossing the salted exchange (PARTIAL_SCHEMA + order keys
#: + digest bytes): one row per (series, metric_type, salt, window) cell.
PARTIAL_CORE_SCHEMA = pa.schema([
    ("series_key", pa.string()),
    ("metric_type", pa.string()),
    ("salt", pa.int64()),
    ("window_start", pa.int64()),
    ("count", pa.int64()),
    ("sum", pa.float64()),
    ("vmin", pa.float64()),
    ("vmax", pa.float64()),
    ("last", pa.float64()),
    ("last_ts", pa.int64()),
    ("last_tb", pa.uint64()),
    ("tdigest", pa.binary()),
])


def bucket_partials_table(group: pa.Table) -> pa.Table:
    """Phase-1 group fn of the SALTED two-phase exchange: one partial row
    per (series, metric_type, salt, window) cell of this (bucket, salt)
    slice.  Digests serialize for the wire; string keys ship
    dictionary-encoded."""
    u_sk, u_mt, P = _bucket_partials(group)
    code = P["code"]
    n = code.size
    # dictionary arrays built straight from the code indices — the labels
    # never materialize per row (codes ARE the dictionary indices)
    idx = pa.array(code.astype(np.int32), pa.int32())
    t = pa.Table.from_arrays([
        pa.DictionaryArray.from_arrays(idx, pa.array(list(u_sk), pa.string())),
        pa.DictionaryArray.from_arrays(idx, pa.array(list(u_mt), pa.string())),
        pa.array(P["salt"], pa.int64()),
        pa.array(P["w"], pa.int64()),
        pa.array(P["count"], pa.int64()),
        pa.array(P["sum"], pa.float64()),
        pa.array(P["vmin"], pa.float64()),
        pa.array(P["vmax"], pa.float64()),
        pa.array(P["last"], pa.float64()),
        pa.array(P["lts"], pa.int64()),
        pa.array(P["ltb"], pa.uint64()),
        pa.array([d.to_bytes() if d is not None else None
                  for d in P["digest"]], pa.binary()),
    ], names=[f.name for f in PARTIAL_CORE_SCHEMA])
    return t


def empty_partials_table() -> pa.Table:
    """Zero-row partials table with the SAME physical schema as
    bucket_partials_table output (dictionary-encoded key columns), so
    empty and non-empty stage-1 outputs unify."""
    t = bucket_partials_table(pa.Table.from_arrays([
        pa.array(["x"], pa.string()), pa.array(["gauge"], pa.string()),
        pa.array([0], pa.int64()), pa.array([0.0], pa.float64()),
        pa.array([np.uint64(0)], pa.uint64()),
        pa.array([0], pa.int64()), pa.array([0], pa.int64()),
    ], names=["series_key", "metric_type", "ts_ms", "value", "tiebreak",
              "window_start", "salt"]))
    return t.slice(0, 0)


def merge_bucket_partials_fn(t: pa.Table) -> pa.Table:
    """Phase-2 group fn of the salted exchange: all partial rows of ONE
    output bucket -> core rows (identical bits to _bucket_rollup_fn on
    the same points — the salt decomposition defines the merge order,
    not the physical route the partials took)."""
    t = t.combine_chunks()
    skc = t["series_key"].combine_chunks() if isinstance(
        t["series_key"], pa.ChunkedArray) else t["series_key"]
    mtc = t["metric_type"].combine_chunks() if isinstance(
        t["metric_type"], pa.ChunkedArray) else t["metric_type"]
    if not pa.types.is_dictionary(skc.type):
        skc = skc.dictionary_encode()
    if not pa.types.is_dictionary(mtc.type):
        mtc = mtc.dictionary_encode()
    sk_labels = np.asarray(skc.dictionary.to_pylist(), dtype=object)
    mt_labels = np.asarray(mtc.dictionary.to_pylist(), dtype=object)
    comb = (skc.indices.to_numpy().astype(np.int64) * len(mt_labels)
            + mtc.indices.to_numpy())
    occ = np.bincount(comb, minlength=len(sk_labels) * len(mt_labels))
    uniq_comb = np.flatnonzero(occ)
    lookup = np.zeros(occ.size, dtype=np.int64)
    lookup[uniq_comb] = np.arange(uniq_comb.size)
    code = lookup[comb]
    u_sk = sk_labels[uniq_comb // len(mt_labels)]
    u_mt = mt_labels[uniq_comb % len(mt_labels)]
    tcol = t["tdigest"]
    if pc.count(tcol, mode="only_valid").as_py() == 0:
        dig: list = [None] * t.num_rows   # no timers: skip the pylist pass
    else:
        dig = [TDigest.from_bytes(b) if b is not None else None
               for b in tcol.to_pylist()]
    P = dict(code=code,
             salt=_np(t, "salt"), w=_np(t, "window_start"),
             count=_np(t, "count"), sum=_np(t, "sum"),
             vmin=_np(t, "vmin"), vmax=_np(t, "vmax"),
             last=_np(t, "last"), lts=_np(t, "last_ts"),
             ltb=_np(t, "last_tb"), digest=dig)
    return _merge_partials_arrays(u_sk, u_mt, P)


def rollup_base_bucketed(points_ds, width_ms: int, cfg: EngineConfig):
    """One-shuffle bucket-major rollup: hash-partition points by series
    bucket, roll up every series of a bucket vectorized in one group call.
    Bit-identical to rollup_base(...) in any mode."""
    from logtrics_ray.hashing import series_bucket_array
    ds = assign_windows(points_ds, width_ms, cfg)
    nb = cfg.rollup_buckets

    def add_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("rbucket", pa.array([], pa.int64()))
        b = series_bucket_array(t["series_key"], nb)
        return t.append_column("rbucket", pa.array(b, pa.int64()))

    ds = ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
    # NOTE: no repartition() here — Ray re-executes the upstream map chain
    # inside RepartitionSplit (measured: total remote CPU doubles), so a
    # coalesce costs far more than the sort's per-block overhead it saves.
    return ds.groupby("rbucket").map_groups(
        lambda g: _bucket_rollup_fn(g.drop_columns(["rbucket"])),
        batch_format="pyarrow")
