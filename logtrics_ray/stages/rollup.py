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
from logtrics_ray.state.tdigest import TDigest

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
        merged, qs = [], np.full((n, len(PCTL_QS)), np.nan)
        for i in range(n):
            d = TDigest.merge_all([TDigest.from_bytes(b)
                                   for b in digests[bounds[i]:bounds[i + 1]] if b is not None])
            merged.append(d.to_bytes())
            qs[i] = d.quantiles(PCTL_QS)
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
