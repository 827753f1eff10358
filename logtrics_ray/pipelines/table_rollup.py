"""Generic table -> points adapter + driver-facing rollup frames.

The engine's narrow waist (points schema, stages/extract.py) is not tied
to the token table: any table with (timestamp, key, value, unique id)
maps onto it.  The ``events`` testdata table (event_id, ts, event_type,
value) is the SQL-checkable stand-in: the DuckDB oracle can recompute
every rollup over it, which is how the driver's correctness gate
(CORRECTNESS_r{N}.json) independently validates the engine's groupby /
cascade / gap-fill / scan operators.

Float columns in driver-facing frames are rounded to 6 decimals ON BOTH
SIDES (engine + oracle SQL) so ULP-level reduction-order differences
between the engine's deterministic salted sums and DuckDB's internal
summation order cannot flip a value-hash comparison.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from logtrics_ray.config import EngineConfig
from logtrics_ray.stages.extract import POINTS_SCHEMA
from logtrics_ray.stages.rollup import assign_windows


def points_from_table(ds, ts_col: str, key_col: str, value_col: str, id_col: str,
                      metric_type: str = "gauge", key_prefix: str = ""):
    """Map any (timestamp, key, value, id) table onto the points schema.

    tiebreak = id (must be unique per row): gives the deterministic
    per-point order key the engine's `last`/salt semantics need.
    """

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts_ms = pc.cast(pc.divide(pc.cast(ts, pa.int64()), 1000), pa.int64()) \
                if ts.type.unit == "us" else pc.cast(ts, pa.int64())
        else:
            ts_ms = pc.cast(ts, pa.int64())
        key = pc.cast(t[key_col], pa.string())
        if key_prefix:
            key = pc.binary_join_element_wise(
                pa.array([key_prefix] * n, pa.string()), key, "")
        return pa.Table.from_arrays([
            key,
            pa.array([metric_type] * n, pa.string()),
            ts_ms,
            pc.cast(t[value_col], pa.float64()),
            pc.cast(t[id_col], pa.uint64()),
        ], schema=POINTS_SCHEMA)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def read_events_points(sf_dir: str, metric_type: str = "gauge"):
    from logtrics_ray.sources.parquet import read_parquet_clean
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "event_type", "value"])
    return points_from_table(ds, "ts", "event_type", "value", "event_id",
                             metric_type=metric_type)


# Scan-bucket count for the bucket-major per-series frames: one map_groups
# call per BUCKET (each handling many series via segmented numpy), not one
# per series — at millions of series the per-group Python call is the
# bottleneck, exactly as in the core rollup's bucket-major path.
SCAN_BUCKETS = 64


def _with_scan_bucket(ds, nb: int = SCAN_BUCKETS, key_col: str = "series_key"):
    from logtrics_ray.hashing import series_bucket_array

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_scan_bucket", pa.array([], pa.int64()))
        b = series_bucket_array(t[key_col], nb)
        return t.append_column("_scan_bucket", pa.array(b, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _segments(g: pa.Table, sort_cols: list[str],
              key_cols=("series_key",)):
    """One bucket's rows -> per-(key_cols) segments, sorted by sort_cols
    inside each segment, with NO per-row Python keys (dictionary-index
    codes rank-remapped to exact string order).

    Returns (g_sorted_numpy: dict col->array incl. sort cols,
             seg_starts, seg_bounds, seg_labels: dict key_col->object
             array of per-segment labels, order)."""
    from logtrics_ray.stages.seriesscan import _label_ranks, dict_codes
    g = g.combine_chunks()
    key = np.zeros(g.num_rows, dtype=np.int64)
    per_col = []
    for kc in key_cols:
        codes, labels = dict_codes(g[kc])
        key = key * max(len(labels), 1) + _label_ranks(labels)[codes]
        per_col.append((kc, codes, labels))
    sort_arrays = tuple(g[c].to_numpy(zero_copy_only=False)
                        for c in reversed(sort_cols))
    order = np.lexsort(sort_arrays + (key,))
    key_s = key[order]
    starts = np.flatnonzero(np.diff(key_s, prepend=key_s[0] - 1)) \
        if key_s.size else np.array([], dtype=np.int64)
    bounds = np.append(starts, key_s.size)
    seg_labels = {kc: labels[codes[order][starts]]
                  for kc, codes, labels in per_col}
    return order, starts, bounds, seg_labels


def _seg_change(*arrays: np.ndarray) -> np.ndarray:
    """Segment-start indices where ANY of the (sorted) key arrays changes."""
    if not arrays or arrays[0].size == 0:
        return np.array([], dtype=np.int64)
    m = np.zeros(arrays[0].size, dtype=bool)
    for a in arrays:
        m |= np.diff(a, prepend=a[0] - 1).astype(bool)
    return np.flatnonzero(m)


def window_floor(ts_ms: np.ndarray, width_ms: int) -> np.ndarray:
    """Shared tumbling-window assignment: FLOOR semantics (ts - ts % W),
    identical to stages/rollup.assign_windows — every windowed frame uses
    this one helper so pre-epoch timestamps can't land in different
    windows between the exact/approximate variants of an operator."""
    W = np.int64(width_ms)
    return ts_ms - ts_ms % W


def _ts_ms_numpy(ts_col) -> np.ndarray:
    ts = ts_col
    ts_ms = (pc.cast(pc.divide(pc.cast(ts, pa.int64()), 1000), pa.int64())
             if pa.types.is_timestamp(ts.type) and ts.type.unit == "us"
             else pc.cast(ts, pa.int64()))
    return ts_ms.to_numpy()


def _round6(arr: np.ndarray) -> np.ndarray:
    """Round half-AWAY-from-zero at 6dp — DuckDB's round() semantics
    (numpy's np.round is half-to-even and flips the last digit on exact
    .xxxxxx5 values, which decimal-like inputs hit constantly)."""
    arr = np.asarray(arr, dtype=np.float64)
    out = np.copysign(np.floor(np.abs(arr) * 1e6 + 0.5), arr) / 1e6
    return np.where(np.isfinite(arr), out, arr)


def basic_rollup_frame(core_ds, include_avg: bool = True) -> pa.Table:
    """Core rollup rows -> driver-facing (series_key, window_start, n,
    sum_value, min_value, max_value[, avg_value]), floats rounded to 6dp.

    include_avg=False exists for decimal-valued inputs (e.g. lineitem
    prices): sum/count there lands EXACTLY on 6dp half-boundaries, where
    a 1-ULP reduction-order difference vs the SQL oracle flips the
    rounded digit — means are only comparable for continuous values."""

    def fn(t: pa.Table) -> pa.Table:
        cols = [
            t["series_key"].combine_chunks() if isinstance(t["series_key"], pa.ChunkedArray) else t["series_key"],
            t["window_start"].combine_chunks() if isinstance(t["window_start"], pa.ChunkedArray) else t["window_start"],
            t["count"].combine_chunks() if isinstance(t["count"], pa.ChunkedArray) else t["count"],
            pa.array(_round6(t["sum"].to_numpy(zero_copy_only=False)), pa.float64()),
            pa.array(_round6(t["vmin"].to_numpy(zero_copy_only=False)), pa.float64()),
            pa.array(_round6(t["vmax"].to_numpy(zero_copy_only=False)), pa.float64()),
        ]
        names = ["series_key", "window_start", "n", "sum_value", "min_value",
                 "max_value"]
        if include_avg:
            # avg from the ROUNDED sum: when values are fixed-decimal (the
            # events table), round6(sum) lands on the same double on both
            # engine and SQL sides, so the division and the final rounding
            # are bit-identical even when sum/count sits exactly on a 6dp
            # half (where raw-mean rounding flips on ULP noise).
            s6 = _round6(t["sum"].to_numpy(zero_copy_only=False))
            cnt = t["count"].to_numpy(zero_copy_only=False).astype(np.float64)
            cols.append(pa.array(_round6(s6 / cnt), pa.float64()))
            names.append("avg_value")
        return pa.Table.from_arrays(cols, names=names)

    return core_ds.map_batches(fn, batch_format="pyarrow")


def gauge_last_frame(core_ds) -> pa.Table:
    """(series_key, window_start, last_value) — LWW gauge per window."""
    def fn(t: pa.Table) -> pa.Table:
        return t.select(["series_key", "window_start", "last"]) \
                .rename_columns(["series_key", "window_start", "last_value"])
    return core_ds.map_batches(fn, batch_format="pyarrow")


def cumulative_frame(core_ds):
    """Per-series running sum over PRESENT windows (no gap-fill), rounded:
    (series_key, window_start, window_sum, cumulative).

    Bucket-major: one map_groups call per scan bucket, all series of the
    bucket handled with segmented numpy (per-series np.cumsum keeps the
    reduction order — and therefore the bits — of the per-series path)."""

    def scan(g: pa.Table) -> pa.Table:
        order, starts, bounds, labels = _segments(
            g, ["window_start"], key_cols=("series_key", "metric_type"))
        g = g.combine_chunks()
        w = g["window_start"].to_numpy()[order]
        s = g["sum"].to_numpy(zero_copy_only=False)[order]
        cum = np.empty_like(s)
        for i in range(starts.size):
            lo, hi = bounds[i], bounds[i + 1]
            cum[lo:hi] = np.cumsum(s[lo:hi])
        series = np.repeat(labels["series_key"], np.diff(bounds))
        return pa.Table.from_arrays([
            pa.array(series, pa.string()),
            pa.array(w, pa.int64()),
            pa.array(_round6(s), pa.float64()),
            pa.array(_round6(cum), pa.float64()),
        ], names=["series_key", "window_start", "window_sum", "cumulative"])

    return _with_scan_bucket(core_ds).groupby("_scan_bucket").map_groups(
        scan, batch_format="pyarrow")


def rate_frame(core_ds, width_ms: int):
    """(series_key, window_start, n, rate) — meter marks/sec per window."""
    width_s = width_ms / 1000.0

    def fn(t: pa.Table) -> pa.Table:
        c = t["count"].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays([
            t["series_key"].combine_chunks() if isinstance(t["series_key"], pa.ChunkedArray) else t["series_key"],
            t["window_start"].combine_chunks() if isinstance(t["window_start"], pa.ChunkedArray) else t["window_start"],
            t["count"].combine_chunks() if isinstance(t["count"], pa.ChunkedArray) else t["count"],
            pa.array(_round6(c / width_s), pa.float64()),
        ], names=["series_key", "window_start", "n", "rate"])

    return core_ds.map_batches(fn, batch_format="pyarrow")


def gapfill_locf_frame(points_ds, width_ms: int, cfg: EngineConfig):
    """Dense per-series windows with LOCF'd last value:
    (series_key, window_start, last_value, gap_filled)."""
    from logtrics_ray.pipelines.rollup_pipeline import build_core_tiers  # noqa: cycle-free
    from logtrics_ray.stages.rollup import rollup_base
    from logtrics_ray.stages.seriesscan import finalize_tier
    core = rollup_base(points_ds, width_ms, cfg)
    fin = finalize_tier(core, width_ms, cfg.with_(gap_fill="locf"))

    def fn(t: pa.Table) -> pa.Table:
        return t.select(["series_key", "window_start", "last", "gap_filled"]) \
                .rename_columns(["series_key", "window_start", "last_value", "gap_filled"])

    return fin.map_batches(fn, batch_format="pyarrow")


def gapfill_linear_frame(points_ds, width_ms: int, cfg: EngineConfig):
    """Dense per-series windows with LINEAR-interpolated last value
    (np.interp: interior gaps interpolate between neighbors; edges are
    present by construction since the dense domain is [first, last]
    present window per series).  Values rounded to 6dp — interpolation
    does arithmetic, so the SQL oracle must round identically.
    Output: (series_key, window_start, last_value, gap_filled)."""
    from logtrics_ray.stages.rollup import rollup_base
    from logtrics_ray.stages.seriesscan import finalize_tier
    core = rollup_base(points_ds, width_ms, cfg)
    fin = finalize_tier(core, width_ms, cfg.with_(gap_fill="linear"))

    def fn(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays([
            t["series_key"].combine_chunks() if isinstance(t["series_key"], pa.ChunkedArray) else t["series_key"],
            t["window_start"].combine_chunks() if isinstance(t["window_start"], pa.ChunkedArray) else t["window_start"],
            pa.array(_round6(t["last"].to_numpy(zero_copy_only=False)), pa.float64()),
            t["gap_filled"].combine_chunks() if isinstance(t["gap_filled"], pa.ChunkedArray) else t["gap_filled"],
        ], names=["series_key", "window_start", "last_value", "gap_filled"])

    return fin.map_batches(fn, batch_format="pyarrow")


def timer_digest_frame(points_ds, width_ms: int, cfg: EngineConfig):
    """Timer semantics at scale: per-window count/min/max/mean + t-digest
    p50/p99 (approximate — the scale path; exact_percentile_frame is the
    bounded-cardinality exact path).  Rows-only vs SQL; accuracy is
    asserted against exact quantiles in tests.
    Output: (series_key, window_start, n, min_value, max_value, p50, p99)."""
    from logtrics_ray.stages.rollup import rollup_base

    def fn(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays([
            t["series_key"].combine_chunks() if isinstance(t["series_key"], pa.ChunkedArray) else t["series_key"],
            t["window_start"].combine_chunks() if isinstance(t["window_start"], pa.ChunkedArray) else t["window_start"],
            t["count"].combine_chunks() if isinstance(t["count"], pa.ChunkedArray) else t["count"],
            pa.array(_round6(t["vmin"].to_numpy(zero_copy_only=False)), pa.float64()),
            pa.array(_round6(t["vmax"].to_numpy(zero_copy_only=False)), pa.float64()),
            pa.array(_round6(t["p50"].to_numpy(zero_copy_only=False)), pa.float64()),
            pa.array(_round6(t["p99"].to_numpy(zero_copy_only=False)), pa.float64()),
        ], names=["series_key", "window_start", "n", "min_value", "max_value",
                  "p50", "p99"])

    core = rollup_base(points_ds, width_ms, cfg)
    return core.map_batches(fn, batch_format="pyarrow")


def ewma_frame(points_ds, width_ms: int, cfg: EngineConfig):
    """Meter EWMA rates (go-metrics' 1/5/15-min moving rates,
    /root/reference/graphite/graphite.go:141-151): per-window rate plus
    the three EWMA horizons from the per-series ordered scan.  A
    sequential recurrence -> rows-only vs SQL (bit-exact vs the python
    oracle in tests/test_conformance.py).
    Output: (series_key, window_start, rate, ewma_60s, ewma_300s, ewma_900s)."""
    from logtrics_ray.stages.rollup import rollup_base
    from logtrics_ray.stages.seriesscan import finalize_tier
    core = rollup_base(points_ds, width_ms, cfg)
    fin = finalize_tier(core, width_ms, cfg)

    def fn(t: pa.Table) -> pa.Table:
        cols = [t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray) else t[c]
                for c in ("series_key", "window_start")]
        cols += [pa.array(_round6(t[c].to_numpy(zero_copy_only=False)), pa.float64())
                 for c in ("rate", "ewma_60s", "ewma_300s", "ewma_900s")]
        return pa.Table.from_arrays(cols, names=["series_key", "window_start",
                                                 "rate", "ewma_60s", "ewma_300s",
                                                 "ewma_900s"])

    return fin.map_batches(fn, batch_format="pyarrow")


def ewma_oracle_frame(points_ds, width_ms: int, cfg: EngineConfig):
    """SQL-comparable EWMA frame: per-series dense windows, rate computed
    from the ROUNDED window sum (round6(round6(sum)/width_s) — the house
    boundary-safe pattern), then the EWMA recurrence over those identical
    doubles.  The DuckDB oracle replays the recurrence with a recursive
    CTE over the same rounded rates, so every step is bit-identical.
    Output: (series_key, window_start, rate, ewma_60s, ewma_300s,
    ewma_900s), all 6dp."""
    import math
    from logtrics_ray.stages.rollup import rollup_base
    from logtrics_ray.stages.seriesscan import _ewma
    core = rollup_base(points_ds, width_ms, cfg)
    width_s = width_ms / 1000.0
    alphas = [(tau, 1.0 - math.exp(-width_s / tau)) for tau in cfg.ewma_taus_s]

    def scan(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        w = g["window_start"].to_numpy()
        order = np.argsort(w, kind="stable")
        w = w[order]
        s = g["sum"].to_numpy(zero_copy_only=False)[order]
        W = np.int64(width_ms)
        dense = np.arange(w[0], w[-1] + W, W, dtype=np.int64)
        d_sum = np.zeros(dense.size)
        d_sum[((w - w[0]) // W).astype(np.int64)] = s
        rate = _round6(_round6(d_sum) / width_s)
        cols = [pa.array([g["series_key"][0].as_py()] * dense.size, pa.string()),
                pa.array(dense, pa.int64()),
                pa.array(rate, pa.float64())]
        names = ["series_key", "window_start", "rate"]
        for tau, alpha in alphas:
            cols.append(pa.array(_round6(_ewma(rate, alpha)), pa.float64()))
            names.append(f"ewma_{tau}s")
        return pa.Table.from_arrays(cols, names=names)

    return core.groupby(["series_key", "metric_type"]).map_groups(
        scan, batch_format="pyarrow")


def exact_percentile_frame(points_ds, width_ms: int, cfg: EngineConfig,
                           qs=(0.5, 0.99)):
    """EXACT per-window percentiles (numpy linear interpolation — the same
    estimator as DuckDB's quantile_cont), vectorized per series.

    The scale path for percentiles is the t-digest in rollup.py; this
    operator exists where exactness is required and per-(series, window)
    cardinality is bounded.  Output: (series_key, window_start, n, p50, p99).
    """
    ds = assign_windows(points_ds, width_ms, cfg)

    def per_series(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        w = g["window_start"].to_numpy()
        v = g["value"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, w))
        w, v = w[order], v[order]
        starts = np.flatnonzero(np.diff(w, prepend=w[0] - 1))
        bounds = np.append(starts, w.size)
        n = starts.size
        counts = np.diff(bounds).astype(np.int64)
        out_q = np.empty((n, len(qs)))
        for i in range(n):
            seg = v[bounds[i]:bounds[i + 1]]
            out_q[i] = np.quantile(seg, qs, method="linear")
        cols = [pa.array([g["series_key"][0].as_py()] * n, pa.string()),
                pa.array(w[starts], pa.int64()),
                pa.array(counts, pa.int64())] + \
               [pa.array(_round6(out_q[:, j]), pa.float64()) for j in range(len(qs))]
        names = ["series_key", "window_start", "n"] + \
                [f"p{str(q).replace('0.', '')}" for q in qs]
        return pa.Table.from_arrays(cols, names=names)

    return ds.groupby(["series_key", "metric_type"]).map_groups(
        per_series, batch_format="pyarrow")


def tier_oracle_frame(final_ds) -> "rd.Dataset":
    """Finalized tier rows -> the driver-facing, SQL-comparable frame for
    the flagship token rollup (the north rule's own pipeline).

    Keeps every column the DuckDB oracle can recompute — dense gap-filled
    windows, count/sum/min/max/avg, LOCF'd last, per-type cumulative and
    rate — and drops only the sequential-recurrence EWMA columns and the
    t-digest percentiles (pytest-checked instead; see
    ``token_rollup_full_1m``).  All floats rounded to 6dp; avg recomputed
    from the ROUNDED sum exactly like basic_rollup_frame so both sides
    divide identical doubles."""

    def fn(t: pa.Table) -> pa.Table:
        def col(name):
            c = t[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        cnt = t["count"].to_numpy(zero_copy_only=False).astype(np.float64)
        s6 = _round6(t["sum"].to_numpy(zero_copy_only=False))
        with np.errstate(invalid="ignore", divide="ignore"):
            avg = np.where(cnt > 0, _round6(s6 / cnt), np.nan)
        cols = [
            col("series_key"), col("metric_type"), col("window_start"),
            col("count"),
            pa.array(s6, pa.float64()),
            pa.array(_round6(t["vmin"].to_numpy(zero_copy_only=False)), pa.float64()),
            pa.array(_round6(t["vmax"].to_numpy(zero_copy_only=False)), pa.float64()),
            pa.array(avg, pa.float64()),
            pa.array(_round6(t["last"].to_numpy(zero_copy_only=False)), pa.float64()),
            pa.array(_round6(t["cumulative"].to_numpy(zero_copy_only=False)), pa.float64()),
            pa.array(_round6(t["rate"].to_numpy(zero_copy_only=False)), pa.float64()),
            col("gap_filled"),
        ]
        return pa.Table.from_arrays(cols, names=[
            "series_key", "metric_type", "window_start", "n", "sum_value",
            "min_value", "max_value", "avg_value", "last_value", "cumulative",
            "rate", "gap_filled"])

    return final_ds.map_batches(fn, batch_format="pyarrow")


def distinct_count_frame(ds, ts_col: str, key_col: str, member_col: str,
                         width_ms: int):
    """EXACT windowed distinct count (e.g. distinct users per event type
    per hour) — an aggregate family the reference lacks entirely.

    Two built-in vectorized aggregations, no per-group Python:
      1. dedupe: groupby(series, window, member).count() — each distinct
         member survives once,
      2. count: groupby(series, window).count() over the survivors.
    Output: (series_key, window_start, n_distinct)."""

    def prep(t: pa.Table) -> pa.Table:
        # window_floor: floor semantics shared with assign_windows and
        # the HLL variant, so exact and approximate distinct counts agree
        # on window assignment even for pre-epoch timestamps
        w = window_floor(_ts_ms_numpy(t[ts_col]), width_ms)
        return pa.Table.from_arrays([
            pc.cast(t[key_col], pa.string()), pa.array(w, pa.int64()),
            pc.cast(t[member_col], pa.int64())],
            names=["series_key", "window_start", "member"])

    deduped = (ds.map_batches(prep, batch_format="pyarrow")
               .groupby(["series_key", "window_start", "member"]).count())
    counted = deduped.groupby(["series_key", "window_start"]).count()

    def project(t: pa.Table) -> pa.Table:
        return (t.select(["series_key", "window_start", "count()"])
                 .rename_columns(["series_key", "window_start", "n_distinct"]))

    return counted.map_batches(project, batch_format="pyarrow")


def hll_distinct_frame(ds, ts_col: str, key_col: str, member_col: str,
                       width_ms: int, p: int = 12):
    """APPROXIMATE windowed distinct count via HyperLogLog — the scale
    path: per-batch partial sketches per (series, window) shuffle instead
    of every distinct member (state/hll.py; register-wise-max mergeable,
    std error ~1.04/sqrt(2^p)).  Output: (series_key, window_start,
    n_distinct_approx).  Accuracy asserted vs the exact path in tests."""
    from logtrics_ray.hashing import id_hash64_array
    from logtrics_ray.state.hll import HLL

    def partial(t: pa.Table) -> pa.Table:
        w = window_floor(_ts_ms_numpy(t[ts_col]), width_ms)
        key = pc.cast(t[key_col], pa.string())
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        members = pc.cast(pc.cast(t[member_col], pa.int64()), pa.string())
        h = id_hash64_array(members)
        kd = key.dictionary_encode() if not pa.types.is_dictionary(key.type) else key
        codes = kd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        labels = kd.dictionary.to_pylist()
        # group rows per (key code, window) locally, one sketch per cell
        order = np.lexsort((w, codes))
        c, ww, hh = codes[order], w[order], h[order]
        starts = np.flatnonzero(np.diff(c, prepend=c[0] - 1).astype(bool)
                                | np.diff(ww, prepend=ww[0] - 1).astype(bool)) \
            if c.size else np.array([], dtype=np.int64)
        bounds = np.append(starts, c.size)
        out_k, out_w, out_s = [], [], []
        for i in range(starts.size):
            lo, hi = bounds[i], bounds[i + 1]
            out_k.append(labels[c[lo]])
            out_w.append(int(ww[lo]))
            out_s.append(HLL.from_hashes(hh[lo:hi], p=p).to_bytes())
        return pa.Table.from_arrays([
            pa.array(out_k, pa.string()), pa.array(out_w, pa.int64()),
            pa.array(out_s, pa.binary())],
            names=["series_key", "window_start", "sketch"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        # bucket-major merge: ALL (series, window) cells of the bucket in
        # one call — registers stacked via a flat buffer view, merged with
        # one np.maximum.reduceat per segment, estimates vectorized
        # (HLL.estimate_rows is bit-equal to the scalar path).
        from logtrics_ray.state.hll import HLL as _H
        from logtrics_ray.stages.seriesscan import _label_ranks, dict_codes
        g = g.combine_chunks()
        codes, labels = dict_codes(g["series_key"])
        key = _label_ranks(labels)[codes]
        w = g["window_start"].to_numpy()
        regs, p_ = _H.registers_matrix(g["sketch"])
        order = np.lexsort((w, key))
        key_s, w_s = key[order], w[order]
        starts = _seg_change(key_s, w_s)
        merged = np.maximum.reduceat(regs[order], starts, axis=0) \
            if starts.size else np.empty((0, regs.shape[1]), np.uint8)
        est = np.round(_H.estimate_rows(merged, p_)).astype(np.int64)
        return pa.Table.from_arrays([
            pa.array(labels[codes[order][starts]], pa.string()),
            pa.array(w_s[starts], pa.int64()),
            pa.array(est, pa.int64()),
        ], names=["series_key", "window_start", "n_distinct_approx"])

    return _with_scan_bucket(partials).groupby("_scan_bucket").map_groups(
        merge, batch_format="pyarrow")


def write_hll_side_table(events_path: str, out_path: str, ts_col: str = "ts",
                         key_col: str = "event_type",
                         member_col: str = "user_id",
                         width_ms: int = 3_600_000, p: int = 12) -> str:
    """Deterministic per-(series, window) HLL REGISTER side table for the
    DuckDB replay oracle (the signature-side-table pattern): one row per
    NONZERO register — (series_key, window_start, rank).

    The registers come from the same hashing + HLL kernels the
    distributed ``hll_distinct_frame`` uses on a single-process pass over
    the events; the ESTIMATE (register sum, linear-counting branch,
    banker's-rounding to int — DuckDB's CAST(double AS BIGINT)) is
    replayed independently in SQL.  The register-wise-max merge property
    makes the single-pass registers equal the distributed partial-merge
    registers by construction, so the oracle checks both the sketch math
    and the exchange.  Sized for the correctness gate, not production."""
    import os

    import pyarrow.parquet as pq

    from logtrics_ray import hashing as H
    from logtrics_ray import state as _st
    from logtrics_ray.hashing import id_hash64_array
    from logtrics_ray.state.hll import HLL
    import logtrics_ray.state.hll as _hllmod

    fresh, mark = H.fixture_cache(
        [out_path], f"{H.source_version(_hllmod, H)}:{events_path}:"
                    f"{ts_col}:{key_col}:{member_col}:{width_ms}:{p}")
    if fresh:
        return out_path
    t = pq.read_table(events_path, columns=[ts_col, key_col, member_col])
    w = window_floor(_ts_ms_numpy(t[ts_col]), width_ms)
    key = pc.cast(t[key_col], pa.string())
    if isinstance(key, pa.ChunkedArray):
        key = key.combine_chunks()
    members = pc.cast(pc.cast(t[member_col], pa.int64()), pa.string())
    h = id_hash64_array(members)
    kd = key.dictionary_encode()
    codes = kd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    labels = kd.dictionary.to_pylist()
    order = np.lexsort((w, codes))
    c, ww, hh = codes[order], w[order], h[order]
    starts = np.flatnonzero(np.diff(c, prepend=c[0] - 1).astype(bool)
                            | np.diff(ww, prepend=ww[0] - 1).astype(bool)) \
        if c.size else np.array([], dtype=np.int64)
    bounds = np.append(starts, c.size)
    out_k, out_w, out_r = [], [], []
    for i in range(starts.size):
        lo, hi = bounds[i], bounds[i + 1]
        regs = HLL.from_hashes(hh[lo:hi], p=p).registers
        nz = np.flatnonzero(regs)
        out_k.extend([labels[c[lo]]] * nz.size)
        out_w.extend([int(ww[lo])] * nz.size)
        out_r.extend(regs[nz].tolist())
    tmp = out_path + ".tmp"
    pq.write_table(pa.table({"series_key": pa.array(out_k, pa.string()),
                             "window_start": pa.array(out_w, pa.int64()),
                             "rank": pa.array(out_r, pa.int32())}), tmp)
    os.replace(tmp, out_path)
    mark()
    return out_path


def write_tdigest_side_table(events_path: str, out_path: str,
                             ts_col: str = "ts", key_col: str = "event_type",
                             id_col: str = "event_id",
                             value_col: str = "value",
                             width_ms: int = 3_600_000,
                             salt_buckets: int = 8) -> str:
    """Deterministic per-(series, window) t-digest CENTROID side table for
    the DuckDB replay oracle: one row per centroid —
    (series_key, window_start, idx, mean, weight).

    Construction mirrors the distributed rollup's exact topology with the
    same TDigest kernels: per-salt (tiebreak % S) unit-weight digests
    from sorted values, merged in salt-ascending order.  The QUANTILE
    estimate (midpoint cumulative weights, end clamps, linear
    interpolation) is replayed independently in SQL — weights are exact
    integers and the midpoint arithmetic is dyadic, so the SQL replay is
    bit-equal to ``TDigest.quantile``.  Sized for the correctness gate."""
    import os

    import pyarrow.parquet as pq

    from logtrics_ray import hashing as H
    from logtrics_ray.state.tdigest import TDigest
    import logtrics_ray.state.tdigest as _tdmod

    fresh, mark = H.fixture_cache(
        [out_path], f"{H.source_version(_tdmod, H)}:{events_path}:{ts_col}:"
                    f"{key_col}:{id_col}:{value_col}:{width_ms}:{salt_buckets}")
    if fresh:
        return out_path
    t = pq.read_table(events_path, columns=[id_col, ts_col, key_col, value_col])
    ts = t[ts_col]
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    if pa.types.is_timestamp(ts.type):
        ts_ms = pc.cast(pc.divide(pc.cast(ts, pa.int64()), 1000), pa.int64()) \
            if ts.type.unit == "us" else pc.cast(ts, pa.int64())
    else:
        ts_ms = pc.cast(ts, pa.int64())
    w = (ts_ms.to_numpy() // width_ms) * width_ms
    key = pc.cast(t[key_col], pa.string())
    if isinstance(key, pa.ChunkedArray):
        key = key.combine_chunks()
    kd = key.dictionary_encode()
    codes = kd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    labels = kd.dictionary.to_pylist()
    tb = pc.cast(t[id_col], pa.uint64()).to_numpy(zero_copy_only=False)
    salt = (tb % np.uint64(salt_buckets)).astype(np.int64)
    v = pc.cast(t[value_col], pa.float64()).to_numpy(zero_copy_only=False)

    _write_digest_cells(codes, labels, w, salt, v, out_path)
    mark()
    return out_path


def _write_digest_cells(codes: np.ndarray, labels: list, w: np.ndarray,
                        salt: np.ndarray, v: np.ndarray,
                        out_path: str) -> None:
    """Shared digest-cell kernel of the t-digest side-table writers: per
    (series, window) cell, per-salt unit-weight digests from values in
    salt-ascending order merged with ``TDigest.merge_all`` — the exact
    topology of the distributed rollup (`stages/rollup.py` `_merge_cell`).
    Emits one parquet row per centroid."""
    import os

    import pyarrow.parquet as pq

    from logtrics_ray.state.tdigest import TDigest

    order = np.lexsort((salt, w, codes))
    c, ww, ss, vv = codes[order], w[order], salt[order], v[order]
    cell_starts = np.flatnonzero(np.diff(c, prepend=c[0] - 1).astype(bool)
                                 | np.diff(ww, prepend=ww[0] - 1).astype(bool)) \
        if c.size else np.array([], dtype=np.int64)
    cell_bounds = np.append(cell_starts, c.size)
    out_k, out_w, out_i, out_m, out_wt = [], [], [], [], []
    for i in range(cell_starts.size):
        lo, hi = cell_bounds[i], cell_bounds[i + 1]
        s_seg = ss[lo:hi]
        s_starts = np.flatnonzero(np.diff(s_seg, prepend=s_seg[0] - 1))
        s_bounds = np.append(s_starts, s_seg.size)
        digs = [TDigest.from_values(vv[lo + s_bounds[j]:lo + s_bounds[j + 1]])
                for j in range(s_starts.size)]
        d = TDigest.merge_all(digs)
        nc = d.means.size
        out_k.extend([labels[c[lo]]] * nc)
        out_w.extend([int(ww[lo])] * nc)
        out_i.extend(range(nc))
        out_m.extend(d.means.tolist())
        out_wt.extend(d.weights.tolist())
    tmp = out_path + ".tmp"
    pq.write_table(pa.table({"series_key": pa.array(out_k, pa.string()),
                             "window_start": pa.array(out_w, pa.int64()),
                             "idx": pa.array(out_i, pa.int64()),
                             "mean": pa.array(out_m, pa.float64()),
                             "weight": pa.array(out_wt, pa.float64())}), tmp)
    os.replace(tmp, out_path)


def write_token_tdigest_side_table(token_text_dir: str, out_path: str,
                                   epoch0_ms: int, horizon_ms: int,
                                   width_ms: int = 60_000,
                                   salt_buckets: int = 8) -> str:
    """Token-pipeline analog of ``write_tdigest_side_table`` for the
    full-tier DuckDB oracle: timer points are re-derived from the
    DETOKENIZED side table with a plain regex (the one timer arm,
    ``latency_ms=(\\d+)`` -> series ``lt.latency.<source>``), event time
    and salt from the stored per-doc ``tiebreak`` exactly as the engine
    synthesizes them (ts = epoch0 + tiebreak % horizon, salt = tiebreak %
    S), then the same per-salt digest topology as the events writer.
    The QUANTILE estimate is replayed independently in SQL."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from logtrics_ray import hashing as H
    import logtrics_ray.state.tdigest as _tdmod

    src_marker = os.path.join(os.path.dirname(token_text_dir.rstrip("/")),
                              "_DONE")
    src_tag = (open(src_marker).read().strip()
               if os.path.exists(src_marker) else "?")
    fresh, mark = H.fixture_cache(
        [out_path], f"{H.source_version(_tdmod, H)}:{token_text_dir}:"
                    f"{src_tag}:{epoch0_ms}:{horizon_ms}:{width_ms}:"
                    f"{salt_buckets}")
    if fresh:
        return out_path
    names = sorted(n for n in os.listdir(token_text_dir)
                   if n.endswith(".parquet"))
    t = pa.concat_tables([
        pq.read_table(os.path.join(token_text_dir, n),
                      columns=["text", "source", "tiebreak"]) for n in names])
    text = t["text"].combine_chunks()
    m = pc.extract_regex(text, r"latency_ms=(?P<v>\d+)")
    ok = pc.is_valid(m).to_numpy(zero_copy_only=False)
    # filter to matches BEFORE touching the struct child: field() does
    # not carry the parent validity, so null slots hold '' placeholders
    v = pc.cast(m.filter(pa.array(ok)).field("v"),
                pa.float64()).to_numpy(zero_copy_only=False)
    src = np.asarray(t["source"].to_pylist(), dtype=object)[ok]
    tb = t["tiebreak"].to_numpy(zero_copy_only=False).astype(np.uint64)[ok]
    ts = epoch0_ms + (tb % np.uint64(horizon_ms)).astype(np.int64)
    w = (ts // width_ms) * width_ms
    salt = (tb % np.uint64(salt_buckets)).astype(np.int64)
    series = pa.array(["lt.latency." + s for s in src], pa.string())
    kd = series.dictionary_encode()
    codes = kd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    labels = kd.dictionary.to_pylist()
    _write_digest_cells(codes, labels, w, salt, v, out_path)
    mark()
    return out_path


def full_tier_oracle_frame(fin_ds):
    """SQL-comparable projection of a FULL finalized tier (all 20
    columns): float columns rounded half-away at 6dp on the engine side
    (the oracle SQL rounds identically), ints/bools passed through."""
    from logtrics_ray.stages.seriesscan import FINAL_SCHEMA

    def fn(t: pa.Table) -> pa.Table:
        cols, names = [], []
        for f in FINAL_SCHEMA:
            a = t[f.name].combine_chunks() if isinstance(
                t[f.name], pa.ChunkedArray) else t[f.name]
            if pa.types.is_float64(f.type):
                a = pa.array(_round6(a.to_numpy(zero_copy_only=False)),
                             pa.float64())
            cols.append(a)
            names.append(f.name)
        return pa.Table.from_arrays(cols, names=names)

    return fin_ds.map_batches(fn, batch_format="pyarrow")


def delta_frame(core_ds):
    """Window-over-window DELTA of the gauge last value (≙ Graphite's
    ``derivative`` function family): per series over PRESENT windows
    sorted ascending, delta = last - previous last (null for the first
    window).  Output: (series_key, window_start, last_value, delta)."""

    def scan(g: pa.Table) -> pa.Table:
        order, starts, bounds, labels = _segments(
            g, ["window_start"], key_cols=("series_key", "metric_type"))
        g = g.combine_chunks()
        w = g["window_start"].to_numpy()[order]
        last6 = _round6(g["last"].to_numpy(zero_copy_only=False)[order])
        # fully vectorized across the bucket: shifted difference, then
        # NaN at every segment start (no per-series loop at all)
        delta = np.empty_like(last6)
        if last6.size:
            delta[1:] = _round6(last6[1:] - last6[:-1])
        delta[starts] = np.nan
        series = np.repeat(labels["series_key"], np.diff(bounds))
        return pa.Table.from_arrays([
            pa.array(series, pa.string()),
            pa.array(w, pa.int64()),
            pa.array(last6, pa.float64()),
            pa.array(delta, pa.float64()),
        ], names=["series_key", "window_start", "last_value", "delta"])

    return _with_scan_bucket(core_ds).groupby("_scan_bucket").map_groups(
        scan, batch_format="pyarrow")


def session_frame(ds, ts_col: str, key_col: str, id_col: str,
                  gap_ms: int = 30 * 60_000):
    """Gap-based SESSION WINDOWS — the classic streaming windowing the
    tumbling/hopping family can't express: per key, consecutive events
    closer than ``gap_ms`` belong to one session.

    Per-key ordered scan (``groupby(key).map_groups``; sessions of one
    key must see each other, keys are independent — the engine's
    standard sequential-recurrence confinement, like EWMA/LOCF).
    Deterministic order: (ts, id).  Output one row per session:
    (series_key, session_start, session_end, n_events, duration_ms)."""

    def prep(t: pa.Table) -> pa.Table:
        ts = t[ts_col]
        ts_ms = (pc.cast(pc.divide(pc.cast(ts, pa.int64()), 1000), pa.int64())
                 if pa.types.is_timestamp(ts.type) and ts.type.unit == "us"
                 else pc.cast(ts, pa.int64()))
        return pa.Table.from_arrays(
            [pc.cast(t[key_col], pa.string()), ts_ms,
             pc.cast(t[id_col], pa.int64())],
            names=["series_key", "ts_ms", "row_id"])

    def sessions(g: pa.Table) -> pa.Table:
        # bucket-major and loop-free: session breaks = inactivity gap OR
        # key change; per-session stats via segment bounds; each session's
        # key label looked up with one searchsorted against the key
        # segment starts.
        order, kstarts, _, labels = _segments(g, ["ts_ms", "row_id"])
        g = g.combine_chunks()
        ts = g["ts_ms"].to_numpy()[order]
        new_session = np.empty(ts.size, dtype=bool)
        if ts.size:
            new_session[1:] = np.diff(ts) > gap_ms
        new_session[kstarts] = True
        starts = np.flatnonzero(new_session)
        bounds = np.append(starts, ts.size)
        s_start = ts[starts]
        s_end = ts[bounds[1:] - 1]
        seg_of = np.searchsorted(kstarts, starts, side="right") - 1
        return pa.Table.from_arrays([
            pa.array(labels["series_key"][seg_of], pa.string()),
            pa.array(s_start, pa.int64()),
            pa.array(s_end, pa.int64()),
            pa.array(np.diff(bounds).astype(np.int64), pa.int64()),
            pa.array(s_end - s_start, pa.int64()),
        ], names=["series_key", "session_start", "session_end", "n_events",
                  "duration_ms"])

    return (_with_scan_bucket(ds.map_batches(prep, batch_format="pyarrow"))
            .groupby("_scan_bucket").map_groups(sessions, batch_format="pyarrow"))


def window_topk_members_frame(ds, ts_col: str, key_col: str, member_col: str,
                              width_ms: int, k: int = 3):
    """Windowed HEAVY HITTERS: top-k members (e.g. users) by event count
    per (series, window), deterministic tiebreak by member asc.

    Counts reduce with one built-in vectorized aggregation; the top-k
    selection is a vectorized per-window slice inside map_groups over the
    (already tiny) count rows.  Output: (series_key, window_start, rank,
    member, n_events)."""

    def prep(t: pa.Table) -> pa.Table:
        w = window_floor(_ts_ms_numpy(t[ts_col]), width_ms)
        return pa.Table.from_arrays([
            pc.cast(t[key_col], pa.string()), pa.array(w, pa.int64()),
            pc.cast(t[member_col], pa.int64())],
            names=["series_key", "window_start", "member"])

    counts = (ds.map_batches(prep, batch_format="pyarrow")
              .groupby(["series_key", "window_start", "member"]).count())

    def topk(g: pa.Table) -> pa.Table:
        # bucket-major and loop-free: one lexsort orders every
        # (series, window) cell by (-count, member); rank-within-cell is
        # position minus the cell's start; keep rank <= k.
        from logtrics_ray.stages.seriesscan import _label_ranks, dict_codes
        g = g.combine_chunks()
        codes, labels = dict_codes(g["series_key"])
        key = _label_ranks(labels)[codes]
        w = g["window_start"].to_numpy()
        c = g["count()"].to_numpy(zero_copy_only=False)
        m = g["member"].to_numpy(zero_copy_only=False)
        order = np.lexsort((m, -c, w, key))
        key_s, w_s = key[order], w[order]
        starts = _seg_change(key_s, w_s)
        rank = np.arange(key_s.size) - np.repeat(starts, np.diff(
            np.append(starts, key_s.size))) + 1
        keep = rank <= k
        return pa.Table.from_arrays([
            pa.array(labels[codes[order][keep]], pa.string()),
            pa.array(w_s[keep], pa.int64()),
            pa.array(rank[keep], pa.int64()),
            pa.array(m[order][keep], pa.int64()),
            pa.array(c[order][keep], pa.int64()),
        ], names=["series_key", "window_start", "rank", "member", "n_events"])

    return _with_scan_bucket(counts).groupby("_scan_bucket").map_groups(
        topk, batch_format="pyarrow")


def topk_series_frame(points_ds, k: int = 10):
    """Hottest series by point count (diagnostic top-k, SURVEY §2.6):
    (series_key, n) — deterministic tiebreak by series_key.

    Distributed sort + limit: only the k winners reach the driver (the
    per-series count table itself can be corpus-sized at scale)."""
    agg = points_ds.groupby("series_key").count()
    top = (agg.sort(["count()", "series_key"], descending=[True, False])
              .limit(k))
    df = top.to_pandas().rename(columns={"count()": "n"})
    return pa.Table.from_pandas(df[["series_key", "n"]], preserve_index=False)


def multiwidth_rollup_frame(text_ds, rules, cfg, default_width_ms: int):
    """PER-RULE WINDOW-WIDTH rollup — the reference's per-rule
    ``graphite{interval=}`` override (/root/reference/logtrics.go:86-97,
    125-129: a rule's graphite table merges over the global config, and
    ``interval`` is its flush cadence ≙ this engine's smallest-tier
    window width).  Each rule's points are bucketed at its OWN width
    (``RuleSpec.window_ms``, i.e. interval seconds × 1000), falling back
    to ``default_width_ms``.

    Shape: ONE rule-tagged extraction pass (no second read per width),
    width lookup per-LABEL (O(distinct rules) Python per batch, codes
    gather for the rows), per-row ``ts - ts % W`` window floor with the
    per-row width vector, then ONE grouped exchange over
    (series, metric_type, width, window) with segmented-numpy count/sum.

    Output: (series_key, metric_type, width_ms, window_start, n,
    sum_value) — SPARSE (present windows only; gap-fill/tier cascade
    stay per-width jobs of the main pipeline)."""
    from logtrics_ray.stages.extract import extract_points
    from logtrics_ray.stages.seriesscan import dict_codes

    width_of = {r.name: (r.window_ms or int(default_width_ms))
                for r in rules}
    pts = extract_points(text_ds, rules, cfg, text_column="text",
                         tag_rule=True)

    def bucketize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "series_key": pa.array([], pa.string()),
                "metric_type": pa.array([], pa.string()),
                "width_ms": pa.array([], pa.int64()),
                "window_start": pa.array([], pa.int64()),
                "value": pa.array([], pa.float64())})
        t = t.combine_chunks()
        codes, labels = dict_codes(t["rule"])
        wmap = np.array([width_of[str(l)] for l in labels], np.int64)
        W = wmap[codes]
        ts = t["ts_ms"].to_numpy()
        w = ts - ts % W                    # window_floor, per-row width
        return pa.table({
            "series_key": t["series_key"],
            "metric_type": t["metric_type"],
            "width_ms": pa.array(W, pa.int64()),
            "window_start": pa.array(w, pa.int64()),
            "value": t["value"]})

    core = _with_scan_bucket(
        pts.map_batches(bucketize, batch_format="pyarrow"))

    def scan(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "series_key": pa.array([], pa.string()),
            "metric_type": pa.array([], pa.string()),
            "width_ms": pa.array([], pa.int64()),
            "window_start": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "sum_value": pa.array([], pa.float64())})
        if g.num_rows == 0:
            return empty
        order, starts, bounds, labels = _segments(
            g, ["width_ms", "window_start"],
            key_cols=("series_key", "metric_type"))
        g = g.combine_chunks()
        W = g["width_ms"].to_numpy()[order]
        w = g["window_start"].to_numpy()[order]
        v = g["value"].to_numpy(zero_copy_only=False)[order]
        sz = w.size
        seg_of = np.searchsorted(starts, np.arange(sz), side="right") - 1
        gst = _seg_change(seg_of, W, w)
        n = np.diff(np.append(gst, sz))
        s = np.add.reduceat(v, gst)
        sk = labels["series_key"][seg_of[gst]]
        mt = labels["metric_type"][seg_of[gst]]
        return pa.table({
            "series_key": pa.array(sk, pa.string()),
            "metric_type": pa.array(mt, pa.string()),
            "width_ms": pa.array(W[gst], pa.int64()),
            "window_start": pa.array(w[gst], pa.int64()),
            "n": pa.array(n, pa.int64()),
            "sum_value": pa.array(_round6(s), pa.float64())})

    return core.groupby("_scan_bucket").map_groups(
        scan, batch_format="pyarrow")
