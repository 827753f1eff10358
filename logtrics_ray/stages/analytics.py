"""Tier analytics: rolling z-score anomaly detection and LTTB downsampling.

Both operate on rollup-tier rows (the engine's core output), bucket-major
(one ``map_groups`` call per scan bucket, segmented numpy inside — never
one Python call per series), and both are designed for hash-exact DuckDB
replay:

- ``anomaly_frame`` keeps the rolling baseline in the INTEGER domain
  (exact cumsums of window counts and squared counts), so the mean /
  sample-variance / z expressions are single float expressions over
  exact ints — bit-identical to the SQL window-sum replay.
- ``lttb_frame`` scales the LTTB triangle area by the next bucket's
  point count, eliminating the anchor-average division: the area
  comparison is EXACT int64 arithmetic, so the argmax (tiebreak:
  smallest x) is decidable without float ties on both sides.

Reference provenance: the reference engine downsamples only by
re-bucketing (metrics.go tick flush); visual-fidelity downsampling
(LTTB) and baseline alerting are the round-3 additions a Graphite-class
rollup store pairs with these tiers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from logtrics_ray.pipelines.table_rollup import (_segments, _with_scan_bucket,
                                                 window_floor)


def anomaly_frame(core_ds, k: int = 24):
    """Rolling z-score ANOMALY DETECTION over a rollup tier.

    Per series over PRESENT windows sorted ascending, the baseline for
    each window is the previous ``k`` windows' event counts — a row
    frame, exactly SQL's ``ROWS BETWEEN k PRECEDING AND 1 PRECEDING``:

        S = sum(n), Q = sum(n*n)            (exact int64 rolling sums)
        mean = S / k
        var  = (k*Q - S*S) / (k*(k-1))      (sample variance)
        z    = (n - mean) / sqrt(var)

    Rows with fewer than ``k`` predecessors emit NULL baseline and no
    flag; a zero-variance baseline flags any departure from it.
    ``is_anomaly`` is decided on the UNROUNDED z (|z| > 3); published
    floats are rounded to 6dp.

    Output: (series_key, window_start, n, mean_prev, std_prev, z,
    is_anomaly).
    """
    from logtrics_ray.pipelines.table_rollup import _round6
    kf = float(k)

    def scan(g: pa.Table) -> pa.Table:
        order, starts, bounds, labels = _segments(
            g, ["window_start"], key_cols=("series_key", "metric_type"))
        g = g.combine_chunks()
        w = g["window_start"].to_numpy()[order]
        n = g["count"].to_numpy(zero_copy_only=False)[order].astype(np.int64)
        sz = n.size
        # numpy int64 wraps silently; the DuckDB replay promotes to
        # HUGEINT — guard the exact cumsums (sum n, sum n*n) loudly so a
        # 10^12-scale count skew can never pick a wrong baseline quietly
        if sz and float(n.max()) ** 2 * sz >= 2.0 ** 62:
            raise OverflowError(
                "anomaly_frame: sum(count^2) may exceed int64 for this "
                f"scan bucket (max count {int(n.max())}, {sz} windows); "
                "narrow the window width or shard the series")
        idx = np.arange(sz, dtype=np.int64)
        seg_of = (np.searchsorted(starts, idx, side="right") - 1
                  if sz else idx)
        pos = idx - (starts[seg_of] if sz else idx)
        c1 = np.concatenate(([0], np.cumsum(n)))
        c2 = np.concatenate(([0], np.cumsum(n * n)))
        full = pos >= k                     # has a complete k-row baseline
        # exact rolling sums over the k rows preceding row i (i-k .. i-1);
        # rows whose lookback would cross into the previous segment all
        # have pos < k and are masked by ``full``, so S/Q stay in-segment.
        S = c1[idx] - c1[np.maximum(idx - k, 0)]
        Q = c2[idx] - c2[np.maximum(idx - k, 0)]
        mean = np.where(full, S / kf, np.nan)
        num = (k * Q - S * S).astype(np.float64)
        var = np.where(full, num / (kf * (k - 1)), np.nan)
        std = np.sqrt(var)
        with np.errstate(invalid="ignore", divide="ignore"):
            z = np.where(full & (num > 0), (n - mean) / std, np.nan)
        flag = np.where(
            num > 0, np.abs(z) > 3.0, n.astype(np.float64) != mean)
        series = np.repeat(labels["series_key"], np.diff(bounds)) \
            if sz else np.array([], dtype=object)
        zmask = ~(full & (num > 0))
        return pa.Table.from_arrays([
            pa.array(series, pa.string()),
            pa.array(w, pa.int64()),
            pa.array(n, pa.int64()),
            pa.array(np.ma.masked_array(_round6(mean), ~full), pa.float64()),
            pa.array(np.ma.masked_array(_round6(std), ~full), pa.float64()),
            pa.array(np.ma.masked_array(_round6(z), zmask), pa.float64()),
            pa.array(np.ma.masked_array(flag, ~full), pa.bool_()),
        ], names=["series_key", "window_start", "n", "mean_prev",
                  "std_prev", "z", "is_anomaly"])

    return _with_scan_bucket(core_ds).groupby("_scan_bucket").map_groups(
        scan, batch_format="pyarrow")


def m4_frame(core_ds, pixels: int = 32):
    """M4 DOWNSAMPLE of each series' count curve (Jugel et al., VLDB
    2014): split the series' time RANGE into ``pixels`` equal spans and
    keep, per span, the first / last / min / max points — the four
    points per pixel column that make a line rendering of the
    downsample pixel-identical to the full series.

    Per series over PRESENT windows sorted ascending:

        pixel(w) = (w - w_first) * P // (w_last - w_first + 1)

    (pure int64; empty pixels simply emit no row).  Per (series, pixel)
    the output carries t_first/n_first, t_min/n_min, t_max/n_max,
    t_last/n_last where t_min / t_max are the EARLIEST window achieving
    the extremum — every field exact int64, so the SQL GROUP BY replay
    is bit-identical with no float tiebreaks.

    Output: (series_key, pixel, t_first, n_first, t_min, n_min,
    t_max, n_max, t_last, n_last), one row per non-empty pixel.
    """
    if pixels < 1:
        raise ValueError("pixels must be >= 1")
    P = int(pixels)

    def scan(g: pa.Table) -> pa.Table:
        order, starts, bounds, labels = _segments(
            g, ["window_start"], key_cols=("series_key", "metric_type"))
        g = g.combine_chunks()
        w = g["window_start"].to_numpy()[order]
        y = g["count"].to_numpy(zero_copy_only=False)[order].astype(np.int64)
        sz = w.size
        if sz == 0:
            return pa.Table.from_arrays(
                [pa.array([], t) for t in
                 (pa.string(),) + (pa.int64(),) * 9],
                names=["series_key", "pixel", "t_first", "n_first",
                       "t_min", "n_min", "t_max", "n_max",
                       "t_last", "n_last"])
        lens = np.diff(bounds)
        w0 = np.repeat(w[starts], lens)                  # series first w
        span = np.repeat(w[bounds[1:] - 1] - w[starts] + 1, lens)
        # (w - w0) * P stays far inside int64 for ms timestamps (span
        # <= ~3e13 ms per century x P) — same expression the SQL runs
        px = (w - w0) * P // span
        seg_of = np.searchsorted(starts, np.arange(sz), side="right") - 1
        # group = (segment, pixel) change points; px is nondecreasing
        # within a segment, so one diff pass finds every group start
        gkey = seg_of * P + px
        gst = np.flatnonzero(np.diff(gkey, prepend=gkey[0] - 1))
        gend = np.append(gst[1:], sz)
        n_min = np.minimum.reduceat(y, gst)
        n_max = np.maximum.reduceat(y, gst)
        # earliest window achieving the extremum: mask non-extreme rows
        # to +inf sentinel, then a min-reduceat over w (exact, no keys)
        big = np.iinfo(np.int64).max
        grp_of = np.searchsorted(gst, np.arange(sz), side="right") - 1
        t_min = np.minimum.reduceat(
            np.where(y == n_min[grp_of], w, big), gst)
        t_max = np.minimum.reduceat(
            np.where(y == n_max[grp_of], w, big), gst)
        series = labels["series_key"][seg_of[gst]]
        return pa.Table.from_arrays([
            pa.array(series, pa.string()),
            pa.array(px[gst], pa.int64()),
            pa.array(w[gst], pa.int64()),
            pa.array(y[gst], pa.int64()),
            pa.array(t_min, pa.int64()),
            pa.array(n_min, pa.int64()),
            pa.array(t_max, pa.int64()),
            pa.array(n_max, pa.int64()),
            pa.array(w[gend - 1], pa.int64()),
            pa.array(y[gend - 1], pa.int64()),
        ], names=["series_key", "pixel", "t_first", "n_first",
                  "t_min", "n_min", "t_max", "n_max",
                  "t_last", "n_last"])

    return _with_scan_bucket(core_ds).groupby("_scan_bucket").map_groups(
        scan, batch_format="pyarrow")


def seasonal_frame(core_ds):
    """SEASONAL BASELINE residuals: each window's count vs the series'
    hour-of-day average (the classic seasonal-naive decomposition a
    rollup store runs for "is this hour unusual *for this hour*?").

    Per series, hod = (window_start // 3_600_000) % 24 and the baseline
    for a window is mean(count) over the series' PRESENT windows sharing
    that hod.  The mean is ONE float division over exact int64 sums
    (S/m), and residual = n - S/m is computed before rounding — both
    single expressions the SQL window-aggregate replay evaluates in the
    identical order, so the match is bit-exact.

    Output: (series_key, window_start, hod, n, hod_mean, residual),
    one row per present window; floats rounded to 6dp.
    """
    from logtrics_ray.pipelines.table_rollup import _round6
    HOUR = 3_600_000

    def scan(g: pa.Table) -> pa.Table:
        order, starts, bounds, labels = _segments(
            g, ["window_start"], key_cols=("series_key", "metric_type"))
        g = g.combine_chunks()
        w = g["window_start"].to_numpy()[order]
        n = g["count"].to_numpy(zero_copy_only=False)[order].astype(np.int64)
        sz = w.size
        if sz == 0:
            return pa.Table.from_arrays([
                pa.array([], pa.string()), pa.array([], pa.int64()),
                pa.array([], pa.int64()), pa.array([], pa.int64()),
                pa.array([], pa.float64()), pa.array([], pa.float64()),
            ], names=["series_key", "window_start", "hod", "n",
                      "hod_mean", "residual"])
        # post-epoch only: numpy floors w//HOUR and yields non-negative
        # %, DuckDB truncates toward zero — pre-epoch windows would
        # bucket into different hours and break the bit-exact replay
        # (same loud-guard posture as value_hist_frame's key packing)
        if sz and int(w.min()) < 0:
            raise ValueError(
                "seasonal_frame: pre-epoch window_start "
                f"({int(w.min())} ms) — hour-of-day bucketing is only "
                "oracle-exact for post-epoch timestamps")
        hod = (w // HOUR) % 24
        seg_of = np.searchsorted(starts, np.arange(sz), side="right") - 1
        # exact int64 per-(segment, hod) sums: sort rows by the combined
        # key once, reduceat group sums, then scatter means back per row
        gkey = seg_of * 24 + hod
        o2 = np.argsort(gkey, kind="stable")
        gk_s = gkey[o2]
        gst = np.flatnonzero(np.diff(gk_s, prepend=gk_s[0] - 1))
        S = np.add.reduceat(n[o2], gst)
        m = np.diff(np.append(gst, sz))
        grp_of_sorted = np.searchsorted(gst, np.arange(sz),
                                        side="right") - 1
        mean_sorted = S[grp_of_sorted].astype(np.float64) / m[grp_of_sorted]
        mean = np.empty(sz, dtype=np.float64)
        mean[o2] = mean_sorted
        resid = n - mean
        series = labels["series_key"][seg_of]
        return pa.Table.from_arrays([
            pa.array(series, pa.string()),
            pa.array(w, pa.int64()),
            pa.array(hod, pa.int64()),
            pa.array(n, pa.int64()),
            pa.array(_round6(mean), pa.float64()),
            pa.array(_round6(resid), pa.float64()),
        ], names=["series_key", "window_start", "hod", "n",
                  "hod_mean", "residual"])

    return _with_scan_bucket(core_ds).groupby("_scan_bucket").map_groups(
        scan, batch_format="pyarrow")


def seasonal_oracle_sql(width_ms: int, k_table: str = "events",
                        key_col: str = "event_type",
                        ts_col: str = "ts") -> str:
    """DuckDB replay of ``seasonal_frame`` — identical S/m expression."""
    return f"""
    WITH agg AS (
      SELECT {key_col} AS sk,
             (epoch_ms({ts_col}) // {width_ms}) * {width_ms} AS w,
             count(*)::BIGINT AS n
      FROM {k_table} GROUP BY 1, 2),
    h AS (SELECT sk, w, n, (w // 3600000) % 24 AS hod FROM agg)
    SELECT sk AS series_key, w AS window_start, hod, n,
           round(sum(n) OVER g / (count(*) OVER g * 1.0), 6) AS hod_mean,
           round(n - sum(n) OVER g / (count(*) OVER g * 1.0), 6)
             AS residual
    FROM h
    WINDOW g AS (PARTITION BY sk, hod)"""


AGG_RULES = (("error", "max"), ("purchase|signup", "sum"))
AGG_DEFAULT = "mean"


def storage_agg_view_frame(core_ds, rules=AGG_RULES,
                           default: str = AGG_DEFAULT):
    """GRAPHITE STORAGE-AGGREGATION view: each series' published tier
    value is chosen by the first PATTERN rule its name matches —
    carbon's storage-aggregation.conf semantics (aggregationMethod per
    name pattern), applied over the engine's own tier columns.

    Methods: count/sum/min/max/mean/last mapped onto the tier row's
    exact columns; per-LABEL regex matching (one re2 search per
    distinct series per batch, never per row — Arrow and DuckDB both
    speak RE2, so the oracle replays the identical pattern strings).

    Output: (series_key, window_start, agg_method, value) — value
    rounded 6dp (already-exact count passes through as float for one
    schema).
    """
    import re

    from logtrics_ray.pipelines.table_rollup import _round6
    from logtrics_ray.stages.seriesscan import dict_codes

    compiled = [(re.compile(p), m) for p, m in rules]
    col_of = {"count": "count", "sum": "sum", "min": "vmin",
              "max": "vmax", "mean": "mean", "last": "last"}
    for _, m in list(rules) + [(None, default)]:
        if m not in col_of:
            raise ValueError(f"unknown aggregation method {m!r}")

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "series_key": pa.array([], pa.string()),
                "window_start": pa.array([], pa.int64()),
                "agg_method": pa.array([], pa.string()),
                "value": pa.array([], pa.float64())})
        t = t.combine_chunks()
        codes, labels = dict_codes(t["series_key"])
        meth = np.empty(len(labels), dtype=object)
        for i, lab in enumerate(labels):
            meth[i] = next((m for rx, m in compiled if rx.search(lab)),
                           default)
        cols = {m: t[col_of[m]].to_numpy(zero_copy_only=False)
                     .astype(np.float64)
                for m in set(meth.tolist())}
        val = np.empty(t.num_rows, np.float64)
        meth_row = meth[codes]
        for m, arr in cols.items():
            sel = meth_row == m
            val[sel] = arr[sel]
        return pa.table({
            "series_key": t["series_key"],
            "window_start": t["window_start"],
            "agg_method": pa.array(meth_row, pa.string()),
            "value": pa.array(_round6(val), pa.float64())})

    return core_ds.map_batches(fn, batch_format="pyarrow")


def storage_agg_view_oracle_sql(width_ms: int, rules=AGG_RULES,
                                default: str = AGG_DEFAULT,
                                k_table: str = "events",
                                key_col: str = "event_type",
                                ts_col: str = "ts") -> str:
    """DuckDB replay — identical RE2 pattern strings, first match wins."""
    expr = {"count": "CAST(n AS DOUBLE)", "sum": "s", "min": "mn",
            "max": "mx",
            "mean": "s / n", "last": "lastv"}
    meth_case = " ".join(
        f"WHEN regexp_matches(sk, '{p}') THEN '{m}'"
        for p, m in rules) + f" ELSE '{default}'"
    val_case = " ".join(
        f"WHEN regexp_matches(sk, '{p}') THEN {expr[m]}"
        for p, m in rules) + f" ELSE {expr[default]}"
    return f"""
    WITH agg AS (
      SELECT {key_col} AS sk,
             (epoch_ms({ts_col}) // {width_ms}) * {width_ms} AS w,
             count(*)::BIGINT AS n, sum(value) AS s,
             min(value) AS mn, max(value) AS mx,
             arg_max(value, epoch_ms({ts_col})::HUGEINT * 4294967296
                            + event_id) AS lastv
      FROM {k_table} GROUP BY 1, 2)
    SELECT sk AS series_key, w AS window_start,
           CASE {meth_case} END AS agg_method,
           round(CASE {val_case} END, 6) AS value
    FROM agg"""


def head_sample_frame(points_ds, width_ms: int, n: int = 5):
    """HEAD SAMPLING: keep only the FIRST ``n`` events per (series,
    window) — the trace-sampling primitive observability pipelines run
    at the edge to bound per-window retained volume while keeping
    every (series, window) represented.

    Deterministic which-n: events order by (ts_ms, tiebreak) where
    tiebreak embeds the source event id — identical to the SQL replay's
    ORDER BY (epoch_ms(ts), event_id), so the kept SET matches even
    under timestamp collisions at the cut.  One bucket-major scan
    (the shuffle the tier scan already uses); rank-within-window is a
    cumcount off the window change points, no per-group Python.

    Output: (series_key, window_start, ts_ms, value, rank) for kept
    events only, rank 0-based within the window.
    """
    W, N = int(width_ms), int(n)
    if N < 1:
        raise ValueError("n must be >= 1")

    def scan(g: pa.Table) -> pa.Table:
        order, starts, bounds, labels = _segments(
            g, ["ts_ms", "tiebreak"], key_cols=("series_key",))
        g = g.combine_chunks()
        ts = g["ts_ms"].to_numpy(zero_copy_only=False)[order]
        v = g["value"].to_numpy(zero_copy_only=False)[order]
        sz = ts.size
        if sz == 0:
            return pa.Table.from_arrays([
                pa.array([], pa.string()), pa.array([], pa.int64()),
                pa.array([], pa.int64()), pa.array([], pa.float64()),
                pa.array([], pa.int64()),
            ], names=["series_key", "window_start", "ts_ms", "value",
                      "rank"])
        w = window_floor(ts, W)
        seg_of = np.searchsorted(starts, np.arange(sz), side="right") - 1
        # group starts where (segment, window) changes
        gst_mask = np.zeros(sz, bool)
        gst_mask[starts] = True
        gst_mask[1:] |= w[1:] != w[:-1]
        gstarts = np.flatnonzero(gst_mask)
        grp_of = np.searchsorted(gstarts, np.arange(sz),
                                 side="right") - 1
        rank = np.arange(sz) - gstarts[grp_of]
        keep = rank < N
        return pa.Table.from_arrays([
            pa.array(labels["series_key"][seg_of[keep]], pa.string()),
            pa.array(w[keep], pa.int64()),
            pa.array(ts[keep], pa.int64()),
            pa.array(v[keep], pa.float64()),
            pa.array(rank[keep], pa.int64()),
        ], names=["series_key", "window_start", "ts_ms", "value",
                  "rank"])

    return _with_scan_bucket(points_ds).groupby("_scan_bucket").map_groups(
        scan, batch_format="pyarrow")


def head_sample_oracle_sql(width_ms: int, n: int = 5,
                           k_table: str = "events",
                           key_col: str = "event_type",
                           ts_col: str = "ts") -> str:
    """DuckDB replay of ``head_sample_frame`` (row_number QUALIFY)."""
    return f"""
    SELECT {key_col} AS series_key,
           (epoch_ms({ts_col}) // {width_ms}) * {width_ms}
             AS window_start,
           epoch_ms({ts_col}) AS ts_ms, value,
           row_number() OVER (
             PARTITION BY {key_col},
                          (epoch_ms({ts_col}) // {width_ms})
             ORDER BY epoch_ms({ts_col}), event_id) - 1 AS rank
    FROM {k_table}
    QUALIFY rank < {n}"""


HIST_BOUNDS = (1.0, 5.0, 10.0, 25.0, 50.0, 100.0, 250.0)


def value_hist_frame(points_ds, width_ms: int,
                     bounds: tuple[float, ...] = HIST_BOUNDS):
    """HISTOGRAM METRIC: per (series, window) distribution of the raw
    point VALUES over fixed le-boundaries — the Prometheus-histogram
    shape (counts per bucket; cumulative "le" counts are a running sum
    away) that p50/p95 summaries can't replace when buckets feed
    alerting or heatmap UIs.

    bin(v) = index of the first boundary b with v <= b, overflow bin
    len(bounds) ("+Inf") — exact double compares against literal
    boundaries shared with the SQL CASE replay, so counts are
    bit-identical ints.  Stateless per batch: one packed
    (series, window, bin) np.unique partial per batch, then a tiny
    groupby.sum — only nonzero bins ever shuffle (the same sparse-
    partial shape vocab_counts uses).

    Output: (series_key, window_start, bin, le_label, n), nonzero bins
    only.
    """
    from logtrics_ray.stages.seriesscan import dict_codes

    b = np.asarray(bounds, np.float64)
    if b.size == 0 or np.any(np.diff(b) <= 0):
        raise ValueError("bounds must be strictly increasing")
    labels_le = [repr(float(x)) for x in b] + ["+Inf"]
    NBIN = b.size + 1
    W = int(width_ms)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "series_key": pa.array([], pa.string()),
            "window_start": pa.array([], pa.int64()),
            "bin": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.combine_chunks()
        codes, sk = dict_codes(t["series_key"])
        ts = t["ts_ms"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["value"].to_numpy(zero_copy_only=False)
        bn = np.searchsorted(b, v, side="left")
        # packed key: (series, window-index, bin) — window indices are
        # epoch//W (< 2^40 for ms epochs), bins < 2^8, series batch-local;
        # (rest // NBIN) * W below reconstructs exactly window_floor(ts, W)
        wi = ts // W
        # int64 wraps silently; guard the packing loudly (house rule):
        # the key adds bn <= NBIN-1, so the largest packed low part is
        # wi.max()*NBIN + NBIN - 1 — guard the +1 width, not wi*NBIN
        if codes.size and (int(codes.max()) >= 1 << 15
                           or (int(wi.max()) + 1) * NBIN > 1 << 48
                           or int(wi.min()) < 0):
            raise OverflowError(
                "value_hist_frame: packed (series, window, bin) key "
                f"would overflow int64 (distinct series {codes.max()+1}, "
                f"window index {wi.max()}); shrink the batch or widen W")
        key = (codes.astype(np.int64) * (1 << 48)
               + wi * NBIN + bn)
        uk, cnt = np.unique(key, return_counts=True)
        kc = uk >> 48
        rest = uk & ((1 << 48) - 1)
        return pa.table({
            "series_key": pa.array(sk[kc], pa.string()),
            "window_start": pa.array((rest // NBIN) * W, pa.int64()),
            "bin": pa.array(rest % NBIN, pa.int64()),
            "n": pa.array(cnt, pa.int64())})

    agg = (points_ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["series_key", "window_start", "bin"]).sum("n"))

    def finish(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        bn = t["bin"].to_numpy(zero_copy_only=False)
        lab = np.array(labels_le, dtype=object)[bn]
        return pa.Table.from_arrays([
            t["series_key"], t["window_start"], t["bin"],
            pa.array(lab, pa.string()),
            t["sum(n)"],
        ], names=["series_key", "window_start", "bin", "le_label", "n"])

    return agg.map_batches(finish, batch_format="pyarrow")


def value_hist_oracle_sql(width_ms: int,
                          bounds: tuple[float, ...] = HIST_BOUNDS,
                          k_table: str = "events",
                          key_col: str = "event_type",
                          ts_col: str = "ts") -> str:
    """DuckDB replay of ``value_hist_frame`` — same literal boundaries."""
    cases = " ".join(
        f"WHEN value <= {float(x)!r} THEN {i}"
        for i, x in enumerate(bounds))
    lab = ", ".join(f"({i}, '{float(x)!r}')"
                    for i, x in enumerate(bounds))
    lab += f", ({len(bounds)}, '+Inf')"
    return f"""
    WITH lbl(bin, le_label) AS (VALUES {lab}),
    p AS (
      SELECT {key_col} AS sk,
             (epoch_ms({ts_col}) // {width_ms}) * {width_ms} AS w,
             CASE {cases} ELSE {len(bounds)} END AS bin
      FROM {k_table}),
    c AS (
      SELECT sk, w, bin, count(*)::BIGINT AS n
      FROM p GROUP BY 1, 2, 3)
    SELECT c.sk AS series_key, c.w AS window_start, c.bin::BIGINT AS bin,
           lbl.le_label, c.n
    FROM c JOIN lbl USING (bin)"""


def holt_frame(core_ds, alpha: float = 0.5, beta: float = 0.3):
    """HOLT LINEAR (double-exponential) smoothing of each series' count
    curve — level + trend state, the classic short-horizon forecaster a
    rollup store runs beside plain EWMA when series drift:

        l_0 = y_0,  b_0 = 0
        l_t = a*y_t + (1-a)*(l_{t-1} + b_{t-1})
        b_t = B*(l_t - l_{t-1}) + (1-B)*b_{t-1}

    over PRESENT windows sorted ascending.  The recurrence is evaluated
    step-by-step with the SAME float expressions (and literal a, 1-a,
    B, 1-B coefficients) the SQL recursive-CTE replay uses, in the same
    order, so raw doubles are bit-identical — no closed form needed at
    tier widths (the 1d tier is a few hundred steps; the 1m-tier
    closed-form trick lives in _ewma_1m_sql).  The step loop is
    vectorized ACROSS series of the scan bucket (state = (l, b) pair
    per series), never per-series Python.

    Output: (series_key, window_start, n, level, trend, forecast_next)
    with floats rounded to 6dp; forecast_next = l + b (the one-step
    forecast for the NEXT window).
    """
    from logtrics_ray.pipelines.table_rollup import _round6
    a, be = float(alpha), float(beta)
    oma, omb = 1.0 - a, 1.0 - be

    def scan(g: pa.Table) -> pa.Table:
        order, starts, bounds, labels = _segments(
            g, ["window_start"], key_cols=("series_key", "metric_type"))
        g = g.combine_chunks()
        w = g["window_start"].to_numpy()[order]
        n = g["count"].to_numpy(zero_copy_only=False)[order].astype(np.int64)
        sz = w.size
        if sz == 0:
            return pa.Table.from_arrays([
                pa.array([], pa.string()), pa.array([], pa.int64()),
                pa.array([], pa.int64()), pa.array([], pa.float64()),
                pa.array([], pa.float64()), pa.array([], pa.float64()),
            ], names=["series_key", "window_start", "n", "level",
                      "trend", "forecast_next"])
        y = n.astype(np.float64)
        lens = np.diff(bounds)
        lv = np.empty(sz, np.float64)
        tr = np.empty(sz, np.float64)
        l = y[starts].copy()
        b = np.zeros(starts.size, np.float64)
        lv[starts], tr[starts] = l, b
        for t in range(1, int(lens.max())):
            act = np.flatnonzero(lens > t)
            rows = starts[act] + t
            yt = y[rows]
            lt = a * yt + oma * (l[act] + b[act])
            bt = be * (lt - l[act]) + omb * b[act]
            l[act], b[act] = lt, bt
            lv[rows], tr[rows] = lt, bt
        seg_of = np.searchsorted(starts, np.arange(sz), side="right") - 1
        return pa.Table.from_arrays([
            pa.array(labels["series_key"][seg_of], pa.string()),
            pa.array(w, pa.int64()),
            pa.array(n, pa.int64()),
            pa.array(_round6(lv), pa.float64()),
            pa.array(_round6(tr), pa.float64()),
            pa.array(_round6(lv + tr), pa.float64()),
        ], names=["series_key", "window_start", "n", "level", "trend",
                  "forecast_next"])

    return _with_scan_bucket(core_ds).groupby("_scan_bucket").map_groups(
        scan, batch_format="pyarrow")


def holt_oracle_sql(width_ms: int, alpha: float = 0.5, beta: float = 0.3,
                    k_table: str = "events", key_col: str = "event_type",
                    ts_col: str = "ts") -> str:
    """Recursive-CTE replay of ``holt_frame``: one step per window rank,
    identical float expressions with the coefficients inlined at full
    precision (repr) from the same Python floats the engine multiplies
    by."""
    a, be = float(alpha), float(beta)
    oma, omb = 1.0 - a, 1.0 - be
    return f"""
    WITH RECURSIVE agg AS (
      SELECT {key_col} AS sk,
             (epoch_ms({ts_col}) // {width_ms}) * {width_ms} AS w,
             count(*)::BIGINT AS y
      FROM {k_table} GROUP BY 1, 2),
    r AS (
      SELECT sk, w, y,
             row_number() OVER (PARTITION BY sk ORDER BY w) - 1 AS i
      FROM agg),
    rec AS (
      SELECT sk, w, y, i, CAST(y AS DOUBLE) AS l,
             CAST(0 AS DOUBLE) AS b
      FROM r WHERE i = 0
      UNION ALL
      SELECT r.sk, r.w, r.y, r.i,
             {a!r} * r.y + {oma!r} * (rec.l + rec.b) AS l,
             {be!r} * (({a!r} * r.y + {oma!r} * (rec.l + rec.b)) - rec.l)
               + {omb!r} * rec.b AS b
      FROM rec JOIN r ON r.sk = rec.sk AND r.i = rec.i + 1)
    SELECT sk AS series_key, w AS window_start, y AS n,
           round(l, 6) AS level, round(b, 6) AS trend,
           round(l + b, 6) AS forecast_next
    FROM rec"""


def threshold_cross_frame(core_ds, threshold: int):
    """THRESHOLD-CROSSING detector: emit one row per window where a
    series' count crosses the threshold — up (prev < T <= cur) or down
    (prev >= T > cur) — the alert-edge primitive a rollup store feeds
    to notification routing (fire on edges, not on every breaching
    window).  Pure int64 compares against the lagged neighbour inside
    each sorted series segment; bit-identical to the SQL lag() replay.

    Output: (series_key, window_start, n, prev_n, direction) for
    crossing windows only; a series' first window never fires.
    """
    T = int(threshold)

    def scan(g: pa.Table) -> pa.Table:
        order, starts, bounds, labels = _segments(
            g, ["window_start"], key_cols=("series_key", "metric_type"))
        g = g.combine_chunks()
        w = g["window_start"].to_numpy()[order]
        n = g["count"].to_numpy(zero_copy_only=False)[order].astype(np.int64)
        sz = w.size
        empty = pa.Table.from_arrays([
            pa.array([], pa.string()), pa.array([], pa.int64()),
            pa.array([], pa.int64()), pa.array([], pa.int64()),
            pa.array([], pa.string()),
        ], names=["series_key", "window_start", "n", "prev_n",
                  "direction"])
        if sz == 0:
            return empty
        prev = np.empty(sz, dtype=np.int64)
        prev[1:] = n[:-1]
        prev[0] = n[0]
        has_prev = np.ones(sz, dtype=bool)
        has_prev[starts] = False                 # segment firsts: no lag
        up = has_prev & (prev < T) & (n >= T)
        down = has_prev & (prev >= T) & (n < T)
        hit = np.flatnonzero(up | down)
        if hit.size == 0:
            return empty
        seg_of = np.searchsorted(starts, hit, side="right") - 1
        return pa.Table.from_arrays([
            pa.array(labels["series_key"][seg_of], pa.string()),
            pa.array(w[hit], pa.int64()),
            pa.array(n[hit], pa.int64()),
            pa.array(prev[hit], pa.int64()),
            pa.array(np.where(up[hit], "up", "down"), pa.string()),
        ], names=["series_key", "window_start", "n", "prev_n",
                  "direction"])

    return _with_scan_bucket(core_ds).groupby("_scan_bucket").map_groups(
        scan, batch_format="pyarrow")


def threshold_cross_oracle_sql(width_ms: int, threshold: int,
                               k_table: str = "events",
                               key_col: str = "event_type",
                               ts_col: str = "ts") -> str:
    """DuckDB replay of ``threshold_cross_frame`` (lag window)."""
    T = int(threshold)
    return f"""
    WITH agg AS (
      SELECT {key_col} AS sk,
             (epoch_ms({ts_col}) // {width_ms}) * {width_ms} AS w,
             count(*)::BIGINT AS n
      FROM {k_table} GROUP BY 1, 2),
    l AS (
      SELECT sk, w, n,
             lag(n) OVER (PARTITION BY sk ORDER BY w) AS pn
      FROM agg)
    SELECT sk AS series_key, w AS window_start, n, pn AS prev_n,
           CASE WHEN n >= {T} THEN 'up' ELSE 'down' END AS direction
    FROM l
    WHERE pn IS NOT NULL
      AND ((pn < {T} AND n >= {T}) OR (pn >= {T} AND n < {T}))"""


def m4_oracle_sql(width_ms: int, pixels: int = 32, k_table: str = "events",
                  key_col: str = "event_type", ts_col: str = "ts") -> str:
    """DuckDB replay of ``m4_frame`` — pure int GROUP BY, no floats."""
    return f"""
    WITH agg AS (
      SELECT {key_col} AS sk,
             (epoch_ms({ts_col}) // {width_ms}) * {width_ms} AS w,
             count(*)::BIGINT AS y
      FROM {k_table} GROUP BY 1, 2),
    ext AS (
      SELECT sk, w, y,
             min(w) OVER (PARTITION BY sk) AS w0,
             max(w) OVER (PARTITION BY sk) AS w1
      FROM agg),
    px AS (
      SELECT sk, w, y, ((w - w0) * {pixels}) // (w1 - w0 + 1) AS pixel
      FROM ext),
    px2 AS (
      SELECT *, min(y) OVER (PARTITION BY sk, pixel) AS gmin,
                max(y) OVER (PARTITION BY sk, pixel) AS gmax
      FROM px)
    SELECT sk AS series_key, pixel,
           min(w) AS t_first, arg_min(y, w) AS n_first,
           min(w) FILTER (WHERE y = gmin) AS t_min, min(y) AS n_min,
           min(w) FILTER (WHERE y = gmax) AS t_max, max(y) AS n_max,
           max(w) AS t_last, arg_max(y, w) AS n_last
    FROM px2 GROUP BY 1, 2"""


def lttb_frame(core_ds, n_out: int = 24):
    """Largest-Triangle-Three-Buckets DOWNSAMPLE of each series' count
    curve to ``n_out`` points (the standard visual-fidelity downsampler
    for time-series UIs; Steinarsson 2013).

    Per series over PRESENT windows sorted ascending, with x = window
    start (ms, made relative to the series' first window) and
    y = window count: keep the first and last points, split the N-2
    interior points into B = n_out-2 index buckets
    (bucket(i) = (i-1)*B // (N-2) for 0-based interior i), and from each
    bucket keep the point maximizing the triangle area with the
    previously KEPT point and the next bucket's centroid (the last point
    for the final bucket).  Series with N <= n_out pass through whole.

    The area comparison is exact int64: with the next bucket's count m
    and coordinate sums (Sx, Sy),

        m * area ~ |(m*px - Sx)*(cy - py) - (px - cx)*(Sy - m*py)|

    so the argmax (tiebreak: smallest x) is float-free and the DuckDB
    unrolled-CTE replay is bit-identical.  The B-step recurrence runs as
    a loop over buckets VECTORIZED ACROSS ALL SERIES of the scan bucket
    (state = one (px, py) pair per series), not per series.

    Output: (series_key, rank, window_start, n) — rank is the selection
    order (0-based) within the series.
    """
    if n_out < 3:
        raise ValueError("n_out must be >= 3")
    B = n_out - 2

    def scan(g: pa.Table) -> pa.Table:
        order, starts, bounds, labels = _segments(
            g, ["window_start"], key_cols=("series_key", "metric_type"))
        g = g.combine_chunks()
        w = g["window_start"].to_numpy()[order]
        y = g["count"].to_numpy(zero_copy_only=False)[order].astype(np.int64)
        nseg = starts.size
        lens = np.diff(bounds)
        x = w - (np.repeat(w[starts], lens) if nseg else w)  # relative ms

        sel_rows: list[np.ndarray] = []   # absolute row indices kept
        sel_rank: list[np.ndarray] = []

        # small series (N <= n_out) pass through whole
        small = lens <= n_out
        if small.any():
            s_st, s_len = starts[small], lens[small]
            tot = int(s_len.sum())
            base = np.repeat(s_st, s_len)
            within = np.arange(tot) - np.repeat(np.cumsum(s_len) - s_len,
                                                s_len)
            sel_rows.append(base + within)
            sel_rank.append(within)

        big = ~small
        if big.any():
            b_st = starts[big]                    # segment start rows
            b_len = lens[big]
            M = b_len - 2                         # interior point count
            # exact-int area term (m*px - Sx)*(y - py) - (px - x)*(Sy - m*py)
            # must stay inside int64 (the SQL replay promotes to HUGEINT;
            # numpy would wrap silently and pick wrong points) — bound it
            # with the largest bucket size, coordinate and count
            m_max = float(int(M.max()) // B + 2)
            x_max = float(x.max()) if x.size else 0.0
            y_max = float(y.max()) if y.size else 0.0
            if 8.0 * m_max * max(x_max, 1.0) * max(y_max, 1.0) >= 2.0 ** 62:
                raise OverflowError(
                    "lttb_frame: exact-int triangle area may exceed int64 "
                    f"(bucket ~{int(m_max)} pts, x span {int(x_max)} ms, "
                    f"max count {int(y_max)}); raise n_out or split the "
                    "time range")
            last = b_st + b_len - 1
            # exact prefix sums of interior coords for bucket centroids
            c1x = np.concatenate(([0], np.cumsum(x)))
            c1y = np.concatenate(([0], np.cumsum(y)))
            # state: previously kept point per big segment
            px, py = x[b_st].copy(), y[b_st].copy()
            picks = np.empty((B, b_st.size), dtype=np.int64)
            for b in range(B):
                # absolute candidate range of bucket b per segment; CEIL
                # boundaries — the partition induced by the per-point
                # formula bucket(j) = (j*B)//M used in the SQL replay
                lo = b_st + 1 + (b * M + B - 1) // B
                hi = b_st + 1 + ((b + 1) * M + B - 1) // B
                # anchor = next bucket's (m, Sx, Sy), or the last point
                if b + 1 < B:
                    alo = b_st + 1 + ((b + 1) * M + B - 1) // B
                    ahi = b_st + 1 + ((b + 2) * M + B - 1) // B
                    m = ahi - alo
                    Sx = c1x[ahi] - c1x[alo]
                    Sy = c1y[ahi] - c1y[alo]
                else:
                    m = np.ones_like(b_st)
                    Sx, Sy = x[last], y[last]
                L = hi - lo
                seg_id = np.repeat(np.arange(b_st.size), L)
                within = np.arange(int(L.sum())) - np.repeat(
                    np.cumsum(L) - L, L)
                cand = np.repeat(lo, L) + within
                area = np.abs(
                    (m[seg_id] * px[seg_id] - Sx[seg_id]) * (y[cand] - py[seg_id])
                    - (px[seg_id] - x[cand]) * (Sy[seg_id] - m[seg_id] * py[seg_id]))
                # per-segment argmax, tiebreak smallest x == first in scan
                # order (cand ascending): lexsort seg asc, area desc, cand asc
                o = np.lexsort((cand, -area, seg_id))
                first = np.zeros(o.size, dtype=bool)
                first[np.flatnonzero(np.diff(seg_id[o], prepend=-1))] = True
                win = cand[o][first]
                picks[b] = win
                px, py = x[win], y[win]
            # assemble: first, B picks, last — already in rank order
            rows = np.concatenate(
                [b_st[None, :], picks, last[None, :]], axis=0)
            sel_rows.append(rows.T.ravel())
            sel_rank.append(np.tile(np.arange(n_out, dtype=np.int64),
                                    b_st.size))

        rows = (np.concatenate(sel_rows) if sel_rows
                else np.array([], dtype=np.int64))
        rank = (np.concatenate(sel_rank) if sel_rank
                else np.array([], dtype=np.int64))
        seg_of = (np.searchsorted(starts, rows, side="right") - 1
                  if rows.size else rows)
        series = (labels["series_key"][seg_of] if rows.size
                  else np.array([], dtype=object))
        return pa.Table.from_arrays([
            pa.array(series, pa.string()),
            pa.array(rank, pa.int64()),
            pa.array(w[rows], pa.int64()),
            pa.array(y[rows], pa.int64()),
        ], names=["series_key", "rank", "window_start", "n"])

    return _with_scan_bucket(core_ds).groupby("_scan_bucket").map_groups(
        scan, batch_format="pyarrow")


def lttb_oracle_sql(width_ms: int, n_out: int = 24, k_table: str = "events",
                    key_col: str = "event_type", ts_col: str = "ts") -> str:
    """Unrolled-CTE DuckDB replay of ``lttb_frame`` (exact int arithmetic).

    One (max-area, min-x, join-back) CTE triple per interior bucket —
    B = n_out-2 stages, generated textually.  Series with N <= n_out
    pass through; the big-series branch replays the recurrence exactly.
    """
    B = n_out - 2
    parts = [f"""
    agg AS MATERIALIZED (
      SELECT {key_col} AS sk,
             (epoch_ms({ts_col}) // {width_ms}) * {width_ms} AS w,
             count(*)::BIGINT AS y
      FROM {k_table} GROUP BY 1, 2),
    pts AS MATERIALIZED (
      SELECT sk, w, y,
             w - min(w) OVER (PARTITION BY sk) AS x,
             row_number() OVER (PARTITION BY sk ORDER BY w) - 1 AS i,
             count(*) OVER (PARTITION BY sk) AS nn
      FROM agg),
    small AS (
      SELECT sk, i AS rank, w AS window_start, y AS n FROM pts
      WHERE nn <= {n_out}),
    interior AS MATERIALIZED (
      SELECT sk, x, y, w, ((i - 1) * {B}) // (nn - 2) AS b
      FROM pts WHERE nn > {n_out} AND i >= 1 AND i <= nn - 2),
    lastpt AS (
      SELECT sk, x, y, w FROM pts WHERE nn > {n_out} AND i = nn - 1),
    firstpt AS (
      SELECT sk, x, y, w FROM pts WHERE nn > {n_out} AND i = 0),
    bstat AS (
      SELECT sk, b, count(*)::BIGINT AS m, sum(x)::BIGINT AS sx,
             sum(y)::BIGINT AS sy
      FROM interior GROUP BY 1, 2),
    anchors AS MATERIALIZED (
      SELECT sk, b - 1 AS b, m, sx, sy FROM bstat WHERE b >= 1
      UNION ALL
      SELECT sk, {B - 1}, 1::BIGINT, x, y FROM lastpt),
    sel0 AS MATERIALIZED (SELECT sk, x AS px, y AS py FROM firstpt)"""]
    for b in range(B):
        parts.append(f"""
    cand{b} AS MATERIALIZED (
      SELECT i.sk, i.x, i.y,
             abs((a.m * s.px - a.sx) * (i.y - s.py)
                 - (s.px - i.x) * (a.sy - a.m * s.py)) AS area
      FROM interior i
      JOIN sel{b} s USING (sk)
      JOIN anchors a ON a.sk = i.sk AND a.b = {b}
      WHERE i.b = {b}),
    pick{b} AS MATERIALIZED (
      SELECT c.sk, min(c.x) AS px
      FROM cand{b} c
      JOIN (SELECT sk, max(area) AS ma FROM cand{b} GROUP BY 1) mx
        ON mx.sk = c.sk AND c.area = mx.ma
      GROUP BY 1),
    sel{b + 1} AS MATERIALIZED (
      SELECT p.sk, p.px, i.y AS py, i.w
      FROM pick{b} p JOIN interior i ON i.sk = p.sk AND i.x = p.px)""")
    picks_union = "\n      UNION ALL\n".join(
        f"      SELECT sk, {b + 1} AS rank, w AS window_start, py AS n "
        f"FROM sel{b + 1}" for b in range(B))
    return ("WITH" + ",".join(parts) + f"""
    SELECT sk AS series_key, rank, window_start, n FROM small
    UNION ALL
    SELECT sk AS series_key, 0 AS rank, w AS window_start, y AS n
    FROM firstpt
    UNION ALL
{picks_union}
    UNION ALL
    SELECT sk AS series_key, {n_out - 1} AS rank, w AS window_start,
           y AS n
    FROM lastpt""")


def derivative_frame(core_ds, non_negative: bool = True):
    """DERIVATIVE of each series' count curve — graphite's
    ``derivative()`` / ``nonNegativeDerivative()`` render functions
    (the reference's sink feeds a Graphite stack; these are the
    functions its users run over stored series).  Per series over
    PRESENT windows sorted ascending: delta = n - lag(n); with
    ``non_negative`` a negative delta publishes NULL (counter-reset
    semantics) instead of a misleading negative rate.  Pure int64
    against the lagged neighbour; bit-identical to the SQL lag()
    replay.  A series' first window emits no row (no lag).

    Output: (series_key, window_start, n, prev_n, delta).
    """

    def scan(g: pa.Table) -> pa.Table:
        order, starts, bounds, labels = _segments(
            g, ["window_start"], key_cols=("series_key", "metric_type"))
        g = g.combine_chunks()
        w = g["window_start"].to_numpy()[order]
        n = g["count"].to_numpy(zero_copy_only=False)[order].astype(np.int64)
        sz = w.size
        empty = pa.Table.from_arrays([
            pa.array([], pa.string()), pa.array([], pa.int64()),
            pa.array([], pa.int64()), pa.array([], pa.int64()),
            pa.array([], pa.int64()),
        ], names=["series_key", "window_start", "n", "prev_n", "delta"])
        if sz == 0:
            return empty
        prev = np.empty(sz, dtype=np.int64)
        prev[1:] = n[:-1]
        prev[0] = n[0]
        has_prev = np.ones(sz, dtype=bool)
        has_prev[starts] = False
        hit = np.flatnonzero(has_prev)
        if hit.size == 0:
            return empty
        seg_of = np.searchsorted(starts, hit, side="right") - 1
        delta = n[hit] - prev[hit]
        dmask = (delta < 0) if non_negative else np.zeros(hit.size, bool)
        return pa.Table.from_arrays([
            pa.array(labels["series_key"][seg_of], pa.string()),
            pa.array(w[hit], pa.int64()),
            pa.array(n[hit], pa.int64()),
            pa.array(prev[hit], pa.int64()),
            pa.array(np.ma.masked_array(delta, dmask), pa.int64()),
        ], names=["series_key", "window_start", "n", "prev_n", "delta"])

    return _with_scan_bucket(core_ds).groupby("_scan_bucket").map_groups(
        scan, batch_format="pyarrow")


def derivative_oracle_sql(width_ms: int, non_negative: bool = True,
                          k_table: str = "events",
                          key_col: str = "event_type",
                          ts_col: str = "ts") -> str:
    """DuckDB replay of ``derivative_frame`` (lag window + reset NULL)."""
    d = ("CASE WHEN n - pn < 0 THEN NULL ELSE n - pn END"
         if non_negative else "n - pn")
    return f"""
    WITH agg AS (
      SELECT {key_col} AS sk,
             (epoch_ms({ts_col}) // {width_ms}) * {width_ms} AS w,
             count(*)::BIGINT AS n
      FROM {k_table} GROUP BY 1, 2),
    l AS (
      SELECT sk, w, n,
             lag(n) OVER (PARTITION BY sk ORDER BY w) AS pn
      FROM agg)
    SELECT sk AS series_key, w AS window_start, n, pn AS prev_n,
           {d} AS delta
    FROM l WHERE pn IS NOT NULL"""


def timeshift_compare_frame(core_ds, shift_ms: int):
    """TIME-SHIFT comparison — graphite's ``timeShift()`` composed with
    a diff: each window's count vs the SAME series' count one
    ``shift_ms`` earlier (day-over-day / week-over-week deltas, the
    standard seasonal-drift readout).  Within each sorted series
    segment the shifted partner is found by ONE searchsorted of
    (w - shift) into the segment's own window array — no join, no
    second pass; rows emit only when the shifted window EXISTS.  Pure
    int64; bit-identical to the SQL self-join replay.

    Output: (series_key, window_start, n, n_shifted, delta).
    """
    S = int(shift_ms)

    def scan(g: pa.Table) -> pa.Table:
        order, starts, bounds, labels = _segments(
            g, ["window_start"], key_cols=("series_key", "metric_type"))
        g = g.combine_chunks()
        w = g["window_start"].to_numpy()[order]
        n = g["count"].to_numpy(zero_copy_only=False)[order].astype(np.int64)
        sz = w.size
        empty = pa.Table.from_arrays([
            pa.array([], pa.string()), pa.array([], pa.int64()),
            pa.array([], pa.int64()), pa.array([], pa.int64()),
            pa.array([], pa.int64()),
        ], names=["series_key", "window_start", "n", "n_shifted", "delta"])
        if sz == 0:
            return empty
        seg_of = np.searchsorted(starts, np.arange(sz), side="right") - 1
        # w is ascending only WITHIN a segment — search on the composite
        # (segment, window) key, which IS globally sorted.  Targets below
        # the bucket's wmin are masked out up front so a negative offset
        # can never alias into the previous segment's key range.
        target = w - S
        wmin = int(w.min())
        M = int(w.max()) - wmin + 1
        if (int(seg_of[-1]) + 1) * M >= 1 << 62:   # loud int64 guard
            raise OverflowError(
                "timeshift_compare_frame: composite (segment, window) "
                f"key overflows int64 ({seg_of[-1] + 1} segments x "
                f"{M} ms span); narrow the bucket or the time range")
        kw = seg_of * M + (w - wmin)
        tkey = seg_of * M + (target - wmin)
        idx = np.searchsorted(kw, tkey, side="left")
        ok = (target >= wmin) & (idx < sz)
        idx_c = np.clip(idx, 0, sz - 1)
        ok &= kw[idx_c] == tkey
        hit = np.flatnonzero(ok)
        if hit.size == 0:
            return empty
        part = idx_c[hit]
        return pa.Table.from_arrays([
            pa.array(labels["series_key"][seg_of[hit]], pa.string()),
            pa.array(w[hit], pa.int64()),
            pa.array(n[hit], pa.int64()),
            pa.array(n[part], pa.int64()),
            pa.array(n[hit] - n[part], pa.int64()),
        ], names=["series_key", "window_start", "n", "n_shifted", "delta"])

    return _with_scan_bucket(core_ds).groupby("_scan_bucket").map_groups(
        scan, batch_format="pyarrow")


def timeshift_oracle_sql(width_ms: int, shift_ms: int,
                         k_table: str = "events",
                         key_col: str = "event_type",
                         ts_col: str = "ts") -> str:
    """DuckDB replay of ``timeshift_compare_frame`` (self-join)."""
    return f"""
    WITH agg AS (
      SELECT {key_col} AS sk,
             (epoch_ms({ts_col}) // {width_ms}) * {width_ms} AS w,
             count(*)::BIGINT AS n
      FROM {k_table} GROUP BY 1, 2)
    SELECT a.sk AS series_key, a.w AS window_start, a.n,
           b.n AS n_shifted, a.n - b.n AS delta
    FROM agg a JOIN agg b ON b.sk = a.sk AND b.w = a.w - {shift_ms}"""
