"""Tier analytics: rolling z-score anomaly detection + LTTB downsample.

Both are checked against INDEPENDENT scalar references (pandas rolling /
the classic float LTTB loop), not against the engine's own kernels; the
DuckDB replays are additionally gated by the driver via oracle_sql().
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from logtrics_ray.stages.analytics import anomaly_frame, lttb_frame


def _core_table(series: dict[str, tuple[np.ndarray, np.ndarray]]) -> pa.Table:
    """{series_key: (window_starts, counts)} -> minimal core-rollup rows."""
    sk, w, n = [], [], []
    for key, (ws, cnt) in series.items():
        sk += [key] * len(ws)
        w.append(np.asarray(ws, dtype=np.int64))
        n.append(np.asarray(cnt, dtype=np.int64))
    return pa.Table.from_arrays([
        pa.array(sk, pa.string()),
        pa.array(["gauge"] * len(sk), pa.string()),
        pa.array(np.concatenate(w), pa.int64()),
        pa.array(np.concatenate(n), pa.int64()),
    ], names=["series_key", "metric_type", "window_start", "count"])


def test_anomaly_frame_matches_pandas_rolling(ray_session):
    rng = np.random.default_rng(7)
    series = {}
    for key, sz in (("a", 120), ("b", 40), ("tiny", 5)):
        ws = np.arange(sz, dtype=np.int64) * 3_600_000
        cnt = rng.integers(50, 60, sz)
        cnt[max(sz // 2, min(30, sz - 1))] = 500  # spike after full baseline
        # (the 'tiny' series never accumulates one — must never flag)
        series[key] = (ws, cnt)
    # constant-baseline series: var == 0, departures must still flag
    series["flat"] = (np.arange(30, dtype=np.int64) * 3_600_000,
                      np.r_[np.full(29, 7), 9])
    k = 24
    got = anomaly_frame(rd.from_arrow(_core_table(series)), k=k).to_pandas()
    got = got.sort_values(["series_key", "window_start"]).reset_index(drop=True)

    for key, (ws, cnt) in series.items():
        g = got[got.series_key == key].reset_index(drop=True)
        assert list(g.window_start) == list(ws)
        s = pd.Series(cnt, dtype="float64")
        mean = s.shift(1).rolling(k).mean()
        std = s.shift(1).rolling(k).std(ddof=1)
        for i in range(len(ws)):
            if i < k:
                assert pd.isna(g.mean_prev[i]) and pd.isna(g.is_anomaly[i])
                continue
            assert g.mean_prev[i] == pytest.approx(mean[i], abs=1e-6)
            assert g.std_prev[i] == pytest.approx(std[i], abs=1e-6)
            if std[i] > 0:
                z = (cnt[i] - mean[i]) / std[i]
                assert g.z[i] == pytest.approx(z, abs=1e-6)
                assert bool(g.is_anomaly[i]) == (abs(z) > 3)
            else:
                assert pd.isna(g.z[i])
                assert bool(g.is_anomaly[i]) == (cnt[i] != mean[i])
    # the planted spikes flag, and only after a full baseline exists
    flagged = got[got.is_anomaly.fillna(False).astype(bool)]
    assert {"a", "b", "flat"} <= set(flagged.series_key)
    assert "tiny" not in set(flagged.series_key)


def _lttb_reference(x: np.ndarray, y: np.ndarray, n_out: int) -> list[int]:
    """Classic FLOAT LTTB (Steinarsson 2013), same bucket convention
    (bucket(j) = j*B // M over interior points) and first-max tiebreak —
    an independent scalar re-derivation of the vectorized int kernel."""
    N = len(x)
    if N <= n_out:
        return list(range(N))
    B = n_out - 2
    M = N - 2
    bucket = [(j * B) // M for j in range(M)]           # of interior j
    sel = [0]
    prev = 0
    for b in range(B):
        members = [j + 1 for j in range(M) if bucket[j] == b]
        nxt = [j + 1 for j in range(M) if bucket[j] == b + 1] or [N - 1]
        ax = float(np.mean([x[j] for j in nxt]))
        ay = float(np.mean([y[j] for j in nxt]))
        best, best_area = None, -1.0
        for j in members:
            area = abs((x[prev] - ax) * (y[j] - y[prev])
                       - (x[prev] - x[j]) * (ay - y[prev]))
            if area > best_area:
                best, best_area = j, area
        sel.append(best)
        prev = best
    sel.append(N - 1)
    return sel


def test_lttb_frame_matches_scalar_reference(ray_session):
    rng = np.random.default_rng(11)
    series = {}
    expect = {}
    for key, sz in (("big", 300), ("mid", 57), ("edge", 25), ("small", 9)):
        ws = (np.sort(rng.choice(100_000, sz, replace=False)).astype(np.int64)
              * 60_000)
        cnt = rng.integers(1, 1000, sz).astype(np.int64)
        series[key] = (ws, cnt)
        idx = _lttb_reference(ws - ws[0], cnt, 24)
        expect[key] = [(int(ws[i]), int(cnt[i])) for i in idx]
    got = lttb_frame(rd.from_arrow(_core_table(series)), n_out=24).to_pandas()
    for key in series:
        g = got[got.series_key == key].sort_values("rank")
        assert list(g["rank"]) == list(range(len(expect[key])))
        assert [(int(a), int(b)) for a, b in zip(g.window_start, g.n)] \
            == expect[key]
    # downsampled size: min(N, n_out) points per series
    assert len(got) == 24 + 24 + 24 + 9


def test_lttb_frame_rejects_tiny_n_out(ray_session):
    with pytest.raises(ValueError):
        lttb_frame(rd.from_arrow(_core_table({"a": ([0], [1])})), n_out=2)


def _m4_reference(ws: np.ndarray, cnt: np.ndarray, P: int):
    """Scalar per-pixel reference: dict pixel -> 8-field tuple."""
    out = {}
    span = int(ws[-1] - ws[0] + 1)
    for w, y in zip(ws.tolist(), cnt.tolist()):
        p = (w - int(ws[0])) * P // span
        if p not in out:
            out[p] = [w, y, w, y, w, y, w, y]   # first, min, max, last
        else:
            r = out[p]
            if y < r[3]:
                r[2], r[3] = w, y
            if y > r[5]:
                r[4], r[5] = w, y
            r[6], r[7] = w, y
    return out


def test_m4_frame_matches_scalar_reference(ray_session):
    from logtrics_ray.stages.analytics import m4_frame
    rng = np.random.default_rng(13)
    series = {}
    for key, sz in (("big", 400), ("sparse", 40), ("one", 1), ("two", 2)):
        ws = (np.sort(rng.choice(90_000, sz, replace=False)).astype(np.int64)
              * 60_000)
        cnt = rng.integers(1, 50, sz).astype(np.int64)  # narrow: forces ties
        series[key] = (ws, cnt)
    P = 16
    got = m4_frame(rd.from_arrow(_core_table(series)), pixels=P).to_pandas()
    for key, (ws, cnt) in series.items():
        ref = _m4_reference(ws, cnt, P)
        g = got[got.series_key == key].sort_values("pixel")
        assert list(g.pixel) == sorted(ref)
        for _, row in g.iterrows():
            assert [row.t_first, row.n_first, row.t_min, row.n_min,
                    row.t_max, row.n_max, row.t_last, row.n_last] \
                == ref[int(row.pixel)]
    # every point lands in exactly one pixel; pixel ids within range
    assert got.pixel.between(0, P - 1).all()


def test_m4_frame_rejects_zero_pixels(ray_session):
    from logtrics_ray.stages.analytics import m4_frame
    with pytest.raises(ValueError):
        m4_frame(rd.from_arrow(_core_table({"a": ([0], [1])})), pixels=0)


def test_seasonal_frame_matches_pandas_groupby(ray_session):
    from logtrics_ray.stages.analytics import seasonal_frame
    rng = np.random.default_rng(17)
    H = 3_600_000
    series = {}
    for key, sz in (("a", 200), ("b", 30), ("one", 1)):
        ws = np.sort(rng.choice(1000, sz, replace=False)).astype(np.int64) * H
        cnt = rng.integers(1, 40, sz).astype(np.int64)
        series[key] = (ws, cnt)
    got = seasonal_frame(rd.from_arrow(_core_table(series))).to_pandas()
    for key, (ws, cnt) in series.items():
        g = (got[got.series_key == key]
             .sort_values("window_start").reset_index(drop=True))
        df = pd.DataFrame({"w": ws, "n": cnt})
        df["hod"] = (df.w // H) % 24
        mean = df.groupby("hod").n.transform("mean")
        assert list(g.window_start) == list(ws)
        assert list(g.hod) == list(df.hod)
        assert np.allclose(g.hod_mean, mean.round(6), atol=1e-9)
        assert np.allclose(g.residual, (df.n - mean).round(6), atol=1e-9)


def test_threshold_cross_frame_edges_only(ray_session):
    from logtrics_ray.stages.analytics import threshold_cross_frame
    H = 3_600_000
    ws = np.arange(8, dtype=np.int64) * H
    #       n:  1  5  6  2  4  4  1  9   (T=4)
    cnt = np.array([1, 5, 6, 2, 4, 4, 1, 9], dtype=np.int64)
    got = threshold_cross_frame(
        rd.from_arrow(_core_table({"s": (ws, cnt)})), threshold=4
    ).to_pandas().sort_values("window_start").reset_index(drop=True)
    # crossings: 1->5 up@1, 6->2 down@3, 2->4 up@4, 4->1 down@6, 1->9 up@7
    assert list(got.window_start) == [H, 3 * H, 4 * H, 6 * H, 7 * H]
    assert list(got.direction) == ["up", "down", "up", "down", "up"]
    assert list(got.prev_n) == [1, 6, 2, 4, 1]
    # a series starting at/above T never fires on its first window
    got2 = threshold_cross_frame(
        rd.from_arrow(_core_table({"s": (ws[:1], np.array([99]))})),
        threshold=4).to_pandas()
    assert len(got2) == 0


def test_holt_frame_matches_scalar_recurrence(ray_session):
    from logtrics_ray.stages.analytics import holt_frame
    rng = np.random.default_rng(29)
    D = 86_400_000
    series = {}
    for key, sz in (("a", 150), ("b", 12), ("one", 1)):
        ws = np.sort(rng.choice(3000, sz, replace=False)).astype(np.int64) * D
        cnt = rng.integers(1, 100, sz).astype(np.int64)
        series[key] = (ws, cnt)
    a, be = 0.5, 0.3
    got = holt_frame(rd.from_arrow(_core_table(series)),
                     alpha=a, beta=be).to_pandas()
    for key, (ws, cnt) in series.items():
        g = (got[got.series_key == key]
             .sort_values("window_start").reset_index(drop=True))
        assert list(g.window_start) == list(ws)
        l, b = float(cnt[0]), 0.0
        want = [(l, b)]
        for y in cnt[1:]:
            lt = a * y + (1 - a) * (l + b)
            bt = be * (lt - l) + (1 - be) * b
            l, b = lt, bt
            want.append((l, b))
        for i, (wl, wb) in enumerate(want):
            # published values are 6dp-rounded: raw vs rounded <= 5e-7
            assert abs(g.level[i] - wl) <= 5.001e-7
            assert abs(g.trend[i] - wb) <= 5.001e-7
            assert abs(g.forecast_next[i] - (wl + wb)) <= 5.001e-7


def test_value_hist_frame_matches_counter(ray_session):
    from logtrics_ray.stages.analytics import HIST_BOUNDS, value_hist_frame
    import collections
    rng = np.random.default_rng(31)
    H = 3_600_000
    n = 5000
    sk = rng.choice(["a", "b"], n)
    ts = rng.integers(0, 50, n).astype(np.int64) * H + rng.integers(0, H, n)
    # values straddling every boundary, including exact boundary hits
    v = np.concatenate([rng.uniform(0, 300, n - 7),
                        np.array(HIST_BOUNDS, np.float64)])[:n]
    t = pa.table({"series_key": sk, "metric_type": ["gauge"] * n,
                  "ts_ms": ts, "value": v})
    got = value_hist_frame(rd.from_arrow(t), H).to_pandas()
    want = collections.Counter()
    for s, tt, vv in zip(sk, ts, v):
        b = 0
        while b < len(HIST_BOUNDS) and vv > HIST_BOUNDS[b]:
            b += 1
        want[(s, (tt // H) * H, b)] += 1
    assert len(got) == len(want)
    for _, r in got.iterrows():
        assert want[(r.series_key, r.window_start, r.bin)] == r.n
        assert r.le_label == ("+Inf" if r.bin == len(HIST_BOUNDS)
                              else repr(float(HIST_BOUNDS[r.bin])))


def test_head_sample_frame_deterministic_at_collisions(ray_session):
    from logtrics_ray.stages.analytics import head_sample_frame
    H = 3_600_000
    # 8 events in one window, FOUR sharing one timestamp straddling the
    # n=5 cut: the embedded event-id tiebreak decides which survive
    ts = np.array([0, 10, 20, 20, 20, 20, 30, 40], dtype=np.int64)
    eid = np.array([7, 6, 5, 4, 3, 2, 1, 0], dtype=np.int64)
    tb = (ts.astype(np.uint64) << np.uint64(32)) + eid.astype(np.uint64)
    v = np.arange(8, dtype=np.float64)
    t = pa.table({"series_key": ["s"] * 8, "ts_ms": ts,
                  "value": v, "tiebreak": tb})
    got = (head_sample_frame(rd.from_arrow(t), H, n=5).to_pandas()
           .sort_values("rank").reset_index(drop=True))
    # order: (0,e7) (10,e6) then ts=20 by eid asc: e2,e3,e4 -> values
    # 5.0, 4.0, 3.0 kept; e5 and later dropped
    assert list(got["rank"]) == [0, 1, 2, 3, 4]
    assert list(got.value) == [0.0, 1.0, 5.0, 4.0, 3.0]
    assert (got.window_start == 0).all()
    # second window in another series: independent count
    t2 = pa.table({"series_key": ["a"] * 3 + ["b"] * 2,
                   "ts_ms": np.array([0, 1, 2, 0, 1], np.int64),
                   "value": np.arange(5, dtype=np.float64),
                   "tiebreak": np.arange(5, dtype=np.uint64)})
    got2 = head_sample_frame(rd.from_arrow(t2), H, n=2).to_pandas()
    assert len(got2) == 4  # 2 kept from 'a', both from 'b'


def test_storage_agg_view_first_match_wins(ray_session):
    from logtrics_ray.stages.analytics import storage_agg_view_frame
    import ray.data as rd
    # tier-shaped rows with distinct stats so the chosen column is
    # observable; 'error_rate' matches rule 1 (max), 'purchase' rule 2
    # (sum), 'click' falls through to mean
    t = pa.table({
        "series_key": ["error_rate", "purchase", "click"],
        "metric_type": ["gauge"] * 3,
        "window_start": pa.array([0, 0, 0], pa.int64()),
        "count": pa.array([2, 3, 4], pa.int64()),
        "sum": pa.array([10.0, 20.0, 30.0]),
        "vmin": pa.array([1.0, 2.0, 3.0]),
        "vmax": pa.array([9.0, 8.0, 7.0]),
        "mean": pa.array([5.0, 6.25, 7.5]),
        "last": pa.array([4.0, 5.0, 6.0]),
    })
    got = (storage_agg_view_frame(rd.from_arrow(t)).to_pandas()
           .set_index("series_key"))
    assert got.loc["error_rate"].agg_method == "max"
    assert got.loc["error_rate"].value == 9.0
    assert got.loc["purchase"].agg_method == "sum"
    assert got.loc["purchase"].value == 20.0
    assert got.loc["click"].agg_method == "mean"
    assert got.loc["click"].value == 7.5
    # a rule naming an unknown method fails loudly at build time
    import pytest as _pytest
    with _pytest.raises(ValueError):
        storage_agg_view_frame(rd.from_arrow(t),
                               rules=(("x", "median"),))


def test_derivative_frame_resets_null(ray_session):
    from logtrics_ray.stages.analytics import derivative_frame
    H = 3_600_000
    ws = np.arange(6, dtype=np.int64) * H
    cnt = np.array([5, 8, 3, 3, 10, 1], dtype=np.int64)
    got = derivative_frame(
        rd.from_arrow(_core_table({"s": (ws, cnt)})), non_negative=True
    ).to_pandas().sort_values("window_start").reset_index(drop=True)
    # first window emits nothing; resets (8->3, 10->1) publish NULL
    assert list(got.window_start) == [H, 2 * H, 3 * H, 4 * H, 5 * H]
    d = got.delta.tolist()
    assert d[0] == 3 and pd_isna(d[1]) and d[2] == 0 and d[3] == 7 \
        and pd_isna(d[4])
    got2 = derivative_frame(
        rd.from_arrow(_core_table({"s": (ws, cnt)})), non_negative=False
    ).to_pandas().sort_values("window_start").reset_index(drop=True)
    assert got2.delta.tolist() == [3, -5, 0, 7, -9]


def pd_isna(x):
    import pandas as pd
    return pd.isna(x)


def test_timeshift_compare_frame_day_over_day(ray_session):
    from logtrics_ray.stages.analytics import timeshift_compare_frame
    H, D = 3_600_000, 86_400_000
    # two days of hourly windows with a gap at hour 26 (second day's 2am)
    ws = np.array([0, H, 2 * H, D, D + H, D + 3 * H], dtype=np.int64)
    cnt = np.array([10, 20, 30, 15, 22, 7], dtype=np.int64)
    got = timeshift_compare_frame(
        rd.from_arrow(_core_table({"s": (ws, cnt)})), shift_ms=D
    ).to_pandas().sort_values("window_start").reset_index(drop=True)
    # partners exist only for D (<-0) and D+H (<-H); D+3H has no partner
    assert list(got.window_start) == [D, D + H]
    assert list(got.n) == [15, 22]
    assert list(got.n_shifted) == [10, 20]
    assert list(got.delta) == [5, 2]
    # two series in one bucket: partners never cross series
    got2 = timeshift_compare_frame(
        rd.from_arrow(_core_table({"a": (np.array([0, D], np.int64),
                                         np.array([1, 2], np.int64)),
                                   "b": (np.array([D], np.int64),
                                         np.array([9], np.int64))})),
        shift_ms=D).to_pandas()
    assert list(got2.series_key) == ["a"]
    assert list(got2.delta) == [1]
