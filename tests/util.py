"""Test helpers: engine-output <-> oracle-output comparison (bit-for-bit)."""

from __future__ import annotations

import math

import numpy as np

from logtrics_ray.stages.rollup import PCTL_NAMES

SCALAR_COLS = ["count", "sum", "vmin", "vmax", "mean", "last",
               "cumulative", "rate", "ewma_60s", "ewma_300s", "ewma_900s"]


def _eq(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        return (fa == fb) or (math.isnan(fa) and math.isnan(fb))
    return a == b


def engine_df_to_dict(df) -> dict:
    """Final-tier pandas frame -> {(series, mtype): {window: row dict}}."""
    out: dict = {}
    for rec in df.to_dict("records"):
        key = (rec["series_key"], rec["metric_type"])
        out.setdefault(key, {})[int(rec["window_start"])] = rec
    return out


def assert_tier_matches_oracle(df, oracle_tier: dict, msg: str = ""):
    eng = engine_df_to_dict(df)
    assert set(eng) == set(oracle_tier), (
        f"{msg}: series mismatch: engine-only={set(eng) - set(oracle_tier)}, "
        f"oracle-only={set(oracle_tier) - set(eng)}")
    for key, orows in oracle_tier.items():
        erows = eng[key]
        assert set(erows) == set(orows), (
            f"{msg}: {key}: window set mismatch "
            f"({len(erows)} engine vs {len(orows)} oracle)")
        for w, orow in orows.items():
            erow = erows[w]
            for c in SCALAR_COLS:
                assert _eq(erow[c], orow[c]), (
                    f"{msg}: {key} w={w} col={c}: engine={erow[c]!r} oracle={orow[c]!r}")
            for i, p in enumerate(PCTL_NAMES):
                assert _eq(erow[p], float(orow["pctls"][i])), (
                    f"{msg}: {key} w={w} col={p}: engine={erow[p]!r} "
                    f"oracle={orow['pctls'][i]!r}")
            assert bool(erow["gap_filled"]) == bool(orow["gap_filled"]), (
                f"{msg}: {key} w={w} gap_filled mismatch")


def assert_frames_identical(df_a, df_b, msg: str = ""):
    """Order-insensitive exact equality of two final-tier frames."""
    key = ["series_key", "metric_type", "window_start"]
    a = df_a.sort_values(key).reset_index(drop=True)
    b = df_b.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b), f"{msg}: row count {len(a)} vs {len(b)}"
    assert list(a.columns) == list(b.columns), f"{msg}: column mismatch"
    for c in a.columns:
        va, vb = a[c].to_numpy(), b[c].to_numpy()
        if va.dtype.kind == "f":
            same = (va == vb) | (np.isnan(va) & np.isnan(vb))
        else:
            same = va == vb
        assert same.all(), f"{msg}: col {c} differs at rows {np.flatnonzero(~same)[:5]}"
