"""Continuous-aggregate cascade: 1m -> 1h -> 1d.

Parent tiers are re-aggregated from the CHILD TIER'S core rows, never
from raw points (the "continuous aggregate" in the north rule): counts
and sums merge over child windows in window-ascending order (sequential
reduceat — same defining order as the salt merge in rollup.py), t-digests
merge in child-window order, and the gauge `last` is the child row
holding the max (last_ts, last_tb) order key.

For int-valued metrics the cascade equals a direct parent-width rollup
exactly; for float sums it is the cascade result that DEFINES the
engine's parent-tier semantics (the oracle replicates the same cascade;
cascade-vs-direct is additionally asserted exact-for-ints /
allclose-for-floats in tests).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from logtrics_ray.stages.rollup import CORE_SCHEMA, PCTL_NAMES, PCTL_QS
from logtrics_ray.state.tdigest import TDigest


def _cascade_group(group: pa.Table, parent_width_ms: int) -> pa.Table:
    group = group.combine_chunks()
    series = group["series_key"][0].as_py()
    mtype = group["metric_type"][0].as_py()
    w = group["window_start"].to_numpy()
    order = np.argsort(w, kind="stable")
    w = w[order]

    def col(name):
        return group[name].to_numpy(zero_copy_only=False)[order]

    count, vsum = col("count"), col("sum")
    vmin, vmax = col("vmin"), col("vmax")
    last, last_ts, last_tb = col("last"), col("last_ts"), col("last_tb")
    digest_list = group["tdigest"].to_pylist()
    digests = [digest_list[i] for i in order]

    W = np.int64(parent_width_ms)
    parent = w - w % W
    starts = np.flatnonzero(np.diff(parent, prepend=parent[0] - 1))
    bounds = np.append(starts, parent.size)
    out_w = parent[starts]
    out_count = np.add.reduceat(count, starts)
    out_sum = np.add.reduceat(vsum, starts)
    out_min = np.minimum.reduceat(vmin, starts)
    out_max = np.maximum.reduceat(vmax, starts)
    out_mean = out_sum / out_count

    order2 = np.lexsort((last_tb, last_ts, parent))
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


def cascade(child_core_ds, parent_width_ms: int):
    """Child-tier core rows -> parent-tier core rows (same schema)."""
    return child_core_ds.groupby(["series_key", "metric_type"]).map_groups(
        lambda g: _cascade_group(g, parent_width_ms), batch_format="pyarrow")


def _cascade_bucket_fn(group, parent_width_ms: int):
    """Vectorized cascade of ALL series in one hash bucket — one group call
    per bucket instead of per series.  Child rows merge per (series, parent
    window) in child-window-ascending order via segmented reduceat, which is
    per-segment identical to the per-series path (reduceat embedding
    invariance), so output bits match _cascade_group exactly."""
    import pyarrow as pa
    group = group.combine_chunks()
    sk = np.asarray(group["series_key"].to_pylist(), dtype=object)
    mt = np.asarray(group["metric_type"].to_pylist(), dtype=object)
    key = np.array([f"{a}\x00{b}" for a, b in zip(sk, mt)], dtype=object)
    uniq, code = np.unique(key, return_inverse=True)
    w = group["window_start"].to_numpy()

    order = np.lexsort((w, code))
    code_s, w_s = code[order], w[order]

    def col(name):
        return group[name].to_numpy(zero_copy_only=False)[order]

    count, vsum = col("count"), col("sum")
    vmin, vmax = col("vmin"), col("vmax")
    last, last_ts, last_tb = col("last"), col("last_ts"), col("last_tb")
    dl = group["tdigest"].to_pylist()
    digests = [dl[i] for i in order]

    W = np.int64(parent_width_ms)
    parent = w_s - w_s % W
    starts = np.flatnonzero(np.diff(code_s, prepend=code_s[0] - 1).astype(bool)
                            | np.diff(parent, prepend=parent[0] - 1).astype(bool))
    bounds = np.append(starts, code_s.size)
    out_code, out_w = code_s[starts], parent[starts]
    out_count = np.add.reduceat(count, starts)
    out_sum = np.add.reduceat(vsum, starts)
    out_min = np.minimum.reduceat(vmin, starts)
    out_max = np.maximum.reduceat(vmax, starts)
    out_mean = out_sum / out_count

    o2 = np.lexsort((last_tb, last_ts, parent, code_s))
    ends2 = bounds[1:] - 1
    out_last = last[o2][ends2]
    out_lts = last_ts[o2][ends2]
    out_ltb = last_tb[o2][ends2]

    n = out_w.size
    timer_series = np.array([u.split("\x00")[1] == "timer" for u in uniq])
    merged: list = [None] * n
    qs = np.full((n, len(PCTL_QS)), np.nan)
    for i in np.flatnonzero(timer_series[out_code]):
        d = TDigest.merge_all([TDigest.from_bytes(b)
                               for b in digests[bounds[i]:bounds[i + 1]]
                               if b is not None])
        merged[i] = d.to_bytes()
        qs[i] = d.quantiles(PCTL_QS)

    out_series = np.array([uniq[c].split("\x00")[0] for c in out_code], dtype=object)
    out_mt = np.array([uniq[c].split("\x00")[1] for c in out_code], dtype=object)
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


def cascade_bucketed(child_core_ds, parent_width_ms: int, rollup_buckets: int = 64):
    """One-shuffle bucket-major cascade (bit-identical to cascade())."""
    import pyarrow as pa
    from logtrics_ray.hashing import series_bucket_array

    def add_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("rbucket", pa.array([], pa.int64()))
        b = series_bucket_array(t["series_key"], rollup_buckets)
        return t.append_column("rbucket", pa.array(b, pa.int64()))

    ds = child_core_ds.map_batches(add_bucket, batch_format="pyarrow",
                                   zero_copy_batch=True)
    return ds.groupby("rbucket").map_groups(
        lambda g: _cascade_bucket_fn(g.drop_columns(["rbucket"]), parent_width_ms),
        batch_format="pyarrow")
