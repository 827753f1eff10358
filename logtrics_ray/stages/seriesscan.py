"""Per-series ordered scan: gap-fill, cumulative counters, rates, EWMA.

This stage reproduces the reference's registry-snapshot-per-flush
semantics (/root/reference/graphite/graphite.go:84-90): once a series
exists it produces one row per window, even for windows with no samples
("this IS gap-fill", SURVEY.md §2.5 A5):

  counter  cumulative = running sum of window deltas; gap windows emit
           delta 0 and carry the cumulative — counters are never reset
           by the flush path (/root/reference/graphite/graphite.go:207-218)
  gauge    last-write-wins value; gaps filled per mode null|locf|linear
           (LOCF ≙ the registry re-emitting the stored gauge each flush,
           /root/reference/graphite/graphite.go:193-197)
  meter    rate = marks/window_sec (0 on gaps); cumulative marks; EWMA
           at 60/300/900 s ≙ go-metrics' 1/5/15-min moving rates
  timer    count 0 + NaN stats on gaps; rate = events/window_sec; EWMA

All of this is a sequential recurrence per series — confined to a
``groupby(series, metric_type).map_groups`` scan sorted by window, so it
parallelizes across series while staying exactly ordered within one.
EWMA recurrence: e[0]=x[0]; e[i]=e[i-1]+α·(x[i]-e[i-1]), α=1-exp(-W/τ);
identical loop in the oracle ⇒ bit-for-bit.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from logtrics_ray.config import EngineConfig
from logtrics_ray.stages.rollup import PCTL_NAMES

FINAL_FIELDS = [
    ("series_key", pa.string()),
    ("metric_type", pa.string()),
    ("window_start", pa.int64()),
    ("count", pa.int64()),
    ("sum", pa.float64()),
    ("vmin", pa.float64()),
    ("vmax", pa.float64()),
    ("mean", pa.float64()),
    ("last", pa.float64()),
] + [(p, pa.float64()) for p in PCTL_NAMES] + [
    ("cumulative", pa.float64()),
    ("rate", pa.float64()),
    ("ewma_60s", pa.float64()),
    ("ewma_300s", pa.float64()),
    ("ewma_900s", pa.float64()),
    ("gap_filled", pa.bool_()),
]
FINAL_SCHEMA = pa.schema(FINAL_FIELDS)


def _ewma(x: np.ndarray, alpha: float) -> np.ndarray:
    out = np.empty_like(x)
    if x.size == 0:
        return out
    e = x[0]
    out[0] = e
    for i in range(1, x.size):
        e = e + alpha * (x[i] - e)
        out[i] = e
    return out


def _gap_fill_values(dense_w, present_w, present_v, present_mask, mode: str) -> np.ndarray:
    """Fill `last` over the dense window axis per mode."""
    out = np.full(dense_w.size, np.nan)
    out[present_mask] = present_v
    if mode == "null" or present_w.size == 0:
        return out
    if mode == "locf":
        idx = np.where(present_mask, np.arange(dense_w.size), -1)
        idx = np.maximum.accumulate(idx)
        has = idx >= 0
        out[has] = out[idx[has]]
        return out
    if mode == "linear":
        # np.interp: interior gaps interpolate; edges clamp to the nearest
        # real value (leading backfill / trailing carry) — documented.
        return np.interp(dense_w.astype(np.float64),
                         present_w.astype(np.float64), present_v)
    raise AssertionError(mode)


def _scan_core(mtype: str, w: np.ndarray, count, vsum, vmin, vmax, mean, last,
               pctls: dict, width_ms: int, cfg: EngineConfig,
               global_max_w: int | None) -> dict:
    """Pure-numpy scan of ONE series (rows already window-sorted).
    Shared by the per-series map_groups path (scan_group) and the
    bucket-major fused path (scan_bucket) — one code path, so the two
    are bit-identical by construction."""
    W = np.int64(width_ms)
    first = w[0]
    last_w = w[-1] if global_max_w is None else np.int64(global_max_w)
    dense = np.arange(first, last_w + W, W, dtype=np.int64)
    pos = ((w - first) // W).astype(np.int64)
    n = dense.size
    present = np.zeros(n, dtype=bool)
    present[pos] = True

    def dense_f(src, fill=np.nan):
        out = np.full(n, fill)
        out[pos] = src
        return out

    d_count = np.zeros(n, dtype=np.int64); d_count[pos] = count
    d_sum = dense_f(vsum, 0.0)
    out = {"window_start": dense, "count": d_count, "sum": d_sum,
           "vmin": dense_f(vmin), "vmax": dense_f(vmax), "mean": dense_f(mean),
           "last": _gap_fill_values(dense, w, last, present, cfg.gap_fill)}
    for p, v in pctls.items():
        out[p] = dense_f(v)

    width_s = width_ms / 1000.0
    nan = np.full(n, np.nan)
    if mtype in ("counter", "meter"):
        out["cumulative"] = np.cumsum(d_sum)
    elif mtype == "timer":
        out["cumulative"] = np.cumsum(d_count).astype(np.float64)
    else:
        out["cumulative"] = nan
    if mtype == "meter":
        rate = d_sum / width_s
    elif mtype == "timer":
        rate = d_count / width_s
    else:
        rate = nan
    out["rate"] = rate
    if mtype in ("meter", "timer"):
        for tau in cfg.ewma_taus_s:
            out[f"ewma_{tau}s"] = _ewma(rate, 1.0 - math.exp(-width_s / tau))
    else:
        for tau in cfg.ewma_taus_s:
            out[f"ewma_{tau}s"] = nan
    out["gap_filled"] = ~present
    return out


_SCAN_COLS = ["count", "sum", "vmin", "vmax", "mean", "last", *PCTL_NAMES]


def scan_group(group: pa.Table, width_ms: int, cfg: EngineConfig,
               global_max_w: int | None = None) -> pa.Table:
    group = group.combine_chunks()
    series = group["series_key"][0].as_py()
    mtype = group["metric_type"][0].as_py()
    w = group["window_start"].to_numpy()
    order = np.argsort(w, kind="stable")
    w = w[order]

    def col(name):
        return group[name].to_numpy(zero_copy_only=False)[order]

    d = _scan_core(mtype, w, col("count"), col("sum"), col("vmin"), col("vmax"),
                   col("mean"), col("last"), {p: col(p) for p in PCTL_NAMES},
                   width_ms, cfg, global_max_w)
    n = d["window_start"].size
    cols = [pa.array([series] * n, pa.string()),
            pa.array([mtype] * n, pa.string())]
    for f in FINAL_SCHEMA:
        if f.name in ("series_key", "metric_type"):
            continue
        cols.append(pa.array(d[f.name], f.type))
    return pa.Table.from_arrays(cols, schema=FINAL_SCHEMA)


def dict_codes(col) -> tuple[np.ndarray, np.ndarray]:
    """(int64 indices, object label array) of a string column via Arrow
    dictionary encoding — group codes without per-row Python strings."""
    c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if not pa.types.is_dictionary(c.type):
        c = c.dictionary_encode()
    labels = np.asarray(c.dictionary.to_pylist(), dtype=object)
    return c.indices.to_numpy().astype(np.int64), labels


def _label_ranks(labels: np.ndarray) -> np.ndarray:
    """rank[i] = position of labels[i] in the SORTED label order — makes
    integer-key sorts reproduce exact string sort order."""
    rank = np.empty(labels.size, dtype=np.int64)
    rank[np.argsort(labels)] = np.arange(labels.size)
    return rank


def scan_bucket(group: pa.Table, width_ms: int, cfg: EngineConfig,
                global_max_w: int | None = None) -> pa.Table:
    """Every series of one BUCKET in a single call: dictionary-index
    segment codes + one packed integer lexsort replace the per-row
    ``f"{series}\\x00{mtype}"`` Python keys, and all columns convert to
    numpy ONCE per bucket instead of once per series.  Per-segment math
    delegates to ``_scan_core`` — bit-identical to the per-series path
    (tests pin fused vs staged output equality)."""
    if group.num_rows == 0:
        return FINAL_SCHEMA.empty_table()
    group = group.combine_chunks()
    sk_idx, sk_labels = dict_codes(group["series_key"])
    mt_idx, mt_labels = dict_codes(group["metric_type"])
    nmt = max(len(mt_labels), 1)
    # rank-remapped composite key: integer sort == the old string sort
    key = _label_ranks(sk_labels)[sk_idx] * nmt + _label_ranks(mt_labels)[mt_idx]
    w = group["window_start"].to_numpy()
    order = np.lexsort((w, key))
    key_s, w_s = key[order], w[order]
    sk_s, mt_s = sk_idx[order], mt_idx[order]
    vals = {c: group[c].to_numpy(zero_copy_only=False)[order] for c in _SCAN_COLS}
    starts = np.flatnonzero(np.diff(key_s, prepend=key_s[0] - 1))
    bounds = np.append(starts, key_s.size)

    per_seg: list[dict] = []
    seg_sk, seg_mt, seg_len = [], [], []
    for i in range(starts.size):
        lo, hi = bounds[i], bounds[i + 1]
        mtype = mt_labels[mt_s[lo]]
        sl = slice(lo, hi)
        d = _scan_core(mtype, w_s[sl], vals["count"][sl], vals["sum"][sl],
                       vals["vmin"][sl], vals["vmax"][sl], vals["mean"][sl],
                       vals["last"][sl], {p: vals[p][sl] for p in PCTL_NAMES},
                       width_ms, cfg, global_max_w)
        per_seg.append(d)
        seg_sk.append(sk_labels[sk_s[lo]])
        seg_mt.append(mtype)
        seg_len.append(d["window_start"].size)

    lens = np.asarray(seg_len, dtype=np.int64)
    cols = [pa.array(np.repeat(np.asarray(seg_sk, dtype=object), lens), pa.string()),
            pa.array(np.repeat(np.asarray(seg_mt, dtype=object), lens), pa.string())]
    for f in FINAL_SCHEMA:
        if f.name in ("series_key", "metric_type"):
            continue
        cols.append(pa.array(np.concatenate([d[f.name] for d in per_seg]), f.type))
    return pa.Table.from_arrays(cols, schema=FINAL_SCHEMA)


def finalize_tier(core_ds, width_ms: int, cfg: EngineConfig,
                  global_max_w: int | None = None):
    """core rollup rows -> final tier rows (dense windows, derived columns)."""
    if cfg.gap_domain == "global" and global_max_w is None:
        # one tiny driver-side reduce; the result is a scalar broadcast
        # into every scan task via closure capture.
        global_max_w = core_ds.max("window_start")
    return core_ds.groupby(["series_key", "metric_type"]).map_groups(
        lambda g: scan_group(g, width_ms, cfg, global_max_w),
        batch_format="pyarrow")
