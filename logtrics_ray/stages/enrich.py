"""Broadcast enrichment + retention policy — the engine's only join-like
operators (SURVEY.md §2.4: the reference has NO joins; these are the two
join-shaped needs our engine adds).

* ``broadcast_enrich``: join a SMALL dimension table (series_key ->
  attributes) onto a big Dataset without a shuffle: the dim table is put
  into the object store ONCE (``ray.put``) and every map task resolves
  it by reference — the 100 TB-safe alternative to a hash-join exchange
  for small sides (broadcast-join pattern).
* ``apply_retention``: per-series retention windows (the north rule's
  "retention" tier semantics): a row survives iff
  ``window_start >= horizon_end - retention_ms(series)``, with the
  per-series retention coming from the broadcast dim.  Pure vectorized
  filter — no shuffle, streams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def broadcast_enrich(ds, dim: dict[str, dict], key_col: str = "series_key",
                     prefix: str = ""):
    """Dataset + {key: {attr: value}} -> Dataset with one new column per
    dim attribute (missing keys -> null).  dim must be driver-small."""
    if not dim:
        return ds
    attrs = sorted({a for v in dim.values() for a in v})
    dim_ref = ray.put(dim)

    def fn(t: pa.Table) -> pa.Table:
        d = ray.get(dim_ref)
        col = t[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # dictionary-encode + take: Python lookups only on the DISTINCT
        # keys (cardinality-bounded), then one vectorized gather per attr.
        enc = col if pa.types.is_dictionary(col.type) else col.dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        idx = enc.indices
        for a in attrs:
            lut = pa.array([d.get(k, {}).get(a) for k in uniq])
            t = t.append_column(prefix + a, pa.compute.take(lut, idx))
        return t

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def apply_retention(ds, retention_ms: dict[str, int], horizon_end_ms: int,
                    default_ms: int | None = None, key_col: str = "series_key",
                    window_col: str = "window_start"):
    """Filter rows past their series' retention window.

    retention_ms: {series_key: keep-this-many-ms}; series not listed keep
    ``default_ms`` (None = keep everything).  Broadcast once, filtered
    vectorized per batch — the retention pass over a 100 TB tier is one
    streaming scan, no shuffle.
    """
    ret_ref = ray.put(retention_ms)

    def fn(t: pa.Table) -> pa.Table:
        r = ray.get(ret_ref)
        col = t[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        enc = col if pa.types.is_dictionary(col.type) else col.dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        default_cut = (horizon_end_ms - default_ms if default_ms is not None
                       else np.iinfo(np.int64).min)
        lut = np.array([horizon_end_ms - r[k] if k in r else default_cut
                        for k in uniq], dtype=np.int64)
        cutoffs = lut[enc.indices.to_numpy(zero_copy_only=False)]
        w = t[window_col].to_numpy()
        return t.filter(pa.array(w >= cutoffs))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def asof_join_frame(ds, ts_col: str, key_col: str, value_col: str,
                    id_col: str, left_type: str, right_type: str,
                    type_col: str = "event_type"):
    """Distributed AS-OF join (time-series alignment): for every LEFT
    event, attach the value of the most recent RIGHT event of the same
    key with ``right.ts <= left.ts`` (ties on ts resolved by max id on
    the right — the LWW rule the gauge path uses).

    Ray shape: ONE hash shuffle — left and right rows are tagged and
    co-partitioned by ``groupby(key)``; inside each group a vectorized
    ``np.searchsorted`` aligns every left timestamp against the
    deduplicated, sorted right timeline.  No broadcast, no driver state;
    skew bound = the hottest key's row count (same assumption as every
    per-key scan in this engine).  Oracle: DuckDB's native ASOF JOIN.

    Output: (event_id, key, ts_ms, value, ref_value) — floats 6dp."""
    import pyarrow.compute as pc

    def tag(t: pa.Table) -> pa.Table:
        types = t[type_col]
        keep = pc.is_in(types, value_set=pa.array([left_type, right_type]))
        t = t.filter(keep)
        ts = t[ts_col].combine_chunks() if isinstance(t[ts_col], pa.ChunkedArray) \
            else t[ts_col]
        if pa.types.is_timestamp(ts.type):
            unit = ts.type.unit
            ts_i = pc.cast(ts, pa.int64())
            ts_ms = pc.divide(ts_i, 1000) if unit == "us" else ts_i
        else:
            ts_ms = pc.cast(ts, pa.int64())
        side = pc.equal(t[type_col], left_type)   # True = left
        return pa.Table.from_arrays([
            pc.cast(t[id_col], pa.int64()),
            pc.cast(t[key_col], pa.string()).combine_chunks()
            if isinstance(t[key_col], pa.ChunkedArray) else
            pc.cast(t[key_col], pa.string()),
            pc.cast(ts_ms, pa.int64()),
            pc.cast(t[value_col], pa.float64()),
            side.combine_chunks() if isinstance(side, pa.ChunkedArray) else side,
        ], names=["event_id", "key", "ts_ms", "value", "is_left"])

    def grp(g: pa.Table) -> pa.Table:
        from logtrics_ray.pipelines.table_rollup import _round6
        g = g.combine_chunks()
        left = g.filter(g["is_left"])
        if left.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], t) for t in (pa.int64(), pa.string(), pa.int64(),
                                           pa.float64(), pa.float64())],
                names=["event_id", "key", "ts_ms", "value", "ref_value"])
        right = g.filter(pa.compute.invert(g["is_left"]))
        l_ts = left["ts_ms"].to_numpy()
        l_val = _round6(left["value"].to_numpy(zero_copy_only=False))
        ref = np.full(l_ts.size, np.nan)
        if right.num_rows:
            r_ts = right["ts_ms"].to_numpy()
            r_id = right["event_id"].to_numpy()
            r_val = right["value"].to_numpy(zero_copy_only=False)
            order = np.lexsort((r_id, r_ts))      # ties: max id wins (last)
            r_ts, r_val = r_ts[order], r_val[order]
            uniq_last = np.append(np.flatnonzero(np.diff(r_ts)), r_ts.size - 1)
            u_ts, u_val = r_ts[uniq_last], r_val[uniq_last]
            idx = np.searchsorted(u_ts, l_ts, side="right") - 1
            hit = idx >= 0
            ref[hit] = _round6(u_val[idx[hit]])
        return pa.Table.from_arrays([
            left["event_id"], left["key"], left["ts_ms"],
            pa.array(l_val, pa.float64()), pa.array(ref, pa.float64()),
        ], names=["event_id", "key", "ts_ms", "value", "ref_value"])

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("key").map_groups(grp, batch_format="pyarrow"))


def interval_label_frame(ds, intervals: list[tuple[int, int, str]],
                         ts_col: str = "ts", id_col: str = "event_id",
                         value_col: str = "value"):
    """Range (interval) join: label every event with the interval
    ``[start_ms, end_ms)`` it falls into (None outside all).  Intervals
    must be non-overlapping; they are driver-small, so the join is a
    BROADCAST — sorted starts captured in the closure, one vectorized
    ``searchsorted`` per batch, zero shuffle (the 100 TB-safe shape for
    small range dims; contrast the shuffle as-of join above).
    Oracle: SQL inequality join.  Output: (event_id, ts_ms, value 6dp,
    interval_label)."""
    import pyarrow.compute as pc

    from logtrics_ray.pipelines.table_rollup import _round6

    iv = sorted(intervals)
    starts = np.array([s for s, _, _ in iv], dtype=np.int64)
    ends = np.array([e for _, e, _ in iv], dtype=np.int64)
    labels = np.array([l for _, _, l in iv], dtype=object)

    def fn(t: pa.Table) -> pa.Table:
        ts = t[ts_col].combine_chunks() if isinstance(
            t[ts_col], pa.ChunkedArray) else t[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts_i = pc.cast(ts, pa.int64())
            ts_ms = (pc.divide(ts_i, 1000) if ts.type.unit == "us"
                     else ts_i).to_numpy()
        else:
            ts_ms = pc.cast(ts, pa.int64()).to_numpy()
        idx = np.searchsorted(starts, ts_ms, side="right") - 1
        ok = (idx >= 0) & (ts_ms < ends[np.clip(idx, 0, None)])
        lab = np.where(ok, labels[np.clip(idx, 0, None)], None)
        return pa.Table.from_arrays([
            pc.cast(t[id_col], pa.int64()),
            pa.array(ts_ms, pa.int64()),
            pa.array(_round6(t[value_col].to_numpy(zero_copy_only=False)),
                     pa.float64()),
            pa.array(lab.tolist(), pa.string()),
        ], names=["event_id", "ts_ms", "value", "interval_label"])

    return ds.map_batches(fn, batch_format="pyarrow")
