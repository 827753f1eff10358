"""Graphite plaintext-protocol sink: tier rows -> ``name value ts`` lines.

The reference pushes its metrics registry to carbon via
go-metrics-graphite (/root/reference/graphite/graphite.go:66-90: plaintext
protocol, DurationUnit=sec, percentiles 0.5/0.75/0.95/0.99/0.999).  This
stage renders FINAL tier rows (the engine's product) to that wire format
so the engine can front an actual Graphite/carbon endpoint:

    counter  ->  <key>.count <cumulative:int> <ts>
    gauge    ->  <key>.value <last:%f> <ts>
    meter    ->  <key>.count <count:int>
                 <key>.one-minute <ewma_60s:%.2f>
                 <key>.five-minute <ewma_300s:%.2f>
                 <key>.fifteen-minute <ewma_900s:%.2f>
                 <key>.mean <rate:%.2f>
    timer    ->  <key>.count <count:int>
                 <key>.min <vmin:int>   <key>.max <vmax:int>
                 <key>.mean <mean:%.2f>
                 <key>.{50,75,95,99,999}-percentile <p*:%.2f>

Mapping deltas vs the reference's registry snapshot (documented, by
design): the timestamp is the WINDOW START (seconds) rather than the
flush wall-clock — tiers are replayable history, not a live registry —
and the timer's ``.std-dev`` line is omitted (the tiers store exact
min/max/mean/percentiles, not a second moment).  Formats (%d, %f, %.2f)
match Go's fmt verbs byte-for-byte for finite values.

Rendering is a stateless ``map_batches`` stage (vectorized np.char
formatting — one expand per metric type, no per-row Python); the TCP
write happens once, on the driver/edge, over the streamed batches —
carbon is a single endpoint, so the socket is the one deliberately
non-distributed piece.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_PCT_COLS = [("p50", "50"), ("p75", "75"), ("p95", "95"),
             ("p99", "99"), ("p999", "999")]


def _np_str(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return np.asarray(a.to_pylist(), dtype=object)


def _f(col, fmt: str) -> np.ndarray:
    a = col.to_numpy(zero_copy_only=False).astype(np.float64)
    return np.char.mod(fmt, a).astype(object)


def _i(col) -> np.ndarray:
    a = col.to_numpy(zero_copy_only=False).astype(np.int64)
    return np.char.mod("%d", a).astype(object)


def render_graphite_batch(t: pa.Table, prefix: str = "") -> pa.Table:
    """Render one batch of decoded tier rows to plaintext lines.

    Output: (series_key, window_start, line) — key + window kept so a
    partitioned write or a downstream filter stays possible."""
    if t.num_rows == 0:
        return pa.table({"series_key": pa.array([], pa.string()),
                         "window_start": pa.array([], pa.int64()),
                         "line": pa.array([], pa.string())})
    t = t.combine_chunks()
    key = _np_str(t["series_key"])
    if prefix:
        key = np.char.add(prefix + ".", key.astype(str)).astype(object)
    mt = _np_str(t["metric_type"])
    w = t["window_start"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = np.char.mod(" %d", w // 1000).astype(object)

    out_key: list[np.ndarray] = []
    out_w: list[np.ndarray] = []
    out_line: list[np.ndarray] = []

    def emit(mask: np.ndarray, suffix: str, vals: np.ndarray) -> None:
        if not mask.any():
            return
        k = key[mask]
        out_key.append(k)
        out_w.append(w[mask])
        out_line.append(k + (suffix + " ") + vals[mask] + ts[mask])

    is_counter = mt == "counter"
    is_gauge = mt == "gauge"
    is_meter = mt == "meter"
    is_timer = mt == "timer"

    emit(is_counter, ".count", _i(t["cumulative"]))
    emit(is_gauge, ".value", _f(t["last"], "%f"))

    emit(is_meter, ".count", _i(t["count"]))
    emit(is_meter, ".one-minute", _f(t["ewma_60s"], "%.2f"))
    emit(is_meter, ".five-minute", _f(t["ewma_300s"], "%.2f"))
    emit(is_meter, ".fifteen-minute", _f(t["ewma_900s"], "%.2f"))
    emit(is_meter, ".mean", _f(t["rate"], "%.2f"))

    emit(is_timer, ".count", _i(t["count"]))
    emit(is_timer, ".min", _i(t["vmin"]))
    emit(is_timer, ".max", _i(t["vmax"]))
    emit(is_timer, ".mean", _f(t["mean"], "%.2f"))
    for col, tag in _PCT_COLS:
        emit(is_timer, f".{tag}-percentile", _f(t[col], "%.2f"))

    if not out_line:
        return pa.table({"series_key": pa.array([], pa.string()),
                         "window_start": pa.array([], pa.int64()),
                         "line": pa.array([], pa.string())})
    return pa.table({
        "series_key": pa.array(np.concatenate(out_key), pa.string()),
        "window_start": pa.array(np.concatenate(out_w), pa.int64()),
        "line": pa.array(np.concatenate(out_line), pa.string())})


def graphite_lines(tier_ds, prefix: str = ""):
    """Distributed render: decoded tier Dataset -> Dataset of lines."""
    return tier_ds.map_batches(
        lambda t: render_graphite_batch(t, prefix), batch_format="pyarrow")


def push_tier(out_dir: str, tier: str, host: str, port: int,
              prefix: str = "", timeout_s: float = 10.0) -> int:
    """Stream one stored tier to a carbon endpoint.  Rendering runs
    distributed; only the final socket write happens here (batched
    sendall per Arrow batch — never one syscall per line).  Returns the
    number of lines sent."""
    import socket

    from logtrics_ray.stages.storage import read_tier
    ds = graphite_lines(read_tier(out_dir, tier), prefix)
    sent = 0
    with socket.create_connection((host, port), timeout=timeout_s) as s:
        for batch in ds.iter_batches(batch_format="pyarrow",
                                     batch_size=8192):
            lines = batch["line"].to_pylist()
            if lines:
                s.sendall(("\n".join(lines) + "\n").encode())
                sent += len(lines)
    return sent
