"""Graphite plaintext sink: golden wire-format lines + edge TCP push.

The reference flushes its registry to carbon through go-metrics-graphite
(/root/reference/graphite/graphite.go:66-90); these tests pin our tier ->
plaintext mapping to that documented format (fmt verbs %d / %f / %.2f,
percentile suffixes 50/75/95/99/999)."""

import socket
import threading

import pyarrow as pa


def _tier_row(metric_type, **over):
    base = dict(series_key="lt.req.all", metric_type=metric_type,
                window_start=1767225600000, count=7, sum=21.0, vmin=1.0,
                vmax=9.0, mean=3.0, last=4.5, p50=3.0, p75=5.0, p95=8.0,
                p99=8.8, p999=9.0, cumulative=40, rate=0.12,
                ewma_60s=0.5, ewma_300s=0.25, ewma_900s=0.125,
                gap_filled=False)
    base.update(over)
    return base


def _table(rows):
    cols = rows[0].keys()
    return pa.table({c: [r[c] for r in rows] for c in cols})


def test_render_golden_lines():
    from logtrics_ray.stages.graphite import render_graphite_batch

    t = _table([_tier_row("counter"), _tier_row("gauge"),
                _tier_row("meter"), _tier_row("timer")])
    out = render_graphite_batch(t)
    lines = out["line"].to_pylist()
    ts = 1767225600
    assert lines == [
        f"lt.req.all.count 40 {ts}",                 # counter: cumulative
        f"lt.req.all.value 4.500000 {ts}",           # gauge: %f of last
        f"lt.req.all.count 7 {ts}",                  # meter block
        f"lt.req.all.one-minute 0.50 {ts}",
        f"lt.req.all.five-minute 0.25 {ts}",
        f"lt.req.all.fifteen-minute 0.12 {ts}",
        f"lt.req.all.mean 0.12 {ts}",
        f"lt.req.all.count 7 {ts}",                  # timer block
        f"lt.req.all.min 1 {ts}",
        f"lt.req.all.max 9 {ts}",
        f"lt.req.all.mean 3.00 {ts}",
        f"lt.req.all.50-percentile 3.00 {ts}",
        f"lt.req.all.75-percentile 5.00 {ts}",
        f"lt.req.all.95-percentile 8.00 {ts}",
        f"lt.req.all.99-percentile 8.80 {ts}",
        f"lt.req.all.999-percentile 9.00 {ts}",
    ]
    # prefix joins with a dot, carried key column intact
    pre = render_graphite_batch(_table([_tier_row("counter")]), prefix="prod")
    assert pre["line"].to_pylist() == [f"prod.lt.req.all.count 40 {ts}"]
    assert pre["series_key"].to_pylist() == ["prod.lt.req.all"]


def test_push_tier_streams_to_socket(ray_session, t1_dir, tmp_path):
    """End-to-end: run the pipeline, push the 1d tier to a local carbon
    stand-in, check every received line parses as `name value ts`."""
    from logtrics_ray.pipelines import rollup_pipeline as P
    from logtrics_ray.stages.graphite import push_tier

    out = str(tmp_path / "tiers")
    P.run(t1_dir, out, resume=False)

    got: list[bytes] = []
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def accept():
        conn, _ = srv.accept()
        with conn:
            while chunk := conn.recv(1 << 16):
                got.append(chunk)

    th = threading.Thread(target=accept, daemon=True)
    th.start()
    sent = push_tier(out, "1d", "127.0.0.1", port, prefix="stage")
    th.join(timeout=10)
    srv.close()

    lines = b"".join(got).decode().splitlines()
    assert sent == len(lines) > 0
    for ln in lines:
        name, value, ts = ln.split(" ")
        assert name.startswith("stage.lt.")
        float(value)
        assert int(ts) % 86400 == 0          # 1d tier -> day-aligned
