"""Push-ingest edge: UDP/TCP line listener -> atomic .log shards ->
the standard read_log_lines + extraction path (the live analog of the
reference's socket readers, /root/reference/reader/readers.go:109-196)."""

import os
import socket
import time

import pytest


def _wait_for(pred, timeout=5.0, step=0.05):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if pred():
            return True
        time.sleep(step)
    return pred()


def test_line_ingest_udp_tcp_to_shards(tmp_path):
    from logtrics_ray.sources.ingest import LineIngestServer
    spool = str(tmp_path / "spool")
    srv = LineIngestServer(spool, udp_port=0, tcp_port=0,
                           max_lines=4, max_age_s=0.3)
    udp, tcp = srv.start()
    try:
        # UDP: one datagram carrying several lines (size-triggered rotate)
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        # CRLF and padded lines must arrive trimmed (reference readers
        # TrimSpace each line, readers.go:140-141)
        s.sendto(b'hello "abc" x\r\nlatency_ms=7 y\r\n  GET /api/users z \n'
                 b"bytes=99 w\n", ("127.0.0.1", udp))
        s.close()
        assert _wait_for(lambda: any(f.endswith(".log")
                                     for f in os.listdir(spool)))

        # TCP: lines split across sends, partial line completed later,
        # trailing unterminated line flushed on close (age-triggered rotate)
        c = socket.create_connection(("127.0.0.1", tcp))
        c.sendall(b"status=200 a\r\nstatus=4")
        time.sleep(0.05)
        c.sendall(b"04 b\ntail-no-newline\r")
        c.close()
        assert _wait_for(lambda: sum(1 for f in os.listdir(spool)
                                     if f.endswith(".log")) >= 2)
    finally:
        srv.stop()

    shards = sorted(f for f in os.listdir(spool) if f.endswith(".log"))
    all_lines = []
    for f in shards:
        with open(os.path.join(spool, f)) as fh:
            all_lines.extend(fh.read().split("\n"))
    assert sorted(all_lines) == sorted([
        'hello "abc" x', "latency_ms=7 y", "GET /api/users z", "bytes=99 w",
        "status=200 a", "status=404 b", "tail-no-newline"])
    # no partial-write temp files left behind
    assert not [f for f in os.listdir(spool) if f.endswith(".tmp")]


def test_ingest_spool_feeds_extraction(tmp_path, ray_session):
    """The spool is a normal log dir: read_log_lines -> extract_points
    produces the expected points for the default rules."""
    from logtrics_ray.config import EngineConfig
    from logtrics_ray.rules import default_rules
    from logtrics_ray.sources.ingest import LineIngestServer
    from logtrics_ray.sources.text import read_log_lines
    from logtrics_ray.stages.extract import extract_points

    spool = str(tmp_path / "spool")
    srv = LineIngestServer(spool, udp_port=0, max_lines=100, max_age_s=0.2)
    udp, _ = srv.start()
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.sendto(b"latency_ms=41 req\nlatency_ms=13 req\nnomatch line\n",
             ("127.0.0.1", udp))
    s.close()
    assert _wait_for(lambda: any(f.endswith(".log")
                                 for f in os.listdir(spool)))
    srv.stop()

    pts = extract_points(read_log_lines(spool), default_rules(),
                         EngineConfig(), text_column="text").to_pandas()
    timers = pts[pts["metric_type"] == "timer"]
    assert sorted(timers["value"]) == [13.0, 41.0]
    assert set(timers["series_key"].str.startswith("lt.latency.")) == {True}


def test_ingest_seq_resumes_existing_spool(tmp_path):
    """Restarting the daemon never clobbers shards from a previous life."""
    from logtrics_ray.sources.ingest import _Spool
    spool = str(tmp_path / "spool")
    a = _Spool(spool, max_lines=1, max_age_s=9, prefix="ingest")
    a.add(["one"])
    b = _Spool(spool, max_lines=1, max_age_s=9, prefix="ingest")
    b.add(["two"])
    names = sorted(os.listdir(spool))
    assert names == ["ingest-00000000.log", "ingest-00000001.log"]


def test_configure_logging_kinds():
    """console/syslog factory (reference config.Logger analog): returns
    a handler-equipped 'logtrics' logger at the mapped level; syslog
    falls back to the UDP handler when /dev/log is absent."""
    import logging

    from logtrics_ray.rules import configure_logging
    lg = configure_logging("console", "warn")
    assert lg.level == logging.WARNING and lg.handlers
    lg = configure_logging("syslog", "debug")
    from logging.handlers import SysLogHandler
    assert isinstance(lg.handlers[0], SysLogHandler)
    assert lg.level == logging.DEBUG
    configure_logging("console", "info")   # restore defaults


def test_asof_join_frame_edges(ray_session):
    """AS-OF join edge cases: equal-ts match counts (<=), right ties at
    one ts resolve LWW by id, keys with no prior right row get null."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from logtrics_ray.stages.enrich import asof_join_frame

    t = pa.table({
        "event_id": [1, 2, 3, 4, 5, 6, 7],
        "ts":       [100, 100, 100, 50, 200, 10, 500],   # int ms
        "event_type": ["click", "click", "view", "view", "view",
                       "click", "view"],
        "user_id": ["u1", "u1", "u1", "u1", "u1", "u2", "u3"],
        "value":   [10.0, 20.0, 1.0, 2.0, 3.0, 9.0, 4.0],
    })
    df = (asof_join_frame(rd.from_arrow(t), "ts", "user_id", "value",
                          "event_id", "view", "click")
          .to_pandas().sort_values("event_id").reset_index(drop=True))
    # event 3 (u1 @100): clicks at 100 tie -> max event_id (2) wins: 20.0
    # event 4 (u1 @50): no prior click -> NaN
    # event 5 (u1 @200): latest click @100 id2 -> 20.0
    # event 7 (u3): no clicks at all -> NaN
    assert df["event_id"].tolist() == [3, 4, 5, 7]
    ref = df["ref_value"].to_numpy()
    assert ref[0] == 20.0 and np.isnan(ref[1])
    assert ref[2] == 20.0 and np.isnan(ref[3])


def test_console_mode_prints_points(tmp_path):
    """`python -m logtrics_ray console` — stdin lines run through every
    rule and emissions print as JSON points (reference console reader,
    reader/readers.go:73-106); 'exit' ends the session; no Ray session
    is started."""
    import json
    import subprocess
    import sys

    lines = ('hello "abc" then GET /api/users status=404\n'
             "no match here\n"
             "exit\n"
             "latency_ms=99 after exit is never read\n")
    out = subprocess.run(
        [sys.executable, "-m", "logtrics_ray", "console"],
        input=lines, capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-500:]
    pts = [json.loads(x) for x in out.stdout.strip().splitlines()]
    got = {(p["series_key"], p["metric_type"], p["value"]) for p in pts}
    assert got == {("lt.hello.abc", "gauge", 3.0),
                   ("lt.req.users", "counter", 1.0),
                   ("lt.status.404", "counter", 1.0),
                   ("lt.status.all", "meter", 1.0)}
    # deterministic synthesized event time (doc_id = console-<lineno>)
    from logtrics_ray.config import EngineConfig
    from logtrics_ray.hashing import id_hash64
    cfg = EngineConfig()
    want_ts = cfg.epoch0_ms + id_hash64("console-1") % cfg.horizon_ms
    assert all(p["ts_ms"] == want_ts for p in pts)
