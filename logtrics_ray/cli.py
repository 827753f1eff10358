"""CLI entrypoint — the `ray job submit` surface of the engine.

On a real cluster:

    ray job submit --working-dir . -- \
        python -m logtrics_ray run --input s3://bucket/tokens/ --out s3://bucket/tiers/

Locally (this sandbox):

    python -m logtrics_ray run --input /tmp/tokens --out /tmp/tiers --num-cpus 32
    python -m logtrics_ray synth --out /tmp/tokens --rows 200000
    python -m logtrics_ray inspect --out /tmp/tiers --tier 1m

Mirrors the reference's CLI shape (cobra flags + config file,
/root/reference/cmd/logtrics/main.go:38-84) as argparse subcommands; the
reference's `--graphite.interval` flush knob becomes the tier set, its
script-dir rule loading (/root/reference/app.go:96-111) becomes
``--rules`` (TOML/JSON rule spec file; default = built-in rules).

Only this CLI owns a Ray session — the library never calls ray.init()
(driver contract).  Under `ray job submit` Ray is already initialised in
the job; the guard makes init a no-op there.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


_RAY_OWNED = False   # did THIS process's CLI call ray.init()?


def _ensure_ray(num_cpus: int | None):
    global _RAY_OWNED
    import ray
    if not ray.is_initialized():
        kw = dict(include_dashboard=False, ignore_reinit_error=True,
                  logging_level="ERROR")
        if num_cpus:
            ray.init(address="local", num_cpus=num_cpus, **kw)
        else:
            ray.init(**kw)  # ray job submit / RAY_ADDRESS decides
        _RAY_OWNED = True
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def _load_rules(path: str | None):
    from logtrics_ray.rules import default_rules, load_rules
    if not path:
        return default_rules()
    import os
    if os.path.isdir(path):
        return load_rules(path)  # dir of *.toml / *.lua rule files
    if path.endswith(".json"):
        with open(path) as f:
            return load_rules(json.load(f))
    return load_rules(path)  # TOML [[rule]] array or *.lua script


def _cfg_from_args(args):
    from logtrics_ray.config import EngineConfig
    return EngineConfig(gap_fill=args.gap_fill,
                        salt_buckets=args.salt_buckets,
                        series_buckets=args.series_buckets,
                        rollup_buckets=args.rollup_buckets,
                        exchange=args.exchange,
                        tiers=tuple(args.tiers.split(",")))


def _warn_cfg_mismatch(out_dir: str, cfg, rules) -> None:
    """append/watch must use the SAME engine config the tiers were built
    with, or every poll silently recomputes under a new lineage instead of
    appending.  Compare against the stored manifests' cfg_hash and warn."""
    from logtrics_ray.state import manifest as M
    stored = {m.get("cfg_hash") for t in cfg.tiers
              for m in M.load_manifests(out_dir, t)}
    stored.discard(None)
    if stored and M.config_hash(cfg, rules) not in stored:
        print(f"WARNING: engine config hash {M.config_hash(cfg, rules)} does "
              f"not match the stored tiers' lineage ({sorted(stored)}); "
              "incremental append will fall back to a full recompute. "
              "Pass the same --salt-buckets/--series-buckets/--exchange/... "
              "flags the tiers were built with.", file=sys.stderr)


def cmd_run(args) -> int:
    from logtrics_ray.pipelines.rollup_pipeline import run
    _ensure_ray(args.num_cpus)
    cfg = _cfg_from_args(args)
    t0 = time.time()
    results = run(args.input, args.out, cfg=cfg, rules=_load_rules(args.rules),
                  resume=not args.no_resume)
    wall = time.time() - t0
    summary = {
        "wall_s": round(wall, 3),
        "tiers": {t: {"buckets": len(ms),
                      "rows": int(sum(m["rows"] for m in ms)),
                      "series": int(sum(m.get("series", 0) for m in ms)),
                      "blocks": int(sum(m.get("blocks", 0) for m in ms))}
                  for t, ms in results.items()},
    }
    print(json.dumps(summary))
    return 0


def cmd_append(args) -> int:
    """Incremental append: merge shards not yet in the tier lineage."""
    from logtrics_ray.pipelines.rollup_pipeline import run_incremental
    _ensure_ray(args.num_cpus)
    cfg, rules = _cfg_from_args(args), _load_rules(args.rules)
    _warn_cfg_mismatch(args.out, cfg, rules)
    t0 = time.time()
    results = run_incremental(args.input, args.out, cfg=cfg, rules=rules)
    print(json.dumps({
        "wall_s": round(time.time() - t0, 3),
        "tiers": {t: {"buckets": len(ms), "rows": int(sum(m["rows"] for m in ms))}
                  for t, ms in results.items()},
    }))
    return 0


def cmd_watch(args) -> int:
    """Poll the input dir for new shards and incrementally merge them —
    the batch-engine analog of the reference's live console/UDP/TCP
    tailing (/root/reference/reader/readers.go:73-196): arriving data is
    picked up continuously, but through durable parquet shards + lineage
    manifests instead of ephemeral sockets.  Stops after --max-iter polls
    (0 = forever) or when a file named STOP appears in the input dir."""
    import os
    from logtrics_ray.pipelines.rollup_pipeline import run_incremental
    _ensure_ray(args.num_cpus)
    cfg, rules = _cfg_from_args(args), _load_rules(args.rules)
    _warn_cfg_mismatch(args.out, cfg, rules)
    it = 0
    while True:
        it += 1
        t0 = time.time()
        results = run_incremental(args.input, args.out, cfg=cfg, rules=rules)
        print(json.dumps({
            "iter": it, "wall_s": round(time.time() - t0, 3),
            "tiers": {t: {"buckets": len(ms),
                          "rows": int(sum(m["rows"] for m in ms))}
                      for t, ms in results.items()},
        }), flush=True)
        if args.max_iter and it >= args.max_iter:
            return 0
        if os.path.exists(os.path.join(args.input, "STOP")):
            return 0
        time.sleep(args.interval)


def cmd_validate(args) -> int:
    """Audit pass: per-row invariant check (n_tok == len(tokens)) over the
    whole input — the engine's log-and-continue error policy
    (/root/reference/script.go:58-61) as an explicit, reportable scan."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    _ensure_ray(args.num_cpus)
    ds = rd.read_parquet(args.input, columns=["doc_id", "tokens", "n_tok"])

    def audit(t: pa.Table) -> pa.Table:
        ok = pc.equal(pc.list_value_length(t["tokens"]),
                      pc.cast(t["n_tok"], pa.int32()))
        bad = t.num_rows - (pc.sum(pc.cast(ok, pa.int64())).as_py() or 0)
        return pa.Table.from_pydict({"rows": [t.num_rows], "violations": [bad]})

    parts = ds.map_batches(audit, batch_format="pyarrow").take_all()  # 1 row/batch
    rows = sum(p["rows"] for p in parts)
    bad = sum(p["violations"] for p in parts)
    print(json.dumps({"rows": int(rows), "violations": int(bad),
                      "ok": bad == 0}))
    return 0 if bad == 0 else 1


def cmd_synth(args) -> int:
    from logtrics_ray.synth import write_token_table
    if args.rows >= 50_000:
        _ensure_ray(args.num_cpus)   # parallel shard writes
    path = write_token_table(args.out, args.rows, n_shards=args.shards)
    print(json.dumps({"path": path, "rows": args.rows, "shards": args.shards}))
    return 0


def cmd_inspect(args) -> int:
    """Decode one tier back out of its Gorilla blocks and show a summary.

    Streams per-batch PARTIALS (row count, distinct-series hash set,
    window min/max) instead of ``to_pandas()`` on the decoded tier, so
    peak driver memory is independent of tier size (a full 1m tier at
    production scale is not driver-sized); only the merged scalars ever
    reach this process."""
    from logtrics_ray.stages.storage import read_tier
    _ensure_ray(args.num_cpus)
    ds = read_tier(args.out, args.tier,
                   window_min=args.window_min, window_max=args.window_max)

    def partial(t):
        import numpy as np
        import pyarrow as pa

        from logtrics_ray.hashing import id_hash64_array
        if t.num_rows == 0:
            return pa.table({"rows": pa.array([0], pa.int64()),
                             "series_hash": pa.array([[]],
                                                     pa.list_(pa.int64())),
                             "wmin": pa.array([None], pa.int64()),
                             "wmax": pa.array([None], pa.int64())})
        sk = t["series_key"].combine_chunks() if isinstance(
            t["series_key"], pa.ChunkedArray) else t["series_key"]
        uniq = np.unique(id_hash64_array(sk.unique()).astype(np.int64))
        w = t["window_start"].to_numpy()
        return pa.table({
            "rows": pa.array([t.num_rows], pa.int64()),
            "series_hash": pa.array([uniq.tolist()], pa.list_(pa.int64())),
            "wmin": pa.array([int(w.min())], pa.int64()),
            "wmax": pa.array([int(w.max())], pa.int64())})

    rows, wmin, wmax = 0, None, None
    series: set = set()
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        for r in b.to_pylist():
            rows += r["rows"]
            series.update(r["series_hash"])
            if r["wmin"] is not None:
                wmin = r["wmin"] if wmin is None else min(wmin, r["wmin"])
                wmax = r["wmax"] if wmax is None else max(wmax, r["wmax"])
    print(json.dumps({
        "tier": args.tier,
        "rows": rows,
        "series": len(series),
        "window_min": wmin,
        "window_max": wmax,
    }))
    return 0


def cmd_purge(args) -> int:
    """Retention purge: drop windows older than the cutoff from a stored
    tier (storage-level filter; see storage.purge_tier)."""
    from logtrics_ray.stages.storage import purge_tier
    from logtrics_ray.state.manifest import load_manifests
    if (args.cutoff_ms is None) == (args.keep_ms is None):
        print("purge: give exactly one of --cutoff-ms / --keep-ms",
              file=sys.stderr)
        return 2
    cutoff = args.cutoff_ms
    if cutoff is None:
        maxes = [m["window_max"] for m in load_manifests(args.out, args.tier)
                 if m.get("window_max") is not None]
        if not maxes:
            print(json.dumps({"tier": args.tier, "kept": 0, "emptied": 0,
                              "rewritten": 0}))
            return 0
        cutoff = max(maxes) - args.keep_ms
    _ensure_ray(args.num_cpus)
    res = purge_tier(args.out, args.tier, cutoff)
    print(json.dumps(dict(res, tier=args.tier, cutoff_ms=cutoff)))
    return 0


def _written_rows(out_dir: str) -> int:
    """Row count summed from parquet footers — free, no lineage re-run."""
    import glob
    import os

    import pyarrow.parquet as pq
    return sum(pq.ParquetFile(p).metadata.num_rows
               for p in glob.glob(os.path.join(out_dir, "*.parquet")))


def cmd_pack(args) -> int:
    """Sequence packing: token table -> fixed-length training chunks,
    written as partitioned parquet (resumable unit = output file)."""
    _ensure_ray(args.num_cpus)
    from logtrics_ray.functions.packing import pack_sequences
    ds = pack_sequences(args.input, seq_len=args.seq_len,
                        bucket_bits=args.bucket_bits)
    ds.write_parquet(args.out)
    # count from the written files' parquet metadata: a Dataset is lazy,
    # so ds.count() after write would re-execute the whole token exchange
    print(json.dumps({"bins": _written_rows(args.out),
                      "seq_len": args.seq_len, "out": args.out}))
    return 0


ANALYZE_OPS = ("anomaly", "holt", "lttb", "m4", "seasonal",
               "storage-agg", "threshold")


def cmd_analyze(args) -> int:
    """Run a tier analytic (anomaly / lttb / m4 / holt / seasonal /
    threshold / storage-agg) over a STORED tier and write the result."""
    from logtrics_ray.stages import analytics as A
    from logtrics_ray.stages.storage import read_tier
    _ensure_ray(args.num_cpus)
    ds = read_tier(args.tiers, args.tier,
                   window_min=args.window_min, window_max=args.window_max)
    out_ds = {
        "anomaly": lambda: A.anomaly_frame(ds, k=args.k),
        "lttb": lambda: A.lttb_frame(ds, n_out=args.n_out),
        "m4": lambda: A.m4_frame(ds, pixels=args.pixels),
        "holt": lambda: A.holt_frame(ds),
        "seasonal": lambda: A.seasonal_frame(ds),
        "threshold": lambda: A.threshold_cross_frame(
            ds, threshold=args.threshold),
        "storage-agg": lambda: A.storage_agg_view_frame(ds),
    }[args.op]()
    out_ds.write_parquet(args.out)
    print(json.dumps({"op": args.op, "tier": args.tier,
                      "rows": _written_rows(args.out), "out": args.out}))
    return 0


def cmd_curate(args) -> int:
    """End-to-end corpus curation funnel over a documents table:
    quality -> per-source length band -> exact dedup -> minhash
    near-dedup -> benchmark decontamination.  Writes the curated doc_id
    set as parquet and prints the per-source funnel stats."""
    _ensure_ray(args.num_cpus)
    from logtrics_ray.pipelines.curation import curate
    stages, stats = curate(args.input, q_min=args.q_min)
    stages["clean"].write_parquet(args.out)
    print(json.dumps({"funnel": stats.to_dict(orient="records"),
                      "curated_docs": _written_rows(args.out),
                      "out": args.out}))
    return 0


def cmd_sample(args) -> int:
    """Deterministic training-mix sampling: per-source keep rates
    (source=rate pairs), kept docs written as parquet."""
    rates = {}
    for spec in args.rate:
        src, _, val = spec.partition("=")
        rates[src] = float(val)
    _ensure_ray(args.num_cpus)
    if args.epochs:
        from logtrics_ray.functions.packing import sample_mix_epochs
        ds = sample_mix_epochs(args.input, rates)
    else:
        from logtrics_ray.functions.packing import sample_mix
        ds = sample_mix(args.input, rates)
    ds.write_parquet(args.out)
    print(json.dumps({"kept_docs": _written_rows(args.out), "rates": rates,
                      "out": args.out}))
    return 0


def cmd_push(args) -> int:
    """Graphite sink: decoded tier rows rendered to the carbon plaintext
    protocol and streamed to the endpoint (reference graphite.go:66-90)."""
    _ensure_ray(args.num_cpus)
    from logtrics_ray.stages.graphite import push_tier
    n = push_tier(args.out, args.tier, args.graphite_host,
                  args.graphite_port, prefix=args.prefix)
    print(json.dumps({"lines": n, "tier": args.tier,
                      "endpoint": f"{args.graphite_host}:"
                                  f"{args.graphite_port}"}))
    return 0


def cmd_listen(args) -> int:
    """Push-ingest edge daemon: no Ray session — it only writes shard
    files; a separate `watch` (or batch `run`) consumes the spool."""
    from logtrics_ray.sources.ingest import LineIngestServer
    srv = LineIngestServer(args.spool, udp_port=args.udp_port,
                           tcp_port=args.tcp_port, host=args.host,
                           max_lines=args.max_lines, max_age_s=args.max_age)
    udp, tcp = srv.start()
    print(json.dumps({"spool": args.spool, "udp_port": udp, "tcp_port": tcp}),
          flush=True)
    # SIGTERM must flush the un-rotated spool buffer too, not just ^C
    import signal

    def _term(signum, frame):
        raise SystemExit(0)

    old = signal.signal(signal.SIGTERM, _term)
    try:
        if args.duration > 0:
            time.sleep(args.duration)
        else:
            while True:
                time.sleep(1.0)
    except (KeyboardInterrupt, SystemExit):
        pass
    finally:
        signal.signal(signal.SIGTERM, old)
        srv.stop()
    return 0


CONSOLE_HELP = (
    "logtrics_ray console — type a log line, every loaded rule runs on "
    "it and matching emissions print as JSON points; 'exit' or EOF ends "
    "the session (≙ the reference's readline console reader, "
    "reader/readers.go:73-106)")


def cmd_console(args) -> int:
    """Interactive console reader (reference S1,
    /root/reference/reader/readers.go:73-106): stdin lines -> every rule
    -> printed emissions.  No Ray session — the extractor runs
    in-process on one-line Arrow batches, i.e. the EXACT kernels the
    distributed path runs per batch (same rule compile, ts synthesis,
    emission rendering), so a rule debugged here behaves identically in
    `run`/`watch`."""
    import sys

    import pyarrow as pa

    from logtrics_ray.config import EngineConfig
    from logtrics_ray.rules import default_rules, load_rules
    from logtrics_ray.stages.extract import RuleExtractor

    rules = load_rules(args.rules) if args.rules else default_rules()
    ex = RuleExtractor(rules, EngineConfig(), text_column="text")
    interactive = sys.stdin.isatty()
    if interactive:
        print(CONSOLE_HELP, flush=True)
    lineno = 0
    while True:
        if interactive:
            sys.stdout.write("logtrics> ")
            sys.stdout.flush()
        raw = sys.stdin.readline()
        if not raw:
            break                        # EOF
        line = raw.rstrip("\n")
        if line.strip() == "exit":       # readline EOFPrompt analog
            break
        if not line.strip():
            continue
        lineno += 1
        # one-line batch; doc_id is deterministic so the synthesized
        # event time (epoch0 + hash % horizon) is reproducible
        batch = pa.table({
            "doc_id": pa.array([f"console-{lineno}"], pa.string()),
            "text": pa.array([line], pa.string()),
            "source": pa.array(["console"], pa.string())})
        for row in ex(batch).to_pylist():
            print(json.dumps({
                "series_key": row["series_key"],
                "metric_type": row["metric_type"],
                "ts_ms": row["ts_ms"],
                "value": row["value"]}, sort_keys=True), flush=True)
    if ex.row_errors:
        print(json.dumps({"row_errors": ex.row_errors,
                          "rule_errors": {k: v for k, v
                                          in ex.rule_errors.items() if v}}),
              file=sys.stderr)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="logtrics_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    def engine_flags(sp):
        # run/append/watch share the full engine-config surface: an append
        # or watch with different bucket/exchange settings than the stored
        # tiers would hash to a new lineage and full-recompute every poll.
        sp.add_argument("--input", required=True, help="token-table parquet dir")
        sp.add_argument("--out", required=True, help="tier output root")
        sp.add_argument("--rules", default=None,
                        help="rule spec: TOML/JSON file, reference *.lua "
                             "script, OR a directory of *.toml/*.lua files")
        sp.add_argument("--tiers", default="1m,1h,1d")
        sp.add_argument("--gap-fill", default="locf",
                        choices=["null", "locf", "linear"])
        sp.add_argument("--salt-buckets", type=int, default=8)
        sp.add_argument("--series-buckets", type=int, default=64)
        sp.add_argument("--rollup-buckets", type=int, default=64)
        sp.add_argument("--exchange", default="salted",
                        choices=["direct", "salted"],
                        help="fused exchange shape: salted two-phase "
                             "(skew-safe, default) or direct single all-to-all")
        sp.add_argument("--num-cpus", type=int, default=None)

    r = sub.add_parser("run", help="extract -> rollup -> tiers -> write")
    engine_flags(r)
    r.add_argument("--no-resume", action="store_true")
    r.set_defaults(fn=cmd_run)

    a = sub.add_parser("append", help="incremental append of new input shards")
    engine_flags(a)
    a.set_defaults(fn=cmd_append)

    w = sub.add_parser("watch", help="poll for new shards, append incrementally")
    engine_flags(w)
    w.add_argument("--interval", type=float, default=10.0,
                   help="seconds between polls")
    w.add_argument("--max-iter", type=int, default=0,
                   help="stop after N polls (0 = run until STOP file)")
    w.set_defaults(fn=cmd_watch)

    v = sub.add_parser("validate", help="audit the input's per-row invariants")
    v.add_argument("--input", required=True)
    v.add_argument("--num-cpus", type=int, default=None)
    v.set_defaults(fn=cmd_validate)

    s = sub.add_parser("synth", help="write the deterministic token table")
    s.add_argument("--out", required=True)
    s.add_argument("--rows", type=int, default=200_000)
    s.add_argument("--shards", type=int, default=8)
    s.add_argument("--num-cpus", type=int, default=None)
    s.set_defaults(fn=cmd_synth)

    i = sub.add_parser(
        "inspect", help="decode + summarize a written tier (streamed "
                        "partials: driver memory bounded by the DISTINCT "
                        "series count, never by tier rows)")
    i.add_argument("--out", required=True)
    i.add_argument("--tier", default="1m")
    i.add_argument("--window-min", type=int, default=None,
                   help="inclusive window_start range start (ms) — prunes "
                        "partitions/blocks/rows before decode")
    i.add_argument("--window-max", type=int, default=None)
    i.add_argument("--num-cpus", type=int, default=None)
    i.set_defaults(fn=cmd_inspect)

    pg = sub.add_parser(
        "purge", help="retention purge: drop windows older than a cutoff "
                      "from a stored tier (manifest-driven, idempotent)")
    pg.add_argument("--out", required=True)
    pg.add_argument("--tier", default="1m")
    pg.add_argument("--cutoff-ms", type=int, default=None,
                    help="absolute epoch-ms cutoff (drop strictly older)")
    pg.add_argument("--keep-ms", type=int, default=None,
                    help="relative: cutoff = max stored window - keep_ms")
    pg.add_argument("--num-cpus", type=int, default=None)
    pg.set_defaults(fn=cmd_purge)

    pk = sub.add_parser("pack", help="sequence packing: token table -> "
                                     "fixed-length training chunks")
    pk.add_argument("--input", required=True, help="token table dir/file")
    pk.add_argument("--out", required=True, help="output parquet dir")
    pk.add_argument("--seq-len", type=int, default=2048)
    pk.add_argument("--bucket-bits", type=int, default=6)
    pk.add_argument("--num-cpus", type=int, default=None)
    pk.set_defaults(fn=cmd_pack)

    an = sub.add_parser("analyze", help="tier analytics over a stored "
                        "tier: anomaly|lttb|m4|holt|seasonal|threshold|"
                        "storage-agg")
    an.add_argument("op", choices=ANALYZE_OPS)
    an.add_argument("--tiers", required=True,
                    help="tier store dir (the `run` --out)")
    an.add_argument("--tier", default="1h")
    an.add_argument("--out", required=True)
    an.add_argument("--k", type=int, default=24)
    an.add_argument("--n-out", type=int, default=24)
    an.add_argument("--pixels", type=int, default=32)
    an.add_argument("--threshold", type=int, default=4)
    an.add_argument("--window-min", type=int, default=None,
                    help="inclusive window_start range start (ms) — prunes "
                         "partitions/blocks/rows before decode")
    an.add_argument("--window-max", type=int, default=None)
    an.add_argument("--num-cpus", type=int, default=None)
    an.set_defaults(fn=cmd_analyze)

    cu = sub.add_parser("curate", help="corpus curation funnel: quality "
                        "-> length band -> exact + minhash dedup -> "
                        "decontaminate; writes curated doc ids")
    cu.add_argument("--input", required=True,
                    help="documents.parquet (or a dir containing it)")
    cu.add_argument("--out", required=True)
    cu.add_argument("--q-min", type=float, default=0.65)
    cu.add_argument("--num-cpus", type=int, default=None)
    cu.set_defaults(fn=cmd_curate)

    sm = sub.add_parser("sample", help="deterministic training-mix "
                                       "sampling by per-source rates")
    sm.add_argument("--input", required=True)
    sm.add_argument("--out", required=True)
    sm.add_argument("--rate", action="append", default=[],
                    metavar="SOURCE=RATE", help="repeatable, e.g. web=0.35")
    sm.add_argument("--epochs", action="store_true",
                    help="allow rates > 1: emit floor(rate) epoch-tagged "
                         "copies per doc plus a hash-decided fraction")
    sm.add_argument("--num-cpus", type=int, default=None)
    sm.set_defaults(fn=cmd_sample)

    gp = sub.add_parser(
        "push", help="stream a stored tier to a Graphite/carbon endpoint "
                     "(plaintext protocol; distributed render, edge socket)")
    gp.add_argument("--out", required=True, help="tier output root")
    gp.add_argument("--tier", default="1m")
    gp.add_argument("--graphite-host", required=True)
    gp.add_argument("--graphite-port", type=int, default=2003)
    gp.add_argument("--prefix", default="",
                    help="metric path prefix (joined with a dot)")
    gp.add_argument("--num-cpus", type=int, default=None)
    gp.set_defaults(fn=cmd_push)

    ls = sub.add_parser(
        "listen", help="UDP/TCP line listener -> rotating .log shards "
                       "(push-ingest edge; pair with `watch` or "
                       "read_log_lines on the spool)")
    ls.add_argument("--spool", required=True, help="shard output dir")
    ls.add_argument("--udp-port", type=int, default=None)
    ls.add_argument("--tcp-port", type=int, default=None)
    # loopback by default: an all-interfaces unauthenticated ingest port
    # must be an explicit operator choice (--host 0.0.0.0)
    ls.add_argument("--host", default="127.0.0.1")
    ls.add_argument("--max-lines", type=int, default=10_000,
                    help="rotate a shard after this many lines")
    ls.add_argument("--max-age", type=float, default=5.0,
                    help="rotate a non-empty shard after this many seconds")
    ls.add_argument("--duration", type=float, default=0.0,
                    help="stop after N seconds (0 = until SIGINT)")
    ls.set_defaults(fn=cmd_listen)

    co = sub.add_parser(
        "console", help="interactive rule debugger: stdin lines -> every "
                        "rule -> printed JSON points (reference console "
                        "reader)")
    co.add_argument("--rules", default=None,
                    help="rule spec: TOML/JSON file, reference *.lua "
                         "script, or a directory (default: built-in rules)")
    co.set_defaults(fn=cmd_console)

    p.add_argument("--log-type", default="console",
                   choices=["console", "syslog"],
                   help="application logger sink (reference config.Logger)")
    p.add_argument("--log-level", default="info",
                   choices=["trace", "debug", "info", "warn", "error",
                            "fatal"])

    args = p.parse_args(argv)
    from logtrics_ray.rules import configure_logging
    configure_logging(args.log_type, args.log_level)
    rc = args.fn(args)
    import ray
    if _RAY_OWNED and ray.is_initialized():
        ray.shutdown()   # only tear down a session this CLI created
    return rc


if __name__ == "__main__":
    sys.exit(main())
