"""Incremental append (stages/incremental.py + run_incremental).

Contract: incremental(A, then B) vs full-recompute(A ∪ B) —
  * window sets, counts, min/max, gauge last, gap_filled: EXACT
  * float sums / derived (mean, cumulative, rate, EWMA): equal up to
    float reduction-order regrouping (allclose at 1e-9 relative)
  * t-digest percentiles: within the sketch's accuracy (2% here)
and a second run with no new shards is a no-op.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pytest


@pytest.fixture(scope="module")
def split_input(tmp_path_factory):
    """One 8-shard token table + a staged copy that grows 4 -> 8 shards."""
    from logtrics_ray.synth import write_token_table
    base = tmp_path_factory.mktemp("inc")
    full = write_token_table(str(base / "full"), 4000, n_shards=8)
    grow = str(base / "grow")
    os.makedirs(grow, exist_ok=True)
    shards = sorted(f for f in os.listdir(full) if f.endswith(".parquet"))
    for f in shards[:4]:
        shutil.copy(os.path.join(full, f), os.path.join(grow, f))
    return full, grow, shards


def _tier_frames(out_dir):
    from logtrics_ray.stages.storage import read_tier
    key = ["series_key", "metric_type", "window_start"]
    return {t: read_tier(out_dir, t).to_pandas().sort_values(key).reset_index(drop=True)
            for t in ("1m", "1h", "1d")}


def test_incremental_append_matches_full(split_input, tmp_path):
    from logtrics_ray.pipelines import rollup_pipeline as P
    full, grow, shards = split_input
    full_out, inc_out = str(tmp_path / "full"), str(tmp_path / "inc")

    P.run(full, full_out, resume=False, input_tag="tok")
    P.run(grow, inc_out, resume=False, input_tag="tok")         # first 4 shards
    for f in shards[4:]:                                        # append the rest
        shutil.copy(os.path.join(full, f), os.path.join(grow, f))
    res = P.run_incremental(grow, inc_out, input_tag="tok")
    assert all(len(ms) > 0 for ms in res.values())

    a, b = _tier_frames(full_out), _tier_frames(inc_out)
    exact = ["series_key", "metric_type", "window_start", "count",
             "vmin", "vmax", "last", "gap_filled"]
    close = ["sum", "mean", "cumulative", "rate",
             "ewma_60s", "ewma_300s", "ewma_900s"]
    for tier in ("1m", "1h", "1d"):
        fa, fb = a[tier], b[tier]
        assert len(fa) == len(fb), f"{tier}: row count"
        for c in exact:
            assert fa[c].equals(fb[c]), f"{tier}: exact col {c}"
        for c in close:
            ga = fa[c].to_numpy(float); gb = fb[c].to_numpy(float)
            ok = np.isclose(ga, gb, rtol=1e-9, atol=1e-12) | (np.isnan(ga) & np.isnan(gb))
            assert ok.all(), f"{tier}: col {c} drifted"
        for c in ("p50", "p99"):
            ga = fa[c].to_numpy(float); gb = fb[c].to_numpy(float)
            both = np.isfinite(ga) & np.isfinite(gb)
            assert (np.isfinite(ga) == np.isfinite(gb)).all()
            if both.any():
                rel = np.abs(ga[both] - gb[both]) / np.maximum(np.abs(ga[both]), 1e-9)
                assert rel.max() <= 0.02, f"{tier}: {c} beyond sketch tolerance"

    # lineage complete -> second incremental run is a no-op
    import time
    t0 = time.perf_counter()
    P.run_incremental(grow, inc_out, input_tag="tok")
    assert time.perf_counter() - t0 < 2.0


def test_incremental_retry_is_idempotent(split_input, tmp_path):
    """Simulated crash between bucket commits: after an append, one
    bucket's partitions are restored to their pre-append state (as if that
    bucket never committed).  Re-running the append must (a) bring the
    stale bucket up to date and (b) NOT double-merge the shards into
    buckets that already consumed them — the double-count hazard of the
    unguarded merge (per-point _shard provenance filters consumed shards
    per bucket before the merge)."""
    import json
    from logtrics_ray.pipelines import rollup_pipeline as P
    full, grow_src, shards = split_input
    grow = str(tmp_path / "grow2")
    os.makedirs(grow, exist_ok=True)
    for f in shards[:4]:
        shutil.copy(os.path.join(full, f), os.path.join(grow, f))
    out = str(tmp_path / "out")
    P.run(grow, out, resume=False, input_tag="tok")

    # pick a bucket with data and snapshot its partitions (all tiers)
    mset = [m for m in P.M.load_manifests(out, "1m") if m["rows"] > 0]
    bucket = int(mset[0]["bucket"])
    snap = str(tmp_path / "snap")
    for tier in ("1m", "1h", "1d"):
        src = P.M.partition_dir(out, tier, bucket)
        shutil.copytree(src, os.path.join(snap, f"tier={tier}"))

    for f in shards[4:]:
        shutil.copy(os.path.join(full, f), os.path.join(grow, f))
    P.run_incremental(grow, out, input_tag="tok")
    want = _tier_frames(out)

    # crash simulation: bucket never committed the append
    for tier in ("1m", "1h", "1d"):
        dst = P.M.partition_dir(out, tier, bucket)
        shutil.rmtree(dst)
        shutil.copytree(os.path.join(snap, f"tier={tier}"), dst)
    stale = json.load(open(os.path.join(P.M.partition_dir(out, "1m", bucket),
                                        P.M.MANIFEST_NAME)))
    assert set(stale["input_files"]) < set(shards)  # genuinely stale

    P.run_incremental(grow, out, input_tag="tok")   # the retry
    got = _tier_frames(out)
    for tier in ("1m", "1h", "1d"):
        assert want[tier].equals(got[tier]), f"{tier}: retry changed bits"


def test_incremental_salted_equals_direct(split_input, tmp_path):
    """run_incremental under exchange='salted' (stage-1 per-bucket shard
    filtering + partial exchange) == exchange='direct', bit-for-bit."""
    from logtrics_ray.config import EngineConfig
    from logtrics_ray.pipelines import rollup_pipeline as P
    full, _grow, shards = split_input
    outs = {}
    for mode in ("direct", "salted"):
        cfg = EngineConfig(exchange=mode)
        grow = str(tmp_path / f"g_{mode}")
        os.makedirs(grow, exist_ok=True)
        for f in shards[:4]:
            shutil.copy(os.path.join(full, f), os.path.join(grow, f))
        out = str(tmp_path / f"o_{mode}")
        P.run(grow, out, cfg=cfg, resume=False, input_tag="tok")
        for f in shards[4:]:
            shutil.copy(os.path.join(full, f), os.path.join(grow, f))
        P.run_incremental(grow, out, cfg=cfg, input_tag="tok")
        outs[mode] = _tier_frames(out)
    for tier in ("1m", "1h", "1d"):
        assert outs["direct"][tier].equals(outs["salted"][tier]), tier


def test_watch_cli_picks_up_arriving_shards(split_input, tmp_path, capsys):
    """`watch` (the live-tailing analog): each poll merges newly-arrived
    shards; a poll with nothing new is a no-op."""
    import json
    from logtrics_ray import cli
    full, _grow, shards = split_input
    grow = str(tmp_path / "watchgrow")
    os.makedirs(grow, exist_ok=True)
    for f in shards[:4]:
        shutil.copy(os.path.join(full, f), os.path.join(grow, f))
    out = str(tmp_path / "watchout")
    from logtrics_ray.pipelines.rollup_pipeline import run
    run(grow, out, resume=False, input_tag=grow)

    for f in shards[4:6]:
        shutil.copy(os.path.join(full, f), os.path.join(grow, f))
    rc = cli.main(["watch", "--input", grow, "--out", out,
                   "--interval", "0.1", "--max-iter", "2"])
    assert rc == 0
    # the CLI contract is one JSON object per poll on stdout; Ray's
    # raylet may interleave its own warnings (log_to_driver) — skip them
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
             if l.lstrip().startswith("{")]
    assert len(lines) == 2 and lines[0]["iter"] == 1
    # second poll saw nothing new -> fast no-op
    assert lines[1]["wall_s"] < 2.0
    # the merged output covers shards[:6]
    import json as _j
    from logtrics_ray.state import manifest as M
    m = M.load_manifests(out, "1m")[0]
    assert set(m["input_files"]) == set(shards[:6])


def test_merge_cores_exact_semantics():
    """merge_cores == full recompute for int aggregates and order keys."""
    import pyarrow as pa
    from logtrics_ray.config import EngineConfig, TIERS
    from logtrics_ray.stages.incremental import merge_cores
    from logtrics_ray.stages.rollup import _bucket_rollup_fn, assign_windows
    from logtrics_ray.stages.extract import POINTS_SCHEMA
    import ray.data as rd

    rng = np.random.default_rng(5)
    n = 3000
    t = pa.Table.from_arrays([
        pa.array(rng.choice(["a", "b"], size=n)),
        pa.array(rng.choice(["counter", "gauge", "timer"], size=n)),
        pa.array(rng.integers(0, 2 * 3_600_000, size=n), pa.int64()),
        pa.array(rng.normal(size=n), pa.float64()),
        pa.array(np.arange(n, dtype=np.uint64), pa.uint64()),
    ], schema=POINTS_SCHEMA)
    cfg = EngineConfig()
    w = assign_windows(rd.from_arrow(t), TIERS["1m"], cfg).to_pandas()
    wt = pa.Table.from_pandas(w, preserve_index=False)
    full = _bucket_rollup_fn(wt).to_pandas()
    part_a = _bucket_rollup_fn(wt.slice(0, 2000))
    part_b = _bucket_rollup_fn(wt.slice(2000))
    merged = merge_cores(part_a, part_b).to_pandas()
    key = ["series_key", "metric_type", "window_start"]
    full = full.sort_values(key).reset_index(drop=True)
    merged = merged.sort_values(key).reset_index(drop=True)
    assert len(full) == len(merged)
    for c in key + ["count", "vmin", "vmax", "last", "last_ts", "last_tb"]:
        assert full[c].equals(merged[c]), f"col {c}"
    assert np.allclose(full["sum"], merged["sum"], rtol=1e-9)


def test_append_after_purge(split_input):
    """Retention purge then incremental append: the purge's lineage-
    preserving manifests keep resume/append working — new shards merge
    into the filtered core, purged windows stay gone (unless new data
    re-creates them), a second append is a no-op, and the tiers'
    window floor never dips below the cutoff for old-only series data."""
    import numpy as np

    from logtrics_ray.pipelines import rollup_pipeline as P
    from logtrics_ray.stages.storage import purge_tier, read_tier
    from logtrics_ray.state import manifest as M

    full, _, shards = split_input
    out = "/tmp/lt_purge_append"
    import shutil as sh
    sh.rmtree(out, ignore_errors=True)
    # own staging dir: the fixture's `grow` is mutated by earlier tests
    grow = "/tmp/lt_purge_append_grow"
    sh.rmtree(grow, ignore_errors=True)
    import os
    os.makedirs(grow)
    for f in shards[:4]:
        sh.copy(os.path.join(full, f), os.path.join(grow, f))
    P.run(grow, out, input_tag="tok")

    df0 = read_tier(out, "1m").to_pandas()
    ws = np.sort(df0["window_start"].unique())
    cutoff = int(ws[len(ws) // 3]) + 1
    purge_tier(out, "1m", cutoff)

    # append the remaining 4 shards
    import os
    for f in shards[4:]:
        sh.copy(os.path.join(full, f), os.path.join(grow, f))
    res = P.run_incremental(grow, out, input_tag="tok")
    assert all(len(ms) for ms in res.values())

    df1 = read_tier(out, "1m").to_pandas()
    assert len(df1) > 0
    # below the cutoff, PRESENT windows (count>0; the rest is gap-fill)
    # must be exactly what the NEW shards alone produce there — purged
    # old data must not resurrect into the merge
    newonly = "/tmp/lt_purge_append_newonly"
    sh.rmtree(newonly, ignore_errors=True)
    new_dir = "/tmp/lt_purge_append_newshards"
    sh.rmtree(new_dir, ignore_errors=True)
    os.makedirs(new_dir)
    for f in shards[4:]:
        sh.copy(os.path.join(full, f), os.path.join(new_dir, f))
    P.run(new_dir, newonly, input_tag="new")
    want = read_tier(newonly, "1m").to_pandas()

    def present_below(df):
        d = df[(df.window_start < cutoff) & (df["count"] > 0)]
        return set(zip(d.series_key, d.metric_type,
                       d.window_start.astype(int), d["count"].astype(int)))

    assert present_below(df1) == present_below(want)

    # idempotent: re-append with nothing new changes no manifests
    before = {m["bucket"]: m["content_hash"]
              for m in M.load_manifests(out, "1m")}
    P.run_incremental(grow, out, input_tag="tok")
    after = {m["bucket"]: m["content_hash"]
             for m in M.load_manifests(out, "1m")}
    assert before == after
