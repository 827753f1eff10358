"""Storage paths: fused finalize+write == two-stage finalize->write; resume."""

from __future__ import annotations

import shutil

import pytest

from logtrics_ray.config import TIERS, EngineConfig
from logtrics_ray.pipelines.rollup_pipeline import (build_core_tiers,
                                                    extract_points,
                                                    read_token_table, run)
from logtrics_ray.rules import default_rules
from logtrics_ray.stages import storage
from logtrics_ray.stages.seriesscan import finalize_tier
from logtrics_ray.state import manifest as M

from tests.util import assert_frames_identical


@pytest.fixture(scope="module")
def core_1m(t1_dir):
    cfg = EngineConfig()
    points = extract_points(read_token_table(t1_dir), default_rules(), cfg)
    return build_core_tiers(points, cfg)["1m"]


def test_fused_write_equals_two_stage(core_1m, tmp_path):
    cfg = EngineConfig()
    ch = M.config_hash(cfg, default_rules())
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    final = finalize_tier(core_1m, TIERS["1m"], cfg)
    storage.write_tier(final, a_dir, "1m", cfg, "t", ch).materialize()
    storage.write_tier_finalized(core_1m, b_dir, "1m", TIERS["1m"], cfg, "t", ch).materialize()
    df_a = storage.read_tier(a_dir, "1m").to_pandas()
    df_b = storage.read_tier(b_dir, "1m").to_pandas()
    assert_frames_identical(df_a, df_b, msg="fused vs two-stage write")


def test_roundtrip_through_gorilla(core_1m, tmp_path):
    cfg = EngineConfig()
    ch = M.config_hash(cfg, default_rules())
    out = str(tmp_path / "rt")
    storage.write_tier_finalized(core_1m, out, "1m", TIERS["1m"], cfg, "t", ch).materialize()
    mem = finalize_tier(core_1m, TIERS["1m"], cfg).to_pandas()
    disk = storage.read_tier(out, "1m").to_pandas()
    assert_frames_identical(mem, disk, msg="gorilla round-trip")


def test_resume_skips_and_recovers(t1_dir, tmp_path):
    out = str(tmp_path / "resume")
    run(t1_dir, out, resume=False)
    before = storage.read_tier(out, "1m").to_pandas()
    # simulate partial loss: nuke 3 buckets in every tier
    for tier in ("1m", "1h", "1d"):
        for b in (0, 5, 11):
            shutil.rmtree(f"{out}/tier={tier}/bucket={b:05d}", ignore_errors=True)
    run(t1_dir, out)  # resume
    after = storage.read_tier(out, "1m").to_pandas()
    assert_frames_identical(before, after, msg="resume-after-partial-loss")
    # full resume: nothing recomputed, manifests stable (_RUN_METRICS is
    # refreshed by design — it records the resume itself)
    import os
    mt = {p: os.path.getmtime(os.path.join(r, p))
          for r, _, fs in os.walk(out) for p in fs
          if not p.startswith("_RUN_METRICS")}
    run(t1_dir, out)
    mt2 = {p: os.path.getmtime(os.path.join(r, p))
           for r, _, fs in os.walk(out) for p in fs
           if not p.startswith("_RUN_METRICS")}
    assert mt == mt2


def test_fused_run_equals_staged_run(t1_dir, tmp_path):
    """ONE-shuffle fused pipeline == staged multi-shuffle pipeline,
    bit-for-bit across every tier (and both leave valid manifests)."""
    from logtrics_ray.pipelines import rollup_pipeline as P
    from logtrics_ray.stages.storage import read_tier
    a_dir, b_dir = str(tmp_path / "staged"), str(tmp_path / "fused")
    ra = P.run(t1_dir, a_dir, resume=False, mode="staged")
    rb = P.run(t1_dir, b_dir, resume=False, mode="fused")
    key = ["series_key", "metric_type", "window_start"]
    for tier in ("1m", "1h", "1d"):
        a = read_tier(a_dir, tier).to_pandas().sort_values(key).reset_index(drop=True)
        b = read_tier(b_dir, tier).to_pandas().sort_values(key).reset_index(drop=True)
        assert a.equals(b), f"tier {tier}: fused != staged"
        assert sum(m["rows"] for m in ra[tier]) == sum(m["rows"] for m in rb[tier])


def test_salted_exchange_equals_direct(t1_dir, tmp_path):
    """cfg.exchange='salted' (two-phase skew exchange: (bucket, salt)
    partials -> bucket merge) produces bit-identical tiers to the direct
    single-exchange route."""
    from logtrics_ray.pipelines import rollup_pipeline as P
    from logtrics_ray.stages.storage import read_tier
    a_dir, b_dir = str(tmp_path / "direct"), str(tmp_path / "salted")
    P.run(t1_dir, a_dir, cfg=EngineConfig(exchange="direct"), resume=False)
    P.run(t1_dir, b_dir, cfg=EngineConfig(exchange="salted"), resume=False)
    key = ["series_key", "metric_type", "window_start"]
    for tier in ("1m", "1h", "1d"):
        a = read_tier(a_dir, tier).to_pandas().sort_values(key).reset_index(drop=True)
        b = read_tier(b_dir, tier).to_pandas().sort_values(key).reset_index(drop=True)
        assert a.equals(b), f"tier {tier}: salted != direct"


def _tree_bytes(out_dir):
    """{relpath: file bytes} for a whole output tree (manifests included:
    they carry no timestamps — fully deterministic).  _RUN_METRICS* is
    excluded: the run-observability artifact carries wall times by
    design and is not part of the determinism contract."""
    import os
    d = {}
    for root, dirs, files in sorted(os.walk(out_dir)):
        dirs.sort()
        for f in sorted(files):
            if f.startswith("_RUN_METRICS"):
                continue
            p = os.path.join(root, f)
            d[os.path.relpath(p, out_dir)] = open(p, "rb").read()
    return d


@pytest.mark.parametrize("exchange", ["direct", "salted"])
def test_hash_shuffle_impl_equals_sort(t1_dir, tmp_path, exchange):
    """shuffle_impl='hash' (keyed hash repartition + in-block group
    split) == shuffle_impl='sort' (Ray sort-based groupby), BYTE-for-byte
    on disk including the persisted core.parquet merge state — the
    canonical core order pins the hash path's arrival-order freedom.
    Same input_tag -> manifests must also be identical."""
    from logtrics_ray.pipelines import rollup_pipeline as P
    outs = {}
    for impl in ("sort", "hash"):
        out = str(tmp_path / f"{exchange}_{impl}")
        P.run(t1_dir, out, resume=False, input_tag="tok",
              cfg=EngineConfig(exchange=exchange, shuffle_impl=impl))
        outs[impl] = _tree_bytes(out)
    assert outs["sort"].keys() == outs["hash"].keys()
    diff = [k for k, v in outs["sort"].items() if outs["hash"][k] != v]
    assert not diff, f"hash != sort ({exchange}): {diff[:5]}"


def test_no_match_rules_produce_empty_tiers(t1_dir, tmp_path):
    """A rule set that never matches -> 0-row tiers, no crash (the drop
    path at scale, /root/reference/logtrics.go:184-188)."""
    from logtrics_ray.pipelines import rollup_pipeline as P
    from logtrics_ray.rules import load_rules
    rules = load_rules([{
        "name": "never",
        "expression": r"zz_absent_anchor_q7=(?P<x>\d+)",
        "emit": [{"metric_type": "counter", "series": "n.{x}", "value": 1}],
    }])
    out = str(tmp_path / "empty")
    res = P.run(t1_dir, out, rules=rules, resume=False)
    # every bucket completes with a rows=0 manifest (run-level completeness:
    # a resumed run can early-exit instead of re-extracting everything)
    from logtrics_ray.config import EngineConfig
    nb = EngineConfig().series_buckets
    assert all(len(ms) == nb and all(m["rows"] == 0 for m in ms)
               for ms in res.values())
    assert storage.read_tier(out, "1m").count() == 0
    # fully-complete resume: early-exits without re-running the pipeline
    import time
    t0 = time.perf_counter()
    P.run(t1_dir, out, rules=rules)
    assert time.perf_counter() - t0 < 2.0


def test_write_partition_crash_window_recovers(tmp_path):
    """A crash inside write_partition's swap window must never lose the
    committed partition: the old dir is renamed aside (.old), not deleted,
    and the listers restore it (regression for the rmtree-before-replace
    data-loss window)."""
    import json
    import os
    out = str(tmp_path / "o")

    def write_v(tmp_dir, v):
        with open(os.path.join(tmp_dir, "data.txt"), "w") as f:
            f.write(v)

    M.write_partition(out, "1m", 3, lambda d: write_v(d, "v1"),
                      meta={"input_tag": "t", "cfg_hash": "h", "rows": 5})
    final = M.partition_dir(out, "1m", 3)
    # simulate the crash: committed dir renamed aside, replacement missing
    os.rename(final, final + ".old")
    assert not os.path.exists(final)
    done = M.completed_buckets(out, "1m", "t", "h")   # recovers + lists
    assert done == {3}
    assert open(os.path.join(final, "data.txt")).read() == "v1"
    # stale working dirs are never listed as partitions
    os.makedirs(final + ".tmp", exist_ok=True)
    json.dump({"bucket": 9}, open(os.path.join(final + ".tmp",
                                               M.MANIFEST_NAME), "w"))
    assert [m["bucket"] for m in M.load_manifests(out, "1m")] == [3]
    # normal overwrite still works after recovery
    M.write_partition(out, "1m", 3, lambda d: write_v(d, "v2"),
                      meta={"input_tag": "t", "cfg_hash": "h", "rows": 6})
    assert open(os.path.join(final, "data.txt")).read() == "v2"
    assert not os.path.exists(final + ".old")


def test_empty_input_pipeline(tmp_path):
    """A zero-row (but schema-complete) input runs clean end to end."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from logtrics_ray.pipelines import rollup_pipeline as P
    d = tmp_path / "empty_in"
    d.mkdir()
    empty = pa.Table.from_arrays([
        pa.array([], pa.string()), pa.array([], pa.list_(pa.int32())),
        pa.array([], pa.int32()), pa.array([], pa.string()),
    ], names=["doc_id", "tokens", "n_tok", "source"])
    pq.write_table(empty, str(d / "part-0.parquet"))
    res = P.run(str(d), str(tmp_path / "empty_out"), resume=False)
    assert all(all(m["rows"] == 0 for m in ms) for ms in res.values())


def test_stale_old_dir_swept_when_final_committed(tmp_path):
    """A crash AFTER the manifest os.replace but BEFORE the old-copy
    cleanup leaves '<bucket>.old' beside a fully-committed partition.
    The lister must sweep it — it is a full stale duplicate of the
    partition that would otherwise linger forever."""
    import os
    out = str(tmp_path / "o")

    def write_v(tmp_dir, v):
        with open(os.path.join(tmp_dir, "data.txt"), "w") as f:
            f.write(v)

    M.write_partition(out, "1m", 3, lambda d: write_v(d, "v2"),
                      meta={"input_tag": "t", "cfg_hash": "h", "rows": 5})
    final = M.partition_dir(out, "1m", 3)
    shutil.copytree(final, final + ".old")    # the stale pre-swap copy
    done = M.completed_buckets(out, "1m", "t", "h")
    assert done == {3}
    assert not os.path.exists(final + ".old")           # swept
    assert open(os.path.join(final, "data.txt")).read() == "v2"


def test_append_watch_cfg_mismatch_warns(tmp_path, capsys):
    """append/watch built with different engine flags than the stored
    tiers hash to a new lineage and silently full-recompute every poll;
    the CLI must warn on the mismatch (and stay silent on a match)."""
    from logtrics_ray import cli
    out = str(tmp_path / "o")
    rules = default_rules()
    cfg_built = EngineConfig(salt_buckets=4)
    M.write_partition(out, "1m", 0, lambda d: None, meta={
        "input_tag": "t", "rows": 0,
        "cfg_hash": M.config_hash(cfg_built, rules)})
    cli._warn_cfg_mismatch(out, cfg_built, rules)
    assert "WARNING" not in capsys.readouterr().err     # match -> silent
    cli._warn_cfg_mismatch(out, EngineConfig(salt_buckets=16), rules)
    assert "does not match" in capsys.readouterr().err  # mismatch -> warn


def test_purge_tier_filters_storage_bit_exact(t1_dir, tmp_path):
    """Retention purge == row filter of the stored tier, bit-for-bit:
    straddling blocks suffix-re-encode exactly, fully-expired partitions
    become rows=0 tombstones that keep lineage, re-purge is a no-op, and
    the incremental core partials filter consistently."""
    import os

    import numpy as np

    out = str(tmp_path / "pg")
    run(t1_dir, out)
    before = storage.read_tier(out, "1h").to_pandas()
    ws = np.sort(before["window_start"].unique())
    assert len(ws) > 10
    cutoff = int(ws[len(ws) // 2]) + 1          # mid-range, off-boundary

    res = storage.purge_tier(out, "1h", cutoff)
    assert res["rewritten"] > 0
    after = storage.read_tier(out, "1h").to_pandas()
    want = before[before.window_start >= cutoff].reset_index(drop=True)
    key = ["series_key", "metric_type", "window_start"]
    assert_frames_identical(want.sort_values(key).reset_index(drop=True),
                            after.sort_values(key).reset_index(drop=True),
                            msg="purge == stored-row filter")

    # manifests: consistent ranges/rows, lineage preserved
    rows = 0
    for m in M.load_manifests(out, "1h"):
        assert m["cfg_hash"] and m["input_tag"]
        if m["window_min"] is not None:
            assert m["window_min"] >= cutoff
        rows += m["rows"]
        core = os.path.join(M.partition_dir(out, "1h", m["bucket"]),
                            "core.parquet")
        if os.path.isfile(core):
            import pyarrow.parquet as pq
            t = pq.read_table(core)
            assert (t.num_rows == 0
                    or pa_min(t["window_start"]) >= cutoff)
    assert rows == len(after)

    # idempotent: second purge touches nothing
    res2 = storage.purge_tier(out, "1h", cutoff)
    assert res2 == {"kept": res["kept"] + res["emptied"] + res["rewritten"],
                    "emptied": 0, "rewritten": 0}

    # purge-everything: all partitions become lineage-keeping tombstones
    res3 = storage.purge_tier(out, "1h", int(ws[-1]) + 1)
    assert res3["kept"] + res3["emptied"] + res3["rewritten"] \
        == res["kept"] + res["emptied"] + res["rewritten"]
    assert len(storage.read_tier(out, "1h").to_pandas()) == 0
    assert all(m["rows"] == 0 and m["input_tag"]
               for m in M.load_manifests(out, "1h"))


def pa_min(col):
    import pyarrow.compute as pc
    return pc.min(col).as_py()


def test_run_metrics_artifact(t1_dir, tmp_path):
    """run/resume/append each persist _RUN_METRICS.json (north rule:
    lineage + METRICS): totals agree with the manifests, resume is
    visible as mode, and the JSONL history accumulates."""
    import json
    import os

    from logtrics_ray.state import runmeta

    out = str(tmp_path / "rm")
    res = run(t1_dir, out)
    m = runmeta.read_run_metrics(out)
    assert m["mode"] == "fused" and m["exchange"] == EngineConfig().exchange
    assert m["wall_s"] > 0 and "ray_stats" in m
    for tier, ms in res.items():
        assert m["tiers"][tier]["rows"] == sum(x["rows"] for x in ms)
        assert m["tiers"][tier]["buckets"] == len(ms)

    run(t1_dir, out)                      # complete resume
    m2 = runmeta.read_run_metrics(out)
    assert m2["mode"] == "fused(resume-complete)"
    assert m2["tiers"] == m["tiers"]

    from logtrics_ray.pipelines.rollup_pipeline import run_incremental
    run_incremental(t1_dir, out)          # no new shards
    m3 = runmeta.read_run_metrics(out)
    assert m3["mode"] == "incremental(no-new-shards)"

    hist = [json.loads(l) for l in
            open(os.path.join(out, "_RUN_METRICS.log.jsonl"))]
    assert [h["mode"] for h in hist] \
        == ["fused", "fused(resume-complete)", "incremental(no-new-shards)"]


def test_analyze_cli_over_stored_tiers(ray_session, t1_dir, tmp_path,
                                       capsys):
    """`analyze` CLI end-to-end: run the pipeline, then every analytic
    op over the STORED tiers — each writes parquet with the operator's
    schema and a sane row count."""
    import json as _json

    import pyarrow.parquet as pq

    from logtrics_ray import cli
    from logtrics_ray.pipelines import rollup_pipeline as P

    out = str(tmp_path / "tiers")
    P.run(t1_dir, out, resume=False)
    first_cols = {
        "anomaly": "is_anomaly", "lttb": "rank", "m4": "pixel",
        "holt": "forecast_next", "seasonal": "residual",
        "threshold": "direction", "storage-agg": "agg_method"}
    for op in cli.ANALYZE_OPS:
        dest = str(tmp_path / f"an_{op}")
        rc = cli.main(["analyze", op, "--tiers", out, "--tier", "1d",
                       "--out", dest])
        assert rc == 0
        info = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert info["op"] == op
        import glob
        t = pq.read_table(sorted(glob.glob(f"{dest}/*.parquet")))
        assert t.num_rows == info["rows"]
        assert first_cols[op] in t.schema.names


def test_read_tier_range_and_column_pruning(core_1m, tmp_path):
    """Pruned reads return EXACTLY the unpruned read's matching slice:
    (a) a window range prunes partitions by manifest stats + blocks by
    (window_lo, window_hi) row-group predicate + rows by exact range;
    (b) a value-column subset decodes only the requested planes (plus
    sum/count for derived mean/rate) with keys always present."""
    import numpy as np

    cfg = EngineConfig()
    ch = M.config_hash(cfg, default_rules())
    out = str(tmp_path / "pr")
    storage.write_tier_finalized(core_1m, out, "1m", TIERS["1m"], cfg,
                                 "t", ch).materialize()
    full = storage.read_tier(out, "1m").to_pandas()
    key = ["series_key", "metric_type", "window_start"]
    ws = np.sort(full["window_start"].unique())
    lo, hi = int(ws[len(ws) // 4]), int(ws[3 * len(ws) // 4])

    got = (storage.read_tier(out, "1m", window_min=lo, window_max=hi)
           .to_pandas().sort_values(key).reset_index(drop=True))
    want = (full[(full.window_start >= lo) & (full.window_start <= hi)]
            .sort_values(key).reset_index(drop=True))
    assert_frames_identical(want, got, msg="range-pruned read")

    cols = ["count", "mean", "rate", "gap_filled"]
    got_c = (storage.read_tier(out, "1m", window_min=lo, window_max=hi,
                               columns=cols)
             .to_pandas().sort_values(key).reset_index(drop=True))
    assert list(got_c.columns) == key + cols
    assert_frames_identical(want[key + cols], got_c,
                            msg="column-pruned read")

    # a disjoint range yields zero rows with the right schema (Ray's
    # to_pandas drops columns on 0-row datasets; check the Dataset schema)
    empty = storage.read_tier(out, "1m", window_min=int(ws[-1]) + 86_400_000)
    assert empty.count() == 0
    assert empty.schema().names == list(full.columns)
