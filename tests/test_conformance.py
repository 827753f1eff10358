"""The conformance gate: distributed engine == single-process oracle,
bit-for-bit, at every retention tier (BASELINE.json north_rule)."""

from __future__ import annotations

import pytest

from logtrics_ray.config import TIERS, EngineConfig
from logtrics_ray.pipelines.rollup_pipeline import (build_core_tiers,
                                                    extract_points,
                                                    read_token_table)
from logtrics_ray.rules import default_rules
from logtrics_ray.stages.seriesscan import finalize_tier

from tests.oracle import oracle_tiers
from tests.util import assert_frames_identical, assert_tier_matches_oracle


@pytest.fixture(scope="module")
def engine_tiers(t2_dir):
    cfg = EngineConfig()
    points = extract_points(read_token_table(t2_dir), default_rules(), cfg)
    core = build_core_tiers(points, cfg, two_phase=True)
    return {t: finalize_tier(core[t], TIERS[t], cfg).to_pandas() for t in cfg.tiers}, core


@pytest.fixture(scope="module")
def oracle(t2_dir):
    return oracle_tiers(t2_dir, default_rules(), EngineConfig())


@pytest.mark.parametrize("tier", ["1m", "1h", "1d"])
def test_tier_matches_oracle(engine_tiers, oracle, tier):
    dfs, _ = engine_tiers
    assert_tier_matches_oracle(dfs[tier], oracle[tier], msg=f"tier {tier}")


@pytest.mark.parametrize("variant", [("grouped", False), ("grouped", True)])
def test_rollup_modes_identical(t2_dir, variant):
    """bucket-major (default), fused and two-phase salted paths: identical bits."""
    mode, two_phase = variant
    cfg = EngineConfig()
    points = extract_points(read_token_table(t2_dir), default_rules(), cfg)
    core_a = build_core_tiers(points, cfg, mode="bucket")
    points_b = extract_points(read_token_table(t2_dir), default_rules(), cfg)
    core_b = build_core_tiers(points_b, cfg, two_phase=two_phase, mode=mode)
    for tier in cfg.tiers:
        df_a = finalize_tier(core_a[tier], TIERS[tier], cfg).to_pandas()
        df_b = finalize_tier(core_b[tier], TIERS[tier], cfg).to_pandas()
        assert_frames_identical(df_a, df_b, msg=f"bucket vs {mode}/{two_phase} {tier}")


def test_parallelism_invariance(t1_dir):
    """Different physical block layouts -> identical output bits."""
    import ray.data as rd
    cfg = EngineConfig()
    dfs = []
    for blocks in (2, 13):
        ds = rd.read_parquet(t1_dir, columns=["doc_id", "tokens", "n_tok", "source"],
                             override_num_blocks=blocks)
        core = build_core_tiers(extract_points(ds, default_rules(), cfg), cfg)
        dfs.append(finalize_tier(core["1m"], TIERS["1m"], cfg).to_pandas())
    assert_frames_identical(dfs[0], dfs[1], msg="block-layout invariance")


@pytest.mark.parametrize("mode", ["null", "locf", "linear"])
def test_gap_fill_modes_match_oracle(t1_dir, mode):
    cfg = EngineConfig(gap_fill=mode)
    points = extract_points(read_token_table(t1_dir), default_rules(), cfg)
    core = build_core_tiers(points, cfg)
    df = finalize_tier(core["1m"], TIERS["1m"], cfg).to_pandas()
    orc = oracle_tiers(t1_dir, default_rules(), cfg)
    assert_tier_matches_oracle(df, orc["1m"], msg=f"gap_fill={mode}")


def test_gap_domain_global_matches_oracle(t1_dir):
    """gap_domain="global": every series is extended to the global max
    window (the reference's registry-snapshot behavior — once registered,
    a metric is emitted every flush, graphite.go:84-90)."""
    from tests.oracle import (oracle_cascade, oracle_core_rollup,
                              oracle_finalize, oracle_points)
    cfg = EngineConfig(gap_domain="global")
    points = extract_points(read_token_table(t1_dir), default_rules(), cfg)
    core = build_core_tiers(points, cfg)
    df = finalize_tier(core["1h"], TIERS["1h"], cfg).to_pandas()
    # every series must now end at the same (global) last window
    assert df.groupby(["series_key", "metric_type"])["window_start"].max().nunique() == 1

    opts = oracle_points(t1_dir, default_rules(), cfg)
    ocore1m = oracle_core_rollup(opts, TIERS["1m"], cfg)
    ocore1h = oracle_cascade(ocore1m, TIERS["1h"])
    gmax = max(w for rows in ocore1h.values() for w in rows)
    assert_tier_matches_oracle(df, oracle_finalize(ocore1h, TIERS["1h"], cfg, gmax),
                               msg="gap_domain=global 1h")


def test_many_rules_fanout_matches_oracle(t1_dir):
    """Rule fan-out at scale (every row offered to EVERY rule,
    /root/reference/app.go:80-82): 20+ generated rules — distinct series
    namespaces, shared capture shapes, all four metric types — engine ==
    oracle bit-for-bit at 1m.  Also exercises the literal-factoring
    prefilter with a wide anchor set."""
    from logtrics_ray.rules import load_rules
    from tests.oracle import oracle_core_rollup, oracle_finalize, oracle_points
    from tests.util import assert_tier_matches_oracle

    mts = ["counter", "gauge", "timer", "meter"]
    spec = []
    for i in range(20):
        spec.append({
            "name": f"gen-{i}",
            # digits rotate the match set per rule; every rule still has
            # required literal chars for the prefilter
            "expression": rf'latency_ms=(?P<ms>\d*{i % 10}\d*)',
            "emit": [{"metric_type": mts[i % 4],
                      "series": f"gen{i}.{{_source}}",
                      "value": "float(ms)" if mts[i % 4] != "counter" else 1}],
        })
    rules = load_rules(spec)
    cfg = EngineConfig()
    points = extract_points(read_token_table(t1_dir), rules, cfg)
    core = build_core_tiers(points, cfg)
    df = finalize_tier(core["1m"], TIERS["1m"], cfg).to_pandas()
    assert df["series_key"].str.startswith("gen").all()
    assert df["series_key"].nunique() > 20   # fan-out across rules x sources

    opts = oracle_points(t1_dir, rules, cfg)
    ocore = oracle_core_rollup(opts, TIERS["1m"], cfg)
    assert_tier_matches_oracle(df, oracle_finalize(ocore, TIERS["1m"], cfg),
                               msg="20-rule fanout 1m")


def test_actor_pool_extraction_matches_task_mode(t1_dir):
    """The stateful actor-pool stage (north star: rules compiled once per
    actor in __init__) and the task-mode per-process cache produce
    identical points."""
    cfg = EngineConfig(extract_concurrency=(1, 2))
    a = extract_points(read_token_table(t1_dir), default_rules(), cfg,
                       use_actors=True).to_pandas()
    b = extract_points(read_token_table(t1_dir), default_rules(), cfg,
                       use_actors=False).to_pandas()
    key = ["series_key", "metric_type", "ts_ms", "tiebreak", "value"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
