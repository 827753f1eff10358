"""Flagship token-rollup DuckDB oracle (the driver's correctness gate,
pinned in pytest): extraction + tiered rollup + gap-fill/cumulative/rate
recomputed in SQL over the detokenized side table must match the engine
frame exactly (rows, schema, values; NaN-aware)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def token_dir_with_text(tmp_path_factory):
    from logtrics_ray.synth import write_token_table
    d = tmp_path_factory.mktemp("tok_oracle")
    return write_token_table(str(d / "tok"), 1500, n_shards=4, with_text=True)


@pytest.fixture(scope="module")
def tiers(token_dir_with_text):
    from logtrics_ray.config import EngineConfig
    from logtrics_ray.pipelines.rollup_pipeline import (build_core_tiers,
                                                        read_token_table)
    from logtrics_ray.rules import default_rules
    from logtrics_ray.stages.extract import extract_points
    cfg = EngineConfig()
    pts = extract_points(read_token_table(token_dir_with_text),
                         default_rules(), cfg)
    return build_core_tiers(pts, cfg), cfg


@pytest.mark.parametrize("tier", ["1h", "1d"])
def test_token_tier_matches_duckdb(token_dir_with_text, tiers, tier):
    import duckdb
    import __ray_entry__ as E
    from logtrics_ray.config import TIERS
    from logtrics_ray.pipelines.table_rollup import tier_oracle_frame
    from logtrics_ray.stages.seriesscan import finalize_tier
    core, cfg = tiers
    got = tier_oracle_frame(
        finalize_tier(core[tier], TIERS[tier], cfg)).to_pandas()
    exp = duckdb.sql(E._token_tier_sql(TIERS[tier], token_dir_with_text)).df()
    assert sorted(got.columns) == sorted(exp.columns)
    assert len(got) == len(exp)
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    e = exp[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        gv, ev = g[c].to_numpy(), e[c].to_numpy()
        try:
            gv = gv.astype(np.float64)
            ev = ev.astype(np.float64)
            same = (gv == ev) | (np.isnan(gv) & np.isnan(ev))
        except (TypeError, ValueError):
            same = g[c].astype(str).to_numpy() == e[c].astype(str).to_numpy()
        assert same.all(), f"{tier}/{c}: {int((~same).sum())} diffs"
    # the oracle exercised real data: every metric type + real gaps
    assert set(got["metric_type"]) == {"gauge", "counter", "meter", "timer"}
    if tier == "1h":
        assert got["gap_filled"].any()


def test_log_lines_source_matches_token_extraction(token_dir_with_text, tmp_path):
    """The *.log file source (console-reader analog) yields line rows that
    extract to the SAME per-series point counts as the token pipeline on
    the same corpus (text_column path == detokenize path)."""
    from collections import Counter
    from logtrics_ray.config import EngineConfig
    from logtrics_ray.pipelines.rollup_pipeline import read_token_table
    from logtrics_ray.rules import default_rules
    from logtrics_ray.sources.text import (read_log_lines,
                                           write_log_lines_fixture)
    from logtrics_ray.stages.extract import extract_points
    logs = write_log_lines_fixture(os.path.join(token_dir_with_text, "text"),
                                   str(tmp_path / "logs"))
    lines = read_log_lines(logs)
    assert lines.count() == read_token_table(token_dir_with_text).count()
    cfg = EngineConfig()
    from_lines = extract_points(lines, default_rules(), cfg,
                                text_column="text").to_pandas()
    from_tokens = extract_points(read_token_table(token_dir_with_text),
                                 default_rules(), cfg).to_pandas()
    # counts match per (series, metric_type) except the _source-templated
    # timer series (source differs: shard file vs corpus source column)
    def keyed(df):
        c = Counter()
        for sk, mt in zip(df["series_key"], df["metric_type"]):
            c[(sk if not sk.startswith("lt.latency.") else "lt.latency.*",
               mt)] += 1
        return c
    assert keyed(from_lines) == keyed(from_tokens)


def test_detok_text_matches_engine_detokenize(token_dir_with_text):
    """The side table's independently-assembled text == the engine's
    vectorized Arrow detokenize of the same shard."""
    import pyarrow.parquet as pq
    from logtrics_ray import vocab as V
    tok = pq.read_table(os.path.join(token_dir_with_text, "part-00000.parquet"))
    side = pq.read_table(os.path.join(token_dir_with_text, "text",
                                      "part-00000.parquet"))
    eng = V.detokenize(tok["tokens"], V.vocab_as_arrow()).to_pylist()
    assert eng == side["text"].to_pylist()
    assert tok["doc_id"].to_pylist() == side["doc_id"].to_pylist()
