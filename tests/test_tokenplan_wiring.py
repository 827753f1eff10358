"""The extractor's token-plan path must be BIT- and ORDER-identical to
the text path (pc.extract_regex over detokenized rows) — same points
table, same row order, for the full fixture rule corpus and for
adversarial batches that force per-row fallback."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from logtrics_ray import vocab as V
from logtrics_ray.config import EngineConfig
from logtrics_ray.rules import default_rules, load_rules
from logtrics_ray.stages.extract import RuleExtractor


def _extract_all(paths, cfg, rules) -> pa.Table:
    ex = RuleExtractor(rules, cfg)
    tabs = [ex(pq.read_table(p)) for p in sorted(paths)]
    return pa.concat_tables(tabs)


def test_plan_path_bit_identical_on_fixture(t2_dir):
    import glob
    paths = glob.glob(f"{t2_dir}/part-*.parquet")
    rules = default_rules()
    on = _extract_all(paths, EngineConfig(token_plans=True), rules)
    off = _extract_all(paths, EngineConfig(token_plans=False), rules)
    assert on.num_rows == off.num_rows and on.num_rows > 0
    assert on.schema == off.schema
    assert on.equals(off)   # content AND order


def test_plan_path_used_on_fixture():
    ex = RuleExtractor(default_rules(), EngineConfig())
    assert ex.planset is not None and len(ex.planset.plans) == 6


def test_handler_rule_disables_plans():
    rules = load_rules([{
        "name": "h", "expression": r"bytes=(?P<b>\d+)",
        "handler": lambda ev: [("counter", "x", 1.0)],
    }])
    ex = RuleExtractor(rules, EngineConfig())
    assert ex.planset is None


def _mk_batch(rows: list[list[int]]) -> pa.Table:
    return pa.table({
        "doc_id": pa.array([f"d{i:06d}" for i in range(len(rows))]),
        "tokens": pa.array(rows, type=pa.list_(pa.int32())),
        "n_tok": pa.array([len(r) for r in rows], type=pa.int32()),
        "source": pa.array([f"s{i % 3}" for i in range(len(rows))]),
    })


def test_plan_path_adversarial_batches_identical():
    """Random interleavings of special/digit/name/filler ids, empty rows,
    rows matching several rules at once, multi-occurrence rows."""
    rng = np.random.default_rng(13)
    ids = np.array(list(range(8)) + list(range(50, 60)) + list(range(100, 108))
                   + list(range(140, 146)) + [200, 300, 40000], dtype=np.int64)
    rows = [list(rng.choice(ids, size=int(rng.integers(0, 14))))
            for _ in range(600)]
    rows += [[], [1, 100, 2, 3, 50, 51], [5, 50, 0, 5, 51], [4, 50, 51, 52],
             [4, 50, 51], [6, 140, 7, 141], [3, 50, 3, 51]]
    batch = _mk_batch(rows)
    rules = default_rules()
    on = RuleExtractor(rules, EngineConfig(token_plans=True))(batch)
    off = RuleExtractor(rules, EngineConfig(token_plans=False))(batch)
    assert on.equals(off)
    assert on.num_rows > 0


def test_plan_fallback_rows_exact():
    """A vocab-level danger situation forced through the REAL extractor:
    rows containing out-of-pattern pieces that still detokenize to
    matching text must be caught by the text fallback leg.

    Piece 1 (' hello "') ends with the hello-gauge anchor; a name piece
    directly after a '"' piece (id 2) makes text like '...\" alice0' that
    must NOT match, while [1, name, 2] must."""
    rows = [[1, 100, 2], [2, 100, 1], [1, 101, 2, 1, 102, 2], [1, 2],
            [1, 100], [100, 2, 1, 103, 2]]
    batch = _mk_batch(rows)
    rules = default_rules()
    on = RuleExtractor(rules, EngineConfig(token_plans=True))(batch)
    off = RuleExtractor(rules, EngineConfig(token_plans=False))(batch)
    assert on.equals(off)


def test_plan_path_counts_match_text(t1_dir):
    """points_out / rows_in stats agree between the two paths."""
    import glob
    paths = glob.glob(f"{t1_dir}/part-*.parquet")
    rules = default_rules()
    ex_on = RuleExtractor(rules, EngineConfig(token_plans=True))
    ex_off = RuleExtractor(rules, EngineConfig(token_plans=False))
    for p in sorted(paths):
        t = pq.read_table(p)
        ex_on(t)
        ex_off(t)
    assert ex_on.points_out == ex_off.points_out
    assert ex_on.rows_in == ex_off.rows_in
