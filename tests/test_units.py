"""Pure unit tests: gorilla codec, t-digest, rules validation, vocab/synth
determinism, hashing — no Ray required."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from logtrics_ray import vocab as V
from logtrics_ray.config import EngineConfig
from logtrics_ray.hashing import hash64, hash64_array, salt_of, ts_for_doc_ids
from logtrics_ray.rules import default_rules, load_rules
from logtrics_ray.stages import gorilla
from logtrics_ray.state.tdigest import TDigest
from logtrics_ray.synth import synth_shard


# ------------------------------------------------------------------ gorilla

def test_gorilla_ts_roundtrip():
    rng = np.random.default_rng(7)
    for n in (0, 1, 2, 5, 1000):
        ts = np.cumsum(rng.integers(0, 10_000_000, size=n)) + 1767225600000
        assert np.array_equal(gorilla.decode_timestamps(gorilla.encode_timestamps(ts)), ts)


def test_gorilla_ts_regular_grid_compresses():
    ts = np.arange(0, 60_000 * 5000, 60_000, dtype=np.int64) + 1767225600000
    enc = gorilla.encode_timestamps(ts)
    # constant delta -> 1 bit per value after the header
    assert len(enc) < 5000 / 8 + 32
    assert np.array_equal(gorilla.decode_timestamps(enc), ts)


def test_gorilla_float_roundtrip():
    rng = np.random.default_rng(8)
    cases = [
        np.array([]), np.array([3.14]),
        rng.normal(size=1000),
        np.repeat(42.5, 500),
        np.array([1.0, np.nan, np.inf, -np.inf, 0.0, -0.0, 1e300, 5e-324]),
        np.cumsum(rng.normal(size=2000)),  # smooth series (XOR-friendly)
    ]
    for v in cases:
        dec = gorilla.decode_floats(gorilla.encode_floats(v))
        assert v.astype(np.float64).view(np.uint64).tolist() == dec.view(np.uint64).tolist()


def test_gorilla_constant_floats_compress():
    v = np.repeat(7.25, 4096)
    assert len(gorilla.encode_floats(v)) < 4096 / 8 + 16


def test_gorilla_bools_roundtrip():
    rng = np.random.default_rng(9)
    for n in (0, 1, 7, 8, 9, 1000):
        m = rng.random(n) < 0.3
        assert np.array_equal(gorilla.decode_bools(gorilla.encode_bools(m)), m)


# ------------------------------------------------------------------ tdigest

def test_tdigest_quantile_accuracy():
    rng = np.random.default_rng(10)
    v = rng.normal(100.0, 15.0, size=50_000)
    d = TDigest.from_values(v)
    for q in (0.5, 0.75, 0.95, 0.99, 0.999):
        exact = np.quantile(v, q)
        assert abs(d.quantile(q) - exact) < 1.0, (q, d.quantile(q), exact)


def test_tdigest_merge_order_independent():
    rng = np.random.default_rng(11)
    parts = [TDigest.from_values(rng.exponential(50, size=3000)) for _ in range(6)]
    a = TDigest.merge_all(parts)
    b = TDigest.merge_all(parts[::-1])
    assert np.array_equal(a.means, b.means) and np.array_equal(a.weights, b.weights)


def test_tdigest_serialization_roundtrip():
    d = TDigest.from_values(np.random.default_rng(12).normal(size=1000))
    d2 = TDigest.from_bytes(d.to_bytes())
    assert np.array_equal(d.means, d2.means) and np.array_equal(d.weights, d2.weights)


def test_tdigest_small_inputs():
    assert np.isnan(TDigest.from_values(np.array([])).quantile(0.5))
    assert TDigest.from_values(np.array([5.0])).quantile(0.99) == 5.0
    d = TDigest.from_values(np.array([1.0, 3.0]))
    assert 1.0 <= d.quantile(0.5) <= 3.0


def test_tdigest_merge_groups_vectorized_bit_identical():
    """The segment-vectorized group merge (the timer-window hot path in
    both rollup partial-merge variants) must be BIT-identical to the
    scalar ``merge_all().to_bytes()/.quantiles()`` loop it replaced —
    same serialized centroids, same quantile floats — across empty
    groups, single-part groups, heavy ties, and interleaved group ids."""
    from logtrics_ray.state.tdigest import merge_groups_vectorized
    rng = np.random.default_rng(42)
    qs = (0.5, 0.75, 0.95, 0.99, 0.999)
    for trial in range(25):
        n_groups = int(rng.integers(1, 8))
        mparts, wparts, gparts = [], [], []
        per_group: list = [[] for _ in range(n_groups)]
        for g in range(n_groups):
            if rng.random() < 0.15:
                continue
            for _ in range(int(rng.integers(1, 6))):
                k = int(rng.integers(1, 400))
                vals = np.round(rng.normal(0, 100, k), 2)
                if rng.random() < 0.3:
                    vals = np.repeat(vals[:max(1, k // 3)], 3)[:k]
                d = TDigest.from_values(vals)
                per_group[g].append(d)
                if d.means.size:
                    mparts.append(d.means)
                    wparts.append(d.weights)
                    gparts.append(g)
        ref = [TDigest.merge_all(per_group[g]) for g in range(n_groups)]
        sizes = np.fromiter((m.size for m in mparts), dtype=np.int64,
                            count=len(mparts))
        cg = (np.repeat(np.asarray(gparts, dtype=np.int64), sizes)
              if gparts else np.empty(0, np.int64))
        mf = np.concatenate(mparts) if mparts else np.empty(0)
        wf = np.concatenate(wparts) if wparts else np.empty(0)
        got_bytes, got_qs = merge_groups_vectorized(mf, wf, cg, n_groups, qs)
        for g in range(n_groups):
            assert got_bytes[g] == ref[g].to_bytes(), (trial, g)
            r = np.asarray(ref[g].quantiles(qs), dtype=float)
            same_nan = np.array_equal(np.isnan(r), np.isnan(got_qs[g]))
            assert same_nan and np.array_equal(
                r[~np.isnan(r)], got_qs[g][~np.isnan(got_qs[g])]), (trial, g)


# -------------------------------------------------------------------- rules

def test_rules_unknown_key_rejected():
    # strict merge ≙ /root/reference/logtrics.go:100-101
    with pytest.raises(ValueError, match="unknown keys"):
        load_rules([{"name": "x", "expression": "a", "bogus": 1,
                     "emit": [{"metric_type": "gauge", "series": "s", "value": 1}]}])


def test_rules_forbidden_keys_rejected_by_name():
    # ≙ /root/reference/logtrics.go:98-99 ("modification is not
    # supported"), incl. the reference's literal typo key "sctriptfile"
    base = {"name": "x", "expression": "a",
            "emit": [{"metric_type": "gauge", "series": "s", "value": 1}]}
    for k in ("sctriptfile", "scriptfile", "scriptdir", "mode", "tcp", "udp"):
        with pytest.raises(ValueError, match="modification is not supported"):
            load_rules([{**base, k: 1}])


def test_rules_per_rule_graphite_logging_overrides():
    base = {"name": "x", "expression": "a",
            "emit": [{"metric_type": "gauge", "series": "s", "value": 1}]}
    # interval (seconds, logtrics.go:125-129) -> per-rule window width
    (r,) = load_rules([{**base, "graphite": {"interval": 900, "host": "gh",
                                             "port": "2003", "debug": "true",
                                             "nonsense": 1}}])
    assert r.window_ms == 900_000
    # unknown graphite subkeys silently ignored (no default case in
    # updateGraphiteConfig); port coerced int, debug coerced bool
    assert r.graphite_conf == {"interval": 900, "host": "gh",
                               "port": 2003, "debug": True}
    (r2,) = load_rules([base])
    assert r2.window_ms is None and r2.graphite_conf == {}
    # logging: known subkeys pass, unknown FATAL (logtrics.go:152-155)
    (r3,) = load_rules([{**base, "logging": {"type": "console",
                                             "level": "debug"}}])
    assert dict(r3.logging_conf) == {"type": "console", "level": "debug"}
    with pytest.raises(ValueError, match="invalid logging config"):
        load_rules([{**base, "logging": {"level": "debug", "file": "/x"}}])
    with pytest.raises(ValueError, match="bad graphite.interval"):
        load_rules([{**base, "graphite": {"interval": 0}}])
    # rules stay hashable (they key the per-process extractor cache)
    hash(r); hash(r3)


def test_lua_rule_graphite_interval_flows_to_spec():
    from logtrics_ray.luacompat import load_lua_rules
    src = """
    logtrics {
        name = "w15",
        parser = { type = "re2", expression = "x=(?P<v>%d+)" },
        graphite = { interval = 900, host = "gh" },
        logging = { level = "debug" },
        handler = function(e) end,
    }
    """.replace("%d", "\\\\d")
    (r,) = load_lua_rules(src)
    assert r.window_ms == 900_000
    assert r.graphite_conf["host"] == "gh"
    assert dict(r.logging_conf) == {"level": "debug"}


def test_lua_rule_forbidden_keys_rejected():
    from logtrics_ray.luacompat import LuaError, load_lua_rules
    src = """
    logtrics {
        name = "bad",
        parser = { type = "re2", expression = "a" },
        mode = "tcp",
        handler = function(e) end,
    }
    """
    with pytest.raises(LuaError, match="modification is not supported"):
        load_lua_rules(src)


def test_rules_missing_name_expression():
    with pytest.raises(ValueError, match="missing required 'name'"):
        load_rules([{"expression": "a"}])
    with pytest.raises(ValueError, match="missing 'expression'"):
        load_rules([{"name": "x"}])


def test_rules_bad_regex_and_values():
    with pytest.raises(ValueError, match="bad regex"):
        load_rules([{"name": "x", "expression": "(", "emit": []}])
    with pytest.raises(ValueError, match="bad value expression"):
        load_rules([{"name": "x", "expression": "(?P<g>a)",
                     "emit": [{"metric_type": "gauge", "series": "s", "value": "exp(g)"}]}])
    with pytest.raises(ValueError, match="not a capture group"):
        load_rules([{"name": "x", "expression": "(?P<g>a)",
                     "emit": [{"metric_type": "gauge", "series": "s.{nope}", "value": 1}]}])
    with pytest.raises(ValueError, match="needs at least one emit"):
        load_rules([{"name": "x", "expression": "a", "emit": []}])


def test_rules_group_names_only_named():
    # unnamed groups are dropped ≙ /root/reference/parser.go:51-53
    (r,) = load_rules([{"name": "x", "expression": r"(?P<a>\d)(\w)(?P<b>.)",
                        "emit": [{"metric_type": "gauge", "series": "s", "value": 1}]}])
    assert r.group_names == ["a", "b"]


def test_metric_type_validated():
    with pytest.raises(ValueError, match="metric_type"):
        load_rules([{"name": "x", "expression": "a",
                     "emit": [{"metric_type": "histogram", "series": "s", "value": 1}]}])


# ---------------------------------------------------------- vocab and synth

def test_vocab_deterministic_and_detokenize():
    v1, v2 = V.build_vocab(), V.build_vocab()
    assert (v1 == v2).all()
    ids = [1, V.NAME_BASE + 3, 2, 3] + V.encode_number(417)
    text = "".join(v1[i] for i in ids)
    assert 'hello "' in text and "417" in text
    tok = pa.array([ids, [0, 5]], type=pa.list_(pa.int32()))
    out = V.detokenize(tok.combine_chunks() if hasattr(tok, "combine_chunks") else tok,
                       V.vocab_as_arrow(v1))
    assert out[0].as_py() == text
    assert out[1].as_py() == v1[0] + v1[5]


def test_synth_deterministic_and_invariant():
    a = synth_shard(3, 500, seed=42)
    b = synth_shard(3, 500, seed=42)
    assert a.equals(b)
    c = synth_shard(3, 500, seed=43)
    assert not a.equals(c)
    import pyarrow.compute as pc
    assert pc.all(pc.equal(pc.list_value_length(a["tokens"]),
                           a["n_tok"])).as_py()
    assert a["doc_id"][0].as_py() == "doc-000000001500"


def test_hashing_stable():
    assert hash64("doc-000000000000") == hash64("doc-000000000000")
    arr = hash64_array(["a", "b", "a"])
    assert arr[0] == arr[2] != arr[1]
    ts = ts_for_doc_ids(["x", "y"], 1000, 500)
    assert ((ts >= 1000) & (ts < 1500)).all()
    s = salt_of(np.array([17], dtype=np.uint64), 8)
    assert s[0] == 17 % 8


def test_default_rules_cover_all_metric_types():
    mts = {e.metric_type for r in default_rules() for e in r.emits}
    assert mts == {"counter", "gauge", "timer", "meter"}


# ---------------------------------------------------- training-data ops ----

def _docs_ds():
    """Small synthetic doc corpus with known near-dup clusters."""
    import pyarrow as pa
    import ray.data as rd
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest to hide from every hunter")
    alt = ("completely different text about distributed rollup engines and "
           "columnar arrow batches streaming through a ray data pipeline")
    docs = {
        0: base,
        1: base + " tonight",                       # near-dup of 0
        2: base.replace("green", "blue"),           # near-dup of 0
        3: alt,
        4: alt + " with backpressure",              # near-dup of 3
        5: "tiny doc",
        6: "unrelated words entirely: zebra quartz violin nebula marble",
    }
    t = pa.Table.from_arrays(
        [pa.array(list(docs), pa.int64()),
         pa.array([docs[k] for k in docs], pa.string())],
        names=["doc_id", "text"])
    return rd.from_arrow(t), docs


def test_hll_sketch_accuracy_and_merge():
    """HyperLogLog: estimate within 3x the theoretical standard error at
    several cardinalities; register-wise-max merge == single-pass build;
    byte round-trip exact."""
    import numpy as np
    from logtrics_ray.hashing import id_hash64_array
    from logtrics_ray.state.hll import HLL
    p = 12
    se = 1.04 / np.sqrt(1 << p)
    for n in (50, 1_000, 20_000, 200_000):
        h = id_hash64_array([f"user-{i}" for i in range(n)])
        est = HLL.from_hashes(h, p=p).estimate()
        assert abs(est - n) / n <= 3 * se + 0.01, (n, est)
    h = id_hash64_array([f"user-{i}" for i in range(30_000)])
    whole = HLL.from_hashes(h, p=p)
    parts = [HLL.from_hashes(h[i::7], p=p) for i in range(7)]
    merged = HLL.merge_all(parts)
    assert (merged.registers == whole.registers).all()   # merge == single pass
    rt = HLL.from_bytes(whole.to_bytes())
    assert rt.p == p and (rt.registers == whole.registers).all()
    # duplicates don't inflate the estimate
    dup = HLL.from_hashes(np.tile(h, 3), p=p)
    assert (dup.registers == whole.registers).all()


def test_hll_estimate_rows_bit_equal_and_matrix_parse():
    """The vectorized bucket-major merge path (registers_matrix +
    estimate_rows) is bit-equal to the scalar estimate across the
    linear-counting / raw branches, including an empty sketch."""
    import numpy as np
    import pyarrow as pa
    from logtrics_ray.state.hll import HLL
    rng = np.random.default_rng(5)
    sks = [HLL.from_hashes(rng.integers(0, 2**64, size=n, dtype=np.uint64))
           for n in (0, 3, 500, 40_000)]
    regs = np.stack([s.registers for s in sks])
    est = HLL.estimate_rows(regs, 12)
    assert (est == np.array([s.estimate() for s in sks])).all()
    col = pa.chunked_array([pa.array([s.to_bytes() for s in sks], pa.binary())])
    mat, p = HLL.registers_matrix(col)
    assert p == 12 and (mat == regs).all()


def test_hll_distinct_frame_matches_exact(t1_dir):
    """Windowed HLL distinct counts within the sketch tolerance of the
    exact two-stage distinct count on the events-like shape."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from logtrics_ray.pipelines.table_rollup import (distinct_count_frame,
                                                     hll_distinct_frame)
    rng = np.random.default_rng(17)
    n = 60_000
    t = pa.Table.from_arrays([
        pa.array(rng.integers(0, 6 * 3_600_000, size=n), pa.int64()),
        pa.array(rng.choice(["a", "b"], size=n), pa.string()),
        pa.array(rng.zipf(1.3, size=n).clip(0, 50_000).astype(np.int64), pa.int64()),
    ], names=["ts", "key", "member"])
    ds = rd.from_arrow(t)
    exact = distinct_count_frame(ds, "ts", "key", "member", 3_600_000) \
        .to_pandas().set_index(["series_key", "window_start"])["n_distinct"]
    approx = hll_distinct_frame(ds, "ts", "key", "member", 3_600_000) \
        .to_pandas().set_index(["series_key", "window_start"])["n_distinct_approx"]
    assert set(exact.index) == set(approx.index)
    rel = (approx.loc[exact.index] - exact).abs() / exact.clip(lower=1)
    assert rel.max() <= 0.08, rel.sort_values().tail()


def test_rules_dir_loading_and_duplicate_names(tmp_path):
    """S4 closure: --rules as a DIRECTORY of *.toml files, walked sorted,
    all rules concatenated (≙ /root/reference/app.go:96-111 scriptdir);
    duplicate names across files are fatal."""
    from logtrics_ray.rules import load_rules
    d = tmp_path / "rules"
    d.mkdir()
    (d / "b_team.toml").write_text('''
[[rule]]
name = "b-rule"
expression = 'bytes=(?P<b>\\\\d+)'
[[rule.emit]]
metric_type = "meter"
series = "b.{b}"
value = 1
''')
    (d / "a_team.toml").write_text('''
[[rule]]
name = "a-rule"
expression = 'status=(?P<s>\\\\d+)'
[[rule.emit]]
metric_type = "counter"
series = "a.{s}"
value = 1
''')
    rules = load_rules(str(d))
    assert [r.name for r in rules] == ["a-rule", "b-rule"]  # sorted file order
    (d / "c_dup.toml").write_text('''
[[rule]]
name = "a-rule"
expression = 'x=(?P<x>\\\\d+)'
[[rule.emit]]
metric_type = "counter"
series = "c.{x}"
value = 1
''')
    with pytest.raises(ValueError, match="duplicate rule name"):
        load_rules(str(d))
    with pytest.raises(ValueError, match="no \\*.toml"):
        load_rules(str(tmp_path))


def test_handler_rule_logger_and_error_attribution(caplog):
    """Handler UDFs get a script:[name]-tagged logger (≙ the reference's
    per-script log bindings, logtrics.go:162-173); handler errors are
    counted PER RULE (log-and-continue, script.go:58-61)."""
    import logging
    import pyarrow as pa
    from logtrics_ray.config import EngineConfig
    from logtrics_ray.rules import load_rules
    from logtrics_ray.stages.extract import RuleExtractor

    def ok_handler(event, log):
        log.info("saw n=%s", event["n"])
        return [("counter", "h.ok", 1.0)]

    def bad_handler(event):
        raise RuntimeError("boom")

    def fatal_handler(event, log):
        log.fatal("giving up on n=%s", event["n"])

    rules = load_rules([
        {"name": "ok-rule", "expression": r"n=(?P<n>\d+)", "handler": ok_handler},
        {"name": "bad-rule", "expression": r"n=(?P<n>\d+)", "handler": bad_handler},
        {"name": "fatal-rule", "expression": r"n=(?P<n>\d+)", "handler": fatal_handler},
    ])
    batch = pa.Table.from_arrays(
        [pa.array(["d1", "d2"]), pa.array(["x n=1 y", "x n=2 y"])],
        names=["doc_id", "text"])
    ex = RuleExtractor(rules, EngineConfig(), text_column="text")
    with caplog.at_level(logging.INFO, logger="logtrics.rule.ok-rule"):
        out = ex(batch)
    assert out.num_rows == 2                       # ok-rule emitted per row
    assert ex.rule_errors == {"ok-rule": 0, "bad-rule": 2, "fatal-rule": 2}
    assert any("script:[ok-rule] saw n=1" in r.message for r in caplog.records)


def test_ngram_jaccard_dedup_matches_bruteforce():
    from logtrics_ray.functions.dedup import (ngram_jaccard_dedup_survivors,
                                              ngram_set)
    ds, docs = _docs_ds()
    got = sorted(r["doc_id"] for r in
                 ngram_jaccard_dedup_survivors(ds, threshold=0.5).take_all())
    # brute-force keep-earliest over exact 3-gram Jaccard
    def jac(a, b):
        sa, sb = ngram_set(docs[a]), ngram_set(docs[b])
        u = len(sa | sb)
        return len(sa & sb) / u if u else 0.0
    expect = [b for b in docs
              if not any(a < b and jac(a, b) >= 0.5 for a in docs)]
    assert got == sorted(expect)
    assert 0 in got and 3 in got          # cluster heads survive
    assert 1 not in got and 2 not in got  # near-dups of 0 dropped


def test_timer_digest_frame_accuracy(t1_dir):
    """t-digest p50/p99 within 2% of exact quantiles per window."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from logtrics_ray.config import EngineConfig
    from logtrics_ray.pipelines.table_rollup import timer_digest_frame
    from logtrics_ray.stages.extract import POINTS_SCHEMA

    rng = np.random.default_rng(11)
    n = 20_000
    ts = rng.integers(0, 4 * 3_600_000, size=n)
    vals = rng.lognormal(0.0, 1.0, size=n)
    t = pa.Table.from_arrays([
        pa.array(["lat"] * n, pa.string()),
        pa.array(["timer"] * n, pa.string()),
        pa.array(ts, pa.int64()),
        pa.array(vals, pa.float64()),
        pa.array(np.arange(n, dtype=np.uint64), pa.uint64()),
    ], schema=POINTS_SCHEMA)
    got = timer_digest_frame(rd.from_arrow(t), 3_600_000, EngineConfig()) \
        .to_pandas().set_index("window_start").sort_index()
    df = pd.DataFrame({"w": (ts // 3_600_000) * 3_600_000, "v": vals})
    for w, seg in df.groupby("w"):
        exact50, exact99 = np.quantile(seg["v"], [0.5, 0.99])
        row = got.loc[w]
        assert row["n"] == len(seg)
        assert abs(row["p50"] - exact50) <= 0.02 * exact50 + 1e-9
        assert abs(row["p99"] - exact99) <= 0.02 * exact99 + 1e-9


def test_anchor_prefilter_is_sound_and_identical():
    """Literal-factoring prefilter: derived required chars, anchor ids,
    and bit-identical extractor output with the prefilter disabled."""
    import numpy as np
    from logtrics_ray import vocab as V
    from logtrics_ray.config import EngineConfig
    from logtrics_ray.rules import default_rules, load_rules
    from logtrics_ray.stages.extract import (RuleExtractor, build_anchor_ids,
                                             required_chars)
    from logtrics_ray.synth import synth_shard

    assert frozenset('"') in required_chars(r'hello "(?P<first>[a-zA-Z0-9]+)"')
    assert frozenset("=") in required_chars(r"latency_ms=(?P<ms>\d+)")
    assert required_chars(r"(?P<a>\d+)|x") is None  # top-level branch: nothing required
    # IGNORECASE (global flag or inline (?i)): literals expand to both
    # cases so case-insensitive rules are never over-pruned.
    assert frozenset("eE") in required_chars(r"(?i)ERROR (?P<x>\d+)")
    assert frozenset("eE") in required_chars(r"(?i:ERROR) (?P<x>\d+)")
    assert frozenset("=") in required_chars(r"(?i)x=(?P<v>\d+)")  # non-alpha unaffected
    # a rule with no unconditional literal disables the prefilter
    free = load_rules([{"name": "free", "expression": r"(?P<x>\w+)",
                        "emit": [{"metric_type": "counter", "series": "s",
                                  "value": 1}]}])
    assert build_anchor_ids(free, V.build_vocab()) is None

    batch = synth_shard(0, 1500, seed=42, row_offset=0)
    # token_plans=False: with plans active the prefilter is skipped
    # (the plans subsume it exactly); this test pins the TEXT path.
    ex = RuleExtractor(default_rules(), EngineConfig(token_plans=False))
    assert ex.anchor_table is not None
    with_f = ex(batch)
    ex.anchor_table = None
    without = ex(batch)
    assert with_f.equals(without)
    assert with_f.num_rows > 0

    # (?i) soundness: the text holds 'GET /api/...' — a case-insensitive
    # rule written in the OTHER case must still match with the prefilter
    # on (the sre tree stores original-case literals; regression for the
    # over-pruning bug).
    ci = load_rules([{"name": "ci-req", "expression": r"(?i)get /API/(?P<ep>[a-z]+)",
                      "emit": [{"metric_type": "counter", "series": "ci.{ep}",
                                "value": 1}]}])
    ex_ci = RuleExtractor(ci, EngineConfig())
    with_ci = ex_ci(batch)
    ex_ci.anchor_table = None
    without_ci = ex_ci(batch)
    assert with_ci.equals(without_ci)
    assert with_ci.num_rows > 0


def test_toml_rule_file_loading(tmp_path):
    """S4: rule-spec discovery from a TOML file ([[rule]] array), mirroring
    the reference's script-dir loading (/root/reference/app.go:96-111)."""
    from logtrics_ray.rules import load_rules
    f = tmp_path / "rules.toml"
    f.write_text('''
[[rule]]
name = "evt"
expression = 'evt=(?P<kind>[a-z]+) v=(?P<v>\\\\d+)'
[[rule.emit]]
metric_type = "gauge"
series = "t.{kind}"
value = "float(v)"
''')
    rules = load_rules(str(f))
    assert len(rules) == 1 and rules[0].name == "evt"
    assert rules[0].emits[0].series == "t.{kind}"
    assert rules[0].group_names == ["kind", "v"]


def test_console_style_text_extraction():
    """S1: the console-reader analog — literal in-memory lines through the
    extractor's text-column path (no token table), every rule fan-out."""
    import pyarrow as pa
    import ray.data as rd
    from logtrics_ray.config import EngineConfig
    from logtrics_ray.rules import default_rules
    from logtrics_ray.stages.extract import extract_points
    lines = [
        'x hello "alice7" y',            # gauge rule: len("alice7") = 6
        "latency_ms=250 GET /api/users", # timer + counter
        "nothing to see here",           # drop path
    ]
    t = pa.Table.from_arrays([
        pa.array([f"doc-{i}" for i in range(len(lines))]),
        pa.array(lines),
        pa.array(["console"] * len(lines)),
    ], names=["doc_id", "line", "source"])
    pts = extract_points(rd.from_arrow(t), default_rules(), EngineConfig(),
                         text_column="line").to_pandas()
    got = dict(zip(pts["series_key"], pts["value"]))
    assert got["lt.hello.alice7"] == 6.0
    assert got["lt.latency.console"] == 250.0
    assert got["lt.req.users"] == 1.0
    assert len(pts) == 3                # the no-match line emitted nothing


def test_gorilla_vectorized_encoder_matches_decode():
    """The numpy '11'-branch encoder emits the same FORMAT (decoder is
    branch-agnostic): round-trips bit-exactly on every shape, and the
    dispatching encode_floats stays exact at both path choices."""
    rng = np.random.default_rng(21)
    cases = [
        rng.normal(size=4096),                                   # vectorized
        np.where(rng.random(4096) < 0.7, np.nan, rng.normal(size=4096)),
        np.repeat(2.5, 4096),                                    # sequential
        np.array([1.0, np.nan, np.inf, -np.inf, 0.0, -0.0, 1e300, 5e-324] * 128),
    ]
    for v in cases:
        bits = v.astype(np.float64).view(np.uint64)
        enc = gorilla.encode_floats(v)
        assert gorilla.decode_floats(enc).view(np.uint64).tolist() == bits.tolist()
        encv = gorilla._encode_floats_vectorized(
            bits, np.bitwise_xor(bits[1:], bits[:-1]))
        assert gorilla.decode_floats(encv).view(np.uint64).tolist() == bits.tolist()


def test_malformed_token_ids_dropped_and_counted():
    """Rows with out-of-vocab token ids are dropped + counted (log-and-
    continue, /root/reference/script.go:58-61), never crash detokenize."""
    from logtrics_ray.config import EngineConfig
    from logtrics_ray.rules import default_rules
    from logtrics_ray.stages.extract import RuleExtractor
    good = synth_shard(0, 50, seed=42, row_offset=0)
    bad_tokens = pa.array([[1, 99_999_999, 2]], type=pa.list_(pa.int32()))
    bad = pa.Table.from_arrays(
        [pa.array(["doc-bad"]), bad_tokens, pa.array([3], pa.int32()),
         pa.array(["web"])], names=["doc_id", "tokens", "n_tok", "source"])
    both = pa.concat_tables([good, bad])
    ex = RuleExtractor(default_rules(), EngineConfig())
    out_both = ex(both)
    errs = ex.row_errors
    out_good = ex(good)
    assert errs == 1                      # the malformed row was counted
    assert out_both.equals(out_good)      # ...and contributed nothing


def test_hashing_rejects_nulls():
    """id_hash64_array reads raw Arrow buffers, so a null would silently
    hash as the empty string — every null id/series key would then share
    identical ts/bucket/tiebreak values. It must fail loudly instead,
    like the pre-vectorized blake2b path did on None."""
    from logtrics_ray.hashing import id_hash64_array, series_bucket_array
    with pytest.raises(ValueError, match="null"):
        id_hash64_array(pa.array(["a", None, "b"]))
    with pytest.raises(ValueError, match="null"):
        series_bucket_array(pa.array(["x", None]), 8)
    # non-null (including a REAL empty string) still hashes fine
    assert id_hash64_array(pa.array(["a", "", "b"])).shape == (3,)


def test_config_hash_semantic_fields_only():
    """The lineage hash covers SEMANTIC fields only: execution-strategy
    knobs (exchange shape, shuffle impl, token plans, concurrency) are
    bit-identical by construction, so flipping one must NOT orphan stored
    partitions or force incremental appends into a full recompute."""
    from logtrics_ray.config import SEMANTIC_CONFIG_FIELDS
    from logtrics_ray.state.manifest import config_hash
    import dataclasses
    rules = default_rules()
    base = EngineConfig()
    h0 = config_hash(base, rules)
    # execution-only knobs: hash unchanged
    for kw in (dict(exchange="direct"), dict(shuffle_impl="sort"),
               dict(token_plans=False), dict(extract_concurrency=(2, 4)),
               dict(batch_size=1024), dict(rollup_buckets=16),
               dict(exchange_partitions=13)):
        assert config_hash(base.with_(**kw), rules) == h0, kw
    # semantic knobs: hash changes
    for kw in (dict(salt_buckets=4), dict(gap_fill="linear"),
               dict(series_buckets=32), dict(block_len=128),
               dict(horizon_ms=123456789), dict(tiers=("1m", "1h"))):
        assert config_hash(base.with_(**kw), rules) != h0, kw
    # every EngineConfig field is consciously classified (new fields must
    # be added to SEMANTIC_CONFIG_FIELDS or the known-execution list here)
    execution_fields = {"exchange", "shuffle_impl", "token_plans",
                        "extract_concurrency", "batch_size",
                        "rollup_buckets", "exchange_partitions"}
    assert not execution_fields & set(SEMANTIC_CONFIG_FIELDS)
    all_fields = {f.name for f in dataclasses.fields(EngineConfig)}
    unclassified = all_fields - set(SEMANTIC_CONFIG_FIELDS) - execution_fields
    assert not unclassified, unclassified


def test_read_num_blocks_policy(tmp_path, monkeypatch):
    """Read-block planning is coarsen-only at every scale: ~1 block per
    granted CPU on bench-sized inputs (keeps Read->Map fused instead of
    round-tripping decoded tokens through the object store), >=1 MB of
    parquet per block on tiny inputs (never splits finer than natural
    planning), <=256 MB per block on huge inputs (bounded task heap)."""
    from logtrics_ray.pipelines.rollup_pipeline import _read_num_blocks

    sizes = {}

    def fake_getsize(p):
        return sizes[p]

    monkeypatch.setattr("os.path.getsize", fake_getsize)
    import logtrics_ray.pipelines.rollup_pipeline as RP
    monkeypatch.setattr(RP.os.path, "getsize", fake_getsize)

    def plan(total_bytes, n_files=32):
        per = total_bytes // n_files
        sizes.clear()
        sizes.update({f"f{i}": per for i in range(n_files)})
        return _read_num_blocks(list(sizes))

    # Ray is initialised by the session fixture with num_cpus=4
    cpus = 4
    # bench-sized: 2 GB -> one block per CPU (2GB/256MB = 8 > cpus wins)
    assert plan(2 << 30) == max(cpus, 8)
    # mid: 512 MB -> max(cpus, 2)
    assert plan(512 << 20) == max(cpus, 2)
    # tiny: 2 MB -> 1 MB/block clamp beats per-CPU splitting
    assert plan(2 << 20) == min(cpus, 2)
    # huge: 1 TB -> 256 MB cap dominates (4096 blocks), CPUs irrelevant
    assert plan(1 << 40) == (1 << 40) // (256 << 20)


def test_read_extract_operator_fusion(t1_dir):
    """Read->Map fusion is a pinned property of the flagship plan: the
    extraction map must fuse INTO the read operator (one
    ``ReadParquet->MapBatches`` operator in the executed plan), so the
    decoded ``tokens`` column — the fattest intermediate of the whole
    pipeline — never round-trips through the object store.  Fusion
    needs BOTH coarse read blocks (test_read_num_blocks_policy) and
    ``batch_size=None`` on the first map (an explicit batch_size keeps
    ReadParquet a separate operator); this pins the second condition."""
    from logtrics_ray.config import EngineConfig
    from logtrics_ray.pipelines.rollup_pipeline import read_token_table
    from logtrics_ray.rules import default_rules
    from logtrics_ray.stages.extract import extract_points

    pts = extract_points(read_token_table(t1_dir), default_rules(),
                         EngineConfig()).materialize()
    ops = [ln for ln in pts.stats().splitlines() if ln.startswith("Operator")]
    fused = [o for o in ops if "ReadParquet->MapBatches" in o]
    assert fused, f"extraction did not fuse with the read: {ops}"
