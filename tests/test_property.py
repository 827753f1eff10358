"""Property-based conformance (SURVEY.md §5.1 item 5): random small
points tables -> distributed engine == single-process oracle bit-for-bit,
for every metric type, at 1m and via cascade at 1h.

The generator feeds the points table directly (bypassing extraction) so
hypothesis explores aggregation edge cases the fixture corpus doesn't:
negative values, duplicate timestamps, single-point windows, all-points-
in-one-salt, multi-type same-key series.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import ray.data as rd

from logtrics_ray.config import TIERS, EngineConfig
from logtrics_ray.stages.extract import POINTS_SCHEMA
from logtrics_ray.stages.cascade import cascade
from logtrics_ray.stages.rollup import rollup_base
from logtrics_ray.stages.seriesscan import finalize_tier
from tests.oracle import oracle_cascade, oracle_core_rollup, oracle_finalize
from tests.util import assert_tier_matches_oracle

HOUR_MS = 3_600_000

point_st = st.tuples(
    st.sampled_from(["s.a", "s.b", "hot"]),                       # series_key
    st.sampled_from(["counter", "gauge", "meter", "timer"]),      # metric_type
    st.integers(min_value=0, max_value=3 * HOUR_MS - 1),          # ts_ms
    st.floats(min_value=-1e6, max_value=1e6,
              allow_nan=False, allow_infinity=False),             # value
)


def _points_table(pts: list[tuple]) -> pa.Table:
    n = len(pts)
    return pa.Table.from_arrays([
        pa.array([p[0] for p in pts], pa.string()),
        pa.array([p[1] for p in pts], pa.string()),
        pa.array([p[2] for p in pts], pa.int64()),
        pa.array([p[3] for p in pts], pa.float64()),
        pa.array(np.arange(n, dtype=np.uint64), pa.uint64()),     # unique tiebreak
    ], schema=POINTS_SCHEMA)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(point_st, min_size=1, max_size=120))
def test_engine_equals_oracle_on_random_points(pts):
    cfg = EngineConfig()
    t = _points_table(pts)
    opts = [(r["series_key"], r["metric_type"], r["ts_ms"], r["value"], r["tiebreak"])
            for r in t.to_pylist()]

    core_1m = rollup_base(rd.from_arrow(t), TIERS["1m"], cfg)
    ocore_1m = oracle_core_rollup(opts, TIERS["1m"], cfg)
    df_1m = finalize_tier(core_1m, TIERS["1m"], cfg).to_pandas()
    assert_tier_matches_oracle(df_1m, oracle_finalize(ocore_1m, TIERS["1m"], cfg),
                               msg="random-points 1m")

    df_1h = finalize_tier(cascade(core_1m, TIERS["1h"]), TIERS["1h"], cfg).to_pandas()
    assert_tier_matches_oracle(
        df_1h, oracle_finalize(oracle_cascade(ocore_1m, TIERS["1h"]), TIERS["1h"], cfg),
        msg="random-points 1h cascade")


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=50),
       st.integers(min_value=0, max_value=30))
def test_id_hash_batch_invariance_property(strings, split):
    """id_hash64_array is invariant to batching: hashing any slice /
    permutation / padding-width context yields the scalar value."""
    from logtrics_ray.hashing import id_hash64, id_hash64_array
    batch = id_hash64_array(strings)
    assert [int(x) for x in batch] == [id_hash64(s) for s in strings]
    k = split % len(strings)
    left, right = strings[:k], strings[k:]
    parts = list(id_hash64_array(left)) + list(id_hash64_array(right))
    assert parts == list(batch)
    rev = id_hash64_array(list(reversed(strings)))
    assert list(rev) == list(reversed(batch))


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(point_st, min_size=1, max_size=150))
def test_salted_partial_route_equals_direct_property(pts):
    """The salted two-phase exchange kernels (per-(bucket, salt) partials
    -> salt-ordered bucket merge) are bit-identical to the direct bucket
    kernel on arbitrary point sets — the invariant the fused pipeline's
    exchange modes rely on."""
    import pyarrow.compute as pc
    from logtrics_ray.stages.rollup import (_bucket_rollup_fn, assign_windows,
                                            bucket_partials_table,
                                            merge_bucket_partials_fn)
    cfg = EngineConfig()
    t = _points_table(pts)
    w = t["ts_ms"].to_numpy() // TIERS["1m"] * TIERS["1m"]
    salt = (t["tiebreak"].to_numpy() % np.uint64(cfg.salt_buckets)).astype(np.int64)
    t = (t.append_column("window_start", pa.array(w, pa.int64()))
          .append_column("salt", pa.array(salt, pa.int64())))
    direct = _bucket_rollup_fn(t).to_pandas()
    slices = [bucket_partials_table(t.filter(pc.equal(t["salt"], s)))
              for s in range(cfg.salt_buckets)
              if t.filter(pc.equal(t["salt"], s)).num_rows]
    merged = merge_bucket_partials_fn(pa.concat_tables(slices)).to_pandas()
    key = ["series_key", "metric_type", "window_start"]
    a = direct.sort_values(key).reset_index(drop=True)
    b = merged.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype == object:
            assert all((x is None and y is None) or x == y
                       for x, y in zip(av, bv)), c
        else:
            same = (av == bv) | (av != av) & (bv != bv)   # NaN-aware
            assert same.all(), c


@settings(max_examples=60, deadline=None)
@given(st.lists(st.one_of(
    st.floats(allow_nan=True, allow_infinity=True, width=64),
    st.sampled_from([0.0, -0.0, 1.5, 1.5, 1.5])),   # repeats -> zero-xor runs
    min_size=0, max_size=700))
def test_gorilla_floats_roundtrip_property(vals):
    import numpy as np
    from logtrics_ray.stages import gorilla
    v = np.array(vals, dtype=np.float64)
    bits = v.view(np.uint64)
    enc = gorilla.encode_floats(v)
    assert gorilla.decode_floats(enc).view(np.uint64).tolist() == bits.tolist()
    if v.size >= 2:
        encv = gorilla._encode_floats_vectorized(
            bits, np.bitwise_xor(bits[1:], bits[:-1]))
        assert gorilla.decode_floats(encv).view(np.uint64).tolist() == bits.tolist()


# ---- vectorized n-gram kernel == scalar ngram_set reference ------------

_text_st = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("Lu", "Ll", "Nd", "Po", "Zs", "Cc", "So")),
    max_size=120)


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(texts=st.lists(_text_st, max_size=12),
       n=st.integers(min_value=1, max_value=9))
def test_gram_kernel_equals_ngram_set_property(texts, n):
    """The batch-vectorized gram kernel must equal the scalar
    ``ngram_set`` reference for ARBITRARY unicode inputs (random case,
    punctuation, control/whitespace chars, symbols, empty docs) — the
    invariant the n-gram Jaccard / decontamination oracle replay rests
    on.  Hypothesis explores the split-boundary space the fixture corpus
    can't."""
    from logtrics_ray.functions.dedup import (gram_hash_flat, ngram_set,
                                              unique_grams_per_doc)
    from logtrics_ray.hashing import hash64_array

    ref = [np.unique(hash64_array(sorted(ngram_set(s, n))))
           if s.strip() else np.empty(0, np.uint64) for s in texts]
    h, g_doc, n_docs = gram_hash_flat(pa.array(texts, pa.string()), n)
    uh, cnt = unique_grams_per_doc(h, g_doc, n_docs)
    off = np.concatenate([[0], np.cumsum(cnt)]).astype(np.int64)
    assert n_docs == len(texts)
    for i, r in enumerate(ref):
        got = uh[off[i]:off[i + 1]]
        assert np.array_equal(got, r), (
            i, texts[i].encode("utf-8", "surrogatepass"), r, got, n,
            [t.encode("utf-8", "surrogatepass") for t in texts])


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1,
                max_size=60))
def test_hash_split_label_rule_property(ids):
    """The vectorized searchsorted label assignment == the scalar CASE
    rule the SQL oracle runs, and int ids == their decimal-text ids."""
    from logtrics_ray.functions.packing import _sample_key, split_thresholds
    thr = split_thresholds()
    bounds = np.array([b for _, b in thr], dtype=np.int64)
    names = np.array([n for n, _ in thr] + ["train"], dtype=object)
    k_int = _sample_key(pa.array(ids, pa.int64()))
    k_str = _sample_key(pa.array([str(i) for i in ids], pa.string()))
    assert np.array_equal(k_int, k_str)
    got = names[np.searchsorted(bounds, k_int, side="right")]
    for key, lab in zip(k_int, got):
        exp = next((n for n, b in thr if key < b), "train")
        assert lab == exp


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=2**31))
def test_pq_encode_is_argmin_property(seed):
    """Every chosen code's subspace distance is <= every alternative's,
    and equals the first index achieving the minimum (the cid-asc
    tiebreak the SQL replay uses)."""
    from logtrics_ray.functions.similarity import _pq_codebooks, _pq_encode
    rng = np.random.default_rng(seed)
    sample = rng.normal(size=(24, 8))
    books = _pq_codebooks(sample, m_subs=2, kc=4, iters=2)
    x = rng.normal(size=(10, 8))
    codes = _pq_encode(x, books)
    n_subs, _, sub_dim = books.shape
    for s in range(n_subs):
        xs = x[:, s * sub_dim:(s + 1) * sub_dim]
        d2 = ((xs[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        assert np.array_equal(codes[:, s], d2.argmin(axis=1))
        assert (d2[np.arange(10), codes[:, s]] <= d2.min(axis=1)).all()
