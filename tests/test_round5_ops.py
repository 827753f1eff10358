"""Round-5 operators: PQ-ANN, deterministic hash split, per-source
token quotas."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd


# ------------------------------------------------------------------ PQ --

def _pq_corpus(n=512, dim=16, seed=11):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(6, dim))
    vecs = np.concatenate(
        [c + 0.15 * rng.normal(size=(n // 6 + 1, dim)) for c in centers])[:n]
    t = pa.Table.from_arrays(
        [pa.array(np.arange(n), pa.int64()),
         pa.array(list(vecs.astype(np.float32)), pa.list_(pa.float32()))],
        names=["vec_id", "embedding"])
    return t, vecs


def test_knn_pq_finds_the_right_cluster():
    """PQ collapses within-cluster distances by design (equal codes ->
    equal distances), so exact-top-5 overlap is the wrong bar; the PQ
    guarantee is that neighbors come from the query's true cluster."""
    from logtrics_ray.functions.similarity import knn_pq
    t, _ = _pq_corpus()
    ds = rd.from_arrow(t)
    q = [0, 200, 400]
    per = 512 // 6 + 1                       # corpus is blocks of one cluster
    approx = knn_pq(ds, q, k=5, m_subs=8, kc=16)
    assert len(approx) == len(q) * 5
    hits = sum(int(nid // per == qid // per)
               for qid, nid in zip(approx["query_id"], approx["neighbor_id"]))
    assert hits / len(approx) >= 0.9


def test_knn_pq_deterministic_across_block_layout():
    from logtrics_ray.functions.similarity import knn_pq
    t, _ = _pq_corpus()
    a = knn_pq(rd.from_arrow(t), [3, 7], k=4, m_subs=4)
    b = knn_pq(rd.from_arrow(t).repartition(7), [3, 7], k=4, m_subs=4)
    assert a.values.tolist() == b.values.tolist()


def test_pq_codebook_side_table_matches_distributed_fit(tmp_path):
    from logtrics_ray.functions.similarity import (fit_pq,
                                                   write_pq_codebook_side_table)
    t, _ = _pq_corpus()
    p = tmp_path / "emb.parquet"
    pq.write_table(t, str(p))
    books = fit_pq(rd.from_arrow(t), m_subs=4, kc=8)
    side = write_pq_codebook_side_table(str(p), str(tmp_path / "cb.parquet"),
                                        m_subs=4, kc=8)
    st = pq.read_table(side)
    n_subs, kc_eff, sub_dim = books.shape
    assert st.num_rows == n_subs * kc_eff * sub_dim
    flat = st.sort_by([("sub", "ascending"), ("cid", "ascending"),
                       ("comp", "ascending")])["val"].to_numpy()
    assert np.array_equal(flat, books.reshape(-1))


def test_pq_dim_must_divide():
    from logtrics_ray.functions.similarity import _pq_codebooks
    with pytest.raises(ValueError, match="not divisible"):
        _pq_codebooks(np.zeros((10, 10)), m_subs=4, kc=4, iters=1)


# ---------------------------------------------------------- hash split --

def _doc_table(tmp_path, n=3000):
    rng = np.random.default_rng(5)
    t = pa.table({
        "doc_id": pa.array([f"doc-{i:06d}" for i in range(n)], pa.string()),
        "source": pa.array([("web", "code", "wiki")[i % 3]
                            for i in range(n)], pa.string()),
        "n_chars": pa.array(rng.integers(10, 500, n), pa.int64()),
    })
    p = tmp_path / "documents.parquet"
    pq.write_table(t, str(p))
    return str(p), t


def test_hash_split_partitions_every_doc_exactly_once(tmp_path):
    from logtrics_ray.functions.packing import hash_split_frame
    p, t = _doc_table(tmp_path)
    df = hash_split_frame(p).to_pandas()
    assert int(df["n_docs"].sum()) == t.num_rows
    assert int(df["n_chars"].sum()) == int(
        pa.compute.sum(t["n_chars"]).as_py())
    assert set(df["split"]) <= {"train", "val", "test"}
    # fractions roughly honor the thresholds (2% / 5% / 93%)
    frac = df.groupby("split")["n_docs"].sum() / t.num_rows
    assert frac.get("train", 0) > 0.85
    assert 0 < frac.get("test", 0) < 0.06


def test_hash_split_is_a_property_of_the_doc(tmp_path):
    """Same docs, different sharding -> identical per-group totals."""
    from logtrics_ray.functions.packing import hash_split_frame
    p, t = _doc_table(tmp_path)
    d2 = tmp_path / "resharded"
    d2.mkdir()
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), str(d2 / "a.parquet"))
    pq.write_table(t.slice(half), str(d2 / "b.parquet"))
    a = hash_split_frame(p).to_pandas() \
        .sort_values(["source", "split"]).reset_index(drop=True)
    b = hash_split_frame(str(d2)).to_pandas() \
        .sort_values(["source", "split"]).reset_index(drop=True)
    assert a.values.tolist() == b.values.tolist()


def test_hash_split_int_ids(tmp_path):
    """The documents table's int64 ids hash via their decimal text."""
    from logtrics_ray.functions.packing import _sample_key
    ints = pa.array([0, 1, 42, 10**12], pa.int64())
    strs = pa.array(["0", "1", "42", str(10**12)], pa.string())
    assert np.array_equal(_sample_key(ints), _sample_key(strs))


# -------------------------------------------------------- source quota --

def test_source_quota_invariants(t1_dir):
    from logtrics_ray.functions.packing import source_quota_frame
    B = 3_000
    df = source_quota_frame(t1_dir, B).to_pandas()
    assert len(df) > 0
    assert (df["kept_docs"] <= df["total_docs"]).all()
    assert (df["kept_tokens"] <= B).all()
    assert (df["kept_tokens"] <= df["total_tokens"]).all()
    # budget is binding at this size: nothing pathological like 0-keeps
    assert (df["kept_docs"] > 0).all()


def test_source_quota_greedy_prefix_matches_local_replay(t1_dir):
    """The kept set IS the (h, doc_id)-ordered greedy prefix: replay the
    rule locally over the whole table and compare every summary cell."""
    import glob

    from logtrics_ray.functions.packing import source_quota_frame
    from logtrics_ray.hashing import id_hash64_array
    B = 3_000
    tabs = [pq.read_table(p, columns=["doc_id", "n_tok", "source"])
            for p in sorted(glob.glob(f"{t1_dir}/*.parquet"))]
    t = pa.concat_tables(tabs).combine_chunks()
    h = id_hash64_array(t["doc_id"])
    doc = np.asarray(t["doc_id"].to_pylist(), dtype=object)
    n = t["n_tok"].to_numpy().astype(np.int64)
    src = np.asarray(t["source"].to_pylist(), dtype=object)
    exp = {}
    for s in np.unique(src):
        m = src == s
        order = np.lexsort((doc[m], h[m]))
        ns = n[m][order]
        cum = np.cumsum(ns)
        kept = cum <= B
        exp[str(s)] = (int(kept.sum()), int(ns[kept].sum()),
                       int(m.sum()), int(ns.sum()))
    df = source_quota_frame(t1_dir, B).to_pandas().set_index("source")
    for s, (kd, kt, td, tt) in exp.items():
        row = df.loc[s]
        assert (int(row["kept_docs"]), int(row["kept_tokens"]),
                int(row["total_docs"]), int(row["total_tokens"])) \
            == (kd, kt, td, tt)


def test_source_quota_budget_larger_than_corpus_keeps_all(t1_dir):
    from logtrics_ray.functions.packing import source_quota_frame
    df = source_quota_frame(t1_dir, 10**12).to_pandas()
    assert (df["kept_docs"] == df["total_docs"]).all()
    assert (df["kept_tokens"] == df["total_tokens"]).all()


def test_pass0_groupby_fallback_matches_driver_combine(t1_dir, monkeypatch):
    """Past the pull budget the distributed groupby path must produce
    the identical totals vector / quota summary."""
    import logtrics_ray.functions.packing as P
    fast = P._bucket_token_totals(t1_dir, P.FINE_BITS)
    quota_fast = P.source_quota_frame(t1_dir, 3_000).to_pandas() \
        .sort_values("source").reset_index(drop=True)
    monkeypatch.setattr(P, "PASS0_LOCAL_ROW_BUDGET", 0)
    slow = P._bucket_token_totals(t1_dir, P.FINE_BITS)
    quota_slow = P.source_quota_frame(t1_dir, 3_000).to_pandas() \
        .sort_values("source").reset_index(drop=True)
    assert np.array_equal(fast, slow)
    assert quota_fast.values.tolist() == quota_slow.values.tolist()
