"""Similarity search over an embedding column (list<float>).

Two paths:
  * brute-force cosine top-k — the exact baseline: the (small) query
    matrix is broadcast once via ``ray.put``; every batch does one
    float64 matmul against it (numpy), emitting per-batch LOCAL top-k
    candidates; a final tiny reduce merges them.  The full corpus is
    never materialized on the driver and the shuffle carries only
    (query_id, vec_id, score) rows.
  * IVF (inverted-file) — the scale path: k-means-lite centroids fitted
    on a deterministic sample, every vector assigned to its nearest
    centroid inside map_batches, queries probe only ``nprobe`` closest
    lists.  Approximate; recall measured against brute force in tests.

Embedding-cosine near-dedup reuses the brute-force kernel with a
threshold + keep-earliest rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _batch_matrix(t: pa.Table, col: str) -> np.ndarray:
    lists = t[col]
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.values.to_numpy(zero_copy_only=False).astype(np.float64)
    width = len(lists[0]) if len(lists) else 0
    return flat.reshape(len(lists), width)


def knn_bruteforce(ds, query_ids: list[int], k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding"):
    """Exact cosine top-k (self excluded).  Returns a pandas frame
    (query_id, neighbor_id, rank, score) — score rounded to 6dp."""
    q_rows = ds.map_batches(
        lambda t: t.filter(pa.compute.is_in(t[id_col],
                                            value_set=pa.array(query_ids))),
        batch_format="pyarrow").take_all()
    q_rows.sort(key=lambda r: r[id_col])
    qids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    qmat = _norm_rows(np.array([r[vec_col] for r in q_rows], dtype=np.float64))
    qref = ray.put((qids, qmat))

    def local_topk(t: pa.Table) -> pa.Table:
        qids_, qmat_ = ray.get(qref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        m = _norm_rows(_batch_matrix(t, vec_col))
        scores = qmat_ @ m.T  # (nq, batch)
        nq = qids_.size
        take = min(k + 1, ids.size)  # +1: self may be in batch
        out_q, out_id, out_s = [], [], []
        for qi in range(nq):
            s = scores[qi]
            idx = np.argpartition(-s, take - 1)[:take]
            out_q.append(np.full(take, qids_[qi], dtype=np.int64))
            out_id.append(ids[idx])
            out_s.append(s[idx])
        return pa.Table.from_arrays(
            [pa.array(np.concatenate(out_q), pa.int64()),
             pa.array(np.concatenate(out_id), pa.int64()),
             pa.array(np.concatenate(out_s), pa.float64())],
            names=["query_id", "neighbor_id", "score"])

    cand = ds.map_batches(local_topk, batch_format="pyarrow")
    df = cand.to_pandas()  # tiny: nq * (k+1) per batch
    df = df[df.query_id != df.neighbor_id]
    df = df.sort_values(["query_id", "score", "neighbor_id"],
                        ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df["score"] = df["score"].round(6)
    return df[["query_id", "neighbor_id", "rank", "score"]]


class IVFIndexer:
    """Actor-pool callable: assign each vector to its nearest centroid."""

    def __init__(self, centroids_ref, vec_col: str, id_col: str):
        self.centroids = _norm_rows(ray.get(centroids_ref))
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _norm_rows(_batch_matrix(t, self.vec_col))
        assign = (m @ self.centroids.T).argmax(axis=1).astype(np.int64)
        return t.append_column("ivf_list", pa.array(assign, pa.int64()))


def fit_centroids(ds, n_centroids: int, vec_col: str = "embedding",
                  sample: int = 2048, iters: int = 5, seed: int = 13) -> np.ndarray:
    """Deterministic k-means-lite on a driver-side sample (spherical)."""
    rows = ds.limit(sample).take_all()
    m = _norm_rows(np.array([r[vec_col] for r in rows], dtype=np.float64))
    rng = np.random.default_rng(seed)
    c = m[rng.choice(m.shape[0], size=min(n_centroids, m.shape[0]), replace=False)]
    for _ in range(iters):
        assign = (m @ c.T).argmax(axis=1)
        for j in range(c.shape[0]):
            sel = m[assign == j]
            if len(sel):
                c[j] = sel.mean(axis=0)
        c = _norm_rows(c)
    return c


def knn_ivf(ds, query_ids: list[int], k: int = 5, n_centroids: int = 16,
            nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Approximate top-k: probe only the nprobe nearest inverted lists."""
    cents = fit_centroids(ds, n_centroids, vec_col)
    cref = ray.put(cents)
    indexed = ds.map_batches(IVFIndexer,
                             fn_constructor_kwargs=dict(centroids_ref=cref,
                                                        vec_col=vec_col, id_col=id_col),
                             batch_format="pyarrow", concurrency=2)
    q_rows = ds.map_batches(
        lambda t: t.filter(pa.compute.is_in(t[id_col],
                                            value_set=pa.array(query_ids))),
        batch_format="pyarrow").take_all()
    q_rows.sort(key=lambda r: r[id_col])
    qmat = _norm_rows(np.array([r[vec_col] for r in q_rows], dtype=np.float64))
    probe_lists = np.argsort(-(qmat @ _norm_rows(cents).T), axis=1)[:, :nprobe]
    wanted = sorted({int(x) for row in probe_lists for x in row})
    sub = indexed.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["ivf_list"],
                                            value_set=pa.array(wanted, pa.int64()))),
        batch_format="pyarrow")
    return knn_bruteforce(sub, query_ids, k=k, id_col=id_col, vec_col=vec_col)


def embedding_dedup_survivors(ds, threshold: float = 0.98,
                              id_col: str = "vec_id", vec_col: str = "embedding"):
    """Near-dup rule: drop v iff ∃ u < v with cosine(u, v) >= threshold.
    Pairwise over hash-bucketed blocks (all-pairs across block pairs is
    avoided by comparing against a broadcast of block minima... for the
    bounded embeddings table we broadcast the normalized corpus matrix —
    documented O(n²/P) block kernel; the LSH path for true scale is
    minhash/simhash in dedup.py)."""
    rows = ds.select_columns([id_col, vec_col]).take_all()
    rows.sort(key=lambda r: r[id_col])
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    m = _norm_rows(np.array([r[vec_col] for r in rows], dtype=np.float64))
    ref = ray.put((ids, m))
    import ray.data as rd

    n = ids.size
    chunk = max(256, n // 32)
    starts = list(range(0, n, chunk))

    @ray.remote
    def block(start: int) -> list[int]:
        ids_, m_ = ray.get(ref)
        end = min(start + chunk, ids_.size)
        s = m_[start:end] @ m_.T  # (chunk, n)
        dropped = []
        for i in range(end - start):
            gi = start + i
            sim = s[i]
            mask = (ids_ < ids_[gi]) & (sim >= threshold)
            if mask.any():
                dropped.append(int(ids_[gi]))
        return dropped

    dropped = set()
    for part in ray.get([block.remote(s) for s in starts]):
        dropped.update(part)
    keep = [int(i) for i in ids if int(i) not in dropped]
    return pd.DataFrame({id_col: keep})
