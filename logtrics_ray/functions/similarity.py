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


# Per-process hyperplane cache: the LSH planes are a pure function of
# (dim, n_planes, seed) — regenerate once per worker process, not per batch.
_PLANES_CACHE: dict = {}


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    key = (dim, n_planes, seed)
    p = _PLANES_CACHE.get(key)
    if p is None:
        p = _PLANES_CACHE[key] = np.random.default_rng(seed).normal(
            size=(dim, n_planes))
    return p


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

    def merge_query(g: pa.Table) -> pa.Table:
        # distributed per-query merge: only nq*k winner rows ever reach
        # the driver (candidates grow with batch count at scale)
        g = g.combine_chunks()
        qid = int(g["query_id"][0].as_py())
        ids = g["neighbor_id"].to_numpy(zero_copy_only=False)
        sc = g["score"].to_numpy(zero_copy_only=False)
        keep = ids != qid
        ids, sc = ids[keep], sc[keep]
        order = np.lexsort((ids, -sc))[:k]
        n = order.size
        return pa.Table.from_arrays([
            pa.array(np.full(n, qid, dtype=np.int64), pa.int64()),
            pa.array(ids[order], pa.int64()),
            pa.array(np.arange(1, n + 1, dtype=np.int64), pa.int64()),
            pa.array(np.round(sc[order], 6), pa.float64()),
        ], names=["query_id", "neighbor_id", "rank", "score"])

    df = (cand.groupby("query_id")
          .map_groups(merge_query, batch_format="pyarrow").to_pandas())
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


class IVFIndexer:
    """Actor-pool callable: assign each vector to its nearest centroid."""

    def __init__(self, centroids_ref, vec_col: str, id_col: str):
        self.centroids = _norm_rows(ray.get(centroids_ref))
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _norm_rows(_batch_matrix(t, self.vec_col))
        assign = (m @ self.centroids.T).argmax(axis=1).astype(np.int64)
        return t.append_column("ivf_list", pa.array(assign, pa.int64()))


def _hash_spread_mask(ids: np.ndarray, n_total: int, sample: int) -> np.ndarray:
    """Keep-mask for the deterministic corpus sample: a row is sampled iff
    its id times a golden-ratio multiplier falls under a count-scaled
    threshold (~2x sample expected hits).  Pure function of (ids, n_total,
    sample) — shared by the distributed fit and the oracle replay."""
    frac = min(1.0, (2.0 * sample) / max(n_total, 1))
    # float(2**64) rounds up; clamp so the threshold stays a valid uint64
    thresh = np.uint64(min(2**64 - 1, int(frac * 2.0**64)))
    K = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        return (ids.astype(np.uint64) * K) < thresh


def _finalize_sample(ids: np.ndarray, m: np.ndarray, sample: int) -> np.ndarray:
    """Canonical sample matrix from hash-picked rows: sort by id (so the
    result is independent of Ray block arrival order), truncate to
    ``sample``, normalize.  Shared by fit_centroids and the oracle."""
    order = np.argsort(ids, kind="stable")[:sample]
    return _norm_rows(m[order])


def fit_centroids(ds, n_centroids: int, vec_col: str = "embedding",
                  sample: int = 2048, iters: int = 5, seed: int = 13,
                  id_col: str = "vec_id") -> np.ndarray:
    """Deterministic k-means-lite on a driver-side sample (spherical).

    The sample is HASH-SPREAD over the whole corpus (keep rows whose
    id-hash falls under count-scaled threshold), not the first rows —
    a head sample is arbitrarily biased when the input is ordered or
    partitioned by content.  The picked rows (~2x sample expected, so the
    driver pull stays bounded) are sorted by id before truncation, so the
    centroids are a pure function of the corpus — independent of block
    count and arrival order, replayable by the DuckDB oracle writer."""
    import pyarrow as pa
    n_total = max(ds.count(), 1)          # parquet metadata — no scan

    def pick(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(_hash_spread_mask(ids, n_total, sample)))

    rows = ds.map_batches(pick, batch_format="pyarrow").take_all()
    if not rows:                           # tiny inputs: fall back to head
        rows = ds.limit(sample).take_all()
    ids_a = np.array([r[id_col] for r in rows], dtype=np.int64)
    m = np.array([r[vec_col] for r in rows], dtype=np.float64)
    return _kmeans_lite(_finalize_sample(ids_a, m, sample),
                        n_centroids, iters, seed)


def _kmeans_lite(m: np.ndarray, n_centroids: int, iters: int,
                 seed: int) -> np.ndarray:
    """Spherical k-means-lite over a pre-normalized sample matrix —
    shared by the distributed fit and the oracle side-table writer so
    both produce identical centroids from the same sample."""
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
    from logtrics_ray.functions.dedup import process_cached
    cents = fit_centroids(ds, n_centroids, vec_col)
    cref = ray.put(cents)
    # content digest, not the ObjectRef, keys the per-process cache —
    # a re-run with identical centroids reuses the built indexer, and a
    # new fit evicts the old one instead of pinning its ref forever
    import hashlib
    ckey = (hashlib.blake2b(cents.tobytes(), digest_size=16).hexdigest(),
            vec_col, id_col)

    def assign(t):
        # task mode + per-process instance cache: centroids fetched once
        # per worker process (local object-store read), no pinned pool
        return process_cached(IVFIndexer, _cache_key=ckey, centroids_ref=cref,
                              vec_col=vec_col, id_col=id_col)(t)

    indexed = ds.map_batches(assign, batch_format="pyarrow")
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


def _normalized_blocks(ds, id_col: str, vec_col: str, target_rows: int = 4096):
    """Dataset -> list of ObjectRefs to (id, normalized-matrix) Arrow
    tables.  The vectors live in the OBJECT STORE (spillable), never on
    the driver."""
    import pyarrow as pa

    def norm(t: pa.Table) -> pa.Table:
        m = _norm_rows(_batch_matrix(t, vec_col))
        flat = pa.array(m.reshape(-1), pa.float64())
        lists = pa.FixedSizeListArray.from_arrays(flat, m.shape[1] if m.size else 1)
        return pa.Table.from_arrays(
            [t[id_col].combine_chunks() if isinstance(t[id_col], pa.ChunkedArray)
             else t[id_col], lists],
            names=[id_col, "nvec"])

    mat = ds.select_columns([id_col, vec_col]).map_batches(
        norm, batch_format="pyarrow", batch_size=target_rows).materialize()
    return mat.to_arrow_refs()


def _block_arrays(t, id_col: str):
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    nv = t["nvec"]
    if hasattr(nv, "combine_chunks"):
        nv = nv.combine_chunks()
    width = nv.type.list_size
    m = nv.values.to_numpy(zero_copy_only=False).reshape(len(ids), width)
    return ids, m


@ray.remote
def _dedup_block_pair(ref_a, ref_b, threshold: float, id_col: str) -> np.ndarray:
    """Dropped ids from comparing block A x block B (possibly A == B):
    v is dropped iff some u with u.id < v.id has cosine >= threshold."""
    ta = ray.get(ref_a) if not hasattr(ref_a, "num_rows") else ref_a
    tb = ray.get(ref_b) if not hasattr(ref_b, "num_rows") else ref_b
    ids_a, ma = _block_arrays(ta, id_col)
    ids_b, mb = _block_arrays(tb, id_col)
    s = ma @ mb.T                                  # (na, nb)
    hit = s >= threshold
    lt = np.less.outer(ids_a, ids_b)
    gt = np.greater.outer(ids_a, ids_b)
    dropped_b = ids_b[(hit & lt).any(axis=0)]      # some a.id < b.id is a dup
    dropped_a = ids_a[(hit & gt).any(axis=1)]      # some b.id < a.id is a dup
    return np.unique(np.concatenate([dropped_a, dropped_b]))


def embedding_dedup_survivors(ds, threshold: float = 0.98,
                              id_col: str = "vec_id", vec_col: str = "embedding"):
    """EXACT near-dup rule: drop v iff ∃ u < v with cosine(u, v) >=
    threshold.  Distributed block-pair kernel: normalized blocks live in
    the object store (``to_arrow_refs`` — the driver never holds a
    vector); one Ray task per block pair (i <= j) does a float64 matmul
    and returns only dropped IDS; survivors stream out as a Dataset with
    a vectorized ``pc.is_in`` filter over the (small, dup-count-bounded)
    dropped set.

    Cost is O(n²/B²) tasks — the exact path, kept because the dedup rule
    is exact (and DuckDB-oracle-checked).  At 100 TB use
    ``embedding_dedup_lsh`` (random-hyperplane buckets, near-linear) and
    accept its measured recall."""
    import pyarrow as pa
    import pyarrow.compute as pc
    refs = _normalized_blocks(ds, id_col, vec_col)
    futures = [_dedup_block_pair.remote(refs[i], refs[j], threshold, id_col)
               for i in range(len(refs)) for j in range(i, len(refs))]
    dropped: set = set()
    for part in ray.get(futures):
        dropped.update(part.tolist())
    drop_arr = pa.array(sorted(dropped), pa.int64())

    def keep(t: pa.Table) -> pa.Table:
        if len(drop_arr) == 0:
            return t
        return t.filter(pc.invert(pc.is_in(
            pc.cast(t[id_col], pa.int64()), value_set=drop_arr)))

    return ds.select_columns([id_col]).map_batches(keep, batch_format="pyarrow")


def _pairwise_dropped(ids: np.ndarray, m: np.ndarray, threshold: float,
                      block: int = 4096) -> np.ndarray:
    """Boolean dropped mask for the keep-earliest rule over ONE bucket,
    computed block-pair-wise: peak score-matrix memory is O(block²), not
    O(n²) — a hot bucket (many near-identical vectors) stays bounded.
    One chunk pair == the dense path, so small buckets pay no overhead."""
    n = ids.size
    dropped = np.zeros(n, dtype=bool)
    for i0 in range(0, n, block):
        i1 = min(i0 + block, n)
        for j0 in range(i0, n, block):
            j1 = min(j0 + block, n)
            s = m[i0:i1] @ m[j0:j1].T
            hit = s >= threshold
            dropped[j0:j1] |= (hit & np.less.outer(ids[i0:i1], ids[j0:j1])).any(axis=0)
            dropped[i0:i1] |= (hit & np.greater.outer(ids[i0:i1], ids[j0:j1])).any(axis=1)
    return dropped


def embedding_dedup_lsh(ds, threshold: float = 0.98, n_planes: int = 12,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        seed: int = 29, verify_block: int = 4096):
    """Scale path for embedding near-dedup: random-hyperplane LSH buckets
    (identical sign pattern over ``n_planes`` hyperplanes) -> EXACT
    cosine verification within each bucket (vectorized map_groups) ->
    keep-earliest.  Near-linear: only bucket-mates are compared; recall
    vs the exact kernel is measured in tests (high-cosine pairs agree on
    most hyperplane signs: P[same bucket] = (1 - theta/pi)^n_planes).

    Hot-bucket defense: the in-bucket verify is block-pair-wise
    (``_pairwise_dropped``) so a degenerate bucket of B near-identical
    vectors costs O(B²/block²) small matmuls under O(block²) memory
    instead of one dense B×B score matrix; hyperplanes come from a
    per-process cache, not per-batch regeneration."""
    import pyarrow as pa

    def bucketize(t: pa.Table) -> pa.Table:
        m = _norm_rows(_batch_matrix(t, vec_col))
        planes = _hyperplanes(m.shape[1], n_planes, seed)
        bits = (m @ planes) >= 0
        bucket = (bits @ (1 << np.arange(n_planes, dtype=np.int64))).astype(np.int64)
        flat = pa.array(m.reshape(-1), pa.float64())
        lists = pa.FixedSizeListArray.from_arrays(flat, m.shape[1] if m.size else 1)
        return pa.Table.from_arrays(
            [t[id_col].combine_chunks() if isinstance(t[id_col], pa.ChunkedArray)
             else t[id_col],
             pa.array(bucket, pa.int64()), lists],
            names=[id_col, "bucket", "nvec"])

    buck = ds.select_columns([id_col, vec_col]).map_batches(
        bucketize, batch_format="pyarrow")

    def verify(g: pa.Table) -> pa.Table:
        ids, m = _block_arrays(g.combine_chunks(), id_col)
        keep = ids[~_pairwise_dropped(ids, m, threshold, verify_block)]
        return pa.Table.from_arrays([pa.array(keep, pa.int64())], names=[id_col])

    kept_in_bucket = buck.groupby("bucket").map_groups(verify, batch_format="pyarrow")
    # a doc survives iff it survived its bucket (each doc is in exactly
    # one bucket, so no cross-bucket reconciliation is needed)
    return kept_in_bucket


def write_lsh_bucket_side_table(embeddings_path: str, out_path: str,
                                n_planes: int = 12, seed: int = 29,
                                id_col: str = "vec_id",
                                vec_col: str = "embedding") -> str:
    """Deterministic (vec_id, bucket) side table for the DuckDB replay
    oracle of ``embedding_dedup_lsh`` — the BUCKET ASSIGNMENT comes from
    the same normalize + hyperplane-sign kernel ``bucketize`` runs; the
    keep-earliest-within-bucket drop rule (drop v iff some bucket-mate
    u < v has cosine >= threshold) is replayed independently in SQL with
    DuckDB's own ``list_cosine_similarity``.  Sized for the correctness
    gate (sf0.01); the operator itself never reads this file."""
    import os

    import pyarrow.parquet as pq

    import logtrics_ray.functions.similarity as _self
    from logtrics_ray import hashing as H
    fresh, mark = H.fixture_cache(
        [out_path], f"{H.source_version(_self)}:{embeddings_path}:"
                    f"{n_planes}:{seed}:{id_col}:{vec_col}")
    if fresh:
        return out_path
    t = pq.read_table(embeddings_path, columns=[id_col, vec_col])
    ids = t[id_col].to_numpy().astype(np.int64)
    m = _norm_rows(_batch_matrix(t, vec_col))
    planes = _hyperplanes(m.shape[1] if m.size else 1, n_planes, seed)
    bits = (m @ planes) >= 0
    bucket = (bits @ (1 << np.arange(n_planes, dtype=np.int64))).astype(np.int64)
    pq.write_table(pa.table({id_col: ids, "bucket": bucket}), out_path)
    mark()
    return out_path


def write_ivf_side_table(embeddings_path: str, out_path: str,
                         query_ids: list[int], n_centroids: int = 16,
                         nprobe: int = 4, sample: int = 2048, iters: int = 5,
                         seed: int = 13, id_col: str = "vec_id",
                         vec_col: str = "embedding"):
    """Deterministic IVF replay for the ``knn_ivf`` DuckDB oracle.

    Rebuilds the SAME centroids as the distributed ``fit_centroids``
    (shared ``_hash_spread_mask`` -> ``_finalize_sample`` ->
    ``_kmeans_lite``), assigns every vector to its nearest list exactly
    as ``IVFIndexer`` does (same double-normalization, same argmax
    tie-break), and derives the probed-list UNION for the given queries
    exactly as ``knn_ivf`` does.  Writes (vec_id, ivf_list) and returns
    ``(path, wanted_lists)`` so the SQL oracle can brute-force exact
    top-k over the probed subset only — the search itself is replayed by
    DuckDB, not by this module."""
    import pyarrow.parquet as pq

    t = pq.read_table(embeddings_path, columns=[id_col, vec_col])
    ids = t[id_col].to_numpy().astype(np.int64)
    m = _batch_matrix(t, vec_col)
    keep = _hash_spread_mask(ids, ids.size, sample)
    s_ids, s_m = (ids[keep], m[keep]) if keep.any() else (ids[:sample],
                                                          m[:sample])
    cents = _kmeans_lite(_finalize_sample(s_ids, s_m, sample),
                         n_centroids, iters, seed)
    c2 = _norm_rows(cents)                 # IVFIndexer re-normalizes too
    assign = (_norm_rows(m) @ c2.T).argmax(axis=1).astype(np.int64)
    qsel = np.isin(ids, np.asarray(sorted(query_ids), dtype=np.int64))
    order = np.argsort(ids[qsel], kind="stable")
    qmat = _norm_rows(m[qsel][order].astype(np.float64))
    probe = np.argsort(-(qmat @ c2.T), axis=1)[:, :nprobe]
    wanted = sorted({int(x) for row in probe for x in row})
    pq.write_table(pa.table({id_col: ids, "ivf_list": assign}), out_path)
    return out_path, wanted


# -------------------------------------------------- product quantization --
#
# The compressed-domain ANN scale path: vectors are encoded once into
# m uint8 codes (one centroid id per subspace) and every query scans
# CODES, not floats — at 100 TB the per-node working set is m bytes per
# vector instead of 4*dim, and the scan is a table lookup (ADC) instead
# of a matmul.  Training reuses the IVF family's deterministic
# hash-spread sample so the codebooks are a pure function of the corpus
# (reference semantics anchor: the engine-side "stateful index" posture
# mirrors logtrics' compiled-rule state, /root/reference/script/lua.go
# — built once, applied per record batch).

PQ_SUBS = 8          # subspaces (dim must divide evenly)
PQ_CENTROIDS = 16    # centroids per subspace -> 4-bit codes
PQ_ITERS = 8


def _pq_codebooks(sample_m: np.ndarray, m_subs: int, kc: int,
                  iters: int) -> np.ndarray:
    """Per-subspace Lloyd's k-means over a canonical (normalized,
    id-sorted) sample — deterministic: strided-row init, first-lowest
    argmin assignment, empty cluster keeps its previous centroid.
    Shared by the distributed fit and the oracle side-table writer.
    Returns (m_subs, kc, sub_dim) float64."""
    n, dim = sample_m.shape
    if dim % m_subs:
        raise ValueError(f"PQ: dim {dim} not divisible by m={m_subs}")
    sub_dim = dim // m_subs
    kc = min(kc, n)
    init_idx = np.unique(np.round(np.linspace(0, n - 1, kc)).astype(int))
    books = np.empty((m_subs, init_idx.size, sub_dim), dtype=np.float64)
    for s in range(m_subs):
        x = sample_m[:, s * sub_dim:(s + 1) * sub_dim]
        c = x[init_idx].copy()
        for _ in range(iters):
            # direct (x-c)^2 form — the SQL replay sums the identical
            # per-component squares, so no a^2+b^2-2ab rearrangement
            d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)        # first lowest == cid tiebreak
            for j in range(c.shape[0]):
                sel = x[assign == j]
                if len(sel):
                    c[j] = sel.mean(axis=0)
        books[s] = c
    return books


def _pq_encode(m: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) normalized matrix -> (n, m_subs) int64 codes (argmin of
    the direct squared distance per subspace, lowest cid on ties)."""
    n_subs, _, sub_dim = books.shape
    codes = np.empty((m.shape[0], n_subs), dtype=np.int64)
    for s in range(n_subs):
        x = m[:, s * sub_dim:(s + 1) * sub_dim]
        d2 = ((x[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = d2.argmin(axis=1)
    return codes


def fit_pq(ds, m_subs: int = PQ_SUBS, kc: int = PQ_CENTROIDS,
           iters: int = PQ_ITERS, sample: int = 2048,
           id_col: str = "vec_id", vec_col: str = "embedding") -> np.ndarray:
    """Distributed deterministic PQ fit: hash-spread sample pull (same
    kernel as ``fit_centroids``), canonical ordering, per-subspace
    k-means.  Driver holds only the sample and the (m, kc, sub_dim)
    codebooks."""
    n_total = max(ds.count(), 1)

    def pick(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(_hash_spread_mask(ids, n_total, sample)))

    rows = ds.map_batches(pick, batch_format="pyarrow").take_all()
    if not rows:
        rows = ds.limit(sample).take_all()
    ids_a = np.array([r[id_col] for r in rows], dtype=np.int64)
    m = np.array([r[vec_col] for r in rows], dtype=np.float64)
    return _pq_codebooks(_finalize_sample(ids_a, m, sample), m_subs, kc,
                         iters)


def knn_pq(ds, query_ids: list[int], k: int = 5, m_subs: int = PQ_SUBS,
           kc: int = PQ_CENTROIDS, iters: int = PQ_ITERS,
           sample: int = 2048, id_col: str = "vec_id",
           vec_col: str = "embedding"):
    """PQ asymmetric-distance top-k: every batch encodes its vectors
    against the broadcast codebooks and scores queries via the (nq, m,
    kc) LUT — one table lookup + m adds per (query, vector), never a
    full matmul.  Rank is by ROUNDED distance (6dp) then vec_id: equal
    PQ codes give exactly-equal distances, so the tiebreak must not
    depend on sub-ulp float summation order (the SQL replay sums the
    same squares in a different order).

    Returns (query_id, neighbor_id, rank, dist) — dist = squared L2 on
    the unit sphere (monotone in cosine), rounded to 6dp."""
    books = fit_pq(ds, m_subs, kc, iters, sample, id_col, vec_col)

    q_rows = ds.map_batches(
        lambda t: t.filter(pa.compute.is_in(t[id_col],
                                            value_set=pa.array(query_ids))),
        batch_format="pyarrow").take_all()
    q_rows.sort(key=lambda r: r[id_col])
    qids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    qmat = _norm_rows(np.array([r[vec_col] for r in q_rows],
                               dtype=np.float64))
    nq = qids.size
    n_subs, kc_eff, sub_dim = books.shape
    lut = np.empty((nq, n_subs, kc_eff), dtype=np.float64)
    for s in range(n_subs):
        qs = qmat[:, s * sub_dim:(s + 1) * sub_dim]
        lut[:, s, :] = ((qs[:, None, :] - books[s][None, :, :]) ** 2) \
            .sum(axis=2)
    ref = ray.put((qids, lut, books))

    def local_topk(t: pa.Table) -> pa.Table:
        qids_, lut_, books_ = ray.get(ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()),
                 pa.array([], pa.float64())],
                names=["query_id", "neighbor_id", "dist"])
        codes = _pq_encode(_norm_rows(_batch_matrix(t, vec_col)), books_)
        # d2[q, row] = sum_s lut[q, s, codes[row, s]] — fixed s order
        d2 = np.zeros((qids_.size, ids.size), dtype=np.float64)
        for s in range(codes.shape[1]):
            d2 += lut_[:, s, codes[:, s]]
        take = min(k + 1, ids.size)
        out_q, out_id, out_d = [], [], []
        for qi in range(qids_.size):
            d = d2[qi]
            idx = np.argpartition(d, take - 1)[:take]
            out_q.append(np.full(take, qids_[qi], dtype=np.int64))
            out_id.append(ids[idx])
            out_d.append(d[idx])
        return pa.Table.from_arrays(
            [pa.array(np.concatenate(out_q), pa.int64()),
             pa.array(np.concatenate(out_id), pa.int64()),
             pa.array(np.concatenate(out_d), pa.float64())],
            names=["query_id", "neighbor_id", "dist"])

    cand = ds.map_batches(local_topk, batch_format="pyarrow")

    def merge_query(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        qid = int(g["query_id"][0].as_py())
        ids = g["neighbor_id"].to_numpy(zero_copy_only=False)
        d = np.round(g["dist"].to_numpy(zero_copy_only=False), 6)
        keep = ids != qid
        ids, d = ids[keep], d[keep]
        order = np.lexsort((ids, d))[:k]
        n = order.size
        return pa.Table.from_arrays([
            pa.array(np.full(n, qid, dtype=np.int64), pa.int64()),
            pa.array(ids[order], pa.int64()),
            pa.array(np.arange(1, n + 1, dtype=np.int64), pa.int64()),
            pa.array(d[order], pa.float64()),
        ], names=["query_id", "neighbor_id", "rank", "dist"])

    df = (cand.groupby("query_id")
          .map_groups(merge_query, batch_format="pyarrow").to_pandas())
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


def write_pq_codebook_side_table(embeddings_path: str, out_path: str,
                                 m_subs: int = PQ_SUBS,
                                 kc: int = PQ_CENTROIDS,
                                 iters: int = PQ_ITERS, sample: int = 2048,
                                 id_col: str = "vec_id",
                                 vec_col: str = "embedding") -> str:
    """Deterministic PQ replay side table for the ``knn_pq`` oracle:
    rebuilds the SAME codebooks as the distributed ``fit_pq`` (shared
    ``_hash_spread_mask`` -> ``_finalize_sample`` -> ``_pq_codebooks``)
    and writes them component-flat as (sub, cid, comp, val) — ONLY the
    codebooks; encoding, asymmetric distance and ranking are all
    replayed independently by DuckDB."""
    import pyarrow.parquet as pq

    t = pq.read_table(embeddings_path, columns=[id_col, vec_col])
    ids = t[id_col].to_numpy().astype(np.int64)
    m = _batch_matrix(t, vec_col)
    keep = _hash_spread_mask(ids, ids.size, sample)
    s_ids, s_m = (ids[keep], m[keep]) if keep.any() else (ids[:sample],
                                                          m[:sample])
    books = _pq_codebooks(_finalize_sample(s_ids, s_m, sample), m_subs, kc,
                          iters)
    n_subs, kc_eff, sub_dim = books.shape
    sub, cid, comp = np.meshgrid(np.arange(n_subs), np.arange(kc_eff),
                                 np.arange(sub_dim), indexing="ij")
    pq.write_table(pa.table({
        "sub": pa.array(sub.reshape(-1), pa.int64()),
        "cid": pa.array(cid.reshape(-1), pa.int64()),
        "comp": pa.array(comp.reshape(-1), pa.int64()),
        "val": pa.array(books.reshape(-1), pa.float64()),
    }), out_path)
    return out_path


def knn_pq_oracle_sql(side_path: str, query_ids: list[int], k: int = 5,
                      sub_dim: int = 8,
                      emb_table: str = "embeddings") -> str:
    """Full independent DuckDB replay of ``knn_pq`` from the codebook
    side table alone: normalize, ENCODE (argmin per subspace, lowest cid
    on ties), asymmetric distance, rank by (rounded dist, neighbor_id)."""
    qcsv = ", ".join(str(int(q)) for q in sorted(query_ids))
    return f"""
    WITH flat AS (
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS gc,
             unnest(embedding)::DOUBLE AS v
      FROM {emb_table}),
    nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nn FROM flat GROUP BY 1),
    nf AS (
      SELECT f.vec_id, f.gc // {sub_dim} AS sub, f.gc % {sub_dim} AS comp,
             f.v / (CASE WHEN n.nn = 0 THEN 1 ELSE n.nn END) AS v
      FROM flat f JOIN nrm n USING (vec_id)),
    cb AS (SELECT * FROM read_parquet('{side_path}')),
    enc AS (
      SELECT nf.vec_id, nf.sub, cb.cid,
             sum((nf.v - cb.val) * (nf.v - cb.val)) AS d2
      FROM nf JOIN cb ON cb.sub = nf.sub AND cb.comp = nf.comp
      GROUP BY 1, 2, 3),
    codes AS (
      SELECT vec_id, sub, cid FROM enc
      QUALIFY row_number() OVER (PARTITION BY vec_id, sub
                                 ORDER BY d2 ASC, cid ASC) = 1),
    q AS (SELECT vec_id AS qid, sub, comp, v FROM nf
          WHERE vec_id IN ({qcsv})),
    adc AS (
      SELECT q.qid AS query_id, c.vec_id AS neighbor_id,
             round(sum((q.v - cb.val) * (q.v - cb.val)), 6) AS dist
      FROM q
      JOIN codes c ON c.sub = q.sub AND c.vec_id <> q.qid
      JOIN cb ON cb.sub = c.sub AND cb.cid = c.cid AND cb.comp = q.comp
      GROUP BY 1, 2)
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY dist ASC, neighbor_id ASC) AS rank,
           dist
    FROM adc QUALIFY rank <= {k}"""


# ------------------------------------------------------- label centroids --

def label_centroids_frame(emb_path: str, scale_bits: int = 20):
    """Per-LABEL embedding CENTROIDS (mean vector per class) — the
    aggregation behind cluster summaries, class prototypes and
    IVF-style coarse quantizers, computed exactly at any scale.

    Float summation order is partition-dependent, so a naive float mean
    can never hash-match a SQL replay.  Instead every element is
    QUANTIZED once — q = round_half_away(v * 2^scale_bits) as int64 —
    and the distributed aggregation sums exact integers (order-free,
    associative); the centroid is ONE float division S / (n * 2^bits)
    at the end, the identical expression the SQL replay evaluates.
    The quantization IS the published semantic (documented, not hidden
    error): at 2^20 the centroid deviates from the float mean by
    < 1e-6 per element.

    Per batch: one np.add.at scatter into a (labels x dim) int64 matrix
    (no per-row Python); partials are (label, dim, s, n) rows — bounded
    by labels x dim, never corpus size — merged by one tiny groupby.

    Output: (label, dim, centroid, n).
    """
    from logtrics_ray.sources.parquet import read_parquet_clean

    SCALE = float(1 << scale_bits)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"label": pa.array([], pa.int64()),
                          "dim": pa.array([], pa.int64()),
                          "s": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.combine_chunks()
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        offs = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offs)
        if lens.size and (lens != lens[0]).any():
            raise ValueError("label_centroids: ragged embedding column")
        D = int(lens[0]) if lens.size else 0
        v = emb.values.to_numpy(zero_copy_only=False)[
            offs[0]:offs[-1]].astype(np.float64)
        x = v * SCALE
        q = np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        ulab, lidx = np.unique(lab, return_inverse=True)
        S = np.zeros((ulab.size, D), np.int64)
        np.add.at(S, lidx, q.reshape(-1, D))   # row-wise scatter-add
        cnt = np.bincount(lidx)
        return pa.table({
            "label": pa.array(np.repeat(ulab, D), pa.int64()),
            "dim": pa.array(np.tile(np.arange(D, dtype=np.int64),
                                    ulab.size), pa.int64()),
            "s": pa.array(S.ravel(), pa.int64()),
            "n": pa.array(np.repeat(cnt, D), pa.int64())})

    agg = (read_parquet_clean(emb_path, columns=["embedding", "label"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby(["label", "dim"]).sum(["s", "n"]))

    def finish(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        s = t["sum(s)"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t["sum(n)"].to_numpy(zero_copy_only=False).astype(np.float64)
        from logtrics_ray.pipelines.table_rollup import _round6
        c = _round6(s / (n * SCALE))
        return pa.Table.from_arrays([
            t["label"], t["dim"], pa.array(c, pa.float64()),
            t["sum(n)"],
        ], names=["label", "dim", "centroid", "n"])

    return agg.map_batches(finish, batch_format="pyarrow")


def label_centroids_oracle_sql(emb_table: str = "embeddings",
                               scale_bits: int = 20) -> str:
    SCALE = float(1 << scale_bits)
    return f"""
    WITH x AS (
      SELECT label::BIGINT AS label, embedding,
             unnest(generate_series(1, len(embedding))) AS i
      FROM {emb_table}),
    e AS (
      SELECT label, i - 1 AS dim,
             CAST(round(embedding[i] * {SCALE!r}) AS BIGINT) AS q
      FROM x)
    SELECT label, dim,
           round(sum(q) / (count(*) * {SCALE!r}), 6) AS centroid,
           count(*)::BIGINT AS n
    FROM e GROUP BY 1, 2"""
