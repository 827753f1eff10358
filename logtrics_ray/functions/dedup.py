"""Deduplication operators for training-data pipelines.

Public techniques: MinHash/LSH after Broder, "On the resemblance and
containment of documents" (SEQUENCES 1997) with banded LSH as in
Rajaraman & Ullman, *Mining of Massive Datasets* ch.3; SimHash after
Charikar, "Similarity estimation techniques from rounding algorithms"
(STOC 2002).

All are Dataset->Dataset transforms designed for the 100 TB shape:

  * exact_dedup: content-hash per batch (vectorized) -> hash-partitioned
    groupby -> keep min doc_id per hash.  The shuffle moves only
    (hash, doc_id) — never the text.
  * minhash_lsh_dedup: shingle -> minhash signature per batch (numpy) ->
    explode to (band_id, band_hash, doc_id) rows -> groupby bands ->
    candidate pairs -> keep-earliest rule.  Only signatures shuffle.
  * simhash_dedup: 64-bit simhash per batch; near-dups = identical
    simhash after masking k noise bits (bucketed groupby, no pair blowup).
  * ngram_jaccard_pairs: verification kernel — exact Jaccard over n-gram
    sets for a candidate pair list (broadcast the small candidate set).

Drop rule (shared, SQL-expressible): a doc is dropped iff some doc with
a SMALLER doc_id is its duplicate under the operator's predicate —
deterministic, order-free, and independently checkable by the DuckDB
oracle.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from logtrics_ray.hashing import hash64_array

_WS = re.compile(r"\s+")

# ------------------------------------------------------------ exact dedup --


def add_content_hash(ds, text_col: str = "text"):
    # int64 reinterpretation of the 64-bit hash: Ray's sort-shuffle
    # boundary sampling round-trips key samples through Python ints and
    # OVERFLOWS on uint64 values > 2^63 (ArrowConversionError) — signed
    # keys group identically and shuffle safely.
    def fn(t: pa.Table) -> pa.Table:
        h = hash64_array(t[text_col]).astype(np.int64)
        return t.append_column("content_hash", pa.array(h, pa.int64()))
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Survivors of exact dedup: min id per content hash.  Returns a
    Dataset of (doc_id) — narrow output, shuffle carries only hash+id.

    Uses the built-in vectorized min aggregation (one reduce per block,
    not one Python group call per hash — at 100 TB the group count is the
    row count, so per-group Python would be the bottleneck)."""
    hashed = add_content_hash(ds, text_col).select_columns(["content_hash", id_col])
    agg = hashed.groupby("content_hash").min(id_col)

    def project(t: pa.Table) -> pa.Table:
        return t.select([f"min({id_col})"]).rename_columns([id_col])

    return agg.map_batches(project, batch_format="pyarrow")


# ------------------------------------------------------------ minhash-LSH --

class MinHasher:
    """Actor-pool callable: text -> k-permutation minhash signature.

    State built once per actor: the (a, b) hash-permutation parameters.
    Signature: for each of ``num_perm`` permutations, min over word
    ``shingle_n``-gram hashes of (a*h + b) mod 2^61-1.
    """

    MERSENNE = np.uint64((1 << 61) - 1)

    def __init__(self, num_perm: int = 64, shingle_n: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, int(self.MERSENNE), size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(self.MERSENNE), size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.n = shingle_n

    def shingle_hashes(self, text: str) -> np.ndarray:
        words = _WS.split(text.strip().lower())
        if len(words) < self.n:
            grams = [" ".join(words)] if words and words[0] else []
        else:
            grams = [" ".join(words[i:i + self.n]) for i in range(len(words) - self.n + 1)]
        if not grams:
            return np.zeros(1, dtype=np.uint64)
        return hash64_array(grams)

    def signature(self, text: str) -> np.ndarray:
        h = self.shingle_hashes(text)
        with np.errstate(over="ignore"):
            vals = (h[None, :] * self.a[:, None] + self.b[:, None]) % self.MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        sigs = np.stack([self.signature(t) for t in texts]) if texts else \
            np.empty((0, self.num_perm), dtype=np.uint64)
        return pa.Table.from_arrays(
            [batch["doc_id"].combine_chunks() if isinstance(batch["doc_id"], pa.ChunkedArray)
             else batch["doc_id"],
             pa.array(list(sigs), pa.list_(pa.uint64()))],
            names=["doc_id", "minhash"])


def minhash_lsh_candidates(ds, num_perm: int = 64, bands: int = 16,
                           shingle_n: int = 3):
    """documents -> candidate near-dup pairs via banded LSH.

    Pipeline: signature per batch (actor pool) -> explode to one row per
    band (band_id, band_hash, doc_id) -> groupby band bucket -> pairs of
    ids sharing a bucket (earliest id first).  Returns Dataset of
    (a, b) id pairs with a < b.
    """
    rows_per_band = num_perm // bands
    sigs = ds.map_batches(MinHasher, fn_constructor_kwargs=dict(
        num_perm=num_perm, shingle_n=shingle_n),
        batch_format="pyarrow", concurrency=2)

    def explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sig = np.stack(t["minhash"].to_pylist()).astype(np.uint64) if t.num_rows else \
            np.empty((0, num_perm), dtype=np.uint64)
        out_band, out_hash, out_id = [], [], []
        for b in range(bands):
            chunk = sig[:, b * rows_per_band:(b + 1) * rows_per_band]
            bh = hash64_array(["|".join(map(str, row)) for row in chunk]).astype(np.int64)
            out_band.append(np.full(len(ids), b, dtype=np.int64))
            out_hash.append(bh)
            out_id.append(ids)
        return pa.Table.from_arrays(
            [pa.array(np.concatenate(out_band), pa.int64()),
             pa.array(np.concatenate(out_hash), pa.int64()),  # signed: shuffle-safe keys
             pa.array(np.concatenate(out_id))],
            names=["band_id", "band_hash", "doc_id"])

    exploded = sigs.map_batches(explode, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        if ids.size < 2:
            return pd.DataFrame({"a": [], "b": []})
        # pair every member with the bucket minimum — enough for the
        # keep-earliest rule and linear (not quadratic) in bucket size.
        return pd.DataFrame({"a": np.full(ids.size - 1, ids[0]), "b": ids[1:]})

    return exploded.groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas")


def minhash_dedup_survivors(ds, **kw):
    """ids that survive keep-earliest minhash dedup (drop b of every pair)."""
    import ray
    pairs = minhash_lsh_candidates(ds, **kw)
    dropped = pairs.unique("b")  # list of dropped ids (small: near-dup count)
    drop_ref = ray.put(set(dropped))

    def keep(t: pa.Table) -> pa.Table:
        drop = ray.get(drop_ref)
        mask = pa.array([i not in drop for i in t["doc_id"].to_pylist()])
        return t.filter(mask)

    return ds.select_columns(["doc_id"]).map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------- simhash --

class SimHasher:
    """Actor-pool callable: 64-bit simhash over word unigram hashes."""

    def __init__(self, mask_bits: int = 0):
        # mask_bits low bits zeroed -> coarser buckets (near-dup radius)
        self.mask = np.uint64(~((1 << mask_bits) - 1) & 0xFFFFFFFFFFFFFFFF)

    def simhash(self, text: str) -> int:
        words = [w for w in _WS.split(text.strip().lower()) if w]
        if not words:
            return 0
        h = hash64_array(words)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        sh = np.uint64(0)
        for i in range(64):
            if v[i] > 0:
                sh |= np.uint64(1) << np.uint64(i)
        return int(sh & self.mask)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        out = np.array([self.simhash(t) for t in texts], dtype=np.uint64)
        return pa.Table.from_arrays(
            [batch["doc_id"].combine_chunks() if isinstance(batch["doc_id"], pa.ChunkedArray)
             else batch["doc_id"],
             pa.array(out.astype(np.int64), pa.int64())],  # signed: shuffle-safe keys
            names=["doc_id", "simhash"])


def simhash_dedup(ds, mask_bits: int = 4):
    """Survivors (min id) per masked-simhash bucket — vectorized min
    aggregation (no per-group Python; see exact_dedup)."""
    sh = ds.map_batches(SimHasher, fn_constructor_kwargs=dict(mask_bits=mask_bits),
                        batch_format="pyarrow", concurrency=2)
    agg = sh.groupby("simhash").min("doc_id")

    def project(t: pa.Table) -> pa.Table:
        return t.select(["min(doc_id)"]).rename_columns(["doc_id"])

    return agg.map_batches(project, batch_format="pyarrow")


# ------------------------------------------------------- n-gram Jaccard ----

def ngram_set(text: str, n: int = 3) -> set:
    words = [w for w in _WS.split(text.strip().lower()) if w]
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i:i + n]) for i in range(len(words) - n + 1)}


def ngram_jaccard_dedup_survivors(ds, threshold: float = 0.8, n: int = 3,
                                  id_col: str = "doc_id", **lsh_kw):
    """Near-dedup with exact verification: LSH candidates (cheap, recall
    stage) -> exact n-gram Jaccard >= threshold (precision stage) -> drop
    the later id of each verified pair.  Only the verified-dup set is
    broadcast; texts shuffle nowhere."""
    import ray
    pair_rows = minhash_lsh_candidates(ds, shingle_n=n, **lsh_kw).take_all()
    pairs = sorted({(r["a"], r["b"]) for r in pair_rows})
    if pairs:
        verified = ngram_jaccard_pairs(ds, pairs, n=n, id_col=id_col)
        dropped = set(verified.loc[verified["jaccard"] >= threshold, "b"])
    else:
        dropped = set()
    drop_ref = ray.put(dropped)

    def keep(t: pa.Table) -> pa.Table:
        drop = ray.get(drop_ref)
        mask = pa.array([i not in drop for i in t[id_col].to_pylist()])
        return t.filter(mask)

    return ds.select_columns([id_col]).map_batches(keep, batch_format="pyarrow")


def ngram_jaccard_pairs(ds, candidate_pairs: list[tuple], n: int = 3,
                        text_col: str = "text", id_col: str = "doc_id"):
    """Exact Jaccard verification for a (small, broadcast) candidate list.
    Texts are fetched via a filtered pass; similarity computed driver-side
    on the candidate subset only."""
    import ray
    wanted = {a for a, _ in candidate_pairs} | {b for _, b in candidate_pairs}
    wanted_ref = ray.put(wanted)

    def pick(t: pa.Table) -> pa.Table:
        w = ray.get(wanted_ref)
        mask = pa.array([i in w for i in t[id_col].to_pylist()])
        return t.filter(mask)

    sub = ds.map_batches(pick, batch_format="pyarrow").select_columns([id_col, text_col])
    texts = {r[id_col]: r[text_col] for r in sub.take_all()}
    rows = []
    for a, b in candidate_pairs:
        sa, sb = ngram_set(texts.get(a, ""), n), ngram_set(texts.get(b, ""), n)
        denom = len(sa | sb)
        rows.append({"a": a, "b": b,
                     "jaccard": (len(sa & sb) / denom) if denom else 0.0})
    return pd.DataFrame(rows)
