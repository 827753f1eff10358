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
  * minhash dedup: shingle -> minhash signature per batch (numpy) ->
    explode to (band_id, band_hash, doc_id) rows -> built-in groupby.min
    per bucket -> hash-join members back to their bucket minima ->
    groupby.min per doc.  A doc survives iff it IS the minimum of every
    bucket it hashes into; everything is vectorized built-in aggregates
    + one distributed hash join — no per-bucket Python calls, nothing
    materialized on the driver.
  * simhash_dedup: 64-bit simhash per batch; near-dups = identical
    simhash after masking k noise bits (bucketed groupby, no pair blowup).
  * ngram_jaccard dedup: LSH candidate pairs stay a Dataset; the
    candidate docs' n-gram hash sets stay a Dataset too (semi-join of
    documents against the candidate ids); two distributed hash joins
    attach the gram lists to each pair's ``a`` and ``b`` sides; exact
    Jaccard is a fully-vectorized merged-sort duplicate count inside
    map_batches; survivors come from a distributed anti-join.  NOTHING
    is materialized on the driver — no take_all, no ray.put broadcast —
    so the path holds even when the near-dup count is corpus-scale.

Drop rule (shared, SQL-expressible): a doc is dropped iff some doc with
a SMALLER doc_id is its duplicate under the operator's predicate —
deterministic, order-free, and independently checkable by the DuckDB
oracle.

Stateful per-batch callables (MinHasher/SimHasher) run in TASK mode via
a per-worker-process instance cache (same amortization as an actor's
``__init__`` — state built once per process — without pinning an
actor-pool size that could starve a node; see stages/extract.py).
"""

from __future__ import annotations


import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from logtrics_ray.hashing import hash64_array, hash64_words



# Unicode White_Space=yes codepoints as UTF-8 byte patterns.  The split
# is implemented in numpy over the raw value buffer instead of Arrow's
# ``utf8_split_whitespace`` because that kernel has a PROCESS-STATEFUL
# bug in pyarrow 16.1: after lowercasing certain inputs (observed with
# U+0130 'İ' in the batch), later split calls on byte-identical arrays
# permanently merge trailing whitespace into the last word — i.e. the
# same document would hash differently depending on what a worker
# process saw earlier, breaking dedup determinism at scale (pinned by
# tests/test_functions.py::test_split_words_immune_to_kernel_poisoning).
_WS_2BYTE = ((0xC2, 0x85), (0xC2, 0xA0))            # U+0085 NEL, U+00A0 NBSP
_WS_3BYTE_RANGES = (                                 # (b0, b1, lo2, hi2)
    (0xE1, 0x9A, 0x80, 0x80),                        # U+1680 ogham
    (0xE2, 0x80, 0x80, 0x8A),                        # U+2000-200A spaces
    (0xE2, 0x80, 0xA8, 0xA9),                        # U+2028/29 line/para sep
    (0xE2, 0x80, 0xAF, 0xAF),                        # U+202F narrow nbsp
    (0xE2, 0x81, 0x9F, 0x9F),                        # U+205F math space
    (0xE3, 0x80, 0x80, 0x80),                        # U+3000 ideographic
)


# NOTE: the class is utf8proc/CPython ``isspace`` — Unicode
# White_Space=yes PLUS the bidi-B/S control separators 0x1C-0x1F —
# because that is what Arrow's utf8_split_whitespace (the kernel this
# splitter replaced) and Python ``str.split()`` both use; the oracle
# side tables were built with those semantics.
_ASCII_WS_LUT = np.zeros(256, dtype=bool)
_ASCII_WS_LUT[[0x09, 0x0A, 0x0B, 0x0C, 0x0D,
               0x1C, 0x1D, 0x1E, 0x1F, 0x20]] = True
_WS_LEAD_LUT = np.zeros(256, dtype=bool)
_WS_LEAD_LUT[[0xC2, 0xE1, 0xE2, 0xE3]] = True
_ASCII_LOWER_LUT = np.arange(256, dtype=np.uint8)
_ASCII_LOWER_LUT[0x41:0x5B] += 32


def _ws_byte_mask(b: np.ndarray) -> np.ndarray:
    """Per-BYTE whitespace mask over a utf-8 buffer: True for every byte
    of a White_Space=yes character.  Lead bytes 0xC2/0xE1/0xE2/0xE3 can
    never be continuation bytes, so pattern matches only fire at real
    character boundaries.  ASCII whitespace is one LUT gather; the
    multi-byte patterns are evaluated only at candidate lead-byte
    positions (usually none on real corpora)."""
    m = _ASCII_WS_LUT[b]
    cand = np.flatnonzero(_WS_LEAD_LUT[b])
    if cand.size:
        c2 = cand[(cand + 1 < b.size)]
        b0, b1 = b[c2], b[c2 + 1]
        two = np.zeros(c2.size, dtype=bool)
        for l0, l1 in _WS_2BYTE:
            two |= (b0 == l0) & (b1 == l1)
        hit2 = c2[two]
        m[hit2] = True
        m[hit2 + 1] = True
        c3 = cand[(cand + 2 < b.size)]
        b0, b1, b2 = b[c3], b[c3 + 1], b[c3 + 2]
        three = np.zeros(c3.size, dtype=bool)
        for l0, l1, lo, hi in _WS_3BYTE_RANGES:
            three |= (b0 == l0) & (b1 == l1) & (b2 >= lo) & (b2 <= hi)
        hit3 = c3[three]
        m[hit3] = True
        m[hit3 + 1] = True
        m[hit3 + 2] = True
    return m


def split_words(texts) -> tuple[pa.Array, np.ndarray]:
    """Vectorized whitespace split + lowercase shared by the MinHash /
    SimHash / n-gram kernels: (flat per-word string array doc-major,
    per-doc word counts).

    Split runs FIRST, in pure numpy over the utf-8 value buffer (see
    ``_ws_byte_mask`` for why Arrow's split kernel is avoided), then ONE
    ``utf8_lower`` over the flat word array.  split-then-lower equals
    the reference lower-then-split because Unicode simple lowercasing
    never maps a character into or out of the White_Space class."""
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(list(texts), pa.string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    if n == 0:
        return pa.array([], pa.string()), np.empty(0, np.int64)
    bufs = texts.buffers()
    doc_off = np.frombuffer(bufs[1], np.int32)[
        texts.offset: texts.offset + n + 1].astype(np.int64)
    data = (np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None
            else np.empty(0, np.uint8))
    lo, hi = int(doc_off[0]), int(doc_off[-1])
    b = data[lo:hi]
    off0 = doc_off - lo                       # doc byte ranges within b
    if b.size == 0:
        return pa.array([], pa.string()), np.zeros(n, np.int64)
    ws = _ws_byte_mask(b)
    nonws = ~ws
    # a word starts at a non-ws byte whose predecessor is ws or a doc
    # boundary; ends at a non-ws byte whose successor is ws or a boundary
    prev_sep = np.empty(b.size, dtype=bool)
    prev_sep[0] = True
    prev_sep[1:] = ws[:-1]
    next_sep = np.empty(b.size, dtype=bool)
    next_sep[-1] = True
    next_sep[:-1] = ws[1:]
    inner = off0[1:-1]                        # doc boundaries break runs
    prev_sep[inner[(inner >= 0) & (inner < b.size)]] = True
    nz = inner[(inner > 0) & (inner <= b.size)]
    next_sep[nz - 1] = True
    starts = np.flatnonzero(nonws & prev_sep)
    ends = np.flatnonzero(nonws & next_sep)
    lens = ends - starts + 1
    w_doc = np.searchsorted(off0, starts, side="right") - 1
    wc = np.bincount(w_doc, minlength=n).astype(np.int64)
    if starts.size == 0:
        return pa.array([], pa.string()), wc
    # the flat word payload IS the non-ws bytes in order (words are the
    # maximal non-ws runs) — one boolean gather, no index arithmetic
    flat_bytes = b[nonws]
    w_off = np.concatenate([[0], np.cumsum(lens)])
    assert w_off[-1] < (1 << 31), "word payload overflows int32 offsets"
    has_hi = bool((flat_bytes >= 0x80).any())
    if not has_hi:
        # pure-ASCII fast path: LUT lowercase on the raw bytes, no
        # Arrow case kernel
        flat_bytes = _ASCII_LOWER_LUT[flat_bytes]
    words = pa.Array.from_buffers(
        pa.string(), starts.size,
        [None, pa.py_buffer(w_off.astype(np.int32).tobytes()),
         pa.py_buffer(flat_bytes.tobytes())])
    return (pc.utf8_lower(words) if has_hi else words), wc


def word_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """(flat per-word id-hashes, per-doc word counts) — ``split_words``
    followed by ONE ``id_hash64_array`` over the flat word values."""
    from logtrics_ray.hashing import id_hash64_array
    kept, wc = split_words(texts)
    if len(kept) == 0:
        return np.empty(0, np.uint64), wc
    return id_hash64_array(kept), wc


def gram_hash_flat(texts, n: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Flat blake2b word-``n``-gram hashes for a whole batch:
    (gram hashes uint64, owning-doc index int64, n_docs).

    Vectorized replacement for the per-doc ``ngram_set`` loop: ONE
    Arrow lower/split pass (``split_words``), ONE ``take`` building the
    (gram, word) windows off the flat word array, ONE ``binary_join``
    rendering the gram strings, ONE ``hash64_array`` over the flat gram
    column.  Gram semantics identical to ``ngram_set`` (lowercase,
    whitespace split, " "-joined windows; a doc with 0 < words < n
    contributes its whole text as one gram; empty docs none).
    Duplicates within a doc are NOT removed here — every caller
    np.unique()s downstream, where set-dedup and sort order wash out."""
    kept, wc = split_words(texts)
    n_docs = wc.size
    g_cnt = np.where(wc > 0, np.maximum(wc - n + 1, 1), 0)
    total_g = int(g_cnt.sum())
    if total_g == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64), n_docs
    doc_off = np.concatenate([[0], np.cumsum(wc)[:-1]])
    g_off = np.concatenate([[0], np.cumsum(g_cnt)[:-1]])
    g_doc = np.repeat(np.arange(n_docs, dtype=np.int64), g_cnt)
    g_local = np.arange(total_g, dtype=np.int64) - np.repeat(g_off, g_cnt)
    lens = np.minimum(wc[g_doc], n)          # short docs: one whole-text gram
    w_off = np.concatenate([[0], np.cumsum(lens)])
    intra = (np.arange(int(w_off[-1]), dtype=np.int64)
             - np.repeat(w_off[:-1], lens))
    flat_idx = np.repeat(doc_off[g_doc] + g_local, lens) + intra
    gram_words = kept.take(pa.array(flat_idx, pa.int64()))
    lst = pa.LargeListArray.from_arrays(w_off, gram_words)
    grams = pc.binary_join(lst, pa.scalar(" "))
    return hash64_array(grams), g_doc, n_docs


def unique_grams_per_doc(h: np.ndarray, g_doc: np.ndarray,
                         n_docs: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc sorted-unique gram hashes: (flat uniq hashes, doc-major
    ascending-within-doc, per-doc counts) — one lexsort + adjacent-diff
    over the whole batch, no per-doc Python."""
    order = np.lexsort((h, g_doc))
    hs, ds_ = h[order], g_doc[order]
    first = np.ones(hs.size, bool)
    first[1:] = (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])
    uh, ud = hs[first], ds_[first]
    return uh, np.bincount(ud, minlength=n_docs).astype(np.int64)

# Per-worker-process cache of stateful batch callables (task-mode analog
# of actor __init__; Ray reuses worker processes across tasks).
_PROCESS_INSTANCES: dict = {}


def process_cached(cls, _cache_key=None, **kwargs):
    """One live instance PER CLASS per worker process.  On a key change
    the previous instance is evicted — long-lived Ray workers otherwise
    accumulate stale instances (and pin their captured ObjectRefs in the
    object store) across jobs.  ``_cache_key`` overrides the kwargs-tuple
    key for callers whose kwargs embed per-job ObjectRefs of identical
    content (e.g. IVF centroids keyed by a content digest)."""
    key = (cls.__qualname__,
           _cache_key if _cache_key is not None else tuple(sorted(kwargs.items())))
    inst = _PROCESS_INSTANCES.get(key)
    if inst is None:
        for k in [k for k in _PROCESS_INSTANCES if k[0] == cls.__qualname__]:
            del _PROCESS_INSTANCES[k]
        inst = _PROCESS_INSTANCES[key] = cls(**kwargs)
    return inst

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
    """Stateful batch callable: text -> k-permutation minhash signature,
    vectorized across the WHOLE batch.

    State built once per actor/process: the (a, b) hash-permutation
    parameters.  Pipeline per batch (no per-doc Python beyond the C-level
    ``str.split``):
      1. word hashes: one ``id_hash64_array`` call over the flat word
         list of every doc in the batch,
      2. ``shingle_n``-gram hashes: ``hash64_words`` over the stacked
         consecutive word-hash columns (numeric — no string joins; docs
         shorter than n collapse to one gram over their padded hashes),
      3. signatures: (a*h + b) mod 2^64 with ODD a — a bijection of the
         64-bit space (multiply-shift permutation family), so the uint64
         wraparound IS the hash: no per-element modulo (uint64 ``%`` was
         the measured hot spot).  Per-doc minima via
         ``np.minimum.reduceat``; permutations processed in chunks to
         bound the (chunk x grams) working set.
    """

    PERM_CHUNK = 16

    def __init__(self, num_perm: int = 64, shingle_n: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 1 << 63, size=num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.n = shingle_n

    def _gram_hashes(self, texts) -> tuple[np.ndarray, np.ndarray]:
        """Flat gram-hash array + per-doc gram counts."""
        W, wc = word_hashes(texts)
        n_docs = wc.size
        n = self.n
        # every doc gets >= 1 gram (empty docs hash their zero padding)
        g_cnt = np.maximum(wc - n + 1, 1)
        total_g = int(g_cnt.sum())
        doc_off = np.concatenate([[0], np.cumsum(wc)[:-1]])
        g_off = np.concatenate([[0], np.cumsum(g_cnt)[:-1]])
        # gram row g of doc d covers words [start, start + n) clipped to
        # the doc -> build an (total_g, n) matrix of word hashes, 0-padded
        g_doc = np.repeat(np.arange(n_docs), g_cnt)
        g_local = np.arange(total_g) - np.repeat(g_off, g_cnt)
        mat = np.zeros((total_g, n), dtype=np.uint64)
        for j in range(n):
            widx = g_local + j
            valid = widx < wc[g_doc]
            src = doc_off[g_doc] + widx
            mat[valid, j] = W[src[valid]]
        return hash64_words(mat), g_cnt

    def signatures(self, texts) -> np.ndarray:
        """(n_docs, num_perm) uint64 signature matrix.  ``texts`` may be
        an Arrow string array (preferred, zero-copy) or list of str."""
        if len(texts) == 0:
            return np.empty((0, self.num_perm), dtype=np.uint64)
        G, g_cnt = self._gram_hashes(texts)
        g_off = np.concatenate([[0], np.cumsum(g_cnt)[:-1]])
        out = np.empty((len(texts), self.num_perm), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for lo in range(0, self.num_perm, self.PERM_CHUNK):
                hi = min(lo + self.PERM_CHUNK, self.num_perm)
                vals = G[None, :] * self.a[lo:hi, None] + self.b[lo:hi, None]
                out[:, lo:hi] = np.minimum.reduceat(vals, g_off, axis=1).T
        return out

    def signature(self, text: str) -> np.ndarray:
        return self.signatures([text])[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = self.signatures(batch["text"])
        return pa.Table.from_arrays(
            [batch["doc_id"].combine_chunks() if isinstance(batch["doc_id"], pa.ChunkedArray)
             else batch["doc_id"],
             pa.array(list(sigs), pa.list_(pa.uint64()))],
            names=["doc_id", "minhash"])


def minhash_signatures(ds, num_perm: int = 64, shingle_n: int = 3):
    """documents -> (doc_id, minhash list<uint64>), task mode (process-
    cached MinHasher state; no fixed actor-pool size)."""

    def fn(t: pa.Table) -> pa.Table:
        return process_cached(MinHasher, num_perm=num_perm, shingle_n=shingle_n)(t)

    return ds.map_batches(fn, batch_format="pyarrow")


def lsh_exploded(ds, num_perm: int = 64, bands: int = 16, shingle_n: int = 3):
    """documents -> one row per (band_id, band_hash, doc_id).

    Band hashes are computed NUMERICALLY from the uint64 signature words
    (hash64_words with the band index as seed — no per-row string
    rendering).  Only (16 + id) bytes per band ever shuffle."""
    rows_per_band = num_perm // bands

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ids = t["doc_id"].combine_chunks() if isinstance(t["doc_id"], pa.ChunkedArray) \
            else t["doc_id"]
        if n == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()),
                 pa.array([], ids.type)],
                names=["band_id", "band_hash", "doc_id"])
        mh = t["minhash"].combine_chunks() if isinstance(t["minhash"], pa.ChunkedArray) \
            else t["minhash"]
        sig = mh.values.to_numpy(zero_copy_only=False).reshape(n, num_perm)
        out_band = np.repeat(np.arange(bands, dtype=np.int64), n)
        # int64 reinterpretation: Ray's sort-shuffle boundary sampling
        # overflows on uint64 keys > 2^63 (see add_content_hash).
        out_hash = np.concatenate([
            hash64_words(sig[:, b * rows_per_band:(b + 1) * rows_per_band],
                         seed=b).astype(np.int64)
            for b in range(bands)])
        idx = pa.array(np.tile(np.arange(n), bands), pa.int64())
        return pa.Table.from_arrays(
            [pa.array(out_band, pa.int64()),
             pa.array(out_hash, pa.int64()),
             ids.take(idx)],
            names=["band_id", "band_hash", "doc_id"])

    return minhash_signatures(ds, num_perm, shingle_n).map_batches(
        explode, batch_format="pyarrow")


def _schema_stable(ds, num_partitions: int):
    """Join-input hardening for Ray 2.49's hash-join schema-broadcast
    race: key-column schemas ride ONLY on the first scheduled shuffle
    task's (empty) shards, and fully-empty input blocks are
    short-circuited before that send — so an aggregated/joined dataset
    whose first-scheduled block happens to be empty leaves some join
    partitions schema-less and ``finalize`` fails with a flaky
    ``ArrowInvalid: No match ... for key field reference``.  Compacting
    to ``min(num_partitions, rows)`` uniformly non-empty blocks makes
    the schema broadcast deterministic.  Returns (dataset, row_count);
    count() is metadata-cheap on the materialized set, and every input
    this is applied to is aggregation- or candidate-bounded (never the
    raw corpus)."""
    mat = ds.materialize()
    n = mat.count()
    return (mat.repartition(max(1, min(num_partitions, n))) if n else mat), n


def _default_join_partitions() -> int:
    """Hash-join partition count sized to the cluster (~1 per 2 cores,
    min 2): a fixed large count deadlocks small clusters (each aggregator
    reserves resources), a fixed small one under-parallelizes big ones."""
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(2, cpus // 2)


def minhash_dedup_survivors(ds, num_perm: int = 64, bands: int = 16,
                            shingle_n: int = 3, num_partitions: int | None = None):
    """ids that survive keep-earliest minhash dedup.

    A doc is dropped iff some bucket it hashes into contains a smaller
    doc_id.  Every doc sits in exactly ``bands`` distinct (band_id,
    band_hash) buckets and the bucket minimum is always <= any member,
    so it survives iff it IS the minimum of all ``bands`` of them —
    i.e. iff it appears exactly ``bands`` times in the bucket-minima
    table.  That needs NO join: two built-in vectorized aggregations
    (bucket minima, then a count over the already-collapsed minima —
    each shuffle strictly smaller than the last); the driver never sees
    ids or buckets."""
    P = num_partitions or _default_join_partitions()
    minima = (lsh_exploded(ds, num_perm, bands, shingle_n)
              .groupby(["band_id", "band_hash"], num_partitions=P)
              .min("doc_id"))
    per_doc = (minima.map_batches(
        lambda t: t.select(["min(doc_id)"]).rename_columns(["doc_id"]),
        batch_format="pyarrow")
        .groupby("doc_id", num_partitions=P).count())

    def keep(t: pa.Table) -> pa.Table:
        mask = pc.equal(t["count()"], pa.scalar(bands, pa.int64()))
        return t.filter(mask).select(["doc_id"])

    return per_doc.map_batches(keep, batch_format="pyarrow")


def minhash_lsh_candidates(ds, num_perm: int = 64, bands: int = 16,
                           shingle_n: int = 3, num_partitions: int | None = None):
    """documents -> candidate near-dup pairs (a < b) via banded LSH:
    every bucket member pairs with its bucket minimum (linear in bucket
    size — sufficient for the keep-earliest rule).

    ONE exchange when the input was built under ``hash_shuffle_ctx``:
    hash-repartition the exploded band rows on (band_id, band_hash) so
    every bucket lands whole inside one block, then a per-block lexsort
    + run-boundary scan emits (bucket_min, member) pairs directly —
    replacing the former groupby.min + two-sided hash join +
    global-distinct chain (three exchanges and two schema-stabilizing
    materializes, whose fixed operator cost dominated at gate scale and
    whose join traffic is strictly larger at any scale).  Pairs are
    deduped within each block; a pair may still repeat ACROSS bands
    (bounded by ``bands`` repeats).  Every consumer is
    edge-multiplicity-invariant: connected-components labels, keep-flag
    minima, and Jaccard-verified drop sets are identical under repeated
    edges.  Returns a Dataset of (a, b); stays distributed end to end.

    Datasets whose captured DataContext is NOT hash-shuffle (key-based
    repartition validates against the snapshot taken when the lineage
    root was built — see exchange.py module docstring) take the
    groupby-min + distinct route instead; both routes yield the same
    pair SET."""
    from ray.data.context import ShuffleStrategy

    num_partitions = num_partitions or _default_join_partitions()
    exploded = lsh_exploded(ds, num_perm, bands, shingle_n)

    if ds.context.shuffle_strategy != ShuffleStrategy.HASH_SHUFFLE:
        minima = (exploded
                  .groupby(["band_id", "band_hash"],
                           num_partitions=num_partitions).min("doc_id")
                  .map_batches(lambda t: t.rename_columns(
                      [("bucket_min" if c == "min(doc_id)" else c)
                       for c in t.column_names]),
                      batch_format="pyarrow"))
        joined = exploded.join(
            _schema_stable(minima, num_partitions)[0], join_type="inner",
            num_partitions=num_partitions, on=("band_id", "band_hash"))

        def jpairs(t: pa.Table) -> pa.Table:
            t = t.filter(pc.not_equal(t["doc_id"], t["bucket_min"]))
            return pa.table({"a": t["bucket_min"].combine_chunks(),
                             "b": t["doc_id"].combine_chunks()})

        dpairs = joined.map_batches(jpairs, batch_format="pyarrow") \
            .groupby(["a", "b"], num_partitions=num_partitions).count()
        return dpairs.map_batches(lambda t: t.select(["a", "b"]),
                                  batch_format="pyarrow")

    def pairs(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        id_type = t["doc_id"].type
        empty = pa.table({"a": pa.array([], id_type),
                          "b": pa.array([], id_type)})
        if t.num_rows == 0:
            return empty
        band = t["band_id"].to_numpy(zero_copy_only=False)
        bh = t["band_hash"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bh, band))
        band, bh, ids = band[order], bh[order], ids[order]
        # bucket run starts; every row's bucket-min = first id of its run
        new = np.empty(len(ids), dtype=bool)
        new[0] = True
        new[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
        mins = ids[np.maximum.accumulate(
            np.where(new, np.arange(len(ids)), 0))]
        keep = ids != mins
        if not keep.any():
            return empty
        mat = np.stack([mins[keep], ids[keep]], axis=1)
        if mat.dtype != object:        # block-local dedupe (numeric ids)
            mat = np.unique(mat, axis=0)
        return pa.table({"a": pa.array(mat[:, 0], id_type),
                         "b": pa.array(mat[:, 1], id_type)})

    return (exploded
            .repartition(num_partitions, keys=["band_id", "band_hash"])
            .map_batches(pairs, batch_format="pyarrow", batch_size=None))


# ----------------------------------------- duplicate-cluster components --

#: Edge-count bound under which connected_components pulls the edge
#: LIST (two int64 columns — never document payloads) to the driver and
#: solves components locally, broadcasting only the node->cluster map
#: back out.  Same engine pattern as broadcast-vs-shuffle join
#: selection: the count is KNOWN (edges are materialized either way),
#: the driver pull is bounded at ~16 B/edge (80 MB at the default), and
#: the alternative is >=2 distributed join+groupby rounds whose fixed
#: cost dwarfs graphs this small.  Candidate graphs from near-dup LSH
#: are far sparser than the corpus, so this is the common case even at
#: large corpus scale; bigger graphs take the distributed path below.
CC_BROADCAST_EDGE_LIMIT = int(os.environ.get(
    "LT_CC_BROADCAST_EDGES", 5_000_000))


def _cc_local_labels(ea: np.ndarray, eb: np.ndarray, nodes: np.ndarray):
    """Min-label propagation with pointer jumping over a COMPACTED edge
    list (``ea``/``eb`` index into sorted ``nodes``).  Labels only
    decrease, so it reaches the fixpoint where every node holds the
    minimum node INDEX of its component — which is the minimum node id,
    since ``nodes`` is sorted.  O((E+N) log diameter)."""
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        old = lab.copy()
        m = np.minimum(lab[ea], lab[eb])
        np.minimum.at(lab, ea, m)
        np.minimum.at(lab, eb, m)
        lab = np.minimum(lab, lab[lab])          # pointer jump
        if np.array_equal(old, lab):
            return nodes[lab]


def _cc_solve(pairs_mat):
    """Pull a bounded materialized (a, b) edge table to the driver and
    return (sorted graph nodes, cluster id per node)."""
    import ray

    tabs = [t for t in ray.get(pairs_mat.to_arrow_refs()) if t.num_rows]
    if not tabs:
        e = np.array([], np.int64)
        return e, e
    t = pa.concat_tables(tabs).combine_chunks()
    a = t["a"].to_numpy(zero_copy_only=False)
    b = t["b"].to_numpy(zero_copy_only=False)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    return nodes, _cc_local_labels(inv[:len(a)], inv[len(a):], nodes)


def _cc_lookup(ns: np.ndarray, cl: np.ndarray, ids: np.ndarray):
    """cluster_id per id: map lookup via searchsorted; ids absent from
    the graph are their own singleton cluster."""
    out = ids.copy()
    if len(ns):
        pos = np.searchsorted(ns, ids).clip(max=len(ns) - 1)
        hit = ns[pos] == ids
        out[hit] = cl[pos[hit]]
    return out


def _cc_broadcast(pairs_mat, all_ids):
    """Small-graph path: edge list -> driver union-find -> ray.put the
    (sorted nodes, cluster id) pair -> one stateless map over all_ids
    (vectorized searchsorted; ids absent from the graph label
    themselves).  No joins, no per-round barriers."""
    import ray

    ref = ray.put(_cc_solve(pairs_mat))

    def label(tb: pa.Table) -> pa.Table:
        ns, cl = ray.get(ref)                    # zero-copy plasma read
        ids_col = tb["doc_id"]
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        ids = ids_col.to_numpy(zero_copy_only=False)
        out = _cc_lookup(ns, cl, ids)
        return pa.table({"doc_id": ids_col,
                         "cluster_id": pa.array(out, ids_col.type)})

    return all_ids.map_batches(label, batch_format="pyarrow")


def connected_components(pairs, all_ids, num_partitions: int | None = None,
                         max_iter: int = 64):
    """Connected components of the undirected pair graph.

    Small graphs (edge count <= CC_BROADCAST_EDGE_LIMIT, known because
    the edges are materialized first either way) solve on the driver
    and broadcast the node->cluster map — see _cc_broadcast.

    Large graphs run distributed hash-min label propagation: label(x)
    starts as x; each round every node takes the min of its own label
    and its neighbors' labels (one hash join edges⋈labels + one
    groupby-min), until the global label sum stops changing.  Labels
    only ever DECREASE, so the sum is a monotone convergence witness
    costing one tiny aggregate per round — no distributed old-vs-new
    diff.

    Rounds = graph diameter.  LSH candidate graphs are unions of
    bucket STARS (member—bucket-min edges), so the diameter is the
    number of overlapping stars on a chain — small in practice; the
    ``max_iter`` guard raises loudly rather than spin.  Per round the
    payload is |edges| + |nodes| rows of two int64s: nothing driver-side
    ever holds ids.

    ``pairs``: Dataset (a, b).  ``all_ids``: Dataset with ``doc_id``
    (isolated docs become their own singleton cluster).  Returns a
    Dataset (doc_id, cluster_id) with cluster_id = min doc_id of the
    component."""
    P = num_partitions or _default_join_partitions()

    pairs_mat, n_pairs = _schema_stable(pairs, P)
    if n_pairs <= CC_BROADCAST_EDGE_LIMIT:
        return _cc_broadcast(pairs_mat, all_ids)

    def und(t: pa.Table) -> pa.Table:
        return pa.concat_tables([
            pa.table({"node": t["a"], "dst": t["b"]}),
            pa.table({"node": t["b"], "dst": t["a"]}),
        ]).combine_chunks()

    edges, n_edges = _schema_stable(
        pairs_mat.map_batches(und, batch_format="pyarrow"), P)

    def init(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({"node": ids, "label": ids})

    labels, _ = _schema_stable(
        all_ids.map_batches(init, batch_format="pyarrow"), P)
    total = labels.sum("label")

    def relabel(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["dst"], "label": t["label"]})

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["node", "label"])

    for _ in range(max_iter):
        if n_edges == 0:
            break
        msg = (edges.join(labels, join_type="inner", num_partitions=P,
                          on=("node",))
               .map_batches(relabel, batch_format="pyarrow"))
        labels, _ = _schema_stable(
            labels.union(msg).groupby("node", num_partitions=P).min("label")
            .map_batches(rename, batch_format="pyarrow"), P)
        new_total = labels.sum("label")
        if new_total == total:
            break
        total = new_total
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iter} rounds")

    def out(t: pa.Table) -> pa.Table:
        return t.rename_columns(["doc_id", "cluster_id"])

    return labels.map_batches(out, batch_format="pyarrow")


def minhash_dup_clusters(ds, num_perm: int = 64, bands: int = 16,
                         shingle_n: int = 3,
                         num_partitions: int | None = None, ids_ds=None):
    """Near-duplicate CLUSTER labels for every document: connected
    components over the minhash-LSH candidate-pair graph.  Extends
    keep-earliest dedup (which only marks survivors) with the full
    cluster structure a curation pipeline needs — pick-best-per-cluster,
    cluster-size caps, dedup audit trails.

    ``ids_ds``: optional doc_id-only Dataset for the final labeling
    pass.  Pass a column-pruned read of the same table so labeling
    every doc doesn't re-execute the text-bearing read lineage that the
    signature stage needs (parquet reads only the id column)."""
    ids = ids_ds if ids_ds is not None else ds.map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow")
    pairs = minhash_lsh_candidates(ds, num_perm, bands, shingle_n,
                                   num_partitions)
    return connected_components(pairs, ids, num_partitions)


def cluster_representatives(ds, num_perm: int = 64, bands: int = 16,
                            shingle_n: int = 3,
                            num_partitions: int | None = None, ids_ds=None):
    """Keep-BEST dedup: one representative per near-dup cluster — the
    longest doc (chars), ties to the smallest doc_id — plus the cluster
    size.  Composition showcase: minhash_dup_clusters ⋈ doc lengths,
    then ONE keyed exchange on cluster_id and a per-block pick that is
    a single lexsort + boundary take (blocks hold complete clusters, so
    no per-group Python and no second pass).

    Emits (cluster_id, doc_id, n_chars, cluster_size).

    CONTRACT (same as exchange.grouped_apply): build the input ``ds``
    and call this inside ``exchange.hash_shuffle_ctx()`` — the keyed
    repartition validates against the DataContext captured when the
    SOURCE dataset was created, so the read itself must sit inside the
    ctx."""
    P = num_partitions or _default_join_partitions()
    pairs_mat, n_pairs = _schema_stable(
        minhash_lsh_candidates(ds, num_perm, bands, shingle_n, P), P)

    if n_pairs <= CC_BROADCAST_EDGE_LIMIT:
        # Small candidate graph: solve components on the driver (same
        # bound as connected_components) and fuse labeling + length
        # extraction into ONE stateless map over the documents — the
        # clusters⋈lengths join and its schema-stabilizing materialize
        # disappear; only the keyed exchange on cluster_id remains.
        import ray

        ref = ray.put(_cc_solve(pairs_mat))

        def label_len(t: pa.Table) -> pa.Table:
            ns, cl = ray.get(ref)
            t = t.combine_chunks()
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            return pa.table({
                "doc_id": t["doc_id"],
                "cluster_id": pa.array(_cc_lookup(ns, cl, ids),
                                       pa.int64()),
                "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            })

        joined = ds.map_batches(label_len, batch_format="pyarrow")
    else:
        ids = ids_ds if ids_ds is not None else ds.map_batches(
            lambda t: t.select(["doc_id"]), batch_format="pyarrow")
        clusters = connected_components(pairs_mat, ids, P)

        def meta(t: pa.Table) -> pa.Table:
            return pa.table({"doc_id": t["doc_id"],
                             "n_chars": pc.cast(pc.utf8_length(t["text"]),
                                                pa.int64())})

        lens, _ = _schema_stable(
            ds.map_batches(meta, batch_format="pyarrow"), P)
        joined = clusters.join(lens, join_type="inner", num_partitions=P,
                               on=("doc_id",))

    def pick(t: pa.Table) -> pa.Table:
        empty = pa.table({"cluster_id": pa.array([], pa.int64()),
                          "doc_id": pa.array([], pa.int64()),
                          "n_chars": pa.array([], pa.int64()),
                          "cluster_size": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.combine_chunks()
        cl = t["cluster_id"].to_numpy(zero_copy_only=False)
        nc = t["n_chars"].to_numpy(zero_copy_only=False)
        di = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((di, -nc, cl))
        cls = cl[order]
        first = np.ones(cls.size, bool)
        first[1:] = cls[1:] != cls[:-1]
        starts = np.flatnonzero(first)
        sizes = np.diff(np.append(starts, cls.size))
        idx = order[starts]
        return pa.table({"cluster_id": pa.array(cl[idx], pa.int64()),
                         "doc_id": pa.array(di[idx], pa.int64()),
                         "n_chars": pa.array(nc[idx], pa.int64()),
                         "cluster_size": pa.array(sizes, pa.int64())})

    return (joined.repartition(P, keys=["cluster_id"])
            .map_batches(pick, batch_format="pyarrow", batch_size=None))


# ---------------------------------------------------------------- simhash --

class SimHasher:
    """Stateful batch callable: 64-bit simhash over word unigram hashes,
    vectorized across the whole batch (flat word hashes -> per-bit +/-1
    sums via ``np.add.reduceat`` per doc -> sign-packed)."""

    _BITPOS = np.arange(64, dtype=np.uint64)

    def __init__(self, mask_bits: int = 0):
        # mask_bits low bits zeroed -> coarser buckets (near-dup radius)
        self.mask = np.uint64(~((1 << mask_bits) - 1) & 0xFFFFFFFFFFFFFFFF)

    def simhashes(self, texts) -> np.ndarray:
        W, wc = word_hashes(texts)
        if W.size == 0:
            return np.zeros(len(texts), dtype=np.uint64)
        bits = ((W[:, None] >> self._BITPOS[None, :]) & np.uint64(1)).astype(np.int32)
        pm = 2 * bits - 1                          # (total_words, 64) of +/-1
        off = np.concatenate([[0], np.cumsum(wc)[:-1]])
        # reduceat needs strictly valid segment starts: empty docs would
        # alias the next doc's row — compute on non-empty docs, scatter
        nz = wc > 0
        sums = np.add.reduceat(pm, off[nz].astype(np.int64), axis=0)
        sh_nz = ((sums > 0).astype(np.uint64)
                 << self._BITPOS[None, :]).sum(axis=1, dtype=np.uint64)
        out = np.zeros(len(texts), dtype=np.uint64)
        out[nz] = sh_nz
        return out & self.mask

    def simhash(self, text: str) -> int:
        return int(self.simhashes([text])[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self.simhashes(batch["text"])
        return pa.Table.from_arrays(
            [batch["doc_id"].combine_chunks() if isinstance(batch["doc_id"], pa.ChunkedArray)
             else batch["doc_id"],
             pa.array(out.astype(np.int64), pa.int64())],  # signed: shuffle-safe keys
            names=["doc_id", "simhash"])


def simhash_dedup(ds, mask_bits: int = 4):
    """Survivors (min id) per masked-simhash bucket — vectorized min
    aggregation (no per-group Python; see exact_dedup)."""

    def fn(t: pa.Table) -> pa.Table:
        return process_cached(SimHasher, mask_bits=mask_bits)(t)

    sh = ds.map_batches(fn, batch_format="pyarrow")
    agg = sh.groupby("simhash").min("doc_id")

    def project(t: pa.Table) -> pa.Table:
        return t.select(["min(doc_id)"]).rename_columns(["doc_id"])

    return agg.map_batches(project, batch_format="pyarrow")


# ------------------------------------------------------- n-gram Jaccard ----

def ngram_set(text: str, n: int = 3) -> set:
    """Scalar reference of the batch gram kernel (one doc -> its gram
    STRING set).  Normalization delegates to the engine's CANONICAL
    ``split_words`` (Arrow utf8_lower + utf8_split_whitespace) — the
    same kernels every vectorized text operator uses — so the oracle
    side-table builder and the decontamination reference can never
    diverge from the batch path on unicode edge cases where utf8proc's
    simple case mapping differs from Python ``str.lower`` (e.g. 'İ' ->
    'i' vs 'i̇').  The WINDOWING/set construction here stays independent
    scalar Python, which is what the kernel-equivalence tests pin."""
    words = split_words(pa.array([text], pa.string()))[0].to_pylist()
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i:i + n]) for i in range(len(words) - n + 1)}


def gram_hash_lists(ds, n: int = 3, text_col: str = "text",
                    id_col: str = "doc_id"):
    """documents -> (id, grams) Dataset where ``grams`` is the SORTED,
    de-duplicated uint64 n-gram hash set of the doc (list<uint64>).  A
    per-batch transform — the gram sets never touch the driver."""

    def fn(t: pa.Table) -> pa.Table:
        gids = t[id_col].combine_chunks() if isinstance(t[id_col], pa.ChunkedArray) \
            else t[id_col]
        h, g_doc, n_docs = gram_hash_flat(t[text_col], n)
        uh, cnt = unique_grams_per_doc(h, g_doc, n_docs)
        # packed as BINARY (native-endian uint64 bytes), not list<uint64>:
        # Ray's hash join rejects list-typed payload columns, binary flows
        # through — and unpacks zero-copy via a buffer view.  Offsets are
        # int32 (pa.binary contract): 8 bytes/gram keeps a batch far from
        # the 2 GiB edge, asserted anyway.
        byte_off = np.concatenate([[0], np.cumsum(cnt)]) * 8
        assert byte_off[-1] < (1 << 31), "gram payload overflows int32 offsets"
        packed = pa.Array.from_buffers(
            pa.binary(), n_docs,
            [None, pa.py_buffer(byte_off.astype(np.int32).tobytes()),
             pa.py_buffer(uh.tobytes())])
        return pa.Table.from_arrays([gids, packed], names=[id_col, "grams"])

    return ds.map_batches(fn, batch_format="pyarrow")


def _packed_u64_values(col) -> tuple[np.ndarray, np.ndarray]:
    """binary column of packed uint64 runs -> (per-row counts, flat values).
    Zero-copy: the value plane is VIEWED as uint64 (every row length is a
    multiple of 8, so 8-alignment is preserved under slicing)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int32)[
        arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, np.uint8)
    flat = data[off[0]:off[-1]]
    try:
        vals = flat.view(np.uint64)
    except ValueError:               # misaligned slice: pay one copy
        vals = flat.copy().view(np.uint64)
    return np.diff(off) // 8, vals


def _jaccard_batch(t: pa.Table) -> pa.Table:
    """(a, b, grams_a, grams_b) rows -> + jaccard, fully vectorized.

    Each gram list is sorted and unique, so |A ∩ B| for a pair is the
    number of values appearing twice in the merged multiset — counted
    with ONE global lexsort over (row, value) and an adjacent-equality
    scan.  No per-pair Python."""
    nrows = t.num_rows
    la, va = _packed_u64_values(t["grams_a"])
    lb, vb = _packed_u64_values(t["grams_b"])
    rows = np.concatenate([np.repeat(np.arange(nrows), la),
                           np.repeat(np.arange(nrows), lb)])
    vals = np.concatenate([va, vb])
    order = np.lexsort((vals, rows))
    r, v = rows[order], vals[order]
    dup = np.zeros(0, dtype=bool) if r.size == 0 else \
        (r[1:] == r[:-1]) & (v[1:] == v[:-1])
    inter = np.bincount(r[1:][dup], minlength=nrows).astype(np.int64) \
        if r.size else np.zeros(nrows, dtype=np.int64)
    denom = la + lb - inter
    with np.errstate(invalid="ignore"):
        jac = np.where(denom > 0, inter / np.maximum(denom, 1), 0.0)
    return (t.select(["a", "b"])
             .append_column("jaccard", pa.array(jac, pa.float64())))


def _pairs_with_grams(pairs_ds, grams_ds, id_col: str, num_partitions: int):
    """Attach each pair's gram lists via two distributed hash joins.
    Every join input is compacted (_schema_stable): grams come from a
    join output and pairs from an aggregation, both of which can carry
    empty blocks that break Ray's join-schema broadcast."""
    def ren(name):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns([name, f"grams_{name}"])
        return fn

    grams_ds, _ = _schema_stable(grams_ds, num_partitions)
    ga = grams_ds.map_batches(ren("a"), batch_format="pyarrow")
    gb = grams_ds.map_batches(ren("b"), batch_format="pyarrow")
    j = pairs_ds.join(ga, join_type="inner", num_partitions=num_partitions,
                      on=("a",))
    j, _ = _schema_stable(j, num_partitions)
    return j.join(gb, join_type="inner", num_partitions=num_partitions,
                  on=("b",))


def ngram_jaccard_pairs(ds, candidate_pairs, n: int = 3,
                        text_col: str = "text", id_col: str = "doc_id"):
    """Exact Jaccard for an explicit candidate pair list (64-bit gram
    hashes; collision probability ~2^-64/pair).  Runs the same join-based
    distributed verify as the survivors path.  Returns a pandas frame
    (a, b, jaccard)."""
    import ray.data as rd
    pairs = list(candidate_pairs)
    if not pairs:
        return pd.DataFrame(columns=["a", "b", "jaccard"])
    pt = pa.Table.from_arrays(
        [pa.array([a for a, _ in pairs], pa.int64()),
         pa.array([b for _, b in pairs], pa.int64())], names=["a", "b"])
    np_part = _default_join_partitions()
    grams = gram_hash_lists(ds, n, text_col, id_col)
    verified = _pairs_with_grams(rd.from_arrow(pt), grams, id_col, np_part) \
        .map_batches(_jaccard_batch, batch_format="pyarrow")
    return (verified.to_pandas().sort_values(["a", "b"])
            .reset_index(drop=True))


def ngram_jaccard_dedup_survivors(ds, threshold: float = 0.8, n: int = 3,
                                  id_col: str = "doc_id", text_col: str = "text",
                                  num_partitions: int | None = None, **lsh_kw):
    """Near-dedup with exact verification, distributed END TO END:

      1. recall stage: banded-LSH candidate pairs (a Dataset),
      2. gram sets for candidate docs only (semi-join documents against
         the candidate ids — texts never shuffle, only gram hashes),
      3. two hash joins attach grams to each pair's sides; exact n-gram
         Jaccard >= threshold via the vectorized merged-sort count,
      4. survivors = documents anti-joined against the dropped ids.

    No driver-side materialization anywhere: state per task is bounded
    by its partition, not by the global near-dup count."""
    np_part = num_partitions or _default_join_partitions()
    # materialize (OBJECT STORE, not driver): three consumers below —
    # without it the whole signature+LSH chain re-executes per consumer;
    # _schema_stable doubles as that materialization.
    pairs_ds, n_pairs = _schema_stable(
        minhash_lsh_candidates(ds, shingle_n=n, num_partitions=np_part,
                               **lsh_kw), np_part)
    if n_pairs == 0:        # no candidates anywhere: every doc survives
        return ds.select_columns([id_col])

    # candidate ids (distinct) as a 1-column Dataset for the semi-join
    def a_side(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays([t["a"].combine_chunks()
                                     if isinstance(t["a"], pa.ChunkedArray)
                                     else t["a"]], names=[id_col])

    def b_side(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays([t["b"].combine_chunks()
                                     if isinstance(t["b"], pa.ChunkedArray)
                                     else t["b"]], names=[id_col])

    cand_ids, _ = _schema_stable(
        pairs_ds.map_batches(a_side, batch_format="pyarrow")
        .union(pairs_ds.map_batches(b_side, batch_format="pyarrow"))
        .groupby(id_col, num_partitions=np_part).count()
        .map_batches(lambda t: t.select([id_col]), batch_format="pyarrow"),
        np_part)
    cand_docs = ds.select_columns([id_col, text_col]).join(
        cand_ids, join_type="left_semi", num_partitions=np_part, on=(id_col,))
    grams = gram_hash_lists(cand_docs, n, text_col, id_col)

    verified = _pairs_with_grams(pairs_ds, grams, id_col, np_part) \
        .map_batches(_jaccard_batch, batch_format="pyarrow")
    dropped, n_dropped = _schema_stable(
        verified.map_batches(
            lambda t: pa.Table.from_arrays(
                [t.filter(pc.greater_equal(t["jaccard"], threshold))["b"]
                 .combine_chunks()], names=[id_col]),
            batch_format="pyarrow"),
        np_part)
    if n_dropped == 0:
        return ds.select_columns([id_col])
    return ds.select_columns([id_col]).join(
        dropped, join_type="left_anti", num_partitions=np_part, on=(id_col,))


# ------------------------------------------------ oracle side tables ------

def write_signature_side_tables(documents_path: str, out_dir: str,
                                num_perm: int = 64, bands: int = 16,
                                shingle_n: int = 3, mask_bits: int = 4,
                                gram_n: int = 3) -> str:
    """Deterministic signature side tables for the DuckDB replay oracles
    (the doc_fingerprint pattern: the SIGNATURES come from this module's
    own vectorized kernels, the DROP RULE is replayed independently in
    SQL over them):

        minhash_bands.parquet  (doc_id, band_id, band_hash)
        simhash.parquet        (doc_id, simhash)
        grams.parquet          (doc_id, gram_hash)  -- distinct n-gram hashes

    Driver-side and loop-free where it matters (MinHasher/SimHasher are
    the batch kernels); sized for the correctness gate (sf0.01), not for
    production — the operators themselves never touch these files."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    bp = os.path.join(out_dir, "minhash_bands.parquet")
    sp = os.path.join(out_dir, "simhash.parquet")
    gp = os.path.join(out_dir, "grams.parquet")
    # Content-keyed reuse: regenerate whenever the signature kernels'
    # source or the parameters change (stale side tables across runs
    # would silently feed the replay oracles wrong signatures).
    import logtrics_ray.functions.dedup as _self
    from logtrics_ray import hashing as H
    tag = (f"{H.source_version(_self, H)}:{documents_path}:{num_perm}:"
           f"{bands}:{shingle_n}:{mask_bits}:{gram_n}")
    marker = os.path.join(out_dir, "_DONE")
    if (all(os.path.isfile(p) for p in (bp, sp, gp))
            and os.path.exists(marker)
            and open(marker).read().strip() == tag):
        return out_dir
    t = pq.read_table(documents_path, columns=["doc_id", "text"])
    texts = t["text"].to_pylist()
    ids = t["doc_id"].to_numpy().astype(np.int64)

    sig = MinHasher(num_perm=num_perm, shingle_n=shingle_n).signatures(texts)
    rpb = num_perm // bands
    n = len(texts)
    band_id = np.repeat(np.arange(bands, dtype=np.int64), n)
    band_hash = np.concatenate([
        hash64_words(sig[:, b * rpb:(b + 1) * rpb], seed=b).astype(np.int64)
        for b in range(bands)]) if n else np.empty(0, np.int64)
    pq.write_table(pa.table({"doc_id": np.tile(ids, bands),
                             "band_id": band_id, "band_hash": band_hash}), bp)

    sh = SimHasher(mask_bits=mask_bits).simhashes(texts).astype(np.int64)
    pq.write_table(pa.table({"doc_id": ids, "simhash": sh}), sp)

    g_doc, g_hash = [np.empty(0, np.int64)], [np.empty(0, np.int64)]
    for i, s in zip(ids, texts):
        g = (np.unique(hash64_array(sorted(ngram_set(s, gram_n))))
             if s else np.empty(0, np.uint64))
        g_doc.append(np.full(g.size, i, dtype=np.int64))
        g_hash.append(g.astype(np.int64))
    pq.write_table(pa.table({"doc_id": np.concatenate(g_doc),
                             "gram_hash": np.concatenate(g_hash)}), gp)
    with open(marker, "w") as f:
        f.write(tag)
    return out_dir


# ----------------------------------------------- benchmark decontamination --

def benchmark_gram_hashes(texts, n: int = 8) -> np.ndarray:
    """Sorted unique uint64 word-n-gram hash set of a benchmark/eval
    corpus.  Driver-side by design: an eval set is small by definition
    (thousands of prompts), and the result is broadcast once."""
    h, _, _ = gram_hash_flat(pa.array([s for s in texts if s], pa.string()), n)
    return np.unique(h)


def benchmark_gram_hashes_ds(bench_ds, n: int = 8,
                             text_col: str = "text") -> np.ndarray:
    """Distributed benchmark gram-set build: one ``map_batches`` pass
    emits each batch's DISTINCT gram hashes as narrow int64 rows and
    the driver unions them — the driver pull is bounded by the gram-set
    size (times a small per-batch duplicate factor), never by corpus
    bytes.  Same sorted-unique uint64 set as ``benchmark_gram_hashes``
    over the same texts (union is order-free)."""

    def fn(t: pa.Table) -> pa.Table:
        h, _, _ = gram_hash_flat(t[text_col], n)
        u = np.unique(h)
        return pa.table({"gram_hash": pa.array(u.astype(np.int64),
                                               pa.int64())})

    parts = (bench_ds.select_columns([text_col])
             .map_batches(fn, batch_format="pyarrow"))
    chunks = [b["gram_hash"] for b in parts.iter_batches(
        batch_format="numpy", batch_size=None)]
    if not chunks:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(chunks)).astype(np.uint64)


def decontaminate(ds, benchmark_texts=None, n: int = 8,
                  text_col: str = "text", id_col: str = "doc_id",
                  benchmark_grams: np.ndarray | None = None):
    """Benchmark decontamination: per document, how many of its distinct
    word ``n``-grams appear in the benchmark set, and a contamination
    flag (>=1 shared gram) — the standard train/eval overlap check a
    training-data pipeline runs before mixing.

    Returns a Dataset of ``(id_col, n_hits: int64, contaminated: bool)``.

    Scale shape: the benchmark gram set crosses the cluster ONCE
    (``ray.put`` broadcast; every task reads the shared-memory numpy
    array zero-copy), membership is one vectorized ``np.isin`` per
    batch against the sorted benchmark side, and there is NO shuffle —
    a stateless per-batch map over the corpus.  The reference has no
    analog; gram normalization is shared with the n-gram dedup family
    (``ngram_set``: lowercase, whitespace split, ``" "``-joined
    n-grams; docs shorter than ``n`` words contribute their whole text
    as one gram).

    The benchmark side is either raw ``benchmark_texts`` (hashed on the
    driver — fine for true eval sets) or a precomputed sorted-unique
    ``benchmark_grams`` uint64 array (e.g. from
    ``benchmark_gram_hashes_ds`` when the benchmark is carved out of a
    large corpus and must not be materialized as text)."""
    import ray

    if benchmark_grams is not None:
        bench = np.sort(np.asarray(benchmark_grams, dtype=np.uint64))
    else:
        bench = np.sort(benchmark_gram_hashes(benchmark_texts, n))
    ref = ray.put(bench)

    def fn(t: pa.Table) -> pa.Table:
        b = ray.get(ref)
        h, g_doc, n_docs = gram_hash_flat(t[text_col], n)
        uh, cnt = unique_grams_per_doc(h, g_doc, n_docs)
        rows = np.repeat(np.arange(n_docs, dtype=np.int64), cnt)
        hit = np.isin(uh, b)
        n_hits = np.bincount(rows[hit], minlength=n_docs).astype(np.int64)
        gids = t[id_col].combine_chunks() \
            if isinstance(t[id_col], pa.ChunkedArray) else t[id_col]
        return pa.Table.from_arrays(
            [gids, pa.array(n_hits, pa.int64()),
             pa.array(n_hits > 0, pa.bool_())],
            names=[id_col, "n_hits", "contaminated"])

    return ds.map_batches(fn, batch_format="pyarrow")


# ------------------------------------------------- paragraph-level dedup --

BOILER_MOD = 7          # paragraphs with doc_id % BOILER_MOD == BOILER_RES
BOILER_RES = 3          # become shared boilerplate text ...
BOILER_VARIANTS = 3     # ... in one of BOILER_VARIANTS variants


def paragraph_dedup_pages(doc_path: str, paras_per_page: int = 4,
                          num_partitions: int | None = None,
                          inject_boiler: bool = True):
    """PARAGRAPH-LEVEL exact dedup with page reassembly — the
    CCNet/RefinedWeb boilerplate-removal shape: drop every repeated
    paragraph except its first occurrence in global order, then rebuild
    each page's text from its surviving paragraphs.

    The synthetic corpus has no intra-document paragraph breaks, so
    pages are COMPOSED deterministically from the document table itself
    (page = ``paras_per_page`` consecutive doc_ids, paragraph order =
    doc_id within the page — rule shared literally with the SQL oracle,
    the scrub_pii fixture pattern); the OPERATOR under test is the
    distributed keep-first + reassembly.  The corpus also has no exact
    duplicate texts, so with ``inject_boiler`` every paragraph with
    doc_id % BOILER_MOD == BOILER_RES is rewritten to one of
    BOILER_VARIANTS shared "cookie-banner" strings BEFORE dedup — the
    realistic repeated-boilerplate load, rule shared literally with the
    SQL oracle.

    Scale shape: the keep decision shuffles only (content_hash, doc_id)
    pairs (built-in groupby.min, the exact_dedup kernel); paragraph text
    crosses two keyed exchanges — the flag hash-join and the page
    groupby, both inherent to "reassemble pages from globally-deduped
    paragraphs".  Reassembly is bucket-major: one map_groups call per
    page bucket, pages joined vectorized via offsets + pc.binary_join —
    never per-page Python.  The keep rule compares 64-bit content
    hashes where the SQL compares full text (the dedup_exact contract:
    collision-free on any real corpus slice, and any collision shows up
    as an oracle mismatch, never silently).

    Output: (page_id, n_paras, n_kept, text) — text joined by blank
    lines from surviving paragraphs in idx order ('' if none survive).
    """
    from logtrics_ray.sources.parquet import read_parquet_clean

    PP = int(paras_per_page)
    NB = 64                                      # reassembly buckets
    num_partitions = num_partitions or _default_join_partitions()

    def tag(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        para = t["text"]
        if inject_boiler and t.num_rows:
            m = d % BOILER_MOD == BOILER_RES
            if m.any():
                variants = np.array(
                    [f"boilerplate cookie banner variant {v}"
                     for v in range(BOILER_VARIANTS)], dtype=object)
                txt = para.to_numpy(zero_copy_only=False).copy()
                txt[m] = variants[d[m] % BOILER_VARIANTS]
                para = pa.array(txt, pa.string())
        h = hash64_array(para).astype(np.int64)
        return pa.Table.from_arrays([
            pa.array(d // PP, pa.int64()),
            pa.array(d % PP, pa.int64()),
            pa.array(d, pa.int64()),
            pa.array(h, pa.int64()),
            para,
        ], names=["page_id", "idx", "doc_id", "content_hash", "para"])

    ds = read_parquet_clean(doc_path, columns=["doc_id", "text"]) \
        .map_batches(tag, batch_format="pyarrow")

    minima, n_min = _schema_stable(
        ds.select_columns(["content_hash", "doc_id"])
          .groupby("content_hash").min("doc_id"),
        num_partitions)

    def out_table(t: pa.Table, keep: np.ndarray) -> pa.Table:
        pg = t["page_id"].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays([
            t["page_id"], t["idx"], t["para"],
            pa.array(keep, pa.bool_()),
            pa.array(pg % NB, pa.int64()),
        ], names=["page_id", "idx", "para", "keep", "_pg_bucket"])

    if n_min <= CC_BROADCAST_EDGE_LIMIT:
        # Bounded broadcast instead of a TEXT-bearing hash join: the
        # minima row count is already known, the pull is (hash, min)
        # int64 pairs only, and the keep flag becomes a vectorized
        # searchsorted inside the same map that bucketizes — paragraph
        # text crosses ONE exchange (the page groupby) instead of two.
        import ray
        tabs = [t for t in ray.get(minima.to_arrow_refs()) if t.num_rows]
        if tabs:
            mt = pa.concat_tables(tabs).combine_chunks()
            hs = mt["content_hash"].to_numpy(zero_copy_only=False)
            mn = mt["min(doc_id)"].to_numpy(zero_copy_only=False)
            o = np.argsort(hs)
            hs, mn = np.ascontiguousarray(hs[o]), np.ascontiguousarray(mn[o])
        else:
            hs = mn = np.array([], np.int64)
        ref = ray.put((hs, mn))

        def bucketize(t: pa.Table) -> pa.Table:
            hsv, mnv = ray.get(ref)          # zero-copy plasma read
            t = t.combine_chunks()
            if t.num_rows == 0 or not len(hsv):
                keep = np.ones(t.num_rows, dtype=bool)
            else:
                h = t["content_hash"].to_numpy(zero_copy_only=False)
                pos = np.searchsorted(hsv, h).clip(max=len(hsv) - 1)
                # every paragraph's hash is in minima (its own group)
                keep = t["doc_id"].to_numpy(zero_copy_only=False) \
                    == mnv[pos]
            return out_table(t, keep)

        flagged = ds
    else:
        flagged = ds.join(minima, join_type="inner",
                          num_partitions=num_partitions,
                          on=("content_hash",), right_on=("content_hash",))

        def bucketize(t: pa.Table) -> pa.Table:
            t = t.combine_chunks()
            keep = (t["doc_id"].to_numpy(zero_copy_only=False)
                    == t["min(doc_id)"].to_numpy(zero_copy_only=False))
            return out_table(t, keep)

    def assemble(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        pg = g["page_id"].to_numpy(zero_copy_only=False)
        ix = g["idx"].to_numpy(zero_copy_only=False)
        keep = g["keep"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ix, pg))
        pg_s, keep_s = pg[order], keep[order]
        starts = np.flatnonzero(np.diff(pg_s, prepend=pg_s[0] - 1))
        bounds = np.append(starts, pg_s.size)
        n_paras = np.diff(bounds)
        # kept rows only, page-ordered; list offsets via cumsum of
        # per-page kept counts, then ONE vectorized binary_join
        kept_cum = np.concatenate(([0], np.cumsum(keep_s)))
        n_kept = kept_cum[bounds[1:]] - kept_cum[starts]
        if int(kept_cum[-1]) >= 1 << 31:     # ListArray offsets are int32
            raise OverflowError(
                "paragraph_dedup: a reassembly bucket holds >=2^31 kept "
                "paragraphs; raise the bucket count (NB)")
        offsets = np.concatenate(([0], np.cumsum(n_kept))).astype(np.int32)
        kept_idx = order[np.flatnonzero(keep_s)]   # original rows, page order
        paras_sorted = g["para"].take(pa.array(kept_idx, pa.int64()))
        if isinstance(paras_sorted, pa.ChunkedArray):
            paras_sorted = paras_sorted.combine_chunks()
        la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                      paras_sorted)
        joined = pc.binary_join(la, "\n\n")
        return pa.Table.from_arrays([
            pa.array(pg_s[starts], pa.int64()),
            pa.array(n_paras, pa.int64()),
            pa.array(n_kept, pa.int64()),
            joined,
        ], names=["page_id", "n_paras", "n_kept", "text"])

    return (flagged.map_batches(bucketize, batch_format="pyarrow")
            .groupby("_pg_bucket").map_groups(assemble,
                                              batch_format="pyarrow"))


def paragraph_dedup_oracle_sql(paras_per_page: int = 4) -> str:
    """DuckDB replay: same page composition + boilerplate injection,
    keep-first by min doc_id over identical paragraph TEXT (the engine
    compares 64-bit hashes — a collision breaks this match), string_agg
    reassembly in idx order."""
    PP = int(paras_per_page)
    return f"""
    WITH p AS (
      SELECT doc_id // {PP} AS page_id, doc_id % {PP} AS idx, doc_id,
             CASE WHEN doc_id % {BOILER_MOD} = {BOILER_RES}
                  THEN 'boilerplate cookie banner variant '
                       || (doc_id % {BOILER_VARIANTS})::VARCHAR
                  ELSE text END AS para
      FROM documents),
    f AS (SELECT para, min(doc_id) AS keeper FROM p GROUP BY 1),
    sel AS (
      SELECT p.page_id, p.idx, p.para, (p.doc_id = f.keeper) AS keep
      FROM p JOIN f USING (para))
    SELECT page_id, count(*)::BIGINT AS n_paras,
           count(*) FILTER (keep)::BIGINT AS n_kept,
           COALESCE(string_agg(para, chr(10) || chr(10) ORDER BY idx)
                      FILTER (keep), '') AS text
    FROM sel GROUP BY 1"""
