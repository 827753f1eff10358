"""Deterministic hashing used across engine, fixtures and test oracle.

Single source of truth: any hash that affects semantics (event-time
synthesis, salt buckets, series output buckets, content hashes) lives
here and is imported by both the distributed engine and the
single-process oracle, so "bit-for-bit vs oracle" is well-defined.

Two hash functions, chosen by where the cost lands:

* ``hash64`` / ``hash64_array`` — blake2b (8-byte digest).  Per-call C
  cost dominates for LONG strings (document texts, shingles): ~1 GB/s,
  the right tool for content hashing in the dedup operators.
* ``id_hash64`` / ``id_hash64_array`` — a murmur3-style word mix
  (multiply/rotate per 8-byte word + the public-domain MurmurHash3
  ``fmix64`` finalizer), evaluated fully vectorized with numpy straight
  off the Arrow string buffers.  For SHORT id-like strings (doc_id,
  series_key) this removes the Python-per-row loop from the extraction
  hot path (~4x faster than the blake2b loop on 16-byte ids).  The value
  is invariant to batching: each row mixes exactly its own words.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_C1 = np.uint64(0x87C37B91114253D5)
_C2 = np.uint64(0x4CF5AD432745937F)
_SEED = np.uint64(0x9368B1C0A1F2E3D4)
_F1 = np.uint64(0xFF51AFD7ED558CCD)
_F2 = np.uint64(0xC4CEB9FE1A85EC53)
_U64 = np.uint64


# ---------------------------------------------------------- content hash --

def hash64(s: str | bytes) -> int:
    """Stable 64-bit content hash (blake2b, 8-byte digest, little-endian)."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "little")


def hash64_array(strings) -> np.ndarray:
    """hash64 over an iterable/Arrow array of strings -> uint64 ndarray.

    blake2b is C-level per call; right for long content strings.  For
    short per-row ids on a hot path use ``id_hash64_array``."""
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if isinstance(strings, pa.Array):
        strings = strings.to_pylist()
    b2 = hashlib.blake2b
    return np.fromiter(
        (int.from_bytes(
            b2(s.encode("utf-8") if isinstance(s, str) else s,
               digest_size=8).digest(), "little") for s in strings),
        dtype=np.uint64, count=len(strings))


# --------------------------------------------------------------- id hash --

def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = _U64(r)
    return (x << r) | (x >> (_U64(64) - r))


def _fmix64(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> _U64(33))
    h = h * _F1
    h = h ^ (h >> _U64(33))
    h = h * _F2
    return h ^ (h >> _U64(33))


def _word_matrix(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string/binary array -> (zero-padded (n, P) uint64 words,
    (n,) byte lengths).  Pure numpy over the Arrow buffers; fixed-width
    inputs (e.g. ``doc-%012d`` ids) take a reshape path with no
    per-byte index arrays."""
    n = len(arr)
    odt = (np.int64 if pa.types.is_large_string(arr.type)
           or pa.types.is_large_binary(arr.type) else np.int32)
    offs = np.frombuffer(arr.buffers()[1], dtype=odt)[
        arr.offset:arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[offs[0]:offs[-1]]
    lens = np.diff(offs)
    maxlen = int(lens.max()) if n else 0
    P = max(1, -(-maxlen // 8))
    mat = np.zeros((n, P * 8), dtype=np.uint8)
    if maxlen:
        if int(lens.min()) == maxlen:
            mat[:, :maxlen] = data.reshape(n, maxlen)   # uniform width
        else:
            total = int(data.size)
            prefix = offs[:-1] - offs[0]
            within = np.arange(total) - np.repeat(prefix, lens)
            mat[np.repeat(np.arange(n), lens), within] = data
    return mat.view("<u8").reshape(n, P), lens


def _mix_words(words: np.ndarray, nwords: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Sequential word mix; each row mixes exactly its own ceil(len/8)
    words (batch-padding columns never touched -> batch-invariant)."""
    n, P = words.shape
    wmax = int(nwords.max()) if n else 0

    def step(hh, k):
        k = k * _C1
        k = _rotl(k, 31) * _C2
        hh = hh ^ k
        return _rotl(hh, 27) * _U64(5) + _U64(0x52DCE729)

    if n and int(nwords.min()) == wmax:
        h = np.full(n, _SEED, dtype=np.uint64)
        for j in range(wmax):
            h = step(h, words[:, j])
    else:
        # variable width: rows sorted by word count DESC, so column j
        # touches the contiguous prefix h[:m] — no per-column gathers
        order = np.argsort(-nwords, kind="stable")
        ws = words[order]
        cnt = np.bincount(nwords, minlength=wmax + 1)
        m_gt = n - np.cumsum(cnt)
        hs = np.full(n, _SEED, dtype=np.uint64)
        for j in range(wmax):
            m = int(m_gt[j])
            if m == 0:
                break
            hs[:m] = step(hs[:m], ws[:m, j])
        h = np.empty(n, dtype=np.uint64)
        h[order] = hs
    return _fmix64(h ^ lens.astype(np.uint64))


def id_hash64_array(strings) -> np.ndarray:
    """Vectorized 64-bit id hash -> uint64 ndarray.  Accepts a pyarrow
    (Chunked)Array of string/binary (zero-copy, the preferred form) or
    any iterable of Python strings."""
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if not isinstance(strings, pa.Array):
        strings = pa.array(list(strings), type=pa.string())
    if len(strings) == 0:
        return np.empty(0, dtype=np.uint64)
    if pa.types.is_dictionary(strings.type):
        strings = strings.dictionary_decode()
    if strings.null_count:
        # _word_matrix reads raw buffers and would silently hash a null as
        # the empty string, giving null ids identical ts/bucket/tiebreak
        # values; fail loudly like the pre-vectorized path did on None.
        raise ValueError(
            f"id_hash64_array: {strings.null_count} null value(s) in input; "
            "ids and series keys must be non-null")
    words, lens = _word_matrix(strings)
    return _mix_words(words, -(-lens // 8), lens)


def id_hash64(s: str | bytes) -> int:
    """Scalar id_hash64_array (same function, one element)."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int(id_hash64_array(pa.array([s], type=pa.binary()))[0])


def hash64_words(words: np.ndarray, seed: int = 0) -> np.ndarray:
    """Fixed-width companion: (n, P) uint64 word matrix -> (n,) uint64
    (e.g. minhash band signatures hashed numerically, no string
    round-trip).  Same mixing core as id_hash64 over pre-formed words."""
    words = np.ascontiguousarray(words, dtype=np.uint64)
    n, P = words.shape
    h = np.full(n, _SEED ^ _U64(seed), dtype=np.uint64)
    for j in range(P):
        k = words[:, j] * _C1
        k = _rotl(k, 31) * _C2
        h = h ^ k
        h = _rotl(h, 27) * _U64(5) + _U64(0x52DCE729)
    return _fmix64(h ^ _U64(P * 8))


# ------------------------------------------------------ fixture keying --

def source_version(*modules) -> str:
    """Short content hash of the given modules' SOURCE FILES.

    Cache-key ingredient for /tmp fixtures (synth token tables, oracle
    side tables): a generated artifact is only reused when the code that
    generated it is byte-identical, so a kernel/generator change between
    runs can never feed one side of a correctness comparison stale data."""
    h = hashlib.sha256()
    for m in modules:
        path = getattr(m, "__file__", None) or str(m)
        with open(path, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:12]


def fixture_cache(paths, tag: str):
    """Content-keyed reuse check for generated /tmp fixtures.

    Returns ``(fresh, mark)``: ``fresh`` is True iff every path in
    ``paths`` exists and the sidecar ``<paths[0]>.tag`` file equals
    ``tag`` (build the tag from ``source_version(...)`` + parameters);
    call ``mark()`` after a successful regeneration.  Prevents a stale
    artifact from an older code version feeding one side of a
    correctness comparison."""
    import os
    marker = paths[0] + ".tag"
    fresh = (all(os.path.exists(p) for p in paths)
             and os.path.exists(marker)
             and open(marker).read().strip() == tag)

    def mark():
        with open(marker, "w") as f:
            f.write(tag)

    return fresh, mark


# ------------------------------------------------------- derived keying --

def ts_for_doc_ids(doc_ids, epoch0_ms: int, horizon_ms: int) -> np.ndarray:
    """Synthesize event-time for the token table (input has no timestamp).

    ts_ms = epoch0 + id_hash64(doc_id) % horizon.  Reproducible across
    runs, block layouts and parallelism levels — the deterministic
    stand-in for the reference's wall-clock arrival time
    (/root/reference/graphite/graphite.go:84-90 flush ticker).
    """
    h = id_hash64_array(doc_ids)
    return (np.int64(epoch0_ms) + (h % np.uint64(horizon_ms)).astype(np.int64)).astype(np.int64)


def salt_of(tiebreak: np.ndarray, salt_buckets: int) -> np.ndarray:
    """Deterministic salt bucket per point from its uint64 tiebreak key."""
    return (tiebreak % np.uint64(salt_buckets)).astype(np.int64)


def series_bucket_array(series_keys, n_buckets: int) -> np.ndarray:
    """Output-partition bucket per series key (stable across runs).

    Series keys are highly repetitive, so the column is dictionary-encoded
    first (C++) and only the distinct keys are hashed, then scattered back
    through the indices — O(distinct) hashing instead of O(rows)."""
    if isinstance(series_keys, pa.ChunkedArray):
        series_keys = series_keys.combine_chunks()
    if not isinstance(series_keys, pa.Array):
        series_keys = pa.array(list(series_keys), type=pa.string())
    if len(series_keys) == 0:
        return np.empty(0, dtype=np.int64)
    if not pa.types.is_dictionary(series_keys.type):
        series_keys = series_keys.dictionary_encode()
    if series_keys.null_count:
        raise ValueError(
            f"series_bucket_array: {series_keys.null_count} null series "
            "key(s); keys must be non-null")
    uniq = (id_hash64_array(series_keys.dictionary)
            % np.uint64(n_buckets)).astype(np.int64)
    return uniq[series_keys.indices.to_numpy(zero_copy_only=False)]


def series_bucket(series_key: str, n_buckets: int) -> int:
    return int(id_hash64(series_key) % n_buckets)
