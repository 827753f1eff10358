"""Deterministic hashing used across engine, fixtures and test oracle.

Single source of truth: any hash that affects semantics (event-time
synthesis, salt buckets, series output buckets) lives here and is
imported by both the distributed engine and the single-process oracle,
so "bit-for-bit vs oracle" is well-defined.
"""

from __future__ import annotations

import hashlib

import numpy as np


def hash64(s: str | bytes) -> int:
    """Stable 64-bit hash of a string (blake2b, 8-byte digest, little-endian)."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "little")


def hash64_array(strings) -> np.ndarray:
    """Vectorized-ish hash64 over an iterable of strings -> uint64 ndarray.

    blake2b is C-level per call; the Python loop is fine at batch size
    (a few thousand rows) inside a map_batches stage.
    """
    b2 = hashlib.blake2b
    out = np.fromiter(
        (int.from_bytes(b2(s.encode("utf-8"), digest_size=8).digest(), "little") for s in strings),
        dtype=np.uint64,
        count=len(strings),
    )
    return out


def ts_for_doc_ids(doc_ids, epoch0_ms: int, horizon_ms: int) -> np.ndarray:
    """Synthesize event-time for the token table (input has no timestamp).

    ts_ms = epoch0 + hash64(doc_id) % horizon.  Reproducible across runs,
    block layouts and parallelism levels — the deterministic stand-in for
    the reference's wall-clock arrival time
    (/root/reference/graphite/graphite.go:84-90 flush ticker).
    """
    h = hash64_array(doc_ids)
    return (np.int64(epoch0_ms) + (h % np.uint64(horizon_ms)).astype(np.int64)).astype(np.int64)


def salt_of(tiebreak: np.ndarray, salt_buckets: int) -> np.ndarray:
    """Deterministic salt bucket per point from its uint64 tiebreak key."""
    return (tiebreak % np.uint64(salt_buckets)).astype(np.int64)


def series_bucket_array(series_keys, n_buckets: int) -> np.ndarray:
    """Output-partition bucket per series key (stable across runs)."""
    return (hash64_array(series_keys) % np.uint64(n_buckets)).astype(np.int64)


def series_bucket(series_key: str, n_buckets: int) -> int:
    return int(hash64(series_key) % n_buckets)
