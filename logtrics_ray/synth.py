"""Deterministic synthetic token-table generator (FIXTURES.md F1).

Generates the ``input_hint`` table
``(doc_id: string, tokens: list<int32>, n_tok: int32, source: string)``
with known rule-matching token subsequences spliced in at seeded
offsets, so every fixture has an exactly computable set of extraction
matches.  Seeded per (seed, shard): shards are independently
reproducible, so generation parallelizes (one Ray task per shard) and
a table of any size is a pure function of (seed, n_rows, rows_per_shard).

No wall-clock anywhere.  The reference has no fixtures at all (zero
*_test.go files); this corpus is the conformance input mandated by
BASELINE.json's north rule ("synthesise it deterministically").
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from logtrics_ray import vocab as V

SOURCES = np.array(["web", "books", "code", "wiki"])
# Zipf-ish (s=1.3) source skew.
_W = 1.0 / np.arange(1, 5) ** 1.3
SOURCE_P = _W / _W.sum()

# Per-row independent inclusion probabilities per pattern.
P_HELLO, P_LAT, P_REQ, P_BYTES, P_STATUS = 0.05, 0.30, 0.20, 0.25, 0.15
_STATUS_CODES = np.array([200, 301, 404, 500, 503])

TOKEN_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("tokens", pa.list_(pa.int32())),
    ("n_tok", pa.int32()),
    ("source", pa.string()),
])


def synth_shard(shard: int, n_rows: int, seed: int = 42, row_offset: int | None = None) -> pa.Table:
    """One shard of the token table; pure function of (seed, shard, n_rows)."""
    rng = np.random.default_rng([seed, shard])
    if row_offset is None:
        row_offset = shard * n_rows

    lens = np.clip(np.exp(rng.normal(5.0, 0.7, size=n_rows)), 8, 2048).astype(np.int64)
    src_idx = rng.choice(4, size=n_rows, p=SOURCE_P)
    inc = rng.random((n_rows, 5))
    has = inc < np.array([P_HELLO, P_LAT, P_REQ, P_BYTES, P_STATUS])

    name_tok = V.NAME_BASE + rng.integers(0, V.N_NAMES, size=n_rows)
    ep_tok = V.EP_BASE + rng.integers(0, V.N_EPS, size=n_rows)
    lat_val = rng.integers(1, 5000, size=n_rows)
    bytes_val = rng.integers(100, 100000, size=n_rows)
    status_val = _STATUS_CODES[rng.integers(0, len(_STATUS_CODES), size=n_rows)]

    # Filler ids for all rows drawn flat, sliced per row.
    total = int(lens.sum())
    filler = rng.integers(V.FILLER_BASE, V.VOCAB_SIZE, size=total, dtype=np.int32)
    offs = np.concatenate([[0], np.cumsum(lens)])

    enc = V.encode_number
    chunks: list[np.ndarray] = []
    row_lens = np.empty(n_rows, dtype=np.int32)
    for i in range(n_rows):
        base = filler[offs[i]:offs[i + 1]]
        pats: list[list[int]] = []
        if has[i, 0]:
            pats.append([1, int(name_tok[i]), 2])
        if has[i, 1]:
            pats.append([3] + enc(lat_val[i]))
        if has[i, 2]:
            pats.append([6, int(ep_tok[i])])
        if has[i, 3]:
            pats.append([5] + enc(bytes_val[i]))
        if has[i, 4]:
            pats.append([4] + enc(status_val[i]))
        if not pats:
            chunks.append(base)
            row_lens[i] = len(base)
            continue
        # Splice at seeded, sorted positions within the filler run.
        pos = np.sort(rng.integers(0, len(base) + 1, size=len(pats)))
        parts: list[np.ndarray] = []
        prev = 0
        for p, pat in zip(pos, pats):
            parts.append(base[prev:p])
            parts.append(np.asarray(pat, dtype=np.int32))
            prev = p
        parts.append(base[prev:])
        row = np.concatenate(parts)
        chunks.append(row)
        row_lens[i] = len(row)

    flat = np.concatenate(chunks).astype(np.int32)
    offsets = np.concatenate([[0], np.cumsum(row_lens)]).astype(np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                      pa.array(flat, type=pa.int32()))
    doc_ids = pa.array([f"doc-{row_offset + i:012d}" for i in range(n_rows)], type=pa.string())
    return pa.Table.from_arrays(
        [doc_ids, tokens, pa.array(row_lens, type=pa.int32()),
         pa.array(SOURCES[src_idx], type=pa.string())],
        schema=TOKEN_SCHEMA)


TEXT_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("text", pa.string()),
    ("source", pa.string()),
    ("tiebreak", pa.uint64()),
])


def detok_text_table(token_table: pa.Table) -> pa.Table:
    """Side table (doc_id, text, source, tiebreak) for the DuckDB oracle.

    ``text`` is assembled with a plain Python join over the vocab pieces —
    deliberately NOT the engine's vectorized Arrow detokenize kernel, so
    the flagship oracle independently checks that path too.  ``tiebreak``
    is the engine's id hash (single source of truth, hashing.py); the
    oracle derives ts in SQL as ``epoch0 + tiebreak % horizon``."""
    from logtrics_ray.hashing import id_hash64_array
    vocab = V.build_vocab()
    toks = token_table["tokens"].to_pylist()
    texts = ["".join(vocab[t] for t in row) for row in toks]
    doc_ids = token_table["doc_id"]
    return pa.Table.from_arrays([
        doc_ids.combine_chunks() if isinstance(doc_ids, pa.ChunkedArray) else doc_ids,
        pa.array(texts, pa.string()),
        token_table["source"].combine_chunks()
        if isinstance(token_table["source"], pa.ChunkedArray) else token_table["source"],
        pa.array(id_hash64_array(doc_ids), pa.uint64()),
    ], schema=TEXT_SCHEMA)


def write_token_table(out_dir: str, n_rows: int, n_shards: int = 8, seed: int = 42,
                      row_group_size: int = 2048, with_text: bool = False) -> str:
    """Write the table as one parquet file per shard (many row groups →
    ray.data.read_parquet splits well).  Idempotent: skips if complete.

    with_text=True additionally writes the detokenized side table under
    ``out_dir/text/`` (the flagship oracle's input — tests/benchmarks at
    small sf only; the token pipeline itself never reads it)."""
    os.makedirs(out_dir, exist_ok=True)
    done_marker = os.path.join(out_dir, "_DONE")
    # Content-keyed cache: the tag embeds a hash of the generator's own
    # source (synth + vocab + hashing), so a code change between runs /
    # driver rounds regenerates instead of serving stale shards.
    from logtrics_ray import hashing as H
    from logtrics_ray import vocab as _V
    import logtrics_ray.synth as _self
    ver = H.source_version(_self, _V, H)
    tag = f"v3:{ver}:{seed}:{n_rows}:{n_shards}:text={int(with_text)}"
    have = open(done_marker).read().strip() if os.path.exists(done_marker) else ""
    if have == tag or (not with_text and have == tag[:-1] + "1"):
        return out_dir        # a text-bearing dir satisfies a text-free ask
    # Stale or foreign contents: clear every parquet (shard count may have
    # changed; leftovers would silently join the read)
    for sub in (out_dir, os.path.join(out_dir, "text")):
        if os.path.isdir(sub):
            for f in os.listdir(sub):
                if f.endswith(".parquet"):
                    os.unlink(os.path.join(sub, f))
    if os.path.exists(done_marker):
        os.unlink(done_marker)
    per = n_rows // n_shards
    counts = [per + (1 if i < n_rows % n_shards else 0) for i in range(n_shards)]
    offsets = [sum(counts[:i]) for i in range(n_shards)]
    if with_text:
        os.makedirs(os.path.join(out_dir, "text"), exist_ok=True)

    def _write_one(shard: int, cnt: int, off: int):
        t = synth_shard(shard, cnt, seed=seed, row_offset=off)
        pq.write_table(t, os.path.join(out_dir, f"part-{shard:05d}.parquet"),
                       row_group_size=row_group_size)
        if with_text:
            pq.write_table(detok_text_table(t),
                           os.path.join(out_dir, "text", f"part-{shard:05d}.parquet"),
                           row_group_size=row_group_size)

    try:
        import ray
        use_ray = ray.is_initialized() and n_rows >= 50_000
    except ImportError:
        use_ray = False
    if use_ray:
        import ray
        w = ray.remote(_write_one)
        ray.get([w.remote(s, c, o) for s, (c, o) in enumerate(zip(counts, offsets))])
    else:
        for s, (c, o) in enumerate(zip(counts, offsets)):
            _write_one(s, c, o)
    with open(done_marker, "w") as f:
        f.write(tag)
    return out_dir
