"""Distributed SEQUENCE PACKING — the core LLM-pretraining transform the
token table exists for: concatenate every document's tokens in one
deterministic global order and re-chunk the stream into fixed-length
training sequences ("bins") of ``seq_len`` tokens, splitting documents
across bin boundaries (standard causal-LM packing).

Scale shape (the whole point):

- **Global order without a global sort**: docs order by ``(h, doc_id)``
  with h = id_hash64(doc_id); the top ``bucket_bits`` bits of h are an
  ORDER-PRESERVING range partition, so a doc's global token offset =
  (prefix sum of whole buckets before it) + (in-bucket cumsum).  The
  driver only ever holds the 2^bucket_bits per-bucket token totals.
- **Tokens cross exactly ONE exchange** (the bucket groupby).  Each
  bucket task emits every bin fully inside its token range as a
  FINISHED row; only the head/tail fragments at bucket boundaries
  (≤2 per bucket, plus whole tiny buckets) go through the second,
  fragment-only merge groupby — negligible payload.
- The counts pass prunes to (doc_id, n_tok): the token payload is read
  once.

Oracle: the engine's own (doc_id, h) assignment is written as a side
table (the established deterministic-side-table pattern); the packing
rule itself — offsets, bin assignment, per-bin stats — is replayed
independently in DuckDB SQL via unnest + window cumsum
(``packing_oracle_sql``), hash-exact.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

FRAG_SCHEMA = pa.schema([
    ("bin_id", pa.int64()),
    ("start", pa.int64()),          # global token index of the row's slice
    ("complete", pa.bool_()),       # whole bin produced inside one bucket
    ("n_docs", pa.int64()),         # docs overlapping this slice
    ("tokens", pa.list_(pa.int32())),
])


def _doc_hash_bucket(doc_ids, bucket_bits: int):
    from logtrics_ray.hashing import id_hash64_array
    h = id_hash64_array(doc_ids)
    return h, (h >> np.uint64(64 - bucket_bits)).astype(np.int64)



def _top_level_shards(input_path: str):
    """Directories expand to their TOP-LEVEL *.parquet only — side tables
    (e.g. the oracle's text/ subdir) are not part of the input (same rule
    as rollup_pipeline.read_token_table)."""
    import os
    if os.path.isdir(input_path):
        files = sorted(os.path.join(input_path, f)
                       for f in os.listdir(input_path)
                       if f.endswith(".parquet"))
        if files:
            return files
    return input_path


#: Pass-0 combine budget: each input block contributes at most
#: 2^FINE_BITS sparse partial rows (16 B each), so below this many
#: TOTAL partial rows the driver sums the vectors directly — a bounded
#: few-MB pull — instead of paying a sort-exchange round to add
#: integers.  Above it (≳60 read blocks' worth of fully-dense partials,
#: i.e. genuinely wide cluster reads) the distributed groupby runs over
#: the same already-materialized partials.  Same bounded-pull posture as
#: MERGE_LOCAL_TOKEN_BUDGET below.
PASS0_LOCAL_ROW_BUDGET = int(os.environ.get(
    "LT_PACK_PASS0_LOCAL_ROWS", 4_000_000))


def _bucket_token_totals(input_path: str, bucket_bits: int) -> np.ndarray:
    """Pass 0: per-bucket token totals (pruned read: doc_id + n_tok only).
    Returns the dense 2^bucket_bits totals vector (driver-side — tiny)."""
    from logtrics_ray.sources.parquet import read_parquet_clean
    ds = read_parquet_clean(_top_level_shards(input_path),
                            columns=["doc_id", "n_tok"])

    def per_batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n_tok": pa.array([], pa.int64())})
        _, b = _doc_hash_bucket(t["doc_id"], bucket_bits)
        n = t["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        tot = np.bincount(b, weights=n, minlength=1 << bucket_bits)
        nz = np.flatnonzero(tot)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "n_tok": pa.array(tot[nz].astype(np.int64))})

    partials = (ds.map_batches(per_batch, batch_format="pyarrow")
                .materialize())          # bounded: <= 2^bits rows/block
    totals = np.zeros(1 << bucket_bits, dtype=np.int64)
    if partials.count() <= PASS0_LOCAL_ROW_BUDGET:
        for t in partials.iter_batches(batch_format="pyarrow",
                                       batch_size=None):
            totals += np.bincount(
                t["bucket"].to_numpy(zero_copy_only=False),
                weights=t["n_tok"].to_numpy(zero_copy_only=False),
                minlength=1 << bucket_bits).astype(np.int64)
    else:
        rows = partials.groupby("bucket").sum("n_tok").take_all()
        for r in rows:
            totals[int(r["bucket"])] = int(r["sum(n_tok)"])
    return totals


# Adaptive partitioning: pass 0 counts at this FINE granularity, then
# the exchange runs at the smallest bit width whose largest bucket fits
# the per-task token budget.  The top-bits partition is hierarchical, so
# coarse totals are contiguous sums of the fine vector — no second pass.
FINE_BITS = 16
# One bucket's tokens are materialized inside a single group call
# (int32, 4 B/token): 2^26 tokens = 256 MB — comfortable per-task heap.
MAX_BUCKET_TOKENS = 1 << 26


def _adapt_bits(totals_fine: np.ndarray, bits_fine: int, bits_req: int,
                budget: int = MAX_BUCKET_TOKENS) -> tuple[int, np.ndarray]:
    """Smallest bits >= bits_req whose max coarse bucket <= budget.
    Falls back to bits_fine (budget unmet) — the int32 list-offset limit
    is the only hard failure, and only when a single FINE bucket breaks
    it (then no coarsening can help and the corpus needs > bits_fine)."""
    mx_fine = int(totals_fine.max()) if totals_fine.size else 0
    if mx_fine > np.iinfo(np.int32).max:
        raise ValueError(
            f"pack_sequences: a single {bits_fine}-bit bucket holds "
            f"{mx_fine} tokens (> int32 list offsets); raise FINE_BITS")
    for b in range(min(bits_req, bits_fine), bits_fine + 1):
        coarse = totals_fine.reshape(1 << b, -1).sum(axis=1)
        if int(coarse.max()) <= budget:
            return b, coarse
    return bits_fine, totals_fine


class _BucketPacker:
    """Per-bucket pack: order docs by (h, doc_id), assign global offsets
    from the broadcast bucket base, flatten tokens once, slice at bin
    boundaries.  Vectorized throughout (sort + cumsum + one flatten +
    ListArray.from_arrays over precomputed offsets)."""

    def __init__(self, bases: np.ndarray, seq_len: int, bucket_bits: int):
        self.bases = bases            # 2^bits global start offsets
        self.L = seq_len
        self.bits = bucket_bits

    def __call__(self, g: pa.Table) -> pa.Table:
        L = self.L
        g = g.combine_chunks()
        if g.num_rows == 0:
            return FRAG_SCHEMA.empty_table()
        doc_ids = g["doc_id"]
        h, b = _doc_hash_bucket(doc_ids, self.bits)
        base = int(self.bases[int(b[0])])
        key = pa.table({"h": pa.array(h, pa.uint64()),
                        "doc_id": pc.cast(doc_ids, pa.string())})
        order = pc.sort_indices(key, sort_keys=[("h", "ascending"),
                                                ("doc_id", "ascending")])
        n = pc.take(g["n_tok"], order).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        toks = pc.take(g["tokens"], order)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int32, copy=False)
        total = int(n.sum())
        if flat.size != total:      # nulls inside lists would break this
            raise ValueError("pack_sequences: n_tok does not match tokens")
        if total == 0:            # bucket of only zero-length docs:
            return FRAG_SCHEMA.empty_table()   # occupies no bins at all
        offs = base + np.cumsum(n) - n          # per-doc global offsets
        end = base + total

        # slice boundaries: every multiple of L inside (base, end)
        first_bin = base // L
        last_bin = (end - 1) // L if total else first_bin
        cuts = np.arange((first_bin + 1) * L, end, L, dtype=np.int64)
        starts = np.concatenate(([base], cuts))
        stops = np.concatenate((cuts, [end]))
        bins = starts // L
        complete = (starts % L == 0) & (stops - starts == L)

        # docs overlapping each slice: diff-array over local bins for doc
        # intervals [off, off+n), then a per-slice correction is not
        # needed because slice boundaries == bin boundaries inside the
        # bucket (only the head/tail slices are partial-bin, and a doc
        # overlaps the head/tail slice iff it overlaps that bin WITHIN
        # this bucket — which is exactly what the interval count gives).
        nb = int(last_bin - first_bin + 1) if total else 0
        docs_per_bin = np.zeros(nb + 1, dtype=np.int64)
        live = n > 0
        fb = (offs[live] // L) - first_bin
        lb = ((offs[live] + n[live] - 1) // L) - first_bin
        np.add.at(docs_per_bin, fb, 1)
        np.add.at(docs_per_bin, lb + 1, -1)
        docs_per_bin = np.cumsum(docs_per_bin)[:-1]

        if total > np.iinfo(np.int32).max:
            # unreachable when pack_sequences adapted bits from the pass-0
            # totals; kept as a hard guard for direct _BucketPacker users
            raise ValueError("pack_sequences: bucket token count exceeds "
                             "int32 list offsets; increase bucket_bits")
        token_offsets = np.concatenate(
            ([0], np.cumsum(stops - starts))).astype(np.int32)
        tokens_col = pa.ListArray.from_arrays(
            pa.array(token_offsets, pa.int32()), pa.array(flat, pa.int32()))
        return pa.Table.from_arrays([
            pa.array(bins, pa.int64()),
            pa.array(starts, pa.int64()),
            pa.array(complete, pa.bool_()),
            pa.array(docs_per_bin[bins - first_bin], pa.int64()),
            tokens_col,
        ], schema=FRAG_SCHEMA)


#: Token budget under which the boundary-fragment merge happens on the
#: driver instead of through a distributed groupby.  Boundary fragments
#: are the <=2 partial slices at each bucket's edges — 2*2^bits rows of
#: < seq_len tokens each — so at the default exchange width the pull is
#: ~1 MB while the groupby alternative costs a full sort-shuffle round
#: for a hundred rows.  When adaptive widths push the fragment count
#: past the budget (16M tokens = 64 MB), the distributed merge runs.
MERGE_LOCAL_TOKEN_BUDGET = int(os.environ.get(
    "LT_PACK_MERGE_LOCAL_TOKENS", 16_000_000))


def _merge_boundary_local(t: pa.Table) -> pa.Table:
    """Vectorized all-bins boundary merge of a (bounded) pulled fragment
    table: one sort by (bin_id, start), segment sums for n_docs, and a
    single ListArray rebuild over the already-concatenated flat tokens —
    bit-identical to _merge_fragments applied per bin group."""
    t = t.combine_chunks()
    if t.num_rows == 0:
        return FRAG_SCHEMA.empty_table()
    order = pc.sort_indices(t, sort_keys=[("bin_id", "ascending"),
                                          ("start", "ascending")])
    t = t.take(order).combine_chunks()
    bins = t["bin_id"].to_numpy(zero_copy_only=False)
    first = np.concatenate(([True], bins[1:] != bins[:-1]))
    grp = np.cumsum(first) - 1
    nd = np.bincount(grp, weights=t["n_docs"].to_numpy(
        zero_copy_only=False)).astype(np.int64)
    ll = pc.list_value_length(t["tokens"]).to_numpy(
        zero_copy_only=False).astype(np.int64)
    seg = np.bincount(grp, weights=ll).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(seg)))
    flat = pc.list_flatten(t["tokens"])
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    n_out = len(nd)
    return pa.Table.from_arrays([
        pa.array(bins[first], pa.int64()),
        pa.array(t["start"].to_numpy(zero_copy_only=False)[first],
                 pa.int64()),
        pa.array(np.zeros(n_out, dtype=bool), pa.bool_()),
        pa.array(nd, pa.int64()),
        pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat),
    ], schema=FRAG_SCHEMA)


def _merge_fragments(g: pa.Table) -> pa.Table:
    """Boundary-bin merge: order fragments by global start, concatenate
    token slices, sum the (disjoint-doc) counts."""
    g = g.combine_chunks()
    order = pc.sort_indices(g, sort_keys=[("start", "ascending")])
    g = g.take(order)
    flat = pc.list_flatten(g["tokens"])
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return pa.Table.from_arrays([
        g["bin_id"].slice(0, 1),
        g["start"].slice(0, 1),
        pa.array([False], pa.bool_()),
        pa.array([int(pc.sum(g["n_docs"]).as_py())], pa.int64()),
        pa.ListArray.from_arrays(
            pa.array([0, len(flat)], pa.int32()), flat),
    ], schema=FRAG_SCHEMA)


def pack_sequences(input_path: str, seq_len: int = 2048,
                   bucket_bits: int = 6,
                   max_bucket_tokens: int = MAX_BUCKET_TOKENS,
                   shuffle_impl: str = "sort"):
    """Token table -> Dataset of packed training sequences:
    (bin_id, n_docs, tokens) with len(tokens) == seq_len for every bin
    except the last.  See module docstring for the distribution shape.

    ``bucket_bits`` is the MINIMUM exchange width; when the pass-0
    totals show a bucket above ``max_bucket_tokens`` (hot-source skew,
    bigger corpus), the width adapts upward automatically — the output
    is invariant to the width (global order is (h, doc_id) regardless),
    only task sizing changes.

    ``shuffle_impl``: "sort" (default) is Ray's sort-based grouped map;
    "hash" runs the exchange as a key-based hash repartition + per-group
    apply under HASH_SHUFFLE.  Bit-identical output (both group fns
    impose their own internal total order; pinned by a parity test).
    Measured at sf0.1 (200k docs, ~4.4M tokens, 32 CPUs): sort ~10 s vs
    hash ~30 s — the OPPOSITE of the flagship's narrow dictionary-coded
    exchange, because pack's payload is the wide ``list<int32>`` token
    column and HASH_SHUFFLE's aggregator actors pay per-row copies into
    their output builders, while the sort path moves whole Arrow
    buffers.  Rule of thumb encoded here: hash exchange for narrow/tall
    shuffles, sort exchange for wide-payload shuffles."""
    if shuffle_impl == "hash":
        from logtrics_ray.exchange import hash_shuffle_ctx
        with hash_shuffle_ctx():
            return _pack_build(input_path, seq_len, bucket_bits,
                               max_bucket_tokens, hash_exchange=True)
    return _pack_build(input_path, seq_len, bucket_bits,
                       max_bucket_tokens, hash_exchange=False)


def _pack_build(input_path: str, seq_len: int, bucket_bits: int,
                max_bucket_tokens: int, hash_exchange: bool):
    from logtrics_ray.exchange import grouped_apply
    from logtrics_ray.sources.parquet import read_parquet_clean

    fine = _bucket_token_totals(input_path, FINE_BITS)
    bucket_bits, totals = _adapt_bits(fine, FINE_BITS, bucket_bits,
                                      max_bucket_tokens)
    bases = np.concatenate(([0], np.cumsum(totals)[:-1]))
    packer = _BucketPacker(bases, seq_len, bucket_bits)

    ds = read_parquet_clean(_top_level_shards(input_path),
                            columns=["doc_id", "tokens", "n_tok"])

    def add_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("bucket", pa.array([], pa.int64()))
        _, b = _doc_hash_bucket(t["doc_id"], bucket_bits)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    with_bucket = ds.map_batches(add_bucket, batch_format="pyarrow",
                                 zero_copy_batch=True)
    pack_fn = lambda g: packer(g.drop_columns(["bucket"]))  # noqa: E731
    if hash_exchange:
        frags = grouped_apply(with_bucket, "bucket", pack_fn,
                              FRAG_SCHEMA.empty_table)
    else:
        frags = (with_bucket.groupby("bucket")
                 .map_groups(pack_fn, batch_format="pyarrow"))
    # Two consumers follow (complete bins passthrough + boundary merge);
    # without a checkpoint each would re-execute the WHOLE token exchange.
    # The exchange is already a barrier, so materializing its output adds
    # no pipeline stall — just object-store residency (spill-backed), the
    # price of not paying the token exchange twice.
    frags = frags.materialize()

    def keep(flag):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["complete"], flag))
        return fn

    done = frags.map_batches(keep(True), batch_format="pyarrow")
    boundary = frags.map_batches(keep(False), batch_format="pyarrow")
    # Boundary fragments are bucket-edge slices: <=2 per bucket, each
    # under seq_len tokens.  When that bounded total fits the local
    # budget (the common case at any exchange width), merge on the
    # driver in one vectorized pass instead of a sort-shuffle round for
    # a handful of rows; the distributed merge remains the fallback.
    n_boundary = boundary.count()
    if n_boundary * seq_len <= MERGE_LOCAL_TOKEN_BUDGET:
        import ray
        import ray.data as rd
        # empty filter-result blocks can carry a degenerate (zero-column)
        # schema — drop them before concat (cf. _schema_stable's note)
        tabs = [t for t in ray.get(boundary.to_arrow_refs())
                if t.num_rows] if n_boundary else []
        pulled = pa.concat_tables(tabs) if tabs else \
            FRAG_SCHEMA.empty_table()
        boundary = rd.from_arrow(_merge_boundary_local(pulled))
    elif hash_exchange:
        boundary = grouped_apply(boundary, "bin_id", _merge_fragments,
                                 FRAG_SCHEMA.empty_table)
    else:
        boundary = (boundary.groupby("bin_id")
                    .map_groups(_merge_fragments, batch_format="pyarrow"))
    return done.union(boundary).drop_columns(["complete", "start"])


def pack_stats_frame(packed_ds):
    """Per-bin verification stats (the oracle surface): everything an
    independent SQL replay can recompute from the raw token table."""
    def fn(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        toks = t["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        if t.num_rows == 0:
            e = pa.array([], pa.int64())
            return pa.Table.from_arrays(
                [e] * 8, names=["bin_id", "n_tok", "n_docs", "sum_tok",
                                "min_tok", "max_tok", "first_token",
                                "last_token"])
        # .offsets index into .values even for sliced arrays — never pair
        # .offsets with .flatten() (flatten re-bases, offsets don't)
        vals = toks.values.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = vals[offs[0]:offs[-1]]   # re-base so reduceat's implicit
        offs = offs - offs[0]           # last boundary == len(vals)
        lens = np.diff(offs)
        if (lens <= 0).any():
            raise ValueError("pack_stats_frame: empty bin")
        c = np.concatenate(([0], np.cumsum(vals)))
        return pa.Table.from_arrays([
            t["bin_id"],
            pa.array(lens, pa.int64()),
            t["n_docs"],
            pa.array(c[offs[1:]] - c[offs[:-1]], pa.int64()),
            pa.array(np.minimum.reduceat(vals, offs[:-1]), pa.int64()),
            pa.array(np.maximum.reduceat(vals, offs[:-1]), pa.int64()),
            pa.array(vals[offs[:-1]], pa.int64()),
            pa.array(vals[offs[1:] - 1], pa.int64()),
        ], names=["bin_id", "n_tok", "n_docs", "sum_tok", "min_tok",
                  "max_tok", "first_token", "last_token"])

    return packed_ds.map_batches(fn, batch_format="pyarrow")


def write_pack_hash_side_table(input_path: str, out_path: str) -> str:
    """Deterministic (doc_id, h) side table from the engine's own hash
    kernel — the ORDER assignment; the packing rule is replayed in SQL."""
    import glob
    import os

    import pyarrow.parquet as pq

    from logtrics_ray.hashing import id_hash64_array
    paths = (sorted(glob.glob(os.path.join(input_path, "*.parquet")))
             if os.path.isdir(input_path) else [input_path])
    parts = []
    for p in paths:
        t = pq.read_table(p, columns=["doc_id"])
        h = id_hash64_array(t["doc_id"])
        parts.append(pa.table({"doc_id": pc.cast(t["doc_id"], pa.string()),
                               "h": pa.array(h, pa.uint64())}))
    pq.write_table(pa.concat_tables(parts), out_path)
    return out_path


def packing_oracle_sql(input_path: str, side_path: str,
                       seq_len: int = 2048) -> str:
    """Independent DuckDB replay: global offsets via a window cumsum over
    (h, doc_id) order, per-token bin assignment via unnest +
    generate_subscripts, per-bin stats via plain aggregates."""
    return f"""
    WITH hs AS (SELECT * FROM read_parquet('{side_path}')),
    d AS MATERIALIZED (
      SELECT t.doc_id, t.tokens, t.n_tok::BIGINT AS n_tok, hs.h
      FROM read_parquet('{input_path}/*.parquet') t JOIN hs USING (doc_id)),
    o AS MATERIALIZED (
      SELECT doc_id, tokens, h,
             sum(n_tok) OVER (ORDER BY h, doc_id
                              ROWS UNBOUNDED PRECEDING) - n_tok AS off
      FROM d),
    x AS MATERIALIZED (
      -- off is a HUGEINT window sum; without the BIGINT cast bin_id
      -- reaches pandas as float64 and a dtype-tagged hash flags it
      -- against the engine's int64 even though every value matches
      SELECT doc_id,
             CAST(off + generate_subscripts(tokens, 1) - 1 AS BIGINT) AS gidx,
             unnest(tokens)::BIGINT AS tok
      FROM o)
    SELECT gidx // {seq_len} AS bin_id,
           count(*)::BIGINT AS n_tok,
           count(DISTINCT doc_id)::BIGINT AS n_docs,
           sum(tok)::BIGINT AS sum_tok,
           min(tok)::BIGINT AS min_tok,
           max(tok)::BIGINT AS max_tok,
           arg_min(tok, gidx)::BIGINT AS first_token,
           arg_max(tok, gidx)::BIGINT AS last_token
    FROM x GROUP BY 1"""


# ------------------------------------------------------ training mixes --

SAMPLE_BITS = 53          # threshold domain: exact in float64 AND int64


def _sample_key(doc_ids) -> np.ndarray:
    """Per-doc sampling key in [0, 2^53): a SECOND hash (the order hash
    re-mixed through hash64_words with a different seed), so sampling is
    independent of the packing/bucketing order bits.  Integer id columns
    (e.g. the documents table's int64 doc_id) hash their decimal text —
    one canonical byte form per id, independent of the storage type."""
    from logtrics_ray.hashing import hash64_words, id_hash64_array
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    if isinstance(doc_ids, pa.Array) and not (
            pa.types.is_string(doc_ids.type)
            or pa.types.is_large_string(doc_ids.type)
            or pa.types.is_binary(doc_ids.type)
            or pa.types.is_large_binary(doc_ids.type)
            or pa.types.is_dictionary(doc_ids.type)):
        doc_ids = pc.cast(doc_ids, pa.string())
    h = id_hash64_array(doc_ids)
    h2 = hash64_words(h.reshape(-1, 1), seed=0x5A17)
    return (h2 >> np.uint64(64 - SAMPLE_BITS)).astype(np.int64)


def sample_thresholds(rates: dict[str, float]) -> dict[str, int]:
    """Per-source integer thresholds: keep iff key < int(rate * 2^53).
    Computed ONCE here and embedded literally in both the engine filter
    and the SQL oracle — the float->int rounding happens in exactly one
    place, so the two sides cannot disagree."""
    return {s: int(r * (1 << SAMPLE_BITS)) for s, r in rates.items()}


def sample_mix(input_path: str, rates: dict[str, float]):
    """Deterministic TRAINING-MIX sampling: keep each doc with its
    source's rate, decided by a pure hash of doc_id (no RNG state, no
    coordination — any worker, any partition layout, any rerun keeps
    exactly the same docs).  Sources absent from ``rates`` keep rate 0.

    Returns the kept docs as a Dataset (doc_id, source, n_tok, skey).
    """
    from logtrics_ray.sources.parquet import read_parquet_clean
    thr = sample_thresholds(rates)

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("skey", pa.array([], pa.int64()))
        t = t.combine_chunks()
        key = _sample_key(t["doc_id"])
        src = t["source"].to_numpy(zero_copy_only=False)
        lim = np.zeros(t.num_rows, dtype=np.int64)
        for s, v in thr.items():
            lim[src == s] = v
        t = t.append_column("skey", pa.array(key, pa.int64()))
        return t.filter(pa.array(key < lim))

    return read_parquet_clean(_top_level_shards(input_path),
                              columns=["doc_id", "source", "n_tok"]) \
        .map_batches(fn, batch_format="pyarrow")


def sample_mix_stats_frame(kept_ds):
    """Per-source verification stats over the kept docs (built-in
    vectorized aggregations — one small shuffle of per-block partials)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    def prep(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        return pa.Table.from_arrays([
            t["source"], pc.cast(t["n_tok"], pa.int64()),
            t["doc_id"], t["skey"]],
            names=["source", "n_tok", "doc_id", "skey"])

    return (kept_ds.map_batches(prep, batch_format="pyarrow")
            .groupby("source")
            .aggregate(Count(alias_name="n_docs"),
                       Sum("n_tok", alias_name="sum_ntok"),
                       Min("doc_id", alias_name="first_doc"),
                       Max("doc_id", alias_name="last_doc"),
                       Min("skey", alias_name="min_skey"),
                       Max("skey", alias_name="max_skey")))


def write_sample_key_side_table(input_path: str, out_path: str) -> str:
    """Deterministic (doc_id, skey) side table from the engine's own
    sampling hash — the KEY assignment; the keep rule (skey < threshold)
    is replayed independently in SQL."""
    import glob
    import os

    import pyarrow.parquet as pq
    paths = (sorted(glob.glob(os.path.join(input_path, "*.parquet")))
             if os.path.isdir(input_path) else [input_path])
    parts = []
    for p in paths:
        t = pq.read_table(p, columns=["doc_id"])
        # keep the id column's ORIGINAL type so the oracle's USING
        # (doc_id) join never implicit-casts (string token ids stay
        # string; the documents table's int64 ids stay int64)
        parts.append(pa.table({
            "doc_id": t["doc_id"].combine_chunks(),
            "skey": pa.array(_sample_key(t["doc_id"]), pa.int64())}))
    pq.write_table(pa.concat_tables(parts), out_path)
    return out_path


def sample_mix_oracle_sql(input_path: str, side_path: str,
                          rates: dict[str, float]) -> str:
    """SQL replay of the keep rule with the SAME integer thresholds."""
    thr = sample_thresholds(rates)
    cases = " ".join(f"WHEN '{s}' THEN {v}" for s, v in sorted(thr.items()))
    return f"""
    WITH ks AS (SELECT * FROM read_parquet('{side_path}')),
    d AS (
      SELECT t.doc_id, t.source, t.n_tok::BIGINT AS n_tok, ks.skey
      FROM read_parquet('{input_path}/*.parquet') t JOIN ks USING (doc_id)),
    kept AS (
      SELECT * FROM d
      WHERE skey < CASE source {cases} ELSE 0 END)
    SELECT source,
           count(*)::BIGINT AS n_docs,
           sum(n_tok)::BIGINT AS sum_ntok,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc,
           min(skey)::BIGINT AS min_skey, max(skey)::BIGINT AS max_skey
    FROM kept GROUP BY 1"""


def upsample_plan(rates: dict[str, float]) -> dict[str, tuple[int, int]]:
    """Per-source (base_copies, frac_threshold): rate r emits floor(r)
    copies of every doc plus one more iff skey < (r - floor(r)) * 2^53.
    Like ``sample_thresholds``, computed ONCE and embedded literally in
    both the engine filter and the SQL oracle."""
    plan = {}
    for s, r in rates.items():
        if r < 0:
            raise ValueError(f"rate for {s!r} must be >= 0")
        base = int(r)
        plan[s] = (base, int((r - base) * (1 << SAMPLE_BITS)))
    return plan


def sample_mix_epochs(input_path: str, rates: dict[str, float]):
    """Deterministic training-mix sampling WITH UPSAMPLING: rates may
    exceed 1 — a doc from a rate-r source is emitted floor(r) times
    (epochs 0..floor(r)-1) plus one fractional epoch decided by the same
    per-doc hash key ``_sample_key`` uses for downsampling.  Duplicates
    carry epoch-tagged doc_ids (``<doc_id>#e<k>``) so downstream packing
    treats them as distinct rows while ``base_doc_id`` keeps lineage.

    RNG-free and stateless per batch: any worker, any partition layout,
    any rerun emits exactly the same multiset — no shuffle, no state.

    Returns (doc_id, base_doc_id, source, n_tok, skey, epoch).
    """
    from logtrics_ray.sources.parquet import read_parquet_clean
    plan = upsample_plan(rates)

    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_id": pa.array([], pa.string()),
            "base_doc_id": pa.array([], pa.string()),
            "source": pa.array([], pa.string()),
            "n_tok": pa.array([], pa.int64()),
            "skey": pa.array([], pa.int64()),
            "epoch": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.combine_chunks()
        key = _sample_key(t["doc_id"])
        src = t["source"].to_numpy(zero_copy_only=False)
        copies = np.zeros(t.num_rows, dtype=np.int64)
        for s, (base, frac_thr) in plan.items():
            m = src == s
            copies[m] = base + (key[m] < frac_thr)
        total = int(copies.sum())
        if total == 0:
            return empty
        idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), copies)
        epoch = (np.arange(total, dtype=np.int64)
                 - np.repeat(np.cumsum(copies) - copies, copies))
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=object)[idx]
        tagged = np.char.add(np.char.add(ids.astype(str), "#e"),
                             epoch.astype(str))
        ntok = pc.cast(t["n_tok"], pa.int64()).to_numpy(
            zero_copy_only=False)[idx]
        return pa.table({
            "doc_id": pa.array(tagged, pa.string()),
            "base_doc_id": pa.array(ids, pa.string()),
            "source": pa.array(src[idx], pa.string()),
            "n_tok": pa.array(ntok, pa.int64()),
            "skey": pa.array(key[idx], pa.int64()),
            "epoch": pa.array(epoch, pa.int64())})

    return read_parquet_clean(_top_level_shards(input_path),
                              columns=["doc_id", "source", "n_tok"]) \
        .map_batches(fn, batch_format="pyarrow")


def sample_mix_epochs_stats_frame(kept_ds):
    """Per-source verification stats over the (possibly upsampled)
    emission: row count, token mass, distinct base docs (= epoch-0 rows:
    every emitted doc emits epoch 0), deepest epoch."""
    from ray.data.aggregate import Count, Max, Min, Sum

    def prep(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        is_base = pc.cast(pc.equal(t["epoch"], 0), pa.int64())
        return pa.Table.from_arrays(
            [t["source"], t["n_tok"], is_base, t["epoch"], t["doc_id"]],
            names=["source", "n_tok", "is_base", "epoch", "doc_id"])

    return (kept_ds.map_batches(prep, batch_format="pyarrow")
            .groupby("source")
            .aggregate(Count(alias_name="n_rows"),
                       Sum("n_tok", alias_name="sum_ntok"),
                       Sum("is_base", alias_name="n_base"),
                       Max("epoch", alias_name="max_epoch"),
                       Min("doc_id", alias_name="first_doc"),
                       Max("doc_id", alias_name="last_doc")))


def sample_mix_epochs_oracle_sql(input_path: str, side_path: str,
                                 rates: dict[str, float]) -> str:
    """SQL replay of the upsampling rule with the SAME integer plan:
    copies = base + (skey < frac_thr), one row per epoch via unnest."""
    plan = upsample_plan(rates)
    base_cases = " ".join(f"WHEN '{s}' THEN {b}"
                          for s, (b, _) in sorted(plan.items()))
    frac_cases = " ".join(f"WHEN '{s}' THEN {f}"
                          for s, (_, f) in sorted(plan.items()))
    return f"""
    WITH ks AS (SELECT * FROM read_parquet('{side_path}')),
    d AS (
      SELECT t.doc_id, t.source, t.n_tok::BIGINT AS n_tok, ks.skey
      FROM read_parquet('{input_path}/*.parquet') t JOIN ks USING (doc_id)),
    c AS (
      SELECT *, CASE source {base_cases} ELSE 0 END
                + CASE WHEN skey < CASE source {frac_cases} ELSE 0 END
                       THEN 1 ELSE 0 END AS copies
      FROM d),
    x AS (
      SELECT doc_id, source, n_tok, skey,
             unnest(range(copies))::BIGINT AS epoch
      FROM c WHERE copies > 0),
    tagged AS (
      SELECT doc_id || '#e' || epoch AS doc_id, source, n_tok, epoch
      FROM x)
    SELECT source,
           count(*)::BIGINT AS n_rows,
           sum(n_tok)::BIGINT AS sum_ntok,
           sum(CASE WHEN epoch = 0 THEN 1 ELSE 0 END)::BIGINT AS n_base,
           max(epoch)::BIGINT AS max_epoch,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM tagged GROUP BY 1"""


# --------------------------------------------------- vocabulary stats --

def vocab_counts(input_path: str, vocab_size: int = 50257,
                 merge_degree: int = 64):
    """Global per-token statistics over the corpus: occurrence count and
    document frequency.  Per-batch partials are two bincounts over the
    flat token buffer (docs never split across rows, so per-doc distinct
    tokens are exact per batch via one unique over doc*V+token packed
    keys); only the NONZERO (token, n, n_docs) rows shuffle.

    The merge exploits the BOUNDED key domain (token in [0, vocab)): a
    log-depth tree of dense int64 bincount-adds expressed as
    ``repartition -> map_batches`` levels, each task folding ~merge_degree
    partial blocks (<= vocab rows each) into one.  Exact integer sums,
    associative, so the result is independent of block placement — and
    ~10x faster than the generic sort-based groupby aggregate this
    replaced, whose per-key path dominated wall time."""
    import math

    from logtrics_ray.sources.parquet import read_parquet_clean

    V = vocab_size

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"token": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "n_docs": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.combine_chunks()
        toks = t["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        vals = toks.values.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = vals[offs[0]:offs[-1]]
        offs = offs - offs[0]
        if vals.size == 0:
            return empty
        if (vals < 0).any() or (vals >= V).any():
            raise ValueError("vocab_counts: token id outside [0, vocab)")
        n_tot = np.bincount(vals, minlength=V)
        doc_of = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                           np.diff(offs))
        uniq = np.unique(doc_of * V + vals)
        n_docs = np.bincount(uniq % V, minlength=V)
        nz = np.flatnonzero(n_tot)
        return pa.table({"token": pa.array(nz, pa.int64()),
                         "n": pa.array(n_tot[nz], pa.int64()),
                         "n_docs": pa.array(n_docs[nz], pa.int64())})

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        tok = t["token"].to_numpy(zero_copy_only=False)
        acc_n = np.zeros(V, np.int64)
        acc_d = np.zeros(V, np.int64)
        np.add.at(acc_n, tok, t["n"].to_numpy(zero_copy_only=False))
        np.add.at(acc_d, tok, t["n_docs"].to_numpy(zero_copy_only=False))
        nz = np.flatnonzero(acc_n)
        return pa.table({"token": pa.array(nz, pa.int64()),
                         "n": pa.array(acc_n[nz], pa.int64()),
                         "n_docs": pa.array(acc_d[nz], pa.int64())})

    paths = _top_level_shards(input_path)
    ds = read_parquet_clean(paths, columns=["tokens"]) \
        .map_batches(partial, batch_format="pyarrow")
    # tree-reduce: width shrinks by merge_degree per level; any single
    # task folds ~merge_degree blocks of <= V rows, at any corpus size
    width = max(1, 2 * len(paths))       # ~partial block count estimate
    while width > 1:
        width = math.ceil(width / merge_degree)
        ds = ds.repartition(width).map_batches(
            merge, batch_format="pyarrow", batch_size=None)
    return ds


def vocab_topk_frame(input_path: str, k: int = 50,
                     vocab_size: int = 50257):
    """Top-k corpus tokens by (count desc, token asc) with ranks — the
    deterministic head of vocab_counts (tiny sort + limit; only the k
    result rows ever reach the driver)."""
    import pandas as pd

    counts = vocab_counts(input_path, vocab_size)
    top = (counts.sort(["n", "token"], descending=[True, False])
           .limit(k).take_all())
    return pd.DataFrame({
        "token": [int(r["token"]) for r in top],
        "n": [int(r["n"]) for r in top],
        "n_docs": [int(r["n_docs"]) for r in top],
        "rank": list(range(1, len(top) + 1)),
    })


def chunk_stats_frame(input_path: str, chunk_len: int = 512,
                      stride: int = 384):
    """SLIDING-WINDOW CONTEXT CHUNKING stats: split every document's
    token sequence into overlapping windows of ``chunk_len`` starting
    every ``stride`` tokens (the long-document pattern that, unlike
    :func:`pack_sequences`, preserves local context across boundaries).

    Chunking rule (shared literally with the SQL replay): a doc with n
    tokens emits k = 0..K-1 chunks where K = 1 for 0 < n <= chunk_len
    else 1 + ceil((n - chunk_len) / stride); chunk k covers
    [k*stride, min(k*stride + chunk_len, n)) — the final chunk may be
    short, empty docs emit none.

    Fully stateless per batch (chunk arithmetic from the list offsets,
    first-token gather from the flat buffer — no per-doc Python), then
    one tiny per-source groupby.  ``sum_first_tokens`` pins every
    chunk's start position to the actual token VALUES, so an off-by-one
    in the stride math breaks the oracle, not just the counts.

    Output: (source, n_docs, n_chunks, sum_chunk_tokens,
    sum_first_tokens).
    """
    from logtrics_ray.sources.parquet import read_parquet_clean
    from logtrics_ray.stages.seriesscan import dict_codes

    CL, S = int(chunk_len), int(stride)
    if CL < 1 or S < 1 or S > CL:
        raise ValueError("need 1 <= stride <= chunk_len (a stride past "
                         "the window would skip tokens)")

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "source": pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
            "n_chunks": pa.array([], pa.int64()),
            "sum_chunk_tokens": pa.array([], pa.int64()),
            "sum_first_tokens": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.combine_chunks()
        toks = t["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        vals = toks.values.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        base = offs[:-1] - offs[0]
        vals = vals[offs[0]:offs[-1]]
        n = np.diff(offs)
        codes, labels = dict_codes(t["source"])
        K = np.where(n == 0, 0,
                     1 + np.maximum(n - CL + S - 1, 0) // S)
        doc_of = np.repeat(np.arange(t.num_rows, dtype=np.int64), K)
        tot = int(K.sum())
        k = (np.arange(tot, dtype=np.int64)
             - np.repeat(np.cumsum(K) - K, K))
        st = k * S
        en = np.minimum(st + CL, n[doc_of])
        nsrc = len(labels)
        cc = codes[doc_of]
        n_chunks = np.bincount(cc, minlength=nsrc)
        sum_len = np.zeros(nsrc, np.int64)
        np.add.at(sum_len, cc, en - st)
        sum_first = np.zeros(nsrc, np.int64)
        np.add.at(sum_first, cc, vals[base[doc_of] + st])
        return pa.table({
            "source": pa.array(labels, pa.string()),
            "n_docs": pa.array(np.bincount(codes, minlength=nsrc),
                               pa.int64()),
            "n_chunks": pa.array(n_chunks, pa.int64()),
            "sum_chunk_tokens": pa.array(sum_len, pa.int64()),
            "sum_first_tokens": pa.array(sum_first, pa.int64())})

    paths = _top_level_shards(input_path)
    agg = (read_parquet_clean(paths, columns=["tokens", "source"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("source")
           .sum(["n_docs", "n_chunks", "sum_chunk_tokens",
                 "sum_first_tokens"]))
    out = agg.to_pandas()
    return out.rename(columns={
        "sum(n_docs)": "n_docs", "sum(n_chunks)": "n_chunks",
        "sum(sum_chunk_tokens)": "sum_chunk_tokens",
        "sum(sum_first_tokens)": "sum_first_tokens"})


def chunk_stats_oracle_sql(input_path: str, chunk_len: int = 512,
                           stride: int = 384) -> str:
    CL, S = int(chunk_len), int(stride)
    return f"""
    WITH d AS (
      SELECT source, tokens, len(tokens)::BIGINT AS n
      FROM read_parquet('{input_path}/*.parquet')),
    c AS (
      SELECT source, tokens, n,
             unnest(generate_series(0,
               CASE WHEN n = 0 THEN -1
                    WHEN n <= {CL} THEN 0
                    ELSE (n - {CL} + {S} - 1) // {S} END)) AS k
      FROM d),
    ch AS (
      SELECT source, k * {S} AS st,
             LEAST(k * {S} + {CL}, n) AS en,
             tokens[k * {S} + 1]::BIGINT AS first_tok
      FROM c)
    SELECT d.source,
           count(*)::BIGINT AS n_docs,
           (SELECT count(*) FROM ch WHERE ch.source = d.source)::BIGINT
             AS n_chunks,
           (SELECT COALESCE(sum(en - st), 0) FROM ch
            WHERE ch.source = d.source)::BIGINT AS sum_chunk_tokens,
           (SELECT COALESCE(sum(first_tok), 0) FROM ch
            WHERE ch.source = d.source)::BIGINT AS sum_first_tokens
    FROM d GROUP BY 1"""


def tfidf_topk_frame(input_path: str, k: int = 50,
                     vocab_size: int = 50257):
    """Top-k corpus tokens by TF-IDF: score = total_tf * ln(N / df)
    with N = corpus document count — the distinctiveness ranking that
    surfaces corpus-characteristic tokens instead of raw stopword-like
    heads (:func:`vocab_topk_frame`).

    Distributed part = :func:`vocab_counts` (bincount partials, dense
    tree-reduce); scoring runs on the <= vocab-size counts frame.  The
    ln is computed with ``math.log`` per DISTINCT df value: glibc's
    log(), which DuckDB's ln() also calls, is bit-identical to it,
    while numpy's vectorized SIMD log drifts up to 2 ulp — enough to
    flip a rank near ties.  Ordering is by the UNROUNDED score (same
    double product both sides), tiebreak token asc; published tfidf is
    rounded to 6dp.

    Output: (token, n, n_docs, tfidf, rank), k rows.
    """
    import math

    import pandas as pd
    import pyarrow.parquet as pq

    paths = _top_level_shards(input_path)
    n_corpus = sum(pq.ParquetFile(p).metadata.num_rows for p in
                   (paths if isinstance(paths, list) else [paths]))

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("score", pa.array([], pa.float64()))
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        df = t["n_docs"].to_numpy(zero_copy_only=False)
        uniq = np.unique(df)
        ln = {int(d): math.log(n_corpus / (int(d) * 1.0)) for d in uniq}
        idf = np.array([ln[int(d)] for d in df], dtype=np.float64)
        return t.append_column("score", pa.array(n * idf, pa.float64()))

    counts = vocab_counts(input_path, vocab_size) \
        .map_batches(score, batch_format="pyarrow")
    top = (counts.sort(["score", "token"], descending=[True, False])
           .limit(k).take_all())
    from logtrics_ray.pipelines.table_rollup import _round6
    return pd.DataFrame({
        "token": [int(r["token"]) for r in top],
        "n": [int(r["n"]) for r in top],
        "n_docs": [int(r["n_docs"]) for r in top],
        "tfidf": _round6(np.array([r["score"] for r in top])),
        "rank": list(range(1, len(top) + 1)),
    })


def tfidf_topk_oracle_sql(input_path: str, k: int = 50) -> str:
    return f"""
    WITH x AS MATERIALIZED (
      SELECT doc_id, unnest(tokens)::BIGINT AS token
      FROM read_parquet('{input_path}/*.parquet')),
    c AS (
      SELECT token, count(*)::BIGINT AS n,
             count(DISTINCT doc_id)::BIGINT AS n_docs
      FROM x GROUP BY 1),
    tot AS (
      SELECT count(*)::BIGINT AS nd
      FROM read_parquet('{input_path}/*.parquet')),
    s AS (
      SELECT token, n, n_docs,
             n * ln((SELECT nd FROM tot) / (n_docs * 1.0)) AS score
      FROM c)
    SELECT token, n, n_docs, round(score, 6) AS tfidf,
           row_number() OVER (ORDER BY score DESC, token ASC)::BIGINT
             AS rank
    FROM s QUALIFY rank <= {k}"""


def bigram_counts(input_path: str, vocab_size: int = 50257):
    """Global BIGRAM statistics: count and document frequency of every
    within-document consecutive token pair.

    Unlike :func:`vocab_counts`, the key domain (vocab² ≈ 2.5e9) is far
    too wide for a dense bincount tree — the sparse path is the scale
    design: per-batch ``np.unique`` partials collapse each block to its
    distinct (a·V+b) keys first (corpus → ≤distinct-bigrams rows before
    anything shuffles), then ONE hash groupby sums the partials.  Doc
    frequency is exact because documents never split across input rows:
    per-batch unique over (local_doc · V², bigram) packed keys — both
    factors bounded (batch rows × V² < 2⁶³)."""
    from logtrics_ray.sources.parquet import read_parquet_clean

    V = vocab_size
    VV = V * V

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"bg": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "n_docs": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.combine_chunks()
        toks = t["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        vals = toks.values.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = vals[offs[0]:offs[-1]]
        offs = offs - offs[0]
        if vals.size < 2:
            return empty
        if (vals < 0).any() or (vals >= V).any():
            raise ValueError("bigram_counts: token id outside [0, vocab)")
        # pair i = (vals[i], vals[i+1]); kill pairs straddling a doc
        # boundary (pair index offs[j]-1 for every interior boundary;
        # empty docs make boundaries repeat / hit the array edges)
        valid = np.ones(vals.size - 1, bool)
        cut = offs[1:-1] - 1
        cut = cut[(cut >= 0) & (cut < vals.size - 1)]
        valid[cut] = False
        key = vals[:-1][valid] * V + vals[1:][valid]
        if key.size == 0:
            return empty
        uk, cnt = np.unique(key, return_counts=True)
        doc_of = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                           np.diff(offs))[:-1][valid]
        dpairs = np.unique(doc_of * VV + key)
        _, dcnt = np.unique(dpairs % VV, return_counts=True)
        # unique(dpairs % VV) == uk (every bigram occurs in ≥1 doc;
        # both are sorted uniques of the same key set), so dcnt aligns
        # with uk elementwise
        return pa.table({"bg": pa.array(uk, pa.int64()),
                         "n": pa.array(cnt, pa.int64()),
                         "n_docs": pa.array(dcnt, pa.int64())})

    def merge_block(t: pa.Table) -> pa.Table:
        # one hash-partition's partials: complete bg groups, summed with
        # a vectorized unique+scatter-add (no per-group Python)
        if t.num_rows == 0:
            return t
        t = t.combine_chunks()
        bg = t["bg"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(bg, return_inverse=True)
        acc_n = np.zeros(uk.size, np.int64)
        acc_d = np.zeros(uk.size, np.int64)
        np.add.at(acc_n, inv, t["n"].to_numpy(zero_copy_only=False))
        np.add.at(acc_d, inv, t["n_docs"].to_numpy(zero_copy_only=False))
        return pa.table({"bg": pa.array(uk, pa.int64()),
                         "n": pa.array(acc_n, pa.int64()),
                         "n_docs": pa.array(acc_d, pa.int64())})

    from logtrics_ray.exchange import default_partitions, hash_shuffle_ctx

    paths = _top_level_shards(input_path)
    with hash_shuffle_ctx():
        return (read_parquet_clean(paths, columns=["tokens"])
                .map_batches(partial, batch_format="pyarrow")
                .repartition(default_partitions(), keys=["bg"])
                .map_batches(merge_block, batch_format="pyarrow",
                             batch_size=None))


def bigram_topk_frame(input_path: str, k: int = 50,
                      vocab_size: int = 50257):
    """Top-k corpus bigrams by (count desc, token_a asc, token_b asc).

    After the groupby every key is globally final, so block-local top-k
    candidates followed by one tiny driver merge is EXACT — no full
    distributed sort; only ≤ k rows per block ever leave a worker."""
    import pandas as pd

    V = vocab_size
    counts = bigram_counts(input_path, vocab_size)

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        n = t["n"].to_numpy(zero_copy_only=False)
        bg = t["bg"].to_numpy(zero_copy_only=False)
        order = np.lexsort((bg, -n))[:k]
        return t.take(pa.array(np.sort(order)))

    cand = counts.map_batches(local_topk, batch_format="pyarrow",
                              batch_size=None).take_all()
    bg = np.array([r["bg"] for r in cand], np.int64)
    n = np.array([r["n"] for r in cand], np.int64)
    nd = np.array([r["n_docs"] for r in cand], np.int64)
    order = np.lexsort((bg, -n))[:k]
    return pd.DataFrame({
        "token_a": bg[order] // V,
        "token_b": bg[order] % V,
        "n": n[order],
        "n_docs": nd[order],
        "rank": np.arange(1, order.size + 1, dtype=np.int64),
    })


def doc_length_histogram(input_path: str, width: int = 128):
    """Document-length distribution over the token table: per length
    bucket (n_tok // width), the doc count and token total.  Per-batch
    sparse bincount partials over the pruned (n_tok) column — the token
    payload is never read — then one tiny groupby (the bucket domain is
    max-doc-len/width keys, hundreds at most)."""
    from logtrics_ray.sources.parquet import read_parquet_clean

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n_docs": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64())})
        n_tok = t["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = n_tok // width
        uk, inv = np.unique(b, return_inverse=True)
        docs = np.bincount(inv).astype(np.int64)
        toks = np.zeros(uk.size, np.int64)
        np.add.at(toks, inv, n_tok)
        return pa.table({"bucket": pa.array(uk, pa.int64()),
                         "n_docs": pa.array(docs, pa.int64()),
                         "n_tokens": pa.array(toks, pa.int64())})

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["bucket", "n_docs", "n_tokens"])

    paths = _top_level_shards(input_path)
    return (read_parquet_clean(paths, columns=["n_tok"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("bucket").sum(["n_docs", "n_tokens"])
            .map_batches(rename, batch_format="pyarrow"))


def doc_length_histogram_oracle_sql(input_path: str, width: int = 128) -> str:
    return f"""
    SELECT (n_tok // {width})::BIGINT AS bucket,
           count(*)::BIGINT AS n_docs,
           sum(n_tok)::BIGINT AS n_tokens
    FROM read_parquet('{input_path}/*.parquet')
    GROUP BY 1"""


def bigram_topk_oracle_sql(input_path: str, k: int = 50) -> str:
    return f"""
    WITH x AS MATERIALIZED (
      SELECT doc_id, tokens FROM read_parquet('{input_path}/*.parquet')),
    pairs AS (
      SELECT doc_id, tokens[i]::BIGINT AS token_a,
             tokens[i + 1]::BIGINT AS token_b
      FROM (SELECT doc_id, tokens,
                   unnest(generate_series(1, len(tokens) - 1)) AS i
            FROM x)),
    c AS (
      SELECT token_a, token_b, count(*)::BIGINT AS n,
             count(DISTINCT doc_id)::BIGINT AS n_docs
      FROM pairs GROUP BY 1, 2)
    SELECT token_a, token_b, n, n_docs,
           row_number() OVER (ORDER BY n DESC, token_a ASC,
                              token_b ASC)::BIGINT AS rank
    FROM c QUALIFY rank <= {k}"""


def vocab_topk_oracle_sql(input_path: str, k: int = 50) -> str:
    return f"""
    WITH x AS MATERIALIZED (
      SELECT doc_id, unnest(tokens)::BIGINT AS token
      FROM read_parquet('{input_path}/*.parquet')),
    c AS (
      SELECT token, count(*)::BIGINT AS n,
             count(DISTINCT doc_id)::BIGINT AS n_docs
      FROM x GROUP BY 1)
    SELECT token, n, n_docs,
           row_number() OVER (ORDER BY n DESC, token ASC)::BIGINT AS rank
    FROM c QUALIFY rank <= {k}"""


# ------------------------------------------------- deterministic splits --
#
# Train/val/test assignment by pure doc-id hash: the split is a
# property of the DOCUMENT, not of any ordering, block layout, epoch or
# RNG state — re-running over re-sharded input (or over 100 TB on a
# different cluster) assigns every doc identically, and no coordination
# or shuffle is needed to decide membership.  Reuses the sampling key
# domain (SAMPLE_BITS) so the thresholds are exact in float64 AND int64.

#: Cumulative split fractions over the 2^53 key domain; remainder = train.
SPLIT_FRACS = (("test", 0.02), ("val", 0.07))


def split_thresholds() -> list[tuple[str, int]]:
    """[(name, upper_bound_exclusive)] in cumulative key order — computed
    ONCE here and embedded literally in the engine filter and the SQL
    oracle (same single-rounding-site posture as sample_thresholds)."""
    return [(name, int(f * (1 << SAMPLE_BITS))) for name, f in SPLIT_FRACS]


def hash_split_frame(input_path: str, id_col: str = "doc_id",
                     group_col: str = "source",
                     weight_col: str = "n_chars"):
    """Per (source, split) doc counts + weight totals under the
    deterministic hash split.  Pruned 3-column read; per-batch partials
    (<= sources x 3 rows each); one tiny multi-key groupby."""
    from logtrics_ray.sources.parquet import read_parquet_clean
    thr = split_thresholds()
    bounds = np.array([b for _, b in thr], dtype=np.int64)
    names = np.array([n for n, _ in thr] + ["train"], dtype=object)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({group_col: pa.array([], pa.string()),
                          "split": pa.array([], pa.string()),
                          "n_docs": pa.array([], pa.int64()),
                          weight_col: pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.combine_chunks()
        key = _sample_key(t[id_col])
        split = names[np.searchsorted(bounds, key, side="right")]
        src = t[group_col].to_numpy(zero_copy_only=False)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uk_s, si = np.unique(src, return_inverse=True)
        uk_p, pi = np.unique(split, return_inverse=True)
        ck = si * uk_p.size + pi
        uk, inv = np.unique(ck, return_inverse=True)
        docs = np.bincount(inv).astype(np.int64)
        ws = np.zeros(uk.size, np.int64)
        np.add.at(ws, inv, w)
        return pa.table({
            group_col: pa.array(uk_s[uk // uk_p.size], pa.string()),
            "split": pa.array(uk_p[uk % uk_p.size], pa.string()),
            "n_docs": pa.array(docs, pa.int64()),
            weight_col: pa.array(ws, pa.int64())})

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([group_col, "split", "n_docs", weight_col])

    cols = [id_col, group_col, weight_col]
    return (read_parquet_clean(_top_level_shards(input_path), columns=cols)
            .map_batches(partial, batch_format="pyarrow")
            .groupby([group_col, "split"]).sum(["n_docs", weight_col])
            .map_batches(rename, batch_format="pyarrow"))


def hash_split_oracle_sql(input_path: str, side_path: str,
                          group_col: str = "source",
                          weight_col: str = "n_chars") -> str:
    """SQL replay of the split rule with the SAME integer thresholds,
    key assignment from the engine's (doc_id, skey) side table."""
    thr = split_thresholds()
    cases = " ".join(f"WHEN skey < {b} THEN '{n}'" for n, b in thr)
    return f"""
    WITH ks AS (SELECT * FROM read_parquet('{side_path}')),
    d AS (
      SELECT t.{group_col},
             CASE {cases} ELSE 'train' END AS split,
             t.{weight_col}::BIGINT AS w
      FROM read_parquet('{input_path}') t JOIN ks USING (doc_id))
    SELECT {group_col}, split, count(*)::BIGINT AS n_docs,
           sum(w)::BIGINT AS {weight_col}
    FROM d GROUP BY 1, 2"""


# ---------------------------------------------- per-source token quotas --
#
# Budget-capped curation: keep each source's docs in the deterministic
# global (h, doc_id) order until the source's token budget is reached
# (the "N tokens of web, M of code" knob every pretraining mix needs).
# The TOKEN PAYLOAD IS NEVER READ — only (doc_id, n_tok, source) — and
# nothing wide ever shuffles: pass 0 builds per-(source, bucket) token
# prefix sums exactly like pack_sequences' pass 0, pass 1 exchanges the
# narrow id rows once and each (source, bucket) task resolves its own
# docs against the broadcast base offsets.

#: Max docs a single (source, bucket) group task should hold (narrow
#: rows: id + n_tok + key). Pass-0 totals adapt the bucket width up
#: when a source is hotter than this.
QUOTA_DOC_BUDGET = 1 << 22


def _source_bucket_totals(input_path: str, bits: int):
    """Pass 0: {source: (docs_vec, toks_vec)} at 2^bits fine buckets.
    Bounded pull: partials are <= distinct-(source,bucket) rows per
    block (the same posture as _bucket_token_totals; above the row
    budget a per-source distributed vector sum runs first)."""
    from logtrics_ray.sources.parquet import read_parquet_clean
    ds = read_parquet_clean(_top_level_shards(input_path),
                            columns=["doc_id", "n_tok", "source"])
    width = 1 << bits

    def per_batch(t: pa.Table) -> pa.Table:
        empty = pa.table({"source": pa.array([], pa.string()),
                          "bucket": pa.array([], pa.int64()),
                          "n_docs": pa.array([], pa.int64()),
                          "n_tok": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.combine_chunks()
        _, b = _doc_hash_bucket(t["doc_id"], bits)
        n = t["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = t["source"].to_numpy(zero_copy_only=False)
        uk_s, si = np.unique(src, return_inverse=True)
        ck = si.astype(np.int64) * width + b
        uk, inv = np.unique(ck, return_inverse=True)
        docs = np.bincount(inv).astype(np.int64)
        toks = np.zeros(uk.size, np.int64)
        np.add.at(toks, inv, n)
        return pa.table({"source": pa.array(uk_s[uk // width], pa.string()),
                         "bucket": pa.array(uk % width, pa.int64()),
                         "n_docs": pa.array(docs, pa.int64()),
                         "n_tok": pa.array(toks, pa.int64())})

    partials = (ds.map_batches(per_batch, batch_format="pyarrow")
                .materialize())
    if partials.count() > PASS0_LOCAL_ROW_BUDGET:
        partials = (partials.groupby(["source", "bucket"])
                    .sum(["n_docs", "n_tok"])
                    .map_batches(lambda t: t.rename_columns(
                        ["source", "bucket", "n_docs", "n_tok"]),
                        batch_format="pyarrow").materialize())
    per_src: dict = {}
    for t in partials.iter_batches(batch_format="pyarrow",
                                   batch_size=None):
        src = t["source"].to_numpy(zero_copy_only=False)
        bk = t["bucket"].to_numpy(zero_copy_only=False)
        nd = t["n_docs"].to_numpy(zero_copy_only=False)
        nt = t["n_tok"].to_numpy(zero_copy_only=False)
        for s in np.unique(src):
            d, k = per_src.setdefault(
                str(s), (np.zeros(width, np.int64),
                         np.zeros(width, np.int64)))
            m = src == s
            np.add.at(d, bk[m], nd[m])
            np.add.at(k, bk[m], nt[m])
    return per_src


def source_quota_frame(input_path: str, budget_tokens: int,
                       bucket_bits: int = 6):
    """Per-source summary after budget-capped keep:
    (source, kept_docs, kept_tokens, total_docs, total_tokens).
    A doc is kept iff its source's running token total INCLUDING it
    stays <= budget_tokens, running in (h, doc_id) order (docs are
    never split)."""
    import ray

    from logtrics_ray.sources.parquet import read_parquet_clean

    per_src = _source_bucket_totals(input_path, FINE_BITS)
    if not per_src:
        import pandas as pd
        return pd.DataFrame(columns=["source", "kept_docs", "kept_tokens",
                                     "total_docs", "total_tokens"])
    bits = bucket_bits
    for s, (docs_f, _) in per_src.items():
        b_s, _tot = _adapt_bits(docs_f, FINE_BITS, bucket_bits,
                                budget=QUOTA_DOC_BUDGET)
        bits = max(bits, b_s)
    srcs = sorted(per_src)
    src_arr = np.array(srcs, dtype=object)
    bases = np.stack([
        np.concatenate(([0], np.cumsum(
            per_src[s][1].reshape(1 << bits, -1).sum(axis=1))[:-1]))
        for s in srcs])                       # (S, 2^bits) token bases
    bref = ray.put((src_arr, bases, bits))

    ds = read_parquet_clean(_top_level_shards(input_path),
                            columns=["doc_id", "n_tok", "source"])

    def add_key(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("qkey", pa.array([], pa.int64()))
        src_arr_, _, bits_ = ray.get(bref)
        t = t.combine_chunks()
        _, b = _doc_hash_bucket(t["doc_id"], bits_)
        src = t["source"].to_numpy(zero_copy_only=False)
        si = np.searchsorted(src_arr_.astype(str), src.astype(str))
        qkey = si.astype(np.int64) * (1 << bits_) + b
        return t.append_column("qkey", pa.array(qkey, pa.int64()))

    def quota_group(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        src_arr_, bases_, bits_ = ray.get(bref)
        qk = int(g["qkey"][0].as_py())
        si, bk = qk >> bits_, qk & ((1 << bits_) - 1)
        base = int(bases_[si, bk])
        key = pa.table({"h": pa.array(
            _doc_hash_bucket(g["doc_id"], bits_)[0], pa.uint64()),
            "doc_id": pc.cast(g["doc_id"], pa.string())})
        order = pc.sort_indices(key, sort_keys=[("h", "ascending"),
                                                ("doc_id", "ascending")])
        n = pc.take(g["n_tok"], order).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cum = base + np.cumsum(n)
        kept = cum <= budget_tokens
        return pa.table({
            "source": pa.array([str(src_arr_[si])], pa.string()),
            "kept_docs": pa.array([int(kept.sum())], pa.int64()),
            "kept_tokens": pa.array([int(n[kept].sum())], pa.int64()),
            "total_docs": pa.array([n.size], pa.int64()),
            "total_tokens": pa.array([int(n.sum())], pa.int64())})

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["source", "kept_docs", "kept_tokens",
                                 "total_docs", "total_tokens"])

    return (ds.map_batches(add_key, batch_format="pyarrow")
            .groupby("qkey")
            .map_groups(quota_group, batch_format="pyarrow")
            .groupby("source")
            .sum(["kept_docs", "kept_tokens", "total_docs", "total_tokens"])
            .map_batches(rename, batch_format="pyarrow"))


def source_quota_oracle_sql(input_path: str, side_path: str,
                            budget_tokens: int) -> str:
    """SQL replay: per-source window cumsum over the engine's (h,
    doc_id) order (order hash from the pack side table), keep rule
    cum <= budget."""
    return f"""
    WITH hs AS (SELECT * FROM read_parquet('{side_path}')),
    d AS (
      SELECT t.source, t.n_tok::BIGINT AS n_tok, hs.h, t.doc_id
      FROM read_parquet('{input_path}/*.parquet') t JOIN hs USING (doc_id)),
    c AS (
      SELECT source, n_tok,
             CAST(sum(n_tok) OVER (PARTITION BY source
                                   ORDER BY h, doc_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum
      FROM d)
    SELECT source,
           count(*) FILTER (WHERE cum <= {budget_tokens})::BIGINT
             AS kept_docs,
           COALESCE(sum(n_tok) FILTER (WHERE cum <= {budget_tokens}),
                    0)::BIGINT AS kept_tokens,
           count(*)::BIGINT AS total_docs,
           sum(n_tok)::BIGINT AS total_tokens
    FROM c GROUP BY 1"""
