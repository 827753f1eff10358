"""Tier storage: Gorilla-compressed blocks in partitioned Parquet + manifests.

Layout (north rule: resumable, partitioned, lineage-tracked):

    out_dir/tier=<1m|1h|1d>/bucket=<B>/blocks.parquet
    out_dir/tier=<1m|1h|1d>/bucket=<B>/_MANIFEST.json

One bucket = hash(series_key) % series_buckets — a stable unit of
resume.  Inside ``blocks.parquet`` each row is one Gorilla block: up to
``block_len`` consecutive windows of one (series, metric_type), with
delta-of-delta-encoded window starts and XOR-encoded value columns
(see gorilla.py).  The whole write of a bucket is atomic (tmp+rename,
manifest last) via state/manifest.py.

Replaces the reference's Graphite TCP line-protocol sink
(/root/reference/graphite/graphite.go:67-73,84-90): the per-interval
registry snapshot becomes the dense per-window rows persisted here.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from logtrics_ray.config import EngineConfig
from logtrics_ray.hashing import series_bucket_array
from logtrics_ray.stages import gorilla
from logtrics_ray.stages.seriesscan import FINAL_SCHEMA

# float64-encoded value columns, in storage order.  ``mean`` and ``rate``
# are NOT stored: they are exact functions of stored columns + the tier
# width (mean = sum/count; rate = sum/width_s for meters, count/width_s
# for timers, NaN else) and are re-derived bit-exactly at decode — 2 of
# 16 encode passes and ~12% of block bytes saved.
VALUE_COLS = ["count", "sum", "vmin", "vmax", "last",
              "p50", "p75", "p95", "p99", "p999",
              "cumulative", "ewma_60s", "ewma_300s", "ewma_900s"]

BLOCK_SCHEMA = pa.schema(
    [("series_key", pa.string()), ("metric_type", pa.string()),
     ("window_lo", pa.int64()), ("window_hi", pa.int64()), ("n", pa.int32()),
     ("b_ts", pa.binary())]
    + [(f"b_{c}", pa.binary()) for c in VALUE_COLS]
    + [("b_gap", pa.binary())])

SUMMARY_SCHEMA = pa.schema([
    ("tier", pa.string()), ("bucket", pa.int64()), ("rows", pa.int64()),
    ("series", pa.int64()), ("blocks", pa.int64()),
    ("window_min", pa.int64()), ("window_max", pa.int64()),
])


def add_bucket_column(final_ds, cfg: EngineConfig):
    nb = cfg.series_buckets

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("bucket", pa.array([], pa.int64()))
        b = series_bucket_array(t["series_key"], nb)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    return final_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _encode_blocks(group: pa.Table, block_len: int) -> pa.Table:
    """Final rows of ONE bucket -> Gorilla block rows.

    Grouping keys come from dictionary indices rank-remapped to string
    sort order (seriesscan.dict_codes) — one integer lexsort, no per-row
    Python key strings; block order is identical to the old
    ``f"{series}\\x00{mtype}"`` object sort."""
    from logtrics_ray.stages.seriesscan import _label_ranks, dict_codes
    if group.num_rows == 0:
        return BLOCK_SCHEMA.empty_table()
    group = group.combine_chunks()
    sk_idx, sk_labels = dict_codes(group["series_key"])
    mt_idx, mt_labels = dict_codes(group["metric_type"])
    nmt = max(len(mt_labels), 1)
    key = _label_ranks(sk_labels)[sk_idx] * nmt + _label_ranks(mt_labels)[mt_idx]
    w = group["window_start"].to_numpy()
    order = np.lexsort((w, key))
    key, w = key[order], w[order]
    sk_i, mt_i = sk_idx[order], mt_idx[order]
    starts = np.flatnonzero(np.diff(key, prepend=key[0] - 1))
    bounds = np.append(starts, key.size)

    vals = {c: group[c].to_numpy(zero_copy_only=False)[order] for c in VALUE_COLS}
    gap = group["gap_filled"].to_numpy(zero_copy_only=False)[order]

    rows: dict[str, list] = {f.name: [] for f in BLOCK_SCHEMA}
    for gi in range(starts.size):
        lo, hi = bounds[gi], bounds[gi + 1]
        for blo in range(lo, hi, block_len):
            bhi = min(blo + block_len, hi)
            rows["series_key"].append(sk_labels[sk_i[blo]])
            rows["metric_type"].append(mt_labels[mt_i[blo]])
            rows["window_lo"].append(int(w[blo]))
            rows["window_hi"].append(int(w[bhi - 1]))
            rows["n"].append(bhi - blo)
            rows["b_ts"].append(gorilla.encode_timestamps(w[blo:bhi]))
            for c in VALUE_COLS:
                rows[f"b_{c}"].append(gorilla.encode_floats(
                    vals[c][blo:bhi].astype(np.float64)))
            rows["b_gap"].append(gorilla.encode_bools(gap[blo:bhi]))
    return pa.Table.from_pydict(rows, schema=BLOCK_SCHEMA)


def decode_columns_needed(columns) -> list[str]:
    """Gorilla value PLANES a column-subset decode must read: requested
    VALUE_COLS, plus sum+count when ``mean`` or ``rate`` is derived,
    plus the gap bitmap when ``gap_filled`` is requested."""
    want = set(columns)
    need = [c for c in VALUE_COLS if c in want]
    if want & {"mean", "rate"}:
        need += [c for c in ("sum", "count") if c not in need]
    return need


def decode_blocks(blocks: pa.Table, width_ms: int, columns=None,
                  window_min: int | None = None,
                  window_max: int | None = None) -> pa.Table:
    """Gorilla block rows -> final tier rows (exact round-trip).

    ``mean``/``rate`` are re-derived from the decoded columns with the
    identical expressions the scan used, so the reconstruction is
    bit-exact (same float64 operands, same single division).

    ``columns``: optional subset of FINAL value columns to decode — the
    other Gorilla planes are never touched (pair with the column-pruned
    blocks read in ``read_tier`` so their bytes never leave storage
    either); the key columns (series_key, metric_type, window_start) are
    always present.  ``window_min``/``window_max``: inclusive
    window_start range filter applied to the decoded rows (partition +
    block pruning happens in ``read_tier``; this trims the edge blocks
    that merely OVERLAP the range)."""
    width_s = width_ms / 1000.0
    fields = list(FINAL_SCHEMA)
    if columns is not None:
        want = set(columns)
        fields = [f for f in FINAL_SCHEMA
                  if f.name in ("series_key", "metric_type", "window_start")
                  or f.name in want]
    names = [f.name for f in fields]
    dec_cols = (VALUE_COLS if columns is None
                else decode_columns_needed(columns))
    out = {n: [] for n in names}
    for i in range(blocks.num_rows):
        n = blocks["n"][i].as_py()
        mtype = blocks["metric_type"][i].as_py()
        out["series_key"].extend([blocks["series_key"][i].as_py()] * n)
        out["metric_type"].extend([mtype] * n)
        out["window_start"].append(gorilla.decode_timestamps(blocks["b_ts"][i].as_py()))
        dec = {}
        for c in dec_cols:
            d = gorilla.decode_floats(blocks[f"b_{c}"][i].as_py())
            dec[c] = d
            if c in out:
                out[c].append(d.astype(np.int64) if c == "count" else d)
        with np.errstate(invalid="ignore", divide="ignore"):
            if "mean" in out:
                out["mean"].append(dec["sum"] / dec["count"])
            if "rate" in out:
                if mtype == "meter":
                    out["rate"].append(dec["sum"] / width_s)
                elif mtype == "timer":
                    out["rate"].append(dec["count"] / width_s)
                else:
                    out["rate"].append(np.full(n, np.nan))
        if "gap_filled" in out:
            out["gap_filled"].append(gorilla.decode_bools(blocks["b_gap"][i].as_py()))
    cols = []
    schema = pa.schema(fields)
    for f in fields:
        v = out[f.name]
        if v and isinstance(v[0], np.ndarray):
            v = np.concatenate(v) if v else np.array([])
        cols.append(pa.array(v, f.type))
    t = pa.Table.from_arrays(cols, schema=schema)
    if window_min is not None or window_max is not None:
        import pyarrow.compute as pc
        w = t["window_start"]
        mask = None
        if window_min is not None:
            mask = pc.greater_equal(w, window_min)
        if window_max is not None:
            m2 = pc.less_equal(w, window_max)
            mask = m2 if mask is None else pc.and_(mask, m2)
        t = t.filter(mask)
    return t


class BucketWriter:
    """map_groups fn over bucket: encode + atomic write + manifest; returns
    one summary row per bucket.

    core_table (optional): mergeable per-window core rows (CORE_SCHEMA,
    incl. last_ts/last_tb/tdigest) persisted alongside the blocks as
    ``core.parquet`` — the partial-aggregate state that makes incremental
    appends possible (stages/incremental.py).  extra_meta lands in the
    manifest (e.g. the consumed input-file list)."""

    def __init__(self, out_dir: str, tier: str, cfg: EngineConfig,
                 input_tag: str, cfg_hash: str):
        from logtrics_ray.state import manifest as M
        self.M = M
        self.out_dir, self.tier, self.cfg = out_dir, tier, cfg
        self.input_tag, self.cfg_hash = input_tag, cfg_hash

    def __call__(self, group: pa.Table, core_table: pa.Table | None = None,
                 extra_meta: dict | None = None) -> pa.Table:
        bucket = int(group["bucket"][0].as_py())
        data = group.drop_columns(["bucket"])
        blocks = _encode_blocks(data, self.cfg.block_len)
        h = _blocks_content_hash(blocks)

        def write_files(tmp_dir):
            pq.write_table(blocks, os.path.join(tmp_dir, "blocks.parquet"))
            if core_table is not None:
                pq.write_table(core_table, os.path.join(tmp_dir, "core.parquet"))

        wmin = int(pa.compute.min(data["window_start"]).as_py())
        wmax = int(pa.compute.max(data["window_start"]).as_py())
        nseries = len(set(blocks["series_key"].to_pylist()))
        self.M.write_partition(
            self.out_dir, self.tier, bucket, write_files,
            meta=dict(extra_meta or {},
                      input_tag=self.input_tag, cfg_hash=self.cfg_hash,
                      rows=data.num_rows, series=nseries, blocks=blocks.num_rows,
                      window_min=wmin, window_max=wmax,
                      content_hash=h))
        return pa.Table.from_pydict(
            dict(tier=[self.tier], bucket=[bucket], rows=[data.num_rows],
                 series=[nseries], blocks=[blocks.num_rows],
                 window_min=[wmin], window_max=[wmax]), schema=SUMMARY_SCHEMA)


def write_tier(final_ds, out_dir: str, tier: str, cfg: EngineConfig,
               input_tag: str, cfg_hash: str, skip_buckets: set[int] | None = None):
    """Final tier rows -> partitioned Gorilla parquet.  Returns the small
    summary Dataset (one row per written bucket)."""
    ds = add_bucket_column(final_ds, cfg)
    if skip_buckets:
        skip = set(skip_buckets)
        ds = ds.map_batches(
            lambda t: t.filter(pa.compute.invert(pa.compute.is_in(
                t["bucket"], value_set=pa.array(sorted(skip), pa.int64())))),
            batch_format="pyarrow")
    writer = BucketWriter(out_dir, tier, cfg, input_tag, cfg_hash)

    def write_bucket(group: pa.Table) -> pa.Table:
        return writer(group)

    return ds.groupby("bucket").map_groups(write_bucket, batch_format="pyarrow")


def read_tier(out_dir: str, tier: str,
              window_min: int | None = None,
              window_max: int | None = None,
              columns=None):
    """Read a tier back as a Dataset of decoded final rows (streaming).

    Time-range queries prune at THREE levels before any decode work:
      1. bucket PARTITIONS whose manifest [window_min, window_max] does
         not intersect the range are never opened (driver-side, one
         JSON stat per partition);
      2. BLOCK rows are filtered at the parquet scan on their stored
         (window_lo, window_hi) extents — pyarrow pushes the predicate
         to row-group statistics, so non-overlapping row groups are not
         read off storage;
      3. decoded rows are trimmed to the exact range (edge blocks only
         overlap it).
    ``columns``: value-column subset — unrequested Gorilla planes are
    neither READ (parquet column prune) nor decoded; key columns are
    always present.  At a 100 TB tier a "count of series X last week"
    touches kilobytes, not the tier."""
    import json as _json

    import pyarrow.compute as pc
    import ray.data as rd

    from logtrics_ray.config import TIERS
    from logtrics_ray.state.manifest import MANIFEST_NAME
    width_ms = TIERS[tier]
    path = os.path.join(out_dir, f"tier={tier}")
    files = []
    for bucket_dir in sorted(os.listdir(path)):
        if "." in bucket_dir:      # .tmp / .old working dirs are not partitions
            continue
        f = os.path.join(path, bucket_dir, "blocks.parquet")
        if not os.path.isfile(f):
            continue
        if window_min is not None or window_max is not None:
            mpath = os.path.join(path, bucket_dir, MANIFEST_NAME)
            try:
                m = _json.load(open(mpath))
                lo, hi = m.get("window_min"), m.get("window_max")
                if lo is None and m.get("rows", 1) == 0:
                    continue                    # empty partition
                if (lo is not None and hi is not None
                        and ((window_max is not None and lo > window_max)
                             or (window_min is not None and hi < window_min))):
                    continue                    # disjoint partition
            except (OSError, ValueError):
                pass                            # no/bad manifest: read it
        files.append(f)
    if not files:
        return rd.from_arrow(decode_blocks(BLOCK_SCHEMA.empty_table(),
                                           width_ms, columns=columns))
    read_kw = {}
    if window_min is not None or window_max is not None:
        expr = None
        if window_max is not None:
            expr = pc.field("window_lo") <= window_max
        if window_min is not None:
            e2 = pc.field("window_hi") >= window_min
            expr = e2 if expr is None else expr & e2
        read_kw["filter"] = expr
    if columns is not None:
        keys = ["series_key", "metric_type", "window_lo", "window_hi",
                "n", "b_ts"]
        planes = [f"b_{c}" for c in decode_columns_needed(columns)]
        if "gap_filled" in set(columns):
            planes.append("b_gap")
        read_kw["columns"] = keys + planes
    ds = rd.read_parquet(files, **read_kw)
    return ds.map_batches(
        lambda t: decode_blocks(t.combine_chunks(), width_ms,
                                columns=columns, window_min=window_min,
                                window_max=window_max),
        batch_format="pyarrow")


def write_empty_partition(out_dir: str, tier: str, bucket: int,
                          cfg: EngineConfig, input_tag: str, cfg_hash: str,
                          extra_meta: dict | None = None,
                          write_core: bool = False) -> dict:
    """Write a rows=0 partition + manifest for a bucket that received no
    points.  Makes completeness a property of the RUN, not of series
    hashing: a fully-complete resumed run early-exits instead of
    re-extracting everything just to rediscover the empty groups, and
    incremental lineage stays consistent for buckets born empty."""
    from logtrics_ray.stages.rollup import CORE_SCHEMA
    from logtrics_ray.state import manifest as M

    def write_files(tmp_dir):
        pq.write_table(BLOCK_SCHEMA.empty_table(),
                       os.path.join(tmp_dir, "blocks.parquet"))
        if write_core:
            pq.write_table(CORE_SCHEMA.empty_table(),
                           os.path.join(tmp_dir, "core.parquet"))

    return M.write_partition(
        out_dir, tier, bucket, write_files,
        meta=dict(extra_meta or {}, input_tag=input_tag, cfg_hash=cfg_hash,
                  rows=0, series=0, blocks=0,
                  window_min=None, window_max=None,
                  content_hash=hashlib.blake2b(b"", digest_size=8).hexdigest()))


def _canonical_core_order(core: pa.Table) -> pa.Table:
    """Persisted ``core.parquet`` rows in canonical (series_key,
    metric_type, window_start) order.

    The rollup/merge kernels emit rows in series FIRST-APPEARANCE order
    (dictionary-encode codes) — under the hash exchange that order
    follows task completion, so without this sort the persisted merge
    state would differ run-to-run (finalized tier data is unaffected:
    the scan re-sorts).  One small sort per bucket pins bit-identical
    resume across every exchange/shuffle_impl mode."""
    if core.num_rows == 0:
        return core
    keys = pa.table({
        "s": pa.compute.cast(core["series_key"], pa.string()),
        "m": pa.compute.cast(core["metric_type"], pa.string()),
        "w": core["window_start"],
    })
    order = pa.compute.sort_indices(
        keys, sort_keys=[("s", "ascending"), ("m", "ascending"),
                         ("w", "ascending")])
    return core.take(order)


class BucketFinalizeWriter:
    """Fused finalize + Gorilla encode + atomic write for one bucket.

    One shuffle (groupby output bucket over the SMALL core rows) replaces
    the separate finalize groupby + write groupby: the dense gap-filled
    rows exist only transiently inside this group call, never crossing
    the object store.  Per-series semantics delegate to
    seriesscan.scan_group — bit-identical to the two-stage path.
    """

    def __init__(self, out_dir: str, tier: str, width_ms: int, cfg: EngineConfig,
                 input_tag: str, cfg_hash: str, global_max_w: int | None = None,
                 write_core: bool = False):
        self.inner = BucketWriter(out_dir, tier, cfg, input_tag, cfg_hash)
        self.width_ms = width_ms
        self.cfg = cfg
        self.global_max_w = global_max_w
        self.write_core = write_core

    def __call__(self, group: pa.Table, extra_meta: dict | None = None) -> pa.Table:
        from logtrics_ray.stages.seriesscan import scan_bucket
        group = group.combine_chunks()
        bucket = int(group["bucket"][0].as_py())
        data = group.drop_columns(["bucket"])
        finalized = scan_bucket(data, self.width_ms, self.cfg, self.global_max_w)
        finalized = finalized.append_column(
            "bucket", pa.array(np.full(finalized.num_rows, bucket, dtype=np.int64)))
        return self.inner(finalized,
                          core_table=(_canonical_core_order(data)
                                      if self.write_core else None),
                          extra_meta=extra_meta)


def write_tier_finalized(core_ds, out_dir: str, tier: str, width_ms: int,
                         cfg: EngineConfig, input_tag: str, cfg_hash: str,
                         skip_buckets: set[int] | None = None,
                         global_max_w: int | None = None):
    """Core rollup rows -> finalize + Gorilla blocks in ONE shuffle.
    Returns the small summary Dataset (one row per written bucket)."""
    ds = add_bucket_column(core_ds, cfg)
    if skip_buckets:
        skip = pa.array(sorted(set(skip_buckets)), pa.int64())
        ds = ds.map_batches(
            lambda t: t.filter(pa.compute.invert(
                pa.compute.is_in(t["bucket"], value_set=skip))),
            batch_format="pyarrow")
    writer = BucketFinalizeWriter(out_dir, tier, width_ms, cfg, input_tag,
                                  cfg_hash, global_max_w)

    def finalize_write_bucket(group: pa.Table) -> pa.Table:
        return writer(group)

    return ds.groupby("bucket").map_groups(finalize_write_bucket,
                                           batch_format="pyarrow")


def _blocks_content_hash(blocks: pa.Table) -> str:
    """Stable per-partition content hash over (series, window_lo, n) of
    every block row — shared by the writer and the retention purge so a
    purged partition's manifest hash validates the same way."""
    h = hashlib.blake2b(digest_size=8)
    for i in range(blocks.num_rows):
        h.update(blocks["series_key"][i].as_py().encode())
        h.update(np.int64(blocks["window_lo"][i].as_py()).tobytes())
        h.update(np.int32(blocks["n"][i].as_py()).tobytes())
    return h.hexdigest()


def _truncate_straddling_block(blocks: pa.Table, i: int,
                               cutoff_ms: int) -> dict | None:
    """Re-encode the kept SUFFIX of one block that straddles the cutoff
    (windows are ascending inside a block, so the keep-set is a suffix).
    Returns the new block row dict, or None if nothing survives."""
    w = gorilla.decode_timestamps(blocks["b_ts"][i].as_py())
    keep = w >= cutoff_ms
    k = int(keep.sum())
    if k == 0:
        return None
    row = {
        "series_key": blocks["series_key"][i].as_py(),
        "metric_type": blocks["metric_type"][i].as_py(),
        "window_lo": int(w[keep][0]),
        "window_hi": int(blocks["window_hi"][i].as_py()),
        "n": k,
        "b_ts": gorilla.encode_timestamps(w[keep]),
        "b_gap": gorilla.encode_bools(
            gorilla.decode_bools(blocks["b_gap"][i].as_py())[keep]),
    }
    for c in VALUE_COLS:
        row[f"b_{c}"] = gorilla.encode_floats(
            gorilla.decode_floats(blocks[f"b_{c}"][i].as_py())[keep])
    return row


def _purge_partition(out_dir: str, tier: str, bucket: int, cutoff_ms: int,
                     manifest: dict) -> dict:
    """Rewrite one straddling partition in place (atomic swap): blocks
    wholly past the cutoff are dropped, blocks wholly inside are kept
    BYTE-VERBATIM (no decode), the one straddling block per series is
    suffix-re-encoded; ``core.parquet`` (incremental partial state) is
    row-filtered the same way.  The manifest keeps its lineage fields
    (input_tag / cfg_hash / input_files) and refreshes rows / series /
    blocks / window range / content_hash."""
    from logtrics_ray.state import manifest as M
    pdir = M.partition_dir(out_dir, tier, bucket)
    blocks = pq.read_table(os.path.join(pdir, "blocks.parquet"))
    lo = blocks["window_lo"].to_numpy()
    hi = blocks["window_hi"].to_numpy()
    keep_whole = lo >= cutoff_ms
    straddle = (lo < cutoff_ms) & (hi >= cutoff_ms)
    parts = [blocks.filter(pa.array(keep_whole))]
    for i in np.flatnonzero(straddle):
        row = _truncate_straddling_block(blocks, int(i), cutoff_ms)
        if row is not None:
            parts.append(pa.Table.from_pylist([row], schema=BLOCK_SCHEMA))
    new_blocks = pa.concat_tables(parts) if len(parts) > 1 else parts[0]

    core_path = os.path.join(pdir, "core.parquet")
    new_core = None
    if os.path.isfile(core_path):
        core = pq.read_table(core_path)
        new_core = core.filter(
            pa.compute.greater_equal(core["window_start"], cutoff_ms))

    def write_files(tmp_dir):
        pq.write_table(new_blocks, os.path.join(tmp_dir, "blocks.parquet"))
        if new_core is not None:
            pq.write_table(new_core, os.path.join(tmp_dir, "core.parquet"))

    rows = int(pa.compute.sum(new_blocks["n"]).as_py() or 0)
    meta = {k: v for k, v in manifest.items()
            if k not in ("rows", "series", "blocks", "window_min",
                         "window_max", "content_hash", "tier", "bucket")}
    meta.update(
        rows=rows,
        series=len(set(new_blocks["series_key"].to_pylist())),
        blocks=new_blocks.num_rows,
        window_min=(int(pa.compute.min(new_blocks["window_lo"]).as_py())
                    if new_blocks.num_rows else None),
        window_max=(int(pa.compute.max(new_blocks["window_hi"]).as_py())
                    if new_blocks.num_rows else None),
        content_hash=_blocks_content_hash(new_blocks))
    return M.write_partition(out_dir, tier, bucket, write_files, meta)


def purge_tier(out_dir: str, tier: str, cutoff_ms: int,
               parallel: bool = True) -> dict:
    """RETENTION PURGE of a persisted tier: delete every window strictly
    older than ``cutoff_ms`` from storage — a storage-level row filter,
    never a recompute (history-bearing columns like cumulative/EWMA keep
    the values they were computed with; only their expired rows vanish).

    Manifest-driven three-way split, so re-running is an O(manifests)
    no-op (idempotent):

    - ``window_min >= cutoff`` (or empty): fully live — untouched.
    - ``window_max <  cutoff``: fully expired — becomes a rows=0
      partition (atomic swap) that KEEPS its lineage meta, so resume /
      incremental append still sees the bucket as complete.
    - straddling: block-level surgery via ``_purge_partition`` — only
      the straddling block per series is ever decoded.

    Rewrites fan out as Ray tasks (one per affected bucket; partitions
    live on storage every worker can reach — same assumption as the
    writer).  Returns {"kept": n, "emptied": n, "rewritten": n}.
    """
    import ray
    from logtrics_ray.state import manifest as M

    work: list[tuple[int, dict, bool]] = []   # (bucket, manifest, full_drop)
    kept = 0
    for m in M.load_manifests(out_dir, tier):
        wmin, wmax = m.get("window_min"), m.get("window_max")
        if wmin is None or wmin >= cutoff_ms:
            kept += 1
        elif wmax < cutoff_ms:
            work.append((int(m["bucket"]), m, True))
        else:
            work.append((int(m["bucket"]), m, False))

    def one(bucket: int, manifest: dict, full_drop: bool) -> bool:
        if full_drop:
            meta = {k: v for k, v in manifest.items()
                    if k not in ("rows", "series", "blocks", "window_min",
                                 "window_max", "content_hash", "tier",
                                 "bucket")}
            has_core = os.path.isfile(os.path.join(
                M.partition_dir(out_dir, tier, bucket), "core.parquet"))
            write_empty_partition(out_dir, tier, bucket,
                                  EngineConfig(), manifest["input_tag"],
                                  manifest["cfg_hash"], extra_meta=meta,
                                  write_core=has_core)
        else:
            _purge_partition(out_dir, tier, bucket, cutoff_ms, manifest)
        return full_drop

    if parallel and work:
        rtask = ray.remote(num_cpus=1)(one)
        results = ray.get([rtask.remote(*wk) for wk in work])
    else:
        results = [one(*wk) for wk in work]
    emptied = sum(1 for r in results if r)
    return {"kept": kept, "emptied": emptied,
            "rewritten": len(results) - emptied}
