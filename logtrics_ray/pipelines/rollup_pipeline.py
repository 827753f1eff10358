"""The flagship end-to-end pipeline (SURVEY.md §3.2 spine).

    read_parquet(token table)
      -> RuleExtractor actor pool (points)
      -> rollup_base @1m (salted two-phase groupby)
      -> cascade 1m -> 1h -> 1d            (continuous aggregates)
      -> finalize per tier (per-series scan: gap-fill/cumulative/EWMA)
      -> write per tier (Gorilla blocks, partitioned parquet, manifests)

Resume: completed (input, config)-matching buckets are skipped — at the
source if complete in every tier, and per tier at the write.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import ray.data as rd

from logtrics_ray.config import TIERS, EngineConfig
from logtrics_ray.hashing import series_bucket_array
from logtrics_ray.rules import RuleSpec, default_rules
from logtrics_ray.stages.cascade import cascade, cascade_bucketed
from logtrics_ray.stages.extract import extract_points
from logtrics_ray.stages.rollup import rollup_base, rollup_base_bucketed
from logtrics_ray.stages.seriesscan import finalize_tier
from logtrics_ray.stages import storage
from logtrics_ray.state import manifest as M


def read_token_table(path: str, num_blocks: int | None = None):
    """Column-pruned read: only what extraction needs leaves storage.

    Directories expand to their TOP-LEVEL shards only — side tables
    (e.g. the oracle's ``text/`` subdir) are not part of the input.

    Block planning: Ray's default target-block-size planning splits this
    table into ~hundreds of small blocks (a SplitBlocks operator), which
    BREAKS Read->Map fusion — every decoded token block then round-trips
    through the object store between the read and extraction, and the
    decoded ``tokens`` column is the fattest intermediate of the whole
    pipeline (~3.2 GB at sf0.1 vs a ~280 MB exchange).  Plan ~1 read
    block per granted CPU instead (coarsen-only: a block is still capped
    at ~256 MB on disk, so at cluster scale this converges to the
    natural per-row-group granularity and the override is a no-op in
    spirit).  Measured at sf0.1: e2e 18.1 s -> 10.3 s at 32 CPUs,
    48.2 s -> ~22 s at 8 CPUs.  Output bits are block-layout-invariant
    by design (salted deterministic merge order; pinned in tests).

    NOTE: coarse blocks are NECESSARY but not SUFFICIENT for fusion —
    the first map after the read must also leave ``batch_size=None``
    (an explicit batch_size keeps ReadParquet a separate operator; see
    ``extract_points``).  With both in place the plan shows ONE fused
    ``ReadParquet->MapBatches(...)`` operator (e2e 7.9 s -> 6.2 s on
    top of the block-planning win)."""
    if os.path.isdir(path):
        files = sorted(os.path.join(path, f) for f in os.listdir(path)
                       if f.endswith(".parquet"))
        if files:
            path = files
    if num_blocks is None:
        num_blocks = _read_num_blocks(path if isinstance(path, list) else [path])
    return rd.read_parquet(path, columns=["doc_id", "tokens", "n_tok", "source"],
                           override_num_blocks=num_blocks)


_READ_BLOCK_DISK_BYTES = 256 << 20


def _read_num_blocks(files: list[str]) -> int:
    """~1 read block per granted CPU, but never exceeding ~256 MB of
    on-disk parquet per block (the cap keeps per-task heap bounded and
    makes the policy degrade to natural granularity on huge inputs)."""
    try:
        import ray
        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
    except Exception:
        cpus = 8
    try:
        total = sum(os.path.getsize(f) for f in files)
    except OSError:
        return max(8, cpus)
    import math
    # lower clamp ~1 MB/block: on tiny inputs "one block per CPU" would
    # SPLIT finer than natural planning instead of coarsening
    want = min(cpus, max(1, math.ceil(total / (1 << 20))))
    return max(want, math.ceil(total / _READ_BLOCK_DISK_BYTES))


def build_core_tiers(points_ds, cfg: EngineConfig, two_phase: bool = True,
                     mode: str = "bucket") -> dict:
    """points -> {tier: core-rows Dataset}; 1h/1d cascade from 1m.

    mode="bucket" (default): one-shuffle bucket-major vectorized rollup.
    mode="grouped": per-series group calls (fused or two_phase per flag).
    All modes are bit-identical (asserted in tests)."""
    core = {}
    prev = None
    for tier in cfg.tiers:
        if prev is None:
            if mode == "bucket":
                ds = rollup_base_bucketed(points_ds, TIERS[tier], cfg)
            else:
                ds = rollup_base(points_ds, TIERS[tier], cfg, two_phase=two_phase)
        elif mode == "bucket":
            ds = cascade_bucketed(core[prev], TIERS[tier], cfg.rollup_buckets)
        else:
            ds = cascade(core[prev], TIERS[tier])
        # core rows are tiny vs the input; materialize so the cascade and
        # the finalize stage don't re-execute the upstream shuffles.
        core[tier] = ds.materialize()
        prev = tier
    return core


def _record_metrics(out_dir: str, cfg: EngineConfig, mode: str,
                    input_tag: str, cfg_hash: str, t0: float, results: dict,
                    resumed: dict | None = None, stats: str | None = None,
                    extra: dict | None = None) -> None:
    """Persist the run-level metrics artifact (_RUN_METRICS.json): wall
    time, per-tier totals from the manifests, resume accounting and the
    Ray Data per-operator stats text of the final execution."""
    from logtrics_ray.state import runmeta
    payload = {
        "mode": mode, "exchange": cfg.exchange,
        "input_tag": input_tag, "cfg_hash": cfg_hash,
        "wall_s": round(time.perf_counter() - t0, 3),
        "tiers": runmeta.tier_totals(results),
        "resumed_buckets": {t: len(b) for t, b in (resumed or {}).items()},
    }
    if extra:
        payload.update(extra)
    if stats:
        payload["ray_stats"] = stats
    runmeta.write_run_metrics(out_dir, payload)


def run(input_path: str, out_dir: str, cfg: EngineConfig | None = None,
        rules: tuple[RuleSpec, ...] | None = None, two_phase: bool = True,
        input_tag: str | None = None, resume: bool = True,
        mode: str = "fused") -> dict:
    """Full pipeline.  Returns {tier: [bucket summary dicts]}.

    mode="fused" (default): ONE all-to-all exchange — extraction feeds a
    single groupby(output bucket); rollup, cascades, finalize and the
    Gorilla writes of every tier run bucket-local inside the group call.
    mode="staged": separate rollup/cascade/write shuffles with per-tier
    overlap.  Output bits, manifests and resume semantics are identical
    (asserted in tests)."""
    if mode == "fused":
        return run_fused(input_path, out_dir, cfg=cfg, rules=rules,
                         input_tag=input_tag, resume=resume)
    t0 = time.perf_counter()
    cfg = cfg or EngineConfig()
    rules = rules or default_rules()
    input_tag = input_tag or input_path
    cfg_hash = M.config_hash(cfg, rules)

    done = {t: (M.completed_buckets(out_dir, t, input_tag, cfg_hash) if resume else set())
            for t in cfg.tiers}
    done_everywhere = set.intersection(*done.values()) if done else set()
    all_buckets = set(range(cfg.series_buckets))
    if done_everywhere >= all_buckets:
        results = {t: M.load_manifests(out_dir, t) for t in cfg.tiers}
        _record_metrics(out_dir, cfg, "staged(resume-complete)", input_tag,
                        cfg_hash, t0, results, resumed=done)
        return results

    ds = read_token_table(input_path)
    points = extract_points(ds, rules, cfg)
    if done_everywhere:
        skip = pa.array(sorted(done_everywhere), pa.int64())

        def drop_done(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            b = series_bucket_array(t["series_key"], cfg.series_buckets)
            return t.filter(pa.compute.invert(
                pa.compute.is_in(pa.array(b, pa.int64()), value_set=skip)))

        points = points.map_batches(drop_done, batch_format="pyarrow")

    # Interleave: each tier's write starts as soon as its core rows are
    # materialized, while the next cascade computes concurrently (separate
    # driver threads each drive one Ray execution; Ray schedules both).
    from concurrent.futures import ThreadPoolExecutor

    def write_one(tier, core_ds):
        return storage.write_tier_finalized(
            core_ds, out_dir, tier, TIERS[tier], cfg, input_tag, cfg_hash,
            skip_buckets=done[tier] - done_everywhere).materialize()

    results = {}
    with ThreadPoolExecutor(max_workers=len(cfg.tiers)) as pool:
        futures = []
        core_prev = None
        for tier in cfg.tiers:
            if core_prev is None:
                from logtrics_ray.stages.rollup import rollup_base_bucketed
                core = rollup_base_bucketed(points, TIERS[tier], cfg).materialize()
            else:
                from logtrics_ray.stages.cascade import cascade_bucketed
                core = cascade_bucketed(core_prev, TIERS[tier],
                                        cfg.rollup_buckets).materialize()
            futures.append(pool.submit(write_one, tier, core))
            core_prev = core
        summaries = [f.result() for f in futures]
    # rows=0 manifests for unobserved buckets (no input_files/core here:
    # the staged path's non-empty partitions carry neither — incremental
    # appends are the fused path's feature).
    from logtrics_ray.stages.storage import write_empty_partition
    for tier, summary in zip(cfg.tiers, summaries):
        observed = {int(r["bucket"]) for r in
                    summary.select_columns(["bucket"]).take_all()}
        complete = observed | done[tier]
        for bucket in range(cfg.series_buckets):
            if bucket not in complete:
                write_empty_partition(out_dir, tier, bucket, cfg, input_tag,
                                      cfg_hash)
    for tier in cfg.tiers:
        results[tier] = M.load_manifests(out_dir, tier)
    _record_metrics(out_dir, cfg, "staged", input_tag, cfg_hash, t0, results,
                    resumed=done,
                    stats=summaries[-1].stats() if summaries else None)
    return results


class _FusedBucketWorker:
    """Per-output-bucket fused stage: 1m rollup (or salt-ordered partial
    merge when fed by the salted exchange) -> cascade 1h/1d -> finalize
    -> Gorilla write, all inside ONE group call.

    With ``exchange="direct"`` the engine needs exactly ONE all-to-all
    (the narrow points table, hash-partitioned by output bucket); with
    the salted default it is two — the points by (bucket, salt), then
    only the per-(series, window, salt) PARTIAL rows by bucket
    (``from_partials=True``).  Either way every later step is
    bucket-local and output bits match the staged path (asserted in
    tests)."""

    from_partials: bool = False   # input = PARTIAL_CORE rows (salted exchange)

    def __init__(self, out_dir: str, cfg: EngineConfig, input_tag: str,
                 cfg_hash: str, done: dict[str, set],
                 input_files: list[str] | None = None,
                 merge_stored: bool = False,
                 merge_files: list[str] | None = None):
        from logtrics_ray.stages.storage import BucketFinalizeWriter
        self.cfg = cfg
        self.done = done
        self.out_dir = out_dir
        self.input_tag, self.cfg_hash = input_tag, cfg_hash
        self.input_files = sorted(input_files or [])
        self.merge_stored = merge_stored
        # Shards whose points are in THIS pass, indexed by the `_shard`
        # column (incremental path only).  Per bucket, shards already in
        # the stored manifest's lineage are filtered out BEFORE the merge,
        # so re-applying the same shards (task retry, driver crash between
        # bucket commits) is idempotent — never double-counted.
        self.merge_files = list(merge_files or [])
        first = cfg.tiers[0]
        # The first tier persists its mergeable core rows (core.parquet) —
        # the partial-aggregate state incremental appends merge into.
        self.writers = {
            tier: BucketFinalizeWriter(out_dir, tier, TIERS[tier], cfg,
                                       input_tag, cfg_hash,
                                       write_core=(tier == first))
            for tier in cfg.tiers
        }

    def __call__(self, group: pa.Table) -> pa.Table:
        # Opt-in skew diagnostics: LT_BUCKET_TIMING_DIR=<dir> makes every
        # bucket-merge task drop a one-line JSON with its wall time, so a
        # straggler bucket can be attributed to data (rows_in) vs host.
        timing_dir = os.environ.get("LT_BUCKET_TIMING_DIR")
        if timing_dir:
            t0 = time.perf_counter()
            out = self._call_inner(group)
            b = int(group["sbucket"][0].as_py()) if group.num_rows else -1
            with open(os.path.join(
                    timing_dir,
                    f"{b}_{os.getpid()}_{time.monotonic_ns()}.json"),
                    "w") as f:
                json.dump({"bucket": b, "rows_in": group.num_rows,
                           "sec": round(time.perf_counter() - t0, 4)}, f)
            return out
        return self._call_inner(group)

    def _call_inner(self, group: pa.Table) -> pa.Table:
        import numpy as np
        from logtrics_ray.stages.cascade import _cascade_bucket_fn
        from logtrics_ray.stages.rollup import (CORE_SCHEMA, _bucket_rollup_fn,
                                                merge_bucket_partials_fn)
        from logtrics_ray.stages.storage import SUMMARY_SCHEMA
        group = group.combine_chunks()
        bucket = int(group["sbucket"][0].as_py())
        data = group.drop_columns(["sbucket"])
        if self.from_partials:
            from logtrics_ray.stages.rollup import CORE_SCHEMA as _CS
            new_core = (merge_bucket_partials_fn(data) if data.num_rows
                        else _CS.empty_table())
            meta = {"input_files": self.input_files}
            if self.merge_stored:
                # Incremental via the salted exchange: shard filtering
                # already happened per (bucket, salt) in stage 1; here we
                # only merge the stored core with the new core rows.
                from logtrics_ray.stages.incremental import (merge_cores,
                                                             stored_core)
                prev, prev_files = stored_core(
                    self.out_dir, self.cfg.tiers[0], bucket,
                    self.input_tag, self.cfg_hash)
                core = (merge_cores(prev, new_core) if new_core.num_rows
                        else (prev if prev is not None else new_core))
                meta = {"input_files": sorted(set(prev_files)
                                              | set(self.input_files))}
            else:
                core = new_core
            return self._write_tiers(bucket, core, meta)
        meta = {"input_files": self.input_files}
        if self.merge_stored:
            from logtrics_ray.stages.incremental import merge_cores, stored_core
            prev, prev_files = stored_core(self.out_dir, self.cfg.tiers[0],
                                           bucket, self.input_tag, self.cfg_hash)
            # Idempotency guard: merge only shards this bucket has NOT
            # yet consumed (per-point provenance via the _shard column).
            if "_shard" in data.column_names:
                consumed = {i for i, f in enumerate(self.merge_files)
                            if f in set(prev_files)}
                if consumed:
                    keep_ids = pa.array(
                        [i for i in range(len(self.merge_files))
                         if i not in consumed], pa.int32())
                    data = data.filter(
                        pa.compute.is_in(data["_shard"], value_set=keep_ids))
                data = data.drop_columns(["_shard"])
            core = (merge_cores(prev, _bucket_rollup_fn(data))
                    if data.num_rows else
                    (prev if prev is not None else CORE_SCHEMA.empty_table()))
            meta = {"input_files": sorted(set(prev_files) | set(self.input_files))}
        else:
            if "_shard" in data.column_names:
                data = data.drop_columns(["_shard"])
            core = _bucket_rollup_fn(data)
        return self._write_tiers(bucket, core, meta)

    def _write_tiers(self, bucket: int, core: pa.Table, meta: dict) -> pa.Table:
        import numpy as np
        from logtrics_ray.stages.cascade import _cascade_bucket_fn
        from logtrics_ray.stages.storage import SUMMARY_SCHEMA
        out = []
        for i, tier in enumerate(self.cfg.tiers):
            if i > 0 and core.num_rows:
                core = _cascade_bucket_fn(core, TIERS[tier])
            if bucket in self.done.get(tier, ()):
                continue
            if core.num_rows == 0:
                from logtrics_ray.stages.storage import write_empty_partition
                write_empty_partition(self.out_dir, tier, bucket, self.cfg,
                                      self.input_tag, self.cfg_hash,
                                      extra_meta=meta,
                                      write_core=(tier == self.cfg.tiers[0]))
                out.append(pa.Table.from_pydict(
                    dict(tier=[tier], bucket=[bucket], rows=[0], series=[0],
                         blocks=[0], window_min=[None], window_max=[None]),
                    schema=SUMMARY_SCHEMA))
                continue
            with_bucket = core.append_column(
                "bucket", pa.array(np.full(core.num_rows, bucket, dtype=np.int64)))
            out.append(self.writers[tier](with_bucket, extra_meta=meta))
        return pa.concat_tables(out) if out else SUMMARY_SCHEMA.empty_table()


def _empty_summary() -> pa.Table:
    from logtrics_ray.stages.storage import SUMMARY_SCHEMA
    return SUMMARY_SCHEMA.empty_table()


def _exchange_partitions(cfg: EngineConfig) -> int:
    """Hash-exchange partition count: ~1x the cluster's cores (each
    partition is one streaming aggregator), clamped to [8, 512]."""
    if cfg.exchange_partitions:
        return cfg.exchange_partitions
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(8, min(512, cpus))


from contextlib import contextmanager


@contextmanager
def _shuffle_ctx(cfg: EngineConfig):
    """Scope Ray's shuffle strategy to this pipeline's exchange executions.

    HASH_SHUFFLE streams map-side blocks straight into partition
    aggregator actors — no boundary sampling and no sort machinery, which
    at sf0.1 halves the exchange wall vs the sort path.  The strategy is
    a DataContext global, so it is set only around the fused exchanges
    and restored after (other operators — ds.sort, dedup joins — keep
    their own defaults)."""
    if cfg.shuffle_impl != "hash":
        yield
        return
    from ray.data.context import DataContext, ShuffleStrategy
    ctx = DataContext.get_current()
    prev = (ctx.shuffle_strategy, ctx.max_hash_shuffle_aggregators)
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.max_hash_shuffle_aggregators = max(4, _exchange_partitions(cfg) // 2)
    try:
        yield
    finally:
        ctx.shuffle_strategy, ctx.max_hash_shuffle_aggregators = prev


def _iter_groups(t: pa.Table, col: str):
    """Yield each complete ``col`` group of one hash partition block
    (sorted by ``col``; rows within a group keep arrival order — every
    downstream reduction imposes its own (ts, tiebreak, value) total
    order, so arrival order never reaches the output bits)."""
    import numpy as np
    import pyarrow.compute as pc
    if t.num_rows == 0:
        return
    t = t.combine_chunks()
    order = pc.sort_indices(t.select([col]), sort_keys=[(col, "ascending")])
    t = t.take(order).combine_chunks()
    k = t[col].to_numpy()
    bounds = np.flatnonzero(np.diff(k, prepend=k[0] - 1, append=k[-1] + 1))
    for i in range(bounds.size - 1):
        yield t.slice(bounds[i], bounds[i + 1] - bounds[i])


def _grouped_apply(ds, key: str, fn, cfg: EngineConfig, empty_table_fn):
    """``groupby(key).map_groups(fn)`` under either shuffle_impl.

    "hash": hash-partition by ``key`` into _exchange_partitions blocks
    (each holds complete groups), then apply ``fn`` per group inside the
    block.  "sort": Ray's sort-based grouped map.  Both are barriers
    (all map-side input is consumed before any group output exists) —
    the incremental path's manifest-read-before-rewrite ordering relies
    on this."""
    if cfg.shuffle_impl == "hash":
        def block_fn(t: pa.Table) -> pa.Table:
            outs = [fn(g) for g in _iter_groups(t, key)]
            return pa.concat_tables(outs) if outs else empty_table_fn()
        return (ds.repartition(_exchange_partitions(cfg), keys=[key])
                .map_batches(block_fn, batch_format="pyarrow",
                             batch_size=None))
    return ds.groupby(key).map_groups(fn, batch_format="pyarrow")


def _input_file_names(input_path: str) -> list[str]:
    """Shard basenames of the input — the lineage unit for incremental."""
    if os.path.isdir(input_path):
        return sorted(f for f in os.listdir(input_path) if f.endswith(".parquet"))
    return [os.path.basename(input_path)]


def _prep_points(points_ds, cfg: EngineConfig):
    """points -> +window_start/salt/sbucket, dict-encoded for the exchange."""
    from logtrics_ray.stages.rollup import assign_windows
    pts = assign_windows(points_ds, TIERS[cfg.tiers[0]], cfg)
    nb = cfg.series_buckets

    def add_sbucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("sbucket", pa.array([], pa.int64()))
        b = series_bucket_array(t["series_key"], nb)
        t = t.append_column("sbucket", pa.array(b, pa.int64()))
        # Dictionary-encode the repeated-string columns for the exchange:
        # the shuffle payload drops ~25% (331 -> 247 MB at sf0.1) and the
        # worker reads them back via to_pylist identically.
        import pyarrow.compute as pc
        for c in ("series_key", "metric_type"):
            i = t.schema.get_field_index(c)
            t = t.set_column(i, c, pc.dictionary_encode(t[c].combine_chunks()))
        return t

    return pts.map_batches(add_sbucket, batch_format="pyarrow", zero_copy_batch=True)


def run_fused(input_path: str, out_dir: str, cfg: EngineConfig | None = None,
              rules: tuple[RuleSpec, ...] | None = None,
              input_tag: str | None = None, resume: bool = True) -> dict:
    """Single-shuffle fused pipeline (the default `run` path).  Same
    output bits, manifests and resume semantics as the staged run()."""
    t0 = time.perf_counter()
    cfg = cfg or EngineConfig()
    rules = rules or default_rules()
    input_tag = input_tag or input_path
    cfg_hash = M.config_hash(cfg, rules)

    done = {t: (M.completed_buckets(out_dir, t, input_tag, cfg_hash) if resume else set())
            for t in cfg.tiers}
    done_everywhere = set.intersection(*done.values()) if done else set()
    all_buckets = set(range(cfg.series_buckets))
    if done_everywhere >= all_buckets:
        results = {t: M.load_manifests(out_dir, t) for t in cfg.tiers}
        _record_metrics(out_dir, cfg, "fused(resume-complete)", input_tag,
                        cfg_hash, t0, results, resumed=done)
        return results

    # The shuffle-strategy scope must cover dataset CREATION, not just
    # execution: every Dataset snapshots the DataContext when built, and
    # the planner validates key-based repartition against that snapshot.
    with _shuffle_ctx(cfg):
        return _run_fused_body(input_path, out_dir, cfg, rules, input_tag,
                               cfg_hash, done, done_everywhere, t0)


def _run_fused_body(input_path: str, out_dir: str, cfg: EngineConfig, rules,
                    input_tag: str, cfg_hash: str, done: dict,
                    done_everywhere: set, t0: float) -> dict:
    pts = _prep_points(extract_points(read_token_table(input_path), rules, cfg), cfg)
    if done_everywhere:
        skip = pa.array(sorted(done_everywhere), pa.int64())
        pts = pts.map_batches(
            lambda t: t.filter(pa.compute.invert(
                pa.compute.is_in(t["sbucket"], value_set=skip))),
            batch_format="pyarrow")

    worker = _FusedBucketWorker(out_dir, cfg, input_tag, cfg_hash,
                                {t: d - done_everywhere for t, d in done.items()},
                                input_files=_input_file_names(input_path))

    def fused_bucket(group: pa.Table) -> pa.Table:
        return worker(group)

    # NOTE: no repartition() before the groupby — Ray re-executes the
    # upstream map chain inside RepartitionSplit (measured: total remote
    # CPU doubles, 118s -> 232s at sf0.1), so coalescing costs more than
    # the sort's per-block overhead it would save.
    if cfg.exchange == "salted":
        # Salted two-phase exchange (skew defense): exchange 1 groups by
        # (bucket, salt) so a hot series' points spread across
        # salt_buckets parallel partial tasks; exchange 2 moves only the
        # per-(series, window, salt) PARTIAL rows to the bucket merge.
        # Bits identical to the direct route (tests pin it).
        from logtrics_ray.stages.rollup import bucket_partials_table
        S = cfg.salt_buckets

        def add_xkey(t: pa.Table) -> pa.Table:
            x = pa.compute.add(pa.compute.multiply(t["sbucket"], S), t["salt"])
            return t.append_column("xkey", pa.compute.cast(x, pa.int64()))

        def stage1(g: pa.Table) -> pa.Table:
            g = g.combine_chunks()
            bucket = int(g["xkey"][0].as_py()) // S
            part = bucket_partials_table(g.drop_columns(["xkey", "sbucket"]))
            import numpy as np
            return part.append_column(
                "sbucket", pa.array(np.full(part.num_rows, bucket,
                                            dtype=np.int64)))

        worker.from_partials = True

        def empty_partials_sb() -> pa.Table:
            from logtrics_ray.stages.rollup import empty_partials_table
            return empty_partials_table().append_column(
                "sbucket", pa.array([], pa.int64()))

        partials = _grouped_apply(
            pts.map_batches(add_xkey, batch_format="pyarrow",
                            zero_copy_batch=True),
            "xkey", stage1, cfg, empty_partials_sb)
        summaries = _grouped_apply(
            partials, "sbucket", fused_bucket, cfg,
            _empty_summary).materialize()
    else:
        summaries = _grouped_apply(
            pts, "sbucket", fused_bucket, cfg, _empty_summary).materialize()
    _fill_empty_buckets(summaries, done, out_dir, cfg, input_tag, cfg_hash,
                        input_files=_input_file_names(input_path))
    results = {t: M.load_manifests(out_dir, t) for t in cfg.tiers}
    _record_metrics(out_dir, cfg, "fused", input_tag, cfg_hash, t0, results,
                    resumed=done, stats=summaries.stats())
    return results


def _fill_empty_buckets(summaries, done: dict[str, set], out_dir: str,
                        cfg: EngineConfig, input_tag: str, cfg_hash: str,
                        input_files: list[str]) -> None:
    """Write rows=0 manifests for buckets the shuffle never observed, so
    run completeness is bucket-set-complete (resume early-exit works) and
    incremental lineage covers buckets born empty."""
    from logtrics_ray.stages.storage import write_empty_partition
    observed: dict[str, set] = {t: set() for t in cfg.tiers}
    for row in summaries.select_columns(["tier", "bucket"]).take_all():
        observed.setdefault(row["tier"], set()).add(int(row["bucket"]))
    meta = {"input_files": sorted(input_files)}
    for tier in cfg.tiers:
        complete = observed[tier] | done.get(tier, set())
        for bucket in range(cfg.series_buckets):
            if bucket not in complete:
                write_empty_partition(out_dir, tier, bucket, cfg, input_tag,
                                      cfg_hash, extra_meta=meta,
                                      write_core=(tier == cfg.tiers[0]))


def run_incremental(input_path: str, out_dir: str, cfg: EngineConfig | None = None,
                    rules: tuple[RuleSpec, ...] | None = None,
                    input_tag: str | None = None) -> dict:
    """Append NEW input shards into existing tiers (stages/incremental.py).

    Reads only files not yet in the tier-1m manifests' lineage, extracts
    their points, and per bucket merges ``stored core ⊕ new core`` before
    re-cascading 1h/1d bucket-locally.  Cost is O(new data + touched core
    rows).  Merge semantics: exact for count/min/max/last, float sums
    regroup associatively (== full recompute up to reduction order),
    t-digests merge (accuracy bound unchanged) — asserted in tests.
    """
    import json
    t0 = time.perf_counter()
    cfg = cfg or EngineConfig()
    rules = rules or default_rules()
    input_tag = input_tag or input_path
    cfg_hash = M.config_hash(cfg, rules)
    first = cfg.tiers[0]

    files = _input_file_names(input_path)
    per_bucket = {}
    for m in M.load_manifests(out_dir, first):
        if m.get("input_tag") == input_tag and m.get("cfg_hash") == cfg_hash:
            per_bucket[int(m["bucket"])] = set(m.get("input_files", []))
    consumed = set.intersection(*per_bucket.values()) if per_bucket else set()
    new_files = [f for f in files if f not in consumed]
    if not new_files:
        results = {t: M.load_manifests(out_dir, t) for t in cfg.tiers}
        _record_metrics(out_dir, cfg, "incremental(no-new-shards)",
                        input_tag, cfg_hash, t0, results)
        return results

    paths = ([os.path.join(input_path, f) for f in new_files]
             if os.path.isdir(input_path) else [input_path])
    with _shuffle_ctx(cfg):   # covers dataset creation AND execution
        return _run_incremental_body(paths, new_files, files, input_path,
                                     out_dir, cfg, rules, input_tag,
                                     cfg_hash, per_bucket, t0)


def _run_incremental_body(paths, new_files, files, input_path, out_dir,
                          cfg, rules, input_tag, cfg_hash, per_bucket, t0):
    import json
    first = cfg.tiers[0]
    ds = rd.read_parquet(paths, columns=["doc_id", "tokens", "n_tok", "source"],
                         include_paths=True)
    shard_of = {f: i for i, f in enumerate(new_files)}

    def add_shard(t: pa.Table) -> pa.Table:
        # path -> shard index, via the (tiny) dictionary of distinct paths.
        enc = pa.compute.dictionary_encode(t["path"].combine_chunks()
                                           if isinstance(t["path"], pa.ChunkedArray)
                                           else t["path"])
        lut = pa.array([shard_of[os.path.basename(p.as_py())]
                        for p in enc.dictionary], pa.int32())
        shard = pa.compute.take(lut, enc.indices)
        return t.drop_columns(["path"]).append_column("_shard", shard)

    ds = ds.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
    pts = _prep_points(extract_points(ds, rules, cfg, passthrough=("_shard",)), cfg)
    # Lineage after this run = the full current listing (a bucket that got
    # nothing from a shard has still consumed it), so buckets born in this
    # append don't make old shards look unconsumed next time.  merge_files
    # indexes the _shard provenance column: per bucket, shards already in
    # the stored lineage are filtered out pre-merge (idempotent re-apply).
    worker = _FusedBucketWorker(out_dir, cfg, input_tag, cfg_hash, done={},
                                input_files=files, merge_stored=True,
                                merge_files=new_files)

    def inc_bucket(group: pa.Table) -> pa.Table:
        return worker(group)

    if cfg.exchange == "salted":
        # Salted incremental: the per-bucket consumed-shard filter moves
        # into stage 1 (each (bucket, salt) group reads its bucket's
        # manifest lineage from the shared output store — the same
        # assumption merge_stored already makes), so the hot-series skew
        # defense applies to appends too.
        # ORDERING SAFETY: stage 2 rewrites those manifests, but both
        # exchange implementations are BARRIERS (sort groupby's reduce
        # and hash repartition's aggregator finalize each consume ALL
        # map-side input first) — every stage-1 group task completes
        # (manifest reads done) before any stage-2 task starts, so
        # stage 1 can never observe a manifest updated by the same run.
        import json as _json
        import numpy as np
        from logtrics_ray.stages.rollup import (bucket_partials_table,
                                                empty_partials_table)
        S = cfg.salt_buckets
        first = cfg.tiers[0]

        def add_xkey(t: pa.Table) -> pa.Table:
            x = pa.compute.add(pa.compute.multiply(t["sbucket"], S), t["salt"])
            return t.append_column("xkey", pa.compute.cast(x, pa.int64()))

        def stage1(g: pa.Table) -> pa.Table:
            g = g.combine_chunks()
            bucket = int(g["xkey"][0].as_py()) // S
            mpath = os.path.join(M.partition_dir(out_dir, first, bucket),
                                 M.MANIFEST_NAME)
            prev_files: list = []
            if os.path.isfile(mpath):
                m = _json.load(open(mpath))
                if (m.get("input_tag") == input_tag
                        and m.get("cfg_hash") == cfg_hash):
                    prev_files = m.get("input_files", [])
            consumed = {i for i, f in enumerate(new_files)
                        if f in set(prev_files)}
            data = g.drop_columns(["xkey", "sbucket"])
            if consumed:
                keep = pa.array([i for i in range(len(new_files))
                                 if i not in consumed], pa.int32())
                data = data.filter(
                    pa.compute.is_in(data["_shard"], value_set=keep))
            data = data.drop_columns(["_shard"])
            part = (bucket_partials_table(data) if data.num_rows
                    else empty_partials_table())
            return part.append_column(
                "sbucket", pa.array(np.full(part.num_rows, bucket,
                                            dtype=np.int64)))

        worker.from_partials = True

        def empty_partials_sb() -> pa.Table:
            return empty_partials_table().append_column(
                "sbucket", pa.array([], pa.int64()))

        partials = _grouped_apply(
            pts.map_batches(add_xkey, batch_format="pyarrow",
                            zero_copy_batch=True),
            "xkey", stage1, cfg, empty_partials_sb)
        _grouped_apply(partials, "sbucket", inc_bucket, cfg,
                       _empty_summary).materialize()
    else:
        _grouped_apply(pts, "sbucket", inc_bucket, cfg,
                       _empty_summary).materialize()

    # Buckets untouched by the new shards: their data is already complete —
    # fast-forward the lineage so the next append sees a consistent set.
    for bucket in per_bucket:
        pdir = M.partition_dir(out_dir, first, bucket)
        mpath = os.path.join(pdir, M.MANIFEST_NAME)
        if not os.path.isfile(mpath):
            continue
        m = json.load(open(mpath))
        if set(m.get("input_files", [])) >= set(files):
            continue  # the merge pass already updated it
        m["input_files"] = sorted(set(m.get("input_files", [])) | set(files))
        with open(mpath + ".tmp", "w") as f:
            json.dump(m, f, sort_keys=True)
        os.replace(mpath + ".tmp", mpath)
    results = {t: M.load_manifests(out_dir, t) for t in cfg.tiers}
    _record_metrics(out_dir, cfg, "incremental", input_tag, cfg_hash, t0,
                    results, extra={"new_shards": len(new_files)})
    return results


def final_tier_dataset(input_path: str, cfg: EngineConfig | None = None,
                       rules: tuple[RuleSpec, ...] | None = None,
                       tier: str = "1m", two_phase: bool = True):
    """In-memory variant (no write): final rows Dataset for one tier."""
    cfg = cfg or EngineConfig()
    rules = rules or default_rules()
    points = extract_points(read_token_table(input_path), rules, cfg)
    core = build_core_tiers(points, cfg, two_phase=two_phase)
    return finalize_tier(core[tier], TIERS[tier], cfg)
