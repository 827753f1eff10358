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

import os

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


def read_token_table(path: str):
    """Column-pruned read: only what extraction needs leaves storage."""
    return rd.read_parquet(path, columns=["doc_id", "tokens", "n_tok", "source"])


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
    cfg = cfg or EngineConfig()
    rules = rules or default_rules()
    input_tag = input_tag or input_path
    cfg_hash = M.config_hash(cfg, rules)

    done = {t: (M.completed_buckets(out_dir, t, input_tag, cfg_hash) if resume else set())
            for t in cfg.tiers}
    done_everywhere = set.intersection(*done.values()) if done else set()
    all_buckets = set(range(cfg.series_buckets))
    if done_everywhere >= all_buckets:
        return {t: M.load_manifests(out_dir, t) for t in cfg.tiers}

    ds = read_token_table(input_path)
    points = extract_points(ds, rules, cfg)
    if done_everywhere:
        skip = pa.array(sorted(done_everywhere), pa.int64())

        def drop_done(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            b = series_bucket_array(t["series_key"].to_pylist(), cfg.series_buckets)
            return t.filter(pa.compute.invert(
                pa.compute.is_in(pa.array(b, pa.int64()), value_set=skip)))

        points = points.map_batches(drop_done, batch_format="pyarrow")

    # Interleave: each tier's write starts as soon as its core rows are
    # materialized, while the next cascade computes concurrently (separate
    # driver threads each drive one Ray execution; Ray schedules both).
    from concurrent.futures import ThreadPoolExecutor

    def write_one(tier, core_ds):
        storage.write_tier_finalized(
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
        for f in futures:
            f.result()
    for tier in cfg.tiers:
        results[tier] = M.load_manifests(out_dir, tier)
    return results


class _FusedBucketWorker:
    """Per-output-bucket fused stage: 1m rollup -> cascade 1h/1d ->
    finalize -> Gorilla write, all inside ONE group call.

    The whole engine then needs exactly ONE all-to-all exchange (the
    narrow points table, hash-partitioned by output series bucket); every
    later step is bucket-local.  At 100 TB this is the difference between
    one shuffle and five — and semantics are unchanged: every
    per-(series, window) computation is bucket-local by construction, so
    output bits match the staged path (asserted in tests)."""

    def __init__(self, out_dir: str, cfg: EngineConfig, input_tag: str,
                 cfg_hash: str, done: dict[str, set]):
        from logtrics_ray.stages.storage import BucketFinalizeWriter
        self.cfg = cfg
        self.done = done
        self.writers = {
            tier: BucketFinalizeWriter(out_dir, tier, TIERS[tier], cfg,
                                       input_tag, cfg_hash)
            for tier in cfg.tiers
        }

    def __call__(self, group: pa.Table) -> pa.Table:
        import numpy as np
        from logtrics_ray.stages.cascade import _cascade_bucket_fn
        from logtrics_ray.stages.rollup import _bucket_rollup_fn
        from logtrics_ray.stages.storage import SUMMARY_SCHEMA
        group = group.combine_chunks()
        bucket = int(group["sbucket"][0].as_py())
        core = _bucket_rollup_fn(group.drop_columns(["sbucket"]))
        out = []
        for i, tier in enumerate(self.cfg.tiers):
            if i > 0:
                core = _cascade_bucket_fn(core, TIERS[tier])
            if bucket in self.done.get(tier, ()):
                continue
            with_bucket = core.append_column(
                "bucket", pa.array(np.full(core.num_rows, bucket, dtype=np.int64)))
            out.append(self.writers[tier](with_bucket))
        return pa.concat_tables(out) if out else SUMMARY_SCHEMA.empty_table()


def run_fused(input_path: str, out_dir: str, cfg: EngineConfig | None = None,
              rules: tuple[RuleSpec, ...] | None = None,
              input_tag: str | None = None, resume: bool = True) -> dict:
    """Single-shuffle fused pipeline (the default `run` path).  Same
    output bits, manifests and resume semantics as the staged run()."""
    import numpy as np
    from logtrics_ray.stages.rollup import assign_windows
    cfg = cfg or EngineConfig()
    rules = rules or default_rules()
    input_tag = input_tag or input_path
    cfg_hash = M.config_hash(cfg, rules)

    done = {t: (M.completed_buckets(out_dir, t, input_tag, cfg_hash) if resume else set())
            for t in cfg.tiers}
    done_everywhere = set.intersection(*done.values()) if done else set()
    all_buckets = set(range(cfg.series_buckets))
    if done_everywhere >= all_buckets:
        return {t: M.load_manifests(out_dir, t) for t in cfg.tiers}

    points = extract_points(read_token_table(input_path), rules, cfg)
    pts = assign_windows(points, TIERS[cfg.tiers[0]], cfg)
    nb = cfg.series_buckets

    def add_sbucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("sbucket", pa.array([], pa.int64()))
        b = series_bucket_array(t["series_key"].to_pylist(), nb)
        t = t.append_column("sbucket", pa.array(b, pa.int64()))
        # Dictionary-encode the repeated-string columns for the exchange:
        # the shuffle payload drops ~25% (331 -> 247 MB at sf0.1) and the
        # worker reads them back via to_pylist identically.
        import pyarrow.compute as pc
        for c in ("series_key", "metric_type"):
            i = t.schema.get_field_index(c)
            t = t.set_column(i, c, pc.dictionary_encode(t[c].combine_chunks()))
        return t

    pts = pts.map_batches(add_sbucket, batch_format="pyarrow", zero_copy_batch=True)
    if done_everywhere:
        skip = pa.array(sorted(done_everywhere), pa.int64())
        pts = pts.map_batches(
            lambda t: t.filter(pa.compute.invert(
                pa.compute.is_in(t["sbucket"], value_set=skip))),
            batch_format="pyarrow")

    worker = _FusedBucketWorker(out_dir, cfg, input_tag, cfg_hash,
                                {t: d - done_everywhere for t, d in done.items()})

    def fused_bucket(group: pa.Table) -> pa.Table:
        return worker(group)

    # NOTE: no repartition() before the groupby — Ray re-executes the
    # upstream map chain inside RepartitionSplit (measured: total remote
    # CPU doubles, 118s -> 232s at sf0.1), so coalescing costs more than
    # the sort's per-block overhead it would save.
    pts.groupby("sbucket").map_groups(fused_bucket, batch_format="pyarrow").materialize()
    return {t: M.load_manifests(out_dir, t) for t in cfg.tiers}


def final_tier_dataset(input_path: str, cfg: EngineConfig | None = None,
                       rules: tuple[RuleSpec, ...] | None = None,
                       tier: str = "1m", two_phase: bool = True):
    """In-memory variant (no write): final rows Dataset for one tier."""
    cfg = cfg or EngineConfig()
    rules = rules or default_rules()
    points = extract_points(read_token_table(input_path), rules, cfg)
    core = build_core_tiers(points, cfg, two_phase=two_phase)
    return finalize_tier(core[tier], TIERS[tier], cfg)
