"""Incremental append: merge NEW input shards into stored tiers.

The north rule asks for *incremental* continuous aggregates.  The unit of
increment is the input shard (parquet file): every tier-1m bucket persists
its mergeable core rows (``core.parquet`` — counts/sums/min/max/last with
order keys + t-digest state, storage.py) and its manifest records the
input files consumed.  ``run_incremental`` (pipelines/rollup_pipeline.py)
extracts points from only the new files, and per bucket merges
``stored core ⊕ new core`` then re-cascades 1h/1d bucket-locally — the
cost of an append is O(new data + touched core rows), never a recompute
of the full history.

Merge semantics (deterministic, documented):
  count/min/max      exact — equal to a full recompute
  gauge ``last``     exact — max over the (last_ts, last_tb) order key
  float sums         merged stored-then-new (associative regrouping: equal
                     to a full recompute up to float reduction order;
                     asserted exact-for-ints / allclose-for-floats in tests)
  t-digest           merged stored-then-new (sketches are mergeable by
                     construction; accuracy bound unchanged)

The merge kernel IS the cascade kernel at parent width 1 ms: window
starts are ms-aligned, so ``w - w % 1 == w`` keeps every window, and
_cascade_bucket_fn's stable (code, window) lexsort preserves the
stored-before-new concat order inside each merge group.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from logtrics_ray.stages.cascade import _cascade_bucket_fn


def merge_cores(stored: pa.Table | None, new: pa.Table) -> pa.Table:
    """Merge two same-tier core tables per (series, metric_type, window).
    ``stored`` partials reduce before ``new`` ones (generation order)."""
    if stored is None or stored.num_rows == 0:
        return new
    both = pa.concat_tables([stored, new]).combine_chunks()
    return _cascade_bucket_fn(both, 1)


def stored_core(out_dir: str, tier: str, bucket: int, input_tag: str,
                cfg_hash: str) -> tuple[pa.Table | None, list[str]]:
    """Load a bucket's persisted core rows + its consumed-file list, or
    (None, []) when absent / written by a different (input, config)."""
    import json
    from logtrics_ray.state import manifest as M
    pdir = M.partition_dir(out_dir, tier, bucket)
    mpath = os.path.join(pdir, M.MANIFEST_NAME)
    cpath = os.path.join(pdir, "core.parquet")
    if not os.path.isfile(mpath):
        return None, []
    try:
        m = json.load(open(mpath))
    except (json.JSONDecodeError, OSError):
        return None, []
    if m.get("input_tag") != input_tag or m.get("cfg_hash") != cfg_hash:
        return None, []
    if not os.path.isfile(cpath):
        if m.get("input_files"):
            # A manifest with lineage but no core partials would make the
            # merge silently drop the stored history — fail loudly; this
            # state cannot be produced by the engine's own writers.
            raise RuntimeError(
                f"bucket {bucket}: manifest records input_files but "
                f"core.parquet is missing — refusing a lossy merge ({pdir})")
        return None, []
    return pq.read_table(cpath), list(m.get("input_files", []))
