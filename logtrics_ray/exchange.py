"""Shared hash-exchange helpers: groupby-equivalent grouped apply over a
key-based hash repartition.

Ray Data's default grouped map is the sort-based shuffle (sample
boundaries -> sort -> reduce).  For exchanges whose group functions
impose their own internal total order, HASH_SHUFFLE streams map-side
blocks straight into partition aggregator actors — no boundary sampling
and no sort machinery — which halves exchange wall time at sf0.1 for
NARROW/TALL shuffles (see pipelines/rollup_pipeline._shuffle_ctx, where
this was proven on the flagship's dictionary-coded points exchange).

Measured caveat: for WIDE-payload shuffles the trade flips — sequence
packing's bucket exchange ships a ``list<int32>`` token column, and at
sf0.1 the hash route ran ~3x SLOWER than sort (aggregator actors pay
per-row copies into output builders; the sort path moves whole Arrow
buffers).  Callers choose per exchange: hash for narrow/tall, sort for
wide payloads (``pack_sequences(shuffle_impl=...)``).

The strategy is scoped via a context manager because it is a
DataContext global — and the scope must cover dataset CREATION, not
just execution: every Dataset snapshots the DataContext when built
(read_api.py: ``ExecutionPlan(stats, DataContext.get_current().copy())``),
and the planner validates key-based repartition against that snapshot.
"""

from __future__ import annotations

from contextlib import contextmanager

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def default_partitions() -> int:
    """Exchange width from cluster size: ~1 partition per CPU, bounded.
    At 100 TB the bound keeps per-partition manifests/tasks manageable;
    partitions hold complete key groups so width never changes output."""
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(8, min(512, cpus))


@contextmanager
def hash_shuffle_ctx(partitions: int | None = None):
    """Scope Ray's shuffle strategy to HASH_SHUFFLE for the datasets
    built (and executed) inside.  Restores the previous strategy after —
    other operators (ds.sort, dedup joins) keep their own defaults."""
    from ray.data.context import DataContext, ShuffleStrategy
    ctx = DataContext.get_current()
    prev = (ctx.shuffle_strategy, ctx.max_hash_shuffle_aggregators)
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.max_hash_shuffle_aggregators = max(
        4, (partitions or default_partitions()) // 2)
    try:
        yield
    finally:
        ctx.shuffle_strategy, ctx.max_hash_shuffle_aggregators = prev


def iter_key_groups(t: pa.Table, col: str):
    """Yield each complete ``col`` group of one hash-partition block
    (sorted by ``col``; rows within a group keep arrival order — callers'
    group functions must impose their own internal total order, which
    every user of this helper does)."""
    if t.num_rows == 0:
        return
    t = t.combine_chunks()
    order = pc.sort_indices(t.select([col]), sort_keys=[(col, "ascending")])
    t = t.take(order).combine_chunks()
    k = t[col].to_numpy()
    bounds = np.flatnonzero(np.diff(k, prepend=k[0] - 1, append=k[-1] + 1))
    for i in range(bounds.size - 1):
        yield t.slice(bounds[i], bounds[i + 1] - bounds[i])


def grouped_apply(ds, key: str, fn, empty_table_fn,
                  partitions: int | None = None):
    """``groupby(key).map_groups(fn)`` over a key-based hash repartition:
    each output block holds complete groups of ``key``; ``fn`` runs per
    group inside the block.  Build (and execute) the result inside
    ``hash_shuffle_ctx`` to get the streaming hash exchange."""
    parts = partitions or default_partitions()

    def block_fn(t: pa.Table) -> pa.Table:
        outs = [fn(g) for g in iter_key_groups(t, key)]
        return pa.concat_tables(outs) if outs else empty_table_fn()

    return (ds.repartition(parts, keys=[key])
            .map_batches(block_fn, batch_format="pyarrow", batch_size=None))
