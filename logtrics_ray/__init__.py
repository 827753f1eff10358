"""logtrics_ray — a Ray-Data-native time-series rollup engine.

A from-scratch reimagination of smitajit/logtrics (regex -> metric
extraction, Graphite-style counter/gauge/timer/meter rollups) as a
columnar, distributed, windowed rollup + downsample + retention engine
built on ``ray.data.Dataset`` pipelines.  Default (fused, salted) spine:

    read_parquet(token table, column-pruned)
      -> map_batches(rule extraction)               # regex -> narrow points
      -> +window/salt/output-bucket, dict-encoded
      -> groupby(bucket, salt)                      # exchange 1: skew-spread
           salted vectorized partials               # per (series, window, salt)
      -> groupby(bucket)                            # exchange 2: partial rows only
      -> per bucket, in one group call:
           salt-ordered merge -> 1m core            # count/sum/min/max/last/t-digest
           cascade 1m -> 1h -> 1d                   # continuous aggregates
           per-series ordered scan                  # cumulative, EWMA, rate, gap-fill
           Gorilla blocks -> partitioned Parquet    # + lineage manifests

(`EngineConfig.exchange="direct"` collapses this to ONE all-to-all for
balanced series; all routes are bit-identical.)

Also: incremental appends (`run_incremental` merges new shards into the
persisted per-bucket core partials), broadcast dim enrichment +
per-series retention (stages/enrich.py), and a training-data operator
library (functions/: dedup, similarity, text stats, multimodal).

The reference semantics being reproduced are cited per-module with
file:line pointers into /root/reference (smitajit/logtrics).
"""

from logtrics_ray.config import EngineConfig, TIERS
from logtrics_ray.rules import RuleSpec, EmitSpec, load_rules, default_rules


def run(*args, **kwargs):
    """Convenience re-export of pipelines.rollup_pipeline.run (lazy import
    so `import logtrics_ray` stays Ray-free)."""
    from logtrics_ray.pipelines.rollup_pipeline import run as _run
    return _run(*args, **kwargs)


def run_incremental(*args, **kwargs):
    from logtrics_ray.pipelines.rollup_pipeline import run_incremental as _ri
    return _ri(*args, **kwargs)


__all__ = [
    "EngineConfig",
    "TIERS",
    "RuleSpec",
    "EmitSpec",
    "load_rules",
    "default_rules",
    "run",
    "run_incremental",
]
