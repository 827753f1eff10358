"""logtrics_ray — a Ray-Data-native time-series rollup engine.

A from-scratch reimagination of smitajit/logtrics (regex -> metric
extraction, Graphite-style counter/gauge/timer/meter rollups) as a
columnar, distributed, windowed rollup + downsample + retention engine
built on ``ray.data.Dataset`` pipelines:

    read_parquet(token table)
      -> map_batches(RuleExtractor actor pool)      # regex extraction -> points
      -> window assignment (tumbling 1m/1h/1d)
      -> salted two-phase grouped aggregation       # count/sum/min/max/last/t-digest
      -> per-series ordered scan                    # cumulative, EWMA, rate, gap-fill
      -> cascade 1m -> 1h -> 1d                     # continuous aggregates
      -> Gorilla-compressed blocks in partitioned Parquet + lineage manifests

The reference semantics being reproduced are cited per-module with
file:line pointers into /root/reference (smitajit/logtrics).
"""

from logtrics_ray.config import EngineConfig, TIERS
from logtrics_ray.rules import RuleSpec, EmitSpec, load_rules, default_rules

__all__ = [
    "EngineConfig",
    "TIERS",
    "RuleSpec",
    "EmitSpec",
    "load_rules",
    "default_rules",
]
