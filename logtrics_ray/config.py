"""Engine configuration.

The reference's only timing knob is the Graphite flush interval
(/root/reference/graphite/graphite.go:57,85 — default 30s at
/root/reference/cmd/logtrics/main.go:59): every interval the whole
metric registry is snapshotted to the sink.  Our engine replaces the
wall-clock flush with explicit event-time tumbling windows at three
retention tiers (1m/1h/1d), which makes the pipeline deterministic and
testable.  Everything here is plain data — safe to ship to Ray workers.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

MS = 1
SECOND = 1000 * MS
MINUTE = 60 * SECOND
HOUR = 60 * MINUTE
DAY = 24 * HOUR

#: Retention tiers: name -> tumbling window width in milliseconds.
#: Order matters: each tier cascades from the previous one (1m -> 1h -> 1d).
TIERS: dict[str, int] = {"1m": MINUTE, "1h": HOUR, "1d": DAY}

#: Timer percentile set, mirroring the reference's Graphite sink config
#: (/root/reference/graphite/graphite.go:72).
PERCENTILES: tuple[float, ...] = (0.5, 0.75, 0.95, 0.99, 0.999)

#: EWMA horizons for meters (seconds), mirroring go-metrics' 1/5/15-minute
#: moving rates that the reference's Meter exposes
#: (/root/reference/graphite/graphite.go:141-151 via rcrowley/go-metrics).
EWMA_TAUS_S: tuple[int, ...] = (60, 300, 900)

GAP_FILL_MODES = ("null", "locf", "linear")

#: Fields of EngineConfig that affect OUTPUT SEMANTICS (bytes on disk /
#: partition layout).  Everything else is execution strategy proven
#: bit-identical by tests (exchange shape, shuffle impl, token plans,
#: batching, concurrency) and is deliberately EXCLUDED from the lineage
#: config hash — flipping an execution knob must not invalidate stored
#: tiers or force incremental appends into a full recompute.  When
#: adding a config field, classify it here consciously.
SEMANTIC_CONFIG_FIELDS: tuple[str, ...] = (
    "epoch0_ms", "horizon_ms", "salt_buckets", "gap_fill", "gap_domain",
    "series_buckets", "block_len", "percentiles", "ewma_taus_s", "tiers",
)


@dataclass(frozen=True)
class EngineConfig:
    """All knobs of one pipeline run.  Frozen → hashable, broadcastable."""

    # Event-time synthesis for the token table (which has no timestamp —
    # see BASELINE.json input_hint):  ts = epoch0_ms + hash64(doc_id) % horizon_ms.
    epoch0_ms: int = 1767225600000  # 2026-01-01T00:00:00Z
    horizon_ms: int = 7 * DAY

    # Salted two-phase aggregation: points are partitioned into
    # `salt_buckets` deterministic sub-groups per (series, window); partial
    # aggregates per salt bucket are merged in salt order.  This is both the
    # skew-defense AND the definition of the engine's float summation order
    # (deterministic regardless of physical block layout).
    salt_buckets: int = 8

    # Gap-fill: "null" | "locf" | "linear".  Domain is per-series
    # [first_window, last_window] by default; "global" extends every series
    # to the global max window (the reference's registry-snapshot behavior:
    # once a metric is registered it is emitted every flush —
    # /root/reference/graphite/graphite.go:84-90).
    gap_fill: str = "locf"
    gap_domain: str = "series"  # "series" | "global"

    # Output partitioning: series are hashed into this many buckets; each
    # bucket is one resumable output partition with its own manifest.  Also
    # the reduce-side task count of the fused pipeline's single exchange —
    # size ~2x the cluster's cores so a straggler bucket doesn't stall a
    # whole wave (64 ≈ 2x the 32-CPU sandbox; scale up with the cluster).
    series_buckets: int = 64

    # Shuffle granularity of the bucket-major rollup path: points are
    # hash-partitioned into this many groups (performance-only knob — the
    # per-(series, window, salt) reduction semantics are bucket-invariant,
    # so results are bit-identical at any value).  Size ≈ 2-4 × CPUs.
    rollup_buckets: int = 64

    # Fused-pipeline exchange shape:
    #   "direct" — ONE all-to-all: points grouped straight by output
    #     bucket; cheapest when no single series dominates.
    #   "salted" — salted two-phase (the north star's skew defense at the
    #     EXCHANGE level): points grouped by (bucket, salt) first — a hot
    #     series' points spread over `salt_buckets` parallel partial
    #     tasks — then only the per-(series, window, salt) partial rows
    #     re-group by bucket for the salt-ordered merge.  Output bits are
    #     identical (asserted in tests).  DEFAULT: the fixture workload
    #     (like most log-derived metrics) has hot constant series — the
    #     salted route keeps the largest single task bounded by
    #     points/(buckets*salts) instead of the hot series' full size.
    #     Use "direct" when series cardinality is high and balanced.
    exchange: str = "salted"

    # Exchange implementation for the fused pipeline's all-to-alls:
    #   "sort" — Ray's sort-based groupby().map_groups.  DEFAULT:
    #     alternating A/B at sf0.1/32 CPUs measured it consistently
    #     faster end-to-end (26.7s vs 33.9s best-of-3) — the hash path's
    #     per-exchange aggregator-actor startup/teardown outweighs the
    #     sort machinery at single-node scale, and sort has no actor-pool
    #     CPU-contention failure mode.
    #   "hash" — hash-partition by the group key (Ray HASH_SHUFFLE keyed
    #     repartition) into ~cluster-CPU partitions, then split complete
    #     groups inside each partition block.  No boundary sampling; the
    #     principled choice when the sort exchange's sampling/merge
    #     becomes the bottleneck (very large clusters, many partitions).
    # Output bits are byte-identical either way — partials/merges impose
    # a total (ts, tiebreak, value) order internally and the persisted
    # core.parquet is canonically ordered — pinned by
    # tests/test_storage.py::test_hash_shuffle_impl_equals_sort.
    shuffle_impl: str = "sort"

    # Partition count for the hash exchanges; None -> the cluster's CPU
    # count clamped to [8, 512].  At multi-node scale this should be
    # ~1-2x total cores (each partition is one streaming aggregator).
    exchange_partitions: int | None = None

    # Gorilla block cap: windows per encoded block.
    block_len: int = 4096

    # Token-domain regex pushdown (stages/tokenplan.py): compile each
    # rule's regex onto token-id space when provably equivalent, so
    # matching + capture run on the int32 ``tokens`` column directly and
    # detokenization happens only for the (rare) rows a plan flags for
    # text fallback.  All-or-nothing per rule set: if any rule cannot be
    # compiled soundly (unsupported shape, UDF handler), the whole stage
    # uses the text path.  Semantics are identical either way (pinned by
    # tests); this is purely a compute optimization — detokenize+RE2 is
    # ~80% of flagship extraction CPU.
    token_plans: bool = True

    # Extraction stage sizing.  Concurrency is an autoscaling (min, max)
    # actor-pool range: min=1 guarantees progress even when the pool would
    # otherwise reserve every CPU of a small cluster (a fixed pool equal to
    # the CPU count starves the read stage and deadlocks the pipeline).
    batch_size: int = 4096
    extract_concurrency: int | tuple[int, int] = (1, 8)

    percentiles: tuple[float, ...] = PERCENTILES
    ewma_taus_s: tuple[int, ...] = EWMA_TAUS_S
    tiers: tuple[str, ...] = tuple(TIERS)

    def with_(self, **kw) -> "EngineConfig":
        return replace(self, **kw)

    def __post_init__(self):
        if self.gap_fill not in GAP_FILL_MODES:
            raise ValueError(f"gap_fill must be one of {GAP_FILL_MODES}, got {self.gap_fill!r}")
        if self.gap_domain not in ("series", "global"):
            raise ValueError(f"gap_domain must be 'series' or 'global', got {self.gap_domain!r}")
        if self.salt_buckets < 1:
            raise ValueError("salt_buckets must be >= 1")
        if self.exchange not in ("direct", "salted"):
            raise ValueError(f"exchange must be 'direct' or 'salted', got {self.exchange!r}")
        if self.shuffle_impl not in ("hash", "sort"):
            raise ValueError(f"shuffle_impl must be 'hash' or 'sort', got {self.shuffle_impl!r}")
        for t in self.tiers:
            if t not in TIERS:
                raise ValueError(f"unknown tier {t!r}; known: {sorted(TIERS)}")


DEFAULT_CONFIG = EngineConfig()
