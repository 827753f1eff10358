"""Run-level metrics artifact (north rule: per-partition lineage + METRICS).

Every ``run`` / ``run_fused`` / ``run_incremental`` finishes by writing
``<out_dir>/_RUN_METRICS.json`` (atomic tmp+rename): wall time, mode and
exchange, per-tier totals aggregated from the partition manifests, resume
accounting, and the Ray Data per-operator stats text of the job's final
execution — the observability surface an operator reads after a 100 TB
run instead of re-scanning the output.  A JSONL history line is appended
to ``_RUN_METRICS.log.jsonl`` so repeated appends keep their trail.
"""

from __future__ import annotations

import json
import os
import time


def tier_totals(manifests_by_tier: dict[str, list[dict]]) -> dict:
    """Aggregate the per-partition manifests into per-tier totals."""
    out = {}
    for tier, ms in manifests_by_tier.items():
        wmins = [m["window_min"] for m in ms if m.get("window_min") is not None]
        wmaxs = [m["window_max"] for m in ms if m.get("window_max") is not None]
        out[tier] = {
            "rows": sum(m.get("rows", 0) for m in ms),
            "blocks": sum(m.get("blocks", 0) for m in ms),
            "buckets": len(ms),
            "empty_buckets": sum(1 for m in ms if m.get("rows", 0) == 0),
            "window_min": min(wmins) if wmins else None,
            "window_max": max(wmaxs) if wmaxs else None,
        }
    return out


def write_run_metrics(out_dir: str, payload: dict) -> dict:
    """Atomically persist the run metrics; returns the payload written."""
    payload = dict(payload, written_at=round(time.time(), 3))
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "_RUN_METRICS.json")
    with open(path + ".tmp", "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(path + ".tmp", path)
    with open(os.path.join(out_dir, "_RUN_METRICS.log.jsonl"), "a") as f:
        f.write(json.dumps(payload, sort_keys=True) + "\n")
    return payload


def read_run_metrics(out_dir: str) -> dict | None:
    path = os.path.join(out_dir, "_RUN_METRICS.json")
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        return json.load(f)
