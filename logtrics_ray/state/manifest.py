"""Per-partition lineage manifests — the resumable-output layer.

The reference has no persistence at all (in-memory registry, restart
loses every cumulative counter — /root/reference/TODO.md:6 lists
"Persistence APIs" as unimplemented).  Here every output partition
(tier × series-bucket) is written atomically (tmp dir + rename) together
with a ``_MANIFEST.json`` recording lineage: the input tag, engine
config hash, row/series counts, window range, and a content hash.
A resumed run lists completed partitions for the same (input, config)
and skips their buckets at the SOURCE of the pipeline, so finished work
is neither recomputed nor rewritten.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

MANIFEST_NAME = "_MANIFEST.json"


def config_hash(cfg, rules) -> str:
    """Lineage hash over the SEMANTIC config fields + the rule set.

    Execution-only knobs (exchange shape, shuffle impl, token plans,
    batching, concurrency) are excluded — they are bit-identical by
    construction (pinned in tests), so flipping one must not orphan
    stored partitions or defeat incremental resume
    (config.SEMANTIC_CONFIG_FIELDS is the explicit allowlist)."""
    from logtrics_ray.config import SEMANTIC_CONFIG_FIELDS
    payload = repr((tuple((f, getattr(cfg, f)) for f in SEMANTIC_CONFIG_FIELDS),
                    tuple((r.name, r.expression, r.emits) for r in rules)))
    return hashlib.blake2b(payload.encode(), digest_size=8).hexdigest()


def partition_dir(out_dir: str, tier: str, bucket: int) -> str:
    return os.path.join(out_dir, f"tier={tier}", f"bucket={bucket:05d}")


def write_partition(out_dir: str, tier: str, bucket: int, write_files,
                    meta: dict) -> dict:
    """Atomically write one partition: ``write_files(tmp_dir)`` writes the
    data files, then tmp is swapped with the final dir and the manifest is
    written last (a partition without a manifest is incomplete).

    Crash safety: an existing committed partition is RENAMED ASIDE
    (``.old``), never deleted before its replacement is in place — a crash
    at any point leaves either the old committed data (recoverable: the
    next run sees its manifest via the ``.old`` fallback cleanup below
    being deferred until after the swap) or the new data.  ``.old`` /
    ``.tmp`` siblings are ignored by the manifest listers."""
    final = partition_dir(out_dir, tier, bucket)
    tmp, old = final + ".tmp", final + ".old"
    for d in (tmp, old):
        if os.path.exists(d):
            shutil.rmtree(d)
    os.makedirs(tmp, exist_ok=True)
    write_files(tmp)
    if os.path.exists(final):
        os.rename(final, old)       # keep committed data until the swap lands
    os.replace(tmp, final)
    manifest = dict(meta, tier=tier, bucket=bucket)
    mpath = os.path.join(final, MANIFEST_NAME)
    with open(mpath + ".tmp", "w") as f:
        json.dump(manifest, f, sort_keys=True)
    os.replace(mpath + ".tmp", mpath)
    if os.path.exists(old):
        shutil.rmtree(old)          # safe: the new partition is committed
    return manifest


def recover_partition(out_dir: str, tier: str, bucket: int) -> bool:
    """Restore a partition lost to a crash inside ``write_partition``'s
    swap window (final missing, ``.old`` still holding the committed
    data).  Returns True if a restore happened."""
    final = partition_dir(out_dir, tier, bucket)
    old = final + ".old"
    if (not os.path.isfile(os.path.join(final, MANIFEST_NAME))
            and os.path.isfile(os.path.join(old, MANIFEST_NAME))):
        if os.path.exists(final):
            shutil.rmtree(final)    # incomplete replacement (no manifest)
        os.rename(old, final)
        return True
    return False


def completed_buckets(out_dir: str, tier: str, input_tag: str, cfg_hash: str) -> set[int]:
    """Buckets whose manifest matches this run's lineage (input + config)."""
    tier_dir = os.path.join(out_dir, f"tier={tier}")
    done: set[int] = set()
    if not os.path.isdir(tier_dir):
        return done
    for name in os.listdir(tier_dir):
        # Recover partitions caught mid-swap by a crash (.old holds the
        # committed data, final has no manifest yet).
        if name.endswith(".old"):
            base = name[:-len(".old")]
            try:
                bucket = int(base.split("=")[1])
                if not recover_partition(out_dir, tier, bucket):
                    # No restore needed. If the final sibling is already
                    # committed (has a manifest), this .old is the stale
                    # pre-swap copy left by a crash between the manifest
                    # os.replace and the cleanup rmtree — sweep it, or it
                    # lingers (a full duplicate of the partition) forever.
                    final = partition_dir(out_dir, tier, bucket)
                    if os.path.isfile(os.path.join(final, MANIFEST_NAME)):
                        shutil.rmtree(os.path.join(tier_dir, name),
                                      ignore_errors=True)
            except (ValueError, IndexError, OSError):
                pass
    for name in os.listdir(tier_dir):
        if "." in name:            # .tmp / .old working dirs are not partitions
            continue
        mpath = os.path.join(tier_dir, name, MANIFEST_NAME)
        if not os.path.isfile(mpath):
            continue
        try:
            m = json.load(open(mpath))
        except (json.JSONDecodeError, OSError):
            continue
        if m.get("input_tag") == input_tag and m.get("cfg_hash") == cfg_hash:
            done.add(int(m["bucket"]))
    return done


def load_manifests(out_dir: str, tier: str) -> list[dict]:
    tier_dir = os.path.join(out_dir, f"tier={tier}")
    out = []
    if not os.path.isdir(tier_dir):
        return out
    for name in sorted(os.listdir(tier_dir)):
        if "." in name:            # .tmp / .old working dirs are not partitions
            continue
        mpath = os.path.join(tier_dir, name, MANIFEST_NAME)
        if os.path.isfile(mpath):
            out.append(json.load(open(mpath)))
    return out
