"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are treated as opaque ``binary`` columns with
typed metadata columns alongside (media_type, width/height or
sample_rate, codec).  The decode/feature kernels themselves are STUBBED
(this container ships no image/audio libraries — each stub raises
NotImplementedError unless ``fake=True`` selects the deterministic fake
used by tests), but the Ray-side plumbing is real and tested:

  * actor-pool stage shape (decoder state built once per actor),
  * ``batch_format="pyarrow"`` end to end (binary columns must NOT pass
    through pandas object dtype),
  * small ``batch_size`` for wide binary rows (payload bytes × batch ×
    concurrency must fit the worker heap — the knob that matters at
    100 TB),
  * schema in/out contracts.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("media_type", pa.string()),     # "image/png", "audio/wav", ...
    ("payload", pa.binary()),
    ("meta_width", pa.int32()),
    ("meta_height", pa.int32()),
])


def synth_media_table(n: int, payload_bytes: int = 4096, seed: int = 5) -> pa.Table:
    """Deterministic fake media corpus (binary noise payloads)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes()
                for _ in range(n)]
    return pa.Table.from_arrays([
        pa.array([f"img-{i:08d}" for i in range(n)], pa.string()),
        pa.array(["image/png"] * n, pa.string()),
        pa.array(payloads, pa.binary()),
        pa.array(rng.integers(64, 1024, size=n, dtype=np.int32), pa.int32()),
        pa.array(rng.integers(64, 1024, size=n, dtype=np.int32), pa.int32()),
    ], schema=MEDIA_SCHEMA)


class ImageDecodeStub:
    """Actor-pool decode stage.  Real codec absent -> fake=True produces a
    deterministic feature (blake2b of payload -> 8 float32 'embedding'),
    fake=False raises NotImplementedError (clearly-marked stub)."""

    FEATURE_DIM = 8

    def __init__(self, fake: bool = False):
        self.fake = fake

    def _decode_one(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires an image library not present in this "
                "environment; run with fake=True for the deterministic stub")
        h = hashlib.blake2b(payload, digest_size=4 * self.FEATURE_DIM).digest()
        return (np.frombuffer(h, dtype=np.uint32).astype(np.float32)
                / np.float32(2**32))

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        feats = np.stack([self._decode_one(p) for p in payloads]) if payloads else \
            np.empty((0, self.FEATURE_DIM), dtype=np.float32)
        return pa.Table.from_arrays([
            t["media_id"].combine_chunks() if isinstance(t["media_id"], pa.ChunkedArray)
            else t["media_id"],
            pa.array(list(feats), pa.list_(pa.float32())),
            pa.array(np.asarray([len(p) for p in payloads], dtype=np.int64), pa.int64()),
        ], names=["media_id", "feature", "payload_bytes"])


class ResizeStub(ImageDecodeStub):
    """Resize stage contract: payload in, payload out + new dims.  The fake
    'resize' truncates the payload deterministically (plumbing test only)."""

    def __init__(self, target: int = 256, fake: bool = False):
        super().__init__(fake=fake)
        self.target = target

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("resize requires an image library; use fake=True")
        payloads = [p[: self.target] for p in t["payload"].to_pylist()]
        n = t.num_rows
        return pa.Table.from_arrays([
            t["media_id"].combine_chunks() if isinstance(t["media_id"], pa.ChunkedArray)
            else t["media_id"],
            t["media_type"].combine_chunks() if isinstance(t["media_type"], pa.ChunkedArray)
            else t["media_type"],
            pa.array(payloads, pa.binary()),
            pa.array(np.full(n, self.target, dtype=np.int32), pa.int32()),
            pa.array(np.full(n, self.target, dtype=np.int32), pa.int32()),
        ], schema=MEDIA_SCHEMA)


def decode_features(ds, fake: bool = True, batch_size: int = 64, concurrency=2):
    """Media Dataset -> feature Dataset via the actor-pool stub.  Small
    batch_size on purpose: binary payload rows are wide."""
    return ds.map_batches(ImageDecodeStub, fn_constructor_kwargs=dict(fake=fake),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)
