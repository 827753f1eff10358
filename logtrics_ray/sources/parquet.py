"""Parquet source helpers.

``read_parquet_clean`` passes Ray a metadata-stripped schema: parquet
written via pandas embeds a ``b'pandas'`` schema-metadata blob whose
presence makes ``pyarrow.Schema`` unhashable, which defeats Ray Data's
schema-deduplication fast path and spams every read stage with
``Failed to hash the schemas (for deduplication): unhashable type:
'dict'`` (ray/data/_internal/arrow_ops/transform_pyarrow.py:181).  The
hashable clean schema restores the early-exit and silences the warning;
column pruning still applies.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import ray.data as rd


def clean_schema(path: str):
    """Metadata-free schema of a parquet file or of the first ``*.parquet``
    in a directory (driver-side, one footer read)."""
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.endswith(".parquet"):
                path = os.path.join(path, name)
                break
    return pq.read_schema(path).remove_metadata()


def read_parquet_clean(paths, columns: list[str] | None = None, **kwargs):
    """ray.data.read_parquet with a hashable (metadata-stripped) schema."""
    import pyarrow as pa
    first = paths[0] if isinstance(paths, (list, tuple)) else paths
    try:
        schema = clean_schema(first)
        if columns is not None:
            schema = pa.schema([schema.field(c) for c in columns])
    except (OSError, ValueError, KeyError):
        schema = None
    if schema is not None:
        kwargs.setdefault("schema", schema)
    return rd.read_parquet(paths, columns=columns, **kwargs)
