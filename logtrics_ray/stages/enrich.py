"""Broadcast enrichment + retention policy — the engine's only join-like
operators (SURVEY.md §2.4: the reference has NO joins; these are the two
join-shaped needs our engine adds).

* ``broadcast_enrich``: join a SMALL dimension table (series_key ->
  attributes) onto a big Dataset without a shuffle: the dim table is put
  into the object store ONCE (``ray.put``) and every map task resolves
  it by reference — the 100 TB-safe alternative to a hash-join exchange
  for small sides (broadcast-join pattern).
* ``apply_retention``: per-series retention windows (the north rule's
  "retention" tier semantics): a row survives iff
  ``window_start >= horizon_end - retention_ms(series)``, with the
  per-series retention coming from the broadcast dim.  Pure vectorized
  filter — no shuffle, streams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def broadcast_enrich(ds, dim: dict[str, dict], key_col: str = "series_key",
                     prefix: str = ""):
    """Dataset + {key: {attr: value}} -> Dataset with one new column per
    dim attribute (missing keys -> null).  dim must be driver-small."""
    if not dim:
        return ds
    attrs = sorted({a for v in dim.values() for a in v})
    dim_ref = ray.put(dim)

    def fn(t: pa.Table) -> pa.Table:
        d = ray.get(dim_ref)
        col = t[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # dictionary-encode + take: Python lookups only on the DISTINCT
        # keys (cardinality-bounded), then one vectorized gather per attr.
        enc = col if pa.types.is_dictionary(col.type) else col.dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        idx = enc.indices
        for a in attrs:
            lut = pa.array([d.get(k, {}).get(a) for k in uniq])
            t = t.append_column(prefix + a, pa.compute.take(lut, idx))
        return t

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def apply_retention(ds, retention_ms: dict[str, int], horizon_end_ms: int,
                    default_ms: int | None = None, key_col: str = "series_key",
                    window_col: str = "window_start"):
    """Filter rows past their series' retention window.

    retention_ms: {series_key: keep-this-many-ms}; series not listed keep
    ``default_ms`` (None = keep everything).  Broadcast once, filtered
    vectorized per batch — the retention pass over a 100 TB tier is one
    streaming scan, no shuffle.
    """
    ret_ref = ray.put(retention_ms)

    def fn(t: pa.Table) -> pa.Table:
        r = ray.get(ret_ref)
        col = t[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        enc = col if pa.types.is_dictionary(col.type) else col.dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        default_cut = (horizon_end_ms - default_ms if default_ms is not None
                       else np.iinfo(np.int64).min)
        lut = np.array([horizon_end_ms - r[k] if k in r else default_cut
                        for k in uniq], dtype=np.int64)
        cutoffs = lut[enc.indices.to_numpy(zero_copy_only=False)]
        w = t[window_col].to_numpy()
        return t.filter(pa.array(w >= cutoffs))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
