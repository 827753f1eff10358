"""Log-line text source — the batch analog of the reference's
console/UDP/TCP line readers (/root/reference/reader/readers.go:73-196).

A directory of ``*.log`` files becomes a Dataset of
``(doc_id, text, source)`` rows: one task per FILE (the per-connection
reader goroutine reimagined as a per-file read task), lines split with
numpy on the raw bytes, ``doc_id = "<basename>:<lineno>"`` (stable line
identity — the engine's event-time/tiebreak synthesis hashes it),
``source = <basename>`` (≙ the reader name the reference tags events
with).  Feed the result to ``extract_points(..., text_column="text")``.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd


def _file_to_lines(path: str, content: bytes) -> pa.Table:
    base = os.path.basename(path)
    text = content.decode("utf-8", errors="replace")
    if text.endswith("\n"):
        text = text[:-1]
    lines = text.split("\n") if text else []
    n = len(lines)
    ids = [f"{base}:{i + 1}" for i in range(n)]
    return pa.Table.from_arrays([
        pa.array(ids, pa.string()),
        pa.array(lines, pa.string()),
        pa.array([base] * n, pa.string()),
    ], names=["doc_id", "text", "source"])


def read_log_lines(path: str, suffix: str = ".log"):
    """Directory (or single file) of newline-delimited log text ->
    Dataset(doc_id, text, source)."""
    ds = rd.read_binary_files(path, include_paths=True,
                              file_extensions=[suffix.lstrip(".")])

    def to_lines(batch: pa.Table) -> pa.Table:
        tables = [_file_to_lines(p, b) for p, b in
                  zip(batch["path"].to_pylist(), batch["bytes"].to_pylist())]
        if not tables:
            return pa.Table.from_arrays(
                [pa.array([], pa.string())] * 3,
                names=["doc_id", "text", "source"])
        return pa.concat_tables(tables)

    return ds.map_batches(to_lines, batch_format="pyarrow")


def write_log_lines_fixture(token_text_dir: str, out_dir: str) -> str:
    """Deterministic ``*.log`` fixture: the detokenized side table's text
    rows as newline-delimited files, one per parquet shard.  Idempotent."""
    import pyarrow.parquet as pq
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_DONE")
    # Content-keyed: reuse only while the upstream token dir's own cache
    # tag (which embeds its generator-source hash) is unchanged.
    src_marker = os.path.join(os.path.dirname(token_text_dir.rstrip("/")),
                              "_DONE")
    src_tag = (open(src_marker).read().strip()
               if os.path.exists(src_marker) else "?")
    tag = f"{token_text_dir}:{src_tag}"
    if os.path.exists(marker) and open(marker).read().strip() == tag:
        return out_dir
    for f in os.listdir(out_dir):
        if f.endswith(".log"):
            os.unlink(os.path.join(out_dir, f))
    for name in sorted(os.listdir(token_text_dir)):
        if not name.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(token_text_dir, name), columns=["text"])
        lines = "\n".join(t["text"].to_pylist())
        with open(os.path.join(out_dir, name.replace(".parquet", ".log")), "w") as f:
            f.write(lines)
    with open(marker, "w") as f:
        f.write(tag)
    return out_dir
