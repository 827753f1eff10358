"""Count-Min sketch frequency estimation over a keyed event stream.

Completes the engine's sketch family (HyperLogLog distinct counts in
state/hll.py, t-digest quantiles in state/tdigest.py): CMS answers
"how often did key k occur" in O(d*w) memory at any corpus size, with
the one-sided guarantee est >= exact and est <= exact + eps*N at
confidence 1 - delta (Cormode & Muthukrishnan 2005; w = ceil(e/eps),
d = ceil(ln(1/delta))).

Distribution shape: per-batch partial MATRICES (np.add.at over the d
hash rows), merged by exact int64 vector addition — order-free and
associative, so the tree of partial sums is placement-independent and
hash-exact reproducible (the same property label_centroids uses).  The
final matrix is d*w ints (bounded state, independent of corpus size);
estimates for a bounded PROBE set are one broadcast-matrix gather.

Hash family: multiply-shift h_d(k) = (a_d * k + b_d) >> (64 - log2 w)
over uint64 wraparound — a_d odd (64-bit bijection), the same family
MinHasher documents; no per-element modulo.

Oracle story: the probe hash assignments (k -> h_0..h_{d-1}) and the
final matrix are side tables (the FIXTURES.md kernel-assignment
pattern); SQL independently recomputes the EXACT probe counts from raw
events, replays est = min_d matrix[d][h_d(k)], and publishes
overcount = est - exact (>= 0 by the CMS guarantee — a negative value
means a broken merge and fails the row match).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _hash_params(d: int, seed: int = 11):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 63, size=d, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 63, size=d, dtype=np.uint64)
    return a, b


def cms_columns(keys: np.ndarray, d: int, log2_w: int,
                seed: int = 11) -> np.ndarray:
    """(d, n) column indices for int64 keys, multiply-shift family."""
    a, b = _hash_params(d, seed)
    k = keys.astype(np.uint64)
    shift = np.uint64(64 - log2_w)
    with np.errstate(over="ignore"):
        return np.stack([((a[j] * k + b[j]) >> shift).astype(np.int64)
                         for j in range(d)])


def cms_matrix(ds, key_col: str, d: int = 4, log2_w: int = 12,
               seed: int = 11):
    """Build the d x 2^log2_w count matrix over a Dataset column —
    per-batch partials, exact int64 tree merge (repartition levels)."""
    W = 1 << log2_w

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"d": pa.array([], pa.int64()),
                             "col": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        t = t.combine_chunks()
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = cms_columns(k, d, log2_w, seed)
        m = np.zeros((d, W), np.int64)
        for j in range(d):
            np.add.at(m[j], cols[j], 1)
        dj, cj = np.nonzero(m)
        return pa.table({"d": pa.array(dj, pa.int64()),
                         "col": pa.array(cj, pa.int64()),
                         "cnt": pa.array(m[dj, cj], pa.int64())})

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        m = np.zeros((d, W), np.int64)
        np.add.at(m, (t["d"].to_numpy(zero_copy_only=False),
                      t["col"].to_numpy(zero_copy_only=False)),
                  t["cnt"].to_numpy(zero_copy_only=False))
        dj, cj = np.nonzero(m)
        return pa.table({"d": pa.array(dj, pa.int64()),
                         "col": pa.array(cj, pa.int64()),
                         "cnt": pa.array(m[dj, cj], pa.int64())})

    # two-level tree: any single merge task folds a bounded number of
    # <= d*W-row partials at any corpus size
    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .repartition(16).map_batches(merge, batch_format="pyarrow",
                                        batch_size=None)
           .repartition(1).map_batches(merge, batch_format="pyarrow",
                                       batch_size=None))
    # the merged matrix is bounded (d * W rows max) — safe to pull
    t = agg.take_all()
    m = np.zeros((d, W), np.int64)
    for r in t:
        m[r["d"], r["col"]] = r["cnt"]
    return m


def cms_probe_frame(events_path: str, d: int = 4, log2_w: int = 12,
                    probe_mod: int = 7, seed: int = 11):
    """CMS demo over events.user_id: estimate vs exact for the
    deterministic probe set user_id % probe_mod == 0.

    Returns (frame, matrix): frame = (user_id, est_n, exact_n,
    overcount) pandas, matrix = the d x w int64 count matrix (for the
    oracle side table).
    """
    import pandas as pd

    from logtrics_ray.sources.parquet import read_parquet_clean

    ds = read_parquet_clean(events_path, columns=["user_id"])
    m = cms_matrix(ds, "user_id", d, log2_w, seed)

    # exact probe counts: one distributed filtered groupby (the probe
    # set is rule-bounded)
    def keep(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        u = t["user_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(u % probe_mod == 0))

    exact = (ds.map_batches(keep, batch_format="pyarrow")
             .groupby("user_id").count().to_pandas()
             .rename(columns={"count()": "exact_n"})
             .sort_values("user_id").reset_index(drop=True))
    u = exact["user_id"].to_numpy(np.int64)
    cols = cms_columns(u, d, log2_w, seed)
    est = m[np.arange(d)[:, None], cols].min(axis=0)
    out = pd.DataFrame({
        "user_id": u,
        "est_n": est.astype(np.int64),
        "exact_n": exact["exact_n"].to_numpy(np.int64),
    })
    out["overcount"] = out.est_n - out.exact_n
    return out, m


def write_cms_side_tables(events_path: str, out_dir: str, d: int = 4,
                          log2_w: int = 12, probe_mod: int = 7,
                          seed: int = 11) -> str:
    """Engine-kernel side tables for the SQL replay: the merged count
    matrix (long form) and the probe hash assignments."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    # plain single-pass numpy (no Ray): exact int sums are order-free,
    # so this equals the distributed tree merge bit-for-bit — the same
    # convention every other side-table writer follows
    keys = pq.read_table(events_path, columns=["user_id"])["user_id"] \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    W = 1 << log2_w
    cols_all = cms_columns(keys, d, log2_w, seed)
    m = np.zeros((d, W), np.int64)
    for j in range(d):
        np.add.at(m[j], cols_all[j], 1)
    u = np.unique(keys[keys % probe_mod == 0])
    dj, cj = np.nonzero(m)
    pq.write_table(pa.table({
        "d": pa.array(dj, pa.int64()),
        "col": pa.array(cj, pa.int64()),
        "cnt": pa.array(m[dj, cj], pa.int64())}),
        os.path.join(out_dir, "cms_matrix.parquet"))
    cols = cms_columns(u, d, log2_w, seed)
    pq.write_table(pa.table(
        {"user_id": pa.array(u, pa.int64()),
         **{f"h{j}": pa.array(cols[j], pa.int64()) for j in range(d)}}),
        os.path.join(out_dir, "cms_hashes.parquet"))
    return out_dir


def cms_oracle_sql(side_dir: str, d: int = 4, probe_mod: int = 7) -> str:
    """DuckDB replay: exact probe counts recomputed from raw events;
    est replayed as min over the matrix side table at the shared hash
    columns; overcount published (negative would break the row match)."""
    # COALESCE: the matrix side table is sparse (zero cells unwritten);
    # a probe key never counted would otherwise yield NULL est_n instead
    # of the CMS's true 0 (today's probes are drawn from counted events,
    # so every cell is >= 1 — the guard is for future probe sets)
    est_min = "LEAST(" + ", ".join(
        f"COALESCE((SELECT cnt FROM "
        f"read_parquet('{side_dir}/cms_matrix.parquet') m"
        f" WHERE m.d = {j} AND m.col = h.h{j}), 0)" for j in range(d)) + ")"
    return f"""
    WITH exact AS (
      SELECT user_id, count(*)::BIGINT AS exact_n
      FROM events WHERE user_id % {probe_mod} = 0 GROUP BY 1),
    h AS (SELECT * FROM read_parquet('{side_dir}/cms_hashes.parquet'))
    SELECT e.user_id, {est_min}::BIGINT AS est_n, e.exact_n,
           ({est_min} - e.exact_n)::BIGINT AS overcount
    FROM exact e JOIN h USING (user_id)"""
