"""Local simulation of the driver's correctness gate.

Runs every ``queries()`` entry at the given sf dir; where an
``oracle_sql()`` entry exists, runs it in DuckDB over the same parquet
tables and compares row count, schema (column names) and values
(order-insensitive, NaN-aware).  Mirrors what CORRECTNESS_r{N}.json
records, so mismatches are caught before the driver sees them.

Usage: python scripts/driver_check.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import ray

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(exp.columns):
        return [f"schema: ray={sorted(got.columns)} sql={sorted(exp.columns)}"]
    if len(got) != len(exp):
        problems.append(f"rows: ray={len(got)} sql={len(exp)}")
        return problems
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    e = exp[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        gv, ev = g[c].to_numpy(), e[c].to_numpy()
        try:
            gv = gv.astype(np.float64); ev = ev.astype(np.float64)
            same = (gv == ev) | (np.isnan(gv) & np.isnan(ev))
        except (TypeError, ValueError):
            same = g[c].astype(str).to_numpy() == e[c].astype(str).to_numpy()
        if not same.all():
            i = int(np.flatnonzero(~same)[0])
            problems.append(f"col {c}: first diff row {i}: ray={g[c].iloc[i]!r} sql={e[c].iloc[i]!r} ({(~same).sum()} diffs)")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as E
    qs, oracles = E.queries(), E.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    ok = bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            bad += 1
            continue
        dt = time.time() - t0
        if name in oracles:
            exp = con.sql(oracles[name]).df()
            problems = compare(name, got, exp)
            if problems:
                print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
                bad += 1
            else:
                print(f"ok   {name} ({dt:.1f}s): {len(got)} rows == oracle")
                ok += 1
        else:
            print(f"ok?  {name} ({dt:.1f}s): {len(got)} rows (rows-only, no oracle)")
            ok += 1
    print(f"\n{ok} ok, {bad} fail")
    ray.shutdown()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
