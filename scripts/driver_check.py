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


def value_hash(df: pd.DataFrame) -> str:
    """Canonical value hash: columns sorted by name, rows sorted by all
    columns, each column hashed as (name, dtype-class, exact value bytes)
    — at least as strict as any order-insensitive driver hash, and
    strictly stricter than a float64-cast compare (int64 beyond 2^53
    and dtype flips change it)."""
    import hashlib
    cols = sorted(df.columns)
    d = df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    h = hashlib.sha256()
    for c in cols:
        s = d[c]
        if pd.api.types.is_float_dtype(s):
            kind, b = "f", s.to_numpy(np.float64).tobytes()
        elif pd.api.types.is_integer_dtype(s) and not s.isna().any():
            kind, b = "i", s.to_numpy(np.int64).tobytes()
        elif pd.api.types.is_bool_dtype(s) and not s.isna().any():
            kind, b = "b", s.to_numpy(np.bool_).tobytes()
        else:
            kind = "s"
            # canonicalize nulls: engine None vs DuckDB NaN for NULL
            # booleans/strings are the same value, not a hash diff
            b = "\x1f".join(
                "\x00" if pd.isna(v) else str(v)
                for v in s.tolist()).encode()
        h.update(f"{c}:{kind}:".encode()); h.update(b)
    return h.hexdigest()[:16]


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
        g_int = pd.api.types.is_integer_dtype(g[c])
        e_int = pd.api.types.is_integer_dtype(e[c])
        if g_int and e_int:
            # exact — a float64 cast would hide diffs beyond 2^53
            same = gv.astype(np.int64) == ev.astype(np.int64)
        else:
            try:
                gv = gv.astype(np.float64); ev = ev.astype(np.float64)
                same = (gv == ev) | (np.isnan(gv) & np.isnan(ev))
            except (TypeError, ValueError):
                same = g[c].astype(str).to_numpy() == e[c].astype(str).to_numpy()
        if not same.all():
            i = int(np.flatnonzero(~same)[0])
            problems.append(f"col {c}: first diff row {i}: ray={g[c].iloc[i]!r} sql={e[c].iloc[i]!r} ({(~same).sum()} diffs)")
        if g[c].dtype.kind != e[c].dtype.kind:
            # values equal but dtype class differs across sides — a
            # dtype-tagged driver hash could still flag this; surface it
            # loudly (warning, not failure: value equality is the gate)
            print(f"WARN {name}: dtype-kind col {c}: ray={g[c].dtype} "
                  f"sql={e[c].dtype} (align engine/SQL output dtype)")
    return problems


def main():
    args = [a for a in sys.argv[1:] if a != "--json"]
    write_json = "--json" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
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
    record: dict = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            record[name] = {"error": f"{type(ex).__name__}: {ex}"}
            bad += 1
            continue
        dt = time.time() - t0
        if name in oracles:
            exp = con.sql(oracles[name]).df()
            problems = compare(name, got, exp)
            hg, he = value_hash(got), value_hash(exp)
            rec = {"rows": len(got), "oracle_rows": len(exp),
                   "rows_match": len(got) == len(exp),
                   "schema_match": sorted(got.columns) == sorted(exp.columns),
                   "hash_match": hg == he, "seconds": round(dt, 2)}
            record[name] = rec
            if problems:
                print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
                bad += 1
            elif hg != he:
                bad += 1
                print(f"FAIL {name} ({dt:.1f}s): canonical hash"
                      f" mismatch  HASH-DIFF ray={hg} sql={he}")
            else:
                print(f"ok   {name} ({dt:.1f}s): {len(got)} rows == "
                      f"oracle  [h={hg}]")
                ok += 1
        else:
            record[name] = {"rows": len(got), "rows_only": True,
                            "seconds": round(dt, 2)}
            print(f"ok?  {name} ({dt:.1f}s): {len(got)} rows (rows-only, no oracle)")
            ok += 1
    print(f"\n{ok} ok, {bad} fail")
    if write_json:
        import json as _json
        import subprocess
        head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              capture_output=True, text=True,
                              cwd=os.path.dirname(os.path.dirname(
                                  os.path.abspath(__file__)))).stdout.strip()
        out = {"sf_dir": sf_dir, "git_head": head,
               "ok": ok, "fail": bad, "queries": record}
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "CORRECTNESS_LOCAL.json")
        with open(path, "w") as f:
            _json.dump(out, f, indent=1, sort_keys=True)
        print(f"wrote {path}")
    ray.shutdown()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
