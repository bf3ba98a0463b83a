"""Local replica of the driver's correctness gate.

Runs every (or a selected subset of) `queries()` entry from
`__ray_entry__.py` against its `oracle_sql()` DuckDB equivalent over the
same parquet tables, then compares row count, schema (column-name set) and
values after the driver's canonicalization: columns sorted by NAME, rows
sorted by all columns. Floats compare with a tight tolerance (1e-9
relative) so genuine mismatches surface while dtype-width differences
(int32 vs int64, float32 vs float64) do not.

Usage:
    python tools/sweep.py [--sf /root/testdata/sf0.01] [q1 q2 ...]
    python tools/sweep.py --json out.json          # full sweep, record
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res.reset_index(drop=True)
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray.data.Dataset (small — sf0.01 results)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        v = df[c]
        if pd.api.types.is_datetime64_any_dtype(v):
            df[c] = v.astype("datetime64[us]").astype("int64")
        elif v.dtype == object:
            # a numeric column can arrive as object dtype (ints + None from
            # all-null Arrow blocks) — coerce before falling back to repr,
            # so both sides canonicalize to the same float64
            try:
                df[c] = pd.to_numeric(v)
                continue
            except (ValueError, TypeError):
                pass
            df[c] = v.map(
                lambda x: repr(sorted(x))
                if isinstance(x, (list, np.ndarray, set))
                else repr(x)
            )
        elif pd.api.types.is_bool_dtype(v):
            df[c] = v.astype("int64")
        elif pd.api.types.is_integer_dtype(v):
            df[c] = v.astype("int64")
        elif pd.api.types.is_float_dtype(v):
            # driver parity: floats round to 6dp BEFORE the row sort —
            # otherwise sub-1e-12 engine/oracle float differences reorder
            # rows between the two sides and misalign the compare
            df[c] = v.astype("float64").round(6)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _values_match(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False, "shape"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(b[c]):
            an, bn = np.isnan(av), np.isnan(bv)
            if not np.array_equal(an, bn):
                return False, f"{c}: nan placement"
            ok = np.isclose(av[~an], bv[~bn], rtol=1e-9, atol=1e-12)
            if not ok.all():
                i = int(np.nonzero(~ok)[0][0])
                return False, f"{c}: {av[~an][i]!r} != {bv[~bn][i]!r}"
        else:
            eq = av == bv
            # pandas nullable NA: fall back to pairwise
            try:
                bad = not bool(np.asarray(eq).all())
            except Exception:
                bad = any(x != y for x, y in zip(av, bv))
            if bad:
                idx = [i for i, (x, y) in enumerate(zip(av, bv)) if x != y]
                i = idx[0] if idx else 0
                return False, f"{c}: {av[i]!r} != {bv[i]!r}"
    return True, ""


def run_one(name, fn, sql, sf_dir, con) -> dict:
    t0 = time.time()
    out: dict = {"name": name}
    try:
        mine = _canon(_to_pandas(fn(sf_dir)))
        out["ray_rows"] = len(mine)
        oracle = _canon(con.execute(sql).df())
        out["oracle_rows"] = len(oracle)
        out["rows_match"] = len(mine) == len(oracle)
        out["schema_match"] = list(mine.columns) == list(oracle.columns)
        if not out["schema_match"]:
            out["detail"] = f"cols {list(mine.columns)} vs {list(oracle.columns)}"
            out["match"] = False
        else:
            ok, why = _values_match(mine, oracle)
            out["match"] = bool(out["rows_match"] and ok)
            if why:
                out["detail"] = why
    except Exception:
        out["match"] = False
        out["detail"] = traceback.format_exc(limit=8)
    out["sec"] = round(time.time() - t0, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.01"))
    ap.add_argument("--json", default=None)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 16)),
                 include_dashboard=False, logging_level="ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as E

    qs = E.queries()
    oracles = E.oracle_sql()
    names = args.names or sorted(qs)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results, n_ok = [], 0
    for name in names:
        if name not in qs:
            print(f"{name}: NOT A QUERY", flush=True)
            continue
        if name not in oracles:
            print(f"{name}: no oracle (rows-only)", flush=True)
            continue
        r = run_one(name, qs[name], oracles[name], args.sf, con)
        results.append(r)
        n_ok += bool(r["match"])
        tag = "MATCH" if r["match"] else "MISMATCH"
        extra = "" if r["match"] else f"  {r.get('detail', '')[:500]}"
        print(f"{name}: {tag} ({r.get('ray_rows')}/{r.get('oracle_rows')} rows,"
              f" {r['sec']}s){extra}", flush=True)

    print(f"\n{n_ok}/{len(results)} MATCH  sf={args.sf}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({r["name"]: r for r in results}, f, indent=1)
    ray.shutdown()
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
