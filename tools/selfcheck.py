"""Replicates the driver's correctness gate: run every queries() entry and
its oracle_sql() side by side, compare row count, column names and
order-insensitive values.

Usage: python tools/selfcheck.py [sf0.01] [query ...]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (list, np.ndarray)):
            df[c] = df[c].map(lambda x: tuple(np.asarray(x).tolist()))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _dtype_class(dt) -> str:
    """Normalize a pandas dtype into the classes the driver's value-hash
    distinguishes. int64-vs-float64 hash-mismatches even when values are
    numerically equal (r4 verdict item 2: uncast HUGEINT oracle columns
    surfaced as float64 and went red despite exact values)."""
    s = str(dt)
    k = getattr(dt, "kind", "")
    if k in ("i", "u"):
        return "int64"
    if k == "f":
        return "float64"
    if k == "b":
        return "bool"
    if s.startswith("datetime64"):
        return "timestamp"
    return "object"


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"columns differ: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"row count: ray={len(ray_df)} sql={len(sql_df)}")
        return problems
    a, b = normalize(ray_df), normalize(sql_df)
    for c in a.columns:
        da, db = _dtype_class(a[c].dtype), _dtype_class(b[c].dtype)
        # Empty object columns (all-NULL oracle output) are indistinguishable
        # from typed ones after to_pandas; only flag when both sides have rows.
        if da != db and len(a):
            problems.append(f"col {c}: dtype class differs: ray={da} ({a[c].dtype}) sql={db} ({b[c].dtype})")
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            both_nan = np.isnan(av.astype(float)) & np.isnan(bv.astype(float))
            eq = (av == bv) | both_nan
            if not eq.all():
                bad = np.flatnonzero(~eq)[:3]
                mx = np.nanmax(np.abs(av.astype(float) - bv.astype(float)))
                problems.append(
                    f"col {c}: {len(np.flatnonzero(~eq))} mismatches, max|d|={mx:.3g}, "
                    f"e.g. rows {bad.tolist()} ray={av[bad].tolist()} sql={bv[bad].tolist()}"
                )
        else:
            eq = pd.Series(av).eq(pd.Series(bv)) | (pd.Series(av).isna() & pd.Series(bv).isna())
            if not eq.all():
                bad = np.flatnonzero(~eq.to_numpy())[:3]
                problems.append(
                    f"col {c}: {len(np.flatnonzero(~eq.to_numpy()))} mismatches, "
                    f"e.g. rows {bad.tolist()} ray={av[bad].tolist()} sql={bv[bad].tolist()}"
                )
    return problems


def main() -> int:
    import duckdb
    import ray

    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf = args[0] if args and args[0].startswith("sf") else "sf0.01"
    only = [a for a in args if not a.startswith("sf")]
    sf_dir = f"/root/testdata/{sf}"

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs, sqls = entrymod.queries(), entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failed = []
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: ray query raised: {e!r}")
            failed.append(name)
            results[name] = {"status": "fail", "err": repr(e)}
            continue
        if name not in sqls:
            print(f"ok   {name}: rows={len(ray_df)} (no oracle — rows-only)")
            results[name] = {"status": "rows_only", "rows": len(ray_df)}
            continue
        try:
            sql_df = con.sql(sqls[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle sql raised: {e!r}")
            failed.append(name)
            results[name] = {"status": "fail", "err": f"oracle: {e!r}"}
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            print(f"FAIL {name}:")
            for p in problems:
                print(f"     {p}")
            failed.append(name)
            results[name] = {"status": "fail", "problems": problems}
        else:
            print(f"ok   {name}: rows={len(ray_df)} exact match")
            results[name] = {"status": "exact", "rows": len(ray_df)}
    ray.shutdown()
    if json_path:
        import json

        with open(json_path, "w") as fh:
            json.dump({"sf": sf, "results": results}, fh, indent=1)
    if failed:
        print(f"\n{len(failed)} FAILED: {failed}")
        return 1
    print("\nall queries match their oracles")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
