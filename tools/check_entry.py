"""Local replica of the driver's correctness gate: run every
__spark_entry__ query at sf0.01 and diff against its DuckDB oracle
(row count + order-insensitive value comparison, column-name aligned).

Usage: python tools/check_entry.py [sf_dir] [query ...]
       python tools/check_entry.py --rotated [sf_dir]

``--rotated`` checks ONLY the registry tail past the driver's 50-entry
window and writes the results to CORRECTNESS_rotated.json — committed
each round so position-51+ queries keep an auditable record even
though the driver no longer re-checks them (ADVICE r5 #1).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod  # noqa: E402
from windflow_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _kind(dtype) -> str:
    """Dtype family as the driver's row-hash would render it: int-family
    (signed/unsigned) prints '3', float prints '3.0', bool prints 'True'.
    A family mismatch between engine and oracle passes value comparison
    but fails the driver hash (the round-2 session_windows red cell), so
    it must FAIL here too."""
    k = dtype.kind
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k in ("M", "m"):
        return "int"  # normalize() casts datetimes to int64
    return "str"


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif isinstance(df[c].dtype, pd.DatetimeTZDtype) or pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("int64")
        try:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        except TypeError:
            pass
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main() -> int:
    args = sys.argv[1:]
    rotated_only = "--rotated" in args
    args = [a for a in args if a != "--rotated"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark("check-entry", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    if rotated_only:
        only = set(list(qs)[50:])
    failures = []
    record: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append(name)
            record[name] = {"match": False, "err": f"spark error {str(ex)[:200]}"}
            print(f"FAIL {name}: spark error {str(ex)[:200]}")
            continue
        if name not in oracles:
            record[name] = {"match": True, "rows": len(got), "rows_only": True}
            print(f"ok   {name}: rows-only ({len(got)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as ex:
            failures.append(name)
            record[name] = {"match": False, "err": f"duckdb error {str(ex)[:200]}"}
            print(f"FAIL {name}: duckdb error {str(ex)[:200]}")
            continue
        if len(got) != len(want):
            failures.append(name)
            record[name] = {"match": False, "err": f"rows {len(got)} vs {len(want)}"}
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            continue
        g, w = normalize(got), normalize(want)
        if sorted(g.columns) != sorted(w.columns):
            failures.append(name)
            record[name] = {"match": False, "err": "column mismatch"}
            print(f"FAIL {name}: columns {sorted(g.columns)} vs {sorted(w.columns)}")
            continue
        kind_skew = [
            (c, g[c].dtype, w[c].dtype)
            for c in g.columns
            if _kind(g[c].dtype) != _kind(w[c].dtype)
        ]
        if kind_skew:
            failures.append(name)
            record[name] = {"match": False, "err": f"dtype-family mismatch {kind_skew}"}
            print(f"FAIL {name}: dtype-family mismatch (driver hash would differ): {kind_skew}")
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, rtol=1e-6, atol=1e-9)
            record[name] = {"match": True, "rows": len(got)}
            print(f"ok   {name}: {len(got)} rows match ({time.time()-t0:.1f}s)")
        except AssertionError as ex:
            failures.append(name)
            record[name] = {"match": False, "err": f"value mismatch {str(ex)[:300]}"}
            print(f"FAIL {name}: value mismatch: {str(ex)[:300]}")
    if rotated_only:
        out = Path(__file__).resolve().parent.parent / "CORRECTNESS_rotated.json"
        out.write_text(json.dumps(record, indent=1) + "\n")
        print(f"wrote {out} ({len(record)} rotated queries)")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL MATCH")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
