#!/usr/bin/env python3
"""Mimic of the DRIVER's correctness gate (as opposed to tools/check.py,
our more lenient stand-in).

The driver reads each Verify output parquet into pandas, runs the oracle
SQL in DuckDB into pandas, sorts columns by name, then row-sorts with
``DataFrame.sort_values(by=<all columns>)`` before hashing values.  That
sort path CRASHES on any column whose Python values are unhashable —
dicts (struct/map), lists/ndarrays (arrays), and DuckDB blobs that come
back as ``bytearray``.  CORRECTNESS_r03 lost 15 queries to exactly this,
so this mimic exists to catch it locally before the driver does.

Usage: python3 tools/driver_check.py <sfDir> <verifyOutDir> [query ...]
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_cell(v):
    # Driver-style type-aware canonicalization (best-effort mimic).
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    import datetime
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        # pandas reads parquet DATE as datetime.date, DuckDB's .df()
        # as midnight Timestamp — the real driver treats them equal
        # (t07 passed r03), so normalize to the date's ISO text.
        return f"date:{v.isoformat()}"
    if isinstance(v, pd.Timestamp) and v == v.normalize():
        return f"date:{v.date().isoformat()}"
    return f"{type(v).__name__}:{v!r}"


def load_sorted(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # pandas turns missing values into NaN/NaT; normalize to None first
    df = df.astype(object).where(pd.notnull(df), None)
    # THE crash site we are mimicking: sort_values over every column.
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="last")
    return [tuple(canon_cell(v) for v in row)
            for row in df.itertuples(index=False, name=None)]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(set(oracle) | {
        p.rsplit("/", 1)[-1] for p in glob.glob(f"{out_dir}/*")
        if not p.endswith(".json")})
    n_pass = n_fail = n_weak = 0
    for name in names:
        if only and name not in only:
            continue
        try:
            # the driver reads the Spark output with pandas/pyarrow (NOT
            # DuckDB): decimals arrive as decimal.Decimal objects here but
            # as float64 from DuckDB's .df() — a guaranteed driver hash
            # mismatch, so decimal-typed output columns are banned too.
            spark_df = pd.concat(
                [pd.read_parquet(p) for p in
                 sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))],
                ignore_index=True)
            spark_rows = load_sorted(spark_df)
        except Exception as e:
            print(f"FAIL {name}: spark-side {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            # driver records a weaker rows-only check
            ok = len(spark_rows) > 0
            print(f"{'WEAK' if ok else 'FAIL'} {name}: no oracle, "
                  f"rows={len(spark_rows)}")
            n_weak += ok
            n_fail += not ok
            continue
        try:
            oc_df = con.sql(oracle[name]).df()
            oc_rows = load_sorted(oc_df)
        except Exception as e:
            print(f"FAIL {name}: oracle-side {type(e).__name__}: {e}")
            n_fail += 1
            continue
        sc = sorted(spark_df.columns)
        occ = sorted(oc_df.columns)
        if sc != occ:
            print(f"FAIL {name}: columns {sc} vs {occ}")
            n_fail += 1
        elif len(spark_rows) != len(oc_rows):
            print(f"FAIL {name}: rows {len(spark_rows)} vs {len(oc_rows)}")
            n_fail += 1
        elif spark_rows != oc_rows:
            bad = next(i for i, (a, b) in enumerate(zip(spark_rows, oc_rows))
                       if a != b)
            print(f"FAIL {name}: first diff at sorted-row {bad}:")
            print(f"  spark : {spark_rows[bad]}")
            print(f"  duckdb: {oc_rows[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_weak} weak, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
