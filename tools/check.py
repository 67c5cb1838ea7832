#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB against the raw tables in
<sfDir>, and compares: row count, column names, and exact values (columns
sorted by name, rows sorted by all columns) — approximating the driver's
row/schema/hash match.
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    return repr(v)


def frame_rows(con, rel):
    cols = rel.columns
    types = [str(t) for t in rel.types]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(canon(r[i]) for i in order) for r in rel.fetchall()]
    rows.sort()
    return [f"{cols[i]}:{types[i]}" for i in order], rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            mine_cols, mine = frame_rows(con, con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
            oc_cols, oc = frame_rows(con, con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if mine_cols != oc_cols:
            print(f"FAIL {name}: columns {mine_cols} vs {oc_cols}")
            n_fail += 1
        elif len(mine) != len(oc):
            print(f"FAIL {name}: rows {len(mine)} vs {len(oc)}")
            n_fail += 1
        elif mine != oc:
            bad = next(i for i, (a, b) in enumerate(zip(mine, oc)) if a != b)
            print(f"FAIL {name}: first diff at sorted-row {bad}:")
            print(f"  spark : {mine[bad]}")
            print(f"  duckdb: {oc[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(mine)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
