#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [name1,name2,...]

Reads <verifyOutDir>/<name>/ (Spark parquet) and oracle_sql.json, runs each
oracle against DuckDB views over <sfDir>/*.parquet, and compares sorted rows
and (loosely) schemas. Prints PASS/FAIL per query. The optional 3rd arg
restricts the compare to a comma-separated subset (mirrors Verify's own
filter arg — local iteration aid; the driver always runs the full battery).
"""
import json
import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)


def rows_key(df):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if len(sys.argv) > 3:
        only = set(sys.argv[3].split(","))
        oracle = {k: v for k, v in oracle.items() if k in only}
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            failed.append(name)
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failed.append(name)
            continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}")
            failed.append(name)
            continue
        # dtype drift (e.g. DuckDB SUM(BIGINT) -> HUGEINT/object vs Spark
        # int64) hashes differently on the driver even when values match —
        # compare pandas dtypes per column, not just values.
        dt_bad = [
            (c, str(got[c].dtype), str(exp[c].dtype))
            for c in sorted(got.columns)
            if str(got[c].dtype) != str(exp[c].dtype)
        ]
        if dt_bad:
            print(f"FAIL {name}: dtype mismatch {dt_bad}")
            failed.append(name)
            continue
        g, e = rows_key(got), rows_key(exp)
        if g != e:
            diff = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"FAIL {name}: {len(g)} vs {len(e)} rows; first diffs: {diff}")
            failed.append(name)
        else:
            print(f"PASS {name} ({len(g)} rows)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} passed")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
