#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Loads each query's parquet result, runs its oracle SQL in DuckDB over the
same tables, sorts columns by name (the driver's rule), canonicalizes rows,
and diffs. Exit 1 on any mismatch.
"""
import json
import sys

import duckdb


def canon(df):
    # sort columns by name, then rows by all values (stringified)
    df = df[sorted(df.columns)]
    rows = [tuple(str(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            failures += 1
            continue
        cg, cw = canon(got), canon(want)
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(want.columns)}")
            failures += 1
        elif cg != cw:
            print(f"FAIL {name}: {len(cg)} vs {len(cw)} rows")
            for i, (a, b) in enumerate(zip(cg, cw)):
                if a != b:
                    print(f"  first diff row {i}: spark={a} oracle={b}")
                    break
            if len(cg) != len(cw):
                only_g = set(cg) - set(cw)
                only_w = set(cw) - set(cg)
                for r in list(only_g)[:3]:
                    print(f"  spark-only: {r}")
                for r in list(only_w)[:3]:
                    print(f"  oracle-only: {r}")
            failures += 1
        else:
            # dtype check (schema parity)
            tg = [str(got[c].dtype) for c in sorted(got.columns)]
            tw = [str(want[c].dtype) for c in sorted(want.columns)]
            flag = "" if tg == tw else f"  [dtype diff: {tg} vs {tw}]"
            print(f"PASS {name} ({len(cg)} rows){flag}")
    # rows-only queries (no oracle)
    import glob
    import os
    all_q = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/q*"))
    for name in all_q:
        if name not in oracle:
            n = con.sql(f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
            print(f"ROWS {name}: {n} rows")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
