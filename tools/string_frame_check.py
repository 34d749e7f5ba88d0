#!/usr/bin/env python3
"""Driver-frame-exact oracle compare (stricter than check_oracle.py).

Replicates the driver's compare frame: load the Spark parquet result
and the DuckDB oracle result, sort columns by name, stringify every
value via pandas astype(str), sort rows, require EXACT equality — no
float rounding tolerance. This is the frame that caught the r14
text_heaps_law HUGEINT->float64 dtype divergence that value-rounding
compares (check_oracle.py) could not see.

Usage: python3 tools/string_frame_check.py <sfDir> <verifyOutDir> [name ...]
"""
import glob
import json
import sys

import duckdb


def frame(df):
    df = df[sorted(df.columns)]
    return df.astype(str).sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        if not glob.glob(f"{out_dir}/{name}/*.parquet"):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            duck = con.execute(sql).df()
            a, b = frame(spark), frame(duck)
            if a.equals(b):
                n_pass += 1
            else:
                n_fail += 1
                print(f"FAIL {name}: string-frame mismatch "
                      f"(spark {spark.shape} {dict(spark.dtypes.astype(str))} "
                      f"vs duck {duck.shape} {dict(duck.dtypes.astype(str))})")
                if a.shape == b.shape and list(a.columns) == list(b.columns):
                    diff = a.compare(b)
                    print(diff.head(5))
        except Exception as e:
            n_fail += 1
            print(f"FAIL {name}: {type(e).__name__}: {e}")
    print(f"\n{n_pass} string-frame exact, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
