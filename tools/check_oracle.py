#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result,
run the matching oracle SQL (oracle_sql.json) in DuckDB with the sf
tables registered by name, then compare row count, column-name sets,
and value hashes with columns sorted by name and rows sorted by all
columns. Floats compared after round(9) to surface real mismatches
while tolerating last-bit noise (the real driver may be stricter —
queries should already round their float outputs).
"""
import sys, json, glob, math
import duckdb

def canon(rows, cols):
    # rows: list of tuples in col order; sort columns by name, then rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = round(v, 9)
            if isinstance(v, list):
                v = tuple(round(x, 9) if isinstance(x, float) else x for x in v)
            rr.append(v)
        out.append(tuple(rr))
    return sorted(out, key=repr), [cols[i] for i in order]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            scur = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols = [d[0] for d in scur.description]
            s_rows = scur.fetchall()
            dcur = con.execute(sql)
            d_cols = [d[0] for d in dcur.description]
            d_rows = dcur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
            n_fail += 1; continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1; continue
        cs, _ = canon(s_rows, s_cols)
        cd, _ = canon(d_rows, d_cols)
        if cs != cd:
            bad = next(i for i in range(len(cs)) if cs[i] != cd[i])
            print(f"FAIL {name}: value mismatch at sorted-row {bad}:")
            print(f"  spark: {cs[bad]}")
            print(f"  duck : {cd[bad]}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(s_rows)} rows)")
        n_pass += 1
    # queries with no oracle: rows-only note
    import os
    for d in sorted(os.listdir(out_dir)):
        if os.path.isdir(f"{out_dir}/{d}") and d not in oracles:
            try:
                n = con.execute(f"SELECT count(*) FROM '{out_dir}/{d}/*.parquet'").fetchone()[0]
                print(f"INFO {d}: no oracle, {n} rows")
            except Exception as e:
                print(f"INFO {d}: no oracle, unreadable: {e}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
