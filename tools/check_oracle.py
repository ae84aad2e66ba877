#!/usr/bin/env python3
"""Dev-loop replica of the driver's correctness gate: for each query dumped
by graft.Verify, run the declared oracle SQL in DuckDB over the same parquet
tables and compare row-for-row (columns sorted by name, rows sorted).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, list):
        return ("l", tuple(canon(x) for x in v))
    return (type(v).__name__, v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        d = f"{out_dir}/{name}"
        if not os.path.isdir(d):
            print(f"MISSING  {name} (no spark output)")
            n_fail += 1
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL     {name}: output dir exists but holds no parquet")
            n_fail += 1
            continue
        # read every part file (Verify coalesces to 1 today, but don't rely on it)
        tbl = pa.concat_tables([pq.read_table(f) for f in sorted(files)])
        try:
            res = con.execute(sql)
            duck_cols = [c[0] for c in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            print(f"SQLERR   {name}: {e}")
            n_fail += 1
            continue
        spark_cols = tbl.schema.names
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"SCHEMA   {name}: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            n_fail += 1
            continue
        order = sorted(spark_cols)
        sp = tbl.to_pydict()
        spark_rows = sorted(
            tuple(canon(sp[c][i]) for c in order) for i in range(tbl.num_rows))
        didx = {c: i for i, c in enumerate(duck_cols)}
        duck_sorted = sorted(
            tuple(canon(r[didx[c]]) for c in order) for r in duck_rows)
        if spark_rows == duck_sorted:
            print(f"PASS     {name} ({len(spark_rows)} rows)")
            n_pass += 1
        else:
            print(f"FAIL     {name}: spark {len(spark_rows)} rows vs duck {len(duck_sorted)} rows")
            for i, (a, b) in enumerate(zip(spark_rows, duck_sorted)):
                if a != b:
                    print(f"  first diff row {i}:\n    spark: {a}\n    duck:  {b}")
                    break
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
