#!/usr/bin/env python3
"""Dev-loop replica of the driver's correctness gate: for each query dumped
by graft.Verify, run the declared oracle SQL in DuckDB over the same parquet
tables and compare row-for-row (columns sorted by name, rows sorted).

Type-sensitive like the driver: the DuckDB result is fetched as Arrow and its
column types are compared (canonicalized) against the Spark parquet schema, so
e.g. DuckDB's sum(BIGINT) -> HUGEINT widening fails here before submission.

Usage: check_oracle.py <sfDir> <verifyOutDir>
Self-test: check_oracle.py --selftest
"""
import sys, os, json, glob
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def type_canon(t):
    """Canonical name for an arrow type so spark-parquet and duckdb-arrow
    spellings of the same logical type compare equal (large_string vs string,
    large_list vs list), while genuine widenings (int64 vs decimal128/float64
    from HUGEINT) stay distinct."""
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return f"list<{type_canon(t.value_type)}>"
    if pa.types.is_timestamp(t):
        return "timestamp"   # unit differences are handled by value compare
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    return str(t)

def canon(v):
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, list):
        return ("l", tuple(canon(x) for x in v))
    return (type(v).__name__, v)

def compare(spark_tbl, duck_tbl, name):
    """Returns (ok, msg). Type-then-value comparison, columns sorted by name."""
    spark_cols = spark_tbl.schema.names
    duck_cols = duck_tbl.schema.names
    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"SCHEMA   {name}: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    order = sorted(spark_cols)
    for c in order:
        st = type_canon(spark_tbl.schema.field(c).type)
        dt = type_canon(duck_tbl.schema.field(c).type)
        if st != dt:
            return False, f"TYPEDIFF {name}: col '{c}' spark={st} duck={dt} (cast the oracle side)"
        # the driver's comparator sorts with pandas, which cannot hash
        # list/struct cells (crashed q_array_funcs in r03) — forbid them here
        if st.startswith("list<") or pa.types.is_struct(spark_tbl.schema.field(c).type):
            return False, (f"NESTEDCOL {name}: col '{c}' is {st} — the driver cannot "
                           f"sort nested columns; emit a joined string instead")
    sp = spark_tbl.to_pydict()
    dk = duck_tbl.to_pydict()
    spark_rows = sorted(
        tuple(canon(sp[c][i]) for c in order) for i in range(spark_tbl.num_rows))
    duck_rows = sorted(
        tuple(canon(dk[c][i]) for c in order) for i in range(duck_tbl.num_rows))
    if spark_rows == duck_rows:
        return True, f"PASS     {name} ({len(spark_rows)} rows)"
    msg = f"FAIL     {name}: spark {len(spark_rows)} rows vs duck {len(duck_rows)} rows"
    for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
        if a != b:
            msg += f"\n  first diff row {i}:\n    spark: {a}\n    duck:  {b}"
            break
    return False, msg

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
            duck_tbl = con.execute(sql).arrow()
        except Exception as e:
            print(f"SQLERR   {name}: {e}")
            n_fail += 1
            continue
        ok, msg = compare(tbl, duck_tbl, name)
        print(msg)
        if ok:
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

def selftest():
    """Regressions: an uncast sum(BIGINT) oracle must FAIL the type check
    even though the values are integer-equal (the round-1 HUGEINT escape),
    and a list-typed output column must FAIL (the round-3 pandas crash)."""
    con = duckdb.connect()
    nested = pa.table({"k": pa.array([1], pa.int64()),
                       "parts": pa.array([[1, 2]], pa.list_(pa.int64()))})
    ok, msg = compare(nested, nested, "nested_col")
    assert not ok and "NESTEDCOL" in msg, "list output column should be rejected"
    spark_like = pa.table({"k": pa.array([1, 2], pa.int64()),
                           "total": pa.array([10, 20], pa.int64())})
    bad = con.execute(
        "SELECT CAST(k AS BIGINT) AS k, sum(v) AS total FROM (VALUES (1,10),(2,20)) t(k,v) "
        "GROUP BY k ORDER BY k").arrow()
    ok, _ = compare(spark_like, bad, "uncast_sum")
    assert not ok, "uncast sum(BIGINT) should fail the type check"
    good = con.execute(
        "SELECT CAST(k AS BIGINT) AS k, CAST(sum(v) AS BIGINT) AS total FROM (VALUES (1,10),(2,20)) t(k,v) "
        "GROUP BY k ORDER BY k").arrow()
    ok, _ = compare(spark_like, good, "cast_sum")
    assert ok, "cast sum should pass"
    print("selftest: 3 pass")
    return 0

if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
