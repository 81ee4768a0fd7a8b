#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view named after the table,
runs every oracle_sql.json entry, and compares cell-by-cell against the
Spark parquet dump (columns sorted by name, rows in written order).
"""
import sys, os, json, math, decimal
import duckdb

def canon(v):
    """Type-strict canonical cell value. The driver hashes typed cells,
    so Decimal(5), 5 and 5.0 must all compare UNEQUAL here (Python ==
    would call them equal) — tag every scalar with its type name.
    """
    if v is None:
        return None
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        return ("float", "NaN" if math.isnan(v) else v)
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if hasattr(v, "isoformat"):
        return ("ts", v.isoformat())
    return (type(v).__name__, v)

def rows_of(con, sql):
    """(sorted col names, sorted col TYPES, canon rows) for a query.
    Types come from DESCRIBE so HUGEINT-vs-BIGINT (DuckDB widens
    sum(BIGINT)) fails here exactly like it fails the driver's hash.
    """
    # Collapse plain integer widths: the driver hashes Python ints, so
    # INT32 vs BIGINT compare equal there (r3 evidence: Spark's int32
    # row_number vs DuckDB's int64 row_number passed). HUGEINT stays
    # distinct — it surfaces as Decimal, which the driver DOES fail.
    def ntype(t):
        return "INT" if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                              "UTINYINT", "USMALLINT", "UINTEGER") else t
    types = {r[0]: ntype(r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall()}
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = cur.fetchall()
    return ([cols[i] for i in order],
            [types[cols[i]] for i in order],
            [tuple(canon(r[i]) for i in order) for r in data])

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output dir"); n_fail += 1; continue
        try:
            ocols, otypes, orows = rows_of(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        try:
            scols, stypes, srows = rows_of(
                con, f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}"); n_fail += 1; continue
        if scols != ocols:
            print(f"FAIL {name}: columns differ spark={scols} oracle={ocols}")
            n_fail += 1; continue
        if stypes != otypes:
            print(f"FAIL {name}: column types differ spark={stypes} oracle={otypes}")
            n_fail += 1; continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            n_fail += 1; continue
        bad = next((i for i, (a, b) in enumerate(zip(srows, orows)) if a != b), None)
        if bad is not None:
            print(f"FAIL {name}: first diff at row {bad}:")
            print(f"  spark : {srows[bad]}")
            print(f"  oracle: {orows[bad]}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(srows)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
