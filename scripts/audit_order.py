#!/usr/bin/env python3
"""Audit oracle ORDER BY totality.

For each oracle_sql.json entry, parse the OUTER ORDER BY column list and
check (in DuckDB, against a given sf dir) whether any tie group under
those columns contains more than one DISTINCT full row. Such a query's
row sequence is engine-tie-order dependent: it may pass the cell-by-cell
compare today and diverge at another scale or engine version — exactly
the defect class the sf1 sweep caught in p3/st3.

Usage: python3 scripts/audit_order.py <sfDir> <verifyOutDir>
"""
import sys, os, json, re
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# The ONLY queries allowed to skip the audit: single-row aggregates,
# where no ORDER BY is needed because no tie group can exist. Any other
# SKIP (no outer ORDER BY found) or ERR (the key-list extraction or the
# tie query failed) is a parser/coverage gap and fails the audit — a
# quietly skipped query would otherwise read as "covered".
EXPECTED_SKIPS = {"f8_keys_csv", "sql1_tpch_q6", "sql14_stats_agg",
                  "sql19_limit_scan"}
# sql1/sql14/sql19: single-row global aggregates — one output row,
# trivially total-ordered. f8: single-row CSV collapse.


def outer_order_by(sql):
    """Column list of the top-level ORDER BY, or None.

    Scans for the last ORDER BY that sits at paren depth 0; returns the
    text up to the end / LIMIT, split on top-level commas.
    """
    depth = 0
    last = None
    for m in re.finditer(r"(?i)ORDER\s+BY", sql):
        d = sql[: m.start()].count("(") - sql[: m.start()].count(")")
        if d == 0:
            last = m
    if last is None:
        return None
    rest = sql[last.end():]
    stop = re.search(r"(?i)\bLIMIT\b", rest)
    if stop:
        rest = rest[: stop.start()]
    cols, depth, cur = [], 0, ""
    for ch in rest:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            cols.append(cur.strip())
            cur = ""
        else:
            cur += ch
    if cur.strip():
        cols.append(cur.strip())
    return cols


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    flagged = clean = 0
    skipped_names = []
    for name, sql in sorted(oracle.items()):
        cols = outer_order_by(sql)
        if not cols:
            print(f"SKIP {name}: no outer ORDER BY")
            skipped_names.append(name)
            continue
        if any(c.upper() == "ALL" for c in cols):
            print(f"OK   {name}: ORDER BY ALL (total by construction)")
            clean += 1
            continue
        # strip ASC/DESC/NULLS FIRST|LAST qualifiers for the key list,
        # and table/CTE qualifiers (out of scope once wrapped in (sql) t)
        keys = [re.sub(r"\b\w+\.", "",
                       re.sub(r"(?i)\s+(ASC|DESC|NULLS\s+(FIRST|LAST))\b", "", c))
                .strip() for c in cols]
        # positional ORDER BY n → the n-th output column's name (the
        # positions would otherwise bind to the audit wrapper's SELECT)
        if any(k.isdigit() for k in keys):
            names = [r[0] for r in
                     con.execute(f"DESCRIBE ({sql})").fetchall()]
            keys = [f'"{names[int(k) - 1]}"' if k.isdigit() else k
                    for k in keys]
        key_list = ", ".join(keys)
        try:
            q = (f"SELECT count(*) FROM (SELECT DISTINCT * FROM ({sql}) t)"
                 f" GROUP BY {key_list} HAVING count(*) > 1")
            ties = con.execute(q).fetchall()
        except Exception as e:
            print(f"ERR  {name}: {str(e).splitlines()[0][:120]}")
            skipped_names.append(name)
            continue
        if ties:
            n = len(ties)
            worst = max(t[0] for t in ties)
            print(f"FLAG {name}: {n} tie group(s) with distinct rows "
                  f"(worst {worst} rows) under ORDER BY {key_list}")
            flagged += 1
        else:
            print(f"OK   {name}")
            clean += 1
    unexpected = sorted(set(skipped_names) - EXPECTED_SKIPS)
    print(f"\n{clean} total-ordered, {flagged} flagged, "
          f"{len(skipped_names)} skipped ({len(unexpected)} unexpected)")
    if unexpected:
        print("UNEXPECTED skips (not in EXPECTED_SKIPS — parser gap or "
              f"missing ORDER BY): {', '.join(unexpected)}")
    return 1 if flagged or unexpected else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
