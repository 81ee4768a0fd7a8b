#!/usr/bin/env python3
"""Build the sf1 sweep dataset: 10x the driver's sf0.1 testdata.

The driver ships sf{0.001,0.01,0.1}; the sf1 sweep (100x the
correctness-gate scale) runs on a derived dataset so scale-dependent
semantics (AQE plan flips, broadcast thresholds, skew valves,
watermark behavior under duplicate timestamps) get exercised without
touching /root/testdata. Construction:

- dims + documents + embeddings: copied verbatim (their oracles are
  the quadratic ones, already swept at sf0.1 — replicating documents
  would also blow up the pairwise recompute oracles). With
  --scale-docs, documents/embeddings replicate 10x too (doc_id/vec_id
  offset, text suffixed per copy so contents stay distinct,
  embeddings identical across copies — each vector gains 9 exact
  twins, a deliberate worst-case density stress for the LSH/ANN/
  dedup surface). That variant is for BENCH-ONLY scaling runs: the
  quadratic DuckDB oracles are impractical at 10x documents.
- facts (orders, lineitem, events): 10 copies each, primary key
  offset by 10,000,000 per copy so keys never collide; every other
  column (FKs into dims, user_id, ts, measures) is unchanged. This
  deliberately creates duplicate timestamps and duplicate
  (l_orderkey % OFF, l_linenumber) multiplicity — the tie-order
  stress that caught the p3/st3 harness defects.
- events is written through pyarrow, not DuckDB COPY, to preserve the
  driver's timestamp[ns] physical type (DuckDB would downcast to
  micros and graft.engine.Tables.events reads nanos).

Usage: python3 scripts/make_sf1.py [src_sf_dir] [out_dir]
Defaults: /root/testdata/sf0.1 -> /tmp/sf1
"""
import os
import shutil
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

COPIES = 10
OFF = 10_000_000


def main(src, out, scale_docs=False):
    os.makedirs(out, exist_ok=True)
    copied = ["region", "nation", "customer", "supplier", "part"]
    if not scale_docs:
        copied += ["documents", "embeddings"]
    for t in copied:
        shutil.copyfile(f"{src}/{t}.parquet", f"{out}/{t}.parquet")

    con = duckdb.connect()
    if scale_docs:
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/documents.parquet')"
        ).fetchall()]
        sel = ", ".join(
            "doc_id + i * %d AS doc_id" % OFF if c == "doc_id"
            else "text || ' copy' || i AS text" if c == "text"
            else c for c in cols)
        con.execute(f"""
            COPY (
              SELECT {sel}
              FROM read_parquet('{src}/documents.parquet'),
                   (SELECT unnest(range({COPIES})) AS i)
              ORDER BY i, doc_id
            ) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
        con.execute(f"""
            COPY (
              SELECT vec_id + i * {OFF} AS vec_id,
                     * EXCLUDE (vec_id)
              FROM read_parquet('{src}/embeddings.parquet'),
                   (SELECT unnest(range({COPIES})) AS i)
              ORDER BY i, vec_id
            ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
    for t, key in [("orders", "o_orderkey"), ("lineitem", "l_orderkey")]:
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
        ).fetchall()]
        sel = ", ".join(
            f"{c} + i * {OFF} AS {c}" if c == key else c for c in cols)
        con.execute(f"""
            COPY (
              SELECT {sel}
              FROM read_parquet('{src}/{t}.parquet'),
                   (SELECT unnest(range({COPIES})) AS i)
              ORDER BY i, {key}
            ) TO '{out}/{t}.parquet' (FORMAT PARQUET)""")

    ev = pq.read_table(f"{src}/events.parquet")
    parts = []
    for i in range(COPIES):
        ids = pa.compute.add(ev.column("event_id"), i * OFF)
        parts.append(ev.set_column(
            ev.schema.get_field_index("event_id"), "event_id", ids))
    pq.write_table(pa.concat_tables(parts), f"{out}/events.parquet")
    print(f"wrote {out}: {COPIES} copies of facts, key offset {OFF}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--scale-docs"]
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    out = args[1] if len(args) > 1 else "/tmp/sf1"
    main(src, out, scale_docs="--scale-docs" in sys.argv[1:])
