package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.Tables
import graft.functions.Flatten
import graft.operators.{Cdc, Relational}

/** Reference-parity operators (SURVEY.md §2) as oracle-checked queries
  * over the driver's TPC-H-ish tables. Reference sites cited per query
  * (LAT:/SER: abbreviations as in SURVEY.md).
  */
object QueryHelpers {
  /** CDC fixture shared by the j2/j3 queries: `incoming` = full orders,
    * `snapshot` = orders minus every 3rd key, with the version column
    * shifted −10d (stale → update) except every 5th key +10d (fresher
    * → unchanged). Gives non-empty inserts/updates/unchanged splits.
    */
  def cdcIncoming(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate"),
      col("o_totalprice"), col("o_orderstatus"))

  def cdcSnapshot(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 5 === 0,
          col("o_orderdate") + expr("INTERVAL 10 DAYS"))
          .otherwise(col("o_orderdate") - expr("INTERVAL 10 DAYS"))
          .as("o_orderdate"))

  val cdcSnapshotSql: String =
    """(SELECT o_orderkey,
      |        CASE WHEN o_orderkey % 5 = 0 THEN o_orderdate + INTERVAL 10 DAY
      |             ELSE o_orderdate - INTERVAL 10 DAY END AS o_orderdate
      | FROM orders WHERE o_orderkey % 3 <> 0)""".stripMargin
}

object ParityQueries {
  import QueryHelpers._

  val qs: Seq[Q] = Seq(

    // P1 (LAT:51-66): wide fixed-list projection — prunes the parquet scan.
    Q("p1_projection",
      (s, d) => Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem ORDER BY ALL""".stripMargin)),

    // P2 (LAT:107-113, SER:164): projection with existence guard —
    // wanted ∩ present, drift-safe.
    Q("p2_projection_guard",
      (s, d) => Flatten.selectExisting(Tables.lineitem(s, d),
          Seq("l_orderkey", "l_linenumber", "no_such_column", "l_returnflag", "l_orderkey"))
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag"),
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag
             |FROM lineitem ORDER BY ALL""".stripMargin)),

    // P3 (SER:185-191): FULL fixed-list projection in canonical order
    // (the reference's 27/10-column shaping lists): every name
    // present, wanted order preserved, repeated name deduped (first
    // occurrence wins) — the driver-visible row for the shaping lists
    // that E2's shapeTasks/shapeElements exercise end-to-end.
    Q("p3_fixed_projection",
      (s, d) => Flatten.selectExisting(Tables.lineitem(s, d),
          Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_shipdate", "l_orderkey"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic
        // lineitem — sort on every output column so tie order can't
        // diverge between engines (first seen at the sf1 sweep scale)
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax",
          "l_returnflag", "l_shipdate"),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
             |  l_extendedprice, l_discount, l_tax, l_returnflag, l_shipdate
             |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |  l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag,
             |  l_shipdate""".stripMargin)),

    // P4+P5 (LAT:47,178; LAT:254-255): column drop incl. conditional
    // drop of a column that may not exist.
    Q("p4_drop_columns",
      (s, d) => Flatten.dropIfExists(Tables.orders(s, d),
          "o_orderpriority", "column_that_never_existed")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // P6 (LAT:253): drop all-null columns (data-dependent schema);
    // injected all-null column must vanish, populated ones stay.
    Q("p6_drop_allnull",
      (s, d) => Flatten.dropAllNullColumns(
          Tables.nation(s, d).withColumn("ghost", lit(null).cast(StringType)))
        .orderBy("n_nationkey"),
      Some("SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey")),

    // P7 (LAT:49): != literal tombstone filter.
    Q("p7_filter_neq",
      (s, d) => Tables.customer(s, d)
        .filter(col("c_custkey") =!= 42)
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
             |WHERE c_custkey <> 42 ORDER BY c_custkey""".stripMargin)),

    // P8+P9 (LAT:252, LAT:184): non-empty-string filter + null-key row drop.
    Q("p8_p9_filters",
      (s, d) => Relational.dropNullKeys(
          Tables.lineitem(s, d).filter(col("l_returnflag") =!= ""),
          Seq("l_orderkey", "l_partkey"))
        .select("l_orderkey", "l_linenumber", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag"),
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
             |WHERE l_returnflag <> '' AND l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
             |ORDER BY ALL""".stripMargin)),

    // P10 (SER:221): theta filter comparing two columns.
    Q("p10_filter_colcmp",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_discount") > col("l_tax"))
        .select("l_orderkey", "l_linenumber", "l_discount", "l_tax")
        .orderBy("l_orderkey", "l_linenumber", "l_discount", "l_tax"),
      Some("""SELECT l_orderkey, l_linenumber, l_discount, l_tax FROM lineitem
             |WHERE l_discount > l_tax ORDER BY ALL""".stripMargin)),

    // P12 (SER:159): positional slice of an array column (first 4).
    // Output is the slice joined to one string — the driver's pandas
    // compare cannot hash array cells (round-1 red row). Values are
    // rendered as floor(e*1e7) integers: float→double cast, one IEEE
    // multiply, and floor are all bit-identical across engines, so no
    // decimal-formatting rounding-mode hazard exists (round-2 red row
    // was DuckDB rejecting format()'s thousands separator).
    Q("p12_array_slice",
      (s, d) => Tables.embeddings(s, d)
        .select(col("vec_id"),
          concat_ws(",", transform(slice(col("embedding"), 1, 4),
            e => floor(e.cast(DoubleType) * 1e7).cast(StringType))).as("emb4"))
        .orderBy("vec_id"),
      Some("""SELECT vec_id,
             |  array_to_string(list_transform(embedding[1:4],
             |    e -> CAST(CAST(floor(CAST(e AS DOUBLE) * 10000000) AS BIGINT) AS VARCHAR)), ',') AS emb4
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // P14 (completeness; the inverse of F2's widen): posexplode an
    // array column to one row per element with its position — the
    // normalize-to-rows shape for nested arrays. Fan-out happens on
    // the projected (id, pos, element) triple only.
    Q("p14_explode_rows",
      (s, d) => Tables.embeddings(s, d)
        .select(col("vec_id"),
          posexplode(slice(col("embedding"), 1, 4)).as(Seq("pos", "e")))
        .select(col("vec_id"), col("pos").cast(LongType).as("pos"),
          floor(col("e").cast(DoubleType) * 1e7).cast(LongType).as("e_e7"))
        .orderBy("vec_id", "pos"),
      Some("""SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
             |  CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000000) AS BIGINT) AS e_e7
             |FROM embeddings, unnest(range(1, 5)) AS t(i)
             |ORDER BY vec_id, pos""".stripMargin)),

    // J1 (LAT:249): multi-key equi LEFT OUTER join; probe side keeps
    // its key pair, build side is a keyed aggregate (min = exact on
    // doubles). At scale both sides shuffle on the same 2-key hash.
    Q("j1_multikey_left_join",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val dims = li.groupBy("l_partkey", "l_suppkey")
          .agg(min("l_extendedprice").as("min_price"))
        li.select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
          .join(dims, Seq("l_partkey", "l_suppkey"), "left")
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "min_price")
          .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "min_price")
      },
      Some("""SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey, d.min_price
             |FROM lineitem l
             |LEFT JOIN (SELECT l_partkey, l_suppkey, min(l_extendedprice) AS min_price
             |           FROM lineitem GROUP BY 1, 2) d
             |  ON l.l_partkey = d.l_partkey AND l.l_suppkey = d.l_suppkey
             |ORDER BY ALL""".stripMargin)),

    // J2 (SER:215): CDC probe — left join snapshot with suffixed version col.
    Q("j2_cdc_probe",
      (s, d) => Cdc.probe(cdcIncoming(s, d), cdcSnapshot(s, d),
          "o_orderkey", "o_orderdate")
        .orderBy("o_orderkey"),
      Some(s"""SELECT i.o_orderkey, i.o_orderdate, i.o_totalprice, i.o_orderstatus,
              |       s.o_orderdate AS o_orderdate_existing
              |FROM orders i LEFT JOIN $cdcSnapshotSql s ON i.o_orderkey = s.o_orderkey
              |ORDER BY i.o_orderkey""".stripMargin)),

    // J3a (SER:218): CDC inserts — left anti join (keys absent from target).
    Q("j3_cdc_inserts",
      (s, d) => Cdc.mergeSplit(cdcIncoming(s, d), cdcSnapshot(s, d),
          "o_orderkey", "o_orderdate").inserts
        .orderBy("o_orderkey"),
      Some(s"""SELECT i.o_orderkey, i.o_orderdate, i.o_totalprice, i.o_orderstatus
              |FROM orders i WHERE NOT EXISTS
              |  (SELECT 1 FROM $cdcSnapshotSql s WHERE s.o_orderkey = i.o_orderkey)
              |ORDER BY i.o_orderkey""".stripMargin)),

    // J3b (SER:221): CDC updates — inner join + newer-version residual.
    Q("j3_cdc_updates",
      (s, d) => Cdc.mergeSplit(cdcIncoming(s, d), cdcSnapshot(s, d),
          "o_orderkey", "o_orderdate").updates
        .orderBy("o_orderkey"),
      Some(s"""SELECT i.o_orderkey, i.o_orderdate, i.o_totalprice, i.o_orderstatus
              |FROM orders i JOIN $cdcSnapshotSql s ON i.o_orderkey = s.o_orderkey
              |WHERE i.o_orderdate > s.o_orderdate
              |ORDER BY i.o_orderkey""".stripMargin)),

    // J3c: CDC unchanged — the third partition of the merge split.
    Q("j3_cdc_unchanged",
      (s, d) => Cdc.mergeSplit(cdcIncoming(s, d), cdcSnapshot(s, d),
          "o_orderkey", "o_orderdate").unchanged
        .orderBy("o_orderkey"),
      Some(s"""SELECT i.o_orderkey, i.o_orderdate, i.o_totalprice, i.o_orderstatus
              |FROM orders i JOIN $cdcSnapshotSql s ON i.o_orderkey = s.o_orderkey
              |WHERE i.o_orderdate <= s.o_orderdate
              |ORDER BY i.o_orderkey""".stripMargin)),

    // J7 (completeness): FULL OUTER CDC reconciliation — the audit
    // view of a merge: new / deleted / updated / unchanged per key,
    // both-sides-preserved. Incoming drops every 7th key so the
    // "deleted" arm is non-empty; the snapshot already misses every
    // 3rd ("new") and shifts versions ("updated"/"unchanged").
    Q("j7_full_outer_reconcile",
      (s, d) => {
        val inc = cdcIncoming(s, d)
          .filter(col("o_orderkey") % 7 =!= 0)
          .select(col("o_orderkey"), col("o_orderdate").as("v_incoming"))
        val snap = cdcSnapshot(s, d)
          .select(col("o_orderkey"), col("o_orderdate").as("v_existing"))
        inc.join(snap, Seq("o_orderkey"), "full_outer")
          .select(col("o_orderkey"), col("v_incoming"), col("v_existing"),
            when(col("v_incoming").isNull, "deleted")
              .when(col("v_existing").isNull, "new")
              .when(col("v_incoming") > col("v_existing"), "updated")
              .otherwise("unchanged").as("change_type"))
          .orderBy("o_orderkey")
      },
      Some(s"""SELECT o_orderkey, i.o_orderdate AS v_incoming, s.o_orderdate AS v_existing,
              |  CASE WHEN i.o_orderdate IS NULL THEN 'deleted'
              |       WHEN s.o_orderdate IS NULL THEN 'new'
              |       WHEN i.o_orderdate > s.o_orderdate THEN 'updated'
              |       ELSE 'unchanged' END AS change_type
              |FROM (SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderkey % 7 <> 0) i
              |FULL JOIN $cdcSnapshotSql s USING (o_orderkey)
              |ORDER BY o_orderkey""".stripMargin)),

    // J8 (completeness): LEFT SEMI join — existence filter without
    // row multiplication (the EXISTS shape; build side carries only
    // the join key, no payload ever moves).
    Q("j8_semi_join",
      (s, d) => Tables.orders(s, d)
        .join(Tables.lineitem(s, d)
            .filter(col("l_discount") > 0.05)
            .select(col("l_orderkey").as("o_orderkey")),
          Seq("o_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
             |ORDER BY o_orderkey""".stripMargin)),

    // J6 (scale extension): skew-salted join — same result as the
    // plain equi-join (the oracle IS the plain join), but the hot
    // keys spread across 8 reducers. The salt derives from the row's
    // own line number, so it is deterministic.
    Q("j6_salted_join",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_partkey")
        val dim = Tables.part(s, d).select("p_partkey", "p_brand")
          .withColumnRenamed("p_partkey", "l_partkey")
        graft.operators.Relational.saltedJoin(li, dim, Seq("l_partkey"),
            "left", nSalts = 8, saltFrom = col("l_linenumber"))
          .orderBy("l_orderkey", "l_linenumber", "l_partkey", "p_brand")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, p_brand
             |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
             |ORDER BY ALL""".stripMargin)),

    // J9 (scale extension): bucketized RANGE join — each high-value
    // shipment matched to every big order whose 7-day window contains
    // its ship timestamp, then a per-shipment activity count. Spark
    // would plan the bare BETWEEN predicate as BroadcastNestedLoop
    // (quadratic, broadcast-bound); the operator maps both sides to
    // week buckets (ranges exploded to each covered bucket) so the
    // join is a plain hash equi-join with a residual filter — the
    // shape that survives two non-broadcastable sides. The oracle
    // runs the naive BETWEEN join: result equality IS the check.
    Q("j9_range_join",
      (s, d) => {
        val li = Tables.lineitem(s, d).filter(col("l_quantity") === 50)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
        val o = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
          .select(col("o_orderkey"), col("o_orderdate"),
            (col("o_orderdate") + expr("INTERVAL 6 DAYS")).as("o_end"))
        graft.operators.Relational.rangeJoin(li, "l_shipdate", o,
            "o_orderdate", "o_end")
          .groupBy("l_orderkey", "l_linenumber", "l_shipdate")
          .agg(count(lit(1)).as("n_active"), min("o_orderkey").as("first_order"))
          .orderBy("l_orderkey", "l_linenumber", "l_shipdate")
      },
      Some("""SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate,
             |  count(*) AS n_active, min(o.o_orderkey) AS first_order
             |FROM lineitem l JOIN orders o
             |  ON l.l_shipdate >= o.o_orderdate
             | AND l.l_shipdate <= o.o_orderdate + INTERVAL 6 DAY
             |WHERE l.l_quantity = 50 AND o.o_totalprice > 400000
             |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // J12 (scale extension): interval-OVERLAP join — shipping windows
    // [shipdate, shipdate + quantity days] (1–50-day spans, so
    // intervals genuinely cover several week buckets) overlapping
    // order-activity windows [orderdate, orderdate + 7d], no key in
    // common: the range-RANGE sibling of j9. Both sides
    // bucket-explode, the join is a bucket equi-join, and the
    // first-common-bucket filter dedups pairs without a DISTINCT
    // shuffle. Oracle = the naive overlap theta join. Output ordered
    // by every column (duplicate lineitem rows make no shorter key
    // total).
    Q("j12_interval_overlap_join",
      (s, d) => {
        val li = Tables.lineitem(s, d).filter(col("l_partkey") < 10)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_shipdate"),
            expr("l_shipdate + make_interval(0, 0, 0, CAST(l_quantity AS INT), 0, 0, 0)")
              .as("l_shipend"))
        val o = Tables.orders(s, d).filter(col("o_custkey") < 5)
          .select(col("o_orderkey"), col("o_orderdate"),
            (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("o_end"))
        graft.operators.Relational.intervalOverlapJoin(
            li, "l_shipdate", "l_shipend", o, "o_orderdate", "o_end")
          .select("l_orderkey", "l_linenumber", "l_partkey", "o_orderkey")
          .orderBy("l_orderkey", "l_linenumber", "l_partkey", "o_orderkey")
      },
      Some("""WITH li AS (SELECT l_orderkey, l_linenumber, l_partkey, l_shipdate,
             |                  l_shipdate + INTERVAL (CAST(l_quantity AS INT)) DAY AS l_shipend
             |            FROM lineitem WHERE l_partkey < 10),
             |o AS (SELECT o_orderkey, o_orderdate,
             |        o_orderdate + INTERVAL 7 DAY AS o_end
             |      FROM orders WHERE o_custkey < 5)
             |SELECT l_orderkey, l_linenumber, l_partkey, o_orderkey
             |FROM li JOIN o
             |  ON l_shipdate <= o_end AND o_orderdate <= l_shipend
             |ORDER BY l_orderkey, l_linenumber, l_partkey, o_orderkey""".stripMargin)),

    // J5 (scale extension): as-of join — each click attributed to the
    // user's latest prior (or simultaneous) view. Composed as
    // union + running last() — one shuffle on the key; the oracle
    // mirrors the same relational algebra in window SQL.
    Q("j5_asof_join",
      (s, d) => {
        val e = Tables.events(s, d)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
        graft.operators.Relational.asofJoin(clicks, views,
            Seq("user_id"), "ts", "view_id")
          .select("click_id", "user_id", "view_id")
          .orderBy("click_id")
      },
      Some("""WITH u AS (
             |  SELECT user_id, ts, event_id AS click_id,
             |         CAST(NULL AS BIGINT) AS view_id, 1 AS side
             |  FROM events WHERE event_type = 'click'
             |  UNION ALL
             |  SELECT user_id, ts, NULL, event_id, 0
             |  FROM events WHERE event_type = 'view'),
             |w AS (
             |  SELECT user_id, click_id,
             |    last_value(view_id IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY ts, side, view_id
             |      ROWS UNBOUNDED PRECEDING) AS view_id
             |  FROM u)
             |SELECT click_id, user_id, view_id FROM w
             |WHERE click_id IS NOT NULL ORDER BY click_id""".stripMargin)),

    // J17 — as-of join WITH TOLERANCE (pandas merge_asof tolerance=):
    // j5's backward match, but a view more than 48 hours older than
    // the click is DROPPED rather than substituted by an even older
    // one — the attribution-window semantics ad pipelines actually
    // want (the bound sits near the data's median click→view gap, so
    // both arms are exercised: ~40% of matches drop). Same union + ONE window-pass plan as j5 (the matched
    // row's ts rides a second last() stacked on the same window); the
    // oracle carries the matched ts through the identical walk and
    // applies the bound independently.
    Q("j17_asof_tolerance",
      (s, d) => {
        val e = Tables.events(s, d)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
        graft.operators.Relational.asofJoin(clicks, views,
            Seq("user_id"), "ts", "view_id",
            toleranceMicros = Some(172800000000L))
          .select("click_id", "user_id", "view_id")
          .orderBy("click_id")
      },
      Some("""WITH u AS (
             |  SELECT user_id, ts, event_id AS click_id,
             |         CAST(NULL AS BIGINT) AS view_id,
             |         CAST(NULL AS TIMESTAMP) AS vts, 1 AS side
             |  FROM events WHERE event_type = 'click'
             |  UNION ALL
             |  SELECT user_id, ts, NULL, event_id, ts, 0
             |  FROM events WHERE event_type = 'view'),
             |w AS (
             |  SELECT user_id, ts, click_id,
             |    last_value(view_id IGNORE NULLS) OVER win AS view_id,
             |    last_value(vts IGNORE NULLS) OVER win AS vts
             |  FROM u
             |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, side, view_id
             |                 ROWS UNBOUNDED PRECEDING))
             |SELECT click_id, user_id,
             |  CASE WHEN date_diff('microsecond', vts, ts) <= 172800000000
             |       THEN view_id END AS view_id
             |FROM w WHERE click_id IS NOT NULL
             |ORDER BY click_id""".stripMargin)),

    // J13 (scale extension): NEAREST-event join — each click
    // attributed to the user's closest view in EITHER direction
    // (pandas merge_asof direction='nearest'), completing the as-of
    // family. One shuffle: backward last() + forward first() share
    // the same partitioning and sort, then a row-local argmin picks
    // the closer candidate (equal distance prefers backward; the
    // window orderings pin all in-arm ties). The oracle replays the
    // identical two-window algebra in SQL.
    Q("j13_nearest_event_join",
      (s, d) => {
        val e = Tables.events(s, d)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
        graft.operators.Relational.nearestJoin(clicks, views,
            Seq("user_id"), "ts", "view_id")
          .select("click_id", "user_id", "view_id")
          .orderBy("click_id")
      },
      Some("""WITH u AS (
             |  SELECT user_id, ts, event_id AS click_id,
             |         CAST(NULL AS BIGINT) AS view_id, 1 AS side
             |  FROM events WHERE event_type = 'click'
             |  UNION ALL
             |  SELECT user_id, ts, NULL, event_id, 0
             |  FROM events WHERE event_type = 'view'),
             |w AS (
             |  SELECT user_id, ts, click_id,
             |    last_value(CASE WHEN side = 0
             |        THEN {'ts': ts, 'v': view_id} END IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY ts, side, view_id
             |      ROWS UNBOUNDED PRECEDING) AS b,
             |    first_value(CASE WHEN side = 0
             |        THEN {'ts': ts, 'v': view_id} END IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY ts, side, view_id
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS f
             |  FROM u)
             |SELECT click_id, user_id,
             |  CASE WHEN b IS NULL THEN f.v
             |       WHEN f IS NULL THEN b.v
             |       WHEN ts - b.ts <= f.ts - ts THEN b.v
             |       ELSE f.v END AS view_id
             |FROM w WHERE click_id IS NOT NULL
             |ORDER BY click_id""".stripMargin)),

    // J14 — SCD Type-2 dimension build (extension): the events change
    // log becomes validity intervals per user — valid_from = the
    // change's ts, valid_to = the NEXT change's ts (null while
    // current). The full-history sibling of the reference's
    // latest-row-wins merge (SER:309-365); one shuffle on user_id,
    // lead + successor test in a single window pass. Interval bounds
    // surface as epoch MICROS so the compare is exact.
    Q("j14_scd2",
      (s, d) => {
        val e = Tables.events(s, d).select("user_id", "event_id", "ts", "value")
        graft.operators.Relational.scd2(e, keys = Seq("user_id"),
            tsCol = "ts", tieCol = "event_id")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("valid_from")).as("valid_from_us"),
            unix_micros(col("valid_to")).as("valid_to_us"),
            col("is_current"), col("value"))
          .orderBy("user_id", "valid_from_us", "event_id")
      },
      Some("""WITH v AS (
             |  SELECT user_id, event_id, value,
             |    epoch_us(ts) AS valid_from_us,
             |    epoch_us(lead(ts) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id)) AS valid_to_us
             |  FROM events)
             |SELECT user_id, event_id, valid_from_us, valid_to_us,
             |  valid_to_us IS NULL AS is_current, value
             |FROM v ORDER BY user_id, valid_from_us, event_id""".stripMargin)),

    // J15 — INCREMENTAL SCD2 maintenance: yesterday's dimension
    // (changes before Jan 21) folds in the newer changes WITHOUT
    // recomputing history — untouched keys pass through, touched
    // keys' history re-windows, per-batch work scales with the delta
    // (the d9/v13 incremental contract on the warehouse dim). The
    // oracle is the FULL one-shot rebuild over all changes: the fold
    // must equal it row-for-row — the equivalence the operator
    // guarantees, and exactly how j14's oracle checks the one-shot
    // path, so fold and build are held to the same answer.
    Q("j15_scd2_fold",
      (s, d) => {
        val e = Tables.events(s, d).select("user_id", "event_id", "ts", "value")
        val cutoff = lit("2024-01-21 00:00:00").cast("timestamp")
        val dim = graft.operators.Relational.scd2(
          e.filter(col("ts") < cutoff), keys = Seq("user_id"),
          tsCol = "ts", tieCol = "event_id")
        graft.operators.Relational.scd2Fold(dim,
            e.filter(col("ts") >= cutoff), keys = Seq("user_id"),
            tsCol = "ts", tieCol = "event_id")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("valid_from")).as("valid_from_us"),
            unix_micros(col("valid_to")).as("valid_to_us"),
            col("is_current"), col("value"))
          .orderBy("user_id", "valid_from_us", "event_id")
      },
      Some("""WITH v AS (
             |  SELECT user_id, event_id, value,
             |    epoch_us(ts) AS valid_from_us,
             |    epoch_us(lead(ts) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id)) AS valid_to_us
             |  FROM events)
             |SELECT user_id, event_id, valid_from_us, valid_to_us,
             |  valid_to_us IS NULL AS is_current, value
             |FROM v ORDER BY user_id, valid_from_us, event_id""".stripMargin)),

    // J16 — POINT-IN-TIME join (extension): each click looks up the
    // purchase-history version (the j14 SCD2 dim over purchases)
    // valid at its own timestamp — the fact-against-versioned-
    // dimension lookup that closes the SCD2 family (build j14 →
    // fold j15 → consume j16). The plan is the as-of union + ONE
    // running-window pass over one shuffle; the ORACLE is the naive
    // interval LEFT JOIN itself (valid_from <= ts < valid_to), a
    // genuinely independent algebra — the equivalence is the
    // operator's correctness law, not a replay.
    Q("j16_pit_join",
      (s, d) => {
        val e = Tables.events(s, d)
        val dim = graft.operators.Relational.scd2(
          e.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("ts"),
              col("event_id").as("version_id")),
          keys = Seq("user_id"), tsCol = "ts", tieCol = "version_id")
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
        graft.operators.Relational.pitJoin(clicks, dim,
            Seq("user_id"), "ts", "version_id")
          .select("click_id", "user_id", "version_id")
          .orderBy("click_id")
      },
      Some("""WITH dim AS (
             |  SELECT user_id, event_id AS version_id, ts AS valid_from,
             |    lead(ts) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
             |  FROM events WHERE event_type = 'purchase'),
             |f AS (
             |  SELECT event_id AS click_id, user_id, ts
             |  FROM events WHERE event_type = 'click')
             |SELECT f.click_id, f.user_id, d.version_id
             |FROM f LEFT JOIN dim d ON f.user_id = d.user_id
             |  AND d.valid_from <= f.ts
             |  AND (d.valid_to IS NULL OR f.ts < d.valid_to)
             |ORDER BY click_id""".stripMargin)),

    // A1 (LAT:241): n-ary UNION ALL aligned by name with null fill for
    // columns missing on one side (pandas concat semantics).
    Q("a1_union_by_name",
      (s, d) => {
        val o = Tables.orders(s, d)
        Relational.unionByName(Seq(
          o.filter(col("o_orderstatus") === "F").select("o_orderkey", "o_totalprice"),
          o.filter(col("o_orderstatus") === "O").select("o_orderkey", "o_orderpriority")))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
             |UNION ALL BY NAME
             |SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderstatus = 'O'
             |ORDER BY o_orderkey""".stripMargin)),

    // A2 (LAT:78): ordered scan + limit — planned as
    // TakeOrderedAndProject (per-partition top-k, no global sort).
    Q("a2_topk",
      (s, d) => Relational.topK(
          Tables.orders(s, d).select("o_orderkey", "o_orderdate", "o_totalprice"),
          25, col("o_orderdate").desc, col("o_orderkey").desc),
      Some("""SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
             |ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 25""".stripMargin)),

    // F5 (LAT:116): length-capped string with null→"" (URL cap 50;
    // null injected on every 7th key to exercise the null arm).
    Q("f5_length_cap",
      (s, d) => Tables.part(s, d)
        .withColumn("nm", when(col("p_partkey") % 7 === 0, lit(null))
          .otherwise(col("p_name")))
        .select(col("p_partkey"), Relational.lengthCap(col("nm"), 20).as("capped"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |  CASE WHEN nm IS NULL THEN '' WHEN length(nm) <= 20 THEN nm ELSE '' END AS capped
             |FROM (SELECT p_partkey,
             |        CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE p_name END AS nm
             |      FROM part) ORDER BY p_partkey""".stripMargin)),

    // F6 (SER:171): ISO-timestamp string → date via split on 'T'.
    Q("f6_split_date",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          split(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"), "T")(0).as("day"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
             |  split_part(strftime(ts, '%Y-%m-%dT%H:%M:%S'), 'T', 1) AS day
             |FROM events ORDER BY event_id""".stripMargin)),

    // F7 (LAT:200-201): surrogate key by string concat of key columns
    // (codegen'd concat replaces the reference's Python row loop).
    Q("f7_surrogate_key",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          Relational.surrogateKey(col("l_orderkey"), col("l_linenumber"),
            to_date(col("l_shipdate"))).as("sk"))
        .orderBy("l_orderkey", "l_linenumber", "sk"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(l_orderkey AS VARCHAR) || CAST(l_linenumber AS VARCHAR)
             |    || CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS sk
             |FROM lineitem ORDER BY ALL""".stripMargin)),

    // F3 (LAT:48): nested-struct flatten with `.`→`_` joined names —
    // one projection node, collapsed into the scan.
    Q("f3_flatten_names",
      (s, d) => graft.functions.Flatten.flatten(Tables.customer(s, d)
          .select(col("c_custkey"), struct(col("c_name").as("name"),
            struct(col("c_mktsegment").as("segment")).as("mkt")).as("info")))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name AS info_name, c_mktsegment AS info_mkt_segment
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // F4 (LAT:104,177,185; SER:130,173): bulk rename via explicit map.
    Q("f4_rename_map",
      (s, d) => Flatten.renameAll(Tables.orders(s, d)
          .select("o_orderkey", "o_totalprice", "o_orderdate"),
          Map("o_totalprice" -> "amount", "o_orderdate" -> "fecha"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_totalprice AS amount, o_orderdate AS fecha
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // F8 (LAT:149) + A3 (LAT:69,101): bounded key collect → CSV
    // request parameter, rendered as a one-row frame so the oracle
    // checks the exact string the fan-out would send.
    Q("f8_keys_csv",
      (s, d) => {
        val csv = graft.io.Sources.keysCsv(
          graft.io.Sources.collectKeys(Tables.nation(s, d), "n_nationkey"))
        s.range(1).select(lit(csv).as("keys_csv"))
      },
      Some("""SELECT string_agg(CAST(n_nationkey AS VARCHAR), ',' ORDER BY n_nationkey) AS keys_csv
             |FROM (SELECT DISTINCT n_nationkey FROM nation)""".stripMargin)),

    // F12 (SER:63): frame-wide fillna — numeric nulls → 0, string
    // nulls → "0" (pandas dtype behavior), one projection.
    Q("f12_fill_all",
      (s, d) => Relational.fillAll(Tables.orders(s, d)
          .select(col("o_orderkey"),
            when(col("o_orderkey") % 4 === 0, lit(null).cast(DoubleType))
              .otherwise(col("o_totalprice")).as("price"),
            when(col("o_orderkey") % 5 === 0, lit(null).cast(StringType))
              .otherwise(col("o_orderstatus")).as("status")))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_orderkey % 4 = 0 THEN 0.0 ELSE o_totalprice END AS price,
             |  CASE WHEN o_orderkey % 5 = 0 THEN '0' ELSE o_orderstatus END AS status
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // F15 (LAT:170-179): split a frame into two disjoint column sets;
    // the "rest" half (whatever the fixed list didn't claim, in frame
    // order) is the driver-visible row — the first half is P1's shape.
    Q("f15_split_columns",
      (s, d) => {
        val (_, rest) = Relational.splitColumns(
          Tables.customer(s, d).select("c_name", "c_acctbal", "c_custkey", "c_mktsegment"),
          Seq("c_name", "c_acctbal"))
        rest.orderBy("c_custkey")
      },
      Some("SELECT c_custkey, c_mktsegment FROM customer ORDER BY c_custkey")),

    // F9 (SER:141,193-202): parse ISO-8601 with zone offset, strip to
    // UTC-naive (session TZ = UTC).
    Q("f9_ts_parse",
      (s, d) => Tables.orders(s, d)
        .withColumn("iso",
          concat(date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss"), lit("-04:00")))
        .select(col("o_orderkey"),
          to_timestamp(col("iso"), "yyyy-MM-dd'T'HH:mm:ssxxx").as("parsed"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  CAST((strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') || '-04:00')::TIMESTAMPTZ
             |       AT TIME ZONE 'UTC' AS TIMESTAMP) AS parsed
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // F10+F11+F13 (LAT:256, LAT:176, SER:61-62): scalar scale, null
    // fill, widening int cast. (x/100 on the same double is bit-exact
    // IEEE754 on both engines; no order-dependent reduction here.)
    Q("f10_f11_f13_scalars",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") / 100).as("scaled"),
          coalesce(col("l_discount"), lit(0.0)).as("disc_filled"),
          col("l_linenumber").cast(LongType).as("ln_big"))
        .orderBy("l_orderkey", "l_linenumber", "scaled", "disc_filled"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  l_extendedprice / 100 AS scaled,
             |  coalesce(l_discount, 0.0) AS disc_filled,
             |  CAST(l_linenumber AS BIGINT) AS ln_big
             |FROM lineitem ORDER BY l_orderkey, l_linenumber, scaled, disc_filled""".stripMargin)),

    // F14 (LAT:145-147,204-206): date-window filter, anchor−25d …
    // anchor+2d (anchor fixed for determinism; reference uses today).
    Q("f14_date_window",
      (s, d) => {
        val anchor = to_date(lit("2000-06-01"))
        Tables.orders(s, d)
          .filter(col("o_orderdate") >= date_sub(anchor, 25) &&
                  col("o_orderdate") <= date_add(anchor, 2))
          .select("o_orderkey", "o_orderdate")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderdate FROM orders
             |WHERE o_orderdate >= DATE '2000-06-01' - 25
             |  AND o_orderdate <= DATE '2000-06-01' + 2
             |ORDER BY o_orderkey""".stripMargin)),

    // F1 (LAT:45, SER:106): JSON payload → typed columns.
    Q("f1_json_extract",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k
             |FROM events ORDER BY event_id""".stripMargin)),

    // F16 (schema-drift extension of F1): drift-tolerant JSON parse —
    // malformed payloads (every 10th row corrupted here) yield null
    // instead of failing the scan, the posture an ingest pipeline
    // needs when upstream JSON goes bad mid-feed.
    Q("f16_json_drift",
      (s, d) => Tables.events(s, d)
        .withColumn("payload",
          when(col("event_id") % 10 === 0, concat(lit("x"), col("props")))
            .otherwise(col("props")))
        .select(col("event_id"),
          from_json(col("payload"), StructType(Seq(StructField("k", LongType))))
            .getField("k").as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
             |  CASE WHEN json_valid(payload)
             |       THEN CAST(payload->>'$.k' AS BIGINT) END AS k
             |FROM (SELECT event_id,
             |        CASE WHEN event_id % 10 = 0 THEN 'x' || props ELSE props END AS payload
             |      FROM events)
             |ORDER BY event_id""".stripMargin)),

    // F2 (SER:154-175): widen array to first-N scalar columns;
    // out-of-range index → null on both engines (64-dim vectors ⇒
    // non-null here; the <N case is unit-tested on fixtures).
    Q("f2_widen_array",
      (s, d) => Tables.embeddings(s, d)
        .select(col("vec_id"),
          col("embedding")(0).as("e1"), col("embedding")(1).as("e2"),
          col("embedding")(2).as("e3"), col("embedding")(3).as("e4"))
        .orderBy("vec_id"),
      Some("""SELECT vec_id, embedding[1] AS e1, embedding[2] AS e2,
             |       embedding[3] AS e3, embedding[4] AS e4
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // K6 (scale extension) — Z-ORDER clustered layout: orders
    // rewritten clustered on the (o_custkey, o_orderdate) bit-
    // interleaved curve, then scanned with a 2-D box predicate. The
    // layout changes where rows land, never what a query returns —
    // so the oracle is the same box filter over the UNCLUSTERED
    // table (result equality IS the correctness contract), and the
    // skipping power (per-file min/max spreads shrink on BOTH
    // dimensions) is asserted in LayoutSpec. At 100 TB this is how a
    // multi-dimension-selective scan reads tiles instead of the
    // whole table.
    Q("k6_zorder_scan",
      (s, d) => {
        val path = graft.engine.TempArtifacts.getOrBuild(s"$d#zorder", "graft_zorder") { p =>
          graft.io.Layout.zorderWrite(Tables.orders(s, d),
            Seq("o_custkey", "o_orderdate"), p, nFiles = 16)
        }
        s.read.parquet(path)
          .filter(col("o_custkey").between(100, 500) &&
            col("o_orderdate") >= lit("1995-01-01") &&
            col("o_orderdate") < lit("1996-01-01"))
          .select("o_orderkey", "o_custkey", "o_orderdate")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderdate
             |FROM orders
             |WHERE o_custkey BETWEEN 100 AND 500
             |  AND o_orderdate >= TIMESTAMP '1995-01-01'
             |  AND o_orderdate < TIMESTAMP '1996-01-01'
             |ORDER BY o_orderkey""".stripMargin)),

    // J10 (scale extension): Bloom-pruned semi join — the runtime-
    // filter pattern as an explicit operator. A bounded sketch of the
    // qualifying orders' keys broadcasts to the lineitem scan and
    // drops non-matching rows BEFORE the exchange; the final semi
    // join removes the sketch's false positives, so the result is
    // exactly the plain EXISTS (the oracle). At 100 TB: shuffle the
    // matching ~2 % of the fact table, not all of it.
    Q("j10_bloom_semi_join",
      (s, d) => {
        val bigOrders = Tables.orders(s, d)
          .filter(col("o_totalprice") > 470000)
        Relational.bloomPrunedSemiJoin(
            Tables.lineitem(s, d)
              .select("l_orderkey", "l_linenumber", "l_quantity"),
            "l_orderkey", bigOrders, "o_orderkey",
            expectedItems = 100000L)
          .groupBy("l_orderkey")
          .agg(count(lit(1)).as("n_lines"), sum("l_quantity").as("sum_qty"))
          .orderBy("l_orderkey")
      },
      Some("""SELECT l_orderkey, count(*) AS n_lines, sum(l_quantity) AS sum_qty
             |FROM lineitem
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_orderkey = l_orderkey
             |                AND o_totalprice > 470000)
             |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)),

    // K7 (scale extension): bucketed co-located join — both sides are
    // written hash-bucketed on the join key (the shuffle paid once,
    // at write time), so the recurring join + same-key aggregation
    // runs with zero exchanges (plan shape pinned in BucketingSpec).
    // Result equality against the plain-parquet join IS the oracle.
    Q("k7_bucketed_join",
      (s, d) => {
        val tag = java.lang.Integer.toHexString(d.hashCode)
        val lt = graft.io.Layout.bucketedTable(
          Tables.lineitem(s, d).select("l_orderkey", "l_quantity"),
          s"graft_bkt_${tag}_lineitem", nBuckets = 8, key = "l_orderkey")
        val ot = graft.io.Layout.bucketedTable(
          Tables.orders(s, d).select("o_orderkey", "o_totalprice"),
          s"graft_bkt_${tag}_orders", nBuckets = 8, key = "o_orderkey")
        s.table(lt)
          .join(s.table(ot).withColumnRenamed("o_orderkey", "l_orderkey"),
            Seq("l_orderkey"))
          .filter(col("o_totalprice") > 400000)
          .groupBy("l_orderkey")
          .agg(count(lit(1)).as("n_lines"), sum("l_quantity").as("sum_qty"))
          .orderBy("l_orderkey")
      },
      Some("""SELECT l_orderkey, count(*) AS n_lines, sum(l_quantity) AS sum_qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_totalprice > 400000
             |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)),

    // K8 (scale extension): hive-partitioned layout — the third leg
    // of the layout family (k6 z-order tiles, k7 hash buckets, k8
    // date directories). The event stream is written partitioned by
    // day, so a day-selective read plans file splits for that one
    // directory via STATIC partition pruning — at 100 TB a daily
    // incremental job reads 1/30th of the month, not the month
    // (pruning itself is asserted in PartitionPruningSpec; the oracle
    // pins that relocating rows never changes results).
    Q("k8_partitioned_scan",
      (s, d) => {
        val path = graft.engine.TempArtifacts.getOrBuild(s"$d#dtpart", "graft_dtpart") { p =>
          Tables.events(s, d).withColumn("dt", to_date(col("ts")))
            .write.mode("overwrite").partitionBy("dt").parquet(p)
        }
        s.read.parquet(path)
          .filter(col("dt") === lit("2024-01-05"))
          .select("event_id", "user_id", "event_type")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, event_type FROM events
             |WHERE CAST(ts AS DATE) = DATE '2024-01-05'
             |ORDER BY event_id""".stripMargin)),

    // J11 (completeness): NULL-SAFE equi join (`<=>` / IS NOT
    // DISTINCT FROM) — the join where NULL keys MATCH each other
    // instead of dropping, the semantics a dimension keyed by an
    // optional attribute needs. Nulls are derived deterministically
    // (clerk bucket 0 → NULL) so both engines join the identical
    // relation; Catalyst plans <=> as an ordinary hash join on the
    // null-wrapped key, not a nested loop.
    Q("j11_nullsafe_join",
      (s, d) => {
        val bucket = when(col("o_custkey") % 7 === 0, lit(null))
          .otherwise(col("o_custkey") % 7)
        val left = Tables.orders(s, d)
          .select(col("o_orderkey"), bucket.as("bkt"))
        val dim = Tables.orders(s, d)
          .select(bucket.as("bkt")).distinct()
          .withColumn("bkt_name",
            coalesce(col("bkt").cast(StringType), lit("none")))
        left.join(dim, left("bkt") <=> dim("bkt"))
          .select(col("o_orderkey"), col("bkt_name"))
          .orderBy("o_orderkey")
      },
      Some("""WITH b AS (SELECT o_orderkey,
             |  CASE WHEN o_custkey % 7 = 0 THEN NULL ELSE o_custkey % 7 END AS bkt
             |  FROM orders),
             |dim AS (SELECT DISTINCT bkt,
             |          coalesce(CAST(bkt AS VARCHAR), 'none') AS bkt_name
             |        FROM b)
             |SELECT o_orderkey, bkt_name
             |FROM b JOIN dim ON b.bkt IS NOT DISTINCT FROM dim.bkt
             |ORDER BY o_orderkey""".stripMargin))
  )
}
