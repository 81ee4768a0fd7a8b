package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.Tables

/** Aggregation / window surface (SURVEY.md §2.5 extension; the
  * reference has no group-by at all, but BASELINE's north star and the
  * brief require a general analytics surface).
  *
  * Determinism rules (Registry contract): double SUMs only over
  * integral-valued columns (l_quantity ∈ 1..50 — exact in any
  * accumulation order); true decimals are summed after a
  * DECIMAL(18,x) cast (exact, order-independent) and the final value
  * is cast back to DOUBLE so both engines emit the same type. Every
  * window ordering carries a unique tiebreak key.
  *
  * Scale notes: g1/g4/g5/g6 are hash aggregates with map-side partial
  * aggregation — one shuffle of the (tiny) partial-state, never of raw
  * rows. The window queries partition by a key (no global window), so
  * they shuffle once on the partition key and sort within partitions —
  * the plan a 1000-executor cluster wants.
  */
object AggQueries {

  private def sumDec(c: org.apache.spark.sql.Column, scale: Int = 2) =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Order CO-OCCURRENCE artifact shared by g31 (triangles) and g33
    * (item-item similarity) — both consume the same per-order
    * distinct-part structure, and rebuilding it per query was the two
    * worst rows of the r12 bench (~12 % of the whole suite). Built
    * once per (sfDir, JVM) via [[TempArtifacts]], the d8/v12 memoized
    * pattern: ONE order-keyed shuffle produces the sorted part sets,
    * then two map-only explodes write
    *
    *  - `deg`  — (p, d): #orders containing part p (set semantics),
    *  - `co`   — (a, b, c): canonical a < b part pairs with their
    *             co-order count (per-order fan-out is order-size²,
    *             bounded by order width, never parts²),
    *
    * as parquet. g31 reads `co`'s pair list (already distinct — its
    * canonicalizing DISTINCT then dedups nothing); g33 reads both and
    * scores Jaccard off the counts. Registry order makes g31 pay the
    * build; g33 (and any future co-occurrence op) reads steady-state.
    */
  /** Plan-audit access to the artifact path ([[graft.PlanDump]]). */
  private[graft] def coPurchasePath(s: org.apache.spark.sql.SparkSession,
      d: String): String = coPurchase(s, d)

  private def coPurchase(s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.engine.TempArtifacts.getOrBuild(s"$d#copurchase", "graft_copurchase") { p =>
      val sets = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .groupBy("o").agg(sort_array(collect_set(col("p"))).as("ps"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sets.select(explode(col("ps")).as("p"))
        .groupBy("p").agg(count(lit(1)).as("d"))
        .write.mode("overwrite").parquet(s"$p/deg")
      sets.select(explode(expr(
          "flatten(transform(ps, (x, i) -> " +
            "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS a, y AS b))))"))
          .as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("c"))
        .write.mode("overwrite").parquet(s"$p/co")
      sets.unpersist(): Unit
    }

  /** sql7's bounded-recursion depth. Semantic, not tuning: chains
    * longer than the cap TRUNCATE at this depth (each recursion level
    * is a full Spark job, so the cap also bounds the fixpoint's round
    * count — raising it buys depth at one job per level). Rendered
    * into BOTH engines' SQL by [[recursiveChainSql]] so the plan and
    * the oracle cannot disagree.
    */
  val Sql7RecursionCap: Int = 10

  /** The `nxt` anchor of the sql7 recursion over `table`: per-customer
    * order ranks, capped at `cap`. Shared fragment — [[recursiveChainSql]]
    * embeds it as a CTE (both engines' one-string form, used by the
    * DuckDB oracle and Sql7RecursionCapSpec), and the graded Spark
    * query pre-materializes EXACTLY this SELECT before recursing (see
    * [[recursiveChainOverNxt]]) — one builder, so anchor and oracle
    * can never drift.
    */
  def sql7NxtSql(table: String, cap: Int): String = {
    require(cap >= 1, s"recursion cap must be >= 1, got $cap")
    s"""SELECT * FROM (
       |    SELECT o_custkey, o_orderkey,
       |      row_number() OVER (PARTITION BY o_custkey
       |        ORDER BY o_orderdate, o_orderkey) AS rn
       |    FROM $table WHERE o_custkey < 100)
       |  WHERE rn <= $cap""".stripMargin
  }

  /** The recursion itself, over an existing `nxt`-shaped relation
    * (columns o_custkey, o_orderkey, rn). Spark inlines CTE
    * definitions (WITH is purely syntactic in 4.x), so when `nxt` is
    * a CTE the anchor's scan + rank window RE-EXECUTES on every
    * recursion level — `cap` redundant scans per query. The graded
    * query therefore materializes the (tiny, ≤ 100 customers × cap
    * rows) anchor once and recurses over the materialized relation;
    * the recursion it executes is THIS string, rendered from the same
    * builder family as the oracle's (r20 optimization, guide §1.2/§3.3
    * — materialize an intermediate to stop re-execution).
    */
  def recursiveChainOverNxt(nxtRel: String): String =
    s"""WITH RECURSIVE chain AS (
       |  SELECT o_custkey, o_orderkey, rn, 1 AS depth
       |  FROM $nxtRel WHERE rn = 1
       |  UNION ALL
       |  SELECT n.o_custkey, n.o_orderkey, n.rn, c.depth + 1
       |  FROM chain c JOIN $nxtRel n
       |    ON n.o_custkey = c.o_custkey AND n.rn = c.rn + 1)
       |SELECT o_custkey, o_orderkey, depth FROM chain
       |ORDER BY o_custkey, depth""".stripMargin

  /** The full one-string form — anchor CTE + recursion — per customer,
    * orders walked as a linked chain from the first order (rank 1) to
    * at most rank `cap`, depth pinned equal to the rank it chains
    * over. One string serves Spark (Sql7RecursionCapSpec) and the
    * DuckDB oracle; identical dialect-neutral SQL is the decisive
    * argument for the cap living here and not inline.
    */
  def recursiveChainSql(table: String, cap: Int): String =
    s"""WITH RECURSIVE nxt AS (
       |  ${sql7NxtSql(table, cap)}),
       |chain AS (
       |  SELECT o_custkey, o_orderkey, rn, 1 AS depth
       |  FROM nxt WHERE rn = 1
       |  UNION ALL
       |  SELECT n.o_custkey, n.o_orderkey, n.rn, c.depth + 1
       |  FROM chain c JOIN nxt n
       |    ON n.o_custkey = c.o_custkey AND n.rn = c.rn + 1)
       |SELECT o_custkey, o_orderkey, depth FROM chain
       |ORDER BY o_custkey, depth""".stripMargin

  /** g29 AND st18 oracle — the batch funnel and the streaming CEP
    * funnel must agree row-for-row (the v4/v8 pattern: two execution
    * paths, one contract), so there is exactly ONE SQL definition.
    */
  private[queries] val funnelOracle: String =
    """WITH v AS (
      |  SELECT user_id, ts AS v_ts, event_id AS view_id FROM (
      |    SELECT user_id, ts, event_id,
      |      row_number() OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id) AS rn
      |    FROM events WHERE event_type = 'view') WHERE rn = 1),
      |c AS (
      |  SELECT user_id, ts AS c_ts, event_id AS click_id FROM (
      |    SELECT e.user_id, e.ts, e.event_id,
      |      row_number() OVER (PARTITION BY e.user_id
      |        ORDER BY e.ts, e.event_id) AS rn
      |    FROM events e JOIN v USING (user_id)
      |    WHERE e.event_type = 'click' AND e.ts >= v.v_ts
      |      AND e.ts <= v.v_ts + INTERVAL 1 HOUR) WHERE rn = 1),
      |p AS (
      |  SELECT user_id, event_id AS purchase_id FROM (
      |    SELECT e.user_id, e.event_id,
      |      row_number() OVER (PARTITION BY e.user_id
      |        ORDER BY e.ts, e.event_id) AS rn
      |    FROM events e JOIN c USING (user_id)
      |    WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
      |      AND e.ts <= c.c_ts + INTERVAL 1 HOUR) WHERE rn = 1),
      |u AS (SELECT DISTINCT user_id FROM events)
      |SELECT u.user_id, v.view_id, c.click_id, p.purchase_id,
      |  CASE WHEN v.view_id IS NULL THEN 0
      |       ELSE 1 + CAST(c.click_id IS NOT NULL AS INT)
      |              + CAST(p.purchase_id IS NOT NULL AS INT) END
      |    AS funnel_depth
      |FROM u LEFT JOIN v USING (user_id)
      |       LEFT JOIN c USING (user_id)
      |       LEFT JOIN p USING (user_id)
      |ORDER BY user_id""".stripMargin

  val qs: Seq[Q] = Seq(

    // G1 — TPC-H Q1-style pricing rollup over lineitem.
    Q("g1_tpch_q1",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sumDec(col("l_extendedprice")).as("sum_base_price"),
          sumDec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("sum_disc_price"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  sum(l_quantity) AS sum_qty,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
             |  sum(l_quantity) / count(*) AS avg_qty,
             |  count(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // G2 — ranking window functions over a keyed partition.
    Q("g2_window_rank",
      (s, d) => {
        val w = Window.partitionBy("o_orderstatus")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
            row_number().over(w).as("rn"),
            rank().over(w).as("rnk"))
          .orderBy("o_orderstatus", "rn")
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice,
             |  row_number() OVER w AS rn, rank() OVER w AS rnk
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
             |ORDER BY o_orderstatus, rn""".stripMargin)),

    // G3 — grouped top-k (top-3 orders per customer): the scalable
    // per-group limit — rank inside the partition, filter, never a
    // driver-side loop over groups.
    Q("g3_grouped_topk",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 3)
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT * FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders)
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    // G4 — ROLLUP grouping sets (subtotals + grand total). Grouping
    // nulls are folded to '(all)' (base values are non-null) so the
    // two engines' NULL-ordering defaults cannot diverge.
    Q("g4_rollup",
      (s, d) => Tables.orders(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"), sumDec(col("o_totalprice")).as("revenue"))
        .select(
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("cnt"), col("revenue"))
        .orderBy("status", "priority"),
      Some("""SELECT coalesce(o_orderstatus, '(all)') AS status,
             |  coalesce(o_orderpriority, '(all)') AS priority,
             |  count(*) AS cnt,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
             |ORDER BY status, priority""".stripMargin)),

    // G5 — exact distinct count per group (expand-then-aggregate in
    // Spark; one extra shuffle, still no driver involvement).
    Q("g5_count_distinct",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust,
             |  count(*) AS n_orders
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // G6 — aggregate + HAVING residual (filter on the aggregated
    // value, pushed after the partial/final agg).
    Q("g6_having",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_partkey")
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 120)
        .orderBy("l_partkey"),
      Some("""SELECT l_partkey, sum(l_quantity) AS sum_qty
             |FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 120
             |ORDER BY 1""".stripMargin)),

    // G7 — sliding-frame window aggregate (3-row moving revenue per
    // customer; unique (o_orderdate, o_orderkey) ordering keeps the
    // frame contents engine-independent).
    Q("g7_window_movsum",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(-2, Window.currentRow)
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
              .cast(DoubleType).as("mov3"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
             |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov3
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // G9 — TPC-H Q3-style shipping-priority query: 3-way join with
    // selective filters on both fact and dim sides, grouped revenue,
    // top-10. Catalyst pushes the filters below the joins and
    // broadcasts the pruned customer side; revenue sums are exact
    // decimals. The final top-k is TakeOrderedAndProject, not a
    // global sort.
    Q("g9_tpch_q3",
      (s, d) => {
        val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(s, d).filter(col("o_orderdate") < lit("1998-03-15"))
        val l = Tables.lineitem(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(sumDec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey, o_orderdate,
             |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15'
             |GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    // G10 — TPC-H Q5-style local-supplier volume: 6-table star join
    // (customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈ nation ⋈ region)
    // with the same-nation residual; the three smallest dims are
    // broadcast, the fact shuffles once.
    Q("g10_tpch_q5",
      (s, d) => {
        val c = Tables.customer(s, d); val o = Tables.orders(s, d)
        val l = Tables.lineitem(s, d); val su = Tables.supplier(s, d)
        val n = Tables.nation(s, d);   val r = Tables.region(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .join(su, l("l_suppkey") === su("s_suppkey") &&
            su("s_nationkey") === c("c_nationkey"))
          .join(n, c("c_nationkey") === n("n_nationkey"))
          .join(r, n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(sumDec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("revenue"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name,
             |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // G13 — exact percentiles (median + p90) per group: both engines
    // sort within the group and linearly interpolate order statistics
    // over the same doubles, so the result is deterministic.
    Q("g13_percentiles",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(expr("percentile(o_totalprice, 0.5)").as("p50"),
          expr("percentile(o_totalprice, 0.9)").as("p90"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, quantile_cont(o_totalprice, 0.5) AS p50,
             |  quantile_cont(o_totalprice, 0.9) AS p90, count(*) AS n
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // G14 — deterministic arg-max per group: the orderkey of the
    // highest-priced order, ties broken inside the struct ordering
    // (both engines compare structs field-by-field).
    Q("g14_argmax",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(max(struct(col("o_totalprice").as("p"), col("o_orderkey").as("k")))
          .as("m"))
        .select(col("o_orderstatus"), col("m.k").as("top_orderkey"),
          col("m.p").as("top_price"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
             |  (max({'p': o_totalprice, 'k': o_orderkey})).k AS top_orderkey,
             |  (max({'p': o_totalprice, 'k': o_orderkey})).p AS top_price
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // G11 — CUBE grouping sets (every subtotal combination).
    Q("g11_cube",
      (s, d) => Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"), sumDec(col("o_totalprice")).as("revenue"))
        .select(
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("cnt"), col("revenue"))
        .orderBy("status", "priority"),
      Some("""SELECT coalesce(o_orderstatus, '(all)') AS status,
             |  coalesce(o_orderpriority, '(all)') AS priority,
             |  count(*) AS cnt,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY status, priority""".stripMargin)),

    // G12 — pivot: order counts per priority, statuses widened to
    // columns (conditional aggregation under the hood — one pass).
    Q("g12_pivot",
      (s, d) => {
        val p = Tables.orders(s, d)
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
        p.select(col("o_orderpriority"),
            coalesce(col("F"), lit(0L)).as("F"),
            coalesce(col("O"), lit(0L)).as("O"),
            coalesce(col("P"), lit(0L)).as("P"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
             |  count(*) FILTER (o_orderstatus = 'F') AS "F",
             |  count(*) FILTER (o_orderstatus = 'O') AS "O",
             |  count(*) FILTER (o_orderstatus = 'P') AS "P"
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // G8 — lag + date arithmetic: days since the customer's previous
    // order (null for the first).
    Q("g8_lag_gap",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            datediff(to_date(col("o_orderdate")),
              to_date(lag(col("o_orderdate"), 1).over(w))).as("gap_days"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(date_diff('day',
             |    CAST(lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderdate, o_orderkey) AS DATE),
             |    CAST(o_orderdate AS DATE)) AS INTEGER) AS gap_days
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // G15 — ntile + percent_rank: decile and exact rank position of
    // each order by price within its priority class (the remaining
    // ranking-family window shapes g2 doesn't cover).
    Q("g15_ntile",
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority"),
            ntile(10).over(w).as("decile"),
            floor(percent_rank().over(w) * 1e6).cast(LongType).as("prank_e6"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderpriority,
             |  CAST(ntile(10) OVER w AS INTEGER) AS decile,
             |  CAST(floor(percent_rank() OVER w * 1000000) AS BIGINT) AS prank_e6
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderpriority
             |             ORDER BY o_totalprice, o_orderkey)
             |ORDER BY o_orderkey""".stripMargin)),

    // G16 — conditional aggregation (FILTER-clause shape): per-segment
    // counts/sums restricted by predicates inside one aggregation pass
    // (no self-joins, no second scan).
    Q("g16_filtered_agg",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_all"),
          count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
          sum(when(col("o_totalprice") > 100000,
            floor(col("o_totalprice") * 100 + 0.5).cast(LongType))
            .otherwise(0L)).as("big_cents"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(*) AS n_all,
             |  count(*) FILTER (o_orderstatus = 'F') AS n_f,
             |  CAST(sum(CASE WHEN o_totalprice > 100000
             |                THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             |                ELSE 0 END) AS BIGINT) AS big_cents
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // G17 — KMV distinct-count sketch: a MERGEABLE bounded bottom-k
    // aggregator (operators.Sketches) — the deterministic alternative
    // to approx_count_distinct's HLL++, which no oracle can replay.
    // The oracle reproduces the sketch with a window rank over the
    // identical md5-prefix hashes and the identical floor estimate;
    // exact counts ride along to show the error in-data.
    Q("g17_kmv_distinct",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          graft.operators.Sketches.kmvDistinct(
            graft.functions.TextFns.hash60Col(col("l_partkey").cast(StringType)),
            k = 64).as("est_distinct"),
          countDistinct(col("l_partkey")).as("exact_distinct"))
        .orderBy("l_returnflag"),
      Some("""WITH h AS (
             |  SELECT DISTINCT l_returnflag,
             |    CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
             |  FROM lineitem),
             |rk AS (SELECT l_returnflag, hv,
             |         row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn
             |       FROM h),
             |k AS (SELECT l_returnflag, count(*) AS nk, max(hv) AS hk
             |      FROM rk WHERE rn <= 64 GROUP BY 1),
             |x AS (SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_distinct
             |      FROM lineitem GROUP BY 1)
             |SELECT k.l_returnflag,
             |  CASE WHEN nk < 64 THEN nk
             |       ELSE CAST(floor(63.0 * 1152921504606846976 / hk) AS BIGINT) END AS est_distinct,
             |  CAST(x.exact_distinct AS BIGINT) AS exact_distinct
             |FROM k JOIN x USING (l_returnflag)
             |ORDER BY l_returnflag""".stripMargin)),

    // G18 — sketch ROLLUP across aggregation levels: per-day KMV
    // states (bounded k-long arrays) merge up to per-month distinct-
    // customer estimates WITHOUT rescanning orders — the lattice-
    // materialization pattern that makes sketches worth their bytes
    // at 100 TB (daily cube persists; every coarser cube derives from
    // sketch merges, shuffling k longs per group instead of fact
    // rows). Sound by the KMV mergeability law: the k smallest hashes
    // of a union are a subset of each day's k smallest — so the
    // oracle can compute month-level bottom-k directly and must match
    // the merged estimate cell-for-cell. Exact counts ride along as
    // the accuracy reference.
    Q("g18_kmv_rollup",
      (s, d) => {
        val k = 64
        val sk = graft.operators.Sketches
        val day = Tables.orders(s, d)
          .select(date_trunc("month", col("o_orderdate")).cast("date").as("month"),
            to_date(col("o_orderdate")).as("day"),
            graft.functions.TextFns.hash60Col(col("o_custkey").cast(StringType)).as("h"))
          .groupBy("month", "day")
          .agg(sk.kmvState(col("h"), k).as("day_state"))
        val month = day.groupBy("month")
          .agg(sk.kmvMergeStates(col("day_state"), k).as("m_state"))
          .select(col("month"), sk.kmvEstimate(col("m_state"), k).as("est_distinct"))
        val exact = Tables.orders(s, d)
          .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
          .agg(countDistinct(col("o_custkey")).as("exact_distinct"))
        month.join(exact, "month").orderBy("month")
      },
      Some("""WITH h AS (
             |  SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             |    CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
             |  FROM orders),
             |rk AS (SELECT month, hv,
             |         row_number() OVER (PARTITION BY month ORDER BY hv) AS rn
             |       FROM h),
             |k AS (SELECT month, count(*) AS nk, max(hv) AS hk
             |      FROM rk WHERE rn <= 64 GROUP BY 1),
             |x AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             |        count(DISTINCT o_custkey) AS exact_distinct
             |      FROM orders GROUP BY 1)
             |SELECT k.month,
             |  CASE WHEN nk < 64 THEN nk
             |       ELSE CAST(floor(63.0 * 1152921504606846976 / hk) AS BIGINT) END AS est_distinct,
             |  CAST(x.exact_distinct AS BIGINT) AS exact_distinct
             |FROM k JOIN x USING (month)
             |ORDER BY month""".stripMargin)),

    // G19 — one-pass table PROFILE: per-column row/non-null counts,
    // KMV distinct estimate, and min/max — the data-quality snapshot
    // an ingest pipeline logs per batch. ONE scan with bounded state:
    // the distinct sketches make the multi-column distinct profile a
    // single pass (exact multi-column countDistinct would EXPAND the
    // scan ×columns), and nulls map to a sentinel hash so they count
    // as one distinct value deterministically on both engines. Wide
    // aggregate → melt via explode, so the output is (col_name, ...)
    // rows regardless of how many columns the profile covers.
    Q("g19_profile",
      (s, d) => {
        val k = 64
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate")
        val sentinel = lit("\u0001null\u0001")
        val aggs = cols.flatMap { c => Seq(
          count(col(c)).as(s"${c}__nn"),
          graft.operators.Sketches.kmvDistinct(
            graft.functions.TextFns.hash60Col(
              coalesce(col(c).cast(StringType), sentinel)), k).as(s"${c}__nd"),
          min(col(c)).cast(StringType).as(s"${c}__min"),
          max(col(c)).cast(StringType).as(s"${c}__max"))
        }
        val row = Tables.orders(s, d)
          .agg(count(lit(1)).as("n_rows"), aggs: _*)
        row.select(explode(array(cols.map(c => struct(
            lit(c).as("col_name"), col("n_rows"),
            col(s"${c}__nn").as("n_nonnull"), col(s"${c}__nd").as("n_distinct_est"),
            col(s"${c}__min").as("min_str"), col(s"${c}__max").as("max_str"))): _*))
            .as("p"))
          .select("p.*")
          .orderBy("col_name")
      },
      {
        def arm(c: String) =
          s"""SELECT '$c' AS col_name, count(*) AS n_rows, count($c) AS n_nonnull,
             |  (WITH h AS (SELECT DISTINCT
             |       CAST(('0x' || substr(md5(coalesce(CAST($c AS VARCHAR), chr(1)||'null'||chr(1))), 1, 15)) AS BIGINT) AS hv
             |     FROM orders),
             |   rk AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM h),
             |   kk AS (SELECT count(*) AS nk, max(hv) AS hk FROM rk WHERE rn <= 64)
             |   SELECT CASE WHEN nk < 64 THEN nk
             |          ELSE CAST(floor(63.0 * 1152921504606846976 / hk) AS BIGINT) END
             |   FROM kk) AS n_distinct_est,
             |  CAST(min($c) AS VARCHAR) AS min_str,
             |  CAST(max($c) AS VARCHAR) AS max_str
             |FROM orders""".stripMargin
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate")
        Some(cols.map(arm).mkString("", "\nUNION ALL\n", "\nORDER BY col_name"))
      }),

    // SQL1 — the SQL FRONT-END path: TPC-H Q6 written as a plain
    // `spark.sql` string over a registered view (same Catalyst plan
    // as the DataFrame API — filters still push to parquet). Revenue
    // is accumulated in integer cent×cent units so the aggregate is
    // order-independent and bit-exact against the oracle.
    Q("sql1_tpch_q6",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem_sql")
        s.sql("""SELECT count(*) AS n_rows,
                |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                |           * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT)
                |    AS revenue_c2
                |FROM lineitem_sql
                |WHERE l_shipdate >= TIMESTAMP'2000-01-01 00:00:00'
                |  AND l_shipdate < TIMESTAMP'2001-01-01 00:00:00'
                |  AND l_discount BETWEEN 0.05 AND 0.07
                |  AND l_quantity < 24""".stripMargin)
      },
      Some("""SELECT count(*) AS n_rows,
             |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             |           * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT)
             |    AS revenue_c2
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '2001-01-01 00:00:00'
             |  AND l_discount BETWEEN 0.05 AND 0.07
             |  AND l_quantity < 24""".stripMargin)),

    // G20 — batch sessionization of the event stream: a new session
    // starts after a >30-minute silence. Two stacked windows over ONE
    // partitioning (lag to flag session starts, running sum to number
    // them) — a single shuffle on user_id serves both, then the
    // per-session rollup reuses the same partitioning. Both engines
    // compute the gap on floor-epoch-seconds so the threshold
    // comparison is bit-identical; ties order by (ts, event_id).
    Q("g20_sessionize",
      (s, d) => {
        graft.operators.Relational.sessionize(
            Tables.events(s, d).select("user_id", "event_id", "ts"),
            key = "user_id", tsCol = "ts", tieCol = "event_id",
            gapSeconds = 1800L)
          .groupBy("user_id", "sess_idx")
          .agg(count(lit(1)).as("n_events"),
            min(col("es")).as("sess_start_s"),
            (max(col("es")) - min(col("es"))).as("duration_s"))
          .orderBy("user_id", "sess_idx")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, ts,
             |         CAST(floor(epoch(ts)) AS BIGINT) AS es
             |  FROM events),
             |g AS (
             |  SELECT user_id, event_id, ts, es,
             |    CASE WHEN lag(es) OVER w IS NULL
             |           OR es - lag(es) OVER w > 1800
             |         THEN 1 ELSE 0 END AS new_sess
             |  FROM e
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |x AS (
             |  SELECT user_id, es,
             |    CAST(sum(new_sess) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_idx
             |  FROM g)
             |SELECT user_id, sess_idx, count(*) AS n_events,
             |  min(es) AS sess_start_s,
             |  max(es) - min(es) AS duration_s
             |FROM x GROUP BY user_id, sess_idx
             |ORDER BY user_id, sess_idx""".stripMargin)),

    // SQL3 — TPC-H Q4 shape (EXISTS decorrelation) through the plain
    // SQL front-end: Catalyst rewrites the correlated EXISTS into a
    // left semi join (no row multiplication, build side carries only
    // the key) — the subquery family sql1/sql2 don't cover.
    Q("sql3_exists_subquery",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_sql")
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem_sql")
        s.sql("""SELECT o_orderpriority, count(*) AS order_count
                |FROM orders_sql
                |WHERE o_orderdate >= TIMESTAMP'1995-06-01 00:00:00'
                |  AND o_orderdate < TIMESTAMP'1995-09-01 00:00:00'
                |  AND EXISTS (SELECT 1 FROM lineitem_sql
                |              WHERE l_orderkey = o_orderkey
                |                AND l_returnflag = 'R')
                |GROUP BY o_orderpriority
                |ORDER BY o_orderpriority""".stripMargin)
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1995-06-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1995-09-01 00:00:00'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey
             |                AND l_returnflag = 'R')
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // G21 — explicit GROUPING SETS: two independent one-column
    // rollups plus the grand total in ONE pass over the fact table
    // (g4's ROLLUP and g11's CUBE cover the lattice shapes; this is
    // the hand-picked-sets shape). The grouping-id bitmask is
    // computed explicitly from grouping() flags in both engines so
    // the bit order cannot diverge; ordering pins NULLS FIRST, where
    // the engines' defaults differ.
    Q("g21_grouping_sets",
      (s, d) => Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(
          (grouping(col("l_returnflag")) * 2 +
            grouping(col("l_linestatus"))).cast(LongType).as("gid"),
          sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
        .select("gid", "l_returnflag", "l_linestatus", "sum_qty", "n")
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
      Some("""SELECT CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
             |         AS BIGINT) AS gid,
             |  l_returnflag, l_linestatus,
             |  sum(l_quantity) AS sum_qty, count(*) AS n
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
             |ORDER BY gid, l_returnflag ASC NULLS FIRST,
             |  l_linestatus ASC NULLS FIRST""".stripMargin)),

    // G22 — time-RANGE window frame: each order's trailing-30-day
    // order count and spend for its customer — the "activity in the
    // last N days as of each row" shape g7's ROWS frame can't express
    // (a rows frame counts rows, not time). The frame bound is epoch
    // seconds on both engines, so tie handling (RANGE includes ALL
    // peers of the current value) is bit-identical. One shuffle on
    // the customer key; the frame scan is a single ordered pass per
    // partition.
    Q("g22_range_frame",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("es"))
          .rangeBetween(-30L * 86400, 0)
        Tables.orders(s, d)
          .withColumn("es", unix_timestamp(col("o_orderdate")))
          .select(col("o_custkey"), col("o_orderkey"),
            count(lit(1)).over(w).as("n_30d"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
              .cast(DoubleType).as("spend_30d"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  count(*) OVER w AS n_30d,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
             |       AS DOUBLE) AS spend_30d
             |FROM (SELECT *, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS es
             |      FROM orders)
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY es
             |             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // A4 — set operations: customers active in 1995 but not 1996
    // (EXCEPT) and in both years (INTERSECT), tagged in one result.
    // Both ops carry SET semantics (distinct), which Spark plans as
    // hash aggregates over a single shuffle per side — the shape that
    // distributes; the tag column disambiguates the union so one
    // oracle covers both operators.
    Q("a4_except_intersect",
      (s, d) => {
        def custsIn(year: Int) = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit(s"$year-01-01") &&
            col("o_orderdate") < lit(s"${year + 1}-01-01"))
          .select("o_custkey")
        val only95 = custsIn(1995).except(custsIn(1996))
          .select(lit("only_1995").as("tag"), col("o_custkey"))
        val both = custsIn(1995).intersect(custsIn(1996))
          .select(lit("both").as("tag"), col("o_custkey"))
        only95.unionByName(both).orderBy("tag", "o_custkey")
      },
      Some("""WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
             |            WHERE o_orderdate >= TIMESTAMP '1995-01-01'
             |              AND o_orderdate < TIMESTAMP '1996-01-01'),
             |y96 AS (SELECT DISTINCT o_custkey FROM orders
             |        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |          AND o_orderdate < TIMESTAMP '1997-01-01')
             |SELECT 'only_1995' AS tag, o_custkey FROM (
             |  SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
             |UNION ALL
             |SELECT 'both' AS tag, o_custkey FROM (
             |  SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
             |ORDER BY tag, o_custkey""".stripMargin)),

    // G23 — UNPIVOT (melt): the inverse of g12's pivot. A wide
    // per-flag aggregate turns into long (flag, metric, value) rows —
    // the normalization step feeding generic metric stores. Spark's
    // native `unpivot` keeps the plan columnar (no explode of
    // hand-built structs); values are integer cents so the melted
    // DOUBLE column is exact in both engines. The oracle mirrors via
    // UNION ALL, the portable spelling of unpivot.
    Q("g23_unpivot",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          // integer-cent sum (order-independent), rendered DOUBLE so
          // both melted metrics share one exact value type
          sum(floor(col("l_extendedprice") * 100 + 0.5).cast(LongType))
            .cast(DoubleType).as("sum_price_c2"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price_c2")), "metric", "value")
        .orderBy("l_returnflag", "metric"),
      Some("""WITH w AS (SELECT l_returnflag,
             |  sum(l_quantity) AS sum_qty,
             |  CAST(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
             |       AS BIGINT) AS DOUBLE) AS sum_price_c2
             |FROM lineitem GROUP BY 1)
             |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
             |UNION ALL
             |SELECT l_returnflag, 'sum_price_c2', sum_price_c2 FROM w
             |ORDER BY l_returnflag, metric""".stripMargin)),

    // SQL4 — named WINDOW clause through the SQL front-end: one
    // window definition shared by three functions (rank, running
    // count, partition max) — the parser/analyzer surface sql1–sql3
    // don't touch. Catalyst folds all three into ONE Window operator
    // over one shuffle (same plan the DataFrame API gets).
    Q("sql4_window_sql",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_sql")
        s.sql("""SELECT o_custkey, o_orderkey,
                |  rank() OVER w AS rk,
                |  count(*) OVER w AS n_so_far,
                |  max(o_totalprice) OVER (PARTITION BY o_custkey) AS max_price
                |FROM orders_sql
                |WINDOW w AS (PARTITION BY o_custkey
                |             ORDER BY o_orderdate, o_orderkey)
                |ORDER BY o_custkey, o_orderkey""".stripMargin)
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  rank() OVER w AS rk,
             |  count(*) OVER w AS n_so_far,
             |  max(o_totalprice) OVER (PARTITION BY o_custkey) AS max_price
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey
             |             ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // SQL6 — correlated LATERAL subquery with per-row ORDER BY +
    // LIMIT: each customer's top-2 orders by price — per-group top-k
    // (g3's semantics) written as the SQL-standard lateral derived
    // table. Catalyst decorrelates the limited-and-ordered inner query
    // into a rank-window over one shuffle rather than a per-row
    // re-scan, the same plan family the DataFrame window gets. Price
    // exported as exact cents (floor arithmetic) and the tie order
    // pinned by (price DESC, orderkey), so the row set is total.
    Q("sql6_lateral_topk",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("customer_sql")
        Tables.orders(s, d).createOrReplaceTempView("orders_sql")
        s.sql("""SELECT c_custkey, o_orderkey, price_cents
                |FROM customer_sql c,
                |  LATERAL (SELECT o_orderkey,
                |             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                |               AS price_cents
                |           FROM orders_sql
                |           WHERE o_custkey = c.c_custkey
                |           ORDER BY o_totalprice DESC, o_orderkey
                |           LIMIT 2) t
                |WHERE c_custkey < 200
                |ORDER BY c_custkey, o_orderkey""".stripMargin)
      },
      Some("""SELECT c_custkey, o_orderkey, price_cents
             |FROM customer c,
             |  LATERAL (SELECT o_orderkey,
             |             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             |               AS price_cents
             |           FROM orders
             |           WHERE o_custkey = c.c_custkey
             |           ORDER BY o_totalprice DESC, o_orderkey
             |           LIMIT 2) t
             |WHERE c_custkey < 200
             |ORDER BY c_custkey, o_orderkey""".stripMargin)),

    // SQL5 — correlated SCALAR subquery through the SQL front-end:
    // each high-value order's line count and peak line price as
    // per-row subqueries. Catalyst decorrelates both into ONE
    // aggregate-then-left-join (visible in the plan as a single
    // Aggregate + Join, not a per-row loop) — the remaining
    // decorrelation family after sql3's EXISTS.
    Q("sql5_scalar_subquery",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_sql")
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem_sql")
        s.sql("""SELECT o_orderkey,
                |  (SELECT count(*) FROM lineitem_sql
                |   WHERE l_orderkey = o_orderkey) AS n_lines,
                |  (SELECT max(l_extendedprice) FROM lineitem_sql
                |   WHERE l_orderkey = o_orderkey) AS max_line_price
                |FROM orders_sql
                |WHERE o_totalprice > 450000
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey,
             |  (SELECT count(*) FROM lineitem
             |   WHERE l_orderkey = o_orderkey) AS n_lines,
             |  (SELECT max(l_extendedprice) FROM lineitem
             |   WHERE l_orderkey = o_orderkey) AS max_line_price
             |FROM orders
             |WHERE o_totalprice > 450000
             |ORDER BY o_orderkey""".stripMargin)),

    // G24 — mergeable QUANTILE sketch: per-group median estimated
    // from a deterministic hash-bottom-k sample. The sample IS the
    // bounded k-heap aggregate (k smallest md5-derived keys — an
    // associative, partition-independent uniform sample, the quantile
    // sibling of g17's KMV distinct sketch: same bottom-k-by-hash
    // state, different extractor); the estimate is the exact median
    // of that sample, so unlike t-digest/GK the result is a pure
    // function of the row SET and replays cell-for-cell in SQL.
    // Shuffle carries ≤ partitions×groups×k rows, never the table.
    // 48-bit hash keys stay exact through the heap's double scores.
    Q("g24_sample_quantile",
      (s, d) => {
        val cents = floor(col("o_totalprice") * 100 + 0.5).cast(LongType)
        val h48 = conv(substring(md5(col("o_orderkey").cast(StringType)), 1, 12),
          16, 10).cast(LongType)
        val base = Tables.orders(s, d).select(
          col("o_orderpriority").as("grp"), col("o_orderkey").as("cand_id"),
          cents.as("cents"), (-h48.cast(DoubleType)).as("score"))
        val sample = graft.operators.TopK.perGroup(
            base.select("grp", "cand_id", "score"), "grp", "cand_id", "score", 64)
          .join(base.select(col("cand_id"), col("cents")), "cand_id")
        val wv = Window.partitionBy("grp").orderBy(col("cents"), col("cand_id"))
        val wn = Window.partitionBy("grp")
        sample
          .withColumn("vrn", row_number().over(wv))
          .withColumn("n", count(lit(1)).over(wn))
          .filter(col("vrn") === floor((col("n") + 1) / 2).cast(IntegerType))
          .select(col("grp"), col("n").as("sample_n"),
            col("cents").as("est_median_cents"))
          .orderBy("grp")
      },
      Some("""WITH hh AS (
             |  SELECT o_orderpriority AS grp, o_orderkey,
             |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             |    CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12)) AS BIGINT) AS hv
             |  FROM orders),
             |smp AS (SELECT grp, o_orderkey, cents FROM (
             |    SELECT grp, o_orderkey, cents,
             |      row_number() OVER (PARTITION BY grp ORDER BY hv, o_orderkey) AS srn
             |    FROM hh) WHERE srn <= 64),
             |r AS (SELECT grp, cents,
             |        row_number() OVER (PARTITION BY grp
             |          ORDER BY cents, o_orderkey) AS vrn,
             |        count(*) OVER (PARTITION BY grp) AS n
             |      FROM smp)
             |SELECT grp, CAST(n AS BIGINT) AS sample_n,
             |  cents AS est_median_cents
             |FROM r WHERE vrn = (n + 1) // 2 ORDER BY grp""".stripMargin)),

    // SQL7 — RECURSIVE CTE through the SQL front-end (Spark 4's
    // WITH RECURSIVE): each customer's orders walked as a linked
    // chain from their first order, depth accumulated per recursion
    // step — the iterative-closure SQL family (org charts, BOM
    // explosions, graph reachability) that until Spark 4 required
    // driver-side loops. The engine iterates the recursive arm to a
    // fixpoint (bounded here by the longest per-customer chain), and
    // the oracle runs the IDENTICAL recursion in DuckDB. depth is
    // pinned equal to the rank it chains over, so correctness of the
    // recursion is cell-checkable, not just row-countable. The walk
    // is capped at depth [[Sql7RecursionCap]] — the bounded-recursion
    // guard every production recursive query carries (Spark's own
    // engine cap is spark.sql.cteRecursionLevelLimit), and each level
    // is a full Spark job, so the cap also bounds the fixpoint's round
    // count. The cap is a SEMANTIC parameter: rows past it truncate
    // (pinned by Sql7RecursionCapSpec), and the ONE builder below
    // renders both engines' SQL so the cap can never drift between
    // plan and oracle.
    Q("sql7_recursive_chain",
      (s, d) => {
        // Spark inlines CTEs, so `nxt` as a CTE re-executes its
        // orders scan + rank window at EVERY recursion level (cap
        // redundant scans per query — measured ~40% of sql7's cost).
        // Materialize the bounded anchor (≤ 100 customers × cap rows)
        // once, then run the UNCHANGED recursion over it; both
        // fragments render from the same builder family as the
        // oracle's one-string form, so plan and oracle cannot drift.
        // The checkpointed anchor stays pinned until the returned
        // plan is consumed and GC'd (ContextCleaner) — the recursion
        // reads it lazily, so an eager release here would tear the
        // blocks out from under the caller's action; the frame is
        // ≤ 100 customers × cap rows, so the retention is noise
        // (ADVICE r20). Probe r21: sql7's 58 jobs/709 tasks are
        // UnionLoop per-level machinery (anchor partitioning — even
        // coalesce(1) — does not change either count), so the level
        // cap, a semantic parameter, is the only remaining lever.
        Tables.orders(s, d).createOrReplaceTempView("orders_sql")
        s.sql(sql7NxtSql("orders_sql", Sql7RecursionCap))
          .localCheckpoint()
          .createOrReplaceTempView("sql7_nxt")
        s.sql(recursiveChainOverNxt("sql7_nxt"))
      },
      Some(recursiveChainSql("orders", Sql7RecursionCap))),

    // G25 — last-observation-carried-forward: per customer, the most
    // recent URGENT order price carried forward across subsequent
    // orders via `last(..., ignoreNulls)` over a running ROWS frame —
    // the IGNORE NULLS window family (gap-filling / sparse-sensor
    // forward-fill) the plain frames g7/g22 don't exercise. One
    // shuffle on the partition key; rows before the first urgent
    // order stay NULL on both engines.
    Q("g25_locf",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, d)
          .withColumn("urgent_cents", when(col("o_orderpriority") === "1-URGENT",
            floor(col("o_totalprice") * 100 + 0.5).cast(LongType)))
          .withColumn("locf_cents",
            last(col("urgent_cents"), ignoreNulls = true).over(w))
          .select("o_custkey", "o_orderkey", "urgent_cents", "locf_cents")
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, urgent_cents,
             |  last_value(urgent_cents IGNORE NULLS) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_cents
             |FROM (SELECT o_custkey, o_orderkey, o_orderdate,
             |        CASE WHEN o_orderpriority = '1-URGENT'
             |             THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             |        END AS urgent_cents
             |      FROM orders)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // SQL8 — GROUP BY ALL / ORDER BY ALL sugar through the SQL
    // front-end: every non-aggregate select item becomes a grouping
    // key and the output orders by all columns — the modern
    // exploratory-SQL shorthand both engines resolve identically
    // (Spark 3.4+/DuckDB). Ordering by all columns is also exactly
    // the totality contract the oracle hash needs.
    Q("sql8_group_by_all",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_sql")
        s.sql("""SELECT o_orderstatus, o_orderpriority,
                |  count(*) AS n, min(o_orderkey) AS first_key
                |FROM orders_sql
                |GROUP BY ALL ORDER BY ALL""".stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  count(*) AS n, min(o_orderkey) AS first_key
             |FROM orders
             |GROUP BY ALL ORDER BY ALL""".stripMargin)),

    // SQL9 — PIVOT through the SQL front-end: the SQL-standard
    // syntax for g12's DataFrame pivot (wide per-returnflag line
    // counts per line status). Catalyst rewrites the PIVOT clause into
    // the same single-pass conditional aggregate the g12 plan uses —
    // one shuffle, never one scan per pivot column; the oracle
    // spells that rewrite out as FILTER aggregates, so the clause's
    // semantics (not just its sugar) are what's checked. Explicit IN
    // list, as at scale an inferred pivot domain is itself a full
    // scan.
    Q("sql9_pivot",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem_sql")
        s.sql("""SELECT * FROM (
                |  SELECT l_linestatus, l_returnflag FROM lineitem_sql)
                |PIVOT (count(*) AS n FOR l_returnflag IN ('A', 'N', 'R'))
                |ORDER BY l_linestatus""".stripMargin)
          .select(col("l_linestatus"), col("A").as("n_a"),
            col("N").as("n_n"), col("R").as("n_r"))
      },
      Some("""SELECT l_linestatus,
             |  count(*) FILTER (l_returnflag = 'A') AS n_a,
             |  count(*) FILTER (l_returnflag = 'N') AS n_n,
             |  count(*) FILTER (l_returnflag = 'R') AS n_r
             |FROM lineitem GROUP BY 1 ORDER BY l_linestatus""".stripMargin)),

    // G28 — per-group MODE (most frequent value): the most common
    // order priority per status via count-then-struct-argmax — two
    // partial-aggregated shuffles, never a sort of raw rows. Tie
    // contract: the LARGEST priority string wins (max over
    // (cnt, value) structs), mirrored exactly by the oracle's
    // (cnt DESC, value DESC) rank — deterministic where SQL `mode()`
    // leaves ties unspecified.
    Q("g28_mode",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("o_orderstatus")
        .agg(max(struct(col("cnt"), col("o_orderpriority"))).as("m"))
        .select(col("o_orderstatus"), col("m.o_orderpriority").as("mode_priority"),
          col("m.cnt").as("mode_n"))
        .orderBy("o_orderstatus"),
      Some("""WITH c AS (SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
             |          FROM orders GROUP BY 1, 2),
             |r AS (SELECT o_orderstatus, o_orderpriority, cnt,
             |        row_number() OVER (PARTITION BY o_orderstatus
             |          ORDER BY cnt DESC, o_orderpriority DESC) AS rn
             |      FROM c)
             |SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt AS mode_n
             |FROM r WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin)),

    // G27 — DATE-SPINE gap fill: a contiguous calendar generated from
    // the data's own [min, max] date bounds (`sequence` exploded from
    // a one-row aggregate — no driver loop, no static literal), left-
    // joined to the daily rollup with zero-fill — the shape every
    // time-series report needs so days with no orders appear as 0
    // instead of vanishing. The spine is tiny (one row per day) and
    // broadcast against the aggregated side; the raw table is touched
    // exactly once, by the rollup.
    Q("g27_date_spine",
      (s, d) => {
        val o = Tables.orders(s, d)
        val spine = o
          .agg(min(to_date(col("o_orderdate"))).as("d0"),
            max(to_date(col("o_orderdate"))).as("d1"))
          .select(explode(sequence(col("d0"), col("d1"),
            expr("interval 1 day"))).as("day"))
        val daily = o.groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(count(lit(1)).as("n_orders"))
        spine.join(daily, Seq("day"), "left")
          .select(col("day"), coalesce(col("n_orders"), lit(0L)).as("n_orders"))
          .orderBy("day")
      },
      Some("""WITH b AS (SELECT min(CAST(o_orderdate AS DATE)) AS d0,
             |                  max(CAST(o_orderdate AS DATE)) AS d1 FROM orders),
             |spine AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
             |          FROM b),
             |daily AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders
             |          FROM orders GROUP BY 1)
             |SELECT spine.day, coalesce(daily.n_orders, 0) AS n_orders
             |FROM spine LEFT JOIN daily USING (day)
             |ORDER BY day""".stripMargin)),

    // G29 — conversion FUNNEL: per user, first view → first click
    // within 1 h of it → first purchase within 1 h of that — the
    // ordered-sequence match (MATCH_RECOGNIZE's common case) no
    // plain join or sessionization expresses. Three STACKED windows
    // over ONE user shuffle (the g20 pattern): each stage is a
    // conditional struct-min whose predicate reads the previous
    // stage's window result on the same row, so the chain walks
    // forward without re-scanning events per stage; the final
    // per-user collapse reuses the window partitioning — a per-row
    // self-join per stage (the naive shape) would shuffle events
    // three times and explode on hot users. Ties broken by
    // (ts, event_id) everywhere; oracle walks the same chain with
    // rank-1 CTEs — an independent algebra for the same contract.
    Q("g29_funnel",
      (s, d) => {
        val wu = Window.partitionBy("user_id")
        def firstOf(cond: org.apache.spark.sql.Column) =
          min(when(cond, struct(col("ts"), col("event_id")))).over(wu)
        Tables.events(s, d)
          .select("user_id", "event_type", "ts", "event_id")
          .withColumn("v", firstOf(col("event_type") === "view"))
          .withColumn("c", firstOf(col("event_type") === "click" &&
            col("ts") >= col("v.ts") &&
            col("ts") <= col("v.ts") + expr("INTERVAL 1 HOUR")))
          .withColumn("p", firstOf(col("event_type") === "purchase" &&
            col("ts") >= col("c.ts") &&
            col("ts") <= col("c.ts") + expr("INTERVAL 1 HOUR")))
          .groupBy("user_id")
          .agg(min(col("v.event_id")).as("view_id"),
            min(col("c.event_id")).as("click_id"),
            min(col("p.event_id")).as("purchase_id"))
          .withColumn("funnel_depth",
            when(col("view_id").isNull, lit(0))
              .otherwise(lit(1) +
                when(col("click_id").isNull, 0).otherwise(1) +
                when(col("purchase_id").isNull, 0).otherwise(1)))
          .orderBy("user_id")
      },
      Some(funnelOracle)),

    // G30 — iterative graph CENTRALITY (PageRank, 3 unrolled rounds)
    // over the bipartite customer–part purchase graph: which parts /
    // customers sit at the center of the co-purchase structure — the
    // Pregel-per-superstep shape (join scores to edges, aggregate
    // contributions by destination) that d8's connected components
    // share, expressed as plain joins + aggs so Catalyst plans every
    // round. EXACT integral arithmetic end to end: scores in e6
    // units, per-edge contribution = score div out-degree, damping
    // as ·850000 div 1e6 — integer sums are accumulation-order-free,
    // so the result replays cell-for-cell where float PageRank never
    // could. Edges + degrees are pinned once (every round reads the
    // same materialized frame); per-round cost is one bounded
    // score-broadcast join + one contribution shuffle — at web scale
    // the score frame IS the corpus, the join flips to sort-merge on
    // the shared edge partitioning, same rounds, same algebra.
    Q("g30_pagerank",
      (s, d) => {
        val li = Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
        val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
        // integer node keys through every superstep (2k = customer,
        // 2k+1 = part — disjoint longs): the per-round shuffles carry
        // 8-byte keys, not strings; the readable (type, id) pair is a
        // map-only decode in the FINAL projection only
        val e0 = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).as("cn"),
            (col("l_partkey") * 2 + 1).as("pn"))
          .distinct()
        // both directions ride ONE explode — a union here would run
        // the join+distinct subtree twice when the persist inside
        // pageRank materializes
        val edges = e0.select(explode(array(
            struct(col("cn").as("src"), col("pn").as("dst")),
            struct(col("pn").as("src"), col("cn").as("dst")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
        val iters = sys.env.get("SPARK_GRAFT_G30_ITERS").map(_.toInt).getOrElse(3)
        graft.operators.Graph.pageRank(edges, iters).select(
            when(col("node") % 2 === 0, lit("c")).otherwise(lit("p"))
              .as("node_type"),
            call_function("div", col("node"), lit(2L)).as("node_id"),
            col("score"))
          .orderBy("node_type", "node_id")
      },
      {
        def iter(prev: String, cur: String) =
          s"""$cur AS (
             |  SELECT e.dst AS node,
             |    CAST(150000 + (sum(s.score // d.deg) * 850000) // 1000000
             |         AS BIGINT) AS score
             |  FROM edges e JOIN $prev s ON e.src = s.node
             |       JOIN deg d ON e.src = d.src
             |  GROUP BY 1)"""
        Some(s"""WITH e0 AS (
             |  SELECT DISTINCT o_custkey * 2 AS cn, l_partkey * 2 + 1 AS pn
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |edges AS (SELECT cn AS src, pn AS dst FROM e0
             |          UNION ALL SELECT pn, cn FROM e0),
             |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
             |s0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS score
             |       FROM deg),
             |${iter("s0", "s1")},
             |${iter("s1", "s2")},
             |${iter("s2", "s3")}
             |SELECT CASE WHEN node % 2 = 0 THEN 'c' ELSE 'p' END AS node_type,
             |  node // 2 AS node_id, score
             |FROM s3 ORDER BY node_type, node_id""".stripMargin)
      }),

    // G31 — per-node TRIANGLE counts over the part co-purchase graph
    // (parts sharing an order are adjacent): the clustering-cohesion
    // primitive. Degree-ordered orientation counts each triangle once
    // at its lowest-(deg,id) corner and bounds the wedge join's
    // per-key fan-out at O(√m) — hub parts close wedges instead of
    // centering them, the property that survives a skewed 100 TB
    // co-occurrence graph. The oracle enumerates the same triangles
    // by the simpler id-ordering (orientation changes WHERE a
    // triangle is counted, never WHETHER).
    Q("g31_triangles",
      (s, d) => {
        // the edge list is the shared co-occurrence artifact's pair
        // frame (one order-keyed shuffle, paid once for g31 AND g33);
        // triangleCounts sizes its own broadcast-vs-shuffle choice
        // from the measured edge count.
        // assumeCanonical: the artifact rows are a groupBy(a, b) over
        // strictly ordered a < b pairs — distinct and canonical by
        // construction — so the operator skips its canonicalization
        // distinct (r21). The r20 concern that this distinct's
        // exchange was load-bearing for probe parallelism (the
        // artifact reads as ~2 scan partitions) is superseded: the
        // operator now establishes the probe layout with its own
        // src-keyed repartition of the oriented edges, which the
        // adjacency aggregate also rides.
        val pairs = s.read.parquet(s"${coPurchase(s, d)}/co")
          .select(col("a"), col("b"))
        graft.operators.Graph.triangleCounts(pairs, assumeCanonical = true)
          .orderBy("node")
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
             |  FROM lineitem x JOIN lineitem y
             |    ON x.l_orderkey = y.l_orderkey
             |   AND x.l_partkey < y.l_partkey),
             |tri AS (
             |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
             |  FROM e e1
             |  JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
             |  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b)
             |SELECT node, count(*) AS n_triangles FROM (
             |  SELECT x AS node FROM tri
             |  UNION ALL SELECT y FROM tri
             |  UNION ALL SELECT z FROM tri) t
             |GROUP BY node ORDER BY node""".stripMargin)),

    // G32 — COHORT RETENTION: users grouped by first-activity week,
    // counted per (cohort, weeks-since) cell — the product-analytics
    // staple. ONE user-keyed shuffle does all the per-user work
    // (cohort = min week and the distinct active-week set ride the
    // same groupBy; the set is bounded by the timeline's week count,
    // not the user's event count), then the exploded (cohort, offset)
    // rows reduce in a second, output-sized aggregate. Offsets are
    // exact integer arithmetic (both weeks are Monday-truncated, so
    // the day difference is a multiple of 7).
    Q("g32_cohort_retention",
      (s, d) => {
        val perUser = Tables.events(s, d)
          .select(col("user_id"),
            to_date(date_trunc("week", col("ts"))).as("wk"))
          .groupBy("user_id")
          .agg(min("wk").as("cohort_week"), collect_set("wk").as("wks"))
        perUser.select(col("cohort_week"), explode(col("wks")).as("wk"))
          .select(col("cohort_week"),
            call_function("div", datediff(col("wk"), col("cohort_week")),
              lit(7)).cast("long").as("weeks_since"))
          .groupBy("cohort_week", "weeks_since")
          .agg(count(lit(1)).as("n_users"))
          .orderBy("cohort_week", "weeks_since")
      },
      Some("""WITH pu AS (
             |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
             |  FROM events GROUP BY 1, 2),
             |fw AS (SELECT user_id, min(wk) AS cohort_week FROM pu GROUP BY 1)
             |SELECT f.cohort_week,
             |  date_diff('day', f.cohort_week, p.wk) // 7 AS weeks_since,
             |  count(*) AS n_users
             |FROM pu p JOIN fw f USING (user_id)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // G33 — ITEM-ITEM similarity top-3 (the collaborative-filtering
    // "customers who bought X also bought Y" kernel): per part, the
    // three most Jaccard-similar parts over order co-occurrence, in
    // exact integral e6 (1e6·|A∩B| div |A∪B| — no float calibration,
    // replays cell-for-cell). The candidate space is bounded by
    // co-occurrence (pairs sharing an order — per-order fan-out is
    // order-size², never parts²), degrees broadcast into the scoring
    // join, and the per-part top-3 is the bounded k-heap aggregate
    // (`TopK.perGroup`) — the shuffle carries parts×3 rows, never the
    // full scored pair list through a rank window.
    Q("g33_item_similarity",
      (s, d) => {
        // both inputs come pre-reduced from the shared co-occurrence
        // artifact (g31 paid the one order-keyed shuffle that built
        // it); from here everything is map-only + broadcast joins +
        // the bounded k-heap
        val base = coPurchase(s, d)
        val deg = s.read.parquet(s"$base/deg")
        val co = s.read.parquet(s"$base/co")
        val sym = co.unionByName(
          co.select(col("b").as("a"), col("a").as("b"), col("c")))
        val scored = sym
          .join(broadcast(deg.select(col("p").as("a"), col("d").as("da"))), Seq("a"))
          .join(broadcast(deg.select(col("p").as("b"), col("d").as("db"))), Seq("b"))
          .select(col("a").as("part"), col("b").as("other"),
            call_function("div", lit(1000000L) * col("c"),
              col("da") + col("db") - col("c")).cast("double").as("score"))
        graft.operators.TopK.perGroup(scored, "part", "other", "score", 3)
          .select(col("part"), col("rn").cast("long").as("rk"), col("other"),
            col("score").cast("long").as("jac_e6"))
          .orderBy("part", "rk")
      },
      Some("""WITH op AS (
             |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
             |deg AS (SELECT p, count(*) AS d FROM op GROUP BY 1),
             |co AS (SELECT x.p AS a, y.p AS b, count(*) AS c
             |       FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
             |       GROUP BY 1, 2),
             |sym AS (SELECT a, b, c FROM co
             |        UNION ALL SELECT b, a, c FROM co),
             |sc AS (SELECT s.a AS part, s.b AS other,
             |         (1000000 * s.c) // (da.d + db.d - s.c) AS jac_e6
             |       FROM sym s JOIN deg da ON s.a = da.p
             |            JOIN deg db ON s.b = db.p),
             |r AS (SELECT part, other, jac_e6,
             |        row_number() OVER (
             |          PARTITION BY part ORDER BY jac_e6 DESC, other) AS rk
             |      FROM sc)
             |SELECT part, rk, other, CAST(jac_e6 AS BIGINT) AS jac_e6
             |FROM r WHERE rk <= 3 ORDER BY part, rk""".stripMargin)),

    // G34 — EXACT heavy hitters, count-min guided: users with >= 75
    // events, computed WITHOUT a full-cardinality aggregation. Pass 1
    // folds every row into a 4×2048 count-min matrix (map-side
    // partials, the exchange carries a few KB per partition — never a
    // key); pass 2 filters rows through the broadcast sketch's
    // estimate — an OVER-count by construction, so no true heavy
    // hitter can be dropped — and only the surviving candidates enter
    // the exact groupBy, whose final HAVING kills collision-borne
    // false positives. Result is exactly GROUP BY HAVING (the
    // oracle); the keyed shuffle carries candidate rows only. At
    // 100 TB a plain groupBy shuffles every distinct key; this
    // shuffles the heavy tail plus a collision fringe
    // (SketchesSpec pins the no-false-negative law).
    Q("g34_heavy_hitters",
      (s, d) => {
        graft.operators.Sketches.heavyHitters(
            Tables.events(s, d).select("user_id"), "user_id", 75L)
          .select(col("user_id"), col("count").as("n_events"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, COUNT(*) AS n_events
             |FROM events GROUP BY user_id HAVING COUNT(*) >= 75
             |ORDER BY user_id""".stripMargin))
  )
}
