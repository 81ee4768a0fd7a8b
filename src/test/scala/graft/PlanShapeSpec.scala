package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape pins for the three join rewrites whose entire
  * point is the plan, not the result: the result would stay correct
  * if Catalyst regressed to the naive shape (the oracle can't see
  * it), but the 100 TB cost model would silently collapse. Same
  * pattern as the k7 zero-Exchange and v8/v10/v16 pruning specs.
  * `queryExecution.sparkPlan` (the pre-AQE physical plan) is used for
  * node-level traversal: the AQE wrapper is childless until executed.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def planOf(name: String): SparkPlan =
    graft.queries.Registry.queries(name)(spark, d).queryExecution.sparkPlan

  test("j9 range join plans as an equi-join, never BroadcastNestedLoop") {
    val plan = planOf("j9_range_join")
    val bnl = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(bnl.isEmpty, s"j9 regressed to BroadcastNestedLoopJoin:\n$plan")
  }

  test("j12 interval-overlap join plans as an equi-join, never BroadcastNestedLoop") {
    val plan = planOf("j12_interval_overlap_join")
    val bnl = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(bnl.isEmpty, s"j12 regressed to BroadcastNestedLoopJoin:\n$plan")
  }

  test("j10 Bloom probe is a native codegen predicate on the fact scan, below every exchange") {
    val plan = planOf("j10_bloom_semi_join")
    // no UDF anywhere: the probe must not break whole-stage codegen
    assert(!plan.toString.contains("UDF"),
      s"j10 carries a UDF on a hot path:\n$plan")
    val bloomFilters = plan.collect {
      case f: FilterExec if f.condition.exists(
        _.isInstanceOf[graft.expressions.BloomMightContain]) => f
    }
    assert(bloomFilters.nonEmpty, s"no bloom_might_contain Filter in:\n$plan")
    // the filter's subtree reaches the parquet scan with NO exchange
    // in between: rows drop before any shuffle, which is the entire
    // value of the runtime-filter pattern
    bloomFilters.foreach { f =>
      assert(f.child.collect { case e: Exchange => e }.isEmpty,
        s"bloom filter sits above an exchange:\n$plan")
      assert(f.child.collect { case s: FileSourceScanExec => s }.nonEmpty,
        s"bloom filter is not on the file scan:\n$plan")
    }
  }

  /** Exercises the generated code path end-to-end (doGenCode, not just
    * the interpreted eval the unit spec hits via collect on tiny
    * frames): count through the full j10 plan at sf0.001 and compare
    * to the oracle-shaped plain EXISTS.
    */
  test("j10 executes through codegen with the expected row count") {
    val got = graft.queries.Registry.queries("j10_bloom_semi_join")(spark, d)
    val plain = {
      import org.apache.spark.sql.functions._
      val o = graft.engine.Tables.orders(spark, d)
        .filter(col("o_totalprice") > 470000)
        .select(col("o_orderkey").as("l_orderkey"))
      graft.engine.Tables.lineitem(spark, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .join(o, Seq("l_orderkey"), "left_semi")
        .groupBy("l_orderkey").count()
    }
    assert(got.count() == plain.count())
  }
}
