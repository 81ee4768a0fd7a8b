package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** Scan hygiene for the parquet path: literal predicates must reach
  * the scan as pushed filters (row-group stats pruning + late
  * materialization) and the read schema must shrink to the referenced
  * columns — the two properties that decide how many bytes a 100 TB
  * scan actually reads. Pinned here so a refactor that accidentally
  * wraps a filter in an opaque expression (killing pushdown) fails a
  * test instead of silently scanning everything.
  */
class ScanPushdownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sfDir = "/root/testdata/sf0.001"

  test("literal filter pushes to the parquet scan and columns prune") {
    val plan = Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") === 50)
      .select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan
    val scans = plan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "no parquet scan found")
    val meta = scans.head.metadata
    assert(meta("PushedFilters").contains("EqualTo(l_quantity,50"),
      s"filter not pushed: ${meta("PushedFilters")}")
    val read = meta("ReadSchema")
    assert(read.contains("l_orderkey") && read.contains("l_quantity"))
    assert(!read.contains("l_comment") && !read.contains("l_extendedprice"),
      s"scan reads pruned columns: $read")
  }

  test("timestamp range predicates push down too") {
    val plan = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1996-01-01"))
      .select("o_orderkey")
      .queryExecution.executedPlan
    val scans = plan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val pushed = scans.head.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(o_orderdate") &&
      pushed.contains("LessThan(o_orderdate"),
      s"timestamp range not pushed: $pushed")
  }
}
