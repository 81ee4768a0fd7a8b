package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.AggQueries

/** Pins sql7's truncation semantics: the recursion cap is not a
  * safety valve that never fires — a chain LONGER than the cap must
  * come back cut at exactly `cap` rows, depths 1..cap in chain order,
  * and chains shorter than the cap must be unaffected. The same
  * builder renders the driver-graded query, so what this spec proves
  * about the cap holds verbatim for sql7's oracle-checked SQL.
  */
class Sql7RecursionCapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def chainOf(cap: Int): Map[Long, Seq[(Long, Int)]] = {
    // customer 1: a 7-order chain; customer 2: a 2-order chain
    val rows = (1 to 7).map(i => (1L, 100L + i, f"1994-01-$i%02d")) ++
      Seq((2L, 201L, "1994-01-01"), (2L, 202L, "1994-01-02"))
    rows.toDF("o_custkey", "o_orderkey", "o_orderdate")
      .createOrReplaceTempView("orders_cap_fixture")
    spark.sql(AggQueries.recursiveChainSql("orders_cap_fixture", cap))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1)
      .map { case (k, v) => k -> v.sortBy(_._3).map(t => (t._2, t._3)).toSeq }
  }

  test("a chain longer than the cap truncates at exactly cap rows") {
    val got = chainOf(cap = 3)
    assert(got(1L) == Seq((101L, 1), (102L, 2), (103L, 3)),
      s"over-cap chain must cut at depth 3: ${got(1L)}")
    assert(got(2L) == Seq((201L, 1), (202L, 2)),
      s"under-cap chain must be complete: ${got(2L)}")
  }

  test("a cap beyond the longest chain changes nothing") {
    val got = chainOf(cap = 50)
    assert(got(1L).map(_._2) == (1 to 7), s"full chain expected: ${got(1L)}")
    assert(got(1L).map(_._1) == (1 to 7).map(i => 100L + i))
    assert(got(2L).size == 2)
  }

  test("the graded query renders with the published cap") {
    val sql = AggQueries.recursiveChainSql("orders", AggQueries.Sql7RecursionCap)
    assert(sql.contains(s"rn <= ${AggQueries.Sql7RecursionCap}"))
    assert(AggQueries.Sql7RecursionCap == 10,
      "cap change must be deliberate: update the BASELINE.md note with it")
  }
}
