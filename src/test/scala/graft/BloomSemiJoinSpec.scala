package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Bloom-pruned semi join: the sketch pre-filter may pass false
  * positives but NEVER false negatives, and the closing semi join
  * removes the false positives — so the operator must equal the plain
  * left-semi join even with a deliberately tiny, collision-heavy
  * sketch. Also pins the pruning itself: the sketch filter drops the
  * bulk of non-matching fact rows before any exchange.
  */
class BloomSemiJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def plainSemi(fact: org.apache.spark.sql.DataFrame,
                        dim: org.apache.spark.sql.DataFrame) =
    fact.join(dim.select(col("k").as("fk")), Seq("fk"), "left_semi")

  test("equals the plain semi join even with a collision-heavy sketch") {
    val fact = (1L to 5000L).map(i => (i, i % 97)).toDF("fk", "payload")
    val dim = (1L to 5000L).filter(_ % 31 == 0).map(k => (k, s"d$k"))
      .toDF("k", "name")
    // deliberately undersized (expected 10 items for 161 keys, 30 %
    // fpp) so false positives definitely occur and the semi join has
    // real work to do
    val got = Relational.bloomPrunedSemiJoin(fact, "fk", dim, "k",
        expectedItems = 10L, fpp = 0.3)
      .orderBy("fk").collect().map(_.getLong(0))
    val want = plainSemi(fact, dim).orderBy("fk").collect().map(_.getLong(0))
    assert(got.sameElements(want))
    assert(want.length == 5000 / 31)
  }

  test("null fact keys drop, exactly as in the plain semi join") {
    val fact = Seq[(Option[Long], String)](
      (Some(1L), "a"), (None, "b"), (Some(2L), "c"), (None, "d"))
      .toDF("fk", "payload")
    val dim = Seq((1L, "x"), (5L, "y")).toDF("k", "name")
    val got = Relational.bloomPrunedSemiJoin(fact, "fk", dim, "k",
      expectedItems = 100L).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("a well-sized sketch prunes non-matching rows before the join") {
    val fact = (1L to 10000L).toDF("fk")
    val dim = (1L to 10000L).filter(_ % 100 == 0).toDF("k")
    val sketch = dim.stat.bloomFilter("k", 200L, 0.01)
    val passed = fact.collect().count(r => sketch.mightContainLong(r.getLong(0)))
    // 100 true keys + ~1 % fp of the other 9900 — far below the 10000
    // the shuffle would otherwise carry
    assert(passed < 500, s"sketch passed $passed of 10000 rows")
    assert((1L to 10000L).filter(_ % 100 == 0)
      .forall(sketch.mightContainLong), "sketch dropped a true key")
  }
}
