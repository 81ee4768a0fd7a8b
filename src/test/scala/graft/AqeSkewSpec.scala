package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** When does AQE's runtime skew split make the manual salt (j6,
  * [[Relational.saltedJoin]]) unnecessary? This spec measures it with
  * a deliberately skewed key instead of leaving the claim to prose:
  * a fact side where one key holds ~30% of all rows, joined
  * sort-merge (broadcast disabled) with skew thresholds scaled down
  * to test size. AQE must actually split the hot partition — the
  * "skew" marker in the final adaptive plan — and the salted join
  * must produce the identical result under the same skew.
  *
  * Decision rule this pins (also in saltedJoin's scaladoc):
  * broadcast first (no big-side shuffle at all), AQE second (zero
  * code, splits oversized sort-merge partitions at runtime — single
  * hot keys included), manual salt only where neither applies:
  * stateful streaming joins (no AQE re-planning), plans whose output
  * partitioning must be preserved for a downstream operator (AQE
  * refuses the split), or a single key too large for one task even
  * as its own partition-split unit.
  */
class AqeSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AQE splits the skewed sort-merge partition; salted join matches it exactly") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      // this spec's scenario is a SORT-MERGE skew split: pin the AQE
      // SMJ→SHJ rewrite (session default 64 MB since r20) off so the
      // tiny test shuffle stays SMJ
      "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      // scale the 256 MB production threshold (and the 5× median
      // factor, since a handful of test partitions makes the median
      // fat) down to test size, and force sort-merge (a broadcastable
      // dim would sidestep skew entirely — that IS the first rung of
      // the decision rule)
      conf.set(keys(0), "128k")
      conf.set(keys(1), "2")
      conf.set(keys(2), "32k")
      conf.set(keys(3), "-1")
      conf.set(keys(4), "0")

      // 200k rows, 50% on hot key 0, the rest uniform over 500 keys
      val fact = spark.range(200000).select(
        when(pmod(col("id"), lit(10)) < 5, lit(0L))
          .otherwise(pmod(col("id"), lit(500))).as("k"),
        col("id").as("payload"))
      val dim = spark.range(500).select(col("id").as("k"), (col("id") * 2).as("attr"))

      val plain = fact.join(dim, Seq("k"))
      plain.collect() // finalize the adaptive plan
      val planStr = plain.queryExecution.executedPlan.toString
      assert(planStr.contains("SortMergeJoin"), s"expected SMJ:\n$planStr")
      assert(planStr.toLowerCase.contains("skew"),
        s"AQE did not engage its skew split on a 30%-hot key:\n$planStr")

      // the manual fallback yields EXACTLY the same join under the
      // same skew (j6's oracle law, re-pinned at skewed distribution)
      val salted = Relational.saltedJoin(fact, dim, Seq("k"), "inner",
        nSalts = 8, saltFrom = col("payload"))
      val agg = Seq(count(lit(1)).as("n"), sum(col("payload")).as("sp"),
        sum(col("attr")).as("sa"))
      assert(salted.agg(agg.head, agg.tail: _*).collect().toSeq ==
        plain.agg(agg.head, agg.tail: _*).collect().toSeq)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
