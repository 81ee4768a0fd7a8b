package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: writing both sides bucketed on the join
  * key lets the join run with ZERO exchanges — the physical plan a
  * recurring 100 TB join wants (pay the shuffle once at write time,
  * never again per query).
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("join of two tables bucketed on the key plans without any Exchange") {
    val li = (1L to 1000L).map(i => (i % 100, i, i * 2.0)).toDF("k", "id", "v")
    val dim = (0L until 100L).map(i => (i, s"dim$i")).toDF("k", "name")
    li.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bkt_fact")
    dim.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bkt_dim")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a shuffle-based strategy so the bucket co-location is
      // what saves the exchange (broadcast would mask it)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_fact").join(spark.table("bkt_dim"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_fact")
      spark.sql("DROP TABLE IF EXISTS bkt_dim")
    }
  }
}
