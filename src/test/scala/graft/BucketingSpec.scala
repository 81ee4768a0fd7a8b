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

  test("k7 shape: bucketed join + same-key aggregation, zero exchanges") {
    val d = "/root/testdata/sf0.001"
    val tag = java.lang.Integer.toHexString(d.hashCode)
    val lt = graft.io.Layout.bucketedTable(
      graft.engine.Tables.lineitem(spark, d).select("l_orderkey", "l_quantity"),
      s"graft_bkt_${tag}_lineitem", nBuckets = 8, key = "l_orderkey")
    val ot = graft.io.Layout.bucketedTable(
      graft.engine.Tables.orders(spark, d).select("o_orderkey", "o_totalprice"),
      s"graft_bkt_${tag}_orders", nBuckets = 8, key = "o_orderkey")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val agg = spark.table(lt)
        .join(spark.table(ot).withColumnRenamed("o_orderkey", "l_orderkey"),
          Seq("l_orderkey"))
        .filter(col("o_totalprice") > 400000)
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_lines"), sum("l_quantity").as("sum_qty"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join+agg still shuffles:\n$plan")

      // one file per bucket (the repartition inside bucketedTable) is
      // what lets the scan report per-bucket sorted order; the join
      // result must equal the plain parquet-scan join
      val want = graft.engine.Tables.lineitem(spark, d)
        .select("l_orderkey", "l_quantity")
        .join(graft.engine.Tables.orders(spark, d)
            .select("o_orderkey", "o_totalprice")
            .withColumnRenamed("o_orderkey", "l_orderkey"),
          Seq("l_orderkey"))
        .filter(col("o_totalprice") > 400000)
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_lines"), sum("l_quantity").as("sum_qty"))
        .orderBy("l_orderkey").collect()
      val got = agg.orderBy("l_orderkey").collect()
      assert(got.sameElements(want))
      assert(got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
