package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition pruning: a filter on the partition column must reach the
  * scan as a PartitionFilter so non-matching partitions are never
  * read — with a date/tenant-partitioned 100 TB table this is the
  * difference between scanning one day and scanning three years.
  */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("filter on the partition column prunes to exactly the matching partitions") {
    val path = Files.createTempDirectory("graft_prune").toString + "/fact"
    (1L to 300L).map(i => (i, f"2024-01-${i % 3 + 1}%02d"))
      .toDF("id", "day").write.partitionBy("day").parquet(path)

    val pruned = spark.read.parquet(path).filter(col("day") === "2024-01-02")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString

    assert(scan.contains("PartitionFilters"), s"no partition filters:\n$scan")
    assert(scan.contains("isnotnull(day") || scan.contains("day#"),
      s"day predicate missing from scan:\n$scan")
    // the read must touch only the one matching partition
    val files = pruned.select(input_file_name()).distinct().as[String].collect()
    assert(files.nonEmpty && files.forall(_.contains("day=2024-01-02")),
      s"read files outside the pruned partition: ${files.mkString(", ")}")
    assert(pruned.count() == 100)
  }

  test("k8's day-partitioned event layout reads only the filtered day") {
    val d = "/root/testdata/sf0.001"
    val path = graft.engine.TempArtifacts.getOrBuild(s"$d#dtpart", "graft_dtpart") { p =>
      graft.engine.Tables.events(spark, d).withColumn("dt", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("dt").parquet(p)
    }
    val day = spark.read.parquet(path).filter(col("dt") === lit("2024-01-05"))
    val files = day.select(input_file_name()).distinct().as[String].collect()
    assert(files.nonEmpty && files.forall(_.contains("dt=2024-01-05")),
      s"read files outside the pruned day: ${files.mkString(", ")}")
  }
}
