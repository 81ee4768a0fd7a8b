package graft

import org.apache.spark.sql.functions._

import graft.engine.Sessions
import graft.io.Warehouse

/** Scan-rate A/B harness for the r20 native-path splice: time a WIDE,
  * non-pushable full scan of a warehouse table (sum of a hash over
  * every column — nothing the footer-aggregate path can answer, so
  * every row crosses the scan boundary) under the native parquet path
  * and under the V1 bridge (`spark.graft.warehouse.nativeScan=false`).
  * Not part of the driver contract — the measured medians are
  * recorded in BASELINE.md like the AnnRecall tables.
  *
  * Usage: runMain graft.ScanRate <sfDir> [reps]
  */
object ScanRate {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 7
    require(reps >= 2,
      s"need >= 2 reps (rep 0 is excluded from medians), got $reps")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val path =
      java.nio.file.Files.createTempDirectory("graft_scanrate").toString + "/t"
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("part", pmod(col("l_orderkey"), lit(8L)).cast("string"))
    Warehouse.create(spark, path, li.repartition(16), "part")
    val df0 = spark.read.format("graft-warehouse").load(path)
    val rows = df0.count()
    val cols = df0.columns.toSeq
    def run(tag: String,
            shape: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
        : Seq[Double] = (0 until reps).map { r =>
      val t0 = System.nanoTime()
      val df = shape(spark.read.format("graft-warehouse").load(path))
      df.select(sum(hash(cols.map(col): _*)).as("h")).collect(): Unit
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[scanrate] $tag%-6s rep=$r $s%6.3f s ($rows rows, ${cols.length} cols)")
      s
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    spark.conf.set("spark.graft.warehouse.nativeScan", "true")
    val native = run("native", identity)
    spark.conf.set("spark.graft.warehouse.nativeScan", "false")
    val bridge = run("bridge", identity)
    // the r19-and-earlier shape for reference: an external-Row round
    // trip (deserialize to Row, re-encode to InternalRow) on every
    // row — df.rdd + createDataFrame reproduces exactly that boundary
    val encoder = run("encode", df => spark.createDataFrame(df.rdd, df.schema))
    println(f"[scanrate] medians (rep 0 excluded): native ${median(native.drop(1))}%6.3f s, " +
      f"bridge ${median(bridge.drop(1))}%6.3f s, row-encoder round trip " +
      f"${median(encoder.drop(1))}%6.3f s (${rows}%,d rows: " +
      f"${rows / median(native.drop(1))}%,.0f vs ${rows / median(bridge.drop(1))}%,.0f " +
      f"vs ${rows / median(encoder.drop(1))}%,.0f rows/s)")
    // the sf-scale temp warehouse is pure scratch - don't litter /tmp
    // across the repeated invocations this harness exists for
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(path).getParentFile): Unit
    spark.stop()
  }
}
