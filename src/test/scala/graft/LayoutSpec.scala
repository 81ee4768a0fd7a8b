package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Layout

/** The z-order layout's value is SKIPPING power: after clustering,
  * every file's min/max spread must be small on BOTH clustered
  * dimensions (that is what parquet row-group pruning prunes with),
  * and the rewrite must be a pure permutation of the rows.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zValue interleaves bits: both dims contribute, curve is monotone per dim") {
    val df = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L))
      .toDF("x", "y")
    val z = df.select(Layout.zValue(Seq(
        (col("x"), 0.0, 65535.0), (col("y"), 0.0, 65535.0))).as("z"))
      .as[Long].collect().toSeq
    // corners of the square: (0,0) → 0; (max,0) → even-bit mask;
    // (0,max) → odd-bit mask; (max,max) → all 32 bits
    assert(z(0) == 0L)
    assert(z(1) == 0x55555555L)
    assert(z(2) == 0xAAAAAAAAL)
    assert(z(3) == 0xFFFFFFFFL)
  }

  test("clustered files have small per-file spreads on BOTH dimensions") {
    // a grid with NO correlation between the two columns — the worst
    // case for single-column sorting, the exact case z-order exists for
    val n = 4096
    val df = (0 until n).map { i => (i.toLong % 64, i.toLong / 64) }
      .toDF("x", "y")
    val path = java.nio.file.Files.createTempDirectory("graft_layout").toString
    Layout.zorderWrite(df, Seq("x", "y"), path, nFiles = 16)

    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    assert(files.size >= 8, s"expected ~16 files, got ${files.size}")

    // global spread is 63 on each dim; a z-ordered 16-file split
    // covers ~1/16 of the square per file, so per-file spreads must
    // shrink dramatically on BOTH dims (single-column sort would
    // leave the other dim's spread at the full 63)
    val spreads = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(max("x") - min("x"), max("y") - min("y"))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    val avgX = spreads.map(_._1).sum.toDouble / spreads.size
    val avgY = spreads.map(_._2).sum.toDouble / spreads.size
    assert(avgX <= 32, s"avg per-file x-spread $avgX not clustered (global 63)")
    assert(avgY <= 32, s"avg per-file y-spread $avgY not clustered (global 63)")

    // pure permutation: nothing lost, nothing duplicated
    val back = spark.read.parquet(path).as[(Long, Long)].collect().sorted.toSeq
    val orig = df.as[(Long, Long)].collect().sorted.toSeq
    assert(back == orig)
  }
}
