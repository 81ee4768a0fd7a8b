package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Warehouse

/** SQL `DELETE FROM graft.`path`` — the METADATA-ONLY partition
  * delete plane. The scale claim asserted on disk: a delete commits
  * one manifest and touches ZERO data files (the dropped partitions
  * stay time-travelable until vacuum); the safety claim: predicates
  * not exactly decidable from partition values are refused at
  * analysis, never answered approximately; the ordering claim: range
  * predicates on integral partition values compare numerically
  * ('9' < '10'), where a naive lexicographic form would delete the
  * wrong partitions.
  */
class WarehouseDeleteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_delspec").toString + "/t"

  private def dataFiles(path: String): Set[String] = {
    val root = Paths.get(path, "data")
    Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p)).map(_.toString).toSet
  }

  test("partition-equality DELETE is metadata-only: rows gone, zero data files touched, history time-travelable") {
    val path = freshDir()
    Warehouse.create(spark, path,
      (1L to 400L).map(i => (i, s"n$i", if (i % 2 == 0) "d1" else "d2"))
        .toDF("k", "name", "part"), "part")
    val before = dataFiles(path)
    val v0 = Warehouse.currentVersion(spark, path)
    spark.sql(s"DELETE FROM graft.`$path` WHERE part = 'd1'")
    assert(dataFiles(path) == before, "delete must not touch a data file")
    assert(Warehouse.currentVersion(spark, path) == v0 + 1)
    val left = Warehouse.read(spark, path)
    assert(left.count() == 200 &&
      left.select("part").distinct().as[String].collect().toSeq == Seq("d2"))
    // the dropped partition is still served by time travel
    assert(Warehouse.readVersion(spark, path, v0).count() == 400)
  }

  test("retention DELETE: a date-range predicate drops exactly the partitions before the cutoff") {
    val path = freshDir()
    val df = (0 until 10).flatMap(d => (1 to 20).map(i =>
      (d * 100L + i, s"2024-01-${"%02d".format(d + 1)}")))
      .toDF("k", "dts").select(col("k"), to_date(col("dts")).as("dt"))
    Warehouse.create(spark, path, df, "dt")
    spark.sql(s"DELETE FROM graft.`$path` WHERE dt < DATE'2024-01-05'")
    val left = spark.read.format("graft-warehouse").load(path)
    assert(left.count() == 120)
    assert(left.agg(min("dt").cast("string")).as[String].head() == "2024-01-05")
  }

  test("integral partition ranges compare numerically, not lexicographically: bucket < 10 spares bucket 10") {
    val path = freshDir()
    Warehouse.create(spark, path,
      (0 until 12).flatMap(b => Seq((b * 10L, b))).toDF("k", "bucket"),
      "bucket")
    spark.sql(s"DELETE FROM graft.`$path` WHERE bucket < 10")
    val left = Warehouse.read(spark, path)
      .select("bucket").as[Int].collect().sorted.toSeq
    assert(left == Seq(10, 11),
      s"lexicographic compare would have kept 2..9 too, got $left")
  }

  test("a non-partition predicate is refused at analysis - row-level deletes belong to mergeInto") {
    val path = freshDir()
    Warehouse.create(spark, path,
      Seq((1L, "a", "d1"), (2L, "b", "d2")).toDF("k", "name", "part"), "part")
    val e = intercept[Exception] {
      spark.sql(s"DELETE FROM graft.`$path` WHERE name = 'a'")
    }
    assert(Warehouse.read(spark, path).count() == 2, "nothing may be deleted")
    assert(e.getMessage != null)
  }

  test("a no-match DELETE commits nothing") {
    val path = freshDir()
    Warehouse.create(spark, path,
      Seq((1L, "d1"), (2L, "d2")).toDF("k", "part"), "part")
    val v0 = Warehouse.currentVersion(spark, path)
    spark.sql(s"DELETE FROM graft.`$path` WHERE part = 'nope'")
    assert(Warehouse.currentVersion(spark, path) == v0,
      "zero matches must not burn a version")
    assert(Warehouse.read(spark, path).count() == 2)
  }

  test("delete-all leaves the documented empty-table state and restore() recovers it") {
    val path = freshDir()
    Warehouse.create(spark, path,
      Seq((1L, "d1"), (2L, "d2")).toDF("k", "part"), "part")
    val v0 = Warehouse.currentVersion(spark, path)
    spark.sql(s"DELETE FROM graft.`$path`")
    val e = intercept[IllegalArgumentException](Warehouse.read(spark, path))
    assert(e.getMessage.contains("no live partitions"))
    Warehouse.restore(spark, path, v0)
    assert(Warehouse.read(spark, path).count() == 2)
  }

  test("IN-list and boolean combinators delete the named partitions exactly") {
    val path = freshDir()
    Warehouse.create(spark, path,
      (1 to 6).map(i => (i.toLong, s"p$i")).toDF("k", "part"), "part")
    spark.sql(
      s"DELETE FROM graft.`$path` WHERE part IN ('p1','p3') OR part = 'p5'")
    val left = Warehouse.read(spark, path)
      .select("part").as[String].collect().sorted.toSeq
    assert(left == Seq("p2", "p4", "p6"))
  }
}
