package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Warehouse
import graft.sources.warehouse.WarehouseDataSource

/** Per-file BLOOM sidecars — the skipping layer for point lookups on
  * columns min/max can't prune. The table is compacted SORTED ON k
  * with blooms on `id`, a high-cardinality column uncorrelated with
  * k: every file's [min,max] over `id` spans the whole space (min/max
  * alone prunes nothing), but each file's bloom holds only its own
  * ids, so an `id = x` lookup must open strictly fewer files — and an
  * id absent from the table must open (almost) none, while results
  * stay exactly the plain filtered read in both cases.
  */
class WarehouseBloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 4000 rows, 2 partitions, ~40 files after compaction; id is a
    * bit-reversal-ish scramble of k so id ranges overlap per file.
    */
  private lazy val tablePath: String = {
    val path = Files.createTempDirectory("graft_bloom").toString + "/t"
    val base = (1L to 4000L).map { i =>
      (i, (i * 2654435761L) % 1000003L, if (i % 2 == 0) "d1" else "d2")
    }.toDF("k", "id", "part")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", 100L)
    try Warehouse.create(spark, path, base.repartition(8), "part")
    finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    val target = math.max(1L,
      Warehouse.partitionStats(spark, path).map(_._4).sum / 16)
    Warehouse.compact(spark, path, "k", target,
      statsCols = Seq("id"), bloomCols = Seq("id"))
    path
  }

  private def idOf(k: Long): Long = (k * 2654435761L) % 1000003L

  test("a point lookup on a non-sorted column opens fewer files through the bloom, result exact") {
    val all = Warehouse.read(spark, tablePath)
    val fullFiles = all.inputFiles.length
    assert(fullFiles > 4, s"need a multi-file layout, got $fullFiles")
    val v = idOf(1234L)
    val looked = Warehouse.readSkipping(spark, tablePath, "id", v, v)
    assert(looked.inputFiles.length < fullFiles,
      s"bloom must prune: ${looked.inputFiles.length} vs $fullFiles " +
        "(min/max can't - id spans every file)")
    val got = looked.select("k").as[Long].collect().sorted.toSeq
    val want = all.filter(col("id") === v).select("k")
      .as[Long].collect().sorted.toSeq
    assert(got == want && want.contains(1234L))
  }

  test("an id absent from the table prunes to (almost) nothing and returns empty") {
    // 1000002 is outside the residue class the scramble produces only
    // if no k maps to it - assert absence first
    val all = Warehouse.read(spark, tablePath)
    val absent = (1 to 50).map(_ + 1000003L)
      .find(c => all.filter(col("id") === c).isEmpty).get
    val looked = Warehouse.readSkipping(spark, tablePath, "id", absent, absent)
    assert(looked.isEmpty)
    assert(looked.inputFiles.length <= math.max(2, all.inputFiles.length / 5),
      s"a 3% FPP bloom should prove absence for nearly every file, " +
        s"opened ${looked.inputFiles.length} of ${all.inputFiles.length}")
  }

  test("the DSv2 route engages blooms automatically: a pushed equality prunes the planned files") {
    WarehouseDataSource.lastPlanned = None
    val df = spark.read.format("graft-warehouse").load(tablePath)
      .filter(col("id") === idOf(77L))
    val got = df.select("k").as[Long].collect().toSeq
    assert(got == Seq(77L))
    val (planned, pushed) = WarehouseDataSource.lastPlanned.get
    assert(planned < Warehouse.read(spark, tablePath).inputFiles.length,
      s"pushed equality must bloom-prune, planned $planned")
    assert(pushed.exists(_.contains("id")))
  }

  test("a range predicate never consults the bloom (point-only), results stay exact") {
    val got = Warehouse.readSkipping(spark, tablePath, "id", 0L, 500000L)
      .count()
    val want = Warehouse.read(spark, tablePath)
      .filter(col("id").between(0L, 500000L)).count()
    assert(got == want && want > 0)
  }

  test("bloom request on a non-integral column is skipped silently, table stays correct") {
    val path = Files.createTempDirectory("graft_bloom2").toString + "/t"
    Warehouse.create(spark, path,
      (1L to 100L).map(i => (i, s"s$i", "d1")).toDF("k", "name", "part"),
      "part")
    Warehouse.compact(spark, path, "k", 1L << 20,
      bloomCols = Seq("name", "k"))
    // name (string) contributes no bloom; k (long) does - and the
    // read still serves every row
    assert(Warehouse.read(spark, path).count() == 100)
    val one = Warehouse.readSkipping(spark, path, "k", 42L, 42L)
    assert(one.select("k").as[Long].collect().toSeq == Seq(42L))
  }
}
