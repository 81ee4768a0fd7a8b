package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.BatchedIndex
import graft.operators.{Dedup, IvfIndex}

/** Compaction must be invisible to readers: the same query returns
  * cell-for-cell identical results before and after, the manifest
  * collapses to one batch, and hive-partitioned parts keep their
  * layout. Exercises both served-index shapes — the dedup minhash
  * index (flat parts incl. pre-aggregated counts) and the IVF cell
  * index (partitioned part).
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_compact").toString

  test("minhash index: probe results identical across compaction") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.engine.Tables.documents(spark, d)
    val path = tmp()
    Dedup.writeMinhashIndex(docs.filter(col("doc_id") < 20),
      "doc_id", "text", path)
    Dedup.writeMinhashIndex(docs.filter(col("doc_id") >= 20 && col("doc_id") < 40),
      "doc_id", "text", path, overwrite = false)
    assert(BatchedIndex.committed(spark, path).size == 2)

    val delta = docs.filter(col("doc_id") >= 40)
    def probe() = Dedup.incrementalLshPairs(delta, "doc_id", "text", path)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val before = probe()
    assert(BatchedIndex.compact(spark, path) == 2)
    assert(BatchedIndex.committed(spark, path).size == 1)
    assert(probe() == before)
    // idempotent: nothing left to merge
    assert(BatchedIndex.compact(spark, path) == 0)
  }

  test("IVF cell index: search identical across compaction, layout kept") {
    val vecs = (0L until 64L).map { i =>
      val a = Array.fill(8)(0.1); a((i % 4).toInt * 2) = 5.0 + (i % 3); (i, a)
    }.toDF("vec_id", "embedding")
    val cent = vecs.filter(col("vec_id") < 4)
    val path = tmp()
    IvfIndex.foldBatch(vecs.filter(col("vec_id") < 32), "vec_id", "embedding",
      cent, path, overwrite = true)
    IvfIndex.foldBatch(vecs.filter(col("vec_id") >= 32), "vec_id", "embedding",
      cent, path, overwrite = false)
    val probes = vecs.filter(col("vec_id").isin(7L, 13L))
    def search() = IvfIndex.search(spark, path, probes, "vec_id", "embedding",
      k = 5, centroids = cent).orderBy("p_id", "rn").collect().toSeq
    val before = search()
    assert(BatchedIndex.compact(spark, path,
      partitionBy = Map("cells" -> Seq("cell_id"))) == 2)
    assert(BatchedIndex.committed(spark, path).size == 1)
    assert(search() == before)
    // the compacted batch keeps cell_id=... partition dirs for pruning
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val id = BatchedIndex.committed(spark, path).head
    val sub = fs.listStatus(new org.apache.hadoop.fs.Path(
        s"$path/cells/batch=$id"))
      .map(_.getPath.getName).filter(_.startsWith("cell_id="))
    assert(sub.nonEmpty, "compacted cells part lost its cell_id layout")
  }
}
