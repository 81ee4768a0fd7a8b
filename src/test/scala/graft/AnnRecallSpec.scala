package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** The ANN variants are approximations of the exact scan — their
  * VALUE is the recall/cost trade, so pin it: bucketed search must
  * return a meaningful fraction of the true top-k, and multi-probe
  * must recover at least as much as single-bucket search (that is
  * the entire point of probing the one-bit-flip buckets). Data is
  * deterministic pseudo-random, so these are exact assertions, not
  * flaky statistics.
  */
class AnnRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dims = 16
  private val k = 5

  /** 300 deterministic vectors with mild cluster structure (8 seed
    * directions + per-vector jitter) so near-neighbour sets are
    * non-trivial.
    */
  private lazy val vecs = {
    (0 until 300).map { i =>
      val c = i % 8
      val v = Seq.tabulate(dims) { j =>
        val seed = (((c * 31 + j * 17) % 23) - 11) / 11.0f
        val jitter = (((i * 13 + j * 7) % 19) - 9) / 45.0f
        seed + jitter
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  private def recallOf(ann: org.apache.spark.sql.DataFrame): Double = {
    val exact = Similarity.cosineTopK(vecs.filter(col("vec_id") < 10), vecs,
      "vec_id", "embedding", k)
      .select("p_id", "vec_id").as[(Long, Long)].collect().toSet
    val got = ann.select("p_id", "vec_id").as[(Long, Long)].collect().toSet
    got.intersect(exact).size.toDouble / exact.size
  }

  test("multi-probe recall >= single-bucket recall, both above floor") {
    val single = recallOf(Similarity.srpAnnTopK(
      vecs.filter(col("vec_id") < 10), vecs, "vec_id", "embedding", k,
      nPlanes = 4, dims = dims))
    val multi = recallOf(Similarity.srpMultiProbeTopK(
      vecs.filter(col("vec_id") < 10), vecs, "vec_id", "embedding", k,
      nPlanes = 4, dims = dims))
    assert(multi >= single,
      s"multi-probe recall $multi fell below single-bucket recall $single")
    assert(multi > 0.5, s"multi-probe recall $multi is uselessly low")
    assert(single > 0.2, s"single-bucket recall $single is uselessly low")
  }

  test("IVF cell-restricted search finds its probes' own cells") {
    val out = Similarity.ivfTopK(vecs.filter(col("vec_id") < 10), vecs,
      "vec_id", "embedding", k, centroids = vecs.filter(col("vec_id") < 16))
    // every probe returns results and ranks are contiguous from 1
    val byProbe = out.groupBy("p_id").agg(count(lit(1)).as("n"), max("rn").as("mx"))
      .as[(Long, Long, Int)].collect()
    assert(byProbe.length == 10)
    assert(byProbe.forall { case (_, n, mx) => n == mx })
  }
}
