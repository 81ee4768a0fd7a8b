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

  test("IVF multi-probe recall: nprobe=2 >= nprobe=1, both above floor") {
    val cents = vecs.filter(col("vec_id") < 16)
    val r1 = recallOf(Similarity.ivfTopK(vecs.filter(col("vec_id") < 10), vecs,
      "vec_id", "embedding", k, centroids = cents, nprobe = 1))
    val r2 = recallOf(Similarity.ivfTopK(vecs.filter(col("vec_id") < 10), vecs,
      "vec_id", "embedding", k, centroids = cents, nprobe = 2))
    assert(r2 >= r1, s"nprobe=2 recall $r2 fell below nprobe=1 recall $r1")
    assert(r1 > 0.1, s"nprobe=1 recall $r1 is uselessly low")
    assert(r2 > 0.3, s"nprobe=2 recall $r2 is uselessly low")
  }

  test("SQ two-stage: full-pool degenerates to exact; bounded pool keeps high recall") {
    val probes = vecs.filter(col("vec_id") < 10)
    // rerankK >= |corpus| → stage 1 keeps everything → stage 2 IS the
    // exact search, cell for cell
    val degen = Similarity.sqTopK(probes, vecs, "vec_id", "embedding",
        k, rerankK = 300)
      .select("p_id", "rn", "vec_id").as[(Long, Long, Long)].collect().toSet
    val exact = Similarity.cosineTopK(probes, vecs, "vec_id", "embedding", k)
      .select("p_id", "rn", "vec_id").as[(Long, Long, Long)].collect().toSet
    assert(degen == exact)
    // int8 codes rank well enough that a 4k pool recovers ~all of top-k
    val r = recallOf(Similarity.sqTopK(probes, vecs, "vec_id", "embedding",
      k, rerankK = 4 * k))
    assert(r > 0.8, s"SQ rerank recall $r is uselessly low")
  }

  test("PQ two-stage: full-pool degenerates to exact; bounded pool keeps useful recall") {
    val probes = vecs.filter(col("vec_id") < 10)
    // rerankK >= |corpus| → the ADC stage keeps everything → stage 2
    // IS the exact search, cell for cell. This also proves every code
    // stays inside [0, ksub): an out-of-range code would make the
    // reconstruction lookup null, null the ADC score, drop the row
    // from stage 1, and break this equality.
    val degen = Similarity.pqTopK(probes, vecs, "vec_id", "embedding",
        k, rerankK = 300, m = 4, ksub = 8, dims = dims)
      .select("p_id", "rn", "vec_id").as[(Long, Long, Long)].collect().toSet
    val exact = Similarity.cosineTopK(probes, vecs, "vec_id", "embedding", k)
      .select("p_id", "rn", "vec_id").as[(Long, Long, Long)].collect().toSet
    assert(degen == exact)
    // m-byte codes are a far coarser sketch than int8 SQ (m=4 vs 16
    // bytes here), so the floor is proportionally lower; the value of
    // the row is that a hash-derived (untrained) codebook still ranks
    // usefully — a trained codebook only raises this
    val r = recallOf(Similarity.pqTopK(probes, vecs, "vec_id", "embedding",
      k, rerankK = 4 * k, m = 4, ksub = 8, dims = dims))
    assert(r > 0.2, s"PQ rerank recall $r is uselessly low")
  }

  test("indexed SQ search (v10 shape) keeps useful recall with a bounded pool") {
    import graft.operators.IvfIndex
    val cents = vecs.filter(col("vec_id") < 16)
    val path = java.nio.file.Files.createTempDirectory("graft_annrec").toString
    IvfIndex.build(vecs, "vec_id", "embedding", cents, path)
    val probes = vecs.filter(col("vec_id") < 10)
    // the composed path stacks TWO approximations (cell restriction +
    // int8 stage-1), so pin both the nprobe monotonicity and a floor
    val r1 = recallOf(IvfIndex.searchSq(spark, path, probes,
      "vec_id", "embedding", k, rerankK = 4 * k, centroids = cents, nprobe = 1))
    val r2 = recallOf(IvfIndex.searchSq(spark, path, probes,
      "vec_id", "embedding", k, rerankK = 4 * k, centroids = cents, nprobe = 2))
    assert(r2 >= r1, s"nprobe=2 recall $r2 fell below nprobe=1 recall $r1")
    assert(r1 > 0.1, s"indexed-SQ nprobe=1 recall $r1 is uselessly low")
    assert(r2 > 0.3, s"indexed-SQ nprobe=2 recall $r2 is uselessly low")
  }

  test("k-means training monotonically improves the avg best-cosine objective") {
    import org.apache.spark.sql.DataFrame
    def objective(cents: DataFrame): Double = {
      val c = cents.select(col("vec_id").as("cell_id"), col("embedding").as("c_vec"))
      vecs.crossJoin(broadcast(c))
        .select(col("vec_id"),
          Similarity.cosine(col("embedding"), col("c_vec")).as("cos"))
        .groupBy("vec_id").agg(max("cos").as("best"))
        .agg(avg("best")).as[Double].head()
    }
    val seed = vecs.filter(col("vec_id") < 8)
    val seedObj = objective(seed)
    var prev = seedObj
    for (iters <- Seq(1, 3)) {
      val trained = Similarity.trainIvfCentroids(vecs, "vec_id", "embedding",
        k = 8, iters = iters)
      val obj = objective(trained)
      assert(obj >= prev - 1e-9,
        s"objective regressed at iters=$iters: $obj < $prev (seed $seedObj)")
      prev = obj
    }
    assert(prev > seedObj, "training never improved the seed codebook")
  }

  test("trained centroids feed ivfTopK end-to-end") {
    val trained = Similarity.trainIvfCentroids(vecs, "vec_id", "embedding",
      k = 8, iters = 2)
    val r = recallOf(Similarity.ivfTopK(vecs.filter(col("vec_id") < 10), vecs,
      "vec_id", "embedding", k, centroids = trained, nprobe = 2))
    assert(r > 0.2, s"trained-codebook recall $r is uselessly low")
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
