package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** The incremental embedding-dedup contract (the vector mirror of
  * IncrementalDedupSpec): probing a persisted SRP bucket index with a
  * delta must return EXACTLY the full-recompute near-dup pairs that
  * touch the delta — no old↔old pair re-reported, no cross-boundary
  * pair missed — and appending a resolved batch must make it visible
  * to the next batch.
  */
class IncrementalSrpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dims = 8

  // three well-separated direction families; members of a family are
  // near-identical (cos ≈ 1), cross-family cos ≈ 0 — so near-dup
  // pairs at minCos=0.9 are exactly the within-family pairs.
  // old corpus 0–7 (families A: 0,3  B: 1,4  C: 2,5; 6,7 singletons
  // on their own axes), delta 8–11 (8 joins A, 9 joins B, 10≈11 a
  // brand-new family D)
  private def vec(axis: Int, jitter: Double): Array[Double] = {
    val v = Array.fill(dims)(jitter)
    v(axis) = 10.0
    v
  }
  private def allVecs: DataFrame = Seq(
    (0L, vec(0, 0.01)), (1L, vec(1, 0.02)), (2L, vec(2, 0.01)),
    (3L, vec(0, 0.03)), (4L, vec(1, 0.01)), (5L, vec(2, 0.04)),
    (6L, vec(3, 0.01)), (7L, vec(4, 0.02)),
    (8L, vec(0, 0.02)), (9L, vec(1, 0.03)),
    (10L, vec(5, 0.01)), (11L, vec(5, 0.02))
  ).toDF("vec_id", "embedding")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_srp_spec").toString

  private val MinCos = 0.9

  test("incremental pairs equal the full recompute filtered to delta-touching") {
    val vecs = allVecs
    val path = tmp()
    Similarity.writeSrpIndex(vecs.filter(col("vec_id") < 8),
      "vec_id", "embedding", path, nPlanes = 4, dims = dims)

    val incremental = Similarity.incrementalCosineNearDupPairs(
        vecs.filter(col("vec_id") >= 8), "vec_id", "embedding", path,
        minCos = MinCos, nPlanes = 4, dims = dims)
      .select("id_a", "id_b", "cos_e7")
      .as[(Long, Long, Long)].collect().toSet

    val full = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding",
        minCos = MinCos, nPlanes = 4, dims = dims)
      .select("id_a", "id_b", "cos_e7")
      .as[(Long, Long, Long)].collect().toSet

    assert(incremental == full.filter { case (a, b, _) => a >= 8 || b >= 8 })
    // old↔old family pairs exist in the full recompute but must NOT
    // be re-reported by the incremental probe
    assert(full.exists { case (a, b, _) => (a, b) == ((0L, 3L)) })
    assert(!incremental.exists { case (a, b, _) => (a, b) == ((0L, 3L)) })
    // cross-boundary and new↔new pairs ARE found, the latter exactly
    // once (orientation dedup)
    assert(incremental.exists { case (a, b, _) => (a, b) == ((0L, 8L)) })
    assert(incremental.count { case (a, b, _) => (a, b) == ((10L, 11L)) } == 1)
  }

  test("appending a resolved batch makes it visible to the next delta") {
    val vecs = allVecs
    val path = tmp()
    Similarity.writeSrpIndex(vecs.filter(col("vec_id") < 8),
      "vec_id", "embedding", path, nPlanes = 4, dims = dims)
    // resolve batch {8, 9}, fold it in, then probe with {10, 11}:
    // a vector near 8 must now match 8 through the index
    Similarity.writeSrpIndex(vecs.filter(col("vec_id").isin(8L, 9L)),
      "vec_id", "embedding", path, nPlanes = 4, dims = dims,
      overwrite = false)
    val probe = Seq((20L, vec(0, 0.015))).toDF("vec_id", "embedding")
    val pairs = Similarity.incrementalCosineNearDupPairs(probe,
        "vec_id", "embedding", path, minCos = MinCos, nPlanes = 4, dims = dims)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((8L, 20L)), "folded batch member must be probeable")
    assert(pairs.contains((0L, 20L)), "original index member still matches")
  }

  test("stream probe flags exactly the incremental contract's new↔old pairs") {
    val vecs = allVecs
    val path = tmp()
    Similarity.writeSrpIndex(vecs.filter(col("vec_id") < 8),
      "vec_id", "embedding", path, nPlanes = 4, dims = dims)
    // batch invocation of the stream-shaped plan (every stage is
    // stateless, so the frame kind doesn't change the semantics)
    val probe = Similarity.streamCosineNearDupProbe(
        vecs.filter(col("vec_id") >= 8), "vec_id", "embedding", path,
        minCos = MinCos, nPlanes = 4, dims = dims)
      .select("vec_id", "matched_id").as[(Long, Long)].collect().toSet
    val incrPairs: Set[(Long, Long)] = Similarity.incrementalCosineNearDupPairs(
        vecs.filter(col("vec_id") >= 8), "vec_id", "embedding", path,
        minCos = MinCos, nPlanes = 4, dims = dims)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val incrNewOld = incrPairs
      .filter(p => p._1 < 8 && p._2 >= 8)
      .map(p => (p._2, p._1)) // (new, old)
    assert(probe == incrNewOld)
    assert(probe.contains((8L, 0L)) && probe.contains((9L, 1L)))
    // new↔new pairs are the fold-in's job, never the stream probe's
    assert(!probe.exists { case (a, b) => a >= 8 && b >= 8 })
  }

  test("union-oversized buckets are capped exactly like the full recompute") {
    // 6 indexed + 2 delta members of family A: union bucket size 8 > 5
    // ⇒ no A pairs; the planted family-D pair (bucket size 2) survives
    val vecs = (Seq.tabulate(6)(i => (i.toLong, vec(0, 0.01 * (i + 1)))) ++
      Seq((100L, vec(0, 0.07)), (101L, vec(0, 0.08)),
        (102L, vec(5, 0.01)), (103L, vec(5, 0.02))))
      .toDF("vec_id", "embedding")
    val path = tmp()
    Similarity.writeSrpIndex(vecs.filter(col("vec_id") < 100),
      "vec_id", "embedding", path, nPlanes = 4, dims = dims)
    val pairs = Similarity.incrementalCosineNearDupPairs(
        vecs.filter(col("vec_id") >= 100), "vec_id", "embedding", path,
        minCos = MinCos, nPlanes = 4, dims = dims, maxBucket = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((102L, 103L)),
      s"union-oversized bucket must emit nothing; got $pairs")
  }
}
