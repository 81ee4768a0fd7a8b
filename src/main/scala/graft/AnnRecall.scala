package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.{Sessions, Tables}
import graft.operators.Similarity

/** Recall harness for the approximate-similarity surface: recall@k of
  * each ANN variant against the exact scan (v1) over the REAL
  * embeddings table at a given scale dir — the quality number a user
  * tunes nPlanes/nprobe against, complementing the oracle checks
  * (which prove each variant matches its own replayed definition,
  * not how close the approximation is to the truth).
  *
  * Usage: runMain graft.AnnRecall <sfDir> [nProbesRows] [k]
  * Prints one `name recall elapsed_s` row per setting plus a JSON
  * summary line; results are deterministic (hash-seeded planes,
  * fixed centroid convention vec_id < 16 — same as the v-queries).
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nProbes = args.lift(1).map(_.toInt).getOrElse(20)
    val k = args.lift(2).map(_.toInt).getOrElse(50)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    import spark.implicits._

    val e = Tables.embeddings(spark, dir)
    // probes DISJOINT from the vec_id < 16 centroid convention: a
    // probe that IS a centroid has its own cell centered on itself,
    // which flatters hash-picked-centroid recall vs trained codebooks
    val probes = e.filter(col("vec_id") >= 100 && col("vec_id") < 100 + nProbes)
    val dims = e.select(size(col("embedding"))).as[Int].head()
    val cents = e.filter(col("vec_id") < 16)

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("p_id", "vec_id").as[(Long, Long)].collect().toSet

    val exact = pairs(Similarity.cosineTopK(probes, e, "vec_id", "embedding", k))

    // v7's production recipe: train on a deterministic sample, same
    // cell count as the hash-picked convention for a fair comparison
    lazy val trained = Similarity.trainIvfCentroids(
      e.filter(col("vec_id") < 1000).coalesce(1), "vec_id", "embedding",
      k = 16, iters = 2)

    val settings: Seq[(String, () => DataFrame)] =
      Seq(4, 6, 8).map(p => (s"srp_planes$p", () =>
        Similarity.srpAnnTopK(probes, e, "vec_id", "embedding", k, p, dims))) ++
      Seq(4, 6, 8).map(p => (s"srp_multiprobe_planes$p", () =>
        Similarity.srpMultiProbeTopK(probes, e, "vec_id", "embedding", k, p, dims))) ++
      Seq(1, 2, 4, 8).map(np => (s"ivf_nprobe$np", () =>
        Similarity.ivfTopK(probes, e, "vec_id", "embedding", k, cents, np))) ++
      Seq(1, 2, 4).map(np => (s"ivf_trained_nprobe$np", () =>
        Similarity.ivfTopK(probes, e, "vec_id", "embedding", k, trained, np)))

    // recall alone misleads across codebooks: a balanced (trained)
    // codebook reads FEWER candidates per probe than skewed hash-
    // picked cells, so report the corpus fraction each IVF setting
    // actually examines (probe-cell sizes / probes×corpus)
    val corpusN = e.count().toDouble
    def ivfReadFrac(centroids: DataFrame, nprobe: Int): Double = {
      val sizes = Similarity.ivfAssign(e, "vec_id", "embedding", centroids)
        .groupBy("cell_id").count()
      Similarity.probeCells(probes, "vec_id", "embedding", centroids, nprobe)
        .join(sizes, "cell_id")
        .agg(sum("count")).as[Long].head() / (nProbes * corpusN)
    }

    val rows = settings.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val got = pairs(fn())
      val secs = (System.nanoTime() - t0) / 1e9
      val recall = got.intersect(exact).size.toDouble / exact.size
      val frac = name match {
        case s if s.startsWith("ivf_trained_nprobe") =>
          f"${ivfReadFrac(trained, s.stripPrefix("ivf_trained_nprobe").toInt)}%.3f"
        case s if s.startsWith("ivf_nprobe") =>
          f"${ivfReadFrac(cents, s.stripPrefix("ivf_nprobe").toInt)}%.3f"
        case _ => ""
      }
      val fracCol = if (frac.isEmpty) "" else s"  read=$frac"
      println(f"$name%-28s recall@$k%-3d ${recall}%.3f  ${secs}%.1fs$fracCol")
      s""""$name":${f"$recall%.3f"}""" +
        (if (frac.isEmpty) "" else s""","${name}_read":$frac""")
    }
    // RANGE-search recall (v19's tuning metric): ground truth = every
    // (probe, vector) pair with cosine >= tau from the exact scan;
    // the IVF range search misses exactly the qualifying pairs whose
    // vector sits outside the probed cells, so recall here traces the
    // same nprobe curve as top-k — but weighted by similarity mass,
    // not rank.
    val tau = 0.4
    val trueRange = probes.select(col("vec_id").as("p_id"), col("embedding").as("p_vec"))
      .crossJoin(e.select(col("vec_id"), col("embedding")))
      .filter(col("p_id") =!= col("vec_id"))
      .filter(Similarity.cosine(col("p_vec"), col("embedding")) >= tau)
      .select("p_id", "vec_id").as[(Long, Long)].collect().toSet
    val idxPath = graft.operators.IvfIndex.builtFor(s"$dir#recall_range", e,
      "vec_id", "embedding", cents)
    val rangeRows = Seq(1, 2, 4, 8).map { np =>
      val got = graft.operators.IvfIndex.searchRange(spark, idxPath, probes,
        "vec_id", "embedding", tau, cents, np)
        .select("p_id", "vec_id").as[(Long, Long)].collect().toSet
      val recall =
        if (trueRange.isEmpty) 1.0
        else got.intersect(trueRange).size.toDouble / trueRange.size
      println(f"range_tau${tau}_nprobe$np%-8s recall ${recall}%.3f  (true pairs ${trueRange.size})")
      s""""range_nprobe$np":${f"$recall%.3f"}"""
    }
    println(s"""{"recall_at":$k,"probes":$nProbes,"dims":$dims,"sf":"$dir",${(rows ++ rangeRows).mkString(",")}}""")
    spark.stop()
  }
}
