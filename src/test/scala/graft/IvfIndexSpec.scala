package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfIndex, Similarity}

/** The materialized IVF index must (a) return cell-for-cell what the
  * live ivfTopK returns for the same codebook, and (b) actually PRUNE:
  * a search must plan file reads only for the probed cell partitions —
  * that pruning is the entire point of the partitioned layout.
  */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic 8-dim vectors in 4 well-separated direction
  // clusters, so cell assignment is stable and every cell is non-empty
  private def vecs(n: Int): DataFrame =
    (0L until n.toLong).map { i =>
      val axis = (i % 4).toInt
      val base = Array.fill(8)(0.05 * ((i * 7 % 5) + 1))
      base(axis * 2) = 10.0 + (i % 3)
      (i, base)
    }.toDF("vec_id", "embedding")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_ivf_spec").toString

  test("index search matches live ivfTopK cell-for-cell") {
    val corpus = vecs(64)
    val cent = corpus.filter(col("vec_id") < 4)
    val probes = corpus.filter(col("vec_id").isin(10L, 21L, 33L))
    val path = tmp()
    IvfIndex.build(corpus, "vec_id", "embedding", cent, path)
    for (nprobe <- Seq(1, 2)) {
      val live = Similarity.ivfTopK(probes, corpus, "vec_id", "embedding",
          k = 5, centroids = cent, nprobe = nprobe)
        .orderBy("p_id", "rn").collect().toSeq
      val indexed = IvfIndex.search(spark, path, probes, "vec_id", "embedding",
          k = 5, centroids = cent, nprobe = nprobe)
        .orderBy("p_id", "rn").collect().toSeq
      assert(indexed == live, s"nprobe=$nprobe")
    }
  }

  test("deleteBatch masks vectors: search == index built without them, incl. across compact") {
    val corpus = vecs(64)
    val cent = corpus.filter(col("vec_id") < 4)
    val probes = corpus.filter(col("vec_id").isin(10L, 21L, 33L))
    val deleted = corpus.filter(col("vec_id") % 5 === 2)
    def results(p: String) =
      IvfIndex.search(spark, p, probes, "vec_id", "embedding",
        k = 5, centroids = cent, nprobe = 2).orderBy("p_id", "rn").collect().toSeq
    // reference: an index that never contained the deleted vectors
    val cleanPath = tmp()
    IvfIndex.foldBatch(corpus.join(deleted.select("vec_id"), Seq("vec_id"), "left_anti"),
      "vec_id", "embedding", cent, cleanPath, overwrite = true)
    val want = results(cleanPath)
    // index with everything, then a tombstone fold
    val path = tmp()
    IvfIndex.foldBatch(corpus, "vec_id", "embedding", cent, path, overwrite = true)
    IvfIndex.deleteBatch(deleted.select("vec_id"), "vec_id", path)
    assert(results(path) == want)
    // tombstones mask LATER batches too (global-mask contract): fold a
    // batch that re-inserts two deleted ids — they must stay invisible
    IvfIndex.foldBatch(corpus.filter(col("vec_id").isin(2L, 7L)),
      "vec_id", "embedding", cent, path, overwrite = false)
    assert(results(path) == want)
    // compaction rewrites the batches but preserves the mask
    assert(graft.io.BatchedIndex.compact(spark, path,
      partitionBy = Map("cells" -> Seq("cell_id"))) == 3)
    assert(results(path) == want)
  }

  test("knnJoin equals ivfTopK row-for-row — only the exchange strategy differs") {
    val corpus = vecs(64)
    val cent = corpus.filter(col("vec_id") < 4)
    // a LARGE query slice (every 3rd vector), the shape knnJoin exists
    // for; excludeSelf matches ivfTopK's built-in self-pair filter
    val queries = corpus.filter(col("vec_id") % 3 === 0)
    for (nprobe <- Seq(1, 2)) {
      val viaBroadcast = Similarity.ivfTopK(queries, corpus, "vec_id",
          "embedding", k = 4, centroids = cent, nprobe = nprobe)
        .orderBy("p_id", "rn").collect().toSeq
      val viaShuffle = Similarity.knnJoin(queries, corpus, "vec_id",
          "embedding", k = 4, centroids = cent, nprobe = nprobe,
          excludeSelf = true)
        .orderBy("p_id", "rn").collect().toSeq
      assert(viaShuffle == viaBroadcast, s"nprobe=$nprobe")
    }
  }

  test("knnJoin keeps cross-table self-id pairs unless excludeSelf") {
    val corpus = vecs(16)
    val cent = corpus.filter(col("vec_id") < 4)
    // two "different tables" that happen to share ids: with
    // excludeSelf=false the identical-id pair must SURVIVE (cos=1 →
    // it ranks first for its own query)
    val out = Similarity.knnJoin(corpus, corpus, "vec_id", "embedding",
        k = 1, centroids = cent, nprobe = 1)
      .collect()
    assert(out.forall(r => r.getLong(0) == r.getLong(2)),
      "rank-1 neighbour of a vector present in both tables must be itself")
  }

  test("search reads only the probed cell partitions") {
    val corpus = vecs(64)
    val cent = corpus.filter(col("vec_id") < 4)
    val path = tmp()
    IvfIndex.build(corpus, "vec_id", "embedding", cent, path)
    // all 4 cells are non-empty on disk
    val cellDirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("cell_id=")).map(_.getName).toSet
    assert(cellDirs.size == 4, s"expected 4 cell partitions, got $cellDirs")

    // one probe → one (nprobe=1) cell; the scan must carry a partition
    // filter on cell_id, and the planned scan must touch exactly the
    // files of that single cell directory
    val probe = corpus.filter(col("vec_id") === 10L)
    val res = IvfIndex.search(spark, path, probe, "vec_id", "embedding",
      k = 3, centroids = cent)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*cell_id[^\\]]*\\].*"),
      s"no cell_id partition filter in plan:\n$plan")

    // executedPlan is the AQE wrapper (childless until execution), so
    // pull the scan node from the pre-adaptive physical plan
    val scans = res.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val indexScans = scans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains(path.split('/').last)))
    assert(indexScans.nonEmpty, "no file scan over the index path found")
    val filesPlanned = indexScans.map(_.relation.location
      .listFiles(indexScans.head.partitionFilters, Nil)
      .map(_.files.size).sum).sum
    val filesInOneCell = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("cell_id="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).min
    val filesTotal = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("cell_id="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
    assert(filesPlanned < filesTotal,
      s"scan planned all $filesTotal index files — no pruning happened")
    assert(filesPlanned >= filesInOneCell)
  }

  test("SQ search with a corpus-covering rerank pool degenerates to the exact search") {
    // rerankK ≥ |corpus| ⇒ stage 1 keeps every in-cell candidate, so
    // the exact rerank must reproduce ivfTopK row-for-row — the same
    // degeneration contract sqTopK pins against cosineTopK
    val corpus = vecs(64)
    val cent = corpus.filter(col("vec_id") < 4)
    val probes = corpus.filter(col("vec_id").isin(10L, 21L, 33L))
    val path = tmp()
    IvfIndex.build(corpus, "vec_id", "embedding", cent, path)
    for (nprobe <- Seq(1, 2)) {
      val live = Similarity.ivfTopK(probes, corpus, "vec_id", "embedding",
          k = 5, centroids = cent, nprobe = nprobe)
        .orderBy("p_id", "rn").collect().toSeq
      val sq = IvfIndex.searchSq(spark, path, probes, "vec_id", "embedding",
          k = 5, rerankK = 64, centroids = cent, nprobe = nprobe)
        .orderBy("p_id", "rn").collect().toSeq
      assert(sq == live, s"nprobe=$nprobe")
    }
  }

  test("SQ search prunes partitions in BOTH stages and column-prunes each scan") {
    val corpus = vecs(64)
    val cent = corpus.filter(col("vec_id") < 4)
    val path = tmp()
    IvfIndex.build(corpus, "vec_id", "embedding", cent, path)
    val probe = corpus.filter(col("vec_id") === 10L)
    val res = IvfIndex.searchSq(spark, path, probe, "vec_id", "embedding",
      k = 3, rerankK = 8, centroids = cent)
    val scans = res.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val indexScans = scans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains(path.split('/').last)))
    assert(indexScans.size == 2,
      s"expected the stage-1 code scan and the rerank vector scan, got ${indexScans.size}")
    val filesTotal = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("cell_id="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
    indexScans.foreach { s =>
      // the broadcast cell_id join also injects a DynamicPruningSubquery,
      // which is unevaluable at planning time — the STATIC isin filter
      // alone must already prune (runtime pruning only narrows further)
      val static = s.partitionFilters.filterNot(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
      assert(static.nonEmpty, s"no static cell_id partition filter on scan:\n$s")
      val planned = s.relation.location.listFiles(static, Nil)
        .map(_.files.size).sum
      assert(planned < filesTotal,
        s"index scan planned all $filesTotal files — no pruning:\n$s")
    }
    // the bytes story: stage 1 reads codes, not floats; rerank reads
    // floats, not codes — each scan's required schema must prune the
    // other representation
    val schemas = indexScans.map(_.requiredSchema.fieldNames.toSet)
    assert(schemas.exists(s => s.contains("qv") && !s.contains("embedding")),
      s"no code-only scan (stage 1 would read float vectors too): $schemas")
    assert(schemas.exists(s => s.contains("embedding") && !s.contains("qv")),
      s"no float-only scan (rerank would read codes too): $schemas")
  }

  test("PQ search degenerates to exact with a full pool and reads only the code column in stage 1") {
    val corpus = vecs(64)
    val cent = corpus.filter(col("vec_id") < 4)
    val probes = corpus.filter(col("vec_id").isin(10L, 21L, 33L))
    val cb = Similarity.pqCodebook(2, 4, 4) // 2 subspaces over 8 dims
    val path = tmp()
    IvfIndex.build(corpus, "vec_id", "embedding", cent, path, pqCb = Some(cb))
    // rerankK ≥ |corpus| ⇒ the ADC stage keeps every in-cell
    // candidate, so the exact rerank must reproduce ivfTopK
    // row-for-row (and an out-of-range code would null the ADC score
    // and break this equality — the same implicit range proof as
    // AnnRecallSpec's flat-PQ law)
    for (nprobe <- Seq(1, 2)) {
      val live = Similarity.ivfTopK(probes, corpus, "vec_id", "embedding",
          k = 5, centroids = cent, nprobe = nprobe)
        .orderBy("p_id", "rn").collect().toSeq
      val pq = IvfIndex.searchPq(spark, path, probes, "vec_id", "embedding",
          k = 5, rerankK = 64, centroids = cent, cb = cb, nprobe = nprobe)
        .orderBy("p_id", "rn").collect().toSeq
      assert(pq == live, s"nprobe=$nprobe")
    }
    // the bytes story: stage 1 reads the m-byte codes only — neither
    // the float vectors nor the int8 SQ codes ride along
    val res = IvfIndex.searchPq(spark, path,
      corpus.filter(col("vec_id") === 10L), "vec_id", "embedding",
      k = 3, rerankK = 8, centroids = cent, cb = cb)
    val schemas = res.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths
          .exists(_.toString.contains(path.split('/').last)) =>
        f.requiredSchema.fieldNames.toSet
    }
    assert(schemas.exists(s =>
      s.contains("pqc") && !s.contains("embedding") && !s.contains("qv")),
      s"no code-only stage-1 scan: $schemas")
    assert(schemas.exists(s => s.contains("embedding") && !s.contains("pqc")),
      s"no float-only rerank scan: $schemas")
  }

  test("incremental fold-in equals the one-shot build and still prunes per batch") {
    val corpus = vecs(64)
    val cent = corpus.filter(col("vec_id") < 4)
    val probes = corpus.filter(col("vec_id").isin(10L, 21L, 33L))
    val path = tmp()
    graft.io.BatchedIndex // two committed batches through the manifest
    IvfIndex.foldBatch(corpus.filter(col("vec_id") < 40), "vec_id", "embedding",
      cent, path, overwrite = true)
    IvfIndex.foldBatch(corpus.filter(col("vec_id") >= 40), "vec_id", "embedding",
      cent, path, overwrite = false)
    for (nprobe <- Seq(1, 2)) {
      val live = Similarity.ivfTopK(probes, corpus, "vec_id", "embedding",
          k = 5, centroids = cent, nprobe = nprobe)
        .orderBy("p_id", "rn").collect().toSeq
      val incr = IvfIndex.search(spark, path, probes, "vec_id", "embedding",
          k = 5, centroids = cent, nprobe = nprobe)
        .orderBy("p_id", "rn").collect().toSeq
      assert(incr == live, s"nprobe=$nprobe")
      val sq = IvfIndex.searchSq(spark, path, probes, "vec_id", "embedding",
          k = 5, rerankK = 64, centroids = cent, nprobe = nprobe)
        .orderBy("p_id", "rn").collect().toSeq
      assert(sq == live, s"searchSq nprobe=$nprobe")
    }

    // pruning must hold WITHIN each committed batch dir: one probe →
    // one cell, so the scan plans strictly fewer files than the total
    // across both batches' cell partitions
    val res = IvfIndex.search(spark, path,
      corpus.filter(col("vec_id") === 10L), "vec_id", "embedding",
      k = 3, centroids = cent)
    val scans = res.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val indexScans = scans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains(path.split('/').last)))
    assert(indexScans.nonEmpty, "no file scan over the incremental index found")
    val batchDirs = new java.io.File(s"$path/cells").listFiles()
      .filter(_.getName.startsWith("batch="))
    assert(batchDirs.length == 2)
    val filesTotal = batchDirs.flatMap(_.listFiles())
      .filter(_.getName.startsWith("cell_id="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
    indexScans.foreach { s =>
      val static = s.partitionFilters.filterNot(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
      assert(static.nonEmpty, s"no static cell_id partition filter on scan:\n$s")
      val planned = s.relation.location.listFiles(static, Nil)
        .map(_.files.size).sum
      assert(planned < filesTotal,
        s"scan planned all $filesTotal files across batches — no pruning")
    }
  }

  test("filtered search over one index equals plain search over the filtered corpus") {
    // cell assignment is per-vector, so predicate-at-search over the
    // full index must equal building a second index from the
    // pre-filtered corpus and searching it plain — the invariant that
    // makes ONE index serve every metadata slice
    val corpus = vecs(64).withColumn("label", (col("vec_id") % 3).cast("int"))
    val cent = corpus.filter(col("vec_id") < 4)
    val probes = corpus.filter(col("vec_id").isin(10L, 21L, 33L))
    val full = tmp()
    IvfIndex.build(corpus, "vec_id", "embedding", cent, full,
      keep = Seq("label"))
    val sliced = tmp()
    IvfIndex.build(corpus.filter(col("label") === 1), "vec_id", "embedding",
      cent, sliced)
    val filtered = IvfIndex.search(spark, full, probes, "vec_id", "embedding",
        k = 5, centroids = cent, candidateFilter = Some(col("label") === 1))
      .orderBy("p_id", "rn").collect().toSeq
    val want = IvfIndex.search(spark, sliced, probes, "vec_id", "embedding",
        k = 5, centroids = cent)
      .orderBy("p_id", "rn").collect().toSeq
    assert(filtered == want)
    assert(filtered.nonEmpty)
  }

  test("filtered search pushes the predicate into the partition-pruned scan") {
    // the doc contract of metadata-filtered ANN: the candidateFilter
    // lands on the index scan as an ordinary pushable parquet DATA
    // filter, alongside (not instead of) the static cell_id partition
    // filter — a filtered search reads only the probed cells, and of
    // those only the row groups the predicate survives
    val corpus = vecs(64).withColumn("label", (col("vec_id") % 3).cast("int"))
    val cent = corpus.filter(col("vec_id") < 4)
    val path = tmp()
    IvfIndex.build(corpus, "vec_id", "embedding", cent, path,
      keep = Seq("label"))
    val probe = corpus.filter(col("vec_id") === 10L)
    val res = IvfIndex.search(spark, path, probe, "vec_id", "embedding",
      k = 3, centroids = cent, candidateFilter = Some(col("label") === 1))
    val scans = res.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val indexScans = scans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains(path.split('/').last)))
    assert(indexScans.nonEmpty, "no file scan over the index path found")
    val s = indexScans.head
    assert(s.partitionFilters.exists(_.toString.contains("cell_id")),
      s"no static cell_id partition filter: ${s.partitionFilters}")
    assert(s.metadata.get("PushedFilters").exists(_.contains("label")),
      s"label predicate not pushed to the parquet scan: ${s.metadata.get("PushedFilters")}")
  }

  test("empty probe set returns an empty, well-typed frame") {
    val corpus = vecs(16)
    val cent = corpus.filter(col("vec_id") < 4)
    val path = tmp()
    IvfIndex.build(corpus, "vec_id", "embedding", cent, path)
    val res = IvfIndex.search(spark, path,
      corpus.filter(col("vec_id") < 0), "vec_id", "embedding",
      k = 3, centroids = cent)
    assert(res.columns.toSeq == Seq("p_id", "rn", "vec_id", "cos_e7"))
    assert(res.count() == 0)
  }

  test("oversized probe frame trips the driver-side valve with the contract message") {
    val corpus = vecs(16)
    val cent = corpus.filter(col("vec_id") < 4)
    val path = tmp()
    IvfIndex.build(corpus, "vec_id", "embedding", cent, path)
    // 3 probes x nprobe=2 = 6 probe-cell rows; valve at 4 must refuse
    val probes = corpus.filter(col("vec_id").isin(10L, 11L, 12L))
    sys.props("graft.ivf.maxProbeCellRows") = "4"
    try {
      val e = intercept[IllegalArgumentException] {
        IvfIndex.search(spark, path, probes, "vec_id", "embedding",
          k = 3, centroids = cent, nprobe = 2).collect()
      }
      assert(e.getMessage.contains("probe frame exceeds"), e.getMessage)
    } finally sys.props -= "graft.ivf.maxProbeCellRows"
    // same call under the default valve succeeds
    assert(IvfIndex.search(spark, path, probes, "vec_id", "embedding",
      k = 3, centroids = cent, nprobe = 2).count() > 0)
  }

  test("builtFor keys the memoized artifact by build params, not name alone") {
    val corpus = vecs(32).withColumn("lang", lit("en"))
    val cent = corpus.filter(col("vec_id") < 4)
    // the ADVICE-flagged hazard: same key string, diverging keep params
    // must build SEPARATE artifacts instead of serving whichever built
    // first; identical params must memoize to the same path
    val plain = IvfIndex.builtFor("spec_params", corpus, "vec_id", "embedding", cent)
    val kept = IvfIndex.builtFor("spec_params", corpus, "vec_id", "embedding", cent,
      keep = Seq("lang"))
    assert(plain != kept, "diverging keep params must not share an artifact")
    assert(IvfIndex.builtFor("spec_params", corpus, "vec_id", "embedding", cent) == plain)
    assert(IvfIndex.builtFor("spec_params", corpus, "vec_id", "embedding", cent,
      keep = Seq("lang")) == kept)
    // and the artifacts really differ: only the kept one stores lang
    assert(!spark.read.parquet(plain).columns.contains("lang"))
    assert(spark.read.parquet(kept).columns.contains("lang"))
  }
}
