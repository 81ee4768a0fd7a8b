package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized IVF index: build once, search many — the missing half
  * of [[Similarity.ivfTopK]]'s scale story. `ivfTopK` re-assigns the
  * whole corpus to cells on every call, which is right for a one-shot
  * query but wrong for a served index: at 100 TB the cell assignment
  * is the expensive pass, and a production pipeline runs it ONCE,
  * persists the result, and amortizes it over every search.
  *
  * The Spark-first design point is the LAYOUT: the index is parquet
  * `partitionBy("cell_id")`, so each IVF cell is a partition
  * DIRECTORY. Search assigns the (small) probe set to its `nprobe`
  * cells, collects that driver-bounded cell list (≤ |probes|×nprobe
  * longs — the same boundedness contract as the broadcast probe side
  * itself), and pushes `cell_id IN (...)` into the scan as a STATIC
  * partition filter: Spark plans file splits for the probed cells
  * only, so a search that probes 1/k of the cells reads ~1/k of the
  * corpus bytes — no job ever touches the rest. That pruning is
  * asserted by `IvfIndexSpec`, not assumed.
  *
  * Search semantics are bit-identical to `ivfTopK` with the same
  * codebook: probe assignment shares [[Similarity.probeCells]] and the
  * ranking shares the bounded k-heap [[TopK]] aggregate, so the
  * `v4`/`v6` DuckDB oracles verify this path too (`v8_ivf_indexed`).
  */
object IvfIndex {

  /** (id, vec, cell_id, qv) — the row an index stores per vector:
    * the float vector AND its symmetric int8 code (`qv`,
    * `array<tinyint>` — null for the zero vector, which quantized
    * search excludes), so ONE artifact serves both the exact search
    * ([[search]], which column-prunes `qv` away) and the
    * scalar-quantized two-stage search ([[searchSq]], whose stage 1
    * column-prunes the float vector away and reads ~1 byte per
    * dimension).
    */
  private def assigned(corpus: DataFrame, idCol: String, vecCol: String,
                       centroids: DataFrame, keep: Seq[String],
                       pqCb: Option[Array[Array[Array[Long]]]]): DataFrame = {
    // the stored code column is array<tinyint>; a subspace codebook
    // with > 128 rows would produce codes the non-ANSI cast silently
    // wraps/nulls, corrupting every later searchPq — fail at build time
    pqCb.foreach(cb => require(cb.forall(_.length <= 128),
      s"PQ codebook ksub=${cb.map(_.length).max} exceeds 128, the largest " +
        "code the index's tinyint storage can hold"))
    val amax = Similarity.amaxOf(col(vecCol))
    val base = Similarity.ivfAssign(corpus, idCol, vecCol, centroids, keep)
      .withColumn("qv", when(amax > 0,
        Similarity.quantize(col(vecCol), amax).cast("array<tinyint>")))
    // optional third representation: m-byte PQ codes (one tinyint per
    // subspace for ksub <= 128) — the cheapest stage-1 bytes the index
    // can serve; searches that don't use them column-prune them away
    pqCb.fold(base)(cb =>
      base.withColumn("pqc", Similarity.pqEncode(col(vecCol), cb).cast("array<tinyint>")))
  }

  /** Assign `corpus` to its nearest-centroid cells and write the
    * index in one shot: parquet partitioned by `cell_id` (one
    * directory per IVF cell). Vectors are stored once, inside their
    * cell partition; nothing else is duplicated. Re-running
    * overwrites atomically at the `path` level (dynamic partition
    * overwrite is unnecessary — an index rebuild replaces every cell
    * by construction). For continuous ingest, use [[foldBatch]]
    * instead.
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
            centroids: DataFrame, path: String,
            keep: Seq[String] = Nil,
            pqCb: Option[Array[Array[Array[Long]]]] = None): Unit =
    assigned(corpus, idCol, vecCol, centroids, keep, pqCb)
      .write.mode("overwrite").partitionBy("cell_id").parquet(path)

  /** INCREMENTAL index maintenance: assign a batch of new vectors to
    * the (fixed) codebook's cells and fold it into the served index
    * as ONE atomically-committed batch — the ANN mirror of
    * [[graft.operators.Dedup.writeMinhashIndex]]'s append path, via
    * the same [[graft.io.BatchedIndex]] manifest. Each batch is
    * hive-partitioned by `cell_id` INSIDE its batch dir, so
    * [[search]]/[[searchSq]] prune cells within every committed batch
    * exactly as on a one-shot [[build]] (spec-asserted); a writer
    * dying mid-fold leaves the index serving the old corpus. A
    * continuously-ingested embedding corpus thus keeps its served
    * index current without ever rebuilding: per-batch work is one
    * map-only assignment pass over the delta plus the fold.
    * `overwrite = true` starts the index (or rebuilds it in one
    * atomic generation switch).
    */
  def foldBatch(corpus: DataFrame, idCol: String, vecCol: String,
                centroids: DataFrame, path: String,
                overwrite: Boolean, keep: Seq[String] = Nil,
                pqCb: Option[Array[Array[Array[Long]]]] = None): Unit =
    graft.io.BatchedIndex.fold(corpus.sparkSession, path,
      Seq("cells" -> assigned(corpus, idCol, vecCol, centroids, keep, pqCb)),
      overwrite, partitionBy = Map("cells" -> Seq("cell_id")))

  /** Tombstone DELETES: fold a batch of vector ids OUT of the served
    * index — the right-to-be-forgotten / retraction half of the index
    * lifecycle ([[foldBatch]] adds, this masks). The batch commits
    * through the same single-marker manifest as an ingest fold, so a
    * delete is atomic and per-batch work scales with the delete set,
    * never the index: nothing is rewritten — every search anti-joins
    * the (typically tiny) tombstone part against the partition-pruned
    * cells, planned as a broadcast anti join while the set is small.
    * Semantics: a tombstoned id is masked across ALL batches, earlier
    * AND later — re-inserting a deleted id requires an `overwrite`
    * rebuild (which starts a new generation and drops every
    * tombstone). [[graft.io.BatchedIndex.compact]] preserves
    * tombstones; a rebuild physically reclaims the masked rows.
    * `ids` must carry `idCol`, matching the indexed id column's type.
    */
  def deleteBatch(ids: DataFrame, idCol: String, path: String): Unit = {
    val spark = ids.sparkSession
    require(graft.io.BatchedIndex.committed(spark, path).nonEmpty,
      s"no committed index under $path to delete from - build or fold first")
    graft.io.BatchedIndex.fold(spark, path,
      Seq("tombstones" -> ids.select(col(idCol).as("del_id")).distinct()),
      overwrite = false)
  }

  /** The stored index rows, whichever layout the path holds: a
    * manifest-committed incremental index ([[foldBatch]] — committed
    * batches only, one snapshot per call; [[deleteBatch]] tombstones
    * anti-joined away, so masked vectors never reach a ranking) or a
    * one-shot [[build]] directory.
    */
  private def indexFrame(spark: SparkSession, path: String,
                         idCol: String): DataFrame = {
    val ids = graft.io.BatchedIndex.committed(spark, path)
    if (ids.isEmpty) spark.read.parquet(path)
    else {
      val cellIds = graft.io.BatchedIndex.presentIds(spark, path, "cells", ids)
      require(cellIds.nonEmpty,
        s"no vector batches committed under $path - only deletes were folded")
      val cells = graft.io.BatchedIndex.read(spark, path, "cells", cellIds)
      val tombIds = graft.io.BatchedIndex.presentIds(spark, path, "tombstones", ids)
      if (tombIds.isEmpty) cells
      else cells.join(
        graft.io.BatchedIndex.read(spark, path, "tombstones", tombIds),
        col(idCol) === col("del_id"), "left_anti")
    }
  }

  /** The probe→cell assignment, materialized ONCE to the driver and
    * re-exposed as a local relation: (assignment frame, distinct cell
    * ids). Driver-bounded by contract — probes are the small broadcast
    * side of every search, so this is ≤ |probes| × nprobe rows, the
    * same boundedness as the pruning list itself. Replaces the former
    * MEMORY_AND_DISK pin of the assignment plan (its two consumers —
    * the collected pruning list and the join's broadcast side — each
    * re-ran the job unpinned), which was never unpersisted and leaked
    * one cached plan per search call in a long-lived session; a local
    * relation needs no cache and no cleanup.
    */
  /** Hard valve on the probe-side collect: probes × nprobe rows, each
    * carrying its embedding. An oversized probe frame should fail with
    * this contract message, not a driver OOM. Overridable via the
    * `graft.ivf.maxProbeCellRows` system property (read per call, so a
    * long-lived session can tune it; also what the spec uses to
    * exercise the valve without a million-row probe frame).
    */
  def maxProbeCellRows: Int =
    sys.props.get("graft.ivf.maxProbeCellRows").map(_.toInt).getOrElse(1 << 20)

  private def collectedProbeCells(probes: DataFrame, idCol: String,
                                  vecCol: String, centroids: DataFrame,
                                  nprobe: Int): (DataFrame, Seq[Long]) = {
    val pc = Similarity.probeCells(probes, idCol, vecCol, centroids, nprobe)
    // limit(max+1) bounds the collect itself; below the valve it
    // returns every row, so no second job is needed (valve read once
    // so limit and check always agree)
    val maxRows = maxProbeCellRows
    val rows = pc.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"probe frame exceeds the driver-side bound for IVF search: > " +
        s"$maxRows probe-cell rows (probes x nprobe). The probe " +
        s"side of a search is contractually the small side - reduce the " +
        s"probe batch or nprobe, or flip the join and index the probes.")
    val ci = pc.schema.fieldIndex("cell_id")
    val cells = rows.iterator.filterNot(_.isNullAt(ci)).map(_.getLong(ci))
      .toSeq.distinct
    val local = probes.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), pc.schema)
    (local, cells)
  }

  /** Top-k cosine search over a built index. Reads ONLY the cell
    * partitions the probes hash to (static partition pruning via the
    * collected probe-cell list); ranking is the same bounded k-heap
    * as [[Similarity.ivfTopK]].
    */
  def search(spark: SparkSession, path: String, probes: DataFrame,
             idCol: String, vecCol: String, k: Int, centroids: DataFrame,
             nprobe: Int = 1,
             candidateFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val (pCells, cells) = collectedProbeCells(probes, idCol, vecCol, centroids, nprobe)
    val idx = indexFrame(spark, path, idCol)
    val prunedCells =
      if (cells.isEmpty) idx.filter(lit(false))
      else idx.filter(col("cell_id").isin(cells: _*))
    // metadata-filtered ANN: the predicate lands on the partition-
    // pruned scan (an ordinary pushable parquet filter over the kept
    // metadata columns), so a filtered search still reads only the
    // probed cells — and of those, only the row groups the predicate
    // survives
    val pruned = candidateFilter.map(prunedCells.filter).getOrElse(prunedCells)
    val cos = Similarity.cosine(col("p_vec"), col(vecCol))
    Similarity.probeTopK(
      pruned.join(broadcast(pCells), Seq("cell_id"))
        .filter(col("p_id") =!= col(idCol))
        .select(col("p_id"), col(idCol), cos.as("cos_raw")),
      idCol, k)
  }

  /** RANGE search over a built index: every indexed vector with
    * cosine ≥ `minCos` of each probe — the retrieval mode behind
    * near-dup candidate generation and threshold-based dedup, where
    * "the k-th best" is the wrong contract (a probe inside a dense
    * duplicate cluster has 500 qualifying neighbours; one in sparse
    * space has none — top-k returns exactly the wrong set both
    * times). Same partition-pruned scan as [[search]] (reads only
    * the probed cells), but no k-heap: the threshold filter runs
    * inside the scan's projected join, so the output is bounded by
    * similarity mass, not a rank parameter, and NOTHING shuffles —
    * the plan is scan → broadcast-join → filter, map-only end to
    * end. Recall is the IVF contract: matches outside the probed
    * `nprobe` cells are missed, tuned exactly like top-k search.
    */
  def searchRange(spark: SparkSession, path: String, probes: DataFrame,
                  idCol: String, vecCol: String, minCos: Double,
                  centroids: DataFrame, nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val (pCells, cells) = collectedProbeCells(probes, idCol, vecCol, centroids, nprobe)
    val idx = indexFrame(spark, path, idCol)
    val pruned =
      if (cells.isEmpty) idx.filter(lit(false))
      else idx.filter(col("cell_id").isin(cells: _*))
    val cos = Similarity.cosine(col("p_vec"), col(vecCol))
    pruned.join(broadcast(pCells), Seq("cell_id"))
      .filter(col("p_id") =!= col(idCol))
      .select(col("p_id"), col(idCol), cos.as("cos_raw"))
      .filter(col("cos_raw") >= minCos)
      .select(col("p_id"), col(idCol),
        floor(col("cos_raw") * 1e7)
          .cast(org.apache.spark.sql.types.LongType).as("cos_e7"))
  }

  /** Scalar-quantized two-stage top-k over a built index — the
    * composition of [[Similarity.sqTopK]]'s memory story with this
    * index's partition pruning: the production ANN shape. Stage 1
    * ranks by cosine over the stored int8 codes of the PROBED CELLS
    * ONLY (partition-pruned like [[search]], and column-pruned to the
    * code column — the scan reads ~1/nCells of the corpus at ~1 byte
    * per dimension) and keeps a bounded `rerankK` pool per probe via
    * the shared k-heap aggregate. Stage 2 re-scores only that pool
    * with exact float cosine, reading the float vectors from the same
    * pruned cells (the pool is a subset of them by construction).
    * Both stages are floor arithmetic, so the composed search is
    * oracle-checkable (`v10_sq_indexed`). Probes with a zero vector
    * are excluded exactly as in [[Similarity.sqTopK]].
    */
  def searchSq(spark: SparkSession, path: String, probes: DataFrame,
               idCol: String, vecCol: String, k: Int, rerankK: Int,
               centroids: DataFrame, nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    require(rerankK >= k, s"rerankK=$rerankK must be >= k=$k")
    val (pCells, cells) = collectedProbeCells(probes, idCol, vecCol, centroids, nprobe)
    val idx = indexFrame(spark, path, idCol)
    val pruned =
      if (cells.isEmpty) idx.filter(lit(false))
      else idx.filter(col("cell_id").isin(cells: _*))
    val pq = pCells
      .withColumn("amax", Similarity.amaxOf(col("p_vec")))
      .filter(col("amax") > 0)
      .select(col("cell_id"), col("p_id"),
        Similarity.quantize(col("p_vec"), col("amax")).as("p_qv"))
    val stage1 = pruned.filter(col("qv").isNotNull)
      .join(broadcast(pq), Seq("cell_id"))
      .filter(col("p_id") =!= col(idCol))
      .select(col("p_id"), col(idCol),
        Similarity.cosine(col("p_qv"), col("qv").cast("array<double>")).as("cos_raw"))
    val pool = TopK.perGroup(stage1, "p_id", idCol, "cos_raw", rerankK)
      .select(col("p_id"), col(idCol))
    val exact = pruned.select(col(idCol), col(vecCol))
      .join(broadcast(pool), Seq(idCol))
      .join(broadcast(probes.select(col(idCol).as("p_id"), col(vecCol).as("p_vec"))),
        Seq("p_id"))
      .select(col("p_id"), col(idCol),
        Similarity.cosine(col("p_vec"), col(vecCol)).as("cos_raw"))
    Similarity.probeTopK(exact, idCol, k)
  }

  /** Product-quantized two-stage top-k over a built index that stores
    * PQ codes (`build` with `pqCb`) — IVF-PQ, the highest-compression
    * production ANN shape: stage 1 reads ONLY the probed cell
    * partitions (static partition pruning, as [[search]]) and ONLY the
    * m-byte code column (column pruning — m bytes/vector versus dims
    * bytes for [[searchSq]]'s int8 codes), ranks by the asymmetric
    * distance against the literal-lookup reconstruction
    * ([[Similarity.pqTopK]]'s stage 1), and keeps a bounded `rerankK`
    * pool; stage 2 re-scores only the pool with exact float cosine
    * from the same pruned cells. Encode/lookup/fold are order-stable
    * arithmetic, so the composed search is oracle-checkable
    * (`v16_pq_indexed`). The same `cb` must be passed at build and
    * search time — it is a driver-bounded constant, like the
    * centroids.
    */
  def searchPq(spark: SparkSession, path: String, probes: DataFrame,
               idCol: String, vecCol: String, k: Int, rerankK: Int,
               centroids: DataFrame, cb: Array[Array[Array[Long]]],
               nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    require(rerankK >= k, s"rerankK=$rerankK must be >= k=$k")
    val (pCells, cells) = collectedProbeCells(probes, idCol, vecCol, centroids, nprobe)
    val idx = indexFrame(spark, path, idCol)
    val pruned =
      if (cells.isEmpty) idx.filter(lit(false))
      else idx.filter(col("cell_id").isin(cells: _*))
    val stage1 = pruned.filter(col("pqc").isNotNull)
      .join(broadcast(pCells), Seq("cell_id"))
      .filter(col("p_id") =!= col(idCol))
      .select(col("p_id"), col(idCol),
        Similarity.dot(col("p_vec"),
          Similarity.pqReconstruct(col("pqc").cast("array<int>"), cb)).as("adc"))
    val pool = TopK.perGroup(stage1, "p_id", idCol, "adc", rerankK)
      .select(col("p_id"), col(idCol))
    val exact = pruned.select(col(idCol), col(vecCol))
      .join(broadcast(pool), Seq(idCol))
      .join(broadcast(probes.select(col(idCol).as("p_id"), col(vecCol).as("p_vec"))),
        Seq("p_id"))
      .select(col("p_id"), col(idCol),
        Similarity.cosine(col("p_vec"), col(vecCol)).as("cos_raw"))
    Similarity.probeTopK(exact, idCol, k)
  }

  /** Build-once memo for repeated same-process searches; see
    * [[graft.engine.TempArtifacts]] for the identity/lifecycle
    * contract. The build PARAMETERS (kept metadata columns, PQ
    * codebook) are folded into the memo key, so two call sites
    * sharing a name but diverging in params build separate artifacts
    * instead of silently serving whichever built first — callers that
    * want ONE shared artifact (v8/v10/v14/v16) share it by passing
    * identical params, not by racing.
    */
  def builtFor(key: String, corpus: DataFrame, idCol: String, vecCol: String,
               centroids: DataFrame, keep: Seq[String] = Nil,
               pqCb: Option[Array[Array[Array[Long]]]] = None): String = {
    // structural hash (nested arrays hash by identity, Seqs by value)
    val paramsKey = (keep, pqCb.map(_.map(_.map(_.toSeq).toSeq).toSeq)).hashCode()
    graft.engine.TempArtifacts.getOrBuild(s"$key@$paramsKey", "graft_ivf_index") { path =>
      build(corpus, idCol, vecCol, centroids, path, keep, pqCb)
    }
  }

  /** Serving-ops stats straight off the stored index: per-cell LIVE
    * occupancy (tombstones masked), id range, and the e6 share of the
    * corpus each cell holds — the dashboard that tells an operator
    * whether the codebook still fits the data (one hot cell = every
    * probe of it scans that fraction of the corpus; many near-empty
    * cells = wasted pruning). Column-prunes to (cell_id, id): the
    * float/int8/PQ representations never load, so the stats pass
    * reads a few bytes per vector no matter the dimensionality. The
    * share ratio is integral (·1e6 div total) so the row is
    * replayable cell-for-cell; the global window runs over ≤ the
    * codebook size, not the corpus.
    */
  def cellStats(spark: SparkSession, path: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    indexFrame(spark, path, idCol)
      .select(col("cell_id").cast("long").as("cell_id"), col(idCol))
      .groupBy("cell_id")
      .agg(count(lit(1)).as("n_vecs"),
        min(idCol).as("min_id"), max(idCol).as("max_id"))
      .withColumn("share_e6",
        call_function("div", col("n_vecs") * 1000000L, sum("n_vecs").over(w)))
  }
}
