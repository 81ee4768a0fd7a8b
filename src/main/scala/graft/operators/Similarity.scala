package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding similarity search for the LLM-data-pipeline surface:
  * brute-force cosine top-k as the exact baseline, and
  * sign-random-projection (SRP) LSH bucketing as the scale path.
  *
  * Numeric determinism contract (what makes these oracle-checkable):
  * every reduction over an embedding is a SEQUENTIAL LEFT FOLD in
  * array order (`aggregate` in Spark ≡ `list_reduce` in DuckDB), so
  * both engines execute the identical IEEE-754 double op sequence and
  * produce bit-identical cosines. Floats are widened to double before
  * any multiply.
  *
  * Scale notes: brute-force is a broadcast of the (small) probe set
  * against a linear scan of the corpus — no shuffle of the corpus at
  * all; per-probe top-k is a BOUNDED aggregation ([[TopK]]): each
  * scan partition pre-reduces to a k-heap per probe, so only
  * ≤ partitions×probes×k buffer rows ever shuffle. SRP-LSH replaces
  * the linear scan with a bucket-equality join: each vector hashes
  * to a `planes`-bit bucket, probes only meet their bucket (recall
  * is tuned by plane count / multi-probe, not by scan size).
  */
object Similarity {

  /** Dot product of two array<float|double> columns as an
    * order-stable double fold.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v))

  /** Cosine via the native codegen'd expression
    * ([[graft.expressions.CosineSimilarity]]); bit-identical to
    * `dot(a, b) / (l2norm(a) * l2norm(b))` but one fused loop inside
    * whole-stage codegen instead of interpreted HOF lambdas.
    */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.CosineSimilarity(a, b)

  /** max |x_i| of an embedding — the symmetric int8 quantization
    * scale. Zero for the all-zero vector, which every quantized path
    * therefore excludes (its cosine is undefined anyway).
    */
  private[operators] def amaxOf(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast(DoubleType))))

  /** Symmetric int8 code array: q_i = floor(x_i·127/amax + 0.5).
    * Elements are kept double-typed for in-flight compute (cosine_sim
    * takes float|double arrays); cast the array to `array<tinyint>`
    * where the 1-byte-at-rest representation is the point
    * ([[IvfIndex.build]]). Floor arithmetic — identical in any
    * engine, so quantized stages stay oracle-checkable.
    */
  private[operators] def quantize(vec: Column, amax: Column): Column =
    transform(vec, x =>
      floor(x.cast(DoubleType) * lit(127.0) / amax + lit(0.5)).cast(DoubleType))

  /** Scored (p_id, idCol, cos_raw) frame → per-probe bounded top-k
    * via [[TopK]]: partial k-heaps reduce each scan partition to ≤ k
    * rows per probe BEFORE the exchange, so the shuffle carries
    * ≤ |partitions|×|probes|×k rows instead of probe×corpus (the
    * row_number-window shape this replaces sorted the whole corpus
    * inside |probes| window partitions — a 100 TB non-starter).
    *
    * Null/NaN contract: [[TopK.perGroup]] excludes null- and
    * NaN-scored rows. The v1/v2/v4/v5/v6 DuckDB oracles rank the same
    * domain (testdata embeddings have no zero-norm vectors, so no row
    * is ever excluded on either side); a corpus with zero-norm
    * vectors would drop those candidates rather than rank them.
    */
  private[operators] def probeTopK(scored: DataFrame, idCol: String, k: Int): DataFrame =
    TopK.perGroup(scored, "p_id", idCol, "cos_raw", k)
      .select(col("p_id"), col("rn"), col(idCol),
        floor(col("cos_raw") * 1e7).cast(LongType).as("cos_e7"))

  /** Exact top-k cosine neighbours for each probe vector.
    * @param probes     (idCol, vecCol) — small; broadcast
    * @param candidates (idCol, vecCol) — the corpus; scanned once
    */
  def cosineTopK(probes: DataFrame, candidates: DataFrame,
                 idCol: String, vecCol: String, k: Int): DataFrame = {
    val p = probes.select(col(idCol).as("p_id"), col(vecCol).as("p_vec"))
    val cos = cosine(col("p_vec"), col(vecCol))
    probeTopK(
      candidates.crossJoin(broadcast(p))
        .filter(col("p_id") =!= col(idCol))
        .select(col("p_id"), col(idCol), cos.as("cos_raw")),
      idCol, k)
  }

  /** Deterministic SRP hyperplanes: integer weights in [-1000, 1000]
    * derived from md5("p_j") — data-independent, identical in any
    * engine, computed once on the driver and embedded as literals
    * (never per-row hashing; at 100 TB the planes are a broadcast
    * constant).
    */
  def srpPlanes(planes: Int, dims: Int): Array[Array[Long]] =
    Array.tabulate(planes, dims) { (p, j) =>
      val md = MessageDigest.getInstance("MD5")
        .digest(s"${p}_$j".getBytes(StandardCharsets.UTF_8))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2001 - 1000
    }

  /** Bucket id column: bit p set iff plane_p · vec > 0. */
  def srpBucket(vec: Column, planes: Array[Array[Long]]): Column =
    planes.zipWithIndex.map { case (w, p) =>
      val wLit = typedlit(w.toSeq)
      when(dot(wLit, vec) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Above this codebook size the assignment argmax falls back from
    * embedded literals to the crossJoin+aggregate shape: a plan with
    * thousands of k×dims literal arrays stops fitting whole-stage
    * codegen's method budget. 256×64 doubles is comfortably inside it.
    */
  val maxLiteralCentroids = 256

  /** Assign every vector to its nearest centroid by cosine (ties →
    * lowest centroid id): the IVF cell assignment.
    *
    * Centroids are a BOUNDED driver artifact (k×dims — same contract
    * as [[srpPlanes]] and the [[trainIvfCentroids]] codebook), so for
    * codebooks up to [[maxLiteralCentroids]] the argmax is computed
    * per ROW: each centroid becomes a literal `struct(cos, -cell_id)`
    * candidate and `array_max` picks the best — a MAP-ONLY stage
    * inside whole-stage codegen. The corpus never shuffles for
    * assignment (the previous `crossJoin → max(struct) groupBy` shape
    * still exchanged one row per corpus vector — a full-corpus
    * shuffle at 100 TB for per-row work). Tie-break is unchanged:
    * struct ordering compares cosine desc then -cell_id, i.e. lowest
    * cell wins ties.
    *
    * Codebooks larger than [[maxLiteralCentroids]] keep the
    * crossJoin + map-side-partial `max(struct)` aggregate (shuffle =
    * one row per vector, never ×|centroids|).
    */
  def ivfAssign(vectors: DataFrame, idCol: String, vecCol: String,
                centroids: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    // bounded probe collect: limit(max+1) either returns the COMPLETE
    // codebook (≤ max rows — safe to embed as literals) or proves it
    // is oversized without ever materializing a large codebook on the
    // driver (the fallback path below only broadcasts it)
    val cents = centroids
      .select(col(idCol).cast(LongType), col(vecCol).cast("array<double>"))
      .limit(maxLiteralCentroids + 1)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    require(cents.nonEmpty, "ivfAssign needs at least one centroid")
    if (cents.length <= maxLiteralCentroids) {
      val cands = array(cents.map { case (cid, cv) =>
        struct(cosine(col(vecCol), typedlit(cv)).as("c_cos"),
          lit(-cid).as("neg_cell"))
      }: _*)
      vectors.select(col(idCol) +: col(vecCol) +: keep.map(col) :+
        (-array_max(cands).getField("neg_cell")).as("cell_id"): _*)
    } else {
      val c = centroids.select(col(idCol).cast(LongType).as("cell_id"),
        col(vecCol).as("c_vec"))
      vectors.crossJoin(broadcast(c))
        .select(col(idCol), struct(
            cosine(col(vecCol), col("c_vec")).as("c_cos") +:
            (-col("cell_id")).as("neg_cell") +:
            col(vecCol).as("vec") +: keep.map(col): _*).as("cand"))
        .groupBy(idCol)
        .agg(max(col("cand")).as("best"))
        .select(col(idCol) +: col("best.vec").as(vecCol) +:
          keep.map(k => col(s"best.$k").as(k)) :+
          (-col("best.neg_cell")).as("cell_id"): _*)
    }
  }

  /** (p_id, p_vec, cell_id): each probe paired with its `nprobe`
    * nearest cells — the probe side of [[ivfTopK]] and of the
    * materialized [[IvfIndex]] search (one definition so the two
    * search paths cannot diverge on assignment or tie-break).
    * `cell_id` is LongType on both branches.
    */
  private[graft] def probeCells(probes: DataFrame, idCol: String,
                                vecCol: String, centroids: DataFrame,
                                nprobe: Int): DataFrame =
    if (nprobe == 1)
      ivfAssign(probes, idCol, vecCol, centroids)
        .select(col(idCol).as("p_id"), col(vecCol).as("p_vec"), col("cell_id"))
    else {
      // top-nprobe cells per probe via the same bounded k-heap
      // aggregate as the result ranking (score desc, id asc — the
      // identical tie-break as ivfAssign's argmax), then the probe
      // vector joins back on the small probe side only
      val c = centroids.select(col(idCol).cast(LongType).as("cell_id"),
        col(vecCol).as("c_vec"))
      val scoredCells = probes.crossJoin(broadcast(c))
        .select(col(idCol).as("p_id"), col("cell_id"),
          cosine(col(vecCol), col("c_vec")).as("c_cos"))
      TopK.perGroup(scoredCells, "p_id", "cell_id", "c_cos", nprobe)
        .join(probes.select(col(idCol).as("p_id"), col(vecCol).as("p_vec")), "p_id")
        .select(col("p_id"), col("p_vec"), col("cell_id"))
    }

  /** IVF-style ANN top-k: candidates live in exactly one centroid
    * cell; each probe searches its `nprobe` NEAREST cells (ranked by
    * centroid cosine, ties → lowest cell id). The recall story of a
    * production IVF index: nprobe=1 is the cheapest search, larger
    * nprobe trades linearly more candidate comparisons for recall —
    * and only the tiny broadcast probe side replicates ×nprobe, the
    * corpus index is untouched (same asymmetry as SRP multi-probe).
    * Centroids come from [[trainIvfCentroids]] (or any stand-in
    * codebook). With a literal-size codebook the whole corpus side is
    * SHUFFLE-FREE: map-only cell assignment ([[ivfAssign]]) feeding a
    * broadcast-hash join on cell_id, then the bounded top-k partial
    * aggregate — only ≤ partitions×probes×k heap rows ever exchange.
    */
  def ivfTopK(probes: DataFrame, candidates: DataFrame, idCol: String,
              vecCol: String, k: Int, centroids: DataFrame,
              nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val cCells = ivfAssign(candidates, idCol, vecCol, centroids)
    val pCells = probeCells(probes, idCol, vecCol, centroids, nprobe)
    val cos = cosine(col("p_vec"), col(vecCol))
    probeTopK(
      cCells.join(broadcast(pCells), Seq("cell_id"))
        .filter(col("p_id") =!= col(idCol))
        .select(col("p_id"), col(idCol), cos.as("cos_raw")),
      idCol, k)
  }

  /** Distributed KNN JOIN: the k nearest corpus neighbours for EVERY
    * query row — the batch-enrichment shape (kNN classification,
    * label propagation, corpus linking) where the query side is
    * itself a large table. [[cosineTopK]]/[[ivfTopK]] replicate a
    * broadcast probe side — right for interactive probe sets, a
    * non-starter when queries are 10^9 rows. Here NEITHER side
    * broadcasts: both sides cell-assign map-only against the bounded
    * codebook ([[ivfAssign]] literal argmax), then meet in a SHUFFLED
    * hash equi-join keyed on cell_id — the corpus exchanges once
    * keyed by cell, the query side ×nprobe — and the bounded k-heap
    * ([[probeTopK]]) partial-aggregates each query's candidates
    * before the final exchange. Result is IDENTICAL to [[ivfTopK]]
    * with the same arguments (spec-pinned law); only the exchange
    * strategy differs. The shuffle_hash hint on the query side pins
    * the plan: without it, test-scale stats (or AQE) would demote the
    * join to a broadcast of the query side — the exact plan this
    * operator exists to avoid — and at scale both sides arrive
    * hash-partitioned on cell_id, where a sort-merge's sort is wasted
    * work and the hinted build side (queries, the smaller per-cell
    * stream) is the one a shuffled hash join should map.
    *
    * `excludeSelf` drops `p_id == id` pairs — for the self-join
    * convention (query slice ⊆ corpus, ids shared); two genuinely
    * distinct tables keep every pair.
    */
  def knnJoin(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, centroids: DataFrame,
              nprobe: Int = 1, excludeSelf: Boolean = false): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val cCells = ivfAssign(corpus, idCol, vecCol, centroids)
    val pCells = probeCells(queries, idCol, vecCol, centroids, nprobe)
    val cos = cosine(col("p_vec"), col(vecCol))
    val joined = cCells.join(pCells.hint("shuffle_hash"), Seq("cell_id"))
    val paired = if (excludeSelf) joined.filter(col("p_id") =!= col(idCol))
                 else joined
    probeTopK(paired.select(col("p_id"), col(idCol), cos.as("cos_raw")),
      idCol, k)
  }

  /** Element-wise running mean over `array<double>` as a real
    * aggregate: map-side partial sums mean one (dims+1)-wide buffer
    * per (partition, group) crosses the exchange, never the member
    * vectors. Buffer mutated in place (zero allocation per row after
    * the first).
    */
  class VecMeanAgg extends org.apache.spark.sql.expressions.Aggregator[
      Array[Double], VecMeanAgg.Buf, Array[Double]] {
    import VecMeanAgg.Buf
    override def zero: Buf = Buf(0L, Array.emptyDoubleArray)
    override def reduce(b: Buf, a: Array[Double]): Buf = {
      if (b.n == 0L) { b.sum = a.clone() }
      else {
        var i = 0
        while (i < b.sum.length) { b.sum(i) += a(i); i += 1 }
      }
      b.n += 1; b
    }
    override def merge(x: Buf, y: Buf): Buf =
      if (y.n == 0L) x
      else if (x.n == 0L) y
      else {
        var i = 0
        while (i < x.sum.length) { x.sum(i) += y.sum(i); i += 1 }
        x.n += y.n; x
      }
    override def finish(b: Buf): Array[Double] =
      if (b.n == 0L) b.sum else b.sum.map(_ / b.n)
    override def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.product[Buf]
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }
  object VecMeanAgg {
    case class Buf(var n: Long, var sum: Array[Double])
  }

  /** Offline spherical-k-means codebook trainer for [[ivfTopK]].
    *
    * Lloyd iterations specialized to cosine geometry: assignment is
    * the map-only argmax of [[ivfAssign]]; the update step averages
    * the UNIT-NORMALIZED members of each cell (cosine is
    * scale-invariant, so the unnormalized mean direction is the
    * spherical-k-means maximizer of the within-cell cosine sum —
    * which makes the avg-best-cosine objective monotonically
    * non-decreasing, the property the spec pins). Seeding is
    * deterministic — the k lowest-id vectors — so training is
    * reproducible without RNG. Zero-norm vectors are excluded from
    * training (their cosine is undefined).
    *
    * Scale shape: each round is one corpus scan with a map-side
    * partial vector-sum ([[VecMeanAgg]]) — the exchange carries
    * ≤ partitions×k (dims+1)-wide buffers; the k×dims codebook itself
    * is a driver artifact (like [[srpPlanes]]) collected and
    * re-broadcast per round, bounded by k·dims, never by the corpus.
    * Empty cells keep their previous centroid.
    */
  def trainIvfCentroids(vectors: DataFrame, idCol: String, vecCol: String,
                        k: Int, iters: Int): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val unit = {
      val v = col(vecCol)
      transform(v, x => x.cast(DoubleType) / l2norm(v)).as("uv")
    }
    // every round re-scans the training set (seed job + one assign
    // job per iteration) — pin it once instead of re-reading and
    // re-filtering the source each round; training is synchronous
    // (each round collects its k×dims codebook), so the pin can be
    // dropped before returning
    val clean = vectors.filter(l2norm(col(vecCol)) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var cent: Map[Long, Array[Double]] = clean
        .orderBy(col(idCol)).limit(k)
        .select(col(idCol).cast(LongType), col(vecCol).cast("array<double>"))
        .as[(Long, Array[Double])].collect().toMap
      val vmean = udaf(new VecMeanAgg)
      for (_ <- 0 until iters) {
        val centDf = cent.toSeq.sortBy(_._1).toDF(idCol, vecCol)
        val asg = ivfAssign(clean, idCol, vecCol, centDf)
        val means = asg.select(col("cell_id"), unit)
          .groupBy("cell_id").agg(vmean(col("uv")).as("mv"))
          .as[(Long, Array[Double])].collect().toMap
        cent = cent.map { case (id, v) => id -> means.getOrElse(id, v) }
      }
      cent.toSeq.sortBy(_._1).toDF(idCol, vecCol)
    } finally clean.unpersist(blocking = false)
  }

  /** Scalar-quantized two-stage top-k: the memory-footprint half of a
    * production ANN stack. Stage 1 ranks by cosine over per-vector
    * symmetric int8 codes (q_i = floor(x_i·127/amax + 0.5) — 8× fewer
    * bytes at rest than float64, 4× than float32; at 100 TB the
    * quantized corpus IS what the scan reads) and keeps a bounded
    * `rerankK` pool per probe via the same k-heap aggregate as every
    * other search here. Stage 2 re-scores ONLY that pool with exact
    * float cosine — the pool is ≤ |probes|×rerankK ids, broadcast
    * against the corpus, so exactness costs one narrow probed join,
    * not a second full-corpus ranking. rerankK tunes recall exactly
    * like nprobe does for IVF; rerankK ≥ |corpus| degenerates to
    * [[cosineTopK]] (spec-pinned). Quantization is floor arithmetic —
    * identical in any engine, so the whole two-stage pipeline is
    * oracle-checkable. Zero vectors (amax = 0) are excluded like
    * zero-norm vectors everywhere else.
    */
  def sqTopK(probes: DataFrame, candidates: DataFrame, idCol: String,
             vecCol: String, k: Int, rerankK: Int): DataFrame = {
    require(rerankK >= k, s"rerankK=$rerankK must be >= k=$k")
    def quantized(df: DataFrame) = df
      .select(col(idCol), col(vecCol), amaxOf(col(vecCol)).as("amax"))
      .filter(col("amax") > 0)
      .select(col(idCol), quantize(col(vecCol), col("amax")).as("qv"))
    val qp = quantized(probes)
      .select(col(idCol).as("p_id"), col("qv").as("p_qv"))
    val approx = quantized(candidates).crossJoin(broadcast(qp))
      .filter(col("p_id") =!= col(idCol))
      .select(col("p_id"), col(idCol), cosine(col("p_qv"), col("qv")).as("cos_raw"))
    val pool = TopK.perGroup(approx, "p_id", idCol, "cos_raw", rerankK)
      .select(col("p_id"), col(idCol))
    val exact = candidates.select(col(idCol), col(vecCol))
      .join(broadcast(pool), Seq(idCol))
      .join(broadcast(probes.select(col(idCol).as("p_id"), col(vecCol).as("p_vec"))),
        Seq("p_id"))
      .select(col("p_id"), col(idCol), cosine(col("p_vec"), col(vecCol)).as("cos_raw"))
    probeTopK(exact, idCol, k)
  }

  /** Deterministic product-quantization codebook: `m` subspaces ×
    * `ksub` centroids × `subDims` integer weights in [-1000, 1000],
    * derived from md5 exactly like [[srpPlanes]] — data-independent,
    * identical in any engine, computed once on the driver and embedded
    * as literals. A production deployment would TRAIN per-subspace
    * centroids (k-means per subspace, as [[trainIvfCentroids]] trains
    * cells); the codebook stays hash-derived here so the oracle is a
    * pure arithmetic replay rather than a 2×m-round training
    * transcript — the encode/ADC/rerank mechanics are identical either
    * way.
    */
  def pqCodebook(m: Int, ksub: Int, subDims: Int): Array[Array[Array[Long]]] =
    Array.tabulate(m, ksub, subDims) { (s, c, j) =>
      val md = MessageDigest.getInstance("MD5")
        .digest(s"pq_${s}_${c}_$j".getBytes(StandardCharsets.UTF_8))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2001 - 1000
    }

  /** PQ code array of a vector: for each subspace, the codebook row
    * maximizing the inner product with that slice of the vector (ties
    * → lowest code, via the same struct-argmax trick as
    * [[ivfAssign]]). MAP-ONLY inside whole-stage codegen — m×ksub
    * literal dot products per row, no shuffle, no UDF.
    */
  private[operators] def pqEncode(vec: Column, cb: Array[Array[Array[Long]]]): Column = {
    val subDims = cb(0)(0).length
    array(cb.zipWithIndex.map { case (rows, s) =>
      val sub = slice(vec, s * subDims + 1, subDims)
      val cands = array(rows.zipWithIndex.map { case (w, c) =>
        struct(dot(typedlit(w.toSeq), sub).as("d"), lit(-c.toLong).as("neg_c"))
      }: _*)
      (-array_max(cands).getField("neg_c")).cast(IntegerType)
    }: _*)
  }

  /** Reconstructed (decoded) vector from a PQ code array: the
    * concatenation of the selected codebook rows — a pure literal
    * lookup per subspace, so decoding costs m `element_at`s, never a
    * join.
    */
  private[operators] def pqReconstruct(codes: Column, cb: Array[Array[Array[Long]]]): Column =
    concat(cb.zipWithIndex.map { case (rows, s) =>
      element_at(typedlit(rows.map(_.toSeq).toSeq),
        element_at(codes, s + 1) + 1)
    }: _*)

  /** Product-quantized two-stage top-k: the EXTREME-compression end of
    * the quantized-search spectrum ([[sqTopK]] is the moderate end).
    * Each corpus vector is encoded ONCE as `m` small codes (≤ 1 byte
    * each for ksub ≤ 256) — m bytes at rest versus dims bytes for
    * int8 SQ and 4·dims for float32: a 64-dim corpus scans 16× fewer
    * bytes than SQ in stage 1. Stage 1 ranks by the asymmetric
    * distance (ADC): the probe's float vector against each candidate's
    * RECONSTRUCTION `concat_s cb[s][code_s]`, whose inner product
    * equals the classic per-subspace lookup-table sum
    * `Σ_s dot(p_sub_s, cb[s][code_s])` — here computed as one fused
    * codegen'd fold, keeping a bounded `rerankK` pool per probe via
    * the same k-heap aggregate as every other search. Stage 2
    * re-scores ONLY that pool with exact float cosine (identical join
    * shape to [[sqTopK]]). Encoding, lookup, and both folds are
    * order-stable integer/double arithmetic, so the full pipeline is
    * oracle-replayable. Composing the codes into the cell-partitioned
    * [[IvfIndex]] (IVF-PQ) is the same plumbing as v10's SQ codes —
    * the code column rides `keep`.
    */
  def pqTopK(probes: DataFrame, candidates: DataFrame, idCol: String,
             vecCol: String, k: Int, rerankK: Int,
             m: Int = 4, ksub: Int = 8, dims: Int = 64): DataFrame = {
    require(rerankK >= k, s"rerankK=$rerankK must be >= k=$k")
    require(dims % m == 0, s"dims=$dims not divisible by m=$m subspaces")
    val cb = pqCodebook(m, ksub, dims / m)
    // a vector whose length ≠ dims would slice/zip into NULL ADC
    // scores, which the k-heap silently EXCLUDES — wrong results, not
    // an error. assert_true is codegen'd and returns null when the
    // check passes, so the filter keeps every valid row and the scan
    // FAILS (never drops) on the first mismatched vector.
    def dimsChecked(df: DataFrame): DataFrame = df.filter(
      assert_true(size(col(vecCol)) === dims,
        lit(s"pqTopK: $vecCol length != dims=$dims")).isNull)
    val codes = dimsChecked(candidates)
      .select(col(idCol), pqEncode(col(vecCol), cb).as("codes"))
    val p = dimsChecked(probes)
      .select(col(idCol).as("p_id"), col(vecCol).as("p_vec"))
    val approx = codes.crossJoin(broadcast(p))
      .filter(col("p_id") =!= col(idCol))
      .select(col("p_id"), col(idCol),
        dot(col("p_vec"), pqReconstruct(col("codes"), cb)).as("adc"))
    val pool = TopK.perGroup(approx, "p_id", idCol, "adc", rerankK)
      .select(col("p_id"), col(idCol))
    val exact = candidates.select(col(idCol), col(vecCol))
      .join(broadcast(pool), Seq(idCol))
      .join(broadcast(p), Seq("p_id"))
      .select(col("p_id"), col(idCol), cosine(col("p_vec"), col(vecCol)).as("cos_raw"))
    probeTopK(exact, idCol, k)
  }

  /** Embedding-cosine near-duplicate pairs: SRP-bucketed self-join —
    * vectors meet only within their bucket (sign agreement on every
    * plane ⇒ small angle is likely), candidates verified by the exact
    * fold cosine ≥ `minCos`. The all-pairs O(n²) comparison never
    * happens; shuffle key is the bucket id. Recall tunes with plane
    * count (fewer planes = bigger buckets = higher recall/cost).
    *
    * `maxBucket` is the same skew valve as the text-LSH caps
    * ([[Dedup.minhashLshPairs]]): duplicated documents embed
    * IDENTICALLY, so an embedding corpus has hot buckets for exactly
    * the same reason a text corpus does, and one such bucket makes
    * the self-join quadratic. Oversized buckets emit no pairs; their
    * members are the exact-dup groupBy's job.
    */
  def cosineNearDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
                         minCos: Double, nPlanes: Int, dims: Int,
                         maxBucket: Int = 100000): DataFrame = {
    require(maxBucket >= 2, s"maxBucket must allow pairs, got $maxBucket")
    val planes = srpPlanes(nPlanes, dims)
    val b = vectors.select(col(idCol), col(vecCol),
      srpBucket(col(vecCol), planes).as("bucket"))
    val okBuckets = b.groupBy("bucket")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") <= maxBucket)
      .select("bucket")
    val bounded = b.join(okBuckets, Seq("bucket"))
    val cos = cosine(col(s"a.$vecCol"), col(s"b.$vecCol"))
    bounded.as("a").join(bounded.as("b"), Seq("bucket"))
      .filter(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        floor(cos * 1e7).cast(LongType).as("cos_e7"))
      .filter(col("cos_e7") >= (minCos * 1e7).toLong)
  }

  /** Persist the SRP near-dup artifacts for
    * [[incrementalCosineNearDupPairs]]: `vecs` = (id, vec, bucket)
    * and `bucket_counts` = (bucket, n) pre-aggregated over this batch
    * — the embedding mirror of [[Dedup.writeMinhashIndex]], for
    * continuously-ingested embedding corpora (each new batch compares
    * against all accumulated history without re-hashing old vectors,
    * and the skew valve sums a |buckets|-row counts table instead of
    * re-aggregating the corpus). All parts publish as ONE batch via
    * [[graft.io.BatchedIndex]], so a writer dying mid-fold leaves the
    * index exactly as it was.
    */
  def writeSrpIndex(vectors: DataFrame, idCol: String, vecCol: String,
                    path: String, nPlanes: Int, dims: Int,
                    overwrite: Boolean = true): Unit = {
    val planes = srpPlanes(nPlanes, dims)
    val b = vectors.select(col(idCol), col(vecCol),
        srpBucket(col(vecCol), planes).as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      graft.io.BatchedIndex.fold(vectors.sparkSession, path, Seq(
        "vecs" -> b,
        "bucket_counts" -> b.groupBy("bucket").agg(count(lit(1)).as("n"))
      ), overwrite)
    } finally b.unpersist(blocking = false)
  }

  /** Embedding near-dup pairs of a NEW batch against an indexed
    * corpus ([[writeSrpIndex]]) — the incremental form of
    * [[cosineNearDupPairs]] and the embedding mirror of
    * [[Dedup.incrementalLshPairs]]. Returns every verified pair with
    * at least one member in `newVecs` (new↔old and new↔new); old↔old
    * pairs were resolved when the index was built, so candidate work
    * scales with |delta| × bucket width, never |corpus|². The skew
    * valve merges the index's pre-aggregated `bucket_counts` with the
    * delta's own counts — a bucket that grew oversized across batches
    * stops emitting pairs exactly as in the full recompute. One
    * manifest resolution covers both part reads (single consistent
    * snapshot).
    *
    * Equivalence contract (spec-pinned): identical output to
    * `cosineNearDupPairs(old ∪ new)` filtered to delta-touching
    * pairs. The exact-cosine verification rides the bucket join (the
    * fold cosine is bit-symmetric, so orientation never changes the
    * score).
    */
  def incrementalCosineNearDupPairs(newVecs: DataFrame, idCol: String,
                                    vecCol: String, indexPath: String,
                                    minCos: Double, nPlanes: Int, dims: Int,
                                    maxBucket: Int = 100000): DataFrame = {
    require(maxBucket >= 2, s"maxBucket must allow pairs, got $maxBucket")
    val spark = newVecs.sparkSession
    val planes = srpPlanes(nPlanes, dims)
    val newB = newVecs.select(col(idCol), col(vecCol),
      srpBucket(col(vecCol), planes).as("bucket"))
    val snap = graft.io.BatchedIndex.committed(spark, indexPath)
    val allVecs = graft.io.BatchedIndex.read(spark, indexPath, "vecs", snap)
      .unionByName(newB)
    val okBuckets = graft.io.BatchedIndex.read(spark, indexPath, "bucket_counts", snap)
      .unionByName(newB.groupBy("bucket").agg(count(lit(1)).as("n")))
      .groupBy("bucket").agg(sum("n").as("bucket_n"))
      .filter(col("bucket_n") <= maxBucket)
      .select("bucket")
    val bounded = allVecs.join(okBuckets, Seq("bucket"))
    val newBounded = newB.join(okBuckets, Seq("bucket"))
    val cos = cosine(col(s"a.$vecCol"), col(s"b.$vecCol"))
    // (anything in the bucket) × (delta member): old↔old never forms;
    // a new↔new pair forms twice (once per orientation) with a
    // bit-identical score, so the distinct collapses it
    bounded.as("a").join(newBounded.as("b"), Seq("bucket"))
      .filter(col(s"a.$idCol") =!= col(s"b.$idCol"))
      .select(least(col(s"a.$idCol"), col(s"b.$idCol")).as("id_a"),
        greatest(col(s"a.$idCol"), col(s"b.$idCol")).as("id_b"),
        floor(cos * 1e7).cast(LongType).as("cos_e7"))
      .distinct()
      .filter(col("cos_e7") >= (minCos * 1e7).toLong)
  }

  /** Online ingest embedding near-dup probe: flag each incoming
    * vector against the indexed corpus ([[writeSrpIndex]]) — the
    * embedding mirror of [[Dedup.streamNearDupProbe]] and the
    * streaming half of [[incrementalCosineNearDupPairs]]. Works on a
    * BATCH or a STREAMING frame unchanged: every stage is a stateless
    * map plus ONE stream-static bucket join against the index —
    * because each vector lives in exactly one SRP bucket, a (probe,
    * index) pair can form at most once, so unlike the multi-band text
    * probe this needs no dedup state at all (the whole plan is
    * stateless; streaming state is zero on continuous ingest).
    * Returns (id, matched_id, cos_e7) — one row per verified
    * (incoming, indexed) near-dup pair.
    *
    * Intentionally does NOT pair stream vectors with each other (that
    * is the batch fold-in's job — run [[writeSrpIndex]] append +
    * [[incrementalCosineNearDupPairs]] per resolved micro-batch); the
    * bucket cap is therefore evaluated on the INDEX buckets alone,
    * which are known at index-build time.
    */
  def streamCosineNearDupProbe(stream: DataFrame, idCol: String,
                               vecCol: String, indexPath: String,
                               minCos: Double, nPlanes: Int, dims: Int,
                               maxBucket: Int = 100000): DataFrame = {
    require(maxBucket >= 2, s"maxBucket must allow pairs, got $maxBucket")
    val spark = stream.sparkSession
    val planes = srpPlanes(nPlanes, dims)
    val probes = stream.select(col(idCol), col(vecCol),
      srpBucket(col(vecCol), planes).as("bucket"))
    // one manifest resolution for both part reads — a single
    // consistent index snapshot for the whole probe plan
    val snap = graft.io.BatchedIndex.committed(spark, indexPath)
    val okBuckets = graft.io.BatchedIndex.read(spark, indexPath, "bucket_counts", snap)
      .groupBy("bucket").agg(sum("n").as("bucket_n"))
      .filter(col("bucket_n") <= maxBucket)
      .select("bucket")
    val bounded = graft.io.BatchedIndex.read(spark, indexPath, "vecs", snap)
      .join(okBuckets, Seq("bucket"))
      .select(col("bucket"), col(idCol).as("matched_id"), col(vecCol).as("m_vec"))
    probes.join(bounded, Seq("bucket"))
      .filter(col(idCol) =!= col("matched_id"))
      .select(col(idCol), col("matched_id"),
        floor(cosine(col(vecCol), col("m_vec")) * 1e7).cast(LongType).as("cos_e7"))
      .filter(col("cos_e7") >= (minCos * 1e7).toLong)
  }

  /** Approximate top-k: probes meet only candidates in their SRP
    * bucket. Fewer planes → bigger buckets → higher recall and cost.
    */
  def srpAnnTopK(probes: DataFrame, candidates: DataFrame,
                 idCol: String, vecCol: String, k: Int,
                 nPlanes: Int, dims: Int): DataFrame = {
    val planes = srpPlanes(nPlanes, dims)
    val p = probes
      .select(col(idCol).as("p_id"), col(vecCol).as("p_vec"),
        srpBucket(col(vecCol), planes).as("bucket"))
    val c = candidates
      .select(col(idCol), col(vecCol), srpBucket(col(vecCol), planes).as("bucket"))
    val cos = cosine(col("p_vec"), col(vecCol))
    probeTopK(
      c.join(broadcast(p), Seq("bucket"))
        .filter(col("p_id") =!= col(idCol))
        .select(col("p_id"), col(idCol), cos.as("cos_raw")),
      idCol, k)
  }

  /** Multi-probe SRP ANN top-k: each probe searches its own bucket
    * PLUS the `nPlanes` single-bit-flip neighbour buckets — the
    * standard multi-probe LSH recall upgrade (a near neighbour that
    * disagrees on exactly one hyperplane sign still gets found)
    * WITHOUT growing the corpus index: candidates stay single-bucket;
    * only the tiny broadcast probe side replicates ×(nPlanes+1). The
    * shuffle story is identical to [[srpAnnTopK]] — bucket-equality
    * join + bounded top-k aggregation, never a corpus scan per probe.
    */
  def srpMultiProbeTopK(probes: DataFrame, candidates: DataFrame,
                        idCol: String, vecCol: String, k: Int,
                        nPlanes: Int, dims: Int): DataFrame = {
    val planes = srpPlanes(nPlanes, dims)
    // masks: identity + one per flipped plane; distinct masks give
    // distinct probe buckets, so no (probe, candidate) pair repeats
    val masks = typedlit((0L +: (0 until nPlanes).map(p => 1L << p)).toSeq)
    val p = probes
      .select(col(idCol).as("p_id"), col(vecCol).as("p_vec"),
        srpBucket(col(vecCol), planes).as("b0"))
      .select(col("p_id"), col("p_vec"),
        explode(transform(masks, m => col("b0").bitwiseXOR(m))).as("bucket"))
    val c = candidates
      .select(col(idCol), col(vecCol), srpBucket(col(vecCol), planes).as("bucket"))
    val cos = cosine(col("p_vec"), col(vecCol))
    probeTopK(
      c.join(broadcast(p), Seq("bucket"))
        .filter(col("p_id") =!= col(idCol))
        .select(col("p_id"), col(idCol), cos.as("cos_raw")),
      idCol, k)
  }
}
