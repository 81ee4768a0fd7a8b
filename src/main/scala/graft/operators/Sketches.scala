package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable sketches for corpus-scale statistics.
  *
  * KMV ("k minimum values") distinct-count: keep the k SMALLEST
  * distinct 60-bit hashes of the values; if fewer than k distinct
  * hashes exist the sketch IS the exact distinct count, otherwise
  * the k-th minimum estimates the density of a uniform hash space:
  * est = (k−1)·2⁶⁰ / h₍ₖ₎ (standard error ≈ 1/√(k−2)).
  *
  * Why KMV and not HLL: Spark's `approx_count_distinct` (HLL++) is
  * not reproducible across engines, so it cannot be oracle-checked.
  * KMV is a PURE FUNCTION of the value set given the hash — the
  * DuckDB oracle replays it with a window rank over the same md5-
  * derived hashes and the same floor arithmetic, so the sketch gets
  * cell-level verification like every exact operator.
  *
  * Scale shape: the buffer is a bounded sorted array (k longs) with
  * map-side partial aggregation — each scan partition reduces to one
  * k-array before the exchange, merges are linear array merges, and
  * the shuffle carries ≤ partitions×groups×k longs. Same bounded-
  * buffer discipline as [[TopK]], specialized to bottom-k-distinct.
  */
object Sketches {

  val HashBits = 60
  private val Space = (1L << HashBits).toDouble

  final case class KmvBuf(var n: Int, hs: Array[Long])

  /** Bottom-k distinct insert: ignore duplicates, keep the k smallest
    * in ascending order (binary search + shift — the hot path is the
    * allocation-free reject for h ≥ current max).
    */
  private[graft] def insert(b: KmvBuf, h: Long, k: Int): Unit = {
    if (b.n == k && h >= b.hs(k - 1)) return
    var lo = 0; var hi = b.n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b.hs(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < b.n && b.hs(lo) == h) return // duplicate value
    val m = math.min(b.n + 1, k)
    val moved = m - lo - 1
    if (moved > 0) System.arraycopy(b.hs, lo, b.hs, lo + 1, moved)
    b.hs(lo) = h
    b.n = m
  }

  class KmvAgg(k: Int) extends Aggregator[Long, KmvBuf, Long] {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    override def zero: KmvBuf = KmvBuf(0, new Array[Long](k))
    override def reduce(b: KmvBuf, h: Long): KmvBuf = { insert(b, h, k); b }
    override def merge(x: KmvBuf, y: KmvBuf): KmvBuf = {
      var i = 0
      while (i < y.n) { insert(x, y.hs(i), k); i += 1 }
      x
    }
    /** Exact when the sketch never filled; the k-th-minimum density
      * estimate otherwise. floor keeps the output a BIGINT both here
      * and in the oracle's replay.
      */
    override def finish(b: KmvBuf): Long =
      if (b.n < k) b.n.toLong
      else math.floor((k - 1).toDouble * Space / b.hs(k - 1).toDouble).toLong
    override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column form: KMV distinct estimate of a 60-bit hash column (use
    * [[graft.functions.TextFns.hash60Col]] to hash arbitrary values).
    */
  def kmvDistinct(hashCol: Column, k: Int): Column =
    udaf(new KmvAgg(k)).apply(hashCol)

  /** Same aggregation, but FINISH returns the sketch STATE (the
    * ascending bottom-k distinct hashes) instead of the estimate —
    * the materializable form: persist per-fine-group states and roll
    * them up to any coarser grouping with [[kmvMergeStates]] +
    * [[kmvEstimate]], never rescanning the fact table. Sound because
    * the k smallest hashes of a union are a subset of each input's k
    * smallest (the KMV mergeability law, spec-pinned).
    */
  class KmvStateAgg(k: Int) extends Aggregator[Long, KmvBuf, Array[Long]] {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    override def zero: KmvBuf = KmvBuf(0, new Array[Long](k))
    override def reduce(b: KmvBuf, h: Long): KmvBuf = { insert(b, h, k); b }
    override def merge(x: KmvBuf, y: KmvBuf): KmvBuf = {
      var i = 0
      while (i < y.n) { insert(x, y.hs(i), k); i += 1 }
      x
    }
    override def finish(b: KmvBuf): Array[Long] =
      java.util.Arrays.copyOf(b.hs, b.n)
    override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  def kmvState(hashCol: Column, k: Int): Column =
    udaf(new KmvStateAgg(k)).apply(hashCol)

  /** Merge per-group sketch states up one aggregation level: bottom-k
    * of the union of the collected state arrays. Order-independent
    * (distinct + sort), so collect_list's nondeterministic order
    * cannot leak into the result — each merged group reduces to ≤ k
    * longs, so a rollup over states shuffles sketch bytes, never
    * fact rows.
    */
  def kmvMergeStates(stateCol: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    slice(array_sort(array_distinct(flatten(collect_list(stateCol)))), 1, k)
  }

  /** The estimate of a (merged) state array — identical arithmetic to
    * [[KmvAgg.finish]]: exact when the sketch never filled, else the
    * k-th-minimum density estimate, floored to BIGINT for the oracle.
    */
  def kmvEstimate(stateCol: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{DoubleType, LongType}
    when(size(stateCol) < k, size(stateCol).cast(LongType))
      .otherwise(floor(lit((k - 1).toDouble * Space)
        / element_at(stateCol, k).cast(DoubleType)).cast(LongType))
  }

  // ---------------------------------------------------------------
  // count-min-guided EXACT heavy hitters
  // ---------------------------------------------------------------

  /** Per-row count-min bucket indices: `depth` independent hashes of
    * the key (xxhash64 salted by the row index — overflow-free under
    * ANSI, identical in the sketch and probe passes by construction),
    * each folded into `[0, width)`.
    */
  private def cmBuckets(key: Column, depth: Int, width: Int): Seq[Column] = {
    import org.apache.spark.sql.functions._
    (0 until depth).map(i =>
      pmod(xxhash64(lit(i), key), lit(width.toLong)).cast("int"))
  }

  /** Count-min accumulation: the buffer is the flattened depth×width
    * counter matrix; a row increments one counter per hash row. Sums
    * are order-independent, so the sketch is a pure function of the
    * multiset — deterministic across partitionings and merges.
    */
  class CmAgg(depth: Int, width: Int)
      extends Aggregator[Seq[Int], Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](depth * width)
    override def reduce(b: Array[Long], buckets: Seq[Int]): Array[Long] = {
      var i = 0
      while (i < depth) { b(i * width + buckets(i)) += 1L; i += 1 }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** EXACT heavy hitters without a full-cardinality aggregation — the
    * two-pass count-min-guided shape a 100 TB key space needs:
    *
    *  1. '''Sketch pass''' (map-only + one tiny exchange): fold every
    *     row into a depth×width count-min matrix — partial per
    *     partition, merged by elementwise sum, so the shuffle carries
    *     `partitions × depth × width` longs (a few KB each), never a
    *     key.
    *  2. '''Probe pass''': the broadcast sketch's estimate
    *     (min over the key's depth counters) OVER-counts by
    *     construction — `est(k) >= true_count(k)` always, whatever
    *     the collisions — so `est >= threshold` is a row-local filter
    *     that can never drop a true heavy hitter. Only the surviving
    *     candidate rows enter the exact `groupBy(key).count`, and the
    *     final `count >= threshold` kills collision-borne false
    *     positives.
    *
    * The result is therefore EXACTLY
    * `GROUP BY key HAVING count >= threshold` (the g34 oracle), but
    * the keyed shuffle only ever carries candidate rows: with a
    * threshold at the heavy tail, that is the heavy keys plus a
    * collision fringe tuned by `width`, not the full key cardinality.
    * A plain groupBy at 100 TB shuffles every distinct key (billions);
    * this shuffles the few that could possibly qualify. Costs one
    * extra data pass — the classic sketch-then-verify trade.
    */
  def heavyHitters(df: org.apache.spark.sql.DataFrame, keyCol: String,
                   threshold: Long, depth: Int = 4,
                   width: Int = 2048): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(depth >= 2 && width >= 2, s"need depth/width >= 2, got $depth/$width")
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    val buckets = cmBuckets(col(keyCol), depth, width)
    val sketch: Array[Long] = df
      .select(array(buckets: _*).as("_cm_b"))
      .agg(udaf(new CmAgg(depth, width)).apply(col("_cm_b")).as("s"))
      .head().getSeq[Long](0).toArray
    val est = least(buckets.zipWithIndex.map { case (b, i) =>
      element_at(typedLit(sketch), lit(i * width + 1) + b)
    }: _*)
    df.filter(est >= lit(threshold))
      .groupBy(keyCol).count()
      .filter(col("count") >= lit(threshold))
  }
}
