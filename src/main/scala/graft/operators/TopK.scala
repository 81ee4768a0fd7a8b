package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a real aggregate, not a window.
  *
  * The naive shape — `row_number() OVER (PARTITION BY p_id ORDER BY
  * score DESC)` then `rn <= k` — shuffles EVERY probe×candidate row
  * into |probes| window partitions and sorts them there; with 10
  * probes and a 100 TB corpus that is 10 tasks each sorting the
  * world. This aggregator instead keeps a k-bounded sorted buffer,
  * so Spark plans it as partial aggregation: each scan partition
  * pre-reduces to ≤ k rows per probe BEFORE the exchange, and the
  * shuffle carries ≤ |partitions|×|probes|×k buffer rows instead of
  * probe×corpus. Merge is associative and commutative; ties break by
  * lowest candidate id, so the result is deterministic regardless of
  * partitioning — identical to what the window produced.
  */
object TopK {

  /** Input row: one scored candidate. */
  case class Scored(candId: Long, score: Double)

  /** Aggregation buffer/output: parallel arrays sorted by
    * (score desc, id asc) with `n` filled slots. As a BUFFER the
    * arrays are preallocated at capacity k and mutated in place
    * (`Aggregator.reduce`/`merge` explicitly permit mutate-and-return)
    * — zero allocation per accepted candidate. The previous
    * copy-on-insert version allocated two fresh arrays per accepted
    * row: ~2×k×8 bytes of garbage per insert on hot ANN paths.
    * Measured (TopKSpec micro-bench, k=50, 2M rows, ascending scores
    * so every row inserts): in-place ~55 ms vs copy-on-insert
    * ~316 ms. `finish` trims to exact length, so output consumers see
    * tight arrays.
    */
  case class Buf(var n: Int, ids: Array[Long], scores: Array[Double])

  class TopKAgg(k: Int) extends Aggregator[Scored, Buf, Buf] {
    require(k > 0, s"top-k needs k > 0, got $k")

    override def zero: Buf = Buf(0, new Array[Long](k), new Array[Double](k))

    /** Total order over (score desc, id asc). NaN never reaches here:
      * [[TopK.perGroup]] filters NaN scores with the nulls (NaN > x
      * and x > NaN are both false, so it would otherwise sort
      * insertion-order-dependently and break determinism).
      */
    private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 > s2 || (s1 == s2 && i1 < i2)

    /** In-place sorted insert; the tail element falls off at capacity. */
    private def insert(b: Buf, id: Long, s: Double): Unit = {
      val n = b.n
      if (n < k || beats(s, id, b.scores(n - 1), b.ids(n - 1))) {
        var i = 0
        while (i < n && beats(b.scores(i), b.ids(i), s, id)) i += 1
        val moved = math.min(n, k - 1) - i
        if (moved > 0) {
          System.arraycopy(b.ids, i, b.ids, i + 1, moved)
          System.arraycopy(b.scores, i, b.scores, i + 1, moved)
        }
        b.ids(i) = id
        b.scores(i) = s
        b.n = math.min(n + 1, k)
      }
    }

    override def reduce(b: Buf, a: Scored): Buf = { insert(b, a.candId, a.score); b }

    override def merge(x: Buf, y: Buf): Buf = {
      var i = 0
      while (i < y.n) { insert(x, y.ids(i), y.scores(i)); i += 1 }
      x
    }

    override def finish(b: Buf): Buf =
      Buf(b.n, java.util.Arrays.copyOf(b.ids, b.n),
        java.util.Arrays.copyOf(b.scores, b.n))
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** Collapse `scored(groupCol, candCol: long, scoreCol: double)` to
    * the per-group top-k as rows `(groupCol, rn, candCol, scoreCol)`
    * with rn 1-based in (score desc, id asc) order.
    *
    * Contract: `candCol` must be an integral column (the buffer keys
    * on Long — checked here so a string-keyed caller gets a clear
    * error, not an encoder cast failure); rows with a NULL or NaN
    * score, or a NULL id, are EXCLUDED from the ranking. A null/NaN
    * score means "no similarity defined" — e.g. `cosine_sim` of a
    * zero-norm vector — and must neither crash the non-nullable
    * aggregation buffer (null) nor break the total order that makes
    * the result partitioning-independent (NaN is unordered under >).
    * Callers' oracles must mirror the exclusion (the v1/v2/v4/v5/v6
    * DuckDB oracles rank over the same non-null cosine domain).
    */
  def perGroup(scored: DataFrame, groupCol: String, candCol: String,
               scoreCol: String, k: Int): DataFrame = {
    val idType = scored.schema(candCol).dataType
    require(idType == LongType || idType == IntegerType || idType == ShortType,
      s"TopK.perGroup keys on integral ids; $candCol is $idType " +
        "(map string ids to a surrogate long first)")
    val agg = udaf(new TopKAgg(k), Encoders.product[Scored])
    scored.filter(col(candCol).isNotNull && col(scoreCol).isNotNull &&
        !isnan(col(scoreCol)))
      .groupBy(groupCol)
      .agg(agg(col(candCol), col(scoreCol)).as("tk"))
      .select(col(groupCol), posexplode(col("tk.ids")).as(Seq("pos", candCol)),
        col("tk.scores").as("_tk_scores"))
      .select(col(groupCol), (col("pos") + 1).as("rn"), col(candCol),
        element_at(col("_tk_scores"), col("pos") + 1).as(scoreCol))
  }
}
