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
    * (score desc, id asc), length ≤ k.
    */
  case class Buf(ids: Array[Long], scores: Array[Double])

  class TopKAgg(k: Int) extends Aggregator[Scored, Buf, Buf] {
    require(k > 0, s"top-k needs k > 0, got $k")

    override def zero: Buf = Buf(Array.emptyLongArray, Array.emptyDoubleArray)

    private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 > s2 || (s1 == s2 && i1 < i2)

    private def insert(b: Buf, id: Long, s: Double): Buf = {
      val n = b.ids.length
      if (n == k && !beats(s, id, b.scores(n - 1), b.ids(n - 1))) b
      else {
        var i = 0
        while (i < n && beats(b.scores(i), b.ids(i), s, id)) i += 1
        val m = math.min(n + 1, k)
        val ids = new Array[Long](m)
        val ss = new Array[Double](m)
        System.arraycopy(b.ids, 0, ids, 0, i)
        System.arraycopy(b.scores, 0, ss, 0, i)
        ids(i) = id
        ss(i) = s
        val rest = m - i - 1
        if (rest > 0) {
          System.arraycopy(b.ids, i, ids, i + 1, rest)
          System.arraycopy(b.scores, i, ss, i + 1, rest)
        }
        Buf(ids, ss)
      }
    }

    override def reduce(b: Buf, a: Scored): Buf = insert(b, a.candId, a.score)

    override def merge(x: Buf, y: Buf): Buf = {
      var b = x
      var i = 0
      while (i < y.ids.length) { b = insert(b, y.ids(i), y.scores(i)); i += 1 }
      b
    }

    override def finish(b: Buf): Buf = b
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** Collapse `scored(groupCol, candCol: long, scoreCol: double)` to
    * the per-group top-k as rows `(groupCol, rn, candCol, scoreCol)`
    * with rn 1-based in (score desc, id asc) order.
    *
    * Contract: `candCol` must be an integral column (the buffer keys
    * on Long — checked here so a string-keyed caller gets a clear
    * error, not an encoder cast failure); rows with a NULL id or
    * score are EXCLUDED from the ranking (a null score means "no
    * similarity defined" — e.g. `cosine_sim` of a zero-norm vector —
    * and must not crash the non-nullable aggregation buffer).
    */
  def perGroup(scored: DataFrame, groupCol: String, candCol: String,
               scoreCol: String, k: Int): DataFrame = {
    val idType = scored.schema(candCol).dataType
    require(idType == LongType || idType == IntegerType || idType == ShortType,
      s"TopK.perGroup keys on integral ids; $candCol is $idType " +
        "(map string ids to a surrogate long first)")
    val agg = udaf(new TopKAgg(k), Encoders.product[Scored])
    scored.filter(col(candCol).isNotNull && col(scoreCol).isNotNull)
      .groupBy(groupCol)
      .agg(agg(col(candCol), col(scoreCol)).as("tk"))
      .select(col(groupCol), posexplode(col("tk.ids")).as(Seq("pos", candCol)),
        col("tk.scores").as("_tk_scores"))
      .select(col(groupCol), (col("pos") + 1).as("rn"), col(candCol),
        element_at(col("_tk_scores"), col("pos") + 1).as(scoreCol))
  }
}
