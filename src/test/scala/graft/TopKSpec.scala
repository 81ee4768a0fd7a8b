package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TopK

/** The bounded top-k aggregator must agree EXACTLY with the
  * row_number-window formulation it replaces (same rows, same rank
  * order, same tie-breaks) while keeping its buffer capped at k —
  * that equivalence is what lets the v1/v2/v4 oracles stay unchanged
  * when the plan shape moved from window to partial aggregation.
  */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic pseudo-random scores with deliberate duplicates
    * (g % 7 collides scores inside a group to exercise id tie-break).
    */
  private def scored(n: Int, groups: Int) =
    (0 until n).map { i =>
      val g = i % groups
      (g.toLong, i.toLong, (((i * 37 + g * 11) % 19) / 19.0))
    }.toDF("p_id", "cand_id", "cos_raw")
      // spread over many partitions so partial buffers genuinely merge
      .repartition(7)

  private def windowTopK(k: Int, n: Int, groups: Int) = {
    val w = Window.partitionBy("p_id").orderBy(col("cos_raw").desc, col("cand_id"))
    scored(n, groups)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("p_id", "rn", "cand_id", "cos_raw")
  }

  test("perGroup matches the row_number window exactly, incl. score ties") {
    val got = TopK.perGroup(scored(500, 9), "p_id", "cand_id", "cos_raw", k = 5)
      .orderBy("p_id", "rn").collect().toSeq
    val want = windowTopK(5, 500, 9).orderBy("p_id", "rn").collect().toSeq
    assert(got == want)
  }

  test("groups smaller than k emit all their rows, ranked") {
    val got = TopK.perGroup(scored(6, 3), "p_id", "cand_id", "cos_raw", k = 10)
      .orderBy("p_id", "rn").collect().toSeq
    val want = windowTopK(10, 6, 3).orderBy("p_id", "rn").collect().toSeq
    assert(got == want)
    assert(got.size == 6)
  }

  test("merge is order-independent: any partitioning gives the same result") {
    val base = scored(300, 4)
    val a = TopK.perGroup(base.repartition(1), "p_id", "cand_id", "cos_raw", 7)
      .orderBy("p_id", "rn").collect().toSeq
    val b = TopK.perGroup(base.repartition(13), "p_id", "cand_id", "cos_raw", 7)
      .orderBy("p_id", "rn").collect().toSeq
    assert(a == b)
  }

  test("aggregator buffer never exceeds k and stays (score desc, id asc) sorted") {
    val agg = new TopK.TopKAgg(3)
    var buf = agg.zero
    val items = Seq((5L, 0.9), (1L, 0.3), (2L, 0.9), (9L, 0.1), (7L, 0.95), (3L, 0.9))
    items.foreach { case (id, s) => buf = agg.reduce(buf, TopK.Scored(id, s)) }
    assert(buf.ids.length == 3)
    assert(buf.ids.toSeq == Seq(7L, 2L, 3L)) // 0.95, then 0.9 ties → lowest ids first
    assert(buf.scores.toSeq == Seq(0.95, 0.9, 0.9))
    // merging a buffer with better rows displaces the tail
    val other = agg.reduce(agg.zero, TopK.Scored(4L, 0.97))
    val merged = agg.merge(buf, other)
    assert(merged.ids.toSeq == Seq(4L, 7L, 2L))
  }

  test("null scores and null ids are excluded, not crashed on") {
    // cosine_sim legitimately yields null (zero-norm vectors); the
    // non-nullable aggregation buffer must never see those rows
    val df = Seq(
      (1L, Some(10L), Some(0.9)),
      (1L, Some(11L), None),
      (1L, None, Some(0.8)),
      (1L, Some(12L), Some(0.7))
    ).toDF("p_id", "cand_id", "cos_raw")
    val got = TopK.perGroup(df, "p_id", "cand_id", "cos_raw", k = 5)
      .orderBy("rn").select("cand_id").as[Long].collect().toSeq
    assert(got == Seq(10L, 12L))
  }

  test("NaN scores are excluded like nulls, keeping results partition-independent") {
    // NaN is unordered under > : an underfull buffer would accept it,
    // a full one reject it, making output depend on partitioning
    val df = Seq(
      (1L, 10L, 0.9),
      (1L, 11L, Double.NaN),
      (1L, 12L, 0.7)
    ).toDF("p_id", "cand_id", "cos_raw")
    for (parts <- Seq(1, 5)) {
      val got = TopK.perGroup(df.repartition(parts), "p_id", "cand_id", "cos_raw", k = 5)
        .orderBy("rn").select("cand_id").as[Long].collect().toSeq
      assert(got == Seq(10L, 12L), s"parts=$parts")
    }
  }

  test("in-place insert beats copy-on-insert on allocation (micro-bench)") {
    // the pre-round-5 insert allocated two fresh k-arrays per accepted
    // candidate; keep that shape here as the reference and require the
    // in-place version to at least match it on a hot loop
    final case class OldBuf(ids: Array[Long], scores: Array[Double])
    def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 > s2 || (s1 == s2 && i1 < i2)
    def oldInsert(b: OldBuf, id: Long, s: Double, k: Int): OldBuf = {
      val n = b.ids.length
      if (n == k && !beats(s, id, b.scores(n - 1), b.ids(n - 1))) b
      else {
        var i = 0
        while (i < n && beats(b.scores(i), b.ids(i), s, id)) i += 1
        val m = math.min(n + 1, k)
        val ids = new Array[Long](m); val ss = new Array[Double](m)
        System.arraycopy(b.ids, 0, ids, 0, i)
        System.arraycopy(b.scores, 0, ss, 0, i)
        ids(i) = id; ss(i) = s
        val rest = m - i - 1
        if (rest > 0) {
          System.arraycopy(b.ids, i, ids, i + 1, rest)
          System.arraycopy(b.scores, i, ss, i + 1, rest)
        }
        OldBuf(ids, ss)
      }
    }
    val k = 50; val rows = 2000000
    // ascending scores: EVERY row beats the current tail and inserts —
    // the allocation-heavy worst case (random scores mostly take the
    // allocation-free reject path in both variants)
    def score(i: Int): Double = i.toDouble
    def timeNs(f: => Unit): Long = { val t = System.nanoTime(); f; System.nanoTime() - t }
    // warm both paths, then measure
    val agg = new TopK.TopKAgg(k)
    def runNew(): TopK.Buf = {
      val b = agg.zero
      var i = 0
      while (i < rows) { agg.reduce(b, TopK.Scored(i.toLong, score(i))); i += 1 }
      b
    }
    def runOld(): OldBuf = {
      var b = OldBuf(Array.emptyLongArray, Array.emptyDoubleArray)
      var i = 0
      while (i < rows) { b = oldInsert(b, i.toLong, score(i), k); i += 1 }
      b
    }
    runNew(); runOld()
    var bNew: TopK.Buf = null; var bOld: OldBuf = null
    val tNew = timeNs { bNew = runNew() }; val tOld = timeNs { bOld = runOld() }
    // both shapes must keep the identical ranked contents — that is
    // the assertion; timing is informational only (single unwarmed
    // runs flake on a loaded machine, so no wall-clock bound)
    assert(bNew.n == k)
    assert(bNew.ids.take(bNew.n).toSeq == bOld.ids.toSeq)
    assert(bNew.scores.take(bNew.n).toSeq == bOld.scores.toSeq)
    info(f"in-place ${tNew / 1e6}%.1f ms vs copy-on-insert ${tOld / 1e6}%.1f ms for $rows rows, k=$k")
  }

  test("string-keyed candidates fail with a clear contract error") {
    val df = Seq(("g", "a", 1.0)).toDF("p_id", "cand_id", "cos_raw")
    val err = intercept[IllegalArgumentException] {
      TopK.perGroup(df, "p_id", "cand_id", "cos_raw", k = 1)
    }
    assert(err.getMessage.contains("integral"))
  }

  test("the plan partially aggregates before the exchange (no window sort)") {
    val plan = TopK.perGroup(scored(100, 5), "p_id", "cand_id", "cos_raw", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topkagg"))
    assert(!plan.contains("Window"))
  }
}
