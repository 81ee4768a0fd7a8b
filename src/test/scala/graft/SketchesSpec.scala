package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns
import graft.operators.Sketches

/** The KMV sketch's contract: exact below k distinct values,
  * partition-order invariant always (merges are set unions of
  * bottom-k hashes), duplicate-blind, and within the standard-error
  * envelope when estimating.
  */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def estimate(values: Seq[Long], k: Int, parts: Int): Long =
    values.toDF("v").repartition(parts)
      .agg(Sketches.kmvDistinct(TextFns.hash60Col(col("v").cast("string")), k)
        .as("est"))
      .as[Long].head()

  test("exact count below k, duplicates ignored") {
    val vals = (1L to 40L) ++ (1L to 40L) ++ (1L to 10L)
    assert(estimate(vals, k = 64, parts = 3) == 40L)
  }

  test("partition count never changes the result") {
    val vals = (1L to 5000L).map(i => i % 700)
    val results = Seq(1, 4, 32).map(p => estimate(vals, k = 64, parts = p))
    assert(results.distinct.size == 1, s"partition-dependent results: $results")
  }

  test("estimate lands inside 3 standard errors of the truth") {
    val n = 2000
    val vals = (1L to n.toLong)
    val k = 64
    val est = estimate(vals, k, parts = 8)
    // se ≈ 1/sqrt(k-2); 3σ bound with a little slack for small n
    val tol = 3.0 / math.sqrt(k - 2)
    assert(math.abs(est - n).toDouble / n <= tol,
      s"estimate $est vs $n outside ±${math.round(tol * 100)}%")
  }

  test("mergeability law: rolled-up states give the same estimate as a direct sketch") {
    val k = 16
    // 500 values spread over 10 fine groups with cross-group overlap,
    // so the union's bottom-k genuinely draws from several groups
    val df = (0L until 500L).map(i => (i % 10, i % 137)).toDF("g", "v")
      .select(col("g"), TextFns.hash60Col(col("v").cast("string")).as("h"))
    val direct = df.agg(Sketches.kmvDistinct(col("h"), k).as("est"))
      .as[Long].head()
    val rolled = df.groupBy("g")
      .agg(Sketches.kmvState(col("h"), k).as("state"))
      .agg(Sketches.kmvEstimate(Sketches.kmvMergeStates(col("state"), k), k).as("est"))
      .as[Long].head()
    assert(rolled == direct,
      s"merged-state estimate $rolled must equal the direct sketch $direct")
    // and the state itself is the bottom-k of the union, not an
    // artifact of collect order
    val st = df.groupBy("g").agg(Sketches.kmvState(col("h"), k).as("state"))
      .agg(Sketches.kmvMergeStates(col("state"), k).as("m"))
      .as[Seq[Long]].head()
    assert(st == st.sorted && st.distinct == st && st.size == k)
  }

  test("insert keeps the k smallest distinct hashes in order") {
    val b = Sketches.KmvBuf(0, new Array[Long](4))
    Seq(50L, 10L, 30L, 10L, 40L, 20L, 5L).foreach(Sketches.insert(b, _, 4))
    assert(b.n == 4)
    assert(b.hs.toSeq == Seq(5L, 10L, 20L, 30L))
  }

  test("heavyHitters equals exact GROUP BY HAVING on a skewed multiset") {
    // 3 heavy keys (200/150/100 rows), 500 singleton keys
    val rows = Seq.fill(200)(7L) ++ Seq.fill(150)(13L) ++ Seq.fill(100)(99L) ++
      (1000L until 1500L)
    val df = rows.toDF("k").repartition(8)
    val got = Sketches.heavyHitters(df, "k", threshold = 100L)
      .orderBy("k").as[(Long, Long)].collect().toSeq
    assert(got == Seq((7L, 200L), (13L, 150L), (99L, 100L)))
    // threshold above the max: empty, never an error
    assert(Sketches.heavyHitters(df, "k", threshold = 1000L).count() == 0)
  }

  test("heavyHitters no-false-negative law under a TINY sketch (forced collisions)") {
    // width 2 forces nearly every key into shared counters - the
    // estimate wildly OVER-counts, yet the exact verify pass must
    // still return exactly the true heavy hitters
    val rows = (0L until 50L).flatMap(k => Seq.fill(if (k % 10 == 0) 30 else 2)(k))
    val df = rows.toDF("k").repartition(4)
    val got = Sketches.heavyHitters(df, "k", threshold = 30L, depth = 2, width = 2)
      .orderBy("k").as[(Long, Long)].collect().toSeq
    assert(got == (0L until 50L by 10).map(k => (k, 30L)))
  }

  test("heavyHitters sketch pass is map-side bounded: the candidate filter precedes the keyed exchange") {
    // parquet-backed (a local relation would let the optimizer fold
    // the candidate filter away driver-side and hide the plan shape)
    val dir = java.nio.file.Files.createTempDirectory("graft_hh").toString
    (0L until 200L).flatMap(k => Seq.fill(if (k == 5) 40 else 1)(k))
      .toDF("k").repartition(4).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val plan = Sketches.heavyHitters(df, "k", threshold = 40L)
      .queryExecution.executedPlan.toString
    // the probe plan's keyed exchange must sit ABOVE the sketch
    // candidate gate (the least(element_at(...)) filter), so only
    // candidate rows shuffle; toString prints top-down, so "below the
    // exchange" = printed after it
    val exIdx = plan.indexOf("Exchange hashpartitioning(k")
    val gateIdx = plan.indexOf("Filter (least(element_at(")
    assert(exIdx >= 0 && gateIdx > exIdx,
      s"expected the candidate gate below the keyed exchange:\n${plan.take(2000)}")
  }
}
