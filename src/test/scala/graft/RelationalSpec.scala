package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Unit coverage for the relational operator library (SURVEY.md §2
  * A1/A2, F5/F7/F9/F12/F15, P9) — fixtures pin the pandas-derived
  * semantics the oracle queries can't isolate (per-dtype fill, split
  * column sets, null arms).
  */
class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("unionByName aligns by name and null-fills missing columns (A1, LAT:241)") {
    val a = Seq((1L, "x")).toDF("id", "only_a")
    val b = Seq((2L, 9.5)).toDF("id", "only_b")
    val u = Relational.unionByName(Seq(a, b)).orderBy("id")
    assert(u.columns.toSeq == Seq("id", "only_a", "only_b"))
    val rows = u.collect()
    assert(rows(0).getString(1) == "x" && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).getDouble(2) == 9.5)
  }

  test("topK returns the k smallest/largest under the given ordering (A2)") {
    val df = (1L to 100L).toDF("n")
    val top = Relational.topK(df, 3, col("n").desc).as[Long].collect().toSeq
    assert(top == Seq(100L, 99L, 98L))
  }

  test("lengthCap: null→'', within-cap kept, over-cap→'' (F5, LAT:116)") {
    val df = Seq(Option("short"), Option("x" * 51), None).toDF("s")
    val out = df.select(Relational.lengthCap(col("s"), 50)).as[String].collect().toSeq
    assert(out == Seq("short", "", ""))
  }

  test("surrogateKey concatenates stringified columns (F7, LAT:200-201)") {
    val df = Seq((7L, 3L, "2024-01-01")).toDF("a", "b", "d")
    val sk = df.select(Relational.surrogateKey(col("a"), col("b"), col("d")))
      .as[String].head()
    assert(sk == "732024-01-01")
  }

  test("dropNullKeys drops rows with any null key, keeps others (P9, LAT:184)") {
    val df = Seq((Option(1L), Option("k"), "keep"),
                 (Option.empty[Long], Option("k"), "dropA"),
                 (Option(3L), Option.empty[String], "dropB"))
      .toDF("k1", "k2", "v")
    val kept = Relational.dropNullKeys(df, Seq("k1", "k2")).select("v").as[String].collect()
    assert(kept.toSeq == Seq("keep"))
  }

  test("fillAll fills numerics with 0 and strings with \"0\", leaves others (F12, SER:63)") {
    val df = Seq(
      (Option(1.5), Option("a"), Option(true)),
      (Option.empty[Double], Option.empty[String], Option.empty[Boolean]))
      .toDF("num", "str", "flag")
    val filled = Relational.fillAll(df).orderBy(desc("num")).collect()
    assert(filled(1).getDouble(0) == 0.0)
    assert(filled(1).getString(1) == "0")
    assert(filled(1).isNullAt(2)) // booleans are not a pandas fillna(0) target we mimic
  }

  test("splitColumns projects two disjoint column sets covering the frame (F15, LAT:170-179)") {
    val df = Seq((1L, "a", 2.0, true)).toDF("w", "x", "y", "z")
    val (first, rest) = Relational.splitColumns(df, Seq("y", "w"))
    assert(first.columns.toSeq == Seq("y", "w"))
    assert(rest.columns.toSeq == Seq("x", "z"))
  }

  test("saltedJoin equals the plain join even when the salt source column is null") {
    val big = Seq((Option(1L), Option(10L)), (Option(1L), Option.empty[Long]),
      (Option(2L), Option(30L)), (Option.empty[Long], Option(40L)))
      .toDF("k", "salt_src")
    val dim = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
    val plain = big.join(dim, Seq("k"), "left")
      .select("k", "salt_src", "name").collect().map(_.toString).sorted.toSeq
    val salted = Relational.saltedJoin(big, dim, Seq("k"), "left",
        nSalts = 4, saltFrom = col("salt_src"))
      .select("k", "salt_src", "name").collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
  }

  test("rangeJoin equals the naive inequality join, including bucket-boundary cases") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // bucketSeconds = 100: ranges that sit inside one bucket, span a
    // boundary, cover several buckets, and touch points exactly at
    // their inclusive endpoints
    val points = Seq((1L, ts(50)), (2L, ts(100)), (3L, ts(199)),
      (4L, ts(250)), (5L, ts(999))).toDF("p_id", "p_ts")
    val ranges = Seq(
      (10L, ts(40), ts(60)),    // single bucket
      (11L, ts(90), ts(110)),   // spans the 100 boundary
      (12L, ts(50), ts(260)),   // covers three buckets
      (13L, ts(100), ts(199)),  // inclusive endpoints hit points 2 and 3
      (14L, ts(300), ts(400))   // matches nothing
    ).toDF("r_id", "r_start", "r_end")
    val naive = points.join(ranges,
        col("p_ts") >= col("r_start") && col("p_ts") <= col("r_end"))
      .select("p_id", "r_id").as[(Long, Long)].collect().sorted.toSeq
    val bucketed = Relational.rangeJoin(points, "p_ts", ranges,
        "r_start", "r_end", bucketSeconds = 100L)
      .select("p_id", "r_id").as[(Long, Long)].collect().sorted.toSeq
    assert(bucketed == naive)
    assert(naive.contains((2L, 13L)) && naive.contains((3L, 13L)),
      "inclusive endpoints must match")
    // no pair is emitted twice even when a range covers many buckets
    assert(bucketed.distinct == bucketed)
  }

  test("intervalOverlapJoin equals the naive overlap join, one row per pair") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // bucketSeconds = 100: pairs that share one bucket, SEVERAL
    // buckets (the dedup case the point join never hits), touch only
    // at an endpoint, and overlap only across a bucket boundary
    val left = Seq(
      (1L, ts(10), ts(50)),     // inside bucket 0
      (2L, ts(90), ts(310)),    // spans buckets 0-3
      (3L, ts(200), ts(200)),   // degenerate instant
      (4L, ts(500), ts(600))    // far right
    ).toDF("l_id", "l_start", "l_end")
    val right = Seq(
      (10L, ts(50), ts(95)),    // touches 1 at its endpoint, overlaps 2
      (11L, ts(100), ts(320)),  // shares buckets 1-3 with 2 → must emit ONCE
      (12L, ts(200), ts(210)),  // contains 3's instant
      (13L, ts(601), ts(700))   // gap of 1s to 4 — no overlap
    ).toDF("r_id", "r_start", "r_end")
    val naive = left.join(right,
        col("l_start") <= col("r_end") && col("r_start") <= col("l_end"))
      .select("l_id", "r_id").as[(Long, Long)].collect().sorted.toSeq
    val bucketed = Relational.intervalOverlapJoin(left, "l_start", "l_end",
        right, "r_start", "r_end", bucketSeconds = 100L)
      .select("l_id", "r_id").as[(Long, Long)].collect().sorted.toSeq
    assert(bucketed == naive)
    assert(naive.contains((1L, 10L)), "endpoint-touching intervals must overlap")
    assert(naive.contains((2L, 11L)) && bucketed.count(_ == (2L, 11L)) == 1,
      "a multi-bucket pair must emit exactly once")
    assert(!naive.contains((4L, 13L)), "1s gap must not match")
  }

  test("asofJoin attaches the latest right value at-or-before each left ts, null when none") {
    val clicks = Seq((1L, 100L, 10L), (1L, 250L, 11L), (2L, 50L, 12L))
      .toDF("user_id", "ts", "click_id")
    val views = Seq((1L, 90L, 900L), (1L, 100L, 901L), (1L, 200L, 902L), (2L, 60L, 903L))
      .toDF("user_id", "ts", "view_id")
    val out = Relational.asofJoin(clicks, views, Seq("user_id"), "ts", "view_id")
      .select("click_id", "view_id").as[(Long, Option[Long])].collect().toMap
    // click@100 matches the simultaneous view 901 (>= semantics, tie →
    // right-before-left then highest id); click@250 matches view@200;
    // user 2's click@50 precedes every view → null
    assert(out == Map(10L -> Some(901L), 11L -> Some(902L), 12L -> None))
  }

  test("asofJoin tolerance: a gap exactly AT the bound survives, past it the match drops (never substitutes)") {
    val clicks = Seq((1L, 1000000L, 10L), (1L, 2000001L, 11L), (1L, 3000000L, 12L))
      .toDF("user_id", "us", "click_id")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val views = Seq((1L, 0L, 900L), (1L, 1000001L, 901L))
      .toDF("user_id", "us", "view_id")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    // tolerance = 1s: click@1.0s → view@0, gap EXACTLY the bound →
    // survives; click@2.000001s → view@1.000001s, gap exactly the
    // bound → survives; click@3.0s → same view, gap 1.999999s →
    // DROPS (not substituted by the even-older view@0)
    val out = Relational.asofJoin(clicks, views, Seq("user_id"), "ts", "view_id",
        toleranceMicros = Some(1000000L))
      .select("click_id", "view_id").as[(Long, Option[Long])].collect().toMap
    assert(out == Map(10L -> Some(900L), 11L -> Some(901L), 12L -> None))
  }

  test("asofJoin tolerance measures the gap to the MATCHED row when a newer right row carries a null value") {
    // view@0 (id 900) is the match (null values are skipped by the
    // ignoreNulls last()); the null-valued view@900000 must NOT
    // advance the tolerance clock — pre-fix the gap was measured to
    // it (100ms, inside the bound) instead of to view@0 (1.0s+1µs,
    // past the bound), wrongly keeping a too-old match
    val clicks = Seq((1L, 1000001L, 10L))
      .toDF("user_id", "us", "click_id")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val views = Seq((1L, 0L, Some(900L)), (1L, 900000L, None))
      .toDF("user_id", "us", "view_id")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val out = Relational.asofJoin(clicks, views, Seq("user_id"), "ts", "view_id",
        toleranceMicros = Some(1000000L))
      .select("click_id", "view_id").as[(Long, Option[Long])].collect().toMap
    assert(out == Map(10L -> None),
      "match older than the bound must drop even behind a null-valued right row")
  }

  test("parseTimestamps converts ISO strings with offsets to UTC-naive instants (F9)") {
    val df = Seq(("2024-03-01T12:00:00-04:00", "2024-03-01T00:00:00")).toDF("a", "b")
    val out = Relational.parseTimestamps(df, Seq("a", "b"))
    val r = out.select(date_format(col("a"), "yyyy-MM-dd HH:mm:ss"),
      date_format(col("b"), "yyyy-MM-dd HH:mm:ss")).as[(String, String)].head()
    assert(r == ("2024-03-01 16:00:00", "2024-03-01 00:00:00"))
  }

  test("sessionize: a gap of exactly gapSeconds stays in-session, one more splits") {
    val base = 1700000000L
    val rows = Seq(
      // user 1: 0s, +1800s (in-session boundary), +1801s after that (split)
      (1L, 1L, base), (1L, 2L, base + 1800L), (1L, 3L, base + 1800L + 1801L),
      // user 2: a single event — its own session 1
      (2L, 4L, base))
      .toDF("user_id", "event_id", "es_in")
      .withColumn("ts", timestamp_seconds(col("es_in"))).drop("es_in")
    val got = Relational.sessionize(rows, "user_id", "ts", "event_id", 1800L)
      .select("user_id", "event_id", "sess_idx")
      .as[(Long, Long, Long)].collect().sorted
    assert(got.toSeq == Seq((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 2L),
      (2L, 4L, 1L)))
  }

  test("scd2: intervals chain per key, exactly one current version, ties break on tieCol") {
    val base = 1700000000L
    val rows = Seq(
      // key 1: three versions, the middle two share a timestamp (tie
      // resolved by event_id — version 2 precedes version 3)
      (1L, 1L, base, "a"), (1L, 2L, base + 10L, "b"), (1L, 3L, base + 10L, "c"),
      // key 2: single version — current from its own ts
      (2L, 4L, base + 5L, "d"))
      .toDF("k", "event_id", "es_in", "payload")
      .withColumn("ts", timestamp_seconds(col("es_in"))).drop("es_in")
    val out = Relational.scd2(rows, Seq("k"), "ts", "event_id")
      .select(col("k"), col("event_id"),
        unix_timestamp(col("valid_from")).as("vf"),
        unix_timestamp(col("valid_to")).as("vt"),
        col("is_current"), col("payload"))
      .as[(Long, Long, Long, Option[Long], Boolean, String)]
      .collect().sortBy(r => (r._1, r._3, r._2)).toSeq
    assert(out == Seq(
      (1L, 1L, base, Some(base + 10L), false, "a"),
      (1L, 2L, base + 10L, Some(base + 10L), false, "b"),
      (1L, 3L, base + 10L, None, true, "c"),
      (2L, 4L, base + 5L, None, true, "d")))
    // interval chain: within a key, each non-current valid_to equals
    // SOME successor's valid_from (abutting history, no gaps)
    val byKey = out.groupBy(_._1)
    byKey.foreach { case (_, vs) =>
      assert(vs.count(_._5) == 1, "exactly one current version per key")
      vs.filterNot(_._5).foreach { v =>
        assert(vs.exists(s => s._3 == v._4.get), s"dangling valid_to in $v")
      }
    }
  }

  test("scd2Fold == one-shot scd2, incl. re-closing a previously current version") {
    val base = 1700000000L
    // key 1 has pre-cutoff history (its last version is current in the
    // old dim, and MUST re-close when the delta brings a newer one);
    // key 2 is untouched by the delta; key 3 is delta-only (new key)
    val pre = Seq((1L, 1L, base), (1L, 2L, base + 10L), (2L, 3L, base + 5L))
    val post = Seq((1L, 4L, base + 20L), (3L, 5L, base + 30L))
    def df(rows: Seq[(Long, Long, Long)]) = rows
      .toDF("k", "event_id", "es_in")
      .withColumn("ts", timestamp_seconds(col("es_in"))).drop("es_in")
    def canon(out: org.apache.spark.sql.DataFrame) = out
      .select(col("k"), col("event_id"),
        unix_timestamp(col("valid_from")).as("vf"),
        unix_timestamp(col("valid_to")).as("vt"), col("is_current"))
      .as[(Long, Long, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._3, r._2)).toSeq
    val folded = canon(Relational.scd2Fold(
      Relational.scd2(df(pre), Seq("k"), "ts", "event_id"),
      df(post), Seq("k"), "ts", "event_id"))
    val oneShot = canon(Relational.scd2(df(pre ++ post), Seq("k"), "ts", "event_id"))
    assert(folded == oneShot)
    // and the previously-current (1, 2) really did re-close
    assert(folded.exists(r => r._1 == 1L && r._2 == 2L && r._4 == Some(base + 20L) && !r._5))
  }

  test("maintainJoinView: every feed arm folds to exactly the full recompute") {
    // fact feed: delete 2, update 3's payload, insert 4 (new dim key)
    // dim feed: update u1's tier, delete u2
    val aOld = Seq((1L, "u1", "x"), (2L, "u2", "y"), (3L, "u1", "z"))
      .toDF("fid", "uid", "payload")
    val aNew = Seq((1L, "u1", "x"), (3L, "u1", "z2"), (4L, "u3", "w"))
      .toDF("fid", "uid", "payload")
    val bOld = Seq(("u1", 10L), ("u2", 20L), ("u3", 30L)).toDF("uid", "tier")
    val bNew = Seq(("u1", 11L), ("u3", 30L)).toDF("uid", "tier")
    val touchedA = Seq(2L, 3L, 4L).toDF("fid")
    val touchedB = Seq("u1", "u2").toDF("uid")
    val vOld = aOld.join(bOld, Seq("uid"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("fid", "uid", "payload", "tier")
        .as[(Long, String, String, Long)].collect().sorted.toSeq
    val folded = canon(Relational.maintainJoinView(
      vOld, aNew, bNew, touchedA, touchedB, "fid", "uid"))
    assert(folded == canon(aNew.join(bNew, Seq("uid"))),
      "fold must equal the full recompute")
    assert(folded == Seq(
      (1L, "u1", "x", 11L),  // untouched fact, dim update re-derived
      (3L, "u1", "z2", 11L), // fact update re-derived
      (4L, "u3", "w", 30L)), // insert joins the current dim
      s"got $folded")
    // empty feeds are the identity fold
    val idFold = canon(Relational.maintainJoinView(vOld, aOld, bOld,
      touchedA.limit(0), touchedB.limit(0), "fid", "uid"))
    assert(idFold == canon(vOld))
  }
}
