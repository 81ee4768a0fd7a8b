package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.Flatten
import graft.operators.Relational

/** Remaining SURVEY §5.3 properties: union-by-name null-fill and
  * rename round-trip.
  */
object RelationalProps extends Properties("Relational") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(8)

  private val pool = Vector("c1", "c2", "c3", "c4", "c5")
  private val genCols: Gen[Seq[String]] =
    Gen.someOf(pool).map(_.toSeq).suchThat(_.nonEmpty)

  private val uidPool = Vector("u0", "u1", "u2", "u3")
  private val genFact: Gen[Map[Long, (String, String)]] =
    Gen.listOfN(10, Gen.option(Gen.zip(Gen.oneOf(uidPool), Gen.oneOf("x", "y"))))
      .map(_.zipWithIndex.collect { case (Some(v), i) => i.toLong -> v }.toMap)
  private val genDim: Gen[Map[String, Long]] =
    Gen.listOfN(4, Gen.option(Gen.choose(0L, 3L)))
      .map(_.zipWithIndex.collect { case (Some(t), i) => uidPool(i) -> t }.toMap)

  property("maintainJoinView == full recompute for arbitrary two-sided feeds") =
    forAll(genFact, genFact, genDim, genDim) { (aO, aN, bO, bN) =>
      val spark = TestSpark.spark
      import spark.implicits._
      def fdf(m: Map[Long, (String, String)]) =
        m.toSeq.map { case (f, (u, p)) => (f, u, p) }.toDF("fid", "uid", "payload")
      def ddf(m: Map[String, Long]) = m.toSeq.toDF("uid", "tier")
      // the feeds' key sets: exactly the keys whose row changed,
      // appeared, or vanished between the versions
      val touchedA = (aO.keySet ++ aN.keySet)
        .filter(k => aO.get(k) != aN.get(k)).toSeq.toDF("fid")
      val touchedB = (bO.keySet ++ bN.keySet)
        .filter(k => bO.get(k) != bN.get(k)).toSeq.toDF("uid")
      val vOld = fdf(aO).join(ddf(bO), Seq("uid"))
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select("fid", "uid", "payload", "tier")
          .as[(Long, String, String, Long)].collect().sorted.toSeq
      canon(Relational.maintainJoinView(vOld, fdf(aN), ddf(bN),
        touchedA, touchedB, "fid", "uid")) ==
        canon(fdf(aN).join(ddf(bN), Seq("uid")))
    }

  property("unionByName covers A∪B and null-fills exactly the missing side") =
    forAll(genCols, genCols, Gen.choose(1, 5), Gen.choose(1, 5)) { (a, b, na, nb) =>
      val spark = TestSpark.spark
      import org.apache.spark.sql.functions._
      def mk(cols: Seq[String], n: Int) =
        spark.range(n).select(cols.map(c => lit(1L).as(c)): _*)
      val u = Relational.unionByName(Seq(mk(a, na), mk(b, nb)))
      val expectedCols = (a ++ b.filterNot(a.contains)).toSeq
      val nullCounts = expectedCols.map { c =>
        c -> u.filter(col(c).isNull).count()
      }.toMap
      u.columns.toSeq == expectedCols &&
        u.count() == na + nb &&
        expectedCols.forall { c =>
          val expected = (if (a.contains(c)) 0L else na.toLong) +
            (if (b.contains(c)) 0L else nb.toLong)
          nullCounts(c) == expected
        }
    }

  property("renameAll round-trips under the inverse map") =
    forAll(Gen.someOf(pool).map(_.toSeq).suchThat(_.size >= 2)) { cols =>
      val spark = TestSpark.spark
      import org.apache.spark.sql.functions._
      val df = spark.range(1).select(cols.map(c => lit(1L).as(c)): _*)
      val fwd = cols.map(c => c -> s"${c}_renamed").toMap
      val back = fwd.map(_.swap)
      Flatten.renameAll(Flatten.renameAll(df, fwd), back).columns.toSeq == cols
    }

  // sessionize invariant: within a key's timeline sorted by (ts, id),
  // consecutive rows share a session iff their gap is <= the
  // threshold — i.e. sess_idx increments exactly at >threshold gaps
  // and sessions are contiguous runs starting at 1
  property("sessionize splits exactly at gaps > threshold") =
    forAll(
      Gen.nonEmptyListOf(Gen.zip(
        Gen.choose(1L, 3L),          // key
        Gen.choose(0L, 40000L))),    // epoch seconds (clusters + gaps)
      Gen.choose(300L, 5000L)) { (rows, gap) =>
      val spark = TestSpark.spark
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val df = rows.zipWithIndex
        .map { case ((k, es), i) => (k, i.toLong, es) }
        .toDF("k", "id", "es_in")
        .withColumn("ts", timestamp_seconds(col("es_in"))).drop("es_in")
      val got = Relational.sessionize(df, "k", "ts", "id", gap)
        .select("k", "es", "sess_idx").as[(Long, Long, Long)].collect()
        .groupBy(_._1).values
      got.forall { perKey =>
        val tl = perKey.sortBy(r => (r._2, r._1)).toSeq // (ts asc) per key
        tl.head._3 == 1L &&
          tl.sliding(2).filter(_.size == 2).forall { case Seq(a, b) =>
            val split = b._2 - a._2 > gap
            b._3 == a._3 + (if (split) 1L else 0L)
          }
      }
    }

  // intervalOverlapJoin law: for ARBITRARY interval sets and bucket
  // widths, the bucketized plan returns exactly the naive overlap
  // theta join's pair multiset — each overlapping pair once,
  // regardless of how many buckets the pair shares (the dedup-filter
  // subtlety a fixed fixture can only spot-check)
  property("intervalOverlapJoin == naive overlap join for arbitrary intervals") =
    forAll(
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 2000L), Gen.choose(0L, 1500L)))
        .map(_.take(8)),
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 2000L), Gen.choose(0L, 1500L)))
        .map(_.take(8)),
      Gen.choose(50L, 700L)) { (ls, rs, bucketSecs) =>
      val spark = TestSpark.spark
      import spark.implicits._
      import org.apache.spark.sql.functions._
      def mk(xs: List[(Long, Long)], s: String, e: String, id: String) =
        xs.zipWithIndex.map { case ((a, span), i) => (i.toLong, a, a + span) }
          .toDF(id, "s_in", "e_in")
          .withColumn(s, timestamp_seconds(col("s_in")))
          .withColumn(e, timestamp_seconds(col("e_in")))
          .drop("s_in", "e_in")
      val l = mk(ls, "l_s", "l_e", "l_id")
      val r = mk(rs, "r_s", "r_e", "r_id")
      val naive = l.join(r, col("l_s") <= col("r_e") && col("r_s") <= col("l_e"))
        .select("l_id", "r_id").as[(Long, Long)].collect().sorted.toSeq
      val bucketed = Relational.intervalOverlapJoin(l, "l_s", "l_e", r, "r_s", "r_e",
          bucketSeconds = bucketSecs)
        .select("l_id", "r_id").as[(Long, Long)].collect().sorted.toSeq
      bucketed == naive
    }

  // saltedJoin law: for ARBITRARY rows (null join keys, null salt
  // sources, duplicate keys both sides), any nSalts, and both join
  // types, the salted plan returns exactly the plain equi-join's row
  // multiset — the null-saltFrom→bucket-0 edge and the
  // null-keys-never-match contract the fixed oracle fixture can only
  // spot-check
  property("saltedJoin == plain equi-join for arbitrary rows and salts") =
    forAll(
      Gen.nonEmptyListOf(Gen.zip(
        Gen.option(Gen.choose(0L, 4L)),     // join key (nullable)
        Gen.option(Gen.choose(0L, 99L)),    // salt source (nullable)
        Gen.choose(0L, 9L))).map(_.take(12)),
      Gen.nonEmptyListOf(Gen.zip(
        Gen.option(Gen.choose(0L, 4L)),     // join key (nullable, dups ok)
        Gen.choose(0L, 9L))).map(_.take(8)),
      Gen.choose(1, 5),
      Gen.oneOf("inner", "left")) { (bigRows, smallRows, nSalts, joinType) =>
      val spark = TestSpark.spark
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val big = bigRows.toDF("k", "salt_src", "bv")
      val small = smallRows.toDF("k", "sv")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select("k", "salt_src", "bv", "sv")
          .as[(Option[Long], Option[Long], Long, Option[Long])]
          .collect().sortBy(_.toString).toSeq
      val plain = canon(big.join(small, Seq("k"), joinType))
      val salted = canon(Relational.saltedJoin(big, small, Seq("k"),
        joinType, nSalts, col("salt_src")))
      salted == plain
    }

  // bloomPrunedSemiJoin law: an UNDERSIZED sketch (expectedItems 1,
  // high fpp) floods the probe with false positives, and the result
  // must still be exactly the plain left-semi join — the
  // fp-removal-join contract the fixed j10 oracle (one sketch size)
  // can only spot-check; null fact keys drop on both paths
  property("bloomPrunedSemiJoin == plain semi join even undersized") =
    forAll(
      Gen.nonEmptyListOf(Gen.zip(
        Gen.option(Gen.choose(0L, 30L)), Gen.choose(0L, 9L))).map(_.take(14)),
      Gen.nonEmptyListOf(Gen.choose(0L, 30L)).map(_.take(6)),
      Gen.oneOf(0.01, 0.5)) { (factRows, dimKeys, fpp) =>
      val spark = TestSpark.spark
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val fact = factRows.toDF("fk", "fv")
      val dim = dimKeys.toDF("dk")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select("fk", "fv").as[(Option[Long], Long)]
          .collect().sortBy(_.toString).toSeq
      val plain = canon(fact.join(dim.select(col("dk").as("fk")),
        Seq("fk"), "left_semi"))
      val pruned = canon(Relational.bloomPrunedSemiJoin(fact, "fk", dim, "dk",
        expectedItems = 1L, fpp = fpp))
      pruned == plain
    }

  // asofJoin law: for arbitrary event sets, each left row's matched
  // value equals the naive per-row lookup — the LATEST right row with
  // ts <= left.ts on the key, ties at equal ts resolving to the
  // highest value (the documented window tie rule)
  property("asofJoin == naive latest-right-row lookup") =
    forAll(
      Gen.nonEmptyListOf(Gen.zip(
        Gen.choose(0L, 2L), Gen.choose(0L, 30L))).map(_.take(10)),
      Gen.nonEmptyListOf(Gen.zip(
        Gen.choose(0L, 2L), Gen.choose(0L, 30L),
        Gen.choose(0L, 9L))).map(_.take(10))) { (ls, rs) =>
      val spark = TestSpark.spark
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("l_id", "k", "ts")
      val right = rs.toDF("k", "ts", "v")
      val got = Relational.asofJoin(left, right, Seq("k"), "ts", "v")
        .select("l_id", "v").as[(Long, Option[Long])]
        .collect().sortBy(_._1).toSeq
      val want = ls.zipWithIndex.map { case ((k, t), i) =>
        val cands = rs.filter(r => r._1 == k && r._2 <= t)
        (i.toLong,
          if (cands.isEmpty) None
          else Some(cands.maxBy(r => (r._2, r._3))._3))
      }.sortBy(_._1)
      got == want
    }

  // pitJoin law: for an scd2 dim over an arbitrary change log
  // (duplicate timestamps included — they create empty [t, t)
  // intervals the naive join skips), each fact row's looked-up
  // version equals the naive interval-containment lookup
  // (valid_from <= ts AND (valid_to IS NULL OR ts < valid_to))
  property("pitJoin == naive interval containment over the scd2 dim") =
    forAll(
      Gen.nonEmptyListOf(Gen.zip(
        Gen.choose(0L, 2L), Gen.choose(0L, 30L))).map(_.take(10)),
      Gen.nonEmptyListOf(Gen.zip(
        Gen.choose(0L, 2L), Gen.choose(0L, 30L))).map(_.take(10))) { (fs, cs) =>
      val spark = TestSpark.spark
      import spark.implicits._
      val facts = fs.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("f_id", "k", "ts")
      val changes = cs.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val dim = Relational.scd2(changes.toDF("k", "ts", "vid"),
        Seq("k"), "ts", "vid")
      val got = Relational.pitJoin(facts, dim, Seq("k"), "ts", "vid")
        .select("f_id", "vid").as[(Long, Option[Long])]
        .collect().sortBy(_._1).toSeq
      val want = fs.zipWithIndex.map { case ((k, t), i) =>
        val vers = changes.filter(_._1 == k).sortBy(c => (c._2, c._3))
        val hit = vers.zipWithIndex.find { case ((_, from, _), j) =>
          from <= t && vers.lift(j + 1).forall(t < _._2)
        }
        (i.toLong, hit.map(_._1._3))
      }.sortBy(_._1)
      got == want
    }

  // nearestJoin law: each left row's matched value equals the naive
  // closest-|Δts| lookup over the key's right rows, with the
  // documented tie chain — equal distance prefers the backward
  // (ts <= left.ts) candidate; within the backward arm equal ts
  // resolves to the highest value, within the forward arm to the
  // lowest (the two window orderings)
  property("nearestJoin == naive closest-row lookup incl. tie chain") =
    forAll(
      Gen.nonEmptyListOf(Gen.zip(
        Gen.choose(0L, 2L), Gen.choose(0L, 30L))).map(_.take(10)),
      Gen.nonEmptyListOf(Gen.zip(
        Gen.choose(0L, 2L), Gen.choose(0L, 30L),
        Gen.choose(0L, 9L))).map(_.take(10))) { (ls, rs) =>
      val spark = TestSpark.spark
      import spark.implicits._
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("l_id", "k", "ts")
      val right = rs.toDF("k", "ts", "v")
      val got = Relational.nearestJoin(left, right, Seq("k"), "ts", "v")
        .select("l_id", "v").as[(Long, Option[Long])]
        .collect().sortBy(_._1).toSeq
      val want = ls.zipWithIndex.map { case ((k, t), i) =>
        val back = rs.filter(r => r._1 == k && r._2 <= t)
        val fwd = rs.filter(r => r._1 == k && r._2 > t)
        val b = if (back.isEmpty) None else Some(back.maxBy(r => (r._2, r._3)))
        val f = if (fwd.isEmpty) None else Some(fwd.minBy(r => (r._2, r._3)))
        val v = (b, f) match {
          case (None, None) => None
          case (Some(bb), None) => Some(bb._3)
          case (None, Some(ff)) => Some(ff._3)
          case (Some(bb), Some(ff)) =>
            if (t - bb._2 <= ff._2 - t) Some(bb._3) else Some(ff._3)
        }
        (i.toLong, v)
      }.sortBy(_._1)
      got == want
    }
}
