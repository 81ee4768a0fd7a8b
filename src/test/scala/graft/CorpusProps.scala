package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.Corpus

/** The packing law behind c3/c5/c8/c9: `Corpus.packByBudget`'s
  * windowed running-offset assignment must equal a sequential fold
  * over each stratum sorted by the order column — for ARBITRARY
  * token counts (including zero-token docs and docs longer than the
  * budget, which overflow their pack rather than splitting) and
  * ARBITRARY budgets, the cases the fixed 2048-budget oracle rows
  * can only spot-check.
  */
object CorpusProps extends Properties("Corpus") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(8)

  property("packByBudget == sequential running-offset fold") =
    forAll(
      Gen.nonEmptyListOf(Gen.zip(
        Gen.choose(1, 3),            // stratum
        // token counts: mostly small, sometimes past 2^53 — cumulative
        // offsets beyond the double mantissa are exactly where the
        // integral-div pack id diverges from a double `/` (advisor r10)
        Gen.frequency(
          4 -> Gen.choose(0L, 500L), // 0 and >budget both legal
          1 -> Gen.choose(1L << 53, 1L << 56))))
        .map(_.take(24)),
      Gen.choose(1L, 300L)) { (rows, budget) =>
      val spark = TestSpark.spark
      import spark.implicits._
      val df = rows.zipWithIndex
        .map { case ((st, n), i) => (s"s$st", i.toLong, n) }
        .toDF("stratum", "doc_id", "n_tokens")
      val got = Corpus.packByBudget(df, "stratum", "doc_id", "n_tokens", budget)
        .select("stratum", "doc_id", "pack_id")
        .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      val want = rows.zipWithIndex
        .map { case ((st, n), i) => (s"s$st", i.toLong, n) }
        .groupBy(_._1).toSeq.flatMap { case (st, docs) =>
          var offset = 0L
          docs.sortBy(_._2).map { case (_, id, n) =>
            val pack = offset / budget
            offset += n
            (st, id, pack)
          }
        }.sortBy(r => (r._1, r._2))
      got == want
    }

  property("packWithOffsets: pack_id matches packByBudget, pack_pos == fold offset mod budget") =
    forAll(
      Gen.nonEmptyListOf(Gen.zip(
        Gen.choose(1, 3),
        Gen.frequency(
          4 -> Gen.choose(0L, 500L),
          1 -> Gen.choose(1L << 53, 1L << 56))))
        .map(_.take(24)),
      Gen.choose(1L, 300L)) { (rows, budget) =>
      val spark = TestSpark.spark
      import spark.implicits._
      val df = rows.zipWithIndex
        .map { case ((st, n), i) => (s"s$st", i.toLong, n) }
        .toDF("stratum", "doc_id", "n_tokens")
      val got = Corpus.packWithOffsets(df, "stratum", "doc_id", "n_tokens", budget)
        .select("stratum", "doc_id", "pack_id", "pack_pos")
        .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      val want = rows.zipWithIndex
        .map { case ((st, n), i) => (s"s$st", i.toLong, n) }
        .groupBy(_._1).toSeq.flatMap { case (st, docs) =>
          var offset = 0L
          docs.sortBy(_._2).map { case (_, id, n) =>
            val out = (st, id, offset / budget, offset % budget)
            offset += n
            out
          }
        }.sortBy(r => (r._1, r._2))
      got == want
    }
}
