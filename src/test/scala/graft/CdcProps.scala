package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.Cdc

/** Property tests for the CDC merge split (SURVEY.md §5.3): for
  * key-unique inputs, inserts ∪ updates ∪ unchanged partitions the
  * incoming frame exactly — INCLUDING rows whose version is null on
  * either side (the reference silently drops those, SER:218-221; our
  * defined semantic routes them to `unchanged`).
  */
object CdcProps extends Properties("Cdc.mergeSplit") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(8)

  // key → optional version; map keys give key-uniqueness by construction.
  private val genTable: Gen[Map[Long, Option[Int]]] =
    Gen.mapOf(Gen.zip(Gen.choose(0L, 15L), Gen.option(Gen.choose(0, 5))))

  property("inserts+updates+unchanged partition incoming, nulls to unchanged") =
    forAll(genTable, genTable) { (incoming, snapshot) =>
      val spark = TestSpark.spark
      import spark.implicits._
      val inDf = incoming.toSeq.toDF("id", "v")
      val snapDf = snapshot.toSeq.toDF("id", "v")
      val split = Cdc.mergeSplit(inDf, snapDf, "id", "v")

      def keys(df: org.apache.spark.sql.DataFrame): Set[Long] =
        df.select("id").as[Long].collect().toSet

      val (ins, upd, unch) = (keys(split.inserts), keys(split.updates), keys(split.unchanged))

      val expectedIns = incoming.keySet -- snapshot.keySet
      val matched = incoming.keySet & snapshot.keySet
      val expectedUpd = matched.filter { k =>
        (incoming(k), snapshot(k)) match {
          case (Some(vi), Some(vs)) => vi > vs
          case _ => false // null on either side can never prove "newer"
        }
      }
      val expectedUnch = matched -- expectedUpd

      ins == expectedIns && upd == expectedUpd && unch == expectedUnch &&
        (ins & upd).isEmpty && (ins & unch).isEmpty && (upd & unch).isEmpty &&
        (ins ++ upd ++ unch) == incoming.keySet
    }
}
