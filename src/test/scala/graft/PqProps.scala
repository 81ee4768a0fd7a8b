package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.Similarity

/** PQ encode law: the Spark-side struct-argmax encoding
  * ([[Similarity.pqEncode]] — literal codebook rows, array_max over
  * (dot, -code) structs) must agree with a plain Scala argmax over
  * the same codebook for ARBITRARY vectors, including the tie rule
  * (ties → lowest code). This checks the encode machinery
  * independently of the v15/v16 oracles, which only ever see the one
  * embeddings table.
  */
object PqProps extends Properties("PqEncode") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(8)

  private val m = 2
  private val ksub = 4
  private val subDims = 3
  private val cb = Similarity.pqCodebook(m, ksub, subDims)

  private def refEncode(vec: Seq[Double]): Seq[Int] =
    (0 until m).map { s =>
      val sub = vec.slice(s * subDims, (s + 1) * subDims)
      val dots = cb(s).map(row => row.zip(sub).map { case (w, x) => w * x }.sum)
      // argmax, ties -> lowest code (struct (dot, -c) max picks
      // highest dot then highest -c)
      dots.zipWithIndex.maxBy { case (d, c) => (d, -c) }._2
    }

  private val genVec: Gen[List[Double]] =
    Gen.listOfN(m * subDims, Gen.oneOf(
      Gen.chooseNum(-100.0, 100.0),
      Gen.oneOf(0.0, 1.0, -1.0))) // constants provoke exact dot ties

  property("Spark pqEncode == Scala argmax reference, ties to lowest code") =
    forAll(Gen.nonEmptyListOf(genVec).map(_.take(6))) { vecs =>
      val spark = TestSpark.spark
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "vec")
      val got = df.select(col("id"),
          graft.operators.SimilarityTestAccess.pqEncode(col("vec"), cb).as("codes"))
        .as[(Long, Seq[Int])].collect().toMap
      vecs.zipWithIndex.forall { case (v, i) =>
        got(i.toLong) == refEncode(v)
      }
    }
}
