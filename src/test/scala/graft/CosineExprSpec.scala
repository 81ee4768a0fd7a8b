package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** The native cosine_sim expression must be BIT-identical to the
  * composable HOF fold (zip_with + aggregate) and keep its null
  * semantics — these tests hold the codegen and interpreted paths to
  * that contract.
  */
class CosineExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The reference HOF formulation the expression replaces. */
  private def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    Similarity.dot(a, b) / (Similarity.l2norm(a) * Similarity.l2norm(b))

  test("bit-identical to the HOF fold on deterministic pseudo-random float vectors") {
    val vecs = (1 to 200).map { i =>
      (Seq.tabulate(64)(j => (((i * 31 + j * 17) % 97) - 48) / 48.0f),
       Seq.tabulate(64)(j => (((i * 13 + j * 29) % 89) - 44) / 44.0f))
    }.toDF("a", "b")
    val diffs = vecs.select(
      (Similarity.cosine(col("a"), col("b")) === hofCosine(col("a"), col("b"))).as("eq"))
      .filter(!col("eq")).count()
    assert(diffs == 0)
  }

  test("zero-norm vectors yield null, not NaN (NaN would top every ranking)") {
    val df = Seq(
      (Seq(0.0f, 0.0f), Seq(1.0f, 2.0f)),
      (Seq(1.0f, 2.0f), Seq(0.0f, 0.0f)),
      (Seq.empty[Float], Seq.empty[Float])).toDF("a", "b")
    val out = df.select(Similarity.cosine(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("null array, null element, and length mismatch all yield null") {
    val df = Seq(
      (Some(Seq[Option[Float]](Some(1f), Some(2f))), Some(Seq[Option[Float]](Some(1f), None))),
      (Some(Seq[Option[Float]](Some(1f))), Some(Seq[Option[Float]](Some(1f), Some(2f)))),
      (None, Some(Seq[Option[Float]](Some(1f)))))
      .toDF("a", "b")
    val out = df.select(Similarity.cosine(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("usable from plain SQL through the extension registration") {
    val got = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)), " +
        "array(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE))) AS c")
      .as[Double].head()
    assert(math.abs(got - 1.0) < 1e-15)
  }

  test("rejects non-array inputs at analysis time") {
    val err = intercept[Exception] {
      Seq((1L, 2L)).toDF("a", "b").select(Similarity.cosine(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("cosine_sim"))
  }
}
