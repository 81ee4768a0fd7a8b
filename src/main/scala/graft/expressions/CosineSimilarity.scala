package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity of two numeric
  * arrays — the one place in this engine where a custom `Expression`
  * is genuinely justified (SURVEY §2 preference ladder): the
  * composable form (`zip_with` + two `transform` folds) is built from
  * higher-order functions, which Catalyst interprets lambda-by-lambda
  * — measured as the residual cost of every vector-similarity query.
  * This expression generates a single fused Java loop inside
  * whole-stage codegen (with an interpreted `eval` twin for
  * non-codegen paths).
  *
  * Numeric contract (what keeps the DuckDB oracle cell-exact): the
  * three accumulators fold sequentially left in array order exactly
  * like the HOF form — dot = ((0 + x₁y₁) + x₂y₂)…, same for the two
  * norms — and the result is `dot / (sqrt(na) * sqrt(nb))` in that
  * operation order. Null semantics: null array, null element, or
  * length mismatch (zip_with's null padding) → null, like the HOF
  * form; a ZERO-NORM input also yields null — deliberately unlike
  * the HOF form, whose 0/0 raises DIVIDE_BY_ZERO under ANSI (a
  * directionless vector has no defined similarity, and NaN would
  * sort above every real cosine in a ranking).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isNumericArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isNumericArray(left.dataType) && isNumericArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (arrA, arrB) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = arrA.numElements()
    if (n != arrB.numElements()) return null
    val (ta, tb) = (elemType(left), elemType(right))
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (arrA.isNullAt(i) || arrB.isNullAt(i)) return null
      val x = if (ta == FloatType) arrA.getFloat(i).toDouble else arrA.getDouble(i)
      val y = if (tb == FloatType) arrB.getFloat(i).toDouble else arrB.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    // zero-norm input has no direction: null, never NaN (NaN sorts as
    // the LARGEST double in Spark and would top every ranking)
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      def get(arr: String, t: DataType, idx: String): String =
        if (t == FloatType) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
      s"""
        |int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    double $x = ${get(a, elemType(left), i)};
        |    double $y = ${get(b, elemType(right), i)};
        |    $dot += $x * $y;
        |    $na += $x * $x;
        |    $nb += $y * $y;
        |  }
        |  if (!${ev.isNull}) {
        |    if ($na == 0.0 || $nb == 0.0) {
        |      ${ev.isNull} = true;
        |    } else {
        |      ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        |    }
        |  }
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column wrapper — resolves through the function registry, so the
    * session must carry [[GraftExtensions]] (see
    * [[graft.engine.Sessions]]).
    */
  def apply(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
}
