package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate `bloom_might_contain(filter, key)`: does
  * the Bloom sketch serialized in `filterExpr` (a foldable BINARY —
  * in practice a literal produced by [[graft.operators.Relational
  * .bloomPrunedSemiJoin]]) possibly contain the LONG `key`?
  *
  * This replaces the one Scala UDF the engine ever had on a hot path:
  * a UDF predicate on the fact scan blocks whole-stage codegen for
  * the entire scan→filter→exchange stage, which is exactly the stage
  * the runtime-filter pattern exists to thin out. Spark's own
  * `BloomFilterMightContain` has the same design (lazily-deserialized
  * sketch referenced from generated code) but is `private[spark]`, so
  * the engine carries its own public-API twin, registered through
  * [[GraftExtensions]] like `cosine_sim`.
  *
  * Semantics (pinned by the j10 oracle): a NULL key returns FALSE,
  * not NULL — a null never equi-joins, so the pruned scan may drop it
  * outright, keeping the operator's result exactly the plain LEFT
  * SEMI join. The expression is deterministic and the sketch is
  * deserialized once per task (lazy val), not per row.
  */
case class BloomMightContain(filterExpr: Expression, keyExpr: Expression)
    extends BinaryExpression with Predicate {

  override def left: Expression = filterExpr
  override def right: Expression = keyExpr
  override def prettyName: String = "bloom_might_contain"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (filterExpr.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain filter must be BINARY, got ${filterExpr.dataType.simpleString}")
    else if (!filterExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain filter must be a foldable (constant) expression")
    else if (keyExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain key must be BIGINT, got ${keyExpr.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  /** Deserialized once per closure instance: on the driver when the
    * plan constant-folds, on each executor when the serialized plan
    * arrives — never per row. Marked transient so the task closure
    * ships the compact serialized bytes (the child literal), not the
    * expanded bit array twice.
    */
  @transient private lazy val sketch: BloomFilter = {
    val bytes = filterExpr.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, "bloom_might_contain filter bytes are null")
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any = {
    val k = keyExpr.eval(input)
    k != null && sketch.mightContainLong(k.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the deserialized sketch, not the bytes: one
    // readFrom() on the driver at codegen time, then the references
    // array carries the (Serializable) filter to each task
    val bloomRef = ctx.addReferenceObj("bloomFilter", sketch, classOf[BloomFilter].getName)
    val keyGen = keyExpr.genCode(ctx)
    ev.copy(
      code = code"""
        |${keyGen.code}
        |boolean ${ev.value} = false;
        |if (!${keyGen.isNull}) {
        |  ${ev.value} = $bloomRef.mightContainLong(${keyGen.value});
        |}
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(filterExpr = newLeft, keyExpr = newRight)
}
