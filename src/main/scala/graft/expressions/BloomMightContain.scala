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

  /** Interpreted-path sketch, deserialized once per closure instance
    * — never per row. Transient: the interpreted task closure ships
    * only the child literal's serialized bytes; each executor
    * re-expands them on first eval. The codegen path below has its
    * own lazy per-instance deserialization for the same reason — in
    * BOTH paths the task binary carries the sketch bytes exactly
    * once (the codegen references array points at the SAME byte
    * array object as the child literal, so Java serialization
    * back-references it rather than writing it twice).
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
    // reference the compact serialized BYTES (the same array object
    // the child literal holds, so the task binary carries them once),
    // and expand them lazily, once per generated-class instance — the
    // expanded bit array is never serialized at all, and the driver
    // pays no readFrom() at codegen-compile time
    val bytes = filterExpr.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, "bloom_might_contain filter bytes are null")
    val bytesRef = ctx.addReferenceObj("bloomBytes", bytes, "byte[]")
    val bloomCls = classOf[BloomFilter].getName
    val bloomVar = ctx.addMutableState(bloomCls, "bloomFilter")
    val keyGen = keyExpr.genCode(ctx)
    ev.copy(
      code = code"""
        |${keyGen.code}
        |boolean ${ev.value} = false;
        |if (!${keyGen.isNull}) {
        |  if ($bloomVar == null) {
        |    try {
        |      $bloomVar = $bloomCls.readFrom(new java.io.ByteArrayInputStream($bytesRef));
        |    } catch (java.io.IOException e) {
        |      throw new RuntimeException("bloom_might_contain: corrupt sketch bytes", e);
        |    }
        |  }
        |  ${ev.value} = $bloomVar.mightContainLong(${keyGen.value});
        |}
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(filterExpr = newLeft, keyExpr = newRight)
}
