package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression: Hamming distance between two 64-bit
  * fingerprints (`Long.bitCount(a ^ b)`).
  *
  * Why an Expression and not a UDF: `doGenCode` emits straight-line Java
  * (`Long.bitCount(a ^ b)`) that stays inside whole-stage codegen — no
  * boxing, no SerDe, no codegen fence — so simhash-based near-dup
  * filtering over billions of pairs runs at join speed. (Preference order
  * per SURVEY.md §7.3: compose built-ins > custom Expression > custom
  * plan node; this is the minimal example of the middle extension point,
  * registered as SQL function `hamming64` via the session function
  * registry.)
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"hamming64 expects (bigint, bigint), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = java.lang.Long.bitCount($a ^ $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {
  /** Install `hamming64(bigint, bigint) -> int` into the session's
    * function registry; afterwards usable from SQL text and
    * `expr("hamming64(a, b)")`. Idempotent.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hamming64",
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, "hamming64 takes exactly 2 arguments")
        HammingDistance(exprs(0), exprs(1))
      },
      "built-in")
}
