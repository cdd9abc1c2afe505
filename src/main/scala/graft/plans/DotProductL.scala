package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: dot product of two `array<bigint>`
  * columns in long arithmetic — the integer twin of [[DotProductF]].
  *
  * Why: every quantized-vector operator (k-means assignment, PQ
  * encoding, semantic-dedup pair scoring) evaluates
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, ...)` — correct, but
  * higher-order lambdas run interpreted and allocate a product array
  * per row. On q122's 10x clone smoke that interpreter cost dominated
  * the whole query (~25M pairs x 64 dims). `doGenCode` emits the same
  * loop as straight Java inside whole-stage codegen.
  *
  * Semantics match the fold exactly: `acc += a[i] * b[i]` in index
  * order (long addition is associative and, for graft's quantized
  * ranges — |element| <= 2^20, dims <= 64 — never overflows); NULL if
  * either array is NULL, lengths differ, or any element is NULL.
  */
case class DotProductL(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def isLongArray(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"doti expects (array<bigint>, array<bigint>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc = acc + x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc = $acc + $a.getLong($i) * $b.getLong($i);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductL =
    copy(left = newLeft, right = newRight)
}

object DotProductL {
  /** Install `doti(array<bigint>, array<bigint>) -> bigint` into the
    * session's function registry. Idempotent; also wired cluster-wide via
    * `spark.sql.extensions=graft.plans.GraftExtensions`.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "doti",
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, "doti takes exactly 2 arguments")
        DotProductL(exprs.head, exprs(1))
      },
      "built-in")
}
