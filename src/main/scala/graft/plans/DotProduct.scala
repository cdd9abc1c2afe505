package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: sequential-fold dot product of two
  * `array<float>` columns, accumulating in double.
  *
  * Why an Expression: the composable formulation
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,v) -> acc+v)` is
  * correct but the higher-order-function lambdas evaluate interpreted
  * (CodegenFallback) and allocate an intermediate product array per row.
  * `doGenCode` here emits a straight Java loop over the two unsafe float
  * arrays — no allocation, no lambda dispatch, inside whole-stage
  * codegen — which is the hot inner loop of every similarity-search
  * operator (brute-force/bucketed/IVF ANN, embedding near-dup).
  *
  * Semantics exactly match the fold (and the DuckDB
  * `list_reduce(list_transform(...))` oracles): products and additions
  * in index order — `acc = acc + (double)a[i] * (double)b[i]` — so
  * results are bit-identical; NULL if either array is NULL, lengths
  * differ (zip_with would pad with NULL), or any element is NULL.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // non-null inputs can still produce NULL (length mismatch/null element)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"dotf expects (array<float>, array<float>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc = acc + x.getFloat(i).toDouble * y.getFloat(i).toDouble
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
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc = $acc + ((double) $a.getFloat($i))
         |      * ((double) $b.getFloat($i));
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

object DotProductF {
  /** Install `dotf(array<float>, array<float>) -> double` into the
    * session's function registry. Idempotent; also wired cluster-wide via
    * `spark.sql.extensions=graft.plans.GraftExtensions`.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dotf",
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, "dotf takes exactly 2 arguments")
        DotProductF(exprs.head, exprs(1))
      },
      "built-in")
}
