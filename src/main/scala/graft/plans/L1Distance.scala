package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: L1 (Manhattan) distance of two
  * `array<int>` columns, accumulating in long.
  *
  * Why an Expression: this is the candidate-pair prefilter of the
  * edit-distance near-dup operator (q70) — `levenshtein(a, b) >=
  * L1(hist_a, hist_b) / 2`, so pairs whose character-histogram L1
  * exceeds 2·k skip the O(n·k) DP entirely. The prefilter runs on
  * EVERY candidate pair (quadratic within blocks), so the composable
  * `aggregate(zip_with(...))` formulation — interpreted lambdas, one
  * intermediate array allocation per pair — is exactly the wrong tool.
  * `doGenCode` emits a straight Java loop inside whole-stage codegen.
  *
  * Semantics match the fold: NULL if either array is NULL, lengths
  * differ, or any element is NULL; exact long arithmetic otherwise.
  */
case class L1DistanceI(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def isIntArray(t: DataType): Boolean = t match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (isIntArray(left.dataType) && isIntArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"l1i expects (array<int>, array<int>), got " +
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
      acc += math.abs(x.getInt(i).toLong - y.getInt(i).toLong)
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
      val dv = ctx.freshName("dv")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    final long $dv = (long) $a.getInt($i) - (long) $b.getInt($i);
         |    $acc += ($dv < 0L) ? -$dv : $dv;
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L1DistanceI =
    copy(left = newLeft, right = newRight)
}

object L1DistanceI {
  /** Install `l1i(array<int>, array<int>) -> bigint` into the session's
    * function registry. Idempotent; also wired cluster-wide via
    * `spark.sql.extensions=graft.plans.GraftExtensions`.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l1i",
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, "l1i takes exactly 2 arguments")
        L1DistanceI(exprs.head, exprs(1))
      },
      "built-in")
}
