package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: maximum element multiplicity of an
  * `array<bigint>` — `maxfreq([5,3,5,5,3]) = 3`.
  *
  * Why an Expression: the composable formulation
  * `aggregate(array_sort(xs), (prev,run,best), ...)` is correct but the
  * higher-order lambdas evaluate interpreted (CodegenFallback), allocate
  * a struct per step, and box every element. `doGenCode` emits a copy
  * into a primitive `long[]`, a `java.util.Arrays.sort`, and a run scan
  * — no boxing, inside whole-stage codegen. This is the hot inner loop
  * of the per-document repetition gate (q147): one call per (doc,
  * gram-length) over arrays the size of the document.
  *
  * Semantics: 0 for an empty array; NULL if the array or any element is
  * NULL (order never matters — multiplicity is permutation-invariant,
  * so no cross-engine ordering contract is needed).
  */
case class MaxFreqL(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"maxfreq expects array<bigint>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n == 0) return 0L
    val arr = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) return null
      arr(i) = xs.getLong(i)
      i += 1
    }
    java.util.Arrays.sort(arr)
    var best = 1L
    var run = 1L
    i = 1
    while (i < n) {
      if (arr(i) == arr(i - 1)) { run += 1; if (run > best) best = run }
      else run = 1
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val arr = ctx.freshName("arr")
      val i = ctx.freshName("i")
      val run = ctx.freshName("run")
      val best = ctx.freshName("best")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.value} = 0L;
         |} else {
         |  boolean $bad = false;
         |  final long[] $arr = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { $bad = true; break; }
         |    $arr[$i] = $a.getLong($i);
         |  }
         |  if ($bad) {
         |    ${ev.isNull} = true;
         |  } else {
         |    java.util.Arrays.sort($arr);
         |    long $best = 1L;
         |    long $run = 1L;
         |    for (int $i = 1; $i < $n; $i++) {
         |      if ($arr[$i] == $arr[$i - 1]) {
         |        $run++; if ($run > $best) $best = $run;
         |      } else { $run = 1L; }
         |    }
         |    ${ev.value} = $best;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MaxFreqL = copy(child = newChild)
}

object MaxFreqL {
  /** Install `maxfreq(array<bigint>) -> bigint` into the session's
    * function registry. Idempotent; also wired cluster-wide via
    * `spark.sql.extensions=graft.plans.GraftExtensions`.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "maxfreq",
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, "maxfreq takes exactly 1 argument")
        MaxFreqL(exprs.head)
      },
      "built-in")
}
