package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: `interlen(a, b)` — the number of DISTINCT
  * common values of two SORTED `array<bigint>` columns, by a single
  * linear merge scan.
  *
  * Why an Expression: `size(array_intersect(a, b))` is semantically
  * identical but builds a boxed hash set per ROW PAIR — in q190's
  * verify leg that's once per candidate pair (~1.5 M pairs × ~60-element
  * arrays at sf0.1), the suite's most expensive line. The inputs there
  * are already `sort_array(collect_set(...))` frames, so the distinct
  * sorted-merge count is free of both allocation and boxing and stays
  * inside whole-stage codegen via a static-forwarder call (the
  * maxfreq/winnowfp precedent).
  *
  * Contract: both arrays must be sorted ascending (duplicates allowed —
  * equal runs are counted once, matching array_intersect's DISTINCT
  * semantics). NULL if either array or any element is NULL.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"interlen expects two array<bigint>, got ${l.catalogString} " +
          s"and ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val r = SortedIntersectCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |final long $r = graft.plans.SortedIntersectCount.compute($a, $b);
         |if ($r < 0) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Distinct-match merge count over two ascending arrays; −1 signals a
    * NULL element (mapped to SQL NULL by the caller). */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      if (a.isNullAt(i) || b.isNullAt(j)) return -1L
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        n += 1
        val m = x
        while (i < na && !a.isNullAt(i) && a.getLong(i) == m) i += 1
        while (j < nb && !b.isNullAt(j) && b.getLong(j) == m) j += 1
      }
    }
    // a trailing null in the unscanned region still poisons the result
    while (i < na) { if (a.isNullAt(i)) return -1L; i += 1 }
    while (j < nb) { if (b.isNullAt(j)) return -1L; j += 1 }
    n
  }

  /** Install `interlen(array<bigint>, array<bigint>) -> bigint`.
    * Idempotent; also wired via GraftExtensions. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "interlen", SortedIntersectCount.build _, "built-in")

  private[plans] def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "interlen takes exactly 2 arguments")
    SortedIntersectCount(exprs.head, exprs(1))
  }
}
