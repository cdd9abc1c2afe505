package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression,
  UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprinter (Schleimer et al., MOSS): the distinct
  * window-minima of a rolling Karp–Rabin hash over a document's k-gram
  * stream, in ONE O(n) pass per document.
  *
  * Why an Expression (VERDICT r7 #1): the SQL formulation hashed every
  * position with `conv(substr(md5(CAST(substr(text,i,k) AS BINARY)),1,8),
  * 16,10)` — an md5 plus two string slices PER CHARACTER POSITION, the
  * suite's worst real line (10.5–14 s isolated at sf0.1). The MOSS paper
  * uses a rolling hash precisely so position i+1 costs O(1) given
  * position i; this expression implements that recurrence natively and
  * emits the winnowed (distinct window-min) fingerprint array directly,
  * inside whole-stage codegen via a static-forwarder call — no boxing,
  * no per-position allocation.
  *
  * Hash contract (oracle-replayable, integer-exact): over Unicode code
  * points c_1..c_n,
  *   h(i) = fold(j = 0..k-1, h = 0: h ← (h·257 + c_{i+j}) mod (2^31 − 1))
  * and the fingerprint set is distinct{ min(h(j..j+w−1)) : windows j }.
  * DuckDB replays h(i) positionally as k nested `(acc*257 +
  * ascii(substr(text,i+j,1))) % 2147483647` steps — identical integer
  * arithmetic, so parity is bit-exact. 31-bit hashes collide ~n²/2³² per
  * corpus slice; collisions are IDENTICAL in both engines (same
  * recurrence), so cross-engine parity is unaffected — they only add the
  * odd spurious shared fingerprint, absorbed by the ≥ 3 reporting floor.
  *
  * Docs shorter than k+w−1 code points yield an empty array (no complete
  * window exists).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, "winnowfp: k and w must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnowfp expects a string column, got ${t.catalogString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    WinnowFingerprints.compute(s.asInstanceOf[UTF8String], k, w)

  // single static call (Scala companion forwarder) — stays inside the
  // whole-stage-codegen pipeline like Spark's own util-backed exprs
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.WinnowFingerprints.compute($c, $k, $w)")

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprints = copy(child = newChild)
}

object WinnowFingerprints {
  private val M = 2147483647L // 2^31 − 1 (Mersenne prime)
  private val B = 257L

  /** One-pass winnowing over code points; see class doc for the exact
    * recurrence. Returns the SORTED distinct window minima (order is
    * irrelevant to every consumer — the array is exploded into a set).
    */
  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val m = cps.length - k + 1
    if (m < w) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    // B^(k-1) mod M — the factor that retires the window's leading char
    var p = 1L
    var j = 1
    while (j < k) { p = p * B % M; j += 1 }
    val h = new Array[Long](m)
    var hh = 0L
    j = 0
    while (j < k) { hh = (hh * B + cps(j)) % M; j += 1 }
    h(0) = hh
    var i = 1
    while (i < m) {
      hh = ((hh - cps(i - 1) * p % M + M) % M * B + cps(i + k - 1)) % M
      h(i) = hh
      i += 1
    }
    // sliding window minima (w is small — 4 in q199 — so the direct
    // w-scan beats a deque), then sort + dedupe in place
    val nw = m - w + 1
    val mins = new Array[Long](nw)
    i = 0
    while (i < nw) {
      var mn = h(i)
      var t = 1
      while (t < w) { val v = h(i + t); if (v < mn) mn = v; t += 1 }
      mins(i) = mn
      i += 1
    }
    java.util.Arrays.sort(mins)
    var out = 0
    i = 0
    while (i < nw) {
      if (i == 0 || mins(i) != mins(i - 1)) { mins(out) = mins(i); out += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (out == nw) mins else java.util.Arrays.copyOf(mins, out))
  }

  /** Install `winnowfp(text, k, w) -> array<bigint>` into the session's
    * function registry. Idempotent; also wired cluster-wide via
    * `spark.sql.extensions=graft.plans.GraftExtensions`.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnowfp", WinnowFingerprints.build _, "built-in")

  private[plans] def build(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.IntegerType
    require(exprs.length == 3, "winnowfp takes exactly 3 arguments")
    (exprs(1), exprs(2)) match {
      case (Literal(k: Int, IntegerType), Literal(w: Int, IntegerType)) =>
        WinnowFingerprints(exprs.head, k, w)
      case _ => throw new IllegalArgumentException(
        "winnowfp: k and w must be integer literals")
    }
  }
}
