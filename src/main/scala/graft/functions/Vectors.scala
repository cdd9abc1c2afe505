package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-similarity building blocks (`Array[Float]` columns).
  *
  * Determinism: dot products are sequential left folds in index order
  * (`aggregate` over `zip_with`), so results are bit-identical to the
  * DuckDB oracle's `list_reduce(list_transform(...))` — parallel/pairwise
  * summation would not be. All elements are cast to double before any
  * arithmetic.
  *
  * Scale notes (100 TB): brute-force cosine is the correctness baseline —
  * a broadcast of the query vector + one codegen'd projection, no shuffle.
  * The scale path is sign-bit LSH bucketing: a deterministic 2^nbits
  * partitioning computed per-row at scan time; candidate generation
  * becomes a bucket-equality join (shuffle keyed on a small int), after
  * which exact cosine re-ranks within buckets. An IVF variant would swap
  * the sign-bucket for nearest-centroid assignment; the plumbing
  * (bucket → join → re-rank) is identical.
  */
object Vectors {

  /** Sequential-fold dot product as composable built-ins — the
    * correctness reference for `dotf` (bit-identical results; see
    * VectorOpsSpec). The higher-order lambdas are CodegenFallback, so
    * the hot path uses the native expression below instead. */
  def foldDotExpr(a: String, b: String): String =
    s"""aggregate(
       |  zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
       |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin

  /** Native codegen'd dot product (graft.plans.DotProductF, registered
    * as `dotf` by GraftExtensions): same index-order arithmetic as the
    * fold, emitted as a straight Java loop. */
  def dotExpr(a: String, b: String): String = s"dotf($a, $b)"

  def dot(a: String, b: String): Column = expr(dotExpr(a, b))

  /** Euclidean norm. */
  def norm(a: String): Column = sqrt(expr(dotExpr(a, a)))

  /** cosine(a, b) = dot / (|a| * |b|) — identical expression shape on the
    * oracle side. */
  def cosine(a: String, b: String): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Sign-bit LSH bucket over the first `nbits` dimensions:
    * bit i set iff element (i+1) >= 0. Deterministic, no model state. */
  def signBucket(a: String, nbits: Int): Column =
    (0 until nbits)
      .map(i => when(expr(s"try_element_at($a, ${i + 1})") >= 0f,
        lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _)

  /** IVF coarse assignment: nearest centroid per vector (max dot product;
    * unit-normalized inputs make this max cosine). `cents` must carry
    * (cid, ce) and be small enough to broadcast — at scale it is the
    * output of a sampled k-means; here any deterministic centroid set.
    * Ties broken by lowest cid (total order → oracle-stable).
    */
  def ivfAssign(vectors: org.apache.spark.sql.DataFrame, vecCol: String,
                idCol: String,
                cents: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = vectors.crossJoin(broadcast(cents))
      .select(col(idCol), col("cid"), dot(vecCol, "ce").as("dsim"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("dsim").desc, col("cid").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("cid"))
  }
}
