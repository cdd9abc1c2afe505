package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  // ---------- IVF index BUILD: deterministic distributed k-means ------

  /** Quantize an Array[Float] column to exact-integer space:
    * floor(x * scale) as bigint per element. Every downstream k-means
    * operation (dot products, sums, floor-divided means) then runs on
    * integers small enough to be EXACT in both bigint and double — the
    * property that lets a DuckDB oracle replay the whole training run
    * bit-identically (float means would drift on aggregation order).
    */
  private def quantized(df: DataFrame, idCol: String, vecCol: String,
                        scale: Long): DataFrame =
    df.select(col(idCol).cast("bigint").as("vid"),
      expr(s"transform($vecCol, x -> " +
        s"CAST(floor(CAST(x AS DOUBLE) * ${scale}L) AS BIGINT))").as("qv"))

  /** Nearest-centroid ids per row by INTEGER dot product, ties to the
    * lowest cid. One broadcast of k centroids + a per-row argmax window
    * (partition key = the vector id — cardinality scales with data).
    * `nprobe` > 1 keeps the n nearest lists (the query-side recall
    * knob); index build always uses 1.
    */
  private def assignQuantized(q: DataFrame, cents: Seq[(Int, Seq[Long])],
                              nprobe: Int = 1): DataFrame = {
    val spark = q.sparkSession
    import spark.implicits._
    val centDf = cents.toDF("cid", "ce")
    val scored = q.crossJoin(broadcast(centDf))
      .select(col("vid"), col("cid"),
        expr("doti(qv, ce)").as("d"))
    if (nprobe == 1)
      // the hot path (every training pass + every index encode): argmax
      // as a map-side-combinable max_by — no per-vid sort, the k-times
      // row blowup collapses inside each scan partition before the
      // exchange. Tie rule identical to the window form: max (d, -cid)
      // = highest dot, then lowest cid.
      scored.groupBy(col("vid"))
        .agg(max_by(col("cid"),
          struct(col("d"), (-col("cid")).as("nc"))).as("cid"))
        .select(col("vid"), col("cid"))
    else
      scored
        .withColumn("__rn", row_number().over(Window.partitionBy(col("vid"))
          .orderBy(col("d").desc, col("cid").asc)))
        .filter(col("__rn") <= nprobe)
        .select(col("vid"), col("cid"))
  }

  /** Distributed Lloyd's k-means over an embedding column, fully
    * deterministic (the round-4 gap: `ivfAssign` consumed centroids "a
    * sampled k-means" was assumed to have produced — this is that
    * trainer). Returns the k centroids in quantized integer space after
    * exactly `iters` iterations.
    *
    *  - init: the k vectors with the smallest md5(id) rank — a seeded
    *    sample any engine can reproduce;
    *  - assign: broadcast centroids, integer-dot argmax (no shuffle of
    *    vectors beyond the one argmax window keyed per vector id);
    *  - update: posexplode to (cid, dim) partial sums — map-side
    *    combinable, k x dim rows reach the driver per pass; means are
    *    floor(sum / n) (exact: both operands < 2^53); empty clusters
    *    keep their previous centroid.
    *
    * At 100 TB the per-pass cost is one broadcast join + one
    * map-combined aggregate; the driver holds only k x dim longs.
    */
  def kmeansQ(df: DataFrame, idCol: String, vecCol: String, k: Int,
              iters: Int, scale: Long = 1000000L): Seq[(Int, Seq[Long])] = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0; got $k/$iters")
    val q = quantized(df, idCol, vecCol, scale)
    var cents: Seq[(Int, Seq[Long])] = q
      .orderBy(md5(col("vid").cast("string")).asc, col("vid").asc)
      .limit(k).collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Long](1).toIndexedSeq) }.toSeq
    for (_ <- 1 to iters) {
      val means = assignQuantized(q, cents).join(q, "vid")
        .select(col("cid"), posexplode(col("qv")).as(Seq("pos0", "v")))
        .groupBy(col("cid"), (col("pos0") + 1).as("pos"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .select(col("cid"), col("pos"),
          expr("CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT)").as("mv"))
        .collect()
        .map(r => (r.getInt(0), r.getAs[Number]("pos").intValue())
          -> r.getLong(2)).toMap
      cents = cents.map { case (cid, ce) =>
        (cid, ce.indices.map(i => means.getOrElse((cid, i + 1), ce(i))))
      }
    }
    cents
  }

  /** Train MANY independent k-means runs in one set of Spark jobs.
    * `df` carries (gidCol, idCol, vecCol); each distinct gid is its own
    * training problem (e.g. the 8 PQ subspaces). Arithmetic is
    * group-wise IDENTICAL to [[kmeansQ]] on that group's slice — same
    * md5-ranked init (the rank depends only on the vector id, so a
    * per-group window equals the global order), same integer-dot
    * argmax, same floor-divided means, empty clusters keep their
    * centroid — asserted group-by-group in VectorOpsSpec. The point is
    * job count, which at 100 TB means corpus passes: g trainings cost
    * ONE scan per iteration (centroids of every group broadcast
    * together, one (gid, cid, pos) aggregate) instead of g scans —
    * for PQ, 8x fewer passes over the data.
    */
  def kmeansQMulti(df: DataFrame, gidCol: String, idCol: String,
                   vecCol: String, k: Int, iters: Int,
                   scale: Long = 1000000L): Map[Int, Seq[(Int, Seq[Long])]] = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0; got $k/$iters")
    val spark = df.sparkSession
    import spark.implicits._
    val q = df.select(col(gidCol).cast("int").as("gid"),
      col(idCol).cast("bigint").as("vid"),
      expr(s"transform($vecCol, x -> " +
        s"CAST(floor(CAST(x AS DOUBLE) * ${scale}L) AS BIGINT))").as("qv"))
    var cents: Map[Int, Seq[(Int, Seq[Long])]] = q
      .withColumn("__rn", row_number().over(Window.partitionBy(col("gid"))
        .orderBy(md5(col("vid").cast("string")).asc, col("vid").asc)))
      .filter(col("__rn") <= k)
      .select(col("gid"), (col("__rn") - 1).cast("int").as("cid"), col("qv"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2).toIndexedSeq))
      .groupBy(_._1)
      .map { case (g, rs) =>
        g -> rs.sortBy(_._2).map(t => (t._2, t._3)).toSeq }
    for (_ <- 1 to iters) {
      val centDf = cents.toSeq
        .flatMap { case (g, cs) => cs.map { case (cid, ce) => (g, cid, ce) } }
        .toDF("gid", "cid", "ce")
      // one scan: broadcast every group's centroids, per-row argmax
      // within the row's own group, then one (gid, cid, pos) aggregate
      val means = q.join(broadcast(centDf), "gid")
        .select(col("gid"), col("vid"), col("cid"), col("qv"),
          expr("doti(qv, ce)").as("d"))
        .groupBy(col("gid"), col("vid"))
        .agg(max_by(struct(col("cid"), col("qv")),
          struct(col("d"), (-col("cid")).as("nc"))).as("w"))
        .select(col("gid"), col("w.cid").as("cid"),
          posexplode(col("w.qv")).as(Seq("pos0", "v")))
        .groupBy(col("gid"), col("cid"), (col("pos0") + 1).as("pos"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .select(col("gid"), col("cid"), col("pos"),
          expr("CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT)").as("mv"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1),
          r.getAs[Number]("pos").intValue()) -> r.getLong(3)).toMap
      cents = cents.map { case (g, cs) =>
        g -> cs.map { case (cid, ce) =>
          (cid, ce.indices.map(i => means.getOrElse((g, cid, i + 1), ce(i))))
        }
      }
    }
    cents
  }

  /** Serving-side coarse assignment against TRAINED quantized centroids:
    * (idCol, cid) per input row, same integer-dot argmax as training so
    * index build and probe agree exactly.
    */
  def assignTrained(df: DataFrame, idCol: String, vecCol: String,
                    cents: Seq[(Int, Seq[Long])],
                    scale: Long = 1000000L, nprobe: Int = 1): DataFrame =
    assignQuantized(quantized(df, idCol, vecCol, scale), cents, nprobe)
      .withColumnRenamed("vid", idCol)

  /** IVF coarse assignment: nearest centroid per vector (max dot product;
    * unit-normalized inputs make this max cosine). `cents` must carry
    * (cid, ce) and be small enough to broadcast — at scale it is the
    * output of [[kmeansQ]]; here any deterministic centroid set.
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
