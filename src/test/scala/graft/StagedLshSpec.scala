package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The dedup-staged shared LSH pair frame must equal the raw build as a
  * SET — a minhash signature is a pure function of the text, so
  * exact-duplicate family members share every band key and the raw pair
  * set is exactly expand(canonical pairs) ∪ within-family pairs. This
  * is the staging contract all q21-family consumers (q38/q62/q95/q111/
  * q146/q149/q170/q173/q185) inherit.
  */
class StagedLshSpec extends AnyFunSuite with SparkSpec {

  private def pairs(dir: String, raw: Boolean): Set[(Long, Long)] = {
    if (raw) spark.conf.set("spark.graft.text.rawLsh", "true")
    else spark.conf.unset("spark.graft.text.rawLsh")
    try {
      queries.TextQueries.queries("q21_minhash_pairs")(spark, dir)
        .select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally spark.conf.unset("spark.graft.text.rawLsh")
  }

  test("staged LSH pair set equals the raw build on sf0.001") {
    val staged = pairs(sf, raw = false)
    val raw = pairs(sf, raw = true)
    assert(staged == raw)
    assert(staged.nonEmpty)
  }

  private def clusters(dir: String, raw: Boolean): Set[(Long, Long)] = {
    if (raw) spark.conf.set("spark.graft.text.rawLsh", "true")
    else spark.conf.unset("spark.graft.text.rawLsh")
    try {
      queries.SamplingQueries.queries("q62_dup_clusters")(spark, dir)
        .select("doc_id", "cluster")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally spark.conf.unset("spark.graft.text.rawLsh")
  }

  test("canonical-grain q62 components equal the raw-graph components") {
    val staged = clusters(sf, raw = false)
    val raw = clusters(sf, raw = true)
    assert(staged == raw)
    assert(staged.nonEmpty)
  }

  test("canonical-grain q62 equals raw on a clone corpus") {
    val dir = "/tmp/graft-test-lsh-clone3"
    val docs = Tables.documents(spark, sf)
    (0 until 3).map(i => docs.withColumn("doc_id",
        col("doc_id") * 10 + lit(i.toLong)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val staged = clusters(dir, raw = false)
    val raw = clusters(dir, raw = true)
    assert(staged == raw)
    // every doc is in a 3-member family -> every doc is a vertex
    assert(staged.size == 3 * docs.count())
  }

  private def tuning(dir: String, raw: Boolean): Set[Seq[Long]] = {
    if (raw) spark.conf.set("spark.graft.text.rawLsh", "true")
    else spark.conf.unset("spark.graft.text.rawLsh")
    try {
      queries.TextQueries.queries("q170_lsh_tuning")(spark, dir)
        .select("bands", "rows_per_band", "n_cand", "n_true",
          "n_true_union", "n_missed")
        .collect()
        .map(r => Seq(r.getInt(0).toLong, r.getInt(1).toLong,
          r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toSet
    } finally spark.conf.unset("spark.graft.text.rawLsh")
  }

  test("canonical-grain q170 counts equal the raw computation, " +
    "including on a clone corpus") {
    assert(tuning(sf, raw = false) == tuning(sf, raw = true))
    val dir = "/tmp/graft-test-lsh-clone3b"
    val docs = Tables.documents(spark, sf)
    (0 until 3).map(i => docs.withColumn("doc_id",
        col("doc_id") * 10 + lit(i.toLong)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val staged = tuning(dir, raw = false)
    val raw = tuning(dir, raw = true)
    assert(staged == raw)
  }

  test("q196 incremental near-dup: verdict/count invariants, and a " +
    "planted corpus clone of a batch doc is found") {
    import spark.implicits._
    val rows = queries.TextQueries
      .queries("q196_incremental_neardup")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nCand, nVer, bm, dup) =>
      assert(nVer <= nCand, s"doc $id")
      assert(dup == (nVer > 0) && dup == (bm >= 0L), s"doc $id")
    }
    // planted case: one batch doc's exact text also exists in the
    // corpus side -> it MUST flag with best_match = the planted id
    val dir = "/tmp/graft-test-incnd"
    val base = Tables.documents(spark, sf)
    val batchDoc = base
      .filter(queries.SamplingQueries.hashBucket("doc_id", 21, 10) === 7)
      .orderBy(col("doc_id")).limit(1).collect()(0)
    val bid = batchDoc.getAs[Long]("doc_id")
    // forge an UNUSED corpus-side id (bucket != 7) holding the same text
    val maxId = base.agg(max(col("doc_id"))).as[Long].head()
    val forged = (maxId + 1 to maxId + 2000).find { cand =>
      base.sparkSession.range(1).select(
        queries.SamplingQueries.hashBucket(cand.toString, 21, 10))
        .as[Long].head() != 7
    }.get
    base.unionByName(base.filter(col("doc_id") === bid)
        .withColumn("doc_id", lit(forged)))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = queries.TextQueries
      .queries("q196_incremental_neardup")(spark, dir)
      .filter(col("doc_id") === bid).collect()(0)
    assert(out.getBoolean(4), "planted clone must flag")
    assert(out.getLong(3) <= forged, "best match at or below the plant")
  }

  test("staged LSH pair set equals the raw build on a clone corpus") {
    val dir = "/tmp/graft-test-lsh-clone3"
    val docs = Tables.documents(spark, sf)
    (0 until 3).map(i => docs.withColumn("doc_id",
        col("doc_id") * 10 + lit(i.toLong)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val staged = pairs(dir, raw = false)
    val raw = pairs(dir, raw = true)
    assert(staged == raw)
    // every family contributes its C(3,2) within-family pairs
    assert(staged.size >= 3 * docs.count())
  }
}
