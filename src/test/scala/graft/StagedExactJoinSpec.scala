package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** The dedup-first staging contract (VERDICT r6 #2): the staged q190
  * path — exact-dedup, canonical-grain prefix-filter join, expansion —
  * must be BIT-IDENTICAL to the unstaged join, including on a corpus
  * with exact-duplicate families (the adversarial input the staging
  * exists for; /root/testdata has few exact dups, so the clone case is
  * synthesized here).
  */
class StagedExactJoinSpec extends AnyFunSuite with SparkSpec {

  private def runQ190(dir: String, raw: Boolean): Set[(Long, Long, Long, Long, Long)] = {
    if (raw) spark.conf.set("spark.graft.text.rawExactJoin", "true")
    else spark.conf.unset("spark.graft.text.rawExactJoin")
    try {
      queries.TextQueries.queries("q190_prefix_filter_join")(spark, dir)
        .select("doc_a", "doc_b", "inter", "na", "nb")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .toSet
    } finally spark.conf.unset("spark.graft.text.rawExactJoin")
  }

  test("staged q190 equals raw q190 on sf0.001") {
    val staged = runQ190(sf, raw = false)
    val raw = runQ190(sf, raw = true)
    assert(staged == raw)
    assert(staged.nonEmpty)
  }

  test("staged q190 equals raw q190 on a clone corpus with exact-dup families") {
    // 3 copies of every sf0.001 doc, shifted ids — every family has
    // fsize 3, so within-family expansion and cross-family swap logic
    // both get exercised (including pairs whose raw ordering flips
    // relative to the canonical one via the interleaved id ranges).
    val dir = "/tmp/graft-test-clone3"
    val docs = Tables.documents(spark, sf)
    (0 until 3).map(i => docs.withColumn("doc_id",
        col("doc_id") * 10 + lit(i.toLong)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val staged = runQ190(dir, raw = false)
    val raw = runQ190(dir, raw = true)
    assert(staged == raw)
    // every family contributes its C(3,2) = 3 within-family pairs
    val nDocs = docs.count()
    assert(staged.size >= 3 * nDocs)
  }

  test("canonicalInput collapses families losslessly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (7L, "a b c"),
      (3L, "x y"), (4L, "z"), (5L, "z")
    ).toDF("doc_id", "text")
    val (canon, members) = Curation.canonicalInput(docs)
    assert(canon.select("doc_id").as[Long].collect().toSet == Set(1L, 3L, 4L))
    val m = members.collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("canon"), r.getAs[Long]("fsize")))).toMap
    assert(m == Map(1L -> (1L, 3L), 2L -> (1L, 3L), 7L -> (1L, 3L),
      3L -> (3L, 1L), 4L -> (4L, 2L), 5L -> (4L, 2L)))
    val within = Curation.withinFamilyPairs(members, "doc_id", "a", "b")
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(within == Set((1L, 2L), (1L, 7L), (2L, 7L), (4L, 5L)))
  }

  test("expandPairs swaps per-side payload when raw ordering flips") {
    import spark.implicits._
    // families A = {10, 31}, B = {20, 21}: canonical pair (10, 20) with
    // na = 3, nb = 5 must expand to 4 raw pairs, with (na, nb) swapped
    // exactly for (20, 31) and (21, 31) where the B member is smaller.
    val members = Seq((10L, 10L, 2L), (31L, 10L, 2L),
      (20L, 20L, 2L), (21L, 20L, 2L)).toDF("doc_id", "canon", "fsize")
    val verdicts = Seq((10L, 20L, 2L, 3L, 5L))
      .toDF("doc_a", "doc_b", "inter", "na", "nb")
    val out = Curation.expandPairs(verdicts, members, "doc_id",
      "doc_a", "doc_b", Seq(("na", "nb")))
      .select("doc_a", "doc_b", "inter", "na", "nb")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (10L, 20L, 2L, 3L, 5L), (10L, 21L, 2L, 3L, 5L),
      (20L, 31L, 2L, 5L, 3L), (21L, 31L, 2L, 5L, 3L)))
  }
}
