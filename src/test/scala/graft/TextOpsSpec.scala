package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Text

/** Semantic checks for the text/dedup operators on planted fixtures. */
class TextOpsSpec extends AnyFunSuite with SparkSpec {

  private def docs = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the river " +
      "bank while birds sing in the tall green trees every morning"
    Seq(
      (1L, base),
      (2L, base.replace("morning", "evening")), // near-dup of 1
      (3L, "completely different content about spark query engines and " +
        "distributed columnar execution with vectorized readers"),
      (4L, base) // exact dup of 1
    ).toDF("doc_id", "text")
  }

  test("minhash LSH recovers planted near-dup and exact-dup pairs") {
    val sh = Text.wordShingles(docs, "doc_id", "text", 3)
    val sig = Text.minhashSignature(sh, "doc_id", 16)
    val pairs = Text.lshCandidatePairs(
        Text.lshBands(sig, "doc_id", 4, 4), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)), "exact dup must collide in every band")
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)),
      "near dup should collide in some band")
    assert(!pairs.contains((1L, 3L)), "unrelated docs must not pair")
  }

  test("simhash: identical docs equal, near-dups close in hamming distance") {
    val fp = Text.simhash(docs, "doc_id", "text", 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(4L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fp(1L), fp(2L)) < hamming(fp(1L), fp(3L)),
      "near-dup must be closer than unrelated doc")
  }

  test("LSH recall: every true high-Jaccard pair is a candidate (sf0.001)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    // ground truth: exact trigram Jaccard over ALL pairs sharing >= 1
    // trigram (500 docs — cheap at smoke scale)
    val tri = Text.wordShingles(docs, "doc_id", "text", 3)
    val n = tri.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = tri.select(col("doc_id").as("doc_a"), col("sh"))
    val b = tri.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val truth = a.join(b, col("sh") === col("sh_b")
        && col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      .join(n.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(n.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jac",
        col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jac") >= 0.5)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val candidates = SparkEntry.queries("q21_minhash_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = truth -- candidates
    assert(missed.isEmpty,
      s"LSH(16 hashes, 4x4) missed ${missed.size}/${truth.size} " +
        s"true jac>=0.5 pairs: ${missed.take(5)}")
    assert(truth.nonEmpty, "smoke data should contain high-jaccard pairs")
  }

  test("exact dedup groups exact copies only") {
    val out = graft.operators.Dedup.exactByHash(docs, "text", "doc_id")
    assert(out.count() == 3)
    assert(out.filter(col("dup_count") === 2)
      .select("canonical_id").collect().head.getLong(0) == 1L)
  }
}
