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

  test("exact dedup groups exact copies only") {
    val out = graft.operators.Dedup.exactByHash(docs, "text", "doc_id")
    assert(out.count() == 3)
    assert(out.filter(col("dup_count") === 2)
      .select("canonical_id").collect().head.getLong(0) == 1L)
  }
}
