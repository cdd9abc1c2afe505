package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q199 winnowing fingerprints: the Schleimer/MOSS guarantee — any
  * verbatim-shared substring of length ≥ w+k−1 (= 11 chars at k=8, w=4)
  * spans at least one complete identical hash window in both documents,
  * whose minimum is selected in both, so the pair CANNOT escape the
  * inverted index. Plus structural invariants of the pair output.
  */
class WinnowSpec extends AnyFunSuite with SparkSpec {

  private def run(dir: String) =
    queries.TextQueries.queries("q199_winnow_fingerprints")(spark, dir)

  test("planted shared substring is guaranteed to be detected") {
    val dir = "/tmp/graft-test-winnow"
    val shared = "the quick brown fox jumps over the lazy dog near " +
      "the riverbank while seventeen herons watch in silence today"
    // docs 1 and 2 share a 100+ char block inside otherwise-disjoint
    // text; doc 3 shares nothing with either
    val rows = Seq(
      (1L, s"alpha beta gamma delta $shared epsilon zeta eta theta"),
      (2L, s"one two three four five six $shared seven eight nine ten"),
      (3L, "completely unrelated content with no overlap whatsoever " +
        "in any eleven character span of this standalone text body"))
    spark.createDataFrame(rows).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = run(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the (1,2) pair must surface — the shared block yields far more
    // than the 3-shared-fingerprint reporting floor
    assert(pairs.exists { case (a, b, _) => a == 1L && b == 2L })
    // doc 3 shares no 11-char span with anything
    assert(!pairs.exists { case (a, b, _) => a == 3L || b == 3L })
  }

  test("pair output is canonical and deterministic on sf0.001") {
    val out = run(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (a, b, n) =>
      assert(a < b, s"pair not canonical: ($a, $b)")
      assert(n >= 3, s"below reporting floor: ($a, $b, $n)")
    }
    // no duplicate pairs
    assert(out.map(t => (t._1, t._2)).distinct.length == out.length)
    val again = run(sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sorted.toSeq == again.sorted.toSeq)
  }

  test("fingerprint density: a doc shorter than k+w-1 emits nothing") {
    val dir = "/tmp/graft-test-winnow-short"
    val rows = Seq((1L, "tiny text"), (2L, "tiny text"))
    spark.createDataFrame(rows).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // 9-char docs carry one 8-gram but no complete 4-hash window —
    // they produce no fingerprints, hence no pairs (and no crash)
    assert(run(dir).count() == 0)
  }
}
