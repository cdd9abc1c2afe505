package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q195 LM-perplexity scoring: the quality signal must behave like a
  * perplexity — repetitive (LM-predictable) text scores LOW, novel
  * token sequences score HIGH — and the tercile bucketing must
  * partition the corpus deterministically.
  */
class LmPerplexitySpec extends AnyFunSuite with SparkSpec {

  test("terciles partition sf0.001; exact duplicates share a score") {
    val out = queries.CorpusQueries.queries("q195_lm_perplexity")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val n = Tables.documents(spark, sf).count()
    assert(out.length == n)
    val byBucket = out.groupBy(_._5).view.mapValues(_.length).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    // terciles: each bucket within ±(distinct-score granularity) of n/3;
    // ties share a bucket so allow a loose band
    byBucket.values.foreach(c =>
      assert(c >= n / 6 && c <= n / 2, byBucket.toString))
    // bucket boundaries respect score order
    val maxHead = out.filter(_._5 == "head").map(_._4).max
    val minMiddle = out.filter(_._5 == "middle").map(_._4).min
    val maxMiddle = out.filter(_._5 == "middle").map(_._4).max
    val minTail = out.filter(_._5 == "tail").map(_._4).min
    assert(maxHead < minMiddle && maxMiddle < minTail)
  }

  test("repetitive text scores lower than novel text under the corpus LM") {
    import spark.implicits._
    val dir = "/tmp/graft-test-lm"
    // 30 fluent docs sharing a repetitive phrase distribution + 1 doc of
    // corpus-unseen singleton tokens: the singleton doc's bigrams all
    // have c12 = 1 against big smoothing mass -> max surprisal
    val docs = ((1 to 30).map(i =>
      (i.toLong, ("the cat sat on the mat " * 10).trim, "en", "web", 100)) :+
      ((99L, (1 to 40).map(j => s"zqx$j").mkString(" "), "en", "web", 100)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = queries.CorpusQueries.queries("q195_lm_perplexity")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getString(4))).toMap
    // all repetitive docs share one score (identical text -> identical
    // bigram stream) and sit strictly below the novel doc
    val repScores = (1 to 30).map(i => out(i.toLong)._1).distinct
    assert(repScores.size == 1)
    assert(repScores.head < out(99L)._1)
    assert(out(99L)._2 == "tail")
  }
}
