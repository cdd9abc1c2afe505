package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bpe

/** Distributed BPE vs a naive in-memory reference implementation. */
class BpeSpec extends AnyFunSuite with SparkSpec {

  // reference: single-threaded textbook BPE over a word list
  private def mergeList(syms: List[String], a: String,
                        b: String): List[String] = syms match {
    case x :: y :: rest if x == a && y == b =>
      (a + b) :: mergeList(rest, a, b) // left-to-right, non-overlapping
    case x :: rest => x :: mergeList(rest, a, b)
    case Nil => Nil
  }

  private def refBpe(words: Seq[String],
                     rounds: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[List[String], Long] = words.groupBy(identity).map {
      case (w, ws) =>
        (w.map(_.toString).toList :+ "</w>") -> ws.size.toLong
    }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, f) <- vocab; pair <- syms.sliding(2)
           if pair.size == 2)
        counts((pair.head, pair(1))) =
          counts.getOrElse((pair.head, pair(1)), 0L) + f
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.minBy { case ((x, y), n) =>
          (-n, x + " " + y) }
        out += ((r, a, b, c))
        vocab = vocab.map { case (syms, f) => mergeList(syms, a, b) -> f }
      }
    }
    out.result()
  }

  private val corpus: Seq[String] =
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest") ++ Seq("a")

  test("learned merges equal the textbook reference, in order") {
    import spark.implicits._
    val docs = Seq(corpus.mkString(" ")).toDF("text")
    val got = Bpe.learn(docs, "text", rounds = 6, vocabCap = 100)
      .map(m => (m.merge_round, m.lft, m.rgt, m.cnt))
    val want = refBpe(corpus, 6)
    assert(got == want, s"got $got\nwant $want")
    // sanity on the classic example: 'est' forms within 3 rounds
    val merged3 = Bpe.learn(docs, "text", 3, 100).map(_.merged)
    assert(merged3.exists(m => m.contains("es") || m.contains("st")),
      merged3.toString)
  }

  test("pair counting is partition-invariant (map-side combine)") {
    import spark.implicits._
    // one word per row, spread over 7 partitions: the Aggregator's
    // merge path must reproduce the single-partition counts exactly
    val docs = corpus.toDF("text").repartition(7)
    val got = Bpe.learn(docs, "text", rounds = 4, vocabCap = 100)
      .map(m => (m.merge_round, m.lft, m.rgt, m.cnt))
    assert(got == refBpe(corpus, 4))
  }

  test("merge application is left-to-right on repeats") {
    import spark.implicits._
    // "aaa" -> symbols "a a a </w>"; merging (a, a) must give
    // "aa a </w>", never "a aa </w>"
    val df = Seq(("aaa", 1L)).toDF("word", "freq")
      .select(col("word"), col("freq"), Bpe.symbolize.as("s"))
    val s = df.select(Bpe.applyMerge(col("s"), "a", "a"))
      .collect().head.getString(0)
    assert(s == "aa a </w>", s)
  }

  test("q115 is deterministic and emits one row per round") {
    val a = SparkEntry.queries("q115_bpe_merges")(spark, sf).collect()
    val b = SparkEntry.queries("q115_bpe_merges")(spark, sf).collect()
    assert(a.length == 5)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("q119 encode: merges only ever shrink the symbol count") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val enc = SparkEntry.queries("q119_bpe_encode")(spark, sf)
    // upper bound: zero merges = chars + </w> per word occurrence;
    // every merge application can only reduce token counts, and at
    // least one of the 5 learned merges must actually fire somewhere
    val bounds = docs
      .select(col("doc_id"),
        explode(split(col("text"), " ")).as("word"))
      .groupBy(col("doc_id"))
      .agg(sum(length(col("word")) + 1).as("raw_syms"))
    val joined = enc.join(bounds, "doc_id")
    assert(joined.filter(col("n_bpe_tokens") > col("raw_syms"))
      .count() === 0L)
    assert(joined.filter(col("n_bpe_tokens") < col("raw_syms"))
      .count() > 0L, "no merge ever fired — encode is a no-op")
    assert(enc.count() === docs.count())
  }
}
