package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** BPE-style vocabulary induction (the classic byte-pair-encoding merge
  * loop tokenizer training runs before any LLM corpus is tokenized):
  * learn the top merge pairs by repeatedly (a) counting adjacent symbol
  * pairs across the vocabulary, weighted by word frequency, and
  * (b) merging the most frequent pair everywhere it occurs.
  *
  * The counting step is a custom typed `Aggregator` ([[PairCountAgg]]):
  * each partition folds its words into a local pair→count map (map-side
  * combine), and only those maps — bounded by the symbol-pair vocabulary,
  * not the corpus — cross the wire and merge. That is the shape a custom
  * aggregate exists for: per-group state a built-in can't express,
  * partially aggregable so 100 TB of input never converges on one task.
  *
  * Scale shape: the merge loop runs on the (word, freq) VOCABULARY
  * table, not the corpus (standard BPE) — one corpus-wide groupBy up
  * front, then each round is one small aggregate + one map-side string
  * rewrite. Cross-engine determinism: merge application is plain
  * `replace` on a doubled-separator form (below), exact integer counts,
  * ties broken (count desc, pair asc) — so a SQL oracle replays the
  * identical training run.
  */
object Bpe {

  case class Merge(merge_round: Int, lft: String, rgt: String,
                   merged: String, cnt: Long)

  /** Adjacent-pair counting over (symbols-string, freq) rows. The buffer
    * is the pair→count map itself; `reduce` walks one word's symbols,
    * `merge` unions partition maps. Bounded by distinct adjacent pairs
    * (≤ symbol-vocab²), independent of corpus size.
    */
  class PairCountAgg extends Aggregator[(String, Long),
      Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long],
                        in: (String, Long)): Map[String, Long] = {
      val tk = in._1.split(' ')
      var m = b
      var i = 0
      while (i < tk.length - 1) {
        val k = tk(i) + " " + tk(i + 1)
        m = m.updated(k, m.getOrElse(k, 0L) + in._2)
        i += 1
      }
      m
    }
    override def merge(a: Map[String, Long],
                       b: Map[String, Long]): Map[String, Long] =
      b.foldLeft(a) { case (m, (k, v)) =>
        m.updated(k, m.getOrElse(k, 0L) + v)
      }
    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** word → space-joined single-char symbols + the ' </w>' end-of-word
    * marker (so merges can learn word-final units). */
  private[graft] def symbolize: Column =
    expr("concat(concat_ws(' ', transform(sequence(1, length(word)), " +
      "i -> substring(word, i, 1))), ' </w>')")

  /** Merge adjacent pair (a, b) → ab, left-to-right non-overlapping —
    * BPE's defined order ("a a a" merges to "aa a", not "a aa").
    *
    * Plain `replace` can't do this on single-space symbols (overlapping
    * occurrences share their boundary space), so the string is rewritten
    * with DOUBLED separators first: every occurrence " a  b " then owns
    * one boundary space on each side, occurrences cannot overlap, and
    * any all-occurrences replace implementation yields the same result —
    * the property that makes this exactly mirrorable in SQL. The
    * replacement " ab " leaves doubled separators intact around it, so
    * one final collapse of "  "→" " + trim restores canonical form.
    */
  private[graft] def applyMerge(s: Column, a: String, b: String): Column =
    trim(replace(replace(
      concat(lit(" "), replace(s, lit(" "), lit("  ")), lit(" ")),
      lit(s" $a  $b "), lit(s" $a$b ")),
      lit("  "), lit(" ")))

  /** Learn `rounds` merges from the corpus. `vocabCap` bounds the
    * vocabulary to the top-N words by (freq desc, word asc) — the merge
    * statistics at real scale come from the full vocab table, which is
    * already tiny relative to the corpus; the cap only bounds the
    * unrolled SQL oracle.
    */
  def learn(docs: DataFrame, textCol: String, rounds: Int,
            vocabCap: Int): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var v = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word").asc)
      .limit(vocabCap)
      .select(col("word"), col("freq"), symbolize.as("s"))
    val pairAgg = new PairCountAgg().toColumn
    val out = Seq.newBuilder[Merge]
    for (r <- 1 to rounds) {
      val counts = v.select(col("s"), col("freq")).as[(String, Long)]
        .select(pairAgg).collect()(0)
      if (counts.nonEmpty) {
        // deterministic winner: max count, ties to the lexicographically
        // smallest pair (ASCII corpus → engine-independent ordering)
        val (pair, cnt) = counts.minBy { case (p, c) => (-c, p) }
        val Array(a, b) = pair.split(' ') // symbols never contain spaces
        out += Merge(r, a, b, a + b, cnt)
        v = v.withColumn("s", applyMerge(col("s"), a, b))
      }
    }
    out.result()
  }
}
