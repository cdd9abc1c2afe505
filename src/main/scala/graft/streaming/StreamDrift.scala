package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.SamplingQueries

/** Streaming distribution-drift monitor: the streaming twin of q137's
  * batch audit. Incoming documents are tokenized and feature-hashed
  * per row (stateless — the same md5 64-bucket function as the batch
  * audit), then ONE windowed aggregation holds 64 bucket counters +
  * the window token total per tumbling event-time window; verdicts
  * against a broadcast reference distribution are computed map-side
  * AFTER the aggregation, so the whole monitor is a single stateful
  * operator.
  *
  * Drift per (window, bucket) uses q137's cross-multiplied
  * total-variation test |100·cur_b·R − 100·ref_b·C| > R·C (bucket
  * share moved by more than 1 percentage point vs the reference) — all
  * integer, so streaming verdicts are bit-identical to the batch audit
  * over the same rows (asserted in StreamDriftSpec).
  *
  * All 64 buckets emit every window — including zero-count ones, which
  * is how a VANISHED token family (cur share 0 vs ref share > 1%)
  * flags; a drifted window is the gate that pauses ingestion before a
  * bad drop poisons the corpus mixture (the q137 story, live).
  *
  * State bound (the 100 TB concern): 64 longs + a count per OPEN
  * window, independent of stream rate — the per-row explode is
  * stateless, and the conditional-sum aggregation is map-side combined
  * before the single keyed exchange.
  */
object StreamDrift {

  val NBuckets = 64

  private def d18(c: Column) = c.cast("decimal(18,0)")

  /** DENSE per-bucket reference counts + total from a batch corpus —
    * all `NBuckets` rows present (unseen buckets carry 0), broadcast
    * to the stream side.
    */
  def referenceFrom(docs: DataFrame, textCol: String): DataFrame = {
    val toks = docs.select(explode(split(col(textCol), " ")).as("tok"))
      .select(SamplingQueries.hashBucket("tok", 1, NBuckets).as("b"))
    val seen = toks.groupBy(col("b")).agg(count(lit(1)).as("ref_b"))
    docs.sparkSession.range(NBuckets).select(col("id").cast("long").as("b"))
      .join(seen, Seq("b"), "left_outer")
      .select(col("b"), coalesce(col("ref_b"), lit(0L)).as("ref_b"))
      .crossJoin(broadcast(toks.agg(count(lit(1)).as("rr"))))
  }

  /** (window_start, b, ref_b, cur_b, drifted) per tumbling window of
    * `windowDur`, watermarked by `delay`. `stream` needs (ts, text);
    * `reference` is [[referenceFrom]]'s frame.
    */
  def drift(stream: DataFrame, reference: DataFrame, windowDur: String,
            delay: String): DataFrame = {
    val bucketed = stream
      .select(col("ts"), explode(split(col("text"), " ")).as("tok"))
      .select(col("ts"),
        SamplingQueries.hashBucket("tok", 1, NBuckets).as("b"))
    val counters = (0 until NBuckets).map(i =>
      sum(when(col("b") === i, 1L).otherwise(0L)).as(s"c$i")) :+
      count(lit(1)).as("cc")
    bucketed
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowDur))
      .agg(counters.head, counters.tail: _*)
      .select(col("window.start").as("window_start"), col("cc"),
        expr((0 until NBuckets).map(i => s"c$i")
          .mkString("array(", ", ", ")")).as("cur"))
      .select(col("window_start"), col("cc"),
        posexplode(col("cur")).as(Seq("b", "cur_b")))
      .join(broadcast(reference), Seq("b"))
      .select(col("window_start"), col("b").cast("long").as("b"),
        col("ref_b"), col("cur_b"),
        (abs(d18(col("cur_b") * 100) * d18(col("rr"))
          - d18(col("ref_b") * 100) * d18(col("cc")))
          > d18(col("rr")) * d18(col("cc"))).as("drifted"))
  }
}
