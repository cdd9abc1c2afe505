package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Streaming near-duplicate flagging: the streaming form of q96's
  * batch-vs-corpus LSH probe. Each arriving document is minhashed and
  * banded (same pinned config as `Text.candidatePairs`: word trigrams →
  * MinHash(16) via Kirsch–Mitzenmacher → 4 bands × 4 rows), and any doc
  * landing in a band bucket already owned by an earlier doc is emitted
  * as a `Match` against the bucket's owner. Owners emit nothing —
  * output is exactly the stream of "this doc near-duplicates that
  * earlier doc (via band b)" facts; a downstream distinct over doc_id
  * is the kept/dropped verdict.
  *
  * Signature math is PER-ROW (higher-order array functions over the
  * token array), not the batch group-by — so banding adds NO shuffle;
  * the only shuffle is the keyed state access. A doc's band digests
  * here equal `Text.candidateBands`' digests for the same text
  * (asserted in StreamNearDupSpec), so stream decisions are consistent
  * with the batch dedup the corpus was bootstrapped with.
  *
  * Ownership is deterministic: the bucket's owner is its minimum
  * (event-time, doc_id) member among those seen; if a within-watermark
  * straggler PRE-dates the current owner, ownership transfers and the
  * displaced owner (which never emitted anything) is flagged instead —
  * every doc is eventually flagged unless it is the bucket's
  * (ts, doc_id)-minimum inside the retention horizon.
  *
  * State bound (the 100 TB concern): one ~40-byte entry per DISTINCT
  * band bucket seen in the retention window, expired by an event-time
  * timeout `retentionMs` past the owner's timestamp — O(corpus novelty
  * rate × retention), independent of duplicate density (clones hit
  * existing buckets and add no state).
  */
object StreamNearDup {

  case class BandRow(band: Int, h: String, doc_id: Long, ts: Timestamp)
  case class BucketSt(ownerId: Long, ownerTsMs: Long)
  case class Match(doc_id: Long, band: Int, matched_id: Long)

  /** (doc_id, ts, band, h) rows from (doc_id, ts, text) — pure row-level
    * expressions (no shuffle, streaming-safe), digest-identical to
    * `Text.candidateBands`.
    */
  def bandRows(docs: DataFrame): DataFrame = {
    val hab = docs
      .withColumn("tk", split(col("text"), " "))
      .withColumn("hab", expr(
        """transform(
          |  transform(
          |    sequence(1, greatest(size(tk) - 2, 1)),
          |    p -> md5(CAST(concat_ws(' ', try_element_at(tk, p),
          |      try_element_at(tk, p + 1), try_element_at(tk, p + 2))
          |      AS BINARY))),
          |  dg -> struct(
          |    CAST(conv(substr(dg, 1, 10), 16, 10) AS BIGINT) AS ha,
          |    CAST(conv(substr(dg, 17, 10), 16, 10) AS BIGINT) AS hb))
          |""".stripMargin))
    val withMins = (0 until 16).foldLeft(hab) { (df, i) =>
      df.withColumn(s"m$i",
        expr(s"array_min(transform(hab, x -> x.ha + ${i}L * x.hb))"))
    }
    val bandStructs = (0 until 4).map { b =>
      val cols = (0 until 4).map(r => s"m${b * 4 + r}").mkString(", ")
      s"struct($b AS band, md5(CAST(concat_ws('|', $cols) AS BINARY)) AS h)"
    }.mkString(", ")
    withMins
      .select(col("doc_id"), col("ts"),
        explode(expr(s"array($bandStructs)")).as("bh"))
      .select(col("bh.band"), col("bh.h"), col("doc_id"), col("ts"))
  }

  /** The pure per-batch transition, shared with [[TwsStreamNearDup]]:
    * fold a bucket's batch rows (any order) into (matches, new state).
    * Rows are (ts, doc_id)-sorted here so ownership and every emitted
    * match are deterministic regardless of iterator order.
    */
  private[streaming] def fold(band: Int, st0: Option[BucketSt],
      rows: Seq[BandRow]): (Seq[Match], Option[BucketSt]) = {
    var st = st0
    val out = Seq.newBuilder[Match]
    rows.sortBy(r => (r.ts.getTime, r.doc_id)).foreach { r =>
      st match {
        case None =>
          st = Some(BucketSt(r.doc_id, r.ts.getTime))
        case Some(s) if r.doc_id == s.ownerId => () // replay of the owner
        case Some(s)
            if r.ts.getTime < s.ownerTsMs ||
              (r.ts.getTime == s.ownerTsMs && r.doc_id < s.ownerId) =>
          // straggler pre-dates the owner: transfer ownership, flag the
          // displaced owner (it never emitted anything as owner)
          out += Match(s.ownerId, band, r.doc_id)
          st = Some(BucketSt(r.doc_id, r.ts.getTime))
        case Some(s) =>
          out += Match(r.doc_id, band, s.ownerId)
      }
    }
    (out.result(), st)
  }

  private def process(retentionMs: Long)(
      key: (Int, String), rows: Iterator[BandRow],
      state: GroupState[BucketSt]): Iterator[Match] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val batch = rows.toSeq
    if (batch.isEmpty) return Iterator.empty
    val (out, st) = fold(key._1, state.getOption, batch)
    // retention is a HARD horizon (TWS-twin parity): the timer twin
    // processes a batch's input rows first, then fires expired timers —
    // so rows in this batch still match against the owner, but if the
    // watermark has passed ownerTs+retention the bucket is dropped at
    // batch end, NOT re-armed to watermark+1. The old keep-alive re-arm
    // made a bucket touched at/after its horizon immortal under fMGWS
    // while the TWS twin's fixed timer cleared it — the twins diverged
    // one batch later.
    val horizon = st.get.ownerTsMs + retentionMs
    if (horizon <= state.getCurrentWatermarkMs()) {
      state.remove()
    } else {
      state.update(st.get)
      // horizon > watermark here, so Spark accepts the timestamp
      state.setTimeoutTimestamp(horizon)
    }
    out.iterator
  }

  /** docs: (doc_id, ts, text). `delay` = watermark (out-of-orderness
    * budget); `retentionMs` = how long a bucket keeps matching before
    * its state expires (the streaming corpus horizon).
    */
  def flag(docs: DataFrame, delay: String,
           retentionMs: Long): Dataset[Match] = {
    val spark = docs.sparkSession
    import spark.implicits._
    bandRows(docs)
      .withWatermark("ts", delay)
      .as[BandRow]
      .groupByKey(r => (r.band, r.h))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(process(retentionMs))
  }
}
