package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming exact dedup on Spark 4's `transformWithState` — the TWS
  * twin of [[StreamDedup]] (same digest key, same horizon-bounded
  * exactness trade), completing the twin pair the way TwsStreamCusum
  * does for StreamCusum. The declarative twin leans on
  * `dropDuplicatesWithinWatermark`; this one makes its state contract
  * literal: ValueState = ONE long per live digest (the expiry instant
  * fixed at first-sighting ts + delay — duplicates never extend it,
  * matching the native operator's "within the delay threshold of the
  * FIRST event" rule), one event-time timer per digest at that expiry,
  * state dropped when the watermark crosses it. Rows below the
  * watermark are discarded like the native late-data filter; the
  * emitted survivors are row-identical to StreamDedup's
  * (TwsStreamDedupSpec asserts parity on shared corpora).
  *
  * Scale posture is the same O(novelty rate × delay) state bound as
  * the declarative twin: clones hit an existing digest entry and add
  * neither state nor a RocksDB write (the ADVICE r12 no-op-batch
  * discipline — state is written only on first sighting).
  */
object TwsStreamDedup {

  /** Projected input: the document row, its digest key, and the
    * horizon expiry (first-sighting ts + delay, epoch ms) computed
    * declaratively so the interval string is parsed by Catalyst, not
    * driver-side code. */
  case class DdEvt(doc_id: Long, ts: Timestamp, text: String,
                   digest: String, exp: Long)

  /** Emitted survivor — column-compatible with [[StreamDedup.exact]]'s
    * output (the input row plus its digest). */
  case class DdRow(doc_id: Long, ts: Timestamp, text: String,
                   digest: String)

  class DedupProcessor extends StatefulProcessor[String, DdEvt, DdRow] {

    @transient private var expiry: ValueState[Long] = _

    override def init(outputMode: OutputMode,
                      timeMode: TimeMode): Unit = {
      expiry = getHandle.getValueState[Long]("dd",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[DdEvt],
                                 timerValues: TimerValues)
        : Iterator[DdRow] = {
      val wmMs = timerValues.getCurrentWatermarkInMs()
      // expiry is judged HERE against the batch watermark, not left to
      // the timer: within a microbatch Spark hands input rows to the
      // processor before expired timers, so a row re-arriving in the
      // same batch whose watermark killed its digest must already see
      // the state as dead (the declarative twin's eviction predicate
      // is watermark-based and has no such ordering hazard)
      val live = expiry.exists() && expiry.get() > wmMs
      var exp = if (live) expiry.get() else Long.MinValue
      val hadLive = live
      var kept: Option[DdRow] = None
      rows.foreach { e =>
        // a row below the watermark is late — discard, like the
        // native operator's pre-dedup watermark filter
        if (e.ts.getTime >= wmMs && exp == Long.MinValue) {
          // first sighting of this digest inside the horizon: keep the
          // row and pin the expiry to ITS timestamp + delay (later
          // duplicates are dropped and never extend the horizon)
          kept = Some(DdRow(e.doc_id, e.ts, e.text, e.digest))
          exp = e.exp
        }
      }
      // state is written (and the timer armed) only on first sighting:
      // a batch of clones against a live digest leaves state untouched
      if (!hadLive && exp != Long.MinValue) {
        expiry.update(exp)
        getHandle.registerTimer(exp)
      }
      kept.iterator
    }

    override def handleExpiredTimer(key: String,
                                    timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo)
        : Iterator[DdRow] = {
      // garbage-collect once the watermark has crossed the pinned
      // expiry — the digest may be seen (and kept) again afterwards.
      // Guard against a STALE timer: if the key was re-opened in this
      // very batch (in-row expiry check above), the stored expiry is
      // the new horizon and must survive the old timer's firing.
      if (expiry.exists() &&
          expiry.get() <= timerValues.getCurrentWatermarkInMs())
        expiry.clear()
      Iterator.empty
    }
  }

  /** Same contract as [[StreamDedup.exact]]; the session must run the
    * RocksDB state-store provider (TwsStrikeMonitor.rocksdbConf).
    */
  def exact(docs: DataFrame, delay: String): Dataset[DdRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("digest", md5(col("text").cast("binary")))
      .select(col("doc_id").cast("long").as("doc_id"), col("ts"),
        col("text"), col("digest"),
        unix_millis(col("ts") + expr(s"INTERVAL '$delay'")).as("exp"))
      .withWatermark("ts", delay)
      .as[DdEvt]
      .groupByKey(_.digest)
      .transformWithState(new DedupProcessor, TimeMode.EventTime(),
        OutputMode.Append())
  }
}
