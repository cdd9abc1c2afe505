package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.streaming.StreamNearDup.{BandRow, BucketSt, Match}

/** Streaming near-dup flagging on Spark 4's `transformWithState` API —
  * same pure transition as [[StreamNearDup]] (`StreamNearDup.fold`),
  * different state plumbing, completing the fMGWS/TWS twin set
  * (StrikeMonitor/TwsStrikeMonitor, AsOfEnrich/TwsAsOfEnrich):
  *
  *  - the bucket owner lives in a typed `ValueState[BucketSt]`;
  *  - retention expiry is an explicit event-time TIMER at
  *    owner ts + retention, deleted and re-armed on ownership transfer
  *    (the TwsAsOfEnrich stale-timer discipline), instead of fMGWS's
  *    single timeout slot;
  *  - requires the RocksDB state-store provider
  *    (`TwsStrikeMonitor.rocksdbConf`) — the 100 TB posture for
  *    hundreds of millions of live buckets.
  *
  * StreamNearDupSpec asserts this emits exactly what StreamNearDup
  * emits over the same input.
  */
object TwsStreamNearDup {

  class NearDupProcessor(retentionMs: Long)
      extends StatefulProcessor[(Int, String), BandRow, Match] {

    @transient private var state: ValueState[BucketSt] = _
    @transient private var timerTs: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[BucketSt]("bucket",
        Encoders.product[BucketSt], TTLConfig.NONE)
      timerTs = getHandle.getValueState[Long]("bucketTimer",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: (Int, String),
                                 rows: Iterator[BandRow],
                                 timerValues: TimerValues): Iterator[Match] = {
      val st0 = if (state.exists()) Some(state.get()) else None
      val (out, st) = StreamNearDup.fold(key._1, st0, rows.toSeq)
      st.foreach { s =>
        state.update(s)
        // ownership only ever transfers to an EARLIER (ts, doc_id), so
        // the wanted expiry only moves earlier; delete the stale timer
        // before re-arming (deleteTimer on an absent ts is a no-op)
        val want = s.ownerTsMs + retentionMs
        val prev = if (timerTs.exists()) Some(timerTs.get()) else None
        if (!prev.contains(want)) {
          prev.foreach(getHandle.deleteTimer)
          getHandle.registerTimer(want)
          timerTs.update(want)
        }
      }
      out.iterator
    }

    override def handleExpiredTimer(key: (Int, String),
                                    timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo)
        : Iterator[Match] = {
      // retention horizon passed the owner: the bucket is forgotten
      state.clear()
      timerTs.clear()
      Iterator.empty
    }
  }

  /** Same contract as [[StreamNearDup.flag]]; the session must run the
    * RocksDB state-store provider.
    */
  def flag(docs: DataFrame, delay: String,
           retentionMs: Long): Dataset[Match] = {
    val spark = docs.sparkSession
    import spark.implicits._
    StreamNearDup.bandRows(docs)
      .withWatermark("ts", delay)
      .as[BandRow]
      .groupByKey(r => (r.band, r.h))
      .transformWithState(new NearDupProcessor(retentionMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
