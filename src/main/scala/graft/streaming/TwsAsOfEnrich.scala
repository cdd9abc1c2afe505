package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.streaming.AsOfEnrich.{In, Out, St}

/** The streaming as-of enrichment on Spark 4's `transformWithState`
  * arbitrary-state API — same pure transition as [[AsOfEnrich]]
  * (`AsOfEnrich.step`), different state plumbing, mirroring the
  * StrikeMonitor / TwsStrikeMonitor pair:
  *
  *  - buffered versions + pending events live in a typed
  *    `ValueState[St]` handle;
  *  - the wake-up for "watermark passed the earliest pending event" is
  *    an explicit event-time TIMER (`registerTimer` +
  *    `handleExpiredTimer`) instead of fMGWS's single timeout slot —
  *    the API's model for state that must act without new input;
  *  - requires the RocksDB state-store provider
  *    (`TwsStrikeMonitor.rocksdbConf`), which is also the 100 TB
  *    posture: off-heap state + incremental checkpoints.
  *
  * StreamingOpsSpec asserts this emits exactly what AsOfEnrich emits
  * over the same input.
  */
object TwsAsOfEnrich {

  class AsOfProcessor extends StatefulProcessor[Long, In, Out] {

    @transient private var state: ValueState[St] = _
    // timestamp of the currently registered timer, so re-arming can
    // deleteTimer the old one: re-registering for every batch's
    // earliest-pending event without cleanup leaves a trail of stale
    // timers on keys with a long-lived backlog — each fires a no-op
    // pass and re-arms, avoidable state + wake-ups on hot keys
    @transient private var timerTs: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[St]("asof", Encoders.product[St],
        TTLConfig.NONE)
      timerTs = getHandle.getValueState[Long]("asofTimer",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    private def run(key: Long, rows: Iterator[In],
                    wm: Long): Iterator[Out] = {
      val st = if (state.exists()) state.get() else St(Nil, Nil)
      val (out, next, wake) = AsOfEnrich.step(key, st, rows, wm)
      // deleteTimer on an already-fired/absent timestamp is a no-op,
      // so clearing the bookkeeping from inside handleExpiredTimer
      // (where the firing timer was auto-removed) is safe
      val prev = if (timerTs.exists()) Some(timerTs.get()) else None
      if (next.versions.isEmpty && next.pending.isEmpty) {
        state.clear()
        prev.foreach(getHandle.deleteTimer)
        timerTs.clear()
      } else {
        state.update(next)
        wake match {
          case Some(w) if !prev.contains(w) =>
            prev.foreach(getHandle.deleteTimer)
            getHandle.registerTimer(w)
            timerTs.update(w)
          case Some(_) => () // same wake-up already armed
          case None =>
            // nothing pending: no wake-up needed, drop any stale timer
            prev.foreach(getHandle.deleteTimer)
            timerTs.clear()
        }
      }
      out.iterator
    }

    override def handleInputRows(key: Long, rows: Iterator[In],
                                 timerValues: TimerValues): Iterator[Out] =
      run(key, rows, timerValues.getCurrentWatermarkInMs())

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo)
        : Iterator[Out] =
      run(key, Iterator.empty, timerValues.getCurrentWatermarkInMs())
  }

  /** Same contract as [[AsOfEnrich.enrich]] — including the delay
    * caveat: the union watermark tracks the FASTER input, so `delay`
    * must cover cross-stream skew, not just out-of-orderness. The
    * session must run the RocksDB state-store provider.
    */
  def enrich(events: DataFrame, dims: DataFrame,
             delay: String): Dataset[Out] = {
    val spark = events.sparkSession
    import spark.implicits._
    val tagged = events
      .select(col("key"), col("ts"), lit(false).as("isDim"),
        col("eventId"), lit(0.0).as("value"))
      .unionByName(dims.select(col("key"), col("ts"), lit(true).as("isDim"),
        lit(0L).as("eventId"), col("value")))
      .withWatermark("ts", delay)
      .as[In]
    tagged
      .groupByKey(_.key)
      .transformWithState(new AsOfProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
