package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.streaming.StreamSpike.{Evt, SpikeRow, SpikeSt}

/** TWS-encodable state image: the TWS value-state encoder rejects
  * MapType, so the open-hour map travels as a sorted (hour, n) list.
  * Pure image of [[StreamSpike.SpikeSt]] — converted at the state
  * boundary, `fold` itself is shared unchanged. */
case class SpikeStFlat(open: Seq[(Long, Long)], trail: Seq[(Long, Long)])

/** Rate-spike monitoring on Spark 4's `transformWithState` API — the
  * same pure transition as [[StreamSpike]] (`StreamSpike.fold`),
  * different state plumbing, extending the fMGWS/TWS twin set
  * (StrikeMonitor, StreamNearDup, AsOfEnrich):
  *
  *  - the per-user open-hour counters + 3-deep trail live in a typed
  *    `ValueState[SpikeSt]`;
  *  - hour finalization is an explicit event-time TIMER at the
  *    earliest open hour's end, re-armed after every batch and every
  *    firing (the TwsStreamNearDup stale-timer discipline) — fMGWS's
  *    single timeout slot becomes an explicitly managed timer;
  *  - runs on the RocksDB state-store provider
  *    (`TwsStrikeMonitor.rocksdbConf`), the 100 TB posture for
  *    hundreds of millions of live users.
  *
  * StreamSpikeSpec asserts this emits exactly what StreamSpike emits
  * over the same input.
  */
object TwsStreamSpike {

  class SpikeProcessor(retentionUs: Option[Long] = None)
      extends StatefulProcessor[Long, Evt, SpikeRow] {

    @transient private var state: ValueState[SpikeStFlat] = _
    @transient private var timerTs: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[SpikeStFlat]("spike",
        Encoders.product[SpikeStFlat], TTLConfig.NONE)
      timerTs = getHandle.getValueState[Long]("spikeTimer",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    private def step(key: Long, hours: Seq[Long],
                     wmUs: Long): Iterator[SpikeRow] = {
      val st0 =
        if (state.exists())
          Some(SpikeSt(state.get().open.toMap, state.get().trail))
        else None
      val (out, st) = StreamSpike.fold(key, st0, hours, wmUs)
      val prev = if (timerTs.exists()) Some(timerTs.get()) else None
      def arm(wantMs: Long): Unit =
        if (!prev.contains(wantMs)) {
          prev.foreach(getHandle.deleteTimer)
          getHandle.registerTimer(wantMs)
          timerTs.update(wantMs)
        }
      def disarm(): Unit = {
        prev.foreach(getHandle.deleteTimer)
        timerTs.clear()
      }
      if (st.open.nonEmpty) {
        state.update(SpikeStFlat(st.open.toSeq.sorted, st.trail))
        arm((st.open.keys.min + StreamSpike.HourUs) / 1000L)
      } else retentionUs match {
        // idle user: same trail-retention contract as StreamSpike —
        // keep state only inside the horizon after the last finalized
        // hour, with the expiry timer driving removal
        case Some(r) =>
          st.trail.lastOption
            .map(_._1 + StreamSpike.HourUs + r) match {
            case Some(expiryUs) if wmUs < expiryUs =>
              state.update(SpikeStFlat(Nil, st.trail))
              arm(expiryUs / 1000L)
            case _ =>
              disarm()
              state.clear()
          }
        case None =>
          state.update(SpikeStFlat(Nil, st.trail))
          disarm()
      }
      out.iterator
    }

    override def handleInputRows(key: Long, rows: Iterator[Evt],
                                 timerValues: TimerValues)
        : Iterator[SpikeRow] = {
      val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
      val hours = rows.map(e => {
        val us = e.ts.getTime * 1000L
        us - us % StreamSpike.HourUs
      }).toSeq
      step(key, hours, wmUs)
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo)
        : Iterator[SpikeRow] = {
      timerTs.clear()
      step(key, Nil, timerValues.getCurrentWatermarkInMs() * 1000L)
    }
  }

  /** Same contract as [[StreamSpike.spikes]] (including the optional
    * trail-retention horizon); the session must run the RocksDB
    * state-store provider.
    */
  def spikes(events: DataFrame, delay: String,
             trailRetentionHours: Option[Long] = None): Dataset[SpikeRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    require(trailRetentionHours.forall(_ > 0),
      s"trailRetentionHours must be positive, got $trailRetentionHours")
    events.select(col("user_id").cast("long").as("user_id"), col("ts"))
      .withWatermark("ts", delay)
      .as[Evt]
      .groupByKey(_.user_id)
      .transformWithState(
        new SpikeProcessor(trailRetentionHours.map(_ * StreamSpike.HourUs)),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
