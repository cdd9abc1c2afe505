package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.streaming.StreamCusum.{Baseline, CusumRow, CusumSt, Evt}

/** TWS-encodable state image (the TWS value-state encoder rejects
  * MapType — the SpikeStFlat precedent): open day counters travel as a
  * sorted (day, n) list. Pure image of [[StreamCusum.CusumSt]];
  * `fold` is shared unchanged. */
case class CusumStFlat(open: Seq[(Long, Long)], s: Long, lastFin: Long)

/** CUSUM change-point monitoring on Spark 4's `transformWithState` —
  * the same pure transition as [[StreamCusum]] (`StreamCusum.fold`),
  * different state plumbing, completing the fMGWS/TWS twin pair the
  * way TwsStreamSpike does for StreamSpike: typed ValueState, an
  * explicitly managed event-time timer at the earliest open day's end
  * (re-armed per batch and per firing — the TwsStreamNearDup
  * stale-timer discipline), RocksDB state-store posture. On the same
  * events and baselines the emitted rows are identical to
  * StreamCusum's (StreamCusumSpec asserts it).
  */
object TwsStreamCusum {

  class CusumProcessor(baselines: Map[Long, Baseline],
                       retentionUs: Option[Long] = None)
      extends StatefulProcessor[Long, Evt, CusumRow] {

    @transient private var state: ValueState[CusumStFlat] = _
    @transient private var timerTs: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[CusumStFlat]("cusum",
        Encoders.product[CusumStFlat], TTLConfig.NONE)
      timerTs = getHandle.getValueState[Long]("cusumTimer",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    private def step(key: Long, days: Seq[Long],
                     wmUs: Long): Iterator[CusumRow] = {
      baselines.get(key) match {
        case None =>
          if (state.exists()) state.clear()
          Iterator.empty
        case Some(base) =>
          val st0 =
            if (state.exists()) {
              val f = state.get()
              Some(CusumSt(f.open.toMap, f.s, f.lastFin))
            } else None
          val (out, st) = StreamCusum.fold(base, st0, days, wmUs)
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
            state.update(CusumStFlat(st.open.toSeq.sorted, st.s, st.lastFin))
            arm((st.open.keys.min + StreamCusum.DayUs) / 1000L)
          } else retentionUs match {
            case Some(r) if st.lastFin != Long.MinValue =>
              val expiryUs = st.lastFin + StreamCusum.DayUs + r
              if (wmUs < expiryUs) {
                state.update(CusumStFlat(Nil, st.s, st.lastFin))
                arm(expiryUs / 1000L)
              } else {
                disarm()
                state.clear()
              }
            case _ =>
              state.update(CusumStFlat(Nil, st.s, st.lastFin))
              disarm()
          }
          out.iterator.map { case (d, x, cs, a) =>
            CusumRow(key, d, x, cs, a) }
      }
    }

    override def handleInputRows(key: Long, rows: Iterator[Evt],
                                 timerValues: TimerValues)
        : Iterator[CusumRow] = {
      val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
      val days = rows.map(e => {
        val us = e.ts.getTime * 1000L
        us - us % StreamCusum.DayUs
      }).toSeq
      step(key, days, wmUs)
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo)
        : Iterator[CusumRow] = {
      timerTs.clear()
      step(key, Nil, timerValues.getCurrentWatermarkInMs() * 1000L)
    }
  }

  /** Same contract as [[StreamCusum.changes]]; the session must run
    * the RocksDB state-store provider (TwsStrikeMonitor.rocksdbConf).
    */
  def changes(events: DataFrame, baselines: Map[Long, Baseline],
              delay: String,
              retentionDays: Option[Long] = None): Dataset[CusumRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    require(retentionDays.forall(_ > 0),
      s"retentionDays must be positive, got $retentionDays")
    require(baselines.values.forall(b => b.den > 0 && b.num >= 0),
      "baselines need den > 0 and num >= 0")
    events.select(col("user_id").cast("long").as("user_id"), col("ts"))
      .withWatermark("ts", delay)
      .as[Evt]
      .groupByKey(_.user_id)
      .transformWithState(
        new CusumProcessor(baselines,
          retentionDays.map(_ * StreamCusum.DayUs)),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
