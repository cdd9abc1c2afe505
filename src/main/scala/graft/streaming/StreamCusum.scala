package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Streaming CUSUM change-point monitor: the live twin of q210's batch
  * audit. Per user, daily event counts feed the sequential CUSUM
  * recurrence S ← max(0, S + dev) against a per-user integer baseline
  * mean num/den (dev = x·den − num keeps the mean rational — the q210
  * scaling), alarming once the cumulated excess S crosses 5·num (five
  * mean-days of excess). Where q210 derives the baseline from the full
  * corpus and gets the recurrence via the prefix-sum closed form, the
  * stream takes the baseline as an INPUT (production CUSUM posture: the
  * reference level is fit offline and shipped to the monitor) and runs
  * the recurrence literally, one finalized day at a time — on the same
  * events and the same baseline the emitted rows are bit-identical to
  * the batch rows (StreamCusumSpec asserts it).
  *
  * Mechanics are the StreamSpike family's: open per-day counters
  * accumulate per batch; a day FINALIZES (ascending) when the watermark
  * passes its end, emitting exactly one row and folding into S;
  * event-time timeouts re-invoke idle users so finalization never
  * waits for their next event. State per user: open-day counters
  * inside the watermark horizon plus ONE long of CUSUM — rate- and
  * history-independent. `retentionDays` mirrors StreamSpike's horizon:
  * a user idle that many days past their last finalized day is dropped
  * (state.remove via timer); a returning user restarts at S = 0 — the
  * documented trade for bounded state under unbounded keyspaces.
  *
  * Baselines travel as a driver map (stratum-/user-table-scale; at
  * 100 TB the natural form is a broadcast stream-static join of the
  * same (num, den) frame — the map keeps the operator dependency-free
  * for the twin). Users absent from the map are not monitored (no
  * rows — the un-enrolled-user semantics).
  */
object StreamCusum {

  val DayUs = 86400000000L

  case class Evt(user_id: Long, ts: Timestamp)
  /** Integer baseline mean num/den — q210 uses (total events, days). */
  case class Baseline(num: Long, den: Long)
  case class CusumSt(open: Map[Long, Long], s: Long, lastFin: Long)
  case class CusumRow(user_id: Long, day_us: Long, x: Long, cusum: Long,
                      alarm: Boolean)

  private def dayOf(ts: Timestamp): Long = {
    val us = ts.getTime * 1000L
    us - us % DayUs
  }

  /** The pure per-batch transition, test-visible: fold batch events
    * into open day counters, then finalize (ascending) every day whose
    * end the watermark has passed, advancing the CUSUM recurrence once
    * per finalized day. Deterministic for any within-batch order.
    */
  private[graft] def fold(base: Baseline, st0: Option[CusumSt],
      days: Seq[Long], wmUs: Long)
      : (Seq[(Long, Long, Long, Boolean)], CusumSt) = {
    val st = st0.getOrElse(CusumSt(Map.empty, 0L, Long.MinValue))
    var open = st.open
    days.foreach(d => open = open.updated(d, open.getOrElse(d, 0L) + 1L))
    val fin = open.keys.filter(_ + DayUs <= wmUs).toSeq.sorted
    var s = st.s
    var lastFin = st.lastFin
    val out = Seq.newBuilder[(Long, Long, Long, Boolean)]
    fin.foreach { d =>
      val x = open(d)
      s = math.max(0L, s + (x * base.den - base.num))
      out += ((d, x, s, s > 5L * base.num))
      lastFin = d
      open = open - d
    }
    (out.result(), CusumSt(open, s, lastFin))
  }

  private def process(baselines: Map[Long, Baseline],
      retentionUs: Option[Long])(key: Long, rows: Iterator[Evt],
      state: GroupState[CusumSt]): Iterator[CusumRow] = {
    baselines.get(key) match {
      case None =>
        // un-enrolled user: consume and keep no state
        rows.foreach(_ => ())
        if (state.exists) state.remove()
        Iterator.empty
      case Some(base) =>
        val wmUs = state.getCurrentWatermarkMs() * 1000L
        val days =
          if (state.hasTimedOut) Nil else rows.map(e => dayOf(e.ts)).toSeq
        val (out, st) = fold(base, state.getOption, days, wmUs)
        if (st.open.nonEmpty) {
          state.update(st)
          state.setTimeoutTimestamp((st.open.keys.min + DayUs) / 1000L)
        } else retentionUs match {
          case Some(r) if st.lastFin != Long.MinValue =>
            val expiryUs = st.lastFin + DayUs + r
            if (wmUs < expiryUs) {
              state.update(st)
              state.setTimeoutTimestamp(expiryUs / 1000L)
            } else state.remove()
          case _ => state.update(st)
        }
        out.iterator.map { case (d, x, cs, a) =>
          CusumRow(key, d, x, cs, a) }
    }
  }

  /** (user_id, day_us, x, cusum, alarm) rows, one per finalized
    * (user, day), for users present in `baselines`. `delay` is the
    * lateness horizon; `retentionDays` (optional) drops users idle
    * that many days past their last finalized day.
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
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        process(baselines, retentionDays.map(_ * DayUs)))
  }
}
