package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Streaming event-rate spike monitor: the live twin of q156's batch
  * audit (per-user hourly counts flagged at ≥1.5× the mean of the
  * previous three observed hours). One stateful operator keyed by
  * user_id:
  *
  *  - OPEN hourly counters accumulate per batch (hour = event-time
  *    truncated to exact epoch-micros, the q41/q156 idiom);
  *  - an hour FINALIZES when the watermark passes its end; finalized
  *    hours emit exactly the batch row — (n, trail_sum, trail_n,
  *    spike) against the user's last ≤3 previously-finalized hours —
  *    and enter the trailing window;
  *  - the trail keeps only the last 3 (hour, n) pairs.
  *
  * Finalization rides EVENT-TIME TIMEOUTS (the StrikeMonitor-family
  * mechanism): after each invocation the group arms a timer at its
  * earliest open hour's end, so hours finalize when the watermark
  * passes even if the user sends no further events — a group without
  * new data is otherwise never re-invoked. Order is safe: an event for
  * hour h is admitted only while wm < h+1h (else the watermark filter
  * drops it), and h finalizes only once wm ≥ h+1h — so no admitted
  * event can target an already-finalized hour, and hours finalize in
  * ascending order per user. Spike verdicts are bit-identical to q156
  * over the same rows (integer cross-multiplication; asserted in
  * StreamSpikeSpec).
  *
  * State bound (the 100 TB concern): per ACTIVE user, open-hour
  * counters live only inside the watermark horizon (delay/1h of them)
  * plus 3 trail pairs — independent of event rate; idle users carry no
  * open hours and exactly 3 longs of trail. That bound is per-USER:
  * under an unbounded keyspace (synthetic user_ids, device churn) the
  * keyspace itself grows state without bound, so `spikes` takes an
  * optional TRAIL-RETENTION horizon (ADVICE r6): a user whose last
  * finalized hour is more than `trailRetentionHours` behind the
  * watermark is dropped entirely (event-time timeout → state.remove).
  * A returning user restarts with an empty trail — its first 3 hours
  * carry trail_n < 3 and can't flag, exactly like a genuinely new
  * user; that's the documented trade for bounded state. Default None
  * preserves the keep-forever behavior for bounded keyspaces.
  */
object StreamSpike {

  val HourUs = 3600000000L

  case class Evt(user_id: Long, ts: Timestamp)
  case class SpikeSt(open: Map[Long, Long], trail: Seq[(Long, Long)])
  case class SpikeRow(user_id: Long, hour_us: Long, n: Long,
                      trail_sum: Long, trail_n: Long, spike: Boolean)

  private def hourOf(ts: Timestamp): Long = {
    val us = ts.getTime * 1000L
    us - us % HourUs
  }

  /** The pure per-batch transition, test-visible: fold batch events
    * into the open counters, then finalize (ascending) every open hour
    * whose end the watermark has passed. Deterministic for any input
    * order.
    */
  private[graft] def fold(user: Long, st0: Option[SpikeSt],
      hours: Seq[Long], wmUs: Long): (Seq[SpikeRow], SpikeSt) = {
    val st = st0.getOrElse(SpikeSt(Map.empty, Nil))
    var open = st.open
    hours.foreach(h => open = open.updated(h, open.getOrElse(h, 0L) + 1L))
    val fin = open.keys.filter(_ + HourUs <= wmUs).toSeq.sorted
    var trail = st.trail
    val out = Seq.newBuilder[SpikeRow]
    fin.foreach { h =>
      val n = open(h)
      val trailSum = trail.map(_._2).sum
      val trailN = trail.length.toLong
      out += SpikeRow(user, h, n, trailSum, trailN,
        trailN == 3L && n * 2 >= trailSum)
      trail = (trail :+ (h, n)).takeRight(3)
      open = open - h
    }
    (out.result(), SpikeSt(open, trail))
  }

  private def process(retentionUs: Option[Long])(key: Long,
      rows: Iterator[Evt],
      state: GroupState[SpikeSt]): Iterator[SpikeRow] = {
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val hours =
      if (state.hasTimedOut) Nil else rows.map(e => hourOf(e.ts)).toSeq
    val (out, st) = fold(key, state.getOption, hours, wmUs)
    if (st.open.nonEmpty) {
      state.update(st)
      // arm the next finalization: earliest open hour end. Always
      // strictly beyond the watermark — fold finalized everything at
      // or below it.
      state.setTimeoutTimestamp((st.open.keys.min + HourUs) / 1000L)
    } else retentionUs match {
      case Some(r) =>
        // idle user (no open hours): keep the trail only inside the
        // retention horizon after its last finalized hour; the timer
        // re-invokes the group at expiry so removal needs no new event
        st.trail.lastOption.map(_._1 + HourUs + r) match {
          case Some(expiryUs) if wmUs < expiryUs =>
            state.update(st)
            state.setTimeoutTimestamp(expiryUs / 1000L)
          case _ => state.remove()
        }
      case None => state.update(st)
    }
    out.iterator
  }

  /** (user_id, hour_us, n, trail_sum, trail_n, spike) rows, one per
    * finalized (user, hour). `events` needs (user_id, ts); `delay` is
    * the lateness horizon (also the finalization lag);
    * `trailRetentionHours`, when set, drops users idle that many hours
    * past their last finalized hour (bounded state under unbounded
    * keyspaces — see the object doc for the returning-user trade).
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
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        process(trailRetentionHours.map(_ * HourUs)))
  }
}
