package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming point-in-time (as-of) enrichment: every event is joined to
  * the LATEST dim version with the same key and version-time <= event
  * time — the streaming form of [[graft.operators.AsOf.join]] (which is
  * the batch twin used for parity in StreamingOpsSpec and by q43/q98).
  *
  * Spark's built-in stream-stream joins can't express "latest prior
  * version": an interval join needs a bounded window and emits EVERY
  * version in it, not the most recent. So this keys both streams by the
  * join key, buffers them in [[GroupState]], and resolves each event
  * only once the event-time watermark has passed its timestamp — at
  * that point no dim version at or before the event can still arrive
  * (both inputs feed one union with one watermark), so the answer is
  * final and the output is clean Append mode.
  *
  * Emission timing and the delay contract: both inputs feed ONE union
  * with one watermark, so the watermark advances with the max event
  * time seen across EITHER stream minus `delay` (a union cannot take
  * the per-stream min that Spark's two-input joins use). `delay` must
  * therefore budget for out-of-orderness WITHIN a stream plus skew
  * BETWEEN the streams: if one input runs ahead by more than `delay`,
  * the lagging input's rows arrive behind the watermark and are
  * dropped as late. Size `delay` to the worst cross-stream lag you
  * tolerate; an event-time timeout is armed at the earliest pending
  * event so resolution fires even when the key receives no further
  * rows.
  *
  * State bound (the 100 TB concern): per key, pending events are capped
  * by the watermark delay (resolved and dropped as the watermark
  * sweeps), and dim versions older than the watermark are compacted to
  * the single latest one (still needed by future events, which all
  * carry ts > watermark). State is therefore O(arrival rate × delay)
  * per key, not O(history).
  *
  * Reference analog: the SCD2 dim lookups in the reference join facts
  * to the version current at load time (`merge2_tf_dim_staging.py`);
  * this is the same lookup with event-time versioning and streaming
  * arrival.
  */
object AsOfEnrich {

  /** Tagged union row: a dim version (isDim, carries value) or an event
    * (carries eventId). */
  case class In(key: Long, ts: Timestamp, isDim: Boolean, eventId: Long,
                value: Double)

  /** versions: (versionMs, value); pending: (eventMs, eventId). */
  case class St(versions: List[(Long, Double)], pending: List[(Long, Long)])

  /** dimValue is None when no version at or before the event exists. */
  case class Out(key: Long, eventId: Long, tsMs: Long,
                 dimValue: Option[Double])

  /** events: (key, ts, eventId); dims: (key, ts, value). `delay` is the
    * shared watermark (how out-of-order either stream may be).
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
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(resolve)
  }

  /** Pure transition shared with [[TwsAsOfEnrich]]: fold new rows into
    * the state, resolve every event the watermark `wm` has finalized,
    * compact expired versions. Returns (emissions in (ts, id) order,
    * next state — empty means droppable, wake-up timestamp for the
    * earliest still-pending event).
    */
  private[streaming] def step(key: Long, st: St, rows: Iterator[In],
                              wm: Long): (List[Out], St, Option[Long]) = {
    var versions = st.versions
    var pending = st.pending
    rows.foreach { r =>
      if (r.isDim) versions = (r.ts.getTime, r.value) :: versions
      else pending = (r.ts.getTime, r.eventId) :: pending
    }
    val (ready, rest) = pending.partition(_._1 <= wm)
    // sort once per invocation; version count is compacted below so the
    // sort is over the in-delay window, not history
    val sorted = versions.sortBy(identity)
    val out = ready.sortBy(identity).map { case (t, id) =>
      val v = sorted.takeWhile(_._1 <= t).lastOption
      Out(key, id, t, v.map(_._2))
    }
    // compact: future events all have ts > wm, so of the versions at or
    // before wm only the latest can ever match again
    val (expired, live) = sorted.partition(_._1 <= wm)
    val kept = expired.lastOption.toList ++ live
    (out, St(kept, rest), rest.map(_._1).minOption)
  }

  private def resolve(key: Long, rows: Iterator[In],
                      state: GroupState[St]): Iterator[Out] = {
    val (out, next, wake) =
      step(key, state.getOption.getOrElse(St(Nil, Nil)), rows,
        state.getCurrentWatermarkMs())
    if (next.versions.isEmpty && next.pending.isEmpty) state.remove()
    else {
      state.update(next)
      // wake when the watermark passes the earliest unresolved event,
      // even if this key never sees another row
      wake.foreach(state.setTimeoutTimestamp)
    }
    out.iterator
  }
}
