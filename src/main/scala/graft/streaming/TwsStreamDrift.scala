package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.queries.SamplingQueries

/** Streaming TV-drift on Spark 4's `transformWithState` — the TWS twin
  * of [[StreamDrift]] (same 64-bucket feature hash, same
  * cross-multiplied total-variation verdict against the same broadcast
  * reference), completing the twin set: after TwsStreamDedup this was
  * the last windowed monitor without an explicit-state twin
  * (StreamSessions is exempt — it IS the native session_window
  * operator). The windowed-aggregation twin leans on the tumbling
  * window operator; this one manages the window lifecycle explicitly:
  * state = the 64 bucket counters + the token count + the window's end
  * (NBuckets+2 longs per OPEN window — StreamDrift's documented
  * rate-independent state bound, here literal), one event-time timer
  * per open window, 64 verdict rows emitted and state dropped when the
  * watermark crosses the end. Late tokens into a closed window are
  * discarded exactly like the windowed twin's watermark filter.
  *
  * Arithmetic is BigInt — exact everywhere, like the engine-free
  * replay StreamDriftSpec checks the windowed twin against. (The
  * windowed twin computes the same products in DECIMAL(18,0); no loud
  * envelope exists on that side, so none is mirrored here — the
  * products stay far inside both representations for any window the
  * 64-bucket monitor is sized for.)
  */
object TwsStreamDrift {

  /** Projected input: one row per TOKEN — event time (watermark
    * column), its hash bucket, and the tumbling window [start, end)
    * in epoch millis. */
  case class DrEvt(ts: Timestamp, b: Int, ws: Long, we: Long)

  /** TWS-encodable state: per-bucket counts, the window token count,
    * and the window end (ms) the timer is armed at. */
  case class DrSt(g: Seq[Long], c: Long, we: Long)

  /** Emitted verdict row — column-compatible with
    * [[StreamDrift.drift]]'s output. */
  case class DriftRow(window_start: Timestamp, b: Long, ref_b: Long,
                      cur_b: Long, drifted: Boolean)

  class DriftProcessor(refB: Array[Long], rr: Long)
      extends StatefulProcessor[Long, DrEvt, DriftRow] {

    @transient private var state: ValueState[DrSt] = _

    override def init(outputMode: OutputMode,
                      timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[DrSt]("drift",
        Encoders.product[DrSt], TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[DrEvt],
                                 timerValues: TimerValues)
        : Iterator[DriftRow] = {
      val wmMs = timerValues.getCurrentWatermarkInMs()
      val had = state.exists()
      val st0 =
        if (had) state.get()
        else DrSt(Seq.fill(StreamDrift.NBuckets)(0L), 0L, 0L)
      val g = st0.g.toArray
      var c = st0.c
      var we = st0.we
      rows.foreach { e =>
        // a token whose window end the watermark has passed belongs to
        // a closed (or never-opened) window — drop, like the windowed
        // twin's late-data filter
        if (e.we > wmMs) {
          g(e.b) += 1
          c += 1
          we = e.we
        }
      }
      // write state only when this batch actually counted something
      // (the TwsStreamKsDrift no-op-batch discipline)
      if (c > st0.c) {
        state.update(DrSt(g.toSeq, c, we))
        // the timer target is a constant of the key — arm once
        if (!had) getHandle.registerTimer(we)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long,
                                    timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo)
        : Iterator[DriftRow] = {
      if (!state.exists()) Iterator.empty
      else {
        val st = state.get()
        state.clear()
        val cc = BigInt(st.c)
        val r = BigInt(rr)
        // q137's cross-multiplied TV test, exactly as the windowed
        // twin's DECIMAL(18,0) projection computes it:
        // |100·cur_b·R − 100·ref_b·C| > R·C
        (0 until StreamDrift.NBuckets).iterator.map { b =>
          val cur = BigInt(st.g(b))
          val drifted =
            (cur * 100 * r - BigInt(refB(b)) * 100 * cc).abs > r * cc
          DriftRow(new Timestamp(key), b.toLong, refB(b), st.g(b),
            drifted)
        }
      }
    }
  }

  /** Same contract as [[StreamDrift.drift]] — `reference` is
    * [[StreamDrift.referenceFrom]]'s frame, fetched here as a bounded
    * driver-side array (exactly NBuckets rows BY CONSTRUCTION — the
    * RefGrid/centroid-fetch posture). The session must run the RocksDB
    * state-store provider (TwsStrikeMonitor.rocksdbConf).
    */
  def drift(stream: DataFrame, reference: DataFrame, windowDur: String,
            delay: String): Dataset[DriftRow] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val refRows = reference.limit(StreamDrift.NBuckets + 1).collect()
    require(refRows.length == StreamDrift.NBuckets,
      s"TwsStreamDrift: reference must hold exactly " +
        s"${StreamDrift.NBuckets} dense bucket rows, got " +
        s"${refRows.length}")
    val refB = new Array[Long](StreamDrift.NBuckets)
    refRows.foreach(r => refB(r.getLong(0).toInt) = r.getLong(1))
    val rr = refRows.head.getLong(2)
    val w = window(col("ts"), windowDur)
    stream
      .select(col("ts"), explode(split(col("text"), " ")).as("tok"))
      .select(col("ts"),
        SamplingQueries.hashBucket("tok", 1, StreamDrift.NBuckets)
          .cast("int").as("b"),
        unix_millis(w.getField("start")).as("ws"),
        unix_millis(w.getField("end")).as("we"))
      .withWatermark("ts", delay)
      .as[DrEvt]
      .groupByKey(_.ws)
      .transformWithState(new DriftProcessor(refB, rr),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
