package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.streaming.StreamKsDrift.RefGrid

/** Streaming KS drift on Spark 4's `transformWithState` — the TWS twin
  * of [[StreamKsDrift]] (same reference grid, same exact integer
  * verdict, same C·R envelope), completing the twin pair the way
  * TwsStreamCusum does for StreamCusum. The windowed-aggregation twin
  * leans on Spark's tumbling-window operator; this one manages the
  * window lifecycle explicitly: state = the nGrid conditional counters
  * + the doc count + the window's end (nGrid+2 longs per OPEN window —
  * the documented StreamKsDrift state bound, here made literal), one
  * event-time timer per open window at its end, verdict emitted and
  * state dropped when the watermark crosses it. Late rows into a
  * closed window are discarded exactly like the windowed-agg twin's
  * watermark filter. Arithmetic is BigInt (the JVM mirror of the SQL
  * twin's DECIMAL(38,0) path) with the SAME loud C·R envelope, so the
  * two twins are row-identical or fail identically — never silently
  * divergent (TwsStreamKsDriftSpec asserts parity).
  */
object TwsStreamKsDrift {

  /** Projected input: event time (watermark column), token count, and
    * the tumbling window's [start, end) in epoch millis. */
  case class KsEvt(ts: Timestamp, toks: Long, ws: Long, we: Long)

  /** Emitted verdict row — column-compatible with
    * [[StreamKsDrift.drift]]'s output. */
  case class KsRow(window_start: Timestamp, n_docs: Long, d_ppm: Long,
                   drifted: Boolean)

  /** TWS-encodable state: per-grid-point conditional counts, the doc
    * count, and the window end (ms) the timer is armed at. */
  case class KsSt(g: Seq[Long], c: Long, we: Long)

  class KsProcessor(ref: RefGrid)
      extends StatefulProcessor[Long, KsEvt, KsRow] {

    @transient private var state: ValueState[KsSt] = _

    override def init(outputMode: OutputMode,
                      timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[KsSt]("ks",
        Encoders.product[KsSt], TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[KsEvt],
                                 timerValues: TimerValues)
        : Iterator[KsRow] = {
      val wmMs = timerValues.getCurrentWatermarkInMs()
      val had = state.exists()
      val st0 =
        if (had) state.get()
        else KsSt(Seq.fill(ref.cuts.size)(0L), 0L, 0L)
      val g = st0.g.toArray
      var c = st0.c
      var we = st0.we
      rows.foreach { e =>
        // a window whose end the watermark has passed is already
        // closed (or was never opened) — drop, like the windowed-agg
        // twin's late-data filter
        if (e.we > wmMs) {
          we = e.we
          var i = 0
          while (i < ref.cuts.length) {
            if (e.toks <= ref.cuts(i)) g(i) += 1
            i += 1
          }
          c += 1
        }
      }
      // c > st0.c alone: a batch whose rows were ALL late-dropped
      // leaves (g, c, we) exactly as loaded, and rewriting identical
      // state is a wasted RocksDB write per no-op batch on every open
      // window (ADVICE r12)
      if (c > st0.c) {
        state.update(KsSt(g.toSeq, c, we))
        // the timer target never moves (the window end is a constant
        // of the key), so arm exactly once — on first open
        if (!had) getHandle.registerTimer(we)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long,
                                    timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo)
        : Iterator[KsRow] = {
      if (!state.exists()) Iterator.empty
      else {
        val st = state.get()
        state.clear()
        val r = ref.refTotal
        // identical envelope to the SQL twin: both verdict sides must
        // stay within the exact-integer range the windowed-agg twin's
        // DECIMAL(38,0) supports, so the twins can never silently
        // diverge past it — same bound, same loud failure
        val maxC = 10000000000000000L / math.max(r, 1L)
        if (st.c > maxC)
          throw new IllegalStateException(
            "TwsStreamKsDrift: C*R beyond the exact KS envelope")
        val dnum = ref.cuts.indices.map(i =>
          (BigInt(st.g(i)) * r - BigInt(ref.refCum(i)) * st.c).abs).max
        val dppm = (dnum * 1000000 / (BigInt(st.c) * r)).toLong
        val drifted =
          dnum * dnum * 10000 > BigInt(18496) * (st.c + r) * st.c * r
        Iterator.single(
          KsRow(new Timestamp(key), st.c, dppm, drifted))
      }
    }
  }

  /** Same contract as [[StreamKsDrift.drift]]; the session must run
    * the RocksDB state-store provider (TwsStrikeMonitor.rocksdbConf).
    */
  def drift(stream: DataFrame, ref: RefGrid, windowDur: String,
            delay: String): Dataset[KsRow] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val w = window(col("ts"), windowDur)
    stream
      .select(col("ts"),
        size(split(col("text"), " ")).cast("long").as("toks"),
        unix_millis(w.getField("start")).as("ws"),
        unix_millis(w.getField("end")).as("we"))
      .withWatermark("ts", delay)
      .as[KsEvt]
      .groupByKey(_.ws)
      .transformWithState(new KsProcessor(ref), TimeMode.EventTime(),
        OutputMode.Append())
  }
}
