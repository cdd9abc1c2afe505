package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.streaming.StreamCusum
import graft.streaming.StreamCusum.{Baseline, Evt}

/** StreamCusum: finalized days replay the q210 sequential recurrence
  * bit-for-bit under the same baseline, timers finalize idle users,
  * un-enrolled users emit nothing, and retention drops reset S.
  */
class StreamCusumSpec extends AnyFunSuite with SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  private def evts(u: Long, day: Int, n: Int): Seq[Evt] =
    (0 until n).map(i => Evt(u, t(f"2024-01-$day%02d ${i % 24}%02d:00:00")))

  test("finalized days equal the batch recurrence; alarm at five " +
    "mean-days of excess; sentinels un-enrolled") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 1: days 1..6 with counts 2,2,2,8,8,8 — baseline fit on the
    // whole series (q210 style): total 30, days 6, mean 5. devs scaled
    // by den=6: 2*6-30=-18 (x3), 8*6-30=+18 (x3). S: 0,0,0,18,36,54;
    // alarm at S > 150 never fires for user 1.
    // user 2: days 1..4 with 1,1,9,9 — total 20, days 4, mean 5:
    // devs 4*1-20=-16 x2, 4*9-20=+16 x2 -> S: 0,0,16,32; 5*num=100.
    val base = Map(1L -> Baseline(30L, 6L), 2L -> Baseline(20L, 4L))
    // time-ordered arrival so no user's day is already behind the
    // watermark when it first shows up (the late-drop path is
    // exercised separately by the family's StreamSpike spec)
    val all = ((1 to 3).flatMap(d => evts(1, d, 2)) ++
      (4 to 6).flatMap(d => evts(1, d, 8)) ++
      (1 to 2).flatMap(d => evts(2, d, 1)) ++
      (3 to 4).flatMap(d => evts(2, d, 9))).sortBy(_.ts.getTime)
    val input = MemoryStream[Evt]
    val out = StreamCusum.changes(input.toDF(), base, "6 hours")
    val q = out.writeStream.format("memory").queryName("scusum")
      .outputMode("append").start()
    try {
      input.addData(all.take(10): _*)
      q.processAllAvailable()
      input.addData(all.drop(10): _*)
      q.processAllAvailable()
      // watermark sentinels: user 99 has NO baseline — must emit
      // nothing and hold no state; users 1/2 finalize purely on timers
      input.addData(Evt(99, t("2024-01-08 00:00:00")))
      q.processAllAvailable()
      input.addData(Evt(99, t("2024-01-09 12:00:00")))
      q.processAllAvailable()

      val got = spark.table("scusum").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4))).toSet
      assert(!got.exists(_._1 == 99L), "un-enrolled user must be silent")

      // batch replay: the q210 recurrence per user over the same days
      val daily = all.groupBy(e => (e.user_id,
        StreamCusum.DayUs * (e.ts.getTime * 1000L / StreamCusum.DayUs)))
        .view.mapValues(_.length.toLong).toMap
      val expected = base.keys.flatMap { u =>
        val series = daily.collect { case ((`u`, d), x) => (d, x) }
          .toSeq.sortBy(_._1)
        var s = 0L
        series.map { case (d, x) =>
          s = math.max(0L, s + (x * base(u).den - base(u).num))
          (u, d, x, s, s > 5 * base(u).num)
        }
      }.toSet
      assert(got == expected)
      assert(got.count(_._1 == 1L) == 6 && got.count(_._1 == 2L) == 4)
      // monotone excess run: user 1's S climbs 18,36,54 over the burst
      assert(got.filter(t => t._1 == 1L && t._3 == 8L).map(_._4)
        == Set(18L, 36L, 54L))
    } finally q.stop()
  }

  test("retention horizon drops an idle user's state; a returning " +
    "user restarts at S = 0") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Map(1L -> Baseline(4L, 2L))   // mean 2 over 2 fit days
    val input = MemoryStream[Evt]
    val out = StreamCusum.changes(input.toDF(), base, "1 hour",
      retentionDays = Some(2L))
    val q = out.writeStream.format("memory").queryName("scusum_ret")
      .outputMode("append").start()
    try {
      // day 1: count 4 -> dev = 4*2-4 = 4 -> S=4 (alarm needs S > 20)
      input.addData(evts(1, 1, 4): _*)
      q.processAllAvailable()
      // watermark far past day 1 + retention: state dropped via timer
      input.addData(Evt(99, t("2024-01-10 00:00:00")))
      q.processAllAvailable()
      // user returns on day 11 with count 4 again: S restarts at 0 -> 4
      input.addData(evts(1, 11, 4): _*)
      q.processAllAvailable()
      input.addData(Evt(99, t("2024-01-20 00:00:00")))
      q.processAllAvailable()
      val got = spark.table("scusum_ret").filter(col("user_id") === 1)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      assert(got.length == 2)
      assert(got(0)._2 == 4L && got(0)._3 == 4L)
      // without the drop the second S would be 8; the restart proves it
      assert(got(1)._2 == 4L && got(1)._3 == 4L)
    } finally q.stop()
  }

  test("fMGWS and TWS twins emit identical rows on the same events " +
    "and baselines") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(
      graft.streaming.TwsStrikeMonitor.rocksdbConf._1)
    spark.conf.set(graft.streaming.TwsStrikeMonitor.rocksdbConf._1,
      graft.streaming.TwsStrikeMonitor.rocksdbConf._2)
    try {
      val base = Map(1L -> Baseline(30L, 6L), 2L -> Baseline(20L, 4L))
      val all = ((1 to 3).flatMap(d => evts(1, d, 2)) ++
        (4 to 6).flatMap(d => evts(1, d, 8)) ++
        (1 to 2).flatMap(d => evts(2, d, 1)) ++
        (3 to 4).flatMap(d => evts(2, d, 9))).sortBy(_.ts.getTime)
      def run(name: String,
              mk: org.apache.spark.sql.DataFrame
                => org.apache.spark.sql.Dataset[_]): Set[String] = {
        val input = MemoryStream[Evt]
        val q = mk(input.toDF()).writeStream.format("memory")
          .queryName(name).outputMode("append").start()
        try {
          input.addData(all.take(10): _*)
          q.processAllAvailable()
          input.addData(all.drop(10): _*)
          q.processAllAvailable()
          input.addData(Evt(99, t("2024-01-08 00:00:00")))
          q.processAllAvailable()
          input.addData(Evt(99, t("2024-01-09 12:00:00")))
          q.processAllAvailable()
          spark.table(name).collect().map(_.mkString("|")).toSet
        } finally q.stop()
      }
      val fmgws = run("scusum_f",
        df => StreamCusum.changes(df, base, "6 hours"))
      val tws = run("scusum_t",
        df => graft.streaming.TwsStreamCusum.changes(df, base, "6 hours"))
      assert(tws == fmgws && fmgws.nonEmpty)
    } finally prev match {
      case Some(v) => spark.conf.set(
        graft.streaming.TwsStrikeMonitor.rocksdbConf._1, v)
      case None => spark.conf.unset(
        graft.streaming.TwsStrikeMonitor.rocksdbConf._1)
    }
  }

  test("fold is order-insensitive within a batch and finalizes " +
    "ascending") {
    val base = Baseline(10L, 2L)
    val d1 = 0L
    val d2 = StreamCusum.DayUs
    val days = Seq(d2, d1, d2, d1, d1)   // shuffled arrival
    val wm = 2 * StreamCusum.DayUs + 1
    val (rows, st) = StreamCusum.fold(base, None, days, wm)
    assert(rows.map(_._1) == Seq(d1, d2), "ascending finalization")
    // d1: x=3 -> s = max(0, 3*2-10) = 0; d2: x=2 -> s = max(0, -6) = 0
    assert(rows.map(_._3) == Seq(0L, 0L))
    assert(st.open.isEmpty && st.s == 0L && st.lastFin == d2)
    val (rows2, _) = StreamCusum.fold(base, None, days.reverse, wm)
    assert(rows == rows2)
  }
}
