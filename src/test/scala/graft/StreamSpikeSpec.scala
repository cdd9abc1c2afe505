package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamSpike

/** StreamSpike: finalized hours replay the batch q156 rule exactly,
  * finalization fires on event-time timers (no further events needed
  * for a user), late events are dropped, and the trailing window never
  * exceeds 3 observed hours.
  */
class StreamSpikeSpec extends AnyFunSuite with SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  private def evts(u: Long, hour: Int, n: Int): Seq[StreamSpike.Evt] =
    (0 until n).map(i =>
      StreamSpike.Evt(u, t(f"2024-01-01 $hour%02d:${i % 60}%02d:00")))

  test("finalized hours == the batch q156 rule; timers finalize idle " +
    "users; spike fires at >= 1.5x the trailing mean") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamSpike.Evt]
    val out = StreamSpike.spikes(input.toDF(), "30 minutes")
    val q = out.writeStream.format("memory").queryName("sspike")
      .outputMode("append").start()
    // user 1: counts 1,2,3 then a 9-burst (9*2 >= 6 -> spike), then 1;
    // user 2: a single hour (no baseline -> never a spike)
    val all = evts(1, 10, 1) ++ evts(1, 11, 2) ++ evts(1, 12, 3) ++
      evts(1, 13, 9) ++ evts(2, 13, 4) ++ evts(1, 14, 1)
    try {
      input.addData(all.take(6): _*)
      q.processAllAvailable()
      input.addData(all.drop(6): _*)
      q.processAllAvailable()
      // watermark-advancing sentinels: user 99's events push the
      // watermark past every open hour; users 1/2 receive NO further
      // events, so their finalization happens purely via timers
      input.addData(StreamSpike.Evt(99, t("2024-01-02 00:00:00")))
      q.processAllAvailable()
      input.addData(StreamSpike.Evt(99, t("2024-01-02 06:00:00")))
      q.processAllAvailable()

      val got = spark.table("sspike")
        .filter(col("user_id") =!= 99)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5))).toSet

      // batch twin: the q156 window idiom over the same events
      val batch = all.toDF("user_id", "ts")
        .select(col("user_id"),
          (unix_micros(col("ts"))
            - (unix_micros(col("ts")) % StreamSpike.HourUs)).as("hour_us"))
        .groupBy(col("user_id"), col("hour_us"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("hour_us"))
        .rowsBetween(-3, -1)
      val expected = batch
        .select(col("user_id"), col("hour_us"), col("n"),
          coalesce(sum(col("n")).over(w), lit(0L)).as("trail_sum"),
          count(lit(1)).over(w).as("trail_n"))
        .withColumn("spike",
          col("trail_n") === 3 && col("n") * 2 >= col("trail_sum"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5))).toSet
      assert(got == expected)
      // the burst hour is the only spike
      assert(got.count(_._6) == 1)
      val burst = got.find(_._6).get
      assert(burst._1 == 1L && burst._3 == 9L && burst._4 == 6L)
    } finally q.stop()
  }

  test("transformWithState twin emits exactly the fMGWS rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(
      graft.streaming.TwsStrikeMonitor.rocksdbConf._1)
    spark.conf.set(graft.streaming.TwsStrikeMonitor.rocksdbConf._1,
      graft.streaming.TwsStrikeMonitor.rocksdbConf._2)
    try {
      val all = evts(1, 10, 1) ++ evts(1, 11, 2) ++ evts(1, 12, 3) ++
        evts(1, 13, 9) ++ evts(2, 13, 4) ++ evts(1, 14, 1)
      def run(name: String,
              mk: org.apache.spark.sql.DataFrame
                => org.apache.spark.sql.Dataset[_]): Set[String] = {
        val input = MemoryStream[StreamSpike.Evt]
        val q = mk(input.toDF()).writeStream.format("memory")
          .queryName(name).outputMode("append").start()
        try {
          input.addData(all.take(6): _*)
          q.processAllAvailable()
          input.addData(all.drop(6): _*)
          q.processAllAvailable()
          input.addData(StreamSpike.Evt(99, t("2024-01-02 00:00:00")))
          q.processAllAvailable()
          input.addData(StreamSpike.Evt(99, t("2024-01-02 06:00:00")))
          q.processAllAvailable()
          spark.table(name).filter(col("user_id") =!= 99)
            .collect().map(_.mkString("|")).toSet
        } finally q.stop()
      }
      val fmgws = run("sspike_f", df => StreamSpike.spikes(df, "30 minutes"))
      val tws = run("sspike_t",
        df => graft.streaming.TwsStreamSpike.spikes(df, "30 minutes"))
      assert(tws == fmgws && fmgws.nonEmpty)
    } finally prev match {
      case Some(v) => spark.conf.set(
        graft.streaming.TwsStrikeMonitor.rocksdbConf._1, v)
      case None => spark.conf.unset(
        graft.streaming.TwsStrikeMonitor.rocksdbConf._1)
    }
  }

  test("trail retention drops idle users' state; a returning user " +
    "restarts with an empty trail (fMGWS and TWS twins agree)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(
      graft.streaming.TwsStrikeMonitor.rocksdbConf._1)
    spark.conf.set(graft.streaming.TwsStrikeMonitor.rocksdbConf._1,
      graft.streaming.TwsStrikeMonitor.rocksdbConf._2)
    try {
      def run(name: String,
              mk: org.apache.spark.sql.DataFrame
                => org.apache.spark.sql.Dataset[_]): Map[Long, (Long, Long)] = {
        val input = MemoryStream[StreamSpike.Evt]
        val q = mk(input.toDF()).writeStream.format("memory")
          .queryName(name).outputMode("append").start()
        try {
          // build a 3-deep trail for user 1 (hours 10-12) ...
          input.addData(evts(1, 10, 1) ++ evts(1, 11, 2)
            ++ evts(1, 12, 3): _*)
          q.processAllAvailable()
          // ... idle it far past any 2h retention horizon ...
          input.addData(StreamSpike.Evt(99, t("2024-01-01 20:00:00")))
          q.processAllAvailable()
          // ... then the user returns at hour 22 and that hour finalizes
          input.addData(evts(1, 22, 2): _*)
          q.processAllAvailable()
          input.addData(StreamSpike.Evt(99, t("2024-01-02 10:00:00")))
          q.processAllAvailable()
          spark.table(name).filter(col("user_id") === 1)
            .collect()
            .map(r => (r.getLong(1) / StreamSpike.HourUs) % 24
              -> (r.getLong(3), r.getLong(4))).toMap
        } finally q.stop()
      }
      val kept = run("sspike_keep",
        df => StreamSpike.spikes(df, "30 minutes"))
      // keep-forever: the hour-22 verdict still sees the 10-12 trail
      assert(kept(22L) == ((6L, 3L)), kept.toString)
      val dropped = run("sspike_ttl",
        df => StreamSpike.spikes(df, "30 minutes",
          trailRetentionHours = Some(2L)))
      // retention 2h: state died at hour 12's end + 2h, long before the
      // return — the comeback hour starts from an empty trail
      assert(dropped(22L) == ((0L, 0L)), dropped.toString)
      // hours finalized while active are identical either way
      assert(Seq(10L, 11L, 12L).forall(h => dropped(h) == kept(h)))
      val droppedTws = run("sspike_ttl_tws",
        df => graft.streaming.TwsStreamSpike.spikes(df, "30 minutes",
          trailRetentionHours = Some(2L)))
      assert(droppedTws == dropped)
    } finally prev match {
      case Some(v) => spark.conf.set(
        graft.streaming.TwsStrikeMonitor.rocksdbConf._1, v)
      case None => spark.conf.unset(
        graft.streaming.TwsStrikeMonitor.rocksdbConf._1)
    }
  }

  test("restart from checkpoint: trail state survives, no duplicate " +
    "or lost hours, and the post-restart spike verdict uses the " +
    "pre-restart baseline") {
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("spike_ckpt")
    val in = base.resolve("in"); val chk = base.resolve("chk")
    val out = base.resolve("out")
    java.nio.file.Files.createDirectories(in)
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("ts", TimestampType)))
    def drop(name: String, rows: Seq[(Long, String)]): Unit =
      java.nio.file.Files.write(in.resolve(name),
        ("user_id,ts" +: rows.map { case (u, t) => s"$u,$t" })
          .mkString("\n").getBytes)
    def start() = StreamSpike.spikes(
        spark.readStream.schema(schema).option("header", "true")
          .csv(in.toString), "30 minutes")
      .writeStream.format("parquet").option("path", out.toString)
      .option("checkpointLocation", chk.toString)
      .outputMode("append").start()
    def hr(h: Int, m: Int) = f"2024-01-01 $h%02d:$m%02d:00"
    // run 1: the baseline hours 10(1), 11(2), 12(3)
    drop("b1.csv", Seq((5L, hr(10, 0)), (5L, hr(11, 0)), (5L, hr(11, 1)),
      (5L, hr(12, 0)), (5L, hr(12, 1)), (5L, hr(12, 2))))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // run 2: the hour-13 burst + watermark sentinels; its spike verdict
    // needs the trail (1,2,3) accumulated BEFORE the restart
    drop("b2.csv", (1 to 9).map(i => (5L, hr(13, i))) ++
      Seq((99L, "2024-01-02 00:00:00")))
    val q2 = start()
    try {
      q2.processAllAvailable()
      drop("b3.csv", Seq((99L, "2024-01-02 06:00:00")))
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = spark.read.parquet(out.toString)
      .filter(col("user_id") === 5L).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toMap
    assert(rows.size == 4, s"exactly hours 10-13 once each, got $rows")
    // counts are unique per hour here; locate the burst by its count
    assert(rows.values.toSeq.sortBy(_._1) == Seq(
      (1L, 0L, 0L, false), (2L, 1L, 1L, false), (3L, 3L, 2L, false),
      (9L, 6L, 3L, true)),
      "burst must spike against the pre-restart trail")
  }

  test("late events past the watermark cannot resurrect a finalized " +
    "hour; pure fold caps the trail at 3") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamSpike.Evt]
    val out = StreamSpike.spikes(input.toDF(), "10 minutes")
    val q = out.writeStream.format("memory").queryName("sspike_late")
      .outputMode("append").start()
    try {
      input.addData(evts(7, 10, 2): _*)
      q.processAllAvailable()
      input.addData(StreamSpike.Evt(7, t("2024-01-01 15:00:00")))
      q.processAllAvailable()
      // hour 10 finalized (n=2); this straggler is far below the
      // watermark and must be dropped, not double-counted
      input.addData(StreamSpike.Evt(7, t("2024-01-01 10:30:00")))
      q.processAllAvailable()
      input.addData(StreamSpike.Evt(7, t("2024-01-01 20:00:00")))
      q.processAllAvailable()
      val ten = spark.table("sspike_late")
        .filter(col("hour_us") === unix_micros(lit(t("2024-01-01 10:00:00"))))
        .collect()
      assert(ten.length == 1 && ten.head.getLong(2) == 2L)
    } finally q.stop()

    // pure-fold unit: trail never exceeds 3 and drops the oldest
    val hours = (0 until 6).map(i => i * StreamSpike.HourUs)
    val (rows, st) = StreamSpike.fold(1L, None, hours.flatMap(h =>
      Seq.fill(1)(h)), 7 * StreamSpike.HourUs)
    assert(rows.length == 6)
    assert(st.trail.length == 3)
    assert(st.trail.map(_._1) == hours.takeRight(3))
  }
}
