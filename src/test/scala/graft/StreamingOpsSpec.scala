package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Merge

/** Streaming operators beyond the windowed-agg twin (StreamingSpec):
  * watermarked streaming dedup, stream-stream interval join, and a
  * foreachBatch keyed upsert that maintains a dim table incrementally —
  * the streaming form of the reference's daily MERGE
  * (/root/reference/daily_dag.py:200-209).
  */
case class Imp(ad_id: Long, ts: Timestamp)
case class Clk(ad_id: Long, cts: Timestamp)
case class Upd(emp_id: Long, salary: Long, ts: Timestamp)
case class DimU(key: Long, ts: Timestamp, value: Double)
case class EvT(key: Long, ts: Timestamp, eventId: Long)

class StreamingOpsSpec extends AnyFunSuite with SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("dropDuplicatesWithinWatermark removes cross-batch dups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Imp]
    val dedup = input.toDS()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("ad_id")
    val q = dedup.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      input.addData(Imp(1, t("2024-01-01 10:00:00")),
        Imp(1, t("2024-01-01 10:01:00")), // same batch dup
        Imp(2, t("2024-01-01 10:02:00")))
      q.processAllAvailable()
      input.addData(Imp(1, t("2024-01-01 10:03:00"))) // cross-batch dup
      q.processAllAvailable()
      val got = spark.table("sdedup").groupBy($"ad_id")
        .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 1L, 2L -> 1L))
    } finally q.stop()
  }

  test("stream-stream interval join: click within 30 min of impression") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Imp]
    val clks = MemoryStream[Clk]
    val joined = imps.toDS().withWatermark("ts", "1 hour")
      .join(clks.toDS().withColumnRenamed("ad_id", "c_ad_id")
          .withWatermark("cts", "1 hour"),
        expr("""ad_id = c_ad_id AND
                cts >= ts AND cts <= ts + interval 30 minutes""".stripMargin))
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      imps.addData(Imp(1, t("2024-01-01 10:00:00")),
        Imp(2, t("2024-01-01 10:00:00")))
      clks.addData(Clk(1, t("2024-01-01 10:10:00")), // inside window
        Clk(2, t("2024-01-01 11:30:00"))) // too late — no match
      q.processAllAvailable()
      val got = spark.table("ssjoin").select($"ad_id").collect()
        .map(_.getLong(0)).toSeq
      assert(got == Seq(1L))
    } finally q.stop()
  }

  test("streaming session_window agg matches the batch q76 semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Imp] // ad_id doubles as the session key
    val sessions = input.toDS()
      .withWatermark("ts", "1 hour")
      .groupBy($"ad_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select($"ad_id", $"session_window.start".as("start"),
        $"session_window.end".as("end"), $"n")
    val q = sessions.writeStream.format("memory").queryName("ssess")
      .outputMode("append").start()
    try {
      input.addData(
        Imp(1, t("2024-01-01 10:00:00")),
        Imp(1, t("2024-01-01 10:20:00")), // merges: gap < 30 min
        Imp(1, t("2024-01-01 11:30:00"))) // new session: gap >= 30 min
      q.processAllAvailable()
      // advance the watermark far enough to close and emit both sessions
      input.addData(Imp(9, t("2024-01-01 15:00:00")))
      q.processAllAvailable()
      val got = spark.table("ssess").filter($"ad_id" === 1)
        .orderBy($"start")
        .collect().map(r => (r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3)))
      assert(got.toSeq == Seq(
        (t("2024-01-01 10:00:00"), t("2024-01-01 10:50:00"), 2L),
        (t("2024-01-01 11:30:00"), t("2024-01-01 12:00:00"), 1L)))
    } finally q.stop()
  }

  test("left-outer stream-stream join emits null match after watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Imp]
    val clks = MemoryStream[Clk]
    val joined = imps.toDS().withWatermark("ts", "10 minutes")
      .join(clks.toDS().withColumnRenamed("ad_id", "c_ad_id")
          .withWatermark("cts", "10 minutes"),
        expr("""ad_id = c_ad_id AND
                cts >= ts AND cts <= ts + interval 30 minutes"""),
        "left_outer")
    val q = joined.writeStream.format("memory").queryName("ssleft")
      .outputMode("append").start()
    try {
      imps.addData(Imp(1, t("2024-01-01 10:00:00")), // will match
        Imp(2, t("2024-01-01 10:00:00")))            // never matches
      clks.addData(Clk(1, t("2024-01-01 10:05:00")))
      q.processAllAvailable()
      // watermark must pass ts+30min on BOTH streams before the
      // unmatched left row can be finalized as (imp, null)
      imps.addData(Imp(9, t("2024-01-01 12:00:00")))
      clks.addData(Clk(9, t("2024-01-01 12:00:00")))
      q.processAllAvailable()
      imps.addData(Imp(8, t("2024-01-01 13:00:00")))
      clks.addData(Clk(8, t("2024-01-01 13:00:00")))
      q.processAllAvailable()
      val got = spark.table("ssleft")
        .filter($"ad_id" === 1 || $"ad_id" === 2)
        .collect().map(r => r.getLong(0) -> r.isNullAt(2)).toMap
      assert(got == Map(1L -> false, 2L -> true),
        s"expected ad 1 matched, ad 2 null-finalized; got $got")
    } finally q.stop()
  }

  test("streaming as-of enrichment: latest dim version at event time") {
    import spark.implicits._
    import graft.streaming.AsOfEnrich
    implicit val sqlCtx = spark.sqlContext
    val evs = MemoryStream[EvT]
    val dms = MemoryStream[DimU]
    val out = AsOfEnrich.enrich(evs.toDF(), dms.toDF(), "10 seconds")
    val q = out.writeStream.format("memory").queryName("asofenr")
      .outputMode("append").start()
    try {
      // batch 1: one version, one event after it, one before any version
      dms.addData(DimU(1, t("2024-01-01 10:00:00"), 100.0))
      evs.addData(EvT(1, t("2024-01-01 10:05:00"), 1),
        EvT(1, t("2024-01-01 09:55:00"), 0))
      q.processAllAvailable()
      // batch 2: out-of-order version (10:06 after 10:10 is seen in the
      // same batch) plus an event between them; e1 must NOT see 10:06
      dms.addData(DimU(1, t("2024-01-01 10:10:00"), 200.0),
        DimU(1, t("2024-01-01 10:06:00"), 150.0))
      evs.addData(EvT(1, t("2024-01-01 10:12:00"), 2),
        EvT(1, t("2024-01-01 10:07:00"), 4))
      q.processAllAvailable()
      // flush: push the watermark past every pending event
      dms.addData(DimU(1, t("2024-01-01 10:30:00"), 300.0))
      q.processAllAvailable()
      val got = spark.table("asofenr")
        .collect().map(r => r.getLong(1) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      assert(got == Map(0L -> None, 1L -> Some(100.0),
        4L -> Some(150.0), 2L -> Some(200.0)), s"got $got")

      // batch twin: AsOf.join over the same rows must agree event-wise
      val evB = Seq((1L, t("2024-01-01 10:05:00").getTime, 1L),
        (1L, t("2024-01-01 09:55:00").getTime, 0L),
        (1L, t("2024-01-01 10:12:00").getTime, 2L),
        (1L, t("2024-01-01 10:07:00").getTime, 4L))
        .toDF("key", "tm", "eventId")
      val dmB = Seq((1L, t("2024-01-01 10:00:00").getTime, 100.0),
        (1L, t("2024-01-01 10:10:00").getTime, 200.0),
        (1L, t("2024-01-01 10:06:00").getTime, 150.0),
        (1L, t("2024-01-01 10:30:00").getTime, 300.0))
        .toDF("key", "tm", "value")
      val batch = graft.operators.AsOf
        .join(evB, dmB, "key", "tm", "value", "value")
        .collect().map(r => r.getLong(r.fieldIndex("eventId")) ->
          (if (r.isNullAt(r.fieldIndex("asof_value"))) None
           else Some(r.getDouble(r.fieldIndex("asof_value"))))).toMap
      assert(batch == got, s"streaming $got != batch $batch")
    } finally q.stop()
  }

  test("transformWithState as-of enrichment matches the fMGWS twin") {
    import spark.implicits._
    import graft.streaming.{TwsAsOfEnrich, TwsStrikeMonitor}
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(TwsStrikeMonitor.rocksdbConf._1)
    spark.conf.set(TwsStrikeMonitor.rocksdbConf._1,
      TwsStrikeMonitor.rocksdbConf._2)
    try {
      val evs = MemoryStream[EvT]
      val dms = MemoryStream[DimU]
      val out = TwsAsOfEnrich.enrich(evs.toDF(), dms.toDF(), "10 seconds")
      val q = out.writeStream.format("memory").queryName("twsasof")
        .outputMode("append").start()
      try {
        // same input as the AsOfEnrich test — output must be identical
        dms.addData(DimU(1, t("2024-01-01 10:00:00"), 100.0))
        evs.addData(EvT(1, t("2024-01-01 10:05:00"), 1),
          EvT(1, t("2024-01-01 09:55:00"), 0))
        q.processAllAvailable()
        dms.addData(DimU(1, t("2024-01-01 10:10:00"), 200.0),
          DimU(1, t("2024-01-01 10:06:00"), 150.0))
        evs.addData(EvT(1, t("2024-01-01 10:12:00"), 2),
          EvT(1, t("2024-01-01 10:07:00"), 4))
        q.processAllAvailable()
        dms.addData(DimU(1, t("2024-01-01 10:30:00"), 300.0))
        q.processAllAvailable()
        val got = spark.table("twsasof")
          .collect().map(r => r.getLong(1) ->
            (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
        assert(got == Map(0L -> None, 1L -> Some(100.0),
          4L -> Some(150.0), 2L -> Some(200.0)), s"got $got")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(TwsStrikeMonitor.rocksdbConf._1, v)
      case None => spark.conf.unset(TwsStrikeMonitor.rocksdbConf._1)
    }
  }

  test("checkpoint recovery: restart resumes exactly-once, no dup/loss") {
    import graft.sources.Sources
    val base = java.nio.file.Files.createTempDirectory("ckpt")
    val in = base.resolve("in"); val chk = base.resolve("chk")
    val out = base.resolve("out")
    java.nio.file.Files.createDirectories(in)
    def drop(name: String, rows: Seq[String]): Unit =
      java.nio.file.Files.write(in.resolve(name),
        ("emp_id,emp_name,emp_age" +: rows).mkString("\n").getBytes)
    def startQuery() = Sources
      .csvStream(spark, in.toString, Schemas.empDataRaw)
      .writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", chk.toString)
      .outputMode("append").start()

    drop("b1.csv", Seq("1,ann,30", "2,bo,40"))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    // second drop lands while no query is running; the restarted query
    // must pick it up from the checkpoint without re-emitting batch 1
    drop("b2.csv", Seq("3,cy,50"))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(out.toString)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  test("foreachBatch upsert maintains a keyed dim incrementally") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("dim").toString
    // seed the dim
    Seq((1L, 100L), (2L, 200L)).toDF("emp_id", "salary")
      .write.mode("overwrite").parquet(dir)
    val input = MemoryStream[Upd]
    val q = input.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Upd], _: Long) =>
        // latest update per key within the batch, then keyed upsert
        val latest = graft.operators.Dedup.keepFirst(
          batch.toDF(), Seq("emp_id"), Seq(col("ts").desc))
          .select("emp_id", "salary")
        val dim = batch.sparkSession.read.parquet(dir)
        val merged = Merge.upsert(dim, latest, Seq("emp_id"))
        // collect-then-rewrite avoids reading and overwriting the same
        // files in one job (fine for a dim; a transactional format does
        // this atomically at scale)
        val rows = merged.collect()
        batch.sparkSession
          .createDataFrame(batch.sparkSession.sparkContext
            .parallelize(rows.toSeq), merged.schema)
          .write.mode("overwrite").parquet(dir)
      }
      .start()
    try {
      input.addData(
        Upd(2, 250L, t("2024-01-01 10:00:00")),
        Upd(2, 260L, t("2024-01-01 10:05:00")), // later wins within batch
        Upd(3, 300L, t("2024-01-01 10:01:00"))) // insert
      q.processAllAvailable()
      val got = spark.read.parquet(dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 100L, 2L -> 260L, 3L -> 300L))
    } finally q.stop()
  }
}
