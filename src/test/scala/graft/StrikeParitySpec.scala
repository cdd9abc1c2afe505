package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StrikeMonitor, TwsStrikeMonitor}
import graft.streaming.StrikeMonitor.Message

/** Streaming-vs-batch consistency at data scale: error events from the
  * real events table become reserved-word messages; the streaming
  * monitor's flagged counts must equal the batch accounting (q33 twin)
  * capped at the 10-strike INACTIVE cutoff (all events fall in one
  * month, so no cooldown resets interfere).
  */
class StrikeParitySpec extends AnyFunSuite with SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("streaming flagged counts equal batch strikes capped at 10") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val errors = Tables.events(spark, sf)
      .filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"))
      .collect()
      .map(r => Message(r.getLong(0),
        s"fraud incident ${r.getLong(2)}", r.getTimestamp(1)))
    val input = MemoryStream[Message]
    val out = StrikeMonitor.monitor(spark, input.toDS(),
      Set("fraud"), Map.empty)
    val q = out.writeStream.format("memory").queryName("paritystrikes")
      .outputMode("append").start()
    try {
      input.addData(errors.toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("paritystrikes")
        .groupBy("emp_id").agg(count(lit(1)).as("flagged"),
          max("strike_no").as("max_strike"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
      val batch = SparkEntry.queries("q33_strike_batch")(spark, sf)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(3))).toMap
      assert(streamed.keySet == batch.keySet)
      batch.foreach { case (user, (strikes, status)) =>
        val (flagged, maxStrike) = streamed(user)
        assert(flagged == math.min(strikes, 10L),
          s"user $user: streaming flagged $flagged vs batch $strikes")
        assert(maxStrike.toLong == math.min(strikes, 10L))
        assert((status == "INACTIVE") == (strikes >= 10))
      }
    } finally q.stop()
  }

  test("transformWithState monitor emits the same flag log") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val msgs = Seq(
      Message(1L, "routine update", t("2024-01-01 10:00:00")),
      Message(1L, "fraud attempt", t("2024-01-01 10:01:00")),
      Message(1L, "another fraud", t("2024-01-02 09:00:00")),
      Message(2L, "fraud", t("2024-01-01 11:00:00")),
      // month boundary: employee 1's strikes reset before this flag
      Message(1L, "fraud again", t("2024-02-01 08:00:00")))
    val prev = spark.conf.getOption(TwsStrikeMonitor.rocksdbConf._1)
    spark.conf.set(TwsStrikeMonitor.rocksdbConf._1,
      TwsStrikeMonitor.rocksdbConf._2)
    try {
      val input = MemoryStream[Message]
      val out = TwsStrikeMonitor.monitor(spark, input.toDS(),
        Set("fraud"), Map(1L -> 1000.0))
      val q = out.writeStream.format("memory").queryName("twsstrikes")
        .outputMode("append").start()
      try {
        input.addData(msgs.take(4): _*)
        q.processAllAvailable()
        input.addData(msgs.drop(4): _*) // cross-batch state carry
        q.processAllAvailable()
        val got = spark.table("twsstrikes").as[StrikeMonitor.Flagged]
          .collect().sortBy(f => (f.emp_id, f.ts.getTime))
        // reference fold over the same messages per employee
        val expect = msgs.groupBy(_.emp_id).toSeq.flatMap { case (id, ms) =>
          StrikeMonitor.foldMessages(ms, null, Set("fraud"),
            if (id == 1L) 1000.0 else 100000.0)._2
        }.sortBy(f => (f.emp_id, f.ts.getTime))
        assert(got.toSeq == expect)
        // the month-boundary reset carried across batches: the Feb flag
        // for employee 1 is strike #1 again, not #3
        assert(got.filter(_.emp_id == 1L).last.strike_no == 1)
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(TwsStrikeMonitor.rocksdbConf._1, v)
      case None => spark.conf.unset(TwsStrikeMonitor.rocksdbConf._1)
    }
  }
}
