package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming parity: the windowed event aggregation computed
  * as a watermarked stream must equal its batch twin (q32 shape), and
  * late data beyond the watermark is dropped.
  */
case class Ev(ts: Timestamp, event_type: String, value: Double)

class StreamingSpec extends AnyFunSuite with SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("watermarked tumbling-window agg matches batch groupBy") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      Ev(t("2024-01-01 10:05:00"), "click", 1.0),
      Ev(t("2024-01-01 10:45:00"), "click", 2.0),
      Ev(t("2024-01-01 11:05:00"), "click", 4.0),
      Ev(t("2024-01-01 11:10:00"), "view", 8.0))
    val input = MemoryStream[Ev]
    val agg = input.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("v"))
      .select($"window.start".as("h"), $"event_type", $"n", $"v")
    val q = agg.writeStream.format("memory").queryName("winagg")
      .outputMode("append").start()
    try {
      input.addData(evs: _*)
      q.processAllAvailable()
      // advance watermark far enough to close all windows
      input.addData(Ev(t("2024-01-01 13:00:00"), "tick", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("winagg")
        .filter($"event_type" =!= "tick")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getLong(2), r.getDouble(3))).toSet
      val batch = evs.toDS()
        .groupBy(date_trunc("hour", $"ts").as("h"), $"event_type")
        .agg(count(lit(1)).as("n"), sum($"value").as("v"))
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("late rows beyond the watermark are dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val agg = input.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("h"), $"n")
    val q = agg.writeStream.format("memory").queryName("late")
      .outputMode("append").start()
    try {
      input.addData(Ev(t("2024-01-01 10:05:00"), "a", 1.0))
      q.processAllAvailable()
      input.addData(Ev(t("2024-01-01 15:00:00"), "a", 1.0)) // watermark jump
      q.processAllAvailable()
      input.addData(Ev(t("2024-01-01 10:06:00"), "late", 1.0)) // dropped
      input.addData(Ev(t("2024-01-01 16:00:00"), "a", 1.0))
      q.processAllAvailable()
      val rows = spark.table("late").collect()
        .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
      assert(rows("2024-01-01 10:00:00.0") == 1L,
        "late row must not have been added to the closed 10:00 window")
    } finally q.stop()
  }
}
