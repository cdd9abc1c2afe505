package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StrikeMonitor
import graft.streaming.StrikeMonitor.Message

/** Streaming-vs-batch consistency at data scale: error events from the
  * real events table become reserved-word messages; the streaming
  * monitor's flagged counts must equal the batch accounting (q33 twin)
  * capped at the 10-strike INACTIVE cutoff (all events fall in one
  * month, so no cooldown resets interfere).
  */
class StrikeParitySpec extends AnyFunSuite with SparkSpec {

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
}
