package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamSessions

/** StreamSessions: closed streaming sessions equal the batch q76
  * session_window rows over the same events; a session split across
  * micro-batches still merges; watermark finalization needs no further
  * events from the session's own user.
  */
class StreamSessionsSpec extends AnyFunSuite with SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("closed sessions replay the batch q76 gap-merge exactly, " +
    "including a session split across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val out = StreamSessions.sessions(
      input.toDF().toDF("user_id", "ts"), "30 minutes", "10 minutes")
    val q = out.writeStream.format("memory").queryName("ssess")
      .outputMode("append").start()
    // user 1: two sessions (10:00-10:20 events, then a >30min gap to
    // 11:30); user 2: one single-event session. The second half of user
    // 1's first session arrives in a LATER micro-batch — gap-merge must
    // still fuse them.
    val batch1 = Seq(
      (1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 10:10:00")),
      (2L, t("2024-01-01 10:05:00")))
    val batch2 = Seq(
      (1L, t("2024-01-01 10:20:00")),
      (1L, t("2024-01-01 11:30:00")))
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      // sentinel: user 99 far in the future pushes the watermark past
      // every session end + gap; users 1/2 send nothing further
      input.addData((99L, t("2024-01-02 00:00:00")))
      q.processAllAvailable()
      input.addData((99L, t("2024-01-02 06:00:00")))
      q.processAllAvailable()

      val got = spark.table("ssess")
        .filter(col("user_id") =!= 99)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet

      // batch twin: the exact q76 idiom over the same events
      val expected = (batch1 ++ batch2).toDF("user_id", "ts")
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          unix_micros(col("session_window.end")).as("end_us"),
          col("n"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(got == expected)
      // structure: user 1 has exactly two sessions, the first carrying
      // all three cross-batch events; user 2 one single-event session
      val u1 = got.filter(_._1 == 1L).toSeq.sortBy(_._2)
      assert(u1.length == 2)
      assert(u1.head._4 == 3L, "cross-micro-batch events merged")
      assert(u1(1)._4 == 1L)
      assert(got.count(_._1 == 2L) == 1)
      // session end = last event + gap
      assert(u1.head._3 == u1.head._2 + 20L * 60 * 1000000
        + 30L * 60 * 1000000)
    } finally q.stop()
  }

  test("no session emits while the watermark can still merge into it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val out = StreamSessions.sessions(
      input.toDF().toDF("user_id", "ts"), "30 minutes", "10 minutes")
    val q = out.writeStream.format("memory").queryName("ssess_open")
      .outputMode("append").start()
    try {
      input.addData((1L, t("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // watermark is still at 09:50 — the open session must not emit
      assert(spark.table("ssess_open").count() == 0)
    } finally q.stop()
  }
}
