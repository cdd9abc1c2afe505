package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StrikeMonitor
import graft.streaming.StrikeMonitor.{Flagged, Message, StrikeState}

/** Streaming strike-monitor semantics (SURVEY.md §2.9 T1-T6): reserved
  * -word flagging, strike accumulation + salary deduction, the 10-strike
  * INACTIVE transition, monthly cooldown reset, flagged-message log.
  */
class StrikeMonitorSpec extends AnyFunSuite with SparkSpec {

  private val reserved = Set("secret", "fraud")
  private def ts(s: String) = Timestamp.valueOf(s)

  test("foldMessages: flags, deducts 10%, 10th strike goes INACTIVE") {
    val msgs = (1 to 10).map(i =>
      Message(1L, s"this is fraud number $i", ts(f"2024-01-01 10:$i%02d:00")))
    val (st, out) = StrikeMonitor.foldMessages(msgs, null, reserved, 1000.0)
    assert(out.length == 10)
    assert(out.take(9).forall(_.status == "Active"))
    assert(out.last.status == "INACTIVE" && out.last.strike_no == 10)
    assert(!st.active && st.strikes == 10)
    assert(math.abs(st.salary - 1000.0 * math.pow(0.9, 10)) < 1e-9)
  }

  test("foldMessages: clean messages pass, INACTIVE emp accrues nothing") {
    val (st, out) = StrikeMonitor.foldMessages(
      Seq(Message(1L, "perfectly fine update", ts("2024-01-01 10:00:00"))),
      null, reserved, 1000.0)
    assert(out.isEmpty && st.strikes == 0 && st.active)
    val inactive = StrikeState(10, 500.0, active = false, 24276)
    val (st2, out2) = StrikeMonitor.foldMessages(
      Seq(Message(1L, "fraud again", ts("2024-02-01 10:00:00"))),
      inactive, reserved, 1000.0)
    assert(out2.isEmpty && st2.strikes == 10 && !st2.active)
  }

  test("foldMessages: strikes reset on month change unless INACTIVE") {
    val jan = (1 to 3).map(i =>
      Message(1L, "secret plan", ts(f"2024-01-0$i 09:00:00")))
    val (stJan, _) = StrikeMonitor.foldMessages(jan, null, reserved, 1000.0)
    assert(stJan.strikes == 3)
    val (stFeb, outFeb) = StrikeMonitor.foldMessages(
      Seq(Message(1L, "secret again", ts("2024-02-01 09:00:00"))),
      stJan, reserved, 1000.0)
    assert(stFeb.strikes == 1, "monthly cooldown must reset before count")
    assert(outFeb.head.strike_no == 1)
  }

  test("foldMessages: late prior-month message cannot reset strikes") {
    // 3 strikes in Feb, then a straggler from January arrives in a later
    // batch: it must neither clear the Feb strikes (month is not a FORWARD
    // change) nor rewind lastMonth so that the next Feb message re-triggers
    // a reset.
    val feb = (1 to 3).map(i =>
      Message(1L, "secret plan", ts(f"2024-02-0$i 09:00:00")))
    val (stFeb, _) = StrikeMonitor.foldMessages(feb, null, reserved, 1000.0)
    assert(stFeb.strikes == 3)
    val (stLate, outLate) = StrikeMonitor.foldMessages(
      Seq(Message(1L, "secret straggler", ts("2024-01-31 23:00:00"))),
      stFeb, reserved, 1000.0)
    assert(stLate.strikes == 4, "late Jan message adds a strike, no reset")
    assert(outLate.head.strike_no == 4)
    val (stNext, _) = StrikeMonitor.foldMessages(
      Seq(Message(1L, "secret again", ts("2024-02-15 09:00:00"))),
      stLate, reserved, 1000.0)
    assert(stNext.strikes == 5, "lastMonth stayed monotone — no fake boundary")
  }

  test("streaming end-to-end via MemoryStream: append log across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Message]
    val out = StrikeMonitor.monitor(spark, input.toDS(), reserved,
      Map(7L -> 2000.0))
    val q = out.writeStream.format("memory").queryName("strikes")
      .outputMode("append").start()
    try {
      input.addData(Message(7L, "a secret thing", ts("2024-03-01 08:00:00")))
      q.processAllAvailable()
      input.addData(Message(7L, "more fraud", ts("2024-03-01 09:00:00")),
        Message(8L, "all clean", ts("2024-03-01 09:30:00")))
      q.processAllAvailable()
      val rows = spark.table("strikes").as[Flagged].collect()
        .sortBy(_.strike_no)
      assert(rows.length == 2)
      assert(rows.map(_.strike_no).toSeq == Seq(1, 2))
      assert(math.abs(rows.last.updated_salary - 2000.0 * 0.81) < 1e-9)
      assert(rows.forall(_.emp_id == 7L))
    } finally q.stop()
  }
}
