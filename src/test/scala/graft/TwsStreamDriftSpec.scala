package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StreamDrift, TwsStreamDrift}

/** TwsStreamDrift: the transformWithState twin must emit rows
  * identical to the windowed-aggregation twin on the same stream and
  * reference — all 64 buckets per closed window, including the
  * zero-count vanished ones — and drop late tokens into closed windows
  * like the watermark filter does.
  */
class TwsStreamDriftSpec extends AnyFunSuite with SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  private def withRocksdb[A](body: => A): A = {
    val key = graft.streaming.TwsStrikeMonitor.rocksdbConf._1
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, graft.streaming.TwsStrikeMonitor.rocksdbConf._2)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("windowed-agg and TWS twins emit identical verdict rows on a " +
    "clean window and a mass-shifted window") { withRocksdb {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val toks = ('a' to 'j').map(_.toString)
    val refDocs = Seq(toks.flatMap(tk => Seq.fill(10)(tk)).mkString(" "))
      .toDF("text")
    val ref = StreamDrift.referenceFrom(refDocs, "text")
    // window 10:00 mirrors the reference mix; 10:01 is all-'a'
    val all = Seq(
      DocEvt(1, t("2024-01-01 10:00:10"), toks.mkString(" ")),
      DocEvt(2, t("2024-01-01 10:01:10"),
        Seq.fill(20)("a").mkString(" ")),
      DocEvt(3, t("2024-01-01 10:10:00"), "zzz"))
    def run(name: String,
            mk: org.apache.spark.sql.DataFrame
              => org.apache.spark.sql.Dataset[_]): Set[String] = {
      val input = MemoryStream[DocEvt]
      val q = mk(input.toDF()).writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try {
        input.addData(all.take(2): _*)
        q.processAllAvailable()
        input.addData(all.drop(2): _*)
        q.processAllAvailable()
        spark.table(name).collect().map(_.mkString("|")).toSet
      } finally q.stop()
    }
    val agg = run("drtwin_a",
      df => StreamDrift.drift(df, ref, "1 minute", "1 minute"))
    val tws = run("drtwin_t",
      df => TwsStreamDrift.drift(df, ref, "1 minute", "1 minute"))
    assert(agg.size == 2 * StreamDrift.NBuckets,
      s"two closed windows x 64 buckets expected, got ${agg.size}")
    assert(tws == agg,
      "twins must agree bucket-for-bucket on both closed windows")
  }}

  test("late tokens into a closed window are dropped, not re-counted") {
    withRocksdb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val ref = StreamDrift.referenceFrom(
        Seq("aa bb cc dd").toDF("text"), "text")
      val input = MemoryStream[DocEvt]
      val q = TwsStreamDrift.drift(input.toDF(), ref, "1 minute",
        "1 minute").writeStream.format("memory")
        .queryName("drtwin_late").outputMode("append").start()
      try {
        input.addData(DocEvt(1, t("2024-01-01 10:00:10"), "aa bb"))
        q.processAllAvailable()
        // watermark jump closes 10:00 and emits its 64 rows
        input.addData(DocEvt(2, t("2024-01-01 10:30:00"), "cc"))
        q.processAllAvailable()
        // straggler into the CLOSED 10:00 window must be discarded
        input.addData(DocEvt(3, t("2024-01-01 10:00:30"), "aa aa aa"))
        q.processAllAvailable()
        input.addData(DocEvt(4, t("2024-01-01 11:00:00"), "dd"))
        q.processAllAvailable()
        val w1 = spark.table("drtwin_late").collect()
          .filter(_.getTimestamp(0) == t("2024-01-01 10:00:00"))
        assert(w1.length == StreamDrift.NBuckets,
          "the closed window emits exactly once (64 rows)")
        assert(w1.map(_.getLong(3)).sum == 2L,
          "only the two on-time tokens are counted; the straggler " +
            "batch must not re-open or re-count the window")
      } finally q.stop()
    }
  }
}
