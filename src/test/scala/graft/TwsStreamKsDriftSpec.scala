package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StreamKsDrift, TwsStreamKsDrift}

/** TwsStreamKsDrift: the transformWithState twin must emit rows
  * identical to the windowed-aggregation twin on the same stream and
  * reference grid, enforce the same C·R envelope loudly, and drop late
  * rows into closed windows like the watermark filter does.
  */
class TwsStreamKsDriftSpec extends AnyFunSuite with SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)
  private def docOfLen(n: Int): String = Seq.fill(n)("w").mkString(" ")

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

  test("windowed-agg and TWS twins emit identical rows on the same " +
    "stream and grid") { withRocksdb {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val refDocs = (1 to 10).flatMap(n => Seq.fill(10)(docOfLen(n)))
      .toDF("text")
    val ref = StreamKsDrift.referenceFrom(refDocs, "text", nGrid = 10)
    // window 10:00 mirrors the reference; 10:01 is mass-shifted to the
    // max; 10:03 is mid-heavy — three windows, three distinct verdicts
    val all =
      (1 to 10).map(n => DocEvt(n.toLong,
        t("2024-01-01 10:00:10"), docOfLen(n))) ++
      (1 to 20).map(i => DocEvt(100L + i,
        t("2024-01-01 10:01:10"), docOfLen(10))) ++
      (1 to 7).map(i => DocEvt(200L + i,
        t("2024-01-01 10:03:05"), docOfLen(5)))
    def run(name: String,
            mk: org.apache.spark.sql.DataFrame
              => org.apache.spark.sql.Dataset[_]): Set[String] = {
      val input = MemoryStream[DocEvt]
      val q = mk(input.toDF()).writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try {
        input.addData(all.take(15): _*)
        q.processAllAvailable()
        input.addData(all.drop(15): _*)
        q.processAllAvailable()
        input.addData(DocEvt(999, t("2024-01-01 10:30:00"), "z"))
        q.processAllAvailable()
        spark.table(name).collect().map(_.mkString("|")).toSet
      } finally q.stop()
    }
    val agg = run("kstwin_a",
      df => StreamKsDrift.drift(df, ref, "1 minute", "1 minute"))
    val tws = run("kstwin_t",
      df => TwsStreamKsDrift.drift(df, ref, "1 minute", "1 minute"))
    assert(tws == agg && agg.size == 3,
      s"twins must agree on all three windows: agg=$agg tws=$tws")
  }}

  test("the TWS twin's C*R envelope fires loudly with the same bound " +
    "as the windowed twin") { withRocksdb {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val huge = StreamKsDrift.RefGrid(Seq(5L, 10L),
      Seq(5000000000000000L, 10000000000000000L), 10000000000000000L)
    val input = MemoryStream[DocEvt]
    val q = TwsStreamKsDrift.drift(input.toDF(), huge, "1 minute",
      "1 minute").writeStream.format("memory").queryName("kstwin_env")
      .outputMode("append").start()
    try {
      input.addData(DocEvt(1, t("2024-01-01 10:00:10"), docOfLen(3)))
      input.addData(DocEvt(2, t("2024-01-01 10:00:20"), docOfLen(7)))
      val ex = intercept[Throwable] {
        input.addData(DocEvt(3, t("2024-01-01 10:10:00"), "z"))
        q.processAllAvailable()
      }
      def chain(x: Throwable): String = {
        var c = x; val sb = new StringBuilder
        while (c != null) {
          sb.append(Option(c.getMessage).getOrElse("")); c = c.getCause
        }
        sb.toString
      }
      assert(chain(ex).contains(
        "TwsStreamKsDrift: C*R beyond the exact KS envelope"),
        s"expected the documented envelope message, got: ${chain(ex)}")
    } finally q.stop()
  }}

  test("late rows into a closed window are dropped, not re-opened") {
    withRocksdb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val ref = StreamKsDrift.referenceFrom(
        (1 to 10).map(docOfLen).toDF("text"), "text", nGrid = 4)
      val input = MemoryStream[DocEvt]
      val q = TwsStreamKsDrift.drift(input.toDF(), ref, "1 minute",
        "1 minute").writeStream.format("memory")
        .queryName("kstwin_late").outputMode("append").start()
      try {
        input.addData(DocEvt(1, t("2024-01-01 10:00:10"), docOfLen(5)))
        q.processAllAvailable()
        // watermark jumps far past 10:00 — the window closes and emits
        input.addData(DocEvt(2, t("2024-01-01 10:30:00"), docOfLen(5)))
        q.processAllAvailable()
        // a straggler into the CLOSED 10:00 window must be discarded
        input.addData(DocEvt(3, t("2024-01-01 10:00:30"), docOfLen(9)))
        q.processAllAvailable()
        input.addData(DocEvt(4, t("2024-01-01 11:00:00"), "z"))
        q.processAllAvailable()
        val starts = spark.table("kstwin_late").collect()
          .map(r => (r.getTimestamp(0), r.getLong(1)))
        // 10:00 emitted once with ONE doc (the straggler dropped);
        // no duplicate or re-opened emission
        assert(starts.count(_._1 == t("2024-01-01 10:00:00")) == 1)
        assert(starts.find(_._1 == t("2024-01-01 10:00:00")).get._2 == 1L)
      } finally q.stop()
    }
  }
}
