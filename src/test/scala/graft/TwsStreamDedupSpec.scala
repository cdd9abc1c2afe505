package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StreamDedup, TwsStreamDedup}

/** TwsStreamDedup: the transformWithState twin must keep exactly the
  * rows the declarative `dropDuplicatesWithinWatermark` twin keeps —
  * first sighting kept, clones inside the horizon dropped, a
  * re-arrival after the digest's state expired kept again.
  */
class TwsStreamDedupSpec extends AnyFunSuite with SparkSpec {

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

  test("declarative and TWS twins keep identical survivors across " +
    "in-horizon clones and a post-expiry re-arrival") { withRocksdb {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch 1: two originals; batch 2: an in-horizon clone of doc 1
    // plus a fresh doc; batch 3: watermark jump past the horizon;
    // batch 4: the doc-1 text again — state expired, so it is KEPT
    val batches = Seq(
      Seq(DdDoc(1, t("2024-01-01 10:00:00"), "alpha beta gamma"),
        DdDoc(2, t("2024-01-01 10:01:00"), "delta epsilon zeta")),
      Seq(DdDoc(3, t("2024-01-01 10:02:00"), "alpha beta gamma"),
        DdDoc(4, t("2024-01-01 10:03:00"), "eta theta iota")),
      Seq(DdDoc(5, t("2024-01-01 11:00:00"), "unrelated filler")),
      Seq(DdDoc(6, t("2024-01-01 11:01:00"), "alpha beta gamma")))
    def run(name: String,
            mk: org.apache.spark.sql.DataFrame
              => org.apache.spark.sql.Dataset[_]): Set[Long] = {
      val input = MemoryStream[DdDoc]
      val q = mk(input.toDF()).writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try {
        batches.foreach { b =>
          input.addData(b: _*); q.processAllAvailable()
        }
        spark.table(name).select("doc_id").collect()
          .map(_.getLong(0)).toSet
      } finally q.stop()
    }
    val declarative =
      run("tdd_a", df => StreamDedup.exact(df, "10 minutes"))
    val tws = run("tdd_t", df => TwsStreamDedup.exact(df, "10 minutes"))
    assert(declarative == Set(1L, 2L, 4L, 5L, 6L),
      s"declarative twin sanity: $declarative")
    assert(tws == declarative,
      s"twins must keep identical survivors: tws=$tws vs $declarative")
  }}

  test("TWS twin matches the batch q20 digest dedup inside one " +
    "horizon") { withRocksdb {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      DdDoc(1, t("2024-01-01 10:00:00"), "one two three"),
      DdDoc(2, t("2024-01-01 10:00:30"), "four five six"),
      DdDoc(3, t("2024-01-01 10:01:00"), "one two three"),
      DdDoc(4, t("2024-01-01 10:01:30"), "four five six"),
      DdDoc(5, t("2024-01-01 10:02:00"), "seven eight nine"))
    val input = MemoryStream[DdDoc]
    val q = TwsStreamDedup.exact(input.toDF(), "1 hour")
      .writeStream.format("memory").queryName("tdd_batch")
      .outputMode("append").start()
    try {
      corpus.foreach { d => input.addData(d); q.processAllAvailable() }
      val streamKept = spark.table("tdd_batch").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      val batchKept = graft.operators.Dedup
        .exactByHash(corpus.toDS().toDF(), "text", "doc_id")
        .select("canonical_id").collect().map(_.getLong(0)).toSet
      assert(streamKept == batchKept)
    } finally q.stop()
  }}

  test("a same-batch clone pair keeps exactly one row and writes " +
    "state once") { withRocksdb {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DdDoc]
    val q = TwsStreamDedup.exact(input.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("tdd_same")
      .outputMode("append").start()
    try {
      input.addData(
        DdDoc(1, t("2024-01-01 10:00:00"), "same same text"),
        DdDoc(2, t("2024-01-01 10:00:05"), "same same text"))
      q.processAllAvailable()
      val kept = spark.table("tdd_same").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L),
        "within one batch the first sighting wins, the clone drops")
    } finally q.stop()
  }}
}
