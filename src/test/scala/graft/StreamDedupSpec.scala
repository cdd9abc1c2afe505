package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamDedup

case class DdDoc(doc_id: Long, ts: Timestamp, text: String)

class StreamDedupSpec extends AnyFunSuite with SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("clone within the watermark horizon is dropped, first kept") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DdDoc]
    val q = StreamDedup.exact(input.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("sdd1")
      .outputMode("append").start()
    try {
      input.addData(
        DdDoc(1, t("2024-01-01 10:00:00"), "alpha beta gamma"),
        DdDoc(2, t("2024-01-01 10:01:00"), "delta epsilon zeta"))
      q.processAllAvailable()
      input.addData( // clone of 1 in a later micro-batch, inside horizon
        DdDoc(3, t("2024-01-01 10:02:00"), "alpha beta gamma"),
        DdDoc(4, t("2024-01-01 10:03:00"), "eta theta iota"))
      q.processAllAvailable()
      val kept = spark.table("sdd1").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 2L, 4L))
    } finally q.stop()
  }

  test("stream survivors equal the batch q20 digest dedup on the " +
    "same corpus (single horizon)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      DdDoc(1, t("2024-01-01 10:00:00"), "one two three"),
      DdDoc(2, t("2024-01-01 10:00:30"), "four five six"),
      DdDoc(3, t("2024-01-01 10:01:00"), "one two three"),
      DdDoc(4, t("2024-01-01 10:01:30"), "four five six"),
      DdDoc(5, t("2024-01-01 10:02:00"), "seven eight nine"))
    val input = MemoryStream[DdDoc]
    val q = StreamDedup.exact(input.toDF(), "1 hour")
      .writeStream.format("memory").queryName("sdd2")
      .outputMode("append").start()
    try {
      corpus.foreach { d => input.addData(d); q.processAllAvailable() }
      val streamKept = spark.table("sdd2").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      val batchKept = graft.operators.Dedup
        .exactByHash(corpus.toDS().toDF(), "text", "doc_id")
        .select("canonical_id").collect().map(_.getLong(0)).toSet
      assert(streamKept == batchKept)
    } finally q.stop()
  }

  test("digest state expires: clone past the horizon is kept again") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DdDoc]
    val q = StreamDedup.exact(input.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("sdd3")
      .outputMode("append").start()
    try {
      input.addData(DdDoc(1, t("2024-01-01 10:00:00"), "recurring text"))
      q.processAllAvailable()
      // advance the watermark far past the horizon, then replay the text
      input.addData(DdDoc(2, t("2024-01-01 11:00:00"), "unrelated filler"))
      q.processAllAvailable()
      input.addData(DdDoc(3, t("2024-01-01 11:01:00"), "recurring text"))
      q.processAllAvailable()
      val kept = spark.table("sdd3").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      // doc 3 is kept: its digest's state expired with the watermark —
      // the documented horizon-bounded exactness trade
      assert(kept == Set(1L, 2L, 3L))
    } finally q.stop()
  }
}
