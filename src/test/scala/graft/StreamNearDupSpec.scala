package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Text
import graft.streaming.StreamNearDup

case class NdDoc(doc_id: Long, ts: Timestamp, text: String)

class StreamNearDupSpec extends AnyFunSuite with SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  private val corpus = Seq(
    NdDoc(1, t("2024-01-01 10:00:00"), "the quick brown fox jumps over the lazy dog"),
    NdDoc(2, t("2024-01-01 10:01:00"), "completely different text about spark engines and shuffles"),
    NdDoc(3, t("2024-01-01 10:02:00"), "the quick brown fox jumps over the lazy dog"), // clone of 1
    NdDoc(4, t("2024-01-01 10:03:00"), "a third topic entirely unrelated to the others here"))

  test("per-row band digests equal Text.candidateBands' digests") {
    import spark.implicits._
    val docs = corpus.toDS().toDF()
    val streamStyle = StreamNearDup.bandRows(docs)
      .select(col("doc_id"), col("band"), col("h"))
      .collect().map(_.mkString("|")).toSet
    val batchStyle = Text.candidateBands(docs, "doc_id", "text")
      .select(col("doc_id"), col("band"), col("h"))
      .collect().map(_.mkString("|")).toSet
    assert(streamStyle == batchStyle && streamStyle.nonEmpty)
  }

  test("flags equal the batch probe: clone flagged against its owner") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[NdDoc]
    val q = StreamNearDup.flag(input.toDF(), "10 minutes",
        retentionMs = 3600_000L)
      .writeStream.format("memory").queryName("snd1")
      .outputMode("append").start()
    try {
      input.addData(corpus.take(2): _*)
      q.processAllAvailable()
      input.addData(corpus.drop(2): _*) // clone arrives in a later batch
      q.processAllAvailable()
      val flagged = spark.table("snd1")
        .select(col("doc_id"), col("matched_id")).distinct()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
      // batch ground truth: docs appearing as doc_b in candidatePairs
      val batchPairs = Text.candidatePairs(corpus.toDS().toDF(),
          "doc_id", "text")
        .collect().map(r => r.getLong(1) -> r.getLong(0)).toSet
      assert(flagged == batchPairs)
      assert(flagged == Set(3L -> 1L)) // only the clone, against doc 1
    } finally q.stop()
  }

  test("ownership transfers to a within-watermark straggler") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[NdDoc]
    val q = StreamNearDup.flag(input.toDF(), "10 minutes", 3600_000L)
      .writeStream.format("memory").queryName("snd2")
      .outputMode("append").start()
    try {
      input.addData(NdDoc(10, t("2024-01-01 10:05:00"), "same exact text here ok"))
      q.processAllAvailable()
      // earlier event time, later arrival, inside the watermark
      input.addData(NdDoc(9, t("2024-01-01 10:04:00"), "same exact text here ok"))
      q.processAllAvailable()
      val flagged = spark.table("snd2")
        .select(col("doc_id"), col("matched_id")).distinct()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
      // the displaced owner 10 is flagged against the true earliest 9
      assert(flagged == Set(10L -> 9L))
    } finally q.stop()
  }

  test("transformWithState twin emits exactly the fMGWS flags") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(
      graft.streaming.TwsStrikeMonitor.rocksdbConf._1)
    spark.conf.set(graft.streaming.TwsStrikeMonitor.rocksdbConf._1,
      graft.streaming.TwsStrikeMonitor.rocksdbConf._2)
    try {
      val input = MemoryStream[NdDoc]
      val q = graft.streaming.TwsStreamNearDup
        .flag(input.toDF(), "10 minutes", 3600_000L)
        .writeStream.format("memory").queryName("sndtws")
        .outputMode("append").start()
      try {
        input.addData(corpus.take(2): _*)
        q.processAllAvailable()
        input.addData(corpus.drop(2): _*)
        q.processAllAvailable()
        val flagged = spark.table("sndtws")
          .select(col("doc_id"), col("band"), col("matched_id"))
          .collect().map(_.mkString("|")).toSet
        // same corpus as the fMGWS test: doc 3 flagged against doc 1 in
        // every one of its 4 bands (identical text -> all bands match)
        assert(flagged == (0 until 4).map(b => s"3|$b|1").toSet)
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(
        graft.streaming.TwsStrikeMonitor.rocksdbConf._1, v)
      case None => spark.conf.unset(
        graft.streaming.TwsStrikeMonitor.rocksdbConf._1)
    }
  }

  test("bucket state expires after retention: old clone not flagged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[NdDoc]
    // retention 30 min, watermark 1 min
    val q = StreamNearDup.flag(input.toDF(), "1 minutes", 1800_000L)
      .writeStream.format("memory").queryName("snd3")
      .outputMode("append").start()
    try {
      input.addData(NdDoc(20, t("2024-01-01 10:00:00"), "expiring text payload x"))
      q.processAllAvailable()
      // push the watermark past 10:30 (owner ts + retention)
      input.addData(NdDoc(21, t("2024-01-01 11:00:00"), "watermark advancing filler y"))
      q.processAllAvailable()
      // clone of 20 arrives after the bucket expired: becomes the NEW
      // owner, so it is not flagged
      input.addData(NdDoc(22, t("2024-01-01 11:01:00"), "expiring text payload x"))
      q.processAllAvailable()
      val flagged = spark.table("snd3").select(col("doc_id"))
        .distinct().collect().map(_.getLong(0)).toSet
      assert(flagged.isEmpty, s"expired bucket must not match: $flagged")
    } finally q.stop()
  }

  test("retention horizon is HARD and twin-consistent: clone in the " +
      "watermark-advancing batch, another clone after") {
    // the divergence the advisor flagged: fMGWS used to re-arm its
    // timeout to watermark+1 on every touch, so a bucket touched
    // at/after its horizon stayed alive while the TWS twin's fixed
    // timer cleared it. Both twins must now agree: the clone that rides
    // the watermark past the horizon still matches (rows process before
    // expiry), the NEXT clone finds a fresh bucket.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val timeline = Seq(
      Seq(NdDoc(60, t("2024-01-01 10:00:00"), "hard horizon probe text q")),
      // same microbatch that advances the watermark past 10:30
      Seq(NdDoc(61, t("2024-01-01 10:45:00"), "hard horizon probe text q")),
      Seq(NdDoc(62, t("2024-01-01 10:46:00"), "hard horizon probe text q")))
    def run(name: String,
            mk: (org.apache.spark.sql.DataFrame, String, Long) =>
              org.apache.spark.sql.Dataset[StreamNearDup.Match])
        : Set[(Long, Long)] = {
      val input = MemoryStream[NdDoc]
      val q = mk(input.toDF(), "1 minutes", 1800_000L)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        timeline.foreach { batch =>
          input.addData(batch: _*); q.processAllAvailable()
        }
        spark.table(name).select(col("doc_id"), col("matched_id"))
          .distinct().collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toSet
      } finally q.stop()
    }
    val fmgws = run("sndhz1", StreamNearDup.flag)
    val prev = spark.conf.getOption(
      graft.streaming.TwsStrikeMonitor.rocksdbConf._1)
    spark.conf.set(graft.streaming.TwsStrikeMonitor.rocksdbConf._1,
      graft.streaming.TwsStrikeMonitor.rocksdbConf._2)
    val tws = try run("sndhz2", graft.streaming.TwsStreamNearDup.flag)
      finally prev match {
        case Some(v) => spark.conf.set(
          graft.streaming.TwsStrikeMonitor.rocksdbConf._1, v)
        case None => spark.conf.unset(
          graft.streaming.TwsStrikeMonitor.rocksdbConf._1)
      }
    // 61 rides the advancing batch: still matched (processed before the
    // horizon expiry); 62 arrives after expiry: fresh owner, unflagged
    assert(fmgws == Set(61L -> 60L), s"fMGWS: $fmgws")
    assert(tws == fmgws, s"twins diverged: tws=$tws fmgws=$fmgws")
  }
}
