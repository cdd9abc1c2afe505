package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SamplingQueries
import graft.streaming.StreamDrift

case class DocEvt(doc_id: Long, ts: Timestamp, text: String)

/** StreamDrift: per-window verdicts finalize on watermark, a window
  * mirroring the reference is clean, a skewed window flags both the
  * over-represented bucket AND the vanished ones, and every verdict
  * equals the batch q137 formula recomputed independently (BigInt
  * arithmetic in the test — the integer TV test is engine-free).
  */
class StreamDriftSpec extends AnyFunSuite with SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("uniform window clean, skewed window flags over- and " +
    "under-shares, verdicts == the batch formula") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val toks = ('a' to 'j').map(_.toString)
    // reference: 10 copies of each of 10 tokens — every token bucket
    // holds a 10%-ish share (collisions just merge shares)
    val refDocs = Seq(toks.flatMap(tk => Seq.fill(10)(tk)).mkString(" "))
      .toDF("text")
    val ref = StreamDrift.referenceFrom(refDocs, "text")
    val refMap = ref.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(refMap.size == StreamDrift.NBuckets)
    val rr = refMap.values.head._2
    assert(rr == 100L)

    val input = MemoryStream[DocEvt]
    val out = StreamDrift.drift(input.toDF(), ref, "1 minute", "1 minute")
    val q = out.writeStream.format("memory").queryName("sdrift")
      .outputMode("append").start()
    try {
      // window 10:00 — same token mix as the reference (1 copy each)
      input.addData(DocEvt(1, t("2024-01-01 10:00:10"),
        toks.mkString(" ")))
      // window 10:01 — all mass on 'a'
      input.addData(DocEvt(2, t("2024-01-01 10:01:10"),
        Seq.fill(20)("a").mkString(" ")))
      q.processAllAvailable()
      // straggler far past both windows closes them via the watermark
      input.addData(DocEvt(3, t("2024-01-01 10:10:00"), "zzz"))
      q.processAllAvailable()

      val rows = spark.table("sdrift").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4)))
      val w1 = rows.filter(_._1 == t("2024-01-01 10:00:00"))
      val w2 = rows.filter(_._1 == t("2024-01-01 10:01:00"))
      assert(w1.length == StreamDrift.NBuckets)
      assert(w2.length == StreamDrift.NBuckets)
      // window 3 is still open — nothing emitted for it
      assert(rows.length == 2 * StreamDrift.NBuckets)

      // ref counts carried on every row match the broadcast reference
      (w1 ++ w2).foreach { case (_, b, refB, _, _) =>
        assert(refB == refMap(b)._1)
      }

      // the independent batch recomputation (q137's exact TV test)
      def expectDrift(refB: Long, curB: Long, cc: Long): Boolean =
        (BigInt(100) * curB * rr - BigInt(100) * refB * cc).abs >
          BigInt(rr) * cc
      for ((w, cc) <- Seq((w1, 10L), (w2, 20L)); r <- w)
        assert(r._5 == expectDrift(r._3, r._4, cc),
          s"window ${r._1} bucket ${r._2}")

      // shape of the verdicts: the mirror window is clean; the skewed
      // window flags 'a''s bucket (over) and every token bucket 'a'
      // does not share (vanished)
      assert(w1.count(_._5) == 0)
      val tokBucket = toks.toDF("tok")
        .select(col("tok"),
          SamplingQueries.hashBucket("tok", 1, StreamDrift.NBuckets)
            .as("b"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expected = tokBucket.values.toSet
      assert(w2.filter(_._5).map(_._2).toSet == expected)
    } finally q.stop()
  }
}
