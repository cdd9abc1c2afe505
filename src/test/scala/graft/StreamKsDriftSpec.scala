package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamKsDrift

/** StreamKsDrift: the KS-grain twin of q258. The reference grid is a
  * BigInt-replayable function of the reference corpus, per-window
  * verdicts finalize on watermark, a window mirroring the reference is
  * clean, a mass-shifted window flags, and every emitted (dnum → d_ppm,
  * drifted) pair equals the q258 integer formula recomputed
  * independently in the test (engine-free BigInt arithmetic).
  */
class StreamKsDriftSpec extends AnyFunSuite with SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)
  private def docOfLen(n: Int): String = Seq.fill(n)("w").mkString(" ")

  test("reference grid is the exact quantile grid of the corpus CDF") {
    import spark.implicits._
    // 10 copies of each length 1..10 → total 100, uniform CDF
    val refDocs = (1 to 10).flatMap(n => Seq.fill(10)(docOfLen(n)))
      .toDF("text")
    val g = StreamKsDrift.referenceFrom(refDocs, "text", nGrid = 5)
    assert(g.refTotal == 100L)
    // quantile targets 20/40/60/80/100 land exactly on lengths
    // 2/4/6/8/10 with cumulative counts 20/40/60/80/100
    assert(g.cuts == Seq(2L, 4L, 6L, 8L, 10L))
    assert(g.refCum == Seq(20L, 40L, 60L, 80L, 100L))
    assert(g.cuts == g.cuts.sorted && g.cuts.distinct == g.cuts)
  }

  test("grid restriction is conservative: D_grid <= D_exact on " +
    "random corpora (the documented lower-bound claim)") {
    import spark.implicits._
    // D = max|cdf_w − cdf_ref| over all reals is attained at a step of
    // either CDF, so evaluating over the union support is exact; the
    // grid is a subset of the reference support, so the grid max can
    // only be <= — the property that makes grid restriction safe
    // (conservative, never a false alarm relative to exact KS)
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 15) {
      val refLens = Seq.fill(40 + rng.nextInt(60))(1 + rng.nextInt(30))
      val winLens = Seq.fill(10 + rng.nextInt(40))(1 + rng.nextInt(40))
      val g = StreamKsDrift.referenceFrom(
        refLens.map(docOfLen).toDF("text"), "text",
        nGrid = 2 + rng.nextInt(8))
      val c = BigInt(winLens.size)
      val r = BigInt(g.refTotal)
      def dnumAt(vs: Seq[Long]): BigInt = vs.map { v =>
        (BigInt(winLens.count(_ <= v)) * r
          - BigInt(refLens.count(_ <= v)) * c).abs
      }.max
      val dGrid = dnumAt(g.cuts)
      val dExact = dnumAt(
        (refLens ++ winLens).map(_.toLong).distinct.sorted)
      assert(dGrid <= dExact,
        s"trial $trial: grid D $dGrid exceeds exact D $dExact — the " +
          "lower-bound property is broken")
      // and the grid's refCum really is the reference CDF at the cuts
      g.cuts.zip(g.refCum).foreach { case (cut, cum) =>
        assert(cum == refLens.count(_ <= cut))
      }
    }
  }

  test("the C*R envelope fires loudly, never silently wraps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // a synthetic reference claiming 10^16 docs pushes maxC down to 1,
    // so a 2-doc window must trip the raise_error guard (the q240/q258
    // planted-envelope discipline applied to the streaming twin)
    val huge = StreamKsDrift.RefGrid(Seq(5L, 10L),
      Seq(5000000000000000L, 10000000000000000L), 10000000000000000L)
    val input = MemoryStream[DocEvt]
    val out = StreamKsDrift.drift(input.toDF(), huge, "1 minute",
      "1 minute")
    val q = out.writeStream.format("memory").queryName("ksenv")
      .outputMode("append").start()
    try {
      input.addData(DocEvt(1, t("2024-01-01 10:00:10"), docOfLen(3)))
      input.addData(DocEvt(2, t("2024-01-01 10:00:20"), docOfLen(7)))
      val ex = intercept[Throwable] {
        input.addData(DocEvt(3, t("2024-01-01 10:10:00"), "z"))
        q.processAllAvailable()
      }
      def chain(t: Throwable): String = {
        var c = t; val sb = new StringBuilder
        while (c != null) {
          sb.append(Option(c.getMessage).getOrElse("")); c = c.getCause
        }
        sb.toString
      }
      assert(chain(ex).contains(
        "StreamKsDrift: C*R beyond the exact KS envelope"),
        s"expected the documented envelope message, got: ${chain(ex)}")
    } finally q.stop()
  }

  test("mirror window clean, mass-shifted window drifts, verdicts == " +
    "the q258 integer formula") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val refDocs = (1 to 10).flatMap(n => Seq.fill(10)(docOfLen(n)))
      .toDF("text")
    val ref = StreamKsDrift.referenceFrom(refDocs, "text", nGrid = 10)
    assert(ref.cuts == (1L to 10L))

    val input = MemoryStream[DocEvt]
    val out = StreamKsDrift.drift(input.toDF(), ref, "1 minute", "1 minute")
    val q = out.writeStream.format("memory").queryName("ksdrift")
      .outputMode("append").start()
    try {
      // window 10:00 — one doc of each length 1..10: exact CDF mirror
      (1 to 10).foreach(n => input.addData(
        DocEvt(n.toLong, t("2024-01-01 10:00:10"), docOfLen(n))))
      // window 10:01 — 20 docs, all of length 10 (mass shifted to max)
      (1 to 20).foreach(i => input.addData(
        DocEvt(100L + i, t("2024-01-01 10:01:10"), docOfLen(10))))
      q.processAllAvailable()
      // straggler far past both windows closes them via the watermark
      input.addData(DocEvt(999, t("2024-01-01 10:10:00"), "z"))
      q.processAllAvailable()

      val rows = spark.table("ksdrift").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3)))
      assert(rows.length == 2, s"two closed windows expected: ${rows.toSeq}")
      val w1 = rows.find(_._1 == t("2024-01-01 10:00:00")).get
      val w2 = rows.find(_._1 == t("2024-01-01 10:01:00")).get
      assert(w1._2 == 10L && w2._2 == 20L)

      // independent BigInt replay of the grid-restricted KS statistic
      def replay(lens: Seq[Int]): (BigInt, Boolean, Long) = {
        val c = BigInt(lens.size)
        val r = BigInt(ref.refTotal)
        val dnum = ref.cuts.indices.map { i =>
          val gi = BigInt(lens.count(_ <= ref.cuts(i)))
          (gi * r - BigInt(ref.refCum(i)) * c).abs
        }.max
        val drifted =
          dnum * dnum * 10000 > BigInt(18496) * (c + r) * c * r
        val dppm = (dnum * 1000000 / (c * r)).toLong
        (dnum, drifted, dppm)
      }
      val (_, drift1, ppm1) = replay((1 to 10).toSeq)
      val (_, drift2, ppm2) = replay(Seq.fill(20)(10))
      assert(w1._3 == ppm1 && w1._4 == drift1)
      assert(w2._3 == ppm2 && w2._4 == drift2)
      // shape: the mirror is exactly clean (D = 0), the shift flags
      assert(!w1._4 && w1._3 == 0L)
      assert(w2._4,
        "a window with all mass at the max length must flag: D = 0.9 " +
          "vs the 0.33 critical value at C=20, R=100")
    } finally q.stop()
  }
}
