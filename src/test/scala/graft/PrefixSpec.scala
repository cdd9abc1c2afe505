package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Prefix

/** Two-phase distributed prefix sum vs the single-window reference. */
class PrefixSpec extends AnyFunSuite with SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq.sorted

  test("runningSum equals the per-key window on multi-key data") {
    import spark.implicits._
    // deterministic pseudo-random values; unique order (id) per key
    val rows = (1L to 500L).map(i => (s"k${i % 7}", i, (i * 31) % 97))
    val df = rows.toDF("k", "id", "v")
    val got = Prefix.runningSum(df, "k", "id", "v", "cum", numChunks = 8)
    val w = Window.partitionBy(col("k")).orderBy(col("id"))
    val want = df.withColumn("cum", sum(col("v").cast("bigint")).over(w))
    assert(canon(got.select("k", "id", "v", "cum"))
      == canon(want.select("k", "id", "v", "cum")))
  }

  test("runningSum on ONE mega-key still matches (the scale case)") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => ("only", i, i % 13)).toDF("k", "id", "v")
    val got = Prefix.runningSum(df, "k", "id", "v", "cum", numChunks = 16)
    val w = Window.partitionBy(col("k")).orderBy(col("id"))
    val want = df.withColumn("cum", sum(col("v").cast("bigint")).over(w))
    assert(canon(got.select("k", "id", "v", "cum"))
      == canon(want.select("k", "id", "v", "cum")))
    // and the plan must window on (k, __chunk), not k alone
    val plan = got.queryExecution.optimizedPlan.toString
    assert(plan.contains("__chunk"), plan)
  }

  test("runningSums: two columns in one pass equal two per-key windows") {
    import spark.implicits._
    val rows = (1L to 400L).map(i =>
      (s"k${i % 5}", i, (i * 31) % 97, (i * 17) % 53))
    val df = rows.toDF("k", "id", "v1", "v2")
    val got = Prefix.runningSums(df, "k", "id",
      Seq("v1" -> "c1", "v2" -> "c2"), numChunks = 8)
    val w = Window.partitionBy(col("k")).orderBy(col("id"))
    val want = df
      .withColumn("c1", sum(col("v1").cast("bigint")).over(w))
      .withColumn("c2", sum(col("v2").cast("bigint")).over(w))
    assert(canon(got.select("k", "id", "v1", "v2", "c1", "c2"))
      == canon(want.select("k", "id", "v1", "v2", "c1", "c2")))
  }

  test("runningSum handles empty input, single row, and null keys") {
    import spark.implicits._
    val empty = Seq.empty[(String, Long, Long)].toDF("k", "id", "v")
    assert(Prefix.runningSum(empty, "k", "id", "v", "cum").count() == 0)
    val one = Seq(("a", 1L, 5L)).toDF("k", "id", "v")
    assert(Prefix.runningSum(one, "k", "id", "v", "cum")
      .select("cum").as[Long].collect().toSeq == Seq(5L))
    // null keys form their own group (null-safe offset join)
    val withNull = Seq((Option.empty[String], 1L, 2L),
      (Option.empty[String], 2L, 3L), (Some("a"), 1L, 7L))
      .toDF("k", "id", "v")
    val got = Prefix.runningSum(withNull, "k", "id", "v", "cum",
        numChunks = 2)
      .select("k", "cum").collect()
      .map(r => (if (r.isNullAt(0)) "null" else r.getString(0))
        -> r.getLong(1)).toSet
    assert(got == Set("null" -> 2L, "null" -> 5L, "a" -> 7L))
  }

  test("runningSum refuses a high-cardinality key past the partials cap") {
    import spark.implicits._
    // every row its own key: partials = |rows| — exactly the unbounded
    // driver fetch the guard exists to catch
    val df = (1L to 200L).map(i => (s"k$i", i, i)).toDF("k", "id", "v")
    spark.conf.set("spark.graft.prefix.maxPartials", "100")
    try {
      val e = intercept[IllegalArgumentException] {
        Prefix.runningSum(df, "k", "id", "v", "cum", numChunks = 2)
      }
      assert(e.getMessage.contains("high-cardinality"))
      // the same frame passes once the cap accommodates it, and the
      // values still match the window reference
      spark.conf.set("spark.graft.prefix.maxPartials", "1000")
      val got = Prefix.runningSum(df, "k", "id", "v", "cum", numChunks = 2)
      val w = Window.partitionBy(col("k")).orderBy(col("id"))
      val want = df.withColumn("cum", sum(col("v").cast("bigint")).over(w))
      assert(canon(got.select("k", "id", "v", "cum"))
        == canon(want.select("k", "id", "v", "cum")))
    } finally spark.conf.unset("spark.graft.prefix.maxPartials")
  }

  test("runningMax inclusive equals the per-key window cummax on " +
    "multi-key data with sign-mixed values") {
    import spark.implicits._
    // values swing negative so the offset/local NULL algebra is
    // exercised on both signs; unique order (id) per key
    val rows = (1L to 500L).map(i => (s"k${i % 7}", i, ((i * 31) % 97) - 48))
    val df = rows.toDF("k", "id", "v")
    val got = Prefix.runningMax(df, "k", "id", "v", "cm", numChunks = 8)
    val w = Window.partitionBy(col("k")).orderBy(col("id"))
    val want = df.withColumn("cm", max(col("v").cast("bigint")).over(w))
    assert(canon(got.select("k", "id", "v", "cm"))
      == canon(want.select("k", "id", "v", "cm")))
  }

  test("runningMax exclusive equals the strict-prefix window (NULL on " +
    "each key's first row), including across chunk boundaries") {
    import spark.implicits._
    val rows = (1L to 600L).map(i => (s"k${i % 3}", i, ((i * 53) % 89) - 40))
    val df = rows.toDF("k", "id", "v")
    val got = Prefix.runningMax(df, "k", "id", "v", "pm",
      inclusive = false, numChunks = 16)
    val w = Window.partitionBy(col("k")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = df.withColumn("pm", max(col("v").cast("bigint")).over(w))
    assert(canon(got.select("k", "id", "v", "pm"))
      == canon(want.select("k", "id", "v", "pm")))
    // each key's order-minimum row has no strict predecessor
    assert(got.filter(col("pm").isNull).count() == 3)
    // and the plan windows on (k, __chunk), never k alone
    val plan = got.queryExecution.optimizedPlan.toString
    assert(plan.contains("__chunk"), plan)
  }

  test("runningMax and runningSum survive an all-NULL (key, chunk) " +
    "group and still match the per-key window") {
    import spark.implicits._
    // key "kn" is entirely NULL-valued (its chunk partials aggregate to
    // NULL — used to NPE in the partials fetch); "km" leads with a long
    // NULL stretch; "ko" sandwiches a NULL-only stretch BETWEEN valued
    // regions, so offsets must carry prior sums/maxima ACROSS a chunk
    // whose own partial is NULL (numChunks = 8 over ids 1..600 makes
    // each stretch own whole chunks)
    val rows = (1L to 600L).map { i =>
      val k = if (i <= 120) "kn" else if (i <= 360) "km" else "ko"
      val valued = (k == "km" && i > 280) ||
        (k == "ko" && (i <= 440 || i > 520))
      val v: java.lang.Long =
        if (valued) Long.box(((i * 31) % 97) - 48) else null
      (k, Long.box(i), v)
    }
    val df = rows.toDF("k", "id", "v")
    val gotM = Prefix.runningMax(df, "k", "id", "v", "cm", numChunks = 8)
    val wM = Window.partitionBy(col("k")).orderBy(col("id"))
    val wantM = df.withColumn("cm", max(col("v").cast("bigint")).over(wM))
    assert(canon(gotM.select("k", "id", "cm"))
      == canon(wantM.select("k", "id", "cm")))
    val gotS = Prefix.runningSum(df, "k", "id", "v", "cs", numChunks = 8)
    val wantS = df.withColumn("cs", sum(col("v").cast("bigint")).over(wM))
    assert(canon(gotS.select("k", "id", "cs"))
      == canon(wantS.select("k", "id", "cs")))
  }

  test("runningMax refuses a high-cardinality key past the partials cap") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (s"k$i", i, i)).toDF("k", "id", "v")
    spark.conf.set("spark.graft.prefix.maxPartials", "100")
    try {
      val e = intercept[IllegalArgumentException] {
        Prefix.runningMax(df, "k", "id", "v", "cm", numChunks = 2)
      }
      assert(e.getMessage.contains("high-cardinality"))
    } finally spark.conf.unset("spark.graft.prefix.maxPartials")
  }

  test("q128 curriculum order: global_pos is a 1..n permutation, " +
    "deterministic, and weighted-fair in every prefix") {
    val out = SparkEntry.queries("q128_curriculum_order")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val n = out.length
    assert(out.map(_._3).sorted.toSeq == (1L to n).toSeq,
      "global_pos must be an exact permutation of 1..n")
    val again = SparkEntry.queries("q128_curriculum_order")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // weighted round-robin fairness: in any prefix, a source's share
    // tracks its weight — each source's k-th doc sits near position
    // k * (total_weight / w_s), so no source starves or floods
    val bySrc = out.groupBy(_._2)
    bySrc.foreach { case (_, docs) =>
      val ps = docs.map(_._3).sorted
      // successive picks from one source must be spread out, not
      // contiguous: gaps of 1 for the whole source would mean blocks
      if (ps.length > 2) {
        val gaps = ps.sliding(2).map(a => a(1) - a(0)).toSeq
        assert(gaps.max > 1L,
          "a source emitted as one contiguous block — not interleaved")
      }
    }
  }
}
