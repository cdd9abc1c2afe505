package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Grid, Prefix}

/** Driver-grid prefix sum vs the per-key window AND vs the two-phase
  * Prefix it replaces on planner-scale histograms (round-13 guide §2.4
  * pass-removal: identical rows, one bounded fetch, no window).
  */
class GridSpec extends AnyFunSuite with SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq.sorted

  test("cumSum equals the per-key window and the two-phase Prefix") {
    import spark.implicits._
    val rows = (1L to 500L).map(i => (s"k${i % 7}", i, (i * 31) % 97))
    val df = rows.toDF("k", "id", "v")
    val got = Grid.cumSum(df, "k", "id", "v", "cum")
    val w = Window.partitionBy(col("k")).orderBy(col("id"))
    val want = df.withColumn("cum", sum(col("v").cast("bigint")).over(w))
    assert(canon(got) == canon(want.select("k", "id", "v", "cum")))
    assert(canon(got) ==
      canon(Prefix.runningSum(df, "k", "id", "v", "cum", numChunks = 8)
        .select("k", "id", "v", "cum")))
  }

  test("cumSum NULL contract matches the window sum (null until first value)") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, Option.empty[Long]), ("a", 2L, Some(3L)),
      ("a", 3L, Option.empty[Long]), ("a", 4L, Some(4L)),
      ("b", 1L, Option.empty[Long]), ("b", 2L, Option.empty[Long]))
      .toDF("k", "id", "v")
    val got = Grid.cumSum(df, "k", "id", "v", "cum")
    val w = Window.partitionBy(col("k")).orderBy(col("id"))
    val want = df.withColumn("cum", sum(col("v").cast("bigint")).over(w))
    assert(canon(got) == canon(want.select("k", "id", "v", "cum")))
  }

  test("dense mode equals the crossJoin-built zero-filled CDF grid") {
    import spark.implicits._
    // sparse per-key support: key a sees orders {1,3}, b sees {2,3}
    val h = Seq(("a", 1L, 2L), ("a", 3L, 1L), ("b", 2L, 5L),
      ("b", 3L, 1L)).toDF("k", "id", "v")
    val got = Grid.cumSum(h, "k", "id", "v", "cum", dense = true)
    val grid = h.select(col("id")).distinct()
      .crossJoin(h.select(col("k")).distinct())
    val filled = grid.join(h, Seq("k", "id"), "left_outer")
      .select(col("k"), col("id"), coalesce(col("v"), lit(0L)).as("v"))
    val w = Window.partitionBy(col("k")).orderBy(col("id"))
    val want = filled
      .withColumn("cum", sum(col("v").cast("bigint")).over(w))
    assert(canon(got) == canon(want.select("k", "id", "v", "cum")))
    assert(got.count() == 2 * 3) // keys × global distinct orders
  }

  test("empty input and single row") {
    import spark.implicits._
    val empty = Seq.empty[(String, Long, Long)].toDF("k", "id", "v")
    assert(Grid.cumSum(empty, "k", "id", "v", "cum").count() == 0)
    val one = Seq(("a", 7L, 5L)).toDF("k", "id", "v")
    assert(canon(Grid.cumSum(one, "k", "id", "v", "cum"))
      == Seq("a|7|5|5"))
  }

  test("over-cap grid fails loudly, never floods the driver") {
    import spark.implicits._
    val df = (1L to 50L).map(i => ("k", i, 1L)).toDF("k", "id", "v")
    spark.conf.set("spark.graft.grid.maxRows", "10")
    try {
      val e = intercept[IllegalArgumentException] {
        Grid.cumSum(df, "k", "id", "v", "cum")
      }
      assert(e.getMessage.contains("planner-scale"))
    } finally spark.conf.unset("spark.graft.grid.maxRows")
  }

  test("duplicate (key, order) rejected — histogram grain required") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1L), ("a", 1L, 2L)).toDF("k", "id", "v")
    val e = intercept[IllegalArgumentException] {
      Grid.cumSum(df, "k", "id", "v", "cum")
    }
    assert(e.getMessage.contains("histogram grain"))
  }
}
