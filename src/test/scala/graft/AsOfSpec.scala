package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite with SparkSpec {

  test("as-of join picks most recent right row at-or-before, ties by id") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L), // matches right at 90
      (1L, 50L, 11L),  // matches right at 50 (equal time counts)
      (1L, 10L, 12L),  // no prior right -> null
      (2L, 100L, 13L)  // other key: right at 100 (tie on id -> larger id)
    ).toDF("user_id", "ts_us", "event_id")
    val right = Seq(
      (1L, 90L, 20L), (1L, 50L, 21L), (1L, 95L, 22L),
      (2L, 100L, 23L), (2L, 100L, 24L)
    ).toDF("user_id", "ts_us", "event_id")
    val out = AsOf.join(left, right, "user_id", "ts_us", "event_id",
        "event_id")
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out(10L) == 22L) // 95 is latest <= 100
    assert(out(11L) == 21L) // equal-time right row visible
    assert(out(12L) == -1L) // nothing before
    assert(out(13L) == 24L) // tie at 100 -> larger id wins
  }

  test("approx_count_distinct within 5% of exact (HLL companion to q42)") {
    val ev = Tables.events(spark, sf)
    val both = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id")).as("approx"))
      .collect()
    both.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }
}
