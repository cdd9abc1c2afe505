package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOf, Calendar, Dedup, Merge}

/** Edge-case coverage for the operator library (empty sides, degenerate
  * groups, boundary dates).
  */
class EdgeCasesSpec extends AnyFunSuite with SparkSpec {

  test("asof join with empty right side yields all-null matches") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L)).toDF("user_id", "ts_us", "event_id")
    val right = Seq.empty[(Long, Long, Long)]
      .toDF("user_id", "ts_us", "event_id")
    val out = AsOf.join(left, right, "user_id", "ts_us", "event_id",
      "event_id").collect()
    assert(out.length == 1 && out.head.isNullAt(3))
  }

  test("dateRange spans leap day; workingDays drops weekends") {
    val days = Calendar.dateRange(spark, "2024-02-28", "2024-03-01")
    val ds = days.collect().map(_.getDate(0).toString)
    assert(ds.toSeq == Seq("2024-02-28", "2024-02-29", "2024-03-01"))
    // 2024-03-02/03 are Sat/Sun
    val wk = Calendar.dateRange(spark, "2024-03-01", "2024-03-04")
    import spark.implicits._
    val holidays = Seq.empty[String].toDF("hd")
      .withColumn("hd", to_date(col("hd")))
    val working = Calendar.workingDays(wk, holidays, "hd")
      .collect().map(_.getDate(0).toString)
    assert(working.toSeq.sorted == Seq("2024-03-01", "2024-03-04"))
  }

  test("keepFirst with fully identical rows keeps exactly one") {
    import spark.implicits._
    val df = Seq.fill(5)((1L, "x", 7L)).toDF("k", "v", "ord")
    val out = Dedup.keepFirst(df, Seq("k"), Seq(col("ord").desc))
    assert(out.count() == 1)
  }

  test("upsert with empty staging returns dim unchanged; empty dim returns staging") {
    import spark.implicits._
    val dim = Seq((1L, "a")).toDF("k", "v")
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    assert(Merge.upsert(dim, empty, Seq("k")).collect().map(_.toSeq).toSet
      == dim.collect().map(_.toSeq).toSet)
    assert(Merge.upsert(empty, dim, Seq("k")).collect().map(_.toSeq).toSet
      == dim.collect().map(_.toSeq).toSet)
  }

  test("exactByHash on empty frame is empty, not an error") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.exactByHash(empty, "text", "doc_id").count() == 0)
  }
}
