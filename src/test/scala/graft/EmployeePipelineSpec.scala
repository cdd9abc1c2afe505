package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.EmployeePipeline

/** Fixture-driven parity tests for the employee ETL cores (FIXTURES.md
  * edge cases: dup open rows, last-occurrence-wins, weekend/holiday
  * overlap, quota thresholds).
  */
class EmployeePipelineSpec extends AnyFunSuite with SparkSpec {

  test("cleanTimeframe: epoch parse, status, one max-salary open row") {
    import spark.implicits._
    val raw = Seq(
      // emp 1: two open rows (keep salary 900), one closed
      (1L, "eng", 1700000000L, Some(1710000000L), 500L),
      (1L, "eng", 1712000000L, None, 700L),
      (1L, "eng", 1712000500L, None, 900L),
      (2L, "sales", 1700000000L, None, 400L)
    ).toDF("emp_id", "designation", "start_date", "end_date", "salary")
    val out = EmployeePipeline.cleanTimeframe(raw)
    assert(out.count() == 3)
    val open1 = out.filter($"emp_id" === 1 && $"end_date".isNull)
    assert(open1.count() == 1)
    val r = open1.select("salary", "status", "strike_count").collect().head
    assert(r.getLong(0) == 900L && r.getString(1) == "Active"
      && r.getInt(2) == 0)
    assert(out.filter($"status" === "Inactive").count() == 1)
  }

  test("cleanLeave: last occurrence per (emp_id, date) wins") {
    import spark.implicits._
    val raw = Seq(
      (1L, "2024-03-04", "ACTIVE"),
      (1L, "2024-03-04", "CANCELLED"), // later row in file order wins
      (2L, "2024-03-05", "ACTIVE")
    ).toDF("emp_id", "date", "status")
    val out = EmployeePipeline.cleanLeave(raw)
    assert(out.count() == 2)
    assert(out.filter($"emp_id" === 1).select("status")
      .collect().head.getString(0) == "CANCELLED")
    assert(out.schema("leave_date").dataType.typeName == "date")
  }

  test("activeByDesignation counts only Active rows") {
    import spark.implicits._
    val dim = Seq(
      (1L, "eng", "Active"), (2L, "eng", "Active"), (3L, "eng", "Inactive"),
      (4L, "sales", "Active")
    ).toDF("emp_id", "designation", "status")
    val out = EmployeePipeline.activeByDesignation(dim)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("eng" -> 2L, "sales" -> 1L))
  }

  test("upcomingLeaveAbuse: >8% of remaining working days, holidays excluded") {
    import spark.implicits._
    // runDate Mon 2024-12-02; remaining working days Dec 2..31 (runDate
    // inclusive, as the reference's date_add(current_date(), 0) range) = 22
    // minus holiday Dec 25 => 21
    val calendar = Seq(("xmas", "2024-12-25"), ("newyear", "2025-01-01"))
      .toDF("reason", "date").withColumn("date", to_date($"date"))
    // emp 1: 2 upcoming weekday leaves (10% > 8%); emp 2: 1 (5%, excluded)
    // emp 3: leave on holiday + weekend only (excluded entirely)
    val leaves = Seq(
      (1L, "2024-12-05", "ACTIVE"), (1L, "2024-12-06", "ACTIVE"),
      (1L, "2024-12-06", "ACTIVE"), // dup same day — dropDuplicates
      (2L, "2024-12-09", "ACTIVE"),
      (3L, "2024-12-25", "ACTIVE"), (3L, "2024-12-07", "ACTIVE"),
      (1L, "2024-11-01", "ACTIVE") // past — excluded
    ).toDF("emp_id", "date", "status")
      .withColumn("leave_date", to_date($"date")).drop("date")
    val out = EmployeePipeline
      .upcomingLeaveAbuse(spark, leaves, calendar, "2024-12-02")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L))
  }

  test("upcomingLeaveAbuse: runDate itself counts in the denominator") {
    import spark.implicits._
    // runDate Mon 2024-12-30: remaining weekdays Dec 30, 31 = 2 (the
    // reference range starts at current_date()+0). One upcoming leave on
    // Dec 31 => 1/2 = 50% > 8%. Excluding runDate would give 1/1 = 100%
    // either way, so also pin the exact denominator via a 2-leaf case:
    // emp 2 has zero upcoming leaves and must not appear.
    val calendar = Seq.empty[(String, String)].toDF("reason", "date")
      .withColumn("date", to_date($"date"))
    val leaves = Seq((1L, "2024-12-31", "ACTIVE"))
      .toDF("emp_id", "date", "status")
      .withColumn("leave_date", to_date($"date")).drop("date")
    val out = EmployeePipeline
      .upcomingLeaveAbuse(spark, leaves, calendar, "2024-12-30")
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 1L)))
    // denominator check through the non-abuse side: with 25 fake weekday
    // leaves impossible in 2 days this can't distinguish, so assert the
    // internal count directly
    val days = graft.operators.Calendar.dateRange(spark, "2024-12-30",
      "2024-12-31")
    val wd = graft.operators.Calendar
      .workingDays(days, calendar.select($"date".as("hd")), "hd").count()
    assert(wd == 2L, "Dec 30 (Mon) and Dec 31 (Tue) both count")
  }

  test("quotaAbuse: >80% of quota flagged with 2dp percentage") {
    import spark.implicits._
    val quota = Seq((1L, 10, 2024), (2L, 10, 2024), (3L, 10, 2023))
      .toDF("emp_id", "leave_quota", "leave_year")
    val leaves = (1 to 9).map(i => (1L, f"2024-02-$i%02d", "ACTIVE")) ++
      Seq((2L, "2024-02-01", "ACTIVE"), (2L, "2024-02-02", "CANCELLED")) ++
      (1 to 9).map(i => (3L, f"2024-03-$i%02d", "ACTIVE"))
    val leavesDf = leaves.toDF("emp_id", "date", "status")
      .withColumn("leave_date", to_date($"date")).drop("date")
    val out = EmployeePipeline.quotaAbuse(quota, leavesDf, "2024-06-01")
    val rows = out.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 10L && r.getLong(2) == 9L
      && r.getDouble(3) == 90.0)
  }

  test("mergeTimeframeDim closes open generation at incoming min start") {
    import spark.implicits._
    val dim = Seq((1L, "2024-01-01 00:00:00", None: Option[String], "Active"))
      .toDF("emp_id", "start_date", "end_date", "status")
      .withColumn("start_date", to_timestamp($"start_date"))
      .withColumn("end_date", to_timestamp($"end_date"))
    val staging = Seq((1L, "2024-07-01 09:00:00"))
      .toDF("emp_id", "start_date")
      .withColumn("start_date", to_timestamp($"start_date"))
    val out = EmployeePipeline.mergeTimeframeDim(dim, staging)
    assert(out.count() == 2)
    assert(out.filter($"status" === "Inactive").select("end_date")
      .collect().head.getTimestamp(0).toString.startsWith("2024-07-01"))
  }
}
