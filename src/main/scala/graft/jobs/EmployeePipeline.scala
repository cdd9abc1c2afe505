package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Calendar, Dedup, Scd2}

/** Reference-parity batch jobs: the employee ETL pipeline re-expressed as
  * pure DataFrame => DataFrame cores (SURVEY.md §7.1). All "now"-dependent
  * logic takes an explicit `runDate` (ISO yyyy-MM-dd) for determinism
  * (SURVEY.md §5). I/O stays at the caller; these cores are the testable
  * units.
  */
object EmployeePipeline {

  /** Clean the employee-timeframe feed (reference
    * clean_load_2_tf_staging.py:73-90): epoch-seconds → timestamp, status
    * from open/closed validity, prepared strike/salary columns, and
    * keep-max-salary dedup of open rows (one open row per employee).
    * Input: emp_id, designation, start_date (epoch s), end_date (epoch s,
    * nullable), salary.
    */
  def cleanTimeframe(raw: DataFrame): DataFrame = {
    val typed = raw
      .withColumn("start_date", timestamp_seconds(col("start_date")))
      .withColumn("end_date", timestamp_seconds(col("end_date")))
      .withColumn("status",
        when(col("end_date").isNull, lit("Active")).otherwise(lit("Inactive")))
      .withColumn("strike_count", lit(0))
      .withColumn("updated_salary", col("salary"))
      .withColumn("cooldown_start_date", lit(null).cast("date"))
    Scd2.dedupOpenRows(typed, "emp_id", "end_date", "salary", "start_date")
  }

  /** Clean the leave feed (reference clean_load_3_ld_staging.py:54-67):
    * file-order serial via monotonically_increasing_id (order-preserving
    * over an ordered single-source read), keep the LAST occurrence per
    * (emp_id, date), parse dates. Input: emp_id, date (yyyy-MM-dd string),
    * status.
    */
  def cleanLeave(raw: DataFrame): DataFrame = {
    val serial = raw.withColumn("serial", monotonically_increasing_id())
    Dedup.keepFirst(serial, Seq("emp_id", "date"), Seq(col("serial").desc))
      .withColumn("leave_date", to_date(col("date"), "yyyy-MM-dd"))
      .select("emp_id", "leave_date", "status")
  }

  /** SCD2 merge of cleaned timeframe staging into the dim (reference
    * merge2_tf_dim_staging.py, with the append-duplication defect fixed —
    * returns the merged image for overwrite).
    */
  def mergeTimeframeDim(dim: DataFrame, staging: DataFrame): DataFrame =
    Scd2.closeOutMerge(dim, staging, "emp_id", "start_date", "end_date",
      "status")

  /** Active headcount by designation (reference
    * Task_4_generate_active_table.py:27-30). */
  def activeByDesignation(timeframeDim: DataFrame): DataFrame =
    timeframeDim
      .filter(col("status") === "Active")
      .groupBy(col("designation"))
      .agg(count(col("designation")).as("count"))

  /** Upcoming-leave >8%-of-remaining-working-days report (reference
    * Task_4_80perc.py) — fully distributed: the reference's four
    * driver round-trips (collect/count/scalar-sql) become one lazy plan
    * with broadcast anti-joins and a 1-row cross join.
    */
  def upcomingLeaveAbuse(spark: SparkSession, leaveDim: DataFrame,
                         calendarDim: DataFrame, runDate: String): DataFrame = {
    val run = to_date(lit(runDate))
    // weekday holidays strictly after runDate, within the run year
    val holidays = calendarDim
      .filter(col("date") > run && year(col("date")) === year(run)
        && weekday(col("date")) <= 4)
      .select(col("date").as("hd"))
    // remaining working days in the year: calendar anti-join, one row.
    // The range INCLUDES runDate — the reference generates
    // date_add(current_date(), 0..days_diff) (Task_4_80perc.py:81), so
    // today counts in the denominator (leaves in the numerator stay
    // strictly after runDate).
    val days = Calendar
      .dateRange(spark, runDate, runDate.take(4) + "-12-31")
    val remaining = Calendar.workingDays(days, holidays, "hd")
      .agg(count(lit(1)).as("remaining_wd"))
    // upcoming weekday, non-holiday, non-cancelled leaves per employee
    val upcoming = leaveDim
      .filter(col("status") === "ACTIVE" && col("leave_date") > run
        && year(col("leave_date")) === year(run)
        && weekday(col("leave_date")) <= 4)
      .join(broadcast(holidays), col("leave_date") === col("hd"), "left_anti")
      .dropDuplicates("emp_id", "leave_date")
      .groupBy(col("emp_id"))
      .agg(count(lit(1)).as("upcoming_leaves"))
    upcoming.crossJoin(broadcast(remaining))
      .filter(col("upcoming_leaves") / col("remaining_wd") * 100 > 8)
      .select("emp_id", "upcoming_leaves")
  }

  /** >80%-of-quota-used monthly report (reference
    * Task_4_monthly_80_percent.py:48-66). */
  def quotaAbuse(quotaDim: DataFrame, leaveDim: DataFrame,
                 runDate: String): DataFrame = {
    val run = to_date(lit(runDate))
    val available = quotaDim
      .filter(col("leave_year") === year(run))
      .groupBy(col("emp_id"))
      .agg(sum(col("leave_quota")).as("leave_available"))
    val availed = leaveDim
      .filter(col("status") === "ACTIVE"
        && year(col("leave_date")) === year(run))
      .groupBy(col("emp_id"))
      .agg(count(col("status")).as("leave_availed"))
    available.join(availed, "emp_id")
      .withColumn("percentage",
        round(col("leave_availed") / col("leave_available") * 100, 2))
      .filter(col("percentage") > 80)
      .select("emp_id", "leave_available", "leave_availed", "percentage")
  }
}
