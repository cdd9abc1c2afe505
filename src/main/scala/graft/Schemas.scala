package graft

import org.apache.spark.sql.types._

/** Explicit schema catalog for the employee data model (SURVEY.md §1.2) —
  * replaces the reference's `inferSchema=True` double scans with fixed
  * DDL-in-code. Raw feed schemas mirror the CSV drops (FIXTURES.md §1);
  * dim schemas are the post-clean shapes.
  */
object Schemas {

  /** employee_data.csv (daily feed, daily_dag.py:127,161-163) */
  val empDataRaw: StructType = StructType(Seq(
    StructField("emp_id", LongType),
    StructField("emp_name", StringType),
    StructField("emp_age", IntegerType)))

  /** employee_timeframe_data.csv (clean_load_2_tf_staging.py:32,73-82):
    * epoch-second validity bounds, null end = open row. */
  val empTimeframeRaw: StructType = StructType(Seq(
    StructField("emp_id", LongType),
    StructField("designation", StringType),
    StructField("start_date", LongType),
    StructField("end_date", LongType),
    StructField("salary", LongType)))

  /** employee_leave_data.csv (clean_load_3_ld_staging.py:42,57-67) */
  val leaveRaw: StructType = StructType(Seq(
    StructField("emp_id", LongType),
    StructField("date", StringType),
    StructField("status", StringType)))

  /** employee_leave_quota_data.csv (yearly_dag.py:86-88) */
  val leaveQuotaRaw: StructType = StructType(Seq(
    StructField("emp_id", LongType),
    StructField("leave_quota", IntegerType),
    StructField("leave_year", IntegerType)))

  /** employee_leave_calendar_data.csv (yearly_dag.py:117-119) */
  val leaveCalendarRaw: StructType = StructType(Seq(
    StructField("reason", StringType),
    StructField("date", StringType)))

  /** emp_timeframe_dim post-clean (clean_load_2_tf_staging.py:73-90,
    * merge2_tf_dim_staging.py:39-45): SCD2 with strike/salary state. */
  val empTimeframeDim: StructType = StructType(Seq(
    StructField("emp_id", LongType),
    StructField("designation", StringType),
    StructField("start_date", TimestampType),
    StructField("end_date", TimestampType),
    StructField("salary", LongType),
    StructField("status", StringType),
    StructField("strike_count", IntegerType),
    StructField("updated_salary", LongType),
    StructField("cooldown_start_date", DateType)))
}
