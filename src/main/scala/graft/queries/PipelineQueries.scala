package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.jobs.EmployeePipeline
import graft.multimodal.Multimodal

/** Pipeline-shaped queries: multimodal feature extraction, event-time
  * windowed aggregation (the batch twin of the Structured Streaming path),
  * and batch strike accounting (the seed/compaction side of the streaming
  * strike monitor).
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- multimodal: binary payload -> partition-batched decode ->
    // typed features (decode itself is a documented stub; the plumbing
    // — schema, batching, typed output — is real)
    "q31_multimodal_features" -> ((s, d) => {
      val assets = Multimodal.toAssets(s, Tables.documents(s, d))
      Multimodal.extractFeatures(s, assets).toDF()
    }),

    // ---- event-time tumbling-window aggregation (batch form; the
    // streaming form with watermark is exercised in StreamingSpec)
    "q32_hourly_events" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"),
          unix_micros(date_trunc("hour", col("ts"))).as("hour_us"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("sum_value"))
    }),

    // ---- the reference's hardest report (Task_4_80perc.py) run through
    // the actual EmployeePipeline core against an independent SQL spec:
    // leave feed derived from lineitem ship-dates per supplier, sparse
    // deterministic holiday calendar, fixed runDate
    "q36_upcoming_leave_abuse" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val leaveDim = li.select(
        col("l_suppkey").as("emp_id"),
        to_date(col("l_shipdate")).as("leave_date"),
        when(col("l_returnflag") === "R", lit("CANCELLED"))
          .otherwise(lit("ACTIVE")).as("status"))
      val calendarDim = li.filter(col("l_orderkey") % 53 === 0)
        .select(lit("holiday").as("reason"),
          to_date(col("l_shipdate")).as("date")).distinct()
      EmployeePipeline.upcomingLeaveAbuse(s, leaveDim, calendarDim,
        "2000-06-01")
    }),

    // ---- quota report (Task_4_monthly_80_percent.py) through the
    // EmployeePipeline core: quota from supplier key, usage from
    // ship-date leaves
    "q37_quota_abuse" -> ((s, d) => {
      val quotaDim = Tables.supplier(s, d).select(
        col("s_suppkey").as("emp_id"),
        (lit(50) + col("s_suppkey") % 40).cast("int").as("leave_quota"),
        lit(2000).as("leave_year"))
      val leaveDim = Tables.lineitem(s, d).select(
        col("l_suppkey").as("emp_id"),
        to_date(col("l_shipdate")).as("leave_date"),
        when(col("l_returnflag") === "R", lit("CANCELLED"))
          .otherwise(lit("ACTIVE")).as("status"))
      EmployeePipeline.quotaAbuse(quotaDim, leaveDim, "2000-06-15")
    }),

    // ---- batch strike accounting: flagged events per user + INACTIVE
    // threshold (streaming StrikeMonitor's batch twin)
    "q33_strike_batch" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("event_type") === "error")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("strikes"),
          max(col("ts_us")).as("last_strike_us"))
        .select(col("user_id"), col("strikes"), col("last_strike_us"),
          when(col("strikes") >= 10, lit("INACTIVE")).otherwise(lit("Active"))
            .as("status"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q31_multimodal_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  CAST(16 + octet_length(encode(text)) % 64 AS INT) AS width,
        |  CAST(16 + octet_length(encode(text)) % 48 AS INT) AS height,
        |  CAST(octet_length(encode(text)) // 100 + 1 AS INT) AS frames
        |FROM documents""".stripMargin,

    "q32_hourly_events" ->
      """SELECT event_type,
        |  epoch_us(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS hour_us,
        |  count(*) AS n,
        |  round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY event_type, date_trunc('hour', ts)""".stripMargin,

    "q36_upcoming_leave_abuse" ->
      """WITH leave AS (
        |  SELECT l_suppkey AS emp_id, CAST(l_shipdate AS DATE) AS leave_date,
        |    CASE WHEN l_returnflag = 'R' THEN 'CANCELLED' ELSE 'ACTIVE' END
        |      AS status
        |  FROM lineitem),
        |cal AS (SELECT DISTINCT CAST(l_shipdate AS DATE) AS hd
        |  FROM lineitem WHERE l_orderkey % 53 = 0),
        |hol AS (SELECT hd FROM cal
        |  WHERE hd > DATE '2000-06-01' AND year(hd) = 2000
        |    AND isodow(hd) <= 5),
        |rem AS (SELECT count(*) AS remaining_wd FROM (
        |    SELECT CAST(unnest(generate_series(DATE '2000-06-01',
        |      DATE '2000-12-31', INTERVAL 1 DAY)) AS DATE) AS dd)
        |  WHERE isodow(dd) <= 5
        |    AND dd NOT IN (SELECT hd FROM hol)),
        |up AS (SELECT emp_id, count(*) AS upcoming_leaves FROM (
        |    SELECT DISTINCT emp_id, leave_date FROM leave
        |    WHERE status = 'ACTIVE' AND leave_date > DATE '2000-06-01'
        |      AND year(leave_date) = 2000 AND isodow(leave_date) <= 5
        |      AND leave_date NOT IN (SELECT hd FROM hol))
        |  GROUP BY emp_id)
        |SELECT emp_id, upcoming_leaves FROM up, rem
        |WHERE upcoming_leaves / remaining_wd * 100 > 8""".stripMargin,

    "q37_quota_abuse" ->
      """WITH quota AS (
        |  SELECT s_suppkey AS emp_id,
        |    CAST(50 + s_suppkey % 40 AS INT) AS leave_quota,
        |    2000 AS leave_year
        |  FROM supplier),
        |leave AS (
        |  SELECT l_suppkey AS emp_id, CAST(l_shipdate AS DATE) AS leave_date,
        |    CASE WHEN l_returnflag = 'R' THEN 'CANCELLED' ELSE 'ACTIVE' END
        |      AS status
        |  FROM lineitem),
        |avail AS (SELECT emp_id, CAST(sum(leave_quota) AS BIGINT)
        |    AS leave_available
        |  FROM quota WHERE leave_year = 2000 GROUP BY emp_id),
        |availed AS (SELECT emp_id, count(status) AS leave_availed
        |  FROM leave WHERE status = 'ACTIVE' AND year(leave_date) = 2000
        |  GROUP BY emp_id)
        |SELECT a.emp_id, leave_available, leave_availed,
        |  round(leave_availed / leave_available * 100, 2) AS percentage
        |FROM avail a JOIN availed b ON a.emp_id = b.emp_id
        |WHERE round(leave_availed / leave_available * 100, 2) > 80""".stripMargin,

    "q33_strike_batch" ->
      """SELECT user_id, count(*) AS strikes,
        |  max(epoch_ns(ts) // 1000) AS last_strike_us,
        |  CASE WHEN count(*) >= 10 THEN 'INACTIVE' ELSE 'Active' END
        |    AS status
        |FROM events
        |WHERE event_type = 'error'
        |GROUP BY user_id""".stripMargin
  )
}
