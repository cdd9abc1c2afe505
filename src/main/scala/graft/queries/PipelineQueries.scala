package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
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
        |  CAST(length(text) AS INT) AS n_bytes,
        |  CAST(16 + length(text) % 64 AS INT) AS width,
        |  CAST(16 + length(text) % 48 AS INT) AS height,
        |  CAST(length(text) // 100 + 1 AS INT) AS frames
        |FROM documents""".stripMargin,

    "q32_hourly_events" ->
      """SELECT event_type,
        |  epoch_us(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS hour_us,
        |  count(*) AS n,
        |  round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY event_type, date_trunc('hour', ts)""".stripMargin,

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
