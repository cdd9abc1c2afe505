package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Calendar / working-day math.
  *
  * The reference computes its working-day calendar driver-side: a
  * `spark.range` of day offsets, `date_add(current_date(), id)`, `count()`
  * actions, and a `collect()`ed holiday list baked into an `isin`
  * (`/root/reference/Task_4_80perc.py:56-84`). That bounces
  * executor→driver→executor four times. Here the whole computation is one
  * lazy plan: `sequence`+`explode` date generation, weekday filtering, and
  * a distributed **left-anti join** against the holiday table (the
  * rewrite of `Task_4_80perc.py:59,65`'s collected `isin` list).
  *
  * Scale notes: a year of dates is ~365 rows — the calendar side is always
  * broadcast; the anti-join against holidays never shuffles the fact side.
  * Weekday math uses `weekday()` (0=Monday … 6=Sunday), which has an exact
  * DuckDB counterpart (isodow-1) for oracle parity.
  */
object Calendar {

  /** One row per day in [start, end] (inclusive), column `d` (date). */
  def dateRange(spark: SparkSession, start: String, end: String): DataFrame =
    spark.range(1)
      .select(explode(sequence(
        to_date(lit(start)), to_date(lit(end)))).as("d"))

  /** Working days: drop Saturday/Sunday, then anti-join out `holidays`
    * (a one-column date frame named `holidayCol`). */
  def workingDays(days: DataFrame, holidays: DataFrame, holidayCol: String)
      : DataFrame = {
    val weekdays = days.filter(weekday(col("d")) <= 4)
    weekdays.join(broadcast(holidays),
      weekdays("d") === holidays(holidayCol), "left_anti")
  }
}
