package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField,
  StructType}

/** Driver-grid prefix aggregation over PLANNER-SCALE histograms — the
  * one-fetch sibling of [[Prefix.runningSum]] for frames whose TOTAL
  * row count is already bounded by construction (a value-grid
  * histogram: sources × distinct token lengths, deviation grids,
  * agreement levels — the frames the plan audit already classifies
  * "planner-scale").
  *
  * [[Prefix.runningSum]] exists for histograms that are NOT bounded
  * (value-grain over near-unique numerics — q220/q229's price cents):
  * it pays one approxQuantile pass + one (key, chunk) partials fetch +
  * a chunk-bounded window join so only nKeys × nChunks rows ever reach
  * the driver. When the WHOLE histogram is planner-scale that machinery
  * is three Spark jobs and an exchange to compute what one bounded
  * fetch can: this operator collects the (key, order, value) rows in a
  * single LIMIT-guarded job, computes the inclusive running sum on the
  * driver (the same place Prefix already computes its chunk offsets —
  * this is the offset table at grid grain), and returns a LOCAL frame
  * for broadcast joins. Per call vs Prefix: 2 planner actions → 1, and
  * the consumer plan loses the window sort + its exchange entirely
  * (guide §2.4 "remove shuffles outright", §1.2 "remove passes").
  *
  * Output is row-identical to
  * `Prefix.runningSum(df.select(key, order, value), key, order, value,
  * out)`: one row per input row, `out` = inclusive per-key running sum
  * of `value` (cast bigint) in `order` ascending, NULL iff no non-NULL
  * value at-or-before the row (the window-sum NULL contract). Requires
  * unique (key, order) pairs — histogram grain — like Prefix.
  *
  * `dense = true` additionally emits a row for every (key ×
  * global-distinct-order) cell absent from the input, with value 0 —
  * the pre-filled CDF grid q258 builds (crossJoin + left join +
  * coalesce(0)), without the crossJoin ever appearing in a Spark plan.
  *
  * The fetch is LIMIT-bounded at `spark.graft.grid.maxRows` (default
  * 1,000,000 — the Prefix/Quantile partial-cap class) and fails LOUDLY
  * past it: an unbounded histogram must use the two-phase operator,
  * never silently flood the driver.
  */
object Grid {

  def cumSum(df: DataFrame, keyCol: String, orderCol: String,
             valueCol: String, outCol: String,
             dense: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val maxRows = spark.conf
      .getOption("spark.graft.grid.maxRows").map(_.toInt)
      .getOrElse(1000000)
    val orderType = df.schema(orderCol).dataType
    require(orderType == LongType || orderType == IntegerType,
      s"Grid.cumSum: order column '$orderCol' must be integral " +
        s"(got $orderType) — driver-side ordering is exact only on " +
        "integer grids; use Prefix.runningSum for fractional orders")
    val fetched = df
      .select(col(keyCol), col(orderCol).cast("bigint").as("__o"),
        col(valueCol).cast("bigint").as("__v"))
      .limit(maxRows + 1)
      .collect()
    require(fetched.length <= maxRows,
      s"Grid.cumSum: > $maxRows histogram rows — '$keyCol' × " +
        s"'$orderCol' is not a planner-scale grid; use the two-phase " +
        "Prefix.runningSum (chunk-bounded driver state) instead, or " +
        "raise spark.graft.grid.maxRows.")
    val rows = fetched.map { r =>
      (r.get(0), r.getLong(1),
        if (r.isNullAt(2)) Option.empty[Long] else Some(r.getLong(2)))
    }
    // dense grid: every key × every global distinct order value; cells
    // absent from the input carry value 0 (exactly coalesce(cnt, 0) on
    // the crossJoin-built grid)
    val all: Seq[(Any, Long, Option[Long])] =
      if (!dense) rows.toSeq
      else {
        val orders = rows.map(_._2).distinct.toSeq
        val have = rows.map(t => (t._1, t._2)).toSet
        rows.toSeq ++ (for {
          k <- rows.map(_._1).distinct.toSeq
          o <- orders if !have((k, o))
        } yield (k, o, Some(0L)))
      }
    val out = all.groupBy(_._1).iterator.flatMap { case (k, grp) =>
      val sorted = grp.sortBy(_._2)
      require(sorted.map(_._2).distinct.size == sorted.size,
        s"Grid.cumSum: duplicate order value within key $k — the " +
          "input must be histogram grain (unique (key, order) pairs)")
      // inclusive running sum, NULL until the first non-NULL value —
      // the sum().over(window) contract Prefix replicates too
      var acc = Option.empty[Long]
      sorted.map { case (key, o, v) =>
        acc = (acc, v) match {
          case (Some(a), Some(x)) => Some(a + x)
          case (a, x)             => a.orElse(x)
        }
        Row(key, o, v.map(Long.box).orNull, acc.map(Long.box).orNull)
      }
    }.toSeq
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      StructType(Seq(
        df.schema(keyCol).copy(name = keyCol),
        StructField(orderCol, LongType, nullable = true),
        StructField(valueCol, LongType, nullable = true),
        StructField(outCol, LongType, nullable = true))))
  }
}
