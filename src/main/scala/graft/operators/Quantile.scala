package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Exact per-group median over LOW-cardinality groups, by bucketed
  * histogram refinement — the scale-shape replacement for the
  * value-grain histogram + two-phase prefix sum when the value column is
  * near-unique (VERDICT r7 #5: q197's o_totalprice histogram was
  * row-cardinality, so each median pass added an approxQuantile scan
  * plus a value-grain exchange; 10.0 s in-suite for 5 strata).
  *
  * Plan per median (the classic distributed exact-quantile refinement):
  *   1. one map-combined aggregate → per-group (n, min, max): the rank
  *      target r = ⌈n/2⌉ (= percentile_disc(0.5)) and the bucket scale;
  *   2. one map-combined (group, bucket) count over B equal-width
  *      buckets — bucket assignment is monotone in the value, so the
  *      bucket holding rank r and the residual rank within it are exact
  *      regardless of float rounding in the width;
  *   3. one filtered (group, value) count restricted to the target
  *      buckets (≈ n/B of the rows) — the value at the residual rank IS
  *      the median, an actual data value, bit-identical to
  *      percentile_disc.
  *
  * Driver state is planner-scale by construction — groups × buckets
  * partials, LIMIT-guarded like Prefix.runningSum — and every pass is a
  * map-combined aggregate (no exchange wider than groups × B rows, no
  * window, no sort). At 100 TB with 5 strata this is three linear scans
  * with tiny combine maps; the refinement step stays bounded because a
  * skewed bucket only ever re-collects DISTINCT values inside one
  * 1/B-width slice (ties collapse in the (group, value) count).
  *
  * Restrictions (asserted): non-null numeric values; group cardinality ×
  * buckets under the partial cap. NaNs are rejected (they have no place
  * in a rank order both engines agree on).
  */
object Quantile {

  /** Exact median of `valCol` (cast to double) per `keyCol`: the value
    * at rank ⌈n/2⌉ in ascending order — DuckDB's
    * `percentile_disc(0.5) WITHIN GROUP (ORDER BY valCol)`. Returns one
    * row per group: (keyCol, asCol). Broadcast-join it back.
    */
  def groupMedian(df: DataFrame, keyCol: String, valCol: String,
                  asCol: String, buckets: Int = 8192): DataFrame = {
    val spark = df.sparkSession
    val maxPartials = spark.conf
      .getOption("spark.graft.quantile.maxPartials").map(_.toInt)
      .getOrElse(1000000)
    val v = col(valCol).cast("double")
    // pass 1: per-group count + range (one combine-friendly aggregate)
    val stats = df.groupBy(col(keyCol))
      .agg(count(v).as("__n"), min(v).as("__lo"), max(v).as("__hi"))
      .limit(maxPartials + 1)
      .collect()
    require(stats.length <= maxPartials,
      s"Quantile.groupMedian: > $maxPartials groups — '$keyCol' is too " +
        "high-cardinality for driver-side bucket selection; use a " +
        "per-key sort instead (it parallelizes at that cardinality).")
    require(stats.length.toLong * buckets <= maxPartials,
      s"Quantile.groupMedian: ${stats.length} groups x $buckets buckets " +
        "exceeds the partial cap; lower `buckets` or raise " +
        "spark.graft.quantile.maxPartials.")
    if (stats.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(Seq(df.schema(keyCol),
          StructField(asCol, DoubleType, nullable = false))))
    val statRows = stats.map { r =>
      require(!r.isNullAt(1) && !r.getDouble(2).isNaN && !r.getDouble(3).isNaN,
        s"Quantile.groupMedian: null/NaN values in group ${r.get(0)}")
      (r.get(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    }
    // monotone bucket id: floor((v - lo) / width), clamped to B-1. A
    // degenerate range (lo == hi) maps everything to bucket 0.
    val keyType = df.schema(keyCol).dataType
    def frame(rows: Seq[Row], fields: Seq[StructField]): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), StructType(fields))
    val scaleDf = frame(
      statRows.toSeq.map { case (k, _, lo, hi) =>
        Row(k, lo, if (hi > lo) (hi - lo) / buckets else 0.0)
      },
      Seq(StructField("__k", keyType),
        StructField("__lo", DoubleType, nullable = false),
        StructField("__w", DoubleType, nullable = false)))
    val bucketCol = when(col("__w") > 0.0,
      least(floor((v - col("__lo")) / col("__w")), lit(buckets - 1)))
      .otherwise(lit(0)).cast("int")
    val bucketed = df
      .join(broadcast(scaleDf), col(keyCol) <=> col("__k"))
      .withColumn("__b", bucketCol)
    // pass 2: (group, bucket) histogram → target bucket + residual rank
    val hist = bucketed.groupBy(col(keyCol), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .limit(maxPartials + 1)
      .collect()
      .map(r => (r.get(0), r.getInt(1), r.getLong(2)))
    val targets: Map[Any, (Int, Long)] = statRows.map {
      case (k, n, _, _) =>
        val r = (n + 1) / 2 // ceil(n/2)
        val bs = hist.filter(_._1 == k).sortBy(_._2)
        var cum = 0L
        val (tb, before) = bs.collectFirst {
          case (_, b, c) if { val hit = cum + c >= r; if (!hit) cum += c; hit } =>
            (b, cum)
        }.getOrElse(throw new IllegalStateException(
          s"Quantile.groupMedian: rank $r unreachable for group $k"))
        k -> (tb, r - before)
    }.toMap
    val targetDf = frame(
      targets.toSeq.map { case (k, (b, resid)) => Row(k, b, resid) },
      Seq(StructField("__tk", keyType),
        StructField("__tb", org.apache.spark.sql.types.IntegerType,
          nullable = false),
        StructField("__resid", org.apache.spark.sql.types.LongType,
          nullable = false)))
    // pass 3: exact (group, value) counts INSIDE the target bucket only
    val inBucket = bucketed
      .join(broadcast(targetDf),
        col(keyCol) <=> col("__tk") && col("__b") === col("__tb"))
      .groupBy(col(keyCol), v.as("__v"))
      .agg(count(lit(1)).as("__c"))
      .limit(maxPartials + 1)
      .collect()
    require(inBucket.length <= maxPartials,
      "Quantile.groupMedian: target-bucket value histogram exceeds the " +
        "partial cap — raise `buckets` (narrower slices collapse more " +
        "ties) or spark.graft.quantile.maxPartials.")
    val medians = targets.map { case (k, (_, resid)) =>
      val vs = inBucket.filter(_.get(0) == k)
        .map(r => (r.getDouble(1), r.getLong(2))).sortBy(_._1)
      var cum = 0L
      val m = vs.collectFirst {
        case (value, c) if { cum += c; cum >= resid } => value
      }.getOrElse(throw new IllegalStateException(
        s"Quantile.groupMedian: residual rank $resid unreachable in " +
          s"target bucket for group $k"))
      Row(k, m)
    }.toSeq
    frame(medians,
      Seq(df.schema(keyCol).copy(name = keyCol),
        StructField(asCol, DoubleType, nullable = false)))
  }
}
