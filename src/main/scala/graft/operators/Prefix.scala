package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum: the scale-safe replacement for
  * `Window.partitionBy(key).orderBy(order)` running totals when the key's
  * cardinality is below the cluster's parallelism. That window serializes
  * each key through ONE reducer — a handful of mega-sources at 100 TB pin
  * a handful of tasks while the rest of the cluster idles (the classic
  * low-cardinality-window scale-killer; reference analog: the per-source
  * concat-and-cut packing step a daily corpus build runs before
  * training).
  *
  * Two-phase plan (classic parallel scan):
  *   1. chunk every row by BROADCAST quantile boundaries of the order
  *      column — a deterministic, data-derived assignment (no dependence
  *      on physical partition ids, so stage retries and re-evaluation
  *      cannot skew it);
  *   2. one map-side-combinable aggregate of per-(key, chunk) partial
  *      sums, collected to the driver (≤ nKeys × nChunks rows — the
  *      operator targets LOW-cardinality keys, so this is planner-scale,
  *      like Skew.measureKeySkew's 1-row collect);
  *   3. cumulative chunk offsets broadcast back as a tiny join frame;
  *   4. the running sum itself runs per (key, chunk) — bounded-size
  *      window partitions, nKeys × nChunks of them, so parallelism scales
  *      with data instead of capping at nKeys.
  *
  * Output values are IDENTICAL to the single-window form provided
  * (key, order) is a total order (unique order values per key) — ties
  * split across a chunk boundary would otherwise lose the RANGE-frame
  * tie-grouping of the plain window.
  */
object Prefix {

  /** Inclusive running sum of `valueCol` over `orderCol` within each
    * `keyCol` group, as `outCol` (bigint). Equivalent to
    * `sum(valueCol).over(Window.partitionBy(keyCol).orderBy(orderCol))`
    * with unique per-key order values, but never serializes a key
    * through one task. `orderCol` must be numeric (chunk boundaries are
    * quantiles of it).
    */
  def runningSum(df: DataFrame, keyCol: String, orderCol: String,
                 valueCol: String, outCol: String,
                 numChunks: Int = 0): DataFrame =
    runningSums(df, keyCol, orderCol, Seq(valueCol -> outCol), numChunks)

  /** Multi-column form: inclusive running sums of every `(valueCol,
    * outCol)` pair in ONE two-phase pass — one quantile sketch, one
    * partials aggregate, one bounded window — instead of re-scanning
    * the frame per column (q208 needs both the count and the
    * value-mass prefix of the same histogram; two single-column calls
    * would double every phase).
    */
  def runningSums(df: DataFrame, keyCol: String, orderCol: String,
                  cols: Seq[(String, String)],
                  numChunks: Int = 0): DataFrame = {
    require(cols.nonEmpty, "Prefix.runningSums: no value columns")
    val spark = df.sparkSession
    val chunks =
      if (numChunks > 0) numChunks
      else spark.sessionState.conf.numShufflePartitions
    // phase 1: quantile boundaries of the order column. Balance, not
    // correctness, depends on them: any assignment that respects order
    // yields the same sums, so the 1% sketch error is free.
    val bounds = df.stat.approxQuantile(orderCol,
      (1 until chunks).map(_.toDouble / chunks).toArray, 0.01)
      .distinct.sorted
    val chunkCol =
      if (bounds.isEmpty) lit(0)
      else bounds.map(b => when(col(orderCol).cast("double") > lit(b),
        lit(1)).otherwise(lit(0))).reduce(_ + _)
    val chunked = df.withColumn("__chunk", chunkCol)
    // phase 2: per-(key, chunk) partials — map-side combined, only
    // (key, chunk, sum) triples shuffle and land on the driver.
    // Guard (VERDICT r6 #5): the collect is bounded by keyCardinality ×
    // chunks BY DESIGN — this operator targets LOW-cardinality keys
    // (the ones a plain window would serialize through one task). A
    // high-cardinality key would silently turn it into an unbounded
    // driver fetch, so the fetch itself is LIMIT-bounded: collect at
    // most maxPartials + 1 rows (one job, bounded driver memory either
    // way) and fail loudly when the cap is crossed — the caller should
    // use the plain per-key window, which parallelizes fine at high key
    // cardinality.
    val maxPartials = spark.conf
      .getOption("spark.graft.prefix.maxPartials").map(_.toInt)
      .getOrElse(1000000)
    val sumAggs = cols.zipWithIndex.map { case ((v, _), i) =>
      sum(col(v).cast("bigint")).as(s"__t$i")
    }
    val partialRows = chunked
      .groupBy(col(keyCol), col("__chunk"))
      .agg(sumAggs.head, sumAggs.tail: _*)
      .limit(maxPartials + 1)
      .collect()
    require(partialRows.length <= maxPartials,
      s"Prefix.runningSum: > $maxPartials (key, chunk) partials — the " +
        s"'$keyCol' key is too high-cardinality for the two-phase " +
        "prefix sum (its driver-side offset table would be unbounded). " +
        "Use a plain Window.partitionBy per-key running sum instead — " +
        "at this cardinality it parallelizes without serializing any " +
        "key through one task — or raise spark.graft.prefix.maxPartials.")
    // an all-NULL (key, chunk) group sums to NULL — carry it as None
    // (instead of letting getLong throw an opaque NPE) so the offset
    // algebra can distinguish "earlier chunks held no value" (None →
    // the window's NULL) from "earlier values summed to 0" (Some(0))
    val partials = partialRows.map(r =>
      (r.get(0), r.getInt(1), cols.indices.map(i =>
        if (r.isNullAt(2 + i)) Option.empty[Long]
        else Some(r.getLong(2 + i)))))
    // phase 3: offset of (key, chunk) = total of the key's EARLIER chunks
    val offsets = partials.groupBy(_._1).iterator.flatMap {
      case (key, rows) =>
        val sorted = rows.sortBy(_._2)
        val cums = sorted
          .scanLeft(Vector.fill(cols.length)(Option.empty[Long])) {
            (acc, r) => acc.lazyZip(r._3).map {
              case (Some(a), Some(v)) => Some(a + v)
              case (a, v)             => a.orElse(v)
            }.toVector
          }
        sorted.zip(cums).map { case ((_, chunk, _), offs) =>
          (key, chunk, offs)
        }
    }.toSeq
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.map {
        case (k, c, os) =>
          org.apache.spark.sql.Row(
            k +: c +: os.map(_.map(Long.box).orNull): _*)
      }, 1),
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("__k",
          df.schema(keyCol).dataType) +:
        org.apache.spark.sql.types.StructField("__chunk2",
          org.apache.spark.sql.types.IntegerType, nullable = false) +:
        cols.indices.map(i =>
          org.apache.spark.sql.types.StructField(s"__off$i",
            org.apache.spark.sql.types.LongType, nullable = true))))
    // phase 4: bounded within-chunk window + broadcast offset lookup
    val w = Window.partitionBy(col(keyCol), col("__chunk"))
      .orderBy(col(orderCol))
    val withLocals = cols.zipWithIndex.foldLeft(chunked) {
      case (acc, ((v, _), i)) =>
        acc.withColumn(s"__local$i", sum(col(v).cast("bigint")).over(w))
    }
    val joined = withLocals
      .join(broadcast(offDf), col(keyCol) <=> col("__k")
        && col("__chunk") === col("__chunk2"), "left")
    // window-sum parity on NULLs: NULL only when NEITHER the in-chunk
    // prefix (__local) NOR any earlier chunk (__off) held a value —
    // otherwise NULLs are ignored, exactly like sum().over(window)
    val withOuts = cols.zipWithIndex.foldLeft(joined) {
      case (acc, ((_, out), i)) =>
        acc.withColumn(out,
          when(col(s"__local$i").isNull && col(s"__off$i").isNull,
            lit(null).cast("bigint"))
            .otherwise(coalesce(col(s"__local$i"), lit(0L)) +
              coalesce(col(s"__off$i"), lit(0L))))
    }
    withOuts.drop("__chunk" +: "__k" +: "__chunk2" +:
      cols.indices.flatMap(i => Seq(s"__local$i", s"__off$i")): _*)
  }

  /** Running MAX of `valueCol` over `orderCol` within each `keyCol`
    * group, as `outCol` (bigint) — the same two-phase plan as
    * `runningSums` (max is associative and commutative, so the chunk
    * algebra carries over verbatim: local within-chunk window maxima
    * combine with a broadcast per-(key, chunk) offset holding the max
    * of all EARLIER chunks).
    *
    * `inclusive = false` yields the STRICT prefix — the max over rows
    * strictly before the current one in the order, NULL when none
    * exist — which is exactly the dominance sweep a 2-D skyline needs
    * ("best competitor ranked strictly above me"). Requires unique
    * `orderCol` values per key, like `runningSums`.
    */
  def runningMax(df: DataFrame, keyCol: String, orderCol: String,
                 valueCol: String, outCol: String,
                 inclusive: Boolean = true,
                 numChunks: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val chunks =
      if (numChunks > 0) numChunks
      else spark.sessionState.conf.numShufflePartitions
    val bounds = df.stat.approxQuantile(orderCol,
      (1 until chunks).map(_.toDouble / chunks).toArray, 0.01)
      .distinct.sorted
    val chunkCol =
      if (bounds.isEmpty) lit(0)
      else bounds.map(b => when(col(orderCol).cast("double") > lit(b),
        lit(1)).otherwise(lit(0))).reduce(_ + _)
    val chunked = df.withColumn("__chunk", chunkCol)
    // per-(key, chunk) partial maxima — same bounded-collect guard as
    // runningSums: the operator targets low-cardinality keys, and the
    // fetch is LIMIT-bounded so a misuse fails loudly, never OOMs
    val maxPartials = spark.conf
      .getOption("spark.graft.prefix.maxPartials").map(_.toInt)
      .getOrElse(1000000)
    val partialRows = chunked
      .groupBy(col(keyCol), col("__chunk"))
      .agg(max(col(valueCol).cast("bigint")).as("__m"))
      .limit(maxPartials + 1)
      .collect()
    require(partialRows.length <= maxPartials,
      s"Prefix.runningMax: > $maxPartials (key, chunk) partials — the " +
        s"'$keyCol' key is too high-cardinality for the two-phase " +
        "prefix max. Use a plain per-key window instead, or raise " +
        "spark.graft.prefix.maxPartials.")
    // an all-NULL (key, chunk) group's max is NULL — carry it as None
    // (contributes nothing to the fold, but its chunk still inherits
    // EARLIER chunks' offsets) instead of letting getLong NPE
    val partials = partialRows.map(r =>
      (r.get(0), r.getInt(1),
        if (r.isNullAt(2)) Option.empty[Long] else Some(r.getLong(2))))
    // offset of (key, chunk) = max over the key's EARLIER chunks
    // (None when there is no earlier non-NULL value — strict-prefix NULL)
    val offsets = partials.groupBy(_._1).iterator.flatMap {
      case (key, rows) =>
        val sorted = rows.sortBy(_._2)
        val cums = sorted.scanLeft(Option.empty[Long]) { (acc, r) =>
          (acc, r._3) match {
            case (Some(a), Some(v)) => Some(math.max(a, v))
            case (a, v)             => a.orElse(v)
          }
        }
        sorted.zip(cums).map { case ((_, chunk, _), off) =>
          (key, chunk, off)
        }
    }.toSeq
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.map {
        case (k, c, o) =>
          org.apache.spark.sql.Row(k, c, o.map(Long.box).orNull)
      }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__k",
          df.schema(keyCol).dataType),
        org.apache.spark.sql.types.StructField("__chunk2",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("__off",
          org.apache.spark.sql.types.LongType, nullable = true))))
    val frame = Window.partitionBy(col(keyCol), col("__chunk"))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding,
        if (inclusive) Window.currentRow else -1)
    // greatest() skips NULLs: a NULL local (strict prefix, first row of
    // its chunk) with a non-NULL offset yields the offset, and vice
    // versa; both NULL (first row of the key's first chunk, strict
    // mode) yields NULL — the "no predecessor" marker
    chunked
      .withColumn("__local", max(col(valueCol).cast("bigint")).over(frame))
      .join(broadcast(offDf), col(keyCol) <=> col("__k")
        && col("__chunk") === col("__chunk2"), "left")
      .withColumn(outCol, greatest(col("__local"), col("__off")))
      .drop("__chunk", "__k", "__chunk2", "__local", "__off")
  }
}
