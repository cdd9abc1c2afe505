package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient aggregation: two-phase salted group-by.
  *
  * At 100 TB a handful of hot keys (one employee generating most events,
  * one template dominating a document corpus) can pin a single reducer.
  * AQE's skew-join splitting covers joins; for aggregations whose partial
  * combine doesn't collapse enough (e.g. count-distinct-ish payloads),
  * pre-splitting each key into `saltBuckets` sub-keys bounds any one
  * task's share at 1/saltBuckets of the hottest key, at the cost of a
  * second (tiny) shuffle over the partial rows.
  *
  * Only algebraic aggregates (sum/count/min/max) can ride this rewrite;
  * they re-combine exactly.
  */
object Skew {

  /** Two-phase scaffold shared by the salted aggregates: partial agg on
    * (keys, salt), then recombine on keys. */
  private def salted(df: DataFrame, keys: Seq[String], outCol: String,
                     saltBuckets: Int, partialAgg: Column,
                     combine: Column => Column): DataFrame = {
    val saltedDf = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
    saltedDf
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAgg.as("__p"))
      .groupBy(keys.map(col): _*)
      .agg(combine(col("__p")).as(outCol))
  }

  /** Salted count: equivalent to
    * df.groupBy(keys).agg(count(*) as outCol) but with the first shuffle
    * spread over keys × saltBuckets.
    */
  def saltedCount(df: DataFrame, keys: Seq[String], outCol: String,
                  saltBuckets: Int = 16): DataFrame =
    salted(df, keys, outCol, saltBuckets, count(lit(1)), sum)

  /** Salted sum over `valueCol`, same contract as saltedCount. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                outCol: String, saltBuckets: Int = 16): DataFrame =
    salted(df, keys, outCol, saltBuckets, sum(col(valueCol)), sum)

  /** Skew-resilient equi-join: the fact side is salted into
    * `saltBuckets` sub-keys, the dim side replicated once per salt, and
    * the join runs on (key, salt) — so a hot key's rows spread over
    * `saltBuckets` reducers instead of pinning one. Row-identical to
    * the plain join (every fact row still meets every same-key dim row,
    * exactly once, at its own salt). Use when AQE's skew split can't
    * see the skew (e.g. the hot key emerges mid-plan); costs a
    * saltBuckets× blow-up of the DIM side, so keep that side small.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, saltBuckets: Int = 16): DataFrame = {
    // withColumn would silently REPLACE a caller's __salt column and
    // corrupt the join — refuse instead of clobbering
    require(!fact.columns.contains("__salt")
        && !dim.columns.contains("__salt"),
      "saltedJoin reserves the __salt column; rename it on the inputs")
    val sf = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
    val sd = dim.withColumn("__salt",
      explode(array((0 until saltBuckets).map(i => lit(i)): _*)))
    sf.join(sd, sf(factKey) === sd(dimKey)
        && sf("__salt") === sd("__salt"))
      .drop(sf("__salt")).drop(sd("__salt"))
  }
}
