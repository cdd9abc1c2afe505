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

  /** Deterministic per-row salt: a hash of EVERY column, not
    * spark_partition_id()+monotonically_increasing_id(). The latter is
    * recompute-unstable: if a map stage is retried after a fetch failure
    * with different upstream row order, rows can land in different
    * reduce partitions than the ones already consumed — the classic
    * SPARK-23207 nondeterministic-shuffle-key duplication/loss hazard,
    * and stage retries are routine on a 1000-executor run. A full-row
    * hash re-derives the same salt on recompute. Caveats: byte-identical
    * duplicate rows share a salt (include a unique id column in the
    * frame when the hot key's rows are exact duplicates), and MapType
    * columns are skipped — xxhash64 rejects them (maps have no canonical
    * entry order), and failing the whole operator for a payload column
    * that doesn't influence correctness would be worse.
    */
  private def saltCol(df: DataFrame, saltBuckets: Int): Column = {
    val hashable = df.schema.fields.filterNot(f =>
      graft.operators.Skew.containsMap(f.dataType)).map(f => col(f.name))
    require(hashable.nonEmpty,
      "saltCol needs at least one non-map column to derive a salt")
    pmod(xxhash64(hashable: _*), lit(saltBuckets))
  }

  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case a: org.apache.spark.sql.types.ArrayType => containsMap(a.elementType)
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.exists(f => containsMap(f.dataType))
      case _ => false
    }

  /** Two-phase scaffold shared by the salted aggregates: partial agg on
    * (keys, salt), then recombine on keys. */
  private def salted(df: DataFrame, keys: Seq[String], outCol: String,
                     saltBuckets: Int, partialAgg: Column,
                     combine: Column => Column): DataFrame = {
    val saltedDf = df.withColumn("__salt", saltCol(df, saltBuckets))
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
    val sf = fact.withColumn("__salt", saltCol(fact, saltBuckets))
    val sd = dim.withColumn("__salt",
      explode(array((0 until saltBuckets).map(i => lit(i)): _*)))
    sf.join(sd, sf(factKey) === sd(dimKey)
        && sf("__salt") === sd("__salt"))
      .drop(sf("__salt")).drop(sd("__salt"))
  }

  /** What the skew-join planner measured and decided. `topKeySalts` is
    * populated only on the salted path: the number of DISTINCT salt
    * buckets the hottest key's rows actually landed in. Salting spreads
    * a hot key only as far as its rows hash apart — byte-identical
    * duplicate rows share a full-row hash, so a mega-clone hot key
    * collapses to ONE bucket and the join silently degrades to an
    * unsalted hot partition. `saltEffective` surfaces that at plan time
    * instead of leaving it to a comment: when false, project a unique id
    * column into the fact frame before joining.
    */
  case class SkewDecision(skewFactor: Double, topKeyRows: Long,
                          nKeys: Long, salted: Boolean,
                          topKeySalts: Option[Long] = None) {
    /** false iff salting was chosen but did not spread the hottest key
      * over more than one bucket (ineffective salt). */
    def saltEffective: Boolean = topKeySalts.forall(_ > 1L)
  }

  /** Measure join-key skew on `df(key)`: skew factor = hottest key's
    * share × number of keys (1.0 = perfectly uniform; N = one key owns
    * everything). The q107 diagnostic as a planning primitive: one
    * map-side-combinable count per key (only key bytes shuffle) and a
    * 1-row collect — cheap relative to the join it sizes, even at
    * 100 TB, and a price you pay once per pipeline, not per run, if the
    * caller caches the decision.
    */
  def measureKeySkew(df: DataFrame, key: String): (Double, Long, Long) = {
    val row = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("max_n"), sum(col("n")).as("total"),
        count(lit(1)).as("n_keys"))
      .collect()(0)
    if (row.isNullAt(0) || row.getLong(1) == 0L) (1.0, 0L, 0L)
    else {
      val (maxN, total, nKeys) =
        (row.getLong(0), row.getLong(1), row.getLong(2))
      (maxN.toDouble * nKeys / total, maxN, nKeys)
    }
  }

  /** Measure-then-choose skew-join planner (reference analog: the
    * per-employee hot-key risk in leave data,
    * clean_load_3_ld_staging.py:54-63). Measures the FACT key's skew
    * factor; at or above `skewThreshold` the join runs salted
    * (`saltedJoin`), below it plain — AQE's runtime skew split already
    * covers mild skew, and salting uniform data just replicates the dim
    * for nothing. Output rows are identical either way (the salted
    * join's contract), so callers can treat this as a drop-in join.
    */
  def planJoin(fact: DataFrame, dim: DataFrame, factKey: String,
               dimKey: String, skewThreshold: Double = 4.0,
               saltBuckets: Int = 16): (DataFrame, SkewDecision) = {
    val (factor, topRows, nKeys) = measureKeySkew(fact, factKey)
    val useSalt = factor >= skewThreshold
    val joined =
      if (useSalt) saltedJoin(fact, dim, factKey, dimKey, saltBuckets)
      else fact.join(dim, fact(factKey) === dim(dimKey))
    // salted path only: verify the salt actually spread the hottest key.
    // Two more tiny planner-time jobs (a top-1 key lookup + a
    // count-distinct over that key's salts) — paid once per pipeline,
    // like the skew measurement itself, never per row.
    val topSalts = if (!useSalt) None else scala.util.Try {
      val top = fact.groupBy(col(factKey)).agg(count(lit(1)).as("__n"))
        .orderBy(col("__n").desc, col(factKey).asc_nulls_last)
        .limit(1).collect()
      top.headOption.map { r =>
        fact.filter(col(factKey) <=> lit(r.get(0)))
          .select(saltCol(fact, saltBuckets).as("__s"))
          .agg(countDistinct(col("__s")).as("__d"))
          .collect()(0).getLong(0)
      }
    }.toOption.flatten
    (joined, SkewDecision(factor, topRows, nKeys, useSalt, topSalts))
  }
}
