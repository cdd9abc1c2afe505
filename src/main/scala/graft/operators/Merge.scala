package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed merge/upsert building blocks.
  *
  * Spark has no `MERGE INTO` over plain parquet, so upsert is expressed as
  * join + union — the pattern the reference runs as Postgres-side SQL MERGE
  * (`/root/reference/daily_dag.py:200-209`) and as a join+coalesce+union
  * Spark job (`/root/reference/merge2_tf_dim_staging.py:39-48`).
  *
  * Scale notes: `upsert` is one anti-join (shuffle on keys; broadcast-able
  * when the staging side is small — Catalyst/AQE decide) plus a zero-shuffle
  * union. No driver round-trips; the whole image stays distributed.
  */
object Merge {

  /** Keyed upsert: rows from `staging` replace same-key rows in `dim`;
    * unmatched dim rows survive; staging-only keys are inserts.
    * Column sets must match (positionally independent — unionByName).
    */
  def upsert(dim: DataFrame, staging: DataFrame, keys: Seq[String]): DataFrame =
    staging.unionByName(dim.join(staging, keys, "left_anti"))

  /** Append-merge (INSERT INTO ... SELECT semantics,
    * `/root/reference/daily_dag.py:160-165`). */
  def appendMerge(dim: DataFrame, staging: DataFrame): DataFrame =
    dim.unionByName(staging)

  /** Alternate J4 backend: the same keyed upsert issued as an
    * engine-native `Dataset.mergeInto` (Spark 4 row-level MERGE) against
    * a catalog TABLE instead of the join+union image over frames.
    *
    * Use this form when the target lives in a catalog whose connector
    * supports row-level operations (Delta/Iceberg-class; the test
    * harness ships a minimal in-memory one) — the connector can then
    * apply the MERGE as deltas or group rewrites instead of rewriting
    * the full image, and Spark plans the target-side join scan itself.
    * The built-in parquet file source can't execute MERGE, so `upsert`
    * remains the default backend for file-based dims. Semantics parity
    * (same keys ⇒ same final image as `upsert`) is pinned by
    * MergeIntoSpec.
    *
    * `target` is a catalog-qualified table name; its LAST name part is
    * the qualifier for target columns in the generated condition, and
    * the staging frame is aliased `__stg` — both sides keep their
    * original column names, as `updateAll`/`insertAll` align by name.
    */
  def upsertMergeInto(staging: DataFrame, target: String,
                      keys: Seq[String]): Unit = {
    val tblQual = target.split("\\.").last
    val cond: Column = keys
      .map(k => col(s"$tblQual.$k") === col(s"__stg.$k"))
      .reduce(_ && _)
    staging.alias("__stg")
      .mergeInto(target, cond)
      .whenMatched().updateAll()
      .whenNotMatched().insertAll()
      .merge()
  }
}
