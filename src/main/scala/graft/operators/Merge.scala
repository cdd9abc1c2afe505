package graft.operators

import org.apache.spark.sql.DataFrame
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
}
