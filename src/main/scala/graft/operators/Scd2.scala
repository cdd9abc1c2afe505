package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD Type-2 dimension maintenance.
  *
  * Reference semantics (`/root/reference/merge2_tf_dim_staging.py:32-48`):
  *   1. per key, take min(start_date) of the incoming staging rows;
  *   2. left-join the dim image on (key, end_date IS NULL) — i.e. only the
  *      currently-open row per key can be matched;
  *   3. matched open rows get end_date = incoming min(start_date) and
  *      status = 'Inactive' (coalesce-style update,
  *      `merge2_tf_dim_staging.py:43-44`);
  *   4. union the incoming rows as the new open generation.
  *
  * The reference then appends the whole merged image to the dim table
  * (`merge2_tf_dim_staging.py:50-57`), duplicating history on every run —
  * a recorded defect (SURVEY.md §5 item 3). We return the merged image for
  * an overwrite/upsert write, which is the evident intent.
  *
  * Scale notes: the close-out join shuffles both sides by the key (or
  * broadcasts staging when small — left to Catalyst/AQE); the open-row
  * predicate rides along as a join-side filter, so only one dim row per key
  * participates. Union adds no shuffle.
  */
object Scd2 {

  /** Keep exactly one open (endCol IS NULL) row per key: the one with the
    * max of `pref` (tiebreak by `tiebreak` ascending). Closed rows pass
    * through untouched. Reference: `clean_load_2_tf_staging.py:78-84`
    * (row_number over (partition by emp_id, end_date order by salary desc)
    * + exceptAll removal — same result, one pass).
    */
  def dedupOpenRows(df: DataFrame, key: String, endCol: String, pref: String,
                    tiebreak: String): DataFrame = {
    val open = df.filter(col(endCol).isNull)
    val closed = df.filter(col(endCol).isNotNull)
    val deduped = Dedup.keepFirst(open, Seq(key),
      Seq(col(pref).desc, col(tiebreak).asc))
    closed.unionByName(deduped)
  }

  /** Close-out merge: `dim` rows (with nullable `endCol`, `statusCol`)
    * merged with `staging` rows (open generation: no endCol/statusCol yet).
    * Shared payload columns must exist in both frames.
    */
  def closeOutMerge(dim: DataFrame, staging: DataFrame, key: String,
                    startCol: String, endCol: String, statusCol: String,
                    active: String = "Active", inactive: String = "Inactive")
      : DataFrame = {
    val upd = staging.groupBy(col(key).as("__k"))
      .agg(min(col(startCol)).as("__new_start"))
    val closed = dim
      .join(upd, dim(key) === col("__k") && dim(endCol).isNull, "left_outer")
      .withColumn(endCol, coalesce(col(endCol), col("__new_start")))
      .withColumn(statusCol,
        when(col("__k").isNotNull, lit(inactive)).otherwise(col(statusCol)))
      .drop("__k", "__new_start")
    val incoming = staging
      .withColumn(endCol, lit(null).cast(dim.schema(endCol).dataType))
      .withColumn(statusCol, lit(active))
    closed.unionByName(incoming.select(closed.columns.map(col): _*))
  }
}
