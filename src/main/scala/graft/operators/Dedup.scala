package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * Reference semantics: "keep the latest occurrence per key" window dedup
  * (`/root/reference/clean_load_3_ld_staging.py:54-63` — row_number over
  * (partition by emp_id, date order by SerialNum desc), keep rn == 1) and
  * keyed `dropDuplicates` (`/root/reference/Task_4_80perc.py:69`).
  *
  * Scale notes: both are a single hash-shuffle on the key columns; the
  * window variant sorts only within key-partitions (no global sort). At
  * 100 TB the shuffle is the cost — key selection must be high-cardinality
  * (emp_id/date-style composites are), and AQE handles skewed hot keys.
  */
object Dedup {

  /** Keep exactly one row per `keys`, the first under `order` (use
    * descending columns for "latest wins"). Always give a total order
    * (include a unique tiebreak column) for deterministic output.
    */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact-duplicate grouping by a hash of `textCol`: one canonical row per
    * distinct value (min of `idCol`), plus the duplicate count.
    * This is the 100 TB-friendly exact-dedup: a single hash aggregation on
    * a 128-bit digest instead of shuffling full document bodies.
    */
  def exactByHash(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("text_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("dup_count"))

  /** Incremental batch-vs-corpus EXACT dedup (the q96 pattern with row
    * digests; the daily-ingest dedup step in IncrementalE2ESpec):
    * `index` holds the digests of everything already ingested — probe
    * today's `batch` against it and return
    * (fresh rows, their digests to append to the index). Per-day cost
    * scales with the batch (the index side of the anti-join is
    * digest-only and broadcast-able when the batch is small), never the
    * corpus.
    *
    * The digest is md5 over `to_json(struct(*))` — null-safe and
    * delimiter-safe, where concat_ws would skip NULLs and collide on
    * in-value separators. Within-batch duplicates also collapse (later
    * copies of a row already seen this batch are dropped by the same
    * digest, via keepFirst on the digest).
    */
  def incrementalByRowDigest(batch: DataFrame, index: Option[DataFrame])
      : (DataFrame, DataFrame) = {
    require(!batch.columns.contains("__digest"),
      "incrementalByRowDigest reserves the __digest column")
    val digested = batch.withColumn("__digest",
      md5(to_json(struct(batch.columns.map(col): _*)).cast("binary")))
    val withinBatch = keepFirst(digested, Seq("__digest"),
      batch.columns.map(c => col(c).asc))
    val fresh = index match {
      case Some(ix) =>
        withinBatch.join(ix.select(col(ix.columns.head).as("__digest")),
          Seq("__digest"), "left_anti")
      case None => withinBatch
    }
    (fresh.drop("__digest"), fresh.select(col("__digest")))
  }
}
