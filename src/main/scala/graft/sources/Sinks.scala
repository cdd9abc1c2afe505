package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sinks (SURVEY.md §2.1 S5-S7, S9).
  *
  * The reference's staging tables are truncate-and-reload JDBC writes
  * (`clean_load_2_tf_staging.py:92-100`); dims are appends. Here the
  * primary store is parquet (columnar, vectorized reads, partition
  * pruning); `SaveMode.Overwrite` subsumes the explicit TRUNCATE step
  * (S9). JDBC keeps the same `df.write.format("jdbc")` call shape as the
  * reference and is integration-tested against embedded Derby (JdbcSpec)
  * — the same code path a Postgres deployment uses, minus the network.
  */
object Sinks {

  /** JDBC truncate-and-reload (the reference's staging-table write,
    * `clean_load_2_tf_staging.py:92-100`): drop/recreate (or truncate,
    * when the dialect supports it) then load. One connection per
    * partition — size `df` partitions to the DB's write concurrency.
    */
  def jdbcOverwrite(df: DataFrame, url: String, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .save()

  /** JDBC append (dim accretion, `merge2_tf_dim_staging.py:58`). */
  def jdbcAppend(df: DataFrame, url: String, table: String): Unit =
    df.write.mode(SaveMode.Append).format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .save()

  /** S5: overwrite (staging truncate-and-reload semantics). */
  def overwriteParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** S6: append (dim accretion semantics). */
  def appendParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** S7: CSV report export (header, overwrite). */
  def overwriteCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Partitioned parquet for scale: co-locates by `cols` so downstream
    * filters prune whole directories (the 100 TB layout default). */
  def overwritePartitioned(df: DataFrame, path: String,
                           cols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Bucketed managed table: rows hash-distributed into `buckets` files
    * by `key` and sorted within. Two tables bucketed the same way join
    * with NO shuffle on either side — the 100 TB answer to repeated
    * big-dim joins (e.g. emp_timeframe_dim ⋈ leave_data_dim on emp_id
    * every daily run). Requires a catalog (saveAsTable), local
    * spark-warehouse in tests.
    */
  def bucketedTable(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** JSON-lines export — the interchange format for downstream tools
    * that don't read parquet (labeling UIs, quick CLI inspection). */
  def overwriteJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC alternative columnar store: same overwrite semantics as
    * parquet; useful when a downstream warehouse is ORC-native. */
  def overwriteOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)
}
