package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator (SURVEY.md §2 +
  * LLM-pipeline extensions) to a `(SparkSession, sfDir) => DataFrame`;
  * `oracleSql` carries the equivalent DuckDB SQL over the same parquet
  * tables. Column names/types are aligned pairwise (the driver's compare
  * sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.TextQueries.queries ++
      graft.queries.VectorQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.AnalyticsQueries.queries ++
      graft.queries.CorpusQueries.queries ++
      graft.queries.SamplingQueries.queries ++
      graft.queries.WarehouseQueries.queries ++
      graft.queries.IncrementalQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++ graft.queries.TextQueries.oracle ++
      graft.queries.VectorQueries.oracle ++
      graft.queries.PipelineQueries.oracle ++
      graft.queries.AnalyticsQueries.oracle ++
      graft.queries.CorpusQueries.oracle ++
      graft.queries.SamplingQueries.oracle ++
      graft.queries.WarehouseQueries.oracle ++
      graft.queries.IncrementalQueries.oracle
}
