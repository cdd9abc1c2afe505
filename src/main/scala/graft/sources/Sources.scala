package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Ingest sources (SURVEY.md §2.1).
  *
  * The reference reads CSV feeds with `inferSchema=True` (double scan,
  * `clean_load_2_tf_staging.py:57`) and picks the newest S3 object by
  * LastModified via boto3 (`clean_load_2_tf_staging.py:35-44`). Here:
  * explicit schemas (single scan, stable types) and newest-file selection
  * through the Hadoop FileSystem API — the same call works against
  * s3a:// at scale; no driver-side SDK detours.
  */
object Sources {

  /** S1: CSV scan with explicit schema (header row, no inference). */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** CSV scan with malformed-row quarantine: rows that fail the schema
    * land in a `_corrupt` column (raw line preserved) instead of
    * silently becoming all-NULL rows or failing the job. Returns
    * (good rows in the declared schema, quarantined raw lines). The
    * production ingest posture at scale: one bad upstream export must
    * neither kill a 100 TB load (FAILFAST) nor silently poison a dim
    * (plain PERMISSIVE) — quarantine, count, alert, continue.
    *
    * Both frames derive from ONE materialized scan (PERMISSIVE +
    * corrupt-column capture): Spark disallows referencing only the
    * corrupt column on a lazy file scan, and `localCheckpoint` both
    * satisfies that and lets the ContextCleaner release the blocks
    * automatically once the returned frames are unreferenced (a cache()
    * here would leak storage memory across repeated feed loads).
    */
  def csvQuarantine(spark: SparkSession, path: String,
                    schema: StructType): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    val withCorrupt = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("_corrupt",
        org.apache.spark.sql.types.StringType, nullable = true))
    val raw = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(withCorrupt)
      .csv(path)
      .localCheckpoint()
    val good = raw.filter(col("_corrupt").isNull)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val bad = raw.filter(col("_corrupt").isNotNull)
      .select(col("_corrupt").as("raw_line"))
    (good, bad)
  }

  /** JSON-lines scan with explicit schema (no inference scan) — the
    * ingest twin of `Sinks.overwriteJson`. */
  def jsonLines(spark: SparkSession, path: String,
                schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC scan — columnar alternative, same vectorized-read posture as
    * parquet. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** S2: newest-file-wins — the path under `dir` with the max modification
    * time (the reference's LastModified sort, distributed-FS-agnostic).
    */
  def newestFile(spark: SparkSession, dir: String): Option[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).filter(_.isFile)
      // filename tiebreak (descending — dated names sort newest-last):
      // mtime granularity can be 1s on some filesystems, and
      // newest-file-wins must stay deterministic
      .sortBy(f => (f.getModificationTime, f.getPath.getName))(
        Ordering.Tuple2(Ordering.Long.reverse, Ordering.String.reverse))
      .headOption.map(_.getPath.toString)
  }

  /** S1+S2 composed: read only the newest CSV drop in a feed folder. */
  def newestCsv(spark: SparkSession, dir: String,
                schema: StructType): Option[DataFrame] =
    newestFile(spark, dir).map(f => csv(spark, f, schema))

  /** C1: file-arrival gate — did the NEWEST file land within
    * [windowStartMs, windowEndMs)? (reference daily_dag.py:26-62's
    * ShortCircuit check, minus the Airflow.) Only the max mtime is
    * tested: an older file inside the window with a newer drop outside
    * it means the feed has already moved past the window, and the
    * reference gate short-circuits in that case.
    */
  def newDataAvailable(spark: SparkSession, dir: String,
                       windowStartMs: Long, windowEndMs: Long): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && {
      val mtimes = fs.listStatus(p).filter(_.isFile).map(_.getModificationTime)
      mtimes.nonEmpty && {
        val newest = mtimes.max
        newest >= windowStartMs && newest < windowEndMs
      }
    }
  }

  /** S3: JDBC scan. Same call shape as the reference's `read.jdbc`
    * (`merge2_tf_dim_staging.py:27,30`) but with partitioned reads — the
    * reference's single-partition whole-table pulls serialize on one
    * executor. Integration-tested against embedded Derby (JdbcSpec):
    * write → partitioned read → upsert → read round-trip, the exact
    * path a Postgres deployment exercises.
    */
  def jdbc(spark: SparkSession, url: String, table: String,
           partitionColumn: String, lowerBound: Long, upperBound: Long,
           numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()

  /** S8: Kafka source (reference README.md:27,103 — spec-only there too).
    * Identical downstream wiring to `csvStream`; no broker in this
    * container, so compile-checked only. Requires the
    * spark-sql-kafka connector on the classpath at deploy time.
    */
  def kafkaStream(spark: SparkSession, bootstrap: String,
                  topic: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .load()

  /** T1-analog for file feeds: incremental streaming ingest of a CSV feed
    * folder (each new drop becomes a micro-batch; `maxFilesPerTrigger`
    * bounds per-batch work). The Kafka variant is identical wiring with
    * `.format("kafka").option("subscribe", topic)` — not constructable in
    * this container (no broker), so the file source is the tested path.
    */
  def csvStream(spark: SparkSession, dir: String,
                schema: StructType, maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .option("header", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .schema(schema)
      .csv(dir)
}
