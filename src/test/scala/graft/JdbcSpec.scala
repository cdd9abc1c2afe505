package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Merge
import graft.sources.{Sinks, Sources}

/** Live JDBC round-trip over embedded Derby (ships with Spark — no extra
  * dependency): the reference's staging/dim I/O is Postgres-over-JDBC
  * everywhere (`merge2_tf_dim_staging.py:27,30`,
  * `clean_load_2_tf_staging.py:92-100`), and this exercises the exact
  * same Spark code path — `format("jdbc")` read with a partitioned scan,
  * overwrite/append writes, and an upsert cycle — with only the URL
  * differing from a production deployment.
  */
class JdbcSpec extends AnyFunSuite with SparkSpec {

  // in-memory Derby database, one per suite run; lives for the JVM
  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  test("S5/S6-jdbc: overwrite then append, read back") {
    import spark.implicits._
    val dim = Seq((1L, "ann", 30), (2L, "bob", 40))
      .toDF("emp_id", "emp_name", "emp_age")
    Sinks.jdbcOverwrite(dim, url, "emp_dim")
    // overwrite twice: drop-and-recreate must be idempotent (S9 truncate
    // staging semantics)
    Sinks.jdbcOverwrite(dim, url, "emp_dim")
    Sinks.jdbcAppend(
      Seq((3L, "cyd", 50)).toDF("emp_id", "emp_name", "emp_age"),
      url, "emp_dim")
    val back = Sources.jdbc(spark, url, "emp_dim",
      partitionColumn = "emp_id", lowerBound = 1L, upperBound = 4L,
      numPartitions = 2)
    assert(back.rdd.getNumPartitions == 2)
    assert(back.count() == 3)
    assert(back.filter(col("emp_id") === 3L).select("emp_name")
      .collect().map(_.getString(0)).toSeq == Seq("cyd"))
  }

  test("S3/J4: partitioned jdbc read feeds upsert, result lands back") {
    import spark.implicits._
    val dim = Seq((1L, "ann", "HR"), (2L, "bob", "ENG"))
      .toDF("emp_id", "emp_name", "dept")
    Sinks.jdbcOverwrite(dim, url, "emp_tf_dim")
    val staging = Seq((2L, "bob", "OPS"), (4L, "dee", "ENG"))
      .toDF("emp_id", "emp_name", "dept")
    Sinks.jdbcOverwrite(staging, url, "emp_tf_staging")

    val dimDb = Sources.jdbc(spark, url, "emp_tf_dim",
      partitionColumn = "emp_id", lowerBound = 1L, upperBound = 5L,
      numPartitions = 3)
    val stagingDb = Sources.jdbc(spark, url, "emp_tf_staging",
      partitionColumn = "emp_id", lowerBound = 1L, upperBound = 5L,
      numPartitions = 3)
    val merged = Merge.upsert(dimDb, stagingDb, Seq("emp_id"))
    // JDBC overwrite of a table that is also a read source must
    // materialize first (same-table read-write cycle) — the production
    // pattern is staging → merge → write-back
    val rows = merged.collect().toSeq
    Sinks.jdbcOverwrite(
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows), merged.schema),
      url, "emp_tf_dim")

    val back = Sources.jdbc(spark, url, "emp_tf_dim",
      partitionColumn = "emp_id", lowerBound = 1L, upperBound = 5L,
      numPartitions = 2)
    val byId = back.collect()
      .map(r => r.getLong(r.fieldIndex("emp_id")) ->
        r.getString(r.fieldIndex("dept"))).toMap
    assert(byId == Map(1L -> "HR", 2L -> "OPS", 4L -> "ENG"))
  }

  test("jdbc partitioned read splits the scan by stride") {
    import spark.implicits._
    val wide = (1L to 100L).map(i => (i, s"n$i")).toDF("id", "name")
    Sinks.jdbcOverwrite(wide, url, "wide_t")
    val back = Sources.jdbc(spark, url, "wide_t",
      partitionColumn = "id", lowerBound = 1L, upperBound = 101L,
      numPartitions = 4)
    assert(back.rdd.getNumPartitions == 4)
    // every stride contributes rows — the scan really is split
    val perPart = back.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perPart.forall(_ > 0) && perPart.sum == 100)
  }
}
