package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.EmployeePipeline
import graft.sources.{Sinks, Sources}

/** End-to-end pipeline: two daily CSV drops flow through newest-file
  * selection → clean → staging parquet → SCD2 merge → reports
  * (SURVEY.md §5's synthetic day-1/day-2 scenario).
  */
class EndToEndSpec extends AnyFunSuite with SparkSpec {

  test("day-1/day-2 drops: ingest, merge, report golden results") {
    val root = Files.createTempDirectory("graft-e2e").toFile.toString
    val feed = s"$root/feed"; new java.io.File(feed).mkdirs()

    // --- day 1 drop: two employees start (open rows)
    val d1 = new java.io.File(feed, "tf_day1.csv")
    Files.writeString(d1.toPath,
      """emp_id,designation,start_date,end_date,salary
        |1,eng,1704067200,,1000
        |2,sales,1704067200,,800
        |""".stripMargin)
    d1.setLastModified(1704100000000L)

    val raw1 = Sources.newestCsv(spark, feed, Schemas.empTimeframeRaw).get
    val clean1 = EmployeePipeline.cleanTimeframe(raw1)
    Sinks.overwriteParquet(clean1, s"$root/staging")
    // first load: staging becomes the dim
    Sinks.overwriteParquet(spark.read.parquet(s"$root/staging"),
      s"$root/dim")

    val dimDay1 = spark.read.parquet(s"$root/dim")
    assert(dimDay1.count() == 2)
    assert(dimDay1.filter(col("status") === "Active").count() == 2)

    // --- day 2 drop: emp 1 gets a new generation (promotion), newest file
    // must win over day 1's
    val d2 = new java.io.File(feed, "tf_day2.csv")
    Files.writeString(d2.toPath,
      """emp_id,designation,start_date,end_date,salary
        |1,senior-eng,1706745600,,1500
        |""".stripMargin)
    d2.setLastModified(1704200000000L)

    val raw2 = Sources.newestCsv(spark, feed, Schemas.empTimeframeRaw).get
    assert(raw2.count() == 1, "newest-file-wins must pick only day 2")
    val clean2 = EmployeePipeline.cleanTimeframe(raw2)
    val merged = EmployeePipeline.mergeTimeframeDim(
      spark.read.parquet(s"$root/dim"),
      clean2.select("emp_id", "designation", "start_date", "salary",
        "strike_count", "updated_salary", "cooldown_start_date"))
    Sinks.overwriteParquet(merged, s"$root/dim2")

    val dim = spark.read.parquet(s"$root/dim2")
    // emp1: closed old gen + open new gen; emp2: untouched open
    assert(dim.count() == 3)
    val e1 = dim.filter(col("emp_id") === 1)
    assert(e1.filter(col("status") === "Inactive"
      && col("end_date").isNotNull).count() == 1)
    assert(e1.filter(col("status") === "Active"
      && col("end_date").isNull && col("salary") === 1500).count() == 1)

    // --- report over the merged dim
    val report = EmployeePipeline.activeByDesignation(dim)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(report == Map("senior-eng" -> 1L, "sales" -> 1L))
  }
}
