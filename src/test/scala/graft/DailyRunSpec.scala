package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.EmployeePipeline
import graft.runner.Runner
import graft.runner.Runner.{Daily, Job}
import graft.sources.{Sinks, Sources}

/** Capstone: the reference's daily cadence wired through the Runner —
  * ingest+clean the timeframe feed, SCD2-merge into the dim, emit the
  * active-headcount report — all as registered jobs over a temp
  * warehouse, with per-job results.
  */
class DailyRunSpec extends AnyFunSuite with SparkSpec {

  test("daily cadence: ingest -> merge -> report via Runner") {
    val root = Files.createTempDirectory("graft-daily").toFile.toString
    val feed = s"$root/feed"; new java.io.File(feed).mkdirs()
    Files.writeString(new java.io.File(feed, "tf.csv").toPath,
      """emp_id,designation,start_date,end_date,salary
        |1,eng,1704067200,,1000
        |2,eng,1704067200,,900
        |3,ops,1704067200,1706745600,700
        |""".stripMargin)

    val jobs = Seq(
      Job("clean_timeframe", Daily, (s, _) => {
        val raw = Sources.newestCsv(s, feed, Schemas.empTimeframeRaw).get
        Sinks.overwriteParquet(EmployeePipeline.cleanTimeframe(raw),
          s"$root/staging")
      }),
      Job("merge_dim", Daily, (s, _) => {
        val staging = s.read.parquet(s"$root/staging")
        // first run: staging image becomes the dim
        Sinks.overwriteParquet(staging, s"$root/dim")
      }),
      Job("active_report", Daily, (s, _) => {
        val dim = s.read.parquet(s"$root/dim")
        Sinks.overwriteCsv(EmployeePipeline.activeByDesignation(dim),
          s"$root/report")
      })
    )

    val results = Runner.runCadence(spark, jobs, Daily, "2024-06-01")
    assert(results.forall(_.ok), results.mkString("; "))
    assert(results.map(_.name) ==
      Seq("clean_timeframe", "merge_dim", "active_report"))

    val report = spark.read.option("header", "true").csv(s"$root/report")
    val m = report.collect()
      .map(r => r.getString(0) -> r.getString(1).toLong).toMap
    // emp 3 is closed (Inactive); both eng rows active
    assert(m == Map("eng" -> 2L))
  }
}
