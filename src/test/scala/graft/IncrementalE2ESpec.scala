package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.EmployeePipeline
import graft.operators.{Merge, Scd2}
import graft.runner.Runner
import graft.runner.Runner.{Daily, Job}
import graft.sources.{Sinks, Sources}

/** The production multi-day loop the reference's daily_dag.py sketches,
  * composed END-TO-END from the shipped operators and replayed over
  * three daily file drops:
  *
  *   newest-file gate -> csvQuarantine ingest -> incremental
  *   batch-vs-corpus dedup (the q96 pattern with exact row digests) ->
  *   SCD2 close-out merge -> CDC diff shipped + applied (the q108
  *   pattern) -> active-headcount report
  *
  * Day 2 re-ships a day-1 row (must be dropped by the digest probe, not
  * re-merged into history) and carries a malformed line (must land in
  * quarantine, not the dim). Each day's dim is persisted via the
  * CDC-APPLY reconstruction — old snapshot + shipped diff — so the spec
  * proves diff shipping reproduces the exact snapshot chain. The final
  * assertion: the day-3 incremental state equals a from-scratch rebuild
  * folding the same staged batches from an empty dim.
  */
class IncrementalE2ESpec extends AnyFunSuite with SparkSpec {

  private val keys = Seq("emp_id", "start_date")

  /** q108's CDC shape over the SCD2 dim grain (emp_id, start_date):
    * full-outer snapshot diff tagged added/removed/changed. */
  private def snapshotDiff(old: DataFrame, neu: DataFrame): DataFrame = {
    val cols = old.columns
    val o = old.select(col("emp_id").as("k1"), col("start_date").as("k2"),
      struct(cols.map(col): _*).as("row_old"))
    val n = neu.select(col("emp_id").as("k1n"), col("start_date").as("k2n"),
      struct(cols.map(col): _*).as("row_new"))
    o.join(n, col("k1") === col("k1n") && col("k2") === col("k2n"),
        "full_outer")
      .withColumn("change",
        when(col("row_old").isNull, lit("added"))
          .when(col("row_new").isNull, lit("removed"))
          .when(!(col("row_old") <=> col("row_new")), lit("changed")))
      .filter(col("change").isNotNull)
  }

  /** Apply a shipped diff to the old snapshot: upsert added+changed,
    * anti-join removed — must reproduce the new snapshot exactly. */
  private def applyDiff(old: DataFrame, diff: DataFrame): DataFrame = {
    val upserts = diff.filter(col("change") =!= "removed")
      .select(col("row_new.*"))
    val removedKeys = diff.filter(col("change") === "removed")
      .select(col("k1").as("emp_id"), col("k2").as("start_date"))
    Merge.upsert(old, upserts, keys).join(removedKeys, keys, "left_anti")
      .select(old.columns.map(col): _*) // using-join moved keys first
  }

  private def canon(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("3-day incremental loop: dedup, SCD2, CDC chain == full rebuild") {
    val root = Files.createTempDirectory("graft-e2e").toFile.toString
    val feed = s"$root/feed"; new java.io.File(feed).mkdirs()
    val s = spark

    // ---- the three daily drops (epoch seconds: 2024-01-01 /
    // 2024-02-01 / 2024-03-01). Day 2 re-ships emp 2's day-1 row
    // verbatim AND carries a malformed line; day 3 re-ships it again.
    val drops = Seq(
      "day1" ->
        """emp_id,designation,start_date,end_date,salary
          |1,eng,1704067200,,1000
          |2,eng,1704067200,,900
          |3,ops,1704067200,,700
          |""".stripMargin,
      "day2" ->
        """emp_id,designation,start_date,end_date,salary
          |2,eng,1704067200,,900
          |1,eng,1706745600,,1200
          |4,ops,1706745600,,800
          |x,y,z,w,v
          |""".stripMargin,
      "day3" ->
        """emp_id,designation,start_date,end_date,salary
          |2,eng,1704067200,,900
          |3,ops,1709251200,,750
          |5,hr,1709251200,,600
          |""".stripMargin)

    var badRows = Map.empty[String, Long]
    var dedupDropped = Map.empty[String, Long]

    val jobs = Seq(
      Job("ingest_quarantine", Daily, (s: SparkSession, day: String) => {
        // newest-file gate (S2): the feed dir holds every drop so far;
        // mtimes make "newest" == today's file
        val newest = Sources.newestFile(s, feed).get
        assert(newest.endsWith(s"$day.csv"), s"gate picked $newest on $day")
        val (good, bad) = Sources.csvQuarantine(s, newest,
          Schemas.empTimeframeRaw)
        badRows += day -> bad.count()
        Sinks.overwriteParquet(good, s"$root/ingested/$day")
      }),
      Job("incremental_dedup", Daily, (s: SparkSession, day: String) => {
        // q96's batch-vs-corpus probe with exact digests: today's rows
        // against the digest index of everything already ingested —
        // per-day cost scales with the batch, never the corpus
        val batch = s.read.parquet(s"$root/ingested/$day")
        val index =
          if (Files.exists(Paths.get(s"$root/digests")))
            Some(s.read.parquet(s"$root/digests"))
          else None
        val (fresh, digests) =
          graft.operators.Dedup.incrementalByRowDigest(batch, index)
        dedupDropped += day -> (batch.count() - fresh.count())
        Sinks.appendParquet(digests, s"$root/digests")
        Sinks.overwriteParquet(EmployeePipeline.cleanTimeframe(fresh),
          s"$root/staging/$day")
      }),
      Job("scd2_cdc_merge", Daily, (s: SparkSession, day: String) => {
        val staging = s.read.parquet(s"$root/staging/$day")
        val dimOld =
          if (Files.exists(Paths.get(s"$root/dim")))
            s.read.parquet(s"$root/dim")
          else staging.limit(0)
        val dimNew = Scd2.closeOutMerge(dimOld, staging, "emp_id",
          "start_date", "end_date", "status")
        // ship the diff, reconstruct the snapshot from old + diff, and
        // PERSIST THE RECONSTRUCTION — if apply-the-diff ever diverged
        // from the direct merge, the final rebuild equality would fail
        val diff = snapshotDiff(dimOld, dimNew)
        val reconstructed = applyDiff(dimOld, diff)
        assert(canon(reconstructed) == canon(dimNew),
          s"$day: CDC apply diverged from the direct merge")
        Sinks.overwriteParquet(reconstructed.localCheckpoint(),
          s"$root/dim")
      }),
      Job("active_report", Daily, (s: SparkSession, day: String) => {
        Sinks.overwriteCsv(
          EmployeePipeline.activeByDesignation(
            s.read.parquet(s"$root/dim")),
          s"$root/report/$day")
      }))

    drops.zipWithIndex.foreach { case ((day, body), i) =>
      val f = new java.io.File(feed, s"$day.csv").toPath
      Files.writeString(f, body)
      // deterministic newest-file ordering regardless of write speed
      Files.setLastModifiedTime(f, FileTime.fromMillis(1000000L * (i + 1)))
      val results = Runner.runCadence(s, jobs, Daily, day)
      assert(results.forall(_.ok),
        results.filterNot(_.ok).mkString("; "))
    }

    // quarantine caught exactly day 2's malformed line
    assert(badRows == Map("day1" -> 0L, "day2" -> 1L, "day3" -> 0L))
    // the digest probe dropped exactly the re-shipped rows
    assert(dedupDropped == Map("day1" -> 0L, "day2" -> 1L, "day3" -> 1L))

    val dim = s.read.parquet(s"$root/dim")
    // emp 2 was re-shipped twice but holds exactly ONE open row: the
    // incremental dedup kept duplicate history out of the dim
    assert(dim.filter(col("emp_id") === 2).count() == 1)
    // emp 1 and emp 3 each carry a closed generation + an open one
    for (e <- Seq(1, 3)) {
      val rows = dim.filter(col("emp_id") === e)
      assert(rows.count() == 2, s"emp $e generations")
      assert(rows.filter(col("end_date").isNull
        && col("status") === "Active").count() == 1, s"emp $e open row")
    }
    // day-3 report: eng = emp1+emp2, ops = emp3+emp4, hr = emp5
    val report = s.read.option("header", "true")
      .csv(s"$root/report/day3").collect()
      .map(r => r.getString(0) -> r.getString(1).toLong).toMap
    assert(report == Map("eng" -> 2L, "ops" -> 2L, "hr" -> 1L))

    // ---- from-scratch rebuild: fold the SAME staged batches over an
    // empty dim; the incrementally maintained (and CDC-reconstructed)
    // state must match it exactly
    val rebuilt = drops.map(_._1).foldLeft(Option.empty[DataFrame]) {
      case (acc, day) =>
        val staging = s.read.parquet(s"$root/staging/$day")
        Some(Scd2.closeOutMerge(acc.getOrElse(staging.limit(0)), staging,
          "emp_id", "start_date", "end_date", "status"))
    }.get
    assert(canon(dim) == canon(rebuilt),
      "incremental day-3 state != from-scratch rebuild")
  }
}
