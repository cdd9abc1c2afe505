package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Sinks, Sources}

class SourcesSpec extends AnyFunSuite with SparkSpec {

  private def tmpDir() = Files.createTempDirectory("graft-src").toFile

  test("csv source with explicit schema; newest-file-wins selection") {
    val dir = tmpDir()
    val f1 = new java.io.File(dir, "drop1.csv")
    val f2 = new java.io.File(dir, "drop2.csv")
    Files.writeString(f1.toPath, "emp_id,emp_name,emp_age\n1,ann,30\n")
    Files.writeString(f2.toPath, "emp_id,emp_name,emp_age\n2,bob,40\n")
    f1.setLastModified(1700000000000L)
    f2.setLastModified(1800000000000L)
    val newest = Sources.newestFile(spark, dir.toString)
    assert(newest.exists(_.endsWith("drop2.csv")))
    val df = Sources.newestCsv(spark, dir.toString, Schemas.empDataRaw).get
    assert(df.schema == Schemas.empDataRaw)
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 2L)
  }

  test("csv quarantine: bad rows isolated, good rows typed") {
    val dir = tmpDir()
    val f = new java.io.File(dir, "feed.csv")
    // row 2 has a non-numeric age; row 3 is fine
    Files.writeString(f.toPath,
      "emp_id,emp_name,emp_age\n1,ann,30\n2,bob,not_a_number\n3,cyd,40\n")
    val (good, bad) = Sources.csvQuarantine(spark, f.toString,
      Schemas.empDataRaw)
    assert(good.schema == Schemas.empDataRaw)
    assert(good.count() == 2)
    assert(good.select("emp_id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 3L))
    val badLines = bad.collect().map(_.getString(0))
    assert(badLines.length == 1 && badLines.head.contains("not_a_number"),
      badLines.mkString("; "))
  }

  test("file-arrival gate window check") {
    val dir = tmpDir()
    val f = new java.io.File(dir, "feed.csv")
    Files.writeString(f.toPath, "a\n1\n")
    f.setLastModified(1750000000000L)
    assert(Sources.newDataAvailable(spark, dir.toString,
      1749999999000L, 1750000001000L))
    assert(!Sources.newDataAvailable(spark, dir.toString,
      1750000001000L, 1750000002000L))
    assert(!Sources.newDataAvailable(spark, dir.toString + "/missing",
      0L, Long.MaxValue))
    // a NEWER drop outside the window closes the gate even though an older
    // file's mtime still falls inside it (only the newest file is tested,
    // matching the reference's newest-object check)
    val g = new java.io.File(dir, "feed2.csv")
    Files.writeString(g.toPath, "a\n2\n")
    g.setLastModified(1750000005000L)
    assert(!Sources.newDataAvailable(spark, dir.toString,
      1749999999000L, 1750000001000L))
    assert(Sources.newDataAvailable(spark, dir.toString,
      1750000001000L, 1750000006000L))
  }

  test("sinks: overwrite truncates, append accretes, csv round-trips") {
    import spark.implicits._
    val out = tmpDir().toString + "/t"
    Sinks.overwriteParquet(Seq((1L, "a")).toDF("k", "v"), out)
    Sinks.overwriteParquet(Seq((2L, "b")).toDF("k", "v"), out)
    assert(spark.read.parquet(out).count() == 1) // truncate-and-reload
    Sinks.appendParquet(Seq((3L, "c")).toDF("k", "v"), out)
    assert(spark.read.parquet(out).count() == 2)
    val csvOut = tmpDir().toString + "/c"
    Sinks.overwriteCsv(Seq((1L, "x")).toDF("k", "v"), csvOut)
    assert(spark.read.option("header", "true").csv(csvOut).count() == 1)
  }

  test("json-lines and orc round-trip with explicit schemas") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val jOut = tmpDir().toString + "/j"
    Sinks.overwriteJson(df, jOut)
    val back = Sources.jsonLines(spark, jOut, df.schema)
    assert(back.orderBy("k").collect().map(_.getString(1)).toSeq
      == Seq("a", "b"))
    val oOut = tmpDir().toString + "/o"
    Sinks.overwriteOrc(df, oOut)
    assert(Sources.orc(spark, oOut).count() == 2)
  }

  test("streaming csv ingest: drops become micro-batches") {
    val dir = tmpDir()
    Files.writeString(new java.io.File(dir, "d1.csv").toPath,
      "emp_id,emp_name,emp_age\n1,ann,30\n2,bob,40\n")
    val stream = Sources.csvStream(spark, dir.toString, Schemas.empDataRaw)
    assert(stream.isStreaming)
    val q = stream.groupBy().count()
      .writeStream.format("memory").queryName("ingest")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(spark.table("ingest").collect().head.getLong(0) == 2L)
    } finally q.stop()
  }
}
