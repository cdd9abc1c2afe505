package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.streaming.StreamNearDup

/** Scratch streaming scale smoke (not part of the driver contract):
  * runs an adversarial clone corpus through the StreamNearDup
  * file-stream twin with rate limiting and reports the numbers the
  * batch smokes report for batch operators — per-microbatch latency,
  * state-store rows, and flag counts — so BASELINE.md can record the
  * streaming analog. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/clone10 \
  *     sbt "runMain graft.StreamSmoke <retentionSec>"
  *
  * The corpus is staged as one parquet file per "wave": clone wave i
  * (doc_id div 1_000_000 = i) gets event time BASE + i minutes, and the
  * file source feeds one file per trigger — so wave 0 seeds the bucket
  * state and each later wave arrives as a later microbatch whose clones
  * hit existing buckets. With retention below the wave spacing, buckets
  * expire as the watermark advances and later waves become fresh owners
  * — the state-bound-by-retention design under measurement.
  */
object StreamSmoke {

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("spike")) { spikeSmoke(); return }
    if (args.headOption.contains("ksdrift")) { ksDriftSmoke(); return }
    val retentionSec = args.headOption.map(_.toLong).getOrElse(600L)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/clone10")
    val spark = Engine.session("graft-stream-smoke", "32")
    import spark.implicits._

    val base = 1700000000L // fixed epoch: deterministic event times
    val staged = Files.createTempDirectory("graft-stream-smoke").toString
    val waves = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        timestamp_seconds(lit(base)
          + (col("doc_id") / 1000000L).cast("bigint") * 60L).as("ts"),
        col("text"))
    val nWaves = waves.select(
      (col("doc_id") / 1000000L).cast("int").as("w"))
      .agg(max("w")).as[Int].head() + 1
    (0 until nWaves).foreach { i =>
      waves
        .filter((col("doc_id") / 1000000L).cast("int") === i)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$staged/wave_$i")
      // one flat dir for the file source, mod-times in wave order
      val src = Files.list(Paths.get(s"$staged/wave_$i")).toArray
        .map(_.toString).filter(_.endsWith(".parquet")).head
      Files.move(Paths.get(src), Paths.get(s"$staged/w$i.parquet"))
      Thread.sleep(20) // distinct mod times -> deterministic pickup order
    }

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$staged/w*.parquet")

    var total = 0L
    val t0 = System.nanoTime()
    val q = StreamNearDup.flag(stream, "30 seconds",
        retentionMs = retentionSec * 1000L)
      .writeStream.outputMode("append")
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[StreamNearDup.Match], _: Long) =>
          total += df.count()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$staged/ckpt")
      .start()
    q.awaitTermination()
    val wallS = (System.nanoTime() - t0) / 1e9

    val prog = q.recentProgress.filter(_.numInputRows > 0)
    println(s"""{"smoke":"stream_neardup","dir":"$dir",""" +
      s""""retention_sec":$retentionSec,"waves":$nWaves,""" +
      s""""wall_sec":${math.round(wallS * 10) / 10.0},""" +
      s""""total_flags":$total,"batches":[""" +
      prog.map { p =>
        val so = p.stateOperators.headOption
        s"""{"rows_in":${p.numInputRows},""" +
          s""""duration_ms":${p.batchDuration},""" +
          s""""state_rows":${so.map(_.numRowsTotal).getOrElse(-1L)},""" +
          s""""state_mem_bytes":${
            so.map(_.memoryUsedBytes).getOrElse(-1L)}}"""
      }.mkString(",") + "]}")
    spark.stop()
  }

  /** StreamKsDrift scale smoke: the documents corpus fed as one file
    * per WAVE (doc_id mod 16 → every wave is a uniform corpus sample
    * in its own tumbling window), verdicts against a reference grid
    * built from the whole batch corpus. Measures the state bound the
    * design claims: state rows ≈ OPEN windows × 1 (nGrid+1 longs
    * each), independent of corpus size and stream rate — and since
    * every wave is a null sample OF the reference, the reported
    * false-alarm count should sit at or below the α = 0.05 share of
    * windows (the subset overlap makes the test conservative vs the
    * independent-sample null).
    */
  private def ksDriftSmoke(): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = Engine.session("graft-ks-smoke", "32")
    val staged = Files.createTempDirectory("graft-ks-smoke").toString
    val ref = graft.streaming.StreamKsDrift.referenceFrom(
      spark.read.parquet(s"$dir/documents.parquet"), "text", nGrid = 32)
    val base = 1700000000L
    val nWaves = 16
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        timestamp_seconds(lit(base)
          + (col("doc_id") % nWaves).cast("bigint") * 60L).as("ts"),
        col("text"))
    (0 until nWaves).foreach { i =>
      docs.filter((col("doc_id") % nWaves).cast("int") === i)
        .coalesce(1).write.mode("overwrite").parquet(s"$staged/wave_$i")
      val src = Files.list(Paths.get(s"$staged/wave_$i")).toArray
        .map(_.toString).filter(_.endsWith(".parquet")).head
      Files.move(Paths.get(src), Paths.get(f"$staged/k$i%02d.parquet"))
      Thread.sleep(20)
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$staged/k*.parquet")
    var windows = 0L
    var falseAlarms = 0L
    val t0 = System.nanoTime()
    val q = graft.streaming.StreamKsDrift
      .drift(stream, ref, "1 minute", "1 minute")
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val c = df.persist()
        windows += c.count()
        falseAlarms += c.filter(col("drifted")).count()
        c.unpersist()
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$staged/ckpt")
      .start()
    q.awaitTermination()
    val wallS = (System.nanoTime() - t0) / 1e9
    val prog = q.recentProgress.filter(_.numInputRows > 0)
    println(s"""{"smoke":"stream_ksdrift","dir":"$dir",""" +
      s""""waves":$nWaves,"ref_total":${ref.refTotal},""" +
      s""""grid":${ref.cuts.length},""" +
      s""""wall_sec":${math.round(wallS * 10) / 10.0},""" +
      s""""windows_closed":$windows,"false_alarms":$falseAlarms,""" +
      s""""batches":[""" +
      prog.map { p =>
        val so = p.stateOperators.headOption
        s"""{"rows_in":${p.numInputRows},""" +
          s""""duration_ms":${p.batchDuration},""" +
          s""""state_rows":${so.map(_.numRowsTotal).getOrElse(-1L)},""" +
          s""""state_mem_bytes":${
            so.map(_.memoryUsedBytes).getOrElse(-1L)}}"""
      }.mkString(",") + "]}")
    spark.stop()
  }

  /** StreamSpike scale smoke: the full events table fed as one file per
    * DAY (30 microbatches at sf0.1), measuring what the state-bound
    * design claims — per-user state is the open-hour counters inside
    * the lateness horizon plus a 3-long trail, so state ROWS sit at
    * ~|users| regardless of event rate or stream length.
    */
  private def spikeSmoke(): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = Engine.session("graft-spike-smoke", "32")
    import spark.implicits._
    val staged = Files.createTempDirectory("graft-spike-smoke").toString
    val dayUs = 86400000000L
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"),
        expr(s"ts_us div ${dayUs}L").as("day"))
    val days = ev.select(col("day")).distinct()
      .orderBy(col("day")).as[Long].collect()
    days.zipWithIndex.foreach { case (day, i) =>
      ev.filter(col("day") === day).drop("day")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$staged/day_$i")
      val src = Files.list(Paths.get(s"$staged/day_$i")).toArray
        .map(_.toString).filter(_.endsWith(".parquet")).head
      Files.move(Paths.get(src),
        Paths.get(f"$staged/d$i%03d.parquet"))
      Thread.sleep(20)
    }
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$staged/d*.parquet")
    var rows = 0L
    var spikes = 0L
    val t0 = System.nanoTime()
    val q = graft.streaming.StreamSpike.spikes(stream, "30 minutes")
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[
          graft.streaming.StreamSpike.SpikeRow], _: Long) =>
        val c = df.persist()
        rows += c.count()
        spikes += c.filter(col("spike")).count()
        c.unpersist()
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$staged/ckpt")
      .start()
    q.awaitTermination()
    val wallS = (System.nanoTime() - t0) / 1e9
    val prog = q.recentProgress.filter(_.numInputRows > 0)
    println(s"""{"smoke":"stream_spike","dir":"$dir",""" +
      s""""days":${days.length},""" +
      s""""wall_sec":${math.round(wallS * 10) / 10.0},""" +
      s""""hour_rows":$rows,"spike_rows":$spikes,"batches":[""" +
      prog.map { p =>
        val so = p.stateOperators.headOption
        s"""{"rows_in":${p.numInputRows},""" +
          s""""duration_ms":${p.batchDuration},""" +
          s""""state_rows":${so.map(_.numRowsTotal).getOrElse(-1L)},""" +
          s""""state_mem_bytes":${
            so.map(_.memoryUsedBytes).getOrElse(-1L)}}"""
      }.mkString(",") + "]}")
    spark.stop()
  }
}
