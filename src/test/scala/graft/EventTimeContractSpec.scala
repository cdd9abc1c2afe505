package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source contract for the events feed (SURVEY.md §1.5: explicit schemas,
  * validate physical type at load). The testdata's `ts` column has shipped
  * as INT64 TIMESTAMP(NANOS) in one generation and timestamp[us] in
  * another; `Tables.withEventTime` must normalize both to the same exact
  * `ts_us` — a silent unit or type drift here invalidated 16 queries in
  * round 5, so this is pinned by test.
  */
class EventTimeContractSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val micros = Seq(
    1700000000000000L, // 2023-11-14 22:13:20 UTC
    1700000000123456L,
    0L,
    -1000000L)         // pre-epoch second

  test("nanos-long and timestamp[us] events files normalize to identical ts_us") {
    val tmp = Files.createTempDirectory("evt-contract").toFile
    val nanosDir = s"${tmp.getAbsolutePath}/nanos"
    val microsDir = s"${tmp.getAbsolutePath}/micros"

    // Variant A: epoch-nanos long (what nanosAsLong surfaces for INT64 TIMESTAMP(NANOS)).
    micros.map(us => (us * 1000L, us)).toDF("ts", "expected_us")
      .write.mode("overwrite").parquet(nanosDir)
    // Variant B: real timestamp column at microsecond precision.
    micros.map(us => (new java.sql.Timestamp(us / 1000), us)).toDF("tmp_ts", "expected_us")
      .select(timestamp_micros(col("expected_us")).as("ts"), col("expected_us"))
      .write.mode("overwrite").parquet(microsDir)

    def normalized(dir: String): Map[Long, Long] =
      Tables.withEventTime(spark.read.parquet(dir))
        .select(col("expected_us"), col("ts_us"))
        .collect().map { case Row(e: Long, t: Long) => (e, t) }.toMap

    val a = normalized(nanosDir)
    val b = normalized(microsDir)
    micros.foreach { us =>
      assert(a(us) === us, s"nanos-long variant wrong for $us")
      assert(b(us) === us, s"timestamp[us] variant wrong for $us")
    }
  }

  test("timestamp_ntz events file normalizes exactly under UTC session zone") {
    val tmp = Files.createTempDirectory("evt-contract-ntz").toFile.getAbsolutePath
    micros.map(us => Tuple1(us)).toDF("expected_us")
      .select(timestamp_micros(col("expected_us")).cast(TimestampNTZType).as("ts"),
        col("expected_us"))
      .write.mode("overwrite").parquet(tmp)
    val got = Tables.withEventTime(spark.read.parquet(tmp))
      .select(col("expected_us"), col("ts_us"))
      .collect().map { case Row(e: Long, t: Long) => (e, t) }.toMap
    micros.foreach(us => assert(got(us) === us, s"ntz variant wrong for $us"))
  }

  test("unsupported ts type fails loudly at load") {
    val bad = Seq(("x", 1L)).toDF("ts", "expected_us")
    val e = intercept[IllegalStateException](Tables.withEventTime(bad))
    assert(e.getMessage.contains("unsupported physical type"))
  }

  test("real testdata events table exposes exact micros ts_us") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts_us").dataType === LongType)
    assert(ev.schema("ts").dataType === TimestampType)
    val Row(n: Long, distinctUs: Long) =
      ev.agg(count(lit(1)), countDistinct(col("ts_us"))).head()
    assert(n > 0)
    assert(distinctUs > 1)
    // ts and ts_us must agree exactly (ts is derived from ts_us).
    val mismatched = ev.filter(unix_micros(col("ts")) =!= col("ts_us")).count()
    assert(mismatched === 0L)
  }
}
