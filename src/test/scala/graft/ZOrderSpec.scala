package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrder

/** ZOrder bit-exactness vs a JVM reference, and the clustering property
  * that justifies it: z-prefix buckets have tight bounding boxes in
  * BOTH dimensions, where a single-dim sort only bounds one.
  */
class ZOrderSpec extends AnyFunSuite with SparkSpec {

  // textbook bit-loop reference (the production code uses mask-shift
  // doubling; agreeing with the naive loop proves the magic masks)
  private def refZ(a: Int, b: Int): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | ((a >> i) & 1).toLong << (2 * i) |
        ((b >> i) & 1).toLong << (2 * i + 1)
    }

  test("zValue matches the bit-loop reference on boundary + mixed values") {
    import spark.implicits._
    val cases = Seq((0, 0), (65535, 65535), (65535, 0), (0, 65535),
      (1, 2), (21845, 43690), (12345, 54321), (32768, 1))
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"),
        ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    cases.foreach { c =>
      assert(got(c) === refZ(c._1, c._2), s"mismatch for $c")
    }
  }

  test("quantize16 is exact integral arithmetic in [0, 65536)") {
    import spark.implicits._
    val rows = Seq((0L, 99L), (99L, 99L), (50L, 99L), (65535L, 65535L))
    val got = rows.toDF("v", "mx")
      .select(ZOrder.quantize16(col("v"), col("mx")).as("q"))
      .collect().map(_.getLong(0))
    // floor(v * 65536 / (mx + 1)); v <= mx keeps every value < 65536
    assert(got === Array(0L, 64880L, 32768L, 65535L))
    assert(got.forall(q => q >= 0L && q <= 65535L))
  }

  test("z-prefix buckets bound BOTH dims tighter than a 1-dim sort's buckets") {
    import spark.implicits._
    // a 64x64 grid: every (a, b) combination once
    val grid = (0 until 64).flatMap(a => (0 until 64).map(b => (a, b)))
      .toDF("a", "b")
    val mx = lit(63)
    val z = grid.select(col("a"), col("b"),
      shiftright(ZOrder.zValue(ZOrder.quantize16(col("a"), mx),
        ZOrder.quantize16(col("b"), mx)), 26).as("bucket"))
    val zBoxes = z.groupBy("bucket")
      .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
      .agg(avg(col("sa") + col("sb")).as("zspan"))
      .collect()(0).getDouble(0)
    // same bucket COUNT (64 buckets of 64 rows) from a sort on `a`
    // alone: b is unconstrained inside every bucket
    val aBoxes = grid
      .select(col("a"), col("b"), col("a").as("bucket"))
      .groupBy("bucket")
      .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
      .agg(avg(col("sa") + col("sb")).as("aspan"))
      .collect()(0).getDouble(0)
    // z buckets: ~8x8 boxes (span sum ~14); a-sort buckets: a-span 0 but
    // b-span 63 (span sum ~63). The margin is the whole point.
    assert(zBoxes < aBoxes / 2,
      s"z box span $zBoxes not tighter than 1-dim $aBoxes")
  }

  test("q117 buckets are the documented z-prefix grain") {
    val out = SparkEntry.queries("q117_zorder_layout")(spark, sf)
    val n = out.count()
    assert(n > 0 && n <= 64, s"expected <=64 z-file buckets, got $n")
  }
}
