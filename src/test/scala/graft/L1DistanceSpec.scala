package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.L1DistanceI

class L1DistanceSpec extends AnyFunSuite with SparkSpec {

  test("l1i evaluates exact Manhattan distance") {
    import spark.implicits._
    L1DistanceI.register(spark)
    val df = Seq(
      (Seq(1, 2, 3), Seq(1, 2, 3)),
      (Seq(0, 0), Seq(3, -4)),
      (Seq(Int.MaxValue), Seq(Int.MinValue))) // no int overflow in long acc
      .toDF("a", "b")
    val got = df.select(expr("l1i(a, b)")).collect().map(_.getLong(0))
    assert(got.toSeq == Seq(0L, 7L, 4294967295L))
  }

  test("l1i: null array, null element, length mismatch -> NULL") {
    L1DistanceI.register(spark)
    val rows = spark.sql(
      """SELECT l1i(CAST(NULL AS ARRAY<INT>), array(1)),
        |       l1i(array(1, NULL), array(1, 2)),
        |       l1i(array(1), array(1, 2))""".stripMargin).collect().head
    assert(rows.isNullAt(0) && rows.isNullAt(1) && rows.isNullAt(2))
  }

  test("l1i rejects wrong types at analysis") {
    L1DistanceI.register(spark)
    intercept[Exception] {
      spark.sql("SELECT l1i(array(1.0), array(1.0))").collect()
    }
  }

  test("l1i matches the interpreted HOF fold on real histograms") {
    L1DistanceI.register(spark)
    val doc = Tables.documents(spark, sf).limit(50)
      .select(col("doc_id"),
        expr(graft.functions.Text.charHistogramSql("text")).as("h"))
    val pairs = doc.select(col("doc_id").as("ia"), col("h").as("ha"))
      .crossJoin(doc.select(col("doc_id").as("ib"), col("h").as("hb")))
    val diff = pairs.select(
        expr("l1i(ha, hb)").as("fast"),
        expr("aggregate(zip_with(ha, hb, (x, y) -> abs(x - y)), 0L, " +
          "(acc, v) -> acc + v)").as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diff == 0)
  }

  test("l1i runs inside a WholeStageCodegen span") {
    L1DistanceI.register(spark)
    val df = Tables.documents(spark, sf)
      .select(expr(graft.functions.Text.charHistogramSql("text")).as("h"))
      .select(expr("l1i(h, h)").as("d"))
    // strict: the l1distancei call must appear INSIDE a codegen'd
    // Project — a fallback to interpreted eval must fail this test
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[l1distancei.*"),
      s"expected l1i inside a WholeStageCodegen Project in:\n$plan")
    assert(df.agg(max("d")).collect().head.getLong(0) == 0L)
  }
}
