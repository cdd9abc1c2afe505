package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.HammingDistance

class HammingSpec extends AnyFunSuite with SparkSpec {

  test("hamming64 evaluates correctly and survives codegen") {
    import spark.implicits._
    HammingDistance.register(spark)
    val df = Seq((0L, 0L), (-1L, 0L), (12345L, 54321L), (1L, 2L))
      .toDF("a", "b")
    val got = df.select(expr("hamming64(a, b)")).collect().map(_.getInt(0))
    assert(got.toSeq == Seq(0, 64, 5, 2))
    // null propagation
    val n = spark.sql(
      "SELECT hamming64(CAST(NULL AS BIGINT), CAST(1 AS BIGINT))")
      .collect().head
    assert(n.isNullAt(0))
  }

  test("hamming64 rejects wrong types at analysis") {
    HammingDistance.register(spark)
    intercept[Exception] {
      spark.sql("SELECT hamming64('x', 1)").collect()
    }
  }

  test("expression appears inside WholeStageCodegen span") {
    HammingDistance.register(spark)
    // parquet-backed scan so the projection isn't constant-folded away
    val df = Tables.lineitem(spark, sf)
      .select(expr("hamming64(l_orderkey, l_partkey)").as("d"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [hammingdistance"),
      s"expected hamming64 inside a codegen stage in:\n$plan")
    assert(df.agg(max("d")).collect().head.getInt(0) <= 64)
  }
}
