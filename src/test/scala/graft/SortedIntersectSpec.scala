package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.SortedIntersectCount

/** `interlen` (plans/SortedIntersect.scala): the distinct sorted-merge
  * intersection count that replaces size(array_intersect) in q190's
  * verify leg — must match array_intersect's DISTINCT semantics on
  * every sorted input, including duplicates, empties and nulls.
  */
class SortedIntersectSpec extends AnyFunSuite with SparkSpec {

  test("interlen evaluates distinct common values on sorted arrays") {
    SortedIntersectCount.register(spark)
    val r = spark.sql(
      """SELECT interlen(array(1L, 3L, 5L), array(2L, 3L, 5L, 7L)),
        |       interlen(array(1L, 1L, 2L, 2L), array(1L, 2L, 2L, 9L)),
        |       interlen(CAST(array() AS ARRAY<BIGINT>), array(1L)),
        |       interlen(array(4L), array(4L))""".stripMargin)
      .collect().head
    assert(r.getLong(0) == 2L, "common {3,5}")
    assert(r.getLong(1) == 2L, "duplicate runs count once (distinct)")
    assert(r.getLong(2) == 0L && r.getLong(3) == 1L)
  }

  test("interlen: null array / null element -> NULL; wrong type rejected") {
    SortedIntersectCount.register(spark)
    val r = spark.sql(
      """SELECT interlen(CAST(NULL AS ARRAY<BIGINT>), array(1L)),
        |       interlen(array(1L, CAST(NULL AS BIGINT)), array(9L))"""
        .stripMargin)
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
    intercept[Exception] {
      spark.sql("SELECT interlen(array('a'), array('a'))").collect()
    }
  }

  test("interlen equals size(array_intersect) on real sorted gram sets") {
    SortedIntersectCount.register(spark)
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"), expr(
        "sort_array(array_distinct(transform(split(text, ' '), " +
          "t -> xxhash64(t))))").as("st"))
    val pairs = sets.toDF("a_id", "sa")
      .crossJoin(sets.toDF("b_id", "sb"))
      .filter(col("a_id") < col("b_id"))
      .limit(5000)
      .select(expr("interlen(sa, sb)").as("fast"),
        size(array_intersect(col("sa"), col("sb"))).cast("bigint")
          .as("ref"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }
}
