package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.MaxFreqL

class MaxFreqSpec extends AnyFunSuite with SparkSpec {

  test("maxfreq evaluates element multiplicity") {
    MaxFreqL.register(spark)
    val r = spark.sql(
      """SELECT maxfreq(array(5L, 3L, 5L, 5L, 3L)),
        |       maxfreq(array(7L)),
        |       maxfreq(CAST(array() AS ARRAY<BIGINT>)),
        |       maxfreq(array(1L, 1L, 1L, 1L))""".stripMargin)
      .collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L
      && r.getLong(2) == 0L && r.getLong(3) == 4L)
  }

  test("maxfreq: null array / null element -> NULL; wrong type rejected") {
    MaxFreqL.register(spark)
    val r = spark.sql(
      """SELECT maxfreq(CAST(NULL AS ARRAY<BIGINT>)),
        |       maxfreq(array(1L, CAST(NULL AS BIGINT)))""".stripMargin)
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
    intercept[Exception] {
      spark.sql("SELECT maxfreq(array('a'))").collect()
    }
  }

  test("maxfreq matches the interpreted sorted-run fold on real grams") {
    MaxFreqL.register(spark)
    val grams = Tables.documents(spark, sf)
      .select(expr("transform(split(text, ' '), t -> xxhash64(t))")
        .as("th"))
      .select(expr(
        "transform(sequence(0, size(th) - 2), i -> " +
          "xxhash64(th[i], th[i + 1]))").as("g"))
    val diff = grams.select(
        expr("maxfreq(g)").as("fast"),
        expr("""aggregate(array_sort(g),
          |  named_struct('prev', CAST(NULL AS BIGINT),
          |    'run', 0L, 'best', 0L),
          |  (a, x) -> named_struct('prev', x,
          |    'run', IF(x <=> a.prev, a.run + 1L, 1L),
          |    'best', greatest(a.best,
          |      IF(x <=> a.prev, a.run + 1L, 1L))),
          |  a -> a.best)""".stripMargin).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diff == 0)
  }

  test("maxfreq runs inside a WholeStageCodegen span") {
    MaxFreqL.register(spark)
    // input built with array() (codegen-capable) — a transform() input
    // would push the whole Project out of codegen on its own (HOF
    // lambdas are CodegenFallback); maxfreq's nullSafeEval still runs
    // the same primitive long[] sort on that path
    val df = Tables.documents(spark, sf)
      .select(expr("maxfreq(array(xxhash64(text), doc_id, doc_id))")
        .as("m"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[maxfreql.*"),
      s"expected maxfreq inside a WholeStageCodegen Project in:\n$plan")
    assert(df.agg(max("m")).collect().head.getLong(0) >= 2L)
  }
}
