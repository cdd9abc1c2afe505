package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.RewriteWindowTopK

/** The full custom-operator stack end-to-end. GraftExtensions is active
  * in the shared test session (Engine.session sets the static conf when
  * it creates this JVM's context), so the rewrite is toggled via its
  * kill-switch conf to obtain a genuine native-path baseline.
  */
class TopKPlanSpec extends AnyFunSuite with SparkSpec {

  test("window top-k rewrites to TopKPerGroupExec and matches the native path") {
    // native baseline with the rewrite disabled
    spark.conf.set(RewriteWindowTopK.EnabledConf, "false")
    val (expected, nativePlan) =
      try {
        val df = SparkEntry.queries("q18_topk_per_group")(spark, sf)
        (df.collect().map(_.toSeq).toSet,
          df.queryExecution.executedPlan.toString)
      } finally spark.conf.set(RewriteWindowTopK.EnabledConf, "true")
    assert(expected.nonEmpty)
    assert(nativePlan.contains("WindowGroupLimit"),
      s"kill switch must restore the native path:\n$nativePlan")

    val df = SparkEntry.queries("q18_topk_per_group")(spark, sf)
    // physical nodes render without the Exec suffix
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup "),
      s"expected custom exec in plan:\n$plan")
    assert(!plan.contains("WindowGroupLimit") && !plan.contains("Window ["),
      s"native window path should have been replaced:\n$plan")
    val got = df.collect().map(_.toSeq).toSet
    assert(got == expected)
  }

  test("rewrite bails on global (no PARTITION BY) top-k") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val df = Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    // must not crash on ClusteredDistribution(Nil); native path answers
    assert(df.count() == 3)
    assert(!df.queryExecution.executedPlan.toString
      .contains("TopKPerGroup "))
  }

  test("TopKAgg rejects k <= 0 at construction, not executor-side") {
    intercept[IllegalArgumentException](new graft.operators.TopKAgg(0))
    intercept[IllegalArgumentException](new graft.operators.TopKAgg(-1))
  }
}
