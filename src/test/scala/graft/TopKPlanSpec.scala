package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{RewriteWindowTopK, TopKStrategy}

/** The full custom-operator stack end-to-end, registered through the
  * public `spark.experimental` hooks (the `spark.sql.extensions` path is
  * exercised in its own JVM via `graft.plans.GraftExtensions` — static
  * conf can't attach to an already-running context): the q18 window
  * -top-k idiom is rewritten to the bounded-heap TopKPerGroupExec and
  * produces results identical to the built-in window path.
  */
class TopKPlanSpec extends AnyFunSuite with SparkSpec {

  test("window top-k rewrites to TopKPerGroupExec and matches window results") {
    val expected = SparkEntry.queries("q18_topk_per_group")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(expected.nonEmpty)

    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteWindowTopK
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ TopKStrategy
    try {
      val df = SparkEntry.queries("q18_topk_per_group")(spark, sf)
      // physical nodes render without the Exec suffix
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroup "),
        s"expected custom exec in plan:\n$plan")
      assert(!plan.contains("WindowGroupLimit") && !plan.contains("Window ["),
        s"native window path should have been replaced:\n$plan")
      val got = df.collect().map(_.toSeq).toSet
      assert(got == expected)
    } finally {
      spark.experimental.extraOptimizations = spark.experimental
        .extraOptimizations.filterNot(_ == RewriteWindowTopK)
      spark.experimental.extraStrategies = spark.experimental
        .extraStrategies.filterNot(_ == TopKStrategy)
    }
  }
}
