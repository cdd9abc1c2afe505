package graft

import org.apache.spark.sql.execution.ExplainMode

/** Prints the plan-budget numbers PlanAuditSpec pins — static
  * formatted-plan exchange and SortMergeJoin counts, each query
  * measured in ISOLATION (frame cache reset before construction, so
  * Spark's cacheManager can't substitute another query's registered
  * fragment and shift the counts — the numbers are reproducible in any
  * session regardless of what ran first).
  *
  * Usage: sbt "runMain graft.PlanBudget q195_lm_perplexity ..."
  * (all budget-worthy queries when none given). Copy the printed map
  * into PlanAuditSpec's `budgets` after a conscious plan change.
  */
object PlanBudget {
  def counts(spark: org.apache.spark.sql.SparkSession, name: String,
             sfDir: String): (Int, Int) = {
    graft.queries.Shared.resetFrames(spark)
    val p = SparkEntry.queries(name)(spark, sfDir).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    (p.linesIterator.count(_.matches("\\(\\d+\\) Exchange.*")),
      p.linesIterator.count(_.matches("\\(\\d+\\) SortMergeJoin.*")))
  }

  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-planbudget", "8")
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val (ex, smj) = counts(spark, n, sfDir)
      println(s"""      "$n" -> ($ex, $smj),""")
    }
    spark.stop()
  }
}
