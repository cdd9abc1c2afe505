package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Distinct, Project,
  Window => LWindow}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.graftaudit.PlanBridge

/** Generates PLANS.md: one row per query with the physical-plan facts
  * the 100 TB design cares about — shuffle count, join strategies,
  * whole-stage-codegen spans, and whether scan pushdown fired. The
  * committed file is the reviewable plan-audit artifact; PlanAuditSpec
  * asserts the load-bearing properties, this reports all of them.
  *
  * Usage: runMain graft.PlanReport [sfDir] [outFile]
  */
object PlanReport {

  /** Window-skew audit: for every Window operator in the optimized plan,
    * MEASURE the cardinality of its partition keys over the window's
    * actual input (via PlanBridge) and flag `LOW` when the key count is
    * below `spark.sql.shuffle.partitions` while the input is large
    * enough to care (>= 8x partitions rows) — the q110 class of bug
    * (running sums partitioned on a handful of sources serialize through
    * a handful of reducers at 100 TB), caught mechanically. Tiny
    * post-aggregation frames (q63's ~20-row cumulative share) are
    * exempt: a low-cardinality window over a low-cardinality input is
    * not a scale risk.
    */
  private def windowAudit(spark: SparkSession,
                          plan: org.apache.spark.sql.catalyst.plans
                            .logical.LogicalPlan): String = {
    // audit against the DEPLOY parallelism floor (32 = the project's
    // local standard), not this report session's core count — a window
    // keyed on 20 sources is a scale bug whether the report ran on 8
    // cores or 32
    val parts = math.max(32,
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
    val wins = plan.collect { case w: LWindow => w }
    if (wins.isEmpty) return "—"
    wins.map { w =>
      val cols =
        if (w.partitionSpec.isEmpty) "GLOBAL"
        else w.partitionSpec.map {
          case ne: NamedExpression => ne.name
          case e => e.nodeName
        }.mkString("+")
      try {
        val childRows = PlanBridge.ofRows(spark, w.child).count()
        val card =
          if (w.partitionSpec.isEmpty) 1L
          else {
            val named: Seq[NamedExpression] = w.partitionSpec.map {
              case ne: NamedExpression => ne
              case e => Alias(e, "p")()
            }
            PlanBridge.ofRows(spark, Distinct(Project(named, w.child)))
              .count()
          }
        if (cols.split("\\+").contains("__chunk"))
          // Prefix.runningSum's internal window: partitions are
          // quantile-chunked to ~n/spark.sql.shuffle.partitions rows by
          // construction (the same size contract as any shuffle
          // partition), so low MEASURED chunk cardinality at tiny sf is
          // quantile-boundary collapse, not the q110 single-reducer bug
          // the audit hunts.
          s"ok:$cols($card,chunk-bounded)"
        else if (card < parts && childRows >= 8L * parts)
          s"LOW:$cols($card keys/$childRows rows)"
        else s"ok:$cols($card)"
      } catch {
        case e: Throwable => s"?:$cols(${e.getClass.getSimpleName})"
      }
    }.mkString(" ")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = Engine.session("graft-plans", "8")
    // report the plans the bench/production posture actually runs:
    // shared artifacts materialized eagerly (unmaterialized cached
    // frames carry no stats, so the static plan shows BHJ→SMJ flips
    // that AQE undoes at runtime — noise for this report). PlanReport
    // executes every query anyway (collect + window audits), so
    // laziness buys nothing here.
    graft.queries.Shared.eagerBuilds = true
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.collect() // finalize the adaptive plan so codegen spans show
        val qe = df.queryExecution
        // count from the FINAL simple plan (each operator prints once;
        // the formatted explain of an executed AQE query repeats the
        // initial and final plans and double-counts)
        // keep only the final-plan section (AQE's rendering appends the
        // initial plan after "== Initial Plan ==", doubling every node)
        val simple = qe.executedPlan.toString
          .split("== Initial Plan ==").head
        def cnt(op: String): Int = simple.linesIterator
          .count(l => l.contains(op) && !l.contains("Reused"))
        val exchanges = cnt("Exchange hashpartitioning") +
          cnt("Exchange rangepartitioning") + cnt("Exchange SinglePartition")
        val joins = Seq("BroadcastHashJoin" -> "BHJ",
          "SortMergeJoin" -> "SMJ", "ShuffledHashJoin" -> "SHJ",
          "BroadcastNestedLoopJoin" -> "BNLJ")
          .collect { case (op, tag) if cnt(op) > 0 => s"$tag×${cnt(op)}" }
        val codegen = "\\*\\((\\d+)\\)".r
          .findAllMatchIn(simple).map(_.group(1)).toSet.size
        val pushed = simple.contains("PushedFilters: [") &&
          simple.linesIterator.exists(l =>
            l.contains("PushedFilters: [") && !l.contains("PushedFilters: []"))
        val winAudit = windowAudit(spark, qe.optimizedPlan)
        s"| $name | $exchanges | ${if (joins.isEmpty) "—"
          else joins.mkString(" ")} | $codegen | ${if (pushed) "yes"
          else "—"} | $winAudit |"
      } catch {
        case e: Throwable =>
          s"| $name | ERROR | ${e.getClass.getSimpleName} | | | |"
      }
    }
    // assembled without stripMargin: the table rows' leading `|` would
    // otherwise be consumed as margin markers
    val md = s"# PLANS — physical-plan audit of every query (sf=$sfDir)\n" +
      "\n" +
      "Generated by `runMain graft.PlanReport`. Columns: shuffle\n" +
      "exchanges in the plan; join strategies (BHJ broadcast-hash,\n" +
      "SMJ sort-merge, SHJ shuffled-hash, BNLJ broadcast-nested-loop);\n" +
      "whole-stage-codegen span count (from the executed plan); whether\n" +
      "any parquet scan has non-empty PushedFilters. Exchange counts are\n" +
      "pre-AQE static plans — AQE may further coalesce/convert at\n" +
      "runtime.\n" +
      "\n" +
      "window audit: per Window operator, MEASURED partition-key\n" +
      "cardinality over the window's actual input. `LOW:cols(k/n)` flags\n" +
      "a window whose key count is below spark.sql.shuffle.partitions\n" +
      "while its input has >= 8x partitions rows — the per-key\n" +
      "single-reducer class of bug (old q110). Tiny post-aggregation\n" +
      "frames are exempt by the row threshold.\n" +
      "\n" +
      "| query | exchanges | joins | codegen spans | pushdown | window audit |\n" +
      "|---|---|---|---|---|---|\n" +
      rows.mkString("\n") + "\n"
    Files.writeString(Paths.get(out), md)
    println(s"wrote $out (${rows.size} queries)")
    spark.stop()
  }
}
