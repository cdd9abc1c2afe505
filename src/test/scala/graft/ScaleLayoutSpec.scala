package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sinks

/** Storage-layout behaviors that carry the 100 TB design: directory-level
  * partition pruning and shuffle-free bucketed joins.
  */
class ScaleLayoutSpec extends AnyFunSuite with SparkSpec {

  test("partitioned write prunes directories on read") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-part").toString + "/t"
    val df = (1 to 100).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "kind")
    Sinks.overwritePartitioned(df, path, Seq("kind"))
    val read = spark.read.parquet(path).filter($"kind" === "a")
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(kind"),
      s"expected partition filters in:\n$scan")
    assert(read.count() == 50)
    // only the kind=a directory exists under the filter's file listing
    assert(new java.io.File(path).listFiles().map(_.getName)
      .count(_.startsWith("kind=")) == 2)
  }

  test("dynamic partition pruning: dim filter prunes the fact scan") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-dpp").toString + "/fact"
    // partition values round-trip through directory names as INT — the
    // dim key must match exactly, or the inserted cast defeats DPP
    val fact = (1 to 1000).map(i => (i.toLong, i % 10))
      .toDF("id", "part_key")
    Sinks.overwritePartitioned(fact, path, Seq("part_key"))
    // dim is filtered at runtime; the fact side has NO static filter on
    // part_key — only DPP can avoid scanning all 10 partitions. The
    // filtering side must itself be a file relation (DPP does not fire
    // for in-memory LocalRelations), matching the real dim-table shape.
    val dimPath = Files.createTempDirectory("graft-dpp").toString + "/dim"
    (0 to 9).map(i => (i, s"d$i")).toDF("dk", "name")
      .write.parquet(dimPath)
    val joined = spark.read.parquet(path)
      .join(spark.read.parquet(dimPath).filter($"name" === "d3"),
        $"part_key" === $"dk")
    // execute THIS frame (count() would plan a separate query), then
    // inspect the finalized adaptive plan for the pruning subquery
    assert(joined.collect().length == 100)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic partition pruning subquery in:\n$plan")
  }

  test("co-bucketed tables join without a shuffle") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "va")
      val b = (1 to 1000).map(i => (i.toLong, s"s$i")).toDF("k", "vb")
      Sinks.bucketedTable(a, "bkt_a", "k", 8)
      Sinks.bucketedTable(b, "bkt_b", "k", 8)
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 1000)
      // contrast: the same join over unbucketed data shuffles both sides
      val plain = a.join(b, "k")
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
