package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Components

/** Connected-components semantics on hand-built edge lists: chains
  * collapse transitively, components stay separate, direction of the
  * input pair doesn't matter, and non-convergence is an error (not a
  * silently wrong answer).
  */
class ComponentsSpec extends AnyFunSuite with SparkSpec {

  private def clusters(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(
        edges.toDF("a", "b"), "a", "b")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
  }

  test("chain A-B, B-C lands all three in min-id cluster") {
    val c = clusters(Seq((1L, 2L), (2L, 3L)))
    assert(c == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("disjoint components keep distinct min-id labels") {
    val c = clusters(Seq((5L, 6L), (10L, 11L), (11L, 12L)))
    assert(c == Map(5L -> 5L, 6L -> 5L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("edge direction is irrelevant (higher id first)") {
    val c = clusters(Seq((9L, 4L), (4L, 7L)))
    assert(c == Map(4L -> 4L, 7L -> 4L, 9L -> 4L))
  }

  test("long path needs multiple passes and still converges") {
    // path 1-2-...-100: fragments span partitions, exercises iteration
    val edges = (1L until 100L).map(i => (i, i + 1))
    val c = clusters(edges)
    assert(c.values.toSet == Set(1L))
    assert(c.keySet == (1L to 100L).toSet)
  }

  test("maxIter too small to converge throws, never returns wrong") {
    import spark.implicits._
    // a 100-chain cannot stabilize its label map in a single pass
    val edges = (1L until 100L).map(i => (i, i + 1)).toDF("a", "b")
    assertThrows[IllegalStateException] {
      Components.connectedComponents(edges, "a", "b", maxIter = 1).collect()
    }
  }

  test("giant star: 100k-vertex hub component fits in one task's memory") {
    import spark.implicits._
    // star around vertex 0: symmetrization lands ALL 100k edges of the
    // hub in a single partition (repartition by source), so the
    // partition-local union-find must hold a ~200k-entry map — the
    // worst per-task state a hot template/boilerplate cluster produces
    // at corpus scale. Must converge, label everything 0, not OOM.
    val n = 100000L
    val edges = spark.range(1, n + 1)
      .select(lit(0L).as("a"), col("id").as("b"))
    val out = Components.connectedComponents(edges, "a", "b")
    assert(out.filter(col("cluster") =!= 0L).limit(1).count() == 0)
    assert(out.count() == n + 1)
  }

  test("reliableCheckpoint requires a checkpoint dir, then works") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    assertThrows[IllegalArgumentException] {
      Components.connectedComponents(edges, "a", "b",
        reliableCheckpoint = true)
    }
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    val c = Components.connectedComponents(edges, "a", "b",
        reliableCheckpoint = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("maxIter <= 0 rejected up front") {
    import spark.implicits._
    val edges = Seq((1L, 2L)).toDF("a", "b")
    assertThrows[IllegalArgumentException] {
      Components.connectedComponents(edges, "a", "b", maxIter = 0)
    }
  }

  test("Auto (driver path) matches the distributed loop label-for-label") {
    import spark.implicits._
    val edges = (Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L),
      (9L, 4L), (4L, 7L)) ++ (20L until 60L).map(i => (i, i + 1)))
      .toDF("a", "b")
    val dist = Components.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val auto = Components.connectedComponentsAuto(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(auto == dist)
    assert(auto.nonEmpty)
  }

  test("Auto past driverCap falls back to the distributed loop, " +
    "same labels") {
    import spark.implicits._
    val edges = (1L until 50L).map(i => (i, i + 1)).toDF("a", "b")
    // cap below the edge count forces the distributed branch
    val out = Components.connectedComponentsAuto(edges, "a", "b",
        driverCap = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.toSet == Set(1L))
    assert(out.keySet == (1L to 50L).toSet)
  }
}
