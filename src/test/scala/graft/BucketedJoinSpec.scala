package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q223: the bucketed layout must make the fact-fact join
  * exchange-free AND sort-free, and the results must equal the raw
  * layout-independent join.
  */
class BucketedJoinSpec extends AnyFunSuite with SparkSpec {

  test("bucketed join plans with zero Exchange and zero Sort below " +
    "the join, and values match the raw join") {
    val q = SparkEntry.queries("q223_bucketed_join")
    // pin AQE + auto-broadcast off for the PLAN assertion: a 1.5k-row
    // orders side would otherwise legitimately broadcast, which hides
    // the property under test (at 100 TB neither side broadcasts)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = q(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // exactly one exchange: the post-join aggregation. The join
      // subtree reads pre-bucketed, pre-sorted scans directly.
      val joinSubtree = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSubtree.contains("Exchange"),
        s"join subtree must be exchange-free:\n$joinSubtree")
      assert(!joinSubtree.contains("+- Sort"),
        s"bucket sort order must be reused, not re-sorted:\n$joinSubtree")
      assert(plan.contains("SelectedBucketsCount"),
        "scans must be bucket-aware")
      // layout independence: same values as the raw parquet join
      val got = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val raw = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == raw && got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }
}
