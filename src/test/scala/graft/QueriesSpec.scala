package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Smoke + invariant checks for every SparkEntry query on sf0.001.
  * (Exact value parity vs DuckDB runs via tools/check_parity.py and the
  * driver's own gate; here we assert structural invariants.)
  */
class QueriesSpec extends AnyFunSuite with SparkSpec {

  test("every query runs and every query has an oracle") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      // every query is non-empty even at smoke scale (verified against
      // the sf0.001 dumps) — an empty result is a regression
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
    }
    val missing = qs.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q124 classifier: keep tracks the score sign, scoring is " +
    "deterministic, and every doc is scored") {
    val out = SparkEntry.queries("q124_quality_classifier")(spark, sf)
    val rows = out.collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getBoolean(2) == (r.getLong(1) >= 0L))
    }
    val again = SparkEntry.queries("q124_quality_classifier")(spark, sf)
      .collect()
    assert(rows.map(_.toString).sorted.toSeq
      == again.map(_.toString).sorted.toSeq)
  }

  test("q22 exact md5 trigram mode emits the same pairs as xxhash64") {
    def pairs(): Set[String] =
      SparkEntry.queries("q22_ngram_jaccard")(spark, sf)
        .collect().map(_.mkString("|")).toSet
    val hashed = pairs()
    spark.conf.set("spark.graft.text.exactTrigrams", "true")
    try assert(pairs() == hashed && hashed.nonEmpty)
    finally spark.conf.unset("spark.graft.text.exactTrigrams")
  }

  test("q05 dedup output is unique per (user_id, event_type)") {
    val df = SparkEntry.queries("q05_dedup_keep_latest")(spark, sf)
    assert(df.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("q07 scd2 image has exactly one open row per updated employee") {
    val df = SparkEntry.queries("q07_scd2_closeout")(spark, sf)
    // every emp has at most one open 'Active' row from the dim side and
    // staging rows are open: per-emp open count is >= 1
    val open = df.filter(col("end_date").isNull)
    assert(open.count() > 0)
    assert(df.filter(col("status") === "Inactive" && col("end_date").isNull)
      .count() == 0)
  }

  test("q08 upsert output is unique per key") {
    val df = SparkEntry.queries("q08_upsert")(spark, sf)
    assert(df.groupBy("emp_id").count().filter(col("count") > 1).count() == 0)
  }

  test("q13 working days <= days in month") {
    val df = SparkEntry.queries("q13_working_days")(spark, sf)
    assert(df.filter(col("working_days") > 23).count() == 0)
    assert(df.count() == 12)
  }
}
