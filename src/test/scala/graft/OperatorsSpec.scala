package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Merge, Scd2}

/** Unit semantics of the operator library on hand-built frames
  * (SURVEY.md §5 test strategy: dup keys, null end_date, tiebreaks).
  */
class OperatorsSpec extends AnyFunSuite with SparkSpec {

  test("Dedup.keepFirst keeps exactly one row per key, latest wins") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-01", "ACTIVE", 10L),
      (1L, "2024-01-01", "CANCELLED", 20L), // later serial wins
      (2L, "2024-01-02", "ACTIVE", 5L)
    ).toDF("emp_id", "date", "status", "serial")
    val out = Dedup.keepFirst(df, Seq("emp_id", "date"),
      Seq(col("serial").desc))
    assert(out.count() == 2)
    val r = out.filter(col("emp_id") === 1).select("status").collect()
    assert(r.map(_.getString(0)).toSeq == Seq("CANCELLED"))
  }

  test("Scd2.dedupOpenRows: one open row per key (max pref), closed pass") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("2024-05-01"), 100L), // closed — untouched
      (1L, None, 200L),
      (1L, None, 300L), // max salary open row wins
      (2L, None, 50L)
    ).toDF("emp_id", "end_date", "salary")
    val out = Scd2.dedupOpenRows(df, "emp_id", "end_date", "salary", "salary")
    assert(out.count() == 3)
    val open1 = out.filter(col("emp_id") === 1 && col("end_date").isNull)
    assert(open1.select("salary").collect().map(_.getLong(0)).toSeq == Seq(300L))
  }

  test("Merge.upsert: staging wins, dim survives, inserts appear") {
    import spark.implicits._
    val dim = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val staging = Seq((2L, "B"), (3L, "C")).toDF("k", "v")
    val out = Merge.upsert(dim, staging, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "a"), (2L, "B"), (3L, "C")))
  }

  test("Scd2.closeOutMerge: open rows closed by incoming min(start)") {
    import spark.implicits._
    val dim = Seq(
      (1L, "2024-01-01", None: Option[String], "Active"),
      (2L, "2024-01-01", None: Option[String], "Active")
    ).toDF("emp_id", "start_date", "end_date", "status")
      .withColumn("start_date", to_date(col("start_date")))
      .withColumn("end_date", to_date(col("end_date")))
    val staging = Seq((1L, "2024-06-01"), (1L, "2024-03-01"))
      .toDF("emp_id", "start_date")
      .withColumn("start_date", to_date(col("start_date")))
    val out = Scd2.closeOutMerge(dim, staging, "emp_id", "start_date",
      "end_date", "status")
    // emp 1: old row closed at min(2024-03-01), marked Inactive; two new
    // open rows; emp 2 untouched.
    assert(out.count() == 4)
    val closed = out.filter(col("emp_id") === 1 && col("status") === "Inactive")
      .select("end_date").collect()
    assert(closed.map(_.getDate(0).toString).toSeq == Seq("2024-03-01"))
    assert(out.filter(col("end_date").isNull && col("emp_id") === 1).count() == 2)
    assert(out.filter(col("emp_id") === 2 && col("status") === "Active"
      && col("end_date").isNull).count() == 1)
  }
}
