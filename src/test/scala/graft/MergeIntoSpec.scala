package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.kv.{KVDeltaCatalog, KVStore}
import graft.operators.Merge

/** Parity: the engine-native `Dataset.mergeInto` backend
  * (Merge.upsertMergeInto, executed through the test-scope delta-capable
  * KVDeltaCatalog) produces the SAME final image as the join+union
  * backend (Merge.upsert) — Spark 4's row-level MERGE as an alternate
  * J4 implementation, per the round-4 brief.
  */
class MergeIntoSpec extends AnyFunSuite with SparkSpec {

  private def withKvTable[A](name: String, ddl: String, keys: String)(
      f: String => A): A = {
    spark.conf.set("spark.sql.catalog.kv", classOf[KVDeltaCatalog].getName)
    val fq = s"kv.ns.$name"
    spark.sql(s"CREATE TABLE $fq ($ddl) TBLPROPERTIES ('keys'='$keys')")
    try f(fq) finally {
      spark.sql(s"DROP TABLE $fq")
    }
  }

  test("mergeInto upsert image equals join+union upsert image") {
    import spark.implicits._
    val dim = Seq((1L, "alice", 100.0), (2L, "bob", 200.0),
      (3L, "carol", 300.0)).toDF("id", "name", "salary")
    val staging = Seq((2L, "bob", 250.0), (4L, "dave", 400.0))
      .toDF("id", "name", "salary")

    val expected = Merge.upsert(dim, staging, Seq("id"))
      .orderBy("id").collect().toSeq

    withKvTable("emp", "id BIGINT, name STRING, salary DOUBLE", "id") { fq =>
      KVStore.seed(fq.stripPrefix("kv."),
        dim.collect().toIndexedSeq)
      Merge.upsertMergeInto(staging, fq, Seq("id"))
      val got = spark.table(fq).orderBy("id").collect().toSeq
      assert(got == expected)
    }
  }

  test("mergeInto with composite key and no-op staging row") {
    import spark.implicits._
    val dim = Seq((1L, "a", 10L), (1L, "b", 20L), (2L, "a", 30L))
      .toDF("emp_id", "code", "quota")
    // (1,b) updated in place, (3,c) inserted, (1,a) rewritten identical
    val staging = Seq((1L, "b", 25L), (3L, "c", 99L), (1L, "a", 10L))
      .toDF("emp_id", "code", "quota")

    val expected = Merge.upsert(dim, staging, Seq("emp_id", "code"))
      .orderBy("emp_id", "code").collect().toSeq

    withKvTable("quota", "emp_id BIGINT, code STRING, quota BIGINT",
      "emp_id,code") { fq =>
      KVStore.seed(fq.stripPrefix("kv."), dim.collect().toIndexedSeq)
      Merge.upsertMergeInto(staging, fq, Seq("emp_id", "code"))
      val got = spark.table(fq).orderBy("emp_id", "code").collect().toSeq
      assert(got == expected)
    }
  }

  test("delete-when-matched clears only matched keys") {
    import spark.implicits._
    val dim = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "v")
    val doomed = Seq((2L, "ignored")).toDF("id", "v")
    withKvTable("del", "id BIGINT, v STRING", "id") { fq =>
      KVStore.seed(fq.stripPrefix("kv."), dim.collect().toIndexedSeq)
      doomed.alias("__stg")
        .mergeInto(fq, col("del.id") === col("__stg.id"))
        .whenMatched().delete()
        .merge()
      val got = spark.table(fq).orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == Seq((1L, "x"), (3L, "z")))
    }
  }
}
