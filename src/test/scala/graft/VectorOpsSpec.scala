package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Vectors

class VectorOpsSpec extends AnyFunSuite with SparkSpec {

  test("cosine: orthogonal = 0, identical = 1, opposite = -1") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1f, 0f), Array(0f, 1f)),
      (2L, Array(1f, 0f), Array(1f, 0f)),
      (3L, Array(1f, 2f), Array(-1f, -2f))
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), Vectors.cosine("a", "b").as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 0.0)
    assert(math.abs(got(2L) - 1.0) < 1e-12)
    assert(math.abs(got(3L) + 1.0) < 1e-12)
  }

  test("signBucket maps sign pattern to expected bits") {
    import spark.implicits._
    val df = Seq((1L, Array(1f, -1f, 1f, -1f))).toDF("id", "a")
    val b = df.select(Vectors.signBucket("a", 4).as("b"))
      .collect().head.getInt(0)
    assert(b == (1 | 4)) // dims 1 and 3 non-negative -> bits 0 and 2
  }

  test("dotf matches the fold formulation bit-for-bit on real embeddings") {
    val e = Tables.embeddings(spark, sf).limit(200)
    val q = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"))
    val both = e.crossJoin(broadcast(q)).select(
      expr(Vectors.dotExpr("embedding", "qe")).as("native"),
      expr(Vectors.foldDotExpr("embedding", "qe")).as("fold"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0))
        == java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native=${r.getDouble(0)} fold=${r.getDouble(1)}")
    }
  }

  test("dotf NULL semantics: mismatched lengths and null elements") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1f, 2f), Array(3f, 4f)),
      (2L, Array(1f, 2f, 3f), Array(1f, 1f)) // length mismatch -> NULL
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), expr("dotf(a, b)").as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getDouble(1)))).toMap
    assert(got(1L).contains(11.0))
    assert(got(2L).isEmpty)
    val withNullElem = spark.sql(
      "SELECT dotf(array(CAST(1 AS FLOAT), CAST(NULL AS FLOAT)), " +
        "array(CAST(1 AS FLOAT), CAST(1 AS FLOAT))) AS d")
    assert(withNullElem.collect().head.isNullAt(0))
  }

  test("ann bucket search returns subset of brute-force ranking") {
    val brute = SparkEntry.queries("q28_cosine_topk")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ann = SparkEntry.queries("q29_ann_bucket")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ann.nonEmpty)
    // ANN candidates are genuine vectors, ranked by the same cosine;
    // sanity: no overlap requirement (random data), but scores must be <= 1
    val maxCos = SparkEntry.queries("q29_ann_bucket")(spark, sf)
      .agg(max("cosine")).collect().head.getDouble(0)
    assert(maxCos <= 1.0 + 1e-9)
    assert(brute.size == 10)
  }
}
