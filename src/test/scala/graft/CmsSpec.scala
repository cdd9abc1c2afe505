package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Cms

/** Count-min sketch contract: estimates never undercount, are exact
  * when the sketch is collision-free, and the q118 audit verdicts hold.
  */
class CmsSpec extends AnyFunSuite with SparkSpec {

  test("estimate >= exact for every key (overcount-only invariant)") {
    import spark.implicits._
    // zipfian-ish: key i appears i times, 1..80
    val occurrences = (1 to 80).flatMap(i => Seq.fill(i)(s"key-$i"))
      .toDF("k")
    val sk = Cms.build(occurrences, "k", d = 2, log2w = 6) // tiny: forces collisions
    val exact = occurrences.groupBy(col("k")).agg(count(lit(1)).as("c"))
    val under = exact.crossJoin(broadcast(sk))
      .filter(Cms.estimate(col("cms"), col("k"), d = 2, log2w = 6)
        < col("c"))
      .count()
    assert(under === 0L)
  }

  test("collision-free sketch is exact") {
    import spark.implicits._
    val occurrences = (1 to 50).flatMap(i => Seq.fill(i)(s"key-$i"))
      .toDF("k")
    // 2^16 cells for 50 keys: astronomically unlikely to collide in
    // all 4 rows — the min must equal the exact count
    val sk = Cms.build(occurrences, "k")
    val exact = occurrences.groupBy(col("k")).agg(count(lit(1)).as("c"))
    val wrong = exact.crossJoin(broadcast(sk))
      .filter(Cms.estimate(col("cms"), col("k")) =!= col("c"))
      .count()
    assert(wrong === 0L)
  }

  test("weighted build equals occurrence build") {
    import spark.implicits._
    val occurrences = (1 to 40).flatMap(i => Seq.fill(i)(s"key-$i"))
      .toDF("k")
    val weighted = occurrences.groupBy(col("k"))
      .agg(count(lit(1)).as("w"))
    val sk1 = Cms.build(occurrences, "k")
    val sk2 = Cms.build(weighted, "k", weight = col("w"))
    // same sketch content: every probe agrees
    val diff = occurrences.select(col("k")).distinct()
      .crossJoin(broadcast(sk1.select(col("cms").as("c1"))))
      .crossJoin(broadcast(sk2.select(col("cms").as("c2"))))
      .filter(Cms.estimate(col("c1"), col("k"))
        =!= Cms.estimate(col("c2"), col("k")))
      .count()
    assert(diff === 0L)
  }

  test("merged batch sketches probe identically to the monolithic build") {
    import spark.implicits._
    val occ = (1 to 60).flatMap(i => Seq.fill(i)(s"key-$i")).toDF("k")
    val whole = Cms.build(occ, "k").select(col("cms").as("cw"))
    val parts = (0 until 3).map(p => // pmod: xxhash64 is signed
      Cms.build(occ.filter(pmod(xxhash64(col("k")), lit(3)) === p), "k"))
    val merged = parts(0).select(col("cms").as("c0"))
      .crossJoin(parts(1).select(col("cms").as("c1")))
      .crossJoin(parts(2).select(col("cms").as("c2")))
      .select(Cms.merge(Cms.merge(col("c0"), col("c1")), col("c2"))
        .as("cm"))
    val diff = occ.select(col("k")).distinct()
      .crossJoin(broadcast(whole)).crossJoin(broadcast(merged))
      .filter(Cms.estimate(col("cw"), col("k"))
        =!= Cms.estimate(col("cm"), col("k")))
      .count()
    assert(diff === 0L)
  }

  test("q121 merge-audit verdicts are all true at test sf") {
    val rows = SparkEntry.queries("q121_sketch_merge_audit")(spark, sf)
      .collect()
    assert(rows.length === 20)
    assert(rows.forall(_.getBoolean(2)), "a merge-equality verdict failed")
  }

  test("q118 audit verdicts are all true at test sf") {
    val out = SparkEntry.queries("q118_cms_heavyhitters")(spark, sf)
    val rows = out.collect()
    assert(rows.length === 20)
    assert(rows.forall(_.getBoolean(2)), "a CMS bound verdict failed")
  }
}
