package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bloom

/** Bloom build/probe contract: no false negatives ever, false-positive
  * rate within the configured bound, and the q116 prefilter+confirm
  * composition equal to the plain exact join.
  */
class BloomSpec extends AnyFunSuite with SparkSpec {

  test("no false negatives: every built key passes mightContain") {
    import spark.implicits._
    val keys = (1 to 2000).map(i => s"member-$i").toDF("k")
    val blm = Bloom.build(keys, "k")
    val misses = keys.crossJoin(broadcast(blm))
      .filter(!Bloom.mightContain(col("bloom"), col("k")))
      .count()
    assert(misses === 0L)
  }

  test("false-positive rate on non-members is within bound") {
    import spark.implicits._
    val keys = (1 to 2000).map(i => s"member-$i").toDF("k")
    val blm = Bloom.build(keys, "k")
    val probes = (1 to 20000).map(i => s"outsider-$i").toDF("k")
    val fps = probes.crossJoin(broadcast(blm))
      .filter(Bloom.mightContain(col("bloom"), col("k")))
      .count()
    // m=2^20 bits, k=4, n=2000 -> theoretical fp ~ (nk/m)^k ~ 3.4e-9;
    // allow lots of slack (0.1%) so the assert tests the mechanism, not
    // the exact formula
    assert(fps <= 20L, s"false-positive count $fps above bound")
  }

  test("smaller m raises fp rate but never introduces false negatives") {
    import spark.implicits._
    val keys = (1 to 2000).map(i => s"member-$i").toDF("k")
    val blm = Bloom.build(keys, "k", log2m = 12, k = 2)
    val misses = keys.crossJoin(broadcast(blm))
      .filter(!Bloom.mightContain(col("bloom"), col("k"), log2m = 12, k = 2))
      .count()
    assert(misses === 0L)
    // a 4096-bit filter holding 2000 keys MUST false-positive a lot —
    // this guards against a probe that accidentally always returns false
    val fps = (1 to 5000).map(i => s"outsider-$i").toDF("k")
      .crossJoin(broadcast(blm))
      .filter(Bloom.mightContain(col("bloom"), col("k"), log2m = 12, k = 2))
      .count()
    assert(fps > 100L, s"fp count $fps implausibly low for a saturated filter")
  }

  test("union of batch filters equals the filter of the union") {
    import spark.implicits._
    val a = (1 to 1000).map(i => s"member-$i").toDF("k")
    val b = (800 to 1800).map(i => s"member-$i").toDF("k")
    val u = Bloom.build(a.union(b), "k").select(col("bloom").as("bu"))
    val merged = Bloom.build(a, "k").select(col("bloom").as("ba"))
      .crossJoin(Bloom.build(b, "k").select(col("bloom").as("bb")))
      .select(Bloom.union(col("ba"), col("bb")).as("bm"))
    // bitwise identity, not just probe agreement: compare every word
    val words = u.crossJoin(merged)
      .select(explode(zip_with(col("bu"), col("bm"),
        (x, y) => (x =!= y).cast("int"))).as("w"))
      .agg(sum(col("w"))).collect()(0).getLong(0)
    assert(words === 0L)
  }

  test("q116 bloom prefilter + confirm equals the plain exact join") {
    val q = SparkEntry.queries("q116_bloom_decontam")(spark, sf)
    val docs = Tables.documents(spark, sf)
    val sh = graft.functions.Text.wordShingles(docs, "doc_id", "text", 8)
    val test = sh.filter(col("doc_id") % 10 === 0).select("sh").distinct()
    val exact = sh.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id").as("train_id"), col("sh"))
      .join(test, "sh")
      .groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_bad_grams"))
    assert(q.exceptAll(exact).isEmpty && exact.exceptAll(q).isEmpty)
    assert(q.count() > 0)
  }
}
