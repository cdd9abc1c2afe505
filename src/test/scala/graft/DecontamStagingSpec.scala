package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q186's dedup-staged default (VERDICT r6 #3) must be bit-identical to
  * the unstaged batch × pool pass — including when exact-duplicate
  * vector families exist on both sides of the eval/train split (the
  * clone-corpus adversary the staging removes).
  */
class DecontamStagingSpec extends AnyFunSuite with SparkSpec {

  private def runQ186(dir: String, raw: Boolean): Set[(Long, Long, Long, Boolean)] = {
    // pin the path explicitly: the default is now COST-BASED (VERDICT
    // r8 #1 — decontamLowDup picks raw on clone-free corpora), so the
    // equality tests must force the staged plan to actually cover it
    if (raw) spark.conf.set("spark.graft.vector.rawDecontam", "true")
    else spark.conf.set("spark.graft.vector.stagedDecontam", "true")
    try {
      queries.VectorQueries.queries("q186_semantic_decontam")(spark, dir)
        .select("eval_id", "train_id", "dot", "contaminated")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3)))
        .toSet
    } finally {
      spark.conf.unset("spark.graft.vector.rawDecontam")
      spark.conf.unset("spark.graft.vector.stagedDecontam")
    }
  }

  test("staged q186 equals raw q186 on sf0.001") {
    val staged = runQ186(sf, raw = false)
    val raw = runQ186(sf, raw = true)
    assert(staged == raw)
    assert(staged.nonEmpty)
  }

  test("staged q186 equals raw q186 on a clone corpus with duplicate vectors") {
    // 4 copies of every embedding with shifted ids: families straddle
    // the eval/train hash split, so eval members must inherit their
    // canonical's verdict and identical train vectors must still win
    // ties by MIN raw id (= the family canonical).
    val dir = "/tmp/graft-test-vclone4"
    val e = Tables.embeddings(spark, sf)
    (0 until 4).map(i => e.withColumn("vec_id",
        col("vec_id") * 10 + lit(i.toLong)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val staged = runQ186(dir, raw = false)
    val raw = runQ186(dir, raw = true)
    assert(staged == raw)
    assert(staged.nonEmpty)
  }

  test("cost probe: raw on the clone-free corpus, staged on the clone corpus") {
    // the VERDICT r8 #1 branch itself: sf0.001 embeddings carry ~no
    // exact-duplicate vectors (families all size 1 → low-dup → raw
    // plan); the 4× clone corpus is 75% non-canonical → staged plan
    assert(queries.VectorQueries.decontamLowDup(spark, sf),
      "clone-free corpus must take the raw (unstaged) plan")
    assert(!queries.VectorQueries.decontamLowDup(spark,
        "/tmp/graft-test-vclone4"),
      "clone corpus must take the dedup-staged plan")
  }
}
