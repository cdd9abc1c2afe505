package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  test("binary asset plumbing: encode -> partition decode -> features") {
    import spark.implicits._
    val docs = Seq((1L, "abcdef"), (2L, "x" * 250)).toDF("doc_id", "text")
    val assets = Multimodal.toAssets(spark, docs)
    assert(assets.schema("payload").dataType.typeName == "binary")
    val feats = Multimodal.extractFeatures(spark, assets)
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).n_bytes == 6 && feats(1L).frames == 1)
    assert(feats(2L).n_bytes == 250 && feats(2L).frames == 3)
    assert(feats(2L).width == 16 + 250 % 64)
  }

  test("decoder is pluggable (stub swap point)") {
    import spark.implicits._
    val custom = new Multimodal.Decoder {
      override def decode(assets: Iterator[Multimodal.Asset]) =
        assets.map(a => Multimodal.MediaFeatures(a.doc_id, -1, 0, 0, 0))
    }
    val docs = Seq((9L, "zz")).toDF("doc_id", "text")
    val out = Multimodal.extractFeatures(spark,
      Multimodal.toAssets(spark, docs), custom).collect()
    assert(out.head.n_bytes == -1)
  }
}
