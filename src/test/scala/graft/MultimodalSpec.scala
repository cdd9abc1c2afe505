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

  test("frame sampling: every-k 100-byte stripes, short last frame") {
    import spark.implicits._
    val docs = Seq((1L, "a" * 250)).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(spark,
        Multimodal.toAssets(spark, docs), everyK = 2)
      .collect().sortBy(_.frame_idx)
    // 250 bytes -> frames 0,1,2; sampled every 2nd -> idx 0 and 2
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(frames(0).frame.length == 100)
    assert(frames(1).frame.length == 50) // tail stripe is short
  }

  test("frame sampling rejects non-positive stride") {
    import spark.implicits._
    val assets = Multimodal.toAssets(spark,
      Seq((1L, "x")).toDF("doc_id", "text"))
    intercept[IllegalArgumentException] {
      Multimodal.sampleFrames(spark, assets, everyK = 0)
    }
  }

  test("resize: payload becomes exactly w*h bytes, space-padded") {
    import spark.implicits._
    val docs = Seq((1L, "ab"), (2L, "y" * 50)).toDF("doc_id", "text")
    val out = Multimodal.resize(spark,
        Multimodal.toAssets(spark, docs), w = 4, h = 5)
      .collect().map(a => a.doc_id -> a.payload).toMap
    assert(out(1L).length == 20 && out(2L).length == 20)
    assert(new String(out(1L)) == "ab" + " " * 18) // pad
    assert(new String(out(2L)) == "y" * 20)        // truncate
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
