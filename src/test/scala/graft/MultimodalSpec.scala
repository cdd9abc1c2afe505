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

  test("PPM codec round-trips real pixels through the Spark plumbing") {
    import spark.implicits._
    // 2x2 image: red, green / blue, white
    val px = Array[Byte](
      -1, 0, 0,    0, -1, 0,
      0, 0, -1,   -1, -1, -1)
    val payload = Multimodal.Ppm.encode(2, 2, px)
    val decoded = Multimodal.Ppm.decode(payload)
    assert(decoded.exists { case (w, h, b) =>
      w == 2 && h == 2 && b.sameElements(px) })
    // comments + extra whitespace in the header are part of the format
    val weird = ("P6\n# a comment\n 2\t2\n255\n").getBytes("US-ASCII") ++ px
    assert(Multimodal.Ppm.decode(weird).exists(_._3.sameElements(px)))
    // an oversized dimension token must reject, not wrap to a small
    // int (4294967297 wraps to 1 in 32-bit arithmetic)
    val huge = "P6\n4294967297 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0)
    assert(Multimodal.Ppm.decode(huge).isEmpty)
    // the single byte after maxval must be whitespace: "255X" + raster
    // would otherwise read the raster from the wrong offset (silently
    // shifted pixels) instead of rejecting
    val badSep = "P6\n1 1\n255X".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3)
    assert(Multimodal.Ppm.decode(badSep).isEmpty)
    // truncated right after maxval (no separator byte at all)
    assert(Multimodal.Ppm.decode("P6\n1 1\n255".getBytes("US-ASCII")).isEmpty)
    // through Spark: PpmDecoder reads dims from the HEADER, and a
    // malformed payload is dropped, not crashed on
    val assets = Seq(
      Multimodal.Asset(1L, "image/x-portable-pixmap", payload),
      Multimodal.Asset(2L, "image/x-portable-pixmap",
        "not an image".getBytes)).toDS()
    val feats = Multimodal.extractFeatures(spark, assets,
      Multimodal.PpmDecoder).collect()
    assert(feats.map(_.doc_id).toSeq == Seq(1L))
    assert(feats.head.width == 2 && feats.head.height == 2)
  }

  test("resizePpm resamples real pixels (nearest neighbor)") {
    import spark.implicits._
    // 2x1 image: left red, right green -> upscale to 4x2
    val payload = Multimodal.Ppm.encode(2, 1,
      Array[Byte](-1, 0, 0, 0, -1, 0))
    val assets = Seq(Multimodal.Asset(7L, "image/x-portable-pixmap",
      payload)).toDS()
    val out = Multimodal.resizePpm(spark, assets, 4, 2).collect().head
    val Some((w, h, px)) = Multimodal.Ppm.decode(out.payload)
    assert(w == 4 && h == 2)
    // columns 0-1 sample source pixel 0 (red), columns 2-3 pixel 1
    // (green), identical in both rows
    for (y <- 0 until 2; x <- 0 until 4) {
      val i = (y * 4 + x) * 3
      val expected: Seq[Byte] =
        if (x < 2) Seq[Byte](-1, 0, 0) else Seq[Byte](0, -1, 0)
      assert(Seq(px(i), px(i + 1), px(i + 2)) == expected, s"($x,$y)")
    }
    // features downstream see the new dims
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.resizePpm(spark, assets, 4, 2),
      Multimodal.PpmDecoder).collect().head
    assert(feats.width == 4 && feats.height == 2)
    // non-PPM payloads pass through untouched
    val raw = Seq(Multimodal.Asset(8L, "text/plain",
      "hello".getBytes)).toDS()
    val passed = Multimodal.resizePpm(spark, raw, 4, 2).collect().head
    assert(new String(passed.payload) == "hello")
  }

  test("dHash: clones collide, edits diverge, and the hash is " +
    "invariant under a real 2x nearest-neighbor upscale") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog " * 6),
      (2L, "the quick brown fox jumps over the lazy dog " * 6), // clone
      (3L, "a completely different document about spark engines " * 5))
      .toDF("doc_id", "text")
    val assets = Multimodal.imageAssets(spark, docs)
    // payloads are REAL P6 images the codec accepts
    assets.collect().foreach { a =>
      val dec = Multimodal.Ppm.decode(a.payload)
      assert(dec.exists { case (w, h, px) =>
        w == 16 && h == 16 && px.length == 768 })
    }
    val hs = Multimodal.dHash(spark, assets)
      .collect().map(i => i.doc_id -> i.dhash).toMap
    assert(hs(1L) == hs(2L), "identical docs must hash identically")
    assert(hs(1L) != hs(3L), "different docs must diverge")
    assert(hs.values.forall(_ >= 0L), "63-bit hash stays non-negative")
    // perceptual property: upscaling the image 2x leaves the hash
    // unchanged (floor(floor(2a)/2) == floor(a) through both samplers)
    val up = Multimodal.resizePpm(spark, assets, 32, 32)
    val hsUp = Multimodal.dHash(spark, up)
      .collect().map(i => i.doc_id -> i.dhash).toMap
    assert(hsUp == hs, "dHash must survive a 2x nearest-neighbor upscale")
  }

  test("audio fingerprints: window math, clone collision, and " +
    "amplitude-shift invariance (the point of the delta scheme)") {
    import spark.implicits._
    // deterministic pseudo-waveform long enough for several shingles
    val wave = (0 until 800).map(i => ((i * 37 + i * i % 53) % 94 + 32)
      .toChar).mkString
    val docs = Seq((1L, wave), (2L, wave), (3L, wave.reverse))
      .toDF("doc_id", "text")
    val sh = Multimodal.audioShingles(spark,
        Multimodal.toAssets(spark, docs)).collect()
    // window count: (800-64)/32+1 = 24 windows -> 23 sfs -> 16 shingles
    val byDoc = sh.groupBy(_.doc_id)
    assert(byDoc(1L).length == 16)
    assert(byDoc(1L).map(s => s.idx -> s.key).toMap
      == byDoc(2L).map(s => s.idx -> s.key).toMap,
      "clones must fingerprint identically")
    assert(byDoc(1L).map(_.key).toSet != byDoc(3L).map(_.key).toSet,
      "different content must diverge")
    // amplitude shift: +1 on every sample (no byte overflow: max 127)
    // cancels in the double delta, so fingerprints are identical
    val shifted = wave.map(c => (c + 1).toChar).mkString
    val sh2 = Multimodal.audioShingles(spark,
        Multimodal.toAssets(spark, Seq((9L, shifted))
          .toDF("doc_id", "text"))).collect()
    assert(sh2.map(s => s.idx -> s.key).toMap
      == byDoc(1L).map(s => s.idx -> s.key).toMap,
      "constant amplitude shift must not move the fingerprint")
    // too-short payloads emit nothing (need >= shingle+1 windows)
    val short = Multimodal.audioShingles(spark,
      Multimodal.toAssets(spark, Seq((5L, "x" * 300))
        .toDF("doc_id", "text"))).collect()
    assert(short.isEmpty)
  }

  test("Wav codec: encode/decode round-trips samples and rate exactly") {
    val s = Array.tabulate(200)(i =>
      ((i * 977) % 65536 - 32768).toShort)
    val bytes = Multimodal.Wav.encode(8000, s)
    assert(bytes.length == 44 + 400)
    val Some((rate, back)) = Multimodal.Wav.decode(bytes)
    assert(rate == 8000)
    assert(back.toSeq == s.toSeq)
    // empty waveform round-trips too
    assert(Multimodal.Wav.decode(Multimodal.Wav.encode(8000,
      Array.empty[Short])).exists(_._2.isEmpty))
  }

  test("Wav decode: malformed containers are rejected, unknown chunks " +
    "are walked over (RIFF padding rule included)") {
    val good = Multimodal.Wav.encode(8000, Array[Short](1, 2, 3, 4))
    // bad magic
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(Multimodal.Wav.decode(badMagic).isEmpty)
    // truncated data chunk (declared size exceeds payload)
    assert(Multimodal.Wav.decode(good.dropRight(2)).isEmpty)
    // non-PCM format code
    val nonPcm = good.clone(); nonPcm(20) = 3
    assert(Multimodal.Wav.decode(nonPcm).isEmpty)
    // stereo
    val stereo = good.clone(); stereo(22) = 2
    assert(Multimodal.Wav.decode(stereo).isEmpty)
    // an unknown ODD-sized chunk inserted before fmt must be skipped
    // with its pad byte (the RIFF even-boundary rule)
    val extra = new Array[Byte](8 + 3 + 1) // "junk" + 3 bytes + pad
    "junk".getBytes("US-ASCII").copyToArray(extra, 0)
    extra(4) = 3 // little-endian size 3
    val spliced = good.take(12) ++ extra ++ good.drop(12)
    // fix the RIFF size field (not checked by our walker, but honest)
    val Some((r2, s2)) = Multimodal.Wav.decode(spliced)
    assert(r2 == 8000 && s2.toSeq == Seq[Short](1, 2, 3, 4))
  }

  test("pcmShingles: DC-offset invariance on decoded samples, clone " +
    "collision, malformed payload drops") {
    import spark.implicits._
    def wavOf(id: Long, s: Array[Short]) =
      Seq(Multimodal.Asset(id, "audio/wav", Multimodal.Wav.encode(8000, s)))
        .toDS()
    val base = Array.tabulate(600)(i => ((i * 331) % 20000 - 10000).toShort)
    val shifted = base.map(v => (v + 500).toShort) // constant DC offset
    val fBase = Multimodal.pcmShingles(spark, wavOf(1L, base)).collect()
      .map(s => (s.idx, s.key)).sortBy(_._1)
    val fShift = Multimodal.pcmShingles(spark, wavOf(2L, shifted))
      .collect().map(s => (s.idx, s.key)).sortBy(_._1)
    assert(fBase.nonEmpty)
    assert(fBase.toSeq == fShift.toSeq,
      "constant DC offset must cancel in the energy double-difference")
    // exact clone collides on every shingle key
    val fClone = Multimodal.pcmShingles(spark, wavOf(3L, base)).collect()
      .map(s => (s.idx, s.key)).sortBy(_._1)
    assert(fClone.toSeq == fBase.toSeq)
    // a malformed payload drops silently
    val junk = Seq(Multimodal.Asset(4L, "audio/wav",
      Array.fill[Byte](100)(7))).toDS()
    assert(Multimodal.pcmShingles(spark, junk).collect().isEmpty)
  }

  test("Y4m codec: encode/decode round-trips dims and every frame " +
    "byte; FRAME markers with parameters are accepted") {
    val fs = Multimodal.Y4m.frameSize(8, 8)
    assert(fs == 96)
    val frames = (0 until 3).map(k =>
      Array.tabulate(fs)(j => ((k * 131 + j * 7) % 256).toByte))
    val bytes = Multimodal.Y4m.encode(8, 8, frames)
    val Some((w, h, back)) = Multimodal.Y4m.decode(bytes)
    assert(w == 8 && h == 8 && back.length == 3)
    back.zip(frames).foreach { case (a, b) =>
      assert(a.toSeq == b.toSeq)
    }
    // a frame marker carrying its own parameters still parses
    val s = new String(bytes, "ISO-8859-1")
    val withParams = s.replaceFirst("FRAME\n", "FRAME Ixyz\n")
      .getBytes("ISO-8859-1")
    val Some((_, _, back2)) = Multimodal.Y4m.decode(withParams)
    assert(back2.length == 3 && back2.head.toSeq == frames.head.toSeq)
  }

  test("Y4m decode: wrong magic, odd dims, truncated frames, and " +
    "missing FRAME markers are all rejected") {
    val fs = Multimodal.Y4m.frameSize(8, 8)
    val good = Multimodal.Y4m.encode(8, 8,
      Seq(Array.fill[Byte](fs)(1)))
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(Multimodal.Y4m.decode(badMagic).isEmpty)
    // odd width in the header
    val odd = new String(good, "ISO-8859-1")
      .replaceFirst("W8", "W7").getBytes("ISO-8859-1")
    assert(Multimodal.Y4m.decode(odd).isEmpty)
    // truncated frame payload
    assert(Multimodal.Y4m.decode(good.dropRight(1)).isEmpty)
    // frame data without its FRAME marker
    val noMarker = new String(good, "ISO-8859-1")
      .replaceFirst("FRAME\n", "").getBytes("ISO-8859-1")
    assert(Multimodal.Y4m.decode(noMarker).isEmpty)
    // encode rejects odd dims and wrong frame sizes up front
    intercept[IllegalArgumentException] {
      Multimodal.Y4m.encode(7, 8, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Multimodal.Y4m.encode(8, 8, Seq(Array.fill[Byte](10)(0)))
    }
  }

  test("Y4m decode: dims whose w*h*3 overflows Int (but w*h*3/2 fits " +
    "in Long) return None instead of crashing") {
    // w*h*3/2 = 1.35e9 < Int.MaxValue so the Long envelope passes, but
    // Int w*h*3 = 2.7e9 wraps negative — the crafted-payload crash
    // class: decode must hit the truncated-frame check and return None
    val crafted = ("YUV4MPEG2 W30000 H30000\nFRAME\n" + "x" * 64)
      .getBytes("US-ASCII")
    assert(Multimodal.Y4m.decode(crafted).isEmpty)
    // and a genuinely over-2GiB frame still trips the Long envelope
    val tooBig = "YUV4MPEG2 W65536 H65536\nFRAME\n".getBytes("US-ASCII")
    assert(Multimodal.Y4m.decode(tooBig).isEmpty)
    // frameSize itself now refuses the overflow loudly
    intercept[IllegalArgumentException] {
      Multimodal.Y4m.frameSize(65536, 65536)
    }
  }

  test("asset builders fail loudly on non-ASCII text — the ASCII-corpus " +
    "contract is enforced, not silently '?'-substituted") {
    import spark.implicits._
    val docs = Seq((1L, "café au lait " * 12)).toDF("doc_id", "text")
    def chain(t: Throwable): String = {
      var c = t; val sb = new StringBuilder
      while (c != null) {
        sb.append(Option(c.getMessage).getOrElse("")); c = c.getCause
      }
      sb.toString
    }
    Seq(
      () => Multimodal.imageAssets(spark, docs).collect(),
      () => Multimodal.wavAssets(spark, docs).collect(),
      () => Multimodal.y4mAssets(spark, docs).collect()
    ).foreach { run =>
      val ex = intercept[Throwable](run())
      assert(chain(ex).contains("ASCII-corpus contract"),
        s"expected the contract message, got: ${chain(ex)}")
    }
  }

  test("y4mFrameDigests: clone streams collide on every frame, short " +
    "docs are gated out, malformed payloads drop") {
    import spark.implicits._
    val body = ("alpha beta gamma delta " * 10).trim // > 96 chars
    val docs = Seq((1L, body), (2L, body), (3L, "short text"))
      .toDF("doc_id", "text")
    val dig = Multimodal.y4mFrameDigests(spark,
      Multimodal.y4mAssets(spark, docs)).collect()
    assert(dig.nonEmpty)
    assert(!dig.exists(_.doc_id == 3L), "sub-96-byte docs are gated")
    val byDoc = dig.groupBy(_.doc_id)
      .view.mapValues(_.map(d => (d.frame_idx, d.h)).sortBy(_._1).toSeq)
    assert(byDoc(1L) == byDoc(2L), "clones collide frame-for-frame")
    val junk = Seq(Multimodal.Asset(9L, "video/x-yuv4mpeg",
      Array.fill[Byte](200)(3))).toDS()
    assert(Multimodal.y4mFrameDigests(spark, junk).collect().isEmpty)
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
