package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted per partition.
  *
  * Two decoders share one trait: `FakeDecoder`, a clearly-marked
  * deterministic stub standing in for heavyweight codecs the container
  * lacks, and `PpmDecoder`, a REAL pure-JVM binary-PPM (P6) codec with
  * genuine header parsing and pixel resampling (`resizePpm`) — proving
  * the boundary with real bytes. The Spark-side plumbing (binary
  * column schema, partition-batched decode via `mapPartitions`, typed
  * output) is identical for both; a production deployment swaps in a
  * JNI/FFI codec and nothing else changes.
  *
  * Scale notes: payloads never enter a shuffle — decode is a narrow
  * mapPartitions straight off the columnar scan, and only small typed
  * features flow downstream. For 100 TB of media, pair with
  * `spark.sql.files.maxPartitionBytes` sizing so one partition's payload
  * batch fits executor memory.
  */
object Multimodal {

  case class Asset(doc_id: Long, mime: String, payload: Array[Byte])

  case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int,
                           height: Int, frames: Int)

  /** Decoder contract: one partition's assets in, features out. */
  trait Decoder extends Serializable {
    def decode(assets: Iterator[Asset]): Iterator[MediaFeatures]
  }

  /** STUB decoder — deterministic fake in place of a real codec (no
    * image/audio libraries in this container). Derives pseudo
    * width/height/frame-count from payload size.
    */
  object FakeDecoder extends Decoder {
    override def decode(assets: Iterator[Asset]): Iterator[MediaFeatures] =
      assets.map { a =>
        val n = a.payload.length
        MediaFeatures(a.doc_id, n, 16 + n % 64, 16 + n % 48, n / 100 + 1)
      }
  }

  /** Minimal binary PPM (P6) codec — a REAL image format in pure JVM
    * code, proving the `Decoder` trait boundary with real pixel bytes
    * (the container has no external codec libraries, but P6 needs
    * none: "P6\n<w> <h>\n255\n" + w*h RGB triplets).
    */
  object Ppm {
    def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == w * h * 3,
        s"P6 ${w}x$h needs ${w * h * 3} bytes, got ${rgb.length}")
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val out = java.util.Arrays.copyOf(header, header.length + rgb.length)
      System.arraycopy(rgb, 0, out, header.length, rgb.length)
      out
    }

    /** Parse a P6 payload: (width, height, rgb bytes), or None if the
      * payload is not a well-formed 8-bit P6 image. Handles the
      * format's whitespace/comment rules in the header.
      */
    def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      var p = 0
      def skipSpaceAndComments(): Unit = {
        var more = true
        while (more && p < bytes.length) {
          val c = bytes(p)
          if (c == ' ' || c == '\t' || c == '\n' || c == '\r') p += 1
          else if (c == '#') { while (p < bytes.length && bytes(p) != '\n') p += 1 }
          else more = false
        }
      }
      def int(): Int = {
        skipSpaceAndComments()
        // accumulate in Long: 32-bit wrap would let an oversized header
        // token (e.g. 4294967297 -> 1) parse as valid small dimensions
        var v = -1L
        while (p < bytes.length && bytes(p) >= '0' && bytes(p) <= '9') {
          v = math.min(math.max(v, 0L) * 10 + (bytes(p) - '0'),
            Int.MaxValue.toLong + 1)
          p += 1
        }
        if (v > Int.MaxValue) -1 else v.toInt
      }
      if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') None
      else {
        p = 2
        val w = int(); val h = int(); val maxv = int()
        // exactly ONE whitespace byte separates maxval from raster data —
        // and it must actually BE whitespace: "255X" followed by raster
        // would otherwise decode with the raster read from the wrong
        // offset (silently shifted pixels) instead of being rejected
        val sepOk = p < bytes.length && {
          val c = bytes(p)
          c == ' ' || c == '\t' || c == '\n' || c == '\r'
        }
        p += 1
        if (!sepOk || w <= 0 || h <= 0 || maxv != 255 ||
            w.toLong * h * 3 > Int.MaxValue ||
            bytes.length - p < w * h * 3) None
        else Some((w, h,
          java.util.Arrays.copyOfRange(bytes, p, p + w * h * 3)))
      }
    }
  }

  /** REAL pure-JVM RIFF/WAVE codec (16-bit mono PCM little-endian) —
    * the audio twin of [[Ppm]]: genuine container parsing (magic
    * checks, chunk walking with the RIFF even-byte padding rule,
    * fmt-chunk validation) so the audio pipeline exercises a real
    * decode boundary instead of treating payload bytes as the
    * waveform. encode() emits the canonical 44-byte-header file;
    * decode() walks chunks in order, skips unknown ones (LIST, cue…),
    * and returns (sampleRate, samples) only for well-formed
    * PCM/mono/16-bit payloads — anything else is None, the
    * malformed-drop contract [[PpmDecoder]] set.
    */
  object Wav {
    private def le16(out: Array[Byte], p: Int, v: Int): Unit = {
      out(p) = (v & 0xFF).toByte; out(p + 1) = ((v >> 8) & 0xFF).toByte
    }
    private def le32(out: Array[Byte], p: Int, v: Int): Unit = {
      le16(out, p, v & 0xFFFF); le16(out, p + 2, (v >>> 16) & 0xFFFF)
    }
    private def tag(out: Array[Byte], p: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (b, i) =>
        out(p + i) = b
      }

    def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      require(sampleRate > 0, s"bad sample rate $sampleRate")
      val dataSize = samples.length * 2
      val out = new Array[Byte](44 + dataSize)
      tag(out, 0, "RIFF"); le32(out, 4, 36 + dataSize); tag(out, 8, "WAVE")
      tag(out, 12, "fmt "); le32(out, 16, 16)
      le16(out, 20, 1) // PCM
      le16(out, 22, 1) // mono
      le32(out, 24, sampleRate)
      le32(out, 28, sampleRate * 2) // byte rate
      le16(out, 32, 2) // block align
      le16(out, 34, 16) // bits per sample
      tag(out, 36, "data"); le32(out, 40, dataSize)
      var i = 0
      while (i < samples.length) {
        le16(out, 44 + i * 2, samples(i) & 0xFFFF); i += 1
      }
      out
    }

    def decode(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
      def u16(p: Int): Int =
        (bytes(p) & 0xFF) | ((bytes(p + 1) & 0xFF) << 8)
      def u32(p: Int): Long =
        (u16(p).toLong) | (u16(p + 2).toLong << 16)
      def tagAt(p: Int, s: String): Boolean =
        bytes.length >= p + 4 &&
          s.getBytes("US-ASCII").zipWithIndex.forall { case (b, i) =>
            bytes(p + i) == b
          }
      if (bytes.length < 44 || !tagAt(0, "RIFF") || !tagAt(8, "WAVE"))
        return None
      var p = 12
      var rate = -1
      var fmtOk = false
      var data: Option[Array[Short]] = None
      while (p + 8 <= bytes.length && (data.isEmpty || !fmtOk)) {
        val size = u32(p + 4)
        if (size > bytes.length - p - 8) return None // truncated chunk
        val sz = size.toInt
        if (tagAt(p, "fmt ")) {
          // PCM(1), mono(1), 16-bit — anything else is out of contract
          if (sz < 16 || u16(p + 8) != 1 || u16(p + 10) != 1 ||
              u16(p + 22) != 16) return None
          rate = u32(p + 12).toInt
          if (rate <= 0) return None
          fmtOk = true
        } else if (tagAt(p, "data")) {
          if (sz % 2 != 0) return None
          val n = sz / 2
          val s = new Array[Short](n)
          var i = 0
          while (i < n) { s(i) = u16(p + 8 + i * 2).toShort; i += 1 }
          data = Some(s)
        }
        // RIFF chunks pad to an even boundary
        p += 8 + sz + (sz & 1)
      }
      if (fmtOk) data.map(s => (rate, s)) else None
    }
  }

  /** REAL pure-JVM YUV4MPEG2 (Y4M) codec — the video twin of [[Ppm]]
    * and [[Wav]]: genuine stream parsing (magic check, space-separated
    * stream parameters with required W/H, per-frame FRAME markers that
    * may carry their own parameters, exact 4:2:0 frame payload sizing)
    * so the video pipeline exercises a real container boundary.
    * decode() returns (w, h, frames) — each frame the raw
    * w·h·3/2-byte 4:2:0 planar payload — or None for anything
    * malformed: wrong magic, missing/odd dimensions, a frame without
    * its FRAME marker, or truncated frame data.
    */
  object Y4m {
    // w*h*3 can exceed Int range even when the final /2 fits, so the
    // product must be taken in Long before narrowing.
    def frameSize(w: Int, h: Int): Int = {
      val fs = w.toLong * h * 3 / 2
      require(fs <= Int.MaxValue, s"4:2:0 frame ${w}x$h exceeds 2GiB")
      fs.toInt
    }

    def encode(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0,
        s"4:2:0 needs positive even dims, got ${w}x$h")
      val fs = frameSize(w, h)
      frames.foreach(f => require(f.length == fs,
        s"frame must be $fs bytes, got ${f.length}"))
      val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n"
        .getBytes("US-ASCII")
      val marker = "FRAME\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length
        + frames.length * (marker.length + fs))
      System.arraycopy(header, 0, out, 0, header.length)
      var p = header.length
      frames.foreach { f =>
        System.arraycopy(marker, 0, out, p, marker.length)
        System.arraycopy(f, 0, out, p + marker.length, fs)
        p += marker.length + fs
      }
      out
    }

    def decode(bytes: Array[Byte])
        : Option[(Int, Int, Seq[Array[Byte]])] = {
      val magic = "YUV4MPEG2".getBytes("US-ASCII")
      if (bytes.length < magic.length ||
          !magic.indices.forall(i => bytes(i) == magic(i))) return None
      var p = magic.length
      var w = -1; var h = -1
      // stream parameters: space-separated tokens up to the newline
      while (p < bytes.length && bytes(p) != '\n') {
        if (bytes(p) == ' ') {
          p += 1
          if (p < bytes.length && (bytes(p) == 'W' || bytes(p) == 'H')) {
            val key = bytes(p); p += 1
            var v = 0L
            while (p < bytes.length && bytes(p) >= '0'
                && bytes(p) <= '9') {
              v = math.min(v * 10 + (bytes(p) - '0'),
                Int.MaxValue.toLong + 1)
              p += 1
            }
            if (v > Int.MaxValue) return None
            if (key == 'W') w = v.toInt else h = v.toInt
          }
        } else p += 1
      }
      if (p >= bytes.length || w <= 0 || h <= 0 || w % 2 != 0
          || h % 2 != 0 || w.toLong * h * 3 / 2 > Int.MaxValue)
        return None
      p += 1 // the stream-header newline
      val fs = frameSize(w, h)
      val marker = "FRAME".getBytes("US-ASCII")
      val frames = Seq.newBuilder[Array[Byte]]
      while (p < bytes.length) {
        if (bytes.length - p < marker.length ||
            !marker.indices.forall(i => bytes(p + i) == marker(i)))
          return None
        p += marker.length
        // frame parameters (if any) run to the newline
        while (p < bytes.length && bytes(p) != '\n') p += 1
        if (p >= bytes.length) return None
        p += 1
        if (bytes.length - p < fs) return None // truncated frame
        frames += java.util.Arrays.copyOfRange(bytes, p, p + fs)
        p += fs
      }
      Some((w, h, frames.result()))
    }
  }

  /** US-ASCII bytes of `text`, failing loudly on any non-ASCII char —
    * enforcing the asset builders' ASCII-corpus contract (see
    * [[y4mAssets]]) instead of silently '?'-substituting and breaking
    * oracle hash parity.
    */
  private def asciiBytes(text: String, who: String): Array[Byte] = {
    var i = 0
    while (i < text.length) {
      require(text.charAt(i) < 128,
        f"$who: non-ASCII char U+${text.charAt(i).toInt}%04X at index " +
          s"$i violates the ASCII-corpus contract (doc bytes would " +
          "diverge from the oracle's UTF-8 encode())")
      i += 1
    }
    text.getBytes("US-ASCII")
  }

  /** REAL-codec video materialization: each doc with ≥ 96 text bytes
    * becomes a genuine 8×8 4:2:0 Y4M stream of min(max(L div 96, 1), 8)
    * frames, frame k's 96 payload bytes cycling the text from offset
    * (k·96) mod L — deterministic, wraps at most once (L ≥ 96), so the
    * oracle reassembles each frame as two text substrings. Payloads
    * round-trip through [[Y4m.encode]]/[[Y4m.decode]].
    *
    * ASCII-corpus contract (shared with [[imageAssets]]/[[wavAssets]]):
    * bytes come from `getBytes("US-ASCII")` and the frame gate uses
    * UTF-16 `String.length`, while the DuckDB oracle uses UTF-8
    * `encode()` bytes and character `substr`/`len`. The two agree only
    * when every document is pure ASCII (1 char = 1 byte, no '?'
    * substitution) — true of the generated corpus and asserted where
    * the assets are built. Non-ASCII corpora need UTF-8 `getBytes` and
    * byte-length gating here to keep oracle hash parity.
    */
  def y4mAssets(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .filter(_._2.length >= 96)
      .mapPartitions(_.map { case (id, text) =>
        val tb = asciiBytes(text, "y4mAssets")
        val L = tb.length
        val nf = math.min(math.max(L / 96, 1), 8)
        val frames = (0 until nf).map { k =>
          Array.tabulate(96)(j => tb((k * 96 + j) % L))
        }
        Asset(id, "video/x-yuv4mpeg", Y4m.encode(8, 8, frames))
      })
  }

  case class FrameDigest(doc_id: Long, frame_idx: Int, h: String)

  /** Per-frame md5 digests over REAL decoded Y4M frames (the [[dHash]]
    * analog at frame grain): malformed payloads drop, payload bytes
    * never shuffle — decode runs per partition, only (doc_id, idx,
    * 32-char digest) rows leave.
    */
  def y4mFrameDigests(spark: SparkSession, assets: Dataset[Asset])
      : Dataset[FrameDigest] = {
    import spark.implicits._
    assets.mapPartitions(_.flatMap { a =>
      Y4m.decode(a.payload).iterator.flatMap { case (_, _, frames) =>
        frames.iterator.zipWithIndex.map { case (f, i) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          FrameDigest(a.doc_id, i,
            md.digest(f).map("%02x".format(_)).mkString)
        }
      }
    })
  }

  /** REAL-codec audio materialization (the [[imageAssets]] twin): each
    * doc becomes a genuine WAV file whose 16-bit samples derive from
    * adjacent text bytes — sample(i) = b(i)·256 + b((i+1) mod L) −
    * 32768, one sample per text byte (full dynamic range, whole doc
    * covered, replayable as integer SQL). Payloads round-trip through
    * [[Wav.encode]]/[[Wav.decode]], so downstream consumers exercise
    * the real container parse, not a bytes-are-samples stub.
    * ASCII-corpus contract: see [[y4mAssets]] — US-ASCII bytes match
    * the oracle's UTF-8 `encode()` only on a pure-ASCII corpus.
    */
  def wavAssets(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val tb = asciiBytes(text, "wavAssets")
        val s = new Array[Short](tb.length)
        var i = 0
        while (i < tb.length) {
          s(i) = (((tb(i) & 0xFF) << 8 |
            (tb((i + 1) % tb.length) & 0xFF)) - 32768).toShort
          i += 1
        }
        Asset(id, "audio/wav", Wav.encode(8000, s))
      })
  }

  /** Haitsma–Kalker energy-delta subfingerprints over REAL decoded PCM
    * samples (the [[audioShingles]] arithmetic lifted from raw payload
    * bytes to the decoded waveform): `win`-sample windows at `hop`
    * stride, 8 equal time bands, bit m set when the band-energy
    * difference increased vs the previous window — signed sample sums,
    * so a constant DC offset cancels in the double difference exactly
    * as amplitude shifts did at byte grain. Malformed WAV payloads
    * drop (the [[PpmDecoder]] contract); payloads never shuffle —
    * decode + fingerprint run per partition, only (doc_id, idx, key)
    * rows leave.
    */
  def pcmShingles(spark: SparkSession, assets: Dataset[Asset],
                  win: Int = 64, hop: Int = 32,
                  shingle: Int = 8): Dataset[AudioShingle] = {
    import spark.implicits._
    require(win > 0 && hop > 0 && shingle > 0 && win % 8 == 0,
      s"bad pcm framing: win=$win hop=$hop shingle=$shingle")
    val bands = 8
    val bw = win / bands
    assets.mapPartitions(_.flatMap { a =>
      Wav.decode(a.payload).iterator.flatMap { case (_, pcm) =>
        val nWin = if (pcm.length < win) 0 else (pcm.length - win) / hop + 1
        val en = Array.tabulate(nWin, bands) { (i, m) =>
          var s = 0L; var j = 0
          while (j < bw) { s += pcm(i * hop + m * bw + j); j += 1 }
          s
        }
        val sfs = (1 until nWin).map { i =>
          var v = 0; var m = 0
          while (m < bands - 1) {
            if ((en(i)(m) - en(i)(m + 1))
              - (en(i - 1)(m) - en(i - 1)(m + 1)) > 0) v |= 1 << m
            m += 1
          }
          v
        }
        (0 to sfs.length - shingle).iterator.map { k =>
          AudioShingle(a.doc_id, k, sfs.slice(k, k + shingle).mkString("-"))
        }
      }
    })
  }

  /** REAL decoder over the P6 codec: width/height come from the actual
    * image header, not the payload length. Malformed payloads are
    * dropped (the quarantine decision belongs to the caller's schema,
    * not the decode hot loop). Same trait, same plumbing as
    * [[FakeDecoder]] — swapping decoders changes nothing downstream,
    * which is the point of the boundary.
    */
  object PpmDecoder extends Decoder {
    override def decode(assets: Iterator[Asset]): Iterator[MediaFeatures] =
      assets.flatMap { a =>
        Ppm.decode(a.payload).map { case (w, h, _) =>
          MediaFeatures(a.doc_id, a.payload.length, w, h, 1)
        }
      }
  }

  /** REAL image resize (nearest-neighbor) on P6 payloads — actual
    * pixel resampling, not byte truncation. Non-PPM payloads pass
    * through unchanged. Narrow per-partition map; payloads never
    * shuffle.
    */
  def resizePpm(spark: SparkSession, assets: Dataset[Asset],
                w: Int, h: Int): Dataset[Asset] = {
    import spark.implicits._
    require(w > 0 && h > 0, s"resize dims must be positive, got ${w}x$h")
    require(w.toLong * h * 3 <= Int.MaxValue,
      s"resize payload ${w}x$h exceeds max array size")
    assets.mapPartitions(_.map { a =>
      Ppm.decode(a.payload) match {
        case Some((sw, sh, px)) =>
          val out = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            val sy = (y.toLong * sh / h).toInt
            var x = 0
            while (x < w) {
              val sx = (x.toLong * sw / w).toInt
              val s = (sy * sw + sx) * 3
              val t = (y * w + x) * 3
              out(t) = px(s); out(t + 1) = px(s + 1); out(t + 2) = px(s + 2)
              x += 1
            }
            y += 1
          }
          a.copy(payload = Ppm.encode(w, h, out))
        case None => a
      }
    })
  }

  /** REAL-codec image materialization: each doc becomes a genuine 16×16
    * binary-PPM image whose raster stride-samples the full text (byte i
    * of the raster is text byte (i·len)/768 — deterministic, covers the
    * whole doc, no padding region to degenerate the fingerprint).
    * Payloads round-trip through [[Ppm.encode]]/[[Ppm.decode]], so
    * downstream consumers exercise the real codec path, not the fake.
    * ASCII-corpus contract: see [[y4mAssets]] — US-ASCII bytes match
    * the oracle's UTF-8 `encode()` only on a pure-ASCII corpus.
    */
  def imageAssets(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val tb = asciiBytes(text, "imageAssets")
        val raster = new Array[Byte](16 * 16 * 3)
        var i = 0
        while (i < raster.length) {
          raster(i) = tb(i * tb.length / raster.length)
          i += 1
        }
        Asset(id, "image/x-portable-pixmap", Ppm.encode(16, 16, raster))
      })
  }

  case class ImageHash(doc_id: Long, dhash: Long)

  /** 63-bit perceptual difference hash (dHash) over REAL decoded
    * pixels: integer grayscale (299r+587g+114b)/1000, nearest-neighbor
    * 9×8 sample, bit (y·8+x) set when gray(x,y) > gray(x+1,y); the
    * 64th bit stays clear so the hash lives in non-negative long range
    * (bit arithmetic replays exactly in integer SQL). The sampling
    * grid matches [[resizePpm]]'s nearest-neighbor map, so the hash is
    * invariant under integer-factor upscales — the property that makes
    * dHash a near-dup signal rather than a byte checksum (asserted in
    * MultimodalSpec). Malformed payloads drop, as in [[PpmDecoder]].
    */
  def dHash(spark: SparkSession, assets: Dataset[Asset])
      : Dataset[ImageHash] = {
    import spark.implicits._
    assets.mapPartitions(_.flatMap { a =>
      Ppm.decode(a.payload).map { case (w, h, px) =>
        def gray(gx: Int, gy: Int): Long = {
          val o = ((gy * h / 8) * w + (gx * w / 9)) * 3
          (299L * (px(o) & 0xff) + 587L * (px(o + 1) & 0xff) +
            114L * (px(o + 2) & 0xff)) / 1000L
        }
        var hash = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val bit = y * 8 + x
            if (bit < 63 && gray(x, y) > gray(x + 1, y)) hash |= 1L << bit
            x += 1
          }
          y += 1
        }
        ImageHash(a.doc_id, hash)
      }
    })
  }

  /** Encode step: wrap a text corpus as fake media assets (payload =
    * UTF-8 bytes standing in for image bytes). */
  def toAssets(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(col("doc_id"), lit("image/fake").as("mime"),
        col("text").cast("binary").as("payload"))
      .as[Asset]
  }

  /** Feature extraction: partition-batched decode (the Scala analog of a
    * pandas-batched UDF — payload bytes stay inside the partition). */
  def extractFeatures(spark: SparkSession, assets: Dataset[Asset],
                      decoder: Decoder = FakeDecoder)
      : Dataset[MediaFeatures] = {
    import spark.implicits._
    assets.mapPartitions(decoder.decode _)
  }

  /** One sampled frame: 100-byte payload stripe `frame_idx` of the
    * asset (the video-frame analog; the last stripe may be short). */
  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB frame extraction standing in for a video codec: frame i is
    * payload bytes [i*100, (i+1)*100). Frame COUNT matches FakeDecoder
    * (n/100 + 1). The real surface is the plumbing: per-partition byte
    * slicing with no payload shuffle, one typed row per kept frame.
    */
  def sampleFrames(spark: SparkSession, assets: Dataset[Asset],
                   everyK: Int): Dataset[Frame] = {
    import spark.implicits._
    require(everyK > 0, s"everyK must be positive, got $everyK")
    assets.mapPartitions(_.flatMap { a =>
      val n = a.payload.length
      (0 to n / 100 by everyK).iterator.map { i =>
        val from = math.min(i * 100, n)
        val until = math.min(from + 100, n)
        Frame(a.doc_id, i, java.util.Arrays.copyOfRange(a.payload, from, until))
      }
    })
  }

  /** One audio subfingerprint shingle: `key` joins `shingle` consecutive
    * 7-bit band-energy-delta subfingerprints starting at window `idx`. */
  case class AudioShingle(doc_id: Long, idx: Int, key: String)

  /** STUB audio framing standing in for a PCM decoder (payload bytes =
    * the waveform, per the toAssets contract) with REAL fingerprint
    * arithmetic: the Haitsma–Kalker (2002) energy-difference scheme —
    * `win`-byte windows at `hop` stride (overlapping, unlike
    * sampleFrames' disjoint stripes), 8 equal time bands per window,
    * bit m of a window's subfingerprint set when the band-energy
    * difference (E(i,m) − E(i,m+1)) increased vs the previous window.
    * Matching robustness comes from shingling `shingle` consecutive
    * subfingerprints into one key. All-integer; fingerprinting runs per
    * partition off the scan — payload bytes never shuffle, only
    * (doc_id, idx, key) rows leave the decode partition.
    */
  def audioShingles(spark: SparkSession, assets: Dataset[Asset],
                    win: Int = 64, hop: Int = 32,
                    shingle: Int = 8): Dataset[AudioShingle] = {
    import spark.implicits._
    require(win > 0 && hop > 0 && shingle > 0 && win % 8 == 0,
      s"bad audio framing: win=$win hop=$hop shingle=$shingle")
    val bands = 8
    val bw = win / bands
    assets.mapPartitions(_.flatMap { a =>
      val p = a.payload
      val nWin = if (p.length < win) 0 else (p.length - win) / hop + 1
      val en = Array.tabulate(nWin, bands) { (i, m) =>
        var s = 0; var j = 0
        while (j < bw) { s += p(i * hop + m * bw + j) & 0xFF; j += 1 }
        s
      }
      val sfs = (1 until nWin).map { i =>
        var v = 0; var m = 0
        while (m < bands - 1) {
          if ((en(i)(m) - en(i)(m + 1))
            - (en(i - 1)(m) - en(i - 1)(m + 1)) > 0) v |= 1 << m
          m += 1
        }
        v
      }
      (0 to sfs.length - shingle).iterator.map { k =>
        AudioShingle(a.doc_id, k, sfs.slice(k, k + shingle).mkString("-"))
      }
    })
  }

  /** STUB resize standing in for an image scaler: output payload is
    * exactly `w*h` bytes (truncated or 0x20-padded). Deterministic, so
    * downstream feature extraction stays oracle-checkable.
    */
  def resize(spark: SparkSession, assets: Dataset[Asset],
             w: Int, h: Int): Dataset[Asset] = {
    import spark.implicits._
    require(w > 0 && h > 0, s"resize dims must be positive, got ${w}x$h")
    // w*h in int silently overflows (65536x65536 -> 0 -> every payload
    // truncated to empty); validate the product in long arithmetic
    require(w.toLong * h <= Int.MaxValue,
      s"resize payload ${w}x$h exceeds max array size")
    assets.mapPartitions(_.map { a =>
      val out = java.util.Arrays.copyOf(a.payload, w * h)
      java.util.Arrays.fill(out, math.min(a.payload.length, w * h), w * h,
        ' '.toByte)
      a.copy(payload = out)
    })
  }
}
