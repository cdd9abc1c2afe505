package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so the decoder here is a
  * clearly-marked deterministic stub (`FakeDecoder`) — the Spark-side
  * plumbing (binary column schema, partition-batched decode via
  * `mapPartitions`, typed output) is the real, tested surface. A real
  * deployment swaps `FakeDecoder` for a JNI/FFI codec; nothing else
  * changes.
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
