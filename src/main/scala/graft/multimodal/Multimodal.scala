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
}
