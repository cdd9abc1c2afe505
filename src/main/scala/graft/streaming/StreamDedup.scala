package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming EXACT deduplication — the stream form of q20's digest
  * dedup, completing the streaming dedup family next to
  * [[StreamNearDup]] (LSH near-dup) and [[StreamDrift]] (distribution
  * shift).
  *
  * Shape: each arriving document reduces to a 16-byte md5 digest
  * map-side; `dropDuplicatesWithinWatermark` keys its state store on
  * the digest, so the only shuffle carries (digest, row) once and the
  * state holds one entry per DISTINCT digest inside the watermark
  * horizon — O(novelty rate × delay), independent of duplicate
  * density (clones hit existing entries and add no state). This is
  * the same state-bound argument as StreamNearDup's bucket table.
  *
  * Semantics contract (and the trade a 100 TB deployment accepts):
  * duplicates arriving within `delay` of the first sighting are
  * dropped; a re-arrival AFTER the digest's state expired is kept —
  * exactness is bounded by the retention horizon, which is why the
  * batch dedup (q20/q96) remains the periodic ground-truth pass and
  * the stream filter is the day-level guard in front of it (the q96
  * incremental posture).
  *
  * Why `dropDuplicatesWithinWatermark` and not `dropDuplicates`: the
  * plain form keeps digest state FOREVER (unbounded state at stream
  * scale); the within-watermark form is the Spark-4 state-bounded
  * variant built for precisely this digest-dedup shape.
  */
object StreamDedup {

  /** `docs` must carry (doc_id, ts, text); emits the surviving rows
    * (first sighting of each digest inside the horizon) with their
    * digest attached.
    */
  def exact(docs: DataFrame, delay: String): DataFrame =
    docs
      .withColumn("digest", md5(col("text").cast("binary")))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("digest")
}
