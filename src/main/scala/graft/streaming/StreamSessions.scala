package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization: the live twin of q76's batch
  * `session_window` (30-minute gap-merge islands per user).
  *
  * Spark-first on purpose: Spark 4's native streaming session window
  * already implements exactly the semantics a hand-rolled
  * flatMapGroupsWithState twin would re-derive — per-key gap-merge with
  * watermark-driven finalization, RocksDB-backed session state, and
  * merge-on-late-arrival inside the lateness horizon — so the right
  * engineering move is the declarative operator, not custom state (the
  * custom-state pattern is already exercised five times over in the
  * Tws* twins where no native operator exists). In append mode a
  * session emits exactly once, when the watermark passes its end (no
  * further event can merge into it), which makes the output the exact
  * batch q76 row set over the same events — asserted in
  * StreamSessionsSpec.
  *
  * State bound (the 100 TB concern): per key, only OPEN sessions inside
  * the watermark horizon are state — closed sessions emit and drop, so
  * state is O(active users × open sessions), independent of history
  * length; an idle user carries nothing once their last session
  * finalizes.
  */
object StreamSessions {

  /** (user_id, start_us, end_us, n) — one row per closed session, the
    * q76 output contract. `events` needs (user_id, ts); `gap` is the
    * session merge gap, `delay` the lateness horizon.
    */
  def sessions(events: DataFrame, gap: String, delay: String): DataFrame =
    events
      .select(col("user_id").cast("long").as("user_id"), col("ts"))
      .withWatermark("ts", delay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n"))
}
