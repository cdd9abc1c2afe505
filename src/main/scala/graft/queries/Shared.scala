package graft.queries

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Per-run shared index artifacts (VERDICT r5 items 4–5).
  *
  * At 100 TB an index build — k-means centroids, SRP signatures — is a
  * shared, persisted artifact, not something every consumer retrains
  * inline: round 5 trained the identical `kmeansQ` centroid set five
  * times per suite pass (q113/q114/q122/q126 on the full corpus, q130 on
  * the 80% split) and computed the SRP signature pass twice (q132, then
  * q138 re-invoking q132 from scratch). This object memoizes those
  * artifacts per (SparkContext, dataset dir):
  *
  *  - centroid SETS are driver-side `Seq[(cid, centroid)]` — k×dim longs,
  *    the exact thing kmeansQ already returns — so the cache is a plain
  *    map (no Spark state, safe across sessions);
  *  - shared FRAMES are persisted MEMORY_AND_DISK; the cache key includes
  *    `applicationId` so a frame bound to a stopped context can never be
  *    served to a new session (tests spin up one JVM-wide session, but
  *    Bench/Verify must not depend on that).
  *
  * Sharing is sound because every artifact here is DETERMINISTIC
  * (md5-seeded init, integer arithmetic, pinned iteration counts): the
  * memoized result is bit-identical to an inline retrain, so oracle
  * hashes cannot move — asserted by the unchanged q113/q122/q126/q130/
  * q132/q138 oracle rows.
  */
object Shared {
  private val centCache =
    TrieMap.empty[(String, String, String), Seq[(Int, Seq[Long])]]
  private val bookCache =
    TrieMap.empty[(String, String, String), Map[Int, Seq[(Int, Seq[Long])]]]
  private val frameCache = TrieMap.empty[(String, String, String), DataFrame]
  // measured materialization seconds per frame artifact (VERDICT r9 #8:
  // the shared-artifact first-toucher pays a visible build cost that
  // distorts its own per-query median; recording the cost per ARTIFACT
  // makes it data instead of a retime footnote — Bench emits this map)
  private val buildSecs = TrieMap.empty[(String, String, String), Double]

  private def appId(s: SparkSession): String = s.sparkContext.applicationId

  /** Bench-only eager materialization (ADVICE r10): when true, frame()
    * forces a count() on first build so the `shared_builds` ledger
    * records one measured number per artifact (VERDICT r9 #8). Default
    * FALSE so plan/schema-only consumers — HouseRulesSpec's schema
    * sweep over every query, PlanAuditSpec's plan() — stay
    * analysis-only: merely CONSTRUCTING a query plan that touches a
    * shared artifact must never run a Spark job. Lazy mode is still
    * correct for executing consumers: persist() is lazy, the first
    * action materializes the cache, and every later consumer shares it.
    */
  @volatile private[graft] var eagerBuilds: Boolean = false

  /** Memoize a deterministic centroid training run under (session, key, dir). */
  def centroids(s: SparkSession, key: String, dir: String)(
      train: => Seq[(Int, Seq[Long])]): Seq[(Int, Seq[Long])] =
    centCache.getOrElseUpdate((appId(s), key, dir), train)

  /** Memoize a deterministic multi-codebook training run (one codebook
    * set per subspace group id — the kmeansQMulti shape) under
    * (session, key, dir). */
  def books(s: SparkSession, key: String, dir: String)(
      train: => Map[Int, Seq[(Int, Seq[Long])]]): Map[Int, Seq[(Int, Seq[Long])]] =
    bookCache.getOrElseUpdate((appId(s), key, dir), train)

  /** Memoize + persist a deterministic frame under (session, key, dir).
    * The builder runs at most once per session per dir; consumers share
    * one materialization instead of re-running the lineage.
    */
  def frame(s: SparkSession, key: String, dir: String)(
      build: => DataFrame): DataFrame =
    frameCache.getOrElseUpdate((appId(s), key, dir), {
      val t0 = System.nanoTime()
      val f = build.persist(StorageLevel.MEMORY_AND_DISK)
      if (eagerBuilds) {
        // bench runs materialize EAGERLY and time it: the frame is
        // fully computed on first consumption anyway (persisted, every
        // consumer shares it); forcing the count here pins the build
        // cost to one measured number per artifact instead of smearing
        // it into whichever query touched the frame first
        f.count()
        buildSecs.put((appId(s), key, dir), (System.nanoTime() - t0) / 1e9)
      }
      f
    })

  /** Measured frame-build seconds for this session, keyed by artifact
    * name (dir collapsed — a bench run uses one dir). */
  def buildTimes(s: SparkSession): Map[String, Double] = {
    val id = appId(s)
    buildSecs.toMap.collect { case ((a, k, _), sec) if a == id => k -> sec }
  }

  /** Test hook: drop only the persisted FRAMES for this session —
    * plan-shape audits need a deterministic no-cache state (Spark's
    * cacheManager substitutes any registered fragment into any later
    * query's plan, so formatted-plan operator counts depend on what
    * happened to be cached first), but the driver-side centroid/
    * codebook caches don't affect plan shape and are expensive to
    * retrain. */
  private[graft] def resetFrames(s: SparkSession): Unit = {
    val id = appId(s)
    frameCache.keys.filter(_._1 == id).foreach { k =>
      frameCache.remove(k).foreach(_.unpersist(blocking = false))
    }
  }

  /** Test hook: drop everything cached for this session. */
  private[graft] def reset(s: SparkSession): Unit = {
    val id = appId(s)
    centCache.keys.filter(_._1 == id).foreach(centCache.remove)
    bookCache.keys.filter(_._1 == id).foreach(bookCache.remove)
    frameCache.keys.filter(_._1 == id).foreach { k =>
      frameCache.remove(k).foreach(_.unpersist(blocking = false))
    }
  }
}
