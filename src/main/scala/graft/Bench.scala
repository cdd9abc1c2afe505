package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted}
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.nio.charset.StandardCharsets
import scala.collection.concurrent.TrieMap

object Bench {

  /** Per-query shuffle accounting: stages are attributed to the query
    * whose job group was active when their job started, so BENCH_LOCAL
    * records measured shuffle write/read and spill bytes per query —
    * the numbers that predict 100 TB behavior better than wall-clock at
    * toy scale (a fast query that shuffles the corpus is still wrong).
    */
  private class ShuffleMetricsListener extends SparkListener {
    private val stageToGroup = TrieMap.empty[Int, String]
    // best completed attempt per stage: a stage retried after a fetch
    // failure completes once per attempt; keeping only the first would
    // record a failed attempt's partial bytes and drop the real ones.
    // We skip attempts that completed WITH a failure reason and, among
    // successful attempts, keep the one with the larger byte total.
    private val perStage = TrieMap.empty[Int, (Long, Long, Long)]
    override def onJobStart(js: SparkListenerJobStart): Unit = {
      val group = Option(js.properties)
        .map(_.getProperty("spark.jobGroup.id")).orNull
      // stages shared across jobs keep their first attribution
      if (group != null && group.startsWith("q"))
        js.stageIds.foreach(id => stageToGroup.putIfAbsent(id, group))
    }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      if (si.failureReason.isEmpty && stageToGroup.contains(si.stageId)) {
        val m = si.taskMetrics
        val cur = (m.shuffleWriteMetrics.bytesWritten,
          m.shuffleReadMetrics.totalBytesRead,
          m.diskBytesSpilled + m.memoryBytesSpilled)
        val prev = perStage.getOrElse(si.stageId, (0L, 0L, 0L))
        if (cur._1 + cur._2 + cur._3 >= prev._1 + prev._2 + prev._3)
          perStage.put(si.stageId, cur)
      }
    }
    /** Per-group aggregate, computed after the bus has drained. */
    def agg: Map[String, (Long, Long, Long)] =
      perStage.toSeq.flatMap { case (sid, m) =>
        stageToGroup.get(sid).map(g => g -> m)
      }.groupBy(_._1).map { case (g, ms) =>
        g -> ms.map(_._2).foldLeft((0L, 0L, 0L)) { (a, b) =>
          (a._1 + b._1, a._2 + b._2, a._3 + b._3)
        }
      }
    /** Sum over all stages — stable once the listener bus has drained. */
    def checksum(): Long =
      perStage.values.map(t => t._1 + t._2 + t._3).sum + perStage.size
  }
  /** VERDICT r9 #2: the committed exclusive reference is the per-query
    * MIN across the session's clean runs, not the latest clean run
    * wholesale — a noisy-but-not-CONTENDED clean run can then only
    * TIGHTEN the ≥4× breach baseline, never inflate it (the round-9
    * q226 escape: a 0.76 s → 4.22 s cross-round swing on unchanged
    * code went unflagged because the latest-run-wholesale reference
    * had already absorbed inflated lines). Keys absent from the
    * current suite are dropped — renamed/retired queries must not
    * haunt the reference; non-positive prior lines (failed-run
    * sentinels) are ignored.
    */
  def mergeExclusiveRef(prior: Map[String, Double],
      current: Seq[(String, Double)]): Seq[(String, Double)] =
    current.map { case (n, sec) =>
      n -> prior.get(n).filter(p => p > 0 && p < sec).getOrElse(sec)
    }

  /** VERDICT r12 #1 (sanctioned fallback): when the host refuses a
    * quiet full-suite window, a NEW query's exclusive line may be
    * measured in a load-gated scoped micro-window (the TimeQ
    * steady-state protocol the watch-threshold adjudication already
    * trusts) and recorded in BENCH_EXCLUSIVE.json under a separate
    * `"provisional"` map — never in `"queries"`. Supersede rule, both
    * directions: a committed line always wins (the effective
    * reference takes a provisional value only for a key with no
    * committed line), and a clean full-suite refresh — which by
    * construction covers every query — drops every superseded
    * provisional key, so provisional lines cannot outlive the first
    * quiet window. Non-positive sentinels never enter the reference.
    */
  def effectiveRef(committed: Map[String, Double],
      provisional: Map[String, Double]): Map[String, Double] =
    committed ++ provisional.filter { case (k, v) =>
      v > 0 && !committed.contains(k)
    }

  /** Provisional keys that survive a committed-reference refresh:
    * only those the new committed line set STILL does not cover AND
    * that name a query in the current suite — a renamed/retired
    * query's provisional line must not haunt the reference any more
    * than a committed one may (mergeExclusiveRef drops retired
    * committed keys by construction; this is the provisional-map
    * counterpart, without which a key provisionally banked and then
    * renamed before any clean full-suite pass would be carried
    * forever).
    */
  def carryProvisional(newCommitted: Map[String, Double],
      provisional: Map[String, Double],
      suite: Set[String]): Map[String, Double] =
    provisional.filter { case (k, v) =>
      v > 0 && !newCommitted.contains(k) && suite.contains(k)
    }

  /** The queries a scoped micro-window may record provisional lines
    * for: measured positive, inside the ATTESTED scope, and not
    * already committed. The scope intersection matters when
    * SPARK_GRAFT_BENCH_ONLY widens the run beyond the attested
    * provisional scope — extra queries may run, but only the attested
    * ones may enter the reference.
    */
  def provisionalFresh(results: Seq[(String, Double)],
      scope: Set[String],
      committed: Map[String, Double]): Seq[(String, Double)] =
    results.filter { case (n, sec) =>
      sec > 0 && scope.contains(n) && !committed.contains(n)
    }

  /** Parse one flat `"key":{"q…":sec,…}` map out of a one-line bench
    * JSON record. An absent key is an EMPTY map — falling through to
    * index arithmetic on -1 would "parse" whatever q-keyed entries
    * precede the record's first '}' (e.g. the retimes map) as phantom
    * lines.
    */
  def parseRefMap(txt: String, key: String): Map[String, Double] = {
    val marker = "\"" + key + "\":{"
    val qsec = txt.indexOf(marker)
    if (qsec < 0) Map.empty
    else {
      val body =
        txt.substring(qsec + marker.length, txt.indexOf("}", qsec))
      "\"(q[^\"]+)\":([-0-9.eE]+)".r.findAllMatchIn(body)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
  }

  /** Replace (or append) the `"provisional":{…}` entry of a one-line
    * bench JSON record, leaving every other byte of the committed line
    * untouched — a provisional micro-window must not be able to
    * perturb the committed fields it rides alongside. `provJson` is
    * the rendered flat map, e.g. `{"q275_x":0.31}`.
    */
  def upsertProvisional(line: String, provJson: String): String = {
    val key = "\"provisional\":"
    val idx = line.indexOf(key + "{")
    if (idx >= 0) {
      // flat name→sec map: the first '}' after the key closes it
      val end = line.indexOf("}", idx)
      line.substring(0, idx) + key + provJson + line.substring(end + 1)
    } else {
      val cut = line.lastIndexOf("}")
      if (cut < 0)
        // existing-but-empty/truncated record (a crashed prior write):
        // rebuild from the minimal seed rather than dying on a
        // substring(0, -1) after the measurements were already taken
        "{\"queries\":{}," + key + provJson + "}"
      else
        line.substring(0, cut) + "," + key + provJson + line.substring(cut)
    }
  }

  /** Micro-window cleanliness gate for provisional lines: both the
    * pre-run and post-run job-overhead floors must sit at the quiet
    * floor (~0.07 s; every round-12 CONTENDED run measured ≥ 0.12 s),
    * or the window refuses to record — the same refuse-don't-loosen
    * posture the full-suite exclusive refresh uses.
    */
  private[graft] val ProvisionalFloorSec = 0.10

  /** VERDICT r10 #1 (the q112 incident): breach re-times run right
    * after a contended pass on the same still-noisy host, so a retime
    * can itself be garbage — round 10 published a 62.9 s median-of-3
    * "correction" for a query whose committed exclusive line is 1.13 s
    * (56×), WORSE than the 18.5 s breach it corrected, and any reader
    * that trusts retimes over references inherits the poison. A retime
    * is a usable correction only if it lands back inside the same
    * [*, 4.0) slow-direction band the breach test uses, judged against
    * the committed exclusive line; otherwise it is flagged unusable and
    * the committed line stays the query's cost estimate. A failed
    * retime (-1 sentinel) is unusable by definition. A query with no
    * committed line keeps its retime — there is no reference to call
    * it noise against.
    * Returns (usable retimes, unusable retimes with the discarded
    * measurement kept for the audit trail).
    */
  def adjudicateRetimes(retimes: Seq[(String, Double)],
      exclusiveRef: Map[String, Double])
      : (Seq[(String, Double)], Seq[(String, Double)]) =
    retimes.partition { case (n, sec) =>
      sec >= 0 &&
        exclusiveRef.get(n).forall(ref => ref <= 0 || sec / ref < 4.0)
    }

  // Headline subset for the stdout line: the driver's tail-capture window
  // is small (~4 KB) and the full 96-query map overflows it, which is why
  // BENCH_r01/r02 recorded "parsed": null. The stdout line stays short;
  // the complete per-query map goes to BENCH_LOCAL.json in-repo.
  private val headline = Seq(
    "q02_pricing_summary", "q21_minhash_pairs", "q22_ngram_jaccard",
    "q30_embedding_neardup", "q34_simhash_knn", "q62_dup_clusters",
    "q70_edit_distance", "q87_triangles", "q95_corpus_pipeline")

  /** Plan-audit notes for expensive no-driver-baseline queries
    * (VERDICT r8 #6 / r9 #4, the q190 contract-cost pattern): a query
    * whose exclusive line exceeds the 4 s watch threshold is acceptable
    * only with a named reason the cost IS the contract, emitted into
    * BASELINE_ROW.md's table so no slow newcomer hides behind a dash.
    * A >4 s line with no entry here renders as a loud MISSING cell.
    */
  private val planNotes: Map[String, String] = Map(
    "q190_exact_setsim" -> ("exact prefix-filter set-similarity " +
      "contract: 6 exchanges, all windows on high-cardinality doc_id; " +
      "100×-smoked sub-linear (4.6→8.5 s) — cost is the contract"),
    "q220_mannwhitney_shift" -> ("doubled-rank histogram + " +
      "chunk-bounded prefix sums; constant planner-action count; " +
      "100×-smoked ~3× time for 100× rows — job-count-bound, no sort"),
    "q240_spearman_signals" -> ("two value-grain rank histograms + " +
      "prefix sums, ~8 tiny planner actions — constant job count; " +
      "job-overhead-bound shape, not data-bound at sf0.1"),
    "q201_source_quartiles" -> ("three map-combined linear scans " +
      "(per-source stats, source×8192 histogram, rank-target value " +
      "count) — no window/sort anywhere; cost = 3 corpus scans by " +
      "the exact-quartile contract"),
    "q216_quality_ensemble" -> ("one shared token pass (run-shared " +
      "quality_signals artifact) + 3 exact decile refinements = 9 " +
      "map-combined aggregates + 3 broadcast 9-row threshold arrays; " +
      "cost is the token pass the ensemble family shares"),
    "q209_calibration" -> ("rides the shared quality_signals token " +
      "pass; decile thresholds via 3 map-combined Quantile " +
      "aggregates broadcast back — quantile-refinement actions " +
      "dominate at toy scale, one token pass at 100 TB"),
    "q195_lm_perplexity" -> ("bigram-LM train+score: one bigram-grain " +
      "shuffle (hashed 8-byte keys) + doc-grain fold; the LM join is " +
      "the contract's only corpus-sized exchange, LM is vocab-grain"),
    "q196_incremental_neardup" -> ("batch-probe join on the persisted " +
      "dedup-staged band index + exact-Jaccard verify on candidates " +
      "only — per-day cost ∝ batch × bucket hits, never corpus²"),
    "q226_token_weighted_median" -> ("token-mass value-at-rank on the " +
      "(source, toks) histogram via chunk-bounded Prefix.runningSum — " +
      "no per-source sort window; histogram-grain, not row-grain"),
    "q260_mad_outliers" -> ("two value-at-rank passes (median, then " +
      "MAD on the deviation regroup) over the run-shared length " +
      "histogram — 2× the q226 prefix contract by construction; " +
      "every pass is histogram-grain, cost is planner actions, not " +
      "data (2.2 s TimeQ steady at sf0.1)"),
    "q258_ks_drift" -> ("exact two-sample KS: one shared persisted " +
      "(source, toks) histogram (ks_hist ledger line) + dense " +
      "per-source prefix-sum CDFs; remaining cost is a handful of " +
      "planner-scale jobs (quantile chunking + partials collect) over " +
      "the cached histogram — job-overhead-bound at sf0.1 (3.2 s " +
      "isolated steady state), histogram-grain at 100 TB"),
    "q268_greedy_coverage" -> ("greedy set-cover driver loop: 3 " +
      "rounds × (one map-combined count over the persisted shingle " +
      "frame + a 1-row TakeOrdered fetch) + the distinct-total " +
      "action — 4 bounded planner actions by contract (the kmeansQ " +
      "fetch posture); job-count-bound at sf0.1 (3.6 s TimeQ steady), " +
      "each job is one pass over the shared doc_tri_distinct artifact"),
    "q271_skyline_maintenance" -> ("two paretoFrontier sweeps (rest, " +
      "then frontier ∪ batch): each runs Prefix.runningMax's " +
      "quantile-chunking + partials-collect planner actions at " +
      "distinct-score grain — job-overhead-bound at sf0.1; at 100 TB " +
      "the stored frontier is a persisted artifact and the daily " +
      "update touches |frontier| + |batch| rows only"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // one-shot numbers on a shared box swing well past the ±20% the docs
    // assume (round-3 q34/q21/q105 all looked inflated); per-query MEDIAN
    // of n reps is the recorded number. Reps run back-to-back per query
    // so a box-load spike hits one query's reps, not the whole suite.
    val reps = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val spark = Engine.session("graft-bench", cpus)
    // bench runs want the shared-artifact ledger: eager first-build
    // materialization with a measured cost per artifact (VERDICT r9 #8).
    // Everywhere else Shared.frame stays lazy (ADVICE r10: plan-only
    // consumers must not trigger Spark jobs).
    graft.queries.Shared.eagerBuilds = true
    // warm up JVM/codegen/parquet paths on the tiny sf so the first timed
    // query doesn't absorb session startup
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // touch every benchmark table once so first-scan costs (footer reads,
    // filesystem metadata) don't land on whichever query runs first
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      try Tables.table(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    try Tables.events(spark, sfDir).count() catch { case _: Throwable => () }
    val metrics = new ShuffleMetricsListener
    spark.sparkContext.addSparkListener(metrics)
    // per-query job-overhead floor (VERDICT r8 #8): the median cost of a
    // trivial 1-row noop round-trip through the same write path every
    // timed query uses. Queries whose absolute time sits under ~3× this
    // floor are measuring scheduler+codegen overhead, not plan cost —
    // ratio triage (the swing watchlist below, and any judge-side
    // driver-vs-here comparison) excludes them, and the measured floor
    // ships in every bench artifact as floor_sec.
    // ONE probe definition for every floor measurement in the run: the
    // provisional gate compares the pre-run floor against a post-run
    // re-measure, so the two sites must stay byte-identical or the
    // comparison silently loses meaning.
    def measureFloor(): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try spark.range(1).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }
    val floorSec = measureFloor()
    // optional subset run (scale smokes over partial-table clone dirs):
    // SPARK_GRAFT_BENCH_ONLY=q22_ngram_jaccard,q87_triangles
    // provisional micro-window (VERDICT r12 #1 fallback):
    // SPARK_GRAFT_BENCH_PROVISIONAL=q275_…,q276_… scopes the run to
    // the named queries AND — iff the window measures quiet at both
    // ends — records their lines in BENCH_EXCLUSIVE.json's
    // "provisional" map (committed "queries" lines are never touched)
    val provisionalScope = sys.env.get("SPARK_GRAFT_BENCH_PROVISIONAL")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .orElse(provisionalScope)
    // deterministic name order: per-query numbers comparable across runs
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_.contains(q._1)))
      .map { case (name, fn) =>
      val times = (1 to reps).map { rep =>
        // shuffle bytes are deterministic across reps (each rep builds a
        // fresh plan and re-shuffles the same data), so only rep 1 is
        // attributed to the query group; later reps use a non-"q" group
        // the listener ignores, keeping recorded bytes single-run.
        spark.sparkContext.setJobGroup(
          if (rep == 1) name else s"rep$rep:$name", name)
        val t0 = System.nanoTime()
        // evaluate via a noop sink, not count(): under count() Catalyst
        // legitimately prunes every unreferenced column and ELIMINATES
        // row-preserving joins (q139's scrub — a left join against a
        // unique-keyed aggregate — benched as a bare scan, 59 bytes of
        // shuffle at 10x clone density). The noop write materializes
        // every output column, so a query's number is the cost of the
        // result it actually claims to produce.
        val ok = try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          true
        } catch { case e: Throwable =>
                   System.err.println(s"[bench] $name failed: ${e.getMessage}")
                   false
                 }
        spark.sparkContext.clearJobGroup()
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      // a crashed query must not masquerade as a fast one: any failed rep
      // poisons the query with the -1 sentinel
      val sorted = times.sorted
      val median =
        if (sorted.size % 2 == 1) sorted(sorted.size / 2)
        else (sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2.0
      name -> (if (times.exists(_ < 0)) -1.0 else median)
    }
    // snapshot the shuffle aggregate NOW — after the suite pass, BEFORE
    // any contention re-times run (ADVICE r8: re-time traffic must not
    // leak into the committed shuffle numbers; the artifact's bytes
    // correspond to exactly one suite pass). The listener bus is async:
    // poll until the aggregate stops moving (two consecutive stable
    // reads) instead of hoping one fixed sleep outruns a loaded bus;
    // bounded at ~10 s.
    locally {
      var stable = 0
      var last = -1L
      var polls = 0
      while (stable < 2 && polls < 20) {
        Thread.sleep(500)
        val c = metrics.checksum()
        if (c == last) stable += 1 else { stable = 0; last = c }
        polls += 1
      }
    }
    val aggregated = metrics.agg
    // ---- run-level contention verdict (VERDICT r7 #3): the round-7
    // driver bench recorded 447.9 s for a tree that measures 182.9 s
    // exclusive — the per-query watchlist flagged 6 swings but nothing
    // marked the RUN bad, so a contended number became the round's
    // artifact. BENCH_EXCLUSIVE.json is the committed idle-box
    // reference (written by a run with SPARK_GRAFT_BENCH_EXCLUSIVE=1);
    // any full-suite run compares itself per-query against it, counts
    // slow-direction breaches of the documented [0.25, 4.0] noise band
    // (this median >= 1 s and >= 4x the exclusive reference), declares
    // itself CONTENDED at >= 4 breaches, and immediately re-times each
    // breaching query in-process (median of 3) so the artifact carries
    // its own correction — a contended run self-identifies instead of
    // waiting for judge archaeology.
    def readMap(path: String, key: String): Map[String, Double] =
      try parseRefMap(new String(Files.readAllBytes(Paths.get(path)),
        StandardCharsets.UTF_8), key)
      catch { case _: Throwable => Map.empty }
    def readMedians(path: String): Map[String, Double] =
      readMap(path, "queries")
    // the breach test measures against the EFFECTIVE reference —
    // committed lines plus provisional micro-window lines for queries
    // no committed line covers yet (VERDICT r12 #1)
    val exclusiveRef: Map[String, Double] =
      if (only.isEmpty)
        effectiveRef(readMedians("BENCH_EXCLUSIVE.json"),
          readMap("BENCH_EXCLUSIVE.json", "provisional"))
      else Map.empty[String, Double]
    val breaches = results.filter { case (n, sec) =>
      sec >= 1.0 && exclusiveRef.get(n).exists(ref => ref > 0 && sec / ref >= 4.0)
    }
    val contended = breaches.size >= 4
    val retimes: Seq[(String, Double)] =
      if (breaches.isEmpty) Seq.empty
      else breaches.map { case (name, _) =>
        val ts = (1 to 3).map { rep =>
          spark.sparkContext.setJobGroup(s"retime$rep:$name", name)
          val t0 = System.nanoTime()
          val ok = try {
            SparkEntry.queries(name)(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
            true
          } catch { case _: Throwable => false }
          spark.sparkContext.clearJobGroup()
          if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        }.sorted
        name -> (if (ts.exists(_ < 0)) -1.0 else ts(1))
      }
    // adjudicate the retimes against the committed reference BEFORE
    // publishing (VERDICT r10 #1): a correction worse than its breach
    // is host noise, not data — it goes to retimes_unusable and the
    // committed exclusive line remains the query's cost estimate
    val (retimesUsable, retimesUnusable) =
      adjudicateRetimes(retimes, exclusiveRef)
    def jsonMap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // failed queries carry a -1 sentinel — exclude them from the total
    // so a broken run can never look faster than a healthy one
    val total = results.map(_._2).filter(_ >= 0).sum
    val nFail = results.count(_._2 < 0)
    val shuffle = results.map { case (name, _) =>
      val (w, r, sp) = aggregated.getOrElse(name, (0L, 0L, 0L))
      s"\"" + name + s"\":{\"write\":$w,\"read\":$r,\"spill\":$sp}"
    }.mkString("{", ",", "}")
    // per-artifact shared-frame build costs (VERDICT r9 #8): these
    // seconds are INSIDE the first-touching query's rep-1 time (the
    // median of 3 usually hides them, a retime always does); emitting
    // them per artifact makes the first-touch cost auditable data
    val sharedBuilds = graft.queries.Shared.buildTimes(spark).toSeq
      .sortBy(-_._2)
    val sharedJson = sharedBuilds
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // stamp the events-ts physical variant the run actually read — a
    // testdata regeneration that changes it (the round-5 incident) is
    // then visible in every bench artifact it produced
    val eventsTsType =
      try spark.read.parquet(s"$sfDir/events.parquet")
        .schema("ts").dataType.simpleString
      catch { case _: Throwable => "unreadable" }
    val contentionJson =
      s""""contended":$contended,"n_slow_breaches":${breaches.size},"retimes":${jsonMap(retimesUsable)},"retimes_unusable":${jsonMap(retimesUnusable)}"""
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":$nFail,"reps":$reps,"stat":"median","floor_sec":$floorSec,"events_ts":"$eventsTsType",$contentionJson,"queries":${jsonMap(results)},"shared_builds":$sharedJson,"shuffle_bytes":$shuffle,"sf":"$sfDir"}"""
    // subset runs must not clobber the canonical full-suite record
    val outFile =
      if (only.isDefined) "BENCH_SUBSET.json" else "BENCH_LOCAL.json"
    Files.write(Paths.get(outFile),
      (fullLine + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
    // an idle-box run (builder-attested via env) refreshes the committed
    // exclusive reference the contention verdict compares against.
    // A run that ITSELF measured contended must not become the
    // reference — on a hypervisor-noisy box the attestation can be
    // honest while the numbers still are not (round-9 incident: two
    // attested runs, 209.5 s and 227.0 s, 5–7 breaches each, every
    // breacher fast again on retime); refusing here keeps the last
    // clean reference in place so future verdicts stay calibrated.
    if (only.isEmpty && nFail == 0 &&
        sys.env.get("SPARK_GRAFT_BENCH_EXCLUSIVE").contains("1")) {
      if (contended)
        System.err.println(
          s"[bench] exclusive run measured CONTENDED (${breaches.size} " +
            "breaches) — NOT refreshing BENCH_EXCLUSIVE.json; re-run on " +
            "an idle box")
      else {
        // per-query MIN merge against the prior reference (VERDICT r9
        // #2) — the committed baseline only ever tightens; the written
        // total is the merged total so the headline number and the
        // per-query lines describe the same (synthetic best) run
        val merged =
          mergeExclusiveRef(readMedians("BENCH_EXCLUSIVE.json"), results)
        val mergedTotal = merged.map(_._2).sum
        // supersede rule (VERDICT r12 #1): every provisional key this
        // clean pass now covers with a committed line is dropped; a
        // full-suite pass covers everything, so the carried map is
        // normally empty
        val carried = carryProvisional(merged.toMap,
          readMap("BENCH_EXCLUSIVE.json", "provisional"),
          SparkEntry.queries.keySet)
        val exclusiveLine =
          s"""{"metric":"total","value":$mergedTotal,"unit":"sec","n_queries":${merged.size},"n_failed":0,"reps":$reps,"stat":"median","merge":"per-query min across clean exclusive runs","floor_sec":$floorSec,"events_ts":"$eventsTsType",$contentionJson,"queries":${jsonMap(merged)},"provisional":${jsonMap(carried.toSeq.sortBy(_._1))},"shuffle_bytes":$shuffle,"sf":"$sfDir"}"""
        Files.write(Paths.get("BENCH_EXCLUSIVE.json"),
          (exclusiveLine + "\n").getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
          StandardOpenOption.WRITE)
      }
    }
    // ---- provisional micro-window write (VERDICT r12 #1 fallback):
    // a scoped run attested via SPARK_GRAFT_BENCH_PROVISIONAL records
    // each measured query WITHOUT a committed line into the reference's
    // "provisional" map — iff the window stayed quiet end-to-end (the
    // pre-run floor above plus a post-run floor re-measure, both at
    // the quiet floor). Tighten-only min-merge against prior
    // provisional lines; committed lines and every other byte of the
    // committed record are preserved verbatim (string surgery).
    provisionalScope.foreach { scope =>
      val postFloor = measureFloor()
      val committed = readMedians("BENCH_EXCLUSIVE.json")
      // intersect with the ATTESTED scope: BENCH_ONLY may widen the
      // run, but only queries named in the provisional attestation may
      // enter the reference (provisionalFresh pins the rule)
      val fresh = provisionalFresh(results, scope, committed)
      if (floorSec > ProvisionalFloorSec || postFloor > ProvisionalFloorSec)
        System.err.println(
          f"[bench] provisional micro-window CONTENDED (floor pre " +
            f"$floorSec%.3f s / post $postFloor%.3f s vs gate " +
            f"$ProvisionalFloorSec%.2f s) — NOT recording provisional " +
            "lines; re-try on a quieter window")
      else if (nFail > 0)
        System.err.println(
          s"[bench] provisional window had $nFail failed queries — " +
            "NOT recording provisional lines")
      else if (fresh.isEmpty)
        System.err.println(
          "[bench] every scoped query already has a committed line — " +
            "nothing provisional to record")
      else {
        val prior = readMap("BENCH_EXCLUSIVE.json", "provisional")
        val outMap =
          carryProvisional(committed, prior, SparkEntry.queries.keySet) ++
            mergeExclusiveRef(prior, fresh).toMap
        // a repo without a committed reference yet still gets its
        // provisional lines — seed a minimal record instead of crashing
        // after the measurements were already taken
        val refLine =
          try new String(
            Files.readAllBytes(Paths.get("BENCH_EXCLUSIVE.json")),
            StandardCharsets.UTF_8).trim
          catch { case _: Throwable => """{"queries":{}}""" }
        val updated = upsertProvisional(refLine,
          jsonMap(outMap.toSeq.sortBy(_._1)))
        Files.write(Paths.get("BENCH_EXCLUSIVE.json"),
          (updated + "\n").getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
          StandardOpenOption.WRITE)
        System.err.println(
          s"[bench] provisional lines recorded (floor pre/post " +
            f"$floorSec%.3f/$postFloor%.3f s): " +
            fresh.map { case (n, s) => f"$n=$s%.2f" }.mkString(", "))
      }
    }
    val head = results.filter(r => headline.contains(r._1))
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":$nFail,"reps":$reps,"stat":"median",$contentionJson,"queries":${jsonMap(head)},"sf":"$sfDir","full":"$outFile"}""")
    // BASELINE.md table content generated from the same numbers that go
    // into the JSON artifact (VERDICT r4 #5: narrative and artifact must
    // not drift — the measured section is emitted here, then pasted into
    // BASELINE.md verbatim). Full-suite runs only; subset smokes have
    // their own recording conventions.
    if (only.isEmpty && nFail > 0) {
      // a run with failures must not leave (or keep) a green-looking
      // parity record: overwrite BASELINE_ROW.md with an explicit
      // failure banner so a stale "0 failed" claim cannot outlive the
      // data it was measured on (VERDICT r5 item 3)
      val failed = results.filter(_._2 < 0).map(_._1).mkString(", ")
      Files.write(Paths.get("BASELINE_ROW.md"),
        (s"**BENCH RUN FAILED: $nFail of ${results.size} queries errored " +
          s"($failed) on $sfDir (events.ts=$eventsTsType). No parity row " +
          "recorded — fix the failures and re-run graft.Bench.**\n")
          .getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
        StandardOpenOption.WRITE)
    } else if (only.isEmpty) {
      def mb(b: Long): String = f"${b / 1048576.0}%.0f"
      val spillTotal = aggregated.values.map(_._3).sum
      val spillNote =
        if (spillTotal == 0L) "zero spill anywhere"
        else s"${mb(spillTotal)} MB total spill"
      // Cross-run ratio column (VERDICT r6 #8): BENCH_DRIVER.json is the
      // last DRIVER-run full-suite artifact (snapshotted from the round
      // commit); ratio = driver median ÷ this run's exclusive median.
      // Swings like round 6's q139 (21.6 s driver vs 1.7 s isolated, a
      // contended-run artifact) then surface in the table instead of
      // via judge archaeology. Parsed with the same regex shape Bench
      // itself emits — no JSON lib in the unmanaged classpath.
      val driverMedians: Map[String, Double] =
        readMedians("BENCH_DRIVER.json")
      def ratio(n: String, sec: Double): String =
        driverMedians.get(n) match {
          case Some(dm) if sec > 0 => f"${dm / sec}%.1f×"
          case _ => "–"
        }
      val slowest = results.sortBy(-_._2).take(8).map { case (n, sec) =>
        val (w, r, sp) = aggregated.getOrElse(n, (0L, 0L, 0L))
        f"| $n | $sec%.2f | ${mb(w)} | ${mb(r)} | ${mb(sp)} | ${ratio(n, sec)} |"
      }
      // swing watchlist: material queries (driver ≥ 1 s) whose
      // driver/exclusive ratio leaves the documented VM noise band.
      // Sub-floor exclusion (VERDICT r8 #8): a query whose absolute
      // time here is < 3× the measured job-overhead floor is timing
      // scheduler overhead, not plan cost — its ratio is noise (the
      // round-8 q21 flag: 0.14 s vs 0.04 s read as 3.7×) and is
      // excluded so the watchlist stays signal.
      val swings = results
        .flatMap { case (n, sec) =>
          driverMedians.get(n).filter(_ >= 1.0)
            .filter(_ => sec >= 3 * floorSec).flatMap { dm =>
            val r = if (sec > 0) dm / sec else Double.PositiveInfinity
            if (r >= 4.0 || r <= 0.25)
              Some(f"| $n | ${dm}%.2f | $sec%.2f | $r%.1f× |")
            else None
          }
        }
      // no-driver-baseline section (VERDICT r8 #6): queries past the
      // driver's last full-suite artifact have no external reference —
      // BENCH_EXCLUSIVE.json is their committed self-reference. Any
      // such query whose exclusive line exceeds 4 s gets listed loudly
      // (the q190 contract-cost precedent: expensive is acceptable
      // only with a plan note), so a slow newcomer can't hide in the
      // "no ratio available" dash.
      val noDriver = results.filter { case (n, _) =>
        !driverMedians.contains(n)
      }
      val noDriverSlow = noDriver.filter(_._2 > 4.0).sortBy(-_._2)
      val noDriverBlock =
        if (driverMedians.isEmpty || noDriver.isEmpty) Seq.empty[String]
        else Seq(
          "",
          s"**No-driver-baseline queries**: ${noDriver.size} queries " +
            "have no BENCH_DRIVER.json number (added after the last " +
            "driver-run artifact); their committed reference is this " +
            "run's BENCH_LOCAL/BENCH_EXCLUSIVE line. " +
            (if (noDriverSlow.isEmpty)
              "None exceed the 4 s watch threshold."
            else "Lines over the 4 s watch threshold (need a plan-audit " +
              "note the way q190's contract-cost note works):")) ++
          (if (noDriverSlow.isEmpty) Seq.empty[String]
          else Seq("", "| query | this run (s) | plan-audit note |",
            "|---|---|---|") ++
            noDriverSlow.map { case (n, sec) =>
              val note = planNotes.getOrElse(n,
                "**MISSING — add a planNotes entry in Bench.scala**")
              f"| $n | $sec%.2f | $note |"
            })
      val swingBlock =
        if (driverMedians.isEmpty) Seq(
          "",
          "_No BENCH_DRIVER.json reference — ratio column unavailable._")
        else if (swings.isEmpty) Seq(
          "",
          "No driver-vs-exclusive swings outside the noise band " +
            "(ratio in (0.25, 4.0), or driver median < 1 s) — the " +
            "documented cross-run VM band on this box.")
        else Seq(
          "",
          "**Cross-run swing watchlist** (driver median ≥ 1 s and " +
            "driver ÷ exclusive outside [0.25, 4.0] — investigate " +
            "before reading either number as the query's cost):",
          "",
          "| query | driver (s) | exclusive (s) | ratio |",
          "|---|---|---|---|") ++ swings
      // run-level contention verdict block (VERDICT r7 #3): loud at the
      // TOP of the parity record when this run breached the band, with
      // the in-process re-times as the artifact's own correction
      val retimeMap = retimesUsable.toMap
      val unusableMap = retimesUnusable.toMap
      val contentionBlock =
        if (exclusiveRef.isEmpty) Seq(
          "_No BENCH_EXCLUSIVE.json reference — run-level contention " +
            "verdict unavailable (run graft.Bench once on an idle box " +
            "with SPARK_GRAFT_BENCH_EXCLUSIVE=1 to create it)._",
          "")
        else if (breaches.isEmpty) Seq(
          "Run-level contention verdict: CLEAN — no query ≥ 1 s ran ≥ 4× " +
            "its committed exclusive reference (BENCH_EXCLUSIVE.json).",
          "")
        else Seq(
          (if (contended)
            s"**RUN-LEVEL VERDICT: CONTENDED — ${breaches.size} queries " +
              "ran ≥ 4× their committed exclusive reference " +
              "(BENCH_EXCLUSIVE.json). Do NOT read this run's totals as " +
              "query cost; the in-process re-times below are the " +
              "run's own correction." +
              (if (unusableMap.isEmpty) "" else
                s" ${unusableMap.size} re-time(s) themselves measured " +
                  "≥ 4× the committed line — marked UNUSABLE; the " +
                  "committed exclusive line remains those queries' " +
                  "cost estimate.") + "**"
          else
            s"Run-level contention verdict: ${breaches.size} slow-direction " +
              "breach(es) of the [0.25, 4.0] band vs BENCH_EXCLUSIVE.json " +
              "(below the 4-breach CONTENDED threshold) — re-timed " +
              "in-process below."),
          "",
          "| breaching query | this run (s) | exclusive ref (s) | ratio | re-time (s) |",
          "|---|---|---|---|---|") ++
          breaches.map { case (n, sec) =>
            val ref = exclusiveRef(n)
            // a retime that itself breached ≥4× the committed line is
            // published as UNUSABLE, not as the correction — the
            // committed exclusive line stays the cost estimate
            val rt = retimeMap.get(n).map(v => f"$v%.2f")
              .orElse(unusableMap.get(n).map(v =>
                if (v < 0) f"retime failed — keep committed $ref%.2f s"
                else f"**UNUSABLE** ($v%.2f s ≥ 4× ref — keep " +
                  f"committed $ref%.2f s as the estimate)"))
              .getOrElse("failed")
            f"| $n | $sec%.2f | $ref%.2f | ${sec / ref}%.1f× | $rt |"
          } ++ Seq("")
      // assembled line-by-line, NOT via stripMargin — interpolated table
      // rows start with '|' and stripMargin would eat it
      // shared-artifact build ledger: every artifact ≥ 0.5 s, so a
      // first-toucher's inflated rep-1 has a named, measured cause
      val bigBuilds = sharedBuilds.filter(_._2 >= 0.5)
      val buildBlock =
        if (bigBuilds.isEmpty) Seq.empty[String]
        else Seq("",
          "**Shared-artifact builds ≥ 0.5 s** (paid once per run inside " +
            "the first-touching query's rep 1; medians-of-3 exclude it):",
          "") ++ Seq("| artifact | build (s) |", "|---|---|") ++
          bigBuilds.map { case (k, v) => f"| $k | $v%.2f |" }
      val row = (contentionBlock ++ Seq(
        f"**Full suite, $sfDir, median-of-$reps: $total%.1f s for ${results.size} queries, $nFail failed, $spillNote** (BENCH_LOCAL.json carries per-query medians + measured shuffle write/read/spill bytes). Generated by `graft.Bench` from the same run that wrote the JSON artifact. Ratio column = driver-run median (BENCH_DRIVER.json) ÷ this run's median. Measured job-overhead floor: $floorSec%.2f s/query (ratios on queries under 3× floor are scheduler noise, excluded from the watchlist).",
        "",
        "| query (8 slowest) | median (s) | shuffle write MB | read MB | spill MB | driver÷here |",
        "|---|---|---|---|---|---|") ++ slowest ++ buildBlock ++
        noDriverBlock ++ swingBlock)
        .mkString("", "\n", "\n")
      Files.write(Paths.get("BASELINE_ROW.md"),
        row.getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
        StandardOpenOption.WRITE)
    }
    spark.stop()
  }
}
