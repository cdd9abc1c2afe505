package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Text

/** Corpus-hygiene operators a training-data pipeline runs before (and
  * after) dedup: benchmark decontamination, vocabulary statistics,
  * repetition-based quality pruning, boilerplate detection, and
  * reserved-token scrubbing. All hashing is md5; ratios are single
  * divisions of exact integers (cross-engine bit-deterministic).
  */
object CorpusQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Loud-failure envelope thresholds (VERDICT r10 #2). Production
    * values are pinned to the literals in the DuckDB oracle SQL
    * (EnvelopeParitySpec asserts both sides agree), so crossing an
    * envelope fails LOUDLY and identically on both engines — the
    * defense against the q214-class silent cross-engine divergence.
    * `var` only so EdgeCasesSpec can force each failure on a toy
    * corpus and prove the raise_error path actually fires; nothing in
    * main source mutates them.
    */
  private[graft] var SpearmanEnvelopeN: Long = 2090000L
  private[graft] var KsEnvelopeN: Long = 300000000L
  /** q277 eff_ppm guard: per-source wt_mass ≤ 10³¹ keeps
    * wt_mass·10⁶ inside DECIMAL(38,0) (and, with the gate-enforced
    * ≤ 10⁵ sources, tot_wt ≤ 10³⁶ inside it too); past the envelope
    * non-ANSI Spark would silently NULL while DuckDB's HUGEINT errors
    * at a different bound — so both engines raise at THIS bound. The
    * IS NULL arm catches a sum that already overflowed upstream of
    * the check (a silent-NULL wt_mass must not yield a NULL eff_ppm).
    */
  private[graft] var CurationWtEnvelope: BigInt = BigInt(10).pow(31)

  /** MAD quarantine gate shared by q277/q278: from a per-source
    * (source, toks, cnt) DOC-COUNT histogram, both quarantine
    * statistics as histogram-grain value-at-rank reads over
    * chunk-bounded [[graft.operators.Prefix.runningSum]] (never a
    * per-source sort window), fetched as a bounded LOCAL frame — the
    * (source, median, MAD) gate table is planner-scale BY CONSTRUCTION
    * (one row per source), and embedding the two prefix pipelines as
    * broadcast SUBTREES instead made every downstream action
    * re-canonicalize a huge plan (~0.7 s/scan measured, q277 staging
    * history). LIMIT-guarded like Prefix's partials.
    */
  private def madGateDf(s: SparkSession, hist: DataFrame,
      who: String): DataFrame = {
    val tot = hist.groupBy(col("source"))
      .agg(sum(col("cnt")).as("docs_canonical"))
    val med = graft.operators.Prefix
      .runningSum(hist, "source", "toks", "cnt", "cum")
      .join(broadcast(tot), "source")
      .groupBy(col("source"))
      .agg(min(when(col("cum") * 2 >= col("docs_canonical"),
        col("toks"))).as("median_len"))
    val devHist = hist.join(broadcast(med), "source")
      .select(col("source"),
        abs(col("toks") - col("median_len")).as("dev"), col("cnt"))
      .groupBy(col("source"), col("dev"))
      .agg(sum(col("cnt")).as("cnt"))
    val mad = graft.operators.Prefix
      .runningSum(devHist, "source", "dev", "cnt", "cumd")
      .join(broadcast(tot), "source")
      .groupBy(col("source"))
      .agg(min(when(col("cumd") * 2 >= col("docs_canonical"),
        col("dev"))).as("mad"))
    val gateRows = med.join(mad, "source").limit(100001).collect()
    require(gateRows.length <= 100000,
      s"$who: > 100000 sources — the per-source gate table is no " +
        "longer planner-scale; stage the quarantine differently")
    s.createDataFrame(
      s.sparkContext.parallelize(gateRows.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types
          .StructField("source", hist.schema("source").dataType),
        org.apache.spark.sql.types.StructField("median_len",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("mad",
          org.apache.spark.sql.types.LongType))))
  }

  /** Source-overlap pair frame (src_a < src_b, w = shared distinct
    * 8-gram count) — one build per run (Shared.frame), consumed by q105
    * (the contamination matrix itself) and q141 (as the PageRank edge
    * weights). dedup = false in wordShingles: its default distinct
    * would shuffle the raw 50+-char shingle strings only for the
    * digest-level distinct below to shuffle again — one exchange over
    * 16-byte digests is the whole set-semantics cost (q22 precedent).
    */
  /** The (source, toks, cnt) token-length histogram — the query's one
    * doc-grain scan, shared per run (Shared.frame lifecycle: tracked
    * in the shared_builds ledger, released by reset). Every
    * length-distribution statistic here (q226 weighted median, q258 KS
    * drift, q260 MAD quarantine) works at this histogram grain —
    * sources × distinct lengths, planner-scale — never doc grain.
    */
  private def lenHist(s: SparkSession, d: String): DataFrame =
    Shared.frame(s, "ks_hist", d)(
      Tables.documents(s, d)
        .select(col("source"),
          size(split(col("text"), " ")).cast("bigint").as("toks"))
        .groupBy(col("source"), col("toks"))
        .agg(count(lit(1)).as("cnt")))

  private def sourceOverlap(s: SparkSession, d: String): DataFrame =
    Shared.frame(s, "src_overlap", d) {
      val gs = Text.wordShingles(Tables.documents(s, d), "source",
          "text", 8, dedup = false)
        .select(col("source"), md5(col("sh").cast("binary")).as("h"))
        .distinct()
      val a = gs.select(col("source").as("src_a"), col("h"))
      val b = gs.select(col("source").as("src_b"), col("h").as("h_b"))
      a.join(b, col("h") === col("h_b") && col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("w"))
    }

  /** The 60-bit md5 word key (the q190/q22 hashed-key idiom): joins and
    * counts move 8-byte longs, never word strings; collisions at 2^60
    * are the documented envelope and cannot move parity (the oracle
    * hashes identically). */
  private def wkey(c: String): String =
    s"CAST(conv(substr(md5(CAST($c AS BINARY)), 1, 15), 16, 10) AS BIGINT)"

  /** The corpus word-bigram LM — (w1, w2, c12, c1) counts at bigram
    * grain — trained ONCE per run (Shared.frame): perplexity filtering
    * (q195) treats the LM as an index artifact, the CCNet posture,
    * never a per-query cost. At 100 TB the LM trains on a reference
    * slice and persists; here the corpus is its own reference. */
  private def bigramLm(s: SparkSession, d: String): DataFrame =
    Shared.frame(s, "lm_bigram", d) {
      val tk = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
      val bg = tk.filter(size(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(t) - 1), i -> struct(" +
            s"${wkey("element_at(t, i)")} AS w1, " +
            s"${wkey("element_at(t, i + 1)")} AS w2))")).as("p"))
        .select(col("p.w1"), col("p.w2"))
      val c12 = bg.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("c12"))
      val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
      c12.join(c1, "w1")
    }

  /** Per-doc quality signals — the q124 learned score plus token and
    * distinct-token counts — in ONE token-grain pass, memoized per run
    * (Shared.frame): q209 (calibration), q216 (ensemble), and q217
    * (kappa) all consume this frame, and q216's three Quantile
    * refinements re-scan the MATERIALIZED aggregate instead of
    * re-tokenizing the corpus per pass (9 token passes collapse to 1).
    */
  private[queries] def qualitySignals(s: SparkSession,
                                      d: String): DataFrame =
    Shared.frame(s, "quality_signals", d) {
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .withColumn("b", SamplingQueries.hashBucket("tok", 1, 1024))
        .withColumn("wt", SamplingQueries.hashBucket("b", 9, 2001) - 1000)
        .groupBy(col("doc_id"))
        .agg(sum(col("wt")).as("score"), count(lit(1)).as("n_tokens"),
          countDistinct(col("tok")).as("uniq"))
    }

  /** 2-D max-max skyline of a (doc_id, score, n_tokens) frame — the
    * q267/q271 dominance sweep: per distinct score the max token count
    * (map-combinable), then the strict prefix max over scores
    * descending via the two-phase Prefix.runningMax; a doc survives
    * iff it carries its score's tmax AND that tmax beats every
    * higher-score tmax (equal (score, tokens) ties all surface —
    * neither dominates). Never sorts the input globally: the sweep
    * runs at distinct-score grain, the frontier joins back broadcast.
    */
  private def paretoFrontier(sig: DataFrame): DataFrame = {
    val pts = sig.groupBy(col("score"))
      .agg(max(col("n_tokens")).as("tmax"))
      // orderCol must be numeric ascending; -score makes the prefix
      // run over scores DESCENDING (strictly-higher-score rows first)
      .withColumn("__g", lit(0)).withColumn("__ord", -col("score"))
    val swept = graft.operators.Prefix.runningMax(
      pts, "__g", "__ord", "tmax", "above_max", inclusive = false)
    val frontier = swept
      .filter(col("above_max").isNull || col("tmax") > col("above_max"))
      .select(col("score"), col("tmax"))
    sig.join(broadcast(frontier), Seq("score"))
      .filter(col("n_tokens") === col("tmax"))
      .select(col("doc_id"), col("score"), col("n_tokens"))
  }

  /** Governance-trio shared QI cell census — (lang, 50-token length
    * bucket, source) cells with their document counts, memoized per
    * run (Shared.frame): q218 (k-anonymity) reads the cells directly,
    * q237 (l-diversity) folds them per class, q239 (t-closeness) joins
    * them against the class and corpus totals. Before this, q239 alone
    * paid FOUR corpus scans (column pruning de-canonicalizes the
    * aggregate, so exchange reuse never fires — plan-audited); now the
    * whole trio pays one, and every frame after the census is
    * QI-cardinality-sized.
    */
  private[queries] def qiCells(s: SparkSession, d: String): DataFrame =
    Shared.frame(s, "qi_cells", d) {
      Tables.documents(s, d)
        .select(col("lang"),
          expr("CAST(size(split(text, ' ')) AS BIGINT) div 50")
            .as("len_bucket"),
          col("source"))
        .groupBy(col("lang"), col("len_bucket"), col("source"))
        .agg(count(lit(1)).as("m_cs"))
    }

  val queries: Map[String, Q] = Map(
    // ---- LM-PERPLEXITY quality scoring (the CCNet bucket filter —
    // the classic pretraining quality signal the heuristic gates
    // q26/q88 approximate): every document scored by its mean
    // surprisal under a word-bigram LM with add-one smoothing trained
    // on the corpus itself (the shared bigramLm artifact), then
    // assigned to the head/middle/tail TERCILE of the corpus score
    // distribution — head = most-fluent-under-the-LM, the slice CCNet
    // keeps. Arithmetic is INTEGER-EXACT end to end so DuckDB replays
    // it bit-for-bit: per-bigram surprisal = ⌊log2((c1+V)/(c12+1))⌋
    // via the bit-length idiom (length(bin(q))−1, the q157 trick — no
    // libm log enters the contract), per-doc score = truncating
    // fixed-point mean (×1000), tercile thresholds = value-at-rank
    // min-when folds over the tiny score histogram (cum·3 ≥ n —
    // integer percentile_disc, the q160/q175 idiom; the unpartitioned
    // window rides a ≤|distinct scores| post-aggregation frame).
    // Scale: one bigram-grain shuffle to score (hashed 8-byte keys),
    // one doc-grain aggregate; the LM join is the only corpus-sized
    // exchange and the LM itself is vocabulary-grain.
    "q195_lm_perplexity" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val tk = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      val vocab = tk.select(explode(col("t")).as("w"))
        .select(expr(wkey("w")).as("wk"))
        .agg(countDistinct(col("wk")).as("v"))
      val bg = tk.filter(size(col("t")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(t) - 1), i -> struct(" +
            s"${wkey("element_at(t, i)")} AS w1, " +
            s"${wkey("element_at(t, i + 1)")} AS w2))")).as("p"))
        .select(col("doc_id"), col("p.w1"), col("p.w2"))
      val scored = bg.join(bigramLm(s, d), Seq("w1", "w2"))
        .crossJoin(broadcast(vocab))
        .select(col("doc_id"),
          (length(expr("bin((c1 + v) div (c12 + 1))")) - 1)
            .cast("bigint").as("sv"))
      val perDoc = docs.select(col("doc_id"))
        .join(scored.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"), sum(col("sv")).as("surp")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("surp"), lit(0L)).as("surprisal_sum"))
        .withColumn("score_x1000",
          when(col("n_bigrams") === 0, lit(0L))
            .otherwise(expr("surprisal_sum * 1000 div n_bigrams")))
      val hist = perDoc.groupBy(col("score_x1000")).agg(count(lit(1)).as("c"))
      val cum = hist.withColumn("cum",
        sum(col("c")).over(Window.orderBy(col("score_x1000"))))
      val th = cum
        .crossJoin(broadcast(perDoc.agg(count(lit(1)).as("n"))))
        .agg(min(when(col("cum") * 3 >= col("n"), col("score_x1000")))
          .as("t1"),
          min(when(col("cum") * 3 >= col("n") * 2, col("score_x1000")))
            .as("t2"))
      perDoc.crossJoin(broadcast(th))
        .select(col("doc_id"), col("n_bigrams"), col("surprisal_sum"),
          col("score_x1000"),
          when(col("score_x1000") <= col("t1"), lit("head"))
            .when(col("score_x1000") <= col("t2"), lit("middle"))
            .otherwise(lit("tail")).as("bucket"))
    }),

    // ---- BLOOM file-skipping audit (the point-lookup complement of
    // q162's zone maps): min/max stats prune nothing for an equality
    // predicate on an uncorrelated high-cardinality key (q162's
    // arrival layout), so file-level indexes carry BLOOM filters —
    // here a 2^13-bit, k=4 filter per simulated lineitem file over its
    // partkeys, probed with 20 deterministic target keys. The filter
    // is deliberately UNDERSIZED (~1 bit/distinct key) so the audit
    // surfaces real false positives: scanned = truly-containing + FP
    // files — the saturation trade a file-index designer sizes m
    // against. Positions are the md5-derived Kirsch–Mitzenmacher pair
    // ((h1 + i·h2) & (m−1), h2 forced odd — functions/Bloom's scheme
    // on the cross-engine md5 idiom instead of xxhash64, which DuckDB
    // cannot replay). Set bits per file: one explode to (file, pos)
    // distinct — ≤ m rows per file regardless of row count; the probe
    // join touches k rows per (probe, file).
    "q174_bloom_skipping" -> ((s, d) => {
      val mask = (1L << 13) - 1
      def h(c: String, off: Int) =
        s"CAST(conv(substr(md5(CAST(CAST($c AS STRING) AS BINARY)), " +
          s"$off, 8), 16, 10) AS BIGINT)"
      // h1/h2 are hoisted to per-row columns BEFORE the 4-position
      // transform: inlined in the lambda they re-evaluate per element
      // (8 md5 calls per row across the two digest windows — measured
      // as this query's dominant cost); hoisted it's 2 per row and the
      // lambda is pure integer arithmetic. Values unchanged (same
      // Kirsch–Mitzenmacher positions), oracle untouched.
      def hashed(df: DataFrame, c: String): DataFrame = df
        .withColumn("__h1", expr(s"${h(c, 1)} & $mask"))
        .withColumn("__h2", expr(s"(${h(c, 17)} & $mask) | 1"))
      def positions = expr(
        s"transform(sequence(0, 3), i -> (__h1 + __h2 * i) & $mask)")
      // the distinct (file, partkey) frame feeds three consumers (bit
      // sets, the file count, the truth side) — one persisted build per
      // run (Shared.frame) instead of three lineitem scans + distincts;
      // at 100 TB this IS the file-index build, a stored artifact
      val li = Shared.frame(s, "bloom_file_keys", d)(
        Tables.lineitem(s, d)
          .select(expr("l_orderkey div 1024").as("file_id"),
            col("l_partkey"))
          .distinct())
      val bits = hashed(li, "l_partkey")
        .select(col("file_id"), explode(positions).as("pos"))
        .distinct()
      val probeList = Tables.part(s, d)
        .filter(col("p_partkey") % 100 === 3)
        .select(col("p_partkey").as("probe_pk"))
      val probes = hashed(probeList, "probe_pk")
        .select(col("probe_pk"), explode(positions).as("pos"))
      val nFiles = li.select(col("file_id")).distinct().count()
      val bloomScan = probes.join(bits, "pos")
        .groupBy(col("probe_pk"), col("file_id"))
        .agg(count(lit(1)).as("hits"))
        .filter(col("hits") === 4)
        .groupBy(col("probe_pk"))
        .agg(count(lit(1)).as("n_files_bloom"))
      val truly = li.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_files_true"))
        .withColumnRenamed("l_partkey", "probe_pk")
      probeList
        .join(bloomScan, Seq("probe_pk"), "left_outer")
        .join(truly, Seq("probe_pk"), "left_outer")
        .select(col("probe_pk"),
          coalesce(col("n_files_bloom"), lit(0L)).as("n_files_bloom"),
          coalesce(col("n_files_true"), lit(0L)).as("n_files_true"),
          (coalesce(col("n_files_bloom"), lit(0L))
            - coalesce(col("n_files_true"), lit(0L))).as("n_false_pos"),
          lit(nFiles).as("n_files_total"))
    }),

    // ---- PIPELINE FUNNEL accounting (the curation run's summary
    // table: docs/tokens surviving each stage): raw → exact-dedup
    // canonical (q20's min-id-per-md5 rule) → near-dup survivor
    // (q38's drop-the-larger-pair-member rule, riding the ONE shared
    // LSH pair frame) → quality gate (q124's classifier keep). Each
    // stage is the REAL home-query rule, so the funnel is an audit of
    // the actual operators, not lookalikes; the fold per stage is one
    // map-combined aggregate, and the whole report adds two anti-join
    // shapes beyond indexes that already exist.
    "q187_pipeline_funnel" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          size(split(col("text"), " ")).cast("bigint").as("toks"))
      val exactKeep = docs
        .groupBy(md5(col("text").cast("binary")).as("h"))
        .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
      val nearDropped = TextQueries.sharedCandidatePairs(s, d)
        .select(col("doc_b").as("doc_id")).distinct()
      val stage2 = docs.join(exactKeep, "doc_id")
      val stage3 = stage2.join(nearDropped, Seq("doc_id"), "left_anti")
      val quality = queries("q124_quality_classifier")(s, d)
        .filter(col("keep")).select(col("doc_id"))
      val stage4 = stage3.join(quality, "doc_id")
      def row(order: Int, name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_docs"),
            coalesce(sum(col("toks")), lit(0L)).as("n_tokens"))
          .select(lit(order).as("stage"), lit(name).as("stage_name"),
            col("n_docs"), col("n_tokens"))
      row(1, "raw", docs)
        .unionByName(row(2, "exact_dedup", stage2))
        .unionByName(row(3, "near_dedup", stage3))
        .unionByName(row(4, "quality_gate", stage4))
    }),

    // ---- SPAN-CORRUPTION example construction (the T5/UL2 denoising
    // objective's data prep — the seq2seq member of the
    // training-example family beside q103's chunk windows and q110's
    // packed sequences): 3 of every 10 tokens masked in aligned runs,
    // input = tokens with each masked run collapsed to one <Xm>
    // sentinel, target = the sentinels with their masked tokens — the
    // exact (input, target) pair a denoising trainer consumes. The
    // mask phase is an md5-derived per-doc offset (same doc → same
    // spans on any cluster, the q148 determinism rule); all string
    // surgery is IN-ROW transform/filter/array_join off the scan — a
    // map-only operator, no shuffle at any scale. The oracle replays
    // token-for-token.
    "q182_span_corruption" -> ((s, d) => {
      val corrupt = "(p - 1 + off) % 10 < 3"
      val runStart = "((p - 1 + off) % 10 = 0 OR p = 1)"
      val sentinel = "concat('<X', CAST((p - 1 + off) div 10 AS STRING), '>')"
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("tk"),
          (SamplingQueries.hashBucket("doc_id", 21, 10)).as("off"))
        .select(col("doc_id"),
          expr(s"""array_join(filter(transform(
            sequence(1, size(tk)), p ->
              CASE WHEN $corrupt THEN
                CASE WHEN $runStart THEN $sentinel ELSE '' END
              ELSE element_at(tk, p) END), x -> x <> ''), ' ')""")
            .as("input_text"),
          expr(s"""array_join(filter(transform(
            sequence(1, size(tk)), p ->
              CASE WHEN $corrupt THEN
                CASE WHEN $runStart
                  THEN concat($sentinel, ' ', element_at(tk, p))
                  ELSE element_at(tk, p) END
              ELSE '' END), x -> x <> ''), ' ')""").as("target_text"),
          expr(s"""aggregate(transform(sequence(1, size(tk)), p ->
              CASE WHEN $corrupt AND $runStart THEN 1L ELSE 0L END),
            0L, (a, x) -> a + x)""").as("n_spans"))
    }),

    // ---- MODEL-BASED quality filtering (the fastText-classifier shape
    // of CCNet/LLaMA-style pipelines, next to the heuristic scores of
    // q26 and the dedup family): every token hashes into one of 1024
    // feature buckets, the doc's score is the sum of its tokens' bucket
    // weights, keep = score >= 0. In production the weight table is a
    // trained classifier broadcast as a literal map; here the weights
    // derive deterministically from the bucket id (the q59 md5-window
    // idiom, independent digest windows for bucket vs weight) so the
    // oracle replays scoring exactly — the plumbing under test is the
    // scale shape: scan → hash → one map-combinable sum per doc, no
    // joins, no model state on the executors beyond the broadcast.
    "q124_quality_classifier" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .withColumn("b", SamplingQueries.hashBucket("tok", 1, 1024))
        .withColumn("w", SamplingQueries.hashBucket("b", 9, 2001) - 1000)
        .groupBy(col("doc_id")).agg(sum(col("w")).as("score"))
        .select(col("doc_id"), col("score"),
          (col("score") >= 0).as("keep"))
    }),

    // ---- DISTRIBUTION-DRIFT audit: does today's batch (doc_id%10 >= 8
    // stands in for the incoming drop) still look like the reference
    // corpus? Token mass per 64-bucket hashed feature, reference vs
    // current, drift per bucket decided by the cross-multiplied
    // total-variation test |100·cur_b·R − 100·ref_b·C| > R·C (bucket
    // share moved by more than 1 percentage point) — all-integer in
    // DECIMAL(18,0) products (q131's determinism discipline; a
    // chi-square would need the same cross-multiplication anyway and
    // adds nothing at fixed threshold). The ·100 rides INSIDE the
    // counts (long ·100 is safe below 9e16 tokens per side) so no
    // product ever needs more than 18+18 digits. The pipeline gate: a
    // drifted batch pauses ingestion before it poisons the mixture.
    // One map-combined pass to 64 rows; the verdict aggregate is free
    // at any corpus size.
    "q137_drift_audit" -> ((s, d) => {
      val tb = Tables.documents(s, d)
        .select((col("doc_id") % 10 >= 8).as("is_cur"),
          explode(split(col("text"), " ")).as("tok"))
        .withColumn("b", SamplingQueries.hashBucket("tok", 1, 64))
      val agg = tb.groupBy(col("b"))
        .agg(sum(when(col("is_cur"), 0L).otherwise(1L)).as("ref_b"),
          sum(when(col("is_cur"), 1L).otherwise(0L)).as("cur_b"))
      val tot = agg.agg(sum(col("ref_b")).as("rr"), sum(col("cur_b")).as("cc"))
      def d18(c: org.apache.spark.sql.Column) = c.cast("decimal(18,0)")
      agg.crossJoin(broadcast(tot))
        .select(col("b"), col("ref_b"), col("cur_b"),
          (abs(d18(col("cur_b") * 100) * d18(col("rr"))
            - d18(col("ref_b") * 100) * d18(col("cc")))
            > d18(col("rr")) * d18(col("cc"))).as("drifted"))
    }),
    // ---- benchmark decontamination: which "train" docs (doc_id%10 != 0)
    // share an 8-gram with a "test" doc (doc_id%10 == 0)? The classic
    // n-gram-overlap contamination check, as a shingle equi-join —
    // shuffles (shingle-hash, id), never bodies. At real scale the
    // test-side shingle set is small enough to broadcast.
    // ---- CONTAINMENT decontamination: q51 counts shared 8-grams, but
    // the decision metric benchmark suites actually need is asymmetric
    // containment |sh(bench) ∩ sh(train)| / |sh(bench)| — a short
    // benchmark fully embedded in a long train doc scores 1.0 here
    // while its Jaccard stays near zero. Per-doc DISTINCT shingle
    // digests (so both counts are set sizes), digest-only join, and an
    // integer threshold decision (5·shared >= 4·bench ⟺ containment
    // >= 0.8) — no doubles anywhere. At 100 TB the bench side is tiny
    // (broadcast) and the train side shuffles only digests of docs
    // that share at least one shingle.
    "q127_containment_decontam" -> ((s, d) => {
      val sh = Text.wordShingles(Tables.documents(s, d),
          "doc_id", "text", 8)
        .select(md5(col("sh").cast("binary")).as("shh"), col("doc_id"))
        .distinct()
      val bench = sh.filter(col("doc_id") % 10 === 0)
        .select(col("shh"), col("doc_id").as("bench_id"))
      val bsz = bench.groupBy(col("bench_id"))
        .agg(count(lit(1)).as("n_bench"))
      val train = sh.filter(col("doc_id") % 10 =!= 0)
        .select(col("shh"), col("doc_id").as("train_id"))
      train.join(broadcast(bench), "shh")
        .groupBy(col("train_id"), col("bench_id"))
        .agg(count(lit(1)).as("n_shared"))
        .join(broadcast(bsz), "bench_id")
        .filter(col("n_shared") * 5 >= col("n_bench") * 4)
        .select(col("bench_id"), col("train_id"),
          col("n_shared"), col("n_bench"))
    }),

    "q51_decontam" -> ((s, d) => {
      val sh = Text.wordShingles(Tables.documents(s, d), "doc_id", "text", 8)
        .select(md5(col("sh").cast("binary")).as("shh"), col("doc_id"))
      val test = sh.filter(col("doc_id") % 10 === 0)
        .select(col("shh"), col("doc_id").as("test_id"))
      val train = sh.filter(col("doc_id") % 10 =!= 0)
        .select(col("shh"), col("doc_id").as("train_id"))
      train.join(broadcast(test), "shh")
        .groupBy(col("train_id"), col("test_id"))
        .agg(count(lit(1)).as("shared_8grams"))
    }),

    // ---- bloom-prefiltered decontamination: q51's contamination
    // question, executed the way a 100 TB corpus has to run it. The
    // test-side 8-gram set folds into a broadcastable Bloom filter
    // (functions/Bloom.scala — sparse map<word,bits>, built and probed
    // with codegen'd builtins); corpus shingles are dropped MAP-SIDE by
    // the probe before the exact confirm join. The confirm join
    // deliberately does NOT broadcast: at real scale the exact digest
    // set is past the broadcast budget — the point of the bloom is that
    // only survivors (|corpus|·fp + true hits) reach that exchange
    // instead of every corpus shingle. False positives die in the
    // confirm join, so the output is exactly the exact answer: per
    // train doc, its count of distinct contaminated 8-grams.
    "q116_bloom_decontam" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // test side (10% of the corpus): shingle + distinct — small
      val test = Text.wordShingles(docs.filter(col("doc_id") % 10 === 0),
          "doc_id", "text", 8)
        .select(col("sh")).distinct()
      val blm = graft.functions.Bloom.build(test, "sh")
      // train side (the big side): NO pre-distinct — a corpus-wide
      // distinct would shuffle every shingle string, the exact cost the
      // bloom exists to avoid. Raw exploded shingles are probed
      // map-side off the scan; only survivors get deduped (tiny).
      val train = Text.wordShingles(docs.filter(col("doc_id") % 10 =!= 0),
          "doc_id", "text", 8, dedup = false)
        .select(col("doc_id").as("train_id"), col("sh"))
      train.crossJoin(broadcast(blm))
        .filter(graft.functions.Bloom.mightContain(col("bloom"), col("sh")))
        .select(col("train_id"), col("sh")).distinct()
        .join(test, "sh")
        .groupBy(col("train_id"))
        .agg(count(lit(1)).as("n_bad_grams"))
    }),

    // ---- vocabulary: global top-20 tokens by frequency (the token-count
    // side of BPE vocab construction); deterministic via (count, token)
    // total order
    "q53_vocab_topk" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok").asc)
        .limit(20)
    }),

    // ---- COMPOSITE n-gram repetition gate (the Gopher/MassiveText
    // "repetition" rule family, Rae et al. 2021 §A1.1, alongside q54's
    // single-token ratio): for n ∈ {2,3,4}, the fraction of the doc's
    // n-gram OCCURRENCES claimed by its single most frequent n-gram,
    // thresholded at 20/18/16% — a doc fails if ANY n-gram family is
    // dominated by one phrase (loops, boilerplate chant, SEO stuffing).
    // House determinism rules: thresholds are integer cross-
    // multiplications (top*100 <= total*thr), no doubles anywhere.
    // Scale: ZERO shuffle — the statistic is per-doc, so it never needs
    // to leave the row. Grams hash to xxhash64 in-row and the top count
    // comes from the native `maxfreq` expression (primitive long[]
    // sort + run scan, O(L log L) per doc, whole-stage codegen) —
    // scan → project, no exchange at any corpus size. The first cut
    // shuffled pre-combined (doc_id, n, gram-hash) groups and measured
    // 140 MB of exchange at 10× clone density; corpus-token-scale
    // shuffle for a per-row statistic is exactly the shape that dies at
    // 100 TB, so the in-row form replaced it (same outputs, oracle
    // unchanged). xxhash64 collisions
    // can only MERGE two gram counts (birthday ~n²/2⁶⁵ per doc-local
    // gram set — vanishing, and only ever nudges one doc's top count).
    "q147_gopher_repetition" -> ((s, d) => {
      // max gram frequency = maxfreq (native codegen'd Expression:
      // primitive long[] sort + run scan — the aggregate()-fold
      // formulation it replaced ran interpreted with a boxed struct per
      // step). Gram key = variadic xxhash64 over the gram's per-TOKEN
      // hashes (each token hashed once per doc, not once per gram it
      // appears in — no per-gram string allocation, and
      // position-sensitive by construction).
      def top(n: Int): String = {
        val poly = "xxhash64(" +
          (0 until n).map(j => s"th[i + $j]").mkString(", ") + ")"
        s"""maxfreq(if(size(th) >= $n,
           |  transform(sequence(0, size(th) - $n), i -> ($poly)),
           |  array()))""".stripMargin
      }
      def nb(n: Int): String =
        s"greatest(size(th) - ${n - 1}, 0)"
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr("transform(split(text, ' '), t -> xxhash64(t))").as("th"))
        .select(col("doc_id"),
          size(col("th")).cast("bigint").as("n_toks"),
          expr(top(2)).as("top2"), expr(nb(2)).cast("bigint").as("nb2"),
          expr(top(3)).as("top3"), expr(nb(3)).cast("bigint").as("nb3"),
          expr(top(4)).as("top4"), expr(nb(4)).cast("bigint").as("nb4"))
        .withColumn("keep",
          col("top2") * 100 <= col("nb2") * 20
            && col("top3") * 100 <= col("nb3") * 18
            && col("top4") * 100 <= col("nb4") * 16)
    }),

    // ---- CORPUS DATASHEET (the "dataset card" composition table every
    // released corpus ships — docs/tokens/chars, exact-dup rate, mean
    // doc length per (source, lang) stratum): the one-stop report a mix
    // designer reads before q61/q99/q136 decide budgets. Scale: one
    // scan; everything map-combines except the exact-dup leg, which
    // exchanges 16-byte text digests pre-combined per stratum (the q20
    // discipline). Output is n_sources × n_langs rows; the two ratios
    // are single divisions of exact integers.
    "q155_corpus_datasheet" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("source"), col("lang"),
          md5(col("text").cast("binary")).as("h"),
          size(split(col("text"), " ")).cast("bigint").as("toks"),
          length(col("text")).cast("bigint").as("chars"))
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).as("n_tokens"),
          sum(col("chars")).as("n_chars"),
          countDistinct(col("h")).as("n_unique"))
        .select(col("source"), col("lang"), col("n_docs"),
          col("n_tokens"), col("n_chars"), col("n_unique"),
          (col("n_docs") - col("n_unique")).as("dup_docs"),
          (col("n_tokens").cast("double") / col("n_docs"))
            .as("avg_tokens"),
          (col("n_unique").cast("double") / col("n_docs"))
            .as("unique_ratio"))
    }),

    // ---- repetition ratio: max single-token frequency / token count per
    // doc — the standard "repetitive junk" quality signal
    "q54_repetition" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c")).as("max_tok_freq"),
          sum(col("c")).as("n_tokens"))
        .select(col("doc_id"), col("max_tok_freq"), col("n_tokens"),
          (col("max_tok_freq") / col("n_tokens")).as("repetition_ratio"))
    }),

    // ---- boilerplate detection: docs sharing an identical 10-token
    // prefix (crawl-boilerplate analog of line-level dedup; the full
    // corpus groups on a 16-byte digest, not text)
    "q55_prefix_dup" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(concat_ws(" ", slice(split(col("text"), " "), 1, 10))
            .cast("binary")).as("prefix_hash"))
        .groupBy(col("prefix_hash"))
        .agg(min(col("doc_id")).as("canonical_id"),
          count(lit(1)).as("n_docs"))
        .filter(col("n_docs") > 1)
    }),

    // ---- the full curation pipeline composed end-to-end in ONE lazy
    // plan: near-dup removal (LSH canonical survivors) → quality gate
    // (repetition ratio, min length) → reproducible split assignment →
    // per-split/source budget report. This is the actual 100 TB corpus
    // job; every stage is an operator already verified in isolation
    // (q38 / q54 / q59), so this asserts they COMPOSE.
    "q95_corpus_pipeline" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // stage 1: canonical docs = those never appearing as the higher
      // id of an LSH candidate pair
      val pairs = TextQueries.sharedCandidatePairs(s, d)
      val canonical = docs.join(pairs.select(col("doc_b")),
        docs("doc_id") === col("doc_b"), "left_anti")
      // stage 2: quality gate on token stats
      val stats = canonical
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c")).as("mx"), sum(col("c")).as("n_tokens"))
        .filter(col("n_tokens") >= 10
          && col("mx") * 5 <= col("n_tokens")) // repetition <= 20%
      // stage 3: reproducible split + budget report. stats' doc_ids are
      // already the canonical survivors, so joining the RAW docs table
      // is row-identical and avoids planning the LSH subtree twice.
      docs.join(stats, "doc_id")
        .select(col("source"), col("n_tokens"),
          when(SamplingQueries.hashBucket("doc_id", 1, 100) < 90,
            lit("train")).otherwise(lit("eval")).as("split"))
        .groupBy(col("split"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    }),

    // ---- repeated-span copy detection: 64-char windows sampled every
    // 32 chars (stride halves the window so any >=96-char copied run is
    // guaranteed to align in at least one window), grouped by digest —
    // spans seen in 2+ distinct docs are copied boilerplate/templates.
    // The substring-granularity complement to doc-level dedup (q20/q21):
    // finds partial copies those can't. Group keys are 16-byte digests;
    // the span text itself survives as a map-side-combined min, so the
    // shuffle carries at most one 64-char example per (partition, key).
    "q104_repeated_spans" -> ((s, d) => {
      val sp = Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(1),
            greatest(length(col("text")) - 63, lit(1)),
            lit(32))).as("p"))
        .select(col("doc_id"), expr("substr(text, p, 64)").as("sh"))
      sp.select(col("doc_id"), col("sh"),
          md5(col("sh").cast("binary")).as("span_hash"))
        .groupBy(col("span_hash"))
        .agg(min(col("sh")).as("span"),
          countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occ"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("n_occ").desc, col("span_hash").asc)
        .limit(20)
    }),

    // ---- cross-source contamination matrix: shared distinct 8-gram
    // count for every source pair — the diagnostic that tells a mix
    // designer whether two "independent" sources are actually mirrors.
    // Join fan-out is structurally bounded: the join key set is
    // DISTINCT (source, digest), so a digest emits at most
    // C(n_sources, 2) pairs however often it repeats inside sources.
    "q105_source_overlap" -> ((s, d) =>
      sourceOverlap(s, d)
        .select(col("src_a"), col("src_b"),
          col("w").as("shared_8grams"))),

    // ---- sequence PACKING (concat-and-cut): per source, documents in
    // doc_id order are concatenated into one token stream and cut into
    // 2048-token context windows; each doc learns its start offset,
    // first bin, and last bin — the physical training-batch layout
    // step after curation. The running total is a TWO-PHASE prefix sum
    // (operators/Prefix.scala): a Window.partitionBy(source) running
    // sum would serialize each source through one reducer — with a
    // handful of sources at 100 TB, a handful of tasks own the entire
    // corpus. Prefix.runningSum chunks on broadcast doc_id quantiles,
    // broadcasts cumulative chunk offsets back, and windows only within
    // (source, chunk) — same output (doc_id is unique per source), with
    // parallelism that scales with data instead of capping at nSources.
    "q110_sequence_packing" -> ((s, d) => {
      val win = 2048
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("bigint").as("n_toks"))
      graft.operators.Prefix
        .runningSum(docs, "source", "doc_id", "n_toks", "cum")
        .select(col("doc_id"), col("source"), col("n_toks"),
          (col("cum") - col("n_toks")).as("tok_offset"),
          expr(s"(cum - n_toks) div $win").as("bin_first"),
          expr(s"(cum - 1) div $win").as("bin_last"))
    }),

    // ---- BPE vocabulary induction: the top-5 byte-pair merges learned
    // from the corpus vocabulary (freq-weighted adjacent-pair counts,
    // greedy merge, ties to the smallest pair) — tokenizer training's
    // core loop, with the pair counting running as the custom
    // PairCountAgg Aggregator (map-side-combined pair→count maps; see
    // functions/Bpe.scala for the scale and determinism story).
    "q115_bpe_merges" -> ((s, d) => {
      import s.implicits._
      graft.functions.Bpe
        .learn(Tables.documents(s, d), "text", rounds = BpeRounds,
          vocabCap = BpeVocabCap)
        .toDF()
    }),

    // ---- count-min heavy-hitter audit: CMS point estimates for the
    // exact top-20 tokens, verdict = estimate within the sketch's
    // overcount bound (est ≥ exact always; est ≤ exact + 8N/w with the
    // min over d=4 rows — Markov per row at 1/8, all-rows failure
    // ~1e-4, and for FIXED data the verdict is deterministic, verified
    // at every test sf). The audit is the q74/q64 discipline applied to
    // frequency sketching: validate CMS against exact on a tractable
    // slice before trusting it where the distinct-token table itself
    // is the scale problem. The sketch build is one map-side-combined
    // pass (functions/Cms.scala); only ≤ d·2^16 counter cells shuffle.
    "q118_cms_heavyhitters" -> ((s, d) => {
      import graft.functions.Cms
      val toks = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
      val sk = Cms.build(toks, "tok")
      val tot = toks.agg(count(lit(1)).as("n_total"))
      val slack = call_function("div", col("n_total") * 8L, lit(65536L))
      val est = Cms.estimate(col("cms"), col("tok"))
      toks.groupBy(col("tok"))
        .agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("tok").asc)
        .limit(20)
        .crossJoin(broadcast(sk))
        .crossJoin(broadcast(tot))
        .select(col("tok"), col("exact_cnt"),
          (est >= col("exact_cnt") &&
            est <= col("exact_cnt") + slack).as("within_bound"))
    }),

    // ---- sketch-merge audit: the INCREMENTAL-maintenance contract for
    // the sketch family. Three per-batch CMS sketches (doc_id%3 splits)
    // merged cell-wise must probe IDENTICALLY to the sketch built over
    // the whole corpus — counter sums commute, so per-day batch
    // sketches fold into a running corpus sketch with no history
    // rescan (the q96/q77 incremental discipline applied to sketches).
    // The verdict column asserts probe equality for the exact top-20
    // tokens; any merge defect (cell misalignment, seed drift between
    // builds) breaks it deterministically.
    "q121_sketch_merge_audit" -> ((s, d) => {
      import graft.functions.Cms
      def toks(p: Int) = Tables.documents(s, d)
        .filter(col("doc_id") % 3 === p)
        .select(explode(split(col("text"), " ")).as("tok"))
      val all = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
      val whole = Cms.build(all, "tok")
      val merged = Cms.build(toks(0), "tok").select(col("cms").as("c0"))
        .crossJoin(Cms.build(toks(1), "tok").select(col("cms").as("c1")))
        .crossJoin(Cms.build(toks(2), "tok").select(col("cms").as("c2")))
        .select(Cms.merge(Cms.merge(col("c0"), col("c1")), col("c2"))
          .as("cmerged"))
      all.groupBy(col("tok")).agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("tok").asc).limit(20)
        .crossJoin(broadcast(whole))
        .crossJoin(broadcast(merged))
        .select(col("tok"), col("exact_cnt"),
          (Cms.estimate(col("cms"), col("tok")) ===
            Cms.estimate(col("cmerged"), col("tok"))).as("merge_exact"))
    }),

    // ---- BPE ENCODE: apply q115's learned merges to tokenize the
    // whole corpus — training's other half (learn once, encode every
    // doc). Encoding runs at VOCAB grain: each distinct word is
    // symbolized and merged once, then word-level token counts join
    // back onto (doc, word) occurrence counts — repeated words are
    // never re-encoded, the same collapse that makes BPE encoding
    // corpus-size-independent at 100 TB (the distinct-word table is
    // tiny relative to the corpus). The learned merge list is a
    // handful of rows collected driver-side — index-build pattern, the
    // same contract as the k-means centroids (q113), not per-row work.
    "q119_bpe_encode" -> ((s, d) => bpeDocTokens(s, d)),

    // ---- TOKENIZER FERTILITY audit: BPE tokens emitted per whitespace
    // word, reported per language — the table a tokenizer owner reads
    // before shipping a vocab (high-fertility languages pay more
    // compute per word; the fix is more merges or per-lang vocab).
    // Rides q119's vocab-grain encode (distinct words encoded once),
    // then collapses to one row per language before the division —
    // fertility is a SINGLE double division of two exact longs, the
    // only float op in the query. At 100 TB the pre-division aggregate
    // is map-combined to n_langs rows.
    "q133_tokenizer_fertility" -> ((s, d) => {
      val words = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_words"))
      bpeDocTokens(s, d).join(words, "doc_id")
        .groupBy(col("lang"))
        .agg(sum(col("n_bpe_tokens")).as("n_bpe_tokens"),
          sum(col("n_words")).as("n_words"))
        .select(col("lang"), col("n_bpe_tokens"), col("n_words"),
          (col("n_bpe_tokens").cast("double")
            / col("n_words").cast("double")).as("fertility"))
    }),

    // ---- domain PAGERANK (crawl-prioritization / source-authority
    // weighting): 3-round power iteration over the q105 source-overlap
    // graph (edge weight = shared distinct 8-grams), the link-analysis
    // signal a crawl scheduler or mixture designer weighs sources by.
    // The suite's one other graph operator (q62) is connectivity; this
    // is iterative value propagation. Fixed-point INTEGER arithmetic
    // throughout — rank scale 1e6, damping 85/100, truncating long
    // division (both engines truncate on non-negative operands) — so
    // 3 unrolled rounds replay bit-for-bit in DuckDB with no libm.
    // Scale shape: each round is one edge⋈rank equi-join + one
    // map-combinable per-node sum — rank state stays at node grain
    // (domains: millions of rows at 100 TB, never broadcast), edges at
    // pair grain; rounds are fixed (3), so the whole thing is one lazy
    // 3-stage plan, no driver iteration or collect. r·w products peak
    // at SCALE·Σw ≈ 1e6·1e9 at 100 TB — inside long range; DECIMAL(38,0)
    // is the documented headroom past that.
    //
    // edges/nodes are PERSISTed (the standard Spark iterative-graph
    // posture, and the fix SURVEY §4 prescribes for the reference's
    // own no-cache recomputation anti-pattern): without it, each
    // round's lineage re-inlines the whole edge build — the unpersisted
    // plan carries 64 parquet scans of `documents` and re-runs the
    // shingle distinct once per reference (measured 2.8 s at sf0.1 /
    // 94 s at 100×; persisted: the corpus is scanned once). Both go
    // through Shared.frame (VERDICT r10 #3): the run-level frameCache
    // owns the lifecycle — one materialization per run shared across
    // bench reps, tracked in the shared_builds ledger, released by
    // reset() — where a raw in-query persist leaked a fresh copy per
    // rep for session lifetime (~10⁷ rows per leak at 100 TB).
    "q141_domain_pagerank" -> ((s, d) => {
      val edges = Shared.frame(s, "pagerank_edges", d) {
        val half = sourceOverlap(s, d)
        half.select(col("src_a").as("u"), col("src_b").as("v"),
            col("w"))
          .unionByName(half.select(col("src_b").as("u"),
            col("src_a").as("v"), col("w")))
      }
      val strength = edges.groupBy(col("u")).agg(sum(col("w")).as("st"))
      val e = edges.join(strength, "u")
      val nodes = Shared.frame(s, "pagerank_nodes", d)(
        Tables.documents(s, d).select(col("source")).distinct())
      val r3 = (1 to 3).foldLeft(
        nodes.select(col("source"), lit(1000000L).as("r"))) { (rank, _) =>
        val contrib = e.join(rank, e("u") === rank("source"))
          .select(col("v"), expr("(r * w) div st").as("c"))
          .groupBy(col("v")).agg(sum(col("c")).as("cs"))
        nodes.join(contrib, nodes("source") === contrib("v"), "left")
          .select(nodes("source"),
            expr("cast(150000 + (coalesce(cs, 0L) * 85) div 100" +
              " as bigint)").as("r"))
      }
      r3.join(strength, r3("source") === strength("u"), "left")
        .select(r3("source"), col("r").as("rank"),
          coalesce(col("st"), lit(0L)).as("strength"))
    }),

    // ---- PADDING-WASTE audit (length-bucketed batching): the
    // training-efficiency ledger behind q110's packing — if sequences
    // batch by padded length instead of concat-and-cut, how many pad
    // tokens does 64-token bucketing burn vs naive pad-to-global-max?
    // bucket = next multiple of 64, per-bucket docs/tokens/padding,
    // naive padding against the corpus max via the one-row broadcast
    // scalar idiom. Single scan, one map-combined aggregate to
    // n_buckets rows; all-integer (house determinism rule).
    "q142_padding_waste" -> ((s, d) => {
      val t = Tables.documents(s, d)
        .select(size(split(col("text"), " ")).cast("bigint").as("n_toks"))
      val mx = t.agg(max(col("n_toks")).as("mx"))
      t.crossJoin(broadcast(mx))
        .withColumn("bucket", expr("((n_toks + 63) div 64) * 64"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("toks"),
          sum(col("bucket") - col("n_toks")).as("pad_bucketed"),
          sum(col("mx") - col("n_toks")).as("pad_naive"))
    }),

    // ---- duplicated-span SCRUB (document rewrite): the C4/RefinedWeb
    // "remove any span that occurs verbatim elsewhere in the corpus"
    // step, at non-overlapping 8-word-block granularity. Every other
    // dedup in the suite flags or selects documents; this one REWRITES
    // them — blocks shared by >= 2 distinct docs are cut and the text
    // reassembled in order (cf. Task_4-style cleaning in the reference,
    // clean_load_3_ld_staging.py:54-63, lifted from row grain to span
    // grain). Scale shape: the block inventory shuffles only (16-byte
    // digest, doc_id, int block_id) — never block text; the removal
    // list folds to doc grain (id + int array) before it rejoins the
    // bodies, so bodies cross at most one exchange (AQE broadcasts the
    // removal side when it is small, the common case). The rewrite
    // itself is map-side array surgery on the scanned row: blocks are
    // recomputed in-row with transform/slice and cut with an indexed
    // lambda filter, so cleaned text never materializes pre-shuffle.
    // Output carries md5 + length of the cleaned text, not the text —
    // the oracle checks content without hauling bodies.
    "q139_dup_span_scrub" -> ((s, d) => {
      val B = 8
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .withColumn("blocks", expr(
          s"transform(sequence(0, (size(words)-1) div $B)," +
            s" i -> array_join(slice(words, i*$B + 1, $B), ' '))"))
      val bl = docs
        .select(col("doc_id"),
          posexplode(col("blocks")).as(Seq("block_id", "btext")))
        .select(col("doc_id"), col("block_id"),
          md5(col("btext").cast("binary")).as("h"))
      val dup = bl.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).select(col("h"))
      val removed = bl.join(dup, "h")
        .groupBy(col("doc_id"))
        .agg(collect_set(col("block_id")).as("rm"),
          count(lit(1)).as("n_removed"))
      docs.join(removed, Seq("doc_id"), "left")
        .withColumn("clean", expr(
          "array_join(filter(blocks, (x, i) -> " +
            "rm IS NULL OR NOT array_contains(rm, i)), ' ')"))
        .select(col("doc_id"),
          size(col("blocks")).cast("bigint").as("n_blocks"),
          coalesce(col("n_removed"), lit(0L)).as("n_removed"),
          md5(col("clean").cast("binary")).as("clean_md5"),
          length(col("clean")).cast("bigint").as("clean_chars"))
    }),

    // ---- per-source BOILERPLATE detection: blocks recurring across a
    // source's documents (nav bars, footers, license banners — the
    // within-source complement of q139's corpus-wide scrub and q104's
    // overlapping-span report). Group keys are (source, digest); the
    // example text survives as a map-side-combined min so the shuffle
    // carries one sample per (partition, key). The per-source doc
    // count is a tiny broadcast; the >= 5%-of-docs decision is integer
    // cross-multiplication (house determinism rule — no doubles).
    "q140_boilerplate_blocks" -> ((s, d) => {
      val B = 8
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          split(col("text"), " ").as("words"))
        .withColumn("btext", explode(expr(
          s"transform(sequence(0, (size(words)-1) div $B)," +
            s" i -> array_join(slice(words, i*$B + 1, $B), ' '))")))
      val srcSz = docs.groupBy(col("source"))
        .agg(countDistinct(col("doc_id")).as("n_src_docs"))
      docs
        .groupBy(col("source"), md5(col("btext").cast("binary")).as("h"))
        .agg(min(col("btext")).as("span"),
          countDistinct(col("doc_id")).as("n_docs"))
        .join(broadcast(srcSz), "source")
        .filter(col("n_docs") >= 2 &&
          col("n_docs") * 20 >= col("n_src_docs"))
        .select(col("source"), col("span"), col("n_docs"),
          col("n_src_docs"))
    }),

    // ---- reserved-token scrub: count + redact configured tokens
    // (PII-scrub plumbing — the regex is a stand-in; the corpus has no
    // real PII). Spark regexp_replace replaces all matches; DuckDB needs
    // the 'g' flag — encoded in the oracle.
    "q56_scrub" -> ((s, d) => {
      val pat = "key|value|data"
      Tables.documents(s, d).select(
        col("doc_id"),
        regexp_count(col("text"), lit(pat)).as("n_hits"),
        md5(regexp_replace(col("text"), pat, "<REDACTED>").cast("binary"))
          .as("redacted_fp"))
    }),

    // ---- VOCABULARY-GROWTH CURVE (Heaps'-law audit): cumulative
    // distinct-type count vs cumulative token count at corpus deciles —
    // the curve that sizes a tokenizer vocabulary (where does type
    // growth flatten?) and catches template corpora (near-flat curve)
    // before BPE training (q115) commits to a vocab. Doc order is
    // doc_id ascending; decile boundaries are value-at-rank doc_ids
    // from the q175 histogram idiom (one constant-key two-phase prefix
    // over DISTINCT doc_ids — never a global row_number window). Each
    // type's first-occurrence doc is one map-combined min per token;
    // its decile falls out of a 10-element broadcast threshold array
    // in-row. The only full-width shuffle is token→min(doc_id) — the
    // same vocabulary-grain exchange every corpus statistic here pays —
    // and the final cumulative window runs over exactly 10 rows.
    "q200_vocab_growth" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val hist = docs.select(lit(1).as("grp"), col("doc_id"))
        .groupBy(col("grp"), col("doc_id")).agg(count(lit(1)).as("cnt"))
      val cum = graft.operators.Prefix.runningSum(
        hist, "grp", "doc_id", "cnt", "cum")
      val tot = hist.groupBy(col("grp")).agg(sum(col("cnt")).as("n"))
      val thAggs = (1 to 10).map(k => min(when(col("cum") * 10
        >= col("n") * k, col("doc_id"))).as(s"t$k"))
      val ths = cum.join(broadcast(tot), "grp")
        .groupBy(col("grp"))
        .agg(thAggs.head, thAggs.tail: _*)
        .select(array((1 to 10).map(k => col(s"t$k")): _*).as("ts"))
      // decile = 1 + #thresholds strictly below the doc id (t10 = max
      // doc_id, so every doc lands in 1..10). Assumes n >= 10 docs
      // (ADVICE r7): below that, decile threshold doc_ids t1..t10
      // collide, some decile numbers are skipped, and fewer than 10
      // rows emerge — both engines degrade identically (the oracle
      // mirrors the same threshold construction), but the "exactly 10
      // rows" reading of the output only holds at n >= 10.
      val occ = docs
        .select(col("doc_id"), size(split(col("text"), " ")).as("toks"))
        .crossJoin(broadcast(ths))
        .select(expr("size(filter(ts, t -> t < doc_id)) + 1").as("decile"),
          col("toks"))
        .groupBy(col("decile")).agg(sum(col("toks")).as("toks"))
      val newTypes = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(min(col("doc_id")).as("fd"))
        .crossJoin(broadcast(ths))
        .select(expr("size(filter(ts, t -> t < fd)) + 1").as("decile"))
        .groupBy(col("decile")).agg(count(lit(1)).as("new_types"))
      val w10 = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      occ.join(newTypes, Seq("decile"), "left")
        .select(col("decile"), col("toks"),
          coalesce(col("new_types"), lit(0L)).as("new_types"))
        .select(col("decile"), col("toks"), col("new_types"),
          sum(col("new_types")).over(w10).as("cum_types"),
          sum(col("toks")).over(w10).as("cum_toks"))
    }),

    // ---- per-source LENGTH-DISTRIBUTION audit: exact quartiles of
    // token count per source plus Tukey-fence outliers (x outside
    // [q1 − 1.5·IQR, q3 + 1.5·IQR]) — the robust per-stratum length
    // profile a mixture designer reads before weighting sources (a
    // source whose q3 is under the context window packs differently
    // than one whose q1 is over it). All three quartiles come from ONE
    // Quantile.groupQuantiles refinement (three map-combined aggregates
    // total — per-source stats, a sources × 8192 bucket histogram, and
    // an exact value count inside only the rank-target buckets; no
    // window, no sort, driver state planner-scale and LIMIT-guarded).
    // Quartile values are actual data values (rank ⌈p·n⌉ —
    // percentile_disc-identical); token counts are small integers, so
    // the fence arithmetic (−, ×1.5, compare) is exact in IEEE doubles
    // and bit-identical cross-engine. The quartile frame broadcasts
    // back; the only corpus-wide work is linear scans.
    "q201_source_quartiles" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("source"),
          size(split(col("text"), " ")).cast("double").as("t"))
      val qs = graft.operators.Quantile.groupQuantiles(
        toks, "source", "t", Seq(0.25 -> "q1", 0.5 -> "med", 0.75 -> "q3"))
      val iqr = col("q3") - col("q1")
      toks.join(broadcast(qs), "source")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          max(col("q1")).as("q1"), max(col("med")).as("med"),
          max(col("q3")).as("q3"),
          sum(when(col("t") < col("q1") - iqr * 1.5
              || col("t") > col("q3") + iqr * 1.5, 1L).otherwise(0L))
            .as("n_tukey_outliers"))
    }),

    // ---- CORE-VOCABULARY coverage (doc typicality): what share of the
    // corpus's top-K words (by global count, ties word-asc — the
    // deterministic cut) does each document's distinct-word set cover?
    // A low-coverage doc speaks a different register than the corpus —
    // the cheap typicality signal curriculum/mixture designers pair
    // with q26's intrinsic quality score. K = 10 here (the synthetic
    // corpus carries ~31 types; production uses 10⁴–10⁵ against a
    // real vocabulary — same plan). Plan shape at 100 TB: one
    // map-combined word count, a K-row TakeOrdered heap (never a
    // global sort), the K-row vocab BROADCAST into a semi-join against
    // the distinct (doc, word) frame, two map-combined per-doc counts;
    // the only corpus-grain exchanges are the (doc, word) distinct and
    // the vocabulary count every corpus statistic here pays. Coverage
    // ratio is integer (×1000 floor-div).
    "q203_vocab_coverage" -> ((s, d) => {
      val words = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val vocab = words.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w").asc).limit(10)
        .select(col("w"))
      val dw = words.distinct()
      val perDoc = dw.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_distinct"))
      val cov = dw.join(broadcast(vocab), Seq("w"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_covered"))
      perDoc.join(cov, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_distinct"),
          coalesce(col("n_covered"), lit(0L)).as("n_covered"),
          expr("coalesce(n_covered, 0L) * 1000 div n_distinct")
            .as("coverage_x1000"))
    }),

    // ---- SOURCE-vs-CORPUS unigram divergence (total variation
    // distance): TVD_s = ½·Σ_w |c_sw/n_s − c_w/N| per source — the
    // mixture designer's "which strata speak a different language than
    // the blend" audit next to q137's batch-drift gate (that one tests
    // a 64-bucket sketch against a 1-pp threshold; this reports the
    // exact word-grain statistic per source). Cross-multiplied to
    // integers like q137: per-word term |c_sw·N − c_w·n_s|, summed in
    // DECIMAL(18,0) products so no long ever overflows (each operand is
    // a token count; the 36-digit product headroom covers any corpus
    // whose count pairs stay under 10^18 each). Absent words need no
    // outer join: Σ over the FULL vocabulary equals
    // Σ_{w: c_sw>0} (|c_sw·N − c_w·n_s| − c_w·n_s) + n_s·N, because an
    // absent word contributes exactly c_w·n_s and Σ_all c_w = N. Plan:
    // one (source, word) count (the only corpus-grain exchange), word
    // totals re-aggregated from those partials (never from raw tokens),
    // a word-grain join of the two count frames, and source/corpus
    // totals broadcast — at 100 TB nothing wider than the vocabulary
    // ever shuffles twice. tvd_ppm = 0 ⟺ identical distribution;
    // 1e6 ⟺ disjoint vocabulary.
    "q205_source_divergence" -> ((s, d) => {
      def d18(c: org.apache.spark.sql.Column) = c.cast("decimal(18,0)")
      val sw = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      val wt = sw.groupBy(col("tok")).agg(sum(col("c")).as("cw"))
      val st = sw.groupBy(col("source")).agg(sum(col("c")).as("ns"))
      val tot = sw.agg(sum(col("c")).as("nn"))
      sw.join(wt, "tok")
        .join(broadcast(st), "source")
        .crossJoin(broadcast(tot))
        .groupBy(col("source"), col("ns"), col("nn"))
        .agg(sum(abs(d18(col("c")) * d18(col("nn"))
            - d18(col("cw")) * d18(col("ns")))
          - d18(col("cw")) * d18(col("ns"))).as("part"))
        .select(col("source"), col("ns").as("n_tokens"),
          expr("((part + CAST(ns AS DECIMAL(18,0)) * CAST(nn AS " +
            "DECIMAL(18,0))) * 1000000) div (CAST(ns AS DECIMAL(18,0)) " +
            "* CAST(nn AS DECIMAL(18,0)) * 2)").as("tvd_ppm"))
    }),

    // ---- per-source LENGTH CONCENTRATION (Gini coefficient of doc
    // token counts): q201 reads the quartile profile, this reads the
    // inequality — a source whose token mass concentrates in a few
    // giant docs packs (q110) and samples (q93) very differently from
    // an even one at the same total. Computed WITHOUT a per-source
    // sort window (20 source keys over a corpus-sized input is exactly
    // the single-reducer window PlanReport flags): token counts are
    // small integers, so the (source, toks) HISTOGRAM is tiny, and the
    // mean-absolute-difference identity on the value-sorted histogram
    //   Σ_{i,j} |x_i − x_j| = 2·Σ_v c_v·(v·C_<v − S_<v)
    // (C_<v / S_<v = count/sum of values strictly below v) needs only
    // two histogram-grain running sums — both through Prefix.runningSum,
    // the two-phase prefix sum that never serializes a corpus through
    // one reducer. gini_ppm = Σ|x_i−x_j|·1e6 div (2·n·Σx), all exact
    // integers (bounded by n²·max_toks·1e6 — switch the products to the
    // q205 DECIMAL discipline past ~10^9 docs per source).
    // The histogram-identity kernel lives in operators/Stats.giniPpm
    // (PropertySpec: naive rank-formula equality + exact scale
    // invariance); this query is the per-source doc-length
    // instantiation.
    "q208_length_gini" -> ((s, d) => {
      graft.operators.Stats.giniPpm(
          Tables.documents(s, d)
            .select(col("source"),
              size(split(col("text"), " ")).cast("bigint").as("toks")),
          "source", "toks")
        .withColumnRenamed("n_rows", "n_docs")
        .withColumnRenamed("sum_vals", "sum_toks")
    }),

    // ---- CLASSIFIER CALIBRATION audit (reliability deciles): bin the
    // q124 fastText-shape quality score into exact score deciles and
    // report, per bin, how often an INDEPENDENT reference signal (the
    // q26-family lexical-diversity gate, integer form
    // 2·uniq_tokens ≥ n_tokens) agrees — the reliability diagram a
    // pipeline reads before trusting a learned filter's threshold at
    // scale (a well-calibrated score is monotone in ref_ppm; a flat
    // curve means the classifier adds nothing over its prior). Decile
    // thresholds come from Quantile.groupQuantiles (exact
    // percentile_disc ranks via three map-combined aggregates — no
    // global sort/window over the row-cardinality score frame), the
    // 9-row threshold array broadcasts, and bin assignment is the q200
    // "1 + #thresholds strictly below" rule — ties collapse
    // identically in both engines. One token-grain pass computes score
    // AND the reference counts together. All reported ratios are
    // integer ppm / floor means.
    "q209_calibration" -> ((s, d) => {
      val perDoc = qualitySignals(s, d)
        .withColumnRenamed("uniq", "uniq_tokens")
        .withColumn("grp", lit(1))
      val ths = graft.operators.Quantile.groupQuantiles(
        perDoc.withColumn("sc", col("score").cast("double")), "grp", "sc",
        (1 to 9).map(k => (k / 10.0, s"t$k")))
      val thArr = ths.select(
        array((1 to 9).map(k => col(s"t$k")): _*).as("ts"))
      perDoc.crossJoin(broadcast(thArr))
        .select(
          expr("size(filter(ts, t -> t < CAST(score AS DOUBLE))) + 1")
            .as("bin"),
          col("score"),
          (col("uniq_tokens") * 2 >= col("n_tokens")).as("ref"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("ref"), 1L).otherwise(0L)).as("n_ref_pos"),
          sum(col("score")).as("sum_score"))
        // sum_score is reported raw, not as a floor mean: scores can be
        // negative, and Spark's `div` truncates toward zero while
        // DuckDB's `//` floors — the exact sum sidesteps the only
        // sign-dependent arithmetic in the query
        .select(col("bin"), col("n_docs"), col("n_ref_pos"),
          expr("n_ref_pos * 1000000 div n_docs").as("ref_ppm"),
          col("sum_score"))
    }),

    // ---- frequency-OCTAVE spectrum (Zipf's-law audit, the rank-free
    // form): q200 reads vocabulary GROWTH over the corpus; this reads
    // the frequency DISTRIBUTION of the finished vocabulary — types
    // per ⌊log2(count)⌋ octave. Under Zipf with exponent α the type
    // count per octave contracts by ≈2^(1/α) octave-over-octave, so
    // the reported ratio_x1000 between consecutive PRESENT octaves is
    // the slope diagnostic (a template corpus shows a hollow spectrum;
    // natural text a smooth geometric decay). Rank-free on purpose:
    // assigning Zipf RANKS needs a vocabulary-wide sort/row_number,
    // but the octave is a per-row bit-length (the q195
    // length(bin(c))−1 idiom — no libm), so the whole audit is one
    // word count plus a map-combined octave fold; the lead() window
    // rides the ≤64-row octave frame. Integer-exact throughout;
    // ratio_x1000 is NULL on the last present octave (both engines).
    "q213_zipf_octaves" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wc = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      wc.select((length(expr("bin(c)")) - 1).cast("bigint").as("octave"),
          col("c"))
        .groupBy(col("octave"))
        .agg(count(lit(1)).as("n_types"), sum(col("c")).as("occ"))
        .withColumn("ratio_x1000",
          expr("n_types * 1000 div lead(n_types) " +
            "over (order by octave)"))
    }),

    // ---- per-source LENGTH-TREND audit (exact OLS normal equations):
    // is a source's document length drifting over ingest order
    // (doc_id as the arrival proxy — the q137/q96 convention)? A
    // shrinking-length source usually means truncation or scraper rot;
    // the mixture designer wants the trend BEFORE the mean moves. The
    // OLS slope over (x = doc_id, y = token count) is sxy/sxx with
    // sxy = n·Σxy − Σx·Σy and sxx = n·Σx² − (Σx)² — both EXACT
    // integers from one map-combined pass of five sums; reported raw
    // (numerator, non-negative denominator, and the sign verdict
    // sxy > 0) rather than as a floored quotient, because sxy can be
    // negative and Spark div truncates where DuckDB // floors (the
    // q209 sign rule). The moments and cross-products run in
    // DECIMAL(38,0) (the q205/q229 discipline) — the round-10 10×
    // clone smoke crossed the old BIGINT envelope (n·Σx² overflows
    // past ~10⁶ docs·id² per stratum) and ANSI Spark failed loudly;
    // DECIMAL holds to ~10³⁸, and the outputs ship as double (exact
    // below 2⁵³, correctly-rounded and engine-identical above).
    "q214_length_trend" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("source"), col("doc_id").cast("decimal(19,0)").as("x"),
          size(split(col("text"), " ")).cast("decimal(19,0)").as("y"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).cast("decimal(38,0)").as("sx"),
          sum(col("y")).cast("decimal(38,0)").as("sy"),
          sum(expr("CAST(x * y AS DECIMAL(38,0))")).as("sxy"),
          sum(expr("CAST(x * x AS DECIMAL(38,0))")).as("sxx"))
        .select(col("source"), col("n"),
          (col("n") * col("sxy") - col("sx") * col("sy"))
            .cast("double").as("slope_num"),
          (col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("double").as("slope_den"),
          ((col("n") * col("sxy") - col("sx") * col("sy")) > 0)
            .as("rising"))
    }),

    // ---- MULTI-SIGNAL quality ensemble (decile-rank fusion): no
    // single quality signal survives contact with a real corpus, so
    // curation stacks use rank-fused ensembles — each signal mapped to
    // its own decile (making incomparable scales commensurable), then
    // summed. Three INDEPENDENT per-doc signals from ONE token pass:
    // the q124 learned score, lexical diversity uniq·1000 div n (q26's
    // strongest factor, integer form), and raw token length. Each gets
    // exact decile thresholds via Quantile.groupQuantiles (rank-exact,
    // no global sort), broadcast as three 9-row arrays; bins use the
    // q200 strictly-below rule. ensemble ∈ [3, 30]; keep at ≥ 18 (the
    // pinned top-half-ish gate). The q135 RRF shape applied to quality
    // instead of retrieval. One corpus-grain aggregate + planner-scale
    // threshold passes — the 100 TB cost is the token pass everything
    // here shares.
    "q216_quality_ensemble" -> ((s, d) => {
      val perDoc = qualitySignals(s, d)
        .withColumnRenamed("score", "s1")
        .withColumn("s2", expr("uniq * 1000 div n_tokens"))
        .withColumn("s3", col("n_tokens"))
        .withColumn("grp", lit(1))
      // r13 (the q269 move): all THREE signals' decile thresholds from
      // ONE stacked groupQuantiles call — the refinement's three
      // aggregate passes run once over 3n rows instead of three times
      // over n (9 planner actions → 3). Per-cid groups see exactly the
      // rows the three separate calls saw; thresholds bit-identical.
      val stacked = perDoc.select(explode(array(
          struct(lit(1).as("cid"), col("s1").cast("double").as("v")),
          struct(lit(2).as("cid"), col("s2").cast("double").as("v")),
          struct(lit(3).as("cid"),
            col("s3").cast("double").as("v")))).as("x"))
        .select(col("x.cid").as("cid"), col("x.v").as("v"))
      val th = graft.operators.Quantile.groupQuantiles(
        stacked, "cid", "v", (1 to 9).map(k => (k / 10.0, s"t$k")))
      val ths = Seq("s1" -> 1, "s2" -> 2, "s3" -> 3).map { case (c, cid) =>
        th.filter(col("cid") === cid)
          .select(array((1 to 9).map(k => col(s"t$k")): _*).as(s"ts_$c"))
      }
      val withBins = ths.foldLeft(perDoc)((acc, t) =>
        acc.crossJoin(broadcast(t)))
      Seq("s1", "s2", "s3").foldLeft(withBins) { (acc, c) =>
          acc.withColumn(s"d_$c",
            expr(s"size(filter(ts_$c, t -> t < CAST($c AS DOUBLE))) + 1"))
        }
        .select(col("doc_id"), col("d_s1"), col("d_s2"), col("d_s3"),
          (col("d_s1") + col("d_s2") + col("d_s3")).as("ensemble"))
        .withColumn("keep", col("ensemble") >= 18)
    }),

    // ---- INTER-RATER AGREEMENT (Cohen's kappa) between two quality
    // gates: q124's learned keep (score ≥ 0) vs the heuristic
    // lexical-diversity gate (2·uniq ≥ n). Raw accuracy overstates
    // agreement when both gates mostly say "keep"; kappa discounts the
    // chance-agreement floor — the standard check before one gate is
    // allowed to stand in for the other at scale. Exact integers
    // end-to-end: po = (a+d)/N and pe = ((a+b)(a+c)+(c+d)(b+d))/N²
    // stay rational, kappa = (po−pe)/(1−pe) is reported as raw
    // numerator (a+d)·N − pe_num over denominator N² − pe_num
    // (negative numerators possible — the q209/q214 raw-fraction
    // rule), and the "substantial agreement" verdict κ > 0.4 is the
    // cross-multiplication 10·num > 4·den. One confusion-matrix
    // aggregate over the shared token pass; the kappa arithmetic is
    // planner-scale.
    "q217_gate_kappa" -> ((s, d) => {
      val conf = qualitySignals(s, d)
        .select((col("score") >= 0).as("g1"),
          (col("uniq") * 2 >= col("n_tokens")).as("g2"))
        .agg(
          sum(when(col("g1") && col("g2"), 1L).otherwise(0L)).as("a"),
          sum(when(col("g1") && !col("g2"), 1L).otherwise(0L)).as("b"),
          sum(when(!col("g1") && col("g2"), 1L).otherwise(0L)).as("c"),
          sum(when(!col("g1") && !col("g2"), 1L).otherwise(0L)).as("d"))
      conf.select(col("a"), col("b"), col("c"), col("d"),
          ((col("a") + col("b")) * (col("a") + col("c"))
            + (col("c") + col("d")) * (col("b") + col("d"))).as("pe_num"),
          (col("a") + col("b") + col("c") + col("d")).as("nn"))
        .select(col("a"), col("b"), col("c"), col("d"),
          ((col("a") + col("d")) * col("nn") - col("pe_num"))
            .as("kappa_num"),
          (col("nn") * col("nn") - col("pe_num")).as("kappa_den"))
        .withColumn("substantial",
          col("kappa_num") * 10 > col("kappa_den") * 4)
    }),

    // ---- TOKEN-WEIGHTED median length (truncation planning): the doc
    // length below which HALF THE TOKENS sit — not half the documents
    // (q201's quartiles). A context-window cut at the doc-count median
    // can still truncate most of the token mass when long docs carry
    // it; this is the number the packing/truncation policy actually
    // needs. Value-at-rank on the (source, toks) histogram weighted by
    // token MASS (toks·cnt), cumulated through the driver-grid
    // Grid.cumSum (no per-source sort window — the q208 discipline;
    // r13: the histogram is planner-scale BY the lenHist contract, so
    // the two-phase Prefix's quantile+partials jobs and its window
    // were three Spark jobs to compute what one bounded fetch can),
    // answer = min length with 2·cum_mass ≥ total_mass. Integer-exact.
    "q226_token_weighted_median" -> ((s, d) => {
      // rides the run-shared length histogram (one doc scan per run,
      // shared with q258/q260); mass derives in-row
      val hist = lenHist(s, d)
        .withColumn("mass", col("toks") * col("cnt"))
      val cum = graft.operators.Grid.cumSum(
        hist, "source", "toks", "mass", "cum_m")
      val tot = hist.groupBy(col("source"))
        .agg(sum(col("cnt")).as("n_docs"), sum(col("mass")).as("total_m"))
      cum.join(broadcast(tot), "source")
        .groupBy(col("source"))
        .agg(max(col("n_docs")).as("n_docs"),
          max(col("total_m")).as("total_tokens"),
          min(when(col("cum_m") * 2 >= col("total_m"), col("toks")))
            .as("wmedian_len"))
    }),

    // ---- K-ANONYMITY risk report (governance leg beside q204's PII
    // scrub): under the quasi-identifier triple (lang, source,
    // length-bucket of 50 tokens), how many docs sit in equivalence
    // classes smaller than k = 5 — the re-identification-risk measure
    // a release review reads before publishing per-group statistics.
    // One map-combined group on the QI triple, one 5-row fold to the
    // report: classes, small classes, docs at risk, risk_ppm — all
    // exact integers. At 100 TB this is the cheapest query in the
    // suite (two aggregates, QI cardinality rows between them).
    "q218_k_anonymity" -> ((s, d) => {
      val classes = qiCells(s, d).select(col("lang"), col("source"),
        col("len_bucket"), col("m_cs").as("m"))
      classes.agg(count(lit(1)).as("n_classes"),
          sum(col("m")).as("n_docs"),
          sum(when(col("m") < 5, 1L).otherwise(0L)).as("n_small_classes"),
          sum(when(col("m") < 5, col("m")).otherwise(0L))
            .as("n_docs_at_risk"))
        .select(col("n_classes"), col("n_docs"), col("n_small_classes"),
          col("n_docs_at_risk"),
          expr("n_docs_at_risk * 1000000 div n_docs").as("risk_ppm"))
    }),

    // ---- CO-OCCURRENCE SUPPORT (market-basket over vocabularies):
    // which word PAIRS appear together in the most documents? q88
    // reads ADJACENT bigram lift; this reads unordered within-doc
    // co-occurrence — the itemset-mining primitive behind topic
    // drift and template detection. Scale discipline, two layers:
    // (1) the pair space is quadratic in per-doc distinct words, so
    // candidates are GATED to the top-V vocabulary by document
    // frequency (V = 20, ties word-asc — deterministic; the df-cap
    // discipline of q199/q21) via a broadcast semi-join BEFORE any
    // pair is emitted, capping per-doc fanout at V·(V−1)/2; (2) the
    // frame is DEDUP-STAGED (the q190/q186/sharedCandidatePairs
    // discipline): exact-duplicate families collapse to one canonical
    // row weighted by family size, pairs expand at CANONICAL grain,
    // and support re-weights by Σ family size — bit-identical because
    // clones share the text, hence the vocabulary and every pair
    // (the round-9 100× clone smoke caught raw-grain q219 going
    // super-linear; staged, pair work is clone-invariant). The word
    // set is in-row `array_distinct` (no corpus-wide DISTINCT
    // exchange), support is one map-combined sum, the result a 20-row
    // TakeOrdered heap — never a global sort.
    "q219_cooccurrence" -> ((s, d) => {
      val fam = Tables.documents(s, d)
        .select(md5(col("text")).as("dig"), col("text"))
        .groupBy(col("dig"))
        .agg(count(lit(1)).as("fw"), max(col("text")).as("text"))
      val dw = fam.select(col("dig"), col("fw"),
        explode(array_distinct(split(col("text"), " "))).as("w"))
      val vocab = dw.groupBy(col("w")).agg(sum(col("fw")).as("df"))
        .orderBy(col("df").desc, col("w").asc).limit(20)
        .select(col("w"))
      val gated = dw.join(broadcast(vocab), Seq("w"), "left_semi")
      gated.as("a")
        .join(gated.as("b"), col("a.dig") === col("b.dig")
          && col("a.w") < col("b.w"))
        .groupBy(col("a.w").as("w_a"), col("b.w").as("w_b"))
        .agg(sum(col("a.fw")).as("support"))
        .orderBy(col("support").desc, col("w_a").asc, col("w_b").asc)
        .limit(20)
    }),

    // ---- L-DIVERSITY audit (the governance leg beside q218's
    // k-anonymity): k-anonymity alone still leaks when every member of
    // an equivalence class shares the SENSITIVE value — here, under
    // the quasi-identifier pair (lang, 50-token length bucket), how
    // many classes carry fewer than l = 3 distinct sources (treating
    // provenance as the sensitive attribute a release review must not
    // let a row pin down). One map-combined group on the QI pair with
    // an exact grouped count-distinct, one tiny fold to the ledger —
    // all integers, QI-cardinality rows between the two aggregates.
    "q237_l_diversity" -> ((s, d) => {
      // cells are one row per (class, source), so the class's distinct
      // source count is a plain count(*) over its cells — the exact
      // countDistinct, with the corpus scan already paid by the trio's
      // shared census
      val classes = qiCells(s, d)
        .groupBy(col("lang"), col("len_bucket"))
        .agg(count(lit(1)).as("l"), sum(col("m_cs")).as("m"))
      classes.agg(count(lit(1)).as("n_classes"),
          sum(col("m")).as("n_docs"),
          min(col("l")).as("min_l"),
          sum(when(col("l") < 3, 1L).otherwise(0L))
            .as("n_low_classes"),
          sum(when(col("l") < 3, col("m")).otherwise(0L))
            .as("n_docs_exposed"))
        .select(col("n_classes"), col("n_docs"), col("min_l"),
          col("n_low_classes"), col("n_docs_exposed"),
          expr("n_docs_exposed * 1000000 div n_docs")
            .as("exposed_ppm"))
    }),

    // ---- T-CLOSENESS audit (completing the q218/q237 governance
    // trio): l-diversity still leaks when a class's sensitive-value
    // DISTRIBUTION is skewed vs the corpus (3 distinct sources at
    // 98/1/1% pins a row almost as hard as 1). Per QI class, the
    // categorical earth-mover's distance — which under the uniform
    // ground metric is exactly total variation — between the class's
    // source distribution and the global one: TVD = ½ Σ_s |m_cs/m_c −
    // g_s/N|, exact in fixed point as Σ_s |m_cs·N − g_s·m_c| · 5·10⁵
    // div (m_c·N), with the absent-source term (N − Σ_present g_s)·m_c
    // added in closed form so no class×source dense frame is ever
    // built. Scale: ONE corpus-grain aggregate to (class, source)
    // cells; everything after is cell-grain with the source totals and
    // the 1-row corpus total broadcast. Products ride DECIMAL(38,0)
    // (m_cs·N reaches N² — BIGINT dies at ~3·10⁹ docs, the q229
    // ADVICE discipline). Breach threshold t = 0.2 (200000 ppm).
    "q239_t_closeness" -> ((s, d) => {
      val cells = qiCells(s, d)
      val ctot = cells.groupBy(col("lang"), col("len_bucket"))
        .agg(sum(col("m_cs")).as("m_c"))
      val gtot = cells.groupBy(col("source"))
        .agg(sum(col("m_cs")).as("g_s"))
      val n = gtot.agg(sum(col("g_s")).as("n_total"))
      val per = cells
        .join(broadcast(gtot), "source")
        .join(broadcast(ctot), Seq("lang", "len_bucket"))
        .crossJoin(broadcast(n))
        .groupBy(col("lang"), col("len_bucket"), col("m_c"),
          col("n_total"))
        .agg(sum(abs(col("m_cs").cast("decimal(38,0)") * col("n_total")
            - col("g_s").cast("decimal(38,0)") * col("m_c")))
            .as("a_present"),
          sum(col("g_s")).as("b_present"))
        .select(col("m_c"),
          // integral div (not decimal /): Spark's decimal division
          // ROUNDS while DuckDB's // floors — div truncates, and both
          // operands are positive, so the engines agree exactly
          expr("(a_present + CAST(n_total - b_present AS " +
            "DECIMAL(38,0)) * m_c) * 500000 div " +
            "(CAST(m_c AS DECIMAL(19,0)) * n_total)")
            .as("tvd_ppm"))
      per.agg(count(lit(1)).as("n_classes"),
          max(col("tvd_ppm")).as("max_tvd_ppm"),
          sum(when(col("tvd_ppm") > 200000, 1L).otherwise(0L))
            .as("n_breaching"),
          sum(when(col("tvd_ppm") > 200000, col("m_c")).otherwise(0L))
            .as("n_docs_exposed"),
          sum(col("m_c")).as("n_docs"))
        .select(col("n_classes"), col("max_tvd_ppm"),
          col("n_breaching"), col("n_docs_exposed"),
          expr("n_docs_exposed * 1000000 div n_docs").as("exposed_ppm"))
    }),

    // ---- SPEARMAN rank correlation between two quality signals (the
    // MONOTONE-association read q217's kappa can't give: kappa compares
    // two BINARY gates; this asks whether the learned score and token
    // length co-move across their whole ranges — the check before
    // using one signal as a proxy for the other). Exact end to end:
    // tie-averaged ranks come DOUBLED from histogram prefix sums (2r =
    // 2·cum_below + c + 1, the q220/q229 idiom — no global sort
    // window), and since Σ2r = N(N+1) exactly, the mean doubled rank
    // is the INTEGER N+1, so deviations d = 2r − (N+1) are exact
    // integers bounded by N. Pearson-on-ranks then needs only Σdxdy,
    // Σdx², Σdy² (each ≤ N³ — DECIMAL(38,0) holds to N ≈ 2·10⁶ for
    // the 4·num² verdict product, documented envelope). Verdict
    // |ρ| > 0.5 cross-multiplied: 4·num² > denx·deny — no sqrt, no
    // float. Scale: two value-grain histograms + prefix sums, two
    // broadcast rank joins back onto the doc-grain signal frame, one
    // fold.
    "q240_spearman_signals" -> ((s, d) => {
      val sig = qualitySignals(s, d)
        .select(col("doc_id"), col("score"), col("n_tokens"))
      val n = sig.agg(count(lit(1)).as("nn"))
      // r13 (the q269/q216 stacking move): BOTH signals' doubled-rank
      // maps from ONE stacked histogram + ONE two-phase Prefix pass
      // keyed by signal id — 4 planner actions (2 per runningSum) → 2,
      // one histogram shuffle instead of two. Both signals are LONG
      // (score = Σwt, n_tokens = count), so the shared v column is
      // exact; per-cid groups see exactly the rows the two separate
      // histograms held, and Prefix's running sum is per-key, so the
      // doubled ranks are bit-identical.
      val stacked = sig.select(explode(array(
          struct(lit(1).as("cid"), col("score").as("v")),
          struct(lit(2).as("cid"), col("n_tokens").as("v")))).as("x"))
        .select(col("x.cid").as("cid"), col("x.v").as("v"))
      val h = stacked.groupBy(col("cid"), col("v"))
        .agg(count(lit(1)).as("c"))
      val r2 = graft.operators.Prefix.runningSum(h, "cid", "v", "c", "cum")
        .select(col("cid"), col("v"),
          ((col("cum") - col("c")) * 2 + col("c") + 1).as("r2"))
      def ranks(vc: String, cid: Int): DataFrame =
        r2.filter(col("cid") === cid)
          .select(col("v").as(vc), col("r2").as(s"r2_$vc"))
      sig
        .join(ranks("score", 1), "score")
        .join(ranks("n_tokens", 2), "n_tokens")
        .crossJoin(broadcast(n))
        .select(
          (col("r2_score") - (col("nn") + 1)).cast("decimal(19,0)")
            .as("dx"),
          (col("r2_n_tokens") - (col("nn") + 1)).cast("decimal(19,0)")
            .as("dy"),
          col("nn"))
        .groupBy(col("nn"))
        .agg(sum(expr("CAST(dx * dy AS DECIMAL(38,0))")).as("num"),
          sum(expr("CAST(dx * dx AS DECIMAL(38,0))")).as("denx"),
          sum(expr("CAST(dy * dy AS DECIMAL(38,0))")).as("deny"))
        .select(col("nn").as("n"),
          // outputs cast to BIGINT (r9 verdict #1: the driver hasher
          // normalizes DECIMAL differently on the two engines — the
          // suite-wide house rule is scalar int64/double/bool/string
          // output columns, pinned by HouseRulesSpec). Exact: |d| ≤ N
          // ⇒ Σd² ≤ N³, BIGINT-exact to N ≈ 2.09·10⁶. Past that the
          // 4·num² verdict product would also silently overflow
          // DECIMAL(38,0) (ADVICE r9) — so the envelope fails LOUDLY
          // and identically on both engines via raise_error/error.
          expr(s"CASE WHEN nn > $SpearmanEnvelopeN THEN CAST(raise_error(" +
            "'q240: N beyond BIGINT-exact rank envelope') AS BIGINT) " +
            "ELSE CAST(num AS BIGINT) END").as("num"),
          col("denx").cast("long").as("denx"),
          col("deny").cast("long").as("deny"),
          (col("num") > 0).as("positive"),
          (lit(4).cast("decimal(19,0)") * col("num") * col("num")
            > col("denx") * col("deny")).as("correlated"))
    }),

    // ---- classifier AUC as an exact rank statistic (the THRESHOLD-
    // FREE discrimination read beside q209's binned calibration: does
    // the q124 learned score actually separate diverse from repetitive
    // docs, at every operating point at once?). AUC is the probability
    // a random positive outranks a random negative = U/(n₁n₀) — exactly
    // the q220 Mann–Whitney machinery pointed at (score, heuristic
    // diversity gate) instead of (price, cohort): doubled U from ONE
    // histogram prefix sum (2 per strict win, 1 per tie — the ½-tie
    // AUC convention kept integral), auc_ppm = u2·10⁶ div (2n₁n₀),
    // verdict AUC > 0.7 cross-multiplied (u2·10 > 14·n₁n₀ — n₁n₀
    // promoted to DECIMAL first: it reaches N²/4, past BIGINT at
    // ~6·10⁹ docs). Scale: rides the run-shared quality_signals frame;
    // one score-grain histogram, one fold.
    "q241_score_auc" -> ((s, d) => {
      val h = qualitySignals(s, d)
        .select(col("score"),
          (col("uniq") * 2 >= col("n_tokens")).as("pos"))
        .groupBy(col("score"))
        .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("ca"),
          sum(when(!col("pos"), 1L).otherwise(0L)).as("cb"))
        .withColumn("k", lit(1))
      val cum = graft.operators.Prefix.runningSum(h, "k", "score",
        "cb", "cum_b")
      cum.agg(sum(col("ca")).as("n_pos"), sum(col("cb")).as("n_neg"),
          sum(col("ca") * (col("cum_b") - col("cb")) * 2
            + col("ca") * col("cb")).as("u2"))
        .select(col("n_pos"), col("n_neg"), col("u2"),
          // explicit degenerate-class guard (the q215 lesson): one
          // all-positive or all-negative corpus leaves AUC undefined —
          // NULL on both engines, never a crash or a 0-row collapse
          expr("CASE WHEN n_pos > 0 AND n_neg > 0 THEN " +
            "CAST(u2 AS DECIMAL(38,0)) * 1000000 div " +
            "(CAST(n_pos AS DECIMAL(19,0)) * n_neg * 2) END")
            .as("auc_ppm"),
          // same degenerate-class guard as auc_ppm (ADVICE r9): an
          // all-positive/all-negative corpus has UNDEFINED AUC — NULL,
          // not false, so the verdict can't read "not discriminative"
          when(col("n_pos") > 0 && col("n_neg") > 0,
            col("u2").cast("decimal(38,0)") * 10
              > col("n_pos").cast("decimal(19,0)") * col("n_neg") * 14)
            .as("discriminative"))
    }),

    // ---- SIMPSON'S-PARADOX audit on the quality gate (completing the
    // observational-pitfall family: q217 checks gate AGREEMENT, q225
    // compares group MEANS, q209 checks calibration — this one checks
    // whether a source-vs-source gate-pass comparison REVERSES once
    // conditioned on length, the classic aggregation trap: "source A
    // passes more than B" pooled can be an artifact of A writing
    // longer docs, with B better in EVERY length stratum; a mixture
    // designer acting on the pooled number would upweight the worse
    // source). Per ordered source pair: the pooled verdict, how many
    // 50-token length strata hold BOTH sources, stratum wins each way,
    // and the full-reversal flag (pooled winner loses every shared
    // stratum — the textbook Simpson flip, both directions). Every
    // comparison is an exact integer cross-multiplication
    // (p_a·n_b > p_b·n_a) promoted to DECIMAL(38,0): counts reach
    // 10¹⁰ docs at 100 TB and the product passes BIGINT at ~3·10⁹.
    // Scale: rides the run-shared quality_signals token pass + one
    // doc-grain source join; everything after the (source, bucket)
    // cell fold is planner-scale (sources² pairs on broadcast-size
    // frames); folds to C(n_sources, 2) rows.
    "q257_simpson_audit" -> ((s, d) => {
      val cell = qualitySignals(s, d)
        .join(Tables.documents(s, d).select(col("doc_id"),
          col("source")), "doc_id")
        .select(col("source"), expr("n_tokens div 50").as("len_bucket"),
          (col("uniq") * 2 >= col("n_tokens")).as("pass"))
        .groupBy(col("source"), col("len_bucket"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("pass"), 1L).otherwise(0L)).as("p"))
      val pooled = cell.groupBy(col("source"))
        .agg(sum(col("n")).as("np"), sum(col("p")).as("pp"))
      val pairs = pooled.as("a").join(pooled.as("b"),
          col("a.source") < col("b.source"))
        .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
          (col("a.pp").cast("decimal(38,0)") * col("b.np")
            > col("b.pp").cast("decimal(38,0)") * col("a.np"))
            .as("pooled_a_gt_b"),
          (col("b.pp").cast("decimal(38,0)") * col("a.np")
            > col("a.pp").cast("decimal(38,0)") * col("b.np"))
            .as("pooled_b_gt_a"))
      val strata = cell.as("x").join(cell.as("y"),
          col("x.len_bucket") === col("y.len_bucket")
            && col("x.source") < col("y.source"))
        .select(col("x.source").as("src_a"), col("y.source").as("src_b"),
          (col("x.p").cast("decimal(38,0)") * col("y.n")
            > col("y.p").cast("decimal(38,0)") * col("x.n"))
            .as("a_gt_b"),
          (col("y.p").cast("decimal(38,0)") * col("x.n")
            > col("x.p").cast("decimal(38,0)") * col("y.n"))
            .as("b_gt_a"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_strata_both"),
          sum(when(col("a_gt_b"), 1L).otherwise(0L))
            .as("n_strata_a_gt_b"),
          sum(when(col("b_gt_a"), 1L).otherwise(0L))
            .as("n_strata_b_gt_a"))
      pairs.join(strata, Seq("src_a", "src_b"), "left_outer")
        .select(col("src_a"), col("src_b"),
          col("pooled_a_gt_b"), col("pooled_b_gt_a"),
          coalesce(col("n_strata_both"), lit(0L)).as("n_strata_both"),
          coalesce(col("n_strata_a_gt_b"), lit(0L))
            .as("n_strata_a_gt_b"),
          coalesce(col("n_strata_b_gt_a"), lit(0L))
            .as("n_strata_b_gt_a"))
        .withColumn("simpson_flip",
          (col("pooled_a_gt_b") && col("n_strata_both") > 0
            && col("n_strata_b_gt_a") === col("n_strata_both")) ||
          (col("pooled_b_gt_a") && col("n_strata_both") > 0
            && col("n_strata_a_gt_b") === col("n_strata_both")))
    }),

    // ---- two-sample KOLMOGOROV–SMIRNOV drift per source (the
    // whole-distribution read beside q205's binned divergence and
    // q225's mean comparison: does source s's LENGTH DISTRIBUTION
    // differ from the rest of the corpus ANYWHERE on its support, not
    // just in a chosen bin or moment?). Exact end to end: both CDFs
    // are step functions over the value-grain length histogram, so
    // D = max|cdf_s − cdf_rest| is attained at a histogram step —
    // evaluate at EVERY corpus-distinct length via a dense
    // (source × length) grid (planner-scale: sources × distinct
    // lengths), inclusive prefix sums through the chunk-bounded
    // Prefix.runningSum (per-source AND corpus — no row-grain sort
    // window anywhere), and the max runs on cross-multiplied integer
    // numerators |cum_s·n_rest − cum_rest·n_s| over the common
    // denominator n_s·n_rest. Verdict: D > 1.36·√((n_s+n_rest)/
    // (n_s·n_rest)) (α = 0.05) squared into integers —
    // dnum²·10⁴ > 18496·n_all·n_s·n_rest — BIGINT/DECIMAL-exact to
    // n_all ≈ 3·10⁸ docs, past which the query fails LOUDLY and
    // identically on both engines (the q240 envelope discipline);
    // shard the test per partition beyond that. Scale: one doc-grain
    // scan to the histogram, then everything is histogram-grain.
    "q258_ks_drift" -> ((s, d) => {
      val hist = lenHist(s, d)
      // dense (source × toks) CDF grid via the driver-grid cumSum
      // (r13): the histogram is planner-scale BY the lenHist contract,
      // so the crossJoin-built grid + two-phase prefix (approxQuantile
      // job + partials fetch + chunked window, with the grid join
      // re-planned under BOTH the cum leg and the cum_all leg of the
      // sink) collapses to ONE bounded fetch and a broadcast-size
      // local frame — 10 static exchanges leave the plan
      val cumS = graft.operators.Grid.cumSum(
        hist, "source", "toks", "cnt", "cum", dense = true)
      // the grid is DENSE over sources at every step, so the corpus
      // CDF is the source CDFs' sum at each toks — no second prefix
      // pass
      val cumAll = cumS.groupBy(col("toks"))
        .agg(sum(col("cum")).as("cum_all"))
      val tot = hist.groupBy(col("source")).agg(sum(col("cnt")).as("n_s"))
      val nAll = hist.agg(sum(col("cnt")).as("n_all"))
      cumS.join(cumAll, "toks")
        .join(broadcast(tot), "source")
        .crossJoin(broadcast(nAll))
        .filter(col("n_s") < col("n_all"))
        .select(col("source"), col("n_s"), col("n_all"),
          abs(col("cum").cast("decimal(38,0)")
              * (col("n_all") - col("n_s"))
            - (col("cum_all") - col("cum")).cast("decimal(38,0)")
              * col("n_s")).as("diff"))
        .groupBy(col("source"))
        .agg(max(col("n_s")).as("n_docs"), max(col("n_all")).as("na"),
          max(col("diff")).as("dnum"))
        .select(col("source"), col("n_docs"),
          expr("CAST(dnum * 1000000 div (CAST(n_docs AS " +
            "DECIMAL(19,0)) * (na - n_docs)) AS BIGINT)").as("d_ppm"),
          expr(s"CASE WHEN na > $KsEnvelopeN THEN CAST(raise_error(" +
            "'q258: N beyond the exact KS envelope') AS BOOLEAN) " +
            "ELSE dnum * dnum * 10000 > CAST(18496 AS DECIMAL(19,0))" +
            " * na * n_docs * (na - n_docs) END").as("drifted"))
    }),

    // ---- MAD-based ROBUST outlier quarantine (the robust-statistics
    // leg beside q223's winsorized means and q106's percentile
    // audits): per source, the token-length median, the Median
    // Absolute Deviation around it, and the quarantine count at the
    // |len − median| > 3·MAD gate — the outlier rule that, unlike
    // mean±kσ, a few extreme docs cannot drag (50% breakdown point;
    // the curation gate for truncation-bombs and empty-doc floods).
    // Exact end to end, ALL integers: both medians are value-at-rank
    // reads (min value with 2·cum ≥ n — the q226 lower-median
    // convention) off histogram prefix sums through the chunk-bounded
    // Prefix.runningSum, never a per-source sort window. Scale: rides
    // the run-shared length histogram (one doc scan per run, shared
    // with q226/q258); the deviation histogram REGROUPS the same
    // histogram rows (|toks − med| collapses symmetric lengths), so
    // both prefix passes and the quarantine fold are histogram-grain;
    // per-source medians/MADs broadcast back as source-grain frames.
    "q260_mad_outliers" -> ((s, d) => {
      val hist = lenHist(s, d)
      val tot = hist.groupBy(col("source"))
        .agg(sum(col("cnt")).as("n_docs"))
      // the median frame is SOURCE-grain and feeds three downstream
      // consumers (the deviation regroup and the final plan);
      // run-shared like every deterministic artifact here, so they
      // read a cached 1-row-per-source frame. r13: both prefix passes
      // now ride the driver-grid Grid.cumSum — the histogram (and the
      // deviation regroup of its own rows) is planner-scale BY the
      // lenHist contract, so each two-phase call's quantile+partials
      // jobs and chunked window collapse to one bounded fetch
      // (measured 8.5 → ~3 s at sf0.1 with the shared median frame,
      // → ~0.9 s steady with the grid cumSum)
      val med = Shared.frame(s, "len_median", d) {
        val cum = graft.operators.Grid.cumSum(
          hist, "source", "toks", "cnt", "cum")
        cum.join(broadcast(tot), "source")
          .groupBy(col("source"))
          .agg(min(when(col("cum") * 2 >= col("n_docs"), col("toks")))
            .as("median_len"))
      }
      val devHist = hist.join(broadcast(med), "source")
        .select(col("source"),
          abs(col("toks") - col("median_len")).as("dev"), col("cnt"))
        .groupBy(col("source"), col("dev"))
        .agg(sum(col("cnt")).as("cnt"))
      val cumD = graft.operators.Grid.cumSum(
        devHist, "source", "dev", "cnt", "cumd")
      val mad = cumD.join(broadcast(tot), "source")
        .groupBy(col("source"))
        .agg(min(when(col("cumd") * 2 >= col("n_docs"), col("dev")))
          .as("mad"))
      val out = hist.join(broadcast(med), "source")
        .join(broadcast(mad), "source")
        .filter(abs(col("toks") - col("median_len"))
          > col("mad") * 3)
        .groupBy(col("source"))
        .agg(sum(col("cnt")).as("n_out"))
      tot.join(med, "source").join(mad, "source")
        .join(out, Seq("source"), "left_outer")
        .select(col("source"), col("n_docs"), col("median_len"),
          col("mad"),
          coalesce(col("n_out"), lit(0L)).as("n_outliers"),
          expr("coalesce(n_out, 0L) * 1000000 div n_docs")
            .as("outlier_ppm"))
    }),

    // ---- DETERMINISTIC BOOTSTRAP CI of the quality-gate keep rate:
    // 16 half-sample replicates (replicate b keeps a doc iff the top
    // bit of hex digit b of md5(doc_id || ':boot') is set — p = 1/2,
    // independent across b, pure projection: same doc → same replicate
    // set on any cluster, and the oracle replays the substring test
    // verbatim), each scored for q124's keep rate; the min/max/spread
    // across replicates is the UNCERTAINTY band a curation owner needs
    // before acting on "keep rate moved 2pp" — the number q230 sizes a
    // review sample for, measured instead of assumed. Scale: one pass
    // over the run-shared quality_signals frame exploded ×16 (doc-grain
    // ×16, map-combinable to 16 rows); everything after is 16-row
    // arithmetic; ppm divisions are integral on non-negative longs
    // (truncation == floor cross-engine). Replicate emptiness is a
    // 2^-n impossibility, not a handled case (both engines drop empty
    // groups identically).
    "q263_bootstrap_keep_rate" -> ((s, d) => {
      val sig = qualitySignals(s, d)
        .select(col("doc_id"), col("score"))
        .withColumn("h", md5(concat(col("doc_id").cast("string"),
          lit(":boot"))))
      val reps = sig
        .select(col("score"), col("h"),
          explode(expr("sequence(0, 15)")).as("b"))
        .filter(expr("substring(h, b + 1, 1) IN " +
          "('8','9','a','b','c','d','e','f')"))
        .groupBy(col("b"))
        .agg(count(lit(1)).as("n_b"),
          sum(when(col("score") >= 0, 1L).otherwise(0L)).as("k_b"))
        .select(expr("(k_b * 1000000) div n_b").as("ppm"))
        .agg(count(lit(1)).as("n_reps"),
          expr("sum(ppm) div count(1)").as("mean_rep_ppm"),
          min(col("ppm")).as("min_rep_ppm"),
          max(col("ppm")).as("max_rep_ppm"),
          (max(col("ppm")) - min(col("ppm"))).as("spread_ppm"))
      val full = sig
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("score") >= 0, 1L).otherwise(0L)).as("n_keep"))
        .select(col("n_docs"),
          expr("(n_keep * 1000000) div n_docs").as("full_keep_ppm"))
      // 1-row × 1-row broadcast cross join (the q14/q28 scalar idiom)
      full.crossJoin(broadcast(reps))
    }),

    // ---- 2-D SKYLINE (Pareto frontier) over (quality score, length):
    // the documents no other document beats on BOTH axes — the
    // "best exemplars" set an inspection/eval-curation pass starts
    // from (and the classic multi-criteria operator the suite lacked).
    // Dominance is decided at DISTINCT-SCORE grain: per score, the max
    // token count (one map-combinable aggregate), then the strict
    // prefix max over scores DESCENDING via the two-phase
    // Prefix.runningMax — max tokens among strictly higher scores —
    // so a point survives iff its tmax beats every higher-score tmax
    // (and a doc survives iff it carries its score's tmax; equal
    // (score, tokens) ties all surface, neither dominates). NEVER a
    // global sort of docs: the sweep runs on the score-grain stats
    // frame (bounded by score range, not corpus size — the q90/q229
    // histogram-grain discipline), and the frontier-point set joined
    // back is skyline-sized, broadcast. Oracle replays the naive
    // NOT-EXISTS dominance definition — the spec asserts set equality
    // with brute force.
    "q267_pareto_skyline" -> ((s, d) =>
      paretoFrontier(qualitySignals(s, d)
        .select(col("doc_id"), col("score"), col("n_tokens")))),

    // ---- INCREMENTAL SKYLINE MAINTENANCE: today's batch (doc_id%10
    // == 7, the q96/q145/q154 batch convention) folded into the STORED
    // frontier instead of re-sweeping the corpus — new frontier =
    // skyline(skyline(rest) ∪ batch), the exact submodular-free
    // identity skyline(A ∪ B) = skyline(skyline(A) ∪ B) (dominance is
    // transitive, so every dominated point is dominated by a frontier
    // point; equal points never dominate each other, so ties survive
    // both paths identically). The maintenance pass costs
    // |frontier| + |batch| — never the corpus — which is the entire
    // point at 100 TB: the corpus-wide sweep runs once, then each
    // day's update touches planner-scale frames. Output = the new
    // frontier with the docs today's batch pushed onto it flagged.
    // The oracle replays the DIRECT full-corpus dominance definition,
    // so the driver's hash compare PROVES the incremental identity on
    // every run (the q121/q77 merged-equals-monolithic pattern).
    "q271_skyline_maintenance" -> ((s, d) => {
      val sig = qualitySignals(s, d)
        .select(col("doc_id"), col("score"), col("n_tokens"))
      val batch = sig.filter(col("doc_id") % 10 === 7)
      // r13: the STORED frontier is persisted (Shared.frame) — which
      // is precisely the query's own 100 TB story ("the stored
      // frontier is a persisted artifact"); unpersisted, its whole
      // sweep pipeline re-planned inside the second sweep's two
      // prefix actions AND the final sink (3× the rest-sweep cost,
      // the q277 re-planned-subtree class). Deterministic, so oracle
      // hashes cannot move.
      val stored = Shared.frame(s, "skyline_stored", d)(
        paretoFrontier(sig.filter(col("doc_id") % 10 =!= 7)))
      paretoFrontier(stored.unionByName(batch))
        .withColumn("entered_from_batch", col("doc_id") % 10 === 7)
    }),

    // ---- GREEDY MAX-COVERAGE exemplar selection (set cover, 3
    // unrolled rounds): pick the 3 documents that jointly cover the
    // most distinct word TRIGRAMS — the classic (1−1/e)-approximate
    // greedy, and the standard recipe for seeding an inspection/eval
    // set that SPANS a corpus instead of sampling it. The universe is
    // trigram shingles, not unigrams, on purpose: a small-vocabulary
    // corpus saturates unigram coverage with one document (measured
    // here — rounds 2–3 degenerate to zero gain), while the shingle
    // space keeps marginal gains meaningful at any vocabulary. Each
    // round is one map-combinable count over the shared distinct
    // (doc, shingle) frame plus a k=1 TakeOrdered heap (count desc,
    // doc_id asc — deterministic ties); the covered-shingle set
    // entering the next round is the shingles of ≤ r picked docs —
    // bounded by r × doc length BY CONSTRUCTION, so its broadcast can
    // never grow corpus-shaped. Rounds ARE a greedy driver loop —
    // three 1-row collects plus one 1-row total fetch, adopted after
    // measuring the fully lazy plan-composition alternative at 8×
    // the cost (details at the loop below); driver state is 3 doc
    // ids + 3 gains, never corpus-shaped. Shingles travel as 60-bit
    // md5 longs (wkey).
    "q268_greedy_coverage" -> ((s, d) => {
      val toks = Shared.frame(s, "doc_tri_distinct", d) {
        Text.wordShingles(Tables.documents(s, d), "doc_id", "text")
          .select(col("doc_id"), expr(wkey("sh")).as("tk"))
          .distinct()
      }
      // greedy DRIVER loop — 3 bounded planner actions (the kmeansQ
      // centroid-fetch posture): each round is ONE map-combined count
      // over the persisted shingle frame plus a 1-row TakeOrdered
      // fetch; a fully lazy 3-round plan re-evaluates round r's
      // lineage inside every later round and again in the final fold
      // (measured 8.1 s at sf0.1 vs ~1 s with the fetches), so the
      // 1-row collects are the cheaper AND clearer form. Driver state
      // is 3 doc ids + 3 gains — never corpus-shaped.
      var picked = Seq.empty[Long]
      val sel = (1 to 3).map { r =>
        val coveredTk = toks
          .filter(col("doc_id").isin(picked: _*))
          .select(col("tk")).distinct()
        val w = toks
          .filter(!col("doc_id").isin(picked: _*))
          .join(broadcast(coveredTk), Seq("tk"), "left_anti")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("gain"))
          .orderBy(col("gain").desc, col("doc_id").asc).limit(1)
          .collect()(0)
        picked = picked :+ w.getLong(0)
        (r.toLong, w.getLong(0), w.getLong(1))
      }
      val total = toks.agg(countDistinct(col("tk")).as("n"))
        .collect()(0).getLong(0)
      val cums = sel.scanLeft(0L)(_ + _._3).tail
      import s.implicits._
      sel.zip(cums).map { case ((r, doc, g), c) =>
        (r, doc, g, c, c * 1000000L / total)
      }.toSeq.toDF("round", "doc_id", "gain", "covered_cum",
        "coverage_ppm")
    }),

    // ---- JOINT (score-decile × length-decile) census with an
    // independence audit: the 2-D surface q240's single Spearman ρ
    // summarizes — which (quality, length) cells are over/under-
    // populated vs independence (obs·N vs rowΣ·colΣ). The read that
    // catches "long docs score high ONLY in the tails" before a gate
    // couples length into the mixture. Decile thresholds come from
    // Quantile.groupQuantiles (rank-exact percentile_disc values, the
    // q209 strictly-below tie rule — no global sort); both
    // assignments are in-row against 9-element broadcast arrays;
    // margins re-aggregate the ≤100-cell census. The association
    // ratio and verdict are DECIMAL(38,0) cross-multiplied (n·N
    // products reach 10²⁶ at 10¹⁰ docs — past BIGINT, inside the
    // decimal envelope).
    "q269_joint_decile_census" -> ((s, d) => {
      val perDoc = qualitySignals(s, d).withColumn("grp", lit(1))
      // r13 (guide §1.2, remove passes): BOTH decile threshold sets in
      // ONE groupQuantiles call over the stacked (cid, v) frame — the
      // refinement's three aggregate passes run once over 2n rows
      // instead of twice over n, halving the planner actions (6 → 3).
      // Per-cid groups see exactly the rows the two separate calls
      // saw, so every threshold is bit-identical percentile_disc.
      val stacked = perDoc.select(explode(array(
          struct(lit(1).as("cid"), col("score").cast("double").as("v")),
          struct(lit(2).as("cid"),
            col("n_tokens").cast("double").as("v")))).as("x"))
        .select(col("x.cid").as("cid"), col("x.v").as("v"))
      val th = graft.operators.Quantile.groupQuantiles(
        stacked, "cid", "v", (1 to 9).map(k => (k / 10.0, s"q$k")))
      val thArr = th.filter(col("cid") === 1)
        .select(array((1 to 9).map(k => col(s"q$k")): _*).as("ss"))
        .crossJoin(th.filter(col("cid") === 2)
          .select(array((1 to 9).map(k => col(s"q$k")): _*).as("ls")))
      val cells = perDoc.crossJoin(broadcast(thArr))
        .select(
          expr("size(filter(ss, t -> t < CAST(score AS DOUBLE))) + 1")
            .cast("long").as("score_dec"),
          expr("size(filter(ls, t -> t < CAST(n_tokens AS DOUBLE))) + 1")
            .cast("long").as("len_dec"))
        .groupBy(col("score_dec"), col("len_dec"))
        .agg(count(lit(1)).as("n"))
      val rowT = cells.groupBy(col("score_dec"))
        .agg(sum(col("n")).as("row_n"))
      val colT = cells.groupBy(col("len_dec"))
        .agg(sum(col("n")).as("col_n"))
      val tot = cells.agg(sum(col("n")).as("n_all"))
      cells
        .join(broadcast(rowT), "score_dec")
        .join(broadcast(colT), "len_dec")
        .crossJoin(broadcast(tot))
        .select(col("score_dec"), col("len_dec"), col("n"),
          col("row_n"), col("col_n"),
          expr("CAST((CAST(n AS DECIMAL(38,0)) * n_all * 1000000) div " +
            "(CAST(row_n AS DECIMAL(38,0)) * col_n) AS BIGINT)")
            .as("assoc_ppm"),
          expr("CAST(n AS DECIMAL(38,0)) * n_all > " +
            "CAST(row_n AS DECIMAL(38,0)) * col_n")
            .as("over_represented"))
    }),

    // ---- TOP-TOKEN MOVERS (vocabulary drift at token grain): the
    // head of the vocabulary ranked on the reference half (doc_id
    // even) vs the current half (odd), full-outer joined — which
    // tokens ENTERED the top-20, which LEFT, and how far the
    // survivors moved. The token-level complement of q137's hashed
    // 64-bucket TV gate: the bucket audit says "something moved",
    // this names the tokens. One (side, token) count at vocab grain;
    // both top-20s are TakeOrdered heaps; ranks come from a 20×20
    // dominance self-join (count of strictly-ahead rows + 1 ==
    // row_number under the (count desc, token asc) total order) so no
    // window — global or otherwise — enters the plan; the join of two
    // ≤20-row frames is planner-scale.
    "q272_top_token_movers" -> ((s, d) => {
      val cnt = Tables.documents(s, d)
        .select((col("doc_id") % 2 === 0).as("is_ref"),
          explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("is_ref"), col("tok"))
        .agg(count(lit(1)).as("c"))
      def ranked(side: Boolean, rankName: String,
                 cName: String): DataFrame = {
        val t = cnt.filter(col("is_ref") === side)
          .orderBy(col("c").desc, col("tok").asc).limit(20)
          .select(col("tok"), col("c"))
        val ahead = t.select(col("tok").as("t2"), col("c").as("c2"))
        t.join(ahead, col("c2") > col("c")
            || (col("c2") === col("c") && col("t2") < col("tok")), "left")
          .groupBy(col("tok"), col("c"))
          .agg((count(col("t2")) + lit(1L)).as(rankName))
          .withColumnRenamed("c", cName)
      }
      ranked(side = true, "ref_rank", "ref_cnt")
        .join(ranked(side = false, "cur_rank", "cur_cnt"),
          Seq("tok"), "full_outer")
        .select(col("tok"), col("ref_rank"), col("ref_cnt"),
          col("cur_rank"), col("cur_cnt"),
          (col("ref_rank") - col("cur_rank")).as("rank_shift"))
    }),

    // ---- the FULL curation pipeline, second generation: q95 chained
    // the 2023-era gates (LSH near-dup → repetition filter → split);
    // this chains the robust-statistics-era stages the suite has
    // since grown — near-dup removal (q38's canonical rule) → MAD
    // outlier QUARANTINE recomputed over the survivors (q260's math —
    // the medians must move with the population or the gate drifts) →
    // soft-dedup EFFECTIVE MIXTURE of the kept set under q259's
    // 1/dup_count weights taken from the RAW corpus (within-kept
    // counts are provably constant 1 — see the dup_count note in the
    // builder) → sequence PACKING bins (q110's concat-and-cut) — as
    // ONE lazy plan at per-source pipeline grain, proving the stages
    // compose without intermediate materialization drift (the oracle
    // replays the whole chain).
    // Scale: the pairs frame is the run-shared LSH index; the
    // canonical frame is a PERSISTED narrow (id, source, digest, len)
    // projection (the quality_signals discipline — five downstream
    // actions each re-tokenizing + re-hashing the full text measured
    // 25 s at sf0.1 vs ~3 s cached; text itself never enters the
    // cache); both quarantine medians are histogram-grain
    // value-at-rank reads over chunk-bounded Prefix.runningSum (never
    // a per-source sort window); the mixture weights ride the
    // run-shared family map + a 1-row broadcast of kept-corpus
    // totals; the packing stage
    // reduces to (tokens_kept − 1) div win + 1 — concat-and-cut
    // leaves no gaps, so q110's per-doc layout collapses to its total
    // at pipeline grain, and the ORACLE still builds the full
    // per-source running-sum layout and folds max bin, so the hash
    // compare PROVES the reduction identity on every run (the q271
    // oracle pattern). All integer arithmetic (ppm by integral div).
    "q277_curation_e2e" -> ((s, d) => {
      val win = 2048
      val docs = Tables.documents(s, d)
      // stage 1 — near-dup: canonical = never the larger id of a pair
      val canon = Shared.frame(s, "curation_canon", d) {
        val pairs = TextQueries.sharedCandidatePairs(s, d)
        // no md5 column here: dup_count joins on doc_id through the
        // run-shared lsh_members frame, so hashing every kept text
        // again would be wasted compute + cache width (ADVICE r12);
        // only the DuckDB oracle derives md5, on its own side.
        docs.join(pairs.select(col("doc_b")),
            docs("doc_id") === col("doc_b"), "left_anti")
          .select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("bigint").as("toks"))
      }
      // stages 2+3 — MAD quarantine over the SURVIVOR population, then
      // per-doc soft-dedup weights, cached as ONE doc-grain frame: the
      // median/MAD prefix pipelines and the digest window would
      // otherwise re-run inside every consumer branch (measured 16 s
      // steady at sf0.1 vs ~1 s with the two caches). median_len/mad
      // travel as columns of the kept frame (constant per source), so
      // the final fold never re-plans the quarantine subtrees.
      val kept = Shared.frame(s, "curation_kept", d) {
        val hist = canon.groupBy(col("source"), col("toks"))
          .agg(count(lit(1)).as("cnt"))
        val gateDf = madGateDf(s, hist, "q277")
        // dup_count = the doc's exact-dup family size in the RAW
        // corpus (the run-shared lsh_members frame), NOT within the
        // kept set: identical texts always share every LSH band, so
        // near-dup removal provably leaves the kept set md5-unique
        // and a within-kept count would be constant 1 — the mixture
        // stage would be vacuous. Weighting survivors by their raw
        // family size is the q259 soft-dedup read THROUGH the
        // pipeline: a source whose survivors were heavily cloned
        // upstream shrinks, a clean source grows.
        canon.join(broadcast(gateDf), "source")
          .filter(abs(col("toks") - col("median_len"))
            <= col("mad") * 3)
          .join(TextQueries.sharedMembers(s, d)
            .select(col("doc_id"), col("fsize").as("dup_count")),
            "doc_id")
      }
      val per = kept
        .select(col("source"), col("toks"), col("median_len"),
          col("mad"),
          (col("toks") * expr("1000000L div dup_count"))
            .cast("decimal(38,0)").as("wt"))
        .groupBy(col("source"))
        .agg(max(col("median_len")).as("median_len"),
          max(col("mad")).as("mad"),
          count(lit(1)).as("docs_kept"),
          sum(col("toks")).as("tokens_kept"),
          sum(col("wt")).as("wt_mass"))
      val ctot = per.agg(
        sum(col("tokens_kept")).cast("decimal(38,0)").as("tot_raw"),
        sum(col("wt_mass")).as("tot_wt"))
      val tot = canon.groupBy(col("source"))
        .agg(count(lit(1)).as("docs_canonical"))
      // stage 4 — packing bins: concat-and-cut leaves no gaps, so the
      // bins a source's kept stream occupies = (total − 1) div win + 1;
      // the oracle derives the same number from the FULL q110 running-
      // sum layout, so parity proves the identity. Raw per-source doc
      // counts fold off the run-shared length histogram (one cached
      // scan, shared with q226/q258/q260) instead of re-reading the
      // documents table.
      lenHist(s, d).groupBy(col("source"))
        .agg(sum(col("cnt")).as("docs_raw"))
        .join(tot, "source").join(per, "source")
        .crossJoin(broadcast(ctot))
        .select(col("source"), col("docs_raw"), col("docs_canonical"),
          col("docs_kept"), col("median_len"), col("mad"),
          col("tokens_kept"),
          expr("CAST(CAST(tokens_kept AS DECIMAL(38,0)) * 1000000 " +
            "div tot_raw AS BIGINT)").as("raw_ppm"),
          expr(s"CAST(CASE WHEN wt_mass IS NULL OR " +
            s"wt_mass > $CurationWtEnvelope THEN " +
            "CAST(raise_error('q277: wt_mass beyond DECIMAL(38,0) " +
            "ppm envelope') AS DECIMAL(38,0)) ELSE wt_mass END " +
            "* 1000000 div tot_wt AS BIGINT)").as("eff_ppm"),
          expr(s"(tokens_kept - 1) div $win + 1").as("n_bins"))
    }),

    // ---- INCREMENTAL CURATION MAINTENANCE: today's batch (doc_id%10
    // == 7, the q96/q271 convention) folded into STORED curation state
    // instead of re-curating the corpus — the q271 maintenance pattern
    // applied to the q277 pipeline, proving the curation family
    // composes incrementally the way the skyline does. What a 100 TB
    // deployment actually persists: the LSH band index (the q196
    // posture), the per-digest family counts, and the
    // (source, toks, fsize) histogram of CANONICAL docs — everything
    // the quarantine + soft-dedup mixture reads, all ADDITIVE. The
    // daily fold is EXACT because each stage decomposes exactly:
    //   canonical(full) ∩ old = canonical(old) − demoted, where
    //     demoted = old docs that are the larger id of a cross pair
    //     (band membership is per-doc, so pairs(old×old) =
    //     pairs(full) filtered — reading the shared index IS the
    //     stored-state read);
    //   canonical(full) ∩ batch = batch docs never a larger pair id;
    //   fsize(full) = fsize(old) + batch members, so SURVIVING old
    //     docs in touched families move cells
    //     (source, toks, fsize_old) → (source, toks, fsize_full).
    // Median/MAD are not foldable constants — they move with the
    // population — which is exactly why the stored state is the
    // additive histogram: value-at-rank re-derives them from the
    // merged histogram (the q260/q277 prefix-sum discipline), and the
    // kept mass + soft-dedup weights fold at histogram grain too (wt
    // depends only on (toks, fsize)). Delta work ∝ batch + touched
    // families; merged-stat work is histogram-grain — never a corpus
    // re-scan. The ORACLE replays the from-scratch full-corpus
    // definition, so the driver's hash compare PROVES the fold
    // identity on every run (the q271/q121 pattern), including the
    // demotion/addition audit columns.
    "q278_incremental_curation" -> ((s, d) => {
      val pairs = TextQueries.sharedCandidatePairs(s, d)
      // doc-grain state+delta frame, cached once (the q277 canon
      // discipline): doc_id, source, toks, fsize(full), fsize_old,
      // n_batch, is_dem — every histogram below folds off it
      val docstate = Shared.frame(s, "incr_curation_state", d) {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("bigint").as("toks"))
        val members = TextQueries.sharedMembers(s, d)
        val batchN = members.filter(col("doc_id") % 10 === 7)
          .groupBy(col("canon")).agg(count(lit(1)).as("n_batch"))
        val fam = members.join(batchN, Seq("canon"), "left")
          .select(col("doc_id"), col("fsize"),
            coalesce(col("n_batch"), lit(0L)).as("n_batch"),
            (col("fsize") - coalesce(col("n_batch"), lit(0L)))
              .as("fsize_old"))
        val nonCanonOld = pairs
          .filter(col("doc_a") % 10 =!= 7 && col("doc_b") % 10 =!= 7)
          .select(col("doc_b")).distinct()
        val oldCanon = base.filter(col("doc_id") % 10 =!= 7)
          .join(nonCanonOld, base("doc_id") === col("doc_b"),
            "left_anti")
        val demotedIds = pairs.filter(col("doc_a") % 10 === 7)
          .select(col("doc_b").as("doc_id")).distinct()
          .withColumn("is_dem", lit(1L))
        // lazy localCheckpoint (the Components lineage-cut posture):
        // the three delta branches below each re-reference this frame,
        // and WITHOUT the cut every downstream action re-analyzes the
        // full pairs+members lineage ~8× per run — measured 31–44 s of
        // pure plan canonicalization per steady-state run at sf0.1 vs
        // ~1 s once the cached artifacts are LogicalRDD-backed
        oldCanon.join(fam, "doc_id")
          .join(demotedIds, Seq("doc_id"), "left")
          .localCheckpoint(false)
      }
      val batchCanon = Shared.frame(s, "incr_curation_batch", d) {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("bigint").as("toks"))
        base.filter(col("doc_id") % 10 === 7)
          .join(pairs.select(col("doc_b")),
            base("doc_id") === col("doc_b"), "left_anti")
          .join(TextQueries.sharedMembers(s, d)
            .select(col("doc_id"), col("fsize")), "doc_id")
          .localCheckpoint(false)
      }
      // stored state + the three signed deltas, all at
      // (source, toks, fsize) grain
      val stored = docstate
        .groupBy(col("source"), col("toks"),
          col("fsize_old").as("fsize"))
        .agg(count(lit(1)).as("cnt"))
      val demotedDelta = docstate.filter(col("is_dem") === 1L)
        .groupBy(col("source"), col("toks"),
          col("fsize_old").as("fsize"))
        .agg((-count(lit(1))).as("cnt"))
      val moves = docstate
        .filter(col("is_dem").isNull && col("n_batch") > 0)
        .select(col("source"), col("toks"), explode(array(
          struct(col("fsize_old").as("fsize"), lit(-1L).as("cnt")),
          struct(col("fsize").as("fsize"), lit(1L).as("cnt")))).as("m"))
        .select(col("source"), col("toks"), col("m.fsize").as("fsize"),
          col("m.cnt").as("cnt"))
      val additions = batchCanon
        .groupBy(col("source"), col("toks"), col("fsize"))
        .agg(count(lit(1)).as("cnt"))
      // the folded histogram is cached as its own run-shared artifact
      // (it IS the post-fold stored state a deployment would persist):
      // the MAD gate's value-at-rank machinery below runs several
      // planner actions (quantile chunking + partials per statistic),
      // and each one re-executing the 4-branch union measured ~47 s
      // steady at sf0.1 vs ~1 s off the cache — the exact q277
      // curation_kept staging lesson replayed
      val merged = Shared.frame(s, "incr_curation_hist", d) {
        stored.unionByName(demotedDelta).unionByName(moves)
          .unionByName(additions)
          .groupBy(col("source"), col("toks"), col("fsize"))
          .agg(sum(col("cnt")).as("cnt"))
          .filter(col("cnt") =!= 0)
          .localCheckpoint(false)
      }
      val hist2 = merged.groupBy(col("source"), col("toks"))
        .agg(sum(col("cnt")).as("cnt"))
      // the gated histogram is the session's third cached artifact
      // (q277's curation_kept discipline): madGateDf's value-at-rank
      // machinery runs ~5 planner actions, and re-running them at
      // every query CONSTRUCTION measured ~8 s steady at sf0.1 vs
      // cache-lookup construction once the gate rides the kept frame
      val keptHist = Shared.frame(s, "incr_curation_kept", d) {
        val gateDf = madGateDf(s, hist2, "q278")
        merged.join(broadcast(gateDf), "source")
          .filter(abs(col("toks") - col("median_len"))
            <= col("mad") * 3)
      }
      // the multiply must happen at DECIMAL grain: histogram cells carry
      // a cnt factor q277's per-doc form doesn't, so the Long product
      // cnt*toks*1e6 wraps at ~9.2e18 — reachable at the 100 TB corpus
      // this targets — and a wrapped value sails PAST the wt_mass
      // envelope. In decimal(38,0) the product is exact; past 38 digits
      // it NULLs and the envelope's IS NULL arm fires loudly instead.
      // (tokens_kept stays bigint: no 1e6 factor, ~4e5× headroom.)
      val per = keptHist
        .select(col("source"), col("median_len"), col("mad"),
          col("cnt"), col("toks"),
          (col("cnt").cast("decimal(38,0)") * col("toks")
            * expr("1000000L div fsize"))
            .cast("decimal(38,0)").as("wt"))
        .groupBy(col("source"))
        .agg(max(col("median_len")).as("median_len"),
          max(col("mad")).as("mad"),
          sum(col("cnt")).as("docs_kept"),
          sum(col("cnt") * col("toks")).as("tokens_kept"),
          sum(col("wt")).as("wt_mass"))
      val tot = hist2.groupBy(col("source"))
        .agg(sum(col("cnt")).as("docs_canonical"))
      val ctot = per.agg(
        sum(col("tokens_kept")).cast("decimal(38,0)").as("tot_raw"),
        sum(col("wt_mass")).as("tot_wt"))
      val demPer = docstate.filter(col("is_dem") === 1L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("docs_demoted"))
      val addPer = batchCanon.groupBy(col("source"))
        .agg(count(lit(1)).as("docs_added"))
      tot.join(per, "source")
        .join(demPer, Seq("source"), "left")
        .join(addPer, Seq("source"), "left")
        .crossJoin(broadcast(ctot))
        .select(col("source"), col("docs_canonical"), col("docs_kept"),
          col("median_len"), col("mad"), col("tokens_kept"),
          expr("CAST(CAST(tokens_kept AS DECIMAL(38,0)) * 1000000 " +
            "div tot_raw AS BIGINT)").as("raw_ppm"),
          expr(s"CAST(CASE WHEN wt_mass IS NULL OR " +
            s"wt_mass > $CurationWtEnvelope THEN " +
            "CAST(raise_error('q278: wt_mass beyond DECIMAL(38,0) " +
            "ppm envelope') AS DECIMAL(38,0)) ELSE wt_mass END " +
            "* 1000000 div tot_wt AS BIGINT)").as("eff_ppm"),
          coalesce(col("docs_demoted"), lit(0L)).as("docs_demoted"),
          coalesce(col("docs_added"), lit(0L)).as("docs_added"))
    })
  )

  /** q119/q133 shared body: learn the BPE merges, encode at VOCAB grain
    * (each distinct word symbolized + merged once, then word-level token
    * counts join back onto (doc, word) occurrence counts — repeated
    * words are never re-encoded), yielding (doc_id, n_bpe_tokens).
    */
  private def bpeDocTokens(s: SparkSession, d: String): DataFrame = {
    val merges = graft.functions.Bpe
      .learn(Tables.documents(s, d), "text", rounds = BpeRounds,
        vocabCap = BpeVocabCap)
    val occ = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("n_occ"))
    val dict = occ.select(col("word")).distinct()
      .withColumn("s", graft.functions.Bpe.symbolize)
    val encoded = merges.foldLeft(dict) { (df, m) =>
      df.withColumn("s",
        graft.functions.Bpe.applyMerge(col("s"), m.lft, m.rgt))
    }.select(col("word"), size(split(col("s"), " ")).as("n_toks"))
    occ.join(encoded, "word")
      .groupBy(col("doc_id"))
      .agg(sum(col("n_occ") * col("n_toks")).as("n_bpe_tokens"))
  }

  private def gram8(prefix: String): String =
    (0 until 8).map(i => s"tk[p + $i]").mkString(", ")

  // ---- BPE constants pinned for oracle unrolling
  private val BpeRounds = 5
  private val BpeVocabCap = 200

  /** One BPE round as DuckDB CTEs: freq-weighted adjacent-pair counts
    * over v{r-1}, the (cnt desc, pair asc) winner, and the vocabulary
    * with that merge applied — the exact mirror of Bpe.learn's round,
    * including the doubled-separator replace (see Bpe.applyMerge for
    * why that makes plain `replace` order-safe).
    */
  private def bpeRound(r: Int): String =
    s"""p$r AS (
       |  SELECT tk[i] || ' ' || tk[i + 1] AS pair,
       |    CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM (
       |    SELECT freq, tk,
       |      unnest(generate_series(1, len(tk) - 1)) AS i
       |    FROM (SELECT freq, string_split(s, ' ') AS tk FROM v${r - 1}))
       |  GROUP BY 1),
       |m$r AS (
       |  SELECT pair, cnt, string_split(pair, ' ')[1] AS pa,
       |    string_split(pair, ' ')[2] AS pb
       |  FROM p$r ORDER BY cnt DESC, pair ASC LIMIT 1),
       |v$r AS (
       |  SELECT v.word, v.freq,
       |    trim(replace(replace(' ' || replace(v.s, ' ', '  ') || ' ',
       |      ' ' || m.pa || '  ' || m.pb || ' ',
       |      ' ' || m.pa || m.pb || ' '), '  ', ' ')) AS s
       |  FROM v${r - 1} v, m$r m)""".stripMargin

  /** Shared prefix of the q115/q119 oracles: v0 (symbolized capped
    * vocabulary) + the `BpeRounds` unrolled training rounds.
    */
  private def bpeCtes: String = {
    val rounds = (1 to BpeRounds).map(bpeRound).mkString(",\n")
    s"""v0 AS (
       |  SELECT word, freq,
       |    array_to_string(list_transform(generate_series(1,
       |      length(word)), i -> substr(word, i, 1)), ' ') || ' </w>'
       |      AS s
       |  FROM (
       |    SELECT tok AS word, count(*) AS freq
       |    FROM (SELECT unnest(string_split(text, ' ')) AS tok
       |      FROM documents)
       |    GROUP BY tok
       |    ORDER BY 2 DESC, 1 ASC
       |    LIMIT $BpeVocabCap)),
       |$rounds""".stripMargin
  }

  private def bpeSql: String = {
    val out = (1 to BpeRounds).map(r =>
      s"""SELECT CAST($r AS INT) AS merge_round, pa AS lft, pb AS rgt,
         |  pa || pb AS merged, cnt FROM m$r""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""WITH $bpeCtes
       |$out""".stripMargin
  }

  /** q119 oracle: replay training (bpeCtes), then apply each round's
    * winning merge to every (doc, word) occurrence group — the same
    * doubled-separator replace as v$r, at document grain.
    */
  private def bpeEncCtes: String = {
    val encs = (1 to BpeRounds).map(r =>
      s"""e$r AS (
         |  SELECT e.doc_id, e.word, e.n_occ,
         |    trim(replace(replace(' ' || replace(e.s, ' ', '  ') || ' ',
         |      ' ' || m.pa || '  ' || m.pb || ' ',
         |      ' ' || m.pa || m.pb || ' '), '  ', ' ')) AS s
         |  FROM e${r - 1} e, m$r m)""".stripMargin).mkString(",\n")
    s"""$bpeCtes,
       |e0 AS (
       |  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS n_occ,
       |    array_to_string(list_transform(generate_series(1,
       |      length(word)), i -> substr(word, i, 1)), ' ') || ' </w>'
       |      AS s
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |    FROM documents)
       |  GROUP BY doc_id, word),
       |$encs,
       |enc AS (
       |  SELECT doc_id,
       |    CAST(sum(n_occ * len(string_split(s, ' '))) AS BIGINT)
       |      AS n_bpe_tokens
       |  FROM e$BpeRounds GROUP BY doc_id)""".stripMargin
  }

  private def bpeEncodeSql: String =
    s"""WITH $bpeEncCtes
       |SELECT doc_id, n_bpe_tokens FROM enc""".stripMargin

  /** q133 oracle: the q119 encode replay collapsed to per-language
    * fertility (single double division of two exact longs).
    */
  private def fertilitySql: String =
    s"""WITH $bpeEncCtes,
       |d AS (SELECT doc_id, lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
       |  FROM documents)
       |SELECT lang,
       |  CAST(sum(n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
       |  CAST(sum(n_words) AS BIGINT) AS n_words,
       |  CAST(CAST(sum(n_bpe_tokens) AS BIGINT) AS DOUBLE)
       |    / CAST(CAST(sum(n_words) AS BIGINT) AS DOUBLE) AS fertility
       |FROM enc JOIN d USING (doc_id)
       |GROUP BY lang""".stripMargin

  private def bloomSkippingOracle: String = {
    def h(c: String, off: Int) =
      s"(CAST(concat('0x', substr(md5(CAST($c AS VARCHAR)), $off, 8)) " +
        s"AS BIGINT))"
    s"""WITH li AS (SELECT DISTINCT l_orderkey // 1024 AS file_id,
       |    l_partkey FROM lineitem),
       |lih AS (SELECT file_id, l_partkey,
       |    (${h("l_partkey", 1)} & 8191) AS h1,
       |    ((${h("l_partkey", 17)} & 8191) | 1) AS h2
       |  FROM li),
       |bits AS (SELECT DISTINCT file_id,
       |    ((h1 + h2 * i) & 8191) AS pos
       |  FROM lih, generate_series(0, 3) g(i)),
       |pl AS (SELECT p_partkey AS probe_pk FROM part
       |  WHERE p_partkey % 100 = 3),
       |plh AS (SELECT probe_pk,
       |    (${h("probe_pk", 1)} & 8191) AS h1,
       |    ((${h("probe_pk", 17)} & 8191) | 1) AS h2
       |  FROM pl),
       |pp AS (SELECT probe_pk, ((h1 + h2 * i) & 8191) AS pos
       |  FROM plh, generate_series(0, 3) g(i)),
       |bs AS (SELECT probe_pk, file_id FROM pp JOIN bits USING (pos)
       |  GROUP BY 1, 2 HAVING count(*) = 4),
       |bsc AS (SELECT probe_pk, CAST(count(*) AS BIGINT)
       |    AS n_files_bloom FROM bs GROUP BY 1),
       |tr AS (SELECT l_partkey AS probe_pk, CAST(count(*) AS BIGINT)
       |    AS n_files_true FROM li GROUP BY 1),
       |nf AS (SELECT CAST(count(DISTINCT file_id) AS BIGINT)
       |    AS n_files_total FROM li)
       |SELECT pl.probe_pk,
       |  CAST(coalesce(bsc.n_files_bloom, 0) AS BIGINT) AS n_files_bloom,
       |  CAST(coalesce(tr.n_files_true, 0) AS BIGINT) AS n_files_true,
       |  CAST(coalesce(bsc.n_files_bloom, 0)
       |    - coalesce(tr.n_files_true, 0) AS BIGINT) AS n_false_pos,
       |  nf.n_files_total
       |FROM pl LEFT JOIN bsc USING (probe_pk)
       |LEFT JOIN tr USING (probe_pk), nf""".stripMargin
  }

  /** DuckDB mirror of [[wkey]]. */
  private def wkeySql(c: String): String =
    s"CAST(concat('0x', substr(md5($c), 1, 15)) AS BIGINT)"

  val oracle: Map[String, String] = Map(
    // bigram LM + bit-length surprisal + integer tercile thresholds
    // replayed exactly (see the q195 query comment)
    "q195_lm_perplexity" ->
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |bg AS (SELECT doc_id,
        |    ${wkeySql("t[i]")} AS w1,
        |    ${wkeySql("t[i+1]")} AS w2
        |  FROM tk, unnest(generate_series(1, len(t) - 1)) s(i)
        |  WHERE len(t) >= 2),
        |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        |  FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1
        |  FROM c12 GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT ${wkeySql("w")}) AS BIGINT)
        |    AS v
        |  FROM (SELECT unnest(t) AS w FROM tk)),
        |sc AS (SELECT bg.doc_id,
        |    CAST(length(bin((c1.c1 + v.v) // (c12.c12 + 1))) - 1
        |      AS BIGINT) AS sv
        |  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v),
        |pd AS (SELECT d.doc_id,
        |    CAST(count(sc.sv) AS BIGINT) AS n_bigrams,
        |    CAST(coalesce(sum(sc.sv), 0) AS BIGINT) AS surprisal_sum
        |  FROM documents d LEFT JOIN sc USING (doc_id)
        |  GROUP BY d.doc_id),
        |ps AS (SELECT doc_id, n_bigrams, surprisal_sum,
        |    CAST(CASE WHEN n_bigrams = 0 THEN 0
        |      ELSE surprisal_sum * 1000 // n_bigrams END AS BIGINT)
        |      AS score_x1000
        |  FROM pd),
        |h AS (SELECT score_x1000 AS sv2, count(*) AS c
        |  FROM ps GROUP BY 1),
        |ch AS (SELECT sv2, sum(c) OVER (ORDER BY sv2) AS cum,
        |    (SELECT count(*) FROM ps) AS n
        |  FROM h),
        |t AS (SELECT
        |    min(CASE WHEN cum * 3 >= n THEN sv2 END) AS t1,
        |    min(CASE WHEN cum * 3 >= n * 2 THEN sv2 END) AS t2
        |  FROM ch)
        |SELECT ps.doc_id, ps.n_bigrams, ps.surprisal_sum, ps.score_x1000,
        |  CASE WHEN ps.score_x1000 <= t.t1 THEN 'head'
        |    WHEN ps.score_x1000 <= t.t2 THEN 'middle'
        |    ELSE 'tail' END AS bucket
        |FROM ps, t""".stripMargin,

    "q174_bloom_skipping" -> bloomSkippingOracle,

    "q187_pipeline_funnel" ->
      s"""WITH d AS (SELECT doc_id, text,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        |  FROM documents),
        |ek AS (SELECT min(doc_id) AS doc_id FROM d GROUP BY md5(text)),
        |pairs AS (${TextQueries.minhashPairsSql}),
        |nd AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
        |s2 AS (SELECT d.* FROM d JOIN ek USING (doc_id)),
        |s3 AS (SELECT * FROM s2
        |  WHERE doc_id NOT IN (SELECT doc_id FROM nd)),
        |t AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS tok FROM documents),
        |fb AS (SELECT doc_id,
        |    ${SamplingQueries.hashBucketSql("tok", 1, 1024)} AS b FROM t),
        |fw AS (SELECT doc_id,
        |    (${SamplingQueries.hashBucketSql("b", 9, 2001)}) - 1000 AS w
        |  FROM fb),
        |qk AS (SELECT doc_id FROM fw GROUP BY doc_id
        |  HAVING sum(w) >= 0),
        |s4 AS (SELECT s3.* FROM s3 JOIN qk USING (doc_id))
        |SELECT CAST(1 AS INT) AS stage, 'raw' AS stage_name,
        |  count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS n_tokens
        |FROM d
        |UNION ALL
        |SELECT 2, 'exact_dedup', count(*), CAST(sum(toks) AS BIGINT)
        |FROM s2
        |UNION ALL
        |SELECT 3, 'near_dedup', count(*), CAST(sum(toks) AS BIGINT)
        |FROM s3
        |UNION ALL
        |SELECT 4, 'quality_gate', count(*), CAST(sum(toks) AS BIGINT)
        |FROM s4""".stripMargin,

    "q182_span_corruption" ->
      s"""WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk,
        |    ${SamplingQueries.hashBucketSql("doc_id", 21, 10)} AS off
        |  FROM documents)
        |SELECT doc_id,
        |  array_to_string(list_filter(list_transform(
        |    generate_series(1, len(tk)), p ->
        |      CASE WHEN (p - 1 + off) % 10 < 3 THEN
        |        CASE WHEN (p - 1 + off) % 10 = 0 OR p = 1
        |          THEN concat('<X',
        |            CAST((p - 1 + off) // 10 AS VARCHAR), '>')
        |          ELSE '' END
        |        ELSE tk[p] END), x -> x <> ''), ' ') AS input_text,
        |  array_to_string(list_filter(list_transform(
        |    generate_series(1, len(tk)), p ->
        |      CASE WHEN (p - 1 + off) % 10 < 3 THEN
        |        CASE WHEN (p - 1 + off) % 10 = 0 OR p = 1
        |          THEN concat('<X',
        |            CAST((p - 1 + off) // 10 AS VARCHAR), '> ', tk[p])
        |          ELSE tk[p] END
        |        ELSE '' END), x -> x <> ''), ' ') AS target_text,
        |  CAST(list_sum(list_transform(generate_series(1, len(tk)),
        |    p -> CASE WHEN (p - 1 + off) % 10 < 3
        |      AND ((p - 1 + off) % 10 = 0 OR p = 1)
        |      THEN 1 ELSE 0 END)) AS BIGINT) AS n_spans
        |FROM t""".stripMargin,
    "q137_drift_audit" ->
      s"""WITH t AS (SELECT (doc_id % 10 >= 8) AS is_cur,
        |    unnest(string_split(text, ' ')) AS tok FROM documents),
        |tb AS (SELECT is_cur,
        |    ${SamplingQueries.hashBucketSql("tok", 1, 64)} AS b FROM t),
        |agg AS (SELECT b,
        |    CAST(sum(CASE WHEN is_cur THEN 0 ELSE 1 END) AS BIGINT)
        |      AS ref_b,
        |    CAST(sum(CASE WHEN is_cur THEN 1 ELSE 0 END) AS BIGINT)
        |      AS cur_b
        |  FROM tb GROUP BY b),
        |tot AS (SELECT CAST(sum(ref_b) AS BIGINT) AS rr,
        |    CAST(sum(cur_b) AS BIGINT) AS cc FROM agg)
        |SELECT b, ref_b, cur_b,
        |  abs(CAST(cur_b * 100 AS DECIMAL(18,0))
        |      * CAST(rr AS DECIMAL(18,0))
        |    - CAST(ref_b * 100 AS DECIMAL(18,0))
        |      * CAST(cc AS DECIMAL(18,0)))
        |    > CAST(rr AS DECIMAL(18,0)) * CAST(cc AS DECIMAL(18,0))
        |    AS drifted
        |FROM agg, tot""".stripMargin,

    "q124_quality_classifier" ->
      s"""WITH t AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS tok FROM documents),
        |fb AS (SELECT doc_id,
        |    ${SamplingQueries.hashBucketSql("tok", 1, 1024)} AS b FROM t),
        |fw AS (SELECT doc_id,
        |    (${SamplingQueries.hashBucketSql("b", 9, 2001)}) - 1000 AS w
        |  FROM fb)
        |SELECT doc_id, CAST(sum(w) AS BIGINT) AS score,
        |  sum(w) >= 0 AS keep
        |FROM fw GROUP BY doc_id""".stripMargin,

    // DuckDB windowed sum(BIGINT) is HUGEINT: cast every derived column
    // back to BIGINT to match Spark's long arithmetic
    "q110_sequence_packing" ->
      """WITH t AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_toks,
        |    sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id)
        |      AS cum
        |  FROM t)
        |SELECT doc_id, source, n_toks,
        |  CAST(cum - n_toks AS BIGINT) AS tok_offset,
        |  CAST((cum - n_toks) // 2048 AS BIGINT) AS bin_first,
        |  CAST((cum - 1) // 2048 AS BIGINT) AS bin_last
        |FROM c""".stripMargin,

    "q127_containment_decontam" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
        |    FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |    md5(concat_ws(' ', ${gram8("tk")})) AS shh
        |  FROM (SELECT doc_id, tk,
        |      unnest(generate_series(1, greatest(len(tk) - 7, 1))) AS p
        |    FROM toks)),
        |bench AS (SELECT shh, doc_id AS bench_id FROM sh
        |  WHERE doc_id % 10 = 0),
        |bsz AS (SELECT bench_id, count(*) AS n_bench FROM bench
        |  GROUP BY bench_id),
        |p AS (
        |  SELECT t.doc_id AS train_id, b.bench_id, count(*) AS n_shared
        |  FROM sh t JOIN bench b ON t.shh = b.shh
        |  WHERE t.doc_id % 10 <> 0
        |  GROUP BY t.doc_id, b.bench_id)
        |SELECT bench_id, train_id, n_shared, n_bench
        |FROM p JOIN bsz USING (bench_id)
        |WHERE n_shared * 5 >= n_bench * 4""".stripMargin,

    "q51_decontam" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
        |    FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |    md5(concat_ws(' ', ${gram8("tk")})) AS shh
        |  FROM (SELECT doc_id, tk,
        |      unnest(generate_series(1, greatest(len(tk) - 7, 1))) AS p
        |    FROM toks))
        |SELECT a.doc_id AS train_id, b.doc_id AS test_id,
        |  count(*) AS shared_8grams
        |FROM sh a JOIN sh b ON a.shh = b.shh
        |WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
        |GROUP BY a.doc_id, b.doc_id""".stripMargin,

    // the bloom is a prefilter, not a semantics change: the oracle is
    // the plain exact semi-join — any bloom false negative or a
    // surviving false positive would break this parity
    "q116_bloom_decontam" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
        |    FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |    concat_ws(' ', ${gram8("tk")}) AS sh
        |  FROM (SELECT doc_id, tk,
        |      unnest(generate_series(1, greatest(len(tk) - 7, 1))) AS p
        |    FROM toks))
        |SELECT a.doc_id AS train_id, count(*) AS n_bad_grams
        |FROM sh a
        |WHERE a.doc_id % 10 <> 0 AND EXISTS (
        |  SELECT 1 FROM sh b WHERE b.doc_id % 10 = 0 AND b.sh = a.sh)
        |GROUP BY a.doc_id""".stripMargin,

    // the oracle asserts merged == monolithic probes HOLD — an exact
    // algebraic property, not a tolerance
    "q121_sketch_merge_audit" ->
      """SELECT tok, count(*) AS exact_cnt, TRUE AS merge_exact
        |FROM (SELECT unnest(string_split(text, ' ')) AS tok
        |      FROM documents)
        |GROUP BY tok
        |ORDER BY exact_cnt DESC, tok ASC
        |LIMIT 20""".stripMargin,

    // the oracle asserts the CMS bound HOLDS — deterministic for fixed
    // data; a sketch drifting past est ≤ exact + 8N/w would be real
    "q118_cms_heavyhitters" ->
      """SELECT tok, count(*) AS exact_cnt, TRUE AS within_bound
        |FROM (SELECT unnest(string_split(text, ' ')) AS tok
        |      FROM documents)
        |GROUP BY tok
        |ORDER BY exact_cnt DESC, tok ASC
        |LIMIT 20""".stripMargin,

    "q53_vocab_topk" ->
      """SELECT tok, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |GROUP BY tok
        |ORDER BY cnt DESC, tok ASC
        |LIMIT 20""".stripMargin,

    // grams grouped by STRING here vs xxhash64 in Spark — identical
    // counts absent 64-bit collisions (none at test scale; see the
    // query comment for the 100 TB collision bound)
    "q147_gopher_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
        |    FROM documents),
        |g AS (
        |  SELECT doc_id, n,
        |    array_to_string(list_slice(tk, i, i + n - 1), ' ') AS g
        |  FROM (SELECT doc_id, n, tk,
        |      unnest(generate_series(1, len(tk) - n + 1)) AS i
        |    FROM t, (VALUES (2), (3), (4)) v(n)
        |    WHERE len(tk) >= n)),
        |pg AS (SELECT doc_id, n, g, count(*) AS c
        |  FROM g GROUP BY 1, 2, 3),
        |pn AS (SELECT doc_id, n, max(c) AS top, sum(c) AS nb
        |  FROM pg GROUP BY 1, 2),
        |wide AS (SELECT doc_id,
        |    CAST(coalesce(max(CASE WHEN n = 2 THEN top END), 0) AS BIGINT)
        |      AS top2,
        |    CAST(coalesce(max(CASE WHEN n = 2 THEN nb END), 0) AS BIGINT)
        |      AS nb2,
        |    CAST(coalesce(max(CASE WHEN n = 3 THEN top END), 0) AS BIGINT)
        |      AS top3,
        |    CAST(coalesce(max(CASE WHEN n = 3 THEN nb END), 0) AS BIGINT)
        |      AS nb3,
        |    CAST(coalesce(max(CASE WHEN n = 4 THEN top END), 0) AS BIGINT)
        |      AS top4,
        |    CAST(coalesce(max(CASE WHEN n = 4 THEN nb END), 0) AS BIGINT)
        |      AS nb4
        |  FROM pn GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_toks,
        |  CAST(coalesce(w.top2, 0) AS BIGINT) AS top2,
        |  CAST(coalesce(w.nb2, 0) AS BIGINT) AS nb2,
        |  CAST(coalesce(w.top3, 0) AS BIGINT) AS top3,
        |  CAST(coalesce(w.nb3, 0) AS BIGINT) AS nb3,
        |  CAST(coalesce(w.top4, 0) AS BIGINT) AS top4,
        |  CAST(coalesce(w.nb4, 0) AS BIGINT) AS nb4,
        |  (coalesce(w.top2, 0) * 100 <= coalesce(w.nb2, 0) * 20
        |    AND coalesce(w.top3, 0) * 100 <= coalesce(w.nb3, 0) * 18
        |    AND coalesce(w.top4, 0) * 100 <= coalesce(w.nb4, 0) * 16)
        |    AS keep
        |FROM documents d LEFT JOIN wide w USING (doc_id)""".stripMargin,

    "q155_corpus_datasheet" ->
      """SELECT source, lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
        |  CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT)
        |    AS dup_docs,
        |  (CAST(sum(len(string_split(text, ' '))) AS BIGINT)
        |    / CAST(count(*) AS BIGINT)) AS avg_tokens,
        |  (CAST(count(DISTINCT md5(text)) AS BIGINT)
        |    / CAST(count(*) AS BIGINT)) AS unique_ratio
        |FROM documents
        |GROUP BY source, lang""".stripMargin,

    "q54_repetition" ->
      """WITH tc AS (
        |  SELECT doc_id, tok, count(*) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |  GROUP BY doc_id, tok)
        |SELECT doc_id, CAST(max(c) AS BIGINT) AS max_tok_freq,
        |  CAST(sum(c) AS BIGINT) AS n_tokens,
        |  (CAST(max(c) AS BIGINT) / CAST(sum(c) AS BIGINT))
        |    AS repetition_ratio
        |FROM tc GROUP BY doc_id""".stripMargin,

    "q55_prefix_dup" ->
      """SELECT md5(array_to_string(list_slice(string_split(text, ' '), 1, 10),
        |      ' '))
        |    AS prefix_hash,
        |  min(doc_id) AS canonical_id, count(*) AS n_docs
        |FROM documents
        |GROUP BY 1 HAVING count(*) > 1""".stripMargin,

    "q95_corpus_pipeline" ->
      s"""WITH pairs AS (${TextQueries.minhashPairsSql}),
        |canonical AS (
        |  SELECT doc_id, source, text FROM documents
        |  WHERE doc_id NOT IN (SELECT doc_b FROM pairs)),
        |stats AS (
        |  SELECT doc_id, max(c) AS mx, sum(c) AS n_tokens FROM (
        |    SELECT doc_id, tok, count(*) AS c FROM (
        |      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |      FROM canonical) GROUP BY doc_id, tok)
        |  GROUP BY doc_id
        |  HAVING sum(c) >= 10 AND max(c) * 5 <= sum(c))
        |SELECT CASE WHEN CAST(concat('0x',
        |    substr(md5(CAST(c.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |    % 100 < 90 THEN 'train' ELSE 'eval' END AS split,
        |  c.source, count(*) AS n_docs,
        |  CAST(sum(s.n_tokens) AS BIGINT) AS n_tokens
        |FROM canonical c JOIN stats s ON c.doc_id = s.doc_id
        |GROUP BY 1, 2""".stripMargin,

    "q104_repeated_spans" ->
      """WITH sp AS (SELECT doc_id, substr(text, p, 64) AS sh
        |  FROM (SELECT doc_id, text,
        |      unnest(generate_series(1, greatest(length(text) - 63, 1),
        |        32)) AS p
        |    FROM documents))
        |SELECT md5(sh) AS span_hash, min(sh) AS span,
        |  count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
        |FROM sp
        |GROUP BY md5(sh)
        |HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY n_occ DESC, span_hash ASC
        |LIMIT 20""".stripMargin,

    "q105_source_overlap" ->
      s"""WITH toks AS (SELECT source, string_split(text, ' ') AS tk
        |    FROM documents),
        |g AS (SELECT DISTINCT source,
        |    md5(concat_ws(' ', ${gram8("tk")})) AS h
        |  FROM (SELECT source, tk,
        |      unnest(generate_series(1, greatest(len(tk) - 7, 1))) AS p
        |    FROM toks))
        |SELECT a.source AS src_a, b.source AS src_b,
        |  count(*) AS shared_8grams
        |FROM g a JOIN g b ON a.h = b.h AND a.source < b.source
        |GROUP BY 1, 2""".stripMargin,

    "q115_bpe_merges" -> bpeSql,
    "q119_bpe_encode" -> bpeEncodeSql,
    "q133_tokenizer_fertility" -> fertilitySql,

    "q142_padding_waste" ->
      """WITH t AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT)
        |      AS n_toks FROM documents),
        |m AS (SELECT max(n_toks) AS mx FROM t),
        |b AS (SELECT n_toks, mx,
        |    ((n_toks + 63) // 64) * 64 AS bucket FROM t, m)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  count(*) AS n_docs,
        |  CAST(sum(n_toks) AS BIGINT) AS toks,
        |  CAST(sum(bucket - n_toks) AS BIGINT) AS pad_bucketed,
        |  CAST(sum(mx - n_toks) AS BIGINT) AS pad_naive
        |FROM b GROUP BY bucket""".stripMargin,

    "q141_domain_pagerank" ->
      s"""WITH toks AS (SELECT source, string_split(text, ' ') AS tk
        |    FROM documents),
        |g AS (SELECT DISTINCT source,
        |    md5(concat_ws(' ', ${gram8("tk")})) AS h
        |  FROM (SELECT source, tk,
        |      unnest(generate_series(1, greatest(len(tk) - 7, 1))) AS p
        |    FROM toks)),
        |half AS (SELECT a.source AS u, b.source AS v,
        |    CAST(count(*) AS BIGINT) AS w
        |  FROM g a JOIN g b ON a.h = b.h AND a.source < b.source
        |  GROUP BY 1, 2),
        |edges AS (SELECT u, v, w FROM half
        |  UNION ALL SELECT v AS u, u AS v, w FROM half),
        |stg AS (SELECT u, CAST(sum(w) AS BIGINT) AS st FROM edges
        |  GROUP BY u),
        |e AS (SELECT edges.u, v, w, st FROM edges JOIN stg USING (u)),
        |nodes AS (SELECT DISTINCT source FROM documents),
        |r0 AS (SELECT source, CAST(1000000 AS BIGINT) AS r FROM nodes),
        |c1 AS (SELECT v, CAST(sum((r * w) // st) AS BIGINT) AS cs
        |  FROM e JOIN r0 ON e.u = r0.source GROUP BY v),
        |r1 AS (SELECT source,
        |    CAST(150000 + (coalesce(cs, 0) * 85) // 100 AS BIGINT) AS r
        |  FROM nodes LEFT JOIN c1 ON source = v),
        |c2 AS (SELECT v, CAST(sum((r * w) // st) AS BIGINT) AS cs
        |  FROM e JOIN r1 ON e.u = r1.source GROUP BY v),
        |r2 AS (SELECT source,
        |    CAST(150000 + (coalesce(cs, 0) * 85) // 100 AS BIGINT) AS r
        |  FROM nodes LEFT JOIN c2 ON source = v),
        |c3 AS (SELECT v, CAST(sum((r * w) // st) AS BIGINT) AS cs
        |  FROM e JOIN r2 ON e.u = r2.source GROUP BY v),
        |r3 AS (SELECT source,
        |    CAST(150000 + (coalesce(cs, 0) * 85) // 100 AS BIGINT) AS r
        |  FROM nodes LEFT JOIN c3 ON source = v)
        |SELECT r3.source, r AS rank,
        |  coalesce(st, 0) AS strength
        |FROM r3 LEFT JOIN stg ON r3.source = stg.u""".stripMargin,

    "q139_dup_span_scrub" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
        |    FROM documents),
        |b AS (SELECT doc_id, i AS block_id,
        |    array_to_string(words[(i*8+1):(i*8+8)], ' ') AS btext
        |  FROM (SELECT doc_id, words,
        |      unnest(generate_series(0, (len(words)-1)//8)) AS i
        |    FROM w)),
        |h AS (SELECT doc_id, block_id, btext, md5(btext) AS h FROM b),
        |dup AS (SELECT h FROM
        |    (SELECT h, count(DISTINCT doc_id) AS nd FROM h GROUP BY h)
        |  WHERE nd >= 2),
        |k AS (SELECT x.doc_id, x.block_id, x.btext,
        |    (d.h IS NOT NULL) AS rm
        |  FROM h x LEFT JOIN dup d USING (h)),
        |agg AS (SELECT doc_id,
        |    count(*) AS n_blocks,
        |    CAST(sum(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_removed,
        |    coalesce(string_agg(btext, ' ' ORDER BY block_id)
        |      FILTER (WHERE NOT rm), '') AS clean
        |  FROM k GROUP BY doc_id)
        |SELECT doc_id, n_blocks, n_removed, md5(clean) AS clean_md5,
        |  CAST(len(clean) AS BIGINT) AS clean_chars
        |FROM agg""".stripMargin,

    "q140_boilerplate_blocks" ->
      """WITH w AS (SELECT doc_id, source,
        |    string_split(text, ' ') AS words FROM documents),
        |b AS (SELECT doc_id, source,
        |    array_to_string(words[(i*8+1):(i*8+8)], ' ') AS btext
        |  FROM (SELECT doc_id, source, words,
        |      unnest(generate_series(0, (len(words)-1)//8)) AS i
        |    FROM w)),
        |sz AS (SELECT source, count(DISTINCT doc_id) AS n_src_docs
        |  FROM documents GROUP BY source),
        |c AS (SELECT source, md5(btext) AS h, min(btext) AS span,
        |    count(DISTINCT doc_id) AS n_docs
        |  FROM b GROUP BY source, md5(btext))
        |SELECT c.source, span, n_docs, n_src_docs
        |FROM c JOIN sz ON c.source = sz.source
        |WHERE n_docs >= 2 AND n_docs * 20 >= n_src_docs""".stripMargin,

    "q56_scrub" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, 'key|value|data')) AS INT)
        |    AS n_hits,
        |  md5(regexp_replace(text, 'key|value|data', '<REDACTED>', 'g'))
        |    AS redacted_fp
        |FROM documents""".stripMargin,

    // decile thresholds replayed as row_number value-at-rank (rk·10 ≥
    // k·n is the same ceil(k·n/10) position the histogram min-when
    // picks); decile membership = 1 + #thresholds strictly below
    "q200_vocab_growth" ->
      """WITH n AS (SELECT count(*) AS n FROM documents),
        |r AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY doc_id) AS rk FROM documents),
        |th AS (SELECT k, min(CASE WHEN rk * 10 >= k * (SELECT n FROM n)
        |    THEN doc_id END) AS t
        |  FROM r, unnest(generate_series(1, 10)) AS g(k) GROUP BY k),
        |dd AS (SELECT d.doc_id,
        |    CAST(1 + sum(CASE WHEN th.t < d.doc_id THEN 1 ELSE 0 END)
        |      AS INT) AS decile,
        |    max(len(string_split(d.text, ' '))) AS toks
        |  FROM documents d CROSS JOIN th GROUP BY d.doc_id),
        |occ AS (SELECT decile, CAST(sum(toks) AS BIGINT) AS toks
        |  FROM dd GROUP BY decile),
        |firsts AS (SELECT w, min(doc_id) AS fd FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |    FROM documents) GROUP BY w),
        |fb AS (SELECT f.w,
        |    CAST(1 + sum(CASE WHEN th.t < f.fd THEN 1 ELSE 0 END)
        |      AS INT) AS decile
        |  FROM firsts f CROSS JOIN th GROUP BY f.w, f.fd),
        |nt AS (SELECT decile, CAST(count(*) AS BIGINT) AS new_types
        |  FROM fb GROUP BY decile)
        |SELECT occ.decile AS decile, occ.toks AS toks,
        |  CAST(coalesce(nt.new_types, 0) AS BIGINT) AS new_types,
        |  CAST(sum(coalesce(nt.new_types, 0))
        |    OVER (ORDER BY occ.decile) AS BIGINT) AS cum_types,
        |  CAST(sum(occ.toks) OVER (ORDER BY occ.decile) AS BIGINT)
        |    AS cum_toks
        |FROM occ LEFT JOIN nt ON occ.decile = nt.decile""".stripMargin,

    // percentile_disc(p) = value at rank ceil(p*n), the same point
    // Quantile.groupQuantiles refines to; fence arithmetic is exact
    // (integer-valued doubles through -, x1.5, compare)
    "q201_source_quartiles" ->
      """WITH t AS (SELECT source,
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS t
        |  FROM documents),
        |q AS (SELECT source,
        |    percentile_disc(0.25) WITHIN GROUP (ORDER BY t) AS q1,
        |    percentile_disc(0.5) WITHIN GROUP (ORDER BY t) AS med,
        |    percentile_disc(0.75) WITHIN GROUP (ORDER BY t) AS q3
        |  FROM t GROUP BY source)
        |SELECT t.source AS source, CAST(count(*) AS BIGINT) AS n_docs,
        |  max(q.q1) AS q1, max(q.med) AS med, max(q.q3) AS q3,
        |  CAST(coalesce(sum(CASE
        |    WHEN t.t < q.q1 - (q.q3 - q.q1) * 1.5
        |      OR t.t > q.q3 + (q.q3 - q.q1) * 1.5
        |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_tukey_outliers
        |FROM t JOIN q ON t.source = q.source
        |GROUP BY t.source""".stripMargin,

    "q203_vocab_coverage" ->
      """WITH wds AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |cnt AS (SELECT w, count(*) AS c FROM wds GROUP BY w),
        |vocab AS (SELECT w FROM cnt ORDER BY c DESC, w ASC LIMIT 10),
        |dw AS (SELECT DISTINCT doc_id, w FROM wds),
        |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct
        |  FROM dw GROUP BY doc_id),
        |cv AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_covered
        |  FROM dw JOIN vocab USING (w) GROUP BY doc_id)
        |SELECT pd.doc_id AS doc_id, pd.n_distinct,
        |  CAST(coalesce(cv.n_covered, 0) AS BIGINT) AS n_covered,
        |  (coalesce(cv.n_covered, 0) * 1000) // pd.n_distinct
        |    AS coverage_x1000
        |FROM pd LEFT JOIN cv ON pd.doc_id = cv.doc_id""".stripMargin,

    // cross-multiplied TVD in HUGEINT (DuckDB's native exact path for
    // the DECIMAL(18,0) products Spark uses); absent-word closed form
    // as in the Spark plan: Σ_present (|c·N − cw·ns| − cw·ns) + ns·N
    "q205_source_divergence" ->
      """WITH sw AS (SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |c AS (SELECT source, tok, CAST(count(*) AS HUGEINT) AS c
        |  FROM sw GROUP BY source, tok),
        |wt AS (SELECT tok, CAST(sum(c) AS HUGEINT) AS cw FROM c
        |  GROUP BY tok),
        |st AS (SELECT source, CAST(sum(c) AS HUGEINT) AS ns FROM c
        |  GROUP BY source),
        |tot AS (SELECT CAST(sum(c) AS HUGEINT) AS nn FROM c),
        |p AS (SELECT c.source, st.ns, tot.nn,
        |    sum(abs(c.c * tot.nn - wt.cw * st.ns) - wt.cw * st.ns)
        |      AS part
        |  FROM c JOIN wt USING (tok) JOIN st ON c.source = st.source,
        |    tot
        |  GROUP BY c.source, st.ns, tot.nn)
        |SELECT source, CAST(ns AS BIGINT) AS n_tokens,
        |  CAST(((part + ns * nn) * 1000000) // (ns * nn * 2) AS BIGINT)
        |    AS tvd_ppm
        |FROM p""".stripMargin,

    // oracle replays the mean-absolute-difference identity with plain
    // windows over the (source, toks) histogram (oracle clarity over
    // oracle speed — the engine side carries the scale discipline)
    "q208_length_gini" ->
      """WITH x AS (SELECT source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        |  FROM documents),
        |h AS (SELECT source, toks, CAST(count(*) AS BIGINT) AS cv,
        |    CAST(toks * count(*) AS BIGINT) AS sv
        |  FROM x GROUP BY source, toks),
        |w AS (SELECT source, toks, cv, sv,
        |    CAST(coalesce(sum(cv) OVER (PARTITION BY source ORDER BY toks
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS c_lt,
        |    CAST(coalesce(sum(sv) OVER (PARTITION BY source ORDER BY toks
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS s_lt
        |  FROM h)
        |SELECT source, CAST(sum(cv) AS BIGINT) AS n_docs,
        |  CAST(sum(sv) AS BIGINT) AS sum_toks,
        |  CAST((CAST(sum(cv * (toks * c_lt - s_lt)) AS BIGINT) * 2
        |      * 1000000)
        |    // (2 * CAST(sum(cv) AS BIGINT) * CAST(sum(sv) AS BIGINT))
        |    AS BIGINT) AS gini_ppm
        |FROM w GROUP BY source""".stripMargin,

    "q209_calibration" ->
      s"""WITH t AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS tok FROM documents),
        |fb AS (SELECT doc_id, tok,
        |    ${SamplingQueries.hashBucketSql("tok", 1, 1024)} AS b
        |  FROM t),
        |fw AS (SELECT doc_id, tok,
        |    (${SamplingQueries.hashBucketSql("b", 9, 2001)}) - 1000 AS w
        |  FROM fb),
        |pd AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS score,
        |    CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(count(DISTINCT tok) AS BIGINT) AS uniq_tokens
        |  FROM fw GROUP BY doc_id),
        |th AS (SELECT ${(1 to 9).map(k =>
             s"percentile_disc(0.$k) WITHIN GROUP " +
               s"(ORDER BY CAST(score AS DOUBLE)) AS t$k")
             .mkString(",\n  ")}
        |  FROM pd),
        |b AS (SELECT 1 ${(1 to 9).map(k =>
             s"+ (CASE WHEN t$k < CAST(score AS DOUBLE) THEN 1 ELSE 0 " +
               "END)").mkString(" ")} AS bin,
        |    score, (uniq_tokens * 2 >= n_tokens) AS ref
        |  FROM pd, th)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN ref THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_ref_pos,
        |  (CAST(sum(CASE WHEN ref THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000) // count(*) AS ref_ppm,
        |  CAST(sum(score) AS BIGINT) AS sum_score
        |FROM b GROUP BY bin""".stripMargin,

    // same bit-length octave; NULL // NULL stays NULL on the last row
    "q213_zipf_octaves" ->
      """WITH wc AS (SELECT unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |c AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM wc
        |  GROUP BY w),
        |o AS (SELECT CAST(length(bin(c)) - 1 AS BIGINT) AS octave, c
        |  FROM c),
        |agg AS (SELECT octave, CAST(count(*) AS BIGINT) AS n_types,
        |    CAST(sum(c) AS BIGINT) AS occ
        |  FROM o GROUP BY octave)
        |SELECT octave, n_types, occ,
        |  (n_types * 1000) // lead(n_types) OVER (ORDER BY octave)
        |    AS ratio_x1000
        |FROM agg""".stripMargin,

    "q214_length_trend" ->
      """WITH t AS (SELECT source, CAST(doc_id AS HUGEINT) AS x,
        |    CAST(len(string_split(text, ' ')) AS HUGEINT) AS y
        |  FROM documents),
        |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx,
        |    CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(x * y) AS HUGEINT) AS sxy,
        |    CAST(sum(x * x) AS HUGEINT) AS sxx
        |  FROM t GROUP BY source)
        |SELECT source, n,
        |  CAST(n * sxy - sx * sy AS DOUBLE) AS slope_num,
        |  CAST(n * sxx - sx * sx AS DOUBLE) AS slope_den,
        |  (n * sxy - sx * sy) > 0 AS rising
        |FROM g""".stripMargin,

    "q216_quality_ensemble" -> {
      def ths(sig: String) = (1 to 9).map(k =>
        s"percentile_disc(0.$k) WITHIN GROUP " +
          s"(ORDER BY CAST($sig AS DOUBLE)) AS ${sig}_t$k")
        .mkString(", ")
      def bin(sig: String) = "1 " + (1 to 9).map(k =>
        s"+ (CASE WHEN ${sig}_t$k < CAST($sig AS DOUBLE) THEN 1 " +
          "ELSE 0 END)").mkString(" ")
      s"""WITH t AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS tok FROM documents),
        |fb AS (SELECT doc_id, tok,
        |    ${SamplingQueries.hashBucketSql("tok", 1, 1024)} AS b
        |  FROM t),
        |fw AS (SELECT doc_id, tok,
        |    (${SamplingQueries.hashBucketSql("b", 9, 2001)}) - 1000 AS w
        |  FROM fb),
        |pd AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS s1,
        |    CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(count(DISTINCT tok) AS BIGINT) AS uniq
        |  FROM fw GROUP BY doc_id),
        |sg AS (SELECT doc_id, s1, (uniq * 1000) // n_tokens AS s2,
        |    n_tokens AS s3 FROM pd),
        |th AS (SELECT ${ths("s1")}, ${ths("s2")}, ${ths("s3")}
        |  FROM sg),
        |b AS (SELECT doc_id, ${bin("s1")} AS d_s1, ${bin("s2")} AS d_s2,
        |    ${bin("s3")} AS d_s3
        |  FROM sg, th)
        |SELECT doc_id, d_s1, d_s2, d_s3,
        |  d_s1 + d_s2 + d_s3 AS ensemble,
        |  d_s1 + d_s2 + d_s3 >= 18 AS keep
        |FROM b""".stripMargin
    },

    "q217_gate_kappa" ->
      s"""WITH t AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS tok FROM documents),
        |fb AS (SELECT doc_id, tok,
        |    ${SamplingQueries.hashBucketSql("tok", 1, 1024)} AS b
        |  FROM t),
        |fw AS (SELECT doc_id, tok,
        |    (${SamplingQueries.hashBucketSql("b", 9, 2001)}) - 1000 AS w
        |  FROM fb),
        |pd AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS score,
        |    CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(count(DISTINCT tok) AS BIGINT) AS uniq
        |  FROM fw GROUP BY doc_id),
        |g AS (SELECT (score >= 0) AS g1,
        |    (uniq * 2 >= n_tokens) AS g2 FROM pd),
        |cm AS (SELECT
        |    CAST(sum(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS a,
        |    CAST(sum(CASE WHEN g1 AND NOT g2 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN NOT g1 AND g2 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN NOT g1 AND NOT g2 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d
        |  FROM g),
        |k AS (SELECT a, b, c, d,
        |    (a + b) * (a + c) + (c + d) * (b + d) AS pe_num,
        |    a + b + c + d AS nn
        |  FROM cm)
        |SELECT a, b, c, d,
        |  (a + d) * nn - pe_num AS kappa_num,
        |  nn * nn - pe_num AS kappa_den,
        |  ((a + d) * nn - pe_num) * 10 > (nn * nn - pe_num) * 4
        |    AS substantial
        |FROM k""".stripMargin,

    "q226_token_weighted_median" ->
      """WITH t AS (SELECT source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        |  FROM documents),
        |h AS (SELECT source, toks, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(toks * count(*) AS BIGINT) AS mass
        |  FROM t GROUP BY source, toks),
        |c AS (SELECT source, toks, mass,
        |    CAST(sum(mass) OVER (PARTITION BY source ORDER BY toks
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_m
        |  FROM h),
        |g AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_docs,
        |    CAST(sum(mass) AS BIGINT) AS total_m
        |  FROM h GROUP BY source)
        |SELECT c.source AS source, max(g.n_docs) AS n_docs,
        |  max(g.total_m) AS total_tokens,
        |  min(CASE WHEN c.cum_m * 2 >= g.total_m THEN c.toks END)
        |    AS wmedian_len
        |FROM c JOIN g ON c.source = g.source
        |GROUP BY c.source""".stripMargin,

    "q218_k_anonymity" ->
      """WITH c AS (SELECT lang, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) // 50
        |      AS len_bucket,
        |    CAST(count(*) AS BIGINT) AS m
        |  FROM documents GROUP BY 1, 2, 3)
        |SELECT CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(sum(m) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN m < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_small_classes,
        |  CAST(sum(CASE WHEN m < 5 THEN m ELSE 0 END) AS BIGINT)
        |    AS n_docs_at_risk,
        |  (CAST(sum(CASE WHEN m < 5 THEN m ELSE 0 END) AS BIGINT)
        |    * 1000000) // CAST(sum(m) AS BIGINT) AS risk_ppm
        |FROM c""".stripMargin,

    "q219_cooccurrence" ->
      """WITH wds AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS w FROM documents),
        |dw AS (SELECT DISTINCT doc_id, w FROM wds),
        |vocab AS (SELECT w FROM (SELECT w, count(*) AS df FROM dw
        |    GROUP BY w) ORDER BY df DESC, w ASC LIMIT 20),
        |g AS (SELECT dw.doc_id, dw.w FROM dw JOIN vocab USING (w))
        |SELECT a.w AS w_a, b.w AS w_b,
        |  CAST(count(*) AS BIGINT) AS support
        |FROM g a JOIN g b ON a.doc_id = b.doc_id AND a.w < b.w
        |GROUP BY a.w, b.w
        |ORDER BY support DESC, w_a ASC, w_b ASC
        |LIMIT 20""".stripMargin,

    "q237_l_diversity" ->
      """WITH c AS (SELECT lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) // 50
        |      AS len_bucket,
        |    CAST(count(DISTINCT source) AS BIGINT) AS l,
        |    CAST(count(*) AS BIGINT) AS m
        |  FROM documents GROUP BY 1, 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(sum(m) AS BIGINT) AS n_docs,
        |  CAST(min(l) AS BIGINT) AS min_l,
        |  CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_low_classes,
        |  CAST(sum(CASE WHEN l < 3 THEN m ELSE 0 END) AS BIGINT)
        |    AS n_docs_exposed,
        |  (CAST(sum(CASE WHEN l < 3 THEN m ELSE 0 END) AS BIGINT)
        |    * 1000000) // CAST(sum(m) AS BIGINT) AS exposed_ppm
        |FROM c""".stripMargin,

    "q239_t_closeness" ->
      """WITH cells AS (SELECT lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) // 50
        |      AS len_bucket,
        |    source, CAST(count(*) AS BIGINT) AS m_cs
        |  FROM documents GROUP BY 1, 2, 3),
        |ct AS (SELECT lang, len_bucket, CAST(sum(m_cs) AS BIGINT) AS m_c
        |  FROM cells GROUP BY 1, 2),
        |gt AS (SELECT source, CAST(sum(m_cs) AS BIGINT) AS g_s
        |  FROM cells GROUP BY 1),
        |n AS (SELECT CAST(sum(g_s) AS BIGINT) AS n_total FROM gt),
        |per AS (SELECT c.lang, c.len_bucket, ct.m_c, n.n_total,
        |    sum(abs(CAST(c.m_cs AS HUGEINT) * n.n_total
        |      - CAST(gt.g_s AS HUGEINT) * ct.m_c)) AS a_present,
        |    CAST(sum(gt.g_s) AS BIGINT) AS b_present
        |  FROM cells c
        |  JOIN gt USING (source)
        |  JOIN ct ON c.lang = ct.lang AND c.len_bucket = ct.len_bucket, n
        |  GROUP BY 1, 2, 3, 4),
        |tv AS (SELECT m_c,
        |    ((a_present + CAST(n_total - b_present AS HUGEINT) * m_c)
        |      * 500000) // (CAST(m_c AS HUGEINT) * n_total) AS tvd_ppm
        |  FROM per)
        |SELECT CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(max(tvd_ppm) AS BIGINT) AS max_tvd_ppm,
        |  CAST(sum(CASE WHEN tvd_ppm > 200000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_breaching,
        |  CAST(sum(CASE WHEN tvd_ppm > 200000 THEN m_c ELSE 0 END)
        |    AS BIGINT) AS n_docs_exposed,
        |  (CAST(sum(CASE WHEN tvd_ppm > 200000 THEN m_c ELSE 0 END)
        |      AS BIGINT) * 1000000)
        |    // CAST(sum(m_c) AS BIGINT) AS exposed_ppm
        |FROM tv""".stripMargin,

    "q240_spearman_signals" ->
      s"""WITH $signalsSqlCte,
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pd),
        |hs AS (SELECT score, CAST(count(*) AS BIGINT) AS c
        |  FROM pd GROUP BY 1),
        |rs AS (SELECT score,
        |    (CAST(sum(c) OVER (ORDER BY score) AS BIGINT) - c) * 2
        |      + c + 1 AS r2s
        |  FROM hs),
        |ht AS (SELECT n_tokens, CAST(count(*) AS BIGINT) AS c
        |  FROM pd GROUP BY 1),
        |rt AS (SELECT n_tokens,
        |    (CAST(sum(c) OVER (ORDER BY n_tokens) AS BIGINT) - c) * 2
        |      + c + 1 AS r2t
        |  FROM ht),
        |dev AS (SELECT CAST(rs.r2s - (nn.n + 1) AS HUGEINT) AS dx,
        |    CAST(rt.r2t - (nn.n + 1) AS HUGEINT) AS dy, nn.n
        |  FROM pd
        |  JOIN rs ON pd.score = rs.score
        |  JOIN rt ON pd.n_tokens = rt.n_tokens, nn)
        |SELECT max(n) AS n,
        |  CASE WHEN max(n) > $SpearmanEnvelopeN THEN
        |    CAST(error('q240: N beyond BIGINT-exact rank envelope')
        |      AS BIGINT)
        |  ELSE CAST(sum(dx * dy) AS BIGINT) END AS num,
        |  CAST(sum(dx * dx) AS BIGINT) AS denx,
        |  CAST(sum(dy * dy) AS BIGINT) AS deny,
        |  sum(dx * dy) > 0 AS positive,
        |  4 * sum(dx * dy) * sum(dx * dy)
        |    > sum(dx * dx) * sum(dy * dy) AS correlated
        |FROM dev""".stripMargin,

    "q241_score_auc" ->
      s"""WITH $signalsSqlCte,
        |g AS (SELECT score, (uniq * 2 >= n_tokens) AS pos FROM pd),
        |h AS (SELECT score,
        |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS cb
        |  FROM g GROUP BY 1),
        |c AS (SELECT ca, cb,
        |    CAST(sum(cb) OVER (ORDER BY score) AS BIGINT) AS cum_b
        |  FROM h),
        |u AS (SELECT CAST(sum(ca) AS BIGINT) AS n_pos,
        |    CAST(sum(cb) AS BIGINT) AS n_neg,
        |    CAST(sum(ca * (cum_b - cb) * 2 + ca * cb) AS BIGINT) AS u2
        |  FROM c)
        |SELECT n_pos, n_neg, u2,
        |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        |    CAST((CAST(u2 AS HUGEINT) * 1000000)
        |      // (CAST(n_pos AS HUGEINT) * n_neg * 2) AS BIGINT)
        |  END AS auc_ppm,
        |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        |    CAST(u2 AS HUGEINT) * 10
        |      > CAST(n_pos AS HUGEINT) * n_neg * 14
        |  END AS discriminative
        |FROM u""".stripMargin,

    "q257_simpson_audit" ->
      s"""WITH $signalsSqlCte,
        |sd AS (SELECT pd.doc_id, pd.n_tokens, pd.uniq, d.source
        |  FROM pd JOIN documents d USING (doc_id)),
        |cell AS (SELECT source, n_tokens // 50 AS len_bucket,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN uniq * 2 >= n_tokens THEN 1 ELSE 0 END)
        |      AS BIGINT) AS p
        |  FROM sd GROUP BY 1, 2),
        |pooled AS (SELECT source, CAST(sum(n) AS HUGEINT) AS np,
        |    CAST(sum(p) AS HUGEINT) AS pp
        |  FROM cell GROUP BY 1),
        |pr AS (SELECT a.source AS src_a, b.source AS src_b,
        |    a.pp * b.np > b.pp * a.np AS pooled_a_gt_b,
        |    b.pp * a.np > a.pp * b.np AS pooled_b_gt_a
        |  FROM pooled a JOIN pooled b ON a.source < b.source),
        |st AS (SELECT x.source AS src_a, y.source AS src_b,
        |    CAST(count(*) AS BIGINT) AS n_strata_both,
        |    CAST(sum(CASE WHEN CAST(x.p AS HUGEINT) * y.n
        |        > CAST(y.p AS HUGEINT) * x.n THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_strata_a_gt_b,
        |    CAST(sum(CASE WHEN CAST(y.p AS HUGEINT) * x.n
        |        > CAST(x.p AS HUGEINT) * y.n THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_strata_b_gt_a
        |  FROM cell x JOIN cell y
        |    ON x.len_bucket = y.len_bucket AND x.source < y.source
        |  GROUP BY 1, 2),
        |j AS (SELECT pr.src_a, pr.src_b, pr.pooled_a_gt_b,
        |    pr.pooled_b_gt_a,
        |    coalesce(st.n_strata_both, 0) AS n_strata_both,
        |    coalesce(st.n_strata_a_gt_b, 0) AS n_strata_a_gt_b,
        |    coalesce(st.n_strata_b_gt_a, 0) AS n_strata_b_gt_a
        |  FROM pr LEFT JOIN st
        |    ON pr.src_a = st.src_a AND pr.src_b = st.src_b)
        |SELECT src_a, src_b, pooled_a_gt_b, pooled_b_gt_a,
        |  n_strata_both, n_strata_a_gt_b, n_strata_b_gt_a,
        |  (pooled_a_gt_b AND n_strata_both > 0
        |    AND n_strata_b_gt_a = n_strata_both)
        |  OR (pooled_b_gt_a AND n_strata_both > 0
        |    AND n_strata_a_gt_b = n_strata_both) AS simpson_flip
        |FROM j""".stripMargin,

    "q258_ks_drift" ->
      s"""WITH h AS (SELECT source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |g AS (SELECT sx.source, ax.toks, coalesce(h.cnt, 0) AS cnt
        |  FROM (SELECT DISTINCT source FROM h) sx
        |  CROSS JOIN (SELECT DISTINCT toks FROM h) ax
        |  LEFT JOIN h ON h.source = sx.source AND h.toks = ax.toks),
        |c AS (SELECT source, toks,
        |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY toks)
        |      AS BIGINT) AS cum
        |  FROM g),
        |ca AS (SELECT toks,
        |    CAST(sum(c_all) OVER (ORDER BY toks) AS BIGINT) AS cum_all
        |  FROM (SELECT toks, sum(cnt) AS c_all FROM h GROUP BY 1)),
        |t AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_s
        |  FROM h GROUP BY 1),
        |nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_all FROM h),
        |diffs AS (SELECT c.source, t.n_s, nn.n_all,
        |    abs(CAST(c.cum AS HUGEINT) * (nn.n_all - t.n_s)
        |      - CAST(ca.cum_all - c.cum AS HUGEINT) * t.n_s) AS diff
        |  FROM c
        |  JOIN ca USING (toks)
        |  JOIN t ON c.source = t.source, nn
        |  WHERE t.n_s < nn.n_all),
        |m AS (SELECT source, max(n_s) AS n_docs, max(n_all) AS nall,
        |    max(diff) AS dnum
        |  FROM diffs GROUP BY 1)
        |SELECT source, n_docs,
        |  CAST((dnum * 1000000)
        |    // (CAST(n_docs AS HUGEINT) * (nall - n_docs)) AS BIGINT)
        |    AS d_ppm,
        |  CASE WHEN nall > $KsEnvelopeN THEN
        |    CAST(error('q258: N beyond the exact KS envelope')
        |      AS BOOLEAN)
        |  ELSE dnum * dnum * 10000
        |    > CAST(18496 AS HUGEINT) * nall * n_docs * (nall - n_docs)
        |  END AS drifted
        |FROM m""".stripMargin,

    "q260_mad_outliers" ->
      """WITH h AS (SELECT source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |g AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_docs
        |  FROM h GROUP BY 1),
        |c AS (SELECT source, toks, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY toks
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM h),
        |med AS (SELECT c.source,
        |    min(CASE WHEN c.cum * 2 >= g.n_docs THEN c.toks END)
        |      AS median_len
        |  FROM c JOIN g ON c.source = g.source GROUP BY c.source),
        |dh AS (SELECT h.source, abs(h.toks - med.median_len) AS dev,
        |    CAST(sum(h.cnt) AS BIGINT) AS cnt
        |  FROM h JOIN med ON h.source = med.source GROUP BY 1, 2),
        |cd AS (SELECT source, dev, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY dev
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cumd
        |  FROM dh),
        |mad AS (SELECT cd.source,
        |    min(CASE WHEN cd.cumd * 2 >= g.n_docs THEN cd.dev END)
        |      AS mad
        |  FROM cd JOIN g ON cd.source = g.source GROUP BY cd.source),
        |o AS (SELECT h.source, CAST(sum(h.cnt) AS BIGINT) AS n_out
        |  FROM h
        |  JOIN med ON h.source = med.source
        |  JOIN mad ON h.source = mad.source
        |  WHERE abs(h.toks - med.median_len) > mad.mad * 3
        |  GROUP BY h.source)
        |SELECT g.source AS source, g.n_docs,
        |  med.median_len, mad.mad,
        |  CAST(coalesce(o.n_out, 0) AS BIGINT) AS n_outliers,
        |  (CAST(coalesce(o.n_out, 0) AS BIGINT) * 1000000) // g.n_docs
        |    AS outlier_ppm
        |FROM g
        |JOIN med ON g.source = med.source
        |JOIN mad ON g.source = mad.source
        |LEFT JOIN o ON g.source = o.source""".stripMargin,

    "q263_bootstrap_keep_rate" ->
      s"""WITH $signalsSqlCte,
        |sig AS (SELECT doc_id, score,
        |    md5(concat(CAST(doc_id AS VARCHAR), ':boot')) AS h
        |  FROM pd),
        |reps AS (SELECT b,
        |    CAST(count(*) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN score >= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS k_b
        |  FROM sig, generate_series(0, 15) g(b)
        |  WHERE substr(h, CAST(b AS INT) + 1, 1)
        |    IN ('8','9','a','b','c','d','e','f')
        |  GROUP BY b),
        |rp AS (SELECT (k_b * 1000000) // n_b AS ppm FROM reps),
        |fold AS (SELECT CAST(count(*) AS BIGINT) AS n_reps,
        |    CAST(sum(ppm) // count(*) AS BIGINT) AS mean_rep_ppm,
        |    CAST(min(ppm) AS BIGINT) AS min_rep_ppm,
        |    CAST(max(ppm) AS BIGINT) AS max_rep_ppm,
        |    CAST(max(ppm) - min(ppm) AS BIGINT) AS spread_ppm
        |  FROM rp),
        |f AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST((sum(CASE WHEN score >= 0 THEN 1 ELSE 0 END) * 1000000)
        |      // count(*) AS BIGINT) AS full_keep_ppm
        |  FROM sig)
        |SELECT f.n_docs, f.full_keep_ppm, fold.n_reps,
        |  fold.mean_rep_ppm, fold.min_rep_ppm, fold.max_rep_ppm,
        |  fold.spread_ppm
        |FROM f, fold""".stripMargin,

    "q267_pareto_skyline" ->
      s"""WITH $signalsSqlCte
        |SELECT a.doc_id, a.score, a.n_tokens
        |FROM pd a
        |WHERE NOT EXISTS (SELECT 1 FROM pd b
        |  WHERE b.score >= a.score AND b.n_tokens >= a.n_tokens
        |    AND (b.score > a.score OR b.n_tokens > a.n_tokens))""".stripMargin,

    "q268_greedy_coverage" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS tk
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |    concat_ws(' ', tk[p], tk[p+1], tk[p+2]) AS sh
        |  FROM (SELECT doc_id, tk,
        |      unnest(generate_series(1, greatest(len(tk)-2, 1))) AS p
        |    FROM w)),
        |t AS (SELECT DISTINCT doc_id, ${wkeySql("sh")} AS tk FROM sh),
        |tot AS (SELECT CAST(count(DISTINCT tk) AS BIGINT) AS n_total
        |  FROM t),
        |r1 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS gain FROM t
        |  GROUP BY doc_id ORDER BY gain DESC, doc_id ASC LIMIT 1),
        |c1 AS (SELECT DISTINCT t.tk FROM t JOIN r1 USING (doc_id)),
        |r2 AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS gain
        |  FROM t LEFT JOIN c1 ON t.tk = c1.tk
        |  WHERE c1.tk IS NULL
        |    AND t.doc_id NOT IN (SELECT doc_id FROM r1)
        |  GROUP BY t.doc_id ORDER BY gain DESC, t.doc_id ASC LIMIT 1),
        |c2 AS (SELECT DISTINCT t.tk FROM t
        |  WHERE doc_id IN (SELECT doc_id FROM r1
        |    UNION ALL SELECT doc_id FROM r2)),
        |r3 AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS gain
        |  FROM t LEFT JOIN c2 ON t.tk = c2.tk
        |  WHERE c2.tk IS NULL
        |    AND t.doc_id NOT IN (SELECT doc_id FROM r1
        |      UNION ALL SELECT doc_id FROM r2)
        |  GROUP BY t.doc_id ORDER BY gain DESC, t.doc_id ASC LIMIT 1),
        |sel AS (SELECT CAST(1 AS BIGINT) AS round, doc_id, gain FROM r1
        |  UNION ALL SELECT 2, doc_id, gain FROM r2
        |  UNION ALL SELECT 3, doc_id, gain FROM r3)
        |SELECT a.round, a.doc_id, a.gain,
        |  CAST(sum(b.gain) AS BIGINT) AS covered_cum,
        |  CAST((sum(b.gain) * 1000000) // tot.n_total AS BIGINT)
        |    AS coverage_ppm
        |FROM sel a JOIN sel b ON b.round <= a.round, tot
        |GROUP BY a.round, a.doc_id, a.gain, tot.n_total""".stripMargin,

    "q269_joint_decile_census" ->
      s"""WITH $signalsSqlCte,
        |th AS (SELECT ${(1 to 9).map(k =>
             s"percentile_disc(0.$k) WITHIN GROUP " +
               s"(ORDER BY CAST(score AS DOUBLE)) AS s$k").mkString(",\n  ")},
        |  ${(1 to 9).map(k =>
             s"percentile_disc(0.$k) WITHIN GROUP " +
               s"(ORDER BY CAST(n_tokens AS DOUBLE)) AS l$k")
             .mkString(",\n  ")}
        |  FROM pd),
        |b AS (SELECT
        |    CAST(1 ${(1 to 9).map(k =>
             s"+ (CASE WHEN s$k < CAST(score AS DOUBLE) THEN 1 ELSE 0 " +
               "END)").mkString(" ")} AS BIGINT) AS score_dec,
        |    CAST(1 ${(1 to 9).map(k =>
             s"+ (CASE WHEN l$k < CAST(n_tokens AS DOUBLE) THEN 1 ELSE 0 " +
               "END)").mkString(" ")} AS BIGINT) AS len_dec
        |  FROM pd, th),
        |cells AS (SELECT score_dec, len_dec,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM b GROUP BY 1, 2),
        |rt AS (SELECT score_dec, CAST(sum(n) AS BIGINT) AS row_n
        |  FROM cells GROUP BY 1),
        |ct AS (SELECT len_dec, CAST(sum(n) AS BIGINT) AS col_n
        |  FROM cells GROUP BY 1),
        |tt AS (SELECT CAST(sum(n) AS BIGINT) AS n_all FROM cells)
        |SELECT c.score_dec, c.len_dec, c.n, rt.row_n, ct.col_n,
        |  CAST((CAST(c.n AS HUGEINT) * tt.n_all * 1000000)
        |    // (CAST(rt.row_n AS HUGEINT) * ct.col_n) AS BIGINT)
        |    AS assoc_ppm,
        |  CAST(c.n AS HUGEINT) * tt.n_all
        |    > CAST(rt.row_n AS HUGEINT) * ct.col_n AS over_represented
        |FROM cells c
        |JOIN rt ON c.score_dec = rt.score_dec
        |JOIN ct ON c.len_dec = ct.len_dec, tt""".stripMargin,

    // the oracle replays the DIRECT full-corpus dominance definition:
    // hash equality with the incremental two-stage plan PROVES
    // skyline(skyline(rest) ∪ batch) = skyline(corpus) on every run
    "q271_skyline_maintenance" ->
      s"""WITH $signalsSqlCte
        |SELECT a.doc_id, a.score, a.n_tokens,
        |  (a.doc_id % 10 = 7) AS entered_from_batch
        |FROM pd a
        |WHERE NOT EXISTS (SELECT 1 FROM pd b
        |  WHERE b.score >= a.score AND b.n_tokens >= a.n_tokens
        |    AND (b.score > a.score OR b.n_tokens > a.n_tokens))""".stripMargin,

    "q272_top_token_movers" ->
      """WITH tk AS (SELECT (doc_id % 2 = 0) AS is_ref,
        |    unnest(string_split(text, ' ')) AS tok FROM documents),
        |cnt AS (SELECT is_ref, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM tk GROUP BY 1, 2),
        |ref AS (SELECT tok, c AS ref_cnt,
        |    CAST(row_number() OVER (ORDER BY c DESC, tok ASC)
        |      AS BIGINT) AS ref_rank
        |  FROM cnt WHERE is_ref ORDER BY c DESC, tok ASC LIMIT 20),
        |cur AS (SELECT tok, c AS cur_cnt,
        |    CAST(row_number() OVER (ORDER BY c DESC, tok ASC)
        |      AS BIGINT) AS cur_rank
        |  FROM cnt WHERE NOT is_ref ORDER BY c DESC, tok ASC LIMIT 20)
        |SELECT coalesce(ref.tok, cur.tok) AS tok,
        |  ref_rank, ref_cnt, cur_rank, cur_cnt,
        |  ref_rank - cur_rank AS rank_shift
        |FROM ref FULL OUTER JOIN cur ON ref.tok = cur.tok""".stripMargin,

    "q277_curation_e2e" ->
      s"""WITH pairs AS (${TextQueries.minhashPairsSql}),
        |canon AS (SELECT doc_id, source, md5(text) AS h,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        |  FROM documents
        |  WHERE doc_id NOT IN (SELECT doc_b FROM pairs)),
        |hs AS (SELECT source, toks, CAST(count(*) AS BIGINT) AS cnt
        |  FROM canon GROUP BY 1, 2),
        |g AS (SELECT source, CAST(sum(cnt) AS BIGINT)
        |    AS docs_canonical
        |  FROM hs GROUP BY 1),
        |c AS (SELECT source, toks,
        |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY toks
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM hs),
        |med AS (SELECT c.source,
        |    min(CASE WHEN c.cum * 2 >= g.docs_canonical
        |      THEN c.toks END) AS median_len
        |  FROM c JOIN g ON c.source = g.source GROUP BY c.source),
        |dh AS (SELECT hs.source,
        |    abs(hs.toks - med.median_len) AS dev,
        |    CAST(sum(hs.cnt) AS BIGINT) AS cnt
        |  FROM hs JOIN med ON hs.source = med.source GROUP BY 1, 2),
        |cd AS (SELECT source, dev,
        |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY dev
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cumd
        |  FROM dh),
        |mad AS (SELECT cd.source,
        |    min(CASE WHEN cd.cumd * 2 >= g.docs_canonical
        |      THEN cd.dev END) AS mad
        |  FROM cd JOIN g ON cd.source = g.source GROUP BY cd.source),
        |kept AS (SELECT canon.doc_id, canon.source, canon.h,
        |    canon.toks
        |  FROM canon
        |  JOIN med ON canon.source = med.source
        |  JOIN mad ON canon.source = mad.source
        |  WHERE abs(canon.toks - med.median_len) <= mad.mad * 3),
        |grp AS (SELECT md5(text) AS h,
        |    CAST(count(*) AS BIGINT) AS dup_count
        |  FROM documents GROUP BY 1),
        |per AS (SELECT source, CAST(count(*) AS BIGINT) AS docs_kept,
        |    CAST(sum(toks) AS BIGINT) AS tokens_kept,
        |    CAST(sum(CAST(toks * (1000000 // dup_count) AS HUGEINT))
        |      AS HUGEINT) AS wt_mass
        |  FROM kept JOIN grp USING (h) GROUP BY 1),
        |ctot AS (SELECT CAST(sum(tokens_kept) AS HUGEINT) AS tot_raw,
        |    CAST(sum(wt_mass) AS HUGEINT) AS tot_wt
        |  FROM per),
        |pk AS (SELECT source,
        |    CAST(max((cum - 1) // 2048) + 1 AS BIGINT) AS n_bins
        |  FROM (SELECT source,
        |      CAST(sum(toks) OVER (PARTITION BY source ORDER BY doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        AS BIGINT) AS cum
        |    FROM kept)
        |  GROUP BY 1),
        |raw AS (SELECT source, CAST(count(*) AS BIGINT) AS docs_raw
        |  FROM documents GROUP BY 1)
        |SELECT raw.source AS source, raw.docs_raw, g.docs_canonical,
        |  per.docs_kept, med.median_len, mad.mad, per.tokens_kept,
        |  CAST((CAST(per.tokens_kept AS HUGEINT) * 1000000)
        |    // ctot.tot_raw AS BIGINT) AS raw_ppm,
        |  CAST((CASE WHEN per.wt_mass IS NULL
        |      OR per.wt_mass > $CurationWtEnvelope THEN
        |    CAST(error('q277: wt_mass beyond DECIMAL(38,0) ppm ' ||
        |      'envelope') AS HUGEINT)
        |    ELSE per.wt_mass END * 1000000) // ctot.tot_wt AS BIGINT)
        |    AS eff_ppm,
        |  pk.n_bins
        |FROM raw
        |JOIN g ON raw.source = g.source
        |JOIN med ON raw.source = med.source
        |JOIN mad ON raw.source = mad.source
        |JOIN per ON raw.source = per.source
        |JOIN pk ON raw.source = pk.source, ctot""".stripMargin,

    // from-scratch replay of the full-corpus curation stats (the
    // Spark side folds stored old-state + batch deltas; hash parity
    // proves the incremental identity) plus the definitional
    // demotion/addition audit columns
    "q278_incremental_curation" ->
      s"""WITH pairs AS (${TextQueries.minhashPairsSql}),
        |canon AS (SELECT doc_id, source, md5(text) AS h,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        |  FROM documents
        |  WHERE doc_id NOT IN (SELECT doc_b FROM pairs)),
        |hs AS (SELECT source, toks, CAST(count(*) AS BIGINT) AS cnt
        |  FROM canon GROUP BY 1, 2),
        |g AS (SELECT source, CAST(sum(cnt) AS BIGINT)
        |    AS docs_canonical
        |  FROM hs GROUP BY 1),
        |c AS (SELECT source, toks,
        |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY toks
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM hs),
        |med AS (SELECT c.source,
        |    min(CASE WHEN c.cum * 2 >= g.docs_canonical
        |      THEN c.toks END) AS median_len
        |  FROM c JOIN g ON c.source = g.source GROUP BY c.source),
        |dh AS (SELECT hs.source,
        |    abs(hs.toks - med.median_len) AS dev,
        |    CAST(sum(hs.cnt) AS BIGINT) AS cnt
        |  FROM hs JOIN med ON hs.source = med.source GROUP BY 1, 2),
        |cd AS (SELECT source, dev,
        |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY dev
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cumd
        |  FROM dh),
        |mad AS (SELECT cd.source,
        |    min(CASE WHEN cd.cumd * 2 >= g.docs_canonical
        |      THEN cd.dev END) AS mad
        |  FROM cd JOIN g ON cd.source = g.source GROUP BY cd.source),
        |kept AS (SELECT canon.doc_id, canon.source, canon.h,
        |    canon.toks
        |  FROM canon
        |  JOIN med ON canon.source = med.source
        |  JOIN mad ON canon.source = mad.source
        |  WHERE abs(canon.toks - med.median_len) <= mad.mad * 3),
        |grp AS (SELECT md5(text) AS h,
        |    CAST(count(*) AS BIGINT) AS dup_count
        |  FROM documents GROUP BY 1),
        |per AS (SELECT source, CAST(count(*) AS BIGINT) AS docs_kept,
        |    CAST(sum(toks) AS BIGINT) AS tokens_kept,
        |    CAST(sum(CAST(toks * (1000000 // dup_count) AS HUGEINT))
        |      AS HUGEINT) AS wt_mass
        |  FROM kept JOIN grp USING (h) GROUP BY 1),
        |ctot AS (SELECT CAST(sum(tokens_kept) AS HUGEINT) AS tot_raw,
        |    CAST(sum(wt_mass) AS HUGEINT) AS tot_wt
        |  FROM per),
        |oldcanon AS (SELECT doc_id, source FROM documents
        |  WHERE doc_id % 10 <> 7 AND doc_id NOT IN
        |    (SELECT doc_b FROM pairs WHERE doc_a % 10 <> 7)),
        |dem AS (SELECT source, CAST(count(*) AS BIGINT)
        |    AS docs_demoted
        |  FROM oldcanon
        |  WHERE doc_id IN (SELECT doc_b FROM pairs
        |    WHERE doc_a % 10 = 7)
        |  GROUP BY 1),
        |addx AS (SELECT source, CAST(count(*) AS BIGINT)
        |    AS docs_added
        |  FROM documents
        |  WHERE doc_id % 10 = 7 AND doc_id NOT IN
        |    (SELECT doc_b FROM pairs)
        |  GROUP BY 1)
        |SELECT g.source AS source, g.docs_canonical, per.docs_kept,
        |  med.median_len, mad.mad, per.tokens_kept,
        |  CAST((CAST(per.tokens_kept AS HUGEINT) * 1000000)
        |    // ctot.tot_raw AS BIGINT) AS raw_ppm,
        |  CAST((CASE WHEN per.wt_mass IS NULL
        |      OR per.wt_mass > $CurationWtEnvelope THEN
        |    CAST(error('q278: wt_mass beyond DECIMAL(38,0) ppm ' ||
        |      'envelope') AS HUGEINT)
        |    ELSE per.wt_mass END * 1000000) // ctot.tot_wt AS BIGINT)
        |    AS eff_ppm,
        |  CAST(COALESCE(dem.docs_demoted, 0) AS BIGINT)
        |    AS docs_demoted,
        |  CAST(COALESCE(addx.docs_added, 0) AS BIGINT) AS docs_added
        |FROM g
        |JOIN med ON g.source = med.source
        |JOIN mad ON g.source = mad.source
        |JOIN per ON g.source = per.source
        |LEFT JOIN dem ON g.source = dem.source
        |LEFT JOIN addx ON g.source = addx.source, ctot""".stripMargin
  )

  /** q240/q241 shared oracle CTE: the per-doc quality signals exactly
    * as `qualitySignals` computes them (hashed-feature score, token
    * count, distinct-token count) — same body q217's oracle inlines.
    */
  private def signalsSqlCte: String =
    s"""t AS (SELECT doc_id,
      |    unnest(string_split(text, ' ')) AS tok FROM documents),
      |fb AS (SELECT doc_id, tok,
      |    ${SamplingQueries.hashBucketSql("tok", 1, 1024)} AS b
      |  FROM t),
      |fw AS (SELECT doc_id, tok,
      |    (${SamplingQueries.hashBucketSql("b", 9, 2001)}) - 1000 AS w
      |  FROM fb),
      |pd AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS score,
      |    CAST(count(*) AS BIGINT) AS n_tokens,
      |    CAST(count(DISTINCT tok) AS BIGINT) AS uniq
      |  FROM fw GROUP BY doc_id)""".stripMargin
}
