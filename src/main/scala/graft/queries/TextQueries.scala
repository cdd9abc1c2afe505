package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Text
import graft.operators.{Curation, Dedup}

/** LLM-training-data text operators over the `documents` table: exact and
  * near dedup, fingerprinting, token statistics, language-ID and quality
  * heuristics. Each query has a value-identical DuckDB oracle (md5-based
  * hashing, lexicographic minima, single-division ratios).
  */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")
  private val stopwordsSql = stopwords.map(w => s"'$w'").mkString(", ")

  /** The full-corpus LSH candidate-pair frame — the near-dup INDEX that
    * q21 (pairs), q38 (canonical corpus), q62 (dup clusters), q95
    * (pipeline stage 1) and q111 (canonical-by-length) all consume. At
    * 100 TB this is one shared, persisted artifact (shingle → minhash →
    * band → bucket join runs once), not a per-consumer rebuild; per-run
    * memoization mirrors that. Deterministic (md5 minima, pinned 16/4×4
    * config), so sharing cannot move an oracle hash.
    *
    * DEFAULT PATH IS DEDUP-STAGED (round 7, extending the q190/q186
    * discipline to the whole q21 family at its source): exact-duplicate
    * families collapse (Curation.canonicalInput) BEFORE shingling, the
    * LSH index builds at canonical grain, and the pair set expands back
    * to raw-doc grain. LOSSLESS by construction — a minhash signature
    * is a pure function of the text, so family members share every band
    * key: the raw pair set is EXACTLY expand(canonical pairs) ∪
    * within-family pairs (StagedLshSpec asserts set equality; every
    * consumer's oracle replays the raw corpus and stays green). At
    * clone density this removes the quadratic band-bucket join the 10×
    * smoke measured across q170/q62/q185; the raw build stays behind
    * spark.graft.text.rawLsh=true (cache-keyed separately so a flagged
    * session never sees a staged frame). */
  private[queries] def sharedCandidatePairs(s: SparkSession,
                                            d: String): DataFrame = {
    val raw = s.conf.getOption("spark.graft.text.rawLsh")
      .exists(_.toBoolean)
    if (raw)
      Shared.frame(s, "lsh_pairs_raw", d)(
        Text.candidatePairs(Tables.documents(s, d), "doc_id", "text"))
    else Shared.frame(s, "lsh_pairs", d) {
      Curation.expandPairs(sharedCanonPairs(s, d), sharedMembers(s, d),
          "doc_id", "doc_a", "doc_b", Nil)
        .unionByName(Curation
          .withinFamilyPairs(sharedMembers(s, d), "doc_id", "doc_a",
            "doc_b")
          .select(col("doc_a"), col("doc_b")))
    }
  }

  /** The exact-dup family map (doc_id, canon, fsize) behind the staged
    * LSH build — shared so graph consumers can work at CANONICAL grain
    * and expand at the end instead of consuming the (intentionally
    * clone-quadratic) expanded pair frame. */
  private[queries] def sharedMembers(s: SparkSession, d: String): DataFrame =
    Shared.frame(s, "lsh_members", d)(
      Curation.canonicalInput(Tables.documents(s, d))._2)

  /** The canonical document frame (one full-width row per exact-dup
    * family, lowest id) — ONE body shuffle per run, shared by every
    * canonical-grain builder (the pair index, q170's tuning audit). */
  private[queries] def sharedCanonicalDocs(s: SparkSession,
                                           d: String): DataFrame =
    Shared.frame(s, "lsh_canon_docs", d) {
      val docs = Tables.documents(s, d)
      docs.join(
        sharedMembers(s, d).filter(col("doc_id") === col("canon"))
          .select(col("doc_id").as("__cid")),
        docs("doc_id") === col("__cid")).drop("__cid")
    }

  /** LSH candidate pairs at canonical grain — the clone-invariant core
    * of the staged index. */
  private[queries] def sharedCanonPairs(s: SparkSession, d: String): DataFrame =
    Shared.frame(s, "lsh_canon_pairs", d)(
      Text.candidatePairs(sharedCanonicalDocs(s, d), "doc_id", "text"))

  /** Connected components of the CANONICAL candidate graph — cluster =
    * min canonical id reachable. Memoized: the iterative contraction
    * runs once per run over the clone-invariant canonical graph (5 k
    * nodes at sf0.1 regardless of duplicate density) instead of once
    * per consumer over the expanded raw graph (24.7 M clique edges at
    * the 100× clone smoke — the measured q62 blow-up this fixes).
    * Raw-grain component labels recover losslessly: raw components are
    * unions of whole families across canonical components, and the min
    * raw id of such a union IS the min canonical id (each family's min
    * member is its canonical). */
  private[queries] def sharedCanonComponents(s: SparkSession,
                                             d: String): DataFrame =
    Shared.frame(s, "lsh_canon_comps", d)(
      graft.operators.Components
        .connectedComponentsAuto(sharedCanonPairs(s, d), "doc_a", "doc_b")
        .select(col("id").as("canon"), col("cluster")))

  /** The per-(doc, term) BM25 score expression, shared character-for-
    * character (modulo column qualifiers) between the Spark plan and
    * the DuckDB oracle — every literal CAST to double in both engines,
    * every op exactly rounded, so the fixed-point floor is identical.
    * k1 = 1.2, b = 0.75; tf·(k1+1) = tf·2.2; 1−b = 0.25.
    */
  private[queries] def bm25Term(nd: String, df: String, tf: String,
                                len: String, avglen: String): String =
    s"(((CAST($nd AS DOUBLE) - CAST($df AS DOUBLE)) " +
      s"+ CAST(0.5 AS DOUBLE)) " +
      s"/ (CAST($df AS DOUBLE) + CAST(0.5 AS DOUBLE))) " +
      s"* ((CAST($tf AS DOUBLE) * CAST(2.2 AS DOUBLE)) " +
      s"/ (CAST($tf AS DOUBLE) + (CAST(1.2 AS DOUBLE) " +
      s"* (CAST(0.25 AS DOUBLE) + (CAST(0.75 AS DOUBLE) " +
      s"* (CAST($len AS DOUBLE) / $avglen)))))) " +
      s"* CAST(1048576 AS DOUBLE)"

  /** The q190 prefix-filter exact set-similarity join at the grain of
    * `docs`: (verdicts (doc_a, doc_b, inter, na, nb — all qualifying
    * pairs with bigram-set Jaccard ≥ 4/5), sizes (doc_id, na — every
    * doc's distinct-bigram count, for the staged path's within-family
    * expansion)). Bigrams travel as 60-bit md5 windows (the q22
    * hashed-key idiom): joins, ranks and the set arrays move 8-byte
    * longs instead of strings — measured 17.9 s string-keyed, the
    * long-keyed form below is the shipped one. Collisions at 2^60 over
    * a ~10^4..10^9 bigram vocabulary are the documented envelope
    * (q22's exact-mode flag is the precedent for a collision-free
    * variant); the brute-force spec runs on raw strings, so a
    * collision changing the answer would fail it.
    */
  private def prefixFilterCore(docs: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val toks = Text.wordShingles(docs, "doc_id", "text", 2)
      .select(col("doc_id"),
        expr("CAST(conv(substr(md5(CAST(sh AS BINARY)), 1, 15), " +
          "16, 10) AS BIGINT)").as("tok"))
    val df = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("df").asc, col("tok").asc)
    val ranked = toks.join(df, "tok")
      .withColumn("idx", row_number().over(w))
      .withColumn("na", count(lit(1)).over(
        Window.partitionBy(col("doc_id"))))
    val prefix = ranked
      .filter(col("idx") <= col("na") - expr("(na * 4 + 4) div 5") + 1)
      .select(col("tok"), col("doc_id"), col("na"))
    val cand = prefix.toDF("tok", "doc_a", "na")
      .join(prefix.toDF("tok", "doc_b", "nb"), "tok")
      .filter(col("doc_a") < col("doc_b")
        && least(col("na"), col("nb")) * 5
          >= greatest(col("na"), col("nb")) * 4)
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .distinct()
    // verify leg: per-doc bigram SETS as sorted arrays, the exact
    // intersection computed IN-ROW with the native `interlen` merge
    // expression (plans/SortedIntersect.scala — the distinct sorted-
    // merge count, no per-pair hash set, no boxing; replaces
    // size(array_intersect), same DISTINCT semantics over these
    // collect_set inputs). The token-grain join formulation measured
    // 17 s at sf0.1 (1.5 M candidates × ~60 bigrams exploded through
    // two joins); the in-row form touches each candidate once. The set
    // frame is doc-grain (|docs| × ~60 longs) — broadcast here; at
    // 100 TB it rides a shuffle join on the doc ids instead.
    val sets = toks.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("tok"))).as("st"))
    val verdicts = cand
      .join(broadcast(sets.toDF("doc_a", "sa")), "doc_a")
      .join(broadcast(sets.toDF("doc_b", "sb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        expr("interlen(sa, sb)").as("inter"),
        col("na"), col("nb"))
      .filter(col("inter") * 9 >= (col("na") + col("nb")) * 4)
    val sizes = sets.select(col("doc_id"),
      size(col("st")).cast("bigint").as("na"))
    (verdicts, sizes)
  }

  val queries: Map[String, Q] = Map(
    // ---- LSH BANDING-TUNING audit: the measurement that picks the
    // near-dup index's (bands × rows) operating point — the same 16
    // minhash minima banded three ways (2×8 high-precision, 4×4 the
    // home config, 8×2 high-recall), each config's candidate set scored
    // against exact trigram Jaccard ≥ 1/2 (integer form 3·|∩| ≥
    // |A|+|B|) over the UNION of all candidates (relative ground truth
    // — all-pairs exact Jaccard is the O(n²) this index exists to
    // avoid; standard index-tuning practice, documented). Output per
    // config: candidates, true positives, misses vs the union truth —
    // the precision/recall trade the 100 TB operator reads before
    // pinning a config. Signature built once; the truth table persists
    // for the run (Shared.frame) so the three per-config folds share
    // one exact-intersection join.
    // Round 7: staged like the rest of the q21 family — signatures,
    // candidate sets and the truth table build at CANONICAL grain
    // (clone-invariant), and the published COUNTS recover the raw-grain
    // numbers arithmetically: a canonical pair (ca, cb) stands for
    // fsize(ca)·fsize(cb) raw pairs in every config it appears in, and
    // every family contributes its C(f, 2) within-family pairs to
    // EVERY config's candidate AND true sets (identical docs share all
    // bands under any banding, and are Jaccard-1 true). Bit-identical
    // to the raw computation (StagedLshSpec asserts row equality
    // staged-vs-raw); at 10× clone density this removes the measured
    // 15.9 s / 2.5 GB candidate-union build. Raw path behind
    // spark.graft.text.rawLsh=true (separate truth cache key).
    "q170_lsh_tuning" -> ((s, d) => {
      val configs = Seq((2, 8), (4, 4), (8, 2))
      val raw = s.conf.getOption("spark.graft.text.rawLsh")
        .exists(_.toBoolean)
      // Low-dup short-circuit (VERDICT r7 #4): the canonical-grain
      // staging buys its 4× win from collapsing exact-dup families, but
      // when duplicate MASS is negligible (sf0.1 carries 8 dups in 5000
      // docs) the canonical corpus is ~the raw corpus and the weight
      // arithmetic (fsz joins per truth row, wWithin scalars, weighted
      // folds) is pure overhead — measured 2.0 → 9.6 s. Staged and raw
      // are BIT-IDENTICAL on every corpus (StagedLshSpec), so the branch
      // is purely a cost choice: stage only when ≥ 5% of rows are
      // non-canonical (clone-heavy — where staging removed a measured
      // 15.9 s / 2.5 GB surface), else run the raw plan. The probe is
      // one planner-scale aggregate over the run-shared persisted dedup
      // map (the same frame the staged path needs anyway) — noise next
      // to the three banding self-joins it gates.
      val lowDup = !raw && {
        val r = sharedMembers(s, d)
          .agg(count(lit(1)).as("n"),
            sum(when(col("doc_id") === col("canon"), 1L).otherwise(0L))
              .as("c"))
          .collect()(0)
        (r.getLong(0) - r.getLong(1)) * 20L < r.getLong(0)
      }
      if (raw || lowDup) {
        val docs = Tables.documents(s, d)
        val tri = Text.wordShingles(docs, "doc_id", "text", 3)
        val sig = Text.minhashSignature(tri, "doc_id", 16, withCount = true)
        val nsh = sig.select(col("doc_id"), col("n_sh"))
        val cand = configs.map { case (b, r) =>
          Text.lshCandidatePairs(Text.lshBands(sig, "doc_id", b, r),
            "doc_id").select(col("doc_a"), col("doc_b"))
        }
        val truth = Shared.frame(s, "lsh_tuning_truth_raw", d) {
          val union = cand.reduce(_ unionByName _).distinct()
          val inter = tri.as("x")
            .join(union, col("x.doc_id") === col("doc_a"))
            .join(tri.as("y"),
              col("y.doc_id") === col("doc_b") && col("x.sh") === col("y.sh"))
            .groupBy(col("doc_a"), col("doc_b"))
            .agg(count(lit(1)).as("inter"))
          union
            .join(nsh.toDF("doc_a", "na"), "doc_a")
            .join(nsh.toDF("doc_b", "nb"), "doc_b")
            .join(inter, Seq("doc_a", "doc_b"), "left_outer")
            .select(col("doc_a"), col("doc_b"),
              (coalesce(col("inter"), lit(0L)) * 3
                >= col("na") + col("nb")).as("is_true"))
        }
        val unionTrue = truth
          .agg(coalesce(sum(when(col("is_true"), 1L).otherwise(0L)),
            lit(0L)).as("n_true_union"))
        configs.zip(cand).map { case ((b, r), c) =>
          c.join(truth, Seq("doc_a", "doc_b"))
            .agg(count(lit(1)).as("n_cand"),
              coalesce(sum(when(col("is_true"), 1L).otherwise(0L)),
                lit(0L)).as("n_true"))
            .select(lit(b).as("bands"), lit(r).as("rows_per_band"),
              col("n_cand"), col("n_true"))
        }.reduce(_ unionByName _)
          .crossJoin(broadcast(unionTrue))
          .withColumn("n_missed", col("n_true_union") - col("n_true"))
      } else {
        val mem = sharedMembers(s, d)
        val fsz = mem.filter(col("doc_id") === col("canon"))
          .select(col("canon"), col("fsize"))
        // within-family mass: C(f,2) pairs, candidates + true in every
        // config — one scalar, added to every published count
        val wWithin = fsz.agg(coalesce(
          sum(expr("fsize * (fsize - 1) div 2")), lit(0L)).as("w"))
        val tri = Text.wordShingles(sharedCanonicalDocs(s, d),
          "doc_id", "text", 3)
        val sig = Text.minhashSignature(tri, "doc_id", 16, withCount = true)
        val nsh = sig.select(col("doc_id"), col("n_sh"))
        val cand = configs.map { case (b, r) =>
          Text.lshCandidatePairs(Text.lshBands(sig, "doc_id", b, r),
            "doc_id").select(col("doc_a"), col("doc_b"))
        }
        val truth = Shared.frame(s, "lsh_tuning_truth", d) {
          val union = cand.reduce(_ unionByName _).distinct()
          val inter = tri.as("x")
            .join(union, col("x.doc_id") === col("doc_a"))
            .join(tri.as("y"),
              col("y.doc_id") === col("doc_b") && col("x.sh") === col("y.sh"))
            .groupBy(col("doc_a"), col("doc_b"))
            .agg(count(lit(1)).as("inter"))
          union
            .join(nsh.toDF("doc_a", "na"), "doc_a")
            .join(nsh.toDF("doc_b", "nb"), "doc_b")
            .join(inter, Seq("doc_a", "doc_b"), "left_outer")
            .join(fsz.toDF("doc_a", "fa"), "doc_a")
            .join(fsz.toDF("doc_b", "fb"), "doc_b")
            .select(col("doc_a"), col("doc_b"),
              (coalesce(col("inter"), lit(0L)) * 3
                >= col("na") + col("nb")).as("is_true"),
              (col("fa") * col("fb")).as("w"))
        }
        val unionTrue = truth
          .agg(coalesce(sum(when(col("is_true"), col("w"))), lit(0L))
            .as("tw"))
          .crossJoin(broadcast(wWithin))
          .select((col("tw") + col("w")).as("n_true_union"))
        configs.zip(cand).map { case ((b, r), c) =>
          c.join(truth, Seq("doc_a", "doc_b"))
            .agg(coalesce(sum(col("w")), lit(0L)).as("cw"),
              coalesce(sum(when(col("is_true"), col("w"))), lit(0L))
                .as("tw"))
            .crossJoin(broadcast(wWithin))
            .select(lit(b).as("bands"), lit(r).as("rows_per_band"),
              (col("cw") + col("w")).as("n_cand"),
              (col("tw") + col("w")).as("n_true"))
        }.reduce(_ unionByName _)
          .crossJoin(broadcast(unionTrue))
          .withColumn("n_missed", col("n_true_union") - col("n_true"))
      }
    }),

    // ---- EXACT set-similarity join via PREFIX FILTERING (the
    // AllPairs/PPJoin family — the deterministic-COMPLETE alternative
    // to LSH candidates): every doc pair with bigram-set Jaccard
    // ≥ 4/5, with no all-pairs pass and no missed pairs (LSH q21 can
    // miss; this can't — asserted against brute force in the spec).
    // Bigrams sort by global rarity (df asc, tok asc — one shared
    // order); a doc's PREFIX is its first |d| − ⌈0.8·|d|⌉ + 1
    // bigrams, and the completeness theorem says any qualifying pair
    // shares a prefix bigram — the join touches only prefix buckets,
    // plus the 5·min ≥ 4·max length filter, then the exact
    // intersection verifies 9·I ≥ 4·(|a|+|b|). Honest scale note:
    // pruning power IS vocabulary discriminativeness — on this
    // small-vocab corpus the candidate set stays heavy (13 k at
    // sf0.01 for 25 true pairs, measured), which is exactly why LSH
    // banding is the default and prefix filtering the exact-audit
    // tool. Per-doc ranks ride a high-cardinality doc_id window; the
    // df table is vocabulary-sized.
    // Default path is STAGED (VERDICT r6 #2): exact-dedup the corpus
    // first (Curation.canonicalInput — the q20 rule), run the
    // pair-generating join at canonical grain, then expand verdicts
    // back to raw-doc grain. Lossless: exact duplicates share shingle
    // sets, so within-family pairs are Jaccard-1 (inter = na = nb) and
    // cross-family pairs inherit their canonical verdict — output is
    // bit-identical to the unstaged join (StagedExactJoinSpec; the
    // DuckDB oracle below still computes the raw-corpus form). The
    // measured reason staging is the default, not advice: 10× clone
    // corpus, raw 113 s / 31.5 GB spill → staged 5.3 s / zero spill
    // (commit c26eeba). The unstaged join stays available behind
    // spark.graft.text.rawExactJoin=true for corpora known dup-free.
    "q190_prefix_filter_join" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val raw = s.conf.getOption("spark.graft.text.rawExactJoin")
        .exists(_.toBoolean)
      if (raw) prefixFilterCore(docs)._1
      else {
        // r13 note: riding the run-shared lsh_canon_docs/lsh_members
        // here was tried and MEASURED SLOWER (3.1 → 4.7 s steady): the
        // cached canon frame is a low-partition string-heavy
        // InMemoryRelation, while the inline digest agg reads straight
        // off the vectorized parquet scan at full parallelism. Kept
        // inline.
        val (canon, members) = Curation.canonicalInput(docs)
        val (cross, sizes) = prefixFilterCore(canon)
        val expanded = Curation.expandPairs(cross, members, "doc_id",
          "doc_a", "doc_b", Seq(("na", "nb")))
        val within = Curation
          .withinFamilyPairs(members, "doc_id", "doc_a", "doc_b")
          .join(sizes.withColumnRenamed("doc_id", "canon"), "canon")
          .select(col("doc_a"), col("doc_b"), col("na").as("inter"),
            col("na"), col("na").as("nb"))
        expanded.unionByName(within)
      }
    }),

    // ---- INCREMENTAL batch-vs-corpus NEAR-dup (completing the
    // incremental family: q96 is the exact-digest leg, this is the LSH
    // leg — the nightly question "which of today's documents are
    // near-dups of anything already ingested?"): the corpus side keeps
    // a PERSISTED band index (Shared.frame here; a real table at
    // 100 TB, appended as batches commit), today's batch probes it
    // band-for-band, and band candidates are verified by exact trigram
    // Jaccard ≥ 1/2 (the q170 truth rule). Per-day cost scales with
    // the BATCH (probe rows × bucket hits), never the corpus. The
    // corpus side is dedup-STAGED (the round-7 discipline): the index
    // holds canonical families only, and raw-grain counts/ids recover
    // arithmetically — candidate family = fsize raw candidates (family
    // members share every band), best_match = min verified canonical
    // (= min verified raw id). The DuckDB oracle replays the RAW
    // semantics, so parity itself proves the staging lossless. Output
    // per batch doc: candidate count, verified count, best match
    // (-1 = none), the is_neardup verdict.
    "q196_incremental_neardup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val isBatch = SamplingQueries.hashBucket("doc_id", 21, 10) === 7
      val batch = docs.filter(isBatch)
      // r13 note: deriving the non-batch family map from the run-shared
      // lsh_members frame was tried and MEASURED SLOWER — the extra
      // member-map joins cost more than the digest agg they replace at
      // the measured scale. Kept inline.
      val (corpusCanon, corpusMembers) =
        Curation.canonicalInput(docs.filter(!isBatch))
      val fsz = corpusMembers.filter(col("doc_id") === col("canon"))
        .select(col("canon").as("cid"), col("fsize"))
      val index = Shared.frame(s, "inc_band_index", d)(
        Text.candidateBands(corpusCanon, "doc_id", "text")
          .select(col("doc_id").as("cid"), col("band"), col("h")))
      val cand = Text.candidateBands(batch, "doc_id", "text")
        .join(index, Seq("band", "h"))
        .select(col("doc_id"), col("cid")).distinct()
      val triB = Text.wordShingles(batch, "doc_id", "text", 3)
      // r13 (guide §3.2/§8): shingle ONLY the candidate canonicals —
      // the exact verify reads triC/nshC solely at cids in the
      // candidate set, so the corpus-wide shingle explode was dead
      // work (and corpus-shaped work at 100 TB, where per-day cost
      // must scale with the batch; this restores that contract).
      val candDocs = corpusCanon.join(
        broadcast(cand.select(col("cid"))),
        corpusCanon("doc_id") === col("cid"), "left_semi")
      val triC = Text.wordShingles(candDocs, "doc_id", "text", 3)
        .select(col("doc_id").as("cid"), col("sh"))
      val nshB = triB.groupBy(col("doc_id")).agg(count(lit(1)).as("na"))
      val nshC = triC.groupBy(col("cid")).agg(count(lit(1)).as("nb"))
      val inter = triB.join(cand, "doc_id")
        .join(triC, Seq("cid", "sh"))
        .groupBy(col("doc_id"), col("cid")).agg(count(lit(1)).as("inter"))
      val verified = cand
        .join(inter, Seq("doc_id", "cid"), "left")
        .join(nshB, "doc_id").join(nshC, "cid")
        .select(col("doc_id"), col("cid"),
          (coalesce(col("inter"), lit(0L)) * 3
            >= col("na") + col("nb")).as("ok"))
      val agg = verified.join(fsz, "cid")
        .groupBy(col("doc_id"))
        .agg(sum(col("fsize")).as("n_cand"),
          sum(when(col("ok"), col("fsize")).otherwise(0L))
            .as("n_verified"),
          min(when(col("ok"), col("cid"))).as("bm"))
      batch.select(col("doc_id"))
        .join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_cand"), lit(0L)).as("n_cand"),
          coalesce(col("n_verified"), lit(0L)).as("n_verified"),
          coalesce(col("bm"), lit(-1L)).as("best_match"),
          (coalesce(col("n_verified"), lit(0L)) > 0).as("is_neardup"))
    }),

    // ---- SOFT-DEDUP loss weights: the down-weight-instead-of-drop
    // alternative to q20's hard canonical rule — every doc keeps
    // weight 1/dup_count (fixed-point ×1e6, truncating integer
    // division) so a duplicate FAMILY contributes one document's
    // worth of gradient while every surface form stays in the mix.
    // One digest group-by + one digest-keyed join; weights and the
    // weighted token ledger stay integer-exact.
    "q193_soft_dedup_weights" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text").cast("binary")).as("h"),
          size(split(col("text"), " ")).cast("bigint").as("toks"))
      val grp = docs.groupBy(col("h")).agg(count(lit(1)).as("dup_count"))
      docs.join(grp, "h")
        .select(col("doc_id"), col("dup_count"),
          expr("1000000L div dup_count").as("weight_x1e6"),
          (col("toks") * expr("1000000L div dup_count"))
            .as("weighted_tokens_x1e6"))
    }),

    // ---- KISH EFFECTIVE SAMPLE SIZE (what soft-dedup weighting
    // actually costs in statistical power): per source,
    // ESS = (Σw)²/Σw² over the q193 soft-dedup weights and the design
    // effect deff = n/ESS — a source full of near-identical docs keeps
    // its surface forms (q193's contract) but contributes far fewer
    // EFFECTIVE examples; this is the number a mixture designer should
    // weight by instead of raw doc counts. Integer-exact: weights are
    // the ×1e6 fixed-point 1/dup_count longs; each square w² ≤ 10¹²
    // fits BIGINT but Σw² ACCUMULATES in DECIMAL(38,0) (ADVICE r8: a
    // plain BIGINT sum overflows past ~9·10⁶ all-distinct docs per
    // source; the oracle sums in HUGEINT), and the downstream ratios
    // keep the 38,0 headroom before flooring to ×1000 fixed-point.
    // Unweighted sources report ess_x1000 = n·1000 and
    // deff_x1000 = 1000 exactly. One digest group-by (shared shape
    // with q193) + one source fold.
    "q232_effective_sample_size" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          md5(col("text").cast("binary")).as("h"))
      val grp = docs.groupBy(col("h")).agg(count(lit(1)).as("dup_count"))
      docs.join(grp, "h")
        .select(col("source"), expr("1000000L div dup_count").as("w"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("sw"),
          sum((col("w") * col("w")).cast("decimal(38,0)")).as("sww"))
        .select(col("source"), col("n_docs"),
          expr("CAST((CAST(sw AS DECIMAL(18,0)) " +
            "* CAST(sw AS DECIMAL(18,0)) * 1000) " +
            "div CAST(sww AS DECIMAL(38,0)) AS BIGINT)")
            .as("ess_x1000"),
          expr("CAST((CAST(n_docs AS DECIMAL(18,0)) " +
            "* CAST(sww AS DECIMAL(38,0)) * 1000) " +
            "div (CAST(sw AS DECIMAL(18,0)) " +
            "* CAST(sw AS DECIMAL(18,0))) AS BIGINT)")
            .as("deff_x1000"))
    }),

    // ---- EFFECTIVE MIXTURE after soft-dedup (the number a DoReMi-
    // style mixture designer actually feeds the sampler): q193 keeps
    // every surface form at weight 1/dup_count, so each source's
    // EFFECTIVE token share differs from its raw share exactly when
    // its duplicate mass differs from the corpus average — a
    // duplicate-heavy source silently shrinks, a clean source grows,
    // and training at raw ppm would over-sample the duplicated one.
    // Per source: raw token ppm vs weighted-token ppm plus the signed
    // shift. Integer-exact: row-level toks·(10⁶ div dup_count) fits
    // BIGINT (toks ≤ ~10⁵), the per-source mass ACCUMULATES in
    // DECIMAL(38,0) (the q232 lesson — a BIGINT sum overflows past
    // ~10⁷ all-distinct docs per source), ppm by integral div.
    // Scale: one digest group-by + one source fold + a 1-row
    // broadcast of the corpus totals.
    "q259_effective_mixture" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          md5(col("text").cast("binary")).as("h"),
          size(split(col("text"), " ")).cast("bigint").as("toks"))
      val grp = docs.groupBy(col("h")).agg(count(lit(1)).as("dup_count"))
      val per = docs.join(grp, "h")
        .select(col("source"), col("toks"),
          (col("toks") * expr("1000000L div dup_count"))
            .cast("decimal(38,0)").as("wt"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).as("raw_tokens"),
          sum(col("wt")).as("wt_mass"))
      val tot = per.agg(sum(col("raw_tokens")).as("tot_raw"),
        sum(col("wt_mass")).as("tot_wt"))
      per.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("raw_tokens"),
          expr("CAST(CAST(raw_tokens AS DECIMAL(38,0)) * 1000000 " +
            "div CAST(tot_raw AS DECIMAL(38,0)) AS BIGINT)")
            .as("raw_ppm"),
          expr("CAST(wt_mass * 1000000 div tot_wt AS BIGINT)")
            .as("eff_ppm"))
        .withColumn("shift_ppm", col("eff_ppm") - col("raw_ppm"))
    }),

    // ---- DEDUP SAVINGS report: the before/after ledger every dedup
    // run publishes — per source, documents and tokens in the raw
    // corpus vs the canonical corpus (q38's rule: drop any doc that is
    // the LARGER id of an LSH candidate pair), and the kept-token
    // share as one double division. Rides the ONE shared LSH pair
    // frame; the fold is a broadcast-anti-join shape + one
    // map-combined aggregate per source — the report costs nothing
    // beyond the index that already exists.
    "q173_dedup_savings" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("bigint").as("toks"))
      val dropped = sharedCandidatePairs(s, d)
        .select(col("doc_b").as("doc_id")).distinct()
      docs.join(dropped.withColumn("is_dup", lit(1L)), Seq("doc_id"),
          "left_outer")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("docs_total"),
          sum(when(col("is_dup").isNull, 1L).otherwise(0L))
            .as("docs_kept"),
          sum(col("toks")).as("tokens_total"),
          sum(when(col("is_dup").isNull, col("toks")).otherwise(0L))
            .as("tokens_kept"))
        .withColumn("kept_share",
          col("tokens_kept").cast("double") / col("tokens_total"))
    }),

    // ---- BM25 top-k retrieval (log-free, fixed-point): the lexical
    // ranking half of hybrid retrieval. Two deliberate departures from
    // textbook BM25, both for cross-engine exactness: (1) the IDF keeps
    // the rational (N-df+0.5)/(df+0.5) without the log — engines do not
    // guarantee bit-identical ln(), and the log is monotone so a
    // SINGLE-term ranking is unchanged (multi-term rankings can differ
    // from textbook; documented, deterministic); (2) each per-term
    // double score (every op exactly rounded, literals CAST to double
    // in both engines) is floored to 2^20 fixed-point BEFORE the
    // per-doc sum, so integer addition makes the aggregate order-free —
    // summing raw doubles across a shuffle would not replay. Query =
    // the corpus's top-5 tokens (deterministic tie-break). Scale shape:
    // df/len/avglen are one token-scan's aggregates, scoring is a
    // broadcast join + map-combinable sum, top-10 via sort+limit.
    "q129_bm25_topk" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val lens = toks.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("len"))
      val stats = lens
        .agg(sum(col("len")).as("tot"), count(lit(1)).as("nd"))
        .select(col("nd"), (col("tot").cast("double")
          / col("nd").cast("double")).as("avglen"))
      val qterms = toks.groupBy(col("tok"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("tok").asc)
        .limit(5).select(col("tok"))
      val tf = toks.join(broadcast(qterms), "tok")
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      val dft = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      tf.join(broadcast(dft), "tok")
        .join(lens, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("si", expr(
          s"CAST(floor(${TextQueries.bm25Term("nd", "df", "tf", "len",
            "avglen")}) AS BIGINT)"))
        .groupBy(col("doc_id")).agg(sum(col("si")).as("score"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(10)
        .select(col("doc_id"), col("score"))
    }),
    // ---- exact dedup by content hash: one canonical doc per distinct
    // text (shuffles 16-byte digests, not bodies)
    "q20_dedup_exact" -> ((s, d) => {
      Dedup.exactByHash(Tables.documents(s, d), "text", "doc_id")
    }),

    // ---- MinHash(16) + LSH(4 bands × 4 rows) near-dup candidate pairs
    // over word-trigram shingles
    "q21_minhash_pairs" -> ((s, d) => sharedCandidatePairs(s, d)),

    // ---- DUP-PAIR PROVENANCE split: of the LSH candidate pairs, how
    // many stay WITHIN each source vs CROSS into another? The answer
    // decides the dedup deployment shape — within-source dup mass
    // dedups shard-locally (cheap, per-source jobs), cross-source mass
    // forces the global pass — and fingers the sources that plagiarize
    // or syndicate each other (the q105 8-gram matrix reads content
    // overlap; this reads near-DUPLICATE overlap). Rides the run-shared
    // pair frame (sharedCandidatePairs — no new pair generation), two
    // broadcast-sized joins onto doc sources, one fold; a cross pair
    // contributes one count to EACH of its two sources, so
    // Σ within + Σ cross / 2 = |pairs| (the spec's ledger).
    "q224_dup_provenance" -> ((s, d) => {
      val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
      val pairs = sharedCandidatePairs(s, d)
        .join(src.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("source", "src_a"), "doc_a")
        .join(src.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("source", "src_b"), "doc_b")
      val within = pairs.filter(col("src_a") === col("src_b"))
        .groupBy(col("src_a").as("source"))
        .agg(count(lit(1)).as("n_within"))
      val cross = pairs.filter(col("src_a") =!= col("src_b"))
        .select(explode(array(col("src_a"), col("src_b"))).as("source"))
        .groupBy(col("source")).agg(count(lit(1)).as("n_cross"))
      within.join(cross, Seq("source"), "full_outer")
        .select(col("source"),
          coalesce(col("n_within"), lit(0L)).as("n_within"),
          coalesce(col("n_cross"), lit(0L)).as("n_cross"))
    }),

    // ---- exact n-gram Jaccard within (lang, source) blocks. Instead of
    // a trigram self-join (sort-merge on wide string keys, two shuffles
    // of the exploded frame), group each trigram's doc list once and
    // emit ordered pairs in-row: one shuffle of the trigrams, then a
    // shuffle of id-pairs only. Skew bound is ENFORCED, not advisory:
    // a trigram shared by m docs in a block emits C(m,2) pairs from one
    // grouped row, so trigrams with block document-frequency > HotDf are
    // dropped before pair emission (stopword-ish shingles carry no
    // similarity signal anyway). Per-doc counts `n` are taken over the
    // same pruned universe, so the Jaccard stays internally consistent —
    // and the worst per-row fan-out is C(HotDf,2), independent of corpus
    // clone density. The oracle mirrors the prune exactly.
    "q22_ngram_jaccard" -> ((s, d) =>
      ngramPairStats(s, d)
        .filter(col("inter") >= 3)
        .select(col("doc_a"), col("doc_b"), col("inter"),
          (col("inter") / (col("na") + col("nb") - col("inter")))
            .as("jac"))),

    // ---- DEDUP-THRESHOLD sensitivity curve: how many pairs/docs does
    // the near-dup gate flag at each Jaccard cutoff t ∈ {30..90}%? q170
    // tunes the LSH BANDING at a fixed truth rule; this sweeps the
    // VERIFY threshold itself, per Jaccard cutoff, on the exact
    // within-(lang, source) trigram pair frame — what a curation owner
    // reads before
    // pinning "near-dup" to 0.8 vs 0.5 (each 10-point step changes
    // the removable mass; the curve's knee is corpus-specific). The
    // pass test is exact integer cross-multiplication:
    // jac ≥ t/100 ⟺ inter·(100+t) ≥ t·(na+nb) — no float enters the
    // verdict. Scale: ONE shared pair-stats frame (built once per run,
    // q22 rides the same artifact); the 7-threshold explode multiplies
    // pair-grain rows (bounded by the q22 HotDf fanout cap), then
    // folds to 7 rows; the threshold axis is generated, so an
    // all-unique corpus still reports 7 zero rows, never 0 rows.
    "q256_dedup_threshold_curve" -> ((s, d) => {
      val stats = ngramPairStats(s, d).filter(col("inter") >= 3)
      // corpus-independent constant axis (ADVICE r10): range(1), not a
      // documents scan — the old documents.limit(1) seed returned 0
      // rows on an EMPTY corpus (vs the oracle's generate_series 7
      // zero rows) and cost a needless scan on every other corpus
      val axis = s.range(1)
        .select(explode(expr("sequence(30, 90, 10)")).as("threshold_pct"))
      val passing = stats
        .select(col("doc_a"), col("doc_b"), col("inter"),
          col("na"), col("nb"),
          explode(expr("sequence(30, 90, 10)")).as("threshold_pct"))
        .filter(col("inter") * (lit(100) + col("threshold_pct"))
          >= col("threshold_pct") * (col("na") + col("nb")))
      val nP = passing.groupBy(col("threshold_pct"))
        .agg(count(lit(1)).as("n_pairs"))
      val nD = passing
        .select(col("threshold_pct"),
          explode(array(col("doc_a"), col("doc_b"))).as("doc"))
        .distinct()
        .groupBy(col("threshold_pct"))
        .agg(count(lit(1)).as("n_docs_flagged"))
      axis
        .join(nP, Seq("threshold_pct"), "left_outer")
        .join(nD, Seq("threshold_pct"), "left_outer")
        .select(col("threshold_pct").cast("long").as("threshold_pct"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("n_docs_flagged"), lit(0L)).as("n_docs_flagged"))
    }),

    // ---- 32-bit SimHash fingerprint per document
    "q23_simhash" -> ((s, d) => {
      Text.simhash(Tables.documents(s, d), "doc_id", "text", 32)
    }),

    // ---- token counting + length statistics: whitespace tokens plus a
    // BPE-ish regex segmentation (letter runs / digit runs / punctuation)
    "q24_token_stats" -> ((s, d) => {
      Tables.documents(s, d).select(
        col("doc_id"),
        length(col("text")).as("chars"),
        size(split(col("text"), " ")).as("n_tokens"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))
          .as("bpe_tokens"),
        ((length(col("text")) - (size(split(col("text"), " ")) - 1))
          / size(split(col("text"), " "))).as("avg_token_len"))
    }),

    // ---- near-dup dedup materialization: the canonical corpus = docs
    // that never appear as the higher id of an LSH candidate pair
    // (greedy keep-lowest; ids only, bodies untouched)
    "q38_neardup_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = sharedCandidatePairs(s, d)
      docs.join(pairs.select(col("doc_b")),
          docs("doc_id") === col("doc_b"), "left_anti")
        .select("doc_id", "lang", "source")
    }),

    // ---- n-gram/stopword-heuristic language ID
    "q25_lang_id" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"))
        .agg(
          sum(when(col("tok").isin(stopwords: _*), 1).otherwise(0))
            .as("stop_hits"),
          count(lit(1)).as("n_tokens"))
        .select(col("doc_id"), col("stop_hits"), col("n_tokens"),
          when(col("stop_hits") / col("n_tokens") >= 0.03, lit("en"))
            .otherwise(lit("other")).as("pred_lang"))
    }),

    // ---- quality scoring: length band + lexical diversity + stopword
    // ratio, one pass over exploded tokens
    "q26_quality_score" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tok = docs
        .select(col("doc_id"), length(col("text")).as("chars"),
          explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("chars"))
        .agg(
          count(lit(1)).as("n_tokens"),
          countDistinct(col("tok")).as("uniq_tokens"),
          sum(when(col("tok").isin(stopwords: _*), 1).otherwise(0))
            .as("stop_hits"))
      tok.select(
        col("doc_id"), col("chars"), col("n_tokens"), col("uniq_tokens"),
        (col("uniq_tokens") / col("n_tokens")).as("uniq_ratio"),
        (col("stop_hits") / col("n_tokens")).as("stop_ratio"),
        (when(col("chars").between(100, 500), 1.0).otherwise(0.5) * 0.5
          + (col("uniq_tokens") / col("n_tokens")) * 0.3
          + (col("stop_hits") / col("n_tokens")) * 0.2).as("score"))
    }),

    // ---- simhash near-dup ranking via the custom codegen'd Catalyst
    // expression hamming64 (graft.plans.HammingDistance): top-20 closest
    // fingerprints to doc 0
    // hamming64 is installed session-wide by GraftExtensions
    // (Engine.session sets spark.sql.extensions); re-registering here
    // per-call forced a registry replace + fresh codegen inside the
    // timed window and showed up as a 4x bench regression in round 3.
    "q34_simhash_knn" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val fp = Text.simhash(docs, "doc_id", "text", 32)
      // query fingerprint from a doc_id=0-filtered scan: the predicate
      // pushes down to parquet and only one document is tokenized+hashed,
      // instead of re-aggregating (or exchange-reusing) the full corpus
      val q = Text.simhash(docs.filter(col("doc_id") === 0),
          "doc_id", "text", 32)
        .select(col("simhash").as("qfp"))
      fp.filter(col("doc_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("doc_id"), expr("hamming64(simhash, qfp)").as("dist"))
        .orderBy(col("dist").asc, col("doc_id").asc)
        .limit(20)
    }),

    // ---- collocation mining: top-20 bigrams by lift (the PMI argument
    // without the log — (cxy·N)/(cx·cy), a single division of exact
    // integers, so ordering is bit-stable cross-engine). The corpus is
    // scanned and exploded ONCE: marginals cx, cy, and the total nn are
    // re-aggregations of the (small) bigram-count table, not fresh
    // corpus passes.
    "q88_bigram_lift" -> ((s, d) => {
      val bi = Tables.documents(s, d)
        .select(split(col("text"), " ").as("tk"))
        .select(explode(expr(
          "transform(sequence(1, greatest(size(tk) - 1, 1)), " +
            "p -> struct(try_element_at(tk, p) AS w1, " +
            "try_element_at(tk, p + 1) AS w2))")).as("b"))
        .select(col("b.w1"), col("b.w2"))
        .filter(col("w1").isNotNull && col("w2").isNotNull)
      val cxy = bi.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("cxy"))
      val cx = cxy.groupBy(col("w1")).agg(sum(col("cxy")).as("cx"))
      val cy = cxy.groupBy(col("w2")).agg(sum(col("cxy")).as("cy"))
      val n = cxy.agg(sum(col("cxy")).as("nn"))
      cxy.filter(col("cxy") >= 5)
        .join(cx, "w1").join(cy, "w2").crossJoin(broadcast(n))
        .withColumn("lift",
          (col("cxy") * col("nn")).cast("double") / (col("cx") * col("cy")))
        .orderBy(col("lift").desc, col("w1").asc, col("w2").asc)
        .limit(20)
        .select(col("w1"), col("w2"), col("cxy"), col("lift"))
    }),

    // ---- INCREMENTAL near-dup: probe only the incoming batch
    // (doc_id % 10 == 0 stands in for today's drop) against the
    // existing corpus via shared LSH band buckets. The at-scale daily
    // path: new×corpus candidate pairs instead of corpus×corpus — the
    // existing side's bands are a precomputed index in production, so
    // per-day cost is proportional to the batch, not the corpus.
    "q96_incremental_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val bands = Text.lshBands(
        Text.minhashSignature(
          Text.wordShingles(docs, "doc_id", "text", 3, dedup = false),
          "doc_id", 16),
        "doc_id", 4, 4)
      val incoming = bands.filter(col("doc_id") % 10 === 0)
        .select(col("band"), col("h"), col("doc_id").as("new_id"))
      val existing = bands.filter(col("doc_id") % 10 =!= 0)
        .select(col("band").as("band_e"), col("h").as("h_e"),
          col("doc_id").as("old_id"))
      incoming.join(existing,
          col("band") === col("band_e") && col("h") === col("h_e"))
        .select(col("new_id"), col("old_id")).distinct()
        .groupBy(col("new_id"))
        .agg(count(lit(1)).as("n_dups"), min(col("old_id")).as("first_dup"))
    }),

    // ---- batch twin of streaming/StreamNearDup: per LSH band bucket,
    // the owner is the minimum doc_id (the streaming arrival-order
    // ownership with doc_id-ordered arrival) and every other member is
    // flagged (doc, band, owner). Emission is LINEAR in bucket size —
    // one star row per member, never C(m,2) pairs — which is why the
    // streaming dedup path scales where pair materialization needs
    // caps. Used to audit streaming decisions against the batch corpus.
    "q112_neardup_flags" -> ((s, d) => {
      val bands = Text.candidateBands(Tables.documents(s, d), "doc_id",
        "text")
      val owners = bands.groupBy(col("band"), col("h"))
        .agg(min(col("doc_id")).as("matched_id"))
      bands.join(owners, Seq("band", "h"))
        .filter(col("doc_id") =!= col("matched_id"))
        .select(col("doc_id"), col("band"), col("matched_id"))
    }),

    // ---- document fingerprinting: exact digest + min-shingle robust
    // fingerprint. The min-shingle leg rides the same native rolling
    // Karp–Rabin pass as q199 (`winnowfp` with window w=1 emits every
    // per-position 8-gram hash, sorted — element 1 IS the min): one
    // in-row O(n) pass per doc, no shingle explode, no per-position
    // md5 (the round-8 q199 discipline applied here; was 3.4 s
    // in-suite for an exploded md5-per-position aggregation). Docs
    // shorter than 8 chars have no 8-gram and fingerprint NULL —
    // mirrored in the oracle.
    "q27_fingerprint" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        md5(col("text").cast("binary")).as("exact_fp"),
        expr("array_min(winnowfp(text, 8, 1))").as("min_shingle_fp"))),

    // ---- PII scrub (training-data redaction): count and redact email
    // addresses and long digit runs (≥ 9 digits — phone/account/ID
    // shaped) per document — the compliance pass every corpus release
    // runs before training. Patterns are restricted to character
    // classes + greedy counted repetition (no backrefs, no lookaround)
    // so Java regex (Spark) and RE2 (DuckDB) produce IDENTICAL
    // leftmost matches; emails redact FIRST so an address's digits
    // can't double-count as an ID (same order both engines). Redaction
    // is a pure map (regexp_replace is codegen'd) — no shuffle at all;
    // output carries counts + the redacted length so the oracle proves
    // the replacement itself, not just detection. The synthetic corpus
    // is PII-free (all zeros corpus-wide — asserted, and the planted
    // EdgeCasesSpec corpus proves the live path); at 100 TB this is
    // the cheapest pass in the pipeline: one linear scan, map-only.
    "q204_pii_scrub" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val redacted = regexp_replace(
        regexp_replace(col("text"), PiiEmailRe, "<EMAIL>"),
        PiiLongNumRe, "<NUM>")
      docs.select(col("doc_id"),
        expr(s"size(regexp_extract_all(text, '$PiiEmailRe', 0))")
          .cast("bigint").as("n_emails"),
        expr(s"size(regexp_extract_all(text, '$PiiLongNumRe', 0))")
          .cast("bigint").as("n_long_nums"),
        length(redacted).cast("bigint").as("len_redacted"))
    }),

    // ---- BIGRAM-LM SURPRISAL quality filter: score each doc by how
    // predictable its word sequence is under the corpus's own bigram
    // model — the cheap LM-likelihood proxy (a KenLM stand-in) that
    // catches boilerplate-free gibberish lexical filters (q26) miss.
    // Per bigram (w1,w2): the quantized conditional frequency
    // floor(cnt(w1 w2)*SurpScale / cnt(w1 ·)) — integer floor-division,
    // both counts from the SAME bigram table so the denominator is
    // "w1 followed by anything". familiarity = floor(mean) per doc;
    // flagged = familiarity below SurpScale/5 (mean conditional
    // frequency under 20%). All-integer — no logs, so the oracle
    // replays exactly; a production scorer would sum quantized
    // log-probs instead, same plan shape. At 100 TB: two map-combined
    // count aggs, two linear shuffle joins keyed on short word/bigram
    // strings (dictionary-encode the vocab to ints to shrink further),
    // one map-combined per-doc sum; cnt*SurpScale stays in-bounds up
    // to ~1e14-occurrence bigrams. Single-word docs have no bigram and
    // are out of scope (they fall to the length filters).
    "q134_bigram_surprisal" -> ((s, d) => {
      val bg = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), explode(expr(
          "zip_with(slice(tk, 1, greatest(size(tk) - 1, 0)), " +
            "slice(tk, 2, greatest(size(tk) - 1, 0)), " +
            "(a, b) -> struct(a AS w1, concat(a, ' ', b) AS bg))"))
          .as("p"))
        .select(col("doc_id"), col("p.w1"), col("p.bg"))
      val c2 = bg.groupBy(col("bg")).agg(count(lit(1)).as("cnt2"))
      val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("cnt1"))
      bg.join(c2, "bg").join(c1, "w1")
        .select(col("doc_id"),
          expr(s"(cnt2 * ${SurpScale}L) div cnt1").as("sc"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("sc")).as("ss"))
        .select(col("doc_id"), col("n_bigrams"),
          expr("ss div n_bigrams").as("familiarity"),
          (expr("ss div n_bigrams") < SurpScale / 5).as("flagged"))
    }),

    // ---- WINNOWING fingerprint overlap (Schleimer et al., the MOSS
    // algorithm): the POSITIONAL-GUARANTEE fingerprinter next to q27's
    // whole-doc min-shingle — every k-gram (k=8 chars) gets a rolling
    // Karp–Rabin hash (the native `winnowfp` expression,
    // plans/WinnowFingerprints.scala — VERDICT r7 #1 replaced the
    // md5-per-position SQL form that cost O(n) md5 calls per doc with
    // the O(n)-total rolling recurrence MOSS itself prescribes), each
    // sliding window of w=4 consecutive hashes contributes its minimum,
    // and the doc's fingerprint set is the distinct selected values.
    // The POSITIONAL guarantee (vs the min-shingle's): any verbatim-
    // shared substring of length ≥ w+k−1 = 11 chars spans a full
    // identical window in both docs, whose min is selected in both —
    // the shared fingerprint always reaches the index (WinnowSpec
    // plants one). REPORTED pairs are gated further: a fingerprint in
    // > 20 docs is stop-listed (boilerplate 8-grams carry no pair
    // signal — MOSS's rule, bounding bucket fanout like q21's band
    // caps), and a pair must share ≥ 3 distinct surviving fingerprints
    // — so an overlap near the 11-char minimum (~1 fingerprint) or one
    // made only of boilerplate is intentionally NOT reported. All
    // arithmetic is integer (mod 2^31−1 recurrence) — the oracle
    // replays it bit-for-bit as nested positional mod-steps. At 100 TB:
    // fingerprints are ~2L/(w+1) small longs per doc (the only thing
    // shuffled — never text), the index join is hash-distributable, the
    // df gate runs map-combined before any pair exists, and the gated
    // index is materialized ONCE per run (Shared.frame) instead of
    // re-hashing the corpus for the df gate and both self-join sides.
    "q199_winnow_fingerprints" -> ((s, d) => {
      val idx = winnowIdx(s, d)
      idx.as("a")
        .join(idx.as("b"), col("a.fp") === col("b.fp")
          && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 3)
    }),

    // ---- EVAL-SET CONTAMINATION audit at exact substring grain (the
    // leg the decontam family was missing: q51/q127 match whole
    // n-gram/containment profiles, q149 LSH near-dup pairs, q116/q186
    // membership and embeddings — this one asks the question eval
    // benchmarks actually ask: "were this held-out doc's k-gram
    // WINDOWS seen in train?", PaLM/GPT-4-style, via the q199 winnow
    // fingerprint index). Docs split 80/10/10 by the q59/q149 id-hash
    // convention; an eval doc is contaminated when ≥ 3 of its rare
    // winnow fingerprints (the q199 match rule) also occur anywhere in
    // train. Scale: rides the ONE shared winnow index (df-capped, so
    // per-fp fanout is bounded); the train side collapses to a
    // distinct-fp semi-join key set — no doc×doc pair frame is ever
    // built, unlike q199's pair materialization; folds to 2 rows.
    // Only fingerprintable docs (length ≥ k+w−1) are in scope, same
    // as q199 — but the DENOMINATOR is all fingerprintable eval docs,
    // pre-df-cap (ADVICE r9): a heavily-templated doc whose EVERY
    // fingerprint is df-capped out is exactly the contamination-prone
    // case, so it must stay in n_docs; its count is reported as
    // n_all_common so the audit shows how many docs the rare-fp rule
    // could not see at all.
    "q233_eval_contamination" -> ((s, d) => {
      val splitOf =
        when(SamplingQueries.hashBucket("doc_id", 1, 100) < 80,
          lit("train"))
          .when(SamplingQueries.hashBucket("doc_id", 1, 100) < 90,
            lit("val"))
          .otherwise(lit("test"))
      val withSplit = winnowIdx(s, d).withColumn("split", splitOf)
      val trainFps = withSplit.filter(col("split") === "train")
        .select(col("fp")).distinct()
      val evalRows = withSplit.filter(col("split") =!= "train")
      val hits = evalRows.join(trainFps, Seq("fp"), "left_semi")
        .groupBy(col("split"), col("doc_id"))
        .agg(count(lit(1)).as("n_hit"))
      // ≥1 rare fp survived the df cap — distinct from having a hit
      val inIdx = evalRows.select(col("split"), col("doc_id")).distinct()
        .withColumn("has_rare", lit(1L))
      Tables.documents(s, d)
        .filter(length(col("text")) >= WinnowK + WinnowW - 1)
        .select(col("doc_id")).withColumn("split", splitOf)
        .filter(col("split") =!= "train")
        .join(hits, Seq("split", "doc_id"), "left_outer")
        .join(inIdx, Seq("split", "doc_id"), "left_outer")
        .select(col("split"), coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          coalesce(col("has_rare"), lit(0L)).as("has_rare"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_hit") >= 3, 1L).otherwise(0L))
            .as("n_contaminated"),
          sum(col("n_hit")).as("n_hit_fps"),
          sum(lit(1L) - col("has_rare")).as("n_all_common"))
        .select(col("split"), col("n_docs"), col("n_contaminated"),
          expr("n_contaminated * 1000000 div n_docs")
            .as("contaminated_ppm"),
          col("n_hit_fps"), col("n_all_common"))
    }),

    // ---- DUP-GRAPH DEGREE PROFILE (hub audit): per-document candidate-
    // pair degree over the run-shared LSH pair frame, folded to a
    // bit-length-octave histogram (the q157/q213 no-libm log2 idiom).
    // The read BEFORE q62 materializes clusters and q261 audits their
    // density: a heavy-tailed degree profile (hub docs in many pairs)
    // predicts both banding blow-up (one hot bucket emits C(m,2) pairs)
    // and chain-merged clusters — uniform low degree licenses the cheap
    // per-shard dedup, hubs demand the cap/salting machinery. Scale:
    // no new pairs (rides sharedCandidatePairs), degree fold at doc
    // grain, octave fold to ≤ 32 rows; only (doc_id) longs shuffle.
    "q262_dup_degree_profile" -> ((s, d) => {
      val deg = sharedCandidatePairs(s, d)
        .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("degree"))
      deg.groupBy(length(bin(col("degree"))).cast("long")
          .as("deg_octave"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("degree")).as("min_degree"),
          max(col("degree")).as("max_degree"),
          sum(col("degree")).as("sum_degree"))
    }),

    // ---- BAG-OF-WORDS dedup delta (reorder-canonical families): how
    // many exact-dup families MERGE when the canonical key ignores word
    // ORDER (sorted-token fingerprint)? Shuffled near-clones — template
    // expansions, list reorderings — share a bag-of-words but never an
    // exact digest, so they slip the q20 gate while carrying no new
    // content; this one-row delta says whether that family is worth a
    // dedup stage before the (much costlier) MinHash pass. Scale: two
    // map-side digests per doc (raw md5 + sorted-token md5 — the sort
    // is in-row, bounded by doc length), then two digest-grain
    // aggregates; bodies never shuffle, 16-byte digests do.
    "q264_bow_dedup_delta" -> ((s, d) => {
      val fams = Tables.documents(s, d).select(
        md5(col("text").cast("binary")).as("raw"),
        md5(array_join(sort_array(split(col("text"), " ")), " ")
          .cast("binary")).as("bow"))
      fams.groupBy(col("bow"))
        .agg(countDistinct(col("raw")).as("n_raw"),
          count(lit(1)).as("nd"))
        .agg(sum(col("nd")).as("n_docs"),
          count(lit(1)).as("n_bow_families"),
          // every raw family lives in exactly one bow family (same
          // text ⇒ same sorted text), so this sum is the global raw
          // family count
          sum(col("n_raw")).as("n_raw_families"),
          sum(when(col("n_raw") >= 2, 1L).otherwise(0L))
            .as("n_merged_families"),
          sum(when(col("n_raw") >= 2, col("nd")).otherwise(0L))
            .as("n_docs_in_merged"))
    }),

    // ---- PER-SOURCE VERBATIM DUP-MASS profile: each source's share of
    // 8-word blocks (q139's scrub grain) that occur in ≥ 2 documents
    // corpus-wide, plus how many of its docs are MAJORITY-duplicated
    // (2·dup > blocks — more copied than original). This ranks sources
    // for dedup DEPLOYMENT — q139 rewrites docs, q140 finds per-source
    // boilerplate, this says WHERE the dup mass lives and which sources
    // to scrub first (the RefinedWeb-style duplicate-text-fraction read
    // at source grain). Scale: block inventory shuffles (digest,
    // doc_id) only; the dup set is digest-grain; both folds are
    // map-combinable; dup_ppm is one integral division of two exact
    // longs.
    "q265_source_dup_mass" -> ((s, d) => {
      val B = 8
      val bl = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          split(col("text"), " ").as("words"))
        .withColumn("btext", explode(expr(
          s"transform(sequence(0, (size(words)-1) div $B)," +
            s" i -> array_join(slice(words, i*$B + 1, $B), ' '))")))
        .select(col("doc_id"), col("source"),
          md5(col("btext").cast("binary")).as("h"))
      val dupH = bl.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("ndd"))
        .filter(col("ndd") >= 2)
        .select(col("h"), lit(1L).as("isdup"))
      val perDoc = bl.join(dupH, Seq("h"), "left")
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_blocks"),
          sum(coalesce(col("isdup"), lit(0L))).as("n_dup"))
      perDoc.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_blocks")).as("n_blocks"),
          sum(col("n_dup")).as("n_dup_blocks"),
          expr("(sum(n_dup) * 1000000) div sum(n_blocks)")
            .as("dup_ppm"),
          sum(when(col("n_dup") * 2 > col("n_blocks"), 1L)
            .otherwise(0L)).as("n_majority_dup_docs"))
    })
  )

  /** q22/q256 shared within-(lang, source) exact trigram pair stats:
    * (doc_a, doc_b, inter, na, nb) for every block pair sharing ≥ 1
    * non-hot trigram. One run-shared artifact (Shared.frame) — q22
    * reads the Jaccard off it, q256 sweeps thresholds over it.
    *
    * Hash each trigram BEFORE the first shuffle — the dedup + group-by
    * exchanges then move fixed-width keys, not ~20-char strings.
    * Default: xxhash64 (8 bytes). Collision caveat: with ~1e12
    * distinct trigrams at 100 TB, 64-bit hashing expects tens of
    * thousands of colliding trigram PAIRS by the birthday bound
    * (~n²/2⁶⁵) — vanishing as a fraction of set sizes (any one doc's
    * Jaccard moves by at most a few shingles) but not "probability
    * ~0". Opt-in exact mode (spark.graft.text.exactTrigrams=true)
    * keys on unhex(md5) — 128 bits, where the same bound is ~n²/2¹²⁹
    * ≈ never — for pipelines that need exact set semantics at full
    * scale, at the cost of 16-byte instead of 8-byte shuffle keys.
    * The oracle compares exact STRINGS either way, so both modes must
    * (and do) produce identical pairs at test scale.
    *
    * Instead of a trigram self-join (sort-merge on wide keys, two
    * shuffles of the exploded frame), group each trigram's doc list
    * once and emit ordered pairs in-row: one shuffle of the trigrams,
    * then a shuffle of id-pairs only. Skew bound is ENFORCED, not
    * advisory: a trigram shared by m docs in a block emits C(m,2)
    * pairs from one grouped row, so trigrams with block
    * document-frequency > HotDf are dropped before pair emission
    * (stopword-ish shingles carry no similarity signal anyway).
    * Per-doc counts na/nb are taken over the same pruned universe, so
    * the Jaccard stays internally consistent — and the worst per-row
    * fan-out is C(HotDf,2), independent of corpus clone density. The
    * oracle mirrors the prune exactly.
    */
  private def ngramPairStats(s: SparkSession, d: String): DataFrame = {
    val exactMode = s.conf.getOption("spark.graft.text.exactTrigrams")
      .exists(_.toBoolean)
    // the mode is part of the cache key (the lsh_pairs_raw discipline):
    // flipping the conf mid-session must rebuild, not serve the other
    // mode's cached frame
    val cacheKey =
      if (exactMode) "ngram_pair_stats_md5" else "ngram_pair_stats"
    Shared.frame(s, cacheKey, d) {
      val docs = Tables.documents(s, d)
      val triKey =
        if (exactMode) unhex(md5(col("sh"))) else xxhash64(col("sh"))
      val tri = Text.wordShingles(docs, "doc_id", "text", 3,
          dedup = false, carryCols = Seq("lang", "source"))
        .select(col("doc_id"), col("lang"), col("source"),
          triKey.as("tri"))
        .distinct()
      // one grouped pass serves both the df prune and pair emission;
      // `n` re-derives per-doc set sizes from the pruned groups (ids
      // are longs — re-exploding them is cheaper than a second shuffle
      // of the full trigram frame)
      val grouped = tri
        .groupBy(col("lang"), col("source"), col("tri"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) <= Text.HotDf)
      val n = grouped
        .select(explode(col("ids")).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val pairs = grouped
        .filter(size(col("ids")) > 1)
        .select(explode(expr(
          """flatten(transform(ids, (a, i) ->
            |  transform(slice(ids, i + 2, size(ids) - i - 1),
            |    b -> struct(a AS doc_a, b AS doc_b))))""".stripMargin))
          .as("p"))
        .select(col("p.doc_a"), col("p.doc_b"))
      val inter = pairs.groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(n.select(col("doc_id").as("doc_a"), col("n").as("na")),
          "doc_a")
        .join(n.select(col("doc_id").as("doc_b"), col("n").as("nb")),
          "doc_b")
    }
  }

  /** q199/q233 shared winnow-fingerprint index: per doc, its DISTINCT
    * winnowed k-gram fingerprints, df-capped to kill stop-fingerprints
    * (WinnowMaxDf — the q21-family hot-bucket discipline). One shared,
    * persisted artifact per run, exactly like sharedCandidatePairs.
    */
  private def winnowIdx(s: SparkSession, d: String): DataFrame =
    Shared.frame(s, "winnow_idx", d) {
      val fps = Tables.documents(s, d)
        .filter(length(col("text")) >= WinnowK + WinnowW - 1)
        .select(col("doc_id"),
          explode(expr(s"winnowfp(text, $WinnowK, $WinnowW)")).as("fp"))
      val rare = fps.groupBy(col("fp"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") <= WinnowMaxDf)
        .select(col("fp"))
      fps.join(rare, "fp")
    }

  // q204 PII patterns, pinned for the oracle — character classes +
  // greedy repetition only, so Java regex and RE2 agree exactly
  private val PiiEmailRe =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
  private val PiiLongNumRe = "[0-9]{9,}"

  // q199 winnowing parameters, pinned for the oracle: k-gram width,
  // window width, stop-fingerprint doc-frequency cap. (fps is distinct
  // per doc, so count(*) per fp below IS the doc frequency.)
  private val WinnowK = 8
  private val WinnowW = 4
  private val WinnowMaxDf = 20

  // q134 quantization scale, pinned for the oracle
  private val SurpScale = 10000L

  /** DuckDB replay of the winnowfp k-gram hash at position `i` (1-based):
    * h = fold(j = 0..k−1: h ← (h·257 + codepoint(i+j)) mod 2^31−1),
    * expanded to k nested integer mod-steps. `ascii` in DuckDB returns
    * the Unicode code point, matching the Scala side's codePoints().
    */
  private lazy val winnowHashSql: String =
    (1 until WinnowK).foldLeft(
      "(CAST(ascii(substr(text, i, 1)) AS BIGINT) % 2147483647)") {
      (acc, j) =>
        s"(($acc * 257 + ascii(substr(text, i + $j, 1))) % 2147483647)"
    }

  private lazy val simhashSql: String = {
    val bitSums = (0 until 32).map { j =>
      s"sum(CASE WHEN ((strpos('0123456789abcdef', " +
        s"substr(h, ${j / 4 + 1}, 1)) - 1) >> ${j % 4}) & 1 = 1 " +
        s"THEN 1 ELSE -1 END) AS s$j"
    }.mkString(",\n  ")
    val fp = (0 until 32)
      .map(j => s"(CASE WHEN s$j > 0 THEN CAST(${1L << j} AS BIGINT) " +
        "ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, md5(unnest(string_split(text, ' ')))
      |    AS h FROM documents),
      |agged AS (SELECT doc_id,
      |  $bitSums
      |  FROM tok GROUP BY doc_id)
      |SELECT doc_id, CAST($fp AS BIGINT) AS simhash
      |FROM agged""".stripMargin
  }

  private def minCols(n: Int): String =
    (0 until n).map(i => s"min(ha + $i * hb) AS m$i").mkString(",\n  ")

  private def bandRows(bands: Int, rows: Int): String =
    (0 until bands).map { b =>
      val parts = (0 until rows).map(r => s"m${b * rows + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws('|', $parts)) AS h FROM wide"
    }.mkString("\n  UNION ALL ")

  // the (doc_id, band, h) LSH band rows — shared by the pair set below
  // and SamplingQueries' q87, whose oracle applies a bucket-size cap
  // BEFORE pairing (DuckDB accepts a nested WITH in a CTE body)
  private[queries] lazy val minhashBandsSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |sh AS (SELECT doc_id,
      |    concat_ws(' ', tk[p], tk[p+1], tk[p+2]) AS sh
      |  FROM (SELECT doc_id, tk,
      |      unnest(generate_series(1, greatest(len(tk)-2, 1))) AS p
      |    FROM toks)),
      |hashed AS (SELECT doc_id,
      |    CAST(concat('0x', substr(md5(sh), 1, 10)) AS BIGINT) AS ha,
      |    CAST(concat('0x', substr(md5(sh), 17, 10)) AS BIGINT) AS hb
      |  FROM sh),
      |wide AS (SELECT doc_id,
      |  ${minCols(16)}
      |  FROM hashed GROUP BY doc_id)
      |${bandRows(4, 4)}""".stripMargin

  // shared with SamplingQueries (q62 clusters over the same pair set)
  private[queries] lazy val minhashPairsSql: String =
    s"""WITH bh AS (
      |${minhashBandsSql})
      |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |FROM bh a JOIN bh b
      |  ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id""".stripMargin

  private def lshTuningOracle: String = {
    def candCte(name: String, bandCte: String): String =
      s"""$name AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM $bandCte a JOIN $bandCte b
         |    ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id)"""
        .stripMargin
    def cfgSelect(cand: String, b: Int, r: Int): String =
      s"""SELECT CAST($b AS INT) AS bands, CAST($r AS INT)
         |    AS rows_per_band,
         |  CAST(count(*) AS BIGINT) AS n_cand,
         |  CAST(coalesce(sum(CASE WHEN t.is_true THEN 1 ELSE 0 END), 0)
         |    AS BIGINT) AS n_true
         |FROM $cand c JOIN truth t USING (doc_a, doc_b)""".stripMargin
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |shr AS (SELECT doc_id,
       |    concat_ws(' ', tk[p], tk[p+1], tk[p+2]) AS sh
       |  FROM (SELECT doc_id, tk,
       |      unnest(generate_series(1, greatest(len(tk)-2, 1))) AS p
       |    FROM toks)),
       |sh AS (SELECT DISTINCT doc_id, sh FROM shr),
       |hashed AS (SELECT doc_id,
       |    CAST(concat('0x', substr(md5(sh), 1, 10)) AS BIGINT) AS ha,
       |    CAST(concat('0x', substr(md5(sh), 17, 10)) AS BIGINT) AS hb
       |  FROM sh),
       |wide AS (SELECT doc_id,
       |  ${minCols(16)}
       |  FROM hashed GROUP BY doc_id),
       |nsh AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh
       |  FROM sh GROUP BY 1),
       |b2 AS (${bandRows(2, 8)}),
       |b4 AS (${bandRows(4, 4)}),
       |b8 AS (${bandRows(8, 2)}),
       |${candCte("c2", "b2")},
       |${candCte("c4", "b4")},
       |${candCte("c8", "b8")},
       |u AS (SELECT * FROM c2 UNION SELECT * FROM c4
       |  UNION SELECT * FROM c8),
       |iv AS (SELECT u.doc_a, u.doc_b, count(*) AS inter
       |  FROM u JOIN sh x ON x.doc_id = u.doc_a
       |  JOIN sh y ON y.doc_id = u.doc_b AND y.sh = x.sh
       |  GROUP BY 1, 2),
       |truth AS (SELECT u.doc_a, u.doc_b,
       |    (coalesce(iv.inter, 0) * 3 >= na.n_sh + nb.n_sh) AS is_true
       |  FROM u JOIN nsh na ON na.doc_id = u.doc_a
       |  JOIN nsh nb ON nb.doc_id = u.doc_b
       |  LEFT JOIN iv ON iv.doc_a = u.doc_a AND iv.doc_b = u.doc_b),
       |tu AS (SELECT CAST(coalesce(sum(CASE WHEN is_true THEN 1
       |    ELSE 0 END), 0) AS BIGINT) AS n_true_union FROM truth),
       |cfg AS (
       |${cfgSelect("c2", 2, 8)}
       |UNION ALL
       |${cfgSelect("c4", 4, 4)}
       |UNION ALL
       |${cfgSelect("c8", 8, 2)})
       |SELECT bands, rows_per_band, n_cand, n_true, tu.n_true_union,
       |  tu.n_true_union - n_true AS n_missed
       |FROM cfg, tu""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q170_lsh_tuning" -> lshTuningOracle,

    "q190_prefix_filter_join" ->
      """WITH toks AS (SELECT DISTINCT doc_id,
        |    CAST(concat('0x', substr(md5(sh), 1, 15)) AS BIGINT) AS tok
        |  FROM (
        |    SELECT doc_id, concat_ws(' ', tk[p], tk[p+1]) AS sh
        |    FROM (SELECT doc_id, string_split(text, ' ') AS tk
        |      FROM documents),
        |      unnest(generate_series(1, greatest(len(tk) - 1, 1))) t(p))),
        |f AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
        |  FROM toks GROUP BY 1),
        |r AS (SELECT t.doc_id, t.tok,
        |    row_number() OVER (PARTITION BY t.doc_id
        |      ORDER BY f.df ASC, t.tok ASC) AS idx,
        |    CAST(count(*) OVER (PARTITION BY t.doc_id) AS BIGINT) AS na
        |  FROM toks t JOIN f USING (tok)),
        |p AS (SELECT tok, doc_id, na FROM r
        |  WHERE idx <= na - (na * 4 + 4) // 5 + 1),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.na AS na, b.na AS nb
        |  FROM p a JOIN p b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |  WHERE least(a.na, b.na) * 5 >= greatest(a.na, b.na) * 4),
        |iv AS (SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT)
        |    AS inter
        |  FROM cand c JOIN toks x ON x.doc_id = c.doc_a
        |  JOIN toks y ON y.doc_id = c.doc_b AND y.tok = x.tok
        |  GROUP BY 1, 2)
        |SELECT c.doc_a, c.doc_b, iv.inter, c.na, c.nb
        |FROM cand c JOIN iv USING (doc_a, doc_b)
        |WHERE iv.inter * 9 >= (c.na + c.nb) * 4""".stripMargin,

    // RAW-semantics replay of the staged incremental probe: band rows
    // for all docs (the shared 4×4 fragment), split by the batch hash,
    // candidates joined band-for-band, trigram-Jaccard verified — the
    // parity match itself proves the canonical staging lossless
    "q196_incremental_neardup" ->
      s"""WITH bh AS (
        |$minhashBandsSql),
        |spl AS (SELECT doc_id,
        |    (${SamplingQueries.hashBucketSql("doc_id", 21, 10)} = 7)
        |      AS is_batch
        |  FROM documents),
        |cand AS (SELECT DISTINCT a.doc_id AS bid, b.doc_id AS cid2
        |  FROM bh a JOIN spl sa ON sa.doc_id = a.doc_id AND sa.is_batch
        |  JOIN bh b ON a.band = b.band AND a.h = b.h
        |  JOIN spl sb ON sb.doc_id = b.doc_id AND NOT sb.is_batch),
        |tri AS (SELECT DISTINCT doc_id,
        |    concat_ws(' ', tk[p], tk[p+1], tk[p+2]) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS tk
        |      FROM documents),
        |    unnest(generate_series(1, greatest(len(tk) - 2, 1))) t(p)),
        |ns AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
        |  FROM tri GROUP BY 1),
        |iv AS (SELECT c.bid, c.cid2, CAST(count(*) AS BIGINT) AS inter
        |  FROM cand c JOIN tri x ON x.doc_id = c.bid
        |  JOIN tri y ON y.doc_id = c.cid2 AND y.sh = x.sh
        |  GROUP BY 1, 2),
        |vf AS (SELECT c.bid, c.cid2,
        |    (coalesce(iv.inter, 0) * 3 >= na.n + nb.n) AS ok
        |  FROM cand c
        |  LEFT JOIN iv ON iv.bid = c.bid AND iv.cid2 = c.cid2
        |  JOIN ns na ON na.doc_id = c.bid
        |  JOIN ns nb ON nb.doc_id = c.cid2),
        |ag AS (SELECT bid, CAST(count(*) AS BIGINT) AS n_cand,
        |    CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_verified,
        |    min(CASE WHEN ok THEN cid2 END) AS bm
        |  FROM vf GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(ag.n_cand, 0) AS BIGINT) AS n_cand,
        |  CAST(coalesce(ag.n_verified, 0) AS BIGINT) AS n_verified,
        |  CAST(coalesce(ag.bm, -1) AS BIGINT) AS best_match,
        |  (coalesce(ag.n_verified, 0) > 0) AS is_neardup
        |FROM documents d
        |JOIN spl ON spl.doc_id = d.doc_id AND spl.is_batch
        |LEFT JOIN ag ON ag.bid = d.doc_id""".stripMargin,

    "q232_effective_sample_size" ->
      """WITH d AS (SELECT doc_id, source, md5(text) AS h
        |  FROM documents),
        |g AS (SELECT h, CAST(count(*) AS BIGINT) AS dup_count
        |  FROM d GROUP BY h),
        |w AS (SELECT d.source, 1000000 // g.dup_count AS w
        |  FROM d JOIN g ON d.h = g.h),
        |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(w) AS BIGINT) AS sw,
        |    CAST(sum(CAST(w AS HUGEINT) * w) AS HUGEINT) AS sww
        |  FROM w GROUP BY source)
        |SELECT source, n_docs,
        |  CAST((CAST(sw AS HUGEINT) * sw * 1000) // sww AS BIGINT)
        |    AS ess_x1000,
        |  CAST((CAST(n_docs AS HUGEINT) * sww * 1000)
        |    // (CAST(sw AS HUGEINT) * sw) AS BIGINT) AS deff_x1000
        |FROM a""".stripMargin,

    "q193_soft_dedup_weights" ->
      """WITH d AS (SELECT doc_id, md5(text) AS h,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        |  FROM documents),
        |g AS (SELECT h, CAST(count(*) AS BIGINT) AS dup_count
        |  FROM d GROUP BY 1)
        |SELECT doc_id, dup_count,
        |  1000000 // dup_count AS weight_x1e6,
        |  CAST(toks * (1000000 // dup_count) AS BIGINT)
        |    AS weighted_tokens_x1e6
        |FROM d JOIN g USING (h)""".stripMargin,

    "q259_effective_mixture" ->
      """WITH d AS (SELECT doc_id, source, md5(text) AS h,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        |  FROM documents),
        |g AS (SELECT h, CAST(count(*) AS BIGINT) AS dup_count
        |  FROM d GROUP BY 1),
        |per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(toks) AS BIGINT) AS raw_tokens,
        |    CAST(sum(CAST(toks * (1000000 // dup_count) AS HUGEINT))
        |      AS HUGEINT) AS wt_mass
        |  FROM d JOIN g USING (h) GROUP BY 1),
        |tot AS (SELECT CAST(sum(raw_tokens) AS HUGEINT) AS tot_raw,
        |    CAST(sum(wt_mass) AS HUGEINT) AS tot_wt
        |  FROM per)
        |SELECT per.source, per.n_docs, per.raw_tokens,
        |  CAST((CAST(per.raw_tokens AS HUGEINT) * 1000000)
        |    // tot.tot_raw AS BIGINT) AS raw_ppm,
        |  CAST((per.wt_mass * 1000000) // tot.tot_wt AS BIGINT)
        |    AS eff_ppm,
        |  CAST((per.wt_mass * 1000000) // tot.tot_wt AS BIGINT)
        |    - CAST((CAST(per.raw_tokens AS HUGEINT) * 1000000)
        |      // tot.tot_raw AS BIGINT) AS shift_ppm
        |FROM per, tot""".stripMargin,

    "q173_dedup_savings" ->
      s"""WITH pairs AS ($minhashPairsSql),
        |dropped AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
        |d AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
        |    doc_id IN (SELECT doc_id FROM dropped) AS is_dup
        |  FROM documents)
        |SELECT source, count(*) AS docs_total,
        |  CAST(sum(CASE WHEN is_dup THEN 0 ELSE 1 END) AS BIGINT)
        |    AS docs_kept,
        |  CAST(sum(toks) AS BIGINT) AS tokens_total,
        |  CAST(sum(CASE WHEN is_dup THEN 0 ELSE toks END) AS BIGINT)
        |    AS tokens_kept,
        |  CAST(sum(CASE WHEN is_dup THEN 0 ELSE toks END) AS DOUBLE)
        |    / CAST(sum(toks) AS DOUBLE) AS kept_share
        |FROM d GROUP BY source""".stripMargin,

    "q129_bm25_topk" ->
      s"""WITH toks AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS tok FROM documents),
        |lens AS (SELECT doc_id, count(*) AS len FROM toks
        |  GROUP BY doc_id),
        |stats AS (SELECT count(*) AS nd,
        |    CAST(sum(len) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |      AS avglen
        |  FROM lens),
        |qterms AS (SELECT tok FROM (
        |    SELECT tok, count(*) AS c FROM toks GROUP BY tok
        |    ORDER BY c DESC, tok ASC LIMIT 5)),
        |tf AS (SELECT t.doc_id, t.tok, count(*) AS tf FROM toks t
        |  JOIN qterms q ON t.tok = q.tok GROUP BY t.doc_id, t.tok),
        |dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |scored AS (
        |  SELECT tf.doc_id,
        |    CAST(floor(${bm25Term("st.nd", "dft.df", "tf.tf",
            "lens.len", "st.avglen")}) AS BIGINT) AS si
        |  FROM tf JOIN dft USING (tok) JOIN lens USING (doc_id),
        |    stats st)
        |SELECT doc_id, CAST(sum(si) AS BIGINT) AS score FROM scored
        |GROUP BY doc_id
        |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,

    "q20_dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id,
        |  count(*) AS dup_count
        |FROM documents GROUP BY md5(text)""".stripMargin,

    "q21_minhash_pairs" -> minhashPairsSql,

    "q224_dup_provenance" ->
      s"""WITH pairs AS ($minhashPairsSql),
        |p AS (SELECT pa.source AS src_a, pb.source AS src_b
        |  FROM pairs
        |  JOIN documents pa ON pairs.doc_a = pa.doc_id
        |  JOIN documents pb ON pairs.doc_b = pb.doc_id),
        |w AS (SELECT src_a AS source, CAST(count(*) AS BIGINT)
        |    AS n_within
        |  FROM p WHERE src_a = src_b GROUP BY src_a),
        |x AS (SELECT source, CAST(count(*) AS BIGINT) AS n_cross
        |  FROM (SELECT src_a AS source FROM p WHERE src_a <> src_b
        |    UNION ALL SELECT src_b FROM p WHERE src_a <> src_b)
        |  GROUP BY source)
        |SELECT coalesce(w.source, x.source) AS source,
        |  CAST(coalesce(w.n_within, 0) AS BIGINT) AS n_within,
        |  CAST(coalesce(x.n_cross, 0) AS BIGINT) AS n_cross
        |FROM w FULL OUTER JOIN x ON w.source = x.source""".stripMargin,

    "q112_neardup_flags" ->
      s"""WITH bh AS (
        |${minhashBandsSql}),
        |own AS (SELECT band, h, min(doc_id) AS matched_id
        |  FROM bh GROUP BY band, h)
        |SELECT b.doc_id, b.band, o.matched_id
        |FROM bh b JOIN own o ON b.band = o.band AND b.h = o.h
        |WHERE b.doc_id <> o.matched_id""".stripMargin,

    "q96_incremental_dedup" ->
      s"""WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |sh AS (SELECT doc_id,
        |    concat_ws(' ', tk[p], tk[p+1], tk[p+2]) AS sh
        |  FROM (SELECT doc_id, tk,
        |      unnest(generate_series(1, greatest(len(tk)-2, 1))) AS p
        |    FROM toks)),
        |hashed AS (SELECT doc_id,
        |    CAST(concat('0x', substr(md5(sh), 1, 10)) AS BIGINT) AS ha,
        |    CAST(concat('0x', substr(md5(sh), 17, 10)) AS BIGINT) AS hb
        |  FROM sh),
        |wide AS (SELECT doc_id,
        |  ${minCols(16)}
        |  FROM hashed GROUP BY doc_id),
        |bh AS (
        |  ${bandRows(4, 4)}),
        |pairs AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS old_id
        |  FROM bh a JOIN bh b ON a.band = b.band AND a.h = b.h
        |  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0)
        |SELECT new_id, count(*) AS n_dups, min(old_id) AS first_dup
        |FROM pairs GROUP BY new_id""".stripMargin,

    "q38_neardup_dedup" ->
      s"""WITH pairs AS ($minhashPairsSql)
        |SELECT doc_id, lang, source FROM documents
        |WHERE doc_id NOT IN (SELECT doc_b FROM pairs)""".stripMargin,

    "q22_ngram_jaccard" ->
      s"""WITH toks AS (SELECT doc_id, lang, source,
        |    string_split(text, ' ') AS tk FROM documents),
        |tri0 AS (SELECT DISTINCT doc_id, lang, source,
        |    concat_ws(' ', tk[p], tk[p+1], tk[p+2]) AS tri
        |  FROM (SELECT doc_id, lang, source, tk,
        |      unnest(generate_series(1, greatest(len(tk)-2, 1))) AS p
        |    FROM toks)),
        |df AS (SELECT lang, source, tri, count(*) AS df
        |  FROM tri0 GROUP BY 1, 2, 3),
        |tri AS (SELECT t.doc_id, t.lang, t.source, t.tri
        |  FROM tri0 t JOIN df USING (lang, source, tri)
        |  WHERE df.df <= ${graft.functions.Text.HotDf}),
        |n AS (SELECT doc_id, count(*) AS n FROM tri GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    count(*) AS inter
        |  FROM tri a JOIN tri b
        |    ON a.lang = b.lang AND a.source = b.source AND a.tri = b.tri
        |      AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT doc_a, doc_b, inter,
        |  (inter / (na.n + nb.n - inter)) AS jac
        |FROM inter
        |JOIN n na ON na.doc_id = doc_a
        |JOIN n nb ON nb.doc_id = doc_b
        |WHERE inter >= 3""".stripMargin,

    "q256_dedup_threshold_curve" ->
      s"""WITH toks AS (SELECT doc_id, lang, source,
        |    string_split(text, ' ') AS tk FROM documents),
        |tri0 AS (SELECT DISTINCT doc_id, lang, source,
        |    concat_ws(' ', tk[p], tk[p+1], tk[p+2]) AS tri
        |  FROM (SELECT doc_id, lang, source, tk,
        |      unnest(generate_series(1, greatest(len(tk)-2, 1))) AS p
        |    FROM toks)),
        |df AS (SELECT lang, source, tri, count(*) AS df
        |  FROM tri0 GROUP BY 1, 2, 3),
        |tri AS (SELECT t.doc_id, t.lang, t.source, t.tri
        |  FROM tri0 t JOIN df USING (lang, source, tri)
        |  WHERE df.df <= ${graft.functions.Text.HotDf}),
        |n AS (SELECT doc_id, count(*) AS n FROM tri GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    count(*) AS inter
        |  FROM tri a JOIN tri b
        |    ON a.lang = b.lang AND a.source = b.source AND a.tri = b.tri
        |      AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |stats AS (SELECT doc_a, doc_b, inter, na.n AS na, nb.n AS nb
        |  FROM inter
        |  JOIN n na ON na.doc_id = doc_a
        |  JOIN n nb ON nb.doc_id = doc_b
        |  WHERE inter >= 3),
        |axis AS (SELECT unnest(generate_series(30, 90, 10)) AS t),
        |pass AS (SELECT axis.t, s.doc_a, s.doc_b
        |  FROM stats s JOIN axis
        |    ON s.inter * (100 + axis.t) >= axis.t * (s.na + s.nb)),
        |np AS (SELECT t, CAST(count(*) AS BIGINT) AS n_pairs
        |  FROM pass GROUP BY 1),
        |nd AS (SELECT t, CAST(count(DISTINCT doc) AS BIGINT) AS n_docs
        |  FROM (SELECT t, doc_a AS doc FROM pass
        |        UNION ALL SELECT t, doc_b FROM pass)
        |  GROUP BY 1)
        |SELECT CAST(axis.t AS BIGINT) AS threshold_pct,
        |  coalesce(np.n_pairs, 0) AS n_pairs,
        |  coalesce(nd.n_docs, 0) AS n_docs_flagged
        |FROM axis
        |LEFT JOIN np ON axis.t = np.t
        |LEFT JOIN nd ON axis.t = nd.t""".stripMargin,

    "q23_simhash" -> simhashSql,

    "q34_simhash_knn" ->
      s"""WITH fp AS ($simhashSql),
        |q AS (SELECT simhash AS qfp FROM fp WHERE doc_id = 0)
        |SELECT f.doc_id,
        |  CAST(bit_count(xor(f.simhash, q.qfp)) AS INT) AS dist
        |FROM fp f, q
        |WHERE f.doc_id <> 0
        |ORDER BY dist ASC, f.doc_id ASC
        |LIMIT 20""".stripMargin,

    "q24_token_stats" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INT) AS chars,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
        |    AS INT) AS bpe_tokens,
        |  ((length(text) - (len(string_split(text, ' ')) - 1))
        |    / len(string_split(text, ' '))) AS avg_token_len
        |FROM documents""".stripMargin,

    "q25_lang_id" ->
      s"""SELECT doc_id, stop_hits, n_tokens,
        |  CASE WHEN stop_hits / n_tokens >= 0.03 THEN 'en' ELSE 'other' END
        |    AS pred_lang
        |FROM (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN tok IN ($stopwordsSql) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS stop_hits,
        |    count(*) AS n_tokens
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |  GROUP BY doc_id)""".stripMargin,

    "q26_quality_score" ->
      s"""WITH t AS (
        |  SELECT doc_id, chars, count(*) AS n_tokens,
        |    count(DISTINCT tok) AS uniq_tokens,
        |    CAST(sum(CASE WHEN tok IN ($stopwordsSql) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS stop_hits
        |  FROM (SELECT doc_id, CAST(length(text) AS INT) AS chars,
        |      unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |  GROUP BY doc_id, chars)
        |SELECT doc_id, chars, n_tokens, uniq_tokens,
        |  (uniq_tokens / n_tokens) AS uniq_ratio,
        |  (stop_hits / n_tokens) AS stop_ratio,
        |  (CASE WHEN chars BETWEEN 100 AND 500 THEN 1.0 ELSE 0.5 END * 0.5
        |    + (uniq_tokens / n_tokens) * 0.3
        |    + (stop_hits / n_tokens) * 0.2) AS score
        |FROM t""".stripMargin,

    "q88_bigram_lift" ->
      """WITH bi AS (
        |  SELECT tk[p] AS w1, tk[p+1] AS w2
        |  FROM (SELECT tk, unnest(generate_series(1,
        |      greatest(len(tk) - 1, 1))) AS p
        |    FROM (SELECT string_split(text, ' ') AS tk FROM documents))
        |  WHERE tk[p] IS NOT NULL AND tk[p+1] IS NOT NULL),
        |cxy AS (SELECT w1, w2, count(*) AS cxy FROM bi GROUP BY 1, 2),
        |cx AS (SELECT w1, count(*) AS cx FROM bi GROUP BY 1),
        |cy AS (SELECT w2, count(*) AS cy FROM bi GROUP BY 1),
        |n AS (SELECT count(*) AS nn FROM bi)
        |SELECT w1, w2, cxy,
        |  CAST(cxy * nn AS DOUBLE) / (cx * cy) AS lift
        |FROM cxy JOIN cx USING (w1) JOIN cy USING (w2), n
        |WHERE cxy >= 5
        |ORDER BY lift DESC, w1 ASC, w2 ASC
        |LIMIT 20""".stripMargin,

    // min-shingle hash = the winnowfp rolling recurrence replayed
    // positionally (same nested mod-steps as q199's oracle)
    "q27_fingerprint" ->
      s"""SELECT doc_id, md5(text) AS exact_fp,
        |  CASE WHEN length(text) >= 8 THEN
        |    list_min(list_transform(generate_series(1, length(text) - 7),
        |      i -> $winnowHashSql))
        |  ELSE NULL END AS min_shingle_fp
        |FROM documents""".stripMargin,

    "q134_bigram_surprisal" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
        |    FROM documents),
        |bg AS (SELECT doc_id, tk[i] AS w1,
        |    tk[i] || ' ' || tk[i + 1] AS bg
        |  FROM (SELECT doc_id, tk,
        |      unnest(generate_series(1, len(tk) - 1)) AS i FROM t)),
        |c2 AS (SELECT bg, CAST(count(*) AS BIGINT) AS cnt2
        |  FROM bg GROUP BY bg),
        |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS cnt1
        |  FROM bg GROUP BY w1),
        |sc AS (SELECT b.doc_id, (c2.cnt2 * $SurpScale) // c1.cnt1 AS s
        |  FROM bg b JOIN c2 USING (bg) JOIN c1 USING (w1))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(CAST(sum(s) AS BIGINT) // count(*) AS BIGINT)
        |    AS familiarity,
        |  (CAST(sum(s) AS BIGINT) // count(*)) < ${SurpScale / 5}
        |    AS flagged
        |FROM sc GROUP BY doc_id""".stripMargin,

    // same leftmost-greedy character-class patterns; DuckDB needs the
    // explicit 'g' flag where Spark's regexp_replace is global by
    // default; email redacts before digit runs on both engines
    "q204_pii_scrub" ->
      s"""SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '$PiiEmailRe'))
        |    AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '$PiiLongNumRe'))
        |    AS BIGINT) AS n_long_nums,
        |  CAST(length(regexp_replace(
        |    regexp_replace(text, '$PiiEmailRe', '<EMAIL>', 'g'),
        |    '$PiiLongNumRe', '<NUM>', 'g')) AS BIGINT) AS len_redacted
        |FROM documents""".stripMargin,

    // hash lambda = the winnowfp rolling recurrence replayed
    // POSITIONALLY: k nested (acc*257 + codepoint) % (2^31-1) steps —
    // integer-identical to plans/WinnowFingerprints.compute
    "q199_winnow_fingerprints" ->
      s"""WITH g AS (SELECT doc_id,
        |    list_transform(generate_series(1, length(text) - ${WinnowK - 1}),
        |      i -> $winnowHashSql) AS hs
        |  FROM documents WHERE length(text) >= ${WinnowK + WinnowW - 1}),
        |f AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(hs) - ${WinnowW - 1}),
        |    j -> list_min(list_slice(hs, j, j + ${WinnowW - 1}))))) AS fp
        |  FROM g),
        |rare AS (SELECT fp FROM f GROUP BY fp
        |  HAVING count(*) <= $WinnowMaxDf),
        |i AS (SELECT doc_id, fp FROM f JOIN rare USING (fp))
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  count(*) AS n_shared
        |FROM i a JOIN i b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 3""".stripMargin,

    "q233_eval_contamination" ->
      s"""WITH g AS (SELECT doc_id,
        |    list_transform(generate_series(1, length(text) - ${WinnowK - 1}),
        |      i -> $winnowHashSql) AS hs
        |  FROM documents WHERE length(text) >= ${WinnowK + WinnowW - 1}),
        |f AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(hs) - ${WinnowW - 1}),
        |    j -> list_min(list_slice(hs, j, j + ${WinnowW - 1}))))) AS fp
        |  FROM g),
        |rare AS (SELECT fp FROM f GROUP BY fp
        |  HAVING count(*) <= $WinnowMaxDf),
        |i AS (SELECT doc_id, fp FROM f JOIN rare USING (fp)),
        |wi AS (SELECT doc_id, fp, CASE
        |    WHEN ${SamplingQueries.hashBucketSql("doc_id", 1, 100)} < 80
        |      THEN 'train'
        |    WHEN ${SamplingQueries.hashBucketSql("doc_id", 1, 100)} < 90
        |      THEN 'val'
        |    ELSE 'test' END AS split
        |  FROM i),
        |tf AS (SELECT DISTINCT fp FROM wi WHERE split = 'train'),
        |ev AS (SELECT split, doc_id, fp FROM wi WHERE split <> 'train'),
        |h AS (SELECT split, doc_id, CAST(count(*) AS BIGINT) AS n_hit
        |  FROM ev JOIN tf USING (fp) GROUP BY 1, 2),
        |ir AS (SELECT DISTINCT split, doc_id FROM ev),
        |bd AS (SELECT doc_id, CASE
        |    WHEN ${SamplingQueries.hashBucketSql("doc_id", 1, 100)} < 80
        |      THEN 'train'
        |    WHEN ${SamplingQueries.hashBucketSql("doc_id", 1, 100)} < 90
        |      THEN 'val'
        |    ELSE 'test' END AS split
        |  FROM g),
        |be AS (SELECT split, doc_id FROM bd WHERE split <> 'train'),
        |j AS (SELECT be.split, coalesce(h.n_hit, 0) AS n_hit,
        |    CASE WHEN ir.doc_id IS NULL THEN 1 ELSE 0 END AS all_common
        |  FROM be LEFT JOIN h
        |    ON be.split = h.split AND be.doc_id = h.doc_id
        |  LEFT JOIN ir
        |    ON be.split = ir.split AND be.doc_id = ir.doc_id)
        |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN n_hit >= 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_contaminated,
        |  (CAST(sum(CASE WHEN n_hit >= 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000) // CAST(count(*) AS BIGINT) AS contaminated_ppm,
        |  CAST(sum(n_hit) AS BIGINT) AS n_hit_fps,
        |  CAST(sum(all_common) AS BIGINT) AS n_all_common
        |FROM j GROUP BY split""".stripMargin,

    "q262_dup_degree_profile" ->
      s"""WITH pairs AS ($minhashPairsSql),
        |deg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS degree
        |  FROM (SELECT doc_a AS doc_id FROM pairs
        |    UNION ALL SELECT doc_b FROM pairs)
        |  GROUP BY doc_id)
        |SELECT CAST(length(bin(degree)) AS BIGINT) AS deg_octave,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  min(degree) AS min_degree,
        |  max(degree) AS max_degree,
        |  CAST(sum(degree) AS BIGINT) AS sum_degree
        |FROM deg GROUP BY 1""".stripMargin,

    "q264_bow_dedup_delta" ->
      """WITH f AS (SELECT md5(text) AS raw,
        |    md5(array_to_string(list_sort(string_split(text, ' ')),
        |      ' ')) AS bow
        |  FROM documents),
        |fam AS (SELECT bow, count(DISTINCT raw) AS n_raw,
        |    count(*) AS nd
        |  FROM f GROUP BY bow)
        |SELECT CAST(sum(nd) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_bow_families,
        |  CAST(sum(n_raw) AS BIGINT) AS n_raw_families,
        |  CAST(sum(CASE WHEN n_raw >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_merged_families,
        |  CAST(sum(CASE WHEN n_raw >= 2 THEN nd ELSE 0 END) AS BIGINT)
        |    AS n_docs_in_merged
        |FROM fam""".stripMargin,

    "q265_source_dup_mass" ->
      """WITH w AS (SELECT doc_id, source,
        |    string_split(text, ' ') AS words FROM documents),
        |b AS (SELECT doc_id, source,
        |    md5(array_to_string(words[(i*8+1):(i*8+8)], ' ')) AS h
        |  FROM (SELECT doc_id, source, words,
        |      unnest(generate_series(0, (len(words)-1)//8)) AS i
        |    FROM w)),
        |dup AS (SELECT h FROM
        |    (SELECT h, count(DISTINCT doc_id) AS ndd FROM b GROUP BY h)
        |  WHERE ndd >= 2),
        |pd AS (SELECT b.doc_id, b.source,
        |    CAST(count(*) AS BIGINT) AS n_blocks,
        |    CAST(sum(CASE WHEN dup.h IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_dup
        |  FROM b LEFT JOIN dup ON b.h = dup.h
        |  GROUP BY b.doc_id, b.source)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_blocks) AS BIGINT) AS n_blocks,
        |  CAST(sum(n_dup) AS BIGINT) AS n_dup_blocks,
        |  CAST((sum(n_dup) * 1000000) // sum(n_blocks) AS BIGINT)
        |    AS dup_ppm,
        |  CAST(sum(CASE WHEN n_dup * 2 > n_blocks THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_majority_dup_docs
        |FROM pd GROUP BY source""".stripMargin
  )
}
