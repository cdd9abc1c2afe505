package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Text
import graft.operators.Components

/** Dataset-assembly operators a training-data pipeline runs after
  * hygiene/dedup: reproducible hash-based splits, stratified sampling,
  * domain token budgeting / mixture reporting, duplicate-cluster
  * materialization (connected components over LSH pairs), and a
  * sketch-accuracy audit (estimated vs exact Jaccard).
  *
  * Determinism: all sampling decisions are md5-hash thresholds on ids
  * (never `rand()` / TABLESAMPLE — reproducible across engines, runs,
  * and partitionings); ratios are single IEEE divisions; truncation is
  * explicit `floor` (Spark's double→bigint cast truncates while
  * DuckDB's rounds, so casts alone would diverge).
  *
  * Scale notes (100 TB): hash-split/sample are stateless per-row
  * projections — no shuffle, fully codegen'd, and the same row lands in
  * the same split on any cluster. Budget/mix reports aggregate to one
  * row per source (tiny) before any window. Clustering shuffles only
  * (long, long) label pairs.
  */
object SamplingQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Degree cap for q87 triangle counting: vertices with more candidate
    * edges than this are excluded (with their edges) before the wedge
    * self-joins, bounding join fan-out at C(cap,2) per vertex instead
    * of growing cubically with duplicate-cluster size. Mirrored in the
    * oracle SQL.
    */
  val MaxTriangleDegree: Int = 30

  /** 0..99 bucket from 32 md5 bits of the id rendered as a decimal
    * string. `off` selects a digest window so different decisions (split
    * vs sample) use independent bits of the same digest.
    *
    * Takes a plain column NAME (mirroring [[hashBucketSql]]): the SQL
    * fragment is built by string interpolation, and a derived Column's
    * toString is not valid SQL — a name keeps the contract honest.
    */
  private[graft] def hashBucket(id: String, off: Int, mod: Int): Column =
    expr(s"CAST(conv(substr(md5(CAST(CAST($id AS STRING) AS BINARY)), " +
      s"$off, 8), 16, 10) AS BIGINT) % $mod")

  private[queries] def hashBucketSql(id: String, off: Int, mod: Int): String =
    s"CAST(concat('0x', substr(md5(CAST($id AS VARCHAR)), $off, 8)) " +
      s"AS BIGINT) % $mod"

  /** q64/q238 shared body: every LSH candidate pair with its sketch
    * agreement count (matching minima of 16), exact distinct-trigram
    * intersection, and union — the raw material for both the per-pair
    * audit and the per-level calibration curve.
    *
    * Join-tree shape (round-5 reshape of the round-4 9-BHJ plan): the
    * per-doc audit inputs — the 16 signature minima and the distinct-
    * trigram count — are computed ONCE in the signature aggregation
    * (minima over the distinct set equal minima over the raw multiset)
    * and CARRIED through the band self-join, so neither the signature
    * nor the cardinality ever joins back onto the pair set. 4 joins
    * total: band self-join, tri⋈pairs, ⋈tri (exact intersection),
    * pairs⋈inter. The carried width is 17 bigints/side (~140 B) on
    * band rows that are already (band, digest, id) — still no bodies.
    */
  /** LSH candidate-pair sketch-vs-exact stats — built ONCE per run
    * (Shared.frame, r13): q64 (pair audit) and q238 (calibration
    * curve) consume the identical deterministic frame (md5-seeded
    * minhash, banded candidates, exact trigram intersection); before
    * this each re-ran the whole shingle→signature→band→verify
    * pipeline (two ~2.5 s sinks for one artifact — the kmeansQ
    * round-5 lesson at pair grain). */
  private def pairSketchStats(s: SparkSession, d: String): DataFrame =
    graft.queries.Shared.frame(s, "pair_stats", d)(
      pairSketchStatsBuild(s, d))

  private def pairSketchStatsBuild(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val tri = Text.wordShingles(docs, "doc_id", "text", 3)
    val mcols = (0 until 16).map(i => s"m$i")
    val sig = Text.minhashSignature(tri, "doc_id", 16, withCount = true)
    val pairs = Text.lshCandidatePairs(
      Text.lshBands(sig, "doc_id", 4, 4, carryCols = mcols :+ "n_sh"),
      "doc_id", carryCols = mcols :+ "n_sh")
    val agree = (0 until 16)
      .map(i => when(col(s"a_m$i") === col(s"b_m$i"), 1).otherwise(0))
      .reduce(_ + _)
    val inter = tri.as("x")
      .join(pairs.select("doc_a", "doc_b"), col("x.doc_id") === col("doc_a"))
      .join(tri.as("y"),
        col("y.doc_id") === col("doc_b") && col("x.sh") === col("y.sh"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(inter, Seq("doc_a", "doc_b"), "left_outer")
      .select(col("doc_a"), col("doc_b"), agree.as("agree"),
        coalesce(col("inter"), lit(0L)).as("inter"),
        (col("a_n_sh") + col("b_n_sh")
          - coalesce(col("inter"), lit(0L))).as("uni"))
  }

  val queries: Map[String, Q] = Map(
    // ---- reproducible train/val/test split: 80/10/10 by id-hash bucket.
    // Report rows + token volume per split — the assignment itself is a
    // pure projection (same doc → same split on any cluster, any day)
    "q59_split_assign" -> ((s, d) => {
      Tables.documents(s, d)
        .select(
          when(hashBucket("doc_id", 1, 100) < 80, lit("train"))
            .when(hashBucket("doc_id", 1, 100) < 90, lit("val"))
            .otherwise(lit("test")).as("split"),
          size(split(col("text"), " ")).as("toks"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).as("n_tokens"))
    }),

    // ---- DETERMINISTIC EPOCH SHUFFLE + shard assignment: the global
    // training-order pass every corpus ships through before the trainer
    // reads it. Each doc gets an order key from one md5 window (chars
    // 17-24) and a shard from an independent window (chars 25-32) —
    // same doc, same (shard, pos) on any cluster, any day, no rand().
    // pos = rank within the shard by (skey, doc_id). Scale: ONE shuffle,
    // partitioned BY THE SHARD KEY — the window's partition count IS
    // the output shard count, and the per-shard sort is exactly the
    // sort the shard writer does anyway (repartition +
    // sortWithinPartitions); nothing global orders the corpus. Shard
    // count is a config constant sized so a shard fits a write task
    // (64 here; ~25k at 100 TB / 4 GB shards).
    "q148_epoch_shuffle" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr("substr(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), 17, 8)")
            .as("skey"),
          hashBucket("doc_id", 25, 64).as("shard"))
        .withColumn("pos",
          row_number().over(
            Window.partitionBy(col("shard"))
              .orderBy(col("skey"), col("doc_id"))).cast("bigint"))
    }),

    // ---- SPLIT LEAKAGE AUDIT: near-duplicate pairs that straddle the
    // q59 train/val/test boundary — the eval-integrity check every
    // pipeline needs (a test doc whose near-twin sits in train is a
    // leaked answer, Lee et al. 2022 §6). Rides the ONE shared LSH
    // candidate-pair frame (built once per run, Shared.frame); the
    // split is a PURE FUNCTION of doc_id (the q59 hash rule), so it is
    // computed directly on the pair frame's id columns — no document
    // joins at all (VERDICT r8 #2: the two split joins re-scanned
    // documents and re-shuffled the pair frame twice for values a
    // projection derives in place). The whole audit is one
    // map-combined aggregate over the shared frame folding to at most
    // 3×3 rows. leaky marks cross-split rows. Staging contract: the
    // pair frame is the q21/q62/q111 one — clone-quadratic BY
    // DEFINITION (every near-dup pair is its subject matter), so like
    // the rest of that family this audit runs AFTER exact dedup; the
    // 100× pure-clone smoke (148 s, 26.7 GB spill, all in the
    // inherited pair build) measures the adversarial input that stage
    // ordering exists to rule out.
    "q149_split_leakage" -> ((s, d) => {
      def splitOf(idCol: String) =
        when(hashBucket(idCol, 1, 100) < 80, lit("train"))
          .when(hashBucket(idCol, 1, 100) < 90, lit("val"))
          .otherwise(lit("test"))
      TextQueries.sharedCandidatePairs(s, d)
        .select(splitOf("doc_a").as("split_a"),
          splitOf("doc_b").as("split_b"))
        .groupBy(col("split_a"), col("split_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("leaky", col("split_a") =!= col("split_b"))
    }),

    // ---- RIGHT-TO-BE-FORGOTTEN propagation audit: given a tombstone
    // set (a deterministic ~2% hash slice stands in for the deletion-
    // request table), report every surface a purge job must touch —
    // documents, the embedding store (shared id space), and the LSH
    // candidate-pair frame (pairs citing a tombstoned doc) — plus the
    // post-purge row counts. The compliance sweep a 100 TB lake runs
    // before certifying a deletion batch; derived surfaces (pairs,
    // indexes) are exactly the places naive delete jobs miss. Scale:
    // tombstones join as a plain equi-join (hash-distributable at any
    // tombstone cardinality — NOT a broadcast contract), the pair leg
    // rides the one shared frame, and each leg folds to one row before
    // the 1-row joins combine them.
    "q158_forget_audit" -> ((s, d) => {
      val tomb = Tables.documents(s, d).select(col("doc_id"))
        .filter(hashBucket("doc_id", 7, 50) === 13)
      val docs = Tables.documents(s, d)
      val nTomb = tomb.agg(count(lit(1)).as("n_tombstones"))
      val nVec = Tables.embeddings(s, d)
        .join(tomb.withColumnRenamed("doc_id", "vec_id"), "vec_id")
        .agg(count(lit(1)).as("n_vec_rows"))
      val pairs = TextQueries.sharedCandidatePairs(s, d)
      val nPair = pairs
        .join(tomb.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"),
          "left_semi")
        .unionByName(pairs
          .join(tomb.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"),
            "left_semi")
          .select(col("doc_a"), col("doc_b")))
        .distinct()
        .agg(count(lit(1)).as("n_pairs_touched"))
      val nAfter = docs.join(tomb, Seq("doc_id"), "left_anti")
        .agg(count(lit(1)).as("n_docs_after"))
      nTomb.crossJoin(nVec).crossJoin(nPair).crossJoin(nAfter)
    }),

    // ---- stratified sampling with per-stratum rates (upsample scarce
    // languages, downsample English): en 20%, others 50%, decided by an
    // independent hash window. Emits the sampled docs themselves.
    "q60_stratified_sample" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("__b", hashBucket("doc_id", 9, 10))
        .filter(col("__b") <
          when(col("lang") === "en", lit(2)).otherwise(lit(5)))
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    // ---- length-weighted deterministic sampling: P(keep) proportional
    // to n_chars/max(n_chars). The uniform is an independent md5 digest
    // window; the comparison is integer cross-multiplication (no
    // division, no doubles). Stats pass -> broadcast max -> map-only
    // keep decision, reproducible on any cluster.
    "q93_weighted_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val mx = docs.agg(max(col("n_chars")).as("mx"))
      docs.crossJoin(broadcast(mx))
        .filter(hashBucket("doc_id", 17, 1000000) * col("mx")
          < col("n_chars") * 1000000L)
        .select(col("doc_id"), col("n_chars"))
    }),

    // ---- domain token budgeting: cap every source at a fixed token
    // budget; rate = min(1, budget/tokens) is the per-source sampling
    // probability, kept_tokens its floor'd expectation — the "data
    // mixing" table a pretraining run is configured from
    "q61_domain_budget" -> ((s, d) => {
      val budget = 3000.0
      Tables.documents(s, d)
        .select(col("source"), size(split(col("text"), " ")).as("toks"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("src_tokens"))
        .select(col("source"), col("n_docs"), col("src_tokens"),
          least(lit(1.0), lit(budget) / col("src_tokens")).as("rate"),
          floor(least(lit(1.0), lit(budget) / col("src_tokens"))
            * col("src_tokens")).cast("long").as("kept_tokens"))
    }),

    // ---- duplicate-cluster materialization: connected components over
    // the LSH candidate pairs (q21). A~B~C collapses to one cluster even
    // when A,C never share a band — the grouping exact/pairwise dedup
    // cannot express. cluster = min doc_id of the group.
    // Round 7: computed at CANONICAL grain + family expansion instead
    // of iterating over the expanded raw graph — bit-identical (raw
    // components are unions of whole families, min raw id = min
    // canonical id; the raw-path twin is asserted in StagedLshSpec),
    // but the contraction runs on the clone-invariant canonical graph:
    // the 100× clone smoke took q62 from >9 min (24.7 M clique edges)
    // to seconds. A raw doc is a vertex iff its family has an internal
    // edge (fsize > 1) or its canonical is in a canonical pair.
    "q62_dup_clusters" -> ((s, d) => {
      val raw = s.conf.getOption("spark.graft.text.rawLsh")
        .exists(_.toBoolean)
      if (raw) {
        val pairs = TextQueries.sharedCandidatePairs(s, d)
        Components.connectedComponentsAuto(pairs, "doc_a", "doc_b")
          .select(col("id").as("doc_id"), col("cluster"))
      } else {
        TextQueries.sharedMembers(s, d)
          .join(TextQueries.sharedCanonComponents(s, d), Seq("canon"),
            "left")
          .filter(col("fsize") > 1 || col("cluster").isNotNull)
          .select(col("doc_id"),
            coalesce(col("cluster"), col("canon")).as("cluster"))
      }
    }),

    // ---- DUP-CLUSTER SIZE histogram (the headline table of a dedup
    // report: "how big are the duplicate families?"): q62's connected
    // components folded to a count-of-counts — cluster size vs number
    // of clusters vs docs covered. Singletons (docs in no candidate
    // pair) are by construction absent, so every size is ≥ 2; the fold
    // is two hash aggregations over doc-grain rows.
    "q185_cluster_sizes" -> ((s, d) => {
      queries("q62_dup_clusters")(s, d)
        .groupBy(col("cluster")).agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
        .withColumn("n_docs", col("cluster_size") * col("n_clusters"))
    }),

    // ---- cluster-density OVER-MERGE audit (the transitivity check on
    // q62's components): connected components collapse A~B~C into one
    // cluster even when A,C never banded together, so chained merges
    // can union docs that share nothing — the classic over-merge risk
    // of component-based dedup. Per cluster: members, DIRECT candidate
    // pairs, density = direct / C(n,2), and the chain_risk flag at
    // density < 50% (exact integer cross-multiplication: 4·direct <
    // n·(n−1)). A clique (every pair banded) reads 10⁶ ppm; a pure
    // chain of n docs reads → 2/n — the number a curation owner checks
    // before trusting cluster-grain canonical selection (q111).
    // Scale: computed ENTIRELY at canonical grain via the staged
    // family algebra (clone-invariant — never touches the expanded
    // raw pair frame): raw pairs = expand(canonical pairs) ∪
    // within-family pairs EXACTLY (a minhash signature is a pure
    // function of the text; StagedLshSpec asserts the set equality),
    // so direct(cluster) = Σ_{canon pair} fa·fb + Σ_{canon} C(fsize,2)
    // and n = Σ fsize — three shared planner-scale artifacts folded at
    // cluster grain. Envelope: fa·fb and n·(n−1) run in DECIMAL(38,0);
    // outputs BIGINT-exact to clusters of ~3·10⁹ docs.
    "q261_cluster_density" -> ((s, d) => {
      val canonF = TextQueries.sharedMembers(s, d)
        .filter(col("doc_id") === col("canon"))
        .select(col("canon"), col("fsize"))
      val verts = canonF
        .join(TextQueries.sharedCanonComponents(s, d), Seq("canon"),
          "left_outer")
        .filter(col("fsize") > 1 || col("cluster").isNotNull)
        .select(col("canon"), col("fsize"),
          coalesce(col("cluster"), col("canon")).as("cluster"))
      val nm = verts.groupBy(col("cluster"))
        .agg(sum(col("fsize")).as("n_members"),
          sum(expr("fsize * (fsize - 1) div 2")).as("within"))
      val cross = TextQueries.sharedCanonPairs(s, d)
        .join(verts.select(col("canon").as("doc_a"),
          col("fsize").as("fa"), col("cluster")), "doc_a")
        .join(canonF.select(col("canon").as("doc_b"),
          col("fsize").as("fb")), "doc_b")
        .groupBy(col("cluster"))
        .agg(sum(expr("CAST(fa AS DECIMAL(38,0)) * fb")).as("cross"))
      nm.join(cross, Seq("cluster"), "left_outer")
        .select(col("cluster"), col("n_members"),
          (col("within") + coalesce(col("cross"), lit(0))
            .cast("decimal(38,0)")).as("direct"))
        .select(col("cluster"), col("n_members"),
          col("direct").cast("long").as("n_direct_pairs"),
          expr("CAST(direct * 2000000 div (CAST(n_members AS " +
            "DECIMAL(19,0)) * (n_members - 1)) AS BIGINT)")
            .as("density_ppm"),
          expr("4 * direct < CAST(n_members AS DECIMAL(19,0)) " +
            "* (n_members - 1)").as("chain_risk"))
    }),

    // ---- CANONICAL SELECTION per duplicate cluster: q62's clusters,
    // but the keeper is the LONGEST member (token count, min-doc_id
    // tiebreak) instead of the min id — the curation policy that keeps
    // the most complete version of a near-dup group. One map-side-
    // combinable aggregate does the argmax: max(struct(n_toks,
    // -doc_id)) is lexicographic, so ties resolve to the smallest
    // doc_id — no window, ONE shuffle on cluster after the join.
    // Integer-only compare keys (length, id), so ordering is
    // bit-deterministic cross-engine.
    "q111_canonical_by_length" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // rides q62's canonical-grain components (same staged machinery)
      val cl = queries("q62_dup_clusters")(s, d)
      val toks = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("n_toks"))
      cl.join(toks, "doc_id")
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("cluster_size"),
          max(struct(col("n_toks"), (-col("doc_id")).as("neg_id")))
            .as("best"))
        .select(col("cluster"), col("cluster_size"),
          (-col("best.neg_id")).as("canonical_id"),
          col("best.n_toks").as("n_toks"))
    }),

    // ---- triangle counting on the near-dup candidate graph: pairs
    // sharing all three edges (a<b<c) — the density signal that tells a
    // dedup pipeline whether clusters are cliques (true dup groups) or
    // chains (LSH noise). TWO caps bound the work, both mirrored in the
    // oracle:
    //  1. bucket cap at pair GENERATION: an LSH bucket of m members
    //     makes every member's degree ≥ m−1, so buckets with
    //     m > MaxTriangleDegree+1 emit no pairs at all — a mega-clone
    //     bucket's density verdict is already known without
    //     enumerating its C(m,2) pairs. Without this, 100× clone
    //     density meant ~100M join rows and ~100 GB of spill BEFORE
    //     the degree filter could see them (round-4 measurement).
    //  2. degree cap on the surviving pair set: vertices whose degree
    //     across (small) buckets still exceeds MaxTriangleDegree are
    //     dropped with their edges, so the wedge join emits at most
    //     C(cap,2) wedges per vertex.
    // Contract note: the candidate graph for triangles is DEFINED as
    // pairs from buckets of ≤ cap+1 members — mega-bucket pairs never
    // enter it, not even toward degrees.
    "q87_triangles" -> ((s, d) => {
      val bands = Text.candidateBands(Tables.documents(s, d), "doc_id",
        "text")
      val pairs = bands
        .groupBy(col("band"), col("h"))
        .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
        .filter(size(col("ids")).between(2, MaxTriangleDegree + 1))
        .select(explode(expr(
          """flatten(transform(ids, (x, i) ->
            |  transform(slice(ids, i + 2, size(ids) - i - 1),
            |    y -> struct(x AS a, y AS b))))""".stripMargin)).as("p"))
        .select(col("p.a"), col("p.b")).distinct()
      val deg = pairs.select(col("a").as("v"))
        .unionAll(pairs.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val keep = broadcast(
        deg.filter(col("deg") <= MaxTriangleDegree).select(col("v")))
      val e = pairs
        .join(keep.select(col("v").as("a")), "a")
        .join(keep.select(col("v").as("b")), "b")
        .select(col("a"), col("b"))
      val e2 = e.select(col("a").as("b2"), col("b").as("c"))
      val e3 = e.select(col("a").as("a3"), col("b").as("c3"))
      e.join(e2, col("b") === col("b2"))
        .join(e3, col("a") === col("a3") && col("c") === col("c3"))
        .agg(count(lit(1)).as("triangles"))
    }),

    // ---- weighted mixture SAMPLING to a target distribution: where
    // q61/q63 only report the mix, this materializes it — every source
    // is sampled down to an equal token share of a fixed total budget
    // (uniform target; a non-uniform target is the same plan with a
    // broadcast weights table in place of n_src). Per-doc keep decision
    // is the q93 idiom: md5-bucket cross-multiplied against the
    // per-source rate in INTEGER arithmetic — rate_s = min(1,
    // budget/(n_src·tokens_s)), keep iff bucket·n_src·tokens_s <
    // budget·1e6, no doubles, no rand(), same doc kept on any cluster.
    // Stats pass aggregates to one row per source (tiny, broadcast);
    // the keep decision is then a stateless map over the corpus — the
    // actual training-mix materialization shape at 100 TB.
    // ---- CURRICULUM INTERLEAVE: the global training order a data
    // loader consumes — a deterministic within-source shuffle (md5
    // order, reproducible on any cluster) woven across sources by
    // weighted round-robin: source weight w ∈ 1..4 (hash-derived here;
    // a mixture spec in production), each doc's ideal position is
    // rank/w, realized exactly as rank·(12/w) in integers (12 = lcm of
    // the weights). BOTH rank assignments — within-source rank (20
    // sources = low-cardinality window, the q110 scale-killer class)
    // and the final global position (cardinality ONE) — run through
    // the two-phase Prefix.runningSum, so no single task ever sees
    // more than a chunk. Order keys append doc_id for uniqueness
    // (exact-replay requirement; bigint holds to ~7e8 docs/source —
    // widen to decimal beyond).
    "q128_curriculum_order" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("source"))
        .withColumn("w", hashBucket("source", 17, 4) + 1)
        .withColumn("src_ord",
          hashBucket("doc_id", 1, 1000000) * lit(10000000000L)
            + col("doc_id"))
        .withColumn("one", lit(1L))
      val ranked = graft.operators.Prefix.runningSum(
        base, "source", "src_ord", "one", "rs")
      val keyed = ranked
        .withColumn("ord",
          col("rs") * expr("div(12, w)") * lit(10000000000L)
            + col("doc_id"))
        .withColumn("k", lit(0))
      graft.operators.Prefix.runningSum(keyed, "k", "ord", "one",
          "global_pos")
        .select(col("doc_id"), col("source"), col("global_pos"))
    }),

    // ---- CLASS-BALANCED DOWNSAMPLING: equalize language strata by
    // keeping exactly min-class-count docs per language, chosen by a
    // deterministic md5 order (same corpus → same sample on any
    // cluster) — the class-rebalancing step classifier training data
    // goes through, and the exact-count counterpart of q60's
    // rate-based stratified sample. Per-language ranks run through the
    // two-phase Prefix.runningSum (languages are a LOW-cardinality
    // stratum — a plain window here is the q110 single-reducer
    // killer); the min count is a broadcast scalar off a stratum-grain
    // aggregate. Order keys append doc_id for uniqueness (exact-replay
    // requirement, the q128 idiom).
    "q166_balanced_downsample" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"))
        .withColumn("ord",
          hashBucket("doc_id", 5, 1000000) * lit(10000000000L)
            + col("doc_id"))
        .withColumn("one", lit(1L))
      val ranked = graft.operators.Prefix.runningSum(
        base, "lang", "ord", "one", "rnk")
      val mn = base.groupBy(col("lang")).agg(count(lit(1)).as("c"))
        .agg(min(col("c")).as("mn"))
      ranked.crossJoin(broadcast(mn))
        .filter(col("rnk") <= col("mn"))
        .select(col("doc_id"), col("lang"), col("rnk"))
    }),

    // ---- QUERY-TIME SAMPLING estimate + audit: corpus-level token
    // totals from a deterministic 50% md5-bucket sample, scaled by the
    // inverse rate, with the exact total and a 5% tolerance verdict in
    // the same row — unlike the sketch audits (q74/q123/q160) BOTH legs
    // here replay exactly in DuckDB (the sample is a pure hash
    // predicate, not engine state), so the verdict is computed, not
    // pinned. At 100 TB this is the dashboard-query pattern: scan 1-50%
    // of the corpus for a number whose error the audit bounds; the rate
    // (and the md5 window making this sample independent of the q59
    // split) is the cost knob. Two map-combined aggregates, no joins
    // beyond the two 1-row frames.
    "q171_sample_estimate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(size(split(col("text"), " ")).cast("bigint").as("toks"),
          hashBucket("doc_id", 13, 100).as("hb"))
      val exact = docs.agg(
        coalesce(sum(col("toks")), lit(0L)).as("true_tokens"),
        count(lit(1)).as("n_docs"))
      // coalesce (ADVICE r6): an EMPTY sample makes sum(toks) NULL,
      // which would propagate NULL into est_tokens and the verdict —
      // the 'computed, not pinned' contract wants a defined estimate
      // (0) and a defined verdict on degenerate inputs
      val est = docs.filter(col("hb") < 50)
        .agg((coalesce(sum(col("toks")), lit(0L)) * 2).as("est_tokens"),
          (count(lit(1)) * 2).as("est_docs"))
      exact.crossJoin(broadcast(est))
        .select(col("true_tokens"), col("n_docs"), col("est_tokens"),
          col("est_docs"),
          (abs(col("est_tokens") - col("true_tokens")) * 20
            <= col("true_tokens")).as("tokens_within_5pct"))
    }),

    "q99_mixture_sample" -> ((s, d) => {
      val budget = 50000L
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).as("toks"))
      val srcTok = docs.groupBy(col("source"))
        .agg(sum(col("toks")).as("src_tokens"))
      val nSrc = srcTok.agg(count(lit(1)).as("n_src"))
      // decimal(38,0) product: bucket(6 digits) × n_src × src_tokens
      // can pass Int64 at real corpus scale (1e6 × 10 × 1e12 ≈ 1e19);
      // 38-digit decimal keeps the comparison exact and overflow-free,
      // mirrored by HUGEINT in the oracle
      docs.join(broadcast(srcTok), "source")
        .crossJoin(broadcast(nSrc))
        .filter(hashBucket("doc_id", 25, 1000000).cast("decimal(38,0)")
          * col("n_src") * col("src_tokens")
          < lit(budget * 1000000L).cast("decimal(38,0)"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs_kept"),
          sum(col("toks")).as("kept_tokens"))
    }),

    // ---- TEMPERATURE-scaled mixture plan (the q99/q136 family's
    // design-time leg): sampling weight per source ∝ src_tokens^(1/T)
    // at T = 2 — the sqrt-reweighting large-LM data mixes use to damp
    // dominant sources without dropping small ones. w = ⌊√tokens⌋ via
    // one IEEE sqrt + floor (correctly-rounded, bit-identical
    // cross-engine); planned_tokens = budget·w ÷ Σw and the
    // over-sampling audit epochs_x1000 = planned·1000 ÷ src_tokens in
    // pure BIGINT floor division. One map-combined per-source token
    // sum, a 1-row Σw broadcast, in-row arithmetic — nothing here
    // grows past source cardinality at any corpus size.
    "q202_temperature_mixture" -> ((s, d) => {
      val budget = 100000L
      val src = Tables.documents(s, d)
        .select(col("source"),
          size(split(col("text"), " ")).cast("bigint").as("toks"))
        .groupBy(col("source")).agg(sum(col("toks")).as("src_tokens"))
        .withColumn("w",
          expr("CAST(floor(sqrt(CAST(src_tokens AS DOUBLE))) AS BIGINT)"))
      val tot = src.agg(sum(col("w")).as("sum_w"))
      src.crossJoin(broadcast(tot))
        .select(col("source"), col("src_tokens"), col("w"),
          expr(s"$budget * w div sum_w").as("planned_tokens"),
          expr(s"($budget * w div sum_w) * 1000 div src_tokens")
            .as("epochs_x1000"))
    }),

    // ---- CAPPED FAIR-SHARE allocation (waterfilling): split a global
    // token budget B = ⌊total/2⌋ EQUALLY across sources except that no
    // source can supply more than it has — the allocation q202's
    // temperature mixture ignores (∝-weights can plan more tokens from
    // a stratum than exist; this operator is the feasibility leg). The
    // classic waterfill has a CLOSED FORM over the cap-ascending order:
    // at row i (slots = n−i+1 sources remaining, rem = B − Σ caps of
    // already-saturated sources), source i saturates iff
    // cap_i·slots_i ≤ rem_i — and that predicate is provably
    // prefix-closed in cap order (cap_j ≤ cap_i and each skipped cap
    // ≥ cap_j imply cap_j·slots_j ≤ rem_j), so ONE prefix sum finds
    // the waterline: the first non-saturated row fixes
    // level = rem div slots, and the ⌊⌋ remainder is handed out as +1
    // to the first (rem mod slots) unsaturated sources in order —
    // fully deterministic, Σ alloc = min(B, Σ cap) exactly. All
    // arithmetic is BIGINT. Scale: everything after the per-source
    // token sum runs at SOURCE cardinality (a 20-row global window
    // here, stratum-count rows at 100 TB — planner-scale by
    // construction, the same posture as q202/q63).
    // The closed-form algorithm lives in operators/Stats.waterfill
    // (PropertySpec drives it over randomized cap frames); this query
    // is the per-source token instantiation at B = ⌊total/2⌋.
    "q206_budget_waterfill" -> ((s, d) => {
      val caps = Tables.documents(s, d)
        .select(col("source"),
          size(split(col("text"), " ")).cast("bigint").as("toks"))
        .groupBy(col("source")).agg(sum(col("toks")).as("cap_tokens"))
      graft.operators.Stats.waterfill(caps, "source", "cap_tokens")
    }),

    // ---- per-stratum EXACT-k sample (eval carving, stratified leg):
    // exactly k = 20 docs per source by salted-md5 order with doc_id
    // tiebreak — q198's fixed-size carving per stratum instead of
    // globally. Written as the DECLARATIVE row_number idiom on
    // purpose: the RewriteWindowTopK optimizer rule (the repo's full
    // custom-operator stack, plans/TopKPerGroupPlan.scala) recognizes
    // `row_number() OVER (PARTITION BY source ORDER BY …) <= k` and
    // swaps in the bounded k-row HEAP exec — O(n log k) with ≤ k rows
    // retained per group, no per-group sort — so the sample costs a
    // near-scan at any corpus size while the code stays window-shaped.
    // Assignment is pure projection (same doc → same rank on any
    // cluster, any day — the q59/q148 determinism contract).
    "q221_stratified_k_sample" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ranked = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          hashBucket("doc_id", 17, 1000000).as("h"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("source"))
            .orderBy(col("h").asc, col("doc_id").asc)))
      ranked.filter(col("rk") <= 20)
        .select(col("source"), col("doc_id"), col("rk"))
    }),

    // ---- SAMPLE-SIZE PLANNER (per-stratum review budgeting): how many
    // docs must a human review per source to estimate its keep rate
    // within ±2 pp at 95% confidence? n = ⌈z²·p(1−p)/e²⌉ with z² and e
    // PINNED integer constants (z² = 3.8416 → 38416·10⁻⁴, e = 0.02 →
    // e² = 4·10⁻⁴), p = the observed q124 keep rate in ppm — so the
    // whole ceiling is one integer expression
    // (38416·pp·(10⁶−pp) + D − 1) div D with D = 4·10¹²·10⁻⁴·10⁴ =
    // 4·10¹². The worst case (p = ½) is the familiar n ≈ 2401; skewed
    // strata need fewer. One pass over the shared quality_signals
    // artifact; output is stratum-cardinality rows. n_req is capped at
    // the stratum size (finite population: reviewing everything always
    // suffices; the FPC refinement is deliberately left out — the
    // uncapped number is the conservative one).
    "q230_sample_size_plan" -> ((s, d) => {
      val rates = Tables.documents(s, d)
        .select(col("doc_id"), col("source"))
        .join(graft.queries.CorpusQueries.qualitySignals(s, d),
          "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("score") >= 0, 1L).otherwise(0L)).as("n_keep"))
        .withColumn("keep_ppm", expr("n_keep * 1000000 div n_docs"))
      rates.select(col("source"), col("n_docs"), col("keep_ppm"),
        least(col("n_docs"),
          expr("(38416 * keep_ppm * (1000000 - keep_ppm) " +
            "+ 3999999999999) div 4000000000000")).as("n_review"))
    }),

    // ---- NEYMAN REVIEW ALLOCATION: split a fixed review budget
    // R = 1000 across sources ∝ N_h·σ_h (σ for a Bernoulli keep rate
    // = √(p·q) — floor-of-sqrt on the ppm product, the q202
    // correctly-rounded-sqrt discipline), the variance-minimizing
    // stratified design. Integer weights w_h = N_h·⌊√(pp·(10⁶−pp))⌋;
    // seats = largest-remainder apportionment (floor share + one extra
    // seat to the R mod Σw... largest fractional remainders, ties
    // source-asc — fully deterministic, Σ alloc = R exactly when
    // Σw > 0). A stratum with pp ∈ {0, 10⁶} has σ = 0 and draws no
    // reviews — the audit-the-uncertain posture. Stratum-cardinality
    // arithmetic end to end after one shared-signal pass.
    "q231_neyman_allocation" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val budget = 1000L
      val w = Tables.documents(s, d)
        .select(col("doc_id"), col("source"))
        .join(graft.queries.CorpusQueries.qualitySignals(s, d),
          "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("score") >= 0, 1L).otherwise(0L)).as("n_keep"))
        .withColumn("keep_ppm", expr("n_keep * 1000000 div n_docs"))
        .withColumn("w", col("n_docs") * expr(
          "CAST(floor(sqrt(CAST(keep_ppm * (1000000 - keep_ppm) " +
            "AS DOUBLE))) AS BIGINT)"))
      val tot = w.agg(sum(col("w")).as("sum_w"))
      val base = w.crossJoin(broadcast(tot))
        .withColumn("floor_seats",
          when(col("sum_w") > 0, expr(s"$budget * w div sum_w"))
            .otherwise(lit(0L)))
        .withColumn("rem",
          when(col("sum_w") > 0, expr(s"($budget * w) % sum_w"))
            .otherwise(lit(0L)))
      val ord = Window.orderBy(col("rem").desc, col("source").asc)
      // all-zero weights (every stratum fully certain): nothing to
      // prioritize, allocate nothing rather than spraying the budget
      val extraTot = base.agg(
        when(max(col("sum_w")) > 0,
          lit(budget) - sum(col("floor_seats"))).otherwise(lit(0L))
          .as("extra"))
      base.withColumn("rk", row_number().over(ord).cast("bigint"))
        .crossJoin(broadcast(extraTot))
        .select(col("source"), col("n_docs"), col("keep_ppm"), col("w"),
          (col("floor_seats")
            + when(col("rk") <= col("extra"), 1L).otherwise(0L))
            .as("n_review"))
    }),

    // ---- shard-plan audit: hash docs into 32 output shards and report
    // the token balance per shard (balance = shard share × 32; 1.0 =
    // perfectly even). Hash-mod sharding is the only assignment that
    // needs NO global coordination at 100 TB — each writer task decides
    // rows locally — and this report is the check that the cheap
    // assignment is balanced enough before committing to it. The ratio
    // is exact-int × 32 over one IEEE division, hash-gate-stable.
    "q100_shard_plan" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), size(split(col("text"), " ")).as("toks"),
          hashBucket("doc_id", 13, 32).as("shard"))
      val per = docs.groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("shard_tokens"))
      val tot = per.agg(sum(col("shard_tokens")).as("total_tokens"))
      per.crossJoin(broadcast(tot))
        .select(col("shard"), col("n_docs"), col("shard_tokens"),
          ((col("shard_tokens") * 32).cast("double") / col("total_tokens"))
            .as("balance"))
    }),

    // ---- domain mixture report: token share per source and cumulative
    // share in contribution order — the "what fraction of the corpus do
    // the top-k domains supply" curve
    "q63_domain_mix" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val bySource = Tables.documents(s, d)
        .select(col("source"), size(split(col("text"), " ")).as("toks"))
        .groupBy(col("source"))
        .agg(sum(col("toks")).as("src_tokens"))
      val w = Window.orderBy(col("src_tokens").desc, col("source").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      bySource
        .select(col("source"), col("src_tokens"),
          sum(col("src_tokens")).over(w).as("cum_tokens"),
          sum(col("src_tokens")).over(wAll).as("total_tokens"))
        .select(col("source"), col("src_tokens"), col("cum_tokens"),
          (col("cum_tokens").cast("double") / col("total_tokens"))
            .as("cum_share"))
    }),

    // ---- sketch-accuracy audit: for every LSH candidate pair, the
    // Jaccard estimated from minhash agreement (matching minima / 16)
    // vs the exact distinct-trigram Jaccard — the report that validates
    // a sketch config before trusting it on 100 TB
    "q64_minhash_est" -> ((s, d) => {
      pairSketchStats(s, d)
        .select(col("doc_a"), col("doc_b"),
          (col("agree").cast("double") / lit(16.0)).as("est_jaccard"),
          (col("inter").cast("double") / col("uni")).as("exact_jaccard"))
    }),

    // ---- sketch CALIBRATION curve (q64's pair audit folded to the
    // estimator's 17 possible readings): for each minhash agreement
    // level a ∈ [0, 16], how far is the sketch's implied Jaccard
    // (a/16) from the mean exact Jaccard of the pairs it was read on?
    // This is the table that turns "the sketch looks right" into a
    // per-threshold bias number — the input to choosing the q21-family
    // match cutoff. Everything is exact integer fixed-point: per-pair
    // jac_ppm = inter·10⁶ div union, the level mean a div of two sums,
    // and the signed bias a plain subtraction (no float ever summed).
    // Scale: rides the same pair frame as q64 (banded, bucket-capped),
    // then folds to ≤17 rows in one map-combined aggregate.
    "q238_minhash_calibration" -> ((s, d) => {
      pairSketchStats(s, d)
        .select(col("agree").cast("bigint").as("n_agree"),
          expr("inter * 1000000 div uni").as("jac_ppm"))
        .groupBy(col("n_agree"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("jac_ppm")).as("jac_sum"),
          min(col("jac_ppm")).as("min_jac_ppm"),
          max(col("jac_ppm")).as("max_jac_ppm"))
        .select(col("n_agree"), col("n_pairs"),
          expr("n_agree * 1000000 div 16").as("est_ppm"),
          expr("jac_sum div n_pairs").as("mean_jac_ppm"),
          col("min_jac_ppm"), col("max_jac_ppm"),
          expr("n_agree * 1000000 div 16 - jac_sum div n_pairs")
            .as("bias_ppm"))
    }),

    // ---- DSIR-style importance selection (hashed n-gram features,
    // after Xie et al. 2023): score every doc by how target-like its
    // token distribution is, target = the en slice. Words hash into
    // DsirBuckets features; the per-bucket weight is the CROSS-
    // MULTIPLIED frequency contrast t_b*R - r_b*T (positive iff the
    // bucket is over-represented in the target) — the integer-exact
    // surrogate for the log-ratio (same sign, no transcendentals, so
    // the oracle matches bit-for-bit; a log-weighted variant would
    // hang cross-engine parity on libm rounding). keep = score > 0
    // selects docs whose summed bucket contrast leans target.
    // Scale: bucket stats are one map-combined pass to DsirBuckets
    // rows; the weight table broadcasts; scoring is one token-grain
    // map-side join + one map-combined per-doc sum — no big shuffle
    // ever carries more than (doc_id, 2 numbers). Products are
    // DECIMAL(18,0)×DECIMAL(18,0) (≤1e18 token counts — comfortable
    // even at 100 TB); the token-grain score sum stays within
    // DECIMAL(38,0) up to ~1e12-token corpora per the comment on `w`,
    // past which the weight would be floor-rescaled by R.
    "q131_dsir_resample" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("tok"))
        .withColumn("b", hashBucket("tok", 1, DsirBuckets))
      val buckets = toks.groupBy(col("b"))
        .agg(count(lit(1)).as("r_b"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("t_b"))
      val tot = buckets
        .agg(sum(col("r_b")).as("rr"), sum(col("t_b")).as("tt"))
      val w = buckets.crossJoin(broadcast(tot))
        .select(col("b"),
          (col("t_b").cast("decimal(18,0)") * col("rr").cast("decimal(18,0)")
            - col("r_b").cast("decimal(18,0)")
              * col("tt").cast("decimal(18,0)")).as("w"))
      // score accumulates EXACTLY in decimal(38,0); the emitted column is
      // its double image. Round 5 emitted the decimal itself and the
      // driver's compare hashed Spark's Decimal against DuckDB's
      // float64 (DuckDB→pandas narrows every DECIMAL to float64) — same
      // values, different representation, hash mismatch. keep is decided
      // on the exact decimal BEFORE the cast, so the selection itself
      // never rides float rounding; the cast is exact below 2^53 and
      // correctly rounded (IEEE) in both engines above it.
      toks.join(broadcast(w), "b")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_toks"),
          sum(col("w")).cast("decimal(38,0)").as("score_d"))
        .select(col("doc_id"), col("n_toks"),
          col("score_d").cast("double").as("score"),
          (col("score_d") > 0).as("keep"))
    }),

    // ---- TEMPERATURE-SCALED mixture weights (the multilingual /
    // multi-domain sampling-temperature recipe, τ = 2): raw share
    // p_i = tokens_i / total, temperature weight p_i^(1/τ) = sqrt(p_i),
    // boost = weight / share — how much a source is over-sampled
    // relative to its natural share (scarce sources up, dominant ones
    // down). Complements q61's hard budget cap with the smooth
    // re-weighting an actual pretraining mixture uses. Every double
    // op is exactly rounded (one division, one sqrt, one division) on
    // inputs that are exact longs, so the oracle replays bit-for-bit
    // — τ=2 is pinned BECAUSE sqrt is the one power the IEEE standard
    // makes deterministic; arbitrary τ would drag in pow()'s libm
    // variance. One map-combined aggregate to n_sources rows.
    "q136_temperature_mix" -> ((s, d) => {
      val src = Tables.documents(s, d)
        .select(col("source"), size(split(col("text"), " ")).as("toks"))
        .groupBy(col("source"))
        .agg(sum(col("toks")).as("src_tokens"))
      val tot = src.agg(sum(col("src_tokens")).as("total"))
      src.crossJoin(broadcast(tot))
        .select(col("source"), col("src_tokens"),
          (col("src_tokens").cast("double") / col("total").cast("double"))
            .as("share"))
        .select(col("source"), col("src_tokens"), col("share"),
          sqrt(col("share")).as("temp_weight"),
          (sqrt(col("share")) / col("share")).as("boost"))
    }),

    // ---- EXACT-k UNIFORM SAMPLE (eval-set carving): exactly k=100
    // documents, uniform over the corpus, deterministic across runs and
    // partitionings — the fixed-size complement of the RATE-based
    // samplers (q60's strata, q93's weights, q171's hash buckets): a
    // held-out eval set must be exactly k rows no matter how the corpus
    // grows. Order = md5 over a salted doc_id (independent of every
    // other sampler's key stream), doc_id tiebreak. ORDER BY + LIMIT
    // compiles to TakeOrderedAndProject — each task keeps a k-row heap
    // and only k·partitions candidate rows ever leave the scan: no
    // global sort, no full-corpus shuffle, the reservoir-sample plan
    // shape at any scale. (QueriesSpec: exact size, determinism, and
    // the heap plan.)
    "q198_uniform_k_sample" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
          md5(concat(lit("evalk:"), col("doc_id").cast("string"))
            .cast("binary")).as("uk"))
        .orderBy(col("uk").asc, col("doc_id").asc)
        .limit(100)
    })
  )

  /** Feature-hash width for q131 — small enough that the weight table
    * broadcasts trivially, wide enough that opposing-sign buckets don't
    * all collide at test scale. Mirrored in the oracle.
    */
  private val DsirBuckets = 64

  /** Shared oracle fragment: per-doc q124 score joined to source. */
  private def scoreBySourceSql: String =
    s"""t AS (SELECT doc_id,
      |    unnest(string_split(text, ' ')) AS tok FROM documents),
      |fb AS (SELECT doc_id, tok,
      |    ${hashBucketSql("tok", 1, 1024)} AS b FROM t),
      |fw AS (SELECT doc_id,
      |    (${hashBucketSql("b", 9, 2001)}) - 1000 AS w FROM fb),
      |pd AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS score
      |  FROM fw GROUP BY doc_id),
      |r AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(CASE WHEN pd.score >= 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_keep
      |  FROM documents d JOIN pd ON d.doc_id = pd.doc_id
      |  GROUP BY d.source),
      |k AS (SELECT source, n_docs,
      |    (n_keep * 1000000) // n_docs AS keep_ppm FROM r)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q230_sample_size_plan" ->
      s"""WITH $scoreBySourceSql
        |SELECT source, n_docs, keep_ppm,
        |  least(n_docs, (38416 * keep_ppm * (1000000 - keep_ppm)
        |    + 3999999999999) // 4000000000000) AS n_review
        |FROM k""".stripMargin,

    "q231_neyman_allocation" ->
      s"""WITH $scoreBySourceSql,
        |w AS (SELECT source, n_docs, keep_ppm,
        |    n_docs * CAST(floor(sqrt(CAST(keep_ppm
        |      * (1000000 - keep_ppm) AS DOUBLE))) AS BIGINT) AS w
        |  FROM k),
        |s AS (SELECT CAST(sum(w) AS BIGINT) AS sum_w FROM w),
        |b AS (SELECT w.source, w.n_docs, w.keep_ppm, w.w,
        |    CASE WHEN sum_w > 0 THEN (1000 * w.w) // sum_w
        |      ELSE 0 END AS floor_seats,
        |    CASE WHEN sum_w > 0 THEN (1000 * w.w) % sum_w
        |      ELSE 0 END AS rem
        |  FROM w, s),
        |e AS (SELECT CASE WHEN (SELECT sum_w FROM s) > 0
        |    THEN 1000 - CAST(sum(floor_seats) AS BIGINT)
        |    ELSE 0 END AS extra FROM b),
        |rk AS (SELECT b.*, CAST(row_number() OVER (ORDER BY rem DESC,
        |    source ASC) AS BIGINT) AS rk FROM b)
        |SELECT source, n_docs, keep_ppm, w,
        |  CAST(floor_seats + CASE WHEN rk <= extra THEN 1 ELSE 0 END
        |    AS BIGINT) AS n_review
        |FROM rk, e""".stripMargin,

    "q221_stratified_k_sample" ->
      s"""WITH r AS (SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY ${hashBucketSql("doc_id", 17, 1000000)}, doc_id)
        |      AS rk
        |  FROM documents)
        |SELECT source, doc_id, CAST(rk AS INT) AS rk
        |FROM r WHERE rk <= 20""".stripMargin,

    "q59_split_assign" ->
      s"""SELECT CASE
        |    WHEN ${hashBucketSql("doc_id", 1, 100)} < 80 THEN 'train'
        |    WHEN ${hashBucketSql("doc_id", 1, 100)} < 90 THEN 'val'
        |    ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |FROM documents
        |GROUP BY 1""".stripMargin,

    "q158_forget_audit" ->
      s"""WITH pairs AS (${TextQueries.minhashPairsSql}),
        |tomb AS (SELECT doc_id FROM documents
        |  WHERE ${hashBucketSql("doc_id", 7, 50)} = 13)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM tomb) AS n_tombstones,
        |  (SELECT CAST(count(*) AS BIGINT) FROM embeddings e
        |     JOIN tomb t ON e.vec_id = t.doc_id) AS n_vec_rows,
        |  (SELECT CAST(count(*) AS BIGINT) FROM pairs p
        |     WHERE p.doc_a IN (SELECT doc_id FROM tomb)
        |        OR p.doc_b IN (SELECT doc_id FROM tomb))
        |    AS n_pairs_touched,
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents
        |     WHERE doc_id NOT IN (SELECT doc_id FROM tomb))
        |    AS n_docs_after""".stripMargin,

    "q148_epoch_shuffle" ->
      s"""WITH k AS (SELECT doc_id,
        |    substr(md5(CAST(doc_id AS VARCHAR)), 17, 8) AS skey,
        |    ${hashBucketSql("doc_id", 25, 64)} AS shard
        |  FROM documents)
        |SELECT doc_id, skey, shard,
        |  CAST(row_number() OVER (PARTITION BY shard
        |    ORDER BY skey, doc_id) AS BIGINT) AS pos
        |FROM k""".stripMargin,

    "q149_split_leakage" ->
      s"""WITH pairs AS (${TextQueries.minhashPairsSql}),
        |sp AS (SELECT doc_id, CASE
        |    WHEN ${hashBucketSql("doc_id", 1, 100)} < 80 THEN 'train'
        |    WHEN ${hashBucketSql("doc_id", 1, 100)} < 90 THEN 'val'
        |    ELSE 'test' END AS split
        |  FROM documents)
        |SELECT sa.split AS split_a, sb.split AS split_b,
        |  count(*) AS n_pairs, (sa.split <> sb.split) AS leaky
        |FROM pairs p
        |JOIN sp sa ON sa.doc_id = p.doc_a
        |JOIN sp sb ON sb.doc_id = p.doc_b
        |GROUP BY sa.split, sb.split""".stripMargin,

    "q60_stratified_sample" ->
      s"""SELECT doc_id, lang, source FROM documents
        |WHERE ${hashBucketSql("doc_id", 9, 10)}
        |  < (CASE WHEN lang = 'en' THEN 2 ELSE 5 END)""".stripMargin,

    "q171_sample_estimate" ->
      s"""WITH d AS (SELECT
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
        |    ${hashBucketSql("doc_id", 13, 100)} AS hb
        |  FROM documents),
        |e AS (SELECT CAST(coalesce(sum(toks), 0) AS BIGINT)
        |      AS true_tokens,
        |    count(*) AS n_docs FROM d),
        |s AS (SELECT CAST(coalesce(sum(toks), 0) * 2 AS BIGINT)
        |      AS est_tokens,
        |    CAST(count(*) * 2 AS BIGINT) AS est_docs
        |  FROM d WHERE hb < 50)
        |SELECT true_tokens, n_docs, est_tokens, est_docs,
        |  (abs(est_tokens - true_tokens) * 20 <= true_tokens)
        |    AS tokens_within_5pct
        |FROM e, s""".stripMargin,

    "q166_balanced_downsample" ->
      s"""WITH o AS (SELECT doc_id, lang,
        |    ${hashBucketSql("doc_id", 5, 1000000)} * 10000000000
        |      + doc_id AS ord
        |  FROM documents),
        |m AS (SELECT CAST(min(c) AS BIGINT) AS mn FROM
        |    (SELECT count(*) AS c FROM o GROUP BY lang)),
        |r AS (SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY ord)
        |      AS BIGINT) AS rnk
        |  FROM o)
        |SELECT doc_id, lang, rnk FROM r, m WHERE rnk <= mn""".stripMargin,

    "q61_domain_budget" ->
      """WITH s AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS src_tokens
        |  FROM documents GROUP BY source)
        |SELECT source, n_docs, src_tokens,
        |  least(CAST(1.0 AS DOUBLE),
        |    CAST(3000.0 AS DOUBLE) / src_tokens) AS rate,
        |  CAST(floor(least(CAST(1.0 AS DOUBLE),
        |    CAST(3000.0 AS DOUBLE) / src_tokens) * src_tokens) AS BIGINT)
        |    AS kept_tokens
        |FROM s""".stripMargin,

    "q93_weighted_sample" ->
      s"""WITH mx AS (SELECT max(n_chars) AS mx FROM documents)
        |SELECT doc_id, n_chars FROM documents, mx
        |WHERE ${hashBucketSql("doc_id", 17, 1000000)} * mx
        |  < n_chars * 1000000""".stripMargin,

    "q100_shard_plan" ->
      s"""WITH t AS (SELECT doc_id,
        |    len(string_split(text, ' ')) AS toks,
        |    ${hashBucketSql("doc_id", 13, 32)} AS shard FROM documents),
        |p AS (SELECT shard, count(*) AS n_docs,
        |    CAST(sum(toks) AS BIGINT) AS shard_tokens
        |  FROM t GROUP BY shard),
        |tot AS (SELECT CAST(sum(shard_tokens) AS BIGINT) AS total_tokens
        |  FROM p)
        |SELECT shard, n_docs, shard_tokens,
        |  CAST(shard_tokens * 32 AS DOUBLE) / total_tokens AS balance
        |FROM p, tot""".stripMargin,

    "q128_curriculum_order" ->
      s"""WITH base AS (SELECT doc_id, source,
        |    (${hashBucketSql("source", 17, 4)}) + 1 AS w,
        |    (${hashBucketSql("doc_id", 1, 1000000)}) * 10000000000
        |      + doc_id AS src_ord
        |  FROM documents),
        |r AS (SELECT doc_id, source, w,
        |    row_number() OVER (PARTITION BY source ORDER BY src_ord)
        |      AS rs
        |  FROM base),
        |o AS (SELECT doc_id, source,
        |    (rs * (12 // w)) * 10000000000 + doc_id AS ord FROM r)
        |SELECT doc_id, source,
        |  row_number() OVER (ORDER BY ord) AS global_pos
        |FROM o""".stripMargin,

    "q99_mixture_sample" ->
      s"""WITH t AS (SELECT doc_id, source,
        |    len(string_split(text, ' ')) AS toks FROM documents),
        |s AS (SELECT source, CAST(sum(toks) AS BIGINT) AS src_tokens
        |  FROM t GROUP BY source),
        |n AS (SELECT count(*) AS n_src FROM s)
        |SELECT t.source, count(*) AS n_docs_kept,
        |  CAST(sum(t.toks) AS BIGINT) AS kept_tokens
        |FROM t JOIN s ON t.source = s.source, n
        |WHERE CAST(${hashBucketSql("doc_id", 25, 1000000)} AS HUGEINT)
        |  * n.n_src * s.src_tokens < CAST(50000 AS HUGEINT) * 1000000
        |GROUP BY t.source""".stripMargin,

    // sqrt is correctly rounded in IEEE (identical bits both engines);
    // everything after the floor is BIGINT floor division
    "q202_temperature_mixture" ->
      """WITH t AS (SELECT source,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT)
        |      AS src_tokens
        |  FROM documents GROUP BY source),
        |w AS (SELECT source, src_tokens,
        |    CAST(floor(sqrt(CAST(src_tokens AS DOUBLE))) AS BIGINT) AS w
        |  FROM t),
        |s AS (SELECT CAST(sum(w) AS BIGINT) AS sum_w FROM w)
        |SELECT source, src_tokens, w,
        |  (100000 * w) // sum_w AS planned_tokens,
        |  (((100000 * w) // sum_w) * 1000) // src_tokens AS epochs_x1000
        |FROM w, s""".stripMargin,

    // same closed-form waterline: saturation predicate on the
    // cap-ascending prefix sum, floor level + first-(rem mod slots)
    // remainder hand-out. All operands non-negative, so // and div
    // agree.
    "q206_budget_waterfill" ->
      """WITH caps AS (SELECT source,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT)
        |      AS cap_tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(cap_tokens) AS BIGINT) AS total_tokens,
        |    CAST(count(*) AS BIGINT) AS n_src FROM caps),
        |r AS (SELECT source, cap_tokens,
        |    CAST(row_number() OVER (ORDER BY cap_tokens, source)
        |      AS BIGINT) AS i,
        |    CAST(coalesce(sum(cap_tokens) OVER (
        |      ORDER BY cap_tokens, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS prefix
        |  FROM caps),
        |st AS (SELECT r.source, r.cap_tokens, r.i,
        |    n_src - i + 1 AS slots,
        |    (total_tokens // 2) - prefix AS rem,
        |    cap_tokens * (n_src - i + 1)
        |      <= (total_tokens // 2) - prefix AS sat
        |  FROM r, tot),
        |cut AS (SELECT min(i) AS cut_i, min_by(rem, i) AS rem_cut,
        |    min_by(slots, i) AS slots_cut
        |  FROM st WHERE NOT sat)
        |SELECT source, cap_tokens,
        |  CAST(CASE WHEN sat THEN cap_tokens
        |    ELSE rem_cut // slots_cut
        |      + (CASE WHEN i - cut_i < rem_cut % slots_cut
        |         THEN 1 ELSE 0 END) END AS BIGINT) AS alloc_tokens,
        |  sat AS saturated
        |FROM st, cut""".stripMargin,

    // bucket cap first (buckets of > cap+1 members emit no pairs),
    // then the degree cap — the exact double-filter the Spark plan runs
    "q87_triangles" ->
      s"""WITH bh AS (${TextQueries.minhashBandsSql}),
        |small AS (SELECT band, h FROM bh GROUP BY band, h
        |  HAVING count(DISTINCT doc_id)
        |    BETWEEN 2 AND ${MaxTriangleDegree + 1}),
        |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bh a
        |  JOIN small s ON a.band = s.band AND a.h = s.h
        |  JOIN bh b ON a.band = b.band AND a.h = b.h
        |    AND a.doc_id < b.doc_id),
        |deg AS (SELECT v, count(*) AS deg FROM (
        |    SELECT doc_a AS v FROM pairs
        |    UNION ALL SELECT doc_b FROM pairs) GROUP BY v),
        |keep AS (SELECT v FROM deg WHERE deg <= $MaxTriangleDegree),
        |e AS (SELECT doc_a, doc_b FROM pairs
        |  JOIN keep ka ON ka.v = pairs.doc_a
        |  JOIN keep kb ON kb.v = pairs.doc_b)
        |SELECT count(*) AS triangles
        |FROM e e1
        |JOIN e e2 ON e1.doc_b = e2.doc_a
        |JOIN e e3 ON e1.doc_a = e3.doc_a AND e2.doc_b = e3.doc_b""".stripMargin,

    // same recursive-CTE clusters as q62; the keeper is computed with
    // an explicit window here (oracle clarity over oracle speed) —
    // identical (n_toks DESC, doc_id ASC) order as the Spark argmax
    "q111_canonical_by_length" ->
      s"""WITH RECURSIVE pairs AS (${TextQueries.minhashPairsSql}),
        |edges AS (
        |  SELECT doc_a AS s, doc_b AS t FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |reach(node, r) AS (
        |  SELECT DISTINCT s, s FROM edges
        |  UNION
        |  SELECT e.s, re.r FROM edges e JOIN reach re ON re.node = e.t),
        |cl AS (SELECT node AS doc_id, min(r) AS cluster
        |  FROM reach GROUP BY node),
        |t AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |  FROM documents),
        |m AS (SELECT cl.cluster, cl.doc_id, t.n_toks,
        |    row_number() OVER (PARTITION BY cl.cluster
        |      ORDER BY t.n_toks DESC, cl.doc_id ASC) AS rn,
        |    count(*) OVER (PARTITION BY cl.cluster) AS cs
        |  FROM cl JOIN t ON cl.doc_id = t.doc_id)
        |SELECT cluster, CAST(cs AS BIGINT) AS cluster_size,
        |  doc_id AS canonical_id, n_toks
        |FROM m WHERE rn = 1""".stripMargin,

    "q62_dup_clusters" ->
      s"""WITH RECURSIVE pairs AS (${TextQueries.minhashPairsSql}),
        |edges AS (
        |  SELECT doc_a AS s, doc_b AS t FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |reach(node, r) AS (
        |  SELECT DISTINCT s, s FROM edges
        |  UNION
        |  SELECT e.s, re.r FROM edges e JOIN reach re ON re.node = e.t)
        |SELECT node AS doc_id, min(r) AS cluster
        |FROM reach GROUP BY node""".stripMargin,

    "q185_cluster_sizes" ->
      s"""WITH RECURSIVE pairs AS (${TextQueries.minhashPairsSql}),
        |edges AS (
        |  SELECT doc_a AS s, doc_b AS t FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |reach(node, r) AS (
        |  SELECT DISTINCT s, s FROM edges
        |  UNION
        |  SELECT e.s, re.r FROM edges e JOIN reach re ON re.node = e.t),
        |cl AS (SELECT node AS doc_id, min(r) AS cluster
        |  FROM reach GROUP BY node),
        |sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size
        |  FROM cl GROUP BY 1)
        |SELECT cluster_size, count(*) AS n_clusters,
        |  CAST(cluster_size * count(*) AS BIGINT) AS n_docs
        |FROM sz GROUP BY cluster_size""".stripMargin,

    "q261_cluster_density" ->
      s"""WITH RECURSIVE pairs AS (${TextQueries.minhashPairsSql}),
        |edges AS (
        |  SELECT doc_a AS s, doc_b AS t FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |reach(node, r) AS (
        |  SELECT DISTINCT s, s FROM edges
        |  UNION
        |  SELECT e.s, re.r FROM edges e JOIN reach re ON re.node = e.t),
        |cl AS (SELECT node AS doc_id, min(r) AS cluster
        |  FROM reach GROUP BY node),
        |n AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_members
        |  FROM cl GROUP BY 1),
        |dp AS (SELECT cl.cluster,
        |    CAST(count(*) AS BIGINT) AS n_direct_pairs
        |  FROM pairs p JOIN cl ON p.doc_a = cl.doc_id GROUP BY 1)
        |SELECT n.cluster, n.n_members, dp.n_direct_pairs,
        |  CAST((CAST(dp.n_direct_pairs AS HUGEINT) * 2000000)
        |    // (CAST(n.n_members AS HUGEINT) * (n.n_members - 1))
        |    AS BIGINT) AS density_ppm,
        |  4 * CAST(dp.n_direct_pairs AS HUGEINT)
        |    < CAST(n.n_members AS HUGEINT) * (n.n_members - 1)
        |    AS chain_risk
        |FROM n JOIN dp ON n.cluster = dp.cluster""".stripMargin,

    "q63_domain_mix" ->
      """WITH s AS (
        |  SELECT source,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS src_tokens
        |  FROM documents GROUP BY source)
        |SELECT source, src_tokens,
        |  CAST(sum(src_tokens) OVER (ORDER BY src_tokens DESC, source ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_tokens,
        |  (CAST(sum(src_tokens) OVER (ORDER BY src_tokens DESC, source ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / sum(src_tokens) OVER ()) AS cum_share
        |FROM s""".stripMargin,

    "q64_minhash_est" ->
      s"""WITH pairs AS (${TextQueries.minhashPairsSql}),
        |toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |shraw AS (SELECT doc_id,
        |    concat_ws(' ', tk[p], tk[p+1], tk[p+2]) AS sh
        |  FROM (SELECT doc_id, tk,
        |      unnest(generate_series(1, greatest(len(tk)-2, 1))) AS p
        |    FROM toks)),
        |hashed AS (SELECT doc_id,
        |    CAST(concat('0x', substr(md5(sh), 1, 10)) AS BIGINT) AS ha,
        |    CAST(concat('0x', substr(md5(sh), 17, 10)) AS BIGINT) AS hb
        |  FROM shraw),
        |wide AS (SELECT doc_id,
        |  ${(0 until 16).map(i => s"min(ha + $i * hb) AS m$i")
             .mkString(",\n  ")}
        |  FROM hashed GROUP BY doc_id),
        |est AS (SELECT p.doc_a, p.doc_b,
        |    (CAST((${(0 until 16)
             .map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)")
             .mkString(" + ")}) AS DOUBLE) / CAST(16.0 AS DOUBLE))
        |      AS est_jaccard
        |  FROM pairs p
        |  JOIN wide a ON p.doc_a = a.doc_id
        |  JOIN wide b ON p.doc_b = b.doc_id),
        |tri AS (SELECT DISTINCT doc_id, sh FROM shraw),
        |n AS (SELECT doc_id, count(*) AS n FROM tri GROUP BY doc_id),
        |inter AS (SELECT p.doc_a, p.doc_b, count(*) AS inter
        |  FROM pairs p
        |  JOIN tri x ON x.doc_id = p.doc_a
        |  JOIN tri y ON y.doc_id = p.doc_b AND x.sh = y.sh
        |  GROUP BY p.doc_a, p.doc_b)
        |SELECT e.doc_a, e.doc_b, e.est_jaccard,
        |  (CAST(coalesce(i.inter, 0) AS DOUBLE)
        |    / (na.n + nb.n - coalesce(i.inter, 0))) AS exact_jaccard
        |FROM est e
        |LEFT JOIN inter i ON e.doc_a = i.doc_a AND e.doc_b = i.doc_b
        |JOIN n na ON na.doc_id = e.doc_a
        |JOIN n nb ON nb.doc_id = e.doc_b""".stripMargin,

    "q238_minhash_calibration" ->
      s"""WITH pairs AS (${TextQueries.minhashPairsSql}),
        |toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |shraw AS (SELECT doc_id,
        |    concat_ws(' ', tk[p], tk[p+1], tk[p+2]) AS sh
        |  FROM (SELECT doc_id, tk,
        |      unnest(generate_series(1, greatest(len(tk)-2, 1))) AS p
        |    FROM toks)),
        |hashed AS (SELECT doc_id,
        |    CAST(concat('0x', substr(md5(sh), 1, 10)) AS BIGINT) AS ha,
        |    CAST(concat('0x', substr(md5(sh), 17, 10)) AS BIGINT) AS hb
        |  FROM shraw),
        |wide AS (SELECT doc_id,
        |  ${(0 until 16).map(i => s"min(ha + $i * hb) AS m$i")
             .mkString(",\n  ")}
        |  FROM hashed GROUP BY doc_id),
        |ag AS (SELECT p.doc_a, p.doc_b,
        |    CAST((${(0 until 16)
             .map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)")
             .mkString(" + ")}) AS BIGINT) AS agree
        |  FROM pairs p
        |  JOIN wide a ON p.doc_a = a.doc_id
        |  JOIN wide b ON p.doc_b = b.doc_id),
        |tri AS (SELECT DISTINCT doc_id, sh FROM shraw),
        |n AS (SELECT doc_id, count(*) AS n FROM tri GROUP BY doc_id),
        |inter AS (SELECT p.doc_a, p.doc_b, count(*) AS inter
        |  FROM pairs p
        |  JOIN tri x ON x.doc_id = p.doc_a
        |  JOIN tri y ON y.doc_id = p.doc_b AND x.sh = y.sh
        |  GROUP BY p.doc_a, p.doc_b),
        |pp AS (SELECT ag.agree,
        |    (CAST(coalesce(i.inter, 0) AS BIGINT) * 1000000)
        |      // (na.n + nb.n - coalesce(i.inter, 0)) AS jac_ppm
        |  FROM ag
        |  LEFT JOIN inter i ON ag.doc_a = i.doc_a AND ag.doc_b = i.doc_b
        |  JOIN n na ON na.doc_id = ag.doc_a
        |  JOIN n nb ON nb.doc_id = ag.doc_b)
        |SELECT agree AS n_agree, CAST(count(*) AS BIGINT) AS n_pairs,
        |  (agree * 1000000) // 16 AS est_ppm,
        |  CAST(sum(jac_ppm) // count(*) AS BIGINT) AS mean_jac_ppm,
        |  CAST(min(jac_ppm) AS BIGINT) AS min_jac_ppm,
        |  CAST(max(jac_ppm) AS BIGINT) AS max_jac_ppm,
        |  CAST((agree * 1000000) // 16 - sum(jac_ppm) // count(*)
        |    AS BIGINT) AS bias_ppm
        |FROM pp GROUP BY agree""".stripMargin,

    "q131_dsir_resample" ->
      s"""WITH t AS (SELECT doc_id, lang,
        |    unnest(string_split(text, ' ')) AS tok FROM documents),
        |tb AS (SELECT doc_id, lang,
        |    ${hashBucketSql("tok", 1, DsirBuckets)} AS b FROM t),
        |agg AS (SELECT b, CAST(count(*) AS BIGINT) AS r_b,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS t_b
        |  FROM tb GROUP BY b),
        |tot AS (SELECT CAST(sum(r_b) AS BIGINT) AS rr,
        |    CAST(sum(t_b) AS BIGINT) AS tt FROM agg),
        |w AS (SELECT b,
        |    CAST(t_b AS DECIMAL(18,0)) * CAST(rr AS DECIMAL(18,0))
        |      - CAST(r_b AS DECIMAL(18,0)) * CAST(tt AS DECIMAL(18,0))
        |      AS w
        |  FROM agg, tot)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
        |  CAST(CAST(sum(w) AS DECIMAL(38,0)) AS DOUBLE) AS score,
        |  sum(w) > 0 AS keep
        |FROM tb JOIN w USING (b)
        |GROUP BY doc_id""".stripMargin,

    "q136_temperature_mix" ->
      """WITH s AS (
        |  SELECT source,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT)
        |      AS src_tokens
        |  FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total FROM s),
        |sh AS (SELECT source, src_tokens,
        |    CAST(src_tokens AS DOUBLE) / CAST(total AS DOUBLE) AS share
        |  FROM s, t)
        |SELECT source, src_tokens, share,
        |  sqrt(share) AS temp_weight,
        |  sqrt(share) / share AS boost
        |FROM sh""".stripMargin,

    "q198_uniform_k_sample" ->
      """SELECT doc_id, lang, source,
        |  md5(concat('evalk:', CAST(doc_id AS VARCHAR))) AS uk
        |FROM documents
        |ORDER BY uk ASC, doc_id ASC
        |LIMIT 100""".stripMargin
  )
}
