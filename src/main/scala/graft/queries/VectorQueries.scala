package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Vectors

/** Similarity search over the `embeddings` table: brute-force cosine
  * top-k (baseline), sign-bucket LSH ANN (scale path), and bucketed
  * embedding near-duplicate pairs. DuckDB oracles use the same
  * sequential-fold arithmetic for bit-identical doubles.
  */
object VectorQueries {
  type Q = (SparkSession, String) => DataFrame

  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, 64), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), " +
      "(acc, v) -> acc + v)"

  private def bucketSql(a: String, nbits: Int): String =
    (0 until nbits)
      .map(i => s"(CASE WHEN $a[${i + 1}] >= 0 THEN ${1 << i} ELSE 0 END)")
      .mkString(" + ")

  // ---- k-means training constants (q113/q114): quantization scale,
  // cluster count, Lloyd iterations — pinned so the DuckDB oracle can
  // unroll the exact same run
  private val KmScale = 1000000L
  private val KmK = 8
  private val KmIters = 2
  // q122 guardrail: clusters above this size emit no dedup pairs (the
  // production knob is k itself — see the q122 comment)
  private val SemMaxCluster = 20000L

  // ---- shared index artifacts (Shared.scala): train once per run,
  // consume everywhere. Deterministic (md5 init, integer arithmetic,
  // pinned iters), so a memoized result is bit-identical to an inline
  // retrain and oracle hashes cannot move.

  /** The full-corpus centroid set consumed by q113/q114/q122/q126. */
  private def centroidsFull(s: SparkSession, d: String): Seq[(Int, Seq[Long])] =
    Shared.centroids(s, "km_full", d)(
      Vectors.kmeansQ(Tables.embeddings(s, d), "vec_id", "embedding",
        KmK, KmIters, KmScale))

  /** q130's index-time centroid set: trained on the OLD 80% hash split. */
  private def centroidsOld80(s: SparkSession, d: String): Seq[(Int, Seq[Long])] =
    Shared.centroids(s, "km_old80", d)(
      Vectors.kmeansQ(
        Tables.embeddings(s, d)
          .filter(SamplingQueries.hashBucket("vec_id", 1, 10) < 8),
        "vec_id", "embedding", KmK, KmIters, KmScale))

  /** The quantized-vector frame (vec_id, qv, n2) every integer-dot
    * consumer derives: one map-side pass, persisted once per run. */
  private def quantizedVecs(s: SparkSession, d: String): DataFrame =
    Shared.frame(s, "qvecs", d) {
      Tables.embeddings(s, d).select(col("vec_id"),
          expr("transform(embedding, x -> " +
            s"CAST(floor(CAST(x AS DOUBLE) * ${KmScale}L) AS BIGINT))")
            .as("qv"))
        .withColumn("n2", expr("doti(qv, qv)"))
    }

  /** The capped cluster-membership frame (cid, vec_id, qv, n2) that both
    * q122 (semantic dedup) and q126 (hard negatives) route pairs through:
    * trained assignment joined to quantized vectors, restricted to
    * clusters within SemMaxCluster. Built once per run. */
  private def semanticMembers(s: SparkSession, d: String): DataFrame =
    Shared.frame(s, "sem_members", d) {
      val e = Tables.embeddings(s, d)
      val assign = Vectors.assignTrained(e, "vec_id", "embedding",
        centroidsFull(s, d), KmScale)
      val member = assign.join(quantizedVecs(s, d), "vec_id")
      val okCids = member.groupBy(col("cid"))
        .agg(count(lit(1)).as("m"))
        .filter(col("m") <= SemMaxCluster).select(col("cid"))
      member.join(broadcast(okCids), "cid")
    }

  /** The SRP signature frame (vec_id, qv, sig) — the index-build pass of
    * the hash ANN leg, shared by q132 (search) and q138 (recall audit).
    * Planes are sliced ONCE into one 64-long array per bit in a broadcast
    * one-row frame — the per-row work is then 32 doti calls (tight long
    * loops, no per-step lambda allocation). In production this IS the
    * persisted index; here it persists for the run. */
  private def srpSignatures(s: SparkSession, d: String): DataFrame =
    Shared.frame(s, "srp_sig", d) {
      val planes = s.range(1).select(expr(srpPlanesExpr).as("pl"))
        .select((0 until SrpBits).map(j =>
          expr(s"slice(pl, ${j * SrpDims + 1}, $SrpDims)").as(s"pl$j")): _*)
      Tables.embeddings(s, d).crossJoin(broadcast(planes))
        .withColumn("qv",
          expr("transform(embedding, x -> " +
            s"CAST(floor(CAST(x AS DOUBLE) * ${KmScale}L) AS BIGINT))"))
        .select(col("vec_id"), col("qv"), expr(srpSigExpr).as("sig"))
    }

  /** The stacked per-(subspace, vector) frame the PQ family trains and
    * encodes from: one corpus scan feeding all PqM subspaces. */
  private def pqStacked(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
      posexplode(expr(s"transform(sequence(0, ${PqM - 1}), " +
        s"ss -> slice(embedding, ss * $PqDims + 1, $PqDims))"))
        .as(Seq("gid", "sub")))

  /** The 8 PQ subspace codebooks — trained ONCE per run and shared by
    * q120 (PQ recall audit) and q159 (IVF-PQ search): at 100 TB codebook
    * training is the index-build job, never a per-query cost. */
  private def pqBooksShared(s: SparkSession,
      d: String): Map[Int, Seq[(Int, Seq[Long])]] =
    Shared.books(s, "pq_books", d)(
      Vectors.kmeansQMulti(pqStacked(Tables.embeddings(s, d)),
        "gid", "vec_id", "sub", PqK, PqIters, KmScale))

  /** The encoded corpus — one code per (subspace, vector): the PQ index
    * itself (8 bytes/vector at 100 TB vs 256 bytes of floats). Encoded
    * once per run; consumers filter it and ADC-score the codes. */
  private def pqCodesShared(s: SparkSession, d: String): DataFrame =
    Shared.frame(s, "pq_codes", d) {
      import s.implicits._
      val centDf = pqBooksShared(s, d).toSeq.flatMap { case (g, cs) =>
        cs.map { case (cid, ce) => (g, cid, ce) }
      }.toDF("gid", "cid", "ce")
      pqStacked(Tables.embeddings(s, d))
        .select(col("gid"), col("vec_id"),
          expr(s"transform(sub, x -> CAST(floor(CAST(x AS DOUBLE) * " +
            s"${KmScale}L) AS BIGINT))").as("sv"))
        .join(broadcast(centDf), "gid")
        .select(col("gid"), col("vec_id"), col("cid"),
          expr("doti(sv, ce)").as("d"))
        .groupBy(col("gid"), col("vec_id"))
        .agg(max_by(col("cid"), struct(col("d"), (-col("cid")).as("nc")))
          .as("cid"))
    }

  /** One Lloyd iteration as DuckDB CTEs: assignment (integer-dot argmax
    * against `prev`), per-(cid, dim) floor-divided means, and the next
    * centroid set `cur` (empty clusters keep their previous centroid) —
    * the exact mirror of Vectors.kmeansQ's pass.
    */
  /** Assignment-only CTE (argmax of integer dot against `prev`) — also
    * used standalone by q114 for the serving-side assignment. */
  private def kmAssignCte(i: Int, prev: String): String =
    s"""a$i AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT q.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        list_reduce(list_transform(generate_series(1, 64),
       |          i -> q.qv[i] * c.ce[i]), (a, v) -> a + v) DESC,
       |        c.cid ASC) AS rn
       |    FROM q, $prev c) WHERE rn = 1)""".stripMargin

  private def kmIterCtes(i: Int, prev: String, cur: String): String =
    s"""${kmAssignCte(i, prev)},
       |m$i AS (
       |  SELECT a.cid, g.pos,
       |    CAST(floor(CAST(sum(q.qv[g.pos]) AS DOUBLE) / count(*))
       |      AS BIGINT) AS mv
       |  FROM a$i a JOIN q USING (vec_id)
       |  CROSS JOIN generate_series(1, 64) g(pos)
       |  GROUP BY a.cid, g.pos),
       |$cur AS (
       |  SELECT c.cid, list(coalesce(m.mv, c.ce[g.pos]) ORDER BY g.pos)
       |    AS ce
       |  FROM $prev c CROSS JOIN generate_series(1, 64) g(pos)
       |  LEFT JOIN m$i m ON m.cid = c.cid AND m.pos = g.pos
       |  GROUP BY c.cid)""".stripMargin

  /** Quantize + seed + `KmIters` unrolled Lloyd passes; the final
    * centroid set is `c$KmIters`. Shared by the q113/q114/q122/q126
    * oracles; `where` restricts the TRAINING set (q130 trains on the
    * old split only).
    */
  private def kmeansCtes: String = kmeansCtesWhere("")

  private def kmeansCtesWhere(where: String): String = {
    val iters = (1 to KmIters)
      .map(i => kmIterCtes(i, s"c${i - 1}", s"c$i")).mkString(",\n")
    s"""q AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * $KmScale) AS BIGINT)) AS qv
       |  FROM embeddings $where),
       |c0 AS (
       |  SELECT cid, qv AS ce FROM (
       |    SELECT qv, CAST(row_number() OVER (ORDER BY
       |      md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC) - 1 AS INT)
       |      AS cid
       |    FROM q) WHERE cid < $KmK),
       |$iters""".stripMargin
  }

  /** md5 digest of a quantized-vector array column — the family identity
    * behind q186's dedup staging (identical vectors ⇒ identical digests;
    * 128-bit md5 is collision-safe at corpus scale, the canonicalInputBy
    * contract). */
  private[queries] def vecDigest(c: String): org.apache.spark.sql.Column =
    md5(expr(s"array_join(transform($c, x -> CAST(x AS STRING)), ',')")
      .cast("binary"))

  /** Cost probe for q186's staged-vs-raw choice (VERDICT r8 #1 — the
    * q170 low-dup short-circuit applied to vectors): canonical staging
    * wins 43.5 s → 2.3 s at 10× clone density but pays ~3× pure
    * overhead on a clone-free corpus (1.03 s vs the driver's 0.35 s
    * unstaged plan at sf0.1, where 500 vectors carry zero duplicates).
    * Staged and raw are BIT-IDENTICAL on every corpus
    * (DecontamStagingSpec), so the branch is purely a cost choice:
    * stage only when ≥ 5% of vector rows are non-canonical (the q170
    * threshold). The probe is ONE planner-scale aggregate over the
    * run-shared persisted quantized frame — a digest-grain
    * count-distinct, noise next to the batch × pool pass it gates. */
  private[graft] def decontamLowDup(s: SparkSession, d: String): Boolean = {
    val r = quantizedVecs(s, d)
      .agg(count(lit(1)).as("n"), countDistinct(vecDigest("qv")).as("c"))
      .collect()(0)
    (r.getLong(0) - r.getLong(1)) * 20L < r.getLong(0)
  }

  /** The exact batch × pool decontamination pass at the grain of its
    * inputs (ev: eval_id, evv, n2e; tr: train_id, tv, n2t): per eval
    * vector the max-dot train vector under the (dot desc, train_id asc)
    * total order, plus the norm-corrected cos ≥ 1/2 verdict in exact
    * cross-multiplied DECIMAL(38,0) arithmetic. Shared by q186 (both
    * its staged and raw paths) and q194's exact reference leg.
    */
  private def decontamExact(ev: DataFrame, tr: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("eval_id"))
      .orderBy(col("dot").desc, col("train_id").asc)
    ev.crossJoin(tr)
      .select(col("eval_id"), col("train_id"),
        expr("doti(evv, tv)").as("dot"), col("n2e"), col("n2t"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("eval_id"), col("train_id"), col("dot"),
        (col("dot") > 0 &&
          col("dot").cast("decimal(38,0)") * col("dot") * 4
            >= col("n2e").cast("decimal(38,0)") * col("n2t"))
          .as("contaminated"))
  }

  val queries: Map[String, Q] = Map(
    // ---- brute-force cosine top-10 vs the vec_id=0 query vector:
    // broadcast 1-row query side, one codegen'd pass, no shuffle
    // ---- EMBEDDING CENTERING (per-dim mean removal — the standard
    // pre-ANN normalization; centered corpora make SRP planes and IVF
    // cells balance): per-dimension means from ONE map-combined stats
    // pass over the shared quantized frame (64 output rows), folded to
    // a one-row broadcast array, applied map-side with zip_with. The
    // mean is the kmeansQ floor idiom (floor of double division over
    // the exact integer sum) so the oracle replays it bit-for-bit.
    // Scale: stats are 64 rows regardless of corpus; centering never
    // shuffles a vector — the only exchange is the 64-row aggregate.
    "q152_embed_center" -> ((s, d) => {
      val qv = quantizedVecs(s, d)
      val means = qv
        .select(posexplode(col("qv")).as(Seq("pos", "x")))
        .groupBy(col("pos"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .select(col("pos"),
          expr("CAST(floor(CAST(sx AS DOUBLE) / n) AS BIGINT)").as("m"))
        .agg(sort_array(collect_list(struct(col("pos"), col("m"))))
          .as("pm"))
        .select(expr("transform(pm, p -> p.m)").as("ms"))
      // House rule (VERDICT r6 #1): no raw array/struct columns in query
      // outputs — the driver's pandas canonicalization can't sort them.
      // The centered vector leaves as a deterministic md5 over the
      // comma-joined decimal components (DuckDB `array_to_string` and
      // Spark `array_join∘transform(cast)` render bigints identically),
      // plus the L1 mass as the human-auditable scalar.
      qv.crossJoin(broadcast(means))
        .select(col("vec_id"),
          expr("zip_with(qv, ms, (x, m) -> x - m)").as("cv"))
        .select(col("vec_id"),
          md5(expr("array_join(transform(cv, x -> CAST(x AS STRING)), ',')")
            .cast("binary")).as("cv_md5"),
          expr("aggregate(cv, 0L, (a, v) -> a + abs(v))").as("l1"))
    }),

    // ---- EMBEDDING NORM QA (pre-index data-quality audit): the
    // distribution of squared norms, log2-bucketed, plus degenerate
    // counts — the check that catches broken encoders (zero vectors,
    // magnitude blowups, mixed scales) BEFORE an index is built on
    // them; the vector-side sibling of q78's relational DQ audit.
    // log2 bucketing is INTEGER-EXACT: bucket = length(bin(n2)) — the
    // bit length of the exact integer squared norm from the shared
    // quantized frame — so no libm log enters the contract. Scale: one
    // map-side pass over (vec_id, n2), one map-combined aggregate to
    // ≤64 buckets.
    "q157_norm_audit" -> ((s, d) => {
      quantizedVecs(s, d)
        .select(col("vec_id"), col("n2"),
          length(expr("bin(n2)")).cast("bigint").as("bits"))
        .groupBy(col("bits"))
        .agg(count(lit(1)).as("n_vecs"),
          min(col("n2")).as("min_n2"),
          max(col("n2")).as("max_n2"),
          sum(when(col("n2") === 0L, 1L).otherwise(0L)).as("n_zero"))
    }),

    // ---- RETRIEVAL METRICS HARNESS (precision@10 / MRR / nDCG@10):
    // the eval step every retrieval stack needs and none of the index
    // queries provide — how good is a ranking against labeled ground
    // truth, not just against a brute-force twin (q138's recall audits
    // measure index fidelity; this measures ranking QUALITY). Ranking =
    // the integer-dot exact leg over the shared quantized frame (ties
    // to smallest vec_id); relevant = shares the query vector's label.
    // nDCG's 1/log2(i+1) weights are PINNED integer constants (×1e6) —
    // the rank domain is 1..10, so the whole metric family stays in
    // exact integer arithmetic (no runtime libm; the one emitted double
    // is a single division). Scale: ranking is the q28 top-k shape
    // (corpus-wide top-10 of 16-byte rows), metrics touch 10 rows, the
    // ideal-DCG leg is one map-combined label count.
    "q153_retrieval_metrics" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Seq(1000000L, 630930L, 500000L, 430677L, 386853L,
        356207L, 333333L, 315465L, 301030L, 289065L)
      val wExpr = s"array(${w.mkString("L, ")}L)"
      val e = Tables.embeddings(s, d)
      val qv = quantizedVecs(s, d)
      val q = qv.filter(col("vec_id") === 0).select(col("qv").as("qb"))
      val qLabel = e.filter(col("vec_id") === 0)
        .select(col("label").as("ql"))
      val top10 = qv.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), expr("doti(qv, qb)").as("score"))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(10)
        .withColumn("rank", row_number().over( // post-limit 10-row frame
          Window.orderBy(col("score").desc, col("vec_id").asc)))
        .join(e.select(col("vec_id"), col("label")), "vec_id")
        .crossJoin(broadcast(qLabel))
        .select(col("rank"),
          when(col("label") === col("ql"), 1L).otherwise(0L).as("rel"))
      // ideal DCG: total relevant count in the corpus (minus the query
      // itself), capped at 10, summed over the best-case weight prefix
      val nRel = e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qLabel))
        .agg(sum(when(col("label") === col("ql"), 1L).otherwise(0L))
          .as("n_rel_total"))
      top10.agg(
          sum(col("rel")).as("hits"),
          coalesce(max(when(col("rel") === 1L,
            expr("1000000L div rank"))), lit(0L)).as("mrr_x1e6"),
          sum(expr(s"rel * element_at($wExpr, rank)")).as("dcg_x1e6"))
        .crossJoin(broadcast(nRel))
        .select(lit(10).as("k"), col("hits"), col("mrr_x1e6"),
          col("dcg_x1e6"), col("n_rel_total"),
          expr(s"aggregate(slice($wExpr, 1, " +
            "CAST(least(n_rel_total, 10L) AS INT)), 0L, (a, x) -> a + x)")
            .as("idcg_x1e6"))
        .withColumn("ndcg",
          col("dcg_x1e6").cast("double") / col("idcg_x1e6"))
    }),

    "q28_cosine_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      // query norm computed ONCE in the broadcast 1-row frame — not per
      // corpus row; dot/(norm*qn) is bit-identical to Vectors.cosine
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"))
        .withColumn("qn", Vectors.norm("qe"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"),
          (Vectors.dot("embedding", "qe")
            / (Vectors.norm("embedding") * col("qn"))).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
        .limit(10)
    }),

    // ---- ANN via 4-bit sign-bucket LSH: route the query to its bucket,
    // exact cosine re-rank inside the bucket only
    "q29_ann_bucket" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .withColumn("bucket", Vectors.signBucket("embedding", 4))
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"), col("bucket").as("qbucket"))
        .withColumn("qn", Vectors.norm("qe"))
      e.filter(col("vec_id") =!= 0)
        .join(broadcast(q), col("bucket") === col("qbucket"))
        .select(col("vec_id"), col("bucket"),
          (Vectors.dot("embedding", "qe")
            / (Vectors.norm("embedding") * col("qn"))).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
        .limit(5)
    }),

    // ---- IVF ANN: coarse-quantize to the nearest of 16 centroids
    // (deterministic stand-in for sampled k-means: vec_ids 0..15), then
    // exact cosine re-rank inside the query's cluster only. The
    // assignment is a broadcast cross join + windowed argmax — the same
    // plumbing a trained IVF index uses at 100 TB.
    "q35_ann_ivf" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cents = e.filter(col("vec_id") < 16)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("ce"))
      val assign = Vectors.ivfAssign(e, "embedding", "vec_id", cents)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"))
        .withColumn("qn", Vectors.norm("qe"))
      val qCluster = assign.filter(col("vec_id") === 0)
        .select(col("cid").as("qcid"))
      e.join(assign, "vec_id")
        .join(broadcast(qCluster), col("cid") === col("qcid"))
        .filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("cid"),
          (Vectors.dot("embedding", "qe")
            / (Vectors.norm("embedding") * col("qn"))).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
        .limit(5)
    }),

    // ---- IVF with nprobe=2: probe the TWO centroids nearest the query
    // and re-rank their union — the standard recall/latency knob on an
    // IVF index (q35 is nprobe=1). Probe selection is a 16-row broadcast
    // sort; candidate filtering is a broadcast semi-style join.
    "q57_ivf_nprobe2" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cents = e.filter(col("vec_id") < 16)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("ce"))
      val assign = Vectors.ivfAssign(e, "embedding", "vec_id", cents)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"))
        .withColumn("qn", Vectors.norm("qe"))
      val qprobe = q.crossJoin(broadcast(cents))
        .select(col("cid"), Vectors.dot("qe", "ce").as("dsim"))
        .orderBy(col("dsim").desc, col("cid").asc)
        .limit(2)
        .select(col("cid").as("qcid"))
      e.join(assign, "vec_id")
        .join(broadcast(qprobe), col("cid") === col("qcid"))
        .filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("cid"),
          (Vectors.dot("embedding", "qe")
            / (Vectors.norm("embedding") * col("qn"))).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
        .limit(5)
    }),

    // ---- ANN recall audit: recall@5 of the IVF nprobe=1 index (q35)
    // against the brute-force top-5 ground truth (q28) for the same
    // query vector — the measurement that decides whether an index
    // config is trustworthy BEFORE it replaces exact search at 100 TB
    // (the sketch-audit pattern of q64, applied to vectors). Both sides
    // are tiny ranked frames; the intersection is a 5-row join.
    "q102_ann_recall" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"))
        .withColumn("qn", Vectors.norm("qe"))
      def score(df: DataFrame): DataFrame = df
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          (Vectors.dot("embedding", "qe")
            / (Vectors.norm("embedding") * col("qn"))).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
        .limit(5)
        .select(col("vec_id"))
      val brute = score(e.filter(col("vec_id") =!= 0))
      val cents = e.filter(col("vec_id") < 16)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("ce"))
      val assign = Vectors.ivfAssign(e, "embedding", "vec_id", cents)
      val qCluster = assign.filter(col("vec_id") === 0)
        .select(col("cid").as("qcid"))
      val ivf = score(e.join(assign, "vec_id")
        .join(broadcast(qCluster), col("cid") === col("qcid"))
        .filter(col("vec_id") =!= 0))
      brute.join(ivf, "vec_id")
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(5).as("k"), col("n_hits"),
          (col("n_hits") / lit(5)).as("recall"))
    }),

    // ---- IVF index BUILD: deterministic distributed k-means (Lloyd,
    // 2 passes, k=8) over integer-quantized embeddings — the trainer
    // the fixed-centroid IVF queries (q35/q57/q102) assumed existed.
    // Quantization makes every training step exact integer arithmetic,
    // so the oracle replays the IDENTICAL run; output is the final
    // centroid matrix as (cid, pos, cval) rows.
    "q113_kmeans_centroids" -> ((s, d) => {
      import s.implicits._
      centroidsFull(s, d)
        .flatMap { case (cid, ce) =>
          ce.zipWithIndex.map { case (v, i) => (cid, i + 1, v) } }
        .toDF("cid", "pos", "cval")
    }),

    // ---- INCREMENTAL CENTROID REFRESH (mini-batch k-means step):
    // completes the index lifecycle the suite already covers — build
    // (q113) → serve (q114) → audit staleness (q130) → REFRESH, the
    // maintenance pass a 100 TB index runs per arriving batch instead
    // of retraining. Today's batch (vec_id%10==7, the q145/q96
    // batch-incremental posture) is assigned to the frozen shared
    // centroids (broadcast, map-combined argmax); each touched
    // (cid, dim) blends old value with the batch mean under a pinned
    // prior mass W=100 — new = floor((old·W + Σbatch)/(W + n)) — the
    // standard EMA-style update in exact integer+floor arithmetic.
    // Untouched cells keep their value. Scale: cost is batch × k, never
    // corpus × k; the output is the k×64 centroid table itself.
    "q154_centroid_refresh" -> ((s, d) => {
      import s.implicits._
      val cents = centroidsFull(s, d)
      val old = cents.flatMap { case (cid, ce) =>
          ce.zipWithIndex.map { case (v, i) => (cid, i + 1, v) } }
        .toDF("cid", "pos", "old_val")
      val batch = Tables.embeddings(s, d)
        .filter(col("vec_id") % 10 === 7)
      val assign = Vectors.assignTrained(batch, "vec_id", "embedding",
        cents, KmScale)
      // batch vectors re-quantize INLINE (the quantizedVecs expression)
      // rather than joining the full shared corpus frame — the 100×
      // smoke measured that join moving 275 MB of corpus qv rows for a
      // 10% batch; this way only batch rows ever exist in the plan
      val batchQv = batch.select(col("vec_id"),
        expr("transform(embedding, x -> " +
          s"CAST(floor(CAST(x AS DOUBLE) * ${KmScale}L) AS BIGINT))")
          .as("qv"))
      val sums = assign
        .join(batchQv, "vec_id")
        .select(col("cid"), posexplode(col("qv")).as(Seq("p0", "x")))
        .select(col("cid"), (col("p0") + 1).as("pos"), col("x"))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      old.join(sums, Seq("cid", "pos"), "left")
        .select(col("cid"), col("pos"), col("old_val"),
          coalesce(
            expr("CAST(floor(CAST(old_val * 100 + sx AS DOUBLE)" +
              " / (100 + n)) AS BIGINT)"),
            col("old_val")).as("new_val"),
          coalesce(col("n"), lit(0L)).as("n_new"))
    }),

    // ---- trained-IVF recall audit: the q102 measurement re-run with
    // centroids from q113's k-means instead of the fixed vec_id<16 set,
    // probing the query's 3 nearest lists. The synthetic embeddings are
    // i.i.d. Gaussian — there is NO cluster structure to exploit, so
    // IVF recall is essentially proportional to corpus coverage
    // (k=8 × nprobe=3 ≈ 38%); on real embedding manifolds the same
    // index recovers far more per probed list. The audit is the point:
    // it is the measurement that decides whether a trained index may
    // replace exact search. VectorOpsSpec asserts this recall >=
    // q102's fixed-centroid recall.
    "q114_ivf_trained_recall" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cents = centroidsFull(s, d)
      val assign = Vectors.assignTrained(e, "vec_id", "embedding",
        cents, KmScale)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"))
        .withColumn("qn", Vectors.norm("qe"))
      def score(df: DataFrame): DataFrame = df
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          (Vectors.dot("embedding", "qe")
            / (Vectors.norm("embedding") * col("qn"))).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
        .limit(5)
        .select(col("vec_id"))
      val brute = score(e.filter(col("vec_id") =!= 0))
      val qProbe = Vectors.assignTrained(e.filter(col("vec_id") === 0),
          "vec_id", "embedding", cents, KmScale, nprobe = 3)
        .select(col("cid").as("qcid"))
      val ivf = score(e.join(assign, "vec_id")
        .join(broadcast(qProbe), col("cid") === col("qcid"))
        .filter(col("vec_id") =!= 0))
      brute.join(ivf, "vec_id")
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(5).as("k"), col("n_hits"),
          (col("n_hits") / lit(5)).as("recall"))
    }),

    // ---- DEDUP-AGREEMENT matrix: which dedup family catches what?
    // One-row meta-audit a pipeline owner reads before choosing the
    // dedup stack — per-doc membership flags from three independent
    // legs (P: exact 64-char-prefix duplicates, the q55 family;
    // M: MinHash-LSH candidate-pair membership, the q21/q62 family;
    // V: embedding sign-bucket near-dup membership, the q30 family)
    // folded into corpus-level counts + pairwise overlaps. The legs
    // reuse the exact pinned configs of their home queries, so this
    // audit measures the REAL operators, not lookalikes. Scale shape:
    // the audit runs on a DETERMINISTIC HASH-SAMPLE of the corpus
    // (1/2 here; the q74/q106/q118 audit-on-a-tractable-slice
    // discipline — production sets the rate by target audit cost, the
    // relative catch rates are the product), and the embedding leg
    // additionally caps sign-buckets at 256 members (oracle-mirrored)
    // — uncapped, 100× clone density measured 53 GB of spill in that
    // leg's pair join; capped + sampled it is bounded at any density.
    // The fold is three doc-grain left joins + one map-combined 1-row
    // aggregate.
    "q146_dedup_agreement" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .filter(SamplingQueries.hashBucket("doc_id", 4, 2) === 0)
      val p = docs.select(col("doc_id"),
        substring(col("text"), 1, 64).as("pfx"))
      val pdup = p.groupBy(col("pfx")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2).select(col("pfx"))
      val pset = p.join(pdup, "pfx").select(col("doc_id")).distinct()
        .withColumn("p", lit(1L))
      val mp = graft.functions.Text.candidatePairs(docs, "doc_id", "text")
      val mset = mp.select(col("doc_a").as("doc_id"))
        .unionByName(mp.select(col("doc_b").as("doc_id"))).distinct()
        .withColumn("m", lit(1L))
      val e = Tables.embeddings(s, d)
        .join(docs.select(col("doc_id").as("vec_id")), "vec_id")
        .withColumn("bucket", Vectors.signBucket("embedding", 8))
        .withColumn("nrm", Vectors.norm("embedding"))
      val bcap = e.groupBy(col("bucket")).agg(count(lit(1)).as("bm"))
        .filter(col("bm") <= 256).select(col("bucket"))
      val ec = e.join(bcap, "bucket")
      val a = ec.select(col("vec_id").as("vec_a"),
        col("embedding").as("ea"), col("nrm").as("na"), col("bucket"))
      val bb = ec.select(col("vec_id").as("vec_b"),
        col("embedding").as("eb"), col("nrm").as("nb"),
        col("bucket").as("bucket_b"))
      val vp = a.join(bb, col("bucket") === col("bucket_b")
          && col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          (Vectors.dot("ea", "eb") / (col("na") * col("nb"))).as("cosine"))
        .filter(col("cosine") >= 0.2)
      val vset = vp.select(col("vec_a").as("doc_id"))
        .unionByName(vp.select(col("vec_b").as("doc_id"))).distinct()
        .withColumn("v", lit(1L))
      docs.select(col("doc_id"))
        .join(pset, Seq("doc_id"), "left")
        .join(mset, Seq("doc_id"), "left")
        .join(vset, Seq("doc_id"), "left")
        .na.fill(0L, Seq("p", "m", "v"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("p")).as("n_prefix"),
          sum(col("m")).as("n_minhash"),
          sum(col("v")).as("n_embed"),
          sum(col("p") * col("m")).as("n_pm"),
          sum(col("p") * col("v")).as("n_pv"),
          sum(col("m") * col("v")).as("n_mv"),
          sum(when(col("p") + col("m") + col("v") > 0, 1L)
            .otherwise(0L)).as("n_any"))
    }),

    // ---- BITEXT MINING with a margin criterion (the LASER/CCMatrix
    // shape): for every en document, its nearest zh document by
    // embedding similarity, accepted only when the best target beats
    // the runner-up by a 10/9 ratio margin — the filter that separates
    // true translation pairs from hubness noise in parallel-corpus
    // mining. All-integer ranking: KmScale-quantized embeddings,
    // codegen'd doti scores, margin decided by cross-multiplication
    // (accept ⟺ best > 0 AND 10·second ≤ 9·best — sign-safe when the
    // runner-up dot is negative), ties to the smallest tgt_id. Scale
    // shape: mining is BATCH-INCREMENTAL (the q96 posture) — the src
    // side is today's drop (doc_id % 10 == 7 stands in), so per-run
    // cost is batch × pool, not corpus × corpus; at 100 TB the pool
    // side additionally comes pre-filtered by the ANN legs
    // (q35/q57/q132) with this same margin applied to their top-2 —
    // this entry is the exact leg those serve (the q28 posture).
    // Top-2 via a row_number window partitioned on src_id: partition
    // count = batch size (bounded by the slice), rows per partition =
    // pool size — 76 s / 2.4 GB exchanged / zero spill at 100× clone
    // density. An aggregation-based top-2 (two max(struct) passes)
    // was measured 5× WORSE (396 s): struct max falls out of hash
    // aggregation into sort-based partials, so each pass sorts every
    // scored row — the window sorts them once.
    "q145_bitext_margin" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
      val qv = quantizedVecs(s, d).select(col("vec_id"), col("qv"))
        .join(docs, col("vec_id") === col("doc_id"))
      val src = qv.filter(col("lang") === "en" && col("vec_id") % 10 === 7)
        .select(col("vec_id").as("src_id"), col("qv").as("sv"))
      val tgt = qv.filter(col("lang") === "zh")
        .select(col("vec_id").as("tgt_id"), col("qv").as("tv"))
      val w = Window.partitionBy(col("src_id"))
        .orderBy(col("dot").desc, col("tgt_id").asc)
      src.crossJoin(broadcast(tgt))
        .select(col("src_id"), col("tgt_id"),
          expr("doti(sv, tv)").as("dot"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .groupBy(col("src_id"))
        .agg(
          max(when(col("rn") === 1, col("tgt_id"))).as("tgt_id"),
          max(when(col("rn") === 1, col("dot"))).as("best_dot"),
          max(when(col("rn") === 2, col("dot"))).as("second_dot"))
        .select(col("src_id"), col("tgt_id"), col("best_dot"),
          col("second_dot"),
          (col("best_dot") > 0 &&
            col("second_dot") * 10 <= col("best_dot") * 9).as("accepted"))
    }),

    // ---- embedding near-duplicate pairs: 8-bit sign buckets bound the
    // candidate set; exact cosine filters inside buckets. The shuffle key
    // is a small int; vectors move once.
    "q30_embedding_neardup" -> ((s, d) => {
      // norms precomputed per VECTOR (linear), not per pair (quadratic):
      // sqrt(dotf(e,e)) yields the same double either way, so the
      // division below is bit-identical to the all-per-pair oracle form
      val e = Tables.embeddings(s, d)
        .withColumn("bucket", Vectors.signBucket("embedding", 8))
        .withColumn("nrm", Vectors.norm("embedding"))
      val a = e.select(col("vec_id").as("vec_a"),
        col("embedding").as("ea"), col("nrm").as("na"), col("bucket"))
      val b = e.select(col("vec_id").as("vec_b"),
        col("embedding").as("eb"), col("nrm").as("nb"),
        col("bucket").as("bucket_b"))
      a.join(b, col("bucket") === col("bucket_b")
          && col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          (Vectors.dot("ea", "eb") / (col("na") * col("nb"))).as("cosine"))
        .filter(col("cosine") >= 0.2)
    }),

    // ---- PRODUCT QUANTIZATION recall audit: the other half of the ANN
    // index family (IVF routes, PQ compresses). The 64-dim embedding is
    // split into 8 subspaces of 8 dims; each subspace trains its own
    // 16-centroid k-means (the q113 trainer, unchanged — it is
    // dimension-agnostic), every vector is encoded as 8 one-byte codes,
    // and queries score by ADC (asymmetric distance): per subspace the
    // query precomputes its dot with each of the 16 centroids (a 128-
    // entry literal table), so scoring a corpus vector is 8 map lookups
    // + an add — never a full-vector multiply. At 100 TB this is the
    // difference between scanning 256 GB of codes and 25 TB of floats.
    // Every step (training, encoding, ADC, the brute ground truth) runs
    // in quantized INTEGER space, so the oracle replays the identical
    // index build and the recall is hash-exact. Ground truth is top-5
    // by integer dot (MIPS) — the metric ADC approximates. Recall on
    // i.i.d. Gaussian embeddings is the honest-audit point, as in q114.
    // Cost split at 100 TB: training (16 passes here) runs on a bounded
    // md5-threshold SAMPLE in production — only the one-pass encode
    // touches the full corpus; the oracle pins full-corpus training
    // because the replay must see the same rows.
    "q120_pq_recall" -> ((s, d) => {
      import s.implicits._
      // codebooks + encoded corpus are the SHARED index artifacts
      // (pqBooksShared / pqCodesShared — one training, one encode pass
      // per run; kmeansQMulti feeds all 8 subspaces from ONE scan; at
      // 100 TB that is 8x fewer corpus passes; arithmetic identical per
      // subspace, asserted in VectorOpsSpec)
      val booksM = pqBooksShared(s, d)
      val qv = quantizedVecs(s, d).select(col("vec_id"), col("qv"))
      // the query vector is one row — same index-build-scale collect as
      // the codebooks themselves
      val qrow: Seq[Long] = qv.filter(col("vec_id") === 0)
        .collect()(0).getSeq[Long](1).toIndexedSeq
      val brute = qv.filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          aggregate(zip_with(col("qv"), typedlit(qrow), (x, y) => x * y),
            lit(0L), (a, v) => a + v).as("score"))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(5).select(col("vec_id"))
      // ADC tables for all subspaces as one broadcast (gid, cid, pd)
      // frame: scoring a corpus vector is 8 map lookups + an add over
      // the shared code frame
      val pdDf = booksM.toSeq.flatMap { case (g, cs) =>
        cs.map { case (cid, ce) =>
          (g, cid, ce.zipWithIndex.map { case (c, j) =>
            c * qrow(g * PqDims + j) }.sum)
        }
      }.toDF("gid", "cid", "pd")
      val pq = pqCodesShared(s, d).filter(col("vec_id") =!= 0)
        .join(broadcast(pdDf), Seq("gid", "cid"))
        .groupBy(col("vec_id")).agg(sum(col("pd")).as("score"))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(5).select(col("vec_id"))
      brute.join(pq, "vec_id")
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(5).as("k"), col("n_hits"),
          (col("n_hits") / lit(5)).as("recall"))
    }),

    // ---- SEMANTIC decontamination (embedding-space contamination
    // detection — the vector complement of the n-gram decontamination
    // family q51/q116/q127, which paraphrased eval leakage slips
    // past): for every eval-split vector (10% hash split), its nearest
    // train-split vector by integer dot and the cos ≥ 0.5 verdict in
    // exact cross-multiplied arithmetic (dot > 0 ∧ 4·dot² ≥
    // |e|²·|t|², DECIMAL(38,0)/HUGEINT — the q122 idiom at a stricter
    // threshold). Exact batch × pool leg by design (the q145 posture:
    // eval sets are small; at 100 TB the pool side comes pre-filtered
    // by the ANN legs and THIS is the final exact check); the window
    // partitions on high-cardinality eval_id. Nearest-by-dot is the
    // documented ranking heuristic; the contamination THRESHOLD is
    // norm-corrected and exact.
    // The staged-vs-raw choice is COST-BASED (VERDICT r8 #1): the
    // decontamLowDup probe measures duplicate-family mass first and
    // runs the raw batch × pool pass when families are ~all size 1
    // (clone-free corpora — where staging is pure overhead), staging
    // only when ≥ 5% of rows are non-canonical. Forcing confs:
    // spark.graft.vector.rawDecontam=true pins raw,
    // spark.graft.vector.stagedDecontam=true pins staged (the spec's
    // equality hook). The STAGED path (VERDICT r6 #3, the q190
    // discipline applied to vectors): each side collapses
    // exact-duplicate vector families (Curation.canonicalInputBy over
    // the md5 of the quantized
    // components) BEFORE the batch × pool pass, verdicts expand back to
    // eval members afterwards. LOSSLESS, not approximate: identical
    // vectors have identical dots, and the (dot desc, train_id asc)
    // winner among raw train vectors is exactly the winner among train
    // CANONICALS (every tied member's family is tied, and each family's
    // min id IS its canonical) — so output is bit-identical to the
    // unstaged pass (DecontamStagingSpec; DuckDB oracle unchanged).
    // This removes the clone-corpus blowup measured in round 6 (43.5 s
    // at 10× — both sides 4× ⇒ 16× pairs): canonical grain is
    // clone-invariant, expansion is one member join. The unstaged pass
    // stays behind spark.graft.vector.rawDecontam=true. The
    // complementary ANN-prefilter leg (probe the trained IVF index,
    // exact-verify survivors — for when even the CANONICAL pool is too
    // big for batch × pool) is q194_decontam_ann_audit.
    "q186_semantic_decontam" -> ((s, d) => {
      val qv = quantizedVecs(s, d)
      val ev = qv
        .filter(SamplingQueries.hashBucket("vec_id", 1, 10) === 9)
        .select(col("vec_id").as("eval_id"), col("qv").as("evv"),
          col("n2").as("n2e"))
      val tr = qv
        .filter(SamplingQueries.hashBucket("vec_id", 1, 10) =!= 9)
        .select(col("vec_id").as("train_id"), col("qv").as("tv"),
          col("n2").as("n2t"))
      val raw = s.conf.getOption("spark.graft.vector.rawDecontam")
        .exists(_.toBoolean)
      val forceStaged = s.conf
        .getOption("spark.graft.vector.stagedDecontam").exists(_.toBoolean)
      if (raw || (!forceStaged && decontamLowDup(s, d)))
        decontamExact(ev, tr)
      else {
        val (evCanon, evMembers) = graft.operators.Curation
          .canonicalInputBy(ev, vecDigest("evv"), "eval_id")
        val (trCanon, _) = graft.operators.Curation
          .canonicalInputBy(tr, vecDigest("tv"), "train_id")
        evMembers.select(col("eval_id"), col("canon"))
          .join(decontamExact(evCanon, trCanon)
            .withColumnRenamed("eval_id", "canon"), "canon")
          .select(col("eval_id"), col("train_id"), col("dot"),
            col("contaminated"))
      }
    }),

    // ---- ANN-PREFILTERED decontamination audit (VERDICT r6 #3's
    // scale leg, coded): probe the TRAINED IVF index with each eval
    // vector (its nprobe=3 nearest of the k=8 shared centroids — the
    // q114 serving idiom), exact-verify ONLY pool vectors living in
    // probed cells, and audit the result against the exact leg (q186's
    // staged pass) per eval vector: did the prefilter find the true
    // nearest, and — the decision that matters — does the
    // CONTAMINATION verdict agree? At 100 TB this is the posture for a
    // pool too big even at canonical grain for batch × pool: candidate
    // cost is |eval| × (nprobe/k) × pool instead of |eval| × pool, and
    // THIS audit (run on a slice, the q74/q118 discipline) is the
    // measurement that licenses the approximation — on these
    // structureless i.i.d. Gaussian embeddings nearest-recall ≈
    // coverage (the q114 finding), while true near-dups (cos ≥ 1/2)
    // co-assign with high probability, so verdict agreement runs far
    // ahead of nearest agreement. Every step is deterministic (pinned
    // centroids, integer dots, total-order tiebreaks), so the DuckDB
    // oracle replays the probing bit-for-bit — the audit itself is
    // hash-gated, not just eyeballed.
    "q194_decontam_ann_audit" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cents = centroidsFull(s, d)
      val e = Tables.embeddings(s, d)
      val evRaw = e.filter(SamplingQueries.hashBucket("vec_id", 1, 10) === 9)
      val trRaw = e.filter(SamplingQueries.hashBucket("vec_id", 1, 10) =!= 9)
      val trAssign = Vectors.assignTrained(trRaw, "vec_id", "embedding",
        cents, KmScale).toDF("train_id", "cid")
      val evProbe = Vectors.assignTrained(evRaw, "vec_id", "embedding",
        cents, KmScale, nprobe = 3).toDF("eval_id", "cid")
      val qv = quantizedVecs(s, d)
      val evq = qv.select(col("vec_id").as("eval_id"),
        col("qv").as("evv"), col("n2").as("n2e"))
      val trq = qv.select(col("vec_id").as("train_id"),
        col("qv").as("tv"), col("n2").as("n2t"))
      val w = Window.partitionBy(col("eval_id"))
        .orderBy(col("dot").desc, col("train_id").asc)
      val ann = evProbe.join(trAssign, "cid")
        .select(col("eval_id"), col("train_id")).distinct()
        .join(evq, "eval_id").join(trq, "train_id")
        .select(col("eval_id"), col("train_id"),
          expr("doti(evv, tv)").as("dot"), col("n2e"), col("n2t"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("eval_id"), col("train_id").as("ann_train_id"),
          col("dot").as("ann_dot"),
          (col("dot") > 0 &&
            col("dot").cast("decimal(38,0)") * col("dot") * 4
              >= col("n2e").cast("decimal(38,0)") * col("n2t"))
            .as("ann_contaminated"))
      queries("q186_semantic_decontam")(s, d)
        .join(ann, Seq("eval_id"), "left")
        .select(col("eval_id"), col("ann_train_id"), col("ann_dot"),
          coalesce(col("ann_contaminated"), lit(false))
            .as("ann_contaminated"),
          col("contaminated").as("exact_contaminated"),
          (col("ann_train_id") <=> col("train_id")).as("nearest_agrees"),
          (coalesce(col("ann_contaminated"), lit(false))
            === col("contaminated")).as("verdict_agrees"))
    }),

    // ---- BITEXT LENGTH-RATIO QA (the Moore–Lewis-era parallel-corpus
    // cleaning heuristic, applied to q145's mined pairs): aligned
    // sentence pairs whose lengths diverge past 2:1 are usually
    // misalignments — emit each ACCEPTED pair with both character
    // lengths and the integer-cross-multiplied ratio verdict. Rides
    // q145's margin-mined pairs (the pool-scale work lives there);
    // this QA adds two doc-grain joins over a ≤|batch|-row frame.
    "q184_bitext_ratio" -> ((s, d) => {
      val acc = queries("q145_bitext_margin")(s, d)
        .filter(col("accepted"))
        .select(col("src_id"), col("tgt_id"))
      val len = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"))
      acc
        .join(len.toDF("src_id", "src_chars"), "src_id")
        .join(len.toDF("tgt_id", "tgt_chars"), "tgt_id")
        .select(col("src_id"), col("tgt_id"), col("src_chars"),
          col("tgt_chars"),
          (least(col("src_chars"), col("tgt_chars")) * 2
            >= greatest(col("src_chars"), col("tgt_chars"))).as("len_ok"))
    }),

    // ---- CLUSTER PROTOTYPE selection (eval-set / inspection-set
    // construction): the 2 most central members of every trained
    // k-means cluster — centrality = integer dot with the cluster's
    // own centroid — the representative-picking step behind SemDeDup
    // inspection sets, label-efficient eval sampling, and "show me
    // what this cluster IS" tooling. Per-cluster top-2 runs through
    // the HEAP TopK Aggregator (operators/TopK — map-side-combined
    // 2-element buffers; clusters are LOW-cardinality, so the window
    // form would single-reduce each cluster's full membership, the
    // q110 class). Dots ≤ ~1e14 sit exactly in double (< 2^53), so
    // the Aggregator's double score is integer-exact; rides the
    // shared centroids + quantized frame.
    "q181_cluster_prototypes" -> ((s, d) => {
      import s.implicits._
      val cents = centroidsFull(s, d)
      val centDf = cents.toDF("cid", "ce")
      val qv = quantizedVecs(s, d).select(col("vec_id"), col("qv"))
      val assign = Vectors.assignTrained(Tables.embeddings(s, d),
        "vec_id", "embedding", cents, KmScale)
      val topk = udaf(new graft.operators.TopKAgg(2))
      assign.join(qv, "vec_id")
        .join(broadcast(centDf), "cid")
        .select(col("cid"),
          expr("CAST(doti(qv, ce) AS DOUBLE)").as("score"),
          col("vec_id").as("id"))
        .groupBy(col("cid"))
        .agg(topk(col("score"), col("id")).as("tops"))
        .select(col("cid"), posexplode(col("tops")))
        .select(col("cid"), (col("pos") + 1).cast("int").as("rn"),
          col("col.id").as("vec_id"),
          col("col.score").cast("bigint").as("centrality"))
    }),

    // ---- MAXSIM late-interaction retrieval (the ColBERT shape): the
    // query and each document are treated as BAGS of 8 sub-vectors
    // (the 64-dim embedding sliced 8×8 — standing in for per-token
    // embeddings), and the score is Σ_j max_k <q_j, d_k>: each query
    // sub-vector independently finds its best-matching document
    // sub-vector. This is the retrieval family's fourth scoring model
    // beside whole-vector dot (q28), lexical BM25 (q129) and their RRF
    // fusion (q135) — late interaction catches partial/term-level
    // matches a single pooled vector averages away. All 64 sub-dots
    // run IN-ROW as codegen'd doti over array slices against literal
    // query slices (no explode, no join, no shuffle before the global
    // top-10 of 16-byte rows); integer-exact end to end. At 100 TB the
    // production form stores sub-vectors pre-sliced and prunes
    // candidates with an ANN leg first (q132/q159); the scoring
    // semantics here are exact.
    "q169_maxsim_topk" -> ((s, d) => {
      val qv = quantizedVecs(s, d).select(col("vec_id"), col("qv"))
      val qrow: Seq[Long] = qv.filter(col("vec_id") === 0)
        .collect()(0).getSeq[Long](1).toIndexedSeq
      val scoreExpr = (0 until 8).map { j =>
        val qj = qrow.slice(j * 8, j * 8 + 8).map(v => s"${v}L")
          .mkString(", ")
        (0 until 8).map(k =>
          s"doti(slice(qv, ${k * 8 + 1}, 8), array($qj))")
          .mkString("greatest(", ", ", ")")
      }.mkString("(", " + ", ")")
      qv.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), expr(scoreExpr).as("maxsim"))
        .orderBy(col("maxsim").desc, col("vec_id").asc)
        .limit(10)
    }),

    // ---- IVF-PQ combined search (the FAISS IVFPQ posture, and the
    // first leg that composes TWO index structures): the trained IVF
    // coarse quantizer (q113's shared centroids) routes the query to
    // its nprobe=2 nearest lists, and only vectors in those lists are
    // ADC-scored against the shared PQ code frame — at 100 TB the scan
    // touches nprobe/k of 8-byte codes instead of the full float
    // corpus (the q35/q57 routing win × the q120 compression win).
    // Audited as recall@10 vs the integer-dot brute-force ground truth
    // — the compound fidelity number (routing loss × quantization
    // loss) an index team actually tracks; both index artifacts are
    // the memoized per-run builds, so this query's marginal cost is
    // the probe-filtered ADC scan. All-integer end to end; the oracle
    // replays IVF training, PQ training, encoding, routing and ADC
    // bit-for-bit.
    "q159_ivfpq_recall" -> ((s, d) => {
      import s.implicits._
      val e = Tables.embeddings(s, d)
      val cents = centroidsFull(s, d)
      val assign = Vectors.assignTrained(e, "vec_id", "embedding",
        cents, KmScale)
      val qProbe = Vectors.assignTrained(e.filter(col("vec_id") === 0),
          "vec_id", "embedding", cents, KmScale, nprobe = 2)
        .select(col("cid").as("qcid"))
      val qv = quantizedVecs(s, d).select(col("vec_id"), col("qv"))
      val qrow: Seq[Long] = qv.filter(col("vec_id") === 0)
        .collect()(0).getSeq[Long](1).toIndexedSeq
      val pdDf = pqBooksShared(s, d).toSeq.flatMap { case (g, cs) =>
        cs.map { case (cid, ce) =>
          (g, cid, ce.zipWithIndex.map { case (c, j) =>
            c * qrow(g * PqDims + j) }.sum)
        }
      }.toDF("gid", "cid", "pd")
      val candIds = assign.join(broadcast(qProbe),
          col("cid") === col("qcid"))
        .filter(col("vec_id") =!= 0).select(col("vec_id"))
      val ivfpq = pqCodesShared(s, d)
        .join(candIds, "vec_id")
        .join(broadcast(pdDf), Seq("gid", "cid"))
        .groupBy(col("vec_id")).agg(sum(col("pd")).as("score"))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(10).select(col("vec_id"))
      val brute = qv.filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          aggregate(zip_with(col("qv"), typedlit(qrow), (x, y) => x * y),
            lit(0L), (a, v) => a + v).as("score"))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(10).select(col("vec_id"))
      brute.join(ivfpq, "vec_id")
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(10).as("k"), col("n_hits"),
          (col("n_hits") / lit(10)).as("recall"))
    }),

    // ---- SCALAR QUANTIZATION (int8) recall audit: the third ANN index
    // leg next to IVF (routing, q114) and PQ (subspace codes, q120).
    // Train = one aggregate for per-dim min/max (64 doubles — broadcast
    // as a single row); encode = a map-side transform to one signed
    // byte per dim, code = floor((x-mn)/(mx-mn)*255)-128 in exactly
    // this parenthesization (float→double conversion and each IEEE op
    // are exactly rounded, so DuckDB replays the codes bit-identically);
    // score = codegen'd integer dot over the codes. At 100 TB: 4 bytes
    // → 1 byte per dim, no codebook state beyond 128 doubles, encode
    // never shuffles. Ground truth is top-5 by quantized integer dot
    // (as q120); recall on i.i.d. Gaussians is the honest-audit point.
    "q125_sq_recall" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val stats = e
        .select(posexplode(col("embedding")).as(Seq("pos0", "x")))
        .groupBy((col("pos0") + 1).as("pos"))
        .agg(min(col("x").cast("double")).as("mn"),
          max(col("x").cast("double")).as("mx"))
        .agg(expr("transform(sort_array(collect_list(struct(pos, mn))), " +
          "t -> t.mn)").as("mins"),
          expr("transform(sort_array(collect_list(struct(pos, mx))), " +
            "t -> t.mx)").as("maxs"))
      val codeExpr = "transform(embedding, (x, i) -> CASE WHEN " +
        "element_at(maxs, i + 1) = element_at(mins, i + 1) THEN 0L ELSE " +
        "CAST(floor((CAST(x AS DOUBLE) - element_at(mins, i + 1)) / " +
        "(element_at(maxs, i + 1) - element_at(mins, i + 1)) * 255.0D) " +
        "AS BIGINT) - 128 END)"
      val codes = e.crossJoin(broadcast(stats))
        .select(col("vec_id"), expr(codeExpr).as("code"))
      val qcode = codes.filter(col("vec_id") === 0)
        .select(col("code").as("qc"))
      val sq = codes.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qcode))
        .select(col("vec_id"), expr("doti(code, qc)").as("score"))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(5).select(col("vec_id"))
      val qv = quantizedVecs(s, d).select(col("vec_id"), col("qv"))
      val qq = qv.filter(col("vec_id") === 0).select(col("qv").as("qb"))
      val brute = qv.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qq))
        .select(col("vec_id"), expr("doti(qv, qb)").as("score"))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(5).select(col("vec_id"))
      brute.join(sq, "vec_id")
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(5).as("k"), col("n_hits"),
          (col("n_hits") / lit(5)).as("recall"))
    }),

    // ---- IVF INDEX STALENESS audit: the incremental-maintenance story
    // for the ANN family (sketches have q121/q123 — this is the vector
    // side). Yesterday's index — centroids trained on the OLD 80%
    // hash-split — serves today's grown corpus; the audit measures, per
    // cluster, how many index-time members vs post-build arrivals it
    // now routes, and flags clusters where new arrivals exceed 20% of
    // the build population (integer threshold — the rebuild trigger a
    // production index maintainer alerts on). At 100 TB: training on
    // the old split is the bounded index-build cost; the serving
    // assignment is one broadcast argmax pass; the audit itself is one
    // 8-row aggregate.
    "q130_ivf_staleness" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cents = centroidsOld80(s, d)
      Vectors.assignTrained(e, "vec_id", "embedding", cents, KmScale)
        .withColumn("is_new",
          (SamplingQueries.hashBucket("vec_id", 1, 10) >= 8).cast("int"))
        .groupBy(col("cid"))
        .agg(sum(when(col("is_new") === 0, 1L).otherwise(0L)).as("n_old"),
          sum(when(col("is_new") === 1, 1L).otherwise(0L)).as("n_new"))
        .select(col("cid"), col("n_old"), col("n_new"),
          (col("n_new") * 5 >= col("n_old")).as("rebuild"))
    }),

    // ---- HARD-NEGATIVE MINING (contrastive-training data prep, the
    // DPR/SimCSE shape): for every anchor vector, the hardest negative
    // is its highest-cosine same-cluster neighbor that is NOT a
    // near-duplicate (q122's exact integer threshold keeps true dups
    // out of the negative pool — training on those would be label
    // noise). Candidate generation rides the same cluster routing and
    // cap as q122; ranking uses the double cosine (every op exactly
    // rounded, same expression shape as q30, tie to the lowest id) and
    // collapses per anchor via one map-combinable max_by — no window.
    // At 100 TB: pairs bounded per cluster, output is one row per
    // anchor.
    "q126_hard_negatives" -> ((s, d) => {
      val el = semanticMembers(s, d)
      val a = el.select(col("cid"), col("vec_id").as("vec_a"),
        col("qv").as("qa"), col("n2").as("na2"))
      val b = el.select(col("cid").as("cid_b"), col("vec_id").as("vec_b"),
        col("qv").as("qb"), col("n2").as("nb2"))
      a.join(b, col("cid") === col("cid_b") && col("vec_a") =!= col("vec_b"))
        .withColumn("dp", expr("doti(qa, qb)"))
        .filter(!(col("dp") > 0 &&
          expr("100 * (CAST(dp AS DECIMAL(38,0)) * dp) >= " +
            "9 * (CAST(na2 AS DECIMAL(38,0)) * nb2)")))
        .withColumn("cosine", col("dp").cast("double")
          / (sqrt(col("na2").cast("double"))
            * sqrt(col("nb2").cast("double"))))
        .groupBy(col("vec_a"), col("cid"))
        .agg(max(struct(col("cosine"), (-col("vec_b")).as("nb"))).as("m"))
        .select(col("vec_a").as("vec_id"), col("cid"),
          (-col("m.nb")).as("hard_neg"), col("m.cosine").as("cosine"))
    }),

    // ---- SEMANTIC DEDUP (SemDeDup-shaped: cluster, then prune within
    // clusters — Abbas et al. 2023): the q113 k-means routes every
    // vector to a centroid, and near-duplicate pruning runs ONLY inside
    // each cluster — the candidate set shrinks from C(n,2) to
    // sum C(m_i,2). A vector is flagged when a same-cluster vector with
    // a smaller vec_id is cosine-similar above the threshold; dup_of is
    // the smallest such id (the star rule of q112, so emission is one
    // row per flagged member, never per pair). At 100 TB the cluster
    // count k scales with n (k ~ n / target_cluster_size), which keeps
    // m_i bounded; here k is pinned for the oracle replay, so an
    // explicit oracle-mirrored cluster-size cap (q87's pattern) is the
    // guardrail: clusters larger than SemMaxCluster flag nobody rather
    // than blow up pair generation. All similarity arithmetic is exact:
    // quantized integer dots, and cos >= 0.3 decided as
    // 100*dot^2 >= 9*|a|^2*|b|^2 in decimal(38,0)/HUGEINT — no doubles,
    // so the oracle hash-matches.
    "q122_semantic_dedup" -> ((s, d) => {
      val el = semanticMembers(s, d)
      val a = el.select(col("cid"), col("vec_id").as("vec_a"),
        col("qv").as("qa"), col("n2").as("na2"))
      val b = el.select(col("cid").as("cid_b"), col("vec_id").as("vec_b"),
        col("qv").as("qb"), col("n2").as("nb2"))
      a.join(b, col("cid") === col("cid_b") && col("vec_a") < col("vec_b"))
        .withColumn("dp", expr("doti(qa, qb)"))
        .filter(col("dp") > 0 &&
          expr("100 * (CAST(dp AS DECIMAL(38,0)) * dp) >= " +
            "9 * (CAST(na2 AS DECIMAL(38,0)) * nb2)"))
        .groupBy(col("vec_b"), col("cid"))
        .agg(min(col("vec_a")).as("dup_of"))
        .select(col("vec_b").as("vec_id"), col("cid"), col("dup_of"))
    }),

    // ---- SIGNED-RANDOM-PROJECTION ANN — the hash-index leg of the
    // family (IVF q35/q114 routes by trained centroids, SQ q125 / PQ
    // q120 compress coordinates; SRP needs NO training pass): 32
    // md5-derived ±1 hyperplanes over the KmScale-quantized embedding
    // give a 32-bit sign signature; search = the production two-stage
    // shape (q29's route-then-rerank discipline): hamming64 (codegen'd
    // Catalyst expression) selects SrpCand=50 candidates, an exact
    // integer-dot rerank returns the top-10. Signature-only ranking
    // measured recall@10 = 0.1 on this corpus — 32 sign bits
    // discriminate candidates, not final order, which is exactly why
    // every deployed SRP index reranks; the candidate set is where the
    // 100 TB win lives (fetch 50 vectors, not the corpus). All-integer
    // — no libm, so the oracle replays bit-for-bit. At 100 TB: planes
    // are a broadcast one-row frame, signatures one map-side pass
    // (computed at index-build in production), candidate ranking
    // shuffles (vec_id, 8-byte sig), rerank touches 50 rows.
    "q132_srp_ann" -> ((s, d) => {
      val qv = srpSignatures(s, d)
      val q = qv.filter(col("vec_id") === 0)
        .select(col("sig").as("qsig"), col("qv").as("qb"))
      // candidate rank carries (vec_id, dist) ONLY — 16 bytes/row
      // through the corpus-wide top-k, never the 512-byte vector; the
      // 50 winners join their vectors back (broadcast, post-limit)
      val cand = qv.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("sig"))
        .crossJoin(broadcast(q.select(col("qsig"))))
        .select(col("vec_id"), expr("hamming64(sig, qsig)").as("dist"))
        .orderBy(col("dist").asc, col("vec_id").asc)
        .limit(SrpCand)
      cand.join(qv.select(col("vec_id"), col("qv")), "vec_id")
        .crossJoin(broadcast(q.select(col("qb"))))
        .select(col("vec_id"), col("dist"),
          expr("doti(qv, qb)").as("score"))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(10)
    }),

    // ---- HYBRID RETRIEVAL via reciprocal-rank fusion: the step that
    // joins the two retrieval legs this suite already ranks — q129's
    // lexical BM25 top-10 and q28's embedding cosine top-10 (doc_id
    // and vec_id share the id space) — into one list,
    // rrf = Σ floor(RrfScale/(RrfK + rank)), the integer-exact form of
    // the standard 1/(k+rank) fusion (k=60, Cormack et al.). Ranks
    // come from row_number over each TOP-10 frame (10 rows — the
    // single-partition window is post-limit, the q63 exempt class),
    // fused by a full outer join of two 10-row frames. The heavy
    // lifting (corpus scans, scoring, top-k) is entirely inside the
    // two legs, which keep their own 100 TB scale shapes; fusion
    // itself touches ≤ 20 rows no matter the corpus.
    "q135_hybrid_rrf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val lex = graft.queries.TextQueries.queries("q129_bm25_topk")(s, d)
        .select(col("doc_id"), row_number().over(
          Window.orderBy(col("score").desc, col("doc_id").asc))
          .as("r_lex"))
      val vec = queries("q28_cosine_topk")(s, d)
        .select(col("vec_id").as("doc_id"), row_number().over(
          Window.orderBy(col("cosine").desc, col("vec_id").asc))
          .as("r_vec"))
      lex.join(vec, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          (coalesce(expr(s"$RrfScale div ($RrfK + r_lex)"), lit(0L))
            + coalesce(expr(s"$RrfScale div ($RrfK + r_vec)"), lit(0L)))
            .as("rrf"),
          col("r_lex").isNotNull.as("in_lex"),
          col("r_vec").isNotNull.as("in_vec"))
    }),

    // ---- SRP recall audit: every index leg carries its own recall
    // measurement (IVF q102/q114, PQ q120, SQ q125 — and now the hash
    // leg): q132's hamming top-10 vs the integer-dot brute-force
    // top-10, recall@10. Closes the family discipline — an index with
    // no recall audit is an index nobody should trust at 100 TB.
    // Integer-exact on both legs, so the oracle replays the full
    // audit.
    "q138_srp_recall" -> ((s, d) => {
      // the ANN leg rides the SAME persisted signature frame as q132 —
      // the signature pass runs once per run, not once per consumer
      val srp = queries("q132_srp_ann")(s, d).select(col("vec_id"))
      val qv = srpSignatures(s, d).select(col("vec_id"), col("qv"))
      val qq = qv.filter(col("vec_id") === 0).select(col("qv").as("qb"))
      val brute = qv.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qq))
        .select(col("vec_id"), expr("doti(qv, qb)").as("score"))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(10).select(col("vec_id"))
      brute.join(srp, "vec_id")
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(10).as("k"), col("n_hits"),
          (col("n_hits") / lit(10)).as("recall"))
    }),

    // ---- LABEL-CENTROID COLLAPSE audit: pairwise similarity of the
    // per-label mean embeddings — the "did my classes collapse"
    // encoder-QA read beside q157's norm audit (a broken projection
    // head maps every class to one direction; two labels whose
    // centroids sit at cos ≥ 0.95 are indistinguishable to any
    // retrieval/nearest-centroid consumer). Per-dim label means use
    // the q152 floor(sum/count) idiom (sums exact in double below
    // 2^53 — the documented n·KmScale < 2^53 envelope); the verdict
    // is cross-multiplied DECIMAL(38,0) — dot > 0 AND 400·dot² ≥
    // 361·n2a·n2b ⟺ cos ≥ 0.95 — and the reported magnitude is the
    // signed exact integral cos²·1e6 (no sqrt/libm in the contract).
    // Scale: one posexplode pass over the run-shared quantized frame,
    // map-combined to labels×dims rows; everything after — the
    // pairwise join included — runs at LABEL cardinality (centroids
    // are bounded by KmScale per dim, so products are
    // corpus-size-independent).
    "q266_label_centroid_audit" -> ((s, d) => {
      val lab = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"))
      val dims = quantizedVecs(s, d).join(lab, "vec_id")
        .select(col("label"), posexplode(col("qv")).as(Seq("pos", "x")))
        .groupBy(col("label"), col("pos"))
        .agg(expr("CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) " +
          "AS BIGINT)").as("m"))
      val a = dims.select(col("label").as("label_a"), col("pos"),
        col("m").as("ma"))
      val b = dims.select(col("label").as("label_b"),
        col("pos").as("pos_b"), col("m").as("mb"))
      val dots = a.join(b, col("pos") === col("pos_b")
          && col("label_a") < col("label_b"))
        .groupBy(col("label_a"), col("label_b"))
        .agg(sum(col("ma") * col("mb")).as("dot"))
      val n2 = dims.groupBy(col("label"))
        .agg(sum(col("m") * col("m")).as("n2"))
      dots
        .join(n2.select(col("label").as("label_a"), col("n2").as("n2_a")),
          "label_a")
        .join(n2.select(col("label").as("label_b"), col("n2").as("n2_b")),
          "label_b")
        .select(col("label_a"), col("label_b"), col("dot"),
          col("n2_a"), col("n2_b"),
          expr("CASE WHEN dot < 0 THEN -1 ELSE 1 END * CAST(" +
            "(CAST(dot AS DECIMAL(38,0)) * dot * 1000000) div " +
            "nullif(CAST(n2_a AS DECIMAL(38,0)) * n2_b, 0) AS BIGINT)")
            .as("cos2_ppm"),
          expr("dot > 0 AND CAST(dot AS DECIMAL(38,0)) * dot * 400 " +
            ">= CAST(n2_a AS DECIMAL(38,0)) * n2_b * 361")
            .as("near_collapse"))
    }),

    // ---- CLUSTER-LABEL PURITY (clustering-quality audit): per trained
    // k-means cluster, how concentrated are the ground-truth labels?
    // Majority label + purity ppm per cluster — the standard external
    // clustering-evaluation read (purity), and the acceptance gate on
    // q113's index BEFORE q122 routes semantic dedup through it: a
    // cluster whose majority share sits near 1/n_labels is routing
    // noise, not structure. Rides the run-shared centroid set (one
    // broadcast argmax assignment pass — the q114/q130 posture);
    // everything after is a (cid, label) census folded to k rows; the
    // majority pick is a map-combinable max of a (count, -label)
    // struct (the q89 argmax idiom — count desc, then smallest label;
    // no window).
    "q270_cluster_label_purity" -> ((s, d) => {
      val assign = Vectors.assignTrained(Tables.embeddings(s, d),
        "vec_id", "embedding", centroidsFull(s, d), KmScale)
      val lc = assign
        .join(Tables.embeddings(s, d).select(col("vec_id"), col("label")),
          "vec_id")
        .groupBy(col("cid"), col("label"))
        .agg(count(lit(1)).as("c"))
      lc.groupBy(col("cid"))
        .agg(sum(col("c")).as("n_members"),
          max(struct(col("c").as("c"), (-col("label")).as("nl")))
            .as("m"))
        .select(col("cid"), col("n_members"),
          (-col("m.nl")).as("maj_label"),
          col("m.c").as("maj_count"),
          expr("(m.c * 1000000) div n_members").as("purity_ppm"))
    }),

    // ---- IVF ROUTING-GEOMETRY audit (dot vs L2 assignment
    // agreement): the index routes by MAX INTEGER DOT (the cosine-ish
    // rule every leg shares), but L2-nearest is the geometry most ANN
    // papers assume — and on UNNORMALIZED vectors the two genuinely
    // disagree (max⟨v,c⟩ ≠ argmin‖v−c‖² when centroid norms differ).
    // Per cluster: members, how many would route to the SAME centroid
    // under argmin d² = n2v − 2·dot + n2c (all exact BIGINT — no sqrt
    // enters, squared distances order identically), and the agreement
    // ppm. A cluster with low agreement is serving recall losses that
    // nprobe can't fix — the norm-spread diagnostic that says
    // "normalize or switch metric" BEFORE q114's recall number drops.
    // Scale: one k-row broadcast crossJoin over the shared quantized
    // frame, map-combinable min_by/argmax folds, k output rows.
    "q275_routing_geometry_audit" -> ((s, d) => {
      import s.implicits._
      val cents = centroidsFull(s, d)
      val centDf = cents.map { case (cid, ce) =>
        (cid, ce, ce.map(x => x * x).sum)
      }.toDF("cid2", "ce", "n2c")
      val assign = Vectors.assignTrained(Tables.embeddings(s, d),
        "vec_id", "embedding", cents, KmScale)
      val l2 = quantizedVecs(s, d).crossJoin(broadcast(centDf))
        .select(col("vec_id"),
          (col("n2") - lit(2L) * expr("doti(qv, ce)") + col("n2c"))
            .as("d2"),
          col("cid2"))
        .groupBy(col("vec_id"))
        .agg(min_by(col("cid2"), struct(col("d2"), col("cid2")))
          .as("l2cid"))
      assign.join(l2, "vec_id")
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n_members"),
          sum(when(col("cid") === col("l2cid"), 1L).otherwise(0L))
            .as("n_l2_agree"))
        .select(col("cid"), col("n_members"), col("n_l2_agree"),
          expr("(n_l2_agree * 1000000) div n_members").as("agree_ppm"))
    }),

    // ---- PQ RECONSTRUCTION-DISTORTION audit: per subspace, the mean
    // and max squared error between a vector's 8-dim slice and its
    // assigned codebook centroid — the quantization-fidelity number
    // behind q120's recall (recall says "the ranking survived", this
    // says WHERE the 32× compression is spending its error budget; a
    // subspace with outsized distortion wants more codebook bits).
    // Rides the run-shared codebooks + code frame (one training, one
    // encode per run); the error fold is map-combinable, per-vector
    // e2 is exact in BIGINT (8 dims × (2·KmScale)² ≈ 3.2·10¹³), the
    // sum accumulates in DECIMAL(38,0) (the q232/q259 mass idiom) and
    // only the integral-div mean and the max — both BIGINT — are
    // emitted. 8 output rows.
    "q276_pq_distortion_audit" -> ((s, d) => {
      import s.implicits._
      val centDf = pqBooksShared(s, d).toSeq.flatMap { case (g, cs) =>
        cs.map { case (cid, ce) => (g, cid, ce) }
      }.toDF("gid2", "cid2", "ce")
      val sv = pqStacked(Tables.embeddings(s, d))
        .select(col("gid"), col("vec_id"),
          expr(s"transform(sub, x -> CAST(floor(CAST(x AS DOUBLE) * " +
            s"${KmScale}L) AS BIGINT))").as("sv"))
      pqCodesShared(s, d)
        .join(sv, Seq("gid", "vec_id"))
        .join(broadcast(centDf),
          col("gid") === col("gid2") && col("cid") === col("cid2"))
        .select(col("gid"),
          expr("aggregate(zip_with(sv, ce, (a, b) -> (a - b) * (a - b))" +
            ", 0L, (acc, x) -> acc + x)").as("e2"))
        .groupBy(col("gid"))
        .agg(count(lit(1)).as("n_vecs"),
          expr("CAST(sum(CAST(e2 AS DECIMAL(38,0))) div count(1) " +
            "AS BIGINT)").as("mean_e2"),
          max(col("e2")).as("max_e2"))
        .select(col("gid").cast("long").as("subspace"), col("n_vecs"),
          col("mean_e2"), col("max_e2"))
    })
  )

  // ---- RRF fusion constants (q135), pinned for the oracle
  private val RrfK = 60L
  private val RrfScale = 1000000L

  // ---- SRP constants (q132): 32 planes over 64 dims, sign from one
  // md5 hex digit of the flat plane index — deterministic, mirrored in
  // the oracle; SrpCand = the hamming-candidate pool the exact rerank
  // reads (the recall/latency knob, like IVF's nprobe)
  private val SrpBits = 32
  private val SrpDims = 64
  private val SrpCand = 50

  private def srpPlanesExpr: String =
    s"transform(sequence(0, ${SrpBits * SrpDims - 1}), p -> " +
      "CASE WHEN CAST(conv(substr(md5(CAST(CAST(p AS STRING) AS BINARY))" +
      ", 1, 1), 16, 10) AS BIGINT) % 2 = 0 THEN 1L ELSE -1L END)"

  private def srpSigExpr: String =
    (0 until SrpBits).map { j =>
      s"(CASE WHEN doti(qv, pl$j) >= 0L THEN ${1L << j}L ELSE 0L END)"
    }.mkString("(", " + ", ")")

  // ---- product-quantization constants (q120), pinned for the oracle
  private val PqM = 8
  private val PqDims = 8
  private val PqK = 16
  private val PqIters = 2

  private def pqDot(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, $PqDims), " +
      s"i -> $a[i] * $b[i]), (x, v) -> x + v)"

  /** Subspace slice + md5-ranked seed centroids (same seeding rule as
    * kmeansQ: the k smallest md5(vec_id) rows, slice of the shared
    * quantized table `q`).
    */
  private def pqSub(ss: Int): String = {
    val lo = ss * PqDims + 1
    val hi = ss * PqDims + PqDims
    s"""qs$ss AS (SELECT vec_id, qv[$lo:$hi] AS sv FROM q),
       |s${ss}c0 AS (
       |  SELECT cid, sv AS ce FROM (
       |    SELECT sv, CAST(row_number() OVER (ORDER BY
       |      md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC) - 1 AS INT)
       |      AS cid
       |    FROM qs$ss) WHERE cid < $PqK)""".stripMargin
  }

  private def pqAssign(ss: Int, name: String, prev: String): String =
    s"""$name AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT t.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY t.vec_id ORDER BY
       |        ${pqDot("t.sv", "c.ce")} DESC, c.cid ASC) AS rn
       |    FROM qs$ss t, $prev c) WHERE rn = 1)""".stripMargin

  /** One Lloyd pass in subspace `ss` — the 8-dim twin of kmIterCtes. */
  private def pqIter(ss: Int, i: Int): String = {
    val prev = s"s${ss}c${i - 1}"
    val cur = s"s${ss}c$i"
    s"""${pqAssign(ss, s"s${ss}a$i", prev)},
       |s${ss}m$i AS (
       |  SELECT a.cid, g.pos,
       |    CAST(floor(CAST(sum(t.sv[g.pos]) AS DOUBLE) / count(*))
       |      AS BIGINT) AS mv
       |  FROM s${ss}a$i a JOIN qs$ss t USING (vec_id)
       |  CROSS JOIN generate_series(1, $PqDims) g(pos)
       |  GROUP BY a.cid, g.pos),
       |$cur AS (
       |  SELECT c.cid, list(coalesce(m.mv, c.ce[g.pos]) ORDER BY g.pos)
       |    AS ce
       |  FROM $prev c CROSS JOIN generate_series(1, $PqDims) g(pos)
       |  LEFT JOIN s${ss}m$i m ON m.cid = c.cid AND m.pos = g.pos
       |  GROUP BY c.cid)""".stripMargin
  }

  /** q120 oracle: replay the 8 subspace trainings, encode, ADC-score
    * against the vec_id=0 query, and compare top-5 sets with the
    * integer-dot brute-force ground truth.
    */
  // reusable PQ CTE families (q120 + q159): subspace trainings, final
  // code assignments, per-subspace ADC tables, and the code→pd union
  private def pqSubsCtes: String = (0 until PqM).map(ss =>
    (pqSub(ss) +: (1 to PqIters).map(i => pqIter(ss, i)))
      .mkString(",\n")).mkString(",\n")

  private def pqCodeCtes: String = (0 until PqM).map(ss =>
    pqAssign(ss, s"s${ss}code", s"s${ss}c$PqIters")).mkString(",\n")

  private def pqPdCtes: String = (0 until PqM).map { ss =>
    s"""pd$ss AS (
       |  SELECT c.cid, ${pqDot("qq.sv", "c.ce")} AS pd
       |  FROM s${ss}c$PqIters c,
       |    (SELECT sv FROM qs$ss WHERE vec_id = 0) qq)""".stripMargin
  }.mkString(",\n")

  private def pqScUnion: String = (0 until PqM).map(ss =>
    s"SELECT a.vec_id, p.pd FROM s${ss}code a " +
      s"JOIN pd$ss p USING (cid) WHERE a.vec_id <> 0")
    .mkString("\nUNION ALL\n")

  private def pqOracle: String = {
    val subs = pqSubsCtes
    val codes = pqCodeCtes
    val pds = pqPdCtes
    val scUnion = pqScUnion
    s"""WITH q AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * $KmScale) AS BIGINT))
       |    AS qv
       |  FROM embeddings),
       |$subs,
       |$codes,
       |$pds,
       |adc AS (
       |  SELECT vec_id, CAST(sum(pd) AS BIGINT) AS score
       |  FROM ($scUnion)
       |  GROUP BY vec_id),
       |pq AS (SELECT vec_id FROM (
       |    SELECT vec_id, row_number() OVER (ORDER BY score DESC,
       |      vec_id ASC) AS rn FROM adc) WHERE rn <= 5),
       |qq0 AS (SELECT qv FROM q WHERE vec_id = 0),
       |brute AS (SELECT vec_id FROM (
       |    SELECT t.vec_id, row_number() OVER (ORDER BY
       |      list_reduce(list_transform(generate_series(1, 64),
       |        i -> t.qv[i] * qq0.qv[i]), (x, v) -> x + v) DESC,
       |      t.vec_id ASC) AS rn
       |    FROM q t, qq0 WHERE t.vec_id <> 0) WHERE rn <= 5)
       |SELECT CAST(5 AS INT) AS k, count(*) AS n_hits,
       |  count(*) / 5 AS recall
       |FROM brute JOIN pq USING (vec_id)""".stripMargin
  }

  /** q145's replay, shared with the q184 length-ratio QA. */
  private def bitextOracle: String = {
    val idot = "list_reduce(list_transform(generate_series(1, 64), " +
      "i -> sv[i] * tv[i]), (acc, v) -> acc + v)"
    s"""WITH q AS (SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * $KmScale) AS BIGINT))
       |      AS qv
       |  FROM embeddings),
       |wl AS (SELECT vec_id, lang, qv FROM q
       |  JOIN documents ON vec_id = doc_id),
       |src AS (SELECT vec_id AS src_id, qv AS sv FROM wl
       |  WHERE lang = 'en' AND vec_id % 10 = 7),
       |tgt AS (SELECT vec_id AS tgt_id, qv AS tv FROM wl
       |  WHERE lang = 'zh'),
       |scored AS (SELECT src_id, tgt_id, $idot AS dot FROM src, tgt),
       |ranked AS (SELECT src_id, tgt_id, dot,
       |    row_number() OVER (PARTITION BY src_id
       |      ORDER BY dot DESC, tgt_id ASC) AS rn
       |  FROM scored),
       |tops AS (SELECT src_id,
       |    max(CASE WHEN rn = 1 THEN tgt_id END) AS tgt_id,
       |    max(CASE WHEN rn = 1 THEN dot END) AS best_dot,
       |    max(CASE WHEN rn = 2 THEN dot END) AS second_dot
       |  FROM ranked WHERE rn <= 2 GROUP BY src_id)
       |SELECT src_id, tgt_id, best_dot, second_dot,
       |  (best_dot > 0 AND second_dot * 10 <= best_dot * 9) AS accepted
       |FROM tops""".stripMargin
  }

  /** q159 oracle: full replay of BOTH index builds — the KmK-centroid
    * IVF training (kmeansCtes) with corpus assignment + nprobe=2 query
    * routing, and the 8 PQ subspace trainings + encodings (the q120
    * CTE families) — then ADC scoring restricted to the routed lists,
    * compared top-10 against the integer-dot brute force. */
  private def ivfpqOracle: String =
    s"""WITH $kmeansCtes,
       |${kmAssignCte(KmIters + 1, s"c$KmIters")},
       |qp AS (SELECT cid AS qcid FROM (
       |    SELECT c.cid, row_number() OVER (ORDER BY
       |      list_reduce(list_transform(generate_series(1, 64),
       |        i -> q0.qv[i] * c.ce[i]), (a, v) -> a + v) DESC,
       |      c.cid ASC) AS rn
       |    FROM c$KmIters c, (SELECT qv FROM q WHERE vec_id = 0) q0)
       |  WHERE rn <= 2),
       |cand AS (SELECT a.vec_id FROM a${KmIters + 1} a
       |  JOIN qp ON a.cid = qp.qcid WHERE a.vec_id <> 0),
       |$pqSubsCtes,
       |$pqCodeCtes,
       |$pqPdCtes,
       |adc AS (
       |  SELECT u.vec_id, CAST(sum(u.pd) AS BIGINT) AS score
       |  FROM ($pqScUnion) u JOIN cand USING (vec_id)
       |  GROUP BY u.vec_id),
       |ivfpq AS (SELECT vec_id FROM (
       |    SELECT vec_id, row_number() OVER (ORDER BY score DESC,
       |      vec_id ASC) AS rn FROM adc) WHERE rn <= 10),
       |qq0 AS (SELECT qv FROM q WHERE vec_id = 0),
       |brute AS (SELECT vec_id FROM (
       |    SELECT t.vec_id, row_number() OVER (ORDER BY
       |      list_reduce(list_transform(generate_series(1, 64),
       |        i -> t.qv[i] * qq0.qv[i]), (x, v) -> x + v) DESC,
       |      t.vec_id ASC) AS rn
       |    FROM q t, qq0 WHERE t.vec_id <> 0) WHERE rn <= 10)
       |SELECT CAST(10 AS INT) AS k, count(*) AS n_hits,
       |  count(*) / 10 AS recall
       |FROM brute JOIN ivfpq USING (vec_id)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q120_pq_recall" -> pqOracle,
    "q159_ivfpq_recall" -> ivfpqOracle,

    "q181_cluster_prototypes" ->
      s"""WITH $kmeansCtes,
        |${kmAssignCte(KmIters + 1, s"c$KmIters")},
        |dt AS (
        |  SELECT a.cid, a.vec_id,
        |    list_reduce(list_transform(generate_series(1, 64),
        |      i -> q.qv[i] * c.ce[i]), (x, v) -> x + v) AS dot
        |  FROM a${KmIters + 1} a JOIN q USING (vec_id)
        |  JOIN c$KmIters c ON c.cid = a.cid)
        |SELECT cid, CAST(rn AS INT) AS rn, vec_id,
        |  CAST(dot AS BIGINT) AS centrality
        |FROM (SELECT cid, vec_id, dot, row_number() OVER (
        |    PARTITION BY cid ORDER BY dot DESC, vec_id ASC) AS rn
        |  FROM dt)
        |WHERE rn <= 2""".stripMargin,

    "q169_maxsim_topk" ->
      s"""WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * $KmScale) AS BIGINT))
        |    AS qv
        |  FROM embeddings),
        |q0 AS (SELECT qv AS q0v FROM q WHERE vec_id = 0),
        |d AS (
        |  SELECT t.vec_id, j.j, k.k,
        |    list_reduce(list_transform(generate_series(1, 8),
        |      i -> t.qv[k.k*8 + i] * q0.q0v[j.j*8 + i]),
        |      (a, v) -> a + v) AS dt
        |  FROM q t, q0, generate_series(0, 7) j(j),
        |    generate_series(0, 7) k(k)
        |  WHERE t.vec_id <> 0),
        |m AS (SELECT vec_id, j, max(dt) AS mx FROM d GROUP BY 1, 2),
        |sc AS (SELECT vec_id, CAST(sum(mx) AS BIGINT) AS maxsim
        |  FROM m GROUP BY 1)
        |SELECT vec_id, maxsim FROM sc
        |ORDER BY maxsim DESC, vec_id ASC LIMIT 10""".stripMargin,
    "q28_cosine_topk" -> oracle28,

    "q157_norm_audit" ->
      s"""WITH q AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * $KmScale) AS BIGINT))
        |    AS qv
        |  FROM embeddings),
        |n AS (SELECT vec_id,
        |    CAST(list_reduce(list_transform(generate_series(1, 64),
        |      i -> qv[i] * qv[i]), (a, v) -> a + v) AS BIGINT) AS n2
        |  FROM q)
        |SELECT CAST(length(bin(n2)) AS BIGINT) AS bits,
        |  CAST(count(*) AS BIGINT) AS n_vecs,
        |  min(n2) AS min_n2,
        |  max(n2) AS max_n2,
        |  CAST(sum(CASE WHEN n2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_zero
        |FROM n GROUP BY 1""".stripMargin,

    "q153_retrieval_metrics" ->
      s"""WITH q AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * $KmScale) AS BIGINT))
        |    AS qv
        |  FROM embeddings),
        |qb AS (SELECT qv FROM q WHERE vec_id = 0),
        |ql AS (SELECT label AS ql FROM embeddings WHERE vec_id = 0),
        |ranked AS (SELECT vec_id, row_number() OVER (ORDER BY
        |    score DESC, vec_id ASC) AS rank
        |  FROM (SELECT t.vec_id,
        |      list_reduce(list_transform(generate_series(1, 64),
        |        i -> t.qv[i] * qb.qv[i]), (a, v) -> a + v) AS score
        |    FROM q t, qb WHERE t.vec_id <> 0)),
        |w(i, wt) AS (VALUES (1, 1000000), (2, 630930), (3, 500000),
        |  (4, 430677), (5, 386853), (6, 356207), (7, 333333),
        |  (8, 315465), (9, 301030), (10, 289065)),
        |rel AS (SELECT r.rank,
        |    CASE WHEN e.label = ql.ql THEN 1 ELSE 0 END AS rel
        |  FROM ranked r JOIN embeddings e USING (vec_id), ql
        |  WHERE r.rank <= 10),
        |nrel AS (SELECT CAST(sum(CASE WHEN label = ql THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_rel_total
        |  FROM embeddings, ql WHERE vec_id <> 0)
        |SELECT CAST(10 AS INT) AS k,
        |  CAST(sum(rel) AS BIGINT) AS hits,
        |  CAST(coalesce(max(CASE WHEN rel = 1
        |    THEN 1000000 // rank END), 0) AS BIGINT) AS mrr_x1e6,
        |  CAST(sum(rel * w.wt) AS BIGINT) AS dcg_x1e6,
        |  nrel.n_rel_total,
        |  (SELECT CAST(sum(wt) AS BIGINT) FROM w
        |    WHERE i <= least(nrel.n_rel_total, 10)) AS idcg_x1e6,
        |  (CAST(sum(rel * w.wt) AS BIGINT)
        |    / (SELECT CAST(sum(wt) AS BIGINT) FROM w
        |       WHERE i <= least(nrel.n_rel_total, 10))) AS ndcg
        |FROM rel JOIN w ON w.i = rel.rank, nrel
        |GROUP BY nrel.n_rel_total""".stripMargin,

    "q152_embed_center" ->
      s"""WITH q AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * $KmScale) AS BIGINT))
        |    AS qv
        |  FROM embeddings),
        |e AS (SELECT vec_id, unnest(qv) AS x,
        |    unnest(generate_series(1, len(qv))) AS pos
        |  FROM q),
        |st AS (SELECT pos,
        |    CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS m
        |  FROM e GROUP BY pos),
        |c AS (SELECT e.vec_id, e.pos, e.x - st.m AS v
        |  FROM e JOIN st USING (pos)),
        |v AS (SELECT vec_id, list(v ORDER BY pos) AS cv,
        |    CAST(sum(abs(v)) AS BIGINT) AS l1
        |  FROM c GROUP BY vec_id)
        |SELECT vec_id, md5(array_to_string(cv, ',')) AS cv_md5, l1
        |FROM v""".stripMargin,

    "q29_ann_bucket" ->
      s"""WITH e AS (SELECT vec_id, embedding,
        |    ${bucketSql("embedding", 4)} AS bucket FROM embeddings),
        |q AS (SELECT embedding AS qe, bucket AS qbucket FROM e
        |  WHERE vec_id = 0)
        |SELECT e.vec_id, e.bucket,
        |  ${dotSql("e.embedding", "q.qe")}
        |    / (sqrt(${dotSql("e.embedding", "e.embedding")})
        |       * sqrt(${dotSql("q.qe", "q.qe")})) AS cosine
        |FROM e, q
        |WHERE e.vec_id <> 0 AND e.bucket = q.qbucket
        |ORDER BY cosine DESC, e.vec_id ASC
        |LIMIT 5""".stripMargin,

    "q35_ann_ivf" ->
      s"""WITH cents AS (
        |  SELECT CAST(vec_id AS INT) AS cid, embedding AS ce
        |  FROM embeddings WHERE vec_id < 16),
        |scored AS (
        |  SELECT e.vec_id, c.cid,
        |    ${dotSql("e.embedding", "c.ce")} AS dsim
        |  FROM embeddings e, cents c),
        |assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY dsim DESC, cid ASC) AS rn
        |    FROM scored)
        |  WHERE rn = 1),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |qc AS (SELECT cid AS qcid FROM assign WHERE vec_id = 0)
        |SELECT e.vec_id, a.cid,
        |  ${dotSql("e.embedding", "q.qe")}
        |    / (sqrt(${dotSql("e.embedding", "e.embedding")})
        |       * sqrt(${dotSql("q.qe", "q.qe")})) AS cosine
        |FROM embeddings e
        |JOIN assign a ON e.vec_id = a.vec_id
        |JOIN qc ON a.cid = qc.qcid, q
        |WHERE e.vec_id <> 0
        |ORDER BY cosine DESC, e.vec_id ASC
        |LIMIT 5""".stripMargin,

    "q57_ivf_nprobe2" ->
      s"""WITH cents AS (
        |  SELECT CAST(vec_id AS INT) AS cid, embedding AS ce
        |  FROM embeddings WHERE vec_id < 16),
        |scored AS (
        |  SELECT e.vec_id, c.cid,
        |    ${dotSql("e.embedding", "c.ce")} AS dsim
        |  FROM embeddings e, cents c),
        |assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY dsim DESC, cid ASC) AS rn
        |    FROM scored)
        |  WHERE rn = 1),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |qp AS (SELECT cid AS qcid FROM (
        |    SELECT c.cid, row_number() OVER (
        |      ORDER BY ${dotSql("q.qe", "c.ce")} DESC, c.cid ASC) AS rn
        |    FROM cents c, q)
        |  WHERE rn <= 2)
        |SELECT e.vec_id, a.cid,
        |  ${dotSql("e.embedding", "q.qe")}
        |    / (sqrt(${dotSql("e.embedding", "e.embedding")})
        |       * sqrt(${dotSql("q.qe", "q.qe")})) AS cosine
        |FROM embeddings e
        |JOIN assign a ON e.vec_id = a.vec_id
        |JOIN qp ON a.cid = qp.qcid, q
        |WHERE e.vec_id <> 0
        |ORDER BY cosine DESC, e.vec_id ASC
        |LIMIT 5""".stripMargin,

    "q102_ann_recall" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings
        |  WHERE vec_id = 0),
        |brute AS (SELECT e.vec_id FROM (
        |    SELECT e.vec_id, row_number() OVER (ORDER BY
        |      ${dotSql("e.embedding", "q.qe")}
        |        / (sqrt(${dotSql("e.embedding", "e.embedding")})
        |           * sqrt(${dotSql("q.qe", "q.qe")})) DESC,
        |      e.vec_id ASC) AS rn
        |    FROM embeddings e, q WHERE e.vec_id <> 0) e
        |  WHERE rn <= 5),
        |cents AS (SELECT CAST(vec_id AS INT) AS cid, embedding AS ce
        |  FROM embeddings WHERE vec_id < 16),
        |scored AS (SELECT e.vec_id, c.cid,
        |    ${dotSql("e.embedding", "c.ce")} AS dsim
        |  FROM embeddings e, cents c),
        |assign AS (SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY dsim DESC, cid ASC) AS rn
        |    FROM scored)
        |  WHERE rn = 1),
        |qc AS (SELECT cid AS qcid FROM assign WHERE vec_id = 0),
        |ivf AS (SELECT vec_id FROM (
        |    SELECT e.vec_id, row_number() OVER (ORDER BY
        |      ${dotSql("e.embedding", "q.qe")}
        |        / (sqrt(${dotSql("e.embedding", "e.embedding")})
        |           * sqrt(${dotSql("q.qe", "q.qe")})) DESC,
        |      e.vec_id ASC) AS rn
        |    FROM embeddings e
        |    JOIN assign a ON e.vec_id = a.vec_id
        |    JOIN qc ON a.cid = qc.qcid, q
        |    WHERE e.vec_id <> 0)
        |  WHERE rn <= 5)
        |SELECT CAST(5 AS INT) AS k,
        |  count(*) AS n_hits,
        |  count(*) / 5 AS recall
        |FROM brute JOIN ivf USING (vec_id)""".stripMargin,

    "q113_kmeans_centroids" ->
      s"""WITH $kmeansCtes
        |SELECT c.cid, CAST(g.pos AS INT) AS pos, c.ce[g.pos] AS cval
        |FROM c$KmIters c CROSS JOIN generate_series(1, 64) g(pos)""".stripMargin,

    "q154_centroid_refresh" ->
      s"""WITH $kmeansCtes,
        |${kmAssignCte(KmIters + 1, s"c$KmIters")},
        |b AS (SELECT a.cid, g.pos,
        |    CAST(sum(q.qv[g.pos]) AS BIGINT) AS sx,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM a${KmIters + 1} a JOIN q USING (vec_id)
        |  CROSS JOIN generate_series(1, 64) g(pos)
        |  WHERE vec_id % 10 = 7
        |  GROUP BY 1, 2)
        |SELECT c.cid, CAST(g.pos AS INT) AS pos,
        |  c.ce[g.pos] AS old_val,
        |  CAST(coalesce(CAST(floor(CAST(c.ce[g.pos] * 100 + b.sx
        |      AS DOUBLE) / (100 + b.n)) AS BIGINT),
        |    c.ce[g.pos]) AS BIGINT) AS new_val,
        |  CAST(coalesce(b.n, 0) AS BIGINT) AS n_new
        |FROM c$KmIters c CROSS JOIN generate_series(1, 64) g(pos)
        |LEFT JOIN b ON b.cid = c.cid AND b.pos = g.pos""".stripMargin,

    "q130_ivf_staleness" ->
      s"""WITH ${kmeansCtesWhere(
            s"WHERE (${SamplingQueries.hashBucketSql("vec_id", 1, 10)}) < 8")},
        |qall AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * $KmScale) AS BIGINT))
        |    AS qv
        |  FROM embeddings),
        |asg AS (SELECT vec_id, cid FROM (
        |    SELECT t.vec_id, c.cid,
        |      row_number() OVER (PARTITION BY t.vec_id ORDER BY
        |        list_reduce(list_transform(generate_series(1, 64),
        |          i -> t.qv[i] * c.ce[i]), (a, v) -> a + v) DESC,
        |        c.cid ASC) AS rn
        |    FROM qall t, c$KmIters c) WHERE rn = 1),
        |cnt AS (
        |  SELECT cid,
        |    CAST(sum(CASE WHEN
        |      (${SamplingQueries.hashBucketSql("vec_id", 1, 10)}) < 8
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
        |    CAST(sum(CASE WHEN
        |      (${SamplingQueries.hashBucketSql("vec_id", 1, 10)}) >= 8
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_new
        |  FROM asg GROUP BY cid)
        |SELECT cid, n_old, n_new, n_new * 5 >= n_old AS rebuild
        |FROM cnt""".stripMargin,

    "q126_hard_negatives" ->
      s"""WITH $kmeansCtes,
        |${kmAssignCte(KmIters + 1, s"c$KmIters")},
        |n2 AS (
        |  SELECT vec_id, list_reduce(list_transform(
        |    generate_series(1, 64), i -> q.qv[i] * q.qv[i]),
        |    (a, v) -> a + v) AS n2
        |  FROM q),
        |member AS (
        |  SELECT a.vec_id, a.cid, q.qv, n2.n2
        |  FROM a${KmIters + 1} a JOIN q USING (vec_id)
        |  JOIN n2 USING (vec_id)),
        |ok AS (SELECT cid FROM member GROUP BY cid
        |  HAVING count(*) <= $SemMaxCluster),
        |el AS (SELECT member.* FROM member JOIN ok USING (cid)),
        |p AS (
        |  SELECT a.cid, a.vec_id AS va, b.vec_id AS vb,
        |    list_reduce(list_transform(generate_series(1, 64),
        |      i -> a.qv[i] * b.qv[i]), (x, v) -> x + v) AS dp,
        |    a.n2 AS na2, b.n2 AS nb2
        |  FROM el a JOIN el b ON a.cid = b.cid AND a.vec_id <> b.vec_id),
        |np AS (
        |  SELECT cid, va, vb,
        |    CAST(dp AS DOUBLE) / (sqrt(CAST(na2 AS DOUBLE))
        |      * sqrt(CAST(nb2 AS DOUBLE))) AS cosine
        |  FROM p
        |  WHERE NOT (dp > 0
        |    AND 100 * (CAST(dp AS HUGEINT) * dp)
        |        >= 9 * (CAST(na2 AS HUGEINT) * nb2)))
        |SELECT va AS vec_id, cid, vb AS hard_neg, cosine FROM (
        |  SELECT *, row_number() OVER (PARTITION BY va
        |    ORDER BY cosine DESC, vb ASC) AS rn FROM np)
        |WHERE rn = 1""".stripMargin,

    "q125_sq_recall" ->
      s"""WITH st AS (
        |  SELECT g.pos, min(CAST(e.embedding[g.pos] AS DOUBLE)) AS mn,
        |    max(CAST(e.embedding[g.pos] AS DOUBLE)) AS mx
        |  FROM embeddings e CROSS JOIN generate_series(1, 64) g(pos)
        |  GROUP BY g.pos),
        |codes AS (
        |  SELECT e.vec_id,
        |    list(CASE WHEN st.mx = st.mn THEN CAST(0 AS BIGINT) ELSE
        |      CAST(floor((CAST(e.embedding[st.pos] AS DOUBLE) - st.mn)
        |        / (st.mx - st.mn) * 255.0) AS BIGINT) - 128 END
        |      ORDER BY st.pos) AS code
        |  FROM embeddings e CROSS JOIN st
        |  GROUP BY e.vec_id),
        |qcd AS (SELECT code FROM codes WHERE vec_id = 0),
        |sq AS (SELECT vec_id FROM (
        |    SELECT c.vec_id, row_number() OVER (ORDER BY
        |      list_reduce(list_transform(generate_series(1, 64),
        |        i -> c.code[i] * qcd.code[i]), (a, v) -> a + v) DESC,
        |      c.vec_id ASC) AS rn
        |    FROM codes c, qcd WHERE c.vec_id <> 0)
        |  WHERE rn <= 5),
        |q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * $KmScale) AS BIGINT))
        |    AS qv
        |  FROM embeddings),
        |qq AS (SELECT qv FROM q WHERE vec_id = 0),
        |brute AS (SELECT vec_id FROM (
        |    SELECT t.vec_id, row_number() OVER (ORDER BY
        |      list_reduce(list_transform(generate_series(1, 64),
        |        i -> t.qv[i] * qq.qv[i]), (x, v) -> x + v) DESC,
        |      t.vec_id ASC) AS rn
        |    FROM q t, qq WHERE t.vec_id <> 0) WHERE rn <= 5)
        |SELECT CAST(5 AS INT) AS k, count(*) AS n_hits,
        |  count(*) / 5 AS recall
        |FROM brute JOIN sq USING (vec_id)""".stripMargin,

    "q122_semantic_dedup" ->
      s"""WITH $kmeansCtes,
        |${kmAssignCte(KmIters + 1, s"c$KmIters")},
        |n2 AS (
        |  SELECT vec_id, list_reduce(list_transform(
        |    generate_series(1, 64), i -> q.qv[i] * q.qv[i]),
        |    (a, v) -> a + v) AS n2
        |  FROM q),
        |member AS (
        |  SELECT a.vec_id, a.cid, q.qv, n2.n2
        |  FROM a${KmIters + 1} a JOIN q USING (vec_id)
        |  JOIN n2 USING (vec_id)),
        |ok AS (SELECT cid FROM member GROUP BY cid
        |  HAVING count(*) <= $SemMaxCluster),
        |el AS (SELECT member.* FROM member JOIN ok USING (cid)),
        |p AS (
        |  SELECT a.cid, a.vec_id AS va, b.vec_id AS vb,
        |    list_reduce(list_transform(generate_series(1, 64),
        |      i -> a.qv[i] * b.qv[i]), (x, v) -> x + v) AS dp,
        |    a.n2 AS na2, b.n2 AS nb2
        |  FROM el a JOIN el b ON a.cid = b.cid AND a.vec_id < b.vec_id)
        |SELECT vb AS vec_id, cid, min(va) AS dup_of
        |FROM p
        |WHERE dp > 0
        |  AND 100 * (CAST(dp AS HUGEINT) * dp)
        |      >= 9 * (CAST(na2 AS HUGEINT) * nb2)
        |GROUP BY vb, cid""".stripMargin,

    "q114_ivf_trained_recall" ->
      s"""WITH $kmeansCtes,
        |${kmAssignCte(KmIters + 1, s"c$KmIters")},
        |qe0 AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |brute AS (SELECT vec_id FROM (
        |    SELECT e.vec_id, row_number() OVER (ORDER BY
        |      ${dotSql("e.embedding", "qq.qe")}
        |        / (sqrt(${dotSql("e.embedding", "e.embedding")})
        |           * sqrt(${dotSql("qq.qe", "qq.qe")})) DESC,
        |      e.vec_id ASC) AS rn
        |    FROM embeddings e, qe0 qq WHERE e.vec_id <> 0)
        |  WHERE rn <= 5),
        |qp AS (SELECT cid AS qcid FROM (
        |    SELECT c.cid, row_number() OVER (ORDER BY
        |      list_reduce(list_transform(generate_series(1, 64),
        |        i -> q.qv[i] * c.ce[i]), (a, v) -> a + v) DESC,
        |      c.cid ASC) AS rn
        |    FROM q, c$KmIters c WHERE q.vec_id = 0)
        |  WHERE rn <= 3),
        |ivf AS (SELECT vec_id FROM (
        |    SELECT e.vec_id, row_number() OVER (ORDER BY
        |      ${dotSql("e.embedding", "qq.qe")}
        |        / (sqrt(${dotSql("e.embedding", "e.embedding")})
        |           * sqrt(${dotSql("qq.qe", "qq.qe")})) DESC,
        |      e.vec_id ASC) AS rn
        |    FROM embeddings e
        |    JOIN a${KmIters + 1} a ON e.vec_id = a.vec_id
        |    JOIN qp ON a.cid = qp.qcid, qe0 qq
        |    WHERE e.vec_id <> 0)
        |  WHERE rn <= 5)
        |SELECT CAST(5 AS INT) AS k,
        |  count(*) AS n_hits,
        |  count(*) / 5 AS recall
        |FROM brute JOIN ivf USING (vec_id)""".stripMargin,

    // minhash band-collision pair membership depends only on the two
    // endpoints' own signatures, so full-corpus pairs filtered to
    // sampled endpoints == pairs computed within the sample (the Spark
    // side runs candidatePairs on the sampled docs directly); the
    // prefix groups and embedding buckets/caps are recomputed WITHIN
    // the sample on both engines.
    "q146_dedup_agreement" ->
      s"""WITH sd AS (SELECT doc_id, text FROM documents
        |  WHERE ${SamplingQueries.hashBucketSql("doc_id", 4, 2)} = 0),
        |mpairs AS (SELECT * FROM (${TextQueries.minhashPairsSql})
        |  WHERE doc_a IN (SELECT doc_id FROM sd)
        |    AND doc_b IN (SELECT doc_id FROM sd)),
        |mset AS (SELECT DISTINCT doc_id FROM
        |    (SELECT doc_a AS doc_id FROM mpairs
        |     UNION ALL SELECT doc_b FROM mpairs)),
        |p AS (SELECT doc_id, substr(text, 1, 64) AS pfx FROM sd),
        |pd AS (SELECT pfx FROM
        |    (SELECT pfx, count(*) AS n FROM p GROUP BY pfx)
        |  WHERE n >= 2),
        |pset AS (SELECT DISTINCT doc_id FROM p JOIN pd USING (pfx)),
        |e AS (SELECT vec_id, embedding,
        |    ${bucketSql("embedding", 8)} AS bucket FROM embeddings
        |  JOIN sd ON vec_id = sd.doc_id),
        |bcap AS (SELECT bucket FROM
        |    (SELECT bucket, count(*) AS bm FROM e GROUP BY bucket)
        |  WHERE bm <= 256),
        |ec AS (SELECT e.* FROM e JOIN bcap USING (bucket)),
        |vpairs AS (SELECT a.vec_id AS va, b.vec_id AS vb
        |  FROM ec a JOIN ec b
        |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |  WHERE (${dotSql("a.embedding", "b.embedding")}
        |      / (sqrt(${dotSql("a.embedding", "a.embedding")})
        |         * sqrt(${dotSql("b.embedding", "b.embedding")})))
        |    >= CAST(0.2 AS DOUBLE)),
        |vset AS (SELECT DISTINCT doc_id FROM
        |    (SELECT va AS doc_id FROM vpairs
        |     UNION ALL SELECT vb FROM vpairs)),
        |fl AS (SELECT d.doc_id,
        |    CASE WHEN ps.doc_id IS NOT NULL THEN 1 ELSE 0 END AS p,
        |    CASE WHEN ms.doc_id IS NOT NULL THEN 1 ELSE 0 END AS m,
        |    CASE WHEN vs.doc_id IS NOT NULL THEN 1 ELSE 0 END AS v
        |  FROM sd d
        |  LEFT JOIN pset ps ON d.doc_id = ps.doc_id
        |  LEFT JOIN mset ms ON d.doc_id = ms.doc_id
        |  LEFT JOIN vset vs ON d.doc_id = vs.doc_id)
        |SELECT count(*) AS n_docs,
        |  CAST(sum(p) AS BIGINT) AS n_prefix,
        |  CAST(sum(m) AS BIGINT) AS n_minhash,
        |  CAST(sum(v) AS BIGINT) AS n_embed,
        |  CAST(sum(p * m) AS BIGINT) AS n_pm,
        |  CAST(sum(p * v) AS BIGINT) AS n_pv,
        |  CAST(sum(m * v) AS BIGINT) AS n_mv,
        |  CAST(sum(CASE WHEN p + m + v > 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_any
        |FROM fl""".stripMargin,

    "q145_bitext_margin" -> bitextOracle,

    "q186_semantic_decontam" ->
      s"""WITH q AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * $KmScale) AS BIGINT))
        |      AS qv
        |  FROM embeddings),
        |n AS (SELECT vec_id, qv,
        |    CAST(list_reduce(list_transform(generate_series(1, 64),
        |      i -> qv[i] * qv[i]), (a, v) -> a + v) AS BIGINT) AS n2
        |  FROM q),
        |ev AS (SELECT vec_id AS eval_id, qv AS evv, n2 AS n2e FROM n
        |  WHERE ${SamplingQueries.hashBucketSql("vec_id", 1, 10)} = 9),
        |tr AS (SELECT vec_id AS train_id, qv AS tv, n2 AS n2t FROM n
        |  WHERE ${SamplingQueries.hashBucketSql("vec_id", 1, 10)} <> 9),
        |sc AS (SELECT eval_id, train_id,
        |    CAST(list_reduce(list_transform(generate_series(1, 64),
        |      i -> evv[i] * tv[i]), (a, v) -> a + v) AS BIGINT) AS dot,
        |    n2e, n2t
        |  FROM ev, tr),
        |r AS (SELECT eval_id, train_id, dot, n2e, n2t,
        |    row_number() OVER (PARTITION BY eval_id
        |      ORDER BY dot DESC, train_id ASC) AS rn
        |  FROM sc)
        |SELECT eval_id, train_id, dot,
        |  (dot > 0 AND CAST(dot AS HUGEINT) * CAST(dot AS HUGEINT) * 4
        |    >= CAST(n2e AS HUGEINT) * CAST(n2t AS HUGEINT))
        |    AS contaminated
        |FROM r WHERE rn = 1""".stripMargin,

    // the ANN leg replayed bit-for-bit: trained centroids (kmeans CTEs),
    // train-side top-1 cell assignment, eval-side top-3 probe, exact
    // dots over probed candidates only, then the audit join against the
    // inline exact leg
    "q194_decontam_ann_audit" ->
      s"""WITH $kmeansCtes,
        |n AS (SELECT vec_id, qv,
        |    CAST(list_reduce(list_transform(generate_series(1, 64),
        |      i -> qv[i] * qv[i]), (a, v) -> a + v) AS BIGINT) AS n2
        |  FROM q),
        |ev AS (SELECT vec_id AS eval_id, qv AS evv, n2 AS n2e FROM n
        |  WHERE ${SamplingQueries.hashBucketSql("vec_id", 1, 10)} = 9),
        |tr AS (SELECT vec_id AS train_id, qv AS tv, n2 AS n2t FROM n
        |  WHERE ${SamplingQueries.hashBucketSql("vec_id", 1, 10)} <> 9),
        |ta AS (SELECT train_id, cid FROM (
        |    SELECT t.train_id, c.cid, row_number() OVER (
        |      PARTITION BY t.train_id ORDER BY
        |        list_reduce(list_transform(generate_series(1, 64),
        |          i -> t.tv[i] * c.ce[i]), (a, v) -> a + v) DESC,
        |        c.cid ASC) AS rn
        |    FROM tr t, c$KmIters c) WHERE rn = 1),
        |ep AS (SELECT eval_id, cid FROM (
        |    SELECT e.eval_id, c.cid, row_number() OVER (
        |      PARTITION BY e.eval_id ORDER BY
        |        list_reduce(list_transform(generate_series(1, 64),
        |          i -> e.evv[i] * c.ce[i]), (a, v) -> a + v) DESC,
        |        c.cid ASC) AS rn
        |    FROM ev e, c$KmIters c) WHERE rn <= 3),
        |cand AS (SELECT DISTINCT ep.eval_id, ta.train_id
        |  FROM ep JOIN ta USING (cid)),
        |sa AS (SELECT cd.eval_id, cd.train_id,
        |    CAST(list_reduce(list_transform(generate_series(1, 64),
        |      i -> e.evv[i] * t.tv[i]), (a, v) -> a + v) AS BIGINT)
        |      AS dot, e.n2e, t.n2t
        |  FROM cand cd JOIN ev e USING (eval_id)
        |  JOIN tr t USING (train_id)),
        |ar AS (SELECT eval_id, train_id, dot, n2e, n2t,
        |    row_number() OVER (PARTITION BY eval_id
        |      ORDER BY dot DESC, train_id ASC) AS rn
        |  FROM sa),
        |annv AS (SELECT eval_id, train_id AS ann_train_id,
        |    dot AS ann_dot,
        |    (dot > 0 AND CAST(dot AS HUGEINT) * CAST(dot AS HUGEINT) * 4
        |      >= CAST(n2e AS HUGEINT) * CAST(n2t AS HUGEINT))
        |      AS ann_contaminated
        |  FROM ar WHERE rn = 1),
        |esc AS (SELECT eval_id, train_id,
        |    CAST(list_reduce(list_transform(generate_series(1, 64),
        |      i -> evv[i] * tv[i]), (a, v) -> a + v) AS BIGINT) AS dot,
        |    n2e, n2t
        |  FROM ev, tr),
        |er AS (SELECT eval_id, train_id, dot, n2e, n2t,
        |    row_number() OVER (PARTITION BY eval_id
        |      ORDER BY dot DESC, train_id ASC) AS rn
        |  FROM esc),
        |exv AS (SELECT eval_id, train_id,
        |    (dot > 0 AND CAST(dot AS HUGEINT) * CAST(dot AS HUGEINT) * 4
        |      >= CAST(n2e AS HUGEINT) * CAST(n2t AS HUGEINT))
        |      AS contaminated
        |  FROM er WHERE rn = 1)
        |SELECT x.eval_id, a.ann_train_id, a.ann_dot,
        |  coalesce(a.ann_contaminated, FALSE) AS ann_contaminated,
        |  x.contaminated AS exact_contaminated,
        |  (a.ann_train_id IS NOT DISTINCT FROM x.train_id)
        |    AS nearest_agrees,
        |  (coalesce(a.ann_contaminated, FALSE) = x.contaminated)
        |    AS verdict_agrees
        |FROM exv x LEFT JOIN annv a USING (eval_id)""".stripMargin,

    // accepted bitext pairs (the q145 replay) joined to doc lengths for
    // the parallel-corpus length-ratio QA
    "q184_bitext_ratio" ->
      s"""WITH acc AS ($bitextOracle)
        |SELECT a.src_id, a.tgt_id,
        |  s.n_chars AS src_chars, t.n_chars AS tgt_chars,
        |  (least(s.n_chars, t.n_chars) * 2
        |    >= greatest(s.n_chars, t.n_chars)) AS len_ok
        |FROM acc a
        |JOIN documents s ON s.doc_id = a.src_id
        |JOIN documents t ON t.doc_id = a.tgt_id
        |WHERE a.accepted""".stripMargin,

    "q30_embedding_neardup" ->
      s"""WITH e AS (SELECT vec_id, embedding,
        |    ${bucketSql("embedding", 8)} AS bucket FROM embeddings)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  ${dotSql("a.embedding", "b.embedding")}
        |    / (sqrt(${dotSql("a.embedding", "a.embedding")})
        |       * sqrt(${dotSql("b.embedding", "b.embedding")})) AS cosine
        |FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |WHERE (${dotSql("a.embedding", "b.embedding")}
        |    / (sqrt(${dotSql("a.embedding", "a.embedding")})
        |       * sqrt(${dotSql("b.embedding", "b.embedding")}))) >= CAST(0.2 AS DOUBLE)""".stripMargin,

    "q132_srp_ann" -> srpSql,
    "q138_srp_recall" -> srpRecallSql,

    "q135_hybrid_rrf" ->
      s"""WITH bm AS (${graft.queries.TextQueries.oracle("q129_bm25_topk")}),
        |vs AS (${oracle28}),
        |br AS (SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
        |      AS BIGINT) AS r_lex FROM bm),
        |vr AS (SELECT vec_id AS doc_id,
        |    CAST(row_number() OVER (ORDER BY cosine DESC, vec_id ASC)
        |      AS BIGINT) AS r_vec FROM vs)
        |SELECT coalesce(br.doc_id, vr.doc_id) AS doc_id,
        |  CAST(coalesce($RrfScale // ($RrfK + br.r_lex), 0)
        |    + coalesce($RrfScale // ($RrfK + vr.r_vec), 0) AS BIGINT)
        |    AS rrf,
        |  br.r_lex IS NOT NULL AS in_lex,
        |  vr.r_vec IS NOT NULL AS in_vec
        |FROM br FULL OUTER JOIN vr ON br.doc_id = vr.doc_id""".stripMargin,

    "q266_label_centroid_audit" ->
      s"""WITH q AS (SELECT vec_id, label, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * $KmScale) AS BIGINT))
        |    AS qv
        |  FROM embeddings),
        |e AS (SELECT label, unnest(qv) AS x,
        |    unnest(generate_series(1, len(qv))) AS pos
        |  FROM q),
        |m AS (SELECT label, pos,
        |    CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT)
        |      AS m
        |  FROM e GROUP BY label, pos),
        |d AS (SELECT a.label AS label_a, b.label AS label_b,
        |    CAST(sum(a.m * b.m) AS BIGINT) AS dot
        |  FROM m a JOIN m b ON a.pos = b.pos AND a.label < b.label
        |  GROUP BY a.label, b.label),
        |n2 AS (SELECT label, CAST(sum(m * m) AS BIGINT) AS n2
        |  FROM m GROUP BY label)
        |SELECT d.label_a, d.label_b, d.dot,
        |  na.n2 AS n2_a, nb.n2 AS n2_b,
        |  (CASE WHEN d.dot < 0 THEN -1 ELSE 1 END)
        |    * CAST((CAST(d.dot AS HUGEINT) * d.dot * 1000000)
        |      // nullif(CAST(na.n2 AS HUGEINT) * nb.n2, 0) AS BIGINT)
        |    AS cos2_ppm,
        |  d.dot > 0 AND CAST(d.dot AS HUGEINT) * d.dot * 400
        |    >= CAST(na.n2 AS HUGEINT) * nb.n2 * 361 AS near_collapse
        |FROM d
        |JOIN n2 na ON d.label_a = na.label
        |JOIN n2 nb ON d.label_b = nb.label""".stripMargin,

    "q275_routing_geometry_audit" ->
      s"""WITH $kmeansCtes,
        |${kmAssignCte(KmIters + 1, s"c$KmIters")},
        |cn AS (SELECT cid, ce,
        |    list_reduce(list_transform(generate_series(1, 64),
        |      i -> ce[i] * ce[i]), (a, v) -> a + v) AS n2c
        |  FROM c$KmIters),
        |nv AS (SELECT vec_id, qv,
        |    list_reduce(list_transform(generate_series(1, 64),
        |      i -> qv[i] * qv[i]), (a, v) -> a + v) AS n2
        |  FROM q),
        |l2 AS (SELECT vec_id, cid AS l2cid FROM (
        |    SELECT v.vec_id, c.cid,
        |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |        (v.n2 - 2 * list_reduce(list_transform(
        |          generate_series(1, 64), i -> v.qv[i] * c.ce[i]),
        |          (a, x) -> a + x) + c.n2c) ASC, c.cid ASC) AS rn
        |    FROM nv v, cn c) WHERE rn = 1)
        |SELECT a.cid, CAST(count(*) AS BIGINT) AS n_members,
        |  CAST(sum(CASE WHEN a.cid = l2.l2cid THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_l2_agree,
        |  CAST((sum(CASE WHEN a.cid = l2.l2cid THEN 1 ELSE 0 END)
        |    * 1000000) // count(*) AS BIGINT) AS agree_ppm
        |FROM a${KmIters + 1} a JOIN l2 USING (vec_id)
        |GROUP BY a.cid""".stripMargin,

    "q276_pq_distortion_audit" -> {
      val legs = (0 until PqM).map { ss =>
        s"""SELECT $ss AS subspace,
           |  list_reduce(list_transform(generate_series(1, $PqDims),
           |    j -> (t.sv[j] - c.ce[j]) * (t.sv[j] - c.ce[j])),
           |    (a, v) -> a + v) AS e2
           |FROM s${ss}code a
           |JOIN (SELECT vec_id, sv FROM qs$ss) t USING (vec_id)
           |JOIN s${ss}c$PqIters c USING (cid)""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * $KmScale) AS BIGINT))
        |    AS qv
        |  FROM embeddings),
        |$pqSubsCtes,
        |$pqCodeCtes,
        |err AS (
        |$legs)
        |SELECT CAST(subspace AS BIGINT) AS subspace,
        |  CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(sum(e2) // count(*) AS BIGINT) AS mean_e2,
        |  CAST(max(e2) AS BIGINT) AS max_e2
        |FROM err GROUP BY subspace""".stripMargin
    },

    "q270_cluster_label_purity" ->
      s"""WITH $kmeansCtes,
        |${kmAssignCte(KmIters + 1, s"c$KmIters")},
        |lc AS (SELECT a.cid, e.label, CAST(count(*) AS BIGINT) AS c
        |  FROM a${KmIters + 1} a JOIN embeddings e USING (vec_id)
        |  GROUP BY a.cid, e.label),
        |tot AS (SELECT cid, CAST(sum(c) AS BIGINT) AS n_members
        |  FROM lc GROUP BY cid),
        |maj AS (SELECT cid, label AS maj_label, c AS maj_count
        |  FROM (SELECT cid, label, c, row_number() OVER
        |      (PARTITION BY cid ORDER BY c DESC, label ASC) AS rn
        |    FROM lc) WHERE rn = 1)
        |SELECT t.cid, t.n_members, m.maj_label, m.maj_count,
        |  CAST((m.maj_count * 1000000) // t.n_members AS BIGINT)
        |    AS purity_ppm
        |FROM tot t JOIN maj m ON t.cid = m.cid""".stripMargin
  )

  /** q28's oracle, shared verbatim by the q135 fusion CTE. */
  private def oracle28: String =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
      |SELECT e.vec_id, e.label,
      |  ${dotSql("e.embedding", "q.qe")}
      |    / (sqrt(${dotSql("e.embedding", "e.embedding")})
      |       * sqrt(${dotSql("q.qe", "q.qe")})) AS cosine
      |FROM embeddings e, q
      |WHERE e.vec_id <> 0
      |ORDER BY cosine DESC, e.vec_id ASC
      |LIMIT 10""".stripMargin

  /** Shared q132/q138 oracle CTEs: plane derivation, integer
    * quantization, per-vector signature, query signature.
    */
  private def srpCtes: String = {
    def dotj(j: Int): String =
      s"list_reduce(list_transform(generate_series(1, $SrpDims), " +
        s"i -> qv[i] * pl[${j * SrpDims} + i]), (a, v) -> a + v)"
    val sig = (0 until SrpBits)
      .map(j => s"(CASE WHEN ${dotj(j)} >= 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
    s"""pl AS (SELECT list(
      |    CASE WHEN CAST(concat('0x', substr(md5(CAST(p AS VARCHAR)),
      |      1, 1)) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END
      |    ORDER BY p) AS pl
      |  FROM generate_series(0, ${SrpBits * SrpDims - 1}) g(p)),
      |q AS (SELECT vec_id, list_transform(embedding,
      |    x -> CAST(floor(CAST(x AS DOUBLE) * $KmScale) AS BIGINT))
      |    AS qv
      |  FROM embeddings),
      |sigs AS (SELECT vec_id, CAST($sig AS BIGINT) AS sig FROM q, pl),
      |qs AS (SELECT sig AS qsig FROM sigs WHERE vec_id = 0)""".stripMargin
  }

  /** Candidate + rerank CTEs shared by the q132/q138 oracles: hamming
    * top-SrpCand (bit_count(xor), the q34 idiom), exact integer-dot
    * rerank to the top-10.
    */
  private def srpSearchCtes: String =
    s"""$srpCtes,
      |cand AS (SELECT vec_id, dist FROM (
      |    SELECT s.vec_id,
      |      CAST(bit_count(xor(s.sig, q.qsig)) AS INT) AS dist,
      |      row_number() OVER (ORDER BY
      |        bit_count(xor(s.sig, q.qsig)) ASC, s.vec_id ASC) AS rn
      |    FROM sigs s, qs q WHERE s.vec_id <> 0) WHERE rn <= $SrpCand),
      |qq0 AS (SELECT qv FROM q WHERE vec_id = 0),
      |rerank AS (SELECT c.vec_id, c.dist,
      |    list_reduce(list_transform(generate_series(1, $SrpDims),
      |      i -> t.qv[i] * qq0.qv[i]), (x, v) -> x + v) AS score
      |  FROM cand c JOIN q t ON t.vec_id = c.vec_id, qq0),
      |srp AS (SELECT vec_id, dist, score FROM rerank
      |  ORDER BY score DESC, vec_id ASC LIMIT 10)""".stripMargin

  /** q132 oracle: the reranked top-10. */
  private def srpSql: String =
    s"""WITH $srpSearchCtes
      |SELECT vec_id, dist, CAST(score AS BIGINT) AS score FROM srp""".stripMargin

  /** q138 oracle: the reranked top-10 intersected with the integer-dot
    * brute-force top-10 (the q120/q125 audit idiom).
    */
  private def srpRecallSql: String =
    s"""WITH $srpSearchCtes,
      |brute AS (SELECT vec_id FROM (
      |    SELECT t.vec_id, row_number() OVER (ORDER BY
      |      list_reduce(list_transform(generate_series(1, $SrpDims),
      |        i -> t.qv[i] * qq0.qv[i]), (x, v) -> x + v) DESC,
      |      t.vec_id ASC) AS rn
      |    FROM q t, qq0 WHERE t.vec_id <> 0) WHERE rn <= 10)
      |SELECT CAST(10 AS INT) AS k, count(*) AS n_hits,
      |  count(*) / 10 AS recall
      |FROM brute JOIN srp USING (vec_id)""".stripMargin
}
