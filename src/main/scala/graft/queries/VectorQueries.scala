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

  val queries: Map[String, Q] = Map(
    // ---- brute-force cosine top-10 vs the vec_id=0 query vector:
    // broadcast 1-row query side, one codegen'd pass, no shuffle
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
    })
  )

  val oracle: Map[String, String] = Map(
    "q28_cosine_topk" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id, e.label,
        |  ${dotSql("e.embedding", "q.qe")}
        |    / (sqrt(${dotSql("e.embedding", "e.embedding")})
        |       * sqrt(${dotSql("q.qe", "q.qe")})) AS cosine
        |FROM embeddings e, q
        |WHERE e.vec_id <> 0
        |ORDER BY cosine DESC, e.vec_id ASC
        |LIMIT 10""".stripMargin,

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
        |       * sqrt(${dotSql("b.embedding", "b.embedding")}))) >= CAST(0.2 AS DOUBLE)""".stripMargin
  )
}
