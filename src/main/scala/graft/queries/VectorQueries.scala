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
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"),
          Vectors.cosine("embedding", "qe").as("cosine"))
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
      e.filter(col("vec_id") =!= 0)
        .join(broadcast(q), col("bucket") === col("qbucket"))
        .select(col("vec_id"), col("bucket"),
          Vectors.cosine("embedding", "qe").as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
        .limit(5)
    }),

    // ---- embedding near-duplicate pairs: 8-bit sign buckets bound the
    // candidate set; exact cosine filters inside buckets. The shuffle key
    // is a small int; vectors move once.
    "q30_embedding_neardup" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .withColumn("bucket", Vectors.signBucket("embedding", 8))
      val a = e.select(col("vec_id").as("vec_a"),
        col("embedding").as("ea"), col("bucket"))
      val b = e.select(col("vec_id").as("vec_b"),
        col("embedding").as("eb"), col("bucket").as("bucket_b"))
      a.join(b, col("bucket") === col("bucket_b")
          && col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          Vectors.cosine("ea", "eb").as("cosine"))
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
