package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis / document-dedup building blocks for LLM-data pipelines.
  *
  * Cross-engine determinism: all hashing is md5-over-strings (identical in
  * Spark and DuckDB), min-hash minima are lexicographic minima over hex
  * digests, and all ratios are single IEEE divisions of exact integers —
  * so the DuckDB oracles hash-match bit-for-bit.
  *
  * Scale notes (100 TB): everything here is narrow projections + explodes
  * + hash aggregations — no driver round-trips, no UDFs (whole-stage
  * codegen keeps the explode→project→agg pipeline fused). The LSH band
  * join shuffles only (band, 32-byte digest, doc_id) tuples, never
  * document bodies; dedup output is ids + digests.
  */
object Text {

  /** Distinct word n-gram "shingles" per document: (idCol, sh).
    * Out-of-range token positions yield NULL and are skipped by concat_ws
    * (same as DuckDB list indexing), so short docs produce partial
    * shingles rather than erroring under ANSI mode.
    */
  def wordShingles(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3): DataFrame = {
    val toks = docs.select(col(idCol), split(col(textCol), " ").as("tk"))
    val parts = (0 until n)
      .map(i => s"try_element_at(tk, p + $i)").mkString(", ")
    toks
      .select(col(idCol), col("tk"),
        explode(sequence(lit(1), greatest(size(col("tk")) - (n - 1), lit(1))))
          .as("p"))
      .select(col(idCol), expr(s"concat_ws(' ', $parts)").as("sh"))
      .distinct()
  }

  /** Distinct character k-gram shingles per document: (idCol, sh). */
  def charShingles(docs: DataFrame, idCol: String, textCol: String,
                   k: Int): DataFrame =
    docs
      .select(col(idCol), col(textCol).as("__t"),
        explode(sequence(lit(1),
          greatest(length(col(textCol)) - (k - 1), lit(1)))).as("p"))
      .select(col(idCol), expr(s"substr(__t, p, $k)").as("sh"))
      .distinct()

  /** MinHash signature over a shingle frame (idCol, sh): one row per id
    * with columns m0..m{numHashes-1}, where
    * m_i = min over shingles of md5(i || '|' || sh).
    */
  def minhashSignature(shingles: DataFrame, idCol: String,
                       numHashes: Int): DataFrame = {
    val seeded = shingles
      .select(col(idCol),
        explode(sequence(lit(0), lit(numHashes - 1))).as("seed"),
        col("sh"))
      .select(col(idCol), col("seed"),
        md5(concat(col("seed").cast("string"), lit("|"), col("sh"))
          .cast("binary")).as("h"))
      .groupBy(col(idCol), col("seed"))
      .agg(min(col("h")).as("mh"))
    val wide = (0 until numHashes)
      .map(i => max(when(col("seed") === i, col("mh"))).as(s"m$i"))
    seeded.groupBy(col(idCol)).agg(wide.head, wide.tail: _*)
  }

  /** LSH banding of a minhash signature: (idCol, band, h) with
    * h = md5(concat of the band's rows). bands * rowsPerBand must equal
    * the signature width.
    */
  def lshBands(sig: DataFrame, idCol: String, bands: Int,
               rowsPerBand: Int): DataFrame = {
    val entries = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand)
        .map(r => s"m${b * rowsPerBand + r}").mkString(", ")
      s"$b, md5(CAST(concat($cols) AS BINARY))"
    }
    sig.selectExpr(idCol,
      s"stack(${bands}, ${entries.mkString(", ")}) as (band, h)")
  }

  /** Candidate near-duplicate pairs: ids sharing any LSH band bucket.
    * The join shuffles only (band, digest, id); bodies never move.
    */
  def lshCandidatePairs(bandDf: DataFrame, idCol: String): DataFrame = {
    val a = bandDf.select(col("band"), col("h"), col(idCol).as("doc_a"))
    val b = bandDf.select(col("band").as("band_b"), col("h").as("h_b"),
      col(idCol).as("doc_b"))
    a.join(b, col("band") === col("band_b") && col("h") === col("h_b") &&
        col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Per-(doc, bit) ±1 contributions summed into a `bits`-wide SimHash
    * fingerprint. Bit j of md5(token) is drawn from hex nibble j/4,
    * bit j%4 — identical arithmetic on both engines.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
              bits: Int = 32): DataFrame =
    docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .select(col(idCol), col("tok"),
        explode(sequence(lit(0), lit(bits - 1))).as("j"))
      .select(col(idCol), col("j"),
        expr("""CASE WHEN (shiftright(
                  instr('0123456789abcdef',
                        substr(md5(CAST(tok AS BINARY)),
                               CAST(j div 4 AS INT) + 1, 1)) - 1,
                  CAST(j % 4 AS INT)) & 1) = 1
                THEN 1 ELSE -1 END""").as("contrib"))
      .groupBy(col(idCol), col("j"))
      .agg(sum(col("contrib")).as("s"))
      .groupBy(col(idCol))
      .agg(sum(when(col("s") > 0,
          expr("shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))"))
        .otherwise(lit(0L))).as("simhash"))
}
