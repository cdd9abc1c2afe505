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

  /** Hot-shingle document-frequency cap for exact n-gram similarity
    * (q22): a shingle shared by m docs inside one (lang, source) block
    * emits C(m,2) candidate pairs from a single grouped row, so without
    * a bound one stopword-ish trigram is a straggler/OOM task at scale.
    * Shingles with block df above this cap are dropped BEFORE pair
    * emission (they carry no similarity signal — every doc in the block
    * has them), bounding per-row fan-out at C(HotDf,2) regardless of
    * corpus clone density. Must match the oracle SQL's mirrored prune.
    */
  val HotDf: Int = 64

  /** SQL snippet: 26-bin lowercase-letter histogram (array<int>) of
    * string column `c`. Single source of truth for the q70 edit-distance
    * prefilter and the PropertySpec soundness test that justifies it
    * (`levenshtein >= l1i(hist_a, hist_b) / 2`) — the bound proof and
    * the production filter must never drift apart.
    */
  def charHistogramSql(c: String): String =
    s"transform(sequence(97, 122), ch -> " +
      s"cast(length($c) - length(replace($c, char(ch), '')) as int))"

  /** Distinct word n-gram "shingles" per document: (idCol, sh).
    * Out-of-range token positions yield NULL and are skipped by concat_ws
    * (same as DuckDB list indexing), so short docs produce partial
    * shingles rather than erroring under ANSI mode.
    */
  def wordShingles(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, dedup: Boolean = true,
                   carryCols: Seq[String] = Nil): DataFrame = {
    val keep = (idCol +: carryCols).map(col)
    val toks = docs.select(keep :+ split(col(textCol), " ").as("tk"): _*)
    val parts = (0 until n)
      .map(i => s"try_element_at(tk, p + $i)").mkString(", ")
    // build the n-gram array inside one transform() so the explode emits
    // plain strings — carrying the token array through the explode costs
    // an array copy per output row
    val sh = toks.select(keep :+
      explode(expr(
        s"transform(sequence(1, greatest(size(tk) - ${n - 1}, 1)), " +
          s"p -> concat_ws(' ', $parts))")).as("sh"): _*)
    // dedup costs a full shuffle; skip it for min-aggregating consumers
    // (minhash minima are unaffected by duplicates)
    if (dedup) sh.distinct() else sh
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
    * with columns m0..m{numHashes-1}.
    *
    * One md5 per shingle; the digest is split into two 40-bit ints (a, b)
    * and the i-th hash family is a + i*b (Kirsch–Mitzenmacher double
    * hashing — max value 16*2^40 ≪ 2^63, overflow-free under ANSI). All
    * minima fall out of a single aggregation pass: no per-seed explode,
    * no extra shuffle.
    */
  def minhashSignature(shingles: DataFrame, idCol: String,
                       numHashes: Int, withCount: Boolean = false): DataFrame = {
    // md5 once per shingle, then split the digest — CollapseProject keeps
    // the two-step shape (md5 is non-cheap, so Catalyst won't re-inline
    // it into both conv() calls)
    val hashed = shingles
      .select(col(idCol), md5(col("sh").cast("binary")).as("dg"))
      .select(col(idCol),
        expr("CAST(conv(substr(dg, 1, 10), 16, 10) AS BIGINT)").as("ha"),
        expr("CAST(conv(substr(dg, 17, 10), 16, 10) AS BIGINT)").as("hb"))
    val mins = (0 until numHashes)
      .map(i => min(col("ha") + lit(i.toLong) * col("hb")).as(s"m$i"))
    // opt-in shingle count rides the SAME aggregation (zero extra
    // shuffle/join) — meaningful as a distinct-shingle count only when
    // the input frame is deduped (q64 feeds it the distinct set)
    val aggs = if (withCount) mins :+ count(lit(1)).as("n_sh") else mins
    hashed.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding of a minhash signature: (idCol, band, h) with
    * h = md5(concat of the band's rows). bands * rowsPerBand must equal
    * the signature width.
    */
  def lshBands(sig: DataFrame, idCol: String, bands: Int,
               rowsPerBand: Int, carryCols: Seq[String] = Nil): DataFrame = {
    val entries = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand)
        .map(r => s"m${b * rowsPerBand + r}").mkString(", ")
      s"$b, md5(CAST(concat_ws('|', $cols) AS BINARY))"
    }
    sig.selectExpr((idCol +: carryCols) :+
      s"stack(${bands}, ${entries.mkString(", ")}) as (band, h)": _*)
  }

  /** Candidate near-duplicate pairs: ids sharing any LSH band bucket.
    * The join shuffles only (band, digest, id); bodies never move.
    */
  def lshCandidatePairs(bandDf: DataFrame, idCol: String,
                        carryCols: Seq[String] = Nil): DataFrame = {
    val a = bandDf.select(col("band") +: col("h") +:
      col(idCol).as("doc_a") +: carryCols.map(c => col(c).as(s"a_$c")): _*)
    val b = bandDf.select(col("band").as("band_b") +: col("h").as("h_b") +:
      col(idCol).as("doc_b") +: carryCols.map(c => col(c).as(s"b_$c")): _*)
    val out = Seq("doc_a", "doc_b") ++
      carryCols.map(c => s"a_$c") ++ carryCols.map(c => s"b_$c")
    // carried columns are functionally dependent on the doc ids, so the
    // subset-dedup is deterministic; unreferenced carries prune away
    a.join(b, col("band") === col("band_b") && col("h") === col("h_b") &&
        col("doc_a") < col("doc_b"))
      .select(out.head, out.tail: _*)
      .dropDuplicates(Seq("doc_a", "doc_b"))
  }

  /** The engine's standard near-dup candidate-pair config — word
    * trigrams → MinHash(16) → LSH(4 bands × 4 rows) — pinned in ONE
    * place. Four queries (q21 pairs, q38/q95 canonical corpus, q62
    * clusters, q87 triangles) and the shared DuckDB oracle
    * (`TextQueries.minhashPairsSql`) all assume exactly these
    * parameters; change them here and the oracle together, nowhere else.
    */
  def candidatePairs(docs: DataFrame, idCol: String,
                     textCol: String): DataFrame =
    lshCandidatePairs(candidateBands(docs, idCol, textCol), idCol)

  /** The (id, band, h) band rows under the same pinned config — for
    * consumers that cap or filter buckets BEFORE pairing (q87's
    * bucket-size cap), so the parameters stay pinned here even when
    * the pair step differs.
    */
  def candidateBands(docs: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    val sh = wordShingles(docs, idCol, textCol, 3, dedup = false)
    lshBands(minhashSignature(sh, idCol, 16), idCol, 4, 4)
  }

  /** SimHash fingerprint: per-token md5 once, then `bits` conditional
    * ±1 sums in a single aggregation (no per-bit row explosion, one
    * shuffle of `bits` small ints per doc). Bit j of the digest is hex
    * nibble j/4, bit j%4 — literal-unrolled so indices constant-fold;
    * identical arithmetic on the oracle side.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
              bits: Int = 32): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .select(col(idCol), md5(col("tok").cast("binary")).as("h"))
    val bitSums = (0 until bits).map { j =>
      sum(expr(
        s"""CASE WHEN (shiftright(
           |  instr('0123456789abcdef', substr(h, ${j / 4 + 1}, 1)) - 1,
           |  ${j % 4}) & 1) = 1 THEN 1 ELSE -1 END""".stripMargin))
        .as(s"s$j")
    }
    val agged = toks.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until bits)
      .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    agged.select(col(idCol), fp.as("simhash"))
  }
}
