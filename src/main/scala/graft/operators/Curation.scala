package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dedup-first input staging for pair-generating exact operators.
  *
  * The exact set-similarity join family (prefix filtering / AllPairs —
  * q190 and the q21 consumers) is intrinsically QUADRATIC in duplicate
  * density: f exact copies of one document generate C(f,2) candidate
  * pairs from every shared prefix token, so a clone-heavy corpus blows
  * up candidate generation even though the distinct-text workload is
  * tiny. Measured on the 10× clone corpus (commit c26eeba): raw q190
  * 113 s / 31.5 GB shuffle spill → exact-dedup first, 5.3 s / zero
  * spill. Round 6's verdict: that staging discipline lived in BASELINE.md
  * prose — this operator makes it the code path every consumer is
  * funneled through by default.
  *
  * `canonicalInput` collapses exact-duplicate families (the q20 rule:
  * one canonical row per distinct text, lowest id wins) BEFORE the
  * pair-generating join, and returns the member map needed to expand
  * canonical-grain verdicts back to raw-document grain afterwards.
  * Because exact duplicates have IDENTICAL shingle sets, expansion is
  * lossless: a raw pair's verdict (intersection, set sizes, Jaccard) is
  * exactly its canonical pair's verdict, and within-family pairs are
  * Jaccard-1 by definition. Consumers that stage through this operator
  * produce bit-identical output to the unstaged join — asserted by
  * StagedExactJoinSpec and by q190's unchanged DuckDB oracle.
  *
  * Scale: one digest-keyed hash aggregation (16-byte md5 keys, bodies
  * never shuffle beyond the canonical projection) + one digest join —
  * the same cost class as q20 itself. The expansion joins are
  * canonical-keyed equi-joins, so AQE's skew-join splitting handles
  * mega-families (vs the collect_list fan-out form, which would pin one
  * task per family).
  */
object Curation {

  /** Collapse `docs` to one canonical row per distinct `textCol`
    * (lowest `idCol` wins) and return the expansion map.
    *
    * @return (canonical, members):
    *   - `canonical`: full-width rows of `docs`, one per distinct text —
    *     the frame a pair-generating join should consume;
    *   - `members`: (`idCol`, canon, fsize) — every raw id with its
    *     family's canonical id and family size.
    */
  def canonicalInput(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id"): (DataFrame, DataFrame) =
    canonicalInputBy(docs, md5(col(textCol).cast("binary")), idCol)

  /** [[canonicalInput]] keyed on an arbitrary digest expression — for
    * frames whose duplicate identity isn't a single castable column
    * (e.g. quantized embedding arrays, digested via md5 over the
    * comma-joined components). The digest must be collision-safe at the
    * corpus scale (128-bit md5 is; 64-bit xxhash over ~1e9 rows is
    * not — a collision MERGES distinct families).
    */
  def canonicalInputBy(docs: DataFrame, digest: org.apache.spark.sql.Column,
                       idCol: String): (DataFrame, DataFrame) = {
    require(!docs.columns.contains("__h"),
      "canonicalInput reserves the __h column")
    val h = digest
    val fam = docs.select(col(idCol), h.as("__h"))
      .groupBy(col("__h"))
      .agg(min(col(idCol)).as("canon"), count(lit(1)).as("fsize"))
    val members = docs.select(col(idCol), h.as("__h"))
      .join(fam, "__h")
      .drop("__h")
    val canonical = docs.withColumn("__h", h)
      .join(fam.select(col("__h"), col("canon")), "__h")
      .filter(col(idCol) === col("canon"))
      .drop("__h", "canon")
    (canonical, members)
  }

  /** Expand canonical-grain pair verdicts back to raw-document grain.
    *
    * `verdicts` carries (aCol, bCol, payload...) at canonical grain with
    * aCol < bCol; `members` is `canonicalInput`'s map. Emits one row per
    * raw cross-family pair, ids ordered, with `swapCols` — (left, right)
    * column-name pairs whose values are per-side (e.g. set sizes) —
    * swapped whenever the raw ordering flips relative to the canonical
    * one. Within-family pairs are NOT emitted here (their verdict is
    * degenerate — identical sets); see `withinFamilyPairs`.
    */
  def expandPairs(verdicts: DataFrame, members: DataFrame, idCol: String,
                  aCol: String, bCol: String,
                  swapCols: Seq[(String, String)]): DataFrame = {
    val payload = verdicts.columns.filterNot(c => c == aCol || c == bCol)
    val ma = members.select(col("canon").as(aCol), col(idCol).as("__ma"))
    val mb = members.select(col("canon").as(bCol), col(idCol).as("__mb"))
    val flipped = col("__ma") > col("__mb")
    val swapped = payload.map { c =>
      swapCols.collectFirst {
        case (l, r) if l == c => when(flipped, col(r)).otherwise(col(l))
        case (l, r) if r == c => when(flipped, col(l)).otherwise(col(r))
      }.getOrElse(col(c)).as(c)
    }
    verdicts
      .join(ma, aCol)
      .join(mb, bCol)
      .select(least(col("__ma"), col("__mb")).as(aCol) +:
        greatest(col("__ma"), col("__mb")).as(bCol) +: swapped: _*)
  }

  /** All ordered within-family raw pairs (famSize > 1) with the family's
    * canonical id attached: (aCol, bCol, canon). A canonical-keyed
    * self-equi-join — AQE-splittable under family skew, output-bound by
    * the C(fsize, 2) contract itself.
    */
  def withinFamilyPairs(members: DataFrame, idCol: String,
                        aCol: String, bCol: String): DataFrame = {
    val dup = members.filter(col("fsize") > 1)
    dup.select(col("canon"), col(idCol).as(aCol))
      .join(dup.select(col("canon"), col(idCol).as(bCol)), "canon")
      .filter(col(aCol) < col(bCol))
  }
}
