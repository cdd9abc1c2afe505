package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable exact-integer statistical kernels (extracted from
  * q206/q208/q220 so the library exposes them as operators, not just
  * query shapes — PropertySpec drives them over randomized frames).
  * Every kernel follows the repo's determinism discipline: integer
  * arithmetic end to end, raw negative-safe fractions where a floored
  * quotient would be sign-dependent, no libm.
  */
object Stats {

  /** Capped fair-share allocation (waterfilling): split
    * B = ⌊Σcap / budgetDiv⌋ equally across the keys except no key can
    * receive more than its cap. Closed form on the cap-ascending
    * prefix sum: key i saturates iff cap_i·slots_i ≤ rem_i (the
    * predicate is prefix-closed in cap order — see q206's proof
    * sketch); the first unsaturated row fixes level = rem div slots
    * and the remainder is handed to the first (rem mod slots)
    * unsaturated keys in order. Σ alloc = min(B, Σ cap) exactly.
    * Input: one row per key with a non-negative bigint `capCol`.
    * Output: (keyCol, cap_tokens, alloc_tokens, saturated).
    * Everything past the input runs at key cardinality.
    */
  def waterfill(caps: DataFrame, keyCol: String, capCol: String,
                budgetDiv: Long = 2L): DataFrame = {
    require(budgetDiv > 0, s"budgetDiv must be positive, got $budgetDiv")
    val base = caps.select(col(keyCol), col(capCol).cast("bigint")
      .as("cap_tokens"))
    val ord = Window.orderBy(col("cap_tokens").asc, col(keyCol).asc)
    val ranked = base
      .withColumn("i", row_number().over(ord).cast("bigint"))
      .withColumn("prefix", coalesce(sum(col("cap_tokens")).over(
        ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val tot = base.agg(sum(col("cap_tokens")).as("total_tokens"),
      count(lit(1)).as("n_src"))
    val st = ranked.crossJoin(broadcast(tot))
      .withColumn("slots", col("n_src") - col("i") + 1)
      .withColumn("rem",
        expr(s"total_tokens div $budgetDiv") - col("prefix"))
      .withColumn("sat", col("cap_tokens") * col("slots") <= col("rem"))
    val cut = st.filter(!col("sat"))
      .agg(min(col("i")).as("cut_i"),
        min_by(col("rem"), col("i")).as("rem_cut"),
        min_by(col("slots"), col("i")).as("slots_cut"))
    st.crossJoin(broadcast(cut))
      .select(col(keyCol), col("cap_tokens"),
        when(col("sat"), col("cap_tokens"))
          .otherwise(expr("rem_cut div slots_cut")
            + when(col("i") - col("cut_i") < expr("rem_cut % slots_cut"),
                1L).otherwise(0L))
          .as("alloc_tokens"),
        col("sat").as("saturated"))
  }

  /** Exact Gini concentration of non-negative integer values per key,
    * WITHOUT a per-key sort window: the mean-absolute-difference
    * identity Σ_{i,j}|x_i − x_j| = 2·Σ_v c_v·(v·C_<v − S_<v) over the
    * (key, value) histogram, with both prefix columns from ONE
    * multi-column Prefix.runningSums pass. Output: (keyCol, n_rows,
    * sum_vals, gini_ppm) with gini_ppm = Σ|Δ|·1e6 div (2·n·Σx).
    * Requires Σx > 0 per key (all-zero groups have no defined Gini).
    */
  def giniPpm(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val hist = df
      .select(col(keyCol), col(valCol).cast("bigint").as("__v"))
      .groupBy(col(keyCol), col("__v")).agg(count(lit(1)).as("__cv"))
      .withColumn("__sv", col("__v") * col("__cv"))
    val cum = Prefix.runningSums(hist, keyCol, "__v",
      Seq("__cv" -> "__cc", "__sv" -> "__cs"))
    cum.groupBy(col(keyCol))
      .agg(sum(col("__cv")).as("n_rows"), sum(col("__sv")).as("sum_vals"),
        (sum(col("__cv") * (col("__v") * (col("__cc") - col("__cv"))
          - (col("__cs") - col("__sv")))) * 2).as("__md"))
      .select(col(keyCol), col("n_rows"), col("sum_vals"),
        expr("__md * 1000000 div (2 * n_rows * sum_vals)").as("gini_ppm"))
  }

  /** Exact Mann–Whitney U (doubled, so the ½-tie term stays integral)
    * per key between the rows where `cohortCol` is true (A) and false
    * (B), over integer values: U2 = Σ_v (2·cA_v·CB_<v + cA_v·cB_v)
    * from the (key, value) histogram via one Prefix.runningSum —
    * never a per-key sort. rank-biserial rb = (U2 − na·nb)/(na·nb)
    * reported as a raw fraction (negative-safe); `shifted` is the
    * cross-multiplied |rb| > 0.1 verdict. Output: (keyCol, na, nb,
    * u2, rb_num, rb_den, shifted). Keys where either cohort is empty
    * report rb_den = 0 and shifted = false (no comparison exists).
    */
  def mannWhitneyShift(df: DataFrame, keyCol: String, valCol: String,
                       cohortCol: String): DataFrame = {
    val h = df
      .select(col(keyCol), col(valCol).cast("bigint").as("__v"),
        col(cohortCol).as("__ia"))
      .groupBy(col(keyCol), col("__v"))
      .agg(sum(when(col("__ia"), 1L).otherwise(0L)).as("__ca"),
        sum(when(!col("__ia"), 1L).otherwise(0L)).as("__cb"))
    val cum = Prefix.runningSum(h, keyCol, "__v", "__cb", "__cum_b")
    cum.groupBy(col(keyCol))
      .agg(sum(col("__ca")).as("na"), sum(col("__cb")).as("nb"),
        sum(col("__ca") * (col("__cum_b") - col("__cb")) * 2
          + col("__ca") * col("__cb")).as("u2"))
      .select(col(keyCol), col("na"), col("nb"), col("u2"),
        (col("u2") - col("na") * col("nb")).as("rb_num"),
        (col("na") * col("nb")).as("rb_den"))
      .withColumn("shifted", abs(col("rb_num")) * 10 > col("rb_den"))
  }
}
