package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming Kolmogorov–Smirnov drift monitor: the streaming twin of
  * q258's batch KS audit (the whole-distribution read — "does this
  * window's token-length DISTRIBUTION differ from the reference
  * corpus anywhere on its support?"), closing the batch↔stream parity
  * pattern the other monitors follow (q137↔StreamDrift is the binned
  * TV divergence pair; this is the KS-grain pair on the same
  * histogram state discipline).
  *
  * Batch q258 evaluates the exact D = max|cdf_a − cdf_b| at EVERY
  * corpus-distinct length (dense grid + chunk-bounded prefix sums).
  * A stream cannot re-sort history per window, so the streaming twin
  * evaluates the same statistic on a FIXED reference grid: `nGrid`
  * cut points placed at the reference distribution's quantiles
  * (where the CDF mass is — the placement that minimizes the grid
  * gap), computed once batch-side and carried as literals. D
  * restricted to a sub-grid is a LOWER bound of the full-support D,
  * so grid restriction can only make the monitor more conservative
  * (never a false alarm relative to exact KS); refinement = more grid
  * points. At the grid points the arithmetic is EXACT — the same
  * cross-multiplied integer numerators as q258, no floats anywhere.
  *
  * State bound (the 100 TB concern): `nGrid` longs + a count per OPEN
  * window, independent of stream rate — each doc folds into the
  * conditional-sum counters map-side before the single keyed
  * exchange, exactly the StreamDrift posture. The reference grid is
  * driver-resident (nGrid ≈ 32 longs — the centroid-fetch posture),
  * embedded as literals in one stateless post-aggregation projection,
  * so the whole monitor is ONE stateful operator.
  *
  * Verdict (α = 0.05, the q258 constants): D > 1.36·√((C+R)/(C·R))
  * squared into integers — dnum²·10⁴ > 18496·(C+R)·C·R over the
  * common denominator C·R. DECIMAL(38,0)-exact while C·R ≤ 10¹⁶
  * (dnum²·10⁴ ≤ C²R²·10⁴ ≤ 10³⁶; the RHS stays under 10³⁸ for any
  * such C, R — e.g. reference 10⁹ docs × window 10⁷ docs); past that
  * the verdict fails LOUDLY via raise_error (the q240/q258 envelope
  * discipline), never silently wraps.
  */
object StreamKsDrift {

  /** Reference grid: `cuts` are token-length cut points at the
    * reference's i/n quantiles (sorted, distinct, always including the
    * max), `refCum(i)` = reference docs with toks ≤ cuts(i), `refTotal`
    * = reference doc count. Driver-resident planner-scale constants.
    */
  final case class RefGrid(cuts: Seq[Long], refCum: Seq[Long],
                           refTotal: Long)

  /** Build the grid from a batch corpus. One doc-grain scan to the
    * (toks, cnt) histogram; the histogram itself is value-grain
    * (bounded by the max document length, planner-scale) and is the
    * only thing collected.
    */
  def referenceFrom(docs: DataFrame, textCol: String,
                    nGrid: Int = 32): RefGrid = {
    require(nGrid >= 2, "nGrid must be >= 2")
    val hist = docs
      .select(size(split(col(textCol), " ")).cast("long").as("toks"))
      .groupBy(col("toks")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("toks"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    require(hist.nonEmpty, "reference corpus is empty")
    val total = hist.map(_._2).sum
    // inclusive CDF per distinct length, then pick the value at rank
    // ceil(total·i/nGrid) for i = 1..nGrid (i = nGrid lands on max)
    val cum = hist.scanLeft(0L)(_ + _._2).tail // cum(j) = docs ≤ toks(j)
    val cuts = (1 to nGrid).map { i =>
      val target = (total * i + nGrid - 1) / nGrid // ceil
      val j = cum.indexWhere(_ >= target)
      hist(j)._1
    }.distinct
    val refCum = cuts.map(c => hist.takeWhile(_._1 <= c).map(_._2).sum)
    RefGrid(cuts, refCum, total)
  }

  private def d38(c: Column) = c.cast("decimal(38,0)")

  /** (window_start, n_docs, d_ppm, drifted) per tumbling window of
    * `windowDur`, watermarked by `delay`. `stream` needs (ts, text).
    */
  def drift(stream: DataFrame, ref: RefGrid, windowDur: String,
            delay: String): DataFrame = {
    val r = ref.refTotal
    // loud envelope: both verdict sides must hold in DECIMAL(38,0)
    // ⇒ C·R ≤ 10¹⁶ ⇒ C ≤ 10¹⁶/R. Identical discipline to q258's N cap.
    val maxC = 10000000000000000L / math.max(r, 1L)
    val lens = stream
      .select(col("ts"),
        size(split(col("text"), " ")).cast("long").as("toks"))
    val counters = ref.cuts.indices.map(i =>
      sum(when(col("toks") <= ref.cuts(i), 1L).otherwise(0L))
        .as(s"g$i")) :+ count(lit(1)).as("cc")
    val agg = lens
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowDur))
      .agg(counters.head, counters.tail: _*)
    // dnum = max_i |g_i·R − refCum_i·C| — the KS numerator over the
    // common denominator C·R, evaluated at every grid point in ONE
    // stateless projection (greatest over nGrid integer expressions)
    val diffs = ref.cuts.indices.map(i =>
      abs(d38(col(s"g$i")) * lit(r) - lit(ref.refCum(i)) * d38(col("cc"))))
    val dnum = (if (diffs.size == 1) diffs.head
                else greatest(diffs: _*)).as("dnum")
    agg
      .select(col("window.start").as("window_start"),
        col("cc").as("n_docs"), dnum)
      .select(col("window_start"), col("n_docs"),
        expr(s"CAST(dnum * 1000000 div (CAST(n_docs AS DECIMAL(19,0))" +
          s" * $r) AS BIGINT)").as("d_ppm"),
        expr(s"CASE WHEN n_docs > $maxC THEN CAST(raise_error(" +
          "'StreamKsDrift: C*R beyond the exact KS envelope') AS " +
          "BOOLEAN) ELSE dnum * dnum * 10000 > CAST(18496 AS " +
          s"DECIMAL(19,0)) * (n_docs + $r) * n_docs * $r END")
          .as("drifted"))
  }
}
