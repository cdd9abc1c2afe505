package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Warehouse-analytics depth beyond the reference's surface: CUBE,
  * pivot/unpivot, discrete percentiles, and the full analytic-window
  * function family. Determinism rules follow Relational.scala: total
  * orders on every window, integer-exact sums (quantity values are
  * integral doubles, order-independent far below 2^53), and the
  * percentile oracle re-derives Spark's percentile_disc definition from
  * first principles with integer threshold arithmetic (k*20 >= n*10
  * instead of k/n >= 0.5 — no fp boundary risk).
  */
object AnalyticsQueries {
  type Q = (SparkSession, String) => DataFrame

  /** q225 loud-failure envelope (the q240/q258/q277 discipline): the
    * N-scaled ANOVA sums of squares are computed exactly in
    * DECIMAL(38,0)/HUGEINT, but the OUTPUT columns are BIGINT by the
    * house scalar-schema rule — past this bound the BIGINT cast would
    * wrap (Spark) or error at a different point (DuckDB), so both
    * engines raise at THIS bound with the same message. The IS NULL
    * arm catches a sum that silently overflowed DECIMAL(38,0)
    * upstream (t·n > ~10¹⁹ — astronomically past any event feed).
    * `var` only so EdgeCasesSpec can force the failure on the test
    * corpus; nothing in main source mutates it.
    */
  private[graft] var AnovaSsEnvelope: Long = Long.MaxValue

  val queries: Map[String, Q] = Map(
    // ---- CUBE totals with grouping() markers (q39 covers ROLLUP);
    // grouping flags disambiguate data NULLs from subtotal NULLs
    "q48_cube" -> ((s, d) => {
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"),
          sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("cnt"))
    }),

    // ---- explicit GROUPING SETS (the general form behind ROLLUP q39 /
    // CUBE q48): two hand-picked grouping combinations in one pass
    "q83_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("v_li_gs")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_rf,
               sum(l_quantity) AS sum_qty, count(*) AS cnt
        FROM v_li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_linestatus))""")
    }),

    // ---- pivot: one column per linestatus value (wide report shape);
    // Spark's pivot emits NULL for empty cells, as does FILTER(...)
    "q49_pivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity")))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
    }),

    // ---- discrete percentiles per group: percentile_disc returns an
    // ACTUAL stored value (no interpolation), so doubles hash-match
    // bit-for-bit cross-engine. Scale posture: exact percentile is a
    // per-group sort buffer — at 100 TB with 3 groups that is the
    // low-cardinality-key single-reducer class, and the production
    // answer is the approx_percentile sketch with the q106 audit
    // gating the switch; this entry IS the exact leg those audits
    // compare against, kept exact on purpose.
    "q50_percentile_disc" -> ((s, d) => {
      // r13 (guide §2.2/§5): native percentile_disc is a
      // TypedImperativeAggregate — every group's FULL value list merges
      // into one reducer buffer (the subset bench measured the full
      // 600k-row (flag, price) set shuffling to 3 reducers; at 100 TB
      // that buffer is the OOM). groupQuantilesRational computes the
      // same value-at-rank ⌈p·n⌉ (1/2, 9/10 — exact rationals) in three
      // bounded map-combined passes; only bucket partials ever shuffle.
      // Values bit-identical: percentile_disc(p) picks the smallest
      // stored value with cum ≥ ⌈p·n⌉, exactly the rational rank rule.
      graft.operators.Quantile.groupQuantilesRational(
        Tables.lineitem(s, d), "l_returnflag", "l_extendedprice",
        Seq((1L, 2L, "median_price"), (9L, 10L, "p90_price")))
    }),

    // ---- percentile-sketch audit (the q74 pattern for quantiles):
    // approx_percentile's KLL-style sketch vs the exact discrete median,
    // emitted as a tolerance boolean — approx sketches are partition-
    // order dependent, so the raw approx value can never be a compared
    // column; the within-tolerance verdict is stable (accuracy 10000 on
    // ~20k-row groups gives rank error ~2, orders of magnitude inside
    // the 1% band). This is the check run before trusting
    // approx_percentile on 100 TB where the exact quantile is a full
    // sort away.
    "q106_percentile_audit" -> ((s, d) => {
      // r13: exact leg on groupQuantilesRational (the q50 move — the
      // native percentile_disc merges each group's full value list
      // into one reducer buffer); the approx sketch leg keeps its
      // map-combined aggregate. 3-row broadcast join reunites them.
      val li = Tables.lineitem(s, d)
      val exact = graft.operators.Quantile.groupQuantilesRational(
        li, "l_returnflag", "l_extendedprice",
        Seq((1L, 2L, "exact_median")))
      val approx = li.groupBy(col("l_returnflag"))
        .agg(expr("approx_percentile(l_extendedprice, 0.5, 10000)")
          .as("approx_median"))
      approx.join(broadcast(exact), "l_returnflag")
        .select(col("l_returnflag"), col("exact_median"),
          (abs(col("approx_median") - col("exact_median"))
            <= col("exact_median") * 0.01).as("within_1pct"))
    }),

    // ---- analytic window family: lead/lag/ntile/cume_dist over a total
    // order (o_orderdate, o_orderkey); cume_dist is a single k/n division
    // of exact ints — identical doubles on both engines
    "q52_window_analytics" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        ntile(4).over(w).as("quartile"),
        cume_dist().over(w).as("cd"))
    }),

    // ---- two-phase stats-then-apply: exact quartile edges computed
    // once (percentile_disc — actual stored values, deterministic),
    // broadcast to label every row. The 100 TB shape for data-driven
    // binning: the stats pass aggregates to 1 row; the apply pass is
    // map-only.
    "q90_quantile_label" -> ((s, d) => {
      val o = Tables.orders(s, d)
      // r13: the stats pass moves off the native percentile_disc
      // sort-aggregate (a single-group full sort buffer — the
      // low-cardinality single-reducer class at 100 TB) onto
      // Quantile.groupQuantilesRational: three bounded map-combined
      // passes, no sort anywhere. 1/4, 1/2, 3/4 are exact rationals
      // (and exact binary doubles), so the rank ⌈p·n⌉ — and therefore
      // every edge value — is bit-identical to percentile_disc.
      val edges = graft.operators.Quantile.groupQuantilesRational(
          o.withColumn("__g", lit(1)), "__g", "o_totalprice",
          Seq((1L, 4L, "p25"), (1L, 2L, "p50"), (3L, 4L, "p75")))
        .drop("__g")
      o.crossJoin(broadcast(edges))
        .select(col("o_totalprice"),
          when(col("o_totalprice") <= col("p25"), "q1")
            .when(col("o_totalprice") <= col("p50"), "q2")
            .when(col("o_totalprice") <= col("p75"), "q3")
            .otherwise("q4").as("quartile"))
        .groupBy(col("quartile"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
    }),

    // ---- NULL semantics end-to-end: NULL grouping keys form their own
    // group, and the null-safe equality join (<=>) matches NULL to NULL
    // — the cross-engine trap the determinism rules must survive
    "q91_null_semantics" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"),
          nullif(col("o_orderpriority"), lit("3-MEDIUM")).as("prio"))
      val left = o.filter(col("o_orderkey") % 2 === 0)
        .groupBy(col("prio")).agg(count(lit(1)).as("nl"))
      val right = o.filter(col("o_orderkey") % 2 === 1)
        .groupBy(col("prio").as("prio_r")).agg(count(lit(1)).as("nr"))
      left.join(right, col("prio") <=> col("prio_r"))
        .select(col("prio"), col("nl"), col("nr"))
    }),

    // ---- regexp capture groups: split the customer key out of the
    // formatted name with one codegen'd regexp_extract
    "q92_regex_extract" -> ((s, d) => {
      // try_cast on both sides (oracle uses TRY_CAST): regexp_extract
      // returns '' on a miss, and a plain cast of '' throws under ANSI
      // in Spark while DuckDB CAST('' AS BIGINT) errors too — try_cast
      // makes both engines degrade to NULL identically
      Tables.customer(s, d).select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "([A-Za-z]+)#(\\d+)", 1)
          .as("name_part"),
        regexp_extract(col("c_name"), "([A-Za-z]+)#(\\d+)", 2).as("__k"))
        .select(col("c_custkey"), col("name_part"),
          expr("try_cast(__k AS BIGINT)").as("key_part"))
    }),

    // ---- argmin/argmax aggregates: min_by/max_by with a composite
    // (value, key) ordering struct for total-order determinism — one
    // aggregation pass instead of the window + filter-rank idiom (q06)
    "q89_argmax" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          max_by(col("l_orderkey"),
            struct(col("l_extendedprice"), col("l_orderkey")))
            .as("top_order"),
          min_by(col("l_orderkey"),
            struct(col("l_extendedprice"), col("l_orderkey")))
            .as("bottom_order"),
          max(col("l_extendedprice")).as("max_price"))
    }),

    // ---- frame-boundary value functions: first/last/nth of each
    // source's doc_id order. The oracle keeps the window formulation
    // (PARTITION BY source, unbounded ROWS frame — last_value needs the
    // full frame; the default frame stops at CURRENT ROW, a classic
    // window pitfall), but the Spark plan must NOT: a window keyed on
    // ~20 sources serializes the whole table through ~20 reducers (the
    // q110 class of bug, and exactly what PlanReport's window audit
    // flags). Frame-boundary values over a FULL partition are just
    // aggregates — min, max, and 3rd-smallest via the bounded TopKAgg
    // (k rows per group cross the wire, map-side combined) — broadcast
    // back onto the rows.
    "q94_frame_values" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
      val k3 = udaf(new graft.operators.TopKAgg(3))
      val marks = docs.groupBy(col("source")).agg(
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"),
          // score = -doc_id: TopKAgg keeps the LARGEST scores, so this
          // buffers the 3 smallest doc_ids; ids are < 2^53, exact as
          // double
          k3(negate(col("doc_id")).cast("double"), col("doc_id"))
            .as("top3"))
        .select(col("source"), col("first_doc"), col("last_doc"),
          // null when the source has < 3 docs — nth_value semantics
          expr("try_element_at(top3, 3)").getField("id").as("third_doc"))
      docs.join(broadcast(marks), "source")
        .select(col("doc_id"), col("source"),
          col("first_doc"), col("last_doc"), col("third_doc"))
    }),

    // ---- array aggregation: collect_set sorted into a deterministic
    // array, then joined to a flat string for the parity gate (the
    // driver's comparator can't hash array cells — round-2 verdict;
    // the array construction is still exercised, only the compared
    // column is scalar)
    "q84_collect_sorted" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          array_join(sort_array(collect_set(col("l_linestatus"))), ",")
            .as("statuses"),
          count(lit(1)).as("cnt"))
    }),

    // ---- scalar string-function family over a codegen'd projection
    "q85_string_fns" -> ((s, d) => {
      Tables.customer(s, d).select(
        col("c_custkey"),
        upper(col("c_mktsegment")).as("seg_u"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("key_pad"),
        reverse(col("c_name")).as("name_rev"),
        substring(col("c_name"), 1, 8).as("name_pre"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"),
        length(col("c_name")).as("name_len"))
    }),

    // ---- FILTER-clause conditional aggregation (SQL surface; the
    // DataFrame twin is sum(when(...)))
    "q86_filtered_agg" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("v_li_fa")
      s.sql("""
        SELECT l_returnflag,
          count(*) FILTER (WHERE l_linestatus = 'F') AS n_f,
          sum(l_quantity) FILTER (WHERE l_discount > 0.05) AS qty_disc,
          count(*) AS n_all
        FROM v_li_fa GROUP BY l_returnflag""")
    }),

    // ---- unpivot (melt): wide aggregate back to long form — Spark's
    // Dataset.unpivot vs a DuckDB UNION ALL of measure rows
    "q58_unpivot" -> ((s, d) => {
      val wide = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"))
      wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price")),
        "measure", "val")
    }),

    // ---- EVENT-RATE SPIKE DETECTION: per (user, hour) event counts
    // flagged when the current hour reaches 1.5× the mean of the
    // user's previous three OBSERVED active hours (cur×2 ≥ Σtrail3,
    // integer cross-multiplied; a full 3-hour baseline is required —
    // partial histories never flag). The abuse/runaway-client monitor
    // on the events feed, complementing q137's corpus-level drift with
    // an entity-level rate signal. Hours are epoch-micros truncated by
    // integer arithmetic on the normalized ts_us (the q41 idiom — no
    // timestamp comparisons cross-engine). Scale: one map-combined
    // (user, hour) count, then a window partitioned by user_id —
    // high-cardinality grain (the q75/q98 audit class), rows-bounded
    // frame of 3.
    "q156_rate_spike" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .select(col("user_id"),
          (col("ts_us") - (col("ts_us") % 3600000000L)).as("hour_us"))
        .groupBy(col("user_id"), col("hour_us"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("hour_us"))
        .rowsBetween(-3, -1)
      hourly.select(col("user_id"), col("hour_us"), col("n"),
          coalesce(sum(col("n")).over(w), lit(0L)).as("trail_sum"),
          count(lit(1)).over(w).as("trail_n"))
        .withColumn("spike",
          col("trail_n") === 3 && col("n") * 2 >= col("trail_sum"))
    }),

    // ---- PER-ENTITY distribution drift (the third drift lens: q137
    // audits the corpus vs a reference, q156 an entity's RATE vs its
    // own history — this audits each entity's event-type MIX vs the
    // population): per user, the total-variation distance between the
    // user's type distribution and the global one, in exact
    // cross-multiplied integers — sum_abs = Σ_t |n_ut·G − g_t·n_u|,
    // TV = sum_abs / (2·n_u·G), flagged at TV > 0.1 ⟺ 5·sum_abs >
    // n_u·G. The bot/abuse shape: a scraper clicking one endpoint has
    // TV near 1. Every (user, type) cell exists via a broadcast type
    // list so vanished types count. Products ≤ n_ut·G — fits long to
    // ~1e18 event corpora; widen to decimal beyond (the q99 note).
    "q188_user_profile_drift" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val types = ev.select(col("event_type")).distinct()
      val glob = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("g_t"))
        .crossJoin(broadcast(
          ev.agg(count(lit(1)).as("g_total"))))
      val userTotals = ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_u"))
      val cells = userTotals.crossJoin(broadcast(types))
        .join(ev.groupBy(col("user_id"), col("event_type"))
            .agg(count(lit(1)).as("n_ut")),
          Seq("user_id", "event_type"), "left_outer")
        .select(col("user_id"), col("event_type"), col("n_u"),
          coalesce(col("n_ut"), lit(0L)).as("n_ut"))
      cells.join(broadcast(glob), "event_type")
        .groupBy(col("user_id"))
        .agg(max(col("n_u")).as("n_events"),
          sum(abs(col("n_ut") * col("g_total")
            - col("g_t") * col("n_u"))).as("sum_abs"),
          max(col("g_total")).as("g_total"))
        .select(col("user_id"), col("n_events"), col("sum_abs"),
          (col("sum_abs") * 5 > col("n_events") * col("g_total"))
            .as("drifted"))
    }),

    // ---- EVENT-SEQUENCE trigram mining (the 3-gram extension of
    // q75's Markov transitions — the pattern-mining pass behind
    // "what do users DO in order"): per-user totally-ordered event
    // streams yield (e1, e2, e3) windows via two lags, counted
    // globally, top-10 under a (count, pattern) total order. Lag
    // windows partition on high-cardinality user_id; the count fold
    // is |types|³ rows at most.
    "q189_event_trigrams" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("event_type"))
        .withColumn("e2", lag(col("event_type"), 1).over(w))
        .withColumn("e1", lag(col("event_type"), 2).over(w))
        .filter(col("e1").isNotNull)
        .groupBy(col("e1"), col("e2"),
          col("event_type").as("e3"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("e1").asc, col("e2").asc,
          col("e3").asc)
        .limit(10)
    }),

    // ---- INTER-ARRIVAL latency profile: the distribution of per-user
    // gaps between consecutive events, log2-bucketed by INTEGER bit
    // length (length(bin(gap_us)) — the q157 no-libm idiom) — the
    // latency/engagement histogram behind session-timeout tuning (q41
    // picked 30 min; THIS is the measurement that justifies a cutoff)
    // and bot detection (machine traffic piles into the low buckets).
    // One lag over the high-cardinality user window, one map-combined
    // fold to ≤64 rows.
    "q192_interarrival_profile" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts_us"))
        .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
        .filter(col("gap_us").isNotNull)
        .select(length(expr("bin(greatest(gap_us, 1))")).cast("bigint")
          .as("bits"))
        .groupBy(col("bits"))
        .agg(count(lit(1)).as("n_gaps"))
    }),

    // ---- RECURSIVE CTE hierarchy walk (Spark 4's WITH RECURSIVE —
    // the SQL-surface twin of q62's connected-components operator):
    // an org chart synthesized over supplier (parent = s_suppkey div
    // 10, a 10-ary forest rooted at keys 0..9 — the recursive leg
    // attaches only keys >= 10, since key 0 is numerically its own
    // parent), walked root-down
    // accumulating depth and the path-key sum. The engine executes
    // this as iterated joins with a fixpoint check — depth is bounded
    // by the hierarchy (log n levels), each level one equi-join; at
    // 100 TB the per-level frontier shrinks geometrically. DuckDB
    // replays the identical recursion.
    "q164_recursive_org" -> ((s, d) => {
      Tables.supplier(s, d).createOrReplaceTempView("v_supplier")
      s.sql("""
        WITH RECURSIVE org AS (
          SELECT s_suppkey AS id, CAST(0 AS INT) AS depth,
                 s_suppkey AS path_sum
          FROM v_supplier WHERE s_suppkey div 10 = 0
          UNION ALL
          SELECT s.s_suppkey AS id, o.depth + 1 AS depth,
                 o.path_sum + s.s_suppkey AS path_sum
          FROM v_supplier s JOIN org o ON s.s_suppkey div 10 = o.id
          WHERE s.s_suppkey >= 10)
        SELECT id, depth, path_sum FROM org""")
    }),

    // ---- GAP-FILL + LOCF (last observation carried forward): the
    // time-series densification every metrics warehouse runs before
    // charting/joining daily series — per user, a day spine from the
    // user's first active day to the corpus max day, left-joined to
    // observed daily counts, missing days filled by the most recent
    // observation. Day grain stays in exact epoch-micros integer space
    // (the q41/q156 idiom). Spine generation is sequence+explode per
    // user (never a driver loop); the fill window partitions on
    // high-cardinality user_id with the first row always observed, so
    // n_filled is never NULL. Spine size = users × days — bounded by
    // the retention horizon, not event volume.
    "q165_gapfill_locf" -> ((s, d) => {
      val day = 86400000000L
      val daily = Tables.events(s, d)
        .select(col("user_id"),
          (col("ts_us") - (col("ts_us") % day)).as("day_us"))
        .groupBy(col("user_id"), col("day_us"))
        .agg(count(lit(1)).as("n"))
      val bounds = daily.groupBy(col("user_id"))
        .agg(min(col("day_us")).as("lo"))
      val gMax = daily.agg(max(col("day_us")).as("hi"))
      val spine = bounds.crossJoin(broadcast(gMax))
        .select(col("user_id"),
          explode(expr(s"sequence(lo, hi, ${day}L)")).as("day_us"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day_us"))
        .rowsBetween(Window.unboundedPreceding, 0)
      spine.join(daily, Seq("user_id", "day_us"), "left")
        .select(col("user_id"), col("day_us"), col("n"))
        .withColumn("n_filled", last(col("n"), ignoreNulls = true).over(w))
        .withColumn("observed", col("n").isNotNull)
        .drop("n")
    }),

    // ---- REPEAT-ORDER survival curve (discrete hazard): for each
    // order index k, how many customers reached a k-th order (at_risk)
    // and how many of those went on to a (k+1)-th (continued) — the
    // Kaplan–Meier-shaped retention-by-depth read next to q42's
    // time-based cohort grid (that one buckets by calendar month; this
    // one by ordinal engagement depth, the curve a lifecycle model is
    // fit to). hazard_ppm = continued·1e6 ÷ at_risk in pure BIGINT
    // floor division (both operands non-negative, so Spark div and
    // DuckDB // agree). Plan: one per-customer count, sequence+explode
    // to (customer, k) — Σ rows = |orders|, linear — and a map-combined
    // group on k whose output is max-order-count rows. No window, no
    // sort; at 100 TB the only exchange is the per-customer count every
    // retention statistic pays.
    "q207_repeat_hazard" -> ((s, d) => {
      val m = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("m"))
      m.select(explode(expr("sequence(1L, m)")).as("k"), col("m"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("at_risk"),
          sum(when(col("m") > col("k"), 1L).otherwise(0L)).as("continued"))
        .select(col("k"), col("at_risk"), col("continued"),
          expr("continued * 1000000 div at_risk").as("hazard_ppm"))
    }),

    // ---- CUSUM change-point detection on per-user daily activity:
    // q156's spike gate compares one hour against its trailing window
    // (a LEVEL test — a slow sustained drift never trips it); CUSUM
    // accumulates every deviation from the user's own baseline and
    // alarms when the cumulated excess crosses a threshold — the
    // classic sequential change detector. The recurrence
    // S_t = max(0, S_{t−1} + dev_t) is NOT a plain prefix sum, but it
    // has the closed form S_t = P_t − min(0, min_{j≤t} P_j) over the
    // deviation prefix sums P — two window passes, no sequential
    // driver loop. INTEGER-EXACT throughout: deviations are scaled by
    // the user's observed-day count (dev = x·days − total, i.e.
    // (x − mean)·days), so the baseline mean never becomes a double;
    // alarm when S > 5·total (= 5 mean-days of excess in the same
    // scaling). Windows partition on user_id — high-cardinality by
    // design (the q156/q165 precedent), each partition a user's short
    // day series. At 100 TB: one (user, day) count, two
    // user-partitioned windows; nothing global.
    "q210_cusum_change" -> ((s, d) => {
      val day = 86400000000L
      val daily = Tables.events(s, d)
        .select(col("user_id"),
          (col("ts_us") - (col("ts_us") % day)).as("day_us"))
        .groupBy(col("user_id"), col("day_us"))
        .agg(count(lit(1)).as("x"))
      val base = daily.groupBy(col("user_id"))
        .agg(sum(col("x")).as("total"), count(lit(1)).as("days"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day_us"))
        .rowsBetween(Window.unboundedPreceding, 0)
      daily.join(base, "user_id")
        .withColumn("p", sum(col("x") * col("days") - col("total")).over(w))
        .withColumn("cusum",
          col("p") - least(lit(0L), min(col("p")).over(w)))
        .select(col("user_id"), col("day_us"), col("x"), col("cusum"),
          (col("cusum") > col("total") * 5).as("alarm"))
    }),

    // ---- 2×2 chi-square independence gate (the A/B decision the
    // drift audits stop short of): per event type, does the
    // high-value-outcome rate differ between the two user cohorts
    // (user_id parity — the deterministic stand-in for an experiment
    // assignment)? Decision χ² > 3.84 (α = 0.05, df = 1) evaluated
    // ENTIRELY in cross-multiplied integers — 100·N·(ad−bc)² >
    // 384·(a+b)(c+d)(a+c)(b+d) — in DECIMAL(18,0) products (the
    // q137/q205 discipline; DuckDB replays in HUGEINT), so no libm
    // and no division enter the verdict. One map-combined pass to 4
    // counts per type; the test itself is free at any scale.
    "q212_chi2_gate" -> ((s, d) => {
      def d18(c: org.apache.spark.sql.Column) = c.cast("decimal(18,0)")
      Tables.events(s, d)
        .select(col("event_type"), (col("user_id") % 2 === 0).as("seg0"),
          (col("value") >= 50.0).as("pos"))
        .groupBy(col("event_type"))
        .agg(
          sum(when(col("seg0") && col("pos"), 1L).otherwise(0L)).as("a"),
          sum(when(col("seg0") && !col("pos"), 1L).otherwise(0L)).as("b"),
          sum(when(!col("seg0") && col("pos"), 1L).otherwise(0L)).as("c"),
          sum(when(!col("seg0") && !col("pos"), 1L).otherwise(0L)).as("d"))
        .withColumn("significant", {
          val diff = d18(col("a")) * d18(col("d")) -
            d18(col("b")) * d18(col("c"))
          val n = d18(col("a") + col("b") + col("c") + col("d"))
          val margins = d18(col("a") + col("b")) *
            d18(col("c") + col("d")) *
            d18(col("a") + col("c")) * d18(col("b") + col("d"))
          lit(100).cast("decimal(18,0)") * n * diff * diff >
            lit(384).cast("decimal(18,0)") * margins
        })
    }),

    // ---- WEEKLY SEASONALITY strength (one-way ANOVA η², integer):
    // does day-of-week explain the daily event volume? η² =
    // SS_between/SS_total over the 30-day daily-count series grouped
    // by weekday — the decomposition a capacity planner runs before
    // trusting a single weekly profile. Exact-integer discipline:
    // deviations are N-scaled (dev_d = x_d·N − T, so SS_total·N² =
    // Σ dev² is integral); the between-group term (T_g·N − T·n_g)²
    // carries a 1/n_g that is NOT integral, so each group's term takes
    // ONE floor division (identical in both engines — parity-safe; the
    // ≤ n_g absolute bias per group is documented and harmless at ppm
    // scale). The LINEAR deviations stay Long-exact to T·N ≈ 9·10¹⁸
    // (T = total events, N ≤ a few hundred daily rows), but their
    // SQUARES reach T²·N² — wrapping silently at T·N > ~3·10⁹, i.e. a
    // few 10⁷ events/day — so every square runs in DECIMAL(38,0)
    // (exact to T·N ≈ 10¹⁹) with the q229 exact-floor division
    // ((a − a%n)/n is rounding-free for an integral quotient ≤ 10³²),
    // and the BIGINT output casts are AnovaSsEnvelope-guarded: past
    // Long range both engines raise the same error instead of Spark
    // wrapping where DuckDB's HUGEINT stays exact (the q214-class
    // silent divergence). A zero-variance series (every day the same
    // count) is defined as η² = 0 on both engines — Spark's div would
    // return NULL where DuckDB's // errors. Two tiny aggregates
    // (365-row daily frame → 7-row dow frame); η² ∈ [0, 1e6] ppm.
    "q225_dow_anova" -> ((s, d) => {
      val day = 86400000000L
      val daily = Tables.events(s, d)
        .select((col("ts_us") - (col("ts_us") % day)).as("day_us"))
        .groupBy(col("day_us")).agg(count(lit(1)).as("x"))
        .withColumn("dow", expr("dayofweek(timestamp_micros(day_us))"))
      val tot = daily.agg(sum(col("x")).as("t"),
        count(lit(1)).as("n"))
      val ssTot = daily.crossJoin(broadcast(tot))
        .select((col("x") * col("n") - col("t")).as("dv"),
          col("t"), col("n"))
        .select((col("dv").cast("decimal(19,0)") * col("dv"))
          .as("dev2"), col("t"), col("n"))
        .groupBy(col("t"), col("n")).agg(sum(col("dev2")).as("ss_tot"))
      val ssB = daily.groupBy(col("dow"))
        .agg(sum(col("x")).as("tg"), count(lit(1)).as("ng"))
        .crossJoin(broadcast(tot))
        .select((col("tg") * col("n") - col("t") * col("ng")).as("dv"),
          col("ng"))
        .select(expr("CAST((CAST(dv AS DECIMAL(19,0)) * dv " +
          "- CAST(dv AS DECIMAL(19,0)) * dv % ng) / ng " +
          "AS DECIMAL(38,0))").as("term"))
        .agg(sum(col("term")).as("ss_b"))
      ssTot.crossJoin(broadcast(ssB))
        .select(col("n").as("n_days"),
          expr(s"CASE WHEN ss_b IS NULL OR ss_b > $AnovaSsEnvelope " +
            "THEN CAST(raise_error('q225: SS beyond BIGINT-exact " +
            "envelope') AS BIGINT) ELSE CAST(ss_b AS BIGINT) END")
            .as("ss_b"),
          expr(s"CASE WHEN ss_tot IS NULL OR ss_tot > $AnovaSsEnvelope " +
            "THEN CAST(raise_error('q225: SS beyond BIGINT-exact " +
            "envelope') AS BIGINT) ELSE CAST(ss_tot AS BIGINT) END")
            .as("ss_tot"),
          expr("CASE WHEN ss_tot = 0 THEN 0L " +
            "ELSE ss_b * 1000000 div ss_tot END").as("eta2_ppm"))
    }),

    // ---- FUNNEL CONVERSION LATENCY: how long from a user's first
    // `signup` to their first subsequent `purchase`? q43's funnel
    // counts who converts; operations wants the latency distribution
    // of those who do. Per-user first-event times are two conditional
    // mins in ONE map-combined pass (no window, no self-join);
    // converted = purchase strictly after signup; the latency
    // distribution reduces to one row — n_signup, n_converted, and
    // exact median/p90 of the conversion delay via
    // Quantile.groupQuantiles (rank-exact percentile_disc values; day
    // spans in epoch-micros are integers far below 2^53, so the
    // double passage is exact). At 100 TB: one user-grain exchange —
    // the same price as any per-entity funnel — then planner-scale.
    "q215_conversion_latency" -> ((s, d) => {
      val firsts = Tables.events(s, d)
        .filter(col("event_type").isin("signup", "purchase"))
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "signup", col("ts_us")))
            .as("first_signup"),
          min(when(col("event_type") === "purchase", col("ts_us")))
            .as("first_purchase"))
        .filter(col("first_signup").isNotNull)
      val conv = firsts
        .filter(col("first_purchase") > col("first_signup"))
        .select(lit(1).as("grp"),
          (col("first_purchase") - col("first_signup"))
            .cast("double").as("delay"))
      val qs = graft.operators.Quantile.groupQuantiles(
        conv, "grp", "delay", Seq(0.5 -> "med", 0.9 -> "p90"))
      // LEFT join on the literal group key, not a crossJoin: when no
      // user converts, groupQuantiles returns an EMPTY frame and a
      // cross join would annihilate the aggregate row — while the
      // DuckDB oracle's `FROM s, q` keeps it (q is an always-one-row
      // aggregate emitting NULL percentiles). The left join preserves
      // the n_signup/n_converted row with NULL med/p90 on that edge
      // and is identical to the cross join whenever a converter exists
      // (qs is then exactly one grp=1 row). (ADVICE r8.)
      firsts.agg(count(lit(1)).as("n_signup"),
          sum(when(col("first_purchase") > col("first_signup"), 1L)
            .otherwise(0L)).as("n_converted"))
        .withColumn("grp", lit(1))
        .join(broadcast(qs), Seq("grp"), "left")
        .select(col("n_signup"), col("n_converted"),
          col("med").cast("bigint").as("med_delay_us"),
          col("p90").cast("bigint").as("p90_delay_us"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q156_rate_spike" ->
      """WITH t AS (SELECT user_id,
        |    (epoch_ns(ts) // 1000) - ((epoch_ns(ts) // 1000)
        |      % 3600000000) AS hour_us
        |  FROM events),
        |h AS (SELECT user_id, hour_us, CAST(count(*) AS BIGINT) AS n
        |  FROM t GROUP BY 1, 2)
        |SELECT user_id, hour_us, n,
        |  CAST(coalesce(sum(n) OVER (PARTITION BY user_id
        |    ORDER BY hour_us ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING),
        |    0) AS BIGINT) AS trail_sum,
        |  CAST(count(*) OVER (PARTITION BY user_id
        |    ORDER BY hour_us ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
        |    AS BIGINT) AS trail_n,
        |  (count(*) OVER (PARTITION BY user_id ORDER BY hour_us
        |     ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) = 3
        |   AND n * 2 >= coalesce(sum(n) OVER (PARTITION BY user_id
        |     ORDER BY hour_us ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING),
        |     0)) AS spike
        |FROM h""".stripMargin,

    "q192_interarrival_profile" ->
      """WITH t AS (SELECT user_id, event_id,
        |    epoch_ns(ts) // 1000 AS us FROM events),
        |g AS (SELECT us - lag(us, 1) OVER (PARTITION BY user_id
        |    ORDER BY us ASC, event_id ASC) AS gap_us
        |  FROM t)
        |SELECT CAST(length(bin(greatest(gap_us, 1))) AS BIGINT) AS bits,
        |  count(*) AS n_gaps
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY 1""".stripMargin,

    "q188_user_profile_drift" ->
      """WITH ev AS (SELECT user_id, event_type FROM events),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS g_t
        |  FROM ev GROUP BY 1),
        |gt AS (SELECT CAST(count(*) AS BIGINT) AS g_total FROM ev),
        |ut AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_u
        |  FROM ev GROUP BY 1),
        |cu AS (SELECT user_id, event_type,
        |    CAST(count(*) AS BIGINT) AS n_ut FROM ev GROUP BY 1, 2),
        |cells AS (SELECT u.user_id, t.event_type, u.n_u,
        |    CAST(coalesce(c.n_ut, 0) AS BIGINT) AS n_ut
        |  FROM ut u CROSS JOIN (SELECT DISTINCT event_type FROM ev) t
        |  LEFT JOIN cu c ON c.user_id = u.user_id
        |    AND c.event_type = t.event_type)
        |SELECT cells.user_id,
        |  CAST(max(cells.n_u) AS BIGINT) AS n_events,
        |  CAST(sum(abs(cells.n_ut * gt.g_total - g.g_t * cells.n_u))
        |    AS BIGINT) AS sum_abs,
        |  (CAST(sum(abs(cells.n_ut * gt.g_total - g.g_t * cells.n_u))
        |    AS BIGINT) * 5
        |    > max(cells.n_u) * max(gt.g_total)) AS drifted
        |FROM cells JOIN g USING (event_type), gt
        |GROUP BY cells.user_id""".stripMargin,

    "q189_event_trigrams" ->
      """WITH o AS (SELECT user_id, event_type,
        |    lag(event_type, 1) OVER w AS e2,
        |    lag(event_type, 2) OVER w AS e1
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY epoch_ns(ts) // 1000 ASC, event_id ASC))
        |SELECT e1, e2, event_type AS e3, count(*) AS n
        |FROM o WHERE e1 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, e1 ASC, e2 ASC, e3 ASC
        |LIMIT 10""".stripMargin,

    "q164_recursive_org" ->
      """WITH RECURSIVE org AS (
        |  SELECT s_suppkey AS id, CAST(0 AS INT) AS depth,
        |         s_suppkey AS path_sum
        |  FROM supplier WHERE s_suppkey // 10 = 0
        |  UNION ALL
        |  SELECT s.s_suppkey AS id, o.depth + 1 AS depth,
        |         o.path_sum + s.s_suppkey AS path_sum
        |  FROM supplier s JOIN org o ON s.s_suppkey // 10 = o.id
        |  WHERE s.s_suppkey >= 10)
        |SELECT id, depth, path_sum FROM org""".stripMargin,

    "q165_gapfill_locf" ->
      """WITH t AS (SELECT user_id,
        |    (epoch_ns(ts) // 1000) - ((epoch_ns(ts) // 1000)
        |      % 86400000000) AS day_us
        |  FROM events),
        |d AS (SELECT user_id, day_us, CAST(count(*) AS BIGINT) AS n
        |  FROM t GROUP BY 1, 2),
        |b AS (SELECT user_id, min(day_us) AS lo FROM d GROUP BY 1),
        |g AS (SELECT max(day_us) AS hi FROM d),
        |sp AS (SELECT user_id, CAST(u AS BIGINT) AS day_us
        |  FROM b, g, unnest(generate_series(lo, hi, 86400000000)) s(u))
        |SELECT sp.user_id, sp.day_us,
        |  CAST(last_value(d.n IGNORE NULLS) OVER (PARTITION BY sp.user_id
        |    ORDER BY sp.day_us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_filled,
        |  d.n IS NOT NULL AS observed
        |FROM sp LEFT JOIN d
        |  ON d.user_id = sp.user_id AND d.day_us = sp.day_us""".stripMargin,

    "q48_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
        |  sum(l_quantity) AS sum_qty, count(*) AS cnt
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "q83_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        |  sum(l_quantity) AS sum_qty, count(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_linestatus))""".stripMargin,

    "q49_pivot" ->
      """SELECT l_returnflag,
        |  sum(l_quantity) FILTER (WHERE l_linestatus = 'F') AS qty_f,
        |  sum(l_quantity) FILTER (WHERE l_linestatus = 'O') AS qty_o
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    // Spark percentile_disc(p) = smallest v with cume_dist(v) >= p;
    // encoded with integer arithmetic (k*10 >= n*5 / k*10 >= n*9) to
    // avoid any fp comparison at quantile boundaries
    "q50_percentile_disc" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_extendedprice AS v,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice) AS k,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  min(CASE WHEN k * 10 >= n * 5 THEN v END) AS median_price,
        |  min(CASE WHEN k * 10 >= n * 9 THEN v END) AS p90_price
        |FROM r GROUP BY l_returnflag""".stripMargin,

    // the oracle asserts the tolerance HOLDS (the q74 idiom): a sketch
    // off by >1% of the median on these group sizes would be a defect
    "q106_percentile_audit" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_extendedprice AS v,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice) AS k,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  min(CASE WHEN k * 10 >= n * 5 THEN v END) AS exact_median,
        |  TRUE AS within_1pct
        |FROM r GROUP BY l_returnflag""".stripMargin,

    "q52_window_analytics" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  cume_dist() OVER w AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin,

    // quartile edge rule mirrors percentile_disc: smallest v with
    // cume_dist >= p, via integer threshold arithmetic
    "q90_quantile_label" ->
      """WITH r AS (SELECT o_orderkey, o_totalprice,
        |    row_number() OVER (ORDER BY o_totalprice) AS k,
        |    count(*) OVER () AS n
        |  FROM orders),
        |e AS (SELECT
        |    min(CASE WHEN k * 4 >= n * 1 THEN o_totalprice END) AS p25,
        |    min(CASE WHEN k * 4 >= n * 2 THEN o_totalprice END) AS p50,
        |    min(CASE WHEN k * 4 >= n * 3 THEN o_totalprice END) AS p75
        |  FROM r)
        |SELECT CASE WHEN o_totalprice <= p25 THEN 'q1'
        |            WHEN o_totalprice <= p50 THEN 'q2'
        |            WHEN o_totalprice <= p75 THEN 'q3'
        |            ELSE 'q4' END AS quartile,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders, e
        |GROUP BY 1""".stripMargin,

    "q91_null_semantics" ->
      """WITH o AS (SELECT o_orderkey,
        |    nullif(o_orderpriority, '3-MEDIUM') AS prio FROM orders),
        |l AS (SELECT prio, count(*) AS nl FROM o
        |  WHERE o_orderkey % 2 = 0 GROUP BY prio),
        |r AS (SELECT prio AS prio_r, count(*) AS nr FROM o
        |  WHERE o_orderkey % 2 = 1 GROUP BY prio)
        |SELECT prio, nl, nr FROM l JOIN r
        |  ON prio IS NOT DISTINCT FROM prio_r""".stripMargin,

    "q92_regex_extract" ->
      """SELECT c_custkey,
        |  regexp_extract(c_name, '([A-Za-z]+)#(\d+)', 1) AS name_part,
        |  TRY_CAST(regexp_extract(c_name, '([A-Za-z]+)#(\d+)', 2) AS BIGINT)
        |    AS key_part
        |FROM customer""".stripMargin,

    "q89_argmax" ->
      """WITH r AS (SELECT l_returnflag, l_orderkey, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice DESC, l_orderkey DESC) AS rd,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice ASC, l_orderkey ASC) AS ra
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  min(CASE WHEN rd = 1 THEN l_orderkey END) AS top_order,
        |  min(CASE WHEN ra = 1 THEN l_orderkey END) AS bottom_order,
        |  max(l_extendedprice) AS max_price
        |FROM r GROUP BY l_returnflag""".stripMargin,

    "q94_frame_values" ->
      """SELECT doc_id, source,
        |  first_value(doc_id) OVER w AS first_doc,
        |  last_value(doc_id) OVER w AS last_doc,
        |  nth_value(doc_id, 3) OVER w AS third_doc
        |FROM documents
        |WINDOW w AS (PARTITION BY source ORDER BY doc_id ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,

    "q84_collect_sorted" ->
      """SELECT l_returnflag,
        |  array_to_string(
        |    list(DISTINCT l_linestatus ORDER BY l_linestatus), ',') AS statuses,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q85_string_fns" ->
      """SELECT c_custkey,
        |  upper(c_mktsegment) AS seg_u,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_pad,
        |  reverse(c_name) AS name_rev,
        |  substr(c_name, 1, 8) AS name_pre,
        |  concat_ws('|', c_mktsegment, c_name) AS joined,
        |  CAST(length(c_name) AS INT) AS name_len
        |FROM customer""".stripMargin,

    "q86_filtered_agg" ->
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_linestatus = 'F') AS n_f,
        |  sum(l_quantity) FILTER (WHERE l_discount > 0.05) AS qty_disc,
        |  count(*) AS n_all
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q58_unpivot" ->
      """WITH wide AS (
        |  SELECT l_returnflag, sum(l_quantity) AS sum_qty,
        |    round(sum(l_extendedprice), 2) AS sum_price
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS val FROM wide
        |UNION ALL
        |SELECT l_returnflag, 'sum_price' AS measure, sum_price AS val
        |FROM wide""".stripMargin,

    // P = deviation prefix sum, S = P − min(0, running min of P): the
    // max(0, S+d) recurrence in closed form — replayed with two nested
    // windows
    "q210_cusum_change" ->
      """WITH t AS (SELECT user_id,
        |    (epoch_ns(ts) // 1000) - ((epoch_ns(ts) // 1000)
        |      % 86400000000) AS day_us
        |  FROM events),
        |daily AS (SELECT user_id, day_us, CAST(count(*) AS BIGINT) AS x
        |  FROM t GROUP BY 1, 2),
        |base AS (SELECT user_id, CAST(sum(x) AS BIGINT) AS total,
        |    CAST(count(*) AS BIGINT) AS days
        |  FROM daily GROUP BY user_id),
        |p AS (SELECT d.user_id, d.day_us, d.x, b.total,
        |    CAST(sum(d.x * b.days - b.total) OVER (
        |      PARTITION BY d.user_id ORDER BY d.day_us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS p
        |  FROM daily d JOIN base b ON d.user_id = b.user_id),
        |s AS (SELECT user_id, day_us, x, total,
        |    p - least(CAST(0 AS BIGINT), CAST(min(p) OVER (
        |      PARTITION BY user_id ORDER BY day_us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT)) AS cusum
        |  FROM p)
        |SELECT user_id, day_us, x, CAST(cusum AS BIGINT) AS cusum,
        |  cusum > total * 5 AS alarm
        |FROM s""".stripMargin,

    // HUGEINT replay of the DECIMAL(18,0) cross-multiplied chi-square
    "q212_chi2_gate" ->
      """WITH g AS (SELECT event_type,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 AND value >= 50.0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 AND NOT value >= 50.0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN user_id % 2 <> 0 AND value >= 50.0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN user_id % 2 <> 0 AND NOT value >= 50.0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM events GROUP BY event_type)
        |SELECT event_type, a, b, c, d,
        |  100 * CAST(a + b + c + d AS HUGEINT)
        |      * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
        |      * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
        |    > 384 * CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d)
        |    AS significant
        |FROM g""".stripMargin,

    "q207_repeat_hazard" ->
      """WITH m AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS m
        |  FROM orders GROUP BY o_custkey),
        |e AS (SELECT unnest(generate_series(1, m)) AS k, m FROM m)
        |SELECT k, CAST(count(*) AS BIGINT) AS at_risk,
        |  CAST(sum(CASE WHEN m > k THEN 1 ELSE 0 END) AS BIGINT)
        |    AS continued,
        |  (CAST(sum(CASE WHEN m > k THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000) // CAST(count(*) AS BIGINT) AS hazard_ppm
        |FROM e GROUP BY k""".stripMargin,

    // dow is a grouping key only, never output — Spark's 1..7 and
    // DuckDB's 0..6 weekday labels induce the SAME 7-way partition,
    // so every reported sum matches bit-for-bit. Squares in HUGEINT
    // (the Spark side's DECIMAL(38,0)), AnovaSsEnvelope-guarded
    // BIGINT output casts, zero-variance η² defined 0 — see the
    // Spark-side derivation.
    "q225_dow_anova" ->
      s"""WITH t0 AS (SELECT (epoch_ns(ts) // 1000)
        |    - ((epoch_ns(ts) // 1000) % 86400000000) AS day_us
        |  FROM events),
        |daily AS (SELECT day_us, CAST(count(*) AS BIGINT) AS x
        |  FROM t0 GROUP BY day_us),
        |dw AS (SELECT day_us, x,
        |    dayofweek(make_timestamp(day_us)) AS dow FROM daily),
        |tot AS (SELECT CAST(sum(x) AS BIGINT) AS t,
        |    CAST(count(*) AS BIGINT) AS n FROM daily),
        |st AS (SELECT CAST(sum(CAST(x * n - t AS HUGEINT)
        |      * (x * n - t)) AS HUGEINT) AS ss_tot, max(n) AS n
        |  FROM daily, tot),
        |g AS (SELECT dow, CAST(sum(x) AS BIGINT) AS tg,
        |    CAST(count(*) AS BIGINT) AS ng FROM dw GROUP BY dow),
        |sb AS (SELECT CAST(sum((CAST(tg * n - t * ng AS HUGEINT)
        |      * (tg * n - t * ng)) // ng) AS HUGEINT) AS ss_b
        |  FROM g, tot)
        |SELECT st.n AS n_days,
        |  CASE WHEN sb.ss_b IS NULL OR sb.ss_b > $AnovaSsEnvelope
        |    THEN CAST(error('q225: SS beyond BIGINT-exact envelope')
        |      AS BIGINT)
        |    ELSE CAST(sb.ss_b AS BIGINT) END AS ss_b,
        |  CASE WHEN st.ss_tot IS NULL OR st.ss_tot > $AnovaSsEnvelope
        |    THEN CAST(error('q225: SS beyond BIGINT-exact envelope')
        |      AS BIGINT)
        |    ELSE CAST(st.ss_tot AS BIGINT) END AS ss_tot,
        |  CASE WHEN st.ss_tot = 0 THEN 0
        |    ELSE CAST((sb.ss_b * 1000000) // st.ss_tot AS BIGINT) END
        |    AS eta2_ppm
        |FROM st, sb""".stripMargin,

    "q215_conversion_latency" ->
      """WITH f AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'signup'
        |      THEN epoch_ns(ts) // 1000 END) AS first_signup,
        |    min(CASE WHEN event_type = 'purchase'
        |      THEN epoch_ns(ts) // 1000 END) AS first_purchase
        |  FROM events WHERE event_type IN ('signup', 'purchase')
        |  GROUP BY user_id),
        |s AS (SELECT * FROM f WHERE first_signup IS NOT NULL),
        |c AS (SELECT CAST(first_purchase - first_signup AS DOUBLE)
        |    AS delay
        |  FROM s WHERE first_purchase > first_signup),
        |q AS (SELECT
        |    percentile_disc(0.5) WITHIN GROUP (ORDER BY delay) AS med,
        |    percentile_disc(0.9) WITHIN GROUP (ORDER BY delay) AS p90
        |  FROM c)
        |SELECT CAST(count(*) AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN first_purchase > first_signup
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
        |  CAST(max(q.med) AS BIGINT) AS med_delay_us,
        |  CAST(max(q.p90) AS BIGINT) AS p90_delay_us
        |FROM s, q""".stripMargin
  )
}
