package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Calendar, Dedup, Merge, Scd2}

/** Relational operator coverage (SURVEY.md §2.1–§2.8), each query expressed
  * twice: the Spark plan here and an equivalent DuckDB SQL oracle. Query
  * result columns are aliased identically on both sides (driver hash-compares
  * after sorting columns by name).
  *
  * Determinism rules used throughout:
  *  - every window/top-k has a total order (unique id tiebreak);
  *  - double outputs are either raw single-op arithmetic on identical
  *    inputs (bit-deterministic) or round(·, 2) of sums of 2-decimal data
  *    (accumulated fp error ≪ the 0.005 rounding margin);
  *  - DuckDB aggregate types are CAST to Spark's (sum(bigint) would
  *    otherwise widen to hugeint).
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- A1/P5: filter + group-count (active-headcount-by-designation
    // shape, reference Task_4_generate_active_table.py:27-30)
    "q01_filter_group_count" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderstatus") === "O")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
    }),

    // ---- A2-A4/F8: multi-aggregate pricing summary (sum/count per group)
    "q02_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          round(sum(col("l_discount")), 2).as("sum_disc"),
          count(lit(1)).as("cnt"))
    }),

    // ---- A5: group-min over dates (SCD2 min(start_date) shape,
    // reference merge2_tf_dim_staging.py:32)
    "q03_group_min_date" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(min(to_date(col("o_orderdate"))).as("first_order_date"))
    }),

    // ---- J1/F8/F9/P6/O1: two-aggregate inner join + percentage + filter
    // (the Quota80Pct report shape, reference Task_4_monthly_80_percent.py)
    "q04_quota_pct" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val avail = o.groupBy(col("o_custkey").as("emp_id"))
        .agg(count(lit(1)).as("total_orders"))
      val availed = o.filter(col("o_orderstatus") === "F")
        .groupBy(col("o_custkey").as("emp_id"))
        .agg(count(lit(1)).as("f_orders"))
      avail.join(availed, "emp_id")
        .withColumn("pct",
          round(col("f_orders") / col("total_orders") * 100, 2))
        .filter(col("pct") > 50)
    }),

    // ---- W1: dedup-keep-latest per key (reference
    // clean_load_3_ld_staging.py:54-63); total order via (ts_us, event_id)
    "q05_dedup_keep_latest" -> ((s, d) => {
      val ev = Tables.events(s, d)
      Dedup.keepFirst(ev, Seq("user_id", "event_type"),
          Seq(col("ts_us").desc, col("event_id").desc))
        .select("user_id", "event_type", "event_id", "ts_us", "value", "props")
    }),

    // ---- W2: keep top-1 row per group by preference column (reference
    // clean_load_2_tf_staging.py:78-84 max-salary open row)
    "q06_top1_per_group" -> ((s, d) => {
      Dedup.keepFirst(Tables.customer(s, d), Seq("c_nationkey"),
          Seq(col("c_acctbal").desc, col("c_custkey").asc))
        .select("c_nationkey", "c_custkey", "c_acctbal")
    }),

    // ---- J2/J4/U2/P7/P10/P11: SCD2 close-out merge (reference
    // merge2_tf_dim_staging.py:32-48). Dim = first 'F'-order per customer
    // (open rows); staging = first 'O'-order per customer.
    "q07_scd2_closeout" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val dim = o.filter(col("o_orderstatus") === "F")
        .groupBy(col("o_custkey").as("emp_id"))
        .agg(min(to_date(col("o_orderdate"))).as("start_date"))
        .withColumn("end_date", lit(null).cast("date"))
        .withColumn("status", lit("Active"))
      val staging = o.filter(col("o_orderstatus") === "O")
        .groupBy(col("o_custkey").as("emp_id"))
        .agg(min(to_date(col("o_orderdate"))).as("start_date"))
      Scd2.closeOutMerge(dim, staging, "emp_id", "start_date", "end_date",
        "status")
    }),

    // ---- J4: keyed upsert = staging wins, dim survives unmatched
    // (reference daily_dag.py:200-209 MERGE INTO)
    "q08_upsert" -> ((s, d) => {
      val dim = Tables.customer(s, d)
        .select(col("c_custkey").as("emp_id"), col("c_acctbal").as("val"))
      val staging = Tables.orders(s, d)
        .filter(col("o_orderstatus") === "O")
        .groupBy(col("o_custkey").as("emp_id"))
        .agg(round(sum(col("o_totalprice")), 2).as("val"))
      Merge.upsert(dim, staging, Seq("emp_id"))
    }),

    // ---- J3: left-anti join (distributed rewrite of the reference's
    // collect()+isin at Task_4_80perc.py:59,65)
    "q09_anti_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "P")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // ---- left-semi join (EXISTS)
    "q10_semi_join" -> ((s, d) => {
      val su = Tables.supplier(s, d)
      val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      su.join(li, su("s_suppkey") === li("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    }),

    // ---- set intersection (completes the set-op family)
    "q46_intersect" -> ((s, d) => {
      val buyers = Tables.orders(s, d).select(col("o_custkey").as("id"))
      val flagged = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("id"))
      buyers.intersect(flagged)
    }),

    // ---- U1: exceptAll multiset difference (reference
    // clean_load_2_tf_staging.py:84)
    "q11_except_all" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_returnflag")
      li.exceptAll(li.filter(col("l_returnflag") === "A"))
    }),

    // ---- U2: union (by name; reference merge2_tf_dim_staging.py:48)
    "q12_union_parties" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_custkey").as("id"),
        col("c_name").as("name"), lit("customer").as("kind"))
      val su = Tables.supplier(s, d).select(col("s_suppkey").as("id"),
        col("s_name").as("name"), lit("supplier").as("kind"))
      c.unionByName(su)
    }),

    // ---- F5/F7/P8/P9: working-day calendar with holiday anti-join
    // (reference Task_4_80perc.py:44-84, kept fully distributed)
    "q13_working_days" -> ((s, d) => {
      val holidays = Tables.events(s, d)
        .filter(col("event_type") === "error")
        .select(to_date(col("ts")).as("hd")).distinct()
      val days = Calendar.dateRange(s, "2024-01-01", "2024-12-31")
      Calendar.workingDays(days, holidays, "hd")
        .groupBy(month(col("d")).as("mth"))
        .agg(count(lit(1)).as("working_days"))
    }),

    // ---- F6: scalar subquery kept in-plan (reference Task_4_80perc.py:78
    // does a spark.sql+collect round-trip; here a 1-row broadcast cross
    // join)
    "q14_scalar_subquery" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val maxd = o.agg(max(to_date(col("o_orderdate"))).as("max_d"))
      o.crossJoin(broadcast(maxd))
        .select(col("o_orderkey"),
          datediff(col("max_d"), to_date(col("o_orderdate")))
            .as("days_to_end"))
    }),

    // ---- P10/P11: CASE WHEN + COALESCE over a left join (reference
    // clean_load_2_tf_staging.py:76, merge2_tf_dim_staging.py:43-44)
    "q15_case_coalesce" -> ((s, d) => {
      val cnt = Tables.orders(s, d)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      val c = Tables.customer(s, d)
      c.join(cnt, c("c_custkey") === cnt("o_custkey"), "left_outer")
        .select(col("c_custkey"),
          when(col("cnt").isNull, lit("Inactive")).otherwise(lit("Active"))
            .as("status"),
          coalesce(col("cnt"), lit(0L)).as("order_cnt"))
    }),

    // ---- F1-F5: date-part extraction family
    "q16_date_parts" -> ((s, d) => {
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(to_date(col("o_orderdate"))).as("yr"),
        month(to_date(col("o_orderdate"))).as("mth"),
        weekday(to_date(col("o_orderdate"))).as("dow"))
    }),

    // ---- A7: distinct over key columns
    "q17_distinct_pairs" -> ((s, d) => {
      Tables.lineitem(s, d).select("l_returnflag", "l_linestatus").distinct()
    }),

    // ---- F3/F10: epoch-seconds -> timestamp round-trip (reference
    // clean_load_2_tf_staging.py:73-74 from_unixtime parse) + typed null
    "q19_epoch_parse" -> ((s, d) => {
      Tables.events(s, d).select(
        col("event_id"),
        expr("ts_us div 1000000").as("ts_s"),
        unix_micros(timestamp_seconds(expr("ts_us div 1000000")))
          .as("parsed_us"),
        lit(null).cast("date").as("cooldown_start_date"))
    }),

    // ---- hierarchical totals: ROLLUP over (returnflag, linestatus)
    // (beyond the reference's surface; standard warehouse capability)
    "q39_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("cnt"))
    }),

    // ---- analytic window frames: running total + lag per user ordered
    // by event time (beyond the reference's row_number-only usage)
    "q40_running_window" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts_us"), col("value"),
          // rounded: windowed sums are pairwise/segment-tree in some
          // engines (DuckDB), so raw prefix doubles are not order-stable
          round(sum(col("value")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("running_value"),
          lag(col("event_id"), 1).over(w).as("prev_event_id"))
    }),

    // ---- heap-based top-k per group via a custom typed Aggregator
    // (same semantics as q18's window form, but O(n log k) with bounded
    // k-row partial aggregation instead of a full per-group sort — the
    // at-scale formulation; identical oracle)
    "q47_topk_agg" -> ((s, d) => {
      val topk = udaf(new graft.operators.TopKAgg(3))
      Tables.orders(s, d)
        .select(col("o_orderpriority"),
          col("o_totalprice").as("score"), col("o_orderkey").as("id"))
        .groupBy(col("o_orderpriority"))
        .agg(topk(col("score"), col("id")).as("tops"))
        .select(col("o_orderpriority"), posexplode(col("tops")))
        .select(col("o_orderpriority"),
          (col("pos") + 1).cast("int").as("rn"),
          col("col.id").as("o_orderkey"),
          col("col.score").as("o_totalprice"))
    }),

    // ---- gap-based sessionization: new session when >30 min idle;
    // pure window math over exact integers (classic clickstream op)
    "q41_sessionize" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      val gapUs = 30L * 60 * 1000000
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts_us"))
        .withColumn("new_sess",
          when(col("ts_us") - lag(col("ts_us"), 1).over(w) > gapUs, 1)
            .otherwise(lit(0)))
        .withColumn("session_id",
          sum(col("new_sess")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_us")).as("start_us"),
          max(col("ts_us")).as("end_us"))
    }),

    // ---- exact distinct cardinality per group (the HLL approx variant
    // is asserted within 5% of this in AsOfSpec — sketches don't
    // hash-match across engines)
    "q42_distinct_users" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
    }),

    // ---- as-of join: each purchase matched to the user's most recent
    // signup at-or-before it (AsOf.join: union+window, no pair blow-up;
    // oracle deliberately uses the naive range-join formulation)
    "q43_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts_us", "event_id")
      val signups = ev.filter(col("event_type") === "signup")
        .select("user_id", "ts_us", "event_id")
      graft.operators.AsOf.join(purchases, signups, "user_id", "ts_us",
          "event_id", "event_id")
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("asof_event_id"))
    }),

    // ---- batch twin of the STREAMING as-of enrichment
    // (graft.streaming.AsOfEnrich): each purchase carries the VALUE of
    // the latest prior click by the same user — the "current dim
    // version at event time" lookup, with a payload column instead of
    // an id. AsOfEnrich's flatMapGroupsWithState path is asserted
    // equal to this operator in StreamingOpsSpec; this row gives the
    // semantics a DuckDB oracle. value is emitted raw (no arithmetic),
    // so the double survives the hash gate.
    "q98_asof_value" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts_us", "event_id")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"), col("event_id"),
          col("value"))
      graft.operators.AsOf.join(purchases, clicks, "user_id", "ts_us",
          "value", "event_id")
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("asof_value"))
    }),

    // ---- non-equi range join: quantity binned against an interval
    // table (tiny side broadcast -> nested-loop; the at-scale shape for
    // band/bin joins)
    "q44_range_join" -> ((s, d) => {
      import s.implicits._
      val bins = Seq((0.0, 10.0, "small"), (10.0, 25.0, "mid"),
        (25.0, 1000.0, "big")).toDF("lo", "hi", "label")
      val li = Tables.lineitem(s, d)
      li.join(broadcast(bins),
          li("l_quantity") >= col("lo") && li("l_quantity") < col("hi"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity")).as("sum_qty"))
    }),

    // ---- semi-structured data: JSON field extraction from events.props
    "q45_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("cnt"))
    }),

    // ---- O1 + window rank: top-3 per group with explicit rank column
    // ---- STAR-SCHEMA multi-hop join (the TPC-H Q5 shape): revenue per
    // nation for orders in one region + one year, where the supplier
    // sits in the customer's nation — lineitem ⋈ orders ⋈ customer ⋈
    // supplier ⋈ nation ⋈ region, the canonical OLAP join chain the
    // relational corner otherwise never exercises (region/nation were
    // load-only until this query). Scale: region⋈nation (≤25 rows) is
    // an explicit broadcast into customer; date + region filters push
    // into the orders/region scans BEFORE the fact joins; the three
    // fact joins (orderkey, custkey, suppkey) are plain equi-shuffles
    // AQE is free to re-plan (supplier broadcasts itself at small SF).
    // Revenue is EXACT integer arithmetic: cents × (100−discount%) in
    // BIGINT per row, summed in DECIMAL(38,0) (overflow-safe at any
    // corpus), emitted as its double image (the q131 idiom — DuckDB's
    // compare narrows DECIMAL to float64, so the decimal itself must
    // not be the output column).
    "q150_star_revenue" -> ((s, d) => {
      val nr = Tables.nation(s, d)
        .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cust = Tables.customer(s, d)
        .join(broadcast(nr), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01")
          && col("o_orderdate") < lit("1997-01-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      val supp = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          (expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
            * (lit(100L)
              - expr("CAST(round(l_discount * 100) AS BIGINT)")))
            .as("rev"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .filter(col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("rev").cast("decimal(38,0)")).cast("double")
            .as("revenue"))
    }),

    // ---- TPC-H Q6 shape (forecasting revenue change): the canonical
    // pushdown showcase — three range predicates (ship year, discount
    // band, quantity cap) that must ALL reach the parquet scan, one
    // projection, one global aggregate; the plan is a filtered scan
    // and nothing else. Revenue = Σ extendedprice·discount in the
    // exact cents×cents integer idiom (q150): BIGINT per row, summed
    // in DECIMAL(38,0), emitted as the double image. Discount band
    // compared on cents (5..7) so the predicate is integral, not an
    // IEEE range on 0.05/0.07 — both engines agree bit-for-bit.
    "q222_tpch_q6" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01")
          && col("l_shipdate") < lit("1997-01-01")
          && col("l_quantity") < 24)
        .select(
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("pc"),
          expr("CAST(round(l_discount * 100) AS BIGINT)").as("dc"))
        .filter(col("dc").between(5, 7))
        .agg(count(lit(1)).as("n_rows"),
          sum((col("pc") * col("dc")).cast("decimal(38,0)"))
            .cast("double").as("revenue_x10000"))
    }),

    "q18_topk_per_group" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
    }),

    // ---- TPC-H Q3 shape (shipping priority): segment-filtered
    // customers × date-bracketed orders × post-pivot lineitems,
    // revenue-ranked top-10 order keys. Both date filters push to the
    // scans; the customer leg reduces before joining; revenue uses the
    // q150 exact-cents idiom (BIGINT cents × (100−disc) summed in
    // DECIMAL(38,0), emitted double) so the aggregate is order-free.
    "q176_tpch_q3" -> ((s, d) => {
      val cust = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1997-01-01"))
        .select(col("o_orderkey"), col("o_custkey"),
          to_date(col("o_orderdate")).as("o_date"),
          col("o_orderpriority"))
      Tables.lineitem(s, d)
        .filter(to_date(col("l_shipdate")) > lit("1997-01-01").cast("date"))
        .select(col("l_orderkey"),
          (expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
            * (lit(100L)
              - expr("CAST(round(l_discount * 100) AS BIGINT)")))
            .as("rev"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_date"), col("o_orderpriority"))
        .agg(sum(col("rev").cast("decimal(38,0)")).cast("double")
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // ---- TPC-H Q10 shape (returned-item reporting): customers ranked
    // by revenue lost to returns in one order quarter — lineitem
    // filtered to returnflag R, orders bracketed to 1996-Q4, nation
    // name broadcast in; top-20 by exact-cents revenue.
    "q177_tpch_q10" -> ((s, d) => {
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-10-01")
          && col("o_orderdate") < lit("1997-01-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      val cust = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
      Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          (expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
            * (lit(100L)
              - expr("CAST(round(l_discount * 100) AS BIGINT)")))
            .as("rev"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
        .agg(sum(col("rev").cast("decimal(38,0)")).cast("double")
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // ---- TPC-H Q18 shape (large-volume orders): the
    // having-on-an-aggregated-subquery pattern — orders whose total
    // line quantity exceeds 250, joined back to customer and lineitem
    // detail. The qualifying-keys leg is a semi-join input built from
    // the same lineitem scan's aggregate; quantities stay exact
    // (doubles holding integers ≤ 50, summed exactly).
    "q178_tpch_q18" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"))
      val big = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 250)
      Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("o_date"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    }),

    // ---- TPC-H Q2 shape (min-cost supplier), reshaped onto lineitem
    // because this corpus carries no partsupp: a (part, supplier)'s
    // "supply cost" is the cheapest per-unit price either ever traded
    // (unit cents = price cents div quantity — both integral and
    // positive, so Spark's truncating div and DuckDB's flooring //
    // agree). For STANDARD parts of size ≤ 5, report each part's
    // cheapest EUROPE supplier(s), best-balance first. The shape Q2
    // exists to exercise: a per-group min computed once and re-joined
    // by equality (never a re-run correlated subquery), region/nation
    // dims broadcast, and the fact table aggregated to (part, supp)
    // grain BEFORE any wide join — at 100 TB the only big exchange is
    // the one offer aggregation.
    "q234_min_cost_supplier" -> ((s, d) => {
      val eurSupp = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "EUROPE")
            .select(col("r_regionkey"))),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          col("n_name"))
      val parts = Tables.part(s, d)
        .filter(col("p_type") === "STANDARD" && col("p_size") <= 5)
        .select(col("p_partkey"), col("p_size"))
      // r13 (guide §3.2, pre-filter the big side): the part filter
      // (STANDARD, size ≤ 5) and the EUROPE supplier leg are both
      // selective and both broadcast-sized, so semi-join them into the
      // fact scan BEFORE the (part, supp) aggregation — the one big
      // exchange now carries only qualifying offers. Equivalent by
      // construction: the dropped groups were dropped by the same
      // inner joins right after the aggregation.
      val offers = Tables.lineitem(s, d)
        .join(broadcast(parts.select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .join(broadcast(eurSupp.select(col("s_suppkey"))),
          col("l_suppkey") === col("s_suppkey"), "left_semi")
        .select(col("l_partkey"), col("l_suppkey"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT) " +
            "div CAST(l_quantity AS BIGINT)").as("ucents"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("ucents")).as("cost_cents"))
      val eurOffers = offers
        .join(eurSupp, col("l_suppkey") === col("s_suppkey"))
        .join(parts, col("l_partkey") === col("p_partkey"))
      val minCost = eurOffers.groupBy(col("p_partkey"))
        .agg(min(col("cost_cents")).as("min_cost"))
      eurOffers
        .join(minCost, Seq("p_partkey"))
        .filter(col("cost_cents") === col("min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_size"), col("cost_cents"))
        .orderBy(col("s_acctbal").desc, col("p_partkey").asc,
          col("s_name").asc)
        .limit(100)
    }),

    // ---- TPC-H Q11 shape (value concentration): which parts carry an
    // outsized share of the traded value flowing through ASIA-based
    // suppliers? Per-part value = Σ exact price cents (DECIMAL(38,0) —
    // order-free at any scale), kept iff value exceeds 1/1000 of the
    // ASIA total. The planner shape: one fact aggregation, a 1-row
    // global aggregate of THAT result broadcast back as the HAVING
    // threshold — the second pass costs part-cardinality rows, never a
    // second fact scan. share_ppm is an exact integer div on both
    // engines (DECIMAL here, HUGEINT there).
    "q235_value_concentration" -> ((s, d) => {
      val asiaSupp = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "ASIA")
            .select(col("r_regionkey"))),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val vals = Tables.lineitem(s, d)
        .join(asiaSupp, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
          .cast("decimal(38,0)")).as("value_c"))
      val tot = vals.agg(sum(col("value_c")).as("total_c"))
      vals.crossJoin(broadcast(tot))
        .filter(col("value_c") * 1000 > col("total_c"))
        .select(col("l_partkey").as("p_partkey"),
          col("value_c").cast("double").as("value_cents"),
          expr("CAST((value_c * 1000000) div total_c AS BIGINT)")
            .as("share_ppm"))
        .orderBy(col("value_cents").desc, col("p_partkey").asc)
    }),

    // ---- TPC-H Q20 shape (excess-stock suppliers): suppliers who
    // moved MORE THAN HALF of a part's 1996 volume — the concentration
    // audit a sourcing desk runs before renegotiating. Both aggregates
    // derive from one shipdate-pruned scan: (part, supp) quantity
    // rolls up first, the per-part total reuses that result (a second
    // aggregation over (part, supp)-grain rows, not a second scan),
    // and the half-share test is exact integer 2·q_sp > q_p. Supplier
    // and nation dims broadcast onto the per-supplier fold.
    "q236_excess_stock" -> ((s, d) => {
      val sp = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01")
          && col("l_shipdate") < lit("1997-01-01"))
        .select(col("l_partkey"), col("l_suppkey"),
          col("l_quantity").cast("bigint").as("q"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("q")).as("sp_qty"))
      val pt = sp.groupBy(col("l_partkey"))
        .agg(sum(col("sp_qty")).as("part_qty"))
      val supp = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
      sp.join(pt, Seq("l_partkey"))
        .filter(col("sp_qty") * 2 > col("part_qty"))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_excess_parts"),
          sum(col("sp_qty")).as("qty_held"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"),
          col("n_excess_parts"), col("qty_held"))
    }),

    // ---- TPC-H Q17 shape (small-quantity revenue): total revenue of
    // Brand#12 lineitems whose quantity is below HALF the part's own
    // average — the correlated-subquery showcase. Decorrelated the
    // only way that scales: the per-part (n, Σq) aggregate is computed
    // ONCE from the brand-pruned scan and re-joined by part key (never
    // a per-row re-scan), the brand filter reaches the fact scan as a
    // broadcast semi-join BEFORE the aggregate, and the half-average
    // test is exact integer cross-multiplication 2·q·n < Σq (no
    // division, no float). Revenue in exact cents, summed in
    // DECIMAL(38,0).
    "q242_small_qty_revenue" -> ((s, d) => {
      val pk = Tables.part(s, d)
        .filter(col("p_brand") === "Brand#12")
        .select(col("p_partkey"))
      val li = Tables.lineitem(s, d)
        .join(broadcast(pk), col("l_partkey") === col("p_partkey"),
          "left_semi")
        .select(col("l_partkey"),
          col("l_quantity").cast("bigint").as("q"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
            .as("cents"))
      val pa = li.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_li"), sum(col("q")).as("sum_q"))
      li.join(pa, Seq("l_partkey"))
        .filter(col("q") * 2 * col("n_li") < col("sum_q"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_small_lines"),
          sum(col("cents").cast("decimal(38,0)")).as("revenue_cents"))
        .select(col("n_parts"), col("n_small_lines"),
          col("revenue_cents").cast("double").as("revenue_cents"))
    }),

    // ---- TPC-H Q21 shape (lone failing supplier): suppliers who were
    // the ONLY supplier with a returned line in a multi-supplier order
    // — the exists + not-exists double-correlation showcase (the
    // reference corpus has no receipt/commit dates, so "failed" is
    // l_returnflag = 'R'). Decorrelated to ONE scan: lineitem rolls up
    // to (order, supplier, has_return) grain, the order-grain census
    // (distinct suppliers, suppliers-with-return) re-aggregates THAT
    // frame — same shuffle key, so the second aggregate and the
    // back-join are exchange-free behind the first — and both EXISTS
    // legs become integer predicates (n_supp ≥ 2, n_ret = 1) on the
    // census row. Supplier/nation dims broadcast onto the final
    // supplier-grain fold.
    "q243_lone_failed_supplier" -> ((s, d) => {
      val os = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("has_r"))
      val ord = os.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"), sum(col("has_r")).as("n_ret"))
      val supp = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
      os.join(ord, Seq("l_orderkey"))
        .filter(col("has_r") === 1 && col("n_supp") >= 2
          && col("n_ret") === 1)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_lone_fault"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"),
          col("n_lone_fault"))
        .orderBy(col("n_lone_fault").desc, col("s_suppkey").asc)
        .limit(100)
    }),

    // ---- TPC-H Q13 shape (order-count distribution): how many
    // customers placed 0, 1, 2, … orders — the left-join-then-
    // two-level-aggregate planner shape, and the zero-preserving
    // histogram every engagement report needs. Scale discipline: the
    // FACT side aggregates to customer grain FIRST (orders-per-custkey,
    // map-combined), so the left join is dim × already-small — never
    // raw orders rows through a join; zero-order customers survive via
    // coalesce, and the final histogram is order-count-cardinality
    // rows.
    "q244_order_count_distribution" -> ((s, d) => {
      val oc = Tables.orders(s, d)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      Tables.customer(s, d).select(col("c_custkey"))
        .join(oc, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(coalesce(col("n"), lit(0L)).as("n_orders"))
        .groupBy(col("n_orders"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("n_customers").desc, col("n_orders").desc)
    }),

    // ---- TPC-H Q8 shape (market share): within the ASIA customers'
    // market, each supplier NATION's share of yearly revenue — the
    // two-level share report (group revenue ÷ broadcast-back yearly
    // total). Plan shape: customer prunes to the region and broadcasts
    // onto orders (the market filter reaches the fact join as a
    // broadcast semi-join), the one big exchange is lineitem ⋈ pruned
    // orders on orderkey, supplier/nation broadcast onto the fold, and
    // the yearly totals re-join the year-grain aggregate (never a
    // second fact pass). Revenue exact cents in DECIMAL(38,0);
    // share_ppm an exact integral div.
    "q245_market_share" -> ((s, d) => {
      val asiaNat = broadcast(Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)
          .filter(col("r_name") === "ASIA").select(col("r_regionkey"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey")))
      val asiaCust = Tables.customer(s, d)
        .join(asiaNat, col("c_nationkey") === col("n_nationkey"),
          "left_semi")
        .select(col("c_custkey"))
      val ord = Tables.orders(s, d)
        .join(broadcast(asiaCust),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("bigint").as("yr"))
      val suppNat = broadcast(Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name")))
      val rev = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
            .as("cents"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(suppNat, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("yr"), col("n_name"))
        .agg(sum(col("cents").cast("decimal(38,0)")).as("rev_c"))
      val tot = rev.groupBy(col("yr"))
        .agg(sum(col("rev_c")).as("tot_c"))
      rev.join(broadcast(tot), Seq("yr"))
        .select(col("yr"), col("n_name"),
          col("rev_c").cast("double").as("revenue_cents"),
          expr("rev_c * 1000000 div tot_c").as("share_ppm"))
        .orderBy(col("yr").asc, col("n_name").asc)
    }),

    // ---- TPC-H Q22 shape (idle rich customers): per market segment,
    // customers with an above-average positive balance and NO ORDER
    // since 2001-01-01 — the scalar-threshold + anti-join combination,
    // read as churn risk (in this corpus every customer has ordered at
    // least once, so Q22's literal never-ordered leg is vacuous; the
    // recency cutoff keeps the planner shape AND a non-empty answer).
    // The average enters as an exact CROSS-MULTIPLICATION (cents·n >
    // Σcents — no float mean is ever materialized, so the engines
    // cannot disagree on boundary rows, the q242 discipline), the
    // threshold is a 1-row broadcast, the recency predicate reaches
    // the orders scan (PushedFilters), and the no-recent-orders test
    // is an anti-join against the distinct recent-buyer key set —
    // never raw orders rows.
    "q246_idle_rich_customers" -> ((s, d) => {
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_c"))
      val thr = cust.filter(col("bal_c") > 0)
        .agg(sum(col("bal_c").cast("decimal(38,0)")).as("sum_c"),
          count(lit(1)).as("n_pos"))
      val buyers = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("2001-01-01"))
        .select(col("o_custkey")).distinct()
      cust.crossJoin(broadcast(thr))
        .filter(col("bal_c").cast("decimal(38,0)") * col("n_pos")
          > col("sum_c"))
        .join(buyers, col("c_custkey") === col("o_custkey"),
          "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("bal_c")).as("total_bal_cents"))
        .orderBy(col("c_mktsegment").asc)
    }),

    // ---- TPC-H Q15 shape (top supplier, ties preserved): the
    // supplier(s) with the maximum 1996-H1 revenue — the create-view +
    // scalar-max showcase. The per-supplier aggregate is computed ONCE
    // from the shipdate-pruned scan; the 1-row global max re-joins it
    // by EQUALITY (never a rank window over the whole supplier set,
    // never a second scan), so ties all surface — Q15's explicit
    // contract. Revenue in exact cents DECIMAL(38,0); supplier dim
    // broadcast onto the (usually 1-row) winners.
    "q247_top_supplier" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01")
          && col("l_shipdate") < lit("1996-07-01"))
        .select(col("l_suppkey"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
            .as("cents"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("cents").cast("decimal(38,0)")).as("rev_c"))
      val mx = rev.agg(max(col("rev_c")).as("max_c"))
      rev.crossJoin(broadcast(mx))
        .filter(col("rev_c") === col("max_c"))
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("rev_c").cast("double").as("revenue_cents"))
        .orderBy(col("s_suppkey").asc)
    }),

    // ---- supplier-market concentration (Herfindahl–Hirschman index)
    // per part type: HHI = Σ share² over each type's supplier revenue
    // shares — the market-structure read behind q235's concentration
    // gate (HHI > 0.25 ⇒ "highly concentrated" under the usual DOJ
    // banding, here in exact ppm). Exactness: hhi_ppm = Σ rev_i² · 10⁶
    // div tot² entirely in DECIMAL(38,0) — squaring BEFORE the division
    // so no floored share ever compounds (rev² ≤ 10²⁶ at sf1-scale
    // cents, Σ·10⁶ well under the 38-digit ceiling). Plan: part type
    // broadcast onto the fact scan, ONE (type, supplier) aggregate,
    // a type-grain re-aggregate for the totals, one fold — the q235
    // two-pass shape with the second pass at group grain.
    "q248_market_concentration" -> ((s, d) => {
      val ty = broadcast(Tables.part(s, d)
        .select(col("p_partkey"), col("p_type")))
      val rev = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
            .as("cents"))
        .join(ty, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_type"), col("l_suppkey"))
        .agg(sum(col("cents").cast("decimal(38,0)")).as("rev_c"))
      rev.groupBy(col("p_type"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(col("rev_c")).as("tot_c"),
          sum(expr("CAST(rev_c * rev_c AS DECIMAL(38,0))")).as("sq_c"))
        .select(col("p_type"), col("n_suppliers"),
          col("tot_c").cast("double").as("total_cents"),
          expr("sq_c * 1000000 div CAST(tot_c * tot_c AS DECIMAL(38,0))")
            .as("hhi_ppm"),
          expr("sq_c * 4 > CAST(tot_c * tot_c AS DECIMAL(38,0))")
            .as("concentrated"))
        .orderBy(col("p_type").asc)
    }),

    // ---- TPC-H Q4 shape (order-priority checking): 1996-Q1 orders
    // per priority having AT LEAST ONE late-shipped line (shipped
    // > 30 days after the order date — this corpus has no
    // commitdate/receiptdate, so lateness is vs o_orderdate; the
    // planner shape Q4 exists for is intact: a correlated EXISTS
    // decorrelated into a distinct-key LEFT SEMI join). The date
    // bracket pushes to the orders scan; the lineitem side joins only
    // the quarter's orders (the EXISTS is evaluated on the REDUCED
    // order set, never all of lineitem × orders); the late test is an
    // integer day difference — midnight-aligned timestamps on both
    // engines, no tz arithmetic.
    "q249_order_priority_check" -> ((s, d) => {
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01")
          && col("o_orderdate") < lit("1996-04-01"))
        .select(col("o_orderkey"), col("o_orderpriority"),
          to_date(col("o_orderdate")).as("o_date"))
      val late = Tables.lineitem(s, d)
        .select(col("l_orderkey"), to_date(col("l_shipdate")).as("s_date"))
        .join(ord.select(col("o_orderkey"), col("o_date")),
          col("l_orderkey") === col("o_orderkey"))
        .filter(datediff(col("s_date"), col("o_date")) > 30)
        .select(col("l_orderkey")).distinct()
      ord.join(late, col("o_orderkey") === col("l_orderkey"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority").asc)
    }),

    // ---- TPC-H Q7 shape (volume shipping between trading partners):
    // revenue flowing EUROPE-supplier-nation → ASIA-customer-nation at
    // (supp_nation, cust_nation, ship-year) grain. (Q7's literal
    // two-NATION pair is empty at smoke scale — ~10 suppliers across
    // 25 nations — so the selective legs filter by REGION, the same
    // dims q234/q245 already pin; the regions are disjoint, so Q7's
    // supp≠cust inequality is structural.) The shape's point survives
    // intact: BOTH dimension legs reduce BEFORE the fact join
    // (supplier side broadcast — always dim-sized; customer side
    // shuffle-joined through orders — at 100 TB a 5-of-25-nations
    // customer set is still fact-sized, so it must NOT broadcast), and
    // the fact aggregates once at pair×year grain. Exact cents in
    // DECIMAL(38,0).
    "q250_volume_shipping" -> ((s, d) => {
      def natOf(region: String) = broadcast(Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)
          .filter(col("r_name") === region).select(col("r_regionkey"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name")))
      val supp = broadcast(Tables.supplier(s, d)
        .join(natOf("EUROPE"), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation")))
      val cust = Tables.customer(s, d)
        .join(natOf("ASIA"), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val ord = Tables.orders(s, d)
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("cust_nation"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("bigint").as("yr"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
            .as("cents"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("yr"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("cents").cast("decimal(38,0)")).cast("double")
            .as("revenue_cents"))
        .orderBy(col("supp_nation").asc, col("cust_nation").asc,
          col("yr").asc)
    }),

    // ---- TPC-H Q9 shape (product-type profit): per supplier nation
    // and ship year, the margin ECONOMY parts earned over each part's
    // corpus-min unit price (no partsupp table here, so "supply cost"
    // is the q234 convention: cheapest traded unit cents). The Q9
    // machinery is intact: a part-filtered fact scan, a per-part
    // aggregate re-joined by EQUALITY (the decorrelated correlated
    // subquery — computed once, never per-row), dims broadcast, and
    // the profit fold grouped by (nation, year). Unit cents and
    // margins are exact integers; negative margins are real (a row
    // cheaper than the min means THIS row set the min → margin 0 on
    // itself, positive elsewhere).
    "q251_product_type_profit" -> ((s, d) => {
      val eco = Tables.part(s, d)
        .filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
      val li = Tables.lineitem(s, d)
        .join(broadcast(eco), col("l_partkey") === col("p_partkey"),
          "left_semi")
        .select(col("l_partkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("bigint").as("yr"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
            .as("pc"),
          col("l_quantity").cast("bigint").as("q"))
        .withColumn("uc", expr("pc div q"))
      val minU = li.groupBy(col("l_partkey"))
        .agg(min(col("uc")).as("min_uc"))
      val suppNat = broadcast(Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name")))
      li.join(minU, Seq("l_partkey"))
        .join(suppNat, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("n_name"), col("yr"))
        .agg(count(lit(1)).as("n_lines"),
          sum((col("pc") - col("min_uc") * col("q"))
            .cast("decimal(38,0)")).cast("double").as("margin_cents"))
        .orderBy(col("n_name").asc, col("yr").asc)
    }),

    // ---- TPC-H Q12 shape (shipping-delay vs priority): the
    // big-fact ⋈ big-fact join with a CASE-split aggregate — per ship-
    // delay bucket (≤30 fast / ≤90 medium / else slow; this corpus has
    // no shipmode column, delay plays its role), how many lines belong
    // to critical-priority orders (1-URGENT/2-HIGH) vs not, for lines
    // shipped in 1996. The year filter pushes to the lineitem scan
    // BEFORE the orderkey shuffle; the CASE arithmetic is integer day
    // differences on midnight-aligned timestamps.
    "q252_delay_priority" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01")
          && col("l_shipdate") < lit("1997-01-01"))
        .select(col("l_orderkey"), to_date(col("l_shipdate")).as("s_date"))
      li.join(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority"),
            to_date(col("o_orderdate")).as("o_date")),
          col("l_orderkey") === col("o_orderkey"))
        .select(
          when(datediff(col("s_date"), col("o_date")) <= 30, "fast")
            .when(datediff(col("s_date"), col("o_date")) <= 90, "medium")
            .otherwise("slow").as("delay_bucket"),
          col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            .as("critical"))
        .groupBy(col("delay_bucket"))
        .agg(sum(when(col("critical"), 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(col("critical"), 0L).otherwise(1L))
            .as("low_line_count"))
        .orderBy(col("delay_bucket").asc)
    }),

    // ---- TPC-H Q14 shape (promotion-revenue share): what fraction of
    // March-1996 traded value was PROMO parts? One month-pruned fact
    // scan joined to a broadcast (partkey → is_promo) projection, one
    // fold, share as exact integer ppm (DECIMAL sums, integral div) —
    // the conditional-aggregate-over-one-join shape Q14 exists for,
    // with no float division entering the verdict.
    "q253_promo_revenue" -> ((s, d) => {
      val promo = broadcast(Tables.part(s, d)
        .select(col("p_partkey"), (col("p_type") === "PROMO")
          .as("is_promo")))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-03-01")
          && col("l_shipdate") < lit("1996-04-01"))
        .select(col("l_partkey"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
            .as("cents"))
        .join(promo, col("l_partkey") === col("p_partkey"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("is_promo"), col("cents")).otherwise(0L)
            .cast("decimal(38,0)")).as("promo_c"),
          sum(col("cents").cast("decimal(38,0)")).as("tot_c"))
        .select(col("n_lines"),
          col("promo_c").cast("double").as("promo_cents"),
          col("tot_c").cast("double").as("total_cents"),
          expr("promo_c * 1000000 div tot_c").as("promo_ppm"))
    }),

    // ---- TPC-H Q16 shape (supplier-relationship census): per
    // (brand, size), how many DISTINCT suppliers ever traded the part —
    // excluding one brand and excluding "complained-about" suppliers
    // (no s_comment column here; negative account balance is the
    // exclusion list, same NOT-IN-subquery planner shape: a broadcast
    // ANTI join against a key set, never a per-row probe). The fact
    // reduces to DISTINCT (part, supp) pairs FIRST — the count-distinct
    // then runs on pair-grain rows, not raw lineitems.
    "q254_supplier_census" -> ((s, d) => {
      val pairs = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val badSupp = broadcast(Tables.supplier(s, d)
        .filter(col("s_acctbal") < 0).select(col("s_suppkey")))
      val pt = broadcast(Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#21")
        .select(col("p_partkey"), col("p_brand"), col("p_size")))
      pairs
        .join(badSupp, col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .join(pt, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
          col("p_size").asc)
        .limit(40)
    }),

    // ---- TPC-H Q19 shape (discounted revenue, OR-of-ANDs): three
    // brand × quantity-band × size-band disjuncts — the predicate
    // Catalyst must push as a single OR filter below the join where
    // possible (quantity bands prune the fact scan; brand/size prune
    // the broadcast part projection; the OR across pairs evaluates on
    // the joined row). Revenue is the q176 exact idiom: cents ×
    // (100 − disc) summed in DECIMAL(38,0), emitted double (×10⁴
    // fixed-point units).
    "q255_discounted_revenue" -> ((s, d) => {
      val pt = broadcast(Tables.part(s, d)
        .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#25"))
        .select(col("p_partkey"), col("p_brand"), col("p_size")))
      Tables.lineitem(s, d)
        .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
        .select(col("l_partkey"),
          col("l_quantity").cast("bigint").as("q"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("pc"),
          expr("CAST(round(l_discount * 100) AS BIGINT)").as("dc"))
        .join(pt, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("q").between(1, 11)
            && col("p_size").between(1, 5)) ||
          (col("p_brand") === "Brand#23" && col("q").between(10, 20)
            && col("p_size").between(1, 10)) ||
          (col("p_brand") === "Brand#25" && col("q").between(20, 30)
            && col("p_size").between(1, 15)))
        .agg(count(lit(1)).as("n_lines"),
          sum((col("pc") * (lit(100) - col("dc")))
            .cast("decimal(38,0)")).cast("double")
            .as("revenue_x10000"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q176_tpch_q3" ->
      """SELECT l.l_orderkey,
        |  CAST(o.o_orderdate AS DATE) AS o_date, o.o_orderpriority,
        |  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
        |    AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |  AND CAST(l.l_shipdate AS DATE) > DATE '1997-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l.l_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q177_tpch_q10" ->
      """SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
        |  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
        |    AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE l.l_returnflag = 'R'
        |  AND o.o_orderdate >= TIMESTAMP '1996-10-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c.c_custkey ASC
        |LIMIT 20""".stripMargin,

    "q178_tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250)
        |SELECT c.c_custkey, c.c_name, o.o_orderkey,
        |  CAST(o.o_orderdate AS DATE) AS o_date, o.o_totalprice,
        |  b.sum_qty
        |FROM orders o
        |JOIN big b ON o.o_orderkey = b.l_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
        |LIMIT 100""".stripMargin,

    "q150_star_revenue" ->
      """SELECT n.n_name,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
        |    AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND s.s_nationkey = c.c_nationkey
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n.n_name""".stripMargin,

    "q01_filter_group_count" ->
      """SELECT o_orderpriority, count(*) AS cnt
        |FROM orders WHERE o_orderstatus = 'O'
        |GROUP BY o_orderpriority""".stripMargin,

    "q222_tpch_q6" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
        |    AS revenue_x10000
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_quantity < 24
        |  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7""".stripMargin,

    "q02_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price,
        |  round(sum(l_discount), 2) AS sum_disc,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q03_group_min_date" ->
      """SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS first_order_date
        |FROM orders GROUP BY o_custkey""".stripMargin,

    "q04_quota_pct" ->
      """WITH avail AS (
        |  SELECT o_custkey AS emp_id, count(*) AS total_orders
        |  FROM orders GROUP BY o_custkey),
        |availed AS (
        |  SELECT o_custkey AS emp_id, count(*) AS f_orders
        |  FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey)
        |SELECT a.emp_id, a.total_orders, b.f_orders,
        |  round(b.f_orders / a.total_orders * 100, 2) AS pct
        |FROM avail a JOIN availed b ON a.emp_id = b.emp_id
        |WHERE round(b.f_orders / a.total_orders * 100, 2) > 50""".stripMargin,

    "q05_dedup_keep_latest" ->
      """SELECT user_id, event_type, event_id, ts_us, value, props
        |FROM (
        |  SELECT *, epoch_ns(ts) // 1000 AS ts_us,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY epoch_ns(ts) // 1000 DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1""".stripMargin,

    "q06_top1_per_group" ->
      """SELECT c_nationkey, c_custkey, c_acctbal
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY c_nationkey
        |    ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        |  FROM customer)
        |WHERE rn = 1""".stripMargin,

    "q07_scd2_closeout" ->
      """WITH dim AS (
        |  SELECT o_custkey AS emp_id, min(CAST(o_orderdate AS DATE)) AS start_date
        |  FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey),
        |upd AS (
        |  SELECT o_custkey AS emp_id, min(CAST(o_orderdate AS DATE)) AS start_date
        |  FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey)
        |SELECT d.emp_id, d.start_date,
        |  u.start_date AS end_date,
        |  CASE WHEN u.emp_id IS NULL THEN 'Active' ELSE 'Inactive' END AS status
        |FROM dim d LEFT JOIN upd u ON d.emp_id = u.emp_id
        |UNION ALL
        |SELECT emp_id, start_date, CAST(NULL AS DATE) AS end_date,
        |  'Active' AS status
        |FROM upd""".stripMargin,

    "q08_upsert" ->
      """WITH upd AS (
        |  SELECT o_custkey AS emp_id, round(sum(o_totalprice), 2) AS val
        |  FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey)
        |SELECT emp_id, val FROM upd
        |UNION ALL
        |SELECT c_custkey AS emp_id, c_acctbal AS val FROM customer
        |WHERE c_custkey NOT IN (SELECT emp_id FROM upd)""".stripMargin,

    "q09_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderstatus = 'P')""".stripMargin,

    "q10_semi_join" ->
      """SELECT s_suppkey, s_name FROM supplier s
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_suppkey = s.s_suppkey AND l.l_returnflag = 'R')""".stripMargin,

    "q11_except_all" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
        |EXCEPT ALL
        |SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
        |WHERE l_returnflag = 'A'""".stripMargin,

    "q12_union_parties" ->
      """SELECT c_custkey AS id, c_name AS name, 'customer' AS kind FROM customer
        |UNION ALL
        |SELECT s_suppkey AS id, s_name AS name, 'supplier' AS kind
        |FROM supplier""".stripMargin,

    "q13_working_days" ->
      """WITH days AS (
        |  SELECT CAST(unnest(generate_series(DATE '2024-01-01',
        |    DATE '2024-12-31', INTERVAL 1 DAY)) AS DATE) AS d),
        |hol AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS hd FROM events
        |  WHERE event_type = 'error')
        |SELECT CAST(month(d) AS INT) AS mth, count(*) AS working_days
        |FROM days
        |WHERE isodow(d) <= 5 AND d NOT IN (SELECT hd FROM hol)
        |GROUP BY month(d)""".stripMargin,

    "q14_scalar_subquery" ->
      """SELECT o_orderkey,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE),
        |    (SELECT max(CAST(o_orderdate AS DATE)) FROM orders)) AS INT)
        |    AS days_to_end
        |FROM orders""".stripMargin,

    "q15_case_coalesce" ->
      """SELECT c_custkey,
        |  CASE WHEN t.cnt IS NULL THEN 'Inactive' ELSE 'Active' END AS status,
        |  coalesce(t.cnt, 0) AS order_cnt
        |FROM customer
        |LEFT JOIN (SELECT o_custkey, count(*) AS cnt FROM orders
        |  GROUP BY o_custkey) t
        |ON c_custkey = t.o_custkey""".stripMargin,

    "q16_date_parts" ->
      """SELECT o_orderkey,
        |  CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS yr,
        |  CAST(month(CAST(o_orderdate AS DATE)) AS INT) AS mth,
        |  CAST(isodow(CAST(o_orderdate AS DATE)) - 1 AS INT) AS dow
        |FROM orders""".stripMargin,

    "q17_distinct_pairs" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

    "q46_intersect" ->
      """SELECT o_custkey AS id FROM orders
        |INTERSECT
        |SELECT o_custkey AS id FROM orders
        |WHERE o_orderpriority = '1-URGENT'""".stripMargin,

    "q39_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty, count(*) AS cnt
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q40_running_window" ->
      """SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us, value,
        |  round(sum(value) OVER (PARTITION BY user_id
        |    ORDER BY epoch_ns(ts) // 1000 ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS running_value,
        |  lag(event_id, 1) OVER (PARTITION BY user_id
        |    ORDER BY epoch_ns(ts) // 1000 ASC, event_id ASC)
        |    AS prev_event_id
        |FROM events
        |WHERE event_type = 'purchase'""".stripMargin,

    "q47_topk_agg" ->
      """SELECT o_orderpriority, CAST(rn AS INT) AS rn, o_orderkey,
        |  o_totalprice
        |FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn <= 3""".stripMargin,

    "q41_sessionize" ->
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us
        |  FROM events),
        |g AS (SELECT user_id, event_id, ts_us,
        |    CASE WHEN ts_us - lag(ts_us, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts_us ASC, event_id ASC) > 1800000000
        |    THEN 1 ELSE 0 END AS new_sess
        |  FROM t),
        |s AS (SELECT user_id, event_id, ts_us,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id
        |      ORDER BY ts_us ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM g)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts_us) AS start_us, max(ts_us) AS end_us
        |FROM s GROUP BY user_id, session_id""".stripMargin,

    "q42_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |  count(*) AS n_events
        |FROM events GROUP BY event_type""".stripMargin,

    "q43_asof_join" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |    epoch_ns(ts) // 1000 AS ts_us FROM events),
        |p AS (SELECT user_id, ts_us, event_id FROM ev
        |  WHERE event_type = 'purchase'),
        |sg AS (SELECT user_id, ts_us, event_id FROM ev
        |  WHERE event_type = 'signup')
        |SELECT user_id, event_id, ts_us, asof_event_id FROM (
        |  SELECT p.user_id, p.event_id, p.ts_us,
        |    sg.event_id AS asof_event_id,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY sg.ts_us DESC, sg.event_id DESC) AS rn
        |  FROM p LEFT JOIN sg
        |    ON p.user_id = sg.user_id AND sg.ts_us <= p.ts_us)
        |WHERE rn = 1""".stripMargin,

    "q98_asof_value" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, value,
        |    epoch_ns(ts) // 1000 AS ts_us FROM events),
        |p AS (SELECT user_id, ts_us, event_id FROM ev
        |  WHERE event_type = 'purchase'),
        |dm AS (SELECT user_id, ts_us, event_id, value FROM ev
        |  WHERE event_type = 'click')
        |SELECT user_id, event_id, ts_us, asof_value FROM (
        |  SELECT p.user_id, p.event_id, p.ts_us,
        |    dm.value AS asof_value,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY dm.ts_us DESC, dm.event_id DESC) AS rn
        |  FROM p LEFT JOIN dm
        |    ON p.user_id = dm.user_id AND dm.ts_us <= p.ts_us)
        |WHERE rn = 1""".stripMargin,

    "q44_range_join" ->
      """WITH bins(lo, hi, label) AS (VALUES
        |  (0.0, 10.0, 'small'), (10.0, 25.0, 'mid'), (25.0, 1000.0, 'big'))
        |SELECT label, count(*) AS cnt, sum(l_quantity) AS sum_qty
        |FROM lineitem JOIN bins
        |  ON l_quantity >= lo AND l_quantity < hi
        |GROUP BY label""".stripMargin,

    "q45_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  count(*) AS cnt
        |FROM events GROUP BY 1""".stripMargin,

    "q19_epoch_parse" ->
      """SELECT event_id,
        |  epoch_ns(ts) // 1000 // 1000000 AS ts_s,
        |  (epoch_ns(ts) // 1000 // 1000000) * 1000000 AS parsed_us,
        |  CAST(NULL AS DATE) AS cooldown_start_date
        |FROM events""".stripMargin,

    "q18_topk_per_group" ->
      """SELECT o_orderpriority, CAST(rn AS INT) AS rn, o_orderkey,
        |  o_totalprice
        |FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn <= 3""".stripMargin,

    "q234_min_cost_supplier" ->
      """WITH eur AS (
        |  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
        |  FROM supplier s
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  WHERE r.r_name = 'EUROPE'),
        |pr AS (SELECT p_partkey, p_size FROM part
        |  WHERE p_type = 'STANDARD' AND p_size <= 5),
        |offers AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      // CAST(l_quantity AS BIGINT)) AS cost_cents
        |  FROM lineitem GROUP BY 1, 2),
        |eo AS (
        |  SELECT pr.p_partkey, pr.p_size, eur.s_acctbal, eur.s_name,
        |    eur.n_name, o.cost_cents
        |  FROM offers o
        |  JOIN eur ON o.l_suppkey = eur.s_suppkey
        |  JOIN pr ON o.l_partkey = pr.p_partkey),
        |mc AS (SELECT p_partkey, min(cost_cents) AS min_cost
        |  FROM eo GROUP BY 1)
        |SELECT eo.s_acctbal, eo.s_name, eo.n_name, eo.p_partkey,
        |  eo.p_size, eo.cost_cents
        |FROM eo JOIN mc ON eo.p_partkey = mc.p_partkey
        |  AND eo.cost_cents = mc.min_cost
        |ORDER BY eo.s_acctbal DESC, eo.p_partkey ASC, eo.s_name ASC
        |LIMIT 100""".stripMargin,

    "q235_value_concentration" ->
      """WITH asia AS (
        |  SELECT s.s_suppkey FROM supplier s
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  WHERE r.r_name = 'ASIA'),
        |v AS (
        |  SELECT l.l_partkey,
        |    sum(CAST(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |      AS HUGEINT)) AS value_c
        |  FROM lineitem l JOIN asia a ON l.l_suppkey = a.s_suppkey
        |  GROUP BY 1),
        |t AS (SELECT sum(value_c) AS total_c FROM v)
        |SELECT v.l_partkey AS p_partkey,
        |  CAST(v.value_c AS DOUBLE) AS value_cents,
        |  CAST((v.value_c * 1000000) // t.total_c AS BIGINT) AS share_ppm
        |FROM v, t
        |WHERE v.value_c * 1000 > t.total_c
        |ORDER BY value_cents DESC, p_partkey ASC""".stripMargin,

    "q236_excess_stock" ->
      """WITH sp AS (
        |  SELECT l_partkey, l_suppkey,
        |    sum(CAST(l_quantity AS BIGINT)) AS sp_qty
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1, 2),
        |pt AS (SELECT l_partkey, CAST(sum(sp_qty) AS BIGINT) AS part_qty
        |  FROM sp GROUP BY 1),
        |ex AS (
        |  SELECT sp.l_suppkey, CAST(count(*) AS BIGINT) AS n_excess_parts,
        |    CAST(sum(sp.sp_qty) AS BIGINT) AS qty_held
        |  FROM sp JOIN pt ON sp.l_partkey = pt.l_partkey
        |  WHERE sp.sp_qty * 2 > pt.part_qty
        |  GROUP BY 1)
        |SELECT s.s_suppkey, s.s_name, n.n_name, ex.n_excess_parts,
        |  ex.qty_held
        |FROM ex
        |JOIN supplier s ON ex.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey""".stripMargin,

    "q242_small_qty_revenue" ->
      """WITH li AS (
        |  SELECT l.l_partkey, CAST(l.l_quantity AS BIGINT) AS q,
        |    CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem l
        |  WHERE l.l_partkey IN
        |    (SELECT p_partkey FROM part WHERE p_brand = 'Brand#12')),
        |pa AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_li,
        |    CAST(sum(q) AS BIGINT) AS sum_q
        |  FROM li GROUP BY 1),
        |sm AS (SELECT li.l_partkey, li.cents
        |  FROM li JOIN pa ON li.l_partkey = pa.l_partkey
        |  WHERE li.q * 2 * pa.n_li < pa.sum_q)
        |SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(count(*) AS BIGINT) AS n_small_lines,
        |  CAST(CAST(sum(cents) AS DECIMAL(38,0)) AS DOUBLE)
        |    AS revenue_cents
        |FROM sm""".stripMargin,

    "q243_lone_failed_supplier" ->
      """WITH os AS (
        |  SELECT l_orderkey, l_suppkey,
        |    CAST(max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS has_r
        |  FROM lineitem GROUP BY 1, 2),
        |o AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_supp,
        |    CAST(sum(has_r) AS BIGINT) AS n_ret
        |  FROM os GROUP BY 1),
        |lf AS (SELECT os.l_suppkey,
        |    CAST(count(*) AS BIGINT) AS n_lone_fault
        |  FROM os JOIN o ON os.l_orderkey = o.l_orderkey
        |  WHERE os.has_r = 1 AND o.n_supp >= 2 AND o.n_ret = 1
        |  GROUP BY 1)
        |SELECT s.s_suppkey, s.s_name, n.n_name, lf.n_lone_fault
        |FROM lf
        |JOIN supplier s ON lf.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |ORDER BY lf.n_lone_fault DESC, s.s_suppkey ASC
        |LIMIT 100""".stripMargin,

    "q244_order_count_distribution" ->
      """WITH oc AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1)
        |SELECT coalesce(oc.n, 0) AS n_orders,
        |  CAST(count(*) AS BIGINT) AS n_customers
        |FROM customer c LEFT JOIN oc ON c.c_custkey = oc.o_custkey
        |GROUP BY 1
        |ORDER BY n_customers DESC, n_orders DESC""".stripMargin,

    "q245_market_share" ->
      """WITH ac AS (
        |  SELECT c.c_custkey FROM customer c
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  WHERE r.r_name = 'ASIA'),
        |o AS (SELECT o_orderkey,
        |    CAST(year(o_orderdate) AS BIGINT) AS yr
        |  FROM orders JOIN ac ON o_custkey = ac.c_custkey),
        |sn AS (SELECT s.s_suppkey, n.n_name FROM supplier s
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey),
        |rev AS (SELECT o.yr, sn.n_name,
        |    sum(CAST(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |      AS HUGEINT)) AS rev_c
        |  FROM lineitem l
        |  JOIN o ON l.l_orderkey = o.o_orderkey
        |  JOIN sn ON l.l_suppkey = sn.s_suppkey
        |  GROUP BY 1, 2),
        |t AS (SELECT yr, sum(rev_c) AS tot_c FROM rev GROUP BY 1)
        |SELECT rev.yr, rev.n_name,
        |  CAST(rev.rev_c AS DOUBLE) AS revenue_cents,
        |  CAST((rev.rev_c * 1000000) // t.tot_c AS BIGINT) AS share_ppm
        |FROM rev JOIN t ON rev.yr = t.yr
        |ORDER BY rev.yr ASC, rev.n_name ASC""".stripMargin,

    "q246_idle_rich_customers" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        |  FROM customer),
        |thr AS (SELECT CAST(sum(bal_c) AS HUGEINT) AS sum_c,
        |    CAST(count(*) AS BIGINT) AS n_pos
        |  FROM c WHERE bal_c > 0),
        |b AS (SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '2001-01-01')
        |SELECT c.c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(c.bal_c) AS BIGINT) AS total_bal_cents
        |FROM c, thr
        |WHERE CAST(c.bal_c AS HUGEINT) * thr.n_pos > thr.sum_c
        |  AND NOT EXISTS (SELECT 1 FROM b WHERE b.o_custkey = c.c_custkey)
        |GROUP BY 1
        |ORDER BY c.c_mktsegment ASC""".stripMargin,

    "q247_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      AS HUGEINT)) AS rev_c
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-07-01'
        |  GROUP BY 1),
        |mx AS (SELECT max(rev_c) AS max_c FROM rev)
        |SELECT s.s_suppkey, s.s_name,
        |  CAST(rev.rev_c AS DOUBLE) AS revenue_cents
        |FROM rev
        |CROSS JOIN mx
        |JOIN supplier s ON rev.l_suppkey = s.s_suppkey
        |WHERE rev.rev_c = mx.max_c
        |ORDER BY s.s_suppkey ASC""".stripMargin,

    "q248_market_concentration" ->
      """WITH rev AS (
        |  SELECT p.p_type, l.l_suppkey,
        |    sum(CAST(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |      AS HUGEINT)) AS rev_c
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2)
        |SELECT p_type, CAST(count(*) AS BIGINT) AS n_suppliers,
        |  CAST(sum(rev_c) AS DOUBLE) AS total_cents,
        |  CAST((sum(rev_c * rev_c) * 1000000)
        |    // (sum(rev_c) * sum(rev_c)) AS BIGINT) AS hhi_ppm,
        |  sum(rev_c * rev_c) * 4 > sum(rev_c) * sum(rev_c)
        |    AS concentrated
        |FROM rev GROUP BY 1
        |ORDER BY p_type ASC""".stripMargin,

    "q249_order_priority_check" ->
      """WITH ord AS (SELECT o_orderkey, o_orderpriority,
        |    CAST(o_orderdate AS DATE) AS o_date
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-04-01'),
        |late AS (SELECT DISTINCT l.l_orderkey
        |  FROM lineitem l JOIN ord ON l.l_orderkey = ord.o_orderkey
        |  WHERE date_diff('day', ord.o_date,
        |    CAST(l.l_shipdate AS DATE)) > 30)
        |SELECT ord.o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS order_count
        |FROM ord
        |WHERE EXISTS (SELECT 1 FROM late
        |  WHERE late.l_orderkey = ord.o_orderkey)
        |GROUP BY 1
        |ORDER BY ord.o_orderpriority ASC""".stripMargin,

    "q250_volume_shipping" ->
      """WITH rn AS (SELECT n.n_nationkey, n.n_name, r.r_name
        |  FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey),
        |sp AS (SELECT s.s_suppkey, rn.n_name AS supp_nation
        |  FROM supplier s JOIN rn ON s.s_nationkey = rn.n_nationkey
        |  WHERE rn.r_name = 'EUROPE'),
        |cs AS (SELECT c.c_custkey, rn.n_name AS cust_nation
        |  FROM customer c JOIN rn ON c.c_nationkey = rn.n_nationkey
        |  WHERE rn.r_name = 'ASIA'),
        |o AS (SELECT o_orderkey, cs.cust_nation
        |  FROM orders JOIN cs ON o_custkey = cs.c_custkey)
        |SELECT sp.supp_nation, o.cust_nation,
        |  CAST(year(l.l_shipdate) AS BIGINT) AS yr,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |    AS HUGEINT)) AS DOUBLE) AS revenue_cents
        |FROM lineitem l
        |JOIN sp ON l.l_suppkey = sp.s_suppkey
        |JOIN o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1, 2, 3
        |ORDER BY sp.supp_nation ASC, o.cust_nation ASC, yr ASC""".stripMargin,

    "q251_product_type_profit" ->
      """WITH li AS (SELECT l.l_partkey, l.l_suppkey,
        |    CAST(year(l.l_shipdate) AS BIGINT) AS yr,
        |    CAST(round(l.l_extendedprice * 100) AS BIGINT) AS pc,
        |    CAST(l.l_quantity AS BIGINT) AS q
        |  FROM lineitem l
        |  WHERE EXISTS (SELECT 1 FROM part p
        |    WHERE p.p_partkey = l.l_partkey AND p.p_type = 'ECONOMY')),
        |uc AS (SELECT *, pc // q AS uc FROM li),
        |mu AS (SELECT l_partkey, min(uc) AS min_uc FROM uc GROUP BY 1),
        |sn AS (SELECT s.s_suppkey, n.n_name FROM supplier s
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey)
        |SELECT sn.n_name, uc.yr,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(uc.pc - mu.min_uc * uc.q AS HUGEINT))
        |    AS DOUBLE) AS margin_cents
        |FROM uc
        |JOIN mu ON uc.l_partkey = mu.l_partkey
        |JOIN sn ON uc.l_suppkey = sn.s_suppkey
        |GROUP BY 1, 2
        |ORDER BY sn.n_name ASC, uc.yr ASC""".stripMargin,

    "q252_delay_priority" ->
      """WITH j AS (SELECT
        |    CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
        |        CAST(l.l_shipdate AS DATE)) <= 30 THEN 'fast'
        |      WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
        |        CAST(l.l_shipdate AS DATE)) <= 90 THEN 'medium'
        |      ELSE 'slow' END AS delay_bucket,
        |    o.o_orderpriority IN ('1-URGENT', '2-HIGH') AS critical
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l.l_shipdate < TIMESTAMP '1997-01-01')
        |SELECT delay_bucket,
        |  CAST(sum(CASE WHEN critical THEN 1 ELSE 0 END) AS BIGINT)
        |    AS high_line_count,
        |  CAST(sum(CASE WHEN critical THEN 0 ELSE 1 END) AS BIGINT)
        |    AS low_line_count
        |FROM j GROUP BY 1
        |ORDER BY delay_bucket ASC""".stripMargin,

    "q253_promo_revenue" ->
      """WITH j AS (SELECT
        |    p.p_type = 'PROMO' AS is_promo,
        |    CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
        |    AND l.l_shipdate < TIMESTAMP '1996-04-01'),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_lines,
        |    CAST(sum(CASE WHEN is_promo THEN cents ELSE 0 END)
        |      AS HUGEINT) AS promo_c,
        |    CAST(sum(cents) AS HUGEINT) AS tot_c
        |  FROM j)
        |SELECT n_lines, CAST(promo_c AS DOUBLE) AS promo_cents,
        |  CAST(tot_c AS DOUBLE) AS total_cents,
        |  CAST((promo_c * 1000000) // tot_c AS BIGINT) AS promo_ppm
        |FROM a""".stripMargin,

    "q254_supplier_census" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey
        |  FROM lineitem),
        |ok AS (SELECT pr.l_partkey, pr.l_suppkey FROM pairs pr
        |  WHERE NOT EXISTS (SELECT 1 FROM supplier s
        |    WHERE s.s_suppkey = pr.l_suppkey AND s.s_acctbal < 0))
        |SELECT p.p_brand, p.p_size,
        |  CAST(count(DISTINCT ok.l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM ok JOIN part p ON ok.l_partkey = p.p_partkey
        |WHERE p.p_brand <> 'Brand#21'
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, p.p_brand ASC, p.p_size ASC
        |LIMIT 40""".stripMargin,

    "q255_discounted_revenue" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
        |    AS DOUBLE) AS revenue_x10000
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p.p_brand = 'Brand#12'
        |    AND l.l_quantity BETWEEN 1 AND 11
        |    AND p.p_size BETWEEN 1 AND 5)
        |  OR (p.p_brand = 'Brand#23'
        |    AND l.l_quantity BETWEEN 10 AND 20
        |    AND p.p_size BETWEEN 1 AND 10)
        |  OR (p.p_brand = 'Brand#25'
        |    AND l.l_quantity BETWEEN 20 AND 30
        |    AND p.p_size BETWEEN 1 AND 15)""".stripMargin
  )
}
