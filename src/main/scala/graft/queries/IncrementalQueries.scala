package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Incremental-maintenance and operational-quality operators: the
  * session_window primitive (batch twin of the streaming session
  * aggregation), algebraic partial-aggregate recombination (the heart
  * of incremental view maintenance at 100 TB — never re-scan history,
  * re-combine its partials), referential/domain data-quality audits,
  * equi-width histograms, and time-range window frames.
  *
  * Determinism: all outputs are integer counts, integral-double sums,
  * or microsecond epochs — no float ordering anywhere.
  */
object IncrementalQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- session_window: Spark's native gap-merge session operator
    // (the batch form of the streaming session aggregation; q41 builds
    // the same islands manually with lag + running sum). Session end =
    // last event + gap.
    "q76_session_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          unix_micros(col("session_window.end")).as("end_us"),
          col("n"))
    }),

    // ---- incremental view maintenance: history partials + delta
    // partials recombine algebraically to the full aggregate — the
    // oracle IS the from-scratch group-by. At 100 TB the history side is
    // a stored partial-agg table; only the delta is scanned fresh.
    "q77_incremental_agg" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      def partial(df: DataFrame): DataFrame =
        df.groupBy(col("l_suppkey"))
          .agg(sum(col("l_quantity")).as("p_qty"),
            count(lit(1)).as("p_cnt"))
      // the two partitions must be EXHAUSTIVE: a NULL shipdate fails both
      // year comparisons, so history takes the null branch explicitly —
      // otherwise those rows silently vanish from the recombined view
      val history = partial(li.filter(col("l_shipdate").isNull
        || year(col("l_shipdate")) < 2000))
      val delta = partial(li.filter(year(col("l_shipdate")) >= 2000))
      history.unionByName(delta)
        .groupBy(col("l_suppkey"))
        .agg(sum(col("p_qty")).as("sum_qty"),
          sum(col("p_cnt")).as("cnt"))
    }),

    // ---- CDC APPLY: the q66 snapshot diff replayed onto the old
    // snapshot — upsert added+changed rows, anti-join the removed keys —
    // must reproduce the new snapshot EXACTLY, and the oracle IS the
    // new snapshot (the q101 idiom: the mechanism must be invisible in
    // the result). This is incremental dim maintenance at scale: ship
    // and apply the (small) diff instead of re-loading the snapshot.
    "q108_cdc_apply" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val old = o.filter(col("o_orderkey") % 7 =!= 0)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
      val neu = o.filter(col("o_orderkey") % 11 =!= 0)
        .select(col("o_orderkey").as("k"),
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 10.0)
            .otherwise(col("o_totalprice")).as("v"))
      val diff = old.select(col("k"), col("v").as("v_old"))
        .join(neu.select(col("k"), col("v").as("v_new")), Seq("k"),
          "full_outer")
        .withColumn("change",
          when(col("v_old").isNull, lit("added"))
            .when(col("v_new").isNull, lit("removed"))
            .when(col("v_old") =!= col("v_new"), lit("changed")))
        .filter(col("change").isNotNull)
      val upserts = diff.filter(col("change") =!= "removed")
        .select(col("k"), col("v_new").as("v"))
      val deletes = diff.filter(col("change") === "removed").select(col("k"))
      graft.operators.Merge.upsert(old, upserts, Seq("k"))
        .join(deletes, Seq("k"), "left_anti")
    }),

    // ---- data-quality audit: referential integrity (orphan facts),
    // key uniqueness, domain violations — one row of counters. Each
    // check is a shuffle-light aggregate or broadcast-able anti-join.
    "q78_dq_audit" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val orphans = li.join(o, li("l_orderkey") === o("o_orderkey"),
          "left_anti")
        .agg(count(lit(1)).as("orphan_lineitems"))
      val dupKeys = o.groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("c")).filter(col("c") > 1)
        .agg(count(lit(1)).as("dup_orderkeys"))
      // coalesce matches the oracle's coalesce(sum(...), 0): on an empty
      // table both engines emit 0, not a NULL/0 parity break
      val domain = li.agg(
        coalesce(sum(when(col("l_quantity") <= 0, 1).otherwise(0)),
          lit(0L)).as("bad_quantity"),
        coalesce(sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1)
          .otherwise(0)), lit(0L)).as("bad_discount"),
        coalesce(sum(when(col("l_shipdate").isNull, 1).otherwise(0)),
          lit(0L)).as("null_shipdate"))
      domain.crossJoin(orphans).crossJoin(dupKeys)
    }),

    // ---- equi-width histogram: 10 bins over [0, 60000) of order value;
    // single map-side-combinable aggregation, the profile-building shape
    "q79_histogram" -> ((s, d) => {
      Tables.orders(s, d)
        .select(least(floor(col("o_totalprice") / 6000.0), lit(9))
          .cast("int").as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"))
    }),

    // ---- trailing 7-day RANGE frame: per-supplier daily volume summed
    // over a value-based window (peers by day, not by row). Day grain is
    // pre-aggregated first so the frame slides over one row per day.
    "q80_range_frame" -> ((s, d) => {
      val daily = Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"),
          datediff(to_date(col("l_shipdate")), lit("1995-01-01"))
            .as("day"))
        .agg(sum(col("l_quantity")).as("day_qty"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("day"))
        .rangeBetween(-6, 0)
      daily.select(col("l_suppkey"), col("day"), col("day_qty"),
        sum(col("day_qty")).over(w).as("qty_7d"))
    })
  )

  val oracle: Map[String, String] = Map(
    // islands: a session breaks when the gap to the previous event is
    // >= 30 min; session end = last event + 30 min (Spark's definition)
    "q76_session_window" ->
      """WITH ev AS (SELECT user_id, epoch_ns(ts) // 1000 AS ts_us
        |  FROM events),
        |flagged AS (SELECT user_id, ts_us,
        |    CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id
        |      ORDER BY ts_us) >= 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM ev),
        |grp AS (SELECT user_id, ts_us,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
        |      ROWS UNBOUNDED PRECEDING) AS g
        |  FROM flagged)
        |SELECT user_id, min(ts_us) AS start_us,
        |  max(ts_us) + 1800000000 AS end_us, count(*) AS n
        |FROM grp GROUP BY user_id, g""".stripMargin,

    "q77_incremental_agg" ->
      """SELECT l_suppkey, sum(l_quantity) AS sum_qty, count(*) AS cnt
        |FROM lineitem GROUP BY l_suppkey""".stripMargin,

    // the new snapshot itself: applying the diff must be invisible
    "q108_cdc_apply" ->
      """SELECT o_orderkey AS k,
        |  CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 10.0
        |       ELSE o_totalprice END AS v
        |FROM orders WHERE o_orderkey % 11 <> 0""".stripMargin,

    "q78_dq_audit" ->
      """SELECT
        |  (SELECT CAST(coalesce(sum(CASE WHEN l_quantity <= 0 THEN 1
        |     ELSE 0 END), 0) AS BIGINT) FROM lineitem) AS bad_quantity,
        |  (SELECT CAST(coalesce(sum(CASE WHEN l_discount < 0
        |     OR l_discount > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
        |     FROM lineitem) AS bad_discount,
        |  (SELECT CAST(coalesce(sum(CASE WHEN l_shipdate IS NULL THEN 1
        |     ELSE 0 END), 0) AS BIGINT) FROM lineitem) AS null_shipdate,
        |  (SELECT count(*) FROM lineitem
        |     WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        |     AS orphan_lineitems,
        |  (SELECT count(*) FROM (SELECT o_orderkey FROM orders
        |     GROUP BY o_orderkey HAVING count(*) > 1)) AS dup_orderkeys""".stripMargin,

    "q79_histogram" ->
      """SELECT CAST(least(floor(o_totalprice / 6000.0), 9) AS INT) AS bin,
        |  count(*) AS n
        |FROM orders GROUP BY 1""".stripMargin,

    "q80_range_frame" ->
      """WITH daily AS (
        |  SELECT l_suppkey,
        |    CAST(date_diff('day', DATE '1995-01-01',
        |      CAST(l_shipdate AS DATE)) AS INT) AS day,
        |    sum(l_quantity) AS day_qty
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_suppkey, day, day_qty,
        |  sum(day_qty) OVER (PARTITION BY l_suppkey ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS qty_7d
        |FROM daily""".stripMargin
  )
}
