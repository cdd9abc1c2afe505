package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Skew

/** Round-2 depth: the operators a warehouse-scale training-data platform
  * layers on top of the reference's relational core — TF-IDF ranking,
  * CDC snapshot diff, SCD2 point-in-time lookup, funnel + cohort
  * retention, bounded edit-distance near-dup, PII redaction, chunk
  * planning, salted skew aggregation, sketch-vs-exact audit, and Markov
  * transition counting.
  *
  * Determinism rules (same contract as Relational.scala): every double
  * that reaches the output is either a single IEEE-754 operation on
  * exact inputs (correctly rounded identically by Spark and DuckDB) or
  * integer-exact; every window carries a total order; booleans compare
  * quantities whose error margins are orders of magnitude away from the
  * threshold.
  */
object WarehouseQueries {
  type Q = (SparkSession, String) => DataFrame


  val queries: Map[String, Q] = Map(
    // ---- QUANTILE SKETCH audit (the q74/q123 idiom for order
    // statistics): per group, exact discrete percentiles (the values a
    // replayable engine must agree on) next to approx_percentile's
    // KLL-style sketch estimates, with tolerance verdicts asserted as
    // columns — the oracle pins the verdicts TRUE, so a sketch drifting
    // past its guarantee fails the hash, not just a log line.
    // The verdicts are derived from the guarantee the sketch ACTUALLY
    // makes (ADVICE r6): approx_percentile's bound is on RANK
    // (± n/accuracy, accuracy = 10000), not value — so each estimate
    // must lie between the exact discrete percentiles at p ∓ 3/accuracy
    // (value-at-rank brackets of the permitted rank window; the 3×
    // margin absorbs the ceil-discretization at both bracket edges and
    // the merge-order variation measured across partitionings — ±2-3
    // ranks at n≈2·10^4, against a nominal ±2 — while staying ±0.03%
    // in rank terms). A 1% VALUE tolerance could fail a perfectly
    // in-spec sketch under a skewed distribution or a different
    // partition merge order; the rank bracket cannot.
    // At 100 TB exact per-group percentiles need
    // a full sort per group; the sketch is the production path and
    // THIS audit is what licenses it. One pass, all aggregates
    // map-side combinable (the sketch merges associatively).
    // The exact leg rides the q175 HISTOGRAM idiom, not 12 separate
    // percentile_disc sort-aggregates (each of those buffers the whole
    // group — 12 buffers tripled the query to 12 s at sf0.1; the ratio
    // column caught it): one (group, value) count histogram, one
    // two-phase running sum, then every value-at-rank point — the 4
    // published percentiles AND the 8 bracket bounds — as min-when
    // folds over the same cumulative frame. cum ≥ p·n with integer cum
    // is exactly percentile_disc's ceil(p·n) position, kept in integer
    // cross-multiplication (×10^4 denominators), so the histogram
    // formulation is bit-identical to the sort-agg one.
    "q160_quantile_sketch_audit" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val ps = Seq(("25", 2500), ("50", 5000), ("75", 7500), ("95", 9500))
      val eps = 3 // rank-bracket half-width, ×10^-4 of n (see above)
      // r13 (guide §1.2/§2.3): the exact leg moves from the
      // (flag, price) value histogram + two-phase prefix — the
      // histogram is NEAR ROW-CARDINALITY (594k rows of 600k at
      // sf0.1), so its build shuffled distinct values and the cum
      // fold windowed them, 4 planner actions deep — onto
      // Quantile.groupQuantilesRational: three bounded map-combined
      // passes, driver state ≤ groups × buckets, and the rank rule
      // ⌈pk·n/10⁴⌉ evaluated in EXACT integers = the old min-when
      // cum·10⁴ ≥ n·pk fold (this is the q197 lesson the Quantile
      // header documents: bucket refinement IS the prescribed shape
      // when the value column is near-unique; q160 predated it).
      // All 12 value-at-rank points (4 percentiles + 8 bracket
      // bounds) share the three passes.
      val pts = ps.flatMap { case (nm, pk) =>
        Seq((pk.toLong, 10000L, s"p$nm"),
          ((pk - eps).toLong, 10000L, s"lo$nm"),
          ((pk + eps).toLong, 10000L, s"hi$nm"))
      }
      val th = graft.operators.Quantile.groupQuantilesRational(
        li, "l_returnflag", "l_extendedprice", pts,
        emitN = Some("n_rows"))
      val ap = li.groupBy(col("l_returnflag"))
        .agg(expr("approx_percentile(l_extendedprice, " +
          "array(0.25D, 0.5D, 0.75D, 0.95D), 10000)").as("ap"))
      th.join(broadcast(ap), "l_returnflag")
        .select(col("l_returnflag") +: col("n_rows") +:
          (ps.map { case (nm, _) => col(s"p$nm") } ++
            ps.zipWithIndex.map { case ((nm, _), i) =>
              (element_at(col("ap"), i + 1) >= col(s"lo$nm") &&
                element_at(col("ap"), i + 1) <= col(s"hi$nm"))
                .as(s"p${nm}_ok")
            }): _*)
    }),

    // ---- SCALABLE exact percentile (two-phase value histogram — the
    // 100 TB answer to the cost asymmetry q160 measures): q160's exact
    // leg sort-aggregates whole groups (low-cardinality sort-agg, all
    // rows of a group through one aggregator); THIS computes the same
    // discrete percentiles with no per-group sort — (group, value)
    // histogram counts (map-combined), a running count over values via
    // the two-phase Prefix.runningSum (groups are LOW-cardinality —
    // the q110/q161 discipline), then the threshold rule
    // cume_count·K ≥ p·K·n picks the smallest qualifying value in one
    // map-combined conditional-min. Shuffle carries (group, value,
    // count) — distinct values, never rows. Agrees with q160's
    // percentile_disc by definition (asserted in QueriesSpec).
    "q175_scalable_percentile" -> ((s, d) => {
      // r13: same move as q160's exact leg — the (flag, price)
      // histogram here is near row-cardinality, so the two-phase
      // prefix shuffled ~594k distinct values and windowed them for
      // two rank reads. groupQuantilesRational computes the identical
      // values (⌈n/2⌉ and ⌈19n/20⌉ in exact integers — the old
      // cum·2 ≥ n / cum·20 ≥ 19n folds) in three bounded passes with
      // no value-grain exchange at all. Still the 100 TB exact-
      // percentile answer, now via the Quantile refinement operator.
      graft.operators.Quantile.groupQuantilesRational(
        Tables.lineitem(s, d), "l_returnflag", "l_extendedprice",
        Seq((1L, 2L, "p50"), (19L, 20L, "p95")),
        emitN = Some("n_rows"))
    }),

    // ---- SMALL-FILE COMPACTION planner (the Delta/Iceberg OPTIMIZE
    // shape): given a per-partition file inventory (simulated here at
    // doc_id-div-8 grain with byte sizes from n_chars), plan merge
    // groups targeting ~20 kB bins — files ordered largest-first within
    // their table partition, assigned to a bin by exclusive running
    // sum div target (sorted greedy sequential fill, the q110 prefix
    // idiom at file grain). The running sum goes through the TWO-PHASE
    // Prefix.runningSum — table partitions are a low-cardinality
    // stratum, and even metadata-scale inventories (10^5-10^6 files
    // per partition at 100 TB) should not serialize through one
    // reducer per partition (the q110 class; the plan auditor flagged
    // the plain-window form). The composite order (bytes DESC, file_id
    // ASC) is one ascending numeric key: -bytes·shift + file_id, with
    // the shift WIDENED FROM THE INVENTORY (ADVICE r6: a pinned 10^5
    // silently mis-orders, and can collide, once file_id ≥ 10^5, i.e.
    // doc_id ≥ 8·10^5, with no error): one metadata-grain max() probe
    // picks the next power of ten above max(file_id), and the
    // no-overflow envelope is require()d instead of assumed. The
    // oracle orders by the raw (bytes DESC, file_id ASC) pair, so the
    // shift only has to PRESERVE that order, never match a pinned
    // value. Output: one row per (partition, bin) with file count and
    // bytes.
    "q161_compaction_plan" -> ((s, d) => {
      val target = 20000L
      val filesBase = Tables.documents(s, d)
        .groupBy(col("source"), expr("doc_id div 8").as("file_id"))
        .agg(sum(col("n_chars")).as("bytes"))
      val mx = filesBase
        .agg(max(col("file_id")).as("mf"), max(col("bytes")).as("mb"))
        .collect()(0)
      val maxFid = if (mx.isNullAt(0)) 0L else mx.getLong(0)
      val maxBytes = if (mx.isNullAt(1)) 0L else mx.getLong(1)
      var shift = 100000L
      while (shift <= maxFid) shift *= 10
      require(maxBytes <= Long.MaxValue / (2 * shift),
        s"q161: bytes up to $maxBytes overflow the composite order key " +
          s"at shift $shift — use a two-column sort instead")
      val files = filesBase
        .withColumn("ord", -col("bytes") * lit(shift) + col("file_id"))
      graft.operators.Prefix.runningSum(
          files, "source", "ord", "bytes", "rs")
        .withColumn("cum_before", col("rs") - col("bytes"))
        .groupBy(col("source"),
          expr(s"cum_before div ${target}L").as("bin"))
        .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bin_bytes"),
          max(col("bytes")).as("max_file_bytes"))
    }),

    // ---- ZONE-MAP file-skipping audit: how many files would per-file
    // min/max statistics prune for a date-range predicate, compared
    // across two physical layouts — "arrival" (files grouped by
    // l_orderkey ranges: every file spans the full shipdate range,
    // nothing prunes) vs "clustered" (files laid out by ship month:
    // almost everything outside the predicate window prunes). The
    // comparison IS the lesson a 100 TB table owner acts on: zone maps
    // are only as good as the clustering that feeds them (q117's
    // z-order is the 2-D version of the fix). Stats are one group-by
    // per layout at file grain; the audit folds to two rows; row-level
    // ground truth (rows_matching) exposes the false-positive scan cost
    // alongside the file counts. All date/int comparisons exact.
    "q162_zonemap_audit" -> ((s, d) => {
      val lo = lit("1997-01-01").cast("date")
      val hi = lit("1997-06-30").cast("date")
      val li = Tables.lineitem(s, d)
        .select(to_date(col("l_shipdate")).as("sd"), col("l_orderkey"))
      def audit(withFile: DataFrame, layout: String): DataFrame =
        withFile
          .groupBy(col("file_id"))
          .agg(min(col("sd")).as("mn"), max(col("sd")).as("mx"),
            count(lit(1)).as("n_rows"),
            sum(when(col("sd").between(lo, hi), 1L).otherwise(0L))
              .as("n_match"))
          .agg(count(lit(1)).as("n_files"),
            sum(when(col("mx") < lo || col("mn") > hi, 1L).otherwise(0L))
              .as("n_pruned"),
            sum(when(!(col("mx") < lo || col("mn") > hi), col("n_rows"))
              .otherwise(0L)).as("rows_scanned"),
            sum(col("n_match")).as("rows_matching"))
          .select(lit(layout).as("layout"), col("n_files"),
            col("n_pruned"), col("rows_scanned"), col("rows_matching"))
      audit(li.withColumn("file_id", expr("l_orderkey div 1024")),
          "arrival")
        .unionByName(audit(li.withColumn("file_id",
          (year(col("sd")) * 100 + month(col("sd"))).cast("bigint")),
          "clustered"))
    }),

    // ---- CDC LOG → SCD2 intervals (the inverse of q66's snapshot
    // diff, closing the SCD2 family: q07 builds by merge, q67 reads
    // point-in-time, q66 diffs snapshots, THIS reconstructs the full
    // validity history from a change stream): each change event opens
    // an interval at its timestamp and closes at the key's next change
    // (lead over the per-key total order; NULL end = the open row).
    // The window partitions on high-cardinality user_id; ties inside a
    // timestamp break on event_id so replay is total-ordered. This is
    // how a warehouse bootstraps a type-2 dimension from a Debezium/
    // binlog feed — one shuffle by key, no self-join.
    "q172_cdc_to_scd2" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("event_type").as("attr"))
        .withColumn("valid_to", lead(col("ts_us"), 1).over(w))
        .withColumn("is_current", col("valid_to").isNull)
        .withColumnRenamed("ts_us", "valid_from")
    }),

    // ---- ENCODING ADVISOR (the storage-codec decision q151's stats
    // feed): per candidate column, rows vs exact NDV and the
    // dictionary-encoding verdict (NDV ≤ 5% of rows — low-cardinality
    // columns dictionary-encode; high-cardinality ones stay plain) —
    // the per-column choice a parquet writer tunes at 100 TB, where a
    // wrong encoding on one wide column is terabytes. One aggregate
    // per column over a single scan (count + countDistinct; production
    // downgrades NDV to the q74-audited sketch), folded to 4 rows by
    // unionByName. Integer cross-multiplied verdict.
    "q179_encoding_advisor" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      def adv(c: String): DataFrame =
        li.agg(count(lit(1)).as("n_rows"),
            countDistinct(col(c)).as("ndv"))
          .select(lit(c).as("column_name"), col("n_rows"), col("ndv"),
            (col("ndv") * 20 <= col("n_rows")).as("dictionary_encode"))
      Seq("l_returnflag", "l_linestatus", "l_partkey", "l_extendedprice")
        .map(adv).reduce(_ unionByName _)
    }),

    // ---- INCLUSION-DEPENDENCY discovery (FK candidate audit — the
    // data-modeling generalization of q78's orphan check): for each
    // candidate child→parent column pair, how many distinct child
    // values exist, how many are contained in the parent, and the
    // verdict that the inclusion holds exactly — how referential
    // structure is DISCOVERED on an unfamiliar 100 TB lake, not just
    // validated. Each pair is one distinct-project per side + a
    // left-anti-shaped aggregate; child distincts are value-grain
    // (bounded by NDV, not rows).
    "q180_fk_discovery" -> ((s, d) => {
      def pair(name: String, child: DataFrame, childCol: String,
               parent: DataFrame, parentCol: String): DataFrame = {
        val c = child.select(col(childCol).as("v")).distinct()
        val p = parent.select(col(parentCol).as("pv")).distinct()
        c.join(p, col("v") === col("pv"), "left_outer")
          .agg(count(lit(1)).as("n_child_distinct"),
            sum(when(col("pv").isNotNull, 1L).otherwise(0L))
              .as("n_contained"))
          .select(lit(name).as("candidate"), col("n_child_distinct"),
            col("n_contained"),
            (col("n_child_distinct") === col("n_contained"))
              .as("inclusion_holds"))
      }
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d)
      pair("lineitem.l_orderkey->orders.o_orderkey",
          li, "l_orderkey", ord, "o_orderkey")
        .unionByName(pair("lineitem.l_partkey->part.p_partkey",
          li, "l_partkey", Tables.part(s, d), "p_partkey"))
        .unionByName(pair("orders.o_custkey->customer.c_custkey",
          ord, "o_custkey", Tables.customer(s, d), "c_custkey"))
        .unionByName(pair("orders.o_custkey->supplier.s_suppkey",
          ord, "o_custkey", Tables.supplier(s, d), "s_suppkey"))
    }),

    // ---- TABLE CHECKSUM (replication/reconciliation fingerprint): an
    // ORDER-INDEPENDENT per-partition checksum — sum of a 32-bit md5
    // window over each row's canonical projection — the cheap answer to
    // "does the replica hold exactly the rows the primary does?" that
    // warehouse reconciliation jobs run after every sync. Order
    // independence (sum is commutative) means no sort anywhere; the
    // 32-bit-per-row window keeps the 64-bit running sum overflow-free
    // to ~4e9 rows per partition (widen to decimal beyond). Summing is
    // map-side combined; text enters through its md5 so wide payloads
    // never reach the checksum concat. Additivity (checksum(A ∪ B) =
    // checksum(A) + checksum(B) for disjoint slices) makes incremental
    // verification free — asserted in QueriesSpec.
    "q167_table_checksum" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("source"),
          expr("CAST(conv(substr(md5(CAST(concat_ws('|', doc_id, lang, " +
            "source, n_chars, md5(CAST(text AS BINARY))) AS BINARY)), " +
            "1, 8), 16, 10) AS BIGINT)").as("c32"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_rows"), sum(col("c32")).as("checksum"))
    }),

    // ---- FK FANOUT HISTOGRAM (join-cardinality profile): the
    // distribution of lineitem rows per order — the statistic a join
    // planner (and a data modeler) reads to size the orders⋈lineitem
    // output and spot fanout skew. Two hash aggregations: per-key
    // counts (map-combined on the high-cardinality FK), then the
    // count-of-counts fold to ≤7 rows; exact, no sampling.
    "q168_fk_fanout" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("fanout"))
        .groupBy(col("fanout"))
        .agg(count(lit(1)).as("n_orders"))
        .withColumn("n_rows", col("fanout") * col("n_orders"))
    }),

    // ---- TF-IDF term ranking: top token per doc by tf/df. The score is
    // one double division of two small ints (exact same bits on both
    // engines); ties break on token. df is a token-keyed shuffle whose
    // result broadcasts back in at doc granularity — at 100 TB the df
    // side is vocabulary-sized (millions), far smaller than the corpus.
    "q65_tfidf_top" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val tf = toks.groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      // tf already holds one row per distinct (doc, token) — df falls
      // out of it without re-scanning the corpus or a second distinct
      val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy((col("tf").cast("double") / col("df")).desc, col("tok").asc)
      tf.join(df, "tok")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("tok"), col("tf"), col("df"))
    }),

    // ---- CDC snapshot diff: row-level change feed between two table
    // versions (added / removed / changed), the building block of
    // incremental ingestion audits. Full outer join on the key; at scale
    // both sides shuffle once on the key and AQE handles skew.
    "q66_snapshot_diff" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val old = o.filter(col("o_orderkey") % 7 =!= 0)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
      val neu = o.filter(col("o_orderkey") % 11 =!= 0)
        .select(col("o_orderkey").as("k"),
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 10.0)
            .otherwise(col("o_totalprice")).as("v"))
      old.select(col("k"), col("v").as("v_old"))
        .join(neu.select(col("k"), col("v").as("v_new")), Seq("k"), "full_outer")
        .withColumn("change",
          when(col("v_old").isNull, lit("added"))
            .when(col("v_new").isNull, lit("removed"))
            .when(col("v_old") =!= col("v_new"), lit("changed")))
        .filter(col("change").isNotNull)
        .select(col("k"), col("change"), col("v_old"), col("v_new"))
    }),

    // ---- SCD2 point-in-time lookup: year-end headcount snapshots probed
    // against a validity-interval dim with NULL-open rows. The probe side
    // is tiny (reporting dates) -> broadcast nested-loop, the at-scale
    // shape for calendar-vs-interval joins; the dim never re-shuffles.
    "q67_scd2_snapshot" -> ((s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
      val dim = o.filter(col("o_orderstatus") === "F")
        .groupBy(col("o_custkey").as("emp_id"))
        .agg(min(to_date(col("o_orderdate"))).as("start_date"))
        .join(o.filter(col("o_orderstatus") === "O")
          .groupBy(col("o_custkey").as("emp_id"))
          .agg(min(to_date(col("o_orderdate"))).as("end_date")),
          Seq("emp_id"), "left_outer")
      val probes = (1995 to 2000).map(y => s"$y-12-31").toDF("p")
        .select(to_date(col("p")).as("p"))
      dim.join(broadcast(probes),
          col("start_date") <= col("p")
            && (col("end_date").isNull || col("p") < col("end_date")))
        .groupBy(col("p").as("snapshot_date"))
        .agg(count(lit(1)).as("headcount"))
    }),

    // ---- funnel: signup -> click -> purchase with strict event-time
    // ordering per user. Three conditional-min aggregations, each a
    // map-side-combinable shuffle on user_id; no window over raw events.
    "q68_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t1"))
      val s2 = ev.filter(col("event_type") === "click")
        .join(s1, "user_id").filter(col("ts_us") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(s2, "user_id").filter(col("ts_us") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t3"))
      s1.agg(count(lit(1)).as("n_signup"))
        .crossJoin(s2.agg(count(lit(1)).as("n_click")))
        .crossJoin(s3.agg(count(lit(1)).as("n_purchase")))
    }),

    // ---- cohort retention: users grouped by first-activity week,
    // counted per later active week. Two shuffles (user-grain min, then
    // cohort-cell count) — both map-side combinable.
    "q69_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      val cohort = ev.groupBy(col("user_id"))
        .agg(min(col("wk")).as("cohort_wk"))
      ev.distinct().join(cohort, "user_id")
        .withColumn("week_offset",
          (datediff(col("wk"), col("cohort_wk")) / 7).cast("int"))
        .groupBy(unix_micros(col("cohort_wk")).as("cohort_us"),
          col("week_offset"))
        .agg(count(lit(1)).as("users"))
    }),

    // ---- bounded edit-distance near-dup: blocked candidate pairs
    // (lang, source) compared on a 40-char prefix. Two cost bounds keep
    // this feasible corpus-scale: (1) a bag-of-characters L1 prefilter —
    // levenshtein(a,b) >= L1(hist_a, hist_b)/2, so pairs with L1 > 2k
    // can't be within k edits and skip the DP entirely (prunes >99% of
    // pairs on this corpus; the histograms are computed once per doc,
    // not per pair); (2) the banded threshold DP (O(n·k), -1 past k) on
    // survivors. Both are sound, so results equal the oracle's
    // unbounded levenshtein filtered to <= 10.
    "q70_edit_distance" -> ((s, d) => {
      val doc = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
          substring(col("text"), 1, 40).as("p"))
      // 26-bin lowercase-letter histogram of the prefix; the pair join
      // carries ONLY (id, hist) — prefix strings rejoin after the filter.
      // Repartitioned by block key first so the quadratic l1i stage runs
      // at full parallelism even off a single-file scan (a broadcast
      // pair join would otherwise inherit the scan's 1-2 partitions)
      val hist = doc
        .repartition(col("lang"), col("source"))
        .withColumn("hist", expr(graft.functions.Text.charHistogramSql("p")))
        .drop("p")
      val a = hist.select(col("lang"), col("source"),
        col("doc_id").as("id_a"), col("hist").as("h_a"))
      val b = hist.select(col("lang"), col("source"),
        col("doc_id").as("id_b"), col("hist").as("h_b"))
      val candidates = a.join(b, Seq("lang", "source"))
        .filter(col("id_a") < col("id_b"))
        // codegen'd native L1 (graft `l1i`) on every pair
        .filter(expr("l1i(h_a, h_b)") <= 20)
        .select(col("id_a"), col("id_b"))
      candidates
        .join(doc.select(col("doc_id").as("id_a"), col("p").as("p_a")),
          "id_a")
        .join(doc.select(col("doc_id").as("id_b"), col("p").as("p_b")),
          "id_b")
        // equality fast-path: lev(a,a)=0, so identical prefixes (the
        // bulk of survivors on duplicate-heavy corpora) skip the DP
        .withColumn("dist",
          when(col("p_a") === col("p_b"), lit(0))
            .otherwise(levenshtein(col("p_a"), col("p_b"), 10)))
        .filter(col("dist") >= 0)
        .select(col("id_a"), col("id_b"), col("dist"))
    }),

    // ---- q70 generalized: edit-distance near-dup over FULL texts with
    // length-band blocking instead of a fixed 40-char prefix. Soundness
    // of the banding: levenshtein(a,b) >= |len(a)-len(b)|, so pairs
    // within k=10 edits differ by <= 10 chars of length; with band
    // width 16 > 10 such pairs sit in the same or adjacent bands, and
    // replicating ONE side to bands {b-1, b, b+1} covers both cases.
    // Each unordered pair matches in exactly one (left, right) role
    // after the id_a < id_b filter — same-band pairs match in both
    // roles (the id filter keeps one), adjacent-band pairs match in one
    // role per direction (ditto) — so no dedup shuffle is needed. The
    // L1-histogram prefilter (levenshtein >= l1i/2, PropertySpec) then
    // prunes survivors before any DP; the pair join carries (id, hist)
    // only, texts rejoin last. This is the 100 TB shape: blocks bound
    // pair volume by (block size)², and band width tracks the edit
    // budget rather than a corpus-specific prefix length.
    "q97_edit_banded" -> ((s, d) => {
      val bw = 16 // band width; must exceed the edit budget k=10
      val doc = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"), col("text"),
          length(col("text")).as("len"),
          expr(s"length(text) div $bw").as("band"))
      // repartition by block key BEFORE the per-doc histogram: the
      // 26-replace histogram and the downstream per-pair work then run
      // at full parallelism even when the scan is a single small file
      // (a broadcast join would otherwise inherit the scan's 1-2
      // partitions and serialize the whole pipeline), and blocks are
      // co-located for the join
      val hist = doc
        .repartition(col("lang"), col("source"), col("band"))
        .withColumn("hist",
          expr(graft.functions.Text.charHistogramSql("text")))
        .select(col("doc_id"), col("lang"), col("source"), col("len"),
          col("band"), col("hist"))
      // rename EVERY column on each side: self-join column refs like
      // a("lang") === b("lang") resolve to the same attribute and
      // silently become trivially-true predicates
      val a = hist.select(col("lang").as("lang_a"),
        col("source").as("src_a"),
        col("doc_id").as("id_a"), col("len").as("len_a"),
        col("band").as("band_a"), col("hist").as("h_a"))
      val b = hist
        .select(col("lang").as("lang_b"), col("source").as("src_b"),
          col("doc_id").as("id_b"),
          col("len").as("len_b"), col("hist").as("h_b"),
          explode(array(col("band") - 1, col("band"),
            col("band") + 1)).as("probe"))
      val candidates = a
        .join(b, col("lang_a") === col("lang_b")
          && col("src_a") === col("src_b")
          && col("band_a") === col("probe"))
        .filter(col("id_a") < col("id_b")
          && abs(col("len_a") - col("len_b")) <= 10)
        .filter(expr("l1i(h_a, h_b)") <= 20)
        .select(col("id_a"), col("id_b"))
      // equality fast-path before the DP: on a high-duplicate corpus
      // most survivors are byte-identical clones (225k of 226k at the
      // 10× smoke), and lev(a,a)=0 by definition — one memcmp replaces
      // an O(n·k) DP for those, leaving the DP only for true near-dups
      candidates
        .join(Tables.documents(s, d)
          .select(col("doc_id").as("id_a"), col("text").as("t_a")), "id_a")
        .join(Tables.documents(s, d)
          .select(col("doc_id").as("id_b"), col("text").as("t_b")), "id_b")
        .withColumn("dist",
          when(col("t_a") === col("t_b"), lit(0))
            .otherwise(levenshtein(col("t_a"), col("t_b"), 10)))
        .filter(col("dist") >= 0)
        .select(col("id_a"), col("id_b"), col("dist"))
    }),

    // ---- PII-style redaction: digit runs masked, leak count reported.
    // Pure per-row codegen'd regex — no shuffle at all.
    "q71_pii_redact" -> ((s, d) => {
      Tables.customer(s, d).select(
        col("c_custkey"),
        regexp_replace(col("c_name"), "[0-9]", "X").as("redacted"),
        (length(col("c_name"))
          - length(regexp_replace(col("c_name"), "[0-9]", "")))
          .as("n_digits"))
    }),

    // ---- training-chunk planning: ceil(tokens/16) context windows per
    // doc, budgeted per source. Integer arithmetic end-to-end.
    "q72_chunk_plan" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("source"),
          ceil(size(split(col("text"), " ")) / lit(16.0)).as("chunks"))
        .groupBy(col("source"))
        .agg(sum(col("chunks")).as("total_chunks"),
          max(col("chunks")).as("max_chunks"),
          count(lit(1)).as("docs"))
    }),

    // ---- salted skew aggregation: Skew.saltedSum's two-phase plan must
    // reproduce the plain group-by exactly (algebraic recombination) —
    // the oracle IS the unsalted aggregation.
    "q73_salted_agg" -> ((s, d) => {
      Skew.saltedSum(Tables.lineitem(s, d), Seq("l_suppkey"), "l_quantity",
        "sum_qty", saltBuckets = 16)
    }),

    // ---- salted skew JOIN: fact salted into 8 sub-keys, dim replicated
    // per salt, joined on (key, salt) — a hot orderkey's lineitems
    // spread over 8 reducers instead of pinning one. The oracle is the
    // PLAIN join + aggregate: the salt must be invisible in the result,
    // which is the operator's whole contract.
    "q101_salted_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"))
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
      Skew.saltedJoin(li, o, "l_orderkey", "o_orderkey", saltBuckets = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice")), 2).as("revenue"))
    }),

    // ---- join-key skew diagnostics: the report run BEFORE choosing a
    // join strategy at scale — per-key row counts for the top hot keys
    // plus each key's skew factor (share × n_keys; 1.0 = uniform). If
    // the top factor is large, pre-salt (q101) or lean on AQE skew
    // split; if flat, a plain shuffle join is safe. One map-side-
    // combinable aggregation + a 2-row broadcast of the global stats.
    "q107_skew_diag" -> ((s, d) => {
      val keyed = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      val tot = keyed.agg(sum(col("n")).as("total"),
        count(lit(1)).as("n_keys"))
      keyed.crossJoin(broadcast(tot))
        .select(col("l_orderkey"), col("n"),
          ((col("n") * col("n_keys")).cast("double") / col("total"))
            .as("skew_factor"))
        .orderBy(col("n").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // ---- measure-then-choose skew-join PLANNER (q107 composed into a
    // decision): Skew.planJoin measures the fact key's skew factor and
    // picks salted vs plain. documents.lang is genuinely skewed
    // (factor ≈ 2.2: one language dominates), so with threshold 2.0 the
    // salted path runs — and must stay invisible: the oracle is the
    // PLAIN join + aggregate, with the decision surfaced as a column
    // the oracle recomputes from the same counts.
    "q109_skew_planner" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val dim = Tables.documents(s, d)
        .groupBy(col("lang")).agg(count(lit(1)).as("lang_docs"))
        .withColumnRenamed("lang", "dim_lang")
      val (joined, dec) = graft.operators.Skew.planJoin(
        docs, dim, "lang", "dim_lang",
        skewThreshold = 2.0, saltBuckets = 8)
      joined.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          max(col("lang_docs")).as("lang_docs"))
        .withColumn("salted", lit(dec.salted))
    }),

    // ---- chunk EMISSION with stride (q72 only counts): size-16 token
    // windows every 12 tokens (4-token overlap), materialized as rows
    // with the chunk text — the map-only projection that feeds a
    // tokenizer at 100 TB (explode of a bounded sequence; no shuffle,
    // no state; the final chunk may be short by design)
    "q103_chunk_emit" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
      docs
        .select(col("doc_id"), col("tk"),
          explode(expr("sequence(1, size(tk), 12)")).as("tok_start"))
        .select(col("doc_id"),
          expr("(tok_start - 1) div 12").as("chunk_idx"),
          col("tok_start"),
          least(col("tok_start") + 15, size(col("tk"))).as("tok_end"),
          expr("array_join(slice(tk, tok_start, 16), ' ')").as("chunk"))
    }),

    // ---- ADJACENT-CHUNK positive pairs (contrastive-pretraining data
    // prep — the pair-construction step of ICT/contriever-style
    // retrieval training): each q103 stride window paired with its
    // in-document successor as (anchor, positive); negatives come free
    // in-batch at training time, so the data op emits positives only.
    // Self-join on (doc_id, idx+1) — chunk frames carry md5 digests
    // out, never chunk text, so the exchange stays narrow.
    "q183_adjacent_pairs" -> ((s, d) => {
      val ch = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), col("tk"),
          explode(expr("sequence(1, size(tk), 12)")).as("tok_start"))
        .select(col("doc_id"),
          expr("(tok_start - 1) div 12").as("chunk_idx"),
          md5(expr("array_join(slice(tk, tok_start, 16), ' ')")
            .cast("binary")).as("h"))
      val a = ch.select(col("doc_id"), col("chunk_idx").as("anchor_idx"),
        col("h").as("anchor_md5"))
      val b = ch.select(col("doc_id").as("doc_b"),
        col("chunk_idx").as("b_idx"), col("h").as("positive_md5"))
      a.join(b, col("doc_id") === col("doc_b")
          && col("b_idx") === col("anchor_idx") + 1)
        .select(col("doc_id"), col("anchor_idx"), col("anchor_md5"),
          col("positive_md5"))
    }),

    // ---- sketch audit: HLL++ approximate distinct vs exact, with the
    // tolerance check materialized as a column. HLL register-merge is
    // order-independent, so the approximation is partitioning-stable.
    // ---- HLL MERGEABILITY audit: completes the mergeable-sketch family
    // (q121 proved Bloom/CMS merge EXACTLY; HLL distinct-count is the
    // third leg). Batches are the l_linenumber groups — parts OVERLAP on
    // l_orderkey, so the union must dedup across parts, the real
    // incremental-maintenance contract (daily batch sketches at 100 TB
    // merge into a running sketch; distinct-count queries never rescan
    // history; each sketch is KBs regardless of data size). Uses Spark's
    // native datasketches HllSketchAgg/HllUnionAgg — codegen'd, partial-
    // aggregable, no UDF. Unlike Bloom/CMS, HLL merge is NOT
    // estimate-identical — measured here: a directly-built sketch
    // estimates via the HIP accumulator (sf0.1: 147,959 for 147,236
    // exact), while a union result must fall back to the composite
    // estimator (150,443) — so the audit asserts calibrated error bands,
    // not equality: both estimates within 5% of exact, and the
    // merge-induced drift itself within 5%. Verdict columns only, never
    // raw sketch bytes (q74's rule), so the DuckDB oracle is exact
    // counts + asserted booleans.
    "q123_hll_merge_audit" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val parts = li.groupBy(col("l_linenumber"))
        .agg(expr("hll_sketch_agg(l_orderkey)").as("sk"))
      val merged = parts.agg(
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_merged"))
      val whole = li.agg(
        expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey))")
          .as("est_whole"),
        countDistinct(col("l_orderkey")).as("n_exact"))
      whole.crossJoin(merged)
        .select(col("n_exact"),
          (abs(col("est_whole") - col("n_exact"))
            <= col("n_exact") * 0.05).as("whole_within_5pct"),
          (abs(col("est_merged") - col("n_exact"))
            <= col("n_exact") * 0.05).as("merged_within_5pct"),
          (abs(col("est_merged") - col("est_whole"))
            <= col("n_exact") * 0.05).as("merge_drift_small"))
    }),

    "q74_hll_audit" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id")).as("approx_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users"))
            <= col("exact_users") * 0.1).as("within_10pct"))
    }),

    // ---- Markov transitions: (prev event -> event) counts over each
    // user's totally-ordered history — the sequence-model feature
    // extraction shape (lag window keyed by user, then a cell count).
    // ---- multimodal frame sampling: every-2nd 100-byte stripe of the
    // binary payload, checksummed. Slicing happens per-partition off the
    // scan (no payload shuffle); only (id, idx, md5) flows downstream.
    "q81_frame_sample" -> ((s, d) => {
      val assets = graft.multimodal.Multimodal
        .toAssets(s, Tables.documents(s, d))
      graft.multimodal.Multimodal.sampleFrames(s, assets, everyK = 2)
        .toDF()
        .select(col("doc_id"), col("frame_idx"),
          md5(col("frame")).as("frame_md5"))
    }),

    // ---- SQL API surface: the same engine driven through spark.sql
    // over registered views — proves the catalog/view path, not just the
    // DataFrame DSL
    "q82_sql_api" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("v_orders")
      Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
      s.sql("""
        SELECT o_orderpriority, count(*) AS n_rows,
               sum(l_quantity) AS sum_qty
        FROM v_orders JOIN v_lineitem ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        GROUP BY o_orderpriority""")
    }),

    "q75_transitions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      Tables.events(s, d)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("n"))
    }),

    // ---- NEXT-EVENT PREDICTABILITY (integer conditional surprisal):
    // q75 counts the Markov transitions; this scores how PREDICTABLE
    // each state is — per current event type, the transition-weighted
    // mean of ⌊log2(c_cur/c_pair)⌋ (the q195 bit-length idiom:
    // length(bin(c_cur div c_pair)) − 1 — no libm, parity-exact; a
    // state whose mass concentrates on one successor scores near 0, a
    // uniform 5-way fan scores near log2(5)). The floor-of-ratio
    // surprisal under-counts fractional bits (documented — it is a
    // lower bound, applied identically in both engines). One
    // transition-count frame (the q75 shape — user-partitioned lag,
    // high-cardinality keys), one type-grain fold; output is
    // state-cardinality rows.
    "q227_transition_surprisal" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      val trans = Tables.events(s, d)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val cur = trans.groupBy(col("prev_type"))
        .agg(sum(col("n")).as("n_out"),
          count(lit(1)).as("n_next_types"))
      trans.join(broadcast(cur), "prev_type")
        .select(col("prev_type"), col("n_out"), col("n_next_types"),
          (col("n") * (length(expr("bin(n_out div n)")) - 1)
            .cast("bigint")).as("wsurp"))
        .groupBy(col("prev_type"), col("n_out"), col("n_next_types"))
        .agg(sum(col("wsurp")).as("surp_sum"))
        .select(col("prev_type"), col("n_out"), col("n_next_types"),
          expr("surp_sum * 1000 div n_out").as("surprisal_x1000"))
    }),

    // ---- z-order layout audit: quantize (l_orderkey, l_partkey) to 16
    // bits each against their true maxima (one broadcast agg row),
    // interleave into a 32-bit Morton code (functions/ZOrder.scala —
    // static-shift builtins, codegen'd), bucket rows by the z prefix
    // (top 6 bits ≈ one output file each), and report each bucket's
    // 2-D bounding box. The audit IS the skipping story: a z-clustered
    // write gives every file a tight box in BOTH dims, so footer
    // min/max stats can skip files for predicates on either column —
    // single-dim sort only ever bounds one. At 100 TB this grouping is
    // `repartitionByRange(z).sortWithinPartitions(z)` before the write;
    // the audit's bucket = deterministic z-prefix so the oracle can
    // replay it with exact integer arithmetic.
    "q117_zorder_layout" -> ((s, d) => {
      import graft.functions.ZOrder
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"))
      val mx = li.agg(max(col("l_orderkey")).as("mo"),
        max(col("l_partkey")).as("mp"))
      li.crossJoin(broadcast(mx))
        .select(shiftright(ZOrder.zValue(
            ZOrder.quantize16(col("l_orderkey"), col("mo")),
            ZOrder.quantize16(col("l_partkey"), col("mp"))), 26)
            .as("zfile"),
          col("l_orderkey"), col("l_partkey"))
        .groupBy(col("zfile"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_orderkey")).as("min_ok"),
          max(col("l_orderkey")).as("max_ok"),
          min(col("l_partkey")).as("min_pk"),
          max(col("l_partkey")).as("max_pk"))
    }),

    // ---- ANALYZE-style column statistics in ONE pass: the stats a
    // cost-based optimizer (and a data-quality dashboard) needs —
    // row count, per-column min/max, exact NDV, null counts — collected
    // by a single aggregate over the fact table instead of one scan per
    // column. Scale: everything is map-combinable; the three exact
    // count-distincts expand the row 3× pre-combine (Spark's Expand),
    // which is the price of EXACT ndv — production swaps
    // approx_count_distinct per column once estimates suffice (the
    // q74/q123 HLL family is the audited version of that trade).
    // min/max doubles are raw data values (bit-exact cross-engine).
    "q151_analyze_stats" -> ((s, d) => {
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        min(col("l_quantity")).as("qty_min"),
        max(col("l_quantity")).as("qty_max"),
        countDistinct(col("l_quantity")).as("qty_ndv"),
        min(col("l_extendedprice")).as("price_min"),
        max(col("l_extendedprice")).as("price_max"),
        countDistinct(col("l_extendedprice")).as("price_ndv"),
        min(to_date(col("l_shipdate"))).as("ship_min"),
        max(to_date(col("l_shipdate"))).as("ship_max"),
        countDistinct(col("l_returnflag")).as("flag_ndv"),
        sum(when(col("l_quantity").isNull, 1L).otherwise(0L))
          .as("qty_nulls"))
    }),

    // ---- ROBUST OUTLIER DETECTION (median / MAD): the DQ monitor that
    // survives the outliers it hunts — mean/stddev gates move with the
    // anomaly, the median and the median-absolute-deviation don't. Per
    // order-priority stratum: med = percentile_disc(0.5) of
    // o_totalprice, MAD = percentile_disc(0.5) of |x − med|, and a row
    // is an outlier when |x − med| > 3·1.4826·MAD (the Gaussian-
    // consistent MAD rule), kept exact as ad·10000 > mad·44478 —
    // doubles flow only through IEEE +,−,×,compare, so both engines
    // produce identical bits (no libm). Both medians ride
    // Quantile.groupMedian (VERDICT r7 #5): o_totalprice is
    // near-unique, so the earlier (grp, value)-histogram + prefix-sum
    // form carried row-cardinality exchanges and an approxQuantile
    // scan per pass (10.0 s in-suite); the bucketed refinement is
    // three map-combined aggregates per median, rank-exact
    // (percentile_disc-identical data values), and its shuffles carry
    // only groups × buckets counts. The med/mad frames broadcast back.
    // Output: 5 stratum rows — n, med, mad, n_outliers.
    "q197_mad_outliers" -> ((s, d) => {
      val vals = Tables.orders(s, d)
        .select(col("o_orderpriority").as("grp"),
          col("o_totalprice").as("v"))
      val med = graft.operators.Quantile.groupMedian(
        vals, "grp", "v", "med")
      val dev = vals.join(broadcast(med), "grp")
        .withColumn("ad", abs(col("v") - col("med")))
      val mad = graft.operators.Quantile.groupMedian(
        dev.select(col("grp"), col("ad")), "grp", "ad", "mad")
      dev.join(broadcast(mad), "grp")
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n_rows"),
          max(col("med")).as("med"), max(col("mad")).as("mad"),
          sum(when(col("ad") * 10000 > col("mad") * 44478, 1L)
            .otherwise(0L)).as("n_outliers"))
    }),

    // ---- WINSORIZED robust mean (the action q197's detector stops
    // short of): clip o_totalprice to its stratum's exact [p05, p95]
    // and report the clipped counts + winsorized sum — the standard
    // tail-taming transform before a mean is trusted. Both fences come
    // from ONE Quantile.groupQuantiles refinement (rank-exact
    // percentile_disc data values, three map-combined aggregates — no
    // sort, no window) broadcast back over a single linear scan.
    // Determinism: fences are actual 2-decimal data values,
    // least/greatest is bit-exact IEEE, and the winsorized sum follows
    // the house round(sum-of-2-decimals, 2) rule (q02 precedent).
    "q211_winsorized_mean" -> ((s, d) => {
      val vals = Tables.orders(s, d)
        .select(col("o_orderpriority").as("grp"),
          col("o_totalprice").as("v"))
      val qs = graft.operators.Quantile.groupQuantiles(
        vals, "grp", "v", Seq(0.05 -> "p05", 0.95 -> "p95"))
      vals.join(broadcast(qs), "grp")
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n_rows"),
          max(col("p05")).as("p05"), max(col("p95")).as("p95"),
          sum(when(col("v") < col("p05"), 1L).otherwise(0L)).as("n_lo"),
          sum(when(col("v") > col("p95"), 1L).otherwise(0L)).as("n_hi"),
          round(sum(least(greatest(col("v"), col("p05")), col("p95"))), 2)
            .as("wsum"))
    }),

    // ---- MANN–WHITNEY U location-shift audit (rank-biserial): did
    // the price DISTRIBUTION move between the two customer cohorts
    // (o_custkey parity), per priority stratum? q212's chi-square
    // needs a binary outcome; U compares whole distributions with no
    // normality assumption — the nonparametric A/B read. Exact and
    // sort-free: U decomposes over the (grp, cents) value histogram as
    // U2 = Σ_v (2·cA_v·CB_<v + cA_v·cB_v) (doubled to keep the ½-tie
    // term integral), with CB_< from ONE Prefix.runningSum over the
    // histogram (two-phase — price is near-unique, so the histogram is
    // row-cardinality and a plain per-grp window would serialize 5
    // strata through 5 reducers; the q197 lesson). Cents come from
    // round(price·100) — prices are 2-decimal doubles, so the product
    // sits within 1e-9 of an integer and both engines round
    // identically. Effect size = rank-biserial rb = (U2 − na·nb) over
    // na·nb as a raw fraction (negative-safe), verdict |rb| > 0.1
    // cross-multiplied. One histogram exchange + planner-scale
    // arithmetic at any corpus size.
    // ---- BUCKETED CO-PARTITIONED JOIN (the missing leg of the
    // storage family q117/q161/q162/q174 — layout chosen so the JOIN
    // itself needs no exchange): orders and lineitem are written ONCE
    // per run as bucketed+sorted tables on their join key (8 buckets,
    // catalog-backed), and the fact-fact join then planned as a
    // sort-merge over pre-bucketed, pre-sorted scans — no shuffle, no
    // sort on either side (asserted in BucketedJoinSpec with AQE/auto-
    // broadcast pinned off: zero Exchange below the join). At 100 TB
    // this is THE recurring-pipeline trade: pay one bucketed write at
    // ingest, then every daily orderkey-grain join is shuffle-free —
    // the q148 hash-sharding story upgraded to a catalog layout the
    // PLANNER exploits. Results are layout-independent (the oracle
    // joins the raw parquet); quantities are integral doubles, so the
    // group sums are exact.
    "q223_bucketed_join" -> ((s, d) => {
      val (to, tl) = bucketedPair(s, d)
      s.table(tl)
        .join(s.table(to), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity")).as("sum_qty"))
    }),

    // ---- KRUSKAL–WALLIS k-sample rank test: do the five priority
    // strata draw o_totalprice from the same distribution? q220's
    // Mann–Whitney compares two cohorts; KW is the k-sample
    // generalization — the one-shot "is any stratum different" gate
    // run before k·(k−1)/2 pairwise tests. Exact-integer discipline:
    // tie-adjusted average ranks are half-integers, so DOUBLED ranks
    // r2(v) = 2·C_<v + c_v + 1 are exact integers from ONE global
    // prefix sum over the cents-value histogram (constant-key
    // Prefix.runningSum — the operator's single-mega-key case);
    // per-stratum doubled rank sums R2_g are exact. The statistic
    // H = 3·Σ(R2_g²/n_g)/(N(N+1)) − 3(N+1) takes one per-group floor
    // on R2_g²/n_g (documented, identical both engines, and H is
    // additionally conservative without the tie correction — both
    // biases point AWAY from false alarms). Verdict H > 9.488
    // (χ², df = 4, α = 0.05) cross-multiplied:
    // 3·Σ⌊R2_g²/n_g⌋ − 12·(N+1)²·N/... kept as the direct comparison
    // h_num > h_crit over the common positive denominator. Output:
    // one row per stratum (n_g, r2_g) carrying the global verdict.
    "q229_kruskal_wallis" -> ((s, d) => {
      // per-(grp, v) counts; global value counts re-aggregate from them
      val gv = Tables.orders(s, d)
        .select(col("o_orderpriority").as("grp"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"))
        .groupBy(col("grp"), col("v")).agg(count(lit(1)).as("cgv"))
      val vTot = gv.groupBy(col("v")).agg(sum(col("cgv")).as("cv"))
        .withColumn("k", lit(1))
      val cum = graft.operators.Prefix.runningSum(
        vTot, "k", "v", "cv", "cum_v")
      val ranked = cum
        .withColumn("r2", (col("cum_v") - col("cv")) * 2
          + col("cv") + 1)
        .select(col("v"), col("r2"))
      val rg = gv.join(ranked, "v")
        .groupBy(col("grp"))
        .agg(sum(col("cgv")).as("n_g"),
          sum(col("cgv") * col("r2")).as("r2_g"))
      val tot = rg.agg(sum(col("n_g")).as("nn"),
        // Σ ⌊R2_g² / n_g⌋ — the one documented floor, computed and
        // summed ENTIRELY in DECIMAL(38,0) (ADVICE r8): `div` returns
        // BIGINT, so both the per-group quotient (≤ 4N²·n_g) and the
        // sum (≤ 4N³) would overflow to NULL near N ≈ 2·10⁶ orders
        // while the DuckDB HUGEINT oracle stays exact. The floored
        // quotient is (r2² − r2² % n_g) / n_g: subtracting the exact
        // decimal remainder makes the division exact-integral, and an
        // exactly-divisible decimal division is rounding-free (the
        // scale-6 result has 32 integral digits — room to ~10³² ≫ the
        // 4N³ envelope at any plausible sf)
        sum(expr("CAST((CAST(r2_g AS DECIMAL(19,0)) * r2_g " +
          "- (CAST(r2_g AS DECIMAL(19,0)) * r2_g) % n_g) / n_g " +
          "AS DECIMAL(38,0))")).as("s2"))
      // H = 3·S2/(N(N+1)) − 3(N+1)  [R = R2/2 absorbed: 12·(R2/2)²=3·R2²]
      // H > 9.488 ⟺ 1000·3·S2 − 3000·(N+1)·N·(N+1) > 9488·N·(N+1).
      // S2 reaches ~N³, so it rides DECIMAL(38,0) through the
      // comparison (ADVICE r8: an 18,0 cast overflows to NULL at
      // N ≥ ~10⁶ orders under non-ANSI Spark, silently nulling the
      // verdict while the DuckDB HUGEINT oracle stays exact); the
      // remaining operands are ≤ ~N² and promote to 38 in the products
      rg.crossJoin(broadcast(tot))
        .select(col("grp"), col("n_g"), col("r2_g"),
          (lit(3000).cast("decimal(18,0)")
              * col("s2").cast("decimal(38,0)")
            - lit(3000).cast("decimal(18,0)")
              * col("nn").cast("decimal(18,0)")
              * (col("nn") + 1).cast("decimal(18,0)")
              * (col("nn") + 1).cast("decimal(18,0)") >
            lit(9488).cast("decimal(18,0)")
              * col("nn").cast("decimal(18,0)")
              * (col("nn") + 1).cast("decimal(18,0)"))
            .as("significant"))
    }),

    // ---- BENFORD leading-digit audit (fraud / synthetic-data
    // detection): the first-digit distribution of o_totalprice (at
    // exact cents, so the digit comes from an INTEGER's decimal
    // string — identical formatting in both engines; float-to-string
    // never enters) against pinned Benford expectations
    // ppm(d) = ⌊log10(1+1/d)·10⁶⌋. A fabricated or uniformly-generated
    // amount column misses the 30.1% mass on digit 1 immediately —
    // TPC-H's synthetic prices do, which is exactly what the audit is
    // for. Verdict per digit: |observed − expected| > 2 pp,
    // cross-multiplied (|n_d·10⁶ − exp·N| > 20000·N — no division).
    // One map-combined digit histogram; the 9-row report is free.
    "q228_benford_audit" -> ((s, d) => {
      val exp = Seq((1, 301029L), (2, 176091L), (3, 124938L),
        (4, 96910L), (5, 79181L), (6, 66946L), (7, 57991L),
        (8, 51152L), (9, 45757L))
      val expDf = s.createDataFrame(exp).toDF("digit", "expected_ppm")
      val h = Tables.orders(s, d)
        .select(expr("CAST(substring(CAST(CAST(round(o_totalprice " +
          "* 100) AS BIGINT) AS STRING), 1, 1) AS INT)").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val tot = h.agg(sum(col("n")).as("nn"))
      h.crossJoin(broadcast(tot)).join(broadcast(expDf), Seq("digit"))
        .select(col("digit"), col("n"), col("expected_ppm"),
          expr("n * 1000000 div nn").as("observed_ppm"),
          (abs(col("n") * 1000000L - col("expected_ppm") * col("nn"))
            > lit(20000L) * col("nn")).as("flagged"))
    }),

    // The doubled-U histogram kernel lives in
    // operators/Stats.mannWhitneyShift (PropertySpec: quadratic naive
    // equality + the exact cohort-swap antisymmetry U2(A,B) + U2(B,A)
    // = 2·na·nb); this query is the price-by-cohort instantiation.
    "q220_mannwhitney_shift" -> ((s, d) => {
      graft.operators.Stats.mannWhitneyShift(
        Tables.orders(s, d)
          .select(col("o_orderpriority").as("grp"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"),
            (col("o_custkey") % 2 === 0).as("ia")),
        "grp", "v", "ia")
    })
  )

  /** Bucketed+sorted twin tables for q223, written once per run per
    * sf dir (catalog-checked — the Shared.frame posture for a CATALOG
    * artifact): both sides bucketed by their join key into the same
    * bucket count so the sort-merge join needs neither exchange nor
    * sort. Narrow projections only — the layout carries exactly the
    * join columns.
    */
  private def bucketedPair(s: org.apache.spark.sql.SparkSession,
                           d: String): (String, String) = {
    val tag = math.abs(d.hashCode).toString
    val (to, tl) = (s"g_ord_bucketed_$tag", s"g_li_bucketed_$tag")
    if (!s.catalog.tableExists(to)) {
      purgeStaleLocation(s, to)
      Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(to)
    }
    if (!s.catalog.tableExists(tl)) {
      purgeStaleLocation(s, tl)
      Tables.lineitem(s, d).select("l_orderkey", "l_quantity")
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(tl)
    }
    (to, tl)
  }

  /** A managed table the CATALOG has forgotten (the derby metastore is
    * run-scoped and gitignored) can still leave its warehouse directory
    * behind, and CREATE TABLE then refuses the orphan location. These
    * tables are run-scoped artifacts, not durable data — delete the
    * stale location so the rebuild is idempotent across JVMs.
    */
  private def purgeStaleLocation(s: org.apache.spark.sql.SparkSession,
                                 table: String): Unit = {
    val wh = java.net.URI.create(
      s.sessionState.conf.warehousePath).getPath
    val dir = java.nio.file.Paths.get(wh, table)
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  /** DuckDB mirror of ZOrder.spread16 (5 mask-shift doublings). The
    * nesting doubles the operand text per step — fine for a short
    * column name.
    */
  private def spreadSql(x: String): String = {
    val s0 = s"($x & 65535)"
    val s1 = s"(($s0 | ($s0 << 8)) & 16711935)"
    val s2 = s"(($s1 | ($s1 << 4)) & 252645135)"
    val s3 = s"(($s2 | ($s2 << 2)) & 858993459)"
    s"(($s3 | ($s3 << 1)) & 1431655765)"
  }

  val oracle: Map[String, String] = Map(
    "q179_encoding_advisor" ->
      """SELECT c AS column_name, n_rows, ndv,
        |  (ndv * 20 <= n_rows) AS dictionary_encode
        |FROM (
        |  SELECT 'l_returnflag' AS c, count(*) AS n_rows,
        |    CAST(count(DISTINCT l_returnflag) AS BIGINT) AS ndv
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_linestatus', count(*),
        |    CAST(count(DISTINCT l_linestatus) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_partkey', count(*),
        |    CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', count(*),
        |    CAST(count(DISTINCT l_extendedprice) AS BIGINT)
        |  FROM lineitem)""".stripMargin,

    "q180_fk_discovery" ->
      """SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS candidate,
        |  (SELECT count(DISTINCT l_orderkey) FROM lineitem)
        |    AS n_child_distinct,
        |  (SELECT count(DISTINCT l_orderkey) FROM lineitem
        |    WHERE l_orderkey IN (SELECT o_orderkey FROM orders))
        |    AS n_contained,
        |  (SELECT count(DISTINCT l_orderkey) FROM lineitem)
        |    = (SELECT count(DISTINCT l_orderkey) FROM lineitem
        |       WHERE l_orderkey IN (SELECT o_orderkey FROM orders))
        |    AS inclusion_holds
        |UNION ALL
        |SELECT 'lineitem.l_partkey->part.p_partkey',
        |  (SELECT count(DISTINCT l_partkey) FROM lineitem),
        |  (SELECT count(DISTINCT l_partkey) FROM lineitem
        |    WHERE l_partkey IN (SELECT p_partkey FROM part)),
        |  (SELECT count(DISTINCT l_partkey) FROM lineitem)
        |    = (SELECT count(DISTINCT l_partkey) FROM lineitem
        |       WHERE l_partkey IN (SELECT p_partkey FROM part))
        |UNION ALL
        |SELECT 'orders.o_custkey->customer.c_custkey',
        |  (SELECT count(DISTINCT o_custkey) FROM orders),
        |  (SELECT count(DISTINCT o_custkey) FROM orders
        |    WHERE o_custkey IN (SELECT c_custkey FROM customer)),
        |  (SELECT count(DISTINCT o_custkey) FROM orders)
        |    = (SELECT count(DISTINCT o_custkey) FROM orders
        |       WHERE o_custkey IN (SELECT c_custkey FROM customer))
        |UNION ALL
        |SELECT 'orders.o_custkey->supplier.s_suppkey',
        |  (SELECT count(DISTINCT o_custkey) FROM orders),
        |  (SELECT count(DISTINCT o_custkey) FROM orders
        |    WHERE o_custkey IN (SELECT s_suppkey FROM supplier)),
        |  (SELECT count(DISTINCT o_custkey) FROM orders)
        |    = (SELECT count(DISTINCT o_custkey) FROM orders
        |       WHERE o_custkey IN (SELECT s_suppkey FROM supplier))""".stripMargin,

    "q172_cdc_to_scd2" ->
      """SELECT user_id, event_id,
        |  epoch_ns(ts) // 1000 AS valid_from, event_type AS attr,
        |  lead(epoch_ns(ts) // 1000, 1) OVER (PARTITION BY user_id
        |    ORDER BY epoch_ns(ts) // 1000 ASC, event_id ASC)
        |    AS valid_to,
        |  (lead(epoch_ns(ts) // 1000, 1) OVER (PARTITION BY user_id
        |    ORDER BY epoch_ns(ts) // 1000 ASC, event_id ASC) IS NULL)
        |    AS is_current
        |FROM events""".stripMargin,

    "q167_table_checksum" ->
      """SELECT source, count(*) AS n_rows,
        |  CAST(sum(CAST(concat('0x', substr(md5(concat_ws('|', doc_id,
        |    lang, source, n_chars, md5(text))), 1, 8)) AS BIGINT))
        |    AS BIGINT) AS checksum
        |FROM documents GROUP BY source""".stripMargin,

    "q168_fk_fanout" ->
      """WITH f AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS fanout
        |  FROM lineitem GROUP BY 1)
        |SELECT fanout, count(*) AS n_orders,
        |  fanout * count(*) AS n_rows
        |FROM f GROUP BY fanout""".stripMargin,

    // exact discrete percentiles replayed; the sketch verdicts are
    // pinned TRUE — an estimate outside its RANK-guarantee bracket
    // (value-at-rank at p ∓ 1/accuracy) fails the hash (the q74 idiom)
    "q160_quantile_sketch_audit" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  quantile_disc(l_extendedprice, 0.25) AS p25,
        |  quantile_disc(l_extendedprice, 0.50) AS p50,
        |  quantile_disc(l_extendedprice, 0.75) AS p75,
        |  quantile_disc(l_extendedprice, 0.95) AS p95,
        |  TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok, TRUE AS p95_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q175_scalable_percentile" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  quantile_disc(l_extendedprice, 0.50) AS p50,
        |  quantile_disc(l_extendedprice, 0.95) AS p95
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q161_compaction_plan" ->
      """WITH f AS (
        |  SELECT source, doc_id // 8 AS file_id,
        |    CAST(sum(n_chars) AS BIGINT) AS bytes
        |  FROM documents GROUP BY 1, 2),
        |w AS (
        |  SELECT source, file_id, bytes,
        |    CAST(coalesce(sum(bytes) OVER (PARTITION BY source
        |      ORDER BY bytes DESC, file_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_before
        |  FROM f)
        |SELECT source, cum_before // 20000 AS bin,
        |  count(*) AS n_files, CAST(sum(bytes) AS BIGINT) AS bin_bytes,
        |  max(bytes) AS max_file_bytes
        |FROM w GROUP BY 1, 2""".stripMargin,

    "q162_zonemap_audit" ->
      """WITH li AS (
        |  SELECT CAST(l_shipdate AS DATE) AS sd, l_orderkey
        |  FROM lineitem),
        |fa AS (
        |  SELECT l_orderkey // 1024 AS file_id, min(sd) AS mn,
        |    max(sd) AS mx, count(*) AS n_rows,
        |    sum(CASE WHEN sd BETWEEN DATE '1997-01-01'
        |      AND DATE '1997-06-30' THEN 1 ELSE 0 END) AS n_match
        |  FROM li GROUP BY 1),
        |fc AS (
        |  SELECT CAST(year(sd) * 100 + month(sd) AS BIGINT) AS file_id,
        |    min(sd) AS mn, max(sd) AS mx, count(*) AS n_rows,
        |    sum(CASE WHEN sd BETWEEN DATE '1997-01-01'
        |      AND DATE '1997-06-30' THEN 1 ELSE 0 END) AS n_match
        |  FROM li GROUP BY 1)
        |SELECT 'arrival' AS layout, count(*) AS n_files,
        |  CAST(sum(CASE WHEN mx < DATE '1997-01-01'
        |    OR mn > DATE '1997-06-30' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_pruned,
        |  CAST(sum(CASE WHEN NOT (mx < DATE '1997-01-01'
        |    OR mn > DATE '1997-06-30') THEN n_rows ELSE 0 END)
        |    AS BIGINT) AS rows_scanned,
        |  CAST(sum(n_match) AS BIGINT) AS rows_matching
        |FROM fa
        |UNION ALL
        |SELECT 'clustered' AS layout, count(*) AS n_files,
        |  CAST(sum(CASE WHEN mx < DATE '1997-01-01'
        |    OR mn > DATE '1997-06-30' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_pruned,
        |  CAST(sum(CASE WHEN NOT (mx < DATE '1997-01-01'
        |    OR mn > DATE '1997-06-30') THEN n_rows ELSE 0 END)
        |    AS BIGINT) AS rows_scanned,
        |  CAST(sum(n_match) AS BIGINT) AS rows_matching
        |FROM fc""".stripMargin,

    "q151_analyze_stats" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  min(l_quantity) AS qty_min,
        |  max(l_quantity) AS qty_max,
        |  CAST(count(DISTINCT l_quantity) AS BIGINT) AS qty_ndv,
        |  min(l_extendedprice) AS price_min,
        |  max(l_extendedprice) AS price_max,
        |  CAST(count(DISTINCT l_extendedprice) AS BIGINT) AS price_ndv,
        |  min(CAST(l_shipdate AS DATE)) AS ship_min,
        |  max(CAST(l_shipdate AS DATE)) AS ship_max,
        |  CAST(count(DISTINCT l_returnflag) AS BIGINT) AS flag_ndv,
        |  CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS qty_nulls
        |FROM lineitem""".stripMargin,

    "q117_zorder_layout" ->
      s"""WITH mx AS (SELECT max(l_orderkey) AS mo, max(l_partkey) AS mp
        |    FROM lineitem),
        |q AS (SELECT
        |    (l_orderkey * 65536) // (mo + 1) AS qa,
        |    (l_partkey * 65536) // (mp + 1) AS qb,
        |    l_orderkey, l_partkey
        |  FROM lineitem, mx),
        |z AS (SELECT
        |    (${spreadSql("qa")} | (${spreadSql("qb")} << 1)) >> 26
        |      AS zfile,
        |    l_orderkey, l_partkey
        |  FROM q)
        |SELECT zfile, count(*) AS n_rows,
        |  min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
        |  min(l_partkey) AS min_pk, max(l_partkey) AS max_pk
        |FROM z GROUP BY zfile""".stripMargin,

    "q65_tfidf_top" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT tok, count(*) AS df
        |  FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok)
        |SELECT doc_id, tok, tf, df FROM (
        |  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.tok ASC) AS rn
        |  FROM tf JOIN df ON tf.tok = df.tok)
        |WHERE rn = 1""".stripMargin,

    "q66_snapshot_diff" ->
      """WITH old AS (
        |  SELECT o_orderkey AS k, o_totalprice AS v_old FROM orders
        |  WHERE o_orderkey % 7 <> 0),
        |neu AS (
        |  SELECT o_orderkey AS k,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 10.0
        |         ELSE o_totalprice END AS v_new
        |  FROM orders WHERE o_orderkey % 11 <> 0)
        |SELECT COALESCE(old.k, neu.k) AS k,
        |  CASE WHEN old.k IS NULL THEN 'added'
        |       WHEN neu.k IS NULL THEN 'removed'
        |       WHEN v_old <> v_new THEN 'changed' END AS change,
        |  v_old, v_new
        |FROM old FULL OUTER JOIN neu ON old.k = neu.k
        |WHERE CASE WHEN old.k IS NULL THEN 'added'
        |       WHEN neu.k IS NULL THEN 'removed'
        |       WHEN v_old <> v_new THEN 'changed' END IS NOT NULL""".stripMargin,

    "q67_scd2_snapshot" ->
      """WITH dim AS (
        |  SELECT f.emp_id, f.start_date, o.end_date FROM
        |    (SELECT o_custkey AS emp_id,
        |       min(CAST(o_orderdate AS DATE)) AS start_date
        |     FROM orders WHERE o_orderstatus = 'F' GROUP BY 1) f
        |  LEFT JOIN
        |    (SELECT o_custkey AS emp_id,
        |       min(CAST(o_orderdate AS DATE)) AS end_date
        |     FROM orders WHERE o_orderstatus = 'O' GROUP BY 1) o
        |  ON f.emp_id = o.emp_id),
        |probes AS (SELECT CAST(unnest([
        |  '1995-12-31', '1996-12-31', '1997-12-31', '1998-12-31',
        |  '1999-12-31', '2000-12-31']) AS DATE) AS p)
        |SELECT p AS snapshot_date, count(*) AS headcount
        |FROM dim JOIN probes
        |  ON start_date <= p AND (end_date IS NULL OR p < end_date)
        |GROUP BY p""".stripMargin,

    "q68_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us
        |  FROM events),
        |s1 AS (SELECT user_id, min(ts_us) AS t1 FROM ev
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT ev.user_id, min(ts_us) AS t2 FROM ev
        |  JOIN s1 ON ev.user_id = s1.user_id
        |  WHERE event_type = 'click' AND ts_us > t1 GROUP BY ev.user_id),
        |s3 AS (SELECT ev.user_id, min(ts_us) AS t3 FROM ev
        |  JOIN s2 ON ev.user_id = s2.user_id
        |  WHERE event_type = 'purchase' AND ts_us > t2 GROUP BY ev.user_id)
        |SELECT (SELECT count(*) FROM s1) AS n_signup,
        |  (SELECT count(*) FROM s2) AS n_click,
        |  (SELECT count(*) FROM s3) AS n_purchase""".stripMargin,

    "q69_retention" ->
      """WITH ev AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk FROM events),
        |cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM ev
        |  GROUP BY user_id)
        |SELECT epoch_us(cohort_wk) AS cohort_us,
        |  CAST(date_diff('day', CAST(cohort_wk AS DATE), CAST(wk AS DATE))
        |    // 7 AS INT) AS week_offset,
        |  count(*) AS users
        |FROM ev JOIN cohort ON ev.user_id = cohort.user_id
        |GROUP BY 1, 2""".stripMargin,

    "q70_edit_distance" ->
      """WITH d AS (SELECT doc_id, lang, source, substr(text, 1, 40) AS p
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.p, b.p) AS INT) AS dist
        |FROM d a JOIN d b
        |  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.p, b.p) <= 10""".stripMargin,

    "q97_edit_banded" ->
      """WITH d AS (SELECT doc_id, lang, source, text, length(text) AS len,
        |    length(text) // 16 AS band FROM documents),
        |r AS (SELECT doc_id, lang, source, text, len,
        |    unnest([band - 1, band, band + 1]) AS probe FROM d),
        |cand AS (SELECT l.doc_id AS id_a, r.doc_id AS id_b,
        |    l.text AS t_a, r.text AS t_b
        |  FROM d l JOIN r
        |    ON l.lang = r.lang AND l.source = r.source
        |      AND l.band = r.probe
        |      AND l.doc_id < r.doc_id AND abs(l.len - r.len) <= 10)
        |SELECT id_a, id_b, CAST(levenshtein(t_a, t_b) AS INT) AS dist
        |FROM cand
        |WHERE levenshtein(t_a, t_b) <= 10""".stripMargin,

    "q71_pii_redact" ->
      """SELECT c_custkey,
        |  regexp_replace(c_name, '[0-9]', 'X', 'g') AS redacted,
        |  CAST(length(c_name)
        |    - length(regexp_replace(c_name, '[0-9]', '', 'g')) AS INT)
        |    AS n_digits
        |FROM customer""".stripMargin,

    "q72_chunk_plan" ->
      """SELECT source,
        |  CAST(sum(chunks) AS BIGINT) AS total_chunks,
        |  max(chunks) AS max_chunks, count(*) AS docs
        |FROM (SELECT source,
        |    CAST(ceil(len(string_split(text, ' ')) / 16.0) AS BIGINT)
        |      AS chunks
        |  FROM documents)
        |GROUP BY source""".stripMargin,

    "q73_salted_agg" ->
      """SELECT l_suppkey, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY l_suppkey""".stripMargin,

    // the PLAIN join: the salt must be invisible in the result
    "q101_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "q107_skew_diag" ->
      """WITH k AS (SELECT l_orderkey, count(*) AS n FROM lineitem
        |  GROUP BY l_orderkey),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total,
        |    count(*) AS n_keys FROM k)
        |SELECT l_orderkey, n,
        |  CAST(n * n_keys AS DOUBLE) / total AS skew_factor
        |FROM k, t
        |ORDER BY n DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,

    // the PLAIN join; `salted` recomputed from the same per-key counts
    // (max(n)·n_keys/total is a double product of exact ints + one
    // division — bit-stable cross-engine below 2^53)
    "q109_skew_planner" ->
      """WITH k AS (SELECT lang, count(*) AS n FROM documents
        |  GROUP BY lang),
        |t AS (SELECT CAST(max(n) AS DOUBLE) * count(*) / sum(n) >= 2.0
        |    AS salted FROM k)
        |SELECT d.lang, count(*) AS n_docs,
        |  CAST(sum(d.n_chars) AS BIGINT) AS total_chars,
        |  max(k.n) AS lang_docs, t.salted AS salted
        |FROM documents d JOIN k ON d.lang = k.lang, t
        |GROUP BY d.lang, t.salted""".stripMargin,

    "q183_adjacent_pairs" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk
        |  FROM documents),
        |st AS (SELECT doc_id, tk,
        |    unnest(generate_series(1, len(tk), 12)) AS tok_start
        |  FROM d),
        |c AS (SELECT doc_id, (tok_start - 1) // 12 AS chunk_idx,
        |    md5(array_to_string(
        |      list_slice(tk, tok_start, tok_start + 15), ' ')) AS h
        |  FROM st)
        |SELECT a.doc_id, a.chunk_idx AS anchor_idx,
        |  a.h AS anchor_md5, b.h AS positive_md5
        |FROM c a JOIN c b
        |  ON a.doc_id = b.doc_id AND b.chunk_idx = a.chunk_idx + 1"""
        .stripMargin,

    "q103_chunk_emit" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk
        |  FROM documents),
        |st AS (SELECT doc_id, tk,
        |    unnest(generate_series(1, len(tk), 12)) AS tok_start
        |  FROM d)
        |SELECT doc_id,
        |  CAST((tok_start - 1) // 12 AS BIGINT) AS chunk_idx,
        |  CAST(tok_start AS INT) AS tok_start,
        |  CAST(least(tok_start + 15, len(tk)) AS INT) AS tok_end,
        |  array_to_string(list_slice(tk, tok_start, tok_start + 15), ' ')
        |    AS chunk
        |FROM st""".stripMargin,

    // the oracle asserts the tolerance HOLDS — a sketch drifting past
    // 10% on 150-cardinality groups would be a real defect
    "q74_hll_audit" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  TRUE AS within_10pct
        |FROM events GROUP BY event_type""".stripMargin,

    "q123_hll_merge_audit" ->
      """SELECT count(DISTINCT l_orderkey) AS n_exact,
        |  TRUE AS whole_within_5pct,
        |  TRUE AS merged_within_5pct,
        |  TRUE AS merge_drift_small
        |FROM lineitem""".stripMargin,

    "q81_frame_sample" ->
      """SELECT doc_id, CAST(i AS INT) AS frame_idx,
        |  md5(substr(text, CAST(i * 100 + 1 AS INT), 100)) AS frame_md5
        |FROM documents,
        |  unnest(generate_series(0, length(text) // 100, 2)) AS t(i)""".stripMargin,

    "q82_sql_api" ->
      """SELECT o_orderpriority, count(*) AS n_rows,
        |  sum(l_quantity) AS sum_qty
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |GROUP BY o_orderpriority""".stripMargin,

    "q75_transitions" ->
      """WITH seq AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts) // 1000 ASC, event_id ASC) AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type, count(*) AS n FROM seq
        |WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, event_type""".stripMargin,

    "q227_transition_surprisal" ->
      """WITH seq AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts) // 1000 ASC, event_id ASC)
        |      AS prev_type
        |  FROM events),
        |t AS (SELECT prev_type, event_type,
        |    CAST(count(*) AS BIGINT) AS n FROM seq
        |  WHERE prev_type IS NOT NULL
        |  GROUP BY prev_type, event_type),
        |c AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS n_out,
        |    CAST(count(*) AS BIGINT) AS n_next_types
        |  FROM t GROUP BY prev_type)
        |SELECT t.prev_type AS prev_type, max(c.n_out) AS n_out,
        |  max(c.n_next_types) AS n_next_types,
        |  (CAST(sum(t.n * (length(bin(c.n_out // t.n)) - 1)) AS BIGINT)
        |    * 1000) // max(c.n_out) AS surprisal_x1000
        |FROM t JOIN c ON t.prev_type = c.prev_type
        |GROUP BY t.prev_type""".stripMargin,

    // percentile_disc is DuckDB's exact discrete quantile — the value at
    // rank ceil(p·n), the same point the histogram conditional-min picks
    "q197_mad_outliers" ->
      """WITH v AS (SELECT o_orderpriority AS grp, o_totalprice AS v
        |  FROM orders),
        |med AS (SELECT grp,
        |    percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS med
        |  FROM v GROUP BY grp),
        |dev AS (SELECT v.grp, v.v, med.med, abs(v.v - med.med) AS ad
        |  FROM v JOIN med USING (grp)),
        |mad AS (SELECT grp,
        |    percentile_disc(0.5) WITHIN GROUP (ORDER BY ad) AS mad
        |  FROM dev GROUP BY grp)
        |SELECT dev.grp AS grp, count(*) AS n_rows, max(dev.med) AS med,
        |  max(mad.mad) AS mad,
        |  CAST(coalesce(sum(CASE WHEN dev.ad * 10000 > mad.mad * 44478
        |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_outliers
        |FROM dev JOIN mad ON dev.grp = mad.grp
        |GROUP BY dev.grp""".stripMargin,

    "q211_winsorized_mean" ->
      """WITH v AS (SELECT o_orderpriority AS grp, o_totalprice AS v
        |  FROM orders),
        |q AS (SELECT grp,
        |    percentile_disc(0.05) WITHIN GROUP (ORDER BY v) AS p05,
        |    percentile_disc(0.95) WITHIN GROUP (ORDER BY v) AS p95
        |  FROM v GROUP BY grp)
        |SELECT v.grp AS grp, count(*) AS n_rows,
        |  max(q.p05) AS p05, max(q.p95) AS p95,
        |  CAST(sum(CASE WHEN v.v < q.p05 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_lo,
        |  CAST(sum(CASE WHEN v.v > q.p95 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hi,
        |  round(sum(least(greatest(v.v, q.p05), q.p95)), 2) AS wsum
        |FROM v JOIN q USING (grp)
        |GROUP BY v.grp""".stripMargin,

    "q223_bucketed_join" ->
      """SELECT o.o_orderpriority, count(*) AS n_rows,
        |  sum(l.l_quantity) AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderpriority""".stripMargin,

    "q229_kruskal_wallis" ->
      """WITH gv AS (SELECT o_orderpriority AS grp,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS cgv
        |  FROM orders GROUP BY 1, 2),
        |vt AS (SELECT v, CAST(sum(cgv) AS BIGINT) AS cv FROM gv
        |  GROUP BY v),
        |c AS (SELECT v, cv, CAST(sum(cv) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_v
        |  FROM vt),
        |r AS (SELECT v, (cum_v - cv) * 2 + cv + 1 AS r2 FROM c),
        |rg AS (SELECT grp, CAST(sum(cgv) AS BIGINT) AS n_g,
        |    CAST(sum(cgv * r2) AS BIGINT) AS r2_g
        |  FROM gv JOIN r USING (v) GROUP BY grp),
        |t AS (SELECT CAST(sum(n_g) AS BIGINT) AS nn,
        |    sum((CAST(r2_g AS HUGEINT) * r2_g) // n_g) AS s2
        |  FROM rg)
        |SELECT grp, n_g, r2_g,
        |  3000 * CAST(s2 AS HUGEINT)
        |      - 3000 * CAST(nn AS HUGEINT) * (nn + 1) * (nn + 1)
        |    > 9488 * CAST(nn AS HUGEINT) * (nn + 1) AS significant
        |FROM rg, t""".stripMargin,

    "q228_benford_audit" ->
      """WITH e(digit, expected_ppm) AS (VALUES
        |    (1, CAST(301029 AS BIGINT)), (2, 176091), (3, 124938),
        |    (4, 96910), (5, 79181), (6, 66946), (7, 57991),
        |    (8, 51152), (9, 45757)),
        |h AS (SELECT CAST(substring(CAST(CAST(round(o_totalprice
        |      * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM h)
        |SELECT h.digit, h.n, e.expected_ppm,
        |  (h.n * 1000000) // t.nn AS observed_ppm,
        |  abs(h.n * 1000000 - e.expected_ppm * t.nn) > 20000 * t.nn
        |    AS flagged
        |FROM h, t JOIN e ON h.digit = e.digit""".stripMargin,

    "q220_mannwhitney_shift" ->
      """WITH h AS (SELECT o_orderpriority AS grp,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |    CAST(sum(CASE WHEN o_custkey % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN o_custkey % 2 <> 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS cb
        |  FROM orders GROUP BY 1, 2),
        |c AS (SELECT grp, v, ca, cb,
        |    CAST(sum(cb) OVER (PARTITION BY grp ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_b
        |  FROM h),
        |g AS (SELECT grp, CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb,
        |    CAST(sum(ca * (cum_b - cb) * 2 + ca * cb) AS BIGINT) AS u2
        |  FROM c GROUP BY grp)
        |SELECT grp, na, nb, u2,
        |  u2 - na * nb AS rb_num, na * nb AS rb_den,
        |  abs(u2 - na * nb) * 10 > na * nb AS shifted
        |FROM g""".stripMargin
  )
}
