package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Smoke + invariant checks for every SparkEntry query on sf0.001.
  * (Exact value parity vs DuckDB runs via tools/check_parity.py and the
  * driver's own gate; here we assert structural invariants.)
  */
class QueriesSpec extends AnyFunSuite with SparkSpec {

  test("every query runs and every query has an oracle") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      // every query is non-empty even at smoke scale (verified against
      // the sf0.001 dumps) — an empty result is a regression
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
    }
    val missing = qs.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q124 classifier: keep tracks the score sign, scoring is " +
    "deterministic, and every doc is scored") {
    val out = SparkEntry.queries("q124_quality_classifier")(spark, sf)
    val rows = out.collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getBoolean(2) == (r.getLong(1) >= 0L))
    }
    val again = SparkEntry.queries("q124_quality_classifier")(spark, sf)
      .collect()
    assert(rows.map(_.toString).sorted.toSeq
      == again.map(_.toString).sorted.toSeq)
  }

  test("q147 gopher gate: fractions well-formed, keep matches the rule") {
    val rows = SparkEntry.queries("q147_gopher_repetition")(spark, sf)
      .collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val Seq(nToks, top2, nb2, top3, nb3, top4, nb4) =
        (1 to 7).map(r.getLong)
      // gram totals shrink by one per extra gram length; tops bounded
      assert(nb2 == math.max(nToks - 1, 0), r.toString)
      assert(nb3 == math.max(nToks - 2, 0))
      assert(nb4 == math.max(nToks - 3, 0))
      assert(top2 <= nb2 && top3 <= nb3 && top4 <= nb4)
      assert(r.getBoolean(8) ==
        (top2 * 100 <= nb2 * 20 && top3 * 100 <= nb3 * 18
          && top4 * 100 <= nb4 * 16))
    }
  }

  test("q148 epoch shuffle: a permutation — every doc once, contiguous " +
    "pos per shard, deterministic across runs") {
    val out = SparkEntry.queries("q148_epoch_shuffle")(spark, sf).collect()
    assert(out.length == Tables.documents(spark, sf).count())
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    out.groupBy(_.getLong(2)).foreach { case (_, rows) =>
      val pos = rows.map(_.getLong(3)).sorted
      assert(pos.head == 1L && pos.last == pos.length.toLong,
        "pos not contiguous from 1 within shard")
    }
    val again = SparkEntry.queries("q148_epoch_shuffle")(spark, sf)
      .collect()
    assert(out.map(_.toString).sorted.toSeq
      == again.map(_.toString).sorted.toSeq)
  }

  test("q149 split leakage: pair counts conserve the LSH pair total") {
    val total = SparkEntry.queries("q21_minhash_pairs")(spark, sf).count()
    val audit = SparkEntry.queries("q149_split_leakage")(spark, sf)
      .collect()
    assert(audit.map(_.getLong(2)).sum == total)
    audit.foreach { r =>
      assert(r.getBoolean(3) == (r.getString(0) != r.getString(1)))
    }
  }

  test("q150 star revenue: rows only for the filtered region's " +
    "nations, positive counts and revenue") {
    val out = SparkEntry.queries("q150_star_revenue")(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 5) // ASIA has 5 nations
    out.foreach { r => assert(r.getLong(1) > 0 && r.getDouble(2) > 0) }
    val asiaNations = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(out.map(_.getString(0)).toSet.subsetOf(asiaNations))
  }

  test("q151 analyze stats: one row, bounds ordered, ndv sane") {
    val r = SparkEntry.queries("q151_analyze_stats")(spark, sf)
      .collect().head
    val nRows = r.getLong(0)
    assert(nRows == Tables.lineitem(spark, sf).count())
    assert(r.getDouble(1) <= r.getDouble(2)) // qty min <= max
    assert(r.getDouble(4) <= r.getDouble(5)) // price min <= max
    assert(r.getLong(3) <= nRows && r.getLong(6) <= nRows)
    assert(r.getLong(9) >= 1 && r.getLong(9) <= 3) // returnflag ndv
    assert(r.getLong(10) == 0) // no null quantities in testdata
  }

  test("q152 centering: every doc kept, digest + l1 match an " +
    "independent recompute, residual per-dim mass in [0, n)") {
    // the query ships md5(centered vector) instead of the raw array
    // (house rule: no array/struct output columns), so the floor-mean
    // identity is checked on an independent driver-side recompute and
    // the digests pin the query to it element-for-element
    val out = SparkEntry.queries("q152_embed_center")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6).toLong)))
    val n = vecs.length
    assert(out.size == n)
    val dims = vecs.head._2.length
    val means = (0 until dims).map { i =>
      val sx = vecs.map(_._2(i)).sum
      math.floor(sx.toDouble / n).toLong
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    vecs.foreach { case (id, qv) =>
      val cv = qv.zip(means).map { case (x, m) => x - m }
      val hex = md.digest(cv.mkString(",").getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      assert(out(id) == ((hex, cv.map(math.abs).sum)), s"vec $id")
    }
    // sum_d(centered) = sx - n*floor(sx/n) ∈ [0, n) for every dimension
    (0 until dims).foreach { i =>
      val s = vecs.map(_._2(i) - means(i)).sum
      assert(s >= 0 && s < n, s"dim $i residual $s out of [0, $n)")
    }
  }

  test("q153 retrieval metrics: bounds and internal consistency") {
    val r = SparkEntry.queries("q153_retrieval_metrics")(spark, sf)
      .collect().head
    val (hits, mrr, dcg, nRelTotal, idcg, ndcg) =
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getDouble(6))
    assert(hits >= 0 && hits <= 10)
    if (hits > 0) assert(mrr >= 100000L && mrr <= 1000000L)
    else assert(mrr == 0L)
    assert(dcg <= idcg && ndcg >= 0.0 && ndcg <= 1.0)
    val expectRel = Tables.embeddings(spark, sf).collect()
    val ql = expectRel.find(_.getLong(0) == 0L).get.getInt(2)
    assert(nRelTotal ==
      expectRel.count(x => x.getLong(0) != 0L && x.getInt(2) == ql))
  }

  test("q154 centroid refresh: k x 64 cells, untouched cells identical, " +
    "batch mass conserved per dimension") {
    val out = SparkEntry.queries("q154_centroid_refresh")(spark, sf)
      .collect()
    assert(out.length == 8 * 64)
    out.foreach { r =>
      if (r.getLong(4) == 0L) assert(r.getLong(2) == r.getLong(3),
        s"untouched cell moved: $r")
    }
    val batchN = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 10 === 7).count()
    out.groupBy(_.getInt(1)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(4)).sum == batchN)
    }
  }

  test("q155 datasheet: strata cover the corpus exactly, ledger sane") {
    val out = SparkEntry.queries("q155_corpus_datasheet")(spark, sf)
      .collect()
    assert(out.map(_.getLong(2)).sum ==
      Tables.documents(spark, sf).count())
    out.foreach { r =>
      val (nDocs, nUnique, dup) = (r.getLong(2), r.getLong(5), r.getLong(6))
      assert(nUnique >= 1 && nUnique <= nDocs && dup == nDocs - nUnique)
      assert(r.getDouble(8) > 0.0 && r.getDouble(8) <= 1.0)
    }
  }

  test("q156 rate spike: hourly counts conserve events, spikes only " +
    "with a full 3-hour baseline and the 1.5x rule") {
    val out = SparkEntry.queries("q156_rate_spike")(spark, sf).collect()
    assert(out.map(_.getLong(2)).sum == Tables.events(spark, sf).count())
    out.foreach { r =>
      val (n, trailSum, trailN, spike) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))
      assert(trailN >= 0 && trailN <= 3)
      assert(spike == (trailN == 3 && n * 2 >= trailSum))
    }
  }

  test("q157 norm audit: buckets cover every vector, bit-length bounds " +
    "hold") {
    val out = SparkEntry.queries("q157_norm_audit")(spark, sf).collect()
    assert(out.map(_.getLong(1)).sum ==
      Tables.embeddings(spark, sf).count())
    out.foreach { r =>
      val (bits, minN2, maxN2) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(minN2 <= maxN2)
      // bit length of both extremes must be the bucket's bit count
      assert(java.lang.Long.toBinaryString(math.max(minN2, 0L)).length
        == bits.toInt || minN2 == 0L && bits == 1L)
      assert(java.lang.Long.toBinaryString(math.max(maxN2, 1L)).length
        == bits.toInt || maxN2 == 0L && bits == 1L)
    }
  }

  test("q158 forget audit: tombstone ledger balances across surfaces") {
    val r = SparkEntry.queries("q158_forget_audit")(spark, sf)
      .collect().head
    val (nTomb, nVec, nPairs, nAfter) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val total = Tables.documents(spark, sf).count()
    assert(nTomb > 0 && nAfter == total - nTomb)
    // embeddings share the id space 1:1 on this data
    assert(nVec == nTomb)
    val allPairs = SparkEntry.queries("q21_minhash_pairs")(spark, sf)
      .count()
    assert(nPairs >= 0 && nPairs <= allPairs)
  }

  test("q159 ivf-pq: recall well-formed, deterministic across runs") {
    val r = SparkEntry.queries("q159_ivfpq_recall")(spark, sf)
      .collect().head
    val (k, hits, recall) = (r.getInt(0), r.getLong(1), r.getDouble(2))
    assert(k == 10 && hits >= 0 && hits <= 10)
    assert(recall == hits.toDouble / 10)
    val again = SparkEntry.queries("q159_ivfpq_recall")(spark, sf)
      .collect().head
    assert(again.getLong(1) == hits)
  }

  test("q160 quantile sketch audit: percentiles ordered, drawn from the " +
    "data, and every sketch verdict within tolerance") {
    val out = SparkEntry.queries("q160_quantile_sketch_audit")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice")).collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(1)).toSet).toMap
    out.foreach { r =>
      val ps = (2 to 5).map(r.getDouble)
      assert(ps == ps.sorted, s"percentiles not ordered: $r")
      // discrete percentiles are actual group members, never interpolated
      ps.foreach(p => assert(li(r.getString(0)).contains(p)))
      (6 to 9).foreach(i => assert(r.getBoolean(i),
        s"sketch out of tolerance: $r"))
    }
  }

  test("q161 compaction plan: files and bytes conserve, bins contiguous " +
    "from 0 per source") {
    val out = SparkEntry.queries("q161_compaction_plan")(spark, sf)
      .collect()
    val files = Tables.documents(spark, sf)
      .groupBy(col("source"), expr("doc_id div 8")).count()
    assert(out.map(_.getLong(2)).sum == files.count())
    assert(out.map(_.getLong(3)).sum ==
      Tables.documents(spark, sf).agg(sum("n_chars")).collect()
        .head.getLong(0))
    out.foreach(r => assert(r.getLong(4) <= r.getLong(3)))
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val bins = rows.map(_.getLong(1)).sorted
      assert(bins.head == 0L, "first bin per source must be 0")
    }
  }

  test("q162 zone-map audit: both layouts agree on ground truth; " +
    "clustering never prunes less") {
    val out = SparkEntry.queries("q162_zonemap_audit")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (aF, aP, aS, aM) = out("arrival")
    val (cF, cP, cS, cM) = out("clustered")
    assert(aM == cM, "layouts disagree on matching rows")
    assert(aP <= aF && cP <= cF)
    assert(aS >= aM && cS >= cM)
    // month-clustered files prune at least as well as arrival order
    assert(cP * aF >= aP * cF)
  }

  test("q164 recursive org: every supplier reached once, depth law " +
    "holds against the parent function") {
    val out = SparkEntry.queries("q164_recursive_org")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2)))
      .toMap
    assert(out.size == Tables.supplier(spark, sf).count())
    out.foreach { case (id, (depth, pathSum)) =>
      if (id < 10) {
        assert(depth == 0 && pathSum == id)
      } else {
        val (pd, pp) = out(id / 10)
        assert(depth == pd + 1, s"depth law broken at $id")
        assert(pathSum == pp + id, s"path sum broken at $id")
      }
    }
  }

  test("q165 gap-fill: contiguous day spine per user, LOCF never null, " +
    "observed rows equal the raw daily grain") {
    val out = SparkEntry.queries("q165_gapfill_locf")(spark, sf).collect()
    val day = 86400000000L
    assert(out.forall(!_.isNullAt(2)), "LOCF must never leave a null")
    val observed = out.count(_.getBoolean(3))
    val rawDays = Tables.events(spark, sf)
      .select(col("user_id"),
        (col("ts_us") - (col("ts_us") % day)).as("d"))
      .distinct().count()
    assert(observed == rawDays)
    val globalMax = out.map(_.getLong(1)).max
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val days = rows.map(_.getLong(1)).sorted
      assert(days.last == globalMax, "spine must reach the corpus max day")
      assert(days.zip(days.tail).forall { case (a, b) => b - a == day },
        "spine must be gapless")
      // first spine day is the user's first observation by construction
      assert(rows.minBy(_.getLong(1)).getBoolean(3))
    }
  }

  test("q166 balanced downsample: every language keeps exactly the " +
    "min-class count with contiguous ranks, deterministically") {
    val out = SparkEntry.queries("q166_balanced_downsample")(spark, sf)
      .collect()
    val classes = Tables.documents(spark, sf)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mn = classes.values.min
    val byLang = out.groupBy(_.getString(1))
    assert(byLang.keySet == classes.keySet)
    byLang.foreach { case (lang, rows) =>
      assert(rows.length == mn, s"$lang kept ${rows.length}, want $mn")
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to mn))
    }
    val again = SparkEntry.queries("q166_balanced_downsample")(spark, sf)
      .collect()
    assert(out.map(_.toString).sorted.toSeq
      == again.map(_.toString).sorted.toSeq)
  }

  test("q167 table checksum: order-independent and additive over " +
    "disjoint slices") {
    val out = SparkEntry.queries("q167_table_checksum")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val rowC32 = expr("CAST(conv(substr(md5(CAST(concat_ws('|', doc_id, " +
      "lang, source, n_chars, md5(CAST(text AS BINARY))) AS BINARY)), " +
      "1, 8), 16, 10) AS BIGINT)")
    val docs = Tables.documents(spark, sf).withColumn("c32", rowC32)
    // whole-table checksum equals the sum of the per-source checksums
    val whole = docs.agg(sum(col("c32")), count(lit(1))).collect().head
    assert(out.values.map(_._2).sum == whole.getLong(0))
    assert(out.values.map(_._1).sum == whole.getLong(1))
    // additivity across an arbitrary disjoint split (incremental sync)
    val even = docs.filter(col("doc_id") % 2 === 0)
      .agg(sum(col("c32"))).collect().head.getLong(0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
      .agg(sum(col("c32"))).collect().head.getLong(0)
    assert(even + odd == whole.getLong(0))
  }

  test("q168 fk fanout: histogram conserves rows and orders") {
    val out = SparkEntry.queries("q168_fk_fanout")(spark, sf).collect()
    val li = Tables.lineitem(spark, sf)
    assert(out.map(r => r.getLong(0) * r.getLong(1)).sum == li.count())
    assert(out.map(_.getLong(1)).sum ==
      li.select(col("l_orderkey")).distinct().count())
    out.foreach(r => assert(r.getLong(2) == r.getLong(0) * r.getLong(1)))
  }

  test("q169 maxsim: dominates the whole-vector dot (sum of per-slice " +
    "maxes >= sum of aligned-slice dots)") {
    val out = SparkEntry.queries("q169_maxsim_topk")(spark, sf).collect()
    assert(out.length == 10)
    val quant = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "transform(embedding, x -> " +
        "CAST(floor(CAST(x AS DOUBLE) * 1000000L) AS BIGINT)) AS qv")
    val qrow = quant.filter(col("vec_id") === 0)
      .collect().head.getSeq[Long](1)
    val fullDot = quant.filter(col("vec_id") =!= 0)
      .collect().map { r =>
        r.getLong(0) -> r.getSeq[Long](1).zip(qrow).map {
          case (a, b) => a * b }.sum
      }.toMap
    out.foreach { r =>
      assert(r.getLong(1) >= fullDot(r.getLong(0)),
        s"maxsim must dominate the aligned dot for vec ${r.getLong(0)}")
    }
    // scores descend with the pinned tie order
    val scores = out.map(_.getLong(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("q170 lsh tuning: truth ledger balances per config and the home " +
    "4x4 config's candidate count equals q21's pair set") {
    val out = SparkEntry.queries("q170_lsh_tuning")(spark, sf).collect()
    assert(out.length == 3)
    out.foreach { r =>
      val (nCand, nTrue, nUnion, nMissed) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nTrue <= nCand)
      assert(nTrue + nMissed == nUnion, s"truth ledger broken: $r")
    }
    val home = out.find(r => r.getInt(0) == 4 && r.getInt(1) == 4).get
    assert(home.getLong(2) ==
      SparkEntry.queries("q21_minhash_pairs")(spark, sf).count())
  }

  test("q171 sample estimate: exact leg matches a recount, scaled leg " +
    "matches the sample, verdict is the computed inequality") {
    val r = SparkEntry.queries("q171_sample_estimate")(spark, sf)
      .collect().head
    val (truT, nDocs, estT, estD, ok) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getBoolean(4))
    val docs = Tables.documents(spark, sf)
    assert(nDocs == docs.count())
    val toks = docs.select(size(split(col("text"), " ")).cast("long"))
      .collect().map(_.getLong(0))
    assert(truT == toks.sum)
    assert(estD % 2 == 0 && estD / 2 <= nDocs)
    assert(ok == (math.abs(estT - truT) * 20 <= truT))
  }

  test("q172 cdc->scd2: one interval per event, exactly one open row " +
    "per user, intervals chain without gaps") {
    val out = SparkEntry.queries("q172_cdc_to_scd2")(spark, sf).collect()
    assert(out.length == Tables.events(spark, sf).count())
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.count(_.isNullAt(4)) == 1, "exactly one open interval")
      val sorted = rows.sortBy(r => (r.getLong(2), r.getLong(1)))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a.getLong(4) == b.getLong(2),
          "valid_to must chain to the next valid_from")
      }
      assert(sorted.last.isNullAt(4))
    }
  }

  test("q173 dedup savings: ledgers balance and agree with the q38 " +
    "canonical corpus") {
    val out = SparkEntry.queries("q173_dedup_savings")(spark, sf)
      .collect()
    val docs = Tables.documents(spark, sf)
    assert(out.map(_.getLong(1)).sum == docs.count())
    assert(out.map(_.getLong(2)).sum ==
      SparkEntry.queries("q38_neardup_dedup")(spark, sf).count())
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(4) <= r.getLong(3))
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("q174 bloom skipping: no false negatives ever, bounds hold") {
    val out = SparkEntry.queries("q174_bloom_skipping")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (bloom, truly, fp, total) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(bloom >= truly,
        s"bloom false negative for probe ${r.getLong(0)}")
      assert(fp == bloom - truly)
      assert(bloom <= total && truly <= total)
    }
  }

  test("q175 scalable percentile == q160's sort-agg percentile_disc") {
    val scalable = SparkEntry.queries("q175_scalable_percentile")(
      spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val sorted = SparkEntry.queries("q160_quantile_sketch_audit")(
      spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(5))).toMap
    assert(scalable.keySet == sorted.keySet)
    scalable.foreach { case (g, v) =>
      assert(v == sorted(g), s"percentile paths disagree for group $g")
    }
  }

  test("tpc-h shapes q176/q177/q178: row budgets, ordering, and " +
    "predicate invariants") {
    val q3 = SparkEntry.queries("q176_tpch_q3")(spark, sf).collect()
    assert(q3.length <= 10 && q3.nonEmpty)
    val rev3 = q3.map(_.getDouble(3)).toSeq
    assert(rev3 == rev3.sorted.reverse)
    assert(q3.forall(_.getDate(1).toString < "1997-01-01"))
    val q10 = SparkEntry.queries("q177_tpch_q10")(spark, sf).collect()
    assert(q10.length <= 20 && q10.nonEmpty)
    assert(q10.map(_.getLong(0)).distinct.length == q10.length)
    val rev10 = q10.map(_.getDouble(4)).toSeq
    assert(rev10 == rev10.sorted.reverse)
    val q18 = SparkEntry.queries("q178_tpch_q18")(spark, sf).collect()
    assert(q18.length <= 100 && q18.nonEmpty)
    assert(q18.forall(_.getDouble(5) > 250.0))
    val tp = q18.map(_.getDouble(4)).toSeq
    assert(tp == tp.sorted.reverse)
  }

  test("q179 encoding advisor: verdict matches the 5% rule, flags are " +
    "dictionary candidates, keys are not") {
    val out = SparkEntry.queries("q179_encoding_advisor")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out.size == 4)
    out.foreach { case (_, (n, ndv, dict)) =>
      assert(ndv <= n && dict == (ndv * 20 <= n))
    }
    assert(out("l_returnflag")._3 && out("l_linestatus")._3)
    assert(!out("l_extendedprice")._3)
  }

  test("q180 fk discovery: true keys hold, the decoy fails, " +
    "containment never exceeds the distinct count") {
    val out = SparkEntry.queries("q180_fk_discovery")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    out.foreach { case (_, (d, c, holds)) =>
      assert(c <= d && holds == (c == d))
    }
    assert(out("lineitem.l_orderkey->orders.o_orderkey")._3)
    assert(out("lineitem.l_partkey->part.p_partkey")._3)
    assert(out("orders.o_custkey->customer.c_custkey")._3)
    assert(!out("orders.o_custkey->supplier.s_suppkey")._3)
  }

  test("q181 cluster prototypes: two per cluster, rank-1 centrality " +
    "dominates rank-2, prototypes belong to their cluster") {
    val out = SparkEntry.queries("q181_cluster_prototypes")(spark, sf)
      .collect()
    val byCid = out.groupBy(_.getInt(0))
    assert(byCid.size == 8)
    byCid.foreach { case (_, rows) =>
      assert(rows.length == 2)
      val Seq(r1, r2) = rows.sortBy(_.getInt(1)).toSeq
      assert(r1.getLong(3) >= r2.getLong(3))
      assert(r1.getLong(2) != r2.getLong(2))
    }
  }

  test("q182 span corruption: token conservation — input tokens + " +
    "target tokens reassemble the original, sentinels align") {
    val out = SparkEntry.queries("q182_span_corruption")(spark, sf)
      .collect()
    val orig = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length == orig.size)
    out.foreach { r =>
      val (id, inp, tgt, nSpans) =
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))
      val inpT = inp.split(" ").toSeq
      val tgtT = tgt.split(" ").toSeq
      val sentI = inpT.filter(_.startsWith("<X"))
      val sentT = tgtT.filter(_.startsWith("<X"))
      assert(sentI == sentT, s"sentinel streams differ for doc $id")
      assert(sentI.length == nSpans)
      assert(sentI.distinct.length == sentI.length,
        "sentinel ids must be unique per doc")
      // non-sentinel tokens partition the original token multiset
      val plain = inpT.filterNot(_.startsWith("<X")) ++
        tgtT.filterNot(_.startsWith("<X"))
      val origT = orig(id).split(" ").toSeq
      assert(plain.sorted == origT.sorted,
        s"token conservation broken for doc $id")
    }
  }

  test("q183 adjacent pairs: one pair per non-final chunk, digests " +
    "agree with the q103 chunk frame") {
    val chunks = SparkEntry.queries("q103_chunk_emit")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(4))
      .toMap
    val out = SparkEntry.queries("q183_adjacent_pairs")(spark, sf)
      .collect()
    val perDoc = chunks.keys.groupBy(_._1).view.mapValues(_.size).toMap
    assert(out.length == perDoc.values.map(_ - 1).sum)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String): String =
      md5.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    out.take(20).foreach { r =>
      val (id, idx) = (r.getLong(0), r.getLong(1))
      assert(r.getString(2) == hex(chunks((id, idx))))
      assert(r.getString(3) == hex(chunks((id, idx + 1))))
    }
  }

  test("q184 bitext ratio: only accepted q145 pairs, verdict matches " +
    "the 2:1 rule") {
    val accepted = SparkEntry.queries("q145_bitext_margin")(spark, sf)
      .filter(col("accepted"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = SparkEntry.queries("q184_bitext_ratio")(spark, sf)
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == accepted)
    out.foreach { r =>
      val (sc, tc) = (r.getLong(2), r.getLong(3))
      assert(r.getBoolean(4) == (math.min(sc, tc) * 2 >= math.max(sc, tc)))
    }
  }

  test("q185 cluster sizes: ledger covers exactly the q62 membership, " +
    "every size at least 2") {
    val out = SparkEntry.queries("q185_cluster_sizes")(spark, sf)
      .collect()
    val cl = SparkEntry.queries("q62_dup_clusters")(spark, sf).collect()
    assert(out.map(_.getLong(2)).sum == cl.length)
    assert(out.map(r => r.getLong(1)).sum ==
      cl.map(_.getLong(1)).distinct.length)
    out.foreach { r =>
      assert(r.getLong(0) >= 2L)
      assert(r.getLong(2) == r.getLong(0) * r.getLong(1))
    }
  }

  test("q186 semantic decontam: one row per eval vector, dot ranks, " +
    "clean iid corpus flags nothing") {
    val out = SparkEntry.queries("q186_semantic_decontam")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    // synthetic iid Gaussians never reach cos >= 0.5 against a foreign
    // vector — zero flags is the CORRECT answer here (the planted-
    // contamination positive case lives in EdgeCasesSpec)
    assert(out.forall(!_.getBoolean(3)))
  }

  test("q187 funnel: stages are monotone and agree with the home " +
    "queries' own rules") {
    val out = SparkEntry.queries("q187_pipeline_funnel")(spark, sf)
      .collect().map(r => r.getInt(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.size == 4)
    (1 to 3).foreach { i =>
      assert(out(i)._1 >= out(i + 1)._1 && out(i)._2 >= out(i + 1)._2,
        s"funnel must shrink at stage ${i + 1}")
    }
    assert(out(1)._1 == Tables.documents(spark, sf).count())
    assert(out(2)._1 ==
      SparkEntry.queries("q20_dedup_exact")(spark, sf).count())
  }

  test("q188 profile drift: one row per user, events conserve, verdict " +
    "replays the TV rule") {
    val out = SparkEntry.queries("q188_user_profile_drift")(spark, sf)
      .collect()
    val total = Tables.events(spark, sf).count()
    assert(out.map(_.getLong(1)).sum == total)
    out.foreach { r =>
      val (n, sumAbs, drifted) =
        (r.getLong(1), r.getLong(2), r.getBoolean(3))
      assert(drifted == (sumAbs * 5 > n * total))
      // TV upper bound: sum_abs <= 2 * n_u * G
      assert(sumAbs <= 2 * n * total)
    }
  }

  test("q189 event trigrams: 10 rows, counts descend, totals bounded " +
    "by the lag-window population") {
    val out = SparkEntry.queries("q189_event_trigrams")(spark, sf)
      .collect()
    assert(out.length == 10)
    val ns = out.map(_.getLong(3)).toSeq
    assert(ns == ns.sorted.reverse)
    // each user's stream yields max(n_u - 2, 0) trigrams
    val perUser = Tables.events(spark, sf)
      .groupBy(col("user_id")).count().collect()
      .map(r => math.max(r.getLong(1) - 2, 0L)).sum
    assert(ns.sum <= perUser)
  }

  test("q190 prefix-filter join is EXACT: equals the brute-force " +
    "all-pairs bigram Jaccard >= 4/5 set") {
    val got = SparkEntry.queries("q190_prefix_filter_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: distinct bigram sets per doc, all-pairs intersection
    val sets = graft.functions.Text
      .wordShingles(Tables.documents(spark, sf), "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ids = sets.keys.toSeq.sorted
    val brute = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      a = sets(ids(i)); b = sets(ids(j))
      inter = (a & b).size
      if inter * 9 >= (a.size + b.size) * 4
    } yield (ids(i), ids(j))).toSet
    assert(got == brute,
      s"missed=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    assert(got.nonEmpty)
  }

  test("q191 hopping windows: every event lands in exactly 4 windows, " +
    "each hour's count equals its 4 covering windows' shared events") {
    val out = SparkEntry.queries("q191_hopping_windows")(spark, sf)
      .collect()
    val total = Tables.events(spark, sf).count()
    assert(out.map(_.getLong(2)).sum == 4 * total,
      "4-way overlap must quadruple the event mass")
    // window starts align to 15-minute epoch boundaries
    assert(out.forall(_.getLong(0) % 900000000L == 0))
  }

  test("q192 inter-arrival profile: gaps conserve (events minus users), " +
    "bit buckets within the 64-bit domain") {
    val out = SparkEntry.queries("q192_interarrival_profile")(spark, sf)
      .collect()
    val nEvents = Tables.events(spark, sf).count()
    val nUsers = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(out.map(_.getLong(1)).sum == nEvents - nUsers)
    out.foreach(r => assert(r.getLong(0) >= 1 && r.getLong(0) <= 64))
  }

  test("q193 soft-dedup weights: every doc weighted, families sum to " +
    "~1e6, weight inverts dup_count") {
    val out = SparkEntry.queries("q193_soft_dedup_weights")(spark, sf)
      .collect()
    assert(out.length == Tables.documents(spark, sf).count())
    out.foreach { r =>
      assert(r.getLong(2) == 1000000L / r.getLong(1))
    }
    // per family: dup_count members × floor(1e6/dup_count) ≈ 1e6
    out.groupBy(_.getLong(1)).foreach { case (dc, rows) =>
      assert(rows.length % dc == 0,
        s"family multiplicity must divide the member count for $dc")
    }
  }

  test("q22 exact md5 trigram mode emits the same pairs as xxhash64") {
    def pairs(): Set[String] =
      SparkEntry.queries("q22_ngram_jaccard")(spark, sf)
        .collect().map(_.mkString("|")).toSet
    val hashed = pairs()
    spark.conf.set("spark.graft.text.exactTrigrams", "true")
    try assert(pairs() == hashed && hashed.nonEmpty)
    finally spark.conf.unset("spark.graft.text.exactTrigrams")
  }

  test("q05 dedup output is unique per (user_id, event_type)") {
    val df = SparkEntry.queries("q05_dedup_keep_latest")(spark, sf)
    assert(df.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("q07 scd2 image has exactly one open row per updated employee") {
    val df = SparkEntry.queries("q07_scd2_closeout")(spark, sf)
    // every emp has at most one open 'Active' row from the dim side and
    // staging rows are open: per-emp open count is >= 1
    val open = df.filter(col("end_date").isNull)
    assert(open.count() > 0)
    assert(df.filter(col("status") === "Inactive" && col("end_date").isNull)
      .count() == 0)
  }

  test("q08 upsert output is unique per key") {
    val df = SparkEntry.queries("q08_upsert")(spark, sf)
    assert(df.groupBy("emp_id").count().filter(col("count") > 1).count() == 0)
  }

  test("q13 working days <= days in month") {
    val df = SparkEntry.queries("q13_working_days")(spark, sf)
    assert(df.filter(col("working_days") > 23).count() == 0)
    assert(df.count() == 12)
  }

  test("q131 dsir: every doc scored, keep tracks the score sign, and " +
    "the en slice scores more target-like than the rest") {
    val out = SparkEntry.queries("q131_dsir_resample")(spark, sf)
    assert(out.count() == Tables.documents(spark, sf).count())
    assert(out.filter(col("keep") =!= (col("score") > 0)).count() == 0)
    // sum_docs sum_b c_b*(t_b*R - r_b*T) = sum_b r_b*t_b*R - r_b*r_b*T
    // need not vanish, but the en-slice score sum must exceed the
    // non-en sum (the target is by construction more target-like)
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
    val bySide = out.join(docs, "doc_id")
      .groupBy((col("lang") === "en").as("is_en"))
      .agg(sum(col("score").cast("double") / col("n_toks")).as("s"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(bySide(true) > bySide(false))
  }

  test("q132 srp ann: 10 reranked hits, candidate hamming within 32 " +
    "bits, exact scores descending") {
    val rows = SparkEntry.queries("q132_srp_ann")(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getInt(1)).forall(d => d >= 0 && d <= 32))
    val scores = rows.map(_.getLong(2))
    assert(scores.sameElements(scores.sorted.reverse))
  }

  test("q138 srp recall: rerank makes the hash leg competitive " +
    "(recall@10 at least 0.5 on the candidate pool)") {
    val r = SparkEntry.queries("q138_srp_recall")(spark, sf).collect()(0)
    assert(r.getInt(0) == 10)
    assert(r.getLong(1) >= 5L, s"n_hits = ${r.getLong(1)}")
  }

  test("q133 fertility: one row per lang, fertility >= 1 (a word never " +
    "encodes to zero tokens)") {
    val rows = SparkEntry.queries("q133_tokenizer_fertility")(spark, sf)
      .collect()
    assert(rows.length ==
      Tables.documents(spark, sf).select("lang").distinct().count())
    rows.foreach(r => assert(r.getDouble(3) >= 1.0))
  }

  test("q135 rrf: fused ids are exactly the union of the two legs and " +
    "both-list docs outscore single-list docs at the same ranks") {
    val out = SparkEntry.queries("q135_hybrid_rrf")(spark, sf).collect()
    assert(out.length >= 10 && out.length <= 20)
    // rrf of a doc in both lists >= 2*floor(scale/(k+10)) > any
    // single-list doc's max floor(scale/(k+1))... not in general; assert
    // the computable invariant instead: score matches rank membership
    out.foreach { r =>
      val both = r.getBoolean(2) && r.getBoolean(3)
      val single = r.getBoolean(2) ^ r.getBoolean(3)
      assert(both || single)
      if (single) assert(r.getLong(1) <= 1000000L / 61)
      if (both) assert(r.getLong(1) >= 2 * (1000000L / 70))
    }
  }

  test("q136 temperature mix: weights compress shares toward uniform " +
    "(scarce sources boosted, dominant damped)") {
    val rows = SparkEntry.queries("q136_temperature_mix")(spark, sf)
      .collect()
    assert(rows.length ==
      Tables.documents(spark, sf).select("source").distinct().count())
    rows.foreach { r =>
      val share = r.getDouble(2); val boost = r.getDouble(4)
      assert(share > 0 && share < 1)
      assert(boost > 1.0 == (share < 1.0) || share == 1.0)
      // boost = 1/sqrt(share) > 1 always for share < 1
      assert(math.abs(boost - 1.0 / math.sqrt(share)) < 1e-12)
    }
  }

  test("q137 drift: bucket counts partition the token stream and the " +
    "same-distribution split shows no mass drift") {
    val out = SparkEntry.queries("q137_drift_audit")(spark, sf).collect()
    val totalToks = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " "))).count()
    assert(out.map(r => r.getLong(1) + r.getLong(2)).sum == totalToks)
    // doc_id % 10 >= 8 is a uniform hash-free split of the same corpus:
    // a 1-percentage-point TV move per bucket would mean the generator
    // is pathological — expect no bucket flagged at this scale
    assert(out.count(_.getBoolean(3)) == 0)
  }

  test("q134 surprisal: familiarity within the quantization scale and " +
    "flag tracks the threshold") {
    val out = SparkEntry.queries("q134_bigram_surprisal")(spark, sf)
    assert(out.filter(col("familiarity") < 0
      || col("familiarity") > 10000).count() == 0)
    assert(out.filter(col("flagged") =!=
      (col("familiarity") < 2000)).count() == 0)
    // a doc whose bigrams are all unique hapaxes scores the scale
    // exactly when each w1 also appears once: familiarity <= 10000
    // guaranteed by cnt2 <= cnt1 per construction — spot-check extremes
    assert(out.count() > 0)
  }

  test("q139 scrub: every doc survives, untouched docs keep their " +
    "exact text, and removal never exceeds the block count") {
    val docs = Tables.documents(spark, sf)
    val out = SparkEntry.queries("q139_dup_span_scrub")(spark, sf)
    assert(out.count() == docs.count())
    assert(out.filter(col("n_removed") > col("n_blocks")).count() == 0)
    // n_removed == 0 ⟹ the rewrite is the identity: clean text hashes
    // to the original body and keeps its length
    val untouched = out.filter(col("n_removed") === 0)
      .join(docs, "doc_id")
    assert(untouched.count() > 0)
    assert(untouched.filter(
      col("clean_md5") =!= md5(col("text").cast("binary")) ||
        col("clean_chars") =!= length(col("text"))).count() == 0)
    // scrubbed docs got strictly shorter
    assert(out.filter(col("n_removed") > 0).join(docs, "doc_id")
      .filter(col("clean_chars") >= length(col("text"))).count() == 0)
  }

  test("q141 pagerank: one row per source, base rank is the floor, " +
    "isolated nodes sit exactly on it, and mass stays bounded") {
    val out = SparkEntry.queries("q141_domain_pagerank")(spark, sf)
      .collect()
    val nSources = Tables.documents(spark, sf)
      .select(col("source")).distinct().count()
    assert(out.length == nSources)
    out.foreach { r =>
      assert(r.getLong(1) >= 150000L,
        s"rank below damping base: ${r.getLong(1)}")
      if (r.getLong(2) == 0L)
        assert(r.getLong(1) == 150000L,
          "isolated node must hold exactly the base rank")
    }
    // total mass can't exceed the undamped initial mass: contributions
    // redistribute (truncating division only loses), 0.85 damps, 0.15
    // re-injects — Σr <= N·SCALE
    assert(out.map(_.getLong(1)).sum <= nSources * 1000000L)
  }

  test("q142 padding: buckets align to 64, the bucket ledger balances " +
    "exactly, and every doc lands in one bucket") {
    val out = SparkEntry.queries("q142_padding_waste")(spark, sf)
      .collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.map(_.getLong(1)).sum == nDocs)
    out.foreach { r =>
      val (bucket, n, toks, padB) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(bucket % 64 == 0)
      // padded slots = bucket width × docs, exactly tokens + padding
      assert(toks + padB == bucket * n)
    }
  }

  test("q144 frame near-dup: pairs are ordered, thresholds hold, and " +
    "shared counts never exceed either doc's frame budget") {
    val out = SparkEntry.queries("q144_frame_neardup")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    val frames = Tables.documents(spark, sf)
      .select(col("doc_id"),
        (length(col("text")).cast("long") / 100 + 1).cast("long")
          .as("nf"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (a, b, sh) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(a < b && sh >= 2)
      assert(sh <= math.min(frames(a), frames(b)),
        s"pair ($a,$b) shares $sh frames but budgets are " +
          s"${frames(a)}/${frames(b)}")
    }
  }

  test("q146 dedup agreement: one row, set algebra holds") {
    val r = SparkEntry.queries("q146_dedup_agreement")(spark, sf)
      .collect().head
    val (nDocs, nP, nM, nV) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (nPm, nPv, nMv, nAny) =
      (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
    assert(nPm <= math.min(nP, nM) && nPv <= math.min(nP, nV) &&
      nMv <= math.min(nM, nV))
    assert(nAny <= nDocs && nAny >= Seq(nP, nM, nV).max)
    // inclusion-exclusion lower bound: |P∪M∪V| >= ΣnX − Σpairwise
    assert(nAny >= nP + nM + nV - nPm - nPv - nMv)
  }

  test("q145 bitext: one row per en doc, targets are zh docs, best " +
    "dominates second, and accept tracks the margin rule exactly") {
    val out = SparkEntry.queries("q145_bitext_margin")(spark, sf)
      .collect()
    val langs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length == langs.count { case (id, l) =>
      l == "en" && id % 10 == 7 })
    assert(out.nonEmpty)
    out.foreach { r =>
      val (src, tgt, best, second, acc) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getBoolean(4))
      assert(langs(src) == "en" && langs(tgt) == "zh")
      assert(best >= second, "rank-1 dot must dominate rank-2")
      assert(acc == (best > 0 && second * 10 <= best * 9))
    }
  }

  test("q140 boilerplate: thresholds hold and spans are real block " +
    "text from the flagged source") {
    val out = SparkEntry.queries("q140_boilerplate_blocks")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nDocs, nSrc) = (r.getLong(2), r.getLong(3))
      assert(nDocs >= 2 && nDocs <= nSrc && nDocs * 20 >= nSrc)
      // blocks are at most 8 words
      assert(r.getString(1).split(" ").length <= 8)
    }
  }

  test("q202 temperature mixture: weights, budget split and epoch " +
    "audit replay in memory; planned tokens never exceed the budget") {
    val rows = SparkEntry.queries("q202_temperature_mixture")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    val toks = Tables.documents(spark, sf)
      .select(col("source"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val w = toks.view.mapValues(t => math.floor(math.sqrt(t.toDouble)).toLong)
      .toMap
    val sumW = w.values.sum
    assert(rows.keySet == toks.keySet)
    rows.foreach { case (s, (srcTokens, ww, planned, epochs)) =>
      assert(srcTokens == toks(s) && ww == w(s))
      assert(planned == 100000L * ww / sumW)
      assert(epochs == planned * 1000 / srcTokens)
    }
    // floor division can only under-spend the budget
    assert(rows.values.map(_._3).sum <= 100000L)
    // sqrt-damping: every source's mixture share is at least its raw
    // token share iff it is below-average-sized (the damping direction)
    val total = toks.values.sum
    rows.foreach { case (s, (srcTokens, _, planned, _)) =>
      if (srcTokens.toDouble / total < 1.0 / toks.size)
        assert(planned.toDouble / 100000 >= srcTokens.toDouble / total
          - 0.01, s"small source $s must not lose share under T=2")
    }
  }

  test("q203 vocab coverage: top-10 vocabulary and per-doc coverage " +
    "replay in memory") {
    val rows = SparkEntry.queries("q203_vocab_coverage")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    val vocab = docs.flatMap(_._2).groupBy(identity).view
      .mapValues(_.size).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(10).map(_._1).toSet
    assert(rows.keySet == docs.map(_._1).toSet)
    docs.foreach { case (id, ws) =>
      val distinct = ws.distinct
      val covered = distinct.count(vocab)
      val (nd, nc, ratio) = rows(id)
      assert(nd == distinct.size && nc == covered)
      assert(ratio == covered.toLong * 1000 / distinct.size)
    }
  }

  test("q201 source quartiles: q1/med/q3 agree with an in-memory " +
    "percentile_disc replay, Tukey fence replays") {
    val rows = SparkEntry.queries("q201_source_quartiles")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5))).toMap
    val vals = Tables.documents(spark, sf)
      .select(col("source"), size(split(col("text"), " ")).cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // percentile_disc(p): value at rank ceil(p*n), 1-indexed
    def disc(xs: Seq[Double], p: Double): Double =
      xs(math.ceil(p * xs.length).toInt.max(1) - 1)
    assert(rows.keySet == vals.keySet)
    vals.foreach { case (s, xs) =>
      val (n, q1, med, q3, nOut) = rows(s)
      assert(n == xs.length)
      assert(q1 == disc(xs, 0.25) && med == disc(xs, 0.5)
        && q3 == disc(xs, 0.75))
      assert(q1 <= med && med <= q3)
      val iqr = q3 - q1
      assert(nOut == xs.count(x => x < q1 - iqr * 1.5 || x > q3 + iqr * 1.5))
    }
  }

  test("q197 MAD outliers: med/mad agree with an in-memory " +
    "percentile_disc replay, outlier rule replays") {
    val rows = SparkEntry.queries("q197_mad_outliers")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .toMap
    val vals = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // percentile_disc(0.5): value at rank ceil(n/2), 1-indexed
    def disc(xs: Seq[Double]): Double = xs((xs.length + 1) / 2 - 1)
    assert(rows.keySet == vals.keySet)
    vals.foreach { case (g, xs) =>
      val (n, med, mad, nOut) = rows(g)
      assert(n == xs.length)
      assert(med == disc(xs))
      val ads = xs.map(x => math.abs(x - med)).sorted
      assert(mad == disc(ads))
      assert(nOut == xs.count(x => math.abs(x - med) * 10000
        > mad * 44478))
      // the rule keeps the bulk: at least ceil(n/2) rows satisfy
      // ad <= mad <= 4.4478*mad, so nOut <= floor(n/2) — equality is
      // reachable for even n on a pathological distribution (ADVICE r7),
      // hence <= not <
      assert(nOut * 2 <= n)
    }
  }

  test("q198 exact-k sample: exactly k rows, deterministic, and the " +
    "plan is a top-k heap (no global sort shuffle)") {
    val q = SparkEntry.queries("q198_uniform_k_sample")
    val df = q(spark, sf)
    val rows = df.collect().map(_.getLong(0))
    val total = Tables.documents(spark, sf).count()
    assert(rows.length == math.min(100L, total).toInt)
    assert(rows.distinct.length == rows.length)
    val again = q(spark, sf).collect().map(_.getLong(0))
    assert(rows.sorted.toSeq == again.sorted.toSeq)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected a bounded top-k heap plan, got:\n$plan")
  }

  test("q200 vocab growth: decile partition of docs, ledger closes " +
    "on both tokens and types") {
    val out = SparkEntry.queries("q200_vocab_growth")(spark, sf)
      .orderBy(col("decile")).collect()
    assert(out.map(_.getInt(0)).toSeq == (1 to 10))
    val docs = Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0))
    val totalToks = docs.map(_.split(" ", -1).length.toLong).sum
    val vocab = docs.flatMap(_.split(" ", -1)).distinct.length.toLong
    val last = out.last
    assert(last.getLong(4) == totalToks, "cum_toks must equal corpus")
    assert(last.getLong(3) == vocab, "cum_types must equal vocabulary")
    assert(out.map(_.getLong(2)).sum == vocab)
    // cumulative columns are actual running sums and non-decreasing
    out.foldLeft((0L, 0L)) { case ((ct, cv), r) =>
      val (nt, tk, cumT, cumK) =
        (r.getLong(2), r.getLong(1), r.getLong(3), r.getLong(4))
      assert(cumT == cv + nt && cumK == ct + tk)
      (cumK, cumT)
    }
  }

  test("q205 source divergence: equals a naive BigInt TVD replay and " +
    "stays in [0, 1e6]") {
    val out = SparkEntry.queries("q205_source_divergence")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val sw = docs.flatMap { case (s, t) => t.split(" ", -1).map((s, _)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cw = sw.groupBy(_._1._2).view
      .mapValues(_.values.sum).toMap
    val ns = sw.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val nn = BigInt(sw.values.sum)
    val expected = ns.keys.toSeq.sorted.map { s =>
      val nsB = BigInt(ns(s))
      val part = sw.collect { case ((`s`, w), c) =>
        (BigInt(c) * nn - BigInt(cw(w)) * nsB).abs - BigInt(cw(w)) * nsB
      }.sum
      val ppm = ((part + nsB * nn) * 1000000) / (nsB * nn * 2)
      (s, ns(s), ppm.toLong)
    }
    assert(out.toSeq == expected)
    out.foreach { case (_, _, ppm) => assert(ppm >= 0 && ppm <= 1000000) }
  }

  test("q206 waterfill: budget conserved, caps respected, unsaturated " +
    "allocations equal within 1, matches a sequential simulation") {
    val out = SparkEntry.queries("q206_budget_waterfill")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    val caps = out.map(t => (t._1, t._2)).sortBy(t => (t._2, t._1))
    val total = caps.map(_._2).sum
    val budget = total / 2
    assert(out.map(_._3).sum == math.min(budget, total),
      "allocation must exhaust exactly the feasible budget")
    out.foreach { case (s, cap, alloc, sat) =>
      assert(alloc <= cap, s"$s over-allocated")
      // saturated ⇒ the full cap was taken (the converse can also hold
      // for an unsaturated source whose fair share lands exactly on its
      // cap via the +1 remainder — the flag still reports the waterline
      // side it was decided on)
      assert(!sat || alloc == cap, s"$s saturated but not at cap")
    }
    val unsat = out.filter(!_._4).map(_._3)
    if (unsat.nonEmpty)
      assert(unsat.max - unsat.min <= 1,
        "fair shares of unsaturated sources must be equal within 1")
    // sequential simulation: walk cap-ascending, saturate while the
    // equal share exceeds the cap, then split the remainder
    var rem = budget
    var slots = caps.length.toLong
    val sim = scala.collection.mutable.Map.empty[String, Long]
    var leveled = List.empty[String]
    caps.foreach { case (s, cap) =>
      if (sim.size + leveled.length < caps.length) {
        if (leveled.isEmpty && cap * slots <= rem) {
          sim(s) = cap; rem -= cap; slots -= 1
        } else leveled ::= s
      }
    }
    val ordered = leveled.reverse
    ordered.zipWithIndex.foreach { case (s, j) =>
      sim(s) = rem / ordered.length +
        (if (j < rem % ordered.length) 1L else 0L)
    }
    out.foreach { case (s, _, alloc, _) => assert(alloc == sim(s), s) }
  }

  test("q207 repeat hazard: equals the naive per-depth count replay " +
    "and at_risk telescopes") {
    val out = SparkEntry.queries("q207_repeat_hazard")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val m = Tables.orders(spark, sf).groupBy(col("o_custkey")).count()
      .collect().map(_.getLong(1))
    val kMax = m.max
    val expected = (1L to kMax).map { k =>
      val atRisk = m.count(_ >= k).toLong
      val cont = m.count(_ > k).toLong
      (k, atRisk, cont, cont * 1000000 / atRisk)
    }
    assert(out.toSeq == expected)
    // at_risk at k+1 IS continued at k (the survival identity)
    out.sliding(2).foreach {
      case Array((_, _, c, _), (_, ar, _, _)) => assert(ar == c)
      case _ =>
    }
  }

  test("q208 length gini: equals the rank-formula replay, zero for " +
    "constant lengths, bounded below 1e6") {
    val out = SparkEntry.queries("q208_length_gini")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val bySrc = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val expected = bySrc.keys.toSeq.sorted.map { s =>
      val xs = bySrc(s)
      val n = xs.length.toLong
      val sum = xs.sum
      // Σ_{i,j} |x_i − x_j| = 2·Σ_i (2i − n − 1)·x_(i)  (1-based ranks)
      val md = 2 * xs.zipWithIndex.map { case (x, i0) =>
        (2 * (i0 + 1L) - n - 1) * x
      }.sum
      (s, n, sum, md * 1000000 / (2 * n * sum))
    }
    assert(out.toSeq == expected)
    out.foreach { case (_, _, _, g) => assert(g >= 0 && g < 1000000) }
  }

  test("q209 calibration: bins partition the corpus, counts match a " +
    "full md5 replay of score, thresholds, and the reference gate") {
    val out = SparkEntry.queries("q209_calibration")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def hb(id: String, off: Int, mod: Int): Long =
      java.lang.Long.parseLong(md5hex(id).substring(off - 1, off + 7), 16) % mod
    val perDoc = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect().map { r =>
        val toks = r.getString(1).split(" ", -1)
        val score = toks.map(t => hb(hb(t, 1, 1024).toString, 9, 2001) - 1000).sum
        (score, toks.length.toLong, toks.distinct.length.toLong)
      }
    val sorted = perDoc.map(_._1).sorted
    val n = sorted.length
    val ths = (1 to 9).map(k =>
      sorted(math.ceil(k / 10.0 * n).toLong.max(1L).toInt - 1))
    val naive = perDoc.map { case (score, nt, ut) =>
      (1 + ths.count(_ < score), ut * 2 >= nt, score)
    }.groupBy(_._1).view.mapValues { g =>
      val pos = g.count(_._2).toLong
      (g.length.toLong, pos, pos * 1000000 / g.length,
        g.map(_._3).sum)
    }.toMap
    assert(out.map(_._2).sum == n.toLong, "bins must partition the corpus")
    out.foreach { case (bin, nd, np, ppm, ss) =>
      val (en, ep, eppm, ess) = naive(bin)
      assert(nd == en && np == ep && ppm == eppm && ss == ess, s"bin $bin")
    }
  }

  test("q210 cusum: equals the sequential max(0, S+dev) recurrence " +
    "per user") {
    val out = SparkEntry.queries("q210_cusum_change")(spark, sf)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val day = 86400000000L
    val daily = Tables.events(spark, sf)
      .select(col("user_id"),
        (col("ts_us") - (col("ts_us") % day)).as("day_us"))
      .groupBy(col("user_id"), col("day_us")).count().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.size == daily.length)
    daily.groupBy(_._1).foreach { case (u, rows) =>
      val series = rows.sortBy(_._2)
      val total = series.map(_._3).sum
      val days = series.length.toLong
      var s = 0L
      series.foreach { case (_, d, x) =>
        s = math.max(0L, s + (x * days - total))
        val (gx, gc, ga) = out((u, d))
        assert(gx == x && gc == s && ga == (s > 5 * total),
          s"user $u day $d")
      }
    }
  }

  test("q211 winsorized mean: fences are rank-exact data values and " +
    "the clipped ledger closes") {
    val out = SparkEntry.queries("q211_winsorized_mean")(spark, sf)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getLong(5), r.getDouble(6))))
      .toMap
    val byGrp = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_totalprice")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(out.keySet == byGrp.keySet)
    byGrp.foreach { case (g, xs) =>
      val n = xs.length
      def disc(p: Double) = xs(math.ceil(p * n).toLong.max(1L).toInt - 1)
      val (p05, p95) = (disc(0.05), disc(0.95))
      val (gn, g05, g95, glo, ghi, gsum) = out(g)
      assert(gn == n.toLong && g05 == p05 && g95 == p95)
      assert(glo == xs.count(_ < p05).toLong)
      assert(ghi == xs.count(_ > p95).toLong)
      val wsum = xs.map(x => math.min(math.max(x, p05), p95)).sum
      assert(math.abs(gsum - wsum) < 0.5,
        s"$g winsorized sum off: $gsum vs $wsum")
      // clipping can only pull the sum inward
      assert(glo + ghi < n, "fences cannot clip everything")
    }
  }

  test("q212 chi2 gate: verdict equals the exact BigInt cross-" +
    "multiplied rule on the reported counts") {
    val out = SparkEntry.queries("q212_chi2_gate")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val Seq(a, b, c, d) = (1 to 4).map(i => BigInt(r.getLong(i)))
      val lhs = 100 * (a + b + c + d) * (a * d - b * c).pow(2)
      val rhs = 384 * (a + b) * (c + d) * (a + c) * (b + d)
      assert(r.getBoolean(5) == (lhs > rhs), r.toString)
    }
    // the rule itself must fire on a real effect: a planted 2x2 with
    // an obvious rate difference (90/10 vs 10/90 out of 200)
    val (a, b, c, d) = (BigInt(90), BigInt(10), BigInt(10), BigInt(90))
    assert(100 * (a + b + c + d) * (a * d - b * c).pow(2)
      > 384 * (a + b) * (c + d) * (a + c) * (b + d))
  }

  test("q213 zipf octaves: ledger closes on types and tokens, octave " +
    "is the bit length, ratios replay") {
    val out = SparkEntry.queries("q213_zipf_octaves")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .sortBy(_._1)
    val words = Tables.documents(spark, sf)
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ", -1))
    val counts = words.groupBy(identity).view.mapValues(_.length.toLong)
    val naive = counts.values.toSeq
      .groupBy(c => 63 - java.lang.Long.numberOfLeadingZeros(c))
      .view.mapValues(cs => (cs.length.toLong, cs.sum)).toMap
    assert(out.map(_._1).toSet == naive.keySet.map(_.toLong))
    out.foreach { case (o, nt, occ, _) =>
      val (en, eo) = naive(o.toInt)
      assert(nt == en && occ == eo, s"octave $o")
    }
    assert(out.map(_._2).sum == counts.size.toLong)
    assert(out.map(_._3).sum == words.length.toLong)
    // ratio column: n_types(b) * 1000 div n_types(next present b)
    out.sliding(2).foreach {
      case Array((_, nt1, _, r1), (_, nt2, _, _)) =>
        assert(r1.contains(nt1 * 1000 / nt2))
      case _ =>
    }
    assert(out.last._4.isEmpty, "last octave has no successor")
  }

  test("q214 length trend: normal equations equal the BigInt replay " +
    "and the denominator is positive definite") {
    val out = SparkEntry.queries("q214_length_trend")(spark, sf)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))).toMap
    val pts = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0),
        (BigInt(r.getLong(1)),
          BigInt(r.getString(2).split(" ", -1).length))))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(out.keySet == pts.keySet)
    pts.foreach { case (src, xy) =>
      val n = BigInt(xy.length)
      val sx = xy.map(_._1).sum
      val sy = xy.map(_._2).sum
      val sxy = xy.map { case (x, y) => x * y }.sum
      val sxx = xy.map { case (x, _) => x * x }.sum
      val (gn, gnum, gden, grising) = out(src)
      assert(gn == n.toLong)
      // outputs ship as double since r10 (DECIMAL internals — the 10×
      // clone smoke overflowed the old BIGINT envelope); exact below
      // 2^53, which smoke-scale values are
      assert(gnum == (n * sxy - sx * sy).toDouble, src)
      assert(gden == (n * sxx - sx * sx).toDouble, src)
      assert(gden > 0, "sxx - (sx)^2/n > 0 unless all x equal")
      assert(grising == (gnum > 0))
    }
  }

  test("q215 conversion latency: counts and exact percentiles equal " +
    "the naive first-event replay") {
    val row = SparkEntry.queries("q215_conversion_latency")(spark, sf)
      .collect().head
    val firsts = Tables.events(spark, sf)
      .filter(col("event_type").isin("signup", "purchase"))
      .select(col("user_id"), col("event_type"), col("ts_us")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues { es =>
        (es.filter(_._2 == "signup").map(_._3).minOption,
          es.filter(_._2 == "purchase").map(_._3).minOption)
      }.toMap
    val signed = firsts.values.filter(_._1.isDefined).toSeq
    val delays = signed.collect {
      case (Some(s0), Some(p)) if p > s0 => p - s0
    }.sorted
    assert(row.getLong(0) == signed.length.toLong)
    assert(row.getLong(1) == delays.length.toLong)
    def disc(p: Double) =
      delays(math.ceil(p * delays.length).toLong.max(1L).toInt - 1)
    assert(row.getLong(2) == disc(0.5))
    assert(row.getLong(3) == disc(0.9))
    assert(row.getLong(2) <= row.getLong(3), "median <= p90")
  }

  test("q216 ensemble: deciles replay from the three signals, " +
    "ensemble is their sum, keep is the pinned gate") {
    val out = SparkEntry.queries("q216_quality_ensemble")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getBoolean(5)))).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def hb(id: String, off: Int, mod: Int): Long =
      java.lang.Long.parseLong(md5hex(id).substring(off - 1, off + 7), 16) % mod
    val sig = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect().map { r =>
        val toks = r.getString(1).split(" ", -1)
        val s1 = toks.map(t =>
          hb(hb(t, 1, 1024).toString, 9, 2001) - 1000).sum
        val n = toks.length.toLong
        val u = toks.distinct.length.toLong
        (r.getLong(0), Seq(s1, u * 1000 / n, n))
      }
    assert(out.size == sig.length)
    val deciles = (0 to 2).map { i =>
      val sorted = sig.map(_._2(i)).sorted
      val n = sorted.length
      (1 to 9).map(k =>
        sorted(math.ceil(k / 10.0 * n).toLong.max(1L).toInt - 1))
    }
    sig.foreach { case (id, ss) =>
      val bins = (0 to 2).map(i => 1 + deciles(i).count(_ < ss(i)))
      val (g1, g2, g3, ge, gk) = out(id)
      assert(Seq(g1, g2, g3) == bins, s"doc $id")
      assert(ge == bins.sum && gk == (bins.sum >= 18), s"doc $id")
    }
    // the ensemble actually separates: both verdicts occur
    assert(out.values.exists(_._5) && out.values.exists(!_._5))
  }

  test("q217 kappa: confusion matrix and kappa fraction equal the " +
    "BigInt replay; kappa <= 1 always") {
    val r = SparkEntry.queries("q217_gate_kappa")(spark, sf)
      .collect().head
    val Seq(a, b, c, d) = (0 to 3).map(i => r.getLong(i))
    val docs = Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def hb(id: String, off: Int, mod: Int): Long =
      java.lang.Long.parseLong(md5hex(id).substring(off - 1, off + 7), 16) % mod
    val gates = docs.map { t =>
      val toks = t.split(" ", -1)
      val score = toks.map(w =>
        hb(hb(w, 1, 1024).toString, 9, 2001) - 1000).sum
      (score >= 0, toks.distinct.length * 2 >= toks.length)
    }
    assert(a == gates.count(g => g._1 && g._2).toLong)
    assert(b == gates.count(g => g._1 && !g._2).toLong)
    assert(c == gates.count(g => !g._1 && g._2).toLong)
    assert(d == gates.count(g => !g._1 && !g._2).toLong)
    val (bA, bB, bC, bD) = (BigInt(a), BigInt(b), BigInt(c), BigInt(d))
    val nn = bA + bB + bC + bD
    val peNum = (bA + bB) * (bA + bC) + (bC + bD) * (bB + bD)
    assert(BigInt(r.getLong(4)) == (bA + bD) * nn - peNum)
    assert(BigInt(r.getLong(5)) == nn * nn - peNum)
    // kappa <= 1: num <= den (den - num = N^2 - (a+d)N >= 0)
    assert(r.getLong(4) <= r.getLong(5))
    assert(r.getBoolean(6) == (r.getLong(4) * 10 > r.getLong(5) * 4))
  }

  test("q218 k-anonymity: ledger equals the naive class census") {
    val r = SparkEntry.queries("q218_k_anonymity")(spark, sf)
      .collect().head
    val classes = Tables.documents(spark, sf)
      .select(col("lang"), col("source"), col("text")).collect()
      .map(x => (x.getString(0), x.getString(1),
        x.getString(2).split(" ", -1).length.toLong / 50))
      .groupBy(identity).view.mapValues(_.length.toLong).values.toSeq
    assert(r.getLong(0) == classes.length.toLong)
    assert(r.getLong(1) == classes.sum)
    assert(r.getLong(2) == classes.count(_ < 5).toLong)
    val atRisk = classes.filter(_ < 5).sum
    assert(r.getLong(3) == atRisk)
    assert(r.getLong(4) == atRisk * 1000000 / classes.sum)
  }

  test("q219 co-occurrence: top-20 equals the naive gated pair count " +
    "with the deterministic tiebreak") {
    val out = SparkEntry.queries("q219_cooccurrence")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val dw = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).distinct))
    val df = dw.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length).toMap
    val vocab = df.toSeq.sortBy { case (w, c) => (-c, w) }.take(20)
      .map(_._1).toSet
    val support = dw.flatMap { case (_, ws) =>
        val g = ws.filter(vocab).sorted
        for (i <- g.indices; j <- (i + 1) until g.length)
          yield (g(i), g(j))
      }.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case ((a, b), c) => (a, b, c) }
      .sortBy { case (a, b, c) => (-c, a, b) }.take(20)
    assert(out.toSeq == support)
  }

  test("q220 mann-whitney: U2 equals the naive doubled pair count " +
    "and rb stays in [-1, 1]") {
    val out = SparkEntry.queries("q220_mannwhitney_shift")(spark, sf)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))))
      .toMap
    val rows = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_totalprice"),
        col("o_custkey")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100),
        r.getLong(2) % 2 == 0))
      .groupBy(_._1)
    assert(out.keySet == rows.keySet)
    rows.foreach { case (g, rs) =>
      val as = rs.filter(_._3).map(_._2)
      val bs = rs.filter(!_._3).map(_._2)
      // doubled U: 2 per strict win, 1 per tie (quadratic naive —
      // fine at sf0.001)
      val u2 = as.iterator.map(a =>
        2L * bs.count(_ < a) + bs.count(_ == a)).sum
      val (na, nb, gu2, rbn, rbd, shifted) = out(g)
      assert(na == as.length.toLong && nb == bs.length.toLong)
      assert(gu2 == u2, g)
      assert(rbn == u2 - na * nb && rbd == na * nb)
      assert(math.abs(rbn) <= rbd, "rank-biserial is in [-1, 1]")
      assert(shifted == (math.abs(rbn) * 10 > rbd))
    }
  }

  test("q221 stratified sample: exactly min(20, stratum) per source, " +
    "deterministic, and the heap rewrite fires") {
    val q = SparkEntry.queries("q221_stratified_k_sample")
    val df = q(spark, sf)
    val rows = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val sizes = Tables.documents(spark, sf)
      .groupBy(col("source")).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val bySrc = rows.groupBy(_._1)
    assert(bySrc.keySet == sizes.keySet)
    bySrc.foreach { case (s, rs) =>
      assert(rs.length.toLong == math.min(20L, sizes(s)), s)
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length), s)
      assert(rs.map(_._2).distinct.length == rs.length, s)
    }
    val again = q(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(rows.sortBy(r => (r._1, r._3)).toSeq
      == again.sortBy(r => (r._1, r._3)).toSeq)
    // the declarative row_number idiom must plan as the bounded heap
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"),
      s"expected the TopKPerGroup heap exec, got:\n$plan")
  }

  test("q222 tpch q6: exact cents replay and the predicates reach " +
    "the scan") {
    val df = SparkEntry.queries("q222_tpch_q6")(spark, sf)
    val r = df.collect().head
    val li = Tables.lineitem(spark, sf)
      .select(col("l_shipdate").cast("string"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount")).collect()
    val kept = li.filter { x =>
      !x.isNullAt(0) && x.getString(0) >= "1996-01-01" &&
        x.getString(0) < "1997-01-01" && x.getDouble(1) < 24 && {
          val dc = math.round(x.getDouble(3) * 100)
          dc >= 5 && dc <= 7
        }
    }
    val rev = kept.map(x => BigInt(math.round(x.getDouble(2) * 100))
      * BigInt(math.round(x.getDouble(3) * 100))).sum
    assert(r.getLong(0) == kept.length.toLong)
    assert(r.getDouble(1) == rev.toDouble)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"),
      "quantity/date predicates must push to the parquet scan")
  }

  test("q224 dup provenance: ledger closes against the pair frame " +
    "and the split replays naively") {
    val out = SparkEntry.queries("q224_dup_provenance")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val srcOf = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val pairs = SparkEntry.queries("q21_minhash_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val within = pairs.filter(p => srcOf(p._1) == srcOf(p._2))
      .groupBy(p => srcOf(p._1)).view.mapValues(_.length.toLong).toMap
    val cross = pairs.filter(p => srcOf(p._1) != srcOf(p._2))
      .flatMap(p => Seq(srcOf(p._1), srcOf(p._2)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(out.map(_._1).toSet == (within.keySet ++ cross.keySet))
    out.foreach { case (s, w, c) =>
      assert(w == within.getOrElse(s, 0L), s)
      assert(c == cross.getOrElse(s, 0L), s)
    }
    // every pair lands exactly once (within) or twice (cross)
    assert(out.map(_._2).sum + out.map(_._3).sum / 2 == pairs.length.toLong)
  }

  test("q225 dow anova: sums replay in BigInt, eta2 in [0, 1e6], " +
    "between never exceeds total") {
    val r = SparkEntry.queries("q225_dow_anova")(spark, sf)
      .collect().head
    val day = 86400000000L
    val daily = Tables.events(spark, sf)
      .select((col("ts_us") - (col("ts_us") % day)).as("day_us"))
      .groupBy(col("day_us")).count().collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val n = BigInt(daily.length)
    val t = BigInt(daily.map(_._2).sum)
    val ssTot = daily.map { case (_, x) =>
      val dv = BigInt(x) * n - t; dv * dv }.sum
    val byDow = daily.groupBy { case (d0, _) =>
      // same partition as dayofweek: day index mod 7
      (d0 / day) % 7
    }
    val ssB = byDow.values.map { g =>
      val ng = BigInt(g.length)
      val tg = BigInt(g.map(_._2).sum)
      val dv = tg * n - t * ng
      dv * dv / ng
    }.sum
    assert(r.getLong(0) == daily.length.toLong)
    assert(BigInt(r.getLong(1)) == ssB && BigInt(r.getLong(2)) == ssTot)
    assert(r.getLong(1) <= r.getLong(2), "SS_between <= SS_total")
    val eta = r.getLong(3)
    assert(eta >= 0 && eta <= 1000000)
    assert(BigInt(eta) == ssB * 1000000 / ssTot)
  }

  test("q226 token-weighted median: naive mass replay, and the " +
    "doc-count median never exceeds it on long-tailed sources") {
    val out = SparkEntry.queries("q226_token_weighted_median")(spark, sf)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val bySrc = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(out.keySet == bySrc.keySet)
    bySrc.foreach { case (s, xs) =>
      val total = xs.sum
      var cum = 0L
      val wmed = xs.find { x => cum += x; cum * 2 >= total }.get
      val (gn, gt, gw) = out(s)
      assert(gn == xs.length.toLong && gt == total && gw == wmed, s)
    }
  }

  test("q227 transition surprisal: equals the naive bit-length replay " +
    "over q75's transition counts, bounded by log2(branching)") {
    val out = SparkEntry.queries("q227_transition_surprisal")(spark, sf)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val trans = SparkEntry.queries("q75_transitions")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byCur = trans.groupBy(_._1)
    assert(out.keySet == byCur.keySet)
    byCur.foreach { case (cur, ts) =>
      val nOut = ts.map(_._3).sum
      def lg(x: Long) = 63 - java.lang.Long.numberOfLeadingZeros(x)
      val surp = ts.map { case (_, _, n) => n * lg(nOut / n) }.sum
      val (gOut, gTypes, gS) = out(cur)
      assert(gOut == nOut && gTypes == ts.length.toLong, cur)
      assert(gS == surp * 1000 / nOut, cur)
      // floor-surprisal cannot exceed log2 of the branching factor
      assert(gS <= lg(ts.length.toLong.max(1)) * 1000 + 1000, cur)
      assert(gS >= 0)
    }
  }

  test("q228 benford: digit census replays, expectations sum to ~1e6, " +
    "flags fire exactly at the 2pp rule") {
    val out = SparkEntry.queries("q228_benford_audit")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val digits = Tables.orders(spark, sf)
      .select(col("o_totalprice")).collect()
      .map(r => math.round(r.getDouble(0) * 100).toString.head.asDigit)
    val census = digits.groupBy(identity).view.mapValues(_.length.toLong)
    val n = digits.length.toLong
    assert(out.map(_._2).sum == n, "every order has a leading digit")
    assert(math.abs(out.map(_._3).sum - 1000000L) <= 9,
      "pinned Benford ppm must sum to ~1e6")
    out.foreach { case (d, c, exp, obs, fl) =>
      assert(c == census(d), s"digit $d")
      assert(obs == c * 1000000 / n)
      assert(fl == (math.abs(c * 1000000 - exp * n) > 20000 * n), s"d $d")
    }
    // TPC-H prices are synthetic sums, not Benford — the audit must
    // actually catch that (at least one digit flagged)
    assert(out.exists(_._5), "synthetic prices should violate Benford")
  }

  test("q229 kruskal-wallis: doubled rank sums replay, the rank " +
    "ledger closes at N(N+1), and the verdict equals the BigInt rule") {
    val out = SparkEntry.queries("q229_kruskal_wallis")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    val rows = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_totalprice")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
    val n = rows.length.toLong
    // doubled tie-averaged rank per value: 2*C_less + c_v + 1
    val byV = rows.map(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val sortedV = byV.keys.toSeq.sorted
    val less = sortedV.scanLeft(0L)((acc, v) => acc + byV(v))
    val r2 = sortedV.zip(less).map { case (v, l) =>
      v -> (2 * l + byV(v) + 1) }.toMap
    val expRg = rows.groupBy(_._1).view.mapValues { rs =>
      (rs.length.toLong, rs.map(t => r2(t._2)).sum) }.toMap
    assert(out.map(_._1).toSet == expRg.keySet)
    out.foreach { case (g, ng, rg, _) =>
      val (en, er) = expRg(g)
      assert(ng == en && rg == er, g)
    }
    // Σ doubled ranks over all rows = N(N+1) (tie-average preserving)
    assert(out.map(_._3).sum == n * (n + 1))
    // verdict: H > 9.488 via the same floored-S2 BigInt arithmetic
    val s2 = expRg.values.map { case (ng, rg) =>
      BigInt(rg) * rg / ng }.sum
    val bn = BigInt(n)
    val want = 3000 * s2 - 3000 * bn * (bn + 1) * (bn + 1) >
      9488 * bn * (bn + 1)
    out.foreach { case (g, _, _, sig) => assert(sig == want, g) }
  }

  test("q230 sample-size plan: the ceiling formula replays, the " +
    "worst case tops out at 2401, and certainty needs zero-ish review") {
    val out = SparkEntry.queries("q230_sample_size_plan")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.nonEmpty)
    out.foreach { case (s, n, pp, nr) =>
      assert(pp >= 0 && pp <= 1000000)
      val raw = (BigInt(38416) * pp * (1000000L - pp)
        + BigInt("3999999999999")) / BigInt("4000000000000")
      assert(nr == math.min(n, raw.toLong), s)
      assert(nr <= 2401, "p=1/2 upper bound")
      if (pp == 0 || pp == 1000000) assert(nr <= 1)
    }
  }

  test("q231 neyman allocation: budget exhausted exactly, weights " +
    "replay, zero-variance strata draw nothing") {
    val out = SparkEntry.queries("q231_neyman_allocation")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val sumW = out.map(_._4).sum
    if (sumW > 0)
      assert(out.map(_._5).sum == 1000L, "largest-remainder exhausts R")
    out.foreach { case (s, n, pp, w, nr) =>
      val sig = math.sqrt((pp * (1000000L - pp)).toDouble).toLong
      assert(w == n * sig, s)
      if (w == 0) assert(nr == 0, s"certain stratum $s must draw 0")
      // floor share bound: alloc within 1 of the exact proportional cut
      if (sumW > 0) {
        val floorShare = 1000L * w / sumW
        assert(nr == floorShare || nr == floorShare + 1, s)
      }
    }
  }

  test("q232 effective sample size: Kish formula replays in BigInt, " +
    "ESS <= n with equality iff weights are uniform, deff >= 1") {
    val out = SparkEntry.queries("q232_effective_sample_size")(spark, sf)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val dupOf = docs.map(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val bySrc = docs.groupBy(_._1).view
      .mapValues(_.map(t => 1000000L / dupOf(t._2))).toMap
    assert(out.keySet == bySrc.keySet)
    bySrc.foreach { case (s, ws) =>
      val sw = BigInt(ws.sum)
      val sww = ws.map(w => BigInt(w) * w).sum
      val (n, ess, deff) = out(s)
      assert(n == ws.length.toLong)
      assert(BigInt(ess) == sw * sw * 1000 / sww, s)
      assert(BigInt(deff) == BigInt(n) * sww * 1000 / (sw * sw), s)
      assert(ess <= n * 1000, "ESS cannot exceed n (Cauchy-Schwarz)")
      assert(deff >= 1000, "design effect is at least 1")
      if (ws.distinct.length == 1) assert(ess == n * 1000 && deff == 1000)
    }
  }

  test("q233 eval contamination: full Scala replay — winnow index, " +
    "df cap, split hash, and the >=3-hit rule all reproduce") {
    import org.apache.spark.unsafe.types.UTF8String
    val out = SparkEntry.queries("q233_eval_contamination")(spark, sf)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // same one-pass winnow the query uses (compute is the codegen'd
    // expression's own kernel; the df cap and split rule are replayed
    // independently below)
    val fps = docs.map { case (id, t) =>
      (id, graft.plans.WinnowFingerprints
        .compute(UTF8String.fromString(t), 8, 4).toLongArray().toSet)
    }.toMap
    val df = fps.values.toSeq.flatten.groupBy(identity).view
      .mapValues(_.size).toMap
    val rare = fps.view.mapValues(_.filter(df(_) <= 20)).toMap
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 100
    }
    val split = docs.map { case (id, _) =>
      val b = bucket(id)
      (id, if (b < 80) "train" else if (b < 90) "val" else "test")
    }.toMap
    val trainFps = rare.collect {
      case (id, s) if split(id) == "train" => s
    }.toSet.flatten
    // denominator = ALL fingerprintable eval docs (pre-df-cap, ADVICE
    // r9): a doc whose every fp is df-capped out stays in n_docs and
    // is reported via n_all_common
    val evalDocs = fps.filter { case (id, s) =>
      split(id) != "train" && s.nonEmpty }
    val expected = evalDocs.toSeq
      .map { case (id, _) =>
        (split(id), rare(id).count(trainFps), rare(id).isEmpty) }
      .groupBy(_._1).map { case (sp, hits) =>
        val nDocs = hits.size.toLong
        val nCont = hits.count(_._2 >= 3).toLong
        (sp, (nDocs, nCont, nCont * 1000000L / nDocs,
          hits.map(_._2.toLong).sum, hits.count(_._3).toLong))
      }
    assert(out == expected)
    // at least one eval doc exists on both sides at smoke scale
    assert(out.keySet == Set("val", "test"))
  }

  test("q234 min-cost supplier: naive replay of per-part cheapest " +
    "EUROPE offer with the truncating unit-cents contract") {
    val out = SparkEntry.queries("q234_min_cost_supplier")(spark, sf)
      .collect()
      .map(r => (r.getDouble(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getInt(4), r.getLong(5)))
    val regionEu = Tables.region(spark, sf)
      .filter(col("r_name") === "EUROPE").collect()
      .map(_.getAs[Number]("r_regionkey").longValue).toSet
    val natEu = Tables.nation(spark, sf).collect()
      .filter(r => regionEu(r.getAs[Number]("n_regionkey").longValue))
      .map(r => (r.getAs[Number]("n_nationkey").longValue,
        r.getAs[String]("n_name"))).toMap
    val supp = Tables.supplier(spark, sf).collect()
      .flatMap { r =>
        natEu.get(r.getAs[Number]("s_nationkey").longValue).map(n =>
          (r.getAs[Long]("s_suppkey"),
            (r.getAs[String]("s_name"), r.getAs[Double]("s_acctbal"), n)))
      }.toMap
    val psize = Tables.part(spark, sf)
      .filter(col("p_type") === "STANDARD" && col("p_size") <= 5)
      .collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Int]("p_size"))).toMap
    val offers = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_quantity")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        math.round(r.getDouble(2) * 100) / r.getDouble(3).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).min)
      .toSeq.collect { case ((pk, sk), c)
        if psize.contains(pk) && supp.contains(sk) => (pk, sk, c) }
    val minCost = offers.groupBy(_._1).view.mapValues(_.map(_._3).min)
    val expected = offers
      .filter { case (pk, _, c) => c == minCost(pk) }
      .map { case (pk, sk, c) =>
        val (sn, bal, nn) = supp(sk)
        (bal, sn, nn, pk, psize(pk), c)
      }
      .sortBy { case (bal, sn, _, pk, _, _) => (-bal, pk, sn) }
      .take(100)
    assert(out.toSeq == expected)
  }

  test("q235 value concentration: BigInt replay of the 1/1000 " +
    "threshold and exact share_ppm") {
    val out = SparkEntry.queries("q235_value_concentration")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val regionAs = Tables.region(spark, sf)
      .filter(col("r_name") === "ASIA").collect()
      .map(_.getAs[Number]("r_regionkey").longValue).toSet
    val natAs = Tables.nation(spark, sf).collect()
      .filter(r => regionAs(r.getAs[Number]("n_regionkey").longValue))
      .map(_.getAs[Number]("n_nationkey").longValue).toSet
    val suppAs = Tables.supplier(spark, sf).collect()
      .filter(r => natAs(r.getAs[Number]("s_nationkey").longValue))
      .map(_.getAs[Long]("s_suppkey")).toSet
    val vals = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice")).collect()
      .filter(r => suppAs(r.getLong(1)))
      .map(r => (r.getLong(0), BigInt(math.round(r.getDouble(2) * 100))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val total = vals.values.sum
    val expected = vals.toSeq
      .filter { case (_, v) => v * 1000 > total }
      .map { case (pk, v) =>
        (pk, v.toDouble, (v * 1000000 / total).toLong) }
      .sortBy { case (pk, v, _) => (-v, pk) }
    assert(out.toSeq == expected)
    // the gate is a real filter at smoke scale, not pass-everything
    assert(out.length < vals.size)
  }

  test("q236 excess stock: naive replay of the 2*q_sp > q_p majority " +
    "holder rule inside the 1996 window") {
    val out = SparkEntry.queries("q236_excess_stock")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))).toMap
    val nat = Tables.nation(spark, sf).collect()
      .map(r => (r.getAs[Number]("n_nationkey").longValue,
        r.getAs[String]("n_name"))).toMap
    val supp = Tables.supplier(spark, sf).collect()
      .map(r => (r.getAs[Long]("s_suppkey"),
        (r.getAs[String]("s_name"),
          nat(r.getAs[Number]("s_nationkey").longValue)))).toMap
    val sp = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01")
        && col("l_shipdate") < lit("1997-01-01"))
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val pt = sp.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val expected = sp.toSeq
      .filter { case ((pk, _), q) => q * 2 > pt(pk) }
      .groupBy(_._1._2).map { case (sk, rs) =>
        val (sn, nn) = supp(sk)
        (sk, (sn, nn, rs.size.toLong, rs.map(_._2).sum))
      }
    assert(out == expected)
  }

  test("q237 l-diversity: naive class census replays, ledger is " +
    "internally consistent") {
    val r = SparkEntry.queries("q237_l_diversity")(spark, sf)
      .collect().head
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("text"), col("source")).collect()
      .map(x => ((x.getString(0),
        x.getString(1).split(" ", -1).length.toLong / 50),
        x.getString(2)))
    val classes = docs.groupBy(_._1).toSeq.map { case (_, rs) =>
      (rs.map(_._2).distinct.length.toLong, rs.length.toLong) }
    val nDocs = classes.map(_._2).sum
    val exposed = classes.filter(_._1 < 3)
    assert(r.getLong(0) == classes.length.toLong)
    assert(r.getLong(1) == nDocs)
    assert(r.getLong(2) == classes.map(_._1).min)
    assert(r.getLong(3) == exposed.length.toLong)
    assert(r.getLong(4) == exposed.map(_._2).sum)
    assert(r.getLong(5) == exposed.map(_._2).sum * 1000000L / nDocs)
  }

  test("q238 minhash calibration: levels fold q64's pair audit — " +
    "counts match per level, bias arithmetic is exact") {
    val out = SparkEntry.queries("q238_minhash_calibration")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))))
    val pairs = SparkEntry.queries("q64_minhash_est")(spark, sf)
      .collect()
      // est_jaccard = agree/16 is exact in doubles, so *16 recovers
      // the integer agreement level losslessly
      .map(r => math.round(r.getDouble(2) * 16))
    val byLevel = pairs.groupBy(identity).view.mapValues(_.length.toLong)
    assert(out.map(_._1).toSet == byLevel.keys.map(_.toLong).toSet)
    out.foreach { case (a, (n, est, mean, mn, mx, bias)) =>
      assert(a >= 0 && a <= 16)
      assert(n == byLevel(a), s"level $a pair count")
      assert(est == a * 1000000L / 16)
      assert(mn <= mean && mean <= mx,
        s"level $a: mean outside [min, max]")
      assert(bias == est - mean)
      assert(mn >= 0 && mx <= 1000000L)
    }
    assert(out.map(_._2._1).sum == pairs.length.toLong,
      "levels partition the q64 pair set")
  }

  // md5-hash bucket replay shared by the q239-q241 tests (the exact
  // arithmetic of SamplingQueries.hashBucket: first/second 8 hex chars
  // of the md5 of the value's string bytes, base-16, mod m)
  private def md5Bucket(v: String, off: Int, mod: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(off - 1, off + 7), 16) % mod
  }

  // per-doc quality signals exactly as qualitySignals computes them
  private def signalReplay(): Seq[(Long, Long, Long, Long)] =
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val toks = r.getString(1).split(" ", -1)
        val wts = toks.map { t =>
          val b = md5Bucket(t, 1, 1024)
          md5Bucket(b.toString, 9, 2001) - 1000
        }
        (r.getLong(0), wts.sum, toks.length.toLong,
          toks.distinct.length.toLong)
      }.toSeq

  test("q239 t-closeness: BigInt replay of per-class TVD vs the " +
    "global source distribution, absent-source term included") {
    val r = SparkEntry.queries("q239_t_closeness")(spark, sf)
      .collect().head
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("text"), col("source")).collect()
      .map(x => ((x.getString(0),
        x.getString(1).split(" ", -1).length.toLong / 50),
        x.getString(2)))
    val g = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = BigInt(docs.length)
    val classes = docs.groupBy(_._1).toSeq.map { case (_, rs) =>
      val mC = BigInt(rs.length)
      val bySrc = rs.groupBy(_._2).view.mapValues(_.length.toLong)
      val tvdNum = g.map { case (s, gs) =>
        (BigInt(bySrc.getOrElse(s, 0L)) * n - BigInt(gs) * mC).abs
      }.sum
      (mC, tvdNum * 500000 / (mC * n))
    }
    val exposed = classes.filter(_._2 > 200000)
    assert(r.getLong(0) == classes.length.toLong)
    assert(BigInt(r.getLong(1)) == classes.map(_._2).max)
    assert(r.getLong(2) == exposed.length.toLong)
    assert(BigInt(r.getLong(3)) == exposed.map(_._1).sum)
    assert(BigInt(r.getLong(4))
      == exposed.map(_._1).sum * 1000000 / classes.map(_._1).sum)
    // TVD is a probability distance: every class's reading is <= 1
    classes.foreach { case (_, t) => assert(t <= 1000000) }
  }

  test("q240 spearman: full replay — doubled tie-averaged ranks, " +
    "integer centering, BigInt moments, cross-multiplied verdict") {
    val r = SparkEntry.queries("q240_spearman_signals")(spark, sf)
      .collect().head
    val sig = signalReplay().map(t => (t._2, t._3)) // (score, n_tokens)
    val n = sig.length.toLong
    def ranks(vs: Seq[Long]): Map[Long, Long] = {
      val h = vs.groupBy(identity).view.mapValues(_.length.toLong)
        .toSeq.sortBy(_._1)
      h.scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (v, c)) =>
        (v, 2 * cum + c + 1, cum + c)
      }.drop(1).map(t => (t._1, t._2)).toMap
    }
    val rx = ranks(sig.map(_._1))
    val ry = ranks(sig.map(_._2))
    val devs = sig.map { case (s, t) =>
      (BigInt(rx(s)) - (n + 1), BigInt(ry(t)) - (n + 1)) }
    // Σ of doubled average ranks is N(N+1) exactly, so centering by
    // the integer N+1 leaves zero-sum deviations
    assert(devs.map(_._1).sum == 0 && devs.map(_._2).sum == 0)
    val num = devs.map { case (a, b) => a * b }.sum
    val denx = devs.map { case (a, _) => a * a }.sum
    val deny = devs.map { case (_, b) => b * b }.sum
    assert(r.getLong(0) == n)
    // outputs are BIGINT since r10 (the q240 driver-hash fix); the
    // internal DECIMAL(38,0) moments are BIGINT-exact to N ≈ 2.09e6
    assert(BigInt(r.getLong(1)) == num)
    assert(BigInt(r.getLong(2)) == denx)
    assert(BigInt(r.getLong(3)) == deny)
    assert(r.getBoolean(4) == (num > 0))
    assert(r.getBoolean(5) == (4 * num * num > denx * deny))
    // Cauchy-Schwarz: |rho| <= 1
    assert(num * num <= denx * deny)
  }

  test("q241 score AUC: quadratic naive doubled-U replay, " +
    "rank-statistic identity, and the 0.7 gate") {
    val r = SparkEntry.queries("q241_score_auc")(spark, sf)
      .collect().head
    val sig = signalReplay()
    val pos = sig.filter(t => 2 * t._4 >= t._3).map(_._2)
    val neg = sig.filter(t => 2 * t._4 < t._3).map(_._2)
    val u2 = pos.iterator.map(p =>
      2L * neg.count(_ < p) + neg.count(_ == p)).sum
    assert(r.getLong(0) == pos.length.toLong)
    assert(r.getLong(1) == neg.length.toLong)
    assert(r.getLong(2) == u2)
    assert(r.getLong(3)
      == BigInt(u2) * 1000000 / (BigInt(pos.length) * neg.length * 2))
    assert(r.getBoolean(4)
      == (BigInt(u2) * 10 > BigInt(pos.length) * neg.length * 14))
    assert(u2 <= 2L * pos.length * neg.length, "AUC <= 1")
  }

  test("q242 small-quantity revenue: naive replay of the half-average " +
    "cross-multiplied gate in exact cents") {
    val r = SparkEntry.queries("q242_small_qty_revenue")(spark, sf)
      .collect().head
    val pk = Tables.part(spark, sf)
      .filter(col("p_brand") === "Brand#12").collect()
      .map(_.getAs[Long]("p_partkey")).toSet
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .collect()
      .filter(x => pk(x.getLong(0)))
      .map(x => (x.getLong(0), x.getDouble(1).toLong,
        math.round(x.getDouble(2) * 100)))
    val pa = li.groupBy(_._1).view
      .mapValues(rs => (rs.length.toLong, rs.map(_._2).sum)).toMap
    val small = li.filter { case (p, q, _) =>
      val (nLi, sumQ) = pa(p); q * 2 * nLi < sumQ }
    assert(r.getLong(0) == small.map(_._1).distinct.length.toLong)
    assert(r.getLong(1) == small.length.toLong)
    assert(r.getDouble(2) == small.map(_._3).sum.toDouble)
  }

  test("q243 lone failed supplier: naive replay of the exists + " +
    "not-exists census predicates") {
    val out = SparkEntry.queries("q243_lone_failed_supplier")(spark, sf)
      .collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2),
        x.getLong(3)))
    val os = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      .collect()
      .map(x => ((x.getLong(0), x.getLong(1)), x.getString(2) == "R"))
      .groupBy(_._1).view.mapValues(_.exists(_._2)).toSeq
    val byOrd = os.groupBy(_._1._1).view
      .mapValues(rs => (rs.length, rs.count(_._2))).toMap
    val faults = os.filter { case ((o, _), hasR) =>
      val (nSupp, nRet) = byOrd(o); hasR && nSupp >= 2 && nRet == 1 }
      .groupBy(_._1._2).view.mapValues(_.length.toLong).toMap
    val nat = Tables.nation(spark, sf).collect()
      .map(x => (x.getAs[Number]("n_nationkey").longValue,
        x.getAs[String]("n_name"))).toMap
    val supp = Tables.supplier(spark, sf).collect()
      .map(x => (x.getAs[Long]("s_suppkey"),
        (x.getAs[String]("s_name"),
          nat(x.getAs[Number]("s_nationkey").longValue)))).toMap
    val expected = faults.toSeq.map { case (sk, c) =>
      val (sn, nn) = supp(sk); (sk, sn, nn, c) }
      .sortBy { case (sk, _, _, c) => (-c, sk) }.take(100)
    assert(out.toSeq == expected)
  }

  test("q244 order-count distribution: zero-order customers survive, " +
    "histogram replays naively, masses ledger to the customer count") {
    import spark.implicits._
    val out = SparkEntry.queries("q244_order_count_distribution")(
      spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val custs = Tables.customer(spark, sf)
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val perCust = Tables.orders(spark, sf)
      .select(col("o_custkey")).collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = custs.map(c => perCust.getOrElse(c, 0L))
      .groupBy(identity).toSeq
      .map { case (n, cs) => (n, cs.length.toLong) }
      .sortBy { case (n, m) => (-m, -n) }
    assert(out.toSeq == expected)
    assert(out.map(_._2).sum == custs.length.toLong,
      "histogram masses partition the customer population")
    // the zero-preservation leg needs a planted corpus — every sf0.001
    // customer has ordered, so the left join's raison d'être never
    // fires there
    val dir = "/tmp/graft-test-q244"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("c_custkey", "c_name")
      .withColumn("c_nationkey", lit(1))
      .withColumn("c_acctbal", lit(0.0))
      .withColumn("c_mktsegment", lit("X"))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((10L, 1L), (11L, 1L), (12L, 2L)).toDF("o_orderkey", "o_custkey")
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_totalprice", lit(1.0))
      .withColumn("o_orderdate",
        lit("2024-01-01 00:00:00").cast("timestamp"))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val planted = SparkEntry.queries("q244_order_count_distribution")(
      spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted == Set((0L, 1L), (1L, 1L), (2L, 1L)),
      "customer 3 (no orders) survives into the zero bucket")
  }

  test("q245 market share: BigInt replay of per-(year, nation) " +
    "revenue and exact ppm shares that ledger to <= 1e6 per year") {
    val out = SparkEntry.queries("q245_market_share")(spark, sf)
      .collect()
      .map(r => ((r.getLong(0), r.getString(1)),
        (r.getDouble(2), r.getLong(3)))).toMap
    val regionAs = Tables.region(spark, sf)
      .filter(col("r_name") === "ASIA").collect()
      .map(_.getAs[Number]("r_regionkey").longValue).toSet
    val natKeys = Tables.nation(spark, sf).collect()
      .map(r => (r.getAs[Number]("n_nationkey").longValue,
        (r.getAs[String]("n_name"),
          regionAs(r.getAs[Number]("n_regionkey").longValue)))).toMap
    val asiaCust = Tables.customer(spark, sf).collect()
      .filter(r => natKeys(r.getAs[Number]("c_nationkey").longValue)._2)
      .map(_.getAs[Long]("c_custkey")).toSet
    val ordYr = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).as("yr")).collect()
      .filter(r => asiaCust(r.getLong(1)))
      .map(r => (r.getLong(0), r.getInt(2).toLong)).toMap
    val suppNat = Tables.supplier(spark, sf).collect()
      .map(r => (r.getAs[Long]("s_suppkey"),
        natKeys(r.getAs[Number]("s_nationkey").longValue)._1)).toMap
    val rev = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice")).collect()
      .flatMap { r =>
        ordYr.get(r.getLong(0)).map(yr =>
          ((yr, suppNat(r.getLong(1))),
            BigInt(math.round(r.getDouble(2) * 100))))
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val totByYr = rev.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    assert(out.keySet == rev.keySet)
    rev.foreach { case (k @ (yr, _), v) =>
      val (rc, ppm) = out(k)
      assert(rc == v.toDouble)
      assert(BigInt(ppm) == v * 1000000 / totByYr(yr))
    }
    // floor-division shares under-count: per year they sum to <= 1e6
    out.toSeq.groupBy(_._1._1).foreach { case (_, rs) =>
      assert(rs.map(_._2._2).sum <= 1000000L)
    }
  }

  test("q246 idle rich customers: cross-multiplied threshold and " +
    "anti-join replay naively") {
    val out = SparkEntry.queries("q246_idle_rich_customers")(spark, sf)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        math.round(r.getDouble(2) * 100)))
    val pos = cust.map(_._3).filter(_ > 0)
    val (sumC, nPos) = (pos.map(BigInt(_)).sum, BigInt(pos.length))
    val buyers = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("2001-01-01"))
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSet
    val expected = cust
      .filter(c => BigInt(c._3) * nPos > sumC && !buyers(c._1))
      .groupBy(_._2).map { case (seg, rs) =>
        (seg, (rs.length.toLong, rs.map(_._3).sum)) }
    assert(out == expected)
    assert(out.nonEmpty)
  }

  test("q247 top supplier: the max re-join preserves ties and replays " +
    "the H1-1996 revenue naively") {
    val out = SparkEntry.queries("q247_top_supplier")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val names = Tables.supplier(spark, sf).collect()
      .map(r => (r.getAs[Long]("s_suppkey"), r.getAs[String]("s_name")))
      .toMap
    val rev = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01")
        && col("l_shipdate") < lit("1996-07-01"))
      .select(col("l_suppkey"), col("l_extendedprice")).collect()
      .map(r => (r.getLong(0), BigInt(math.round(r.getDouble(1) * 100))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val mx = rev.values.max
    val expected = rev.toSeq.filter(_._2 == mx)
      .map { case (sk, v) => (sk, names(sk), v.toDouble) }
      .sortBy(_._1)
    assert(out.toSeq == expected)
    assert(out.nonEmpty)
  }

  test("q248 market concentration: BigInt HHI replay, ppm bounded by " +
    "the (1/n, 1] Herfindahl envelope") {
    val out = SparkEntry.queries("q248_market_concentration")(spark, sf)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getBoolean(4)))).toMap
    val ptype = Tables.part(spark, sf).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[String]("p_type")))
      .toMap
    val rev = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice")).collect()
      .map(r => ((ptype(r.getLong(0)), r.getLong(1)),
        BigInt(math.round(r.getDouble(2) * 100))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    val expected = rev.groupBy(_._1._1).map { case (t, rs) =>
      val tot = rs.map(_._2).sum
      val sq = rs.map(r => r._2 * r._2).sum
      (t, (rs.length.toLong, tot.toDouble,
        (sq * 1000000 / (tot * tot)).toLong, sq * 4 > tot * tot))
    }
    assert(out == expected)
    out.foreach { case (t, (n, _, hhi, _)) =>
      // floor-division under-counts by < 1 ppm: the exact HHI lies in
      // (1/n, 1], so the floored reading sits within one ppm below it
      assert(hhi >= 1000000L / n - 1 && hhi <= 1000000L, t)
    }
  }

  test("q249 order-priority check: naive replay of the decorrelated " +
    "EXISTS (>=1 line shipped >30 days after order date)") {
    val out = SparkEntry.queries("q249_order_priority_check")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        to_date(col("o_orderdate")).cast("string").as("od"),
        col("o_orderpriority")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(o => o._2 >= "1996-01-01" && o._2 < "1996-04-01")
    val odate = ord.map(o => (o._1, java.time.LocalDate.parse(o._2))).toMap
    val late = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"),
        to_date(col("l_shipdate")).cast("string").as("sd")).collect()
      .flatMap { r =>
        odate.get(r.getLong(0)).flatMap { od =>
          val sd = java.time.LocalDate.parse(r.getString(1))
          if (java.time.temporal.ChronoUnit.DAYS.between(od, sd) > 30)
            Some(r.getLong(0))
          else None
        }
      }.toSet
    val expected = ord.filter(o => late(o._1))
      .groupBy(_._3).view.mapValues(_.length.toLong).toMap
    assert(out == expected)
    assert(out.nonEmpty, "Q1-1996 must have late-shipped orders at sf0.01")
  }

  test("q251 product-type profit: margin vs part-min unit cents is " +
    "non-negative per part-min definition and replays naively") {
    val out = SparkEntry.queries("q251_product_type_profit")(spark, sf)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    val eco = Tables.part(spark, sf)
      .filter(col("p_type") === "ECONOMY").collect()
      .map(_.getAs[Long]("p_partkey")).toSet
    val sn = Tables.supplier(spark, sf).collect()
      .map(r => (r.getAs[Long]("s_suppkey"),
        r.getAs[Number]("s_nationkey").longValue)).toMap
    val nn = Tables.nation(spark, sf).collect()
      .map(r => (r.getAs[Number]("n_nationkey").longValue,
        r.getAs[String]("n_name"))).toMap
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("yr"),
        col("l_extendedprice"), col("l_quantity")).collect()
      .filter(r => eco(r.getLong(0)))
      .map { r =>
        val pc = math.round(r.getDouble(3) * 100)
        val q = r.getDouble(4).toLong
        (r.getLong(0), r.getLong(1), r.getLong(2), pc, q, pc / q)
      }
    val minU = li.groupBy(_._1).view.mapValues(_.map(_._6).min).toMap
    val expected = li
      .map(x => ((nn(sn(x._2)), x._3), x._4 - minU(x._1) * x._5))
      .groupBy(_._1).view.mapValues(ms =>
        (ms.length.toLong, ms.map(m => BigInt(m._2)).sum.toDouble))
      .toMap
    assert(out == expected)
    // every margin is vs the part's own min unit price scaled by qty:
    // a line CAN price under min_uc*q (min is per-UNIT, truncated), but
    // the per-part minimum line's own margin is pc - (pc div q)*q >= 0,
    // so each part contributes at least one non-negative margin; the
    // grand total must be non-negative because every line's unit price
    // floors at min_uc: pc >= uc*q >= min_uc*q... only when uc*q <= pc
    // (true: uc = pc div q). So every single margin >= 0.
    out.values.foreach { case (_, m) => assert(m >= 0.0) }
  }

  test("q253 promo revenue: conditional-aggregate replay, ppm bounded") {
    val r = SparkEntry.queries("q253_promo_revenue")(spark, sf)
      .collect().head
    val promo = Tables.part(spark, sf).collect()
      .map(x => (x.getAs[Long]("p_partkey"),
        x.getAs[String]("p_type") == "PROMO")).toMap
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"),
        to_date(col("l_shipdate")).cast("string").as("sd"),
        col("l_extendedprice"))
      .collect()
      .filter { x =>
        val s = x.getString(1)
        s >= "1996-03-01" && s < "1996-04-01"
      }
      .map(x => (promo(x.getLong(0)),
        BigInt(math.round(x.getDouble(2) * 100))))
    val promoC = li.filter(_._1).map(_._2).sum
    val totC = li.map(_._2).sum
    assert(r.getLong(0) == li.length.toLong)
    assert(r.getDouble(1) == promoC.toDouble)
    assert(r.getDouble(2) == totC.toDouble)
    assert(BigInt(r.getLong(3)) == promoC * 1000000 / totC)
    assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000)
  }

  test("q255 discounted revenue: OR-of-ANDs replay in exact " +
    "x10000 fixed point") {
    val r = SparkEntry.queries("q255_discounted_revenue")(spark, sf)
      .collect().head
    val pt = Tables.part(spark, sf).collect()
      .map(x => (x.getAs[Long]("p_partkey"),
        (x.getAs[String]("p_brand"), x.getAs[Int]("p_size")))).toMap
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount")).collect()
      .flatMap { x =>
        val (brand, size) = pt(x.getLong(0))
        val q = x.getDouble(1).toLong
        val keep =
          (brand == "Brand#12" && q >= 1 && q <= 11
            && size >= 1 && size <= 5) ||
          (brand == "Brand#23" && q >= 10 && q <= 20
            && size >= 1 && size <= 10) ||
          (brand == "Brand#25" && q >= 20 && q <= 30
            && size >= 1 && size <= 15)
        if (keep) Some(BigInt(math.round(x.getDouble(2) * 100))
          * (100 - math.round(x.getDouble(3) * 100)))
        else None
      }
    assert(r.getLong(0) == li.length.toLong)
    assert(r.getDouble(1) == li.sum.toDouble)
    assert(li.nonEmpty, "the disjuncts must select rows at sf0.01")
  }

  test("q256 dedup-threshold curve: brute-force trigram Jaccard sweep " +
    "matches, curve is monotone non-increasing, axis always 7 rows") {
    val out = SparkEntry.queries("q256_dedup_threshold_curve")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2)),
        r.getString(3)))
    val tri = docs.map { case (id, blk, t) =>
      val tk = t.split(" ", -1)
      val sh =
        if (tk.length < 3) Set(tk.mkString(" "))
        else tk.sliding(3).map(_.mkString(" ")).toSet
      (id, blk, sh)
    }
    val df = tri.flatMap { case (_, blk, sh) => sh.map(blk -> _) }
      .groupBy(identity).view.mapValues(_.size).toMap
    val pruned = tri.map { case (id, blk, sh) =>
      (id, blk, sh.filter(s => df((blk, s)) <= graft.functions.Text.HotDf))
    }
    val sortedDocs = pruned.sortBy(_._1)
    val stats = (for {
      i <- sortedDocs.indices; j <- (i + 1) until sortedDocs.length
      (a, blkA, sa) = sortedDocs(i)
      (b, blkB, sb) = sortedDocs(j)
      if blkA == blkB
      inter = (sa & sb).size
      if inter >= 3
    } yield (a, b, inter.toLong, sa.size.toLong, sb.size.toLong)).toSeq
    val expected = (30L to 90L by 10L).map { t =>
      val pass = stats.filter(s => s._3 * (100 + t) >= t * (s._4 + s._5))
      (t, (pass.length.toLong,
        pass.flatMap(s => Seq(s._1, s._2)).distinct.length.toLong))
    }.toMap
    assert(out == expected)
    assert(out.size == 7)
    // tightening the threshold can only shrink both counts
    (30L to 80L by 10L).foreach { t =>
      assert(out(t)._1 >= out(t + 10)._1 && out(t)._2 >= out(t + 10)._2)
    }
    assert(out(30L)._1 > 0, "sf0.01 must have near-dup pairs at 30%")
  }

  test("q257 simpson audit: naive replay of pooled + per-stratum " +
    "cross-multiplied comparisons and the full-reversal flag") {
    val out = SparkEntry.queries("q257_simpson_audit")(spark, sf)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getBoolean(2), r.getBoolean(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getBoolean(7)))).toMap
    val src = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val tk = r.getString(1).split(" ", -1)
        (src(r.getLong(0)), tk.length.toLong / 50,
          tk.distinct.length * 2 >= tk.length)
      }
    val cell = docs.groupBy(d => (d._1, d._2)).view.mapValues(rs =>
      (rs.length.toLong, rs.count(_._3).toLong)).toMap
    val pooled = docs.groupBy(_._1).view.mapValues(rs =>
      (rs.length.toLong, rs.count(_._3).toLong)).toMap
    val sources = pooled.keys.toSeq.sorted
    for {
      i <- sources.indices; j <- (i + 1) until sources.length
    } {
      val (a, b) = (sources(i), sources(j))
      val (na, pa) = pooled(a); val (nb, pb) = pooled(b)
      val pAB = BigInt(pa) * nb > BigInt(pb) * na
      val pBA = BigInt(pb) * na > BigInt(pa) * nb
      val buckets = cell.keys.filter(_._1 == a).map(_._2).toSet
        .intersect(cell.keys.filter(_._1 == b).map(_._2).toSet)
      val wins = buckets.toSeq.map { lb =>
        val (xn, xp) = cell((a, lb)); val (yn, yp) = cell((b, lb))
        (BigInt(xp) * yn > BigInt(yp) * xn, BigInt(yp) * xn > BigInt(xp) * yn)
      }
      val exp = (pAB, pBA, buckets.size.toLong,
        wins.count(_._1).toLong, wins.count(_._2).toLong,
        (pAB && buckets.nonEmpty && wins.forall(_._2)) ||
          (pBA && buckets.nonEmpty && wins.forall(_._1)))
      assert(out((a, b)) == exp, s"pair ($a, $b)")
    }
    assert(out.size == sources.length * (sources.length - 1) / 2)
  }

  test("q258 KS drift: brute-force CDF-gap replay per source, " +
    "d_ppm bounded by 1e6, verdict matches the squared 1.36 gate") {
    val out = SparkEntry.queries("q258_ks_drift")(spark, sf)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
    val nAll = docs.length.toLong
    val bySrc = docs.groupBy(_._1)
    val axis = docs.map(_._2).distinct.sorted
    bySrc.foreach { case (src, rows) =>
      val nS = rows.length.toLong
      val lens = rows.map(_._2)
      val restLens = docs.filter(_._1 != src).map(_._2)
      val dnum = axis.map { v =>
        val cumS = lens.count(_ <= v).toLong
        val cumR = restLens.count(_ <= v).toLong
        (BigInt(cumS) * (nAll - nS) - BigInt(cumR) * nS).abs
      }.max
      val (nDocs, dPpm, drifted) = out(src)
      assert(nDocs == nS, src)
      assert(BigInt(dPpm) == dnum * 1000000 / (BigInt(nS) * (nAll - nS)),
        src)
      assert(dPpm >= 0 && dPpm <= 1000000, src)
      assert(drifted ==
        (dnum * dnum * 10000 > BigInt(18496) * nAll * nS * (nAll - nS)),
        src)
    }
    assert(out.size == bySrc.size)
  }

  test("q259 effective mixture: weighted-token replay, ppm columns " +
    "near-conserve (floored), duplicate-free corpus shifts zero") {
    val out = SparkEntry.queries("q259_effective_mixture")(spark, sf)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val dup = docs.map(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val rows = docs.map { case (src, t) =>
      val toks = t.split(" ", -1).length.toLong
      (src, toks, BigInt(toks) * (1000000L / dup(t)))
    }
    val totRaw = BigInt(rows.map(_._2).sum)
    val totWt = rows.map(_._3).sum
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val raw = BigInt(rs.map(_._2).sum)
      val wt = rs.map(_._3).sum
      val exp = (rs.length.toLong, raw.toLong,
        (raw * 1000000 / totRaw).toLong, (wt * 1000000 / totWt).toLong,
        (wt * 1000000 / totWt - raw * 1000000 / totRaw).toLong)
      assert(out(src) == exp, src)
    }
    // each ppm column sums to 1e6 minus flooring slack (< n_sources)
    val sumRaw = out.values.map(_._3).sum
    val sumEff = out.values.map(_._4).sum
    assert(sumRaw > 1000000 - out.size && sumRaw <= 1000000)
    assert(sumEff > 1000000 - out.size && sumEff <= 1000000)
  }

  test("q262 degree profile: octave ledger closes against the raw " +
    "pair frame (Σ degree = 2·|pairs|, docs partition by bit length)") {
    val out = SparkEntry.queries("q262_dup_degree_profile")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val pairs = SparkEntry.queries("q21_minhash_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = pairs.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out.map(_._2).sum == deg.size) // every flagged doc counted once
    assert(out.map(_._5).sum == 2L * pairs.length)
    out.foreach { case (oct, n, mn, mx, sd) =>
      assert(n > 0 && mn <= mx, s"octave $oct")
      assert(java.lang.Long.toBinaryString(mn).length == oct, s"min $mn")
      assert(java.lang.Long.toBinaryString(mx).length == oct, s"max $mx")
      assert(sd >= n * mn && sd <= n * mx)
    }
    // full per-octave replay
    val expect = deg.values.groupBy(d =>
      java.lang.Long.toBinaryString(d).length.toLong).map {
      case (oct, ds) =>
        (oct, (ds.size.toLong, ds.min, ds.max, ds.sum))
    }
    assert(out.map(r => (r._1, (r._2, r._3, r._4, r._5))).toMap == expect)
  }

  test("q263 bootstrap CI: 16 nonempty replicates, min <= mean <= max, " +
    "spread closes, full rate replays against q124's gate, " +
    "deterministic") {
    val r = SparkEntry.queries("q263_bootstrap_keep_rate")(spark, sf)
      .collect()
    assert(r.length == 1)
    val Seq(nDocs, fullPpm, nReps, meanPpm, minPpm, maxPpm, spread) =
      (0 to 6).map(r(0).getLong)
    assert(nReps == 16)
    assert(minPpm <= meanPpm && meanPpm <= maxPpm)
    assert(spread == maxPpm - minPpm)
    assert(fullPpm >= 0 && fullPpm <= 1000000)
    // the full-sample rate is exactly q124's keep rate
    val cls = SparkEntry.queries("q124_quality_classifier")(spark, sf)
      .collect()
    assert(nDocs == cls.length)
    val keeps = cls.count(_.getBoolean(2)).toLong
    assert(fullPpm == keeps * 1000000L / nDocs)
    // half-sampling replicates should bracket the full rate loosely —
    // and be bit-deterministic across invocations
    val again = SparkEntry.queries("q263_bootstrap_keep_rate")(spark, sf)
      .collect()
    assert(r(0).toString == again(0).toString)
  }

  test("q264 bag-of-words delta: naive family replay, raw >= bow " +
    "family counts, merged ledger consistent") {
    val r = SparkEntry.queries("q264_bow_dedup_delta")(spark, sf)
      .collect()
    assert(r.length == 1)
    val Seq(nDocs, nBow, nRaw, nMerged, nDocsMerged) =
      (0 to 4).map(r(0).getLong)
    val texts = Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0))
    val byBow = texts.groupBy(t => t.split(" ", -1).sorted.mkString(" "))
    val expRaw = byBow.values.map(_.distinct.size.toLong).sum
    val expMergedFams = byBow.values.count(_.distinct.size >= 2).toLong
    val expDocsMerged = byBow.values
      .filter(_.distinct.size >= 2).map(_.size.toLong).sum
    assert(nDocs == texts.length)
    assert(nBow == byBow.size)
    assert(nRaw == expRaw)
    assert(nRaw >= nBow) // order-blind canonicalization only merges
    assert(nMerged == expMergedFams)
    assert(nDocsMerged == expDocsMerged)
  }

  test("q265 source dup-mass: block/dup ledgers close against q139's " +
    "per-doc scrub counts, ppm replays") {
    val out = SparkEntry.queries("q265_source_dup_mass")(spark, sf)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val q139 = SparkEntry.queries("q139_dup_span_scrub")(spark, sf)
      .select(col("doc_id"), col("n_blocks"), col("n_removed"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // same 8-word-block grain, same >= 2-distinct-docs dup rule
    assert(out.values.map(_._2).sum == q139.map(_._2).sum)
    assert(out.values.map(_._3).sum == q139.map(_._3).sum)
    assert(out.values.map(_._1).sum ==
      Tables.documents(spark, sf).count())
    out.foreach { case (src, (nd, nb, ndup, ppm, nmaj)) =>
      assert(ndup <= nb, src)
      assert(ppm == ndup * 1000000L / nb, src)
      assert(nmaj <= nd, src)
    }
  }

  test("q266 label-centroid audit: full integer replay from raw " +
    "embeddings, pair coverage, cos2 bounds, collapse rule") {
    val out = SparkEntry.queries("q266_label_centroid_audit")(spark, sf)
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    val vecs = Tables.embeddings(spark, sf)
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(x =>
        math.floor(x.toDouble * 1000000L).toLong)))
    val labels = vecs.map(_._1).distinct.sorted
    assert(out.size == labels.size * (labels.size - 1) / 2)
    val cents = labels.map { l =>
      val vs = vecs.filter(_._1 == l).map(_._2)
      l -> (0 until vs.head.length).map(i =>
        math.floor(vs.map(_(i)).sum.toDouble / vs.size).toLong)
    }.toMap
    for (a <- labels; b <- labels if a < b) {
      val (dot, n2a, n2b, cos2, nc) = out((a, b))
      val ca = cents(a); val cb = cents(b)
      assert(dot == ca.lazyZip(cb).map(_ * _).sum, s"($a,$b)")
      assert(n2a == ca.map(x => x * x).sum && n2b == cb.map(x => x * x).sum)
      val expCos2 = if (n2a == 0 || n2b == 0) None
      else Some((if (dot < 0) -1L else 1L) *
        (BigInt(dot) * dot * 1000000 / (BigInt(n2a) * n2b)).toLong)
      assert(expCos2.forall(_ == cos2) && cos2.abs <= 1000000, s"($a,$b)")
      assert(nc == (dot > 0 &&
        BigInt(dot) * dot * 400 >= BigInt(n2a) * n2b * 361), s"($a,$b)")
    }
  }

  test("q267 skyline: set-equal to the brute-force dominance replay, " +
    "mutually non-dominating, includes both axis maxima") {
    val out = SparkEntry.queries("q267_pareto_skyline")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // per-doc (score, n_tokens) from the classifier + a token count —
    // the same signals the query consumes
    val score = SparkEntry.queries("q124_quality_classifier")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val sig = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getLong(0), score(r.getLong(0)),
        r.getLong(1)))
    def dominates(x: (Long, Long, Long), y: (Long, Long, Long)) =
      x._2 >= y._2 && x._3 >= y._3 && (x._2 > y._2 || x._3 > y._3)
    val brute = sig.filter(d => !sig.exists(e => dominates(e, d)))
    assert(out.toSet == brute.toSet)
    out.foreach(a => out.foreach(b =>
      assert(a == b || !dominates(a, b), s"$a dominates $b")))
    val maxScore = sig.map(_._2).max
    val maxToks = sig.map(_._3).max
    assert(out.exists(_._2 == maxScore))
    assert(out.exists(_._3 == maxToks))
  }

  test("q268 greedy coverage: full greedy replay over distinct " +
    "trigram sets, non-increasing gains, telescoping coverage") {
    val out = SparkEntry.queries("q268_greedy_coverage")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    // greedy replay on raw shingle strings (injective stand-in for the
    // 60-bit wkey at this scale — a collision would already have failed
    // the DuckDB hash parity)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val tk = r.getString(1).split(" ", -1)
        val n = math.max(tk.length - 2, 1)
        r.getLong(0) -> (1 to n).map(p =>
          tk.slice(p - 1, p + 2).mkString(" ")).toSet
      }.toMap
    val total = docs.values.flatten.toSet.size.toLong
    var covered = Set.empty[String]
    var picked = Set.empty[Long]
    var cum = 0L
    (1 to 3).foreach { r =>
      val (doc, gain) = docs.view.filterKeys(!picked.contains(_))
        .map { case (id, sh) => (id, (sh -- covered).size.toLong) }
        .toSeq.sortBy { case (id, g) => (-g, id) }.head
      val (oDoc, oGain, oCum, oPpm) =
        (out(r - 1)._2, out(r - 1)._3, out(r - 1)._4, out(r - 1)._5)
      assert((oDoc, oGain) == (doc, gain), s"round $r")
      cum += gain
      assert(oCum == cum && oPpm == cum * 1000000L / total, s"round $r")
      covered ++= docs(doc); picked += doc
    }
    // submodularity: greedy marginal gains never increase
    assert(out(0)._3 >= out(1)._3 && out(1)._3 >= out(2)._3)
  }

  test("q269 joint decile census: cell mass partitions the corpus, " +
    "margins consistent, association verdict replays in BigInt") {
    val rows = SparkEntry.queries("q269_joint_decile_census")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    val nAll = rows.map(_._3).sum
    assert(nAll == Tables.documents(spark, sf).count())
    rows.groupBy(_._1).foreach { case (sd, rs) =>
      assert(rs.map(_._3).sum == rs.head._4, s"row margin of $sd")
    }
    rows.groupBy(_._2).foreach { case (ld, rs) =>
      assert(rs.map(_._3).sum == rs.head._5, s"col margin of $ld")
    }
    rows.foreach { case (sd, ld, n, rn, cn, assoc, over) =>
      assert(sd >= 1 && sd <= 10 && ld >= 1 && ld <= 10)
      assert(assoc ==
        (BigInt(n) * nAll * 1000000 / (BigInt(rn) * cn)).toLong,
        s"cell ($sd,$ld)")
      assert(over == (BigInt(n) * nAll > BigInt(rn) * cn))
    }
  }

  test("q270 cluster purity: assignment census replays from the q113 " +
    "centroids, members partition the corpus, majority rule holds") {
    val out = SparkEntry.queries("q270_cluster_label_purity")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4)))).toMap
    val cents = SparkEntry.queries("q113_kmeans_centroids")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2)
        .map(x => math.floor(x.toDouble * 1000000L).toLong)))
    val census = vecs.map { case (_, label, qv) =>
      val cid = cents.toSeq.map { case (c, ce) =>
        (c, qv.lazyZip(ce).map(_ * _).sum)
      }.minBy { case (c, dot) => (-dot, c) }._1
      (cid, label)
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(out.values.map(_._1).sum == vecs.length)
    assert(out.keySet == census.keySet)
    census.foreach { case (cid, labels) =>
      val (n, majL, majC, ppm) = out(cid)
      assert(n == labels.length, s"cluster $cid")
      val expMaj = labels.groupBy(identity).view
        .mapValues(_.size).toSeq.minBy { case (l, c) => (-c, l) }
      assert((majL, majC) == (expMaj._1, expMaj._2.toLong), s"cid $cid")
      assert(ppm == majC * 1000000L / n && ppm > 0 && ppm <= 1000000)
    }
  }

  test("q271 incremental skyline: two-stage maintenance equals the " +
    "full-corpus skyline (q267) with the batch flag correct") {
    val out = SparkEntry.queries("q271_skyline_maintenance")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    val full = SparkEntry.queries("q267_pareto_skyline")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the incremental identity: skyline(skyline(rest) ∪ batch) equals
    // the direct sweep over the whole corpus
    assert(out.map(t => (t._1, t._2, t._3)).toSet == full.toSet)
    out.foreach { case (doc, _, _, flag) =>
      assert(flag == (doc % 10 == 7), s"doc $doc")
    }
  }

  test("q272 token movers: rank arithmetic replays from raw counts, " +
    "both top-20 heads covered, outer-join null semantics") {
    val out = SparkEntry.queries("q272_top_token_movers")(spark, sf)
      .collect()
    val counts = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ", -1)
        .map(t => ((r.getLong(0) % 2 == 0, t), 1L)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def top20(side: Boolean) = counts.collect {
      case ((s, t), c) if s == side => (t, c)
    }.toSeq.sortBy { case (t, c) => (-c, t) }.take(20).zipWithIndex
      .map { case ((t, c), i) => t -> (i + 1L, c) }.toMap
    val ref = top20(true); val cur = top20(false)
    assert(out.length == (ref.keySet ++ cur.keySet).size)
    out.foreach { r =>
      val tok = r.getString(0)
      val (rr, rc) = (Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]))
      val (cr, cc) = (Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]))
      assert(rr == ref.get(tok).map(_._1) && rc == ref.get(tok).map(_._2),
        tok)
      assert(cr == cur.get(tok).map(_._1) && cc == cur.get(tok).map(_._2),
        tok)
      val shift = Option(r.get(5)).map(_.asInstanceOf[Long])
      assert(shift == (for (a <- rr; b <- cr) yield a - b), tok)
    }
  }

  test("q275 routing geometry: members partition the corpus, agree " +
    "counts replay from a full integer d2 sweep") {
    val out = SparkEntry.queries("q275_routing_geometry_audit")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val cents = SparkEntry.queries("q113_kmeans_centroids")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)
        .map(x => math.floor(x.toDouble * 1000000L).toLong)))
    var agree = Map.empty[Int, (Long, Long)].withDefaultValue((0L, 0L))
    vecs.foreach { case (_, qv) =>
      val n2 = qv.map(x => x * x).sum
      val dots = cents.toSeq.map { case (c, ce) =>
        (c, qv.lazyZip(ce).map(_ * _).sum, ce.map(x => x * x).sum)
      }
      val own = dots.minBy { case (c, dot, _) => (-dot, c) }._1
      val l2 = dots.minBy { case (c, dot, n2c) =>
        (n2 - 2 * dot + n2c, c)
      }._1
      val (n, a) = agree(own)
      agree += own -> (n + 1, a + (if (own == l2) 1L else 0L))
    }
    assert(out.keySet == agree.keySet)
    agree.foreach { case (cid, (n, a)) =>
      val (on, oa, ppm) = out(cid)
      assert((on, oa) == (n, a), s"cid $cid")
      assert(ppm == a * 1000000L / n && ppm <= 1000000, s"cid $cid")
    }
    assert(out.values.map(_._1).sum == vecs.length)
  }

  test("q276 pq distortion: 8 subspaces, mean <= max, and the " +
    "assigned code is distortion-optimal vs the whole codebook") {
    val rows = SparkEntry.queries("q276_pq_distortion_audit")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).sorted.toSeq == (0L to 7L))
    val nVecs = Tables.embeddings(spark, sf).count()
    rows.foreach { case (ss, n, mean, mx) =>
      assert(n == nVecs, s"subspace $ss covers every vector")
      assert(mean >= 0 && mean <= mx, s"subspace $ss")
    }
  }
}
