package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOf, Calendar, Dedup, Merge, Skew}

/** Edge-case coverage for the operator library (empty sides, degenerate
  * groups, boundary dates).
  */
class EdgeCasesSpec extends AnyFunSuite with SparkSpec {

  test("asof join with empty right side yields all-null matches") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L)).toDF("user_id", "ts_us", "event_id")
    val right = Seq.empty[(Long, Long, Long)]
      .toDF("user_id", "ts_us", "event_id")
    val out = AsOf.join(left, right, "user_id", "ts_us", "event_id",
      "event_id").collect()
    assert(out.length == 1 && out.head.isNullAt(3))
  }

  test("saltedJoin equals the plain join, including empty and hot keys") {
    import spark.implicits._
    val fact = (Seq.fill(100)((7L, 1.0)) ++ Seq((8L, 2.0), (9L, 3.0)))
      .toDF("fk", "v") // key 7 is hot
    val dim = Seq((7L, "hot"), (8L, "cold")).toDF("dk", "name")
    val salted = Skew.saltedJoin(fact, dim, "fk", "dk", saltBuckets = 4)
      .groupBy(col("name")).agg(count(lit(1)).as("n"),
        sum(col("v")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1),
        r.getDouble(2))).toMap
    assert(salted == Map("hot" -> ((100L, 100.0)), "cold" -> ((1L, 2.0))))
    // unmatched fact key 9 drops (inner); empty dim -> empty output
    val empty = Skew.saltedJoin(fact,
      Seq.empty[(Long, String)].toDF("dk", "name"), "fk", "dk", 4)
    assert(empty.count() == 0)
  }

  test("planJoin salts skewed input, stays plain on uniform, rows equal") {
    import spark.implicits._
    val dim = (1L to 10L).map(k => (k, s"d$k")).toDF("dk", "name")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(col("fk"), col("v"), col("name"))
        .collect().map(_.mkString("|")).toSeq.sorted
    // hot key 7 owns 100 of 108 rows, ALL byte-identical clones:
    // factor = (100/108)*9 ≈ 8.3
    val skewed = (Seq.fill(100)((7L, 1.0)) ++
      (1L to 9L).filter(_ != 7L).map(k => (k, k.toDouble)))
      .toDF("fk", "v")
    val (sj, sd) = Skew.planJoin(skewed, dim, "fk", "dk",
      skewThreshold = 4.0, saltBuckets = 4)
    assert(sd.salted && sd.skewFactor > 4.0 && sd.topKeyRows == 100L)
    assert(canon(sj) == canon(skewed.join(dim, $"fk" === $"dk")))
    // the 100 hot rows are BYTE-IDENTICAL -> full-row-hash salt collapses
    // to one bucket; the decision must surface that, not hide it
    assert(sd.topKeySalts.contains(1L) && !sd.saltEffective)
    // same skew but rows carry a distinguishing value -> salt spreads
    val distinct = ((1L to 100L).map(i => (7L, i.toDouble)) ++
      (1L to 9L).map(k => (k, k.toDouble))).toDF("fk", "v")
    val (dj, dd) = Skew.planJoin(distinct, dim, "fk", "dk",
      skewThreshold = 4.0, saltBuckets = 4)
    assert(dd.salted && dd.topKeySalts.exists(_ > 1L) && dd.saltEffective)
    assert(canon(dj) == canon(distinct.join(dim, $"fk" === $"dk")))
    // uniform: factor 1.0 -> plain join, same rows
    val uniform = (1L to 10L).map(k => (k, k.toDouble)).toDF("fk", "v")
    val (uj, ud) = Skew.planJoin(uniform, dim, "fk", "dk")
    assert(!ud.salted && math.abs(ud.skewFactor - 1.0) < 1e-9)
    assert(canon(uj) == canon(uniform.join(dim, $"fk" === $"dk")))
    // empty fact: no keys, plain path, empty output
    val (ej, ed) = Skew.planJoin(
      Seq.empty[(Long, Double)].toDF("fk", "v"), dim, "fk", "dk")
    assert(!ed.salted && ed.nKeys == 0L && ej.count() == 0)
  }

  test("incrementalByRowDigest: null-safe, within-batch and vs-index") {
    import spark.implicits._
    // rows 1 and 2 would collide under concat_ws('|') digesting
    // (NULL-skip shifts fields); they must BOTH survive
    val day1 = Seq((1L, Option.empty[String], Some("eng")),
      (2L, Some("eng"), Option.empty[String]),
      (2L, Some("eng"), Option.empty[String])) // within-batch dup
      .toDF("id", "a", "b")
    val (fresh1, dig1) = Dedup.incrementalByRowDigest(day1, None)
    assert(fresh1.count() == 2 && dig1.count() == 2)
    // day 2 re-ships row 1 and adds a new row: only the new one is fresh
    val day2 = Seq((1L, Option.empty[String], Some("eng")),
      (3L, Some("ops"), Some("x"))).toDF("id", "a", "b")
    val (fresh2, _) = Dedup.incrementalByRowDigest(day2, Some(dig1))
    assert(fresh2.collect().map(_.getLong(0)).toSeq == Seq(3L))
    // reserved column name refused, not clobbered
    assertThrows[IllegalArgumentException] {
      Dedup.incrementalByRowDigest(
        day1.withColumnRenamed("a", "__digest"), None)
    }
  }

  test("csvQuarantine: all-bad file yields empty good side, not a crash") {
    val dir = java.nio.file.Files.createTempDirectory("qtest")
    val f = dir.resolve("bad.csv")
    java.nio.file.Files.writeString(f,
      "emp_id,emp_name,emp_age\nx,y,z\nnope,also,bad\n")
    val (good, bad) = graft.sources.Sources.csvQuarantine(spark,
      f.toString, Schemas.empDataRaw)
    assert(good.count() == 0)
    assert(bad.count() == 2)
  }

  test("dateRange spans leap day; workingDays drops weekends") {
    val days = Calendar.dateRange(spark, "2024-02-28", "2024-03-01")
    val ds = days.collect().map(_.getDate(0).toString)
    assert(ds.toSeq == Seq("2024-02-28", "2024-02-29", "2024-03-01"))
    // 2024-03-02/03 are Sat/Sun
    val wk = Calendar.dateRange(spark, "2024-03-01", "2024-03-04")
    import spark.implicits._
    val holidays = Seq.empty[String].toDF("hd")
      .withColumn("hd", to_date(col("hd")))
    val working = Calendar.workingDays(wk, holidays, "hd")
      .collect().map(_.getDate(0).toString)
    assert(working.toSeq.sorted == Seq("2024-03-01", "2024-03-04"))
  }

  test("keepFirst with fully identical rows keeps exactly one") {
    import spark.implicits._
    val df = Seq.fill(5)((1L, "x", 7L)).toDF("k", "v", "ord")
    val out = Dedup.keepFirst(df, Seq("k"), Seq(col("ord").desc))
    assert(out.count() == 1)
  }

  test("upsert with empty staging returns dim unchanged; empty dim returns staging") {
    import spark.implicits._
    val dim = Seq((1L, "a")).toDF("k", "v")
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    assert(Merge.upsert(dim, empty, Seq("k")).collect().map(_.toSeq).toSet
      == dim.collect().map(_.toSeq).toSet)
    assert(Merge.upsert(empty, dim, Seq("k")).collect().map(_.toSeq).toSet
      == dim.collect().map(_.toSeq).toSet)
  }

  test("exactByHash on empty frame is empty, not an error") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.exactByHash(empty, "text", "doc_id").count() == 0)
  }

  test("saltedSum on empty input is empty; single hot key recombines") {
    import graft.operators.Skew
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(Skew.saltedSum(empty, Seq("k"), "v", "s").count() == 0)
    // one key, many rows: every salt bucket holds a partial; the final
    // combine must reassemble the exact total
    val hot = Seq.fill(1000)((7L, 3L)).toDF("k", "v")
    val got = Skew.saltedSum(hot, Seq("k"), "v", "s").collect()
    assert(got.length == 1 && got.head.getLong(1) == 3000L)
  }

  test("sampleFrames on an empty payload still emits frame 0") {
    import spark.implicits._
    import graft.multimodal.Multimodal
    val assets = Multimodal.toAssets(spark,
      Seq((5L, "")).toDF("doc_id", "text"))
    val frames = Multimodal.sampleFrames(spark, assets, 1).collect()
    // n/100 + 1 = 1 frame of zero bytes — matches FakeDecoder's count
    assert(frames.length == 1 && frames.head.frame.isEmpty)
  }

  test("connectedComponents with a self-loop-only vertex labels itself") {
    import graft.operators.Components
    import spark.implicits._
    val edges = Seq((5L, 5L), (1L, 2L)).toDF("src", "dst")
    val got = Components.connectedComponents(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(5L -> 5L, 1L -> 1L, 2L -> 1L))
  }

  /** Tiny documents-only corpus on disk, for queries keyed to an sf dir. */
  private def docsDir(rows: Seq[(Long, String, String, String, Long)])
      : String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("docs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q139 scrub: full clones scrub to the empty string, a lone " +
    "distinct doc passes through untouched") {
    val body = ("alpha beta gamma delta epsilon zeta eta theta " * 4).trim
    val d = docsDir(Seq(
      (1L, body, "en", "s0", body.length.toLong),
      (2L, body, "en", "s0", body.length.toLong), // exact clone
      (3L, "one two three", "en", "s0", 13L)))
    val out = SparkEntry.queries("q139_dup_span_scrub")(spark, d)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))).toMap
    // clones: every block is shared -> fully scrubbed to ''
    val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"
    for (id <- Seq(1L, 2L)) {
      val (nb, nr, md5c, chars) = out(id)
      assert(nb == nr && md5c == emptyMd5 && chars == 0L,
        s"clone $id must scrub fully: $nb/$nr/$chars")
    }
    // the distinct doc keeps its exact text
    val (nb3, nr3, _, chars3) = out(3L)
    assert(nr3 == 0L && chars3 == 13L && nb3 == 1L)
  }

  test("q141 pagerank: a single-source corpus has no edges — rank " +
    "sits exactly on the damping base with zero strength") {
    val d = docsDir(Seq(
      (1L, "a b c d e f g h i j", "en", "only", 19L),
      (2L, "k l m n o p q r s t", "en", "only", 19L)))
    val out = SparkEntry.queries("q141_domain_pagerank")(spark, d)
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 150000L && out.head.getLong(2) == 0L)
  }

  test("q147 gopher gate: single-token and short docs are vacuous " +
    "keeps; a pure chant doc fails every family") {
    val d = docsDir(Seq(
      (1L, "solo", "en", "s0", 4L), // 1 token: no grams at any n
      (2L, "a b", "en", "s0", 3L), // bigram only, top2==nb2==1 → fail 2
      (3L, ("spam ham " * 20).trim, "en", "s0", 159L), // chant
      (4L, "one two three four five six seven eight nine ten",
        "en", "s0", 49L))) // all-distinct grams
    val out = SparkEntry.queries("q147_gopher_repetition")(spark, d)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(2) == 0L && out(1L).getBoolean(8)) // vacuous
    // 2 tokens: the single bigram is 100% of bigrams → fails the 20% rule
    assert(!out(2L).getBoolean(8))
    assert(!out(3L).getBoolean(8)) // chant dominated at every n
    assert(out(4L).getBoolean(8)) // all-distinct: top == 1 everywhere
  }

  test("q155 datasheet: all-clone stratum reports n_unique=1") {
    val d = docsDir(Seq(
      (1L, "same text", "en", "s0", 9L),
      (2L, "same text", "en", "s0", 9L),
      (3L, "same text", "en", "s0", 9L)))
    val r = SparkEntry.queries("q155_corpus_datasheet")(spark, d)
      .collect().head
    assert(r.getLong(2) == 3L && r.getLong(5) == 1L && r.getLong(6) == 2L)
  }

  test("q163 audio near-dup: small clone groups pair fully; a clone " +
    "group past the bucket cap is suppressed, not spilled") {
    val wave = (0 until 800).map(i => ((i * 37 + i * i % 53) % 94 + 32)
      .toChar).mkString
    def clones(n: Int, base: Long) = (0 until n).map(i =>
      (base + i, wave, "en", "s0", wave.length.toLong))
    val small = docsDir(clones(3, 1L))
    val pairs = SparkEntry.queries("q163_audio_neardup")(spark, small)
      .collect()
    assert(pairs.length == 3, "3 clones must yield C(3,2) pairs")
    pairs.foreach(r => assert(r.getLong(2) == 16L,
      "clones share every shingle key"))
    // 25 clones -> every fingerprint bucket holds 25 > 20 members ->
    // the cap (oracle-mirrored) suppresses the quadratic pair set
    val big = docsDir(clones(25, 1L))
    assert(SparkEntry.queries("q163_audio_neardup")(spark, big)
      .collect().isEmpty)
  }

  test("q161 compaction: a single-file partition plans one bin at " +
    "offset zero") {
    val d = docsDir(Seq((1L, "tiny", "en", "solo", 4L)))
    val out = SparkEntry.queries("q161_compaction_plan")(spark, d)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 0L && r.getLong(2) == 1L
      && r.getLong(3) == 4L && r.getLong(4) == 4L)
  }

  test("q166 balanced downsample: a single-class corpus keeps " +
    "everything with contiguous ranks") {
    val d = docsDir((1L to 7L).map(i =>
      (i, s"doc number $i text", "en", "s0", 16L)))
    val out = SparkEntry.queries("q166_balanced_downsample")(spark, d)
      .collect()
    assert(out.length == 7)
    assert(out.map(_.getLong(2)).sorted.toSeq == (1L to 7L))
  }

  test("q173 dedup savings: a pair-free corpus keeps every token " +
    "(share exactly 1.0)") {
    graft.queries.Shared.reset(spark)
    val d = docsDir(Seq(
      (1L, "alpha beta gamma delta", "en", "s0", 22L),
      (2L, "one two three four", "en", "s0", 18L)))
    try {
      val out = SparkEntry.queries("q173_dedup_savings")(spark, d)
        .collect()
      out.foreach { r =>
        assert(r.getLong(1) == r.getLong(2) && r.getLong(3) == r.getLong(4))
        assert(r.getDouble(5) == 1.0)
      }
    } finally graft.queries.Shared.reset(spark)
  }

  test("q186 semantic decontam: planted clones flag, an orthogonal " +
    "corpus stays clean") {
    import spark.implicits._
    def embDir(vecs: Seq[(Long, Array[Float])]): String = {
      val dir = java.nio.file.Files.createTempDirectory("emb").toString
      vecs.toDF("vec_id", "embedding")
        .withColumn("label", lit(0))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      dir
    }
    // all-identical corpus: every eval vector's nearest train vector is
    // an exact clone (cos = 1) -> everything flags
    val one = Array.fill(64)(0.5f)
    val clones = embDir((0L until 40L).map(i => (i, one)))
    val flagged = SparkEntry.queries("q186_semantic_decontam")(
      spark, clones).collect()
    assert(flagged.nonEmpty && flagged.forall(_.getBoolean(3)))
    // orthogonal corpus: cross dots are all zero -> nothing flags
    val ortho = embDir((0L until 40L).map(i =>
      (i, Array.tabulate(64)(j => if (j == i % 64) 1f else 0f))))
    val clean = SparkEntry.queries("q186_semantic_decontam")(
      spark, ortho).collect()
    assert(clean.nonEmpty && clean.forall(!_.getBoolean(3)))
  }

  test("staged dedup paths survive degenerate corpora: one family, " +
    "all-distinct, and the within-family algebra") {
    import spark.implicits._
    // SINGLE family: 6 copies of one text — every pair-generating op
    // must emit exactly C(6,2) = 15 within-family rows with degenerate
    // verdicts, through the canonical machinery (canonical corpus has
    // ONE doc, so cross candidate generation runs on a 1-row frame)
    val dir1 = "/tmp/graft-edge-onefam"
    (1L to 6L).map(i => (i, "alpha beta gamma delta epsilon", "en",
      "web", 30L)).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir1/documents.parquet")
    val p190 = SparkEntry.queries("q190_prefix_filter_join")(spark, dir1)
      .collect()
    assert(p190.length == 15)
    assert(p190.forall(r => r.getLong(2) == r.getLong(3)
      && r.getLong(3) == r.getLong(4)), "inter = na = nb on clones")
    val p21 = SparkEntry.queries("q21_minhash_pairs")(spark, dir1)
    assert(p21.count() == 15)
    val cl = SparkEntry.queries("q62_dup_clusters")(spark, dir1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cl.length == 6 && cl.forall(_._2 == 1L),
      "one cluster rooted at the min id")
    // ALL-DISTINCT corpus with no shared vocabulary: no pairs anywhere
    val dir2 = "/tmp/graft-edge-distinct"
    (1L to 5L).map(i => (i, (0 until 6).map(j => s"w${i}_$j")
      .mkString(" "), "en", "web", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    assert(SparkEntry.queries("q190_prefix_filter_join")(spark, dir2)
      .count() == 0)
    assert(SparkEntry.queries("q21_minhash_pairs")(spark, dir2)
      .count() == 0)
    assert(SparkEntry.queries("q62_dup_clusters")(spark, dir2)
      .count() == 0)
  }

  test("dHash: malformed payloads drop; a constant raster hashes to 0") {
    import graft.multimodal.Multimodal
    import spark.implicits._
    val garbage = spark.createDataset(Seq(
      Multimodal.Asset(1L, "image/x-portable-pixmap",
        Array[Byte]('P', '6', ' ')),
      Multimodal.Asset(2L, "image/x-portable-pixmap",
        "not an image at all".getBytes("US-ASCII"))))
    assert(Multimodal.dHash(spark, garbage).collect().isEmpty)
    // 1-char text -> every raster byte identical -> no gray drops
    val flat = Multimodal.imageAssets(spark,
      Seq((7L, "x")).toDF("doc_id", "text"))
    val hs = Multimodal.dHash(spark, flat).collect()
    assert(hs.length == 1 && hs.head.dhash == 0L)
  }

  test("q163 is BYTE-indexed on multi-byte text: shared-key counts " +
    "match an independent UTF-8-byte replay (VERDICT r7 #6)") {
    // multi-byte palette: é (2 bytes), 日 (3 bytes), plus ASCII — chars
    // and bytes diverge hard, so a char-indexed fingerprinter would
    // window the text differently and produce a different key count
    val palette = "aé7日xèk之m "
    val text = (0 until 220)
      .map(i => palette((i * 7 + i * i % 11) % palette.length)).mkString
    val bytes = text.getBytes("UTF-8")
    assert(bytes.length > text.length + 100, "probe must be multi-byte")
    assert(bytes.length >= 64 + 32 * 9, "need >= 2 shingles")
    // independent replay of audioShingles' arithmetic over UTF-8 BYTES
    val nWin = (bytes.length - 64) / 32 + 1
    val en = Array.tabulate(nWin, 8) { (i, m) =>
      (0 until 8).map(j => bytes(i * 32 + m * 8 + j) & 0xFF).sum
    }
    val sfs = (1 until nWin).map { i =>
      (0 until 7).map { m =>
        if ((en(i)(m) - en(i)(m + 1)) - (en(i - 1)(m) - en(i - 1)(m + 1)) > 0)
          1 << m
        else 0
      }.sum
    }
    val expectedKeys = (0 to sfs.length - 8)
      .map(k => sfs.slice(k, k + 8).mkString("-")).distinct.length
    assert(expectedKeys >= 2, "probe must clear the reporting floor")
    val d = docsDir((1L to 3L).map(i =>
      (i, text, "xx", "s0", text.length.toLong)))
    val pairs = SparkEntry.queries("q163_audio_neardup")(spark, d)
      .collect()
    assert(pairs.length == 3, "3 multi-byte clones must yield C(3,2) pairs")
    pairs.foreach(r => assert(r.getLong(2) == expectedKeys.toLong,
      "engine shared-key count must equal the byte-level replay — a " +
        "char-indexed implementation would disagree here"))
  }

  test("q204 PII scrub: planted emails and long digit runs are " +
    "counted and redacted; clean text passes length-identical") {
    val pii = "contact me at jane.doe+spam@ex-ample.org or call " +
      "123456789012 about order 4455"
    val clean = "no addresses and no long numbers 12345678 here"
    val d = docsDir(Seq(
      (1L, pii, "en", "s0", pii.length.toLong),
      (2L, clean, "en", "s0", clean.length.toLong)))
    val rows = SparkEntry.queries("q204_pii_scrub")(spark, d)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // doc 1: one email, one 12-digit run (the 4-digit order id stays)
    assert(rows(1L) == ((1L, 1L,
      pii.replaceAll("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+",
          "<EMAIL>")
        .replaceAll("[0-9]{9,}", "<NUM>").length.toLong)))
    // doc 2: 8-digit run is below the >= 9 floor; nothing redacts
    assert(rows(2L) == ((0L, 0L, clean.length.toLong)))
  }

  test("q205 TVD: disjoint vocabularies land exactly on the " +
    "nb/N closed form; a single source scores exactly zero") {
    // source A speaks only 'aa' (6 tokens), source B only 'bb' (4):
    // TVD(A) = nb/N = 4/10, TVD(B) = na/N = 6/10 — exact ppm floors
    val d = docsDir(Seq(
      (1L, "aa aa aa", "en", "A", 8L),
      (2L, "aa aa aa", "en", "A", 8L),
      (3L, "bb bb bb bb", "en", "B", 11L)))
    val out = SparkEntry.queries("q205_source_divergence")(spark, d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out("A") == ((6L, 400000L)))
    assert(out("B") == ((4L, 600000L)))
    // one source: its distribution IS the corpus distribution
    val d1 = docsDir(Seq((1L, "x y x", "en", "only", 5L),
      (2L, "y z", "en", "only", 3L)))
    val one = SparkEntry.queries("q205_source_divergence")(spark, d1)
      .collect()
    assert(one.length == 1 && one.head.getLong(2) == 0L)
  }

  test("mannWhitneyShift: a planted full separation hits rb = -1/+1 " +
    "exactly and flags the shift") {
    import spark.implicits._
    // cohort A all below cohort B: zero A-wins, rb = -1 exactly
    val rows = (1L to 10L).map(v => (1L, v, true)) ++
      (101L to 110L).map(v => (1L, v, false))
    val r = graft.operators.Stats.mannWhitneyShift(
        rows.toDF("k", "v", "ia"), "k", "v", "ia")
      .collect().head
    assert(r.getLong(3) == 0L, "no A-wins, no ties")
    assert(r.getLong(4) == -r.getLong(5), "rb = -1 exactly")
    assert(r.getBoolean(6), "full separation must flag")
  }

  test("q232 ESS: a clone-heavy source collapses toward its family " +
    "count while a distinct source keeps ESS = n exactly") {
    val d = docsDir(
      // source C: 4 clones of one text + 1 distinct -> weights
      // (250000 x4, 1000000): ESS = (2e6)^2/(4*250000^2+1e12) = 3.2
      (1L to 4L).map(i => (i, "clone clone clone", "en", "C", 17L)) ++
        Seq((5L, "unique text here", "en", "C", 16L),
          (6L, "one", "en", "D", 3L), (7L, "two", "en", "D", 3L)))
    val out = SparkEntry.queries("q232_effective_sample_size")(spark, d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    // C: sw = 2e6, sww = 4*6.25e10 + 1e12 = 1.25e12 -> ess = 3200
    assert(out("C") == ((5L, 3200L, 1562L)))
    // D: two distinct docs, uniform weights -> ESS = n, deff = 1
    assert(out("D") == ((2L, 2000L, 1000L)))
  }

  test("q171 empty sample: coalesce guard yields a defined zero " +
    "estimate and a defined verdict (VERDICT r7 #6)") {
    // ids whose md5 bucket (substr 13, mod 100) lands >= 50 — the
    // sample filter hb < 50 then selects NOTHING
    def hb(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(12, 20), 16) % 100
    }
    val ids = (1L to 200L).filter(hb(_) >= 50).take(5)
    assert(ids.size == 5)
    val d = docsDir(ids.map(i => (i, "some words here", "en", "s0", 15L)))
    val r = SparkEntry.queries("q171_sample_estimate")(spark, d)
      .collect().head
    assert(r.getLong(1) == 5L)
    assert(r.getLong(0) == 15L, "3 tokens x 5 docs")
    assert(!r.isNullAt(2) && r.getLong(2) == 0L,
      "empty sample must estimate 0, not NULL")
    assert(!r.isNullAt(3) && r.getLong(3) == 0L)
    assert(!r.isNullAt(4) && !r.getBoolean(4),
      "verdict must be computed (false), not NULL")
  }

  test("q215 conversion latency: zero converters still emit the one-row " +
    "report with NULL percentiles (ADVICE r8)") {
    // strip every purchase: groupQuantiles gets an empty frame, and the
    // old crossJoin annihilated the aggregate row (0 rows) while the
    // DuckDB oracle's always-one-row aggregate kept it — the left join
    // on the literal group key must preserve it with NULL med/p90
    val dir = java.nio.file.Files.createTempDirectory("ev215").toString
    spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") =!= "purchase")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q215_conversion_latency")(spark, dir)
      .collect()
    assert(out.length == 1, "the report row must survive the empty edge")
    val r = out.head
    assert(r.getLong(0) > 0L, "signups still exist")
    assert(r.getLong(1) == 0L, "nobody converts")
    assert(r.isNullAt(2) && r.isNullAt(3),
      "percentiles must be NULL (not fabricated) with zero converters")
  }

  // ---- loud-failure envelopes (VERDICT r10 #2): the raise_error
  // guards exist to kill the q214-class silent cross-engine divergence
  // — past the exact-arithmetic envelope the query must FAIL, loudly
  // and identically on both engines, never return a silently-wrong
  // verdict. Nothing drove them past the threshold before; these
  // planted scenarios force each envelope low and prove the Spark-side
  // failure actually fires with the documented message.

  private def messageChain(t: Throwable): String = {
    val sb = new StringBuilder
    var cur: Throwable = t
    while (cur != null) {
      sb.append(Option(cur.getMessage).getOrElse("")).append(" | ")
      cur = cur.getCause
    }
    sb.toString
  }

  test("q240 rank envelope fires loudly past N = SpearmanEnvelopeN") {
    import graft.queries.CorpusQueries
    val saved = CorpusQueries.SpearmanEnvelopeN
    try {
      CorpusQueries.SpearmanEnvelopeN = 1L // any real corpus exceeds it
      val ex = intercept[Throwable] {
        SparkEntry.queries("q240_spearman_signals")(spark, sf).collect()
      }
      assert(
        messageChain(ex).contains("q240: N beyond BIGINT-exact rank envelope"),
        s"expected the documented envelope message, got: ${messageChain(ex)}")
    } finally CorpusQueries.SpearmanEnvelopeN = saved
    // restored threshold: the query is green again (no residual state)
    assert(SparkEntry.queries("q240_spearman_signals")(spark, sf)
      .collect().length == 1)
  }

  test("q258 KS envelope fires loudly past N = KsEnvelopeN") {
    import graft.queries.CorpusQueries
    val saved = CorpusQueries.KsEnvelopeN
    try {
      CorpusQueries.KsEnvelopeN = 1L
      val ex = intercept[Throwable] {
        SparkEntry.queries("q258_ks_drift")(spark, sf).collect()
      }
      assert(
        messageChain(ex).contains("q258: N beyond the exact KS envelope"),
        s"expected the documented envelope message, got: ${messageChain(ex)}")
    } finally CorpusQueries.KsEnvelopeN = saved
    assert(SparkEntry.queries("q258_ks_drift")(spark, sf)
      .collect().nonEmpty)
  }

  test("q278 planted new-batch: a batch clone DEMOTES an old " +
    "canonical doc, a batch clone of a kept doc halves its weight, " +
    "a fresh batch doc enters — per-source stats land on hand math") {
    // batch = doc_id % 10 == 7. s0: doc 7 (batch) clones old doc 11 —
    // the pair is (7, 11), so 11 (the larger id) is demoted and 7
    // enters canonical. s1: doc 17 (batch) clones old doc 2 — the pair
    // is (2, 17), so 17 never enters but doc 2's family grows to 2 and
    // its soft-dedup weight halves (the fsize MOVE delta); doc 27 is a
    // fresh batch arrival. All docs are 5 tokens, so median=5, MAD=0,
    // everything kept — the mixture numbers are pure hand arithmetic.
    val d = docsDir(Seq(
      (1L, "apple brick cloud dune ember", "en", "s0", 1L),
      (11L, "frost gale harbor iris jade", "en", "s0", 1L),
      (7L, "frost gale harbor iris jade", "en", "s0", 1L),
      (2L, "koala lemon maple noble olive", "en", "s1", 1L),
      (12L, "piano quartz raven slate tiger", "en", "s1", 1L),
      (17L, "koala lemon maple noble olive", "en", "s1", 1L),
      (27L, "umber viola walnut xenon yarrow", "en", "s1", 1L)))
    val r = SparkEntry.queries("q278_incremental_curation")(spark, d)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r.keySet == Set("s0", "s1"))
    val s0 = r("s0")
    // (source, docs_canonical, docs_kept, median_len, mad,
    //  tokens_kept, raw_ppm, eff_ppm, docs_demoted, docs_added)
    assert(s0.getLong(1) == 2L, "s0 canonical: doc 1 + batch doc 7")
    assert(s0.getLong(2) == 2L, "s0 kept (MAD 0 keeps all)")
    assert(s0.getLong(3) == 5L && s0.getLong(4) == 0L)
    assert(s0.getLong(5) == 10L, "s0 tokens_kept")
    assert(s0.getLong(6) == 400000L, "s0 raw_ppm = 10/25")
    // wt: doc1 fsize1 → 5e6; doc7 fsize2 → 5·(1e6 div 2) = 2.5e6;
    // tot_wt = 7.5e6 + 12.5e6 = 20e6 → s0 eff = 375000
    assert(s0.getLong(7) == 375000L, "s0 eff_ppm")
    assert(s0.getLong(8) == 1L, "doc 11 demoted by batch doc 7")
    assert(s0.getLong(9) == 1L, "doc 7 added")
    val s1 = r("s1")
    assert(s1.getLong(1) == 3L, "s1 canonical: 2, 12, 27")
    assert(s1.getLong(5) == 15L)
    assert(s1.getLong(6) == 600000L)
    // wt: doc2 (family grew to 2) 2.5e6 + doc12 5e6 + doc27 5e6
    assert(s1.getLong(7) == 625000L, "s1 eff_ppm after the fsize move")
    assert(s1.getLong(8) == 0L && s1.getLong(9) == 1L,
      "17 never enters (larger pair id); 27 is the only addition")
  }

  test("q277 wt_mass envelope fires loudly past CurationWtEnvelope") {
    import graft.queries.CorpusQueries
    val saved = CorpusQueries.CurationWtEnvelope
    try {
      CorpusQueries.CurationWtEnvelope = BigInt(0) // any wt_mass > 0
      val ex = intercept[Throwable] {
        SparkEntry.queries("q277_curation_e2e")(spark, sf).collect()
      }
      assert(
        messageChain(ex).contains(
          "q277: wt_mass beyond DECIMAL(38,0) ppm envelope"),
        s"expected the documented envelope message, got: ${messageChain(ex)}")
    } finally CorpusQueries.CurationWtEnvelope = saved
    assert(SparkEntry.queries("q277_curation_e2e")(spark, sf)
      .collect().nonEmpty)
  }

  test("q225 SS envelope fires loudly past AnovaSsEnvelope") {
    import graft.queries.AnalyticsQueries
    val saved = AnalyticsQueries.AnovaSsEnvelope
    try {
      AnalyticsQueries.AnovaSsEnvelope = 0L // any non-degenerate series
      val ex = intercept[Throwable] {
        SparkEntry.queries("q225_dow_anova")(spark, sf).collect()
      }
      assert(
        messageChain(ex).contains("q225: SS beyond BIGINT-exact envelope"),
        s"expected the documented envelope message, got: ${messageChain(ex)}")
    } finally AnalyticsQueries.AnovaSsEnvelope = saved
    // production value pinned to the literal BOTH engines interpolate
    assert(AnalyticsQueries.AnovaSsEnvelope == Long.MaxValue)
    assert(SparkEntry.oracleSql("q225_dow_anova")
      .contains(AnalyticsQueries.AnovaSsEnvelope.toString),
      "the oracle must carry the same envelope literal")
    assert(SparkEntry.queries("q225_dow_anova")(spark, sf)
      .collect().nonEmpty)
  }

  test("q225 zero-variance series: eta2 is the defined 0, not NULL " +
    "and not a division error") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ev225").toString
    // 14 days at exactly 3 events/day: SS_tot = SS_b = 0, where
    // Spark's `div` returns NULL and DuckDB's `//` raises — the CASE
    // arm must define 0 on both engines instead
    val rows = for {
      dOff <- 0 until 14; i <- 0 until 3
    } yield new java.sql.Timestamp(
      java.time.LocalDate.of(2024, 1, 1).plusDays(dOff.toLong)
        .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
        + i * 1000L)
    rows.toDF("ts").write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q225_dow_anova")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 14L, "n_days")
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L,
      "SS_b and SS_tot must both be exactly 0")
    assert(!r.isNullAt(3) && r.getLong(3) == 0L,
      "zero-variance eta2 must be the defined 0")
  }

  test("q260 MAD: a uniform source has MAD 0 and zero outliers; one " +
    "planted truncation-bomb flags against the 0-MAD gate") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ev260").toString
    // source 'uni': 9 docs of exactly 5 tokens; one 500-token bomb
    val uni = (1 to 9).map(i =>
      (i.toLong, Seq.fill(5)("w").mkString(" "), "en", "uni", 9L))
    val bomb = Seq((99L, Seq.fill(500)("x").mkString(" "), "en", "uni", 999L))
    (uni ++ bomb).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("q260_mad_outliers")(spark, dir)
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 10L, "n_docs")
    assert(row.getLong(2) == 5L, "median is the uniform length")
    assert(row.getLong(3) == 0L,
      "MAD must be 0 when >half the docs share the median length")
    assert(row.getLong(4) == 1L,
      "only the bomb deviates (|500-5| > 3*0) — uniform docs are NOT " +
        "outliers under the strict > gate")
    assert(row.getLong(5) == 100000L, "1 of 10 docs = 100000 ppm")
  }

  test("q261 density: an exact-clone family is a full clique " +
    "(10^6 ppm, no chain risk)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ev261").toString
    // 4 exact clones + 3 unrelated singletons (distinct vocabularies)
    val text = (1 to 30).map(i => s"tok$i").mkString(" ")
    val clones = (1 to 4).map(i => (i.toLong, text, "en", "s", 1L))
    val lone = Seq(
      (10L, (1 to 30).map(i => s"aaa$i").mkString(" "), "en", "s", 1L),
      (11L, (1 to 30).map(i => s"bbb$i").mkString(" "), "en", "s", 1L),
      (12L, (1 to 30).map(i => s"ccc$i").mkString(" "), "en", "s", 1L))
    (clones ++ lone).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("q261_cluster_density")(spark, dir)
      .collect()
    val fam = r.filter(_.getLong(0) == 1L)
    assert(fam.length == 1, s"the clone family forms one cluster: ${r.toSeq}")
    val row = fam.head
    assert(row.getLong(1) == 4L, "n_members")
    assert(row.getLong(2) == 6L, "C(4,2) within-family direct pairs")
    assert(row.getLong(3) == 1000000L, "clique density")
    assert(!row.getBoolean(4), "a clique is never a chain risk")
  }

  test("q261 invariants on the test corpus: direct <= C(n,2), " +
    "density <= 10^6, members >= 2") {
    val rows = SparkEntry.queries("q261_cluster_density")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1); val direct = r.getLong(2)
      assert(n >= 2, s"cluster ${r.getLong(0)}: a cluster needs >= 2 docs")
      assert(direct >= 1 && direct <= n * (n - 1) / 2,
        s"cluster ${r.getLong(0)}: direct $direct outside [1, C($n,2)]")
      assert(r.getLong(3) <= 1000000L)
      assert(r.getBoolean(4) == (4 * direct < n * (n - 1)),
        "flag must replay the integer rule")
    }
  }

  test("envelope production values are pinned to the oracle literals") {
    // both sides interpolate the same constant, so they cannot drift
    // from each other — this pins the PRODUCTION value itself so a
    // stray test-side mutation or refactor can't ship a lowered
    // envelope (the oracle dump the driver compares against is built
    // from these strings)
    assert(graft.queries.CorpusQueries.SpearmanEnvelopeN == 2090000L)
    assert(graft.queries.CorpusQueries.KsEnvelopeN == 300000000L)
    assert(SparkEntry.oracleSql("q240_spearman_signals")
      .contains("> 2090000"))
    assert(SparkEntry.oracleSql("q258_ks_drift").contains("> 300000000"))
    assert(graft.queries.CorpusQueries.CurationWtEnvelope ==
      BigInt(10).pow(31))
    assert(SparkEntry.oracleSql("q277_curation_e2e")
      .contains("> " + BigInt(10).pow(31)))
  }

  test("q264 bow delta: a planted word-reorder clone merges exactly " +
    "one family; distinct-vocabulary docs never merge") {
    val d = docsDir(Seq(
      (1L, "alpha beta gamma delta", "en", "s0", 1L),
      (2L, "delta gamma beta alpha", "en", "s0", 1L), // reorder clone
      (3L, "alpha beta gamma delta", "en", "s0", 1L), // exact clone of 1
      (4L, "one two three four", "en", "s0", 1L)))
    val r = SparkEntry.queries("q264_bow_dedup_delta")(spark, d)
      .collect()(0)
    assert(r.getLong(0) == 4L, "n_docs")
    assert(r.getLong(1) == 2L, "bow families: {reorder trio, lone}")
    assert(r.getLong(2) == 3L, "raw families: two orderings + lone")
    assert(r.getLong(3) == 1L, "exactly the reorder trio merged")
    assert(r.getLong(4) == 3L, "3 docs live in the merged family")
  }

  test("q267 skyline: all-identical docs tie onto the frontier " +
    "together (no strict dominator exists)") {
    val d = docsDir((1L to 5L).map(i =>
      (i, "w1 w2 w3 w4 w5", "en", "s0", 1L)))
    val out = SparkEntry.queries("q267_pareto_skyline")(spark, d)
      .collect()
    assert(out.length == 5,
      s"equal (score, tokens) points never dominate each other: " +
        s"${out.length}")
  }

  test("q266 collapse audit: two labels sharing one direction flag " +
    "near_collapse, an orthogonal label never does") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ev266").toString
    // labels 0 and 1 both sit on e0 (scaled copies — cos = 1); label 2
    // sits on e1 (cos = 0 against both)
    def vec(axis: Int, s: Float): Seq[Float] =
      (0 until 64).map(i => if (i == axis) s else 0.0f)
    val rows = Seq(
      (0L, vec(0, 0.9f), 0), (1L, vec(0, 0.8f), 0),
      (2L, vec(0, 0.7f), 1), (3L, vec(0, 0.6f), 1),
      (4L, vec(1, 0.9f), 2), (5L, vec(1, 0.8f), 2))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q266_label_centroid_audit")(spark, dir)
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getBoolean(6))).toMap
    assert(out((0, 1)), "same-direction labels must flag")
    assert(!out((0, 2)) && !out((1, 2)), "orthogonal labels must not")
  }

  test("q277 planted pipeline: clones collapse, the outlier " +
    "quarantines, and clone-heavy survivors shrink in the mixture") {
    def doc(prefix: String, n: Int): String =
      (1 to n).map(i => s"$prefix$i").mkString(" ")
    // sa: 4 exact clones (one canonical survives, raw family size 4)
    // + two distinct docs; lengths 40/36/44 → median 40, MAD 4, all kept
    // sb: 5 distinct docs, lengths 30/32/34/36/300 → median 34, MAD 2,
    // the 300-token doc quarantines
    val clone = doc("ca", 40)
    val d = docsDir(Seq(
      (1L, clone, "en", "sa", clone.length.toLong),
      (2L, clone, "en", "sa", clone.length.toLong),
      (3L, clone, "en", "sa", clone.length.toLong),
      (4L, clone, "en", "sa", clone.length.toLong),
      (5L, doc("da", 36), "en", "sa", 1L),
      (6L, doc("db", 44), "en", "sa", 1L),
      (7L, doc("ea", 30), "en", "sb", 1L),
      (8L, doc("eb", 32), "en", "sb", 1L),
      (9L, doc("ec", 34), "en", "sb", 1L),
      (10L, doc("ed", 36), "en", "sb", 1L),
      (11L, doc("ee", 300), "en", "sb", 1L)))
    val out = SparkEntry.queries("q277_curation_e2e")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
          r.getLong(9))).toMap
    // sa kept tokens 40+36+44 = 120; weights: canonical clone carries
    // its RAW family weight 40·(10^6 div 4), the distinct docs 10^6
    // each → wt 90e6 of tot 222e6 = 405405 ppm vs raw 476190 ppm —
    // the clone-heavy source SHRINKS under soft-dedup weighting
    assert(out("sa") == ((6L, 3L, 3L, 40L, 4L, 120L, 476190L,
      405405L, 1L)), s"sa: ${out("sa")}")
    // sb: the 300-token doc is |300-34| = 266 > 3·MAD(2) → quarantined
    assert(out("sb") == ((5L, 5L, 4L, 34L, 2L, 132L, 523809L,
      594594L, 1L)), s"sb: ${out("sb")}")
  }

  test("q277 invariants on the test corpus: monotone doc counts, " +
    "ppm bounded, packing-bin identity") {
    val rows = SparkEntry.queries("q277_curation_e2e")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    var rawSum = 0L; var effSum = 0L
    rows.foreach { r =>
      val (raw, canon, kept) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(kept >= 1 && kept <= canon && canon <= raw,
        s"${r.getString(0)}: counts must be monotone: $raw/$canon/$kept")
      val toks = r.getLong(6)
      assert(r.getLong(9) == (toks - 1) / 2048 + 1,
        s"${r.getString(0)}: n_bins must replay the closed form")
      assert(r.getLong(7) <= 1000000L && r.getLong(8) <= 1000000L)
      rawSum += r.getLong(7); effSum += r.getLong(8)
    }
    // integral-div floor rounding loses < 1 ppm per source
    assert(rawSum <= 1000000L && rawSum > 1000000L - rows.length)
    assert(effSum <= 1000000L && effSum > 1000000L - rows.length)
  }

  test("StreamKsDrift zero-doc window: gap windows emit no row, so the " +
    "C=0 divide-by-zero class is structurally unreachable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    def doc(n: Int) = Seq.fill(n)("w").mkString(" ")
    val ref = graft.streaming.StreamKsDrift.referenceFrom(
      (1 to 10).map(doc).toDF("text"), "text", nGrid = 4)
    val input = MemoryStream[DocEvt]
    val out = graft.streaming.StreamKsDrift.drift(
      input.toDF(), ref, "1 minute", "1 minute")
    val q = out.writeStream.format("memory").queryName("kszero")
      .outputMode("append").start()
    try {
      // docs land in 10:00 and 10:02 — 10:01 is a zero-doc gap window
      input.addData(DocEvt(1, t("2024-01-01 10:00:10"), doc(3)))
      input.addData(DocEvt(2, t("2024-01-01 10:02:10"), doc(7)))
      input.addData(DocEvt(3, t("2024-01-01 10:10:00"), "z")) // closer
      q.processAllAvailable()
      val rows = spark.table("kszero").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1)))
      // only the two populated windows exist; every emitted n_docs > 0,
      // so d_ppm's `div (n_docs * R)` can never see a zero denominator
      assert(rows.map(_._1).toSet == Set(
        t("2024-01-01 10:00:00"), t("2024-01-01 10:02:00")),
        s"gap window must not emit: ${rows.toSeq}")
      assert(rows.forall(_._2 > 0L))
    } finally q.stop()
  }

  test("StreamKsDrift degenerate grid: a single-length reference " +
    "collapses nGrid=2 to one cut and the monitor stays exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    def doc(n: Int) = Seq.fill(n)("w").mkString(" ")
    // all 50 reference docs have length 5 → both quantile targets land
    // on the same value → cuts.distinct collapses to ONE grid point
    val ref = graft.streaming.StreamKsDrift.referenceFrom(
      Seq.fill(50)(doc(5)).toDF("text"), "text", nGrid = 2)
    assert(ref.cuts == Seq(5L) && ref.refCum == Seq(50L)
      && ref.refTotal == 50L)
    val input = MemoryStream[DocEvt]
    val out = graft.streaming.StreamKsDrift.drift(
      input.toDF(), ref, "1 minute", "1 minute")
    val q = out.writeStream.format("memory").queryName("ksdegen")
      .outputMode("append").start()
    try {
      // 10:00 mirrors the reference (all length 5) — D must be exactly 0
      (1 to 10).foreach(i => input.addData(
        DocEvt(i.toLong, t("2024-01-01 10:00:10"), doc(5))))
      // 10:01 puts ALL mass above the single cut — g0 = 0, so
      // dnum = refCum·C = R·C, i.e. D = 1, the maximum the one-point
      // grid can express; far past the α=0.05 critical value
      (1 to 20).foreach(i => input.addData(
        DocEvt(100L + i, t("2024-01-01 10:01:10"), doc(9))))
      input.addData(DocEvt(999, t("2024-01-01 10:10:00"), "z")) // closer
      q.processAllAvailable()
      val rows = spark.table("ksdegen").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3)))
      val w1 = rows.find(_._1 == t("2024-01-01 10:00:00")).get
      val w2 = rows.find(_._1 == t("2024-01-01 10:01:00")).get
      assert(w1._2 == 10L && w1._3 == 0L && !w1._4,
        s"mirror window must be exactly clean: $w1")
      assert(w2._2 == 20L && w2._3 == 1000000L && w2._4,
        s"all-mass-above-cut window must hit D = 1 and flag: $w2")
    } finally q.stop()
  }
}
