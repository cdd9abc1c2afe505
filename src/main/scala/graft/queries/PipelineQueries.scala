package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.jobs.EmployeePipeline
import graft.multimodal.Multimodal

/** Pipeline-shaped queries: multimodal feature extraction, event-time
  * windowed aggregation (the batch twin of the Structured Streaming path),
  * and batch strike accounting (the seed/compaction side of the streaming
  * strike monitor).
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- multimodal: binary payload -> partition-batched decode ->
    // typed features (decode itself is a documented stub; the plumbing
    // — schema, batching, typed output — is real)
    "q31_multimodal_features" -> ((s, d) => {
      val assets = Multimodal.toAssets(s, Tables.documents(s, d))
      Multimodal.extractFeatures(s, assets).toDF()
    }),

    // ---- event-time tumbling-window aggregation (batch form; the
    // streaming form with watermark is exercised in StreamingSpec)
    "q32_hourly_events" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"),
          unix_micros(date_trunc("hour", col("ts"))).as("hour_us"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("sum_value"))
    }),

    // ---- HOPPING (sliding) window aggregation: Spark's native
    // overlapping-window primitive — 1-hour windows every 15 minutes,
    // so each event lands in 4 windows (q32 covers the tumbling case;
    // overlap is what trend dashboards and rate limiters actually
    // read). The oracle replays the window-assignment arithmetic as an
    // explicit 4-way explode in exact epoch-micros integers — the
    // same math `window()` performs internally; window starts align
    // to epoch 15-minute boundaries in both engines.
    "q191_hopping_windows" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("window.start")).as("win_start_us"),
          col("event_type"), col("n"))
    }),

    // ---- the reference's hardest report (Task_4_80perc.py) run through
    // the actual EmployeePipeline core against an independent SQL spec:
    // leave feed derived from lineitem ship-dates per supplier, sparse
    // deterministic holiday calendar, fixed runDate
    "q36_upcoming_leave_abuse" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val leaveDim = li.select(
        col("l_suppkey").as("emp_id"),
        to_date(col("l_shipdate")).as("leave_date"),
        when(col("l_returnflag") === "R", lit("CANCELLED"))
          .otherwise(lit("ACTIVE")).as("status"))
      val calendarDim = li.filter(col("l_orderkey") % 53 === 0)
        .select(lit("holiday").as("reason"),
          to_date(col("l_shipdate")).as("date")).distinct()
      EmployeePipeline.upcomingLeaveAbuse(s, leaveDim, calendarDim,
        "2000-06-01")
    }),

    // ---- quota report (Task_4_monthly_80_percent.py) through the
    // EmployeePipeline core: quota from supplier key, usage from
    // ship-date leaves
    "q37_quota_abuse" -> ((s, d) => {
      val quotaDim = Tables.supplier(s, d).select(
        col("s_suppkey").as("emp_id"),
        (lit(50) + col("s_suppkey") % 40).cast("int").as("leave_quota"),
        lit(2000).as("leave_year"))
      val leaveDim = Tables.lineitem(s, d).select(
        col("l_suppkey").as("emp_id"),
        to_date(col("l_shipdate")).as("leave_date"),
        when(col("l_returnflag") === "R", lit("CANCELLED"))
          .otherwise(lit("ACTIVE")).as("status"))
      EmployeePipeline.quotaAbuse(quotaDim, leaveDim, "2000-06-15")
    }),

    // ---- IMAGE near-dup via perceptual dHash: the multimodal analog
    // of the q21/q112 text near-dup family — materialize a REAL 16×16
    // binary-PPM image per doc (Multimodal.imageAssets; raster
    // stride-samples the text so clones produce identical images),
    // round-trip the real codec, hash decoded pixels with the 63-bit
    // dHash, then 8-band × 8-bit LSH over the hash: only band-colliding
    // pairs are scored (hamming64, the codegen'd expression), top-20
    // nearest kept under a deterministic (dist, a, b) total order.
    // Bucket cap (≤ 100 members) bounds pair generation at clone
    // density — the q87/q112 discipline, oracle-mirrored. Band width is
    // the recall/volume knob: 8-bit bands suit this corpus's distance
    // spectrum; a 100 TB image store widens to 16-bit bands exactly as
    // SrpCand/nprobe tune the vector legs. Payload bytes never shuffle
    // — only (doc_id, 8-byte hash) leaves the decode partition.
    "q143_image_neardup" -> ((s, d) => {
      // the encode→decode→dHash round-trip is the expensive leg and its
      // output feeds BOTH the bucket-size audit and the pair join (two
      // consumers of the same lineage = two codec passes per execution
      // without materialization); persist it once per run — in
      // production the perceptual-hash table IS a stored index artifact
      val hashes = Shared.frame(s, "img_dhash", d)(
        Multimodal.dHash(s,
          Multimodal.imageAssets(s, Tables.documents(s, d))).toDF())
      val bandExprs = (0 until 8).map { b =>
        val mask = if (b == 7) 127L else 255L
        expr(s"shiftright(dhash, ${b * 8}) & $mask")
      }
      val banded = hashes.select(col("doc_id"), col("dhash"),
        posexplode(array(bandExprs: _*)).as(Seq("band", "bv")))
      val sz = banded.groupBy(col("band"), col("bv"))
        .agg(count(lit(1)).as("m")).filter(col("m") <= 100)
        .select(col("band"), col("bv"))
      val ok = banded.join(sz, Seq("band", "bv"))
      val a = ok.select(col("band"), col("bv"), col("doc_id").as("a"),
        col("dhash").as("ha"))
      val b = ok.select(col("band"), col("bv"), col("doc_id").as("b"),
        col("dhash").as("hb"))
      a.join(b, Seq("band", "bv"))
        .filter(col("a") < col("b"))
        .select(col("a"), col("b"),
          expr("hamming64(ha, hb)").as("dist"))
        .distinct()
        .orderBy(col("dist").asc, col("a").asc, col("b").asc)
        .limit(20)
    }),

    // ---- VIDEO near-dup via shared frame fingerprints: the
    // frame-grain complement of q143's whole-image dHash — two "videos"
    // (payload = the doc's byte stream, frames = sampleFrames' 100-byte
    // stripes) are near-dups when they share >= 2 distinct frame
    // fingerprints, the content-ID shape real video dedup uses
    // (per-frame hash -> inverted index -> overlap count). Rides the
    // REAL sampleFrames plumbing; only (doc_id, 16-byte md5) leaves the
    // slicing partition — payload bytes never shuffle. Empty tail
    // frames (payload length a multiple of the stripe) are excluded:
    // an empty frame is not shared content. Bucket cap (<= 20 docs per
    // fingerprint) bounds pair generation at clone density,
    // oracle-mirrored (q87/q143 discipline). The cap is TIGHTER than
    // q143's because fingerprints here have per-doc multiplicity
    // (~frames/doc buckets per clone group): a 100-clone corpus with
    // cap 100 measured 100M pair rows and 7.9 GB of spill — cap 20
    // drops those buckets at generation (their members are already
    // known dups at that density; the q122 posture).
    "q144_frame_neardup" -> ((s, d) => {
      // as q143: the frame-slice + fingerprint pass feeds the cap audit
      // AND the inverted-index join; persist the (doc_id, md5) set once
      // per run so payload slicing runs a single time
      val fh = Shared.frame(s, "frame_fp", d)(
        Multimodal.sampleFrames(s,
            Multimodal.toAssets(s, Tables.documents(s, d)), everyK = 1)
          .toDF()
          .filter(length(col("frame")) > 0)
          .select(col("doc_id"), md5(col("frame")).as("h"))
          .distinct())
      val sz = fh.groupBy(col("h")).agg(count(lit(1)).as("m"))
        .filter(col("m") <= 20).select(col("h"))
      val ok = fh.join(sz, "h")
      val a = ok.select(col("h"), col("doc_id").as("a"))
      val b = ok.select(col("h"), col("doc_id").as("b"))
      a.join(b, "h").filter(col("a") < col("b"))
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("shared_frames"))
        .filter(col("shared_frames") >= 2)
    }),

    // ---- AUDIO near-dup via overlapping energy-delta fingerprints:
    // the third modality leg beside q143 (whole-image dHash) and q144
    // (disjoint video-frame stripes). The fingerprint is the
    // Haitsma–Kalker shape real audio matchers use — band-energy
    // DELTAS over OVERLAPPING windows (hop = win/2), which survive
    // amplitude shifts that raw frame hashes don't — shingled 8 deep
    // so only runs of matching windows count, then the q144 inverted-
    // index discipline: distinct (doc_id, 16-byte md5) rows, bucket
    // cap ≤ 20 (fingerprints carry per-doc multiplicity like q144's,
    // oracle-mirrored), pairs sharing ≥ 2 distinct shingle keys.
    // Payload bytes never shuffle (audioShingles slices per partition);
    // the fingerprint frame persists once per run (production stores
    // it as the match index). Oracle replays the window/band/delta
    // arithmetic as integer SQL over the same bytes.
    "q163_audio_neardup" -> ((s, d) => {
      val sh = Shared.frame(s, "audio_fp", d)(
        Multimodal.audioShingles(s,
            Multimodal.toAssets(s, Tables.documents(s, d)))
          .toDF()
          .select(col("doc_id"), md5(col("key")).as("h"))
          .distinct())
      val sz = sh.groupBy(col("h")).agg(count(lit(1)).as("m"))
        .filter(col("m") <= 20).select(col("h"))
      val ok = sh.join(sz, "h")
      val a = ok.select(col("h"), col("doc_id").as("a"))
      val b = ok.select(col("h"), col("doc_id").as("b"))
      a.join(b, "h").filter(col("a") < col("b"))
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("shared_keys"))
        .filter(col("shared_keys") >= 2)
    }),

    // ---- AUDIO near-dup over a REAL container decode: the q163
    // pipeline lifted from raw payload bytes to genuine WAV files —
    // each doc materializes as a 16-bit mono PCM RIFF payload
    // (Multimodal.wavAssets: one sample per text byte, replayable
    // integer synth), the REAL Wav parser walks the chunks (magic
    // checks, fmt validation, even-byte padding) and the
    // Haitsma–Kalker band-energy deltas run over the DECODED samples
    // (signed sums — DC offsets cancel in the double difference).
    // Same index discipline as q163/q144: distinct (doc_id, md5 key),
    // ≤ 20 bucket cap (oracle-mirrored), pairs sharing ≥ 2 shingle
    // keys. The oracle regenerates the samples from text arithmetic
    // and replays the fingerprint SQL — so driver hash equality
    // proves the encode→parse round trip is lossless, the q143
    // real-codec pattern on the audio leg. Payloads never shuffle.
    "q273_wav_pcm_neardup" -> ((s, d) => {
      val sh = Shared.frame(s, "pcm_fp", d)(
        Multimodal.pcmShingles(s,
            Multimodal.wavAssets(s, Tables.documents(s, d)))
          .toDF()
          .select(col("doc_id"), md5(col("key")).as("h"))
          .distinct())
      val sz = sh.groupBy(col("h")).agg(count(lit(1)).as("m"))
        .filter(col("m") <= 20).select(col("h"))
      val ok = sh.join(sz, "h")
      val a = ok.select(col("h"), col("doc_id").as("a"))
      val b = ok.select(col("h"), col("doc_id").as("b"))
      a.join(b, "h").filter(col("a") < col("b"))
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("shared_keys"))
        .filter(col("shared_keys") >= 2)
    }),

    // ---- VIDEO near-dup over a REAL container decode: q144's
    // inverted frame index lifted from stub byte stripes to genuine
    // YUV4MPEG2 streams — Multimodal.y4mAssets materializes each
    // ≥96-byte doc as an 8×8 4:2:0 Y4M file (frame k cycles the text
    // from offset (k·96) mod L), the REAL Y4m parser validates magic/
    // dimensions/FRAME markers/frame sizing, and per-frame md5 digests
    // come from the DECODED frame payloads. Same discipline as q144:
    // distinct (doc_id, digest), ≤ 20 bucket cap (oracle-mirrored),
    // pairs sharing ≥ 2 distinct frames. The oracle reassembles each
    // frame as text substrings (one wrap max, by the L ≥ 96 gate) and
    // hashes them — driver equality proves the container round trip,
    // completing the real-codec story across all three modalities
    // (PPM images, WAV audio, Y4M video). Payloads never shuffle.
    "q274_y4m_frame_neardup" -> ((s, d) => {
      val fh = Shared.frame(s, "y4m_fp", d)(
        Multimodal.y4mFrameDigests(s,
            Multimodal.y4mAssets(s, Tables.documents(s, d)))
          .toDF()
          .select(col("doc_id"), col("h"))
          .distinct())
      val sz = fh.groupBy(col("h")).agg(count(lit(1)).as("m"))
        .filter(col("m") <= 20).select(col("h"))
      val ok = fh.join(sz, "h")
      val a = ok.select(col("h"), col("doc_id").as("a"))
      val b = ok.select(col("h"), col("doc_id").as("b"))
      a.join(b, "h").filter(col("a") < col("b"))
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("shared_frames"))
        .filter(col("shared_frames") >= 2)
    }),

    // ---- batch strike accounting: flagged events per user + INACTIVE
    // threshold (streaming StrikeMonitor's batch twin)
    "q33_strike_batch" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("event_type") === "error")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("strikes"),
          max(col("ts_us")).as("last_strike_us"))
        .select(col("user_id"), col("strikes"), col("last_strike_us"),
          when(col("strikes") >= 10, lit("INACTIVE")).otherwise(lit("Active"))
            .as("status"))
    })
  )

  /** q143 oracle: replay of image materialization + dHash as integer
    * SQL. Raster byte i = text byte (i·L)/768 (imageAssets' stride
    * map); the 9×8 grid samples pixel (x·16/9, 2y) of the 16×16 image,
    * gray = (299r+587g+114b)//1000, bit y·8+x set on a rightward gray
    * drop — constants generated here so Spark (real codec round-trip)
    * and DuckDB (pure arithmetic) must agree byte-for-byte.
    */
  private def dhashSql: String = {
    val sxs = (0 to 8).map(x => x * 16 / 9)
    def b(idx: Int) = s"ord(substr(text, (($idx*L)//768) + 1, 1))"
    val gcols = for { y <- 0 to 7; x <- 0 to 8 } yield {
      val o = ((2 * y) * 16 + sxs(x)) * 3
      s"(299*${b(o)} + 587*${b(o + 1)} + 114*${b(o + 2)})//1000" +
        s" AS g_${x}_$y"
    }
    val bits = for { y <- 0 to 7; x <- 0 to 7; if y * 8 + x < 63 } yield
      s"CASE WHEN g_${x}_$y > g_${x + 1}_$y THEN ${1L << (y * 8 + x)}" +
        " ELSE 0 END"
    val bands = (0 until 8).map { bd =>
      val mask = if (bd == 7) 127L else 255L
      s"SELECT doc_id, dhash, $bd AS band," +
        s" (dhash >> ${bd * 8}) & $mask AS bv FROM h"
    }
    s"""WITH t AS (SELECT doc_id, text, length(text) AS L
       |    FROM documents),
       |g AS (SELECT doc_id, ${gcols.mkString(",\n    ")} FROM t),
       |h AS (SELECT doc_id, CAST(${bits.mkString("\n    + ")}
       |    AS BIGINT) AS dhash FROM g),
       |bands AS (${bands.mkString("\n  UNION ALL ")}),
       |sz AS (SELECT band, bv FROM
       |    (SELECT band, bv, count(*) AS m FROM bands GROUP BY 1, 2)
       |  WHERE m <= 100),
       |ok AS (SELECT b.* FROM bands b JOIN sz USING (band, bv)),
       |p AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b,
       |    CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS dist
       |  FROM ok a JOIN ok b
       |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
       |SELECT a, b, dist FROM p
       |ORDER BY dist ASC, a ASC, b ASC LIMIT 20""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q143_image_neardup" -> dhashSql,

    "q144_frame_neardup" ->
      """WITH f AS (
        |  SELECT doc_id, substr(text, i*100 + 1, 100) AS fr
        |  FROM (SELECT doc_id, text,
        |      unnest(generate_series(0, length(text)//100)) AS i
        |    FROM documents)),
        |fh AS (SELECT DISTINCT doc_id, md5(fr) AS h FROM f
        |  WHERE fr <> ''),
        |sz AS (SELECT h FROM
        |    (SELECT h, count(*) AS m FROM fh GROUP BY h)
        |  WHERE m <= 20),
        |ok AS (SELECT fh.* FROM fh JOIN sz USING (h))
        |SELECT a.doc_id AS a, b.doc_id AS b,
        |  count(*) AS shared_frames
        |FROM ok a JOIN ok b ON a.h = b.h AND a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |HAVING count(*) >= 2""".stripMargin,

    // integer replay of audioShingles' window/band/delta arithmetic:
    // en = 8 band sums per 64-byte window at stride 32; subfingerprint
    // bit m−1 set when the band-delta increased vs the previous window;
    // shingle = 8 consecutive subfingerprints joined '-'. BYTE-indexed
    // (ADVICE r6): the engine fingerprints UTF-8 payload BYTES
    // (toAssets casts text to binary; p(i) & 0xFF), so the oracle
    // addresses bytes too — via the hex rendering of the encoded blob
    // (byte b, 1-based, lives at hex chars 2(b−1)+1..2(b−1)+2), since
    // DuckDB has no direct blob byte accessor. A char-indexed
    // ord(substr(text, …)) agrees only on pure-ASCII corpora and would
    // silently break parity on the first multi-byte document
    // (byte-vs-char replay asserted on a multi-byte probe corpus,
    // round 7).
    "q163_audio_neardup" ->
      """WITH w AS (SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS L
        |  FROM documents WHERE octet_length(encode(text)) >= 64),
        |e AS (
        |  SELECT doc_id, i,
        |    list_transform(generate_series(0, 7), m ->
        |      list_reduce(list_transform(generate_series(1, 8), j ->
        |        CAST(concat('0x',
        |          substr(hx, (i*32 + m*8 + j - 1)*2 + 1, 2)) AS BIGINT)),
        |        (a, v) -> a + v))
        |      AS en
        |  FROM w, unnest(generate_series(0, (L - 64) // 32)) t(i)),
        |sf AS (
        |  SELECT c.doc_id, c.i,
        |    list_reduce(list_transform(generate_series(1, 7), m ->
        |      CASE WHEN (c.en[m] - c.en[m+1]) - (p.en[m] - p.en[m+1]) > 0
        |        THEN 1 << (m - 1) ELSE 0 END), (a, v) -> a + v) AS sfp
        |  FROM e c JOIN e p ON p.doc_id = c.doc_id AND p.i = c.i - 1),
        |sl AS (SELECT doc_id, list(sfp ORDER BY i) AS sfs
        |  FROM sf GROUP BY doc_id),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    md5(array_to_string(sfs[k:k+7], '-')) AS h
        |  FROM sl, unnest(generate_series(1, len(sfs) - 7)) t(k)),
        |sz AS (SELECT h FROM
        |    (SELECT h, count(*) AS m FROM sh GROUP BY h)
        |  WHERE m <= 20),
        |ok AS (SELECT sh.* FROM sh JOIN sz USING (h))
        |SELECT a.doc_id AS a, b.doc_id AS b,
        |  count(*) AS shared_keys
        |FROM ok a JOIN ok b ON a.h = b.h AND a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |HAVING count(*) >= 2""".stripMargin,

    "q273_wav_pcm_neardup" -> {
      // byte x of the text (0-based), via the hex projection
      def b(x: String) =
        s"CAST(concat('0x', substr(hx, ($x)*2 + 1, 2)) AS BIGINT)"
      // decoded sample at index x: b(x)*256 + b((x+1) mod L) - 32768
      def smp(x: String) =
        s"(${b(x)} * 256 + ${b(s"($x + 1) % L")} - 32768)"
      s"""WITH w AS (SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS L
        |  FROM documents WHERE octet_length(encode(text)) >= 64),
        |e AS (
        |  SELECT doc_id, i,
        |    list_transform(generate_series(0, 7), m ->
        |      list_reduce(list_transform(generate_series(1, 8), j ->
        |        ${smp("i*32 + m*8 + j - 1")}),
        |        (a, v) -> a + v))
        |      AS en
        |  FROM w, unnest(generate_series(0, (L - 64) // 32)) t(i)),
        |sf AS (
        |  SELECT c.doc_id, c.i,
        |    list_reduce(list_transform(generate_series(1, 7), m ->
        |      CASE WHEN (c.en[m] - c.en[m+1]) - (p.en[m] - p.en[m+1]) > 0
        |        THEN 1 << (m - 1) ELSE 0 END), (a, v) -> a + v) AS sfp
        |  FROM e c JOIN e p ON p.doc_id = c.doc_id AND p.i = c.i - 1),
        |sl AS (SELECT doc_id, list(sfp ORDER BY i) AS sfs
        |  FROM sf GROUP BY doc_id),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    md5(array_to_string(sfs[k:k+7], '-')) AS h
        |  FROM sl, unnest(generate_series(1, len(sfs) - 7)) t(k)),
        |sz AS (SELECT h FROM
        |    (SELECT h, count(*) AS m FROM sh GROUP BY h)
        |  WHERE m <= 20),
        |ok AS (SELECT sh.* FROM sh JOIN sz USING (h))
        |SELECT a.doc_id AS a, b.doc_id AS b,
        |  count(*) AS shared_keys
        |FROM ok a JOIN ok b ON a.h = b.h AND a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |HAVING count(*) >= 2""".stripMargin
    },

    "q274_y4m_frame_neardup" ->
      """WITH w AS (SELECT doc_id, text, len(text) AS L
        |  FROM documents WHERE len(text) >= 96),
        |fr AS (SELECT doc_id,
        |    CASE WHEN st + 96 <= L THEN substr(text, st + 1, 96)
        |      ELSE substr(text, st + 1, L - st)
        |        || substr(text, 1, 96 - (L - st)) END AS fbytes
        |  FROM (SELECT doc_id, text, L, (k * 96) % L AS st
        |    FROM w, unnest(generate_series(0,
        |      least(greatest(L // 96, 1), 8) - 1)) t(k))),
        |fh AS (SELECT DISTINCT doc_id, md5(fbytes) AS h FROM fr),
        |sz AS (SELECT h FROM
        |    (SELECT h, count(*) AS m FROM fh GROUP BY h)
        |  WHERE m <= 20),
        |ok AS (SELECT fh.* FROM fh JOIN sz USING (h))
        |SELECT a.doc_id AS a, b.doc_id AS b,
        |  count(*) AS shared_frames
        |FROM ok a JOIN ok b ON a.h = b.h AND a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |HAVING count(*) >= 2""".stripMargin,

    "q31_multimodal_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  CAST(16 + octet_length(encode(text)) % 64 AS INT) AS width,
        |  CAST(16 + octet_length(encode(text)) % 48 AS INT) AS height,
        |  CAST(octet_length(encode(text)) // 100 + 1 AS INT) AS frames
        |FROM documents""".stripMargin,

    "q191_hopping_windows" ->
      """WITH t AS (SELECT event_type, epoch_ns(ts) // 1000 AS us
        |  FROM events),
        |w AS (SELECT event_type,
        |    (us - (us % 900000000)) - k.k * 900000000 AS win_start_us
        |  FROM t, generate_series(0, 3) k(k))
        |SELECT win_start_us, event_type, count(*) AS n
        |FROM w GROUP BY 1, 2""".stripMargin,

    "q32_hourly_events" ->
      """SELECT event_type,
        |  epoch_us(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS hour_us,
        |  count(*) AS n,
        |  round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY event_type, date_trunc('hour', ts)""".stripMargin,

    "q36_upcoming_leave_abuse" ->
      """WITH leave AS (
        |  SELECT l_suppkey AS emp_id, CAST(l_shipdate AS DATE) AS leave_date,
        |    CASE WHEN l_returnflag = 'R' THEN 'CANCELLED' ELSE 'ACTIVE' END
        |      AS status
        |  FROM lineitem),
        |cal AS (SELECT DISTINCT CAST(l_shipdate AS DATE) AS hd
        |  FROM lineitem WHERE l_orderkey % 53 = 0),
        |hol AS (SELECT hd FROM cal
        |  WHERE hd > DATE '2000-06-01' AND year(hd) = 2000
        |    AND isodow(hd) <= 5),
        |rem AS (SELECT count(*) AS remaining_wd FROM (
        |    SELECT CAST(unnest(generate_series(DATE '2000-06-01',
        |      DATE '2000-12-31', INTERVAL 1 DAY)) AS DATE) AS dd)
        |  WHERE isodow(dd) <= 5
        |    AND dd NOT IN (SELECT hd FROM hol)),
        |up AS (SELECT emp_id, count(*) AS upcoming_leaves FROM (
        |    SELECT DISTINCT emp_id, leave_date FROM leave
        |    WHERE status = 'ACTIVE' AND leave_date > DATE '2000-06-01'
        |      AND year(leave_date) = 2000 AND isodow(leave_date) <= 5
        |      AND leave_date NOT IN (SELECT hd FROM hol))
        |  GROUP BY emp_id)
        |SELECT emp_id, upcoming_leaves FROM up, rem
        |WHERE upcoming_leaves / remaining_wd * 100 > 8""".stripMargin,

    "q37_quota_abuse" ->
      """WITH quota AS (
        |  SELECT s_suppkey AS emp_id,
        |    CAST(50 + s_suppkey % 40 AS INT) AS leave_quota,
        |    2000 AS leave_year
        |  FROM supplier),
        |leave AS (
        |  SELECT l_suppkey AS emp_id, CAST(l_shipdate AS DATE) AS leave_date,
        |    CASE WHEN l_returnflag = 'R' THEN 'CANCELLED' ELSE 'ACTIVE' END
        |      AS status
        |  FROM lineitem),
        |avail AS (SELECT emp_id, CAST(sum(leave_quota) AS BIGINT)
        |    AS leave_available
        |  FROM quota WHERE leave_year = 2000 GROUP BY emp_id),
        |availed AS (SELECT emp_id, count(status) AS leave_availed
        |  FROM leave WHERE status = 'ACTIVE' AND year(leave_date) = 2000
        |  GROUP BY emp_id)
        |SELECT a.emp_id, leave_available, leave_availed,
        |  round(leave_availed / leave_available * 100, 2) AS percentage
        |FROM avail a JOIN availed b ON a.emp_id = b.emp_id
        |WHERE round(leave_availed / leave_available * 100, 2) > 80""".stripMargin,

    "q33_strike_batch" ->
      """SELECT user_id, count(*) AS strikes,
        |  max(epoch_ns(ts) // 1000) AS last_strike_us,
        |  CASE WHEN count(*) >= 10 THEN 'INACTIVE' ELSE 'Active' END
        |    AS status
        |FROM events
        |WHERE event_type = 'error'
        |GROUP BY user_id""".stripMargin
  )
}
