package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Broadcast Bloom filter for membership prefilters — the 100 TB
  * decontamination pattern (reference analog: the n-gram overlap check
  * behind `README.md`'s curation story, reshaped for a corpus too big
  * to shuffle).
  *
  * Why this exists: the exact decontamination join (q51) broadcasts the
  * test-side digest set. That works while the digests fit in the
  * broadcast budget; a big benchmark suite (billions of 8-grams ×
  * 16-byte digests + ids) does not fit, and the fallback — shuffling
  * the corpus shingles against the test set — moves the WHOLE corpus
  * through the exchange. A Bloom filter of the test set is tunably
  * small (m bits total, ~1.2 GB for 10^10 keys at 1% FP), always
  * broadcastable, and drops ~(1-fp) of corpus shingles MAP-SIDE before
  * the exact confirm join ever sees them; only the tiny survivor set is
  * shuffled. False positives are removed by the confirm join, so the
  * final answer is exactly the exact-join answer — the filter changes
  * the plan, never the result (same contract as Spark's own runtime
  * bloom pushdown, which cannot express this cross-column use).
  *
  * Representation: the build aggregates SPARSELY (only nonzero words
  * shuffle: a map-combinable bit_or per touched word), then densifies
  * ONCE into a m/64-element array<bigint> — the broadcast artifact.
  * The probe indexes that array. The densify step exists because Spark
  * map columns are not hash-indexed: `element_at` on MapData is a
  * LINEAR key scan, and probing a 16k-entry map per corpus row turned
  * the 10× clone smoke from seconds into minutes; array `element_at`
  * is an O(1) offset read. Build and probe are pure builtin
  * expressions (xxhash64 / bitwise ops / element_at), codegen'd end to
  * end: no UDF, no driver-side bit array, no JVM-vs-SQL hash mismatch
  * risk. k probe positions derive Kirsch–Mitzenmacher style from two
  * xxhash64 calls (h1 + i·h2), the same derivation
  * Text.minhashSignature uses for its hash families.
  */
object Bloom {

  /** Probe positions for `key`: (h1 + i·h2) & (m-1), m = 2^log2m.
    * Both hashes are masked into [0, m) BEFORE the combine — i·h2 on
    * raw 64-bit hashes would overflow Long (an error under ANSI mode,
    * silent wraparound otherwise); reduced-hash Kirsch–Mitzenmacher is
    * equally valid for power-of-two m. h2 is forced odd so the stride
    * cycles the full ring.
    */
  private def positions(key: Column, log2m: Int, k: Int): Seq[Column] = {
    val mask = (1L << log2m) - 1
    val h1 = xxhash64(key).bitwiseAND(lit(mask))
    val h2 = xxhash64(key, lit(1L)).bitwiseAND(lit(mask)).bitwiseOR(lit(1L))
    (0 until k).map(i => (h1 + h2 * lit(i.toLong)).bitwiseAND(lit(mask)))
  }

  /** Build the filter over `keys(keyCol)`: one row,
    * `bloom: array<bigint>` of exactly 2^log2m / 64 words. One explode
    * (k small ints per key), one map-combinable bit_or aggregation —
    * never wider than k rows per key — then a single-row densify from
    * the sparse word map into the O(1)-indexable array.
    */
  def build(keys: DataFrame, keyCol: String, log2m: Int = 20,
      k: Int = 4): DataFrame = {
    val pos = positions(col(keyCol), log2m, k)
    val nWords = (1L << log2m) / 64L
    // one zero row per word guarantees every index survives the
    // aggregation, so the sorted struct list IS the dense array — no
    // per-index map lookup (an earlier densify probed a 16k-entry map
    // 16k times; MapData lookups are linear scans, and that single
    // driver-side evaluation cost ~13 s — measured, not hypothetical)
    val zeros = keys.sparkSession.range(1)
      .select(explode(sequence(lit(0), lit(nWords - 1))).as("w"))
      .select(col("w").cast("int").as("word"), lit(0L).as("bit"))
    keys
      .select(explode(array(pos: _*)).as("pos"))
      .select(shiftright(col("pos"), 6).cast("int").as("word"),
        expr("shiftleft(1L, int(pos & 63))").as("bit"))
      .unionByName(zeros)
      .groupBy(col("word"))
      .agg(bit_or(col("bit")).as("bits"))
      .agg(sort_array(collect_list(struct(col("word"), col("bits"))))
        .as("s"))
      .select(transform(col("s"), x => x.getField("bits")).as("bloom"))
  }

  /** Membership probe against a `bloom` array column (attach the
    * one-row build output via `crossJoin(broadcast(...))` — the
    * scalar-subquery idiom). All k probed bits must be set. No false
    * negatives; false-positive rate set by m, k, and the build's key
    * count. array element_at is 1-based, hence the +1.
    */
  def mightContain(bloomCol: Column, key: Column, log2m: Int = 20,
      k: Int = 4): Column =
    positions(key, log2m, k).map { p =>
      val word = (shiftright(p, 6) + lit(1L)).cast("int")
      val bit = call_function("shiftleft", lit(1L),
        p.bitwiseAND(lit(63L)).cast("int"))
      element_at(bloomCol, word).bitwiseAND(bit) =!= 0L
    }.reduce(_ && _)

  /** Union of two same-config filters: elementwise bitwise OR. Bloom
    * filters are mergeable — union(build(A), build(B)) is EXACTLY
    * build(A ∪ B) — which is what makes them maintainable
    * incrementally: each batch builds its own filter and ORs into the
    * running one; membership state never requires rescanning history.
    */
  def union(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x.bitwiseOR(y))
}
