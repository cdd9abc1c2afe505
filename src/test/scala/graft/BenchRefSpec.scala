package graft

import org.scalatest.funsuite.AnyFunSuite

/** Exclusive-reference merge policy (VERDICT r9 #2): the committed
  * BENCH_EXCLUSIVE.json is the per-query MIN across the session's
  * clean runs — a synthetic noisy line in a clean run must NOT be able
  * to inflate the ≥4× breach baseline (the round-9 q226 escape).
  */
class BenchRefSpec extends AnyFunSuite {

  test("a noisy line in a clean run cannot refresh past the prior min") {
    val prior = Map("q226_token_weighted_median" -> 0.76, "q01_x" -> 0.10)
    val run = Seq("q01_x" -> 0.11, "q226_token_weighted_median" -> 4.22)
    val merged = Bench.mergeExclusiveRef(prior, run).toMap
    assert(merged("q226_token_weighted_median") == 0.76,
      "noisy 5.6x line must not replace the prior clean minimum")
    assert(merged("q01_x") == 0.10)
  }

  test("a genuinely faster run tightens the reference") {
    val prior = Map("q_a" -> 1.50)
    val merged = Bench.mergeExclusiveRef(prior, Seq("q_a" -> 0.90)).toMap
    assert(merged("q_a") == 0.90)
  }

  test("new queries enter at their measured line; retired keys drop") {
    val prior = Map("q_retired" -> 0.40, "q_a" -> 1.0)
    val merged =
      Bench.mergeExclusiveRef(prior, Seq("q_a" -> 1.2, "q_new" -> 2.5))
    assert(merged.toMap == Map("q_a" -> 1.0, "q_new" -> 2.5))
    assert(!merged.exists(_._1 == "q_retired"),
      "renamed/retired queries must not haunt the reference")
  }

  test("non-positive prior sentinels are ignored, current order kept") {
    val prior = Map("q_a" -> -1.0, "q_b" -> 0.0)
    val merged =
      Bench.mergeExclusiveRef(prior, Seq("q_a" -> 0.5, "q_b" -> 0.6))
    assert(merged == Seq("q_a" -> 0.5, "q_b" -> 0.6))
  }

  // Retime adjudication (VERDICT r10 #1, the q112 incident): a breach
  // retime that itself measures ≥ 4× the committed exclusive line must
  // be flagged unusable — the committed line stays the cost estimate —
  // instead of being published as the run's correction.

  test("a retime worse than its breach is unusable, not a correction") {
    val ref = Map("q112_neardup_flags" -> 1.13)
    val (usable, unusable) = Bench.adjudicateRetimes(
      Seq("q112_neardup_flags" -> 62.9), ref)
    assert(usable.isEmpty,
      "the round-10 q112 shape (62.9 s retime vs 1.13 s committed " +
        "line, 56×) must never be published as a usable correction")
    assert(unusable == Seq("q112_neardup_flags" -> 62.9),
      "the discarded measurement is kept for the audit trail")
  }

  test("a retime back inside the band is the usable correction") {
    val ref = Map("q87_triangles" -> 4.20)
    val (usable, unusable) =
      Bench.adjudicateRetimes(Seq("q87_triangles" -> 4.50), ref)
    assert(usable == Seq("q87_triangles" -> 4.50))
    assert(unusable.isEmpty)
  }

  test("exactly 4x the committed line is already unusable") {
    val (usable, unusable) =
      Bench.adjudicateRetimes(Seq("q_a" -> 4.0), Map("q_a" -> 1.0))
    assert(usable.isEmpty && unusable == Seq("q_a" -> 4.0),
      "the unusable cut uses the same >= 4x slow-direction rule as " +
        "the breach test itself")
  }

  test("a failed retime (-1 sentinel) is unusable by definition") {
    val (usable, unusable) =
      Bench.adjudicateRetimes(Seq("q_a" -> -1.0), Map("q_a" -> 1.0))
    assert(usable.isEmpty && unusable == Seq("q_a" -> -1.0))
  }

  test("no committed line or a sentinel line keeps the retime") {
    // nothing to call the measurement noise against — publish it
    val (usable, unusable) = Bench.adjudicateRetimes(
      Seq("q_new" -> 9.9, "q_sent" -> 9.9),
      Map("q_sent" -> -1.0))
    assert(usable == Seq("q_new" -> 9.9, "q_sent" -> 9.9))
    assert(unusable.isEmpty)
  }

  // Provisional micro-window lines (VERDICT r12 #1 sanctioned
  // fallback): a query the contended host never let into a clean
  // full-suite pass gets a load-gated scoped line under "provisional".
  // The supersede rule keeps the committed reference sovereign in both
  // directions.

  test("a committed line always wins over a provisional one") {
    val eff = Bench.effectiveRef(
      committed = Map("q_a" -> 0.50),
      provisional = Map("q_a" -> 0.10, "q_new" -> 0.30))
    assert(eff == Map("q_a" -> 0.50, "q_new" -> 0.30),
      "provisional must fill gaps only — never override a committed " +
        "line, even with a faster number")
  }

  test("non-positive provisional sentinels never enter the reference") {
    val eff = Bench.effectiveRef(Map.empty,
      Map("q_fail" -> -1.0, "q_zero" -> 0.0, "q_ok" -> 0.25))
    assert(eff == Map("q_ok" -> 0.25))
  }

  test("a clean full-suite refresh supersedes covered provisional keys") {
    // the new committed set covers q275; only q999 (still uncovered,
    // still in the suite) survives the refresh
    val carried = Bench.carryProvisional(
      newCommitted = Map("q275_x" -> 0.31, "q01_a" -> 0.10),
      provisional = Map("q275_x" -> 0.45, "q999_y" -> 0.80),
      suite = Set("q275_x", "q01_a", "q999_y"))
    assert(carried == Map("q999_y" -> 0.80),
      "a provisional line must not outlive the first clean pass that " +
        "commits its query")
  }

  test("a retired query's provisional line drops at the next carry") {
    // banked provisionally, then renamed before any clean full-suite
    // pass: the carry must drop it exactly as mergeExclusiveRef drops
    // retired committed keys — otherwise it is carried forever (a
    // full-suite refresh never covers a name no longer in the suite)
    val carried = Bench.carryProvisional(
      newCommitted = Map("q01_a" -> 0.10),
      provisional = Map("q_renamed_away" -> 0.45, "q999_y" -> 0.80),
      suite = Set("q01_a", "q999_y"))
    assert(carried == Map("q999_y" -> 0.80),
      "a renamed/retired query's provisional line must not haunt the " +
        "reference")
  }

  test("provisionalFresh records only attested-scope queries") {
    // SPARK_GRAFT_BENCH_ONLY may widen the run beyond the attested
    // provisional scope; the extra queries must never enter the
    // reference from a window that was not attested for them
    val fresh = Bench.provisionalFresh(
      results = Seq("q_attested" -> 0.30, "q_only_extra" -> 0.50,
        "q_failed" -> -1.0, "q_committed" -> 0.20),
      scope = Set("q_attested", "q_failed", "q_committed"),
      committed = Map("q_committed" -> 0.15))
    assert(fresh == Seq("q_attested" -> 0.30),
      "only measured-positive, attested, uncommitted queries may " +
        "record provisional lines")
  }

  test("parseRefMap returns empty for an absent key instead of " +
    "parsing whatever precedes the first '}'") {
    // a pre-provisional-format record whose first '}' closes a
    // non-empty retimes map: the absent "provisional" key must not
    // surface the retimes entries as phantom provisional lines
    val line =
      """{"metric":"total","retimes":{"q138_srp_recall":0.2756},"queries":{"q_a":0.5}}"""
    assert(Bench.parseRefMap(line, "provisional") == Map.empty,
      "absent key must be an empty map, not the retimes map")
    assert(Bench.parseRefMap(line, "queries") == Map("q_a" -> 0.5))
    assert(Bench.parseRefMap(line, "retimes") ==
      Map("q138_srp_recall" -> 0.2756))
  }

  test("upsertProvisional appends to a record without the key and " +
    "leaves every committed byte untouched") {
    val line = """{"metric":"total","value":1.0,"queries":{"q_a":0.5},"shuffle_bytes":{"q_a":{"write":1,"read":2,"spill":0}},"sf":"x"}"""
    val out = Bench.upsertProvisional(line, """{"q_new":0.3}""")
    assert(out ==
      """{"metric":"total","value":1.0,"queries":{"q_a":0.5},"shuffle_bytes":{"q_a":{"write":1,"read":2,"spill":0}},"sf":"x","provisional":{"q_new":0.3}}""")
  }

  test("upsertProvisional replaces an existing provisional map in place") {
    val line =
      """{"queries":{"q_a":0.5},"provisional":{"q_old":0.9},"sf":"x"}"""
    val out = Bench.upsertProvisional(line, """{"q_new":0.3}""")
    assert(out ==
      """{"queries":{"q_a":0.5},"provisional":{"q_new":0.3},"sf":"x"}""")
  }

  test("upsertProvisional handles an empty existing provisional map") {
    val line = """{"queries":{"q_a":0.5},"provisional":{},"sf":"x"}"""
    val out = Bench.upsertProvisional(line, """{"q_new":0.3}""")
    assert(out == """{"queries":{"q_a":0.5},"provisional":{"q_new":0.3},"sf":"x"}""")
  }

  test("upsertProvisional rebuilds from the seed on an empty or " +
    "truncated record instead of throwing") {
    // BENCH_EXCLUSIVE.json exists but a crashed prior write left it
    // empty: the missing-file seed never triggers, and substring(0,-1)
    // would kill the bench AFTER the scoped measurements were taken
    assert(Bench.upsertProvisional("", """{"q_new":0.3}""") ==
      """{"queries":{},"provisional":{"q_new":0.3}}""")
  }

  test("the committed BENCH_EXCLUSIVE.json never shadows a committed " +
    "line with a provisional one and only carries positive lines") {
    // artifact-level pin of the supersede rule: the reference on disk
    // must honor the invariant the pure functions enforce — every
    // provisional key names a query with NO committed line
    val p = java.nio.file.Paths.get("BENCH_EXCLUSIVE.json")
    assume(java.nio.file.Files.exists(p))
    val txt = java.nio.file.Files.readString(p)
    def sect(key: String): Map[String, Double] = {
      val marker = "\"" + key + "\":{"
      val i = txt.indexOf(marker)
      if (i < 0) Map.empty
      else "\"(q[^\"]+)\":([-0-9.eE]+)".r
        .findAllMatchIn(txt.substring(i + marker.length,
          txt.indexOf("}", i)))
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
    val committed = sect("queries")
    val prov = sect("provisional")
    val shadowed = prov.keySet.intersect(committed.keySet)
    assert(shadowed.isEmpty,
      s"provisional lines shadow committed ones: $shadowed")
    assert(prov.values.forall(_ > 0),
      "non-positive provisional sentinel leaked into the reference")
  }
}
