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
}
