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
}
