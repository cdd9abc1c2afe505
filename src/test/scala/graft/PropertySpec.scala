package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Merge, Skew}

/** Property-based invariants (SURVEY.md §5): dedup key-uniqueness, merge
  * cardinality, salted-aggregation equivalence — over seeded randomized
  * inputs (plain scalacheck generators; deterministic seeds).
  */
class PropertySpec extends AnyFunSuite with SparkSpec {

  private val rowsGen = Gen.listOfN(60,
    Gen.zip(Gen.choose(1L, 8L), Gen.choose(1L, 5L), Gen.choose(0L, 1000L)))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("keepFirst: unique keys, one row per group, winner is group max") {
    samples(rowsGen, 5).foreach { rows =>
      import spark.implicits._
      val df = rows.toDF("k1", "k2", "v")
      val out = Dedup.keepFirst(df, Seq("k1", "k2"),
        Seq(col("v").desc, col("v").asc))
      val got = out.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.map(t => (t._1, t._2)).distinct.length == got.length)
      assert(got.length == rows.map(t => (t._1, t._2)).distinct.length)
      val maxes = rows.groupBy(t => (t._1, t._2))
        .map { case (k, vs) => k -> vs.map(_._3).max }
      got.foreach { t => assert(t._3 == maxes((t._1, t._2))) }
    }
  }

  test("connectedComponentsAuto == brute union-find on random graphs, " +
    "on BOTH branches (driver path and forced-distributed path)") {
    import spark.implicits._
    val edgesGen = Gen.listOfN(40,
      Gen.zip(Gen.choose(1L, 25L), Gen.choose(1L, 25L)))
    samples(edgesGen, 4).foreach { edges =>
      // brute reference: repeated relabel-to-min until fixpoint
      var label = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> v).toMap
      var changed = true
      while (changed) {
        changed = false
        edges.foreach { case (a, b) =>
          val m = math.min(label(a), label(b))
          if (label(a) != m || label(b) != m) {
            label += (a -> m); label += (b -> m); changed = true
          }
        }
      }
      val df = edges.toDF("a", "b")
      for (cap <- Seq(2000000, 1)) { // driver path, then forced fallback
        val got = graft.operators.Components
          .connectedComponentsAuto(df, "a", "b", driverCap = cap)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == label, s"cap=$cap edges=$edges")
      }
    }
  }

  test("maxfreq == reference multiplicity count on random long arrays") {
    graft.plans.MaxFreqL.register(spark)
    import spark.implicits._
    // small value domain forces collisions; varying lengths hit the
    // empty/singleton edges
    val arrGen = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-3L, 3L)))
    val arrays = samples(arrGen, 40)
    val got = arrays.map(_.toSeq).toDF("xs")
      .select(expr("maxfreq(xs)")).collect().map(_.getLong(0))
    val want = arrays.map { xs =>
      if (xs.isEmpty) 0L
      else xs.groupBy(identity).values.map(_.length).max.toLong
    }
    assert(got.toSeq == want)
  }

  test("upsert: output keys = union of inputs, staging wins on overlap") {
    val dimGen = Gen.listOfN(20, Gen.zip(Gen.choose(1L, 10L), Gen.alphaStr))
    val stgGen = Gen.listOfN(20, Gen.zip(Gen.choose(5L, 15L), Gen.alphaStr))
    samples(Gen.zip(dimGen, stgGen), 5).foreach { case (dimRows, stgRows) =>
      import spark.implicits._
      val dim = dimRows.toDF("k", "v").dropDuplicates("k")
      val stg = stgRows.toDF("k", "v").dropDuplicates("k")
      val out = Merge.upsert(dim, stg, Seq("k"))
      val dimKeys = dim.select("k").collect().map(_.getLong(0)).toSet
      val stgKeys = stg.select("k").collect().map(_.getLong(0)).toSet
      val outKeys = out.select("k").collect().map(_.getLong(0)).toSet
      assert(outKeys == (dimKeys ++ stgKeys))
      assert(out.count() == outKeys.size)
      val stgMap = stg.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      out.collect().foreach { r =>
        stgMap.get(r.getLong(0)).foreach(v => assert(r.getString(1) == v))
      }
    }
  }

  test("salted aggregation equals plain aggregation") {
    samples(rowsGen, 5).foreach { rows =>
      import spark.implicits._
      val df = rows.toDF("k", "k2", "v")
      val plainC = df.groupBy("k").agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val saltC = Skew.saltedCount(df, Seq("k"), "c")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(saltC == plainC)
      val plainS = df.groupBy("k").agg(sum($"v").as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val saltS = Skew.saltedSum(df, Seq("k"), "v", "s")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(saltS == plainS)
    }
  }

  test("L1 histogram bound is sound: levenshtein >= L1(hist)/2") {
    // the q70 prefilter discards pairs with L1 > 2k; if this invariant
    // ever broke, true near-dups would silently vanish from the result
    import spark.implicits._
    graft.plans.L1DistanceI.register(spark)
    val strGen = Gen.listOfN(2,
      Gen.stringOfN(24, Gen.oneOf(('a' to 'f') :+ ' ')))
    val pairs = samples(strGen, 60).map { case List(a, b) => (a, b) }
    val df = pairs.toDF("a", "b")
      .withColumn("ha", expr(graft.functions.Text.charHistogramSql("a")))
      .withColumn("hb", expr(graft.functions.Text.charHistogramSql("b")))
      .select(levenshtein(col("a"), col("b")).as("lev"),
        expr("l1i(ha, hb)").as("l1"))
    val violations = df.filter(col("lev") * 2 < col("l1")).count()
    assert(violations == 0)
  }

  test("groupQuantiles == naive sort replay on random groups " +
    "(ties, constants, skew, few buckets)") {
    import spark.implicits._
    // small value domain forces heavy ties; tiny bucket count forces
    // multi-value target buckets; group 1 is made constant-valued to
    // hit the degenerate lo == hi range
    val rowsGen = Gen.listOfN(80,
      Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 30L)))
    val ps = Seq(0.1 -> "p10", 0.25 -> "p25", 0.5 -> "p50",
      0.75 -> "p75", 1.0 -> "p100")
    samples(rowsGen, 5).foreach { rows0 =>
      val rows = rows0.map { case (k, v) => (k, if (k == 1L) 7L else v) }
      val df = rows.toDF("k", "v")
      val got = graft.operators.Quantile
        .groupQuantiles(df, "k", "v", ps, buckets = 4)
        .collect()
        .map(r => r.getLong(0) -> ps.indices.map(i => r.getDouble(i + 1)))
        .toMap
      val want = rows.groupBy(_._1).map { case (k, vs) =>
        val sorted = vs.map(_._2.toDouble).sorted
        k -> ps.map { case (p, _) =>
          sorted(math.ceil(p * sorted.length).toInt.max(1) - 1) }
      }
      assert(got.keySet == want.keySet)
      want.foreach { case (k, qs) => assert(got(k) == qs, s"group $k") }
    }
  }

  test("waterfill: budget conserved, caps respected, equal-within-1 " +
    "fair shares, equals the sequential simulation on random caps") {
    import spark.implicits._
    val capsGen = Gen.choose(3, 12).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 500L)))
    samples(Gen.zip(capsGen, Gen.choose(1L, 4L)), 8).foreach {
      case (caps0, bdiv) =>
        val caps = caps0.zipWithIndex
          .map { case (c, i) => (f"k$i%02d", c) }
        val out = graft.operators.Stats.waterfill(
            caps.toDF("k", "cap"), "k", "cap", budgetDiv = bdiv)
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getBoolean(3)))
        val total = caps.map(_._2).sum
        val budget = total / bdiv
        assert(out.map(_._3).sum == math.min(budget, total))
        out.foreach { case (k, cap, alloc, sat) =>
          assert(alloc >= 0 && alloc <= cap, k)
          assert(!sat || alloc == cap, k)
        }
        val unsat = out.filter(!_._4).map(_._3)
        if (unsat.nonEmpty) assert(unsat.max - unsat.min <= 1)
        // sequential simulation (cap-ascending, key tiebreak)
        var rem = budget
        var slots = caps.length.toLong
        val sim = scala.collection.mutable.Map.empty[String, Long]
        var leveled = List.empty[String]
        caps.sortBy(t => (t._2, t._1)).foreach { case (k, cap) =>
          if (leveled.isEmpty && cap * slots <= rem) {
            sim(k) = cap; rem -= cap; slots -= 1
          } else leveled ::= k
        }
        val ordered = leveled.reverse
        ordered.zipWithIndex.foreach { case (k, j) =>
          sim(k) = rem / ordered.length +
            (if (j < rem % ordered.length) 1L else 0L)
        }
        out.foreach { case (k, _, alloc, _) => assert(alloc == sim(k), k) }
    }
  }

  test("giniPpm: equals the rank formula and is EXACTLY scale-" +
    "invariant under x -> c*x on random value frames") {
    import spark.implicits._
    val rowsG = Gen.listOfN(50,
      Gen.zip(Gen.choose(1L, 4L), Gen.choose(1L, 40L)))
    samples(rowsG, 5).foreach { rows =>
      val df = rows.toDF("k", "v")
      def run(f: org.apache.spark.sql.DataFrame) =
        graft.operators.Stats.giniPpm(f, "k", "v").collect()
          .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
            r.getLong(3)))).toMap
      val got = run(df)
      val want = rows.groupBy(_._1).map { case (k, vs) =>
        val xs = vs.map(_._2).sorted
        val n = xs.length.toLong
        val md = 2 * xs.zipWithIndex.map { case (x, i0) =>
          (2 * (i0 + 1L) - n - 1) * x }.sum
        k -> md * 1000000 / (2 * n * xs.sum)
      }
      got.foreach { case (k, (_, _, g)) => assert(g == want(k), s"k $k") }
      // exact invariance: integer scaling multiplies both md and n*sum
      // by c, so the floored ppm is bit-identical
      val scaled = run(rows.map { case (k, v) => (k, v * 7L) }
        .toDF("k", "v"))
      got.foreach { case (k, (_, _, g)) =>
        assert(scaled(k)._3 == g, s"scale invariance broke at k $k") }
    }
  }

  test("mannWhitneyShift: equals the quadratic naive doubled-U and " +
    "cohort swap is exactly antisymmetric") {
    import spark.implicits._
    val rowsG = Gen.listOfN(60, Gen.zip(Gen.choose(1L, 3L),
      Gen.choose(0L, 15L), Gen.oneOf(true, false)))
    samples(rowsG, 5).foreach { rows =>
      val df = rows.toDF("k", "v", "ia")
      def run(f: org.apache.spark.sql.DataFrame) =
        graft.operators.Stats.mannWhitneyShift(f, "k", "v", "ia")
          .collect()
          .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      val got = run(df)
      rows.groupBy(_._1).foreach { case (k, rs) =>
        val as = rs.filter(_._3).map(_._2)
        val bs = rs.filter(!_._3).map(_._2)
        val u2 = as.iterator.map(a =>
          2L * bs.count(_ < a) + bs.count(_ == a)).sum
        val (na, nb, gu2, rbn, rbd) = got(k)
        assert(na == as.length.toLong && nb == bs.length.toLong)
        assert(gu2 == u2 && rbn == u2 - na * nb && rbd == na * nb, s"k $k")
      }
      // swap cohorts: U2(A,B) + U2(B,A) = 2*na*nb exactly (ties split)
      val swapped = run(rows.map { case (k, v, ia) => (k, v, !ia) }
        .toDF("k", "v", "ia"))
      got.foreach { case (k, (na, nb, u2, rbn, _)) =>
        val (nb2, na2, u2s, rbn2, _) = swapped(k)
        assert(na2 == na && nb2 == nb)
        assert(u2 + u2s == 2 * na * nb, s"tie ledger broke at k $k")
        assert(rbn2 == -rbn, s"antisymmetry broke at k $k")
      }
    }
  }

  test("stats kernels: degenerate edges — constant Gini is 0, " +
    "budgetDiv=1 saturates every key, all-ties U is exactly na*nb") {
    import spark.implicits._
    // constant values: every pairwise difference is 0
    val g = graft.operators.Stats.giniPpm(
        Seq.fill(30)((1L, 7L)).toDF("k", "v"), "k", "v")
      .collect().head
    assert(g.getLong(1) == 30L && g.getLong(3) == 0L)
    // full budget: every key takes its cap, none unsaturated
    val w = graft.operators.Stats.waterfill(
        Seq(("a", 5L), ("b", 0L), ("c", 9L)).toDF("k", "cap"),
        "k", "cap", budgetDiv = 1L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(w("a") == ((5L, true)) && w("b") == ((0L, true))
      && w("c") == ((9L, true)))
    // identical distributions with total ties: U2 = 2*(na*nb/2) ties
    // -> u2 == na*nb, rb_num == 0, not shifted
    val rows = (1 to 12).map(i => (1L, 5L, i % 2 == 0))
    val m = graft.operators.Stats.mannWhitneyShift(
        rows.toDF("k", "v", "ia"), "k", "v", "ia")
      .collect().head
    assert(m.getLong(3) == m.getLong(1) * m.getLong(2))
    assert(m.getLong(4) == 0L && !m.getBoolean(6))
  }
}
