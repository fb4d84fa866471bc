package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Stats

/** Experiment readout + Poisson bootstrap. */
class StatsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("abReport: hand-computed rates, delta, and two-proportion z") {
    val units = Seq(
      ("A", 0), ("A", 1), ("A", 0), ("A", 0),
      ("B", 1), ("B", 1), ("B", 1), ("B", 0)
    ).toDF("variant", "converted")
    val got = Stats.abReport(units, "variant", "converted", "A")
      .orderBy("variant")
      .as[(String, Long, Long, Long, Option[Long], Option[Double])]
      .collect().toSeq
    assert(got.head == (("A", 4L, 1L, 250000L, None, None)))
    val b = got(1)
    assert((b._1, b._2, b._3, b._4, b._5) == (("B", 4L, 3L, 750000L, Some(500000L))))
    // p1=.75 p2=.25 pooled=.5 -> z = .5 / sqrt(.5*.5*(1/4+1/4)) = sqrt 2
    // (the fixed expression shape rounds 1 ulp below math.sqrt(2) — the
    // SAME shape in any IEEE engine reproduces this exact double)
    assert(b._6.get == 1.414213562373095)
    assert(math.abs(b._6.get - math.sqrt(2.0)) < 1e-15)
  }

  test("abReport: degenerate all-convert panel yields null z, not an ANSI error") {
    val units = Seq(("A", 1), ("A", 1), ("B", 1)).toDF("variant", "converted")
    val got = Stats.abReport(units, "variant", "converted", "A")
      .orderBy("variant")
      .as[(String, Long, Long, Long, Option[Long], Option[Double])]
      .collect().toSeq
    assert(got(1) == (("B", 1L, 1L, 1000000L, Some(0L), None)))
  }

  test("bootstrapReplicates: deterministic, layout-independent, sane weights") {
    val df = (1L to 500L).map(i => (i, (i % 97).toDouble + 1.0)).toDF("id", "x")
    val a = Stats.bootstrapReplicates(df, "x", Seq("id"), nReplicates = 8)
      .orderBy("replicate")
      .as[(Int, Long, Double)].collect().toSeq
    val b = Stats.bootstrapReplicates(df.repartition(7), "x", Seq("id"),
        nReplicates = 8)
      .orderBy("replicate")
      .as[(Int, Long, Double)].collect().toSeq
    assert(a == b)                       // pure function of (keys, replicate, salt)
    assert(a.map(_._1) == (0 until 8))
    // Poisson(1) weights: n_eff concentrates near n (sd ~ sqrt(500) ~ 22)
    assert(a.forall { case (_, nEff, _) => nEff > 380 && nEff < 620 })
    val (lo, hi) = (1.0, 97.0)
    assert(a.forall { case (_, _, m) => m > lo && m < hi })
  }

  test("bootstrapReplicates: native kernel ≡ Column md5-gate form") {
    // The BootstrapWeights kernel must be bit-identical to the portable
    // concat_ws|md5|conv chain the DuckDB oracle replays — including on
    // multi-column keys (the '|' pre-join) and non-default R/salt.
    val df = (1L to 300L)
      .map(i => (i, s"g${i % 7}", (i % 41).toDouble + 0.25))
      .toDF("id", "grp", "x")
    for ((reps, salt) <- Seq((8, 42), (5, 7))) {
      val kernel = Stats.bootstrapReplicates(df, "x", Seq("id", "grp"),
          nReplicates = reps, salt = salt)
        .orderBy("replicate").as[(Int, Long, Double)].collect().toSeq
      val column = Stats.bootstrapReplicatesColumnForm(df, "x", Seq("id", "grp"),
          nReplicates = reps, salt = salt)
        .orderBy("replicate").as[(Int, Long, Double)].collect().toSeq
      assert(kernel == column)
    }
  }

  test("bootstrapCI: nearest-rank bounds over a hand replicate table") {
    val reps = (1 to 10).map(i => (i, 100L, i.toDouble)).toDF("replicate", "n_eff", "wmean")
    val got = Stats.bootstrapCI(reps, level = 0.9)
      .as[(Double, Double, Double)].collect().head
    assert(got == ((5.5, 1.0, 10.0)))
  }

  test("chiSquareIndependence: hand 2x2, independent table, degenerate axis") {
    // 2x2 with every cell |o-e| = 5, e = 15: each cell contributes
    // floor(25e12 / 15e6) = 1666666 micros; chi2 = 4*25/15 = 6.667
    val rows =
      Seq.fill(10)(("x", "p")) ++ Seq.fill(20)(("x", "q")) ++
      Seq.fill(20)(("y", "p")) ++ Seq.fill(10)(("y", "q"))
    val df = rows.toDF("a", "b")
    val got = Stats.chiSquareIndependence(df, "a", "b")
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert((got._1, got._2, got._3) == ((60L, 1L, 6666664L)))
    assert(math.abs(got._4.get - math.sqrt(6.666664 / 60.0)) < 1e-12)
    // layout-independent (fixed-point arithmetic, no floating sums)
    val re = Stats.chiSquareIndependence(df.repartition(7), "a", "b")
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(got == re)
    // exact independence: every observed equals expected -> 0
    val ind = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")).toDF("a", "b")
    val gi = Stats.chiSquareIndependence(ind, "a", "b")
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(gi == ((4L, 1L, 0L, Some(0.0))))
    // one-category axis: dof 0, null V
    val deg = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    val gd = Stats.chiSquareIndependence(deg, "a", "b")
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(gd == ((2L, 0L, 0L, None)))
  }

  test("tvDistance: hand value, identical and disjoint cohorts") {
    val df = (Seq.fill(3)(("u", "A")) ++ Seq(("v", "A")) ++
      Seq(("u", "B")) ++ Seq.fill(3)(("v", "B"))).toDF("cat", "g")
    val got = Stats.tvDistance(df, "cat", "g", "A", "B")
      .as[(Long, Long, Long)].collect().head
    assert(got == ((4L, 4L, 500000L)))   // |.75-.25| -> TVD = 0.5
    val same = Seq(("u", "A"), ("v", "A"), ("u", "B"), ("v", "B")).toDF("cat", "g")
    assert(Stats.tvDistance(same, "cat", "g", "A", "B")
      .as[(Long, Long, Long)].collect().head._3 == 0L)
    val disj = Seq(("u", "A"), ("v", "B")).toDF("cat", "g")
    assert(Stats.tvDistance(disj, "cat", "g", "A", "B")
      .as[(Long, Long, Long)].collect().head._3 == 1000000L)
  }
  test("cupedReport: hand theta, adjusted means flip the naive delta") {
    // A: pre {10,20} post {20,40}; B: pre {15,25} post {25,50}
    val units = Seq(
      ("A", 10.0, 20.0), ("A", 20.0, 40.0),
      ("B", 15.0, 25.0), ("B", 25.0, 50.0)
    ).toDF("variant", "pre", "post")
    val got = Stats.cupedReport(units, "variant", "pre", "post", "A")
      .orderBy("variant")
      .as[(String, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    // theta = (4*26.25e6 - 7000*13500) / (4*13.5e6 - 7000^2) = 2.1
    // gmean(x) = 17.5e6; A dx = -2.5e6, B dx = +2.5e6
    // adjA = 30e6 + 2.1*2.5e6 = 35.25e6; adjB = 37.5e6 - 5.25e6 = 32.25e6
    assert(got(0) == (("A", 2L, 30000000L, 35250000L, Some(2100000L), None)))
    assert(got(1) ==
      (("B", 2L, 37500000L, 32250000L, Some(2100000L), Some(-3000000L))))
    // degenerate Var(x) = 0: theta null, adjusted = raw mean
    val flat = Seq(("A", 5.0, 10.0), ("B", 5.0, 30.0)).toDF("variant", "pre", "post")
    val gf = Stats.cupedReport(flat, "variant", "pre", "post", "A")
      .orderBy("variant")
      .as[(String, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    assert(gf(0) == (("A", 1L, 10000000L, 10000000L, None, None)))
    assert(gf(1) == (("B", 1L, 30000000L, 30000000L, None, Some(20000000L))))
  }

  test("cupedReport is layout-independent") {
    val units = (1 to 300).map(i => (if (i % 2 == 0) "A" else "B",
      (i * 37 % 101).toDouble, (i * 53 % 211).toDouble))
      .toDF("variant", "pre", "post")
    val a = Stats.cupedReport(units, "variant", "pre", "post", "A")
      .orderBy("variant")
      .as[(String, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    val b = Stats.cupedReport(units.repartition(13), "variant", "pre", "post", "A")
      .orderBy("variant")
      .as[(String, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    assert(a == b)
  }

  test("bhDiscoveries: textbook k*, adjusted p, none-pass family") {
    // p = .01 .02 .03 .50 at q=.05, m=4: all of the first three pass
    val hyp = Seq(("h1", 10000L), ("h2", 20000L), ("h3", 30000L),
      ("h4", 500000L)).toDF("h", "p")
    val got = Stats.bhDiscoveries(hyp, "p", Seq("h"), 50000L)
      .orderBy("p_rank")
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("h1", 10000L, 1L, 40000L, true),
      ("h2", 20000L, 2L, 40000L, true),
      ("h3", 30000L, 3L, 40000L, true),
      ("h4", 500000L, 4L, 500000L, false)))
    // nothing passes -> k* = 0; rank-1 term caps at 1e6 and the
    // suffix min pulls rank 2's smaller term forward
    val none = Seq(("h1", 500000L), ("h2", 600000L)).toDF("h", "p")
    assert(Stats.bhDiscoveries(none, "p", Seq("h"), 50000L)
      .orderBy("p_rank")
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq == Seq(
      ("h1", 500000L, 1L, 600000L, false),
      ("h2", 600000L, 2L, 600000L, false)))
  }

  test("bhDiscoveries is layout-independent (range-rank topology)") {
    val hyp = (1 to 500).map(i => (s"h$i", (i * 37 % 997).toLong * 1000L))
      .toDF("h", "p")
    val a = Stats.bhDiscoveries(hyp, "p", Seq("h"), 50000L)
      .orderBy("p_rank")
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    val b = Stats.bhDiscoveries(hyp.repartition(17), "p", Seq("h"), 50000L)
      .orderBy("p_rank")
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(a == b)
    // padj is monotone non-decreasing in rank order
    assert(a.map(_._4).sliding(2).forall(w => w.head <= w.last))
  }

  test("giniCoefficient: equality 0, one-holder (n-1)/n, tie-immune") {
    val eq = Seq(10.0, 10.0, 10.0, 10.0).toDF("v")
    assert(Stats.giniCoefficient(eq, "v")
      .as[(Long, Long, Option[Long])].collect().head ==
      ((4L, 4000L, Some(0L))))
    val one = Seq(0.0, 0.0, 0.0, 10.0).toDF("v")
    assert(Stats.giniCoefficient(one, "v")
      .as[(Long, Long, Option[Long])].collect().head ==
      ((4L, 1000L, Some(750000L))))
    // layout-independence with heavy ties
    val big = (1 to 1000).map(i => (i % 7).toDouble).toDF("v")
    val a = Stats.giniCoefficient(big, "v")
      .as[(Long, Long, Option[Long])].collect().head
    val b = Stats.giniCoefficient(big.repartition(13), "v")
      .as[(Long, Long, Option[Long])].collect().head
    assert(a == b)
    // empty input -> zero counts, null gini
    val empty = Seq.empty[Double].toDF("v")
    assert(Stats.giniCoefficient(empty, "v")
      .as[(Long, Long, Option[Long])].collect().head ==
      ((0L, 0L, None)))
  }

  test("isotonicCalibration: hand PAVA pools, monotone input unchanged") {
    // rates 1.0, 0, 0.5 -> first two pool to 0.5; third stays (no strict
    // violation against an equal neighbor)
    val bins = Seq((1L, 2L, 2L), (2L, 2L, 0L), (3L, 2L, 1L))
      .toDF("bin", "n", "pos")
    val got = Stats.isotonicCalibration(bins, "bin", "n", "pos")
      .orderBy("bin")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L, 1000000L, 500000L),
      (2L, 2L, 0L, 0L, 500000L), (3L, 2L, 1L, 500000L, 500000L)))
    assert(got.map(_._5).sliding(2).forall(w => w.head <= w.last))
    // already-isotonic input is a fixed point
    val mono = Seq((1L, 4L, 0L), (2L, 4L, 2L), (3L, 4L, 4L))
      .toDF("bin", "n", "pos")
    assert(Stats.isotonicCalibration(mono, "bin", "n", "pos")
      .orderBy("bin")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq ==
      Seq((1L, 4L, 0L, 0L, 0L), (2L, 4L, 2L, 500000L, 500000L),
        (3L, 4L, 4L, 1000000L, 1000000L)))
    // weighted pool: (w=1, rate 1.0) vs (w=3, rate 0) -> 1/4
    val wtd = Seq((1L, 1L, 1L), (2L, 3L, 0L)).toDF("bin", "n", "pos")
    assert(Stats.isotonicCalibration(wtd, "bin", "n", "pos")
      .orderBy("bin")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq ==
      Seq((1L, 1L, 1L, 1000000L, 250000L), (2L, 3L, 0L, 0L, 250000L)))
    // zero-weight bins are dropped, not divided by
    val zw = Seq((1L, 0L, 0L), (2L, 2L, 1L)).toDF("bin", "n", "pos")
    assert(Stats.isotonicCalibration(zw, "bin", "n", "pos")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq ==
      Seq((2L, 2L, 1L, 500000L, 500000L)))
  }

  test("diffInDiff: hand cells, empty cell yields null estimate") {
    val df = Seq(
      (true, false, 10.0), (true, false, 20.0), (true, true, 30.0),
      (false, false, 10.0), (false, true, 15.0)
    ).toDF("treat", "post", "v")
    val got = Stats.diffInDiff(df, "treat", "post", "v")
      .as[(Long, Long, Long, Long, Option[Long], Option[Long],
        Option[Long], Option[Long], Option[Long])].collect().head
    assert(got == ((2L, 1L, 1L, 1L, Some(15000000L), Some(30000000L),
      Some(10000000L), Some(15000000L), Some(10000000L))))
    val sparse = Seq((true, false, 10.0), (true, true, 30.0),
      (false, false, 10.0)).toDF("treat", "post", "v")
    val gs = Stats.diffInDiff(sparse, "treat", "post", "v")
      .as[(Long, Long, Long, Long, Option[Long], Option[Long],
        Option[Long], Option[Long], Option[Long])].collect().head
    assert(gs._4 == 0L && gs._8.isEmpty && gs._9.isEmpty)
  }
  test("lorenzCurve: equality line, one-holder corner, tie-exact boundaries") {
    val eq = Seq(10.0, 10.0, 10.0, 10.0).toDF("v")
    val got = Stats.lorenzCurve(eq, "v").orderBy("decile")
      .as[(Int, Long, Option[Long])].collect().toSeq
    // equality: share_d = k_d / n exactly, with k_d = ceil(4d/10)
    val ks = (1 to 10).map(d => (4L * d + 9) / 10)
    assert(got == (1 to 10).map(d =>
      (d, ks(d - 1), Some(ks(d - 1) * 250000L))))
    // one holder: zero share until the holder's rank enters at k_d = 4
    val one = Seq(0.0, 0.0, 0.0, 10.0).toDF("v")
    val go = Stats.lorenzCurve(one, "v").orderBy("decile")
      .as[(Int, Long, Option[Long])].collect().toSeq
    assert(go.map(_._3.get) ==
      Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 1000000L, 1000000L, 1000000L))
    // curve is non-decreasing and layout-independent
    val big = (1 to 500).map(i => (i % 23).toDouble).toDF("v")
    val a = Stats.lorenzCurve(big, "v").orderBy("decile")
      .as[(Int, Long, Option[Long])].collect().toSeq
    val b = Stats.lorenzCurve(big.repartition(9), "v").orderBy("decile")
      .as[(Int, Long, Option[Long])].collect().toSeq
    assert(a == b)
    assert(a.map(_._3.get).sliding(2).forall(w => w.head <= w.last))
    assert(a.last._3.get == 1000000L)
  }
}
