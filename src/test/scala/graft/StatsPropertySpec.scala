package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.features.Features
import graft.ops.Stats

/** Differential property tests: every fixed-point statistic replayed
  * against an independent brute-force BigInt implementation on seeded
  * random inputs (heavy ties forced by small value ranges) — the same
  * recall-complete-vs-brute-force pattern the dedup suite uses. Any
  * divergence in integer truncation, tie handling, or prefix-sum
  * plumbing fails exactly. */
class StatsPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(20260815L)

  private def sample(n: Int, range: Int): Seq[Int] =
    Seq.fill(n)(rnd.nextInt(range))

  test("mannWhitney u2/ties match brute-force pair counting") {
    for (_ <- 1 to 6) {
      val as = sample(3 + rnd.nextInt(40), 12)
      val bs = sample(3 + rnd.nextInt(40), 12)
      val df = (as.map(("a", _)) ++ bs.map(("b", _)))
        .map { case (g, v) => (g, v.toDouble) }.toDF("g", "x")
      val got = Features.mannWhitney(df, "x", "g", "a", "b")
        .as[(Long, Long, Long, Option[Double])].collect().head
      val u2 = (for (a <- as; b <- bs) yield
        if (a > b) 2L else if (a == b) 1L else 0L).sum
      assert((got._1, got._2, got._3) ==
        ((as.size.toLong, bs.size.toLong, u2)))
      // z via the same IEEE expression shape
      val (na, nb) = (as.size.toDouble, bs.size.toDouble)
      val pooled = as ++ bs
      val ties = pooled.groupBy(identity).values
        .map(g => { val t = g.size.toLong; t * t * t - t }).sum
      val bracket = (na + nb + 1.0) - ties.toDouble / ((na + nb) * (na + nb - 1.0))
      if (bracket > 0.0 && na + nb > 1) {
        val z = (u2.toDouble - na * nb) /
          (2.0 * math.sqrt((na * nb / 12.0) * bracket))
        assert(math.abs(got._4.get - z) < 1e-12)
      } else assert(got._4.isEmpty)
    }
  }

  test("ksStatistic matches brute-force max CDF gap") {
    for (_ <- 1 to 6) {
      val as = sample(2 + rnd.nextInt(50), 15)
      val bs = sample(2 + rnd.nextInt(50), 15)
      val df = (as.map(("a", _)) ++ bs.map(("b", _)))
        .map { case (g, v) => (g, v.toDouble) }.toDF("g", "x")
      val got = Features.ksStatistic(df, "x", "g", "a", "b")
        .as[(Long, Long, Long)].collect().head
      val vs = (as ++ bs).distinct.sorted
      val gap = vs.map(v => math.abs(
        as.count(_ <= v).toLong * bs.size - bs.count(_ <= v).toLong * as.size))
        .max
      val ks = BigInt(gap) * 1000000 / (BigInt(as.size) * bs.size)
      assert(got == ((as.size.toLong, bs.size.toLong, ks.toLong)))
    }
  }

  test("cramerVonMises matches brute-force integrated squared gap") {
    for (_ <- 1 to 6) {
      val as = sample(2 + rnd.nextInt(40), 10)
      val bs = sample(2 + rnd.nextInt(40), 10)
      val df = (as.map(("a", _)) ++ bs.map(("b", _)))
        .map { case (g, v) => (g, v.toDouble) }.toDF("g", "x")
      val got = Features.cramerVonMises(df, "x", "g", "a", "b")
        .as[(Long, Long, Long)].collect().head
      val (na, nb) = (BigInt(as.size), BigInt(bs.size))
      val u = (as ++ bs).distinct.map { v =>
        val w = BigInt((as ++ bs).count(_ == v))
        val gap = BigInt(as.count(_ <= v)) * nb - BigInt(bs.count(_ <= v)) * na
        w * gap * gap
      }.sum
      val t = u * 1000000 / (na * nb * (na + nb) * (na + nb))
      assert(got == ((as.size.toLong, bs.size.toLong, t.toLong)))
    }
  }

  test("giniCoefficient matches the sorted rank-sum formula") {
    for (_ <- 1 to 6) {
      val xs = sample(2 + rnd.nextInt(60), 9).map(_.toDouble)
      val got = Stats.giniCoefficient(xs.toDF("v"), "v")
        .as[(Long, Long, Option[Long])].collect().head
      val cents = xs.map(x => BigInt((x * 100).round)).sorted
      val n = BigInt(cents.size)
      val t = cents.sum
      val rs = cents.zipWithIndex.map { case (x, i) => x * (i + 1) }.sum
      val want =
        if (t > 0) Some(((rs * 2 - (n + 1) * t) * 1000000 / (n * t)).toLong)
        else None
      assert(got == ((cents.size.toLong, t.toLong, want)))
    }
  }

  test("isotonicCalibration matches brute-force minimax over rationals") {
    for (_ <- 1 to 6) {
      val b = 3 + rnd.nextInt(10)
      val bins = (1 to b).map { i =>
        val w = 1L + rnd.nextInt(20)
        (i.toLong, w, rnd.nextLong(w + 1).max(0L))
      }
      val got = Stats.isotonicCalibration(
          bins.toDF("bin", "n", "pos"), "bin", "n", "pos")
        .orderBy("bin")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      val ws = bins.map(_._2); val ps = bins.map(_._3)
      def frac(j: Int, k: Int): (BigInt, BigInt) =
        (BigInt(ps.slice(j, k + 1).sum), BigInt(ws.slice(j, k + 1).sum))
      def le(a: (BigInt, BigInt), c: (BigInt, BigInt)): Boolean =
        a._1 * c._2 <= c._1 * a._2
      val want = bins.indices.map { i =>
        val inner = (0 to i).map { j =>
          (j to bins.size - 1).filter(_ >= i).map(k => frac(j, k))
            .reduce((x, y) => if (le(x, y)) x else y)
        }
        val mx = inner.reduce((x, y) => if (le(x, y)) y else x)
        (mx._1 * 1000000 / mx._2).toLong
      }
      assert(got.map(_._5) == want)
      assert(got.map(_._5).sliding(2).forall(w => w.size < 2 || w.head <= w.last))
    }
  }

  test("bhDiscoveries matches brute-force BH with adjusted p") {
    for (_ <- 1 to 6) {
      val m = 2 + rnd.nextInt(60)
      val hyp = (1 to m).map(i => (f"h$i%03d", rnd.nextInt(1000000).toLong))
      val q = 10000L + rnd.nextInt(200000)
      val got = Stats.bhDiscoveries(hyp.toDF("h", "p"), "p", Seq("h"), q)
        .orderBy("p_rank")
        .as[(String, Long, Long, Long, Boolean)].collect().toSeq
      val sorted = hyp.sortBy(x => (x._2, x._1))
      val terms = sorted.zipWithIndex.map { case ((_, p), i) =>
        (BigInt(p) * m / (i + 1)).min(1000000).toLong }
      val padj = terms.indices.map(i => terms.drop(i).min)
      val kstar = sorted.zipWithIndex
        .filter { case ((_, p), i) => BigInt(p) * m <= BigInt(i + 1) * q }
        .map(_._2 + 1).lastOption.getOrElse(0)
      val want = sorted.zipWithIndex.map { case ((h, p), i) =>
        (h, p, (i + 1).toLong, padj(i), i + 1 <= kstar) }
      assert(got == want)
    }
  }

  test("cupedReport matches brute-force BigInt moments") {
    for (_ <- 1 to 6) {
      val n = 4 + rnd.nextInt(40)
      val units = (1 to n).map(i => (if (i % 2 == 0) "A" else "B",
        rnd.nextInt(200).toDouble, rnd.nextInt(300).toDouble))
      val got = Stats.cupedReport(units.toDF("g", "x", "y"), "g", "x", "y", "A")
        .orderBy("variant")
        .as[(String, Long, Long, Long, Option[Long], Option[Long])]
        .collect().toSeq
      val cents = units.map { case (g, x, y) =>
        (g, BigInt((x * 100).round), BigInt((y * 100).round)) }
      val nn = BigInt(cents.size)
      val gx = cents.map(_._2).sum; val gy = cents.map(_._3).sum
      val gxy = cents.map(c => c._2 * c._3).sum
      val gxx = cents.map(c => c._2 * c._2).sum
      val varx = nn * gxx - gx * gx
      def sdiv(a: BigInt, b: BigInt): BigInt =
        if (a >= 0) a / b else -((-a) / b)
      val theta = if (varx > 0) Some(sdiv((nn * gxy - gx * gy) * 1000000, varx))
        else None
      val gmx = gx * 10000 / nn
      val want = Seq("A", "B").map { g =>
        val mine = cents.filter(_._1 == g)
        val k = BigInt(mine.size)
        val mean = mine.map(_._3).sum * 10000 / k
        val dx = mine.map(_._2).sum * 10000 / k - gmx
        val adj = theta.map(t => mean - sdiv(t * dx, 1000000)).getOrElse(mean)
        (g, mine.size.toLong, mean.toLong, adj.toLong, theta.map(_.toLong), adj)
      }
      val ctrlAdj = want.head._6
      val expect = want.map { case (g, k, mean, adj, th, adjB) =>
        (g, k, mean, adj, th,
          if (g == "A") None else Some((adjB - ctrlAdj).toLong)) }
      assert(got == expect)
    }
  }

  test("chiSquare and tvDistance match brute-force integer formulas") {
    for (_ <- 1 to 6) {
      val n = 10 + rnd.nextInt(80)
      val rows = (1 to n).map(_ =>
        (s"a${rnd.nextInt(4)}", s"b${rnd.nextInt(3)}"))
      val gotChi = Stats.chiSquareIndependence(rows.toDF("a", "b"), "a", "b")
        .as[(Long, Long, Long, Option[Double])].collect().head
      val cells = rows.groupBy(identity).map { case ((a, b), g) =>
        (a, b, BigInt(g.size)) }.toSeq
      val ra = cells.groupBy(_._1).map { case (k, g) => k -> g.map(_._3).sum }
      val cb = cells.groupBy(_._2).map { case (k, g) => k -> g.map(_._3).sum }
      val nn = BigInt(n)
      val chi = cells.map { case (a, b, o) =>
        val e = ra(a) * cb(b) * 1000000 / nn
        if (e > 0) { val d = o * 1000000 - e; d * d / e } else BigInt(0)
      }.sum
      assert((gotChi._1, gotChi._2, gotChi._3) ==
        ((n.toLong, (ra.size - 1L) * (cb.size - 1L), chi.toLong)))
      // TVD between the two "a" cohorts most frequent in the sample
      val groups = rows.groupBy(_._1).toSeq.sortBy(-_._2.size).map(_._1)
      if (groups.size >= 2) {
        val (g1, g2) = (groups(0), groups(1))
        val gotTvd = Stats.tvDistance(rows.toDF("cat", "g")
            .select(org.apache.spark.sql.functions.col("g").as("c"),
              org.apache.spark.sql.functions.col("cat").as("grp")),
            "c", "grp", g1, g2)
          .as[(Long, Long, Option[Long])].collect().head
        val c1 = rows.filter(_._1 == g1).map(_._2)
        val c2 = rows.filter(_._1 == g2).map(_._2)
        val (m1, m2) = (BigInt(c1.size), BigInt(c2.size))
        val s = (c1 ++ c2).distinct.map(v =>
          (BigInt(c1.count(_ == v)) * m2 - BigInt(c2.count(_ == v)) * m1).abs).sum
        assert(gotTvd == ((c1.size.toLong, c2.size.toLong,
          Some((s * 1000000 / (2 * m1 * m2)).toLong))))
      }
    }
  }
  test("robustStats and madStats match brute-force sorted references") {
    for (_ <- 1 to 5) {
      val xs = sample(3 + rnd.nextInt(60), 14).map(_.toDouble)
      val cents = xs.map(x => (x * 100).round).sorted
      val n = cents.size
      def rank(p: Int) = cents((p * n + 99) / 100 - 1)
      val (q1, med, q3) = (rank(25), rank(50), rank(75))
      val lo = cents.count(v => 2 * v < 2 * q1 - 3 * (q3 - q1))
      val hi = cents.count(v => 2 * v > 2 * q3 + 3 * (q3 - q1))
      assert(graft.features.Features.robustStats(xs.toDF("v"), "v")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head ==
        ((n.toLong, q1, med, q3, q3 - q1, lo.toLong, hi.toLong)))
      val devs = cents.map(v => (v - med).abs).sorted
      val mad = devs((50 * n + 99) / 100 - 1)
      assert(graft.features.Features.madStats(xs.toDF("v"), "v")
        .as[(Long, Long, Long)].collect().head == ((n.toLong, med, mad)))
    }
  }

  test("lorenzCurve matches brute-force sorted cumulative shares") {
    for (_ <- 1 to 5) {
      val xs = sample(3 + rnd.nextInt(60), 9).map(_.toDouble)
      val cents = xs.map(x => BigInt((x * 100).round)).sorted
      val n = cents.size
      val t = cents.sum
      val got = Stats.lorenzCurve(xs.toDF("v"), "v").orderBy("decile")
        .as[(Int, Long, Option[Long])].collect().toSeq
      val want = (1 to 10).map { d =>
        val k = (d * n + 9) / 10
        val w = cents.take(k).sum
        (d, k.toLong, if (t > 0) Some((w * 1000000 / t).toLong) else None)
      }
      assert(got == want)
    }
  }
}
