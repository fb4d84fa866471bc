package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Baskets, EventAnalytics}

/** Markov transition matrix + market-basket rules. */
class BasketsEventsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("transitionMatrix: counts and fixed-point probabilities") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "A"),
      (1L, ts("2024-01-01 00:01:00"), 2L, "B"),
      (1L, ts("2024-01-01 00:02:00"), 3L, "A"),
      (1L, ts("2024-01-01 00:03:00"), 4L, "B"),
      (2L, ts("2024-01-01 00:00:00"), 5L, "B"),
      (2L, ts("2024-01-01 00:01:00"), 6L, "B")
    ).toDF("user_id", "t", "eid", "typ")
    val got = EventAnalytics.transitionMatrix(events, "user_id", "t", "typ", Seq("eid"))
      .orderBy("cur_type", "next_type")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("A", "B", 2L, 1000000L),
      ("B", "A", 1L, 500000L),
      ("B", "B", 1L, 500000L)))
  }

  test("transitionMatrix: the last event per entity emits no transition") {
    val events = Seq((1L, ts("2024-01-01 00:00:00"), 1L, "A"))
      .toDF("user_id", "t", "eid", "typ")
    assert(EventAnalytics.transitionMatrix(events, "user_id", "t", "typ").isEmpty)
  }

  test("basketItems drops oversized baskets and dedups memberships") {
    val lines = Seq((1L, "x"), (1L, "x"), (1L, "y"), (1L, "z"), (2L, "x"), (2L, "y"))
      .toDF("bk", "it")
    val got = Baskets.basketItems(lines, "bk", "it", maxBasketSize = 2)
      .as[(Long, String)].collect().toSet
    assert(got == Set((2L, "x"), (2L, "y"))) // basket 1 has 3 distinct items → dropped
  }

  test("runningDistinct: counts climb only on first occurrences per entity") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "A"),
      (1L, ts("2024-01-01 00:01:00"), 2L, "B"),
      (1L, ts("2024-01-01 00:02:00"), 3L, "A"),
      (1L, ts("2024-01-01 00:03:00"), 4L, "C"),
      (2L, ts("2024-01-01 00:00:00"), 5L, "B")
    ).toDF("user_id", "t", "eid", "typ")
    val got = graft.ops.Windows.runningDistinct(events, "user_id", "typ",
        Seq("t", "eid"))
      .orderBy("eid").select("eid", "distinct_so_far")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 2L), (3L, 2L), (4L, 3L), (5L, 1L)))
  }

  test("seasonalNaiveBacktest: date-keyed season join, exact WAPE/MAPE") {
    // series X: days 1..9 counts 1,1,1,1,1,1,1,3,1 -> lag-7 pairs at
    // days 8 (actual 3 vs fc 1) and 9 (actual 1 vs fc 1)
    val rows = (1 to 7).map(d => (f"2024-01-0$d%d 10:00:00", 1)) ++
      Seq(("2024-01-08 10:00:00", 3), ("2024-01-09 10:00:00", 1))
    val events = rows.flatMap { case (d, n) =>
      (1 to n).map(i => ("X", ts(d.replace("10:00", f"1$i%d:00")))) }
      .toDF("typ", "t")
    val got = graft.ops.EventAnalytics
      .seasonalNaiveBacktest(events, "typ", "t", seasonDays = 7)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // n_days=2, total_actual=4, wape = (2*1e6) div 4, mape = ((2e6 div 3)+0) div 2
    assert(got == Seq(("X", 2L, 4L, 500000L, 333333L)))
  }

  test("attribution: first/last/linear credits reconcile per converter") {
    val events = Seq(
      // user 1: A, B, C then purchase -> n=3, linear rem 1 to A
      (1L, ts("2024-01-01 00:00:00"), 1L, "A"),
      (1L, ts("2024-01-01 00:01:00"), 2L, "B"),
      (1L, ts("2024-01-01 00:02:00"), 3L, "C"),
      (1L, ts("2024-01-01 00:03:00"), 4L, "purchase"),
      // user 2: single touch B then purchase; later touch excluded
      (2L, ts("2024-01-01 00:00:00"), 5L, "B"),
      (2L, ts("2024-01-01 00:01:00"), 6L, "purchase"),
      (2L, ts("2024-01-01 00:02:00"), 7L, "A"),
      // user 3: never converts -> excluded entirely
      (3L, ts("2024-01-01 00:00:00"), 8L, "A")
    ).toDF("user_id", "t", "eid", "typ")
    val got = graft.ops.EventAnalytics
      .attribution(events, "user_id", "t", "typ", "purchase", Seq("eid"))
      .orderBy("channel")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("A", 1000000L, 0L, 333334L, 1L),
      ("B", 1000000L, 1000000L, 1333333L, 2L),
      ("C", 0L, 1000000L, 333333L, 1L)))
    // per-model totals reconcile to 1e6 per converter (2 converters)
    assert(got.map(_._2).sum == 2000000L)
    assert(got.map(_._3).sum == 2000000L)
    assert(got.map(_._4).sum == 2000000L)
  }

  test("triangleStats: hand-computed triangles on K4 minus an edge") {
    // nodes 1..4, edges (1,2)(1,3)(2,3)(2,4)(3,4) — triangles (1,2,3), (2,3,4)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("u", "v")
    val got = graft.ops.Graph.triangleStats(edges)
      .orderBy("node")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 1L, 1000000L),   // 2·1e6 / (2·1)
      (2L, 3L, 2L, 666666L),    // 4e6 div 6
      (3L, 3L, 2L, 666666L),
      (4L, 2L, 1L, 1000000L)))
  }

  test("triangleStats: triangle-free graph and deg-1 node get zeros") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("u", "v") // a path: no triangles
    val got = graft.ops.Graph.triangleStats(edges)
      .orderBy("node")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 0L, 0L), (2L, 2L, 0L, 0L), (3L, 1L, 0L, 0L)))
  }

  test("coPurchaseEdges: distinct unordered pairs sharing a basket") {
    val m = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 20L))
      .toDF("basket", "item")
    val got = graft.ops.Baskets.coPurchaseEdges(m)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 20L), (10L, 30L), (20L, 30L)))
  }

  test("pairRules: hand-computed support / confidence / lift, both directions") {
    val m = Seq((1L, "x"), (1L, "y"), (1L, "z"), (2L, "x"), (2L, "y"), (3L, "x"))
      .toDF("basket", "item")
    val got = Baskets.pairRules(m, minPairCount = 2L)
      .orderBy("item_a", "item_b")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    // only (x,y) co-occurs twice; n_baskets=3, n_x=3, n_y=2
    assert(got == Seq(
      ("x", "y", 2L, 666666L, 666666L, 999999L),  // lift = (666666·3) div 2
      ("y", "x", 2L, 666666L, 1000000L, 1000000L))) // conf = 2e6 div 2
  }

  test("kaplanMeier: hand product-limit, censor-only days, tie day") {
    val subj = Seq((1, 1), (2, 1), (3, 0)).toDF("dur", "obs")
    val got = EventAnalytics.kaplanMeier(subj, "dur", "obs")
      .orderBy("duration")
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    // S(1) = 2/3, S(2) = 2/3 * 1/2 = 1/3; the censored day-3 subject
    // leaves the curve flat (and must NOT count as a churn)
    assert(got == Seq((1, 3L, 1L, 0L, 666666L), (2, 2L, 1L, 0L, 333333L),
      (3, 1L, 0L, 1L, 333333L)))
    // all-censored cohort: survival never drops
    val cens = Seq((5, 0), (7, 0)).toDF("dur", "obs")
    assert(EventAnalytics.kaplanMeier(cens, "dur", "obs")
      .orderBy("duration")
      .as[(Int, Long, Long, Long, Long)].collect().toSeq ==
      Seq((5, 2L, 0L, 1L, 1000000L), (7, 1L, 0L, 1L, 1000000L)))
    // tie day with mixed event/censor; final event takes S to 0
    val tie = Seq((1, 1), (1, 1), (1, 0), (2, 1)).toDF("dur", "obs")
    assert(EventAnalytics.kaplanMeier(tie, "dur", "obs")
      .orderBy("duration")
      .as[(Int, Long, Long, Long, Long)].collect().toSeq ==
      Seq((1, 4L, 2L, 1L, 500000L), (2, 1L, 1L, 0L, 0L)))
  }
}
