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
}
