package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Eval

class EvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("recallAtK: per-query overlap, lost queries score 0, extras ignored") {
    val exact = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 20L), (2L, 21L), (2L, 22L))
      .toDF("query_id", "neighbor_id")
    // q1 recovers 2 of 3; q2 absent entirely; q3 exists only in approx
    val approx = Seq(
      (1L, 11L), (1L, 12L), (1L, 99L),
      (3L, 30L), (3L, 31L), (3L, 32L))
      .toDF("query_id", "neighbor_id")
    val out = Eval.recallAtK(exact, approx, k = 3)
      .select("query_id", "n_exact", "n_hits", "recall_pct")
      .as[(Long, Int, Int, Int)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 3, 2, 66), (2L, 3, 0, 0)))
  }

  test("recallAtK: perfect recovery is 100 regardless of ranking order") {
    val exact = Seq((7L, 1L), (7L, 2L)).toDF("query_id", "neighbor_id")
    val approx = Seq((7L, 2L), (7L, 1L)).toDF("query_id", "neighbor_id")
    val out = Eval.recallAtK(exact, approx, k = 2)
      .select("n_hits", "recall_pct").as[(Int, Int)].collect()
    assert(out.toSeq == Seq((2, 100)))
  }

  test("recallAtK is partition-layout independent") {
    val exact = (1L to 20L).flatMap(q => (1L to 10L).map(n => (q, q * 100 + n)))
      .toDF("query_id", "neighbor_id")
    val approx = (1L to 20L).flatMap(q => (1L to 10L).map(n =>
        (q, if (n % 3 == 0) -n else q * 100 + n)))
      .toDF("query_id", "neighbor_id")
    val a = Eval.recallAtK(exact, approx, k = 10)
      .orderBy("query_id").collect().toSeq
    val b = Eval.recallAtK(exact.repartition(7), approx.repartition(3), k = 10)
      .orderBy("query_id").collect().toSeq
    assert(a == b)
    // 10 neighbors, every 3rd corrupted -> 7 hits, 70%
    assert(a.forall(r => r.getInt(r.fieldIndex("recall_pct")) == 70))
  }
}
