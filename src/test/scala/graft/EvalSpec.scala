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

  test("contextAssembly: budget prefix per query; rank 1 survives overflow") {
    val topk = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), // toks 30+40+50, budget 80
      (2L, 20L, 1), (2L, 21L, 2),               // rank-1 doc alone overflows
      (3L, 10L, 1), (3L, 11L, 2))               // everything fits
      .toDF("query_id", "neighbor_id", "rank")
    val docs = Seq((10L, 30L), (11L, 40L), (12L, 50L), (20L, 500L), (21L, 10L))
      .toDF("doc_id", "n_tokens")
    val out = graft.sim.Rag.contextAssembly(topk, docs, "doc_id", "n_tokens", 80L)
      .select("query_id", "n_ctx_docs", "ctx_tokens", "ctx_doc_ids")
      .as[(Long, Int, Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 2, 70L, "10,11"),       // 30+40 = 70 ≤ 80; +50 would overflow
      (2L, 1, 500L, "20"),         // overflowing rank 1 kept, rank 2 cut
      (3L, 2, 70L, "10,11")))
  }

  test("contextAssembly: the kept set is always a rank prefix") {
    // a small doc AFTER the overflow point must not sneak back in
    val topk = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val docs = Seq((10L, 6L), (11L, 20L), (12L, 2L)).toDF("doc_id", "n_tokens")
    val out = graft.sim.Rag.contextAssembly(topk, docs, "doc_id", "n_tokens", 10L)
      .select("n_ctx_docs", "ctx_doc_ids").as[(Int, String)].collect()
    assert(out.toSeq == Seq((1, "10")))
  }

  test("prototypeFilter: kept set is the exact top fraction by cosine to the seed mean") {
    import graft.sim.Similarity
    // seed along +x; corpus at varying angles — kept = the most x-aligned
    def vec(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val seed = Seq((100L, vec(1, 0)), (101L, vec(2, 0))).toDF("id", "v")
    val corpus = Seq(
      (1L, vec(5, 0)),    // cos 1.0
      (2L, vec(1, 0.1)),  // cos ~0.995
      (3L, vec(1, 1)),    // cos ~0.707
      (4L, vec(0, 1)),    // cos 0
      (5L, vec(-1, 0)))   // cos -1
      .toDF("id", "v")
    val kept = Similarity.prototypeFilter(corpus, "id", "v", seed, "v", 0.4)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L)) // ceil(0.4*5) = 2
    // layout independence
    val kept2 = Similarity.prototypeFilter(corpus.repartition(5), "id", "v",
        seed.repartition(2), "v", 0.4)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept2 == kept)
  }

  test("prototypeFilter: boundary score ties resolve to the smallest id") {
    import graft.sim.Similarity
    def vec(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val seed = Seq((0L, vec(1, 0))).toDF("id", "v")
    val corpus = Seq(
      (9L, vec(3, 0)), (4L, vec(1, 0)), (7L, vec(2, 0)), // all cos 1.0
      (5L, vec(0, 1)))
      .toDF("id", "v")
    // ceil(0.5*4) = 2 of the three cos-1.0 ties -> smallest ids 4, 7
    val kept = Similarity.prototypeFilter(corpus, "id", "v", seed, "v", 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(4L, 7L))
  }
}
