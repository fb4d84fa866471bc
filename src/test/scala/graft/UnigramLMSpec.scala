package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.UnigramLM

class UnigramLMSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // total = 52 tokens; cnt(common)=51, cnt(rare)=1
  // rarity(common) = digits(52 DIV 51) = digits(1) = 1
  // rarity(rare)   = digits(52 DIV 1)  = digits(52) = 2
  private val docs = Seq(
    (1L, Seq.fill(50)("common").mkString(" ")),
    (2L, "common rare"),
    (3L, ""))
    .toDF("doc_id", "text")

  test("rarity score: hand-computed digit buckets, empty doc handled") {
    val out = UnigramLM.withRarityScore(docs, "text", "doc_id")
      .select("doc_id", "n_tokens_lm", "rarity_mean", "rarity_max")
      .as[(Long, Int, Double, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((50, 1.0, 1)))
    assert(out(2L) == ((2, 1.5, 2)))
    assert(out(3L) == ((0, 0.0, 0)))
  }

  test("continuous mean log10 prob ranks rare-token docs lower") {
    val out = UnigramLM.withUnigramLogProb(docs, "text", "doc_id")
      .select("doc_id", "mean_log10_prob")
      .as[(Long, Option[Double])].collect().map(r => r._1 -> r._2).toMap
    assert(out(1L).get > out(2L).get)  // all-common doc is more "expected"
    assert(out(2L).get < -0.5)         // the rare token drags the mean down
    assert(out(3L).isEmpty)            // no tokens → null score
  }

  test("vocabCoverage: hand-computed ranks, cumulative mass, exact fixed-point coverage") {
    // tokens: a×5, b×3, c×1, d×1 → total 10; order (cnt desc, token):
    // a(5, cum 5, 5000), b(3, cum 8, 8000), c(1, cum 9, 9000), d(1, cum 10, 10000)
    val d = Seq((1L, "a a a b b c"), (2L, "a a b d")).toDF("doc_id", "text")
    val out = UnigramLM.vocabCoverage(d, "text", topK = 3)
      .select("rank", "token", "cnt", "cum_cnt", "coverage_x10000")
      .as[(Int, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1, "a", 5L, 5L, 5000L), (2, "b", 3L, 8L, 8000L),
      (3, "c", 1L, 9L, 9000L)))
    // layout independence
    val relaid = UnigramLM.vocabCoverage(d.repartition(5), "text", topK = 3)
      .select("rank", "token", "cnt", "cum_cnt", "coverage_x10000")
      .as[(Int, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(relaid == out)
  }

  test("rarity is partition-layout independent") {
    val a = UnigramLM.withRarityScore(docs.repartition(5), "text", "doc_id")
      .select("doc_id", "rarity_mean").as[(Long, Double)].collect().toSet
    val b = UnigramLM.withRarityScore(docs, "text", "doc_id")
      .select("doc_id", "rarity_mean").as[(Long, Double)].collect().toSet
    assert(a == b)
  }

  test("bigram backoff: hand-computed decades across all three levels") {
    // corpus: unigrams x1 y2 z2 q1 (T1=6); bigrams "x y"1 "y z"2 "z q"1 (T2=4)
    val corpus = Seq((1L, "x y z"), (2L, "y z q")).toDF("doc_id", "text")
    val scored = Seq(
      (10L, "x y z"),   // seen bigrams: digits(4/1)=1, digits(4/2)=1 → sum 2
      (11L, "z x"),     // unseen bigram, seen x: 1+digits(6/1)=2
      (12L, "x qq"),    // unseen bigram, unseen qq: 2+digits(6)=3
      (13L, "x"),       // single token → no transitions
      (14L, ""))        // empty
      .toDF("doc_id", "text")
    val out = graft.text.BigramLM.scoreDocs(scored, corpus, "text", "doc_id")
      .select("doc_id", "n_transitions", "bigram_rarity", "bigram_rarity_max")
      .as[(Long, Int, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(10L) == ((2, 2L, 1)))
    assert(out(11L) == ((1, 2L, 2)))
    assert(out(12L) == ((1, 3L, 3)))
    assert(out(13L) == ((0, 0L, 0)))
    assert(out(14L) == ((0, 0L, 0)))
  }

  test("bigram backoff never fires scoring the corpus against itself; layout-independent") {
    val corpus = Seq((1L, "a b c d"), (2L, "b c a")).toDF("doc_id", "text")
    for (reps <- Seq(1, 4)) {
      val out = graft.text.BigramLM.scoreDocs(
          corpus.repartition(reps), corpus, "text", "doc_id")
        .select("doc_id", "bigram_rarity_max").as[(Long, Int)].collect().toMap
      // every transition of the corpus is a seen bigram → level-1 scores
      // only, bounded by digits(T2) (T2 = 5 → max decade 1)
      assert(out.values.forall(_ <= 1), s"reps=$reps: $out")
    }
  }

  test("vocabGrowth: hand-computed slices, saturated vs open vocab, layout-independent") {
    // 10 docs, 2 buckets: first half mints a,b,c; second half only d
    val docs = Seq(
      (1L, "a b"), (2L, "a c"), (3L, "b c"), (4L, "a"), (5L, "c b"),
      (6L, "a d"), (7L, "b d"), (8L, "d"), (9L, "a b"), (10L, "c"))
      .toDF("doc_id", "text")
    val out = UnigramLM.vocabGrowth(docs, "text", "doc_id", buckets = 2)
      .orderBy("corpus_slice")
      .as[(Int, Long, Long)].collect().toSeq
    assert(out == Seq((1, 3L, 3L), (2, 1L, 4L)))
    // layout independent
    val out7 = UnigramLM.vocabGrowth(docs.repartition(7), "text", "doc_id",
        buckets = 2)
      .orderBy("corpus_slice").as[(Int, Long, Long)].collect().toSeq
    assert(out7 == out)
    // fully saturated vocab: everything minted in slice 1, slice 2 absent
    val sat = Seq((1L, "x y"), (2L, "y x"), (3L, "x"), (4L, "y"))
      .toDF("doc_id", "text")
    val satOut = UnigramLM.vocabGrowth(sat, "text", "doc_id", buckets = 2)
      .orderBy("corpus_slice").as[(Int, Long, Long)].collect().toSeq
    assert(satOut == Seq((1, 2L, 2L)))
  }

  test("vocabSpectrum: hand-computed decade rows, layout-independent") {
    // "a" ×12 (decade 2), "b" ×3, "c" ×1, "d" ×1 (decade 1)
    val docs = (Seq.fill(12)("a") ++ Seq.fill(3)("b") ++ Seq("c d"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = graft.text.UnigramLM.vocabSpectrum(docs, "text")
      .select("freq_decade", "n_types", "n_tokens")
      .as[(Int, Long, Long)].collect().toSet
    // decade 1: types b,c,d (3 types, 5 tokens); decade 2: a (1 type, 12)
    assert(out == Set((1, 3L, 5L), (2, 1L, 12L)))
    val again = graft.text.UnigramLM.vocabSpectrum(docs.repartition(5), "text")
      .select("freq_decade", "n_types", "n_tokens")
      .as[(Int, Long, Long)].collect().toSet
    assert(again == out)
  }
}
