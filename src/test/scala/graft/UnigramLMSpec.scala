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

  test("rarity is partition-layout independent") {
    val a = UnigramLM.withRarityScore(docs.repartition(5), "text", "doc_id")
      .select("doc_id", "rarity_mean").as[(Long, Double)].collect().toSet
    val b = UnigramLM.withRarityScore(docs, "text", "doc_id")
      .select("doc_id", "rarity_mean").as[(Long, Double)].collect().toSet
    assert(a == b)
  }
}
