package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.Classifier

/** NB log-count-ratio classifier ([[graft.text.Classifier]]) against an
  * independent JVM replay of train + score (MessageDigest md5 bucketing,
  * plain-Scala micro-logit math). Agreement pins the integer determinism
  * contract the DuckDB oracle hash-compares. */
class ClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // pos = "good" docs; "superb"/"great"/"result"/"work" appear only in
  // pos, "awful"/"mess"/"poor" only in neg, "the" in both. Tokens chosen
  // so every distinct token maps to a DISTINCT md5 bucket at B=32 (checked
  // by hand: the=13 superb=28 great=1 result=16 work=7 awful=14 mess=8
  // poor=17 vocabulary=29 entirely=11) — sign assertions below would be
  // meaningless under bucket collisions. Doc 5 is empty (no tokens),
  // doc 6 is non-latin (tokenizes to nothing).
  private val docs = Seq(
    (1L, "the superb great result", true),
    (2L, "superb work the superb result", true),
    (3L, "the awful mess", false),
    (4L, "awful awful poor", false),
    (5L, "", false),
    (6L, "中文文本", true))
    .toDF("doc_id", "text", "label")
  private val B = 32

  private def toks(text: String): Seq[String] =
    text.trim.toLowerCase.replaceAll("[^a-z0-9áéíóúñü ]", "")
      .split("\\s+").filter(_.nonEmpty).toSeq

  private def bucket(tok: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % B
  }

  /** Replayed (n_pos, n_neg, w_micro) per bucket. */
  private def replay(): Map[Long, (Long, Long, Long)] = {
    val rows = docs.as[(Long, String, Boolean)].collect()
    val pos = rows.filter(_._3).flatMap(r => toks(r._2)).groupBy(bucket)
      .view.mapValues(_.length.toLong).toMap
    val neg = rows.filterNot(_._3).flatMap(r => toks(r._2)).groupBy(bucket)
      .view.mapValues(_.length.toLong).toMap
    val pt = pos.values.sum + B
    val nt = neg.values.sum + B
    (0L until B).map { b =>
      val p = pos.getOrElse(b, 0L); val n = neg.getOrElse(b, 0L)
      val w = math.floor((math.log((p + 1).toDouble / pt) -
        math.log((n + 1).toDouble / nt)) * 1e6 + 0.5).toLong
      b -> ((p, n, w))
    }.toMap
  }

  test("trained weights match the independent replay; pos-only tokens weigh positive, neg-only negative") {
    val got = Classifier.trainNbWeights(docs, "text", "label", B)
      .select("bucket", "n_pos", "n_neg", "w_micro")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == (0L until B).toSet)  // densified: ALL buckets
    assert(got == replay())
    assert(got(bucket("superb"))._3 > 0L)   // pos-only evidence
    assert(got(bucket("awful"))._3 < 0L)    // neg-only evidence
  }

  test("scores are the exact integer w_micro sums; empty/non-latin docs pred=false") {
    val w = Classifier.trainNbWeights(docs, "text", "label", B)
    val got = Classifier.scoreDocs(docs, w, "text", "doc_id", B)
      .select("doc_id", "n_tokens", "logit_micro", "pred")
      .as[(Long, Int, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    val weights = replay()
    docs.as[(Long, String, Boolean)].collect().foreach { case (id, text, _) =>
      val ts = toks(text)
      val logit = ts.map(t => weights(bucket(t))._3).sum
      assert(got(id)._2 == ts.size && got(id)._3 == logit, s"doc $id")
      assert(got(id)._4 == (logit > 0L), s"doc $id pred")
    }
    assert(got(5L)._2 == 0 && got(5L)._3 == 0L && !got(5L)._4)
    assert(got(6L)._2 == 0 && got(6L)._3 == 0L && !got(6L)._4)
  }

  test("calibrationTable: signed magnitude-decade bins, zero bin, exact rates") {
    val scored = Seq(
      (1L, 1234L, true),  // bin 4
      (2L, 999L, false),  // bin 3
      (3L, -50L, true),   // bin -2 (no signed division involved)
      (4L, 0L, false),    // bin 0
      (5L, 1500L, true),  // bin 4
      (6L, -5L, false))   // bin -1
      .toDF("doc_id", "logit_micro", "y")
    val out = Classifier.calibrationTable(scored, "logit_micro", "y")
      .select("bin", "n_docs", "n_true", "true_rate_x10000")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((-2, 1L, 1L, 10000L), (-1, 1L, 0L, 0L),
      (0, 1L, 0L, 0L), (3, 1L, 0L, 0L), (4, 2L, 2L, 10000L)))
  }

  test("a model trained on one split scores an unseen disjoint frame") {
    val train = docs.where(col("doc_id") <= 4)
    val unseen = Seq(
      (10L, "superb superb superb"),        // pure pos evidence
      (11L, "awful awful"),                 // pure neg evidence
      (12L, "vocabulary entirely"))         // all-new tokens
      .toDF("doc_id", "text")
    val w = Classifier.trainNbWeights(train, "text", "label", B)
    val got = Classifier.scoreDocs(unseen, w, "text", "doc_id", B)
      .select("doc_id", "pred", "logit_micro").as[(Long, Boolean, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(10L)._1)          // pos-evidence doc classified positive
    assert(!got(11L)._1)         // neg-evidence doc classified negative
    // unseen tokens fall into smoothed buckets — finite logit, no throw
    assert(math.abs(got(12L)._2) < 20_000_000L)
  }

  test("scores are partition-layout independent") {
    val w = Classifier.trainNbWeights(docs, "text", "label", B)
    val a = Classifier.scoreDocs(docs.repartition(5), w, "text", "doc_id", B)
      .select("doc_id", "logit_micro").as[(Long, Long)].collect().toSet
    val b = Classifier.scoreDocs(docs, w, "text", "doc_id", B)
      .select("doc_id", "logit_micro").as[(Long, Long)].collect().toSet
    assert(a == b)
  }
}
