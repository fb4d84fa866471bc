package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.text.{Bpe, BpeModel, Packing, TextStats}

/** Pins the BPE tokenizer ([[graft.text.Bpe]]): hand-computed merges on
  * the classic Sennrich toy corpus, layout independence, train
  * determinism, encode round-trip, null semantics, and the
  * well-formedness of [[Bpe.FixedMerges]] that the DuckDB oracle's
  * chained-replace replay relies on (rank-order application ≡ greedy
  * inference — verified here directly against a string-replace replay). */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Sennrich et al. 2016 §3 toy corpus as repeated-word documents. */
  private def toyCorpus = Seq(
    ("low " * 5).trim, ("lower " * 2).trim,
    ("newest " * 6).trim, ("widest " * 3).trim)
    .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("train recovers the hand-computed merge sequence on the toy corpus") {
    val model = Bpe.train(toyCorpus, "text", numMerges = 5)
    // round 1: (e,s),(s,t),(t,</w>) all tie at 9 -> lexicographic picks (e,s);
    // then (es,t) 9, (est,</w>) 9, (l,o)/(o,w) tie at 7 -> (l,o), then (lo,w) 7
    assert(model.merges == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")))
  }

  test("train is layout-independent and rerun-deterministic") {
    val a = Bpe.train(toyCorpus, "text", numMerges = 8)
    val b = Bpe.train(toyCorpus.repartition(7), "text", numMerges = 8)
    val c = Bpe.train(toyCorpus, "text", numMerges = 8)
    assert(a.merges == b.merges)
    assert(a.merges == c.merges)
  }

  test("encodeWord round-trips: tokens concatenate back to word + </w>") {
    val model = Bpe.train(toyCorpus, "text", numMerges = 5)
    assert(model.encodeWord("lowest").toSeq == Seq("low", "est</w>"))
    for (w <- Seq("low", "lower", "newest", "widest", "lowest", "news", "zzz"))
      assert(model.encodeWord(w).mkString == w + "</w>", s"round-trip of $w")
    assert(model.encodeWord("").isEmpty)
  }

  test("countTokens sums per-pre-token encodes; null text -> 0") {
    val model = Bpe.train(toyCorpus, "text", numMerges = 5)
    // "low lowest" -> [low </w>-as-one? no: low -> l o w </w> merged to lo w </w>
    // after (l,o),(lo,w): low</w>? (w,</w>) never learned -> ["low","</w>"] = 2
    assert(model.encodeWord("low").toSeq == Seq("low", "</w>"))
    assert(model.countTokens("low lowest") == 2 + 2)
    assert(model.countTokens(null) == 0)
    assert(model.countTokens("") == 0)
  }

  test("tokenCounts / tokenize null-propagate instead of NPE (one null row)") {
    val df = Seq((1L, "newest newest"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val model = Bpe.train(toyCorpus, "text", numMerges = 5)
    val counts = Bpe.tokenCounts(df, "doc_id", "text", model)
      .orderBy("doc_id").collect()
    // newest -> n e w est</w> = 4 tokens, twice; null row -> 0
    assert(counts.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((1L, 8), (2L, 0)))
    val toks = Bpe.tokenize(df, "doc_id", "text", model)
      .orderBy("doc_id").collect()
    assert(toks(1).getSeq[String](1).isEmpty)
  }

  test("FixedMerges is well-formed for the chained-replace oracle replay") {
    val merges = Bpe.FixedMerges
    assert(merges.length == 50)
    // distinct results: a produced symbol has exactly one producing rule
    val results = merges.map { case (a, b) => a + b }
    assert(results.distinct.length == results.length)
    // every compound constituent is produced by an EARLIER rule -> a later
    // merge can never create a lower-rank pair (the replay equivalence)
    val produced = scala.collection.mutable.Set.empty[String]
    merges.foreach { case (a, b) =>
      for (s <- Seq(a, b) if s.length > 1 && s != BpeModel.EndOfWord)
        assert(produced.contains(s), s"constituent $s not produced earlier")
      produced += a + b
    }
    // the oracle's separator never appears inside any symbol
    assert(merges.forall { case (a, b) => !a.contains("~") && !b.contains("~") })
  }

  test("packing budgets follow REAL BPE counts where the regex proxy diverges") {
    val model = BpeModel(Bpe.FixedMerges)
    // the fixed vocab encodes "customer" as ONE token; the regex proxy
    // ([A-Za-z]{1,4} pieces) says cust+omer = 2 — a real divergence
    assert(model.encodeWord("customer").toSeq == Seq("customer</w>"))
    val df = Seq(
      (1L, "customer customer customer"), // real 3, proxy 6
      (2L, "join scan"),                  // real 2
      (3L, "customer join"))              // real 2
      .toDF("doc_id", "text")
    val proxy = df.select(TextStats.tokenCountBpe(col("text")))
      .as[Int].collect().toSeq
    assert(proxy == Seq(6, 2, 3)) // what the old proxy would have budgeted
    val real = Bpe.tokenCounts(df, "doc_id", "text", model)
      .withColumnRenamed("bpe_tokens", "n_tokens")
    val out = Packing.chunkAssignments(real, "doc_id", "n_tokens", chunkTokens = 4)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "tok_start", "chunk_first", "chunk_last")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // budgets follow the real counts (3,2,2 -> starts 0,3,5), not the proxy
    assert(out.toSeq == Seq(
      (1L, 3, 0L, 0L, 0L),   // tokens 0..2 in chunk 0
      (2L, 2, 3L, 0L, 1L),   // tokens 3..4 straddle chunks 0/1
      (3L, 2, 5L, 1L, 1L)))  // tokens 5..6 in chunk 1
  }

  test("greedy inference == rank-order chained-replace replay (oracle form)") {
    val model = BpeModel(Bpe.FixedMerges)
    def replay(word: String): Int = {
      var s = "~" + word.map(c => s"$c~~").mkString + "</w>~"
      Bpe.FixedMerges.foreach { case (a, b) =>
        s = s.replace(s"~$a~~$b~", s"~$a$b~")
      }
      s.count(_ == '~') / 2
    }
    val words = Seq("customer", "column", "filter", "small", "hash", "join",
      "batch", "scan", "erg", "lower", "newest", "aaa", "ststst", "w",
      "partition", "shuffle", "parquet", "allall", "rowrow", "joinjoin")
    for (w <- words)
      assert(model.encodeWord(w).length == replay(w), s"replay mismatch on $w")
  }
}
