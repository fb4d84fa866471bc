package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.Repetition

class RepetitionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Hand-computed fixtures (see per-doc comments).
  private val docs = Seq(
    (1L, "ab ab ab cd"),             // 3×ab + cd
    (2L, "x y x y x y"),             // fully alternating
    (3L, "unique words only here"),  // no repetition
    (4L, "th"))                      // too short for any 2/3-gram
    .toDF("doc_id", "text")

  private def metrics(): Map[Long, (Double, Double, Double, Double)] = {
    val seg = Repetition.withSegmentRepetition(docs, "text", delim = "\\s+",
      prefix = "word")
    Repetition.withNgramRepetition(seg, "text", "doc_id", topN = 2, dupN = 3)
      .select("doc_id", "dup_word_frac", "dup_word_char_frac",
        "top_2gram_char_frac", "dup_3gram_char_frac")
      .as[(Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("scrubAdjacentRepeats: runs collapse, alternations survive, edge shapes") {
    val d = Seq(
      (1L, "the the the quick fox fox jumps"), // two runs
      (2L, "x y x y x y"),                     // alternation — nothing removed
      (3L, "a"),                               // single token
      (4L, ""),                                // empty text
      (5L, "go  go   go"))                     // runs across multi-space gaps
      .toDF("doc_id", "text")
    val out = Repetition.scrubAdjacentRepeats(d, "text", "doc_id")
      .select("doc_id", "text_scrubbed", "n_removed")
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "the quick fox jumps", 3),
      (2L, "x y x y x y", 0),
      (3L, "a", 0),
      (4L, "", 0),
      (5L, "go", 2)))
  }

  test("native scrub kernel ≡ composed-HOF form (unicode, ws variants, null)") {
    val rng = new scala.util.Random(42)
    val toks = Vector("the", "fox", "日本語", "naïve", "x", "", "a-b", "ß")
    val ws = Vector(" ", "  ", "\t", "\n", " \r\n ", "", "\f")
    val rand = (0 until 200).map { i =>
      val n = rng.nextInt(12)
      val s = (0 until n).map(_ => toks(rng.nextInt(toks.size)) +
        ws(rng.nextInt(ws.size))).mkString
      (i.toLong, if (rng.nextInt(20) == 0) null else s)
    }
    val edge = Seq((900L, ""), (901L, "   "), (902L, "a a a"),
      (903L, "日本語 日本語 ok"), (904L, "\ta\ta\n\na"))
    val d = (rand ++ edge).toDF("doc_id", "text")
    def run(f: (org.apache.spark.sql.DataFrame, String, String) => org.apache.spark.sql.DataFrame) =
      f(d, "text", "doc_id").select("doc_id", "text_scrubbed", "n_removed")
        .collect().map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getInt(2)))).toSet
    assert(run(Repetition.scrubAdjacentRepeats) ==
      run(Repetition.scrubAdjacentRepeatsHof))
  }

  test("RepetitionStats kernel ≡ the tagged-explode shuffle reference on real sf0.001 docs") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    def run(fn: (org.apache.spark.sql.DataFrame, String, String, Int, Int) => org.apache.spark.sql.DataFrame) =
      fn(real, "text", "doc_id", 2, 3)
        .select("doc_id", "top_2gram_char_frac", "dup_3gram_char_frac")
        .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
    val kernel = run(Repetition.withNgramRepetition)
    val shuffle = run(Repetition.withNgramRepetitionShuffle)
    assert(kernel == shuffle)
    assert(kernel.nonEmpty && kernel.exists(_._2 > 0))
  }

  test("duplicate-word fractions match hand computation") {
    val m = metrics()
    // doc 1: words [ab,ab,ab,cd] → (4-2)/4 = 0.5; chars (8-4)/8 = 0.5
    assert(m(1L)._1 == 0.5 && m(1L)._2 == 0.5)
    // doc 2: [x,y]×3 → (6-2)/6 = 0.6667; chars (6-2)/6 = 0.6667
    assert(m(2L)._1 == 0.6667 && m(2L)._2 == 0.6667)
    // docs 3, 4: no repeats
    assert(m(3L)._1 == 0.0 && m(3L)._2 == 0.0)
    assert(m(4L)._1 == 0.0 && m(4L)._2 == 0.0)
  }

  test("top-2gram coverage fraction is max(count × len) / doc chars") {
    val m = metrics()
    // doc 1: "ab ab"×2 covers 10 of 11 chars → 0.9091
    assert(m(1L)._3 == 0.9091)
    // doc 2: "x y"×3 covers 9 of 11 → 0.8182
    assert(m(2L)._3 == 0.8182)
    // doc 3: best gram "unique words" (12 of 22) → 0.5455
    assert(m(3L)._3 == 0.5455)
    // doc 4: no 2-grams → 0.0
    assert(m(4L)._3 == 0.0)
  }

  test("dup-3gram char fraction counts only grams occurring more than once") {
    val m = metrics()
    assert(m(1L)._4 == 0.0)   // "ab ab ab", "ab ab cd" unique
    assert(m(2L)._4 == 1.0)   // "x y x"×2 and "y x y"×2 — all duplicated
    assert(m(3L)._4 == 0.0)
    assert(m(4L)._4 == 0.0)
  }

  private val corpus = Seq(
    (1L, "header alpha body one footer"),
    (2L, "header beta body two footer"),
    (3L, "header gamma body three footer"),
    (4L, "delta epsilon zeta"))
    .toDF("doc_id", "text")

  test("boilerplate words (>=75% doc frequency) are stripped, order kept") {
    // header/body/footer appear in 3/4 docs = 0.75
    val out = graft.text.Repetition.removeBoilerplate(
        corpus, "text", "doc_id", delim = "\\s+", minDocFrac = 0.75)
      .select("doc_id", "text_clean", "n_removed")
      .as[(Long, String, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == (("alpha one", 3)))
    assert(out(2L) == (("beta two", 3)))
    assert(out(4L) == (("delta epsilon zeta", 0)))
  }

  test("broadcast and anti-join boilerplate forms agree (incl. empty docs)") {
    val all = Seq((1L, "x x x"), (2L, "x y"), (3L, "x")).toDF("doc_id", "text")
    val a = graft.text.Repetition.removeBoilerplate(
        all, "text", "doc_id", "\\s+", minDocFrac = 0.9)
      .select("doc_id", "text_clean", "n_removed")
      .as[(Long, String, Int)].collect().toSet
    val b = graft.text.Repetition.removeBoilerplateViaJoin(
        all, "text", "doc_id", "\\s+", minDocFrac = 0.9)
      .select("doc_id", "text_clean", "n_removed")
      .as[(Long, String, Int)].collect().toSet
    assert(a == b)
    assert(a.contains((3L, "", 1))) // doc fully consumed by boilerplate
    // multiplicity preserved: doc 1 loses all three x occurrences
    assert(a.contains((1L, "", 3)))
  }

  test("metrics are partition-layout independent") {
    val seg = Repetition.withSegmentRepetition(docs.repartition(7), "text",
      delim = "\\s+", prefix = "word")
    val out = Repetition.withNgramRepetition(seg, "text", "doc_id")
      .select("doc_id", "dup_word_frac", "top_2gram_char_frac",
        "dup_3gram_char_frac")
      .as[(Long, Double, Double, Double)].collect().toSet
    val m = metrics()
    assert(out == m.map { case (id, (a, _, c, d)) => (id, a, c, d) }.toSet)
  }
}
