package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Filters
import graft.text.InvertedIndex

class InvertedIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark shuffle"),
    (2L, "spark join"),
    (3L, "join join join"))
    .toDF("doc_id", "text")

  test("postings: tf, doc-ordered rank, doc_freq") {
    val p = InvertedIndex.postings(docs, "text", "doc_id")
      .select("token", "doc_id", "tf", "posting_rank", "doc_freq")
      .as[(String, Long, Int, Int, Int)].collect().toSet
    assert(p == Set(
      ("spark", 1L, 2, 1, 2), ("spark", 2L, 1, 2, 2),
      ("shuffle", 1L, 1, 1, 1),
      ("join", 2L, 1, 1, 2), ("join", 3L, 3, 2, 2)))
  }

  test("tfidf: digit-bucket idf, hand computation") {
    // nDocs=3; df(spark)=2 → 3 DIV 2 = 1 → bucket 1; df(shuffle)=1 → 3 → 1
    // every bucket is 1 here, so tfidf_sum = token count, max = max tf
    val out = InvertedIndex.withTfIdf(docs, "text", "doc_id")
      .select("doc_id", "tfidf_sum", "tfidf_max")
      .as[(Long, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((3, 2)))
    assert(out(2L) == ((2, 1)))
    assert(out(3L) == ((3, 3)))
  }

  test("tfidf: rare terms outweigh common ones across a wider corpus") {
    val wide = (Seq((100L, "rareterm")) ++
      (1L to 20L).map(i => (i, "common"))).toDF("doc_id", "text")
    // df(common)=20, nDocs=21 → 21 DIV 20 = 1 → bucket 1 → max 1·1 = 1
    // df(rareterm)=1 → 21 DIV 1 = 21 → bucket 2 → max 1·2 = 2
    val out = InvertedIndex.withTfIdf(wide, "text", "doc_id")
      .select("doc_id", "tfidf_max").as[(Long, Int)].collect().toMap
    assert(out(100L) == 2 && out(1L) == 1)
  }

  test("bm25 ranks the query-term-dense doc first, zero for no overlap") {
    val out = InvertedIndex.bm25(docs, "text", "doc_id", Seq("join"))
      .as[(Long, Double)].collect().toMap
    assert(out(3L) > out(2L))      // tf 3 beats tf 1
    assert(out(1L) == 0.0)         // no query term
  }

  test("bm25Fixed: hand-computed integer scores, ranking agrees with float bm25") {
    // corpus: nDocs=3, dl = (3,2,3), total=8, avgdl = 8 DIV 3 = 2
    // query 'join': df=2 → idfb = digits(3 DIV 2) = 1
    // doc 3 (tf=3, dl=3): norm_x100 = 25 + (75*3) DIV 2 = 137
    //   den_x1000 = 3000 + 12*137 = 4644
    //   score = (1*3*22*100000) DIV 4644 = 6600000 DIV 4644 = 1421
    // doc 2 (tf=1, dl=2): norm_x100 = 25 + 75 = 100; den = 1000+1200 = 2200
    //   score = 2200000 DIV 2200 = 1000
    val out = InvertedIndex.bm25Fixed(docs, "text", "doc_id", Seq("join"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 1000L, 3L -> 1421L))
    // rank order matches the continuous-float sibling on the same query
    val f = InvertedIndex.bm25(docs, "text", "doc_id", Seq("join"))
      .as[(Long, Double)].collect().toMap
    assert((f(3L) > f(2L)) == (out(3L) > out(2L)))
  }

  test("topFractionByGroup keeps exact per-group top fraction with ties") {
    val rows = Seq(
      ("a", 1L, 10), ("a", 2L, 10), ("a", 3L, 5), ("a", 4L, 1),
      ("b", 5L, 7),
      ("c", 6L, 2), ("c", 7L, 9))
      .toDF("source", "id", "score")
    val kept = Filters.topFractionByGroup(rows, "source", "score", 0.5, "id")
      .select("id").as[Long].collect().toSet
    // a: ceil(0.5*4)=2 → ids 1,2 (tie broken by id); b: ceil(0.5)=1 → 5;
    // c: ceil(0.5*2)=1 → 7
    assert(kept == Set(1L, 2L, 5L, 7L))
  }

  test("topFractionByGroupExact ≡ window form on random integer scores (all fractions, layouts)") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 400L).map { i =>
      (s"src${rnd.nextInt(4)}", i, rnd.nextInt(12).toLong) // dense score ties
    }.toDF("source", "id", "score")
    for (frac <- Seq(0.1, 0.5, 0.999, 1.0); reps <- Seq(1, 7)) {
      val windowForm = Filters.topFractionByGroup(
          rows, "source", "score", frac, "id")
        .select("id").as[Long].collect().toSet
      val exactForm = Filters.topFractionByGroupExact(
          rows.repartition(reps), "source", "score", frac, "id")
        .select("id").as[Long].collect().toSet
      assert(exactForm == windowForm, s"frac=$frac reps=$reps")
    }
  }

  test("rankBucketsExact ≡ ntile rankBuckets on random integer scores (buckets, layouts)") {
    val rnd = new scala.util.Random(23)
    val rows = (1L to 300L).map { i =>
      (s"g${rnd.nextInt(3)}", i, rnd.nextInt(9).toLong) // dense ties straddle tiles
    }.toDF("source", "id", "score")
    for (b <- Seq(1, 3, 4, 10); reps <- Seq(1, 6)) {
      val viaNtile = Filters.rankBuckets(rows, "source", "score", b, "id")
        .select("id", "bucket").as[(Long, Int)].collect().toMap
      val viaHist = Filters.rankBucketsExact(
          rows.repartition(reps), "source", "score", b, "id")
        .select("id", "bucket").as[(Long, Int)].collect().toMap
      assert(viaHist == viaNtile, s"buckets=$b reps=$reps")
    }
  }

  test("topFractionByGroupExact degenerate cases: all-tied group, singleton group") {
    val rows = Seq(
      ("a", 1L, 5L), ("a", 2L, 5L), ("a", 3L, 5L), ("a", 4L, 5L), // all tie
      ("b", 9L, 1L))
      .toDF("source", "id", "score")
    val kept = Filters.topFractionByGroupExact(rows, "source", "score", 0.5, "id")
      .select("id").as[Long].collect().toSet
    // a: k=2, everything ties at T=5 → two smallest ids; b: k=1 → kept
    assert(kept == Set(1L, 2L, 9L))
  }
}
