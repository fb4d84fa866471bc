package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Sketches

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

  test("approxDistinct stays within the declared rsd of the exact count") {
    val approx = Sketches.approxDistinct(events, Seq("event_type"), "user_id", rsd = 0.02)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(3, (n * 0.06).toLong),
        s"$k: approx=${approx(k)} exact=$n")
    }
  }

  test("approxQuantiles bracket the exact quantiles") {
    val out = Sketches.approxQuantiles(events, Nil, "value", Seq(0.1, 0.5, 0.9))
      .select(col("quantiles")(0), col("quantiles")(1), col("quantiles")(2))
      .as[(Double, Double, Double)].first()
    val (lo, hi) = (events.agg(min("value")).as[Double].first(),
      events.agg(max("value")).as[Double].first())
    assert(out._1 <= out._2 && out._2 <= out._3) // monotone
    assert(out._1 >= lo && out._3 <= hi)
    // p50 within the central mass: between p25 and p75 exact
    val n = events.count()
    val sorted = events.select("value").orderBy("value").as[Double].collect()
    assert(out._2 >= sorted((n * 0.25).toInt) && out._2 <= sorted((n * 0.75).toInt))
  }

  test("countMin never underestimates and is near-exact on heavy hitters") {
    val cms = Sketches.countMin(events, "event_type", eps = 0.001, confidence = 0.99)
    val exact = events.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
    exact.foreach { case (k, n) =>
      val est = cms.estimateCount(k)
      assert(est >= n, s"$k underestimated: $est < $n")
      assert(est <= n + (0.001 * events.count()).toLong + 1, s"$k overestimate too large")
    }
  }

  test("bloomPruneJoin returns exactly the plain inner join") {
    val large = events.select($"event_id", $"user_id")
    val small = (1L to 20L).map(i => (i * 7, s"u${i * 7}")).toDF("uid", "tag")
    val plain = large.join(small, large("user_id") === small("uid"))
      .select("event_id", "uid").orderBy("event_id", "uid").collect().toSeq
    val pruned = Sketches.bloomPruneJoin(large, "user_id", small, "uid",
        expectedItems = 20)
      .select("event_id", "uid").orderBy("event_id", "uid").collect().toSeq
    assert(pruned == plain && plain.nonEmpty)
    // native expression, not a Scala UDF, on the filter path
    assert(!Sketches.bloomPruneJoin(large, "user_id", small, "uid", 20)
      .queryExecution.executedPlan.toString.contains("UDF"))
  }

  test("bloomPruneJoin: string keys work; non-integral keys are a type error") {
    val large = Seq((1L, "alice"), (2L, "bob"), (3L, "carol")).toDF("id", "name")
    val small = Seq(("alice", 1), ("zed", 2)).toDF("name2", "x")
    val joined = Sketches.bloomPruneJoin(large, "name", small, "name2", expectedItems = 10)
    assert(joined.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    // a double key must fail analysis, not silently null-filter (round-2 ADVICE)
    val bad = Seq((1.5, "x")).toDF("d", "y")
    intercept[org.apache.spark.sql.AnalysisException] {
      Sketches.bloomPruneJoin(bad, "d", small, "name2", 10).collect()
    }
  }
}
