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

  test("cmsCells/cmsEstimate: never underestimates, exact when wide, merge = rebuild") {
    val items = Seq.tabulate(500)(i => "k" + (i % 37)).toDF("item")
    val truth = items.groupBy("item").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val probes = truth.keys.toSeq.toDF("item")
    // narrow sketch (16 buckets): estimates are upper bounds
    val narrow = Sketches.cmsEstimate(
      Sketches.cmsCells(items, "item", depth = 4, hexChars = 1),
      probes, "item", depth = 4, hexChars = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, n) => assert(narrow(k) >= n, s"undercount on $k") }
    // wide sketch (16^6 buckets, 37 keys): collision-free → exact
    val wide = Sketches.cmsEstimate(
      Sketches.cmsCells(items, "item", depth = 4, hexChars = 6),
      probes, "item", depth = 4, hexChars = 6)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wide == truth)
    // mergeability: summing cell counts of two increments == one-shot cells
    val half = Seq.tabulate(250)(i => "k" + (i % 37)).toDF("item")
    val merged = Sketches.cmsCells(half, "item")
      .unionByName(Sketches.cmsCells(items, "item"))
      .groupBy("d", "bucket").agg(sum("cnt").as("cnt"))
    val est2 = Sketches.cmsEstimate(merged, probes, "item")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = Sketches.cmsEstimate(
      Sketches.cmsCells(half.unionByName(items), "item"), probes, "item")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est2 == oneShot)
    // null items are excluded symmetrically (a null cell could never be
    // probed back — it would surface as an undercount)
    val withNulls = Seq(Some("k1"), None, Some("k1"), None).toDF("item")
    val nullCells = Sketches.cmsCells(withNulls, "item")
    assert(nullCells.where(col("bucket").isNull).count() == 0)
    val nullEst = Sketches.cmsEstimate(nullCells,
      Seq(Some("k1"), None).toDF("item"), "item")
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(nullEst == Map(Some("k1") -> 2L))
  }

  test("HLL sketches: union-of-parts equals sketch-of-whole, estimate near exact") {
    val df = (1L to 5000L).map(i => (s"g${i % 2}", (i % 7).toInt, i % 700))
      .toDF("g", "bucket", "v")
    // incremental: per-bucket sketches unioned afterwards
    val daily = Sketches.hllDailySketches(df, Seq("g"), "bucket", "v")
    assert(daily.count() == 14) // 2 groups x 7 buckets of ~KB sketches
    val viaUnion = Sketches.hllUnionEstimate(daily, Seq("g"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // single-shot: one sketch over everything (bucketless)
    val direct = Sketches.hllUnionEstimate(
        Sketches.hllDailySketches(df.withColumn("one", lit(1)), Seq("g"), "one", "v"),
        Seq("g"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaUnion == direct) // mergeability: register max is associative
    // g splits on i%2 and v on i%700, so each group sees 350 distinct values
    val exact = df.groupBy("g").agg(countDistinct($"v").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(viaUnion(g) - n.toDouble) / n < 0.05, s"$g: ${viaUnion(g)} vs $n")
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

  test("topKApprox exact regime: below capacity it IS the exact ranking, err 0") {
    val df = (Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c"))
      .map(("g", _)).toDF("g", "item")
    val out = Sketches.topKApprox(df, Seq("g"), "item", k = 2, capacity = 16)
      .select("rank", "item", "cnt", "err")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0, "a", 30L, 0L), (1, "b", 20L, 0L)))
  }

  test("topKApprox guarantees under eviction: bounds hold, heavy hitter found, layout-independent") {
    // 4 heavy items (>n/capacity each) in a sea of 2000 singletons
    val heavy = Seq("h1" -> 500, "h2" -> 400, "h3" -> 300, "h4" -> 200)
    val rows = heavy.flatMap { case (it, n) => Seq.fill(n)(it) } ++
      (1 to 2000).map(i => s"noise$i")
    val truth = heavy.toMap
    for (parts <- Seq(1, 13)) {
      val df = rows.map(("g", _)).toDF("g", "item").repartition(parts)
      val out = Sketches.topKApprox(df, Seq("g"), "item", k = 8, capacity = 64)
        .select("rank", "item", "cnt", "err")
        .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      val found = out.map(_._1).toSet
      // any item with true count > total/capacity (= 3400/64 ~ 53) must be present
      assert(Set("h1", "h2", "h3", "h4").subsetOf(found), s"parts=$parts found=$found")
      // estimate bounds: cnt-err <= true <= cnt for every emitted item
      out.foreach { case (item, cnt, err) =>
        val t = truth.getOrElse(item, 1)
        assert(cnt >= t && cnt - err <= t, s"parts=$parts $item cnt=$cnt err=$err true=$t")
      }
      // the heavy ranking is recovered in order
      assert(out.take(4).map(_._1).toSeq == Seq("h1", "h2", "h3", "h4"))
    }
  }

  test("CmsBuckets kernel ≡ the portable Column md5 hex-prefix chain") {
    // cmsCells (kernel) and cmsEstimate's probe side (Column form) must
    // hash identically or every estimate silently breaks its lower bound.
    graft.functions.GraftFunctions.register(spark)
    val items = Seq("a", "xyz", "0123", "ümlaut", "").toDF("item")
    for ((depth, hex) <- Seq((4, 2), (3, 6))) {
      val rows = items.select(col("item"),
        expr(s"graft_cms_buckets(item, $depth, $hex)").as("native"),
        array((0 until depth).map(d => substring(
          md5(concat(lit(d.toString), lit("|"), col("item"))),
          1, hex)): _*).as("column")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"item=${r.getString(0)} depth=$depth hex=$hex")
      }
    }
  }

  test("cms plan: partial cell aggregation before the exchange, broadcast probe") {
    val items = Seq.tabulate(200)(i => "k" + (i % 11)).toDF("item")
    val cells = Sketches.cmsCells(items, "item")
    cells.collect()
    // map-side combine collapses each partition to ≤ depth·width cells
    // BEFORE the shuffle — the whole CMS scale contract
    val cellPlan = cells.queryExecution.executedPlan.toString
    assert(cellPlan.contains("partial_count") || cellPlan.toLowerCase.contains("partial"), cellPlan)
    val est = Sketches.cmsEstimate(cells, Seq("k1", "k2").toDF("item"), "item")
    est.collect()
    // the cell table rides a broadcast: probing adds no cell-side shuffle
    assert(est.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      est.queryExecution.executedPlan.toString)
  }

  test("topKApprox plan: partial SpaceSaving aggregation before the exchange") {
    val df = (1 to 100).map(i => ("g", s"i${i % 7}")).toDF("g", "item")
    val out = Sketches.topKApprox(df, Seq("g"), "item", k = 3, capacity = 8)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // ObjectHashAggregate partial_graft_topk below the shuffle = map-side combine
    assert(plan.contains("partial_graft_topk") || plan.contains("partial graft_topk")
      || plan.toLowerCase.contains("partial"), plan)
  }
}
