package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.features.Features
import graft.ops.{Filters, Scale}

class FeaturesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("minMaxScale: endpoints hit 0/1, constant column scales to null") {
    val df = Seq((1L, 10.0, 5.0), (2L, 20.0, 5.0), (3L, 30.0, 5.0))
      .toDF("id", "x", "c")
    val out = Features.minMaxScale(df, Seq("x", "c"))
      .select("id", "x_scaled", "c_scaled")
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out(1L) == ((Some(0.0), None)))
    assert(out(2L) == ((Some(0.5), None)))
    assert(out(3L) == ((Some(1.0), None)))
  }

  test("zScore: grouped standardization has mean ~0 / sd ~1 per group; tiny groups null") {
    val df = ((1 to 100).map(i => ("a", i.toLong, i.toDouble)) :+
      ("b", 999L, 7.0)).toDF("g", "id", "x")
    val out = Features.zScore(df, Seq("x"), groupCols = Seq("g"))
    val a = out.where($"g" === "a").agg(
      avg($"x_z"), stddev($"x_z"), count(when($"x_z".isNull, 1))).head()
    assert(math.abs(a.getDouble(0)) < 1e-12)
    assert(math.abs(a.getDouble(1) - 1.0) < 1e-12)
    assert(a.getLong(2) == 0)
    // group b has n=1 -> null
    assert(out.where($"g" === "b").head().getAs[Any]("x_z") == null)
  }

  test("targetMeanEncode: smoothing pulls small categories to the global mean") {
    // cat a: 100 rows target 10; cat b: 1 row target 0; global mean ~ 9.90
    val df = ((1 to 100).map(_ => ("a", 10.0)) :+ ("b", 0.0)).toDF("cat", "y")
    val enc = Features.targetMeanEncode(df, "cat", "y", smoothing = 16.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val gmean = 1000.0 / 101.0
    assert(math.abs(enc("a") - (1000.0 + 16 * gmean) / 116.0) < 1e-12)
    assert(math.abs(enc("b") - (0.0 + 16 * gmean) / 17.0) < 1e-12)
    // unsmoothed would be 0.0 for b; smoothing moved it most of the way to gmean
    assert(enc("b") > 0.9 * gmean * 16 / 17)
  }

  test("woeTable: hand-computed woe/iv on a 2x2 design; one-class category null") {
    // cat a: 30 good, 10 bad; cat b: 10 good, 30 bad; cat c: 5 good, 0 bad
    val rows =
      Seq.fill(30)(("a", false)) ++ Seq.fill(10)(("a", true)) ++
      Seq.fill(10)(("b", false)) ++ Seq.fill(30)(("b", true)) ++
      Seq.fill(5)(("c", false))
    val out = Features.woeTable(rows.toDF("cat", "label"), "cat", "label")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(5)), Option(r.get(6)))).toMap
    val (tg, tb) = (45.0, 40.0)
    def woe(g: Int, b: Int) = math.floor(math.log((b / tb) / (g / tg)) * 1e6 + 0.5) / 1e6
    assert(out("a") == ((30L, 10L, Some(woe(30, 10)), out("a")._4)))
    assert(out("b")._3 == Some(woe(10, 30)))
    assert(out("c")._3 == None) // zero bads -> undefined woe
    // iv terms positive for discriminating categories
    assert(out("a")._4.get.asInstanceOf[Double] > 0)
    assert(out("b")._4.get.asInstanceOf[Double] > 0)
  }

  test("psiFixedBins: identical distributions give PSI 0; shifted gives PSI > 0.25") {
    val base = (1 to 1000).map(i => (i % 100).toDouble).toDF("v")
    val same = Features.psiFixedBins(base, base, "v", lo = 0, width = 10, nBins = 10)
    assert(same.agg(sum($"psi_term")).head().getDouble(0) == 0.0)
    val shifted = (1 to 1000).map(i => (i % 100) / 2.0 ).toDF("v") // squashed left
    val drift = Features.psiFixedBins(base, shifted, "v", lo = 0, width = 10, nBins = 10)
    assert(drift.agg(sum($"psi_term")).head().getDouble(0) > 0.25)
    // clamping: values far outside the range land in edge bins, not dropped
    val outside = Seq(-50.0, 5000.0).toDF("v")
    val edge = Features.psiFixedBins(outside, outside, "v", 0, 10, 10)
      .select("bin").as[Long].collect().sorted
    assert(edge.sameElements(Array(0L, 9L)))
  }

  test("imputeGroupMean: nulls take group mean of non-nulls; all-null group stays null") {
    val df = Seq(
      ("a", 1L, Some(10.0)), ("a", 2L, None), ("a", 3L, Some(20.0)),
      ("b", 4L, None), ("b", 5L, None)
    ).toDF("g", "id", "v")
    val out = Features.imputeGroupMean(df, Seq("v"), Seq("g"))
      .collect().map(r => r.getLong(1) -> Option(r.get(2))).toMap
    assert(out(1L) == Some(10.0) && out(3L) == Some(20.0))
    assert(out(2L) == Some(15.0))            // (10+20)/2
    assert(out(4L) == None && out(5L) == None)
  }

  test("aucByGroup: perfect separation 1.0, inverted 0.0, all-ties 0.5, hand-computed ties") {
    val perfect = Seq(("g", 1.0, false), ("g", 2.0, false), ("g", 3.0, true), ("g", 4.0, true))
    val inverted = perfect.map { case (g, s, y) => ("inv", s, !y) }
    val allTies = Seq(("t", 5.0, true), ("t", 5.0, false), ("t", 5.0, true), ("t", 5.0, false))
    // hand case: scores 1(neg) 2(pos) 2(neg) 3(pos): ranks avg: 1, 2.5, 2.5, 4
    // U = (2.5+4) - 2*3/2 = 3.5 -> AUC = 3.5/(2*2) = 0.875
    val hand = Seq(("h", 1.0, false), ("h", 2.0, true), ("h", 2.0, false), ("h", 3.0, true))
    val df = (perfect ++ inverted ++ allTies ++ hand).toDF("g", "score", "y")
    val out = Features.aucByGroup(df, "score", "y", Seq("g"))
      .collect().map(r => r.getString(0) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out("g") == Some(1.0))
    assert(out("inv") == Some(0.0))
    assert(out("t") == Some(0.5))
    assert(out("h") == Some(0.875))
    // degenerate one-class group -> null
    val deg = Features.aucByGroup(Seq(("d", 1.0, true)).toDF("g", "score", "y"),
      "score", "y", Seq("g")).collect()
    assert(Option(deg.head.get(3)) == None)
  }

  test("oneHot: listed values get 0/1 columns, unknown and null encode all-zeros") {
    val df = Seq((1L, "A-X"), (2L, "B y"), (3L, "junk"), (4L, null))
      .toDF("id", "cat")
    val out = Features.oneHot(df, "cat", Seq("A-X", "B y"))
    assert(out.columns.toSeq == Seq("id", "cat", "oh_a_x", "oh_b_y"))
    val rows = out.collect().map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(3)))).toMap
    assert(rows(1L) == ((1, 0)) && rows(2L) == ((0, 1)))
    assert(rows(3L) == ((0, 0)) && rows(4L) == ((0, 0)))
  }

  test("meanVectorLong: exact per-dim centroid means via integer quantization") {
    val df = Seq(
      (0, Seq(1.0f, 2.0f)), (0, Seq(3.0f, 4.0f)), (1, Seq(-1.0f, 0.5f))
    ).toDF("label", "embedding")
    val out = graft.sim.Similarity.meanVectorLong(df, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out((0, 0)) == ((4000000L, 2L, 2.0)))
    assert(out((0, 1)) == ((6000000L, 2L, 3.0)))
    assert(out((1, 0)) == ((-1000000L, 1L, -1.0)))
    assert(out((1, 1)) == ((500000L, 1L, 0.5)))
  }

  test("rankNormalize: 0..1 rank-uniform per group, deterministic ties, singleton 0") {
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 30.0),
      ("b", 5L, 99.0)).toDF("g", "id", "x")
    val out = Features.rankNormalize(df, "x", Seq("g"), "id")
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(out(1L) == 0.0)            // lowest
    assert(out(3L) == 1.0 / 3.0)      // second of four
    assert(out(2L) == 2.0 / 3.0)      // tie on 30.0 broken by id: 2 before 4
    assert(out(4L) == 1.0)
    assert(out(5L) == 0.0)            // singleton group
  }

  test("rfmScores: scores match window ntile; hand-checked best/worst cells") {
    import org.apache.spark.sql.expressions.Window
    // 7 customers, 1-3 orders each, distinct recency/frequency/spend
    val orders = Seq(
      (1L, "2024-01-10", 100.0), (1L, "2024-01-20", 50.0), (1L, "2024-02-01", 25.0),
      (2L, "2024-01-05", 500.0), (2L, "2024-01-25", 10.0),
      (3L, "2023-12-01", 80.0),
      (4L, "2024-01-30", 300.0), (4L, "2023-11-11", 5.0),
      (5L, "2023-10-01", 40.0),
      (6L, "2024-02-02", 900.0),
      (7L, "2023-09-15", 1.0)
    ).toDF("cust", "dt", "amt").withColumn("dt", col("dt").cast("timestamp"))
    val got = Features.rfmScores(orders, "cust", "dt", "amt", "2024-03-01", nBuckets = 3)
    // differential: arithmetic buckets must equal window ntile on each axis
    val per = orders.groupBy(col("cust").as("customer")).agg(
      datediff(lit("2024-03-01").cast("date"), max(col("dt"))).cast("long").as("rd"),
      count(lit(1)).as("fq"),
      sum(col("amt").cast("decimal(18,2)")).as("mon"))
    val exp = per.select(col("customer"),
      ntile(3).over(Window.orderBy(col("rd"), col("customer"))).as("r_score"),
      ntile(3).over(Window.orderBy(col("fq").desc, col("customer"))).as("f_score"),
      ntile(3).over(Window.orderBy(col("mon").desc, col("customer"))).as("m_score"))
      .as[(Long, Int, Int, Int)].collect()
      .map { case (k, r, f, m) => k -> ((r, f, m)) }.toMap
    val gotMap = got.select("customer", "r_score", "f_score", "m_score")
      .as[(Long, Int, Int, Int)].collect().map { case (k, r, f, m) => k -> ((r, f, m)) }.toMap
    assert(gotMap == exp)
    // customer 6: most recent, highest spend -> r=1, m=1
    assert(gotMap(6L)._1 == 1 && gotMap(6L)._3 == 1)
    // customer 7: stalest, cheapest, single order -> all worst bucket
    assert(gotMap(7L) == ((3, 3, 3)))
    val cells = got.select("customer", "rfm_cell").as[(Long, Int)].collect().toMap
    assert(cells(7L) == 333)
  }

  test("ksStatistic: hand-computed gap, identical samples, disjoint samples") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)).toDF("g", "x")
    val got = Features.ksStatistic(df, "x", "g", "a", "b")
      .as[(Long, Long, Long)].collect().head
    assert(got == ((2L, 2L, 500000L))) // max gap at v=1: |F_a-F_b| = 1/2
    val same = Seq(("a", 1.0), ("a", 5.0), ("b", 1.0), ("b", 5.0)).toDF("g", "x")
    assert(Features.ksStatistic(same, "x", "g", "a", "b")
      .as[(Long, Long, Long)].collect().head._3 == 0L)
    val disj = Seq(("a", 1.0), ("b", 9.0)).toDF("g", "x")
    assert(Features.ksStatistic(disj, "x", "g", "a", "b")
      .as[(Long, Long, Long)].collect().head._3 == 1000000L)
  }

  test("mannWhitney: hand U with and without ties, degenerate all-tied") {
    // disjoint: every b above every a -> U_a = 0
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)).toDF("g", "x")
    val got = Features.mannWhitney(df, "x", "g", "a", "b")
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert((got._1, got._2, got._3) == ((2L, 2L, 0L)))
    val z0 = (0.0 - 2.0 * 2.0) /
      (2.0 * math.sqrt((2.0 * 2.0 / 12.0) * ((4.0 + 1.0) - 0.0)))
    assert(math.abs(got._4.get - z0) < 1e-12)
    // one tie pair counts half: a={1,2} b={2,3} -> 2U_a = 1
    val tied = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)).toDF("g", "x")
    val gt = Features.mannWhitney(tied, "x", "g", "a", "b")
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert((gt._1, gt._2, gt._3) == ((2L, 2L, 1L)))
    val zt = (1.0 - 4.0) /
      (2.0 * math.sqrt((4.0 / 12.0) * (5.0 - 6.0 / (4.0 * 3.0))))
    assert(math.abs(gt._4.get - zt) < 1e-12)
    // every observation tied: zero variance -> null z, U still half-credit
    val allTied = Seq(("a", 5.0), ("b", 5.0), ("b", 5.0)).toDF("g", "x")
    val ga = Features.mannWhitney(allTied, "x", "g", "a", "b")
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(ga == ((1L, 2L, 2L, None)))
  }

  test("mannWhitney is layout-independent and antisymmetric") {
    val df = (1 to 400).map(i =>
      (if (i % 2 == 0) "a" else "b", (i * 37 % 101).toDouble)).toDF("g", "x")
    val ab = Features.mannWhitney(df, "x", "g", "a", "b")
      .as[(Long, Long, Long, Option[Double])].collect().head
    val re = Features.mannWhitney(df.repartition(13), "x", "g", "a", "b")
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(ab == re)
    val ba = Features.mannWhitney(df, "x", "g", "b", "a")
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(ab._3 + ba._3 == 2L * ab._1 * ab._2) // U_a + U_b = n_a·n_b
  }

  test("ksStatistic is layout-independent (range-partition topology)") {
    val df = (1 to 500).map(i =>
      (if (i % 2 == 0) "a" else "b", (i * 37 % 101).toDouble)).toDF("g", "x")
    val base = Features.ksStatistic(df, "x", "g", "a", "b")
      .as[(Long, Long, Long)].collect().head
    val re = Features.ksStatistic(df.repartition(13), "x", "g", "a", "b")
      .as[(Long, Long, Long)].collect().head
    assert(base == re)
  }

  test("classificationReport: hand confusion cells, degenerate groups") {
    val df = Seq(
      ("g1", 0.9, 1), ("g1", 0.8, 0), ("g1", 0.2, 1), ("g1", 0.1, 0),
      ("g2", 0.9, 1), ("g2", 0.8, 1),
      ("g3", 0.1, 1)
    ).toDF("g", "score", "y")
    val got = Features.classificationReport(df, "score", "y", 0.5, Seq("g"))
      .orderBy("g")
      .as[(String, Long, Long, Long, Long, Option[Long], Option[Long],
        Option[Long], Long)].collect().toSeq
    assert(got(0) == (("g1", 1L, 1L, 1L, 1L, Some(500000L), Some(500000L),
      Some(500000L), 500000L)))
    assert(got(1) == (("g2", 2L, 0L, 0L, 0L, Some(1000000L), Some(1000000L),
      Some(1000000L), 1000000L)))
    // no predicted positives: precision undefined, recall/f1/accuracy 0
    assert(got(2) == (("g3", 0L, 0L, 1L, 0L, None, Some(0L), Some(0L), 0L)))
  }

  test("liftTable: perfect score ranks positives first, cum_lift decays to 1") {
    // 100 rows, top-20 scores are the positives -> deciles 1-2 pure positive
    val df = (1 to 100).map(i => (i.toLong, (100 - i).toDouble, i <= 20))
      .toDF("id", "score", "y")
    val out = Features.liftTable(df, "score", "y", nBuckets = 10, tieCol = "id")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(1) == ((10L, 10L, 1.0, 5.0)))   // base rate 0.2 -> lift 5x
    assert(out(2)._2 == 10L && out(2)._4 == 5.0)
    assert(out(3)._2 == 0L)
    assert(out(10)._4 == 1.0)                  // full population = base rate
  }

  test("liftTable buckets are exact ntile arithmetic on non-divisible n") {
    import org.apache.spark.sql.expressions.Window
    // 103 rows / 10 buckets: first 3 buckets get 11 rows, rest 10 —
    // must match window-ntile bit-for-bit (the oracle encodes real ntile)
    val df = (1 to 103).map(i => (i.toLong, ((i * 37) % 103).toDouble, i % 3 == 0))
      .toDF("id", "score", "y")
    val out = Features.liftTable(df, "score", "y", nBuckets = 10, tieCol = "id")
      .select("bucket", "n", "n_pos").orderBy("bucket")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val ref = df.select(
        ntile(10).over(Window.orderBy($"score".desc, $"id")).as("bucket"), $"y")
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), count(when($"y", 1)).as("n_pos"))
      .orderBy("bucket")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == ref)
    assert(out.map(_._2) == Seq(11L, 11L, 11L, 10L, 10L, 10L, 10L, 10L, 10L, 10L))
  }

  test("liftTable ranks map-only after the range exchange: no row_number window, layout-independent") {
    // round-4 verdict: the first exact-rank form re-shuffled every row via
    // Window.partitionBy(__part) + row_number. The local rank now comes off
    // monotonically_increasing_id's low bits in post-sort stream order, so
    // the executed plan must contain NO row_number window at all; and the
    // result must not depend on the input layout.
    val df = (1 to 103).map(i => (i.toLong, ((i * 41) % 103).toDouble, i % 4 == 0))
      .toDF("id", "score", "y")
    val base = Features.liftTable(df, "score", "y", nBuckets = 7, tieCol = "id")
    base.collect() // finalize AQE before reading the executed plan (invariant 8)
    val plan = base.queryExecution.executedPlan.toString
    assert(!plan.contains("row_number"), plan)
    val a = base.orderBy("bucket").collect().toSeq
    for (layout <- Seq(df.repartition(13), df.orderBy($"score"), df.coalesce(1))) {
      val b = Features.liftTable(layout, "score", "y", nBuckets = 7, tieCol = "id")
        .orderBy("bucket").collect().toSeq
      assert(b == a)
    }
  }

  test("corrPairs: perfect positive/negative correlation and independence signs") {
    val df = (1 to 200).map { i =>
      val x = i.toDouble
      (x, 2 * x + 1, -3 * x, (i % 2).toDouble)
    }.toDF("x", "y", "z", "p")
    val out = Features.corrPairs(df, Seq("x", "y", "z", "p"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(math.abs(out(("x", "y")) - 1.0) < 1e-9)
    assert(math.abs(out(("x", "z")) + 1.0) < 1e-9)
    assert(math.abs(out(("x", "p"))) < 0.05) // alternating parity ~ uncorrelated
    assert(out.size == 6)
  }

  test("corrPairs is a single job: one scan, pairs from one aggregate row") {
    val df = (1 to 50).map(i => (i.toDouble, (i * i).toDouble)).toDF("a", "b")
    val out = Features.corrPairs(df, Seq("a", "b"))
    out.collect()
    // single scalar aggregate: at most the one shuffle the agg itself needs
    assert(Scale.countExchanges(out) <= 1)
  }

  test("zOrderValue: interleave matches a bit-level reference model") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(b =>
        (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))).reduce(_ | _)
    val pts = for { x <- 0L to 16L; y <- 0L to 16L } yield (x, y)
    val got = pts.toDF("x", "y")
      .withColumn("z", Scale.zOrderValue(Seq(col("x"), col("y")), bits = 5))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == ref(x, y, 5), s"($x,$y)") }
  }

  test("zOrderRepartition: partitions cover small hyper-rectangles (data skipping)") {
    // 64x64 grid in random row order; 16 range partitions on the Morton code
    val rnd = new scala.util.Random(7)
    val pts = rnd.shuffle((for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong)).toVector)
    val df = pts.toDF("x", "y")
    val parts = Scale.zOrderRepartition(df, Seq("x", "y"), bits = 6, numPartitions = 16)
      .select(spark_partition_id().as("pid"), $"x", $"y")
      .groupBy("pid").agg(
        (max($"x") - min($"x")).as("dx"), (max($"y") - min($"y")).as("dy"))
      .collect()
    assert(parts.length == 16)
    // average bounding box area well under the full 63x63 domain: each file
    // is min/max-prunable on BOTH dimensions
    val avgArea = parts.map(r => (r.getLong(1) + 1.0) * (r.getLong(2) + 1.0)).sum / parts.length
    assert(avgArea < 63.0 * 63.0 / 4.0, s"avgArea=$avgArea")
  }

  test("preferencePairs: best-vs-worst, deterministic ties, singletons dropped, layout-free") {
    import graft.features.TrainingSet
    val df = Seq(
      ("p1", 1L, 10L), ("p1", 2L, 30L), ("p1", 3L, 30L), ("p1", 4L, 5L),
      ("p2", 5L, 7L),                 // singleton — no pair exists
      ("p3", 6L, 4L), ("p3", 7L, 4L)) // all-tie group still pairs 2 rows
      .toDF("g", "id", "score")
    def run(d: org.apache.spark.sql.DataFrame) =
      TrainingSet.preferencePairs(d, "g", "id", "score")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    val out = run(df)
    // p1: max 30 ties (2,3) → smallest id 2; min is unique id 4
    // p3: all tie at 4 → chosen smallest id 6, rejected largest id 7
    assert(out == Seq(
      ("p1", 2L, 30L, 4L, 5L, 25L),
      ("p3", 6L, 4L, 7L, 4L, 0L)))
    assert(run(df.repartition(7)) == out)
  }

  test("TrainingSet.build: stacked as-of lookups pick latest snapshot <= label time, no leakage") {
    import graft.features.{FeatureLookup, TrainingSet}
    val labels = Seq((1L, 10L, "A"), (1L, 25L, "B"), (2L, 5L, "C"))
      .toDF("cust", "t", "label")
    val balances = Seq((1L, 5L, 100.0), (1L, 20L, 200.0), (1L, 30L, 999.0), (2L, 7L, 50.0))
      .toDF("cust", "snap", "bal")
    val scores = Seq((1L, 10L, 7), (2L, 1L, 3))
      .toDF("cust", "asof", "score")
    val out = TrainingSet.build(labels, "t", Seq(
        FeatureLookup(balances, Seq("cust"), "snap", prefix = "b_"),
        FeatureLookup(scores, Seq("cust"), "asof", prefix = "s_")))
      .select("cust", "t", "label", "b_snap", "b_bal", "s_asof", "s_score")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((Option(r.get(3)), Option(r.get(4)), Option(r.get(5)), Option(r.get(6))))).toMap
    // t=10: balance snap 5 (not 20/30 — future), score asof 10 (inclusive)
    assert(out((1L, 10L)) == ((Some(5L), Some(100.0), Some(10L), Some(7))))
    // t=25: latest balance snap 20; 30 is leakage and must not appear
    assert(out((1L, 25L)) == ((Some(20L), Some(200.0), Some(10L), Some(7))))
    // cust 2 at t=5: no balance yet -> nulls; score from t=1
    assert(out((2L, 5L)) == ((None, None, Some(1L), Some(3))))
    // colliding prefixes are rejected
    intercept[IllegalArgumentException] {
      TrainingSet.build(labels, "t", Seq(
        FeatureLookup(balances, Seq("cust"), "snap", prefix = "x_"),
        FeatureLookup(balances.withColumnRenamed("snap", "snap2")
          .withColumnRenamed("bal", "bal2")
          .withColumnRenamed("snap2", "snap"), Seq("cust"), "snap", prefix = "x_")))
    }
  }

  test("robustScale: hand-computed median/IQR, zero-IQR group nulls") {
    // g=a: values 1..5 -> ranks 1..5, n=5: q1 = rank ceil(1.25)=2 -> 2.0,
    // med = rank 3 -> 3.0, q3 = rank 4 -> 4.0; robust = (x-3)/2
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
      ("a", 4L, 4.0), ("a", 5L, 5.0),
      ("b", 6L, 7.0), ("b", 7L, 7.0), ("b", 8L, 7.0)).toDF("g", "id", "x")
    val out = Features.robustScale(df, "x", Seq("g"), tieCol = "id")
      .collect().map(r => r.getLong(r.fieldIndex("id")) ->
        Option(r.get(r.fieldIndex("x_robust")))).toMap
    assert(out(1L) == Some(-1.0))
    assert(out(3L) == Some(0.0))
    assert(out(5L) == Some(1.0))
    // all-equal group: q3 == q1 -> null, not division by zero
    assert(Seq(6L, 7L, 8L).forall(out(_).isEmpty))
  }

  test("histogram: counts per bin, out-of-range values clamp to edge bins") {
    val df = Seq(-5.0, 0.0, 1.0, 9.9, 10.0, 15.0, 25.0, 99.0, 130.0)
      .toDF("x")
    val out = Features.histogram(df, "x", lo = 0.0, hi = 100.0, nBins = 10)
      .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(out(0) == ((0.0, 10.0, 4L)))   // -5 clamps in; 0, 1, 9.9
    assert(out(1) == ((10.0, 20.0, 2L)))  // 10.0 and 15.0
    assert(out(2) == ((20.0, 30.0, 1L)))
    assert(out(9) == ((90.0, 100.0, 2L))) // 99 and the 130 clamp
    assert(out.values.map(_._3).sum == 9L)
  }

  test("iqrOutlierFlags: hand-computed fences, zero-IQR group flags nothing") {
    // g=a values 1..5: q1=2, q3=4, IQR=2 -> fences [-1, 7]; 100 is out
    val df = (Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
      ("a", 4L, 4.0), ("a", 5L, 100.0)) ++
      Seq(("b", 6L, 7.0), ("b", 7L, 7.0))).toDF("g", "id", "x")
    // with 100 in the group: sorted 1,2,3,4,100 -> q1=2 (rank 2), q3=4 (rank 4)
    val out = Features.iqrOutlierFlags(df, "x", Seq("g"), tieCol = "id")
      .collect().map(r => r.getLong(r.fieldIndex("id")) ->
        ((r.getBoolean(r.fieldIndex("x_outlier")),
          r.getDouble(r.fieldIndex("fence_lo")), r.getDouble(r.fieldIndex("fence_hi"))))).toMap
    assert(out(5L) == ((true, -1.0, 7.0)))
    assert(Seq(1L, 2L, 3L, 4L).forall(!out(_)._1))
    assert(Seq(6L, 7L).forall(!out(_)._1)) // zero IQR: degenerate fences, no flags
  }

  test("winsorize clamps into the nearest-rank quantile band, interior untouched") {
    // 20 values 1..20 in one group: p05 -> rank 1 (=1.0), p95 -> rank 19 (=19.0)
    val df = (1L to 20L).map(i => ("a", i, i.toDouble)).toDF("g", "id", "x")
    val out = Features.winsorize(df, "x", Seq("g"), tieCol = "id")
      .collect().map(r => r.getLong(1) -> r.getDouble(r.fieldIndex("x_wins"))).toMap
    assert(out(20L) == 19.0) // clamped down to the p95 value
    assert(out(1L) == 1.0)   // at the band edge: untouched
    assert(out(10L) == 10.0) // interior: untouched
    intercept[IllegalArgumentException] {
      Features.winsorize(df, "x", Seq("g"), "id", pLo = 0.9, pHi = 0.1)
    }
  }

  test("hashEncode: stable in-range buckets, equal values collide, nulls stay null") {
    val df = Seq(Some("alpha"), Some("beta"), Some("alpha"), None)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "cat")
    val out = Features.hashEncode(df, "cat", buckets = 16)
      .collect().map(r => r.getLong(0) -> Option(r.get(r.fieldIndex("cat_hashed")))).toMap
    assert(out(0L) == out(2L))                       // same value, same bucket
    assert(out(3L).isEmpty)                          // null passes through
    Seq(0L, 1L).foreach { i =>
      val b = out(i).get.asInstanceOf[Int]
      assert(b >= 0 && b < 16)
    }
    // deterministic across runs / layouts
    val again = Features.hashEncode(df.repartition(5), "cat", buckets = 16)
      .collect().map(r => r.getLong(0) -> Option(r.get(r.fieldIndex("cat_hashed")))).toMap
    assert(again == out)
  }

  test("negativeSample: draws from the universe, never a positive, layout/salt-stable") {
    val positives = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("ent", "item")
    val universe = Seq("a", "b", "c", "d", "e", "f").toDF("item")
    val out = Features.negativeSample(positives, "ent", "item", universe, k = 4)
    val rows = out.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val posSet = Set((1L, "a"), (1L, "b"), (2L, "c"))
    rows.foreach { case (e, _, i) =>
      assert(!posSet.contains((e, i)), s"sampled a positive: ($e, $i)")
      assert(Set("a", "b", "c", "d", "e", "f")(i))
    }
    assert(rows.groupBy(_._1).values.forall(_.length <= 4)) // approximately-k
    val again = Features.negativeSample(
      positives.repartition(7), "ent", "item", universe, k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(again.toSet == rows.toSet) // layout-independent
    val other = Features.negativeSample(positives, "ent", "item", universe,
      k = 4, salt = 7).collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(other.toSet != rows.toSet) // salt re-draws
  }

  test("servingLookup: freshest snapshot per entity, stale entities dropped") {
    val feats = Seq(
      (1L, "2024-01-01", 10.0), (1L, "2024-03-01", 30.0),
      (2L, "2023-06-01", 99.0), // stale: outside the 92-day TTL
      (3L, "2024-03-20", 7.0))
      .toDF("cust", "snap", "bal")
      .withColumn("snap", $"snap".cast("date"))
    val out = graft.features.TrainingSet.servingLookup(
        feats, Seq("cust"), "snap", asOf = "2024-03-31", maxStalenessDays = 92,
        prefix = "f_")
      .collect().map(r => r.getLong(0) ->
        ((r.getDate(1).toString, r.getDouble(2)))).toMap
    assert(out(1L) == (("2024-03-01", 30.0))) // latest in-window, not Jan
    assert(!out.contains(2L))                 // stale -> excluded, not served
    assert(out(3L) == (("2024-03-20", 7.0)))
  }

  test("portableHashSample: deterministic, ~fraction sized, layout-independent") {
    val df = (1L to 4000L).toDF("id")
    val a = Filters.portableHashSample(df, Seq("id"), 0.25, salt = 7)
      .select("id").as[Long].collect().toSet
    val b = Filters.portableHashSample(df.repartition(13), Seq("id"), 0.25, salt = 7)
      .select("id").as[Long].collect().toSet
    assert(a == b) // partition-layout independent
    assert(math.abs(a.size / 4000.0 - 0.25) < 0.03)
    val other = Filters.portableHashSample(df, Seq("id"), 0.25, salt = 8)
      .select("id").as[Long].collect().toSet
    assert(a != other) // salt changes the kept set
  }
  test("cramerVonMises: hand integrated gap, identical zero, ties") {
    // disjoint a={1,2} b={3,4}: gaps 2,4,2,0 -> U = 4+16+4 = 24,
    // T = 24e6 div (2*2*4*4) = 375000
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)).toDF("g", "x")
    assert(Features.cramerVonMises(df, "x", "g", "a", "b")
      .as[(Long, Long, Long)].collect().head == ((2L, 2L, 375000L)))
    // identical cohorts: every gap zero
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)).toDF("g", "x")
    assert(Features.cramerVonMises(same, "x", "g", "a", "b")
      .as[(Long, Long, Long)].collect().head == ((2L, 2L, 0L)))
    // tie value pools both cohorts' weight: a={1,2} b={2,3} -> U = 12
    val tied = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)).toDF("g", "x")
    assert(Features.cramerVonMises(tied, "x", "g", "a", "b")
      .as[(Long, Long, Long)].collect().head == ((2L, 2L, 187500L)))
    // layout-independence (range-partition prefix-sum topology)
    val big = (1 to 400).map(i =>
      (if (i % 2 == 0) "a" else "b", (i * 37 % 101).toDouble)).toDF("g", "x")
    val p = Features.cramerVonMises(big, "x", "g", "a", "b")
      .as[(Long, Long, Long)].collect().head
    val q = Features.cramerVonMises(big.repartition(13), "x", "g", "a", "b")
      .as[(Long, Long, Long)].collect().head
    assert(p == q)
  }
  test("driftBattery: one row per feature, disjoint max, identical zero") {
    val df = Seq(
      ("r", 1.0, "u"), ("r", 2.0, "v"),
      ("c", 3.0, "w"), ("c", 4.0, "x")
    ).toDF("g", "num", "cat")
    val got = Features.driftBattery(df, "g", "r", "c",
        numericCols = Seq("num"), categoricalCols = Seq("cat"))
      .orderBy("feature")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    // disjoint supports: KS and TVD both saturate at 1e6
    assert(got == Seq(("cat", "tvd", 2L, 2L, 1000000L),
      ("num", "ks", 2L, 2L, 1000000L)))
    val same = Seq(("r", 1.0, "u"), ("c", 1.0, "u")).toDF("g", "num", "cat")
    assert(Features.driftBattery(same, "g", "r", "c", Seq("num"), Seq("cat"))
      .orderBy("feature")
      .as[(String, String, Long, Long, Long)].collect().toSeq ==
      Seq(("cat", "tvd", 1L, 1L, 0L), ("num", "ks", 1L, 1L, 0L)))
  }
  test("robustStats: hand quartiles, Tukey fences, outlier counts") {
    val clean = (1 to 10).map(_.toDouble).toDF("v")
    val got = Features.robustStats(clean, "v")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    // n=10: k25=3 -> 300, k50=5 -> 500, k75=8 -> 800 cents
    assert(got == ((10L, 300L, 500L, 800L, 500L, 0L, 0L)))
    val outl = ((1 to 10).map(_.toDouble) :+ 100.0).toDF("v")
    val go = Features.robustStats(outl, "v")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    // n=11: k25=3 -> 300, k50=6 -> 600, k75=9 -> 900; high fence
    // 2v > 1800 + 1800 catches only the planted 100.00
    assert(go == ((11L, 300L, 600L, 900L, 600L, 0L, 1L)))
    // layout-independent
    val re = Features.robustStats(outl.repartition(7), "v")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(go == re)
  }
  test("madStats: hand median/MAD, outlier immunity, layout-independent") {
    val got = Features.madStats((1 to 5).map(_.toDouble).toDF("v"), "v")
      .as[(Long, Long, Long)].collect().head
    // median 3.00, deviations {2,1,0,1,2} -> MAD 1.00
    assert(got == ((5L, 300L, 100L)))
    // one wild outlier moves neither statistic
    val go = Features.madStats(Seq(1.0, 2.0, 3.0, 4.0, 10000.0).toDF("v"), "v")
      .as[(Long, Long, Long)].collect().head
    assert(go == ((5L, 300L, 100L)))
    val big = (1 to 1000).map(i => (i % 13).toDouble).toDF("v")
    val a = Features.madStats(big, "v").as[(Long, Long, Long)].collect().head
    val b = Features.madStats(big.repartition(11), "v")
      .as[(Long, Long, Long)].collect().head
    assert(a == b)
  }
}
