package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sim.Cluster

class ClusterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.toSeq.toDF("id", "v")

  test("assignQuantized: exact argmin, ties go to the lowest centroid index") {
    val df = vecs(
      1L -> Seq(0.0, 0.0),   // dist 0 to c0
      2L -> Seq(1.0, 1.0),   // dist 0 to c1
      3L -> Seq(0.5, 0.5),   // equidistant c0/c1 -> tie -> c0
      4L -> Seq(0.9, 1.2))   // nearest c1
    val cents = Seq(Seq(0L, 0L), Seq(1000000L, 1000000L))
    val out = Cluster.assignQuantized(df, "v", cents)
      .select("id", "cluster").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 0, 4L -> 1))
  }

  test("assignQuantized is partition-layout independent") {
    val df = (1L to 97L).map(i => (i, Seq(math.sin(i.toDouble), math.cos(i.toDouble))))
      .toDF("id", "v")
    val cents = Seq(Seq(900000L, 0L), Seq(-900000L, 100000L), Seq(0L, -950000L))
    val a = Cluster.assignQuantized(df.repartition(1), "v", cents)
      .select("id", "cluster").as[(Long, Int)].collect().toSet
    val b = Cluster.assignQuantized(df.repartition(13), "v", cents)
      .select("id", "cluster").as[(Long, Int)].collect().toSet
    assert(a == b)
  }

  test("kmeans recovers well-separated planted clusters; cost non-increasing") {
    // three tight blobs around (0,0), (10,10), (-10, 5); ids ordered so
    // init (3 smallest ids) picks one seed per blob
    val pts = Seq(
      1L -> Seq(0.1, -0.1), 2L -> Seq(10.2, 9.9), 3L -> Seq(-10.1, 5.2),
      4L -> Seq(0.2, 0.1), 5L -> Seq(9.8, 10.1), 6L -> Seq(-9.9, 4.8),
      7L -> Seq(-0.2, 0.2), 8L -> Seq(10.1, 10.2), 9L -> Seq(-10.2, 5.1))
    val df = vecs(pts: _*)
    val m = Cluster.kmeans(df, "id", "v", k = 3, maxIters = 5)
    assert(m.iters >= 1 && m.cost < 0.2 * pts.size) // tight blobs: tiny mean sqdist
    // converged assignment groups ids by blob
    val cents = m.centroids.map(_.map(x => math.round(x * 1e6)))
    val out = Cluster.assignQuantized(df, "v", cents)
      .select("id", "cluster").as[(Long, Int)].collect().toMap
    assert(out(1L) == out(4L) && out(4L) == out(7L))
    assert(out(2L) == out(5L) && out(5L) == out(8L))
    assert(out(3L) == out(6L) && out(6L) == out(9L))
    assert(Set(out(1L), out(2L), out(3L)).size == 3)
  }

  test("kmeans keeps the previous centroid for an empty cluster") {
    // k=3 but only two distinct locations: the third centroid (init = id 3,
    // same spot as id 1's blob) empties after reassignment and must survive
    val df = vecs(
      1L -> Seq(0.0, 0.0), 2L -> Seq(5.0, 5.0), 3L -> Seq(0.0, 0.0),
      4L -> Seq(5.1, 5.0), 5L -> Seq(0.1, 0.0))
    val m = Cluster.kmeans(df, "id", "v", k = 3, maxIters = 3)
    assert(m.centroids.size == 3)
    assert(m.centroids.forall(_.forall(x => !x.isNaN)))
  }

  test("assignQuantized is map-only: zero exchanges in the executed plan") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Cluster.assignQuantized(df, "embedding",
      Seq(Seq.fill(64)(0L), Seq.fill(64)(500000L)))
      .select("vec_id", "cluster")
    out.collect() // finalize THIS dataset before counting (invariant 8)
    assert(graft.ops.Scale.countExchanges(out) == 0,
      out.queryExecution.executedPlan.toString)
  }

  test("semanticDupPairs: both self-join sides read ONE reused cluster Exchange") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = df.where(col("vec_id") < 4).orderBy("vec_id")
      .select(Cluster.quantize(col("embedding")).as("q"))
      .collect().map(_.getSeq[Long](0).toVector).toVector
    val pairs = Cluster.semanticDupPairs(df, "vec_id", "embedding", cents, threshold = 0.9)
    pairs.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def exchanges(p: SparkPlan): Seq[SparkPlan] = {
      val self = p match { case e: ShuffleExchangeLike => Seq(e); case _ => Nil }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case other => other.children
      }
      self ++ kids.flatMap(exchanges)
    }
    val distinct = exchanges(pairs.queryExecution.executedPlan)
      .map(System.identityHashCode).distinct
    assert(distinct.size == 1, pairs.queryExecution.executedPlan.toString)
  }

  test("semanticDupPairs finds identical clones within a cluster, no cross-cluster pairs") {
    val df = vecs(
      1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0),
      11L -> Seq(1.0, 0.0),            // clone of 1, same cluster
      12L -> Seq(0.0, 1.0),            // clone of 2
      13L -> Seq(0.9, 0.1))            // near 1's cluster but cosine < .995 vs 1
    val cents = Seq(Seq(1000000L, 0L), Seq(0L, 1000000L))
    val pairs = Cluster.semanticDupPairs(df, "id", "v", cents, threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 11L), (2L, 12L)))
    val kept = Cluster.semanticDedup(df, "id", "v", cents, threshold = 0.999)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 13L))
  }
}
