package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.plans.RangeJoinRewrite

class PlansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withRule[T](binWidth: Double)(body: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinRewrite
    spark.conf.set("spark.graft.rangeJoin.binWidth", binWidth.toString)
    try body finally {
      spark.conf.set("spark.graft.rangeJoin.binWidth", "0")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq RangeJoinRewrite)
    }
  }

  private lazy val values = (1 to 400).map(i => (i.toLong, (i % 89) * 1.31)).toDF("id", "v")
  private lazy val bands =
    (0 to 11).map(b => (b.toLong, b * 11.0, b * 11.0 + 18.0)).toDF("band_id", "lo", "hi")

  test("RangeJoinRewrite: theta interval join plans as a hash join, same rows") {
    val naive = values.join(bands, $"v" >= $"lo" && $"v" < $"hi")
      .select("id", "band_id").orderBy("id", "band_id").collect().toSeq
    val (rewritten, planStr) = withRule(binWidth = 7.0) {
      val j = values.join(bands, $"v" >= $"lo" && $"v" < $"hi")
        .select("id", "band_id").orderBy("id", "band_id")
      (j.collect().toSeq, j.queryExecution.executedPlan.toString)
    }
    assert(rewritten == naive && naive.nonEmpty)
    assert(!planStr.contains("BroadcastNestedLoopJoin"), planStr)
  }

  test("RangeJoinRewrite leaves equi-keyed and disabled joins alone") {
    // disabled (binWidth 0): plan keeps the nested-loop shape
    val theta = values.join(bands, $"v" >= $"lo" && $"v" < $"hi")
    assert(theta.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    // equi predicate present: rule must not touch it (already hash-joinable)
    withRule(binWidth = 7.0) {
      val withKey = values.withColumn("k", $"id" % 3)
      val bandsKey = bands.withColumn("k", $"band_id" % 3)
      val j = withKey.join(bandsKey,
        withKey("k") === bandsKey("k") && $"v" >= $"lo" && $"v" < $"hi")
      assert(!j.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      // and the flipped orientation (interval side on the left) still rewrites
      val flipped = bands.join(values, $"v" >= $"lo" && $"v" < $"hi")
        .select("id", "band_id").orderBy("id", "band_id")
      assert(flipped.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      val naive = values.join(bands, $"v" >= $"lo" && $"v" < $"hi")
        .select("id", "band_id").orderBy("id", "band_id")
      assert(flipped.collect().toSeq == naive.collect().toSeq)
    }
  }
}
