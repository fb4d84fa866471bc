package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sim.{Cluster, IvfIndex}
import graft.store.TableStore

class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 4 well-separated axis clusters, 10 vectors each: id i belongs to
  // group i % 4, with a small id-dependent wobble on a second dim.
  private def vecs = (1L to 40L).map { i =>
    val g = (i % 4).toInt
    val v = Array.fill(4)(0.0)
    v(g) = 1.0
    v((g + 1) % 4) = 0.01 * (i % 7)
    (i, v.toSeq)
  }

  private def centroids: Seq[Seq[Long]] =
    (0 until 4).map { g =>
      val v = Array.fill(4)(0.0)
      v(g) = 1.0
      v.toSeq.map(x => math.round(x * 1000000.0))
    }

  private def freshStore() = new TableStore(spark,
    java.nio.file.Files.createTempDirectory("graft_ivfspec").toString)

  test("incremental assignment == one-shot assignment; upsert replay is idempotent") {
    val df = vecs.toDF("vec_id", "embedding")
    val store = freshStore()
    IvfIndex.assignIncremental(store, "p",
      df.where(col("vec_id") <= 20), "vec_id", "embedding", centroids)
    IvfIndex.assignIncremental(store, "p",
      df.where(col("vec_id") > 20), "vec_id", "embedding", centroids)
    val incremental = IvfIndex.postings(store, "p")
      .as[(Long, Int)].collect().toSet
    val oneShot = Cluster.assignQuantized(df, "embedding", centroids)
      .select(col("vec_id"), col("cluster")).as[(Long, Int)].collect().toSet
    assert(incremental == oneShot)
    assert(incremental.forall { case (id, c) => c == (id % 4).toInt })
    // replaying a batch changes nothing (PK upsert)
    IvfIndex.assignIncremental(store, "p",
      df.where(col("vec_id") > 20), "vec_id", "embedding", centroids)
    assert(IvfIndex.postings(store, "p").count() == 40)
  }

  test("searchStored: planted clone ranks 1; scan reads only probed partitions") {
    val df = vecs.toDF("vec_id", "embedding")
    val store = freshStore()
    IvfIndex.assignIncremental(store, "p", df, "vec_id", "embedding", centroids)
    val query = df.where(col("vec_id") === 5)
      .select(lit(1005L).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.001)).as("embedding"))
    val hits = IvfIndex.searchStored(store, "p", query,
      "vec_id", "embedding", centroids, k = 3, nProbe = 2)
    // finalize THIS dataset before inspecting the plan (AQE; invariant 8)
    val rows = hits.collect()
    assert(rows.filter(_.getAs[Int]("rank") == 1)
      .map(_.getAs[Long]("neighbor_id")).toSeq == Seq(5L))
    // partition pruning: at most nProbe cluster dirs scanned
    val scan = fileScans(hits).find(_.output.exists(_.name == "v"))
      .getOrElse(fail("no posting file scan"))
    assert(scan.selectedPartitions.partitionCount <= 2,
      scan.metadata("PartitionFilters"))
  }

  /** AQE-aware FileSourceScanExec collector (descends AdaptiveSparkPlanExec
    * and QueryStageExec, which hide their inner plan from children). */
  private def fileScans(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[FileSourceScanExec] = {
      val self = p match { case f: FileSourceScanExec => Seq(f); case _ => Nil }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case o => o.children
      }
      self ++ kids.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  test("streaming ingest via foreachBatch builds the same index as batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfstream").toString
    vecs.toDF("vec_id", "embedding").repartition(3).write
      .mode("overwrite").parquet(dir)
    val store = freshStore()
    val cp = java.nio.file.Files.createTempDirectory("graft_ivfcp").toString
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1) // several micro-batches -> several upserts
      .parquet(dir)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.sim.IvfIndex.assignIncremental(store, "p", batch,
          "vec_id", "embedding", centroids)
        ()
      }
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = graft.sim.IvfIndex.postings(store, "p")
      .as[(Long, Int)].collect().toSet
    val oneShot = Cluster.assignQuantized(
        vecs.toDF("vec_id", "embedding"), "embedding", centroids)
      .select(col("vec_id"), col("cluster")).as[(Long, Int)].collect().toSet
    assert(streamed == oneShot)
  }

  test("assignIncremental output is partition-layout independent") {
    val df = vecs.toDF("vec_id", "embedding")
    val a = IvfIndex.assignIncremental(freshStore(), "p",
      df, "vec_id", "embedding", centroids).as[(Long, Int)].collect().toSet
    val b = IvfIndex.assignIncremental(freshStore(), "p",
      df.repartition(7), "vec_id", "embedding", centroids)
      .as[(Long, Int)].collect().toSet
    assert(a == b)
  }
}
