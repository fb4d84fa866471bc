package graft

import org.apache.spark.sql.SparkSession

/** Executable end-to-end showcase of the feature-store flow:
  * seeded banking datagen → the five pipelines (reference DAG order) →
  * validation → versioned TableStore persistence with registration →
  * incremental rerun (idempotent upsert) → time-travel read.
  *
  * Usage: runMain graft.Demo [storeDir] [nCustomers]
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val storeDir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_demo").toString)
    val n = args.lift(1).map(_.toInt).getOrElse(1000)
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors().toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val store = new graft.store.TableStore(spark, storeDir)
    val sources = graft.datagen.BankingDataGen.all(spark, n)
    val today = java.time.LocalDate.parse("2024-07-15")

    println(s"== initial run (n=$n customers, store=$storeDir)")
    val r1 = graft.pipelines.Runner.run(spark, sources, store,
      graft.pipelines.Runner.Params(startDate = "2023-01-01"), today)
    r1.foreach(r => println(f"  ${r.table}%-28s v${r.version} rows=${r.rows}%-8d validated=${r.validationPassed}"))

    println("== incremental rerun (idempotent upsert by PK)")
    val r2 = graft.pipelines.Runner.run(spark, sources, store,
      graft.pipelines.Runner.Params(startDate = "2023-01-01"), today)
    r2.foreach(r => println(f"  ${r.table}%-28s v${r.version} rows=${r.rows}%-8d (unchanged=${
      r1.find(_.table == r.table).exists(_.rows == r.rows)})"))

    val t = "fs_cus_transactions"
    println(s"== time travel: $t v0 vs v${store.currentVersion(t)}")
    println(s"  v0 rows: ${store.readVersion(t, 0).count()}")
    println(s"  head of current version:")
    store.read(t).orderBy("pk_customer", "tpk_release_dt").show(5, truncate = false)
    val meta = store.meta(t).get
    println(s"  registered PKs=${meta.primaryKeys.mkString(",")} tsKeys=${meta.timestampKeys.mkString(",")}")
    spark.stop()
  }
}
