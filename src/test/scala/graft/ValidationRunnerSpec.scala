package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

import graft.datagen.BankingDataGen
import graft.pipelines.Runner
import graft.store.TableStore
import graft.validate.Validation

class ValidationRunnerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("crossCheckHistorical flags diverging months, passes equal ones") {
    val src = Seq(("2024-01-01", 1), ("2024-01-01", 2), ("2024-02-01", 3)).toDF("d", "x")
    val tgtSame = src
    assert(Validation.crossCheckHistorical(src, tgtSame, "d", "d").isEmpty)
    val tgtShrunk = Seq(("2024-01-01", 1), ("2024-02-01", 3), ("2024-03-01", 4)).toDF("d", "x")
    val mismatches = Validation.crossCheckHistorical(src, tgtShrunk, "d", "d")
    assert(mismatches.map(_.monthDt) == Seq("2024-01-01", "2024-03-01"))
    assert(mismatches.head.sourceCnt == 2 && mismatches.head.targetCnt == 1)
  }

  test("crossCheckDimensional tolerates small drift, rejects large") {
    val a100 = spark.range(100).toDF("id")
    val a104 = spark.range(104).toDF("id")
    val a120 = spark.range(120).toDF("id")
    assert(Validation.crossCheckDimensional(a104, a100)._1)       // 4% < 5%
    assert(!Validation.crossCheckDimensional(a120, a100)._1)      // 20% > 5%
  }

  test("outdatedness with fixed clock (SURVEY §5: unit test with fixed clock)") {
    val df = Seq("2024-03-15", "2024-04-02").toDF("event_dt")
    val now = java.time.LocalDate.of(2024, 6, 20)
    // lag 1 month: expect data through 2024-05 → max is 2024-04 → 1 month late
    val o1 = Validation.outdatedness(df, "t", "event_dt", 1, now)
    assert(o1.isOutdated && o1.monthsLate == 1 && o1.maxEventDt == "2024-04-01")
    // lag 2 months: expect through 2024-04 → fresh
    assert(!Validation.outdatedness(df, "t", "event_dt", 2, now).isOutdated)
  }

  test("outdatedness on empty / all-null dates reports 'no data' instead of throwing") {
    val now = java.time.LocalDate.of(2024, 6, 20)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL("event_dt STRING"))
    val oEmpty = Validation.outdatedness(empty, "t", "event_dt", 1, now)
    assert(oEmpty.isOutdated && oEmpty.maxEventDt == "no data")
    val allNull = Seq(Option.empty[String], Option.empty[String]).toDF("event_dt")
    assert(Validation.outdatedness(allNull, "t", "event_dt", 1, now).maxEventDt == "no data")
  }

  test("validation log appends typed rows") {
    val store = new TableStore(spark, Files.createTempDirectory("graft_vlog").toString)
    val ts = java.sql.Timestamp.valueOf("2024-06-01 10:00:00")
    Validation.logResult(spark, store, "validation_log", "fs_x", "cross_check",
      passed = true, detail = "ok", executedAt = ts)
    Validation.logResult(spark, store, "validation_log", "fs_x", "outdatedness",
      passed = false, detail = "1 month late", executedAt = ts)
    val log = store.read("validation_log")
    assert(log.count() == 2)
    // parquet round-trip widens nullability; names/types must match
    assert(log.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Validation.summarySchema.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("Runner end-to-end: five pipelines saved, registered, idempotent rerun") {
    val store = new TableStore(spark, Files.createTempDirectory("graft_run").toString)
    val sources = BankingDataGen.all(spark, n = 40, months = 24)
    val today = java.time.LocalDate.of(2024, 7, 15)
    val r1 = Runner.run(spark, sources, store,
      Runner.Params(startDate = "2023-06-01"), today)
    assert(r1.size == 5 && r1.forall(_.rows > 0) && r1.forall(_.validationPassed))
    // registration metadata present
    val m = store.meta("fs_cus_transactions").get
    assert(m.primaryKeys == Seq("pk_customer", "tpk_release_dt"))
    assert(m.timestampKeys == Seq("tpk_release_dt"))
    // rerun with identical sources: upsert path, same row counts (idempotent)
    val r2 = Runner.run(spark, sources, store, Runner.Params(startDate = "2023-06-01"), today)
    assert(r1.map(r => r.table -> r.rows).toMap == r2.map(r => r.table -> r.rows).toMap)
    assert(r2.forall(_.validationPassed))
  }

  test("resolveEndDate: 'actual' becomes first of current month") {
    assert(Runner.resolveEndDate("actual", java.time.LocalDate.of(2024, 7, 15)) == "2024-07-01")
    assert(Runner.resolveEndDate("2024-01-31", java.time.LocalDate.of(2024, 7, 15)) == "2024-01-31")
  }
}
