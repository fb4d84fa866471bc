package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.datagen.BankingDataGen
import graft.pipelines.Pipelines

class PipelinesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val sources = BankingDataGen.all(spark, n = 60, months = 24)
    .map { case (k, v) => k -> v.cache() }

  private def assertContract(df: org.apache.spark.sql.DataFrame,
                             prefix: String, nFeatures: Int): Unit = {
    assert(df.columns.take(2).toSeq == Seq("pk_customer", "tpk_release_dt"))
    assert(df.columns.length == nFeatures + 2, df.columns.mkString(","))
    assert(df.columns.drop(2).forall(_.startsWith(prefix)))
    // coercions applied: no LongType, no DecimalType anywhere (utils.py:538-564)
    assert(!df.schema.fields.exists(f =>
      f.dataType == LongType || f.dataType.isInstanceOf[DecimalType]))
    // time-series key: one row per (customer, month)
    assert(df.groupBy("pk_customer", "tpk_release_dt").count()
      .where($"count" > 1).isEmpty)
    assert(df.count() > 0)
  }

  test("transactions pipeline: 20 ctrx_ features, PK contract, coercions") {
    assertContract(Pipelines.transactions(sources("transacciones")), "ctrx_", 20)
  }

  test("credit risk pipeline: 22 chr_ features") {
    assertContract(Pipelines.creditRisk(sources("buro_credito")), "chr_", 22)
  }

  test("payment behavior pipeline: 37 cpym_ features") {
    assertContract(Pipelines.paymentBehavior(sources("pagos")), "cpym_", 37)
  }

  test("holding products pipeline: 65 chp_ features") {
    assertContract(Pipelines.holdingProducts(sources("productos")), "chp_", 65)
  }

  test("demographic pipeline: 10 cdmg_ features") {
    assertContract(
      Pipelines.demographic(sources("clientes"), "2023-01-01", BankingDataGen.AnchorMonth),
      "cdmg_", 10)
  }

  // Golden values from the reference docstring example
  // (`fs_cus_transactions.py:568-584`): the only reference-authored
  // expected outputs (SURVEY §5).
  test("transactions golden example from the reference docstring") {
    val input = Seq(
      (1001L, "2024-01", 15L, 75000.0, 2L),
      (1001L, "2024-02", 20L, 100000.0, 1L),
      (1002L, "2024-01", 8L, 40000.0, 5L))
      .toDF("id_cliente", "periodo", "numero_transacciones",
        "monto_total_transacciones", "recencia_ultima_transaccion")
    val out = Pipelines.transactions(input)
      .orderBy("pk_customer", "tpk_release_dt")
    val rows = out.select("pk_customer", "ctrx_trx_cnt_m", "ctrx_amt_trx_sum_m",
      "ctrx_amt_trx_sum_m_to_trx_cnt_m_ratio").collect()
    assert(rows.map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3))).toSeq ==
      Seq((1001, 15, 75000.0, 5000.0), (1001, 20, 100000.0, 5000.0),
        (1002, 8, 40000.0, 5000.0)))
    // release shift: 2024-01 data observable at 2024-02
    assert(out.select("tpk_release_dt").as[java.sql.Date].collect()
      .map(_.toString).toSeq == Seq("2024-02-01", "2024-03-01", "2024-02-01"))
  }

  test("credit risk golden example from the reference docstring (:522-538)") {
    val input = Seq(
      (1001L, "2024-01", "A", 750, 3, 850.0),
      (1001L, "2024-02", "A", 760, 2, 850.0),
      (1002L, "2024-01", "C", 680, 5, 915.0))
      .toDF("id_cliente", "periodo", "calificacion_sistema", "buro_score",
        "consultas_buro_12m", "deuda_total_bancos")
    val out = Pipelines.creditRisk(input).orderBy("pk_customer", "tpk_release_dt")
    val rows = out.select("pk_customer", "chr_credits_cnt", "chr_bureau_score_sum",
      "chr_rating_num", "chr_bureau_score_sum_ravg_3m",
      "chr_total_banking_debt_sum_to_bureau_score_sum_ratio").collect()
    // customer 1001 month2: ravg over {750, 760} = 755; ratio = 850/760 = 1.1184
    assert(rows(0).getInt(1) == 1 && rows(0).getInt(2) == 750 && rows(0).getInt(3) == 1)
    assert(rows(1).getDouble(4) == 755.0)
    assert(rows(1).getDouble(5) == math.floor(850.0 / 760 * 10000 + 0.5) / 10000 ||
      rows(1).getDouble(5) == BigDecimal(850.0 / 760).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(rows(2).getInt(2) == 680 && rows(2).getInt(3) == 3)
  }

  test("the five-pipeline DAG runs end-to-end over generated sources") {
    val all = Pipelines.runAll(spark, sources)
    assert(all.size == 5)
    all.foreach { case (name, df) => assert(df.limit(1).count() == 1, name) }
  }
}
