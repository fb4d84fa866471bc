package graft.datagen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded synthetic banking data generator — Spark-native rebuild of the
  * reference's `notebooks/dummy_data_generation.py` (numpy, driver-side).
  *
  * Same five `demo_db` tables, same schemas and domains (FIXTURES.md), but
  * generated *distributed*: every value is a pure function of
  * `xxhash64(id, month, salt)`, so the output is deterministic regardless
  * of parallelism/partitioning (unlike `rand(seed)`, whose draw depends on
  * partition layout) and scales to any row count without a driver
  * bottleneck. Distribution shaping uses inverse-transform / Box-Muller on
  * hash-uniforms.
  */
object BankingDataGen {

  val DefaultCustomers = 10000
  val DefaultMonths = 24
  /** Last generated month (the reference generates 24 months back from its
    * run date; we pin the anchor for determinism). */
  val AnchorMonth = "2024-07-01"

  /** Deterministic uniform in [0,1) from hashed columns + salt. */
  private def u(salt: Int, cols: Column*): Column =
    (pmod(xxhash64((cols :+ lit(salt)): _*), lit(1000000007L)).cast("double")
      / 1000000007.0)

  /** Box-Muller standard normal from two hash-uniforms. */
  private def gauss(salt: Int, cols: Column*): Column = {
    val u1 = greatest(u(salt, cols: _*), lit(1e-12)) // avoid log(0)
    val u2 = u(salt + 1000, cols: _*)
    sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
  }

  private def pick(uu: Column, choices: Seq[(String, Double)]): Column = {
    val cum = choices.scanLeft(0.0)(_ + _._2).tail
    choices.zip(cum).foldLeft(Option.empty[Column]) { case (acc, ((v, _), c)) =>
      Some(acc.map(_.when(uu < c, v)).getOrElse(when(uu < c, v)))
    }.get.otherwise(choices.last._1)
  }

  /** `demo_db.clientes` (`dummy_data_generation.py:43-79`). */
  def clientes(spark: SparkSession, n: Int = DefaultCustomers): DataFrame = {
    val id = col("id")
    spark.range(1, n + 1).select(
      id.as("id_cliente"),
      date_sub(lit(AnchorMonth).cast("date"),
        (lit(18 * 365) + (u(1, id) * (62 * 365)).cast("int")).cast("int"))
        .as("fecha_nacimiento"),
      pick(u(2, id), Seq("M" -> 0.5, "F" -> 0.5)).as("genero"),
      pick(u(3, id), Seq("Soltero" -> 0.4, "Casado" -> 0.4, "Divorciado" -> 0.2))
        .as("estado_civil"),
      pick(u(4, id), Seq("Primaria" -> 0.2, "Secundaria" -> 0.35,
        "Universitario" -> 0.35, "Postgrado" -> 0.1)).as("nivel_educativo"),
      greatest(least(lit(3000.0) + gauss(5, id) * 2500.0, lit(20000.0)), lit(300.0))
        .as("ingresos_mensuales"),
      pick(u(7, id), Seq("Urbano" -> 0.8, "Rural" -> 0.2)).as("zona_residencia"),
      concat(lit("Ciudad "), pmod(xxhash64(id, lit(8)), lit(50))).as("ciudad"),
      date_sub(lit(AnchorMonth).cast("date"), (u(9, id) * (30 * 365)).cast("int"))
        .as("fecha_apertura"))
      .withColumn("segmento_cliente",
        when(col("ingresos_mensuales") >= 10000, "ELITE")
          .when(col("ingresos_mensuales") >= 6000, "PREMIUM")
          .when(col("ingresos_mensuales") >= 3000, "PRESTIGE")
          .otherwise("SILVER"))
  }

  /** Cross of customer ids × month indexes 0..months-1 (distributed). */
  private def idMonths(spark: SparkSession, n: Int, months: Int): DataFrame =
    spark.range(1, n + 1).select(col("id").as("id_cliente"))
      .crossJoin(spark.range(0, months).select(col("id").as("m")))

  private def periodCol: Column =
    date_format(add_months(lit(AnchorMonth).cast("date"), (col("m") - 23).cast("int")), "yyyy-MM")

  /** `demo_db.pagos` (`dummy_data_generation.py:181-296`): one credit per
    * customer, 24 monthly rows, 15% delinquent population. */
  def pagos(spark: SparkSession, n: Int = DefaultCustomers,
            months: Int = DefaultMonths): DataFrame = {
    val id = col("id_cliente")
    idMonths(spark, n, months)
      .withColumn("periodo", periodCol)
      .withColumn("moroso", u(10, id) < 0.15)
      .withColumn("valor_total_credito",
        greatest(least(exp(lit(9.2) + gauss(11, id) * 0.6), lit(40000.0)), lit(5000.0)))
      .withColumn("meses_credito", (lit(12) + (u(13, id) * 25).cast("int")).cast("long"))
      .withColumn("cuota_mensual", round(col("valor_total_credito") / col("meses_credito"), 2))
      .withColumn("fecha_apertura",
        add_months(lit(AnchorMonth).cast("date"), lit(-23) - (u(14, id) * 12).cast("int")))
      .withColumn("fecha_cierre", add_months(col("fecha_apertura"), col("meses_credito").cast("int")))
      .withColumn("saldo_total_credito",
        round(greatest(col("valor_total_credito") * (lit(1.0) - col("m") / col("meses_credito")),
          lit(0.0)), 2))
      .withColumn("cuota_pagada",
        u(15, id, col("m")) < when(col("moroso"), 0.75).otherwise(0.98))
      .withColumn("monto_pagado",
        when(col("cuota_pagada"), col("cuota_mensual")).otherwise(lit(0.0)))
      .withColumn("dias_mora",
        when(col("cuota_pagada"), lit(0L))
          .otherwise((u(16, id, col("m")) * 90).cast("long")))
      .withColumn("pago_minimo", u(17, id, col("m")) < 0.4)
      .withColumn("calificacion_sistema",
        when(!col("moroso"), pick(u(18, id, col("m")), Seq("A" -> 0.7, "B" -> 0.3)))
          .otherwise(pick(u(18, id, col("m")),
            Seq("B" -> 0.2, "C" -> 0.3, "D" -> 0.3, "E" -> 0.2))))
      .select("id_cliente", "periodo", "saldo_total_credito", "cuota_pagada",
        "monto_pagado", "dias_mora", "pago_minimo", "calificacion_sistema",
        "fecha_apertura", "fecha_cierre", "valor_total_credito", "cuota_mensual",
        "meses_credito")
  }

  /** `demo_db.buro_credito` (`dummy_data_generation.py:317-339`): derived
    * from pagos; score banded by rating. */
  def buroCredito(pagosDf: DataFrame): DataFrame = {
    val id = col("id_cliente")
    val uu = u(20, id, col("periodo"))
    pagosDf.select(id, col("periodo"), col("calificacion_sistema"), col("saldo_total_credito"))
      .withColumn("buro_score",
        (when(col("calificacion_sistema") === "A", lit(750) + uu * 200)
          .when(col("calificacion_sistema") === "B", lit(650) + uu * 100)
          .when(col("calificacion_sistema") === "C", lit(550) + uu * 100)
          .when(col("calificacion_sistema") === "D", lit(450) + uu * 100)
          .otherwise(lit(300) + uu * 150)).cast("int"))
      .withColumn("consultas_buro_12m", (u(21, id, col("periodo")) * 6).cast("int"))
      .withColumn("deuda_total_bancos",
        round(col("saldo_total_credito") * (lit(1.0) + u(22, id, col("periodo"))), 2))
      .drop("saldo_total_credito")
  }

  /** `demo_db.transacciones` (`dummy_data_generation.py:357-376`). */
  def transacciones(spark: SparkSession, n: Int = DefaultCustomers,
                    months: Int = DefaultMonths): DataFrame = {
    val id = col("id_cliente")
    idMonths(spark, n, months)
      .withColumn("periodo", periodCol)
      // Poisson(15) ≈ round(N(15, √15)) clipped ≥ 0
      .withColumn("numero_transacciones",
        greatest(round(lit(15.0) + gauss(30, id, col("m")) * math.sqrt(15.0), 0), lit(0.0))
          .cast("long"))
      // Gamma(2, 200) = −200·(ln u₁ + ln u₂)
      .withColumn("monto_total_transacciones",
        round(lit(-200.0) * (log(greatest(u(31, id, col("m")), lit(1e-12)))
          + log(greatest(u(32, id, col("m")), lit(1e-12)))), 2))
      .withColumn("recencia_ultima_transaccion",
        (u(33, id, col("m")) * 31).cast("long"))
      .select("id_cliente", "periodo", "numero_transacciones",
        "monto_total_transacciones", "recencia_ultima_transaccion")
  }

  /** `demo_db.productos` (`dummy_data_generation.py:105-150`): per-customer
    * product holdings with monthly amortizing balances. */
  def productos(spark: SparkSession, n: Int = DefaultCustomers,
                months: Int = DefaultMonths): DataFrame = {
    val products = Seq(
      ("tarjeta de credito", 0.7, 500.0, 5000.0),
      ("credito hipotecario", 0.2, 50000.0, 200000.0),
      ("credito productivo", 0.5, 5000.0, 50000.0),
      ("credito vehicular", 0.15, 10000.0, 40000.0))
    val prodDf = products.zipWithIndex.map { case ((name, prob, lo, hi), i) =>
      val id = col("id_cliente")
      idMonths(spark, n, months)
        .withColumn("producto", lit(name))
        .where(u(40 + i, id) < prob) // customer holds this product at all?
        .withColumn("span", (lit(3) + (u(50 + i, id) * 22).cast("int")))
        .where(col("m") >= lit(months) - col("span")) // active in last `span` months
        .withColumn("monto0", lit(lo) + u(60 + i, id) * (hi - lo))
        .withColumn("k", col("m") - (lit(months) - col("span")))
        .withColumn("monto",
          round(col("monto0") * (lit(1.0) - col("k") / col("span").cast("double")), 2))
        .withColumn("fecha",
          add_months(lit(AnchorMonth).cast("date"), (col("m") - 23).cast("int"))
            .cast("timestamp"))
        .select("id_cliente", "producto", "fecha", "monto", "m")
    }.reduce(_.unionByName(_))
    // total_productos: products held that month (dummy_data_generation.py:135-147)
    prodDf
      .withColumn("total_productos",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("id_cliente"), col("m"))))
      .drop("m")
  }

  /** All five tables. */
  def all(spark: SparkSession, n: Int = DefaultCustomers,
          months: Int = DefaultMonths): Map[String, DataFrame] = {
    val p = pagos(spark, n, months)
    Map(
      "clientes" -> clientes(spark, n),
      "productos" -> productos(spark, n, months),
      "pagos" -> p,
      "buro_credito" -> buroCredito(p),
      "transacciones" -> transacciones(spark, n, months))
  }
}
