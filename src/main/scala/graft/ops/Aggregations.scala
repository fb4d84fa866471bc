package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation operator kit.
  *
  * Reference semantics: fixed grouped aggs (`fs_cus_credit_risk.py:213-261`),
  * config-driven aggs with optional pivot/join-back (`aggregation.py:60-159`),
  * manual conditional pivot incl. the `LIT` boolean-indicator op
  * (`fs_cus_holding_products.py:199-305`).
  *
  * Scale design: everything here is plain `groupBy(...).agg(...)` — Spark
  * plans partial (map-side) + final hash aggregation automatically, so a
  * 100 TB input shuffles only the partially-combined per-key state. The
  * conditional pivot deliberately stays ONE aggregation over N conditional
  * columns (not N self-joined aggregations).
  */
object Aggregations {

  /** A1 — grouped agg with fixed ops: count(*) + per-column named aggs
    * (`fs_cus_credit_risk.py:213-261`). Aggs supplied as (op, col, alias). */
  def groupedAgg(df: DataFrame, keys: Seq[String],
                 aggs: Seq[(String, String, String)],
                 countAlias: Option[String] = None): DataFrame = {
    val cols = countAlias.map(a => count(lit(1)).as(a)).toSeq ++
      aggs.map { case (op, c, alias) => graft.core.Exprs.resolve1(op)(col(c)).as(alias) }
    df.groupBy(keys.map(col): _*).agg(cols.head, cols.tail: _*)
  }

  /** A2 — config-driven agg: `{col -> ops}` with default `{c}_{op}` aliases
    * (`aggregation.py:60-159`), optional join-back onto the input (J6). */
  def configAgg(df: DataFrame, keys: Seq[String], ops: Map[String, Seq[String]],
                joinBack: Boolean = false): DataFrame = {
    val cols = for { (c, fs) <- ops.toSeq.sortBy(_._1); f <- fs }
      yield graft.core.Exprs.resolve1(f)(col(c)).as(s"${c}_$f")
    val agg = df.groupBy(keys.map(col): _*).agg(cols.head, cols.tail: _*)
    if (joinBack) df.join(agg, keys) else agg
  }

  /** A3 — manual pivot via conditional aggregation
    * (`fs_cus_holding_products.py:199-305`). For each (category value v,
    * measure col m, op): `op(CASE WHEN pivotCol = v THEN m ELSE 0 END)` named
    * `{alias}_{v}`; the special op "LIT" yields the boolean holding indicator
    * `SUM(CASE WHEN pivotCol = v THEN 1 ELSE 0 END) > 0` named `ind_{v}`
    * (`:282-289`). Total (un-pivoted) aggs appended with `_m` suffix. */
  def conditionalPivot(df: DataFrame, keys: Seq[String], pivotCol: String,
                       categories: Seq[String],
                       measures: Seq[(String, String, String)], // (op, measureCol, alias)
                       totals: Seq[(String, String, String)] = Nil,
                       fillZero: Boolean = true): DataFrame = {
    val pivoted = for { v <- categories; (op, m, alias) <- measures } yield op match {
      case "LIT" =>
        (sum(when(col(pivotCol) === v, 1).otherwise(0)) > 0).as(s"ind_${alias}_$v")
      case _ =>
        graft.core.Exprs.resolve1(op)(when(col(pivotCol) === v, col(m)).otherwise(0))
          .as(s"${alias}_$v")
    }
    val totalCols = totals.map { case (op, m, alias) =>
      graft.core.Exprs.resolve1(op)(col(m)).as(s"${alias}_m") }
    val all = pivoted ++ totalCols
    val out = df.groupBy(keys.map(col): _*).agg(all.head, all.tail: _*)
    if (fillZero) out.na.fill(0) else out
  }

  /** A4 — true pivot with explicit value list (`aggregation.py:142`).
    * Passing `values` avoids the extra distinct-collect job AND keeps the
    * output schema deterministic at any scale. */
  def pivot(df: DataFrame, keys: Seq[String], pivotCol: String,
            values: Seq[String], agg: Column): DataFrame =
    df.groupBy(keys.map(col): _*).pivot(pivotCol, values).agg(agg)

  /** A5 — global scalar agg → first row (`dataframe.py:67`, `monitor.py:368`). */
  def scalar(df: DataFrame, agg: Column): Any = df.agg(agg).first().get(0)

  /** A6 — per-group counts for cross-check validation (`monitor.py:377-383`). */
  def groupCounts(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).count()

  /** A7 — distinct values of a column (`feature_generation.py:263-266`). */
  def distinctValues(df: DataFrame, c: String): DataFrame = df.select(c).distinct()
}
