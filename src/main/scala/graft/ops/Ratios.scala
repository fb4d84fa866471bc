package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.core.Exprs

/** Ratio / percentage feature helpers with the reference's exact naming.
  * `calculate_ratios` / `calculate_percentages`
  * (`fs_cus_transactions.py:495-540`): bulk `withColumns`, null on zero
  * denominator, round(…, 4).
  */
object Ratios {

  /** `{a}_to_{b}_ratio` columns. */
  def withRatios(df: DataFrame, pairs: Seq[(String, String)]): DataFrame =
    df.withColumns(pairs.map { case (a, b) =>
      s"${a}_to_${b}_ratio" -> Exprs.safeRatio(col(a), col(b))
    }.toMap)

  /** `{a}_pct` columns (×100). */
  def withPercentages(df: DataFrame, pairs: Seq[(String, String)]): DataFrame =
    df.withColumns(pairs.map { case (a, b) =>
      s"${a}_pct" -> Exprs.safePct(col(a), col(b))
    }.toMap)
}
