package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy risk screens over tabular training data — the release-gate
  * sibling of the PII redaction battery ([[graft.text.Redact]] scrubs
  * free text; these measure STRUCTURED re-identification risk before a
  * table ships into a training mix).
  *
  * k-anonymity (Sweeney, "k-anonymity: a model for protecting privacy",
  * IJUFKS 2002): every combination of quasi-identifier values must cover
  * at least k rows, or the combination singles people out. l-diversity
  * (Machanavajjhala et al., ICDE 2006): within each quasi-identifier
  * group the SENSITIVE attribute must take at least l distinct values,
  * or group membership alone leaks it.
  *
  * The reference has no privacy layer (its demo data is synthetic); this
  * is part of the training-data extension surface, next to the text-side
  * redaction the reference also lacks. */
object Privacy {

  /** Per-quasi-identifier-group risk report: group size, distinct
    * sensitive values (nulls excluded, the standard reading), and the
    * k-anonymity / l-diversity verdicts. One row per observed QI
    * combination.
    *
    * Scale: ONE hash aggregation on the QI columns with map-side partial
    * aggregation; output is bounded by QI-combination cardinality, never
    * row count. The distinct count is exact (it gates a release — an
    * approx_count_distinct underestimate could pass a failing group);
    * Spark plans it as the standard two-phase distinct-expand, still one
    * logical aggregation. */
  def riskReport(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
                 k: Int, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(k >= 1 && l >= 1, "k and l must be >= 1")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("k_anonymous", col("n_rows") >= k)
      .withColumn("l_diverse", col("n_sensitive") >= l)
  }

  /** Enforce k-anonymity by SUPPRESSION: drop every row whose
    * quasi-identifier combination covers fewer than k rows (the
    * always-valid fallback when generalization hierarchies aren't
    * defined). Keeps the input schema.
    *
    * Scale: an unordered count(*) window over the QI partitioning — one
    * hash Exchange, no sort, no join back. */
  def suppressSmallGroups(df: DataFrame, quasiCols: Seq[String],
                          k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(k >= 1, "k must be >= 1")
    val w = Window.partitionBy(quasiCols.map(col): _*)
    df.withColumn("__n", count(lit(1)).over(w))
      .where(col("__n") >= k)
      .drop("__n")
  }
}
