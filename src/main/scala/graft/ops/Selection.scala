package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Projection / rename / prefix operator kit.
  *
  * Reference semantics: `selection.py:9-68`, `transform_column.py:58-87`,
  * the PK rename + feature-prefix loop (`fs_cus_credit_risk.py:660-664`).
  */
object Selection {

  /** P1 — select with existence validation (`selection.py:9-38`). */
  def selectCols(df: DataFrame, cols: Seq[String]): DataFrame = {
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not found: ${missing.mkString(", ")}")
    df.select(cols.map(col): _*)
  }

  /** P2 — distinct projection (`selection.py:41-68`). */
  def selectDistinct(df: DataFrame, cols: Seq[String]): DataFrame =
    selectCols(df, cols).distinct()

  /** P3 — bulk rename with validation (`transform_column.py:58-87`). */
  def rename(df: DataFrame, renames: Map[String, String]): DataFrame = {
    val missing = renames.keys.filterNot(df.columns.contains)
    require(missing.isEmpty, s"rename sources not found: ${missing.mkString(", ")}")
    df.withColumnsRenamed(renames)
  }

  /** Feature-prefix pass: prefix every non-key column
    * (`fs_cus_credit_risk.py:660-664`), one projection. */
  def prefixFeatures(df: DataFrame, prefix: String, keep: Seq[String]): DataFrame =
    df.select(df.columns.map { n =>
      if (keep.contains(n)) col(n) else col(n).as(prefix + n)
    }.toIndexedSeq: _*)

  /** The standard feature-output key rename: entity/time cols → composite
    * PK names (`fs_cus_demographic.py:445-446` contract). */
  def toFeatureKeys(df: DataFrame, entityCol: String, timeCol: String,
                    pkName: String = "pk_customer",
                    tpkName: String = "tpk_release_dt"): DataFrame =
    rename(df, Map(entityCol -> pkName, timeCol -> tpkName))
}
