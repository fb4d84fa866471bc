package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Layered storage resolution — the `get_table(dataset, layer, format)`
  * surface (`src/packages/storage/storage_operations.py:19-57`): a dataset
  * name resolves to a physical location per layer
  * (source → ingestion → preprocessing), each readable through one call.
  *
  * Config-driven: layers map to base paths; `source` reads raw files
  * (parquet/csv/json), curated layers read [[TableStore]] tables (versioned,
  * upsertable). Existence probes mirror `storage_operations.py:59-73`.
  */
final class Sources(spark: SparkSession, layerPaths: Map[String, String]) {

  private def base(layer: String): String =
    layerPaths.getOrElse(layer, sys.error(s"unknown layer: $layer " +
      s"(configured: ${layerPaths.keys.mkString(", ")})"))

  private def store(layer: String) = new TableStore(spark, base(layer))

  /** S4 — layered read. `format` applies to the raw `source` layer only;
    * curated layers are always TableStore parquet snapshots. */
  def getTable(dataset: String, layer: String = "source",
               format: String = "parquet"): DataFrame =
    if (layer == "source") format match {
      case "parquet" => spark.read.parquet(s"${base(layer)}/$dataset.parquet")
      case "orc" => spark.read.orc(s"${base(layer)}/$dataset.orc")
      case "csv" => spark.read.option("header", "true").option("inferSchema", "true")
        .csv(s"${base(layer)}/$dataset.csv")
      case "json" => spark.read.json(s"${base(layer)}/$dataset.json")
      case other => sys.error(s"unsupported source format: $other")
    } else store(layer).read(dataset)

  /** Write into a curated layer (upsert when PKs known, else overwrite). */
  def putTable(dataset: String, layer: String, df: DataFrame,
               primaryKeys: Seq[String] = Nil): Unit =
    if (primaryKeys.nonEmpty) store(layer).upsert(dataset, df, primaryKeys)
    else store(layer).overwrite(dataset, df)

  /** S14 — existence probe. */
  def tableExists(dataset: String, layer: String): Boolean =
    if (layer == "source")
      new java.io.File(s"${base(layer)}/$dataset.parquet").exists()
    else store(layer).exists(dataset)
}
