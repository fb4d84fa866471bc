package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Dates

/** Declarative raw→intermediate schema layer: a config map drives a
  * one-projection cast/rename of the whole table — the reference's
  * `schemas_validation` (`src/packages/data_validation/schemas.py:13-63`),
  * which every reference ingestion runs through before any feature logic.
  *
  * Semantics preserved:
  *  - each entry `old_name → (name, data_type[, format_source])` becomes one
  *    output column `col(old_name).cast(data_type).as(name)`;
  *  - `data_type = DATE` (case-insensitive) requires `format_source` and
  *    parses via `to_date`, with the `yyyy-mm-qq` half-month repair branch
  *    (q1→01, q2→16; `schemas.py:46-51`) delegated to
  *    [[graft.core.Dates.repairHalfMonth]];
  *  - missing `name` or `data_type` fails fast with the column named;
  *  - output contains EXACTLY the configured columns, in config order.
  *
  * Scale: the whole layer is a single `select` projection — no shuffle, no
  * extra pass; Catalyst folds it into the scan, so column pruning reaches
  * the reader and unconfigured columns are never read from parquet.
  */
object Schemas {

  /** One field's target spec (`schemas.py` config leaf: name + data_type +
    * optional format_source). */
  final case class FieldSpec(name: String, dataType: String,
                             formatSource: Option[String] = None)

  /** Parsed schema config: ordered `old_name → spec` pairs (order defines
    * the output column order, like the reference's dict iteration). */
  final case class SchemaConfig(fields: Seq[(String, FieldSpec)])

  private def fieldColumn(oldName: String, spec: FieldSpec): Column = {
    require(spec.name.nonEmpty && spec.dataType.nonEmpty,
      s"Missing 'name' or 'data_type' for column '$oldName' in schema config")
    if (spec.dataType.equalsIgnoreCase("date")) {
      val fmt = spec.formatSource.getOrElse(sys.error(
        s"Parameter 'format_source' was not found in the params of '$oldName' column"))
      val parsed =
        if (fmt.equalsIgnoreCase("yyyy-mm-qq")) Dates.repairHalfMonth(col(oldName))
        else to_date(col(oldName), fmt)
      parsed.as(spec.name)
    } else col(oldName).cast(spec.dataType.toLowerCase).as(spec.name)
  }

  /** Apply the config: ONE projection casting + renaming every configured
    * column (`schemas.py:31-61`). */
  def schemasValidation(df: DataFrame, config: SchemaConfig): DataFrame =
    df.select(config.fields.map { case (o, s) => fieldColumn(o, s) }: _*)

  /** Convenience form taking the raw `(old → (name, type, format?))` triple
    * map the reference stores in YAML config. */
  def schemasValidation(df: DataFrame,
                        fields: Seq[(String, (String, String, Option[String]))]): DataFrame =
    schemasValidation(df, SchemaConfig(fields.map { case (o, (n, t, f)) =>
      o -> FieldSpec(n, t, f)
    }))
}
