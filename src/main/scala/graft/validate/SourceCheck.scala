package graft.validate

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.store.TableStore

/** Source-table validation battery: format / existence / non-empty /
  * readability probes over the declared source tables, run BEFORE any
  * pipeline logic so a broken source fails fast with every problem listed —
  * the reference's `validate_database_and_table`
  * (`notebooks/utils.py:1174-1291`).
  *
  * Semantics preserved:
  *  - names must be `database.table` with both parts non-empty and
  *    alphanumeric/underscore (`utils.py:1219-1253`);
  *  - database and table must exist in the catalog (`utils.py:1256-1262`);
  *  - a table with zero columns is "full empty" (`utils.py:1271-1273`);
  *  - readability is probed with `limit(1).collect()` (`utils.py:1277-1283`);
  *  - ALL failures are aggregated into one exception message
  *    (`utils.py:1285-1290`); on success the cleaned (trimmed) names are
  *    returned.
  *
  * Scale: pure catalog metadata except the 1-row read probe — O(tables)
  * driver work, no data scan.
  */
object SourceCheck {

  private val namePart = "^[A-Za-z0-9_]+$".r

  /** Validate `database.table` names against the session catalog. */
  def validateDatabaseAndTable(spark: SparkSession, dbTables: Seq[String]): Seq[String] = {
    val errors = Seq.newBuilder[String]
    val validated = Seq.newBuilder[String]
    dbTables.foreach { raw =>
      val parts = raw.split("\\.", -1).map(_.trim)
      if (parts.length != 2 || parts.exists(_.isEmpty))
        errors += s"For '$raw', input format is incorrect. Please use 'database.table' format."
      else if (!parts.forall(p => namePart.matches(p)))
        errors += s"For '$raw', input format is incorrect. No alphanumeric characters are in your table or database name."
      else {
        val Array(db, table) = parts
        val qualified = s"$db.$table"
        if (!spark.catalog.databaseExists(db))
          errors += s"For '$raw', database '$db' does not exist."
        else if (!spark.catalog.tableExists(qualified))
          errors += s"For '$raw', table '$table' does not exist in database '$db'."
        else if (spark.table(qualified).columns.isEmpty)
          errors += s"For '$raw', is full empty and has no columns"
        else {
          try {
            spark.table(qualified).limit(1).collect()
            validated += qualified
          } catch {
            case scala.util.control.NonFatal(_) =>
              errors += s"For '$raw', no read permission were given"
          }
        }
      }
    }
    raiseOrReturn(errors.result(), validated.result())
  }

  /** Same battery over graft's path-backed [[TableStore]]: existence,
    * non-empty schema, and a 1-row read probe. */
  def validateStoreTables(store: TableStore, tables: Seq[String]): Seq[String] = {
    val errors = Seq.newBuilder[String]
    val validated = Seq.newBuilder[String]
    tables.map(_.trim).foreach { t =>
      if (t.isEmpty || !namePart.matches(t))
        errors += s"For '$t', input format is incorrect. Table names are alphanumeric."
      else if (!store.exists(t))
        errors += s"For '$t', table does not exist in the store."
      else {
        val df = store.read(t)
        if (df.columns.isEmpty) errors += s"For '$t', is full empty and has no columns"
        else {
          try { df.limit(1).collect(); validated += t }
          catch { case scala.util.control.NonFatal(_) =>
            errors += s"For '$t', table is not readable" }
        }
      }
    }
    raiseOrReturn(errors.result(), validated.result())
  }

  /** Pre-flight for [[graft.pipelines.Runner]]: every required source key is
    * present and its frame has a usable (non-empty) schema. */
  def requireSources(sources: Map[String, DataFrame], required: Seq[String]): Unit = {
    val errors = required.flatMap { name =>
      sources.get(name) match {
        case None => Some(s"For '$name', source is not provided.")
        case Some(df) if df.columns.isEmpty => Some(s"For '$name', is full empty and has no columns")
        case _ => None
      }
    }
    raiseOrReturn(errors, ())
  }

  private def raiseOrReturn[A](errors: Seq[String], ok: => A): A = {
    if (errors.nonEmpty)
      throw new IllegalArgumentException(
        "Error validating the following source_tables:\n\t- " + errors.mkString("\n\t- "))
    ok
  }
}
