package graft.store

import org.apache.spark.sql.types.StructType

/** Schema diff classification, mirroring `_validate_schema`
  * (`/root/reference/notebooks/utils.py:1510-1599`): incoming vs stored
  * schemas are compared by field name and `simpleString` type, producing
  * NEW_COLUMNS / MISSING_COLUMNS / DATA_TYPE_CHANGED buckets that drive the
  * evolution policy on save.
  */
final case class SchemaDiff(
    newColumns: Seq[String],
    missingColumns: Seq[String],
    typeChanged: Seq[(String, String, String)]) { // (name, stored, incoming)
  def isCompatible: Boolean = newColumns.isEmpty && missingColumns.isEmpty && typeChanged.isEmpty
  def hasTypeChanges: Boolean = typeChanged.nonEmpty
  def describe: String = {
    val parts = Seq(
      if (newColumns.nonEmpty) Some(s"NEW_COLUMNS: ${newColumns.mkString(", ")}") else None,
      if (missingColumns.nonEmpty) Some(s"MISSING_COLUMNS: ${missingColumns.mkString(", ")}") else None,
      if (typeChanged.nonEmpty)
        Some(s"DATA_TYPE_CHANGED: ${typeChanged.map { case (n, o, i) => s"$n($o->$i)" }.mkString(", ")}")
      else None).flatten
    if (parts.isEmpty) "COMPATIBLE" else parts.mkString("; ")
  }
}

object SchemaDiff {
  /** Compare by name + dataType.simpleString (`utils.py:1560-1567`). */
  def diff(stored: StructType, incoming: StructType): SchemaDiff = {
    val storedTypes = stored.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val incomingTypes = incoming.fields.map(f => f.name -> f.dataType.simpleString).toMap
    SchemaDiff(
      newColumns = incoming.fieldNames.filterNot(storedTypes.contains).toSeq,
      missingColumns = stored.fieldNames.filterNot(incomingTypes.contains).toSeq,
      typeChanged = stored.fields.collect {
        case f if incomingTypes.get(f.name).exists(_ != f.dataType.simpleString) =>
          (f.name, f.dataType.simpleString, incomingTypes(f.name))
      }.toSeq)
  }
}
