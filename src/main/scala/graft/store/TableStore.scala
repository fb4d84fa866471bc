package graft.store

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Delta-less table store: Delta-like observable semantics on plain Parquet
  * (SURVEY §7.4). Layout:
  *
  * {{{
  *   <root>/<table>/v=N/part-*.parquet   — immutable snapshot per version
  *   <root>/<table>/_meta.json           — version log + schema + PKs + props
  * }}}
  *
  * Reference semantics delivered:
  *  - upsert-by-PK (`notebooks/utils.py:1748-1758` MERGE) = union incoming
  *    with current, window-dedup by PK preferring the incoming row — ONE
  *    shuffle on the PK, no join blowup, scales with data volume;
  *  - schema evolution mergeSchema/overwriteSchema (`utils.py:1694-1737`);
  *  - time travel: read version N-1 (`monitor.py:57-71`);
  *  - replaceWhere partition-scoped overwrite (`storage_operations.py:161-202`);
  *  - OPTIMIZE-style compaction (`utils.py:1761-1767`) = repartition rewrite;
  *  - TBLPROPERTIES (`utils.py:1440-1504`) = key/values in _meta.json.
  *
  * Scale note: snapshots are written with the caller's partitioning; the
  * upsert path shuffles once on the primary keys — at cluster scale the
  * natural upgrade is bucketed snapshots so consecutive upserts reuse the
  * same hash partitioning; the layout (dir-per-version) maps 1:1 onto an
  * object store.
  */
final class TableStore(spark: SparkSession, root: String) {

  private def tableDir(table: String): Path = Paths.get(root, table)
  private def versionDir(table: String, v: Int): Path =
    tableDir(table).resolve(s"v=$v")
  private def metaPath(table: String): Path = tableDir(table).resolve("_meta.json")

  // ------------------------------------------------------------- metadata

  import TableStore.Meta

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def writeMeta(table: String, m: Meta): Unit = {
    val props = m.properties.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    val json =
      s"""{"version":${m.version},"schemaJson":"${esc(m.schemaJson)}",
         |"primaryKeys":[${m.primaryKeys.map(k => s""""${esc(k)}"""").mkString(",")}],
         |"timestampKeys":[${m.timestampKeys.map(k => s""""${esc(k)}"""").mkString(",")}],
         |"description":"${esc(m.description)}","properties":$props}""".stripMargin.replace("\n", "")
    Files.createDirectories(tableDir(table))
    Files.writeString(metaPath(table), json)
  }

  /** Parse _meta.json via Spark's JSON reader (no external JSON dep). */
  def meta(table: String): Option[Meta] = {
    val p = metaPath(table)
    if (!Files.exists(p)) None
    else {
      import spark.implicits._
      val row = spark.read
        .schema("version INT, schemaJson STRING, primaryKeys ARRAY<STRING>, " +
          "timestampKeys ARRAY<STRING>, description STRING, properties MAP<STRING,STRING>")
        .json(Seq(Files.readString(p)).toDS()).first()
      Some(Meta(
        row.getAs[Int]("version"),
        row.getAs[String]("schemaJson"),
        Option(row.getAs[scala.collection.Seq[String]]("primaryKeys")).map(_.toSeq).getOrElse(Nil),
        Option(row.getAs[scala.collection.Seq[String]]("timestampKeys")).map(_.toSeq).getOrElse(Nil),
        Option(row.getAs[String]("description")).getOrElse(""),
        Option(row.getAs[scala.collection.Map[String, String]]("properties")).map(_.toMap).getOrElse(Map.empty)))
    }
  }

  def exists(table: String): Boolean = meta(table).isDefined

  def setProperties(table: String, props: Map[String, String]): Unit = {
    val m = meta(table).getOrElse(sys.error(s"no such table: $table"))
    // metadata-delta minimization (utils.py:1482-1487): only rewrite on change
    if (props.toSet.subsetOf(m.properties.toSet)) ()
    else writeMeta(table, m.copy(properties = m.properties ++ props))
  }

  // ----------------------------------------------------------------- read

  def read(table: String): DataFrame = {
    val m = meta(table).getOrElse(sys.error(s"no such table: $table"))
    readVersion(table, m.version)
  }

  /** Time travel (S13): read any retained snapshot. */
  def readVersion(table: String, version: Int): DataFrame =
    spark.read.parquet(versionDir(table, version).toString)

  def currentVersion(table: String): Int =
    meta(table).map(_.version).getOrElse(-1)

  // ---------------------------------------------------------------- write

  /** S7 — overwrite write with schema-evolution policy. A new immutable
    * version dir is written; the previous version stays readable (time
    * travel) until compaction prunes it. */
  def overwrite(table: String, df: DataFrame,
                primaryKeys: Seq[String] = Nil, timestampKeys: Seq[String] = Nil,
                description: String = "", mergeSchema: Boolean = false,
                overwriteSchema: Boolean = false,
                expectedVersion: Option[Int] = None): Unit = {
    val current = meta(table)
    checkExpected(table, current.map(_.version), expectedVersion)
    val out = current match {
      case Some(m) =>
        val d = SchemaDiff.diff(m.schema, df.schema)
        if (d.isCompatible || overwriteSchema) df
        else if (mergeSchema) {
          // Delta `mergeSchema` overwrite semantics (`utils.py:1694-1737`):
          // the final schema is the UNION of stored and incoming — new
          // columns are appended, stored columns absent from the incoming
          // frame are kept and null-padded; type changes are never allowed
          // under mergeSchema (overwriteSchema is the only escape hatch).
          if (d.typeChanged.nonEmpty)
            sys.error(s"type changes on $table require overwriteSchema (${d.describe})")
          val padded = d.missingColumns.foldLeft(df) { (acc, c) =>
            acc.withColumn(c, lit(null).cast(m.schema(c).dataType))
          }
          padded.select((m.schema.fieldNames.toSeq ++ d.newColumns).map(col): _*)
        } else
          sys.error(s"schema mismatch for $table (${d.describe}); pass mergeSchema or overwriteSchema")
      case None => df
    }
    val v = current.map(_.version + 1).getOrElse(0)
    out.write.mode("overwrite").parquet(versionDir(table, v).toString)
    writeMeta(table, Meta(v, out.schema.json,
      if (primaryKeys.nonEmpty) primaryKeys else current.map(_.primaryKeys).getOrElse(Nil),
      if (timestampKeys.nonEmpty) timestampKeys else current.map(_.timestampKeys).getOrElse(Nil),
      if (description.nonEmpty) description else current.map(_.description).getOrElse(""),
      current.map(_.properties).getOrElse(Map.empty)))
  }

  /** S8 — upsert by primary key (MERGE whenMatchedUpdate +
    * whenNotMatchedInsert, `utils.py:1748-1758`): current ∪ incoming →
    * one window-dedup on the PK preferring the incoming row. Missing
    * columns on either side are null-padded (implicit ALTER ADD COLUMNS,
    * `utils.py:1727-1737`). Idempotent: replaying a batch yields the same
    * table. */
  def upsert(table: String, df: DataFrame, primaryKeys: Seq[String] = Nil,
             expectedVersion: Option[Int] = None): Unit = {
    meta(table) match {
      case None =>
        require(primaryKeys.nonEmpty, "first write needs primaryKeys")
        checkExpected(table, None, expectedVersion)
        overwrite(table, df, primaryKeys)
      case Some(m) =>
        checkExpected(table, Some(m.version), expectedVersion)
        val pks = if (primaryKeys.nonEmpty) primaryKeys else m.primaryKeys
        require(pks.nonEmpty, s"$table has no primary keys; cannot upsert")
        val current = read(table).withColumn("__src", lit(0))
        val incoming = df.withColumn("__src", lit(1))
        val unioned = current.unionByName(incoming, allowMissingColumns = true)
        // Tiebreak by a content hash of the non-key columns so that a batch
        // containing the same PK twice resolves deterministically (Delta
        // MERGE would fail on multiple matches; we pick a stable winner and
        // replays stay idempotent).
        val dataCols = unioned.columns.filterNot(c => c == "__src" || pks.contains(c))
        val w = Window.partitionBy(pks.map(col): _*)
          .orderBy(col("__src").desc, xxhash64(dataCols.map(col): _*).desc)
        val merged = unioned
          .withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1)
          .drop("__src", "__rn")
        val v = m.version + 1
        merged.write.mode("overwrite").parquet(versionDir(table, v).toString)
        writeMeta(table, m.copy(version = v, schemaJson = merged.schema.json))
    }
  }

  /** S9 — replaceWhere: rewrite only the rows NOT matching the predicate,
    * union the incoming batch (partition-scoped overwrite semantics,
    * `storage_operations.py:161-202`). */
  def replaceWhere(table: String, df: DataFrame, predicate: String): Unit = {
    val m = meta(table).getOrElse(sys.error(s"no such table: $table"))
    val kept = read(table).where(s"NOT ($predicate)")
    val out = kept.unionByName(df, allowMissingColumns = true)
    val v = m.version + 1
    out.write.mode("overwrite").parquet(versionDir(table, v).toString)
    writeMeta(table, m.copy(version = v, schemaJson = out.schema.json))
  }

  /** S12 — compaction: rewrite current version with `n` files and prune
    * versions older than `retain`. */
  def compact(table: String, n: Int = 1, retain: Int = 2): Unit = {
    val m = meta(table).getOrElse(sys.error(s"no such table: $table"))
    val v = m.version + 1
    read(table).repartition(n).write.mode("overwrite").parquet(versionDir(table, v).toString)
    writeMeta(table, m.copy(version = v))
    val dir = tableDir(table)
    Files.list(dir).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("v="))
      .filter(p => p.getFileName.toString.drop(2).toInt <= v - retain)
      .foreach(deleteRecursively)
  }

  /** Optimistic concurrency (the Delta `txnVersion` face): a writer that
    * read version V passes `expectedVersion = Some(V)` (or None for a
    * fresh table via -1 semantics) and the write fails instead of silently
    * clobbering a concurrent writer's snapshot. Callers that don't care
    * pass None and keep last-writer-wins. */
  private def checkExpected(table: String, actual: Option[Int],
                            expected: Option[Int]): Unit =
    expected.foreach { e =>
      val a = actual.getOrElse(-1)
      if (a != e)
        throw new java.util.ConcurrentModificationException(
          s"$table: expected version $e but found $a (concurrent write)")
    }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) Files.list(p).iterator().asScala.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}

object TableStore {
  final case class Meta(
      version: Int,
      schemaJson: String,
      primaryKeys: Seq[String],
      timestampKeys: Seq[String],
      description: String,
      properties: Map[String, String]) {
    def schema: StructType = DataType.fromJson(schemaJson).asInstanceOf[StructType]
  }
}

/** The feature-store face of [[TableStore]]: validate → save → register,
  * the `FeatureStoreManager.save` flow (`notebooks/utils.py:1919-2046`)
  * with the interactive TimedInput gate replaced by an explicit policy
  * (SURVEY §7.5 non-goal). */
object FeatureStore {
  sealed trait MissingColumnPolicy
  case object FailOnMissing extends MissingColumnPolicy
  case object IgnoreMissing extends MissingColumnPolicy

  final case class SaveReport(table: String, version: Int, diff: Option[SchemaDiff])

  def save(store: TableStore, table: String, df: DataFrame,
           primaryKeys: Seq[String], timestampKeys: Seq[String],
           description: String = "", forceOverwrite: Boolean = false,
           overwriteSchema: Boolean = false,
           policy: MissingColumnPolicy = FailOnMissing): SaveReport = {
    val diff = store.meta(table).map(m => SchemaDiff.diff(m.schema, df.schema))
    diff.foreach { d =>
      if (d.missingColumns.nonEmpty && policy == FailOnMissing && !overwriteSchema)
        sys.error(s"missing columns on save of $table: ${d.missingColumns.mkString(", ")}")
      if (d.hasTypeChanges && !overwriteSchema)
        sys.error(s"type changes on save of $table: ${d.describe}")
    }
    if (forceOverwrite || !store.exists(table))
      store.overwrite(table, df, primaryKeys, timestampKeys, description,
        mergeSchema = true, overwriteSchema = overwriteSchema)
    else
      store.upsert(table, df, primaryKeys)
    store.setProperties(table, Map(
      "graft.primaryKeys" -> primaryKeys.mkString(","),
      "graft.timestampKeys" -> timestampKeys.mkString(","),
      "graft.description" -> description))
    SaveReport(table, store.currentVersion(table), diff)
  }
}
