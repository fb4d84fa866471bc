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
  *
  * == Concurrency contract (multi-writer, r15) ==
  *
  * Writes commit through ONE meta-pointer file per table, so the unit of
  * isolation is the TABLE:
  *
  *  - '''Same JVM''' (two streaming gates, two threads, two TableStore
  *    instances over the same root): every mutating op serializes on a
  *    process-wide (normalized root, table) monitor — concurrent writers
  *    to the SAME table interleave safely (each sees the other's commit;
  *    no lost update), and writers to different tables don't contend.
  *    This is the two-foreachBatch-gates-one-Spark-app case: gates may
  *    share a store as long as their TABLES are disjoint (they are — each
  *    gate owns its index/clean/seedlog prefix), and even a misconfigured
  *    shared table degrades to serialized commits, not corruption.
  *  - '''Cross process''': the monitor cannot reach another JVM. Each
  *    commit re-reads the meta pointer under the lock immediately before
  *    writing it and FAILS FAST (`ConcurrentModificationException`) when
  *    the version moved since the op read it — a lost update is detected,
  *    not silently absorbed. The residual window (two processes writing
  *    the same `v=N+1` dir before either commits) is not defensible on a
  *    plain filesystem without atomic rename-based logs; the operating
  *    contract is therefore ONE WRITING PROCESS PER STORE ROOT (readers
  *    unlimited — snapshots are immutable). `expectedVersion` remains the
  *    caller-level optimistic-CAS face on overwrite/upsert.
  */
final class TableStore(spark: SparkSession, root: String) {

  /** Process-wide write serialization + commit-time lost-update detection
    * — see the class-doc concurrency contract. */
  private def withWriteLock[T](table: String)(body: => T): T = {
    val key = Paths.get(root).toAbsolutePath.normalize.toString + "#" + table
    TableStore.writeLocks.computeIfAbsent(key, _ => new Object)
      .synchronized(body)
  }

  /** Fail fast when the on-disk meta pointer moved between this op's
    * entry read and its commit — a concurrent writer in ANOTHER process
    * (same-process writers are excluded by the lock). */
  private def commitGuard(table: String, readVersion: Option[Int]): Unit = {
    val now = meta(table).map(_.version)
    if (now != readVersion)
      throw new java.util.ConcurrentModificationException(
        s"$table: version moved ${readVersion.getOrElse(-1)} -> " +
          s"${now.getOrElse(-1)} during this write — a concurrent writer " +
          "in another process committed first; re-read and retry (the " +
          "contract is one writing process per store root)")
  }

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
         |"buckets":${m.buckets},
         |"partitionCols":[${m.partitionCols.map(k => s""""${esc(k)}"""").mkString(",")}],
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
          "timestampKeys ARRAY<STRING>, buckets INT, partitionCols ARRAY<STRING>, " +
          "description STRING, properties MAP<STRING,STRING>")
        .json(Seq(Files.readString(p)).toDS()).first()
      Some(Meta(
        row.getAs[Int]("version"),
        row.getAs[String]("schemaJson"),
        Option(row.getAs[scala.collection.Seq[String]]("primaryKeys")).map(_.toSeq).getOrElse(Nil),
        Option(row.getAs[scala.collection.Seq[String]]("timestampKeys")).map(_.toSeq).getOrElse(Nil),
        Option(row.getAs[java.lang.Integer]("buckets")).fold(0)(_.intValue),
        Option(row.getAs[String]("description")).getOrElse(""),
        Option(row.getAs[scala.collection.Map[String, String]]("properties")).map(_.toMap).getOrElse(Map.empty),
        Option(row.getAs[scala.collection.Seq[String]]("partitionCols")).map(_.toSeq).getOrElse(Nil)))
    }
  }

  def exists(table: String): Boolean = meta(table).isDefined

  def setProperties(table: String, props: Map[String, String]): Unit =
    withWriteLock(table) {
      val m = meta(table).getOrElse(sys.error(s"no such table: $table"))
      // metadata-delta minimization (utils.py:1482-1487): only rewrite on change
      if (props.toSet.subsetOf(m.properties.toSet)) ()
      else writeMeta(table, m.copy(properties = m.properties ++ props))
    }

  // ----------------------------------------------------------------- read

  def read(table: String): DataFrame = {
    val m = meta(table).getOrElse(sys.error(s"no such table: $table"))
    readVersionWith(table, m.version, m.buckets)
  }

  /** Time travel (S13): read any retained snapshot. Bucketed snapshots are
    * read through their catalog entry so the scan reports the PK hash
    * partitioning (falls back to the path when the catalog entry is gone,
    * e.g. a fresh session over an existing store — data is identical, only
    * the co-location metadata is lost). */
  def readVersion(table: String, version: Int): DataFrame =
    readVersionWith(table, version, meta(table).map(_.buckets).getOrElse(0))

  private def readVersionWith(table: String, version: Int, buckets: Int): DataFrame = {
    val cat = catalogName(table, version)
    if (buckets > 0 && spark.catalog.tableExists(cat)) spark.table(cat)
    else spark.read.parquet(versionDir(table, version).toString)
  }

  /** Append-only log write: current ∪ rows as a new snapshot version
    * (creates the table on first call). NOTE this is a snapshot store —
    * "append" rewrites the table; intended for validation/monitoring logs
    * (rows per run, not data volume). For data-volume appends use
    * [[appendFiles]]. */
  def append(table: String, df: DataFrame): Unit = withWriteLock(table) {
    if (exists(table)) overwrite(table, read(table).unionByName(df))
    else overwrite(table, df)
  }

  /** FILE-LEVEL append: the new snapshot version is hardlinks of every
    * previous data file plus `df`'s files written alongside — O(batch)
    * data written + O(files) inode links, never a table rewrite (the
    * [[append]] above unions-and-rewrites; [[upsert]] rewrites too). This
    * is the log-structured form a per-trigger streaming ingest needs:
    * measured r13 (`datagen.StreamAnchor` at sf1), the containment ingest
    * gate's per-trigger cost was INDEX-sized under upsert re-seeding
    * (~32–48 s per 10k-doc trigger, growing with the accumulated corpus)
    * because every trigger rewrote the corpus-sized postings/grams
    * snapshots.
    *
    * Contract: plain or hive-partitioned snapshots (bucketed layouts
    * carry catalog file metadata — they upsert); the incoming schema must
    * match the stored schema exactly (mixed-schema files in one version
    * dir corrupt reads); and THE CALLER OWNS PK UNIQUENESS — this op does
    * not dedup, so an at-least-once replay appends duplicate rows (guard
    * replays, or make consumers duplicate-tolerant). File count grows per
    * append; [[compact]] reconciles (layout-preserving). Time travel is
    * preserved: hardlinked files survive source-version pruning via inode
    * refcounts, exactly like [[replacePartitions]].
    *
    * Hive-partitioned form (r15, the streaming-IVF ingest shape): every
    * previous partition dir's files are hardlinked into the matching new
    * dir and the batch appends with `partitionBy` — O(batch) data +
    * O(files) links, partition pruning intact, untouched partitions share
    * inodes with the previous version. Contrast [[replacePartitions]],
    * which REPLACES the touched partitions' contents. */
  def appendFiles(table: String, df: DataFrame): Unit = withWriteLock(table) {
    val m = meta(table).getOrElse(sys.error(s"no such table: $table"))
    require(m.buckets == 0,
      s"$table: appendFiles supports plain or hive-partitioned snapshots; " +
        "bucketed tables upsert (catalog-registered file layout)")
    val d = SchemaDiff.diff(m.schema, df.schema)
    require(d.isCompatible,
      s"$table: appendFiles needs the stored schema exactly (${d.describe})")
    val v = m.version + 1
    val newDir = versionDir(table, v)
    val oldDir = versionDir(table, m.version)
    // clobber any uncommitted v=N dir first — a crashed appendFiles
    // leaves partial hardlinks (a retry's createLink would throw
    // FileAlreadyExists), and a crashed OVERWRITE leaves orphan rows
    // that mode("append") below would silently commit; every other
    // writer gets this for free from mode("overwrite") (r13 review
    // finding; see the StoreSpec crash-consistency test)
    if (Files.exists(newDir)) deleteRecursively(newDir)
    Files.createDirectories(newDir)
    // hardlink the previous version's data files, preserving any hive
    // partition dir structure (walk stops at regular files)
    def linkInto(src: Path, dst: Path): Unit =
      Files.list(src).iterator().asScala.foreach { f =>
        val name = f.getFileName.toString
        if (Files.isDirectory(f) && name.contains("=")) {
          val sub = dst.resolve(name)
          Files.createDirectories(sub)
          linkInto(f, sub)
        } else if (Files.isRegularFile(f) && !name.startsWith("_"))
          Files.createLink(dst.resolve(name), f)
      }
    linkInto(oldDir, newDir)
    // column order normalized to the stored schema; writer part-file names
    // are UUID-fresh, so they never collide with the linked files
    val out = df.select(m.schema.fieldNames.toIndexedSeq.map(col): _*)
    if (m.partitionCols.nonEmpty)
      out.write.mode("append").partitionBy(m.partitionCols: _*)
        .parquet(newDir.toString)
    else out.write.mode("append").parquet(newDir.toString)
    commitGuard(table, Some(m.version))
    writeMeta(table, m.copy(version = v))
  }

  /** Catalog identifier for a bucketed snapshot — scoped by a store-root
    * hash so stores over different temp dirs don't collide in a shared
    * session catalog. */
  private def catalogName(table: String, version: Int): String =
    f"graft_${math.abs(root.hashCode)}%x_${table}_v$version"

  /** Write one immutable snapshot. With `buckets > 0` the snapshot is a
    * catalog-registered EXTERNAL bucketed table at the version dir: the
    * files stay in the store layout, and readers via [[readVersion]] get a
    * scan whose output partitioning is `hash(pks) % buckets` — so the next
    * upsert's window/anti-join over the STORED side needs no Exchange.
    * That is the production pattern for a 100 TB feature table: the big
    * side is written hash-placed once and every later merge only shuffles
    * the incoming batch.
    *
    * `shuffleToBuckets` controls file layout, NOT correctness: the bucketed
    * writer splits every task's rows into per-bucket files regardless of
    * input partitioning. The initial overwrite pre-shuffles (one file per
    * bucket — it is paying its one full shuffle anyway); the UPSERT path
    * passes false so the already-hash-placed stored side streams straight
    * to the writer and only the incoming batch has shuffled — otherwise
    * the write would re-shuffle the whole table and undo the anti-join
    * topology's point. Extra per-task bucket files are reconciled by
    * [[compact]]. */
  private def writeSnapshot(table: String, df: DataFrame, v: Int,
                            buckets: Int, pks: Seq[String],
                            shuffleToBuckets: Boolean = true,
                            partitionCols: Seq[String] = Nil): Unit = {
    if (buckets > 0 && pks.nonEmpty) {
      val in = if (shuffleToBuckets) df.repartition(buckets, pks.map(col): _*) else df
      in.write.mode("overwrite").format("parquet")
        .option("path", versionDir(table, v).toString)
        .bucketBy(buckets, pks.head, pks.tail: _*)
        .sortBy(pks.head, pks.tail: _*)
        .saveAsTable(catalogName(table, v))
    } else if (partitionCols.nonEmpty)
      // hive-layout snapshot: reads prune partition dirs on the partition
      // predicate (the date-partitioned 100 TB feature-table layout)
      df.write.mode("overwrite").partitionBy(partitionCols: _*)
        .parquet(versionDir(table, v).toString)
    else df.write.mode("overwrite").parquet(versionDir(table, v).toString)
  }

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
                expectedVersion: Option[Int] = None,
                buckets: Int = 0, partitionBy: Seq[String] = Nil): Unit =
    withWriteLock(table) {
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
    val pks = if (primaryKeys.nonEmpty) primaryKeys else current.map(_.primaryKeys).getOrElse(Nil)
    val nb = if (buckets > 0) buckets else current.map(_.buckets).getOrElse(0)
    val pcols = if (partitionBy.nonEmpty) partitionBy else current.map(_.partitionCols).getOrElse(Nil)
    require(nb == 0 || pcols.isEmpty,
      s"$table: bucketed and hive-partitioned layouts are mutually exclusive")
    writeSnapshot(table, out, v, nb, pks, partitionCols = pcols)
    commitGuard(table, current.map(_.version))
    writeMeta(table, Meta(v, out.schema.json, pks,
      if (timestampKeys.nonEmpty) timestampKeys else current.map(_.timestampKeys).getOrElse(Nil),
      nb,
      if (description.nonEmpty) description else current.map(_.description).getOrElse(""),
      current.map(_.properties).getOrElse(Map.empty),
      pcols))
    }

  /** S8 — upsert by primary key (MERGE whenMatchedUpdate +
    * whenNotMatchedInsert, `utils.py:1748-1758`): current ∪ incoming →
    * one window-dedup on the PK preferring the incoming row. Missing
    * columns on either side are null-padded (implicit ALTER ADD COLUMNS,
    * `utils.py:1727-1737`). Idempotent: replaying a batch yields the same
    * table. */
  def upsert(table: String, df: DataFrame, primaryKeys: Seq[String] = Nil,
             expectedVersion: Option[Int] = None): Unit = withWriteLock(table) {
    meta(table) match {
      case None =>
        require(primaryKeys.nonEmpty, "first write needs primaryKeys")
        checkExpected(table, None, expectedVersion)
        overwrite(table, df, primaryKeys)
      case Some(m) =>
        checkExpected(table, Some(m.version), expectedVersion)
        val pks = if (primaryKeys.nonEmpty) primaryKeys else m.primaryKeys
        require(pks.nonEmpty, s"$table has no primary keys; cannot upsert")
        val merged = mergedForUpsert(table, df, pks, m)
        val v = m.version + 1
        writeSnapshot(table, merged, v, m.buckets, pks, shuffleToBuckets = false,
          partitionCols = m.partitionCols)
        commitGuard(table, Some(m.version))
        writeMeta(table, m.copy(version = v, schemaJson = merged.schema.json))
    }
  }

  /** Build the post-merge frame for an upsert (exposed for plan-shape
    * specs). Two formulations with identical semantics — prefer the
    * incoming row per PK, tiebreak within a batch by a content hash so
    * replays stay idempotent (Delta MERGE would fail on multiple matches):
    *
    *  - unbucketed: union-tag + one window over the whole union (ONE
    *    shuffle of current ∪ incoming);
    *  - bucketed: dedup only the incoming batch (one shuffle of the BATCH),
    *    left-anti the bucketed current against it (bucketed scan already
    *    hash-placed on the PK → no Exchange on the stored side), union.
    *    At 100 TB this is the difference between shuffling the table and
    *    shuffling the day's increment. */
  private[graft] def mergedForUpsert(table: String, df: DataFrame,
                                     pks: Seq[String], m: Meta): DataFrame = {
    if (m.buckets > 0) {
      val current = read(table)
      // implicit ALTER ADD COLUMNS on both sides (utils.py:1727-1737)
      val curTypes = current.schema.map(f => f.name -> f.dataType).toMap
      val incTypes = df.schema.map(f => f.name -> f.dataType).toMap
      val allCols = (current.columns ++ df.columns.filterNot(curTypes.contains)).toSeq
      def pad(d: DataFrame, types: Map[String, org.apache.spark.sql.types.DataType]) =
        allCols.foldLeft(d) { (acc, c) =>
          if (acc.columns.contains(c)) acc else acc.withColumn(c, lit(null).cast(types(c)))
        }.select(allCols.map(col): _*)
      val dataCols = allCols.filterNot(pks.contains)
      val w = Window.partitionBy(pks.map(col): _*)
        .orderBy(xxhash64(dataCols.map(col): _*).desc)
      val incDedup = pad(df, curTypes)
        .repartition(m.buckets, pks.map(col): _*)
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1).drop("__rn")
      pad(current, incTypes)
        .join(incDedup.select(pks.map(col): _*), pks, "left_anti")
        .unionByName(incDedup)
    } else {
      val current = read(table).withColumn("__src", lit(0))
      val incoming = df.withColumn("__src", lit(1))
      val unioned = current.unionByName(incoming, allowMissingColumns = true)
      val dataCols = unioned.columns.filterNot(c => c == "__src" || pks.contains(c))
      val w = Window.partitionBy(pks.map(col): _*)
        .orderBy(col("__src").desc, xxhash64(dataCols.toIndexedSeq.map(col): _*).desc)
      unioned
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .drop("__src", "__rn")
    }
  }

  /** S9 — replaceWhere: rewrite only the rows NOT matching the predicate,
    * union the incoming batch (partition-scoped overwrite semantics,
    * `storage_operations.py:161-202`). */
  def replaceWhere(table: String, df: DataFrame, predicate: String): Unit =
    withWriteLock(table) {
      val m = meta(table).getOrElse(sys.error(s"no such table: $table"))
      val kept = read(table).where(s"NOT ($predicate)")
      val out = kept.unionByName(df, allowMissingColumns = true)
      val v = m.version + 1
      writeSnapshot(table, out, v, m.buckets, m.primaryKeys)
      commitGuard(table, Some(m.version))
      writeMeta(table, m.copy(version = v, schemaJson = out.schema.json))
    }

  /** Change-data view between two snapshot versions: one row per primary
    * key whose state differs, tagged `__change` ∈ added / removed /
    * updated — the audit surface for "what did this pipeline run change"
    * (the reference eyeballs row counts per run, `monitor.py`; this is
    * the exact per-key answer). Payload equality is xxhash64 over the
    * non-PK columns of the SHARED schema (schema-evolution columns only
    * present in one version count as a difference).
    *
    * Scale: both snapshots project to (PK, 64-bit payload hash) before
    * the full-outer join — the shuffle carries ~16 bytes/row regardless
    * of row width, and on a bucketed table both sides are pre-placed so
    * the join is zero-Exchange. */
  def diffVersions(table: String, vOld: Int, vNew: Int): DataFrame = {
    val m = meta(table).getOrElse(sys.error(s"no such table: $table"))
    require(m.primaryKeys.nonEmpty, s"$table has no primary keys to diff by")
    val pks = m.primaryKeys
    // hash the SHARED payload columns (sorted, so column order is
    // irrelevant) plus a schema marker: versions with different extra
    // columns report every surviving key as updated, which is the honest
    // answer for a schema-evolution boundary
    val oldDf = readVersion(table, vOld)
    val newDf = readVersion(table, vNew)
    val shared = oldDf.columns.toSet.intersect(newDf.columns.toSet)
      .filterNot(pks.contains).toSeq.sorted
    def sideHash(df: DataFrame, as: String) = {
      val extras = df.columns.toSeq.filterNot(c => shared.contains(c) || pks.contains(c))
      // Spark's hash functions SKIP null inputs, so (a='x', b=null) and
      // (a=null, b='x') would collide for same-typed neighbors; fold a
      // per-column null indicator in so null position changes the hash
      val hashed = shared.flatMap(c => Seq(col(c), isnull(col(c)).cast("int")))
      df.select(pks.map(col) :+
        xxhash64((hashed :+ lit(extras.sorted.mkString(","))): _*).as(as): _*)
    }
    val o = sideHash(oldDf, "__h_old")
    val n = sideHash(newDf, "__h_new")
    o.join(n, pks, "full_outer")
      .withColumn("__change",
        when(col("__h_old").isNull, "added")
          .when(col("__h_new").isNull, "removed")
          .when(col("__h_old") =!= col("__h_new"), "updated"))
      .where(col("__change").isNotNull)
      .select(pks.map(col) :+ col("__change"): _*)
  }

  /** Dynamic partition overwrite: write a new snapshot version where only
    * the hive partitions PRESENT in `df` are rewritten — every untouched
    * partition's files are HARDLINKED from the previous version (inode
    * reuse, zero data copied or shuffled), which is the economics that
    * makes daily rewrites of one day inside a 100 TB date-partitioned
    * feature table viable (the [[replaceWhere]] path rewrites the whole
    * table; production lakehouses do exactly this partition-level file
    * reuse via manifests). Immutability is preserved: hardlinked files
    * survive compaction pruning the source version (inode refcount), and
    * time travel to the previous version still reads the original files.
    *
    * Partition VALUES are matched by their hive directory encoding; the
    * touched set is derived by listing the NEW version's directories
    * after the write, so it is consistent with what was actually written
    * even for a nondeterministic `df` (one evaluation, no collect), and
    * hive-escaped values (spaces etc.) match by construction — both
    * versions' dir names come from the same Spark writer encoding. */
  def replacePartitions(table: String, df: DataFrame): Unit =
    withWriteLock(table) {
    val m = meta(table).getOrElse(sys.error(s"no such table: $table"))
    require(m.partitionCols.nonEmpty,
      s"$table is not hive-partitioned; use overwrite/replaceWhere")
    require(df.columns.toSet == m.schema.fieldNames.toSet,
      s"$table: replacePartitions needs the stored schema (mixed-schema " +
        s"partitions would corrupt reads); got ${df.columns.mkString(",")}")
    val pcols = m.partitionCols
    val v = m.version + 1
    val newDir = versionDir(table, v)
    val oldDir = versionDir(table, m.version)
    df.write.mode("overwrite").partitionBy(pcols: _*).parquet(newDir.toString)
    def partitionDirs(base: Path, depth: Int): Seq[Path] =
      if (depth == 0) Seq(base)
      else Files.list(base).iterator().asScala.toSeq
        .filter(p => Files.isDirectory(p) && p.getFileName.toString.contains("="))
        .flatMap(p => partitionDirs(p, depth - 1))
    // the touched partitions, in hive dir encoding (col=value/col2=value2),
    // read back from what the writer ACTUALLY produced — a nondeterministic
    // df cannot drift between "decide touched" and "write"
    val touched = partitionDirs(newDir, pcols.size)
      .map(p => newDir.relativize(p).toString).toSet
    // hardlink every untouched partition's files from the previous version
    partitionDirs(oldDir, pcols.size).foreach { pdir =>
      val rel = oldDir.relativize(pdir).toString
      if (!touched.contains(rel)) {
        val target = newDir.resolve(rel)
        Files.createDirectories(target)
        Files.list(pdir).iterator().asScala
          .filter(f => Files.isRegularFile(f) && !f.getFileName.toString.startsWith("_"))
          .foreach(f => Files.createLink(target.resolve(f.getFileName.toString), f))
      }
    }
    commitGuard(table, Some(m.version))
    writeMeta(table, m.copy(version = v))
    }

  /** S12 — compaction: rewrite current version with `n` files and prune
    * versions older than `retain`. */
  def compact(table: String, n: Int = 1, retain: Int = 2): Unit =
    withWriteLock(table) {
    val m = meta(table).getOrElse(sys.error(s"no such table: $table"))
    val v = m.version + 1
    // bucketed tables keep their bucket count (that IS the file layout);
    // hive-partitioned tables keep their dir layout — a flat rewrite here
    // would silently break partition pruning AND the next
    // replacePartitions (which hardlinks "untouched" partitions from the
    // previous version's dirs: none exist in a flat snapshot, so every
    // untouched row would be dropped — the r15 StoreSpec regression);
    // hashing on the partition cols lands each value in one task → one
    // file per partition dir
    if (m.buckets > 0) writeSnapshot(table, read(table), v, m.buckets, m.primaryKeys)
    else if (m.partitionCols.nonEmpty)
      read(table).repartition(n, m.partitionCols.map(col): _*)
        .write.mode("overwrite").partitionBy(m.partitionCols: _*)
        .parquet(versionDir(table, v).toString)
    else read(table).repartition(n).write.mode("overwrite")
      .parquet(versionDir(table, v).toString)
    commitGuard(table, Some(m.version))
    writeMeta(table, m.copy(version = v))
    val dir = tableDir(table)
    Files.list(dir).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("v="))
      .filter(p => p.getFileName.toString.drop(2).toInt <= v - retain)
      .foreach { p =>
        spark.sql(s"DROP TABLE IF EXISTS ${catalogName(table, p.getFileName.toString.drop(2).toInt)}")
        deleteRecursively(p)
      }
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
  /** One monitor per (normalized store root, table) — plain Objects, so
    * the mapping function never computes dependent entries (CLAUDE.md
    * invariant 10b) and entries are tiny enough to live forever. */
  private val writeLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  final case class Meta(
      version: Int,
      schemaJson: String,
      primaryKeys: Seq[String],
      timestampKeys: Seq[String],
      buckets: Int,
      description: String,
      properties: Map[String, String],
      partitionCols: Seq[String] = Nil) {
    def schema: StructType = DataType.fromJson(schemaJson).asInstanceOf[StructType]
  }
}

/** The feature-store face of [[TableStore]]: validate → save → register,
  * the `FeatureStoreManager.save` flow (`notebooks/utils.py:1919-2045`)
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
