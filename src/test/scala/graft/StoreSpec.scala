package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

import graft.store.{FeatureStore, SchemaDiff, TableStore}

class StoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshStore() =
    new TableStore(spark, Files.createTempDirectory("graft_store").toString)

  test("schema diff classifies NEW / MISSING / TYPE_CHANGED") {
    val stored = StructType.fromDDL("a INT, b STRING, c DOUBLE")
    val incoming = StructType.fromDDL("a BIGINT, b STRING, d DATE")
    val d = SchemaDiff.diff(stored, incoming)
    assert(d.newColumns == Seq("d"))
    assert(d.missingColumns == Seq("c"))
    assert(d.typeChanged == Seq(("a", "int", "bigint")))
    assert(!d.isCompatible)
    assert(SchemaDiff.diff(stored, stored).isCompatible)
  }

  test("overwrite + read + versioned time travel") {
    val store = freshStore()
    store.overwrite("t", Seq((1, "x")).toDF("k", "v"), primaryKeys = Seq("k"))
    store.overwrite("t", Seq((2, "y")).toDF("k", "v"))
    assert(store.currentVersion("t") == 1)
    assert(store.read("t").as[(Int, String)].collect().toSeq == Seq((2, "y")))
    assert(store.readVersion("t", 0).as[(Int, String)].collect().toSeq == Seq((1, "x")))
  }

  test("upsert merges by PK: update matched, insert unmatched, idempotent replay") {
    val store = freshStore()
    store.overwrite("f", Seq((1, "2024-01", 10.0), (2, "2024-01", 20.0))
      .toDF("pk", "month", "feat"), primaryKeys = Seq("pk", "month"))
    val batch = Seq((2, "2024-01", 25.0), (3, "2024-01", 30.0)).toDF("pk", "month", "feat")
    store.upsert("f", batch)
    val after = store.read("f").orderBy("pk").as[(Int, String, Double)].collect().toSeq
    assert(after == Seq((1, "2024-01", 10.0), (2, "2024-01", 25.0), (3, "2024-01", 30.0)))
    // replay the same batch: same result (idempotence, SURVEY §5)
    store.upsert("f", batch)
    val replay = store.read("f").orderBy("pk").as[(Int, String, Double)].collect().toSeq
    assert(replay == after)
  }

  test("bucketed snapshots: upsert matches plain semantics and never shuffles the stored side") {
    val store = freshStore()
    val base = (1L to 400L).map(i => (i, i * 2.0)).toDF("pk", "feat")
    store.overwrite("bt", base, primaryKeys = Seq("pk"), buckets = 4)
    val batch1 = (380L to 420L).map(i => (i, i * 3.0)).toDF("pk", "feat")
    store.upsert("bt", batch1)
    val after = store.read("bt").orderBy("pk").as[(Long, Double)].collect().toSeq
    val expected = ((1L to 379L).map(i => (i, i * 2.0)) ++ (380L to 420L).map(i => (i, i * 3.0))).toSeq
    assert(after == expected)
    // the second upsert's merge plan: the stored side is read through the
    // bucketed catalog entry, so the ONLY shuffle is the incoming batch's
    // repartition — at 100 TB that is "shuffle the increment, not the table"
    val batch2 = (1L to 50L).map(i => (i, i * 5.0)).toDF("pk", "feat")
    val m = store.meta("bt").get
    val merged = store.mergedForUpsert("bt", batch2, Seq("pk"), m)
    merged.collect() // finalize THIS dataset's adaptive plan (stage reuse)
    val n = graft.ops.Scale.countExchanges(merged)
    assert(n == 1, s"expected 1 exchange (incoming only), got $n:\n" +
      merged.queryExecution.executedPlan.toString)
    // idempotent replay through the real write path, bucketing preserved
    store.upsert("bt", batch2)
    store.upsert("bt", batch2)
    assert(store.meta("bt").get.buckets == 4)
    assert(store.read("bt").count() == 420)
    assert(store.read("bt").where($"pk" === 10L).head().getDouble(1) == 50.0)
  }

  test("partitioned snapshots: reads prune partition dirs, upserts keep the layout") {
    import org.apache.spark.sql.functions._
    val store = freshStore()
    val df = (1 to 300).map(i => (i.toLong, (i % 6) + 1, i * 1.0)).toDF("id", "month", "amt")
    store.overwrite("pt", df, primaryKeys = Seq("id"), partitionBy = Seq("month"))
    // partition pruning on the store read
    val q = store.read("pt").where(col("month") === 2).select("id", "amt")
    assert(q.count() == 50)
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no file scan"))
    assert(scan.selectedPartitions.partitionCount == 1,
      scan.metadata("PartitionFilters"))
    // upsert: layout + meta survive; semantics unchanged
    store.upsert("pt", Seq((1L, 1, 999.0), (9999L, 3, 5.0)).toDF("id", "month", "amt"))
    assert(store.meta("pt").get.partitionCols == Seq("month"))
    val after = store.read("pt")
    assert(after.where(col("id") === 1L).select("amt").as[Double].head() == 999.0)
    assert(after.count() == 301)
    val scan2 = store.read("pt").where(col("month") === 3)
      .queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }.get
    assert(scan2.selectedPartitions.partitionCount == 1)
    // bucketed + partitioned is rejected
    intercept[IllegalArgumentException] {
      store.overwrite("bad", df, primaryKeys = Seq("id"),
        buckets = 4, partitionBy = Seq("month"))
    }
  }

  test("replacePartitions rewrites only touched partitions; untouched files are reused") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft_store").toString
    val store = new TableStore(spark, root)
    val df = (1L to 300L).map(i => (i, (i % 3 + 1).toInt, i * 1.0)).toDF("id", "month", "amt")
    store.overwrite("rp", df, primaryKeys = Seq("id"), partitionBy = Seq("month"))
    val v0 = store.currentVersion("rp")
    def partFiles(v: Int, month: Int) = {
      import scala.jdk.CollectionConverters._
      val d = java.nio.file.Paths.get(root, "rp", s"v=$v", s"month=$month")
      java.nio.file.Files.list(d).iterator().asScala.toSeq
        .filter(f => f.getFileName.toString.endsWith(".parquet"))
        .map(f => f.getFileName.toString -> java.nio.file.Files.getLastModifiedTime(f))
        .toMap
    }
    val m1Before = partFiles(v0, 1)
    Thread.sleep(20) // ensure a rewrite WOULD move mtimes
    val newMonth2 = Seq((9001L, 2, -1.0), (9002L, 2, -2.0)).toDF("id", "month", "amt")
    store.replacePartitions("rp", newMonth2)
    val after = store.read("rp")
    assert(after.where(col("month") === 2).count() == 2)   // replaced wholesale
    assert(after.where(col("month") === 1).count() == 100) // untouched
    assert(after.count() == 202)
    // untouched partition files in the NEW version are the SAME files
    // (hardlinks: identical names and modification times — no rewrite)
    assert(partFiles(store.currentVersion("rp"), 1) == m1Before)
    // time travel: the previous version still has the original month=2 rows
    assert(store.readVersion("rp", v0).where(col("month") === 2).count() == 100)
    // guards: schema must match, table must be partitioned
    intercept[IllegalArgumentException] {
      store.replacePartitions("rp", Seq((1L, 2)).toDF("id", "month"))
    }
    // partition values that hive escapes round-trip: the touched set is
    // listed from the writer's own dir names, so encodings always agree
    store.overwrite("rs",
      Seq((1L, "a b", 1.0), (9L, "keep me", 9.0)).toDF("id", "tag", "amt"),
      primaryKeys = Seq("id"), partitionBy = Seq("tag"))
    store.replacePartitions("rs", Seq((2L, "a b", 2.0)).toDF("id", "tag", "amt"))
    assert(store.read("rs").select("id", "tag").orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq === Seq((2L, "a b"), (9L, "keep me")))
    store.overwrite("flat", df, primaryKeys = Seq("id"))
    intercept[IllegalArgumentException] {
      store.replacePartitions("flat", newMonth2)
    }
  }

  test("diffVersions: per-key added/removed/updated between snapshots") {
    import org.apache.spark.sql.functions.col
    val store = freshStore()
    store.overwrite("cdc", Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("pk", "tag", "amt"), primaryKeys = Seq("pk"))
    // v1: update pk=2, drop pk=3, add pk=4 (replaceWhere keeps the rest)
    store.replaceWhere("cdc", Seq((2L, "b", 99.0), (4L, "d", 4.0))
      .toDF("pk", "tag", "amt"), "pk IN (2, 3)")
    val d = store.diffVersions("cdc", 0, 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(2L -> "updated", 3L -> "removed", 4L -> "added")) // pk=1 silent
  }

  test("upsert evolves schema by null-padding new columns") {
    val store = freshStore()
    store.overwrite("e", Seq((1, 1.0)).toDF("pk", "a"), primaryKeys = Seq("pk"))
    store.upsert("e", Seq((2, 2.0, "new")).toDF("pk", "a", "b"))
    val out = store.read("e").orderBy("pk").collect()
    assert(out.map(_.getAs[Any]("b")).toSeq == Seq(null, "new"))
  }

  test("overwrite mergeSchema: union schema, null-pad missing stored columns, reject type changes") {
    val store = freshStore()
    store.overwrite("m", Seq((1, "x", 1.5)).toDF("pk", "a", "b"), primaryKeys = Seq("pk"))
    // incoming drops `b`, adds `c` → merged schema keeps b (null-padded) and appends c
    store.overwrite("m", Seq((2, "y", true)).toDF("pk", "a", "c"), mergeSchema = true)
    val out = store.read("m")
    assert(out.columns.toSeq == Seq("pk", "a", "b", "c"))
    val row = out.collect().head
    assert(row.getAs[Any]("b") == null && row.getAs[Boolean]("c"))
    // type change is rejected under mergeSchema…
    val typeChanged = Seq((3, 7, 2.0)).toDF("pk", "a", "b") // a: string → int
    intercept[RuntimeException](store.overwrite("m", typeChanged, mergeSchema = true))
    // …and accepted only under overwriteSchema
    store.overwrite("m", typeChanged, overwriteSchema = true)
    assert(store.read("m").schema("a").dataType == IntegerType)
  }

  test("upsert with duplicate PKs in one batch resolves deterministically") {
    val store = freshStore()
    store.overwrite("d", Seq((1, "old")).toDF("pk", "v"), primaryKeys = Seq("pk"))
    val dupBatch = Seq((1, "b1"), (1, "b2"), (2, "n")).toDF("pk", "v")
    store.upsert("d", dupBatch)
    val first = store.read("d").orderBy("pk").as[(Int, String)].collect().toSeq
    // replay (and a reshuffled replay) must pick the same winner
    store.upsert("d", dupBatch.repartition(7))
    val replay = store.read("d").orderBy("pk").as[(Int, String)].collect().toSeq
    assert(first == replay)
    assert(first.map(_._1) == Seq(1, 2))
    assert(Set("b1", "b2").contains(first.head._2)) // incoming beats stored
  }

  test("optimistic concurrency: stale expectedVersion fails, current succeeds") {
    val store = freshStore()
    store.overwrite("oc", Seq((1, "a")).toDF("pk", "v"), primaryKeys = Seq("pk"))
    store.overwrite("oc", Seq((2, "b")).toDF("pk", "v")) // v1: someone else wrote
    // writer that read v0 must NOT clobber v1
    intercept[java.util.ConcurrentModificationException](
      store.overwrite("oc", Seq((3, "c")).toDF("pk", "v"), expectedVersion = Some(0)))
    intercept[java.util.ConcurrentModificationException](
      store.upsert("oc", Seq((3, "c")).toDF("pk", "v"), expectedVersion = Some(0)))
    assert(store.read("oc").count() == 1) // v1 intact
    // matching expectation commits
    store.upsert("oc", Seq((3, "c")).toDF("pk", "v"), expectedVersion = Some(1))
    assert(store.currentVersion("oc") == 2 && store.read("oc").count() == 2)
  }

  test("appendFiles: O(batch) file append — rows accumulate, time travel " +
      "keeps the pre-append version, layout/schema contracts enforced") {
    val store = freshStore()
    store.overwrite("af", Seq((1, "a"), (2, "b")).toDF("pk", "v"),
      primaryKeys = Seq("pk"))
    store.appendFiles("af", Seq((3, "c")).toDF("pk", "v"))
    assert(store.currentVersion("af") == 1)
    assert(store.read("af").orderBy("pk").as[(Int, String)].collect().toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c")))
    // hardlinked previous version still time-travels independently
    assert(store.readVersion("af", 0).count() == 2)
    // appends do NOT dedup — the documented caller-owns-PKs contract
    store.appendFiles("af", Seq((3, "c")).toDF("pk", "v"))
    assert(store.read("af").where($"pk" === 3).count() == 2)
    // column order is normalized to the stored schema
    store.appendFiles("af", Seq(("d", 4)).toDF("v", "pk"))
    assert(store.read("af").where($"pk" === 4).as[(Int, String)]
      .collect().toSeq == Seq((4, "d")))
    // exact-schema and plain-layout contracts fail fast
    intercept[IllegalArgumentException](
      store.appendFiles("af", Seq((5, "e", 1.0)).toDF("pk", "v", "extra")))
    store.overwrite("bk", Seq((1, "a")).toDF("pk", "v"),
      primaryKeys = Seq("pk"), buckets = 4)
    intercept[IllegalArgumentException](
      store.appendFiles("bk", Seq((2, "b")).toDF("pk", "v")))
  }

  test("appendFiles is crash-retryable and never absorbs an orphan dir") {
    val root = Files.createTempDirectory("graft_store_afc")
    val store = new TableStore(spark, root.toString)
    store.overwrite("af", Seq((1, "a")).toDF("pk", "v"), primaryKeys = Seq("pk"))
    // a crashed OVERWRITE's orphan at the next version: its phantom rows
    // must NOT ride into the committed append (mode("append") into a
    // dirty dir would keep them)
    Seq((99, "ORPHAN")).toDF("pk", "v").write
      .parquet(root.resolve("af").resolve("v=1").toString)
    store.appendFiles("af", Seq((2, "b")).toDF("pk", "v"))
    assert(store.read("af").orderBy("pk").as[(Int, String)].collect().toSeq ==
      Seq((1, "a"), (2, "b")))
    // a crashed APPENDFILES' partial hardlinks at the next version: the
    // retry must not throw FileAlreadyExists on re-linking
    import scala.jdk.CollectionConverters._
    val v1 = root.resolve("af").resolve("v=1")
    val v2 = root.resolve("af").resolve("v=2")
    Files.createDirectories(v2)
    Files.list(v1).iterator().asScala
      .filter(f => Files.isRegularFile(f) && !f.getFileName.toString.startsWith("_"))
      .take(1)
      .foreach(f => Files.createLink(v2.resolve(f.getFileName.toString), f))
    store.appendFiles("af", Seq((3, "c")).toDF("pk", "v")) // the retry
    assert(store.read("af").orderBy("pk").as[(Int, String)].collect().toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("crash consistency: a snapshot dir without the _meta.json commit is " +
      "invisible, CAS-retryable, and reclaimed by the next write/compact") {
    // The commit point is the single _meta.json pointer write (TableStore
    // Scaladoc): a writer killed AFTER writeSnapshot but BEFORE writeMeta
    // leaves an orphan v=N dir. Simulate the kill by writing the snapshot
    // dir directly, never touching the meta.
    val root = Files.createTempDirectory("graft_store_crash")
    val store = new TableStore(spark, root.toString)
    store.overwrite("cc", Seq((1, "a")).toDF("pk", "v"), primaryKeys = Seq("pk"))
    store.overwrite("cc", Seq((2, "b")).toDF("pk", "v")) // committed v1
    Seq((99, "ORPHAN")).toDF("pk", "v").write
      .parquet(root.resolve("cc").resolve("v=2").toString) // killed writer
    // invisible to every reader surface: version pointer, read(), exists
    assert(store.currentVersion("cc") == 1)
    assert(store.exists("cc"))
    assert(store.read("cc").as[(Int, String)].collect().toSeq == Seq((2, "b")))
    // the killed writer's RETRY composes with optimistic CAS: meta was
    // never touched, so expectedVersion = the version it read still
    // matches; the retry claims v=2, clobbering the orphan files —
    // the orphan's rows must never surface
    store.overwrite("cc", Seq((3, "c")).toDF("pk", "v"),
      expectedVersion = Some(1))
    assert(store.currentVersion("cc") == 2)
    assert(store.read("cc").as[(Int, String)].collect().toSeq == Seq((3, "c")))
    // a fresh orphan above the new current is reclaimed by compact, which
    // writes over the orphan slot and prunes history — afterwards the
    // table dir holds ONLY the retained committed snapshot
    Seq((98, "ORPHAN2")).toDF("pk", "v").write
      .parquet(root.resolve("cc").resolve("v=3").toString)
    store.compact("cc", n = 1, retain = 1)
    assert(store.currentVersion("cc") == 3)
    assert(store.read("cc").as[(Int, String)].collect().toSeq == Seq((3, "c")))
    import scala.jdk.CollectionConverters._
    val dirs = Files.list(root.resolve("cc")).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("v=")).toSet
    assert(dirs == Set("v=3"), s"leftover snapshot dirs: $dirs")
  }

  test("multi-writer contract: concurrent same-JVM writers (even via two " +
      "store instances over one root) serialize — no lost updates") {
    // the two-foreachBatch-gates-one-app scenario (r14 verdict item 7):
    // every commit must survive, one version per commit, whichever
    // TableStore instance issued it (the write lock is keyed on the
    // NORMALIZED root, not the instance)
    val root = Files.createTempDirectory("graft_store_race").toString
    val s1 = new TableStore(spark, root)
    val s2 = new TableStore(spark, root + "/.") // same dir, different spelling
    s1.overwrite("race", Seq((0L, 0L)).toDF("id", "x"), primaryKeys = Seq("id"))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq(s1, s2).zipWithIndex.map { case (st, t) =>
      new Thread(() => try {
        (1 to 12).foreach { i =>
          st.upsert("race", Seq((t * 1000L + i, i.toLong)).toDF("id", "x"), Seq("id"))
        }
      } catch { case e: Throwable => errs.add(e) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"concurrent writer failed: ${errs.peek()}")
    assert(s1.read("race").count() == 25)       // 1 seed + 24 upserted rows
    assert(s1.currentVersion("race") == 24)     // one version per commit
    // different tables never contend: a writer on another table proceeds
    s2.overwrite("other", Seq((1L, 1L)).toDF("id", "x"), primaryKeys = Seq("id"))
    assert(s2.read("other").count() == 1)
  }

  test("appendFiles on a hive-partitioned table: O(batch) write, hardlinked " +
      "history, partition layout intact") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft_store").toString
    val store = new TableStore(spark, root)
    val df = (1L to 300L).map(i => (i, (i % 3 + 1).toInt, i * 1.0)).toDF("id", "month", "amt")
    store.overwrite("pa", df, primaryKeys = Seq("id"), partitionBy = Seq("month"))
    val v0 = store.currentVersion("pa")
    def partFiles(v: Int, month: Int) = {
      import scala.jdk.CollectionConverters._
      val d = java.nio.file.Paths.get(root, "pa", s"v=$v", s"month=$month")
      java.nio.file.Files.list(d).iterator().asScala.toSeq
        .filter(f => f.getFileName.toString.endsWith(".parquet"))
        .map(f => f.getFileName.toString -> java.nio.file.Files.getLastModifiedTime(f))
        .toMap
    }
    val m1Before = partFiles(v0, 1)
    Thread.sleep(20)
    // batch touches months 2 and 4 (4 is a NEW partition value)
    store.appendFiles("pa",
      Seq((9001L, 2, -1.0), (9002L, 4, -2.0)).toDF("id", "month", "amt"))
    val after = store.read("pa")
    assert(after.count() == 302)
    assert(after.where(col("month") === 2).count() == 101) // appended, not replaced
    assert(after.where(col("month") === 4).count() == 1)   // new partition dir
    // untouched AND touched previous files ride as hardlinks (same names,
    // same mtimes — appendFiles rewrites nothing)
    val v1 = store.currentVersion("pa")
    assert(partFiles(v1, 1) == m1Before)
    assert(partFiles(v1, 2).keySet.intersect(partFiles(v0, 2).keySet)
      == partFiles(v0, 2).keySet)
    // time travel: the previous version has no appended rows
    assert(store.readVersion("pa", v0).count() == 300)
    // partition pruning still works on the appended snapshot: the month
    // predicate reads only that partition's dirs
    val scanned = after.where(col("month") === 4).select("id")
      .queryExecution.executedPlan.toString
    assert(store.read("pa").where(col("month") === 4)
      .select("id").as[Long].collect().toSeq == Seq(9002L), scanned)
  }

  test("compact preserves the hive partition layout — replacePartitions " +
      "after compact keeps untouched rows (r15 regression)") {
    import org.apache.spark.sql.functions.col
    val store = freshStore()
    val df = (1L to 90L).map(i => (i, (i % 3 + 1).toInt, i * 1.0)).toDF("id", "month", "amt")
    store.overwrite("pc", df, primaryKeys = Seq("id"), partitionBy = Seq("month"))
    store.appendFiles("pc", Seq((9001L, 2, -1.0)).toDF("id", "month", "amt"))
    store.compact("pc", n = 1, retain = 1)
    // the compacted snapshot still has hive dirs (pruning + the
    // replacePartitions contract depend on them)
    assert(store.read("pc").count() == 91)
    val newMonth2 = Seq((9100L, 2, -9.0)).toDF("id", "month", "amt")
    store.replacePartitions("pc", newMonth2)
    val after = store.read("pc")
    assert(after.where(col("month") === 2).count() == 1)   // replaced wholesale
    assert(after.where(col("month") === 1).count() == 30)  // NOT silently dropped
    assert(after.where(col("month") === 3).count() == 30)
    assert(after.count() == 61)
  }

  test("replaceWhere rewrites only the matching slice") {
    val store = freshStore()
    store.overwrite("r", Seq((1, "2024-01", 1.0), (2, "2024-02", 2.0))
      .toDF("pk", "month", "x"), primaryKeys = Seq("pk"))
    store.replaceWhere("r", Seq((9, "2024-02", 9.0)).toDF("pk", "month", "x"),
      "month = '2024-02'")
    val out = store.read("r").orderBy("pk").as[(Int, String, Double)].collect().toSeq
    assert(out == Seq((1, "2024-01", 1.0), (9, "2024-02", 9.0)))
  }

  test("compact prunes old versions but keeps the latest") {
    val store = freshStore()
    store.overwrite("c", Seq(1).toDF("k"), primaryKeys = Seq("k"))
    store.overwrite("c", Seq(2).toDF("k"))
    store.compact("c", n = 1, retain = 1)
    assert(store.read("c").as[Int].collect().toSeq == Seq(2))
    intercept[Exception](store.readVersion("c", 0).collect()) // pruned
  }

  test("properties round-trip through _meta.json") {
    val store = freshStore()
    store.overwrite("p", Seq(1).toDF("k"), primaryKeys = Seq("k"),
      timestampKeys = Seq("k"), description = "a \"quoted\" description\nline2")
    store.setProperties("p", Map("team" -> "graft", "tier" -> "gold"))
    val m = store.meta("p").get
    assert(m.properties("team") == "graft")
    assert(m.description.contains("\"quoted\""))
    assert(m.primaryKeys == Seq("k") && m.timestampKeys == Seq("k"))
  }

  test("Sources: layered read/write resolution and existence probes") {
    val tmp = Files.createTempDirectory("graft_layers")
    val sources = new graft.store.Sources(spark, Map(
      "source" -> "/root/testdata/sf0.001",
      "ingestion" -> s"$tmp/ingestion",
      "preprocessing" -> s"$tmp/preprocessing"))
    // raw source layer
    val raw = sources.getTable("region", "source")
    assert(raw.count() == 5)
    assert(sources.tableExists("region", "source"))
    assert(!sources.tableExists("nope", "source"))
    // curated layer via TableStore (upsert path)
    sources.putTable("region_clean", "ingestion", raw, primaryKeys = Seq("r_regionkey"))
    sources.putTable("region_clean", "ingestion", raw, primaryKeys = Seq("r_regionkey"))
    assert(sources.getTable("region_clean", "ingestion").count() == 5) // idempotent
    assert(sources.tableExists("region_clean", "ingestion"))
    intercept[RuntimeException](sources.getTable("x", "nope"))
    // other raw formats route through the same resolution
    val rawDir = Files.createTempDirectory("graft_raw").toString
    val multi = new graft.store.Sources(spark, Map("source" -> rawDir))
    raw.write.option("header", "true").mode("overwrite").csv(s"$rawDir/region.csv")
    raw.write.mode("overwrite").json(s"$rawDir/region.json")
    raw.write.mode("overwrite").orc(s"$rawDir/region.orc")
    assert(multi.getTable("region", "source", "csv").count() == 5)
    assert(multi.getTable("region", "source", "json").count() == 5)
    assert(multi.getTable("region", "source", "orc").count() == 5)
    intercept[RuntimeException](multi.getTable("region", "source", "avro"))
  }

  test("FeatureStore.save: fail-on-missing policy, then force path") {
    val store = freshStore()
    val r1 = FeatureStore.save(store, "fs", Seq((1, "m", 1.0)).toDF("pk", "ts", "a"),
      Seq("pk", "ts"), Seq("ts"))
    assert(r1.version == 0 && r1.diff.isEmpty)
    // dropping column "a" must fail under FailOnMissing
    intercept[RuntimeException] {
      FeatureStore.save(store, "fs", Seq((1, "m")).toDF("pk", "ts"), Seq("pk", "ts"), Seq("ts"))
    }
    // new column via upsert path is fine
    val r2 = FeatureStore.save(store, "fs", Seq((2, "m", 2.0, 5)).toDF("pk", "ts", "a", "b"),
      Seq("pk", "ts"), Seq("ts"))
    assert(r2.version == 1 && r2.diff.get.newColumns == Seq("b"))
    assert(store.read("fs").count() == 2)
  }
}
