package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: entry() smoke (rows > 0 on sf0.001), full
  * queries/oracleSql key alignment. */
class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry() returns rows on sf0.001 (driver t1 smoke)") {
    val df = SparkEntry.entry(spark)
    assert(df.limit(5).count() > 0)
    assert(df.columns.take(2).toSeq == Seq("pk_customer", "tpk_release_dt"))
  }

  test("every oracleSql key has a queries entry; names are well-formed") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    assert(qs.forall(_.matches("[a-z0-9_]+")))
    // every catalog entry is oracle-checked — the hash/LSH/sketch queries
    // project to SQL-predictable surfaces (planted recovery sets, exact
    // reference columns + in-bound booleans), so no rows-only remainder
    val rowsOnly = qs.diff(SparkEntry.oracleSql.keySet)
    assert(rowsOnly.isEmpty, rowsOnly.toString)
  }

  test("all queries are runnable at sf0.001 (no empty oracle-checked results)") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").limit(1).count()
      if (n == 0) Some(name) else None
    }
    // every oracle-checked query must produce rows (an empty result would
    // trivially "match" its oracle and prove nothing)
    assert(empties.filter(SparkEntry.oracleSql.contains).isEmpty, empties.toString)
  }
}
