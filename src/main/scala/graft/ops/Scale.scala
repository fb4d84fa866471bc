package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities: skew-salted joins, bucketed co-located joins, and
  * partition-layout helpers — the knobs a 1000-executor / 100 TB deployment
  * turns that local tests can still assert on.
  *
  * These are extensions beyond the reference surface (which delegates all
  * physical strategy to Catalyst — SURVEY §4): at reference scale none of
  * this matters; at 100 TB a single hot key or an unbucketed fact-fact join
  * dominates the job.
  */
object Scale {

  /** Skew-salted equi-join (large skewed `left` ⋈ smaller `right`):
    * left rows get a random salt in [0, saltFactor); right rows are
    * replicated across ALL salt values (explode of a literal range — a
    * saltFactor× blowup of the SMALL side only). The join key becomes
    * (key, salt), splitting each hot key into `saltFactor` reducers.
    *
    * AQE's skew-join handles sort-merge skew automatically; explicit
    * salting remains the tool when the skew sits in an aggregation feeding
    * the join or AQE splitting is defeated (e.g. bucketed inputs). */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int, how: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // Replicating the right side saltFactor× would emit each unmatched
    // right row saltFactor times under right/full outer joins — restrict to
    // the join types whose semantics survive replication of the build side.
    val normalized = how.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross")(normalized),
      s"saltedJoin supports inner/left/left_semi/left_anti joins, not '$how' " +
        "(right/full outer would duplicate unmatched right rows saltFactor times)")
    // deterministic salt: hash of the full left row, not rand() — keeps
    // retries/speculative tasks consistent
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.toIndexedSeq.map(col): _*), lit(saltFactor)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    // shuffle_hash on the replicated small side (invariant 12): SMJ would
    // SORT the big salted fact stream — the side salting exists to
    // protect; hash-building the small side (salting's own contract says
    // it is replicable, so per-partition build = small·saltFactor/parts)
    // streams the fact unsorted. Spark supports build-right SHJ for all
    // the left-shaped joins this method admits.
    saltedLeft.join(saltedRight.hint("shuffle_hash"), keys :+ "__salt", how)
      .drop("__salt")
  }

  /** Per-key aggregation with two-phase salting: partial aggregate on
    * (key, salt), then final aggregate on key — splits a hot GROUP BY key
    * across `saltFactor` reducers. `partials` and `finals` must be a
    * decomposable pair (e.g. partial sum → final sum; partial count →
    * final sum). */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltFactor: Int,
                partials: Seq[(String, Column)], finals: Seq[(String, Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(saltFactor)).cast("int"))
    val phase1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(finals.head._2.as(finals.head._1),
        finals.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Write both sides bucketed by the join key into the session catalog —
    * subsequent equi-joins on `keys` with matching bucket counts plan as
    * zero-Exchange sort-merge joins (co-located). The local-warehouse
    * equivalent of pre-partitioned production tables. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Number of shuffle Exchange operators in the executed plan — the
    * assertion primitive for co-location tests. AQE-aware: descends into
    * `AdaptiveSparkPlanExec` (whose inner plan is not a child) and
    * `QueryStageExec` wrappers, so counts are meaningful with adaptive
    * execution on (Spark 4 default); ReusedExchange does NOT count (it is
    * precisely a shuffle that did not happen again). */
  def countExchanges(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def walk(p: SparkPlan): Int = {
      val self = p match { case _: ShuffleExchangeLike => 1; case _ => 0 }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case other => other.children
      }
      self + kids.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  /** Deterministic ordered bucketing for the prefix-sum topologies
    * (median / CDF / gini / lorenz / quartiles): adds an INT `__part`
    * column that is a MONOTONE function of the numeric `valueCol` —
    * linear interpolation of the value against its broadcast (min, max)
    * bounds into `buckets` buckets. This serves exactly the role
    * `repartitionByRange + spark_partition_id` played (an ordered
    * partition of the value domain for per-bucket local windows +
    * broadcast offset cumsum) WITHOUT its three fixed costs: the range
    * sampling pass, the nondeterministic partition ids, and the
    * invariant-7 `localCheckpoint` those ids force when the frame feeds
    * two subtrees (measured r15: sampling + checkpoint jobs were most of
    * q_feat_mad's 3.3 s at sf0.1 — the data itself is a value-distinct
    * count table). The bucket expression is deterministic, so both
    * consuming subtrees may recompute it freely.
    *
    * Monotone, not balanced: equal work per bucket is NOT guaranteed —
    * a value distribution concentrated in a sliver of its own range
    * (heavy outlier tail) degrades toward fewer effective buckets, which
    * costs parallelism, never correctness (range sampling was balanced;
    * this is the trade for zero extra passes). Pass `buckets` ≈ 4× the
    * shuffle parallelism to smooth moderate skew; values must be
    * non-null. Doubles are monotone over the decimal/long inputs used
    * here, and ties land in the same bucket by construction. */
  def orderedBuckets(df: DataFrame, valueCol: String, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val v = col(valueCol).cast("double")
    val bounds = broadcast(df.agg(
      min(v).as("__lo"), max(v).as("__hi")))
    df.crossJoin(bounds)
      .withColumn("__part",
        when(col("__hi") <= col("__lo"), lit(0))
          .otherwise(least(
            floor((v - col("__lo")) / (col("__hi") - col("__lo")) * buckets),
            lit(buckets - 1L)).cast("int")))
      .drop("__lo", "__hi")
  }

  /** Repartition to a target in-memory partition size given a total size
    * estimate — the sizing rule `spark.sql.files.maxPartitionBytes`
    * applies at scan time, applied here for shuffled intermediates. */
  def repartitionBySize(df: DataFrame, totalBytes: Long,
                        targetBytes: Long = 128L << 20): DataFrame =
    df.repartition(math.max(1, (totalBytes / targetBytes).toInt))

  /** Spread a CPU-bound stage (native digest kernels: bootstrap weights,
    * CMS buckets, minhash) across the cores when — and ONLY when — the
    * input scan is too small to feed them: a single small parquet file
    * plans as 1-2 input partitions, which runs the whole per-row kernel
    * loop on one core (measured r12: q_stat_bootstrap spent ~3 s of 3.1 s
    * single-threaded behind a 2.6 MB scan). At real scale the scan
    * already carries thousands of partitions and the extra exchange
    * would be pure cost, so the gate reads the optimizer's size estimate
    * (`optimizedPlan.stats` — a pure optimizer pass, ~ms; never
    * `.rdd.getNumPartitions`, which physical-plans and codegens a second
    * copy of the query per call). */
  def spreadSmallScan(df: DataFrame, perCoreBytes: Long = 16L << 20): DataFrame = {
    val para = df.sparkSession.sparkContext.defaultParallelism
    val small = df.queryExecution.optimizedPlan.stats.sizeInBytes <
      BigInt(para.toLong * perCoreBytes)
    if (small) df.repartition(para) else df
  }

  /** Morton (Z-order) value: interleaves the low `bits` bits of each of
    * the given non-negative integral columns (column i contributes bit b
    * to output position `b·k + i`, k = #columns). Sorting / range-
    * partitioning by this value clusters rows that are close in EVERY
    * dimension into the same files, so min/max footer stats prune
    * multi-dimensional predicates — the data-skipping layout (Morton 1966;
    * the OPTIMIZE ZORDER BY idea) for tables queried on several columns
    * at once.
    *
    * Pure unrolled shift/mask/or expression — whole-stage codegen'd,
    * replayable verbatim in any SQL engine with bit ops. `bits·k` must fit
    * in 63 bits. */
  def zOrderValue(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 2, "z-order needs at least two columns")
    require(bits > 0 && bits * k <= 63, s"bits*$k must be in (0, 63]")
    val terms = for {
      b <- 0 until bits; (c, i) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)),
      b * k + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Range-partition by the Morton value of `cols` and sort within
    * partitions — each output file then covers a small hyper-rectangle of
    * the key space, so a scan with predicates on ANY subset of `cols`
    * skips most files on footer min/max alone. At 100 TB this is the
    * difference between reading 100 TB and reading the ~one-in-
    * `numPartitions` slice a point query touches. */
  def zOrderRepartition(df: DataFrame, cols: Seq[String], bits: Int,
                        numPartitions: Int): DataFrame = {
    val z = zOrderValue(cols.map(col), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
