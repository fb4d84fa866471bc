package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Window-function operator kit: lags, lag-derived features, rolling stats,
  * RSI — the heart of every reference pipeline.
  *
  * Reference semantics: `fs_cus_credit_risk.py:121-202,273-445` (duplicated
  * across the four windowed notebooks), `lags.py:98-120`,
  * `aggregation.py:11-57`.
  *
  * Scale design: ALL window columns for a given (partition, order) are
  * emitted in ONE `select("*", ops…)` projection (the reference's own best
  * pattern, SURVEY §4 R4) — Catalyst's `CollapseWindow` then plans a single
  * Window node sharing one shuffle + one sort, however many features are
  * derived. Frames are ROWS frames on purpose: the reference counts *rows*,
  * not months, across gaps (SURVEY §7.5) — do not "fix" to RANGE.
  */
object Windows {

  /** The canonical pipeline window (`fs_cus_credit_risk.py:545`). */
  def entityWindow(partitionCol: String, orderCol: String): WindowSpec =
    Window.partitionBy(partitionCol).orderBy(orderCol)

  /** W1/W2 — per (col, lag n): `{c}_lag_{n}m`, diff `{c}_diff_{n}m`,
    * rate-of-change `round((c-lag)/lag, 4)` as `{c}_roc_{n}m`
    * (`fs_cus_credit_risk.py:273-324`; NOTE the reference builds these but
    * never applies them — latent no-op, SURVEY §2.5 W2. The capability lives
    * here; pipelines exclude them from parity outputs). */
  def lagFeatureCols(w: WindowSpec, cols: Seq[String],
                     lags: Seq[Int] = Seq(1, 3, 6)): Seq[Column] =
    for { c <- cols; n <- lags; lagged = lag(col(c), n).over(w)
          f <- Seq(
            lagged.as(s"${c}_lag_${n}m"),
            (col(c) - lagged).as(s"${c}_diff_${n}m"),
            when(lagged =!= 0, round((col(c) - lagged) / lagged, 4))
              .otherwise(lit(null)).as(s"${c}_roc_${n}m"))
    } yield f

  /** W3 frame: last n rows inclusive (`fs_cus_credit_risk.py:136-150`). */
  def rollingFrame(w: WindowSpec, n: Int): WindowSpec = w.rowsBetween(-n + 1, 0)

  /** W4 — rolling numeric stats: `round(avg,4)` as `{c}_ravg_{n}m`,
    * `round(stddev_samp,4)` as `{c}_rstd_{n}m` (`fs_cus_credit_risk.py:336-368`). */
  def rollingNumericCols(w: WindowSpec, cols: Seq[String],
                         ns: Seq[Int] = Seq(3, 6)): Seq[Column] =
    for { c <- cols; n <- ns; f <- Seq(
            round(avg(col(c)).over(rollingFrame(w, n)), 4).as(s"${c}_ravg_${n}m"),
            round(stddev(col(c)).over(rollingFrame(w, n)), 4).as(s"${c}_rstd_${n}m"))
    } yield f

  /** W5 — rolling categorical min/max, no rounding (`fs_cus_credit_risk.py:371-397`). */
  def rollingMinMaxCols(w: WindowSpec, cols: Seq[String],
                        ns: Seq[Int] = Seq(3, 6)): Seq[Column] =
    for { c <- cols; n <- ns; f <- Seq(
            min(col(c)).over(rollingFrame(w, n)).as(s"${c}_rmin_${n}m"),
            max(col(c)).over(rollingFrame(w, n)).as(s"${c}_rmax_${n}m"))
    } yield f

  /** W6 — the single-projection driver (`fs_cus_credit_risk.py:400-445`):
    * every rolling stat in one select → one Window exec, one sort. */
  def withRollingStats(df: DataFrame, partitionCol: String, orderCol: String,
                       numericCols: Seq[String], minMaxCols: Seq[String] = Nil,
                       ns: Seq[Int] = Seq(3, 6)): DataFrame = {
    val w = entityWindow(partitionCol, orderCol)
    val ops = rollingNumericCols(w, numericCols, ns) ++ rollingMinMaxCols(w, minMaxCols, ns)
    // MEASURED r15 and left alone: pinning the window's entity exchange
    // at full parallelism (repartition(nParts, partition)) cut the one
    // CPU-dense pipeline (holding_products 1.85 -> 1.64 s) but cost the
    // three light pipelines more than it saved (+0.2-0.5 s each in task
    // overhead) — net negative A/B'd back-to-back; AQE's coalescing is
    // the right default for this op's mixed callers.
    if (ops.isEmpty) df else df.select(col("*") +: ops: _*)
  }

  /** W15 — rolling-window anomaly flags: z-score of each value against
    * its OWN entity's PRECEDING n rows (frame [-n, -1] — the current
    * value must stay OUT of the baseline: with it included, a 3-row
    * sample bounds |z| at (n-1)/√n ≈ 1.15 and no spike can ever flag),
    * with the same 4-dp rounding scheme as [[rollingNumericCols]] so the
    * quotient is a deterministic function of parity-checked values;
    * flagged at |z| > k. Baselines shorter than 2 rows or with zero
    * variance yield null z / false flag — the time-series outlier screen
    * beside the population-level
    * [[graft.features.Features.iqrOutlierFlags]].
    *
    * Scale: same ONE entity-keyed shuffle + sort as every rolling stat —
    * the z projection is free. */
  def rollingZFlags(df: DataFrame, partitionCol: String, orderCol: String,
                    c: String, n: Int, k: Double = 2.0): DataFrame = {
    val f = entityWindow(partitionCol, orderCol).rowsBetween(-n, -1)
    val ravg = round(avg(col(c)).over(f), 4)
    val rstd = round(stddev(col(c)).over(f), 4)
    val z = when(rstd > 0, floor((col(c) - ravg) / rstd * 10000.0 + 0.5) / 10000.0)
    df.withColumn(s"${c}_rz_${n}m", z)
      .withColumn(s"${c}_anomaly", coalesce(abs(z) > k, lit(false)))
  }

  /** W16 — recency-weighted (exponentially decayed) trailing sum:
    * `Σ_{j=0..k-1} α^j · lag(c, j)` per entity — the "recent activity
    * matters more" feature (decayed spend, decayed event counts) in
    * CLOSED form: k explicit lag terms instead of a running recurrence,
    * because a true infinite EWMA needs state Spark SQL windows can't
    * express without `α^(-rowNumber)` terms that overflow. Missing lags
    * (series head) contribute 0, so the first rows are partial sums —
    * same convention as a rolling sum. 6-dp det-rounded.
    *
    * Scale: ONE entity-keyed shuffle + sort; the k lag reads share the
    * single window pass (same WindowExec), k is a literal constant. */
  def decayedSum(df: DataFrame, partitionCol: String, orderCol: String,
                 c: String, alpha: Double, k: Int,
                 as: String = ""): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0,1)")
    require(k >= 1, "k must be >= 1")
    val w = entityWindow(partitionCol, orderCol)
    val terms = (0 until k).map(j =>
      coalesce(lag(col(c), j).over(w), lit(0.0)) * math.pow(alpha, j))
    val out = if (as.nonEmpty) as else s"${c}_decay_$k"
    df.withColumn(out, floor(terms.reduce(_ + _) * 1e6 + 0.5) / 1e6)
  }

  /** Generic lag application in one projection. */
  def withLagFeatures(df: DataFrame, partitionCol: String, orderCol: String,
                      cols: Seq[String], lags: Seq[Int] = Seq(1, 3, 6)): DataFrame = {
    val ops = lagFeatureCols(entityWindow(partitionCol, orderCol), cols, lags)
    df.select(col("*") +: ops: _*)
  }

  /** W7 — RSI over a 14-row frame (`fs_cus_credit_risk.py:167-202`; defined in
    * all four notebooks, invoked in none — capability only):
    * delta = c − lag(c,1); gains/losses split; avg over rows(-13,0);
    * rs = avg_gain / coalesce(avg_loss, 1); rsi = 100 − 100/(1+rs). */
  def rsiCol(w: WindowSpec, c: Column, periods: Int = 14): Column = {
    val delta   = c - lag(c, 1).over(w)
    val gain    = when(delta > 0, delta).otherwise(0.0)
    val loss    = when(delta < 0, abs(delta)).otherwise(0.0)
    val frame   = w.rowsBetween(-(periods - 1), 0)
    val avgGain = avg(gain).over(frame)
    val avgLoss = avg(loss).over(frame)
    val rs      = avgGain / coalesce(when(avgLoss =!= 0, avgLoss), lit(1.0))
    round(lit(100.0) - lit(100.0) / (lit(1.0) + rs), 4)
  }

  /** W8 — row numbering (`joins.py:230-236`, `lags.py:35-36`). */
  def rowNumber(df: DataFrame, partitionCols: Seq[String], orderCol: Column,
                as: String = "rn"): DataFrame =
    df.withColumn(as,
      row_number().over(Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCol)))

  /** W9 — group max over unordered window + lag-index arithmetic
    * (`lags.py:39-50`). */
  def withGroupMax(df: DataFrame, keys: Seq[String], c: String, as: String): DataFrame =
    df.withColumn(as, max(col(c)).over(Window.partitionBy(keys.map(col): _*)))

  /** W10 — generic window-op registry (`aggregation.py:11-57`): named agg
    * functions applied `.over` a configured window. */
  def windowOp(df: DataFrame, op: String, c: String, partitionCols: Seq[String],
               orderCols: Seq[String], as: String): DataFrame = {
    val base = Window.partitionBy(partitionCols.map(col): _*)
    val w = if (orderCols.nonEmpty) base.orderBy(orderCols.map(col): _*) else base
    df.withColumn(as, graft.core.Exprs.resolve1(op)(col(c)).over(w))
  }

  /** W11 — parameterized sliding mean/std frames (`lags.py:105-120`). */
  def slidingStats(df: DataFrame, partitionCols: Seq[String], orderCol: String,
                   c: String, start: Int, end: Int): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCol)
      .rowsBetween(start, end)
    df.select(col("*"),
      avg(col(c)).over(w).as(s"${c}_smean"),
      stddev(col(c)).over(w).as(s"${c}_sstd"))
  }

  /** W12 (extension) — gap-based sessionization: a new session starts when
    * the gap to the previous event of the same entity exceeds
    * `gapMicros`. Two window passes over ONE hash partitioning on the
    * entity (lag → boundary flag → running sum), so at cluster scale this
    * is a single shuffle regardless of event volume; per-entity state is
    * just the sort, no driver involvement. `tiebreak` makes the ordering
    * total when timestamps collide (determinism rule). */
  def sessionize(df: DataFrame, entityCol: String, tsCol: String,
                 gapMicros: Long, tiebreak: Seq[String] = Nil,
                 as: String = "session_seq"): DataFrame = {
    val order = col(tsCol) +: tiebreak.map(col)
    val w = Window.partitionBy(col(entityCol)).orderBy(order: _*)
    val micros = unix_micros(col(tsCol))
    val prev = lag(micros, 1).over(w)
    val boundary = when(prev.isNull || micros - prev > gapMicros, 1L).otherwise(0L)
    df.withColumn(as, sum(boundary).over(w))
  }

  /** W18 (extension) — gaps-and-islands interval MERGE: per entity,
    * coalesce overlapping-or-touching half-open `[lo, hi)` intervals into
    * maximal islands `(island_start, island_end, n_intervals)` — the
    * coverage rollup behind "total covered time", outage windows, user
    * activity spans (and the aggregated complement of
    * [[graft.ops.Joins.intervalOverlapJoin]], which pairs two interval
    * sets instead of coalescing one). Touching intervals (`lo == prev
    * max hi`) merge; a strict gap starts a new island.
    *
    * The classic two-window form: a boundary flag where `lo` exceeds the
    * RUNNING MAX of `hi` over all earlier intervals (a plain `lag(hi)`
    * is wrong when an interval is fully contained in a predecessor —
    * the running max is what "earlier coverage" means), then a running
    * sum of flags as the island id, then one rollup. Island membership
    * is a set property of the interval multiset, so ties in the
    * `(lo, hi)` order cannot change the output — the result is
    * engine-replayable on integer bounds.
    *
    * Scale: ONE hash shuffle on the entity + one in-partition sort feeds
    * both windows and the final aggregation (same Exchange, W6 pattern).
    * Per-entity interval counts are the window-task bound — the
    * [[sessionize]] caveat class.
    *
    * Precondition: `lo <= hi` (inverted spans are filtered out as empty
    * — they cover nothing, and letting them through would poison the
    * running max with a hi that precedes its own lo). */
  def mergeIntervals(df: DataFrame, entityCol: String, loCol: String,
                     hiCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(col(loCol), col(hiCol))
    val prevMax = max(col(hiCol)).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    val boundary = when(prevMax.isNull || col(loCol) > prevMax, 1L).otherwise(0L)
    df.where(col(loCol) <= col(hiCol))
      .withColumn("__island", sum(boundary).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(entityCol), col("__island"))
      .agg(min(col(loCol)).as("island_start"),
        max(col(hiCol)).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .drop("__island")
  }

  /** W14 (extension) — trailing event-TIME range frame: aggregates over
    * all of the entity's rows within the last `trailingMicros` of event
    * time (RANGE frame on the epoch-micros order key), not the last N
    * rows — the correct "30-day trailing spend" semantics when event
    * cadence is irregular (a ROWS frame silently changes meaning with
    * density). Same single shuffle + sort as every other window; the frame
    * bound is evaluated during the sorted scan, so cost is identical to
    * the ROWS form. */
  def trailingTimeSum(df: DataFrame, entityCol: String, tsCol: String,
                      valueCol: String, trailingMicros: Long,
                      as: String = "trailing_sum"): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-trailingMicros, 0)
    df.withColumn(as,
      sum(col(valueCol).cast("decimal(18,6)")).over(w).cast("double"))
  }

  /** W13 (extension) — forward fill (LOCF, last observation carried
    * forward): per entity, each null in `cols` takes the most recent
    * non-null value in `orderCols` order — the standard sparse-feature
    * imputation between snapshot refreshes (the reference's monthly tables
    * are dense, but its scaffold left joins produce exactly these gaps,
    * `joins.py:115-239`). Rows before the first observation stay null.
    *
    * Scale: all columns fill over ONE hash partitioning on the entity +
    * one in-partition sort (`last(ignoreNulls)` running frame per column —
    * same single-shuffle story as [[sessionize]]). `orderCols` must be a
    * total order per entity for engine-independent results. */
  def forwardFill(df: DataFrame, entityCol: String, orderCols: Seq[String],
                  cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && orderCols.nonEmpty, "cols/orderCols must be non-empty")
    val w = Window.partitionBy(col(entityCol)).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    cols.foldLeft(df)((acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Running DISTINCT count per entity: for every row, how many distinct
    * `valueCol` values the entity has seen up to and including it.
    * Window functions cannot express `count(distinct)` directly — the
    * standard rewrite: flag each value's FIRST occurrence per entity
    * (row_number over (entity, value) == 1), then a running sum of the
    * flags over the entity's time order. Two windows, but both partition
    * on the entity-prefixed keys: the (entity, value) window and the
    * (entity) window — one wide shuffle pair on small keys, no join.
    * `orderCols` must totally order rows within an entity. */
  def runningDistinct(df: DataFrame, entityCol: String, valueCol: String,
                      orderCols: Seq[String],
                      as: String = "distinct_so_far"): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val firstSeen = Window.partitionBy(col(entityCol), col(valueCol))
      .orderBy(orderCols.map(col): _*)
    val running = Window.partitionBy(col(entityCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("__first",
        when(row_number().over(firstSeen) === 1, 1L).otherwise(0L))
      .withColumn(as, sum(col("__first")).over(running))
      .drop("__first")
  }
}
