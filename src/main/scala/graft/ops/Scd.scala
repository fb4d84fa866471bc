package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) builds — the dimension-management
  * layer every feature store keeps next to its fact pipelines (extension
  * beyond the reference surface; the reference's point-in-time join,
  * `notebooks/utils.py` as-of logic, consumes exactly this row shape:
  * `(key, attrs, valid_from, valid_to, is_current)`).
  *
  * Three operators:
  *  - [[scd2Build]]   — full rebuild from a change log;
  *  - [[scd2Merge]]   — apply a delta batch of changes to an existing
  *    dimension WITHOUT reprocessing history (the production ingest
  *    topology; result is row-identical to a full rebuild, and the
  *    oracle/spec assert exactly that equivalence);
  *  - [[scd2SnapshotAt]] — point-in-time snapshot of the dimension.
  *
  * Scale: every step is keyed by the dimension key — one hash shuffle
  * for the build windows (both windows share the partitioning, so
  * Catalyst plans a single Exchange), and the merge shuffles ONLY the
  * delta batch plus a key-partitioned join against the current rows.
  * No driver-side state, no global sort.
  */
object Scd {

  private def orderCols(tsCol: String, tieBreakCols: Seq[String]): Seq[Column] =
    (tsCol +: tieBreakCols).map(col)

  /** Build an SCD2 dimension from a raw change log. Per key, changes are
    * ordered by (`tsCol`, `tieBreakCols`…); consecutive rows whose
    * tracked `attrCols` are all unchanged are suppressed (the classic
    * lag-compare — comparing to the previous RAW row equals comparing to
    * the previous KEPT row by induction: a dropped row is attr-identical
    * to its own predecessor). Surviving rows become versions with
    * `valid_from` = change ts, `valid_to` = next change ts (null on the
    * open, current version), `version` = 1-based per-key counter and
    * `is_current`.
    *
    * Null-safe comparisons (`<=>`), so null attribute values participate
    * in change detection instead of poisoning it. */
  def scd2Build(changes: DataFrame, keyCol: String, tsCol: String,
                attrCols: Seq[String],
                tieBreakCols: Seq[String] = Nil): DataFrame = {
    require(attrCols.nonEmpty, "attrCols must be non-empty")
    val w = Window.partitionBy(keyCol).orderBy(orderCols(tsCol, tieBreakCols): _*)
    val changed = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val kept = changes
      .withColumn("__rn", row_number().over(w))
      .withColumn("__changed", changed)
      .where(col("__rn") === 1 || col("__changed"))
      .drop("__rn", "__changed")
    // Same partitioning as `w` — Catalyst reuses the Exchange; only a
    // local re-sort runs between the two Window nodes.
    val wk = Window.partitionBy(keyCol).orderBy(orderCols(tsCol, tieBreakCols): _*)
    kept.select(
      (col(keyCol) +: attrCols.map(col)) ++ Seq(
        row_number().over(wk).as("version"),
        col(tsCol).as("valid_from"),
        lead(col(tsCol), 1).over(wk).as("valid_to")): _*)
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Apply a `delta` batch of raw changes to an existing SCD2 `dim`
    * (the output shape of [[scd2Build]]) without reprocessing history.
    * REQUIRES every delta ts to be strictly later than the affected
    * key's current `valid_from` (the normal append-only ingest
    * contract).
    *
    * Topology: the key's current row is injected as a SEED pseudo-change
    * at its own `valid_from` (guaranteed to sort first), the same
    * lag-suppression as the build runs over seed+delta, seeds are
    * dropped, and versions continue from the key's stored counter.
    * Closed history rows pass through untouched; a current row is closed
    * by the key's first surviving delta change (keys with a fully
    * suppressed delta — no real attribute change — keep their current
    * row open). Result is row-identical to
    * `scd2Build(historyLog ∪ delta)`.
    *
    * Scale: shuffles the DELTA (small) by key, plus one key-keyed join
    * against the dimension's current rows — at 100 TB both sides are
    * key-partitioned (store the dimension bucketed by key and the join
    * is Exchange-free); history rows are never read beyond the
    * `is_current` partition filter. */
  def scd2Merge(dim: DataFrame, delta: DataFrame, keyCol: String,
                tsCol: String, attrCols: Seq[String],
                tieBreakCols: Seq[String] = Nil): DataFrame = {
    require(attrCols.nonEmpty, "attrCols must be non-empty")
    val cur = dim.where(col("is_current"))
      .select(
        (col(keyCol) +: attrCols.map(col)) ++ Seq(
          col("version"), col("valid_from")): _*)

    // Seed rows sort strictly before every delta row for their key
    // (valid_from of the open version predates all appended changes),
    // so tie-break columns never decide seed-vs-delta order.
    val seed = cur.select(
      (col(keyCol) +: col("valid_from").as(tsCol) +: attrCols.map(col)) ++
        tieBreakCols.map(c => lit(null).cast(delta.schema(c).dataType).as(c)) :+
        lit(true).as("__seed"): _*)
    val log = delta
      .select((keyCol +: tsCol +: (attrCols ++ tieBreakCols)).map(col): _*)
      .withColumn("__seed", lit(false))
      .unionByName(seed)

    val w = Window.partitionBy(keyCol).orderBy(orderCols(tsCol, tieBreakCols): _*)
    val changed = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val survivors = log
      .withColumn("__rn", row_number().over(w))
      .withColumn("__changed", changed)
      .where(!col("__seed") && (col("__rn") === 1 || col("__changed")))
      .drop("__rn", "__changed", "__seed")

    val wk = Window.partitionBy(keyCol).orderBy(orderCols(tsCol, tieBreakCols): _*)
    val newRows = survivors
      .join(cur.select(col(keyCol), col("version").as("__base")), Seq(keyCol), "left")
      .select(
        (col(keyCol) +: attrCols.map(col)) ++ Seq(
          (coalesce(col("__base"), lit(0)) + row_number().over(wk)).as("version"),
          col(tsCol).as("valid_from"),
          lead(col(tsCol), 1).over(wk).as("valid_to")): _*)
      .withColumn("is_current", col("valid_to").isNull)

    // First surviving change per key closes that key's current row.
    val firstChange =
      newRows.groupBy(keyCol).agg(min("valid_from").as("__close_ts"))
    val curResolved = dim.where(col("is_current"))
      .join(firstChange, Seq(keyCol), "left")
      .withColumn("valid_to", coalesce(col("__close_ts"), col("valid_to")))
      .withColumn("is_current", col("__close_ts").isNull)
      .drop("__close_ts")

    dim.where(!col("is_current"))
      .unionByName(curResolved)
      .unionByName(newRows.select(dim.columns.toIndexedSeq.map(col): _*))
  }

  /** Point-in-time snapshot: the one version per key whose validity
    * interval contains `asOf` (`valid_from <= asOf < valid_to`, open
    * current rows unbounded above). Keys whose first change postdates
    * `asOf` are absent — exactly the leakage-safe semantics a training
    * set needs. Map-only: a partition-prunable filter, no shuffle. */
  def scd2SnapshotAt(dim: DataFrame, asOf: Column): DataFrame =
    dim.where(col("valid_from") <= asOf &&
      (col("valid_to").isNull || col("valid_to") > asOf))

  /** Point-in-time TRAINING join: each fact row picks up the dimension
    * version valid at ITS OWN timestamp (`valid_from <= fact_ts <
    * valid_to`) — the per-row as-of semantics a leakage-safe training
    * set needs (the reference's PIT lookup shape,
    * `notebooks/utils.py` as-of logic, against an interval dimension
    * instead of a raw change log). Inner join: facts predating the
    * key's first version are absent rather than null-padded.
    *
    * Scale: an EQUI-join on the dimension key with the interval bounds
    * as residual filters — one co-partitionable shuffle pair, and the
    * per-fact match fan-in is the key's version count over the fact's
    * instant (exactly 1 by SCD2 interval disjointness). Versions per
    * key are bounded (change-suppressed), so the join never explodes;
    * contrast J3's union-tag rewrite, which is the right tool when the
    * right side is a raw EVENT log instead of disjoint intervals. */
  def scd2PitJoin(facts: DataFrame, dim: DataFrame, keyCol: String,
                  factTsCol: String): DataFrame =
    // Alias-qualified sides: facts and dim routinely share lineage (a
    // dimension built from the same event source as the facts), and
    // dataframe-indexed columns would trip ambiguous-self-join detection.
    facts.as("__fact").join(dim.as("__dim"),
      col(s"__fact.$keyCol") === col(s"__dim.$keyCol") &&
        col("__dim.valid_from") <= col(s"__fact.$factTsCol") &&
        (col("__dim.valid_to").isNull ||
          col(s"__fact.$factTsCol") < col("__dim.valid_to")))
      .drop(col(s"__dim.$keyCol"))
}
