package graft.features

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Joins

/** One feature table to look up point-in-time-correctly: `features` keyed
  * by `keys` with snapshot time `timeCol`; `featureCols` selects the
  * payload (default: everything except keys + time); `prefix` namespaces
  * the emitted columns (and the matched snapshot time) so stacked lookups
  * never collide.
  */
case class FeatureLookup(features: DataFrame, keys: Seq[String],
                         timeCol: String, featureCols: Seq[String] = Nil,
                         prefix: String = "")

/** Training-set assembly: stack point-in-time lookups from several feature
  * tables onto a label frame — the feature-store "create training set"
  * surface. The reference materializes exactly this shape by hand, one
  * `point_in_time_join` per feature table
  * (`src/packages/preprocessing/merge_tables/joins.py:115-239`; "point-in-
  * time lookups", SURVEY:50); here it is one declarative call per feature
  * table with
  * leakage-free as-of semantics (latest snapshot ≤ label time).
  *
  * Scale: each lookup is ONE union-tag as-of join ([[Joins.pointInTimeJoin]]):
  * one hash shuffle on the lookup keys + one in-partition sort, cost
  * independent of history depth — never the naive join-then-filter blowup.
  * Lookups sharing the same keys re-shuffle the (growing) label frame; at
  * 100 TB order co-keyed lookups adjacently and pre-bucket the label table
  * by the dominant key so consecutive exchanges collapse (AQE reuses the
  * partitioning when key + partition count match).
  */
object TrainingSet {

  def build(labels: DataFrame, labelTime: String,
            lookups: Seq[FeatureLookup]): DataFrame = {
    require(lookups.nonEmpty, "need at least one FeatureLookup")
    lookups.foldLeft(labels) { (acc, fl) =>
      val payload =
        if (fl.featureCols.nonEmpty) fl.featureCols
        else fl.features.columns.toSeq
          .filterNot(c => fl.keys.contains(c) || c == fl.timeCol)
      val tOut = fl.prefix + fl.timeCol
      require(!acc.columns.contains(tOut),
        s"column $tOut already present — give the lookup a distinct prefix")
      val proj = fl.features.select(
        fl.keys.map(col) ++ Seq(col(fl.timeCol).as(tOut)) ++
          payload.map(c => col(c).as(fl.prefix + c)): _*)
      Joins.pointInTimeJoin(acc, proj, fl.keys, labelTime, tOut)
    }
  }

  /** Batch serving view: the latest feature snapshot per entity as of
    * `asOf`, dropping entities whose freshest snapshot is older than
    * `maxStalenessDays` — the offline mirror of a feature-store online
    * lookup with a TTL (stale features are worse than missing ones at
    * scoring time, so they are excluded, not served). Emits the feature
    * payload plus the matched snapshot time under `prefix`.
    *
    * Scale: the time-range filter prunes at the scan (snapshot tables
    * partitioned by date read only `maxStalenessDays` partitions — see
    * TableStore partitioned snapshots), then ONE hash shuffle on the
    * entity keys for the latest-per-key window. No as-of join: serving
    * has a single global cutoff, so the general PIT machinery would be
    * wasted motion.
    */
  def servingLookup(features: DataFrame, keys: Seq[String], timeCol: String,
                    asOf: String, maxStalenessDays: Int,
                    prefix: String = ""): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(maxStalenessDays > 0, "maxStalenessDays must be positive")
    val fresh = features.where(
      col(timeCol) <= lit(asOf) &&
        col(timeCol) >= date_sub(lit(asOf).cast("date"), maxStalenessDays))
    val latest = graft.ops.Filters.latestPerGroup(fresh, keys, timeCol)
    val payload = features.columns.toSeq
      .filterNot(c => keys.contains(c) || c == timeCol)
    latest.select(
      keys.map(col) ++ Seq(col(timeCol).as(prefix + timeCol)) ++
        payload.map(c => col(c).as(prefix + c)): _*)
  }

  /** Preference-pair assembly (DPO/RLHF reward data): within each group
    * (prompt, task, source shard), pair the BEST-scored candidate against
    * the WORST — `(chosen, rejected, margin)`. Groups with a single
    * candidate emit nothing (no pair exists); ties resolve
    * deterministically (best: smallest id among max score; worst: largest
    * id among min score), so a group whose candidates all tie still emits
    * a valid pair of two distinct rows.
    *
    * Returns one row per eligible group:
    * `(groupCol, chosen_id, chosen_score, rejected_id, rejected_score,
    * margin)` with `margin = chosen_score − rejected_score` (exact when
    * the score is integer/decimal).
    *
    * Reference analog: the reference's label frames feed ranking models
    * via the training-set join (`joins.py:115-239`); explicit
    * best-vs-worst pair mining is this engine's extended training-data
    * scope.
    *
    * Scale: ONE aggregation, no window — argmax/argmin ride `max/min`
    * over comparable structs `(score, −id, id, score)`, which combine
    * map-side; shuffle mass is one partial row per (partition, group).
    * The window form (`row_number` per group twice) would sort every
    * group's candidates; this never sorts anything. */
  def preferencePairs(df: DataFrame, groupCol: String, idCol: String,
                      scoreCol: String): DataFrame = {
    val probe = struct(col(scoreCol).as("s"), (-col(idCol)).as("t"),
      col(idCol).as("id"), col(scoreCol).as("score"))
    df.groupBy(col(groupCol))
      .agg(max(probe).as("__c"), min(probe).as("__r"),
        count(lit(1)).as("__n"))
      .where(col("__n") >= 2)
      .select(col(groupCol),
        col("__c.id").as("chosen_id"), col("__c.score").as("chosen_score"),
        col("__r.id").as("rejected_id"), col("__r.score").as("rejected_score"),
        (col("__c.score") - col("__r.score")).as("margin"))
  }
}
