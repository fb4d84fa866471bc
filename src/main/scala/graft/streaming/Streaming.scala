package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.store.TableStore

/** Structured Streaming skin over the engine. The reference is pure batch
  * micro-snapshot (SURVEY §2.10) — this is the streaming extension path:
  * the same monthly-refresh semantics expressed as `readStream` →
  * watermarked tumbling aggregation → `foreachBatch` upsert into the
  * [[TableStore]] (idempotent by PK, so replays are safe — exactly the
  * reference's MERGE-based refresh, continuously).
  */
object Streaming {

  val eventSchema: StructType = StructType.fromDDL(
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING")

  /** File-source stream of event batches dropped into `dir`. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Tumbling-window aggregation with late-data watermark: the streaming
    * mirror of `Queries.qStreamTumbling`. State is bounded by the
    * watermark; partials combine map-side per micro-batch. */
  def tumblingAgg(events: DataFrame, window_ : String = "1 hour",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  final case class UserEvent(user_id: Long, event_type: String, value: Double)
  final case class UserRunning(user_id: Long, n: Long, total: Double)

  /** Custom keyed state: per-user running aggregate via mapGroupsWithState
    * (the `KeyValueGroupedDataset` stateful path). */
  def runningPerUser(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events.select(col("user_id"), col("event_type"), coalesce(col("value"), lit(0.0)).as("value"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          val next = batch.foldLeft(prev)((acc, e) =>
            UserRunning(uid, acc.n + 1, acc.total + e.value))
          state.update(next)
          next
      }
      .toDF()
  }

  /** Continuous feature refresh: each micro-batch upserts into the store by
    * PK — replay-idempotent, like the reference's scheduled MERGE jobs. */
  def streamIntoStore(agg: DataFrame, store: TableStore, table: String,
                      primaryKeys: Seq[String], checkpoint: String): StreamingQuery =
    agg.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        store.upsert(table, batch, primaryKeys)
      }
      .start()
}
