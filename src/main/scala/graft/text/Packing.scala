package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-example packing: the concat-and-chunk preparation step of
  * GPT-style pretraining — documents are concatenated in a deterministic
  * order and the token stream is cut into fixed-size context windows; each
  * document is assigned its global token offset and the chunk range it
  * spans. Downstream, (chunk_first..chunk_last) IS the map from documents
  * to training examples (and its inverse drives per-example provenance).
  *
  * Scale: a global running sum is NOT computed with one unpartitioned
  * window (that serializes the corpus through a single task). Instead the
  * classic two-phase distributed prefix sum:
  *   1. range-repartition on the order column (partitions hold contiguous
  *      ranges, so per-partition order ⊂ global order);
  *   2. per-partition token totals → a PARTITIONS-sized table whose own
  *      running sum (driver-scale window) yields each partition's global
  *      starting offset, broadcast back;
  *   3. one partition-local window adds local prefix + partition offset.
  * Every stage is bounded: the only full pass is the partition-local
  * window sort, which range partitioning has already clustered. The
  * output is independent of the partition count (offsets depend only on
  * the global order, not on where the range boundaries fall).
  */
object Packing {

  /** Assign each document its global token offset and chunk span.
    * Returns the input columns plus `tok_start`, `chunk_first`,
    * `chunk_last` (chunks of `chunkTokens` tokens; a zero-token document
    * collapses to `chunk_first`). `orderCol` must be globally unique — it
    * defines the concatenation order. */
  def chunkAssignments(df: DataFrame, orderCol: String, tokenCountCol: String,
                       chunkTokens: Int, partitions: Int = 0): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    val nParts = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // localCheckpoint pins ONE materialization of the (sampled) range
    // partitioning: `ranged` feeds both the offsets subtree and the probe
    // subtree, and without pinning, a plan change that defeats exchange
    // reuse could re-sample different range boundaries per subtree —
    // making __part disagree between the two and corrupting offsets
    val ranged = df.repartitionByRange(nParts, col(orderCol))
      .withColumn("__part", spark_partition_id())
      .localCheckpoint()
    val offsets = broadcast(
      ranged.groupBy("__part").agg(sum(col(tokenCountCol)).as("__psum"))
        .withColumn("__offset", coalesce(
          sum("__psum").over(Window.orderBy("__part")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("__part", "__offset"))
    val localW = Window.partitionBy("__part").orderBy(col(orderCol))
    val chunk: Column => Column = t => floor(t / chunkTokens)
    ranged.join(offsets, Seq("__part"))
      .withColumn("tok_start",
        col("__offset") + sum(col(tokenCountCol)).over(localW) - col(tokenCountCol))
      .withColumn("chunk_first", chunk(col("tok_start")))
      .withColumn("chunk_last",
        greatest(chunk(col("tok_start") + col(tokenCountCol) - 1), chunk(col("tok_start"))))
      .drop("__part", "__offset")
  }

  /** Per-document overlapping sliding windows: cut each document's unit
    * span `[0, lengthCol)` into chunks starting every `step` units, each
    * `window` units long (clipped at the document end). Emits one row per
    * chunk: `chunk_idx` (0-based), `chunk_start`, `chunk_end` (exclusive).
    * Documents with length 0 emit no chunks. The long-document
    * split-with-overlap step (RAG indexing, context-window prep) —
    * complements [[chunkAssignments]], which packs the corpus-level
    * stream; this one splits within each document.
    *
    * Scale: MAP-ONLY — `sequence` + `posexplode` generate chunk rows in
    * place; no shuffle, no state. Output size is input-length/step rows,
    * the operator's inherent fan-out. */
  def slidingChunks(df: DataFrame, lengthCol: String,
                    window: Int, step: Int): DataFrame = {
    require(window > 0 && step > 0 && step <= window,
      s"need 0 < step <= window, got window=$window step=$step")
    df.where(col(lengthCol) > 0)
      .select(df.columns.map(col) :+
        posexplode(sequence(lit(0L), col(lengthCol).cast("long") - 1, lit(step.toLong)))
          .as(Seq("chunk_idx", "chunk_start")): _*)
      .withColumn("chunk_end", least(col("chunk_start") + window, col(lengthCol).cast("long")))
  }
}
