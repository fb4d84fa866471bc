package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation for the ANN / compressed-search paths —
  * the measurement step every vector-search deployment runs before
  * swapping an approximate (or quantized) index in for exact search.
  * Extension beyond the reference surface (SURVEY §2.11 scope), in the
  * spirit of the recall@k methodology of the ANN-benchmarks literature
  * (Aumüller et al., 2019) and the IVF/PQ papers it measures
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011 — recall@R as the headline metric).
  *
  * Determinism: pure set arithmetic over the two candidate tables —
  * counts and integer percentages only, no floats — so any engine
  * replays it exactly given the same inputs.
  */
object Eval {

  /** Per-query recall@k of `approx` against `exact`: the fraction of each
    * query's exact top-k neighbors that the approximate result recovered,
    * as an integer percentage (`n_hits·100 div k` — exact, tie-free).
    * Both inputs are `(queryCol, neighborCol, …)` candidate tables (one
    * row per retrieved neighbor, already cut to their top-k); extra
    * columns are ignored. Queries present in `exact` but absent from
    * `approx` score 0 — a query the index lost entirely is recall 0, not
    * a dropped row.
    *
    * Returns `(queryCol, n_exact, n_hits, recall_pct)`.
    *
    * Scale: both inputs are top-k tables — O(k·|queries|) rows by
    * construction, thousands of times smaller than the corpus that
    * produced them. One hash join on (query, neighbor) + one group-by on
    * query; the corpus is never touched. At 10⁹ queries this is an
    * ordinary two-table join keyed by query id — evenly distributed,
    * AQE-splittable, nothing per-corpus-row. */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int,
                queryCol: String = "query_id",
                neighborCol: String = "neighbor_id"): DataFrame = {
    require(k > 0, "k must be positive")
    val e = exact.select(col(queryCol), col(neighborCol))
    val a = approx.select(col(queryCol), col(neighborCol))
    val hits = e.join(a, Seq(queryCol, neighborCol), "left_semi")
      .groupBy(col(queryCol))
      .agg(count(lit(1)).cast("int").as("n_hits"))
    e.groupBy(col(queryCol))
      .agg(count(lit(1)).cast("int").as("n_exact"))
      .join(hits, Seq(queryCol), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0)))
      .withColumn("recall_pct",
        (col("n_hits").cast("long") * 100L / k).cast("int"))
  }
}
