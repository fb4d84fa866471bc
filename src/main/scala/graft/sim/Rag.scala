package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-augmented context assembly: turn a per-query ranked
  * retrieval result (from [[Similarity.bruteForceTopK]] /
  * [[Similarity.ivfTopK]] / [[PQ.ivfAdcTopK]] — anything emitting
  * `(query_id, neighbor_id, rank)`) into the context that actually fits a
  * model's window: walk each query's neighbors in rank order, keep the
  * longest prefix whose total token count stays inside `budgetTokens`
  * (the best-ranked document always survives, even when it alone
  * overflows — an empty context is never the right answer), and emit the
  * per-query packing summary. The retrieval→prompt glue step of a RAG
  * pipeline (Lewis et al. 2020, "Retrieval-Augmented Generation"), and
  * the same greedy rank-order budget rule used for few-shot context
  * packing.
  *
  * Output: `query_id, n_ctx_docs, ctx_tokens, ctx_doc_ids` (CSV in rank
  * order — the placement, not the text; callers join text back by id for
  * the final prompt render so the wide text column never rides the
  * aggregation).
  */
object Rag {

  /** @param topk   ranked retrieval rows `(query_id, neighbor_id, rank)`
    * @param docs   document table carrying `docIdCol` and `tokenCountCol`
    * @param budgetTokens context-window token budget per query
    *
    * Scale: `topk` is queries×k rows — vanishingly small next to the doc
    * table — so it is BROADCAST into the doc scan (a map-side semi-join;
    * the corpus is never shuffled). The prefix walk is one window over
    * ≤ k rows per query (bounded frame by construction), then one
    * query-keyed aggregation. Nothing in the plan grows with corpus
    * size except the single doc-table scan. */
  def contextAssembly(topk: DataFrame, docs: DataFrame, docIdCol: String,
                      tokenCountCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val hits = docs
      .select(col(docIdCol).as("neighbor_id"),
        col(tokenCountCol).cast("long").as("__tok"))
      .join(broadcast(topk.select("query_id", "neighbor_id", "rank")), Seq("neighbor_id"))
    val byRank = Window.partitionBy(col("query_id")).orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, 0)
    hits
      .withColumn("__running", sum(col("__tok")).over(byRank))
      .where(col("__running") <= budgetTokens || col("rank") === 1)
      .groupBy("query_id")
      .agg(count(lit(1)).cast("int").as("n_ctx_docs"),
        sum(col("__tok")).as("ctx_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("rank"), col("neighbor_id")))),
          s => s.getField("neighbor_id").cast("string")), ",").as("ctx_doc_ids"))
  }
}
