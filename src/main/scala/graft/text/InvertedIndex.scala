package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index construction and lexical relevance scoring over a
  * document corpus — the retrieval side of a training-data platform
  * (dedup-adjacent: candidate generation, contamination lookups, BM25
  * hard-negative mining). Extension beyond the reference surface
  * (SURVEY §2.11).
  *
  * The index is emitted FLAT — `(token, doc_id, tf, posting_rank,
  * doc_freq)` — the exchange format every index shard/bucket writer wants
  * (and exactly hash-comparable by the DuckDB gate). `posting_rank` is the
  * doc's position in the token's doc_id-ordered posting list, so a
  * consumer gets posting lists back with a `groupBy(token)
  * sort_array(collect_list(...))` or reads a token-bucketed write
  * directly.
  *
  * Scale: token stream explodes once; tf aggregation shuffles on
  * (token, doc) with map-side combine; posting rank/doc_freq is ONE more
  * shuffle on token — the classic two-stage distributed index build. Write
  * the result bucketed by token (`Scale.writeBucketed`) and lookups become
  * single-bucket scans.
  */
object InvertedIndex {

  private def toks(text: Column): Column =
    Dedup.tokensNeCol(text)

  /** Flat postings (see class doc). */
  def postings(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tf = df
      .select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("token"))
      .groupBy("token", "doc_id").agg(count(lit(1)).cast("int").as("tf"))
    val byToken = Window.partitionBy(col("token"))
    tf.withColumn("posting_rank",
        row_number().over(byToken.orderBy(col("doc_id"))).cast("int"))
      .withColumn("doc_freq", count(lit(1)).over(byToken).cast("int"))
  }

  /** Integer-exact TF-IDF per document: idf is bucketed as the decimal
    * digit count of `nDocs DIV doc_freq` (the same ⌈−log₁₀⌉ quantization
    * as [[UnigramLM.withRarityScore]], same determinism rationale), so
    * `tfidf_sum = Σ_term tf·idfBucket` and `tfidf_max` are pure-integer
    * aggregates any engine reproduces bit-for-bit. Adds both per doc;
    * token-less docs get 0. */
  def withTfIdf(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val nDocs = df.count()
    // tf + UNORDERED doc_freq window (no posting_rank → no per-token sort)
    val tf = df
      .select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("token"))
      .groupBy("token", "doc_id").agg(count(lit(1)).cast("int").as("tf"))
    val p = tf
      .withColumn("doc_freq", count(lit(1)).over(Window.partitionBy(col("token"))))
      .withColumn("__idfb", length(expr(s"CAST($nDocs DIV doc_freq AS STRING)")))
    val perDoc = p.groupBy(col("doc_id").as(idCol))
      .agg(sum(col("tf") * col("__idfb")).as("__ts"),
        max(col("tf") * col("__idfb")).as("__tm"))
    df.join(perDoc, Seq(idCol), "left")
      .withColumn("tfidf_sum", coalesce(col("__ts"), lit(0L)).cast("int"))
      .withColumn("tfidf_max", coalesce(col("__tm"), lit(0L)).cast("int"))
      .drop("__ts", "__tm")
  }

  /** Continuous BM25 (Robertson/Spärck Jones; k1/b defaults per the
    * classic Okapi setting) of every document against a fixed query token
    * set — hard-negative mining / contamination lookup scoring. Float math
    * (log + division), so spec-tested rather than hash-gated. The query
    * side is a handful of terms: its df table rides in the filter, the
    * corpus streams once. */
  def bm25(df: DataFrame, textCol: String, idCol: String,
           query: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    val nDocs = df.count()
    val lens = df.select(col(idCol).as("doc_id"),
      size(toks(col(textCol))).as("dl"))
    val avgdl = lens.agg(avg("dl")).head().getDouble(0)
    // filter to query terms BEFORE aggregating: only query-term postings
    // ever shuffle, and no posting_rank sort is paid for the whole corpus
    // (the [[postings]]-then-filter form cannot push the predicate below
    // the rank window)
    val tfq = df
      .select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("token"))
      .where(col("token").isInCollection(query))
      .groupBy("token", "doc_id").agg(count(lit(1)).cast("int").as("tf"))
    val p = tfq.withColumn("doc_freq",
      count(lit(1)).over(Window.partitionBy(col("token"))).cast("int"))
    val idf = log((lit(nDocs.toDouble) - col("doc_freq") + 0.5)
      / (col("doc_freq") + 0.5) + 1.0)
    val scored = p.join(lens, Seq("doc_id"))
      .withColumn("__s", idf * (col("tf") * (k1 + 1))
        / (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / avgdl)))
      .groupBy("doc_id").agg(sum("__s").as("bm25"))
    df.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .na.fill(0.0, Seq("bm25"))
  }

  /** ENGINE-EXACT fixed-point BM25 — the oracle-checkable sibling of
    * [[bm25]] (whose log/division float math is spec-tested only). All
    * arithmetic is integer, so the score replays bit-for-bit in any SQL
    * engine:
    *
    *  - `idf` is the digit count of `nDocs DIV doc_freq` (the
    *    [[withTfIdf]] ⌈−log₁₀⌉ quantization, same determinism rationale),
    *  - `avgdl = totalTokens DIV nDocs`, `k1 = k1X10/10`, `b = bX100/100`
    *    as fixed points,
    *  - `norm_x100 = (100 − bX100) + (bX100·dl) DIV avgdl`,
    *  - `den_x1000 = tf·1000 + k1X10·norm_x100`,
    *  - per-term `score_x1000 = (idf·tf·(k1X10+10)·100000) DIV den_x1000`
    *    — the Okapi saturation curve `tf·(k1+1)/(tf + k1·norm)` scaled by
    *    10³, truncated once, summed per doc.
    *
    * Scale: query terms are filtered BEFORE any aggregation (predicate on
    * the exploded token stream — only query-term postings ever shuffle);
    * corpus totals ride a broadcast 1-row aggregate (single-job fit: no
    * `.count()`/`.head()` driver actions); doc_freq is an unordered count
    * window over the token partitioning of the already-tiny filtered tf
    * table. One scan of the corpus, one (token,doc) aggregation, one
    * broadcast join back. */
  def bm25Fixed(df: DataFrame, textCol: String, idCol: String,
                query: Seq[String], k1X10: Int = 12, bX100: Int = 75): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    require(k1X10 >= 1, "k1X10 must be >= 1")
    require(bX100 >= 0 && bX100 <= 100, "bX100 must be in 0..100")
    val lens = df.select(col(idCol).as("doc_id"),
      size(toks(col(textCol))).cast("long").as("dl"))
    val totals = broadcast(lens.agg(
      count(lit(1)).as("__n_docs"), sum("dl").as("__total_dl")))
    val tf = df
      .select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("token"))
      .where(col("token").isInCollection(query))
      .groupBy("token", "doc_id").agg(count(lit(1)).cast("long").as("tf"))
    val p = tf.withColumn("doc_freq",
      count(lit(1)).over(Window.partitionBy(col("token"))))
    val scored = p.join(lens, Seq("doc_id"))
      .crossJoin(totals)
      .withColumn("__avgdl", expr("__total_dl DIV __n_docs"))
      .withColumn("__idfb",
        length(expr("CAST(__n_docs DIV doc_freq AS STRING)")).cast("long"))
      .withColumn("__norm_x100",
        lit((100 - bX100).toLong) + expr(s"(${bX100} * dl) DIV __avgdl"))
      .withColumn("__den_x1000",
        col("tf") * 1000L + lit(k1X10.toLong) * col("__norm_x100"))
      .withColumn("__term_x1000",
        expr(s"(__idfb * tf * ${k1X10 + 10} * 100000) DIV __den_x1000"))
      .groupBy("doc_id").agg(sum("__term_x1000").as("bm25_x1000"))
    df.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .na.fill(0L, Seq("bm25_x1000"))
  }
}
