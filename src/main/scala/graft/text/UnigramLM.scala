package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-derived unigram language-model scoring: how "expected" a
  * document's tokens are under the corpus's own token distribution — the
  * self-contained proxy for the KenLM-perplexity quality filters used in
  * CCNet/Gopher data pipelines (no external model, the corpus IS the
  * model). Rare-token-dominated docs (OCR noise, codes, mojibake) score as
  * outliers. Extension beyond the reference surface (SURVEY §2.11).
  *
  * Topology (both variants): ONE explode of the token stream → wordcount
  * aggregation (map-side combine; shuffle = distinct tokens per partition)
  * → token stream joins the frequency table (BROADCAST by default — a
  * natural-language vocabulary is millions of entries, not corpus-sized;
  * pass broadcastVocab=false to let Catalyst/AQE pick a shuffle join when
  * the "vocabulary" is unbounded) → one per-doc aggregation.
  *
  * Two scores:
  *  - [[withRarityScore]] — ORACLE-GRADE determinism: per-token rarity is
  *    the decimal digit count of `totalTokens DIV cnt(w)` (an integer-only
  *    ⌈−log₁₀ p⌉ bucket), per-doc mean/max are exact-integer aggregates
  *    rounded once. No floating-point accumulation anywhere, so any engine
  *    reproduces the hash bit-for-bit.
  *  - [[withUnigramLogProb]] — the continuous mean log₁₀ P(w) users
  *    actually filter on. Double summation order is partition-dependent
  *    (like any float agg), so this one is spec-tested, not hash-compared.
  */
object UnigramLM {

  /** Normalized non-empty tokens (same normalization as the dedup kit). */
  private def toks(text: Column): Column =
    Dedup.tokensNeCol(text)

  /** `(token, cnt)` corpus frequencies. */
  def unigramCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(toks(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** Vocabulary COVERAGE curve — the tokenizer-sizing question ("how many
    * word types cover X% of the token stream") answered exactly: the
    * top-`topK` vocabulary in (frequency desc, token) order with each
    * rank's cumulative token mass and `coverage_x10000 =
    * cum·10⁴ div total` (exact integer fixed point). Reading the curve at
    * a target coverage gives the vocab size a word-level tokenizer needs;
    * the complement of [[vocabSpectrum]]'s tail-health view.
    *
    * Scale: the corpus collapses to the unigram aggregate (vocab-sized,
    * map-side combined); the total rides as a broadcast 1-row agg inside
    * the plan and the ranking window runs over VOCAB rows (the
    * q_text_vocab precedent), never corpus rows. */
  def vocabCoverage(df: DataFrame, textCol: String, topK: Int = 30): DataFrame = {
    val counts = unigramCounts(df, textCol)
    val total = counts.agg(sum("cnt").as("__total"))
    val w = Window.orderBy(col("cnt").desc, col("token"))
    counts.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w))
      .withColumn("cum_cnt", sum("cnt").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .where(col("rank") <= topK)
      .select(col("rank"), col("token"), col("cnt"), col("cum_cnt"),
        expr("cum_cnt * 10000 div __total").as("coverage_x10000"))
  }

  /** Frequency-of-frequencies spectrum — the Zipf-health audit of a
    * corpus vocabulary (the "frequency spectrum" of quantitative
    * linguistics; the r=1 hapax mass is what Good-Turing smoothing keys
    * on): for each frequency DECADE (digit count of the token count —
    * the same integer-exact bucketing as the rarity scores), how many
    * vocabulary types sit there and how much token mass they carry. A
    * healthy natural corpus is hapax-heavy; a template-heavy or
    * duplicated crawl shows mass piled in high decades.
    *
    * Returns `(freq_decade, n_types, n_tokens)` — all exact integers.
    *
    * Scale: the vocabulary aggregate (map-side combined, shuffle =
    * distinct tokens) collapsed to ≤ ~10 decade rows — strictly cheaper
    * than the unigram scoring passes that share its first stage. */
  def vocabSpectrum(df: DataFrame, textCol: String): DataFrame =
    unigramCounts(df, textCol)
      .withColumn("freq_decade", length(col("cnt").cast("string")).cast("int"))
      .groupBy("freq_decade")
      .agg(count(lit(1)).as("n_types"), sum("cnt").as("n_tokens"))

  /** Vocabulary GROWTH curve — the Heaps'-law audit (Heaps 1978,
    * `V(n) ∝ n^β`): distinct types first observed in each successive
    * `1/buckets` slice of the corpus (documents in `idCol` order).
    * A healthy open-vocabulary corpus keeps minting types in every slice;
    * a flat tail means the vocabulary has SATURATED — which is exactly the
    * regime where gram-keyed pair operators go quadratic (the r9 sf1
    * measurement: 29k distinct 3-grams for 50k docs → 139.6M genuine
    * candidate pairs in [[Dedup.ngramJaccardPairs]]; see SCALE.md). Run
    * this audit BEFORE choosing between exact gram pairs and MinHash-LSH.
    *
    * Returns `(corpus_slice ∈ 1..buckets, new_types, cum_types)` — exact
    * integers; slices that mint no new types are absent.
    *
    * Scale: one token-keyed MIN aggregate (first-seen doc; the wordcount
    * shape — shuffle = vocabulary mass, never occurrences); document
    * ranks come from [[Packing.curriculumOrder]]'s two-phase prefix rank
    * (no corpus-wide single-task window); the final rollup is ≤ `buckets`
    * rows. */
  def vocabGrowth(df: DataFrame, textCol: String, idCol: String,
                  buckets: Int = 10): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val nDocs = df.count()
    val ranks = Packing.curriculumOrder(
      df.select(col(idCol)), idCol, idCol)
      .select(col(idCol).as("__rid"), col("curriculum_pos").as("__pos"))
    val firstSeen = df
      .select(col(idCol).as("__id"), explode(toks(col(textCol))).as("token"))
      .groupBy("token").agg(min(col("__id")).as("__first"))
    firstSeen.join(ranks, col("__first") === col("__rid"))
      .withColumn("corpus_slice",
        (expr(s"(__pos * $buckets) div CAST(${math.max(nDocs, 1L)} AS BIGINT)")
          + 1).cast("int"))
      .groupBy("corpus_slice")
      .agg(count(lit(1)).as("new_types"))
      .withColumn("cum_types",
        sum("new_types").over(Window.orderBy("corpus_slice")
          .rowsBetween(Window.unboundedPreceding, 0)))
  }

  private def joined(df: DataFrame, textCol: String, idCol: String,
                     broadcastVocab: Boolean): (DataFrame, Long) = {
    val counts = unigramCounts(df, textCol)
    val total = counts.agg(sum("cnt")).head().getLong(0)
    val vocab = if (broadcastVocab) broadcast(counts) else counts
    val stream = df.select(col(idCol), explode(toks(col(textCol))).as("token"))
    (stream.join(vocab, Seq("token")), total)
  }

  /** Adds `n_tokens_lm`, `rarity_mean` (round-4), `rarity_max` — the
    * integer-exact bucketed rarity (see class doc). Docs with no tokens
    * get 0 / 0.0 / 0. */
  def withRarityScore(df: DataFrame, textCol: String, idCol: String,
                      broadcastVocab: Boolean = true): DataFrame = {
    val (j, total) = joined(df, textCol, idCol, broadcastVocab)
    val perDoc = j
      .withColumn("__rar", length(expr(s"CAST($total DIV cnt AS STRING)")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n"), sum("__rar").as("__rsum"),
        max("__rar").as("__rmax"))
    df.join(perDoc, Seq(idCol), "left")
      .withColumn("n_tokens_lm", coalesce(col("__n"), lit(0L)).cast("int"))
      .withColumn("rarity_mean", coalesce(
        floor(col("__rsum") / col("__n").cast("double") * 10000 + 0.5) / 10000,
        lit(0.0)))
      .withColumn("rarity_max", coalesce(col("__rmax"), lit(0)).cast("int"))
      .drop("__n", "__rsum", "__rmax")
  }

  /** Adds `mean_log10_prob` = mean over tokens of log₁₀(cnt(w)/total) —
    * the continuous filter score (float aggregation; see class doc). */
  def withUnigramLogProb(df: DataFrame, textCol: String, idCol: String,
                         broadcastVocab: Boolean = true): DataFrame = {
    val (j, total) = joined(df, textCol, idCol, broadcastVocab)
    val perDoc = j
      .withColumn("__lp", log10(col("cnt") / lit(total.toDouble)))
      .groupBy(col(idCol)).agg(avg("__lp").as("mean_log10_prob"))
    df.join(perDoc, Seq(idCol), "left")
  }
}
