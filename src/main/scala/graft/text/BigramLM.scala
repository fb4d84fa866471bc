package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus bigram language model with stupid backoff — the next rung above
  * [[UnigramLM]] on the perplexity-filtering ladder (CCNet/KenLM proxy):
  * a document whose token TRANSITIONS are improbable under the corpus
  * reads as disfluent even when every individual token is common.
  * Extension beyond the reference surface (SURVEY §2.11); the reference's
  * closest analog is single-column categorizing
  * (`src/packages/preprocessing/transformers/feature_generation.py:121-192`).
  *
  * Determinism contract (the [[UnigramLM]] decade scheme): each transition
  * scores an INTEGER decade count via the three-level backoff
  *
  *  - seen bigram:       `digits(T2 DIV c2(a,b))`
  *  - unseen, seen `b`:  `1 + digits(T1 DIV c1(b))`   (backoff penalty)
  *  - `b` unseen:        `2 + digits(T1)`             (max penalty)
  *
  * with `T2`/`T1` the total bigram/token occurrences of the FIT corpus —
  * ⌈−log₁₀ p⌉-style buckets, exact BIGINT everywhere, so per-doc sums
  * hash-match any engine bit-for-bit. Bigrams key as the space-joined
  * token pair (tokens cannot contain spaces post-normalization).
  *
  * Scale (100 TB): fitting is one map-only bigram stream → two
  * vocab-keyed aggregates (map-side combine); totals ride as a broadcast
  * 1-row agg inside the plan (single-job fit, the Dsir/Classifier
  * pattern). Scoring joins the transition stream against the count
  * tables — broadcast when the vocab fits (`broadcastVocab`, default),
  * plain hash joins keyed by bigram/token otherwise — then one
  * scalar-only doc-keyed shuffle. Driver never sees row data. */
object BigramLM {

  private def toksCol(text: Column): Column =
    Dedup.tokensNeCol(text)

  /** Map-only `(keepCols…, bg, b)` transition stream: bg = "a b" joined
    * key, b = the successor token (backoff key). Docs with < 2 tokens
    * emit nothing. `__toks` stays a ≥2-reference projection barrier. */
  private def transitions(df: DataFrame, textCol: String,
                          keepCols: Seq[String]): DataFrame =
    df.withColumn("__toks", toksCol(col(textCol)))
      .where(size(col("__toks")) >= 2)
      .select(keepCols.map(col) :+ posexplode(
        transform(sequence(lit(1), size(col("__toks")) - 1),
          i => concat_ws(" ", element_at(col("__toks"), i),
            element_at(col("__toks"), i + 1)))).as(Seq("__pos", "bg")): _*)
      .withColumn("b", substring_index(col("bg"), " ", -1))
      .drop("__pos")

  /** Corpus bigram-occurrence counts `(bg, c2)`. */
  def bigramCounts(df: DataFrame, textCol: String): DataFrame =
    transitions(df, textCol, Seq.empty)
      .groupBy("bg").agg(count(lit(1)).as("c2"))

  /** Adds `n_transitions` (INT), the integer-exact `bigram_rarity`
    * (BIGINT, sum of per-transition decade scores) and `bigram_rarity_max`
    * (INT) to `df`, scored against the bigram/unigram statistics of
    * `corpus` (which may be `df` itself — then backoff never fires — or a
    * disjoint training split — then unseen transitions/tokens take the
    * penalty levels). Docs with < 2 tokens score 0. */
  def scoreDocs(df: DataFrame, corpus: DataFrame, textCol: String,
                idCol: String, broadcastVocab: Boolean = true): DataFrame = {
    val big = bigramCounts(corpus, textCol)
    val uni = UnigramLM.unigramCounts(corpus, textCol)
      .withColumnRenamed("token", "b").withColumnRenamed("cnt", "c1")
    val totals = big.agg(sum("c2").as("__t2"))
      .crossJoin(uni.agg(sum("c1").as("__t1")))
    val bigJ = if (broadcastVocab) broadcast(big) else big
    val uniJ = if (broadcastVocab) broadcast(uni) else uni
    val scored = transitions(df, textCol, Seq(idCol))
      .join(bigJ, Seq("bg"), "left")
      .join(uniJ, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("__r",
        when(col("c2").isNotNull,
            length(expr("CAST(__t2 DIV c2 AS STRING)")))
          .when(col("c1").isNotNull,
            lit(1) + length(expr("CAST(__t1 DIV c1 AS STRING)")))
          .otherwise(lit(2) + length(expr("CAST(__t1 AS STRING)")))
          .cast("long"))
    val perDoc = scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("__n"), sum("__r").as("__s"), max("__r").as("__m"))
    df.join(perDoc, Seq(idCol), "left")
      .withColumn("n_transitions", coalesce(col("__n"), lit(0L)).cast("int"))
      .withColumn("bigram_rarity", coalesce(col("__s"), lit(0L)).cast("long"))
      .withColumn("bigram_rarity_max", coalesce(col("__m"), lit(0L)).cast("int"))
      .drop("__n", "__s", "__m")
  }
}
