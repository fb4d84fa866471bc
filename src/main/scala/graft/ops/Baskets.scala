package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules over order line items (extension
  * beyond the reference surface — the co-occurrence analysis every
  * retail feature store runs next to its per-item aggregates; the same
  * counts also feed negative-sampling and co-view features).
  *
  * All rule metrics are ENGINE-EXACT fixed-point integers (micro-unit
  * support/confidence/lift via integral division of exact counts), so
  * the DuckDB oracle replays them bit-for-bit.
  */
object Baskets {

  /** Distinct (basket, item) memberships with oversized baskets DROPPED:
    * pair generation is quadratic in basket size, so a hard cap keeps
    * the self-join bounded BY CONSTRUCTION (CLAUDE.md invariant 9 — the
    * same occupancy discipline as the dedup candidate joins). The cap is
    * a documented semantic: a 10k-item basket is a warehouse transfer,
    * not a signal-bearing co-purchase. */
  def basketItems(lines: DataFrame, basketCol: String, itemCol: String,
                  maxBasketSize: Int = 64): DataFrame = {
    // ONE basket-keyed exchange (r15; was three): hashpartitioning(basket)
    // already satisfies the (basket, item) dedup's clustering (subset
    // rule), and the size cap rides a basket-window count instead of a
    // groupBy + join-back — so the dedup, the cap, and the downstream
    // basket-keyed pair self-joins all reuse this single shuffle. The
    // count is pinned (fan-out): the pair generation downstream is
    // CPU-quadratic per basket, exactly what AQE's byte-based coalescing
    // under-parallelizes.
    val nParts = lines.sparkSession.sessionState.conf.numShufflePartitions
    lines.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .repartition(nParts, col("basket"))
      .dropDuplicates("basket", "item")
      .withColumn("__sz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("basket")))
      .where(col("__sz") <= maxBasketSize)
      .drop("__sz")
  }

  /** Undirected item co-purchase graph: one edge per DISTINCT unordered
    * item pair that shares at least one surviving basket, emitted as
    * `(u, v)` with `u < v`. Edge volume is bounded by
    * `n_baskets · cap²` ([[basketItems]]'s size cap — invariant 9), so
    * the graph grows linearly in baskets at fixed cap. Feeds
    * [[graft.ops.Graph.triangleStats]]. */
  def coPurchaseEdges(memberships: DataFrame): DataFrame =
    memberships.as("a")
      .join(memberships.as("b"), col("a.basket") === col("b.basket") &&
        col("a.item") < col("b.item"))
      .select(col("a.item").as("u"), col("b.item").as("v"))
      .distinct()

  /** Item-PAIR association rules with support ≥ `minPairCount` baskets.
    * Emits BOTH rule directions per unordered pair:
    * `support_micros = n_ab·10⁶ div n_baskets`,
    * `confidence_micros = n_ab·10⁶ div n_antecedent`,
    * `lift_micros = (confidence_micros·n_baskets) div n_consequent` —
    * the two-step form keeps every intermediate ≤ 10⁶·n_baskets (a
    * single-product `n_ab·n_baskets·10⁶` would overflow Long on a
    * 10¹⁰-basket corpus); the div-then-div rounding is deterministic
    * and the oracle replays the identical two steps.
    *
    * Scale: one basket-keyed self-join (both sides the same membership
    * frame, occupancy ≤ maxBasketSize by [[basketItems]] construction,
    * `item_a < item_b` halves the output) → pair counts collapse
    * map-side; item counts and the basket total are item-dim-sized
    * broadcasts. Nothing is ever all-pairs over the ITEM universe —
    * only pairs that co-occur in a surviving basket exist. */
  def pairRules(memberships: DataFrame, minPairCount: Long = 2L): DataFrame = {
    val m = memberships.select(col("basket"), col("item")).localCheckpoint()
    val nBaskets = m.select(countDistinct("basket").as("n_baskets"))
    val itemCounts = m.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val pairCounts = m.as("a")
      .join(m.as("b"), col("a.basket") === col("b.basket") &&
        col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minPairCount)
    val directed = pairCounts.unionByName(
      pairCounts.select(col("item_b").as("item_a"),
        col("item_a").as("item_b"), col("n_ab")))
    directed
      .join(broadcast(itemCounts.withColumnsRenamed(
        Map("item" -> "item_a", "n_item" -> "n_a"))), Seq("item_a"))
      .join(broadcast(itemCounts.withColumnsRenamed(
        Map("item" -> "item_b", "n_item" -> "n_b"))), Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        expr("(n_ab * 1000000L) div n_baskets").as("support_micros"),
        expr("(n_ab * 1000000L) div n_a").as("confidence_micros"),
        expr("(((n_ab * 1000000L) div n_a) * n_baskets) div n_b")
          .as("lift_micros"))
  }
}
