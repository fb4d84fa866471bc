package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) entity matching — the approximate-join step of an
  * entity-resolution / record-linkage pipeline (matching dirty entity names
  * against a master dimension, the operational cousin of the reference's
  * exact dimension joins, `merge_tables/joins.py`). Candidates come from
  * blocking, matches from an exact Levenshtein verify (engine-portable
  * unit-cost edit distance), so the OUTPUT is blocking-independent and
  * exactly reproducible; only the candidate count depends on the strategy.
  *
  * Two candidate strategies, picked by `maxDist`:
  *
  *  - d ≤ 2 — DELETION NEIGHBORHOODS (FastSS; Bocek et al., "Fast
  *    Similarity Search in Large Dictionaries", 2007): every string emits
  *    the xxhash64 of each variant obtained by deleting up to d
  *    characters. If ed(s,r) ≤ d, an optimal alignment leaves ≤ d
  *    unmatched characters on each side; deleting them yields a COMMON
  *    variant, so true pairs always share a key. Variants keep all of the
  *    string's entropy (unlike grams), which is what survives fixed-format
  *    corpora ("Customer#000000042"): q-gram rarity prefixes degenerate
  *    there because only 2-3 positions carry entropy (measured 1.8-22M
  *    candidates and 7-60 s at sf0.1 for every gram/band variant tried),
  *    while deletion blocks hold a handful of strings (0.4 s). Key count
  *    is 1+len for d=1 and O(len²) for d=2 — 8-byte hashes, so the d=2
  *    explode is ~len²/2 longs per string; past ~64-char strings at d=2
  *    prefer the gram path.
  *
  *  - d ≥ 3 — Ed-Join probing prefix (Xiao, Wang, Lin, VLDB 2008), the
  *    edit-distance sibling of [[Dedup.ngramJaccardPairs]]'s Bayardo
  *    prefix filter: one edit overlaps ≤ q positional grams, so among any
  *    q·d + 1 grams (taken ascending by corpus frequency under one global
  *    order) one survives content-equal within position shift d. Strings
  *    too short for the guarantee (≤ q·d grams) fall back to exact-length
  *    keys (left emits its length, right emits lengths ±d — complete
  *    because ed ≤ d bounds the length difference).
  */
object Fuzzy {

  /** xxhash64 keys of all ≤d-deletion variants of `s` (d ∈ {1, 2};
    * includes the string itself), deduplicated. sequence() guards matter:
    * sequence(1,0) counts DOWN in Spark, it is not empty. */
  private def deletionKeys(s: Column, d: Int): Column = {
    val d0 = array(xxhash64(s))
    val d1 = when(length(s) >= 1,
      transform(sequence(lit(1), length(s)), i =>
        xxhash64(concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))))
      .otherwise(array().cast("array<bigint>"))
    val d2 = when(length(s) >= 2,
      flatten(transform(sequence(lit(1), length(s) - 1), i =>
        transform(sequence(i + 1, length(s)), j =>
          xxhash64(concat(s.substr(lit(1), i - 1),
            s.substr(i + 1, j - i - 1),
            s.substr(j + 1, length(s))))))))
      .otherwise(array().cast("array<bigint>"))
    val all = d match {
      case 1 => concat(d0, d1)
      case 2 => concat(d0, d1, d2)
    }
    array_distinct(all)
  }

  /** All positional q-grams of `s` as (pos, gram) structs; empty when
    * `len(s) < q`. */
  private def grams(s: Column, q: Int): Column =
    when(length(s) >= q,
      transform(sequence(lit(1), length(s) - (q - 1)),
        i => struct(i.as("pos"), s.substr(i, lit(q)).as("gram"))))
      .otherwise(array().cast("array<struct<pos:int,gram:string>>"))

  /** Inner-join `left` to `right` on `levenshtein(leftCol, rightCol) <=
    * maxDist`, appending the distance as `lev_dist`. `q` is the gram
    * width of the d ≥ 3 prefix path (unused for d ≤ 2); `extraBlock`
    * optionally adds an exact-match equality `(leftExpr, rightExpr)` the
    * pair must also satisfy.
    *
    * Scale: candidate generation works on DISTINCT strings and bounded
    * keys (deletion-variant hashes, or rarity-ranked gram prefixes) —
    * never all-pairs; the quadratic Levenshtein verify runs once per
    * distinct candidate STRING pair, and payload rows re-attach by two
    * equi-joins at the end.
    *
    * CAVEAT (measured r12): that re-attach is an equi-join on the string,
    * so the OUTPUT scales with the key's duplication product — a corpus
    * where each name appears k× on BOTH sides emits k² rows per matched
    * string pair regardless of how candidates were blocked (a scaled
    * corpus with replica-duplicated names hit ~10⁴× base output and an
    * 80 GB ENOSPC spill at sf10). Deduplicate or pre-aggregate payloads
    * before fuzzy-joining on a heavily duplicated key. */
  def fuzzyJoinBlocked(left: DataFrame, leftCol: String,
                       right: DataFrame, rightCol: String,
                       maxDist: Int, q: Int = 3,
                       extraBlock: Option[(Column, Column)] = None): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    require(q >= 1, "q must be >= 1")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty, s"overlapping column names: ${shared.mkString(", ")}")
    val d = maxDist

    val ls = left.select(col(leftCol).as("__s")).where(col("__s").isNotNull)
      .distinct().withColumn("__side", lit(0))
    val rs = right.select(col(rightCol).as("__s")).where(col("__s").isNotNull)
      .distinct().withColumn("__side", lit(1))
    val strs = ls.unionByName(rs)

    val candidates =
      if (d <= 2) {
        val dd = math.max(d, 1) // d=0 still needs the identity key
        val keyed = strs.select(col("__side"), col("__s"),
          explode(deletionKeys(col("__s"), dd)).as("__key"))
        keyed.where(col("__side") === 0).select(col("__s").as("__ls"), col("__key"))
          .join(keyed.where(col("__side") === 1)
            .select(col("__s").as("__rs"), col("__key")), "__key")
          .where(abs(length(col("__ls")) - length(col("__rs"))) <= d)
          .select("__ls", "__rs").distinct()
      } else {
        val prefixLen = q * d + 1
        val shortLen = q * (d + 1) - 1 // #grams <= q*d  <=>  len <= shortLen
        val exploded = strs
          .select(col("__side"), col("__s"), explode(grams(col("__s"), q)).as("__g"))
          .select(col("__side"), col("__s"), col("__g.pos").as("__pos"),
            col("__g.gram").as("__gram"))
        val byGram = Window.partitionBy(col("__gram"))
        val byStr = Window.partitionBy(col("__side"), col("__s"))
          .orderBy(col("__df"), xxhash64(col("__gram")), col("__gram"), col("__pos"))
        val prefixKeys = exploded
          .withColumn("__df", count(lit(1)).over(byGram))
          .withColumn("__rk", row_number().over(byStr))
          .where(col("__rk") <= prefixLen)
          .select(col("__side"), col("__s"), col("__pos"),
            concat(lit("g:"), col("__gram")).as("__key"))
        val shortL = strs.where(col("__side") === 0 && length(col("__s")) <= shortLen)
          .select(col("__side"), col("__s"), lit(0).as("__pos"),
            concat(lit("l:"), length(col("__s"))).as("__key"))
        val shortR = strs.where(col("__side") === 1)
          .select(col("__side"), col("__s"), lit(0).as("__pos"),
            explode(filter(sequence(length(col("__s")) - d, length(col("__s")) + d),
              l => l >= 0 && l <= shortLen)).as("__l"))
          .select(col("__side"), col("__s"), col("__pos"),
            concat(lit("l:"), col("__l")).as("__key"))
        val lkeys = prefixKeys.where(col("__side") === 0).unionByName(shortL)
          .select(col("__s").as("__ls"), col("__pos").as("__lpos"), col("__key"))
        val rkeys = prefixKeys.where(col("__side") === 1).unionByName(shortR)
          .select(col("__s").as("__rs"), col("__pos").as("__rpos"), col("__key"))
        lkeys.join(rkeys, "__key")
          // Ed-Join location filter: the guaranteed surviving gram sits
          // within position shift d
          .where(abs(col("__lpos") - col("__rpos")) <= d &&
            abs(length(col("__ls")) - length(col("__rs"))) <= d)
          .select("__ls", "__rs").distinct()
      }

    val verified = candidates
      .withColumn("lev_dist", levenshtein(col("__ls"), col("__rs")))
      .where(col("lev_dist") <= d)
    val out = left.join(verified, col(leftCol) === col("__ls"))
      .join(right, col("__rs") === col(rightCol))
      .drop("__ls", "__rs")
    extraBlock match {
      case Some((le, re)) => out.where(le === re)
      case None => out
    }
  }
}
