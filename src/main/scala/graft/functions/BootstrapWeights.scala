package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: ALL `R` Poisson(1) bootstrap weights of a
  * row in one kernel pass — the per-(row × replicate) hot loop of
  * [[graft.ops.Stats.bootstrapReplicates]] without materializing any of
  * the R md5 hex strings, `conv` base-16 parses, or 9-branch `when`
  * chains the Column form evaluates per exploded row.
  *
  * Weight semantics are bit-identical to the portable md5 gate the
  * bootstrap oracle replays in DuckDB (reference resampling semantics:
  * `databricks-demo-feature-store` random-split utilities are seeded
  * hash gates, not RNG state):
  * `u = conv(substring(md5(concat_ws('|', key, replicate, salt)),1,15),16,10)
  *        % 1e9`
  * and weight k is drawn when u lands in the cumulative-Poisson(1)
  * interval `[cum(k−1), cum(k))`, tail-capped at 8. The first 15 hex
  * digits of the md5 are exactly the high 60 bits of the digest's first
  * 8 bytes ([[DsirBuckets.bucket60]] contract), so no hex string is ever
  * built; the digest prefix `keyBytes ⧺ '|'` is fed once per replicate
  * from the same byte array and only the replicate's decimal digits and
  * the salt bytes differ per iteration.
  *
  * Contract: `key` is the `'|'`-joined row identity (non-null; callers
  * pre-join with `concat_ws` which never yields NULL). `nReplicates` and
  * `salt` must be foldable — weights are `array<int>` of length
  * `nReplicates`, `containsNull = false`.
  *
  * Measured motivation (r11 verdict "What's wrong" #1): q_stat_bootstrap
  * spent 9.7 s honest at sf0.1 on ~4.8M md5-of-concat Column evaluations;
  * this kernel computes the same 32 weights per row in one call. */
case class BootstrapWeights(first: Expression, second: Expression,
                            third: Expression) extends TernaryExpression {

  override def prettyName: String = "graft_bootstrap_weights"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = first.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, StringType)
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string key, foldable int nReplicates, " +
          "foldable string salt)")
    }

  override def nullSafeEval(keyAny: Any, repsAny: Any, saltAny: Any): Any =
    BootstrapWeights.compute(keyAny.asInstanceOf[UTF8String],
      repsAny.asInstanceOf[Int], saltAny.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (key, reps, salt) =>
      s"${ev.value} = graft.functions.BootstrapWeights.compute($key, $reps, $salt);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Native Catalyst expression: ALL `depth` Count-Min bucket ids of an
  * item in one kernel pass — the per-(row × depth) hot loop of
  * [[graft.ops.Sketches.cmsCells]]. Bucket semantics are bit-identical
  * to the portable Column form the CMS oracle replays in DuckDB:
  * `substring(md5(concat(d, '|', item)), 1, hexChars)` — element `d` of
  * the output is the lowercase hex prefix of the digest of
  * `dDigits ⧺ '|' ⧺ itemBytes`, built straight from the digest bytes
  * (no full 32-char hex string, no substring, no concat buffer).
  * `depth` and `hexChars` must be foldable; output is `array<string>` of
  * length `depth`, `containsNull = false`. */
case class CmsBuckets(first: Expression, second: Expression,
                      third: Expression) extends TernaryExpression {

  override def prettyName: String = "graft_cms_buckets"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = first.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string item, foldable int depth, " +
          "foldable int hexChars)")
    }

  override def nullSafeEval(itemAny: Any, depthAny: Any, hexAny: Any): Any =
    CmsBuckets.compute(itemAny.asInstanceOf[UTF8String],
      depthAny.asInstanceOf[Int], hexAny.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (item, depth, hex) =>
      s"${ev.value} = graft.functions.CmsBuckets.compute($item, $depth, $hex);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CmsBuckets {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val Sep = Array[Byte]('|'.toByte)
  private val HexDigits = "0123456789abcdef".getBytes

  def compute(item: UTF8String, depth: Int, hexChars: Int): ArrayData = {
    val itemBytes = item.getBytes
    val out = new Array[UTF8String](depth)
    val d = md.get()
    var row = 0
    while (row < depth) {
      d.reset()
      d.update(java.lang.Integer.toString(row)
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      d.update(Sep); d.update(itemBytes)
      val digest = d.digest()
      val hex = new Array[Byte](hexChars)
      var i = 0
      while (i < hexChars) {
        val b = digest(i >> 1) & 0xff
        hex(i) = HexDigits(if ((i & 1) == 0) b >> 4 else b & 0xf)
        i += 1
      }
      out(row) = UTF8String.fromBytes(hex)
      row += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }
}

object BootstrapWeights {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val Sep = Array[Byte]('|'.toByte)

  /** Cumulative Poisson(1) thresholds scaled to 1e9 (floor); tail capped
    * at 8 — the exact constants of `Stats.PoissonCum9` and the DuckDB
    * oracle's CASE chain. */
  private val PoissonCum9 = Array(367879441L, 735758882L, 919698602L,
    981011843L, 996340153L, 999405815L, 999916758L, 999989750L)

  def compute(key: UTF8String, nReplicates: Int, salt: UTF8String): ArrayData = {
    val keyBytes = key.getBytes
    val saltBytes = salt.getBytes
    val out = new Array[Int](nReplicates)
    val d = md.get()
    var r = 0
    while (r < nReplicates) {
      d.reset()
      d.update(keyBytes); d.update(Sep)
      d.update(java.lang.Integer.toString(r)
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      d.update(Sep); d.update(saltBytes)
      val digest = d.digest()
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
      val u = (v >>> 4) % 1000000000L
      var k = 0
      while (k < PoissonCum9.length && u >= PoissonCum9(k)) k += 1
      out(r) = k
      r += 1
    }
    new GenericArrayData(out)
  }
}
