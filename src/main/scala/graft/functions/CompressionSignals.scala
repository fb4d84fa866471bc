package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document compressibility signal: code-point Shannon entropy in
  * exact fixed-point integers, one pass per row. Returns
  * `struct<n_chars: bigint, n_distinct_chars: int, entropy_nats_x1e6: bigint>`.
  *
  * The Gopher-family "too compressible / too incompressible" quality filter
  * (Rae et al. 2021 run a real compressor; the entropy of the character
  * distribution is its model-free lower bound) needs a per-doc signal that is
  * (a) MAP-ONLY at 100 TB — no per-character explode + (doc, char) shuffle,
  * which is one shuffle row per input BYTE — and (b) engine-replayable for
  * the DuckDB oracle. Both come from the fixed-point form:
  *
  *   term(c)            = floor(cnt_c · ln(cnt_c) · 1e6 + 0.5)   (one double op)
  *   entropy_nats_x1e6  = max(0, n·floor(ln(n)·1e6+0.5) − Σ term(c)) div n
  *
  * Every sum is over INTEGERS (order-free — a float Σ p·ln p would hash-differ
  * across aggregation orders), and the lone float products replay exactly in
  * DuckDB (`ln` agreement on this platform is the established precedent of the
  * classifier/DSIR micro-unit weights). The max(0, ·) clamp absorbs the
  * ±1-unit rounding slack of all-same-character docs, which can otherwise
  * drive the numerator a few units negative.
  *
  * Characters are Unicode CODE POINTS (DuckDB `string_split(text, '')` and
  * `length()` agree). Empty input → (0, 0, 0).
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_char_entropy"
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct_chars", IntegerType, nullable = false),
    StructField("entropy_nats_x1e6", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(textAny: Any): Any =
    CharEntropy.signals(textAny.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, text =>
      s"graft.functions.CharEntropy.signals($text)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropy {
  /** Static kernel shared by interpreted eval and generated code. Sort +
    * run-length count (no per-row hash map): deterministic, allocation-lean. */
  def signals(s: UTF8String): InternalRow = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    val cps = new Array[Int](n)
    var i = 0
    var k = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      cps(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    java.util.Arrays.sort(cps)
    var termSum = 0L
    var distinct = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && cps(j) == cps(i)) j += 1
      val cnt = (j - i).toDouble
      termSum += math.floor(cnt * math.log(cnt) * 1e6 + 0.5).toLong
      distinct += 1
      i = j
    }
    val entropy =
      if (n == 0) 0L
      else {
        val lnN = math.floor(math.log(n.toDouble) * 1e6 + 0.5).toLong
        math.max(0L, n.toLong * lnN - termSum) / n
      }
    new GenericInternalRow(Array[Any](n.toLong, distinct, entropy))
  }
}

/** Native deflate probe: the COMPRESSED length of the UTF-8 payload under
  * `java.util.zip.Deflater` (zlib, fixed level) — the literal Gopher-style
  * compression-ratio signal for when the exact-replay constraint of
  * [[CharEntropy]] doesn't apply (no cross-engine oracle replays zlib's
  * bitstream; spec-verified instead). Map-only, codegen'd; returns int. */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_deflate_len"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(textAny: Any): Any =
    DeflateLen.deflatedLength(textAny.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, text =>
      s"graft.functions.DeflateLen.deflatedLength($text)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateLen {
  // one native Deflater per executor thread, reset() per row — allocating
  // (and JNI-initializing) a Deflater per ROW costs more than the deflate
  // itself on short documents
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6)
  }

  def deflatedLength(s: UTF8String): Int = {
    val d = local.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
