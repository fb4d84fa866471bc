package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native adjacent-repeat token scrub: collapse runs of the SAME
  * whitespace-delimited token to one occurrence ("the the the" → "the") in a
  * single byte-level pass over the UTF-8 payload. Returns
  * `struct<text_scrubbed: string, n_removed: int>`.
  *
  * Replaces the `zip_with(tokens, shifted, …)` composition in
  * [[graft.text.Repetition.scrubAdjacentRepeats]]: `zip_with` is
  * CodegenFallback (interpreted per row), and the composed form materializes
  * three intermediate arrays (tokens, shifted copy, kept) plus a rejoin per
  * row. Here nothing is materialized but the output bytes: tokens are maximal
  * runs of non-whitespace BYTES (the whitespace class is exactly Java regex
  * `\s` = `[ \t\n\x0B\f\r]`, all ASCII — multi-byte UTF-8 sequences contain
  * only bytes ≥ 0x80, so the byte scan is character-exact), and adjacent
  * equality is a byte-region compare.
  *
  * Semantics pinned by RepetitionSpec's differential test against the
  * composed-HOF form: same tokenization (empty tokens dropped), same
  * single-space rejoin, same `n_removed` = tokens − kept.
  */
case class ScrubRepeats(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_scrub_repeats"
  override def dataType: DataType = StructType(Seq(
    StructField("text_scrubbed", StringType, nullable = false),
    StructField("n_removed", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(textAny: Any): Any =
    ScrubRepeats.scrub(textAny.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, text =>
      s"graft.functions.ScrubRepeats.scrub($text)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ScrubRepeats {

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Static kernel shared by interpreted eval and generated code (Scala
    * emits a static forwarder on the companion class, so the codegen call
    * `graft.functions.ScrubRepeats.scrub(...)` resolves from Java). */
  def scrub(s: UTF8String): InternalRow = {
    val b = s.getBytes
    val n = b.length
    val out = new Array[Byte](n)
    var outLen = 0
    var ntok = 0
    var kept = 0
    var prevStart = -1
    var prevLen = -1
    var i = 0
    while (i < n) {
      while (i < n && isWs(b(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(b(i))) i += 1
        val len = i - start
        ntok += 1
        var same = len == prevLen
        if (same) {
          var j = 0
          while (same && j < len) {
            if (b(start + j) != b(prevStart + j)) same = false
            j += 1
          }
        }
        if (!same) {
          if (kept > 0) { out(outLen) = ' '; outLen += 1 }
          System.arraycopy(b, start, out, outLen, len)
          outLen += len
          kept += 1
          prevStart = start
          prevLen = len
        }
      }
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromBytes(java.util.Arrays.copyOf(out, outLen)),
      ntok - kept))
  }
}
