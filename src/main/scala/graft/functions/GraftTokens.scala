package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the graft latin tokenizer
  * `split(regexp_replace(lower(trim(text)), cls, ''), '\s+')` as ONE
  * kernel — `cls` is `[^a-z0-9áéíóúñü ]` (keepAccents) or `[^a-z0-9 ]`,
  * with an optional empty-token drop replacing the `filter(_ ≠ '')` HOF
  * that used to follow it.
  *
  * Bit-identical to the Column chain it replaces: UTF8String.trim (SQL
  * trim — ASCII space only, NOT java String.trim), UTF8String.toLowerCase
  * (SQL lower), the same java.util.regex patterns with `replaceAll("")`,
  * and `Pattern.split(s, -1)` (SQL split keeps trailing empties; an empty
  * string still yields `[""]`).
  *
  * Why a kernel (r11 measurement): the Column chain embedded
  * regexp/split/HOF-lambda trees whose NamedLambdaVariable exprIds leak
  * into the generated source — every REBUILT DataFrame misses the
  * whole-stage-codegen cache and re-janino-compiles (~1 s per stage per
  * invocation; the first-ever compile of a tokenizer stage measured
  * 7.7 s). This expression generates one static call, so the stage source
  * is invariant across plan instances and compiles once per JVM. */
case class GraftTokens(first: Expression, second: Expression,
                       third: Expression) extends TernaryExpression {

  override def prettyName: String = "graft_tokens"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = first.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, BooleanType, BooleanType)
        if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, foldable bool keepAccents, foldable bool dropEmpty)")
    }

  override def nullSafeEval(t: Any, ka: Any, de: Any): Any =
    GraftTokens.compute(t.asInstanceOf[UTF8String],
      ka.asInstanceOf[Boolean], de.asInstanceOf[Boolean])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, ka, de) =>
      s"${ev.value} = graft.functions.GraftTokens.compute($t, $ka, $de);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object GraftTokens {
  import java.util.regex.Pattern

  private val KeepAccents = Pattern.compile("[^a-z0-9áéíóúñü ]")
  private val StripAccents = Pattern.compile("[^a-z0-9 ]")
  private val Ws = Pattern.compile("\\s+")

  def compute(text: UTF8String, keepAccents: Boolean,
              dropEmpty: Boolean): ArrayData = {
    val s = text.trim().toLowerCase.toString
    val p = if (keepAccents) KeepAccents else StripAccents
    val cleaned = p.matcher(s).replaceAll("")
    val parts = Ws.split(cleaned, -1)
    val n = parts.length
    val out = new Array[AnyRef](n)
    var k = 0
    var i = 0
    while (i < n) {
      if (!dropEmpty || parts(i).nonEmpty) {
        out(k) = UTF8String.fromString(parts(i)); k += 1
      }
      i += 1
    }
    new GenericArrayData(
      (if (k == n) out else java.util.Arrays.copyOf(out, k)).asInstanceOf[Array[Any]])
  }
}
