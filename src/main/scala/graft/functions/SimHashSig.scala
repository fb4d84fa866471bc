package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: 64-bit SimHash of an `array<string>` token
  * array in one fused pass — each token hashed once (XXH64), its bits
  * voted ±1 into 64 counters, sign-packed into a long. Replaces the
  * interpreted nested-`aggregate` formulation (which re-walks the token
  * hashes once per bit position) with a single O(tokens × 64) primitive
  * loop under whole-stage codegen. */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_simhash"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(tokensAny: Any): Any = {
    val arr = tokensAny.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) out |= (1L << i); i += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, tokens => {
      val counts = ctx.freshName("counts")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      val xxh = classOf[XXH64].getName
      s"""
         |int[] $counts = new int[64];
         |int $n = $tokens.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $xxh.hashUTF8String($tokens.getUTF8String($j), 42L);
         |  for (int $i = 0; $i < 64; $i++) {
         |    if ((($h >>> $i) & 1L) == 1L) $counts[$i]++; else $counts[$i]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $i = 0; $i < 64; $i++) if ($counts[$i] > 0) $out |= (1L << $i);
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
