package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native Catalyst expression: MinHash signature of an `array<string>` in
  * one fused pass — `numHashes` seeded XXH64 minima computed in a tight
  * two-level loop with whole-stage codegen.
  *
  * Why native: the composed higher-order-function form
  * (`transform(sequence(…), seed -> array_min(transform(grams, …)))`) is a
  * `CodegenFallback` tree — every lambda element allocates and evaluates
  * interpreted, and it re-walks the gram array once per seed through
  * generic eval. This expression hashes each gram once per seed via the
  * static `XXH64` kernel with zero per-element allocation. Used by
  * [[graft.text.Dedup]] as the signature fast path; `numHashes` must be a
  * foldable int literal.
  */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_minhash"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = left.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, foldable int), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  @transient private lazy val numHashes: Int =
    right.eval().asInstanceOf[Int]

  override def nullSafeEval(gramsAny: Any, nAny: Any): Any = {
    val arr = gramsAny.asInstanceOf[ArrayData]
    val k = nAny.asInstanceOf[Int]
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      val s = arr.getUTF8String(j)
      var seed = 0
      while (seed < k) {
        val h = XXH64.hashUTF8String(s, seed.toLong)
        if (h < out(seed)) out(seed) = h
        seed += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (grams, n) => {
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val seed = ctx.freshName("seed")
      val len = ctx.freshName("len")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val xxh = classOf[XXH64].getName
      s"""
         |long[] $out = new long[$n];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |int $len = $grams.numElements();
         |for (int $j = 0; $j < $len; $j++) {
         |  UTF8String $s = $grams.getUTF8String($j);
         |  for (int $seed = 0; $seed < $n; $seed++) {
         |    long $h = $xxh.hashUTF8String($s, (long) $seed);
         |    if ($h < $out[$seed]) $out[$seed] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
