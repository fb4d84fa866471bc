package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native Catalyst expression: SORTED DISTINCT 64-bit hashes of the word
  * n-grams of a token array, without ever materializing gram strings.
  *
  * Each token is hashed once; a gram hash is the XXH64-chained combination
  * of its n token hashes — so the whole n-gram set costs O(tokens·n) long
  * ops instead of O(tokens·n·chars) string builds. Output feeds
  * [[JaccardSorted]] (sorted-set intersection) and [[MinHashLong]]
  * (signature), making the dedup prep pipeline allocation-free after
  * tokenization. */
case class NgramHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_ngram_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = left.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, foldable int n)")
    }

  override def nullSafeEval(tokensAny: Any, nAny: Any): Any = {
    val arr = tokensAny.asInstanceOf[ArrayData]
    val n = nAny.asInstanceOf[Int]
    val len = arr.numElements()
    val tokenHashes = new Array[Long](len)
    var i = 0
    while (i < len) {
      tokenHashes(i) = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      i += 1
    }
    val count = math.max(len - n + 1, if (len > 0) 1 else 0)
    val grams = new Array[Long](count)
    i = 0
    while (i < count) {
      var h = 42L
      var j = i
      val end = math.min(i + n, len)
      while (j < end) { h = XXH64.hashLong(tokenHashes(j), h); j += 1 }
      grams(i) = h
      i += 1
    }
    java.util.Arrays.sort(grams)
    // distinct on the sorted array
    var out = 0
    i = 0
    while (i < count) {
      if (i == 0 || grams(i) != grams(i - 1)) { grams(out) = grams(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(grams, out))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tokens, n) => {
      val xxh = classOf[XXH64].getName
      val len = ctx.freshName("len"); val th = ctx.freshName("th")
      val grams = ctx.freshName("grams"); val count = ctx.freshName("count")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val end = ctx.freshName("end")
      val out = ctx.freshName("out")
      s"""
         |int $len = $tokens.numElements();
         |long[] $th = new long[$len];
         |for (int $i = 0; $i < $len; $i++)
         |  $th[$i] = $xxh.hashUTF8String($tokens.getUTF8String($i), 42L);
         |int $count = java.lang.Math.max($len - $n + 1, $len > 0 ? 1 : 0);
         |long[] $grams = new long[$count];
         |for (int $i = 0; $i < $count; $i++) {
         |  long $h = 42L;
         |  int $end = java.lang.Math.min($i + $n, $len);
         |  for (int $j = $i; $j < $end; $j++) $h = $xxh.hashLong($th[$j], $h);
         |  $grams[$i] = $h;
         |}
         |java.util.Arrays.sort($grams);
         |int $out = 0;
         |for (int $i = 0; $i < $count; $i++)
         |  if ($i == 0 || $grams[$i] != $grams[$i - 1]) $grams[$out++] = $grams[$i];
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($grams, $out));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature over PRE-HASHED grams (`array<long>`): per seed, the
  * minimum of `XXH64.hashLong(gram, seed)` — pairs with [[NgramHashes]] to
  * keep the whole signature path primitive. */
case class MinHashLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_minhash_long"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = left.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<long>, foldable int)")
    }

  override def nullSafeEval(gramsAny: Any, nAny: Any): Any = {
    val arr = gramsAny.asInstanceOf[ArrayData]
    val k = nAny.asInstanceOf[Int]
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val g = arr.getLong(j)
      var seed = 0
      while (seed < k) {
        val h = XXH64.hashLong(g, seed.toLong)
        if (h < out(seed)) out(seed) = h
        seed += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (grams, n) => {
      val xxh = classOf[XXH64].getName
      val out = ctx.freshName("out"); val len = ctx.freshName("len")
      val j = ctx.freshName("j"); val seed = ctx.freshName("seed")
      val g = ctx.freshName("g"); val h = ctx.freshName("h")
      s"""
         |long[] $out = new long[$n];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |int $len = $grams.numElements();
         |for (int $j = 0; $j < $len; $j++) {
         |  long $g = $grams.getLong($j);
         |  for (int $seed = 0; $seed < $n; $seed++) {
         |    long $h = $xxh.hashLong($g, (long) $seed);
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
