package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native Catalyst expression: sign-random-projection LSH keys for ALL
  * hash tables in one pass — `nTables` packed `nBits`-bit keys from
  * deterministic ±1 hyperplanes (`sign(xxh64(table, bit, dim))`), no
  * stored model.
  *
  * Replaces the per-table, per-bit interpreted `aggregate(zip_with(…))`
  * composition (nTables × nBits separate array walks) with one fused
  * O(nTables · nBits · dim) primitive loop under whole-stage codegen. */
case class SrpKeys(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def prettyName: String = "graft_srp_keys"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = first.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType, IntegerType)
        if second.foldable && third.foldable => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, foldable int nBits, foldable int nTables)")
    }

  private def sign(t: Int, bit: Int, j: Int): Double = {
    var h = XXH64.hashInt(t, 42L)
    h = XXH64.hashInt(bit, h)
    h = XXH64.hashInt(j, h)
    if ((h & 1L) == 0L) 1.0 else -1.0
  }

  override def nullSafeEval(vecAny: Any, nBitsAny: Any, nTablesAny: Any): Any = {
    val vec = vecAny.asInstanceOf[ArrayData]
    val nBits = nBitsAny.asInstanceOf[Int]
    val nTables = nTablesAny.asInstanceOf[Int]
    val dim = vec.numElements()
    val keys = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var key = 0L
      var bit = 0
      while (bit < nBits) {
        var proj = 0.0
        var j = 0
        while (j < dim) { proj += vec.getDouble(j) * sign(t, bit, j); j += 1 }
        if (proj > 0) key |= (1L << bit)
        bit += 1
      }
      keys(t) = key
      t += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, nBits, nTables) => {
      val xxh = classOf[XXH64].getName
      val dim = ctx.freshName("dim"); val keys = ctx.freshName("keys")
      val t = ctx.freshName("t"); val bit = ctx.freshName("bit")
      val j = ctx.freshName("j"); val proj = ctx.freshName("proj")
      val key = ctx.freshName("key"); val h = ctx.freshName("h")
      s"""
         |int $dim = $vec.numElements();
         |long[] $keys = new long[$nTables];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  long $key = 0L;
         |  for (int $bit = 0; $bit < $nBits; $bit++) {
         |    double $proj = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      long $h = $xxh.hashInt($t, 42L);
         |      $h = $xxh.hashInt($bit, $h);
         |      $h = $xxh.hashInt($j, $h);
         |      $proj += $vec.getDouble($j) * ((($h & 1L) == 0L) ? 1.0 : -1.0);
         |    }
         |    if ($proj > 0) $key |= (1L << $bit);
         |  }
         |  $keys[$t] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression): Expression =
    copy(first = f, second = s, third = t)
}
