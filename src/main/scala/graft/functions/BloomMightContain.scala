package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate: does a serialized Bloom filter possibly
  * contain the key? `graft_bloom_might_contain(key, bloom_bytes)` — the
  * codegen'd replacement for the per-row Scala UDF form of
  * [[graft.ops.Sketches.bloomPruneJoin]] (the only executor-path UDF left
  * in round 2), mirroring Spark's internal `BloomFilterMightContain` used
  * by AQE's runtime bloom pushdown.
  *
  * The second child must be a FOLDABLE binary literal (the
  * `BloomFilter.writeTo` serialization); it is deserialized ONCE per
  * expression instance, and codegen references the deserialized filter via
  * `addReferenceObj` — zero per-row overhead beyond the contains probe,
  * inside whole-stage codegen.
  *
  * Keys: integral types probe `mightContainLong` (widened, not cast — a
  * non-integral key is a TYPE ERROR, not a silent null-filter, fixing the
  * round-2 `cast("long")` hazard); strings probe the UTF-8 bytes, matching
  * what `DataFrameStatFunctions.bloomFilter` inserts for string columns.
  */
case class BloomMightContain(value: Expression, bloomLit: Expression)
    extends BinaryExpression {

  override def left: Expression = value
  override def right: Expression = bloomLit
  override def prettyName: String = "graft_bloom_might_contain"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = {
    if (bloomLit.dataType != BinaryType || !bloomLit.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable binary bloom-filter argument")
    else value.dataType match {
      case ByteType | ShortType | IntegerType | LongType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName supports integral or string keys, got ${other.simpleString}")
    }
  }

  @transient private lazy val bloom: BloomFilter = {
    val bytes = bloomLit.eval().asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(v: Any, ignoredBytes: Any): Any = value.dataType match {
    case StringType => bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
    case _ => bloom.mightContainLong(v.asInstanceOf[Number].longValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (v, _) => value.dataType match {
      case StringType => s"${ev.value} = $bf.mightContainBinary($v.getBytes());"
      case _ => s"${ev.value} = $bf.mightContainLong((long) $v);"
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(value = newLeft, bloomLit = newRight)
}
