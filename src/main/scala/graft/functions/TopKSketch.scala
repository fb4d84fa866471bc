package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters summary (Metwally, Agrawal & El Abbadi,
  * ICDT 2005) used by [[TopKSketch]]: at most `capacity` monitored items,
  * each with an overestimated count `cnt` and the overestimation bound
  * `err` (`cnt − err ≤ true ≤ cnt`). Eviction replaces the current
  * minimum-count item, charging its count as the newcomer's error.
  */
final class SpaceSavingBuffer(val capacity: Int) extends Serializable {
  val items: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty
  var total: Long = 0L

  private def minCount: Long =
    if (items.isEmpty) 0L else items.valuesIterator.map(_._1).min

  def add(item: String, by: Long = 1L, err0: Long = 0L): Unit = {
    total += by
    items.get(item) match {
      case Some((c, e)) => items.update(item, (c + by, e + err0))
      case None if items.size < capacity => items.update(item, (by + err0, err0))
      case None =>
        // evict the min: newcomer inherits its count as error bound
        val (minK, (minC, _)) = items.minBy { case (k, (c, _)) => (c, k) }
        items.remove(minK)
        items.update(item, (minC + by + err0, minC + err0))
    }
  }

  /** Standard summary merge: a key absent from one side contributes that
    * side's min count (0 if that side is below capacity — then absence
    * means a true zero) as both count and error. Trims back to capacity. */
  def mergeIn(other: SpaceSavingBuffer): Unit = {
    val minSelf = if (items.size < capacity) 0L else minCount
    val minOther = if (other.items.size < other.capacity) 0L else other.minCount
    val keys = items.keySet ++ other.items.keySet
    val merged = keys.map { k =>
      val (ca, ea) = items.getOrElse(k, (minSelf, minSelf))
      val (cb, eb) = other.items.getOrElse(k, (minOther, minOther))
      k -> (ca + cb, ea + eb)
    }.toSeq
      .sortBy { case (k, (c, _)) => (-c, k) }
      .take(capacity)
    items.clear()
    merged.foreach { case (k, v) => items.update(k, v) }
    total += other.total
  }

  def topK(k: Int): Seq[(String, Long, Long)] =
    items.toSeq.map { case (key, (c, e)) => (key, c, e) }
      .sortBy { case (key, c, _) => (-c, key) }
      .take(k)
}

/** `graft_topk(item, k, capacity)` — approximate top-k heavy hitters as a
  * native mergeable aggregate (`TypedImperativeAggregate`): per-partition
  * SpaceSaving summaries of fixed size `capacity` combine map-side, merge
  * pairwise, and only ever ship `capacity` (item, cnt, err) triples per
  * partition — the streaming-algorithms answer to "top sources / tokens /
  * URLs over 100 TB" where an exact groupBy-then-sort would shuffle every
  * distinct key. Deterministic tie-breaks (count desc, item asc) at every
  * eviction/merge/emit make the result layout-stable for specs.
  *
  * Guarantees (ICDT 2005 Thm. 2, preserved by the merge): emitted
  * `cnt` ≥ true count ≥ `cnt − err`, and any item with true count >
  * total/capacity is guaranteed monitored. Choose capacity ≳ k/ε for an
  * ε·total error bound. Eviction scan is O(capacity) — fine for the
  * hundreds-of-entries summaries this targets; a real 10⁶-entry deployment
  * would back it with the min-heap from the paper.
  *
  * Returns `array<struct<item string, cnt long, err long>>`, top `k` by
  * estimated count.
  */
case class TopKSketch(child: Expression, k: Int, capacity: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingBuffer] {

  require(k > 0 && capacity >= k, "need capacity >= k > 0")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk expects a STRING item column, got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("cnt", LongType),
    StructField("err", LongType))), containsNull = false)

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(b: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: SpaceSavingBuffer, o: SpaceSavingBuffer): SpaceSavingBuffer = {
    b.mergeIn(o); b
  }

  override def eval(b: SpaceSavingBuffer): Any = {
    val rows = b.topK(k).map { case (item, c, e) =>
      InternalRow(UTF8String.fromString(item), c, e)
    }
    new GenericArrayData(rows.toArray[Any]): ArrayData
  }

  override def serialize(b: SpaceSavingBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.capacity); out.writeLong(b.total); out.writeInt(b.items.size)
    b.items.foreach { case (key, (c, e)) =>
      out.writeUTF(key); out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new SpaceSavingBuffer(in.readInt())
    buf.total = in.readLong()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val key = in.readUTF(); val c = in.readLong(); val e = in.readLong()
      buf.items.update(key, (c, e))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKSketch =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_topk"
}

object TopKSketch {
  /** Registry builder: extracts the foldable int literals for k/capacity. */
  def fromExprs(exprs: Seq[Expression]): TopKSketch = {
    require(exprs.length == 3, "graft_topk(item, k, capacity)")
    def intLit(e: Expression, name: String): Int = {
      require(e.foldable, s"$name must be a literal")
      e.eval().asInstanceOf[Number].intValue()
    }
    TopKSketch(exprs.head, intLit(exprs(1), "k"), intLit(exprs(2), "capacity"))
  }
}
