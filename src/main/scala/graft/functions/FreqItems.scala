package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native Catalyst
  * TypedImperativeAggregate — the second arm (after the typed
  * [[BottomK]] Aggregator) of the reference's generic-bolt/UDAF surface
  * (SURVEY.md O14), here at the engine level: binary-serialized partial
  * buffers, map-side partial aggregation, O(k) merge.
  *
  * Guarantees: every item with true frequency > n/(k+1) is present, and
  * each reported count undercounts the true count by at most n/(k+1).
  * With k >= number of distinct values the sketch is EXACT — which is
  * what the oracle-checked query exploits (small categorical domain),
  * while the same code path is the 100 TB heavy-hitters answer (fixed
  * k-entry state per group, no shuffle of raw values).
  *
  * Output: array<struct<item:string, cnt:bigint>> sorted by (cnt desc,
  * item) — deterministic for compare.
  */
@ExpressionDescription(
  usage = "_FUNC_(expr, k) - Misra-Gries top-k frequent items sketch over string expr.")
case class FreqItemsSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, "freq_items_sketch: k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.toString, 1L)
    buf
  }

  override def merge(
      a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (item, cnt) => insert(a, item, cnt) }
    a
  }

  /** Misra–Gries insert with weight w: if the item is tracked or a slot
    * is free, add; otherwise decrement every counter by the overflow
    * amount (the (k+1)-th largest count) and evict non-positives. */
  private def insert(buf: mutable.HashMap[String, Long], item: String, w: Long): Unit = {
    buf.get(item) match {
      case Some(c) => buf.update(item, c + w)
      case None if buf.size < k => buf.update(item, w)
      case None =>
        // overflow: decrement all by the smallest of (tracked mins, w)
        val dec = math.min(w, buf.valuesIterator.min)
        val it = buf.keysIterator.toArray
        var i = 0
        while (i < it.length) {
          val nc = buf(it(i)) - dec
          if (nc <= 0) buf.remove(it(i)) else buf.update(it(i), nc)
          i += 1
        }
        if (w - dec > 0) buf.update(item, w - dec)
    }
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray.sortBy { case (item, cnt) => (-cnt, item) }
      .map { case (item, cnt) =>
        InternalRow(UTF8String.fromString(item), cnt) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, cnt) => out.writeUTF(item); out.writeLong(cnt) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf.update(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsSketch =
    copy(child = newChildren.head)
  override def prettyName: String = "freq_items_sketch"
}

object FreqItems {
  /** Column API: freq_items_sketch(col, k). */
  def freqItemsSketch(c: Column, k: Int): Column =
    ColumnBridge.column(
      FreqItemsSketch(ColumnBridge.expression(c), k).toAggregateExpression())
}
