package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Misra–Gries heavy-hitters sketch as a `TypedImperativeAggregate`
  * (the UDAF tier of the extension ladder, SURVEY.md §2.9).
  *
  * Keeps ≤ k-1 counters; on overflow, decrements every counter (and
  * drops zeros) — the classic guarantee: any item with true frequency
  * > N/k survives, and each reported count undercounts by at most N/k.
  * Sketches merge associatively (sum counters, then re-shrink), so the
  * aggregate is a proper partial+final distributed aggregation: at
  * 100 TB this finds frequent tokens/domains/fingerprints in one pass
  * with O(k) state per partition — where an exact groupBy would
  * shuffle billions of distinct keys.
  *
  * Buffer serialization is a flat (count, [len,bytes,count]*) byte
  * stream — no JVM serialization on the shuffle path.
  */
case class MisraGriesSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(k >= 2, s"sketch size k must be >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType)

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  private def add(buf: mutable.HashMap[UTF8String, Long], key: UTF8String,
      n: Long): Unit = {
    buf.get(key) match {
      case Some(c) => buf.update(key, c + n)
      case None if buf.size < k - 1 => buf.update(key.clone(), n)
      case None =>
        // decrement-all by the amount that empties at least one slot
        val dec = math.min(n, buf.valuesIterator.min)
        val dead = buf.iterator.collect { case (ky, c) if c <= dec => ky }.toList
        buf.mapValuesInPlace((_, c) => c - dec)
        dead.foreach(buf.remove)
        if (n > dec) add(buf, key, n - dec)
    }
  }

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String], 1L)
    buf
  }

  override def merge(b1: mutable.HashMap[UTF8String, Long],
      b2: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b2.foreach { case (key, c) => add(b1, key, c) }
    b1
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (key, c) => (-c, key.toString) }
    new ArrayBasedMapData(
      new GenericArrayData(sorted.map(_._1).toArray[Any]),
      new GenericArrayData(sorted.map(_._2).toArray[Any]))
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      val b = key.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in  = new DataInputStream(new ByteArrayInputStream(bytes))
    val n   = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b   = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MisraGriesSketch = copy(child = c.head)
}

object sketch {
  /** Approximate heavy hitters of a string column: map(item → count),
    * descending; any item with frequency > rows/k is guaranteed in. */
  def freqItems(c: Column, k: Int): Column =
    Bridge.column(MisraGriesSketch(Bridge.expr(c), k).toAggregateExpression())
}
