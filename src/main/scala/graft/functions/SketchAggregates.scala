package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, MapType, StringType}
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

/** Count-Min Sketch as a `TypedImperativeAggregate`: a depth×width grid
  * of counters; row d increments cell h_d(key), and est(key) =
  * min_d grid[d][h_d(key)] upper-bounds the true count (over-counts
  * only, with the usual ~N·e/width error guarantee). State is
  * O(depth·width) longs per partition REGARDLESS of key cardinality —
  * the 100 TB way to approximate per-key counts without shuffling
  * billions of distinct keys.
  *
  * Unlike most sketches this one is fully deterministic AND
  * order-independent: h_d(key) = byte d of md5(key) mod width (so a
  * SQL oracle can recompute it from the md5 hex digits), and merge is
  * an element-wise add — commutative and associative. The whole
  * estimate is therefore cross-engine reproducible, not just
  * error-bounded.
  */
case class CountMinSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
  require(width >= 2 && width <= 256,
    s"width must be in [2,256] (one md5 byte of bucket entropy), got $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(v.asInstanceOf[UTF8String].getBytes)
      var d = 0
      while (d < depth) {
        buf(d * width + (digest(d) & 0xff) % width) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData((0 until depth).map { d =>
      new GenericArrayData(
        (d * width until (d + 1) * width).map(buf).toArray[Any])
    }.toArray[Any])

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb  = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): CountMinSketch = copy(child = c.head)
}

object sketch {
  /** Approximate heavy hitters of a string column: map(item → count),
    * descending; any item with frequency > rows/k is guaranteed in. */
  def freqItems(c: Column, k: Int): Column =
    Bridge.column(MisraGriesSketch(Bridge.expr(c), k).toAggregateExpression())

  /** Count-Min Sketch of a string column: depth×width counter grid,
    * md5-bucketed (see CountMinSketch). */
  def cms(c: Column, depth: Int, width: Int): Column =
    Bridge.column(CountMinSketch(Bridge.expr(c), depth, width)
      .toAggregateExpression())
}
