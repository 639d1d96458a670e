package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A full DataSource V2 batch source: deterministic sequence generator
  * with REAL pushdown surfaces, the custom-source tier of SURVEY.md
  * §2.9 (the reference's only "source" beyond files is its synthetic
  * telemetry producer, /root/reference/Kafka/Producer/Producer.py:125-137
  * — this is that idea as a native Spark connector instead of an
  * external process).
  *
  * Why it matters at 100 TB: a connector is where scan-time efficiency
  * is won or lost. This source demonstrates the three mechanisms a
  * production connector must implement, end-to-end and spec-pinned:
  *
  *  - `SupportsPushDownFilters`: id-range predicates TIGHTEN THE
  *    GENERATION RANGE itself (the analog of parquet row-group/partition
  *    pruning) — a pushed `id >= x` means those rows are never produced,
  *    not produced-then-dropped. Fully-handled filters are consumed;
  *    anything else is returned as residual for Spark to re-apply.
  *  - `SupportsPushDownRequiredColumns`: only requested columns are
  *    materialized per row (column pruning reaches the reader).
  *  - `planInputPartitions`: the range splits into `parts` contiguous
  *    slices — reader parallelism is the source's job, not repartition's.
  *
  * Everything generated is exact integer arithmetic (Knuth
  * multiplicative hash mod 2^32), so a DuckDB oracle reproduces the
  * stream bit-for-bit — the source is hash-checked like every other
  * operator, not just smoke-tested.
  *
  * Columns: id BIGINT, bucket = id % 97, mval = (id*2654435761) % 2^32,
  * uval = mval / 2^32 (exact: mval < 2^32 is double-representable and
  * the divisor is a power of two).
  */
class SeqSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val rows  = Option(properties.get("rows")).map(_.toLong).getOrElse(1L << 20)
    val parts = Option(properties.get("parts")).map(_.toInt).getOrElse(8)
    val batch = Option(properties.get("batchRows")).map(_.toLong).getOrElse(rows)
    new SeqTable(rows, parts, batch)
  }
}

object SeqSource {
  val MIX = 2654435761L // Knuth's multiplicative constant
  val MOD = 1L << 32

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("mval", LongType, nullable = false),
    StructField("uval", DoubleType, nullable = false)))
}

private[sources] class SeqTable(rows: Long, parts: Int, batchRows: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_seq($rows)"
  override def schema(): StructType = SeqSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(rows, parts, batchRows)
}

private[sources] class SeqScanBuilder(rows: Long, parts: Int, batchRows: Long)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = rows
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SeqSource.schema

  /** id-range (and the trivially-true IsNotNull) filters are consumed
    * into [lo, hi) generation bounds; everything else is residual. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, residual) = filters.partition {
      case GreaterThan("id", _: java.lang.Long)        => true
      case GreaterThanOrEqual("id", _: java.lang.Long) => true
      case LessThan("id", _: java.lang.Long)           => true
      case LessThanOrEqual("id", _: java.lang.Long)    => true
      case EqualTo("id", _: java.lang.Long)            => true
      case IsNotNull(_)                                => true
      case _                                           => false
    }
    handled.foreach {
      case GreaterThan("id", v: java.lang.Long)        => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: java.lang.Long) => lo = math.max(lo, v.longValue)
      case LessThan("id", v: java.lang.Long)           => hi = math.min(hi, v.longValue)
      case LessThanOrEqual("id", v: java.lang.Long)    => hi = math.min(hi, v + 1)
      case EqualTo("id", v: java.lang.Long) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, v + 1)
      case _ => ()
    }
    pushed = handled
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new SeqScan(lo, hi, parts, required, batchRows)
}

private[sources] class SeqScan(lo: Long, hi: Long, parts: Int,
    schema: StructType, batchRows: Long) extends Scan with Batch {
  override def readSchema(): StructType = schema

  /** Pushdown state surfaces in `explain` — PlanSpec pins it. */
  override def description(): String =
    s"GraftSeq range=[$lo,$hi) cols=${schema.fieldNames.mkString(",")}"

  override def toBatch: Batch = this

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SeqMicroBatchStream(lo, hi, parts, schema, batchRows)

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(0L, hi - lo)
    val chunk = math.max(1L, (n + parts - 1) / parts)
    (0 until parts).iterator
      .map(i => SeqPartition(lo + i * chunk, math.min(hi, lo + (i + 1) * chunk)))
      .filter(p => p.lo < p.hi)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(schema.fieldNames)
}

private[sources] case class SeqPartition(lo: Long, hi: Long) extends InputPartition

private[sources] final case class SeqOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

/** The streaming face of the connector: the same deterministic range,
  * admitted in bounded micro-batches. Implements the two interfaces a
  * production rate-limited source needs:
  *
  *  - `SupportsAdmissionControl`: each batch's end offset is
  *    min(target, start + batchRows) — backpressure as the SOURCE's
  *    contract (the reference caps its poll loop the same way,
  *    /root/reference/Kafka/Consumer/consumer_etl.py:30-53).
  *  - `SupportsTriggerAvailableNow`: pins the target offset at query
  *    start, so AvailableNow drains exactly the rows that existed then,
  *    across as many micro-batches as the admission limit implies, and
  *    terminates.
  *
  * Offsets are plain row counts — restart-safe by construction (the
  * generator is pure, so replaying [start, end) is idempotent). */
private[sources] class SeqMicroBatchStream(lo: Long, hi: Long, parts: Int,
    schema: StructType, batchRows: Long) extends MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private var target: Long = hi

  override def prepareForTriggerAvailableNow(): Unit = target = hi

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchRows)

  override def initialOffset(): Offset = SeqOffset(lo)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val start = startOffset.asInstanceOf[SeqOffset].n
    val cap = limit match {
      case m: ReadMaxRows => math.min(target, start + m.maxRows())
      case _              => target
    }
    SeqOffset(math.max(start, cap))
  }

  override def reportLatestOffset(): Offset = SeqOffset(target)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SeqOffset].n
    val e = end.asInstanceOf[SeqOffset].n
    val n = math.max(0L, e - s)
    val chunk = math.max(1L, (n + parts - 1) / parts)
    (0 until parts).iterator
      .map(i => SeqPartition(s + i * chunk, math.min(e, s + (i + 1) * chunk)))
      .filter(p => p.lo < p.hi)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(schema.fieldNames)

  override def deserializeOffset(json: String): Offset = SeqOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Ships only the pruned column list to executors; each reader computes
  * just those fields per row. */
private[sources] class SeqReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SeqPartition]
    new PartitionReader[InternalRow] {
      private var id   = p.lo - 1
      private val row  = new GenericInternalRow(cols.length)
      override def next(): Boolean = { id += 1; id < p.hi }
      override def get(): InternalRow = {
        val mval = (id * SeqSource.MIX) % SeqSource.MOD
        var i = 0
        while (i < cols.length) {
          row.update(i, cols(i) match {
            case "id"     => id
            case "bucket" => (id % 97).toInt
            case "mval"   => mval
            case "uval"   => mval.toDouble / SeqSource.MOD
          })
          i += 1
        }
        row
      }
      override def close(): Unit = ()
    }
  }
}
