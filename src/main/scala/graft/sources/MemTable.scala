package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap


import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Write-side DataSource V2: a named in-memory table implementing the
  * full two-phase commit protocol (the connector tier of SURVEY.md
  * §2.9; the read side's twin is `SeqSource`). The reference's raw
  * sink is "serialize the batch, land it atomically as one object"
  * (/root/reference/Kafka/Consumer/consumer_etl.py:63-67) — this is
  * that contract as a native connector, with the atomicity supplied by
  * Spark's commit protocol instead of S3 object semantics:
  *
  *  - Each task's `DataWriter` buffers its partition's rows and ships
  *    them to the driver as its `WriterCommitMessage` — NOT by mutating
  *    shared state. Rows from speculative/failed/aborted attempts
  *    therefore never become visible; only messages from task attempts
  *    Spark decided won are passed to `BatchWrite.commit`.
  *  - `commit` installs all partitions' rows into the registry in one
  *    reference swap — readers see the whole batch or nothing.
  *  - `abort` discards the messages; the previous table version stays.
  *  - Overwrite mode works via `SupportsTruncate` (truncate-then-append
  *    inside the same commit — still atomic at the swap).
  *
  * This is exactly the shape of a production connector whose external
  * store has a transactional "install manifest" step; the in-memory
  * registry stands in for that store so the protocol itself is what
  * the spec exercises (SourcesSpec pins append/overwrite/abort).
  */
class MemTable extends TableProvider {
  // schema comes from the DataFrame on write, from the registry on read
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MemTable.registry.get(MemTable.name(options)) match {
      case null => throw new IllegalArgumentException(
        s"mem table '${MemTable.name(options)}' does not exist yet")
      case v => v.schema
    }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MemTableImpl(properties.get("name") match {
      case null => "default"
      case n    => n
    }, schema)
}

object MemTable {
  private[sources] final case class Version(schema: StructType,
      rows: Array[Array[InternalRow]])

  /** name → committed version. One JVM-wide registry: in local mode
    * that's the whole story; on a cluster the registry lives on the
    * driver and rows reach it through commit messages, so the protocol
    * is cluster-shaped even though the store is not. */
  private[sources] val registry = new ConcurrentHashMap[String, Version]()

  private[sources] def name(options: CaseInsensitiveStringMap): String =
    Option(options.get("name")).getOrElse("default")

  /** Test hook: committed row count without going through a scan. */
  def committedRows(name: String): Long =
    registry.get(name) match {
      case null => -1L
      case v    => v.rows.iterator.map(_.length.toLong).sum
    }

  def drop(name: String): Unit = registry.remove(name)
}

private[sources] class MemTableImpl(tableName: String, writeSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"mem($tableName)"
  override def schema(): StructType =
    Option(MemTable.registry.get(tableName)).map(_.schema).getOrElse(writeSchema)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new MemScan(tableName)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemWriteBuilder(tableName, info.schema(), truncate = false)
}

private[sources] class MemWriteBuilder(tableName: String, schema: StructType,
    truncate: Boolean) extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new MemWriteBuilder(tableName, schema, truncate = true)

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new MemBatchWrite(tableName, schema, truncate)
  }
}

private[sources] final case class MemCommitMessage(rows: Array[InternalRow])
  extends WriterCommitMessage

private[sources] class MemBatchWrite(tableName: String, schema: StructType,
    truncate: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new MemWriterFactory

  /** All-or-nothing install: runs on the driver once every task has
    * committed. A concurrent writer to the same name loses the race at
    * the registry swap, never interleaves rows. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val incoming = messages.map(_.asInstanceOf[MemCommitMessage].rows)
    MemTable.registry.compute(tableName, (_, prev) => {
      val base =
        if (truncate || prev == null) Array.empty[Array[InternalRow]]
        else prev.rows
      MemTable.Version(schema, base ++ incoming)
    })
  }

  /** Nothing was installed, so nothing to roll back — the buffered
    * task output simply gets garbage-collected. */
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class MemWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      override def write(record: InternalRow): Unit = buf += record.copy()
      override def commit(): WriterCommitMessage = MemCommitMessage(buf.toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}

private[sources] class MemScan(tableName: String) extends Scan with Batch {
  private val version = MemTable.registry.get(tableName) match {
    case null => throw new IllegalArgumentException(
      s"mem table '$tableName' does not exist")
    case v => v
  }

  override def readSchema(): StructType = version.schema
  override def description(): String = s"GraftMem($tableName)"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    version.rows.indices.map(i => MemPartition(tableName, i): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[MemPartition]
        val rows = MemTable.registry.get(p.tableName).rows(p.idx)
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = rows(i)
          override def close(): Unit = ()
        }
      }
    }
}

private[sources] final case class MemPartition(tableName: String, idx: Int)
  extends InputPartition
