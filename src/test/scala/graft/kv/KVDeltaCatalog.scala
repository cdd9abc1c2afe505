package graft.kv

import java.util
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Test-scope in-memory keyed-table catalog that supports Spark 4's
  * row-level MERGE (`Dataset.mergeInto`) via DELTA writes — the harness
  * for `Merge.upsertMergeInto`'s parity test. The built-in file sources
  * can't execute MERGE (no SupportsRowLevelOperations), so exercising
  * the engine-native MERGE path needs a connector that can: this one
  * keeps rows in a driver-side map keyed by the table's `keys` property
  * and applies the insert/update/delete actions Spark's WriteDelta plan
  * emits. Read path hands the row snapshot to a single partition —
  * test-scale only, deliberately minimal; production analogs are
  * Delta/Iceberg. NOT part of the shipped library (test classpath).
  */
object KVStore {
  final class State(val schema: StructType, val keys: Seq[String]) {
    val rows = TrieMap.empty[Seq[Any], Row]
    def keyOf(r: Row): Seq[Any] = keyIdx.map(r.get)
    private val keyIdx = keys.map(schema.fieldIndex)
  }
  val tables = TrieMap.empty[String, State]
  def seed(name: String, rows: Seq[Row]): Unit = {
    val st = tables(name)
    rows.foreach(r => st.rows.put(st.keyOf(r), r))
  }
  def snapshot(name: String): Seq[Row] = tables(name).rows.values.toSeq
  def clear(): Unit = tables.clear()
}

class KVDeltaCatalog extends TableCatalog {
  private var catalogName: String = _
  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  private def key(ident: Identifier) =
    (ident.namespace :+ ident.name).mkString(".")

  override def listTables(ns: Array[String]): Array[Identifier] =
    KVStore.tables.keys.toArray.map { k =>
      val parts = k.split("\\.")
      Identifier.of(parts.init, parts.last)
    }
  override def loadTable(ident: Identifier): Table =
    KVStore.tables.get(key(ident))
      .map(st => new KVTable(key(ident), st))
      .getOrElse(throw new NoSuchTableException(ident))
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    if (KVStore.tables.contains(key(ident)))
      throw new TableAlreadyExistsException(ident)
    val keys = properties.asScala.getOrElse("keys", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(keys.nonEmpty, "KVDeltaCatalog tables need a 'keys' property")
    // keys are row IDs; Spark (correctly) rejects nullable row-id
    // attributes, so a keyed table's keys are NOT NULL by construction
    val keyed = StructType(schema.fields.map(f =>
      if (keys.contains(f.name)) f.copy(nullable = false) else f))
    val st = new KVStore.State(keyed, keys)
    KVStore.tables.put(key(ident), st)
    new KVTable(key(ident), st)
  }
  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table =
    throw new UnsupportedOperationException("alterTable")
  override def dropTable(ident: Identifier): Boolean =
    KVStore.tables.remove(key(ident)).isDefined
  override def renameTable(from: Identifier, to: Identifier): Unit =
    throw new UnsupportedOperationException("renameTable")
}

class KVTable(tableName: String, state: KVStore.State) extends Table
    with SupportsRead with SupportsWrite with SupportsRowLevelOperations {
  override def name(): String = tableName
  override def schema(): StructType = state.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE).asJava

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    () => new KVScan(tableName, state)

  // plain append (test seeding via DataFrame write, if used)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new KVAppendWrite(tableName, info.schema())
      }
    }

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new KVDeltaOperation(tableName, state, info.command())
}

/** Full-snapshot scan: one partition carrying external rows (the store
  * is driver-side; the partition is what ships to the task). */
class KVScan(tableName: String, state: KVStore.State) extends Scan with Batch {
  override def readSchema(): StructType = state.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(KVPartition(state.rows.values.toArray))
  override def createReaderFactory(): PartitionReaderFactory =
    new KVReaderFactory(state.schema)
}

case class KVPartition(rows: Array[Row]) extends InputPartition

class KVReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val rows = p.asInstanceOf[KVPartition].rows
      private val conv = CatalystTypeConverters.createToCatalystConverter(schema)
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = conv(rows(i)).asInstanceOf[InternalRow]
      override def close(): Unit = ()
    }
}

/** The delta-based row-level operation: Spark rewrites MERGE into a join
  * of this operation's scan against the source and feeds the resulting
  * insert/update/delete actions to the DeltaWriter. `rowId` names the
  * key columns, so updates/deletes address rows by key. */
class KVDeltaOperation(tableName: String, state: KVStore.State,
                       cmd: RowLevelOperation.Command) extends SupportsDelta {
  override def command(): RowLevelOperation.Command = cmd
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    () => new KVScan(tableName, state)
  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite =
          new KVDeltaBatchWrite(tableName, info.schema(),
            info.rowIdSchema().orElse(null))
      }
    }
  override def rowId(): Array[NamedReference] =
    state.keys.map(Expressions.column).toArray
}

sealed trait KVOp extends Serializable
case class KVInsert(row: Row) extends KVOp
case class KVUpdate(id: Row, row: Row) extends KVOp
case class KVDelete(id: Row) extends KVOp
case class KVCommit(ops: Seq[KVOp]) extends WriterCommitMessage

class KVDeltaBatchWrite(tableName: String, rowSchema: StructType,
                        idSchema: StructType) extends DeltaBatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory =
    new KVDeltaWriterFactory(rowSchema, idSchema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val st = KVStore.tables(tableName)
    // deletes/updates address by key BEFORE inserts land, so a MERGE
    // that moves a row to a new key can't collide with its own insert
    val ops = messages.flatMap(_.asInstanceOf[KVCommit].ops)
    def keyOfId(id: Row): Seq[Any] =
      st.keys.map(k => id.get(idSchema.fieldIndex(k)))
    ops.foreach {
      case KVDelete(id) => st.rows.remove(keyOfId(id))
      case KVUpdate(id, _) => st.rows.remove(keyOfId(id))
      case _ => ()
    }
    ops.foreach {
      case KVInsert(row) => st.rows.put(st.keyOf(row), row)
      case KVUpdate(_, row) => st.rows.put(st.keyOf(row), row)
      case _ => ()
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class KVDeltaWriterFactory(rowSchema: StructType,
                           idSchema: StructType) extends DeltaWriterFactory {
  override def createWriter(partitionId: Int,
                            taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      private val toRow = CatalystTypeConverters
        .createToScalaConverter(rowSchema)
      private val toId = CatalystTypeConverters
        .createToScalaConverter(idSchema)
      private val buf = scala.collection.mutable.ArrayBuffer.empty[KVOp]
      override def insert(row: InternalRow): Unit =
        buf += KVInsert(toRow(row).asInstanceOf[Row])
      override def update(meta: InternalRow, id: InternalRow,
                          row: InternalRow): Unit =
        buf += KVUpdate(toId(id).asInstanceOf[Row],
          toRow(row).asInstanceOf[Row])
      override def delete(meta: InternalRow, id: InternalRow): Unit =
        buf += KVDelete(toId(id).asInstanceOf[Row])
      override def commit(): WriterCommitMessage = KVCommit(buf.toSeq)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}

/** Append-only batch write for seeding through the DataFrame API. */
class KVAppendWrite(tableName: String,
                    schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new DataWriterFactory {
      override def createWriter(pid: Int,
                                tid: Long): DataWriter[InternalRow] =
        new DataWriter[InternalRow] {
          private val toRow = CatalystTypeConverters
            .createToScalaConverter(schema)
          private val buf = scala.collection.mutable.ArrayBuffer.empty[KVOp]
          override def write(row: InternalRow): Unit =
            buf += KVInsert(toRow(row).asInstanceOf[Row])
          override def commit(): WriterCommitMessage = KVCommit(buf.toSeq)
          override def abort(): Unit = buf.clear()
          override def close(): Unit = ()
        }
    }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val st = KVStore.tables(tableName)
    messages.flatMap(_.asInstanceOf[KVCommit].ops).foreach {
      case KVInsert(row) => st.rows.put(st.keyOf(row), row)
      case _ => ()
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}
