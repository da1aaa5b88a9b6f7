package graft.sources

import java.io.{BufferedWriter, File, FileWriter}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Write-side DataSource V2 connector (§2.11): the two-phase commit
  * protocol a real warehouse sink implements, made visible. Each task's
  * DataWriter streams its partition to an uncommitted part file and
  * returns a WriterCommitMessage (partition, file, row count); the
  * DRIVER's BatchWrite.commit writes the `_MANIFEST` listing exactly the
  * committed files — the atomic visibility point. Readers that resolve
  * files through the manifest (as `sink_custom` does) never observe
  * uncommitted or aborted parts: task retries leave stray files, the
  * manifest ignores them — the exactly-once recipe every table format
  * builds on (same idea as sink_foreach_batch's batchId-keyed dirs, one
  * layer lower in the stack). Local-FS paths here; on a cluster the same
  * code points at shared storage.
  *
  * Expected row schema: (bigint, string, bigint) — writes as 3-column
  * CSV lines, the simplest deterministic round-trippable encoding.
  */
class AuditSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-audit"

  // write-only: the table takes whatever schema the DataFrame brings
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AuditTable(schema,
      new CaseInsensitiveStringMap(properties).get("path"))
}

private class AuditTable(writeSchema: StructType, path: String)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_audit($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new AuditBatchWrite(info.schema(), path)
      }
    }
}

private class AuditBatchWrite(schema: StructType, path: String)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new AuditWriterFactory(schema.fields.map(_.dataType.typeName), path)

  // the atomic visibility point: only files named here are committed
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    new File(path).mkdirs()
    val w = new BufferedWriter(new FileWriter(new File(path, "_MANIFEST")))
    try messages.foreach { case AuditCommit(part, file, rows) =>
      w.write(s"$part,$file,$rows"); w.newLine()
    } finally w.close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case AuditCommit(_, file, _) => new File(file).delete(); ()
      case _ => ()
    }
}

private class AuditWriterFactory(types: Array[String], path: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    new File(path).mkdirs()
    val file = new File(path, s"part-$partitionId-$taskId.csv")
    new DataWriter[InternalRow] {
      private val out = new BufferedWriter(new FileWriter(file))
      private var rows = 0L

      override def write(r: InternalRow): Unit = {
        val cells = types.zipWithIndex.map {
          case ("long", i)   => r.getLong(i).toString
          case ("string", i) => r.getUTF8String(i).toString
          case (t, i)        => throw new IllegalArgumentException(
            s"graft-audit supports bigint/string columns, got $t at $i")
        }
        out.write(cells.mkString(",")); out.newLine()
        rows += 1
      }

      override def commit(): WriterCommitMessage = {
        out.close()
        AuditCommit(partitionId, file.getAbsolutePath, rows)
      }

      override def abort(): Unit = { out.close(); file.delete(); () }
      override def close(): Unit = ()
    }
  }
}

private case class AuditCommit(part: Int, file: String, rows: Long)
    extends WriterCommitMessage
