package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 SINK — the write-side sibling of [[StrainApiSource]]:
  * the reference's load stage pushes scored records into a store
  * (`Scraper.py`'s SQLite INSERT loop); at scale that becomes "each
  * task POSTs its partition as batched requests, and the job commits
  * atomically or not at all". This connector implements that
  * two-phase protocol with Spark's V2 write SPI:
  *
  *  - each `DataWriter` buffers its partition's records and "POSTs"
  *    them — zero-egress build: the POST body lands as a task-private
  *    temp file (`_tmp-<task>.jsonl`), which is exactly where an HTTP
  *    batch call would go;
  *  - `commit()` per task returns the temp path as the commit
  *    message — nothing is visible yet;
  *  - the driver's `BatchWrite.commit` renames every temp file into
  *    place and drops a `_SUCCESS` manifest — the atomic flip;
  *    `abort` deletes temps, so failed/speculative tasks leak nothing.
  *
  * Record contract: exactly (k BIGINT, v STRING) — the keyed-payload
  * shape of the reference's insert. Exactly-once: rename is the
  * commit point; a re-run task overwrites its own temp, never the
  * committed output.
  */
class RecordApiSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RecordApiSink.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RecordSinkTable(properties.get("path"))
}

object RecordApiSink {
  val schema: StructType = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", StringType, nullable = false)))
}

private class RecordSinkTable(path: String) extends Table with SupportsWrite {
  require(path != null, "option 'path' is required")
  override def name(): String = s"record_api_sink($path)"
  override def schema(): StructType = RecordApiSink.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(info.schema().fieldNames.toSeq == Seq("k", "v"),
      s"record contract is (k BIGINT, v STRING), got ${info.schema()}")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new RecordSinkBatchWrite(path)
      }
    }
  }
}

private case class TempFileMessage(tmpPath: String, finalName: String)
  extends WriterCommitMessage

private class RecordSinkBatchWrite(path: String) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    new java.io.File(path).mkdirs()
    new RecordSinkWriterFactory(path)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // the atomic flip: rename every task's temp into place, then the
    // manifest — readers keying on _SUCCESS never see a partial job
    messages.foreach { case TempFileMessage(tmp, fin) =>
      val ok = new java.io.File(tmp)
        .renameTo(new java.io.File(new java.io.File(path), fin))
      require(ok, s"commit rename failed for $tmp")
    }
    new java.io.File(new java.io.File(path), "_SUCCESS").createNewFile()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case TempFileMessage(tmp, _) => new java.io.File(tmp).delete()
      case _ => ()
    }
}

private class RecordSinkWriterFactory(path: String)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new RecordSinkWriter(path, partitionId, taskId)
}

/** Task-side writer: buffers the partition and flushes it as one
  * "POST body" (a temp JSONL file here; an HTTP batch call in
  * production — the buffer/flush/commit shape is identical). */
private class RecordSinkWriter(path: String, partitionId: Int, taskId: Long)
  extends DataWriter[InternalRow] {
  private val tmp = new java.io.File(path, s"_tmp-$partitionId-$taskId.jsonl")
  private val out = new java.io.PrintWriter(
    new java.io.BufferedWriter(new java.io.FileWriter(tmp)))

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  override def write(row: InternalRow): Unit =
    out.println(s"""{"k": ${row.getLong(0)}, "v": "${esc(
      row.getUTF8String(1).toString)}"}""")

  override def commit(): WriterCommitMessage = {
    out.close()
    TempFileMessage(tmp.getPath, s"part-$partitionId.jsonl")
  }

  override def abort(): Unit = { out.close(); tmp.delete() }
  override def close(): Unit = out.close()
}
