package graft.sources.v2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter,
  DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write,
  WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType,
  StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITE half of the DataSource V2 surface (the read half is
  * [[SyntheticProvider]]): a line-format sink implementing the full V2
  * commit protocol the way every transactional writer must —
  *
  *  - each task's [[DataWriter]] streams rows to a STAGING file
  *    (`_tmp/part-<partition>-<task>`), never the final name;
  *  - task `commit()` returns the staged name as its commit message;
  *    speculative/failed attempts `abort()` and delete their staging;
  *  - job `commit()` atomically renames exactly the files named in the
  *    commit messages into place and drops `_SUCCESS` LAST — a reader
  *    either sees a complete committed output or none of it;
  *  - job `abort()` removes the staging tree, leaving no partial
  *    output (asserted in LineSinkSpec).
  *
  * This is the same two-phase discipline Merge/Versioned use at the
  * table level, here at the V2 task/job protocol level where Spark
  * drives it. Line format keeps the IO trivial (tab-joined fields of
  * atomic types) so the protocol, not a codec, is what is under test.
  *
  * Scale posture: writers stream row-at-a-time with O(1) state; the
  * commit message is one file name per task; job commit is |tasks|
  * renames on the driver — the standard V2 cost model.
  */
class LineSinkProvider extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  // a pure sink: reads are not supported, so schema inference is the
  // caller's query schema (passed to getTable)
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Nil)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new LineSinkTable(schema,
      Option(properties.get("path")).getOrElse(
        throw new IllegalArgumentException("LineSink requires a 'path'")))
}

class LineSinkTable(schema: StructType, path: String)
    extends Table with SupportsWrite {
  override def name(): String = s"line_sink($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new LineBatchWrite(info.schema(), path)
      }
    }
}

case class LineTaskCommit(stagedFile: String) extends WriterCommitMessage

class LineBatchWrite(schema: StructType, path: String) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new LineWriterFactory(schema, path)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = Paths.get(path)
    Files.createDirectories(root)
    messages.foreach { case LineTaskCommit(staged) =>
      val src = Paths.get(staged)
      Files.move(src, root.resolve(src.getFileName),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
    // marker LAST: presence == every task file is in place
    Files.write(root.resolve("_SUCCESS"), Array.emptyByteArray)
    deleteTree(root.resolve("_tmp"))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    deleteTree(Paths.get(path).resolve("_tmp"))

  private def deleteTree(p: java.nio.file.Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
}

class LineWriterFactory(schema: StructType, path: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new LineDataWriter(schema, path, partitionId, taskId)
}

class LineDataWriter(schema: StructType, path: String, partitionId: Int,
    taskId: Long) extends DataWriter[InternalRow] {
  private val staged =
    Paths.get(path, "_tmp", f"part-$partitionId%05d-$taskId")
  Files.createDirectories(staged.getParent)
  private val out = Files.newBufferedWriter(staged, StandardCharsets.UTF_8)

  private def fmt(row: InternalRow, i: Int, dt: DataType): String =
    if (row.isNullAt(i)) "" else dt match {
      case LongType => row.getLong(i).toString
      case DoubleType => row.getDouble(i).toString
      case StringType => row.getUTF8String(i).toString
      case other => row.get(i, other).toString
    }

  override def write(row: InternalRow): Unit = {
    val line = schema.fields.indices
      .map(i => fmt(row, i, schema.fields(i).dataType)).mkString("\t")
    out.write(line); out.write("\n")
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    LineTaskCommit(staged.toString)
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(staged)
  }

  override def close(): Unit = out.close()
}
