package graft.sources.xlsx

import java.util.UUID

import graft.xlsx.{CellStyle, CellValue, ExcelDate, ProtectionOptions, XlsxWriter}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

/** Write side of the xlsx DSv2: each partition streams rows through its own
  * [[graft.xlsx.XlsxWriter]] into `part-NNNNN-<uuid>.xlsx` under the output
  * directory — constant memory per task (the reference's core property,
  * ref: src/fast_writer/zero_temp_workbook.rs), unlimited scale via
  * parallel part files (the reference is single-threaded,
  * SURVEY §4.2 "Parallelism: None").
  *
  * Rows beyond Excel's 1,048,576-per-sheet limit roll into `Sheet2`,
  * `Sheet3`, … automatically — the reference silently writes invalid
  * files past the limit.
  *
  * Commit protocol: writers create files directly under the output path
  * with task-unique names; Spark's commit coordinator guarantees a single
  * committed attempt per partition, and abort() deletes the orphan.
  * Truncate (SaveMode.Overwrite) clears `*.xlsx` in the directory first.
  */
final class XlsxWriteBuilder(
    schema: StructType,
    opts: XlsxOptions,
    path: String,
    conf: SerializableConfiguration
) extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new XlsxBatchWrite(schema, opts, path, conf, doTruncate)
  }
}

final class XlsxBatchWrite(
    schema: StructType,
    opts: XlsxOptions,
    path: String,
    conf: SerializableConfiguration,
    truncate: Boolean
) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    if (truncate && fs.exists(dir)) {
      fs.listStatus(dir).foreach { st =>
        if (st.isFile && st.getPath.getName.endsWith(".xlsx")) fs.delete(st.getPath, false)
      }
    }
    fs.mkdirs(dir)
    XlsxWriterFactory(schema, opts, path, conf)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    messages.foreach {
      case XlsxCommitMessage(file) => fs.delete(new Path(file), false)
      case _ =>
    }
  }
}

final case class XlsxCommitMessage(file: String) extends WriterCommitMessage

final case class XlsxWriterFactory(
    schema: StructType,
    opts: XlsxOptions,
    path: String,
    conf: SerializableConfiguration
) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new XlsxDataWriter(schema, opts, path, conf, partitionId, taskId)
}

final class XlsxDataWriter(
    schema: StructType,
    opts: XlsxOptions,
    path: String,
    conf: SerializableConfiguration,
    partitionId: Int,
    taskId: Long
) extends DataWriter[InternalRow] {

  private val file = new Path(path, f"part-$partitionId%05d-$taskId-${UUID.randomUUID().toString.take(8)}.xlsx")
  private val fs = file.getFileSystem(conf.value)
  private val writer = new XlsxWriter(fs.create(file, true), opts.compression)
  private val baseSheet = opts.sheet.getOrElse("Sheet1")
  private var sheetNo = 0
  private var rowsInSheet = 0L
  // Header occupies a row, so data rows per sheet shrink by one.
  private val rollover = math.max(1L, opts.maxRowsPerSheet - (if (opts.header) 1 else 0))
  private val fields = schema.fields
  private val getters: Array[InternalRow => (CellValue, Int)] =
    fields.zipWithIndex.map { case (f, i) =>
      val base = XlsxDataWriter.getter(f.dataType, i)
      // Explicit per-column style (reference's write_row_styled surface,
      // ref: src/writer.rs write_row_styled) overrides the automatic one.
      opts.columnStyles.lift(i).filter(_ != 0) match {
        case Some(style) => (r: InternalRow) => (base(r)._1, style)
        case None        => base
      }
    }

  newSheet()

  private def newSheet(): Unit = {
    sheetNo += 1
    writer.addSheet(if (sheetNo == 1) baseSheet else s"$baseSheet$sheetNo",
      opts.columnWidths.zipWithIndex.map { case (w, i) => (i + 1, w) })
    opts.protectPassword.foreach(p => writer.protectSheet(ProtectionOptions(password = Some(p))))
    if (opts.header) writer.writeHeaderBold(fields.map(_.name))
    rowsInSheet = 0L
  }

  override def write(row: InternalRow): Unit = {
    if (rowsInSheet >= rollover) newSheet()
    writer.writeRowStyled(getters.iterator.map(_(row)))
    rowsInSheet += 1
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    XlsxCommitMessage(file.toString)
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: Exception => }
    try fs.delete(file, false) catch { case _: Exception => }
  }

  override def close(): Unit = ()
}

object XlsxDataWriter {

  /** Spark internal value at ordinal i → (CellValue, styleId). Dates and
    * timestamps are written as Excel serials with the matching date style
    * so the read side's style heuristic recovers the type (write encoding
    * per ref: src/fast_writer/zero_temp_workbook.rs:171-213). */
  def getter(dt: DataType, i: Int): InternalRow => (CellValue, Int) = dt match {
    case StringType => r =>
      if (r.isNullAt(i)) EmptyCell else (CellValue.Str(r.getUTF8String(i).toString), 0)
    case LongType    => r => if (r.isNullAt(i)) EmptyCell else (CellValue.IntVal(r.getLong(i)), 0)
    case IntegerType => r => if (r.isNullAt(i)) EmptyCell else (CellValue.IntVal(r.getInt(i).toLong), 0)
    case ShortType   => r => if (r.isNullAt(i)) EmptyCell else (CellValue.IntVal(r.getShort(i).toLong), 0)
    case ByteType    => r => if (r.isNullAt(i)) EmptyCell else (CellValue.IntVal(r.getByte(i).toLong), 0)
    case DoubleType  => r => if (r.isNullAt(i)) EmptyCell else (CellValue.FloatVal(r.getDouble(i)), 0)
    case FloatType   => r => if (r.isNullAt(i)) EmptyCell else (CellValue.FloatVal(r.getFloat(i).toDouble), 0)
    case BooleanType => r => if (r.isNullAt(i)) EmptyCell else (CellValue.BoolVal(r.getBoolean(i)), 0)
    case d: DecimalType => r =>
      if (r.isNullAt(i)) EmptyCell
      else (CellValue.FloatVal(r.getDecimal(i, d.precision, d.scale).toDouble), 0)
    case DateType => r =>
      if (r.isNullAt(i)) EmptyCell
      else {
        val ld = DateTimeUtils.daysToLocalDate(r.getInt(i))
        (CellValue.DateTime(ExcelDate.fromDate(ld).toDouble), CellStyle.DateDefault)
      }
    case TimestampType | TimestampNTZType => r =>
      if (r.isNullAt(i)) EmptyCell
      else {
        val ldt = DateTimeUtils.microsToLocalDateTime(r.getLong(i))
        (CellValue.DateTime(ExcelDate.fromDateTime(ldt)), CellStyle.DateTimestamp)
      }
    case BinaryType => r =>
      if (r.isNullAt(i)) EmptyCell
      else (CellValue.Str(java.util.Base64.getEncoder.encodeToString(r.getBinary(i))), 0)
    case NullType => _ => EmptyCell
    case other => r => // complex types: render through Catalyst's string form
      if (r.isNullAt(i)) EmptyCell else (CellValue.Str(r.get(i, other).toString), 0)
  }

  private val EmptyCell: (CellValue, Int) = (CellValue.Empty, 0)
}
