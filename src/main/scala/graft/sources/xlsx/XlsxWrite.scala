package graft.sources.xlsx

import java.util.UUID

import graft.xlsx.{CellStyle, CellValue, ExcelDate, XlsxWriter}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
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
  * Rows beyond Excel's 1,048,576-per-sheet limit roll into `<base>_2`,
  * `<base>_3`, … automatically — the reference silently writes invalid
  * files past the limit.
  *
  * `sheetColumn=<col>` is the Spark-native form of the reference's
  * `add_sheet("A"); rows; add_sheet("B"); rows` workflow
  * (ref: src/writer.rs:283-300, src/fast_writer/zero_temp_workbook.rs:43-70):
  * the Write declares a clustered distribution + in-partition sort on that
  * column via [[RequiresDistributionAndOrdering]], so Spark routes each
  * distinct value to one task in contiguous runs, and the writer opens a
  * new sheet named by the value whenever it changes — one named sheet per
  * value, streaming, at any scale.
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

  override def build(): Write = {
    opts.sheetColumn.foreach { c =>
      require(schema.fieldNames.contains(c),
        s"sheetColumn '$c' not in write schema ${schema.fieldNames.mkString("[", ", ", "]")}")
    }
    new Write with RequiresDistributionAndOrdering {
      override def toBatch: BatchWrite = new XlsxBatchWrite(schema, opts, path, conf, doTruncate)
      // Cluster + sort on sheetColumn so each sheet value reaches exactly
      // one task as one contiguous run; unspecified (= no-op) otherwise.
      override def requiredDistribution(): Distribution =
        opts.sheetColumn
          .map(c => Distributions.clustered(
            Array[org.apache.spark.sql.connector.expressions.Expression](Expressions.column(c))))
          .getOrElse(Distributions.unspecified())
      override def requiredOrdering(): Array[SortOrder] =
        opts.sheetColumn
          .map(c => Array(Expressions.sort(Expressions.column(c), SortDirection.ASCENDING)))
          .getOrElse(Array.empty[SortOrder])
    }
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
    if (opts.singleFile) {
      val target = XlsxSingleFile.target(path)
      val fs = target.getFileSystem(conf.value)
      val parent = Option(target.getParent).getOrElse(new Path("."))
      fs.mkdirs(parent)
      if (truncate && fs.exists(target)) fs.delete(target, false)
      // sweep leftovers of a crashed earlier attempt
      if (fs.exists(parent)) fs.listStatus(parent).foreach { st =>
        if (st.isFile && st.getPath.getName.startsWith(XlsxSingleFile.fragPrefix(target)))
          fs.delete(st.getPath, false)
      }
    } else {
      val dir = new Path(path)
      val fs = dir.getFileSystem(conf.value)
      if (truncate && fs.exists(dir)) {
        fs.listStatus(dir).foreach { st =>
          if (st.isFile && st.getPath.getName.endsWith(".xlsx")) fs.delete(st.getPath, false)
        }
      }
      fs.mkdirs(dir)
    }
    XlsxWriterFactory(schema, opts, path, conf)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    if (opts.singleFile)
      XlsxSingleFile.stitch(path, opts, schema,
        messages.collect { case m: XlsxFragMessage if m.file != null => m }, conf)

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    messages.foreach {
      case XlsxCommitMessage(file) if file != null => fs.delete(new Path(file), false)
      case XlsxFragMessage(file, _, _) if file != null => fs.delete(new Path(file), false)
      case _ =>
    }
  }
}

final case class XlsxCommitMessage(file: String) extends WriterCommitMessage

/** Commit metadata of one singleFile fragment: where the task's payload
  * bytes live plus the per-sheet catalog needed to stitch them. */
final case class XlsxFragMessage(
    file: String,
    partitionId: Int,
    sheets: Seq[graft.xlsx.FragmentSheet]) extends WriterCommitMessage

/** Driver-side stitch of the parallel single-workbook write: tasks have
  * already deflated their worksheet XML into fragment files
  * ([[graft.xlsx.XlsxFragmentSink]]); the commit copies those raw byte
  * ranges into ONE .xlsx as independent ZIP entries ([[graft.xlsx.RawZipWriter]]),
  * generates the package parts for the final sheet catalog, and writes the
  * central directory. O(bytes copied) driver work, zero recompression —
  * the compression cost (the expensive part) stayed on the executors.
  *
  * Sheet layout: without `sheetColumn`, every partition's sheets chain
  * into one logical sheet — named `base, base_2, …` and stamped as
  * rollover continuations (docProps/custom.xml), so the default read
  * reassembles exactly the written row order across partitions. With
  * `sheetColumn`, sheets keep their task-assigned key names (uniquified
  * across tasks) and only task-internal rollovers are stamped. */
private[xlsx] object XlsxSingleFile {

  /** The one output workbook: `path` itself when it names a .xlsx file,
    * else `<path>/workbook.xlsx`. */
  def target(path: String): Path = {
    val p = new Path(path)
    if (p.getName.toLowerCase.endsWith(".xlsx")) p else new Path(p, "workbook.xlsx")
  }

  def fragPrefix(target: Path): String = "." + target.getName + ".frag-"

  def stitch(path: String, opts: XlsxOptions, schema: StructType,
      frags: Array[XlsxFragMessage], conf: SerializableConfiguration): Unit = {
    val out = target(path)
    val fs = out.getFileSystem(conf.value)
    val ordered = frags.sortBy(_.partitionId)
    val headerRows = if (opts.header) 1 else 0
    // sheets with no data rows (an idle partition's base sheet) are dropped
    val kept = ordered.flatMap(f => f.sheets.filter(_.rows > headerRows).map((f.file, _)))
    if (kept.isEmpty) {
      // still produce a valid workbook: one empty sheet (header row only,
      // matching what a coalesce(1) write of an empty frame produces)
      val w = new XlsxWriter(fs.create(out, true), opts.compression)
      w.addSheet(sanitize(opts.sheet.getOrElse("Sheet1")))
      if (opts.header) w.writeHeaderBold(schema.fieldNames)
      w.close()
      cleanup(fs, ordered); return
    }
    val defaultMode = opts.sheetColumn.isEmpty
    val base = sanitize(opts.sheet.getOrElse("Sheet1"))
    val used = scala.collection.mutable.Set.empty[String]
    val names = Seq.newBuilder[String]
    val continuations = Seq.newBuilder[Int]
    val zw = new graft.xlsx.RawZipWriter(fs.create(out, true))
    var idx = 0
    val buf = new Array[Byte](256 * 1024)
    ordered.foreach { frag =>
      val sheets = frag.sheets.filter(_.rows > headerRows)
      if (sheets.nonEmpty) {
        val in = fs.open(new Path(frag.file))
        try sheets.foreach { s =>
          val name =
            if (defaultMode) uniquify(used, if (idx == 0) base else withSuffix(base, idx + 1))
            else uniquify(used, s.name)
          names += name
          // default mode: the whole file is one logical sheet, so every
          // sheet after the first continues the chain; sheetColumn mode:
          // only task-internal rollovers do
          if (if (defaultMode) idx > 0 else s.continuation) continuations += idx
          zw.addRawEntry(s"xl/worksheets/sheet${idx + 1}.xml", 8,
            s.crc, s.compressedSize, s.uncompressedSize)
          in.seek(s.offset)
          var left = s.compressedSize
          while (left > 0) {
            val n = in.read(buf, 0, math.min(buf.length.toLong, left).toInt)
            require(n > 0, s"fragment ${frag.file} truncated at ${s.offset + s.compressedSize - left}")
            zw.writePayload(buf, 0, n)
            left -= n
          }
          idx += 1
        } finally in.close()
      }
    }
    val sheetNames = names.result()
    def part(name: String, content: String): Unit =
      zw.addDeflated(name, content.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        opts.compression)
    part("[Content_Types].xml", XlsxWriter.contentTypes(sheetNames.size))
    part("_rels/.rels", XlsxWriter.RootRels)
    part("xl/workbook.xml", XlsxWriter.workbookXml(sheetNames))
    part("xl/_rels/workbook.xml.rels", XlsxWriter.workbookRels(sheetNames.size))
    part("xl/styles.xml", XlsxWriter.StylesXml)
    part("xl/sharedStrings.xml", XlsxWriter.EmptySst)
    part("docProps/app.xml", XlsxWriter.AppProps)
    part("docProps/core.xml", XlsxWriter.CoreProps)
    part("docProps/custom.xml", XlsxWriter.customProps(continuations.result()))
    zw.finish()
    zw.close()
    cleanup(fs, ordered)
  }

  private def cleanup(fs: org.apache.hadoop.fs.FileSystem, frags: Array[XlsxFragMessage]): Unit =
    frags.foreach(f => if (f.file != null) fs.delete(new Path(f.file), false))

  /** Same sanitation rule as the task-side writer. */
  private def sanitize(name: String): String = {
    val c = name.replaceAll("""[\[\]:*?/\\]""", "_").take(31)
    if (c.isEmpty) "Sheet" else c
  }

  private def withSuffix(base: String, k: Int): String = {
    val suffix = s"_$k"
    base.take(31 - suffix.length) + suffix
  }

  private def uniquify(used: scala.collection.mutable.Set[String], requested: String): String = {
    var candidate = requested
    var n = 2
    while (used.contains(candidate.toLowerCase)) {
      candidate = withSuffix(requested, n)
      n += 1
    }
    used += candidate.toLowerCase
    candidate
  }
}

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

  // singleFile: this task emits a FRAGMENT (bare deflated sheet payloads,
  // dot-prefixed so directory listings and globs skip it) that the
  // driver's commit stitches into the one target workbook.
  private val file =
    if (opts.singleFile) {
      val target = XlsxSingleFile.target(path)
      new Path(Option(target.getParent).getOrElse(new Path(".")),
        f"${XlsxSingleFile.fragPrefix(target)}p$partitionId%05d-$taskId-${UUID.randomUUID().toString.take(8)}")
    } else
      new Path(path, f"part-$partitionId%05d-$taskId-${UUID.randomUUID().toString.take(8)}.xlsx")
  private val fs = file.getFileSystem(conf.value)
  private val fragSink: Option[graft.xlsx.XlsxFragmentSink] =
    if (opts.singleFile) Some(new graft.xlsx.XlsxFragmentSink(fs.create(file, true), opts.compression))
    else None
  private val writer = fragSink match {
    case Some(sink) => new XlsxWriter(sink)
    case None       => new XlsxWriter(fs.create(file, true), opts.compression)
  }
  private val baseSheet = opts.sheet.getOrElse("Sheet1")
  private var rowsInSheet = 0L
  private var rowsTotal = 0L
  // Header occupies a row, so data rows per sheet shrink by one.
  private val rollover = math.max(1L, opts.maxRowsPerSheet - (if (opts.header) 1 else 0))
  private val fields = schema.fields
  // sheetColumn routing: stringified value of the routing column; rows
  // arrive clustered+sorted on it (RequiresDistributionAndOrdering above),
  // so a value change is a sheet boundary, never a revisit.
  private val sheetKeyOf: Option[InternalRow => String] = opts.sheetColumn.map { c =>
    val i = schema.fieldIndex(c)
    val dt = schema(i).dataType
    r => if (r.isNullAt(i)) "null" else String.valueOf(r.get(i, dt))
  }
  private var currentKey: String = null
  // Workbook-unique sheet names (Excel compares case-insensitively).
  private val usedNames = scala.collection.mutable.Set.empty[String]
  private val getters: Array[InternalRow => (CellValue, Int)] =
    fields.zipWithIndex.map { case (f, i) =>
      val base0 = XlsxDataWriter.getter(f.dataType, i)
      // formulaPrefix: string cells starting with the prefix are written
      // as formula cells (prefix stripped — OOXML stores formulas without
      // the leading "="), covering the reference's CellValue::Formula
      // write surface (ref: src/fast_writer/zero_temp_workbook.rs:208-212)
      // from the DataFrame API, where no formula type exists.
      val base = (f.dataType, opts.formulaPrefix) match {
        case (StringType, Some(p)) => (r: InternalRow) =>
          base0(r) match {
            case (CellValue.Str(s), style) if s.startsWith(p) =>
              (CellValue.Formula(s.substring(p.length)), style)
            case other => other
          }
        case _ => base0
      }
      // Explicit per-column style (reference's write_row_styled surface,
      // ref: src/writer.rs write_row_styled) overrides the automatic one.
      opts.columnStyles.lift(i).filter(_ != 0) match {
        case Some(style) => (r: InternalRow) => (base(r)._1, style)
        case None        => base
      }
    }

  // With sheetColumn the first sheet's name comes from the first row, so
  // sheet creation is deferred to write(); otherwise open the base sheet
  // immediately (an empty partition still yields a valid empty workbook).
  if (sheetKeyOf.isEmpty) newSheet(baseSheet)

  /** Open a sheet named `name`, sanitized to Excel's rules (<=31 chars, no
    * []:*?/\) and uniquified within the workbook (`x`, `x_2`, `x_3`, …) —
    * the same suffixing names rollover continuation sheets. Rollover
    * sheets are additionally stamped into docProps/custom.xml (via
    * `continuation = true`) so the read side keys on the stamp, not the
    * reconstructed naming rule. */
  private def newSheet(name: String, continuation: Boolean = false): Unit = {
    val cleaned = {
      val c = name.replaceAll("""[\[\]:*?/\\]""", "_").take(31)
      if (c.isEmpty) "Sheet" else c
    }
    var candidate = cleaned
    var n = 2
    while (usedNames.contains(candidate.toLowerCase)) {
      val suffix = s"_$n"
      candidate = cleaned.take(31 - suffix.length) + suffix
      n += 1
    }
    usedNames += candidate.toLowerCase
    writer.addSheet(candidate,
      opts.columnWidths.zipWithIndex.map { case (w, i) => (i + 1, w) },
      opts.rowHeight, continuation)
    opts.protection.foreach(writer.protectSheet)
    if (opts.header) writer.writeHeaderBold(fields.map(_.name))
    rowsInSheet = 0L
  }

  override def write(row: InternalRow): Unit = {
    sheetKeyOf match {
      case Some(keyOf) =>
        val key = keyOf(row)
        if (currentKey == null || key != currentKey) { currentKey = key; newSheet(key) }
        else if (rowsInSheet >= rollover) newSheet(key, continuation = true)
      case None =>
        if (rowsInSheet >= rollover) newSheet(baseSheet, continuation = true)
    }
    writer.writeRowStyled(getters.iterator.map(_(row)))
    rowsInSheet += 1
    rowsTotal += 1
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    fragSink match {
      case Some(sink) =>
        if (rowsTotal == 0) { // empty fragments carry nothing to stitch
          fs.delete(file, false)
          XlsxFragMessage(null, partitionId, Nil)
        } else XlsxFragMessage(file.toString, partitionId, sink.result())
      case None =>
        // Clustered distribution can leave a task with zero rows; in
        // sheetColumn mode that file would be a meaningless empty "Sheet1" —
        // drop it rather than pollute the named-sheet layout.
        if (rowsTotal == 0 && sheetKeyOf.isDefined) {
          fs.delete(file, false)
          XlsxCommitMessage(null)
        } else XlsxCommitMessage(file.toString)
    }
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
