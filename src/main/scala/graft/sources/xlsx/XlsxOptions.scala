package graft.sources.xlsx

import graft.xlsx.ProtectionOptions
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Options for the xlsx DataSource V2, mirroring the reference's builder
  * surface (ref: src/writer.rs:51-91 compression; src/streaming_reader.rs:345-351
  * sheet selection; src/csv_reader.rs:166-180 header handling).
  */
final case class XlsxOptions(
    sheet: Option[String],        // read: sheet name; write: base sheet name
    sheetIndex: Option[Int],      // read: 0-based sheet index
    allSheets: Boolean,           // read: union every sheet
    header: Boolean,              // first row is column names (read) / written bold (write)
    compression: Int,             // deflate level 0-9 (write)
    inferSchemaRows: Int,         // rows sampled for schema inference (read)
    maxRowsPerSheet: Long,        // write: rollover before Excel's 1,048,576-row limit
    protection: Option[ProtectionOptions], // write: sheet protection + allow flags
    columnWidths: Seq[Double],    // write: per-column widths, 1:1 with schema order
    columnStyles: Seq[Int],       // write: per-column style ids, 1:1 with schema order
    sheetColumn: Option[String],  // write: route rows to a sheet named by this column
    formulaPrefix: Option[String], // write: string cells starting with this become formulas
    sheetNameColumn: Option[String], // read: append a column carrying the source sheet name
    splitSheets: Boolean,         // read: fan large sheets out over multiple tasks
    splitBytes: Long,             // read: target decompressed XML bytes per task
    rowHeight: Option[Double],    // write: default row height (points) for every sheet
    singleFile: Boolean,          // write: stitch all partitions into ONE workbook
    ignoreCorruptFiles: Boolean   // read: skip unreadable workbooks instead of failing the job
) extends Serializable

object XlsxOptions {
  /** Excel's hard per-sheet row limit. */
  val ExcelMaxRows = 1048576L

  /** Default decompressed-XML bytes per read task (mirrors the spirit of
    * `spark.sql.files.maxPartitionBytes`: large enough that task overhead
    * amortizes, small enough that one big sheet spreads over a cluster). */
  val DefaultSplitBytes: Long = 128L * 1024 * 1024

  def apply(m: CaseInsensitiveStringMap): XlsxOptions = XlsxOptions(
    sheet = Option(m.get("sheet")),
    sheetIndex = Option(m.get("sheetIndex")).map(_.toInt),
    allSheets = m.getBoolean("allSheets", false),
    header = m.getBoolean("header", false),
    compression = m.getInt("compression", 6),
    inferSchemaRows = m.getInt("inferSchemaRows", 1000),
    maxRowsPerSheet = math.min(m.getLong("maxRowsPerSheet", ExcelMaxRows), ExcelMaxRows),
    protection = parseProtection(m),
    columnWidths = Option(m.get("columnWidths")).map(_.split(",").toSeq.map(_.trim.toDouble))
      .getOrElse(Seq.empty),
    columnStyles = Option(m.get("columnStyles"))
      .map(_.split(",").toSeq.map(s => styleByName(s.trim))).getOrElse(Seq.empty),
    sheetColumn = Option(m.get("sheetColumn")),
    formulaPrefix = Option(m.get("formulaPrefix")).map { p =>
      require(p.nonEmpty, "formulaPrefix must be non-empty"); p
    },
    sheetNameColumn = Option(m.get("sheetNameColumn")),
    splitSheets = m.getBoolean("splitSheets", true),
    splitBytes = {
      val b = m.getLong("splitBytes", DefaultSplitBytes)
      require(b >= 64 * 1024, s"splitBytes must be >= 64 KiB, got $b"); b
    },
    rowHeight = Option(m.get("rowHeight")).map { h =>
      val v = h.toDouble
      require(v > 0, s"rowHeight must be positive, got $h"); v
    },
    singleFile = m.getBoolean("singleFile", false),
    // At 100 TB a directory holds thousands of workbooks and one truncated
    // upload should not kill the job on its Nth hour: per-FILE skip (xlsx
    // is a ZIP — a bad central directory loses the file, not a record).
    // Defaults to Spark's own spark.sql.files.ignoreCorruptFiles so the
    // global setting governs custom sources too; the option overrides.
    ignoreCorruptFiles = m.getBoolean("ignoreCorruptFiles", sessionIgnoreCorrupt)
  )

  private def sessionIgnoreCorrupt: Boolean =
    scala.util.Try(org.apache.spark.sql.internal.SQLConf.get.ignoreCorruptFiles)
      .getOrElse(false)

  /** The reference's 12-field protection surface as `protect.*` options
    * (ref: src/types.rs:265-291): `protect.password` plus eleven boolean
    * allow-flags; `protect=true` alone gives passwordless protection.
    * Protection is emitted when any `protect*` option is present. */
  private def parseProtection(m: CaseInsensitiveStringMap): Option[ProtectionOptions] = {
    val password = Option(m.get("protect.password"))
    def f(name: String) = m.getBoolean(s"protect.$name", false)
    val p = ProtectionOptions(
      password = password,
      selectLockedCells = f("selectLockedCells"),
      selectUnlockedCells = f("selectUnlockedCells"),
      formatCells = f("formatCells"),
      formatColumns = f("formatColumns"),
      formatRows = f("formatRows"),
      insertColumns = f("insertColumns"),
      insertRows = f("insertRows"),
      deleteColumns = f("deleteColumns"),
      deleteRows = f("deleteRows"),
      sort = f("sort"),
      autoFilter = f("autoFilter"))
    if (p != ProtectionOptions() || m.getBoolean("protect", false)) Some(p) else None
  }

  /** Style preset names = the reference's CellStyle variants
    * (ref: src/types.rs:6-45). */
  private val StyleNames: Map[String, Int] = {
    import graft.xlsx.CellStyle._
    Map(
      "default" -> Default, "headerbold" -> HeaderBold,
      "numberinteger" -> NumberInteger, "numberdecimal" -> NumberDecimal,
      "numbercurrency" -> NumberCurrency, "numberpercentage" -> NumberPercentage,
      "datedefault" -> DateDefault, "datetimestamp" -> DateTimestamp,
      "datetimeshort" -> DateTimeShort, "textbold" -> TextBold,
      "textitalic" -> TextItalic, "highlightyellow" -> HighlightYellow,
      "highlightgreen" -> HighlightGreen, "highlightred" -> HighlightRed,
      "borderthin" -> BorderThin)
  }

  def styleByName(name: String): Int = {
    val id = name.toIntOption.getOrElse(
      StyleNames.getOrElse(name.toLowerCase,
        throw new IllegalArgumentException(
          s"unknown style '$name'; valid: ${StyleNames.keys.toSeq.sorted.mkString(", ")} or a numeric id 0-14")))
    // styles.xml has exactly 15 cellXfs; an out-of-range s= makes Excel
    // declare the file corrupt, so reject at option-parse time.
    require(id >= 0 && id < graft.xlsx.CellStyle.Count,
      s"style id $id out of range 0-${graft.xlsx.CellStyle.Count - 1}")
    id
  }

  def fromMap(m: java.util.Map[String, String]): XlsxOptions =
    apply(new CaseInsensitiveStringMap(m))
}
