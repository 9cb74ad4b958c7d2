package graft.sources.xlsx

import graft.xlsx.{CellValue, ExcelDate}
import org.apache.spark.sql.types._

/** Sample-then-promote schema inference for xlsx sheets, the Spark-idiomatic
  * replacement for the reference's per-cell dynamic typing
  * (ref: src/streaming_reader.rs:686-711): each column's observed cell kinds
  * are merged up a promotion lattice
  * `Empty < Long < Double < String`, with Boolean / Date / Timestamp as
  * side branches that fall back to String when mixed with numerics —
  * the same outcome a user of the reference gets by calling `as_string`.
  */
object SchemaInference {

  // Lattice states
  private val BOTTOM = 0
  private val LONG = 1
  private val DOUBLE = 2
  private val BOOL = 3
  private val DATE = 4
  private val TS = 5
  private val STR = 6

  private def cellKind(c: CellValue): Int = c match {
    case CellValue.Empty       => BOTTOM
    case CellValue.IntVal(_)   => LONG
    case CellValue.FloatVal(_) => DOUBLE
    case CellValue.BoolVal(_)  => BOOL
    case CellValue.DateTime(s) =>
      if (s - math.floor(s) > 0.0001) TS else DATE
    case _                     => STR // Str / Error / Formula
  }

  private def merge(a: Int, b: Int): Int = (a, b) match {
    case _ if a == b                         => a
    case (BOTTOM, x)                         => x
    case (x, BOTTOM)                         => x
    case (LONG, DOUBLE) | (DOUBLE, LONG)     => DOUBLE
    case (DATE, TS) | (TS, DATE)             => TS
    case _                                   => STR
  }

  private def toDataType(k: Int): DataType = k match {
    case LONG   => LongType
    case DOUBLE => DoubleType
    case BOOL   => BooleanType
    case DATE   => DateType
    case TS     => TimestampType
    case _      => StringType // BOTTOM (all-empty column) and STR
  }

  /** Infer a StructType from sampled rows. When `header` is true the first
    * row supplies (deduplicated) column names, like Spark's CSV reader. */
  def infer(rows: Iterator[Vector[CellValue]], header: Boolean, sampleRows: Int): StructType = {
    val acc = new Acc(header)
    acc.add(rows, sampleRows)
    acc.result()
  }

  /** Incremental inference across several row sources (sheets/files): merge
    * every sampled row into one kind lattice, so a column that is
    * date-shaped in one file and timestamp-shaped in another promotes to
    * timestamp instead of freezing on whichever file happened to be listed
    * first. Each source's header row is consumed independently; the first
    * one supplies the column names. */
  final class Acc(header: Boolean) {
    private var names: Vector[String] = Vector.empty
    private var haveNames = false
    private val kinds = scala.collection.mutable.ArrayBuffer.empty[Int]
    var sampled = 0

    /** Merge rows from one source until `maxRows` total samples. */
    def add(rows: Iterator[Vector[CellValue]], maxRows: Int): Unit = {
      if (header && rows.hasNext) {
        val h = rows.next().map(_.asString)
        if (!haveNames) { names = h; haveNames = true }
      }
      while (rows.hasNext && sampled < maxRows) {
        val row = rows.next()
        while (kinds.size < row.size) kinds += BOTTOM
        var i = 0
        while (i < row.size) {
          kinds(i) = merge(kinds(i), cellKind(row(i)))
          i += 1
        }
        sampled += 1
      }
    }

    def result(): StructType = {
      val width = math.max(kinds.size, names.size)
      // Dedup repeated header names positionally (a la CSV), bumping the
      // suffix until the candidate collides with neither a raw header
      // nor an already-assigned name — ["a","a1","a"] must not rename
      // the third column to the existing "a1".
      val assigned = scala.collection.mutable.LinkedHashSet.empty[String]
      val rawNames = (0 until width).map { i =>
        if (i < names.size && names(i).nonEmpty) names(i) else s"_c$i"
      }
      val fields = (0 until width).map { i =>
        val raw = rawNames(i)
        val name =
          if (!assigned.contains(raw) && rawNames.indexOf(raw) == i) raw
          else {
            var n = 1
            while (assigned.contains(s"$raw$n") || rawNames.contains(s"$raw$n")) n += 1
            s"$raw$n"
          }
        assigned += name
        val k = if (i < kinds.size) kinds(i) else BOTTOM
        StructField(name, toDataType(k), nullable = true)
      }
      StructType(fields)
    }
  }

}
