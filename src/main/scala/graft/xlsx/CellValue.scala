package graft.xlsx

/** The reference engine's 8-variant dynamic cell value
  * (ref: src/types.rs:78-97) re-expressed as a Scala ADT.
  *
  * In the Spark engine this type only lives at the source/sink boundary
  * (the XLSX DataSource); inside a plan, values are typed columns.
  * Coercion semantics follow ref: src/types.rs:101-152.
  */
sealed trait CellValue {
  import CellValue._

  /** Lossless-ish display form (ref: src/types.rs:101-113). */
  def asString: String = this match {
    case Empty        => ""
    case Str(s)       => s
    case IntVal(i)    => i.toString
    case FloatVal(f)  => formatDouble(f)
    case BoolVal(b)   => b.toString
    case DateTime(d)  => formatDouble(d)
    case Error(e)     => s"ERROR: $e"
    case Formula(f)   => f
  }

  /** Truncating / parsing int coercion (ref: src/types.rs:120-127). */
  def asLong: Option[Long] = this match {
    case IntVal(i)   => Some(i)
    case FloatVal(f) => Some(f.toLong)
    case Str(s)      => s.toLongOption
    case _           => None
  }

  /** Float coercion; accepts DateTime serial (ref: src/types.rs:130-138). */
  def asDouble: Option[Double] = this match {
    case FloatVal(f) => Some(f)
    case IntVal(i)   => Some(i.toDouble)
    case DateTime(d) => Some(d)
    case Str(s)      => s.toDoubleOption
    case _           => None
  }

  /** Bool coercion: true|yes|1 / false|no|0, case-insensitive; Int != 0
    * (ref: src/types.rs:141-152). */
  def asBool: Option[Boolean] = this match {
    case BoolVal(b) => Some(b)
    case IntVal(i)  => Some(i != 0)
    case Str(s) =>
      s.toLowerCase match {
        case "true" | "yes" | "1" => Some(true)
        case "false" | "no" | "0" => Some(false)
        case _                    => None
      }
    case _ => None
  }

  def isEmpty: Boolean = this == Empty
}

object CellValue {
  case object Empty                    extends CellValue
  final case class Str(s: String)      extends CellValue
  final case class IntVal(i: Long)     extends CellValue
  final case class FloatVal(f: Double) extends CellValue
  final case class BoolVal(b: Boolean) extends CellValue
  /** Excel date serial (days since 1900-01-01, 1900-bug semantics). */
  final case class DateTime(serial: Double) extends CellValue
  final case class Error(e: String)    extends CellValue
  final case class Formula(f: String)  extends CellValue

  /** Render a double the way the reference's Rust `f64::to_string` does:
    * no trailing ".0" is *kept* in Rust ("1.5" -> "1.5", "2.0" -> "2"),
    * and no scientific notation for typical magnitudes. We match that for
    * cell XML so files are byte-comparable in tests.
    */
  def formatDouble(d: Double): String = {
    if (d.isNaN || d.isInfinite) return d.toString
    if (d == math.rint(d) && math.abs(d) < 1e15) {
      d.toLong.toString
    } else {
      val s = java.math.BigDecimal.valueOf(d).stripTrailingZeros.toPlainString
      s
    }
  }
}

/** Fixed style presets; the style index written to `s=` equals the
  * discriminant (ref: src/types.rs:6-45; cellXfs table at
  * src/fast_writer/zero_temp_workbook.rs:455-472). */
object CellStyle {
  val Default          = 0
  val HeaderBold       = 1
  val NumberInteger    = 2
  val NumberDecimal    = 3
  val NumberCurrency   = 4
  val NumberPercentage = 5
  val DateDefault      = 6
  val DateTimestamp    = 7
  val TextBold         = 8
  val TextItalic       = 9
  val HighlightYellow  = 10
  val HighlightGreen   = 11
  val HighlightRed     = 12
  val BorderThin       = 13
  val DateTimeShort    = 14
  val Count            = 15
}
