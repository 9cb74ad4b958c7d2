package graft.sources.xlsx

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Filter pushdown support for the xlsx scan.
  *
  * The scan keeps every pushed filter as a RESIDUAL too (Spark re-applies
  * them above the scan), so the compiled predicates here only have to be
  * sound in one direction: they must never drop a row the filter would
  * keep. Anything uncertain — unsupported shape, type mismatch, null
  * literal — either isn't accepted for pushdown or evaluates to `true`
  * (keep). What pushdown buys is skipping Catalyst conversion and row
  * allocation for rows that provably fail a predicate — on a selective
  * scan over wide sheets that is most of the per-row cost. The reference
  * has no scan-level filtering at all (every row is materialized,
  * ref: src/streaming_reader.rs:593-724).
  */
object XlsxFilters {

  /** One compiled predicate: position in the required schema + a test over
    * the CONVERTED (Catalyst-internal) value at that position. */
  final case class Compiled(pos: Int, test: Any => Boolean)

  /** Filters we accept for pushdown: leaf comparisons on present columns
    * with non-null literals, conjunctions thereof. Or/Not stay residual-only
    * (their sound evaluation needs full tri-state logic for little win). */
  def supported(f: Filter, schema: StructType): Boolean = f match {
    case And(l, r) => supported(l, schema) && supported(r, schema)
    case EqualTo(c, v) => has(schema, c) && v != null
    case GreaterThan(c, v) => orderable(schema, c) && v != null
    case GreaterThanOrEqual(c, v) => orderable(schema, c) && v != null
    case LessThan(c, v) => orderable(schema, c) && v != null
    case LessThanOrEqual(c, v) => orderable(schema, c) && v != null
    case In(c, vs) => has(schema, c) && vs != null && vs.forall(_ != null)
    case IsNull(c) => has(schema, c)
    case IsNotNull(c) => has(schema, c)
    case StringStartsWith(c, v) => isString(schema, c) && v != null
    case StringEndsWith(c, v) => isString(schema, c) && v != null
    case StringContains(c, v) => isString(schema, c) && v != null
    case _ => false
  }

  private def has(schema: StructType, col: String): Boolean =
    schema.fieldNames.contains(col)
  private def isString(schema: StructType, col: String): Boolean =
    schema.fields.find(_.name == col).exists(_.dataType == StringType)
  private def orderable(schema: StructType, col: String): Boolean =
    schema.fields.find(_.name == col).exists(f => f.dataType match {
      // the scalar types an xlsx schema can carry; arrays/maps/structs never
      case StringType | BooleanType | DateType | TimestampType | TimestampNTZType
           | ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType => true
      case _: DecimalType => true
      case _ => false
    })

  /** Compile accepted filters against the required (read) schema. Filters
    * referencing columns outside it (possible if a caller hand-builds a
    * scan) are silently dropped — they stay residual. */
  def compile(filters: Seq[Filter], required: StructType): Array[Compiled] =
    filters.flatMap(compileOne(_, required)).toArray

  private def compileOne(f: Filter, required: StructType): Seq[Compiled] = {
    def at(col: String): Option[(Int, DataType)] =
      if (!required.fieldNames.contains(col)) None
      else {
        val i = required.fieldIndex(col)
        Some((i, required.fields(i).dataType))
      }
    def lit(v: Any): Any = CatalystTypeConverters.convertToCatalyst(v)
    def cmp(col: String, v: Any)(sat: Int => Boolean): Seq[Compiled] =
      at(col).toSeq.map { case (i, dt) =>
        val ord = TypeUtils.getInterpretedOrdering(dt)
        val l = lit(v)
        // a literal that doesn't convert to this column's internal class
        // can't be compared soundly -> keep everything
        Compiled(i, x => x != null && (safeCompare(ord, x, l) match {
          case Some(c) => sat(c)
          case None => true
        }))
      }
    f match {
      case And(l, r) => compileOne(l, required) ++ compileOne(r, required)
      case EqualTo(c, v) => cmp(c, v)(_ == 0)
      case GreaterThan(c, v) => cmp(c, v)(_ > 0)
      case GreaterThanOrEqual(c, v) => cmp(c, v)(_ >= 0)
      case LessThan(c, v) => cmp(c, v)(_ < 0)
      case LessThanOrEqual(c, v) => cmp(c, v)(_ <= 0)
      case In(c, vs) => at(c).toSeq.map { case (i, dt) =>
        val ord = TypeUtils.getInterpretedOrdering(dt)
        val ls = vs.map(lit)
        Compiled(i, x => x != null && ls.exists(l => safeCompare(ord, x, l).forall(_ == 0)))
      }
      case IsNull(c) => at(c).toSeq.map { case (i, _) => Compiled(i, _ == null) }
      case IsNotNull(c) => at(c).toSeq.map { case (i, _) => Compiled(i, _ != null) }
      case StringStartsWith(c, v) => strPred(at(c), s => s.startsWith(v))
      case StringEndsWith(c, v) => strPred(at(c), s => s.endsWith(v))
      case StringContains(c, v) => strPred(at(c), s => s.contains(v))
      case _ => Seq.empty
    }
  }

  private def strPred(at: Option[(Int, DataType)], p: String => Boolean): Seq[Compiled] =
    at.toSeq.map { case (i, _) =>
      Compiled(i, {
        case null => false
        case s: UTF8String => p(s.toString)
        case _ => true // unexpected class: keep
      })
    }

  /** Ordering comparison that treats cross-class surprises as incomparable
    * (None -> keep the row) instead of throwing inside a task. */
  private def safeCompare(ord: Ordering[Any], a: Any, b: Any): Option[Int] =
    try Some(ord.compare(a, b)) catch { case _: ClassCastException => None }
}
