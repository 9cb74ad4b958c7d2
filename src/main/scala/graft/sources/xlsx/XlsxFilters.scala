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
  * (keep). Keep-biased leaves compose soundly through both And and Or.
  * What pushdown buys is skipping Catalyst conversion and row allocation
  * for rows that provably fail a predicate — on a selective scan over wide
  * sheets that is most of the per-row cost. The reference has no
  * scan-level filtering at all (every row is materialized,
  * ref: src/streaming_reader.rs:593-724).
  */
object XlsxFilters {

  /** Compiled predicate tree over CONVERTED (Catalyst-internal) values,
    * addressed by position in the required schema. */
  sealed trait Pred {
    /** Schema positions this predicate reads (converted before eval). */
    def positions: Seq[Int]
    def eval(vals: Array[Any]): Boolean
  }
  private final case class Leaf(pos: Int, test: Any => Boolean) extends Pred {
    def positions: Seq[Int] = Seq(pos)
    def eval(vals: Array[Any]): Boolean = test(vals(pos))
  }
  private final case class AllOf(ps: Seq[Pred]) extends Pred {
    val positions: Seq[Int] = ps.flatMap(_.positions).distinct
    def eval(vals: Array[Any]): Boolean = ps.forall(_.eval(vals))
  }
  private final case class AnyOf(ps: Seq[Pred]) extends Pred {
    val positions: Seq[Int] = ps.flatMap(_.positions).distinct
    def eval(vals: Array[Any]): Boolean = ps.exists(_.eval(vals))
  }

  /** Filters we accept for pushdown: leaf comparisons on present columns
    * with non-null literals, conjunctions AND disjunctions thereof. Not
    * stays residual-only: negating a keep-biased predicate would flip its
    * soundness direction. */
  def supported(f: Filter, schema: StructType): Boolean = f match {
    case And(l, r) => supported(l, schema) && supported(r, schema)
    case Or(l, r) => supported(l, schema) && supported(r, schema)
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
    * scan) drop out — they stay residual. A partially-compilable And keeps
    * its compilable side (sound: it only tightens); a partially-compilable
    * Or must drop BOTH sides (keeping one would drop rows the other side
    * admits). */
  def compile(filters: Seq[Filter], required: StructType): Array[Pred] =
    filters.flatMap(compileOne(_, required)).toArray

  private def compileOne(f: Filter, required: StructType): Option[Pred] = {
    def at(col: String): Option[(Int, DataType)] =
      if (!required.fieldNames.contains(col)) None
      else {
        val i = required.fieldIndex(col)
        Some((i, required.fields(i).dataType))
      }
    def lit(v: Any): Any = CatalystTypeConverters.convertToCatalyst(v)
    def cmp(col: String, v: Any)(sat: Int => Boolean): Option[Pred] =
      at(col).map { case (i, dt) =>
        val ord = TypeUtils.getInterpretedOrdering(dt)
        val l = lit(v)
        // a literal that doesn't convert to this column's internal class
        // can't be compared soundly -> keep everything
        Leaf(i, x => x != null && (safeCompare(ord, x, l) match {
          case Some(c) => sat(c)
          case None => true
        }))
      }
    f match {
      case And(l, r) =>
        (compileOne(l, required), compileOne(r, required)) match {
          case (Some(a), Some(b)) => Some(AllOf(Seq(a, b)))
          case (a, b) => a.orElse(b) // one side alone still soundly tightens
        }
      case Or(l, r) =>
        for (a <- compileOne(l, required); b <- compileOne(r, required))
          yield AnyOf(Seq(a, b))
      case EqualTo(c, v) => cmp(c, v)(_ == 0)
      case GreaterThan(c, v) => cmp(c, v)(_ > 0)
      case GreaterThanOrEqual(c, v) => cmp(c, v)(_ >= 0)
      case LessThan(c, v) => cmp(c, v)(_ < 0)
      case LessThanOrEqual(c, v) => cmp(c, v)(_ <= 0)
      case In(c, vs) => at(c).map { case (i, dt) =>
        val ord = TypeUtils.getInterpretedOrdering(dt)
        val ls = vs.map(lit)
        Leaf(i, x => x != null && ls.exists(l => safeCompare(ord, x, l).forall(_ == 0)))
      }
      case IsNull(c) => at(c).map { case (i, _) => Leaf(i, _ == null) }
      case IsNotNull(c) => at(c).map { case (i, _) => Leaf(i, _ != null) }
      case StringStartsWith(c, v) => strPred(at(c), s => s.startsWith(v))
      case StringEndsWith(c, v) => strPred(at(c), s => s.endsWith(v))
      case StringContains(c, v) => strPred(at(c), s => s.contains(v))
      case _ => None
    }
  }

  private def strPred(at: Option[(Int, DataType)], p: String => Boolean): Option[Pred] =
    at.map { case (i, _) =>
      Leaf(i, {
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
