package graft.plans

import graft.xlsx.{A1, ExcelDate, Xml}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hottest scalar functions — one tier
  * above the `graft_*` UDFs (SURVEY §4.3): these participate in
  * whole-stage codegen (`doGenCode` emits a static call, no boxing, no
  * ScalaUDF closure dispatch) and constant-fold automatically because they
  * are deterministic `UnaryExpression`s.
  *
  * Installed via Spark's extension point, so a cluster picks them up with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`:
  * {{{
  *   SELECT excel_serial_decode(44562.5)   -- 2022-01-01 12:00:00
  *   SELECT col_letter(27)                 -- AB
  *   SELECT xml_escape('a<b&c')            -- a&lt;b&amp;c
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("excel_serial_decode"),
      new ExpressionInfo(classOf[ExcelSerialDecode].getName, "excel_serial_decode"),
      (children: Seq[Expression]) => ExcelSerialDecode(Cast(children.head, DoubleType))))
    ext.injectFunction((
      new FunctionIdentifier("col_letter"),
      new ExpressionInfo(classOf[ColLetter].getName, "col_letter"),
      (children: Seq[Expression]) => ColLetter(Cast(children.head, IntegerType))))
    ext.injectFunction((
      new FunctionIdentifier("xml_escape"),
      new ExpressionInfo(classOf[XmlEscape].getName, "xml_escape"),
      (children: Seq[Expression]) => XmlEscape(Cast(children.head, StringType))))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[VecNorm].getName, "vec_norm"),
      (children: Seq[Expression]) => VecNorm(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("adc_score"),
      new ExpressionInfo(classOf[AdcScore].getName, "adc_score"),
      (children: Seq[Expression]) => {
        val ksub = children(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"adc_score ksub must be an integer literal, got $other")
        }
        AdcScore(children(0), children(1), ksub)
      }))
    ext.injectFunction((
      new FunctionIdentifier("topk_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, "topk_by_score"),
      (children: Seq[Expression]) => {
        val k = children(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"topk_by_score k must be an integer literal, got $other")
        }
        TopKByScore(children(0), children(1), k)
      }))
  }
}

/** Static eval targets for generated code (codegen calls these). */
object GraftExprs {
  def excelSerialDecode(serial: Double): UTF8String =
    ExcelDate.format(serial).map(UTF8String.fromString).orNull

  def colLetter(n: Int): UTF8String =
    if (n < 0) null else UTF8String.fromString(A1.colToLetter(n))

  def xmlEscape(s: UTF8String): UTF8String =
    UTF8String.fromString(Xml.escape(s.toString))

  /** Dot product straight off ArrayData — no per-row boxing or copy (a
    * ScalaUDF deserializes each array into a Scala Seq first). Same
    * left-to-right summation order as the former UDF: bit-equal doubles.
    * Mismatched dimensions fail loudly — truncating would silently score
    * a corrupt vector. Null ELEMENTS are not defended (an embedding with
    * null components is corrupt input; both this and the UDF path treat
    * that as undefined). */
  def vecDot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"embedding dimension $n != ${b.numElements()}")
    var acc = 0.0d
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** L2 norm straight off ArrayData; same fold order as the former UDF. */
  def vecNorm(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0d
    var i = 0
    while (i < n) { val x = a.getDouble(i); acc += x * x; i += 1 }
    math.sqrt(acc)
  }

  /** IVFPQ symmetric-distance score (code vs code): per-subspace
    * codebook-pair tables, flattened j·ksub² + c1·ksub + c2 — the inner
    * loop of the quantized SemDeDup pair scan, m lookups per pair. */
  def sdcScore(a: Array[Byte], b: Array[Byte], tables: Array[Double], ksub: Int): Double = {
    var acc = 0.0d
    var j = 0
    while (j < a.length) {
      acc += tables(j * ksub * ksub + (a(j) & 0xFF) * ksub + (b(j) & 0xFF))
      j += 1
    }
    acc
  }

  /** IVFPQ asymmetric-distance score: sum the per-subspace lookup-table
    * entries the candidate's one-byte codes select — the inner loop of
    * the PQ candidate scan, m lookups per pair, reading the lut
    * ArrayData in place (the former ScalaUDF deserialized the m×ksub
    * table to a Scala Seq per CANDIDATE ROW). Same fold order as the
    * UDF: bit-equal doubles. */
  def adcScore(codes: Array[Byte], lut: ArrayData, ksub: Int): Double = {
    // adc_score is a user-facing SQL function: a lut shorter than m·ksub
    // would otherwise read out-of-bounds UnsafeArrayData silently (asserts
    // are off in production JVMs) and return garbage scores. One compare
    // per row, hoisted out of the m-lookup loop.
    if (lut.numElements() < codes.length * ksub)
      throw new IllegalArgumentException(
        s"adc_score: lookup table has ${lut.numElements()} entries but " +
          s"codes need ${codes.length} * ksub=$ksub = ${codes.length * ksub}")
    var acc = 0.0d
    var j = 0
    while (j < codes.length) {
      acc += lut.getDouble(j * ksub + (codes(j) & 0xFF))
      j += 1
    }
    acc
  }
}

private[plans] trait GraftStaticCall { self: UnaryExpression =>
  /** Fully-qualified static method the generated code calls. */
  def staticCall: String
  /** Whether the static call can return null for non-null input. */
  def callNullable: Boolean

  // A callNullable expression produces null even from non-null input
  // (e.g. an out-of-range serial); claiming child.nullable here breaks
  // row decoding with EXPRESSION_DECODING_FAILED.
  override def nullable: Boolean = self.child.nullable || callNullable

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = self.child.genCode(ctx)
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.javaType(self.dataType)
    val nullCheck =
      if (callNullable) s"if (${ev.value} == null) { ${ev.isNull} = true; }" else ""
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = ${childGen.isNull};
      $javaType ${ev.value} = ${org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.defaultValue(self.dataType)};
      if (!${ev.isNull}) {
        ${ev.value} = $staticCall(${childGen.value});
        $nullCheck
      }""")
  }
}

/** F1 as a native expression: Excel serial → "yyyy-mm-dd[ hh:mm:ss]"
  * (1900-bug semantics, ref: src/streaming_reader.rs:37-127). */
case class ExcelSerialDecode(child: Expression)
    extends UnaryExpression with GraftStaticCall {
  override def dataType: DataType = StringType
  override def prettyName: String = "excel_serial_decode"
  override def staticCall: String = "graft.plans.GraftExprs.excelSerialDecode"
  override def callNullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    GraftExprs.excelSerialDecode(input.asInstanceOf[Double])
  override protected def withNewChildInternal(newChild: Expression): ExcelSerialDecode =
    copy(child = newChild)
}

/** F4 as a native expression: 0-based column index → A..Z,AA..
  * (ref: src/types.rs:214-225). */
case class ColLetter(child: Expression)
    extends UnaryExpression with GraftStaticCall {
  override def dataType: DataType = StringType
  override def prettyName: String = "col_letter"
  override def staticCall: String = "graft.plans.GraftExprs.colLetter"
  override def callNullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    GraftExprs.colLetter(input.asInstanceOf[Int])
  override protected def withNewChildInternal(newChild: Expression): ColLetter =
    copy(child = newChild)
}

/** F7 as a native expression: OOXML escape (ref: xml_writer.rs:100-124). */
case class XmlEscape(child: Expression)
    extends UnaryExpression with GraftStaticCall {
  override def dataType: DataType = StringType
  override def prettyName: String = "xml_escape"
  override def staticCall: String = "graft.plans.GraftExprs.xmlEscape"
  override def callNullable: Boolean = false
  override protected def nullSafeEval(input: Any): Any =
    GraftExprs.xmlEscape(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): XmlEscape =
    copy(child = newChild)
}

/** Beyond-reference: vector dot product over two array<double> columns as
  * a native codegen'd expression — the ANN/dedup hot path stays inside
  * WholeStageCodegen and reads UnsafeArrayData in place (the previous
  * ScalaUDF deserialized both arrays to Scala Seqs per pair). */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  // Strict input check: AbstractDataType is private[sql] in Spark 4, so
  // third-party expressions can't declare ImplicitCastInputTypes; the
  // array<float> upcast callers expect lives in Similarity.dot/l2norm,
  // which wrap inputs with a (no-op-when-already-double) cast.
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> inputs (cast array<float> first), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftExprs.vecDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.GraftExprs.vecDot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Beyond-reference: the IVFPQ ADC inner loop as a native codegen'd
  * expression — (codes BINARY, lut array<double>) → estimated inner
  * product via m one-byte table lookups. This is the projection every
  * PQ candidate row passes through, so it stays inside
  * WholeStageCodegen with the lut read in place. `ksub` is a plan-time
  * constant (the codebook size), baked into the generated code. */
case class AdcScore(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_score"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) if ksub >= 2 && ksub <= 256 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary codes, array<double> lut) and ksub in [2, 256], got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}, ksub=$ksub")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftExprs.adcScore(a.asInstanceOf[Array[Byte]], b.asInstanceOf[ArrayData], ksub)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.GraftExprs.adcScore($a, $b, $ksub)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)
}

/** Beyond-reference: the quantized-SemDeDup SDC inner loop as a native
  * codegen'd expression — (codesA BINARY, codesB BINARY) → estimated
  * inner product via m table lookups. The flattened m·ksub² table rides
  * the plan as a codegen reference object (shipped once per stage in
  * the task binary — a few MB at ksub=256), so the per-pair hot path is
  * pure array indexing inside WholeStageCodegen; the previous ScalaUDF
  * deserialized both byte arrays per PAIR, which made the quantized
  * scan slower than the exact one it replaces. */
case class SdcScore(left: Expression, right: Expression,
    tables: Array[Double], ksub: Int) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sdc_score"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType)
        if ksub >= 2 && ksub <= 256 && tables.length % (ksub * ksub) == 0 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, binary) codes, ksub in [2, 256] and a " +
          s"m*ksub^2 table, got ${left.dataType.simpleString}, " +
          s"${right.dataType.simpleString}, ksub=$ksub, tables=${tables.length}")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftExprs.sdcScore(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]],
      tables, ksub)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sdcTables", tables, "double[]")
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.GraftExprs.sdcScore($a, $b, $ref, $ksub)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SdcScore =
    copy(left = newLeft, right = newRight)
}

/** Beyond-reference: L2 norm of an array<double> column, native codegen. */
case class VecNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> input (cast array<float> first), got ${other.simpleString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    GraftExprs.vecNorm(input.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.GraftExprs.vecNorm($a)")
  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}
