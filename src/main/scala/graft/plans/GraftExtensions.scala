package graft.plans

import graft.xlsx.{A1, ExcelDate, Xml}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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
