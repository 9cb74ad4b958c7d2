package graft.tools

import graft.xlsx._

/** Tiny CLI over the pure-JVM xlsx core (no Spark needed): the library's
  * standalone user surface, analogous to the reference's examples/.
  *
  * Usage:
  *   XlsxCli demo <out.xlsx>          write a typed multi-sheet demo file
  *   XlsxCli dump <in.xlsx> [sheet]   print sheets, dimensions and rows
  */
object XlsxCli {
  def main(args: Array[String]): Unit = args.toList match {
    case "demo" :: out :: Nil =>
      import CellValue._
      val w = new XlsxWriter(new java.io.FileOutputStream(out), 6)
      w.addSheet("Данные")
      w.writeHeaderBold(Seq("name", "qty", "price", "ok", "when"))
      w.writeRowStyled(Seq(
        (Str("ab<&>c"), 0), (IntVal(42), 0), (FloatVal(12.5), 0),
        (BoolVal(true), 0), (DateTime(44562.5), CellStyle.DateTimestamp)))
      w.writeRow(Seq("plain", "", "x", "", ""))
      w.addSheet("S2")
      w.protectSheet(ProtectionOptions(password = Some("pw"), sort = true))
      w.writeRowTyped(Seq(Formula("=A1+B1"), Error("#N/A")))
      w.close()
      println(s"wrote $out (${new java.io.File(out).length()} bytes)")
    case "dump" :: in :: rest =>
      val r = XlsxReader.forFile(in)
      println(s"sheets: ${r.sheetNames.mkString(", ")}")
      val sheets = rest.headOption.map(Seq(_)).getOrElse(r.sheetNames)
      sheets.foreach { s =>
        val (nr, nc) = r.dimensions(s)
        println(s"[$s] ${nr}x$nc")
        r.rows(s).zipWithIndex.take(20).foreach { case (row, i) =>
          println(s"  $i: " + row.map {
            case CellValue.DateTime(d) => s"DateTime($d=${ExcelDate.format(d).getOrElse("?")})"
            case v => v.toString
          }.mkString(" | "))
        }
      }
    case _ =>
      System.err.println("usage: XlsxCli demo <out.xlsx> | dump <in.xlsx> [sheet]")
      sys.exit(2)
  }
}
