package graft.sources

import java.nio.file.Files

import graft.sources.xlsx.XlsxInMemory
import graft.xlsx.XlsxReader
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Column widths (<cols>) and in-memory workbook/CSV builders. */
class XlsxExtrasSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("columnWidths option emits a real <cols> element") {
    val dir = Files.createTempDirectory("xw").toString + "/w"
    spark.range(5).selectExpr("id", "concat('v', id) AS s").coalesce(1)
      .write.mode("overwrite").format("xlsx")
      .option("header", "true").option("columnWidths", "22.5, 8").save(dir)
    val f = new java.io.File(dir).listFiles().find(_.getName.endsWith(".xlsx")).get
    val zip = new java.util.zip.ZipFile(f)
    val entry = zip.getEntry("xl/worksheets/sheet1.xml")
    val xml = new String(zip.getInputStream(entry).readAllBytes())
    zip.close()
    assert(xml.contains("""<col min="1" max="1" width="22.5" customWidth="1"/>"""))
    assert(xml.contains("""<col min="2" max="2" width="8.0" customWidth="1"/>"""))
    assert(xml.indexOf("<cols>") < xml.indexOf("<sheetData>"))
    // and the file still reads back fine
    val back = spark.read.format("xlsx").option("header", "true").load(dir)
    assert(back.count() === 5)
  }

  test("in-memory workbook bytes: the HTTP-response pattern") {
    val df = spark.sql(
      "SELECT id, id * 2.5 AS v, date_add(DATE'2024-01-01', CAST(id AS INT)) AS d FROM range(10)")
    val bytes = XlsxInMemory.workbookBytes(df, sheet = "result")
    val r = XlsxReader.forBytes(bytes)
    assert(r.sheetNames === Seq("result"))
    val rows = r.rows("result").toVector
    assert(rows.size === 11) // header + 10
    assert(rows.head.map(_.asString) === Vector("id", "v", "d"))
  }

  test("in-memory csv bytes: RFC-4180 quoting") {
    val df = spark.sql("""SELECT * FROM VALUES (1, 'plain'), (2, 'with,comma'), (3, 'with "quote"') AS t(id, s)""")
    val csv = new String(XlsxInMemory.csvBytes(df))
    val lines = csv.split("\n")
    assert(lines(0) === "id,s")
    assert(lines.contains("2,\"with,comma\""))
    assert(lines.contains("3,\"with \"\"quote\"\"\""))
  }
}
