package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end tests for `format("xlsx")` — the DSv2 replacement for the
  * reference's reader/writer pairs (mirrors tests/integration_test.rs). */
class XlsxDataSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("xlsx-dsv2-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def tmp(): String = Files.createTempDirectory("xlsxspec").toString

  test("typed roundtrip with header: long/double/string/bool/date/timestamp") {
    val dir = tmp() + "/t1"
    val df = spark.sql("""
      SELECT id AS k, id * 1.5 AS v, concat('name-', id) AS s,
             id % 2 = 0 AS ok,
             date_add(DATE'2024-01-01', CAST(id AS INT)) AS d,
             timestamp'2022-01-01 12:00:00' + make_interval(0,0,0,0,0,0,id) AS ts
      FROM range(100)""")
    df.write.mode("overwrite").format("xlsx").option("header", "true").save(dir)
    val back = spark.read.format("xlsx").option("header", "true").load(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) === Seq(
      "k" -> LongType, "v" -> DoubleType, "s" -> StringType,
      "ok" -> BooleanType, "d" -> DateType, "ts" -> TimestampType))
    assert(back.count() === 100)
    val row = back.orderBy("k").filter(col("k") === 3).collect()(0)
    assert(row.getAs[Double]("v") === 4.5)
    assert(row.getAs[String]("s") === "name-3")
    assert(row.getAs[Boolean]("ok") === false)
    assert(row.getAs[java.sql.Date]("d").toString === "2024-01-04")
    assert(row.getAs[java.sql.Timestamp]("ts").toString === "2022-01-01 12:00:03.0")
  }

  test("BinaryType roundtrip: write base64-encodes, read decodes back to bytes") {
    val dir = tmp() + "/bin"
    // includes bytes that are NOT valid UTF-8 text (0xFF, 0x00) — a raw
    // text-bytes read would corrupt these
    val df = spark.range(5).select(col("id"),
      expr("concat(unhex('FF00'), encode(cast(id AS string), 'UTF-8'))").as("payload"))
    df.write.mode("overwrite").format("xlsx").option("header", "true").save(dir)
    val schema = StructType(Seq(StructField("id", LongType), StructField("payload", BinaryType)))
    val back = spark.read.format("xlsx").option("header", "true").schema(schema).load(dir)
      .orderBy("id").collect()
    val orig = df.orderBy("id").collect()
    assert(back.length === 5)
    back.zip(orig).foreach { case (b, o) =>
      assert(java.util.Arrays.equals(b.getAs[Array[Byte]]("payload"),
        o.getAs[Array[Byte]]("payload")), s"binary mismatch at id=${b.getLong(0)}")
    }
  }

  test("column pruning reaches the scan") {
    val dir = tmp() + "/t2"
    spark.range(10).selectExpr("id", "id*2 AS a", "id*3 AS b")
      .write.mode("overwrite").format("xlsx").option("header", "true").save(dir)
    val pruned = spark.read.format("xlsx").option("header", "true").load(dir).select("b")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("columns=b"), s"scan not pruned: $scan")
    assert(pruned.agg(sum("b")).collect()(0).getLong(0) === 135)
  }

  test("SQL DDL surface: CREATE TABLE USING xlsx, INSERT INTO/OVERWRITE, SELECT with pushdown") {
    val dir = tmp() + "/ddl"
    spark.sql("DROP TABLE IF EXISTS xt")
    // the catalog path a SQL-first user takes: no DataFrame API anywhere
    spark.sql(
      s"""CREATE TABLE xt (id BIGINT, name STRING, amount DOUBLE)
         |USING xlsx OPTIONS (path '$dir', header 'true')""".stripMargin)
    spark.sql(
      "INSERT INTO xt SELECT id, concat('name-', id), id * 2.0 FROM range(100)")
    val q = spark.sql("SELECT id, name FROM xt WHERE id >= 90")
    // pushdown must survive the catalog route, not just .load()
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("GreaterThanOrEqual(id,90)"),
      s"filter not pushed through the catalog path: $scan")
    assert(scan.contains("columns=id,name"), s"scan not pruned: $scan")
    val got = q.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.length === 10 && got.map(_._1).sorted.toSeq === (90L to 99L))
    // INSERT INTO appends
    spark.sql("INSERT INTO xt VALUES (1000, 'extra', 0.5)")
    assert(spark.sql("SELECT count(*) AS n FROM xt").collect()(0).getLong(0) === 101L)
    // INSERT OVERWRITE truncates (TableCapability.TRUNCATE)
    spark.sql("INSERT OVERWRITE xt VALUES (1, 'only', 9.0)")
    val rows = spark.table("xt").collect()
    assert(rows.length === 1 && rows(0).getString(1) === "only")
    spark.sql("DROP TABLE xt")
  }

  test("filter pushdown: pushed filters reach the scan and results stay exact") {
    val dir = tmp() + "/filt"
    spark.range(1000).selectExpr("id", "concat('name-', id) AS s", "id * 2.0 AS v")
      .write.mode("overwrite").format("xlsx").option("header", "true").save(dir)
    val df = spark.read.format("xlsx").option("header", "true").load(dir)
      .filter(col("id") >= 990 && col("s").startsWith("name-99"))
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters"), s"no pushed filters in scan: $scan")
    assert(scan.contains("GreaterThanOrEqual(id,990)"), s"missing filter in: $scan")
    val got = df.select("id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === (990L to 999L))
    // disjunctions push too (keep-biased leaves compose soundly through Or)
    val or = spark.read.format("xlsx").option("header", "true").load(dir)
      .filter(col("id") === 5 || col("s") === "name-998")
    val orScan = or.queryExecution.executedPlan.collectLeaves().head.toString
    assert(orScan.contains("Or(EqualTo(id,5),EqualTo(s,name-998))"), s"Or not pushed: $orScan")
    assert(or.select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(5L, 998L))
    // IsNull pushdown keeps rows with genuinely missing cells
    val nulls = spark.read.format("xlsx").option("header", "true").load(dir)
      .filter(col("v").isNull)
    assert(nulls.count() === 0)
  }

  test("large single sheet splits into multiple input partitions with identical results") {
    val dir = tmp() + "/split"
    // one part file, one sheet, enough rows that a small splitBytes forces
    // several row-range partitions
    spark.range(20000).selectExpr("id", "concat('name-', id) AS s", "id * 1.5 AS v")
      .coalesce(1)
      .write.mode("overwrite").format("xlsx").option("header", "true").save(dir)
    def read(split: Boolean) = spark.read.format("xlsx")
      .option("header", "true")
      .option("splitSheets", split.toString)
      .option("splitBytes", 64 * 1024) // 64 KiB -> many splits for ~1 MB of XML
      .load(dir)
    val whole = read(split = false)
    val split = read(split = true)
    assert(whole.rdd.getNumPartitions === 1, "unsplit read should be one task")
    assert(split.rdd.getNumPartitions > 1,
      s"expected >1 partition, got ${split.rdd.getNumPartitions}")
    // identical content: same count, same sum, no lost/duplicated rows
    assert(split.count() === 20000L)
    assert(split.agg(sum("id")).collect()(0).getLong(0) ===
      whole.agg(sum("id")).collect()(0).getLong(0))
    assert(split.select("id").except(whole.select("id")).count() === 0L)
    assert(whole.select("id").except(split.select("id")).count() === 0L)
    // a row lands with its full cells intact across a split boundary
    val r = split.filter(col("id") === 12345).collect()(0)
    assert(r.getAs[String]("s") === "name-12345")
    assert(r.getAs[Double]("v") === 18517.5)
  }

  test("split read + sheetNameColumn + rollover: provenance survives row-range tasks") {
    val dir = tmp() + "/splitmeta"
    spark.range(5000).coalesce(1).write.mode("overwrite").format("xlsx")
      .option("header", "true").option("maxRowsPerSheet", "2000").save(dir)
    val df = spark.read.format("xlsx").option("header", "true")
      .option("sheetNameColumn", "_sheet")
      .option("splitBytes", 64 * 1024)
      .load(dir)
    assert(df.rdd.getNumPartitions > 1)
    assert(df.count() === 5000)
    // every row carries the sheet it physically lives in (rollover names)
    val bySheet = df.groupBy("_sheet").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySheet.values.sum === 5000L)
    assert(bySheet.size === 3, s"expected 3 rollover sheets, got $bySheet")
  }

  test("partition-parallel write produces one part file per partition; read unions them") {
    val dir = tmp() + "/t3"
    spark.range(1000).repartition(8).write.mode("overwrite").format("xlsx").option("header", "true").save(dir)
    val parts = new java.io.File(dir).listFiles().count(_.getName.endsWith(".xlsx"))
    assert(parts === 8)
    val back = spark.read.format("xlsx").option("header", "true").load(dir)
    assert(back.agg(sum("id")).collect()(0).getLong(0) === 499500)
  }

  test("nested partitioned layout reads recursively with a plain load") {
    val dir = tmp() + "/nested"
    // hive-style two-level nesting, as produced by per-key streaming
    // delivery (out/window=X/etype=Y/part.xlsx)
    spark.range(0, 10).write.mode("overwrite").format("xlsx")
      .option("header", "true").save(s"$dir/window=1/etype=a")
    spark.range(10, 30).write.mode("overwrite").format("xlsx")
      .option("header", "true").save(s"$dir/window=1/etype=b")
    spark.range(30, 40).write.mode("overwrite").format("xlsx")
      .option("header", "true").save(s"$dir/window=2/etype=a")
    val back = spark.read.format("xlsx").option("header", "true").load(dir)
    assert(back.count() === 40)
    assert(back.agg(sum("id")).collect()(0).getLong(0) === (0 until 40).sum)
  }

  test("sheet rollover past maxRowsPerSheet: default read follows continuations") {
    val dir = tmp() + "/t4"
    spark.range(250).coalesce(1).write.mode("overwrite").format("xlsx")
      .option("header", "true").option("maxRowsPerSheet", "100").save(dir)
    // the DEFAULT read must see every rolled-over row — reading only sheet
    // 1 was silent data loss (caught by the sf1 audit, round 7)
    val dflt = spark.read.format("xlsx").option("header", "true").load(dir)
    assert(dflt.count() === 250)
    assert(dflt.agg(sum("id")).collect()(0).getLong(0) === 250L * 249 / 2)
    // explicit single-sheet selections stay single-sheet
    val byIndex = spark.read.format("xlsx").option("header", "true")
      .option("sheetIndex", "0").load(dir)
    assert(byIndex.count() === 99) // 100 rows - header
    val all = spark.read.format("xlsx").option("header", "true").option("allSheets", "true").load(dir)
    assert(all.count() === 250)
  }

  test("rollover continuations follow the writer's truncation rule for long sheet names") {
    val dir = tmp() + "/longname"
    val base = "B" * 31 // writer truncates continuations to fit the suffix
    spark.range(250).coalesce(1).write.mode("overwrite").format("xlsx")
      .option("header", "true").option("sheet", base)
      .option("maxRowsPerSheet", "100").save(dir)
    val dflt = spark.read.format("xlsx").option("header", "true").load(dir)
    assert(dflt.count() === 250, "continuations of a truncated base must be followed")
  }

  test("foreign workbook with base_2-shaped names: default read stays first-sheet-only") {
    // no <Application>graft</Application> marker -> continuation union off,
    // even though the names look exactly like our rollover pattern
    val dir = tmp() + "/foreign"
    new java.io.File(dir).mkdirs()
    val z = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(s"$dir/f.xlsx"))
    def entry(name: String, content: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(content.getBytes("UTF-8")); z.closeEntry()
    }
    entry("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Data" sheetId="1" r:id="rId1"/><sheet name="Data_2" sheetId="2" r:id="rId2"/></sheets></workbook>""")
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/><Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/></Relationships>""")
    def sheetXml(v: String) =
      s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>col</t></is></c></row><row r="2"><c r="A2" t="inlineStr"><is><t>$v</t></is></c></row></sheetData></worksheet>"""
    entry("xl/worksheets/sheet1.xml", sheetXml("first"))
    entry("xl/worksheets/sheet2.xml", sheetXml("second"))
    z.close()
    val back = spark.read.format("xlsx").option("header", "true").load(s"$dir/f.xlsx")
    val vals = back.collect().map(_.getString(0))
    assert(vals.toSeq === Seq("first"), s"foreign Data_2 must not union: ${vals.toSeq}")
  }

  test("default read does NOT union an unrelated second sheet (no rollover naming)") {
    val dir = tmp() + "/t4b"
    spark.range(10).selectExpr("id", "concat('s', id) AS k").coalesce(1)
      .withColumn("sheet", expr("IF(id < 5, 'Data', 'Other')"))
      .write.mode("overwrite").format("xlsx")
      .option("header", "true").option("sheetColumn", "sheet").save(dir)
    val dflt = spark.read.format("xlsx").option("header", "true").load(dir)
    assert(dflt.count() === 5, "only the first sheet; 'Other' is not Data_2")
  }

  test("stamped workbooks: a user sheet literally named 'X_2' cannot spoof a continuation") {
    // pre-round-8 this unioned under the default read (name-rule inference);
    // the write-time rollover stamp makes the default read exact
    val dir = tmp() + "/spoof"
    spark.range(10).selectExpr("id").coalesce(1)
      .withColumn("sheet", expr("IF(id < 5, 'X', 'X_2')"))
      .write.mode("overwrite").format("xlsx")
      .option("header", "true").option("sheetColumn", "sheet").save(dir)
    val dflt = spark.read.format("xlsx").option("header", "true").load(dir)
    assert(dflt.count() === 5, "'X_2' is a user sheet, not a rollover continuation")
    // while a REAL chain whose continuation names collide with a user
    // sheet is still followed exactly: keys sort Y first, its rollover
    // continuations claim Y_2/Y_3, and the user's literal 'Y_2' key is
    // uniquified to Y_2_2 — the stamp keeps the default read on the chain
    val dir2 = tmp() + "/skip2"
    spark.range(10).selectExpr("id").coalesce(1)
      .withColumn("sheet", expr("IF(id < 3, 'Y_2', 'Y')"))
      .write.mode("overwrite").format("xlsx").option("header", "true")
      .option("sheetColumn", "sheet").option("maxRowsPerSheet", "4").save(dir2)
    val all = spark.read.format("xlsx").option("header", "true")
      .option("allSheets", "true").option("sheetNameColumn", "_sheet").load(dir2)
    val names = all.select("_sheet").distinct().collect().map(_.getString(0)).toSet
    assert(names === Set("Y", "Y_2", "Y_3", "Y_2_2"), s"unexpected sheet layout: $names")
    val dflt2 = spark.read.format("xlsx").option("header", "true").load(dir2)
    assert(dflt2.count() === 7, "chain Y→Y_2→Y_3 followed; user sheet (now Y_2_2) excluded")
    assert(dflt2.agg(sum("id")).collect()(0).getLong(0) === (3 to 9).sum.toLong)
  }

  test("SaveMode.Overwrite truncates previous part files") {
    val dir = tmp() + "/t5"
    spark.range(50).coalesce(1).write.mode("overwrite").format("xlsx").option("header", "true").save(dir)
    spark.range(10).coalesce(2).write.mode("overwrite").format("xlsx").option("header", "true")
      .save(dir)
    val back = spark.read.format("xlsx").option("header", "true").load(dir)
    assert(back.count() === 10)
  }

  test("headerless read names columns _c0.. and infers from data") {
    val dir = tmp() + "/t6"
    spark.range(5).selectExpr("id", "'x' AS s").coalesce(1)
      .write.mode("overwrite").format("xlsx").save(dir)
    val back = spark.read.format("xlsx").load(dir)
    assert(back.columns.toSeq === Seq("_c0", "_c1"))
    assert(back.schema.head.dataType === LongType)
  }

  test("user-supplied schema skips inference and coerces") {
    val dir = tmp() + "/t7"
    spark.range(5).selectExpr("id", "id * 1.5 AS v").coalesce(1)
      .write.mode("overwrite").format("xlsx").option("header", "true").save(dir)
    val sch = StructType(Seq(StructField("id", StringType), StructField("v", StringType)))
    val back = spark.read.format("xlsx").option("header", "true").schema(sch).load(dir)
    assert(back.orderBy("id").collect().map(_.getString(1)).take(2).toSeq === Seq("0", "1.5"))
  }

  test("early-terminated reads (LIMIT) release file descriptors") {
    val dir = tmp() + "/t9"
    spark.range(20000).selectExpr("id", "concat('r', id) AS s").coalesce(1)
      .write.mode("overwrite").format("xlsx").option("header", "true").save(dir)
    def openFds(): Int = new java.io.File("/proc/self/fd").list().length
    val before = openFds()
    (1 to 30).foreach { _ =>
      spark.read.format("xlsx").option("header", "true").load(dir).limit(1).collect()
    }
    val after = openFds()
    assert(after - before < 15, s"fd leak: $before -> $after")
  }

  test("mixed-type column degrades to string") {
    val dir = tmp() + "/t8"
    spark.sql("SELECT x FROM VALUES ('1'), ('two'), ('3.5') AS t(x)").coalesce(1)
      .write.mode("overwrite").format("xlsx").option("header", "true").save(dir)
    val back = spark.read.format("xlsx").option("header", "true").load(dir)
    assert(back.schema.head.dataType === StringType)
    assert(back.count() === 3)
  }
}
