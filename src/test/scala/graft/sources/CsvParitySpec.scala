package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** CSV dialect/compression parity with the reference (SURVEY §2.1 S5 /
  * §2.2 K4): custom delimiter + quote, gzip and zstd containers, quoting
  * of embedded delimiters/quotes/newlines. All through Spark's built-in
  * CSV source — the point is to pin that the built-ins cover the
  * reference's surface. */
class CsvParitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def roundtrip(compression: Option[String], sep: String = ",", quote: String = "\""): Long = {
    val dir = Files.createTempDirectory("csvp").toString + "/d"
    val df = spark.range(100).selectExpr("id", "concat('v;,\"', id) AS s")
    val w = df.coalesce(1).write.mode("overwrite")
      .option("header", "true").option("sep", sep).option("quote", quote)
    compression.fold(w)(c => w.option("compression", c)).csv(dir)
    val back = spark.read.schema("id BIGINT, s STRING")
      .option("header", "true").option("sep", sep).option("quote", quote).csv(dir)
    assert(back.filter(col("s") === concat(lit("v;,\""), col("id"))).count() === 100)
    back.count()
  }

  test("plain + custom delimiter/quote (ref: csv_reader delimiter/quote_char builders)") {
    assert(roundtrip(None) === 100)
    assert(roundtrip(None, sep = ";", quote = "'") === 100)
  }

  test("gzip container (ref: .csv.gz, Deflate-6)") {
    assert(roundtrip(Some("gzip")) === 100)
  }

  test("zstd container via graft ZstdCodec (ref: .csv.zst, Zstd-3)") {
    // Hadoop's built-in zstd needs native libhadoop (absent here); the
    // graft codec wraps Spark's bundled zstd-jni instead.
    graft.sources.csv.ZstdCodec.register(spark)
    assert(roundtrip(Some(graft.sources.csv.ZstdCodec.Name)) === 100)
    // and the files really are .zst
    val dir = Files.createTempDirectory("csvz").toString + "/d"
    spark.range(10).coalesce(1).write.mode("overwrite")
      .option("compression", graft.sources.csv.ZstdCodec.Name).csv(dir)
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".csv.zst")), files.mkString(","))
    // bytes start with the zstd magic 28 B5 2F FD
    val zf = new java.io.File(dir).listFiles().find(_.getName.endsWith(".zst")).get
    val head = java.nio.file.Files.readAllBytes(zf.toPath).take(4)
    assert(head.map(_ & 0xFF).toSeq === Seq(0x28, 0xB5, 0x2F, 0xFD))
  }

  test("zip container via graft ZipCsvCodec (ref: .csv.zip, single entry)") {
    graft.sources.csv.ZipCsvCodec.register(spark)
    assert(roundtrip(Some(graft.sources.csv.ZipCsvCodec.Name)) === 100)
    // the files are .csv.zip, a REAL archive: one data.csv entry readable
    // by plain java.util.zip (the desktop-tool contract)
    val dir = Files.createTempDirectory("csvzip").toString + "/d"
    spark.range(10).selectExpr("id").coalesce(1).write.mode("overwrite")
      .option("header", "true")
      .option("compression", graft.sources.csv.ZipCsvCodec.Name).csv(dir)
    val zf = new java.io.File(dir).listFiles().find(_.getName.endsWith(".csv.zip")).get
    val zip = new java.util.zip.ZipFile(zf)
    val entries = zip.entries().asIterator()
    val entry = entries.next()
    assert(entry.getName === "data.csv")
    assert(!entries.hasNext)
    val text = new String(zip.getInputStream(entry).readAllBytes())
    zip.close()
    assert(text.startsWith("id\n0\n1\n"))
  }

  test("zip container: foreign multi-entry archive chain-reads every entry") {
    graft.sources.csv.ZipCsvCodec.register(spark)
    // A foreign-produced .csv.zip with THREE entries (one lacking a
    // trailing newline) plus a directory entry must yield all rows — not
    // silently truncate to the first entry.
    val dir = Files.createTempDirectory("csvzipmulti").toFile
    val zf = new java.io.File(dir, "parts.csv.zip")
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(zf))
    zos.putNextEntry(new java.util.zip.ZipEntry("sub/"))
    zos.closeEntry()
    def put(name: String, body: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(body.getBytes("UTF-8"))
      zos.closeEntry()
    }
    put("part-0.csv", "1,a\n2,b\n")
    put("part-1.csv", "3,c") // no trailing newline: boundary must not merge rows
    put("part-2.csv", "4,d\n")
    zos.close()
    val rows = spark.read.schema("k INT, v STRING").csv(zf.getAbsolutePath)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toSet
    assert(rows === Set(1 -> "a", 2 -> "b", 3 -> "c", 4 -> "d"))
  }

  test("B12: reference CSV corpus — parser cases roundtrip as values (csv/parser.rs:56-131)") {
    // Every parsed-value case from the reference's parser tests survives a
    // Spark CSV write→read roundtrip.
    val cases = Seq("a", "b", "c", "a,b", "Say \"Hello\"", "world", "",
      "Line 1\nLine 2", "normal", "b,c", "b;c", "hello")
    val dir = Files.createTempDirectory("b12").toString + "/d"
    val df = spark.createDataFrame(
      java.util.Arrays.asList(cases.zipWithIndex.map { case (s, i) =>
        org.apache.spark.sql.Row(i, s) }: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType))))
    df.coalesce(1).write.mode("overwrite").option("header", "true")
      .option("escape", "\"").csv(dir)
    val back = spark.read.schema("id INT, s STRING")
      .option("header", "true").option("escape", "\"").option("multiLine", "true").csv(dir)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case (s, i) =>
      // Spark reads empty string back as null — the documented builtin
      // convention (nullValue=""), a deviation from the reference.
      val expected = if (s.isEmpty) null else s
      assert(back(i) === expected, s"case $i")
    }
  }

  test("B12: reference CSV corpus — encoder wire format (csv/encoder.rs:57-122)") {
    import graft.sources.xlsx.XlsxInMemory
    def enc(sep: Char, row: Seq[String]): String = {
      val df = spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(row: _*)),
        org.apache.spark.sql.types.StructType(
          row.indices.map(i => org.apache.spark.sql.types.StructField(s"c$i",
            org.apache.spark.sql.types.StringType))))
      new String(XlsxInMemory.csvBytes(df, sep = sep, header = false)).stripLineEnd
    }
    assert(enc(',', Seq("a", "b", "c")) === "a,b,c")
    assert(enc(',', Seq("a,b", "c")) === "\"a,b\",c")
    assert(enc(',', Seq("Say \"Hello\"", "world")) === "\"Say \"\"Hello\"\"\",world")
    assert(enc(',', Seq("Line 1\nLine 2", "normal")) === "\"Line 1\nLine 2\",normal")
    assert(enc(',', Seq("a", "", "c")) === "a,,c")
    assert(enc(',', Seq("", "", "")) === ",,")
    assert(enc(';', Seq("a", "b;c", "d")) === "a;\"b;c\";d")
  }

  test("embedded newline fields need multiLine on read — the reference's line-based reader cannot do this at all (csv_reader.rs:197-252)") {
    val dir = Files.createTempDirectory("csvml").toString + "/d"
    spark.sql("SELECT 1 AS id, 'line1\nline2' AS s")
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema("id INT, s STRING")
      .option("header", "true").option("multiLine", "true").csv(dir)
    assert(back.collect()(0).getString(1) === "line1\nline2")
  }
}
