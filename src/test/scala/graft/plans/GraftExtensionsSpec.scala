package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Native expressions injected via spark.sql.extensions: values match the
  * UDF path, constant-folding applies, and codegen doesn't fall back. */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-spec")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("excel_serial_decode: goldens incl. the 1900-bug hole and time part") {
    val rows = spark.sql(
      """SELECT excel_serial_decode(44562.5) AS a, excel_serial_decode(59.0) AS b,
                excel_serial_decode(60.0) AS c, excel_serial_decode(0.5) AS d""").collect()(0)
    assert(rows.getString(0) === "2022-01-01 12:00:00")
    assert(rows.getString(1) === "1900-02-28")
    assert(rows.getString(2) === "1900-02-28") // serial 60 = nonexistent 1900-02-29
    assert(rows.isNullAt(3)) // below valid range
  }

  test("col_letter and xml_escape work over a column (codegen path)") {
    val df = spark.range(800).selectExpr(
      "col_letter(CAST(id AS INT)) AS letter",
      "xml_escape(concat('a<', id, '>&')) AS esc")
    val r = df.filter("letter = 'AB'").collect()
    assert(r.length === 1)
    assert(r(0).getString(1) === "a&lt;27&gt;&amp;")
    // whole-stage codegen did not fall back to interpreted mode
    // (the `*(n)` prefix marks codegen'd spans in the plan string)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan)
  }

  test("constant folding: literal input folds at optimization time") {
    val optimized = spark.sql("SELECT excel_serial_decode(44562.0) AS d")
      .queryExecution.optimizedPlan.toString
    assert(optimized.contains("2022-01-01"), optimized)
  }

  test("null propagation") {
    val r = spark.sql("SELECT excel_serial_decode(CAST(NULL AS DOUBLE)) AS a, col_letter(CAST(NULL AS INT)) AS b").collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("vec_dot / vec_norm: values, codegen span, null and error behavior") {
    val df = spark.sql(
      """SELECT vec_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d,
                vec_norm(array(3.0d, 4.0d)) AS n,
                vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS nl""")
    val r = df.collect()(0)
    assert(r.getDouble(0) === 32.0)
    assert(r.getDouble(1) === 5.0)
    assert(r.isNullAt(2))
    // stays inside a whole-stage-codegen span over a column input
    val colDf = spark.range(1000)
      .selectExpr("array(CAST(id AS DOUBLE), 2.0d) AS v")
      .selectExpr("vec_dot(v, v) AS dd")
    assert(colDf.queryExecution.executedPlan.toString.contains("*("))
    assert(colDf.agg(org.apache.spark.sql.functions.max("dd")).collect()(0)
      .getDouble(0) === 999.0 * 999.0 + 4.0)
    // dimension mismatch fails loudly, and the type check rejects non-double
    val ex = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1.0d), array(1.0d, 2.0d))").collect()
    }
    val msgs = Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msgs.contains("dimension"), msgs)
    assertThrows[Exception] {
      spark.sql("SELECT vec_dot(array('x'), array('y'))").collect()
    }
  }

  test("adc_score: known values, codegen span, literal-ksub guard") {
    // codes [0, 2] over ksub=4: lut[0*4+0] + lut[1*4+2] = 10.0 + 61.0
    val r = spark.sql(
      """SELECT adc_score(X'0002',
                array(10.0d, 11.0d, 12.0d, 13.0d,
                      50.0d, 51.0d, 61.0d, 53.0d), 4) AS s""").collect()(0)
    assert(r.getDouble(0) === 71.0)
    // stays inside whole-stage codegen over column inputs
    val colDf = spark.range(100)
      .selectExpr("CAST(CONCAT(CHAR(id % 4)) AS BINARY) AS codes",
        "array(1.0d, 2.0d, 3.0d, 4.0d) AS lut")
      .selectExpr("adc_score(codes, lut, 4) AS s")
    assert(colDf.queryExecution.executedPlan.toString.contains("*("))
    assert(colDf.agg(org.apache.spark.sql.functions.sum("s")).collect()(0)
      .getDouble(0) === (1.0 + 2.0 + 3.0 + 4.0) * 25)
    // ksub must be a literal (it is baked into the generated code)
    assertThrows[Exception] {
      spark.sql("SELECT adc_score(X'00', array(1.0d), CAST(id AS INT)) FROM range(1)").collect()
    }
    // a lut shorter than codes*ksub must raise loudly, not read
    // out-of-bounds memory (ADVICE r10: user-facing SQL surface)
    val short = intercept[Exception] {
      spark.sql("SELECT adc_score(X'0002', array(1.0d, 2.0d, 3.0d), 4)").collect()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: rootMessages(e.getCause))
    assert(rootMessages(short).exists(m => m != null && m.contains("lookup table")),
      s"expected the adc_score length guard, got: ${short.getMessage}")
  }

  test("Similarity column API runs on the native expressions") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Array(1.0, 0.0)), (2L, Array(0.6, 0.8)))
      .toDF("id", "v")
      .select(org.apache.spark.sql.functions.col("id"),
        graft.operators.Similarity.cosine(
          org.apache.spark.sql.functions.col("v"),
          org.apache.spark.sql.functions.array(
            org.apache.spark.sql.functions.lit(1.0d),
            org.apache.spark.sql.functions.lit(0.0d))).as("cos"))
    val m = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(1L) === 1.0)
    assert(math.abs(m(2L) - 0.6) < 1e-12)
  }

  test("topk_by_score: SQL aggregate form, ordering and literal-k guard") {
    spark.range(100)
      .selectExpr("id % 4 AS key", "id AS rid", "CAST(id % 10 AS DOUBLE) AS score")
      .createOrReplaceTempView("tks")
    val rows = spark.sql(
      """SELECT key, topk_by_score(score, rid, 2) AS tk
        |FROM tks GROUP BY key ORDER BY key""".stripMargin).collect()
    assert(rows.length === 4)
    // key 0: rids 0,4,..,96; scores = rid % 10 -> best score 8 at rids 8, 28, ...
    // top-2 = (8.0, 8), (8.0, 28): ties keep the smallest ids, best first
    val tk0 = rows(0).getSeq[org.apache.spark.sql.Row](1)
    assert(tk0.map(r => (r.getDouble(0), r.getLong(1))) === Seq((8.0, 8L), (8.0, 28L)))
    val err = intercept[Exception] {
      spark.sql("SELECT topk_by_score(score, rid, CAST(rid AS INT)) FROM tks").collect()
    }
    assert(err.getMessage.contains("integer literal"))
  }
}
