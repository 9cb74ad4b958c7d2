package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Every registered graft_* SQL function exercised through spark.sql. */
class GraftFunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def one(sql: String): org.apache.spark.sql.Row = spark.sql(sql).collect()(0)

  test("date serial family") {
    val r = one("""SELECT graft_excel_date_decode(44562.5) AS a,
                          graft_excel_serial_to_date(44562.5) AS b,
                          graft_excel_serial_to_ts(44562.5) AS c,
                          graft_excel_date_encode(DATE'2022-01-01') AS d,
                          graft_excel_ts_encode(TIMESTAMP'2022-01-01 12:00:00') AS e,
                          graft_is_leap_year(1900) AS f,
                          graft_is_leap_year(2000) AS g""")
    assert(r.getString(0) === "2022-01-01 12:00:00")
    assert(r.getDate(1).toString === "2022-01-01")
    assert(r.getTimestamp(2).toString === "2022-01-01 12:00:00.0")
    assert(r.getLong(3) === 44562L)
    assert(r.getDouble(4) === 44562.5)
    assert(r.getBoolean(5) === false) // the whole point of the 1900 bug
    assert(r.getBoolean(6) === true)
  }

  test("A1 addressing family") {
    val r = one("""SELECT graft_col_letter(27) AS a, graft_col_index('AB7') AS b,
                          graft_cell_ref(6, 27) AS c""")
    assert(r.getString(0) === "AB")
    assert(r.getInt(1) === 27)
    assert(r.getString(2) === "AB7")
  }

  test("xml escape/unescape inverse pair") {
    val r = one("""SELECT graft_xml_escape('a<b>&"c''') AS e,
                          graft_xml_unescape(graft_xml_escape('a<b>&"c''')) AS rt""")
    assert(r.getString(0) === "a&lt;b&gt;&amp;&quot;c&apos;")
    assert(r.getString(1) === "a<b>&\"c'")
  }

  test("coercion, hash and fingerprint") {
    val r = one("""SELECT graft_as_bool('YES') AS a, graft_as_bool('0') AS b,
                          graft_as_bool('nope') AS c,
                          graft_password_hash('password') AS d,
                          graft_fingerprint64('hello') AS e""")
    assert(r.getBoolean(0) === true)
    assert(r.getBoolean(1) === false)
    assert(r.isNullAt(2))
    assert(r.getString(3).matches("[0-9A-F]{4}"))
    assert(r.getLong(4) === GraftFunctions.fnv1a64("hello"))
  }

  test("pii redaction cascade in SQL") {
    val r = one("""SELECT graft_redact_pii('a@b.io at 1.2.3.4 tel 555-123-4567') AS a,
                          graft_redact_pii('clean text') AS b""")
    assert(r.getString(0) === "<EMAIL> at <IP> tel <PHONE>")
    assert(r.getString(1) === "clean text")
  }

  test("null tolerance across the board") {
    val r = one("""SELECT graft_excel_date_decode(NULL), graft_col_letter(NULL),
                          graft_col_index(NULL), graft_cell_ref(NULL, 1),
                          graft_xml_escape(NULL), graft_as_bool(NULL),
                          graft_password_hash(NULL), graft_fingerprint64(NULL),
                          graft_excel_date_encode(NULL), graft_is_leap_year(NULL),
                          graft_redact_pii(NULL)""")
    (0 until r.length).foreach(i => assert(r.isNullAt(i), s"position $i"))
  }

  test("registration is idempotent per session") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark)
    assert(one("SELECT graft_col_letter(0)").getString(0) === "A")
  }
}
