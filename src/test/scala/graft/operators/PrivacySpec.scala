package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Known-answer tests for PII detection/redaction. */
class PrivacySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("privacy-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def scan(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    Privacy.piiScan(rows.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
      .toMap
  }

  test("counts and redacts each category") {
    val out = scan(
      1L -> "reach me at jane.doe+spam@mail.example.org or 555-123-4567",
      2L -> "server at 192.168.0.1 and 10.0.0.254 rebooted",
      3L -> "no pii here at all",
      4L -> "a@b.io b@c.net 1.2.3.4 999-888-7777")
    assert(out(1L) === ((1L, 1L, 0L, 2L, "reach me at <EMAIL> or <PHONE>")))
    assert(out(2L) === ((0L, 0L, 2L, 2L, "server at <IP> and <IP> rebooted")))
    assert(out(3L) === ((0L, 0L, 0L, 0L, "no pii here at all")))
    assert(out(4L) === ((2L, 1L, 1L, 4L, "<EMAIL> <EMAIL> <IP> <PHONE>")))
  }

  test("email redaction wins over the numeric patterns inside an address") {
    // digits-and-dots local/domain parts must disappear as part of the
    // email, not be half-eaten as a fake IP
    val out = scan(10L -> "mail 1.2.3.4@example.com end")
    assert(out(10L)._5 === "mail <EMAIL> end")
    assert(out(10L)._1 === 1L)
    assert(out(10L)._3 === 0L, "the local part must not also count as an IP")
  }

  test("redaction is idempotent") {
    val s = spark
    import s.implicits._
    val once = Privacy.piiScan(
      Seq((1L, "x a@b.io 1.2.3.4 555-123-4567 y")).toDF("id", "text"), "id", "text")
      .select("id", "redacted").withColumnRenamed("redacted", "text")
    val twice = Privacy.piiScan(once, "id", "text").collect().head
    assert(twice.getString(5) === "x <EMAIL> <IP> <PHONE> y")
    assert(twice.getLong(4) === 0L, "second pass must find nothing")
  }

  test("phone separators: dashes and dots both match, spaces do not") {
    val out = scan(1L -> "call 555-123-4567 or 555.123.4567 not 555 123 4567")
    assert(out(1L)._2 === 2L)
  }
}
