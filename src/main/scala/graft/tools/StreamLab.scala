package graft.tools

import java.io.FileOutputStream

import graft.streaming.StreamingXlsx
import graft.xlsx.{CellStyle, CellValue, ExcelDate, XlsxWriter}
import org.apache.spark.sql.SparkSession

/** End-to-end demo of the streaming xlsx source: drops workbooks into a
  * landing directory WHILE a windowed-count stream is running, and prints
  * the final windowed output. Run:
  * {{{ sbt "runMain graft.tools.StreamLab /tmp/stream_demo" }}}
  */
object StreamLab {
  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0) else "/tmp/stream_demo"
    val in = s"$base/landing"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    new java.io.File(in).mkdirs()
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def drop(name: String, rows: Seq[(Long, String, String)]): Unit = {
      val w = new XlsxWriter(new FileOutputStream(s"$in/$name"))
      w.addSheet("events")
      w.writeHeaderBold(Seq("user_id", "event_type", "ts"))
      rows.foreach { case (u, t, ts) =>
        w.writeRowStyled(Seq(
          (CellValue.IntVal(u), 0), (CellValue.Str(t), 0),
          (CellValue.DateTime(ExcelDate.fromDateTime(
            java.time.LocalDateTime.parse(ts))), CellStyle.DateTimestamp)))
      }
      w.close()
      println(s"dropped $name (${rows.size} rows)")
    }

    drop("first.xlsx", Seq(
      (1L, "view", "2024-01-01T10:05:00"),
      (2L, "view", "2024-01-01T10:15:00"),
      (1L, "click", "2024-01-01T10:20:00")))

    val q = StreamingXlsx.windowedEventCounts(spark, in, "1 hour", "4 hours")
      .writeStream.format("memory").queryName("demo").outputMode("complete").start()
    q.processAllAvailable()
    println(s"after first workbook: ${spark.sql("SELECT sum(events) FROM demo").collect()(0).getLong(0)} events")

    drop("second.xlsx", Seq(
      (3L, "view", "2024-01-01T11:10:00"),
      (4L, "view", "2024-01-01T10:40:00")))
    q.processAllAvailable()
    println("final windowed output:")
    spark.sql(
      """SELECT date_format(window_start, 'yyyy-MM-dd HH:mm') AS window_start,
                event_type, events, approx_users
         FROM demo ORDER BY window_start, event_type""")
      .collect().foreach(r => println(s"  $r"))
    val total = spark.sql("SELECT sum(events) FROM demo").collect()(0).getLong(0)
    q.stop()
    assert(total == 5, s"expected 5 events exactly once, got $total")
    println(s"total events: $total (each dropped row exactly once)")
    spark.stop()
  }
}
