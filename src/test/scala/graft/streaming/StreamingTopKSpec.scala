package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Windowed Space-Saving top-k over a stream: append-mode emission on
  * window close, exactness vs the batch groupBy twin in the
  * capacity >= distinct regime. */
class StreamingTopKSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("streaming-topk-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("per-window top-2 equals the batch twin; open window not emitted") {
    val base = Files.createTempDirectory("stopk").toString
    val s = spark
    import s.implicits._
    def stage(rows: Seq[(String, String)]): Unit = {
      rows.toDF("tss", "k")
        .selectExpr("CAST(tss AS TIMESTAMP) AS ts", "k")
        .coalesce(1).write.mode("append").parquet(s"$base/in")
      Thread.sleep(1100) // distinct mod-times keep file->batch order stable
    }
    // window A (10:00): a x3, b x2, c x1 — split across two micro-batches
    stage(Seq("10:00:10" -> "a", "10:10:00" -> "a", "10:20:00" -> "b", "10:30:00" -> "c")
      .map { case (t, k) => (s"2024-01-01 $t", k) })
    stage(Seq("10:40:00" -> "a", "10:50:00" -> "b",
      // window B (11:00): b x2, d x1
      "11:10:00" -> "b", "11:20:00" -> "d", "11:30:00" -> "b")
      .map { case (t, k) => (s"2024-01-01 $t", k) })
    // sentinel far ahead: watermark (10 min lateness) passes both windows;
    // its own 13:00 window stays open and must NOT be emitted
    stage(Seq(("2024-01-01 13:30:00", "zzz")))

    val stream = spark.readStream
      .schema("ts TIMESTAMP, k STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$base/in")
    val q = StreamingTopK.windowedTopK(stream, "k", "ts",
        windowLen = "1 hour", watermark = "10 minutes", k = 2, capacity = 16)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .format("memory").queryName("topk_out")
      .start()
    q.awaitTermination(120000)

    val out = spark.table("topk_out")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, -x._3, x._2))
    // capacity 16 >= 4 distinct keys -> exact counts, zero error
    assert(out.toSeq === Seq(
      ("2024-01-01 10:00:00.0", "a", 3L, 0L),
      ("2024-01-01 10:00:00.0", "b", 2L, 0L),
      ("2024-01-01 11:00:00.0", "b", 2L, 0L),
      ("2024-01-01 11:00:00.0", "d", 1L, 0L)), s"got ${out.toSeq}")
    assert(!out.exists(_._2 == "zzz"), "open window leaked into append output")

    // batch twin: same top-2 per closed window from a plain groupBy
    val batch = spark.read.parquet(s"$base/in")
      .filter(col("ts") < lit("2024-01-01 12:00:00"))
      .groupBy(window(col("ts"), "1 hour"), col("k")).count()
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("window").orderBy(col("count").desc, col("k"))))
      .filter(col("rk") <= 2)
      .select(col("window.start").cast("string"), col("k"), col("count"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(x => (x._1, -x._3, x._2))
    assert(batch.map(x => (x._2, x._3)).toSeq === out.map(x => (x._2, x._3)).toSeq)
  }
}
