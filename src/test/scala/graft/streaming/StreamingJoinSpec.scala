package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join: conversions attach to the impression
  * they followed within the horizon; out-of-window rows never match. */
class StreamingJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("streaming-join-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("conversions join their impression within the interval; outside-window rows don't") {
    val base = Files.createTempDirectory("sjoin").toString
    val s = spark
    import s.implicits._

    def write(dir: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("user_id", "tss")
        .selectExpr("user_id", "CAST(tss AS TIMESTAMP) AS ts")
        .coalesce(1).write.mode("append").parquet(s"$base/$dir")

    // impressions at 10:00 (u1, u2, u3); conversions: u1 +10min (in
    // window), u2 +45min (outside 30min window), u4 with no impression
    write("imp", Seq(
      (1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 10:00:00"),
      (3L, "2024-01-01 10:00:00")))
    write("conv", Seq(
      (1L, "2024-01-01 10:10:00"), (2L, "2024-01-01 10:45:00"),
      (4L, "2024-01-01 10:05:00")))

    def stream(dir: String) = spark.readStream
      .schema("user_id BIGINT, ts TIMESTAMP")
      .parquet(s"$base/$dir")

    val q = StreamingJoin.intervalJoin(
      stream("imp"), stream("conv"),
      keyCol = "user_id", tsCol = "ts",
      within = "30 minutes", watermark = "10 minutes")
      .selectExpr("l.user_id AS user_id", "l.ts AS imp_ts", "r.ts AS conv_ts")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .format("memory").queryName("sjoin_out")
      .start()
    q.awaitTermination(120000)

    val out = spark.table("sjoin_out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(2).toString)).sorted
    assert(out.toSeq === Seq((1L, "2024-01-01 10:10:00.0")),
      s"only u1's in-window conversion should match, got ${out.toSeq}")
  }
}
