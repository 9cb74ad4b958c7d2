package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Cross-micro-batch exactly-once per key with bounded state
  * (dropDuplicatesWithinWatermark) — the streaming twin of Dedup.exact. */
class StreamingDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("streaming-dedup-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("retried events across micro-batches are delivered exactly once") {
    val base = Files.createTempDirectory("sdedup").toString
    val s = spark
    import s.implicits._
    def stage(rows: Seq[(Long, String, String)]): Unit = {
      rows.toDF("event_id", "tss", "payload")
        .selectExpr("event_id", "CAST(tss AS TIMESTAMP) AS ts", "payload")
        .coalesce(1).write.mode("append").parquet(s"$base/in")
      Thread.sleep(1100) // distinct mod-times keep file->batch order stable
    }
    // batch 1: ids 1,2,3 with an in-batch duplicate of 1
    stage(Seq(
      (1L, "2024-01-01 10:00:00", "a"), (1L, "2024-01-01 10:00:00", "a-dup"),
      (2L, "2024-01-01 10:01:00", "b"), (3L, "2024-01-01 10:02:00", "c")))
    // batch 2: retries of 2 and 3 (inside the watermark horizon) + new 4
    stage(Seq(
      (2L, "2024-01-01 10:01:00", "b-retry"), (3L, "2024-01-01 10:02:00", "c-retry"),
      (4L, "2024-01-01 10:05:00", "d")))

    val stream = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, payload STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$base/in")
    val q = StreamingDedup.dedupStream(stream, Seq("event_id"), "ts", "1 hour")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .format("memory").queryName("dedup_out")
      .start()
    q.awaitTermination(120000)

    val out = spark.table("dedup_out")
      .collect().map(_.getLong(0)).sorted
    assert(out.toSeq === Seq(1L, 2L, 3L, 4L), s"got ${out.toSeq}")
  }
}
