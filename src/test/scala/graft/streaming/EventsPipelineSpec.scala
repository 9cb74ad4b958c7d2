package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming demo: events file-stream → watermarked tumbling
  * window → xlsx sink per micro-batch (SURVEY §2.6). */
class EventsPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("events-pipeline-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("multi-batch stream -> windowed agg -> xlsx sink, no duplicate windows") {
    val base = Files.createTempDirectory("events").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"

    // Stage the events table as the "arriving" files (ts normalized to a
    // session-zone timestamp whatever the parquet encoding).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = graft.operators.Events.eventTs(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    // Three time-ordered slices + maxFilesPerTrigger=1 -> three
    // micro-batches arriving in event-time order (a random split would
    // put most of batches 2-3 behind the watermark and drop them). The
    // hour window straddling each slice boundary is re-emitted by Update
    // mode — the duplication case the per-window overwrite sink must
    // absorb. Distinct mod-times keep FileStreamSource's oldest-first
    // ordering deterministic.
    val tiled = events.withColumn("tile",
      ntile(3).over(org.apache.spark.sql.expressions.Window.orderBy("ts")))
    (1 to 3).foreach { i =>
      tiled.filter(col("tile") === i).drop("tile")
        .coalesce(1).write.mode("append").parquet(in)
      Thread.sleep(1100)
    }

    val q = EventsPipeline.run(spark, in, out, ckpt, maxFilesPerTrigger = Some(1))
    q.awaitTermination(180000)

    // The streamed result, read back from the xlsx sink, must equal the
    // batch aggregation of the same input.
    val streamed = spark.read.format("xlsx")
      .option("header", "true").load(s"$out/window=*/etype=*")
    val batchPlan = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
    assert(streamed.count() === batchPlan.count())
    // Exactly one row per (window, event_type) after >=2 batches — the
    // Update-mode re-emissions must not accumulate in the sink.
    val dups = streamed.groupBy("hour_start", "event_type")
      .count().filter(col("count") > 1).count()
    assert(dups === 0)
    // Every event counted exactly once end-to-end.
    val total = streamed.agg(sum("cnt")).collect()(0).getLong(0)
    assert(total === events.count())
  }

  test("null event_type survives the xlsx delivery (sentinel path, null-safe filter)") {
    val base = Files.createTempDirectory("eventsnull").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val s = spark
    import s.implicits._
    Seq(
      (1L, "2026-01-01 10:05:00", 7L, null.asInstanceOf[String], 1.5, "{}"),
      (2L, "2026-01-01 10:15:00", 8L, null.asInstanceOf[String], 2.5, "{}"),
      (3L, "2026-01-01 10:25:00", 9L, "click", 4.0, "{}"))
      .toDF("event_id", "tss", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(in)
    val q = EventsPipeline.run(spark, in, out, ckpt)
    q.awaitTermination(120000)
    val streamed = spark.read.format("xlsx")
      .option("header", "true").load(s"$out/window=*/etype=*")
    // null group delivered once under the sentinel segment, counted fully
    assert(streamed.count() === 2)
    val nullRow = streamed.filter(col("event_type").isNull ||
      col("event_type") === "").collect()
    assert(nullRow.length === 1)
    assert(nullRow.head.getAs[Any]("cnt").toString === "2")
    assert(new java.io.File(s"$out").listFiles().flatMap(_.listFiles())
      .exists(_.getName === "etype=null"))
  }
}
