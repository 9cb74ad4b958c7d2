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

  test("file stream -> windowed agg -> xlsx sink matches the batch plan") {
    val base = Files.createTempDirectory("events").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"

    // Stage the events table as the "arriving" files (nanos ts -> micros).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    // Single staged file -> single micro-batch, so Update mode emits each
    // window exactly once with its final value.
    events.coalesce(1).write.parquet(in)

    val q = EventsPipeline.run(spark, in, out, ckpt)
    q.awaitTermination(120000)

    // The streamed result, read back from the xlsx sink, must equal the
    // batch aggregation of the same input.
    val streamed = spark.read.format("xlsx")
      .option("header", "true").option("allSheets", "true").load(out)
    val expected = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .count()
    assert(streamed.count() === expected)
    // Spot-check one aggregate value end-to-end.
    val total = streamed.agg(sum("cnt")).collect()(0).getLong(0)
    assert(total === events.count())
  }
}
