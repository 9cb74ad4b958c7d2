package graft.tools

import graft.streaming.EventsPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable streaming demo — the Spark-first counterpart of the
  * reference's examples/postgres_streaming.rs pipeline: stage the events
  * table as an arriving file stream, run the watermarked windowed
  * aggregation, deliver each micro-batch to the xlsx sink, then read the
  * workbook back and print totals.
  *
  * Usage: StreamingDemo <events.parquet dir sf-dir> <workdir>
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val base = args.lift(1).getOrElse(s"/tmp/graft_streaming_demo")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(base), true)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Bound the demo to a 48-hour event span: xlsx delivery is one tiny
    // write job per changed (window, event_type) key, and the full
    // sf-table's ~500 distinct hours make that a ~20-minute wall on this
    // VM without demonstrating anything extra.
    val allEvents = graft.operators.Events.eventTs(
      spark.read.parquet(s"$sfDir/events.parquet"))
    val cutoff = allEvents.agg(min(col("ts")).cast("long")).collect()(0).getLong(0) + 48 * 3600
    val events = allEvents.filter(col("ts").cast("long") < cutoff)
    events.coalesce(1).write.parquet(in)

    val q = EventsPipeline.run(spark, in, out, ckpt)
    if (!q.awaitTermination(600000))
      sys.error("events pipeline did not finish within 10 minutes")

    val result = spark.read.format("xlsx")
      .option("header", "true").option("allSheets", "true").load(out)
    println(s"windows=${result.count()} events_in=${events.count()} " +
      s"events_aggregated=${result.agg(sum("cnt")).collect()(0).getLong(0)}")

    // Stateful sessionization: stream (flatMapGroupsWithState) vs batch twin.
    val sessStream = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      .parquet(in)
    val sq = graft.streaming.Sessionize.sessionsStreaming(spark, sessStream)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/sess_ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("demo_sessions").start()
    sq.awaitTermination(120000)
    if (sq.isActive) sq.stop() // don't leave it to race spark.stop()'s teardown
    val streamedSessions = spark.table("demo_sessions").count()
    val batchSessions = graft.streaming.Sessionize.sessionsBatch(events).count()
    val openSessions = events.select("user_id").distinct().count() // one open per user
    println(s"sessions_streamed=$streamedSessions sessions_batch=$batchSessions " +
      s"open_per_user=$openSessions consistent=${streamedSessions == batchSessions - openSessions}")

    // Windowed heavy hitters: Space-Saving sketch as bounded stream state.
    val hhStream = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      .parquet(in)
    val hq = graft.streaming.StreamingTopK.windowedTopK(hhStream, "event_type", "ts",
        windowLen = "1 hour", watermark = "10 minutes", k = 3, capacity = 64)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/topk_ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("demo_topk").start()
    hq.awaitTermination(120000)
    if (hq.isActive) hq.stop()
    val topkRows = spark.table("demo_topk")
    val closedWindows = topkRows.select("window_start").distinct().count()
    println(s"topk_rows=${topkRows.count()} topk_closed_windows=$closedWindows " +
      s"zero_error=${topkRows.filter(col("err") =!= 0).count() == 0}")
    spark.stop()
  }
}
