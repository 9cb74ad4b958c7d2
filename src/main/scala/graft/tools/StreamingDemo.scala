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
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    events.coalesce(1).write.parquet(in)

    val q = EventsPipeline.run(spark, in, out, ckpt)
    q.awaitTermination(120000)

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
    val streamedSessions = spark.table("demo_sessions").count()
    val batchSessions = graft.streaming.Sessionize.sessionsBatch(events).count()
    val openSessions = events.select("user_id").distinct().count() // one open per user
    println(s"sessions_streamed=$streamedSessions sessions_batch=$batchSessions " +
      s"open_per_user=$openSessions consistent=${streamedSessions == batchSessions - openSessions}")
    spark.stop()
  }
}
