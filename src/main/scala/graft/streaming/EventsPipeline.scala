package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Structured Streaming pipeline over the `events` stream: watermarked
  * tumbling-window aggregation, optionally delivered to the xlsx sink via
  * foreachBatch — the unbounded-input counterpart of the reference's
  * producer/consumer patterns (ref: README.md:460-472, the DB→Excel→S3
  * Lambda pipeline; examples/postgres_streaming.rs).
  *
  * The reference's "streaming" is bounded-memory pipelining with no
  * event-time semantics (SURVEY §2.6); this adds the real thing: event-time
  * windows, late-data handling via watermark, and incremental state in the
  * Spark state store. The aggregation plan is identical to the batch
  * `events_window` query — one definition, two execution modes, which is
  * exactly the Spark-first answer to the reference's host-code pipelines.
  */
object EventsPipeline {

  /** The shared windowed-aggregation plan (same shape as the batch
    * `events_window` query in SparkEntry). */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** File-stream source over a directory of parquet events (the unbounded
    * stand-in: new files arriving = new events), windowed aggregation,
    * xlsx delivery per micro-batch.
    *
    * Update mode re-emits a key every micro-batch that adds events to
    * it, so an append sink would duplicate (window, event_type) rows and
    * overcount downstream. Delivery is therefore idempotent at exactly
    * the aggregation key: each changed (window, event_type) overwrites
    * its own `outDir/window=<epochSec>/etype=<event_type>` xlsx. The
    * granularity matters — a batch's Update rows carry only the keys
    * that CHANGED, so overwriting a whole window directory would delete
    * sibling event_types delivered by earlier batches. The collect is
    * over the changed keys of one micro-batch — post-aggregation,
    * bounded by hours-per-batch × event-type cardinality, never by
    * event volume. */
  def run(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      checkpoint: String,
      maxFilesPerTrigger: Option[Int] = None,
      schemaDDL: String = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
  ): StreamingQuery = {
    val reader = spark.readStream.schema(schemaDDL)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader.parquet(inDir)
    windowedCounts(stream)
      .writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.persist()
        try {
          val changed = b
            .select(col("hour_start").cast("long"), col("event_type"))
            .distinct().collect()
            .map(r => (r.getLong(0), r.getString(1)))
          changed.foreach { case (h, e) =>
            // event_type can legitimately be null (it is a grouping key, and
            // groupBy keeps null groups): use null-safe equality for the
            // per-key filter, and keep the null segment collision-free by
            // prefixing non-null values ("null" the string -> etype=v_null,
            // NULL the key -> etype=null).
            val eSeg =
              if (e == null) "null"
              else "v_" + java.net.URLEncoder.encode(e, "UTF-8")
            b.filter(col("hour_start").cast("long") === h && (col("event_type") <=> lit(e)))
              .coalesce(1)
              .write.mode("overwrite").format("xlsx")
              .option("header", "true").option("sheet", "agg")
              .save(s"$outDir/window=$h/etype=$eSeg")
          }
        } finally b.unpersist()
      }
      .start()
  }

  /** In-memory sink variant for tests: returns the query; results land in
    * the `events_agg` in-memory table. */
  def runToMemory(spark: SparkSession, events: DataFrame): StreamingQuery =
    windowedCounts(events)
      .writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName("events_agg")
      .start()
}
