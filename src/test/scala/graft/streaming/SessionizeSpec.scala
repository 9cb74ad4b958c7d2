package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Stateful streaming sessionization vs the batch window-function twin. */
class SessionizeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("sessionize-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("batch sessionization: known gaps produce known sessions") {
    val df = spark.sql("""
      SELECT * FROM VALUES
        (1L, TIMESTAMP'2024-01-01 10:00:00'), (1L, TIMESTAMP'2024-01-01 10:10:00'),
        (1L, TIMESTAMP'2024-01-01 11:30:00'), -- > 30 min gap: new session
        (2L, TIMESTAMP'2024-01-01 09:00:00')
      AS t(user_id, ts)""")
    val sessions = Sessionize.sessionsBatch(df, gapMinutes = 30)
      .orderBy("user_id", "session_id").collect()
    assert(sessions.length === 3)
    assert(sessions(0).getAs[Long]("n_events") === 2) // user 1, session 1
    assert(sessions(1).getAs[Long]("n_events") === 1) // user 1, session 2
    assert(sessions(2).getAs[Long]("n_events") === 1) // user 2
  }

  test("streaming flatMapGroupsWithState emits every session the batch twin closes") {
    val base = Files.createTempDirectory("sess").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = graft.operators.Events.eventTs(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    events.coalesce(1).write.parquet(s"$base/in")

    val stream = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      .parquet(s"$base/in")
    val q = Sessionize.sessionsStreaming(spark, stream, gapMinutes = 30)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .format("memory").queryName("sessions_out")
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("sessions_out")
      .select("user_id", "start_ts", "end_ts", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet

    // One micro-batch: every session except each user's final (still-open)
    // one is emitted. Batch twin minus last-session-per-user must match.
    val batch = Sessionize.sessionsBatch(events, gapMinutes = 30)
    val lastPerUser = batch.groupBy("user_id").agg(max("session_id").as("last_id"))
    val expected = batch.join(lastPerUser, Seq("user_id"))
      .filter(col("session_id") < col("last_id"))
      .select("user_id", "start_ts", "end_ts", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet

    assert(expected.nonEmpty, "fixture produced no closed sessions — adjust gap")
    assert(streamed === expected)
  }
}
