package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization, in both execution modes from one definition
  * of the semantics: a new session starts when a user's inter-event gap
  * exceeds `gapMinutes`.
  *
  * - [[sessionsBatch]]: pure window functions (lag → gap flag → running
  *   sum) — SQL-expressible, so the DuckDB oracle can replicate it
  *   bit-for-bit (`sessionize` query).
  * - [[sessionsStreaming]]: `flatMapGroupsWithState` with per-user state —
  *   the unbounded-input shape, emitting a session once a later event
  *   proves it closed (plus timeout-based flush via processing-time
  *   timeout). State is one (start, end, count) triple per user: O(users)
  *   state, not O(events), which is what survives at 100 TB/day streams.
  */
object Sessionize {

  case class SessionEvent(user_id: Long, ts: java.time.Instant)
  /** State in epoch-MICROS — java.sql.Timestamp.getTime is millis and
    * silently drops the microseconds the batch twin keeps. */
  case class OpenSession(startUs: Long, endUs: Long, n: Long)
  case class Session(user_id: Long, start_ts: java.time.Instant,
      end_ts: java.time.Instant, n_events: Long)

  private def micros(i: java.time.Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  private def instant(us: Long): java.time.Instant =
    java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
      Math.floorMod(us, 1000000L) * 1000L)

  /** Batch: per-session aggregates via window functions. */
  def sessionsBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    events
      .select(col("user_id"), col("ts"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > gapMinutes * 60L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        Window.partitionBy("user_id").orderBy("ts").rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_id", "start_ts", "end_ts", "n_events")
  }

  /** Streaming: per-user state machine. Emits sessions closed by a
    * subsequent event; open sessions flush on state timeout. */
  def sessionsStreaming(
      spark: SparkSession,
      events: DataFrame,
      gapMinutes: Int = 30,
      timeoutMinutes: Int = 60): Dataset[Session] = {
    import spark.implicits._
    // Same gap rule as the batch twin: floored-seconds difference (a
    // sub-second-precision comparison would classify sub-second-border
    // gaps differently than the SQL `cast(ts as long)` path).
    val gapSec = gapMinutes * 60L
    def gapExceeded(prevUs: Long, curUs: Long): Boolean =
      Math.floorDiv(curUs, 1000000L) - Math.floorDiv(prevUs, 1000000L) > gapSec
    events.select(col("user_id"), col("ts")).as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              Session(userId, instant(s.startUs), instant(s.endUs), s.n)).toList
            state.remove()
            out.iterator
          } else {
            // Events within one micro-batch arrive unordered; sort this
            // group's slice (bounded by batch size, not stream size).
            val sorted = batch.toArray.sortBy(e => micros(e.ts))
            var open = state.getOption
            val closed = List.newBuilder[Session]
            for (e <- sorted) {
              val t = micros(e.ts)
              open match {
                case Some(s) if gapExceeded(s.endUs, t) =>
                  closed += Session(userId, instant(s.startUs), instant(s.endUs), s.n)
                  open = Some(OpenSession(t, t, 1))
                case Some(s) =>
                  open = Some(OpenSession(s.startUs, math.max(s.endUs, t), s.n + 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutDuration(s"$timeoutMinutes minutes")
            }
            closed.result().iterator
          }
      }
  }
}
