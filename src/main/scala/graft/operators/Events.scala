package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product/event analytics over an event stream table — the funnel and
  * cohort-retention primitives (ClickHouse `windowFunnel`/`retention`
  * territory) expressed as plain joins + aggregates so Catalyst owns the
  * physical plan.
  *
  * Scale shape: both operators shuffle on the user key once per stage
  * and never materialize per-event state; all stage frames are
  * (user, timestamp) pairs — tiny relative to the event table — and
  * co-partition on the user key across stages, so AQE coalesces the
  * chain into back-to-back sort-merge joins without re-shuffles.
  */
object Events {

  /** Normalize the events table's `ts` column to a session-zone
    * TimestampType regardless of how the parquet encoded it: the driver's
    * generator has shipped it both as TIMESTAMP(NANOS) — which Spark only
    * reads as a nanosecond long (`nanosAsLong`) — and as a plain
    * timestamp[us] (read back as TIMESTAMP_NTZ). Integer division keeps
    * precision on the nanos path (double division would round at 1e18);
    * the NTZ cast is instant-preserving because every entry point pins
    * `spark.sql.session.timeZone=UTC`. */
  def eventTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast("timestamp"))
      case org.apache.spark.sql.types.TimestampType => df
      case other =>
        // a third encoding from the generator must fail loudly here, not
        // mis-aggregate silently three operators downstream
        throw new IllegalArgumentException(
          s"events.$tsCol has unsupported type $other; expected " +
            "LongType (nanos), TimestampNTZType, or TimestampType")
    }

  /** Ordered conversion funnel: stage k counts users whose first
    * qualifying `steps(k)` event happened strictly AFTER their stage-k−1
    * qualifying event (first-touch semantics, the standard product
    * funnel). Returns one row per stage: (step, event_type, users).
    *
    * Each stage is events⨝survivors on the user key + a min-timestamp
    * aggregate — map-side-combinable, no windows, no per-user event
    * arrays (the collect_list formulation this replaces would haul every
    * user's history through the shuffle). */
  def funnelCounts(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], within: Option[String] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // fail a malformed horizon at the API boundary with a clear message,
    // not an opaque Catalyst parse error at plan time
    within.foreach { w =>
      // Spark's multi-unit interval syntax admits a fractional quantity on
      // the seconds term only ('1.5 seconds' parses, '1.5 hours' raises
      // INVALID_INTERVAL_FORMAT.INVALID_FRACTION) — mirror that here
      val unit = """(\d+\s+(microsecond|millisecond|second|minute|hour|day|week|month|year)s?|\d+\.\d+\s+seconds?)"""
      require(w.trim.matches(s"(?i)$unit(\\s+$unit)*"),
        s"within must be '<n> <unit>' terms (e.g. '1 hour', '1 hour 30 minutes'); got '$w'")
    }
    val stages = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val hits = df.filter(col(typeCol) === step)
          .select(col(userCol).as("user"), col(tsCol).as("ts"))
        val qualified = prev match {
          case None => hits
          case Some(p) =>
            // optional PER-STEP horizon: each step must land within
            // `within` of the PREVIOUS step's qualifying event. (Note
            // this is a pairwise bound, not ClickHouse windowFunnel's
            // whole-chain-within-window-of-first-event semantics — an
            // n-step chain can span up to (n-1)·within.)
            val horizon = within.map(w => col("ts") <= col("t") + expr(s"INTERVAL $w"))
              .getOrElse(lit(true))
            hits.join(p, Seq("user")).filter(col("ts") > col("t") && horizon)
              .select(col("user"), col("ts"))
        }
        Some(qualified.groupBy(col("user")).agg(min(col("ts")).as("t")))
    }.flatten
    stages.zip(steps).zipWithIndex.map { case ((stage, step), i) =>
      stage.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("step"), lit(step).as("event_type"), col("users"))
    }.reduce(_ unionByName _)
  }

  /** Cohort retention: users grouped by first-seen date, activity counted
    * per `unitDays` period since the cohort date. Returns
    * (cohort_date, period, active_users) — the retention-triangle table.
    *
    * Plan: ONE user-key shuffle — first-seen is an unbounded window min
    * over the user partition, computed in place on the same
    * shuffle+sort the old aggregate⨝events plan paid anyway, minus the
    * aggregate branch, the second corpus pass, and the join (measured
    * 1.43× at the 100 M-event rung, SCALE.md r13b); then the
    * (cohort, period) distinct-count. WindowExec buffers one USER's
    * rows at a time (spillable array), so a hot key degrades to disk,
    * never to a task OOM.
    *
    * Null users are dropped up front: the pre-r13 agg⨝events plan's
    * inner equi-join discarded them implicitly, while a window partition
    * would KEEP null as a key and emit (cohort, period) groups whose
    * countDistinct(user) is 0 — the filter pins the original answer. */
  def retentionCohorts(df: DataFrame, userCol: String, tsCol: String,
      unitDays: Int = 7): DataFrame = {
    require(unitDays > 0, "unitDays must be positive")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user"))
    df.select(col(userCol).as("user"), to_date(col(tsCol)).as("d"))
      .filter(col("user").isNotNull)
      .withColumn("cohort_date", min(col("d")).over(w))
      .select(col("user"), col("cohort_date"),
        floor(datediff(col("d"), col("cohort_date")) / unitDays).cast("int").as("period"))
      .groupBy(col("cohort_date"), col("period"))
      .agg(countDistinct(col("user")).as("active_users"))
  }
}
