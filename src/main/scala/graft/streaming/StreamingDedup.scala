package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming twin of [[graft.operators.Dedup.exact]]: exactly-once
  * delivery per key over an unbounded stream with BOUNDED state.
  *
  * `dropDuplicates` alone on a stream keeps every key ever seen in the
  * state store — unbounded growth, the classic streaming-dedup trap.
  * `dropDuplicatesWithinWatermark` expires a key's state once the
  * watermark passes its event time, so state is bounded by (keys per
  * watermark horizon), at the cost of re-admitting a duplicate that
  * arrives later than the horizon — the standard at-scale trade
  * (duplicates in real pipelines are retries, clustered in time).
  */
object StreamingDedup {

  /** @param events    streaming DataFrame
    * @param keyCols   identity columns (e.g. event_id, or a content hash)
    * @param tsCol     event-time column the watermark tracks
    * @param watermark horizon within which duplicates are suppressed,
    *                  e.g. "10 minutes"
    */
  def dedupStream(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      watermark: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
  }
}
