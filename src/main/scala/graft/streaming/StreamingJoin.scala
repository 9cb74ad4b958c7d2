package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Watermarked stream-stream interval join — the enrichment shape
  * (impressions ⨝ conversions, requests ⨝ responses) that completes the
  * streaming surface next to windowed aggregation ([[EventsPipeline]]),
  * sessionization ([[Sessionize]]) and dedup ([[StreamingDedup]]).
  *
  * Both sides carry a watermark and the join condition bounds the event-
  * time distance, so Spark can expire state: a left row is dropped from
  * the state store once the right watermark passes `left.ts + within`,
  * and vice versa — state is bounded by (rows per horizon), not by the
  * stream's lifetime. Without the time bound (or with only one
  * watermark) a stream-stream inner join keeps BOTH sides forever — the
  * unbounded-state trap this module exists to avoid.
  *
  * Scale: state shuffles on the join key like any equi-join; the state
  * store is per-partition RocksDB at cluster scale, so key cardinality
  * within a horizon, not total history, sizes the executors.
  */
object StreamingJoin {

  /** Inner-join `right` rows to `left` rows with the same key where
    * `right.ts` lands in `[left.ts, left.ts + within]`.
    *
    * @param watermark lateness tolerance on BOTH sides (required for
    *                  state expiry on an inner stream-stream join)
    * @param within    max event-time gap right-after-left, e.g. "30 minutes"
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      within: String, watermark: String): DataFrame = {
    val l = left.withWatermark(tsCol, watermark).alias("l")
    val r = right.withWatermark(tsCol, watermark).alias("r")
    l.join(r, expr(
      s"""l.$keyCol = r.$keyCol AND
          r.$tsCol >= l.$tsCol AND
          r.$tsCol <= l.$tsCol + interval $within"""))
  }
}
