package graft.streaming

import graft.operators.HeavyHitters
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Streaming windowed heavy hitters: the [[graft.operators.HeavyHitters]]
  * Space-Saving sketch as streaming aggregation state.
  *
  * Why this composition is the right scale shape: a windowed
  * `groupBy(window, key).count()` keeps one state row per (window × key) —
  * unbounded in the key cardinality, the streaming analogue of a full
  * groupBy. The sketch instead bounds every window's state at `capacity`
  * counters regardless of how many distinct keys flow through, and its
  * mergeability is exactly what the state store needs to fold each
  * micro-batch's partial into the running window state. With
  * `capacity >= distinct(keys)` the result is exact and equals the batch
  * `groupBy` twin (asserted in StreamingTopKSpec); under that it degrades
  * to the documented Space-Saving overestimate bounds.
  *
  * Append output mode: a window's top-k is emitted once, when the
  * watermark closes the window — no re-emission, downstream-safe.
  */
object StreamingTopK {

  /** @param events    streaming DataFrame
    * @param keyCol    string column to rank by frequency
    * @param tsCol     event-time column the watermark tracks
    * @param windowLen tumbling window length, e.g. "1 hour"
    * @param watermark allowed lateness, e.g. "10 minutes"
    * @param k         hitters reported per window
    * @param capacity  sketch counters per window (bounds the state) */
  def windowedTopK(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      windowLen: String,
      watermark: String,
      k: Int,
      capacity: Int): DataFrame = {
    val topk = udaf(new HeavyHitters(k, capacity), Encoders.STRING)
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(topk(col(keyCol)).as("tk"))
      .select(col("window.start").as("window_start"), explode(col("tk")).as("h"))
      .select(col("window_start"), col("h.key").as("key"),
        col("h.cnt").as("cnt"), col("h.err").as("err"))
  }
}
