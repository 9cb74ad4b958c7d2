package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: match points to the intervals containing them.
  * Spark plans a bare `p BETWEEN s AND e` join as BroadcastNestedLoop —
  * O(|P|·|I|) compared pairs, a cartesian in disguise — so the scale
  * formulation grids the axis: every interval explodes into the cells it
  * covers, every point lives in exactly ONE cell, and the join becomes an
  * equi-join on cell id with the exact BETWEEN as a post-filter.
  *
  * Because a point has a single cell, each qualifying (point, interval)
  * pair is produced exactly once — no dedup pass. Replication cost is on
  * the interval side only: cells-per-interval ≈ length/bucketWidth + 1,
  * so pick bucketWidth near the median interval length (smaller buckets =
  * more interval copies; bigger buckets = fatter cells to post-filter).
  * The shuffle keys on (cell [, keys]) — uniform when points are, and an
  * interval hotspot salts like any other skewed key ([[Skew]]).
  */
object RangeJoin {

  /** Inner join of `points` to the `intervals` rows whose
    * `[startCol, endCol]` (inclusive both ends) contains `pointCol`.
    * All three columns must be integral (cast dates/timestamps to day or
    * epoch numbers first); `keys` adds equi-join columns present on both
    * sides. Output: point columns ++ interval columns.
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("_cell", floor(col(pointCol) / bucketWidth))
    val iv = intervals.withColumn("_cell",
      explode(sequence(floor(col(startCol) / bucketWidth), floor(col(endCol) / bucketWidth))))
    p.join(iv, "_cell" +: keys)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_cell")
  }
}
