package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the single latest right
  * row with the same key and `right.ts <= left.ts` — the standard primitive
  * for joining events to slowly-changing state (prices, sessions, feature
  * snapshots) without a range explosion.
  *
  * Spark has no native as-of join (DuckDB/Pandas/kdb do), and the naive
  * formulations both fail at scale: an inequality join degenerates to a
  * per-key cross product, and a "max ts per pair then self-join" plan scans
  * the pair blow-up twice. The distributed-classic formulation used here is
  * union + one window pass:
  *
  *   1. tag left rows 1, right rows 0, union on (key, ts, tag, payload)
  *   2. one shuffle+sort by (key) on (ts, tag) — right sorts before left at
  *      equal ts, so ties count as matches (ts >= semantics)
  *   3. `last(payload, ignoreNulls) over rows unbounded-preceding..current`
  *      carries the latest right payload forward
  *   4. keep left rows, unpack payload
  *
  * Cost: ONE shuffle of |left| + |right| rows on the join key — the same
  * cost class as a sort-merge equi-join, independent of time-range density.
  * Skewed keys salt exactly like any other shuffle (see [[Skew]]).
  */
object AsOfJoin {

  /** Left as-of join.
    *
    * @param left     probe side; every row survives (nulls when no match)
    * @param right    build side: the timeline being looked up
    * @param keyCols  equi-join key columns (present on both sides)
    * @param tsCol    event-time column name (present on both sides)
    * @param rightCols right columns to carry to the output, renamed with
    *                 `rightPrefix` (the right ts arrives as
    *                 `<prefix><tsCol>`)
    * @note right rows must be unique per (key, ts) for a deterministic
    *       result — pre-aggregate the right side if they are not.
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      rightCols: Seq[String],
      rightPrefix: String = "right_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct((tsCol +: rightCols).map(col): _*)
    val l = left.select(
      keyCols.map(col) ++ Seq(col(tsCol).as("_ts"), lit(1).as("_tag"),
        struct(leftCols.map(col): _*).as("_lrow"),
        lit(null).cast(right.select(payload).schema.head.dataType).as("_rpay")): _*)
    // SQL join semantics: NULL never matches — a right row with a null key
    // or null ts must not become anyone's as-of match (window partitioning
    // would otherwise group null keys together, and a null-ts row sorts
    // first and gets carried forward). Left rows always survive (left
    // join); their null keys/ts simply find no match.
    val r = right
      .filter((keyCols.map(col(_).isNotNull) :+ col(tsCol).isNotNull).reduce(_ && _))
      .select(
        keyCols.map(col) ++ Seq(col(tsCol).as("_ts"), lit(0).as("_tag"),
          lit(null).cast(left.select(struct(leftCols.map(col): _*)).schema.head.dataType).as("_lrow"),
          payload.as("_rpay")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts").asc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = l.unionByName(r)
      .withColumn("_m", last(col("_rpay"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
    val projected = leftCols.map(c => col(s"_lrow.$c").as(c)) ++
      (tsCol +: rightCols).map(c => col(s"_m.$c").as(s"$rightPrefix$c"))
    out.select(projected: _*)
  }
}
