package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column profiling — the ANALYZE/data-quality primitive every ingest
  * pipeline runs before trusting a new drop: per-column row count,
  * non-null count, exact distinct count, and min/max (stringified so
  * heterogeneous columns stack into one report).
  *
  * Shape: one aggregate pass PER COLUMN (exact distinct cannot share a
  * single pass across columns without a grouping-set explosion), results
  * unioned into one tiny report frame. At 100 TB profile the columns you
  * need, or swap `count(distinct)` for `approx_count_distinct` and get
  * all columns in ONE pass at ±2% error — the approximate twin is the
  * `distinct_count_approx` query's machinery. Each per-column pass is a
  * map-side-combinable aggregate that reads ONLY its column (parquet
  * column pruning does the rest).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        count(col(c)).as("n_nonnull"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_val"),
        max(col(c)).cast("string").as("max_val"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nonnull"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_ unionByName _)
  }

  /** Equi-width histogram over a numeric column: `buckets` bins spanning
    * [min, max], the max value folded into the last bin. Two passes —
    * a min/max aggregate (tiny, broadcast back as a scalar via
    * crossJoin), then one map-side-combinable groupBy on the bin id —
    * both full-scan-once, no sort. Bin edges derive from data, so the
    * report is scale-free; for a fixed dashboard axis pass explicit
    * bounds instead. Degenerate min==max collapses to one bin. */
  def histogram(df: DataFrame, valueCol: String, buckets: Int = 20): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val x = col(valueCol).cast("double")
    val bounds = df.agg(min(x).as("lo"), max(x).as("hi"))
    val binned = df.select(x.as("x")).crossJoin(broadcast(bounds))
      .select(
        when(col("hi") === col("lo"), lit(0))
          .otherwise(least(
            floor((col("x") - col("lo")) * buckets / (col("hi") - col("lo"))),
            lit(buckets - 1))).cast("int").as("bucket"),
        col("lo"), col("hi"))
    binned.groupBy(col("bucket"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("bucket"),
        round(col("lo") + col("bucket") * (col("hi") - col("lo")) / buckets, 4).as("bin_lo"),
        round(col("lo") + (col("bucket") + 1) * (col("hi") - col("lo")) / buckets, 4).as("bin_hi"),
        col("cnt"))
  }

  /** Key-skew report: the top `topK` keys by row count with their share
    * of the table and the running cumulative share — the diagnostic that
    * decides whether a join needs [[Skew.saltedJoin]] or AQE skew
    * handling. One map-side-combinable count per key, then the tiny
    * per-key frame (|keys| rows, not |rows|) flows through the windows.
    * Shares round to 6 dp so the report hashes stably across engines. */
  def keySkew(df: DataFrame, keyCol: String, topK: Int = 20): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    // orderBy.limit = TakeOrdered (per-partition top-K + merge), so the
    // global window below only ever sees topK rows — never all keys.
    val top = counts.orderBy(col("cnt").desc, col("key")).limit(topK)
    val ordered = Window.orderBy(col("cnt").desc, col("key"))
    top.crossJoin(broadcast(total))
      .withColumn("share", col("cnt") / col("total"))
      .withColumn("rank", row_number().over(ordered))
      .withColumn("cum_share", sum(col("share")).over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("rank"), col("key"), col("cnt"),
        round(col("share"), 6).as("share"), round(col("cum_share"), 6).as("cum_share"))
  }
}
