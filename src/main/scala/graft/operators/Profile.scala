package graft.operators

import org.apache.spark.sql.DataFrame
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
}
