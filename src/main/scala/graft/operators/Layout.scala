package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout keys for data skipping: Z-order (Morton) interleaving
  * of two dimensions, so range-partitioned/sorted files get bounded
  * min/max ranges on BOTH columns — the Delta/Iceberg OPTIMIZE ZORDER
  * idea as a plain deterministic column expression.
  *
  * Everything is closed-form bit arithmetic (magic-number bit spread, 4
  * ops per coordinate) inside whole-stage codegen — no UDF, and the
  * identical arithmetic is SQL-expressible for the oracle. At 100 TB:
  * `df.repartitionByRange(col(zkey)).sortWithinPartitions(zkey).write`
  * gives every parquet file a tight bounding box in (a, b), so
  * predicates on EITHER column prune files (a single-column sort prunes
  * only its own column).
  */
object Layout {

  /** Spread the low 16 bits of `x` into the even bit positions of a
    * 32-bit lane (classic magic-number sequence). */
  private def spread16(x: Column): Column = {
    val x1 = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    val x2 = (x1.bitwiseOR(shiftleft(x1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = (x2.bitwiseOR(shiftleft(x2, 2))).bitwiseAND(lit(0x33333333L))
    (x3.bitwiseOR(shiftleft(x3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key from the low 16 bits of two integral columns:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Wider
    * domains are folded mod 2^16 internally — the key only needs to be
    * ORDER-defining, not lossless. */
  def mortonKey(a: Column, b: Column): Column =
    spread16(pmod(a, lit(65536L)).cast("long"))
      .bitwiseOR(shiftleft(spread16(pmod(b, lit(65536L)).cast("long")), 1))

  /** Coarse Z-order bucketing report: assign each row to one of 256
    * Morton prefix buckets and report each bucket's bounding box in the
    * original coordinates — the per-file min/max a Z-ordered layout
    * would give the scan planner. Tight boxes on BOTH dims (vs a 1-D
    * sort's tight-on-one, full-range-on-other) is the data-skipping
    * win this proves. */
  def zorderReport(df: DataFrame, colA: String, colB: String): DataFrame = {
    val x = pmod(col(colA), lit(65536L)).cast("long")
    val y = pmod(col(colB), lit(65536L)).cast("long")
    df.select(x.as("x"), y.as("y"),
        shiftrightunsigned(mortonKey(col(colA), col(colB)), 24).cast("int").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
  }
}
