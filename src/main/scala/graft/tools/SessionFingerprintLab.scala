package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Full-scale correctness gate for `sessionize` at row counts whose
  * OUTPUT exceeds the row-compare harness (the 1 B-event rung forces
  * 954.7 M session rows — too many to materialize and diff): instead of
  * comparing rows, compare order-independent aggregate FINGERPRINTS of
  * the session table, computed by identical integer arithmetic in Spark
  * and in DuckDB's gaps-and-islands formulation
  * (`tools/session_fingerprint.py`) — the symmetric-difference idea from
  * the cdc_compact 1 B check, compressed into XOR/SUM space.
  *
  * Fingerprint design (all arithmetic stays provably inside BIGINT in
  * both engines — DuckDB ERRORS on 64-bit overflow rather than
  * wrapping, so every packed key is built from a mod-2^31 component
  * shifted 32 and an epoch < 2^32: max value (2^31-1)·2^32 + 2^32-1
  * < 2^63):
  *   k_start = ((user_id % 2^31) << 32) + floor-epoch(start_ts)
  *   k_end   = (((user_id·31 + session_id) % 2^31) << 32) + floor-epoch(end_ts)
  * XOR-aggregated (order-free, overflow-free); plus count(*),
  * sum(n_events), sum(session_id), and max(user_id)/max(session_id)
  * as range witnesses. k_end folds user_id in deliberately: the 10⁴×
  * rung replicates the corpus with user-offset strides, so
  * (session_id, end_ts) alone is REPLICA-INVARIANT and 10 000 identical
  * copies XOR to a content-free 0 — measured, not hypothetical (the
  * first cut of this lab emitted exactly that). A wrong session split
  * anywhere moves start/end/session_id for the affected rows and flips
  * the XORs with overwhelming probability.
  *
  * Run: {{{ sbt "runMain graft.tools.SessionFingerprintLab <eventsDir> [--partitions N]" }}}
  */
object SessionFingerprintLab {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    var sfDir = "/root/testdata/sf0.1"
    var partitions = 32
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--partitions" => partitions = args(i + 1).toInt; i += 2
        case d => sfDir = d; i += 1
      }
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", partitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val sessions = graft.SparkEntry.queries("sessionize")(spark, sfDir)
    val fp = sessions.agg(
      count(lit(1)).as("n"),
      expr("bit_xor(shiftleft(user_id % 2147483648, 32) + cast(start_ts as long))")
        .as("xor_start"),
      expr("bit_xor(shiftleft((user_id * 31 + session_id) % 2147483648, 32) + cast(end_ts as long))")
        .as("xor_end"),
      sum(col("n_events")).as("sum_nev"),
      sum(col("session_id")).as("sum_sid"),
      max(col("user_id")).as("max_user"),
      max(col("session_id")).as("max_sid")).collect()(0)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"""{"engine":"spark","sf":"$sfDir","n":${fp.getLong(0)},""" +
      f""""xor_start":${fp.getLong(1)},"xor_end":${fp.getLong(2)},""" +
      f""""sum_nev":${fp.getLong(3)},"sum_sid":${fp.getLong(4)},""" +
      f""""max_user":${fp.getLong(5)},"max_sid":${fp.getLong(6)},""" +
      f""""secs":$secs%.1f}""")
    spark.stop()
  }
}
