package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Head-to-head: built-in (univocity) CSV writer vs a codegen'd
  * concat_ws + text-sink formulation, single writer, same JVM/session.
  *
  * Measured (sf0.1, 600K rows, this VM): builtin 0.88s (683K rows/s),
  * concat_ws+text 1.00s (598K rows/s), with ISO timestamps 1.06s —
  * i.e. the "obvious" bypass is ~15% SLOWER than univocity, because the
  * cast-to-string + concat allocations cost more than univocity's
  * per-field serializers. Kept as the evidence for why graft ships no
  * custom CSV sink: the builtin writer is the fast path, and the gap to
  * BASELINE.md's 1.2M rows/s claim is hardware, not plan shape.
  *
  * Tuning decomposition (round 7, same-JVM, later-in-session so equally
  * warm): builtin 646K, +1MiB stream buffer 656K, +escapeQuotes=false
  * 627K — all within run-to-run noise. Neither knob moves the ceiling;
  * an earlier run that showed +27% for the combo was warm-up ordering
  * (builtin measured first/coldest). Adjudication lives in BASELINE.md.
  *
  * Run: {{{ sbt "runMain graft.tools.CsvLab /root/testdata/sf0.1" }}}
  */
object CsvLab {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = li.count()
    def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def best(f: => Unit): Double = { time(f); math.min(time(f), time(f)) }

    val builtin = best(li.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv("/tmp/csvlab/builtin"))

    val cols = li.columns
    val line = concat_ws(",", cols.map(c => col(c).cast("string")): _*)
    val fast = best(li.select(line.as("value")).coalesce(1)
      .write.mode("overwrite").text("/tmp/csvlab/fast"))

    // formatted timestamp variant (matches the builtin's ISO output shape)
    val line2 = concat_ws(",", cols.map {
      case c @ "l_shipdate" => date_format(col(c), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      case c => col(c).cast("string")
    }: _*)
    val fastIso = best(li.select(line2.as("value")).coalesce(1)
      .write.mode("overwrite").text("/tmp/csvlab/fast_iso"))

    // tuned variants: isolate buffer vs quote-detection effects
    val bufOnly = {
      spark.sparkContext.hadoopConfiguration.setInt("io.file.buffer.size", 1 << 20)
      best(li.coalesce(1).write.mode("overwrite")
        .option("header", "true").csv("/tmp/csvlab/buf"))
    }
    // buffer already at 1 MiB from the bufOnly block (process-global conf)
    val tuned = best(li.coalesce(1).write.mode("overwrite")
      .option("header", "true").option("escapeQuotes", "false")
      .csv("/tmp/csvlab/tuned"))

    println(f"rows=$n")
    println(f"builtin_univocity: $builtin%.3f s  (${n / builtin}%.0f rows/s)")
    println(f"buf_1MB_only:      $bufOnly%.3f s  (${n / bufOnly}%.0f rows/s)")
    println(f"tuned_noquote_1MB: $tuned%.3f s  (${n / tuned}%.0f rows/s)")
    println(f"fast_concat_text:  $fast%.3f s  (${n / fast}%.0f rows/s)")
    println(f"fast_iso_ts:       $fastIso%.3f s  (${n / fastIso}%.0f rows/s)")
    spark.stop()
  }
}
