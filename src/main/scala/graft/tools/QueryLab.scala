package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry
import graft.operators.Dedup

/** Cold-timing harness for individual SparkEntry queries: one fresh JVM,
  * one session, each named query timed end-to-end (count() forces the
  * full plan) with the Dedup persist registry drained between reps so no
  * run inherits another's caches. This is the number `graft.Bench`'s
  * min-of-2 loop cannot give you — there the second run (and any query
  * sharing a cached subplan with an earlier one) is warm by design.
  *
  * Run: {{{ sbt "runMain graft.tools.QueryLab <query> [query ...] [--sf <dir>] [--reps N]" }}}
  */
object QueryLab {
  def main(args: Array[String]): Unit = {
    var sfDir = "/root/testdata/sf0.1"
    var reps = 1
    // shuffle-partition count: 32 (= cores) suits the sf0.1/sf1 rungs; the
    // sf100 rung's 10M-doc pair/CC stages need partitions sized to the
    // DATA (the 100 TB knob every cluster job turns), not to the core
    // count — 32 partitions of a 5M-doc verify join OOM'd an 8g heap.
    var partitions = 32
    val names = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--sf" => sfDir = args(i + 1); i += 2
        case "--reps" => reps = args(i + 1).toInt; i += 2
        case "--partitions" => partitions = args(i + 1).toInt; i += 2
        case n => names += n; i += 1
      }
    }
    require(names.nonEmpty, "usage: QueryLab <query> [query ...] [--sf dir] [--reps N] [--partitions N]")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", partitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/footers warmup so the first query's number isn't startup noise
    // (lineitem when present; documents-only corpora — the sf100 rung —
    // warm on the table they actually have)
    val warm = Seq("lineitem", "documents")
      .map(t => new java.io.File(s"$sfDir/$t.parquet")).find(_.exists())
    warm.foreach(f => spark.read.parquet(f.getPath).count())

    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        Dedup.unpersistAll(spark)
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(n)(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        (rows, t)
      }
      val rows = times.head._1
      println(f"$n%-28s rows=$rows%-10d cold=${times.map(_._2).map(t => f"$t%.2f").mkString(",")} s")
    }
    Dedup.unpersistAll(spark)
    spark.stop()
  }
}
