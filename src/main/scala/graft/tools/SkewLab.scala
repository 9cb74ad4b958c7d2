package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Skew harness for the span-removal family: plants ONE 40-char
  * boilerplate gram in `nHot` documents (the "page header duplicated a
  * million times" hazard from the r9 verdict) on top of a unique-text
  * background corpus, runs [[Dedup.substringDedup]] with the hot-gram
  * guard engaged (low `hotGramCap` → the planted gram takes the broadcast
  * path) and disengaged (cap = MaxValue → every gram shuffles on the gram
  * key), and prints per-STAGE task-distribution stats (max vs median
  * shuffle-read records and task duration) from a listener.
  *
  * What "bounded" means here: with the guard, no task's shuffle-read
  * record count grows with the hot gram's multiplicity — the planted
  * gram's 10^5 occurrences either combine map-side (counts), ride a
  * broadcast (occurrence join), or key on near-unique (gram,id,i)
  * (keepFirst anti-join). Without it, the occurrence join concentrates
  * the full multiplicity in one task (visible as max >> median in one
  * stage), which AQE may split but a rank window could not.
  *
  * Run: {{{ sbt "runMain graft.tools.SkewLab [--hot N] [--bg N]" }}}
  */
object SkewLab {
  private final class TaskStats extends SparkListener {
    val byStage = new scala.collection.concurrent.TrieMap[Int,
      scala.collection.mutable.ArrayBuffer[(Long, Long)]]() // (records, ms)
    val stageName = new scala.collection.concurrent.TrieMap[Int, String]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = if (t.taskMetrics != null) {
      val recs = t.taskMetrics.shuffleReadMetrics.recordsRead
      val ms = t.taskMetrics.executorRunTime
      byStage.getOrElseUpdate(t.stageId,
        new scala.collection.mutable.ArrayBuffer[(Long, Long)]())
        .synchronized { byStage(t.stageId) += ((recs, ms)) }
    }
    override def onStageCompleted(
        s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      stageName(s.stageInfo.stageId) = s.stageInfo.details.linesIterator
        .find(_.contains("graft.")).getOrElse(s.stageInfo.name).trim
    def reset(): Unit = { byStage.clear(); stageName.clear() }
    def report(label: String): Unit = {
      println(s"== $label — stages with >=4 tasks and any shuffle read:")
      var worst = 0.0
      byStage.toSeq.sortBy(_._1).foreach { case (sid, xs) =>
        if (xs.size >= 4 && xs.map(_._1).sum > 0) {
          val recs = xs.map(_._1).sorted
          val ms = xs.map(_._2).sorted
          val med = math.max(1L, recs(recs.size / 2))
          val ratio = recs.last.toDouble / med
          worst = math.max(worst, ratio)
          println(f"  stage $sid%-5d tasks=${xs.size}%-4d shuffleRecs med=${recs(recs.size / 2)}%-8d max=${recs.last}%-8d ratio=$ratio%6.1f  runMs med=${ms(ms.size / 2)}%-6d max=${ms.last}%-6d  ${stageName.getOrElse(sid, "?")}")
        }
      }
      println(f"  worst max/median shuffle-record ratio: $worst%.1f")
    }
  }

  def main(args: Array[String]): Unit = {
    var nHot = 100000
    var nBg = 20000
    var explain = false
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--hot" => nHot = args(i + 1).toInt; i += 2
        case "--bg" => nBg = args(i + 1).toInt; i += 2
        case "--explain" => explain = true; i += 1
        case a => sys.error(s"unknown arg $a")
      }
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // keep the occurrence join a real shuffle in the unguarded run: the
      // dup-gram list is tiny here and auto-broadcast would hide the skew
      // this lab exists to display
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stats = new TaskStats
    spark.sparkContext.addSparkListener(stats)

    // The planted gram is exactly k=40 chars so it is ONE window of every
    // hot doc; surrounding text is id-unique so all other windows are too.
    val gram = "COMMON-PAGE-HEADER-BOILERPLATE-40CHARS!!"
    require(gram.length == 40)
    // id-unique flanks touch the gram directly, so the ONLY duplicated
    // 40-char window is the gram itself (a shared " intro " flank would
    // quietly plant k-1 extra hot grams via the overlapping windows)
    val hot = spark.range(nHot.toLong).select(col("id"),
      concat(md5(col("id").cast("string")), lit(gram),
        sha2(col("id").cast("string"), 256)).as("text"))
    val bg = spark.range(nHot.toLong, (nHot + nBg).toLong).select(col("id"),
      concat(lit("bg-"), col("id"), lit(" "),
        md5(col("id").cast("string")), lit(" "),
        sha2(col("id").cast("string"), 256)).as("text"))
    val corpus = hot.unionByName(bg).repartition(32).cache()
    println(s"corpus: ${corpus.count()} docs, 1 gram x $nHot occurrences")

    def run(label: String, cap: Long, keepFirst: Boolean): Unit = {
      stats.reset()
      Dedup.unpersistAll(spark)
      spark.sharedState.cacheManager.clearCache()
      corpus.cache().count() // keep the input warm so stats isolate the operator
      stats.reset()
      val t0 = System.nanoTime()
      val out = Dedup.substringDedup(corpus, "id", "text", k = 40,
        keepFirst = keepFirst, hotGramCap = cap)
      if (explain) { println(s"---- plan: $label"); out.explain("formatted") }
      val cut = out.agg(sum(when(col("n_removed") > 0, 1L).otherwise(0L)),
        sum(col("n_removed"))).collect()(0)
      val t = (System.nanoTime() - t0) / 1e9
      println(f"$label: ${t}%.2f s, docsCut=${cut.getLong(0)}, charsRemoved=${cut.getLong(1)}")
      stats.report(label)
      Dedup.unpersistAll(spark)
    }

    // untimed warmup: the first substringDedup in a JVM pays codegen +
    // JIT for the whole family; without this the first labeled run reads
    // 2-3x slower than identical later ones
    // keepFirst + low cap is the superset shape (broadcast-hot machinery
    // AND the anti-joins), so every measured variant runs warm
    Dedup.substringDedup(corpus, "id", "text", k = 40,
      keepFirst = true, hotGramCap = 1000L).count()
    Dedup.unpersistAll(spark)

    run("unguarded cutAll  (cap=MAX) ", Long.MaxValue, keepFirst = false)
    run("guarded   cutAll  (cap=1000)", 1000L, keepFirst = false)
    run("unguarded keepOne (cap=MAX) ", Long.MaxValue, keepFirst = true)
    run("guarded   keepOne (cap=1000)", 1000L, keepFirst = true)
    run("guarded   cutAll  rep2      ", 1000L, keepFirst = false)
    run("unguarded cutAll  rep2      ", Long.MaxValue, keepFirst = false)
    spark.stop()
  }
}
