package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry
import graft.operators.Dedup

/** Per-stage breakdown of a single SparkEntry query — the empirical half
  * of the optimization loop (guide §1.1/§7.1) with the UI disabled: a
  * listener records every completed stage's wall time, task count, input
  * bytes, shuffle read/write bytes and executor CPU, so "where does this
  * query's time go" is answerable from a headless run.
  *
  * Run: {{{ sbt "runMain graft.tools.StageLab <query> [--sf dir] [--reps N] [--partitions N]" }}}
  *
  * Reps > 1 show the warm shape (JIT + page cache) vs the cold first rep;
  * stages print in submission order with a run separator. The per-stage
  * rows are our local stand-in for the Stages tab metrics table.
  */
object StageLab {
  private final case class StageRow(id: Int, name: String, tasks: Int,
      wallMs: Long, taskTimeMs: Long, cpuMs: Long, gcMs: Long,
      inputMB: Double, shReadMB: Double, shWriteMB: Double, spillMB: Double)

  private final class StageStats extends SparkListener {
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val i = s.stageInfo
      val m = i.taskMetrics
      val wall = (for (a <- i.submissionTime; b <- i.completionTime) yield b - a).getOrElse(-1L)
      rows.add(StageRow(i.stageId, i.name.takeWhile(_ != '\n'), i.numTasks,
        wall, m.executorRunTime, m.executorCpuTime / 1000000L, m.jvmGCTime,
        m.inputMetrics.bytesRead / 1048576.0,
        m.shuffleReadMetrics.remoteBytesRead / 1048576.0 +
          m.shuffleReadMetrics.localBytesRead / 1048576.0,
        m.shuffleWriteMetrics.bytesWritten / 1048576.0,
        (m.memoryBytesSpilled + m.diskBytesSpilled) / 1048576.0))
    }
  }

  def main(args: Array[String]): Unit = {
    var sfDir = "/root/testdata/sf0.1"
    var reps = 1
    var partitions = 32
    val confs = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val names = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--sf" => sfDir = args(i + 1); i += 2
        case "--reps" => reps = args(i + 1).toInt; i += 2
        case "--partitions" => partitions = args(i + 1).toInt; i += 2
        case "--conf" => // k=v, applied to the session (r20: A/B graft confs)
          require(i + 1 < args.length, "usage: --conf key=value")
          val kv = args(i + 1).split("=", 2)
          require(kv.length == 2, s"usage: --conf key=value (got '${args(i + 1)}')")
          confs += ((kv(0), kv(1))); i += 2
        case n => names += n; i += 1
      }
    }
    require(names.nonEmpty,
      "usage: StageLab <query> [query ...] [--sf dir] [--reps N] [--partitions N]")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", partitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    Seq("lineitem", "documents")
      .map(t => new java.io.File(s"$sfDir/$t.parquet")).find(_.exists())
      .foreach(f => spark.read.parquet(f.getPath).count())

    val stats = new StageStats
    spark.sparkContext.addSparkListener(stats)
    names.foreach { n =>
      (1 to reps).foreach { rep =>
        Dedup.unpersistAll(spark)
        spark.sharedState.cacheManager.clearCache()
        stats.rows.clear()
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(n)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events are posted async (listenerBus is private[spark],
        // so we cannot waitUntilEmpty). A fixed sleep can drop late-posted
        // stage completions on a loaded box and silently under-report the
        // profile — poll the queue until it is stable for 300 ms instead
        // (bounded at 5 s so a wedged bus cannot hang the lab).
        val drainT0 = System.nanoTime()
        var lastSize = -1
        while ({
          val cur = stats.rows.size()
          val grew = cur != lastSize
          lastSize = cur
          grew && (System.nanoTime() - drainT0) / 1e9 < 5.0
        }) Thread.sleep(300)
        println(f"%n=== $n rep $rep: total $wall%.2f s, $rows rows ===")
        println(f"${"stage"}%-5s ${"tasks"}%5s ${"wall_ms"}%8s ${"task_ms"}%8s " +
          f"${"cpu_ms"}%8s ${"gc_ms"}%6s ${"in_MB"}%8s ${"shR_MB"}%7s ${"shW_MB"}%7s ${"spill"}%6s  name")
        import scala.jdk.CollectionConverters._
        stats.rows.asScala.toSeq.sortBy(_.id).foreach { r =>
          println(f"${r.id}%-5d ${r.tasks}%5d ${r.wallMs}%8d ${r.taskTimeMs}%8d " +
            f"${r.cpuMs}%8d ${r.gcMs}%6d ${r.inputMB}%8.1f ${r.shReadMB}%7.1f ${r.shWriteMB}%7.1f " +
            f"${r.spillMB}%6.1f  ${r.name}")
        }
      }
    }
    spark.stop()
  }
}
