package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Pq, Similarity}

/** Query-batch amortization measurement for the stored ANN indexes —
  * the data behind SCALE.md's claim that brute force only wins at toy
  * batch sizes: an index build is paid once, then each query touches
  * nprobe/nlist of the corpus, while brute force re-scans ALL of it per
  * query. This lab builds both stored indexes once on a real corpus,
  * then runs query batches of growing size through brute force, stored
  * IVF, and stored IVFPQ, printing wall clock and per-query amortized
  * cost so the crossover is a measured row instead of an argument.
  *
  * Run: {{{
  *   SPARK_DRIVER_MEM=24g sbt "runMain graft.tools.AnnBatchLab /tmp/sf100ann --batches 10,100,1000"
  * }}}
  * (the 2 M-vector run holds two index builds plus a 2-billion-pair
  * brute-force arm in one JVM — the default 8 g heap is not enough). */
object AnnBatchLab {
  def main(args: Array[String]): Unit = {
    var sfDir = "/root/testdata/sf0.1"
    var batches = Seq(10, 100, 1000)
    var nlist = 16
    var nprobe = 4
    var synthN = 0L
    var dim = 64
    var m = 8
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--batches" => batches = args(i + 1).split(",").map(_.toInt).toSeq; i += 2
        case "--nlist" => nlist = args(i + 1).toInt; i += 2
        case "--nprobe" => nprobe = args(i + 1).toInt; i += 2
        // --synth N --dim D: EmbedSynth corpus at production width,
        // materialized to parquet so the index builds and the brute
        // force arm scan a real stored table — the ADC-vs-dot verdict
        // at dim >= 256 comes from this mode
        case "--synth" => synthN = args(i + 1).toLong; i += 2
        case "--dim" => dim = args(i + 1).toInt; i += 2
        case "--m" => m = args(i + 1).toInt; i += 2
        case d => sfDir = d; i += 1
      }
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val e = (if (synthN > 0) {
      EmbedSynth.corpus(spark, synthN, dim)
        .select(col("vec_id"), col("e"))
        .write.mode("overwrite").parquet("/tmp/graft_batchlab/synth")
      spark.read.parquet("/tmp/graft_batchlab/synth")
    } else spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e")))
    val n = e.count()
    val k = 5
    println(s"corpus=$n dim=$dim m=$m k=$k nlist=$nlist nprobe=$nprobe " +
      s"(probe fraction ${nprobe.toDouble / nlist})")

    val ivfPath = s"/tmp/graft_batchlab/ivf"
    val pqPath = s"/tmp/graft_batchlab/pq"
    val (_, tIvfBuild) = t(Similarity.writeIvfIndex(e, "vec_id", "e", ivfPath, nlist = nlist))
    val (_, tPqBuild) = t(Pq.writePqIndex(e, "vec_id", "e", pqPath, nlist = nlist, m = m, ksub = 128))
    println(f"index build (once): ivf=$tIvfBuild%.1f s  ivfpq=$tPqBuild%.1f s")

    val cents = Similarity.loadIvfCentroids(spark, ivfPath)
    for (b <- batches) {
      // query batch = every (n/b)-th vector: deterministic, spread over cells
      val q = e.filter(col("vec_id") % lit(math.max(1L, n / b)) === 0).limit(b)
        .persist()
      val nq = q.count()
      val (rBf, tBf) = t(Similarity.bruteForceTopK(q, "vec_id", "e", e, "vec_id", "e", k).count())
      val (rIvf, tIvf) = t(Similarity.ivfTopKIndexed(
        q, "vec_id", "e", ivfPath, k, nprobe, cents, filter = None, minCandidates = 0).count())
      val (rPq, tPq) = t(Pq.pqTopKIndexed(q, "vec_id", "e", pqPath, k, nprobe, refine = 8).count())
      println(f"batch=$nq%5d  brute=$tBf%7.1f s (${tBf * 1000 / nq}%7.1f ms/q, rows=$rBf)  " +
        f"ivf=$tIvf%7.1f s (${tIvf * 1000 / nq}%7.1f ms/q, rows=$rIvf)  " +
        f"ivfpq=$tPq%7.1f s (${tPq * 1000 / nq}%7.1f ms/q, rows=$rPq)")
      q.unpersist()
    }
    spark.stop()
  }
}
