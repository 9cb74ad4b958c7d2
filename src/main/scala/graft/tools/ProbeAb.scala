package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Alternating repeated A/B of indexed-probe latency between two stored
  * IVF indexes over the same corpus (e.g. AnnStreamLab's streamed index
  * vs its batch-built twin) — the single-shot parity row needs a
  * repeated estimator before any latency claim sticks. Alternation
  * cancels warm-up drift; per-rep answers are asserted equal.
  *
  * Run: {{{ sbt "runMain graft.tools.ProbeAb <idxA> <idxB> <corpusParquet> [reps nprobe k nq]" }}} */
object ProbeAb {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    require(args.length >= 3,
      "usage: ProbeAb <idxA> <idxB> <corpusParquet> [reps nprobe k nq]")
    val Array(idxA, idxB, corpus) = args.take(3)
    val reps = if (args.length > 3) args(3).toInt else 5
    val nprobe = if (args.length > 4) args(4).toInt else 8
    val k = if (args.length > 5) args(5).toInt else 5
    val nq = if (args.length > 6) args(6).toInt else 50
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(corpus)
    val n = e.count()
    val stride = math.max(1L, n / nq)
    val q = e.filter(col("vec_id") % stride === 3L).limit(nq)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    q.count()
    def probe(idx: String): (Seq[(Long, Long, Double, Int)], Double) = {
      val t0 = System.nanoTime()
      val a = Similarity.ivfTopKIndexed(q, "vec_id", "e", idx, k = k, nprobe = nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .sortBy(x => (x._1, x._4)).toSeq
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val as = scala.collection.mutable.ArrayBuffer.empty[Double]
    val bs = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (r <- 0 until reps) {
      val (ra, ta) = probe(idxA)
      val (rb, tb) = probe(idxB)
      require(ra == rb, s"answers diverged on rep $r")
      as += ta; bs += tb
      println(f"""{"rep":$r,"a_secs":$ta%.2f,"b_secs":$tb%.2f}""")
    }
    println(f"""{"a_min_ms_per_q":${as.min * 1000 / nq}%.0f,"b_min_ms_per_q":${bs.min * 1000 / nq}%.0f,"a_median":${as.sorted.apply(reps / 2)}%.2f,"b_median":${bs.sorted.apply(reps / 2)}%.2f,"answers_equal_all_reps":true}""")
    spark.stop()
  }
}
