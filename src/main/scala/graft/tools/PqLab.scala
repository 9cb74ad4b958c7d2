package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Pq, Similarity}

/** Recall / payload / wall-time grid for the IVFPQ path — the data
  * behind the PQ floors in AnnRecallSpec and the SCALE.md rows. Run:
  * {{{
  *   sbt "runMain graft.tools.PqLab /root/testdata/sf0.01"
  *   sbt "runMain graft.tools.PqLab --synth 20000 --dim 256 --noise 4.0"
  * }}}
  * Grid axes: ksub (codebook size per subspace — distortion), refine
  * (ADC shortlist depth — how much exact re-rank work buys back the
  * quantization error), m (codes per vector — compressed payload
  * bytes). Everything deterministic, so the numbers reproduce. */
object PqLab {
  def main(args: Array[String]): Unit = {
    var sfDir = "/root/testdata/sf0.01"
    var synthN = 0L
    var dim = 64
    var noise = 0.25
    var abOnly = false
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--synth" => synthN = args(i + 1).toLong; i += 2
        case "--dim" => dim = args(i + 1).toInt; i += 2
        case "--noise" => noise = args(i + 1).toDouble; i += 2
        case "--ab-only" => abOnly = true; i += 1
        case d => sfDir = d; i += 1
      }
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = (if (synthN > 0) EmbedSynth.corpus(spark, synthN, dim, noise = noise)
    else spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e")))
      .persist()
    val n = e.count()
    val q = e.filter(col("vec_id") < 20).persist()
    val k = 5
    val exactFull = Similarity.bruteForceTopK(q, "vec_id", "e", e, "vec_id", "e", k = k)
      .persist()
    val exact = exactFull.select("query_id", "corpus_id")
    val nExact = exact.count()
    // true 5th-best cosine per query: the epsilon-recall yardstick
    val kth = exactFull.filter(col("rank") === k)
      .select(col("query_id"), col("cosine").as("ck"))
    println(s"corpus=$n dim=$dim queries=${q.count()} k=$k raw_payload=${8 * dim}B/vec")

    def recallOf(approx: DataFrame): Double =
      exact.join(approx.select("query_id", "corpus_id"),
        Seq("query_id", "corpus_id"), "left_semi").count().toDouble / nExact

    // epsilon-recall (the FAISS-style quality metric for margin-less
    // regimes): an approximate neighbor counts if its TRUE cosine is
    // within eps of the true k-th best — strict recall measures
    // sub-margin ranking among interchangeable neighbors, eps-recall
    // measures whether the search returned equivalent-quality results.
    // Sound here because ivfPqTopK's output cosine is the exact re-rank.
    def epsRecallOf(approx: DataFrame, eps: Double): Double =
      approx.join(kth, Seq("query_id"))
        .filter(col("cosine") >= col("ck") - eps).count().toDouble / nExact

    println("\nIVFPQ grid (nlist=8, full probe isolates the PQ approximation):")
    println("   m ksub refine  codesB  recall  eps-recall@0.01  sec")
    for (m <- Seq(8, 16, 32); if !abOnly && dim % m == 0 && (m < 32 || dim >= 256);
         ksub <- Seq(16, 64, 256); if ksub <= n;
         refine <- Seq(4, 8, 16)) {
      val t0 = System.nanoTime()
      val approx = Pq.ivfPqTopK(q, "vec_id", "e", e, "vec_id", "e",
        k = k, nlist = 8, nprobe = 8, m = m, ksub = ksub, refine = refine)
        .persist()
      val r = recallOf(approx)
      val sec = (System.nanoTime() - t0) / 1e9
      val re = epsRecallOf(approx, 0.01)
      approx.unpersist()
      println(f"  $m%2d $ksub%4d $refine%6d  $m%5dB  $r%.3f  eps01=$re%.3f  $sec%5.1f")
    }

    println("\nIVFPQ pruned probe (the production regime, best grid point):")
    for (nprobe <- Seq(2, 4, 8); if !abOnly) {
      val r = recallOf(Pq.ivfPqTopK(q, "vec_id", "e", e, "vec_id", "e",
        k = k, nlist = 8, nprobe = nprobe, m = math.min(16, dim / 4), ksub = 256,
        refine = 8))
      println(f"  nprobe=$nprobe%d: recall=$r%.3f")
    }

    // SemDeDup pair-scan A/B: the quadratic pair term paid in dim-width
    // dot products + 2x8·dim bytes of per-pair traffic (exact) vs m
    // table lookups + 2·m+16 bytes (quantized). The k axis sets cluster
    // size and therefore pair count — the quantized scan's fixed costs
    // (train, encode) are linear, so it pays off as pairs/corpus grows.
    // Identical outputs asserted at every point.
    println("\nSemDeDup pair-scan A/B (threshold 0.95):")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    for (kc <- Seq(32, 8, 4)) {
      val (exactPairs, tExact) = timed {
        Similarity.semanticDedup(e, "vec_id", "e", k = kc, threshold = 0.95).count()
      }
      graft.operators.Dedup.unpersistAll(spark)
      spark.sharedState.cacheManager.clearCache()
      val (pqPairs, tPq) = timed {
        Pq.semanticDedupPq(e, "vec_id", "e", k = kc, threshold = 0.95,
          m = math.min(16, dim / 4), ksub = math.min(256, n.toInt)).count()
      }
      graft.operators.Dedup.unpersistAll(spark)
      spark.sharedState.cacheManager.clearCache()
      println(f"  k=$kc%2d (~${n / kc} per cluster): exact $tExact%6.1f s, " +
        f"quantized $tPq%6.1f s ($exactPairs pairs)")
      assert(pqPairs == exactPairs, s"A/B outputs diverged: $pqPairs vs $exactPairs")
    }
    spark.stop()
  }
}
