package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Recall/probe-cost curves for the approximate ANN paths, measured
  * against the exact brute-force baseline on the embeddings fixture —
  * the data behind the recall floors pinned in AnnRecallSpec and the
  * table in README. Run:
  * {{{ sbt "runMain graft.tools.AnnLab /root/testdata/sf0.01" }}}
  *
  * Cost proxy: candidate pairs scored (the exact-cosine rerank work) as
  * a fraction of the full |queries|x|corpus| cross product the brute
  * force pays. Everything here is deterministic (seeded hyperplanes,
  * sampled k-means), so the numbers are reproducible run to run. */
object AnnLab {
  def main(args: Array[String]): Unit = {
    // AnnLab [sfDir] | AnnLab --synth N --dim D [--time]
    // --synth swaps the driver fixture for the EmbedSynth clustered corpus
    // at a production dimensionality; --time adds wall-clock rows for the
    // ANN/SemDeDup family (the dim-scaling measurement r9 asked for).
    var sfDir = "/root/testdata/sf0.01"
    var synthN = 0L
    var dim = 64
    var noise = 0.25
    var doTime = false
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--synth" => synthN = args(i + 1).toLong; i += 2
        case "--dim" => dim = args(i + 1).toInt; i += 2
        case "--noise" => noise = args(i + 1).toDouble; i += 2
        case "--time" => doTime = true; i += 1
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
    val nq = q.count()
    val k = 5
    val exact = Similarity.bruteForceTopK(q, "vec_id", "e", e, "vec_id", "e", k = k)
      .select("query_id", "corpus_id").persist()
    val nExact = exact.count()
    println(s"corpus=$n queries=$nq k=$k exact_pairs=$nExact cross=${nq * n}")

    def recallOf(approx: DataFrame): Double =
      exact.join(approx.select("query_id", "corpus_id"),
        Seq("query_id", "corpus_id"), "left_semi").count().toDouble / nExact

    println(s"\nLSH (planes x bands) at dim=$dim: recall@5, candidates as % of cross product")
    for ((planes, bands) <- Seq((16, 4), (18, 6), (16, 8), (24, 6), (24, 8))) {
      val qb = Similarity.hyperplaneBuckets(q, "vec_id", "e", dim, planes, bands)
        .select(col("band"), col("bucket"), col("id").as("query_id"))
      val cb = Similarity.hyperplaneBuckets(e, "vec_id", "e", dim, planes, bands)
        .select(col("band"), col("bucket"), col("id").as("corpus_id"))
      val cand = qb.join(cb, Seq("band", "bucket"))
        .filter(col("query_id") =!= col("corpus_id"))
        .dropDuplicates("query_id", "corpus_id").count()
      val r = recallOf(Similarity.lshTopK(q, "vec_id", "e", e, "vec_id", "e",
        dim = dim, k = k, planes = planes, bands = bands))
      println(f"  $planes%2d x $bands%d: recall=$r%.3f candidates=${cand * 100.0 / (nq * n)}%5.1f%%")
    }

    println("\nIVF (nlist=8): recall@5, cells probed")
    for (nprobe <- Seq(1, 2, 4, 8)) {
      val r = recallOf(Similarity.ivfTopK(q, "vec_id", "e", e, "vec_id", "e",
        k = k, nlist = 8, nprobe = nprobe))
      println(f"  nprobe=$nprobe%d: recall=$r%.3f probe_fraction=${nprobe / 8.0}%.3f")
    }

    if (doTime) {
      println(s"\nwall time (min of 2) at n=$n dim=$dim")
      def t2(f: => Long): Double = {
        def once = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
        val a = once; math.min(a, once)
      }
      // the driver-query shapes, at this corpus/dim
      println(f"  ann_bruteforce      ${t2(Similarity.bruteForceTopK(q, "vec_id", "e", e, "vec_id", "e", k).count())}%7.2f s")
      println(f"  ann_ivf (full)      ${t2(Similarity.ivfTopK(q, "vec_id", "e", e, "vec_id", "e", k = k, nlist = 8, nprobe = 8).count())}%7.2f s")
      println(f"  ann_ivf (nprobe=2)  ${t2(Similarity.ivfTopK(q, "vec_id", "e", e, "vec_id", "e", k = k, nlist = 8, nprobe = 2).count())}%7.2f s")
      // ADC-vs-dot at this dim, same candidate set as ann_ivf (full):
      // IVFPQ scores every candidate with m=16 table lookups where IVF
      // pays a dim-wide dot — the row that decides where the PQ compute
      // verdict flips (README claims payload-only at dim 64)
      println(f"  ann_ivfpq m16 full  ${t2(graft.operators.Pq.ivfPqTopK(q, "vec_id", "e", e, "vec_id", "e", k = k, nlist = 8, nprobe = 8, m = 16, ksub = 256, refine = 8).count())}%7.2f s")
      println(f"  ann_lsh 18x6        ${t2(Similarity.lshTopK(q, "vec_id", "e", e, "vec_id", "e", dim = dim, k = k, planes = 18, bands = 6).count())}%7.2f s")
      println(f"  semantic_dedup_ivf  ${t2(Similarity.semanticDedupIvf(e.select(col("vec_id").as("id"), col("e").as("v")), "id", "v", nlist = 8, threshold = 0.95).count())}%7.2f s")
      // geometry must track density: the default 16x4 (16 buckets/band)
      // is quadratic-in-bucket and dies on dense corpora (measured: 20K
      // clustered 256-wide vectors ran 12+ min); 64x8 keeps ~0.99
      // expected recall at 0.95 cosine with 256 buckets/band
      val (ep, eb) = if (n > 5000) (64, 8) else (16, 4)
      println(f"  dedup_embedding ${ep}%2dx$eb ${t2(graft.operators.Dedup.embeddingNearDups(e, "vec_id", "e", dim = dim, cosineThreshold = 0.95, planes = ep, bands = eb).count())}%7.2f s")
    }
    spark.stop()
  }
}
