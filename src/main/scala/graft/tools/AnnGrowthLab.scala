package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Pq, Similarity}

/** ANN decade-5 rung (SCALE.md): the stored-IVFPQ lifecycle at real
  * index size — build on the base corpus, GROW it through
  * [[Pq.appendPqIndex]] (the incremental path a streaming ingest uses),
  * watch the drift monitor separate an in-distribution batch from a
  * genuinely drifted one, then probe at the production regime
  * (nprobe ≪ nlist, PQ codes + bounded re-rank) and measure the recall
  * floor against exact brute force on the same queries.
  *
  * The drifted batch is a SPECTRAL CONCENTRATION of the corpus (first
  * 8 dims ×6, the rest ×0.25, deterministic): the driver corpus is
  * near-isotropic (per-dim means ≈ 0, label-centroid fit ≈ 0.2), so
  * order-permuting transforms like dim reversal are
  * distribution-PRESERVING and show nothing — real drift must change
  * the per-subspace energy profile. Concentration does: normalized
  * vectors carry ~6× entries in subspace 0 and near-zero everywhere
  * else, far outside every trained codebook's range, so `pq_err` must
  * rise sharply vs the in-distribution row (and `coarse_fit` moves as
  * far as an isotropic quantizer CAN move). That separation — not the
  * absolute values — is what a retrain trigger thresholds on.
  *
  * Run: {{{
  *   SPARK_DRIVER_MEM=24g sbt "runMain graft.tools.AnnGrowthLab /tmp/sf1000ann \
  *     --nlist 256 --nprobe 8 --k 5 --refine 8 --queries 50 --partitions 64"
  * }}} */
object AnnGrowthLab {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    var sfDir = "/root/testdata/sf0.1"
    var nlist = 256
    var nprobes = Seq(8)
    var k = 5
    var refines = Seq(8)
    var nQueries = 50
    var partitions = 64
    var idxPath = "/tmp/graft_growth/idx"
    var synthN = 0L
    var dim = 64
    var noise = 0.25
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--nlist" => nlist = args(i + 1).toInt; i += 2
        case "--nprobe" => nprobes = args(i + 1).split(",").map(_.toInt).toSeq; i += 2
        case "--k" => k = args(i + 1).toInt; i += 2
        case "--refine" => refines = args(i + 1).split(",").map(_.toInt).toSeq; i += 2
        case "--queries" => nQueries = args(i + 1).toInt; i += 2
        case "--partitions" => partitions = args(i + 1).toInt; i += 2
        case "--index" => idxPath = args(i + 1); i += 2
        // --synth N [--dim D --noise X]: EmbedSynth clustered-noise
        // corpus instead of the replicated driver table. The replicated
        // corpus SATURATES recall@k structurally (every query has ~10⁴
        // exact copies, so top-k is all cosine-1.0 ties both engines
        // break identically) — a meaningful recall floor needs a corpus
        // where the true neighbors are merely NEAR (measured: the 20 M
        // replicated run reported a content-free 1.0000).
        case "--synth" => synthN = args(i + 1).toLong; i += 2
        case "--dim" => dim = args(i + 1).toInt; i += 2
        case "--noise" => noise = args(i + 1).toDouble; i += 2
        case d => sfDir = d; i += 1
      }
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", partitions.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    val e = (if (synthN > 0) {
      // materialize so index build and brute force scan a stored table
      EmbedSynth.corpus(spark, synthN, dim, noise = noise)
        .select(col("vec_id"), col("e"))
        .write.mode("overwrite").parquet("/tmp/graft_growth/synth")
      spark.read.parquet("/tmp/graft_growth/synth")
    } else spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e")))
    val n = e.count()
    // 90/10 split on a stride, not a range: the replicated corpus repeats
    // values with a vec_id stride, so a range split would give the growth
    // batch a disjoint VALUE distribution and poison the in-distribution
    // drift row
    val base = e.filter(col("vec_id") % 10 =!= 0)
    val growth = e.filter(col("vec_id") % 10 === 0)
    println(s"""{"corpus":"${if (synthN > 0) s"synth:$synthN:dim$dim:noise$noise" else sfDir}","n":$n,"nlist":$nlist,"nprobe":"${nprobes.mkString(",")}","k":$k,"refine":"${refines.mkString(",")}"}""")

    val (_, buildS) = t(Pq.writePqIndex(base, "vec_id", "e", idxPath, nlist = nlist))
    println(f"""{"step":"build","rows":${n * 9 / 10},"secs":$buildS%.1f}""")

    // drift monitor: in-distribution batch vs a spectrally-concentrated one
    def driftRow(tag: String, batch: org.apache.spark.sql.DataFrame): Unit = {
      val r = Pq.indexDriftStats(batch, "vec_id", "e", idxPath).collect()(0)
      println(s"""{"step":"drift","batch":"$tag","n_vectors":${r.getLong(0)},""" +
        s""""coarse_fit":${r.getDouble(1)},"pq_err":${r.getDouble(2)}}""")
    }
    driftRow("in_distribution", growth)
    driftRow("concentrated_dims", growth.withColumn("e",
      expr("transform(e, (x, i) -> IF(i < 8, x * 6.0D, x * 0.25D))")))

    val (_, appendS) = t(Pq.appendPqIndex(growth, "vec_id", "e", idxPath))
    println(f"""{"step":"append","rows":${n / 10},"secs":$appendS%.1f}""")

    // production-regime probe over the GROWN index; queries stride-sampled
    // from the corpus so every answer set is non-trivial
    val stride = math.max(1L, n / nQueries)
    val q = e.filter(col("vec_id") % stride === 3L).limit(nQueries)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nq = q.count()
    val (exact, exactS) = t {
      val x = Similarity.bruteForceTopK(q, "vec_id", "e", e, "vec_id", "e", k = k)
        .select(col("query_id"), col("corpus_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      x.count(); x
    }
    val denom = exact.count()
    println(f"""{"step":"exact","queries":$nq,"secs":$exactS%.1f}""")

    // plain-IVF comparison arm on the same corpus: at dim 64 the ADC
    // estimate is the recall bottleneck (the standing "at dim 64 use
    // plain IVF" verdict) — this arm shows what the same nprobe buys
    // when candidates are scored with exact dots instead of PQ codes
    val ivfPath = s"$idxPath-ivf"
    val (_, ivfBuildS) = t(Similarity.writeIvfIndex(e, "vec_id", "e", ivfPath, nlist = nlist))
    println(f"""{"step":"ivf_build","rows":$n,"secs":$ivfBuildS%.1f}""")
    for (nprobe <- nprobes) {
      val (a, s1) = t {
        val a = Similarity.ivfTopKIndexed(q, "vec_id", "e", ivfPath, k = k, nprobe = nprobe)
          .select(col("query_id"), col("corpus_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        a.count(); a
      }
      val hit = exact.join(a, Seq("query_id", "corpus_id"), "left_semi").count()
      a.unpersist()
      println(f"""{"step":"ivf_probe","nprobe":$nprobe,"secs":$s1%.1f,""" +
        f""""per_query_ms":${s1 * 1000 / nq}%.0f,"recall_at_$k":${hit.toDouble / denom}%.4f}""")
    }

    // one build serves the whole (nprobe, refine) grid — the knobs a
    // production operator actually turns against a STORED index
    for (nprobe <- nprobes; refine <- refines) {
      val (approx, probeS) = t {
        val a = Pq.pqTopKIndexed(q, "vec_id", "e", idxPath,
            k = k, nprobe = nprobe, refine = refine)
          .select(col("query_id"), col("corpus_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        a.count(); a
      }
      val hit = exact.join(approx, Seq("query_id", "corpus_id"), "left_semi").count()
      approx.unpersist()
      println(f"""{"step":"probe","nprobe":$nprobe,"refine":$refine,"secs":$probeS%.1f,""" +
        f""""per_query_ms":${probeS * 1000 / nq}%.0f,"recall_at_$k":${hit.toDouble / denom}%.4f,"hits":$hit,"of":$denom}""")
    }
    spark.stop()
  }
}
