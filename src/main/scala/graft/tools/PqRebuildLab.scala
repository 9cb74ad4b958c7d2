package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Pq, Similarity}

/** The IVFPQ CO-SCALING rebuild rung (r16) — SCALE.md 15d's missing PQ
  * twin: at 20-30 M vectors, a spectrally drifted batch trips the
  * two-axis retrain verdict, `rebuildPqIndex` retrains BOTH models
  * (coarse quantizer + codebooks) on a hash-spread sample at 2× nlist
  * (the knob an operator turns at rebuild), the verdict clears against
  * the re-baselined held-out reference, and the ADC probe is compared
  * old-vs-new at the MATCHED FRACTION (nprobe scales with nlist) for
  * latency and recall@k against exact brute force over the full
  * (drift-included) corpus.
  *
  * In-plan corpus like AnnScaleLab (EmbedSynth is deterministic in
  * vec_id), so the only stored artifacts are the two indexes.
  *
  * Run: {{{
  *   SPARK_DRIVER_MEM=24g sbt "runMain graft.tools.PqRebuildLab \
  *     --n 20000000 --nlist 256 --rebuildNlist 512 --nprobe 8 --queries 50"
  * }}} */
object PqRebuildLab {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    var n = 20000000L
    var dim = 64
    var nlist = 256
    var m = 8
    var ksub = 256
    var nprobes = Seq(8)
    var k = 5
    var nQueries = 50
    var appendN = 0L // 0 = n/10
    var rebuildNlist = 0 // 0 = 2x nlist (the co-scaling this lab exists for)
    var partitions = 64
    var noise = 2.0
    var root = "/tmp/graft_pqrebuildlab"
    var probeOnly = false // re-probe existing idx/idx2 (repeated estimator)
    var reps = 1
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--probeOnly" => probeOnly = true; i += 1
        case "--reps" => reps = args(i + 1).toInt; i += 2
        case "--n" => n = args(i + 1).toLong; i += 2
        case "--dim" => dim = args(i + 1).toInt; i += 2
        case "--nlist" => nlist = args(i + 1).toInt; i += 2
        case "--m" => m = args(i + 1).toInt; i += 2
        case "--ksub" => ksub = args(i + 1).toInt; i += 2
        case "--nprobe" => nprobes = args(i + 1).split(",").map(_.toInt).toSeq; i += 2
        case "--k" => k = args(i + 1).toInt; i += 2
        case "--queries" => nQueries = args(i + 1).toInt; i += 2
        case "--append" => appendN = args(i + 1).toLong; i += 2
        case "--rebuildNlist" => rebuildNlist = args(i + 1).toInt; i += 2
        case "--partitions" => partitions = args(i + 1).toInt; i += 2
        case "--noise" => noise = args(i + 1).toDouble; i += 2
        case "--root" => root = args(i + 1); i += 2
        case other => sys.error(s"unknown arg $other")
      }
    }
    if (appendN == 0) appendN = n / 10
    val nl2 = if (rebuildNlist > 0) rebuildNlist else 2 * nlist
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
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!probeOnly) fs.delete(new org.apache.hadoop.fs.Path(root), true)

    def gen(lo: Long, hi: Long) = {
      val g = udf((id: Long) => EmbedSynth.vector(id, dim, 32, noise))
      spark.range(lo, hi, 1, partitions)
        .select(col("id").as("vec_id"), g(col("id")).as("e"))
    }
    // AnnScaleLab's spectral drift: changed spectrum, not new ids —
    // distribution-preserving batches must NOT trip the verdict
    def drifted(lo: Long, hi: Long) = gen(lo, hi).withColumn("e",
      expr("transform(e, (x, i) -> IF(i < 8, x * 6.0D, x * 0.25D))"))

    val idx = s"$root/idx"
    val idx2 = s"$root/idx2"
    println(s"""{"corpus":"inplan:$n:dim$dim:noise$noise","nlist":$nlist,"m":$m,"ksub":$ksub,"rebuild_nlist":$nl2}""")
    if (probeOnly) { probeAb(spark, idx, idx2, gen _, drifted _, n, appendN,
      nlist, nl2, nprobes, k, nQueries, reps, t _); spark.stop(); return }
    val (_, buildS) = t(Pq.writePqIndex(gen(0, n), "vec_id", "e", idx,
      nlist = nlist, m = m, ksub = ksub))
    println(f"""{"step":"build","rows":$n,"secs":$buildS%.1f}""")
    def layoutRow(tag: String, path: String): Unit = {
      val (c, v) = Pq.pqIndexLayout(spark, path)
      println(s"""{"step":"layout","at":"$tag","cells":${c.cells},""" +
        s""""codes_resident":${c.residentFiles},"vectors_resident":${v.residentFiles},""" +
        s""""max_files_per_cell":${math.max(c.maxResidentFilesPerCell, v.maxResidentFilesPerCell)}}""")
    }
    layoutRow("build", idx)

    // lifecycle sanity at scale: keyed in-distribution append + fold;
    // the verdict must stay quiet on an in-distribution batch
    val (_, appendS) = t(Pq.appendPqIndexIdempotent(
      gen(n, n + appendN), "vec_id", "e", idx, 0L))
    println(f"""{"step":"append_keyed","rows":$appendN,"secs":$appendS%.1f}""")
    val (_, foldS) = t(Pq.compactPqIndex(spark, idx, committedBatchId = 0L))
    println(f"""{"step":"fold","rows_folded":$appendN,"secs":$foldS%.1f}""")
    val inDist = gen(n + appendN, n + appendN + 4096)
    val vIn = Pq.shouldRetrain(inDist, "vec_id", "e", idx)
    println(s"""{"step":"retrain_verdict","batch":"in_distribution","retrain":${vIn._1},""" +
      s""""fit":${vIn._2},"err":${vIn._3},"ref_fit":${vIn._4},"ref_err":${vIn._5}}""")

    // the drifted keyed batch lands, then its successor trips the verdict
    val driftLo = n + appendN
    val (_, dAppendS) = t(Pq.appendPqIndexIdempotent(
      drifted(driftLo, driftLo + appendN), "vec_id", "e", idx, 1L))
    println(f"""{"step":"drift_append","rows":$appendN,"secs":$dAppendS%.1f}""")
    val probeBatch = drifted(driftLo + appendN, driftLo + appendN + 4096)
    val vStale = Pq.shouldRetrain(probeBatch, "vec_id", "e", idx)
    println(s"""{"step":"retrain_verdict","index":"stale","retrain":${vStale._1},""" +
      s""""fit":${vStale._2},"err":${vStale._3},"ref_fit":${vStale._4},"ref_err":${vStale._5}}""")
    println(s"""{"step":"advice","at":"drift","action":"${Pq.maintenanceAdvice(spark, idx, driftTripped = vStale._1).action}"}""")

    // the remedy, co-scaled: retrain coarse + codebooks at 2x nlist on a
    // hash-spread sample, re-encode every stored row, build-aside
    val (_, rebuildS) = t(Pq.rebuildPqIndex(spark, idx, idx2, nlist = nl2))
    println(f"""{"step":"rebuild","rows":${n + 2 * appendN},"nlist":$nl2,"secs":$rebuildS%.1f,"build_secs":$buildS%.1f}""")
    val vNew = Pq.shouldRetrain(probeBatch, "vec_id", "e", idx2)
    println(s"""{"step":"retrain_verdict","index":"rebuilt","retrain":${vNew._1},""" +
      s""""fit":${vNew._2},"err":${vNew._3},"ref_fit":${vNew._4},"ref_err":${vNew._5}}""")
    layoutRow("rebuilt", idx2)

    probeAb(spark, idx, idx2, gen _, drifted _, n, appendN,
      nlist, nl2, nprobes, k, nQueries, reps, t _)
    spark.stop()
  }

  /** ADC probe A/B at the matched fraction (nprobe/nlist), recall@k
    * against exact brute force over the full drift-included corpus.
    * `reps > 1` alternates stale/rebuilt probes and reports per-rep
    * walls plus the min — the repeated estimator a latency claim needs
    * (the single-shot row's first rebuilt probe pays the cold file
    * cache for an index the rebuild just wrote). */
  private def probeAb(spark: SparkSession, idx: String, idx2: String,
      gen: (Long, Long) => DataFrame, drifted: (Long, Long) => DataFrame,
      n: Long, appendN: Long, nlist: Int, nl2: Int, nprobes: Seq[Int],
      k: Int, nQueries: Int, reps: Int, t: (=> Long) => (Long, Double)): Unit = {
    val driftLo = n + appendN
    val total = n + 2 * appendN
    def corpus = gen(0, driftLo).union(drifted(driftLo, total))
    val stride = math.max(1L, total / nQueries)
    val q = corpus.filter(col("vec_id") % stride === 3L).limit(nQueries)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nq = q.count()
    val t0 = System.nanoTime()
    val exact = Similarity.bruteForceTopK(q, "vec_id", "e", corpus, "vec_id", "e", k = k)
      .select(col("query_id"), col("corpus_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val denom = exact.count()
    println(f"""{"step":"exact_bruteforce","queries":$nq,"secs":${(System.nanoTime() - t0) / 1e9}%.1f}""")
    for (nprobe <- nprobes; (path, nl, tag) <- Seq((idx, nlist, "stale"), (idx2, nl2, "rebuilt"))) {
      val np = math.max(1, nprobe * nl / nlist)
      var hit = 0L
      val walls = (0 until reps).map { _ =>
        val a = Pq.pqTopKIndexed(q, "vec_id", "e", path, k = k, nprobe = np)
          .select(col("query_id"), col("corpus_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val (_, s1) = t(a.count())
        hit = exact.join(a, Seq("query_id", "corpus_id"), "left_semi").count()
        a.unpersist()
        s1
      }
      println(f"""{"step":"probe","index":"$tag","nprobe":$np,"fraction":${np.toDouble / nl}%.4f,""" +
        f""""reps":${walls.map(w => f"$w%.1f").mkString("[", ",", "]")},""" +
        f""""min_per_query_ms":${walls.min * 1000 / nq}%.0f,"recall_at_$k":${hit.toDouble / denom}%.4f}""")
    }
  }
}
