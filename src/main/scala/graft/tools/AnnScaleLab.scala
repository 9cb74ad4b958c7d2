package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** ANN decade 6 (SCALE.md r15): the plain-IVF stored-index lifecycle at
  * 100 M vectors — one decade past r14's 20 M rung, at the regime the
  * dim-64 recall grid already crowned plain IVF (exact dots re-rank;
  * IVFPQ's ADC is payload-bound, not compute-bound, at this width).
  *
  * Lean by design so the rung fits a single box's disk: the corpus is
  * generated IN-PLAN (EmbedSynth is deterministic in vec_id — scanning
  * the generator twice yields identical vectors, ~2 s per 100 M-row
  * pass), so the only materialized artifact is the index itself
  * (~53 GB at 100 M × dim 64). Brute-force recall truth is computed
  * over the same generated frame, never stored.
  *
  * Measures: build wall; batchId-keyed append + incremental fold wall
  * (the r15 maintenance loop at this scale); probe latency + recall@k
  * vs exact brute force at each nprobe.
  *
  * Run: {{{
  *   SPARK_DRIVER_MEM=24g sbt "runMain graft.tools.AnnScaleLab \
  *     --n 100000000 --dim 64 --nlist 1024 --nprobe 8,32 --queries 50"
  * }}} */
object AnnScaleLab {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    var n = 10000000L
    var dim = 64
    var nlist = 1024
    var nprobes = Seq(8, 32)
    var k = 5
    var nQueries = 50
    var appendN = 0L // 0 = n/10
    var buildChunks = 1
    var partitions = 64
    // noise 2.0 = the 20 M rung's recall regime (AnnGrowthLab): true
    // neighbors are merely NEAR; low noise saturates recall structurally
    var noise = 2.0
    var rebuild = false
    var rebuildNlist = 0 // 0 = keep the stored nlist; set to co-scale at rebuild
    var resident = false
    var hotCells = 8
    var root = "/tmp/graft_scalelab"
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--rebuild" => rebuild = true; i += 1
        case "--rebuildNlist" => rebuildNlist = args(i + 1).toInt; i += 2
        case "--resident" => resident = true; i += 1
        case "--hotCells" => hotCells = args(i + 1).toInt; i += 2
        case "--n" => n = args(i + 1).toLong; i += 2
        case "--dim" => dim = args(i + 1).toInt; i += 2
        case "--nlist" => nlist = args(i + 1).toInt; i += 2
        case "--nprobe" => nprobes = args(i + 1).split(",").map(_.toInt).toSeq; i += 2
        case "--k" => k = args(i + 1).toInt; i += 2
        case "--queries" => nQueries = args(i + 1).toInt; i += 2
        case "--append" => appendN = args(i + 1).toLong; i += 2
        case "--buildChunks" => buildChunks = args(i + 1).toInt; i += 2
        case "--partitions" => partitions = args(i + 1).toInt; i += 2
        case "--noise" => noise = args(i + 1).toDouble; i += 2
        case "--root" => root = args(i + 1); i += 2
        case other => sys.error(s"unknown arg $other")
      }
    }
    if (appendN == 0) appendN = n / 10
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
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    // in-plan corpus: base [0, n), growth [n, n + appendN) — same
    // distribution (cluster id = vec_id % nClusters, id-independent)
    def gen(lo: Long, hi: Long) = {
      val g = udf((id: Long) => EmbedSynth.vector(id, dim, 32, noise))
      spark.range(lo, hi, 1, partitions)
        .select(col("id").as("vec_id"), g(col("id")).as("e"))
    }
    val idx = s"$root/idx"
    println(s"""{"corpus":"inplan:$n:dim$dim:noise$noise","nlist":$nlist,"append":$appendN,"build_chunks":$buildChunks}""")
    // chunked build: train+write on the first chunk, assign-only append
    // for the rest. Disk-bound single boxes need this because the
    // cell-aligned exchange's shuffle files coexist with the parquet
    // output (a one-shot 100 M build peaks at shuffle+output ≈ 2× the
    // index and hit the 62 GB wall); chunking bounds the live shuffle to
    // one chunk. It is also the production incremental shape — the
    // quantizer trains on the first chunk's bounded sample, exactly like
    // a build-then-grow ingest (ann_ivf_indexed's oracle pins equality
    // of that composition in the exhaustive regime).
    val chunk = (n + buildChunks - 1) / buildChunks
    val (_, buildS) = t {
      Similarity.writeIvfIndex(gen(0, chunk), "vec_id", "e", idx, nlist = nlist)
      val ct = Similarity.loadIvfCentroids(spark, idx)
      var lo = chunk
      while (lo < n) {
        Similarity.appendIvfIndex(gen(lo, math.min(n, lo + chunk)), "vec_id", "e", idx, ct)
        lo += chunk
      }
    }
    println(f"""{"step":"build","rows":$n,"secs":$buildS%.1f}""")

    // layout health (graft.operators.IndexLayoutStats): the lab prints
    // it at each lifecycle point so the files-per-cell story is measured
    // by the op itself, not hand-counted ls output
    def layoutRow(tag: String, path: String = idx): Unit = {
      val l = Similarity.ivfIndexLayout(spark, path)
      println(s"""{"step":"layout","at":"$tag","cells":${l.cells},""" +
        s""""batch_leaves":${l.batchLeaves},"batch_files":${l.batchFiles},""" +
        s""""resident_files":${l.residentFiles},"max_files_per_cell":${l.maxResidentFilesPerCell}}""")
    }
    layoutRow("build")

    // the r15 maintenance loop at this scale: keyed append + incremental fold
    val cents = Similarity.loadIvfCentroids(spark, idx)
    val (_, appendS) = t(Similarity.appendIvfIndexIdempotent(
      gen(n, n + appendN), "vec_id", "e", idx, cents, 0L))
    println(f"""{"step":"append_keyed","rows":$appendN,"secs":$appendS%.1f}""")
    layoutRow("append")
    val (_, foldS) = t(Similarity.compactIvfIndex(spark, idx, committedBatchId = 0L))
    println(f"""{"step":"fold","rows_folded":$appendN,"resident":$n,"secs":$foldS%.1f}""")
    layoutRow("fold")

    val total = n + appendN
    val stride = math.max(1L, total / nQueries)
    val q = gen(0, total).filter(col("vec_id") % stride === 3L).limit(nQueries)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nq = q.count()
    val (exact, exactS) = t {
      val x = Similarity.bruteForceTopK(q, "vec_id", "e", gen(0, total), "vec_id", "e", k = k)
        .select(col("query_id"), col("corpus_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      x.count(); x
    }
    val denom = exact.count()
    println(f"""{"step":"exact_bruteforce","queries":$nq,"secs":$exactS%.1f}""")
    for (nprobe <- nprobes) {
      val (a, s1) = t {
        val a = Similarity.ivfTopKIndexed(q, "vec_id", "e", idx, k = k, nprobe = nprobe)
          .select(col("query_id"), col("corpus_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        a.count(); a
      }
      val hit = exact.join(a, Seq("query_id", "corpus_id"), "left_semi").count()
      a.unpersist()
      println(f"""{"step":"probe","nprobe":$nprobe,"secs":$s1%.1f,""" +
        f""""per_query_ms":${s1 * 1000 / nq}%.0f,"recall_at_$k":${hit.toDouble / denom}%.4f}""")
    }

    // --resident: the r16 MINOR compaction, measured as the claim it
    // makes — cost follows the ACCRUED cells' data, not the index. Two
    // contrasting accrual shapes on the same index: (1) UNIFORM — three
    // more keyed append+fold cycles over all cells, so every cell goes
    // over bound and the compaction rewrites the whole resident layer
    // (the worst case, still rebuild-minus-retraining priced); then
    // (2) SKEWED — three append+fold cycles whose vectors are generated
    // NEXT TO a few stored centroids (the hot-cell ingest), so only
    // those cells re-accrue and the second compaction touches only
    // them. maintenanceAdvice is printed at each state — this is the
    // measured row behind its thresholds.
    if (resident) {
      def adviceRow(tag: String): Unit = {
        val a = Similarity.maintenanceAdvice(spark, idx)
        println(s"""{"step":"advice","at":"$tag","action":"${a.action}"}""")
      }
      require(!rebuild, "--resident and --rebuild reuse batch ids and id " +
        "ranges; run them as separate invocations")
      var batchId = 1L // batch 0 folded above
      def cycle(batch: org.apache.spark.sql.DataFrame): Double = {
        Similarity.appendIvfIndexIdempotent(batch, "vec_id", "e", idx, cents, batchId)
        val (_, fS) = t(Similarity.compactIvfIndex(spark, idx, committedBatchId = batchId))
        batchId += 1
        fS
      }
      var lo = n + appendN
      for (c <- 0 until 3) {
        val fS = cycle(gen(lo, lo + appendN))
        println(f"""{"step":"uniform_cycle","cycle":$c,"rows":$appendN,"fold_secs":$fS%.1f}""")
        lo += appendN
      }
      layoutRow("uniform_accrual"); adviceRow("uniform_accrual")
      val residentRows = lo
      val (cellsU, compU) = t(Similarity.compactIvfResident(spark, idx))
      println(f"""{"step":"compact_resident","shape":"uniform","cells":$cellsU,""" +
        f""""resident_rows":$residentRows,"secs":$compU%.1f}""")
      layoutRow("uniform_compacted"); adviceRow("uniform_compacted")

      // skewed phase: vectors beside `hotCells` stored centroids — the
      // append assigns them all to those cells, so fold accrual (and
      // the compaction that follows) is confined there
      val hot = udf { (id: Long) =>
        val c = cents((id % hotCells).toInt)
        val r = new scala.util.Random(id)
        c.map(x => x + 0.01 * r.nextGaussian()).toSeq
      }
      val hotN = appendN / 5
      def genHot(lo: Long, hi: Long) = spark.range(lo, hi, 1, partitions)
        .select(col("id").as("vec_id"), hot(col("id")).as("e"))
      for (c <- 0 until 3) {
        val fS = cycle(genHot(lo, lo + hotN))
        println(f"""{"step":"skewed_cycle","cycle":$c,"rows":$hotN,"fold_secs":$fS%.1f}""")
        lo += hotN
      }
      layoutRow("skewed_accrual"); adviceRow("skewed_accrual")
      val (cellsS, compS) = t(Similarity.compactIvfResident(spark, idx))
      println(f"""{"step":"compact_resident","shape":"skewed","cells":$cellsS,""" +
        f""""resident_rows":$lo,"secs":$compS%.1f}""")
      layoutRow("skewed_compacted"); adviceRow("skewed_compacted")
      // probe sanity on the twice-compacted index (answers are pinned
      // exact by ResidentCompactionSpec + the driver oracle; this is
      // the latency row)
      for (nprobe <- nprobes) {
        val (c1, s1) = t(Similarity.ivfTopKIndexed(
          q, "vec_id", "e", idx, k = k, nprobe = nprobe).count())
        println(f"""{"step":"probe_compacted","nprobe":$nprobe,"rows":$c1,"secs":$s1%.1f,""" +
          f""""per_query_ms":${s1 * 1000 / nq}%.0f}""")
      }
    }

    // --rebuild: the MAJOR compaction, measured as the full closed loop —
    // a genuinely drifted keyed batch (AnnGrowthLab's spectral
    // concentration: distribution-preserving batches must NOT trip, so
    // drift here means changed spectrum, not new ids), the retrain
    // verdict tripping against the build-time reference, the timed
    // build-aside rebuild (one corpus read + write — the irreducible
    // O(index) price, paid at drift cadence while folds stay
    // batch-priced), the verdict clearing against the re-baselined
    // reference, and probe-latency parity on the rebuilt index.
    if (rebuild) {
      val driftLo = n + appendN
      def drifted(lo: Long, hi: Long) = gen(lo, hi).withColumn("e",
        expr("transform(e, (x, i) -> IF(i < 8, x * 6.0D, x * 0.25D))"))
      val (_, dAppendS) = t(Similarity.appendIvfIndexIdempotent(
        drifted(driftLo, driftLo + appendN), "vec_id", "e", idx, cents, 1L))
      println(f"""{"step":"drift_append","rows":$appendN,"secs":$dAppendS%.1f}""")
      val probeBatch = drifted(driftLo + appendN, driftLo + appendN + 4096)
      val (trip, fit0, ref0) = Similarity.shouldRetrain(probeBatch, "vec_id", "e", idx)
      println(s"""{"step":"retrain_verdict","index":"stale","retrain":$trip,"fit":$fit0,"ref":$ref0}""")
      val idx2 = s"$root/idx2"
      val nl2 = if (rebuildNlist > 0) rebuildNlist else nlist
      val (_, rebuildS) = t(Similarity.rebuildIvfIndex(spark, idx, idx2, nlist = nl2))
      println(f"""{"step":"rebuild","rows":${n + 2 * appendN},"nlist":$nl2,"secs":$rebuildS%.1f,"build_secs":$buildS%.1f}""")
      val (trip2, fit2, ref2) = Similarity.shouldRetrain(probeBatch, "vec_id", "e", idx2)
      println(s"""{"step":"retrain_verdict","index":"rebuilt","retrain":$trip2,"fit":$fit2,"ref":$ref2}""")
      layoutRow("rebuilt", idx2)
      for (nprobe <- nprobes) {
        // when the rebuild co-scaled nlist, probe the MATCHED FRACTION
        // (nprobe scales with nlist) — the operator's recall/latency
        // dial is nprobe/nlist, so that is the apples-to-apples probe
        val np2 = math.max(1, nprobe * nl2 / nlist)
        val (c1, s1) = t(Similarity.ivfTopKIndexed(
          q, "vec_id", "e", idx2, k = k, nprobe = np2).count())
        println(f"""{"step":"probe_rebuilt","nprobe":$np2,"fraction":${np2.toDouble / nl2}%.4f,""" +
          f""""rows":$c1,"secs":$s1%.1f,"per_query_ms":${s1 * 1000 / nq}%.0f}""")
      }
    }
    spark.stop()
  }
}
