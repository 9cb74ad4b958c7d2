package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Pq, Similarity}

/** Hybrid retrieval at the 20 M rung (r16) — the production claim
  * behind `hybrid_search_indexed`, measured: BM25's broadcast term join
  * over an in-plan 20 M-document corpus plus the stored IVF index's
  * PRUNED probe (nprobe << nlist), RRF-fused — end-to-end latency per
  * hybrid query, plan assertions (the term join broadcasts; the index
  * scan carries the probed-cell partition filters), and recall@10 of
  * the pruned fusion against the brute-force fusion twin (identical
  * BM25 list + exact cosine top-k through the same rrfFuse — the only
  * difference is the semantic retriever, so fused-recall isolates what
  * index pruning costs the FUSED answer).
  *
  * Text is generated in-plan and deterministically from doc_id (a
  * zipf-ish 10 K vocab), like EmbedSynth's vectors — nothing but the
  * index is materialized.
  *
  * Run: {{{
  *   SPARK_DRIVER_MEM=24g sbt "runMain graft.tools.HybridScaleLab \
  *     --n 20000000 --nlist 256 --nprobe 8 --queries 5"
  * }}} */
object HybridScaleLab {

  /** Deterministic zipf-ish token bag for one doc id: `len` draws from
    * a 10 K vocab where word w's mass ~ 1/(w+1) (nested uniform draw). */
  private[tools] def docText(id: Long, len: Int): String = {
    val r = new scala.util.Random(id * 1000003L + 17)
    val sb = new StringBuilder
    var j = 0
    while (j < len) {
      val w = r.nextInt(r.nextInt(9999) + 1)
      if (j > 0) sb.append(' ')
      sb.append('w').append(w)
      j += 1
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    var n = 20000000L
    var dim = 64
    var nlist = 256
    var nprobe = 8
    var k = 20 // per-retriever list depth
    var fuseK = 10
    var nQueries = 5
    var partitions = 64
    var noise = 2.0
    var root = "/tmp/graft_hybridlab"
    var reuseIndex = false
    // --pq adds the 100 TB-STORABLE semantic arm (r17): the same hybrid
    // with the IVFPQ index's ADC probe (codes 64-128x smaller than the
    // vectors) as the semantic retriever, fused with the SAME stored
    // BM25 list — fused recall isolates what PQ quantization + pruning
    // cost the fused answer vs the exact-cosine fusion twin.
    var pq = false
    var m = 8
    var ksub = 256
    var refine = 8
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--n" => n = args(i + 1).toLong; i += 2
        case "--dim" => dim = args(i + 1).toInt; i += 2
        case "--nlist" => nlist = args(i + 1).toInt; i += 2
        case "--nprobe" => nprobe = args(i + 1).toInt; i += 2
        case "--k" => k = args(i + 1).toInt; i += 2
        case "--fuseK" => fuseK = args(i + 1).toInt; i += 2
        case "--queries" => nQueries = args(i + 1).toInt; i += 2
        case "--partitions" => partitions = args(i + 1).toInt; i += 2
        case "--noise" => noise = args(i + 1).toDouble; i += 2
        case "--root" => root = args(i + 1); i += 2
        case "--reuseIndex" => reuseIndex = true; i += 1
        case "--pq" => pq = true; i += 1
        case "--m" => m = args(i + 1).toInt; i += 2
        case "--ksub" => ksub = args(i + 1).toInt; i += 2
        case "--refine" => refine = args(i + 1).toInt; i += 2
        case other => sys.error(s"unknown arg $other")
      }
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", partitions.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // the zipf text compresses ~15x, so at the default 128 MB
      // maxPartitionBytes the 1.6 GB docs table coalesces to ~13 input
      // splits and BM25's corpus pass runs at 13-way parallelism on a
      // 32-core box (measured 96-162 s/q vs ~40 off 64 splits). Size
      // splits for the DECOMPRESSED work, as a tuned cluster would.
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    def vecs(lo: Long, hi: Long) = {
      val g = udf((id: Long) => EmbedSynth.vector(id, dim, 32, noise))
      spark.range(lo, hi, 1, partitions)
        .select(col("id").as("vec_id"), g(col("id")).as("e"))
    }
    val textUdf = udf((id: Long) => docText(id, 20))

    val idx = s"$root/idx"
    val docsPath = s"$root/docs"
    println(s"""{"corpus":"inplan:$n:dim$dim","nlist":$nlist,"nprobe":$nprobe,"k":$k}""")
    if (!reuseIndex) {
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val (_, buildS) = t(Similarity.writeIvfIndex(vecs(0, n), "vec_id", "e", idx, nlist = nlist))
      println(f"""{"step":"build","rows":$n,"secs":$buildS%.1f}""")
      // the text corpus is MATERIALIZED once, like any stored corpus a
      // production BM25 scans — leaving it in-plan folds 400 M token
      // regenerations into every BM25 wall (measured 43-68 s/q of pure
      // UDF time vs ~8 s/q off parquet)
      val (_, docsS) = t(spark.range(0, n, 1, partitions)
        .select(col("id").as("doc_id"), textUdf(col("id")).as("text"))
        .write.mode("overwrite").parquet(docsPath))
      println(f"""{"step":"docs_write","rows":$n,"secs":$docsS%.1f}""")
      // ... and the lexical INDEX (r16): one tokenize+tf pass at build
      // time buys every query out of its two corpus passes
      val (_, lexS) = t(Curation.writeBm25Index(
        spark.read.parquet(docsPath), "doc_id", "text", s"$root/lexidx", buckets = 256))
      println(f"""{"step":"bm25_index_build","rows":$n,"secs":$lexS%.1f}""")
      // the lexical maintenance loop at scale: one keyed idempotent
      // append (a 5% growth batch) + the incremental fold of its leaves
      val growN = n / 20
      val growDocs = spark.range(n, n + growN, 1, partitions)
        .select(col("id").as("doc_id"), textUdf(col("id")).as("text"))
      val (_, apS) = t(Curation.appendBm25IndexIdempotent(
        growDocs, "doc_id", "text", s"$root/lexidx", 0L))
      val (_, foldS) = t(Curation.compactBm25Index(spark, s"$root/lexidx", 0L))
      val l = Curation.bm25IndexLayout(spark, s"$root/lexidx")
      println(f"""{"step":"bm25_append_fold","rows":$growN,"append_secs":$apS%.1f,""" +
        f""""fold_secs":$foldS%.1f,"buckets":${l.cells},"max_files_per_bucket":${l.maxResidentFilesPerCell}}""")
      growDocs.write.mode("append").parquet(docsPath) // keep scan-path parity
    }
    val pqIdx = s"$root/pqidx"
    if (pq && (!reuseIndex || !new java.io.File(s"$pqIdx/model").exists())) {
      val (_, pqS) = t(Pq.writePqIndex(vecs(0, n), "vec_id", "e", pqIdx,
        nlist = nlist, m = m, ksub = ksub))
      println(f"""{"step":"pq_index_build","rows":$n,"m":$m,"ksub":$ksub,"secs":$pqS%.1f}""")
    }
    def docs = spark.read.parquet(docsPath)
    val lexIdx = s"$root/lexidx"
    val cents = Similarity.loadIvfCentroids(spark, idx)

    // mid-frequency query terms: w200..w1199 band — selective enough to
    // rank, frequent enough that top-20 lists are full. DISTINCT terms
    // only: bm25Search treats its input as a term set (a duplicated
    // term would double tf on the scan side while the indexed side
    // collapses it — the parity require below would trip on the
    // retriever contract, not a real divergence)
    def termsFor(qi: Int): Seq[String] = {
      val r = new scala.util.Random(9000 + qi)
      val out = scala.collection.mutable.LinkedHashSet.empty[String]
      while (out.size < 3) out += "w" + (200 + r.nextInt(1000))
      out.toSeq
    }
    def asRanking(list: DataFrame, idCol: String): DataFrame =
      list.select(col(idCol).as("id"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col(idCol))).as("rank"))

    // plan assertions once, outside the timed loop: the BM25 term join
    // broadcasts; the pruned probe's corpus scan carries PartitionFilters
    val bmPlan = Curation.bm25Search(docs, "doc_id", "text", termsFor(0), topK = k)
      .queryExecution.executedPlan.toString
    println(s"""{"step":"plan","bm25_broadcast":${bmPlan.contains("BroadcastHashJoin")}}""")
    val probePlan = Similarity.ivfTopKIndexed(vecs(0, 1), "vec_id", "e", idx,
      k = k, nprobe = nprobe, cents = cents, filter = None, minCandidates = 0)
      .queryExecution.executedPlan.toString
    println(s"""{"step":"plan","probe_partition_pruned":${probePlan.contains("PartitionFilters: [cell")}}""")

    var fusedHit = 0L; var fusedDenom = 0L
    var pqHit = 0L; var pqDenom = 0L
    for (qi <- 0 until nQueries) {
      val terms = termsFor(qi)
      val qVec = vecs(1000L * qi + 7, 1000L * qi + 8)
      // the scan path, OUTSIDE the timed hybrid: the indexed-vs-scan
      // contrast row, and the parity check (stored postings must rank
      // identically to the two-pass corpus scan)
      val (bmScan, bmScanS) = t(asRanking(
        Curation.bm25Search(docs, "doc_id", "text", terms, topK = k), "id")
        .collect())
      // end-to-end hybrid off the TWO stored indexes: lexical postings
      // (bucket-pruned) + semantic IVF (cell-pruned), RRF-fused
      val ((bm, ann, fused), totalS) = t {
        val (bm, bmS) = t(asRanking(
          Curation.bm25SearchIndexed(spark, lexIdx, terms, topK = k), "id")
          .collect())
        val (ann, annS) = t(Similarity.ivfTopKIndexed(
          qVec, "vec_id", "e", idx, k = k, nprobe = nprobe, cents = cents, filter = None, minCandidates = 0)
          .select(col("corpus_id").as("id"), col("rank")).collect())
        println(f"""{"step":"retrievers","query":$qi,"bm25_indexed_secs":$bmS%.1f,""" +
          f""""bm25_scan_secs":$bmScanS%.1f,"probe_secs":$annS%.1f}""")
        import spark.implicits._
        val fused = Curation.rrfFuse(Seq(
          bm.map(r => (r.getLong(0), r.getInt(1))).toSeq.toDF("id", "rank"),
          ann.map(r => (r.getLong(0), r.getInt(1))).toSeq.toDF("id", "rank")), topK = fuseK)
          .collect().map(_.getLong(0)).toSeq
        (bm, ann, fused)
      }
      require(bm.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
        bmScan.map(r => (r.getLong(0), r.getInt(1))).toSeq,
        s"indexed/scan BM25 lists diverged for $terms")
      println(f"""{"step":"hybrid","query":$qi,"secs":$totalS%.1f,"fused":${fused.size}}""")
      // brute-force fusion twin: same BM25 list, exact cosine top-k
      val exact = Similarity.bruteForceTopK(qVec, "vec_id", "e",
        vecs(0, n), "vec_id", "e", k = k)
        .select(col("corpus_id").as("id"), col("rank")).collect()
      import spark.implicits._
      val fusedExact = Curation.rrfFuse(Seq(
        bm.map(r => (r.getLong(0), r.getInt(1))).toSeq.toDF("id", "rank"),
        exact.map(r => (r.getLong(0), r.getInt(1))).toSeq.toDF("id", "rank")), topK = fuseK)
        .collect().map(_.getLong(0)).toSeq
      val hit = fused.toSet.intersect(fusedExact.toSet).size
      fusedHit += hit; fusedDenom += fusedExact.size
      println(f"""{"step":"fused_recall","query":$qi,"hit":$hit,"of":${fusedExact.size}}""")
      // the PQ arm: same stored BM25 list fused with the ADC probe off
      // the IVFPQ index — the 100 TB-storable hybrid, priced and scored
      if (pq) {
        val (annPq, pqS) = t(Pq.pqTopKIndexed(
          qVec, "vec_id", "e", pqIdx, k = k, nprobe = nprobe, refine = refine)
          .select(col("corpus_id").as("id"), col("rank")).collect())
        import spark.implicits._
        val fusedPq = Curation.rrfFuse(Seq(
          bm.map(r => (r.getLong(0), r.getInt(1))).toSeq.toDF("id", "rank"),
          annPq.map(r => (r.getLong(0), r.getInt(1))).toSeq.toDF("id", "rank")), topK = fuseK)
          .collect().map(_.getLong(0)).toSeq
        val hitPq = fusedPq.toSet.intersect(fusedExact.toSet).size
        pqHit += hitPq; pqDenom += fusedExact.size
        println(f"""{"step":"pq_hybrid","query":$qi,"probe_secs":$pqS%.1f,"hit":$hitPq,"of":${fusedExact.size}}""")
      }
    }
    println(f"""{"step":"fused_recall_total","recall_at_$fuseK":${fusedHit.toDouble / fusedDenom}%.4f,"queries":$nQueries}""")
    if (pq && pqDenom > 0)
      println(f"""{"step":"pq_fused_recall_total","recall_at_$fuseK":${pqHit.toDouble / pqDenom}%.4f,"queries":$nQueries}""")
    spark.stop()
  }
}
