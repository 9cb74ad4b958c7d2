package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Pq, Similarity}

/** The BATCHED hybrid at rung scale (r18) — closing the 17c gap: that
  * rung measured lexical batch serving only, while the full hybrid
  * stack (`hybrid_search_many`) ran nowhere above sf0.01. Against the
  * 20 M-scale indexes a prior [[HybridScaleLab]] run left on disk,
  * answer a batch of N hybrid queries two ways and require per-query
  * parity:
  *
  *  - SINGLES (the 17b serving shape): per query, one
  *    [[Curation.bm25SearchIndexed]] pass + one single-vector
  *    [[Similarity.ivfTopKIndexed]] probe + [[Curation.rrfFuse]] —
  *    N snapshot-gated listings and N pruned scans per retriever;
  *  - MANY (the batch-serving stack): ONE [[Curation.bm25SearchIndexedMany]]
  *    pass for every lexical list (union term set → one listing, one
  *    pruned scan, shared df), ONE multi-row [[Similarity.ivfTopKIndexed]]
  *    probe (batched by construction — the probed-cell union becomes one
  *    partition filter), and [[Curation.rrfFuseMany]] per-query fusion.
  *
  * `--pq` swaps the semantic arm to the stored IVFPQ index
  * ([[Pq.pqTopKIndexed]], also batched by construction) — the
  * 100 TB-storable hybrid, batch-served.
  *
  * Run (indexes from HybridScaleLab, same dim/noise):
  * {{{
  *   SPARK_DRIVER_MEM=24g sbt "runMain graft.tools.HybridManyLab \
  *     --root /tmp/graft_hybridlab --queries 8 --nprobe 8 [--pq]"
  * }}} */
object HybridManyLab {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    var root = "/tmp/graft_hybridlab"
    var nQueries = 8
    var nprobe = 8
    var k = 20
    var fuseK = 10
    var reps = 2
    var dim = 64
    var noise = 2.0
    var pq = false
    var refine = 32
    var filtered = false
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--root" => root = args(i + 1); i += 2
        case "--queries" => nQueries = args(i + 1).toInt; i += 2
        case "--nprobe" => nprobe = args(i + 1).toInt; i += 2
        case "--k" => k = args(i + 1).toInt; i += 2
        case "--fuseK" => fuseK = args(i + 1).toInt; i += 2
        case "--reps" => reps = args(i + 1).toInt; i += 2
        case "--dim" => dim = args(i + 1).toInt; i += 2
        case "--noise" => noise = args(i + 1).toDouble; i += 2
        case "--pq" => pq = true; i += 1
        case "--refine" => refine = args(i + 1).toInt; i += 2
        case "--filtered" => filtered = true; i += 1
        case other => sys.error(s"unknown arg $other")
      }
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val lexIdx = if (filtered) s"$root/lexidx_meta" else s"$root/lexidx"
    val semIdx = if (pq) s"$root/pqidx" else s"$root/idx"
    // the HybridScaleLab mid-frequency band + query-vector convention
    // (vec ids 1000*qi+7), so numbers line up with the 17b per-query rows
    def termsFor(qi: Int): Seq[String] = {
      val r = new scala.util.Random(9000 + qi)
      val out = scala.collection.mutable.LinkedHashSet.empty[String]
      while (out.size < 3) out += "w" + (200 + r.nextInt(1000))
      out.toSeq
    }
    val gen = udf((id: Long) => EmbedSynth.vector(id, dim, 32, noise))
    def qVec(qi: Int) = spark.range(1000L * qi + 7, 1000L * qi + 8)
      .select(col("id").as("vec_id"), gen(col("id")).as("e"))
    // the batched probe keys queries by their VEC id (1000*qi+7), same
    // as the single arm — the probe's query_id =!= corpus_id
    // self-exclusion must drop the SAME corpus row in both arms (keying
    // by qi would exclude corpus ids 0..N-1 and admit the query vector
    // itself at cosine 1.0, breaking parity — r18 review); vec id maps
    // back to qi only at the fusion boundary
    val qVecs = spark.range(0, nQueries)
      .select((col("id") * 1000L + 7L).as("qvid"))
      .select(col("qvid"), gen(col("qvid")).as("e"))
    val termBatch = (0 until nQueries).map(qi => (qi.toLong, termsFor(qi)))
    val cents =
      if (pq) null else Similarity.loadIvfCentroids(spark, s"$root/idx")
    println(s"""{"root":"$root","queries":$nQueries,"nprobe":$nprobe,"k":$k,"pq":$pq,"filtered":$filtered,"reps":$reps}""")

    // --filtered (r19): both retrievers answer under the same access
    // scope — the semantic index's stored `category` predicate (pushed
    // into the pruned scan) and the lexical index's stored-metadata
    // `filter` (candidates restricted, stats corpus-global). The lab
    // PROVISIONS what the stored indexes lack, measuring both upgrade
    // paths at the 20 M rung: backfillMetaCols on the semantic index
    // (the one-join alternative to a rebuild) and a metaCols'd lexical
    // build beside the plain one.
    val semFilter = if (filtered) Some(col("category") === 1) else None
    if (filtered) {
      val semTbl = if (pq) "codes" else "corpus"
      // key on the CONTRACT file, not a table schema peek: the PQ
      // backfill is resumable per table, so a crash between its two
      // tables leaves codes carrying the column with no contract —
      // rerunning backfillMetaCols completes exactly the missing table
      if (!new java.io.File(s"$semIdx/_meta_cols").exists()) {
        // meta from the table's OWN ids (category is id-derived), so
        // coverage holds whatever prior lab runs deleted or purged
        val meta = spark.read.parquet(s"$semIdx/$semTbl")
          .select(col("corpus_id").as("vec_id")).distinct()
          .select(col("vec_id"),
            pmod(col("vec_id"), lit(4)).cast("int").as("category"))
        val (_, bfS) = t(
          if (pq) Pq.backfillMetaCols(spark, semIdx, meta, idCol = "vec_id",
            metaCols = Seq("category"))
          else Similarity.backfillMetaCols(spark, semIdx, meta, idCol = "vec_id",
            metaCols = Seq("category")))
        println(f"""{"step":"backfill_sem_meta","pq":$pq,"secs":$bfS%.1f}""")
      }
      if (!new java.io.File(s"$lexIdx/stats").exists()) {
        val docsMeta = spark.read.parquet(s"$root/docs")
          .withColumn("category", pmod(col("doc_id"), lit(4)).cast("int"))
        val (_, lexS) = t(Curation.writeBm25Index(docsMeta, "doc_id", "text",
          lexIdx, buckets = 256, metaCols = Seq("category")))
        println(f"""{"step":"bm25_meta_build","secs":$lexS%.1f}""")
      }
    }

    // SINGLES: the 17b per-query stack, N times
    def singles(): Map[Long, Seq[Long]] =
      termBatch.map { case (qi, terms) =>
        val lex = Curation.bm25SearchIndexed(spark, lexIdx, terms, topK = k,
            filter = semFilter)
          .select(col("id"),
            row_number().over(org.apache.spark.sql.expressions.Window
              .orderBy(col("score").desc, col("id"))).as("rank"))
          .collect()
        val sem = (if (pq)
            Pq.pqTopKIndexed(qVec(qi.toInt), "vec_id", "e", semIdx,
              k = k, nprobe = nprobe, refine = refine, filter = semFilter)
          else Similarity.ivfTopKIndexed(qVec(qi.toInt), "vec_id", "e", semIdx,
              k = k, nprobe = nprobe, cents = cents, filter = semFilter,
              minCandidates = 0))
          .select(col("corpus_id").as("id"), col("rank")).collect()
        val fused = Curation.rrfFuse(Seq(
          lex.map(r => (r.getLong(0), r.getInt(1))).toSeq.toDF("id", "rank"),
          sem.map(r => (r.getLong(0), r.getInt(1))).toSeq.toDF("id", "rank")),
          topK = fuseK).collect().map(_.getLong(0)).toSeq
        qi -> fused
      }.toMap

    // MANY: one pass per retriever for the WHOLE batch, per-query fusion
    def many(): Map[Long, Seq[Long]] = {
      val lex = Curation.bm25SearchIndexedMany(spark, lexIdx,
        termBatch.toDF("query_id", "terms"), topK = k, filter = semFilter)
        .select("query_id", "id", "rank")
      val sem = (if (pq)
          Pq.pqTopKIndexed(qVecs, "qvid", "e", semIdx,
            k = k, nprobe = nprobe, refine = refine, filter = semFilter)
        else Similarity.ivfTopKIndexed(qVecs, "qvid", "e", semIdx,
            k = k, nprobe = nprobe, cents = cents, filter = semFilter,
            minCandidates = 0))
        // vec id -> qi at the fusion boundary (qvid = 1000*qi + 7)
        .select(((col("query_id") - 7L) / 1000L).cast("long").as("query_id"),
          col("corpus_id").as("id"), col("rank"))
      Curation.rrfFuseMany(Seq(lex, sem), topK = fuseK)
        .select("query_id", "id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (qi, rows) => qi -> rows.map(_._2).toSeq }
    }

    // alternating min-of-N reps (cold file cache absorbed by rep 1)
    var singleSecs = Double.MaxValue
    var manySecs = Double.MaxValue
    var sA: Map[Long, Seq[Long]] = null
    var mA: Map[Long, Seq[Long]] = null
    for (rep <- 1 to reps) {
      val (a1, s1) = t(singles()); singleSecs = math.min(singleSecs, s1); sA = a1
      val (a2, s2) = t(many()); manySecs = math.min(manySecs, s2); mA = a2
      println(f"""{"rep":$rep,"singles_secs":$s1%.2f,"many_secs":$s2%.2f}""")
    }
    // per-query parity is REQUIRED: the batch stack must be a pure
    // amortization, never a different answer
    termBatch.foreach { case (qi, _) =>
      require(sA(qi) == mA.getOrElse(qi, Nil),
        s"fused lists diverged for query $qi: ${sA(qi)} vs ${mA.getOrElse(qi, Nil)}")
    }
    println(f"""{"step":"amortization","filtered":$filtered,"queries":$nQueries,""" +
      f""""singles_total_secs":$singleSecs%.2f,"singles_per_query":${singleSecs / nQueries}%.2f,""" +
      f""""many_total_secs":$manySecs%.2f,"many_per_query":${manySecs / nQueries}%.2f,""" +
      f""""speedup":${singleSecs / manySecs}%.1f}""")
    spark.stop()
  }
}
