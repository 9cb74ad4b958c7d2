package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Similarity}

/** The one serving composition the r18/r19 verdicts asked to price at
  * the 20 M rung and SCALE.md 19 covered only at single-probe
  * granularity: the BATCHED FILTERED hybrid (19b's many-stack — one
  * bm25SearchIndexedMany pass + one multi-row ivfTopKIndexed probe +
  * rrfFuseMany, both retrievers scoped by the stored `category`
  * metadata) with a LIVE ~210 K-id tombstone ledger, before and after
  * the purge.
  *
  * Preconditions: a prior `HybridScaleLab` build plus `HybridManyLab
  * --filtered` provisioning on `--root` (lexidx_meta with metaCols,
  * `idx` with backfilled category).
  *
  * Protocol: measure the batched filtered probe (min-of-reps) three
  * ways — (1) clean index, (2) after deleting 1/`frac` of the corpus
  * PLUS each query's fused top-1 id (so the ledger provably changes
  * answers, not just costs), (3) after purging both ledgers. Asserts:
  * with-ledger lists contain no deleted id and differ from the clean
  * lists; post-purge lists equal the with-ledger lists exactly (a purge
  * reclaims storage, never changes answers). Ranking quality is
  * untouched by construction — the ledger is an exact anti-join inside
  * both retrievers, so surviving candidates keep their exact scores and
  * freed top-k slots refill with the next exactly-scored candidates
  * (the 19d recall contract covers the filtered probe itself).
  *
  * Run: {{{
  *   SPARK_DRIVER_MEM=24g sbt "runMain graft.tools.HybridLedgerLab \
  *     --root /tmp/graft_hybridlab --queries 8 --nprobe 8 --frac 101"
  * }}} */
object HybridLedgerLab {
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
    var frac = 101L
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
        case "--frac" => frac = args(i + 1).toLong; i += 2
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
    val lexIdx = s"$root/lexidx_meta"
    val semIdx = s"$root/idx"
    require(new java.io.File(s"$lexIdx/stats").exists(),
      s"$lexIdx missing — run HybridManyLab --filtered provisioning first")
    require(new java.io.File(s"$semIdx/_meta_cols").exists(),
      s"$semIdx lacks backfilled metaCols — run HybridManyLab --filtered first")

    // HybridScaleLab/HybridManyLab conventions: mid-frequency terms,
    // query vec ids 1000*qi+7, category = pmod(id, 4), filter category=1
    def termsFor(qi: Int): Seq[String] = {
      val r = new scala.util.Random(9000 + qi)
      val out = scala.collection.mutable.LinkedHashSet.empty[String]
      while (out.size < 3) out += "w" + (200 + r.nextInt(1000))
      out.toSeq
    }
    val gen = udf((id: Long) => EmbedSynth.vector(id, dim, 32, noise))
    val qVecs = spark.range(0, nQueries)
      .select((col("id") * 1000L + 7L).as("qvid"))
      .select(col("qvid"), gen(col("qvid")).as("e"))
    val termBatch = (0 until nQueries).map(qi => (qi.toLong, termsFor(qi)))
    val cents = Similarity.loadIvfCentroids(spark, semIdx)
    val semFilter = Some(col("category") === 1)

    def many(): Map[Long, Seq[Long]] = {
      val lex = Curation.bm25SearchIndexedMany(spark, lexIdx,
        termBatch.toDF("query_id", "terms"), topK = k, filter = semFilter)
        .select("query_id", "id", "rank")
      val sem = Similarity.ivfTopKIndexed(qVecs, "qvid", "e", semIdx,
          k = k, nprobe = nprobe, cents = cents, filter = semFilter,
          minCandidates = 0)
        .select(((col("query_id") - 7L) / 1000L).cast("long").as("query_id"),
          col("corpus_id").as("id"), col("rank"))
      Curation.rrfFuseMany(Seq(lex, sem), topK = fuseK)
        .select("query_id", "id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (qi, rows) => qi -> rows.map(_._2).toSeq }
    }
    def probePhase(phase: String): (Map[Long, Seq[Long]], Double) = {
      var best = Double.MaxValue
      var ans: Map[Long, Seq[Long]] = null
      for (rep <- 1 to reps) {
        val (a, s) = t(many())
        println(f"""{"phase":"$phase","rep":$rep,"many_secs":$s%.2f}""")
        if (s < best) best = s
        ans = a
      }
      (ans, best)
    }

    val n = spark.read.parquet(s"$lexIdx/stats").collect()(0).getLong(0)
    println(s"""{"root":"$root","n_docs":$n,"queries":$nQueries,"frac":$frac,"nprobe":$nprobe}""")

    val (clean, cleanS) = probePhase("clean")
    // every query must have answers BEFORE the deletion phases, or the
    // later top-1/Map lookups would die as bare NoSuchElementExceptions
    // instead of something attributable
    termBatch.foreach { case (qi, _) =>
      require(clean.get(qi).exists(_.nonEmpty),
        s"query $qi: empty fused list on the CLEAN index — check the " +
          "filtered provisioning (category coverage) before reading any " +
          "ledger numbers from this run")
    }
    // delete 1/frac of the corpus PLUS each query's fused top-1, so the
    // ledger demonstrably changes answers
    val top1 = clean.toSeq.sortBy(_._1).map(_._2.head)
    val delIds = spark.range(0, n).filter(pmod(col("id"), lit(frac)) === 0)
      .toDF("id").union(top1.toDF("id")).distinct()
    val nDel = delIds.count()
    val (_, lexDelS) = t(Curation.deleteFromBm25Index(delIds.toDF("id"), lexIdx))
    val (_, semDelS) = t(Similarity.deleteFromIvfIndex(delIds.toDF("id"), semIdx))
    println(f"""{"step":"delete","ids":$nDel,"lex_secs":$lexDelS%.1f,"sem_secs":$semDelS%.1f}""")

    val (ledger, ledgerS) = probePhase("with_ledger")
    val delSet = delIds.collect().map(_.getLong(0)).toSet
    termBatch.foreach { case (qi, _) =>
      val l = ledger.getOrElse(qi, Nil) // empty = legal (top of list tombstoned)
      require(l.forall(id => !delSet.contains(id)),
        s"query $qi: a deleted id survives in the fused list")
      require(l != clean(qi),
        s"query $qi: fused list unchanged although its top-1 was deleted")
    }

    val (nbuk, lexPurgeS) = t(Curation.purgeBm25Deletes(spark, lexIdx))
    val (ncell, semPurgeS) = t(Similarity.purgeIvfDeletes(spark, semIdx))
    println(f"""{"step":"purge","lex_buckets":$nbuk,"lex_secs":$lexPurgeS%.1f,""" +
      f""""sem_cells":$ncell,"sem_secs":$semPurgeS%.1f}""")

    val (purged, purgedS) = probePhase("post_purge")
    termBatch.foreach { case (qi, _) =>
      require(purged.getOrElse(qi, Nil) == ledger.getOrElse(qi, Nil),
        s"query $qi: purge changed the fused answer")
    }

    println(f"""{"step":"summary","queries":$nQueries,"deleted":$nDel,""" +
      f""""clean_batch_secs":$cleanS%.2f,"with_ledger_batch_secs":$ledgerS%.2f,""" +
      f""""post_purge_batch_secs":$purgedS%.2f,""" +
      f""""ledger_tax_secs":${ledgerS - cleanS}%.2f,""" +
      f""""per_query_clean":${cleanS / nQueries}%.3f,""" +
      f""""per_query_with_ledger":${ledgerS / nQueries}%.3f,""" +
      f""""per_query_post_purge":${purgedS / nQueries}%.3f}""")
    spark.stop()
  }
}
