package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Similarity}

/** Deletion at rung scale (r17): against the stored 20 M-doc BM25
  * postings index and 20 M-vector IVF index a prior HybridScaleLab run
  * left on disk, measure the three deletion costs the design promises:
  *
  *  - the DELETE itself (tombstone append): batch-priced for BM25 (one
  *    dl lookup over the postings), a tiny write for ANN;
  *  - the PROBE with a live ledger: the broadcast anti-join's overhead
  *    on top of the pruned scan (deleted docs must vanish — parity vs
  *    the same query before deletion is asserted NOT equal, and the
  *    surviving ids must contain no deleted id);
  *  - the PURGE (marker-staged resident rewrite): one corpus-pass-sized
  *    reclaim, after which the probe sheds the anti-join's input rows.
  *
  * Run: {{{
  *   SPARK_DRIVER_MEM=24g sbt "runMain graft.tools.DeleteScaleLab \
  *     --root /tmp/graft_hybridlab --frac 100"
  * }}} (`--frac N` deletes ids ≡ 0 (mod N) — 1/N of the corpus). */
object DeleteScaleLab {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    var root = "/tmp/graft_hybridlab"
    var frac = 100L
    var k = 20
    var instream = false
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--root" => root = args(i + 1); i += 2
        case "--frac" => frac = args(i + 1).toLong; i += 2
        case "--k" => k = args(i + 1).toInt; i += 2
        case "--instream" => instream = true; i += 1
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
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val lexIdx = s"$root/lexidx"
    val ivfIdx = s"$root/idx"
    def termsFor(qi: Int): Seq[String] = {
      val r = new scala.util.Random(9000 + qi)
      val out = scala.collection.mutable.LinkedHashSet.empty[String]
      while (out.size < 3) out += "w" + (200 + r.nextInt(1000))
      out.toSeq
    }

    // ---- BM25 ----
    val n = spark.read.parquet(s"$lexIdx/stats").collect()(0).getLong(0)
    val delIds = spark.range(0, n).filter(pmod(col("id"), lit(frac)) === 0)
    println(s"""{"lex_index":"$lexIdx","n_docs":$n,"deleting":"1/$frac"}""")
    def bmProbe() = Curation.bm25SearchIndexed(spark, lexIdx, termsFor(0), topK = k)
      .collect().map(_.getLong(0)).toSeq
    val (before, bPre) = t(bmProbe()); val (_, bPre2) = t(bmProbe())
    val (_, delS) = t(Curation.deleteFromBm25Index(delIds.toDF("id"), lexIdx))
    val (after1, bPost) = t(bmProbe()); val (after2, bPost2) = t(bmProbe())
    require(after1 == after2 && after1.forall(_ % frac != 0),
      "deleted ids must vanish from the BM25 top-k")
    println(f"""{"step":"bm25_delete","ledger_append_secs":$delS%.1f,""" +
      f""""probe_before_secs":${math.min(bPre, bPre2)}%.2f,"probe_with_ledger_secs":${math.min(bPost, bPost2)}%.2f,""" +
      s""""topk_changed":${before != after1}}""")
    val (nb, purgeS) = t(Curation.purgeBm25Deletes(spark, lexIdx))
    val (after3, bPost3) = t(bmProbe()); val (_, bPost4) = t(bmProbe())
    require(after3 == after1, "purge must change nothing about answers")
    println(f"""{"step":"bm25_purge","buckets_rewritten":$nb,"purge_secs":$purgeS%.1f,""" +
      f""""probe_after_purge_secs":${math.min(bPost3, bPost4)}%.2f}""")

    // ---- IVF ----
    val nv = spark.read.parquet(s"$ivfIdx/corpus").count()
    println(s"""{"ivf_index":"$ivfIdx","n_vectors":$nv,"deleting":"1/$frac"}""")
    val gen = udf((id: Long) => EmbedSynth.vector(id, 64, 32, 2.0))
    val q = spark.range(7, 8).select(col("id").as("vec_id"), gen(col("id")).as("e"))
    def annProbe() = Similarity.ivfTopKIndexed(q, "vec_id", "e", ivfIdx, k = k, nprobe = 8)
      .collect().map(_.getLong(1)).toSeq
    val (abefore, aPre) = t(annProbe()); val (_, aPre2) = t(annProbe())
    val (_, adelS) = t(Similarity.deleteFromIvfIndex(
      spark.range(0, nv).filter(pmod(col("id"), lit(frac)) === 0).toDF("id"), ivfIdx))
    val (aafter, aPost) = t(annProbe()); val (_, aPost2) = t(annProbe())
    require(aafter.forall(_ % frac != 0), "deleted ids must vanish from the ANN top-k")
    println(f"""{"step":"ivf_delete","ledger_append_secs":$adelS%.1f,""" +
      f""""probe_before_secs":${math.min(aPre, aPre2)}%.2f,"probe_with_ledger_secs":${math.min(aPost, aPost2)}%.2f,""" +
      s""""topk_changed":${abefore != aafter}}""")
    val (nc, apurgeS) = t(Similarity.purgeIvfDeletes(spark, ivfIdx))
    val (aafter2, aPost3) = t(annProbe()); val (_, aPost4) = t(annProbe())
    require(aafter2 == aafter, "purge must change nothing about answers")
    println(f"""{"step":"ivf_purge","cells_rewritten":$nc,"purge_secs":$apurgeS%.1f,""" +
      f""""probe_after_purge_secs":${math.min(aPost3, aPost4)}%.2f}""")

    // ---- deletes landing WHILE the ingest loop runs (r18) ----
    // The streamed-deletes composition at rung scale: a live
    // StreamingLex/StreamingAnn ingest with `purgeWhenAdvised` — a
    // delete lands between triggers (targeting resident docs AND docs
    // from a committed-but-unfolded batch), the next probe excludes the
    // ids immediately, and the next maintenance point folds past the
    // unfolded tombstones, re-advises purge-deletes, and physically
    // purges on the ingest thread. Runs AFTER the batch arms, so the
    // indexes already carry one purge's layout — realistic churn.
    if (instream) {
      val g = n / 100 // ~1% of the corpus per trigger
      val textUdf = udf((id: Long) => HybridScaleLab.docText(id, 20))
      def growDocs(b: Long) =
        spark.range(10 * n + b * g, 10 * n + (b + 1) * g, 1, 64)
          .select(col("id").as("doc_id"), textUdf(col("id")).as("text"))
      val fn = graft.streaming.StreamingLex.appendBatches(
        lexIdx, "doc_id", "text", compactEvery = 2,
        onAdvice = (a, b) => println(
          s"""{"step":"instream_advice","family":"bm25","batch":$b,"action":"${a.action}"}"""),
        purgeWhenAdvised = true, maxTombstones = 1000)()
      val (_, i1s) = t(fn(growDocs(1), 1L))
      // mid-stream delete: resident ids + 2000 ids from the committed
      // (not yet folded) batch 1
      val delStream = spark.range(0, n)
        .filter(pmod(col("id"), lit(frac * 100)) === 3)
        .union(spark.range(10 * n + g, 10 * n + g + 2000))
      val (_, dStreamS) = t(Curation.deleteFromBm25Index(delStream.toDF("id"), lexIdx))
      val (inAfter, inProbeS) = t(bmProbe())
      require(inAfter.forall(id => !(id % (frac * 100) == 3 && id < n)),
        "mid-stream deletes must vanish from probes immediately")
      // next trigger reaches the maintenance point: fold + in-stream purge
      val (_, i2s) = t(fn(growDocs(2), 2L))
      val ledgerGone = !new java.io.File(s"$lexIdx/deletes").exists() ||
        new java.io.File(s"$lexIdx/deletes").listFiles()
          .forall(f => !f.getName.endsWith(".parquet"))
      // the corpus legitimately grew between probes (trigger 2 appended
      // new docs), so the invariant here is EXCLUSION, not equality —
      // answer-identity under purge is asserted by the batch arms above
      val (inAfter2, inProbeS2) = t(bmProbe())
      require(inAfter2.forall(id => !(id % (frac * 100) == 3 && id < n)),
        "purged ids must stay gone after the in-stream purge")
      println(f"""{"step":"bm25_instream","trigger_secs":$i1s%.1f,""" +
        f""""delete_secs":$dStreamS%.1f,"probe_with_ledger_secs":$inProbeS%.2f,""" +
        f""""trigger_with_purge_secs":$i2s%.1f,"ledger_retired":$ledgerGone,""" +
        f""""probe_after_secs":$inProbeS2%.2f}""")

      // the ANN twin: same composition over the IVF ingest loop
      val vgen = udf((id: Long) => EmbedSynth.vector(id, 64, 32, 2.0))
      def growVecs(b: Long) =
        spark.range(10 * nv + b * g, 10 * nv + (b + 1) * g, 1, 64)
          .select(col("id").as("vec_id"), vgen(col("id")).as("e"))
      val afn = graft.streaming.StreamingAnn.appendBatches(
        ivfIdx, "vec_id", "e", compactEvery = 2,
        onAdvice = (a, b) => println(
          s"""{"step":"instream_advice","family":"ivf","batch":$b,"action":"${a.action}"}"""),
        purgeWhenAdvised = true, maxTombstones = 1000)((_, _) => ())
      val (_, a1s) = t(afn(growVecs(1), 1L))
      val adelStream = spark.range(0, nv)
        .filter(pmod(col("id"), lit(frac * 100)) === 3)
        .union(spark.range(10 * nv + g, 10 * nv + g + 2000))
      val (_, adStreamS) = t(Similarity.deleteFromIvfIndex(adelStream.toDF("id"), ivfIdx))
      val (ainAfter, ainProbeS) = t(annProbe())
      require(ainAfter.forall(id => !(id % (frac * 100) == 3 && id < nv)),
        "mid-stream ANN deletes must vanish from probes immediately")
      val (_, a2s) = t(afn(growVecs(2), 2L))
      val aLedgerGone = !new java.io.File(s"$ivfIdx/deletes").exists()
      val (ainAfter2, ainProbeS2) = t(annProbe())
      require(ainAfter2.forall(id => !(id % (frac * 100) == 3 && id < nv)),
        "purged ids must stay gone after the in-stream ANN purge")
      println(f"""{"step":"ivf_instream","trigger_secs":$a1s%.1f,""" +
        f""""delete_secs":$adStreamS%.1f,"probe_with_ledger_secs":$ainProbeS%.2f,""" +
        f""""trigger_with_purge_secs":$a2s%.1f,"ledger_retired":$aLedgerGone,""" +
        f""""probe_after_secs":$ainProbeS2%.2f}""")
    }
    spark.stop()
  }
}
