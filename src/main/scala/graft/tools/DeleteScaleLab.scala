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
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--root" => root = args(i + 1); i += 2
        case "--frac" => frac = args(i + 1).toLong; i += 2
        case "--k" => k = args(i + 1).toInt; i += 2
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
    spark.stop()
  }
}
