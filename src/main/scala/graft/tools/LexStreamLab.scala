package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Curation
import graft.streaming.StreamingLex

/** The STREAMED lexical-index lifecycle at rung scale (r17) —
  * [[AnnStreamLab]]'s twin over the BM25 postings family: 16f measured
  * the lexical index's append/fold as BATCH calls; this lab runs the
  * composed story — a multi-trigger Structured Streaming ingest into a
  * stored 20 M-doc postings index through
  * [[StreamingLex.appendBatches]], with in-stream watermarked folds
  * every `compactEvery` triggers, the post-fold resident
  * self-maintenance, and the r17 per-maintenance-point advice surfaced
  * to the monitor.
  *
  * Measured rows:
  *  - per-trigger wall (fold triggers vs plain triggers — the
  *    in-stream fold + resident check priced by the difference);
  *  - layout before/after (leaves fold away; files per bucket bounded);
  *  - search parity: the streamed index must answer EXACTLY like a
  *    two-pass scan of the full grown corpus (same tokenizer, formula,
  *    round-4 + id tie-break) — required in-run per query;
  *  - stored-postings probe latency over the grown corpus (min-of-2
  *    alternating reps: the first probe of a freshly written index
  *    pays cold file cache — the 16b protocol).
  *
  * Text is [[HybridScaleLab.docText]]'s zipf bag, materialized once
  * (in-plan regeneration would fold 400 M token UDF calls into every
  * scan wall); splits sized for decompressed work (the 16e gotcha).
  *
  * Run (the 20 M rung):
  * {{{
  *   SPARK_DRIVER_MEM=24g sbt "runMain graft.tools.LexStreamLab \
  *     --n 20000000 --buckets 256 --triggers 8 --compactEvery 3 \
  *     --queries 6 --parityQueries 2"
  * }}} */
object LexStreamLab {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    var n = 2000000L
    var buckets = 256
    var triggers = 8
    var compactEvery = 3
    var k = 20
    var nQueries = 6
    var parityQueries = 2
    var partitions = 64
    var root = "/tmp/graft_lexstreamlab"
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--n" => n = args(i + 1).toLong; i += 2
        case "--buckets" => buckets = args(i + 1).toInt; i += 2
        case "--triggers" => triggers = args(i + 1).toInt; i += 2
        case "--compactEvery" => compactEvery = args(i + 1).toInt; i += 2
        case "--k" => k = args(i + 1).toInt; i += 2
        case "--queries" => nQueries = args(i + 1).toInt; i += 2
        case "--parityQueries" => parityQueries = args(i + 1).toInt; i += 2
        case "--partitions" => partitions = args(i + 1).toInt; i += 2
        case "--root" => root = args(i + 1); i += 2
        case other => sys.error(s"unknown arg $other")
      }
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", partitions.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // zipf text compresses ~15x: size splits for the DECOMPRESSED
      // work or the scan-parity arm runs 13-way on a 32-core box
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    val textUdf = udf((id: Long) => HybridScaleLab.docText(id, 20))
    def gen(lo: Long, hi: Long) = spark.range(lo, hi, 1, partitions)
      .select(col("id").as("doc_id"), textUdf(col("id")).as("text"))

    // 95 % base / 5 % growth, growth split across the triggers
    val baseN = n * 19 / 20
    val growN = n - baseN
    val docsPath = s"$root/docs"
    val idx = s"$root/lexidx"
    println(s"""{"corpus":"inplan:$n","buckets":$buckets,"triggers":$triggers,"compact_every":$compactEvery}""")
    val (_, docsS) = t(gen(0, baseN).write.mode("overwrite").parquet(docsPath))
    println(f"""{"step":"docs_write","rows":$baseN,"secs":$docsS%.1f}""")
    val (_, buildS) = t(Curation.writeBm25Index(
      spark.read.parquet(docsPath), "doc_id", "text", idx, buckets = buckets))
    println(f"""{"step":"bm25_index_build","rows":$baseN,"secs":$buildS%.1f}""")

    // stage the growth as one parquet file per trigger
    val perTrigger = growN / triggers
    for (tr <- 0 until triggers) {
      val lo = baseN + tr * perTrigger
      val hi = if (tr == triggers - 1) n else lo + perTrigger
      gen(lo, hi).coalesce(1).write.mode("append").parquet(s"$root/in")
      Thread.sleep(1100) // distinct mtimes -> deterministic trigger order
    }

    def layout() = Curation.bm25IndexLayout(spark, idx)
    val l0 = layout()
    println(s"""{"step":"layout","at":"before_stream","leaves":${l0.batchLeaves},""" +
      s""""resident_files":${l0.residentFiles},"max_per_bucket":${l0.maxResidentFilesPerCell}}""")

    // the composed machinery under test: replay-idempotent keyed append
    // + in-stream watermarked fold + resident self-maintenance + the
    // r17 advice surfaced per maintenance point
    val advices = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val inner = StreamingLex.appendBatches(idx, "doc_id", "text", compactEvery,
      onAdvice = (a, id) => advices.synchronized { advices += ((id, a.action)) })()
    val trigSecs = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val fn: (DataFrame, Long) => Unit = (df, id) => {
      val (_, s) = t(inner(df, id))
      trigSecs.synchronized { trigSecs += ((id, s)) }
      ()
    }
    val schema = spark.read.parquet(s"$root/in").schema
    val q0 = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      .writeStream.foreachBatch(fn)
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q0.awaitTermination()
    trigSecs.foreach { case (id, s) =>
      val folded = compactEvery > 0 && (id + 1) % compactEvery == 0 && id > 0
      println(f"""{"step":"trigger","batch":$id,"secs":$s%.1f,"in_stream_fold":$folded}""")
    }
    advices.foreach { case (id, a) =>
      println(s"""{"step":"advice","batch":$id,"action":"$a"}""")
    }
    val l1 = layout()
    println(s"""{"step":"layout","at":"after_stream","leaves":${l1.batchLeaves},""" +
      s""""resident_files":${l1.residentFiles},"max_per_bucket":${l1.maxResidentFilesPerCell}}""")

    // the grown scan-parity corpus
    spark.read.parquet(s"$root/in").write.mode("append").parquet(docsPath)
    def docs = spark.read.parquet(docsPath)

    // mid-frequency term sets (the HybridScaleLab band)
    def termsFor(qi: Int): Seq[String] = {
      val r = new scala.util.Random(9000 + qi)
      val out = scala.collection.mutable.LinkedHashSet.empty[String]
      while (out.size < 3) out += "w" + (200 + r.nextInt(1000))
      out.toSeq
    }
    def asList(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    // parity on a few queries (the scan arm costs ~a corpus pass each);
    // probe latency on more, min-of-2 alternating reps (cold-cache
    // protocol) — rep 1 of query 0 is reported as the cold row
    var coldMs = -1.0
    for (qi <- 0 until nQueries) {
      val terms = termsFor(qi)
      val (a1, s1) = t(asList(Curation.bm25SearchIndexed(spark, idx, terms, topK = k)))
      val (a2, s2) = t(asList(Curation.bm25SearchIndexed(spark, idx, terms, topK = k)))
      require(a1 == a2, s"probe not deterministic for $terms")
      if (qi == 0) coldMs = s1 * 1000
      val warm = math.min(s1, s2)
      if (qi < parityQueries) {
        val (scan, scanS) = t(asList(
          Curation.bm25Search(docs, "doc_id", "text", terms, topK = k)))
        require(a1.map(_._1) == scan.map(_._1) && a1.map(_._2) == scan.map(_._2),
          s"streamed index diverged from the full-corpus scan for $terms")
        println(f"""{"step":"parity","query":$qi,"indexed_secs":$warm%.2f,"scan_secs":$scanS%.1f,"equal":true}""")
      } else {
        println(f"""{"step":"probe","query":$qi,"warm_secs":$warm%.2f}""")
      }
    }
    println(f"""{"step":"probe_cold","first_probe_ms":$coldMs%.0f}""")
    spark.stop()
  }
}
