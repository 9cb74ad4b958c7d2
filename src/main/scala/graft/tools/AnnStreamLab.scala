package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Similarity
import graft.streaming.StreamingAnn

/** The STREAMED index lifecycle at rung scale (r15, SCALE.md): r14
  * measured build/append/compact as batch calls — this lab runs the
  * COMPOSED story the machinery was built for: a multi-trigger
  * Structured Streaming ingest into a stored 18 M-vector IVF index
  * through [[StreamingAnn.appendBatchesWithRetrain]], with in-stream
  * auto-compaction (`compactEvery`) and the per-batch retrain verdict,
  * then a final drifted trigger that must trip it.
  *
  * Measured rows:
  *  - per-trigger wall (fold triggers vs plain triggers — the fold's
  *    in-stream cost is the difference);
  *  - files-per-cell before/after the in-stream folds (the accrual the
  *    fold bounds);
  *  - fold cost vs RESIDENT size: the same committed volume folded over
  *    an 18 M resident and over a 10× smaller resident — incremental
  *    folds must cost the same (r14's full rewrite scaled with the
  *    resident; its equivalent cost is also timed for contrast);
  *  - probe latency + ANSWER parity against the batch-built twin
  *    (identical training on the same base corpus → identical
  *    centroids → the streamed and batch layouts must answer
  *    identically at every nprobe).
  *
  * Run (the 20 M rung):
  * {{{
  *   SPARK_DRIVER_MEM=24g sbt "runMain graft.tools.AnnStreamLab \
  *     --n 20000000 --dim 64 --nlist 256 --triggers 8 --compactEvery 3 \
  *     --nprobe 8 --queries 50 --partitions 64"
  * }}} */
object AnnStreamLab {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    var n = 2000000L
    var dim = 64
    var nlist = 256
    var triggers = 8
    var compactEvery = 3
    var nprobes = Seq(8)
    var k = 5
    var nQueries = 50
    var partitions = 64
    var root = "/tmp/graft_streamlab"
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--n" => n = args(i + 1).toLong; i += 2
        case "--dim" => dim = args(i + 1).toInt; i += 2
        case "--nlist" => nlist = args(i + 1).toInt; i += 2
        case "--triggers" => triggers = args(i + 1).toInt; i += 2
        case "--compactEvery" => compactEvery = args(i + 1).toInt; i += 2
        case "--nprobe" => nprobes = args(i + 1).split(",").map(_.toInt).toSeq; i += 2
        case "--k" => k = args(i + 1).toInt; i += 2
        case "--queries" => nQueries = args(i + 1).toInt; i += 2
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    // deterministic clustered corpus at production width; materialized so
    // every arm scans a stored table. 90 % base / 10 % growth on a
    // stride (a range split would poison the in-distribution drift rows)
    EmbedSynth.corpus(spark, n, dim).write.mode("overwrite").parquet(s"$root/synth")
    val e = spark.read.parquet(s"$root/synth")
    val base = e.filter(col("vec_id") % 10 =!= 0)
    val growth = e.filter(col("vec_id") % 10 === 0)
    println(s"""{"corpus":"synth:$n:dim$dim","nlist":$nlist,"triggers":$triggers,"compact_every":$compactEvery}""")

    // the streamed index and its batch-built twin: identical deterministic
    // training on the same base corpus -> identical centroids, so answer
    // parity below is exact by construction
    val streamedIdx = s"$root/idx_streamed"
    val twinIdx = s"$root/idx_twin"
    val (_, buildS) = t(Similarity.writeIvfIndex(base, "vec_id", "e", streamedIdx, nlist = nlist))
    println(f"""{"step":"build","rows":${n * 9 / 10},"secs":$buildS%.1f}""")
    val (_, twinBuildS) = t {
      Similarity.writeIvfIndex(base, "vec_id", "e", twinIdx, nlist = nlist)
      Similarity.appendIvfIndex(growth, "vec_id", "e", twinIdx)
    }
    println(f"""{"step":"twin_build_append","secs":$twinBuildS%.1f}""")

    def filesAndLeaves(idx: String): (Long, Long, Long) = {
      val corpus = new org.apache.hadoop.fs.Path(s"$idx/corpus")
      var files = 0L; var leaves = 0L; var maxPerCell = 0L
      for (cell <- fs.listStatus(corpus)
           if cell.isDirectory && cell.getPath.getName.startsWith("cell=")) {
        var cellFiles = 0L
        for (leaf <- fs.listStatus(cell.getPath) if leaf.isDirectory) {
          leaves += 1
          cellFiles += fs.listStatus(leaf.getPath)
            .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        }
        files += cellFiles
        maxPerCell = math.max(maxPerCell, cellFiles)
      }
      (files, leaves, maxPerCell)
    }

    // stage the growth slice as one parquet file per trigger
    for (tr <- 0 until triggers) {
      growth.filter((col("vec_id") / 10) % triggers === tr)
        .coalesce(1).write.mode("append").parquet(s"$root/in")
      Thread.sleep(1100) // distinct mtimes -> deterministic trigger order
    }

    val (f0, l0, m0) = filesAndLeaves(streamedIdx)
    println(s"""{"step":"layout","at":"before_stream","files":$f0,"leaves":$l0,"max_per_cell":$m0}""")

    // the composed machinery under test: idempotent append + per-batch
    // retrain verdict + in-stream watermarked fold, per trigger
    val verdicts = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean, Double)]
    val inner = StreamingAnn.appendBatchesWithRetrain(
      streamedIdx, "vec_id", "e", compactEvery) { (v, id) =>
      verdicts.synchronized { verdicts += ((id, v.retrain, v.coarseFit)) }
    }
    val trigSecs = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val fn: (DataFrame, Long) => Unit = (df, id) => {
      val (_, s) = t(inner(df, id))
      trigSecs.synchronized { trigSecs += ((id, s)) }
      ()
    }
    val q0 = spark.readStream.schema(e.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      .writeStream.foreachBatch(fn)
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q0.awaitTermination()
    trigSecs.foreach { case (id, s) =>
      val folded = compactEvery > 0 && (id + 1) % compactEvery == 0 && id > 0
      println(f"""{"step":"trigger","batch":$id,"secs":$s%.1f,"in_stream_fold":$folded}""")
    }
    verdicts.foreach { case (id, r, fit) =>
      println(f"""{"step":"verdict","batch":$id,"retrain":$r,"coarse_fit":$fit%.4f}""")
    }
    require(verdicts.forall(!_._2), "in-distribution stream tripped the retrain trigger")
    val (f1, l1, m1) = filesAndLeaves(streamedIdx)
    println(s"""{"step":"layout","at":"after_stream","files":$f1,"leaves":$l1,"max_per_cell":$m1}""")

    // probe latency + exact answer parity vs the batch-built twin
    val stride = math.max(1L, n / nQueries)
    val q = e.filter(col("vec_id") % stride === 3L).limit(nQueries)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nq = q.count()
    for (nprobe <- nprobes) {
      def probe(idx: String) = t {
        Similarity.ivfTopKIndexed(q, "vec_id", "e", idx, k = k, nprobe = nprobe)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
          .sortBy(x => (x._1, x._4)).toSeq
      }
      val (aS, sS) = probe(streamedIdx)
      val (aT, sT) = probe(twinIdx)
      require(aS == aT, s"streamed and twin answers diverged at nprobe=$nprobe")
      println(f"""{"step":"probe_parity","nprobe":$nprobe,"queries":$nq,""" +
        f""""streamed_per_query_ms":${sS * 1000 / nq}%.0f,"twin_per_query_ms":${sT * 1000 / nq}%.0f,"answers_equal":true}""")
    }

    // fold cost vs resident size: the same committed volume (2 triggers'
    // worth) folded over the big resident and over a 10x smaller one —
    // the incremental fold must price the BATCH, not the resident. The
    // r14 full-rewrite equivalent (read + re-spread + rewrite the whole
    // corpus) is timed on the big index for contrast.
    def foldExperiment(tag: String, baseDf: DataFrame, idx: String): Unit = {
      Similarity.writeIvfIndex(baseDf, "vec_id", "e", idx, nlist = nlist)
      val cents = Similarity.loadIvfCentroids(spark, idx)
      Similarity.appendIvfIndexIdempotent(
        growth.filter((col("vec_id") / 10) % triggers === 0), "vec_id", "e", idx, cents, 0L)
      Similarity.appendIvfIndexIdempotent(
        growth.filter((col("vec_id") / 10) % triggers === 1), "vec_id", "e", idx, cents, 1L)
      val (_, foldS) = t(Similarity.compactIvfIndex(spark, idx, committedBatchId = 1L))
      val resident = spark.read.parquet(s"$idx/corpus").count()
      println(f"""{"step":"fold_cost","resident":"$tag","resident_rows":$resident,"fold_secs":$foldS%.1f}""")
    }
    foldExperiment("small_0.01x", base.filter(col("vec_id") % 100 === 1), s"$root/idx_small")
    foldExperiment("big_1x", base, s"$root/idx_big")
    val (_, rewriteS) = t {
      val nl = spark.read.parquet(s"$root/idx_big/centroids").count().toInt
      spark.read.parquet(s"$root/idx_big/corpus")
        .transform(df => df.repartition(nl, col("cell")))
        .write.mode("overwrite").partitionBy("cell", "ingest_batch")
        .parquet(s"$root/rewrite_equiv")
    }
    println(f"""{"step":"full_rewrite_equiv","note":"what each r14 fold would have paid on the big resident","secs":$rewriteS%.1f}""")

    // the drifted trigger: one more staged file, spectrally concentrated
    // — the in-stream verdict must trip on the SAME running contract
    growth.filter((col("vec_id") / 10) % triggers === 0)
      .withColumn("e", expr(s"transform(e, (x, i) -> IF(i < 8, x * 6.0D, x * 0.25D))"))
      .withColumn("vec_id", col("vec_id") + lit(10L * n))
      .coalesce(1).write.mode("append").parquet(s"$root/in")
    verdicts.clear()
    val q1 = spark.readStream.schema(e.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      .writeStream.foreachBatch(fn)
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination()
    verdicts.foreach { case (id, r, fit) =>
      println(f"""{"step":"drift_verdict","batch":$id,"retrain":$r,"coarse_fit":$fit%.4f}""")
    }
    require(verdicts.nonEmpty && verdicts.last._2,
      "spectrally-drifted trigger failed to trip the in-stream retrain verdict")
    spark.stop()
  }
}
