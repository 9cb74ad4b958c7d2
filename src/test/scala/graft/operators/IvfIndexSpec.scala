package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The materialize-once IVF path: build → reload → probe equals the
  * direct in-session ivfTopK, and the probe scan prunes to probed
  * cells' partitions. */
class IvfIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("ivf-index-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("stored index returns exactly the direct ivfTopK results (exhaustive regime)") {
    val s = spark
    import s.implicits._
    // deterministic synthetic embeddings: 3 dims, 60 vectors
    val vecs = (0L until 60L).map { i =>
      (i, Array((i % 7).toDouble + 1, ((i * 3) % 5).toDouble, ((i * 7) % 11).toDouble))
    }
    val df = vecs.toDF("id", "v")
    val q = df.filter(col("id") < 5)
    val path = Files.createTempDirectory("ivfidx").toString

    Similarity.writeIvfIndex(df, "id", "v", path, nlist = 4)
    val indexed = Similarity.ivfTopKIndexed(q, "id", "v", path, k = 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted
    val direct = Similarity.ivfTopK(q, "id", "v", df, "id", "v",
      k = 3, nlist = 4, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted
    assert(indexed.toSeq === direct.toSeq)

    // partition pruning: the probed-cell IN filter must appear as a
    // partition filter on the index scan (directory pruning, not a
    // post-scan filter)
    val pruned = Similarity.ivfTopKIndexed(q, "id", "v", path, k = 3, nprobe = 1)
    assert(pruned.count() > 0)
    // (executed plan inspected as a string: AQE wraps the scan nodes, so
    // a typed collect on the pre-execution plan sees no FileSourceScan)
    val plan = pruned.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(l =>
      l.contains("FileScan parquet") && l.contains("corpus"))
    assert(scanLine.isDefined, s"expected a parquet scan of the index corpus in:\n$plan")
    assert(scanLine.get.contains("PartitionFilters: [cell")
      || scanLine.get.matches(".*PartitionFilters: \\[.*cell.*"),
      s"probed cells must prune partitions at the index scan, got: ${scanLine.get}")
  }

  test("ivfDriftStats: in-distribution batch fits, rotated batch degrades; cost is batch-only") {
    val s = spark
    import s.implicits._
    val gen = udf((id: Long) => graft.tools.EmbedSynth.vector(id, 8, 4, 0.2))
    val base = spark.range(200).select(col("id"), gen(col("id")).as("v"))
    val path = Files.createTempDirectory("ivfdrift").toString
    Similarity.writeIvfIndex(base, "id", "v", path, nlist = 4)
    def fitOf(df: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val r = Similarity.ivfDriftStats(df, "id", "v", path).collect()(0)
      (r.getLong(0), r.getDouble(1))
    }
    val inDist = spark.range(200, 300).select(col("id"), gen(col("id")).as("v"))
    // drift: a cluster layout the quantizer never saw
    val genShift = udf((id: Long) => graft.tools.EmbedSynth.vector(id + 999999, 8, 9, 2.0))
    val shifted = spark.range(200, 300).select(col("id"), genShift(col("id")).as("v"))
    val (n1, fit1) = fitOf(inDist)
    val (n2, fit2) = fitOf(shifted)
    assert(n1 === 100L && n2 === 100L)
    assert(fit1 > fit2 + 0.05,
      f"coarse fit must degrade under drift: $fit1%.4f vs $fit2%.4f")
  }

  test("incremental append: build-half + append-half equals one full build") {
    val s = spark
    import s.implicits._
    val vecs = (0L until 60L).map { i =>
      (i, Array((i % 7).toDouble + 1, ((i * 3) % 5).toDouble, ((i * 7) % 11).toDouble))
    }
    val df = vecs.toDF("id", "v")
    val first = df.filter(col("id") < 30)
    val batch = df.filter(col("id") >= 30)
    val q = df.filter(col("id") < 5)

    val appended = Files.createTempDirectory("ivfapp").toString
    Similarity.writeIvfIndex(first, "id", "v", appended, nlist = 4)
    Similarity.appendIvfIndex(batch, "id", "v", appended)

    // every vector landed in exactly one cell, assigned by the STORED
    // centroids (no retrain): rebuilding the assignment from the stored
    // centroid table must reproduce the index's cell column bit for bit
    val idx = spark.read.parquet(s"$appended/corpus")
    assert(idx.count() === 60)
    assert(idx.select("corpus_id").distinct().count() === 60)
    val cents = spark.read.parquet(s"$appended/centroids").orderBy("cell")
      .collect().map(_.getSeq[Double](1).toArray)
    val reassign = udf { (v: Seq[Double]) =>
      Similarity.nearestCell(Similarity.normalize(v.toArray), cents)
    }
    assert(idx.filter(reassign(col("cv")) =!= col("cell")).count() === 0,
      "append must assign against the stored centroids")

    // exhaustive probe over the appended index = brute force over A∪B
    // (and therefore = a fresh full build queried the same way)
    val viaAppend = Similarity.ivfTopKIndexed(q, "id", "v", appended, k = 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted
    val brute = Similarity.bruteForceTopK(q, "id", "v", df, "id", "v", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted
    assert(viaAppend.toSeq === brute.toSeq)

    // partial probe: appended vectors are probe-reachable (cells fill,
    // never re-center — querying an appended id's own neighborhood finds it)
    val partial = Similarity.ivfTopKIndexed(df.filter(col("id") === 45), "id", "v",
      appended, k = 3, nprobe = 2)
    assert(partial.count() === 3)
  }

  test("append into a pre-r12 partitionBy(cell) layout fails with a rebuild message") {
    val s = spark
    import s.implicits._
    val vecs = (0L until 20L).map { i =>
      (i, Array((i % 7).toDouble + 1, ((i * 3) % 5).toDouble, ((i * 7) % 11).toDouble))
    }
    val df = vecs.toDF("id", "v")
    // hand-build the OLD single-level layout: data files directly under
    // cell= dirs, no ingest_batch partition column
    val path = Files.createTempDirectory("ivfold").toString
    val cents = Similarity.trainIvfCentroids(df, "id", "v", nlist = 2)
    val assign = udf { (v: Seq[Double]) =>
      Similarity.nearestCell(Similarity.normalize(v.toArray), cents)
    }
    df.select(col("id").as("corpus_id"), col("v").cast("array<double>").as("cv"))
      .withColumn("cell", assign(col("cv")))
      .withColumn("cn", Similarity.l2norm(col("cv")))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/corpus")
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid").write.mode("overwrite").parquet(s"$path/centroids")
    // appending the two-level layout would corrupt partition discovery —
    // both append entry points must refuse with the remedy spelled out
    val e1 = intercept[IllegalStateException] {
      Similarity.appendIvfIndex(df, "id", "v", path)
    }
    assert(e1.getMessage.contains("Rebuild"), e1.getMessage)
    val e2 = intercept[IllegalStateException] {
      Similarity.appendIvfIndexIdempotent(df, "id", "v", path, cents, batchId = 0L)
    }
    assert(e2.getMessage.contains("Rebuild"), e2.getMessage)
    // a current-layout index still appends fine (guard has no false hits)
    val good = Files.createTempDirectory("ivfnew").toString
    Similarity.writeIvfIndex(df.filter(col("id") < 10), "id", "v", good, nlist = 2)
    Similarity.appendIvfIndex(df.filter(col("id") >= 10), "id", "v", good)
    assert(spark.read.parquet(s"$good/corpus").count() === 20)
  }

  test("shouldRetrain (IVF): in-distribution holds, spectral drift trips") {
    val s = spark
    import s.implicits._
    def gen(ids: Range) = ids.map { i =>
      (i.toLong, graft.tools.EmbedSynth.vector(i.toLong, 16, 4, 0.3).toSeq)
    }.toDF("id", "v")
    val path = Files.createTempDirectory("ivfdrift").toString
    Similarity.writeIvfIndex(gen(0 until 400), "id", "v", path, nlist = 4)
    assert(spark.read.parquet(s"$path/drift_ref").collect()(0).getLong(0) === 400L)
    val inDist = gen(400 until 500)
    val (r1, fit1, refFit) = Similarity.shouldRetrain(inDist, "id", "v", path)
    assert(!r1, f"in-distribution tripped: fit=$fit1%.4f ref=$refFit%.4f")
    val drifted = inDist.withColumn("v",
      org.apache.spark.sql.functions.expr(
        "transform(v, (x, i) -> IF(i < 2, x * 6.0D, x * 0.25D))"))
    val (r2, fit2, _) = Similarity.shouldRetrain(drifted, "id", "v", path)
    assert(r2, f"drifted batch must trip: fit=$fit2%.4f ref=$refFit%.4f")
  }

  test("manual append crash: retry is exactly-once; a different batch never reuses the orphan's lane") {
    // r17: the keyless append's retry double-count closed with the
    // lexical family's manual-lane shape — lane via dynamic overwrite
    // first, `_manual_watermark` second; a crash between the two steps
    // resolves by id-set fingerprint (retry reuses the lane, a
    // different batch adopts the orphan and takes a fresh one).
    val s = spark
    import s.implicits._
    val vecs = (0L until 60L).map { i =>
      (i, Array((i % 7).toDouble + 1, ((i * 3) % 5).toDouble, ((i * 7) % 11).toDouble))
    }
    val df = vecs.toDF("id", "v")
    val idx = Files.createTempDirectory("ivfmanual").toString
    Similarity.writeIvfIndex(df.filter(col("id") < 30), "id", "v", idx, nlist = 4)
    val b1 = df.filter(col("id") >= 30 && col("id") < 45)
    val b2 = df.filter(col("id") >= 45)
    val table = new org.apache.hadoop.fs.Path(s"$idx/corpus")
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val floor = IndexMaintenance.ManualLaneFloor

    Similarity.appendIvfIndex(b1, "id", "v", idx)
    assert(IndexMaintenance.readManualWatermark(fs, table) === floor)
    def rewind(to: Long): Unit = IndexMaintenance.writeManualWatermark(fs, table, to)

    // crash between the corpus write and the watermark publish → RETRY
    rewind(floor - 1)
    Similarity.appendIvfIndex(b1, "id", "v", idx)
    val corpus = spark.read.parquet(s"$idx/corpus")
    assert(corpus.count() === 45 && corpus.select("corpus_id").distinct().count() === 45,
      "retry must overwrite its own lane, never duplicate")

    // crash again, operator moves on with a DIFFERENT batch → the orphan
    // is adopted (its rows are complete and probe-visible), fresh lane
    rewind(floor - 1)
    Similarity.appendIvfIndex(b2, "id", "v", idx)
    val corpus2 = spark.read.parquet(s"$idx/corpus")
    assert(corpus2.count() === 60 && corpus2.select("corpus_id").distinct().count() === 60)
    assert(Similarity.ivfIndexLayout(spark, idx).maxBatchId === floor + 1,
      "the different batch must take a fresh lane above the orphan's")

    // exhaustive probe over the index == brute force over everything
    val q = df.filter(col("id") < 5)
    val got = Similarity.ivfTopKIndexed(q, "id", "v", idx, k = 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted
    val want = Similarity.bruteForceTopK(q, "id", "v", df, "id", "v", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted
    assert(got.toSeq === want.toSeq)

    // recovery is the no-retry remedy: it ADOPTS an orphan lane (the
    // rows are already index-visible) and is idempotent
    rewind(floor)
    val healed = Similarity.recoverIvfFold(spark, idx)
    assert(healed.exists(_.contains("adopted")), s"got $healed")
    assert(IndexMaintenance.readManualWatermark(fs, table) === floor + 1)
    assert(Similarity.recoverIvfFold(spark, idx).isEmpty, "recovery is idempotent")
  }

  test("two crashed appends, then a retry of either: the retry finds its OWN lane; a vanished watermark cannot double-land a batch (r18)") {
    // r17 matched fingerprints only when exactly ONE orphan existed, so
    // two crashed appends followed by a retry adopted both orphans and
    // wrote the retried batch AGAIN under a fresh lane — duplicate
    // vectors in every later top-k. Every orphan is fingerprinted now.
    val s = spark
    import s.implicits._
    val vecs = (0L until 60L).map { i =>
      (i, Array((i % 7).toDouble + 1, ((i * 3) % 5).toDouble, ((i * 7) % 11).toDouble))
    }
    val df = vecs.toDF("id", "v")
    val idx = Files.createTempDirectory("ivfmulti").toString
    Similarity.writeIvfIndex(df.filter(col("id") < 30), "id", "v", idx, nlist = 4)
    val b1 = df.filter(col("id") >= 30 && col("id") < 45)
    val b2 = df.filter(col("id") >= 45)
    val table = new org.apache.hadoop.fs.Path(s"$idx/corpus")
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val floor = IndexMaintenance.ManualLaneFloor
    Similarity.appendIvfIndex(b1, "id", "v", idx) // lane = floor
    Similarity.appendIvfIndex(b2, "id", "v", idx) // lane = floor+1
    def distinctCount() = {
      val c = spark.read.parquet(s"$idx/corpus")
      (c.count(), c.select("corpus_id").distinct().count())
    }
    // both appends "crashed" before their watermark publish
    IndexMaintenance.writeManualWatermark(fs, table, floor - 1)
    // retry of the FIRST batch must reuse lane floor (not adopt-all and
    // double-land under floor+2)
    Similarity.appendIvfIndex(b1, "id", "v", idx)
    assert(distinctCount() === ((60L, 60L)), "retry of b1 must self-overwrite")
    assert(IndexMaintenance.readManualWatermark(fs, table) === floor)
    assert(Similarity.ivfIndexLayout(spark, idx).maxBatchId === floor + 1,
      "no fresh lane: b2's orphan lane is still the highest")
    // b2 is still an orphan; its retry finds its own lane too
    Similarity.appendIvfIndex(b2, "id", "v", idx)
    assert(distinctCount() === ((60L, 60L)))
    assert(IndexMaintenance.readManualWatermark(fs, table) === floor + 1)

    // the watermark PUBLISH crash (delete done, rename not): only the
    // scratch file survives — the read falls back to it (r18)
    val wm = new org.apache.hadoop.fs.Path(table, "_manual_watermark")
    val scratch = new org.apache.hadoop.fs.Path(table, "_manual_watermark.tmp")
    val out = fs.create(scratch, true)
    out.write(s"${floor + 1}\n".getBytes("UTF-8")); out.close()
    fs.delete(wm, false)
    assert(IndexMaintenance.readManualWatermark(fs, table) === floor + 1,
      "the publish scratch is complete before anything is deleted — read it")
    // with NEITHER file every historical lane looks orphaned, and the
    // per-orphan fingerprints still keep a retry single
    fs.delete(scratch, false)
    assert(IndexMaintenance.readManualWatermark(fs, table) === floor - 1)
    Similarity.appendIvfIndex(b2, "id", "v", idx)
    assert(distinctCount() === ((60L, 60L)),
      "a total watermark loss must not double-land a retried batch")
    // probe parity over the whole lifecycle
    val q = df.filter(col("id") < 5)
    val got = Similarity.ivfTopKIndexed(q, "id", "v", idx, k = 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted
    val want = Similarity.bruteForceTopK(q, "id", "v", df, "id", "v", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted
    assert(got.toSeq === want.toSeq)
  }

  test("streamed lane vs deletion: a committed replay passes the tombstone guard; a fresh batch re-adding the id refuses (r18)") {
    // The ADVICE hole: requireNotTombstoned threw on replay-idempotent
    // appends too, so deleting an id from a written-but-uncheckpointed
    // batch wedged the stream forever (the replay throws on every
    // restart). A committed replay is a harmless self-overwrite — the
    // ledger already hides its rows.
    val s = spark
    import s.implicits._
    val vecs = (0L until 45L).map { i =>
      (i, Array((i % 7).toDouble + 1, ((i * 3) % 5).toDouble, ((i * 7) % 11).toDouble))
    }
    val df = vecs.toDF("id", "v")
    val idx = Files.createTempDirectory("ivfreplaydel").toString
    Similarity.writeIvfIndex(df.filter(col("id") < 30), "id", "v", idx, nlist = 4)
    val cents = Similarity.loadIvfCentroids(spark, idx)
    val b = df.filter(col("id") >= 30)
    Similarity.appendIvfIndexIdempotent(b, "id", "v", idx, cents, batchId = 0L)
    // an id from batch 0 is deleted AFTER the write committed
    Similarity.deleteFromIvfIndex(Seq(31L).toDF("id"), idx)
    // the checkpoint never committed -> batch 0 is re-delivered: must
    // pass (self-overwrite), not wedge the stream
    Similarity.appendIvfIndexIdempotent(b, "id", "v", idx, cents, batchId = 0L)
    val c = spark.read.parquet(s"$idx/corpus")
    assert(c.count() === 45 && c.select("corpus_id").distinct().count() === 45)
    // the probe still hides the tombstoned id
    val got = Similarity.ivfTopKIndexed(df.filter(col("id") === 31), "id", "v",
      idx, k = 5, nprobe = 4)
    assert(!got.collect().exists(_.getLong(1) == 31L), "deleted id must stay hidden")
    // a genuinely FRESH batch re-appending the deleted id still refuses
    val fresh = intercept[IllegalArgumentException] {
      Similarity.appendIvfIndexIdempotent(
        df.filter(col("id") === 31), "id", "v", idx, cents, batchId = 1L)
    }
    assert(fresh.getMessage.contains("tombstone"), fresh.getMessage)
    // ... and so does the manual lane (operator-driven retries stay loud)
    val manual = intercept[IllegalArgumentException] {
      Similarity.appendIvfIndex(df.filter(col("id") === 31), "id", "v", idx)
    }
    assert(manual.getMessage.contains("tombstone"), manual.getMessage)
  }

  test("filtered search: metadata predicate inside the pruned scan, exact at full probe, survives append/fold/rebuild, composes with deletion (r18)") {
    val s = spark
    import s.implicits._
    val vecs = (0L until 80L).map { i =>
      (i, Array((i % 7).toDouble + 1, ((i * 3) % 5).toDouble, ((i * 7) % 11).toDouble),
        (i % 3).toInt)
    }
    val df = vecs.toDF("id", "v", "category")
    val idx = Files.createTempDirectory("ivffilter").toString
    Similarity.writeIvfIndex(df.filter(col("id") < 40), "id", "v", idx,
      nlist = 4, metaCols = Seq("category"))
    // metadata rides every append lane too
    val cents = Similarity.loadIvfCentroids(spark, idx)
    Similarity.appendIvfIndexIdempotent(
      df.filter(col("id") >= 40 && col("id") < 60), "id", "v", idx, cents,
      batchId = 0L, metaCols = Seq("category"))
    Similarity.appendIvfIndex(df.filter(col("id") >= 60), "id", "v", idx,
      cents, metaCols = Seq("category"))
    val q = df.filter(col("id") < 5).select("id", "v")
    def probe(flt: org.apache.spark.sql.Column) =
      Similarity.ivfTopKIndexed(q, "id", "v", idx, k = 3, nprobe = 4,
          filter = Some(flt))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted.toSeq
    def want(corpus: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(q, "id", "v", corpus, "id", "v", k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted.toSeq
    assert(probe(col("category") === 1) === want(df.filter(col("category") === 1)),
      "full probe + predicate == brute force over the filtered corpus")
    // the predicate reaches the parquet scan (pushdown, not a join)
    val plan = Similarity.ivfTopKIndexed(q, "id", "v", idx, k = 3, nprobe = 4,
      filter = Some(col("category") === 1)).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("category"),
      s"metadata predicate must push into the scan:\n$plan")
    // the fold preserves metadata
    Similarity.compactIvfIndex(spark, idx, committedBatchId = 0L)
    assert(probe(col("category") === 1) === want(df.filter(col("category") === 1)))
    // composes with deletion: tombstones anti-join on top of the filter
    Similarity.deleteFromIvfIndex(Seq(1L, 4L, 7L, 10L, 13L).toDF("id"), idx)
    val liveCat1 = df.filter(col("category") === 1 &&
      !col("id").isin(1L, 4L, 7L, 10L, 13L))
    assert(probe(col("category") === 1) === want(liveCat1))
    // a rebuild keeps the metadata columns (only layout columns recompute)
    val rebuilt = Files.createTempDirectory("ivffilterreb").toString + "/idx"
    Similarity.rebuildIvfIndex(spark, idx, rebuilt, nlist = 4)
    val got = Similarity.ivfTopKIndexed(q, "id", "v", rebuilt, k = 3, nprobe = 4,
        filter = Some(col("category") === 1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted.toSeq
    assert(got === want(liveCat1), "rebuild must preserve stored metadata")
    // metaCols cannot shadow the layout's own columns
    val bad = intercept[IllegalArgumentException] {
      Similarity.writeIvfIndex(df.withColumnRenamed("category", "cell"),
        "id", "v", Files.createTempDirectory("ivfbadmeta").toString,
        nlist = 4, metaCols = Seq("cell"))
    }
    assert(bad.getMessage.contains("collide"), bad.getMessage)
    // an append whose metaCols don't match the build's refuses loudly —
    // its rows' missing metadata would read as NULL under the union
    // schema and filtered probes would silently drop them (r18 review)
    val mm = intercept[IllegalArgumentException] {
      Similarity.appendIvfIndex(df.select("id", "v"), "id", "v", idx, cents)
    }
    assert(mm.getMessage.contains("metaCols"), mm.getMessage)
  }

  test("tombstoned deletes: probes skip deleted vectors; purge reclaims and clears the ledger") {
    val s = spark
    import s.implicits._
    val vecs = (0L until 60L).map { i =>
      (i, Array((i % 7).toDouble + 1, ((i * 3) % 5).toDouble, ((i * 7) % 11).toDouble))
    }
    val df = vecs.toDF("id", "v")
    val idx = Files.createTempDirectory("ivfdel").toString
    Similarity.writeIvfIndex(df, "id", "v", idx, nlist = 4)
    // a deletes dir without committed data files (a delete that crashed
    // before its job commit) reads as NO ledger — probes must not brick
    // on schema inference (r17 review)
    new java.io.File(s"$idx/deletes").mkdirs()
    assert(Similarity.ivfTopKIndexed(df.filter(col("id") < 2), "id", "v",
      idx, k = 3, nprobe = 4).count() === 6)
    val live = df.filter(pmod(col("id"), lit(7)) =!= 1)
    Similarity.deleteFromIvfIndex(
      df.filter(pmod(col("id"), lit(7)) === 1).select("id"), idx)
    val q = df.filter(col("id") < 5) // incl. queries for deleted neighbors
    def probe() = Similarity.ivfTopKIndexed(q, "id", "v", idx, k = 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted.toSeq
    val want = Similarity.bruteForceTopK(q, "id", "v", live, "id", "v", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted.toSeq
    assert(probe() === want, "deleted vectors must vanish from answers immediately")
    // re-appending a deleted id is refused (the ledger would hide it)
    val eRe = intercept[IllegalArgumentException] {
      Similarity.appendIvfIndex(df.filter(col("id") === 8), "id", "v", idx)
    }
    assert(eRe.getMessage.contains("tombstone"), eRe.getMessage)
    // a REBUILD is the documented ledger reset: it starts from the
    // tombstone-filtered rows and the fresh index carries no ledger —
    // deleted vectors must never resurrect through it (r17 review)
    val rebuilt = Files.createTempDirectory("ivfdelreb").toString + "/idx"
    Similarity.rebuildIvfIndex(spark, idx, rebuilt, nlist = 4)
    assert(spark.read.parquet(s"$rebuilt/corpus").count() === live.count(),
      "rebuild must not resurrect tombstoned vectors")
    assert(!new java.io.File(s"$rebuilt/deletes").exists())
    // purge: rows physically gone, ledger cleared, answers unchanged
    assert(Similarity.purgeIvfDeletes(spark, idx) > 0)
    assert(spark.read.parquet(s"$idx/corpus").count() === live.count())
    assert(!new java.io.File(s"$idx/deletes").exists(), "ANN purge clears the ledger")
    assert(probe() === want)
    assert(Similarity.purgeIvfDeletes(spark, idx) === 0, "no ledger, no-op")
  }

  test("backfillMetaCols: a meta-less index gains filtered search in place — guards, appends, tombstones, crash roll-forward (r19)") {
    val s = spark
    import s.implicits._
    val vecs = (0L until 80L).map { i =>
      (i, Array((i % 7).toDouble + 1, ((i * 3) % 5).toDouble, ((i * 7) % 11).toDouble),
        (i % 3).toInt)
    }
    val df = vecs.toDF("id", "v", "category")
    val idx = Files.createTempDirectory("ivfbackfill").toString
    // the pre-r18 shape: built and appended WITHOUT metadata, plus a
    // tombstone — the exact index the upgrade path exists for
    Similarity.writeIvfIndex(df.filter(col("id") < 40).select("id", "v"),
      "id", "v", idx, nlist = 4)
    val cents = Similarity.loadIvfCentroids(spark, idx)
    Similarity.appendIvfIndexIdempotent(
      df.filter(col("id") >= 40 && col("id") < 60).select("id", "v"),
      "id", "v", idx, cents, batchId = 0L)
    Similarity.deleteFromIvfIndex(Seq(2L, 5L).toDF("id"), idx)
    val q = df.filter(col("id") < 5).select("id", "v")
    def want(corpus: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(q, "id", "v", corpus, "id", "v", k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted.toSeq
    def probe(flt: org.apache.spark.sql.Column) =
      Similarity.ivfTopKIndexed(q, "id", "v", idx, k = 3, nprobe = 4,
          filter = Some(flt))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted.toSeq
    // guards fire BEFORE any rewrite: a duplicated meta id would
    // multiply corpus rows through the join; an uncovered LIVE id would
    // land NULL metadata that filtered probes silently drop
    val meta = df.filter(col("id") < 60).select("id", "category")
    val eDup = intercept[IllegalArgumentException] {
      Similarity.backfillMetaCols(spark, idx,
        meta.union(meta.limit(1)), metaCols = Seq("category"))
    }
    assert(eDup.getMessage.contains("ONE row per id"), eDup.getMessage)
    val eCov = intercept[IllegalArgumentException] {
      Similarity.backfillMetaCols(spark, idx,
        meta.filter(col("id") =!= 7L), metaCols = Seq("category"))
    }
    assert(eCov.getMessage.contains("cover"), eCov.getMessage)
    // ... but TOMBSTONED ids are exempt from coverage (ledger-hidden;
    // the purge removes them): meta without ids 2 and 5 backfills fine
    assert(Similarity.backfillMetaCols(spark, idx,
      meta.filter(!col("id").isin(2L, 5L)), metaCols = Seq("category")))
    val live = df.filter(!col("id").isin(2L, 5L) && col("id") < 60)
    assert(probe(col("category") === 1) === want(live.filter(col("category") === 1)),
      "backfilled index must answer exactly like one built with the metadata")
    // the contract file now governs appends: meta-less refuses, with
    // metadata lands and stays exact
    val mm = intercept[IllegalArgumentException] {
      Similarity.appendIvfIndex(df.filter(col("id") >= 60).select("id", "v"),
        "id", "v", idx, cents)
    }
    assert(mm.getMessage.contains("metaCols"), mm.getMessage)
    Similarity.appendIvfIndex(df.filter(col("id") >= 60), "id", "v", idx,
      cents, metaCols = Seq("category"))
    val live80 = df.filter(!col("id").isin(2L, 5L))
    assert(probe(col("category") === 1) === want(live80.filter(col("category") === 1)))
    // backfill only ADDS columns — re-backfilling a stored one refuses
    val eAgain = intercept[IllegalArgumentException] {
      Similarity.backfillMetaCols(spark, idx,
        df.select("id", "category"), metaCols = Seq("category"))
    }
    assert(eAgain.getMessage.contains("already stores"), eAgain.getMessage)
    // a SECOND column backfills on top; both predicates compose
    assert(Similarity.backfillMetaCols(spark, idx,
      df.filter(!col("id").isin(2L, 5L))
        .select(col("id"), (col("id") % 2).cast("int").as("parity")),
      metaCols = Seq("parity")))
    assert(probe(col("category") === 1 && col("parity") === 0) ===
      want(live80.filter(col("category") === 1 && col("id") % 2 === 0)))
    // crash roll-forward: the aside table complete, the live dir gone
    // (killed between delete and rename) — the next backfill publishes
    // it at entry, then proceeds with its own join
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.rename(new org.apache.hadoop.fs.Path(s"$idx/corpus"),
      new org.apache.hadoop.fs.Path(s"$idx/corpus_backfill")))
    assert(Similarity.backfillMetaCols(spark, idx,
      df.filter(!col("id").isin(2L, 5L))
        .select(col("id"), (col("id") % 5).cast("int").as("bucket5")),
      metaCols = Seq("bucket5")))
    assert(probe(col("category") === 1 && col("bucket5") === 1) ===
      want(live80.filter(col("category") === 1 && col("id") % 5 === 1)),
      "roll-forward must recover the published table before the new join")
    // the OTHER crash window (r19 review): the contract advances BEFORE
    // the table rewrites, so a crash can leave `_meta_cols` naming a
    // column the rows don't carry — that state must RESUME (the clash
    // check recognizes its own interrupted upgrade), while re-adding a
    // column the rows DO carry still refuses
    IndexMaintenance.writeMetaColsFile(fs, idx,
      Seq("category", "parity", "bucket5", "region"))
    assert(Similarity.backfillMetaCols(spark, idx,
      df.filter(!col("id").isin(2L, 5L))
        .select(col("id"), (col("id") % 7).cast("int").as("region")),
      metaCols = Seq("region")), "contract-ahead state must resume")
    assert(probe(col("region") === 1) ===
      want(live80.filter(col("id") % 7 === 1)))
    val eRe = intercept[IllegalArgumentException] {
      Similarity.backfillMetaCols(spark, idx,
        df.select(col("id"), (col("id") % 7).cast("int").as("region")),
        metaCols = Seq("region"))
    }
    assert(eRe.getMessage.contains("already stores"), eRe.getMessage)
  }

  test("minCandidates auto-widens nprobe under a selective filter: a query whose probed cell holds no matches still gets full answers (r19)") {
    val s = spark
    import s.implicits._
    val vecs = (0L until 100L).map { i =>
      (i, Array((i % 7).toDouble + 1, ((i * 3) % 5).toDouble, ((i * 7) % 11).toDouble))
    }
    val df = vecs.toDF("id", "v")
    val idx = Files.createTempDirectory("ivfwiden").toString
    Similarity.writeIvfIndex(df, "id", "v", idx, nlist = 4)
    // construct the silent-degradation scenario DETERMINISTICALLY: mark
    // exactly the rows of one stored cell as category 1, then query
    // with a DIFFERENT cell's centroid — at nprobe=1 the probed cell
    // holds zero matching candidates
    val byCell = spark.read.parquet(s"$idx/corpus").select("corpus_id", "cell")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val c0 = byCell.map(_._2).groupBy(identity).view.mapValues(_.length)
      .toSeq.maxBy(_._2)._1 // the fullest cell carries the rare category
    val rare = byCell.filter(_._2 == c0).map(_._1).toSet
    assert(Similarity.backfillMetaCols(spark, idx,
      df.select(col("id"),
        when(col("id").isin(rare.toSeq: _*), 1).otherwise(0).cast("int").as("category")),
      metaCols = Seq("category")))
    val cents = Similarity.loadIvfCentroids(spark, idx)
    val c1 = (0 until cents.length).find(_ != c0).get
    val q = Seq((999L, cents(c1).toSeq)).toDF("id", "v") // cell c1's own centroid
    def probe(minCand: Int) =
      Similarity.ivfTopKIndexed(q, "id", "v", idx, k = 3, nprobe = 1,
          filter = Some(col("category") === 1), minCandidates = minCand)
        .collect().map(r => (r.getLong(1), r.getInt(3))).sorted.toSeq
    // the r18 behavior this feature exists to fix: fixed nprobe=1 probes
    // cell c1 only, which holds NO category-1 rows — zero answers, no
    // error (the silent thin-shortlist failure)
    assert(probe(0) === Seq.empty,
      s"nprobe=1 from cell $c1's centroid must see no category-1 (cell $c0) rows")
    // minCandidates=k doubles nprobe until the rare cell is probed:
    // answers == brute force over the filtered corpus
    val want = Similarity.bruteForceTopK(q, "id", "v",
        df.filter(col("id").isin(rare.toSeq: _*)), "id", "v", k = 3)
      .collect().map(r => (r.getLong(1), r.getInt(3))).sorted.toSeq
    assert(probe(3) === want,
      "minCandidates must widen the probe until the filtered corpus is reachable")
    // a predicate matching NOTHING terminates (widen caps at nlist) and
    // returns empty rather than looping
    assert(Similarity.ivfTopKIndexed(q, "id", "v", idx, k = 3, nprobe = 1,
      filter = Some(col("category") === 9), minCandidates = 3).count() === 0L)
  }
}
