package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The resident-layer MINOR compaction's contract (r16): each fold adds
  * ≤ spread-bound files per cell to `ingest_batch=-1`, and a STATIONARY
  * stream — which never trips the drift trigger — previously had only an
  * O(corpus + retraining) rebuild as the flattening remedy.
  * [[Similarity.compactIvfResident]] / [[Pq.compactPqResident]] rewrite
  * ONLY the cells whose `-1` file count exceeds the bound: under-bound
  * cells' files stay byte-untouched, answers never change, a crash at
  * any point rolls back or forward through the same marker protocol as
  * the fold, and cost follows the ACCRUED cells (the skewed-ingest
  * fixture pins that only the hot cell is rewritten). */
class ResidentCompactionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("resident-compaction-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def vec(seed: Int): Seq[Double] = {
    val r = new scala.util.Random(seed)
    Seq.fill(6)(r.nextGaussian())
  }

  private def mkCorpus(ids: Range) = {
    val s = spark
    import s.implicits._
    ids.map(i => (i.toLong, vec(i))).toDF("id", "v")
  }

  /** Rows that provably assign to centroid `cell` of the stored index:
    * the centroid direction plus tiny noise — the skewed-ingest shape
    * that accrues fold files in ONE cell while the others stay cold. */
  private def nearCellBatch(idx: String, cell: Int, ids: Range) = {
    val c = Similarity.loadIvfCentroids(spark, idx)(cell)
    val s = spark
    import s.implicits._
    ids.map { i =>
      val r = new scala.util.Random(i)
      (i.toLong, c.toSeq.map(x => x + 0.01 * r.nextGaussian()))
    }.toDF("id", "v")
  }

  private def residentFiles(corpus: String): Map[String, (Long, Long)] = {
    val root = new java.io.File(corpus)
    (for {
      cell <- root.listFiles().toSeq if cell.isDirectory && cell.getName.startsWith("cell=")
      leaf <- cell.listFiles().toSeq if leaf.isDirectory && leaf.getName == "ingest_batch=-1"
      f <- leaf.listFiles().toSeq if f.isFile && f.getName.endsWith(".parquet")
    } yield s"${cell.getName}/${f.getName}" -> ((f.length(), f.lastModified()))).toMap
  }

  private def ask(idx: String) = Similarity.ivfTopKIndexed(
    mkCorpus(300 until 303), "id", "v", idx, k = 4, nprobe = 4)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    .sortBy(x => (x._1, x._4)).toSeq

  /** Build at spreadFiles=1, then run `folds` append+fold cycles whose
    * rows all land in cell 0 — the hot cell accrues 1 + folds resident
    * files while every other cell keeps its single build file. */
  private def skewedAccrual(tag: String, folds: Int): (String, String) = {
    val base = Files.createTempDirectory(tag).toString
    val idx = s"$base/idx"
    Similarity.writeIvfIndex(mkCorpus(0 until 80), "id", "v", idx,
      nlist = 4, iters = 4, spreadFiles = 1)
    val cents = Similarity.loadIvfCentroids(spark, idx)
    for (b <- 0 until folds) {
      Similarity.appendIvfIndexIdempotent(
        nearCellBatch(idx, 0, (1000 + 10 * b) until (1010 + 10 * b)),
        "id", "v", idx, cents, b.toLong, spreadFiles = 1)
      Similarity.compactIvfIndex(spark, idx, committedBatchId = b.toLong, spreadFiles = 1)
    }
    (base, idx)
  }

  test("only over-bound cells are rewritten; cold cells byte-untouched; answers identical") {
    val (_, idx) = skewedAccrual("rcmain", folds = 3)
    val layout0 = Similarity.ivfIndexLayout(spark, idx)
    assert(layout0.maxResidentFilesPerCell === 4,
      s"hot cell must carry build + 3 fold files: $layout0")
    val answers = ask(idx)
    val before = residentFiles(s"$idx/corpus")
    val count = spark.read.parquet(s"$idx/corpus").count()

    val compacted = Similarity.compactIvfResident(spark, idx,
      maxFilesPerCell = 2, spreadFiles = 1)
    assert(compacted === 1, s"only the hot cell exceeds the bound: $compacted")

    val after = residentFiles(s"$idx/corpus")
    // every cold cell's file is still there, byte-for-byte untouched
    before.filterNot { case (rel, _) => rel.startsWith("cell=0/") }
      .foreach { case (rel, meta) =>
        assert(after.get(rel).contains(meta),
          s"compaction touched cold-cell file $rel: was $meta, now ${after.get(rel)}")
      }
    // the hot cell collapsed to one spread-bound's worth of rc- files
    val hot = after.keySet.filter(_.startsWith("cell=0/"))
    assert(hot.size === 1, s"hot cell must be back under spreadFiles=1: $hot")
    assert(hot.forall(_.split("/").last.startsWith("rc-")), s"unexpected names: $hot")
    assert(before.keySet.filter(_.startsWith("cell=0/")).forall(r => !after.contains(r)),
      "the hot cell's accrued originals must be gone")
    assert(ask(idx) === answers)
    assert(spark.read.parquet(s"$idx/corpus").count() === count)
    // no debris survives a clean compaction; a repeat finds nothing over bound
    assert(Similarity.recoverIvfFold(spark, idx).isEmpty)
    assert(Similarity.compactIvfResident(spark, idx, maxFilesPerCell = 2, spreadFiles = 1) === 0)
    assert(residentFiles(s"$idx/corpus") === after)
  }

  test("default threshold is 2x the spread bound: one fold's accrual tolerated, two compacts") {
    val (_, idx) = skewedAccrual("rcthresh", folds = 2)
    // hot cell: 1 build + 2 folds = 3 files > 2*spreadFiles(1) -> compacts
    assert(Similarity.compactIvfResident(spark, idx, spreadFiles = 1) === 1)
    // after flattening: 1 file everywhere; another single fold (2 files)
    // stays inside the tolerated accrual at the default threshold
    val cents = Similarity.loadIvfCentroids(spark, idx)
    Similarity.appendIvfIndexIdempotent(nearCellBatch(idx, 0, 2000 until 2010),
      "id", "v", idx, cents, 7L, spreadFiles = 1)
    Similarity.compactIvfIndex(spark, idx, committedBatchId = 7L, spreadFiles = 1)
    assert(Similarity.compactIvfResident(spark, idx, spreadFiles = 1) === 0)
  }

  test("crash before commit rolls back exactly; crash after commit rolls forward") {
    val (_, idx) = skewedAccrual("rccrash", folds = 3)
    val answers = ask(idx)
    val before = residentFiles(s"$idx/corpus")

    IndexMaintenance.failpoint = Some("before-commit")
    try intercept[RuntimeException] {
      Similarity.compactIvfResident(spark, idx, maxFilesPerCell = 2, spreadFiles = 1)
    } finally IndexMaintenance.failpoint = None
    // debris blocks appends until recovered (same guard as the fold)
    val cents = Similarity.loadIvfCentroids(spark, idx)
    val e = intercept[IllegalStateException] {
      Similarity.appendIvfIndexIdempotent(mkCorpus(400 until 404), "id", "v", idx, cents, 9L)
    }
    assert(e.getMessage.contains("recover"), e.getMessage)
    val back = Similarity.recoverIvfFold(spark, idx)
    assert(back.exists(_.contains("BACK")), s"expected rollback, got $back")
    assert(residentFiles(s"$idx/corpus") === before,
      "rollback must restore the -1 layer exactly (originals were never touched)")
    assert(ask(idx) === answers)

    IndexMaintenance.failpoint = Some("before-cleanup")
    try intercept[RuntimeException] {
      Similarity.compactIvfResident(spark, idx, maxFilesPerCell = 2, spreadFiles = 1)
    } finally IndexMaintenance.failpoint = None
    val fwd = Similarity.recoverIvfFold(spark, idx)
    assert(fwd.exists(m => m.contains("FORWARD") && m.contains("resident")),
      s"expected roll-forward of replaced resident files, got $fwd")
    val after = residentFiles(s"$idx/corpus")
    assert(after.keySet.filter(_.startsWith("cell=0/")).size === 1,
      s"roll-forward must finish the hot cell's rewrite: ${after.keySet}")
    assert(ask(idx) === answers)
    assert(Similarity.recoverIvfFold(spark, idx).isEmpty)
  }

  test("maintenanceAdvice: precedence across the lifecycle states, remedies clear it in order") {
    val (_, idx) = skewedAccrual("rcadvice", folds = 3)
    // hot cell carries 4 resident files > the derived bound 2, no
    // unfolded leaves -> compact-resident
    val a0 = Similarity.maintenanceAdvice(spark, idx, spreadFiles = 1)
    assert(a0.action === "compact-resident", a0.toString)
    assert(a0.reason.contains("4 resident files"), a0.reason)
    // drift outranks every layout signal (a rebuild flattens too)
    assert(Similarity.maintenanceAdvice(spark, idx, driftTripped = true,
      spreadFiles = 1).action === "rebuild")
    // land 3 unfolded all-cell batches: leaves exceed 2/cell -> fold
    // outranks the still-present resident accrual
    val cents = Similarity.loadIvfCentroids(spark, idx)
    for (b <- 10 to 12)
      Similarity.appendIvfIndexIdempotent(mkCorpus((3000 + 100 * b) until (3040 + 100 * b)),
        "id", "v", idx, cents, b.toLong, spreadFiles = 1)
    val a1 = Similarity.maintenanceAdvice(spark, idx, spreadFiles = 1)
    assert(a1.action === "fold", a1.toString)
    // apply the remedies in the advised order; each clears its signal
    Similarity.compactIvfIndex(spark, idx, committedBatchId = 12L, spreadFiles = 1)
    val a2 = Similarity.maintenanceAdvice(spark, idx, spreadFiles = 1)
    assert(a2.action === "compact-resident", a2.toString)
    Similarity.compactIvfResident(spark, idx, spreadFiles = 1)
    val a3 = Similarity.maintenanceAdvice(spark, idx, spreadFiles = 1)
    assert(a3.action === "none", a3.toString)
    assert(a3.reason.contains("healthy"), a3.reason)
    // tombstones enter the precedence (r17): under the tolerated count
    // they are free; over it the advice is purge-deletes — unless
    // leaves exist, in which case fold is the actionable step (the
    // purge requires a folded index); the purge clears the signal
    Similarity.deleteFromIvfIndex(mkCorpus(0 until 5).select("id"), idx)
    assert(Similarity.maintenanceAdvice(spark, idx, spreadFiles = 1)
      .action === "none", "5 tombstones are under the default tolerance")
    val a4 = Similarity.maintenanceAdvice(spark, idx, spreadFiles = 1,
      maxTombstones = 3)
    assert(a4.action === "purge-deletes", a4.toString)
    Similarity.appendIvfIndexIdempotent(mkCorpus(5000 until 5040),
      "id", "v", idx, cents, 13L, spreadFiles = 1)
    // r18: the fold-first redirect is PRECISE — a lane holding only
    // LIVE ids does not block the purge (the r17 batchLeaves==0 proxy
    // made the purge advice structurally un-actionable under a live
    // stream, whose current batch is always unfolded)...
    val a5 = Similarity.maintenanceAdvice(spark, idx, spreadFiles = 1,
      maxTombstones = 3)
    assert(a5.action === "purge-deletes", a5.toString)
    // ...while a TOMBSTONED row in an unfolded lane still redirects
    Similarity.deleteFromIvfIndex(mkCorpus(5000 until 5001).select("id"), idx)
    val a6 = Similarity.maintenanceAdvice(spark, idx, spreadFiles = 1,
      maxTombstones = 3)
    assert(a6.action === "fold" && a6.reason.contains("unfolded"), a6.toString)
    Similarity.compactIvfIndex(spark, idx, committedBatchId = 13L, spreadFiles = 1)
    Similarity.purgeIvfDeletes(spark, idx, spreadFiles = 1)
    assert(Similarity.maintenanceAdvice(spark, idx, spreadFiles = 1,
      maxTombstones = 3).action === "none")
  }

  test("maintenanceAdvice PQ twin: worse-of-both-tables, remedies clear in order") {
    val s = spark
    import s.implicits._
    val gen = org.apache.spark.sql.functions.udf(
      (id: Long) => graft.tools.EmbedSynth.vector(id, 16, 4, 0.3))
    val df = spark.range(200).select(col("id").as("vec_id"), gen(col("id")).as("e"))
    val base = Files.createTempDirectory("rcpqadv").toString
    val idx = s"$base/idx"
    Pq.writePqIndex(df, "vec_id", "e", idx, nlist = 4, m = 4, ksub = 16, spreadFiles = 1)
    assert(Pq.maintenanceAdvice(spark, idx, spreadFiles = 1).action === "none")
    for (b <- 0 until 3)
      Pq.appendPqIndexIdempotent(
        spark.range(300 + 40 * b, 340 + 40 * b)
          .select(col("id").as("vec_id"), gen(col("id")).as("e")),
        "vec_id", "e", idx, b.toLong, spreadFiles = 1)
    assert(Pq.maintenanceAdvice(spark, idx, spreadFiles = 1).action === "fold")
    assert(Pq.maintenanceAdvice(spark, idx, driftTripped = true,
      spreadFiles = 1).action === "rebuild")
    Pq.compactPqIndex(spark, idx, committedBatchId = 2L, spreadFiles = 1)
    // one fold's accrual (2 files/cell) sits exactly at the tolerated
    // default bound -> healthy; tightening the bound to 1 surfaces the
    // accrual as compact-resident, and the remedy clears it
    assert(Pq.maintenanceAdvice(spark, idx, spreadFiles = 1).action === "none")
    assert(Pq.maintenanceAdvice(spark, idx, maxFilesPerCell = 1,
      spreadFiles = 1).action === "compact-resident")
    Pq.compactPqResident(spark, idx, maxFilesPerCell = 1, spreadFiles = 1)
    assert(Pq.maintenanceAdvice(spark, idx, maxFilesPerCell = 1,
      spreadFiles = 1).action === "none")
  }

  test("PQ twin: both tables compact, answers and counts preserved, bound restored") {
    val s = spark
    import s.implicits._
    val gen = org.apache.spark.sql.functions.udf(
      (id: Long) => graft.tools.EmbedSynth.vector(id, 16, 4, 0.3))
    val df = spark.range(200).select(col("id").as("vec_id"), gen(col("id")).as("e"))
    val base = Files.createTempDirectory("rcpq").toString
    val idx = s"$base/idx"
    Pq.writePqIndex(df, "vec_id", "e", idx, nlist = 4, m = 4, ksub = 16, spreadFiles = 1)
    // two append+fold cycles: every cell may accrue up to 2 fold files
    for (b <- 0 until 2) {
      Pq.appendPqIndexIdempotent(
        spark.range(300 + 20 * b, 320 + 20 * b)
          .select(col("id").as("vec_id"), gen(col("id")).as("e")),
        "vec_id", "e", idx, b.toLong, spreadFiles = 1)
      Pq.compactPqIndex(spark, idx, committedBatchId = b.toLong, spreadFiles = 1)
    }
    val q = df.filter(col("vec_id") < 3)
    def pqAsk() = Pq.pqTopKIndexed(q, "vec_id", "e", idx, k = 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(x => (x._1, x._4)).toSeq
    val answers = pqAsk()
    val counts = Seq("codes", "vectors").map(t => spark.read.parquet(s"$idx/$t").count())

    val (nc, nv) = Pq.compactPqResident(spark, idx, maxFilesPerCell = 1, spreadFiles = 1)
    assert(nc > 0 && nv > 0, s"accrued cells must compact in both tables: ($nc, $nv)")
    assert(pqAsk() === answers)
    assert(Seq("codes", "vectors").map(t => spark.read.parquet(s"$idx/$t").count()) === counts)
    val (codesL, vecsL) = Pq.pqIndexLayout(spark, idx)
    assert(codesL.maxResidentFilesPerCell <= 1 && vecsL.maxResidentFilesPerCell <= 1,
      s"bound restored: $codesL / $vecsL")
    assert(Pq.recoverPqFold(spark, idx).isEmpty)
    assert(Pq.compactPqResident(spark, idx, maxFilesPerCell = 1, spreadFiles = 1) === ((0, 0)))
  }
}
