package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The lexical index as a FIRST-CLASS index family (r16): the BM25
  * postings table carries the same two-level `bucket=/ingest_batch=`
  * layout as the ANN corpus tables, so the whole IndexMaintenance
  * machinery covers it — replay-idempotent keyed appends (postings via
  * dynamic overwrite; the stats delta via the `last_batch` watermark),
  * incremental fold, resident compaction, crash recovery, layout
  * stats/advice, and the streamed ingest skeleton. These specs pin the
  * lexical WIRING; the machinery itself is pinned by
  * IndexMaintenanceSpec / ResidentCompactionSpec. */
class Bm25IndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("bm25-index-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val vocab = Vector("spark", "vector", "stream", "data", "index",
    "query", "fold", "probe", "batch")

  private def docs(lo: Long, hi: Long): DataFrame = {
    val s = spark
    import s.implicits._
    (lo until hi).map { id =>
      val r = new scala.util.Random(id)
      (id, Seq.fill(4 + r.nextInt(18))(vocab(r.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def ask(p: String, terms: Seq[String] = Seq("spark", "vector")) =
    Curation.bm25SearchIndexed(spark, p, terms, topK = 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq

  test("keyed appends are exactly-once through replay and fold; answers == all-at-once") {
    val base = Files.createTempDirectory("bmkeyed").toString
    val idx = s"$base/idx"; val whole = s"$base/whole"
    Curation.writeBm25Index(docs(0, 100), "doc_id", "text", idx, buckets = 8)
    Curation.appendBm25IndexIdempotent(docs(100, 150), "doc_id", "text", idx, 0L)
    Curation.appendBm25IndexIdempotent(docs(150, 200), "doc_id", "text", idx, 1L)
    // crash-replay of batch 1: postings overwrite their own leaves, the
    // stats watermark skips the already-applied delta
    Curation.appendBm25IndexIdempotent(docs(150, 200), "doc_id", "text", idx, 1L)
    Curation.writeBm25Index(docs(0, 200), "doc_id", "text", whole, buckets = 8)
    assert(ask(idx) === ask(whole), "keyed+replayed must equal all-at-once")
    // fold the committed batch; batch 1 keeps its keys (replay safety)
    Curation.compactBm25Index(spark, idx, committedBatchId = 0L)
    val layout = Curation.bm25IndexLayout(spark, idx)
    assert(layout.maxBatchId === 1L, layout.toString)
    assert(ask(idx) === ask(whole), "fold must change nothing")
    // replay batch 1 once more AFTER the fold — still exactly-once
    Curation.appendBm25IndexIdempotent(docs(150, 200), "doc_id", "text", idx, 1L)
    assert(ask(idx) === ask(whole))
    val st = spark.read.parquet(s"$idx/stats").collect()(0)
    assert(st.getLong(0) === 200L, s"n_docs must count each doc once: $st")
  }

  test("crash mid-fold: debris blocks, recoverBm25Index heals, answers unchanged") {
    val base = Files.createTempDirectory("bmcrash").toString
    val idx = s"$base/idx"
    Curation.writeBm25Index(docs(0, 100), "doc_id", "text", idx, buckets = 8)
    Curation.appendBm25IndexIdempotent(docs(100, 140), "doc_id", "text", idx, 0L)
    val answers = ask(idx)
    IndexMaintenance.failpoint = Some("before-commit")
    try intercept[RuntimeException] {
      Curation.compactBm25Index(spark, idx, committedBatchId = 0L)
    } finally IndexMaintenance.failpoint = None
    val e = intercept[IllegalStateException] {
      Curation.appendBm25IndexIdempotent(docs(140, 150), "doc_id", "text", idx, 1L)
    }
    assert(e.getMessage.contains("recover"), e.getMessage)
    assert(Curation.recoverBm25Index(spark, idx).exists(_.contains("BACK")))
    assert(ask(idx) === answers)
    // ... and the fold then completes; roll-forward path too
    IndexMaintenance.failpoint = Some("before-cleanup")
    try intercept[RuntimeException] {
      Curation.compactBm25Index(spark, idx, committedBatchId = 0L)
    } finally IndexMaintenance.failpoint = None
    assert(Curation.recoverBm25Index(spark, idx).exists(_.contains("FORWARD")))
    assert(ask(idx) === answers)
    assert(Curation.recoverBm25Index(spark, idx).isEmpty)
  }

  test("resident compaction + advice: accrued buckets flatten, answers unchanged") {
    val base = Files.createTempDirectory("bmres").toString
    val idx = s"$base/idx"
    Curation.writeBm25Index(docs(0, 100), "doc_id", "text", idx, buckets = 4)
    // three keyed append+fold cycles accrue resident files per bucket
    for (b <- 0 until 3) {
      Curation.appendBm25IndexIdempotent(
        docs(100 + 30 * b, 130 + 30 * b), "doc_id", "text", idx, b.toLong)
      Curation.compactBm25Index(spark, idx, committedBatchId = b.toLong)
    }
    val answers = ask(idx)
    // local[4] at 4 buckets derives spread S=2, bound 2S=4; 1 build + 3
    // folds can reach 7 files (build itself may write up to S) — over
    assert(Curation.bm25MaintenanceAdvice(spark, idx, maxFilesPerBucket = 2)
      .action === "compact-resident")
    val n = Curation.compactBm25Resident(spark, idx, maxFilesPerBucket = 2)
    assert(n > 0)
    assert(Curation.bm25MaintenanceAdvice(spark, idx, maxFilesPerBucket = 2)
      .action === "none")
    assert(ask(idx) === answers)
  }

  test("manual append crash between its two writes: detected via the lane watermark, auto-healed from the orphan lane's rows") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("bmmanual").toString
    val idx = s"$base/idx"; val whole = s"$base/whole"
    Curation.writeBm25Index(docs(0, 100), "doc_id", "text", idx, buckets = 8)
    val preAppend = spark.read.parquet(s"$idx/stats").collect()(0)
    Curation.appendBm25Index(docs(100, 150), "doc_id", "text", idx)
    Curation.writeBm25Index(docs(0, 150), "doc_id", "text", whole, buckets = 8)
    assert(ask(idx) === ask(whole))
    def crashState(): Unit =
      // reconstruct the crash between the two writes: postings lane
      // applied, stats not — put the pre-append stats row back (the
      // lane watermark now lags the lane on disk)
      Seq((preAppend.getLong(0), preAppend.getLong(1), preAppend.getInt(2),
        preAppend.getLong(3), preAppend.getLong(4)))
        .toDF("n_docs", "sum_dl", "buckets", "last_batch", "last_manual")
        .coalesce(1).write.mode("overwrite").parquet(s"$idx/stats")
    // remedy 1: RETRY the failed append — the un-advanced watermark
    // yields the SAME auto lane id, so the postings overwrite their own
    // leaves and the stats delta applies exactly once
    crashState()
    Curation.appendBm25Index(docs(100, 150), "doc_id", "text", idx)
    assert(ask(idx) === ask(whole), "retry-after-crash must be idempotent")
    // remedy 2: recovery recomputes the lagging delta from the lane
    crashState()
    val healed = Curation.recoverBm25Index(spark, idx)
    assert(healed.exists(_.contains("manual")), s"got $healed")
    def stats(p: String) = spark.read.parquet(s"$p/stats")
      .select("n_docs", "sum_dl", "buckets").collect()(0)
    assert(stats(idx) === stats(whole),
      "recovery must recompute the lagging delta exactly from the orphan lane")
    assert(ask(idx) === ask(whole))
    assert(Curation.recoverBm25Index(spark, idx).isEmpty, "recovery is idempotent")
    // remedy 3: the fold self-heals the same state before folding
    crashState()
    Curation.compactBm25Index(spark, idx, committedBatchId = Long.MaxValue)
    assert(stats(idx) === stats(whole))
    assert(ask(idx) === ask(whole), "fold after heal must change nothing")
  }

  test("manual append crash followed by a DIFFERENT batch: the orphan is adopted, never overwritten") {
    // The r16 verdict's weak edge: nothing ENFORCED recovery, so a
    // different manual append after a crash reused the orphan's lane id
    // and dynamic overwrite destroyed the orphan's postings in exactly
    // the buckets the new batch touched — silent score corruption. The
    // append now fingerprints the incoming id set against the orphan's:
    // mismatch → adopt the orphan (its postings are complete) and take
    // a fresh lane.
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("bmdiff").toString
    val idx = s"$base/idx"; val whole = s"$base/whole"
    Curation.writeBm25Index(docs(0, 100), "doc_id", "text", idx, buckets = 8)
    val preAppend = spark.read.parquet(s"$idx/stats").collect()(0)
    Curation.appendBm25Index(docs(100, 150), "doc_id", "text", idx)
    // reconstruct the crash between the append's two writes: postings
    // lane applied, stats not
    Seq((preAppend.getLong(0), preAppend.getLong(1), preAppend.getInt(2),
      preAppend.getLong(3), preAppend.getLong(4)))
      .toDF("n_docs", "sum_dl", "buckets", "last_batch", "last_manual")
      .coalesce(1).write.mode("overwrite").parquet(s"$idx/stats")
    // the operator moves on with a DIFFERENT batch — no recovery call
    Curation.appendBm25Index(docs(150, 180), "doc_id", "text", idx)
    Curation.writeBm25Index(docs(0, 180), "doc_id", "text", whole, buckets = 8)
    val st = spark.read.parquet(s"$idx/stats")
      .select("n_docs", "sum_dl").collect()(0)
    val stWhole = spark.read.parquet(s"$whole/stats")
      .select("n_docs", "sum_dl").collect()(0)
    assert(st === stWhole,
      "the orphan's stats delta must be adopted, the new batch's applied once")
    assert(ask(idx) === ask(whole),
      "the orphan batch's posting lists must be intact (different lane, no overwrite)")
    // two distinct manual lanes on disk: the orphan's and the new batch's
    val layout = Curation.bm25IndexLayout(spark, idx)
    assert(layout.maxBatchId === Curation.ManualLaneFloor + 1, layout.toString)
    assert(Curation.recoverBm25Index(spark, idx).isEmpty,
      "nothing left to heal — the append adopted the orphan itself")
  }

  test("two crashed manual appends, then a retry of the second: own lane reused, the first adopted below it (r18)") {
    // r17 matched fingerprints only with exactly ONE orphan; with two,
    // a retry adopted both (applying the retried batch's stats delta as
    // an "orphan") and then landed the batch AGAIN under a fresh lane —
    // duplicate posting lists. Every orphan is fingerprinted now, and
    // orphans BELOW the reused lane are adopted in one atomic stats
    // write (delta + watermark together — no double-count window).
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("bmmulti").toString
    val idx = s"$base/idx"; val whole = s"$base/whole"
    Curation.writeBm25Index(docs(0, 100), "doc_id", "text", idx, buckets = 8)
    val preAppend = spark.read.parquet(s"$idx/stats").collect()(0)
    Curation.appendBm25Index(docs(100, 150), "doc_id", "text", idx) // lane floor
    Curation.appendBm25Index(docs(150, 180), "doc_id", "text", idx) // lane floor+1
    // reconstruct BOTH appends crashing between their two writes:
    // postings lanes applied, neither stats delta
    Seq((preAppend.getLong(0), preAppend.getLong(1), preAppend.getInt(2),
      preAppend.getLong(3), preAppend.getLong(4)))
      .toDF("n_docs", "sum_dl", "buckets", "last_batch", "last_manual")
      .coalesce(1).write.mode("overwrite").parquet(s"$idx/stats")
    // retry of the SECOND batch: reuse lane floor+1, adopt lane floor
    Curation.appendBm25Index(docs(150, 180), "doc_id", "text", idx)
    Curation.writeBm25Index(docs(0, 180), "doc_id", "text", whole, buckets = 8)
    val st = spark.read.parquet(s"$idx/stats").select("n_docs", "sum_dl").collect()(0)
    val stWhole = spark.read.parquet(s"$whole/stats").select("n_docs", "sum_dl").collect()(0)
    assert(st === stWhole,
      "first orphan adopted once, retried batch applied once — no double count")
    assert(ask(idx) === ask(whole))
    assert(Curation.bm25IndexLayout(spark, idx).maxBatchId === Curation.ManualLaneFloor + 1,
      "the retry must reuse its own lane, not land again under a fresh one")
    assert(Curation.recoverBm25Index(spark, idx).isEmpty, "nothing left to heal")
  }

  test("streamed lexical lane vs deletion: a committed replay passes the tombstone guard; a fresh batch re-adding the id refuses (r18)") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("bmreplaydel").toString
    val idx = s"$base/idx"; val whole = s"$base/whole"
    Curation.writeBm25Index(docs(0, 100), "doc_id", "text", idx, buckets = 8)
    Curation.appendBm25IndexIdempotent(docs(100, 130), "doc_id", "text", idx, batchId = 0L)
    Curation.deleteFromBm25Index(Seq(105L).toDF("id"), idx)
    // write committed, checkpoint didn't -> the re-delivered batch must
    // pass (self-overwrite; stats skip via the last_batch watermark),
    // not wedge the stream on the tombstone guard
    Curation.appendBm25IndexIdempotent(docs(100, 130), "doc_id", "text", idx, batchId = 0L)
    Curation.writeBm25Index(docs(0, 130).filter(col("doc_id") =!= 105L),
      "doc_id", "text", whole, buckets = 8)
    assert(ask(idx) === ask(whole),
      "replay is exactly-once and the deleted doc stays hidden")
    // a genuinely FRESH batch re-appending the deleted id still refuses
    val fresh = intercept[IllegalArgumentException] {
      Curation.appendBm25IndexIdempotent(docs(105, 106), "doc_id", "text", idx, batchId = 1L)
    }
    assert(fresh.getMessage.contains("tombstone"), fresh.getMessage)
    val manual = intercept[IllegalArgumentException] {
      Curation.appendBm25Index(docs(105, 106), "doc_id", "text", idx)
    }
    assert(manual.getMessage.contains("tombstone"), manual.getMessage)
  }

  test("edge guards: an all-null-text batch appends without NPE; an empty index probes loudly") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("bmedge").toString
    val idx = s"$base/idx"; val whole = s"$base/whole"
    Curation.writeBm25Index(docs(0, 50), "doc_id", "text", idx, buckets = 4)
    // null texts tokenize to nothing: they count in n_docs (the
    // documented zero-token epsilon) and add no postings — the append
    // must apply the same null-sum guard the build does, not NPE
    val nulls = Seq((900L, null: String), (901L, null: String)).toDF("doc_id", "text")
    Curation.appendBm25Index(nulls, "doc_id", "text", idx)
    Curation.writeBm25Index(docs(0, 50).union(nulls), "doc_id", "text", whole, buckets = 4)
    val st = spark.read.parquet(s"$idx/stats").collect()(0)
    assert(st.getLong(0) === 52L, s"n_docs must count the null-text docs: $st")
    assert(ask(idx) === ask(whole), "append of null texts must equal all-at-once")
    // an empty index (n_docs = 0) must refuse the probe, not emit NaN scores
    val empty = s"$base/empty"
    Curation.writeBm25Index(docs(0, 50).filter(col("doc_id") < 0),
      "doc_id", "text", empty, buckets = 4)
    val e = intercept[IllegalArgumentException] {
      Curation.bm25SearchIndexed(spark, empty, Seq("spark"))
    }
    assert(e.getMessage.contains("n_docs"), e.getMessage)
  }

  test("bm25SearchIndexedMany: one pruned pass answers every query exactly like the per-query path") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("bmmany").toString
    val idx = s"$base/idx"
    Curation.writeBm25Index(docs(0, 150), "doc_id", "text", idx, buckets = 8)
    val batch = Seq(
      (0L, Seq("spark", "vector")),
      (1L, Seq("index", "fold", "zzmissing")), // an absent term contributes nothing
      (2L, Seq("batch", "batch", "probe")))    // duplicate terms collapse (term sets)
    val many = Curation.bm25SearchIndexedMany(spark, idx,
      batch.toDF("query_id", "terms"), topK = 7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getInt(4)))
    assert(many.map(_._1).distinct.sorted === Array(0L, 1L, 2L))
    for ((qid, terms) <- batch) {
      val single = Curation.bm25SearchIndexed(spark, idx, terms, topK = 7).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      val mine = many.filter(_._1 == qid).sortBy(_._5).map(t => (t._2, t._3, t._4))
      assert(mine.toSeq === single.toSeq, s"query $qid diverged from the per-query path")
    }
    // rank is contiguous from 1 within each query
    for (qid <- Seq(0L, 1L, 2L))
      assert(many.filter(_._1 == qid).map(_._5).sorted.toSeq ===
        (1 to many.count(_._1 == qid)).toSeq)
  }

  test("spreadFiles pins the per-bucket write fan-out across the whole lifecycle") {
    // r17: the ANN writers got explicit spreadFiles pinning in r15 so
    // layouts reproduce across differently-sized sessions; the lexical
    // writer/appenders/compactors derive from defaultParallelism unless
    // pinned — thread the same knob through and pin the fixed layout.
    val base = Files.createTempDirectory("bmspread").toString
    val idx = s"$base/idx"; val whole = s"$base/whole"
    def maxFilesPerLeaf(): Int = {
      val root = new java.io.File(s"$idx/postings")
      val counts = for {
        b <- root.listFiles().toSeq if b.isDirectory && b.getName.startsWith("bucket=")
        leaf <- b.listFiles().toSeq if leaf.isDirectory
      } yield leaf.listFiles().count(f => f.isFile && f.getName.endsWith(".parquet"))
      counts.max
    }
    Curation.writeBm25Index(docs(0, 100), "doc_id", "text", idx,
      buckets = 4, spreadFiles = 1)
    assert(maxFilesPerLeaf() === 1, "build must write exactly one file per bucket")
    Curation.appendBm25IndexIdempotent(docs(100, 130), "doc_id", "text", idx,
      0L, spreadFiles = 1)
    Curation.appendBm25Index(docs(130, 160), "doc_id", "text", idx, spreadFiles = 1)
    assert(maxFilesPerLeaf() === 1, "both append lanes must respect the pin")
    Curation.compactBm25Index(spark, idx, committedBatchId = 0L, spreadFiles = 1)
    // 1 build file + 1 fold file per bucket accrued; the pinned resident
    // compaction flattens back to the pin
    assert(Curation.compactBm25Resident(spark, idx,
      maxFilesPerBucket = 1, spreadFiles = 1) > 0)
    assert(maxFilesPerLeaf() === 1, "resident compaction must restore the pinned spread")
    Curation.writeBm25Index(docs(0, 160), "doc_id", "text", whole, buckets = 4)
    assert(ask(idx) === ask(whole), "the pin is layout-only — answers unchanged")
  }

  test("tombstoned deletes: probes equal an index built without the docs; purge reclaims bytes, answers unchanged") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("bmdel").toString
    val idx = s"$base/idx"; val whole = s"$base/whole"; val whole2 = s"$base/whole2"
    Curation.writeBm25Index(docs(0, 150), "doc_id", "text", idx, buckets = 8)
    val deleted = docs(0, 150).filter(pmod(col("doc_id"), lit(5)) === 2)
      .select(col("doc_id").as("id"))
    Curation.deleteFromBm25Index(deleted, idx)
    // scores must equal an index BUILT without the docs: tf, df, n_docs
    // and avgdl all adjust (idf/avgdl via the ledger aggregate)
    Curation.writeBm25Index(docs(0, 150).filter(pmod(col("doc_id"), lit(5)) =!= 2),
      "doc_id", "text", whole, buckets = 8)
    assert(ask(idx) === ask(whole), "delete must equal a rebuild without the docs")
    // double-delete is harmless (the ledger dedups)
    Curation.deleteFromBm25Index(deleted, idx)
    assert(ask(idx) === ask(whole))
    // re-appending a deleted id would be silently hidden by the ledger
    // — deletion is terminal until a rebuild, and the append says so
    val eRe = intercept[IllegalArgumentException] {
      Curation.appendBm25Index(docs(0, 150)
        .filter(pmod(col("doc_id"), lit(5)) === 2), "doc_id", "text", idx)
    }
    assert(eRe.getMessage.contains("tombstone"), eRe.getMessage)
    // the batch probe honors tombstones through the same effective stats
    val many = Curation.bm25SearchIndexedMany(spark, idx,
      Seq((0L, Seq("spark", "vector"))).toDF("query_id", "terms"), topK = 15)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(many === ask(idx).toSeq)
    // purge refuses while a TOMBSTONED row sits in an unfolded lane (it
    // would survive the resident rewrite), then reclaims after the fold.
    // The gate is precise (r18): a lane with only live ids doesn't block
    Curation.appendBm25IndexIdempotent(docs(150, 160), "doc_id", "text", idx, 0L)
    Curation.deleteFromBm25Index(Seq(155L).toDF("id"), idx)
    val e = intercept[IllegalArgumentException] {
      Curation.purgeBm25Deletes(spark, idx)
    }
    assert(e.getMessage.contains("fold"), e.getMessage)
    Curation.compactBm25Index(spark, idx, committedBatchId = 0L)
    // advice (r17): folded + pending tombstones over the knob -> purge
    assert(Curation.bm25MaintenanceAdvice(spark, idx, maxTombstones = 5)
      .action === "purge-deletes")
    assert(Curation.purgeBm25Deletes(spark, idx) > 0)
    assert(Curation.bm25MaintenanceAdvice(spark, idx, maxTombstones = 5)
      .action === "none")
    // tombstoned rows are physically gone; answers unchanged — and the
    // ledger is RETIRED (r18): its aggregate now lives in the stats
    // row, so probes stop paying the broadcast anti-join forever
    assert(spark.read.parquet(s"$idx/postings")
      .join(deleted, Seq("id"), "left_semi").count() === 0L)
    val deletesDir = new java.io.File(s"$idx/deletes")
    assert(!deletesDir.exists() || deletesDir.listFiles()
      .forall(f => !f.getName.endsWith(".parquet")),
      "the fold must delete the folded ledger files")
    Curation.writeBm25Index(
      docs(0, 160).filter((col("doc_id") >= 150 || pmod(col("doc_id"), lit(5)) =!= 2)
        && col("doc_id") =!= 155L),
      "doc_id", "text", whole2, buckets = 8)
    assert(ask(idx) === ask(whole2), "purge must change nothing about answers")
    val stIdx = spark.read.parquet(s"$idx/stats").select("n_docs", "sum_dl").collect()(0)
    val stW2 = spark.read.parquet(s"$whole2/stats").select("n_docs", "sum_dl").collect()(0)
    assert(stIdx === stW2, "the fold must land the rebuild-without-docs stats exactly")
    // rerun: nothing left — no rewrite, no second subtraction
    assert(Curation.purgeBm25Deletes(spark, idx) === 0)
    assert(ask(idx) === ask(whole2), "a purge rerun must not double-subtract")
    // a purged id is re-appendable: the index state IS built-without-it
    // now (rows, sidecar and stats all agree), so deletion is terminal
    // only until a purge or rebuild (r18)
    Curation.appendBm25Index(docs(0, 150)
      .filter(pmod(col("doc_id"), lit(5)) === 2).union(docs(155, 156)),
      "doc_id", "text", idx)
    val whole3 = s"$base/whole3"
    Curation.writeBm25Index(docs(0, 160), "doc_id", "text", whole3, buckets = 8)
    assert(ask(idx) === ask(whole3),
      "re-append after purge must equal a fresh build over everything")
    // an IN-PLACE rebuild is the other documented ledger reset: stale
    // tombstones + the purge watermark would double-subtract from the
    // fresh stats and hide rebuilt docs (r17 review) — recreate a live
    // ledger first so the reset has something to reset
    Curation.deleteFromBm25Index(deleted.limit(3), idx)
    Curation.writeBm25Index(docs(0, 160), "doc_id", "text", idx, buckets = 8)
    Curation.writeBm25Index(docs(0, 160), "doc_id", "text", s"$base/fresh", buckets = 8)
    assert(ask(idx) === ask(s"$base/fresh"),
      "in-place rebuild must reset the ledger and the purge watermark")
  }

  test("zero-token deletes adjust n_docs exactly and fold through a rewrite-free purge (r18)") {
    // r17 recovered dl from the doc's own postings rows, so deleting a
    // zero-token doc was a silent no-op and n_docs overcounted (the
    // documented epsilon). The doclen sidecar records dl = 0 rows, so
    // the delete adjusts stats exactly — and the purge folds a ledger
    // whose ids have NO postings rows (0 buckets rewritten) instead of
    // keeping it forever.
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("bmzero").toString
    val idx = s"$base/idx"; val whole = s"$base/whole"
    val empties = Seq((1000L, ""), (1001L, ""), (1002L, "")).toDF("doc_id", "text")
    Curation.writeBm25Index(docs(0, 60).union(empties), "doc_id", "text", idx, buckets = 8)
    Curation.writeBm25Index(docs(0, 60), "doc_id", "text", whole, buckets = 8)
    Curation.deleteFromBm25Index(Seq(1000L, 1001L, 1002L).toDF("id"), idx)
    assert(ask(idx) === ask(whole),
      "zero-token deletes must adjust n_docs (the r17 epsilon, closed by the sidecar)")
    assert(Curation.purgeBm25Deletes(spark, idx) === 0,
      "no postings rows to rewrite")
    def st(p: String) = spark.read.parquet(s"$p/stats")
      .select("n_docs", "sum_dl").collect()(0)
    assert(st(idx) === st(whole), "the fold must land rebuild-without-docs stats")
    assert(ask(idx) === ask(whole))
    val deletesDir = new java.io.File(s"$idx/deletes")
    assert(!deletesDir.exists() || deletesDir.listFiles()
      .forall(f => !f.getName.endsWith(".parquet")), "ledger retired")
  }

  test("backfillBm25Doclens upgrades a pre-r18 index: one postings pass, then deletes ride the sidecar (r18)") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("bmbackfill").toString
    val idx = s"$base/idx"; val whole = s"$base/whole"
    Curation.writeBm25Index(docs(0, 120), "doc_id", "text", idx, buckets = 8)
    // simulate a pre-r18 index: drop the sidecar the build wrote
    def rmr(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmr); f.delete(); ()
    }
    rmr(new java.io.File(s"$idx/doclens"))
    assert(Curation.backfillBm25Doclens(spark, idx), "missing sidecar -> backfill")
    assert(!Curation.backfillBm25Doclens(spark, idx), "present sidecar -> no-op")
    // the backfilled sidecar equals what the build would have written
    // (postings-visible docs only), and deletes ride it exactly
    Curation.deleteFromBm25Index(
      docs(0, 120).filter(pmod(col("doc_id"), lit(6)) === 1)
        .select(col("doc_id").as("id")), idx)
    Curation.writeBm25Index(
      docs(0, 120).filter(pmod(col("doc_id"), lit(6)) =!= 1),
      "doc_id", "text", whole, buckets = 8)
    assert(ask(idx) === ask(whole),
      "deletes off the backfilled sidecar must equal a rebuild without the docs")
  }

  test("allowlist-filtered search: candidates restricted, stats stay corpus-global (r18)") {
    // the Lucene filter-query contract, distinct from deletion: an
    // allowlist changes WHICH docs rank, never HOW they score — idf and
    // avgdl stay the whole corpus's (a tenant's search is ranked by
    // global term statistics, not as if the rest of the corpus vanished)
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("bmallow").toString
    val idx = s"$base/idx"
    Curation.writeBm25Index(docs(0, 120), "doc_id", "text", idx, buckets = 8)
    val allowed = (0L until 120L).filter(_ % 3 == 1).toDF("id")
    val got = Curation.bm25SearchIndexed(spark, idx, Seq("spark", "vector"),
        topK = 15, allowed = Some(allowed))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got.nonEmpty && got.forall(_._1 % 3 == 1),
      "every answer must satisfy the allowlist")
    // same SCORES as the unrestricted ranking, just restricted candidates
    val global = Curation.bm25SearchIndexed(spark, idx, Seq("spark", "vector"),
        topK = 1000)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    got.foreach { case (id, score, hits) =>
      assert(global(id) == ((score, hits)),
        s"allowlist must not change doc $id's score (global stats contract)")
    }
    // ... which is NOT the deletion contract: an index BUILT over only
    // the allowed docs scores differently (idf/avgdl shrink with it)
    val whole = s"$base/whole"
    Curation.writeBm25Index(docs(0, 120).filter(pmod(col("doc_id"), lit(3)) === 1),
      "doc_id", "text", whole, buckets = 8)
    assert(ask(whole, Seq("spark", "vector")).map(_._2).toSet != got.map(_._2).toSet,
      "allowlist scores must be global-stats, not built-over-allowed-only")
    // the batch form applies the same allowlist per query
    val many = Curation.bm25SearchIndexedMany(spark, idx,
        Seq((0L, Seq("spark", "vector"))).toDF("query_id", "terms"),
        topK = 15, allowed = Some(allowed))
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(many === got)
  }

  test("doclen sidecar file accrual is bounded through the minor compaction (r18)") {
    // every append adds one sidecar file and no fold covers the sidecar
    // — a long stream would accrue one file per trigger forever; the
    // minor compaction consolidates it once over the bound
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("bmdlfiles").toString
    val idx = s"$base/idx"
    Curation.writeBm25Index(docs(0, 50), "doc_id", "text", idx, buckets = 4)
    for (b <- 0 until 5)
      Curation.appendBm25IndexIdempotent(
        docs(50 + 10 * b, 60 + 10 * b), "doc_id", "text", idx, b.toLong)
    def dlFiles() = new java.io.File(s"$idx/doclens").listFiles()
      .count(_.getName.endsWith(".parquet"))
    val before = dlFiles()
    assert(before > 2, s"appends must have accrued sidecar files: $before")
    assert(Curation.bm25DoclenFileCount(spark, idx) === before)
    Curation.compactBm25Index(spark, idx, committedBatchId = 4L)
    // the ADVICE tracks the accrual (r19): over the bound it points at
    // compact-resident — the action that consolidates — without masking
    // higher-priority verdicts; under the bound it stays quiet
    val a = Curation.bm25MaintenanceAdvice(spark, idx, maxDoclenFiles = 2)
    assert(a.action === "compact-resident" && a.reason.contains("doclen"),
      s"${a.action}: ${a.reason}")
    assert(Curation.bm25MaintenanceAdvice(spark, idx).action === "none",
      "the default bound (64) must not trip on 6 files")
    Curation.compactBm25Resident(spark, idx, maxDoclenFiles = 2)
    assert(dlFiles() <= 2, s"consolidation must land under the bound: ${dlFiles()}")
    assert(Curation.bm25MaintenanceAdvice(spark, idx, maxDoclenFiles = 2)
      .action === "none", "acting on the advice must clear it")
    // idempotent: under bound, the next pass is a no-op listing
    Curation.compactBm25Resident(spark, idx, maxDoclenFiles = 2)
    assert(dlFiles() <= 2)
    // the consolidated sidecar still serves deletes exactly
    Curation.deleteFromBm25Index(Seq(55L, 77L).toDF("id"), idx)
    val whole = s"$base/whole"
    Curation.writeBm25Index(
      docs(0, 100).filter(!col("doc_id").isin(55L, 77L)),
      "doc_id", "text", whole, buckets = 4)
    assert(ask(idx) === ask(whole))
  }

  test("ledger fold crash windows: probes inside the window never double-subtract; recovery completes the fold (r18)") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("bmfoldcrash").toString
    val idx = s"$base/idx"; val whole = s"$base/whole"
    val empties = Seq((1000L, ""), (1001L, ""), (1002L, "")).toDF("doc_id", "text")
    Curation.writeBm25Index(docs(0, 60).union(empties), "doc_id", "text", idx, buckets = 8)
    Curation.writeBm25Index(docs(0, 60), "doc_id", "text", whole, buckets = 8)
    Curation.deleteFromBm25Index(Seq(1000L, 1001L, 1002L).toDF("id"), idx)
    // hand-construct the purge's fold states (zero-token tombstones, so
    // the postings rewrite the marker normally implies is a no-op here)
    val stats0 = spark.read.parquet(s"$idx/stats").collect()(0)
    val (expN, expSum) = (stats0.getLong(0) - 3, stats0.getLong(1))
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ledgerFiles = fs.listStatus(new org.apache.hadoop.fs.Path(s"$idx/deletes"))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName).toSeq
    IndexMaintenance.writeMarker(fs,
      new org.apache.hadoop.fs.Path(s"$idx/._ledger_fold.tmp"),
      new org.apache.hadoop.fs.Path(s"$idx/_ledger_fold"),
      s"$expN $expSum" +: ledgerFiles)
    // window A: marker present, stats NOT yet folded -> ledger applies
    assert(ask(idx) === ask(whole), "pre-stats window: subtract once via the ledger")
    // window B: stats folded, ledger files still present -> must NOT
    // subtract again (the marker pins the folded values)
    Seq((expN, expSum, stats0.getInt(2), stats0.getLong(3), stats0.getLong(4)))
      .toDF("n_docs", "sum_dl", "buckets", "last_batch", "last_manual")
      .coalesce(1).write.mode("overwrite").parquet(s"$idx/stats")
    assert(ask(idx) === ask(whole), "post-stats window: the ledger must not apply twice")
    // recovery rolls the fold forward: files retired, stats pinned
    val healed = Curation.recoverBm25Index(spark, idx)
    assert(healed.exists(_.contains("ledger fold")), s"got $healed")
    assert(ask(idx) === ask(whole))
    assert(!new java.io.File(s"$idx/_ledger_fold").exists())
    val deletesDir = new java.io.File(s"$idx/deletes")
    assert(!deletesDir.exists() || deletesDir.listFiles()
      .forall(f => !f.getName.endsWith(".parquet")), "ledger retired")
    assert(Curation.recoverBm25Index(spark, idx).isEmpty, "recovery is idempotent")
  }

  test("writes landing inside a crashed fold window heal it first: no delta erased, no tombstone skipped (r18 review)") {
    // The review's two holes: (1) a stats-writing op running inside a
    // crashed purge's window had its delta erased when recovery later
    // pinned stats to the marker's snapshot; (2) a tombstone appended
    // inside the window was skipped by the probes' all-or-nothing
    // mid-fold guard. Every write path now finishes the fold FIRST.
    val s = spark
    import s.implicits._
    def windowedIndex(dir: String): String = {
      val idx = s"$dir/idx"
      val empties = Seq((1000L, ""), (1001L, ""), (1002L, "")).toDF("doc_id", "text")
      Curation.writeBm25Index(docs(0, 60).union(empties), "doc_id", "text", idx, buckets = 8)
      Curation.deleteFromBm25Index(Seq(1000L, 1001L, 1002L).toDF("id"), idx)
      // construct the post-stats crash window by hand (zero-token
      // tombstones: the postings rewrite the marker implies is a no-op)
      val st = spark.read.parquet(s"$idx/stats").collect()(0)
      val (expN, expSum) = (st.getLong(0) - 3, st.getLong(1))
      val fs = new org.apache.hadoop.fs.Path(idx)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val files = fs.listStatus(new org.apache.hadoop.fs.Path(s"$idx/deletes"))
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.getName).toSeq
      IndexMaintenance.writeMarker(fs,
        new org.apache.hadoop.fs.Path(s"$idx/._ledger_fold.tmp"),
        new org.apache.hadoop.fs.Path(s"$idx/_ledger_fold"),
        s"$expN $expSum" +: files)
      Seq((expN, expSum, st.getInt(2), st.getLong(3), st.getLong(4)))
        .toDF("n_docs", "sum_dl", "buckets", "last_batch", "last_manual")
        .coalesce(1).write.mode("overwrite").parquet(s"$idx/stats")
      idx
    }
    // (1) an APPEND inside the window: delta survives recovery
    val base1 = Files.createTempDirectory("bmwinappend").toString
    val idx1 = windowedIndex(base1)
    Curation.appendBm25Index(docs(60, 80), "doc_id", "text", idx1)
    assert(!new java.io.File(s"$idx1/_ledger_fold").exists(),
      "the append must finish the fold before writing stats")
    assert(Curation.recoverBm25Index(spark, idx1).isEmpty)
    val whole1 = s"$base1/whole"
    Curation.writeBm25Index(docs(0, 80), "doc_id", "text", whole1, buckets = 8)
    def st(p: String) = spark.read.parquet(s"$p/stats")
      .select("n_docs", "sum_dl").collect()(0)
    assert(st(idx1) === st(whole1), "the append's stats delta must survive")
    assert(ask(idx1) === ask(whole1))
    // (2) a DELETE inside the window: the fresh tombstone is honored
    val base2 = Files.createTempDirectory("bmwindelete").toString
    val idx2 = windowedIndex(base2)
    Curation.deleteFromBm25Index(Seq(7L).toDF("id"), idx2)
    assert(!new java.io.File(s"$idx2/_ledger_fold").exists(),
      "the delete must finish the fold before appending its tombstone")
    val whole2 = s"$base2/whole"
    Curation.writeBm25Index(docs(0, 60).filter(col("doc_id") =!= 7L),
      "doc_id", "text", whole2, buckets = 8)
    assert(ask(idx2) === ask(whole2),
      "a tombstone landing right after a crashed fold must hide its doc")
  }

  test("streamed ingest rides the shared skeleton: replay exactly-once, in-stream fold, self-maintenance") {
    val base = Files.createTempDirectory("bmstream").toString
    val idx = s"$base/idx"; val whole = s"$base/whole"
    Curation.writeBm25Index(docs(0, 100), "doc_id", "text", idx, buckets = 4)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    // r17: each maintenance point surfaces the family's advice BEFORE the
    // remedies run — the observable threshold transition
    val advices = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val fn = graft.streaming.StreamingLex.appendBatches(
      idx, "doc_id", "text", compactEvery = 1,
      onAdvice = (a, b) => advices += ((a.action, b)))(seen += _)
    for (b <- 0 until 4) fn(docs(100 + 25 * b, 125 + 25 * b), b.toLong)
    // crash-replay of the LATEST batch (a committed batch is never
    // re-delivered — that is exactly what makes the fold watermark safe,
    // and why folding only `batchId - 1` leaves is the contract)
    fn(docs(175, 200), 3L)
    assert(seen.toSeq === Seq(0L, 1L, 2L, 3L, 3L))
    // a maintenance point fires per non-empty batch past 0 (compactEvery=1)
    assert(advices.map(_._2).toSeq === Seq(1L, 2L, 3L, 3L))
    // with compactEvery=1 each point folds before accrual can cross the
    // default thresholds, so a healthy loop reads "none" throughout —
    // the threshold TRANSITIONS are pinned by IndexMaintenanceSpec's
    // advice lifecycle; here we pin the surfacing and the cadence
    assert(advices.forall { case (a, _) =>
      Set("fold", "compact-resident", "none")(a) }, advices.toString)
    Curation.writeBm25Index(docs(0, 200), "doc_id", "text", whole, buckets = 4)
    assert(ask(idx) === ask(whole), "streamed ingest must equal all-at-once")
    val layout = Curation.bm25IndexLayout(spark, idx)
    assert(layout.maxResidentFilesPerCell <= 2 * Similarity.cellSpreadBound(spark, 4),
      s"in-stream self-maintenance must bound resident files: $layout")
  }

  test("streamed deletes: mid-stream tombstones vanish from probes; the advice-driven purge retires the ledger in-stream (r18)") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("bmstreamdel").toString
    val idx = s"$base/idx"
    Curation.writeBm25Index(docs(0, 100), "doc_id", "text", idx, buckets = 4)
    val advices = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val fn = graft.streaming.StreamingLex.appendBatches(
      idx, "doc_id", "text", compactEvery = 2,
      onAdvice = (a, b) => advices += ((a.action, b)),
      purgeWhenAdvised = true, maxTombstones = 3)()
    fn(docs(100, 130), 0L)
    // deletes land MID-STREAM: 6 resident ids + 2 from the committed
    // (not yet folded) batch 0 — 8 pending, over the knob's 3
    val deletedIds = Seq(5L, 15L, 25L, 35L, 45L, 55L, 105L, 106L)
    Curation.deleteFromBm25Index(deletedIds.toDF("id"), idx)
    def whole(hi: Long) = {
      val p = s"$base/whole$hi"
      Curation.writeBm25Index(
        docs(0, hi).filter(!col("doc_id").isin(deletedIds: _*)),
        "doc_id", "text", p, buckets = 4)
      p
    }
    assert(ask(idx) === ask(whole(130)),
      "mid-stream deletes must vanish from probes immediately (stats adjusted)")
    // the next maintenance point: fold-first (tombstoned rows in lane
    // 0), then the advice-driven purge — ledger retired, stats folded
    fn(docs(130, 160), 1L)
    assert(advices.toSeq === Seq(("fold", 1L), ("purge-deletes", 1L)),
      s"the monitor must see the fold-first redirect then the purge transition: $advices")
    val deletesDir = new java.io.File(s"$idx/deletes")
    assert(!deletesDir.exists() || deletesDir.listFiles()
      .forall(f => !f.getName.endsWith(".parquet")),
      "the in-stream purge must retire the ledger")
    val w160 = whole(160)
    assert(ask(idx) === ask(w160), "answers exact after the in-stream purge")
    def st(p: String) = spark.read.parquet(s"$p/stats")
      .select("n_docs", "sum_dl").collect()(0)
    assert(st(idx) === st(w160), "the fold must land rebuild-without-docs stats")
    // later maintenance points never re-advise (or re-run) the purge
    fn(docs(160, 190), 2L)
    fn(docs(190, 220), 3L)
    assert(advices.drop(2).forall(_._1 !== "purge-deletes"), s"got $advices")
  }

  test("delete id hygiene: a non-castable id refuses loudly; differing-dl sidecar dupes and re-deletes ledger each doc ONCE (r19)") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("bmledg").toString
    val idx = s"$base/idx"
    Curation.writeBm25Index(docs(0, 100), "doc_id", "text", idx, buckets = 4)
    // 1. an id the long cast nulls out is a caller error, not a silent
    //    no-op delete (r18 advice: the cast regression)
    val e = intercept[IllegalArgumentException] {
      Curation.deleteFromBm25Index(
        Seq("7", "not-a-number").toDF("id"), idx)
    }
    assert(e.getMessage.contains("castable"), e.getMessage)
    assert(!new java.io.File(s"$idx/deletes").exists(),
      "a refused delete must append nothing")
    // ... while numeric strings still cast and delete fine
    Curation.deleteFromBm25Index(Seq("7").toDF("id"), idx)
    // 2. plant the advice scenario: a second sidecar row for doc 11
    //    with a DIFFERENT dl (a retried manual append whose text
    //    changed). distinct() can't collapse it; the delete must still
    //    ledger doc 11 exactly once.
    // (planted BELOW the true dl: the deterministic max-pick then
    // lands the true value — what the fix guarantees regardless is one
    // ledger row per doc; with two conflicting dl claims the dl itself
    // is only as good as the pick)
    val dl11 = spark.read.parquet(s"$idx/doclens")
      .filter(col("id") === 11L).select("dl").collect()(0).getInt(0)
    Seq((11L, dl11 - 3)).toDF("id", "dl")
      .coalesce(1).write.mode("append").parquet(s"$idx/doclens")
    Curation.deleteFromBm25Index(Seq(11L).toDF("id"), idx)
    // 3. re-deleting already-tombstoned ids appends nothing — the
    //    ledger stays id-unique (no double-subtraction at the fold)
    Curation.deleteFromBm25Index(Seq(7L, 11L, 23L).toDF("id"), idx)
    Curation.deleteFromBm25Index(Seq(11L).toDF("id"), idx)
    val ledger = spark.read.parquet(s"$idx/deletes")
    assert(ledger.count() === ledger.select("id").distinct().count(),
      "the ledger must hold one row per deleted id")
    assert(ledger.select("id").distinct().count() === 3L)
    // 4. probes AND the stats fold both price each doc once: the purged
    //    index must equal a build without the three docs exactly
    val whole = s"$base/whole"
    Curation.writeBm25Index(
      docs(0, 100).filter(!col("doc_id").isin(7L, 11L, 23L)),
      "doc_id", "text", whole, buckets = 4)
    assert(ask(idx) === ask(whole), "pre-purge probes must price each doc once")
    assert(Curation.purgeBm25Deletes(spark, idx) > 0)
    assert(ask(idx) === ask(whole), "the fold must subtract each doc once")
    def st(p: String) = spark.read.parquet(s"$p/stats")
      .select("n_docs", "sum_dl").collect()(0)
    assert(st(idx) === st(whole),
      "folded stats must equal rebuild-without-docs despite the dup sidecar row")
  }

  test("stored-metadata filtered search: candidates restricted via the postings rows, stats corpus-global, survives append/fold/purge (r19)") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("bmmeta").toString
    val idx = s"$base/idx"
    def cat(d: DataFrame) = d.withColumn("category",
      pmod(col("doc_id"), lit(3)).cast("int"))
    Curation.writeBm25Index(cat(docs(0, 100)), "doc_id", "text", idx,
      buckets = 8, metaCols = Seq("category"))
    // metadata rides every append lane; a meta-less append refuses
    // (missing values would read as NULL and filtered probes would
    // silently drop the lane's docs)
    Curation.appendBm25IndexIdempotent(cat(docs(100, 130)), "doc_id", "text",
      idx, 0L, metaCols = Seq("category"))
    Curation.appendBm25Index(cat(docs(130, 150)), "doc_id", "text", idx,
      metaCols = Seq("category"))
    val mm = intercept[IllegalArgumentException] {
      Curation.appendBm25Index(docs(150, 160), "doc_id", "text", idx)
    }
    assert(mm.getMessage.contains("metaCols"), mm.getMessage)
    def probe() = Curation.bm25SearchIndexed(spark, idx,
        Seq("spark", "vector"), topK = 15, filter = Some(col("category") === 1))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    // the CONTRACT: candidates restricted, stats corpus-global — i.e.
    // exactly the allowlist's answers for the same predicate's id set
    def wantAllowed() = Curation.bm25SearchIndexed(spark, idx,
        Seq("spark", "vector"), topK = 15,
        allowed = Some((0L until 150L).filter(_ % 3 == 1).toDF("id")))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(probe() === wantAllowed(),
      "stored-metadata filtering must equal the allowlist for the same id set")
    assert(probe().forall(_._1 % 3 == 1), "every answer satisfies the predicate")
    // ... and every answer's score equals its UNFILTERED score (the
    // corpus-global-stats statement, spec-distinct from deletion)
    val unf = Curation.bm25SearchIndexed(spark, idx, Seq("spark", "vector"),
        topK = 150).collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(probe().forall { case (id, score, _) => unf(id) == score },
      "filtering must not move scores — df/idf/avgdl stay corpus-global")
    // the predicate reaches the candidate branch's parquet scan
    val plan = Curation.bm25SearchIndexed(spark, idx, Seq("spark", "vector"),
        topK = 15, filter = Some(col("category") === 1))
      .queryExecution.executedPlan.toString
    assert(plan.contains("category"), s"predicate must appear in the plan:\n$plan")
    // composes with allowed (both restrict candidates) and deletion
    val both = Curation.bm25SearchIndexed(spark, idx, Seq("spark", "vector"),
        topK = 15, allowed = Some((0L until 75L).toDF("id")),
        filter = Some(col("category") === 1))
      .collect().map(r => r.getLong(0)).toSeq
    assert(both.nonEmpty && both.forall(id => id < 75 && id % 3 == 1))
    // metadata survives the fold and the purge's resident rewrite
    Curation.compactBm25Index(spark, idx, committedBatchId = 0L)
    assert(probe() === wantAllowed())
    Curation.deleteFromBm25Index(Seq(1L, 7L).toDF("id"), idx)
    assert(Curation.purgeBm25Deletes(spark, idx) > 0)
    assert(probe().forall { case (id, _, _) => id != 1L && id != 7L })
    assert(probe() === wantAllowed(), "post-purge probes keep the contract")
    // reserved names refuse at build
    val bad = intercept[IllegalArgumentException] {
      Curation.writeBm25Index(docs(0, 10).withColumn("dl", lit(1)),
        "doc_id", "text", s"$base/bad", buckets = 4, metaCols = Seq("dl"))
    }
    assert(bad.getMessage.contains("collide"), bad.getMessage)
  }

  test("read-only probes return under sustained concurrent appends with a live ledger (r19 — append movement is not a purge race)") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("bmrace").toString
    val idx = s"$base/idx"
    Curation.writeBm25Index(docs(0, 80), "doc_id", "text", idx, buckets = 4)
    // a live ledger forces every probe through the full snapshot path
    Curation.deleteFromBm25Index(Seq(3L).toDF("id"), idx)
    // ingest thread: 25 keyed appends, each rewriting the stats row —
    // exactly the movement r18's snapshot loop misread as a purge race
    @volatile var ingestErr: Option[Throwable] = None
    val ingest = new Thread(() => {
      try {
        (0 until 25).foreach { i =>
          Curation.appendBm25IndexIdempotent(
            docs(80 + i * 5, 85 + i * 5), "doc_id", "text", idx, i.toLong)
        }
      } catch { case t: Throwable => ingestErr = Some(t) }
    })
    ingest.start()
    try {
      // probe continuously while the stats row churns: every probe must
      // RETURN (top-k may differ run to run as docs arrive — only the
      // no-throw contract is pinned; r18 could throw the 5-attempt
      // IllegalStateException here)
      while (ingest.isAlive) {
        val got = Curation.bm25SearchIndexed(spark, idx,
          Seq("spark", "vector"), topK = 5).collect()
        assert(got.nonEmpty)
      }
    } finally ingest.join()
    assert(ingestErr.isEmpty, s"ingest thread failed: $ingestErr")
    // quiesced: answers equal a fresh build over the same docs minus
    // the tombstone (the race never corrupted stats)
    val whole = s"$base/whole"
    Curation.writeBm25Index(
      docs(0, 205).filter(col("doc_id") =!= 3L), "doc_id", "text",
      whole, buckets = 4)
    assert(ask(idx) === ask(whole))
  }
}
