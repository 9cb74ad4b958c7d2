package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared maintenance machinery for the persisted ANN index layouts
  * (`cell=<c>/ingest_batch=<b>` two-level partitioning — IVF corpus,
  * IVFPQ codes + vectors): the incremental leaf fold that compaction is
  * built on, its crash recovery, and the staging-debris guard.
  *
  * ## Why an incremental fold, not a rewrite
  *
  * r14's compaction read and rewrote the WHOLE table per fold — with
  * in-stream `compactEvery = N` a long ingest paid O(resident index)
  * every N batches, O(index²/N) lifetime write I/O for O(new data) of
  * useful work, and at 100 TB a single fold was a full-index job. The
  * fold here reads ONLY the checkpoint-committed batch leaves
  * (`0 ≤ ingest_batch ≤ committed`, listed directly so even the FS
  * listing is batch-sized), writes their rows as new bounded-fan-out
  * files into the existing `ingest_batch=-1` leaves, and deletes the
  * folded batch leaves. The resident `-1` files are never read, never
  * rewritten, never renamed — fold cost scales with the folded batches,
  * not the index.
  *
  * Each fold ADDS at most one cell-spread bound's worth of files per
  * cell to the `-1` layer, so `-1` accrues `folds × bound` files over a
  * stream's lifetime (vs `batches` per cell unfolded). When that
  * accrual itself warrants flattening, [[compactResident]] rewrites
  * just the over-bound cells back under the bound (the STATIONARY
  * stream's remedy — a stationary corpus never trips the drift
  * trigger, so nothing else would ever flatten it); a DRIFTED corpus
  * rebuilds instead — the retrain verdict demands one by then, and a
  * rebuild IS the major compaction.
  *
  * ## Crash safety (the r14 rename-swap's fatal window, removed)
  *
  * The old two-rename swap had a window where a crash left NO live
  * table (between `rename(table, old)` and `rename(tmp, table)`), and a
  * later compaction's `delete(old)` destroyed the stranded original.
  * The fold never renames the live table at all; it is staged through
  * two markers written INSIDE the table dir (underscore-prefixed, so
  * parquet readers ignore them):
  *
  *  1. fold output written to `<table>_fold_tmp` (outside the table —
  *     a non-partition dir inside it would break partition discovery);
  *  2. `_fold_staged` marker created (atomic write-then-rename),
  *     listing the EXACT destination files and leaf dirs;
  *  3. tmp files renamed into `cell=<c>/ingest_batch=-1/` under
  *     fold-prefixed names;
  *  4. marker renamed `_fold_staged` → `_fold_commit` (atomic — the
  *     point of no return);
  *  5. folded leaf dirs deleted; tmp + marker removed.
  *
  * A crash anywhere leaves a deterministic recovery: `_fold_staged`
  * present → roll BACK (delete the listed destination files — the
  * originals are all still in their leaves); `_fold_commit` present →
  * roll FORWARD (delete the listed leaf dirs — every destination file
  * is in place by construction). Both are idempotent. [[recover]]
  * performs whichever applies; [[requireNoDebris]] makes writers refuse
  * to touch an index with unrecovered debris.
  *
  * Readers during a NORMAL fold: the only reader-visible inconsistency
  * (a folded batch appearing twice) is confined to the marker-bracketed
  * move+delete window of steps 3–5, which a healthy fold clears in well
  * under a second — the expensive tmp write (step 1) happens before any
  * marker exists and never touches reader-visible files. Readers
  * therefore gate on [[requireReadConsistent]]: wait briefly while a
  * marker is present (a live fold finishes; the read proceeds), fail
  * with the remedy only when the marker outlives the wait (a crash).
  * Writers gate on the stricter [[requireNoDebris]] — under the
  * single-writer contract any staging artifact a writer sees is a crash.
  */
private[graft] object IndexMaintenance {

  private def foldTmp(table: Path) =
    new Path(table.getParent, table.getName + "_fold_tmp")
  private def stagedMarker(table: Path) = new Path(table, "_fold_staged")
  private def commitMarker(table: Path) = new Path(table, "_fold_commit")
  private def markerScratch(table: Path) = new Path(table, "._fold_staged.tmp")
  private def epochFile(table: Path) = new Path(table, "_fold_epoch")
  private def epochScratch(table: Path) = new Path(table, "._fold_epoch.tmp")
  // r14 rename-swap debris (an index crashed under the OLD protocol)
  private def legacyTmp(table: Path) =
    new Path(table.getParent, table.getName + "_compact_tmp")
  private def legacyOld(table: Path) =
    new Path(table.getParent, table.getName + "_old")

  /** Test seam: set to a phase name ("before-commit" | "before-cleanup")
    * to crash a fold at that point — lets specs pin the recovery paths
    * without timing luck. */
  @volatile private[graft] var failpoint: Option[String] = None
  private def maybeFail(phase: String): Unit =
    if (failpoint.contains(phase))
      throw new RuntimeException(s"injected fold crash at $phase")

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Throw if `table` carries staging debris from an interrupted fold
    * (or from the pre-r15 rename-swap). This is the WRITER form: under
    * the single-writer contract a writer can never race a live fold, so
    * ANY staging artifact it sees — including the fold-tmp dir — is a
    * crash leftover that appending around would corrupt (a folded batch
    * counted twice after recovery). */
  private[graft] def requireNoDebris(fs: FileSystem, table: Path): Unit =
    failOnDebris(fs, table, Seq(
      stagedMarker(table) -> "an interrupted fold (staged)",
      commitMarker(table) -> "an interrupted fold (committed)",
      markerScratch(table) -> "an interrupted fold (pre-stage scratch)",
      foldTmp(table) -> "fold staging output",
      legacyTmp(table) -> "a pre-r15 compaction's staging dir",
      legacyOld(table) -> "a pre-r15 compaction's renamed-aside table"))

  /** Reader-side consistency gate. Readers are NOT under the
    * single-writer contract, so a marker may belong to a LIVE fold, not
    * a crash — and the only phase where a reader could see inconsistent
    * data (a folded batch twice) is the marker-bracketed move+delete
    * window, which a healthy fold clears in well under a second (file
    * renames + leaf deletes; the expensive tmp WRITE happens before any
    * marker exists and is invisible to readers). So: ignore the tmp dir
    * entirely, and on a staged/commit marker WAIT briefly for it to
    * clear — a live fold finishes and the read proceeds consistently; a
    * marker still present after the wait is crash debris and fails with
    * the remedy. Legacy rename-swap debris fails immediately (never
    * live — that code is gone).
    *
    * This gate alone is point-in-time; index probes therefore take
    * their FILE LISTING through [[consistentListing]], which validates
    * the (marker, epoch) pair on both sides of the listing and retries
    * when a maintenance window overlapped it — so a captured listing is
    * a consistent snapshot and a folded batch can never be transiently
    * visible twice (the r15 KNOWN LIMIT's silent half, closed in r16).
    *
    * KNOWN LIMIT (remaining, loud-only): a task reading a file that a
    * maintenance op deleted AFTER the snapshot was captured fails with
    * FileNotFoundException mid-execution — retry the query (the
    * standard contract for reading any directory a writer may rewrite;
    * full mid-EXECUTION isolation needs snapshot metadata, an MVCC
    * table format, out of scope for a directory-layout index).
    * Operators needing strict isolation serialize retrieval with
    * maintenance — the in-stream shape already does (folds run on the
    * ingest thread), and `compactEvery` schedules folds, so a
    * maintenance window is one trigger away. */
  /** How long [[requireReadConsistent]] waits for a live fold's marker
    * window to clear before declaring it crash debris. A seam (not a
    * per-call knob) so specs can pin the crash path without 15 s stalls;
    * production readers never see the full wait — a healthy window is
    * sub-second. */
  @volatile private[graft] var readGateWaitMs: Long = 15000L

  /** The table's maintenance EPOCH: a counter bumped exactly once by
    * every completed mutation of reader-visible files (a fold, a
    * resident compaction, a recovery in either direction) — bumped
    * BEFORE the op's marker is removed, so the (marker, epoch) pair
    * sampled on both sides of a listing proves the listing overlapped
    * no move/delete window: any mutation interval is bracketed by its
    * marker, and an interval that fell ENTIRELY between the two samples
    * left the epoch changed. Missing file reads as 0 (pre-epoch
    * indexes; the first maintenance op creates it). */
  private[graft] def readEpoch(fs: FileSystem, table: Path): Long = {
    val f = epochFile(table)
    if (!fs.exists(f)) 0L
    else readMarker(fs, f).headOption.map(_.trim.toLong).getOrElse(0L)
  }

  private def bumpEpoch(fs: FileSystem, table: Path): Unit = {
    val next = readEpoch(fs, table) + 1
    val out = fs.create(epochScratch(table), true)
    try out.write(s"$next\n".getBytes("UTF-8")) finally out.close()
    // delete-then-rename (HDFS rename refuses to overwrite): a reader
    // sampling during the gap reads 0, which can only FALSE-POSITIVE a
    // retry, never mask a change
    fs.delete(epochFile(table), false)
    require(fs.rename(epochScratch(table), epochFile(table)),
      s"could not publish epoch ${epochFile(table)}")
  }

  /** Test seam: runs after the gate + epoch sample and before the
    * caller's listing inside [[consistentListing]] — lets a spec run a
    * WHOLE maintenance op inside the reader's listing window without
    * timing luck. */
  @volatile private[graft] var afterGateHook: Option[() => Unit] = None
  /** Test seam: how many listings were retried by the snapshot check. */
  private[graft] val listingRetries = new java.util.concurrent.atomic.AtomicLong(0)

  /** Run `list` (a driver-side file-listing action — e.g. constructing a
    * DataFrame over the table, which lists its files eagerly) under an
    * OPTIMISTIC SNAPSHOT: sample (marker, epoch) before and after; equal
    * samples prove no maintenance op's move/delete window overlapped the
    * listing, so the captured file set is a consistent snapshot — a
    * folded batch can never appear twice in it. On a changed sample the
    * listing is retried (the fold that invalidated it has finished;
    * bounded attempts, then fail loudly). This closes the r15 KNOWN
    * LIMIT's silent half: with it, retrieval concurrent with maintenance
    * has exactly ONE residual anomaly — a task reading a file deleted
    * AFTER the snapshot was captured fails loudly with
    * FileNotFoundException (retry the query); transient double-counting
    * is gone. */
  private[graft] def consistentListing[T](fs: FileSystem, table: Path)(list: => T): T = {
    val maxAttempts = 5
    var attempt = 0
    while (attempt < maxAttempts) {
      requireReadConsistent(fs, table) // waits out a live marker window
      val e0 = readEpoch(fs, table)
      afterGateHook.foreach(h => h())
      // a fold deleting a leaf WHILE `list` walks it throws rather than
      // returning a stale set — same race, same remedy: detect the
      // overlapping maintenance window below and retry; only a miss with
      // NO overlap is a genuinely absent file and propagates. Above the
      // parallel-partition-discovery threshold (32 leaf dirs) Spark
      // lists via a job, so the FNF arrives WRAPPED in a SparkException
      // — walk the cause chain, not just the top frame (r17 review).
      val out =
        try Right(list)
        catch {
          case e: Throwable
              if scala.util.control.NonFatal(e) && fnfInChain(e) => Left(e)
        }
      val markerNow = fs.exists(stagedMarker(table)) || fs.exists(commitMarker(table))
      val overlapped = markerNow || readEpoch(fs, table) != e0
      (out, overlapped) match {
        case (Right(v), false) => return v
        case (Left(e), false) => throw e
        case _ => listingRetries.incrementAndGet(); attempt += 1
      }
    }
    throw new IllegalStateException(
      s"could not capture a consistent file listing of $table after $maxAttempts " +
        "attempts — a maintenance op completed inside every listing window. " +
        "This needs sustained back-to-back folds; stagger maintenance or retry.")
  }

  private def fnfInChain(e: Throwable): Boolean = {
    var c: Throwable = e
    var depth = 0
    while (c != null && depth < 10) {
      if (c.isInstanceOf[java.io.FileNotFoundException]) return true
      c = c.getCause
      depth += 1
    }
    false
  }

  private[graft] def requireReadConsistent(fs: FileSystem, table: Path): Unit = {
    val waitMs = readGateWaitMs
    failOnDebris(fs, table, Seq(
      legacyTmp(table) -> "a pre-r15 compaction's staging dir",
      legacyOld(table) -> "a pre-r15 compaction's renamed-aside table"))
    def markerPresent() =
      fs.exists(stagedMarker(table)) || fs.exists(commitMarker(table))
    if (!markerPresent()) return
    val deadline = System.nanoTime() + waitMs * 1000000L
    while (markerPresent() && System.nanoTime() < deadline) Thread.sleep(200)
    if (markerPresent()) throw new IllegalStateException(
      s"index table $table still carries a fold marker after ${waitMs} ms — " +
        "if no compaction is running this is crash debris; run the index's " +
        "recover entry point (Similarity.recoverIvfFold / Pq.recoverPqFold / " +
        "Curation.recoverBm25Index). " +
        "A live fold's marker window is sub-second; raise the wait only for " +
        "object stores with extreme rename latency.")
  }

  private def failOnDebris(fs: FileSystem, table: Path,
      candidates: Seq[(Path, String)]): Unit = {
    val debris = candidates.filter { case (p, _) => fs.exists(p) }
    if (debris.nonEmpty) throw new IllegalStateException(
      s"index table $table has compaction debris: " +
        debris.map { case (p, what) => s"$p ($what)" }.mkString("; ") +
        " — a maintenance op was interrupted. Run the index's recover " +
        "entry point (Similarity.recoverIvfFold / Pq.recoverPqFold / " +
        "Curation.recoverBm25Index) before reading or appending.")
  }

  // ---------------------------------------------------------------------
  // The MANUAL append lane — shared by every index family's keyless
  // (non-streamed) append. Manual batches get auto-assigned ingest_batch
  // ids counting up from [[ManualLaneFloor]], DISJOINT from foreachBatch
  // ids (which count up from 0) so a stream attached to the same index
  // can never dynamic-overwrite a manual append's leaves (~31 years of
  // 1-second triggers before a stream id reaches the floor). A watermark
  // records the last lane whose append fully committed; the append
  // writes its lane via dynamic overwrite FIRST and advances the
  // watermark SECOND, so a crashed append retried with the same batch
  // reuses its lane and overwrites its own leaves — exactly-once. The
  // lexical family keeps its watermark inside the stats row (one write
  // serves both); the ANN families have no stats row and use the
  // `_manual_watermark` file below.
  // ---------------------------------------------------------------------

  private[operators] val ManualLaneFloor = 1000000000L

  private def manualWatermarkFile(table: Path) = new Path(table, "_manual_watermark")
  private def manualWatermarkScratch(table: Path) =
    new Path(table, "_manual_watermark.tmp")

  /** Last fully-committed manual lane id; missing file (no manual append
    * ever ran, or a pre-r17 index) reads as the floor minus one — unless
    * the publish SCRATCH file survives (r18): [[writeManualWatermark]]
    * publishes by delete-then-rename, and a crash between the two leaves
    * only the scratch, whose content is complete (written and closed
    * before anything is deleted) — falling back to it keeps one crash
    * from re-orphaning every historical lane. A scratch that fails to
    * parse (a crash mid-write, before the delete) reads as floor-1,
    * which only makes a later append re-examine lanes — harmless, since
    * the per-orphan fingerprint check (r18) resolves each lane on its
    * own evidence. */
  private[operators] def readManualWatermark(fs: FileSystem, table: Path): Long = {
    def parse(p: Path): Option[Long] =
      scala.util.Try(readMarker(fs, p).headOption.map(_.trim.toLong)).toOption.flatten
    val f = manualWatermarkFile(table)
    (if (fs.exists(f)) parse(f) else parse(manualWatermarkScratch(table)))
      .getOrElse(ManualLaneFloor - 1)
  }

  /** Publish the manual watermark (scratch + delete + rename, like the
    * epoch): a reader sampling during the gap reads floor-1, which can
    * only make a later append re-examine lanes, never lose one. */
  private[operators] def writeManualWatermark(fs: FileSystem, table: Path,
      v: Long): Unit = {
    val out = fs.create(manualWatermarkScratch(table), true)
    try out.write(s"$v\n".getBytes("UTF-8")) finally out.close()
    fs.delete(manualWatermarkFile(table), false)
    require(fs.rename(manualWatermarkScratch(table), manualWatermarkFile(table)),
      s"could not publish manual watermark ${manualWatermarkFile(table)}")
  }

  /** Manual-lane leaf ids above `watermark` in the two-level layout —
    * each one an append that wrote its lane but never advanced the
    * watermark (a crash between the two steps). One FS walk. */
  private[operators] def manualLanes(fs: FileSystem, table: Path,
      watermark: Long, level1: String = "cell"): Seq[Long] =
    (for {
      cellDir <- fs.listStatus(table).toSeq
      if cellDir.isDirectory && cellDir.getPath.getName.startsWith(s"$level1=")
      leaf <- fs.listStatus(cellDir.getPath).toSeq
      if leaf.isDirectory && leaf.getPath.getName.startsWith("ingest_batch=")
      b = leaf.getPath.getName.stripPrefix("ingest_batch=").toLong
      if b >= ManualLaneFloor && b > watermark
    } yield b).distinct

  /** Remove every leaf of one lane — the remedy for a HALF-LANDED manual
    * append in a two-table family (codes written, vectors not): the
    * batch never fully landed and its call never returned success, so
    * deletion loses nothing confirmed. Bumps the epoch (reader-visible
    * files were removed) so a concurrent listing retries instead of
    * failing on a vanished leaf. */
  private[operators] def deleteLane(fs: FileSystem, table: Path, lane: Long,
      level1: String = "cell"): Unit = {
    for {
      cellDir <- fs.listStatus(table).toSeq
      if cellDir.isDirectory && cellDir.getPath.getName.startsWith(s"$level1=")
      leaf = new Path(cellDir.getPath, s"ingest_batch=$lane")
      if fs.exists(leaf)
    } fs.delete(leaf, true)
    bumpEpoch(fs, table)
  }

  // ---------------------------------------------------------------------
  // The TOMBSTONE LEDGER (r17) — deletion for append-oriented index
  // families: `deleteFrom*Index` appends deleted ids (plus any columns
  // the family's stats need — BM25 keeps `dl`) under `<index>/deletes`;
  // probes anti-join the broadcast ledger so deleted docs vanish from
  // answers IMMEDIATELY and exactly (the BM25 probes also subtract the
  // ledger's aggregate from the stored stats, so idf/avgdl match an
  // index built without those docs); `purge*Deletes` later reclaims the
  // bytes by rewriting the resident layer through [[rewriteResident]]'s
  // marker protocol. The ledger is driver-small by contract (it
  // broadcasts); when deletions outgrow that, the remedy is a rebuild —
  // which starts from the tombstone-filtered rows and resets the ledger.
  // ---------------------------------------------------------------------

  private[operators] def deletesDir(indexPath: String): String =
    s"$indexPath/deletes"

  /** The deduplicated tombstone ledger, or None when nothing was ever
    * deleted. Dedup makes a re-appended tombstone harmless.
    *
    * Two deliberate hardenings (r17 self-review): a `deletes` dir with
    * NO committed data files (a delete crashed before its job commit)
    * reads as None instead of bricking every probe on schema inference;
    * and the ledger is MATERIALIZED to the driver and re-created as a
    * local frame — it is driver-small by contract (every consumer
    * broadcasts it), and a local frame holds no lazy file references,
    * so a concurrent purge deleting the ledger files mid-query cannot
    * fail a probe that already read it. */
  /** Whether `dir` exists and holds at least one committed parquet data
    * file — the shared "crashed first write reads as absent" predicate
    * for the ledger, the doclen sidecar, and their staging dirs. */
  private[operators] def hasCommittedData(fs: FileSystem, dir: Path): Boolean =
    fs.exists(dir) && fs.listStatus(dir)
      .exists(f => f.isFile && f.getPath.getName.endsWith(".parquet"))

  /** Fail-loud cap on tombstone-ledger rows materialized to the driver
    * (r20, the r19 verdict's ledgerAgg guard): every ledger consumer —
    * probe anti-joins (broadcast), [[Curation]]'s driver-memory
    * ledgerAgg, the purge fold — relies on the ledger being driver-small
    * "by contract", but nothing enforced the contract: an unbounded
    * delete stream silently grew a driver OOM. The default sits 10× past
    * the default purge-advice gate (`maxTombstones` = 100 000 — advice
    * fires long before the cap), ~tens of MB of driver rows; deployments
    * with a larger bound set `spark.graft.ledger.maxDriverRows`. */
  private[operators] def maxLedgerDriverRows(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.ledger.maxDriverRows")
      .map(_.toInt).getOrElse(1000000)

  /** `enforceCap = false` is reserved for the REMEDIATION paths — purge,
    * rebuild, maintenance advice, fold preconditions: the cap's whole
    * point is that probes and appends fail loudly and direct the
    * operator to purge, so the purge (and the advice that recommends
    * it) must still be able to read an over-cap ledger; capping them
    * too would wedge the index with no exit short of a conf override.
    * A remediation read is a deliberate one-shot operator action, and
    * the r18 fold/purge protocol bounds how often it runs. */
  private[operators] def readDeletes(spark: SparkSession,
      indexPath: String, enforceCap: Boolean = true): Option[DataFrame] = {
    val p = new Path(deletesDir(indexPath))
    val fs = fsOf(spark, p)
    if (!hasCommittedData(fs, p)) return None
    val cap = maxLedgerDriverRows(spark)
    val stored = spark.read.parquet(p.toString).distinct()
    if (!enforceCap)
      return Some(spark.createDataFrame(
        java.util.Arrays.asList(stored.collect(): _*), stored.schema))
    // limit(cap+1) bounds driver memory even when the ledger is over
    // the cap — the failure is a loud exception, not an OOM mid-collect
    val rows = stored.limit(cap + 1).collect() // driver-small, enforced
    if (rows.length > cap)
      throw new IllegalStateException(
        s"tombstone ledger at ${deletesDir(indexPath)} exceeds " +
          s"$cap distinct rows — the ledger is materialized to the driver " +
          "and broadcast by every probe, so an unbounded ledger is a " +
          "driver/executor OOM. Purge (purge advice has been firing since " +
          "maxTombstones) or rebuild to retire it, or raise " +
          "spark.graft.ledger.maxDriverRows if the driver truly has the memory.")
    Some(spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), stored.schema))
  }

  private[operators] def clearDeletes(spark: SparkSession, indexPath: String): Unit = {
    val p = new Path(deletesDir(indexPath))
    fsOf(spark, p).delete(p, true)
    ()
  }

  /** Tiny single-value counter file, published scratch+delete+rename
    * like the epoch (a reader in the gap sees the default). */
  private[operators] def readCounterFile(fs: FileSystem, f: Path,
      default: Long = 0L): Long =
    if (!fs.exists(f)) default
    else readMarker(fs, f).headOption.map(_.trim.toLong).getOrElse(default)

  private[operators] def writeCounterFile(fs: FileSystem, f: Path, v: Long): Unit = {
    val scratch = new Path(f.getParent, f.getName + ".tmp")
    val out = fs.create(scratch, true)
    try out.write(s"$v\n".getBytes("UTF-8")) finally out.close()
    fs.delete(f, false)
    require(fs.rename(scratch, f), s"could not publish counter $f")
  }

  /** Appending a TOMBSTONED id would be silent data loss: the ledger's
    * probe-time anti-join hides every copy of the id, old and new, so
    * the fresh rows would be invisible until a rebuild — refuse loudly
    * instead (deletion is terminal for an id until a rebuild resets the
    * ledger). Costs one broadcast semi-join probe over the batch, and
    * only when a ledger exists at all.
    *
    * `isCommittedReplay` (r18) is the idempotent lane's escape hatch:
    * Structured Streaming re-delivers a batch whose WRITE committed but
    * whose checkpoint didn't, and if one of that batch's ids was
    * deleted in between, refusing would throw on every restart — the
    * stream could never progress, even though the replay is a harmless
    * self-overwrite whose rows the ledger already hides. The thunk is
    * evaluated ONLY on a tombstone hit (it may cost an FS walk); `true`
    * means the batch's leaves are already on disk — a replay, let it
    * overwrite itself — while `false` keeps the loud refusal (a batch
    * that never landed is a genuinely fresh append of a deleted id).
    * The manual lane always passes the default `false`: its retries are
    * operator-driven, so loud-and-actionable beats silent. */
  private[operators] def requireNotTombstoned(spark: SparkSession,
      indexPath: String, batchIds: org.apache.spark.sql.DataFrame,
      isCommittedReplay: () => Boolean = () => false): Unit =
    readDeletes(spark, indexPath).foreach { d =>
      import org.apache.spark.sql.functions.broadcast
      val hit = batchIds.join(broadcast(d.select("id")), Seq("id"), "left_semi")
        .limit(1).collect()
      if (hit.nonEmpty && !isCommittedReplay())
        throw new IllegalArgumentException(
        s"batch re-appends deleted id ${hit(0).get(0)} — the tombstone ledger at " +
          s"${deletesDir(indexPath)} hides every copy of a deleted id, old and " +
          "new, so the appended rows would be invisible. Deletion is terminal " +
          "for an id until a PURGE or rebuild retires the ledger; append under " +
          "fresh ids, or purge/rebuild first.")
    }

  /** Whether any leaf of `lane` exists in the two-level layout — the
    * idempotent lanes' committed-replay detector for
    * [[requireNotTombstoned]]: a fold only ever folds checkpoint-
    * COMMITTED batches (which Structured Streaming never re-delivers),
    * so a re-delivered batch's leaves are still on disk iff its write
    * committed. One first-level listing + one exists() per cell dir,
    * paid only on a tombstone hit. */
  private[operators] def laneExists(fs: FileSystem, table: Path, lane: Long,
      level1: String = "cell"): Boolean =
    fs.exists(table) && fs.listStatus(table).exists { c =>
      c.isDirectory && c.getPath.getName.startsWith(s"$level1=") &&
        fs.exists(new Path(c.getPath, s"ingest_batch=$lane"))
    }

  /** True when some tombstoned id still has rows in an UNFOLDED
    * (`ingest_batch >= 0`) lane of `tablePath` — the precise purge
    * precondition (r18): the purge rewrites only the resident `-1`
    * layer, so a tombstoned row in a batch lane would survive it and
    * resurface once the ledger retired. r17 gated on batchLeaves == 0
    * outright, which a LIVE stream never satisfies (its current batch
    * is always unfolded) — so the advice's purge signal was
    * structurally un-actionable in-stream. Cost: one FS listing plus a
    * scan of the batch lanes ONLY (resident files are never listed into
    * the read); free when no lanes exist. */
  private[operators] def tombstonesUnfolded(spark: SparkSession,
      tablePath: String, ledgerIds: DataFrame, idColInTable: String,
      level1: String = "cell"): Boolean = {
    val table = new Path(tablePath)
    val fs = fsOf(spark, table)
    // a missing table dir has no lanes at all (the laneExists guard,
    // r18 advice): verdict false, not FileNotFoundException — callers
    // probing a mid-maintenance or freshly-reset index get a clean
    // answer and the purge's own table reads stay the loud failure
    if (!fs.exists(table)) return false
    val leafRels: Seq[String] = for {
      cellDir <- fs.listStatus(table).toSeq
      if cellDir.isDirectory && cellDir.getPath.getName.startsWith(s"$level1=")
      leaf <- fs.listStatus(cellDir.getPath).toSeq
      if leaf.isDirectory && leaf.getPath.getName.startsWith("ingest_batch=")
      if leaf.getPath.getName.stripPrefix("ingest_batch=").toLong >= 0
    } yield s"${cellDir.getPath.getName}/${leaf.getPath.getName}"
    leafRels.nonEmpty && {
      import org.apache.spark.sql.functions.{broadcast, col}
      spark.read.option("basePath", tablePath)
        .parquet(leafRels.map(r => s"$tablePath/$r"): _*)
        .join(broadcast(ledgerIds.select(col("id").as(idColInTable))),
          Seq(idColInTable), "left_semi")
        .limit(1).count() > 0
    }
  }

  /** The index's metadata-column CONTRACT file (r18 review): the build
    * records its `metaCols` at `<index>/_meta_cols` and every append
    * must match it — a mismatched append would land rows whose missing
    * metadata reads as NULL under the union schema, and a filtered
    * probe would then silently drop them (incomplete answers, no
    * error). A missing file reads as Nil (pre-r18 index, or a meta-less
    * build), so meta-less appends to old indexes pass unchanged while
    * an append that ADDS metadata to a meta-less index refuses with the
    * rebuild remedy. One tiny file read per append. */
  private def metaColsFile(indexRoot: Path) = new Path(indexRoot, "_meta_cols")

  private[operators] def writeMetaColsFile(fs: FileSystem, indexRoot: String,
      metaCols: Seq[String]): Unit = {
    val f = metaColsFile(new Path(indexRoot))
    fs.delete(f, false)
    if (metaCols.nonEmpty)
      writeMarker(fs, new Path(indexRoot, "._meta_cols.tmp"), f, metaCols)
  }

  private[operators] def readMetaColsFile(fs: FileSystem,
      indexRoot: String): Seq[String] = {
    val f = metaColsFile(new Path(indexRoot))
    if (!fs.exists(f)) Nil
    else scala.util.Try(readMarker(fs, f).map(_.trim).filter(_.nonEmpty))
      .getOrElse(Nil)
  }

  private[operators] def requireSameMetaCols(spark: SparkSession,
      indexRoot: String, metaCols: Seq[String]): Unit = {
    val fs = fsOf(spark, new Path(indexRoot))
    val stored = readMetaColsFile(fs, indexRoot)
    require(stored.sorted == metaCols.sorted,
      s"index at $indexRoot was built with metaCols [${stored.mkString(", ")}] " +
        s"but this append carries [${metaCols.mkString(", ")}] — rows with " +
        "missing metadata read as NULL under the union schema and filtered " +
        "probes would silently drop them. Append with the build's metaCols, " +
        "or rebuild the index with the new column set.")
  }

  /** The shared table rewrite behind the metadata UPGRADE path (r19,
    * `backfillMetaCols`): join `meta`'s columns onto every row of ONE
    * index table and republish it — the column-join remedy for a
    * pre-metadata index, where the only alternative was a full rebuild
    * (for PQ a complete re-encode, 160 s at the 20 M rung for what is
    * one id-keyed join). The join SHUFFLES — the metadata frame is
    * corpus-sized (one row per doc), never broadcast.
    *
    * Protocol: validate, write the joined table ASIDE
    * (`<table>_backfill`, `_SUCCESS`-gated), then delete-live + rename
    * — the doclen sidecar's swap shape. Crash windows heal at the next
    * call (or any family recover): a COMPLETE aside with no live table
    * rolls forward; anything else beside a live table is residue and is
    * removed. The epoch bumps after the publish so gated readers see
    * the mutation. A table already carrying every requested column
    * returns false untouched — what makes the two-table PQ backfill
    * resumable after a crash between its tables. Offline maintenance
    * under the single-writer contract (stop streams first; a reader in
    * the sub-second delete→rename window fails loudly and retries, the
    * writeStats adjudication).
    *
    * Coverage is enforced over LIVE rows only: every non-tombstoned row
    * must have a meta match — a missing match would land NULL metadata
    * that filtered probes silently drop, the exact seam the
    * `_meta_cols` contract exists to close. Tombstoned rows take meta
    * when present and NULL otherwise (they are ledger-hidden and the
    * purge removes them). */
  private[operators] def backfillTableMetaCols(spark: SparkSession,
      indexRoot: String, table: String, meta: org.apache.spark.sql.DataFrame,
      joinCol: String, metaCols: Seq[String]): Boolean = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val live = new Path(s"$indexRoot/$table")
    val fs = fsOf(spark, live)
    val aside = new Path(s"$indexRoot/${table}_backfill")
    if (fs.exists(aside)) {
      if (!fs.exists(live) && fs.exists(new Path(aside, "_SUCCESS"))) {
        require(fs.rename(aside, live), s"backfill recover: could not publish $live")
        bumpEpoch(fs, live)
        invalidateGuards(live.toString)
      } else fs.delete(aside, true)
    }
    require(fs.exists(live), s"no $table table at $indexRoot — nothing to backfill")
    requireReadConsistent(fs, live)
    val current = spark.read.parquet(live.toString)
    if (metaCols.forall(current.columns.contains)) return false
    val overlap = metaCols.filter(current.columns.contains)
    require(overlap.isEmpty,
      s"$table at $indexRoot already carries ${overlap.mkString(", ")} but not " +
        s"the full requested set — a partial overlap cannot be joined cleanly; " +
        "backfill the missing columns alone")
    // live-row coverage: one NARROW id-column pass + join, before any
    // destructive step
    val ledgerIds = readDeletes(spark, indexRoot)
      .map(d => broadcast(d.select(col("id").as(joinCol))))
    val liveIds = ledgerIds.foldLeft(current.select(joinCol))(
      (d, l) => d.join(l, Seq(joinCol), "left_anti"))
    val uncovered = liveIds
      .join(meta.select(joinCol), Seq(joinCol), "left_anti")
      .limit(3).collect()
    require(uncovered.isEmpty,
      s"metadata frame does not cover every live row of $table at $indexRoot " +
        s"(e.g. id ${uncovered.head.get(0)}) — uncovered rows would land NULL " +
        "metadata and filtered probes would silently drop them. Cover every " +
        "live id (tombstoned ids are exempt).")
    current.join(meta, Seq(joinCol), "left")
      .write.mode("overwrite").partitionBy("cell", "ingest_batch")
      .parquet(aside.toString)
    fs.delete(live, true)
    require(fs.rename(aside, live), s"could not publish backfilled $live")
    bumpEpoch(fs, live)
    invalidateGuards(live.toString)
    true
  }

  /** The FAMILY half of the metadata upgrade (r19 review): validation,
    * staging, contract update and the per-table rewrites, shared by
    * [[Similarity.backfillMetaCols]] and [[Pq.backfillMetaCols]] so the
    * contract checks cannot drift between families.
    *
    * Ordering is deliberate:
    *  1. STAGE the caller's meta frame to `<index>/_backfill_meta` and
    *     validate one-row-per-id on the staged copy — the caller's plan
    *     executes exactly ONCE (a meta frame derived from the index's
    *     own tables would otherwise die when the first table swap
    *     invalidates its captured listing — observed at 20 M; and a
    *     non-deterministic frame could pass validation on one execution
    *     yet join different rows on another);
    *  2. write `_meta_cols` (the union) BEFORE the table rewrites: a
    *     crash between rewrite and contract write would otherwise let a
    *     meta-less append PASS the contract and land rows whose new
    *     metadata reads as NULL — silently dropped by filtered probes,
    *     the exact seam the contract exists to close. Contract-first
    *     makes every post-crash failure LOUD instead: appends must
    *     carry the union, and the rerun completes the rewrites. A
    *     clash with stored columns is therefore legal exactly when it
    *     is our own interrupted upgrade — some table still missing the
    *     clashed columns — and refused otherwise.
    * Table rewrites are per-table resumable ([[backfillTableMetaCols]]
    * skips a table already carrying every column). */
  private[operators] def backfillMetaColsFamily(spark: SparkSession,
      path: String, meta: org.apache.spark.sql.DataFrame, idCol: String,
      metaCols: Seq[String], tables: Seq[String]): Boolean = {
    import org.apache.spark.sql.functions.{col, count, count_distinct, lit}
    require(metaCols.nonEmpty, "pass the metadata columns to backfill")
    require(meta.columns.contains(idCol) && metaCols.forall(meta.columns.contains),
      s"metadata frame must carry '$idCol' and ${metaCols.mkString(", ")}; " +
        s"got ${meta.columns.mkString(", ")}")
    val fs = fsOf(spark, new Path(path))
    val stored = readMetaColsFile(fs, path)
    val clash = metaCols.intersect(stored)
    if (clash.nonEmpty) {
      val unfinished = tables.exists { t =>
        val cols = scala.util.Try(
          spark.read.parquet(s"$path/$t").columns.toSet).getOrElse(Set.empty)
        !clash.forall(cols.contains)
      }
      require(unfinished,
        s"index at $path already stores metaCols [${clash.mkString(", ")}] — " +
          "backfill only ADDS columns; rebuild to change existing ones")
    }
    val scratch = new Path(s"$path/_backfill_meta")
    meta.select(col(idCol).as("corpus_id") +: metaCols.map(col): _*)
      .write.mode("overwrite").parquet(scratch.toString)
    try {
      val m = spark.read.parquet(scratch.toString)
      val mAgg = m.agg(count(lit(1)), count_distinct(col("corpus_id"))).collect()(0)
      require(mAgg.getLong(0) == mAgg.getLong(1),
        s"metadata frame must hold ONE row per id: ${mAgg.getLong(0)} rows over " +
          s"${mAgg.getLong(1)} distinct ids — a duplicated id would multiply " +
          "index rows through the join")
      writeMetaColsFile(fs, path, (stored ++ metaCols).distinct)
      tables.map(t =>
        backfillTableMetaCols(spark, path, t, m, "corpus_id", metaCols))
        .reduce(_ || _)
    } finally { fs.delete(scratch, true); () }
  }

  /** Order-independent fingerprint of a frame's distinct `id` set —
    * (count, xor of per-id hashes). Decides whether an incoming manual
    * batch IS the retry of an orphan lane (same id set) or a different
    * batch; decisive because every family's append contract requires
    * batch ids to be NEW to the index. */
  private[operators] def idSetFingerprint(ids: org.apache.spark.sql.DataFrame): (Long, Long) = {
    import org.apache.spark.sql.functions._
    val r = ids.distinct().agg(count(lit(1)),
      coalesce(bit_xor(xxhash64(col("id"))), lit(0L))).collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  /** Fold every `0 ≤ ingest_batch ≤ committed` leaf of `tablePath` into
    * its `ingest_batch=-1` layer. `spread` is the caller's bounded
    * cell-aligned exchange ([[Similarity.cellSpread]] with its nlist).
    * Returns false when there was nothing to fold. Single-writer
    * contract: no concurrent append to this table. */
  def foldCommitted(spark: SparkSession, tablePath: String, committed: Long,
      spread: DataFrame => DataFrame, level1: String = "cell"): Boolean = {
    val table = new Path(tablePath)
    val fs = fsOf(spark, table)
    require(fs.exists(table), s"no index table at $table")
    // from here this fold may create debris — memoized append guards on
    // this path must re-look on their next call, crash or no crash
    invalidateGuards(tablePath)
    requireNoDebris(fs, table)

    // batch-sized listing: only first-level dirs' leaf NAMES are
    // enumerated, and only matching leaves are handed to the read below
    // (basePath keeps the partition columns) — the resident -1 leaves
    // are never listed into the scan. `level1` is the family's
    // first-level partition column (ANN cells; lexical term buckets).
    val leafRels: Seq[String] = for {
      cellDir <- fs.listStatus(table).toSeq
      if cellDir.isDirectory && cellDir.getPath.getName.startsWith(s"$level1=")
      leaf <- fs.listStatus(cellDir.getPath).toSeq
      if leaf.isDirectory && leaf.getPath.getName.startsWith("ingest_batch=")
      b = leaf.getPath.getName.stripPrefix("ingest_batch=").toLong
      if b >= 0 && b <= committed
    } yield s"${cellDir.getPath.getName}/${leaf.getPath.getName}"
    if (leafRels.isEmpty) return false

    val tmp = foldTmp(table)
    fs.delete(tmp, true)
    val df = spark.read.option("basePath", tablePath)
      .parquet(leafRels.map(r => s"$tablePath/$r"): _*)
    spread(df.drop("ingest_batch"))
      .write.mode("overwrite").partitionBy(level1).parquet(tmp.toString)

    // enumerate the fold output and its exact destinations; the fold
    // prefix keys file names to this fold's watermark (uniqueness comes
    // from the part-file UUIDs; recovery comes from the marker list)
    val moves: Seq[(Path, String)] = enumerateTmp(fs, tmp, level1).map {
      case (src, cellName, f) =>
        (src, s"$cellName/ingest_batch=-1/fold$committed-$f")
    }

    writeMarker(fs, markerScratch(table), stagedMarker(table),
      moves.map { case (_, rel) => s"F $rel" } ++ leafRels.map(r => s"D $r"))
    moves.foreach { case (src, rel) =>
      val dst = new Path(table, rel)
      fs.mkdirs(dst.getParent)
      require(fs.rename(src, dst), s"fold: could not move $src to $dst")
    }
    maybeFail("before-commit")
    require(fs.rename(stagedMarker(table), commitMarker(table)),
      s"fold: could not commit ${stagedMarker(table)}")
    maybeFail("before-cleanup")
    leafRels.foreach(r => fs.delete(new Path(table, r), true))
    fs.delete(tmp, true)
    bumpEpoch(fs, table) // before the marker clears: readers see one or the other
    fs.delete(commitMarker(table), false)
    true
  }

  /** Rewrite the `ingest_batch=-1` resident layer of every cell whose
    * `-1` file count EXCEEDS `maxFiles` back to one spread-bound's worth
    * of files — the minor compaction that bounds resident-file accrual
    * for STATIONARY streams. [[foldCommitted]] adds ≤ spread-bound files
    * per cell per fold and its documented flattening remedy is a
    * rebuild, justified by "the drift trigger has usually asked for one
    * by then" — but a stationary corpus (the common ingest case) never
    * drifts, so a year-long ingest at `compactEvery=N` accrues
    * folds × bound files per cell with only an O(corpus + retraining)
    * rebuild as remedy that nothing ever demands. This is the
    * batch-priced answer: per-cell, it reads and rewrites ONLY the
    * accrued (over-bound) cells' resident files — under-bound cells'
    * files are never read, never listed into the scan, never touched —
    * so cost scales with the accrued cells' data, not the index.
    *
    * Same marker protocol as the fold (`_fold_staged`/`_fold_commit`,
    * with `DF <file>` delete-file entries next to the fold's
    * `D <leaf-dir>` entries), so every existing guard — writer debris
    * refusal, reader marker-window wait, [[recover]] rollback/forward —
    * covers it with no new states: a crash before commit rolls BACK
    * (delete the staged replacement files; the originals were never
    * touched), after commit rolls FORWARD (delete the listed originals;
    * every replacement is in place by construction). Single-writer
    * contract, like the fold.
    *
    * Returns the number of cells compacted (0 = nothing over bound). */
  def compactResident(spark: SparkSession, tablePath: String, maxFiles: Int,
      spread: DataFrame => DataFrame, level1: String = "cell"): Int = {
    require(maxFiles >= 1, s"maxFiles must be >= 1: $maxFiles")
    rewriteResident(spark, tablePath, maxFiles, identity, spread, level1)
  }

  /** The marker-staged resident-layer rewrite [[compactResident]] and
    * the delete purges share: select cells whose `-1` file count
    * exceeds `minFilesExclusive` (0 = every non-empty cell), run their
    * rows through `transform` (identity for a compaction; the
    * tombstone anti-join for a purge), re-spread, and swap the files
    * in under the fold marker protocol — crash at any point rolls back
    * or forward through the existing [[recover]]. */
  private[operators] def rewriteResident(spark: SparkSession, tablePath: String,
      minFilesExclusive: Int, transform: DataFrame => DataFrame,
      spread: DataFrame => DataFrame, level1: String = "cell"): Int = {
    val table = new Path(tablePath)
    val fs = fsOf(spark, table)
    require(fs.exists(table), s"no index table at $table")
    invalidateGuards(tablePath)
    requireNoDebris(fs, table)

    // accrual-sized listing: every cell's -1 leaf is LISTED (that is the
    // accrual metric), but only selected cells' files enter the scan
    val overBound: Seq[(String, Seq[String])] = (for {
      cellDir <- fs.listStatus(table).toSeq
      if cellDir.isDirectory && cellDir.getPath.getName.startsWith(s"$level1=")
      resident = new Path(cellDir.getPath, "ingest_batch=-1")
      if fs.exists(resident)
      files = fs.listStatus(resident).toSeq
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      if files.size > minFilesExclusive
    } yield cellDir.getPath.getName ->
      files.map(f => s"${cellDir.getPath.getName}/ingest_batch=-1/${f.getPath.getName}"))
    if (overBound.isEmpty) return 0
    val oldFileRels = overBound.flatMap(_._2)

    val tmp = foldTmp(table)
    fs.delete(tmp, true)
    val df = spark.read.option("basePath", tablePath)
      .parquet(oldFileRels.map(r => s"$tablePath/$r"): _*)
    spread(transform(df.drop("ingest_batch")))
      .write.mode("overwrite").partitionBy(level1).parquet(tmp.toString)

    // `rc-` keys replacement files to this compaction (uniqueness from
    // the part-file UUIDs; recovery from the marker list, as the fold)
    val moves: Seq[(Path, String)] = enumerateTmp(fs, tmp, level1).map { case (src, cellName, f) =>
      (src, s"$cellName/ingest_batch=-1/rc-$f")
    }
    writeMarker(fs, markerScratch(table), stagedMarker(table),
      moves.map { case (_, rel) => s"F $rel" } ++ oldFileRels.map(r => s"DF $r"))
    moves.foreach { case (src, rel) =>
      val dst = new Path(table, rel)
      fs.mkdirs(dst.getParent)
      require(fs.rename(src, dst), s"compact-resident: could not move $src to $dst")
    }
    maybeFail("before-commit")
    require(fs.rename(stagedMarker(table), commitMarker(table)),
      s"compact-resident: could not commit ${stagedMarker(table)}")
    maybeFail("before-cleanup")
    oldFileRels.foreach(r => fs.delete(new Path(table, r), false))
    fs.delete(tmp, true)
    bumpEpoch(fs, table) // before the marker clears: readers see one or the other
    fs.delete(commitMarker(table), false)
    overBound.size
  }

  private def enumerateTmp(fs: FileSystem, tmp: Path,
      level1: String): Seq[(Path, String, String)] =
    for {
      cellDir <- fs.listStatus(tmp).toSeq
      if cellDir.isDirectory && cellDir.getPath.getName.startsWith(s"$level1=")
      f <- fs.listStatus(cellDir.getPath).toSeq
      if f.isFile && f.getPath.getName.endsWith(".parquet")
    } yield (f.getPath, cellDir.getPath.getName, f.getPath.getName)

  /** Deterministic crash recovery for [[foldCommitted]] and
    * [[compactResident]] (and for the pre-r15 rename-swap's debris).
    * Idempotent; safe to call on a clean table (returns None). Returns a
    * human-readable account of what was repaired. */
  def recover(spark: SparkSession, tablePath: String): Option[String] = {
    val table = new Path(tablePath)
    val fs = fsOf(spark, table)
    invalidateGuards(tablePath) // recovery changes on-disk state
    val commit = commitMarker(table)
    val staged = stagedMarker(table)
    if (fs.exists(commit)) {
      // every fold/replacement file is in place (the marker renames only
      // after all moves) — finish: delete the listed leaf dirs (fold)
      // and original files (resident compaction) + staging
      val lines = readMarker(fs, commit)
      val dirs = lines.collect { case s if s.startsWith("D ") => s.drop(2) }
      val files = lines.collect { case s if s.startsWith("DF ") => s.drop(3) }
      dirs.foreach(r => fs.delete(new Path(table, r), true))
      files.foreach(r => fs.delete(new Path(table, r), false))
      fs.delete(foldTmp(table), true)
      bumpEpoch(fs, table)
      fs.delete(commit, false)
      Some(s"rolled FORWARD an interrupted maintenance op on $table " +
        s"(deleted ${dirs.size} already-folded leaf dirs, " +
        s"${files.size} already-replaced resident files)")
    } else if (fs.exists(staged)) {
      // originals all intact — undo the fold: delete whatever fold
      // files were already moved in, plus staging
      val files = readMarker(fs, staged).collect { case s if s.startsWith("F ") =>
        s.drop(2) }
      files.foreach(r => fs.delete(new Path(table, r), false))
      fs.delete(foldTmp(table), true)
      bumpEpoch(fs, table)
      fs.delete(staged, false)
      Some(s"rolled BACK an interrupted fold of $table " +
        s"(removed ${files.size} staged fold files; originals intact)")
    } else if (fs.exists(markerScratch(table)) || fs.exists(foldTmp(table))) {
      // crashed before the staged marker existed: nothing was moved
      fs.delete(markerScratch(table), false)
      fs.delete(foldTmp(table), true)
      Some(s"removed pre-stage fold scratch of $table (nothing had moved)")
    } else recoverLegacySwap(fs, table)
  }

  /** Recovery for the r14 rename-swap protocol's crash states, so an
    * index left broken by the OLD code heals instead of the advisor's
    * worst case (a later compact deleting the stranded original). */
  private def recoverLegacySwap(fs: FileSystem, table: Path): Option[String] = {
    val old = legacyOld(table)
    val tmp = legacyTmp(table)
    val tmpComplete = fs.exists(new Path(tmp, "_SUCCESS"))
    if (!fs.exists(old) && !fs.exists(tmp)) None
    else if (!fs.exists(table) && fs.exists(old)) {
      // the fatal window: live table renamed aside, replacement not in
      if (tmpComplete) {
        require(fs.rename(tmp, table), s"legacy recover: could not move $tmp to $table")
        fs.delete(old, true)
        Some(s"legacy swap: installed the complete staged table at $table, removed the old copy")
      } else {
        require(fs.rename(old, table), s"legacy recover: could not move $old back to $table")
        fs.delete(tmp, true)
        Some(s"legacy swap: restored $table from its renamed-aside copy")
      }
    } else {
      // live table present: staging/aside copies are residue
      fs.delete(tmp, true)
      fs.delete(old, true)
      Some(s"legacy swap: removed stale staging dirs beside $table")
    }
  }

  private[operators] def writeMarker(fs: FileSystem, scratch: Path, dest: Path,
      lines: Seq[String]): Unit = {
    val out = fs.create(scratch, true)
    try out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(scratch, dest), s"could not publish marker $dest")
  }

  private[operators] def readMarker(fs: FileSystem, marker: Path): Seq[String] = {
    val in = fs.open(marker)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  /** One driver-side FS walk over `tablePath`: 1 + cells + leaves LIST
    * calls, no data read, no Spark job. Note this is MORE listing than a
    * fold pays (a fold enumerates only batch leaves; this also lists
    * every resident `-1` leaf's files, since the accrual metric lives
    * there) — trivial on HDFS-likes, but on a rate-limited object store
    * poll it at maintenance cadence, not per query. Gated like any
    * reader: a live fold's marker window delays it; crash debris fails
    * with the remedy. */
  def layoutStats(spark: SparkSession, tablePath: String,
      level1: String = "cell"): IndexLayoutStats = {
    val table = new Path(tablePath)
    val fs = fsOf(spark, table)
    require(fs.exists(table), s"no index table at $table")
    requireReadConsistent(fs, table)
    var cells = 0; var batchLeaves = 0; var maxBatchId = -1L
    var residentFiles = 0L; var maxResident = 0; var batchFiles = 0L
    for {
      cellDir <- fs.listStatus(table)
      if cellDir.isDirectory && cellDir.getPath.getName.startsWith(s"$level1=")
    } {
      cells += 1
      for {
        leaf <- fs.listStatus(cellDir.getPath)
        if leaf.isDirectory && leaf.getPath.getName.startsWith("ingest_batch=")
      } {
        val b = leaf.getPath.getName.stripPrefix("ingest_batch=").toLong
        val n = fs.listStatus(leaf.getPath)
          .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        if (b < 0) {
          residentFiles += n
          if (n > maxResident) maxResident = n
        } else {
          batchLeaves += 1
          batchFiles += n
          if (b > maxBatchId) maxBatchId = b
        }
      }
    }
    IndexLayoutStats(cells, batchLeaves, maxBatchId, residentFiles, maxResident, batchFiles)
  }

  /** The shared advice rule over one table's [[IndexLayoutStats]] — see
    * [[MaintenanceAdvice]] for the precedence contract. `residentBound`
    * is the per-cell `-1` file threshold (the index family's
    * [[Similarity.residentBound]] derivation); `foldLeavesPerCell` is
    * how many unfolded batches' worth of leaves to tolerate;
    * `pendingTombstones` is the family's count of deleted ids not yet
    * physically purged (0 when deletion is unused), advised against
    * `maxTombstones` — the default 100 000 sits where the measured
    * trade flips (SCALE.md 17d: a 210 K-id ledger adds ~0.3-0.4 s of
    * broadcast anti-join to every probe vs a 37-89 s one-time purge —
    * amortized after ~100-250 queries). Purge sits BELOW fold in the
    * precedence; `unfoldedTombstones` (r18) is the PRECISE fold-first
    * signal — whether any tombstoned id still has rows in an unfolded
    * lane ([[tombstonesUnfolded]], computed by the family only when
    * pending is over threshold). r17 used batchLeaves > 0 as the proxy,
    * which a live stream never clears (its current batch is always
    * unfolded), so the purge advice could never fire in-stream. */
  private[operators] def advise(layout: IndexLayoutStats,
      driftTripped: Boolean, residentBound: Int,
      foldLeavesPerCell: Int, pendingTombstones: Long = 0L,
      maxTombstones: Long = 100000L,
      unfoldedTombstones: Boolean = false): MaintenanceAdvice = {
    val foldThreshold = foldLeavesPerCell.toLong * layout.cells
    if (driftTripped) MaintenanceAdvice("rebuild",
      "the drift verdict tripped — retrain on the current corpus " +
        "(a rebuild re-lays-out too, subsuming both compactions)", layout)
    else if (layout.batchLeaves > foldThreshold) MaintenanceAdvice("fold",
      s"${layout.batchLeaves} unfolded batch leaves exceed the tolerated " +
        s"$foldThreshold ($foldLeavesPerCell per cell x ${layout.cells} cells) — " +
        "every unfolded leaf is a directory every reader must list", layout)
    else if (pendingTombstones > maxTombstones)
      // the purge requires the TOMBSTONED rows to be folded (a deleted
      // row in an unfolded lane would survive it) — fold first exactly
      // when that is the case, not whenever any leaf exists
      if (unfoldedTombstones) MaintenanceAdvice("fold",
        s"$pendingTombstones tombstoned ids await physical removal " +
          s"(> $maxTombstones) and some still have rows in unfolded " +
          "batch lanes — fold past them first", layout)
      else MaintenanceAdvice("purge-deletes",
        s"$pendingTombstones tombstoned ids await physical removal " +
          s"(> $maxTombstones) — every probe pays their broadcast " +
          "anti-join; their rows are all folded, so the purge can run now", layout)
    else if (layout.maxResidentFilesPerCell > residentBound)
      MaintenanceAdvice("compact-resident",
        s"a cell carries ${layout.maxResidentFilesPerCell} resident files " +
          s"(bound $residentBound) — fold-file accrual; rewrite just the " +
          "over-bound cells", layout)
    else MaintenanceAdvice("none",
      s"layout healthy: ${layout.batchLeaves} batch leaves (<= $foldThreshold), " +
        s"max ${layout.maxResidentFilesPerCell} resident files/cell " +
        s"(<= $residentBound), ${pendingTombstones} pending tombstones " +
        s"(<= $maxTombstones), drift quiet", layout)
  }

  // every guard instance, so fold/recover can invalidate a table's memo
  // across index families without knowing which guard owns it
  private val allGuards =
    new java.util.concurrent.ConcurrentLinkedQueue[TwoLevelLayoutGuard]()
  private def invalidateGuards(tablePath: String): Unit =
    allGuards.forEach(_.invalidate(tablePath))

  /** Memoizing two-level-layout + debris guard, one instance per index
    * family. The layout verdict cannot change once passed (every writer
    * emits the two-level layout), so a streaming ingest pays ONE FS
    * check per (JVM, path); a FAILED check is never cached — the remedy
    * changes on-disk state, so a retry must re-look. Debris is checked
    * inside the same memoized visit, which is sound because the memo is
    * INVALIDATED whenever this JVM starts a fold or a recovery on the
    * path (debris can only appear via this JVM's own fold — the single
    * writer — or via a crash, which empties the memo with the JVM):
    * the next append after any fold re-checks and refuses on leftovers
    * instead of appending around them. */
  private[graft] final class TwoLevelLayoutGuard(rebuildRemedy: String) {
    private val verified = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    private val checks = new java.util.concurrent.atomic.AtomicLong(0)
    private[graft] def count: Long = checks.get()
    private[graft] def reset(): Unit = { verified.clear(); checks.set(0) }
    private[IndexMaintenance] def invalidate(tablePath: String): Unit =
      verified.remove(tablePath)
    allGuards.add(this)

    def require(spark: SparkSession, tablePath: String,
        level1: String = "cell"): Unit = {
      if (verified.contains(tablePath)) return
      checks.incrementAndGet()
      val table = new Path(tablePath)
      val fs = fsOf(spark, table)
      requireNoDebris(fs, table)
      val oldLayout = fs.exists(table) && fs.listStatus(table)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$level1="))
        .exists(d => fs.listStatus(d.getPath)
          .exists(c => c.isFile && c.getPath.getName.endsWith(".parquet")))
      if (oldLayout) throw new IllegalStateException(
        s"index table at $tablePath uses the flat partitionBy($level1) layout; " +
          "appending batch-keyed rows would mix partition depths and break " +
          s"partition discovery. $rebuildRemedy")
      verified.add(tablePath)
    }
  }
}

/** One actionable maintenance recommendation, folding the three signals
  * the scaladocs previously told operators to juggle by hand — the
  * drift verdict (when to RETRAIN), batch-leaf accrual (when to FOLD),
  * and resident-file accrual (when to COMPACT the `-1` layer) — into a
  * single precedence-ordered verdict ([[Similarity.maintenanceAdvice]] /
  * [[Pq.maintenanceAdvice]]):
  *
  *  - `rebuild`: the caller's drift verdict tripped. A rebuild retrains
  *    AND flattens, so it subsumes both compactions — nothing else need
  *    run first.
  *  - `fold`: unfolded batch leaves exceed the tolerated accrual
  *    (every unfolded leaf is a directory every reader must list).
  *  - `purge-deletes` (r17): pending tombstones exceed the tolerated
  *    count — every probe pays their broadcast anti-join; below fold
  *    in precedence because the purge requires a folded index anyway.
  *  - `compact-resident`: some cell's `-1` file count exceeds the
  *    bound (fold-file accrual — the stationary-stream signal).
  *  - `none`: healthy.
  *
  * The drift verdict is passed IN (from [[Similarity.shouldRetrain]] /
  * [[Pq.shouldRetrain]], which the streaming shape already evaluates
  * per batch) rather than recomputed here: advice is a layout-stats-
  * priced call — one FS walk, no data read — and drift needs a recent
  * batch only the ingest loop has.
  *
  * @param action  rebuild | fold | compact-resident | none
  * @param reason  the tripped signal, with its measured value and threshold
  * @param layout  the stats the verdict was computed from */
final case class MaintenanceAdvice(action: String, reason: String,
  layout: IndexLayoutStats)

/** Layout health of one two-level index table — the operational twin of
  * the DISTRIBUTION health the drift monitors report: drift says when to
  * RETRAIN ([[Similarity.shouldRetrain]] / [[Pq.shouldRetrain]]); these
  * say when to FOLD (batch-leaf accrual from a streamed ingest — every
  * unfolded leaf is a directory every reader must list) and how much
  * fold-file accrual the `-1` layer carries (each fold adds at most one
  * spread-bound of files per cell — [[Similarity.cellSpreadBound]]; a
  * rebuild flattens it back to one).
  *
  * @param cells          cell directories present
  * @param batchLeaves    `ingest_batch >= 0` leaf dirs (unfolded batches
  *                       × their cells) — what a fold removes
  * @param maxBatchId     highest batch key on disk (-1 = none)
  * @param residentFiles  data files in the `-1` layer across all cells
  * @param maxResidentFilesPerCell  the accrual metric: a build writes at
  *                       most the spread bound here; each fold may add
  *                       another bound's worth
  * @param batchFiles     data files still under batch leaves
  */
final case class IndexLayoutStats(cells: Int, batchLeaves: Int,
  maxBatchId: Long, residentFiles: Long, maxResidentFilesPerCell: Int,
  batchFiles: Long)
