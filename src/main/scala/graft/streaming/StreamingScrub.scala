package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.operators.Curation.scrubSpans]]
  * (broadcast-bench regime): remove every character span of an incoming
  * document covered by a k-char window that appears verbatim in the
  * benchmark set, in-flight.
  *
  * The batch operator's span merge is a windowed aggregation — not
  * available on unbounded streams. But span removal against a FIXED
  * bench set is per-document local: with the bench's distinct k-grams
  * broadcast as an in-memory set, each document scans its own windows,
  * merges its own covered runs, and emits cleaned text in one pass —
  * ZERO state, zero shuffle, the stateless shape that curates a 100 TB
  * ingest stream per micro-batch instead of in a second batch pass.
  * (This is also the batch fast-path when the bench fits in memory;
  * the batch operator exists for benches that don't.)
  *
  * Semantics are pinned to the batch operator row-for-row
  * (StreamingScrubSpec): same code-point window definition, same exact
  * string membership (no hash-collision removal class), same
  * (id, clean_text, n_removed) output. */
object StreamingScrub {

  /** Code-point k-windows of a text (the same window definition as
    * [[graft.operators.Dedup.substringDedup]]). */
  private[streaming] def windowsOf(text: String, k: Int): Iterator[String] = {
    if (text == null) Iterator.empty
    else {
      val cps = text.codePoints.toArray
      if (cps.length < k) Iterator.empty
      else Iterator.range(0, cps.length - k + 1).map(i => new String(cps, i, k))
    }
  }

  /** One document against the gram set: mark covered code points, emit
    * the rest. O(n) interval bookkeeping (overlapping hits extend the
    * filled run, never re-fill). */
  private[streaming] def scrubOne(text: String, grams: Set[String], k: Int): (String, Long) = {
    if (text == null) return (null, 0L)
    val cps = text.codePoints.toArray
    val n = cps.length
    if (n < k || grams.isEmpty) return (text, 0L)
    val covered = new Array[Boolean](n)
    var filledTo = 0 // exclusive end of the highest filled index
    var i = 0
    while (i + k <= n) {
      if (grams.contains(new String(cps, i, k))) {
        java.util.Arrays.fill(covered, math.max(i, filledTo), i + k, true)
        filledTo = i + k
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder
    var removed = 0L
    var j = 0
    while (j < n) {
      if (covered(j)) removed += 1 else sb.appendCodePoint(cps(j))
      j += 1
    }
    (sb.toString, removed)
  }

  /** @param docs         streaming (or batch) DataFrame of documents
    * @param bench        BATCH benchmark corpus — small by contract
    *                     (the broadcast-bench contract of the batch
    *                     operator); its distinct k-grams are collected
    *                     once at plan-build time and broadcast
    * @param k            window length in code points
    * @param maxBenchGrams guard on the driver-side gram set: the bench's
    *                     window count (upper-bounded by a cheap aggregate
    *                     before any collect) must stay under this, else
    *                     fail loudly instead of OOMing the driver. The
    *                     default (~8M grams ≈ 1–2 GiB of boxed strings at
    *                     k=40) fits a standard driver heap; benches beyond
    *                     it belong in the batch operator
    *                     [[graft.operators.Curation.scrubSpans]], whose
    *                     hashed/non-broadcast path never materializes the
    *                     gram set in one JVM.
    * Returns (idCol, clean_text, n_removed) per incoming document. */
  def scrubStream(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, k: Int = 40,
      maxBenchGrams: Long = 8000000L): DataFrame = {
    require(k >= 2, "window length k must be >= 2")
    // UTF-16 length upper-bounds the code-point count, so
    // sum(max(length - (k-1), 0)) upper-bounds the gram count — one cheap
    // aggregate over the (small-by-contract) bench before we collect it.
    val gramBound = bench
      .select(sum(greatest(length(col(benchTextCol)) - (k - 1), lit(0))).as("g"))
      .collect()(0) match { case r if r.isNullAt(0) => 0L case r => r.getLong(0) }
    require(gramBound <= maxBenchGrams,
      s"bench has up to $gramBound k-grams (> maxBenchGrams=$maxBenchGrams); " +
        "collecting them would risk an un-guarded driver OOM. Use " +
        "graft.operators.Curation.scrubSpans (hashed, non-broadcast) for " +
        "benches that do not fit in driver memory, or raise maxBenchGrams " +
        "explicitly if the driver heap allows it.")
    val grams: Set[String] = bench.select(col(benchTextCol)).collect()
      .iterator.flatMap(r => windowsOf(r.getString(0), k)).toSet
    val bc = docs.sparkSession.sparkContext.broadcast(grams)
    val scrub = udf { (text: String) =>
      val (clean, removed) = scrubOne(text, bc.value, k)
      (clean, removed)
    }
    docs.select(col(idCol), scrub(col(textCol)).as("s"))
      .select(col(idCol), col("s._1").as("clean_text"), col("s._2").as("n_removed"))
  }
}
