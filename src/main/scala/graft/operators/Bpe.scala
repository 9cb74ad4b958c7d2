package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and encoding — the "train a
  * tokenizer on the corpus" stage of an LLM data pipeline (Sennrich et al.
  * '16 merge learning; GPT-2-style lowest-rank-first encoding), built the
  * way production trainers actually scale:
  *
  *  - The corpus-sized work is ONE distributed pass: pre-tokenize (same
  *    regex family as [[TextAnalysis.bpeTokenCount]]) and aggregate the
  *    word-frequency table (map-side combinable groupBy). Heaps' law makes
  *    that table orders of magnitude smaller than the corpus.
  *  - The table is capped to the `maxWords` most frequent words
  *    (deterministic count-desc/word-asc tiebreak) and collected — a
  *    BOUNDED driver set by construction, the same discipline as the IVF
  *    centroid sample ([[Similarity]]). Merge learning is then the exact
  *    classic loop on (word, count) pairs: count adjacent symbol pairs
  *    weighted by word frequency, merge the argmax, repeat. This is how
  *    sentencepiece/HF trainers run too — the merge loop is inherently
  *    sequential (merge i+1 depends on i), so the scalable architecture is
  *    "distribute the counting, bound the table, train single-node,
  *    broadcast the result", not a distributed merge loop.
  *  - Encoding is distributed and stateless: the merge ranks broadcast to
  *    executors, each pre-token is segmented greedily (lowest-rank pair
  *    first), with a per-JVM memo cache because natural-language words
  *    repeat massively. Tight per-row loop → UDF by design (the same
  *    justification as minhash banding).
  *
  * No word-end marker is appended: merges never cross pre-token boundaries
  * (the regex already splits letters/digits/punctuation), so segmentations
  * concatenate losslessly back to the pre-token — asserted in BpeSpec.
  *
  * Training has no SQL oracle (an iterative argmax loop is not expressible
  * in one query) — correctness is pinned by known-answer tests on the
  * classic low/lower/newest/widest corpus and lossless-segmentation
  * properties, the `lang_id`/`compress_ratio` precedent.
  */
object Bpe {

  /** Letter runs | digit runs | single other-symbols — the pre-tokenizer. */
  val PreToken = "\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]"

  /** One learned merge: `left`+`right` → `left+right`, applied in `rank`
    * order (0 = first learned = highest priority). */
  final case class Merge(rank: Int, left: String, right: String)

  /** Distributed pass: corpus → (word, count) table capped at `maxWords`. */
  def wordFrequencies(df: DataFrame, textCol: String, maxWords: Int): DataFrame =
    df.select(explode(regexp_extract_all(col(textCol), lit(PreToken), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("word"))
      .limit(maxWords)

  /** Learn `numMerges` merges from the capped word-frequency table.
    * Deterministic: pair argmax tiebreaks on (left, right) ascending; the
    * loop stops early when no pair occurs twice. */
  def trainMerges(df: DataFrame, textCol: String,
                  numMerges: Int, maxWords: Int = 65536): Seq[Merge] = {
    val table = wordFrequencies(df, textCol, maxWords).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    learn(table, numMerges)
  }

  /** The classic merge loop on a bounded (word, count) table. Exposed for
    * tests; `table` must already be capped. */
  def learn(table: Array[(String, Long)], numMerges: Int): Seq[Merge] = {
    // each word as a mutable symbol sequence; counts never change
    val words = table.map { case (w, c) =>
      (scala.collection.mutable.ArrayBuffer(w.map(_.toString): _*), c)
    }
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var continue = true
    while (rank < numMerges && continue) {
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairs.update(p, pairs.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      val best = pairs.filter(_._2 >= 2L)
      if (best.isEmpty) continue = false
      else {
        // argmax with deterministic tiebreak: count desc, then pair asc
        val ((l, r), _) = best.minBy { case ((a, b), c) => (-c, a, b) }
        merges += Merge(rank, l, r)
        val fused = l + r
        words.foreach { case (syms, _) =>
          var i = 0
          while (i < syms.length - 1) {
            if (syms(i) == l && syms(i + 1) == r) {
              syms.update(i, fused); syms.remove(i + 1)
              // do not back up: merges apply left-to-right, non-overlapping
            } else i += 1
          }
        }
        rank += 1
      }
    }
    merges.result()
  }

  /** Merges as a DataFrame (rank, left, right, merged) — the persistable
    * tokenizer artifact. */
  def trainDf(spark: SparkSession, df: DataFrame, textCol: String,
              numMerges: Int, maxWords: Int = 65536): DataFrame = {
    import spark.implicits._
    trainMerges(df, textCol, numMerges, maxWords)
      .map(m => (m.rank, m.left, m.right, m.left + m.right))
      .toDF("rank", "left", "right", "merged")
  }

  /** Segment one pre-token with the given ranks map — greedy lowest-rank
    * pair first (GPT-2's algorithm). */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms = word.map(_.toString).toArray
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0 || bestRank == Int.MaxValue) done = true
      else {
        // merge ALL occurrences of this exact pair, left to right
        val l = syms(bestIdx); val r = syms(bestIdx + 1); val fused = l + r
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            out += fused; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
        done = syms.length < 2
      }
    }
    syms
  }

  // per-JVM memo: natural-language words repeat massively, so executors
  // segment each distinct (ranks-id, word) once. Bounded to keep the cache
  // from growing with corpus vocabulary on very long runs.
  private val memoCap = 1 << 17
  private val memo =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(Int, String), Array[String]](4096, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(Int, String), Array[String]]): Boolean =
          size() > memoCap
      })

  /** Distributed encode: (id, tokens, n_tokens) per document. The ranks
    * map broadcasts; per-row work is a tight loop over pre-tokens. */
  def encode(df: DataFrame, idCol: String, textCol: String,
             merges: Seq[Merge]): DataFrame = {
    val spark = df.sparkSession
    val ranks: Map[(String, String), Int] =
      merges.map(m => (m.left, m.right) -> m.rank).toMap
    val bc = spark.sparkContext.broadcast(ranks)
    // content-derived cache key, computed ONCE on the driver: identity
    // hashes of deserialized broadcast values can be reused across model
    // lifetimes in a long-lived executor, which would serve stale
    // segmentations; content hashes only collide between models that
    // (almost surely) segment identically anyway
    val modelKey = ranks.hashCode()
    val pat = java.util.regex.Pattern.compile(PreToken)
    val tokenize = udf { (text: String) =>
      if (text == null) Array.empty[String]
      else {
        val rk = bc.value
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        val m = pat.matcher(text)
        while (m.find()) {
          val w = m.group()
          var toks = memo.get((modelKey, w))
          if (toks == null) {
            toks = encodeWord(w, rk)
            memo.put((modelKey, w), toks)
          }
          out ++= toks
        }
        out.toArray
      }
    }
    df.select(col(idCol), tokenize(col(textCol)).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")))
  }

  /** Corpus token frequencies after encoding — the "what vocabulary did we
    * learn" report (top `topK` by count desc, token asc). */
  def tokenStats(df: DataFrame, idCol: String, textCol: String,
                 merges: Seq[Merge], topK: Int): DataFrame =
    encode(df, idCol, textCol, merges)
      .select(explode(col("tokens")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("token"))
      .limit(topK)

  /** Complete tokenizer artifact: merges + the base character alphabet
    * seen at train time. Token ids are deterministic: base chars sorted
    * ascending get 0..B-1, merged tokens follow in rank order. */
  final case class Model(merges: Seq[Merge], baseChars: Seq[String]) {
    /** (token, id) for every encodable token. */
    lazy val vocab: Map[String, Int] = {
      val base = baseChars.sorted.zipWithIndex
      val merged = merges.sortBy(_.rank)
        .map(m => m.left + m.right).zipWithIndex
        .map { case (t, i) => (t, i + baseChars.length) }
      (base ++ merged).toMap
    }
  }

  /** Train the full artifact: one distributed word-frequency pass feeds
    * both the merge loop and the base alphabet. */
  def trainModel(df: DataFrame, textCol: String,
                 numMerges: Int, maxWords: Int = 65536): Model = {
    val table = wordFrequencies(df, textCol, maxWords).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val chars = table.iterator.flatMap(_._1.iterator)
      .map(_.toString).toSet.toSeq.sorted
    Model(learn(table, numMerges), chars)
  }

  /** Model as a DataFrame (token_id, token) — the persistable vocab. */
  def vocabDf(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.vocab.toSeq.map { case (t, i) => (i, t) }
      .sortBy(_._1).toDF("token_id", "token")
  }

  /** Persist the tokenizer artifact: merges and base alphabet as two
    * small parquet tables under `path` — train once on the 100 TB
    * corpus, encode many ingest batches against the same vocabulary
    * (the [[Similarity]] persisted-IVF-index discipline). */
  def saveModel(model: Model, spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    model.merges.map(m => (m.rank, m.left, m.right))
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/merges")
    model.baseChars.toDF("ch")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/chars")
  }

  /** Reload a persisted model; token ids are identical to the trained
    * one's (vocab assignment is deterministic in rank/char order). */
  def loadModel(spark: SparkSession, path: String): Model = {
    val merges = spark.read.parquet(s"$path/merges")
      .orderBy("rank").collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2))).toSeq
    val chars = spark.read.parquet(s"$path/chars")
      .collect().map(_.getString(0)).toSeq.sorted
    Model(merges, chars)
  }

  /** Distributed encode to token IDS — tensorization-ready. Tokens whose
    * characters were never seen at train time map to -1 (UNK); callers
    * count them via `n_unk`. Output: (id, token_ids, n_tokens, n_unk). */
  def encodeIds(df: DataFrame, idCol: String, textCol: String,
                model: Model): DataFrame = {
    val spark = df.sparkSession
    val ranksMap = model.merges.map(m => (m.left, m.right) -> m.rank).toMap
    val bcRanks = spark.sparkContext.broadcast(ranksMap)
    val bcVocab = spark.sparkContext.broadcast(model.vocab)
    val pat = java.util.regex.Pattern.compile(PreToken)
    // same content-derived memo key rationale as in encode()
    val modelKey = ranksMap.hashCode()
    val toIds = udf { (text: String) =>
      if (text == null) Array.empty[Int]
      else {
        val rk = bcRanks.value; val vb = bcVocab.value
        val out = scala.collection.mutable.ArrayBuffer.empty[Int]
        val m = pat.matcher(text)
        while (m.find()) {
          val w = m.group()
          var toks = memo.get((modelKey, w))
          if (toks == null) { toks = encodeWord(w, rk); memo.put((modelKey, w), toks) }
          var i = 0
          while (i < toks.length) { out += vb.getOrElse(toks(i), -1); i += 1 }
        }
        out.toArray
      }
    }
    df.select(col(idCol), toIds(col(textCol)).as("token_ids"))
      .withColumn("n_tokens", size(col("token_ids")))
      .withColumn("n_unk",
        size(filter(col("token_ids"), (c: org.apache.spark.sql.Column) => c === lit(-1))))
  }
}
