package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window preparation for LLM training: fixed-size sliding-window
  * document chunking and deterministic sequence packing.
  *
  * Both operators are pure narrow/window transformations — chunking is a
  * per-row explode (no shuffle at all), packing is one shuffle on the
  * shard key — so they scale linearly with corpus size. Beyond-reference
  * scope (SURVEY §2.8): the reference engine has no notion of token
  * windows; these are the operations a training-data pipeline runs after
  * curation and before tensorization.
  */
object Chunking {

  /** Split each document into word-window chunks of `chunkSize` words,
    * windows starting every `stride` words (overlap = chunkSize − stride).
    *
    * Contract (engine-reproducible, no RNG):
    *  - words are the literal single-space split of `textCol`;
    *  - chunk starts are 0, stride, 2·stride, … while start < n_words,
    *    so every word is covered and the final chunk may be short;
    *  - chunk_id is the start index / stride.
    *
    * Scale: `posexplode(sequence(...))` is a generator inside whole-stage
    * codegen — per-row fan-out with zero shuffle; output size is
    * ~n/stride rows per doc. The words array stays inside the projection
    * (never shuffled). */
  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int = 64,
      stride: Int = 48): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val words = split(col(textCol), " ")
    // null text yields no chunks (size(null) is -1 under default ANSI-off
    // semantics, and sequence(0, -2, s) THROWS — scraped corpora have
    // null rows routinely, so guard rather than crash)
    val n = when(col(textCol).isNull, lit(0)).otherwise(size(words))
    df.select(col(idCol), words.as("words"), n.as("n"))
      .filter(col("n") >= 1)
      .select(col(idCol), col("words"), col("n"),
        explode(sequence(lit(0), col("n") - 1, lit(stride))).as("start"))
      .select(
        col(idCol),
        (col("start") / stride).cast("int").as("chunk_id"),
        array_join(slice(col("words"), col("start") + 1, lit(chunkSize)), " ")
          .as("chunk_text"),
        least(lit(chunkSize), col("n") - col("start")).cast("int").as("n_words"))
  }

  /** Deterministic offset packing: assign documents to fixed token-budget
    * packs, greedily and contiguously within a deterministic shard.
    *
    * Documents are sharded by the same multiplicative key mixing as
    * [[Curation.shardAssign]] (reproducible across engines and reruns),
    * ordered by mixed key within the shard, and a running token total
    * assigns each document to pack `floor((cumsum − 1) / budget)` — the
    * budget block in which its last token lands. A document is never
    * split across packs; a pack may overflow the budget by at most one
    * document's tokens (the standard greedy-fill trade-off; callers who
    * need hard caps chunk first with [[chunkDocuments]] at
    * chunkSize ≤ budget).
    *
    * Scale: one hash-partition shuffle on `shard` + one window pass; the
    * running sum is O(1) state per partition. Shards keep every partition
    * independent, so 100 TB packs with numShards sized to the cluster. */
  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int = 256,
      numShards: Int = 8): DataFrame = {
    require(budget > 0 && numShards > 0, "budget and numShards must be positive")
    val mixed = Curation.mixKey(col(idCol))
    // null text counts 0 tokens (size(null) = -1 would walk the running
    // sum backward and silently shift every later doc's pack id)
    val toks = when(col(textCol).isNull, lit(0))
      .otherwise(size(split(col(textCol), " ")))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("mixed"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), toks.as("n_tokens"),
        mixed.as("mixed"), pmod(mixed, lit(numShards)).cast("int").as("shard"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .select(col(idCol), col("shard"),
        // clamp: a zero-token doc first in its shard has cum_tokens=0 and
        // floor(-1/budget) would assign pack_id = -1
        greatest(lit(0), floor((col("cum_tokens") - 1) / budget)).cast("int").as("pack_id"),
        col("n_tokens"), col("cum_tokens"))
  }

  /** Per-pack summary of [[packSequences]] — the shape a training loader
    * consumes (pack manifest): document count, token total, and fill rate
    * against the budget. */
  def packSummary(packed: DataFrame, idCol: String, budget: Int): DataFrame =
    packed.groupBy(col("shard"), col("pack_id"))
      .agg(count(col(idCol)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
      .withColumn("fill_pct", round(col("tokens") * 100.0 / budget, 2))

  /** Materialize [[packSequences]] packs as training sequences: document
    * texts concatenated in pack order with an EOS separator — the last
    * transform before tensorization, and the payload a sequence-packing
    * loader actually reads.
    *
    * Determinism: in-pack order is (mixed key, id) — the same total
    * order packSequences assigned by — via a lexicographic struct sort
    * inside the aggregate, so the payload string is byte-stable across
    * engines and reruns. Scale: one id-key join (text never enters the
    * pack window pass) + one groupBy; payload size is bounded by
    * budget · avg-word-len, i.e. a context window, not a corpus. */
  def packPayloads(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int = 256,
      numShards: Int = 8,
      sep: String = " <|eos|> "): DataFrame = {
    val packed = packSequences(df, idCol, textCol, budget, numShards)
    packed.select(col(idCol), col("shard"), col("pack_id"), col("n_tokens"))
      .join(df.select(col(idCol), col(textCol)), Seq(idCol))
      .groupBy(col("shard"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(
              Curation.mixKey(col(idCol)).as("m"),
              col(idCol).as("i"),
              col(textCol).as("t")))),
            x => x.getField("t")),
          sep).as("payload"))
  }

  /** Token-ID training sequences — [[packPayloads]] taken the last mile:
    * [[Bpe.encodeIds]] supplies REAL tokenizer counts (not the
    * whitespace estimate), packs are assigned by those counts, and the
    * payload is the flattened id sequence in pack order with `eosId`
    * appended after every document — the `input_ids` a tensorization
    * loader consumes directly.
    *
    * Same determinism and scale shape as packPayloads: in-pack order is
    * (mixed key, id) via the struct sort, id arrays join in AFTER the
    * pack window pass, payload size is one context window. */
  def packTokenIds(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: Bpe.Model,
      budget: Int = 256,
      numShards: Int = 8,
      eosId: Int = -9): DataFrame = {
    val enc = Bpe.encodeIds(df, idCol, textCol, model)
    val mixed = Curation.mixKey(col(idCol))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("mixed"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = enc
      .select(col(idCol), col("n_tokens"), mixed.as("mixed"),
        pmod(mixed, lit(numShards)).cast("int").as("shard"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .select(col(idCol), col("shard"),
        greatest(lit(0), floor((col("cum_tokens") - 1) / budget)).cast("int").as("pack_id"),
        col("n_tokens"))
    packed.join(enc.select(col(idCol), col("token_ids")), Seq(idCol))
      .groupBy(col("shard"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tokens"),
        flatten(transform(
          array_sort(collect_list(struct(
            Curation.mixKey(col(idCol)).as("m"),
            col(idCol).as("i"),
            concat(col("token_ids"), array(lit(eosId))).as("t")))),
          x => x.getField("t"))).as("input_ids"))
  }

  /** Cross-document duplicate-passage detection — the window-granular
    * approximation of exact-substring dedup (Lee et al. '22): two docs
    * share a passage iff they share a full `chunkSize`-word window at
    * some stride-aligned offset. Finds template spam and quotation-level
    * duplication that whole-document dedup misses.
    *
    * One chunk explode (narrow) + one map-side-combinable groupBy on the
    * passage text. Partial tail windows are excluded — they'd flag short
    * shared sentences, not passages. At 100 TB, shuffle the 8-byte
    * `xxhash64(chunk_text)` instead of the window string and keep
    * `min(chunk_text)` as the exemplar (collision odds ~n²·2⁻⁶⁴ —
    * negligible, and a verify join clears them); the string key here
    * keeps the operator engine-neutral for the oracle. */
  def duplicatePassages(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int = 32,
      stride: Int = 24): DataFrame =
    chunkDocuments(df, idCol, textCol, chunkSize, stride)
      .filter(col("n_words") === chunkSize)
      .groupBy(col("chunk_text"))
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(col(idCol)).as("first_doc"))
      .filter(col("n_docs") > 1)

  // Gear table for content-defined chunking: 256 pseudorandom 64-bit
  // constants derived from the byte value via the splitmix64 finalizer —
  // deterministic, seedless, engine-independent.
  private val gear: Array[Long] = Array.tabulate(256) { b =>
    var z = b.toLong + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Content-defined chunk boundaries (FastCDC-shaped gear hash, Xia et
    * al. '16): a boundary falls where the rolling gear fingerprint masks
    * to zero, so boundaries depend only on LOCAL content. Unlike the
    * stride-aligned windows above, an insertion or deletion re-chunks
    * only its own neighborhood — every downstream chunk hash survives —
    * which is what makes chunk-hash dedup robust to shifted/edited
    * near-duplicates (the rsync/storage-dedup trick applied to text).
    *
    * `avgSize` must be a power of two (the boundary mask); `minSize`
    * suppresses pathological tiny chunks, `maxSize` forces a cut. The
    * per-doc loop is a tight byte-wise UDF (the minhash-banding
    * justification); chunking is embarrassingly parallel, no shuffle.
    * Output: one row per chunk — (id, chunk_idx, chunk_text, chunk_hash)
    * with chunk_hash = xxhash64(chunk_text) for downstream group-bys. */
  def cdcChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      avgSize: Int = 256,
      minSize: Int = 64,
      maxSize: Int = 1024): DataFrame = {
    require(avgSize >= 2 && (avgSize & (avgSize - 1)) == 0,
      s"avgSize must be a power of two, got $avgSize")
    require(minSize >= 1 && minSize < avgSize && avgSize <= maxSize,
      s"need 1 <= minSize < avgSize <= maxSize")
    // FastCDC-style SPREAD mask: log2(avgSize) one-bits distributed over
    // the high bits of the fingerprint. fp = (fp<<1) + gear(b) pushes a
    // byte's influence upward one bit per step, so a low-bits mask (the
    // naive avgSize-1) keys the cut on only the last ~log2(avgSize) bytes
    // — degenerate on low-entropy/repetitive text. High spread bits mix
    // ~48 bytes of history into every cut decision while keeping the same
    // 2^-log2(avgSize) boundary probability (expected chunk size
    // unchanged). Deterministic, engine-independent construction.
    val nbits = java.lang.Integer.numberOfTrailingZeros(avgSize)
    val spacing = math.max(1, 48 / nbits)
    val mask = (0 until nbits).map(i => 1L << (63 - i * spacing)).reduce(_ | _)
    val g = gear
    val cut = udf { (text: String) =>
      if (text == null || text.isEmpty) Array.empty[String]
      else {
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val out = scala.collection.mutable.ArrayBuffer.empty[Int]
        var start = 0
        var i = 0
        var fp = 0L
        while (i < bytes.length) {
          fp = (fp << 1) + g(bytes(i) & 0xFF)
          val len = i - start + 1
          if ((len >= minSize && (fp & mask) == 0L) || len >= maxSize) {
            // never split inside a UTF-8 multibyte sequence: extend to
            // the next char boundary (continuation bytes are 10xxxxxx)
            var e = i + 1
            while (e < bytes.length && (bytes(e) & 0xC0) == 0x80) e += 1
            out += e; start = e; i = e; fp = 0L
          } else i += 1
        }
        if (start < bytes.length) out += bytes.length
        val cuts = out.toArray
        val chunks = new Array[String](cuts.length)
        var s = 0; var j = 0
        while (j < cuts.length) {
          chunks(j) = new String(bytes, s, cuts(j) - s,
            java.nio.charset.StandardCharsets.UTF_8)
          s = cuts(j); j += 1
        }
        chunks
      }
    }
    df.select(col(idCol),
        posexplode(cut(col(textCol))).as(Seq("chunk_idx", "chunk_text")))
      .withColumn("chunk_hash", xxhash64(col("chunk_text")))
  }

  /** Shift-robust duplicate-content report over CDC chunks: content
    * shared across docs groups on the chunk hash even when it sits at
    * different offsets after edits — the failure mode of stride-aligned
    * [[duplicatePassages]]. Only the 8-byte hash shuffles. */
  def cdcDuplicateChunks(
      df: DataFrame, idCol: String, textCol: String,
      avgSize: Int = 256, minSize: Int = 64, maxSize: Int = 1024): DataFrame =
    cdcChunks(df, idCol, textCol, avgSize, minSize, maxSize)
      .groupBy(col("chunk_hash"))
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(col(idCol)).as("first_doc"))
      .filter(col("n_docs") > 1)
}
