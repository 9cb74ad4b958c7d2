package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * All operators are pure DataFrame transforms — no driver-side loops, no
  * collect — so they scale with partitions. The near-dup family follows the
  * standard sketch → band → bucket-join → verify shape: the *only* shuffle
  * on the full corpus is the groupBy on (band, bucket-hash), whose key
  * space is uniform by construction (hash values), so no salting is needed;
  * the expensive exact verification runs only on candidate pairs, which are
  * a tiny fraction of n² at any scale.
  */
object Dedup {

  /** Exact dedup: keep one row per distinct `cols` tuple (hash-aggregate,
    * map-side partial combine for free). */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** Exact-dup groups: representative id per duplicated key, for audit. */
  def exactGroups(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)

  /** Word k-shingles of a text column as a distinct array column.
    * Documents shorter than k words produce no shingles (matches the
    * DuckDB-oracle definition: range(1, len-k+2) over word slices). */
  def shingles(text: Column, k: Int): Column = {
    val words = split(text, "\\s+")
    when(size(words) >= k,
      array_distinct(
        transform(
          sequence(lit(1), size(words) - (k - 1)),
          i => concat_ws(" ", slice(words, i, lit(k))))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * minimum xxhash64 over the shingle set — the classic permutation-free
    * construction (Broder '97). Pure codegen'd expressions, no UDF. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(shingleCol, s => xxhash64(lit(seed), s)))
    }: _*)

  /** MinHash + LSH banding near-dup join.
    *
    * numHashes = bands * rowsPerBand. Two docs land in the same bucket when
    * one band of their signatures agrees exactly; candidates are then
    * verified with exact Jaccard over the shingle sets. With the default
    * 16×4 geometry the S-curve threshold is ≈ (1/16)^(1/4) ≈ 0.5.
    *
    * Scale: the bucket groupBy is the only full-corpus shuffle; the
    * candidate self-join is on bucket keys (both sides pre-hashed), and
    * verification touches candidate pairs only.
    */
  def minhashNearDups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      jaccardThreshold: Double = 0.5): DataFrame = {
    val numHashes = bands * rowsPerBand
    // Shingle sets are needed twice (signature + verification) and the
    // banded keys twice (both sides of the self-join); persist both so the
    // expensive shingle/minhash computation runs once. At 100 TB these
    // become materialized intermediate tables; MEMORY_AND_DISK spills
    // gracefully either way.
    val sh = df
      .select(col(idCol).as("id"), shingles(col(textCol), shingleK).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Banding: only (id, band, bucket) travels through the self-join —
    // never the shingle arrays (they'd dominate shuffle volume).
    val banded = sh
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .select(col("id"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))).as("bucket"))
        }: _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val candidates = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")

    // Verify candidates with exact Jaccard, fetching shingle sets by id.
    candidates
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** 64-bit SimHash over whitespace tokens (Charikar '02): each token's
    * xxhash64 votes ±1 per bit; the sign vector is the fingerprint.
    * Implemented as a tight scalar UDF (the 64-bit loop has no good
    * expression form) — one pass per doc, no shuffle. */
  val simhash64: String => Long = { text =>
    val counts = new Array[Int](64)
    for (tok <- text.split("\\s+") if tok.nonEmpty) {
      // xxhash64-compatible cheap stand-in: FNV-1a, stable across JVMs
      var h = graft.functions.GraftFunctions.fnv1a64(tok)
      var b = 0
      while (b < 64) {
        if ((h & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        h >>>= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** SimHash near-dups: band the 64-bit fingerprint into four 16-bit
    * chunks (pigeonhole: hamming distance ≤ 3 ⟹ at least one identical
    * chunk), bucket-join on chunks, verify true hamming distance. */
  def simhashNearDups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val spark = df.sparkSession
    val sim = udf(simhash64)
    val pop = udf((a: Long, b: Long) => java.lang.Long.bitCount(a ^ b))
    val withFp = df.select(col(idCol).as("id"), sim(col(textCol)).as("fp"))
    val banded = withFp.select(col("id"), col("fp"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"), shiftrightunsigned(col("fp"), c * 16).bitwiseAND(lit(0xFFFFL)).as("val"))
      }: _*)).as("cb"))
      .select(col("id"), col("fp"), col("cb.chunk"), col("cb.val"))
    val l = banded.select(col("chunk"), col("val"), col("id").as("id_a"), col("fp").as("fp_a"))
    val r = banded.select(col("chunk"), col("val"), col("id").as("id_b"), col("fp").as("fp_b"))
    l.join(r, l("chunk") === r("chunk") && l("val") === r("val") && l("id_a") < r("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", pop(col("fp_a"), col("fp_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact n-gram Jaccard similarity for all pairs above a threshold,
    * via inverted-index join on shingles — no n² cross join: the join
    * fans out by shared shingle, and the per-shingle fan-out is bounded
    * for natural text. For 100 TB, add a document-frequency cap (drop
    * shingles appearing in > dfCap docs — they carry no signal and cause
    * skew; that's the standard trick). */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      threshold: Double = 0.5,
      dfCap: Int = 10000): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), k).as("sh"))
      .filter(size(col("sh")) > 0)
    val exploded = sh.select(col("id"), size(col("sh")).as("n"), explode(col("sh")).as("g"))
    // df-cap: drop ubiquitous shingles (skew + zero signal)
    val capped = exploded.join(
      exploded.groupBy("g").agg(count(lit(1)).as("gdf")).filter(col("gdf") <= dfCap),
      "g")
    val a = capped.select(col("g"), col("id").as("id_a"), col("n").as("n_a"))
    val b = capped.select(col("g"), col("id").as("id_b"), col("n").as("n_b"))
    // Length-ratio prefilter: Jaccard >= t forces min(n_a,n_b)/max(n_a,n_b)
    // >= t (|A∩B| <= min, |A∪B| >= max), so size-mismatched pairs can be
    // dropped inside the join condition — before the shuffle-heavy groupBy —
    // cutting candidate fan-out with zero effect on the result set.
    a.join(b, a("g") === b("g") && a("id_a") < b("id_b")
        && a("n_a") >= b("n_b") * lit(threshold)
        && b("n_b") >= a("n_a") * lit(threshold))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Connected components over a near-dup pair list by min-label
    * propagation with pointer doubling — the final step of a dedup
    * pipeline: pairs say "these are the same document"; components decide
    * which single copy survives (the minimum id).
    *
    * Each round does (1) neighbor propagation (my label := min over my
    * neighbors' labels) and (2) a label-shortcut join (my label := my
    * label's label), so the reach roughly doubles per round and
    * convergence is O(log diameter), not O(diameter) — `maxIters = 20`
    * covers diameters beyond 2^20. Non-convergence is an error, never a
    * silent component split: `keepOnePerComponent` downstream would
    * otherwise quietly keep duplicates.
    *
    * Scale: each round is three shuffles on (node, label); lineage is cut
    * with localCheckpoint every round so long plans never build up.
    *
    * Input: (id_a, id_b) pairs. Output: (id, component) for every id
    * that appears in any pair; component = min id reachable. */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.groupBy(col("src").as("id"))
      .agg(least(min(col("dst")), first(col("src"))).as("component"))
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      // propagate: my new label = min(my label, labels of my neighbors)
      val viaNeighbor = edges
        .join(labels.withColumnRenamed("id", "dst_id"), col("dst") === col("dst_id"))
        .groupBy(col("src").as("id"))
        .agg(min(col("component")).as("n_comp"))
      val propagated = labels.join(viaNeighbor, Seq("id"), "left")
        .select(col("id"), least(col("component"), coalesce(col("n_comp"), col("component"))).as("component"))
      // pointer doubling: follow my label to ITS label (labels are node
      // ids, so every label is a key in `propagated`). This is what turns
      // chain graphs from one hop per round into doubling reach per round.
      val shortcut = propagated
        .select(col("id").as("l_id"), col("component").as("l_comp"))
      val next = propagated.join(shortcut, propagated("component") === col("l_id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("l_comp"), col("component"))).as("component"))
        .localCheckpoint()
      val changed = next.join(labels.withColumnRenamed("component", "old"), "id")
        .filter(col("component") =!= col("old")).limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIters iterations — " +
        "raise maxIters; refusing to return split components")
    labels
  }

  /** Survivors after near-dup removal: every id in `df` minus non-minimal
    * members of each near-dup component. */
  def keepOnePerComponent(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val drop = connectedComponents(pairs)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** Embedding near-dup: pairs with cosine ≥ threshold. Candidates come
    * from random-hyperplane LSH (deterministic seeded planes); exact cosine
    * verifies. See [[Similarity]] for the shared plumbing. */
  def embeddingNearDups(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      cosineThreshold: Double = 0.95,
      planes: Int = 16): DataFrame = {
    val banded = Similarity.hyperplaneBuckets(df, idCol, vecCol, dim, planes, bands = 4)
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"),
      col("v").as("v_a"), col("nrm").as("n_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"),
      col("v").as("v_b"), col("nrm").as("n_b"))
    l.join(r, l("band") === r("band") && l("bucket") === r("bucket") && l("id_a") < r("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", Similarity.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .filter(col("cosine") >= cosineThreshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
  }
}
