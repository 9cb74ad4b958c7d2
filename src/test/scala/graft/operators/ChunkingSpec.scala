package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Known-answer tests for context-window preparation (chunking, packing),
  * semantic dedup, NB classification, and the profiling extras. */
class ChunkingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("chunking-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "text")
  }

  test("chunkDocuments: windows cover every word, overlap by chunkSize-stride") {
    val words = (1 to 10).map(i => s"w$i").mkString(" ") // 10 words
    val out = Chunking.chunkDocuments(docs((1L, words)), "id", "text",
      chunkSize = 4, stride = 3).orderBy("chunk_id").collect()
    // starts 0,3,6,9 -> 4 chunks; last is 1 word
    assert(out.length === 4)
    assert(out(0).getAs[String]("chunk_text") === "w1 w2 w3 w4")
    assert(out(1).getAs[String]("chunk_text") === "w4 w5 w6 w7")
    assert(out(3).getAs[String]("chunk_text") === "w10")
    assert(out.map(_.getAs[Int]("n_words")).toSeq === Seq(4, 4, 4, 1))
    // every word is in at least one chunk
    val covered = out.flatMap(_.getAs[String]("chunk_text").split(" ")).toSet
    assert(covered === words.split(" ").toSet)
  }

  test("chunkDocuments: doc shorter than one chunk yields exactly one chunk") {
    val out = Chunking.chunkDocuments(docs((1L, "a b")), "id", "text",
      chunkSize = 64, stride = 48).collect()
    assert(out.length === 1)
    assert(out(0).getAs[String]("chunk_text") === "a b")
    assert(out(0).getAs[Int]("n_words") === 2)
  }

  test("null text: chunking yields no chunks, packing counts 0 tokens — no crash, no skew") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b c"), (2L, null.asInstanceOf[String]), (3L, "d e"))
      .toDF("id", "text")
    val chunks = Chunking.chunkDocuments(df, "id", "text", chunkSize = 4, stride = 4)
      .collect()
    assert(chunks.map(_.getLong(0)).toSet === Set(1L, 3L), "null doc has no chunks")
    val packed = Chunking.packSequences(df, "id", "text", budget = 8, numShards = 1)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("n_tokens")).toMap
    assert(packed(2L) === 0, "null doc counts zero tokens")
    assert(packed(1L) === 3 && packed(3L) === 2)
  }

  test("packSequences: zero-token doc first in its shard gets pack_id 0, not -1") {
    val s = spark
    import s.implicits._
    // single shard, and choose the null doc's id so its mixed key sorts
    // first: cum_tokens = 0 at the head would floor((0-1)/budget) to -1
    val df = Seq((0L, null.asInstanceOf[String]), (1L, "a b"), (2L, "c"))
      .toDF("id", "text")
    val packs = Chunking.packSequences(df, "id", "text", budget = 8, numShards = 1)
      .collect().map(r => r.getAs[Int]("pack_id"))
    assert(packs.forall(_ >= 0), s"negative pack_id in ${packs.mkString(",")}")
  }

  test("packSequences: packs are contiguous, never split a doc, and overflow by < one doc") {
    val rows = (0L until 100L).map(i => (i, ("tok " * (5 + (i % 7).toInt)).trim))
    val packed = Chunking.packSequences(docs(rows: _*), "id", "text",
      budget = 32, numShards = 4)
    val out = packed.collect()
    assert(out.length === 100, "every doc lands in exactly one pack")
    // within a (shard, pack), cumulative tokens minus the pack's first
    // doc's predecessor total stays within budget + last doc
    val byPack = out.groupBy(r => (r.getAs[Int]("shard"), r.getAs[Int]("pack_id")))
    byPack.foreach { case ((_, _), rs) =>
      val toks = rs.map(_.getAs[Int]("n_tokens").toLong).sum
      val maxDoc = rs.map(_.getAs[Int]("n_tokens").toLong).max
      assert(toks < 32 + maxDoc, "a pack overflows by at most one doc")
    }
    // deterministic: rerun gives identical assignment
    val again = Chunking.packSequences(docs(rows: _*), "id", "text",
      budget = 32, numShards = 4).collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1).toSeq ===
      again.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1).toSeq)
  }

  test("packPayloads: payload concatenates pack members in pack order with the separator") {
    val rows = (0L until 20L).map(i => (i, s"doc$i has some words"))
    val payloads = Chunking.packPayloads(docs(rows: _*), "id", "text",
      budget = 16, numShards = 2, sep = " <|eos|> ").collect()
    val manifest = Chunking.packSequences(docs(rows: _*), "id", "text",
      budget = 16, numShards = 2).collect()
      .groupBy(r => (r.getAs[Int]("shard"), r.getAs[Int]("pack_id")))
    payloads.foreach { p =>
      val key = (p.getAs[Int]("shard"), p.getAs[Int]("pack_id"))
      val members = manifest(key)
      assert(p.getAs[Long]("n_docs") === members.length.toLong)
      val docsInPayload = p.getAs[String]("payload").split(" <\\|eos\\|> ")
      assert(docsInPayload.length === members.length)
      // every member's text appears exactly once, in (mixed, id) order
      val expectedIds = members.map(_.getAs[Long]("id")).sorted // ids 0..19: mixed order differs
      assert(docsInPayload.map(_.split(" ")(0).drop(3).toLong).sorted.toSeq ===
        expectedIds.toSeq)
    }
    assert(payloads.map(_.getAs[Long]("n_docs")).sum === 20L)
  }

  test("duplicatePassages: shared full windows found; partial tails and unique text ignored") {
    val shared = (1 to 8).map(i => s"p$i").mkString(" ") // 8 words
    val df = docs(
      (1L, s"$shared unique one two"),   // shares the 8-word window at start 0
      (2L, s"$shared other tail here"),  // same window, different tail
      (3L, "totally different text body entirely"))
    val out = Chunking.duplicatePassages(df, "id", "text", chunkSize = 8, stride = 8)
      .collect()
    assert(out.length === 1)
    assert(out(0).getAs[String]("chunk_text") === shared)
    assert(out(0).getAs[Long]("n_docs") === 2)
    assert(out(0).getAs[Long]("first_doc") === 1L)
    // the 3-word tails are partial windows -> never reported even if equal
    val tails = docs((1L, "a b c"), (2L, "a b c"))
    assert(Chunking.duplicatePassages(tails, "id", "text", 8, 8).count() === 0)
  }

  test("cdcChunks: lossless, bounded sizes, deterministic") {
    val text = ("the quick brown fox jumps over the lazy dog. " * 60).trim
    val out = Chunking.cdcChunks(docs(1L -> text), "id", "text",
        avgSize = 64, minSize = 16, maxSize = 256)
      .orderBy("chunk_idx").collect()
    assert(out.length > 1, "long doc must split")
    val chunks = out.map(_.getString(2))
    assert(chunks.mkString("") == text, "chunks must concatenate back to the text")
    val byteLens = chunks.map(_.getBytes("UTF-8").length)
    assert(byteLens.dropRight(1).forall(l => l >= 16 && l <= 256),
      s"interior chunks within [min,max]: ${byteLens.mkString(",")}")
    val again = Chunking.cdcChunks(docs(1L -> text), "id", "text",
        avgSize = 64, minSize = 16, maxSize = 256)
      .orderBy("chunk_idx").collect().map(_.getString(2))
    assert(again.toSeq == chunks.toSeq, "chunking is deterministic")
  }

  test("cdcChunks: boundaries are shift-robust — an edit re-chunks only its neighborhood") {
    val base = (1 to 400).map(i => s"word$i").mkString(" ")
    val edited = "INSERTED " + base
    val h1 = Chunking.cdcChunks(docs(1L -> base), "id", "text",
        avgSize = 64, minSize = 16, maxSize = 256)
      .select("chunk_hash").collect().map(_.getLong(0)).toSet
    val h2 = Chunking.cdcChunks(docs(1L -> edited), "id", "text",
        avgSize = 64, minSize = 16, maxSize = 256)
      .select("chunk_hash").collect().map(_.getLong(0)).toSet
    val shared = h1.intersect(h2).size
    assert(shared >= (h1.size * 3) / 4,
      s"most chunk hashes must survive a front edit: shared=$shared of ${h1.size}")
  }

  test("cdcChunks: low-entropy text still gets a healthy size distribution") {
    // a single repeated byte is the worst case for a low-bits mask (the
    // rolling window would see one state forever — either every position
    // cuts or none does); the spread mask keys on ~48 bytes of history
    val runs = "a" * 8000
    val out = Chunking.cdcChunks(docs(1L -> runs), "id", "text",
        avgSize = 64, minSize = 16, maxSize = 256)
      .orderBy("chunk_idx").collect().map(_.getString(2))
    assert(out.mkString("") == runs)
    val lens = out.map(_.length)
    // degenerate regimes: all chunks pinned at minSize (every position a
    // boundary) or all at maxSize (no boundary ever fires). On a constant
    // input the fingerprint stream is eventually constant too, so allow
    // either-anchored tails but demand the clamps actually hold
    assert(lens.dropRight(1).forall(l => l >= 16 && l <= 256),
      s"interior chunks within [min,max]: ${lens.take(20).mkString(",")}")
    // repetitive-but-structured text must NOT collapse to the maxSize clamp
    val phrases = ("lorem ipsum dolor sit amet " * 300).trim
    val lens2 = Chunking.cdcChunks(docs(1L -> phrases), "id", "text",
        avgSize = 64, minSize = 16, maxSize = 256)
      .collect().map(_.getString(2).length)
    // periodic text can trap individual phases at the clamp (after a cut
    // the stream replays the same phase — true under ANY gear mask); the
    // non-degeneracy claim is that a healthy share of natural cuts fires
    assert(lens2.count(_ < 256) >= lens2.length / 4,
      s"spread mask must cut repetitive text before the clamp: ${lens2.take(20).mkString(",")}")
  }

  test("cdcChunks: never splits inside a multibyte character") {
    val text = "héllo wörld ünïcode " * 50
    val out = Chunking.cdcChunks(docs(1L -> text), "id", "text",
        avgSize = 32, minSize = 8, maxSize = 64)
      .orderBy("chunk_idx").collect().map(_.getString(2))
    assert(out.mkString("") == text, "UTF-8 boundaries preserved")
    assert(!out.exists(_.contains('�')), "no replacement chars from split sequences")
  }

  test("cdcDuplicateChunks: finds shifted copies that stride windows miss") {
    val base = (1 to 300).map(i => s"tok$i").mkString(" ")
    val corpus = docs(1L -> base, 2L -> ("SHIFT " + base), 3L -> "totally unrelated text")
    val dup = Chunking.cdcDuplicateChunks(corpus, "id", "text",
        avgSize = 64, minSize = 16, maxSize = 256).collect()
    assert(dup.nonEmpty, "shared content must be found despite the shift")
    assert(dup.forall(_.getLong(1) == 2L), "only docs 1 and 2 share chunks")
  }

  test("vector ops accept array<float> columns (the common embedding storage type)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Array(3.0f, 4.0f))).toDF("id", "v")
    val out = df.select(Similarity.l2norm(col("v")).as("n"),
      Similarity.cosine(col("v"), col("v")).as("c")).collect()(0)
    assert(out.getDouble(0) === 5.0)
    assert(math.abs(out.getDouble(1) - 1.0) < 1e-12)
  }

  test("semanticDedup: finds planted scaled duplicates, nothing else") {
    val s = spark
    import s.implicits._
    // 3 well-separated direction clusters + one planted duplicate (2*v)
    val base = Seq(
      (0L, Array(1.0, 0.0, 0.0)), (1L, Array(0.9, 0.1, 0.0)),
      (2L, Array(0.0, 1.0, 0.0)), (3L, Array(0.0, 0.9, 0.1)),
      (4L, Array(0.0, 0.0, 1.0)), (5L, Array(0.1, 0.0, 0.9)),
      (100L, Array(2.0, 0.0, 0.0))) // 2 * vector 0
    val df = base.toDF("id", "v")
    val pairs = Similarity.semanticDedup(df, "id", "v", k = 3, threshold = 0.999)
      .collect()
    assert(pairs.length === 1)
    assert(pairs(0).getAs[Long]("id_a") === 0L)
    assert(pairs(0).getAs[Long]("id_b") === 100L)
    assert(pairs(0).getAs[Double]("cosine") === 1.0)
  }

  test("semanticDedup: trained-quantizer mode finds the same planted pair") {
    val s = spark
    import s.implicits._
    val base = Seq(
      (0L, Array(1.0, 0.0, 0.0)), (1L, Array(0.9, 0.1, 0.0)),
      (2L, Array(0.0, 1.0, 0.0)), (3L, Array(0.0, 0.9, 0.1)),
      (4L, Array(0.0, 0.0, 1.0)), (5L, Array(0.1, 0.0, 0.9)),
      (100L, Array(2.0, 0.0, 0.0)))
    val df = base.toDF("id", "v")
    val cents = Similarity.trainIvfCentroids(df, "id", "v", nlist = 3)
    val pairs = Similarity.semanticDedup(df, "id", "v", k = 3, threshold = 0.999,
      centroids = Some(cents)).collect()
    assert(pairs.length === 1)
    assert((pairs(0).getAs[Long]("id_a"), pairs(0).getAs[Long]("id_b")) === (0L, 100L))
    // the one-call production wrapper (train + dedup) finds the same pair
    val viaIvf = Similarity.semanticDedupIvf(df, "id", "v", nlist = 3, threshold = 0.999)
      .collect()
    assert(viaIvf.length === 1)
    assert((viaIvf(0).getAs[Long]("id_a"), viaIvf(0).getAs[Long]("id_b")) === (0L, 100L))
  }

  test("nbClassify: separable corpus classifies perfectly and deterministically") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "apple banana apple fruit", "fruit"),
      (2L, "banana fruit apple apple", "fruit"),
      (3L, "engine wheel brake engine", "car"),
      (4L, "wheel engine brake brake", "car"))
    val df = rows.toDF("id", "text", "kind")
    val out = Classify.nbClassify(df, "id", "text", "kind").collect()
    assert(out.length === 4)
    out.foreach(r => assert(r.getAs[String]("pred") === r.getAs[String]("kind"),
      s"doc ${r.getAs[Long]("id")} misclassified"))
  }

  test("histogram: bins partition the range, counts total the table") {
    val s = spark
    import s.implicits._
    val df = (0 until 100).map(_.toDouble).toDF("x")
    val h = Profile.histogram(df, "x", buckets = 10).orderBy("bucket").collect()
    assert(h.length === 10)
    assert(h.map(_.getAs[Long]("cnt")).sum === 100)
    // equal-width bins over 0..99: 10 per bin (max folds into last bin)
    assert(h.map(_.getAs[Long]("cnt")).toSeq === Seq.fill(10)(10L))
    assert(h(0).getAs[Double]("bin_lo") === 0.0)
    assert(h(9).getAs[Double]("bin_hi") === 99.0)
  }

  test("histogram: constant column collapses to a single bin") {
    val s = spark
    import s.implicits._
    val df = Seq.fill(5)(7.0).toDF("x")
    val h = Profile.histogram(df, "x", buckets = 10).collect()
    assert(h.length === 1)
    assert(h(0).getAs[Int]("bucket") === 0)
    assert(h(0).getAs[Long]("cnt") === 5)
  }

  test("keySkew: ranks by count desc, shares sum coherently") {
    val s = spark
    import s.implicits._
    val df = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++ Seq("cold")).toDF("k")
    val out = Profile.keySkew(df, "k", topK = 2).orderBy("rank").collect()
    assert(out.length === 2)
    assert(out(0).getAs[String]("key") === "hot")
    assert(out(0).getAs[Double]("share") === 0.6)
    assert(out(1).getAs[String]("key") === "warm")
    assert(out(1).getAs[Double]("cum_share") === 0.9)
  }
}
