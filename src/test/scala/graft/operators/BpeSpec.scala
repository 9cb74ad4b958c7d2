package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge learning + encoding. The known answers are hand-computed on
  * the classic low/lower/newest/widest corpus (Sennrich et al. '16 §3.2
  * without the word-end marker): pair counts give es(9) -> est(9) ->
  * lo(7) -> low(7) as the first four merges under the count-desc /
  * pair-asc tiebreak. */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("bpe-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val classicTable: Array[(String, Long)] =
    Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("classic corpus learns es, est, lo, low first") {
    val merges = Bpe.learn(classicTable, numMerges = 4)
    assert(merges.map(m => (m.left, m.right)) ==
      Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    assert(merges.map(_.rank) == Seq(0, 1, 2, 3))
  }

  test("merge loop stops when no pair repeats") {
    val merges = Bpe.learn(Array(("ab", 1L), ("cd", 1L)), numMerges = 10)
    assert(merges.isEmpty)
  }

  test("encodeWord applies lowest rank first: lowest -> [low, est]") {
    val ranks = Bpe.learn(classicTable, 4)
      .map(m => (m.left, m.right) -> m.rank).toMap
    assert(Bpe.encodeWord("lowest", ranks).toSeq == Seq("low", "est"))
    assert(Bpe.encodeWord("newest", ranks).toSeq == Seq("n", "e", "w", "est"))
    assert(Bpe.encodeWord("x", ranks).toSeq == Seq("x"))
    assert(Bpe.encodeWord("low", ranks).toSeq == Seq("low"))
  }

  test("zero merges = character segmentation") {
    assert(Bpe.encodeWord("abc", Map.empty).toSeq == Seq("a", "b", "c"))
  }

  test("distributed train matches the driver loop on the same table") {
    val sp = spark; import sp.implicits._
    // corpus whose word frequencies reproduce classicTable exactly
    val docs = classicTable.flatMap { case (w, c) =>
      Seq.fill(c.toInt)(w)
    }.grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
    val merges = Bpe.trainMerges(docs, "text", numMerges = 4)
    assert(merges.map(m => (m.left, m.right)) ==
      Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("encode is lossless: tokens concatenate back to the pre-tokens") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "the lowest newest widest, lower!"),
      (2L, "abc123 def-ghi"),
      (3L, null.asInstanceOf[String]),
      (4L, "")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs.na.drop(Seq("text")), "text", 20)
    val enc = Bpe.encode(docs, "doc_id", "text", merges)
      .select(col("doc_id"), concat_ws("", col("tokens")).as("joined"),
        col("n_tokens"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    // pre-tokens of doc 1 concatenated (whitespace is never a token)
    assert(enc(1L)._1 == "thelowestnewestwidest,lower!")
    assert(enc(2L)._1 == "abc123def-ghi")
    assert(enc(3L) == (("", 0)))
    assert(enc(4L) == (("", 0)))
    // merges reduce token count strictly below character segmentation
    assert(enc(1L)._2 < "thelowestnewestwidest,lower!".length)
  }

  test("model: vocab ids are deterministic (chars sorted, then merges by rank)") {
    val sp = spark; import sp.implicits._
    val docs = classicTable.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }
      .toSeq.toDF("text")
    val model = Bpe.trainModel(docs, "text", numMerges = 4)
    // base alphabet of low/lower/newest/widest, after the 256 byte ids
    val chars = "deilnorstw".map(_.toString)
    chars.zipWithIndex.foreach { case (ch, i) =>
      assert(model.vocab(ch) == Bpe.ByteVocab + i)
    }
    assert(model.vocab("es") == Bpe.ByteVocab + chars.length)     // rank 0
    assert(model.vocab("est") == Bpe.ByteVocab + chars.length + 1)
    assert(model.vocab("lo") == Bpe.ByteVocab + chars.length + 2)
    assert(model.vocab("low") == Bpe.ByteVocab + chars.length + 3)
  }

  test("vocab dedup: two merges fusing to the same string keep lowest rank, ids contiguous") {
    // (a,b)->ab, (ab,c)->abc, (b,c)->bc, (a,bc)->abc (duplicate string)
    val model = Bpe.Model(
      Seq(Bpe.Merge(0, "a", "b"), Bpe.Merge(1, "ab", "c"),
        Bpe.Merge(2, "b", "c"), Bpe.Merge(3, "a", "bc")),
      Seq("a", "b", "c"))
    val v = model.vocab
    assert(v.size == 6, s"duplicate 'abc' must collapse: $v")
    assert(v("abc") == Bpe.ByteVocab + 4, "lowest-rank occurrence wins")
    assert(v.values.toSeq.sorted ==
      (Bpe.ByteVocab until Bpe.ByteVocab + 6), "id space stays contiguous")
  }

  test("encodeIds: ids roundtrip through the vocab; unseen chars byte-fallback") {
    val sp = spark; import sp.implicits._
    val train = Seq("low lower lowest", "newest widest low").toDF("text")
    val model = Bpe.trainModel(train, "text", numMerges = 6)
    val docs = Seq((1L, "lowest"), (2L, "zzz")).toDF("doc_id", "text")
    val out = Bpe.encodeIds(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Int](1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    val inv = model.vocab.map(_.swap)
    // doc 1: every id maps back to a token whose concat is the word
    val (ids1, n1, unk1, fb1) = out(1L)
    assert(unk1 == 0 && fb1 == 0 && n1 == ids1.length)
    assert(ids1.map(inv).mkString("") == "lowest")
    // doc 2: 'z' never seen at train time -> UTF-8 byte fallback, no UNK
    val (ids2, _, unk2, fb2) = out(2L)
    assert(ids2 == Seq(0x7a, 0x7a, 0x7a), s"'zzz' must encode as bytes: $ids2")
    assert(unk2 == 0, "n_unk is structurally zero with byte fallback")
    assert(fb2 == 3)
    assert(Bpe.decodeIds(ids2, model) == "zzz")
  }

  test("byte fallback is lossless on arbitrary Unicode (incl. astral plane)") {
    val sp = spark; import sp.implicits._
    val train = Seq("plain ascii only").toDF("text")
    val model = Bpe.trainModel(train, "text", numMerges = 5)
    // none of these characters were seen at train time; the emoji is a
    // surrogate PAIR in UTF-16 — code-point symbols keep it whole
    val text = "héllo 世界 🚀! naïve"
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val r = Bpe.encodeIds(docs, "doc_id", "text", model).collect()(0)
    val ids = r.getSeq[Int](1)
    assert(r.getInt(3) == 0, "n_unk must be structurally zero")
    assert(r.getInt(4) > 0, "non-ascii must have taken the byte path")
    // decode == the concatenation of the pre-tokens (whitespace is never
    // a token, same law as encode())
    val pat = java.util.regex.Pattern.compile(Bpe.PreToken)
    val m = pat.matcher(text)
    val expected = new StringBuilder
    while (m.find()) expected.append(m.group())
    assert(Bpe.decodeIds(ids, model) == expected.toString)
  }

  test("memo isolation: two models interleaved never serve each other's segmentation") {
    val sp = spark; import sp.implicits._
    val trainA = Seq("low low low lowest lowest").toDF("text")
    val trainB = Seq("lo lo west west lowest").toDF("text")
    val modelA = Bpe.trainModel(trainA, "text", numMerges = 8)
    val modelB = Bpe.trainModel(trainB, "text", numMerges = 8)
    assert(Bpe.contentKey(modelA.merges) != Bpe.contentKey(modelB.merges))
    val docs = Seq((1L, "lowest lowest lowest")).toDF("doc_id", "text")
    def run(m: Bpe.Model): Seq[Int] =
      Bpe.encodeIds(docs, "doc_id", "text", m).collect()(0).getSeq[Int](1)
    // interleave so the shared per-JVM memo holds entries for both models
    val a1 = run(modelA); val b1 = run(modelB)
    val a2 = run(modelA); val b2 = run(modelB)
    assert(a1 == a2 && b1 == b2)
    assert(Bpe.decodeIds(a2, modelA) == "lowestlowestlowest")
    assert(Bpe.decodeIds(b2, modelB) == "lowestlowestlowest")
    assert(a1 != b1, "different merge tables must segment differently here")
  }

  test("model persistence: save -> load roundtrips merges, vocab, and encodings") {
    val sp = spark; import sp.implicits._
    val train = Seq("low lower lowest", "newest widest low").toDF("text")
    val model = Bpe.trainModel(train, "text", numMerges = 6)
    val path = java.nio.file.Files.createTempDirectory("bpe").toString + "/model"
    Bpe.saveModel(model, spark, path)
    val back = Bpe.loadModel(spark, path)
    assert(back.merges == model.merges)
    assert(back.vocab == model.vocab)
    val docs = Seq((1L, "lowest newest")).toDF("doc_id", "text")
    val a = Bpe.encodeIds(docs, "doc_id", "text", model).collect()(0).getSeq[Int](1)
    val b = Bpe.encodeIds(docs, "doc_id", "text", back).collect()(0).getSeq[Int](1)
    assert(a == b)
  }

  test("tokenStats is deterministic and ordered (count desc, token asc)") {
    val sp = spark; import sp.implicits._
    val docs = Seq((1L, "low low low lower"), (2L, "lowest low")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "text", 10)
    val stats = Bpe.tokenStats(docs, "doc_id", "text", merges, topK = 5).collect()
    assert(stats.nonEmpty)
    val counts = stats.map(_.getLong(1)).toSeq
    assert(counts == counts.sorted.reverse, "must be ordered by count desc")
    // "low" is merged by construction and is the most frequent token
    assert(stats.head.getString(0) == "low")
  }
}
