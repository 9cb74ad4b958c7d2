package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The README's end-to-end curation pipeline, executed verbatim-shape:
  * quality filter → near-dup removal → split assignment → sequence
  * packing. Proves the operators actually compose (column contracts
  * line up) and the result is deterministic end to end. */
class PipelineExampleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("pipeline-example-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("README pipeline composes and is deterministic end to end") {
    val s = spark
    import s.implicits._
    // corpus: 40 good docs (long, wordy, stopword-bearing), 1 near-dup
    // pair inside them, plus junk that the quality filter must drop
    // each doc: a short shared frame (keeps the stopword rule happy) +
    // 30 doc-unique letter-only tokens, so distinct docs sit far below
    // any near-dup threshold while the planted pair sits far above it
    def prose(i: Int): String = {
      val a = ('a' + i / 26).toChar; val b = ('a' + i % 26).toChar
      val unique = (0 until 30)
        .map(j => s"w$a$b${('a' + j / 26).toChar}${('a' + j % 26).toChar}")
        .mkString(" ")
      s"the quick document talks about a data engine and of $unique"
    }
    val good = (0L until 40L).map(i => (i, prose(i.toInt)))
    val nearDup = Seq((100L, good(7)._2 + " tail"))
    val junk = Seq((200L, "x"), (201L, "@@@@ #### $$$$ %%%%"))
    val docs = (good ++ nearDup ++ junk).toDF("doc_id", "text")

    def run() = {
      val quality = TextAnalysis.qualityFilter(docs, "doc_id", "text")
      val kept = docs.join(quality.where($"passes").select("doc_id"), Seq("doc_id"))
      val dupPairs = Dedup.minhashNearDups(kept, "doc_id", "text")
      val survivors = Dedup.keepOnePerComponent(kept, "doc_id", dupPairs)
      val split = Curation.splitAssign(survivors, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      val packed = Chunking.packPayloads(
        split.where($"split" === "train"), "doc_id", "text",
        budget = 256, numShards = 2)
      (kept, survivors, split, packed)
    }

    val (kept, survivors, split, packed) = run()
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!keptIds.contains(200L) && !keptIds.contains(201L), "junk must be filtered")
    assert(keptIds.contains(7L) && keptIds.contains(100L))

    val survivorIds = survivors.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivorIds.contains(7L) && !survivorIds.contains(100L),
      "near-dup loses to the lower id")

    val splits = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.values.sum === survivorIds.size.toLong)
    assert(splits.getOrElse("train", 0L) > 0L)

    val payloads = packed.collect()
    assert(payloads.nonEmpty)
    assert(payloads.map(_.getAs[Long]("n_docs")).sum ===
      splits.getOrElse("train", 0L), "every train doc lands in exactly one pack")

    // end-to-end determinism: a full rerun yields identical payloads
    val payloadsAgain = run()._4.collect()
    assert(payloads.map(r => (r.getInt(0), r.getInt(1), r.getAs[String]("payload"))).sortBy(x => (x._1, x._2)).toSeq ===
      payloadsAgain.map(r => (r.getInt(0), r.getInt(1), r.getAs[String]("payload"))).sortBy(x => (x._1, x._2)).toSeq)
  }

  test("tokenizer pipeline: leakage-safe split -> train BPE on train ONLY -> token-id packs") {
    val s = spark
    import s.implicits._
    // corpus with planted exact duplicates — the split must give each
    // duplicate group one fate before the tokenizer trains on train-only
    def prose(i: Int): String =
      (0 until 25).map(j => s"tok${(i * 7 + j) % 40}").mkString(" ")
    val base = (0L until 30L).map(i => (i, prose(i.toInt)))
    val copies = base.take(10).map { case (i, t) => (i + 1000L, t) }
    val docs = (base ++ copies).toDF("doc_id", "text")

    val split = Curation.leakageSafeSplit(docs, "doc_id", "text",
      Seq("train" -> 0.7, "val" -> 0.15, "test" -> 0.15))
    // leakage invariant feeds the tokenizer: exact copies are never
    // split across train/eval, so training on the train slice cannot
    // see eval text even through a duplicate
    val byRep = split.select("rep_id", "split").distinct().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    assert(byRep.values.forall(_.size == 1), "one split per duplicate group")

    val train = split.where($"split" === "train").select($"doc_id", $"text")
    val model = Bpe.trainModel(train, "text", numMerges = 30)
    val packs = Chunking.packTokenIds(train, "doc_id", "text", model,
      budget = 64, numShards = 2, eosId = -9)
    val rows = packs.collect()
    val nTrain = train.count()
    assert(rows.map(_.getLong(2)).sum === nTrain, "every train doc packed once")
    // eval slices encode against the SAME frozen model — characters the
    // train alphabet never saw ('zebra!' appended here) take the byte
    // fallback (counted in n_fallback) instead of silently extending the
    // vocabulary; n_unk stays structurally zero
    val eval = split.where($"split" =!= "train")
      .withColumn("text", concat($"text", lit(" zebra!")))
      .select($"doc_id", $"text")
    val enc = Bpe.encodeIds(eval, "doc_id", "text", model)
    val nEval = eval.count()
    assert(enc.agg(sum("n_unk")).head.getLong(0) == 0L,
      "byte fallback leaves no UNK sentinel")
    assert(enc.where($"n_fallback" >= lit(6)).count() === nEval,
      "every eval doc routes the 6 unseen 'zebra!' chars through bytes")
    assert(enc.where($"n_tokens" === 0).count() === 0L)
  }
}
