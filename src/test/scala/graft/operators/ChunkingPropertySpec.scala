package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property-style laws for context-window prep over randomized corpora
  * (seeded — deterministic reruns): chunk coverage/overlap laws, pack
  * conservation laws, payload reconstruction. */
class ChunkingPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("chunking-property-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def randomCorpus(seed: Long, nDocs: Int) = {
    val rnd = new Random(seed)
    val s = spark
    import s.implicits._
    (0L until nDocs.toLong).map { i =>
      val n = 1 + rnd.nextInt(120)
      (i, (0 until n).map(j => s"t${rnd.nextInt(50)}x$j").mkString(" "))
    }.toDF("id", "text")
  }

  test("chunk laws: full coverage, stride-aligned starts, word-exact reconstruction") {
    val df = randomCorpus(seed = 7L, nDocs = 60)
    for ((chunkSize, stride) <- Seq((32, 24), (16, 16), (8, 5))) {
      val chunks = Chunking.chunkDocuments(df, "id", "text", chunkSize, stride)
        .collect().groupBy(_.getLong(0))
      val docs = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      docs.foreach { case (id, text) =>
        val words = text.split(" ")
        val cs = chunks(id).sortBy(_.getAs[Int]("chunk_id"))
        // chunk i starts at i*stride and is the exact word slice
        cs.foreach { c =>
          val start = c.getAs[Int]("chunk_id") * stride
          val expect = words.slice(start, start + chunkSize).mkString(" ")
          assert(c.getAs[String]("chunk_text") === expect,
            s"doc $id chunk ${c.getAs[Int]("chunk_id")} (cs=$chunkSize st=$stride)")
        }
        // coverage: the last chunk reaches the final word
        val lastStart = cs.last.getAs[Int]("chunk_id") * stride
        assert(lastStart < words.length && lastStart + chunkSize >= words.length,
          s"doc $id words=${words.length} lastStart=$lastStart")
      }
    }
  }

  test("pack laws: every doc exactly once, token totals conserved, manifest = payload") {
    val df = randomCorpus(seed = 11L, nDocs = 80)
    val packed = Chunking.packSequences(df, "id", "text", budget = 128, numShards = 4)
    val rows = packed.collect()
    assert(rows.map(_.getLong(0)).distinct.length === 80, "every doc in exactly one pack")
    val totalTokens = df.select(sum(size(split(col("text"), " ")))).collect()(0).getLong(0)
    assert(rows.map(_.getAs[Int]("n_tokens").toLong).sum === totalTokens)
    val payloads = Chunking.packPayloads(df, "id", "text", budget = 128, numShards = 4)
      .collect()
    assert(payloads.map(_.getAs[Long]("tokens")).sum === totalTokens,
      "payload manifest conserves the token total")
    // splitting a payload back on the separator recovers the member
    // docs; their word counts sum to the manifest's token total
    payloads.foreach { p =>
      val docsIn = p.getAs[String]("payload").split(" <\\|eos\\|> ")
      assert(docsIn.length.toLong === p.getAs[Long]("n_docs"))
      assert(docsIn.map(_.split(" ").length.toLong).sum === p.getAs[Long]("tokens"))
    }
  }

  test("cdc laws: lossless, bounded, deterministic, edit-local on random corpora") {
    val rnd = new Random(11L)
    val texts = (0 until 40).map { _ =>
      val n = 1 + rnd.nextInt(300)
      (0 until n).map(_ => s"w${rnd.nextInt(400)}").mkString(" ") +
        (if (rnd.nextBoolean()) " héllo ünïcode" else "")
    }
    val s = spark
    import s.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val out = Chunking.cdcChunks(df, "id", "text", avgSize = 64, minSize = 16, maxSize = 256)
      .collect().groupBy(_.getLong(0))
    texts.zipWithIndex.foreach { case (t, i) =>
      val cs = out(i.toLong).sortBy(_.getInt(1)).map(_.getString(2))
      assert(cs.mkString("") == t, s"doc $i lossless")
      val lens = cs.map(_.getBytes("UTF-8").length)
      // +3: a forced maxSize cut extends past UTF-8 continuation bytes
      assert(lens.dropRight(1).forall(l => l >= 16 && l <= 259), s"doc $i bounds")
      assert(lens.last <= 259, s"doc $i tail bound")
    }
    // edit locality across the whole corpus: per doc, >=half the chunk
    // hashes survive a front insertion (short docs may be 1 chunk)
    val edited = texts.zipWithIndex.map { case (t, i) => (i.toLong, "EDIT " + t) }.toDF("id", "text")
    val h0 = Chunking.cdcChunks(df, "id", "text", 64, 16, 256)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(3)).toSet).toMap
    val h1 = Chunking.cdcChunks(edited, "id", "text", 64, 16, 256)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(3)).toSet).toMap
    val survived = texts.indices.count { i =>
      val a = h0(i.toLong); val b = h1(i.toLong)
      a.size <= 2 || a.intersect(b).size * 2 >= a.size
    }
    assert(survived >= texts.size * 9 / 10,
      s"edit locality must hold for nearly all docs: $survived/${texts.size}")
  }

  test("packTokenIds: id conservation, one EOS per doc, byte-stable order") {
    val s = spark
    import s.implicits._
    val docs = (0L until 30L).map(i =>
      (i, (0 to (i % 7).toInt).map(j => s"tok${(i + j) % 9}").mkString(" "))).toDF("id", "text")
    val model = Bpe.trainModel(docs, "text", numMerges = 10)
    val out = Chunking.packTokenIds(docs, "id", "text", model,
      budget = 16, numShards = 3, eosId = -9)
    val rows = out.collect()
    val enc = Bpe.encodeIds(docs, "id", "text", model).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // conservation: total flattened length = total tokens + one EOS per doc
    val totalIds = rows.map(_.getSeq[Int](4).length).sum
    val totalToks = enc.values.map(_.length).sum
    assert(totalIds == totalToks + 30, s"ids=$totalIds toks=$totalToks")
    // every payload ends with EOS and contains exactly n_docs EOS markers
    rows.foreach { r =>
      val ids = r.getSeq[Int](4)
      assert(ids.last == -9)
      assert(ids.count(_ == -9) == r.getLong(2), "one EOS per doc")
    }
    // determinism: a second run yields identical payloads
    val again = Chunking.packTokenIds(docs, "id", "text", model,
      budget = 16, numShards = 3, eosId = -9).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("nb classify: invariant under row order and partitioning") {
    val df = randomCorpus(seed = 13L, nDocs = 40)
      .withColumn("label", (col("id") % 3).cast("string"))
    val a = Classify.nbClassify(df, "id", "text", "label")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getDouble(3))).sortBy(_._1)
    val b = Classify.nbClassify(df.orderBy(rand(99)).repartition(7), "id", "text", "label")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getDouble(3))).sortBy(_._1)
    assert(a.toSeq === b.toSeq, "prediction and rounded score are order/partition independent")
  }
}
