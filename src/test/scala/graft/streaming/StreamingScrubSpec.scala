package graft.streaming

import java.nio.file.Files

import graft.operators.Curation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** StreamingScrub must equal the batch scrubSpans row-for-row: same
  * code-point windows, same exact-string membership, same span merge —
  * including overlapping planted spans and multibyte text. */
class StreamingScrubSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("streaming-scrub-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("streaming scrub equals batch scrubSpans, with multibyte + overlap") {
    val s = spark
    import s.implicits._
    val leak1 = "the quick brown fox jumps over the lazy dog tonight"
    val leak2 = "ünïcödé böilerplate répeated in évery document äcross"
    val bench = Seq(leak1, leak2).toDF("text")
    val docs = Seq(
      (1L, s"clean preamble here. $leak1 and a clean tail."),
      // overlapping leak occurrences — spans must merge
      (2L, s"x$leak1${leak1.drop(10)} suffix"),
      (3L, s"multibyte head ¶§ $leak2 and ünaffected ümlauts after"),
      (4L, "entirely clean document with nothing planted in it at all"),
      (5L, "short")
    ).toDF("doc_id", "text")

    val base = Files.createTempDirectory("sscrub").toString
    docs.coalesce(1).write.mode("append").parquet(s"$base/in")
    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING").parquet(s"$base/in")
    val q = StreamingScrub.scrubStream(stream, "doc_id", "text", bench, "text", k = 20)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .format("memory").queryName("scrub_out")
      .start()
    q.awaitTermination(120000)

    val got = spark.table("scrub_out")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val want = Curation.scrubSpans(docs, "doc_id", "text", bench, "text", k = 20)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq === want.toSeq,
      "streaming scrub must match the batch operator row-for-row")
    // sanity on the semantics themselves, not just parity
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId(1L)._3 > 0 && !byId(1L)._2.contains("quick brown"))
    assert(byId(2L)._3 > leak1.length.toLong, "merged overlap removes more than one leak")
    assert(byId(3L)._2.contains("ünaffected ümlauts"))
    assert(byId(4L)._3 === 0L && byId(5L)._3 === 0L)
  }

  test("scrubOne equals a naive set-based model on random multibyte corpora") {
    // independent oracle: brute-force covered-index set, no interval
    // bookkeeping — catches off-by-ones in the filledTo fast path.
    def naive(text: String, grams: Set[String], k: Int): (String, Long) = {
      val cps = text.codePoints.toArray
      val covered = scala.collection.mutable.Set[Int]()
      for (i <- 0 to cps.length - k; if grams.contains(new String(cps, i, k)))
        (i until i + k).foreach(covered += _)
      val sb = new java.lang.StringBuilder
      cps.indices.filterNot(covered).foreach(j => sb.appendCodePoint(cps(j)))
      (sb.toString, covered.size.toLong)
    }
    // small alphabet (repeats guaranteed) incl. an astral-plane char so
    // code-point arithmetic is exercised, not just BMP chars
    val alphabet = Array("a", "b", "c", " ", "é", new String(Character.toChars(0x1D11E)))
    val rnd = new scala.util.Random(42)
    def randText(n: Int): String =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    for (trial <- 0 until 200) {
      val k = 2 + rnd.nextInt(4)
      val text = randText(rnd.nextInt(40))
      val gramSource = randText(30)
      val grams = StreamingScrub.windowsOf(gramSource, k).toSet
      val got = StreamingScrub.scrubOne(text, grams, k)
      val want = naive(text, grams, k)
      assert(got === want, s"trial $trial k=$k text='$text'")
    }
  }

  test("batch fast-path: same operator on a batch frame, zero shuffle plan") {
    val s = spark
    import s.implicits._
    val bench = Seq("benchmark passage that must never appear in training").toDF("text")
    val docs = (0L until 50L)
      .map(i => (i, s"doc $i benchmark passage that must never appear in training tail"))
      .toDF("doc_id", "text")
    val out = StreamingScrub.scrubStream(docs, "doc_id", "text", bench, "text", k = 20)
    assert(out.count() === 50)
    assert(out.filter(col("n_removed") > 0).count() === 50)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"map-only scrub must not shuffle:\n$plan")
  }
}
