package graft.streaming

import java.nio.file.Files

import graft.operators.{Curation, Privacy}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The stateless curation operators (PII redaction, split assignment,
  * weighted mixture sampling) compose unchanged with Structured
  * Streaming: pure projections/filters run per micro-batch with zero
  * state — the shape that lets a 100 TB ingest pipeline curate
  * in-flight rather than in a second batch pass. */
class StreamingCurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("streaming-curation-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("pii redaction + split assignment run stateless over a stream") {
    val base = Files.createTempDirectory("scur").toString
    val s = spark
    import s.implicits._
    (0L until 40L).map(i => (i, s"doc $i mail user$i@example.com"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(s"$base/in")

    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .parquet(s"$base/in")
    val curated = Curation.splitAssign(
      Privacy.piiScan(stream, "doc_id", "text"), "doc_id",
      Seq("train" -> 0.5, "test" -> 0.5))
    val q = curated.writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .format("memory").queryName("curated_out")
      .start()
    q.awaitTermination(120000)

    val out = spark.table("curated_out")
      .select("doc_id", "n_emails", "redacted", "split")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(out.length === 40)
    assert(out.forall(_._2 == 1L), "every doc had exactly one planted email")
    assert(out.forall(_._3.contains("<EMAIL>")))
    // streaming split assignment matches the batch assignment row-for-row
    val batch = Curation.splitAssign(
        spark.read.parquet(s"$base/in"), "doc_id", Seq("train" -> 0.5, "test" -> 0.5))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    out.foreach { case (id, _, _, split) => assert(batch(id) === split) }
  }

  test("DSIR per-row scoring runs stateless over a stream, equal to batch") {
    val base = Files.createTempDirectory("sdsir").toString
    val s = spark
    import s.implicits._
    val corpus = (0L until 30L).map(i =>
      (i, if (i % 3 == 0) "alpha beta gamma delta epsilon"
          else s"zeta eta theta iota kappa lambda $i"))
      .toDF("doc_id", "text")
    corpus.coalesce(1).write.mode("append").parquet(s"$base/in")
    val target = Seq((100L, "alpha beta gamma delta alpha beta")).toDF("doc_id", "text")
    // train batch-side once; the model then scores an unbounded stream
    // as a pure projection (no state store, no watermark, no shuffle)
    val model = Curation.trainDsirModel(corpus, "text", target, "text", vocab = 32)

    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .parquet(s"$base/in")
    val q = Curation.dsirScoreRows(stream, "doc_id", "text", model)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .format("memory").queryName("dsir_out")
      .start()
    q.awaitTermination(120000)

    val got = spark.table("dsir_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = Curation.dsirScoreRows(corpus, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === want)
    assert(got.size === 30)
    // on-target stream docs outscore off-target ones
    val byId = got.map(x => x._1 -> x._3).toMap
    assert(byId(0L) > byId(1L))
  }
}
