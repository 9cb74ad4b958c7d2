package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** REAL per-frame GIF pixel decode (r13): the animated-GIF fixture writes
  * alternating class patterns, the reader decodes every frame's pixels,
  * and each frame's dHash must equal the dHash of the PIXEL-IDENTICAL
  * PNG test card — the cross-format identity the gif_frame_hash oracle
  * row rides on. */
class GifFrameSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("gif-frame-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("renderTestGif: a real multi-frame GIF the metadata path already reads") {
    val g = Multimodal.renderTestGif(cls = 3, nFrames = 5)
    assert(Multimodal.sniffFormat(g) === "gif")
    assert(Multimodal.gifFrameCount(g) === Some(5))
    assert(Multimodal.imageDims(g) === Some((16, 16)))
  }

  test("gifFrameHashes: every frame decodes pixel-identical to its PNG card") {
    for (cls <- 0 until 20) {
      val n = 2 + cls % 5
      val hashes = Multimodal.gifFrameHashes(Multimodal.renderTestGif(cls, n)).get
      assert(hashes.length === n, s"class $cls frame count")
      for (f <- 0 until n) {
        val cardId = if (f % 2 == 0) cls else 1000 + cls
        val cardHash = Multimodal.dHash(Multimodal.renderTestCard(cardId, 1)).get
        assert(hashes(f) === cardHash,
          s"class $cls frame $f: GIF-decoded hash != PNG card hash")
      }
    }
  }

  test("card hash table is collision-free across the 20x2 query classes") {
    val all = for { cls <- 0 until 20; phase <- 0 until 2 }
      yield Multimodal.dHash(
        Multimodal.renderTestCard(if (phase == 0) cls else 1000 + cls, 1)).get
    assert(all.distinct.length === all.length,
      "two distinct card patterns collided in dHash — the join would mislabel")
  }

  test("gifFrameHashes: non-GIF and corrupt payloads degrade to None") {
    assert(Multimodal.gifFrameHashes("not a gif".getBytes).isEmpty)
    assert(Multimodal.gifFrameHashes(Multimodal.renderTestCard(1, 1)).isEmpty)
    val truncated = Multimodal.renderTestGif(1, 3).take(20)
    // a sniffable-but-broken stream must not throw
    Multimodal.gifFrameHashes(truncated) // any result is fine; no exception
  }

  test("frame-hash join labels frames by (class, phase) end to end") {
    val s = spark
    import s.implicits._
    val render = udf { (id: Long) =>
      val cls = (id % 20).toInt
      Multimodal.renderTestGif(cls, 2 + cls % 5)
    }
    val frameHashes = udf { (b: Array[Byte]) =>
      Multimodal.gifFrameHashes(b).orNull
    }
    val frames = (0L until 40L).toDF("doc_id")
      .select(col("doc_id"), posexplode(frameHashes(render(col("doc_id"))))
        .as(Seq("frame_idx", "h")))
    val cards = (for { cls <- 0 until 20; phase <- 0 until 2 }
      yield (cls, phase, Multimodal.dHash(
        Multimodal.renderTestCard(if (phase == 0) cls else 1000 + cls, 1)).get))
      .toDF("matched_cls", "matched_phase", "h")
    val out = frames.join(broadcast(cards), "h")
      .select("doc_id", "frame_idx", "matched_cls", "matched_phase")
      .collect()
    // every frame matched exactly one card, with the planted labels
    val expected = (for {
      id <- 0L until 40L
      cls = (id % 20).toInt
      f <- 0 until (2 + cls % 5)
    } yield (id, f, cls, f % 2)).toSet
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
      === expected)
    assert(out.length === expected.size, "a hash collision produced extra matches")
  }
}
