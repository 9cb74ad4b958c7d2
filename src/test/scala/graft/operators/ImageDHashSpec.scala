package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Perceptual dHash + banded Hamming near-dup join over REAL decoded
  * pixels (JDK imageio) — the image-side analogue of the text SimHash
  * family. */
class ImageDHashSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("image-dhash-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def encodePng(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // horizontal gradient: luminance rises with x — a strong dHash signal
  private def gradient(scale: Int): Array[Byte] =
    encodePng(16 * scale, 16 * scale, (x, _) => {
      val v = x * 255 / (16 * scale - 1); (v << 16) | (v << 8) | v
    })
  // reversed gradient: every dHash gradient bit flips
  private val reversed: Array[Byte] =
    encodePng(16, 16, (x, _) => { val v = 255 - x * 255 / 15; (v << 16) | (v << 8) | v })

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("dHash: deterministic, scale-invariant, and direction-sensitive") {
    val h1 = Multimodal.dHash(gradient(1)).get
    assert(Multimodal.dHash(gradient(1)).get === h1, "same bytes, same hash")
    // the same picture at 4x the resolution lands within a few bits
    val h4 = Multimodal.dHash(gradient(4)).get
    assert(hamming(h1, h4) <= 4, s"resize moved ${hamming(h1, h4)} bits")
    // the reversed gradient is maximally different on the gradient bits
    val hr = Multimodal.dHash(reversed).get
    assert(hamming(h1, hr) >= 32, s"reversal only moved ${hamming(h1, hr)} bits")
    // non-images produce no hash
    assert(Multimodal.dHash("not an image".getBytes).isEmpty)
  }

  test("imageNearDups: re-encoded duplicates pair up, distinct images don't") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, gradient(1)),
      (2L, gradient(4)),               // same picture, different resolution
      (3L, reversed),                  // visually different
      (4L, "junk payload".getBytes)    // undecodable — must drop out
    ).toDF("id", "payload")
    val pairs = Multimodal.imageNearDups(rows, "id", "payload", maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)),
      s"expected exactly the resolution pair, got ${pairs.mkString(",")}")
    assert(pairs.head._3 <= 4)
  }
}
