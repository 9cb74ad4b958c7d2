package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Z-order key laws and NFC normalization known-answers. */
class LayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("layout-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("mortonKey interleaves bits exactly (known answers + roundtrip law)") {
    val s = spark
    import s.implicits._
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (65535L, 0L),
      (0L, 65535L), (65535L, 65535L), (0x1234L, 0xABCDL))
    def interleaveRef(a: Long, b: Long): Long =
      (0 until 16).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    val out = cases.toDF("a", "b")
      .select(col("a"), col("b"), Layout.mortonKey(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (a, b, z) =>
      assert(z === interleaveRef(a, b), s"morton($a, $b)")
    }
  }

  test("zorderReport: every bucket's bounding box is tight on BOTH dimensions") {
    val s = spark
    import s.implicits._
    // dense grid -> each of the up-to-256 prefix buckets covers a
    // quadrant-recursive cell: box side <= range/2 per split level
    val grid = for (x <- 0L until 256L; y <- 0L until 256L) yield (x * 256, y * 256)
    val df = grid.toDF("a", "b")
    val report = Layout.zorderReport(df, "a", "b").collect()
    assert(report.nonEmpty)
    report.foreach { r =>
      val (dx, dy) = (r.getAs[Long]("max_x") - r.getAs[Long]("min_x"),
        r.getAs[Long]("max_y") - r.getAs[Long]("min_y"))
      // top-8-bit prefix = 4 splits per dim: each box spans <= 1/16 of
      // the 65536 domain on each axis
      assert(dx <= 65536 / 16 && dy <= 65536 / 16,
        s"bucket ${r.getAs[Int]("bucket")} box ${dx}x$dy not tight")
    }
  }

  test("nfcNormalize: combining sequences compose; NFC-stable text unchanged; null passes") {
    val s = spark
    import s.implicits._
    val decomposedE = "Cafe\u0301" // e + combining acute (NFD)
    val composedE = "Caf\u00e9"     // precomposed e-acute (NFC)
    val df = Seq((1L, decomposedE), (2L, composedE), (3L, "plain ascii"),
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    val out = df.select(col("id"), TextAnalysis.nfcNormalize(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === composedE, "decomposed sequence composes to NFC")
    assert(out(2L) === composedE)
    assert(out(3L) === "plain ascii")
    assert(out(4L) === null)
    // the dedup motivation: the two spellings hash identically after NFC
    assert(out(1L).hashCode === out(2L).hashCode)
  }
}
