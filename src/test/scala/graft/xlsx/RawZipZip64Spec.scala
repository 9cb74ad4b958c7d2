package graft.xlsx

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.{Files, Paths}
import java.util.zip.{CRC32, ZipFile}

import org.scalatest.funsuite.AnyFunSuite

/** The ZIP64 branch of [[RawZipWriter]] — the stitch writer's >4 GiB /
  * >65 535-entry path, which production only hits on 100×-scale artifacts.
  * The saturation THRESHOLDS are injectable, so these tests cross them
  * with kilobyte fixtures while the on-disk SENTINELS stay the real
  * 0xFFFFFFFF / 0xFFFF; the result must round-trip through BOTH
  * [[ZipRandom]] (our reader) and `java.util.zip.ZipFile` (an independent
  * APPNOTE implementation). */
class RawZipZip64Spec extends AnyFunSuite {

  private def crcOf(b: Array[Byte]): Long = {
    val c = new CRC32; c.update(b); c.getValue
  }

  /** 5 entries: one big STORED payload crossing the size threshold, then
    * small deflated ones whose offsets sit past it; entry count crosses
    * the count threshold. */
  private def writeFixture(path: String, sizeThreshold: Long, countThreshold: Int,
                           big: Array[Byte], small: Map[String, String]): Unit = {
    val zw = new RawZipWriter(new FileOutputStream(path), sizeThreshold, countThreshold)
    zw.addRawEntry("big.bin", 0, crcOf(big), big.length.toLong, big.length.toLong)
    zw.writePayload(big, 0, big.length)
    small.toSeq.sortBy(_._1).foreach { case (name, content) =>
      zw.addDeflated(name, content.getBytes("UTF-8"), 6)
    }
    zw.finish(); zw.close()
  }

  private val big = Array.tabulate[Byte](1500)(i => ((i * 131) % 251).toByte)
  private val small = Map(
    "a.txt" -> "alpha alpha alpha", "b.txt" -> "bravo", "c.txt" -> "charlie",
    "d.txt" -> "delta delta")

  test("lowered thresholds emit the full ZIP64 chain; ZipRandom resolves true values") {
    val p = Files.createTempDirectory("z64").toString + "/z64.zip"
    writeFixture(p, sizeThreshold = 1024L, countThreshold = 3, big, small)

    // the ZIP64 EOCD record + locator must be present in the bytes
    val bytes = Files.readAllBytes(Paths.get(p))
    def hasSig(sig: Int): Boolean = bytes.sliding(4).exists(w =>
      (w(0) & 0xFF) == (sig & 0xFF) && (w(1) & 0xFF) == ((sig >> 8) & 0xFF) &&
        (w(2) & 0xFF) == ((sig >> 16) & 0xFF) && (w(3) & 0xFF) == ((sig >> 24) & 0xFF))
    assert(hasSig(0x06064b50), "ZIP64 EOCD record missing")
    assert(hasSig(0x07064b50), "ZIP64 EOCD locator missing")

    val in = ZipRandom.SeekableInput.forFile(p)
    val es = ZipRandom.entries(in)
    assert(es.map(_.name).sorted == Seq("a.txt", "b.txt", "big.bin", "c.txt", "d.txt"))
    val bigE = es.find(_.name == "big.bin").get
    assert(bigE.compressedSize == 1500L && bigE.uncompressedSize == 1500L,
      "sentinel fields must resolve through the 0x0001 extra")
    val got = ZipRandom.openEntry(in, bigE).readAllBytes()
    assert(got.sameElements(big))
    small.foreach { case (name, content) =>
      val e = es.find(_.name == name).get
      // every small entry sits past the 1024-byte threshold: its central
      // offset is saturated and must have resolved via the extra
      assert(e.localHeaderOffset > 1024L && e.localHeaderOffset < bytes.length)
      val s = new String(ZipRandom.openEntry(in, e).readAllBytes(), "UTF-8")
      assert(s == content)
    }
  }

  test("the JDK's ZipFile (independent APPNOTE reader) accepts the ZIP64 archive") {
    val p = Files.createTempDirectory("z64jdk").toString + "/z64.zip"
    writeFixture(p, sizeThreshold = 1024L, countThreshold = 3, big, small)
    val zf = new ZipFile(p)
    try {
      import scala.jdk.CollectionConverters._
      val names = zf.entries().asScala.map(_.getName).toSeq.sorted
      assert(names == Seq("a.txt", "b.txt", "big.bin", "c.txt", "d.txt"))
      val bigE = zf.getEntry("big.bin")
      assert(zf.getInputStream(bigE).readAllBytes().sameElements(big))
      small.foreach { case (name, content) =>
        assert(new String(zf.getInputStream(zf.getEntry(name)).readAllBytes(),
          "UTF-8") == content)
      }
    } finally zf.close()
  }

  test("count-threshold-only saturation: EOCD defers to the ZIP64 record") {
    val p = Files.createTempDirectory("z64c").toString + "/zc.zip"
    // size threshold at default (never fires) — only the entry COUNT
    // saturates, which is the >65 535-sheets shape
    val zw = new RawZipWriter(new FileOutputStream(p), 0xFFFFFFFFL, 2)
    small.toSeq.sortBy(_._1).foreach { case (name, content) =>
      zw.addDeflated(name, content.getBytes("UTF-8"), 6)
    }
    zw.finish(); zw.close()
    val in = ZipRandom.SeekableInput.forFile(p)
    val es = ZipRandom.entries(in)
    assert(es.map(_.name).sorted == Seq("a.txt", "b.txt", "c.txt", "d.txt"))
    small.foreach { case (name, content) =>
      val e = es.find(_.name == name).get
      assert(new String(ZipRandom.openEntry(in, e).readAllBytes(), "UTF-8") == content)
    }
  }

  test("default thresholds on a small archive: no ZIP64 records at all") {
    val bos = new ByteArrayOutputStream()
    val zw = new RawZipWriter(bos)
    zw.addDeflated("only.txt", "tiny".getBytes("UTF-8"), 6)
    zw.finish(); zw.close()
    val bytes = bos.toByteArray
    def hasSig(sig: Int): Boolean = bytes.sliding(4).exists(w =>
      (w(0) & 0xFF) == (sig & 0xFF) && (w(1) & 0xFF) == ((sig >> 8) & 0xFF) &&
        (w(2) & 0xFF) == ((sig >> 16) & 0xFF) && (w(3) & 0xFF) == ((sig >> 24) & 0xFF))
    assert(!hasSig(0x06064b50) && !hasSig(0x07064b50),
      "small archives must stay plain ZIP (desktop-tool compatibility)")
  }
}
