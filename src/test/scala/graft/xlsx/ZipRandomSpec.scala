package graft.xlsx

import java.io.FileOutputStream
import java.nio.file.Files
import java.util.zip.{CRC32, ZipEntry, ZipFile, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

/** Central-directory random access vs. the JDK's ZipFile as ground truth,
  * over both DEFLATE and STORED entries. */
class ZipRandomSpec extends AnyFunSuite {

  private def readAll(in: java.io.InputStream): Array[Byte] =
    try in.readAllBytes() finally in.close()

  private def writeWorkbook(path: String, rows: Int): Unit = {
    val out = new FileOutputStream(path)
    val w = new XlsxWriter(out)
    w.addSheet("S")
    (0 until rows).foreach(i => w.writeRow(Seq(s"r$i", i.toString)))
    w.close()
  }

  test("entries() matches ZipFile central directory; openEntry streams identical bytes") {
    val f = Files.createTempFile("ziprand", ".xlsx").toString
    writeWorkbook(f, 500)
    val seek = ZipRandom.SeekableInput.forFile(f)
    val got = ZipRandom.entries(seek).map(e => e.name -> e).toMap
    val zf = new ZipFile(f)
    try {
      val it = zf.entries()
      var n = 0
      while (it.hasMoreElements) {
        val e = it.nextElement()
        n += 1
        val m = got.getOrElse(e.getName, fail(s"entry ${e.getName} missing from ZipRandom"))
        assert(m.uncompressedSize === e.getSize, e.getName)
        assert(m.compressedSize === e.getCompressedSize, e.getName)
        assert(m.crc === e.getCrc, e.getName)
        val expect = readAll(zf.getInputStream(e))
        val actual = readAll(ZipRandom.openEntry(seek, m))
        assert(java.util.Arrays.equals(actual, expect), s"bytes differ for ${e.getName}")
      }
      assert(got.size === n)
    } finally zf.close()
  }

  test("STORED (uncompressed) entries and archive comments are handled") {
    val f = Files.createTempFile("ziprand-stored", ".zip").toString
    val zos = new ZipOutputStream(new FileOutputStream(f))
    val payload = ("stored payload " * 100).getBytes("UTF-8")
    val e = new ZipEntry("plain.txt")
    e.setMethod(ZipOutputStream.STORED)
    e.setSize(payload.length)
    e.setCompressedSize(payload.length)
    val crc = new CRC32(); crc.update(payload); e.setCrc(crc.getValue)
    zos.putNextEntry(e); zos.write(payload); zos.closeEntry()
    val d = new ZipEntry("deflated.txt")
    zos.putNextEntry(d); zos.write(payload); zos.closeEntry()
    // a comment shifts the EOCD away from the file tail — the backward scan
    // must still find the REAL record: the embedded decoy signature sits in
    // scan range but fails the comment-length self-consistency check
    zos.setComment("decoy EOCD sig PK\u0005\u0006 followed by enough trailing text that the backward scan reaches it before the real record")
    zos.close()
    val seek = ZipRandom.SeekableInput.forFile(f)
    val got = ZipRandom.entries(seek).map(x => x.name -> x).toMap
    assert(got.keySet === Set("plain.txt", "deflated.txt"))
    assert(got("plain.txt").method === 0)
    assert(got("deflated.txt").method === 8)
    Seq("plain.txt", "deflated.txt").foreach { name =>
      assert(java.util.Arrays.equals(readAll(ZipRandom.openEntry(seek, got(name))), payload), name)
    }
  }

  test("non-ZIP input fails with a clear error") {
    val f = Files.createTempFile("notzip", ".bin")
    Files.write(f, Array.fill[Byte](4096)(0x41))
    val ex = intercept[java.io.IOException] {
      ZipRandom.entries(ZipRandom.SeekableInput.forFile(f.toString))
    }
    assert(ex.getMessage.contains("central-directory"))
  }
}
