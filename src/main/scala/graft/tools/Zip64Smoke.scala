package graft.tools

import java.io.{BufferedOutputStream, FileOutputStream}

/** Real-scale ZIP64 smoke for [[graft.xlsx.RawZipWriter]] with the REAL
  * default thresholds: one stored entry past 4 GiB (so usize/csize AND the
  * next entry's offset all saturate their 32-bit fields) plus a small
  * deflated tail, read back through [[graft.xlsx.ZipRandom]] and the JDK's
  * `ZipFile`. RawZipZip64Spec covers the same branch with injected
  * thresholds on kilobyte fixtures every test run; this main is the
  * disk-hungry twin for the sf1 tooling pass (run:
  * `sbt "runMain graft.tools.Zip64Smoke [/tmp/zip64_smoke.zip]"`).
  */
object Zip64Smoke {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/tmp/zip64_smoke.zip"
    val size = 4L * 1024 * 1024 * 1024 + (16L << 20) // 4 GiB + 16 MiB
    val chunk = new Array[Byte](1 << 20)
    java.util.Arrays.fill(chunk, 'x'.toByte)
    val t0 = System.nanoTime()
    val crc = new java.util.zip.CRC32
    var left = size
    while (left > 0) {
      val n = math.min(left, chunk.length.toLong).toInt
      crc.update(chunk, 0, n); left -= n
    }
    val zw = new graft.xlsx.RawZipWriter(
      new BufferedOutputStream(new FileOutputStream(path), 1 << 20))
    zw.addRawEntry("big.bin", 0, crc.getValue, size, size)
    left = size
    while (left > 0) {
      val n = math.min(left, chunk.length.toLong).toInt
      zw.writePayload(chunk, 0, n); left -= n
    }
    zw.addDeflated("tail.txt", "after the giant".getBytes("UTF-8"), 6)
    zw.finish(); zw.close()
    val wroteSec = (System.nanoTime() - t0) / 1e9

    val in = graft.xlsx.ZipRandom.SeekableInput.forFile(path)
    val es = graft.xlsx.ZipRandom.entries(in)
    es.foreach(e => println(
      s"${e.name} csize=${e.compressedSize} usize=${e.uncompressedSize} off=${e.localHeaderOffset}"))
    require(es.exists(e => e.name == "big.bin" && e.uncompressedSize == size),
      "big entry size must resolve through the ZIP64 extra")
    val tail = es.find(_.name == "tail.txt").get
    require(tail.localHeaderOffset > 0xFFFFFFFFL,
      "tail offset must exceed 32 bits (offset-saturation branch)")
    val s = new String(
      graft.xlsx.ZipRandom.openEntry(in, tail).readAllBytes(), "UTF-8")
    require(s == "after the giant", s"tail content mismatch: $s")
    val st = graft.xlsx.ZipRandom.openEntry(in, es.find(_.name == "big.bin").get)
    val head = st.readNBytes(16); st.close()
    require(head.length == 16 && head.forall(_ == 'x'.toByte), "giant head mismatch")

    val zf = new java.util.zip.ZipFile(path)
    require(zf.getEntry("big.bin").getSize == size, "JDK must see the ZIP64 size")
    require(new String(
      zf.getInputStream(zf.getEntry("tail.txt")).readAllBytes(), "UTF-8")
      == "after the giant")
    zf.close()
    println(f"OK zip64 smoke: $path ${new java.io.File(path).length()} bytes, write $wroteSec%.1f s")
    new java.io.File(path).delete()
  }
}
