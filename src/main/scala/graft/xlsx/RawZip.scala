package graft.xlsx

import java.io.OutputStream
import java.util.zip.{CRC32, Deflater}

/** Hand-written ZIP container writer whose defining ability is adding
  * entries from ALREADY-COMPRESSED raw-deflate payloads — the driver-side
  * half of the parallel single-workbook write: partition tasks deflate
  * their own worksheet XML independently (ZIP entries are independent
  * deflate streams), and the commit concatenates the raw bytes here
  * without recompressing, then writes the central directory.
  *
  * `java.util.zip.ZipOutputStream` cannot do this (it owns the Deflater),
  * which is why this exists. Layout per the public PKWARE APPNOTE /
  * ISO 21320, the same structures [[ZipRandom]] parses on the read side:
  * local headers, central directory, EOCD, with the ZIP64 record/locator
  * and 0x0001 extras emitted whenever a size/offset/count saturates its
  * 32/16-bit field. Timestamps are pinned to the DOS epoch (1980-01-01)
  * so identical data produces identical bytes — reruns of a deterministic
  * pipeline yield checksummable artifacts.
  *
  * The reference has no equivalent: its single-workbook writer is one
  * sequential `ZipWriter` stream (ref: src/fast_writer/zero_temp_workbook.rs:77-130).
  *
  * The ZIP64 switch-over points are injectable (`zip64SizeThreshold`,
  * `zip64CountThreshold`) so tests can drive the >4 GiB / >65 535-entry
  * branch without multi-GiB fixtures; the SENTINEL values written into
  * saturated format fields stay 0xFFFFFFFF / 0xFFFF regardless — that is
  * what tells any APPNOTE-conforming reader (incl. [[ZipRandom]]) to
  * consult the 0x0001 extra / ZIP64 EOCD. Production uses the defaults,
  * i.e. the real field-capacity limits.
  */
final class RawZipWriter(out: OutputStream,
    zip64SizeThreshold: Long = 0xFFFFFFFFL,
    zip64CountThreshold: Int = 0xFFFF) {
  import RawZipWriter.Cen

  private val dir = scala.collection.mutable.ArrayBuffer.empty[Cen]
  private var pos = 0L
  private var pendingPayload = 0L // bytes the caller still owes for the open entry
  private var finished = false

  private val Max32 = 0xFFFFFFFFL
  private val Max16 = 0xFFFF

  /** Open an entry whose payload the caller will stream via [[writePayload]]
    * — exactly `csize` bytes of raw-deflate data (method 8) or stored data
    * (method 0). Sizes and CRC must be known up front (no data descriptor),
    * which the stitching use-case always has: fragments are finished files. */
  def addRawEntry(name: String, method: Int, crc: Long, csize: Long, usize: Long): Unit = {
    require(!finished, "ZIP already finished")
    require(pendingPayload == 0, s"previous entry short by $pendingPayload payload bytes")
    val nameB = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val zip64 = csize >= zip64SizeThreshold || usize >= zip64SizeThreshold
    dir += Cen(nameB, method, crc, csize, usize, pos)
    w32(0x04034b50L)
    w16(if (zip64) 45 else 20) // version needed
    w16(0) // flags: sizes known, no descriptor
    w16(method)
    w16(0); w16(0x21) // DOS time/date pinned to 1980-01-01
    w32(crc)
    w32(if (zip64) Max32 else csize)
    w32(if (zip64) Max32 else usize)
    w16(nameB.length)
    w16(if (zip64) 20 else 0) // extra length
    raw(nameB, 0, nameB.length)
    if (zip64) { // 0x0001 extra: in the LOCAL header both sizes, usize first
      w16(0x0001); w16(16); w64(usize); w64(csize)
    }
    pendingPayload = csize
  }

  /** Stream part of the open entry's payload (raw bytes, already in the
    * entry's declared method encoding). */
  def writePayload(b: Array[Byte], off: Int, len: Int): Unit = {
    require(len <= pendingPayload, s"payload overrun: $len > $pendingPayload remaining")
    raw(b, off, len)
    pendingPayload -= len
  }

  /** Convenience: add a small entry by deflating `content` now (package
    * parts — workbook.xml, styles, props — are driver-generated). */
  def addDeflated(name: String, content: Array[Byte], level: Int): Unit = {
    val d = new Deflater(level, true)
    d.setInput(content); d.finish()
    val buf = new Array[Byte](math.max(64, content.length / 2 + 64))
    val bos = new java.io.ByteArrayOutputStream()
    while (!d.finished()) {
      val n = d.deflate(buf)
      bos.write(buf, 0, n)
    }
    d.end()
    val crc = new CRC32; crc.update(content)
    val payload = bos.toByteArray
    addRawEntry(name, 8, crc.getValue, payload.length.toLong, content.length.toLong)
    writePayload(payload, 0, payload.length)
  }

  /** Central directory + EOCD (+ ZIP64 chain when any field saturates). */
  def finish(): Unit = {
    require(!finished, "ZIP already finished")
    require(pendingPayload == 0, s"open entry short by $pendingPayload payload bytes")
    val cdStart = pos
    dir.foreach { e =>
      val needU = e.usize >= zip64SizeThreshold
      val needC = e.csize >= zip64SizeThreshold
      val needO = e.offset >= zip64SizeThreshold
      val extraLen = { val n = Seq(needU, needC, needO).count(identity); if (n > 0) 4 + 8 * n else 0 }
      w32(0x02014b50L)
      w16(if (extraLen > 0) 45 else 20) // version made by
      w16(if (extraLen > 0) 45 else 20) // version needed
      w16(0)
      w16(e.method)
      w16(0); w16(0x21)
      w32(e.crc)
      w32(if (needC) Max32 else e.csize)
      w32(if (needU) Max32 else e.usize)
      w16(e.name.length)
      w16(extraLen)
      w16(0) // comment
      w16(0) // disk start
      w16(0) // internal attrs
      w32(0) // external attrs
      w32(if (needO) Max32 else e.offset)
      raw(e.name, 0, e.name.length)
      if (extraLen > 0) { // ZIP64 extra: only saturated fields, fixed order
        w16(0x0001); w16(extraLen - 4)
        if (needU) w64(e.usize)
        if (needC) w64(e.csize)
        if (needO) w64(e.offset)
      }
    }
    val cdSize = pos - cdStart
    val zip64 = dir.length > zip64CountThreshold ||
      cdStart >= zip64SizeThreshold || cdSize >= zip64SizeThreshold
    if (zip64) {
      val z64Pos = pos
      w32(0x06064b50L) // ZIP64 EOCD record
      w64(44) // size of remainder
      w16(45); w16(45)
      w32(0); w32(0) // disk numbers
      w64(dir.length.toLong); w64(dir.length.toLong)
      w64(cdSize); w64(cdStart)
      w32(0x07064b50L) // ZIP64 EOCD locator
      w32(0)
      w64(z64Pos)
      w32(1)
    }
    w32(0x06054b50L) // EOCD
    w16(0); w16(0)
    w16(if (dir.length > zip64CountThreshold) Max16 else dir.length)
    w16(if (dir.length > zip64CountThreshold) Max16 else dir.length)
    w32(if (cdSize >= zip64SizeThreshold) Max32 else cdSize)
    w32(if (cdStart >= zip64SizeThreshold) Max32 else cdStart)
    w16(0) // comment length
    out.flush()
    finished = true
  }

  def close(): Unit = out.close()

  private def raw(b: Array[Byte], off: Int, len: Int): Unit = {
    out.write(b, off, len); pos += len
  }
  private def w16(v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF); pos += 2
  }
  private def w32(v: Long): Unit = {
    out.write((v & 0xFF).toInt); out.write(((v >>> 8) & 0xFF).toInt)
    out.write(((v >>> 16) & 0xFF).toInt); out.write(((v >>> 24) & 0xFF).toInt)
    pos += 4
  }
  private def w64(v: Long): Unit = { w32(v & Max32); w32(v >>> 32) }
}

object RawZipWriter {
  private final case class Cen(
      name: Array[Byte], method: Int, crc: Long,
      csize: Long, usize: Long, offset: Long)
}
