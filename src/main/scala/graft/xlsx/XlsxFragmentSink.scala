package graft.xlsx

import java.io.OutputStream
import java.util.zip.{CRC32, Deflater, DeflaterOutputStream}

/** One worksheet payload of a fragment file: the byte range holds the
  * sheet XML as a finished raw-deflate stream, ready to be copied verbatim
  * into a ZIP entry by [[RawZipWriter]] at commit. */
final case class FragmentSheet(
    name: String,
    continuation: Boolean,
    rows: Int,
    offset: Long,
    compressedSize: Long,
    uncompressedSize: Long,
    crc: Long) extends Serializable

/** Task-side sink of the parallel single-workbook write: each worksheet's
  * XML is deflated independently (nowrap — exactly the encoding a ZIP
  * entry body uses) and appended to one fragment stream, with per-sheet
  * (offset, sizes, CRC-32) recorded for the commit metadata. No package
  * parts are written — the driver generates those once at stitch time.
  *
  * The whole point: ZIP entries are independent deflate streams, so N
  * tasks can compress N sheets concurrently and the driver's commit is
  * pure byte concatenation + a central directory — the compression work
  * (the expensive part of an xlsx write) parallelizes, while the output
  * is still ONE workbook. The reference's writer is single-threaded by
  * construction (ref: src/fast_writer/zero_temp_workbook.rs:77-130). */
private[graft] final class XlsxFragmentSink(out: OutputStream, level: Int)
    extends XlsxWriter.WorkbookSink {
  require(level >= 0 && level <= 9, "compression level 0-9")

  private val sheets = scala.collection.mutable.ArrayBuffer
    .empty[(Long, Long, Long, Long, Int)] // offset, csize, usize, crc, rows
  private var pos = 0L
  private var usize = 0L
  private var crc: CRC32 = _
  private var defl: DeflaterOutputStream = _
  private var deflater: Deflater = _
  private var sheetStart = 0L
  private var names: Seq[String] = Nil
  private var conts: Seq[Int] = Nil
  private var done = false

  // counts compressed bytes without owning the underlying stream
  private val counting = new OutputStream {
    override def write(b: Int): Unit = { out.write(b); pos += 1 }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      out.write(b, off, len); pos += len
    }
  }

  override def startSheet(i: Int): Unit = {
    sheetStart = pos
    usize = 0L
    crc = new CRC32
    deflater = new Deflater(level, true)
    defl = new DeflaterOutputStream(counting, deflater, 64 * 1024)
  }

  override def write(b: Array[Byte], off: Int, len: Int): Unit = {
    crc.update(b, off, len)
    usize += len
    defl.write(b, off, len)
  }

  override def endSheet(rows: Int): Unit = {
    defl.finish() // final deflate block; does NOT close the fragment stream
    deflater.end()
    sheets += ((sheetStart, pos - sheetStart, usize, crc.getValue, rows))
    defl = null
  }

  override def finishPackage(sheetNames: Seq[String], continuations: Seq[Int]): Unit = {
    names = sheetNames
    conts = continuations
    out.flush()
    out.close()
    done = true
  }

  /** Per-sheet metadata, valid after the writer is closed. */
  def result(): Seq[FragmentSheet] = {
    require(done, "fragment sink not closed")
    val contSet = conts.toSet
    names.zipWithIndex.map { case (n, i) =>
      val (off, cs, us, c, rows) = sheets(i)
      FragmentSheet(n, contSet(i), rows, off, cs, us, c)
    }
  }
}
