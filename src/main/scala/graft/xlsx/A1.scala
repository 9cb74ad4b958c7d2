package graft.xlsx

/** A1-style cell addressing: bijective base-26 column letters.
  * (ref: src/types.rs:209-225 for 0-based col_to_letter,
  * src/streaming_reader.rs:728-738 for parse; the writer keeps a 1-based
  * variant at src/fast_writer/zero_temp_workbook.rs:534-549.)
  */
object A1 {

  /** 0-based column index -> letters: 0->A, 25->Z, 26->AA, 701->ZZ, 702->AAA. */
  def colToLetter(col0: Int): String = {
    require(col0 >= 0, s"negative column index: $col0")
    val sb = new java.lang.StringBuilder(3)
    var n = col0 + 1
    while (n > 0) {
      n -= 1
      sb.insert(0, ('A' + n % 26).toChar)
      n /= 26
    }
    sb.toString
  }

  /** Leading letters of an A1 ref -> 0-based column index ("A1"->0, "AA3"->26).
    * Letters-only input is accepted; stops at the first non-letter. A ref
    * with no leading letters yields -1 (the reference saturates to 0 - 1 = 0
    * via `saturating_sub`; we keep 0 for parity). */
  def parseColumnIndex(ref: String): Int = {
    var i = 0
    var col = 0L
    while (i < ref.length && ref.charAt(i).isLetter) {
      col = col * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    math.max(col - 1, 0).toInt
  }

  /** Trailing digits of an A1 ref -> 0-based row index ("B12" -> 11). */
  def parseRowIndex(ref: String): Int = {
    var i = 0
    while (i < ref.length && ref.charAt(i).isLetter) i += 1
    if (i >= ref.length) 0
    else (ref.substring(i).toLong - 1).toInt
  }

  /** (0-based row, 0-based col) -> "A1" (ref: src/types.rs:209-211). */
  def cellRef(row0: Int, col0: Int): String = colToLetter(col0) + (row0 + 1)
}
