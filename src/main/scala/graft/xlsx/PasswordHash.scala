package graft.xlsx

/** The reference's legacy 16-bit sheet-protection password hash:
  * rotate-left-1 XOR over the password's chars in reverse, XOR length,
  * XOR 0xCE4B, upper hex (ref: src/types.rs:391-400, replicated
  * byte-for-byte — golden values in CoreSpec).
  *
  * NOTE this is the reference's *simplified variant*: genuine Excel
  * (MS-OSHARED 2.4.2.4) rotates the ACCUMULATING hash each iteration,
  * so for passwords of length ≥ 2 the two algorithms diverge and Excel
  * will not accept the password against a hash written by either the
  * reference or this port. Sheet protection is an honesty lock, not
  * cryptography; byte parity with the reference is the compatibility
  * contract chosen here, and files protected by this writer unprotect
  * correctly in this reader and the reference's.
  */
object PasswordHash {
  def hash(password: String): String = {
    var h = 0
    var i = password.length - 1
    while (i >= 0) {
      val c = password.charAt(i).toInt & 0xFFFF
      val rot = ((c << 1) | (c >>> 15)) & 0xFFFF
      h ^= rot
      i -= 1
    }
    h ^= password.length
    h ^= 0xCE4B
    f"${h & 0xFFFF}%04X"
  }
}

/** Sheet protection flags (ref: src/types.rs:265-291). Semantics are
  * inverted in the XML: flag=true (allow) emits attr="0" (unprotected)
  * (ref: src/fast_writer/zero_temp_workbook.rs:243-290). */
final case class ProtectionOptions(
    password: Option[String] = None,
    selectLockedCells: Boolean = false,
    selectUnlockedCells: Boolean = false,
    formatCells: Boolean = false,
    formatColumns: Boolean = false,
    formatRows: Boolean = false,
    insertColumns: Boolean = false,
    insertRows: Boolean = false,
    deleteColumns: Boolean = false,
    deleteRows: Boolean = false,
    sort: Boolean = false,
    autoFilter: Boolean = false
) {
  def toXml: String = {
    val sb = new java.lang.StringBuilder("<sheetProtection sheet=\"1\"")
    password.foreach(p => sb.append(" password=\"").append(PasswordHash.hash(p)).append('"'))
    def allow(flag: Boolean, attr: String): Unit =
      if (flag) sb.append(' ').append(attr).append("=\"0\"")
    allow(selectLockedCells, "selectLockedCells")
    allow(selectUnlockedCells, "selectUnlockedCells")
    allow(formatCells, "formatCells")
    allow(formatColumns, "formatColumns")
    allow(formatRows, "formatRows")
    allow(insertColumns, "insertColumns")
    allow(insertRows, "insertRows")
    allow(deleteColumns, "deleteColumns")
    allow(deleteRows, "deleteRows")
    allow(sort, "sort")
    allow(autoFilter, "autoFilter")
    sb.append("/>")
    sb.toString
  }
}
