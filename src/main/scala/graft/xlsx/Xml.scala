package graft.xlsx

/** XML escaping for OOXML generation and entity decoding for parsing.
  * Escape set and control-char policy follow the reference's writer
  * (ref: src/fast_writer/xml_writer.rs:100-124 — drop control chars
  * below 0x20 except \t \n \r); decode follows
  * src/streaming_reader.rs:355-361 plus numeric character references.
  */
object Xml {

  def escape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 16)
    escapeInto(sb, s)
    sb.toString
  }

  def escapeInto(sb: java.lang.StringBuilder, s: String): Unit = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '&'  => sb.append("&amp;")
        case '<'  => sb.append("&lt;")
        case '>'  => sb.append("&gt;")
        case '"'  => sb.append("&quot;")
        case '\'' => sb.append("&apos;")
        case c if c < 0x20 && c != '\t' && c != '\n' && c != '\r' => () // drop
        case c => sb.append(c)
      }
      i += 1
    }
  }

  def decode(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i) {
          val ent = s.substring(i + 1, semi)
          val decoded: String = ent match {
            case "amp"  => "&"
            case "lt"   => "<"
            case "gt"   => ">"
            case "quot" => "\""
            case "apos" => "'"
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              try new String(Character.toChars(Integer.parseInt(e.substring(2), 16)))
              catch { case _: Exception => null }
            case e if e.startsWith("#") =>
              try new String(Character.toChars(Integer.parseInt(e.substring(1))))
              catch { case _: Exception => null }
            case _ => null
          }
          if (decoded != null) { sb.append(decoded); i = semi + 1 }
          else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
