package graft.expr

/** Independent Outlook `.msg` WRITER for fixture construction — lays
  * out the [MS-OXMSG] stream names (property substreams, attachment
  * storages, embedded-message subtrees) over [[DocBuild.cfb]]'s
  * independently-implemented compound-file shell; nothing shared
  * with [[MsgText]]'s reading direction, so parse(build(·)) is a
  * genuine structural differential that also exercises [[Cfb]]'s
  * directory-tree walk (attachment substorages repeat stream names).
  */
private[graft] object MsgBuild {

  private def utf16(s: String): Array[Byte] = s.getBytes("UTF-16LE")
  private def ansi(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.Charset.forName("windows-1252"))

  /** The stream list of one message (no container): subject tag 0037,
    * body tag 1000, a placeholder fixed-property stream, then
    * attachment storages — by-value attachments first, embedded
    * messages (their own entry lists, nested recursively) after.
    */
  def msgEntries(subject: String, body: String, unicode: Boolean = true,
      atts: Seq[(String, String, Array[Byte])] = Nil,
      embedded: Seq[Seq[(String, Array[Byte])]] = Nil):
      Seq[(String, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    def strProp(tag: String, v: String): Unit =
      if (unicode) out += (s"__substg1.0_${tag}001F" -> utf16(v))
      else out += (s"__substg1.0_${tag}001E" -> ansi(v))
    if (subject != null) strProp("0037", subject)
    if (body != null) strProp("1000", body)
    out += ("__properties_version1.0" -> new Array[Byte](32))
    var n = 0
    atts.foreach { case (name, mime, content) =>
      val pfx = f"__attach_version1.0_#$n%08X/"
      if (unicode) {
        out += (pfx + "__substg1.0_3707001F" -> utf16(name))
        out += (pfx + "__substg1.0_370E001F" -> utf16(mime))
      } else {
        out += (pfx + "__substg1.0_3704001E" -> ansi(name))
        out += (pfx + "__substg1.0_370E001E" -> ansi(mime))
      }
      out += (pfx + "__substg1.0_37010102" -> content)
      n += 1
    }
    embedded.foreach { inner =>
      val pfx = f"__attach_version1.0_#$n%08X/__substg1.0_3701000D/"
      inner.foreach { case (k, v) => out += (pfx + k -> v) }
      n += 1
    }
    out.toSeq
  }

  /** A complete `.msg` compound file. */
  def msg(subject: String, body: String, unicode: Boolean = true,
      atts: Seq[(String, String, Array[Byte])] = Nil,
      embedded: Seq[Seq[(String, Array[Byte])]] = Nil): Array[Byte] =
    DocBuild.cfb(msgEntries(subject, body, unicode, atts, embedded))
}
