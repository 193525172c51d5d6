package graft.expr

/** Independent `ar` + cpio WRITERS for fixture construction — their
  * own header emitters (GNU long-name table, newc hex fields with
  * the crc-form byte sum); nothing shared with [[ArEntries]] /
  * [[CpioEntries]]' reading direction, and both formats are ALSO
  * pinned against real binutils-ar / bsdtar / dpkg-deb output in
  * ArCpioSpec.
  */
private[graft] object ArBuild {

  /** GNU ar: names ≤15 chars inline (with the `/` terminator),
    * longer ones through the `//` table.
    */
  def ar(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("!<arch>\n".getBytes("ISO-8859-1"))
    def header(name: String, size: Long): Unit = {
      val h = new StringBuilder
      h.append(name.padTo(16, ' ').take(16))
      h.append("0           ".take(12)) // mtime
      h.append("0     ") // uid
      h.append("0     ") // gid
      h.append("100644  ") // mode
      h.append(size.toString.padTo(10, ' ').take(10))
      h.append("`\n")
      out.write(h.toString.getBytes("ISO-8859-1"))
    }
    val long = entries.filter(_._1.length > 15)
    val table = new java.io.ByteArrayOutputStream()
    val offsets = scala.collection.mutable.Map.empty[String, Int]
    long.foreach { case (n, _) =>
      offsets(n) = table.size()
      table.write((n + "/\n").getBytes("UTF-8"))
    }
    if (table.size() > 0) {
      header("//", table.size().toLong)
      table.writeTo(out)
      if (out.size() % 2 == 1) out.write('\n')
    }
    entries.foreach { case (name, data) =>
      val hdrName =
        if (name.length > 15) s"/${offsets(name)}" else name + "/"
      header(hdrName, data.length.toLong)
      out.write(data)
      if (out.size() % 2 == 1) out.write('\n')
    }
    out.toByteArray
  }

  /** SVR4 cpio: newc (`070701`) or crc (`070702`, byte-sum stamped). */
  def cpio(entries: Seq[(String, Array[Byte])],
      crcForm: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def hex8(v: Long): String = "%08x".format(v)
    def member(name: String, data: Array[Byte], mode: Long): Unit = {
      val sum =
        if (crcForm && data != null)
          data.foldLeft(0L)((a, x) => a + (x & 0xff)) & 0xffffffffL
        else 0L
      val sb = new StringBuilder
      sb.append(if (crcForm) "070702" else "070701")
      sb.append(hex8(1)) // ino
      sb.append(hex8(mode))
      sb.append(hex8(0)).append(hex8(0)) // uid gid
      sb.append(hex8(1)) // nlink
      sb.append(hex8(0)) // mtime
      sb.append(hex8(if (data == null) 0 else data.length.toLong))
      sb.append(hex8(0)).append(hex8(0)) // dev
      sb.append(hex8(0)).append(hex8(0)) // rdev
      sb.append(hex8(name.length + 1L))
      sb.append(hex8(sum))
      out.write(sb.toString.getBytes("ISO-8859-1"))
      out.write(name.getBytes("UTF-8"))
      out.write(0)
      while (out.size() % 4 != 0) out.write(0)
      if (data != null) {
        out.write(data)
        while (out.size() % 4 != 0) out.write(0)
      }
    }
    entries.foreach { case (n, d) => member(n, d, 0x81a4L) } // 0100644
    member("TRAILER!!!", null, 0L)
    out.toByteArray
  }
}
