package graft.sources

/** Independent encrypted-PDF WRITER for fixture construction — its
  * own RC4 and Algorithm 2/3/4/5 implementations, streams encrypted
  * as the file is BUILT (no parsing, nothing shared with
  * [[PdfCrypt]]'s decrypt side beyond the published spec constants),
  * so extract(build(·)) is a genuine differential. Emits V1/R2
  * (RC4-40), V2/R3 (RC4-128) and V4/R4 (/CFM /V2 or /AESV2)
  * documents with one raw and one Flate content stream.
  */
private[graft] object PdfCryptBuild {

  private val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  private def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    for (i <- 0 until 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
    }
    var i = 0
    j = 0
    data.map { b =>
      i = (i + 1) & 0xff
      j = (j + s(i)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      (b ^ s((s(i) + s(j)) & 0xff)).toByte
    }
  }

  private def padded(pw: Array[Byte]): Array[Byte] =
    (pw.take(32) ++ Pad).take(32)

  /** Algorithm 3: /O from the owner password. */
  def computeO(ownerPw: Array[Byte], userPw: Array[Byte], r: Int,
      n: Int): Array[Byte] = {
    var h = md5(padded(ownerPw))
    if (r >= 3) for (_ <- 0 until 50) h = md5(h)
    val rk = h.take(n)
    var o = rc4(rk, padded(userPw))
    if (r >= 3) for (i <- 1 to 19) o = rc4(rk.map(b => (b ^ i).toByte), o)
    o
  }

  /** Algorithm 2: the file encryption key. */
  def fileKey(userPw: Array[Byte], o: Array[Byte], p: Int,
      id0: Array[Byte], r: Int, n: Int): Array[Byte] = {
    val pLe = Array[Byte](p.toByte, (p >> 8).toByte, (p >> 16).toByte,
      (p >> 24).toByte)
    var key = md5(padded(userPw), o, pLe, id0)
    if (r >= 3) for (_ <- 0 until 50) key = md5(key.take(n))
    key.take(n)
  }

  /** Algorithms 4/5: /U for the user password. */
  def computeU(key: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
    if (r == 2) rc4(key, Pad)
    else {
      var u = md5(Pad, id0)
      for (i <- 0 to 19) u = rc4(key.map(b => (b ^ i).toByte), u)
      u ++ new Array[Byte](16)
    }

  private def objectKey(key: Array[Byte], obj: Int, aes: Boolean):
      Array[Byte] = {
    val tail = Array[Byte](obj.toByte, (obj >> 8).toByte,
      (obj >> 16).toByte, 0, 0)
    val salt = if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54)
      else Array.emptyByteArray
    md5(key, tail, salt).take(math.min(key.length + 5, 16))
  }

  private def aesEncrypt(okey: Array[Byte], plain: Array[Byte],
      iv: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(okey, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    iv ++ c.doFinal(plain)
  }

  private def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString

  private def iso(s: String) = s.getBytes("ISO-8859-1")

  /** Algorithm 2.B on the WRITE side (own loop structure): R5 plain
    * SHA-256; R6 the iterated SHA-2 family + AES-128-CBC chain.
    */
  private def hashV5(r: Int, pwd: Array[Byte],
      salt: Array[Byte]): Array[Byte] = {
    def sha(n: Int)(parts: Array[Byte]): Array[Byte] =
      java.security.MessageDigest.getInstance(s"SHA-$n").digest(parts)
    var k = sha(256)(pwd ++ salt)
    if (r == 5) return k
    var i = 0
    var stop = false
    while (!stop) {
      val block = pwd ++ k
      val k1 = Array.fill(64)(block).flatten
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(k.take(16), "AES"),
        new javax.crypto.spec.IvParameterSpec(k.slice(16, 32)))
      val e = c.doFinal(k1)
      k = (e.take(16).map(_ & 0xff).sum % 3) match {
        case 0 => sha(256)(e)
        case 1 => sha(384)(e)
        case _ => sha(512)(e)
      }
      i += 1
      stop = i >= 64 && (e.last & 0xff) <= i - 32
    }
    k.take(32)
  }

  /** A V5 (AES-256, R5/R6) document: file key wrapped in /UE under
    * the key-salt hash, /U = validation hash + salts. Streams are
    * AES-256-CBC under the file key directly.
    */
  def buildV5(r: Int, userPw: Array[Byte], lines: Seq[String],
      flateLine: String): Array[Byte] = {
    val pwd = userPw.take(127)
    val fileKey = Array.tabulate[Byte](32)(i => (i * 3 + 7).toByte)
    val valSalt = Array.tabulate[Byte](8)(i => (40 + i).toByte)
    val keySalt = Array.tabulate[Byte](8)(i => (80 + i).toByte)
    val u = hashV5(r, pwd, valSalt) ++ valSalt ++ keySalt
    val inter = hashV5(r, pwd, keySalt)
    val cUe = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    cUe.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(inter, "AES"),
      new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
    val ue = cUe.doFinal(fileKey)
    // owner fields: spec-shaped placeholders (the empty-user-password
    // reader never validates them)
    val o = Array.fill[Byte](48)(0x11)
    val oe = Array.fill[Byte](32)(0x22)
    def encStream(obj: Int, plain: Array[Byte]): Array[Byte] =
      aesEncrypt(fileKey, plain,
        Array.tabulate(16)(i => (obj * 11 + i).toByte))
    val content = "BT /F1 12 Tf 72 720 Td " +
      lines.map(l => s"($l) Tj T* ").mkString + "ET"
    val deflated = {
      val d = new java.util.zip.Deflater()
      val in = iso(s"BT 72 700 Td ($flateLine) Tj ET")
      d.setInput(in); d.finish()
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end(); bos.toByteArray
    }
    val s4 = encStream(4, iso(content))
    val s5 = encStream(5, deflated)
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(iso(s))
    w("%PDF-2.0\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >> endobj\n")
    w(s"4 0 obj << /Length ${s4.length} >> stream\n")
    bos.write(s4); w("\nendstream endobj\n")
    w(s"5 0 obj << /Length ${s5.length} /Filter /FlateDecode >> stream\n")
    bos.write(s5); w("\nendstream endobj\n")
    w(s"6 0 obj << /Filter /Standard /V 5 /R $r /Length 256 " +
      "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> " +
      "/StmF /StdCF /StrF /StdCF /P -44 " +
      s"/U <${hex(u)}> /UE <${hex(ue)}> /O <${hex(o)}> /OE <${hex(oe)}> " +
      ">> endobj\n")
    w("trailer << /Root 1 0 R /Encrypt 6 0 R >>\n%%EOF\n")
    bos.toByteArray
  }

  /** An encrypted two-stream document: a raw content stream showing
    * `lines` (PDF-safe text expected), then a Flate stream showing
    * `flateLine`. Deterministic (fixed /ID, IV derived from the
    * object number).
    */
  def build(r: Int, v: Int, nBits: Int, aes: Boolean,
      userPw: Array[Byte], lines: Seq[String],
      flateLine: String): Array[Byte] = {
    val n = nBits / 8
    val id0 = (1 to 16).map(_.toByte).toArray
    val o = computeO(userPw, userPw, r, n)
    val p = -44
    val key = fileKey(userPw, o, p, id0, r, n)
    val u = computeU(key, id0, r)
    def encStream(obj: Int, plain: Array[Byte]): Array[Byte] = {
      val okey = objectKey(key, obj, aes)
      if (aes)
        aesEncrypt(okey, plain, Array.tabulate(16)(i => (obj * 7 + i).toByte))
      else rc4(okey, plain)
    }
    val content = "BT /F1 12 Tf 72 720 Td " +
      lines.map(l => s"($l) Tj T* ").mkString + "ET"
    val deflated = {
      val d = new java.util.zip.Deflater()
      val in = iso(s"BT 72 700 Td ($flateLine) Tj ET")
      d.setInput(in); d.finish()
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end(); bos.toByteArray
    }
    val s4 = encStream(4, iso(content))
    val s5 = encStream(5, deflated)
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(iso(s))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >> endobj\n")
    w(s"4 0 obj << /Length ${s4.length} >> stream\n")
    bos.write(s4); w("\nendstream endobj\n")
    w(s"5 0 obj << /Length ${s5.length} /Filter /FlateDecode >> stream\n")
    bos.write(s5); w("\nendstream endobj\n")
    val cf = if (v == 4) {
      val cfm = if (aes) "/AESV2" else "/V2"
      s"/CF << /StdCF << /CFM $cfm /Length $n >> >> " +
        "/StmF /StdCF /StrF /StdCF "
    } else ""
    w(s"6 0 obj << /Filter /Standard /V $v /R $r /Length $nBits $cf" +
      s"/P $p /O <${hex(o)}> /U <${hex(u)}> >> endobj\n")
    w(s"trailer << /Root 1 0 R /Encrypt 6 0 R /ID [<${hex(id0)}> " +
      s"<${hex(id0)}>] >>\n%%EOF\n")
    bos.toByteArray
  }
}
