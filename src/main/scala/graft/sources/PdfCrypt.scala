package graft.sources

import java.nio.charset.StandardCharsets

/** PDF standard security handler (empty user password) — the
  * DECRYPTION pass in front of [[Documents.pdfToText]]'s extractor:
  * a meaningful slice of wild PDFs is "encrypted" only to restrict
  * printing/copying, with the user password empty, and those should
  * extract like any other document.
  *
  * Supported: /Filter /Standard with V1/R2 (RC4-40), V2/R3 (RC4 up
  * to 128 bits), V4/R4 with /CFM /V2 (RC4) or /AESV2 (AES-128-CBC,
  * 16-byte IV prefix, PKCS#7 padding). Everything is algorithmic —
  * MD5/RC4 key schedule per the published algorithms, AES via the
  * JDK — except the 32-byte password pad constant, which is
  * STRUCTURALLY VERIFIED on every document: the handler recomputes
  * /U from the derived key (Algorithms 4/5) and compares it against
  * the file's /U before trusting anything, so a wrong pad (or a real
  * non-empty password) fails closed to NULL rather than emitting
  * garbage text.
  *
  * Only STREAM payloads are decrypted (replaced in a rebuilt byte
  * image; XRef streams, which the spec leaves in the clear, are
  * skipped): the text extractor reads content/CMap/font streams
  * exclusively, so dictionary strings can stay encrypted without
  * affecting extraction. V5/R5–R6 (AES-256) is ALSO supported — the
  * modern handler is again fully algorithmic (R6's Algorithm-2.B
  * SHA-256/384/512 + AES-CBC hash chain, the file key unwrapped from
  * /UE under the key-salt hash), and its /U hash comparison is an
  * even stronger gate than the legacy RC4 one. Crypt filters other
  * than the standard ones and documents whose /U check rejects the
  * empty password triage to null.
  */
private[graft] object PdfCrypt {

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

  private def rc4(key: Array[Byte], data: Array[Byte], from: Int,
      until: Int): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](until - from)
    i = 0
    j = 0
    var x = 0
    while (x < out.length) {
      i = (i + 1) & 0xff
      j = (j + s(i)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      out(x) = (data(from + x) ^ s((s(i) + s(j)) & 0xff)).toByte
      x += 1
    }
    out
  }

  /** PDF string at s(p) — `(literal)` with escapes or `<hex>`.
    * Returns (bytes, offset past it), or null.
    */
  private def pdfString(s: String, p0: Int): (Array[Byte], Int) = {
    var p = p0
    while (p < s.length && (s.charAt(p) == ' ' || s.charAt(p) == '\n' ||
        s.charAt(p) == '\r' || s.charAt(p) == '\t')) p += 1
    if (p >= s.length) return null
    val out = new java.io.ByteArrayOutputStream()
    if (s.charAt(p) == '<') {
      p += 1
      var hi = -1
      while (p < s.length && s.charAt(p) != '>') {
        val c = s.charAt(p)
        val v = Character.digit(c, 16)
        if (v >= 0) {
          if (hi < 0) hi = v
          else { out.write((hi << 4) | v); hi = -1 }
        }
        p += 1
      }
      if (hi >= 0) out.write(hi << 4)
      (out.toByteArray, p + 1)
    } else if (s.charAt(p) == '(') {
      p += 1
      var depth = 1
      while (p < s.length && depth > 0) {
        val c = s.charAt(p)
        if (c == '\\' && p + 1 < s.length) {
          val e = s.charAt(p + 1)
          e match {
            case 'n' => out.write('\n'); p += 2
            case 'r' => out.write('\r'); p += 2
            case 't' => out.write('\t'); p += 2
            case 'b' => out.write('\b'); p += 2
            case 'f' => out.write('\f'); p += 2
            case d if d >= '0' && d <= '7' =>
              var v = 0
              var k = 0
              p += 1
              while (k < 3 && p < s.length && s.charAt(p) >= '0' &&
                  s.charAt(p) <= '7') {
                v = v * 8 + (s.charAt(p) - '0')
                k += 1
                p += 1
              }
              out.write(v & 0xff)
            case other => out.write(other & 0xff); p += 2
          }
        } else {
          if (c == '(') depth += 1
          else if (c == ')') depth -= 1
          if (depth > 0) out.write(c & 0xff)
          p += 1
        }
      }
      (out.toByteArray, p)
    } else null
  }

  /** Algorithm 2.B (R6): the iterated SHA-256/384/512 + AES-128-CBC
    * hash; R5 uses the plain SHA-256. `udata` is empty for the user
    * password path.
    */
  private[graft] def hash2b(r: Int, pwd: Array[Byte], salt: Array[Byte],
      udata: Array[Byte]): Array[Byte] = {
    def sha(n: Int, parts: Array[Byte]*): Array[Byte] = {
      val d = java.security.MessageDigest.getInstance(s"SHA-$n")
      parts.foreach(d.update)
      d.digest()
    }
    var k = sha(256, pwd, salt, udata)
    if (r == 5) return k
    var round = 0
    var done = false
    var lastE: Int = 0
    while (!done) {
      val unit = pwd ++ k ++ udata
      val k1 = new Array[Byte](unit.length * 64)
      var i = 0
      while (i < 64) {
        System.arraycopy(unit, 0, k1, i * unit.length, unit.length)
        i += 1
      }
      val cipher = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      cipher.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(k, 0, 16, "AES"),
        new javax.crypto.spec.IvParameterSpec(k, 16, 16))
      val e = cipher.doFinal(k1)
      var mod = 0
      i = 0
      while (i < 16) { mod += e(i) & 0xff; i += 1 }
      k = (mod % 3) match {
        case 0 => sha(256, e)
        case 1 => sha(384, e)
        case _ => sha(512, e)
      }
      lastE = e(e.length - 1) & 0xff
      round += 1
      if (round >= 64 && lastE <= round - 32) done = true
      if (round > 1024) return null // malformed loop guard
    }
    java.util.Arrays.copyOf(k, 32)
  }

  private def intAfter(s: String, key: String, default: Int): Int = {
    val m = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(key) + "\\s*(-?\\d+)").matcher(s)
    if (m.find()) m.group(1).toInt else default
  }

  /** Decrypt-in-structure. Returns `bytes` unchanged if not
    * encrypted; null when encrypted but outside the supported
    * subset or the empty-password /U check fails.
    */
  def decrypt(bytes: Array[Byte]): Array[Byte] = {
    val raw = new String(bytes, StandardCharsets.ISO_8859_1)
    val encAt = raw.lastIndexOf("/Encrypt")
    if (encAt < 0) return bytes
    try {
      val m = java.util.regex.Pattern.compile(
        "/Encrypt\\s+(\\d+)\\s+(\\d+)\\s+R").matcher(raw)
      if (!m.find(encAt)) return null // inline dict: out of subset
      val encObj = m.group(1).toInt
      val om = java.util.regex.Pattern.compile(
        "(?s)(?<![0-9])" + encObj + "\\s+" + m.group(2).toInt +
          "\\s+obj\\b(.*?)endobj").matcher(raw)
      if (!om.find()) return null
      val dict = om.group(1)
      if (!dict.contains("/Standard")) return null
      val v = intAfter(dict, "/V", 0)
      val r = intAfter(dict, "/R", 2)
      val p = intAfter(dict, "/P", -1)
      val lengthBits = intAfter(dict, "/Length", 40)
      if (v == 5) {
        // AES-256 (PDF 2.0 / Acrobat 9+): the /U hash gates the empty
        // user password; the file key unwraps from /UE
        if (r != 5 && r != 6) return null
        if (!dict.contains("/AESV3")) return null
        val uAt5 = dict.indexOf("/U")
        val ueAt = dict.indexOf("/UE")
        if (uAt5 < 0 || ueAt < 0) return null
        val uStr5 = pdfString(dict, uAt5 + 2)
        val ueStr = pdfString(dict, ueAt + 3)
        if (uStr5 == null || ueStr == null || uStr5._1.length < 48 ||
            ueStr._1.length < 32) return null
        val u = uStr5._1
        val valSalt = java.util.Arrays.copyOfRange(u, 32, 40)
        val keySalt = java.util.Arrays.copyOfRange(u, 40, 48)
        val none = Array.emptyByteArray
        val h = hash2b(r, none, valSalt, none)
        if (h == null || !java.util.Arrays.equals(h,
            java.util.Arrays.copyOf(u, 32))) return null
        val inter = hash2b(r, none, keySalt, none)
        if (inter == null) return null
        val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
        c.init(javax.crypto.Cipher.DECRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(inter, "AES"),
          new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
        val fileKey = c.doFinal(ueStr._1.take(32))
        return rebuildWithDecryptedStreams(bytes, raw, encObj, fileKey,
          32, aes = true, v5 = true)
      }
      if (v < 1 || v > 4 || r < 2 || r > 4) return null
      val aes = v == 4 && dict.contains("/AESV2")
      if (v == 4 && !aes && !dict.contains("/V2")) return null
      val encryptMeta = !dict.contains("/EncryptMetadata false")
      val oAt = dict.indexOf("/O")
      val uAt = dict.indexOf("/U")
      if (oAt < 0 || uAt < 0) return null
      val oStr = pdfString(dict, oAt + 2)
      val uStr = pdfString(dict, uAt + 2)
      if (oStr == null || uStr == null || oStr._1.length < 32 ||
          uStr._1.length < 32) return null
      val oBytes = oStr._1.take(32)
      val uBytes = uStr._1.take(32)
      // first /ID element from the trailer
      val idAt = raw.lastIndexOf("/ID")
      var id0 = Array.emptyByteArray
      if (idAt >= 0) {
        var q = idAt + 3
        while (q < raw.length && (raw.charAt(q) == ' ' ||
            raw.charAt(q) == '[')) q += 1
        val idStr = pdfString(raw, q)
        if (idStr != null) id0 = idStr._1
      }

      val n = if (r == 2) 5 else math.max(5, math.min(16, lengthBits / 8))
      val pLe = Array[Byte](p.toByte, (p >> 8).toByte, (p >> 16).toByte,
        (p >> 24).toByte)
      var key = md5(Pad, oBytes, pLe, id0,
        if (r >= 4 && !encryptMeta)
          Array[Byte](-1, -1, -1, -1) else Array.emptyByteArray)
      if (r >= 3) {
        var i = 0
        while (i < 50) { key = md5(key.take(n)); i += 1 }
      }
      key = key.take(n)

      // the /U gate: recompute and compare (fails closed on a real
      // password, a wrong pad recollection, or a corrupt dict)
      val uOk =
        if (r == 2) java.util.Arrays.equals(rc4(key, Pad, 0, 32), uBytes)
        else {
          var u = md5(Pad, id0)
          var i = 0
          while (i <= 19) {
            val k2 = key.map(b => (b ^ i).toByte)
            u = rc4(k2, u, 0, u.length)
            i += 1
          }
          // RC4(key,·) applied at i=0 then XOR-keys 1..19; compare 16
          java.util.Arrays.equals(u.take(16), uBytes.take(16))
        }
      if (!uOk) return null

      rebuildWithDecryptedStreams(bytes, raw, encObj, key, n, aes,
        v5 = false)
    } catch {
      // javax.crypto throws CHECKED exceptions (InvalidKeyException
      // on a non-16/32-byte AES key from an odd /Length, etc.) —
      // they must not escape and fail the Spark task on one
      // poisoned row; the contract is NULL, never error
      case _: Exception => null
    }
  }

  private def objectKey(key: Array[Byte], n: Int, obj: Int, gen: Int,
      aes: Boolean, v5: Boolean): Array[Byte] = {
    if (v5) return key // AES-256 uses the file key directly
    val tail = Array[Byte](obj.toByte, (obj >> 8).toByte, (obj >> 16).toByte,
      gen.toByte, (gen >> 8).toByte)
    val salt = if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54)
      else Array.emptyByteArray
    md5(key, tail, salt).take(math.min(n + 5, 16))
  }

  private def aesDecrypt(okey: Array[Byte], data: Array[Byte], from: Int,
      until: Int): Array[Byte] = {
    if (until - from < 32 || (until - from) % 16 != 0) return null
    // AES accepts only 16/24/32-byte keys; a V4/AESV2 dict with an
    // off-spec /Length (e.g. the 40-bit default) derives a shorter
    // object key — reject before Cipher.init throws a checked
    // InvalidKeyException
    if (okey.length != 16 && okey.length != 32) return null
    val cipher = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    cipher.init(javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(okey, "AES"),
      new javax.crypto.spec.IvParameterSpec(
        java.util.Arrays.copyOfRange(data, from, from + 16)))
    val plain = cipher.doFinal(data, from + 16, until - from - 16)
    val padLen = plain(plain.length - 1) & 0xff
    if (padLen < 1 || padLen > 16 || padLen > plain.length) return null
    java.util.Arrays.copyOf(plain, plain.length - padLen)
  }

  /** Rebuild the file with every (non-XRef, non-Encrypt-object)
    * stream payload decrypted under its per-object key.
    */
  private def rebuildWithDecryptedStreams(bytes: Array[Byte], raw: String,
      encObj: Int, key: Array[Byte], n: Int, aes: Boolean,
      v5: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    val om = java.util.regex.Pattern.compile(
      "(\\d+)\\s+(\\d+)\\s+obj\\b").matcher(raw)
    var copied = 0
    while (om.find()) {
      val objNum = om.group(1).toInt
      val genNum = om.group(2).toInt
      val bodyEnd = raw.indexOf("endobj", om.end())
      val end = if (bodyEnd < 0) raw.length else bodyEnd
      val streamKw = raw.indexOf("stream", om.end())
      if (streamKw >= 0 && streamKw < end &&
          !raw.regionMatches(streamKw - 3, "end", 0, 3)) {
        val dict = raw.substring(om.end(), streamKw)
        var s = streamKw + 6
        if (s < raw.length && raw.charAt(s) == '\r') s += 1
        if (s < raw.length && raw.charAt(s) == '\n') s += 1
        val endStream = raw.indexOf("endstream", s)
        if (endStream >= 0 && endStream <= end) {
          // prefer the dict's literal /Length: ciphertext is
          // arbitrary bytes, so the EOL-trim heuristic can eat a
          // real payload byte (a ciphertext ending in 0x0D before
          // the writer's \n) or a spurious "endstream" inside the
          // ciphertext can cut it short
          var e = -1
          val lm = java.util.regex.Pattern.compile(
            "/Length\\s+(\\d+)(?!\\s+\\d+\\s+R)").matcher(dict)
          if (lm.find()) {
            val len = lm.group(1).toLong
            val cand = s + len
            if (len >= 0 && cand <= raw.length && cand >= s) {
              var q = cand.toInt
              while (q < raw.length && (raw.charAt(q) == '\r' ||
                  raw.charAt(q) == '\n' || raw.charAt(q) == ' ')) q += 1
              if (raw.regionMatches(q, "endstream", 0, 9)) e = cand.toInt
            }
          }
          if (e < 0) {
            e = endStream
            if (e > s && raw.charAt(e - 1) == '\n') e -= 1
            if (e > s && raw.charAt(e - 1) == '\r') e -= 1
          }
          val skip = objNum == encObj || dict.contains("/XRef")
          if (!skip) {
            val okey = objectKey(key, n, objNum, genNum, aes, v5)
            val plain =
              if (aes) aesDecrypt(okey, bytes, s, e)
              else rc4(okey, bytes, s, e)
            if (plain != null) {
              // copy up to the payload, then substitute
              out.write(bytes, copied, s - copied)
              out.write(plain)
              copied = e
            }
            // undecryptable payload (ragged AES length): left as-is;
            // the extractor's filter stage will triage that stream
          }
        }
      }
    }
    out.write(bytes, copied, bytes.length - copied)
    out.toByteArray
  }
}
