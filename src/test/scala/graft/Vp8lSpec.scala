package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expr.{Vp8lBuild, Vp8lDecode}

/** Differential gates for the clean-room VP8L decoder: every stream
  * feature is exercised through the INDEPENDENT fixture encoder
  * (its own bit writer, canonical assignment, unpacked predictor
  * reference, cache hash) and the decode must reproduce the planted
  * pixel grid exactly. No reference WebP decoder exists in this
  * container (the JDK has none), so conformance evidence is the
  * spec-step control flow plus these encode/decode differentials —
  * the JPEG/PNG honesty line.
  */
class Vp8lSpec extends AnyFunSuite {

  private def rgbOf(b: Array[Byte]): (Int, Int, Array[Byte]) = {
    val d = Vp8lDecode.decode(b)
    assert(d != null, "decode returned null")
    assert(d.fmt == "webp" && d.ch == 3)
    (d.w, d.h, d.px)
  }

  private def expectRgb(pixels: Array[Int]): Array[Byte] =
    pixels.flatMap(p => Seq(((p >>> 16) & 0xff).toByte,
      ((p >>> 8) & 0xff).toByte, (p & 0xff).toByte))

  private def grid(w: Int, h: Int)(f: (Int, Int) => Int): Array[Int] =
    Array.tabulate(w * h)(i => f(i % w, i / w))

  test("distance map: spec ordering rule reproduces the published prefix") {
    val m = Vp8lDecode.DistMap
    assert(m.length == 120)
    assert(m.distinct.length == 120)
    // published leading entries (RFC 9649 listing)
    val prefix = Seq((0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
      (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0),
      (1, 3), (-1, 3), (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2),
      (0, 4), (4, 0))
    assert(m.take(24).map { case (dx, dy) => (dy, dx) }.toSeq ==
      prefix.map { case (a, b) => (b, a) }.toSeq ||
      m.take(24).toSeq == prefix.map { case (a, b) => (a, b) }.toSeq,
      m.take(24).toSeq.toString)
    // squared distance is non-decreasing
    val d2 = m.map { case (dx, dy) => dx * dx + dy * dy }
    assert(d2.zip(d2.tail).forall { case (a, b) => a <= b })
  }

  test("flat color: zero-bit single-symbol trees") {
    val px = grid(7, 5)((_, _) => 0xff34a1c7)
    val b = Vp8lBuild.container(Vp8lBuild.literal(7, 5, px))
    val (w, h, rgb) = rgbOf(b)
    assert(w == 7 && h == 5)
    assert(rgb.sameElements(expectRgb(px)))
  }

  test("literals: multi-symbol balanced trees through the code-length code") {
    // 5 distinct colors exercise the normal (non-simple) header path
    val colors = Array(0xff102030, 0xff405060, 0xff708090, 0xffa0b0c0,
      0xffd0e0f0)
    val px = grid(9, 4)((x, y) => colors((x + y * 3) % 5))
    val (w, h, rgb) = rgbOf(Vp8lBuild.container(Vp8lBuild.literal(9, 4, px)))
    assert(w == 9 && h == 4)
    assert(rgb.sameElements(expectRgb(px)))
  }

  test("alpha varies: literal alpha channel decodes (and drops into RGB)") {
    val px = grid(4, 3)((x, y) => ((0x40 + 0x30 * ((x + y) % 2)) << 24) |
      0x112233)
    val (_, _, rgb) = rgbOf(Vp8lBuild.container(Vp8lBuild.literal(4, 3, px)))
    assert(rgb.sameElements(expectRgb(px))) // alpha dropped, rgb intact
  }

  test("LZ77 row copy through the 2D distance map") {
    val row = Array.tabulate(6)(x => 0xff000000 | (0x20 + x * 7) << 8)
    val b = Vp8lBuild.container(Vp8lBuild.rowCopy(6, 5, row))
    val (w, h, rgb) = rgbOf(b)
    assert(w == 6 && h == 5)
    val px = grid(6, 5)((x, _) => row(x))
    assert(rgb.sameElements(expectRgb(px)))
  }

  test("color cache: repeated colors round-trip through cache refs") {
    val a = 0xff0000ff; val c = 0xff00ff00
    val px = grid(8, 4)((x, y) => if ((x + y) % 2 == 0) a else c)
    for (bits <- Seq(1, 2, 8, 11)) {
      val enc = Vp8lBuild.literal(8, 4, px, cacheBits = bits)
      val (_, _, rgb) = rgbOf(Vp8lBuild.container(enc))
      assert(rgb.sameElements(expectRgb(px)), s"cacheBits $bits")
    }
    // engagement proof: a hand-tokened stream where every pixel but
    // the first is a CACHE REF (green symbols >= 256+24) must decode
    // back to the repeated color
    val w = new Vp8lBuild.Bw
    w.put(0x2f, 8).put(3, 14).put(0, 14).put(0, 1).put(0, 3) // 4x1
    w.put(0, 1) // no transforms
    Vp8lBuild.encodeStream(w, 4, Seq(Vp8lBuild.Lit(a),
      Vp8lBuild.CacheRef(a), Vp8lBuild.CacheRef(a), Vp8lBuild.CacheRef(a)),
      cacheBits = 2)
    val got = Vp8lDecode.decodeArgb(w.result())
    assert(got != null && got._1.toSeq == Seq(a, a, a, a))
  }

  test("subtract-green transform inverts") {
    val px = grid(5, 5)((x, y) => 0xff000000 | ((10 + x * 9) << 16) |
      ((100 + y * 11) << 8) | (200 + ((x * y) % 7)))
    val (_, _, rgb) = rgbOf(Vp8lBuild.container(
      Vp8lBuild.subtractGreen(5, 5, px)))
    assert(rgb.sameElements(expectRgb(px)))
  }

  test("color indexing: every packing width, incl. ragged last byte") {
    // size 2 → 8 px/byte; size 4 → 4; size 16 → 2; size 17 → 1
    val pals = Seq(
      Array(0xff000000, 0xffffffff),
      Array(0xff102030, 0xff405060, 0xff708090, 0xffa0b0c0),
      Array.tabulate(16)(i => 0xff000000 | (i * 15) << 8),
      Array.tabulate(17)(i => 0xff000000 | (i * 13) << 16))
    for (pal <- pals; w <- Seq(5, 8)) { // 5 exercises the ragged pack
      val h = 4
      val idx = Array.tabulate(w * h)(i => (i * 7 + 3) % pal.length)
      val b = Vp8lBuild.container(Vp8lBuild.palette(w, h, pal, idx))
      val (dw, dh, rgb) = rgbOf(b)
      assert(dw == w && dh == h, s"pal ${pal.length} w $w")
      val px = idx.map(pal(_))
      assert(rgb.sameElements(expectRgb(px)), s"pal ${pal.length} w $w")
    }
  }

  test("predictor transform: all 14 modes invert against the unpacked reference") {
    // a deterministic non-flat image so every neighbor combination
    // feeds the mode formulas (incl. Select and the clamped adds)
    val px = grid(8, 6)((x, y) => 0xff000000 |
      (((x * 37 + y * 101) % 256) << 16) |
      (((x * 59 + y * 13 + 7) % 256) << 8) |
      ((x * 23 + y * 71 + 15) % 256))
    for (mode <- 0 to 13) {
      val b = Vp8lBuild.container(Vp8lBuild.predictor(8, 6, px, mode))
      val (_, _, rgb) = rgbOf(b)
      assert(rgb.sameElements(expectRgb(px)), s"mode $mode")
    }
  }

  test("predictor: rightmost-column TR aliases to the current row start") {
    // mode 3 (TR) on the last column exercises the row-major alias;
    // the reference encoder computes the same alias, so a decoder
    // that clamped or wrapped differently would diverge
    val px = grid(4, 4)((x, y) => 0xff000000 | ((x * 50 + y * 30) << 8))
    val b = Vp8lBuild.container(Vp8lBuild.predictor(4, 4, px, 3))
    val (_, _, rgb) = rgbOf(b)
    assert(rgb.sameElements(expectRgb(px)))
  }

  test("color transform inverts (signed 3.5-fixed-point deltas)") {
    val px = grid(6, 4)((x, y) => 0xff000000 |
      (((x * 41 + y * 17) % 256) << 16) |
      (((x * 29 + y * 83 + 5) % 256) << 8) |
      ((x * 67 + y * 31 + 9) % 256))
    // positive, negative and extreme-signed delta bytes
    for ((g2r, g2b, r2b) <- Seq((16, -8 & 0xff, 4), (0x7f, 0x80, 0xff),
        (1, 2, 3))) {
      val b = Vp8lBuild.container(
        Vp8lBuild.colorTransform(6, 4, px, g2r, g2b, r2b))
      val (_, _, rgb) = rgbOf(b)
      assert(rgb.sameElements(expectRgb(px)), s"cte ($g2r,$g2b,$r2b)")
    }
  }

  test("meta prefix codes: two entropy tiles select two huffman groups") {
    // 8×1 image, metaBits = 2 → 2 tiles of 4px; the 1×2 entropy image
    // assigns group 0 to the left tile and group 1 to the right; each
    // group's single-symbol trees carry a different color, so the
    // decoded row proves per-tile group selection
    val colA = 0xff336699; val colB = 0xff995533
    val w = new Vp8lBuild.Bw
    w.put(0x2f, 8).put(7, 14).put(0, 14).put(0, 1).put(0, 3) // 8×1
    w.put(0, 1) // no transforms
    w.put(0, 1) // no color cache
    w.put(1, 1) // meta prefix codes present
    w.put(0, 3) // metaBits = 2
    // entropy image (2×1, not level 0): greens {0, 1} in tile order
    Vp8lBuild.encodeStream(w, 2, Seq(Vp8lBuild.Lit(0xff000000),
      Vp8lBuild.Lit(0xff000100)), cacheBits = 0, level0 = false)
    // group 0 trees then group 1 trees, single-symbol each
    for (col <- Seq(colA, colB)) {
      val g = (col >>> 8) & 0xff; val r = (col >>> 16) & 0xff
      val bl = col & 0xff; val a = (col >>> 24) & 0xff
      for (s <- Seq(g, r, bl, a, 0)) { // green, red, blue, alpha, dist
        w.put(1, 1).put(0, 1) // simple, 1 symbol
        if (s < 2) w.put(0, 1).put(s, 1) else w.put(1, 1).put(s, 8)
      }
    }
    val got = Vp8lDecode.decodeArgb(w.result())
    assert(got != null, "meta decode returned null")
    assert(got._1.toSeq == Seq.fill(4)(colA) ++ Seq.fill(4)(colB),
      got._1.toSeq.map(_.toHexString).toString)
  }

  test("triage: signature, version, truncation, lossy VP8, cache bits") {
    val good = Vp8lBuild.container(Vp8lBuild.literal(4, 4,
      grid(4, 4)((_, _) => 0xff112233)))
    assert(Vp8lDecode.decode(null) == null)
    assert(Vp8lDecode.decode("RIFFxxxxWEBP".getBytes) == null)
    // flip the VP8L signature byte
    val badSig = good.clone(); badSig(20) = 0x2e
    assert(Vp8lDecode.decode(badSig) == null)
    // version != 0 (bits 29-31 of the 5-byte header live in byte 24)
    val badVer = good.clone(); badVer(24) = (badVer(24) | 0xe0).toByte
    assert(Vp8lDecode.decode(badVer) == null)
    // truncated payload
    assert(Vp8lDecode.decode(good.take(good.length - 2)) == null)
    // lossy chunk triages
    val lossy = good.clone()
    lossy(12) = 'V'; lossy(13) = 'P'; lossy(14) = '8'; lossy(15) = ' '
    assert(Vp8lDecode.decode(lossy) == null)
    // and the PixelStats dispatch routes the container to the hand
    // decoder (grid signatures consume PixelStats.decode internally)
    assert(graft.expr.PixelGridSig.sig(good, 2, 2) != null)
  }

  test("thumbnails and grid signatures extend to WEBP through the shared walk") {
    val px = grid(8, 8)((x, y) =>
      0xff000000 | (if ((x / 4 + y / 4) % 2 == 0) 0x202020 else 0xe0e0e0))
    val b = Vp8lBuild.container(Vp8lBuild.literal(8, 8, px))
    val resized = graft.expr.ResizePixels.resize(b, 2, 2)
    assert(resized != null) // PPM thumbnail out of a WEBP in
    val sig = graft.expr.PixelGridSig.sig(b, 2, 2)
    assert(sig != null)
  }
}
