package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expr.{H264, H264Build}

/** Differential gates for the H.264 Annex B layer: the independent
  * fixture encoder (own MSB writer, own Exp-Golomb, own
  * emulation-prevention ESCAPER) builds all-I_PCM IDR streams whose
  * planted samples must round-trip bit-exactly; everything
  * entropy-coded must triage to NULL at its position. No reference
  * H.264 decoder exists in this container — the honesty line is the
  * same as the MP3/JPEG/VP8L decoders'.
  */
class H264Spec extends AnyFunSuite {

  private def ppmPixels(p: Array[Byte]): (Int, Int, Array[Byte]) = {
    assert(p != null, "frame was null")
    val s = new String(p, "ISO-8859-1")
    assert(s.startsWith("P6\n"))
    val parts = s.drop(3).split("\n", 3)
    val Array(w, h) = parts(0).split(" ").map(_.toInt)
    val off = p.length - w * h * 3
    (w, h, p.drop(off))
  }

  private def gray(wMbs: Int, hMbs: Int)(f: (Int, Int) => Int): Array[Byte] =
    Array.tabulate(wMbs * 16 * hMbs * 16)(i =>
      f(i % (wMbs * 16), i / (wMbs * 16)).toByte)

  test("I_PCM IDR round-trip: planted luma returns bit-exactly (gray ⇒ RGB == Y)") {
    // 2×1 MBs (32×16); values include 0x00 runs so the encoder must
    // insert emulation-prevention bytes the decoder strips
    val y = gray(2, 1)((x, yy) => if (x < 4 && yy < 4) 0 else (x * 7 + yy * 3) % 256)
    val stream = H264Build.grayStream(2, 1, Seq(y))
    val fs = H264.frames(stream, 8)
    assert(fs != null && fs.length == 1)
    val (w, h, rgb) = ppmPixels(fs(0))
    assert(w == 32 && h == 16)
    for (i <- 0 until w * h) {
      val exp = y(i) & 0xff
      assert((rgb(3 * i) & 0xff) == exp && (rgb(3 * i + 1) & 0xff) == exp &&
        (rgb(3 * i + 2) & 0xff) == exp, s"pixel $i")
    }
  }

  test("chroma decodes through the BT.601 integer transform") {
    // flat Y=128 with planted Cb/Cr extremes: clamped-red/blue checks
    val wMbs = 1; val hMbs = 1
    val y = Array.fill[Byte](256)(128.toByte)
    val cb = Array.fill[Byte](64)(255.toByte)
    val cr = Array.fill[Byte](64)(0.toByte)
    val stream = H264Build.sps(wMbs, hMbs) ++ H264Build.pps() ++
      H264Build.idrIpcm(wMbs, hMbs, y, cb, cr)
    val fs = H264.frames(stream, 4)
    assert(fs != null && fs.length == 1 && fs(0) != null)
    val (_, _, rgb) = ppmPixels(fs(0))
    // r = 128 + round(1.402·(0−128))  → clamp(−51) = 0
    // b = 128 + round(1.772·(255−128)) → clamp(353) = 255
    assert((rgb(0) & 0xff) == 0, s"r=${rgb(0) & 0xff}")
    assert((rgb(2) & 0xff) == 255, s"b=${rgb(2) & 0xff}")
  }

  test("frame cropping: SPS crop units subtract from the decoded dims") {
    val y = gray(2, 2)((x, yy) => (x + yy) % 256)
    val stream = H264Build.grayStream(2, 2, Seq(y),
      cropL = 1, cropR = 2, cropT = 1, cropB = 3)
    // 32−(1+2)·2 = 26; 32−(1+3)·2 = 24
    val m = H264.meta(stream)
    assert(m != null && m._1 == 26 && m._2 == 24 && m._3 == 1, m)
    val fs = H264.frames(stream, 4)
    val (w, h, rgb) = ppmPixels(fs(0))
    assert(w == 26 && h == 24)
    // cropped origin is (2, 2) in luma samples
    for ((xx, yy) <- Seq((0, 0), (25, 23), (7, 11))) {
      val exp = y((yy + 2) * 32 + (xx + 2)) & 0xff
      assert((rgb((yy * w + xx) * 3) & 0xff) == exp, s"($xx,$yy)")
    }
  }

  test("multi-frame streams keep positions; metadata counts slices") {
    val f1 = gray(1, 1)((_, _) => 40)
    val f2 = gray(1, 1)((_, _) => 200)
    val stream = H264Build.grayStream(1, 1, Seq(f1, f2))
    val m = H264.meta(stream)
    assert(m != null && m._1 == 16 && m._2 == 16 && m._3 == 2)
    val fs = H264.frames(stream, 8)
    assert(fs.length == 2 && fs(0) != null && fs(1) != null)
    assert(ppmPixels(fs(0))._3(0) == 40.toByte)
    assert(ppmPixels(fs(1))._3(0) == 200.toByte)
    // maxFrames caps
    assert(H264.frames(stream, 1).length == 1)
  }

  test("triage: CABAC, truncation, non-SPS-led, entropy-coded MB") {
    val y = gray(1, 1)((_, _) => 99)
    val chroma = Array.fill[Byte](64)(128.toByte)
    // CABAC PPS → the frame position nulls
    val cabac = H264Build.sps(1, 1) ++ H264Build.pps(cabac = true) ++
      H264Build.idrIpcm(1, 1, y, chroma, chroma)
    val fsC = H264.frames(cabac, 4)
    assert(fsC != null && fsC.length == 1 && fsC(0) == null)
    // a non-I_PCM macroblock (mb_type 0 = I_4x4) nulls the frame
    val bad = {
      val w = new H264Build.Bw
      w.ue(0); w.ue(7); w.ue(0); w.put(0, 4); w.ue(0); w.put(0, 4)
      w.put(0, 1); w.put(0, 1); w.se(0)
      w.ue(0) // mb_type 0: entropy-coded intra → must triage
      Array[Byte](0, 0, 0, 1, 0x65) ++ w.trailing()
    }
    val fsB = H264.frames(H264Build.sps(1, 1) ++ H264Build.pps() ++ bad, 4)
    assert(fsB != null && fsB(0) == null)
    // truncated I_PCM payload nulls
    val good = H264Build.grayStream(1, 1, Seq(y))
    val fsT = H264.frames(good.dropRight(40), 4)
    assert(fsT == null || fsT(0) == null)
    // junk and non-SPS-led streams null entirely
    assert(H264.frames("not video".getBytes, 4) == null)
    assert(H264.meta(Array[Byte](0, 0, 0, 1, 0x65, 1, 2, 3)) == null)
    // metadata still parses a CABAC stream (dims are header-layer)
    assert(H264.meta(cabac) != null)
  }

  test("VideoMeta and videoFrames dispatch route h264 streams") {
    val y = gray(1, 1)((x, yy) => (x * 16 + yy) % 251)
    val stream = H264Build.grayStream(1, 1, Seq(y))
    val m = graft.expr.VideoMeta.parse(stream)
    assert(m != null && m.getUTF8String(0).toString == "h264" &&
      m.getInt(1) == 16 && m.getInt(2) == 16)
    // the frames expression feeds the shared pixel tier
    val fs = graft.expr.H264Frames.framesEval(stream, 8)
    assert(fs != null && fs.numElements() == 1)
    val ppm = fs.getBinary(0)
    val st = graft.expr.PixelStats.parse(ppm)
    assert(st != null)
  }
}
