package graft

/** Micro-probe for the MP3 decoder's per-clip cost (dev tool, the
  * JpegDecode-probe pattern): builds the q185-shape clip (128 frames,
  * sparse loud granules) and a dense all-loud clip, times
  * [[graft.expr.Mp3Decode.decode]] over repeated calls.
  */
object Mp3Probe {
  def main(args: Array[String]): Unit = {
    def frame(loud: Boolean): Array[Byte] = {
      def hx(s: String) = s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      if (loud) hx("FFFB10C0" + "00000040019000000008" + "00" * 7 + "0000" + "00" * 81)
      else hx("FFFB10C0" + "00" * 100)
    }
    val silent = frame(false)
    val loud = frame(true)
    val sparse = (0 until 64).flatMap(w =>
      Seq(if (w % 8 == 2) loud else silent, silent)).reduce(_ ++ _)
    val dense = (0 until 128).map(_ => loud).reduce(_ ++ _)
    def bench(name: String, clip: Array[Byte], n: Int): Unit = {
      var i = 0
      while (i < n / 5) { graft.expr.Mp3Decode.decode(clip); i += 1 } // warmup
      val t0 = System.nanoTime()
      i = 0
      var bytes = 0L
      while (i < n) {
        bytes += graft.expr.Mp3Decode.decode(clip).length
        i += 1
      }
      val us = (System.nanoTime() - t0) / 1e3 / n
      println(f"[mp3] $name%-22s ${us}%9.1f us/clip  " +
        f"(${clip.length} B in, ${bytes / n} B out, ${n} reps)")
    }
    bench("sparse q185 shape", sparse, 2000)
    bench("dense all-loud", dense, 500)
    bench("single silent frame", silent, 20000)
  }
}
