package graft

/** Dev probe: measure actual max/mean differential vs the JDK codec
  * after the fancy-upsampler rounding fix (decides whether the spec
  * bounds can tighten).
  */
object JpegDiffProbe {
  def main(args: Array[String]): Unit = {
    import graft.expr.JpegDecode
    def enc(img: java.awt.image.BufferedImage, q: Float,
        prog: Boolean): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val p = w.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(q)
      if (prog) p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      w.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
      w.write(null, new javax.imageio.IIOImage(img, null, null), p)
      w.dispose()
      bos.toByteArray
    }
    def diff(b: Array[Byte]): (Int, Double) = {
      val hand = JpegDecode.decode(b)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      val w = img.getWidth; val h = img.getHeight
      var mx = 0; var sum = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val o = (y * w + x) * 3
        for ((c, sh) <- Seq((0, 16), (1, 8), (2, 0))) {
          val d = math.abs((hand.px(o + c) & 0xFF) - ((rgb >> sh) & 0xFF))
          if (d > mx) mx = d
          sum += d
        }
      }
      (mx, sum.toDouble / (w * h * 3))
    }
    val rnd = new java.util.Random(42)
    var worstMx = 0; var worstMean = 0.0
    for ((w, h) <- Seq((16, 16), (33, 17), (48, 32), (64, 48), (31, 33));
         q <- Seq(0.5f, 0.7f, 0.9f, 0.95f); prog <- Seq(false, true)) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, rnd.nextInt(0x1000000)) // color NOISE (hostile)
      val (mx, mean) = diff(enc(img, q, prog))
      if (mx > worstMx) worstMx = mx
      if (mean > worstMean) worstMean = mean
    }
    println(f"[jpegdiff] color-noise worst: max=$worstMx mean=$worstMean%.3f")
  }
}
