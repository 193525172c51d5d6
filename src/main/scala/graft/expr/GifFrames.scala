package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Animated-GIF frame decode — the first REAL inter-frame video
  * decoder in the tree. GIF is an inter-frame format: frames may be
  * partial rects at offsets composited over the previous canvas
  * under a per-frame disposal method, with transparent pixels
  * leaving the canvas untouched — exactly the dependence structure
  * H.264-class codecs have, but losslessly decodable with the JDK's
  * own ImageIO GIF reader (public API, zero external dependencies).
  * Animated GIFs are, in practice, the short-video format crawled
  * corpora actually contain in volume.
  *
  * Output: the COMPOSITED frames as binary PPM (P6) images — the
  * same "frames as image blobs" contract as [[AviFrames]] /
  * [[Mp4Frames]], so GIF clips flow through the identical
  * videoFrameStats / videoSignatures / videoNearDup pipeline with no
  * new downstream code. Compositing per GIF89a: canvas = logical
  * screen, initially black; each frame draws its rect (transparency
  * respected via the reader's IndexColorModel); disposal
  * `restoreToBackgroundColor` clears the frame's rect, `
  * restoreToPrevious` reverts the canvas, `none`/`doNotDispose`
  * accumulate. Frame geometry and disposal come from the reader's
  * per-image metadata tree (`javax_imageio_gif_image_1.0`).
  *
  * Lossless means DETERMINISTIC: planted palette indices decode to
  * exact pixel values, so unlike JPEG this codec tier is
  * oracle-replayable (q164 plants gray-palette indices and the
  * DuckDB oracle replays the per-frame stats arithmetic).
  *
  * Bomb guards mirror the media tier: at most `maxFrames` frames,
  * canvas capped at 8 MiB of RGB bytes (checked from the header
  * BEFORE any decode), 64 MiB total output. A frame that fails to
  * decode ends the walk with the frames already composited
  * (truncated tail). Not a GIF, zero decodable frames → NULL, never
  * an error.
  */
case class GifFrames(child: Expression, maxFrames: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"${GifFrames.FunctionName} expects binary, got " +
          child.dataType.catalogString)
    else if (maxFrames < 1 || maxFrames > 4096)
      TypeCheckResult.TypeCheckFailure(
        s"${GifFrames.FunctionName} maxFrames must be in [1, 4096]: $maxFrames")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(v: Any): Any =
    GifFrames.frames(v.asInstanceOf[Array[Byte]], maxFrames)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.GifFrames.frames($c, $maxFrames);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GifFrames =
    copy(child = newChild)
}

object GifFrames {
  val FunctionName = "graft_gif_frames"

  val MaxCanvasBytes: Int = 8 << 20   // 8 MiB RGB canvas
  val MaxTotalBytes: Long = 64L << 20 // 64 MiB of emitted frames

  /** bytes → array of composited PPM frames, or null. Static for
    * codegen.
    */
  def frames(b: Array[Byte], maxFrames: Int): GenericArrayData = {
    if (b == null || b.length < 13) return null
    if (!(b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')) return null
    // logical screen from the fixed header — the bomb guard needs the
    // canvas size BEFORE any decoder allocation
    val w = (b(6) & 0xFF) | ((b(7) & 0xFF) << 8)
    val h = (b(8) & 0xFF) | ((b(9) & 0xFF) << 8)
    if (w <= 0 || h <= 0 || w.toLong * h * 3 > MaxCanvasBytes) return null

    val out = new java.util.ArrayList[Array[Byte]]()
    var total = 0L
    var reader: javax.imageio.ImageReader = null
    try {
      val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
      if (!it.hasNext) return null
      reader = it.next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(b))
      reader.setInput(iis, false, false)

      val canvas = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = canvas.createGraphics()
      var prev: java.awt.image.BufferedImage = null
      val header = s"P6\n$w $h\n255\n".getBytes("ISO-8859-1")
      val frameBytes = header.length + w * h * 3

      var i = 0
      var ok = true
      while (ok && i < maxFrames) {
        val frame = try reader.read(i) catch { case _: Exception => null }
        if (frame == null) ok = false
        else {
          // per-frame geometry + disposal from the GIF image metadata
          var x = 0; var y = 0; var disposal = "none"
          try {
            val md = reader.getImageMetadata(i)
              .getAsTree("javax_imageio_gif_image_1.0")
              .asInstanceOf[org.w3c.dom.Element]
            val kids = md.getChildNodes
            var k = 0
            while (k < kids.getLength) {
              val n = kids.item(k)
              n.getNodeName match {
                case "ImageDescriptor" =>
                  val a = n.getAttributes
                  x = a.getNamedItem("imageLeftPosition").getNodeValue.toInt
                  y = a.getNamedItem("imageTopPosition").getNodeValue.toInt
                case "GraphicControlExtension" =>
                  disposal = n.getAttributes
                    .getNamedItem("disposalMethod").getNodeValue
                case _ =>
              }
              k += 1
            }
          } catch { case _: Exception => /* defaults hold */ }

          if (disposal == "restoreToPrevious") {
            prev = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            prev.createGraphics().drawImage(canvas, 0, 0, null)
          }
          g.drawImage(frame, x, y, null)

          if (total + frameBytes > MaxTotalBytes) ok = false
          else {
            val px = new Array[Byte](frameBytes)
            System.arraycopy(header, 0, px, 0, header.length)
            val row = new Array[Int](w)
            var yy = 0
            while (yy < h) {
              canvas.getRGB(0, yy, w, 1, row, 0, w)
              var xx = 0
              while (xx < w) {
                val rgb = row(xx)
                val o = header.length + (yy * w + xx) * 3
                px(o) = ((rgb >> 16) & 0xFF).toByte
                px(o + 1) = ((rgb >> 8) & 0xFF).toByte
                px(o + 2) = (rgb & 0xFF).toByte
                xx += 1
              }
              yy += 1
            }
            out.add(px)
            total += frameBytes

            disposal match {
              case "restoreToBackgroundColor" =>
                // per GIF89a the rect reverts to background; composited
                // RGB canvases render background as black
                val fw = frame.getWidth; val fh = frame.getHeight
                val old = g.getColor
                g.setColor(java.awt.Color.BLACK)
                g.fillRect(x, y, fw, fh)
                g.setColor(old)
              case "restoreToPrevious" if prev != null =>
                g.drawImage(prev, 0, 0, null)
              case _ => // none / doNotDispose accumulate
            }
            i += 1
          }
        }
      }
      g.dispose()
    } catch { case _: Exception => /* frames so far */ }
    finally { if (reader != null) reader.dispose() }

    if (out.isEmpty) return null
    val arr = new Array[Any](out.size)
    var i = 0
    while (i < out.size) { arr(i) = out.get(i); i += 1 }
    new GenericArrayData(arr)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, exprs => GifFrames(exprs.head,
        if (exprs.length > 1)
          ExprArgs.intLit(FunctionName, "maxFrames", exprs(1))
        else 64),
      "built-in")
}
