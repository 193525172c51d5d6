package graft.expr

/** Deterministic H.264 Annex B fixture encoder for the oracle-gated
  * h264 queries and H264Spec — NOT a general encoder (GifBuild /
  * Vp8lBuild's sibling). Emits baseline-profile SPS + PPS + IDR
  * slices whose macroblocks are ALL I_PCM: the one macroblock type
  * with no entropy coding, so the planted samples round-trip
  * bit-exactly through any conforming decoder. All bit-level pieces
  * (MSB-first writer, Exp-Golomb, RBSP trailing, emulation-prevention
  * ESCAPING) are implemented independently of [[H264]]'s reader —
  * decode(encode(x)) == x is a genuine differential, and planted
  * zero runs in the samples force real escape insertions.
  */
private[graft] object H264Build {

  /** MSB-first bit writer with ue/se and RBSP trailing. */
  final class Bw {
    private val bytes = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def put(v: Int, bits: Int): this.type = {
      var i = bits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1)
        n += 1
        if (n == 8) { bytes.write(acc); acc = 0; n = 0 }
        i -= 1
      }
      this
    }
    def ue(v: Int): this.type = {
      require(v >= 0)
      val x = v + 1
      var lz = -1
      var t = x
      while (t != 0) { t >>= 1; lz += 1 }
      put(0, lz); put(x, lz + 1)
    }
    def se(v: Int): this.type = ue(if (v > 0) 2 * v - 1 else -2 * v)
    def byteAligned: Boolean = n == 0
    def alignZero(): this.type = { while (n != 0) put(0, 1); this }
    def putByte(v: Int): this.type = { require(n == 0); put(v, 8) }
    def trailing(): Array[Byte] = { put(1, 1); alignZero(); bytes.toByteArray }
    def raw(): Array[Byte] = { require(n == 0); bytes.toByteArray }
  }

  /** Emulation-prevention escape: insert 0x03 after 00 00 when the
    * next byte would be ≤ 3.
    */
  private def escape(rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbsp.length + 16)
    var zeros = 0
    for (b <- rbsp) {
      val v = b & 0xff
      if (zeros >= 2 && v <= 3) { out.write(3); zeros = 0 }
      out.write(v)
      zeros = if (v == 0) zeros + 1 else 0
    }
    out.toByteArray
  }

  private def nal(refIdc: Int, nalType: Int, rbsp: Array[Byte]): Array[Byte] =
    Array[Byte](0, 0, 0, 1, ((refIdc << 5) | nalType).toByte) ++ escape(rbsp)

  /** Baseline SPS: 4:2:0, 8-bit, frame-coded, poc type 0, optional
    * cropping (units of 2 luma samples per the 4:2:0 crop rule).
    */
  def sps(widthMbs: Int, heightMbs: Int, cropL: Int = 0, cropR: Int = 0,
      cropT: Int = 0, cropB: Int = 0): Array[Byte] = {
    val w = new Bw
    w.put(66, 8) // profile baseline
    w.put(0, 8) // constraint flags
    w.put(30, 8) // level 3.0
    w.ue(0) // sps id
    w.ue(0) // log2_max_frame_num_minus4
    w.ue(0) // poc type 0
    w.ue(0) // log2_max_poc_lsb_minus4
    w.ue(0) // max_num_ref_frames
    w.put(0, 1) // gaps
    w.ue(widthMbs - 1)
    w.ue(heightMbs - 1)
    w.put(1, 1) // frame_mbs_only
    w.put(0, 1) // direct_8x8
    val crop = cropL + cropR + cropT + cropB > 0
    w.put(if (crop) 1 else 0, 1)
    if (crop) { w.ue(cropL); w.ue(cropR); w.ue(cropT); w.ue(cropB) }
    w.put(0, 1) // vui absent
    nal(3, 7, w.trailing())
  }

  /** Minimal CAVLC PPS (one slice group, no deblock control fields). */
  def pps(cabac: Boolean = false): Array[Byte] = {
    val w = new Bw
    w.ue(0); w.ue(0) // pps id, sps id
    w.put(if (cabac) 1 else 0, 1) // entropy mode
    w.put(0, 1) // bottom_field_pic_order
    w.ue(0) // slice groups − 1
    w.ue(0); w.ue(0) // num_ref_idx defaults
    w.put(0, 1); w.put(0, 2) // weighted pred, idc
    w.se(0); w.se(0); w.se(0) // qp, qs, chroma offset
    w.put(0, 1) // deblocking control present
    w.put(0, 1) // constrained intra
    w.put(0, 1) // redundant pic cnt present
    nal(3, 8, w.trailing())
  }

  /** One all-I_PCM IDR slice over planted planes (luma w·h at 16-px
    * MB granularity, chroma quarter-size).
    */
  def idrIpcm(widthMbs: Int, heightMbs: Int, y: Array[Byte],
      cb: Array[Byte], cr: Array[Byte]): Array[Byte] = {
    val lw = widthMbs * 16
    require(y.length == lw * heightMbs * 16)
    require(cb.length == lw / 2 * heightMbs * 8 && cr.length == cb.length)
    val w = new Bw
    w.ue(0) // first_mb_in_slice
    w.ue(7) // slice_type I (all slices in pic)
    w.ue(0) // pps id
    w.put(0, 4) // frame_num (log2 = 4)
    w.ue(0) // idr_pic_id
    w.put(0, 4) // poc lsb (log2 = 4)
    w.put(0, 1); w.put(0, 1) // IDR ref-pic marking flags
    w.se(0) // slice_qp_delta
    var mb = 0
    while (mb < widthMbs * heightMbs) {
      w.ue(25) // I_PCM
      w.alignZero()
      val mbx = mb % widthMbs
      val mby = mb / widthMbs
      var i = 0
      while (i < 256) {
        w.putByte(y((mby * 16 + i / 16) * lw + mbx * 16 + i % 16) & 0xff)
        i += 1
      }
      i = 0
      while (i < 64) {
        w.putByte(cb((mby * 8 + i / 8) * (lw / 2) + mbx * 8 + i % 8) & 0xff)
        i += 1
      }
      i = 0
      while (i < 64) {
        w.putByte(cr((mby * 8 + i / 8) * (lw / 2) + mbx * 8 + i % 8) & 0xff)
        i += 1
      }
      mb += 1
    }
    nal(3, 5, w.trailing())
  }

  /** A full SPS+PPS+frames elementary stream; `grayFrames` are
    * luma-only (chroma pinned to 128 → RGB == luma exactly under the
    * BT.601 integer transform).
    */
  def grayStream(widthMbs: Int, heightMbs: Int,
      grayFrames: Seq[Array[Byte]], cropL: Int = 0, cropR: Int = 0,
      cropT: Int = 0, cropB: Int = 0): Array[Byte] = {
    val chroma = Array.fill[Byte](widthMbs * 8 * heightMbs * 8)(128.toByte)
    sps(widthMbs, heightMbs, cropL, cropR, cropT, cropB) ++ pps() ++
      grayFrames.flatMap(f => idrIpcm(widthMbs, heightMbs, f, chroma, chroma))
  }
}
