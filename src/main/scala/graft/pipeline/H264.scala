package graft.pipeline

import java.awt.image.BufferedImage

/** Minimal ITU-T H.264 (ISO/IEC 14496-10) decoder for the I_PCM subset
  * of baseline profile — real avc1 bitstream decode behind the
  * [[Multimodal.FallbackDecoder]] seam, closing the "declared-avc1 ⇒
  * stub" gap for the one coding mode whose reconstruction is exact by
  * definition: I_PCM macroblocks carry raw 8-bit 4:2:0 samples (spec
  * §7.3.5, mb_type 25 in I slices), so decode is bit-faithful with no
  * prediction, transform or deblocking state.
  *
  * HONEST-DECLINE CONTRACT (the q182 audit's rule): every stream feature
  * outside the subset — CABAC entropy coding, any non-I slice, any
  * non-I_PCM macroblock, field coding, chroma formats other than 4:2:0,
  * bit depths over 8, POC type 1, slice groups — returns None, and the
  * caller falls through to the tagged stub exactly as before. Nothing is
  * ever misdecoded; predicted/transform-coded video remains out of
  * scope (a general CAVLC+intra decoder is a codec project, not a data
  * pipeline component).
  *
  * All structures are parsed for real: avcC decoder configuration
  * (lengthSize + SPS/PPS sets), RBSP emulation-prevention unescape,
  * Exp-Golomb SPS/PPS/slice-header syntax including frame cropping, and
  * multi-slice pictures (each slice fills its macroblocks from
  * `first_mb_in_slice`). Chroma is upsampled nearest-neighbour (each
  * 4:2:0 sample covers a 2×2 luma block) and converted with the
  * full-range BT.601 matrix — gray (Cb=Cr=128) reconstructs R=G=B=Y
  * exactly, which the pixel-exact spec pins without conversion
  * ambiguity. */
object H264 {

  /** MSB-first bit reader over an RBSP (already unescaped) byte slice. */
  private final class BitReader(b: Array[Byte]) {
    private var pos = 0 // bit position
    def bitsLeft: Int = b.length * 8 - pos
    def u1(): Int = {
      if (pos >= b.length * 8) throw new IllegalStateException("eof")
      val v = (b(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1; v
    }
    def u(n: Int): Int = { var v = 0; var i = 0
      while (i < n) { v = (v << 1) | u1(); i += 1 }; v }
    /** Exp-Golomb ue(v); bounded so a corrupt stream cannot spin. */
    def ue(): Int = {
      var zeros = 0
      while (u1() == 0) { zeros += 1
        if (zeros > 31) throw new IllegalStateException("ue overflow") }
      if (zeros == 0) 0 else (1 << zeros) - 1 + u(zeros)
    }
    def se(): Int = { val k = ue()
      if ((k & 1) == 1) (k + 1) / 2 else -(k / 2) }
    def byteAligned: Boolean = (pos & 7) == 0
    def alignToByte(): Unit = while (!byteAligned) {
      if (u1() != 0) throw new IllegalStateException("nonzero align bit") }
    def u8Aligned(): Int = { // fast path for PCM runs
      if (!byteAligned) throw new IllegalStateException("unaligned pcm")
      if (pos >= b.length * 8) throw new IllegalStateException("eof")
      val v = b(pos >> 3) & 0xff; pos += 8; v
    }
    /** Spec §7.2 more_rbsp_data(): data remains iff the current position
      * is before the rbsp_stop_one_bit — the LAST set bit of the RBSP. */
    def moreRbspData: Boolean = {
      var i = b.length - 1
      while (i >= 0 && b(i) == 0) i -= 1
      if (i < 0) false
      else {
        val lastSet = i * 8 + (7 - Integer.numberOfTrailingZeros(b(i) & 0xff))
        pos < lastSet
      }
    }
  }

  /** Strip emulation-prevention bytes: 00 00 03 xx → 00 00 xx. */
  private[pipeline] def unescapeRbsp(b: Array[Byte], from: Int,
                                     len: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(len)
    var i = from
    val end = from + len
    var zeros = 0
    while (i < end) {
      val v = b(i) & 0xff
      if (zeros >= 2 && v == 3 && i + 1 < end && (b(i + 1) & 0xff) <= 3) {
        zeros = 0 // emulation prevention byte: drop
      } else {
        out.write(v)
        zeros = if (v == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  private[pipeline] case class Sps(widthMbs: Int, heightMbs: Int,
                                   log2MaxFrameNum: Int, pocType: Int,
                                   log2MaxPocLsb: Int,
                                   cropL: Int, cropR: Int,
                                   cropT: Int, cropB: Int) {
    def width: Int = widthMbs * 16 - 2 * (cropL + cropR)
    def height: Int = heightMbs * 16 - 2 * (cropT + cropB)
  }

  /** Parse a seq_parameter_set_rbsp; None on any out-of-subset feature. */
  private[pipeline] def parseSps(rbsp: Array[Byte]): Option[Sps] = try {
    val r = new BitReader(rbsp)
    val profile = r.u(8)
    r.u(8) // constraint flags + reserved
    r.u(8) // level_idc
    r.ue() // sps_id
    if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
        .contains(profile)) {
      if (r.ue() != 1) return None          // chroma_format_idc: 4:2:0 only
      if (r.ue() != 0) return None          // bit_depth_luma_minus8
      if (r.ue() != 0) return None          // bit_depth_chroma_minus8
      r.u1()                                // qpprime_y_zero_transform_bypass
      if (r.u1() != 0) return None          // scaling matrices: decline
    }
    val log2Fn = r.ue() + 4
    val pocType = r.ue()
    var log2Poc = 0
    if (pocType == 0) log2Poc = r.ue() + 4
    else if (pocType != 2) return None      // POC type 1: out of subset
    r.ue() // max_num_ref_frames
    r.u1() // gaps_in_frame_num_value_allowed
    val wMbs = r.ue() + 1
    val hMap = r.ue() + 1
    if (r.u1() != 1) return None            // frame_mbs_only: frames only
    r.u1() // direct_8x8_inference
    var cl = 0; var cr = 0; var ct = 0; var cb = 0
    if (r.u1() == 1) { cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue() }
    // vui ignored — everything the subset needs is above
    val s = Sps(wMbs, hMap, log2Fn, pocType, log2Poc, cl, cr, ct, cb)
    if (s.width <= 0 || s.height <= 0 || wMbs > 2048 || hMap > 2048) None
    else Some(s)
  } catch { case _: IllegalStateException => None }

  private[pipeline] case class Pps(bottomFieldPoc: Boolean,
                                   deblockingPresent: Boolean,
                                   redundantPresent: Boolean)

  /** Parse a pic_parameter_set_rbsp; CAVLC + single slice group only. */
  private[pipeline] def parsePps(rbsp: Array[Byte]): Option[Pps] = try {
    val r = new BitReader(rbsp)
    r.ue(); r.ue()                          // pps_id, sps_id
    if (r.u1() != 0) return None            // CABAC: out of subset
    val bfPoc = r.u1() == 1
    if (r.ue() != 0) return None            // slice groups: out of subset
    r.ue(); r.ue()                          // num_ref_idx defaults
    r.u1(); r.u(2)                          // weighted pred flags
    r.se(); r.se(); r.se()                  // qp/qs/chroma offsets
    val deblk = r.u1() == 1
    r.u1()                                  // constrained_intra_pred
    val redund = r.u1() == 1
    Some(Pps(bfPoc, deblk, redund))
  } catch { case _: IllegalStateException => None }

  /** Decode one I/IDR slice NAL's I_PCM macroblocks into the planes.
    * Returns false (decline whole frame) on any non-I_PCM content. */
  private def decodeSlice(rbsp: Array[Byte], nalType: Int, nalRefIdc: Int,
                          sps: Sps, pps: Pps, yP: Array[Int],
                          cbP: Array[Int], crP: Array[Int],
                          filled: Array[Boolean]): Boolean = try {
    val r = new BitReader(rbsp)
    val firstMb = r.ue()
    val sliceType = r.ue()
    if (sliceType != 2 && sliceType != 7) return false // I slices only
    r.ue()                                  // pps_id
    r.u(sps.log2MaxFrameNum)                // frame_num
    if (nalType == 5) r.ue()                // idr_pic_id
    if (sps.pocType == 0) {
      r.u(sps.log2MaxPocLsb)                // pic_order_cnt_lsb
      if (pps.bottomFieldPoc) r.se()        // delta_pic_order_cnt_bottom
    }
    if (pps.redundantPresent) r.ue()        // redundant_pic_cnt
    if (nalRefIdc != 0) {
      if (nalType == 5) { r.u1(); r.u1() }  // no_output / long_term
      else if (r.u1() == 1) return false    // adaptive marking: decline
    }
    r.se()                                  // slice_qp_delta
    if (pps.deblockingPresent) {
      val idc = r.ue()
      if (idc != 1) { r.se(); r.se() }
    }
    val nMbs = sps.widthMbs * sps.heightMbs
    var mb = firstMb
    var more = true
    while (more && mb < nMbs) {
      if (r.ue() != 25) return false        // I_PCM only (mb_type 25 in I)
      r.alignToByte()
      val mbX = (mb % sps.widthMbs) * 16
      val mbY = (mb / sps.widthMbs) * 16
      var i = 0
      while (i < 256) {
        val y = mbY + i / 16; val x = mbX + i % 16
        yP(y * sps.widthMbs * 16 + x) = r.u8Aligned(); i += 1
      }
      val cw = sps.widthMbs * 8
      i = 0
      while (i < 64) {                      // Cb plane, 8×8
        val y = mbY / 2 + i / 8; val x = mbX / 2 + i % 8
        cbP(y * cw + x) = r.u8Aligned(); i += 1
      }
      i = 0
      while (i < 64) {                      // Cr plane, 8×8
        val y = mbY / 2 + i / 8; val x = mbX / 2 + i % 8
        crP(y * cw + x) = r.u8Aligned(); i += 1
      }
      filled(mb) = true
      mb += 1
      more = r.moreRbspData
    }
    true
  } catch { case _: IllegalStateException => false }

  /** avcC decoder configuration: (lengthSize, SPS NALs, PPS NALs). */
  private[pipeline] def parseAvcC(
      c: Array[Byte]): Option[(Int, Seq[Array[Byte]], Seq[Array[Byte]])] =
    try {
      if (c.length < 7 || (c(0) & 0xff) != 1) None
      else {
        val lenSize = (c(4) & 3) + 1
        var p = 5
        val nSps = c(p) & 0x1f; p += 1
        val sps = (0 until nSps).map { _ =>
          val l = ((c(p) & 0xff) << 8) | (c(p + 1) & 0xff); p += 2
          val a = java.util.Arrays.copyOfRange(c, p, p + l); p += l; a
        }
        val nPps = c(p) & 0xff; p += 1
        val pps = (0 until nPps).map { _ =>
          val l = ((c(p) & 0xff) << 8) | (c(p + 1) & 0xff); p += 2
          val a = java.util.Arrays.copyOfRange(c, p, p + l); p += l; a
        }
        if (sps.isEmpty || pps.isEmpty) None else Some((lenSize, sps, pps))
      }
    } catch { case _: RuntimeException => None }

  /** Decode one avc1 SAMPLE (length-prefixed NALs) into a frame. None =
    * out of subset; the caller declines to the stub seam. */
  def decodeSample(avcC: Array[Byte], sample: Array[Byte], off: Int,
                   len: Int): Option[BufferedImage] =
    for {
      (lenSize, spsN, ppsN) <- parseAvcC(avcC)
      // multiple parameter sets: the slice header's pps_id would have
      // to select among them; parsing it with the wrong PPS flags risks
      // a MISparse instead of the honest-decline contract — decline
      _ <- if (spsN.length == 1 && ppsN.length == 1) Some(()) else None
      sps <- parseSps(unescapeRbsp(spsN.head, 1, spsN.head.length - 1))
      pps <- parsePps(unescapeRbsp(ppsN.head, 1, ppsN.head.length - 1))
      img <- decodeNals(sps, pps, lenSize, sample, off, len)
    } yield img

  private def decodeNals(sps: Sps, pps: Pps, lenSize: Int,
                         b: Array[Byte], off: Int,
                         len: Int): Option[BufferedImage] = {
    val wL = sps.widthMbs * 16; val hL = sps.heightMbs * 16
    val yP = new Array[Int](wL * hL)
    val cbP = new Array[Int](wL / 2 * (hL / 2))
    val crP = new Array[Int](wL / 2 * (hL / 2))
    val filled = new Array[Boolean](sps.widthMbs * sps.heightMbs)
    var p = off
    val end = off + len
    var sawSlice = false
    while (p + lenSize <= end) {
      var nl = 0L
      var i = 0
      while (i < lenSize) { nl = (nl << 8) | (b(p + i) & 0xff); i += 1 }
      p += lenSize
      if (nl < 1 || p + nl > end) return None
      val hdr = b(p) & 0xff
      if ((hdr & 0x80) != 0) return None    // forbidden_zero_bit
      val refIdc = (hdr >> 5) & 3
      val nalType = hdr & 0x1f
      if (nalType == 1 || nalType == 5) {
        sawSlice = true
        val rbsp = unescapeRbsp(b, p + 1, nl.toInt - 1)
        if (!decodeSlice(rbsp, nalType, refIdc, sps, pps, yP, cbP, crP,
            filled)) return None
      } // SPS/PPS/SEI/AUD NALs inside the sample are legal and skipped
      p += nl.toInt
    }
    if (!sawSlice || !filled.forall(identity)) return None
    // crop + 4:2:0 nearest upsample + full-range BT.601
    val img = new BufferedImage(sps.width, sps.height,
      BufferedImage.TYPE_INT_RGB)
    val x0 = 2 * sps.cropL; val y0 = 2 * sps.cropT
    var y = 0
    while (y < sps.height) {
      var x = 0
      while (x < sps.width) {
        val ly = y0 + y; val lx = x0 + x
        val Y = yP(ly * wL + lx)
        val cb = cbP(ly / 2 * (wL / 2) + lx / 2) - 128
        val cr = crP(ly / 2 * (wL / 2) + lx / 2) - 128
        def clamp(v: Double): Int =
          math.max(0, math.min(255, math.round(v).toInt))
        val rC = clamp(Y + 1.402 * cr)
        val gC = clamp(Y - 0.344136 * cb - 0.714136 * cr)
        val bC = clamp(Y + 1.772 * cb)
        img.setRGB(x, y, (rC << 16) | (gC << 8) | bC)
        x += 1
      }
      y += 1
    }
    Some(img)
  }

  // ------------------------------------------------------------------
  // Encoder side — spec/bench fixture generation only: a conformant
  // baseline stream whose every macroblock is I_PCM.
  // ------------------------------------------------------------------

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0; private var nBits = 0
    def u(v: Int, n: Int): Unit = { var i = n - 1
      while (i >= 0) { u1((v >> i) & 1); i -= 1 } }
    def u1(v: Int): Unit = { cur = (cur << 1) | (v & 1); nBits += 1
      if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 } }
    def ue(v: Int): Unit = { val k = v + 1
      val n = 32 - Integer.numberOfLeadingZeros(k)
      u(0, n - 1); u(k, n) }
    def alignZero(): Unit = while (nBits != 0) u1(0)
    def trailing(): Unit = { u1(1); alignZero() }
    def bytes: Array[Byte] = { require(nBits == 0, "unaligned"); out.toByteArray }
  }

  /** Wrap an RBSP as a NAL: header byte + emulation prevention. */
  private def nal(refIdc: Int, nalType: Int, rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbsp.length + 8)
    out.write((refIdc << 5) | nalType)
    var zeros = 0
    for (v0 <- rbsp) {
      val v = v0 & 0xff
      if (zeros >= 2 && v <= 3) { out.write(3); zeros = 0 }
      out.write(v)
      zeros = if (v == 0) zeros + 1 else 0
    }
    out.toByteArray
  }

  private def spsNal(widthMbs: Int, heightMbs: Int): Array[Byte] = {
    val w = new BitWriter()
    w.u(66, 8); w.u(0, 8); w.u(10, 8)       // baseline, level 1.0
    w.ue(0)                                 // sps_id
    w.ue(0)                                 // log2_max_frame_num_minus4
    w.ue(2)                                 // poc type 2
    w.ue(0); w.u1(0)                        // max_ref 0, no gaps
    w.ue(widthMbs - 1); w.ue(heightMbs - 1)
    w.u1(1); w.u1(0)                        // frame_mbs_only, direct_8x8
    w.u1(0); w.u1(0)                        // no crop, no vui
    w.trailing()
    nal(3, 7, w.bytes)
  }

  private def ppsNal(): Array[Byte] = {
    val w = new BitWriter()
    w.ue(0); w.ue(0)                        // pps_id, sps_id
    w.u1(0); w.u1(0)                        // CAVLC, no bottom-field poc
    w.ue(0)                                 // one slice group
    w.ue(0); w.ue(0)                        // ref idx defaults
    w.u1(0); w.u(0, 2)                      // no weighted pred
    w.ue(0); w.ue(0); w.ue(0)               // qp/qs/chroma deltas (se 0)
    w.u1(0); w.u1(0); w.u1(0)               // deblk ctl, constrained, redund
    w.trailing()
    nal(3, 8, w.bytes)
  }

  /** One IDR slice covering the whole picture, every MB I_PCM. Planes
    * are full-range 4:2:0 (luma wMbs·16 × hMbs·16, chroma half size). */
  private def idrNal(widthMbs: Int, heightMbs: Int, yP: Array[Int],
                     cbP: Array[Int], crP: Array[Int]): Array[Byte] = {
    val w = new BitWriter()
    w.ue(0)                                 // first_mb_in_slice
    w.ue(7)                                 // slice_type I (all slices)
    w.ue(0)                                 // pps_id
    w.u(0, 4)                               // frame_num (log2 = 4)
    w.ue(0)                                 // idr_pic_id
    w.u1(0); w.u1(0)                        // dec_ref_pic_marking
    w.ue(0)                                 // slice_qp_delta (se 0)
    val wL = widthMbs * 16
    val cw = widthMbs * 8
    for (mb <- 0 until widthMbs * heightMbs) {
      w.ue(25)                              // I_PCM
      w.alignZero()
      val mbX = (mb % widthMbs) * 16; val mbY = (mb / widthMbs) * 16
      for (i <- 0 until 256)
        w.u(yP((mbY + i / 16) * wL + mbX + i % 16), 8)
      for (i <- 0 until 64)
        w.u(cbP((mbY / 2 + i / 8) * cw + mbX / 2 + i % 8), 8)
      for (i <- 0 until 64)
        w.u(crP((mbY / 2 + i / 8) * cw + mbX / 2 + i % 8), 8)
    }
    w.trailing()
    nal(3, 5, w.bytes)
  }

  /** Decoder configuration + one length-prefixed sample per frame —
    * the pieces [[Multimodal.syntheticMp4H264]] boxes into an mp4. */
  private[pipeline] def encodeIPcm(
      frames: Seq[(Array[Int], Array[Int], Array[Int])], widthMbs: Int,
      heightMbs: Int): (Array[Byte], Seq[Array[Byte]]) = {
    val sps = spsNal(widthMbs, heightMbs)
    val pps = ppsNal()
    val avcC = Array[Byte](1, 66, 0, 10, (0xFC | 3).toByte,
      (0xE0 | 1).toByte) ++
      Array(((sps.length >> 8) & 0xff).toByte, (sps.length & 0xff).toByte) ++
      sps ++ Array[Byte](1) ++
      Array(((pps.length >> 8) & 0xff).toByte, (pps.length & 0xff).toByte) ++
      pps
    val samples = frames.map { case (y, cb, cr) =>
      val n = idrNal(widthMbs, heightMbs, y, cb, cr)
      Array((n.length >>> 24).toByte, (n.length >>> 16).toByte,
        (n.length >>> 8).toByte, n.length.toByte) ++ n
    }
    (avcC, samples)
  }
}
