package graft.pipeline

/** Minimal FLAC decoder for the VERBATIM/CONSTANT-subframe subset — the
  * audio sibling of the [[H264]] I_PCM leg: the two subframe types that
  * carry raw samples (no prediction, no Rice residuals), so decode is
  * exact by definition, wrapped in the format's real framing (metadata
  * blocks, frame headers with CRC-8, frame CRC-16, UTF-8 coded frame
  * numbers, wasted-bits). Everything outside the subset — FIXED/LPC
  * subframes, stereo decorrelation (left/right/mid-side), bit depths
  * other than 16 — declines to None and the caller falls through to the
  * tagged stub, exactly the [[Multimodal.FallbackDecoder]] contract; a
  * CRC mismatch also declines (corrupt audio must not be silently
  * pooled into features). Format per the public xiph.org FLAC spec. */
object Flac {

  private final class BitReader(b: Array[Byte]) {
    var pos = 0 // bit position
    def bitsLeft: Int = b.length * 8 - pos
    def u1(): Int = {
      if (pos >= b.length * 8) throw new IllegalStateException("eof")
      val v = (b(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1; v
    }
    def u(n: Int): Long = { var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | u1(); i += 1 }; v }
    def ui(n: Int): Int = u(n).toInt
    def alignToByte(): Unit = pos = (pos + 7) & ~7
    def bytePos: Int = { require((pos & 7) == 0); pos >> 3 }
  }

  /** CRC-8, polynomial x⁸+x²+x+1 (0x07), init 0 — frame header CRC. */
  private[pipeline] def crc8(b: Array[Byte], from: Int, len: Int): Int = {
    var crc = 0
    var i = from
    while (i < from + len) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) { crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
        else (crc << 1) & 0xff; k += 1 }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial 0x8005, init 0 — whole-frame CRC. */
  private[pipeline] def crc16(b: Array[Byte], from: Int, len: Int): Int = {
    var crc = 0
    var i = from
    while (i < from + len) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) { crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
        else (crc << 1) & 0xffff; k += 1 }
      i += 1
    }
    crc
  }

  /** Decode a FLAC stream to (sampleRate, mono-mixed 16-bit samples) —
    * the [[Multimodal.decodeAudio]] shape. None = outside the subset. */
  private[pipeline] def decode(bytes: Array[Byte]): Option[(Int, Array[Int])] =
    try decodeOrThrow(bytes)
    catch { case _: IllegalStateException | _: IllegalArgumentException |
                 _: ArrayIndexOutOfBoundsException => None }

  private def decodeOrThrow(bytes: Array[Byte]): Option[(Int, Array[Int])] = {
    if (bytes.length < 42 || new String(bytes, 0, 4, "US-ASCII") != "fLaC")
      return None
    // metadata blocks: [last:1][type:7][len:24]; STREAMINFO is mandatory
    // first (spec §format); we need rate/channels/bps from it
    var p = 4
    var last = false
    var rate = 0; var channels = 0; var bps = 0
    var first = true
    while (!last) {
      if (p + 4 > bytes.length) return None
      last = (bytes(p) & 0x80) != 0
      val tp = bytes(p) & 0x7f
      val len = ((bytes(p + 1) & 0xff) << 16) | ((bytes(p + 2) & 0xff) << 8) |
        (bytes(p + 3) & 0xff)
      if (first) {
        if (tp != 0 || len != 34) return None
        val r = new BitReader(java.util.Arrays.copyOfRange(bytes, p + 4,
          p + 4 + 34))
        r.u(16); r.u(16); r.u(24); r.u(24)  // block/frame size bounds
        rate = r.ui(20)
        channels = r.ui(3) + 1
        bps = r.ui(5) + 1
        first = false
      }
      p += 4 + len
    }
    if (rate <= 0 || channels < 1 || channels > 8) return None
    if (bps != 16) return None              // subset: 16-bit only
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    // frames until EOF
    while (p < bytes.length) {
      val frameStart = p
      val r = new BitReader(bytes)
      r.pos = p * 8
      if (r.u(14) != 0x3ffe) return None    // sync
      r.u1()                                // reserved
      r.u1()                                // blocking strategy
      val bsCode = r.ui(4)
      val srCode = r.ui(4)
      val chAsgn = r.ui(4)
      val ssCode = r.ui(3)
      r.u1()                                // reserved
      if (chAsgn > 7) return None           // stereo decorrelation: decline
      if (chAsgn + 1 != channels) return None
      // sample size: must agree with STREAMINFO's 16-bit (code 100)
      if (ssCode != 0 && ssCode != 4) return None
      // UTF-8 coded frame/sample number: skip by its leading-ones width
      val lead = r.ui(8)
      var extra = Integer.numberOfLeadingZeros(~(lead << 24)) // ones count
      if (extra == 1 || extra > 7) return None
      if (extra > 0) extra -= 1
      var i = 0
      while (i < extra) { if ((r.ui(8) & 0xc0) != 0x80) return None; i += 1 }
      val blockSize = bsCode match {
        case 0 => return None
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.ui(8) + 1
        case 7 => r.ui(16) + 1
        case c => 256 << (c - 8)
      }
      srCode match {                        // rate consistency only
        case 0 => ()
        case 12 => r.u(8)
        case 13 | 14 => r.u(16)
        case 15 => return None
        case _ => ()
      }
      // header CRC-8 covers sync..here
      val hdrLen = r.bytePos - frameStart
      if (r.ui(8) != crc8(bytes, frameStart, hdrLen)) return None
      // subframes, one per channel
      val chans = Array.ofDim[Int](channels, blockSize)
      var c = 0
      while (c < channels) {
        if (r.u1() != 0) return None        // mandatory zero pad bit
        val tpe = r.ui(6)
        var wasted = 0
        if (r.u1() == 1) { wasted = 1
          while (r.u1() == 0) wasted += 1 }
        val effBps = bps - wasted
        tpe match {
          case 0 =>                          // CONSTANT
            val v = (r.u(effBps) << (64 - effBps) >> (64 - effBps)).toInt
            java.util.Arrays.fill(chans(c), v << wasted)
          case 1 =>                          // VERBATIM
            var s = 0
            while (s < blockSize) {
              chans(c)(s) =
                (r.u(effBps) << (64 - effBps) >> (64 - effBps)).toInt << wasted
              s += 1
            }
          case _ => return None              // FIXED/LPC: out of subset
        }
        c += 1
      }
      r.alignToByte()
      val bodyLen = r.bytePos - frameStart
      if (r.ui(16) != crc16(bytes, frameStart, bodyLen)) return None
      p = r.bytePos
      // mix to mono exactly as decodeAudio does (sum / channels)
      var s = 0
      while (s < blockSize) {
        var sum = 0; var cc = 0
        while (cc < channels) { sum += chans(cc)(s); cc += 1 }
        out += sum / channels
        s += 1
      }
    }
    if (out.isEmpty) None else Some((rate, out.toArray))
  }

  /** The registered-decoder seam entry ([[Multimodal.FallbackDecoder]]):
    * `extractFeatures(media, fallback = Flac.flacDecoder)` — decodable
    * subset streams tag `fallback`, everything else stays stub. */
  val flacDecoder: Multimodal.FallbackDecoder = (kind, bytes, dim) =>
    if (kind == "audio") decode(bytes).map(t =>
      Multimodal.audioFeatures(t._2, dim))
    else None

  // ------------------------------------------------------------------
  // Encoder — fixture generation: verbatim frames, correct CRCs.
  // ------------------------------------------------------------------

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0; private var n = 0
    def u(v: Long, bits: Int): Unit = { var i = bits - 1
      while (i >= 0) { u1(((v >> i) & 1).toInt); i -= 1 } }
    def u1(v: Int): Unit = { cur = (cur << 1) | (v & 1); n += 1
      if (n == 8) { out.write(cur); cur = 0; n = 0 } }
    def align(): Unit = while (n != 0) u1(0)
    def bytes: Array[Byte] = { require(n == 0); out.toByteArray }
  }

  /** Encode 16-bit per-channel samples as a conformant verbatim-subframe
    * FLAC stream (one frame per `blockSize` samples, fixed-blocksize
    * strategy, frame-number addressing). */
  private[pipeline] def encodeVerbatim(rate: Int, chans: Array[Array[Int]],
                                       blockSize: Int = 1024): Array[Byte] = {
    require(chans.nonEmpty && chans.forall(_.length == chans(0).length))
    require(rate > 0 && rate < (1 << 20) && blockSize >= 16)
    val nCh = chans.length
    val total = chans(0).length
    val si = new BitWriter()
    si.u(blockSize.toLong, 16); si.u(blockSize.toLong, 16) // min/max block
    si.u(0, 24); si.u(0, 24)                 // frame size bounds unknown
    si.u(rate.toLong, 20); si.u(nCh - 1L, 3); si.u(15L, 5) // 16-bit
    si.u(total.toLong, 36)
    si.u(0, 128)                             // md5 unknown (all zero)
    val head = "fLaC".getBytes("US-ASCII") ++
      Array[Byte](0x80.toByte, 0, 0, 34) ++ si.bytes
    val out = new java.io.ByteArrayOutputStream()
    out.write(head, 0, head.length)
    var frame = 0
    var off = 0
    while (off < total) {
      val bs = math.min(blockSize, total - off)
      val w = new BitWriter()
      w.u(0x3ffe, 14); w.u1(0); w.u1(0)      // sync, reserved, fixed-bs
      w.u(7, 4)                              // block size: 16-bit field
      w.u(0, 4)                              // rate: from STREAMINFO
      w.u(nCh - 1L, 4)                       // independent channels
      w.u(4, 3); w.u1(0)                     // 16-bit, reserved
      // UTF-8 frame number (frames < 128 in every fixture)
      require(frame < 128, "fixture frames fit one UTF-8 byte")
      w.u(frame.toLong, 8)
      w.u(bs - 1L, 16)
      val hdr = w.bytes
      val wc = new BitWriter()
      for (b <- hdr) wc.u(b & 0xffL, 8)
      wc.u(crc8(hdr, 0, hdr.length).toLong, 8)
      for (c <- 0 until nCh) {
        val const = (off + 1 until off + bs).forall(s =>
          chans(c)(s) == chans(c)(off))
        if (const) {                         // pad, CONSTANT, no wasted bits
          wc.u1(0); wc.u(0, 6); wc.u1(0)
          wc.u(chans(c)(off).toLong & 0xffff, 16)
        } else {                             // pad, VERBATIM, no wasted bits
          wc.u1(0); wc.u(1, 6); wc.u1(0)
          for (s <- off until off + bs) wc.u(chans(c)(s).toLong & 0xffff, 16)
        }
      }
      wc.align()
      val body = wc.bytes
      out.write(body, 0, body.length)
      val c16 = crc16(body, 0, body.length)
      out.write(c16 >> 8); out.write(c16 & 0xff)
      frame += 1
      off += bs
    }
    out.toByteArray
  }
}
