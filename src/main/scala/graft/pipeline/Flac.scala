package graft.pipeline

/** FLAC decoder for the full prediction ladder real-world files use —
  * the audio sibling of the [[H264]] I_PCM leg, extended across round 14:
  * VERBATIM/CONSTANT raw subframes, FIXED polynomial prediction (orders
  * 0-4), general LPC prediction (orders 1-32, quantized integer
  * coefficients with arithmetic-shift scaling), Rice/Rice2-partitioned
  * residuals with escape-to-raw, and the three stereo-decorrelation
  * channel assignments (left/side, right/side, mid/side — the side
  * channel carries one extra bit per spec). All arithmetic is
  * integer-exact per the public xiph.org FLAC spec §9, wrapped in the
  * format's real framing (metadata blocks, frame headers with CRC-8,
  * frame CRC-16, UTF-8 coded frame numbers, wasted-bits). Still outside
  * the subset — bit depths other than 16, negative LPC quantization
  * shifts (spec-legal but unseen in practice; libFLAC's encoder never
  * emits them) — declines to None and the caller falls through to the
  * tagged stub, exactly the [[Multimodal.FallbackDecoder]] contract; a
  * CRC mismatch also declines (corrupt audio must not be silently
  * pooled into features). */
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

  /** Rice/Rice2-partitioned residual decode (spec §9.2.7): fills
    * `x(order until blockSize)` with the RESIDUALS (prediction is applied
    * by the caller). Throws IllegalStateException on malformed geometry —
    * the decode() wrapper turns that into a decline. */
  private def readResiduals(r: BitReader, x: Array[Int], blockSize: Int,
                            order: Int): Unit = {
    val method = r.ui(2)
    if (method > 1) throw new IllegalStateException("reserved residual method")
    val pBits = if (method == 0) 4 else 5    // RICE 4-bit / RICE2 5-bit
    val escape = (1 << pBits) - 1
    val po = r.ui(4)
    val partitions = 1 << po
    // RFC 9639 §9.2.7: the FIRST partition holds (blockSize >> po) − order
    // samples, which must be POSITIVE — equality (an empty first
    // partition) is spec-invalid geometry and declines like any other
    // malformed stream (round-14 ADVICE: == was previously accepted)
    if (blockSize % partitions != 0 || (blockSize >> po) <= order)
      throw new IllegalStateException("invalid partition geometry")
    var s = order
    var part = 0
    while (part < partitions) {
      val n = (blockSize >> po) - (if (part == 0) order else 0)
      val param = r.ui(pBits)
      if (param == escape) {
        val raw = r.ui(5)                    // raw bit width, 0 = all zero
        var i = 0
        while (i < n) {
          x(s) = if (raw == 0) 0
            else (r.u(raw) << (64 - raw) >> (64 - raw)).toInt
          s += 1; i += 1
        }
      } else {
        var i = 0
        while (i < n) {
          var q = 0                          // unary quotient: 0s then a 1
          while (r.u1() == 0) q += 1
          val v = (q.toLong << param) | r.u(param)
          x(s) = ((v >>> 1) ^ -(v & 1L)).toInt  // zigzag to signed
          s += 1; i += 1
        }
      }
      part += 1
    }
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
      // 0-7: independent channels; 8/9/10: left-side / right-side /
      // mid-side stereo decorrelation (side channel carries bps+1 bits)
      val stereoMode = chAsgn match {
        case c if c <= 7 => if (c + 1 != channels) return None; 0
        case c if c <= 10 => if (channels != 2) return None; c - 7
        case _ => return None               // reserved assignments
      }
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
        // the SIDE channel of a decorrelated pair is one bit wider
        // (it holds a difference): left/side and mid/side widen ch1,
        // right/side widens ch0 (spec §9.2.2)
        val sideBit =
          if ((stereoMode == 1 || stereoMode == 3) && c == 1) 1
          else if (stereoMode == 2 && c == 0) 1
          else 0
        val effBps = bps - wasted + sideBit
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
          case t if t >= 8 && t <= 12 =>     // FIXED, order 0-4 (spec §9.2.5)
            val order = t - 8
            if (order > blockSize) return None
            val x = chans(c)
            var s = 0
            while (s < order) {              // warm-up: plain signed samples
              x(s) = (r.u(effBps) << (64 - effBps) >> (64 - effBps)).toInt
              s += 1
            }
            readResiduals(r, x, blockSize, order)
            // polynomial reconstruction, exact integer (spec §9.2.5's
            // fixed predictors; residual already sits in x(s))
            s = order
            while (s < blockSize) {
              x(s) += (order match {
                case 0 => 0
                case 1 => x(s - 1)
                case 2 => 2 * x(s - 1) - x(s - 2)
                case 3 => 3 * x(s - 1) - 3 * x(s - 2) + x(s - 3)
                case _ => 4 * x(s - 1) - 6 * x(s - 2) + 4 * x(s - 3) - x(s - 4)
              })
              s += 1
            }
            if (wasted > 0) { s = 0
              while (s < blockSize) { x(s) = x(s) << wasted; s += 1 } }
          case t if t >= 32 =>               // LPC, order 1-32 (spec §9.2.6)
            val order = t - 31
            if (order > blockSize) return None
            val x = chans(c)
            var s = 0
            while (s < order) {              // warm-up: plain signed samples
              x(s) = (r.u(effBps) << (64 - effBps) >> (64 - effBps)).toInt
              s += 1
            }
            val prec = r.ui(4) + 1
            if (prec == 16) return None      // 0b1111 is invalid per spec
            val shift = (r.u(5) << 59 >> 59).toInt // signed 5-bit
            if (shift < 0) return None       // spec-legal, never emitted
            val coefs = new Array[Long](order)
            var j = 0
            while (j < order) {
              coefs(j) = r.u(prec) << (64 - prec) >> (64 - prec)
              j += 1
            }
            readResiduals(r, x, blockSize, order)
            // x[i] += (Σ c_j · x[i-1-j]) >> shift — 64-bit accumulation,
            // arithmetic shift: exact integer per the spec's fixed-point
            // contract (coefs ≤ 15 bits, samples ≤ 17 bits, order ≤ 32 →
            // the sum is < 2⁵⁷, no wrap)
            s = order
            while (s < blockSize) {
              var acc = 0L
              j = 0
              while (j < order) { acc += coefs(j) * x(s - 1 - j); j += 1 }
              x(s) += (acc >> shift).toInt
              s += 1
            }
            if (wasted > 0) { s = 0
              while (s < blockSize) { x(s) = x(s) << wasted; s += 1 } }
          case _ => return None              // reserved: out of subset
        }
        c += 1
      }
      // undo stereo decorrelation (integer-exact inverses, spec §9.2.2)
      stereoMode match {
        case 1 =>                            // left/side: right = left − side
          var s = 0
          while (s < blockSize) {
            chans(1)(s) = chans(0)(s) - chans(1)(s); s += 1 }
        case 2 =>                            // right/side: left = side + right
          var s = 0
          while (s < blockSize) {
            chans(0)(s) = chans(0)(s) + chans(1)(s); s += 1 }
        case 3 =>                            // mid/side
          var s = 0
          while (s < blockSize) {
            val side = chans(1)(s)
            val mid2 = (chans(0)(s) << 1) | (side & 1)
            chans(0)(s) = (mid2 + side) >> 1
            chans(1)(s) = (mid2 - side) >> 1
            s += 1
          }
        case _ => ()
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

  /** Encode 16-bit per-channel samples with FIXED-order prediction and
    * Rice-coded residuals — the fixture twin of the round-14 decoder
    * tier. Each frame carries one FIXED subframe per channel (order
    * 0-4), residuals in `1 << partitionOrder` Rice partitions with a
    * per-partition cost-optimal parameter, escaping to raw n-bit storage
    * when that is cheaper (both spec §9.2.7 modes exercised). Frames too
    * short for the order or the partition geometry fall back to VERBATIM
    * subframes — a legal mix, and the decoder must take both paths. */
  private[pipeline] def encodeFixed(rate: Int, chans: Array[Array[Int]],
                                    order: Int, blockSize: Int = 1024,
                                    partitionOrder: Int = 0): Array[Byte] = {
    require(chans.nonEmpty && chans.forall(_.length == chans(0).length))
    require(rate > 0 && rate < (1 << 20) && blockSize >= 16)
    require(order >= 0 && order <= 4, s"fixed order 0-4: $order")
    require(partitionOrder >= 0 && partitionOrder <= 4)
    val nCh = chans.length
    val total = chans(0).length
    val si = new BitWriter()
    si.u(blockSize.toLong, 16); si.u(blockSize.toLong, 16)
    si.u(0, 24); si.u(0, 24)
    si.u(rate.toLong, 20); si.u(nCh - 1L, 3); si.u(15L, 5)
    si.u(total.toLong, 36)
    si.u(0, 128)
    val head = "fLaC".getBytes("US-ASCII") ++
      Array[Byte](0x80.toByte, 0, 0, 34) ++ si.bytes
    val out = new java.io.ByteArrayOutputStream()
    out.write(head, 0, head.length)

    def predict(x: Array[Int], i: Int): Int = order match {
      case 0 => 0
      case 1 => x(i - 1)
      case 2 => 2 * x(i - 1) - x(i - 2)
      case 3 => 3 * x(i - 1) - 3 * x(i - 2) + x(i - 3)
      case _ => 4 * x(i - 1) - 6 * x(i - 2) + 4 * x(i - 3) - x(i - 4)
    }
    def zigzag(v: Int): Long = ((v << 1) ^ (v >> 31)).toLong & 0xffffffffL
    def rawBitsFor(res: Array[Long]): Int = {
      // smallest signed width holding every zigzag-decoded residual
      var w = 0
      for (z <- res) {
        val v = ((z >>> 1) ^ -(z & 1L)).toInt
        val need = 33 - Integer.numberOfLeadingZeros(
          if (v < 0) ~v else v) // sign bit + magnitude
        if (need > w) w = need
      }
      math.max(w, 1)
    }
    var frame = 0
    var off = 0
    while (off < total) {
      val bs = math.min(blockSize, total - off)
      val w = new BitWriter()
      w.u(0x3ffe, 14); w.u1(0); w.u1(0)
      w.u(7, 4); w.u(0, 4)
      w.u(nCh - 1L, 4)
      w.u(4, 3); w.u1(0)
      require(frame < 128, "fixture frames fit one UTF-8 byte")
      w.u(frame.toLong, 8)
      w.u(bs - 1L, 16)
      val hdr = w.bytes
      val wc = new BitWriter()
      for (b <- hdr) wc.u(b & 0xffL, 8)
      wc.u(crc8(hdr, 0, hdr.length).toLong, 8)
      // partition geometry must hold on THIS frame (the last may be short)
      val po = if (bs % (1 << partitionOrder) == 0 &&
        (bs >> partitionOrder) > order) partitionOrder else 0
      for (c <- 0 until nCh) {
        val x = java.util.Arrays.copyOfRange(chans(c), off, off + bs)
        if (bs <= order || (bs >> po) <= order) { // VERBATIM fallback
          wc.u1(0); wc.u(1, 6); wc.u1(0)
          for (s <- 0 until bs) wc.u(x(s).toLong & 0xffff, 16)
        } else {
          wc.u1(0); wc.u(8L + order, 6); wc.u1(0) // FIXED subframe header
          for (s <- 0 until order) wc.u(x(s).toLong & 0xffff, 16)
          wc.u(0, 2)                              // method 0: 4-bit RICE
          wc.u(po.toLong, 4)
          var s = order
          for (part <- 0 until (1 << po)) {
            val n = (bs >> po) - (if (part == 0) order else 0)
            val res = Array.tabulate(n)(i => zigzag(x(s + i) - predict(x, s + i)))
            // cost-optimal Rice parameter vs the raw escape
            var bestP = 0; var bestCost = Long.MaxValue
            for (p <- 0 to 14) {
              val cost = res.map(_ >>> p).sum + n.toLong * (p + 1)
              if (cost < bestCost) { bestCost = cost; bestP = p }
            }
            val raw = rawBitsFor(res)
            if (5L + n.toLong * raw < bestCost) {  // escape: raw n-bit
              wc.u(15, 4); wc.u(raw.toLong, 5)
              for (z <- res) {
                val v = ((z >>> 1) ^ -(z & 1L)).toInt
                wc.u(v.toLong & ((1L << raw) - 1), raw)
              }
            } else {
              wc.u(bestP.toLong, 4)
              for (z <- res) {
                val q = (z >>> bestP).toInt
                for (_ <- 0 until q) wc.u1(0)
                wc.u1(1)
                if (bestP > 0) wc.u(z & ((1L << bestP) - 1), bestP)
              }
            }
            s += n
          }
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

  /** Encode 16-bit per-channel samples with GENERAL LPC prediction —
    * caller-chosen integer coefficients (newest-first: prediction is
    * `(Σ coefs(j)·x(i-1-j)) >> shift`) and Rice-coded residuals in one
    * partition. Frames too short for the order fall back to VERBATIM. */
  private[pipeline] def encodeLpc(rate: Int, chans: Array[Array[Int]],
                                  coefs: Array[Int], shift: Int,
                                  blockSize: Int = 1024): Array[Byte] = {
    require(chans.nonEmpty && chans.forall(_.length == chans(0).length))
    require(rate > 0 && rate < (1 << 20) && blockSize >= 16)
    val order = coefs.length
    require(order >= 1 && order <= 32, s"LPC order 1-32: $order")
    require(shift >= 0 && shift <= 15, s"shift 0-15: $shift")
    val prec = math.max(2, coefs.map(v =>
      33 - Integer.numberOfLeadingZeros(if (v < 0) ~v else v)).max)
    require(prec <= 15, s"coefficients need <= 15 bits, got $prec")
    val nCh = chans.length
    val total = chans(0).length
    val si = new BitWriter()
    si.u(blockSize.toLong, 16); si.u(blockSize.toLong, 16)
    si.u(0, 24); si.u(0, 24)
    si.u(rate.toLong, 20); si.u(nCh - 1L, 3); si.u(15L, 5)
    si.u(total.toLong, 36); si.u(0, 128)
    val head = "fLaC".getBytes("US-ASCII") ++
      Array[Byte](0x80.toByte, 0, 0, 34) ++ si.bytes
    val out = new java.io.ByteArrayOutputStream()
    out.write(head, 0, head.length)
    def predict(x: Array[Int], i: Int): Int = {
      var acc = 0L; var j = 0
      while (j < order) { acc += coefs(j).toLong * x(i - 1 - j); j += 1 }
      (acc >> shift).toInt
    }
    var frame = 0; var off = 0
    while (off < total) {
      val bs = math.min(blockSize, total - off)
      val w = new BitWriter()
      w.u(0x3ffe, 14); w.u1(0); w.u1(0)
      w.u(7, 4); w.u(0, 4); w.u(nCh - 1L, 4); w.u(4, 3); w.u1(0)
      require(frame < 128); w.u(frame.toLong, 8); w.u(bs - 1L, 16)
      val hdr = w.bytes
      val wc = new BitWriter()
      for (b <- hdr) wc.u(b & 0xffL, 8)
      wc.u(crc8(hdr, 0, hdr.length).toLong, 8)
      for (c <- 0 until nCh) {
        val x = java.util.Arrays.copyOfRange(chans(c), off, off + bs)
        if (bs <= order) {                   // VERBATIM fallback
          wc.u1(0); wc.u(1, 6); wc.u1(0)
          for (s <- 0 until bs) wc.u(x(s).toLong & 0xffff, 16)
        } else {
          wc.u1(0); wc.u(31L + order, 6); wc.u1(0) // LPC subframe header
          for (s <- 0 until order) wc.u(x(s).toLong & 0xffff, 16)
          wc.u(prec - 1L, 4)
          wc.u(shift.toLong & 0x1f, 5)
          for (cf <- coefs) wc.u(cf.toLong & ((1L << prec) - 1), prec)
          wc.u(0, 2); wc.u(0, 4)             // RICE, one partition
          val res = Array.tabulate(bs - order)(i => {
            val v = x(order + i) - predict(x, order + i)
            ((v << 1) ^ (v >> 31)).toLong & 0xffffffffL
          })
          var bestP = 0; var bestCost = Long.MaxValue
          for (p <- 0 to 14) {
            val cost = res.map(_ >>> p).sum + res.length.toLong * (p + 1)
            if (cost < bestCost) { bestCost = cost; bestP = p }
          }
          wc.u(bestP.toLong, 4)
          for (z <- res) {
            val q = (z >>> bestP).toInt
            for (_ <- 0 until q) wc.u1(0)
            wc.u1(1)
            if (bestP > 0) wc.u(z & ((1L << bestP) - 1), bestP)
          }
        }
      }
      wc.align()
      val body = wc.bytes
      out.write(body, 0, body.length)
      val c16 = crc16(body, 0, body.length)
      out.write(c16 >> 8); out.write(c16 & 0xff)
      frame += 1; off += bs
    }
    out.toByteArray
  }

  /** Encode a STEREO pair with decorrelation — mode 1 = left/side,
    * 2 = right/side, 3 = mid/side — as verbatim subframes (the side
    * channel at 17 bits per spec §9.2.2), so the decoder's inverse
    * reconstruction is pinned independently of any predictor. */
  private[pipeline] def encodeStereo(rate: Int, left: Array[Int],
                                     right: Array[Int], mode: Int,
                                     blockSize: Int = 1024): Array[Byte] = {
    require(left.length == right.length && mode >= 1 && mode <= 3)
    require(rate > 0 && rate < (1 << 20) && blockSize >= 16)
    val total = left.length
    val si = new BitWriter()
    si.u(blockSize.toLong, 16); si.u(blockSize.toLong, 16)
    si.u(0, 24); si.u(0, 24)
    si.u(rate.toLong, 20); si.u(1L, 3); si.u(15L, 5) // 2 channels, 16-bit
    si.u(total.toLong, 36); si.u(0, 128)
    val head = "fLaC".getBytes("US-ASCII") ++
      Array[Byte](0x80.toByte, 0, 0, 34) ++ si.bytes
    val out = new java.io.ByteArrayOutputStream()
    out.write(head, 0, head.length)
    var frame = 0; var off = 0
    while (off < total) {
      val bs = math.min(blockSize, total - off)
      val w = new BitWriter()
      w.u(0x3ffe, 14); w.u1(0); w.u1(0)
      w.u(7, 4); w.u(0, 4)
      w.u(7L + mode, 4)                      // chAsgn 8/9/10
      w.u(4, 3); w.u1(0)
      require(frame < 128); w.u(frame.toLong, 8); w.u(bs - 1L, 16)
      val hdr = w.bytes
      val wc = new BitWriter()
      for (b <- hdr) wc.u(b & 0xffL, 8)
      wc.u(crc8(hdr, 0, hdr.length).toLong, 8)
      for (c <- 0 until 2) {
        val wide = (mode != 2 && c == 1) || (mode == 2 && c == 0)
        val bits = if (wide) 17 else 16
        wc.u1(0); wc.u(1, 6); wc.u1(0)       // VERBATIM
        for (s <- off until off + bs) {
          val l = left(s); val r0 = right(s)
          val v = (mode, c) match {
            case (1, 0) => l                  // left
            case (1, 1) => l - r0             // side
            case (2, 0) => l - r0             // side
            case (2, 1) => r0                 // right
            case (3, 0) => (l + r0) >> 1      // mid
            case _ => l - r0                  // side
          }
          wc.u(v.toLong & ((1L << bits) - 1), bits)
        }
      }
      wc.align()
      val body = wc.bytes
      out.write(body, 0, body.length)
      val c16 = crc16(body, 0, body.length)
      out.write(c16 >> 8); out.write(c16 & 0xff)
      frame += 1; off += bs
    }
    out.toByteArray
  }
}
