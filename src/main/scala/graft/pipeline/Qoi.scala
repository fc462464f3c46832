package graft.pipeline

import java.awt.image.BufferedImage

/** QOI ("Quite OK Image") decoder — the image member of the real-codec
  * fallback family ([[Flac]] audio, [[H264]] video): a real, current
  * interchange format whose one-page public specification
  * (qoiformat.org) is fully ALGORITHMIC — byte-aligned ops, a 64-slot
  * running index keyed by a fixed pixel hash, wrapping-byte diffs, no
  * entropy tables — so the whole format decodes exactly, nothing is
  * "subset" about it. Both 3- and 4-channel streams decode (the feature
  * space is RGB; alpha participates in the index hash as the spec
  * requires but is dropped at the pixel sink). A wrong magic, a
  * non-positive or absurd dimension, a truncated stream, or a missing
  * end marker declines to None — the [[Multimodal.FallbackDecoder]]
  * contract. */
object Qoi {

  private def hash(r: Int, g: Int, b: Int, a: Int): Int =
    (r * 3 + g * 5 + b * 7 + a * 11) % 64

  /** Decode a QOI stream; None = not QOI / malformed. */
  def decode(bytes: Array[Byte]): Option[BufferedImage] =
    try decodeOrNull(bytes)
    catch { case _: ArrayIndexOutOfBoundsException |
                 _: NegativeArraySizeException => None }

  private def decodeOrNull(bytes: Array[Byte]): Option[BufferedImage] = {
    if (bytes.length < 14 + 8) return None
    if (bytes(0) != 'q' || bytes(1) != 'o' || bytes(2) != 'i' ||
        bytes(3) != 'f') return None
    def u32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    val w = u32(4); val h = u32(8)
    val channels = bytes(12) & 0xff
    val colorspace = bytes(13) & 0xff
    if (w <= 0 || h <= 0 || w > (1 << 15) || h > (1 << 15)) return None
    if ((channels != 3 && channels != 4) || colorspace > 1) return None
    // hostile-header allocation bound (round-14 ADVICE): a 22-byte stream
    // claiming 32768×32768 would force a ~4 GiB BufferedImage before any
    // content validation. Require the stream to be at least the minimum
    // encodable size for the claimed pixel count (QOI_OP_RUN covers ≤ 62
    // px/byte; header 14 + end marker 8) — allocation is then bounded at
    // ~248 bytes per input byte, proportional, with NO hard pixel cap:
    // spec-valid large images (> 2^24 px) stay decodable (round-15
    // ADVICE — the earlier cap silently declined them).
    if (bytes.length < 14 + (w * h + 61) / 62 + 8) return None
    val n = (w * h).toInt
    val img = new BufferedImage(w.toInt, h.toInt, BufferedImage.TYPE_INT_RGB)
    // running state per the spec: previous pixel starts (0,0,0,255),
    // the 64-slot index starts all-zero (r=g=b=a=0)
    var pr = 0; var pg = 0; var pb = 0; var pa = 255
    val ix = new Array[Int](64 * 4)
    var p = 14
    var i = 0
    var run = 0
    while (i < n) {
      if (run > 0) run -= 1
      else {
        val op = bytes(p) & 0xff; p += 1
        if (op == 0xfe) {                     // QOI_OP_RGB
          pr = bytes(p) & 0xff; pg = bytes(p + 1) & 0xff
          pb = bytes(p + 2) & 0xff; p += 3
        } else if (op == 0xff) {              // QOI_OP_RGBA
          pr = bytes(p) & 0xff; pg = bytes(p + 1) & 0xff
          pb = bytes(p + 2) & 0xff; pa = bytes(p + 3) & 0xff; p += 4
        } else (op >> 6) match {
          case 0 =>                           // QOI_OP_INDEX
            val k = (op & 0x3f) * 4
            pr = ix(k); pg = ix(k + 1); pb = ix(k + 2); pa = ix(k + 3)
          case 1 =>                           // QOI_OP_DIFF (bias 2, wraps)
            pr = (pr + ((op >> 4) & 3) - 2) & 0xff
            pg = (pg + ((op >> 2) & 3) - 2) & 0xff
            pb = (pb + (op & 3) - 2) & 0xff
          case 2 =>                           // QOI_OP_LUMA (dg bias 32)
            val dg = (op & 0x3f) - 32
            val b2 = bytes(p) & 0xff; p += 1
            pr = (pr + dg + ((b2 >> 4) & 0xf) - 8) & 0xff
            pg = (pg + dg) & 0xff
            pb = (pb + dg + (b2 & 0xf) - 8) & 0xff
          case _ =>                           // QOI_OP_RUN (bias -1)
            run = op & 0x3f                   // this pixel + `run` more
        }
        val k = hash(pr, pg, pb, pa) * 4
        ix(k) = pr; ix(k + 1) = pg; ix(k + 2) = pb; ix(k + 3) = pa
      }
      img.setRGB((i % w).toInt, (i / w).toInt, (pr << 16) | (pg << 8) | pb)
      i += 1
    }
    // end marker: seven 0x00 bytes then 0x01, and nothing after it
    if (p + 8 != bytes.length) return None
    var j = 0
    while (j < 7) { if (bytes(p + j) != 0) return None; j += 1 }
    if (bytes(p + 7) != 1) return None
    Some(img)
  }

  /** The registered-decoder seam entry: QOI images tag `fallback`,
    * everything else falls through. */
  val qoiDecoder: Multimodal.FallbackDecoder = (kind, bytes, dim) =>
    if (kind == "image") decode(bytes).map(Multimodal.imageFeatures(_, dim))
    else None

  // ------------------------------------------------------------------
  // Encoder — fixture generation, exercising every op family.
  // ------------------------------------------------------------------

  /** Encode an RGB image as QOI (channels = 3, colorspace 0) with the
    * reference encoding strategy: RUN for repeats, INDEX on hash hits,
    * DIFF/LUMA for small deltas, RGB otherwise. */
  private[pipeline] def encode(img: BufferedImage): Array[Byte] = {
    val w = img.getWidth; val h = img.getHeight
    val out = new java.io.ByteArrayOutputStream()
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    def u32(v: Int): Unit = { out.write(v >>> 24); out.write((v >> 16) & 0xff)
      out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    u32(w); u32(h); out.write(3); out.write(0)
    var pr = 0; var pg = 0; var pb = 0; val pa = 255
    val ix = new Array[Int](64 * 3)
    val ixSet = new Array[Boolean](64)
    var run = 0
    var i = 0
    val n = w * h
    while (i < n) {
      val rgb = img.getRGB(i % w, i / w)
      val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
      if (r == pr && g == pg && b == pb) {
        run += 1
        if (run == 62) { out.write(0xc0 | (run - 1)); run = 0 }
      } else {
        if (run > 0) { out.write(0xc0 | (run - 1)); run = 0 }
        val k = hash(r, g, b, pa)
        if (ixSet(k) && ix(k * 3) == r && ix(k * 3 + 1) == g &&
            ix(k * 3 + 2) == b) {
          out.write(k)                        // INDEX
        } else {
          ix(k * 3) = r; ix(k * 3 + 1) = g; ix(k * 3 + 2) = b; ixSet(k) = true
          // wrapping signed-byte deltas (the reference encoder's
          // `signed char` subtraction): decoder adds mod 256
          val dr = ((r - pr + 128) & 0xff) - 128
          val dg = ((g - pg + 128) & 0xff) - 128
          val db = ((b - pb + 128) & 0xff) - 128
          if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 &&
              db >= -2 && db <= 1)
            out.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
          else if (dg >= -32 && dg <= 31 && dr - dg >= -8 && dr - dg <= 7 &&
              db - dg >= -8 && db - dg <= 7) {
            out.write(0x80 | (dg + 32))
            out.write(((dr - dg + 8) << 4) | (db - dg + 8))
          } else {
            out.write(0xfe); out.write(r); out.write(g); out.write(b)
          }
        }
        pr = r; pg = g; pb = b
      }
      i += 1
    }
    if (run > 0) out.write(0xc0 | (run - 1))
    for (_ <- 0 until 7) out.write(0)
    out.write(1)
    out.toByteArray
  }
}
