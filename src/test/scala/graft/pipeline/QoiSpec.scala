package graft.pipeline

import graft.SparkSpec
import java.awt.image.BufferedImage

/** The QOI image decoder: pixel-exact roundtrips across every op family,
  * a hand-built stream pinned against the public spec's op semantics
  * (independent of the fixture encoder), honest declines, and seam
  * provenance with features equal to the PNG twin. */
class QoiSpec extends SparkSpec {

  private def img(w: Int, h: Int)(f: (Int, Int) => (Int, Int, Int)): BufferedImage = {
    val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = f(x, y)
      im.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
    }
    im
  }

  private def pixels(im: BufferedImage): Seq[Int] =
    for (y <- 0 until im.getHeight; x <- 0 until im.getWidth)
      yield im.getRGB(x, y) & 0xffffff

  test("roundtrip pixel-exact: runs, palette repeats, small diffs, raw RGB") {
    val rng = new scala.util.Random(17)
    val cases = Seq(
      img(64, 48)((x, y) => (x * 4, y * 5, (x * y) % 256)),     // LUMA/DIFF
      img(32, 32)((_, _) => (7, 99, 200)),                      // one long RUN
      img(33, 7)((x, _) => (Seq(10, 200, 10, 60)(x % 4), 0, 0)), // INDEX hits
      img(16, 16)((_, _) => (rng.nextInt(256), rng.nextInt(256),
        rng.nextInt(256))),                                     // raw RGB ops
      img(1, 1)((_, _) => (255, 0, 128)),
      img(63, 1)((x, _) => (x, 255 - x, (x * 37) % 256)))
    for ((im, i) <- cases.zipWithIndex) {
      val dec = Qoi.decode(Qoi.encode(im))
      assert(dec.nonEmpty, s"case $i must decode")
      assert(pixels(dec.get) === pixels(im), s"case $i")
    }
  }

  test("hand-built stream decodes per the spec's op semantics") {
    // 2x2: RGB(10,20,30) ; DIFF(+1,+1,+1) ; LUMA(dg=5, dr-dg=1, db-dg=-2) ;
    // INDEX back to the first pixel's hash slot
    val out = new java.io.ByteArrayOutputStream()
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    for (v <- Seq(0, 0, 0, 2, 0, 0, 0, 2)) out.write(v) // 2 x 2
    out.write(3); out.write(0)
    out.write(0xfe); out.write(10); out.write(20); out.write(30)
    out.write(0x40 | (3 << 4) | (3 << 2) | 3)  // DIFF +1/+1/+1
    out.write(0x80 | (5 + 32))                 // LUMA dg=5
    out.write(((1 + 8) << 4) | (-2 + 8))       //   dr-dg=1, db-dg=-2
    val slot = (10 * 3 + 20 * 5 + 30 * 7 + 255 * 11) % 64
    out.write(slot)                            // INDEX -> (10,20,30)
    for (_ <- 0 until 7) out.write(0)
    out.write(1)
    val dec = Qoi.decode(out.toByteArray).get
    assert(pixels(dec) === Seq(
      (10 << 16) | (20 << 8) | 30,
      (11 << 16) | (21 << 8) | 31,
      (17 << 16) | (26 << 8) | 34,
      (10 << 16) | (20 << 8) | 30))
  }

  test("4-channel streams decode (alpha feeds the index hash, RGB sinks)") {
    val out = new java.io.ByteArrayOutputStream()
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    for (v <- Seq(0, 0, 0, 2, 0, 0, 0, 1)) out.write(v) // 2 x 1
    out.write(4); out.write(0)
    out.write(0xff); out.write(50); out.write(60); out.write(70); out.write(80)
    val slot = (50 * 3 + 60 * 5 + 70 * 7 + 80 * 11) % 64
    out.write(slot)                            // INDEX with alpha-keyed hash
    for (_ <- 0 until 7) out.write(0)
    out.write(1)
    val dec = Qoi.decode(out.toByteArray).get
    assert(pixels(dec) === Seq((50 << 16) | (60 << 8) | 70,
      (50 << 16) | (60 << 8) | 70))
  }

  test("declines: bad magic, truncation, missing/extra end marker, fuzz") {
    val valid = Qoi.encode(img(20, 10)((x, y) => (x * 10, y * 20, 5)))
    assert(Qoi.decode(valid).nonEmpty)
    val bad = valid.clone(); bad(0) = 'Q'.toByte
    assert(Qoi.decode(bad).isEmpty)
    assert(Qoi.decode(valid.take(valid.length - 1)).isEmpty)
    assert(Qoi.decode(valid ++ Array(0.toByte)).isEmpty)
    assert(Qoi.decode(valid.take(20)).isEmpty)
    val ch = valid.clone(); ch(12) = 5
    assert(Qoi.decode(ch).isEmpty)
    val rng = new scala.util.Random(3)
    for (_ <- 0 until 300) {
      Qoi.decode(Array.fill(rng.nextInt(64) + 1)(rng.nextInt(256).toByte))
      Qoi.decode(valid.take(rng.nextInt(valid.length) + 1))
    }
  }

  test("hostile headers decline without allocation; size guard is exact") {
    // a minimal 22-byte stream (header + end marker only) claiming
    // 32768x32768 would force a ~4 GiB BufferedImage before any content
    // validation — the min-encodable-size guard must decline it from the
    // header alone (pre-r15 this allocated first)
    def claim(w: Int, h: Int, content: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write('q'); out.write('o'); out.write('i'); out.write('f')
      for (v <- Seq(w >>> 24, (w >> 16) & 0xff, (w >> 8) & 0xff, w & 0xff,
          h >>> 24, (h >> 16) & 0xff, (h >> 8) & 0xff, h & 0xff))
        out.write(v)
      out.write(3); out.write(0)
      out.write(content, 0, content.length)
      for (_ <- 0 until 7) out.write(0)
      out.write(1)
      out.toByteArray
    }
    assert(Qoi.decode(claim(32768, 32768, Array.empty)).isEmpty)
    // undersized for the claimed pixel count: 1000x1000 px needs at
    // least ceil(1e6/62) content bytes; 50 bytes must decline
    assert(Qoi.decode(claim(1000, 1000, Array.fill(50)(0xfd.toByte))).isEmpty)
    // exactness: one byte BELOW the minimum declines, the minimum itself
    // decodes (62 px RUN ops, all-black per the spec's initial state)
    val w = 124; val h = 1 // 2 full 62-px runs
    assert(Qoi.decode(claim(w, h,
      Array[Byte](0xfd.toByte))).isEmpty)
    val ok = Qoi.decode(claim(w, h,
      Array[Byte](0xfd.toByte, 0xfd.toByte)))
    assert(ok.nonEmpty && ok.get.getWidth === 124)
  }

  test("spec-valid images above 2^24 pixels decode (no hard pixel cap)") {
    // r15 ADVICE: the former 2^24 total-pixel cap silently declined
    // legitimate large images. 4096x4097 = 16,781,312 px > 2^24, all
    // black via maximal RUN ops — allocation stays proportional to the
    // ~270 KB input, and the decode must succeed.
    val w = 4096; val h = 4097
    val n = w.toLong * h
    val out = new java.io.ByteArrayOutputStream()
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    for (v <- Seq(w >>> 24, (w >> 16) & 0xff, (w >> 8) & 0xff, w & 0xff,
        h >>> 24, (h >> 16) & 0xff, (h >> 8) & 0xff, h & 0xff))
      out.write(v)
    out.write(3); out.write(0)
    var left = n
    while (left > 0) {
      val run = math.min(62L, left).toInt
      out.write(0xc0 | (run - 1)) // QOI_OP_RUN, bias -1
      left -= run
    }
    for (_ <- 0 until 7) out.write(0)
    out.write(1)
    val dec = Qoi.decode(out.toByteArray)
    assert(dec.nonEmpty, "a spec-valid > 2^24 px image must decode")
    assert(dec.get.getWidth === w && dec.get.getHeight === h)
    assert((dec.get.getRGB(0, 0) & 0xffffff) === 0)
    assert((dec.get.getRGB(w - 1, h - 1) & 0xffffff) === 0)
  }

  test("seam: QOI rows tag fallback with features equal to the PNG twin") {
    val qoi = Multimodal.syntheticQoi(spark, 5)
    val tagged = Multimodal.extractFeaturesTagged(qoi, dim = 16,
      fallback = Qoi.qoiDecoder).collect()
    assert(tagged.length === 5)
    tagged.foreach { r =>
      assert(r.getString(3) === "fallback" && r.getString(4) === "qoi")
    }
    // PNG twin: identical pixel grid through the jdk path
    val s = spark
    val pngRows = (0L until 5L).map { id =>
      val im = img(64, 48)((x, y) => (((id + x) % 256).toInt,
        ((id + y) % 256).toInt, ((id + x.toLong * y) % 256).toInt))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      org.apache.spark.sql.Row(Long.box(id), "image", bos.toByteArray,
        org.apache.spark.sql.Row(Int.box(64), Int.box(48), null, null,
          "image/png"))
    }
    val png = s.createDataFrame(
      java.util.Arrays.asList(pngRows: _*),
      qoi.schema)
    val f1 = Multimodal.extractFeatures(qoi, dim = 16,
        fallback = Qoi.qoiDecoder).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    val f2 = Multimodal.extractFeatures(png, dim = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    for (id <- f2.keys) assert(f1(id) === f2(id), s"id=$id")
  }
}
