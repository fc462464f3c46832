package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The H.264 I_PCM baseline-subset decoder: pixel-exact reconstruction
  * of real avc1 bitstreams (I_PCM carries raw 4:2:0 samples, so decode
  * is exact by definition), honest decline on everything outside the
  * subset, and the provenance upgrade at the mp4Decoder seam — real
  * avc1 I_PCM rows tag `fallback` while declared-avc1 junk keeps
  * tagging `stub`. */
class H264Spec extends SparkSpec {

  private def grayFrame(wL: Int, hL: Int, f: (Int, Int) => Int) =
    (Array.tabulate(wL * hL)(i => f(i % wL, i / wL)),
      Array.fill(wL / 2 * hL / 2)(128), Array.fill(wL / 2 * hL / 2)(128))

  test("I_PCM roundtrip is pixel-exact (gray: Cb=Cr=128 gives R=G=B=Y)") {
    val wMbs = 2; val hMbs = 1; val wL = 32; val hL = 16
    val frames = (0 until 3).map(f =>
      grayFrame(wL, hL, (x, y) => (11 + x + 3 * y + 7 * f) % 256))
    val (avcC, samples) = H264.encodeIPcm(frames, wMbs, hMbs)
    val bytes = Multimodal.encodeMp4Samples(wL, hL, "avc1", samples, {
      val n = 8 + avcC.length
      Array((n >>> 24).toByte, (n >>> 16).toByte, (n >>> 8).toByte,
        n.toByte) ++ "avcC".getBytes("US-ASCII") ++ avcC
    })
    val imgs = Multimodal.decodeMp4Frames(bytes).get
    assert(imgs.length === 3)
    for (f <- 0 until 3; y <- 0 until hL; x <- 0 until wL) {
      val v = (11 + x + 3 * y + 7 * f) % 256
      assert((imgs(f).getRGB(x, y) & 0xffffff) ===
        ((v << 16) | (v << 8) | v), s"f=$f x=$x y=$y")
    }
  }

  test("chroma reconstructs through full-range BT.601 (hand-computed pixel)") {
    // one MB, constant Y=120, Cb=90, Cr=200: every pixel must equal the
    // independently hand-evaluated conversion (round-half-up, clamped)
    val y = Array.fill(256)(120)
    val cb = Array.fill(64)(90); val cr = Array.fill(64)(200)
    val (avcC, samples) = H264.encodeIPcm(Seq((y, cb, cr)), 1, 1)
    val img = H264.decodeSample(avcC, samples.head, 0,
      samples.head.length).get
    // R = 120 + 1.402*72 = 220.944 -> 221; G = 120 - 0.344136*(-38)
    //   - 0.714136*72 = 81.66 -> 82; B = 120 + 1.772*(-38) = 52.664 -> 53
    assert((img.getRGB(7, 9) & 0xffffff) === ((221 << 16) | (82 << 8) | 53))
  }

  test("emulation-prevention escapes survive zero-heavy PCM payloads") {
    // an all-zero luma plane produces long 00 runs inside the NAL — the
    // encoder must escape them and the decoder must unescape exactly
    val frames = Seq(grayFrame(16, 16, (_, _) => 0),
      grayFrame(16, 16, (x, _) => if (x < 3) 0 else 255))
    val (avcC, samples) = H264.encodeIPcm(frames, 1, 1)
    assert(samples.head.sliding(3).exists(w =>
      w(0) == 0 && w(1) == 0 && w(2) == 3), "escape bytes expected")
    val i0 = H264.decodeSample(avcC, samples(0), 0, samples(0).length).get
    val i1 = H264.decodeSample(avcC, samples(1), 0, samples(1).length).get
    for (y <- 0 until 16; x <- 0 until 16) {
      assert((i0.getRGB(x, y) & 0xffffff) === 0)
      val v = if (x < 3) 0 else 255
      assert((i1.getRGB(x, y) & 0xffffff) === ((v << 16) | (v << 8) | v))
    }
  }

  test("out-of-subset streams decline to None, never misdecode") {
    val frames = Seq(grayFrame(16, 16, (x, y) => (x + y) % 256))
    val (avcC, samples) = H264.encodeIPcm(frames, 1, 1)
    // truncated sample: the PCM run hits EOF
    assert(H264.decodeSample(avcC, samples.head, 0,
      samples.head.length / 2).isEmpty)
    // corrupt avcC (bad version byte)
    val badC = avcC.clone(); badC(0) = 9
    assert(H264.decodeSample(badC, samples.head, 0,
      samples.head.length).isEmpty)
    // CABAC PPS declines: bits [ue(0) ue(0) u1(1)...] = 0b111…
    assert(H264.parsePps(Array(0xE0.toByte)).isEmpty)
    // …while the CAVLC layout the encoder writes parses: ue0 ue0 0 0 ue0
    // ue0 ue0 0 00 se0 se0 se0 0 0 0 = 0xCE 0x38
    assert(H264.parsePps(Array(0xCE.toByte, 0x38.toByte)).nonEmpty)
    // declared-avc1 with a non-NAL payload (the q182 junk fixture)
    val junk = Multimodal.syntheticMp4Unsupported(spark, 1)
      .collect().head.getAs[Array[Byte]]("bytes")
    assert(Multimodal.decodeMp4Frames(junk).isEmpty)
    // MULTIPLE parameter sets decline: the slice header's pps_id would
    // select among them, and parsing with the wrong PPS flags risks a
    // misparse — the contract is None, never a maybe-wrong image
    val (lenSize, spsN, ppsN) = H264.parseAvcC(avcC).get
    def mkAvcC(sps: Seq[Array[Byte]], pps: Seq[Array[Byte]]): Array[Byte] = {
      val b = scala.collection.mutable.ArrayBuffer[Byte](
        1, 0x42, 0, 30, (0xfc | (lenSize - 1)).toByte,
        (0xe0 | sps.length).toByte)
      for (s <- sps) { b += (s.length >> 8).toByte; b += s.length.toByte; b ++= s }
      b += pps.length.toByte
      for (p <- pps) { b += (p.length >> 8).toByte; b += p.length.toByte; b ++= p }
      b.toArray
    }
    // builder sanity: a rebuilt single-set avcC still decodes
    assert(H264.decodeSample(mkAvcC(spsN, ppsN), samples.head, 0,
      samples.head.length).nonEmpty)
    assert(H264.decodeSample(mkAvcC(spsN ++ spsN, ppsN), samples.head, 0,
      samples.head.length).isEmpty, "two SPS must decline")
    assert(H264.decodeSample(mkAvcC(spsN, ppsN ++ ppsN), samples.head, 0,
      samples.head.length).isEmpty, "two PPS must decline")
  }

  test("decoder never throws on arbitrary or truncated bytes (fuzz)") {
    val rng = new scala.util.Random(13)
    val (avcC, samples) = H264.encodeIPcm(
      Seq(grayFrame(16, 16, (x, y) => (x * y) % 256)), 1, 1)
    val sample = samples.head
    for (_ <- 0 until 300) {
      val junk = Array.fill(rng.nextInt(200) + 1)(rng.nextInt(256).toByte)
      H264.decodeSample(avcC, junk, 0, junk.length)
      H264.decodeSample(junk, sample, 0, sample.length)
      val cutLen = rng.nextInt(sample.length) + 1
      H264.decodeSample(avcC, sample, 0, cutLen)
      val flip = sample.clone()
      flip(rng.nextInt(flip.length)) = rng.nextInt(256).toByte
      H264.decodeSample(avcC, flip, 0, flip.length)
    }
    // directed: shrink the NAL length prefix so the RBSP truncates MID-PCM
    // (the one cut a whole-sample truncation cannot produce — the PCM run
    // must hit the reader's EOF guard, not an array bounds error)
    for (newLen <- Seq(8, 20, 100)) {
      val short = sample.clone()
      short(0) = 0; short(1) = 0
      short(2) = (newLen >> 8).toByte; short(3) = newLen.toByte
      assert(H264.decodeSample(avcC, short, 0, short.length).isEmpty)
    }
    assert(H264.decodeSample(avcC, sample, 0, sample.length).nonEmpty)
  }

  test("mp4Decoder seam: real avc1 I_PCM tags fallback, junk avc1 stays stub") {
    val m = Multimodal.syntheticMp4H264(spark, 4)
      .unionByName(Multimodal.syntheticMp4Unsupported(spark, 3)
        .withColumn("media_id", col("media_id") + 100))
    val tagged = Multimodal.extractFeaturesTagged(m, dim = 16,
      fallback = Multimodal.mp4Decoder).collect()
      .map(r => r.getLong(0) -> ((r.getString(3), r.getString(4)))).toMap
    for (i <- 0L until 4L) assert(tagged(i) === (("fallback", "mp4/avc1")))
    for (i <- 100L until 103L) assert(tagged(i) === (("stub", "mp4/avc1")))
    // and the decoded features are the EXACT histogram arithmetic the
    // gray pattern implies: frame f pixel (x,y) = (id+x+3y+7f) % 256,
    // 16x16x4 pixels pooled into 16 bins
    val feats = Multimodal.extractFeatures(
      Multimodal.syntheticMp4H264(spark, 1), dim = 16,
      fallback = Multimodal.mp4Decoder).collect().head.getSeq[Float](2)
    val counts = new Array[Int](16)
    for (f <- 0 until 4; y <- 0 until 16; x <- 0 until 16)
      counts(((0 + x + 3 * y + 7 * f) % 256) * 16 / 256) += 1
    val expect = counts.map(c => c.toFloat / (16 * 16 * 4))
    assert(feats === expect.toSeq)
  }
}
