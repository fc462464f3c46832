package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The FLAC verbatim/constant-subset decoder: sample-exact roundtrip
  * through real framing (CRC-8/CRC-16, UTF-8 frame numbers), honest
  * decline on out-of-subset streams and corrupt CRCs, and the seam
  * provenance — FLAC rows tag `fallback` with features identical to
  * their WAV twins' `jdk` rows. */
class FlacSpec extends SparkSpec {

  test("verbatim roundtrip is sample-exact across frame boundaries") {
    val samples = Array.tabulate(1000)(i => ((i * 37) % 65536) - 32768)
    val enc = Flac.encodeVerbatim(16000, Array(samples), blockSize = 256)
    val (rate, got) = Flac.decode(enc).get
    assert(rate === 16000)
    assert(got.toSeq === samples.toSeq) // 4 frames: 256+256+256+232
  }

  test("stereo mixes to mono exactly like the WAV path (sum / channels)") {
    val l = Array.tabulate(300)(i => i - 150)
    val r = Array.tabulate(300)(i => 2 * i)
    val enc = Flac.encodeVerbatim(8000, Array(l, r), blockSize = 128)
    val (_, got) = Flac.decode(enc).get
    assert(got.toSeq === l.indices.map(i => (l(i) + r(i)) / 2))
  }

  test("corrupt CRCs and out-of-subset subframes decline, never misdecode") {
    val samples = Array.tabulate(300)(i => i % 256)
    val enc = Flac.encodeVerbatim(16000, Array(samples), blockSize = 256)
    // flip one PCM byte: the frame CRC-16 must catch it
    val tampered = enc.clone()
    tampered(enc.length - 40) = (tampered(enc.length - 40) ^ 0x10).toByte
    assert(Flac.decode(tampered).isEmpty)
    // non-FLAC bytes
    assert(Flac.decode("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    assert(Flac.decode(Array[Byte](1, 2, 3)).isEmpty)
    // truncated mid-frame
    assert(Flac.decode(java.util.Arrays.copyOf(enc, enc.length - 7)).isEmpty)
  }

  test("flacDecoder seam: FLAC rows tag fallback, features equal the WAV twin") {
    val flac = Multimodal.syntheticFlac(spark, 5)
    val tagged = Multimodal.extractFeaturesTagged(flac, dim = 16,
      fallback = Flac.flacDecoder).collect()
    assert(tagged.length === 5)
    tagged.foreach { r =>
      assert(r.getString(3) === "fallback" && r.getString(4) === "flac")
    }
    // the same sawtooth through the WAV/jdk path yields IDENTICAL features
    val wav = Multimodal.syntheticMedia(spark, 6)
      .where(col("kind") === "audio") // ids 1, 4 — patternWav sawtooths
    val wavFeats = Multimodal.extractFeatures(wav, dim = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    val flacFeats = Multimodal.extractFeatures(
      Multimodal.syntheticFlac(spark, 5), dim = 16,
      fallback = Flac.flacDecoder).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    for (id <- wavFeats.keys)
      assert(flacFeats(id) === wavFeats(id), s"id=$id")
    // chained decoders: mp4 demux AND flac through ONE registered seam
    val mixed = Multimodal.syntheticFlac(spark, 2)
      .unionByName(Multimodal.syntheticMp4(spark, 2)
        .withColumn("media_id", col("media_id") + 10))
    val both = Multimodal.extractFeaturesTagged(mixed, dim = 16,
      fallback = Multimodal.chainFallbacks(Multimodal.mp4Decoder,
        Flac.flacDecoder)).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(both(0L) === "fallback" && both(11L) === "fallback")
  }

  test("decoder never throws on arbitrary or truncated bytes (fuzz)") {
    val rng = new scala.util.Random(13)
    val valid = Flac.encodeVerbatim(16000,
      Array(Array.tabulate(400)(i => i - 200)), blockSize = 128)
    for (_ <- 0 until 300) {
      val junk = Array.fill(rng.nextInt(200) + 1)(rng.nextInt(256).toByte)
      Flac.decode(junk) // any Option is fine; a throw fails the test
      val cut = valid.clone().take(rng.nextInt(valid.length) + 1)
      Flac.decode(cut)
      val flip = valid.clone()
      flip(rng.nextInt(flip.length)) = rng.nextInt(256).toByte
      Flac.decode(flip)
    }
    // a fuzzed header must never be ACCEPTED with wrong content either:
    // whatever survives decoding came through the CRCs
    assert(Flac.decode(valid).nonEmpty)
  }

  // local bit writer for hand-built bitstreams (the decoder's own
  // encoder must not be the only witness of the FIXED wire format)
  private final class BW {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0; private var n = 0
    def u(v: Long, bits: Int): Unit = { var i = bits - 1
      while (i >= 0) { u1(((v >> i) & 1).toInt); i -= 1 } }
    def u1(v: Int): Unit = { cur = (cur << 1) | (v & 1); n += 1
      if (n == 8) { out.write(cur); cur = 0; n = 0 } }
    def align(): Unit = while (n != 0) u1(0)
    def bytes: Array[Byte] = { require(n == 0); out.toByteArray }
  }

  private def streaminfo(rate: Int, bs: Int, total: Int): Array[Byte] = {
    val si = new BW()
    si.u(bs.toLong, 16); si.u(bs.toLong, 16); si.u(0, 24); si.u(0, 24)
    si.u(rate.toLong, 20); si.u(0L, 3); si.u(15L, 5) // mono, 16-bit
    si.u(total.toLong, 36); si.u(0, 128)
    "fLaC".getBytes("US-ASCII") ++ Array[Byte](0x80.toByte, 0, 0, 34) ++ si.bytes
  }

  test("hand-built order-1 FIXED frame with Rice residuals decodes to " +
    "the closed-form ramp") {
    // one 16-sample frame: warm-up 100, residual +1 per sample at Rice
    // param 1 (zigzag(+1)=2 -> unary q=1, one remainder bit 0) => the
    // decoder must reconstruct 100,101,...,115
    val head = streaminfo(8000, 16, 16)
    val hw = new BW()
    hw.u(0x3ffe, 14); hw.u1(0); hw.u1(0)
    hw.u(6, 4)       // block size: 8-bit field follows
    hw.u(0, 4)       // rate from STREAMINFO
    hw.u(0, 4)       // mono
    hw.u(4, 3); hw.u1(0) // 16-bit
    hw.u(0, 8)       // frame number 0
    hw.u(15, 8)      // block size - 1
    val hdr = hw.bytes
    val bw = new BW()
    for (b <- hdr) bw.u(b & 0xffL, 8)
    bw.u(Flac.crc8(hdr, 0, hdr.length).toLong, 8)
    bw.u1(0); bw.u(9, 6); bw.u1(0) // pad, FIXED order 1, no wasted bits
    bw.u(100, 16)    // warm-up
    bw.u(0, 2)       // residual method 0 (RICE)
    bw.u(0, 4)       // partition order 0
    bw.u(1, 4)       // rice param 1
    for (_ <- 0 until 15) { bw.u1(0); bw.u1(1); bw.u1(0) } // q=1,stop,rem=0
    bw.align()
    val body = bw.bytes
    val out = new java.io.ByteArrayOutputStream()
    out.write(head, 0, head.length); out.write(body, 0, body.length)
    val c16 = Flac.crc16(body, 0, body.length)
    out.write(c16 >> 8); out.write(c16 & 0xff)
    val (rate, got) = Flac.decode(out.toByteArray).get
    assert(rate === 8000)
    assert(got.toSeq === (100 to 115))
  }

  test("hand-built escape partition (raw n-bit residuals) decodes exactly") {
    // order-0 FIXED, partition order 1: first partition escapes to raw
    // 6-bit storage (values 20,-20,...), second uses rice param 2
    val head = streaminfo(8000, 16, 16)
    val hw = new BW()
    hw.u(0x3ffe, 14); hw.u1(0); hw.u1(0)
    hw.u(6, 4); hw.u(0, 4); hw.u(0, 4); hw.u(4, 3); hw.u1(0)
    hw.u(0, 8); hw.u(15, 8)
    val hdr = hw.bytes
    val bw = new BW()
    for (b <- hdr) bw.u(b & 0xffL, 8)
    bw.u(Flac.crc8(hdr, 0, hdr.length).toLong, 8)
    bw.u1(0); bw.u(8, 6); bw.u1(0) // FIXED order 0
    bw.u(0, 2)       // RICE method
    bw.u(1, 4)       // partition order 1 -> two partitions of 8
    bw.u(15, 4)      // partition 1: escape
    bw.u(6, 5)       // 6 raw bits per residual
    val p1 = Seq(20, -20, 31, -32, 0, 7, -8, 15)
    for (v <- p1) bw.u(v.toLong & 0x3f, 6)
    bw.u(2, 4)       // partition 2: rice param 2
    val p2 = Seq(3, -3, 0, 1, -1, 2, -2, 4)
    for (v <- p2) {
      val z = ((v << 1) ^ (v >> 31)).toLong & 0xffffffffL
      val q = (z >>> 2).toInt
      for (_ <- 0 until q) bw.u1(0)
      bw.u1(1); bw.u(z & 3, 2)
    }
    bw.align()
    val body = bw.bytes
    val out = new java.io.ByteArrayOutputStream()
    out.write(head, 0, head.length); out.write(body, 0, body.length)
    val c16 = Flac.crc16(body, 0, body.length)
    out.write(c16 >> 8); out.write(c16 & 0xff)
    val (_, got) = Flac.decode(out.toByteArray).get
    assert(got.toSeq === (p1 ++ p2)) // order 0: residuals ARE the samples
  }

  test("spec-invalid partition geometry declines: (blockSize >> po) == order " +
    "leaves an EMPTY first partition") {
    // RFC 9639 §9.2.7: the first partition holds (blockSize >> po) − order
    // samples, which must be positive. Build an otherwise well-formed
    // order-1 FIXED frame (valid CRC-8 and CRC-16) whose only defect is
    // po = 4 over a 16-sample block: 16 >> 4 = 1 == order, so the first
    // of 16 partitions would be empty — decline, never misdecode
    // (pre-r15 the == case was accepted).
    val head = streaminfo(8000, 16, 16)
    val hw = new BW()
    hw.u(0x3ffe, 14); hw.u1(0); hw.u1(0)
    hw.u(6, 4); hw.u(0, 4); hw.u(0, 4); hw.u(4, 3); hw.u1(0)
    hw.u(0, 8); hw.u(15, 8)
    val hdr = hw.bytes
    val bw = new BW()
    for (b <- hdr) bw.u(b & 0xffL, 8)
    bw.u(Flac.crc8(hdr, 0, hdr.length).toLong, 8)
    bw.u1(0); bw.u(9, 6); bw.u1(0) // FIXED order 1
    bw.u(100, 16)    // warm-up
    bw.u(0, 2)       // RICE method
    bw.u(4, 4)       // partition order 4 -> 16 partitions of 16>>4 = 1
    // plausible content: 16 partitions at rice param 1, one residual
    // each (the decoder must reject on GEOMETRY, before any of this)
    for (_ <- 0 until 16) { bw.u(1, 4); bw.u1(0); bw.u1(1); bw.u1(0) }
    bw.align()
    val body = bw.bytes
    val out = new java.io.ByteArrayOutputStream()
    out.write(head, 0, head.length); out.write(body, 0, body.length)
    val c16 = Flac.crc16(body, 0, body.length)
    out.write(c16 >> 8); out.write(c16 & 0xff)
    assert(Flac.decode(out.toByteArray).isEmpty,
      "an empty first partition is spec-invalid geometry and must decline")
    // the boundary VALID case one notch below: po = 3 -> 16 >> 3 = 2 > 1
    // (first partition holds one sample) stays decodable via the encoder
    val samples = Array.tabulate(64)(i => 100 + i)
    val enc = Flac.encodeFixed(8000, Array(samples), order = 1,
      blockSize = 16, partitionOrder = 3)
    assert(Flac.decode(enc).map(_._2.toSeq) === Some(samples.toSeq))
  }

  test("FIXED orders 0-4 x partition orders 0-2 roundtrip sample-exact") {
    val rng = new scala.util.Random(7)
    // a waveform with structure (so every order's predictor differs) +
    // noise (so rice params vary per partition)
    val samples = Array.tabulate(700)(i =>
      (2000 * math.sin(i / 9.0)).toInt + rng.nextInt(64) - 32)
    for (order <- 0 to 4; po <- 0 to 2) {
      val enc = Flac.encodeFixed(16000, Array(samples), order,
        blockSize = 128, partitionOrder = po)
      val dec = Flac.decode(enc)
      assert(dec.nonEmpty, s"order=$order po=$po must decode")
      assert(dec.get._2.toSeq === samples.toSeq, s"order=$order po=$po")
    }
  }

  test("FIXED stereo mixes to mono like the verbatim path") {
    val l = Array.tabulate(300)(i => (1500 * math.sin(i / 7.0)).toInt)
    val r = Array.tabulate(300)(i => i - 150)
    val enc = Flac.encodeFixed(8000, Array(l, r), order = 2, blockSize = 128)
    val (_, got) = Flac.decode(enc).get
    assert(got.toSeq === l.indices.map(i => (l(i) + r(i)) / 2))
  }

  test("encodeFixed exercises the escape path on raw noise") {
    // white noise at full amplitude: rice cost ~ n*(16+1) exceeds the
    // raw escape's n*16 + 5, so at least one partition must escape —
    // pinned by decoding correctly AND by the stream being no larger
    // than verbatim + framing overhead
    val rng = new scala.util.Random(23)
    val samples = Array.fill(256)(rng.nextInt(65536) - 32768)
    val enc = Flac.encodeFixed(16000, Array(samples), order = 0,
      blockSize = 256, partitionOrder = 0)
    val (_, got) = Flac.decode(enc).get
    assert(got.toSeq === samples.toSeq)
  }

  test("FIXED fixtures tag fallback with features equal to the WAV twin") {
    val wav = Multimodal.syntheticMedia(spark, 6)
      .where(col("kind") === "audio")
    val wavFeats = Multimodal.extractFeatures(wav, dim = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    val fixed = Multimodal.extractFeaturesTagged(
      Multimodal.syntheticFlacFixed(spark, 5), dim = 16,
      fallback = Flac.flacDecoder).collect()
    fixed.foreach { r =>
      assert(r.getString(3) === "fallback" && r.getString(4) === "flac")
    }
    val fixedFeats = Multimodal.extractFeatures(
      Multimodal.syntheticFlacFixed(spark, 5), dim = 16,
      fallback = Flac.flacDecoder).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    for (id <- wavFeats.keys)
      assert(fixedFeats(id) === wavFeats(id), s"id=$id")
  }

  test("FIXED decoder never throws on fuzzed bytes") {
    val rng = new scala.util.Random(29)
    val valid = Flac.encodeFixed(16000,
      Array(Array.tabulate(400)(i => (900 * math.sin(i / 5.0)).toInt)),
      order = 3, blockSize = 128, partitionOrder = 2)
    assert(Flac.decode(valid).nonEmpty)
    for (_ <- 0 until 300) {
      val cut = valid.clone().take(rng.nextInt(valid.length) + 1)
      Flac.decode(cut)
      val flip = valid.clone()
      flip(rng.nextInt(flip.length)) = rng.nextInt(256).toByte
      Flac.decode(flip)
    }
  }

  test("hand-built order-1 LPC (coef 1, shift 0) decodes like FIXED-1") {
    // LPC with one coefficient of 1 and no shift predicts x[i-1] — the
    // same ramp as the FIXED test, but through the LPC wire format
    // (precision field, shift field, coefficient array)
    val head = streaminfo(8000, 16, 16)
    val hw = new BW()
    hw.u(0x3ffe, 14); hw.u1(0); hw.u1(0)
    hw.u(6, 4); hw.u(0, 4); hw.u(0, 4); hw.u(4, 3); hw.u1(0)
    hw.u(0, 8); hw.u(15, 8)
    val hdr = hw.bytes
    val bw = new BW()
    for (b <- hdr) bw.u(b & 0xffL, 8)
    bw.u(Flac.crc8(hdr, 0, hdr.length).toLong, 8)
    bw.u1(0); bw.u(32, 6); bw.u1(0) // LPC order 1 (type 100000)
    bw.u(100, 16)    // warm-up
    bw.u(1, 4)       // precision-1 = 1 -> 2-bit coefficients
    bw.u(0, 5)       // shift 0
    bw.u(1, 2)       // coefficient +1
    bw.u(0, 2)       // RICE
    bw.u(0, 4)       // one partition
    bw.u(1, 4)       // rice param 1
    for (_ <- 0 until 15) { bw.u1(0); bw.u1(1); bw.u1(0) } // residual +1
    bw.align()
    val body = bw.bytes
    val out = new java.io.ByteArrayOutputStream()
    out.write(head, 0, head.length); out.write(body, 0, body.length)
    val c16 = Flac.crc16(body, 0, body.length)
    out.write(c16 >> 8); out.write(c16 & 0xff)
    val (_, got) = Flac.decode(out.toByteArray).get
    assert(got.toSeq === (100 to 115))
  }

  test("LPC roundtrips across orders, shifts and negative coefficients") {
    val rng = new scala.util.Random(41)
    val samples = Array.tabulate(600)(i =>
      (1800 * math.sin(i / 11.0)).toInt + rng.nextInt(32) - 16)
    for (coefs <- Seq(Array(1), Array(2, -1), Array(1, 1), Array(3, -3, 1),
        Array(5, -3, 1, -1), Array(13, -7, 3));
         shift <- Seq(0, 1, 2, 4)) {
      val enc = Flac.encodeLpc(16000, Array(samples), coefs, shift,
        blockSize = 128)
      val dec = Flac.decode(enc)
      assert(dec.nonEmpty, s"coefs=${coefs.toSeq} shift=$shift must decode")
      assert(dec.get._2.toSeq === samples.toSeq,
        s"coefs=${coefs.toSeq} shift=$shift")
    }
  }

  test("stereo decorrelation: all three modes reconstruct the mono mix " +
    "exactly, including odd mid/side sums and negative samples") {
    val left = Array.tabulate(300)(i => (1500 * math.sin(i / 7.0)).toInt)
    val right = Array.tabulate(300)(i => (900 * math.cos(i / 5.0)).toInt + (i % 3) - 1)
    val expect = left.indices.map(i => (left(i) + right(i)) / 2)
    for (mode <- 1 to 3) {
      val enc = Flac.encodeStereo(8000, left, right, mode, blockSize = 128)
      val dec = Flac.decode(enc)
      assert(dec.nonEmpty, s"mode=$mode must decode")
      assert(dec.get._2.toSeq === expect, s"mode=$mode")
    }
  }

  test("LPC and stereo fuzz never throws; negative shift declines") {
    val rng = new scala.util.Random(47)
    val valid = Flac.encodeLpc(16000,
      Array(Array.tabulate(300)(i => (700 * math.sin(i / 6.0)).toInt)),
      Array(2, -1), 0, blockSize = 128)
    assert(Flac.decode(valid).nonEmpty)
    for (_ <- 0 until 200) {
      Flac.decode(valid.clone().take(rng.nextInt(valid.length) + 1))
      val flip = valid.clone()
      flip(rng.nextInt(flip.length)) = rng.nextInt(256).toByte
      Flac.decode(flip)
    }
    val st = Flac.encodeStereo(8000, Array.tabulate(100)(_ - 50),
      Array.tabulate(100)(i => 2 * i), 3, blockSize = 64)
    for (_ <- 0 until 100) {
      val flip = st.clone()
      flip(rng.nextInt(flip.length)) = rng.nextInt(256).toByte
      Flac.decode(flip)
    }
  }

  test("CONSTANT subframes decode exactly (encoder emits them for flat blocks)") {
    val samples = Array.fill(200)(-12345) ++ Array.tabulate(56)(i => i * 3)
    val enc = Flac.encodeVerbatim(44100, Array(samples), blockSize = 200)
    // first frame is flat → CONSTANT (visible as a much shorter frame
    // than 200×16 bits of verbatim payload)
    assert(enc.length < 42 + 200 * 2 + 56 * 2,
      "constant block must not be stored verbatim")
    val (rate, got) = Flac.decode(enc).get
    assert(rate === 44100 && got.toSeq === samples.toSeq)
  }
}
