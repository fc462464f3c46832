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
