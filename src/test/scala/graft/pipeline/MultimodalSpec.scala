package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Multimodal plumbing + the real codecs: schema, partition-batched decode
  * (ImageIO for images and multi-frame GIF video, javax.sound.sampled for
  * audio; the stub only for bytes no JDK codec reads), frame-sample
  * explosion and frame→image extraction. Features/resize/resample are
  * pinned pixel/sample-exact against manual recomputation from the
  * PNG/WAV/GIF bytes. */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.syntheticMedia(spark, 300).cache()

  test("image features are the exact luminance histogram of the PNG pixels") {
    val row = media.where(col("kind") === "image").orderBy("media_id").limit(1)
    val id = row.collect().head.getLong(0)
    val bytes = row.collect().head.getAs[Array[Byte]]("bytes")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val dim = 16
    val expected = {
      val counts = new Array[Long](dim)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        counts((lum * dim) / 256) += 1
      }
      counts.map(_.toFloat / (img.getWidth * img.getHeight)).toSeq
    }
    val got = Multimodal.extractFeatures(row, dim).collect().head
      .getSeq[Float](2)
    assert(got === expected, s"features of image $id")
    assert(math.abs(got.sum - 1.0f) < 1e-5) // histogram normalization
  }

  test("resize is pixel-exact nearest-neighbor and re-encodes as PNG") {
    val src = media.where(col("kind") === "image").orderBy("media_id").limit(2)
    val srcBytes = src.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    val out = Multimodal.resize(src, 32, 24).collect()
    out.foreach { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bytes")))
      assert(img.getWidth === 32 && img.getHeight === 24)
      val srcImg = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(srcBytes(r.getLong(0))))
      for (y <- 0 until 24; x <- 0 until 32) {
        val sx = (x.toLong * srcImg.getWidth / 32).toInt
        val sy = (y.toLong * srcImg.getHeight / 24).toInt
        assert((img.getRGB(x, y) & 0xffffff) === (srcImg.getRGB(sx, sy) & 0xffffff),
          s"pixel ($x,$y) of media ${r.getLong(0)}")
      }
      assert(r.getStruct(3).getString(4) === "image/png")
    }
  }

  test("audio decode is sample-exact: WAV round-trips to the generating sawtooth") {
    val id = 1L // media_id 1 is audio (id % 3 == 1)
    val bytes = media.where(col("media_id") === id).collect().head.getAs[Array[Byte]]("bytes")
    val Some((rate, samples)) = Multimodal.decodeAudio(bytes)
    assert(rate === 16000)
    assert(samples.length === 480)
    val period = (id % 50 + 2).toInt
    val amp = (id % 17 + 8).toInt * 1000
    val expected = (0 until 480).map(i => ((i % period) * 2 * amp / (period - 1)) - amp)
    assert(samples.toSeq === expected)
  }

  test("audio features are the exact time-sliced mean amplitudes of the PCM") {
    val row = media.where(col("kind") === "audio").orderBy("media_id").limit(1)
    val bytes = row.collect().head.getAs[Array[Byte]]("bytes")
    val Some((_, samples)) = Multimodal.decodeAudio(bytes)
    val dim = 8
    val expected = (0 until dim).map { j =>
      val s = j * samples.length / dim; val e = (j + 1) * samples.length / dim
      (samples.slice(s, e).map(v => math.abs(v).toLong).sum.toDouble /
        ((e - s).toLong * 32768L)).toFloat
    }
    val got = Multimodal.extractFeatures(row, dim).collect().head.getSeq[Float](2)
    assert(got === expected)
  }

  test("resampleAudio is sample-exact nearest-neighbor and re-encodes as WAV") {
    val src = media.where(col("kind") === "audio").orderBy("media_id").limit(2)
    val srcBytes = src.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    val out = Multimodal.resampleAudio(src, 8000).collect()
    out.foreach { r =>
      val Some((rate, got)) = Multimodal.decodeAudio(r.getAs[Array[Byte]]("bytes"))
      assert(rate === 8000)
      val Some((srcRate, srcSamples)) = Multimodal.decodeAudio(srcBytes(r.getLong(0)))
      val outN = (srcSamples.length.toLong * 8000 / srcRate).toInt
      val expected = (0 until outN).map(i => srcSamples((i.toLong * srcSamples.length / outN).toInt))
      assert(got.toSeq === expected, s"samples of media ${r.getLong(0)}")
      assert(r.getStruct(3).getInt(2) === 8000) // meta.sample_rate rewritten
      assert(r.getStruct(3).getString(4) === "audio/wav")
    }
    // non-audio rows pass through byte-identical
    val img = media.where(col("kind") === "image").limit(2)
    val imgBytes = img.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    Multimodal.resampleAudio(img, 8000).collect().foreach { r =>
      assert(r.getAs[Array[Byte]]("bytes").toSeq === imgBytes(r.getLong(0)).toSeq)
    }
  }

  test("video decode is pixel-exact: GIF round-trips to the generating pattern") {
    val id = 2L // media_id 2 is video (id % 3 == 2)
    val bytes = media.where(col("media_id") === id).collect().head.getAs[Array[Byte]]("bytes")
    val Some(frames) = Multimodal.decodeVideoFrames(bytes)
    assert(frames.length === 30)
    for (f <- Seq(0, 7, 29); y <- 0 until 12; x <- 0 until 16) {
      val v = ((id + x + 3L * y + 7L * f) % 256).toInt
      val rgb = frames(f).getRGB(x, y)
      assert((rgb & 0xff) === v && ((rgb >> 8) & 0xff) === v && ((rgb >> 16) & 0xff) === v,
        s"frame $f pixel ($x,$y)")
    }
  }

  test("video features are the exact luminance histogram pooled over all frames") {
    val row = media.where(col("kind") === "video").orderBy("media_id").limit(1)
    val bytes = row.collect().head.getAs[Array[Byte]]("bytes")
    val Some(frames) = Multimodal.decodeVideoFrames(bytes)
    val dim = 16
    val counts = new Array[Long](dim)
    var total = 0L
    frames.foreach { img =>
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        counts((lum * dim) / 256) += 1
      }
      total += img.getWidth.toLong * img.getHeight
    }
    val expected = counts.map(_.toFloat / total).toSeq
    val got = Multimodal.extractFeatures(row, dim).collect().head.getSeq[Float](2)
    assert(got === expected)
  }

  test("framesToImages decodes exactly the sampled frame into a standalone PNG") {
    val frames = Multimodal.sampleFrames(media.where(col("media_id") < 30), everyN = 10)
    val srcBytes = media.where(col("kind") === "video" && col("media_id") < 30)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    val imgs = Multimodal.framesToImages(frames).collect()
    assert(imgs.length === srcBytes.size * 3) // frames 0,10,20 of 30
    imgs.foreach { r =>
      assert(r.getString(2) === "image")
      val png = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bytes")))
      val Some(all) = Multimodal.decodeVideoFrames(srcBytes(r.getLong(0)))
      val src = all(r.getInt(1))
      for (y <- 0 until src.getHeight; x <- 0 until src.getWidth)
        assert((png.getRGB(x, y) & 0xffffff) === (src.getRGB(x, y) & 0xffffff),
          s"media ${r.getLong(0)} frame ${r.getInt(1)} pixel ($x,$y)")
      assert(r.getStruct(4).getString(4) === "image/png")
    }
  }

  test("undecodable bytes fall back to the stub; a/v bytes pass resize unchanged") {
    import org.apache.spark.sql.Row
    val junk = java.security.MessageDigest.getInstance("SHA-256").digest("junk".getBytes("UTF-8"))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(Long.box(0L), "video", junk,
        Row(null, null, null, Int.box(30), "application/octet-stream"))),
      Multimodal.mediaSchema)
    val feats = Multimodal.extractFeatures(df, dim = 8).collect().head
    assert(feats.getSeq[Float](2) === Multimodal.fakeDecode(junk, 8).toSeq)
    val resized = Multimodal.resize(media.where(col("kind") =!= "image").limit(4), 32, 24).collect()
    resized.foreach { r =>
      val orig = media.where(col("media_id") === r.getLong(0))
        .collect().head.getAs[Array[Byte]]("bytes")
      assert(r.getAs[Array[Byte]]("bytes").toSeq === orig.toSeq)
      assert(r.getStruct(3).getInt(0) === 32) // meta still rewritten
    }
  }

  test("a registered fallback decoder plugs in at the stub seam, codecs still win") {
    import org.apache.spark.sql.Row
    // a stand-in mp4 decoder: claims bytes with an 'MP4X' magic, declines
    // everything else — the extension contract a real decoder would follow
    val magic = "MP4X".getBytes("UTF-8")
    val custom: Multimodal.FallbackDecoder = (kind, bytes, dim) =>
      if (kind == "video" && bytes.take(4).sameElements(magic))
        Some(Array.tabulate(dim)(i => (bytes.length + i).toFloat))
      else None
    val mp4ish = magic ++ Array.fill(28)(0x5a.toByte)
    val junk = java.security.MessageDigest.getInstance("SHA-256")
      .digest("junk".getBytes("UTF-8"))
    val df = spark.createDataFrame(java.util.Arrays.asList(
      Row(Long.box(0L), "video", mp4ish,
        Row(null, null, null, Int.box(30), "video/mp4")),
      Row(Long.box(1L), "video", junk,
        Row(null, null, null, Int.box(30), "application/octet-stream"))),
      Multimodal.mediaSchema)
    val got = Multimodal.extractFeatures(df, dim = 8, fallback = custom)
      .orderBy("media_id").collect()
    assert(got(0).getSeq[Float](2) ===
      Array.tabulate(8)(i => (mp4ish.length + i).toFloat).toSeq,
      "magic bytes must route to the registered decoder")
    assert(got(1).getSeq[Float](2) === Multimodal.fakeDecode(junk, 8).toSeq,
      "declined bytes must still fall to the stub")
    // a greedy fallback never shadows a working JDK codec: real media wins
    val greedy: Multimodal.FallbackDecoder = (_, _, dim) =>
      Some(Array.fill(dim)(-1f))
    val real = Multimodal.extractFeatures(media, dim = 16, fallback = greedy)
      .orderBy("media_id").collect()
    val plain = Multimodal.extractFeatures(media, dim = 16)
      .orderBy("media_id").collect()
    assert(real.map(_.getSeq[Float](2).toList).toSeq ===
      plain.map(_.getSeq[Float](2).toList).toSeq)
  }

  test("feature extraction is a narrow per-partition map with stable output") {
    val f1 = Multimodal.extractFeatures(media, dim = 16).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(media, dim = 16).orderBy("media_id").collect()
    assert(f1.length === 300)
    assert(f1.forall(r => r.getSeq[Float](r.fieldIndex("features")).length === 16))
    assert(f1.map(r => r.getSeq[Float](r.fieldIndex("features")).toList).toSeq ===
      f2.map(r => r.getSeq[Float](r.fieldIndex("features")).toList).toSeq) // deterministic codecs
    // narrow plan: no shuffle exchange before the map
    val plan = Multimodal.extractFeatures(media, 16).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("frame sampling explodes one row per sampled frame") {
    val frames = Multimodal.sampleFrames(media, everyN = 10)
    val perVideo = frames.groupBy("media_id").count().collect()
    assert(perVideo.forall(_.getAs[Long]("count") === 3)) // frames 0,10,20 of 30
    assert(frames.where(col("frame_idx") % 10 =!= 0).count() === 0)
  }

  test("resize preserves the media schema and rewrites meta") {
    val r = Multimodal.resize(media, 32, 24)
    assert(r.schema === media.schema)
    assert(r.select("meta.width").distinct().collect().head.getInt(0) === 32)
  }

  private def patternFrame(id: Long, f: Int, w: Int = 16, h: Int = 12) = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = ((id + x + 3L * y + 7L * f) % 256).toInt
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }
  private def pixels(img: java.awt.image.BufferedImage): Seq[Int] =
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) yield img.getRGB(x, y) & 0xffffff

  test("AVI/DIB video decodes pixel-exact through the RIFF parser") {
    val frames = (0 until 5).map(f => patternFrame(9L, f))
    val avi = Multimodal.encodeAvi(frames, fps = 10)
    val got = Multimodal.decodeVideoFrames(avi)
    assert(got.isDefined && got.get.length === 5)
    for (f <- 0 until 5)
      assert(pixels(got.get(f)) === pixels(frames(f)), s"frame $f")
    // single-frame decode (framesToImages path) matches the full decode
    val one = Multimodal.decodeVideoFrame(avi, 3)
    assert(one.isDefined && pixels(one.get) === pixels(frames(3)))
    assert(Multimodal.decodeVideoFrame(avi, 5).isEmpty)
  }

  test("AVI/MJPEG frames decode to exactly ImageIO's decode of each JPEG payload") {
    val frames = (0 until 3).map(f => patternFrame(4L, f))
    val avi = Multimodal.encodeAvi(frames, fps = 10, mjpeg = true)
    val got = Multimodal.decodeVideoFrames(avi)
    assert(got.isDefined && got.get.length === 3)
    // container parsing must hand ImageIO byte-identical JPEG payloads:
    // re-encode each source frame the same way and compare decoded pixels
    for (f <- 0 until 3) {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(frames(f), "jpg", bos)
      val expect = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
      assert(pixels(got.get(f)) === pixels(expect), s"frame $f")
    }
  }

  test("AVI video rows flow through extractFeatures via the real decoder") {
    val frames = (0 until 4).map(f => patternFrame(2L, f))
    val avi = Multimodal.encodeAvi(frames, fps = 10)
    val row = org.apache.spark.sql.Row(1L, "video", avi,
      org.apache.spark.sql.Row(16, 12, null, Int.box(4), "video/x-msvideo"))
    val df = spark.createDataFrame(java.util.Arrays.asList(row), Multimodal.mediaSchema)
    val feats = Multimodal.extractFeatures(df, dim = 16).collect()
    assert(feats.length === 1)
    val got = feats(0).getSeq[Float](feats(0).fieldIndex("features")).toArray
    assert(got === Multimodal.videoFeatures(frames, 16), "features must come from the real AVI decode")
  }

  test("mp4/raw video decodes pixel-exact through the ISO-BMFF sample table") {
    val frames = (0 until 5).map(f => patternFrame(11L, f))
    val mp4 = Multimodal.encodeMp4(frames)
    // the demuxer resolves stsd codec + dimensions and per-sample slices
    val track = Multimodal.parseMp4Samples(mp4)
    assert(track.isDefined && track.get.codec === "raw " &&
      track.get.w === 16 && track.get.h === 12 &&
      track.get.samples.length === 5)
    assert(track.get.samples.forall(_._2 === 16 * 12 * 3))
    val got = Multimodal.decodeMp4Frames(mp4)
    assert(got.isDefined && got.get.length === 5)
    for (f <- 0 until 5)
      assert(pixels(got.get(f)) === pixels(frames(f)), s"frame $f")
  }

  test("mp4/MJPEG frames decode to exactly ImageIO's decode of each JPEG sample") {
    val frames = (0 until 3).map(f => patternFrame(6L, f))
    val mp4 = Multimodal.encodeMp4(frames, mjpeg = true)
    val got = Multimodal.decodeMp4Frames(mp4)
    assert(got.isDefined && got.get.length === 3)
    // the sample table must hand ImageIO byte-identical JPEG payloads
    for (f <- 0 until 3) {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(frames(f), "jpg", bos)
      val expect = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
      assert(pixels(got.get(f)) === pixels(expect), s"frame $f")
    }
  }

  test("framesToImages decodes sampled frames out of a raw-mp4 row") {
    val frames = (0 until 6).map(f => patternFrame(8L, f))
    val mp4 = Multimodal.encodeMp4(frames)
    val row = Row(Long.box(5L), "video", mp4,
      Row(16, 12, null, Int.box(6), "video/mp4"))
    val df = spark.createDataFrame(java.util.Arrays.asList(row), Multimodal.mediaSchema)
    val out = Multimodal.framesToImages(Multimodal.sampleFrames(df, everyN = 2))
      .orderBy("frame_idx").collect()
    assert(out.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 2, 4))
    assert(out.forall(_.getAs[String]("kind") === "image"))
    for ((r, f) <- out.zip(Seq(0, 2, 4))) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bytes")))
      assert(pixels(img) === pixels(frames(f)), s"frame $f")
    }
  }

  test("mp4 sample table resolves multi-chunk stsc/stco layouts") {
    // hand-build a two-chunk layout: chunk 1 holds samples 0-1, chunk 2
    // holds sample 2 (stsc rows (1,2),(2,1)); payloads interleave a gap
    // byte so offsets are non-contiguous — the resolver must follow
    // stco + per-chunk walking, not cumulative sizes alone
    def be(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(tp: String, p: Array[Byte]) =
      be(8 + p.length) ++ tp.getBytes("US-ASCII") ++ p
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be(0) ++ "isom".getBytes("US-ASCII"))
    val s0 = Array.fill(4)(0x11.toByte); val s1 = Array.fill(6)(0x22.toByte)
    val s2 = Array.fill(5)(0x33.toByte)
    val gap = Array.fill(3)(0x7f.toByte)
    val mdatBody = s0 ++ s1 ++ gap ++ s2
    val chunk1 = ftyp.length + 8
    val chunk2 = chunk1 + s0.length + s1.length + gap.length
    val entry = box("raw ", new Array[Byte](6) ++ be16(1) ++ new Array[Byte](16) ++
      be16(2) ++ be16(2) ++ be(0x00480000) ++ be(0x00480000) ++ be(0) ++ be16(1) ++
      new Array[Byte](32) ++ be16(24) ++ be16(0xFFFF))
    val stbl = box("stbl",
      box("stsd", be(0) ++ be(1) ++ entry) ++
      box("stts", be(0) ++ be(1) ++ be(3) ++ be(1)) ++
      box("stsc", be(0) ++ be(2) ++ be(1) ++ be(2) ++ be(1) ++ be(2) ++ be(1) ++ be(1)) ++
      box("stsz", be(0) ++ be(0) ++ be(3) ++ be(4) ++ be(6) ++ be(5)) ++
      box("stco", be(0) ++ be(2) ++ be(chunk1) ++ be(chunk2)))
    val moov = box("moov", box("trak",
      box("tkhd", new Array[Byte](76) ++ be(2 << 16) ++ be(2 << 16)) ++
      box("mdia", box("minf", stbl))))
    val bytes = ftyp ++ box("mdat", mdatBody) ++ moov
    val t = Multimodal.parseMp4Samples(bytes)
    assert(t.isDefined && t.get.samples === IndexedSeq(
      (chunk1.toLong, 4), (chunk1.toLong + 4, 6), (chunk2.toLong, 5)),
      "samples must follow stco chunk starts, consecutive within a chunk")
    // sizes (4, 6, 5) never equal w*h*3 = 12 → raw decode declines whole
    assert(Multimodal.decodeMp4Frames(bytes).isEmpty)
    // a torn stsz (count beyond the box) declines instead of throwing
    val torn = bytes.clone()
    // find stsz count field and corrupt it to a huge value
    val idx = bytes.indexOfSlice("stsz".getBytes("US-ASCII"))
    System.arraycopy(be(1000001), 0, torn, idx + 4 + 8, 4)
    assert(Multimodal.parseMp4Samples(torn).isEmpty)
  }

  test("mp4Decoder registers at the seam: real mp4 decodes, compressed declines, JDK codecs still win") {
    val frames = (0 until 4).map(f => patternFrame(3L, f))
    val realMp4 = Multimodal.encodeMp4(frames)
    // patternMp4 has REAL container structure but a junk mdat and no
    // stbl — exactly the avc1-like shape the decoder must DECLINE (falls
    // to the stub), never misdecode
    val stubMp4 = Multimodal.patternMp4(17L, 8, 6, nFrames = 4)
    val df = spark.createDataFrame(java.util.Arrays.asList(
      Row(Long.box(0L), "video", realMp4,
        Row(16, 12, null, Int.box(4), "video/mp4")),
      Row(Long.box(1L), "video", stubMp4,
        Row(8, 6, null, Int.box(4), "video/mp4"))),
      Multimodal.mediaSchema)
    val got = Multimodal.extractFeatures(df, dim = 16,
        fallback = Multimodal.mp4Decoder)
      .orderBy("media_id").collect()
    assert(got(0).getSeq[Float](2).toArray === Multimodal.videoFeatures(frames, 16),
      "a raw-codec mp4 must decode for real through the seam")
    assert(got(1).getSeq[Float](2).toArray === Multimodal.fakeDecode(stubMp4, 16),
      "an undecodable-codec mp4 must decline to the stub")
    // the registered mp4 decoder never shadows working JDK codecs
    val withSeam = Multimodal.extractFeatures(media, dim = 16,
        fallback = Multimodal.mp4Decoder)
      .orderBy("media_id").collect()
    val plain = Multimodal.extractFeatures(media, dim = 16)
      .orderBy("media_id").collect()
    assert(withSeam.map(_.getSeq[Float](2).toList).toSeq ===
      plain.map(_.getSeq[Float](2).toList).toSeq)
  }

  test("u-law WAV decodes through the JDK transcode (telephony path)") {
    import javax.sound.sampled._
    val rate = 8000f
    val n = 200
    val pcm = new Array[Byte](2 * n)
    for (i <- 0 until n) {
      val v = (math.sin(i * 0.1) * 12000).toInt
      pcm(2 * i) = (v & 0xff).toByte; pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val src = new AudioInputStream(new java.io.ByteArrayInputStream(pcm),
      new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16, 1, 2, rate, false), n.toLong)
    val ulaw = AudioSystem.getAudioInputStream(
      new AudioFormat(AudioFormat.Encoding.ULAW, rate, 8, 1, 1, rate, false), src)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ulaw, AudioFileFormat.Type.WAVE, bos)
    val bytes = bos.toByteArray
    val got = Multimodal.decodeAudio(bytes)
    assert(got.isDefined, "u-law WAV must decode, not fall to the stub")
    assert(got.get._1 === 8000 && got.get._2.length === n)
    // expected: the JDK's own table-driven ulaw -> pcm16 transcode
    val back = AudioSystem.getAudioInputStream(
      new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16, 1, 2, rate, false),
      AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes)))
    val data = back.readAllBytes()
    val want = (0 until n).map(i => (data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toArray
    assert(got.get._2 === want)
  }

  test("AVI parser survives adversarial structures (nesting, audio strf, corrupt JPEG)") {
    def le(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    // 5000-deep nested LISTs: recursion must be depth-bounded, not StackOverflow
    val depth = 5000
    val inner = Array.fill[Byte](4)(0)
    val nested = (0 until depth).foldLeft(inner) { (body, _) =>
      "LIST".getBytes("US-ASCII") ++ le(body.length + 4) ++ "xxxx".getBytes("US-ASCII") ++ body
    }
    val bomb = "RIFF".getBytes("US-ASCII") ++ le(nested.length + 4) ++
      "AVI ".getBytes("US-ASCII") ++ nested
    assert(Multimodal.decodeVideoFrames(bomb).isEmpty) // no frames, no crash

    // an audio stream's 40-byte strf after the video strl must NOT clobber
    // the video dimensions (regression: last-strf-wins)
    val frames = (0 until 3).map(f => patternFrame(6L, f))
    val avi = Multimodal.encodeAvi(frames, fps = 10)
    val audioStrl = "strh".getBytes("US-ASCII") ++ le(8) ++
      "auds".getBytes("US-ASCII") ++ "    ".getBytes("US-ASCII") ++
      "strf".getBytes("US-ASCII") ++ le(40) ++ le(1) ++ le(1) ++ le(48000) ++ le(96000) ++
      le(0) ++ le(0) ++ le(0) ++ le(0) ++ le(0) ++ le(0)
    val body = avi.drop(8) ++ audioStrl
    val mixed = "RIFF".getBytes("US-ASCII") ++ le(body.length) ++ body
    val got = Multimodal.decodeVideoFrames(mixed)
    assert(got.isDefined && got.get.length === 3)
    assert(pixels(got.get(0)) === pixels(frames(0)), "video dims must survive the audio strf")

    // a SECOND stream's frame chunks ('01db' — e.g. another video track)
    // must not interleave into the primary frame list even when their size
    // matches a valid DIB frame (regression: any-stream-number match)
    val w = frames.head.getWidth; val h = frames.head.getHeight
    val stride = (w * 3 + 3) & ~3
    val foreign = "01db".getBytes("US-ASCII") ++ le(stride * h) ++
      Array.fill[Byte](stride * h)(0xff.toByte)
    val body2 = avi.drop(8) ++ foreign
    val twoStreams = "RIFF".getBytes("US-ASCII") ++ le(body2.length) ++ body2
    val got2 = Multimodal.decodeVideoFrames(twoStreams)
    assert(got2.isDefined && got2.get.length === 3,
      "foreign-stream frames must be excluded from the frame list")
    assert(pixels(got2.get(2)) === pixels(frames(2)))

    // corrupt MJPEG payload: the bad frame degrades, nothing throws
    val mj = Multimodal.encodeAvi(frames, fps = 10, mjpeg = true)
    val corrupt = mj.clone()
    val mid = corrupt.length / 2
    for (i <- mid until math.min(mid + 40, corrupt.length)) corrupt(i) = 0x7f
    Multimodal.decodeVideoFrames(corrupt) // must not throw
    Multimodal.decodeVideoFrame(corrupt, 1)
  }

  test("video decoders never throw on arbitrary or truncated bytes (fuzz)") {
    val rnd = new scala.util.Random(42)
    for (i <- 0 until 300) {
      val b = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(b)
      if (i % 3 == 0 && b.length >= 12) { // adversarial: valid magic, garbage body
        "RIFF".getBytes("US-ASCII").copyToArray(b, 0)
        "AVI ".getBytes("US-ASCII").copyToArray(b, 8)
      }
      Multimodal.decodeVideoFrames(b)
      Multimodal.decodeVideoFrame(b, 1)
    }
    // a real AVI truncated at every 16th byte: the parser must stop cleanly
    val avi = Multimodal.encodeAvi((0 until 3).map(f => patternFrame(1L, f)), fps = 10)
    for (cut <- 12 until avi.length by 16)
      Multimodal.decodeVideoFrames(java.util.Arrays.copyOf(avi, cut))
  }

  /** The q36 oracle's claim, pinned at `sbt test` time: the whole
    * pattern→encode→decode→resize/resample→feature pipeline equals a
    * closed-form arithmetic recompute (the same recompute the DuckDB oracle
    * SQL performs — if patternPng/Wav/Gif or a feature formula changes, this
    * fails here instead of at driver-verify time). */
  test("q36 closed-form parity: codec roundtrips are arithmetic-exact end-to-end") {
    import org.apache.spark.sql.functions.{aggregate => sqlAggregate, _}
    val m = Multimodal.syntheticMedia(spark, 60)
    val prepped = Multimodal.resampleAudio(Multimodal.resize(m, 32, 32), 8000)
    val got = Multimodal.extractFeatures(prepped, dim = 16)
      .withColumn("feat_norm",
        round(sqrt(sqlAggregate(transform(col("features"), x => x.cast("double") * x),
          lit(0.0), (acc, x) => acc + x)), 6))
      .orderBy("media_id").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("feat_norm")).toMap

    def norm(f: Array[Float]): Double = {
      val s = f.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
      BigDecimal(math.sqrt(s)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def expected(id: Long): Double = (id % 3) match {
      case 0 => // image: 16×12 pattern nearest-resized to 32×32, 16-bin histogram
        val counts = new Array[Long](16)
        for (y <- 0 until 32; x <- 0 until 32) {
          val sx = x / 2; val sy = y * 12 / 32
          val r = ((id + sx) % 256).toInt
          val g = ((id + sy) % 256).toInt
          val b = ((id + sx.toLong * sy) % 256).toInt
          counts((r * 299 + g * 587 + b * 114) / 1000 * 16 / 256) += 1
        }
        norm(counts.map(_.toFloat / 1024))
      case 1 => // audio: sawtooth resampled 480→240 (sample 2i), 16 bins of 15
        val period = (id % 50 + 2).toInt
        val amp = (id % 17 + 8).toInt * 1000
        val f = (0 until 16).map { j =>
          val s = (j * 15 until (j + 1) * 15).map { i =>
            math.abs((2 * i % period) * 2 * amp / (period - 1) - amp).toLong
          }.sum
          (s.toDouble / 491520L).toFloat
        }.toArray
        norm(f)
      case _ => // video: 30 frames of gray (id + x + 3y + 7f) % 256, lum == v
        val counts = new Array[Long](16)
        for (fr <- 0 until 30; y <- 0 until 12; x <- 0 until 16)
          counts((((id + x + 3 * y + 7 * fr) % 256) / 16).toInt) += 1
        norm(counts.map(_.toFloat / 5760))
    }
    for (id <- 0L until 60L)
      assert(got(id) === expected(id), s"media_id $id (kind ${id % 3})")
  }

  test("mp4/webm probes read container structure; torn/foreign bytes degrade") {
    // the builders' own output parses back exactly
    assert(Multimodal.parseMp4(Multimodal.patternMp4(7L, 320, 240, 42))
      === Some((320, 240, Some(42))))
    assert(Multimodal.parseWebm(Multimodal.patternWebm(7L, 640, 360))
      === Some((640, 360, "webm")))
    // generic matroska DocType is distinguished from webm
    assert(Multimodal.parseWebm(Multimodal.patternWebm(7L, 64, 48, "matroska"))
      === Some((64, 48, "matroska")))
    assert(Multimodal.probeBytes(Multimodal.patternWebm(1L, 64, 48, "matroska"))
      .map(_._1) === Some("video/x-matroska"))
    // version-1 tkhd (64-bit times): width/height shift by 12 bytes
    val v0 = Multimodal.patternMp4(1L, 100, 50, 5)
    // a torn mp4 (truncated mid-moov) keeps whatever parsed before the tear
    val torn = v0.take(v0.length - 40)
    assert(Multimodal.parseMp4(torn).isEmpty ||
      Multimodal.parseMp4(torn).exists(_._1 == 100))
    // foreign magic: no probe result
    assert(Multimodal.probeBytes("not a container at all!!".getBytes).isEmpty)
    // fuzz: arbitrary prefixes never throw
    for (n <- Seq(0, 3, 9, 13, 27)) {
      Multimodal.parseMp4(v0.take(n))
      Multimodal.parseWebm(Multimodal.patternWebm(3L, 8, 8).take(n))
      Multimodal.gifFrameCount(Multimodal.patternGif(3L, 8, 8, 3).take(n))
    }
  }

  test("imageAHash equals the manual 8×8 strict-mean hash; near-identical " +
      "images land a small Hamming distance apart") {
    // manual recompute from the decoded PNG pixels (independent of aHashHalves)
    val rows = Multimodal.imageAHash(media).orderBy("media_id").limit(3).collect()
    for (r <- rows) {
      val id = r.getLong(0)
      val bytes = media.where(col("media_id") === id).collect().head
        .getAs[Array[Byte]]("bytes")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val lum = (0 until 64).map { k =>
        val sx = (k % 8) * img.getWidth / 8
        val sy = (k / 8) * img.getHeight / 8
        val rgb = img.getRGB(sx, sy)
        (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
      }
      val s = lum.map(_.toLong).sum
      var hi = 0L; var lo = 0L
      for (k <- 0 until 64 if lum(k) * 64 > s)
        if (k < 32) hi |= 1L << (31 - k) else lo |= 1L << (63 - k)
      assert((r.getLong(1), r.getLong(2)) === ((hi, lo)), s"media_id=$id")
    }

    // perceptual property: a one-pixel edit moves the hash by at most the
    // one cell it lands in (plus mean shift ~0); identity distance is 0
    val base = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      media.where(col("media_id") === 0).collect().head.getAs[Array[Byte]]("bytes")))
    val tweaked = new java.awt.image.BufferedImage(
      base.getWidth, base.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until base.getHeight; x <- 0 until base.getWidth)
      tweaked.setRGB(x, y, base.getRGB(x, y))
    tweaked.setRGB(3, 3, 0xffffff)
    val (h0, l0) = Multimodal.aHashHalves(base)
    val (h1, l1) = Multimodal.aHashHalves(tweaked)
    val dist = java.lang.Long.bitCount(h0 ^ h1) + java.lang.Long.bitCount(l0 ^ l1)
    assert(dist <= 2, s"one-pixel edit moved $dist bits")
    assert(java.lang.Long.bitCount(h0 ^ h0) + java.lang.Long.bitCount(l0 ^ l0) === 0)
    // non-images and undecodable bytes are dropped, never stub-hashed
    val n = Multimodal.imageAHash(media).count()
    assert(n === media.where(col("kind") === "image").count())
  }

  test("probeMeta fills meta from bytes and passes unknown rows untouched") {
    val rows = java.util.Arrays.asList(
      Row(Long.box(1L), "video", Multimodal.patternMp4(1L, 64, 32, 9), null),
      Row(Long.box(2L), "video", "garbage-bytes-here!!".getBytes,
        Row(Int.box(7), Int.box(8), null, Int.box(3), "video/unknown")))
    val media = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val out = Multimodal.probeMeta(media).orderBy("media_id").collect()
    val m1 = out(0).getStruct(3)
    assert((m1.get(0), m1.get(1), m1.get(3), m1.get(4)) === ((64, 32, 9, "video/mp4")))
    // unknown bytes: the original meta survives field-for-field
    val m2 = out(1).getStruct(3)
    assert((m2.get(0), m2.get(1), m2.get(3), m2.get(4)) === ((7, 8, 3, "video/unknown")))
  }

  test("imageNearDupPairs banding is recall-1 vs brute force up to dist 7") {
    val media = Multimodal.syntheticMedia(spark, 120)
    val hashes = Multimodal.imageAHash(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def brute(maxD: Long) = (for {
      (ia, ha, la) <- hashes; (ib, hb, lb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb)
      if d <= maxD
    } yield (ia, ib, d.toLong)).toSet
    for (maxD <- Seq(0, 3, 7)) {
      val got = Multimodal.imageNearDupPairs(media, maxDist = maxD)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === brute(maxD.toLong), s"maxDist=$maxD")
    }
  }

  test("imageNearDupPairs rejects thresholds beyond the banding guarantee") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.imageNearDupPairs(Multimodal.syntheticMedia(spark, 9),
        maxDist = 8)
    }
    assert(e.getMessage.contains("recall"))
  }

  test("extractFeaturesTagged: provenance tags, codec names, feature parity") {
    val media = Multimodal.syntheticMedia(spark, 30)
      .unionByName(Multimodal.syntheticMp4(spark, 6)
        .withColumn("media_id", col("media_id") + 1000))
      .unionByName(Multimodal.syntheticMp4Unsupported(spark, 3)
        .withColumn("media_id", col("media_id") + 2000))
    val tagged = Multimodal.extractFeaturesTagged(media, dim = 16,
      fallback = Multimodal.mp4Decoder).collect()
    val byId = tagged.map(r => r.getLong(0) ->
      ((r.getString(3), r.getString(4)))).toMap
    // in-JVM codecs tag jdk with the sniffed name
    assert(byId(0L) === (("jdk", "png")))
    assert(byId(1L) === (("jdk", "wav")))
    assert(byId(2L) === (("jdk", "gif")))
    // demuxable raw-RGB mp4 rides the registered fallback
    assert(byId(1000L) === (("fallback", "mp4/raw")))
    // declared-avc1: detected, named, stubbed — the contract's error class
    assert(byId(2000L) === (("stub", "mp4/avc1")))
    // tagged features agree with extractFeatures row for row
    val plain = Multimodal.extractFeatures(media, dim = 16,
        fallback = Multimodal.mp4Decoder).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    tagged.foreach(r => assert(r.getSeq[Float](2) === plain(r.getLong(0)),
      s"feature mismatch for media_id=${r.getLong(0)}"))
  }

  test("extractFeaturesTagged strict mode errors on undecodable codecs") {
    val bad = Multimodal.syntheticMp4Unsupported(spark, 2)
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeaturesTagged(bad, dim = 16, strict = true).collect()
    }
    val msg = e.getCause match {
      case c: Multimodal.UnsupportedCodecException => c.getMessage
      case other => throw other
    }
    assert(msg.contains("mp4/avc1") && msg.contains("FallbackDecoder"))
    // a registered decoder that handles the codec clears strict mode
    val ok = Multimodal.extractFeaturesTagged(
      Multimodal.syntheticMp4(spark, 2), dim = 16,
      fallback = Multimodal.mp4Decoder, strict = true).collect()
    assert(ok.length === 2 && ok.forall(_.getString(3) == "fallback"))
  }

  test("sniffCodec names what it cannot decode and what it can") {
    import Multimodal.sniffCodec
    val m = Multimodal.syntheticMedia(spark, 3).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](2)).toMap
    assert(sniffCodec(m(0L)) === "png")
    assert(sniffCodec(m(1L)) === "wav")
    assert(sniffCodec(m(2L)) === "gif")
    assert(sniffCodec("ID3rubbish".getBytes("US-ASCII")) === "mp3")
    assert(sniffCodec(Array[Byte](0xff.toByte, 0xfb.toByte, 0, 0)) === "mp3")
    assert(sniffCodec("fLaCxxxx".getBytes("US-ASCII")) === "flac")
    assert(sniffCodec("OggSxxxx".getBytes("US-ASCII")) === "ogg")
    assert(sniffCodec(Array[Byte](1, 2, 3, 4)) === "unknown")
  }
}
