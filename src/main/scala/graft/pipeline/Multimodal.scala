package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.awt.image.BufferedImage

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns with typed metadata, processed by per-partition
  * batch operators.
  *
  * The IMAGE codec is real: `javax.imageio` (JDK built-in — PNG/BMP/JPEG/GIF,
  * zero external dependencies) decodes bytes to pixels; features are a
  * luminance histogram and resize is an exact nearest-neighbor resample
  * re-encoded as PNG. The AUDIO codec is real too: `javax.sound.sampled`
  * (also JDK built-in) decodes WAV/AIFF/AU PCM; features are time-sliced
  * mean amplitudes and [[resampleAudio]] is the resize analogue
  * (nearest-neighbor resample re-encoded as 16-bit mono WAV). The VIDEO
  * codec is real for animated GIF (ImageIO's one multi-frame reader) AND
  * for AVI containers via the built-in RIFF parser ([[parseAvi]]):
  * uncompressed DIB frames decode pixel-exact, MJPEG frames through
  * ImageIO's JPEG reader. Features pool the per-frame luminance histograms
  * and [[framesToImages]] turns sampled frame rows into standalone PNG
  * image rows. Everything else (mp4/webm/…, compressed audio) falls back
  * to the deterministic stub (`fakeDecode`) — the per-kind dispatch marks
  * exactly where a richer decoder plugs in. Every distribution concern (no
  * driver collect, narrow per-partition execution, bounded batch memory)
  * is independent of the codec choice.
  *
  * Scale notes:
  *  - media bytes stay columnar parquet binary; never json/base64;
  *  - decode is a narrow map — no shuffle; co-locate by content-defined
  *    bucketing only if downstream grouping needs it;
  *  - frame sampling multiplies rows, so it runs AFTER any filter pushdown
  *    and BEFORE wide feature extraction.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("mime", StringType))))))

  /** Real image decode via the JDK's ImageIO. None for undecodable bytes —
    * ImageIO returns null when no registered reader matches, and its
    * plugins throw RuntimeExceptions (not just IOException) on corrupt
    * JPEG/PNG structures, so the catch is deliberately wide: untrusted
    * corpus bytes must degrade to the stub, never kill the task. */
  private[pipeline] def decodeImage(bytes: Array[Byte], off: Int = 0, len: Int = -1): Option[BufferedImage] =
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes, off, if (len < 0) bytes.length - off else len)))
    catch { case _: Exception => None }

  /** Image features: `dim`-bin luminance histogram, normalized by pixel
    * count. Integer luminance (BT.601 weights ×1000) keeps the binning
    * platform-exact, so features are bit-reproducible. */
  private[pipeline] def imageFeatures(img: BufferedImage, dim: Int): Array[Float] = {
    val w = img.getWidth; val h = img.getHeight
    val counts = new Array[Long](dim)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        counts((lum * dim) / 256) += 1
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    // INVARIANT (q36 oracle parity): the oracle recomputes c/n in DOUBLE and
    // casts to float32, while this side divides in float — double rounding
    // would diverge only if a true quotient c/n sat EXACTLY on a float
    // midpoint, i.e. c/n = m/2^k with m odd needing k beyond float's 24-bit
    // significand. That requires n's odd part to divide c exactly such that
    // the reduced denominator is a power of two; any pixel count n whose odd
    // part exceeds 1 and does not divide c keeps the quotient off every
    // midpoint, so both rounding routes agree bit-for-bit. If this division
    // or the histogram change, re-derive the argument (IMPLEMENTATION.md
    // "closed-form oracle" note) or q36 fails at driver-verify time.
    counts.map(c => if (n == 0) 0f else c.toFloat / n)
  }

  /** Exact nearest-neighbor resample (manual loop, not Graphics2D — JDK
    * rendering hints vary by platform; integer source indexing doesn't). */
  private[pipeline] def nearestResize(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val sw = img.getWidth; val sh = img.getHeight
    var y = 0
    while (y < h) {
      val sy = (y.toLong * sh / h).toInt
      var x = 0
      while (x < w) {
        out.setRGB(x, y, img.getRGB((x.toLong * sw / w).toInt, sy))
        x += 1
      }
      y += 1
    }
    out
  }

  private[pipeline] def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real audio decode via the JDK's javax.sound.sampled (WAV/AIFF/AU
    * containers; 8/16-bit PCM directly, μ-law/A-law telephony encodings via
    * the JDK's own deterministic table-driven transcode to 16-bit PCM).
    * Returns (sample rate Hz, mono samples on the signed-16-bit scale);
    * multi-channel input is channel-averaged in integer arithmetic so the
    * result is platform-exact. None for bytes no registered reader handles
    * (perceptual codecs, non-audio bytes). */
  private[pipeline] def decodeAudio(bytes: Array[Byte]): Option[(Int, Array[Int])] = {
    import javax.sound.sampled._
    try {
      val ais0 = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      val ais =
        if (ais0.getFormat.getEncoding == AudioFormat.Encoding.ULAW ||
            ais0.getFormat.getEncoding == AudioFormat.Encoding.ALAW) {
          val f = ais0.getFormat
          AudioSystem.getAudioInputStream(
            new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, f.getSampleRate, 16,
              f.getChannels, 2 * f.getChannels, f.getSampleRate, false), ais0)
        } else ais0
      try {
        val fmt = ais.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        val pcm = enc == AudioFormat.Encoding.PCM_SIGNED || enc == AudioFormat.Encoding.PCM_UNSIGNED
        if (!pcm || (bits != 8 && bits != 16)) None
        else {
          val data = ais.readAllBytes()
          val ch = fmt.getChannels
          val bps = bits / 8
          val frameSize = bps * ch
          val unsigned = enc == AudioFormat.Encoding.PCM_UNSIGNED
          val big = fmt.isBigEndian
          val n = data.length / frameSize
          val out = new Array[Int](n)
          var f = 0
          while (f < n) {
            var sum = 0
            var c = 0
            while (c < ch) {
              val off = f * frameSize + c * bps
              val s =
                if (bits == 16) {
                  val b0 = data(off) & 0xff; val b1 = data(off + 1) & 0xff
                  val v = if (big) (b0 << 8) | b1 else (b1 << 8) | b0
                  if (unsigned) v - 32768 else v.toShort.toInt
                } else {
                  // 8-bit WAV is unsigned by convention; scale to 16-bit range
                  if (unsigned) ((data(off) & 0xff) - 128) * 256 else data(off) * 256
                }
              sum += s
              c += 1
            }
            out(f) = sum / ch
            f += 1
          }
          Some((fmt.getSampleRate.toInt, out))
        }
      } finally ais.close()
    } catch { case _: Exception => None } // UnsupportedAudioFileException | IOException
  }

  /** Audio features: `dim` time-sliced mean absolute amplitudes, normalized
    * to [0,1] by 16-bit full scale. Long bin sums + one IEEE division per
    * bin keep features bit-reproducible. */
  private[pipeline] def audioFeatures(samples: Array[Int], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val n = samples.length
    var j = 0
    while (j < dim) {
      val s = (j.toLong * n / dim).toInt
      val e = ((j + 1).toLong * n / dim).toInt
      var sum = 0L
      var i = s
      while (i < e) { sum += math.abs(samples(i)); i += 1 }
      out(j) = if (e == s) 0f else (sum.toDouble / ((e - s).toLong * 32768L)).toFloat
      j += 1
    }
    out
  }

  /** Exact nearest-neighbor resample to a new rate (integer source
    * indexing, same scheme as [[nearestResize]]). */
  private[pipeline] def nearestResample(samples: Array[Int], srcRate: Int, dstRate: Int): Array[Int] = {
    val outN = (samples.length.toLong * dstRate / srcRate).toInt
    val out = new Array[Int](outN)
    var i = 0
    while (i < outN) {
      out(i) = samples((i.toLong * samples.length / outN).toInt)
      i += 1
    }
    out
  }

  /** 16-bit mono little-endian PCM in a WAV container via AudioSystem. */
  private[pipeline] def encodeWav(samples: Array[Int], rateHz: Int): Array[Byte] = {
    import javax.sound.sampled._
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(rateHz.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Real video decode: ImageIO's multi-frame (GIF) reader first, then the
    * built-in RIFF/AVI parser ([[parseAvi]] — uncompressed DIB frames
    * decoded pixel-exact, MJPEG frames via ImageIO's JPEG reader). GIF
    * returns raw frame rasters in index order — no disposal compositing,
    * which is exact for full-frame GIFs (each frame a complete image, the
    * shape a training transcode produces). None when no decoder matches or
    * the stream has no frames. */
  private[pipeline] def decodeVideoFrames(bytes: Array[Byte]): Option[IndexedSeq[BufferedImage]] = {
    val viaImageIO =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis)
              val n = reader.getNumImages(true)
              if (n <= 0) None else Some((0 until n).map(reader.read))
            } finally reader.dispose()
          }
        } finally iis.close()
      } catch { case _: Exception => None }
    viaImageIO.orElse(
      try parseAvi(bytes).map { case (w, h, frames) =>
        // undecodable frames are skipped: histogram pooling tolerates gaps
        // (per-INDEX access is decodeVideoFrame, which keys on container
        // frame numbers — the contract sampleFrames/framesToImages use)
        frames.indices.flatMap(i => decodeAviPayload(bytes, frames(i), w, h))
      }.filter(_.nonEmpty)
      catch { case _: Exception => None })
  }

  /** Single-frame variant for [[framesToImages]]: decodes only frame `idx`
    * (the GIF reader seeks; the AVI parser walks chunk headers and
    * rasterizes only the requested payload). */
  private[pipeline] def decodeVideoFrame(bytes: Array[Byte], idx: Int): Option[BufferedImage] = {
    val viaImageIO =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis)
              if (idx < 0 || idx >= reader.getNumImages(true)) None
              else Some(reader.read(idx))
            } finally reader.dispose()
          }
        } finally iis.close()
      } catch { case _: Exception => None }
    viaImageIO.orElse(
      try parseAvi(bytes).filter(t => idx >= 0 && idx < t._3.length)
        .flatMap { case (w, h, frames) => decodeAviPayload(bytes, frames(idx), w, h) }
      catch { case _: Exception => None })
  }

  // ---------------- RIFF/AVI container (pure JDK, no ImageIO plugin) -----
  //
  // ImageIO ships no AVI reader, but the container is a flat little-endian
  // chunk list — ~60 lines to walk. Covers the two AVI payloads training
  // corpora actually contain: '00db' uncompressed bottom-up BGR DIB
  // (decoded here, pixel-exact) and '00dc' MJPEG (each frame is a complete
  // JPEG — ImageIO decodes it). Anything else still falls to fakeDecode.

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Walk the RIFF tree: returns (width, height, frame payload slices
    * `(offset, length, compressed)` in stream order — slices, not copies,
    * so single-frame decode never materializes the other payloads). The
    * BITMAPINFOHEADER is taken only from the 'strf' that FOLLOWS a 'vids'
    * stream header (an audio stream's 40-byte WAVEFORMATEXTENSIBLE strf
    * must not clobber the video dimensions), frame chunks are taken only
    * from THAT stream's number ('NNdb'/'NNdc' — a second stream must not
    * interleave), and list recursion is depth-bounded (real AVIs nest ~3
    * deep; adversarial nesting must not overflow the stack). None unless
    * the bytes are an AVI with video dimensions and ≥1 frame chunk. */
  private[pipeline] def parseAvi(
      bytes: Array[Byte]): Option[(Int, Int, IndexedSeq[(Int, Int, Boolean)])] =
    try {
      if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "AVI ") None
      else {
        var w = 0; var h = 0
        var inVids = false
        var nStreams = 0
        var vidsIdx = -1 // stream number of the FIRST vids stream (strl order)
        val frames = IndexedSeq.newBuilder[(Int, Int, Boolean)]
        def walk(from: Int, to: Int, depth: Int): Unit = {
          if (depth > 16) return
          var p = from
          while (p + 8 <= to) {
            val id = fourcc(bytes, p)
            val sz = le32(bytes, p + 4)
            if (sz < 0 || p + 8 + sz > to) return // torn chunk: stop, keep parsed frames
            if (id == "LIST") walk(p + 12, p + 8 + sz, depth + 1) // skip the list-type fourcc
            else if (id == "strh" && sz >= 4) {
              inVids = fourcc(bytes, p + 8) == "vids"
              if (inVids && vidsIdx < 0) vidsIdx = nStreams
              nStreams += 1
            }
            else if (id == "strf" && sz >= 40 && inVids && w == 0) {
              w = le32(bytes, p + 8 + 4); h = le32(bytes, p + 8 + 8)
            }
            else if (id.endsWith("db") || id.endsWith("dc")) {
              // only the vids stream's payload chunks: ids are 'NNdb'/'NNdc'
              // with NN the zero-based decimal stream number (strl order) —
              // a second stream's frames (another video track, or a muxer
              // quirk) must not interleave into the primary frame list,
              // where same-sized foreign frames would pool into features
              // and shift container frame indices
              val sid =
                if (id(0).isDigit && id(1).isDigit)
                  (id(0) - '0') * 10 + (id(1) - '0')
                else -1
              // vidsIdx >= 0 keeps malformed non-digit ids (sid = -1) from
              // matching "no vids stream seen yet" (vidsIdx = -1) and
              // admitting junk payloads ahead of the stream headers
              if (sz > 0 && vidsIdx >= 0 && sid == vidsIdx)
                frames += ((p + 8, sz, id.endsWith("dc")))
            }
            p += 8 + sz + (sz & 1) // chunks are word-aligned
          }
        }
        walk(12, math.min(bytes.length, 8 + le32(bytes, 4)), 0)
        val fs = frames.result()
        if (w > 0 && h != 0 && fs.nonEmpty) Some((w, h, fs)) else None
      }
    } catch { case _: Exception => None }

  /** One AVI frame payload slice → image: MJPEG via ImageIO (reading the
    * slice in place), DIB as 24-bit BGR rows padded to 4 bytes (BI_RGB
    * layout; positive biHeight = bottom-up rows, negative = top-down). */
  private def decodeAviPayload(bytes: Array[Byte], frame: (Int, Int, Boolean),
                               w: Int, h: Int): Option[BufferedImage] = {
    val (off, len, compressed) = frame
    if (compressed) decodeImage(bytes, off, len)
    else {
      val hh = math.abs(h)
      val stride = (w * 3 + 3) & ~3
      // Long arithmetic + dimension bound: a crafted strf with a huge width
      // must not overflow the size check into an out-of-bounds rasterize
      if (w <= 0 || hh <= 0 || w > 32768 || hh > 32768 ||
          len.toLong < stride.toLong * hh) None
      else {
        val img = new BufferedImage(w, hh, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < hh) {
          val row = off + (if (h > 0) hh - 1 - y else y) * stride
          var x = 0
          while (x < w) {
            val o = row + 3 * x
            img.setRGB(x, y, ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 1) & 0xff) << 8) | (bytes(o) & 0xff))
            x += 1
          }
          y += 1
        }
        Some(img)
      }
    }
  }

  /** Minimal standard-compliant AVI writer (single 'vids' stream) used by
    * tests/bench: `mjpeg = false` emits uncompressed BI_RGB DIB frames
    * (pixel-exact roundtrip through [[parseAvi]]), `mjpeg = true` emits
    * one complete JPEG per frame ('00dc', ImageIO-encoded). */
  private[pipeline] def encodeAvi(frames: Seq[BufferedImage], fps: Int,
                                  mjpeg: Boolean = false): Array[Byte] = {
    require(frames.nonEmpty, "encodeAvi: at least one frame required")
    val w = frames.head.getWidth; val h = frames.head.getHeight
    val bos = new java.io.ByteArrayOutputStream()
    def le(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if ((body.length & 1) == 1) Array(0.toByte) else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ le(body.length) ++ body ++ pad
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)
    val payloads = frames.map { img =>
      if (mjpeg) {
        val b = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", b)
        b.toByteArray
      } else {
        val stride = (w * 3 + 3) & ~3
        val data = new Array[Byte](stride * h)
        for (y <- 0 until h; x <- 0 until w) {
          val rgb = img.getRGB(x, y)
          val o = (h - 1 - y) * stride + 3 * x
          data(o) = (rgb & 0xff).toByte
          data(o + 1) = ((rgb >> 8) & 0xff).toByte
          data(o + 2) = ((rgb >> 16) & 0xff).toByte
        }
        data
      }
    }
    val cc = if (mjpeg) "00dc" else "00db"
    val handler = if (mjpeg) "MJPG" else "DIB "
    val avih = le(1000000 / fps) ++ le(0) ++ le(0) ++ le(0x10) ++ le(frames.length) ++
      le(0) ++ le(1) ++ le(0) ++ le(w) ++ le(h) ++ le(0) ++ le(0) ++ le(0) ++ le(0)
    val strh = "vids".getBytes("US-ASCII") ++ handler.getBytes("US-ASCII") ++
      le(0) ++ le(0) ++ le(0) ++ le(1) ++ le(fps) ++ le(0) ++ le(frames.length) ++
      le(0) ++ le(-1) ++ le(0) ++ le(0) ++ le(0)
    val strf = le(40) ++ le(w) ++ le(h) ++ Array(1.toByte, 0.toByte, 24.toByte, 0.toByte) ++
      le(if (mjpeg) 0x47504a4d else 0) ++ le(((w * 3 + 3) & ~3) * h) ++
      le(0) ++ le(0) ++ le(0) ++ le(0)
    val hdrl = list("hdrl", chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val moviBody = payloads.map(p => chunk(cc, p)).reduce(_ ++ _)
    val movi = list("movi", moviBody)
    // idx1 so standard players can seek; offsets are relative to 'movi'+4
    var off = 4
    val idxEntries = payloads.map { p =>
      val e = cc.getBytes("US-ASCII") ++ le(0x10) ++ le(off) ++ le(p.length)
      off += 8 + p.length + (p.length & 1)
      e
    }.reduce(_ ++ _)
    val riffBody = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi ++ chunk("idx1", idxEntries)
    bos.write("RIFF".getBytes("US-ASCII")); bos.write(le(riffBody.length)); bos.write(riffBody)
    bos.toByteArray
  }

  /** Video features: the luminance histogram pooled over ALL frames' pixels
    * (same integer binning as [[imageFeatures]], long counts, one IEEE
    * division per bin — bit-reproducible). */
  private[pipeline] def videoFeatures(frames: Seq[BufferedImage], dim: Int): Array[Float] = {
    val counts = new Array[Long](dim)
    var total = 0L
    frames.foreach { img =>
      val w = img.getWidth; val h = img.getHeight
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          counts((lum * dim) / 256) += 1
          x += 1
        }
        y += 1
      }
      total += w.toLong * h
    }
    counts.map(c => if (total == 0) 0f else c.toFloat / total)
  }

  /** STUB decode for bytes no JDK codec can read (mp4/webm video,
    * compressed audio, corrupt media): deterministic pseudo-features from a
    * rolling hash of the bytes. A richer decoder replaces exactly this
    * fallback branch of the per-kind dispatch. */
  private[pipeline] def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
    var j = 0
    while (j < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(j) = ((h >>> 33).toInt % 10000) / 10000.0f
      j += 1
    }
    out
  }

  /** Generic per-partition batch operator: the Scala analogue of
    * `mapInPandas` — batches flow through `f` partition-locally. */
  def mapBatches(df: DataFrame, outSchema: StructType)(f: Iterator[Row] => Iterator[Row]): DataFrame = {
    val spark = df.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions(f)(enc)
  }

  /** The EXTENSION SEAM for media the JDK cannot decode: a caller-supplied
    * fallback tried after the built-in codecs and before [[fakeDecode]].
    * Receives (kind, bytes, dim); returning None falls through to the
    * stub. The function ships to executors, so it must be serializable
    * (a top-level object or a closure over serializable state). This is
    * where a real mp4/webm/MP3 decoder plugs in — no call site changes. */
  type FallbackDecoder = (String, Array[Byte], Int) => Option[Array[Float]]

  /** The default fallback: decline everything (bytes fall to the stub). */
  val noFallback: FallbackDecoder = (_, _, _) => None

  /** Feature extraction: media → (media_id, kind, features). Per-kind
    * dispatch: images (ImageIO), audio (javax.sound.sampled) and video
    * (ImageIO multi-frame GIF) decode for real; bytes no JDK codec reads
    * go to `fallback` ([[FallbackDecoder]], the registered-decoder seam)
    * and only then to the deterministic stub ([[fakeDecode]]). */
  def extractFeatures(media: DataFrame, dim: Int = 64,
                      fallback: FallbackDecoder = noFallback): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    mapBatches(media.select("media_id", "kind", "bytes"), out) { it =>
      it.map { r =>
        val kind = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        def last = fallback(kind, bytes, dim).getOrElse(fakeDecode(bytes, dim))
        val feats = kind match {
          case "image" =>
            decodeImage(bytes).map(imageFeatures(_, dim)).getOrElse(last)
          case "audio" =>
            decodeAudio(bytes).map(t => audioFeatures(t._2, dim)).getOrElse(last)
          case "video" =>
            decodeVideoFrames(bytes).map(videoFeatures(_, dim)).getOrElse(last)
          case _ => last
        }
        Row(r.getLong(0), kind, feats.toSeq)
      }
    }
  }

  /** Image resize: decodable images are nearest-neighbor resampled to
    * (w, h) and re-encoded as PNG (bytes AND meta change); audio/video and
    * undecodable bytes pass through with meta rewritten only — the same
    * row-level contract either way, so downstream operators never branch. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val out = media.select("media_id", "kind", "bytes", "meta").schema
    mapBatches(media.select("media_id", "kind", "bytes", "meta"), out) { it =>
      it.map { r =>
        val kind = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        val meta = r.getStruct(3)
        val decoded = if (kind == "image") decodeImage(bytes) else None
        val (newBytes, mime) = decoded match {
          case Some(img) => (encodePng(nearestResize(img, w, h)), "image/png")
          case None => (bytes, meta.getString(4))
        }
        Row(r.getLong(0), kind, newBytes,
          Row(w, h, meta.get(2), meta.get(3), mime))
      }
    }
  }

  /** Audio resample — the [[resize]] analogue: decodable audio is
    * nearest-neighbor resampled to `rateHz` and re-encoded as 16-bit mono
    * WAV (bytes AND meta change); image/video and undecodable bytes pass
    * through with meta.sample_rate rewritten only — the same row-level
    * contract as resize, so downstream operators never branch. */
  def resampleAudio(media: DataFrame, rateHz: Int): DataFrame = {
    val out = media.select("media_id", "kind", "bytes", "meta").schema
    mapBatches(media.select("media_id", "kind", "bytes", "meta"), out) { it =>
      it.map { r =>
        val kind = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        val meta = r.getStruct(3)
        val decoded = if (kind == "audio") decodeAudio(bytes) else None
        val (newBytes, mime) = decoded match {
          case Some((srcRate, samples)) =>
            (encodeWav(nearestResample(samples, srcRate, rateHz), rateHz), "audio/wav")
          case None => (bytes, meta.getString(4))
        }
        Row(r.getLong(0), kind, newBytes,
          Row(meta.get(0), meta.get(1), rateHz, meta.get(3), mime))
      }
    }
  }

  /** Video frame sampling: one row per sampled frame index — pure row
    * explosion (`sequence`), codegen'd, no data movement of the bytes until
    * the downstream decode touches them. */
  def sampleFrames(media: DataFrame, everyN: Int): DataFrame =
    media.where(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("meta.n_frames") - 1, lit(0)), lit(everyN))))
      .select(col("media_id"), col("frame_idx"), col("bytes"), col("meta"))

  /** Frame extraction: [[sampleFrames]] rows → standalone image rows
    * (kind="image", PNG bytes, image meta) keyed by (media_id, frame_idx),
    * ready for the image operators (resize, extractFeatures). Decodes ONLY
    * the requested frame per row. Frames no reader handles pass through
    * unchanged (still kind="video") — same no-drop row contract as resize,
    * so downstream operators never branch. */
  def framesToImages(frames: DataFrame): DataFrame = {
    val in = frames.select("media_id", "frame_idx", "bytes", "meta")
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("bytes", BinaryType, nullable = false),
      mediaSchema("meta")))
    mapBatches(in, out) { it =>
      it.map { r =>
        val idx = r.getInt(1)
        val bytes = r.getAs[Array[Byte]](2)
        decodeVideoFrame(bytes, idx) match {
          case Some(img) =>
            // re-encode from TYPE_INT_RGB: writing the reader's indexed
            // grayscale image directly makes the PNG encoder run a gray
            // colorspace conversion that is NOT pixel-preserving
            val w = img.getWidth; val h = img.getHeight
            val rgb = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
            rgb.setRGB(0, 0, w, h, img.getRGB(0, 0, w, h, null, 0, w), 0, w)
            Row(r.getLong(0), idx, "image", encodePng(rgb),
              Row(w, h, null, null, "image/png"))
          case None => Row(r.getLong(0), idx, "video", bytes, r.getStruct(3))
        }
      }
    }
  }

  /** Deterministic PNG bytes for image id: pixel (x,y) is a fixed function
    * of (id, x, y). Real images for tests/bench without any media library. */
  private[pipeline] def patternPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id + x) % 256).toInt
        val g = ((id + y) % 256).toInt
        val b = ((id + x.toLong * y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  /** Deterministic WAV bytes for audio id: sample i is a sawtooth whose
    * period and amplitude are fixed functions of id. Real audio for
    * tests/bench without any media library. */
  private[pipeline] def patternWav(id: Long, nSamples: Int, rateHz: Int): Array[Byte] = {
    val period = (id % 50 + 2).toInt
    val amp = (id % 17 + 8).toInt * 1000 // ≤ 24000, inside 16-bit range
    val samples = new Array[Int](nSamples)
    var i = 0
    while (i < nSamples) {
      samples(i) = ((i % period) * 2 * amp / (period - 1)) - amp
      i += 1
    }
    encodeWav(samples, rateHz)
  }

  /** Deterministic animated-GIF bytes for video id: frame f's pixel (x,y)
    * is the grayscale value (id + x + 3y + 7f) mod 256. Frames are indexed
    * grayscale (identity palette) so the GIF round-trips pixel-exact. Real
    * multi-frame video for tests/bench without any media library. */
  private[pipeline] def patternGif(id: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageIO}
    val gray = (0 until 256).map(_.toByte).toArray
    val icm = new java.awt.image.IndexColorModel(8, 256, gray, gray, gray)
    val bos = new java.io.ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.getRaster.setSample(x, y, 0, ((id + x + 3L * y + 7L * f) % 256).toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Synthetic media table for tests/bench: image rows carry REAL PNG
    * bytes, audio rows REAL WAV bytes and video rows REAL animated-GIF
    * bytes (deterministic patterns, decoded by the real codecs
    * end-to-end). Built as a distributed Row RDD — media encoding happens
    * per partition, never on the driver. */
  def syntheticMedia(spark: org.apache.spark.sql.SparkSession, n: Long,
                     imgW: Int = 16, imgH: Int = 12): DataFrame = {
    val rdd = spark.range(n).rdd.map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val bytes = kind match {
        case "image" => patternPng(id, imgW, imgH)
        case "audio" => patternWav(id, nSamples = 480, rateHz = 16000)
        case _ => patternGif(id, imgW, imgH, nFrames = 30)
      }
      val meta = kind match {
        case "image" => Row(imgW, imgH, null, null, "image/png")
        case "audio" => Row(null, null, Int.box(16000), Int.box(480), "audio/wav")
        case _ => Row(imgW, imgH, null, Int.box(30), "image/gif")
      }
      Row(Long.box(id), kind, bytes, meta)
    }
    spark.createDataFrame(rdd, mediaSchema)
  }
}
