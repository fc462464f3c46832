package graft.registry

import graft.hta.{AggOps, Queries, Scoped, Series, Throttle}
import graft.model.{IntervalScope, Scope}
import graft.pipeline.{Ann, Cdc, Curate, Dedup, Eval, Flac, Joins, Multimodal, Packing, Profile, Qoi, Sampling, Sketches, TextOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Shared._

/** Multimodal plumbing: binary media columns, container probes,
  * decode seams, codec contracts. */
private[registry] object MultimodalEntries {
  val entries: Seq[Entry] = Seq(

    // ---- multimodal plumbing: binary columns + typed meta through resize,
    //      audio resample, frame sampling + frame→image extraction, and
    //      partition-batched feature extraction. Image (ImageIO), audio
    //      (javax.sound.sampled) and video (multi-frame GIF) codecs are
    //      real. DuckDB has no media codecs, but it doesn't need one: the
    //      synthetic media are closed-form patterns (patternPng/Wav/Gif) and
    //      every codec step is an exact integer roundtrip, so the oracle
    //      recomputes the expected features ARITHMETICALLY — generate_series
    //      over pixels/samples, the same integer luminance/resample/binning
    //      math, float32 casts at the same points. A hash match proves the
    //      real encode→decode→feature pipeline is bit-exact end-to-end. ----
    Entry("q36_multimodal",
      (s, _) => {
        val media = Multimodal.syntheticMedia(s, 300)
        val prepped = Multimodal.resampleAudio(Multimodal.resize(media, 32, 32), 8000)
        val feats = Multimodal.extractFeatures(prepped, dim = 16)
          .withColumn("feat_norm",
            sqrt(aggregate(transform(col("features"), x => x.cast("double") * x),
              lit(0.0), (acc, x) => acc + x)))
        val frames = Multimodal.framesToImages(Multimodal.sampleFrames(media, everyN = 10))
          .groupBy("media_id").agg(
            count(when(col("kind") === "image", 1)).as("n_frames_sampled"))
        feats.join(frames, Seq("media_id"), "left")
          .select(col("media_id"), col("kind"), round(col("feat_norm"), 6).as("feat_norm"),
            coalesce(col("n_frames_sampled"), lit(0L)).as("n_frames_sampled"))
          .orderBy("media_id")
      },
      Some {
        // Closed-form recompute of the Spark pipeline, per kind (id % 3):
        //  image (0): patternPng 16×12 → nearest-resize 32×32 (src pixel
        //    (x//2, y*12//32)) → 16-bin integer luminance histogram / 1024;
        //  audio (1): sawtooth patternWav (period=id%50+2, amp=(id%17+8)*1000,
        //    480 samples) → nearest-resample to 240 (sample 2i) → 16 bins of
        //    15 |samples|, sum/ (15·32768) as float32;
        //  video (2): patternGif gray v=(id+x+3y+7f)%256 over 30 16×12
        //    frames → pooled histogram (lum of (v,v,v) is exactly v) / 5760.
        // feat_norm folds f0²..f15² left-to-right in double, matching
        // Spark's aggregate() order; n_frames_sampled = 3 video frames
        // (indices 0,10,20 of 30) decoded to images, else 0.
        val fsel = (0 until 16).map(j => s"max(CASE WHEN bin = $j THEN v END) AS f$j").mkString(", ")
        val sq = (0 until 16).map(j => s"CAST(f$j AS DOUBLE) * f$j").mkString(" + ")
        s"""WITH ids AS (SELECT media_id FROM range(0, 300) t(media_id)),
           |bins AS (SELECT bin FROM range(0, 16) t(bin)),
           |imgv AS (
           |  SELECT media_id, (lum * 16) // 256 AS bin,
           |         CAST(CAST(count(*) AS REAL) / CAST(1024 AS REAL) AS REAL) AS v
           |  FROM (
           |    SELECT i.media_id,
           |           ((((i.media_id + (x.x // 2)) % 256) * 299
           |             + ((i.media_id + ((y.y * 12) // 32)) % 256) * 587
           |             + ((i.media_id + (x.x // 2) * ((y.y * 12) // 32)) % 256) * 114) // 1000) AS lum
           |    FROM ids i, range(0, 32) x(x), range(0, 32) y(y)
           |    WHERE i.media_id % 3 = 0)
           |  GROUP BY 1, 2),
           |audv AS (
           |  SELECT media_id, bin, CAST(CAST(sum(a) AS DOUBLE) / 491520.0 AS REAL) AS v
           |  FROM (
           |    SELECT i.media_id, t.i // 15 AS bin,
           |           abs((((2 * t.i) % (i.media_id % 50 + 2)) * 2 * ((i.media_id % 17 + 8) * 1000))
           |               // ((i.media_id % 50 + 2) - 1) - ((i.media_id % 17 + 8) * 1000)) AS a
           |    FROM ids i, range(0, 240) t(i)
           |    WHERE i.media_id % 3 = 1)
           |  GROUP BY 1, 2),
           |vidv AS (
           |  SELECT media_id, bin, CAST(CAST(count(*) AS REAL) / CAST(5760 AS REAL) AS REAL) AS v
           |  FROM (
           |    SELECT i.media_id,
           |           (((i.media_id + x.x + 3 * y.y + 7 * f.f) % 256) * 16) // 256 AS bin
           |    FROM ids i, range(0, 16) x(x), range(0, 12) y(y), range(0, 30) f(f)
           |    WHERE i.media_id % 3 = 2)
           |  GROUP BY 1, 2),
           |allv AS (SELECT * FROM imgv UNION ALL SELECT * FROM audv UNION ALL SELECT * FROM vidv),
           |fv AS (
           |  SELECT g.media_id, g.bin, coalesce(a.v, CAST(0 AS REAL)) AS v
           |  FROM (SELECT i.media_id, b.bin FROM ids i, bins b) g
           |  LEFT JOIN allv a ON g.media_id = a.media_id AND g.bin = a.bin),
           |fm AS (SELECT media_id, $fsel FROM fv GROUP BY media_id)
           |SELECT media_id,
           |  CASE media_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           |  round(sqrt($sq), 6) AS feat_norm,
           |  CAST(CASE WHEN media_id % 3 = 2 THEN 3 ELSE 0 END AS BIGINT) AS n_frames_sampled
           |FROM fm ORDER BY media_id""".stripMargin
      }),

    // ---- perceptual image hashing: REAL PNG decode → 8×8 nearest-resize →
    //      strict-mean aHash bits packed as two 32-bit halves (overflow-safe
    //      in both engines' BIGINT) + Hamming distance to image 0 via
    //      XOR+popcount. The synthetic images are closed-form patterns, so
    //      the oracle recomputes decode→resize→hash arithmetically,
    //      q36-style: a hash match proves the real codec path bit-exact ----
    Entry("q96_image_ahash",
      (s, _) => {
        val media = Multimodal.syntheticMedia(s, 300)
        val h = Multimodal.imageAHash(media)
        val ref = h.where(col("media_id") === 0)
          .select(col("ahash_hi").as("ref_hi"), col("ahash_lo").as("ref_lo"))
        h.crossJoin(broadcast(ref))
          .select(col("media_id"), col("ahash_hi"), col("ahash_lo"),
            (bit_count(col("ahash_hi").bitwiseXOR(col("ref_hi"))) +
              bit_count(col("ahash_lo").bitwiseXOR(col("ref_lo"))))
              .cast("long").as("hamming"))
          .orderBy("media_id")
      },
      Some(s"""WITH $imageHashCte,
              |r AS (SELECT ahash_hi AS rh, ahash_lo AS rl FROM h WHERE media_id = 0)
              |SELECT h.media_id, h.ahash_hi, h.ahash_lo,
              |  CAST(bit_count(xor(h.ahash_hi, r.rh))
              |       + bit_count(xor(h.ahash_lo, r.rl)) AS BIGINT) AS hamming
              |FROM h, r ORDER BY media_id""".stripMargin)),

    // ---- perceptual image near-dup pairs: 8-block banded aHash
    //      candidates (recall-1 to distance 7) + popcount verify; the
    //      oracle brute-forces all pairs over the closed-form hashes ----
    Entry("q155_image_neardup",
      (s, _) => Multimodal.imageNearDupPairs(
          Multimodal.syntheticMedia(s, 300), maxDist = 6)
        .orderBy("media_a", "media_b"),
      Some(s"""WITH $imageHashCte
              |SELECT a.media_id AS media_a, b.media_id AS media_b,
              |  CAST(bit_count(xor(a.ahash_hi, b.ahash_hi))
              |       + bit_count(xor(a.ahash_lo, b.ahash_lo)) AS BIGINT)
              |    AS hamming
              |FROM h a JOIN h b ON a.media_id < b.media_id
              |WHERE bit_count(xor(a.ahash_hi, b.ahash_hi))
              |      + bit_count(xor(a.ahash_lo, b.ahash_lo)) <= 6
              |ORDER BY 1, 2""".stripMargin)),

    // ---- REAL mp4 decode through the FallbackDecoder seam: every row is
    //      a QuickTime-`raw `-codec mp4 whose sample table Mp4Decoder
    //      demuxes (stsd/stsz/stsc/stco) and rasterizes pixel-exact; the
    //      oracle recomputes the pooled luminance histogram in closed
    //      form from the frame pattern (q36's discipline — a hash match
    //      proves the container parse AND the frame decode bit-exact
    //      end-to-end, not a stub) ----
    Entry("q157_mp4_decode",
      (s, _) => {
        val media = Multimodal.syntheticMp4(s, 200)
        Multimodal.extractFeatures(media, dim = 16,
            fallback = Multimodal.mp4Decoder)
          .withColumn("feat_norm",
            sqrt(aggregate(transform(col("features"), x => x.cast("double") * x),
              lit(0.0), (acc, x) => acc + x)))
          .select(col("media_id"), col("kind"), round(col("feat_norm"), 6).as("feat_norm"))
          .orderBy("media_id")
      },
      Some {
        // frame f pixel (x,y) is gray v=(id+x+3y+7f)%256 over 8 16×12
        // frames; lum of (v,v,v) is exactly v, so the pooled histogram is
        // count/(16·12·8) per 16-wide bin. feat_norm folds f0²..f15²
        // left-to-right in double, matching Spark's aggregate() order.
        val fsel = (0 until 16).map(j => s"max(CASE WHEN bin = $j THEN v END) AS f$j").mkString(", ")
        val sq = (0 until 16).map(j => s"CAST(f$j AS DOUBLE) * f$j").mkString(" + ")
        s"""WITH ids AS (SELECT media_id FROM range(0, 200) t(media_id)),
           |bins AS (SELECT bin FROM range(0, 16) t(bin)),
           |vidv AS (
           |  SELECT media_id, bin,
           |         CAST(CAST(count(*) AS REAL) / CAST(1536 AS REAL) AS REAL) AS v
           |  FROM (
           |    SELECT i.media_id,
           |           (((i.media_id + x.x + 3 * y.y + 7 * f.f) % 256) * 16) // 256 AS bin
           |    FROM ids i, range(0, 16) x(x), range(0, 12) y(y), range(0, 8) f(f))
           |  GROUP BY 1, 2),
           |fv AS (
           |  SELECT g.media_id, g.bin, coalesce(a.v, CAST(0 AS REAL)) AS v
           |  FROM (SELECT i.media_id, b.bin FROM ids i, bins b) g
           |  LEFT JOIN vidv a ON g.media_id = a.media_id AND g.bin = a.bin),
           |fm AS (SELECT media_id, $fsel FROM fv GROUP BY media_id)
           |SELECT media_id, 'video' AS kind, round(sqrt($sq), 6) AS feat_norm
           |FROM fm ORDER BY media_id""".stripMargin
      }),

    // ---- the unsupported-codec CONTRACT, pinned: tagged feature
    //      extraction over a deterministic codec mix — in-JVM codecs tag
    //      `jdk`, demuxable-but-compressed mp4 raw-RGB rides the
    //      registered mp4Decoder as `fallback`, and declared-avc1
    //      containers (structurally valid, undecodable by contract) land
    //      on `stub` with the sniffed codec named. Counts are generator
    //      arithmetic, so the oracle is a VALUES table ----
    Entry("q182_codec_audit",
      (s, _) => {
        val m = Multimodal.syntheticMedia(s, 300)
          .unionByName(Multimodal.syntheticMp4(s, 60)
            .withColumn("media_id", col("media_id") + 1000))
          .unionByName(Multimodal.syntheticMp4Unsupported(s, 30)
            .withColumn("media_id", col("media_id") + 2000))
          // REAL avc1: baseline I_PCM bitstreams the in-JVM H264 subset
          // decoder reconstructs pixel-exactly — same sniffed codec as
          // the junk rows above, split by DECODABILITY in the audit
          .unionByName(Multimodal.syntheticMp4H264(s, 30)
            .withColumn("media_id", col("media_id") + 3000))
          // REAL FLAC: verbatim-subframe streams the in-JVM Flac subset
          // decoder reconstructs sample-exactly through its seam
          .unionByName(Multimodal.syntheticFlac(s, 30)
            .withColumn("media_id", col("media_id") + 4000))
          // REAL FLAC, FIXED+Rice tier (round 14): polynomial-predicted,
          // Rice-partitioned streams — the wild-FLAC family — decoded
          // integer-exactly by the same seam
          .unionByName(Multimodal.syntheticFlacFixed(s, 30)
            .withColumn("media_id", col("media_id") + 5000))
          // REAL FLAC, general-LPC + stereo-decorrelated tiers (round 14
          // second wave): quantized-coefficient prediction and the three
          // channel assignments, same seam, same integer exactness
          .unionByName(Multimodal.syntheticFlacLpc(s, 30)
            .withColumn("media_id", col("media_id") + 6000))
          .unionByName(Multimodal.syntheticFlacStereo(s, 30)
            .withColumn("media_id", col("media_id") + 7000))
          // REAL QOI images: fully-algorithmic format, decoded
          // pixel-exactly through the same seam
          .unionByName(Multimodal.syntheticQoi(s, 30)
            .withColumn("media_id", col("media_id") + 8000))
        Multimodal.extractFeaturesTagged(m, dim = 16,
            fallback = Multimodal.chainFallbacks(
              Multimodal.chainFallbacks(Multimodal.mp4Decoder,
                Flac.flacDecoder), Qoi.qoiDecoder))
          .groupBy("kind", "codec", "decoder").agg(count(lit(1)).as("n"))
          .orderBy("kind", "codec", "decoder")
      },
      Some("""SELECT * FROM (VALUES
             |  ('audio', 'flac',     'fallback', CAST(120 AS BIGINT)),
             |  ('audio', 'wav',      'jdk',      CAST(100 AS BIGINT)),
             |  ('image', 'png',      'jdk',      CAST(100 AS BIGINT)),
             |  ('image', 'qoi',      'fallback', CAST(30 AS BIGINT)),
             |  ('video', 'gif',      'jdk',      CAST(100 AS BIGINT)),
             |  ('video', 'mp4/avc1', 'fallback', CAST(30 AS BIGINT)),
             |  ('video', 'mp4/avc1', 'stub',     CAST(30 AS BIGINT)),
             |  ('video', 'mp4/raw',  'fallback', CAST(60 AS BIGINT))
             |) AS t(kind, codec, decoder, n)
             |ORDER BY kind, codec, decoder""".stripMargin)),

    // ---- FLAC decode pinned ARITHMETICALLY (the q36/q157 discipline):
    //      the sawtooth is closed-form, the verbatim/constant subframes
    //      reconstruct it exactly, so the oracle recomputes the pooled
    //      |amplitude| features from the generator arithmetic — a hash
    //      match proves encode → framing/CRC → decode → features is
    //      bit-exact end-to-end, not merely that rows counted ----
    Entry("q185_flac_features",
      (s, _) => Multimodal.extractFeatures(
          Multimodal.syntheticFlac(s, 300), dim = 16,
          fallback = Flac.flacDecoder)
        .withColumn("feat_norm",
          sqrt(aggregate(transform(col("features"), x => x.cast("double") * x),
            lit(0.0), (acc, x) => acc + x)))
        .select(col("media_id"), col("kind"),
          round(col("feat_norm"), 6).as("feat_norm"))
        .orderBy("media_id"),
      Some {
        // 480 samples of ((i%p)·2·amp)//(p−1) − amp (p = id%50+2,
        // amp = (id%17+8)·1000), 16 bins of 30 |samples| each,
        // v = Σ|a| / (30·32768) as float32; feat_norm folds f0²..f15²
        // left-to-right in double, matching Spark's aggregate() order
        val fsel = (0 until 16).map(j => s"max(CASE WHEN bin = $j THEN v END) AS f$j").mkString(", ")
        val sq = (0 until 16).map(j => s"CAST(f$j AS DOUBLE) * f$j").mkString(" + ")
        s"""WITH ids AS (SELECT media_id FROM range(0, 300) t(media_id)),
           |bins AS (SELECT bin FROM range(0, 16) t(bin)),
           |audv AS (
           |  SELECT media_id, bin, CAST(CAST(sum(a) AS DOUBLE) / 983040.0 AS REAL) AS v
           |  FROM (
           |    SELECT i.media_id, t.i // 30 AS bin,
           |           abs(((t.i % (i.media_id % 50 + 2)) * 2 * ((i.media_id % 17 + 8) * 1000))
           |               // ((i.media_id % 50 + 2) - 1) - ((i.media_id % 17 + 8) * 1000)) AS a
           |    FROM ids i, range(0, 480) t(i))
           |  GROUP BY 1, 2),
           |fv AS (
           |  SELECT g.media_id, g.bin, coalesce(a.v, CAST(0 AS REAL)) AS v
           |  FROM (SELECT i.media_id, b.bin FROM ids i, bins b) g
           |  LEFT JOIN audv a ON g.media_id = a.media_id AND g.bin = a.bin),
           |fm AS (SELECT media_id, $fsel FROM fv GROUP BY media_id)
           |SELECT media_id, 'audio' AS kind, round(sqrt($sq), 6) AS feat_norm
           |FROM fm ORDER BY media_id""".stripMargin
      }),

    // ---- the q185 arithmetic pin over the FIXED+Rice tier: identical
    //      sawtooth samples, encoded with order-(id%5) predictors and
    //      2^(id%3) Rice partitions instead of verbatim frames — the
    //      SAME closed-form oracle, so a hash match proves the
    //      predict/Rice/escape decode path is bit-exact end-to-end ----
    Entry("q189_flac_fixed",
      (s, _) => Multimodal.extractFeatures(
          Multimodal.syntheticFlacFixed(s, 300), dim = 16,
          fallback = Flac.flacDecoder)
        .withColumn("feat_norm",
          sqrt(aggregate(transform(col("features"), x => x.cast("double") * x),
            lit(0.0), (acc, x) => acc + x)))
        .select(col("media_id"), col("kind"),
          round(col("feat_norm"), 6).as("feat_norm"))
        .orderBy("media_id"),
      Some {
        val fsel = (0 until 16).map(j => s"max(CASE WHEN bin = $j THEN v END) AS f$j").mkString(", ")
        val sq = (0 until 16).map(j => s"CAST(f$j AS DOUBLE) * f$j").mkString(" + ")
        s"""WITH ids AS (SELECT media_id FROM range(0, 300) t(media_id)),
           |bins AS (SELECT bin FROM range(0, 16) t(bin)),
           |audv AS (
           |  SELECT media_id, bin, CAST(CAST(sum(a) AS DOUBLE) / 983040.0 AS REAL) AS v
           |  FROM (
           |    SELECT i.media_id, t.i // 30 AS bin,
           |           abs(((t.i % (i.media_id % 50 + 2)) * 2 * ((i.media_id % 17 + 8) * 1000))
           |               // ((i.media_id % 50 + 2) - 1) - ((i.media_id % 17 + 8) * 1000)) AS a
           |    FROM ids i, range(0, 480) t(i))
           |  GROUP BY 1, 2),
           |fv AS (
           |  SELECT g.media_id, g.bin, coalesce(a.v, CAST(0 AS REAL)) AS v
           |  FROM (SELECT i.media_id, b.bin FROM ids i, bins b) g
           |  LEFT JOIN audv a ON g.media_id = a.media_id AND g.bin = a.bin),
           |fm AS (SELECT media_id, $fsel FROM fv GROUP BY media_id)
           |SELECT media_id, 'audio' AS kind, round(sqrt($sq), 6) AS feat_norm
           |FROM fm ORDER BY media_id""".stripMargin
      }),

    // ---- the q185 pin over the GENERAL-LPC tier: same sawtooth, encoded
    //      with quantized integer coefficient sets (orders 1-3, shifts
    //      0-1 rotating by id) — exactness is predictor-independent, so
    //      the verbatim oracle applies unchanged ----
    Entry("q191_flac_lpc",
      (s, _) => Multimodal.extractFeatures(
          Multimodal.syntheticFlacLpc(s, 300), dim = 16,
          fallback = Flac.flacDecoder)
        .withColumn("feat_norm",
          sqrt(aggregate(transform(col("features"), x => x.cast("double") * x),
            lit(0.0), (acc, x) => acc + x)))
        .select(col("media_id"), col("kind"),
          round(col("feat_norm"), 6).as("feat_norm"))
        .orderBy("media_id"),
      Some {
        val fsel = (0 until 16).map(j => s"max(CASE WHEN bin = $j THEN v END) AS f$j").mkString(", ")
        val sq = (0 until 16).map(j => s"CAST(f$j AS DOUBLE) * f$j").mkString(" + ")
        s"""WITH ids AS (SELECT media_id FROM range(0, 300) t(media_id)),
           |bins AS (SELECT bin FROM range(0, 16) t(bin)),
           |audv AS (
           |  SELECT media_id, bin, CAST(CAST(sum(a) AS DOUBLE) / 983040.0 AS REAL) AS v
           |  FROM (
           |    SELECT i.media_id, t.i // 30 AS bin,
           |           abs(((t.i % (i.media_id % 50 + 2)) * 2 * ((i.media_id % 17 + 8) * 1000))
           |               // ((i.media_id % 50 + 2) - 1) - ((i.media_id % 17 + 8) * 1000)) AS a
           |    FROM ids i, range(0, 480) t(i))
           |  GROUP BY 1, 2),
           |fv AS (
           |  SELECT g.media_id, g.bin, coalesce(a.v, CAST(0 AS REAL)) AS v
           |  FROM (SELECT i.media_id, b.bin FROM ids i, bins b) g
           |  LEFT JOIN audv a ON g.media_id = a.media_id AND g.bin = a.bin),
           |fm AS (SELECT media_id, $fsel FROM fv GROUP BY media_id)
           |SELECT media_id, 'audio' AS kind, round(sqrt($sq), 6) AS feat_norm
           |FROM fm ORDER BY media_id""".stripMargin
      }),

    // ---- stereo-decorrelated FLAC, arithmetically pinned: left = the
    //      sawtooth, right = left + (i%2), assignment rotating L/S, R/S,
    //      M/S by id. The decoder's mono mix is trunc((l+r)/2), i.e.
    //      l + 1 exactly when i is odd AND l < 0 (Java int division
    //      truncates toward zero) — the oracle reproduces that rounding,
    //      so the hash pins the three inverse reconstructions AND the
    //      17-bit side-channel read end-to-end ----
    Entry("q192_flac_stereo",
      (s, _) => Multimodal.extractFeatures(
          Multimodal.syntheticFlacStereo(s, 300), dim = 16,
          fallback = Flac.flacDecoder)
        .withColumn("feat_norm",
          sqrt(aggregate(transform(col("features"), x => x.cast("double") * x),
            lit(0.0), (acc, x) => acc + x)))
        .select(col("media_id"), col("kind"),
          round(col("feat_norm"), 6).as("feat_norm"))
        .orderBy("media_id"),
      Some {
        val fsel = (0 until 16).map(j => s"max(CASE WHEN bin = $j THEN v END) AS f$j").mkString(", ")
        val sq = (0 until 16).map(j => s"CAST(f$j AS DOUBLE) * f$j").mkString(" + ")
        s"""WITH ids AS (SELECT media_id FROM range(0, 300) t(media_id)),
           |bins AS (SELECT bin FROM range(0, 16) t(bin)),
           |audv AS (
           |  SELECT media_id, bin, CAST(CAST(sum(a) AS DOUBLE) / 983040.0 AS REAL) AS v
           |  FROM (
           |    SELECT media_id, i // 30 AS bin,
           |           abs(CASE WHEN i % 2 = 1 AND raw < 0 THEN raw + 1 ELSE raw END) AS a
           |    FROM (
           |      SELECT i.media_id, t.i,
           |             ((t.i % (i.media_id % 50 + 2)) * 2 * ((i.media_id % 17 + 8) * 1000))
           |               // ((i.media_id % 50 + 2) - 1) - ((i.media_id % 17 + 8) * 1000) AS raw
           |      FROM ids i, range(0, 480) t(i)))
           |  GROUP BY 1, 2),
           |fv AS (
           |  SELECT g.media_id, g.bin, coalesce(a.v, CAST(0 AS REAL)) AS v
           |  FROM (SELECT i.media_id, b.bin FROM ids i, bins b) g
           |  LEFT JOIN audv a ON g.media_id = a.media_id AND g.bin = a.bin),
           |fm AS (SELECT media_id, $fsel FROM fv GROUP BY media_id)
           |SELECT media_id, 'audio' AS kind, round(sqrt($sq), 6) AS feat_norm
           |FROM fm ORDER BY media_id""".stripMargin
      }),

    // ---- QOI decode pinned ARITHMETICALLY: the patternPng pixel grid
    //      encoded as QOI (fully algorithmic format - no subset caveat),
    //      decoded through the fallback seam; the oracle recomputes the
    //      16-bin integer-luminance histogram from the generator
    //      arithmetic over the 64x48 grid ----
    Entry("q195_qoi_features",
      (s, _) => Multimodal.extractFeatures(
          Multimodal.syntheticQoi(s, 300), dim = 16,
          fallback = Qoi.qoiDecoder)
        .withColumn("feat_norm",
          sqrt(aggregate(transform(col("features"), x => x.cast("double") * x),
            lit(0.0), (acc, x) => acc + x)))
        .select(col("media_id"), col("kind"),
          round(col("feat_norm"), 6).as("feat_norm"))
        .orderBy("media_id"),
      Some {
        val fsel = (0 until 16).map(j => s"max(CASE WHEN bin = $j THEN v END) AS f$j").mkString(", ")
        val sq = (0 until 16).map(j => s"CAST(f$j AS DOUBLE) * f$j").mkString(" + ")
        s"""WITH ids AS (SELECT media_id FROM range(0, 300) t(media_id)),
           |bins AS (SELECT bin FROM range(0, 16) t(bin)),
           |imgv AS (
           |  SELECT media_id, (lum * 16) // 256 AS bin,
           |         CAST(CAST(count(*) AS REAL) / CAST(3072 AS REAL) AS REAL) AS v
           |  FROM (
           |    SELECT i.media_id,
           |           ((((i.media_id + x.x) % 256) * 299
           |             + ((i.media_id + y.y) % 256) * 587
           |             + ((i.media_id + x.x * y.y) % 256) * 114) // 1000) AS lum
           |    FROM ids i, range(0, 64) x(x), range(0, 48) y(y))
           |  GROUP BY 1, 2),
           |fv AS (
           |  SELECT g.media_id, g.bin, coalesce(a.v, CAST(0 AS REAL)) AS v
           |  FROM (SELECT i.media_id, b.bin FROM ids i, bins b) g
           |  LEFT JOIN imgv a ON g.media_id = a.media_id AND g.bin = a.bin),
           |fm AS (SELECT media_id, $fsel FROM fv GROUP BY media_id)
           |SELECT media_id, 'image' AS kind, round(sqrt($sq), 6) AS feat_norm
           |FROM fm ORDER BY media_id""".stripMargin
      })
  )
}
