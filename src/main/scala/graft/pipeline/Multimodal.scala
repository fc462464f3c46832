package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns with typed metadata, processed by per-partition
  * batch operators.
  *
  * The Spark-side plumbing here — schema, partition-batched iteration,
  * operator signatures, frame-sample row explosion — is real and tested.
  * The actual media codecs are STUBBED (`fakeDecode`): this container ships
  * no image/audio libraries, so decode produces a deterministic pseudo
  * feature vector derived from the bytes. Swapping in a real decoder means
  * replacing ONLY the function body passed to [[mapBatches]]; every
  * distribution concern (no driver collect, narrow per-partition execution,
  * bounded batch memory) stays as-is.
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

  /** STUB decode: deterministic pseudo-features from the bytes (replaces a
    * real codec; see class doc). dim floats derived from a rolling hash. */
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

  /** Image/audio feature extraction: media → (media_id, kind, features). */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    mapBatches(media.select("media_id", "kind", "bytes"), out) { it =>
      it.map { r =>
        Row(r.getLong(0), r.getString(1), fakeDecode(r.getAs[Array[Byte]](2), dim).toSeq)
      }
    }
  }

  /** Image resize (stub codec): passes bytes through the decode/encode
    * boundary and rewrites meta — the plumbing a real resizer needs. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media
      .withColumn("meta", struct(
        lit(w).as("width"), lit(h).as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.n_frames").as("n_frames"), col("meta.mime").as("mime")))

  /** Video frame sampling: one row per sampled frame index — pure row
    * explosion (`sequence`), codegen'd, no data movement of the bytes until
    * the downstream decode touches them. */
  def sampleFrames(media: DataFrame, everyN: Int): DataFrame =
    media.where(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("meta.n_frames") - 1, lit(0)), lit(everyN))))
      .select(col("media_id"), col("frame_idx"), col("bytes"), col("meta"))

  /** Synthetic media table for tests/bench (no real codecs in container). */
  def syntheticMedia(spark: org.apache.spark.sql.SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("id"), lit(3)) + 1).cast("int")).as("kind"),
      sha2(col("id").cast("string"), 256).cast("binary").as("bytes"),
      struct(lit(64).as("width"), lit(48).as("height"),
        lit(16000).as("sample_rate"), lit(30).as("n_frames"),
        lit("application/octet-stream").as("mime")).as("meta"))
}
