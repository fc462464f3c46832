package graft.sources

import graft.model.Meta
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.{ByteBuffer, ByteOrder}

/** S5 — one-off ingest converter for the reference's `.hta` binary files
  * (format: src/storage/file/file.hpp:99-101,254-296; header
  * src/storage/file/metric.hpp:53-99). The layout:
  *
  *   8 B  magic  'H','T','A',0x1a,0xc5,0x2c,0xcc,0x1d
  *   8 B  byte-order mark 0xf8f9fafbfcfdfeff (written native-endian — a
  *        little-endian writer produces ff fe fd fc fb fa f9 f8 on disk)
  *   8 B  header size
  *   hdr  v2: version u64, interval i64, period{num u64, den u64},
  *        interval_min i64, interval_factor i64, interval_max i64
  *   data packed records: raw = (i64 time_ns, f64 value) ×16 B;
  *        level = (i64 time_ns, 6×8 B aggregate) ×56 B
  *
  * Conversion runs distributed via the binaryFile source (one task per
  * file = per metric, the natural parallelism of the reference's layout;
  * files > 2 GB would need a byte-range split, noted not needed for the
  * reference's own stores). The on-disk format itself is NOT re-emitted —
  * ingest lands in the parquet warehouse (SURVEY §1.4).
  */
object HtaFormat {

  val Magic: Array[Byte] =
    Array('H'.toByte, 'T'.toByte, 'A'.toByte, 0x1a.toByte,
      0xc5.toByte, 0x2c.toByte, 0xcc.toByte, 0x1d.toByte)
  val ByteOrderMark: Long = 0xf8f9fafbfcfdfeffL

  final case class Preamble(version: Long, interval: Long, periodNum: Long,
                            periodDen: Long, meta: Meta, dataOffset: Int)

  def parsePreamble(bytes: Array[Byte]): Preamble = {
    require(bytes.length >= 24, "truncated .hta preamble")
    require(bytes.take(8).sameElements(Magic), "bad .hta magic bytes")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.position(8)
    require(bb.getLong == ByteOrderMark,
      "byte-order mark mismatch (big-endian writer not supported)")
    val headerSize = bb.getLong.toInt
    val hdr = bb.slice().order(ByteOrder.LITTLE_ENDIAN)
    val version = hdr.getLong
    require(version == 2, s"unsupported .hta version $version (supported: 2)")
    val interval = hdr.getLong
    val num = hdr.getLong; val den = hdr.getLong
    require(num == 1 && den == 1000000000L, "unsupported duration period")
    val imin = hdr.getLong; val ifac = hdr.getLong; val imax = hdr.getLong
    Preamble(version, interval, num, den, Meta(imin, imax, ifac), 24 + headerSize)
  }

  private val rawSchema = StructType(Seq(
    StructField("metric", StringType), StructField("time", LongType),
    StructField("value", DoubleType)))

  private val levelSchema = StructType(Seq(
    StructField("metric", StringType), StructField("interval", LongType),
    StructField("time", LongType), StructField("minimum", DoubleType),
    StructField("maximum", DoubleType), StructField("sum", DoubleType),
    StructField("count", LongType), StructField("integral", DoubleType),
    StructField("active_time", LongType)))

  /** metric name = parent directory name (reference layout: <metric>/raw.hta). */
  private def metricOf(path: String): String = {
    val parts = path.stripSuffix("/").split('/')
    parts(parts.length - 2)
  }

  /** Read all `raw.hta` files under a directory glob into (metric, time, value). */
  def readRaw(spark: SparkSession, glob: String): DataFrame = {
    val files = spark.read.format("binaryFile").load(glob)
      .select("path", "content")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(rawSchema)
    files.mapPartitions { it =>
      it.flatMap { r =>
        val metric = metricOf(r.getString(0))
        val bytes = r.getAs[Array[Byte]](1)
        val pre = parsePreamble(bytes)
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        bb.position(pre.dataOffset)
        val n = (bytes.length - pre.dataOffset) / 16 // torn tail tolerated (§2.8)
        (0 until n).iterator.map { _ => Row(metric, bb.getLong, bb.getDouble) }
      }
    }(enc)
  }

  /** Read `<interval>.hta` level files into the canonical level schema. */
  def readLevels(spark: SparkSession, glob: String): DataFrame = {
    val files = spark.read.format("binaryFile").load(glob)
      .select("path", "content")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(levelSchema)
    files.mapPartitions { it =>
      it.flatMap { r =>
        val metric = metricOf(r.getString(0))
        val bytes = r.getAs[Array[Byte]](1)
        val pre = parsePreamble(bytes)
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        bb.position(pre.dataOffset)
        val n = (bytes.length - pre.dataOffset) / 56
        (0 until n).iterator.map { _ =>
          Row(metric, pre.interval, bb.getLong, bb.getDouble, bb.getDouble,
            bb.getDouble, bb.getLong, bb.getDouble, bb.getLong)
        }
      }
    }(enc)
  }

  /** Test/tooling helper: serialize a raw `.hta` file byte-exactly. */
  def writeRawFile(meta: Meta, points: Seq[(Long, Double)]): Array[Byte] = {
    val headerSize = 56
    val bb = ByteBuffer.allocate(24 + headerSize + 16 * points.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(Magic)
    bb.putLong(ByteOrderMark)
    bb.putLong(headerSize.toLong)
    bb.putLong(2L); bb.putLong(0L) // version; raw interval = 0
    bb.putLong(1L); bb.putLong(1000000000L)
    bb.putLong(meta.intervalMin); bb.putLong(meta.intervalFactor); bb.putLong(meta.intervalMax)
    points.foreach { case (t, v) => bb.putLong(t); bb.putDouble(v) }
    bb.array()
  }
}
