package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical views over the driver's testdata (TESTDATA.md).
  *
  * The `events` table is mapped onto the HTA data model
  * (reference include/hta/types.hpp:43-49): metric = event_type,
  * time = int64 POSIX **nanoseconds** (never TimestampType — Spark timestamps
  * are µs and the engine is ns-exact), value = double.
  *
  * `cents = round(value*100)` is an exact integer encoding of the 2-decimal
  * event values; registry queries aggregate in the integer domain so the
  * DuckDB oracle comparison is bit-exact (float summation order differs
  * between engines and would otherwise flip low-order bits).
  */
object Tables {

  /** `ts` → int64 POSIX ns on the µs grid, adapting to either testdata
    * vintage. Older driver data wrote int64-ns (arriving as LongType under
    * `nanosAsLong`); current data writes `timestamp[us]` (TIMESTAMP_NTZ).
    * Both land on the identical µs-grid ns value the oracle computes with
    * `epoch_us(ts)*1000`:
    *  - LongType: truncate ns → µs grid via pmod (exact long arithmetic —
    *    1.7e18 ns > 2^53, no float division);
    *  - timestamp: `unix_micros * 1000` (already µs precision). The NTZ →
    *    timestamp cast is wall-clock-preserving only under the UTC session
    *    timezone, which GraftSession/Verify/Bench all pin. */
  def tsNs(df: DataFrame): Column = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType =>
      col("ts") - pmod(col("ts"), lit(1000L))
    case _ =>
      unix_micros(col("ts").cast("timestamp")) * lit(1000L)
  }

  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.select(
      col("event_type").as("metric"),
      tsNs(raw).as("time"),
      col("value"),
      round(col("value") * 100, 0).cast("long").as("cents"),
      col("event_id"))
  }

  def documents(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  def embeddings(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** DuckDB-side equivalent of [[events]], as a CTE body.
    * `epoch_us(ts)*1000` (not epoch_ns) so the µs-grid time is identical
    * whether the oracle engine coerces parquet ns-timestamps to µs (DuckDB
    * ≤1.0) or keeps native TIMESTAMP_NS (newer versions). */
  val ptsCte: String =
    """pts AS (
      |  SELECT event_type AS metric, epoch_us(ts)*1000 AS time, value,
      |         CAST(round(value*100) AS BIGINT) AS cents, event_id
      |  FROM events
      |)""".stripMargin
}
