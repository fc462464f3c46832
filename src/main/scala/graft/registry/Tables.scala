package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Requires spark.sql.legacy.parquet.nanosAsLong=true (set by GraftSession /
    * Verify / Bench) so the parquet ns-timestamp column arrives as LongType. */
  def events(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")
      .select(
        col("event_type").as("metric"),
        // ns long, truncated to the µs grid: DuckDB (the oracle engine)
        // coerces parquet ns-timestamps to µs, so oracle-compared queries
        // must agree on the µs-truncated value. pmod keeps the arithmetic
        // in the exact long domain (1.7e18 ns > 2^53 — no float division).
        (col("ts").cast("long") - pmod(col("ts").cast("long"), lit(1000L))).as("time"),
        col("value"),
        round(col("value") * 100, 0).cast("long").as("cents"),
        col("event_id"))

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
