package graft.streaming

import graft.streaming.StreamIngest.Sample
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Stream-stream event-time join — the live form of
  * [[graft.hta.Queries.intervalJoin]]: every left sample paired with the
  * right-stream samples of the same metric inside
  * `[l.time − before, l.time + after]`.
  *
  * This tier deliberately rides Spark's NATIVE stream-stream inner join
  * (state store + watermark eviction built in) instead of another
  * flatMapGroupsWithState: the engine buffers each side keyed by (metric,
  * event-time), and the watermark delay bounds state to the join horizon —
  * the exact machinery the brief's "Structured Streaming for streams"
  * tier exists for.
  *
  * Times are ns longs; Spark's state cleanup needs the range condition on
  * WATERMARKED TIMESTAMP columns, so each side derives a µs-grid
  * `timestamp_micros(time div 1000)` event-time column. The coarse
  * timestamp window is widened by 1 µs on each side (truncation-safe
  * superset) and the EXACT ns predicate on the long columns decides
  * membership — µs-unaligned times cannot lose or gain a pair.
  *
  * Output (append mode): (metric, l_time, l_value, r_time, r_value), one
  * row per qualifying pair, emitted once both sides have passed the
  * watermark gate. Watermark delay also sets the reordering tolerance.
  */
object StreamJoin {

  def intervalJoin(left: Dataset[Sample], right: Dataset[Sample],
                   beforeNs: Long, afterNs: Long,
                   watermarkDelayNs: Long = 0L): DataFrame = {
    require(beforeNs >= 0 && afterNs >= 0,
      s"need before/after >= 0, got $beforeNs/$afterNs")
    val delayUs = watermarkDelayNs / 1000
    val befUs = beforeNs / 1000 + 1
    val aftUs = afterNs / 1000 + 1
    val l = left.toDF()
      .select(col("metric"), col("time").as("l_time"),
        col("value").as("l_value"))
      .withColumn("l_ts", timestamp_micros(expr("l_time div 1000")))
      .withWatermark("l_ts", s"$delayUs microseconds")
    val r = right.toDF()
      .select(col("metric").as("r_metric"), col("time").as("r_time"),
        col("value").as("r_value"))
      .withColumn("r_ts", timestamp_micros(expr("r_time div 1000")))
      .withWatermark("r_ts", s"$delayUs microseconds")
    l.join(r,
        col("metric") === col("r_metric") &&
          // coarse µs bounds drive state eviction (superset of the exact
          // window); the ns predicate is the real membership test
          col("r_ts") >= col("l_ts") - expr(s"INTERVAL '$befUs' MICROSECOND") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL '$aftUs' MICROSECOND") &&
          col("r_time") >= col("l_time") - beforeNs &&
          col("r_time") <= col("l_time") + afterNs)
      .select(col("metric"), col("l_time"), col("l_value"),
        col("r_time"), col("r_value"))
  }

  /** Closed interval [st, en] in ns — the streaming overlap join's row. */
  final case class Interval(id: Long, st: Long, en: Long)

  /** Streaming tier of [[graft.pipeline.Joins.overlapJoin]]: live
    * interval×interval overlap pairs (sessions co-active right now, spans
    * colliding as they land) over Spark's native stream-stream inner join.
    *
    * Same banding decomposition as the batch operator — each interval
    * explodes over the `bandNs`-wide bands it touches, the join is an
    * EQUI-join on the band, the exact ns predicate decides overlap, and
    * the canonical `band == floorDiv(max(sa, sb), band)` rule emits each
    * pair exactly once. The band START doubles as the watermarked
    * event-time join key (µs-aligned by the `bandNs % 1000 == 0`
    * requirement, so the timestamp is exact), which is what lets the
    * symmetric hash join EVICT a band's buffered rows once the watermark
    * passes it — state is bounded by (bands inside the horizon) ×
    * (intervals per band), never the full history.
    *
    * Bands here are computed with exact integer floorDiv on BOTH the
    * explode side (Math.floorDiv) and the canonical-emission side (a
    * div/mod rendering of floor division) — the batch tier's monotone
    * double-floor argument doesn't carry across two INDEPENDENT code
    * paths, where an ulp of disagreement near 2^53 could silently drop a
    * pair rather than shift its emission band.
    *
    * `maxBands` fails loudly on runaway intervals (an unclosed session
    * would otherwise explode without bound — the
    * [[graft.hta.Queries.intervalJoin]] maxTiles discipline).
    *
    * Output (append mode): (ida, sa, ea, idb, sb, eb), one row per
    * overlapping pair once both bands clear the watermark. For a
    * self-join pass the same stream twice with `cond` ordering the ids. */
  def overlapJoin(a: Dataset[Interval], b: Dataset[Interval], bandNs: Long,
                  watermarkDelayNs: Long = 0L, maxBands: Int = 1000,
                  cond: Column = lit(true)): DataFrame = {
    require(bandNs > 0 && bandNs % 1000 == 0,
      s"bandNs must be a positive multiple of 1000 (µs-aligned), got $bandNs")
    val delayUs = watermarkDelayNs / 1000
    def banded(ds: Dataset[Interval], idc: String, stc: String, enc: String,
               bandc: String, tsc: String): DataFrame = {
      val spark = ds.sparkSession
      import spark.implicits._
      ds.flatMap { iv =>
        require(iv.en >= iv.st, s"overlapJoin: interval end < start: $iv")
        val b0 = Math.floorDiv(iv.st, bandNs)
        val b1 = Math.floorDiv(iv.en, bandNs)
        require(b1 - b0 < maxBands,
          s"overlapJoin: interval spans ${b1 - b0 + 1} bands of $bandNs ns " +
            s"(> $maxBands): $iv")
        (b0 to b1).map(bi => (iv.id, iv.st, iv.en, bi))
      }.toDF(idc, stc, enc, bandc)
        .withColumn(tsc, timestamp_micros(col(bandc) * lit(bandNs / 1000)))
        .withWatermark(tsc, s"$delayUs microseconds")
    }
    val l = banded(a, "ida", "sa", "ea", "a_band", "a_ts")
    val r = banded(b, "idb", "sb", "eb", "b_band", "b_ts")
    // exact long floor division: div truncates toward zero; a negative
    // remainder means the true floor is one below
    val canonical = expr(
      s"a_band = (greatest(sa, sb) div ${bandNs}L) - " +
        s"(CASE WHEN greatest(sa, sb) % ${bandNs}L < 0 THEN 1 ELSE 0 END)")
    l.join(r,
        col("a_band") === col("b_band") &&
          // the watermarked-column range condition drives state eviction;
          // band equality already implies equal band timestamps
          col("b_ts") >= col("a_ts") - expr("INTERVAL '1' MICROSECOND") &&
          col("b_ts") <= col("a_ts") + expr("INTERVAL '1' MICROSECOND") &&
          col("sa") <= col("eb") && col("sb") <= col("ea") &&
          canonical && cond)
      .select("ida", "sa", "ea", "idb", "sb", "eb")
  }
}
