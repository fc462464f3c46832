package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streamed trend accumulators must land BIT-EQUAL to batch
  * linearTrend over the same samples, whatever the slicing. */
class StreamTrendSpec extends SparkSpec {

  private val b = tp(0)
  private val e = tp(1000)
  private val step = 10L * S

  test("streamed trend == batch linearTrend on sf0.001 events, any slicing") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val ev = graft.registry.Tables.events(s, "/root/testdata/sf0.001")
      .select("metric", "time", "cents")
    // run both over the events' own [B, E) window
    val bb = graft.registry.Registry.B
    val ee = graft.registry.Registry.E
    val st = 3600000000000L
    val want = graft.hta.Series.linearTrend(ev, bb, ee, st).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6))))).toMap
    val all = ev.collect()
      .map(r => StreamTrend.Pt(r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    for (cut <- Seq(0, all.size / 2)) {
      val mem = MemoryStream[StreamTrend.Pt]
      val q = StreamTrend.trend(mem.toDS(), bb, ee, st).toDF()
        .writeStream.format("memory").queryName(s"tr_$cut")
        .outputMode("update").start()
      try {
        val (x, y) = all.splitAt(cut)
        if (x.nonEmpty) { mem.addData(x: _*); q.processAllAvailable() }
        if (y.nonEmpty) { mem.addData(y: _*); q.processAllAvailable() }
      } finally q.stop()
      val got = s.table(s"tr_$cut")
        .groupBy("metric")
        .agg(max_by(struct(col("n"), col("sum_x"), col("sum_y"),
          col("sxy_num"), col("sxx_num"), col("slope_cents_per_step")),
          col("n")).as("r"))
        .collect()
        .map(r => r.getString(0) -> {
          val x = r.getStruct(1)
          (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
            x.getLong(4),
            if (x.isNullAt(5)) None else Some(x.getDouble(5)))
        }).toMap
      assert(got === want, s"cut=$cut")
    }
  }

  test("out-of-window samples are dropped; degenerate slope is NULL") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[StreamTrend.Pt]
    val q = StreamTrend.trend(mem.toDS(), b, e, step).toDF()
      .writeStream.format("memory").queryName("tr_edge")
      .outputMode("update").start()
    try {
      mem.addData(StreamTrend.Pt("m", b - 1, 100L),  // before window
        StreamTrend.Pt("m", e, 100L),                // at end — excluded
        StreamTrend.Pt("m", b + 1, 40L),
        StreamTrend.Pt("m", b + 2, 60L))             // same bucket as prior
      q.processAllAvailable()
      val r = s.table("tr_edge").collect()
      assert(r.length === 1)
      assert(r(0).getLong(1) === 2L, "only the two in-window samples")
      assert(r(0).getLong(5) === 0L && r(0).isNullAt(6),
        "one bucket → NULL slope")
    } finally q.stop()
  }
}
