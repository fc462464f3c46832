package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamIngest.Sample
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming hysteresis must emit exactly the batch operator's edges, with
  * the alert bit surviving micro-batch boundaries (a slice inside the dead
  * band must NOT re-emit or lose the held state). */
class StreamAlertsSpec extends SparkSpec {

  test("streamed alerts == batch hysteresisAlerts across slicings") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val (hi, lo) = (500L, 200L)
    // m1 crosses up/down with dead-band holds; m2 starts in the band
    val all = Seq(
      Sample("m1", 1L, 6.0), Sample("m1", 2L, 3.5), Sample("m1", 3L, 1.5),
      Sample("m1", 4L, 4.5), Sample("m1", 5L, 7.0), Sample("m1", 6L, 3.0),
      Sample("m1", 7L, 1.0),
      Sample("m2", 1L, 3.0), Sample("m2", 2L, 9.0), Sample("m2", 3L, 2.5))
    val batchDf = all.toDF()
      .select(col("metric"), col("time"),
        round(col("value") * 100, 0).cast("long").as("cents"))
    val batch = graft.hta.Series.hysteresisAlerts(batchDf, 0L, 100L, hi, lo)
      .orderBy("metric", "time").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(batch.nonEmpty)
    for (cut <- Seq(2, 4, 10)) { // cut 4 slices m1 inside the dead band
      val mem = MemoryStream[Sample]
      val q = StreamAlerts.alerts(mem.toDS(), hi, lo).toDF()
        .writeStream.format("memory").queryName(s"al_$cut")
        .outputMode("append").start()
      try {
        val (a, b) = all.sortBy(x => (x.metric, x.time)).splitAt(cut)
        mem.addData(a: _*); q.processAllAvailable()
        if (b.nonEmpty) { mem.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      val got = s.table(s"al_$cut").orderBy("metric", "time").collect()
        .map(r => (r.getAs[String]("metric"), r.getAs[Long]("time"),
          r.getAs[Long]("cents"), r.getAs[Long]("alert"))).toSeq
      assert(got === batch, s"slicing at $cut")
    }
  }

  test("negative half-cent values round HALF_UP like the batch cents column") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // -2.125 * 100 = -212.5: HALF_UP (Spark round) gives -213, which is
    // <= lo and must emit the OFF edge; half-toward-+infinity (-212)
    // would hold in the dead band and diverge from batch
    val all = Seq(Sample("neg", 1L, 6.0), Sample("neg", 2L, -2.125))
    val batchDf = all.toDF().select(col("metric"), col("time"),
      round(col("value") * 100, 0).cast("long").as("cents"))
    val batch = graft.hta.Series.hysteresisAlerts(batchDf, 0L, 100L, 100L, -213L)
      .orderBy("time").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(batch === Seq((1L, 600L, 1L), (2L, -213L, 0L)))
    val mem = MemoryStream[Sample]
    val q = StreamAlerts.alerts(mem.toDS(), 100L, -213L).toDF()
      .writeStream.format("memory").queryName("al_neg")
      .outputMode("append").start()
    try { mem.addData(all: _*); q.processAllAvailable() } finally q.stop()
    val got = s.table("al_neg").orderBy("time").collect()
      .map(r => (r.getAs[Long]("time"), r.getAs[Long]("cents"),
        r.getAs[Long]("alert"))).toSeq
    assert(got === batch)
  }
}
