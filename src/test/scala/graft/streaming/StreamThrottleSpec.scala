package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamIngest.Sample
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming throttle must keep exactly the samples the batch fold keeps,
  * with the cooldown cursor surviving micro-batch boundaries. */
class StreamThrottleSpec extends SparkSpec {

  test("streamed throttle == batch throttle across micro-batch slicings") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val cd = 5L
    // two metrics interleaved; m1 dense (most samples throttled), m2 sparse
    val all = (1L to 40L).map(t => Sample("m1", t, t * 1.0)) ++
      Seq(1L, 20L, 21L, 40L).map(t => Sample("m2", t, -t * 1.0))
    val batch = graft.hta.Throttle
      .throttle(all.toDF(), cd).orderBy("metric", "time").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    for (cut <- Seq(1, 13, 40)) { // slice mid-cooldown; state must carry over
      val mem = MemoryStream[Sample]
      val q = StreamThrottle.throttled(mem.toDS(), cd).toDF()
        .writeStream.format("memory").queryName(s"thr_$cut")
        .outputMode("append").start()
      try {
        val (a, b) = all.sortBy(x => (x.metric, x.time)).splitAt(cut)
        mem.addData(a: _*); q.processAllAvailable()
        if (b.nonEmpty) { mem.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      val got = s.table(s"thr_$cut").orderBy("metric", "time").collect()
        .map(r => (r.getAs[String]("metric"), r.getAs[Long]("time"),
          r.getAs[Double]("value"))).toSeq
      assert(got === batch, s"slicing at $cut")
    }
  }
}
