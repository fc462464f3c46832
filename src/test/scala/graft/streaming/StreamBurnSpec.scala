package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streamed burn rows must land BIT-EQUAL to batch sloBurn on every
  * bucket the stream touched, whatever the slicing; untouched buckets
  * are exactly the batch grid's no-event rows. */
class StreamBurnSpec extends SparkSpec {

  test("streamed burn == batch sloBurn on touched buckets, any slicing") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val bb = graft.registry.Registry.B
    val ee = graft.registry.Registry.E
    val evDf = graft.registry.Tables.events(s, "/root/testdata/sf0.001")
      .select("metric", "time")
    val want = graft.hta.Series.sloBurn(evDf, bb, ee, "error", 4L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5), r.getLong(6),
        if (r.isNullAt(7)) None else Some(r.getLong(7)),
        r.getBoolean(8)))).toMap
    val all = evDf.collect()
      .map(r => StreamBurn.Ev(r.getString(0), r.getLong(1)))
      .filter(ev => ev.time >= bb && ev.time < ee).toSeq
    for (cut <- Seq(0, all.size / 2)) {
      val mem = MemoryStream[StreamBurn.Ev]
      val q = StreamBurn.burn(mem.toDS(), bb, ee, "error", 4L).toDF()
        .writeStream.format("memory").queryName(s"burn_$cut")
        .outputMode("update").start()
      try {
        val (x, y) = all.splitAt(cut)
        if (x.nonEmpty) { mem.addData(x: _*); q.processAllAvailable() }
        if (y.nonEmpty) { mem.addData(y: _*); q.processAllAvailable() }
      } finally q.stop()
      val got = s.table(s"burn_$cut")
        .groupBy("bucket")
        .agg(max_by(struct(col("n_tot"), col("n_err"), col("burn1_e6"),
          col("n_tot_6h"), col("n_err_6h"), col("burn6_e6"), col("page")),
          struct(col("n_tot"), col("n_tot_6h"))).as("r"))
        .collect()
        .map(r => r.getLong(0) -> {
          val x = r.getStruct(1)
          (x.getLong(0), x.getLong(1),
            if (x.isNullAt(2)) None else Some(x.getLong(2)),
            x.getLong(3), x.getLong(4),
            if (x.isNullAt(5)) None else Some(x.getLong(5)),
            x.getBoolean(6))
        }).toMap
      // every streamed bucket agrees with batch bit-for-bit
      for ((bk, v) <- got) assert(want(bk) === v, s"cut=$cut bucket=$bk")
      // the buckets the stream never emitted are exactly the batch
      // rows that never saw an event in their trailing window
      val missing = want.keySet -- got.keySet
      assert(missing.forall(bk => want(bk)._4 == 0L),
        "missing buckets must be 6h-windowless in batch too")
    }
  }

  test("a touched bucket retro-emits the downstream windows it feeds") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[StreamBurn.Ev]
    val hour = 3600000000000L
    val q = StreamBurn.burn(mem.toDS(), 0L, 10L * hour, "error", 4L).toDF()
      .writeStream.format("memory").queryName("burn_retro")
      .outputMode("update").start()
    try {
      // one clean event in bucket 3, then a late ERROR in bucket 1:
      // the late event must re-emit buckets 1..6 (its window reach),
      // flipping bucket 3's 6h counts
      mem.addData(StreamBurn.Ev("ok", 3L * hour + 5L))
      q.processAllAvailable()
      mem.addData(StreamBurn.Ev("error", 1L * hour + 5L))
      q.processAllAvailable()
      val rows = s.table("burn_retro").collect()
        .map(r => (r.getLong(0), r.getLong(5), r.getLong(6)))
      // last emission for bucket 3 carries n_tot_6h = 2 (ok + late error)
      val b3 = rows.filter(_._1 == 3L).maxBy(_._2)
      assert(b3._2 === 2L && b3._3 === 1L)
    } finally q.stop()
  }
}
