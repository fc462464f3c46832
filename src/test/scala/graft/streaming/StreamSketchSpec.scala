package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamSketch.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamSketch.VSample

/** The streamed HLL registers must land BIT-EQUAL to the batch sketch of
  * the same data — same hash, same registers, same zi, same two IEEE ops
  * — whatever the micro-batch slicing. */
class StreamSketchSpec extends SparkSpec {

  test("streamed daily distinct == batch approxDistinct, bit-for-bit") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val day = 86400000000000L
    val rng = new scala.util.Random(11L)
    // two metrics, two days, overlapping user sets + repeats
    val all = (1 to 800).map { _ =>
      Ev(if (rng.nextBoolean()) "m1" else "m2",
        (rng.nextInt(2).toLong * day) + 1000L + rng.nextInt(1000),
        rng.nextInt(300).toLong)
    }
    val batch = graft.pipeline.Sketches.approxDistinct(
        all.toDF("metric", "time", "user")
          .withColumn("day", expr(s"time div ${day}L")),
        Seq("metric", "day"), "user")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    for (cut <- Seq(1, 257, 800)) {
      val mem = MemoryStream[Ev]
      val q = StreamSketch.dailyDistinct(mem.toDS()).toDF()
        .writeStream.format("memory").queryName(s"hll_$cut")
        .outputMode("update").start()
      try {
        val (a, b) = all.splitAt(cut)
        mem.addData(a: _*); q.processAllAvailable()
        if (b.nonEmpty) { mem.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      // last emission per (metric, day) is the settled sketch
      val got = s.table(s"hll_$cut")
        .groupBy("metric", "day")
        .agg(min_by(struct(col("zi"), col("zero_regs"), col("est_raw")),
          col("zi")).as("r"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> {
          val x = r.getStruct(2); (x.getLong(0), x.getLong(1), x.getDouble(2))
        }).toMap
      assert(got === batch, s"slicing at $cut")
    }
  }

  // NOTE: stateTtlMs eviction is deliberately NOT exercised through
  // MemoryStream + processAllAvailable — a query with armed
  // processing-time timeouts keeps scheduling timeout batches under the
  // zero-interval test trigger and processAllAvailable never quiesces
  // (observed hang). The TTL path is three lines (hasTimedOut → remove;
  // setTimeoutDuration after update) and its semantics — evicted days
  // rebuild partial sketches on late data — are documented as the
  // deploy-time trade on the parameter.

  test("a replayed batch raises no register and emits nothing") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val evs = (1 to 50).map(i => Ev("m", 1000L + i, i.toLong % 20))
    val mem = MemoryStream[Ev]
    val q = StreamSketch.dailyDistinct(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("hll_replay")
      .outputMode("update").start()
    try {
      mem.addData(evs: _*); q.processAllAvailable()
      val n1 = s.table("hll_replay").count()
      mem.addData(evs: _*); q.processAllAvailable() // pure replay
      val n2 = s.table("hll_replay").count()
      assert(n1 === 1L && n2 === 1L)
    } finally q.stop()
  }

  test("streamed HDR quantiles == batch hdrQuantiles, bit for bit") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val ev = graft.registry.Tables.events(s, "/root/testdata/sf0.001")
      .select("metric", "cents")
    val want = graft.pipeline.Sketches.hdrQuantiles(
        ev.withColumnRenamed("cents", "v"), Seq("metric"), "v",
        Seq(50, 90, 99)).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val all = ev.collect().map(r => VSample(r.getString(0), r.getLong(1))).toSeq
    for (cut <- Seq(0, all.size / 3)) {
      val mem = MemoryStream[VSample]
      val q = StreamSketch.streamingQuantiles(mem.toDS(), Seq(50, 90, 99))
        .toDF()
        .writeStream.format("memory").queryName(s"hdr_$cut")
        .outputMode("update").start()
      try {
        val (a, b) = all.splitAt(cut)
        if (a.nonEmpty) { mem.addData(a: _*); q.processAllAvailable() }
        if (b.nonEmpty) { mem.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      val got = s.table(s"hdr_$cut")
        .groupBy("metric", "p")
        .agg(max_by(struct(col("q_approx"), col("n")), col("n")).as("r"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> {
          val x = r.getStruct(2); (x.getLong(0), x.getLong(1))
        }).toMap
      assert(got === want, s"cut=$cut")
    }
  }

  test("streamed HDR drops negative samples like the batch filter") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[VSample]
    val q = StreamSketch.streamingQuantiles(mem.toDS(), Seq(50)).toDF()
      .writeStream.format("memory").queryName("hdr_neg")
      .outputMode("update").start()
    try {
      mem.addData(VSample("m", -5L), VSample("m", 10L), VSample("m", 30L))
      q.processAllAvailable()
      val r = s.table("hdr_neg").collect()
      assert(r.length === 1 && r(0).getLong(3) === 2L &&
        r(0).getLong(2) === 10L)
    } finally q.stop()
  }

  test("streamed Count-Min registers == batch countMinRegisters per metric") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rng = new scala.util.Random(17L)
    val all = (1 to 600).map { _ =>
      StreamSketch.CmEv(if (rng.nextBoolean()) "m1" else "m2",
        s"v${rng.nextInt(40)}")
    }
    val batch: Map[String, Map[(Int, Long), Long]] =
      Seq("m1", "m2").map { m =>
        m -> graft.pipeline.Sketches.countMinRegisters(
            all.filter(_.metric == m).map(_.v).toDF("v"), "v",
            depth = 4, width = 32)
          .collect()
          .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      }.toMap
    for (cut <- Seq(1, 211, 600)) {
      val mem = MemoryStream[StreamSketch.CmEv]
      val q = StreamSketch.countMin(mem.toDS(), depth = 4, width = 32).toDF()
        .writeStream.format("memory").queryName(s"cm_$cut")
        .outputMode("update").start()
      try {
        val (a, b) = all.splitAt(cut)
        mem.addData(a: _*); q.processAllAvailable()
        if (b.nonEmpty) { mem.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      // upsert semantics: latest (== max, counts only grow) per cell
      val got = s.table(s"cm_$cut")
        .groupBy("metric", "j", "cell").agg(max("cnt").as("cnt"))
        .collect()
        .map(r => (r.getString(0), (r.getInt(1), r.getLong(2)), r.getLong(3)))
        .groupBy(_._1)
        .map { case (m, rs) => m -> rs.map(t => t._2 -> t._3).toMap }
      assert(got === batch, s"slicing at $cut")
      // point estimate parity on a hot probe: min over depth rows
      val est = (0 until 4).map { j =>
        val cell = java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5")
            .digest(s"v1#$j".getBytes("UTF-8"))
            .map(b => f"$b%02x").mkString.take(15), 16) % 32
        got("m1").getOrElse((j, cell), 0L)
      }.min
      val exact = all.count(e => e.metric == "m1" && e.v == "v1").toLong
      assert(est >= exact, s"CMS must never underestimate (slicing $cut)")
    }
  }
}
