package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamIngest.Sample
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-stream interval join must emit exactly the batch pair set —
  * every (left, right) pair of the same metric within the time window,
  * exactly once, regardless of how the two streams are micro-batch
  * sliced. */
class StreamJoinSpec extends SparkSpec {

  // realistic epoch offsets: a µs-truncated event time of exactly epoch 0
  // is indistinguishable from the INITIAL watermark and Spark drops it as
  // late — times this close to 1970 don't occur in real series
  private val O = 1519130000L * 1000000000L
  private val lefts = Seq(
    Sample("m1", O + 1000L, 1.0), Sample("m1", O + 5000L, 2.0),
    Sample("m1", O + 9000L, 3.0), Sample("m2", O + 2000L, 4.0))
  private val rights = Seq(
    Sample("m1", O + 900L, 10.0), Sample("m1", O + 1400L, 11.0),
    Sample("m1", O + 5600L, 12.0), Sample("m1", O + 9000L, 13.0),
    Sample("m2", O + 2500L, 14.0), Sample("m2", O + 9999L, 15.0))

  private def brute(before: Long, after: Long): Seq[(String, Long, Double, Long, Double)] =
    (for {
      l <- lefts
      r <- rights
      if l.metric == r.metric &&
        r.time >= l.time - before && r.time <= l.time + after
    } yield (l.metric, l.time, l.value, r.time, r.value)).sorted

  test("streamed interval join == brute-force pairs across slicings") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val (before, after) = (200L, 700L)
    val expected = brute(before, after)
    assert(expected.nonEmpty)
    for (cut <- Seq(1, 3, 6)) {
      val lm = MemoryStream[Sample]
      val rm = MemoryStream[Sample]
      // 1 ms watermark delay: the two MemoryStreams may land in separate
      // micro-batches, and a zero delay would evict the other side's
      // window before its partner arrives (the global watermark advances
      // on the populated source alone)
      val q = StreamJoin.intervalJoin(lm.toDS(), rm.toDS(), before, after,
          watermarkDelayNs = 1000000L)
        .writeStream.format("memory").queryName(s"sj_$cut")
        .outputMode("append").start()
      try {
        val (l1, l2) = lefts.splitAt(cut % lefts.length)
        val (r1, r2) = rights.splitAt(cut)
        lm.addData(l1: _*); rm.addData(r1: _*); q.processAllAvailable()
        lm.addData(l2: _*); rm.addData(r2: _*); q.processAllAvailable()
      } finally q.stop()
      val got = s.table(s"sj_$cut").collect()
        .map(r => (r.getAs[String]("metric"), r.getAs[Long]("l_time"),
          r.getAs[Double]("l_value"), r.getAs[Long]("r_time"),
          r.getAs[Double]("r_value"))).toSeq.sorted
      assert(got === expected, s"slicing at $cut")
    }
  }

  test("ns-exact bounds decide membership, not the coarse µs window") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // sub-µs offsets: right at l.time+701 ns is OUTSIDE after=700 even
    // though both truncate to the same µs; right at l.time-200 is inside
    val l = Seq(Sample("m", O + 10000L, 1.0))
    val r = Seq(Sample("m", O + 10701L, 2.0), Sample("m", O + 9800L, 3.0))
    val lm = MemoryStream[Sample]
    val rm = MemoryStream[Sample]
    val q = StreamJoin.intervalJoin(lm.toDS(), rm.toDS(), 200L, 700L,
        watermarkDelayNs = 1000000L)
      .writeStream.format("memory").queryName("sj_ns")
      .outputMode("append").start()
    try {
      lm.addData(l: _*); rm.addData(r: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sj_ns").collect()
      .map(x => x.getAs[Long]("r_time")).toSeq.sorted
    assert(got === Seq(O + 9800L))
  }

  // ==================== overlapJoin (interval×interval) =================

  import StreamJoin.Interval

  private val bandNs = 10000L // 10 µs bands against interval widths ~5 µs
  private val ivA = {
    val rnd = new scala.util.Random(11)
    (0 until 40).map { i =>
      val st = O + rnd.nextLong(100000L)
      Interval(i.toLong, st, st + rnd.nextLong(5000L))
    }
  }
  private val ivB = {
    val rnd = new scala.util.Random(12)
    (100 until 140).map { i =>
      val st = O + rnd.nextLong(100000L)
      Interval(i.toLong, st, st + rnd.nextLong(5000L))
    }
  }

  private def bruteOverlap(as: Seq[Interval], bs: Seq[Interval]): Set[(Long, Long)] =
    (for (a <- as; b <- bs if a.st <= b.en && b.st <= a.en)
      yield (a.id, b.id)).toSet

  test("streamed overlap join == brute-force pairs across slicings") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val expected = bruteOverlap(ivA, ivB)
    assert(expected.nonEmpty)
    for (cut <- Seq(5, 17, 39)) {
      val am = MemoryStream[Interval]
      val bm = MemoryStream[Interval]
      val q = StreamJoin.overlapJoin(am.toDS(), bm.toDS(), bandNs,
          watermarkDelayNs = 1000000L)
        .writeStream.format("memory").queryName(s"ov_$cut")
        .outputMode("append").start()
      try {
        val (a1, a2) = ivA.splitAt(cut % ivA.length)
        val (b1, b2) = ivB.splitAt(cut % ivB.length)
        am.addData(a1: _*); bm.addData(b1: _*); q.processAllAvailable()
        am.addData(a2: _*); bm.addData(b2: _*); q.processAllAvailable()
      } finally q.stop()
      val got = spark.table(s"ov_$cut").collect()
        .map(r => (r.getAs[Long]("ida"), r.getAs[Long]("idb")))
      assert(got.length === got.toSet.size, s"slicing $cut emitted duplicates")
      assert(got.toSet === expected, s"slicing $cut")
    }
  }

  test("streamed overlap self-join with an id ordering emits each pair once") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import org.apache.spark.sql.functions.col
    val expected = (for {
      a <- ivA; b <- ivA
      if a.id < b.id && a.st <= b.en && b.st <= a.en
    } yield (a.id, b.id)).toSet
    assert(expected.nonEmpty)
    val am = MemoryStream[Interval]
    val bm = MemoryStream[Interval]
    val q = StreamJoin.overlapJoin(am.toDS(), bm.toDS(), bandNs,
        watermarkDelayNs = 1000000L, cond = col("ida") < col("idb"))
      .writeStream.format("memory").queryName("ov_self")
      .outputMode("append").start()
    try {
      am.addData(ivA: _*); bm.addData(ivA: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ov_self").collect()
      .map(r => (r.getAs[Long]("ida"), r.getAs[Long]("idb")))
    assert(got.length === got.toSet.size && got.toSet === expected)
  }

  test("streamed overlap join fails loudly on a runaway interval") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val am = MemoryStream[Interval]
    val bm = MemoryStream[Interval]
    val q = StreamJoin.overlapJoin(am.toDS(), bm.toDS(), bandNs,
        watermarkDelayNs = 1000000L, maxBands = 10)
      .writeStream.format("memory").queryName("ov_guard")
      .outputMode("append").start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try {
        am.addData(Interval(1L, O, O + bandNs * 100))
        bm.addData(Interval(2L, O, O + 1000L))
        q.processAllAvailable()
      } finally q.stop()
    }
    assert(ex.getCause != null || ex.getMessage.contains("bands"))
  }
}
