package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

class SessionizeSpec extends SparkSpec {

  private def df(rows: (String, Long, Double)*) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (k, t, v) => Row(k, t, v) }: _*),
      StructType(Seq(StructField("user", StringType), StructField("t", LongType),
        StructField("v", DoubleType))))

  test("gap strictly greater than gapNs starts a new session; == gapNs does not") {
    val d = df(("u1", 0L, 1.0), ("u1", 10L, 2.0), // gap == 10 → same session
      ("u1", 21L, 3.0),                            // gap 11 > 10 → new session
      ("u1", 31L, 4.0))
    val out = Sessionize.sessionize(d, "user", "t", gapNs = 10L,
        aggs = Seq(sum("v").as("sv")))
      .orderBy("session_start").collect()
    assert(out.length === 2)
    assert((out(0).getLong(1), out(0).getLong(2), out(0).getLong(3), out(0).getDouble(4))
      === ((0L, 10L, 2L, 3.0)))
    assert((out(1).getLong(1), out(1).getLong(2), out(1).getLong(3), out(1).getDouble(4))
      === ((21L, 31L, 2L, 7.0)))
  }

  test("duplicate timestamps stay in one session, deterministically") {
    // gaps-and-islands over a NON-unique sort key is where tie handling
    // bites: lag and the cumulative sum must see the SAME tie order, or
    // tie rows can straddle a session boundary (the round-11 ×10-scale
    // finding — an oracle whose two windows resolved ties independently
    // split 10 equal-time rows 2/8 across sessions). Spark's single
    // Window exec sorts once, so equal-time rows always land together.
    val d = df(("u1", 0L, 1.0), ("u1", 0L, 2.0), ("u1", 0L, 3.0),
      ("u1", 100L, 4.0), ("u1", 100L, 5.0), ("u1", 100L, 6.0))
    for (rep <- Seq(1, 3, 7)) { // partitioning must not change the answer
      val out = Sessionize.sessionize(d.repartition(rep), "user", "t",
          gapNs = 10L, aggs = Seq(sum("v").as("sv")))
        .orderBy("session_start").collect()
      assert(out.length === 2, s"rep=$rep")
      assert((out(0).getLong(1), out(0).getLong(3), out(0).getDouble(4))
        === ((0L, 3L, 6.0)), s"rep=$rep")
      assert((out(1).getLong(1), out(1).getLong(3), out(1).getDouble(4))
        === ((100L, 3L, 15.0)), s"rep=$rep")
    }
  }

  test("keys sessionize independently; single rows form singleton sessions") {
    val d = df(("a", 0L, 1.0), ("b", 1L, 2.0), ("a", 100L, 3.0))
    val out = Sessionize.sessionize(d, "user", "t", gapNs = 10L)
      .orderBy("user", "session_start").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq
      === Seq(("a", 0L, 1L), ("a", 100L, 1L), ("b", 1L, 1L)))
  }

  private def events(rows: (Long, String, Long)*) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (u, m, t) => Row(u, m, t) }: _*),
      StructType(Seq(StructField("user_id", LongType),
        StructField("metric", StringType), StructField("time", LongType))))

  test("funnel requires strict time order through the steps") {
    val d = events(
      (1L, "A", 1L), (1L, "B", 2L), (1L, "C", 3L), // completes all three
      (2L, "A", 1L), (2L, "B", 0L),                // B before A: stops at A
      (3L, "B", 5L),                               // never signs up
      (4L, "A", 1L), (4L, "B", 1L))                // tie is NOT strictly after
    val out = Sessionize.funnel(d, Seq("A", "B", "C"))
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, "A", 3L), (2L, "B", 1L), (3L, "C", 1L)))
  }

  test("funnel uses earliest completion, not any-matching event") {
    // B happens twice; the EARLIEST B after A (t=2) is what C must beat.
    val d = events((1L, "A", 1L), (1L, "B", 2L), (1L, "B", 9L), (1L, "C", 3L))
    val out = Sessionize.funnel(d, Seq("A", "B", "C")).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("retention cohorts by first-event day and counts distinct users") {
    val d = events(
      (1L, "x", 5L), (1L, "x", 15L), (1L, "x", 17L), (1L, "x", 25L),
      (2L, "x", 15L), (2L, "x", 35L))
    val out = Sessionize.retention(d, time = "time", dayNs = 10L)
      .orderBy("cohort_day", "day_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (0L, 0L, 1L), (0L, 1L, 1L), (0L, 2L, 1L), // u1: days 0,1,2 (17 dedups)
      (1L, 0L, 1L), (1L, 2L, 1L)))              // u2: days 1,3 -> offsets 0,2
  }

  test("withSessionId assigns running ordinals per key") {
    val d = df(("u", 0L, 0.0), ("u", 5L, 0.0), ("u", 50L, 0.0), ("u", 100L, 0.0))
    val ids = Sessionize.withSessionId(d, "user", "t", gapNs = 10L)
      .orderBy("t").collect().map(_.getLong(3))
    assert(ids.toSeq === Seq(1L, 1L, 2L, 3L))
  }

  test("caller columns named _new/_sid survive (helper names are collision-proof)") {
    val d = df(("u", 0L, 1.0), ("u", 5L, 2.0), ("u", 50L, 3.0))
      .withColumn("_new", lit("keep"))
      .withColumn("_sid", lit(9L))
    val tagged = Sessionize.withSessionId(d, "user", "t", gapNs = 10L)
    assert(tagged.columns.contains("_new"), "caller's _new column must survive")
    assert(tagged.select("_new").distinct().collect().map(_.getString(0)).toSeq === Seq("keep"))
    assert(tagged.orderBy("t").collect().map(_.getAs[Long]("session_id")).toSeq
      === Seq(1L, 1L, 2L))
    val sess = Sessionize.sessionize(d, "user", "t", gapNs = 10L)
    assert(sess.count() === 2, "input _sid column must not perturb session grouping")
    // Spark resolves column names case-insensitively by default — a caller
    // column differing only in case must survive too
    val dCase = df(("u", 0L, 1.0), ("u", 50L, 2.0)).withColumn("_New", lit(7L))
    val taggedCase = Sessionize.withSessionId(dCase, "user", "t", gapNs = 10L)
    assert(taggedCase.select("_New").distinct().collect().map(_.getLong(0)).toSeq === Seq(7L))
    assert(taggedCase.orderBy("t").collect().map(_.getAs[Long]("session_id")).toSeq
      === Seq(1L, 2L))
  }

  test("streaming sessionize emits exactly the batch sessions once closed") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // gap 10 with an exact-boundary pair (u2: 120→130) to pin the
    // inclusive-gap alignment (+1 microsecond on the streaming side)
    val events = Seq(("u1", 100L), ("u1", 105L), ("u1", 116L), ("u2", 100L),
      ("u1", 130L), ("u2", 120L), ("u2", 130L))
    val expected = Sessionize.sessionize(events.toDF("user", "t"), "user", "t", 10L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
    val in = mem.toDF().toDF("user", "t_sec")
      .withColumn("ts", timestamp_seconds(col("t_sec")))
    val q = Sessionize.streamingSessionize(in, "user", "ts",
        gap = "10000001 microseconds", delay = "0 seconds")
      .select(col("user"), col("session_start").cast("long").as("a"),
        col("session_end").cast("long").as("b"), col("n_events"))
      .writeStream.format("memory").queryName("streamsess")
      .outputMode("append").start()
    try {
      val (first, second) = events.splitAt(4)
      mem.addData(first: _*)
      q.processAllAvailable()
      mem.addData(second: _*)
      q.processAllAvailable()
      // sessions close only when the watermark passes end + gap: a far-
      // future event advances it; its own (still-open) session never emits
      mem.addData(("zz", 100000L))
      q.processAllAvailable()
      val got = s.table("streamsess").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got === expected, "closed streaming sessions must equal batch")
    } finally q.stop()
  }

  test("library output matches the inline gaps-and-islands formulation (q31 parity)") {
    val d = df((for (u <- Seq("x", "y"); i <- 0 until 20)
      yield (u, i.toLong * (if (i % 5 == 0) 40L else 7L), i * 0.5)): _*)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user").orderBy("t")
    val inline = d
      .withColumn("_new",
        when(coalesce(lag(col("t"), 1).over(w), lit(Long.MinValue)) < col("t") - 10L, 1L)
          .otherwise(0L))
      .withColumn("_sid", sum("_new").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy("user", "_sid")
      .agg(min("t").as("session_start"), max("t").as("session_end"),
        count(lit(1)).as("n_events"), sum("v").as("sv"))
      .drop("_sid")
    val lib = Sessionize.sessionize(d, "user", "t", 10L, Seq(sum("v").as("sv")))
    assert(lib.orderBy("user", "session_start").collect().toSeq
      === inline.orderBy("user", "session_start").collect().toSeq)
  }

  test("transitions counts consecutive pairs with exact row probabilities") {
    val rows = Seq(
      // user 1: a -> b -> a ; user 2: b -> a ; user 3: a -> a
      (1L, 10L, 100L, "a"), (1L, 20L, 101L, "b"), (1L, 30L, 102L, "a"),
      (2L, 10L, 200L, "b"), (2L, 20L, 201L, "a"),
      (3L, 10L, 300L, "a"), (3L, 20L, 301L, "a"))
    val d = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(Row.fromTuple): _*),
      StructType(Seq(StructField("user_id", LongType),
        StructField("time", LongType), StructField("event_id", LongType),
        StructField("metric", StringType))))
    val out = Sessionize.transitions(d).orderBy("from_type", "to_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      ("a", "a", 1L, 2L, 500000L), ("a", "b", 1L, 2L, 500000L),
      ("b", "a", 2L, 2L, 1000000L)))
    // tiebreak: equal times order by event_id — swapping ids flips the pair
    val tied = Seq((9L, 5L, 1L, "x"), (9L, 5L, 2L, "y"))
    val dt = spark.createDataFrame(
      java.util.Arrays.asList(tied.map(Row.fromTuple): _*),
      StructType(Seq(StructField("user_id", LongType),
        StructField("time", LongType), StructField("event_id", LongType),
        StructField("metric", StringType))))
    val tr = Sessionize.transitions(dt).collect()
    assert(tr.length === 1 &&
      tr(0).getString(0) === "x" && tr(0).getString(1) === "y")
  }

  test("frequentPaths counts per-user consecutive trigrams, k-capped") {
    val s = spark
    import s.implicits._
    // user 1: a b a b a → trigrams aba, bab, aba; user 2: a b a → aba
    val ev = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "a"),
      (1L, 4L, 4L, "b"), (1L, 5L, 5L, "a"),
      (2L, 1L, 6L, "a"), (2L, 2L, 7L, "b"), (2L, 3L, 8L, "a"))
      .toDF("user_id", "time", "event_id", "metric")
    val r = Sessionize.frequentPaths(ev, k = 10).collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2), x.getLong(3)))
    assert(r.toSeq === Seq(("a", "b", "a", 3L), ("b", "a", "b", 1L)))
    // k cap + deterministic tie-break
    val top1 = Sessionize.frequentPaths(ev, k = 1).collect()
    assert(top1.length === 1 && top1(0).getLong(3) === 3L)
  }

  test("frequentPaths never crosses users") {
    val s = spark
    import s.implicits._
    val ev = Seq((1L, 1L, 1L, "x"), (1L, 2L, 2L, "y"),
      (2L, 3L, 3L, "z"))
      .toDF("user_id", "time", "event_id", "metric")
    assert(Sessionize.frequentPaths(ev, k = 5).count() === 0L,
      "no user has three events")
  }
}
