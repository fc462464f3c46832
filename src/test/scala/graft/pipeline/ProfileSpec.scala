package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

class ProfileSpec extends SparkSpec {

  private def fixture = spark.createDataFrame(
    java.util.Arrays.asList(
      Row(1L, "x"), Row(2L, "y"), Row(2L, null), Row(null, "x")),
    StructType(Seq(StructField("k", LongType), StructField("s", StringType))))

  test("profile: one row per column with exact null/distinct/min/max") {
    val out = Profile.profile(fixture, Seq("k"), Seq("s"))
      .orderBy("column").collect()
    assert(out.length === 2)
    val k = out(0)
    assert(k.getString(0) === "k" && k.getLong(1) === 4L &&
      k.getLong(2) === 1L && k.getLong(3) === 2L &&
      k.getLong(k.fieldIndex("min_long")) === 1L &&
      k.getLong(k.fieldIndex("max_long")) === 2L &&
      k.isNullAt(k.fieldIndex("min_str")))
    val sCol = out(1)
    assert(sCol.getString(0) === "s" && sCol.getLong(1) === 4L &&
      sCol.getLong(2) === 1L && sCol.getLong(3) === 2L &&
      sCol.getString(sCol.fieldIndex("min_str")) === "x" &&
      sCol.getString(sCol.fieldIndex("max_str")) === "y" &&
      sCol.isNullAt(sCol.fieldIndex("min_long")))
  }

  test("profile matches independent per-column aggregates on testdata") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val out = Profile.profile(li, Seq("l_orderkey"), Seq("l_returnflag"))
      .collect().map(r => r.getString(0) -> r).toMap
    import org.apache.spark.sql.functions._
    val ok = li.agg(count(lit(1)), countDistinct(col("l_orderkey")),
      min("l_orderkey"), max("l_orderkey")).collect()(0)
    val r = out("l_orderkey")
    assert(r.getLong(1) === ok.getLong(0) && r.getLong(3) === ok.getLong(1))
    assert(r.getLong(r.fieldIndex("min_long")) === ok.getLong(2))
    assert(r.getLong(r.fieldIndex("max_long")) === ok.getLong(3))
    val rf = out("l_returnflag")
    val fl = li.agg(countDistinct(col("l_returnflag")), min("l_returnflag"),
      max("l_returnflag")).collect()(0)
    assert(rf.getLong(3) === fl.getLong(0))
    assert(rf.getString(rf.fieldIndex("min_str")) === fl.getString(1))
    assert(rf.getString(rf.fieldIndex("max_str")) === fl.getString(2))
  }

  test("quantileBins: hand boundaries, skew collapse, partition invariance") {
    val s = spark
    import s.implicits._
    // uniform 1..8, k=4: boundaries (2,4,6) -> bins {1,2}=0 {3,4}=1 {5,6}=2 {7,8}=3
    val uni = (1L to 8L).map(v => (v, v)).toDF("doc_id", "v")
    val got = Profile.quantileBins(uni, "v", k = 4, idCol = "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L,
      5L -> 2L, 6L -> 2L, 7L -> 3L, 8L -> 3L))
    // heavy tie at the median: the duplicated value stays in ONE bucket
    val skew = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L), (5L, 9L), (6L, 10L))
      .toDF("doc_id", "v")
    val sk = Profile.quantileBins(skew, "v", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sk === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 5L -> 1L, 6L -> 1L))
    // boundaries are literals of the data, not the partitioning
    val re = Profile.quantileBins(uni.repartition(5), "v", k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(re === got)
    // assignment pass is narrow: no exchange after the boundary collect
    val plan = Profile.quantileBins(uni, "v", k = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "bin assignment must not shuffle")
  }

  test("bucketedCum: multi-bucket histogram cum equals the single-bucket path") {
    val s = spark
    import s.implicits._
    // 500 distinct values with duplicate weights — enough rows that the
    // sampled cut points spread them over several real range buckets; the
    // bucketed global cum must be invariant to the bucket count, to the
    // input partitioning, and to bucket-boundary placement
    val vals = (1L to 500L).flatMap(v => Seq.fill((v % 3 + 1).toInt)(v))
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("doc_id", "v")
    val ref = Profile.quantileBins(df, "v", k = 7, buckets = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    for (b <- Seq(3, 8, 32)) {
      val got = Profile.quantileBins(df.repartition(5), "v", k = 7, buckets = b)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === ref, s"buckets=$b")
    }
    val mapRef = Profile.quantileMap(df.withColumn("g", org.apache.spark.sql.functions.lit("s")), "v", "g",
        buckets = 1)
      .select("doc_id", "mapped").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mapGot = Profile.quantileMap(df.repartition(7).withColumn("g", org.apache.spark.sql.functions.lit("s")),
        "v", "g", buckets = 16)
      .select("doc_id", "mapped").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mapGot === mapRef)
  }

  // ===================== orderStatOutliers ==============================

  import org.apache.spark.sql.types.DoubleType

  private def valued(rows: Seq[(String, java.lang.Double)]) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (g, v) => Row(g, v) }: _*),
      StructType(Seq(StructField("g", StringType), StructField("v", DoubleType))))

  test("orderStatOutliers: p95 threshold is the exact order statistic") {
    // 1..100 in one group: smallest v with 20*cum >= 100*19 is 95
    val df = valued((1 to 100).map(i => ("a", java.lang.Double.valueOf(i.toDouble))))
    val out = Profile.orderStatOutliers(df, Seq("g"), "v", 19, 20)
      .orderBy("v").collect()
    assert(out.map(_.getDouble(out.head.fieldIndex("v"))).toSeq ===
      Seq(96.0, 97.0, 98.0, 99.0, 100.0))
    assert(out.forall(_.getDouble(out.head.fieldIndex("thr")) === 95.0))
  }

  test("orderStatOutliers: thresholds are per group, duplicates weighted") {
    // group b: value 1.0 ×19, value 9.0 ×1 → p95 threshold lands on 9.0
    // (20*cum(1.0)=380 >= 19*20=380 → thr=1.0; strict > flags only 9.0)
    val rows = (1 to 100).map(i => ("a", java.lang.Double.valueOf(i.toDouble))) ++
      (1 to 19).map(_ => ("b", java.lang.Double.valueOf(1.0))) :+
      ("b", java.lang.Double.valueOf(9.0))
    val out = Profile.orderStatOutliers(valued(rows), Seq("g"), "v", 19, 20)
      .collect().map(r => (r.getString(r.fieldIndex("g")),
        r.getDouble(r.fieldIndex("v")), r.getDouble(r.fieldIndex("thr"))))
    val (ga, gb) = out.partition(_._1 == "a")
    assert(ga.map(_._2).sorted.toSeq === Seq(96.0, 97.0, 98.0, 99.0, 100.0))
    assert(gb.toSeq === Seq(("b", 9.0, 1.0)))
  }

  test("orderStatOutliers: threshold table broadcasts back onto the scan") {
    val df = valued((1 to 200).map(i => ("g" + (i % 3),
      java.lang.Double.valueOf((i % 37).toDouble))))
    val plan = Profile.orderStatOutliers(df, Seq("g"), "v", 19, 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"flagging pass must be a broadcast join, not a corpus shuffle:\n$plan")
  }

  test("validate: one scan, NULL verdicts fail, pass flag exact") {
    val df = valued(Seq(
      ("a", java.lang.Double.valueOf(1.0)), ("a", java.lang.Double.valueOf(5.0)),
      ("a", null))) // null makes `v <= 3` UNKNOWN → must count as a failure
    val out = Profile.validate(df, Seq(
        "v_le_3" -> (org.apache.spark.sql.functions.col("v") <= 3.0),
        "v_not_null" -> org.apache.spark.sql.functions.col("v").isNotNull,
        "g_is_a" -> (org.apache.spark.sql.functions.col("g") === "a")))
      .orderBy("check_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq === Seq(
      ("g_is_a", 3L, 0L, true),
      ("v_le_3", 3L, 2L, false),   // 5.0 fails, NULL fails
      ("v_not_null", 3L, 1L, false)))
  }

  test("checkUnique and checkSubset report rows compose with validate") {
    import org.apache.spark.sql.types.LongType
    val child = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, 10L), Row(2L, 20L), Row(3L, 99L),
        Row(3L, null), Row(4L, 10L)),
      StructType(Seq(StructField("id", LongType), StructField("fk", LongType))))
    val parent = spark.createDataFrame(
      java.util.Arrays.asList(Row(10L), Row(20L)),
      StructType(Seq(StructField("pk", LongType))))
    val u = Profile.checkUnique(child, "child_pk", Seq("id")).collect().head
    assert((u.getString(0), u.getLong(1), u.getLong(2), u.getBoolean(3)) ===
      (("child_pk", 5L, 1L, false))) // id=3 duplicated once
    val f = Profile.checkSubset(child, "fk", parent, "pk", "fk_ok").collect().head
    // 99 unmatched + NULL fk unresolvable = 2 failures
    assert((f.getString(0), f.getLong(1), f.getLong(2), f.getBoolean(3)) ===
      (("fk_ok", 5L, 2L, false)))
  }

  test("validate runs unchanged on a STREAM (live data-quality monitor)") {
    // the report is one global aggregate + a projection, so the same
    // code is a streaming query in complete mode: each micro-batch
    // updates the running per-check counters — no new operator needed
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
    val q = Profile.validate(mem.toDF().toDF("g", "v"), Seq(
        "v_le_10" -> (org.apache.spark.sql.functions.col("v") <= 10L)))
      .writeStream.format("memory").queryName("dq_live")
      .outputMode("complete").start()
    try {
      mem.addData(("a", 1L), ("a", 5L)); q.processAllAvailable()
      val mid = spark.table("dq_live").collect().head
      assert(mid.getLong(1) === 2L && mid.getLong(2) === 0L && mid.getBoolean(3))
      mem.addData(("b", 50L)); q.processAllAvailable()
      val fin = spark.table("dq_live").collect().head
      assert(fin.getLong(1) === 3L && fin.getLong(2) === 1L && !fin.getBoolean(3))
    } finally q.stop()
  }

  test("orderStatOutliers: nulls excluded from distribution, never flagged") {
    val rows: Seq[(String, java.lang.Double)] =
      (1 to 20).map(i => ("a", java.lang.Double.valueOf(i.toDouble))) ++
        Seq(("a", null), ("a", null))
    val out = Profile.orderStatOutliers(valued(rows), Seq("g"), "v", 19, 20)
      .collect()
    // with nulls excluded n=20: thr = 19, only 20.0 flagged
    assert(out.length === 1)
    assert(out.head.getDouble(out.head.fieldIndex("v")) === 20.0)
    assert(out.head.getDouble(out.head.fieldIndex("thr")) === 19.0)
  }

  test("rankNormalize: exact percent_rank with tie-to-first and null pass-through") {
    val df = valued(Seq(
      ("a", java.lang.Double.valueOf(10.0)), ("a", java.lang.Double.valueOf(20.0)),
      ("a", java.lang.Double.valueOf(20.0)), ("a", java.lang.Double.valueOf(30.0)),
      ("a", null),
      ("b", java.lang.Double.valueOf(7.0))))
    val out = Profile.rankNormalize(df, "v", Seq("g")).collect()
      .map(r => (r.getString(r.fieldIndex("g")),
        Option(r.get(r.fieldIndex("v"))).map(_.asInstanceOf[Double]),
        Option(r.get(r.fieldIndex("pct_e6"))).map(_.asInstanceOf[Long])))
    val byKey = out.groupBy(x => (x._1, x._2)).view.mapValues(_.map(_._3)).toMap
    // group a, n = 4 (null excluded): 10 → 0; ties 20,20 → lt=1 → 333333;
    // 30 → lt=3 → 1000000; null → null pct
    assert(byKey(("a", Some(10.0))) === Seq(Some(0L)))
    assert(byKey(("a", Some(20.0))) === Seq(Some(333333L), Some(333333L)))
    assert(byKey(("a", Some(30.0))) === Seq(Some(1000000L)))
    assert(byKey(("a", None)) === Seq(None))
    // singleton group pins to 0, not a division by zero
    assert(byKey(("b", Some(7.0))) === Seq(Some(0L)))
  }

  test("quantileMap erases a pure shift between sources") {
    // source b is source a shifted by +100: equal within-source ranks
    // must land on the SAME pooled value — the batch-effect correction
    val rows = (1 to 10).map(i => ("a", java.lang.Double.valueOf(i.toDouble))) ++
      (1 to 10).map(i => ("b", java.lang.Double.valueOf(i + 100.0)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows.zipWithIndex.map { case ((g, v), i) =>
        Row(i.toLong, g, v) }: _*),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("g", StringType), StructField("v", DoubleType))))
    val out = Profile.quantileMap(df, "v", "g").collect()
      .map(r => (r.getString(r.fieldIndex("g")),
        r.getDouble(r.fieldIndex("v")),
        r.getLong(r.fieldIndex("pct_e6")),
        r.getLong(r.fieldIndex("mapped"))))
    val a = out.filter(_._1 == "a").sortBy(_._2)
    val b = out.filter(_._1 == "b").sortBy(_._2)
    assert(a.map(_._3).toSeq === b.map(_._3).toSeq, "equal ranks")
    assert(a.map(_._4).toSeq === b.map(_._4).toSeq,
      "equal ranks map to the same pooled value")
    // mapped is monotone in the source value
    assert(a.map(_._4).toSeq === a.map(_._4).sorted.toSeq)
    // mapped values come from the pooled domain
    val pooled = rows.map(_._2.doubleValue.toLong).toSet
    assert(out.map(_._4).forall(pooled.contains))
  }

  test("mixDrift: uniform day reads near-zero, flipped day flags the mover") {
    val s = spark
    import s.implicits._
    val day = 86400000000000L
    // day 0: 3a + 1b; day 1: 1a + 3b. Global: 4a, 4b, N = 8.
    val ev = (Seq.fill(3)(("a", 10L)) ++ Seq(("b", 20L)) ++
      Seq(("a", day + 10L)) ++ Seq.fill(3)(("b", day + 20L)))
      .toDF("t", "time")
    val r = Profile.mixDrift(ev, "t", "time").orderBy("day").collect()
    assert(r.length === 2)
    // day 0 devs: |3·8 − 4·4| = 8 for both types → l1 = 16e6/32 = 5e5
    val d0 = r(0)
    assert(d0.getLong(d0.fieldIndex("n_day")) === 4L)
    assert(d0.getLong(d0.fieldIndex("l1_e6")) === 500000L)
    // tie on dev → top_type is the LARGER type name (struct max)
    assert(d0.getString(d0.fieldIndex("top_type")) === "b")
    assert(d0.getLong(d0.fieldIndex("top_dev_e6")) === 250000L)
  }

  test("mixDrift counts a category absent from a day as zero") {
    val s = spark
    import s.implicits._
    val day = 86400000000000L
    // day 0 has only a; day 1 has only b
    val ev = Seq(("a", 1L), ("a", 2L), ("b", day + 1L), ("b", day + 2L))
      .toDF("t", "time")
    val r = Profile.mixDrift(ev, "t", "time").orderBy("day").collect()
    // each day: present type dev = |2·4 − 2·2| = 4; absent = |0 − 2·2| = 4
    // l1 = 8e6/8 = 1e6 (total variation ×2 — a fully disjoint day)
    assert(r.forall(_.getLong(2) === 1000000L))
  }

  test("checkFunctionalDep: violations counted per determinant key") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "x"), Row(1L, "x"),         // consistent key
        Row(2L, "x"), Row(2L, "y"),         // violating key
        Row(3L, null), Row(3L, null)),      // null-only images: consistent
      StructType(Seq(StructField("k", LongType), StructField("s", StringType))))
    val r = Profile.checkFunctionalDep(df, Seq("k"), "s", "k_to_s").collect()
    assert(r.length === 1)
    assert(r(0).getString(0) === "k_to_s" && r(0).getLong(1) === 3L &&
      r(0).getLong(2) === 1L && !r(0).getBoolean(3))
  }
}
