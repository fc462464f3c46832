package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {

  // changelog: 3 keys with interleaved updates; seq is the unique log order
  private def changelog = {
    val s = spark
    import s.implicits._
    Seq(
      ("a", 10L, 1L, "v1"), ("a", 20L, 2L, "v2"), ("a", 20L, 3L, "v3"),
      ("b", 5L, 4L, "w1"),
      ("c", 7L, 5L, "x1"), ("c", 6L, 6L, "x0")
    ).toDF("k", "t", "seq", "payload")
  }

  test("latestByKey keeps exactly the greatest (t, seq) row per key") {
    val out = Cdc.latestByKey(changelog, Seq("k"), Seq("t", "seq"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    // key a: t=20 tie broken by seq=3; key c: later seq but smaller t loses
    assert(out === Set(("a", 20L, 3L, "v3"), ("b", 5L, 4L, "w1"),
      ("c", 7L, 5L, "x1")))
  }

  test("latestByKey is partitioning-invariant") {
    val expect = Cdc.latestByKey(changelog, Seq("k"), Seq("t", "seq"))
      .collect().map(_.toSeq).toSet
    for (n <- Seq(1, 7)) {
      val got = Cdc.latestByKey(changelog.repartition(n), Seq("k"), Seq("t", "seq"))
        .collect().map(_.toSeq).toSet
      assert(got === expect, s"repartition($n)")
    }
  }

  test("latestByKey plan is an aggregate with map-side partial, not a window") {
    val plan = Cdc.latestByKey(changelog, Seq("k"), Seq("t", "seq"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "no window operator in the plan")
    // partial-then-final hash/objectagg pair around the single exchange
    assert(plan.contains("Exchange hashpartitioning(k"))
  }

  test("scd2 builds half-open validity chains with NULL-open current rows") {
    val out = Cdc.scd2(changelog, Seq("k"), Seq("t", "seq"), validFrom = "t")
      .orderBy("k", "t", "seq")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5)),
        r.getBoolean(6)))
    assert(out.toSeq === Seq(
      ("a", 10L, 1L, 10L, Some(20L), false),
      ("a", 20L, 2L, 20L, Some(20L), false), // tie split by seq: v2 precedes v3
      ("a", 20L, 3L, 20L, None, true),
      ("b", 5L, 4L, 5L, None, true),
      ("c", 6L, 6L, 6L, Some(7L), false),
      ("c", 7L, 5L, 7L, None, true)))
  }

  test("snapshotDiff classifies added/removed/changed/same null-safely") {
    val s = spark
    import s.implicits._
    val old = Seq((1L, Some("x")), (2L, Some("y")), (3L, None), (5L, None))
      .toDF("k", "c")
    val neu = Seq((2L, Some("y")), (3L, Some("z")), (4L, Some("w")), (5L, None))
      .toDF("k", "c")
    val out = Cdc.snapshotDiff(old, neu, Seq("k"), "c")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out === Map(1L -> "removed", 2L -> "same", 3L -> "changed",
      4L -> "added", 5L -> "same"))
  }

  test("scd2 current rows equal latestByKey survivors") {
    val cur = Cdc.scd2(changelog, Seq("k"), Seq("t", "seq"), "t")
      .where(col("is_current"))
      .select("k", "t", "seq", "payload").collect().map(_.toSeq).toSet
    val latest = Cdc.latestByKey(changelog, Seq("k"), Seq("t", "seq"))
      .select("k", "t", "seq", "payload").collect().map(_.toSeq).toSet
    assert(cur === latest)
  }

  test("deletionImpact counts subject-owned rows; cascade via impactedKeys") {
    val s = spark
    import s.implicits._
    val cust = Seq(1L, 2L, 3L, 4L, 5L).toDF("ck")
    val subjects = Seq(2L, 4L, 99L).toDF("ck") // 99 matches nothing
    val orders = Seq((10L, 1L), (11L, 2L), (12L, 2L), (13L, 4L), (14L, 5L))
      .toDF("ok", "ck")
    val items = Seq((10L, 1L), (11L, 1L), (11L, 2L), (13L, 1L), (14L, 1L))
      .toDF("ok", "ln")
    val c = Cdc.deletionImpact(cust, "ck", subjects, "cust").collect()(0)
    assert(c.getLong(1) === 5L && c.getLong(2) === 2L)
    val deadOrders = Cdc.impactedKeys(orders, "ck", subjects, "ok")
    assert(deadOrders.collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(11L, 12L, 13L))
    val li = Cdc.deletionImpact(items, "ok", deadOrders, "lineitem").collect()(0)
    assert(li.getLong(1) === 5L && li.getLong(2) === 3L) // two 11s + one 13
  }

  test("deletionImpact: NULL keys are never subject-owned") {
    val s = spark
    import s.implicits._
    val df = Seq(Some(1L), None, Some(2L)).toDF("ck")
    val r = Cdc.deletionImpact(df, "ck", Seq(1L).toDF("ck"), "t").collect()(0)
    assert(r.getLong(1) === 3L && r.getLong(2) === 1L)
  }
}
