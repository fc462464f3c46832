package graft.tools

import graft.SparkSpec
import graft.model.Meta
import graft.store.Warehouse
import org.apache.spark.sql.functions._

/** T1-T5 tool jobs over the canonical fixture warehouse. */
class ToolsSpec extends SparkSpec {

  private lazy val hta = Warehouse.ingest(
    fixtureDf, Meta(10 * S, 1000 * S, 10), tmpDir("tools"))
  private val now = tp(100000)

  test("T2 check: freshly ingested warehouse has zero issues") {
    assert(Tools.check(hta, now).count() === 0)
  }

  test("T2 check flags corrupted level times") {
    val broken = hta.copy(levels =
      hta.levels.withColumn("time",
        when(col("time") === tp(40), col("time") + 1).otherwise(col("time"))))
    val issues = Tools.check(broken, now).collect()
    assert(issues.exists(_.getAs[String]("issue") == "bogus_time"))
  }

  test("T2 check flags non-finite raw values") {
    val broken = hta.copy(raw =
      hta.raw.withColumn("value",
        when(col("time") === tp(42), lit(Double.NaN)).otherwise(col("value"))))
    val issues = Tools.check(broken, now).collect()
    assert(issues.exists(_.getAs[String]("issue") == "nonfinite_value"))
  }

  test("T3 repair drops exactly the out-of-range rows and rebuilds") {
    val dirty = pointsDf(fixture110 ++ Seq(tp(300) -> Double.NaN, tp(301) -> 1e30))
    val rebuilt = Tools.repair(
      Warehouse.ingest(dirty, Meta(10 * S, 1000 * S, 10), tmpDir("dirty"), validate = false),
      tmpDir("repaired"), dropBelow = -100, dropAbove = 100)
    assert(rebuilt.raw.count() === 110)
    assert(Tools.check(rebuilt, now).count() === 0)
  }

  test("T4 clone re-aggregates under a new Meta") {
    val cloned = Tools.clone(hta, Meta(20 * S, 2000 * S, 10), tmpDir("clone"))
    assert(cloned.raw.count() === 110)
    assert(cloned.levels.select("interval").distinct().collect()
      .map(_.getLong(0)).toSet.subsetOf(Set(20 * S, 200 * S, 2000 * S)))
    assert(Tools.check(cloned, now).count() === 0)
  }

  test("T5 throttle-clone keeps cooldown-spaced points") {
    val th = Tools.throttleClone(hta, 50 * S, tmpDir("throt"))
    // 11, then >61 → 67, then >117 → 118, 169, then >219 → 225
    assert(th.raw.orderBy("time").collect().map(_.getAs[Long]("time")).toSeq ===
      Seq(tp(11), tp(67), tp(118), tp(169), tp(225)))
  }

  test("T1 dump summarizes per metric") {
    val d = Tools.dump(hta).collect().head
    assert(d.getAs[Long]("n_rows") === 110)
    assert(d.getAs[Long]("first_time") === tp(11))
    assert(d.getAs[Long]("last_time") === tp(225))
  }

  test("S8 generator emits 50ms-spaced constant series") {
    val g = Tools.generate(spark, "dummy", 100, tp(0)).collect()
    assert(g.length === 100)
    assert(g.map(_.getAs[Long]("time")).toSeq ===
      (0 until 100).map(i => tp(0) + i * 50000000L))
  }
}
