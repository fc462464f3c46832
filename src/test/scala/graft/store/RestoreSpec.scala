package graft.store

import graft.SparkSpec
import graft.hta.RetrieveFlex
import graft.model.Meta
import graft.tools.Tools

/** Port of /root/reference/tests/restore.cpp:60-215 — ingesting the fixture
  * across multiple sessions (batch appends) must produce exactly the same
  * levels and retrieve() results as one-shot ingest. */
class RestoreSpec extends SparkSpec {

  private val meta = Meta(10 * S, 1000 * S, 10)

  test("multi-batch append == one-shot ingest (levels bit-identical)") {
    val all = fixture110
    val oneShot = Warehouse.ingest(pointsDf(all), meta, tmpDir("oneshot"))

    // 6 sessions like the reference: uneven splits incl. single points
    val cuts = Seq(3, 7, 30, 31, 80, all.length)
    val root = tmpDir("restore")
    var prev = 0
    var hta: Hta = null
    for (c <- cuts) {
      val batch = pointsDf(all.slice(prev, c))
      hta = if (prev == 0) Warehouse.ingest(batch, meta, root)
            else Warehouse.append(batch, root)
      prev = c
    }

    val a = oneShot.levels.orderBy("interval", "metric", "time").collect()
    val b = hta.levels.orderBy("interval", "metric", "time").collect()
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
    assert(Tools.check(hta, tp(100000)).count() === 0)
  }

  test("append tail scan prunes raw partitions (PartitionFilters on tb)") {
    val root = tmpDir("restore3")
    Warehouse.ingest(pointsDf(fixture110.take(80)), meta, root)
    val interval = meta.levelIntervals.head
    val closedEnd = Warehouse.closedEndAt(spark, root, interval)
    val bound = tp(50) // any literal bound stands in for the driver-computed one
    val region = Warehouse.tailRegion(spark, root, closedEnd, bound, meta.intervalMax)
    val plan = region.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.split("\n").exists(l => l.contains("PartitionFilters") && l.contains("tb")),
      s"tail scan must show tb partition pruning:\n$plan")
    // and the time bound reaches the parquet scan as a pushed filter
    assert(plan.split("\n").exists(l => l.contains("PushedFilters") &&
      l.contains("GreaterThanOrEqual(time")), s"time bound not pushed:\n$plan")
  }

  test("retrieve goldens survive restore (restore.cpp goldens == retrieve.cpp)") {
    val root = tmpDir("restore2")
    Warehouse.ingest(pointsDf(fixture110.take(50)), meta, root)
    val hta = Warehouse.append(pointsDf(fixture110.drop(50)), root)
    val r = RetrieveFlex.retrieveMinSamples(hta, tp(0), tp(300), 30)
      .orderBy("time").collect()
    assert(r.length === 21)
    assert(r(0).getAs[Long]("active_time") === 9 * S)
    assert(r(3).getAs[Double]("integral") === 1e9 * (2 * -30.0 + 6 * -20.0 + 2 * -10.0))
    assert(r(20).getAs[Double]("integral") === 1e9 * (7 * 35.0 + 2 * 45.0 + 1 * 35.0))
  }
}
