package graft.store

import graft.SparkSpec
import graft.model.Meta
import graft.tools.Tools
import org.apache.spark.sql.functions._

/** Retention must be surgical: surviving rows bit-identical, level rows
  * PRESERVED (not recomputed — their integral mass from deleted
  * neighbors is the correct history), old raw partitions physically
  * gone, and the whole thing idempotent. */
class RetentionSpec extends SparkSpec {

  private val meta = Meta(10 * S, 1000 * S, 10)

  // fixture110 lives entirely inside raw bucket [0, 1000 s) — extend it
  // past the intervalMax boundary so a floored horizon at tp(1000)
  // genuinely splits the store
  private def wide: Seq[(Long, Double)] = fixture110 ++
    Seq(1050L, 1100L, 1500L, 1999L, 2050L, 2150L).map(s => tp(s) -> (s * 1.0))

  private def tbDirs(root: String): Seq[Long] =
    new java.io.File(s"$root/raw").listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("tb="))
      .map(_.getName.stripPrefix("tb=").toLong).sorted

  test("retire: filtered rows, preserved levels, deleted partitions, idempotent") {
    val root = tmpDir("retirewh")
    val original = Warehouse.ingest(pointsDf(wide), meta, root)
    val origRaw = original.raw.drop("tb")
      .orderBy("metric", "time").collect()
    val origLevels = original.levels
      .orderBy("interval", "metric", "time").collect()
    // horizon floors to the intervalMax (1000 s) boundary: tp(1000)
    val h = tp(1500) - Math.floorMod(tp(1500), meta.intervalMax)
    assert(h === tp(1000), "floored horizon splits the store")
    val retired = Tools.retire(spark, root, tp(1500))

    val gotRaw = retired.raw.drop("tb").orderBy("metric", "time").collect()
    assert(gotRaw.toSeq ===
      origRaw.filter(_.getAs[Long]("time") >= h).toSeq,
      "raw survives iff at/after the floored horizon")
    val gotLevels = retired.levels
      .orderBy("interval", "metric", "time").collect()
    assert(gotLevels.toSeq ===
      origLevels.filter(_.getAs[Long]("time") >= h).toSeq,
      "level rows are the ORIGINAL rows, filtered — never recomputed")
    assert(tbDirs(root).forall(_ >= h), "old raw partitions physically gone")

    // idempotent: a second retire at the same horizon changes nothing
    val again = Tools.retire(spark, root, tp(1500))
    assert(again.raw.drop("tb").orderBy("metric", "time").collect().toSeq ===
      gotRaw.toSeq)
    assert(again.levels.orderBy("interval", "metric", "time").collect().toSeq
      === gotLevels.toSeq)
  }

  test("retire preserves aggregates over fully-retained windows exactly") {
    // b sits at a RETAINED sample (1100): the raw-edge carry-in comes
    // from retained data on both stores. (A window starting exactly AT
    // the horizon loses the carry from the deleted prior sample when the
    // planner routes its edge through raw — inherent to deletion, and
    // the reason retire floors to a bucket boundary: the preserved
    // LEVEL rows still answer aligned reads with full history.)
    val root = tmpDir("retirewh2")
    val original = Warehouse.ingest(pointsDf(wide), meta, root)
    val b = tp(1100)
    val e = tp(2000)
    val want = graft.hta.Telescope.aggregateRange(original, b, e).collect()
    Tools.retire(spark, root, tp(1500))
    val reopened = Warehouse.open(spark, root)
    val got = graft.hta.Telescope.aggregateRange(reopened, b, e).collect()
    assert(got.toSeq === want.toSeq,
      "retained-range aggregates answer as the un-retired store would")
  }

  test("retire composes with compact in either order, check stays clean") {
    val root = tmpDir("retirewh4")
    Warehouse.ingest(pointsDf(wide), meta, root)
    Warehouse.compact(spark, root, filesPerPartition = 1)
    val afterCompact = Tools.retire(spark, root, tp(1500))
    val rows1 = afterCompact.raw.drop("tb")
      .orderBy("metric", "time").collect()
    Warehouse.compact(spark, root, filesPerPartition = 1)
    val reread = Warehouse.open(spark, root)
    assert(reread.raw.drop("tb").orderBy("metric", "time").collect().toSeq
      === rows1.toSeq, "compact after retire is a pure rewrite")
    // the full check-tool invariants hold on the retired+compacted store,
    // EXCEPT the epoch-density rule: levels legitimately start at the
    // horizon now, not at the metric's first raw point — assert no OTHER
    // issue class appears
    val issues = Tools.check(reread, now = tp(100000), genesis = tp(0) - S)
      .collect().map(_.getString(2)).toSet
    assert(issues.subsetOf(Set("bogus_time")),
      s"only the epoch-offset class may fire post-retention, got $issues")
  }

  test("retire refuses to empty the store") {
    val root = tmpDir("retirewh3")
    Warehouse.ingest(pointsDf(wide), meta, root)
    val e = intercept[IllegalArgumentException] {
      Tools.retire(spark, root, tp(100000))
    }
    assert(e.getMessage.contains("refusing"))
    // and the refusal left the store untouched
    val reopened = Warehouse.open(spark, root)
    assert(reopened.raw.count() === wide.length.toLong)
  }
}
