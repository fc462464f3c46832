package graft.store

import graft.SparkSpec
import graft.hta.RetrieveFlex
import graft.model.Meta
import org.apache.spark.sql.functions._

/** Compaction must be a pure physical rewrite: identical rows, identical
  * query results, strictly fewer files. */
class CompactionSpec extends SparkSpec {

  private val meta = Meta(10 * S, 1000 * S, 10)

  private def parquetFiles(dir: String): Int = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).count(_.getName.endsWith(".parquet"))
  }

  test("compact: same rows, same retrieves, fewer files") {
    val root = tmpDir("compactwh")
    val all = fixture110
    // 6 append batches → many small files per level partition
    val cuts = Seq(3, 7, 30, 31, 80, all.length)
    var prev = 0
    for (c <- cuts) {
      val batch = pointsDf(all.slice(prev, c))
      if (prev == 0) Warehouse.ingest(batch, meta, root)
      else Warehouse.append(batch, root)
      prev = c
    }
    val before = Warehouse.open(spark, root)
    val beforeRows = before.levels.orderBy("interval", "metric", "time").collect()
    val beforeRaw = before.raw.drop("tb").orderBy("metric", "time").collect()
    val beforeFiles = parquetFiles(s"$root/levels")
    val beforeRetrieve = RetrieveFlex.retrieveFlex(before, tp(0), tp(230), 100 * S)
      .orderBy("metric", "time").collect()

    val after = Warehouse.compact(spark, root, filesPerPartition = 1)

    assert(parquetFiles(s"$root/levels") < beforeFiles,
      s"expected fewer files than $beforeFiles")
    val afterRows = after.levels.orderBy("interval", "metric", "time").collect()
    assert(afterRows.toSeq === beforeRows.toSeq)
    val afterRaw = after.raw.drop("tb").orderBy("metric", "time").collect()
    assert(afterRaw.toSeq === beforeRaw.toSeq)
    val afterRetrieve = RetrieveFlex.retrieveFlex(after, tp(0), tp(230), 100 * S)
      .orderBy("metric", "time").collect()
    assert(afterRetrieve.toSeq === beforeRetrieve.toSeq)
    // store still passes the full check-tool invariants
    assert(graft.tools.Tools.check(after, tp(100000)).count() === 0)
  }

  test("interrupted swap: open and a direct compact rerun both self-heal") {
    val root = tmpDir("crashwh")
    Warehouse.ingest(fixtureDf, meta, root)
    val want = Warehouse.open(spark, root)
    val wantLevels = want.levels.orderBy("interval", "metric", "time").collect().toSeq
    val wantRaw = want.raw.drop("tb").orderBy("metric", "time").collect().toSeq
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate dying between rename(dst -> bak) and rename(tmp -> dst):
    // dst missing, backup holds the only copy
    def crash(dir: String): Unit =
      assert(fs.rename(new org.apache.hadoop.fs.Path(s"$root/$dir"),
        new org.apache.hadoop.fs.Path(s"$root/${dir}_compact_bak")))

    crash("levels")
    val o1 = Warehouse.open(spark, root)
    assert(o1.levels.orderBy("interval", "metric", "time").collect().toSeq === wantLevels)

    // raw mid-swap crash, then a DIRECT compact() rerun (no reader between):
    // compact reads raw itself, so it must restore before reading
    crash("raw")
    val o2 = Warehouse.compact(spark, root, filesPerPartition = 1)
    assert(o2.raw.drop("tb").orderBy("metric", "time").collect().toSeq === wantRaw)
    assert(o2.levels.orderBy("interval", "metric", "time").collect().toSeq === wantLevels)

    crash("levels")
    val o3 = Warehouse.compact(spark, root, filesPerPartition = 1)
    assert(o3.levels.orderBy("interval", "metric", "time").collect().toSeq === wantLevels)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/levels_compact_bak")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/raw_compact_bak")))
  }

  test("compact refuses while a crashed stream has an unreplayed partial publish") {
    val root = tmpDir("compactbid")
    Warehouse.ingest(fixtureDf, meta, root)
    // a committed streaming batch: bid files + marker — compaction-safe
    val rows = graft.hta.AggOps.levelBuild(fixtureDf, 10 * S)
      .withColumn("interval", org.apache.spark.sql.functions.lit(10 * S))
    graft.streaming.StreamIngest.publishLevelBatch(rows.limit(3), root, bid = 5L)
    Warehouse.compact(spark, root, filesPerPartition = 1) // fine: marker present
    // crash mid-publish: bid files present, marker missing → replay debt.
    // Compacting now would rewrite the bid files into anonymous part-files
    // and the replay would duplicate them — must refuse.
    graft.streaming.StreamIngest.publishLevelBatch(rows.limit(3), root, bid = 6L)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/_stream_commits/levels/6"), false)
    val e = intercept[IllegalArgumentException](Warehouse.compact(spark, root))
    assert(e.getMessage.contains("uncommitted streaming batch 6"))
    // replay finishes (marker restored) → compact proceeds again
    graft.streaming.StreamIngest.publishLevelBatch(rows.limit(3), root, bid = 6L)
    Warehouse.compact(spark, root, filesPerPartition = 1)
  }
}
