package graft.store

import graft.hta.AggOps
import graft.model.Meta
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse layout (SURVEY.md §7.1) — the Spark-native replacement for the
  * reference's per-metric directory of flat binary files
  * (src/storage/file/metric.cpp:517-527, src/directory.cpp:59-123):
  *
  *   <root>/raw/tb=<bucket>/...parquet      time-bucketed raw samples
  *   <root>/levels/interval=<ns>/...parquet one partition per ladder level
  *   <root>/meta.json                       per-store Meta (interval ladder)
  *
  * Scale design:
  *  - raw is partitioned by a coarse time bucket (`tb = time / interval_max`)
  *    so range queries prune whole directories, and parquet row-group min/max
  *    on `time` prunes within files — this replaces the reference's
  *    hierarchical positional index descent (A8) with free Catalyst pruning;
  *  - levels are partitioned by `interval`: retrieveFlex touches exactly one
  *    directory per chosen level; within a partition, files are written
  *    sorted by (metric, time) for row-group skipping;
  *  - the level build is one gap-lift shuffle + one aggregation per level,
  *    all reusing the same lifted frame (no per-point cascade — the
  *    reference's insert-time recursion becomes batch rollup k→k+1, which
  *    reads the (much smaller) child level, not raw).
  */
final case class Hta(raw: DataFrame, levels: DataFrame, meta: Meta,
                     metrics: Option[DataFrame] = None)

object Warehouse {

  /** Batch ingest: write raw + build the full level ladder (A4+A5).
    * Monotonicity (F5) is asserted per metric via one window pass when
    * `validate` — mirroring the reference's ingest-time throw
    * (src/metric.cpp:515-524). */
  def ingest(points: DataFrame, meta: Meta, root: String,
             validate: Boolean = true): Hta = {
    val spark = points.sparkSession
    if (validate) {
      // chunked lag (no whole-metric window); MinValue sentinel marks each
      // metric's first point so a duplicate timestamp still trips the check
      val lifted = AggOps.gapLiftChunked(points, meta.intervalMax,
        firstDefault = Some(lit(Long.MinValue)))
      val bad = lifted.where(col("time") === 0L ||
          (col("prev_time") =!= Long.MinValue && col("time") <= col("prev_time")))
        .limit(1).count()
      require(bad == 0L, "non-monotonic or zero timestamp in ingest batch")
    }

    withWriterCoalesce(points.sparkSession) {
      points
        .withColumn("tb", AggOps.intervalBegin(col("time"), meta.intervalMax))
        .repartition(col("tb"))
        .sortWithinPartitions("metric", "time")
        .write.mode(SaveMode.Overwrite).partitionBy("tb")
        .parquet(s"$root/raw")
    }

    // level ladder: L0 from raw (one gapLift shuffle), k→k+1 from level k
    val ladder = meta.levelIntervals
    val l0 = AggOps.levelBuild(points, ladder.head,
      chunkWidth = Some(meta.intervalMax))
      .withColumn("interval", lit(ladder.head))
    writeLevel(l0, root, SaveMode.Overwrite)
    for ((parent, idx) <- ladder.zipWithIndex.drop(1)) {
      // read the just-written child back: rollup then scans the (small)
      // materialized level instead of recomputing the whole lineage
      val child = readLevels(spark, root)
        .where(col("interval") === ladder(idx - 1)).drop("interval")
      val built = AggOps.rollup(child, ladder(idx - 1), parent)
        .withColumn("interval", lit(parent))
      writeLevel(built, root, SaveMode.Append)
    }

    points.select("metric").distinct()
      .write.mode(SaveMode.Overwrite).parquet(s"$root/_metrics")
    writeMeta(meta, root, spark)
    open(spark, root)
  }

  private def writeLevel(level: DataFrame, root: String, mode: SaveMode): Unit =
    withWriterCoalesce(level.sparkSession) {
      level.repartition(col("interval"))
        .sortWithinPartitions("metric", "time")
        .write.mode(mode).partitionBy("interval")
        .parquet(s"$root/levels")
    }

  /** public alias for streaming sinks */
  def writeMetaPublic(meta: Meta, root: String, spark: SparkSession): Unit =
    writeMeta(meta, root, spark)

  private def writeMeta(meta: Meta, root: String, spark: SparkSession): Unit = {
    val json =
      s"""{"interval_min":${meta.intervalMin},"interval_max":${meta.intervalMax},"interval_factor":${meta.intervalFactor}}"""
    val p = new org.apache.hadoop.fs.Path(s"$root/meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write(json.getBytes("UTF-8")); out.close()
  }

  def readMeta(spark: SparkSession, root: String): Meta = {
    val p = new org.apache.hadoop.fs.Path(s"$root/meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val s = scala.io.Source.fromInputStream(in).mkString; in.close()
    def grab(k: String): Long =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(s).get.group(1).toLong
    Meta(grab("interval_min"), grab("interval_max"), grab("interval_factor"))
  }

  /** Q4 analogue — incremental batch append (reference restore_level,
    * src/metric.cpp:451-497): instead of rebuilding the ladder, recompute
    * only each level's OPEN TAIL — the region at/after the last closed
    * interval end `interval_begin(old_last, k)`. New points can never touch
    * an already-closed row (a row closes only when a later point crosses its
    * end), so appends are strictly additive.
    *
    * Scale: the recomputed region per level is O(open tail + new batch); the
    * raw re-scan prunes to the tail's time buckets. This is the batch
    * equivalent of the reference's in-memory accumulator restore.
    */
  def append(points: DataFrame, root: String): Hta = {
    val spark = points.sparkSession
    val existing = open(spark, root)
    val meta = existing.meta

    // Per-metric bounds of the pre-append store: used for the monotonicity
    // check AND the tail prune bound (appends never lower a metric's first).
    val oldBounds = existing.raw.groupBy("metric")
      .agg(min("time").as("_first"), max("time").as("_old_last")).cache()
    // F5 across batches: every new point must be past its metric's last
    val crossBad = points.join(broadcast(oldBounds), Seq("metric"), "left")
      .where(col("_old_last").isNotNull && col("time") <= col("_old_last"))
      .limit(1).count()
    require(crossBad == 0L, "append batch not monotonic vs existing data")
    // metrics first seen in this batch have no closed rows anywhere — the
    // prune bound must reach down to their earliest point
    val newMetricMin = points
      .join(broadcast(oldBounds.select("metric")), Seq("metric"), "left_anti")
      .agg(min("time")).collect()(0) match {
        case r if r.isNullAt(0) => Long.MaxValue
        case r => r.getLong(0)
      }

    withWriterCoalesce(points.sparkSession) {
      points
        .withColumn("tb", AggOps.intervalBegin(col("time"), meta.intervalMax))
        .repartition(col("tb"))
        .sortWithinPartitions("metric", "time")
        .write.mode(SaveMode.Append).partitionBy("tb")
        .parquet(s"$root/raw")
    }

    for (interval <- meta.levelIntervals) {
      val closedEnd = closedEndAt(spark, root, interval)
      // Driver-side global prune bound: the earliest point any metric's tail
      // recompute can need — its closed end where present, else its first
      // point. A LITERAL bound (unlike the join-derived tail predicate)
      // pushes into the parquet scan: tb directory pruning + time row-group
      // skipping, so a 7-level ladder no longer means 7 full raw scans.
      val bound = oldBounds.join(closedEnd, Seq("metric"), "left")
        .agg(min(coalesce(col("_closed_end"), col("_first"))))
        .collect()(0) match {
          case r if r.isNullAt(0) => newMetricMin
          case r => math.min(r.getLong(0), newMetricMin)
        }
      val region = tailRegion(spark, root, closedEnd, bound, meta.intervalMax)
      // gap seed: closed-region end (reference Level restore gap origin),
      // or the point itself when the level had no closed rows; skew-safe
      // chunked lag, chunk grid == tb layout (no extra shuffle shape)
      val lifted = AggOps.gapLiftChunked(region, meta.intervalMax,
        firstDefault = Some(coalesce(col("_closed_end"), col("time"))))
      val lastT = region.groupBy("metric").agg(max("time").as("_last"))
      val newRows = AggOps.boundarySplit(
          lifted.join(broadcast(lastT), Seq("metric")), interval)
        .where(col("bstart") < AggOps.intervalBegin(col("_last"), interval) &&
          (col("_closed_end").isNull || col("bstart") >= col("_closed_end")))
        .groupBy(col("metric"), col("bstart").as("time"))
        .agg(AggOps.segmentAggCols(col("value")).head,
          AggOps.segmentAggCols(col("value")).tail: _*)
        .withColumn("interval", lit(interval))
      writeLevel(newRows, root, SaveMode.Append)
    }
    oldBounds.unpersist()
    // merge any new metric names into the catalog (S6); tolerate stores
    // created before the catalog existed
    val fs0 = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existingCat = readCatalog(spark, root)
      .getOrElse(existing.raw.select("metric").distinct())
    val cat = existingCat
      .unionByName(points.select("metric").distinct()).distinct()
    cat.write.mode(SaveMode.Overwrite).parquet(s"$root/_metrics_tmp")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/_metrics"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$root/_metrics_tmp"),
      new org.apache.hadoop.fs.Path(s"$root/_metrics"))
    open(spark, root)
  }

  /** Per-metric end of the closed region at `interval` (absent metrics have
    * no row). The levels scan prunes to one `interval=` partition. */
  def closedEndAt(spark: SparkSession, root: String, interval: Long): DataFrame =
    readLevels(spark, root)
      .where(col("interval") === interval)
      .groupBy("metric").agg((max("time") + interval).as("_closed_end"))

  /** The raw tail scan an append recomputes: literal `tb`/`time` bounds so
    * the parquet source prunes directories and row groups (PartitionFilters
    * on tb — asserted by RestoreSpec), then the per-metric join-derived tail
    * predicate trims the remainder. */
  def tailRegion(spark: SparkSession, root: String, closedEnd: DataFrame,
                 bound: Long, intervalMax: Long): DataFrame = {
    val tbBound = bound - Math.floorMod(bound, intervalMax)
    spark.read.parquet(s"$root/raw")
      .where(col("tb") >= tbBound && col("time") >= bound)
      .drop("tb")
      .join(broadcast(closedEnd), Seq("metric"), "left")
      .where(col("_closed_end").isNull || col("time") >= col("_closed_end"))
  }

  import org.apache.spark.sql.types._
  /** Canonical level-table schema (partition col `interval` normalized to
    * LongType — Spark's partition inference would narrow small ladders to
    * int). */
  val levelSchema: StructType = StructType(Seq(
    StructField("metric", StringType), StructField("time", LongType),
    StructField("minimum", DoubleType), StructField("maximum", DoubleType),
    StructField("sum", DoubleType), StructField("count", LongType),
    StructField("integral", DoubleType), StructField("active_time", LongType),
    StructField("minimum_home", DoubleType), StructField("maximum_home", DoubleType),
    StructField("interval", LongType)))

  /** `raw` keeps the `tb` partition column so query paths can hand Scoped a
    * bucket hint for directory-level pruning (Scoped.scopedRange doc). */
  /** Levels table, tolerating a legitimately empty directory (a store whose
    * data span closes no interval: tests/basics.cpp:88-93). */
  /** If a compact crashed between `rename(dst -> bak)` and
    * `rename(tmp -> dst)`, `dst` is missing and the backup holds the only
    * copy. Every reader and the next compact must restore it — otherwise
    * `readLevels` would treat the missing dir as a legitimately empty store
    * and a subsequent compact would delete the backup and commit an empty
    * levels table. */
  private def restoreInterruptedSwap(
      fs: org.apache.hadoop.fs.FileSystem, dst: String): Unit = {
    val dstP = new org.apache.hadoop.fs.Path(dst)
    val bakP = new org.apache.hadoop.fs.Path(dst + "_compact_bak")
    if (!fs.exists(dstP) && fs.exists(bakP)) {
      // two concurrent readers can both pass the exists checks; the rename
      // loser is fine as long as SOMEONE completed the restore — only a
      // still-missing dst is a real failure
      if (!fs.rename(bakP, dstP))
        require(fs.exists(dstP), s"compact: restore $bakP -> $dst failed")
    }
  }

  /** Guard for [[compact]]: streaming publishes land as
    * `<table>/<part>=…/bid-N-k.parquet` with a commit marker written LAST
    * (StreamIngest.publishBatch). A bid file whose marker is missing is a
    * crash mid-publish that the stream WILL replay on restart; its cleanup
    * keys on the `bid-N-` file names, which compaction would erase. */
  private def assertNoUncommittedPublishes(
      fs: org.apache.hadoop.fs.FileSystem, root: String): Unit = {
    val bidName = "bid-(\\d+)-.*".r
    for (table <- Seq("raw", "levels")) {
      val dir = new org.apache.hadoop.fs.Path(s"$root/$table")
      if (fs.exists(dir)) {
        val bids = for {
          part <- fs.listStatus(dir).toSeq if part.isDirectory
          f <- fs.listStatus(part.getPath)
          m <- bidName.findPrefixMatchOf(f.getPath.getName)
        } yield m.group(1)
        for (bid <- bids.distinct) {
          // legacy fallback: pre-per-table stores marked LEVEL commits flat
          // at _stream_commits/<bid> (see StreamIngest.publishBatch) — an
          // upgraded store must not be refused as "uncommitted"
          val committed =
            fs.exists(new org.apache.hadoop.fs.Path(s"$root/_stream_commits/$table/$bid")) ||
              (table == "levels" &&
                fs.isFile(new org.apache.hadoop.fs.Path(s"$root/_stream_commits/$bid")))
          require(committed,
            s"compact: uncommitted streaming batch $bid in $table/ — restart the " +
              s"stream so it replays batch $bid (or remove the partial bid-$bid-* " +
              "files) before compacting")
        }
      }
    }
  }

  /** Restore both store directories after an interrupted compact swap.
    * Called by every entry point that READS OR WRITES the store outside the
    * per-read guards ([[compact]] before its rewrite, the streaming sinks
    * before their first micro-batch): a writer that recreates a missing
    * `raw/` before any reader runs would otherwise strand the backup — the
    * restore then skips (dst exists) and the next compact deletes the only
    * pre-crash copy. */
  private[graft] def restoreStore(spark: SparkSession, root: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    restoreInterruptedSwap(fs, s"$root/levels")
    restoreInterruptedSwap(fs, s"$root/raw")
  }

  def readLevels(spark: SparkSession, root: String): DataFrame =
    try {
      restoreInterruptedSwap(
        new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration),
        s"$root/levels")
      val df0 = spark.read.parquet(s"$root/levels")
        .withColumn("interval", col("interval").cast("long"))
      // stores written before the home-only min/max columns (or converted
      // from .hta files, which don't carry them) read as null — harmless for
      // HTA queries; RollupRouting gates MIN/MAX routing on their presence
      val df = levelSchema.fieldNames.foldLeft(df0) { (d, f) =>
        if (d.columns.contains(f)) d else d.withColumn(f, lit(null).cast("double"))
      }
      df.select(levelSchema.fieldNames.map(col): _*)
    } catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], levelSchema)
    }

  def open(spark: SparkSession, root: String): Hta = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    restoreInterruptedSwap(fs, s"$root/raw")
    Hta(spark.read.parquet(s"$root/raw"), readLevels(spark, root),
      readMeta(spark, root), readCatalog(spark, root))
  }

  /** Read the `_metrics` catalog by its CONCRETE part files: handing the
    * `_`-prefixed directory itself to `spark.read` makes the DataSource
    * path check log a spurious `All paths were ignored` WARN on every
    * open/append (the FileIndex still reads it — the warning is noise,
    * but a fresh-clone test run must not emit datasource warnings). */
  private def readCatalog(spark: SparkSession,
                          root: String): Option[DataFrame] = {
    val dir = new org.apache.hadoop.fs.Path(s"$root/_metrics")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) None
    else {
      val parts = fs.listStatus(dir)
        .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
        .map(_.getPath.toString)
      if (parts.isEmpty)
        Some(spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("metric",
              org.apache.spark.sql.types.StringType)))))
      else Some(spark.read.parquet(parts.toIndexedSeq: _*))
    }
  }

  /** Offline maintenance: rewrite the store into few large sorted files per
    * partition. Streaming micro-batches (one `bid-N-k` file set each) and
    * incremental appends accumulate small parquet files — the classic
    * small-files problem that erodes scan efficiency at 100 TB (tiny row
    * groups defeat min/max pruning, file-open overhead dominates). Compaction
    * restores large sorted row groups while keeping layout and content
    * identical. Directory-level swap: run offline, like every reference
    * maintenance tool; streaming commit markers are untouched so replayed
    * micro-batches remain no-ops after compaction. */
  def compact(spark: SparkSession, root: String,
              filesPerPartition: Int = 8): Hta = {
    // a previous compact may have crashed mid-swap — recover BOTH dirs
    // before reading (readLevels guards levels itself, but the raw read
    // below has no per-read guard) and before swap() deletes any backup
    restoreStore(spark, root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a crashed stream may have left a PARTIAL publish (bid-N-k files with
    // no commit marker). Compacting would rewrite those into anonymous
    // part-files, so the restarted stream's replay cleanup (delete bid-N-*,
    // republish) would find nothing to delete and DUPLICATE the rows —
    // refuse until the stream has replayed (or the partials are removed).
    assertNoUncommittedPublishes(fs, root)
    // Crash-safe swap: the live dir is moved aside BEFORE the tmp moves in,
    // so no crash point leaves the store without data — worst case the
    // backup dir survives and the next compact (or a manual rename) recovers
    // it. Every rename result is checked; rename-returning-false would
    // otherwise silently drop raw/ (permanent loss) or levels/ (rebuildable).
    def swap(tmp: String, dst: String): Unit = {
      val tmpP = new org.apache.hadoop.fs.Path(tmp)
      val dstP = new org.apache.hadoop.fs.Path(dst)
      val bakP = new org.apache.hadoop.fs.Path(dst + "_compact_bak")
      fs.delete(bakP, true)
      if (fs.exists(dstP))
        require(fs.rename(dstP, bakP), s"compact: rename $dst -> $bakP failed")
      require(fs.rename(tmpP, dstP), s"compact: rename $tmp -> $dst failed")
      fs.delete(bakP, true)
    }
    withWriterCoalesce(spark) {
      readLevels(spark, root)
        .repartition(col("interval"),
          pmod(xxhash64(col("metric")), lit(filesPerPartition)))
        .sortWithinPartitions("metric", "time")
        .write.mode(SaveMode.Overwrite).partitionBy("interval")
        .parquet(s"$root/levels_compact_tmp")
      swap(s"$root/levels_compact_tmp", s"$root/levels")
      spark.read.parquet(s"$root/raw")
        .repartition(col("tb"),
          pmod(xxhash64(col("metric")), lit(filesPerPartition)))
        .sortWithinPartitions("metric", "time")
        .write.mode(SaveMode.Overwrite).partitionBy("tb")
        .parquet(s"$root/raw_compact_tmp")
      swap(s"$root/raw_compact_tmp", s"$root/raw")
    }
    open(spark, root)
  }

  /** S6/O5 — sorted catalog of metric names (catalog table when present). */
  def metricNames(hta: Hta): Seq[String] =
    hta.metrics.getOrElse(hta.raw.select("metric").distinct())
      .orderBy("metric").collect().map(_.getString(0)).toSeq
}
