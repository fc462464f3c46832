package graft.store

import graft.hta.AggOps
import graft.model.Meta
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
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
final case class Hta(raw: DataFrame, levels: DataFrame, meta: Meta)

object Warehouse {

  /** Batch ingest: write raw + build the full level ladder (A4+A5).
    * Monotonicity (F5) is asserted per metric via one window pass when
    * `validate` — mirroring the reference's ingest-time throw
    * (src/metric.cpp:515-524). */
  def ingest(points: DataFrame, meta: Meta, root: String,
             validate: Boolean = true): Hta = {
    val spark = points.sparkSession
    if (validate) {
      val w = Window.partitionBy("metric").orderBy("time")
      val bad = points
        .withColumn("_p", lag("time", 1).over(w))
        .where(col("time") === 0L || (col("_p").isNotNull && col("time") <= col("_p")))
        .limit(1).count()
      require(bad == 0L, "non-monotonic or zero timestamp in ingest batch")
    }

    points
      .withColumn("tb", AggOps.intervalBegin(col("time"), meta.intervalMax))
      .repartition(col("tb"))
      .sortWithinPartitions("metric", "time")
      .write.mode(SaveMode.Overwrite).partitionBy("tb")
      .parquet(s"$root/raw")

    // level ladder: L0 from raw (one gapLift shuffle), k→k+1 from level k
    val ladder = meta.levelIntervals
    val l0 = AggOps.levelBuild(points, ladder.head)
      .withColumn("interval", lit(ladder.head))
    writeLevel(l0, root, SaveMode.Overwrite)
    for ((parent, idx) <- ladder.zipWithIndex.drop(1)) {
      // read the just-written child back: rollup then scans the (small)
      // materialized level instead of recomputing the whole lineage
      val child = spark.read.parquet(s"$root/levels")
        .where(col("interval") === ladder(idx - 1)).drop("interval")
      val built = AggOps.rollup(child, ladder(idx - 1), parent)
        .withColumn("interval", lit(parent))
      writeLevel(built, root, SaveMode.Append)
    }

    writeMeta(meta, root, spark)
    open(spark, root)
  }

  private def writeLevel(level: DataFrame, root: String, mode: SaveMode): Unit =
    level.repartition(col("interval"))
      .sortWithinPartitions("metric", "time")
      .write.mode(mode).partitionBy("interval")
      .parquet(s"$root/levels")

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

  def open(spark: SparkSession, root: String): Hta =
    Hta(
      spark.read.parquet(s"$root/raw").drop("tb"),
      spark.read.parquet(s"$root/levels"),
      readMeta(spark, root))

  /** S6/O5 — sorted catalog of metric names. */
  def metricNames(hta: Hta): Seq[String] =
    hta.raw.select("metric").distinct()
      .orderBy("metric").collect().map(_.getString(0)).toSeq
}
