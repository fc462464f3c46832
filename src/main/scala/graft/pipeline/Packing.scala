package graft.pipeline

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Sequence packing for LLM training: concatenate documents in a
  * deterministic order and cut the token stream into fixed-budget training
  * sequences (the standard concat-and-chunk scheme — documents may straddle
  * a sequence boundary). Each document is tagged with the sequence id and
  * intra-sequence offset where it starts.
  *
  * The core is a GLOBAL prefix sum over the corpus, computed WITHOUT a
  * global window (a single-partition window over 100 TB is the canonical
  * scale-killer): range-partition by the order key, run a PARTITION-LOCAL
  * running sum as a narrow sorted mapPartitions fold, collect one row per
  * partition (the partition totals — #partitions rows, driver-bounded),
  * prefix-sum those on the driver, and broadcast the offsets back. The
  * result is partition-count-INVARIANT: the cumulative sum in key order is
  * well-defined no matter where the range boundaries fall (pinned by
  * PackingSpec).
  */
object Packing {

  /** Tag each doc with (n_tokens, seq_id, seq_offset) under concat-and-chunk
    * packing at `budget` tokens per sequence, in ascending `key` order.
    * A null text (or null token count) packs as 0 tokens.
    *
    * The prefix sum inherently needs two passes (partition totals, then the
    * tagged rows), so the narrow two-long-per-doc base is PERSISTED
    * (memory-and-disk) for the duration: re-executing the lineage instead
    * would not only scan and range-shuffle the corpus twice, it would be
    * WRONG at scale — RangePartitioner samples its boundaries with a seed
    * derived from the fresh RDD id, so two executions can place the range
    * cuts differently and the first pass's per-partition offsets would be
    * added to a second pass's different partitioning. The cache pins one
    * materialized partitioning for both passes; callers streaming many
    * corpora through can `unpersist` the returned plan's cache via
    * `spark.catalog.clearCache()` between runs. */
  def packSequences(docs: DataFrame, budget: Long, key: String = "doc_id",
                    nTokens: Column => Column =
                      t => size(TextOps.tokens(t)).cast("long"),
                    text: String = "text"): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    val base = docs
      .select(col(key), coalesce(nTokens(col(text)), lit(0L)).as("n_tokens"))
      .repartitionByRange(col(key))
      .sortWithinPartitions(key)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Partition-local running sum as a NARROW mapPartitions, not a window:
    // a Window over _pid would force Spark to re-shuffle the whole corpus
    // by hashpartitioning(_pid) (it cannot see that range partitioning
    // already isolates each partition id) — one full-corpus exchange for
    // nothing. The fold below runs on the already-range-sorted partitions.
    val outSchema = StructType(base.schema.fields ++ Seq(
      StructField("_pid", IntegerType, nullable = false),
      StructField("_cum_local", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val local = base.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var cum = 0L
      it.map { r =>
        val n = r.getLong(1)
        val out = Row(r.get(0), n, pid, cum)
        cum += n
        out
      }
    }(enc)
    // one row per partition; range partitions are ordered by key, so the
    // driver-side scan in pid order IS the global prefix
    val totals = local.groupBy("_pid").agg(sum("n_tokens").as("_total"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.map(_._1).zip(
      totals.map(_._2).scanLeft(0L)(_ + _)).toSeq // prefix EXCLUDES own total
    val spark = docs.sparkSession
    import spark.implicits._
    val offDf = offsets.toDF("_pid", "_offset")
    local.join(broadcast(offDf), "_pid")
      .withColumn("cum_before", col("_offset") + col("_cum_local"))
      .withColumn("seq_offset", pmod(col("cum_before"), lit(budget)))
      // ANSI integer division on longs — exact at any corpus size (a double
      // division would start rounding past 2^53 total tokens)
      .withColumn("seq_id", expr(s"cum_before div ${budget}L"))
      .select(col(key), col("n_tokens"), col("seq_id"), col("seq_offset"))
  }
}
