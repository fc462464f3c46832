package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  * prefix-sum those on the driver, and broadcast the offsets back. ONE
  * corpus shuffle total (the range partition). The result is
  * partition-count-INVARIANT: the cumulative sum in key order is
  * well-defined no matter where the range boundaries fall (pinned by
  * PackingSpec).
  */
object Packing {

  /** Tag each doc with (n_tokens, seq_id, seq_offset) under concat-and-chunk
    * packing at `budget` tokens per sequence, in ascending `key` order. */
  def packSequences(docs: DataFrame, budget: Long, key: String = "doc_id",
                    nTokens: Column => Column =
                      t => size(TextOps.tokens(t)).cast("long"),
                    text: String = "text"): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    val base = docs.select(col(key), nTokens(col(text)).as("n_tokens"))
      .repartitionByRange(col(key))
      .sortWithinPartitions(key)
    // Partition-local running sum as a NARROW mapPartitions, not a window:
    // a Window over _pid would force Spark to re-shuffle the whole corpus
    // by hashpartitioning(_pid) (it cannot see that range partitioning
    // already isolates each partition id) — one full-corpus exchange for
    // nothing. The fold below runs on the already-range-sorted partitions.
    val outSchema = org.apache.spark.sql.types.StructType(base.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_pid",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("_cum_local",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val local = base.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var cum = 0L
      it.map { r =>
        val n = r.getLong(1)
        val out = org.apache.spark.sql.Row(r.get(0), n, pid, cum)
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
    val cum = local.join(broadcast(offDf), "_pid")
      .withColumn("cum_before", col("_offset") + col("_cum_local"))
    // floor division in the exact long domain: (cb - cb mod b) is a budget
    // multiple, so the double division below is exact for any real corpus
    cum
      .withColumn("seq_offset", pmod(col("cum_before"), lit(budget)))
      .withColumn("seq_id",
        ((col("cum_before") - col("seq_offset")) / lit(budget)).cast("long"))
      .select(col(key), col("n_tokens"), col("seq_id"), col("seq_offset"))
  }
}
