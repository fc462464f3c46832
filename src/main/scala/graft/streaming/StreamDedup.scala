package graft.streaming

import graft.pipeline.Dedup
import graft.store.BandIndex
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The continuous-ingest dedup loop over a persisted [[BandIndex]]: each
  * micro-batch of documents is probed against the stored bands
  * ([[Dedup.nearDupPairsAgainstIndex]] — corpus text never read,
  * signatures never recomputed), near-duplicates of the existing corpus
  * are dropped, and the SURVIVORS are appended to the index through the
  * idempotent bid-keyed [[BandIndex.appendBatch]] — so a crashed batch
  * replays to the identical end state and each drop costs O(drop +
  * touched buckets), the production nightly/continuous shape.
  *
  * Accepted docs become part of the corpus for every LATER batch
  * (batch-internal pairs are still the batch's own responsibility —
  * run [[Dedup.nearDupPairs]] inside the batch first if intra-drop
  * dedup is wanted; this sink dedups against the CORPUS). Doc_ids must
  * be new per the index append contract. */
object StreamDedup {

  def start(docs: DataFrame, indexPath: String, checkpoint: String,
            threshold: Double = 0.8, maxBucket: Int = 1000,
            text: String = "text"): StreamingQuery = {
    // A FRESH checkpoint restarts batch ids at 0, so any streaming
    // state a dead stream left at the index (commit markers, staged
    // intents) refers to DIFFERENT data under the same bids — a stale
    // staged intent would be published in place of this stream's first
    // batches (their novel thunks never run → docs silently dropped).
    // Clear it before the first batch; a RESUMED stream (checkpoint has
    // committed offsets) keeps the state, which is its own replay log.
    if (checkpointIsFresh(docs.sparkSession, checkpoint))
      BandIndex.clearStreamState(indexPath)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], bid: Long) =>
        // novel evaluates lazily INSIDE appendBatch: on a replay whose
        // first attempt finished staging, the staged rows publish and
        // the probe never re-runs against partially-published state
        BandIndex.appendBatch(indexPath, bid, text) {
          val h = BandIndex.open(indexPath)
          val dups = Dedup.nearDupPairsAgainstIndex(h, batch.toDF(),
              threshold, maxBucket, text)
            .select(col("batch_id").as("doc_id")).distinct()
          batch.toDF().join(dups, Seq("doc_id"), "left_anti")
        }
      }
      .start()
  }

  /** A checkpoint is fresh iff it has no committed offsets yet — i.e.
    * Structured Streaming has never written an `offsets/<bid>` WAL
    * entry there, so the next batch id is 0 and no replay is owed. */
  private[streaming] def checkpointIsFresh(spark: org.apache.spark.sql.SparkSession,
                                           checkpoint: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(checkpoint, "offsets")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    !fs.exists(p) || fs.listStatus(p).forall(!_.isFile)
  }
}
