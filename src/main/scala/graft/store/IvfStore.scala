package graft.store

import graft.pipeline.Ann
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintenance discipline for the persisted IVF ANN index
  * ([[Ann.writeIvfIndex]]) — the embedding-space sibling of [[BandIndex]],
  * for the pipeline that lands embeddings continuously and must not
  * re-quantize the corpus per drop:
  *
  *  - [[append]]: a new drop is assigned under the FROZEN stored
  *    quantizer (centroids never move — the standard IVF delta contract;
  *    recall drifts only as far as the data distribution does, and a
  *    rebuild refreshes the geometry) and staged into the `list_id=`
  *    partitions by rename — time ∝ drop, the corpus is never re-read;
  *  - [[retire]]: takedowns land in a `tombstones/` table that probes
  *    anti-join BEFORE ranking, so retired vectors stop matching
  *    immediately and the top-k backfills from live vectors exactly as
  *    a fresh index of the survivors would;
  *  - [[compact]]: applies tombstones physically and merges the small
  *    files per-drop appends accumulate, crash-safe via the
  *    swap-with-backup discipline;
  *  - [[open]]: heals any interrupted append (abort before the commit
  *    marker, roll forward after), restores interrupted swaps, aborts
  *    interrupted retires — then reads the quantizer.
  *
  * Same staged-append/commit-marker file protocol as [[TextIndex]] and
  * [[BandIndex]]; vec_ids must be new per the append contract
  * (re-appending a retired id is not supported). */
object IvfStore {
  import TextIndex.{fsOf, writeSmall, renameOrFail, restoreInterruptedSwap}

  /** Stage a drop's assigned+normed rows, then publish by rename. The
    * probe result after append is spec-pinned equal to an index WRITTEN
    * with the same centroids over the union corpus. */
  def append(newVecs: DataFrame, index: Ann.IvfIndex): Ann.IvfIndex = {
    val fs = fsOf(index.root)
    healPending(index.root)
    val pending = new HPath(index.root, "append.pending")
    require(!fs.exists(pending),
      s"append.pending survived heal — concurrent append? ${index.root}")
    Ann.ivfStoredRows(newVecs, index.centroids)
      .repartition(col("list_id"))
      .write.partitionBy("list_id").mode("overwrite")
      .parquet(s"${index.root}/append.pending/vectors")
    // commit point: everything before is abortable, everything after
    // rolls forward (publish is idempotent — renamed files leave the
    // staging listing, Spark part names are unique per job)
    writeSmall(fs, new HPath(pending, "_staged"), "")
    publishPending(index.root)
    index
  }

  private def healPending(root: String): Unit = {
    val fs = fsOf(root)
    val pending = new HPath(root, "append.pending")
    if (fs.exists(pending)) {
      if (fs.exists(new HPath(pending, "_staged"))) publishPending(root)
      else fs.delete(pending, true)
    }
  }

  private def publishPending(root: String): Unit = {
    val fs = fsOf(root)
    val pending = new HPath(root, "append.pending")
    val staged = new HPath(pending, "vectors")
    if (fs.exists(staged)) {
      for (d <- fs.listStatus(staged) if d.isDirectory) {
        val dst = new HPath(s"$root/vectors/${d.getPath.getName}")
        fs.mkdirs(dst) // rename silently returns false without the parent
        for (f <- fs.listStatus(d.getPath) if f.isFile)
          renameOrFail(fs, f.getPath, new HPath(dst, f.getPath.getName))
      }
    }
    fs.delete(pending, true)
  }

  /** Idempotent, batch-id-keyed streaming append — the continuous form
    * of [[append]] for `foreachBatch` sinks, with [[BandIndex.appendBatch]]'s
    * replay discipline verbatim:
    *
    *  1. commit marker `_stream_commits/<bid>` present → no-op;
    *  2. staged rows present (a prior attempt finished staging) → publish
    *     them without re-evaluating `novel` — the batch's accepted set
    *     was fixed at first evaluation, so a probe that feeds `novel`
    *     never sees this bid's own partially published rows;
    *  3. otherwise evaluate `novel`, stage its assigned+normed rows under
    *     the FROZEN quantizer, then publish with bid-keyed names derived
    *     from the staged file names (stable across replays — files
    *     already published are skipped, never deleted), write meta-free
    *     state, marker LAST, drop staging.
    *
    * `autoCompactAt > 0` bounds small-file fragmentation exactly as in
    * [[BandIndex.appendBatch]] (post-marker, replay-safe). */
  def appendBatch(root: String, bid: Long, autoCompactAt: Int = 0)
                 (novel: => DataFrame): Unit = {
    val fs = fsOf(root)
    val marker = new HPath(s"$root/_stream_commits/$bid")
    if (fs.exists(marker)) return
    val h = open(org.apache.spark.sql.SparkSession.active, root)
    val staging = s"$root/_stream_staging/bid=$bid"
    val stagedDone = new HPath(s"$staging/_staged")
    if (!fs.exists(stagedDone)) {
      Ann.ivfStoredRows(novel, h.centroids)
        .repartition(col("list_id"))
        .write.partitionBy("list_id").mode("overwrite")
        .parquet(s"$staging/vectors")
      writeSmall(fs, stagedDone, "")
    }
    val staged = new HPath(s"$staging/vectors")
    if (fs.exists(staged)) {
      for (d <- fs.listStatus(staged) if d.isDirectory) {
        val dst = new HPath(s"$root/vectors/${d.getPath.getName}")
        fs.mkdirs(dst)
        for (f <- fs.listStatus(d.getPath)
             if f.isFile && f.getPath.getName.startsWith("part-")) {
          val dstF = new HPath(dst, s"bid-$bid-${f.getPath.getName}")
          if (fs.exists(dstF)) fs.delete(f.getPath, false)
          else renameOrFail(fs, f.getPath, dstF)
        }
      }
    }
    fs.mkdirs(new HPath(s"$root/_stream_commits"))
    writeSmall(fs, marker, "")
    fs.delete(new HPath(staging), true)
    if (autoCompactAt > 0 &&
        countPartFiles(fs, new HPath(root, "vectors")) > autoCompactAt)
      compact(org.apache.spark.sql.SparkSession.active, h)
  }

  private def countPartFiles(fs: org.apache.hadoop.fs.FileSystem,
                             dir: HPath): Int =
    if (!fs.exists(dir)) 0
    else fs.listStatus(dir).map { st =>
      if (st.isDirectory) countPartFiles(fs, st.getPath)
      else if (st.getPath.getName.contains("part-")) 1 else 0
    }.sum

  /** Drop all streaming bookkeeping at an index root — a NEW stream
    * (fresh checkpoint, bids restarting at 0) must call this before its
    * first batch, for exactly [[BandIndex.clearStreamState]]'s reasons. */
  private[graft] def clearStreamState(root: String): Unit = {
    val fs = fsOf(root)
    fs.delete(new HPath(root, "_stream_commits"), true)
    fs.delete(new HPath(root, "_stream_staging"), true)
  }

  /** Retire vectors: ids land in `tombstones/` through the staged-rename
    * discipline (interrupted retires abort at [[open]]; tombstones are a
    * set, so re-running is harmless). Probes exclude them immediately;
    * [[compact]] makes the drop physical. Retiring a vector whose id
    * seeded a CENTROID does not move the quantizer — frozen geometry is
    * the delta contract, and the seed's VALUE is part of the index, not
    * a live vector. */
  def retire(ids: DataFrame, index: Ann.IvfIndex): Ann.IvfIndex = {
    val fs = fsOf(index.root)
    val pending = new HPath(index.root, "retire.pending")
    fs.delete(pending, true)
    ids.select(col("vec_id").cast("long").as("vec_id")).distinct()
      .write.mode("overwrite").parquet(s"${index.root}/retire.pending")
    val dst = new HPath(index.root, "tombstones")
    fs.mkdirs(dst)
    for (f <- fs.listStatus(pending)
         if f.isFile && f.getPath.getName.startsWith("part-"))
      renameOrFail(fs, f.getPath, new HPath(dst, f.getPath.getName))
    fs.delete(pending, true)
    index
  }

  /** The retired-id table, if any retirements are outstanding. */
  private[graft] def tombstones(spark: SparkSession,
                                root: String): Option[DataFrame] = {
    val fs = fsOf(root)
    val dir = new HPath(root, "tombstones")
    if (fs.exists(dir) &&
        fs.listStatus(dir).exists(f => f.isFile &&
          f.getPath.getName.startsWith("part-")))
      Some(spark.read.parquet(s"$root/tombstones"))
    else None
  }

  /** Tombstone-aware probe: [[Ann.ivfProbeTopK]] with outstanding
    * retirements excluded before ranking. */
  def probeTopK(queries: DataFrame, index: Ann.IvfIndex, k: Int,
                nprobe: Int = 4): DataFrame =
    Ann.ivfProbeTopK(queries, index, k, nprobe,
      exclude = tombstones(queries.sparkSession, index.root))

  /** Apply tombstones physically and merge per-drop file sets into
    * `filesPerPartition` sorted files per list. Probe answers are
    * identical before and after (spec-pinned); crash-safe via the
    * swap-with-backup discipline [[open]] restores. */
  def compact(spark: SparkSession, index: Ann.IvfIndex,
              filesPerPartition: Int = 1): Ann.IvfIndex = {
    require(filesPerPartition >= 1)
    val fs = fsOf(index.root)
    restoreInterruptedSwap(fs, index.root, "vectors")
    healPending(index.root)
    val tomb = tombstones(spark, index.root)
    val live = tomb match {
      case Some(t) => spark.read.parquet(s"${index.root}/vectors")
        .join(broadcast(t.select(col("vec_id").as("vid"))),
          Seq("vid"), "left_anti")
      case None => spark.read.parquet(s"${index.root}/vectors")
    }
    live
      .repartition(col("list_id"),
        pmod(xxhash64(col("vid")), lit(filesPerPartition)))
      .sortWithinPartitions("vid")
      .write.mode("overwrite").partitionBy("list_id")
      .parquet(s"${index.root}/vectors_compact_tmp")
    val tmpP = new HPath(index.root, "vectors_compact_tmp")
    val dstP = new HPath(index.root, "vectors")
    val bakP = new HPath(index.root, "vectors_compact_bak")
    fs.delete(bakP, true)
    if (fs.exists(dstP)) renameOrFail(fs, dstP, bakP)
    renameOrFail(fs, tmpP, dstP)
    fs.delete(bakP, true)
    fs.delete(new HPath(index.root, "tombstones"), true)
    index
  }

  /** Heal-then-open: resolve any interrupted append/compact/retire, then
    * read the stored quantizer. */
  def open(spark: SparkSession, root: String): Ann.IvfIndex = {
    val fs = fsOf(root)
    restoreInterruptedSwap(fs, root, "vectors")
    healPending(root)
    fs.delete(new HPath(root, "retire.pending"), true)
    Ann.openIvfIndex(spark, root)
  }
}
