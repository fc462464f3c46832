package graft.registry

import graft.hta.{AggOps, Queries, Scoped, Series, Throttle}
import graft.model.{IntervalScope, Scope}
import graft.pipeline.{Ann, Cdc, Curate, Dedup, Eval, Joins, Multimodal, Packing, Profile, Sampling, Sketches, TextOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Constants, canonical CTE fragments, memoized store/index builders,
  * exact-aggregation helpers, and generated oracle-SQL shared by the
  * per-tier entry files ([[HtaEntries]], [[SeriesEntries]], ...). All
  * members are package-visible: the tier files `import Shared._`. */
private[registry] object Shared {

  // ---- shared constants (ns, µs-aligned like the event timestamps) ----
  val B = 1704500000000000000L  // inside the events time range (Jan 2024)
  val E = 1705500000000000000L
  val I1 = 3600000000000L       // 1 h  in ns — level 0 width
  val I2 = 36000000000000L      // 10 h in ns — level 1 width (factor 10)
  val NOW = 1767225600000000000L // fixed "now" for plausibility checks
  val COOLDOWN = 7200000000000L // 2 h throttle cooldown

  // µs-domain constants for the warehouse round-trip queries (q28/q29)
  val Bu = B / 1000
  val Eu = E / 1000
  val I1u = I1 / 1000
  val I2u = I2 / 1000

  val ptsCte: String = Tables.ptsCte

  /** DuckDB view of events in the µs time domain with value := cents. */
  val wptsCte =
    """wpts AS (
      |  SELECT event_type AS metric, epoch_us(ts) AS time,
      |         CAST(round(value*100) AS BIGINT) AS cents
      |  FROM events
      |)""".stripMargin

  /** DuckDB recompute of the warehouse's level table at `interval` (µs
    * domain, integer cents — exact doubles): CTE chain ending in `lv`
    * (metric, time, minimum, maximum, sum_cents, cnt, integral_cu,
    * active_time). Shared by q28/q33/q35. */
  def levelCteAt(interval: Long): String =
    s"""$wptsCte,
       |l AS (SELECT metric, time, cents,
       |        coalesce(lag(time) OVER (PARTITION BY metric ORDER BY time), time) AS prev,
       |        max(time) OVER (PARTITION BY metric) AS last_t
       |      FROM wpts),
       |s0 AS (SELECT metric, time, cents, prev, last_t,
       |        unnest(generate_series(prev - prev % $interval, time - time % $interval, $interval)) AS bstart FROM l),
       |segs AS (SELECT *, least(time, bstart + $interval) - greatest(prev, bstart) AS seg_len,
       |        (bstart = time - time % $interval) AS is_home FROM s0),
       |lv AS (SELECT metric, bstart AS time,
       |  min(CAST(cents AS DOUBLE)) AS minimum, max(CAST(cents AS DOUBLE)) AS maximum,
       |  CAST(sum(CASE WHEN is_home THEN cents ELSE 0 END) AS BIGINT) AS sum_cents,
       |  CAST(sum(CASE WHEN is_home THEN 1 ELSE 0 END) AS BIGINT) AS cnt,
       |  CAST(sum(cents * seg_len) AS BIGINT) AS integral_cu,
       |  CAST(sum(seg_len) AS BIGINT) AS active_time
       |  FROM segs WHERE bstart < last_t - last_t % $interval GROUP BY 1, 2)""".stripMargin

  /** Pin `df` to the session's configured shuffle parallelism on `key`
    * and eagerly localCheckpoint it — for an entry-level frame that is
    * referenced more than once with an expensive lineage (each reference
    * otherwise re-runs it) and would otherwise inherit a 1-partition AQE
    * coalesce into its fan-out consumer (the Dedup verify-tier lesson at
    * registry level). Values are unchanged; numbered repartition keeps
    * the partition count CPU/cluster-adaptive via
    * spark.sql.shuffle.partitions. */
  def pinCkpt(df: DataFrame, key: Column): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
      key).localCheckpoint()

  /** At-most-once per-key memoization. TrieMap.getOrElseUpdate may evaluate
    * its thunk more than once under concurrent first access — two threads
    * racing an ingest/index build against the same /tmp root (mode
    * overwrite) while a third reads the half-written layout.
    * ConcurrentHashMap.computeIfAbsent locks the bin: the builder runs
    * exactly once per key, and concurrent callers block until it lands. */
  def memo[V](cache: java.util.concurrent.ConcurrentHashMap[String, V],
                      k: String)(build: => V): V =
    cache.computeIfAbsent(k, _ => build)

  /** Per-sfDir warehouse of the events table, ingested in the µs domain with
    * value := cents (exact-integer aggregates); memoized per JVM. */
  val whCache = new java.util.concurrent.ConcurrentHashMap[String, graft.store.Hta]()
  def warehouseFor(s: SparkSession, d: String): graft.store.Hta =
    memo(whCache, d) {
      // collision-free dir encoding (String.hashCode collisions would make
      // two sf dirs share one root and corrupt the first's cached frames)
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(d.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      val root = s"/tmp/graft_wh_$digest"
      val ev = Tables.events(s, d).select(
        col("metric"),
        // integral division — float division at 1.7e18 ns magnitudes is
        // inexact (numerator exceeds 2^53) and would shift some µs by ±1
        expr("time div 1000").as("time"),
        col("cents").cast("double").as("value"))
      graft.store.Warehouse.ingest(ev, graft.model.Meta(I1u, I2u, 10), root,
        validate = false)
    }

  /** Multi-Meta warehouse (S7 wired to the store): 'click' gets a 1-hour
    * ladder via an exact config, every other metric a 6-hour ladder via the
    * catch-all prefix — so one store holds genuinely divergent ladders.
    * Memoized like [[warehouseFor]]. */
  val multiCache = new java.util.concurrent.ConcurrentHashMap[String, graft.store.MultiWarehouse.MultiHta]()
  def multiWarehouseFor(s: SparkSession, d: String): graft.store.MultiWarehouse.MultiHta =
    memo(multiCache, d) {
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(("multi:" + d).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      val ev = Tables.events(s, d).select(
        col("metric"), expr("time div 1000").as("time"),
        col("cents").cast("double").as("value"))
      graft.store.MultiWarehouse.ingest(ev,
        Seq(
          "click" -> graft.store.MetricConfig(graft.model.Meta(I1u, 100 * I1u, 10)),
          "" -> graft.store.MetricConfig(graft.model.Meta(6 * I1u, 600 * I1u, 10),
            isPrefix = true)),
        s"/tmp/graft_wh_$digest", validate = false)
    }

  /** T4 clone of [[warehouseFor]] under a 5×-coarser Meta; memoized like the
    * source store (the clone itself is the operation under test — its levels
    * are oracle-compared to a DuckDB recompute at the new interval). */
  val cloneCache = new java.util.concurrent.ConcurrentHashMap[String, graft.store.Hta]()
  def cloneFor(s: SparkSession, d: String): graft.store.Hta =
    memo(cloneCache, d) {
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(("clone:" + d).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      graft.tools.Tools.clone(warehouseFor(s, d),
        graft.model.Meta(5 * I1u, 500 * I1u, 10), s"/tmp/graft_wh_$digest")
    }

  /** Persisted IVF index over the embeddings table (sampled centroids —
    * kmeansIters=0 — so the q43 oracle can recompute the quantizer in SQL);
    * written once per JVM per sfDir, like [[warehouseFor]]. */
  val ivfCache = new java.util.concurrent.ConcurrentHashMap[String, graft.pipeline.Ann.IvfIndex]()
  val textIndexCache = new java.util.concurrent.ConcurrentHashMap[String, graft.store.TextIndex.Handle]()

  def textIndexFor(s: SparkSession, d: String): graft.store.TextIndex.Handle =
    memo(textIndexCache, d) {
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(("tix:" + d).getBytes("UTF-8")).take(8)
        .map("%02x".format(_)).mkString
      graft.store.TextIndex.write(docs(s, d), s"/tmp/graft_wh_$digest",
        buckets = 64)
    }

  val textIndexDeltaCache = new java.util.concurrent.ConcurrentHashMap[String, graft.store.TextIndex.Handle]()

  /** q172's index: built on 2/3 of the corpus, the rest APPENDED — the
    * incremental-maintenance path under the driver gate. */
  def textIndexDeltaFor(s: SparkSession, d: String): graft.store.TextIndex.Handle =
    memo(textIndexDeltaCache, d) {
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(("tix2:" + d).getBytes("UTF-8")).take(8)
        .map("%02x".format(_)).mkString
      val all = docs(s, d)
      val base = graft.store.TextIndex.write(
        all.where(pmod(col("doc_id"), lit(3)) =!= 2),
        s"/tmp/graft_wh_$digest", buckets = 64)
      graft.store.TextIndex.append(
        all.where(pmod(col("doc_id"), lit(3)) === 2), base)
    }

  val textIndexPosCache = new java.util.concurrent.ConcurrentHashMap[String, graft.store.TextIndex.Handle]()

  /** q174's positional tier: built once per JVM over [[textIndexFor]]'s
    * index — memoized like every other store, so a stale positions dir
    * from a prior JVM can never outlive a postings rebuild. */
  def textIndexPosFor(s: SparkSession, d: String): graft.store.TextIndex.Handle =
    memo(textIndexPosCache, d) {
      val h = textIndexFor(s, d)
      graft.store.TextIndex.writePositional(docs(s, d), h)
      h
    }
  val bandIndexCache = new java.util.concurrent.ConcurrentHashMap[String, graft.store.BandIndex.Handle]()

  /** q184's persisted LSH band index over the q101 corpus (doc_id%5 != 0),
    * built in two drops so the APPEND path sits under the driver gate —
    * the probe's oracle is q101's brute-force cross-set Jaccard. */
  def bandIndexFor(s: SparkSession, d: String): graft.store.BandIndex.Handle =
    memo(bandIndexCache, d) {
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(("bix:" + d).getBytes("UTF-8")).take(8)
        .map("%02x".format(_)).mkString
      val corpus = docs(s, d).where(pmod(col("doc_id"), lit(5)) =!= 0)
      val base = graft.store.BandIndex.write(
        corpus.where(pmod(col("doc_id"), lit(2)) === 1),
        s"/tmp/graft_wh_$digest", numHashes = 32, bands = 16)
      graft.store.BandIndex.append(
        corpus.where(pmod(col("doc_id"), lit(2)) === 0), base)
    }

  val bandIndexRetiredCache = new java.util.concurrent.ConcurrentHashMap[String, graft.store.BandIndex.Handle]()

  /** q188's index: the q184 corpus with every doc_id%7==0 RETIRED after
    * the build — probes must exclude them immediately (tombstone
    * anti-join), so the oracle is q101's cross-set Jaccard with the
    * retired ids removed from the corpus side. */
  def bandIndexRetiredFor(s: SparkSession, d: String): graft.store.BandIndex.Handle =
    memo(bandIndexRetiredCache, d) {
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(("bixr:" + d).getBytes("UTF-8")).take(8)
        .map("%02x".format(_)).mkString
      val corpus = docs(s, d).where(pmod(col("doc_id"), lit(5)) =!= 0)
      val h = graft.store.BandIndex.write(corpus,
        s"/tmp/graft_wh_$digest", numHashes = 32, bands = 16)
      graft.store.BandIndex.retire(
        corpus.where(pmod(col("doc_id"), lit(7)) === 0).select("doc_id"), h)
      h
    }

  def ivfIndexFor(s: SparkSession, d: String): graft.pipeline.Ann.IvfIndex =
    memo(ivfCache, d) {
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(("ivf:" + d).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      graft.pipeline.Ann.writeIvfIndex(Tables.embeddings(s, d),
        s"/tmp/graft_wh_$digest", nlist = 16, kmeansIters = 0)
    }

  val ivfDeltaCache = new java.util.concurrent.ConcurrentHashMap[String, graft.pipeline.Ann.IvfIndex]()

  /** q193's IVF index: built from the odd vec_ids, then the evens land
    * through the FROZEN-quantizer staged append ([[graft.store.IvfStore]])
    * — centroids are the first 16 odd vec_ids forever, which the oracle
    * replicates with a WHERE on its cent CTE. */
  def ivfDeltaIndexFor(s: SparkSession, d: String): graft.pipeline.Ann.IvfIndex =
    memo(ivfDeltaCache, d) {
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(("ivfd:" + d).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      val e = Tables.embeddings(s, d)
      graft.store.IvfStore.append(
        e.where(pmod(col("vec_id"), lit(2)) === 0),
        graft.pipeline.Ann.writeIvfIndex(
          e.where(pmod(col("vec_id"), lit(2)) === 1),
          s"/tmp/graft_wh_$digest", nlist = 16, kmeansIters = 0))
    }

  val ivfRetiredCache = new java.util.concurrent.ConcurrentHashMap[String, graft.pipeline.Ann.IvfIndex]()

  /** q194's index: q193's delta build with every vec_id%7==0 RETIRED —
    * probes must exclude them (tombstone anti-join, top-k backfilled)
    * while the quantizer stays frozen (retired SEED vectors still shape
    * the geometry; their values are index state, not live vectors). */
  def ivfRetiredIndexFor(s: SparkSession, d: String): graft.pipeline.Ann.IvfIndex =
    memo(ivfRetiredCache, d) {
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(("ivfr:" + d).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      val e = Tables.embeddings(s, d)
      val h = graft.store.IvfStore.append(
        e.where(pmod(col("vec_id"), lit(2)) === 0),
        graft.pipeline.Ann.writeIvfIndex(
          e.where(pmod(col("vec_id"), lit(2)) === 1),
          s"/tmp/graft_wh_$digest", nlist = 16, kmeansIters = 0))
      graft.store.IvfStore.retire(
        e.where(pmod(col("vec_id"), lit(7)) === 0).select("vec_id"), h)
      h
    }

  /** DuckDB recompute of the synthetic images' aHash (decode → 8×8
    * resize → strict-mean bits packed as two 32-bit halves) — the
    * closed-form pattern arithmetic. CTE chain ending in
    * `h(media_id, ahash_hi, ahash_lo)`; shared by q96/q155. */
  def imageHashCte: String =
    """ids AS (SELECT media_id FROM range(0, 300) t(media_id)
      |        WHERE media_id % 3 = 0),
      |px AS (SELECT i.media_id, p.k,
      |         (((i.media_id + 2 * (p.k % 8)) % 256) * 299
      |          + ((i.media_id + ((p.k // 8) * 12) // 8) % 256) * 587
      |          + ((i.media_id + 2 * (p.k % 8) * (((p.k // 8) * 12) // 8)) % 256) * 114)
      |         // 1000 AS lum
      |       FROM ids i, range(0, 64) p(k)),
      |s AS (SELECT media_id, sum(lum) AS sl FROM px GROUP BY 1),
      |b AS (SELECT px.media_id, px.k,
      |        CASE WHEN px.lum * 64 > s.sl THEN 1 ELSE 0 END AS bit
      |      FROM px JOIN s USING (media_id)),
      |h AS (SELECT media_id,
      |        CAST(sum(CASE WHEN k < 32
      |          THEN bit * (1::BIGINT << (31 - k)) ELSE 0 END) AS BIGINT) AS ahash_hi,
      |        CAST(sum(CASE WHEN k >= 32
      |          THEN bit * (1::BIGINT << (63 - k)) ELSE 0 END) AS BIGINT) AS ahash_lo
      |      FROM b GROUP BY 1)""".stripMargin

  /** Horizon for the q154 retention round-trip: an intervalMax-aligned
    * point a few buckets into the events range. */
  val RetireHu: Long = Bu - Bu % I2u + 5 * I2u

  /** Dedicated store ingested then RETIRED at [[RetireHu]] (memoized —
    * retire is destructive, so it gets its own root, never
    * [[warehouseFor]]'s shared one). */
  val retireCache = new java.util.concurrent.ConcurrentHashMap[String, graft.store.Hta]()
  def retiredFor(s: SparkSession, d: String): graft.store.Hta =
    memo(retireCache, d) {
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(("retire:" + d).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      val root = s"/tmp/graft_wh_$digest"
      val ev = Tables.events(s, d).select(col("metric"),
        expr("time div 1000").as("time"),
        col("cents").cast("double").as("value"))
      graft.store.Warehouse.ingest(ev, graft.model.Meta(I1u, I2u, 10), root,
        validate = false)
      graft.tools.Tools.retire(s, root, RetireHu)
    }

  /** Curation-partitioned corpus layout (`lang=/len_bin=` quartiles);
    * written once per JVM per sfDir, like [[ivfIndexFor]]. */
  val layoutCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def curationLayoutFor(s: SparkSession, d: String): String =
    memo(layoutCache, d) {
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(("layout:" + d).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      Curate.writeCurationLayout(Tables.documents(s, d),
        s"/tmp/graft_wh_$digest")
    }

  // ================= exact-integer HTA builders (Spark side) =============

  /** A2+A3+A4 — tumbling level build with exact integer outputs.
    * Mirrors AggOps.levelBuild; sum/integral in cents / cents·µs. */
  def levelExact(ev: DataFrame, interval: Long): DataFrame = {
    val lifted = AggOps.gapLift(ev)
    val last = lifted.groupBy("metric").agg(max(col("time")).as("_last"))
    val segs = AggOps.boundarySplit(
        lifted.join(broadcast(last), Seq("metric")), interval)
      .where(col("bstart") < AggOps.intervalBegin(col("_last"), interval))
    segs.groupBy(col("metric"), col("bstart").as("time"))
      .agg(exactAggCols.head, exactAggCols.tail: _*)
  }

  def exactAggCols: Seq[Column] = Seq(
    min("value").as("minimum"),
    max("value").as("maximum"),
    sum(when(col("is_home"), col("cents")).otherwise(0L)).as("sum_cents"),
    sum(when(col("is_home"), 1L).otherwise(0L)).as("cnt"),
    sum(col("cents") * (col("seg_len") / 1000).cast("long")).as("integral_cu"),
    sum("seg_len").as("active_time"))

  def mergeExactCols: Seq[Column] = Seq(
    min("minimum").as("minimum"), max("maximum").as("maximum"),
    sum("sum_cents").as("sum_cents"), sum("cnt").as("cnt"),
    sum("integral_cu").as("integral_cu"), sum("active_time").as("active_time"))

  /** A5 — hierarchical rollup of exact level rows (child → parent). */
  def rollupExact(level: DataFrame, childInterval: Long, parentInterval: Long): DataFrame = {
    val last = level.groupBy("metric")
      .agg((max(col("time")) + childInterval).as("_last_end"))
    level
      .join(broadcast(last), Seq("metric"))
      .withColumn("bstart", AggOps.intervalBegin(col("time"), parentInterval))
      .where(col("bstart") + parentInterval <= col("_last_end"))
      .groupBy(col("metric"), col("bstart").as("time"))
      .agg(mergeExactCols.head, mergeExactCols.tail: _*)
  }

  /** A6 — exact range aggregate with integer outputs + A10 mean. */
  def aggRangeExact(ev: DataFrame, begin: Long, end: Long): DataFrame = {
    // same de-skewed shape as Queries.aggregateRange: per-metric scalars in
    // one agg + broadcast join, chunked lag — no whole-metric windows
    val bounds = ev.groupBy("metric")
      .agg(min("time").as("_first"), max("time").as("_last"),
        min(when(col("time") >= end, col("time"))).as("_min_ge_end"))
    val joined = ev.join(broadcast(bounds), Seq("metric"))
      .where(lit(end) > col("_first") && lit(begin) <= col("_last"))
      .withColumn("_b", greatest(lit(begin), col("_first")))
      .withColumn("_e", least(lit(end), col("_last")))
    val scoped = joined
      .withColumn("_min_ge_e",
        when(col("_last") >= end, col("_min_ge_end")).otherwise(col("_last")))
      .where(col("time") >= col("_b") &&
        (col("time") < col("_e") || col("time") === col("_min_ge_e")))
    val contrib = graft.hta.AggOps.gapLiftChunked(scoped,
        math.max(1L, (end - begin) / 64), firstDefault = Some(col("_b")))
      .withColumnRenamed("prev_time", "_prev")
      .withColumn("_gap",
        when(col("time") < col("_e"), col("time") - col("_prev"))
          .otherwise(col("_e") - col("_prev")))
      .withColumn("_in", col("time") < col("_e"))
    val agg = contrib.groupBy("metric").agg(
      min("value").as("minimum"), max("value").as("maximum"),
      sum(when(col("_in"), col("cents")).otherwise(0L)).as("sum_cents"),
      sum(when(col("_in"), 1L).otherwise(0L)).as("cnt"),
      sum(col("cents") * (col("_gap") / 1000).cast("long")).as("integral_cu"),
      sum("_gap").as("active_time"))
    bounds.select("metric").join(agg, Seq("metric"), "left").select(
      col("metric"),
      coalesce(col("minimum"), lit(Double.PositiveInfinity)).as("minimum"),
      coalesce(col("maximum"), lit(Double.NegativeInfinity)).as("maximum"),
      coalesce(col("sum_cents"), lit(0L)).as("sum_cents"),
      coalesce(col("cnt"), lit(0L)).as("cnt"),
      coalesce(col("integral_cu"), lit(0L)).as("integral_cu"),
      coalesce(col("active_time"), lit(0L)).as("active_time"))
      .withColumn("mean_c",
        when(col("active_time") > 0,
          col("integral_cu").cast("double") / (col("active_time") / 1000).cast("long").cast("double"))
          .when(col("cnt") > 0, col("sum_cents").cast("double") / col("cnt").cast("double")))
  }

  // ======================= the oracle SQL fragments =======================

  /** q07/q08 — the A2/A3/A4 pipeline in DuckDB SQL at a given interval. */
  def levelSql(i: Long): String =
    s"""WITH $ptsCte,
       |l AS (SELECT metric, time, value, cents,
       |        coalesce(lag(time) OVER (PARTITION BY metric ORDER BY time), time) AS prev,
       |        max(time) OVER (PARTITION BY metric) AS last_t
       |      FROM pts),
       |s0 AS (SELECT metric, time, value, cents, prev, last_t,
       |        unnest(generate_series(prev - prev % $i, time - time % $i, $i)) AS bstart FROM l),
       |segs AS (SELECT *, least(time, bstart + $i) - greatest(prev, bstart) AS seg_len,
       |        (bstart = time - time % $i) AS is_home FROM s0)
       |SELECT metric, bstart AS time,
       |  min(value) AS minimum, max(value) AS maximum,
       |  CAST(sum(CASE WHEN is_home THEN cents ELSE 0 END) AS BIGINT) AS sum_cents,
       |  CAST(sum(CASE WHEN is_home THEN 1 ELSE 0 END) AS BIGINT) AS cnt,
       |  CAST(sum(cents * (seg_len // 1000)) AS BIGINT) AS integral_cu,
       |  CAST(sum(seg_len) AS BIGINT) AS active_time
       |FROM segs WHERE bstart < last_t - last_t % $i
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val shCte =
    """sh AS (SELECT doc_id, CASE WHEN len(s) >= 3
      |         THEN list_distinct([s[i] || ' ' || s[i+1] || ' ' || s[i+2] for i in range(1, len(s)-1)])
      |         ELSE [text] END AS st
      |       FROM (SELECT doc_id, text, string_split(text, ' ') AS s FROM documents))""".stripMargin

  /** Brute-force simhash pairs at a hamming threshold. Valid oracle for the
    * banded scale path too (q38): banding has recall exactly 1 for
    * maxDist < bands, so banded output == the all-pairs truth. */
  def simhashSql(maxDist: Int): String = {
    val sums = (0 until 60).map(j => s"sum(((h >> $j) & 1)*2 - 1) AS s$j").mkString(", ")
    val fp = (0 until 60).map(j => s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
       |h AS (SELECT doc_id, CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) AS h FROM tok),
       |s AS (SELECT doc_id, $sums FROM h GROUP BY doc_id),
       |fp AS (SELECT doc_id, $fp AS simhash FROM s)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxDist
       |ORDER BY 1, 2""".stripMargin
  }

  /** Hyperplane-LSH bucket id over the quantized embedding `e` — same
    * md5-derived hyperplanes as Ann.lshBucket, rendered as literals.
    * Shared by q32 and q51. */
  lazy val lshBucketSql: String = {
    def plane(p: Int) =
      (0 until 64).map(j => Ann.planeComponent(p, j)).mkString("[", ",", "]")
    (0 until 4).map { p =>
      s"""CASE WHEN list_sum(list_transform(list_zip(e, ${plane(p)}::BIGINT[]), t -> t[1]*t[2])) >= 0 THEN ${1L << p} ELSE 0 END"""
    }.mkString(" + ")
  }

  val quantCte =
    // x is FLOAT: the multiply must be forced to DOUBLE or DuckDB computes
    // it in float precision and rounds boundary values differently than
    // Spark's round(x.cast(double)*10000) (bit-level divergence first seen
    // at sf0.1, vec_id 500+ — sf0.01's 500 vectors happen to have no
    // float-boundary elements)
    """emb AS (SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS e
      |        FROM embeddings),
      |nrm AS (SELECT vec_id, e, sqrt(CAST(list_sum(list_transform(e, x -> x*x)) AS DOUBLE)) AS n
      |        FROM emb)""".stripMargin

  // ============================ the registry ==============================

  final case class Entry(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      sql: Option[String])

  def ev(s: SparkSession, dir: String) = Tables.events(s, dir)
  def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)
  def emb(s: SparkSession, dir: String) = Tables.embeddings(s, dir)

  // q77's HLL geometry (p = 9): shared by the Spark plan and the SQL. The
  // float constants interpolate via Scala's shortest-round-trip Double
  // repr and are CAST to DOUBLE in the SQL (a bare decimal literal would
  // be DuckDB DECIMAL arithmetic, not IEEE).
  val hllP = 9
  val hllM = 1 << hllP
  val hllWMod = 1L << (60 - hllP)
  val hllMaxRank = 60 - hllP + 1
  val hllAlpha = 0.7213 / (1.0 + 1.079 / hllM)
  val hllScale = math.pow(2.0, 2.0 * hllP + hllMaxRank)

  /** q73's fixed merge table (rank order), shared by the Spark plan and the
    * oracle's VALUES list. Chained merges (t+h → th+e → the+</w>) exercise
    * the rank-ordered cascade; the `</w>` merges exercise the end-of-word
    * symbol path. */
  val bpeApplyMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "the" -> "</w>",
    "i" -> "n", "in" -> "g", "ing" -> "</w>",
    "a" -> "n", "an" -> "d", "and" -> "</w>",
    "o" -> "</w>", "e" -> "r", "er" -> "</w>")

  /** q63's oracle: the learner's 30 bounded iterations UNROLLED as a
    * chained CTE (the recursive-CTE idiom can't re-derive a per-iteration
    * argmax from its own working table with standard single-reference
    * recursion, but the iteration count is a literal — so the chain is
    * generated, one (argmax, apply) CTE pair per merge). Each `m_k` is the
    * weighted adjacent-pair argmax with the learner's exact (count desc,
    * a, b) tie-break; each `v_{k+1}` applies the winner with the SAME
    * separator-anchored `replace` the q73 apply oracle uses (left-to-right
    * non-overlapping = the learner's greedy fold, spec-pinned equal in
    * BpeSpec). `AS MATERIALIZED` is load-bearing: DuckDB would otherwise
    * inline each doubly-referenced v_k and expand the chain exponentially.
    * Early stop (no pair >= minCount) degrades gracefully — an empty m_k
    * leaves v_{k+1} = v_k and every later m is empty too. */
  def bpeLearnOracleSql(numMerges: Int, minCount: Long): String = {
    val sep = "chr(31)"
    val v0 =
      s"""v0 AS MATERIALIZED (
         |  SELECT $sep || array_to_string(
         |           list_append(regexp_split_to_array(w, ''), '</w>'),
         |           $sep || $sep) || $sep AS seq,
         |         CAST(count(*) AS BIGINT) AS freq
         |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE w != '' GROUP BY w)""".stripMargin
    val steps = (0 until numMerges).map { k =>
      s"""m$k AS MATERIALIZED (
         |  SELECT a, b, cnt FROM (
         |    SELECT p.a AS a, p.b AS b, CAST(sum(freq) AS BIGINT) AS cnt
         |    FROM (SELECT freq,
         |            unnest([{'a': s[i], 'b': s[i+1]} for i in range(1, len(s))]) AS p
         |          FROM (SELECT freq, string_split(trim(seq, $sep),
         |                  $sep || $sep) AS s FROM v$k))
         |    GROUP BY 1, 2 HAVING sum(freq) >= $minCount)
         |  ORDER BY cnt DESC, a, b LIMIT 1),
         |v${k + 1} AS MATERIALIZED (
         |  SELECT CASE WHEN m.a IS NULL THEN v.seq
         |         ELSE replace(v.seq, $sep || m.a || $sep || $sep || m.b || $sep,
         |                      $sep || m.a || m.b || $sep) END AS seq, v.freq
         |  FROM v$k v LEFT JOIN m$k m ON TRUE)""".stripMargin
    }
    val union = (0 until numMerges)
      .map(k => s"SELECT CAST($k AS BIGINT) AS rank, a, b, cnt AS pair_count FROM m$k")
      .mkString("\nUNION ALL ")
    (v0 +: steps).mkString("WITH ", ",\n", "") +
      s"\nSELECT * FROM (\n$union) ORDER BY rank"
  }

  /** q46/q59's shared oracle: both tiers have the same output contract —
    * the Bloom filter only prunes the overlap join's input and the exact
    * verify removes every false positive, so one SQL covers both. */
  /** Shared winnowing-CTE chain (q161/q166): recomputes the identical
    * md5/rot60 8-gram hashes and replays the lag/lead run-length
    * selection rule (w=4); exposes `sel` (selected gram fingerprints)
    * and `sh` (short-doc whole-text fallbacks). */
  val winnowFpCtes: String = {
    val combine = (0 until 8)
      .map(i => TextOps.rot60Sql(s"hs[i+$i]", (7 * i) % 60))
      .reduce((x, y) => s"xor($x, $y)")
    // run of consecutive lags (resp. leads) with hash >= g: sum of
    // prefix-AND indicators, mirroring the Scala fold bit for bit
    def run(p: String): String = (1 to 3).map { j =>
      val conj = (1 to j)
        .map(i => s"$p$i IS NOT NULL AND $p$i >= g").mkString(" AND ")
      s"CASE WHEN $conj THEN 1 ELSE 0 END"
    }.mkString(" + ")
    s"""t AS (SELECT doc_id, text, string_split(text, ' ') AS s FROM documents),
       |h AS (SELECT doc_id, s,
       |        [CAST('0x' || substr(md5(x), 1, 15) AS BIGINT) for x in s] AS hs
       |      FROM t),
       |g0 AS (SELECT doc_id, unnest([{'pos': i - 1, 'g': $combine}
       |          for i in range(1, len(hs) - 6)]) AS pg
       |       FROM h WHERE len(s) >= 8),
       |gr AS (SELECT doc_id, pg.pos AS pos, pg.g AS g FROM g0),
       |wx AS (SELECT doc_id, pos, g,
       |        lag(g, 1) OVER win AS l1, lag(g, 2) OVER win AS l2,
       |        lag(g, 3) OVER win AS l3,
       |        lead(g, 1) OVER win AS r1, lead(g, 2) OVER win AS r2,
       |        lead(g, 3) OVER win AS r3,
       |        count(*) OVER (PARTITION BY doc_id) AS cnt,
       |        min(g) OVER (PARTITION BY doc_id) AS mn
       |       FROM gr WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
       |sel AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, g AS fp FROM wx
       |        WHERE (${run("l")}) + (${run("r")}) >= 3
       |           OR (cnt < 4 AND g = mn)),
       |sh AS (SELECT doc_id, CAST(0 AS BIGINT) AS pos,
       |         CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS fp
       |       FROM t WHERE len(s) < 8)""".stripMargin
  }

  val decontamOracleSql: String =
    """WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS s FROM documents),
      |g8 AS (SELECT doc_id, CASE WHEN len(s) >= 8
      |         THEN list_distinct([s[i]||' '||s[i+1]||' '||s[i+2]||' '||s[i+3]||' '||s[i+4]||' '||s[i+5]||' '||s[i+6]||' '||s[i+7]
      |                             for i in range(1, len(s)-6)])
      |         ELSE [text] END AS st
      |       FROM d),
      |bench AS (SELECT DISTINCT unnest(st) AS g FROM g8 WHERE doc_id % 11 = 0),
      |corp AS (SELECT doc_id, st FROM g8 WHERE doc_id % 11 != 0),
      |cg AS (SELECT doc_id, unnest(st) AS g FROM corp),
      |hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
      |         FROM cg JOIN bench USING (g) GROUP BY 1)
      |SELECT c.doc_id, CAST(len(c.st) AS BIGINT) AS n_grams,
      |  CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
      |  CAST(coalesce(h.n_overlap, 0) AS DOUBLE) / len(c.st) AS contam_frac,
      |  coalesce(h.n_overlap, 0) > 0 AS contaminated
      |FROM corp c LEFT JOIN hits h USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** q56's oracle: the integer PageRank recurrence UNROLLED as chained
    * CTEs (DuckDB's recursive CTEs disallow the grouped aggregate each
    * round needs). Mirrors [[graft.pipeline.Graph.pageRank]] constant for
    * constant: scale 1e6, damp 0.85e6, teleport 150000; sums are CAST to
    * BIGINT because DuckDB widens integer SUM to HUGEINT (the q42
    * dtype lesson). */
  def pageRankOracleSql(iters: Int): String = {
    val head =
      """WITH f AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
        |                  CAST(o_custkey AS BIGINT) + 1000000 AS dst
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT src, dst FROM f UNION SELECT dst, src FROM f),
        |dg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
        |n AS (SELECT DISTINCT src AS node FROM e),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM n)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""c$i AS (SELECT e.dst AS node, CAST(sum(p.r // dg.deg) AS BIGINT) AS s
         |       FROM e JOIN dg ON e.src = dg.src
         |       JOIN r${i - 1} p ON p.node = e.src GROUP BY 1),
         |r$i AS (SELECT n.node,
         |         CAST(150000 + (850000 * coalesce(c$i.s, 0)) // 1000000
         |           AS BIGINT) AS r
         |       FROM n LEFT JOIN c$i ON n.node = c$i.node)""".stripMargin
    }
    (head +: rounds).mkString(",\n") +
      s"\nSELECT node, r AS rank_scaled FROM r$iters ORDER BY node"
  }


  /** q180's oracle: the SAME minhash banding the Spark side runs —
    * md5-derived 60-bit term hashes through the [[Dedup.hashCoef]]
    * Carter-Wegman family (fixed literal coefficients), per-band raw
    * minima equality standing in for the xxhash64 band key (collisions of
    * which only ADD candidates that the exact accept rule discards) —
    * followed by q102's exact-integer accept restricted to candidates. */
  def cosineLshOracleSql(numHashes: Int, bands: Int,
                                 tauNum: Long, tauDen: Long): String = {
    val rows = numHashes / bands
    val P = Dedup.P
    val t2n = tauNum * tauNum; val t2d = tauDen * tauDen
    val mins = (0 until numHashes).map { i =>
      val (a, b) = Dedup.hashCoef(i)
      s"min((hx * $a + $b) % $P) AS m$i"
    }.grouped(4).map(_.mkString(", ")).mkString(",\n        ")
    val bandStructs = (0 until bands).map { b =>
      val ks = (0 until rows).map(r => s"'k$r': m${b * rows + r}").mkString(", ")
      s"{'band': $b, $ks}"
    }.mkString(",\n          ")
    val keyEq = (0 until rows).map(r => s"a.u.k$r = b.u.k$r").mkString(" AND ")
    s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |           FROM documents WHERE doc_id % 5 = 0),
       |f AS (SELECT doc_id, term, count(*) AS w FROM t GROUP BY 1, 2),
       |g AS (SELECT doc_id,
       |        CAST('0x' || substr(md5(term), 1, 15) AS BIGINT) % $P AS hx
       |      FROM f),
       |s AS (SELECT doc_id,
       |        $mins
       |      FROM g GROUP BY doc_id),
       |bd AS (SELECT doc_id,
       |         unnest([$bandStructs]) AS u
       |       FROM s),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bd a JOIN bd b
       |           ON a.u.band = b.u.band AND $keyEq AND a.doc_id < b.doc_id),
       |n2 AS (SELECT doc_id, CAST(sum(w*w) AS BIGINT) AS nn FROM f GROUP BY 1),
       |dt AS (SELECT c.doc_a, c.doc_b, CAST(sum(a.w * b.w) AS BIGINT) AS dot
       |       FROM cand c JOIN f a ON a.doc_id = c.doc_a
       |                   JOIN f b ON b.doc_id = c.doc_b AND b.term = a.term
       |       GROUP BY 1, 2)
       |SELECT doc_a, doc_b, dot, x.nn AS na2, y.nn AS nb2,
       |  CAST(dot AS DOUBLE) /
       |    sqrt(CAST(x.nn AS DOUBLE) * CAST(y.nn AS DOUBLE)) AS cosine
       |FROM dt JOIN n2 x ON dt.doc_a = x.doc_id
       |        JOIN n2 y ON dt.doc_b = y.doc_id
       |WHERE dot * dot * $t2d >= $t2n * x.nn * y.nn
       |ORDER BY 1, 2""".stripMargin
  }

  /** q129's lexicon: workload-vocabulary phrases (bigrams AND unigrams —
    * substring semantics, so unigrams are chosen with no superstring in
    * the vocabulary) grouped into plan-shape topics. */
  def dictTagLexicon: Seq[(String, String)] = Seq(
    "hash join" -> "topic_join", "merge join" -> "topic_join",
    "sort merge" -> "topic_join",
    "table scan" -> "topic_scan", "column scan" -> "topic_scan",
    "group agg" -> "topic_agg", "window agg" -> "topic_agg",
    "stream" -> "topic_stream", "batch" -> "topic_stream",
    "slow query" -> "topic_perf", "fast query" -> "topic_perf")
}
