package graft.registry

import graft.hta.{AggOps, Queries, Scoped, Series, Throttle}
import graft.model.{IntervalScope, Scope}
import graft.pipeline.{Ann, Cdc, Curate, Dedup, Eval, Joins, Multimodal, Packing, Profile, Sampling, Sketches, TextOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The driver-facing query registry: each entry pairs a Spark implementation
  * of one SURVEY.md §2 operator (or LLM-pipeline operator) with equivalent
  * DuckDB SQL for the driver's oracle compare.
  *
  * ORACLE-PARITY RULES (the driver hash-compares values after sorting
  * columns by name):
  *  - every aggregate is computed in the exact integer domain (cents = 100×
  *    value, time in int64 ns, integral in cents·µs) — float summation order
  *    can then never flip a bit;
  *  - doubles in outputs are either raw parquet values or single IEEE
  *    divisions/sqrts of identical integers — deterministic on both engines;
  *  - every column is aliased identically in the Spark plan and the SQL.
  */
object Registry {

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

  import Tables.ptsCte

  /** DuckDB view of events in the µs time domain with value := cents. */
  private val wptsCte =
    """wpts AS (
      |  SELECT event_type AS metric, epoch_us(ts) AS time,
      |         CAST(round(value*100) AS BIGINT) AS cents
      |  FROM events
      |)""".stripMargin

  /** DuckDB recompute of the warehouse's level table at `interval` (µs
    * domain, integer cents — exact doubles): CTE chain ending in `lv`
    * (metric, time, minimum, maximum, sum_cents, cnt, integral_cu,
    * active_time). Shared by q28/q33/q35. */
  private def levelCteAt(interval: Long): String =
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

  /** At-most-once per-key memoization. TrieMap.getOrElseUpdate may evaluate
    * its thunk more than once under concurrent first access — two threads
    * racing an ingest/index build against the same /tmp root (mode
    * overwrite) while a third reads the half-written layout.
    * ConcurrentHashMap.computeIfAbsent locks the bin: the builder runs
    * exactly once per key, and concurrent callers block until it lands. */
  private def memo[V](cache: java.util.concurrent.ConcurrentHashMap[String, V],
                      k: String)(build: => V): V =
    cache.computeIfAbsent(k, _ => build)

  /** Per-sfDir warehouse of the events table, ingested in the µs domain with
    * value := cents (exact-integer aggregates); memoized per JVM. */
  private val whCache = new java.util.concurrent.ConcurrentHashMap[String, graft.store.Hta]()
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
  private val multiCache = new java.util.concurrent.ConcurrentHashMap[String, graft.store.MultiWarehouse.MultiHta]()
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
  private val cloneCache = new java.util.concurrent.ConcurrentHashMap[String, graft.store.Hta]()
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
  private val ivfCache = new java.util.concurrent.ConcurrentHashMap[String, graft.pipeline.Ann.IvfIndex]()
  private val textIndexCache = new java.util.concurrent.ConcurrentHashMap[String, graft.store.TextIndex.Handle]()

  def textIndexFor(s: SparkSession, d: String): graft.store.TextIndex.Handle =
    memo(textIndexCache, d) {
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(("tix:" + d).getBytes("UTF-8")).take(8)
        .map("%02x".format(_)).mkString
      graft.store.TextIndex.write(docs(s, d), s"/tmp/graft_wh_$digest",
        buckets = 64)
    }

  private val textIndexDeltaCache = new java.util.concurrent.ConcurrentHashMap[String, graft.store.TextIndex.Handle]()

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

  private val textIndexPosCache = new java.util.concurrent.ConcurrentHashMap[String, graft.store.TextIndex.Handle]()

  /** q174's positional tier: built once per JVM over [[textIndexFor]]'s
    * index — memoized like every other store, so a stale positions dir
    * from a prior JVM can never outlive a postings rebuild. */
  def textIndexPosFor(s: SparkSession, d: String): graft.store.TextIndex.Handle =
    memo(textIndexPosCache, d) {
      val h = textIndexFor(s, d)
      graft.store.TextIndex.writePositional(docs(s, d), h)
      h
    }
  def ivfIndexFor(s: SparkSession, d: String): graft.pipeline.Ann.IvfIndex =
    memo(ivfCache, d) {
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(("ivf:" + d).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      graft.pipeline.Ann.writeIvfIndex(Tables.embeddings(s, d),
        s"/tmp/graft_wh_$digest", nlist = 16, kmeansIters = 0)
    }

  /** DuckDB recompute of the synthetic images' aHash (decode → 8×8
    * resize → strict-mean bits packed as two 32-bit halves) — the
    * closed-form pattern arithmetic. CTE chain ending in
    * `h(media_id, ahash_hi, ahash_lo)`; shared by q96/q155. */
  private def imageHashCte: String =
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
  private val retireCache = new java.util.concurrent.ConcurrentHashMap[String, graft.store.Hta]()
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
  private val layoutCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
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

  private def exactAggCols: Seq[Column] = Seq(
    min("value").as("minimum"),
    max("value").as("maximum"),
    sum(when(col("is_home"), col("cents")).otherwise(0L)).as("sum_cents"),
    sum(when(col("is_home"), 1L).otherwise(0L)).as("cnt"),
    sum(col("cents") * (col("seg_len") / 1000).cast("long")).as("integral_cu"),
    sum("seg_len").as("active_time"))

  private def mergeExactCols: Seq[Column] = Seq(
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
  private def levelSql(i: Long): String =
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

  private val shCte =
    """sh AS (SELECT doc_id, CASE WHEN len(s) >= 3
      |         THEN list_distinct([s[i] || ' ' || s[i+1] || ' ' || s[i+2] for i in range(1, len(s)-1)])
      |         ELSE [text] END AS st
      |       FROM (SELECT doc_id, text, string_split(text, ' ') AS s FROM documents))""".stripMargin

  /** Brute-force simhash pairs at a hamming threshold. Valid oracle for the
    * banded scale path too (q38): banding has recall exactly 1 for
    * maxDist < bands, so banded output == the all-pairs truth. */
  private def simhashSql(maxDist: Int): String = {
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
  private lazy val lshBucketSql: String = {
    def plane(p: Int) =
      (0 until 64).map(j => Ann.planeComponent(p, j)).mkString("[", ",", "]")
    (0 until 4).map { p =>
      s"""CASE WHEN list_sum(list_transform(list_zip(e, ${plane(p)}::BIGINT[]), t -> t[1]*t[2])) >= 0 THEN ${1L << p} ELSE 0 END"""
    }.mkString(" + ")
  }

  private val quantCte =
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

  private def ev(s: SparkSession, dir: String) = Tables.events(s, dir)
  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)
  private def emb(s: SparkSession, dir: String) = Tables.embeddings(s, dir)

  // q77's HLL geometry (p = 9): shared by the Spark plan and the SQL. The
  // float constants interpolate via Scala's shortest-round-trip Double
  // repr and are CAST to DOUBLE in the SQL (a bare decimal literal would
  // be DuckDB DECIMAL arithmetic, not IEEE).
  private val hllP = 9
  private val hllM = 1 << hllP
  private val hllWMod = 1L << (60 - hllP)
  private val hllMaxRank = 60 - hllP + 1
  private val hllAlpha = 0.7213 / (1.0 + 1.079 / hllM)
  private val hllScale = math.pow(2.0, 2.0 * hllP + hllMaxRank)

  /** q73's fixed merge table (rank order), shared by the Spark plan and the
    * oracle's VALUES list. Chained merges (t+h → th+e → the+</w>) exercise
    * the rank-ordered cascade; the `</w>` merges exercise the end-of-word
    * symbol path. */
  private val bpeApplyMerges: Seq[(String, String)] = Seq(
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
  private def bpeLearnOracleSql(numMerges: Int, minCount: Long): String = {
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
  private val winnowFpCtes: String = {
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

  private val decontamOracleSql: String =
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
  private def pageRankOracleSql(iters: Int): String = {
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

  val entries: Seq[Entry] = Seq(

    // ---- S1/F1/Q1: scans + scope predicates ----
    Entry("q01_raw_scan",
      (s, d) => ev(s, d).where(col("time") >= B && col("time") < E)
        .select("metric", "time", "value").orderBy("metric", "time"),
      Some(s"""WITH $ptsCte SELECT metric, time, value FROM pts
              |WHERE time >= $B AND time < $E ORDER BY 1, 2""".stripMargin)),

    Entry("q02_scope_extended",
      (s, d) => Scoped.scopedRange(
          ev(s, d).select("metric", "time", "value"), B, E,
          IntervalScope(Scope.Extended, Scope.Extended))
        .select("metric", "time", "value").orderBy("metric", "time"),
      Some(s"""WITH $ptsCte,
              |lb AS (SELECT metric, max(time) AS t FROM pts WHERE time <= $B GROUP BY 1),
              |le AS (SELECT metric, min(time) AS t FROM pts WHERE time >= $E GROUP BY 1)
              |SELECT p.metric, p.time, p.value FROM pts p
              |LEFT JOIN lb ON p.metric = lb.metric
              |LEFT JOIN le ON p.metric = le.metric
              |WHERE (p.time > $B OR p.time = lb.t) AND (p.time < $E OR p.time = le.t)
              |ORDER BY 1, 2""".stripMargin)),

    Entry("q03_scope_open_inf",
      (s, d) => Scoped.scopedRange(
          ev(s, d).select("metric", "time", "value"), B, E,
          IntervalScope(Scope.Open, Scope.Infinity))
        .select("metric", "time", "value").orderBy("metric", "time"),
      Some(s"""WITH $ptsCte SELECT metric, time, value FROM pts
              |WHERE time > $B ORDER BY 1, 2""".stripMargin)),

    // ---- A7/O2/O3 ----
    Entry("q04_count_closed",
      (s, d) => Queries.countRange(ev(s, d), B, E, IntervalScope(Scope.Closed, Scope.Closed))
        .orderBy("metric"),
      Some(s"""WITH $ptsCte SELECT metric, count(*) AS n FROM pts
              |WHERE time >= $B AND time <= $E GROUP BY 1 ORDER BY 1""".stripMargin)),

    Entry("q05_last",
      (s, d) => Queries.last(ev(s, d).select("metric", "time", "value")).orderBy("metric"),
      Some(s"""WITH $ptsCte,
              |m AS (SELECT metric, max(time) AS time FROM pts GROUP BY 1)
              |-- max value at the last timestamp: deterministic under
              |-- duplicate timestamps, matching Spark's (time, value) max_by
              |SELECT m.metric, m.time, max(p.value) AS value
              |FROM m JOIN pts p ON p.metric = m.metric AND p.time = m.time
              |GROUP BY 1, 2 ORDER BY 1""".stripMargin)),

    Entry("q06_range_bounds",
      (s, d) => Queries.rangeBounds(ev(s, d)).orderBy("metric"),
      Some(s"""WITH $ptsCte SELECT metric, min(time) AS first_time, max(time) AS last_time
              |FROM pts GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- A1-A5: the aggregation algebra ----
    Entry("q07_level_1h",
      (s, d) => levelExact(ev(s, d), I1).orderBy("metric", "time"),
      Some(levelSql(I1))),

    Entry("q08_rollup_10h",
      (s, d) => rollupExact(levelExact(ev(s, d), I1), I1, I2).orderBy("metric", "time"),
      Some(levelSql(I2))),

    // ---- A6 + A10 ----
    Entry("q09_agg_range",
      (s, d) => aggRangeExact(ev(s, d), B, E).orderBy("metric"),
      Some(s"""WITH $ptsCte,
              |bounds AS (SELECT metric, min(time) AS f, max(time) AS l FROM pts GROUP BY 1),
              |cl AS (SELECT metric, greatest($B, f) AS b, least($E, l) AS e FROM bounds
              |       WHERE $E > f AND $B <= l),
              |sc0 AS (SELECT p.metric, p.time, p.value, p.cents, cl.b, cl.e FROM pts p
              |        JOIN cl ON p.metric = cl.metric WHERE p.time >= cl.b),
              |sc AS (SELECT *, min(CASE WHEN time >= e THEN time END)
              |         OVER (PARTITION BY metric) AS mge FROM sc0),
              |con AS (SELECT metric, time, value, cents, b, e, time < e AS isin,
              |         coalesce(lag(time) OVER (PARTITION BY metric ORDER BY time), b) AS prev
              |        FROM sc WHERE time < e OR time = mge),
              |agg AS (SELECT metric,
              |  min(value) AS minimum, max(value) AS maximum,
              |  CAST(sum(CASE WHEN isin THEN cents ELSE 0 END) AS BIGINT) AS sum_cents,
              |  CAST(sum(CASE WHEN isin THEN 1 ELSE 0 END) AS BIGINT) AS cnt,
              |  CAST(sum(cents * (((CASE WHEN isin THEN time ELSE e END) - prev) // 1000)) AS BIGINT) AS integral_cu,
              |  CAST(sum((CASE WHEN isin THEN time ELSE e END) - prev) AS BIGINT) AS active_time
              |  FROM con GROUP BY 1)
              |SELECT b.metric,
              |  coalesce(a.minimum, CAST('infinity' AS DOUBLE)) AS minimum,
              |  coalesce(a.maximum, CAST('-infinity' AS DOUBLE)) AS maximum,
              |  coalesce(a.sum_cents, 0) AS sum_cents, coalesce(a.cnt, 0) AS cnt,
              |  coalesce(a.integral_cu, 0) AS integral_cu,
              |  coalesce(a.active_time, 0) AS active_time,
              |  CASE WHEN coalesce(a.active_time, 0) > 0
              |       THEN CAST(a.integral_cu AS DOUBLE) / CAST(a.active_time // 1000 AS DOUBLE)
              |       WHEN coalesce(a.cnt, 0) > 0
              |       THEN CAST(a.sum_cents AS DOUBLE) / CAST(a.cnt AS DOUBLE) END AS mean_c
              |FROM bounds b LEFT JOIN agg a ON b.metric = a.metric
              |ORDER BY 1""".stripMargin)),

    // ---- A9 positional smoothing ----
    Entry("q10_smooth4",
      (s, d) => {
        val lv = levelExact(ev(s, d), I1)
        val w = Window.partitionBy("metric").orderBy("time")
        lv.withColumn("_chunk", ((row_number().over(w) - 1) / 4).cast("long"))
          .groupBy("metric", "_chunk")
          .agg(min("time").as("time"), mergeExactCols: _*)
          .drop("_chunk")
          .select("metric", "time", "minimum", "maximum", "sum_cents", "cnt",
            "integral_cu", "active_time")
          .orderBy("metric", "time")
      },
      Some(s"""WITH lv AS (${levelSql(I1).replace("ORDER BY 1, 2", "")}),
              |rn AS (SELECT *, row_number() OVER (PARTITION BY metric ORDER BY time) - 1 AS r
              |       FROM lv)
              |SELECT metric, min(time) AS time, min(minimum) AS minimum, max(maximum) AS maximum,
              |  CAST(sum(sum_cents) AS BIGINT) AS sum_cents, CAST(sum(cnt) AS BIGINT) AS cnt,
              |  CAST(sum(integral_cu) AS BIGINT) AS integral_cu,
              |  CAST(sum(active_time) AS BIGINT) AS active_time
              |FROM rn GROUP BY metric, r // 4 ORDER BY 1, 2""".stripMargin)),

    // ---- F2/F3 validity + plausibility ----
    Entry("q11_repair",
      (s, d) => {
        val f = ev(s, d).where(!isnan(col("value")) &&
          col("value") >= 1.0 && col("value") <= 300.0)
        val w = Window.partitionBy("metric").orderBy("time")
        f.withColumn("_p", lag("time", 1).over(w))
          .where(col("_p").isNull || col("time") > col("_p"))
          .groupBy("metric")
          .agg(count(lit(1)).as("cnt"), min("value").as("vmin"),
            max("value").as("vmax"), sum("cents").as("sum_cents"))
          .orderBy("metric")
      },
      Some(s"""WITH $ptsCte,
              |f AS (SELECT * FROM pts WHERE NOT isnan(value) AND value >= 1.0 AND value <= 300.0),
              |m AS (SELECT *, lag(time) OVER (PARTITION BY metric ORDER BY time) AS p FROM f)
              |SELECT metric, count(*) AS cnt, min(value) AS vmin, max(value) AS vmax,
              |  CAST(sum(cents) AS BIGINT) AS sum_cents
              |FROM m WHERE p IS NULL OR time > p GROUP BY 1 ORDER BY 1""".stripMargin)),

    Entry("q12_check",
      (s, d) => {
        val w = Window.partitionBy("metric").orderBy("time")
        ev(s, d).withColumn("_p", lag("time", 1).over(w))
          .groupBy("metric").agg(
            count(lit(1)).as("n_rows"),
            sum(when(isnan(col("value")) ||
              col("value") === Double.PositiveInfinity ||
              col("value") === Double.NegativeInfinity, 1L).otherwise(0L)).as("n_nonfinite"),
            sum(when(abs(col("value")) > 1e20, 1L).otherwise(0L)).as("n_implausible"),
            sum(when(col("time") < 946684800000000000L, 1L).otherwise(0L)).as("n_before_2000"),
            sum(when(col("time") > NOW, 1L).otherwise(0L)).as("n_future"),
            sum(when(col("_p").isNotNull && col("time") <= col("_p"), 1L).otherwise(0L))
              .as("n_nonmono"))
          .orderBy("metric")
      },
      Some(s"""WITH $ptsCte,
              |m AS (SELECT *, lag(time) OVER (PARTITION BY metric ORDER BY time) AS p FROM pts)
              |SELECT metric, count(*) AS n_rows,
              |  CAST(sum(CASE WHEN isnan(value) OR isinf(value) THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite,
              |  CAST(sum(CASE WHEN abs(value) > 1e20 THEN 1 ELSE 0 END) AS BIGINT) AS n_implausible,
              |  CAST(sum(CASE WHEN time < 946684800000000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_before_2000,
              |  CAST(sum(CASE WHEN time > $NOW THEN 1 ELSE 0 END) AS BIGINT) AS n_future,
              |  CAST(sum(CASE WHEN p IS NOT NULL AND time <= p THEN 1 ELSE 0 END) AS BIGINT) AS n_nonmono
              |FROM m GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- F4 throttle. The fold (keep iff last_kept + cooldown < time) is
    // stateful but still SQL-expressible as a recursive CTE: iteration k
    // yields each metric's (k+1)-th kept timestamp. (metric, time) is unique
    // in events, so the value join is deterministic. ----
    Entry("q13_throttle",
      (s, d) => Throttle.throttle(ev(s, d).select("metric", "time", "value"), COOLDOWN)
        .orderBy("metric", "time"),
      Some(s"""WITH RECURSIVE $ptsCte,
              |kept AS (
              |  SELECT metric, min(time) AS time FROM pts GROUP BY 1
              |  UNION ALL
              |  SELECT metric, nxt AS time FROM (
              |    SELECT k.metric, (SELECT min(p.time) FROM pts p
              |                      WHERE p.metric = k.metric
              |                        AND p.time > k.time + $COOLDOWN) AS nxt
              |    FROM kept k) WHERE nxt IS NOT NULL
              |)
              |SELECT k.metric, k.time, p.value FROM kept k
              |JOIN pts p ON p.metric = k.metric AND p.time = k.time
              |ORDER BY 1, 2""".stripMargin)),

    // ---- Q2 retrieveFlex end-to-end (in-memory level ladder over events) ----
    Entry("q21_flex_route",
      (s, d) => {
        val e = ev(s, d)
        val lv1 = levelExact(e, I1).cache() // consumed twice: canon + rollup
        val lv2 = rollupExact(lv1, I1, I2)
        val canon = (df: DataFrame, i: Long) => df.select(
          col("metric"), lit(i).as("interval"), col("time"),
          col("minimum"), col("maximum"), col("sum_cents").as("sum"),
          col("cnt").as("count"), col("integral_cu").as("integral"),
          col("active_time"))
        val mem = graft.store.Hta(
          e.select("metric", "time", "value"),
          canon(lv1, I1).unionByName(canon(lv2, I2)),
          graft.model.Meta(I1, I2, 10))
        // limit 5h → coarsest fitting level is 1h, positional smooth ×5
        graft.hta.RetrieveFlex.retrieveFlex(mem, B, E, 5 * I1, smooth = true)
          .select(col("metric"), col("time"), col("minimum"), col("maximum"),
            col("sum").as("sum_cents"), col("count").as("cnt"),
            col("integral").as("integral_cu"), col("active_time"))
          .orderBy("metric", "time")
      },
      Some(s"""WITH lv AS (${levelSql(I1).replace("ORDER BY 1, 2", "")}),
              |lb AS (SELECT metric, max(time) AS t FROM lv WHERE time <= $B GROUP BY 1),
              |le AS (SELECT metric, min(time) AS t FROM lv WHERE time >= $E GROUP BY 1),
              |sc AS (SELECT l.* FROM lv l
              |       LEFT JOIN lb ON l.metric = lb.metric
              |       LEFT JOIN le ON l.metric = le.metric
              |       WHERE (l.time > $B OR l.time = lb.t) AND l.time < $E),
              |rn AS (SELECT *, row_number() OVER (PARTITION BY metric ORDER BY time) - 1 AS r
              |       FROM sc)
              |SELECT metric, min(time) AS time, min(minimum) AS minimum,
              |  max(maximum) AS maximum, CAST(sum(sum_cents) AS BIGINT) AS sum_cents,
              |  CAST(sum(cnt) AS BIGINT) AS cnt,
              |  CAST(sum(integral_cu) AS BIGINT) AS integral_cu,
              |  CAST(sum(active_time) AS BIGINT) AS active_time
              |FROM rn GROUP BY metric, r // 5 ORDER BY 1, 2""".stripMargin)),

    // ---- Q3 raw→Row lift (interval-0 rows with per-point gaps) ----
    Entry("q22_raw_rows",
      (s, d) => {
        val scoped = Scoped.scopedRange(
          ev(s, d).select("metric", "time", "value", "cents"), B, E,
          IntervalScope(Scope.Closed, Scope.Open))
        val w = Window.partitionBy("metric").orderBy("time")
        scoped.withColumn("_prev", coalesce(lag("time", 1).over(w), col("time")))
          .select(col("metric"), col("time"), col("value"),
            (col("cents") * ((col("time") - col("_prev")) / 1000).cast("long")).as("integral_cu"),
            (col("time") - col("_prev")).as("active_time"))
          .orderBy("metric", "time")
      },
      Some(s"""WITH $ptsCte,
              |sc AS (SELECT * FROM pts WHERE time >= $B AND time < $E),
              |l AS (SELECT metric, time, value, cents,
              |        coalesce(lag(time) OVER (PARTITION BY metric ORDER BY time), time) AS prev
              |      FROM sc)
              |SELECT metric, time, value,
              |  CAST(cents * ((time - prev) // 1000) AS BIGINT) AS integral_cu,
              |  CAST(time - prev AS BIGINT) AS active_time
              |FROM l ORDER BY 1, 2""".stripMargin)),

    // ---- text fingerprinting (winnowing-style min-hash of 8-gram windows) ----
    Entry("q23_fingerprint",
      (s, d) => TextOps.minFingerprint(docs(s, d), w = 8).orderBy("doc_id"),
      Some {
        // window hash = XOR of positionally-rotated 60-bit token hashes;
        // rotation rendered as overflow-free div/mod (TextOps.rot60Sql)
        val combine = (0 until 8)
          .map(i => TextOps.rot60Sql(s"hs[i+$i]", (7 * i) % 60))
          .reduce((a, b) => s"xor($a, $b)")
        s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS s FROM documents),
           |h AS (SELECT doc_id, text,
           |        [CAST('0x' || substr(md5(x), 1, 15) AS BIGINT) for x in s] AS hs
           |      FROM t),
           |g AS (SELECT doc_id, text,
           |        CASE WHEN len(hs) >= 8 THEN
           |          [$combine for i in range(1, len(hs) - 6)]
           |        ELSE NULL END AS gs
           |      FROM h)
           |SELECT doc_id,
           |  CASE WHEN gs IS NOT NULL THEN list_min(gs)
           |       ELSE CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) END AS fingerprint
           |FROM g ORDER BY 1""".stripMargin
      }),

    // ---- quality scoring (ratios of exact integers → deterministic doubles) ----
    Entry("q24_quality",
      (s, d) => TextOps.qualityScore(docs(s, d)).orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS s FROM documents),
              |v AS (SELECT doc_id,
              |  CAST(len(s) AS BIGINT) AS n_tokens,
              |  CAST(len(list_distinct(s)) AS BIGINT) AS n_uniq,
              |  CAST(length(text) - len(s) + 1 AS BIGINT) AS tok_chars,
              |  CAST(len(list_filter(s, x -> x IN (${TextOps.EnStop.map(w => s"'$w'").mkString(",")}))) AS BIGINT) AS stop_cnt
              |  FROM t)
              |SELECT doc_id,
              |  CAST(stop_cnt AS DOUBLE) / n_tokens AS stop_ratio,
              |  CAST(n_uniq AS DOUBLE) / n_tokens AS uniq_ratio,
              |  CAST(tok_chars AS DOUBLE) / n_tokens AS mean_tok_len,
              |  (stop_cnt >= 1 AND n_tokens >= 10) AS quality_ok
              |FROM v ORDER BY 1""".stripMargin)),

    // ---- warehouse round-trip: S3/S4 sinks + Q2/A6 over the real store.
    //      The store is ingested in the µs time domain with value := cents,
    //      so every stored aggregate (incl. integral = cents·µs) stays an
    //      integer below 2^53 — double arithmetic is then exact and the
    //      DuckDB recomputation matches bit-for-bit. ----
    Entry("q28_warehouse_flex",
      (s, d) => {
        val hta = warehouseFor(s, d)
        graft.hta.RetrieveFlex.retrieveFlex(hta, Bu, Eu, 5 * I1u, smooth = true)
          .select(col("metric"), col("time"), col("minimum"), col("maximum"),
            col("sum").cast("long").as("sum_cents"),
            col("count").as("cnt"),
            col("integral").cast("long").as("integral_cu"),
            col("active_time"))
          .orderBy("metric", "time")
      },
      Some(s"""WITH ${levelCteAt(I1u)},
              |lb AS (SELECT metric, max(time) AS t FROM lv WHERE time <= $Bu GROUP BY 1),
              |le AS (SELECT metric, min(time) AS t FROM lv WHERE time >= $Eu GROUP BY 1),
              |sc AS (SELECT l.* FROM lv l
              |       LEFT JOIN lb ON l.metric = lb.metric
              |       LEFT JOIN le ON l.metric = le.metric
              |       WHERE (l.time > $Bu OR l.time = lb.t) AND l.time < $Eu),
              |rn AS (SELECT *, row_number() OVER (PARTITION BY metric ORDER BY time) - 1 AS r
              |       FROM sc)
              |SELECT metric, min(time) AS time, min(minimum) AS minimum,
              |  max(maximum) AS maximum, CAST(sum(sum_cents) AS BIGINT) AS sum_cents,
              |  CAST(sum(cnt) AS BIGINT) AS cnt,
              |  CAST(sum(integral_cu) AS BIGINT) AS integral_cu,
              |  CAST(sum(active_time) AS BIGINT) AS active_time
              |FROM rn GROUP BY metric, r // 5 ORDER BY 1, 2""".stripMargin)),

    // A6 over the warehouse via the telescoped plan. integral omitted from
    // the oracle columns: the whole-range integral exceeds 2^53 cents·µs,
    // where float summation order is no longer provably neutral.
    Entry("q29_warehouse_telescope",
      (s, d) => {
        val hta = warehouseFor(s, d)
        graft.hta.Telescope.aggregateRange(hta, Bu, Eu)
          .select(col("metric"), col("minimum"), col("maximum"),
            col("sum").cast("long").as("sum_cents"), col("count").as("cnt"),
            col("active_time"))
          .orderBy("metric")
      },
      Some(s"""WITH $wptsCte,
              |bounds AS (SELECT metric, min(time) AS f, max(time) AS l FROM wpts GROUP BY 1),
              |cl AS (SELECT metric, greatest($Bu, f) AS b, least($Eu, l) AS e FROM bounds
              |       WHERE $Eu > f AND $Bu <= l),
              |sc0 AS (SELECT p.metric, p.time, p.cents, cl.b, cl.e FROM wpts p
              |        JOIN cl ON p.metric = cl.metric WHERE p.time >= cl.b),
              |sc AS (SELECT *, min(CASE WHEN time >= e THEN time END)
              |         OVER (PARTITION BY metric) AS mge FROM sc0),
              |con AS (SELECT metric, time, cents, b, e, time < e AS isin,
              |         coalesce(lag(time) OVER (PARTITION BY metric ORDER BY time), b) AS prev
              |        FROM sc WHERE time < e OR time = mge)
              |SELECT metric,
              |  min(CAST(cents AS DOUBLE)) AS minimum, max(CAST(cents AS DOUBLE)) AS maximum,
              |  CAST(sum(CASE WHEN isin THEN cents ELSE 0 END) AS BIGINT) AS sum_cents,
              |  CAST(sum(CASE WHEN isin THEN 1 ELSE 0 END) AS BIGINT) AS cnt,
              |  CAST(sum((CASE WHEN isin THEN time ELSE e END) - prev) AS BIGINT) AS active_time
              |FROM con GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- relational surface (SURVEY §2.7: engine-provided via Spark;
    //      exercised on the TPC-H-ish testdata; exact-integer aggregates) ----
    Entry("q25_tpch_pricing",
      (s, d) => {
        val li = s.read.parquet(s"$d/lineitem.parquet")
          .where(col("l_shipdate") <= lit("2024-06-30").cast("timestamp"))
        li.groupBy("l_returnflag", "l_linestatus").agg(
            sum(round(col("l_quantity"), 0).cast("long")).as("sum_qty"),
            sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("sum_base_cents"),
            sum(round(col("l_extendedprice") * 100, 0).cast("long") *
              (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))).as("sum_disc_e4"),
            count(lit(1)).as("cnt"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
             |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
             |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) *
             |       (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_e4,
             |  count(*) AS cnt
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '2024-06-30 00:00:00'
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Entry("q26_tpch_top_orders",
      (s, d) => {
        val cust = s.read.parquet(s"$d/customer.parquet")
          .where(col("c_mktsegment") === "BUILDING")
        val ord = s.read.parquet(s"$d/orders.parquet")
        val li = s.read.parquet(s"$d/lineitem.parquet")
        // broadcast the customer filter onto orders FIRST: only the
        // BUILDING-segment orders (~1/5) enter the fact-fact orderkey
        // shuffle — joining li⋈ord before filtering would shuffle the
        // full orders table and then discard 4/5 of it
        ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
          .join(li, li("l_orderkey") === ord("o_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long") *
            (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))).as("revenue_e4"))
          .orderBy(col("revenue_e4").desc, col("l_orderkey"))
          .limit(10)
          .select(col("l_orderkey"), col("revenue_e4"))
      },
      Some("""SELECT l_orderkey,
             |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) *
             |       (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_e4
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |GROUP BY l_orderkey, o_orderdate
             |ORDER BY revenue_e4 DESC, l_orderkey LIMIT 10""".stripMargin)),

    Entry("q27_region_acctbal",
      (s, d) => {
        val cust = s.read.parquet(s"$d/customer.parquet")
        val nat = s.read.parquet(s"$d/nation.parquet")
        val reg = s.read.parquet(s"$d/region.parquet")
        cust.join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
          .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_cust"),
            sum(round(col("c_acctbal") * 100, 0).cast("long")).as("acctbal_cents"))
          .orderBy("r_name")
      },
      Some("""SELECT r_name, count(*) AS n_cust,
             |  CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS acctbal_cents
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- as-of join + sessionization (SURVEY §2.7 natural extensions) ----
    Entry("q30_asof_join",
      (s, d) => {
        val raw = s.read.parquet(s"$d/events.parquet")
        val base = raw.select(
          col("user_id"), Tables.tsNs(raw).as("time"),
          col("value"), col("event_type"))
        Queries.asofJoin(
            base.where(col("event_type") === "click"),
            base.where(col("event_type") === "view"),
            keys = Seq("user_id"), valueName = "last_view_value")
          .orderBy("user_id", "time")
      },
      Some("""WITH ev AS (SELECT user_id, epoch_us(ts)*1000 AS time, value, event_type
             |            FROM events)
             |SELECT c.user_id, c.time, c.value, v.value AS last_view_value
             |FROM (SELECT * FROM ev WHERE event_type = 'click') c
             |ASOF LEFT JOIN (
             |  -- dedupe ties: max value per timestamp, matching the Spark
             |  -- side's deterministic (time, value) carry order
             |  SELECT user_id, time, max(value) AS value
             |  FROM ev WHERE event_type = 'view' GROUP BY 1, 2) v
             |  ON c.user_id = v.user_id AND v.time <= c.time
             |ORDER BY 1, 2""".stripMargin)),

    Entry("q31_sessionize",
      (s, d) => {
        val raw = s.read.parquet(s"$d/events.parquet")
        val base = raw.select(
          col("user_id"), Tables.tsNs(raw).as("time"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        graft.pipeline.Sessionize.sessionize(base, "user_id", "time",
            gapNs = 1800000000000L, // 30 min
            aggs = Seq(sum("cents").as("sum_cents")))
          .orderBy("user_id", "session_start")
      },
      Some("""WITH ev AS (SELECT user_id, epoch_us(ts)*1000 AS time,
             |              CAST(round(value*100) AS BIGINT) AS cents FROM events),
             |m AS (SELECT *, CASE WHEN coalesce(lag(time) OVER (PARTITION BY user_id ORDER BY time),
             |                -9223372036854775808) < time - 1800000000000 THEN 1 ELSE 0 END AS nw
             |      FROM ev),
             |sid AS (SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY time
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
             |        FROM m)
             |SELECT user_id, min(time) AS session_start, max(time) AS session_end,
             |  count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS sum_cents
             |FROM sid GROUP BY user_id, s ORDER BY 1, 2""".stripMargin)),

    // ---- LLM pipeline: dedup ----
    Entry("q14_dedup_exact",
      (s, d) => Dedup.exactDupGroups(docs(s, d)).orderBy("doc_id"),
      Some("""WITH h AS (SELECT doc_id, md5(text) AS content_hash,
             |  count(*) OVER (PARTITION BY md5(text)) AS group_size FROM documents)
             |SELECT doc_id, content_hash, CAST(group_size AS BIGINT) AS group_size
             |FROM h WHERE group_size > 1 ORDER BY 1""".stripMargin)),

    Entry("q15_dedup_neardup",
      (s, d) => Dedup.nearDupPairs(docs(s, d), threshold = 0.8)
        .orderBy("doc_a", "doc_b"),
      Some(s"""WITH $shCte
              |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |  CAST(len(list_intersect(a.st, b.st)) AS BIGINT) AS inter,
              |  CAST(len(a.st) + len(b.st) - len(list_intersect(a.st, b.st)) AS BIGINT) AS uni,
              |  CAST(len(list_intersect(a.st, b.st)) AS DOUBLE) /
              |    (len(a.st) + len(b.st) - len(list_intersect(a.st, b.st))) AS jaccard
              |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              |WHERE CAST(len(list_intersect(a.st, b.st)) AS DOUBLE) /
              |    (len(a.st) + len(b.st) - len(list_intersect(a.st, b.st))) >= 0.8
              |ORDER BY 1, 2""".stripMargin)),

    // ---- LLM pipeline: text analysis ----
    Entry("q16_text_stats",
      (s, d) => TextOps.tokenStats(docs(s, d)).orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS s FROM documents)
              |SELECT doc_id, CAST(len(s) AS BIGINT) AS n_tokens,
              |  CAST(len(list_distinct(s)) AS BIGINT) AS n_uniq,
              |  CAST(length(text) AS BIGINT) AS len_chars,
              |  CAST(length(text) - len(s) + 1 AS BIGINT) AS tok_chars,
              |  CAST(len(list_filter(s, x -> x IN (${TextOps.EnStop.map(w => s"'$w'").mkString(",")}))) AS BIGINT) AS stop_cnt,
              |  CAST((length(text) + 3) // 4 AS BIGINT) AS tok_est,
              |  CAST(len(regexp_extract_all(text, '${TextOps.BpeSplit}')) AS BIGINT) AS tok_bpe
              |FROM t ORDER BY 1""".stripMargin)),

    Entry("q17_lang_id",
      (s, d) => TextOps.langId(docs(s, d)).orderBy("doc_id"),
      Some {
        def hits(ws: Seq[String]) =
          s"CAST(len(list_filter(s, x -> x IN (${ws.map(w => s"'$w'").mkString(",")}))) AS BIGINT)"
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
           |v AS (SELECT doc_id, ${hits(TextOps.EnStop)} AS en_hits,
           |  ${hits(TextOps.DeStop)} AS de_hits, ${hits(TextOps.FrStop)} AS fr_hits FROM t)
           |SELECT doc_id, en_hits, de_hits, fr_hits,
           |  CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
           |       WHEN de_hits >= fr_hits THEN 'de' ELSE 'fr' END AS lang_pred
           |FROM v ORDER BY 1""".stripMargin
      }),

    Entry("q18_simhash_pairs",
      (s, d) => TextOps.simhashPairs(TextOps.simhash(docs(s, d)), maxDist = 4)
        .orderBy("doc_a", "doc_b"),
      Some(simhashSql(4))),

    // the 100 TB path for the same operator: capped band blocking instead
    // of all-pairs. maxDist=3 < bands=4 → pigeonhole recall 1, so the
    // brute-force SQL is an exact oracle for the banded plan.
    Entry("q38_simhash_banded",
      (s, d) => Dedup.simhashBandPairs(TextOps.simhash(docs(s, d)),
          bands = 4, bits = 60, maxDist = 3)
        .orderBy("doc_a", "doc_b"),
      Some(simhashSql(3))),

    // deterministic corpus splitting: content-hash buckets, not rand() —
    // reproducible run-to-run and stable under corpus refresh. The oracle
    // renders the identical 60-bit md5-prefix arithmetic.
    Entry("q39_hash_split",
      (s, d) => Sampling.hashSplit(docs(s, d).select("doc_id"), "doc_id",
          weights = Seq(0.9, 0.05, 0.05), labels = Seq("train", "val", "test"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CASE WHEN b < 900000 THEN 'train'
             |       WHEN b < 950000 THEN 'val' ELSE 'test' END AS split
             |FROM (SELECT doc_id,
             |        CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
             |          % 1000000 AS b
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // per-key quota (the per-domain/source cap of corpus curation): first
    // 50 events per metric by time. Time is strictly increasing per metric
    // (F5 contract), so the row_number order is total and deterministic.
    Entry("q40_per_key_cap",
      (s, d) => Sampling.perKeyCap(ev(s, d).select("metric", "time", "cents"),
          "metric", Seq(col("time")), k = 50)
        .orderBy("metric", "time"),
      Some(s"""WITH $ptsCte
              |SELECT metric, time, cents
              |FROM (SELECT metric, time, cents,
              |        row_number() OVER (PARTITION BY metric ORDER BY time) AS rn
              |      FROM pts)
              |WHERE rn <= 50 ORDER BY metric, time""".stripMargin)),

    // sequence packing: global prefix sum computed WITHOUT a global window
    // (range partition + local windows + broadcast offsets); the result is
    // partition-invariant, so the single-window SQL is an exact oracle
    Entry("q42_pack_sequences",
      (s, d) => Packing.packSequences(docs(s, d), budget = 512)
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id,
             |            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |          FROM documents),
             |c AS (SELECT doc_id, n_tokens,
             |        sum(n_tokens) OVER (ORDER BY doc_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS cb
             |      FROM t)
             |SELECT doc_id, n_tokens,
             |       CAST(cb // 512 AS BIGINT) AS seq_id,
             |       CAST(cb % 512 AS BIGINT) AS seq_offset
             |FROM c ORDER BY doc_id""".stripMargin)),

    // corpus vocabulary: the (tf desc, token) order is total, so the
    // top-100 cut is deterministic in both engines
    Entry("q41_vocabulary",
      (s, d) => TextOps.vocabulary(docs(s, d), topK = 100),
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |            FROM documents)
             |SELECT token, CAST(count(*) AS BIGINT) AS tf,
             |       CAST(count(DISTINCT doc_id) AS BIGINT) AS df
             |FROM tok GROUP BY token
             |ORDER BY tf DESC, token LIMIT 100""".stripMargin)),

    // ---- Gopher-style repetition quality signals: Spark counts 60-bit
    //      gram hashes, the oracle counts textual grams — counts agree by
    //      gram-hash injectivity (q15's argument) ----
    Entry("q44_repetition",
      (s, d) => TextOps.repetitionStats(docs(s, d)).orderBy("doc_id"),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
             |t AS (SELECT doc_id, unnest(s) AS g FROM d),
             |b AS (SELECT doc_id, unnest([s[i] || ' ' || s[i+1] for i in range(1, len(s))]) AS g
             |      FROM d WHERE len(s) >= 2),
             |tr AS (SELECT doc_id, unnest([s[i] || ' ' || s[i+1] || ' ' || s[i+2] for i in range(1, len(s)-1)]) AS g
             |       FROM d WHERE len(s) >= 3),
             |tc AS (SELECT doc_id, max(c) AS top_token_cnt
             |       FROM (SELECT doc_id, g, count(*) AS c FROM t GROUP BY 1, 2) GROUP BY 1),
             |bc AS (SELECT doc_id, max(c) AS top_bigram_cnt
             |       FROM (SELECT doc_id, g, count(*) AS c FROM b GROUP BY 1, 2) GROUP BY 1),
             |dc AS (SELECT doc_id, sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup3
             |       FROM (SELECT doc_id, g, count(*) AS c FROM tr GROUP BY 1, 2) GROUP BY 1)
             |SELECT d.doc_id, CAST(len(d.s) AS BIGINT) AS n_tokens,
             |  tc.top_token_cnt, bc.top_bigram_cnt,
             |  CAST(coalesce(dc.dup3, 0) AS BIGINT) AS dup_trigram_cnt,
             |  CAST(tc.top_token_cnt AS DOUBLE) / len(d.s) AS top_token_frac,
             |  CAST(bc.top_bigram_cnt AS DOUBLE) / (len(d.s) - 1) AS top_bigram_frac,
             |  CASE WHEN len(d.s) >= 3
             |    THEN CAST(coalesce(dc.dup3, 0) AS DOUBLE) / (len(d.s) - 2) END AS dup_trigram_frac
             |FROM d LEFT JOIN tc USING (doc_id) LEFT JOIN bc USING (doc_id)
             |  LEFT JOIN dc USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // ---- per-doc top-k keywords; integer tf-idf-style score so both
    //      engines rank identically (ln-based idf differs by libm ulps) ----
    Entry("q47_keywords",
      (s, d) => TextOps.keywords(docs(s, d), k = 5).orderBy("doc_id", "rnk"),
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |             FROM documents),
             |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
             |       FROM tok GROUP BY 1, 2),
             |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
             |sc AS (SELECT doc_id, token, tf, df, tf * 1000000 // df AS score
             |       FROM tf JOIN df USING (token)),
             |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
             |         ORDER BY score DESC, token) AS BIGINT) AS rnk
             |      FROM sc)
             |SELECT doc_id, token, tf, df, score, rnk FROM r
             |WHERE rnk <= 5 ORDER BY doc_id, rnk""".stripMargin)),

    // ---- deterministic mixture resampling: per-source keep fractions over
    //      the same md5 bucket arithmetic as q39 ----
    Entry("q45_mixture_sample",
      (s, d) => Sampling.mixtureSample(docs(s, d).select("doc_id", "source"),
          "source", "doc_id", Map("src0" -> 0.5, "src1" -> 0.25), default = 0.1)
        .orderBy("doc_id"),
      Some("""SELECT doc_id, source
             |FROM (SELECT doc_id, source,
             |        CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
             |          % 1000000 AS b
             |      FROM documents)
             |WHERE b < CASE source WHEN 'src0' THEN 500000
             |                      WHEN 'src1' THEN 250000 ELSE 100000 END
             |ORDER BY doc_id""".stripMargin)),

    // ---- benchmark decontamination: corpus docs sharing any 8-gram with
    //      the benchmark subset (doc_id % 11 = 0); Spark joins broadcast
    //      gram hashes, the oracle joins textual grams ----
    Entry("q46_decontaminate",
      (s, d) => {
        val all = docs(s, d)
        Dedup.decontaminate(
            all.where(pmod(col("doc_id"), lit(11)) =!= 0),
            all.where(pmod(col("doc_id"), lit(11)) === 0), n = 8)
          .orderBy("doc_id")
      },
      Some(decontamOracleSql)),

    // ---- the Bloom-probed scale tier of q46: same contract, same oracle —
    //      the filter only prunes the gram join's input, the left-semi
    //      verify removes every false positive (spec-pinned bit equality) ----
    Entry("q59_decontaminate_bloom",
      (s, d) => {
        val all = docs(s, d)
        Dedup.decontaminateBloom(
            all.where(pmod(col("doc_id"), lit(11)) =!= 0),
            all.where(pmod(col("doc_id"), lit(11)) === 0), n = 8)
          .orderBy("doc_id")
      },
      Some(decontamOracleSql)),

    // ---- LLM pipeline: similarity search ----
    Entry("q19_ann_top5",
      (s, d) => {
        val e = emb(s, d)
        Ann.bruteForceTopK(e.where(col("vec_id") < 3), e, k = 5)
          .orderBy("qid", "rnk")
      },
      Some(s"""WITH $quantCte,
              |p AS (SELECT q.vec_id AS qid, v.vec_id AS vid,
              |        CAST(list_sum(list_transform(list_zip(q.e, v.e), t -> t[1]*t[2])) AS DOUBLE)
              |          / (q.n * v.n) AS cosine
              |      FROM nrm q JOIN nrm v ON q.vec_id < 3 AND v.vec_id != q.vec_id),
              |r AS (SELECT qid, vid, cosine,
              |        CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS BIGINT) AS rnk
              |      FROM p)
              |SELECT qid, vid, rnk, cosine FROM r WHERE rnk <= 5 ORDER BY 1, 3""".stripMargin)),

    // ---- persisted IVF index: write-once (memoized per sfDir), then a
    //      partition-pruned probe. kmeansIters=0 → centroids are the first
    //      nlist vectors by vec_id, which DuckDB can recompute, so the whole
    //      assign→probe→rank path gets an exact SQL oracle; the kmeans
    //      variant of the same probe plan is pinned Spark-vs-Spark in
    //      PipelineSpec ----
    Entry("q43_ivf_probe",
      (s, d) => {
        val e = emb(s, d)
        Ann.ivfProbeTopK(e.where(col("vec_id") < 3), ivfIndexFor(s, d),
            k = 5, nprobe = 4)
          .orderBy("qid", "rnk")
      },
      Some(s"""WITH $quantCte,
              |cent AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS list_id,
              |           e AS ce
              |         FROM nrm ORDER BY vec_id LIMIT 16),
              |asg AS (SELECT vec_id, list_id FROM (
              |          SELECT v.vec_id, c.list_id,
              |            row_number() OVER (PARTITION BY v.vec_id ORDER BY
              |              list_sum(list_transform(list_zip(v.e, c.ce), t -> (t[1]-t[2])*(t[1]-t[2]))),
              |              c.list_id) AS rn
              |          FROM nrm v, cent c)
              |        WHERE rn = 1),
              |probe AS (SELECT qid, list_id FROM (
              |           SELECT q.vec_id AS qid, c.list_id,
              |             row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |               list_sum(list_transform(list_zip(q.e, c.ce), t -> (t[1]-t[2])*(t[1]-t[2]))),
              |               c.list_id) AS rn
              |           FROM nrm q, cent c WHERE q.vec_id < 3)
              |         WHERE rn <= 4),
              |p AS (SELECT pr.qid, a.vec_id AS vid,
              |        CAST(list_sum(list_transform(list_zip(q.e, v.e), t -> t[1]*t[2])) AS DOUBLE)
              |          / (q.n * v.n) AS cosine
              |      FROM probe pr
              |        JOIN asg a ON a.list_id = pr.list_id
              |        JOIN nrm q ON q.vec_id = pr.qid
              |        JOIN nrm v ON v.vec_id = a.vec_id
              |      WHERE v.vec_id != pr.qid),
              |r AS (SELECT qid, vid, cosine,
              |        CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS BIGINT) AS rnk
              |      FROM p)
              |SELECT qid, vid, rnk, cosine FROM r WHERE rnk <= 5 ORDER BY 1, 3""".stripMargin)),

    Entry("q20_cosine_pairs",
      (s, d) => Ann.cosinePairsFast(emb(s, d), threshold = 0.5).orderBy("vid_a", "vid_b"),
      Some(s"""WITH $quantCte
              |SELECT a.vec_id AS vid_a, b.vec_id AS vid_b,
              |  CAST(list_sum(list_transform(list_zip(a.e, b.e), t -> t[1]*t[2])) AS DOUBLE)
              |    / (a.n * b.n) AS cosine
              |FROM nrm a JOIN nrm b ON a.vec_id < b.vec_id
              |WHERE CAST(list_sum(list_transform(list_zip(a.e, b.e), t -> t[1]*t[2])) AS DOUBLE)
              |    / (a.n * b.n) >= 0.5
              |ORDER BY 1, 2""".stripMargin)),

    // ---- LLM pipeline: embedding near-dup, the distributed (no-collect)
    //      tier — hyperplane-LSH buckets, within-bucket pairs only ----
    Entry("q32_lsh_cosine_pairs",
      (s, d) => Ann.lshCosinePairs(emb(s, d), threshold = 0.3, h = 4, dim = 64)
        .orderBy("vid_a", "vid_b"),
      Some {
        s"""WITH $quantCte,
           |bk AS (SELECT vec_id, e, n, $lshBucketSql AS bucket FROM nrm)
           |SELECT a.vec_id AS vid_a, b.vec_id AS vid_b,
           |  CAST(list_sum(list_transform(list_zip(a.e, b.e), t -> t[1]*t[2])) AS DOUBLE)
           |    / (a.n * b.n) AS cosine
           |FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
           |WHERE CAST(list_sum(list_transform(list_zip(a.e, b.e), t -> t[1]*t[2])) AS DOUBLE)
           |    / (a.n * b.n) >= 0.3
           |ORDER BY 1, 2""".stripMargin
      }),

    // ---- embedding dup clustering end-to-end: LSH cosine pairs (q32's
    //      exact oracle tier) → recursive transitive closure → min-id
    //      survivor, the embedding sibling of q49 ----
    Entry("q51_embedding_clusters",
      (s, d) => Ann.embeddingDupClusters(emb(s, d), threshold = 0.3,
          h = 4, dim = 64)
        .orderBy("vec_id"),
      Some {
        s"""WITH RECURSIVE $quantCte,
           |bk AS (SELECT vec_id, e, n, $lshBucketSql AS bucket FROM nrm),
           |pr AS (SELECT a.vec_id AS u, b.vec_id AS v
           |       FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
           |       WHERE CAST(list_sum(list_transform(list_zip(a.e, b.e), t -> t[1]*t[2])) AS DOUBLE)
           |         / (a.n * b.n) >= 0.3),
           |e2 AS (SELECT u, v FROM pr UNION SELECT v, u FROM pr),
           |reach(s, t) AS (
           |  SELECT u, u FROM e2
           |  UNION
           |  SELECT r.s, e2.v FROM reach r JOIN e2 ON r.t = e2.u),
           |cc AS (SELECT s AS vec_id, min(t) AS cluster_id FROM reach GROUP BY s)
           |SELECT em.vec_id,
           |  coalesce(cc.cluster_id, em.vec_id) AS cluster_id,
           |  (em.vec_id = coalesce(cc.cluster_id, em.vec_id)) AS keep
           |FROM embeddings em LEFT JOIN cc ON em.vec_id = cc.vec_id
           |ORDER BY em.vec_id""".stripMargin
      }),

    // ---- O2 level form: last closed row of a level (metric.cpp:497-505) ----
    Entry("q33_last_interval",
      (s, d) => graft.hta.Queries.lastInterval(warehouseFor(s, d).levels, I1u)
        .select(col("metric"), col("interval"), col("time"),
          col("minimum"), col("maximum"),
          col("sum").cast("long").as("sum_cents"), col("count").as("cnt"),
          col("integral").cast("long").as("integral_cu"), col("active_time"))
        .orderBy("metric"),
      Some(s"""WITH ${levelCteAt(I1u)}
              |SELECT metric, CAST($I1u AS BIGINT) AS interval, time, minimum,
              |  maximum, sum_cents, cnt, integral_cu, active_time
              |FROM (SELECT *, row_number() OVER (PARTITION BY metric ORDER BY time DESC) AS rn
              |      FROM lv)
              |WHERE rn = 1 ORDER BY 1""".stripMargin)),

    // ---- T1 dump: per-metric store summary (src/tools/dump.cpp:44-88) ----
    Entry("q34_dump",
      (s, d) => graft.tools.Tools.dump(warehouseFor(s, d)).orderBy("metric"),
      Some(s"""WITH $wptsCte
              |SELECT metric, CAST(count(*) AS BIGINT) AS n_rows,
              |  min(time) AS first_time, max(time) AS last_time
              |FROM wpts GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- T4 clone: re-aggregation under a 5×-coarser Meta, checked on the
    //      cloned store's L0 levels (src/tools/clone.cpp:57-104) ----
    Entry("q35_clone_levels",
      (s, d) => cloneFor(s, d).levels.where(col("interval") === 5 * I1u)
        .select(col("metric"), col("time"), col("minimum"), col("maximum"),
          col("sum").cast("long").as("sum_cents"), col("count").as("cnt"),
          col("integral").cast("long").as("integral_cu"), col("active_time"))
        .orderBy("metric", "time"),
      Some(s"""WITH ${levelCteAt(5 * I1u)}
              |SELECT metric, time, minimum, maximum, sum_cents, cnt,
              |  integral_cu, active_time
              |FROM lv ORDER BY 1, 2""".stripMargin)),

    // ---- S7 end-to-end: per-metric Meta. 'click' (1 h ladder) routes to
    //      its 10 h level unsmoothed (factor 12h/10h = 1) while every other
    //      metric (6 h ladder) routes to its 6 h level smoothed in pairs —
    //      one store, divergent ladders, one distributed plan ----
    Entry("q37_multimeta_flex",
      (s, d) => {
        val mh = multiWarehouseFor(s, d)
        graft.store.MultiWarehouse.retrieveFlex(mh, Bu, Eu, 12 * I1u, smooth = true)
          .select(col("metric"), col("interval"), col("time"),
            col("minimum"), col("maximum"),
            col("sum").cast("long").as("sum_cents"), col("count").as("cnt"),
            col("integral").cast("long").as("integral_cu"), col("active_time"))
          .orderBy("metric", "time")
      },
      Some {
        // routed+smoothed recompute per config group (q28's pattern, at each
        // group's own interval and positional factor)
        def part(interval: Long, factor: Long, metricFilter: String) =
          s"""(WITH ${levelCteAt(interval)},
             |lb AS (SELECT metric, max(time) AS t FROM lv WHERE time <= $Bu GROUP BY 1),
             |sc AS (SELECT l.* FROM lv l
             |       LEFT JOIN lb ON l.metric = lb.metric
             |       WHERE (l.time > $Bu OR l.time = lb.t) AND l.time < $Eu
             |         AND $metricFilter),
             |rn AS (SELECT *, row_number() OVER (PARTITION BY metric ORDER BY time) - 1 AS r
             |       FROM sc)
             |SELECT metric, CAST($interval AS BIGINT) AS interval, min(time) AS time,
             |  min(minimum) AS minimum, max(maximum) AS maximum,
             |  CAST(sum(sum_cents) AS BIGINT) AS sum_cents,
             |  CAST(sum(cnt) AS BIGINT) AS cnt,
             |  CAST(sum(integral_cu) AS BIGINT) AS integral_cu,
             |  CAST(sum(active_time) AS BIGINT) AS active_time
             |FROM rn GROUP BY metric, r // $factor)""".stripMargin
        s"""SELECT * FROM ${part(10 * I1u, 1, "l.metric = 'click'")}
           |UNION ALL
           |SELECT * FROM ${part(6 * I1u, 2, "l.metric <> 'click'")}
           |ORDER BY 1, 3""".stripMargin
      }),

    // ---- multimodal plumbing: binary columns + typed meta through resize,
    //      audio resample, frame sampling + frame→image extraction, and
    //      partition-batched feature extraction. Image (ImageIO), audio
    //      (javax.sound.sampled) and video (multi-frame GIF) codecs are
    //      real. DuckDB has no media codecs, but it doesn't need one: the
    //      synthetic media are closed-form patterns (patternPng/Wav/Gif) and
    //      every codec step is an exact integer roundtrip, so the oracle
    //      recomputes the expected features ARITHMETICALLY — generate_series
    //      over pixels/samples, the same integer luminance/resample/binning
    //      math, float32 casts at the same points. A hash match proves the
    //      real encode→decode→feature pipeline is bit-exact end-to-end. ----
    Entry("q36_multimodal",
      (s, _) => {
        val media = Multimodal.syntheticMedia(s, 300)
        val prepped = Multimodal.resampleAudio(Multimodal.resize(media, 32, 32), 8000)
        val feats = Multimodal.extractFeatures(prepped, dim = 16)
          .withColumn("feat_norm",
            sqrt(aggregate(transform(col("features"), x => x.cast("double") * x),
              lit(0.0), (acc, x) => acc + x)))
        val frames = Multimodal.framesToImages(Multimodal.sampleFrames(media, everyN = 10))
          .groupBy("media_id").agg(
            count(when(col("kind") === "image", 1)).as("n_frames_sampled"))
        feats.join(frames, Seq("media_id"), "left")
          .select(col("media_id"), col("kind"), round(col("feat_norm"), 6).as("feat_norm"),
            coalesce(col("n_frames_sampled"), lit(0L)).as("n_frames_sampled"))
          .orderBy("media_id")
      },
      Some {
        // Closed-form recompute of the Spark pipeline, per kind (id % 3):
        //  image (0): patternPng 16×12 → nearest-resize 32×32 (src pixel
        //    (x//2, y*12//32)) → 16-bin integer luminance histogram / 1024;
        //  audio (1): sawtooth patternWav (period=id%50+2, amp=(id%17+8)*1000,
        //    480 samples) → nearest-resample to 240 (sample 2i) → 16 bins of
        //    15 |samples|, sum/ (15·32768) as float32;
        //  video (2): patternGif gray v=(id+x+3y+7f)%256 over 30 16×12
        //    frames → pooled histogram (lum of (v,v,v) is exactly v) / 5760.
        // feat_norm folds f0²..f15² left-to-right in double, matching
        // Spark's aggregate() order; n_frames_sampled = 3 video frames
        // (indices 0,10,20 of 30) decoded to images, else 0.
        val fsel = (0 until 16).map(j => s"max(CASE WHEN bin = $j THEN v END) AS f$j").mkString(", ")
        val sq = (0 until 16).map(j => s"CAST(f$j AS DOUBLE) * f$j").mkString(" + ")
        s"""WITH ids AS (SELECT media_id FROM range(0, 300) t(media_id)),
           |bins AS (SELECT bin FROM range(0, 16) t(bin)),
           |imgv AS (
           |  SELECT media_id, (lum * 16) // 256 AS bin,
           |         CAST(CAST(count(*) AS REAL) / CAST(1024 AS REAL) AS REAL) AS v
           |  FROM (
           |    SELECT i.media_id,
           |           ((((i.media_id + (x.x // 2)) % 256) * 299
           |             + ((i.media_id + ((y.y * 12) // 32)) % 256) * 587
           |             + ((i.media_id + (x.x // 2) * ((y.y * 12) // 32)) % 256) * 114) // 1000) AS lum
           |    FROM ids i, range(0, 32) x(x), range(0, 32) y(y)
           |    WHERE i.media_id % 3 = 0)
           |  GROUP BY 1, 2),
           |audv AS (
           |  SELECT media_id, bin, CAST(CAST(sum(a) AS DOUBLE) / 491520.0 AS REAL) AS v
           |  FROM (
           |    SELECT i.media_id, t.i // 15 AS bin,
           |           abs((((2 * t.i) % (i.media_id % 50 + 2)) * 2 * ((i.media_id % 17 + 8) * 1000))
           |               // ((i.media_id % 50 + 2) - 1) - ((i.media_id % 17 + 8) * 1000)) AS a
           |    FROM ids i, range(0, 240) t(i)
           |    WHERE i.media_id % 3 = 1)
           |  GROUP BY 1, 2),
           |vidv AS (
           |  SELECT media_id, bin, CAST(CAST(count(*) AS REAL) / CAST(5760 AS REAL) AS REAL) AS v
           |  FROM (
           |    SELECT i.media_id,
           |           (((i.media_id + x.x + 3 * y.y + 7 * f.f) % 256) * 16) // 256 AS bin
           |    FROM ids i, range(0, 16) x(x), range(0, 12) y(y), range(0, 30) f(f)
           |    WHERE i.media_id % 3 = 2)
           |  GROUP BY 1, 2),
           |allv AS (SELECT * FROM imgv UNION ALL SELECT * FROM audv UNION ALL SELECT * FROM vidv),
           |fv AS (
           |  SELECT g.media_id, g.bin, coalesce(a.v, CAST(0 AS REAL)) AS v
           |  FROM (SELECT i.media_id, b.bin FROM ids i, bins b) g
           |  LEFT JOIN allv a ON g.media_id = a.media_id AND g.bin = a.bin),
           |fm AS (SELECT media_id, $fsel FROM fv GROUP BY media_id)
           |SELECT media_id,
           |  CASE media_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           |  round(sqrt($sq), 6) AS feat_norm,
           |  CAST(CASE WHEN media_id % 3 = 2 THEN 3 ELSE 0 END AS BIGINT) AS n_frames_sampled
           |FROM fm ORDER BY media_id""".stripMargin
      }),

    // ---- EXACT Jaccard self-join via prefix filtering (PPJoin-style): the
    //      operator is exact, so the brute-force all-pairs SQL is an exact
    //      oracle — the recall-1 claim of the prefix filter becomes a
    //      checked fact, not an argument. Counts are over hashed grams on
    //      the Spark side and textual grams in SQL (q15's injectivity
    //      argument). tau=0.5 keeps prefixes long enough to matter. ----
    Entry("q48_jaccard_join",
      (s, d) => Dedup.jaccardJoin(docs(s, d), tau = 0.5).orderBy("doc_a", "doc_b"),
      Some(s"""WITH $shCte
              |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |  CAST(len(list_intersect(a.st, b.st)) AS BIGINT) AS inter,
              |  CAST(len(a.st) + len(b.st) - len(list_intersect(a.st, b.st)) AS BIGINT) AS uni,
              |  CAST(len(list_intersect(a.st, b.st)) AS DOUBLE) /
              |    (len(a.st) + len(b.st) - len(list_intersect(a.st, b.st))) AS jaccard
              |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              |WHERE CAST(len(list_intersect(a.st, b.st)) AS DOUBLE) /
              |    (len(a.st) + len(b.st) - len(list_intersect(a.st, b.st))) >= 0.5
              |ORDER BY 1, 2""".stripMargin)),

    // ---- the dedup pipeline's END: verified pairs → connected components
    //      → one survivor per cluster. The oracle recomputes components
    //      EXACTLY via a recursive transitive closure over the brute-force
    //      pair set (q15's oracle is exact for the pair tier, so the
    //      composition is exact too); component label = min reachable id,
    //      matching min-label propagation's fixpoint. ----
    Entry("q49_neardup_clusters",
      (s, d) => Dedup.nearDupClusters(docs(s, d), threshold = 0.8)
        .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE $shCte,
              |pr AS (SELECT a.doc_id AS u, b.doc_id AS v
              |       FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              |       WHERE CAST(len(list_intersect(a.st, b.st)) AS DOUBLE) /
              |         (len(a.st) + len(b.st) - len(list_intersect(a.st, b.st))) >= 0.8),
              |e AS (SELECT u, v FROM pr UNION SELECT v, u FROM pr),
              |reach(s, t) AS (
              |  SELECT u, u FROM e
              |  UNION
              |  SELECT r.s, e.v FROM reach r JOIN e ON r.t = e.u),
              |cc AS (SELECT s AS doc_id, min(t) AS cluster_id FROM reach GROUP BY s)
              |SELECT d.doc_id,
              |  coalesce(cc.cluster_id, d.doc_id) AS cluster_id,
              |  (d.doc_id = coalesce(cc.cluster_id, d.doc_id)) AS keep
              |FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id
              |ORDER BY d.doc_id""".stripMargin)),

    // ---- PII scrub: counts + ordered regexp_replace parity. The corpus
    //      text has no PII shapes, so deterministic PII is woven in from
    //      doc_id IDENTICALLY on both sides (docs with doc_id % 3 = 0 stay
    //      clean — the zero-count path is exercised too). Patterns live in
    //      the Java/RE2-agreeing regex subset (TextOps.EmailRe notes). ----
    Entry("q50_redact_pii",
      (s, d) => {
        val seeded = docs(s, d).select(col("doc_id"),
          when(col("doc_id") % 3 === 0, col("text")).otherwise(concat(
            col("text"), lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com via 10.0."), (col("doc_id") % 256).cast("string"),
            lit(".7 ext 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).as("text"))
        TextOps.redactPii(seeded).orderBy("doc_id")
      },
      Some(s"""WITH p AS (SELECT doc_id,
              |  CASE WHEN doc_id % 3 = 0 THEN text
              |       ELSE text || ' contact user' || CAST(doc_id AS VARCHAR) ||
              |            '@example.com via 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
              |            '.7 ext 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              |  END AS text FROM documents),
              |r AS (SELECT doc_id,
              |  CAST(len(regexp_extract_all(text, '${TextOps.EmailRe}')) AS BIGINT) AS n_email,
              |  CAST(len(regexp_extract_all(text, '${TextOps.Ipv4Re}')) AS BIGINT) AS n_ip,
              |  CAST(len(regexp_extract_all(text, '${TextOps.PhoneRe}')) AS BIGINT) AS n_phone,
              |  regexp_replace(regexp_replace(regexp_replace(text,
              |    '${TextOps.EmailRe}', '<EMAIL>', 'g'),
              |    '${TextOps.Ipv4Re}', '<IP>', 'g'),
              |    '${TextOps.PhoneRe}', '<PHONE>', 'g') AS red_text
              |  FROM p)
              |SELECT doc_id, n_email, n_ip, n_phone, red_text,
              |       lower(regexp_replace(red_text, ' +', ' ', 'g')) AS norm_text
              |FROM r ORDER BY doc_id""".stripMargin)),

    // ---- corpus line dedup (boilerplate removal): testdata text is
    //      single-line, so the query seeds deterministic multi-line docs —
    //      two shared footers (frequent, removed) + a per-doc note line and
    //      a blank line every 7th doc (kept) — q50's seeding pattern ----
    Entry("q52_line_dedup",
      (s, d) => {
        val seeded = docs(s, d).select(col("doc_id"), concat(
          col("text"), lit("\n"),
          when(col("doc_id") % 7 === 0, lit("\n")).otherwise(lit("")),
          when(col("doc_id") % 3 === 0,
              lit("copyright footer all rights reserved"))
            .when(col("doc_id") % 3 === 1, lit("subscribe to our newsletter"))
            .otherwise(concat(lit("note "), col("doc_id").cast("string"))))
          .as("text"))
        TextOps.lineDedup(seeded, minDocs = 5).orderBy("doc_id")
      },
      Some(s"""WITH p AS (SELECT doc_id,
              |  text || chr(10) ||
              |  CASE WHEN doc_id % 7 = 0 THEN chr(10) ELSE '' END ||
              |  CASE WHEN doc_id % 3 = 0 THEN 'copyright footer all rights reserved'
              |       WHEN doc_id % 3 = 1 THEN 'subscribe to our newsletter'
              |       ELSE 'note ' || CAST(doc_id AS VARCHAR) END AS text
              |  FROM documents),
              |ls AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM p),
              |ex AS (SELECT doc_id, unnest(l) AS line,
              |              unnest(range(1, len(l)+1)) AS pos FROM ls),
              |freq AS (SELECT line FROM ex WHERE trim(line) <> ''
              |         GROUP BY line HAVING count(DISTINCT doc_id) >= 5),
              |rb AS (SELECT doc_id,
              |              string_agg(line, chr(10) ORDER BY pos) AS clean_text,
              |              count(*) AS n_kept
              |       FROM ex WHERE line NOT IN (SELECT line FROM freq)
              |       GROUP BY doc_id)
              |SELECT ls.doc_id, coalesce(rb.clean_text, '') AS clean_text,
              |       CAST(len(ls.l) AS BIGINT) AS n_lines,
              |       CAST(len(ls.l) - coalesce(rb.n_kept, 0) AS BIGINT) AS n_removed
              |FROM ls LEFT JOIN rb ON ls.doc_id = rb.doc_id
              |ORDER BY ls.doc_id""".stripMargin)),

    // ---- one-call corpus curation verdict: exact-dup survivor + quality +
    //      Gopher repetition gates (integer-arithmetic comparisons), reason
    //      = first failing gate, lang_pred as routing metadata ----
    Entry("q53_curate",
      (s, d) => Curate.curate(docs(s, d), topTokenPctMax = 15,
          dupTrigramPctMax = 10)
        .orderBy("doc_id"),
      Some {
        def hits(ws: Seq[String]) =
          s"len(list_filter(s, x -> x IN (${ws.map(w => s"'$w'").mkString(",")})))"
        s"""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS s FROM documents),
           |fl AS (SELECT doc_id,
           |  (${hits(TextOps.EnStop)} >= 1 AND len(s) >= 10) AS quality_ok,
           |  CASE WHEN ${hits(TextOps.EnStop)} >= ${hits(TextOps.DeStop)}
           |         AND ${hits(TextOps.EnStop)} >= ${hits(TextOps.FrStop)} THEN 'en'
           |       WHEN ${hits(TextOps.DeStop)} >= ${hits(TextOps.FrStop)} THEN 'de'
           |       ELSE 'fr' END AS lang_pred FROM d),
           |cn AS (SELECT doc_id,
           |  (doc_id = min(doc_id) OVER (PARTITION BY md5(text))) AS canonical FROM d),
           |tc AS (SELECT doc_id, max(c) AS topc
           |       FROM (SELECT doc_id, g, count(*) AS c
           |             FROM (SELECT doc_id, unnest(s) AS g FROM d) GROUP BY 1, 2)
           |       GROUP BY 1),
           |dc AS (SELECT doc_id, sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup3
           |       FROM (SELECT doc_id, g, count(*) AS c
           |             FROM (SELECT doc_id, unnest([s[i] || ' ' || s[i+1] || ' ' || s[i+2]
           |                                          for i in range(1, len(s)-1)]) AS g
           |                   FROM d WHERE len(s) >= 3) GROUP BY 1, 2)
           |       GROUP BY 1),
           |j AS (SELECT d.doc_id, len(d.s) AS n, fl.quality_ok, fl.lang_pred,
           |             cn.canonical, tc.topc, coalesce(dc.dup3, 0) AS dup3
           |      FROM d JOIN fl USING (doc_id) JOIN cn USING (doc_id)
           |        JOIN tc USING (doc_id) LEFT JOIN dc USING (doc_id)),
           |r AS (SELECT doc_id, lang_pred, canonical, quality_ok,
           |        (topc * 100 <= n * 15 AND (n < 3 OR dup3 * 100 <= (n - 2) * 10))
           |          AS rep_ok FROM j)
           |SELECT doc_id, lang_pred, canonical, quality_ok, rep_ok,
           |  (CASE WHEN NOT canonical THEN 'dup'
           |        WHEN NOT quality_ok THEN 'quality'
           |        WHEN NOT rep_ok THEN 'repetition' ELSE 'ok' END = 'ok') AS keep,
           |  CASE WHEN NOT canonical THEN 'dup'
           |       WHEN NOT quality_ok THEN 'quality'
           |       WHEN NOT rep_ok THEN 'repetition' ELSE 'ok' END AS reason
           |FROM r ORDER BY doc_id""".stripMargin
      }),

    // ---- exact per-metric percentiles over a range via histogram
    //      selection — no global sort; all-integer rank arithmetic
    //      (100*cum >= n*p <=> cum >= ceil(n*p/100)), percentile_disc
    //      semantics. DuckDB's sum() OVER is HUGEINT — comparisons are
    //      fine, but every emitted sum must CAST to BIGINT (q42 lesson) ----
    Entry("q54_quantiles",
      (s, d) => graft.hta.Queries.valueQuantiles(ev(s, d), B, E,
          ps = Seq(50, 95, 99))
        .orderBy("metric", "p"),
      Some(s"""WITH $ptsCte,
              |h AS (SELECT metric, cents, count(*) AS c FROM pts
              |      WHERE time >= $B AND time < $E GROUP BY 1, 2),
              |w AS (SELECT metric, cents,
              |        sum(c) OVER (PARTITION BY metric ORDER BY cents) AS cum,
              |        sum(c) OVER (PARTITION BY metric) AS n FROM h),
              |x AS (SELECT metric, cents, cum, n, unnest([50, 95, 99]) AS p FROM w)
              |SELECT metric, CAST(p AS BIGINT) AS p, min(cents) AS q_cents,
              |       CAST(min(n) AS BIGINT) AS n
              |FROM x WHERE 100 * cum >= n * p
              |GROUP BY metric, p ORDER BY metric, p""".stripMargin)),

    // ---- vocabulary encoding: docs -> (pos, tok_id) rows under the
    //      rank-ordered top-20 vocabulary, OOV -> -1. topK=20 < corpus
    //      vocab so the UNK path is exercised on real data ----
    Entry("q55_encode",
      (s, d) => TextOps.encodeDocs(docs(s, d),
          TextOps.vocabularyWithIds(docs(s, d), topK = 20))
        .orderBy("doc_id", "pos"),
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token,
             |                    unnest(range(0, len(string_split(text, ' ')))) AS pos
             |             FROM documents),
             |v AS (SELECT token, count(*) AS tf FROM tok GROUP BY token),
             |vr AS (SELECT token,
             |         CAST(row_number() OVER (ORDER BY tf DESC, token) - 1 AS BIGINT)
             |           AS tok_id
             |       FROM (SELECT token, tf FROM v ORDER BY tf DESC, token LIMIT 20))
             |SELECT t.doc_id, CAST(t.pos AS BIGINT) AS pos,
             |       coalesce(vr.tok_id, -1) AS tok_id
             |FROM tok t LEFT JOIN vr USING (token)
             |ORDER BY doc_id, pos""".stripMargin)),

    // ---- graph centrality: integer-arithmetic PageRank over the
    //      undirected supplier<->customer graph from lineitem x orders
    //      (customers offset by 1e6 to disjoin the key spaces). 5 power
    //      iterations; the oracle UNROLLS them as chained CTEs — every
    //      operation is BIGINT floor-div/sum, so both engines agree
    //      bit-for-bit regardless of shuffle order ----
    Entry("q56_pagerank",
      (s, d) => {
        val li = s.read.parquet(s"$d/lineitem.parquet")
        val ord = s.read.parquet(s"$d/orders.parquet")
        val fwd = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey").cast("long").as("src"),
            (col("o_custkey").cast("long") + 1000000L).as("dst"))
        val edges = fwd.unionByName(
          fwd.select(col("dst").as("src"), col("src").as("dst")))
        graft.pipeline.Graph.pageRank(edges, iters = 5).orderBy("node")
      },
      Some(pageRankOracleSql(5))),

    // ---- event funnel: users completing signup -> view -> click ->
    //      purchase in strict time order (earliest-completion reach) ----
    Entry("q57_funnel",
      (s, d) => {
        val raw = s.read.parquet(s"$d/events.parquet")
        val ev = raw.select(
          col("event_type").as("metric"), Tables.tsNs(raw).as("time"),
          col("user_id"))
        graft.pipeline.Sessionize.funnel(ev, Seq("signup", "view", "click", "purchase"))
          .orderBy("step")
      },
      Some("""WITH ev AS (SELECT user_id, event_type,
             |              epoch_us(ts)*1000 AS t FROM events),
             |s1 AS (SELECT user_id, min(t) AS t FROM ev
             |       WHERE event_type = 'signup' GROUP BY 1),
             |s2 AS (SELECT e.user_id, min(e.t) AS t FROM ev e
             |       JOIN s1 ON e.user_id = s1.user_id
             |       WHERE e.event_type = 'view' AND e.t > s1.t GROUP BY 1),
             |s3 AS (SELECT e.user_id, min(e.t) AS t FROM ev e
             |       JOIN s2 ON e.user_id = s2.user_id
             |       WHERE e.event_type = 'click' AND e.t > s2.t GROUP BY 1),
             |s4 AS (SELECT e.user_id, min(e.t) AS t FROM ev e
             |       JOIN s3 ON e.user_id = s3.user_id
             |       WHERE e.event_type = 'purchase' AND e.t > s3.t GROUP BY 1)
             |SELECT * FROM (
             |  SELECT CAST(1 AS BIGINT) AS step, 'signup' AS event_type,
             |         CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
             |  UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
             |  UNION ALL SELECT 3, 'click', (SELECT count(*) FROM s3)
             |  UNION ALL SELECT 4, 'purchase', (SELECT count(*) FROM s4))
             |ORDER BY step""".stripMargin)),

    // ---- cohort retention triangle: first-event day cohorts x active-day
    //      offsets, distinct users per cell. Day index by integer floor-div
    //      of the us-grid ns time — exact on both engines ----
    Entry("q58_retention",
      (s, d) => {
        val raw = s.read.parquet(s"$d/events.parquet")
        val ev = raw.select(
          Tables.tsNs(raw).as("time"),
          col("user_id"))
        graft.pipeline.Sessionize.retention(ev).orderBy("cohort_day", "day_offset")
      },
      Some("""WITH d AS (SELECT user_id,
             |             (epoch_us(ts)*1000) // 86400000000000 AS day
             |           FROM events),
             |c AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY 1)
             |SELECT c.cohort AS cohort_day, d.day - c.cohort AS day_offset,
             |       CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_users
             |FROM d JOIN c ON d.user_id = c.user_id
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- container-metadata probe over five formats (png/wav/gif/mp4/
    //      webm): Spark parses REAL container structure from the bytes
    //      (meta arrives NULL); the oracle recomputes every field closed-
    //      form from media_id, q36-style. Codec payloads stay stubbed ----
    Entry("q60_probe_meta",
      (s, _) => Multimodal.probeMeta(Multimodal.syntheticContainers(s, 300))
        .select(col("media_id"), col("kind"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.n_frames").as("n_frames"), col("meta.mime").as("mime"))
        .orderBy("media_id"),
      Some("""WITH m AS (SELECT media_id, media_id % 5 AS k,
             |  CAST((media_id % 7 + 2) * 2 AS INTEGER) AS w,
             |  CAST((media_id % 5 + 1) * 2 AS INTEGER) AS h
             |  FROM range(0, 300) t(media_id))
             |SELECT media_id,
             |  CASE k WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             |  CASE WHEN k IN (0, 2, 3, 4) THEN w END AS width,
             |  CASE WHEN k IN (0, 2, 3, 4) THEN h END AS height,
             |  CASE WHEN k = 1 THEN CAST(8000 * (1 + media_id % 3) AS INTEGER) END AS sample_rate,
             |  CASE WHEN k = 1 THEN CAST(media_id % 100 + 50 AS INTEGER)
             |       WHEN k = 2 THEN CAST(media_id % 6 + 2 AS INTEGER)
             |       WHEN k = 3 THEN CAST(media_id % 90 + 10 AS INTEGER) END AS n_frames,
             |  CASE k WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
             |         WHEN 2 THEN 'image/gif' WHEN 3 THEN 'video/mp4'
             |         ELSE 'video/webm' END AS mime
             |FROM m ORDER BY media_id""".stripMargin)),

    // ---- edit-distance near-dup over en docs. ASCII-sanitize first
    //      (regex in the Java/RE2-agreeing subset, the q50 discipline):
    //      Spark's levenshtein counts unicode code points, DuckDB's counts
    //      BYTES — on pure ASCII the two agree exactly. Language blocking
    //      is part of the query's contract (cross-language edit distance
    //      is meaningless), not a recall loss ----
    Entry("q61_edit_neardup",
      (s, d) => {
        val en = docs(s, d).where(col("lang") === "en")
          .select(col("doc_id"),
            regexp_replace(col("text"), "[^ -~]", "").as("text"))
        // uncapped: the oracle's brute join has no bucket cap, and a
        // silently-dropped dense band would hash-diverge; production
        // callers pick a finite maxBucket for the recall/cost trade
        Dedup.editDistancePairs(en, maxDist = 6, maxBucket = Int.MaxValue)
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH en AS (SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS t
             |            FROM documents WHERE lang = 'en'),
             |l AS (SELECT doc_id, t, length(t) AS len FROM en),
             |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |             CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
             |      FROM l a JOIN l b
             |        ON a.doc_id < b.doc_id AND abs(a.len - b.len) <= 6)
             |SELECT doc_a, doc_b, dist FROM p WHERE dist <= 6
             |ORDER BY 1, 2""".stripMargin)),

    // ---- exact token heavy hitters via per-partition Misra-Gries
    //      candidates + exact recount: the sketch prunes, SQL-identical
    //      exact counts decide, so the plain GROUP BY oracle matches ----
    Entry("q62_heavy_hitters",
      (s, d) => Sketches.heavyHitters(
          docs(s, d).select(explode(TextOps.tokens(col("text"))).as("token")),
          "token", k = 40)
        .orderBy(desc("cnt"), asc("value")),
      Some("""WITH t AS (SELECT unnest(string_split(text, ' ')) AS v
             |           FROM documents),
             |n AS (SELECT count(*) AS c FROM t)
             |SELECT v AS value, CAST(count(*) AS BIGINT) AS cnt
             |FROM t, n GROUP BY v, n.c HAVING count(*) * 40 > c
             |ORDER BY cnt DESC, value""".stripMargin)),

    // ---- BPE merge learning: the tokenizer-training step upstream of
    //      q55's encode. The iterative corpus-wide argmax isn't expressible
    //      as a single-reference recursive CTE, but the iteration count is
    //      a LITERAL — so the oracle unrolls all 30 (argmax, apply) steps
    //      as a generated materialized-CTE chain (see bpeLearnOracleSql;
    //      testdata is all-ASCII at every SF, so Spark's UTF-16 char split
    //      and DuckDB's byte split agree exactly). BpeSpec additionally
    //      pins the learner against a reference single-machine trainer ----
    Entry("q63_bpe_merges",
      (s, d) => TextOps.learnBpeMerges(docs(s, d), numMerges = 30)
        .orderBy("rank"),
      Some(bpeLearnOracleSql(numMerges = 30, minCount = 2L))),

    // ---- cross-document duplicated spans (gram-granular exact-substring
    //      dedup). Spark marks 60-bit positional gram hashes, the oracle
    //      marks textual grams — membership agrees by q15's injectivity
    //      argument ----
    Entry("q64_dup_spans",
      (s, d) => Dedup.duplicatedSpans(docs(s, d), n = 8)
        .orderBy("doc_id", "span_start"),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
             |g AS (SELECT doc_id, unnest([{'pos': i - 1,
             |          'gram': array_to_string(s[i:i+7], ' ')}
             |        for i in range(1, len(s) - 6)]) AS pg
             |      FROM d WHERE len(s) >= 8),
             |h AS (SELECT doc_id, pg.pos AS pos, pg.gram AS gram FROM g),
             |dup AS (SELECT gram FROM (SELECT gram, count(DISTINCT doc_id) AS c
             |                          FROM h GROUP BY 1) WHERE c >= 2),
             |hit AS (SELECT doc_id, pos FROM h WHERE gram IN (SELECT gram FROM dup)),
             |m AS (SELECT doc_id, pos, CASE WHEN pos > coalesce(lag(pos) OVER
             |        (PARTITION BY doc_id ORDER BY pos) + 8, -1) THEN 1 ELSE 0 END AS nw
             |      FROM hit),
             |sid AS (SELECT *, sum(nw) OVER (PARTITION BY doc_id ORDER BY pos
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s FROM m)
             |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
             |       CAST(max(pos) + 8 AS BIGINT) AS span_end,
             |       CAST(count(*) AS BIGINT) AS n_grams
             |FROM sid GROUP BY doc_id, s ORDER BY 1, 2""".stripMargin)),

    // ---- keyword search: exact-integer tf-idf top-k (the q47 scaling) ----
    Entry("q65_search",
      (s, d) => TextOps.searchTopK(docs(s, d),
        Seq("join", "filter", "vector"), k = 10),
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |           FROM documents),
             |f AS (SELECT doc_id, token, count(*) AS tf FROM t
             |      WHERE token IN ('join', 'filter', 'vector') GROUP BY 1, 2),
             |i AS (SELECT token,
             |        ((SELECT count(*) FROM documents) * 1000000) // count(*) AS idf_scaled
             |      FROM f GROUP BY token)
             |SELECT doc_id, CAST(sum(f.tf * i.idf_scaled) AS BIGINT) AS score
             |FROM f JOIN i USING (token) GROUP BY doc_id
             |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)),

    // ---- feature-hashed doc vectors: text -> the embedding tier with no
    //      external model. The operator returns dense float arrays (what
    //      Ann consumes); the registered query EXPLODES them to scalar
    //      (doc_id, j, cnt) rows because the driver's hash compare (and
    //      localcheck) cannot hash array cells — the integral float
    //      elements cast back to BIGINT exactly, so the explode loses
    //      nothing ----
    Entry("q66_hash_vectorize",
      (s, d) => TextOps.hashVectorize(docs(s, d), dim = 64)
        .select(col("doc_id"), posexplode(col("vec")).as(Seq("j", "cnt")))
        .select(col("doc_id"), col("j").cast("long").as("j"),
          col("cnt").cast("long").as("cnt"))
        .orderBy("doc_id", "j"),
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |           FROM documents),
             |b AS (SELECT doc_id,
             |        CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 64 AS b
             |      FROM t),
             |c AS (SELECT doc_id, b, count(*) AS c FROM b GROUP BY 1, 2),
             |j AS (SELECT range AS j FROM range(0, 64))
             |SELECT d.doc_id, j.j, CAST(coalesce(c.c, 0) AS BIGINT) AS cnt
             |FROM (SELECT DISTINCT doc_id FROM documents) d
             |CROSS JOIN j
             |LEFT JOIN c ON c.doc_id = d.doc_id AND c.b = j.j
             |ORDER BY 1, 2""".stripMargin)),

    // ---- time-series post-processing tier (hta/Series.scala): M4
    //      visualization downsampling, counter rate, grid resampling.
    //      All deterministic because time is unique per metric (O1) ----
    Entry("q67_m4_downsample",
      (s, d) => Series.m4Downsample(ev(s, d), B, E, w = 48)
        .orderBy("metric", "bucket"),
      Some(s"""WITH $ptsCte,
              |f AS (SELECT metric, (time - $B) // ${(E - B + 47) / 48} AS bucket,
              |             time, value
              |      FROM pts WHERE time >= $B AND time < $E)
              |SELECT metric, bucket,
              |  min(time) AS t_first, arg_min(value, time) AS v_first,
              |  max(time) AS t_last, arg_max(value, time) AS v_last,
              |  min(value) AS v_min, max(value) AS v_max
              |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Entry("q68_counter_rate",
      (s, d) => Series.counterRate(ev(s, d), B, E)
        .select("metric", "increase_cents", "n_samples", "rate_cents_per_sec")
        .orderBy("metric"),
      Some(s"""WITH $ptsCte,
              |f AS (SELECT metric, time, cents FROM pts
              |      WHERE time >= $B AND time < $E),
              |d AS (SELECT metric, cents,
              |        lag(cents) OVER (PARTITION BY metric ORDER BY time) AS p
              |      FROM f),
              |a AS (SELECT metric,
              |        CAST(sum(CASE WHEN p IS NULL THEN 0
              |                 WHEN cents >= p THEN cents - p
              |                 ELSE cents END) AS BIGINT) AS increase_cents,
              |        CAST(count(*) AS BIGINT) AS n_samples
              |      FROM d GROUP BY 1)
              |SELECT metric, increase_cents, n_samples,
              |       increase_cents / ((${E} - ${B}) / 1e9) AS rate_cents_per_sec
              |FROM a ORDER BY metric""".stripMargin)),

    Entry("q69_resample",
      (s, d) => Series.resampleFfill(ev(s, d), B, E,
          step = 6L * 3600000000000L)
        .orderBy("metric", "time"),
      Some(s"""WITH $ptsCte,
              |g AS (SELECT m.metric, t.range AS time
              |      FROM (SELECT DISTINCT metric FROM pts) m,
              |           range($B, $E, ${6L * 3600000000000L}) t)
              |SELECT g.metric, g.time, p.value
              |FROM g ASOF LEFT JOIN
              |  (SELECT metric, time, value FROM pts) p
              |  ON g.metric = p.metric AND p.time <= g.time
              |ORDER BY 1, 2""".stripMargin)),

    // ---- robust outliers: |cents - median| > 2.8 x MAD, all medians by
    //      histogram selection (percentile_disc), threshold an integer
    //      cross-multiply - exact on both engines ----
    Entry("q70_mad_outliers",
      (s, d) => Series.madOutliers(ev(s, d), B, E, kTenths = 28L)
        .orderBy("metric", "time"),
      Some(s"""WITH $ptsCte,
              |f AS (SELECT metric, time, cents FROM pts
              |      WHERE time >= $B AND time < $E),
              |h AS (SELECT metric, cents, count(*) AS c FROM f GROUP BY 1, 2),
              |w AS (SELECT metric, cents,
              |        sum(c) OVER (PARTITION BY metric ORDER BY cents) AS cum,
              |        sum(c) OVER (PARTITION BY metric) AS n FROM h),
              |med AS (SELECT metric, min(cents) AS med FROM w
              |        WHERE 2 * cum >= n GROUP BY 1),
              |dev AS (SELECT f.metric, f.time, f.cents,
              |          abs(f.cents - med.med) AS dev, med.med
              |        FROM f JOIN med USING (metric)),
              |h2 AS (SELECT metric, dev, count(*) AS c FROM dev GROUP BY 1, 2),
              |w2 AS (SELECT metric, dev,
              |         sum(c) OVER (PARTITION BY metric ORDER BY dev) AS cum,
              |         sum(c) OVER (PARTITION BY metric) AS n FROM h2),
              |mad AS (SELECT metric, min(dev) AS mad FROM w2
              |        WHERE 2 * cum >= n GROUP BY 1)
              |SELECT d.metric, d.time, d.cents, d.med, d.dev, mad.mad
              |FROM dev d JOIN mad USING (metric)
              |WHERE d.dev * 10 > mad.mad * 28
              |ORDER BY 1, 2""".stripMargin)),

    // ---- two-threshold alerting: ON at >= $150, OFF at <= $50, hold
    //      between; only state edges emitted ----
    Entry("q71_hysteresis",
      (s, d) => Series.hysteresisAlerts(ev(s, d), B, E,
          hiCents = 15000L, loCents = 5000L)
        .orderBy("metric", "time"),
      Some(s"""WITH $ptsCte,
              |f AS (SELECT metric, time, cents FROM pts
              |      WHERE time >= $B AND time < $E),
              |d AS (SELECT metric, time, cents,
              |        CASE WHEN cents >= 15000 THEN 1
              |             WHEN cents <= 5000 THEN 0 END AS dec
              |      FROM f),
              |s AS (SELECT metric, time, cents,
              |        coalesce(last_value(dec IGNORE NULLS) OVER (
              |          PARTITION BY metric ORDER BY time
              |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              |          0) AS alert
              |      FROM d),
              |t AS (SELECT *, coalesce(lag(alert) OVER (
              |          PARTITION BY metric ORDER BY time), 0) AS prev
              |      FROM s)
              |SELECT metric, time, cents, CAST(alert AS BIGINT) AS alert
              |FROM t WHERE alert != prev ORDER BY 1, 2""".stripMargin)),

    // ---- CUSUM drift alarms: the sequential fold has a window closed
    //      form (running sum minus clamped running min), exact integers ----
    Entry("q72_cusum",
      (s, d) => Series.cusum(ev(s, d), B, E,
          driftCents = 6000L, thresholdCents = 15000L)
        .orderBy("metric", "time"),
      Some(s"""WITH $ptsCte,
              |f AS (SELECT metric, time, cents FROM pts
              |      WHERE time >= $B AND time < $E),
              |p AS (SELECT metric, time, cents,
              |        sum(cents - 6000) OVER (PARTITION BY metric ORDER BY time
              |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp
              |      FROM f),
              |m AS (SELECT *, least(min(pp) OVER (PARTITION BY metric ORDER BY time
              |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS mn
              |      FROM p)
              |SELECT metric, time, cents, CAST(pp - mn AS BIGINT) AS cusum
              |FROM m WHERE pp - mn > 15000 ORDER BY 1, 2""".stripMargin)),

    // ---- interval (overlap) join: every sample inside an alert episode.
    //      Episodes come from q71's hysteresis edges (ON edge paired with
    //      its OFF, open episodes closing at E); the join itself is the
    //      TILED equi-join (Queries.intervalJoin) — never a nested loop.
    //      DuckDB's native range join computes the same relation ----
    Entry("q74_interval_join",
      (s, d) => {
        val points = ev(s, d).where(col("time") >= B && col("time") < E)
          .select("metric", "time", "cents")
        val eps = Series.alertEpisodes(
          Series.hysteresisAlerts(ev(s, d), B, E, hiCents = 15000L,
            loCents = 5000L), horizon = E)
        Queries.intervalJoin(points, eps, Seq("metric"), chunk = I2)
          .orderBy("metric", "time", "i_start")
      },
      Some(s"""WITH $ptsCte,
              |f AS (SELECT metric, time, cents FROM pts
              |      WHERE time >= $B AND time < $E),
              |d AS (SELECT metric, time, cents,
              |        CASE WHEN cents >= 15000 THEN 1
              |             WHEN cents <= 5000 THEN 0 END AS dec
              |      FROM f),
              |s AS (SELECT metric, time, cents,
              |        coalesce(last_value(dec IGNORE NULLS) OVER (
              |          PARTITION BY metric ORDER BY time
              |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              |          0) AS alert
              |      FROM d),
              |t AS (SELECT *, coalesce(lag(alert) OVER (
              |          PARTITION BY metric ORDER BY time), 0) AS prev
              |      FROM s),
              |edges AS (SELECT metric, time, alert FROM t WHERE alert != prev),
              |eps AS (SELECT metric, time AS i_start,
              |          coalesce(lead(time) OVER (PARTITION BY metric
              |            ORDER BY time), $E) AS i_end, alert
              |        FROM edges),
              |sel AS (SELECT metric, i_start, i_end FROM eps WHERE alert = 1)
              |SELECT f.metric, f.time, f.cents, e.i_start, e.i_end
              |FROM f JOIN sel e ON f.metric = e.metric
              |  AND f.time >= e.i_start AND f.time < e.i_end
              |ORDER BY 1, 2, 4""".stripMargin)),

    // ---- trailing-window aggregates at every sample (PromQL
    //      *_over_time): RANGE frame (t-12h, t], exact integer cents;
    //      DuckDB's HUGEINT window sum cast at the output (q42 lesson) ----
    Entry("q75_rolling",
      (s, d) => Series.rollingAgg(ev(s, d), B, E, window = 12L * I1)
        .orderBy("metric", "time"),
      Some(s"""WITH $ptsCte,
              |f AS (SELECT metric, time, cents FROM pts
              |      WHERE time >= $B AND time < $E)
              |SELECT metric, time, cents,
              |  CAST(sum(cents) OVER w AS BIGINT) AS roll_sum,
              |  CAST(count(*) OVER w AS BIGINT) AS roll_cnt,
              |  min(cents) OVER w AS roll_min,
              |  max(cents) OVER w AS roll_max
              |FROM f
              |WINDOW w AS (PARTITION BY metric ORDER BY time
              |  RANGE BETWEEN ${12L * I1 - 1} PRECEDING AND CURRENT ROW)
              |ORDER BY 1, 2""".stripMargin)),

    // ---- linear-interpolation resampling: both carry directions ride one
    //      union-and-carry exchange; the lerp is three IEEE ops over exact
    //      integers, mirrored verbatim in the SQL ----
    Entry("q76_resample_lerp",
      (s, d) => Series.resampleLerp(ev(s, d), B, E,
          step = 6L * 3600000000000L)
        .orderBy("metric", "time"),
      Some(s"""WITH $ptsCte,
              |g AS (SELECT m.metric, t.range AS time
              |      FROM (SELECT DISTINCT metric FROM pts) m,
              |           range($B, $E, ${6L * 3600000000000L}) t),
              |u AS (SELECT metric, time, NULL::BIGINT AS cents, 1 AS side FROM g
              |      UNION ALL
              |      SELECT metric, time, cents, 0 AS side FROM pts),
              |w AS (SELECT metric, time, side,
              |        last_value(CASE WHEN side = 0 THEN time END IGNORE NULLS)
              |          OVER wp AS pt,
              |        last_value(CASE WHEN side = 0 THEN cents END IGNORE NULLS)
              |          OVER wp AS pc,
              |        first_value(CASE WHEN side = 0 THEN time END IGNORE NULLS)
              |          OVER wn AS nt,
              |        first_value(CASE WHEN side = 0 THEN cents END IGNORE NULLS)
              |          OVER wn AS nc
              |      FROM u
              |      WINDOW wp AS (PARTITION BY metric ORDER BY time, side
              |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              |        wn AS (PARTITION BY metric ORDER BY time, side
              |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
              |SELECT metric, time,
              |  CASE WHEN pt IS NULL THEN NULL
              |       WHEN nt IS NULL THEN CAST(pc AS DOUBLE)
              |       ELSE CAST(pc AS DOUBLE) + CAST(nc - pc AS DOUBLE) *
              |         (CAST(time - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
              |  END AS value
              |FROM w WHERE side = 1 ORDER BY 1, 2""".stripMargin)),

    // ---- HyperLogLog approximate distinct users per metric: the register
    //      table and scaled harmonic sum are exact integers, so even an
    //      APPROXIMATE sketch is hash-oracle-checkable ----
    Entry("q77_hll_distinct",
      (s, d) => Sketches.approxDistinct(
          s.read.parquet(s"$d/events.parquet")
            .select(col("event_type").as("metric"), col("user_id")),
          keys = Seq("metric"), valueCol = "user_id", p = hllP)
        .orderBy("metric"),
      Some(s"""WITH ev AS (SELECT event_type AS metric,
              |              CAST(user_id AS VARCHAR) AS v
              |            FROM events WHERE user_id IS NOT NULL),
              |h AS (SELECT metric,
              |        CAST('0x' || substr(md5(v), 1, 15) AS BIGINT) AS h
              |      FROM ev),
              |r AS (SELECT metric, h // $hllWMod AS j, h % $hllWMod AS w
              |      FROM h),
              |rk AS (SELECT metric, j,
              |         CASE WHEN w = 0 THEN $hllMaxRank
              |              ELSE $hllMaxRank - length(printf('%b', w)) END AS rank
              |       FROM r),
              |regs AS (SELECT metric, j, max(rank) AS mj FROM rk GROUP BY 1, 2),
              |z AS (SELECT metric,
              |        CAST(sum(1::BIGINT << ($hllMaxRank - mj))
              |          + ($hllM - count(*)) * ${1L << hllMaxRank} AS BIGINT) AS zi,
              |        CAST($hllM - count(*) AS BIGINT) AS zero_regs
              |      FROM regs GROUP BY 1)
              |SELECT metric, zi, zero_regs,
              |  CAST('$hllAlpha' AS DOUBLE) *
              |    (CAST('$hllScale' AS DOUBLE) / CAST(zi AS DOUBLE)) AS est_raw
              |FROM z ORDER BY metric""".stripMargin)),

    // ---- tokenizer APPLY (the other half of q63's learner): segment every
    //      English doc into subword tokens under a fixed merge table. The
    //      merge table is literal in BOTH plans (a learned table would need
    //      the learner inside the oracle — q63's non-expressible part);
    //      the apply semantics themselves get a full hash oracle via the
    //      boundary-anchored replace chain, mirrored as a DuckDB recursive
    //      CTE stepping rank-by-rank through the same replaces ----
    Entry("q73_bpe_apply",
      (s, d) => {
        import s.implicits._
        val merges = bpeApplyMerges.zipWithIndex
          .map { case ((a, b), r) => (r.toLong, a, b) }
          .toDF("rank", "a", "b")
        // ASCII-sanitized like q61: Spark chars are code points, DuckDB
        // bytes — identical on printable ASCII
        val en = docs(s, d).where(col("lang") === "en")
          .select(col("doc_id"),
            regexp_replace(col("text"), "[^ -~]", "").as("text"))
        TextOps.applyBpe(en, merges).orderBy("doc_id", "pos", "spos")
      },
      Some(s"""WITH RECURSIVE
              |en AS (SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS text
              |       FROM documents WHERE lang = 'en'),
              |m AS (SELECT * FROM (VALUES ${bpeApplyMerges.zipWithIndex
                 .map { case ((a, b), r) => s"($r,'$a','$b')" }
                 .mkString(",")}) t(rank, a, b)),
              |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
              |               unnest(range(0, len(string_split(text, ' ')))) AS pos
              |        FROM en),
              |tokf AS (SELECT * FROM tok WHERE w != ''),
              |w0 AS (SELECT DISTINCT w FROM tokf),
              |seq0 AS (SELECT w, chr(31) || array_to_string(
              |           list_append(regexp_split_to_array(w, ''), '</w>'),
              |           chr(31) || chr(31)) || chr(31) AS seq FROM w0),
              |rec AS (SELECT w, seq, 0 AS step FROM seq0
              |        UNION ALL
              |        SELECT r.w, replace(r.seq,
              |            chr(31) || m.a || chr(31) || chr(31) || m.b || chr(31),
              |            chr(31) || m.a || m.b || chr(31)) AS seq,
              |          r.step + 1 AS step
              |        FROM rec r JOIN m ON m.rank = r.step),
              |fin AS (SELECT w, seq FROM rec WHERE step = ${bpeApplyMerges.size}),
              |segs AS (SELECT w, string_split(trim(seq, chr(31)),
              |                 chr(31) || chr(31)) AS toks FROM fin),
              |ex AS (SELECT w, unnest(toks) AS token,
              |              unnest(range(0, len(toks))) AS spos FROM segs)
              |SELECT t.doc_id, CAST(t.pos AS BIGINT) AS pos,
              |       CAST(e.spos AS BIGINT) AS spos, e.token
              |FROM tokf t JOIN ex e USING (w)
              |ORDER BY doc_id, pos, spos""".stripMargin)),

    // ---- exact triangle counting over the co-purchase graph (parts that
    //      share an order): degree-ordered orientation makes each triangle
    //      a single DAG path + closing edge — one wedge join, no /3
    //      dedup. The oracle runs the identical orientation in SQL; all
    //      integers, so hash parity is exact ----
    Entry("q78_triangles",
      (s, d) => {
        val li = s.read.parquet(s"$d/lineitem.parquet")
          .where(col("l_orderkey") % 4 === 0)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val edges = li.select(col("ok"), col("pk").as("src"))
          .join(li.select(col("ok"), col("pk").as("dst")), "ok")
          .where(col("src") < col("dst"))
          .select("src", "dst")
        graft.pipeline.Graph.triangleCounts(edges).orderBy("node")
      },
      Some("""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
             |            WHERE l_orderkey % 4 = 0),
             |e0 AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
             |       FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             |        AND a.l_partkey < b.l_partkey),
             |deg AS (SELECT node, count(*) AS dg
             |        FROM (SELECT u AS node FROM e0
             |              UNION ALL SELECT v FROM e0) GROUP BY 1),
             |o AS (SELECT
             |        CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND u < v)
             |             THEN u ELSE v END AS a,
             |        CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND u < v)
             |             THEN v ELSE u END AS b
             |      FROM e0 JOIN deg du ON du.node = u
             |              JOIN deg dv ON dv.node = v),
             |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
             |        FROM o e1 JOIN o e2 ON e1.b = e2.a
             |        JOIN o e3 ON e3.a = e1.a AND e3.b = e2.b),
             |n AS (SELECT unnest([x, y, z]) AS node FROM tri)
             |SELECT node, CAST(count(*) AS BIGINT) AS n_tri
             |FROM n GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- compressed-domain ANN: sign-bit binary quantization (32 bits
    //      per int64 word) + exact Hamming top-5. Pure sign tests and
    //      integer XOR/popcount — an ANN tier whose ranks are
    //      hash-oracle-checkable, and whose corpus scan touches 32× fewer
    //      bytes than the float tier ----
    Entry("q79_hamming_topk",
      (s, d) => {
        val e = emb(s, d)
        Ann.hammingTopK(e.where(col("vec_id") < 3), e, k = 5, dim = 64)
          .orderBy("qid", "rnk")
      },
      Some("""WITH sb AS (SELECT vec_id,
             |        list_transform(range(0, 2), w ->
             |          CAST(list_sum([CASE WHEN embedding[w*32+i+1] > 0
             |                         THEN (1::BIGINT << i) ELSE 0::BIGINT END
             |                         for i in range(0, 32)]) AS BIGINT)) AS b
             |      FROM embeddings),
             |p AS (SELECT q.vec_id AS qid, v.vec_id AS vid,
             |        CAST(list_sum([CAST(bit_count(xor(q.b[i+1], v.b[i+1])) AS BIGINT)
             |                       for i in range(0, 2)]) AS BIGINT) AS hamming
             |      FROM sb q JOIN sb v ON q.vec_id < 3 AND v.vec_id != q.vec_id),
             |r AS (SELECT qid, vid, hamming,
             |        CAST(row_number() OVER (PARTITION BY qid
             |          ORDER BY hamming, vid) AS BIGINT) AS rnk
             |      FROM p)
             |SELECT qid, vid, hamming, rnk FROM r WHERE rnk <= 5
             |ORDER BY 1, 4""".stripMargin)),

    // ---- OLAP hierarchy rollup (GROUPING SETS): revenue by
    //      region > nation > order-year with all three supertotal levels
    //      in one pass — Spark's rollup() lowers to a single Expand +
    //      partial-agg, so the 4 grouping levels cost ONE shuffle, not
    //      four scans. Exact cents; NULLS FIRST pinned in the oracle
    //      (DuckDB defaults NULLS LAST, Spark FIRST) ----
    Entry("q80_rollup_revenue",
      // spark.sql, not Dataset.rollup: the DSL path trips Spark's
      // DetectAmbiguousSelfJoin false positive (rollup's Expand duplicates
      // the grouping attrs; a later sort-by-name then sees two dataset-id-
      // tagged candidates). The SQL resolver carries no dataset-id
      // metadata, and the plan is the identical single Expand + one
      // partial-agg shuffle.
      (s, d) => s.sql(
        s"""WITH o AS (SELECT r_name, n_name,
           |    CAST(year(o_orderdate) AS BIGINT) AS oyear,
           |    CAST(round(o_totalprice*100) AS BIGINT) AS cents
           |  FROM parquet.`$d/orders.parquet`
           |  JOIN parquet.`$d/customer.parquet` ON o_custkey = c_custkey
           |  JOIN parquet.`$d/nation.parquet` ON c_nationkey = n_nationkey
           |  JOIN parquet.`$d/region.parquet` ON n_regionkey = r_regionkey)
           |SELECT r_name, n_name, oyear, sum(cents) AS rev_cents,
           |  count(*) AS n_orders
           |FROM o GROUP BY ROLLUP (r_name, n_name, oyear)
           |ORDER BY r_name, n_name, oyear""".stripMargin),
      Some("""WITH o AS (SELECT r_name, n_name,
             |    CAST(year(o_orderdate) AS BIGINT) AS oyear,
             |    CAST(round(o_totalprice*100) AS BIGINT) AS cents
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey)
             |SELECT r_name, n_name, oyear,
             |  CAST(sum(cents) AS BIGINT) AS rev_cents,
             |  count(*) AS n_orders
             |FROM o GROUP BY ROLLUP (r_name, n_name, oyear)
             |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST,
             |  oyear NULLS FIRST""".stripMargin)),

    // ---- salted skew join: events (≈5 metrics over the whole corpus —
    //      maximal key skew) joined to a per-metric dim through
    //      Joins.saltedJoin, which splits each hot key across 8 reducer
    //      partitions by an event_id-hashed salt. The result relation is
    //      exactly the plain join, so the oracle is the unsalted SQL ----
    Entry("q81_salted_join",
      (s, d) => {
        val e = ev(s, d).select("metric", "time", "cents", "event_id")
        val dim = e.groupBy("metric")
          .agg(sum("cents").as("metric_sum_cents"),
            count(lit(1)).as("metric_cnt"))
        graft.pipeline.Joins.saltedJoin(e, dim, Seq("metric"),
            salts = 8, saltBy = col("event_id"))
          .orderBy("metric", "time", "event_id")
      },
      Some(s"""WITH $ptsCte,
              |dim AS (SELECT metric, CAST(sum(cents) AS BIGINT) AS metric_sum_cents,
              |          count(*) AS metric_cnt
              |        FROM pts GROUP BY 1)
              |SELECT p.metric, p.time, p.cents, p.event_id,
              |       d.metric_sum_cents, d.metric_cnt
              |FROM pts p JOIN dim d USING (metric)
              |ORDER BY 1, 2, 4""".stripMargin)),

    // ---- time-of-day seasonal profile: per (metric, UTC hour-of-day)
    //      exact integer stats + one IEEE mean division. Hour index is
    //      pure int64 arithmetic on the ns grid — no calendar lib ----
    Entry("q82_hour_profile",
      (s, d) => Series.hourOfDayProfile(ev(s, d), B, E)
        .orderBy("metric", "hour"),
      Some(s"""WITH $ptsCte,
              |f AS (SELECT metric, (time // 3600000000000) % 24 AS hour,
              |        cents FROM pts WHERE time >= $B AND time < $E)
              |SELECT metric, hour, count(*) AS n,
              |  min(cents) AS min_cents, max(cents) AS max_cents,
              |  CAST(sum(cents) AS BIGINT) AS sum_cents,
              |  CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE)
              |    / CAST(count(*) AS DOUBLE) AS mean
              |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- equi-width value histogram (sparse): (metric, cents div w)
    //      counts — one partial-agg shuffle, wire carries histogram rows
    //      only. w = 2500 cents ≈ 20 buckets over this data's range ----
    Entry("q83_value_histogram",
      (s, d) => Series.valueHistogram(ev(s, d), B, E, widthCents = 2500L)
        .orderBy("metric", "bucket"),
      Some(s"""WITH $ptsCte,
              |f AS (SELECT metric, cents // 2500 AS bucket FROM pts
              |      WHERE time >= $B AND time < $E)
              |SELECT metric, bucket, bucket * 2500 AS lo_cents,
              |  count(*) AS n
              |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- Gorilla-cost storage analytics: delta-of-delta timestamp +
    //      zigzag-varint value-delta bit accounting per metric, vs the
    //      reference's 16 B/point raw record (BASELINE.md row 2). All
    //      integers; lag windows ORDER BY the unique ns time (the
    //      second-grid tu ties — click has sub-second gaps) ----
    Entry("q84_encoding_cost",
      (s, d) => Series.deltaEncodingStats(ev(s, d)).orderBy("metric"),
      Some(s"""WITH $ptsCte,
              |q AS (SELECT metric, time, cents, time // 1000000000 AS tu
              |      FROM pts),
              |d1 AS (SELECT metric, time, cents, tu,
              |         tu - lag(tu) OVER w AS dt,
              |         cents - lag(cents) OVER w AS dc
              |       FROM q WINDOW w AS (PARTITION BY metric ORDER BY time)),
              |d2 AS (SELECT *, dt - lag(dt) OVER
              |         (PARTITION BY metric ORDER BY time) AS dod
              |       FROM d1),
              |b AS (SELECT metric, dod,
              |        CASE WHEN dt IS NULL THEN 64 WHEN dod IS NULL THEN 36
              |             WHEN dod = 0 THEN 1
              |             WHEN dod BETWEEN -63 AND 64 THEN 9
              |             WHEN dod BETWEEN -255 AND 256 THEN 12
              |             WHEN dod BETWEEN -2047 AND 2048 THEN 16
              |             ELSE 36 END AS ts_bits,
              |        CASE WHEN dc IS NULL THEN 8
              |             WHEN dc BETWEEN -64 AND 63 THEN 1
              |             WHEN dc BETWEEN -8192 AND 8191 THEN 2
              |             WHEN dc BETWEEN -1048576 AND 1048575 THEN 3
              |             ELSE 5 END AS val_bytes
              |      FROM d2)
              |SELECT metric, count(*) AS n,
              |  CAST(sum(CASE WHEN dod = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_dod0,
              |  CAST(sum(CASE WHEN dod IS NOT NULL AND dod != 0
              |    AND dod BETWEEN -63 AND 64 THEN 1 ELSE 0 END) AS BIGINT) AS c_dod9,
              |  CAST(sum(CASE WHEN dod IS NOT NULL
              |    AND dod NOT BETWEEN -63 AND 64
              |    AND dod BETWEEN -255 AND 256 THEN 1 ELSE 0 END) AS BIGINT) AS c_dod12,
              |  CAST(sum(CASE WHEN dod IS NOT NULL
              |    AND dod NOT BETWEEN -255 AND 256
              |    AND dod BETWEEN -2047 AND 2048 THEN 1 ELSE 0 END) AS BIGINT) AS c_dod16,
              |  CAST(sum(CASE WHEN dod IS NOT NULL
              |    AND dod NOT BETWEEN -2047 AND 2048 THEN 1 ELSE 0 END) AS BIGINT) AS c_dod36,
              |  CAST(sum(ts_bits) AS BIGINT) AS ts_bits,
              |  CAST(sum(val_bytes) AS BIGINT) AS val_bytes,
              |  CAST((sum(ts_bits) + sum(val_bytes) * 8 + 7) // 8 AS BIGINT) AS enc_bytes,
              |  count(*) * 16 AS raw_bytes,
              |  CAST(CAST((sum(ts_bits) + sum(val_bytes) * 8 + 7) // 8 AS BIGINT) AS DOUBLE)
              |    / CAST(count(*) * 16 AS DOUBLE) AS ratio
              |FROM b GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- Count-Min sketch point estimates vs exact recount: width 64
    //      forces collisions over the 150 distinct user_ids, so the
    //      overestimate path is really exercised; probes 120-179 cover
    //      present AND absent values. All integers (q77's md5 hash
    //      family), full hash oracle despite being an approximate
    //      structure ----
    Entry("q85_count_min",
      (s, d) => Sketches.countMinEstimates(
          s.read.parquet(s"$d/events.parquet").select(col("user_id")),
          "user_id", probes = (120L to 179L).map(_.toString),
          depth = 4, width = 64)
        .orderBy("value"),
      Some("""WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS v FROM events
             |            WHERE user_id IS NOT NULL),
             |rws AS (SELECT v, j FROM ev, range(0, 4) t(j)),
             |regs AS (SELECT j,
             |          CAST('0x' || substr(md5(v || '#' || j), 1, 15) AS BIGINT)
             |            % 64 AS cell,
             |          count(*) AS cnt
             |        FROM rws GROUP BY 1, 2),
             |pr AS (SELECT CAST(p AS VARCHAR) AS value
             |       FROM range(120, 180) t(p)),
             |pc AS (SELECT value, j,
             |         CAST('0x' || substr(md5(value || '#' || j), 1, 15) AS BIGINT)
             |           % 64 AS cell
             |       FROM pr, range(0, 4) t2(j)),
             |est AS (SELECT value, CAST(min(coalesce(r.cnt, 0)) AS BIGINT) AS est
             |        FROM pc LEFT JOIN regs r USING (j, cell) GROUP BY 1),
             |ex AS (SELECT v AS value, count(*) AS exact_cnt FROM ev GROUP BY 1)
             |SELECT e.value, e.est,
             |       CAST(coalesce(x.exact_cnt, 0) AS BIGINT) AS exact_cnt
             |FROM est e LEFT JOIN ex x USING (value)
             |ORDER BY value""".stripMargin)),

    // ---- semi-structured extraction: the events.props JSON column,
    //      schema-on-read via get_json_object (Jackson path eval inside
    //      codegen — a narrow projection, no UDF), aggregated exactly.
    //      DuckDB's json_extract is the oracle's parser ----
    Entry("q86_json_props",
      (s, d) => {
        val raw = s.read.parquet(s"$d/events.parquet")
        raw.select(col("event_type").as("metric"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy("metric", "k").agg(count(lit(1)).as("n"))
          .orderBy("metric", "k")
      },
      Some("""SELECT event_type AS metric,
             |  CAST(json_extract(props, '$.k') AS BIGINT) AS k,
             |  count(*) AS n
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- pivot to wide form: per-metric bucket counts as COLUMNS.
    //      Spark's pivot with an explicit value list lowers to one
    //      conditional partial agg (no extra distinct job, one shuffle);
    //      the oracle writes the lowering out as CASE sums ----
    Entry("q87_pivot_props",
      (s, d) => {
        val raw = s.read.parquet(s"$d/events.parquet")
        val base = raw.select(col("event_type").as("metric"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .withColumn("kb", expr("k div 25"))
        val piv = base.groupBy("metric")
          .pivot("kb", Seq(0L, 1L, 2L, 3L)).agg(count(lit(1)))
          .select(col("metric"), col("0").as("b0"), col("1").as("b1"),
            col("2").as("b2"), col("3").as("b3"))
        val tot = base.groupBy("metric")
          .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
        piv.join(tot, "metric").orderBy("metric")
      },
      Some("""WITH b AS (SELECT event_type AS metric,
             |    CAST(json_extract(props, '$.k') AS BIGINT) AS k,
             |    CAST(json_extract(props, '$.k') AS BIGINT) // 25 AS kb
             |  FROM events)
             |SELECT metric,
             |  CAST(sum(CASE WHEN kb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b0,
             |  CAST(sum(CASE WHEN kb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b1,
             |  CAST(sum(CASE WHEN kb = 2 THEN 1 ELSE 0 END) AS BIGINT) AS b2,
             |  CAST(sum(CASE WHEN kb = 3 THEN 1 ELSE 0 END) AS BIGINT) AS b3,
             |  count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
             |FROM b GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- cross-correlation at bucket lags: 6h-bucket sums per metric,
    //      un-centered cosine over the pairwise overlap for lag -3..3.
    //      Integer sums + two sqrts and a divide in fixed order ----
    Entry("q88_cross_corr",
      (s, d) => Series.crossCorrelation(ev(s, d), B, E,
          step = 6L * 3600000000000L, maxLag = 3)
        .orderBy("metric_a", "metric_b", "lag"),
      Some(s"""WITH $ptsCte,
              |g AS (SELECT metric, (time - $B) // ${6L * 3600000000000L} AS bucket,
              |        CAST(sum(cents) AS BIGINT) AS s
              |      FROM pts WHERE time >= $B AND time < $E GROUP BY 1, 2),
              |x AS (SELECT g.metric AS metric_a, g.s AS xa, l.lag,
              |        g.bucket + l.lag AS jb
              |      FROM g, (SELECT unnest(range(-3, 4)) AS lag) l),
              |y AS (SELECT metric AS metric_b, bucket AS jb, s AS xb FROM g)
              |SELECT metric_a, metric_b, lag, count(*) AS n_overlap,
              |  CAST(sum(xa*xb) AS BIGINT) AS num,
              |  CAST(sum(xa*xa) AS BIGINT) AS sx2,
              |  CAST(sum(xb*xb) AS BIGINT) AS sy2,
              |  CAST(CAST(sum(xa*xb) AS BIGINT) AS DOUBLE) /
              |    (sqrt(CAST(CAST(sum(xa*xa) AS BIGINT) AS DOUBLE)) *
              |     sqrt(CAST(CAST(sum(xb*xb) AS BIGINT) AS DOUBLE))) AS corr
              |FROM x JOIN y USING (jb)
              |WHERE metric_a < metric_b
              |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // ---- product-quantization ANN: 4 subspaces × 16 sampled codebook
    //      entries (first-16-by-vec_id, oracle-recomputable), exact
    //      integer sub-distances → codes and ADC ranks hash-match. The
    //      oracle unrolls assign + table-lookup as relational joins ----
    Entry("q89_pq_topk",
      (s, d) => {
        val e = emb(s, d)
        Ann.pqTopK(e.where(col("vec_id") < 3), e, k = 5, m = 4, ksub = 16)
          .orderBy("qid", "rnk")
      },
      Some(s"""WITH $quantCte,
              |cent AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
              |           AS BIGINT) AS c, e
              |         FROM (SELECT vec_id, e FROM emb ORDER BY vec_id LIMIT 16)),
              |cd AS (SELECT v.vec_id, t.j, ct.c,
              |         CAST(list_sum([(v.e[t.j*16+i+1] - ct.e[t.j*16+i+1])
              |                        * (v.e[t.j*16+i+1] - ct.e[t.j*16+i+1])
              |                        for i in range(0, 16)]) AS BIGINT) AS dist
              |       FROM emb v, range(0, 4) t(j), cent ct),
              |cmin AS (SELECT vec_id, j, min(dist) AS md FROM cd GROUP BY 1, 2),
              |codes AS (SELECT cd.vec_id, cd.j, min(cd.c) AS code
              |          FROM cd JOIN cmin ON cd.vec_id = cmin.vec_id
              |            AND cd.j = cmin.j AND cd.dist = cmin.md
              |          GROUP BY 1, 2),
              |qd AS (SELECT vec_id AS qid, j, c, dist FROM cd WHERE vec_id < 3),
              |ad AS (SELECT qd.qid, co.vec_id AS vid,
              |         CAST(sum(qd.dist) AS BIGINT) AS adist
              |       FROM codes co JOIN qd ON qd.j = co.j AND qd.c = co.code
              |       WHERE co.vec_id != qd.qid
              |       GROUP BY 1, 2),
              |r AS (SELECT qid, vid, adist,
              |        CAST(row_number() OVER (PARTITION BY qid
              |          ORDER BY adist, vid) AS BIGINT) AS rnk
              |      FROM ad)
              |SELECT qid, vid, adist, rnk FROM r WHERE rnk <= 5
              |ORDER BY 1, 4""".stripMargin)),

    // ---- first-order user-journey transition matrix with fixed-point
    //      row probabilities: one user-keyed lead window, then
    //      matrix-sized aggregates. Tiebreak on event_id keeps the lead
    //      deterministic under any vintage ----
    Entry("q90_transitions",
      (s, d) => {
        val raw = s.read.parquet(s"$d/events.parquet")
        val f = raw.select(col("event_type").as("metric"),
          Tables.tsNs(raw).as("time"), col("user_id"), col("event_id"))
        graft.pipeline.Sessionize.transitions(f)
          .orderBy("from_type", "to_type")
      },
      Some("""WITH ev AS (SELECT user_id, event_id, event_type,
             |              epoch_us(ts)*1000 AS t FROM events),
             |l AS (SELECT user_id, event_type,
             |        lead(event_type) OVER (PARTITION BY user_id
             |          ORDER BY t, event_id) AS nxt
             |      FROM ev),
             |c AS (SELECT event_type AS from_type, nxt AS to_type,
             |        count(*) AS n
             |      FROM l WHERE nxt IS NOT NULL GROUP BY 1, 2),
             |tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS from_n
             |        FROM c GROUP BY 1)
             |SELECT c.from_type, c.to_type, c.n, t.from_n,
             |  CAST(c.n * 1000000 // t.from_n AS BIGINT) AS p_e6
             |FROM c JOIN tot t USING (from_type)
             |ORDER BY 1, 2""".stripMargin)),

    // ---- sliding 7-day distinct users per metric-day from MERGED daily
    //      HLL sketches: the corpus is read once into daily registers;
    //      the slide is max() over register rows only. Same exact-integer
    //      estimator as q77, so the whole window pipeline hash-matches ----
    Entry("q91_sliding_hll",
      (s, d) => {
        val raw = s.read.parquet(s"$d/events.parquet")
        val f = raw.select(col("event_type").as("metric"),
          Tables.tsNs(raw).as("time"), col("user_id"))
        Sketches.approxDistinctSliding(f, Seq("metric"), "user_id", "time",
            windowDays = 7, p = hllP)
          .orderBy("metric", "day")
      },
      Some(s"""WITH ev AS (SELECT event_type AS metric,
              |              epoch_us(ts)*1000 AS t,
              |              CAST(user_id AS VARCHAR) AS v
              |            FROM events WHERE user_id IS NOT NULL),
              |h AS (SELECT metric, t // 86400000000000 AS day,
              |        CAST('0x' || substr(md5(v), 1, 15) AS BIGINT) AS h
              |      FROM ev),
              |r AS (SELECT metric, day, h // $hllWMod AS j, h % $hllWMod AS w
              |      FROM h),
              |rk AS (SELECT metric, day, j,
              |         CASE WHEN w = 0 THEN $hllMaxRank
              |              ELSE $hllMaxRank - length(printf('%b', w)) END AS rank
              |       FROM r),
              |regs AS (SELECT metric, day AS rday, j, max(rank) AS mj
              |         FROM rk GROUP BY 1, 2, 3),
              |grid AS (SELECT DISTINCT metric, day FROM h),
              |mrg AS (SELECT g.metric, g.day, rg.j, max(rg.mj) AS mj
              |        FROM grid g JOIN regs rg ON rg.metric = g.metric
              |          AND rg.rday > g.day - 7 AND rg.rday <= g.day
              |        GROUP BY 1, 2, 3),
              |z AS (SELECT metric, day,
              |        CAST(sum(1::BIGINT << ($hllMaxRank - mj))
              |          + ($hllM - count(*)) * ${1L << hllMaxRank} AS BIGINT) AS zi,
              |        CAST($hllM - count(*) AS BIGINT) AS zero_regs
              |      FROM mrg GROUP BY 1, 2)
              |SELECT metric, day, zi, zero_regs,
              |  CAST('$hllAlpha' AS DOUBLE) *
              |    (CAST('$hllScale' AS DOUBLE) / CAST(zi AS DOUBLE)) AS est_raw
              |FROM z ORDER BY 1, 2""".stripMargin)),

    // ---- reciprocal rank fusion: tf-idf search ranking (q65's scorer,
    //      top 100) fused with a length-prior ranking by n_chars — rank
    //      arithmetic only, fixed-point contributions, k = 60 ----
    Entry("q92_rrf_fuse",
      (s, d) => {
        val wSearch = Window.orderBy(desc("score"), asc("doc_id"))
        val a = TextOps.searchTopK(docs(s, d),
            Seq("join", "filter", "vector"), k = 100)
          .withColumn("rnk", row_number().over(wSearch).cast("long"))
        // TakeOrdered cut FIRST, then rank the 100-row frame — a global
        // row_number over the full corpus would be a global sort
        val wLen = Window.orderBy(desc("n_chars"), asc("doc_id"))
        val b = docs(s, d).select(col("doc_id"), col("n_chars"))
          .orderBy(desc("n_chars"), asc("doc_id")).limit(100)
          .withColumn("rnk", row_number().over(wLen).cast("long"))
        TextOps.rrfFuse(Seq(a.select("doc_id", "rnk"),
          b.select("doc_id", "rnk")), topK = 20)
      },
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |           FROM documents),
             |f AS (SELECT doc_id, token, count(*) AS tf FROM t
             |      WHERE token IN ('join', 'filter', 'vector') GROUP BY 1, 2),
             |i AS (SELECT token,
             |        ((SELECT count(*) FROM documents) * 1000000) // count(*) AS idf_scaled
             |      FROM f GROUP BY token),
             |sc AS (SELECT doc_id, CAST(sum(f.tf * i.idf_scaled) AS BIGINT) AS score
             |       FROM f JOIN i USING (token) GROUP BY doc_id
             |       ORDER BY score DESC, doc_id LIMIT 100),
             |ra AS (SELECT doc_id, CAST(row_number() OVER
             |         (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk FROM sc),
             |rb AS (SELECT doc_id, rnk FROM (
             |         SELECT doc_id, CAST(row_number() OVER
             |           (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rnk
             |         FROM documents) WHERE rnk <= 100),
             |u AS (SELECT doc_id, 1000000000000 // (60 + rnk) AS c FROM ra
             |      UNION ALL
             |      SELECT doc_id, 1000000000000 // (60 + rnk) AS c FROM rb)
             |SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf,
             |       count(*) AS n_lists
             |FROM u GROUP BY 1 ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin)),

    // ---- one-pass data profiling over lineitem: stack-melt (narrow),
    //      ONE (column, value) shuffle, column-sized rollup — vs one
    //      scan per column or an Expand per distinct-agg ----
    Entry("q93_profile",
      (s, d) => graft.pipeline.Profile.profile(
          s.read.parquet(s"$d/lineitem.parquet"),
          longCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
            "l_linenumber"),
          stringCols = Seq("l_returnflag", "l_linestatus"))
        .orderBy("column"),
      Some("""WITH m AS (
             |  SELECT 'l_orderkey' AS c, CAST(l_orderkey AS BIGINT) lv,
             |         CAST(NULL AS VARCHAR) sv FROM lineitem
             |  UNION ALL SELECT 'l_partkey', l_partkey, NULL FROM lineitem
             |  UNION ALL SELECT 'l_suppkey', l_suppkey, NULL FROM lineitem
             |  UNION ALL SELECT 'l_linenumber', l_linenumber, NULL FROM lineitem
             |  UNION ALL SELECT 'l_returnflag', NULL, l_returnflag FROM lineitem
             |  UNION ALL SELECT 'l_linestatus', NULL, l_linestatus FROM lineitem),
             |g AS (SELECT c, lv, sv, coalesce(sv, CAST(lv AS VARCHAR)) AS vk,
             |        count(*) AS cnt
             |      FROM m GROUP BY 1, 2, 3, 4)
             |SELECT c AS column, CAST(sum(cnt) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN vk IS NULL THEN cnt ELSE 0 END) AS BIGINT)
             |    AS n_null,
             |  CAST(count(vk) AS BIGINT) AS n_distinct,
             |  min(lv) AS min_long, max(lv) AS max_long,
             |  min(sv) AS min_str, max(sv) AS max_str
             |FROM g GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- CDC latest-record compaction: one surviving event per user via
    //      max_by(payload, (time, event_id)) — an ordinary aggregate, so
    //      the exchange carries one map-side candidate per (key, task)
    //      instead of the whole changelog a row_number window would sort ----
    Entry("q94_cdc_latest",
      (s, d) => {
        val raw = s.read.parquet(s"$d/events.parquet")
        val f = raw.select(col("user_id"), col("event_id"),
          Tables.tsNs(raw).as("time"), col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        graft.pipeline.Cdc.latestByKey(f, Seq("user_id"),
            Seq("time", "event_id"))
          .orderBy("user_id")
      },
      Some("""WITH ev AS (SELECT user_id, event_id, epoch_us(ts)*1000 AS time,
             |              event_type, CAST(round(value*100) AS BIGINT) AS cents
             |            FROM events),
             |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
             |        ORDER BY time DESC, event_id DESC) AS rn FROM ev)
             |SELECT user_id, event_id, time, event_type, cents
             |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // ---- SCD type-2 history: each change row becomes a [valid_from,
    //      valid_to) interval, NULL-open on the current row; one per-key
    //      lead window, partition width = one user's history ----
    Entry("q95_scd2",
      (s, d) => {
        val raw = s.read.parquet(s"$d/events.parquet")
        val f = raw.select(col("user_id"), col("event_id"),
          Tables.tsNs(raw).as("time"), col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        graft.pipeline.Cdc.scd2(f, Seq("user_id"), Seq("time", "event_id"),
            validFrom = "time")
          .orderBy("user_id", "time", "event_id")
      },
      Some("""WITH ev AS (SELECT user_id, event_id, epoch_us(ts)*1000 AS time,
             |              event_type, CAST(round(value*100) AS BIGINT) AS cents
             |            FROM events)
             |SELECT user_id, event_id, time, event_type, cents,
             |  time AS valid_from,
             |  lead(time) OVER (PARTITION BY user_id
             |    ORDER BY time, event_id) AS valid_to,
             |  lead(time) OVER (PARTITION BY user_id
             |    ORDER BY time, event_id) IS NULL AS is_current
             |FROM ev ORDER BY user_id, time, event_id""".stripMargin)),

    // ---- perceptual image hashing: REAL PNG decode → 8×8 nearest-resize →
    //      strict-mean aHash bits packed as two 32-bit halves (overflow-safe
    //      in both engines' BIGINT) + Hamming distance to image 0 via
    //      XOR+popcount. The synthetic images are closed-form patterns, so
    //      the oracle recomputes decode→resize→hash arithmetically,
    //      q36-style: a hash match proves the real codec path bit-exact ----
    Entry("q96_image_ahash",
      (s, _) => {
        val media = Multimodal.syntheticMedia(s, 300)
        val h = Multimodal.imageAHash(media)
        val ref = h.where(col("media_id") === 0)
          .select(col("ahash_hi").as("ref_hi"), col("ahash_lo").as("ref_lo"))
        h.crossJoin(broadcast(ref))
          .select(col("media_id"), col("ahash_hi"), col("ahash_lo"),
            (bit_count(col("ahash_hi").bitwiseXOR(col("ref_hi"))) +
              bit_count(col("ahash_lo").bitwiseXOR(col("ref_lo"))))
              .cast("long").as("hamming"))
          .orderBy("media_id")
      },
      Some(s"""WITH $imageHashCte,
              |r AS (SELECT ahash_hi AS rh, ahash_lo AS rl FROM h WHERE media_id = 0)
              |SELECT h.media_id, h.ahash_hi, h.ahash_lo,
              |  CAST(bit_count(xor(h.ahash_hi, r.rh))
              |       + bit_count(xor(h.ahash_lo, r.rl)) AS BIGINT) AS hamming
              |FROM h, r ORDER BY media_id""".stripMargin)),

    // ---- record linkage: cross-TABLE edit-distance join (entity
    //      resolution between two catalogs) — q61's length-band blocking
    //      with a 3-band probe on the left side so each pair is emitted
    //      exactly once without an ownership rule. Same ASCII
    //      sanitization: DuckDB's levenshtein is byte-based, Spark's
    //      counts code points; on pure ASCII they agree exactly ----
    Entry("q97_entity_link",
      (s, d) => {
        // the second catalog is derived deterministically (the q50/q52
        // pattern): id-shifted rows whose 80-char ASCII prefix has every
        // 'a' replaced — docs with few 'a's link back to their original
        // VARIABLE-length prefixes (40 + doc_id % 60): a constant cut
        // would put every doc at one length — one degenerate band, an
        // accidental all-pairs; the id-spread keeps ~12 bands populated
        val en = docs(s, d).where(col("lang") === "en")
          .select(col("doc_id"),
            expr("substring(regexp_replace(text, '[^ -~]', ''), 1, " +
              "40 + cast(doc_id % 60 as int))").as("text"))
        val catalog = en.select((col("doc_id") + 1000000L).as("doc_id"),
          regexp_replace(col("text"), "a", "q").as("text"))
        Dedup.editDistanceJoin(en, catalog, maxDist = 4,
            maxBucket = Int.MaxValue)
          .orderBy("left_id", "right_id")
      },
      Some("""WITH en AS (SELECT doc_id,
             |              substr(regexp_replace(text, '[^ -~]', '', 'g'),
             |                     1, 40 + CAST(doc_id % 60 AS INT)) AS t
             |            FROM documents WHERE lang = 'en'),
             |l AS (SELECT doc_id, t, length(t) AS len FROM en),
             |r AS (SELECT doc_id + 1000000 AS doc_id, replace(t, 'a', 'q') AS t,
             |             length(t) AS len FROM en),
             |p AS (SELECT l.doc_id AS left_id, r.doc_id AS right_id,
             |             CAST(levenshtein(l.t, r.t) AS BIGINT) AS dist
             |      FROM l JOIN r ON abs(l.len - r.len) <= 4)
             |SELECT left_id, right_id, dist FROM p WHERE dist <= 4
             |ORDER BY 1, 2""".stripMargin)),

    // ---- multi-source BFS shortest paths on the q56 supplier↔customer
    //      bipartite graph: frontier expansion, each round touching only
    //      the frontier's out-edges + a visited-set anti join; oracle is
    //      a DuckDB recursive CTE taking min(dist) over walk levels ----
    Entry("q98_bfs_distances",
      (s, d) => {
        val li = s.read.parquet(s"$d/lineitem.parquet")
        val ord = s.read.parquet(s"$d/orders.parquet")
        val fwd = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey").cast("long").as("src"),
            (col("o_custkey").cast("long") + 1000000L).as("dst"))
        val edges = fwd.unionByName(
          fwd.select(col("dst").as("src"), col("src").as("dst")))
        graft.pipeline.Graph.bfsDistances(edges, Seq(1L, 2L), maxDepth = 6)
          .orderBy("node")
      },
      Some("""WITH RECURSIVE e AS (
             |  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
             |         CAST(o_custkey + 1000000 AS BIGINT) AS dst
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  UNION
             |  SELECT DISTINCT CAST(o_custkey + 1000000 AS BIGINT),
             |         CAST(l_suppkey AS BIGINT)
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |v AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
             |walk(node, dist) AS (
             |  SELECT node, 0 FROM v WHERE node IN (1, 2)
             |  UNION
             |  SELECT e.dst, walk.dist + 1 FROM walk
             |  JOIN e ON e.src = walk.node
             |  WHERE walk.dist < 6)
             |SELECT node, CAST(min(dist) AS BIGINT) AS dist
             |FROM walk GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- BM25 retrieval in exact integer arithmetic: Robertson tf
    //      saturation as the rational 22·tf·L / (10·tf·L + 3·L + 9·dl·N)
    //      at fixed point 1e6 (k1=1.2, b=0.75 multiplied through by 10·L),
    //      q65's log-free integer idf — bit-identical across engines ----
    Entry("q99_bm25",
      (s, d) => TextOps.bm25TopK(docs(s, d),
          Seq("join", "filter", "vector"), k = 20),
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |           FROM documents),
             |dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
             |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS L FROM dl),
             |nn AS (SELECT count(*) AS N FROM documents),
             |f AS (SELECT doc_id, token, count(*) AS tf FROM t
             |      WHERE token IN ('join', 'filter', 'vector') GROUP BY 1, 2),
             |i AS (SELECT token, (nn.N * 1000000) // count(*) AS idf_scaled
             |      FROM f, nn GROUP BY token, nn.N),
             |sc AS (SELECT f.doc_id,
             |         CAST(sum(i.idf_scaled *
             |           ((22 * f.tf * tot.L * 1000000)
             |            // (10 * f.tf * tot.L + 3 * tot.L + 9 * dl.dl * nn.N)))
             |           AS BIGINT) AS score
             |       FROM f JOIN i USING (token) JOIN dl USING (doc_id), tot, nn
             |       GROUP BY 1)
             |SELECT doc_id, score FROM sc
             |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)),

    // ---- equal-frequency discretization: n_chars into 8 quantile
    //      buckets under q54's integer selection rule; boundaries baked
    //      as plan literals (q42 discipline) so assignment is narrow ----
    Entry("q100_quantile_bins",
      (s, d) => graft.pipeline.Profile.quantileBins(
          docs(s, d).select(col("doc_id"), col("n_chars")),
          "n_chars", k = 8)
        .orderBy("doc_id"),
      Some("""WITH h AS (SELECT n_chars AS v, count(*) AS c
             |           FROM documents GROUP BY 1),
             |cw AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum,
             |              sum(c) OVER () AS n
             |       FROM h),
             |b AS (SELECT j, min(v) AS bv
             |      FROM cw, range(1, 8) t(j)
             |      WHERE cum * 8 >= n * j GROUP BY 1)
             |SELECT d.doc_id, d.n_chars,
             |  CAST(sum(CASE WHEN d.n_chars > b.bv THEN 1 ELSE 0 END) AS BIGINT)
             |    AS bin
             |FROM documents d CROSS JOIN b
             |GROUP BY 1, 2 ORDER BY doc_id""".stripMargin)),

    // ---- incremental near-dup: a NEW batch (doc_id % 5 = 0) against the
    //      EXISTING corpus (the rest) — the R-S LSH join; oracle is the
    //      cross-set brute-force Jaccard (q15's argument) ----
    Entry("q101_neardup_delta",
      (s, d) => {
        val all = docs(s, d)
        Dedup.nearDupPairsAgainst(
            all.where(pmod(col("doc_id"), lit(5)) =!= 0),
            all.where(pmod(col("doc_id"), lit(5)) === 0),
            threshold = 0.8)
          .orderBy("batch_id", "corpus_id")
      },
      Some(s"""WITH $shCte
              |SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
              |  CAST(len(list_intersect(b.st, c.st)) AS BIGINT) AS inter,
              |  CAST(len(b.st) + len(c.st) - len(list_intersect(b.st, c.st)) AS BIGINT) AS uni,
              |  CAST(len(list_intersect(b.st, c.st)) AS DOUBLE) /
              |    (len(b.st) + len(c.st) - len(list_intersect(b.st, c.st))) AS jaccard
              |FROM sh b JOIN sh c
              |  ON b.doc_id % 5 = 0 AND c.doc_id % 5 != 0
              |WHERE CAST(len(list_intersect(b.st, c.st)) AS DOUBLE) /
              |    (len(b.st) + len(c.st) - len(list_intersect(b.st, c.st))) >= 0.8
              |ORDER BY 1, 2""".stripMargin)),

    // ---- EXACT cosine-threshold similarity join (Bayardo all-pairs,
    //      WWW'07): tf-vector cosine ≥ 4/5 with every decision an integer
    //      comparison (index: psum·25 ≥ 16·n2; accept: dot²·25 ≥
    //      16·na2·nb2) — so the brute-force SQL is an exact oracle and
    //      the prefix filter's recall-1 claim is a checked fact ----
    Entry("q102_cosine_join",
      // every 5th doc: tf-vector cosine join output grows ~quadratically in
      // corpus density (21k pairs even on the subset at sf0.1) — the bench
      // budget wants the exactness demonstrated, not the biggest join
      (s, d) => Dedup.cosineJoin(
          docs(s, d).where(pmod(col("doc_id"), lit(5)) === 0),
          tauNum = 4L, tauDen = 5L)
        .orderBy("doc_a", "doc_b"),
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |           FROM documents WHERE doc_id % 5 = 0),
             |f AS (SELECT doc_id, term, count(*) AS w FROM t GROUP BY 1, 2),
             |n2 AS (SELECT doc_id, CAST(sum(w*w) AS BIGINT) AS nn FROM f GROUP BY 1),
             |dt AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |         CAST(sum(a.w * b.w) AS BIGINT) AS dot
             |       FROM f a JOIN f b ON a.term = b.term AND a.doc_id < b.doc_id
             |       GROUP BY 1, 2)
             |SELECT doc_a, doc_b, dot, x.nn AS na2, y.nn AS nb2,
             |  CAST(dot AS DOUBLE) /
             |    sqrt(CAST(x.nn AS DOUBLE) * CAST(y.nn AS DOUBLE)) AS cosine
             |FROM dt JOIN n2 x ON dt.doc_a = x.doc_id
             |        JOIN n2 y ON dt.doc_b = y.doc_id
             |WHERE dot * dot * 25 >= 16 * x.nn * y.nn
             |ORDER BY 1, 2""".stripMargin)),

    // ---- skew-safe per-group top-k: local top-k per (key, salt) shard,
    //      then a global settle over k·salts survivors — the second
    //      exchange is bounded by the ANSWER size, not the group size;
    //      result equals the textbook single window (the oracle) ----
    Entry("q103_per_source_topk",
      (s, d) => graft.pipeline.TopK.perKeyTopK(
          docs(s, d).select("doc_id", "source", "n_chars"),
          Seq("source"), Seq(desc("n_chars"), asc("doc_id")), k = 5,
          saltBy = col("doc_id"))
        .orderBy("source", "rnk"),
      Some("""WITH r AS (SELECT doc_id, source, n_chars,
             |  CAST(row_number() OVER (PARTITION BY source
             |    ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rnk
             |FROM documents)
             |SELECT doc_id, source, n_chars, rnk FROM r WHERE rnk <= 5
             |ORDER BY source, rnk""".stripMargin)),

    // ---- mergeable HDR quantile sketch: per-source n_chars percentiles
    //      from leading-(1+m)-bit buckets — pure integer (bit length via
    //      bin/printf('%b')), order-independent, q54's selection rule on
    //      register rows; answer = the chosen bucket's true min value ----
    Entry("q104_hdr_quantiles",
      (s, d) => Sketches.hdrQuantiles(
          docs(s, d).select(col("source"), col("n_chars")),
          Seq("source"), "n_chars", ps = Seq(50, 90, 99), m = 5)
        .orderBy("source", "p"),
      Some("""WITH v AS (SELECT source, n_chars AS v FROM documents
             |           WHERE n_chars IS NOT NULL AND n_chars >= 0),
             |bk AS (SELECT source, v,
             |         CASE WHEN v < 64 THEN v
             |              ELSE (length(printf('%b', v)) - 1 - 5) * 32
             |                   + (v // (1::BIGINT << (length(printf('%b', v)) - 1 - 5)))
             |         END AS b
             |       FROM v),
             |r AS (SELECT source, b, count(*) AS c, min(v) AS vmin
             |      FROM bk GROUP BY 1, 2),
             |cw AS (SELECT source, b, vmin,
             |         sum(c) OVER (PARTITION BY source ORDER BY b) AS cum,
             |         sum(c) OVER (PARTITION BY source) AS n
             |       FROM r),
             |q AS (SELECT cw.source, p.p, cw.vmin, cw.n,
             |        row_number() OVER (PARTITION BY cw.source, p.p
             |          ORDER BY cw.b) AS rn
             |      FROM cw, (VALUES (50), (90), (99)) p(p)
             |      WHERE cum * 100 >= n * p.p)
             |SELECT source, CAST(p AS BIGINT) AS p, vmin AS q_approx,
             |  CAST(n AS BIGINT) AS n
             |FROM q WHERE rn = 1 ORDER BY source, p""".stripMargin)),

    // ---- collocations by exact-integer lift: the word2vec phrase pass
    //      with the log dropped (ranking-equivalent to PMI); bigrams off
    //      a doc-keyed lead window, unigram joins vocabulary-sized ----
    Entry("q105_collocations",
      (s, d) => TextOps.collocations(docs(s, d), minCount = 5L, k = 50),
      Some("""WITH tt AS (SELECT doc_id, string_split(text, ' ') AS s
             |            FROM documents),
             |bgx AS (SELECT unnest([{'w1': s[i], 'w2': s[i+1]}
             |                      for i in range(1, len(s))]) AS b
             |        FROM tt),
             |bg AS (SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS c_xy
             |       FROM bgx GROUP BY 1, 2 HAVING count(*) >= 5),
             |un AS (SELECT unnest(s) AS t FROM tt),
             |uc AS (SELECT t, count(*) AS c FROM un GROUP BY 1),
             |nt AS (SELECT count(*) AS n FROM un)
             |SELECT w1, w2, c_xy, x.c AS c_x, y.c AS c_y,
             |  CAST((c_xy * nt.n * 1000000) // (x.c * y.c) AS BIGINT) AS lift_e6
             |FROM bg JOIN uc x ON bg.w1 = x.t
             |        JOIN uc y ON bg.w2 = y.t, nt
             |ORDER BY lift_e6 DESC, w1, w2 LIMIT 50""".stripMargin)),

    // ---- embedding QA: each label's farthest-from-centroid member in
    //      exact integers (n²·‖v−mean‖² = Σ(n·q − S)², no mean division)
    //      — mislabel/contamination flagging over the embeddings table ----
    Entry("q106_label_outliers",
      (s, d) => Ann.labelOutliers(emb(s, d)).orderBy("label"),
      Some("""WITH e0 AS (SELECT vec_id, label,
             |    list_transform(embedding,
             |      x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS e
             |  FROM embeddings),
             |t AS (SELECT vec_id, label,
             |        unnest([{'d': i, 'q': e[i]} for i in range(1, len(e)+1)]) AS u
             |      FROM e0),
             |x AS (SELECT vec_id, label, u.d AS d, u.q AS q FROM t),
             |sd AS (SELECT label, d, CAST(sum(q) AS BIGINT) AS s
             |       FROM x GROUP BY 1, 2),
             |n AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1),
             |dd AS (SELECT x.label, x.vec_id,
             |         CAST(sum((n.n*x.q - sd.s)*(n.n*x.q - sd.s)) AS BIGINT) AS d2_num
             |       FROM x JOIN sd ON x.label = sd.label AND x.d = sd.d
             |              JOIN n ON x.label = n.label
             |       GROUP BY 1, 2),
             |r AS (SELECT label, vec_id, d2_num,
             |        row_number() OVER (PARTITION BY label
             |          ORDER BY d2_num DESC, vec_id) AS rn
             |      FROM dd)
             |SELECT r.label, n.n, r.vec_id AS outlier_id, r.d2_num
             |FROM r JOIN n ON r.label = n.label
             |WHERE rn = 1 ORDER BY r.label""".stripMargin)),

    // ---- retrieval chunking: overlapping 40-token windows at stride 30
    //      — a narrow projection (explode + slice), zero shuffles ----
    Entry("q107_chunk_docs",
      (s, d) => TextOps.chunkDocs(docs(s, d), window = 40, stride = 30)
        .orderBy("doc_id", "chunk_id"),
      Some("""WITH tt AS (SELECT doc_id, string_split(text, ' ') AS s
             |            FROM documents),
             |c AS (SELECT doc_id, len(s) AS n,
             |        unnest([{'k': k, 'c': array_to_string(s[k*30+1 : k*30+40], ' ')}
             |                for k in range(0, (len(s)-1)//30 + 1)]) AS u
             |      FROM tt WHERE len(s) > 0)
             |SELECT doc_id, CAST(u.k AS BIGINT) AS chunk_id,
             |  CAST(u.k*30 AS BIGINT) AS start_tok,
             |  CAST(least(40, n - u.k*30) AS BIGINT) AS n_tok,
             |  u.c AS chunk
             |FROM c ORDER BY doc_id, chunk_id""".stripMargin)),

    // ---- snapshot diff: the second snapshot is derived deterministically
    //      (q97's pattern) — drops every 17th event, bumps cents on every
    //      13th — so added/removed/changed/same classes all occur ----
    Entry("q108_snapshot_diff",
      (s, d) => {
        val raw = s.read.parquet(s"$d/events.parquet")
        val ev = raw.select(col("event_id"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        val neu = ev.where(pmod(col("event_id"), lit(17)) =!= 0)
          .withColumn("cents",
            when(pmod(col("event_id"), lit(13)) === 0, col("cents") + 1)
              .otherwise(col("cents")))
        graft.pipeline.Cdc.snapshotDiff(ev, neu, Seq("event_id"), "cents")
          .orderBy("event_id")
      },
      Some("""WITH ev AS (SELECT event_id,
             |              CAST(round(value*100) AS BIGINT) AS cents
             |            FROM events),
             |neu AS (SELECT event_id,
             |          CASE WHEN event_id % 13 = 0 THEN cents + 1
             |               ELSE cents END AS cents
             |        FROM ev WHERE event_id % 17 != 0)
             |SELECT coalesce(o.event_id, n.event_id) AS event_id,
             |  o.cents AS old_cents, n.cents AS new_cents,
             |  CASE WHEN o.event_id IS NULL THEN 'added'
             |       WHEN n.event_id IS NULL THEN 'removed'
             |       WHEN o.cents IS NOT DISTINCT FROM n.cents THEN 'same'
             |       ELSE 'changed' END AS status
             |FROM ev o FULL OUTER JOIN neu n ON o.event_id = n.event_id
             |ORDER BY 1""".stripMargin)),

    // ---- market-basket affinity: q105's exact-integer lift on the
    //      (order, part) bipartite frame — pairs within a basket via an
    //      orderkey self-join (quadratic only in basket width), part
    //      frequencies joined back, TakeOrdered cut ----
    Entry("q109_basket_lift",
      (s, d) => {
        val b = s.read.parquet(s"$d/lineitem.parquet")
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val pairs = b.select(col("l_orderkey"), col("l_partkey").as("pa"))
          .join(b.select(col("l_orderkey"), col("l_partkey").as("pb")),
            "l_orderkey")
          .where(col("pa") < col("pb"))
          .groupBy("pa", "pb").agg(count(lit(1)).as("c_xy"))
          .where(col("c_xy") >= 3)
        val pc = b.groupBy("l_partkey").agg(count(lit(1)).as("c"))
        val n = b.select("l_orderkey").distinct()
          .agg(count(lit(1)).as("n_ord"))
        pairs
          .join(pc.select(col("l_partkey").as("pa"), col("c").as("c_a")), "pa")
          .join(pc.select(col("l_partkey").as("pb"), col("c").as("c_b")), "pb")
          .crossJoin(broadcast(n))
          .withColumn("lift_e6", expr("(c_xy * n_ord * 1000000) div (c_a * c_b)"))
          .orderBy(desc("lift_e6"), asc("pa"), asc("pb")).limit(50)
          .select("pa", "pb", "c_xy", "c_a", "c_b", "lift_e6")
      },
      Some("""WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |p AS (SELECT a.l_partkey AS pa, b2.l_partkey AS pb,
             |        count(*) AS c_xy
             |      FROM b a JOIN b b2 ON a.l_orderkey = b2.l_orderkey
             |        AND a.l_partkey < b2.l_partkey
             |      GROUP BY 1, 2 HAVING count(*) >= 3),
             |pc AS (SELECT l_partkey, count(*) AS c FROM b GROUP BY 1),
             |n AS (SELECT count(DISTINCT l_orderkey) AS n_ord FROM b)
             |SELECT pa, pb, c_xy, x.c AS c_a, y.c AS c_b,
             |  CAST((c_xy * n.n_ord * 1000000) // (x.c * y.c) AS BIGINT) AS lift_e6
             |FROM p JOIN pc x ON p.pa = x.l_partkey
             |       JOIN pc y ON p.pb = y.l_partkey, n
             |ORDER BY lift_e6 DESC, pa, pb LIMIT 50""".stripMargin)),

    // ---- TPC-H Q5 shape: local-supplier volume per nation in one region
    //      and year — the multi-dim star join with every dim broadcast and
    //      the fact-fact join shuffling once on orderkey; exact cents·e4 ----
    Entry("q110_local_volume",
      (s, d) => {
        val li = s.read.parquet(s"$d/lineitem.parquet")
        val ord = s.read.parquet(s"$d/orders.parquet")
          .where(year(col("o_orderdate")) === 1997)
        val cust = s.read.parquet(s"$d/customer.parquet")
        val supp = s.read.parquet(s"$d/supplier.parquet")
        val nat = s.read.parquet(s"$d/nation.parquet")
        val reg = s.read.parquet(s"$d/region.parquet")
          .where(col("r_name") === "ASIA")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .where(col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long") *
            (lit(100L) - round(col("l_discount") * 100, 0).cast("long")))
            .as("revenue_e4"),
            count(lit(1)).as("cnt"))
          .orderBy(desc("revenue_e4"), asc("n_name"))
      },
      Some("""SELECT n_name,
             |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) *
             |       (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
             |    AS revenue_e4,
             |  count(*) AS cnt
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE year(o_orderdate) = 1997
             |  AND c_nationkey = s_nationkey
             |  AND r_name = 'ASIA'
             |GROUP BY 1 ORDER BY revenue_e4 DESC, n_name""".stripMargin)),

    // ---- bigram-fluency quality scoring: mean corpus-wide conditional
    //      bigram probability per doc in fixed point — the LM-style
    //      fluency signal without a model or a log ----
    Entry("q111_fluency",
      (s, d) => TextOps.bigramFluency(docs(s, d)).orderBy("doc_id"),
      Some("""WITH tt AS (SELECT doc_id, string_split(text, ' ') AS s
             |            FROM documents),
             |bgx AS (SELECT doc_id, unnest([{'w1': s[i], 'w2': s[i+1]}
             |                              for i in range(1, len(s))]) AS b
             |        FROM tt),
             |bg AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bgx),
             |cxy AS (SELECT w1, w2, count(*) AS c_xy FROM bg GROUP BY 1, 2),
             |cx AS (SELECT w1, count(*) AS c_x FROM bg GROUP BY 1),
             |p AS (SELECT bg.doc_id, (cxy.c_xy * 1000000) // cx.c_x AS p
             |      FROM bg JOIN cxy USING (w1, w2) JOIN cx USING (w1))
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             |  CAST(sum(p) // count(*) AS BIGINT) AS fluency_e6
             |FROM p GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- importance sampling: per-ROW keep probability (here a length
    //      prior) over the same content-hash buckets as q39 — the
    //      quality-weighted corpus construction step ----
    Entry("q112_weighted_sample",
      (s, d) => {
        val w = least(lit(1000000L), col("n_chars").cast("long") * 1500L)
        Sampling.weightedSample(
            docs(s, d).select(col("doc_id"), col("n_chars")), "doc_id", w)
          .withColumn("weight_e6", w)
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, n_chars,
             |  least(1000000, n_chars * 1500) AS weight_e6
             |FROM (SELECT doc_id, n_chars,
             |        CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
             |          % 1000000 AS b
             |      FROM documents)
             |WHERE b < least(1000000, n_chars * 1500)
             |ORDER BY doc_id""".stripMargin)),

    // ---- capstone corpus pipeline: exact-dup survivorship → bigram
    //      fluency over the SURVIVOR corpus → fluency floor → importance
    //      sample weighted by the fluency margin — four verified operators
    //      composed end-to-end in one plan, one oracle ----
    Entry("q113_corpus_pipeline",
      (s, d) => {
        val all = docs(s, d)
        val sur = all.groupBy(md5(col("text")).as("_h"))
          .agg(min("doc_id").as("doc_id"))
        val corpus = all.join(sur.select("doc_id"), "doc_id")
        val fl = TextOps.bigramFluency(corpus)
        val weighted = fl.where(col("fluency_e6") >= 34000L)
          .withColumn("weight_e6",
            least(lit(1000000L),
              greatest(lit(0L), (col("fluency_e6") - 30000L) * 50L)))
        Sampling.weightedSample(weighted, "doc_id", col("weight_e6"))
          .orderBy("doc_id")
      },
      Some("""WITH sur AS (SELECT min(doc_id) AS doc_id FROM documents
             |             GROUP BY md5(text)),
             |d2 AS (SELECT d.doc_id, d.text FROM documents d
             |       JOIN sur USING (doc_id)),
             |tt AS (SELECT doc_id, string_split(text, ' ') AS s FROM d2),
             |bgx AS (SELECT doc_id, unnest([{'w1': s[i], 'w2': s[i+1]}
             |                              for i in range(1, len(s))]) AS b
             |        FROM tt),
             |bg AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bgx),
             |cxy AS (SELECT w1, w2, count(*) AS c_xy FROM bg GROUP BY 1, 2),
             |cx AS (SELECT w1, count(*) AS c_x FROM bg GROUP BY 1),
             |p AS (SELECT bg.doc_id, (cxy.c_xy * 1000000) // cx.c_x AS p
             |      FROM bg JOIN cxy USING (w1, w2) JOIN cx USING (w1)),
             |fl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             |         CAST(sum(p) // count(*) AS BIGINT) AS fluency_e6
             |       FROM p GROUP BY 1),
             |g AS (SELECT *, least(1000000,
             |        greatest(0, (fluency_e6 - 30000) * 50)) AS w
             |      FROM fl WHERE fluency_e6 >= 34000)
             |SELECT doc_id, n_bigrams, fluency_e6, CAST(w AS BIGINT) AS weight_e6
             |FROM g
             |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
             |      % 1000000 < w
             |ORDER BY doc_id""".stripMargin)),

    // ---- document clustering end-to-end: hashVectorize (16-dim token
    //      count vectors) → deterministic seeded centroids (8 smallest
    //      doc_ids, the q43 discipline) → min-L2 assignment. The 1e4
    //      quantization is a PURE SCALING of integer counts, so the
    //      oracle assigns on raw counts — identical argmin, same ties ----
    Entry("q114_doc_clusters",
      (s, d) => {
        val v = TextOps.hashVectorize(docs(s, d), dim = 16)
          .select(col("doc_id").as("vec_id"), col("vec").as("embedding"))
        val cents = Ann.ivfCentroids(v, nlist = 8)
        Ann.ivfAssign(v, cents)
          .select(col("vid").as("doc_id"), col("list_id"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |           FROM documents),
             |cnt AS (SELECT doc_id,
             |          CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 16 AS b,
             |          count(*) AS c
             |        FROM t GROUP BY 1, 2),
             |grid AS (SELECT g.doc_id, g.j, coalesce(cnt.c, 0) AS c
             |         FROM (SELECT d.doc_id, j.j
             |               FROM (SELECT DISTINCT doc_id FROM documents) d,
             |                    range(0, 16) j(j)) g
             |         LEFT JOIN cnt ON cnt.doc_id = g.doc_id AND cnt.b = g.j),
             |cents AS (SELECT row_number() OVER (ORDER BY doc_id) - 1 AS list_id,
             |            doc_id AS cdoc
             |          FROM (SELECT DISTINCT doc_id FROM documents
             |                ORDER BY doc_id LIMIT 8)),
             |cg AS (SELECT cents.list_id, grid.j, grid.c AS cc
             |       FROM cents JOIN grid ON grid.doc_id = cents.cdoc),
             |dist AS (SELECT g.doc_id, cg.list_id,
             |           sum((g.c - cg.cc) * (g.c - cg.cc)) AS d2
             |         FROM grid g JOIN cg ON g.j = cg.j GROUP BY 1, 2),
             |asg AS (SELECT doc_id, list_id,
             |          row_number() OVER (PARTITION BY doc_id
             |            ORDER BY d2, list_id) AS rn
             |        FROM dist)
             |SELECT doc_id, CAST(list_id AS BIGINT) AS list_id
             |FROM asg WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // ---- semantic dedup (SemDeDup): cluster in the 64-dim hash-count
    //      space with the q114 seeded quantizer, then near-dup ONLY
    //      within a cluster — exact-integer cosine rule (tau 19/20),
    //      dominated-by-smaller survivorship. The oracle recomputes the
    //      whole loop: dense-grid assignment + sparse-count dot pairs ----
    Entry("q115_semantic_dedup",
      (s, d) => Dedup.semanticDedup(docs(s, d), tauNum = 19L, tauDen = 20L,
          dim = 64, nlist = 8)
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |           FROM documents),
             |cnt AS (SELECT doc_id,
             |          CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 64 AS b,
             |          count(*) AS c
             |        FROM t GROUP BY 1, 2),
             |grid AS (SELECT g.doc_id, g.j, coalesce(cnt.c, 0) AS c
             |         FROM (SELECT d.doc_id, j.j
             |               FROM (SELECT DISTINCT doc_id FROM documents) d,
             |                    range(0, 64) j(j)) g
             |         LEFT JOIN cnt ON cnt.doc_id = g.doc_id AND cnt.b = g.j),
             |cents AS (SELECT row_number() OVER (ORDER BY doc_id) - 1 AS list_id,
             |            doc_id AS cdoc
             |          FROM (SELECT DISTINCT doc_id FROM documents
             |                ORDER BY doc_id LIMIT 8)),
             |cg AS (SELECT cents.list_id, grid.j, grid.c AS cc
             |       FROM cents JOIN grid ON grid.doc_id = cents.cdoc),
             |dist AS (SELECT g.doc_id, cg.list_id,
             |           sum((g.c - cg.cc) * (g.c - cg.cc)) AS d2
             |         FROM grid g JOIN cg ON g.j = cg.j GROUP BY 1, 2),
             |asg AS (SELECT doc_id, list_id FROM (
             |          SELECT doc_id, list_id,
             |            row_number() OVER (PARTITION BY doc_id
             |              ORDER BY d2, list_id) AS rn
             |          FROM dist) WHERE rn = 1),
             |n2 AS (SELECT doc_id, CAST(sum(c*c) AS BIGINT) AS nn
             |       FROM cnt GROUP BY 1),
             |pr AS (SELECT a1.doc_id AS da, a2.doc_id AS db
             |       FROM asg a1 JOIN asg a2
             |         ON a1.list_id = a2.list_id AND a1.doc_id < a2.doc_id),
             |dt AS (SELECT pr.da, pr.db, CAST(sum(x.c * y.c) AS BIGINT) AS dot
             |       FROM pr JOIN cnt x ON x.doc_id = pr.da
             |               JOIN cnt y ON y.doc_id = pr.db AND y.b = x.b
             |       GROUP BY 1, 2),
             |dom AS (SELECT DISTINCT dt.db AS doc_id FROM dt
             |        JOIN n2 xa ON dt.da = xa.doc_id
             |        JOIN n2 yb ON dt.db = yb.doc_id
             |        WHERE dot * dot * 400 >= xa.nn * yb.nn * 361)
             |SELECT a.doc_id, CAST(a.list_id AS BIGINT) AS list_id,
             |  (dom.doc_id IS NULL) AS is_kept
             |FROM asg a LEFT JOIN dom ON dom.doc_id = a.doc_id
             |ORDER BY 1""".stripMargin)),

    // ---- ANN quality evaluation: recall@5 of the IVF probe tier
    //      (nlist=16, nprobe=4, seeded centroids) against the exact
    //      brute-force ranking, per query — the continuous QA loop that
    //      keeps an approximate index honest as data drifts ----
    Entry("q116_ann_recall",
      (s, d) => {
        val e = emb(s, d)
        val qs = e.where(col("vec_id") < 10)
        Eval.recallAtK(
            Ann.ivfTopK(qs, e, k = 5, nlist = 16, nprobe = 4, kmeansIters = 0),
            Ann.bruteForceTopK(qs, e, k = 5), k = 5)
          .orderBy("qid")
      },
      Some(s"""WITH $quantCte,
              |cent AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS list_id,
              |           e AS ce
              |         FROM nrm ORDER BY vec_id LIMIT 16),
              |asg AS (SELECT vec_id, list_id FROM (
              |          SELECT v.vec_id, c.list_id,
              |            row_number() OVER (PARTITION BY v.vec_id ORDER BY
              |              list_sum(list_transform(list_zip(v.e, c.ce), t -> (t[1]-t[2])*(t[1]-t[2]))),
              |              c.list_id) AS rn
              |          FROM nrm v, cent c)
              |        WHERE rn = 1),
              |probe AS (SELECT qid, list_id FROM (
              |           SELECT q.vec_id AS qid, c.list_id,
              |             row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |               list_sum(list_transform(list_zip(q.e, c.ce), t -> (t[1]-t[2])*(t[1]-t[2]))),
              |               c.list_id) AS rn
              |           FROM nrm q, cent c WHERE q.vec_id < 10)
              |         WHERE rn <= 4),
              |ap AS (SELECT qid, vid FROM (
              |         SELECT pr.qid, a.vec_id AS vid,
              |           row_number() OVER (PARTITION BY pr.qid ORDER BY
              |             CAST(list_sum(list_transform(list_zip(q.e, v.e), t -> t[1]*t[2])) AS DOUBLE)
              |               / (q.n * v.n) DESC, a.vec_id) AS rnk
              |         FROM probe pr
              |           JOIN asg a ON a.list_id = pr.list_id
              |           JOIN nrm q ON q.vec_id = pr.qid
              |           JOIN nrm v ON v.vec_id = a.vec_id
              |         WHERE v.vec_id != pr.qid)
              |       WHERE rnk <= 5),
              |bp AS (SELECT qid, vid FROM (
              |         SELECT q.vec_id AS qid, v.vec_id AS vid,
              |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |             CAST(list_sum(list_transform(list_zip(q.e, v.e), t -> t[1]*t[2])) AS DOUBLE)
              |               / (q.n * v.n) DESC, v.vec_id) AS rnk
              |         FROM nrm q JOIN nrm v
              |           ON q.vec_id < 10 AND v.vec_id != q.vec_id)
              |       WHERE rnk <= 5),
              |hits AS (SELECT bp.qid, count(*) AS c
              |         FROM bp JOIN ap ON ap.qid = bp.qid AND ap.vid = bp.vid
              |         GROUP BY 1)
              |SELECT u.qid, CAST(coalesce(c, 0) AS BIGINT) AS n_hits,
              |  CAST(5 AS BIGINT) AS k,
              |  CAST(coalesce(c, 0) * 1000000 // least(5, u.ne) AS BIGINT) AS recall_e6
              |FROM (SELECT qid, count(*) AS ne FROM bp GROUP BY 1) u
              |LEFT JOIN hits ON hits.qid = u.qid
              |ORDER BY 1""".stripMargin)),

    // ---- interval-overlap self-join over activity sessions: which
    //      sessions were live at the same time — Joins.overlapJoin's
    //      banded equi-join (1 h bands), never a nested loop; the oracle
    //      is the plain theta-join the banding provably equals ----
    Entry("q117_session_overlap",
      (s, d) => {
        val raw = s.read.parquet(s"$d/events.parquet")
        val base = raw.select(col("user_id"), Tables.tsNs(raw).as("time"))
        val sess = graft.pipeline.Sessionize.sessionize(
            base, "user_id", "time", gapNs = 300000000000L) // 5 min
          .withColumn("en", col("session_end") + 120000000000L) // +120 s pad
        val a = sess.select(col("user_id").as("ua"),
          col("session_start").as("sa"), col("en").as("ea"))
        val b = sess.select(col("user_id").as("ub"),
          col("session_start").as("sb"), col("en").as("eb"))
        Joins.overlapJoin(a, "sa", "ea", b, "sb", "eb",
            band = 3600000000000L, // 1 h
            cond = col("ua") < col("ub") ||
              (col("ua") === col("ub") && col("sa") < col("sb")))
          .select(col("ua"), col("sa"), col("ub"), col("sb"),
            (least(col("ea"), col("eb")) -
              greatest(col("sa"), col("sb"))).as("overlap_ns"))
          .orderBy("ua", "sa", "ub", "sb")
      },
      Some("""WITH ev AS (SELECT user_id, epoch_us(ts)*1000 AS time FROM events),
             |m AS (SELECT *, CASE WHEN coalesce(lag(time) OVER (PARTITION BY user_id ORDER BY time),
             |                -9223372036854775808) < time - 300000000000 THEN 1 ELSE 0 END AS nw
             |      FROM ev),
             |sid AS (SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY time
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
             |        FROM m),
             |iv AS (SELECT user_id, min(time) AS st, max(time) + 120000000000 AS en
             |       FROM sid GROUP BY user_id, s)
             |SELECT a.user_id AS ua, a.st AS sa, b.user_id AS ub, b.st AS sb,
             |  least(a.en, b.en) - greatest(a.st, b.st) AS overlap_ns
             |FROM iv a JOIN iv b
             |  ON a.st <= b.en AND b.st <= a.en
             |  AND (a.user_id < b.user_id
             |       OR (a.user_id = b.user_id AND a.st < b.st))
             |ORDER BY 1, 2, 3, 4""".stripMargin)),

    // ---- crosstab: per-source language mix as a pivoted count grid —
    //      Spark's pivot plans ONE aggregate with a when-chain per pivot
    //      value (no per-language scan); empty cells filled 0 to match
    //      the oracle's FILTER counts ----
    Entry("q118_lang_pivot",
      (s, d) => docs(s, d).groupBy("source")
        .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("de", "en", "es", "fr", "zh"))
        .orderBy("source"),
      Some("""SELECT source,
             |  count(*) FILTER (WHERE lang = 'de') AS de,
             |  count(*) FILTER (WHERE lang = 'en') AS en,
             |  count(*) FILTER (WHERE lang = 'es') AS es,
             |  count(*) FILTER (WHERE lang = 'fr') AS fr,
             |  count(*) FILTER (WHERE lang = 'zh') AS zh
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- grouping sets: the pricing rollup at every granularity in ONE
    //      pass (Spark expands grouping sets map-side; no re-scan per
    //      level) — exact cents, NULL group markers ordered FIRST on
    //      both engines ----
    Entry("q119_pricing_rollup",
      (s, d) => s.read.parquet(s"$d/lineitem.parquet")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          sum(round(col("l_quantity"), 0).cast("long")).as("sum_qty"),
          sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("sum_cents"),
          count(lit(1)).as("cnt"))
        .orderBy(asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
             |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_cents,
             |  count(*) AS cnt
             |FROM lineitem
             |GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin)),

    // ---- canonical-form exact dedup: case/punctuation/whitespace-robust
    //      duplicate groups via the shared Java/RE2 normalization regex;
    //      min-id survivorship ----
    Entry("q120_canon_dedup",
      (s, d) => TextOps.canonDedup(docs(s, d)).orderBy("doc_id"),
      Some("""WITH k AS (SELECT doc_id,
             |  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS ch
             |  FROM documents),
             |g AS (SELECT ch, min(doc_id) AS canon_id, count(*) AS group_size
             |      FROM k GROUP BY 1)
             |SELECT k.doc_id, g.canon_id, CAST(g.group_size AS BIGINT) AS group_size,
             |  (k.doc_id = g.canon_id) AS is_survivor
             |FROM k JOIN g USING (ch) ORDER BY 1""".stripMargin)),

    // ---- per-group outliers by EXACT order statistics: events whose
    //      value exceeds their type's p95, threshold = q54's integer
    //      selection rule over the per-type value histogram — no float
    //      aggregation, histogram-sized exchanges only ----
    Entry("q121_value_outliers",
      (s, d) => {
        val base = s.read.parquet(s"$d/events.parquet")
          .select(col("event_id"), col("event_type"), col("value"))
        Profile.orderStatOutliers(base, Seq("event_type"), "value",
            pNum = 19, pDen = 20)
          .select("event_id", "event_type", "value", "thr")
          .orderBy("event_id")
      },
      Some("""WITH h AS (SELECT event_type, value AS v, count(*) AS c
             |           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
             |cum AS (SELECT event_type, v,
             |          sum(c) OVER (PARTITION BY event_type ORDER BY v
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |          sum(c) OVER (PARTITION BY event_type) AS n
             |        FROM h),
             |thr AS (SELECT event_type, min(v) AS thr FROM cum
             |        WHERE cum * 20 >= n * 19 GROUP BY 1)
             |SELECT e.event_id, e.event_type, e.value, t.thr
             |FROM events e JOIN thr t USING (event_type)
             |WHERE e.value > t.thr ORDER BY e.event_id""".stripMargin)),

    // ---- containment join: near-SUBSET pairs (quote/excerpt detection)
    //      — the asymmetric Jaccard C(A,B) = |A∩B|/|A| at tau 9/10,
    //      exact-integer rule over distinct-token sets ----
    Entry("q122_containment",
      // every 11th doc, tau 24/25: this corpus's docs draw on one shared
      // vocabulary, so distinct-token containment pairs are DENSE (79k
      // pairs at tau 0.9 over all 500 sf0.01 docs; quadratic growth with
      // corpus density) — the q102 right-sizing precedent: demonstrate
      // the exactness, not the biggest join
      (s, d) => Dedup.containmentJoin(
          docs(s, d).where(pmod(col("doc_id"), lit(11)) === 0),
          tauNum = 24L, tauDen = 25L)
        .orderBy("doc_sub", "doc_sup"),
      Some("""WITH f AS (SELECT DISTINCT doc_id, tok FROM
             |  (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |   FROM documents WHERE doc_id % 11 = 0)),
             |na AS (SELECT doc_id, count(*) AS n_sub FROM f GROUP BY 1),
             |it AS (SELECT a.doc_id AS doc_sub, b.doc_id AS doc_sup,
             |         count(*) AS inter
             |       FROM f a JOIN f b ON a.tok = b.tok AND a.doc_id != b.doc_id
             |       GROUP BY 1, 2)
             |SELECT doc_sub, doc_sup, CAST(inter AS BIGINT) AS inter,
             |  CAST(n_sub AS BIGINT) AS n_sub,
             |  CAST(inter * 1000000 // n_sub AS BIGINT) AS cont_e6
             |FROM it JOIN na ON na.doc_id = it.doc_sub
             |WHERE inter * 25 >= n_sub * 24
             |ORDER BY 1, 2""".stripMargin)),

    // ---- readability: Flesch reading-ease in e3 fixed point over the
    //      standard cheap proxies (sentence = [.!?] run, syllable =
    //      vowel-group run) — narrow, shuffle-free, bit-reproducible ----
    Entry("q123_readability",
      (s, d) => TextOps.readability(docs(s, d)).orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS s
             |           FROM documents),
             |v AS (SELECT doc_id,
             |        CAST(len(s) AS BIGINT) AS n_words,
             |        greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS n_sentences,
             |        CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
             |      FROM t)
             |SELECT doc_id, n_words, n_sentences, n_syllables,
             |  CAST(n_words * 1000 // n_sentences AS BIGINT) AS wps_e3,
             |  CAST(n_syllables * 1000 // greatest(1, n_words) AS BIGINT) AS spw_e3,
             |  CAST(206835
             |    - (1015 * (n_words * 1000 // n_sentences)) // 1000
             |    - (84600 * (n_syllables * 1000 // greatest(1, n_words))) // 1000
             |    AS BIGINT) AS flesch_e3
             |FROM v ORDER BY 1""".stripMargin)),

    // ---- dataset-to-dataset similarity: per-source k-MinHash sketches
    //      (the LSH tier's Carter-Wegman family) + the exact Jaccard the
    //      estimate is judged against, one row per source pair ----
    Entry("q124_source_similarity",
      (s, d) => Sketches.setSimilarityMatrix(docs(s, d), "source",
          TextOps.md5Long(col("text")), k = 32)
        .orderBy("key_a", "key_b"),
      Some {
        val coeffs = (0 until 32).map { i =>
          val (a, b) = Dedup.hashCoef(i); s"($i, ${a}, ${b})"
        }.mkString(", ")
        s"""WITH co(i, a, b) AS (VALUES $coeffs),
           |ds AS (SELECT DISTINCT source,
           |         CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS e
           |       FROM documents),
           |hx AS (SELECT source, e, e % 2147483647 AS hx FROM ds),
           |mh AS (SELECT source, i, min((hx * a + b) % 2147483647) AS m
           |       FROM hx, co GROUP BY 1, 2),
           |est AS (SELECT x.source AS key_a, y.source AS key_b,
           |          CAST(sum(CASE WHEN x.m = y.m THEN 1 ELSE 0 END) AS BIGINT) AS est_matches
           |        FROM mh x JOIN mh y ON x.i = y.i AND x.source < y.source
           |        GROUP BY 1, 2),
           |sz AS (SELECT source, count(*) AS n FROM ds GROUP BY 1),
           |it AS (SELECT a.source AS key_a, b.source AS key_b, count(*) AS inter
           |       FROM ds a JOIN ds b ON a.e = b.e AND a.source < b.source
           |       GROUP BY 1, 2)
           |SELECT est.key_a, est.key_b, est_matches, CAST(32 AS BIGINT) AS k,
           |  CAST(est_matches * 1000000 // 32 AS BIGINT) AS est_jaccard_e6,
           |  CAST(coalesce(inter, 0) AS BIGINT) AS inter,
           |  CAST(na.n + nb.n - coalesce(inter, 0) AS BIGINT) AS uni,
           |  CAST(coalesce(inter, 0) * 1000000
           |       // (na.n + nb.n - coalesce(inter, 0)) AS BIGINT) AS jaccard_e6
           |FROM est
           |LEFT JOIN it ON it.key_a = est.key_a AND it.key_b = est.key_b
           |JOIN sz na ON na.source = est.key_a
           |JOIN sz nb ON nb.source = est.key_b
           |ORDER BY 1, 2""".stripMargin
      }),

    // ---- per-doc n-gram novelty: fraction of a doc's distinct shingles
    //      first seen in THIS doc (smallest owning doc_id) — the
    //      crawl-saturation / originality signal ----
    Entry("q125_novelty",
      (s, d) => Dedup.gramNovelty(docs(s, d)).orderBy("doc_id"),
      Some(s"""WITH $shCte,
              |g AS (SELECT doc_id, unnest(st) AS gram FROM sh),
              |fo AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY 1)
              |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
              |  CAST(sum(CASE WHEN fo.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
              |  CAST(sum(CASE WHEN fo.first_doc = g.doc_id THEN 1 ELSE 0 END)
              |       * 1000000 // count(*) AS BIGINT) AS novelty_e6
              |FROM g JOIN fo USING (gram) GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- deterministic epoch shuffle: reproducible training-order
    //      permutation as contiguous positions — range-partitioned sort +
    //      zipWithIndex two-phase offsets, never a row_number() OVER ()
    //      single-reducer window ----
    Entry("q126_epoch_shuffle",
      (s, d) => Sampling.deterministicShuffle(
          docs(s, d).select("doc_id", "n_chars"), "doc_id", salt = "ep1")
        .orderBy("shuffle_pos"),
      Some("""SELECT doc_id, n_chars,
             |  CAST(row_number() OVER (ORDER BY
             |    CAST('0x' || substr(md5('ep1|' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT),
             |    doc_id) - 1 AS BIGINT) AS shuffle_pos
             |FROM documents ORDER BY 3""".stripMargin)),

    // ---- declarative data-quality validation: range/null row checks in
    //      ONE lineitem scan + PK-uniqueness + FK-containment aggregates,
    //      unioned into one report (the dbt-test / expectations pattern;
    //      NULL check verdicts count as failures) ----
    Entry("q127_data_checks",
      (s, d) => {
        val li = s.read.parquet(s"$d/lineitem.parquet")
        val o = s.read.parquet(s"$d/orders.parquet")
        val c = s.read.parquet(s"$d/customer.parquet")
        val rowChecks = Profile.validate(li, Seq(
          "li_discount_range" ->
            (col("l_discount") >= 0.0 && col("l_discount") <= 0.1),
          "li_quantity_range" ->
            (col("l_quantity") >= 1.0 && col("l_quantity") <= 30.0),
          "li_shipdate_not_null" -> col("l_shipdate").isNotNull))
        rowChecks
          .unionByName(Profile.checkUnique(o, "orders_pk_unique",
            Seq("o_orderkey")))
          .unionByName(Profile.checkSubset(o, "o_custkey", c, "c_custkey",
            "orders_custkey_fk"))
          .unionByName(Profile.checkSubset(li, "l_orderkey", o, "o_orderkey",
            "lineitem_orderkey_fk"))
          .orderBy("check_name")
      },
      Some("""WITH r AS (
             |  SELECT 'li_discount_range' AS check_name, count(*) AS n_rows,
             |    sum(CASE WHEN coalesce(l_discount >= 0 AND l_discount <= 0.1, false)
             |        THEN 0 ELSE 1 END) AS n_fail
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'li_quantity_range', count(*),
             |    sum(CASE WHEN coalesce(l_quantity >= 1 AND l_quantity <= 30, false)
             |        THEN 0 ELSE 1 END)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'li_shipdate_not_null', count(*),
             |    sum(CASE WHEN l_shipdate IS NOT NULL THEN 0 ELSE 1 END)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'orders_pk_unique', sum(c),
             |    sum(c) - count(*)
             |  FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
             |  UNION ALL
             |  SELECT 'orders_custkey_fk',
             |    (SELECT count(*) FROM orders),
             |    (SELECT count(*) FROM orders o
             |     LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
             |       ON o.o_custkey = c.c_custkey
             |     WHERE c.c_custkey IS NULL)
             |  UNION ALL
             |  SELECT 'lineitem_orderkey_fk',
             |    (SELECT count(*) FROM lineitem),
             |    (SELECT count(*) FROM lineitem l
             |     LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
             |       ON l.l_orderkey = o.o_orderkey
             |     WHERE o.o_orderkey IS NULL))
             |SELECT check_name, CAST(n_rows AS BIGINT) AS n_rows,
             |  CAST(n_fail AS BIGINT) AS n_fail, n_fail = 0 AS pass
             |FROM r ORDER BY check_name""".stripMargin)),

    // ---- per-dimension embedding statistics: the whitening/encoder-QA
    //      prep — exact BIGINT moments on the quantized grid, one
    //      narrow posexplode + one dim-keyed partial-agg shuffle ----
    Entry("q128_embedding_stats",
      (s, d) => Ann.embeddingStats(emb(s, d)).orderBy("dim"),
      Some("""WITH q AS (
             |  SELECT unnest([{'dim': CAST(i - 1 AS BIGINT),
             |                  'q': CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT)}
             |                 for i in range(1, len(embedding) + 1)]) AS u
             |  FROM embeddings)
             |SELECT u.dim AS dim, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(u.q) AS BIGINT) AS sum_q,
             |  CAST(sum(u.q * u.q) AS BIGINT) AS sumsq_q,
             |  CAST(min(u.q) AS BIGINT) AS min_q,
             |  CAST(max(u.q) AS BIGINT) AS max_q,
             |  CAST((sum(u.q) - (((sum(u.q) % count(*)) + count(*)) % count(*)))
             |       // count(*) AS BIGINT) AS mean_q
             |FROM q GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- dictionary tagging: broadcast-lexicon topic labeling — the
    //      dictionary is a plan LITERAL (narrow K×N explode, no join),
    //      one (doc, tag) partial-agg shuffle ----
    Entry("q129_dict_tags",
      (s, d) => TextOps.dictTag(docs(s, d), dictTagLexicon)
        .orderBy("doc_id", "tag"),
      Some {
        val values = dictTagLexicon
          .map { case (p, t) => s"('$p', '$t')" }.mkString(", ")
        s"""WITH dict(phrase, tag) AS (VALUES $values),
           |h AS (SELECT d.doc_id, dict.tag,
           |        CAST(len(string_split(d.text, dict.phrase)) - 1 AS BIGINT) AS h
           |      FROM documents d, dict)
           |SELECT doc_id, tag, CAST(sum(h) AS BIGINT) AS n_hits
           |FROM h GROUP BY 1, 2 HAVING sum(h) > 0
           |ORDER BY 1, 2""".stripMargin
      }),

    // ---- per-metric OLS trend: exact rational slope on an hourly grid,
    //      midpoint-centered x, one metric-keyed partial-agg shuffle ----
    {
      val step = 3600000000000L // 1 h grid
      val mid = ((E - B) / step) / 2
      Entry("q130_linear_trend",
        (s, d) => Series.linearTrend(ev(s, d), B, E, step).orderBy("metric"),
        Some(s"""WITH $ptsCte,
                |f AS (SELECT metric, ((time - $B) // ${step}) - $mid AS x, cents
                |      FROM pts WHERE time >= $B AND time < $E),
                |a AS (SELECT metric, CAST(count(*) AS BIGINT) AS n,
                |        CAST(sum(x) AS BIGINT) AS sum_x,
                |        CAST(sum(cents) AS BIGINT) AS sum_y,
                |        CAST(sum(x * cents) AS BIGINT) AS sxy,
                |        CAST(sum(x * x) AS BIGINT) AS sxx
                |      FROM f GROUP BY 1)
                |SELECT metric, n, sum_x, sum_y,
                |  CAST(n * sxy - sum_x * sum_y AS BIGINT) AS sxy_num,
                |  CAST(n * sxx - sum_x * sum_x AS BIGINT) AS sxx_num,
                |  CASE WHEN n * sxx - sum_x * sum_x = 0 THEN NULL
                |       ELSE CAST(n * sxy - sum_x * sum_y AS DOUBLE)
                |            / (n * sxx - sum_x * sum_x) END
                |    AS slope_cents_per_step
                |FROM a ORDER BY metric""".stripMargin))
    },

    // ---- positional phrase search: consecutive-token match via a
    //      postings chain join — precision tier over q65's bag-of-words;
    //      postings filtered to phrase terms before any exchange ----
    Entry("q131_phrase_search",
      (s, d) => TextOps.phraseSearch(docs(s, d), Seq("hash", "join"))
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS s
             |           FROM documents),
             |m AS (SELECT doc_id,
             |        len([i for i in range(1, len(s))
             |             if s[i] = 'hash' AND s[i+1] = 'join']) AS n_matches
             |      FROM t)
             |SELECT doc_id, CAST(n_matches AS BIGINT) AS n_matches
             |FROM m WHERE n_matches > 0 ORDER BY doc_id""".stripMargin)),

    // ---- pre-join output-size probe: exact per-key pair counts from
    //      per-key aggregates (the join never runs) — the skew
    //      diagnostic and salt-factor input for q81's salted join ----
    Entry("q132_join_probe",
      (s, d) => {
        val e = s.read.parquet(s"$d/events.parquet")
        Joins.joinSizeProbe(e, e, "user_id", k = 20)
      },
      Some("""WITH l AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_left
             |           FROM events GROUP BY 1),
             |r AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_right
             |      FROM events GROUP BY 1)
             |SELECT user_id, n_left, n_right,
             |  CAST(n_left * n_right AS BIGINT) AS n_pairs
             |FROM l JOIN r USING (user_id)
             |ORDER BY n_pairs DESC, user_id LIMIT 20""".stripMargin)),

    // ---- per-metric autocorrelation at bucket lags: the seasonality
    //      probe — grid-sized self-join, exact integer sums, three
    //      fixed-order IEEE ops ----
    Entry("q133_autocorr",
      (s, d) => Series.autoCorrelation(ev(s, d), B, E,
          step = 6L * 3600000000000L, maxLag = 8)
        .orderBy("metric", "lag"),
      Some(s"""WITH $ptsCte,
              |g AS (SELECT metric, (time - $B) // ${6L * 3600000000000L} AS bucket,
              |        CAST(sum(cents) AS BIGINT) AS s
              |      FROM pts WHERE time >= $B AND time < $E GROUP BY 1, 2),
              |x AS (SELECT g.metric, g.s AS xa, l.lag, g.bucket + l.lag AS jb
              |      FROM g, (SELECT unnest(range(0, 9)) AS lag) l)
              |SELECT x.metric, lag, count(*) AS n_overlap,
              |  CAST(sum(xa * y.s) AS BIGINT) AS num,
              |  CAST(sum(xa * xa) AS BIGINT) AS sx2,
              |  CAST(sum(y.s * y.s) AS BIGINT) AS sy2,
              |  CAST(CAST(sum(xa * y.s) AS BIGINT) AS DOUBLE) /
              |    (sqrt(CAST(CAST(sum(xa * xa) AS BIGINT) AS DOUBLE)) *
              |     sqrt(CAST(CAST(sum(y.s * y.s) AS BIGINT) AS DOUBLE))) AS corr
              |FROM x JOIN g y ON y.metric = x.metric AND y.bucket = x.jb
              |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- percentile-rank normalization: histogram-windowed exact
    //      percent_rank per source, broadcast back — the score
    //      calibration pass before mixing/filtering ----
    Entry("q134_rank_normalize",
      (s, d) => Profile.rankNormalize(
          docs(s, d).select("doc_id", "source", "n_chars"),
          "n_chars", Seq("source"))
        .orderBy("doc_id"),
      Some("""WITH h AS (SELECT source, n_chars AS v, count(*) AS c
             |           FROM documents GROUP BY 1, 2),
             |r AS (SELECT source, v,
             |        sum(c) OVER (PARTITION BY source ORDER BY v) - c AS lt,
             |        sum(c) OVER (PARTITION BY source) AS n
             |      FROM h)
             |SELECT d.doc_id, d.source, d.n_chars,
             |  CAST(CASE WHEN r.n <= 1 THEN 0
             |       ELSE (r.lt * 1000000) // (r.n - 1) END AS BIGINT) AS pct_e6
             |FROM documents d
             |JOIN r ON d.source = r.source AND d.n_chars = r.v
             |ORDER BY d.doc_id""".stripMargin)),

    // ---- depth-wise ranking agreement: the exact RBO core — two
    //      100-deep scorer rankings, co-presence histogram, k-row
    //      cumulative window ----
    Entry("q135_ranking_agreement",
      (s, d) => {
        val base = docs(s, d)
        val k = 100
        def top(ord: Seq[org.apache.spark.sql.Column]) = base
          .orderBy(ord: _*).limit(k)
          .withColumn("rnk", row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy(ord: _*)))
          .select("doc_id", "rnk")
        val a = top(Seq(desc("n_chars"), asc("doc_id")))
        val b = top(Seq(TextOps.md5Long(col("text")).asc, asc("doc_id")))
        Eval.rankingAgreement(a, b, k).orderBy("d")
      },
      Some("""WITH a AS (SELECT doc_id,
             |        CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id)
             |             AS BIGINT) AS ra
             |      FROM documents ORDER BY n_chars DESC, doc_id LIMIT 100),
             |b AS (SELECT doc_id,
             |        CAST(row_number() OVER (ORDER BY
             |          CAST('0x' || substr(md5(text), 1, 15) AS BIGINT), doc_id)
             |             AS BIGINT) AS rb
             |      FROM documents
             |      ORDER BY CAST('0x' || substr(md5(text), 1, 15) AS BIGINT),
             |        doc_id
             |      LIMIT 100),
             |co AS (SELECT greatest(ra, rb) AS d, count(*) AS c
             |       FROM a JOIN b USING (doc_id) GROUP BY 1),
             |ds AS (SELECT unnest(range(1, 101)) AS d)
             |SELECT ds.d,
             |  CAST(sum(coalesce(co.c, 0)) OVER (ORDER BY ds.d) AS BIGINT)
             |    AS n_common,
             |  CAST((sum(coalesce(co.c, 0)) OVER (ORDER BY ds.d) * 1000000)
             |       // ds.d AS BIGINT) AS agree_e6
             |FROM ds LEFT JOIN co USING (d)
             |ORDER BY ds.d""".stripMargin)),

    // ---- functional-dependency audit: one keyed partial-agg per
    //      dependency, report rows in the q127 validation shape ----
    Entry("q136_fd_check",
      (s, d) => {
        val nation = s.read.parquet(s"$d/nation.parquet")
        val e = s.read.parquet(s"$d/events.parquet")
        Profile.checkFunctionalDep(nation, Seq("n_nationkey"),
            "n_regionkey", "nation_region_fd")
          .unionByName(Profile.checkFunctionalDep(e, Seq("user_id"),
            "event_type", "user_event_type_fd"))
          .orderBy("check_name")
      },
      Some("""WITH f1 AS (SELECT count(DISTINCT n_regionkey) AS dc
             |            FROM nation GROUP BY n_nationkey),
             |f2 AS (SELECT count(DISTINCT event_type) AS dc
             |       FROM events GROUP BY user_id),
             |r AS (
             |  SELECT 'nation_region_fd' AS check_name,
             |    count(*) AS n_rows,
             |    sum(CASE WHEN dc > 1 THEN 1 ELSE 0 END) AS n_fail
             |  FROM f1
             |  UNION ALL
             |  SELECT 'user_event_type_fd', count(*),
             |    sum(CASE WHEN dc > 1 THEN 1 ELSE 0 END)
             |  FROM f2)
             |SELECT check_name, CAST(n_rows AS BIGINT) AS n_rows,
             |  CAST(n_fail AS BIGINT) AS n_fail, n_fail = 0 AS pass
             |FROM r ORDER BY check_name""".stripMargin)),

    // ---- hard-negative mining: per-query top-k nearest with a
    //      DIFFERENT label — q19's broadcast shape with the mismatch
    //      predicate inside the join ----
    Entry("q137_hard_negatives",
      (s, d) => {
        val e = emb(s, d)
        Ann.hardNegatives(e.where(col("vec_id") < 3), e, k = 5)
          .orderBy("qid", "rnk")
      },
      Some(s"""WITH $quantCte,
              |lb AS (SELECT vec_id, label FROM embeddings),
              |p AS (SELECT q.vec_id AS qid, ql.label AS q_label,
              |        v.vec_id AS vid, vl.label AS neg_label,
              |        CAST(list_sum(list_transform(list_zip(q.e, v.e), t -> t[1]*t[2])) AS DOUBLE)
              |          / (q.n * v.n) AS cosine
              |      FROM nrm q, lb ql, nrm v, lb vl
              |      WHERE q.vec_id < 3 AND ql.vec_id = q.vec_id
              |        AND vl.vec_id = v.vec_id AND ql.label != vl.label),
              |r AS (SELECT qid, q_label, vid, neg_label, cosine,
              |        CAST(row_number() OVER (PARTITION BY qid
              |          ORDER BY cosine DESC, vid) AS BIGINT) AS rnk
              |      FROM p)
              |SELECT qid, q_label, vid, neg_label, rnk, cosine
              |FROM r WHERE rnk <= 5 ORDER BY 1, 5""".stripMargin)),

    // ---- seasonality-adjusted outliers: hour-of-day floor-mean
    //      baseline (broadcast back), residual percentile threshold per
    //      metric — the 3am-is-not-noon alert fix ----
    Entry("q138_seasonal_outliers",
      (s, d) => Series.seasonalOutliers(ev(s, d)
            .select("metric", "time", "cents"), B, E, pNum = 39, pDen = 40)
        .orderBy("metric", "time"),
      Some(s"""WITH $ptsCte,
              |f AS (SELECT metric, time, cents,
              |        (time // 3600000000000) % 24 AS hour
              |      FROM pts WHERE time >= $B AND time < $E),
              |p AS (SELECT metric, hour, CAST(sum(cents) AS BIGINT) AS s,
              |        count(*) AS n
              |      FROM f GROUP BY 1, 2),
              |pb AS (SELECT metric, hour,
              |         CAST((s - (((s % n) + n) % n)) // n AS BIGINT) AS baseline
              |       FROM p),
              |rs AS (SELECT f.metric, f.time, f.cents, f.hour, pb.baseline,
              |         abs(f.cents - pb.baseline) AS resid
              |       FROM f JOIN pb USING (metric, hour)),
              |h AS (SELECT metric, resid, count(*) AS c FROM rs GROUP BY 1, 2),
              |t AS (SELECT metric, CAST(min(resid) AS BIGINT) AS thr FROM (
              |        SELECT metric, resid,
              |          sum(c) OVER (PARTITION BY metric ORDER BY resid) AS cum,
              |          sum(c) OVER (PARTITION BY metric) AS n
              |        FROM h) WHERE cum * 40 >= n * 39 GROUP BY 1)
              |SELECT rs.metric, rs.time, rs.cents,
              |  CAST(rs.hour AS BIGINT) AS hour, rs.baseline,
              |  CAST(rs.resid AS BIGINT) AS resid, t.thr
              |FROM rs JOIN t USING (metric)
              |WHERE rs.resid > t.thr ORDER BY 1, 2""".stripMargin)),

    // ---- leakage-safe train/test split: the split key is the CONTENT
    //      fingerprint (q23), not the doc id — byte-identical documents
    //      (and their 8-gram winnowing near-twins) can never straddle
    //      the split boundary and leak eval into train ----
    Entry("q139_leak_safe_split",
      (s, d) => Sampling.hashSplit(
          TextOps.minFingerprint(docs(s, d), w = 8), "fingerprint",
          weights = Seq(0.9, 0.1), labels = Seq("train", "test"),
          salt = "lk1")
        .orderBy("doc_id"),
      Some {
        val combine = (0 until 8)
          .map(i => TextOps.rot60Sql(s"hs[i+$i]", (7 * i) % 60))
          .reduce((a, b) => s"xor($a, $b)")
        s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS s FROM documents),
           |h AS (SELECT doc_id, text,
           |        [CAST('0x' || substr(md5(x), 1, 15) AS BIGINT) for x in s] AS hs
           |      FROM t),
           |g AS (SELECT doc_id, text,
           |        CASE WHEN len(hs) >= 8 THEN
           |          [$combine for i in range(1, len(hs) - 6)]
           |        ELSE NULL END AS gs
           |      FROM h),
           |fp AS (SELECT doc_id,
           |         CASE WHEN gs IS NOT NULL THEN list_min(gs)
           |              ELSE CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) END
           |           AS fingerprint
           |       FROM g)
           |SELECT doc_id, fingerprint,
           |  CASE WHEN CAST('0x' ||
           |         substr(md5(CAST(fingerprint AS VARCHAR) || 'lk1'), 1, 15)
           |         AS BIGINT) % 1000000 < 900000
           |       THEN 'train' ELSE 'test' END AS split
           |FROM fp ORDER BY doc_id""".stripMargin
      }),

    // ---- deletion-propagation audit: subject keys broadcast, FK
    //      cascade via impactedKeys, one report row per table — the
    //      pre-delete evidence trail ----
    Entry("q140_deletion_audit",
      (s, d) => {
        val cust = s.read.parquet(s"$d/customer.parquet")
        val ord = s.read.parquet(s"$d/orders.parquet")
        val li = s.read.parquet(s"$d/lineitem.parquet")
        val subjects = cust.where(pmod(col("c_custkey"), lit(97L)) === 0L)
          .select("c_custkey")
        val deadOrders = Cdc.impactedKeys(ord, "o_custkey",
          subjects.withColumnRenamed("c_custkey", "o_custkey"), "o_orderkey")
        Cdc.deletionImpact(cust, "c_custkey", subjects, "customer")
          .unionByName(Cdc.deletionImpact(ord, "o_custkey",
            subjects, "orders"))
          .unionByName(Cdc.deletionImpact(li, "l_orderkey",
            deadOrders, "lineitem"))
          .orderBy("table_name")
      },
      Some("""WITH subj AS (SELECT c_custkey AS k FROM customer
             |              WHERE c_custkey % 97 = 0),
             |dead_o AS (SELECT DISTINCT o_orderkey FROM orders
             |           WHERE o_custkey IN (SELECT k FROM subj)),
             |r AS (
             |  SELECT 'customer' AS table_name, count(*) AS n_rows,
             |    sum(CASE WHEN c_custkey IN (SELECT k FROM subj)
             |        THEN 1 ELSE 0 END) AS n_delete
             |  FROM customer
             |  UNION ALL
             |  SELECT 'orders', count(*),
             |    sum(CASE WHEN o_custkey IN (SELECT k FROM subj)
             |        THEN 1 ELSE 0 END)
             |  FROM orders
             |  UNION ALL
             |  SELECT 'lineitem', count(*),
             |    sum(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM dead_o)
             |        THEN 1 ELSE 0 END)
             |  FROM lineitem)
             |SELECT table_name, CAST(n_rows AS BIGINT) AS n_rows,
             |  CAST(n_delete AS BIGINT) AS n_delete
             |FROM r ORDER BY table_name""".stripMargin)),

    // ---- inter-arrival log2 histogram: scrape-regularity / burst
    //      read — one metric window exchange, ~60-row output per
    //      metric, exact bit-length buckets ----
    Entry("q141_interarrival_hist",
      (s, d) => Series.interArrivalHist(ev(s, d), B, E)
        .orderBy("metric", "bucket"),
      Some(s"""WITH $ptsCte,
              |f AS (SELECT metric, time FROM pts
              |      WHERE time >= $B AND time < $E),
              |g AS (SELECT metric,
              |        time - lag(time) OVER (PARTITION BY metric
              |                               ORDER BY time) AS gap
              |      FROM f)
              |SELECT metric,
              |  CAST(length(printf('%b', gap)) AS BIGINT) AS bucket,
              |  CAST(count(*) AS BIGINT) AS n,
              |  CAST(min(gap) AS BIGINT) AS min_gap,
              |  CAST(max(gap) AS BIGINT) AS max_gap
              |FROM g WHERE gap IS NOT NULL
              |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- temperature-scaled mixture shares: sqrt weights over source
    //      counts, normalizer as an ORDERED cumulative sum (defined
    //      summation order → cross-engine bit parity) ----
    Entry("q142_temperature_mix",
      (s, d) => Sampling.temperatureShares(docs(s, d), "source")
        .orderBy("source"),
      Some("""WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n
             |           FROM documents GROUP BY 1),
             |w AS (SELECT source, n, sqrt(CAST(n AS DOUBLE)) AS w FROM c),
             |x AS (SELECT source, n, w,
             |        sum(w) OVER (ORDER BY source
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |      FROM w),
             |y AS (SELECT source, n, w, max(cum) OVER () AS tot FROM x)
             |SELECT source, n, w,
             |  CAST(floor(w * 1000000 / tot) AS BIGINT) AS share_e6
             |FROM y ORDER BY source""".stripMargin)),

    // ---- cross-source quantile normalization: within-source rank →
    //      pooled inverse CDF at the per-mille grid, all exact
    //      integers; inverse-CDF table broadcast back ----
    Entry("q143_quantile_map",
      (s, d) => Profile.quantileMap(
          docs(s, d).select("doc_id", "source", "n_chars"),
          "n_chars", "source")
        .orderBy("doc_id"),
      Some("""WITH h AS (SELECT source, n_chars AS v, count(*) AS c
             |           FROM documents GROUP BY 1, 2),
             |r AS (SELECT source, v,
             |        sum(c) OVER (PARTITION BY source ORDER BY v) - c AS lt,
             |        sum(c) OVER (PARTITION BY source) AS n
             |      FROM h),
             |pc AS (SELECT d.doc_id, d.source, d.n_chars,
             |         CAST(CASE WHEN r.n <= 1 THEN 0
             |              ELSE (r.lt * 1000000) // (r.n - 1) END AS BIGINT)
             |           AS pct_e6
             |       FROM documents d
             |       JOIN r ON d.source = r.source AND d.n_chars = r.v),
             |ph AS (SELECT n_chars AS v, count(*) AS c
             |       FROM documents GROUP BY 1),
             |pcum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum,
             |           sum(c) OVER () AS n
             |         FROM ph),
             |gr AS (SELECT unnest(range(0, 1001)) AS g),
             |inv AS (SELECT g, CAST(min(v) AS BIGINT) AS mapped
             |        FROM pcum, gr WHERE cum * 1000 >= n * g GROUP BY 1)
             |SELECT pc.doc_id, pc.source, pc.n_chars, pc.pct_e6,
             |  CAST(pc.pct_e6 // 1000 AS BIGINT) AS pct_mille, inv.mapped
             |FROM pc JOIN inv ON inv.g = pc.pct_e6 // 1000
             |ORDER BY pc.doc_id""".stripMargin)),

    // ---- partition-balance forecast: per-partition counts of the
    //      md5-bucket layout BEFORE any write — q132's sibling for
    //      layout (vs join) skew ----
    Entry("q144_partition_balance",
      (s, d) => Joins.partitionBalance(
          s.read.parquet(s"$d/events.parquet"), "user_id", nParts = 32)
        .orderBy("part"),
      Some("""WITH p AS (SELECT CAST('0x' ||
             |          substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT)
             |          % 32 AS part
             |        FROM events),
             |c AS (SELECT part, CAST(count(*) AS BIGINT) AS n_rows
             |      FROM p GROUP BY 1),
             |t AS (SELECT sum(n_rows) AS t FROM c)
             |SELECT part, n_rows,
             |  CAST((n_rows * 32 * 1000000) // t.t AS BIGINT) AS skew_e6
             |FROM c, t ORDER BY part""".stripMargin)),

    // ---- robust (median-based) trend: OLS over per-bucket exact
    //      medians — spike-resistant slope, grid-sized second stage ----
    {
      val step = 3600000000000L
      val mid = ((E - B) / step) / 2
      Entry("q145_robust_trend",
        (s, d) => Series.robustTrend(ev(s, d), B, E, step)
          .orderBy("metric"),
        Some(s"""WITH $ptsCte,
                |f AS (SELECT metric, (time - $B) // ${step} AS bucket, cents
                |      FROM pts WHERE time >= $B AND time < $E),
                |h AS (SELECT metric, bucket, cents, count(*) AS c
                |      FROM f GROUP BY 1, 2, 3),
                |m AS (SELECT metric, bucket, CAST(min(cents) AS BIGINT) AS med
                |      FROM (SELECT metric, bucket, cents,
                |              sum(c) OVER (PARTITION BY metric, bucket
                |                           ORDER BY cents) AS cum,
                |              sum(c) OVER (PARTITION BY metric, bucket) AS n
                |            FROM h)
                |      WHERE cum * 2 >= n GROUP BY 1, 2),
                |x AS (SELECT metric, bucket - $mid AS x, med FROM m),
                |a AS (SELECT metric, CAST(count(*) AS BIGINT) AS nb,
                |        CAST(sum(x) AS BIGINT) AS sx,
                |        CAST(sum(med) AS BIGINT) AS sy,
                |        CAST(sum(x * med) AS BIGINT) AS sxy,
                |        CAST(sum(x * x) AS BIGINT) AS sxx
                |      FROM x GROUP BY 1)
                |SELECT metric, nb AS n_buckets,
                |  CAST(nb * sxy - sx * sy AS BIGINT) AS sxy_num,
                |  CAST(nb * sxx - sx * sx AS BIGINT) AS sxx_num,
                |  CASE WHEN nb * sxx - sx * sx = 0 THEN NULL
                |       ELSE CAST(nb * sxy - sx * sy AS DOUBLE)
                |            / (nb * sxx - sx * sx) END AS slope_cents_per_step
                |FROM a ORDER BY metric""".stripMargin))
    },

    // ---- frequent 3-step event paths: two leads over ONE user-keyed
    //      window exchange, |types|³-bounded groupBy, TakeOrdered cut ----
    Entry("q146_frequent_paths",
      (s, d) => {
        val raw = s.read.parquet(s"$d/events.parquet")
        val f = raw.select(col("event_type").as("metric"),
          Tables.tsNs(raw).as("time"), col("user_id"), col("event_id"))
        graft.pipeline.Sessionize.frequentPaths(f, k = 20)
      },
      Some("""WITH ev AS (SELECT user_id, event_id, event_type,
             |              epoch_us(ts)*1000 AS t FROM events),
             |l AS (SELECT event_type AS e1,
             |        lead(event_type, 1) OVER (PARTITION BY user_id
             |          ORDER BY t, event_id) AS e2,
             |        lead(event_type, 2) OVER (PARTITION BY user_id
             |          ORDER BY t, event_id) AS e3
             |      FROM ev)
             |SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
             |FROM l WHERE e3 IS NOT NULL
             |GROUP BY 1, 2, 3
             |ORDER BY n DESC, e1, e2, e3 LIMIT 20""".stripMargin)),

    // ---- seasonal gap imputation: hourly grid of exact bucket
    //      medians, empty buckets filled from the hour-of-day median —
    //      shape-preserving repair, imputed rows flagged ----
    {
      val step = 3600000000000L
      val nSteps = (E - B + step - 1) / step
      Entry("q147_seasonal_impute",
        (s, d) => Series.seasonalImpute(ev(s, d), B, E, step)
          .orderBy("metric", "time"),
        Some(s"""WITH $ptsCte,
                |f AS (SELECT metric, (time - $B) // ${step} AS bucket,
                |        (time // 3600000000000) % 24 AS hour, cents
                |      FROM pts WHERE time >= $B AND time < $E),
                |h AS (SELECT metric, bucket, cents, count(*) AS c
                |      FROM f GROUP BY 1, 2, 3),
                |bm AS (SELECT metric, bucket, CAST(min(cents) AS BIGINT) AS bmed
                |       FROM (SELECT metric, bucket, cents,
                |               sum(c) OVER (PARTITION BY metric, bucket
                |                            ORDER BY cents) AS cum,
                |               sum(c) OVER (PARTITION BY metric, bucket) AS n
                |             FROM h)
                |       WHERE cum * 2 >= n GROUP BY 1, 2),
                |hh AS (SELECT metric, hour, cents, count(*) AS c
                |       FROM f GROUP BY 1, 2, 3),
                |hm AS (SELECT metric, hour, CAST(min(cents) AS BIGINT) AS hmed
                |       FROM (SELECT metric, hour, cents,
                |               sum(c) OVER (PARTITION BY metric, hour
                |                            ORDER BY cents) AS cum,
                |               sum(c) OVER (PARTITION BY metric, hour) AS n
                |             FROM hh)
                |       WHERE cum * 2 >= n GROUP BY 1, 2),
                |g AS (SELECT m.metric, b.bucket,
                |        $B + b.bucket * ${step} AS time
                |      FROM (SELECT DISTINCT metric FROM pts) m,
                |           (SELECT unnest(range(0, $nSteps)) AS bucket) b)
                |SELECT g.metric, g.time,
                |  coalesce(bm.bmed, hm.hmed) AS value_cents,
                |  (bm.bmed IS NULL AND hm.hmed IS NOT NULL) AS imputed
                |FROM g
                |LEFT JOIN bm ON bm.metric = g.metric AND bm.bucket = g.bucket
                |LEFT JOIN hm ON hm.metric = g.metric
                |  AND hm.hour = (g.time // 3600000000000) % 24
                |ORDER BY 1, 2""".stripMargin))
    },

    // ---- multi-window SLO burn: complete hourly grid, trailing 1h/6h
    //      error shares over GRID rows, page = both windows burning ----
    {
      val hourNs = 3600000000000L
      val nSteps = (E - B + hourNs - 1) / hourNs
      Entry("q148_slo_burn",
        (s, d) => Series.sloBurn(ev(s, d), B, E, errType = "error",
            budgetDen = 4L)
          .orderBy("bucket"),
        Some(s"""WITH $ptsCte,
                |f AS (SELECT (time - $B) // ${hourNs} AS bucket,
                |        count(*) AS t,
                |        sum(CASE WHEN metric = 'error' THEN 1 ELSE 0 END) AS e
                |      FROM pts WHERE time >= $B AND time < $E GROUP BY 1),
                |g AS (SELECT unnest(range(0, $nSteps)) AS bucket),
                |j AS (SELECT g.bucket, coalesce(f.t, 0) AS n_tot,
                |        coalesce(f.e, 0) AS n_err
                |      FROM g LEFT JOIN f USING (bucket)),
                |win AS (SELECT bucket, n_tot, n_err,
                |          sum(n_tot) OVER (ORDER BY bucket
                |            ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_tot_6h,
                |          sum(n_err) OVER (ORDER BY bucket
                |            ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_err_6h
                |        FROM j)
                |SELECT CAST(bucket AS BIGINT) AS bucket,
                |  CAST($B + bucket * ${hourNs} AS BIGINT) AS time,
                |  CAST(n_tot AS BIGINT) AS n_tot, CAST(n_err AS BIGINT) AS n_err,
                |  CAST(CASE WHEN n_tot = 0 THEN NULL
                |       ELSE (n_err * 1000000 * 4) // n_tot END AS BIGINT)
                |    AS burn1_e6,
                |  CAST(n_tot_6h AS BIGINT) AS n_tot_6h,
                |  CAST(n_err_6h AS BIGINT) AS n_err_6h,
                |  CAST(CASE WHEN n_tot_6h = 0 THEN NULL
                |       ELSE (n_err_6h * 1000000 * 4) // n_tot_6h END AS BIGINT)
                |    AS burn6_e6,
                |  CASE WHEN n_tot = 0 OR n_tot_6h = 0 THEN false
                |       ELSE (n_err * 1000000 * 4) // n_tot > 1000000
                |        AND (n_err_6h * 1000000 * 4) // n_tot_6h > 1000000
                |  END AS page
                |FROM win ORDER BY bucket""".stripMargin))
    },

    // ---- heartbeat availability: gap-based outages, uptime ratio in
    //      e6 over the observed span ----
    Entry("q149_uptime",
      (s, d) => Series.uptimeReport(ev(s, d), B, E,
          maxGap = 30L * 60L * 1000000000L)
        .orderBy("metric"),
      Some(s"""WITH $ptsCte,
              |f AS (SELECT metric, time,
              |        time - lag(time) OVER (PARTITION BY metric
              |                               ORDER BY time) AS gap
              |      FROM pts WHERE time >= $B AND time < $E),
              |a AS (SELECT metric,
              |        CAST(max(time) - min(time) AS BIGINT) AS span_ns,
              |        CAST(sum(CASE WHEN gap > ${30L * 60L * 1000000000L}
              |                 THEN gap ELSE 0 END) AS BIGINT) AS downtime_ns,
              |        CAST(sum(CASE WHEN gap > ${30L * 60L * 1000000000L}
              |                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outages,
              |        CAST(max(gap) AS BIGINT) AS max_gap_ns
              |      FROM f GROUP BY 1)
              |SELECT metric, span_ns, downtime_ns, n_outages, max_gap_ns,
              |  CAST(CASE WHEN span_ns // 1000000 = 0 THEN NULL
              |       ELSE (((span_ns - downtime_ns) // 1000000) * 1000000)
              |            // (span_ns // 1000000) END
              |       AS BIGINT) AS uptime_e6
              |FROM a ORDER BY metric""".stripMargin)),

    // ---- categorical mix drift: per-day L1 distance to the global
    //      event-type distribution, exact via the common-denominator
    //      rational — the data-drift monitor ----
    Entry("q150_mix_drift",
      (s, d) => Profile.mixDrift(ev(s, d).select("metric", "time"),
          "metric", "time")
        .orderBy("day"),
      Some(s"""WITH $ptsCte,
              |dt AS (SELECT time // 86400000000000 AS day, metric AS t,
              |         count(*) AS ndt
              |       FROM pts GROUP BY 1, 2),
              |dd AS (SELECT day, sum(ndt) AS nd FROM dt GROUP BY 1),
              |ty AS (SELECT t, sum(ndt) AS nt FROM dt GROUP BY 1),
              |nn AS (SELECT sum(ndt) AS n FROM dt),
              |g AS (SELECT dd.day, ty.t, dd.nd, ty.nt, nn.n,
              |        coalesce(dt.ndt, 0) AS c
              |      FROM dd CROSS JOIN ty CROSS JOIN nn
              |      LEFT JOIN dt ON dt.day = dd.day AND dt.t = ty.t),
              |dev AS (SELECT day, t, nd, n,
              |          abs(c * n - nt * nd) AS dev
              |        FROM g),
              |r AS (SELECT day, t, nd, n, dev,
              |        row_number() OVER (PARTITION BY day
              |          ORDER BY dev DESC, t DESC) AS rn
              |      FROM dev),
              |agg AS (SELECT day, CAST(min(nd) AS BIGINT) AS n_day,
              |          CAST((sum(dev) * 1000000) // (min(nd) * min(n))
              |               AS BIGINT) AS l1_e6
              |        FROM dev GROUP BY 1)
              |SELECT CAST(agg.day AS BIGINT) AS day, agg.n_day, agg.l1_e6,
              |  r.t AS top_type,
              |  CAST((r.dev * 1000000) // (r.nd * r.n) AS BIGINT)
              |    AS top_dev_e6
              |FROM agg JOIN r ON r.day = agg.day AND r.rn = 1
              |ORDER BY agg.day""".stripMargin)),

    // ---- Theil–Sen slope over bucket medians: exact lower median of
    //      e6-quantized pairwise slopes — grid² over MEDIANS only ----
    {
      val step = 3600000000000L
      Entry("q151_theilsen_trend",
        (s, d) => Series.theilSenTrend(ev(s, d), B, E, step)
          .orderBy("metric"),
        Some(s"""WITH $ptsCte,
                |f AS (SELECT metric, (time - $B) // ${step} AS bucket, cents
                |      FROM pts WHERE time >= $B AND time < $E),
                |h AS (SELECT metric, bucket, cents, count(*) AS c
                |      FROM f GROUP BY 1, 2, 3),
                |m AS (SELECT metric, bucket, CAST(min(cents) AS BIGINT) AS med
                |      FROM (SELECT metric, bucket, cents,
                |              sum(c) OVER (PARTITION BY metric, bucket
                |                           ORDER BY cents) AS cum,
                |              sum(c) OVER (PARTITION BY metric, bucket) AS n
                |            FROM h)
                |      WHERE cum * 2 >= n GROUP BY 1, 2),
                |p AS (SELECT a.metric,
                |        ((b.med - a.med) * 1000000
                |         - ((((b.med - a.med) * 1000000) % (b.bucket - a.bucket))
                |            + (b.bucket - a.bucket)) % (b.bucket - a.bucket))
                |        // (b.bucket - a.bucket) AS s
                |      FROM m a JOIN m b
                |        ON a.metric = b.metric AND a.bucket < b.bucket),
                |sel AS (SELECT metric, s, count(*) AS c FROM p GROUP BY 1, 2),
                |w AS (SELECT metric, s,
                |        sum(c) OVER (PARTITION BY metric ORDER BY s) AS cum,
                |        sum(c) OVER (PARTITION BY metric) AS n
                |      FROM sel),
                |sl AS (SELECT metric, CAST(min(s) AS BIGINT) AS slope_e6_per_step,
                |         CAST(min(n) AS BIGINT) AS n_pairs
                |       FROM w WHERE cum * 2 >= n GROUP BY 1),
                |nb AS (SELECT metric, CAST(count(*) AS BIGINT) AS n_buckets
                |       FROM m GROUP BY 1)
                |SELECT nb.metric, nb.n_buckets, sl.n_pairs,
                |  sl.slope_e6_per_step
                |FROM nb JOIN sl USING (metric) ORDER BY metric""".stripMargin))
    },

    // ---- keyword-in-context concordance: q131's matches with ±3
    //      tokens of context, edge-clamped slices ----
    Entry("q152_concordance",
      (s, d) => TextOps.concordance(docs(s, d), Seq("hash", "join"),
          context = 3)
        .orderBy("doc_id", "pos"),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS s
             |           FROM documents),
             |mm AS (SELECT doc_id,
             |         unnest([i for i in range(1, len(s))
             |                 if s[i] = 'hash' AND s[i+1] = 'join']) AS p
             |       FROM t)
             |SELECT mm.doc_id, CAST(mm.p - 1 AS BIGINT) AS pos,
             |  array_to_string(
             |    t.s[greatest(1, mm.p - 3):least(len(t.s), mm.p + 4)], ' ')
             |    AS snippet
             |FROM mm JOIN t USING (doc_id)
             |ORDER BY 1, 2""".stripMargin)),

    // ---- curation-partitioned layout probe: lang=/len_bin= partition
    //      pruning answers the "English, longest quartile" read from
    //      two partitions — the q43 index discipline for curation ----
    Entry("q153_curation_layout",
      (s, d) => Curate.openCurationLayout(s, curationLayoutFor(s, d))
        .where(col("lang") === "en" && col("len_bin") === 3)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"))
        .orderBy("source"),
      Some("""WITH h AS (SELECT n_chars AS v, count(*) AS c
             |           FROM documents GROUP BY 1),
             |cw AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum,
             |              sum(c) OVER () AS n
             |       FROM h),
             |b AS (SELECT j, min(v) AS bv
             |      FROM cw, range(1, 4) t(j)
             |      WHERE cum * 4 >= n * j GROUP BY 1),
             |bins AS (SELECT d.doc_id, d.source, d.lang, d.n_chars,
             |           sum(CASE WHEN d.n_chars > b.bv THEN 1 ELSE 0 END)
             |             AS len_bin
             |         FROM documents d CROSS JOIN b GROUP BY 1, 2, 3, 4)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM bins WHERE lang = 'en' AND len_bin = 3
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- retention round-trip: dump() of a store retired at an
    //      aligned horizon — raw retention is whole-partition deletion;
    //      level-row preservation is pinned in RetentionSpec ----
    Entry("q154_retire_dump",
      (s, d) => graft.tools.Tools.dump(retiredFor(s, d))
        .orderBy("metric"),
      Some(s"""WITH $wptsCte
              |SELECT metric, CAST(count(*) AS BIGINT) AS n_rows,
              |  CAST(min(time) AS BIGINT) AS first_time,
              |  CAST(max(time) AS BIGINT) AS last_time
              |FROM wpts WHERE time >= $RetireHu
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- perceptual image near-dup pairs: 8-block banded aHash
    //      candidates (recall-1 to distance 7) + popcount verify; the
    //      oracle brute-forces all pairs over the closed-form hashes ----
    Entry("q155_image_neardup",
      (s, _) => Multimodal.imageNearDupPairs(
          Multimodal.syntheticMedia(s, 300), maxDist = 6)
        .orderBy("media_a", "media_b"),
      Some(s"""WITH $imageHashCte
              |SELECT a.media_id AS media_a, b.media_id AS media_b,
              |  CAST(bit_count(xor(a.ahash_hi, b.ahash_hi))
              |       + bit_count(xor(a.ahash_lo, b.ahash_lo)) AS BIGINT)
              |    AS hamming
              |FROM h a JOIN h b ON a.media_id < b.media_id
              |WHERE bit_count(xor(a.ahash_hi, b.ahash_hi))
              |      + bit_count(xor(a.ahash_lo, b.ahash_lo)) <= 6
              |ORDER BY 1, 2""".stripMargin)),

    // ---- lead-lag detection: per pair, the lag maximizing |corr| on
    //      q88's grid — the argmax reads the bit-reproducible IEEE
    //      corr, tie to the smaller lag ----
    Entry("q156_best_lag",
      (s, d) => Series.bestLag(ev(s, d), B, E,
          step = 6L * 3600000000000L, maxLag = 3)
        .orderBy("metric_a", "metric_b"),
      Some(s"""WITH $ptsCte,
              |g AS (SELECT metric, (time - $B) // ${6L * 3600000000000L} AS bucket,
              |        CAST(sum(cents) AS BIGINT) AS s
              |      FROM pts WHERE time >= $B AND time < $E GROUP BY 1, 2),
              |x AS (SELECT g.metric AS metric_a, g.s AS xa, l.lag,
              |        g.bucket + l.lag AS jb
              |      FROM g, (SELECT unnest(range(-3, 4)) AS lag) l),
              |y AS (SELECT metric AS metric_b, bucket AS jb, s AS xb FROM g),
              |cc AS (SELECT metric_a, metric_b, lag, count(*) AS n_overlap,
              |         CAST(CAST(sum(xa*xb) AS BIGINT) AS DOUBLE) /
              |           (sqrt(CAST(CAST(sum(xa*xa) AS BIGINT) AS DOUBLE)) *
              |            sqrt(CAST(CAST(sum(xb*xb) AS BIGINT) AS DOUBLE))) AS corr
              |       FROM x JOIN y USING (jb)
              |       WHERE metric_a < metric_b
              |       GROUP BY 1, 2, 3),
              |r AS (SELECT metric_a, metric_b, lag, n_overlap, corr,
              |        row_number() OVER (PARTITION BY metric_a, metric_b
              |          ORDER BY abs(corr) DESC, lag ASC) AS rn
              |      FROM cc WHERE n_overlap >= 2)
              |SELECT metric_a, metric_b, CAST(lag AS BIGINT) AS best_lag,
              |  n_overlap, corr
              |FROM r WHERE rn = 1 ORDER BY 1, 2""".stripMargin)),

    // ---- REAL mp4 decode through the FallbackDecoder seam: every row is
    //      a QuickTime-`raw `-codec mp4 whose sample table Mp4Decoder
    //      demuxes (stsd/stsz/stsc/stco) and rasterizes pixel-exact; the
    //      oracle recomputes the pooled luminance histogram in closed
    //      form from the frame pattern (q36's discipline — a hash match
    //      proves the container parse AND the frame decode bit-exact
    //      end-to-end, not a stub) ----
    Entry("q157_mp4_decode",
      (s, _) => {
        val media = Multimodal.syntheticMp4(s, 200)
        Multimodal.extractFeatures(media, dim = 16,
            fallback = Multimodal.mp4Decoder)
          .withColumn("feat_norm",
            sqrt(aggregate(transform(col("features"), x => x.cast("double") * x),
              lit(0.0), (acc, x) => acc + x)))
          .select(col("media_id"), col("kind"), round(col("feat_norm"), 6).as("feat_norm"))
          .orderBy("media_id")
      },
      Some {
        // frame f pixel (x,y) is gray v=(id+x+3y+7f)%256 over 8 16×12
        // frames; lum of (v,v,v) is exactly v, so the pooled histogram is
        // count/(16·12·8) per 16-wide bin. feat_norm folds f0²..f15²
        // left-to-right in double, matching Spark's aggregate() order.
        val fsel = (0 until 16).map(j => s"max(CASE WHEN bin = $j THEN v END) AS f$j").mkString(", ")
        val sq = (0 until 16).map(j => s"CAST(f$j AS DOUBLE) * f$j").mkString(" + ")
        s"""WITH ids AS (SELECT media_id FROM range(0, 200) t(media_id)),
           |bins AS (SELECT bin FROM range(0, 16) t(bin)),
           |vidv AS (
           |  SELECT media_id, bin,
           |         CAST(CAST(count(*) AS REAL) / CAST(1536 AS REAL) AS REAL) AS v
           |  FROM (
           |    SELECT i.media_id,
           |           (((i.media_id + x.x + 3 * y.y + 7 * f.f) % 256) * 16) // 256 AS bin
           |    FROM ids i, range(0, 16) x(x), range(0, 12) y(y), range(0, 8) f(f))
           |  GROUP BY 1, 2),
           |fv AS (
           |  SELECT g.media_id, g.bin, coalesce(a.v, CAST(0 AS REAL)) AS v
           |  FROM (SELECT i.media_id, b.bin FROM ids i, bins b) g
           |  LEFT JOIN vidv a ON g.media_id = a.media_id AND g.bin = a.bin),
           |fm AS (SELECT media_id, $fsel FROM fv GROUP BY media_id)
           |SELECT media_id, 'video' AS kind, round(sqrt($sq), 6) AS feat_norm
           |FROM fm ORDER BY media_id""".stripMargin
      }),

    // ---- linear token classifier (fastText-style quality/source gate):
    //      ppm-rate difference weights from the train fold, sign-gated
    //      test predictions, 2×2 confusion output. All-integer (floor-div
    //      rates), so the SQL replay is bit-exact. ----
    Entry("q158_token_classifier",
      (s, d) => TextOps.tokenClassifier(docs(s, d), "lang", "en", "de")
        .orderBy("true_class", "pred_class"),
      Some("""WITH two AS (SELECT doc_id, lang AS cls, text
             |             FROM documents WHERE lang IN ('en', 'de')),
             |tok AS (SELECT cls, unnest(string_split(text, ' ')) AS term
             |        FROM two WHERE doc_id % 5 <> 0),
             |cnt AS (SELECT term,
             |          count(*) FILTER (cls = 'en') AS ca,
             |          count(*) FILTER (cls = 'de') AS cb
             |        FROM tok GROUP BY 1),
             |tot AS (SELECT count(*) FILTER (cls = 'en') AS na,
             |               count(*) FILTER (cls = 'de') AS nb FROM tok),
             |w AS (SELECT term,
             |        (ca * 1000000) // na - (cb * 1000000) // nb AS w
             |      FROM cnt, tot),
             |sc AS (SELECT t.doc_id, t.cls,
             |         CAST(coalesce(sum(w.w), 0) AS BIGINT) AS score
             |       FROM (SELECT doc_id, cls,
             |               unnest(string_split(text, ' ')) AS term
             |             FROM two WHERE doc_id % 5 = 0) t
             |       LEFT JOIN w ON t.term = w.term
             |       GROUP BY 1, 2),
             |pr AS (SELECT cls AS true_class,
             |         CASE WHEN score >= 0 THEN 'en' ELSE 'de' END AS pred_class,
             |         score FROM sc)
             |SELECT true_class, pred_class, count(*) AS n_docs,
             |  CAST(sum(score) AS BIGINT) AS sum_score
             |FROM pr GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- stratified sample, EXACT largest-remainder allocation: 100
    //      docs apportioned over langs, picks = smallest hash buckets
    //      per stratum. Driver-side allocation over the strata-sized
    //      counts frame (routing-table discipline), window SQL replay. ----
    Entry("q159_stratified_alloc",
      (s, d) => Sampling.stratifiedAlloc(docs(s, d), "lang", "doc_id", n = 100L)
        .orderBy("lang", "rnk"),
      Some("""WITH c AS (SELECT lang, count(*) AS c FROM documents GROUP BY 1),
             |t AS (SELECT CAST(sum(c) AS BIGINT) AS N FROM c),
             |b AS (SELECT lang, c, (100 * c) // N AS base, (100 * c) % N AS rem
             |      FROM c, t),
             |r AS (SELECT lang, base,
             |        row_number() OVER (ORDER BY rem DESC, lang) AS rr FROM b),
             |e AS (SELECT 100 - CAST(sum(base) AS BIGINT) AS extra FROM b),
             |q AS (SELECT lang,
             |        base + CASE WHEN rr <= extra THEN 1 ELSE 0 END AS quota
             |      FROM r, e),
             |p AS (SELECT lang, doc_id,
             |        row_number() OVER (PARTITION BY lang ORDER BY
             |          CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
             |            AS BIGINT) % 1000000, doc_id) AS rnk
             |      FROM documents)
             |SELECT p.lang, p.doc_id, CAST(p.rnk AS BIGINT) AS rnk
             |FROM p JOIN q ON p.lang = q.lang
             |WHERE p.rnk <= q.quota
             |ORDER BY p.lang, p.rnk""".stripMargin)),

    // ---- embedding-space decontamination: exact epsilon-ball R-S join
    //      (eval fold = vec_id % 10 == 0) with integer triangle-inequality
    //      IVF pruning; flagged train vectors only. Brute-force replay on
    //      the quantized grid — recall-1 is part of what's checked. ----
    Entry("q160_semantic_decontaminate",
      (s, d) => {
        val e = emb(s, d)
        Ann.epsilonJoin(
            e.where(pmod(col("vec_id"), lit(10L)) =!= 0L),
            e.where(pmod(col("vec_id"), lit(10L)) === 0L),
            d2max = 120000000L, nlist = 8)
          .orderBy("vec_id")
      },
      Some("""WITH e AS (SELECT vec_id,
             |    list_transform(embedding,
             |      x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS v
             |  FROM embeddings),
             |p AS (SELECT vec_id, v FROM e WHERE vec_id % 10 = 0),
             |c AS (SELECT vec_id, v FROM e WHERE vec_id % 10 <> 0),
             |d AS (SELECT c.vec_id AS vec_id,
             |        CAST(list_sum([(c.v[i] - p.v[i]) * (c.v[i] - p.v[i])
             |                       for i in range(1, len(c.v) + 1)])
             |          AS BIGINT) AS d2
             |      FROM c, p)
             |SELECT vec_id, count(*) AS n_hits, min(d2) AS min_d2
             |FROM d WHERE d2 <= 120000000
             |GROUP BY 1 ORDER BY vec_id""".stripMargin)),

    // ---- full positional winnowing (Schleimer et al. SIGMOD'03): the
    //      MOSS fingerprint SET — per-window minima over w=4 windows of
    //      8-gram hashes, guaranteed density. Selection depends on hash
    //      ORDER, so the oracle recomputes the identical 60-bit md5/rot60
    //      gram hashes (q23's rendering) and replays the same lag/lead
    //      run-length rule. ----
    Entry("q161_winnow",
      (s, d) => TextOps.winnowFingerprints(docs(s, d), n = 8, w = 4)
        .orderBy("doc_id", "pos"),
      Some(s"""WITH $winnowFpCtes
              |SELECT doc_id, pos, fp
              |FROM (SELECT * FROM sel UNION ALL SELECT * FROM sh)
              |ORDER BY doc_id, pos""".stripMargin)),

    // ---- DSIR-style data selection (Xie et al. NeurIPS'23 shape):
    //      hashed-bigram ppm-rate weights (target='de' vs the raw rest),
    //      per-doc occurrence-weighted scores, deterministic top-50 cut.
    //      All-integer (floor-div rates, nonneg operands → // == div),
    //      so the SQL replay is bit-exact. ----
    Entry("q162_dsir_select",
      (s, d) => {
        val dd = docs(s, d)
        Sampling.dsirSelect(dd.where(col("lang") =!= "de"),
            dd.where(col("lang") === "de"), n = 50)
          .orderBy(col("score").desc, col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS s
             |           FROM documents),
             |bg AS (SELECT doc_id, lang,
             |         unnest([s[i] || ' ' || s[i+1] for i in range(1, len(s))]) AS b
             |       FROM d),
             |bk AS (SELECT doc_id, lang,
             |         CAST('0x' || substr(md5(b), 1, 15) AS BIGINT) % 4096 AS bkt
             |       FROM bg),
             |tc AS (SELECT bkt, count(*) AS ct FROM bk WHERE lang = 'de' GROUP BY 1),
             |rc AS (SELECT bkt, count(*) AS cr FROM bk WHERE lang <> 'de' GROUP BY 1),
             |tn AS (SELECT CAST(sum(ct) AS BIGINT) AS nt FROM tc),
             |rn AS (SELECT CAST(sum(cr) AS BIGINT) AS nr FROM rc),
             |w AS (SELECT coalesce(tc.bkt, rc.bkt) AS bkt,
             |        (coalesce(ct, 0) * 1000000) // nt
             |          - (coalesce(cr, 0) * 1000000) // nr AS w
             |      FROM tc FULL OUTER JOIN rc ON tc.bkt = rc.bkt, tn, rn),
             |sc AS (SELECT bk.doc_id, CAST(sum(w.w) AS BIGINT) AS score,
             |         count(*) AS n_grams
             |       FROM bk JOIN w ON bk.bkt = w.bkt
             |       WHERE bk.lang <> 'de' GROUP BY 1),
             |pool AS (SELECT doc_id FROM documents WHERE lang <> 'de')
             |SELECT p.doc_id, coalesce(sc.score, 0) AS score,
             |  CAST(coalesce(sc.n_grams, 0) AS BIGINT) AS n_grams
             |FROM pool p LEFT JOIN sc ON p.doc_id = sc.doc_id
             |ORDER BY score DESC, p.doc_id LIMIT 50""".stripMargin)),

    // ---- multi-benchmark decontamination: per-(doc, suite) overlap
    //      attribution in ONE corpus pass (two synthetic suites from
    //      doc_id residues; a doc divisible by both lands in both).
    //      Spark marks 60-bit gram hashes, the oracle textual grams —
    //      q15's injectivity argument ----
    Entry("q163_decontaminate_multi",
      (s, d) => {
        val all = docs(s, d)
        val bench = all.where(pmod(col("doc_id"), lit(13)) === 0)
          .withColumn("suite", lit("sA"))
          .unionByName(all.where(pmod(col("doc_id"), lit(17)) === 0)
            .withColumn("suite", lit("sB")))
        Dedup.decontaminateMulti(
            all.where(pmod(col("doc_id"), lit(13)) =!= 0 &&
              pmod(col("doc_id"), lit(17)) =!= 0),
            bench, n = 8)
          .orderBy("doc_id", "suite")
      },
      Some("""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS s FROM documents),
             |g8 AS (SELECT doc_id, CASE WHEN len(s) >= 8
             |         THEN list_distinct([s[i]||' '||s[i+1]||' '||s[i+2]||' '||s[i+3]||' '||s[i+4]||' '||s[i+5]||' '||s[i+6]||' '||s[i+7]
             |                             for i in range(1, len(s)-6)])
             |         ELSE [text] END AS st
             |       FROM d),
             |bench AS (SELECT DISTINCT 'sA' AS suite, unnest(st) AS g
             |          FROM g8 WHERE doc_id % 13 = 0
             |          UNION
             |          SELECT DISTINCT 'sB' AS suite, unnest(st) AS g
             |          FROM g8 WHERE doc_id % 17 = 0),
             |corp AS (SELECT doc_id, st FROM g8
             |         WHERE doc_id % 13 != 0 AND doc_id % 17 != 0),
             |cg AS (SELECT doc_id, unnest(st) AS g FROM corp),
             |hits AS (SELECT doc_id, suite, CAST(count(*) AS BIGINT) AS n_overlap
             |         FROM cg JOIN bench USING (g) GROUP BY 1, 2)
             |SELECT h.doc_id, h.suite, CAST(len(c.st) AS BIGINT) AS n_grams,
             |  h.n_overlap,
             |  CAST(h.n_overlap AS DOUBLE) / len(c.st) AS contam_frac
             |FROM hits h JOIN corp c USING (doc_id)
             |ORDER BY doc_id, suite""".stripMargin)),

    // ---- balanced training-shard assignment: contiguous blocks of the
    //      deterministic shuffle order, sizes exactly ⌊N/7⌋/⌈N/7⌉ by the
    //      floor-division staircase; window SQL replay (all operands
    //      nonneg → // == div) ----
    Entry("q164_shard_assign",
      (s, d) => Sampling.shardAssign(docs(s, d).select("doc_id"), "doc_id",
          nShards = 7, salt = "ep1")
        .orderBy("shuffle_pos"),
      Some("""WITH p AS (SELECT doc_id,
             |    CAST(row_number() OVER (ORDER BY
             |      CAST('0x' || substr(md5('ep1|' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT),
             |      doc_id) - 1 AS BIGINT) AS shuffle_pos
             |  FROM documents),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM p)
             |SELECT doc_id, shuffle_pos,
             |  (shuffle_pos * 7) // n AS shard_id,
             |  shuffle_pos - (((shuffle_pos * 7) // n) * n + 6) // 7 AS pos_in_shard
             |FROM p, t ORDER BY shuffle_pos""".stripMargin)),

    // ---- TPC-H Q22 shape: customers above their segment's positive-
    //      balance average (scalar-subquery-as-broadcast-join, exact by
    //      integer cross-multiply — no avg division) with NO urgent
    //      orders (anti join; the priority filter pushes into the scan
    //      before the anti join builds). The semi/anti relational
    //      surface. ----
    Entry("q165_antijoin_balance",
      (s, d) => {
        val c = s.read.parquet(s"$d/customer.parquet")
          .withColumn("bal_cents",
            round(col("c_acctbal") * 100, 0).cast("long"))
        val o = s.read.parquet(s"$d/orders.parquet")
        val seg = c.where(col("bal_cents") > 0L)
          .groupBy("c_mktsegment")
          .agg(sum("bal_cents").as("_s"), count(lit(1)).as("_n"))
        c.join(broadcast(seg), Seq("c_mktsegment"))
          .where(col("bal_cents") * col("_n") > col("_s"))
          .join(o.where(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_cust"),
            sum("bal_cents").as("sum_bal_cents"))
          .orderBy("c_mktsegment")
      },
      Some("""WITH c AS (SELECT c_custkey, c_mktsegment,
             |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
             |  FROM customer),
             |seg AS (SELECT c_mktsegment, CAST(sum(bal_cents) AS BIGINT) AS s,
             |          CAST(count(*) AS BIGINT) AS n
             |        FROM c WHERE bal_cents > 0 GROUP BY 1)
             |SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust,
             |  CAST(sum(bal_cents) AS BIGINT) AS sum_bal_cents
             |FROM c JOIN seg ON c.c_mktsegment = seg.c_mktsegment
             |WHERE bal_cents * n > s
             |  AND NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey
             |                    AND o.o_orderpriority = '1-URGENT')
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- MOSS-style overlap report over the q161 fingerprints: pairs
    //      sharing winnow picks, exact-integer containment. maxDf=1000
    //      is a no-op on testdata (max fp df is 4), so the exact SQL
    //      replay is the oracle; the cap behavior is spec-pinned ----
    Entry("q166_winnow_overlap",
      (s, d) => Dedup.winnowOverlapPairs(docs(s, d), n = 8, w = 4,
          minShared = 1L)
        .orderBy("doc_a", "doc_b"),
      Some(s"""WITH $winnowFpCtes,
              |f AS (SELECT DISTINCT doc_id, fp FROM
              |        (SELECT doc_id, fp FROM sel
              |         UNION ALL SELECT doc_id, fp FROM sh)),
              |nf AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nf
              |       FROM f GROUP BY 1),
              |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |         CAST(count(*) AS BIGINT) AS n_shared
              |       FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
              |       GROUP BY 1, 2)
              |SELECT doc_a, doc_b, n_shared, na.nf AS n_a, nb.nf AS n_b,
              |  (n_shared * 1000000) // least(na.nf, nb.nf) AS overlap_e6
              |FROM pr JOIN nf na ON doc_a = na.doc_id
              |        JOIN nf nb ON doc_b = nb.doc_id
              |ORDER BY doc_a, doc_b""".stripMargin)),

    // ---- vocabulary coverage curve (tokenizer-size sweep): occurrence
    //      coverage of the top-k vocabulary at literal k grid; rank/cum
    //      windows over the vocab-sized frame only ----
    Entry("q167_vocab_coverage",
      (s, d) => TextOps.vocabCoverage(docs(s, d),
          ks = Seq(10, 100, 1000, 10000))
        .orderBy("k"),
      Some("""WITH c AS (SELECT unnest(string_split(text, ' ')) AS token
             |           FROM documents),
             |ct AS (SELECT token, CAST(count(*) AS BIGINT) AS tf
             |       FROM c GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS v,
             |               CAST(sum(tf) AS BIGINT) AS n FROM ct),
             |r AS (SELECT tf,
             |        row_number() OVER (ORDER BY tf DESC, token) AS rnk,
             |        sum(tf) OVER (ORDER BY tf DESC, token
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |      FROM ct),
             |ks AS (SELECT unnest([10, 100, 1000, 10000]) AS k)
             |SELECT CAST(k AS BIGINT) AS k, v AS n_types,
             |  CAST(cum AS BIGINT) AS covered, n AS n_occurrences,
             |  (CAST(cum AS BIGINT) * 1000000) // n AS coverage_e6
             |FROM ks, tot, r WHERE r.rnk = least(k, v)
             |ORDER BY k""".stripMargin)),

    // ---- deterministic interleaved mixture schedule: en:de:fr = 4:2:1
    //      (es/zh unweighted → dropped); per-source hash-shuffle rank,
    //      ord = pos·1e6 div w. Window SQL replay with the q126 md5
    //      arithmetic ----
    Entry("q168_mixture_schedule",
      (s, d) => Sampling.mixtureSchedule(docs(s, d), "lang", "doc_id",
          weights = Seq("en" -> 4L, "de" -> 2L, "fr" -> 1L), salt = "ep1")
        .orderBy("ord", "lang", "pos_in_source"),
      Some("""WITH w AS (SELECT * FROM (VALUES ('en', 4), ('de', 2),
             |                                 ('fr', 1)) AS t(lang, w)),
             |p AS (SELECT d.lang, d.doc_id, w.w,
             |        CAST(row_number() OVER (PARTITION BY d.lang ORDER BY
             |          CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || 'ep1'), 1, 15) AS BIGINT) % 1000000,
             |          d.doc_id) - 1 AS BIGINT) AS pos_in_source
             |      FROM documents d JOIN w ON d.lang = w.lang)
             |SELECT lang, doc_id, pos_in_source,
             |  (pos_in_source * 1000000) // w AS ord
             |FROM p ORDER BY ord, lang, pos_in_source""".stripMargin)),

    // ---- RAG-ingestion capstone: chunk → hash-vectorize → seeded IVF →
    //      probe top-5 (chunk retrieval end-to-end through the verified
    //      ANN tier; composition — the parts own the specs: q107 chunking,
    //      q66 vectorize, q43/q114 IVF). Assignment/probe argmins run on
    //      raw counts in SQL (the ×1e8 quantization scale is ordering-
    //      invariant); cosine mirrors the quantized-int path exactly ----
    Entry("q169_rag_probe",
      (s, d) => {
        val ch = TextOps.chunkDocs(docs(s, d), window = 30, stride = 30)
          .select((col("doc_id") * 1000000L + col("chunk_id")).as("doc_id"),
            col("chunk").as("text"))
        val v = TextOps.hashVectorize(ch, dim = 16)
          .select(col("doc_id").as("vec_id"), col("vec").as("embedding"))
        val q = v.orderBy("vec_id").limit(3)
        Ann.ivfTopK(q, v, k = 5, nlist = 8, nprobe = 2, kmeansIters = 0)
          .orderBy("qid", "rnk")
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
             |ck AS (SELECT doc_id,
             |         unnest([{'k': k, 'c': array_to_string(s[k*30+1 : k*30+30], ' ')}
             |           for k in range(0, (len(s)-1)//30 + 1)]) AS u
             |       FROM d WHERE len(s) > 0),
             |cv AS (SELECT doc_id*1000000 + u.k AS vec_id, u.c AS chunk FROM ck),
             |t AS (SELECT vec_id, unnest(string_split(chunk, ' ')) AS tok FROM cv),
             |cnt AS (SELECT vec_id,
             |          CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 16 AS b,
             |          count(*) AS c
             |        FROM t GROUP BY 1, 2),
             |grid AS (SELECT g.vec_id, g.j, coalesce(cnt.c, 0) AS c
             |         FROM (SELECT v.vec_id, j.j
             |               FROM (SELECT DISTINCT vec_id FROM cv) v,
             |                    range(0, 16) j(j)) g
             |         LEFT JOIN cnt ON cnt.vec_id = g.vec_id AND cnt.b = g.j),
             |nrm AS (SELECT vec_id,
             |          sqrt(CAST(sum((c*10000)*(c*10000)) AS DOUBLE)) AS n
             |        FROM grid GROUP BY 1),
             |cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list_id,
             |            vec_id AS cvec
             |          FROM (SELECT DISTINCT vec_id FROM cv ORDER BY vec_id LIMIT 8)),
             |cg AS (SELECT cents.list_id, grid.j, grid.c AS cc
             |       FROM cents JOIN grid ON grid.vec_id = cents.cvec),
             |dist AS (SELECT g.vec_id, cg.list_id,
             |           sum((g.c - cg.cc) * (g.c - cg.cc)) AS d2
             |         FROM grid g JOIN cg ON g.j = cg.j GROUP BY 1, 2),
             |asg AS (SELECT vec_id, list_id FROM (
             |          SELECT vec_id, list_id,
             |            row_number() OVER (PARTITION BY vec_id
             |              ORDER BY d2, list_id) AS rn
             |          FROM dist) WHERE rn = 1),
             |qs AS (SELECT vec_id FROM cv ORDER BY vec_id LIMIT 3),
             |probe AS (SELECT qid, list_id FROM (
             |            SELECT dd.vec_id AS qid, dd.list_id,
             |              row_number() OVER (PARTITION BY dd.vec_id
             |                ORDER BY dd.d2, dd.list_id) AS rn
             |            FROM dist dd JOIN qs ON dd.vec_id = qs.vec_id)
             |          WHERE rn <= 2),
             |dotr AS (SELECT p.qid, a.vec_id AS vid,
             |           CAST(sum(gq.c * gv.c) AS BIGINT) AS dot_raw
             |         FROM probe p JOIN asg a ON a.list_id = p.list_id
             |           JOIN grid gq ON gq.vec_id = p.qid
             |           JOIN grid gv ON gv.vec_id = a.vec_id AND gv.j = gq.j
             |         WHERE a.vec_id != p.qid GROUP BY 1, 2),
             |sc AS (SELECT dotr.qid, dotr.vid,
             |         CAST(dot_raw * 100000000 AS DOUBLE) / (nq.n * nv.n) AS cosine
             |       FROM dotr JOIN nrm nq ON nq.vec_id = dotr.qid
             |                 JOIN nrm nv ON nv.vec_id = dotr.vid),
             |r AS (SELECT qid, vid, cosine,
             |        CAST(row_number() OVER (PARTITION BY qid
             |          ORDER BY cosine DESC, vid) AS BIGINT) AS rnk
             |      FROM sc)
             |SELECT qid, vid, rnk, cosine FROM r WHERE rnk <= 5
             |ORDER BY 1, 3""".stripMargin)),

    // ---- classifier calibration: the q158 weights/scores swept over a
    //      literal threshold grid — confusion + exact-integer
    //      precision/recall per operating point ----
    Entry("q170_threshold_sweep",
      (s, d) => {
        val two = docs(s, d).where(col("lang").isin("en", "de"))
        val w = TextOps.tokenWeights(
          two.where(pmod(col("doc_id"), lit(5)) =!= 0), "lang", "en", "de")
        val scored = TextOps.scoreDocs(
          two.where(pmod(col("doc_id"), lit(5)) === 0)
            .select("doc_id", "lang", "text"), w)
        TextOps.thresholdSweep(scored, "lang", "en", "score",
            thresholds = Seq(-2000000L, -500000L, 0L, 500000L, 2000000L))
          .orderBy("threshold")
      },
      Some("""WITH two AS (SELECT doc_id, lang AS cls, text
             |             FROM documents WHERE lang IN ('en', 'de')),
             |tok AS (SELECT cls, unnest(string_split(text, ' ')) AS term
             |        FROM two WHERE doc_id % 5 <> 0),
             |cnt AS (SELECT term,
             |          count(*) FILTER (cls = 'en') AS ca,
             |          count(*) FILTER (cls = 'de') AS cb
             |        FROM tok GROUP BY 1),
             |tot AS (SELECT count(*) FILTER (cls = 'en') AS na,
             |               count(*) FILTER (cls = 'de') AS nb FROM tok),
             |w AS (SELECT term,
             |        (ca * 1000000) // na - (cb * 1000000) // nb AS w
             |      FROM cnt, tot),
             |sc AS (SELECT t.doc_id, t.cls,
             |         CAST(coalesce(sum(w.w), 0) AS BIGINT) AS score
             |       FROM (SELECT doc_id, cls,
             |               unnest(string_split(text, ' ')) AS term
             |             FROM two WHERE doc_id % 5 = 0) t
             |       LEFT JOIN w ON t.term = w.term
             |       GROUP BY 1, 2),
             |ks AS (SELECT unnest([-2000000, -500000, 0,
             |                      500000, 2000000]) AS threshold),
             |cf AS (SELECT k.threshold,
             |         count(*) FILTER (score >= k.threshold AND cls = 'en') AS tp,
             |         count(*) FILTER (score >= k.threshold AND cls <> 'en') AS fp,
             |         count(*) FILTER (score < k.threshold AND cls = 'en') AS fn,
             |         count(*) FILTER (score < k.threshold AND cls <> 'en') AS tn
             |       FROM sc, ks k GROUP BY 1)
             |SELECT CAST(threshold AS BIGINT) AS threshold,
             |  CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
             |  CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
             |  (tp * 1000000) // greatest(tp + fp, 1) AS precision_e6,
             |  (tp * 1000000) // greatest(tp + fn, 1) AS recall_e6
             |FROM cf ORDER BY threshold""".stripMargin)),

    // ---- persisted inverted text index: bucket=-partitioned postings +
    //      dict, search probes ONLY the query terms' buckets (literal
    //      partition filter — the q43 persisted-IVF discipline for
    //      keyword search). Scores identical to the on-the-fly q65
    //      scorer, so the oracle is the same shape over the raw table ----
    Entry("q171_indexed_search",
      (s, d) => graft.store.TextIndex.searchTopK(s, textIndexFor(s, d),
        Seq("query", "index", "merge"), k = 10),
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |           FROM documents),
             |f AS (SELECT doc_id, token, count(*) AS tf FROM t
             |      WHERE token IN ('query', 'index', 'merge') GROUP BY 1, 2),
             |i AS (SELECT token,
             |        ((SELECT count(*) FROM documents) * 1000000) // count(*) AS idf_scaled
             |      FROM f GROUP BY token)
             |SELECT doc_id, CAST(sum(f.tf * i.idf_scaled) AS BIGINT) AS score
             |FROM f JOIN i USING (token) GROUP BY doc_id
             |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)),

    // ---- the q171 index built INCREMENTALLY (2/3 written, 1/3
    //      appended): postings/df/n_docs are additive, so the delta
    //      index must search identically to a full build — the oracle
    //      is the same q65 shape over the whole raw table ----
    Entry("q172_indexed_search_delta",
      (s, d) => graft.store.TextIndex.searchTopK(s, textIndexDeltaFor(s, d),
        Seq("scan", "filter"), k = 10),
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |           FROM documents),
             |f AS (SELECT doc_id, token, count(*) AS tf FROM t
             |      WHERE token IN ('scan', 'filter') GROUP BY 1, 2),
             |i AS (SELECT token,
             |        ((SELECT count(*) FROM documents) * 1000000) // count(*) AS idf_scaled
             |      FROM f GROUP BY token)
             |SELECT doc_id, CAST(sum(f.tf * i.idf_scaled) AS BIGINT) AS score
             |FROM f JOIN i USING (token) GROUP BY doc_id
             |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)),

    // ---- TPC-H Q13 shape: customer order-count distribution through a
    //      LEFT OUTER join (zero-order customers must appear at
    //      c_count = 0 — count(o_orderkey) ignores the null-extended
    //      rows), non-urgent orders only. The outer-aggregate
    //      relational shape q165's anti join doesn't cover ----
    Entry("q173_order_distribution",
      (s, d) => {
        val c = s.read.parquet(s"$d/customer.parquet")
        val o = s.read.parquet(s"$d/orders.parquet")
          .where(col("o_orderpriority") =!= "1-URGENT")
        c.join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count").agg(count(lit(1)).as("n_cust"))
          .orderBy(desc("n_cust"), desc("c_count"))
      },
      Some("""WITH oc AS (SELECT c_custkey,
             |    CAST(count(o_orderkey) AS BIGINT) AS c_count
             |  FROM customer LEFT JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             |  GROUP BY 1)
             |SELECT c_count, CAST(count(*) AS BIGINT) AS n_cust
             |FROM oc GROUP BY 1
             |ORDER BY n_cust DESC, c_count DESC""".stripMargin)),

    // ---- indexed phrase search: q131's semantics over the persisted
    //      POSITIONAL tier — the corpus is never scanned at query time
    //      (bucket-pruned positional postings + the (doc, pos−i) chain).
    //      Same oracle shape as q131 with a different phrase ----
    Entry("q174_indexed_phrase",
      (s, d) => graft.store.TextIndex.phraseSearch(s,
          textIndexPosFor(s, d), Seq("table", "scan"))
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS s
             |           FROM documents),
             |m AS (SELECT doc_id,
             |        len([i for i in range(1, len(s))
             |             if s[i] = 'table' AND s[i+1] = 'scan']) AS n_matches
             |      FROM t)
             |SELECT doc_id, CAST(n_matches AS BIGINT) AS n_matches
             |FROM m WHERE n_matches > 0 ORDER BY doc_id""".stripMargin)),

    // ---- BM25 over the persisted index: q99's exact rational with tf
    //      from bucket-pruned postings, df from the dict, dl from the
    //      doclen table, L/N as meta literals — same oracle shape ----
    Entry("q175_indexed_bm25",
      (s, d) => graft.store.TextIndex.bm25TopK(s, textIndexFor(s, d),
        Seq("query", "merge", "stream"), k = 20),
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |           FROM documents),
             |dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
             |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS L FROM dl),
             |nn AS (SELECT count(*) AS N FROM documents),
             |f AS (SELECT doc_id, token, count(*) AS tf FROM t
             |      WHERE token IN ('query', 'merge', 'stream') GROUP BY 1, 2),
             |i AS (SELECT token, (nn.N * 1000000) // count(*) AS idf_scaled
             |      FROM f, nn GROUP BY token, nn.N),
             |sc AS (SELECT f.doc_id,
             |         CAST(sum(i.idf_scaled *
             |           ((22 * f.tf * tot.L * 1000000)
             |            // (10 * f.tf * tot.L + 3 * tot.L + 9 * dl.dl * nn.N)))
             |           AS BIGINT) AS score
             |       FROM f JOIN i USING (token) JOIN dl USING (doc_id), tot, nn
             |       GROUP BY 1)
             |SELECT doc_id, score FROM sc
             |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)),

    // ---- hybrid retrieval capstone: BM25 lexical ranking fused with an
    //      embedding ANN ranking (query = doc 0's hash-count vector) by
    //      reciprocal rank — the modern retrieval stack end-to-end over
    //      three verified tiers (q99 scorer, q66/q19 cosine path, q92
    //      fusion). Assignment-free: both rankings are answer-sized ----
    Entry("q176_hybrid_search",
      (s, d) => {
        val dd = docs(s, d)
        val wLex = Window.orderBy(desc("score"), asc("doc_id"))
        val lex = TextOps.bm25TopK(dd, Seq("hash", "join", "scan"), k = 20)
          // rank AFTER the TakeOrdered cut: a 20-row frame (bounded)
          .withColumn("rnk", row_number().over(wLex).cast("long"))
          .select("doc_id", "rnk")
        val v = TextOps.hashVectorize(dd, dim = 16)
          .select(col("doc_id").as("vec_id"), col("vec").as("embedding"))
        val sem = Ann.bruteForceTopK(v.where(col("vec_id") === 0L), v,
            k = 20)
          .select(col("vid").as("doc_id"), col("rnk"))
        TextOps.rrfFuse(Seq(lex, sem), topK = 10)
      },
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |           FROM documents),
             |dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
             |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS L FROM dl),
             |nn AS (SELECT count(*) AS N FROM documents),
             |f AS (SELECT doc_id, token, count(*) AS tf FROM t
             |      WHERE token IN ('hash', 'join', 'scan') GROUP BY 1, 2),
             |i AS (SELECT token, (nn.N * 1000000) // count(*) AS idf_scaled
             |      FROM f, nn GROUP BY token, nn.N),
             |bm AS (SELECT f.doc_id,
             |         CAST(sum(i.idf_scaled *
             |           ((22 * f.tf * tot.L * 1000000)
             |            // (10 * f.tf * tot.L + 3 * tot.L + 9 * dl.dl * nn.N)))
             |           AS BIGINT) AS score
             |       FROM f JOIN i USING (token) JOIN dl USING (doc_id), tot, nn
             |       GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 20),
             |ra AS (SELECT doc_id, CAST(row_number() OVER
             |         (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk FROM bm),
             |cnt AS (SELECT doc_id,
             |          CAST('0x' || substr(md5(token), 1, 15) AS BIGINT) % 16 AS b,
             |          count(*) AS c
             |        FROM t GROUP BY 1, 2),
             |grid AS (SELECT g.doc_id, g.j, coalesce(cnt.c, 0) AS c
             |         FROM (SELECT dd.doc_id, j.j
             |               FROM (SELECT DISTINCT doc_id FROM documents) dd,
             |                    range(0, 16) j(j)) g
             |         LEFT JOIN cnt ON cnt.doc_id = g.doc_id AND cnt.b = g.j),
             |nrm AS (SELECT doc_id,
             |          sqrt(CAST(sum((c*10000)*(c*10000)) AS DOUBLE)) AS n
             |        FROM grid GROUP BY 1),
             |q0 AS (SELECT j, c FROM grid WHERE doc_id = 0),
             |dotr AS (SELECT g.doc_id AS vid,
             |           CAST(sum(g.c * q0.c) AS BIGINT) AS dot_raw
             |         FROM grid g JOIN q0 ON g.j = q0.j
             |         WHERE g.doc_id <> 0 GROUP BY 1),
             |cosv AS (SELECT dotr.vid,
             |           CAST(dot_raw * 100000000 AS DOUBLE)
             |             / (nq.n * nv.n) AS cosine
             |         FROM dotr
             |           CROSS JOIN (SELECT n FROM nrm WHERE doc_id = 0) nq
             |           JOIN nrm nv ON nv.doc_id = dotr.vid),
             |rb AS (SELECT vid AS doc_id, rnk FROM (
             |         SELECT vid, CAST(row_number() OVER
             |           (ORDER BY cosine DESC, vid) AS BIGINT) AS rnk
             |         FROM cosv) WHERE rnk <= 20),
             |u AS (SELECT doc_id, 1000000000000 // (60 + rnk) AS rc FROM ra
             |      UNION ALL
             |      SELECT doc_id, 1000000000000 // (60 + rnk) AS rc FROM rb)
             |SELECT doc_id, CAST(sum(rc) AS BIGINT) AS rrf,
             |       count(*) AS n_lists
             |FROM u GROUP BY 1 ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin)),

    // ---- TPC-H Q4 shape: per-priority count of orders with at least
    //      one lineitem shipped > 60 days after the order date — the
    //      EXISTS/left-semi relational shape with a non-equi residual
    //      on the join condition ----
    Entry("q177_late_ship_priority",
      (s, d) => {
        val o = s.read.parquet(s"$d/orders.parquet")
        val l = s.read.parquet(s"$d/lineitem.parquet")
        o.join(l,
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") >
                col("o_orderdate") + expr("INTERVAL 60 DAYS"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_orders"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
             |FROM orders o
             |WHERE EXISTS (SELECT 1 FROM lineitem l
             |  WHERE l.l_orderkey = o.o_orderkey
             |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- TPC-H Q17 shape: small-quantity revenue per brand — rows
    //      below 20% of their PART's average quantity (the correlated
    //      scalar-aggregate subquery class), decided by the exact
    //      integer cross-multiply qty·5·cnt < sum (no avg division).
    //      One partkey partial agg + the co-keyed fact self-join; the
    //      part dim broadcast ----
    Entry("q178_small_qty_revenue",
      (s, d) => {
        val l = s.read.parquet(s"$d/lineitem.parquet")
          .select(col("l_partkey"),
            col("l_quantity").cast("long").as("qty"),
            round(col("l_extendedprice") * 100, 0).cast("long")
              .as("price_cents"))
        val pq = l.groupBy("l_partkey")
          .agg(sum("qty").as("_s"), count(lit(1)).as("_c"))
        val p = s.read.parquet(s"$d/part.parquet")
          .select(col("p_partkey").as("l_partkey"), col("p_brand"))
        l.join(pq, "l_partkey")
          .where(col("qty") * 5 * col("_c") < col("_s"))
          .join(broadcast(p), "l_partkey")
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_rows"),
            sum("price_cents").as("revenue_cents"))
          .orderBy("p_brand")
      },
      Some("""WITH l AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
             |  FROM lineitem),
             |pq AS (SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS s,
             |         CAST(count(*) AS BIGINT) AS c
             |       FROM l GROUP BY 1)
             |SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(l.price_cents) AS BIGINT) AS revenue_cents
             |FROM l JOIN pq USING (l_partkey)
             |  JOIN part p ON p.p_partkey = l.l_partkey
             |WHERE l.qty * 5 * pq.c < pq.s
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- TPC-H Q18 shape: large-volume orders — HAVING-filtered fact
    //      aggregate joined back through orders to the broadcast
    //      customer dim, TakeOrdered cut (never a global sort) ----
    Entry("q179_large_volume_orders",
      (s, d) => {
        val l = s.read.parquet(s"$d/lineitem.parquet")
          .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
        val oq = l.groupBy("l_orderkey")
          .agg(sum("qty").as("total_qty"))
          .where(col("total_qty") > 250L)
        val o = s.read.parquet(s"$d/orders.parquet")
          .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"),
            round(col("o_totalprice") * 100, 0).cast("long")
              .as("price_cents"))
        val c = s.read.parquet(s"$d/customer.parquet")
          .select(col("c_custkey").as("o_custkey"), col("c_name"))
        oq.join(o, "l_orderkey").join(broadcast(c), "o_custkey")
          .select(col("c_name"), col("o_custkey"),
            col("l_orderkey").as("orderkey"), col("total_qty"),
            col("price_cents"))
          .orderBy(desc("total_qty"), asc("orderkey")).limit(100)
      },
      Some("""WITH oq AS (SELECT l_orderkey,
             |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
             |  FROM lineitem GROUP BY 1 HAVING total_qty > 250)
             |SELECT c.c_name, o.o_custkey, o.o_orderkey AS orderkey,
             |  oq.total_qty,
             |  CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_cents
             |FROM oq JOIN orders o ON o.o_orderkey = oq.l_orderkey
             |  JOIN customer c ON c.c_custkey = o.o_custkey
             |ORDER BY total_qty DESC, orderkey LIMIT 100""".stripMargin)),

    // ---- LSH-prescreened exact cosine join: minhash-band candidates over
    //      the token set, decided by q102's exact-integer accept rule. The
    //      oracle REPRODUCES THE BANDING in SQL (the Carter-Wegman family
    //      is deterministic md5 arithmetic, the q18 precedent), so the hash
    //      check pins the implementation, not a recall claim — the xxhash64
    //      band key on the Spark side can only MERGE buckets (adds
    //      candidates the exact verify discards), never split them, so raw
    //      (band, m_2b, m_2b+1) equality is the same candidate set ----
    Entry("q180_cosine_join_lsh",
      (s, d) => Dedup.cosineJoinBucketed(
          docs(s, d).where(pmod(col("doc_id"), lit(5)) === 0),
          tauNum = 4L, tauDen = 5L, numHashes = 32, bands = 16,
          maxBucket = Int.MaxValue)
        .orderBy("doc_a", "doc_b"),
      Some(cosineLshOracleSql(numHashes = 32, bands = 16,
        tauNum = 4L, tauDen = 5L))),

    // ---- segment-signature edit-distance pairs (PASS-JOIN pigeonhole):
    //      q61's output contract and brute-force oracle, content-keyed
    //      blocking — the hash check IS the recall-1 claim at this SF ----
    Entry("q181_edit_neardup_seg",
      (s, d) => {
        val en = docs(s, d).where(col("lang") === "en")
          .select(col("doc_id"),
            regexp_replace(col("text"), "[^ -~]", "").as("text"))
        Dedup.editDistancePairsSegmented(en, maxDist = 6,
            maxBucket = Int.MaxValue)
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH en AS (SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS t
             |            FROM documents WHERE lang = 'en'),
             |l AS (SELECT doc_id, t, length(t) AS len FROM en),
             |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |             CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
             |      FROM l a JOIN l b
             |        ON a.doc_id < b.doc_id AND abs(a.len - b.len) <= 6)
             |SELECT doc_a, doc_b, dist FROM p WHERE dist <= 6
             |ORDER BY 1, 2""".stripMargin)),

    // ---- the unsupported-codec CONTRACT, pinned: tagged feature
    //      extraction over a deterministic codec mix — in-JVM codecs tag
    //      `jdk`, demuxable-but-compressed mp4 raw-RGB rides the
    //      registered mp4Decoder as `fallback`, and declared-avc1
    //      containers (structurally valid, undecodable by contract) land
    //      on `stub` with the sniffed codec named. Counts are generator
    //      arithmetic, so the oracle is a VALUES table ----
    Entry("q182_codec_audit",
      (s, _) => {
        val m = Multimodal.syntheticMedia(s, 300)
          .unionByName(Multimodal.syntheticMp4(s, 60)
            .withColumn("media_id", col("media_id") + 1000))
          .unionByName(Multimodal.syntheticMp4Unsupported(s, 30)
            .withColumn("media_id", col("media_id") + 2000))
        Multimodal.extractFeaturesTagged(m, dim = 16,
            fallback = Multimodal.mp4Decoder)
          .groupBy("kind", "codec", "decoder").agg(count(lit(1)).as("n"))
          .orderBy("kind", "codec", "decoder")
      },
      Some("""SELECT * FROM (VALUES
             |  ('audio', 'wav',      'jdk',      CAST(100 AS BIGINT)),
             |  ('image', 'png',      'jdk',      CAST(100 AS BIGINT)),
             |  ('video', 'gif',      'jdk',      CAST(100 AS BIGINT)),
             |  ('video', 'mp4/avc1', 'stub',     CAST(30 AS BIGINT)),
             |  ('video', 'mp4/raw',  'fallback', CAST(60 AS BIGINT))
             |) AS t(kind, codec, decoder, n)
             |ORDER BY kind, codec, decoder""".stripMargin))
  )

  /** q180's oracle: the SAME minhash banding the Spark side runs —
    * md5-derived 60-bit term hashes through the [[Dedup.hashCoef]]
    * Carter-Wegman family (fixed literal coefficients), per-band raw
    * minima equality standing in for the xxhash64 band key (collisions of
    * which only ADD candidates that the exact accept rule discards) —
    * followed by q102's exact-integer accept restricted to candidates. */
  private def cosineLshOracleSql(numHashes: Int, bands: Int,
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
  private def dictTagLexicon: Seq[(String, String)] = Seq(
    "hash join" -> "topic_join", "merge join" -> "topic_join",
    "sort merge" -> "topic_join",
    "table scan" -> "topic_scan", "column scan" -> "topic_scan",
    "group agg" -> "topic_agg", "window agg" -> "topic_agg",
    "stream" -> "topic_stream", "batch" -> "topic_stream",
    "slow query" -> "topic_perf", "fast query" -> "topic_perf")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    entries.map(e => e.name -> e.fn).toMap

  def oracleSql: Map[String, String] =
    entries.flatMap(e => e.sql.map(e.name -> _)).toMap
}
