package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Streaming-summary sketches whose final answers are EXACT — the sketch
  * only prunes, a second exact pass decides. This keeps every operator
  * oracle-comparable (a plain SQL aggregate computes the same rows) while
  * the distributed shape stays sub-shuffle: the corpus-sized stream never
  * shuffles on its value column.
  */
object Sketches {

  /** Exact φ-heavy hitters — every value with count·k > n (frequency
    * strictly above n/k) and its EXACT count — in two narrow passes with
    * no corpus-wide shuffle.
    *
    * Pass 1 runs a Misra–Gries summary (capacity k−1) per partition
    * (mapPartitions — the textbook justified per-partition imperative
    * case) and also tallies partition row counts. An item with global
    * count > n/k must exceed n_p/k in at least one partition (if
    * cnt_p ≤ n_p/k everywhere, summing gives cnt ≤ n/k), and MG with k−1
    * counters retains every item with local frequency above n_p/k — so
    * the UNION of partition summaries contains every global heavy hitter
    * (recall 1; the sketch may add false candidates, never drop a true
    * one). The driver holds ≤ partitions·(k−1) candidate strings — never
    * corpus-sized.
    *
    * Pass 2 recounts ONLY candidate rows (isInCollection compiles to a
    * hash-set probe) with an exact groupBy — the only shuffle, carrying
    * candidate rows alone — then applies the exact integer threshold
    * `cnt·k > n` (no division: floor-div semantics can disagree across
    * engines; the multiply is overflow-safe for n ≤ 9e18/k).
    *
    * Nulls are excluded (SQL count semantics). Determinism: MG's surviving
    * candidate SET depends on partition iteration order, but the exact
    * recount + threshold make the OUTPUT independent of it — any superset
    * of the true heavy hitters recounts to the same rows.
    *
    * @return (value, cnt), the exact count for each value above threshold
    */
  def heavyHitters(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(valueCol).cast("string").as("value"))
      .where(col("value").isNotNull)
    // tag 0 rows carry partition totals; tag 1 rows carry MG candidates
    val partial: Array[(Int, String, Long)] =
      vals.as[String].mapPartitions { it =>
        val counters = mutable.HashMap.empty[String, Long]
        var n = 0L
        while (it.hasNext) {
          val v = it.next()
          n += 1
          counters.get(v) match {
            case Some(c) => counters(v) = c + 1
            case None if counters.size < k - 1 => counters(v) = 1L
            case None =>
              val dead = List.newBuilder[String]
              counters.foreach { case (key, c) =>
                if (c == 1L) dead += key else counters(key) = c - 1
              }
              dead.result().foreach(counters.remove)
          }
        }
        Iterator.single((0, "", n)) ++
          counters.keysIterator.map(v => (1, v, 0L))
      }.collect()
    val n = partial.collect { case (0, _, c) => c }.sum
    val cands = partial.collect { case (1, v, _) => v }.distinct.toSeq
    if (cands.isEmpty)
      vals.limit(0).withColumn("cnt", lit(0L)).select("value", "cnt")
    else
      vals.where(col("value").isInCollection(cands))
        .groupBy("value").agg(count(lit(1)).as("cnt"))
        .where(col("cnt") * lit(k.toLong) > lit(n))
  }

  /** Count–Min sketch register table (Cormode & Muthukrishnan 2005):
    * depth×width counters, cell (j, h_j(v) mod width) incremented per
    * occurrence, with h_j the engine-standard 60-bit md5 derivation over
    * `v + "#" + j`. DETERMINISTIC and integer-exact, so the whole sketch
    * is hash-oracle-checkable.
    *
    * Shape at 100 TB: the stream is exploded ×depth but the groupBy
    * partial-aggregates map-side — each partition emits ≤ depth·width
    * register partials whatever its row count, so the one shuffle carries
    * registers, not data. Like [[approxDistinct]], register tables from
    * independent runs MERGE (by cnt sum), making this also the combiner
    * for pre-sketched shards.
    *
    * @return (j, cell, cnt) — absent cells are zero */
  def countMinRegisters(df: DataFrame, valueCol: String, depth: Int = 4,
                        width: Int = 64): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad geometry d=$depth w=$width")
    df.select(col(valueCol).cast("string").as("v"))
      .where(col("v").isNotNull)
      .select(col("v"), explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .withColumn("cell", pmod(TextOps.md5Long(
        concat(col("v"), lit("#"), col("j").cast("string"))),
        lit(width.toLong)))
      .groupBy("j", "cell").agg(count(lit(1)).as("cnt"))
  }

  /** CMS point-frequency estimates for a literal probe set, with the
    * exact recount alongside: est(v) = min_j regs(j, h_j(v)), which
    * overestimates (never under) by the classic ε = e/width bound on
    * colliding mass. The exact column costs one candidate-only recount
    * (isInCollection filter below the agg — probe-sized, not
    * corpus-sized), turning the sketch demo into a checkable error
    * report; at true scale callers drop it and keep the sketch-only
    * plan, whose one corpus shuffle is register-sized.
    *
    * @return (value, est, exact_cnt) per probe, absent probes 0/0 */
  def countMinEstimates(df: DataFrame, valueCol: String,
                        probes: Seq[String], depth: Int = 4,
                        width: Int = 64): DataFrame = {
    require(probes.nonEmpty, "need at least one probe value")
    val spark = df.sparkSession
    import spark.implicits._
    val regs = countMinRegisters(df, valueCol, depth, width)
    val pc = probes.toDF("value")
      .select(col("value"), explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .withColumn("cell", pmod(TextOps.md5Long(
        concat(col("value"), lit("#"), col("j").cast("string"))),
        lit(width.toLong)))
    val est = pc.join(broadcast(regs), Seq("j", "cell"), "left")
      .groupBy("value").agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
    val exact = df.select(col(valueCol).cast("string").as("value"))
      .where(col("value").isInCollection(probes))
      .groupBy("value").agg(count(lit(1)).as("exact_cnt"))
    est.join(exact, Seq("value"), "left")
      .select(col("value"), col("est"),
        coalesce(col("exact_cnt"), lit(0L)).as("exact_cnt"))
  }

  /** HyperLogLog approximate distinct count per key group (Flajolet et al.
    * 2007) — DETERMINISTIC, hence oracle-checkable: the hash is the md5
    * 60-bit derivation every dedup operator here uses, the register table
    * is pure integer arithmetic, and the harmonic sum is kept as the EXACT
    * scaled integer `zi = Σ 2^((60−p)+1 − M_j)` (≤ m·2^52 < 2^63 at p=9 —
    * overflow-free BIGINT on both engines). The only floats are one
    * int→double conversion and two IEEE ops in fixed order, bit-identical
    * everywhere.
    *
    * Shape at 100 TB: (keys, register) partial-agg shuffle — map-side
    * combine reduces every partition to ≤ m rows per key group before the
    * exchange — then a keys-sized rollup. The corpus never shuffles on the
    * counted value; register tables merge by max, so the operator is also
    * the MERGE of independently-built sketches.
    *
    * Returned `est_raw` is the raw HLL estimator α_m·m²/Z; the
    * small-range linear-counting and large-range corrections are left to
    * callers (they need `ln`, whose libm rounding is not bit-portable —
    * `zero_regs` carries what linear counting needs). Standard error
    * ≈ 1.04/√m (~4.6 % at p = 9).
    *
    * @param p register-index bits (m = 2^p registers), 4 ≤ p ≤ 16
    * @return one row per key group: keys…, `zi`, `zero_regs`, `est_raw` */
  def approxDistinct(df: DataFrame, keys: Seq[String], valueCol: String,
                     p: Int = 9): DataFrame =
    hllEstimate(hllRegisters(df, keys, valueCol, p), keys, p)

  /** The (keys…, _j, _mj) register table of [[approxDistinct]] — exposed
    * shape so merge-style callers (the sliding window below) can reuse
    * it. One (keys, j) partial-agg shuffle. */
  private def hllRegisters(df: DataFrame, keys: Seq[String],
                           valueCol: String, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val wBits = 60 - p            // 51 low bits at p=9
    val wMod = 1L << wBits        // 2^wBits
    val maxRank = wBits + 1       // rank when the low bits are all zero
    val h = graft.pipeline.TextOps.md5Long(col(valueCol).cast("string"))
    df.where(col(valueCol).isNotNull)
      .select(keys.map(col) :+ h.as("_h"): _*)
      .withColumn("_j", expr(s"_h div ${wMod}L"))
      .withColumn("_w", pmod(col("_h"), lit(wMod)))
      .withColumn("_rank",
        when(col("_w") === 0L, lit(maxRank.toLong))
          .otherwise(lit(maxRank.toLong) - length(bin(col("_w")))))
      .groupBy(keys.map(col) :+ col("_j"): _*)
      .agg(max("_rank").as("_mj"))
  }

  /** q77's exact-integer rollup of a register table keyed by `keys`. */
  private def hllEstimate(regs: DataFrame, keys: Seq[String],
                          p: Int): DataFrame = {
    val m = 1 << p
    val maxRank = 60 - p + 1
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    // m^2 * 2^maxRank — a power-of-two product, exactly representable
    val scale = math.pow(2.0, 2.0 * p + maxRank)
    regs.groupBy(keys.map(col): _*)
      .agg(
        (sum(expr(s"shiftleft(1L, $maxRank - _mj)")) +
          (lit(m.toLong) - count(lit(1))) * lit(1L << maxRank)).as("zi"),
        (lit(m.toLong) - count(lit(1))).as("zero_regs"))
      .withColumn("est_raw",
        lit(alpha) * (lit(scale) / col("zi").cast("double")))
  }

  /** Mergeable quantile sketch, HDR-histogram style (Tene's
    * HdrHistogram; same log-bucket family as DDSketch, Masson et al.
    * VLDB'19) — the quantile member of the sketch tier (HLL: distinct,
    * Count-Min: frequency). Non-negative integers land in a bucket that
    * keeps the leading `1 + m` bits: `B(v) = v` below 2^(m+1), else
    * `(L−1−m)·2^m + (v >> (L−1−m))` with L = v's bit length — strictly
    * monotone in v (bucket order = value order), PURE INTEGER (bit
    * length via `length(bin(v))`, the HLL-rank trick), deterministic and
    * order-independent, so register tables merge by (sum cnt, min vmin)
    * — unlike GK/t-digest, whose arrival-order dependence would break
    * hash-oracle parity. Relative bucket width ≤ 2^−m.
    *
    * Register rows: (keys…, _b, _cnt, _vmin) — one partial-agg shuffle,
    * register-table-sized (≤ (64−m)·2^m rows per key, ~1.9k at m = 5). */
  private[pipeline] def hdrRegisters(df: DataFrame, keys: Seq[String],
                                     valueCol: String, m: Int): DataFrame = {
    require(m >= 1 && m <= 20, s"m must be in [1,20], got $m")
    val lim = 1L << (m + 1)
    df.where(col(valueCol).isNotNull && col(valueCol) >= 0)
      .withColumn("_v", col(valueCol).cast("long"))
      .withColumn("_b", when(col("_v") < lim, col("_v")).otherwise(
        expr(s"(length(bin(_v)) - 1 - $m) * ${1L << m}L" +
          s" + (_v div shiftleft(1L, length(bin(_v)) - 1 - $m))")))
      .groupBy(keys.map(col) :+ col("_b"): _*)
      .agg(count(lit(1)).as("_cnt"), min("_v").as("_vmin"))
  }

  /** Approximate per-key percentiles from the merged HDR register table:
    * for each p the FIRST bucket with `100·cum ≥ n·p` (q54's exact
    * integer selection rule, applied to bucket counts), answered by that
    * bucket's true minimum value — a real data point at most one bucket
    * width (≤ 2^−m relative) below the exact percentile. The cumulative
    * window runs over REGISTER rows per key; the corpus is touched once.
    * Exact quantiles ([[graft.hta.Queries.valueQuantiles]]) shuffle the
    * distinct-VALUE histogram; this sketch caps that at the register
    * count and, unlike the exact form, merges across shards/days/stores
    * without re-scanning (the q91 property, for quantiles).
    *
    * @return per (keys…, p): q_approx (bucket-min value), n */
  def hdrQuantiles(df: DataFrame, keys: Seq[String], valueCol: String,
                   ps: Seq[Int], m: Int = 5): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100), "ps in [1,100]")
    val W = org.apache.spark.sql.expressions.Window
    val regs = hdrRegisters(df, keys, valueCol, m)
    val cum = regs
      .withColumn("_cum",
        sum("_cnt").over(W.partitionBy(keys.map(col): _*).orderBy("_b")))
      .withColumn("n", sum("_cnt").over(W.partitionBy(keys.map(col): _*)))
    cum.select(keys.map(col) ++ Seq(col("_b"), col("_vmin"), col("_cum"),
        col("n"), explode(lit(ps.toArray)).as("_p0")): _*)
      .withColumn("p", col("_p0").cast("long"))
      .where(col("_cum") * 100 >= col("n") * col("p"))
      .groupBy(keys.map(col) :+ col("p"): _*)
      .agg(min_by(col("_vmin"), col("_b")).as("q_approx"), min("n").as("n"))
  }

  /** Sliding-window distinct counts from MERGED daily sketches: one HLL
    * register table per (keys, day), then for every observed day the
    * registers of the trailing `windowDays` days merge by max and roll
    * up to the q77 estimator — the mergeability property doing real
    * work. This is how "distinct users, trailing 7 days, every day"
    * stays sub-linear: the corpus is touched ONCE (daily-register
    * build); the slide runs entirely on register tables
    * (keys × days × ≤2^p rows), never re-reading data. Exact sliding
    * distinct would re-scan every window; sketch merge replaces that
    * with max() over sketch rows.
    *
    * All integers (the estimator divide is the only float) — the whole
    * sliding pipeline is hash-oracle-checkable.
    *
    * @param windowDays trailing window size in days (≥ 1), window
    *                   (day − windowDays, day]
    * @return per (keys…, day): zi, zero_regs, est_raw of the merged
    *         window sketch */
  def approxDistinctSliding(df: DataFrame, keys: Seq[String],
                            valueCol: String, timeCol: String,
                            windowDays: Int, p: Int = 9,
                            dayNs: Long = 86400000000000L): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    require(!keys.contains("_day") && valueCol != "_day" &&
        timeCol != "_day",
      "approxDistinctSliding: '_day' is reserved for the internal day column")
    val withDay = df.withColumn("_day", expr(s"$timeCol div ${dayNs}L"))
    // rename EVERY join column on the daily side, not just _day: both
    // sides descend from withDay, so daily(k) === grid(k) compares one
    // attribute to itself — correct under Spark's self-join
    // disambiguation but warned as a trivially-true predicate on every
    // run (r14 bench-log hygiene finding). The prefix is grown until no
    // rename TARGET collides with an existing column — a fixed "_r"
    // collided when a user key was literally "day" ("_day"→"_rday" and
    // "day"→"_rday" duplicated) or equaled "_r"+another (r15 ADVICE);
    // one select applies all renames so targets are checked as a set.
    val daily0 = hllRegisters(withDay, keys :+ "_day", valueCol, p)
    val renameSrcs = keys :+ "_day"
    var pfx = "_r"
    while (renameSrcs.exists(s => daily0.columns.contains(pfx + s)))
      pfx = pfx + "_"
    val daily = daily0.select(daily0.columns.map { c =>
      if (renameSrcs.contains(c)) col(c).as(pfx + c) else col(c)
    }.toSeq: _*)
    val grid = withDay.select((keys.map(col) :+ col("_day")): _*).distinct()
    val joinCond = keys.map(k => daily(pfx + k) === grid(k))
      .reduce(_ && _) &&
      daily(pfx + "_day") > grid("_day") - windowDays.toLong &&
      daily(pfx + "_day") <= grid("_day")
    val merged = grid.join(daily, joinCond)
      .select((keys.map(grid(_)) :+ grid("_day").as("day") :+
        daily("_j") :+ daily("_mj")): _*)
      .groupBy((keys.map(col) :+ col("day") :+ col("_j")): _*)
      .agg(max("_mj").as("_mj"))
    hllEstimate(merged, keys :+ "day", p)
  }

  /** Pairwise set-similarity matrix between groups (sources, crawls,
    * snapshots) from k-MinHash sketches, with the EXACT Jaccard alongside
    * — the dataset-to-dataset view ("how much does source A overlap
    * source B?") that drives mixture design and crawl triage, plus the
    * sketch-accuracy measurement the estimate needs to be trusted
    * (Broder 1997: P[min h_i(A) = min h_i(B)] = J(A,B)).
    *
    * One pass computes each group's k per-hash minima under the SAME
    * Carter-Wegman family as the MinHash-LSH tier ([[Dedup.hashCoef]],
    * deterministic coefficients); the pair estimate joins SKETCH rows
    * (groups × k — answer-sized, broadcastable), never elements. The
    * exact tier joins distinct (group, element) rows hash-to-hash —
    * at production scale drop it and keep the sketch join, which is the
    * point of the sketch; here it doubles as the accuracy oracle.
    *
    * @param elem 60-bit-hash element column (e.g. md5Long of content)
    * @return per unordered group pair (key_a < key_b): est_matches, k,
    *         est_jaccard_e6, inter, uni, jaccard_e6 */
  def setSimilarityMatrix(df: DataFrame, key: String,
                          elem: org.apache.spark.sql.Column,
                          k: Int = 32): DataFrame = {
    require(k >= 1 && k <= 128, s"k must be in [1, 128], got $k")
    val base = df.select(col(key), elem.as("_e")).distinct()
    val hx = base.withColumn("_hx", pmod(col("_e"), lit(Dedup.P)))
    val mins = (0 until k).map { i =>
      val (a, b) = Dedup.hashCoef(i)
      min(pmod(col("_hx") * a + b, lit(Dedup.P))).as(s"m$i")
    }
    val sig = hx.groupBy(col(key)).agg(mins.head, mins.tail: _*)
      .select(col(key), posexplode(array((0 until k).map(i => col(s"m$i")): _*))
        .as(Seq("_i", "_m")))
    val est = sig.select(col(key).as("key_a"), col("_i"), col("_m").as("_ma"))
      .join(sig.select(col(key).as("key_b"), col("_i"), col("_m").as("_mb")), "_i")
      .where(col("key_a") < col("key_b"))
      .groupBy("key_a", "key_b")
      .agg(sum(when(col("_ma") === col("_mb"), 1L).otherwise(0L)).as("est_matches"))
    val sz = base.groupBy(col(key)).agg(count(lit(1)).as("_n"))
    val inter = base.select(col(key).as("key_a"), col("_e"))
      .join(base.select(col(key).as("key_b"), col("_e")), "_e")
      .where(col("key_a") < col("key_b"))
      .groupBy("key_a", "key_b").agg(count(lit(1)).as("_inter"))
    est
      .join(inter, Seq("key_a", "key_b"), "left")
      .join(sz.select(col(key).as("key_a"), col("_n").as("_na")), "key_a")
      .join(sz.select(col(key).as("key_b"), col("_n").as("_nb")), "key_b")
      .select(col("key_a"), col("key_b"),
        col("est_matches"), lit(k.toLong).as("k"),
        expr(s"est_matches * 1000000 div ${k.toLong}").as("est_jaccard_e6"),
        coalesce(col("_inter"), lit(0L)).as("inter"),
        (col("_na") + col("_nb") - coalesce(col("_inter"), lit(0L))).as("uni"))
      .withColumn("jaccard_e6", expr("inter * 1000000 div uni"))
  }
}
