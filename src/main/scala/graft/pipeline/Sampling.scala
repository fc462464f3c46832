package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines.
  *
  * Everything here keys on a CONTENT-DERIVED hash, never on `rand()`:
  * a training split must be reproducible run-to-run, stable under
  * repartitioning, and consistent across incremental corpus refreshes (a
  * document's split assignment never changes when other documents come and
  * go — the property random sampling cannot give). The hash is the same
  * 60-bit md5 prefix the dedup tier uses ([[TextOps.md5Long]]), so results
  * are exactly reproducible in any engine with md5 (the DuckDB oracles
  * render the identical arithmetic).
  *
  * Scale notes: [[hashSample]] and [[hashSplit]] are pure narrow column
  * expressions — no shuffle, fully codegen'd, filter-pushdown-friendly.
  * [[perKeyCap]] is one shuffle on the key (the quota is per key, so
  * partition width is bounded by the per-key row count, not corpus size).
  */
object Sampling {

  private val Buckets = 1000000L

  /** Uniform bucket in [0, 1e6) derived from the key column (+ salt so
    * independent samples decorrelate: different salt → different subset).
    * A NULL key hashes as the empty string — deterministic and CONSISTENT
    * across [[hashSample]] and [[hashSplit]] (a null bucket would otherwise
    * fail every comparison: silently dropped by sample, pushed into the
    * last split label by split). */
  def hashBucket(key: Column, salt: String = ""): Column =
    pmod(TextOps.md5Long(concat(coalesce(key.cast("string"), lit("")), lit(salt))),
      lit(Buckets))

  /** Keep rows whose key hashes under `fraction`: a deterministic,
    * repartition-stable Bernoulli sample over KEYS (all rows of one key are
    * kept or dropped together — sampling documents, not row fragments). */
  def hashSample(df: DataFrame, key: String, fraction: Double,
                 salt: String = ""): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction outside [0,1]")
    // rint, not truncation: 0.3 * 1e6 is 299999.999… in binary floating
    // point, and a .toLong cut of 299999 under-selects one bucket forever
    df.where(hashBucket(col(key), salt) < math.rint(fraction * Buckets).toLong)
  }

  /** Assign every row a split label by hash range: `weights` are relative
    * (normalized internally), cut points are exact integer bucket bounds so
    * the assignment is bit-reproducible. Appends `splitCol`. */
  def hashSplit(df: DataFrame, key: String, weights: Seq[Double],
                labels: Seq[String], splitCol: String = "split",
                salt: String = ""): DataFrame = {
    require(weights.length == labels.length && weights.nonEmpty,
      "weights and labels must align")
    require(weights.forall(_ >= 0) && weights.sum > 0, "weights must be non-negative, sum > 0")
    val total = weights.sum
    // integer cut points: cumulative weight scaled to the bucket space;
    // rint so intended integer boundaries are hit exactly whichever side of
    // the integer the float product lands (truncation would shift a cut
    // whose product rounds just under, e.g. 0.3 → 299999)
    val cuts = weights.scanLeft(0.0)(_ + _).tail
      .map(c => math.rint(c / total * Buckets).toLong)
    val b = hashBucket(col(key), salt)
    val expr = labels.zip(cuts).reverse.foldLeft(lit(labels.last): Column) {
      case (acc, (label, cut)) => when(b < cut, lit(label)).otherwise(acc)
    }
    df.withColumn(splitCol, expr)
  }

  /** Deterministic mixture resampling: keep each row with a PER-GROUP
    * fraction — the corpus-mixing step of training-data curation (down-weight
    * an over-represented crawl source, up-weight books/code/wiki) expressed
    * as one reproducible filter. `weights` maps group values (of `groupCol`)
    * to keep-fractions in [0,1]; unlisted groups use `default`. Like every
    * sampler here it keys on the content hash of `key`, never `rand()`:
    * repartition-stable, refresh-stable, and a row's fate is independent of
    * every other row. A pure narrow codegen'd filter — no shuffle, and the
    * group→cut mapping folds into the scan as a literal `when`-chain
    * (weights tables are small by nature; a million-entry mixture belongs in
    * a broadcast join, not a literal plan). */
  def mixtureSample(df: DataFrame, groupCol: String, key: String,
                    weights: Map[String, Double], default: Double = 1.0,
                    salt: String = ""): DataFrame = {
    require((weights.values ++ Seq(default)).forall(w => w >= 0 && w <= 1),
      "mixture fractions must lie in [0,1]")
    // rint for the same exact-integer-cut reason as hashSample
    val cut = weights.toSeq.sortBy(_._1)
      .foldLeft(lit(math.rint(default * Buckets).toLong): Column) {
        case (acc, (g, w)) =>
          when(col(groupCol) === g, lit(math.rint(w * Buckets).toLong))
            .otherwise(acc)
      }
    df.where(hashBucket(col(key), salt) < cut)
  }

  /** Temperature-scaled mixture shares (the multilingual/multi-source
    * sampling math: p_s ∝ n_s^(1/2), temperature 2): per-source corpus
    * counts → sqrt weights → normalized shares, the table a caller
    * feeds straight into [[mixtureSample]] to up-sample tail sources
    * without drowning in the head. Exactly one non-integer step —
    * `sqrt(n)` is a single correctly-rounded IEEE op, identical in
    * every engine — and the normalizer is a CUMULATIVE sum in source
    * order (a defined summation order; a bare SUM of doubles is
    * order-nondeterministic and would break the oracle), so `share_e6`
    * is bit-reproducible. General temperatures need pow() (not
    * cross-engine exact); 1/2 is the operational default and the one
    * with an exact contract.
    *
    * Shape: one (source) partial-agg shuffle; everything after runs on
    * the source-cardinality frame (windows over it are deliberate).
    *
    * @return (source, n, w, share_e6) — w = sqrt(n) */
  def temperatureShares(df: DataFrame, groupCol: String): DataFrame = {
    // deliberate unpartitioned windows: they run over the post-aggregate
    // SOURCE-cardinality frame (tens to thousands of rows — the mixture
    // table a human reads), never over corpus rows
    val wOrd = org.apache.spark.sql.expressions.Window.orderBy(groupCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wAll = org.apache.spark.sql.expressions.Window
      .orderBy(groupCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
      .withColumn("w", sqrt(col("n").cast("double")))
      .withColumn("_cum", sum("w").over(wOrd))
      .withColumn("_tot", max("_cum").over(wAll))
      .withColumn("share_e6",
        floor(col("w") * lit(1000000.0) / col("_tot")).cast("long"))
      .select(col(groupCol), col("n"), col("w"), col("share_e6"))
  }

  /** Importance (weighted) sampling: keep each row with its OWN
    * per-row probability — `weightE6` is the keep fraction at fixed
    * point 1e6 (0 drops always, 1e6 keeps always), typically a quality
    * or fluency score mapped into [0, 1e6]. The generalization of
    * [[hashSample]] (constant weight) and [[mixtureSample]] (per-group
    * weight) to per-ROW weights: same content-derived bucket, so the
    * decision is reproducible, repartition-stable, and monotone in the
    * weight (raising a doc's weight can only keep it, never flip a kept
    * doc out — curation thresholds compose predictably). A narrow
    * codegen'd filter, no shuffle.
    *
    * @param weightE6 integer column in [0, 1e6]; values are clamped */
  def weightedSample(df: DataFrame, key: String, weightE6: Column,
                     salt: String = ""): DataFrame =
    df.where(hashBucket(col(key), salt) <
      greatest(lit(0L), least(weightE6.cast("long"), lit(Buckets))))

  /** Per-key quota: keep at most `k` rows per key, the first `k` by
    * `order` with a deterministic total order (ties broken by the tie
    * columns — pass a unique id for bit-reproducibility). The classic
    * per-domain/per-source cap of corpus curation. */
  def perKeyCap(df: DataFrame, key: String, order: Seq[Column], k: Int): DataFrame = {
    require(k > 0, s"cap $k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(order: _*)
    val rn = Sessionize.freshName("_rn", df.columns.toSeq)
    df.withColumn(rn, row_number().over(w))
      .where(col(rn) <= k)
      .drop(rn)
  }

  /** Deterministic global shuffle: a reproducible random-looking TOTAL
    * ORDER over the corpus (the training-order permutation every epoch
    * pipeline needs), as contiguous positions 0..n−1. Order = the salted
    * content hash of the id (ties broken by id, so the order is total
    * even under hash collisions); same salt → same permutation on any
    * cluster, different salt → an independent epoch order.
    *
    * The 100 TB shape is the point: positions come from a RANGE-
    * PARTITIONED distributed sort plus `zipWithIndex`'s two-phase
    * per-partition offset scheme (count partitions, broadcast cumulative
    * offsets, label locally) — NEVER a `row_number() OVER ()` window,
    * whose empty partition-by collapses the corpus into one reducer. The
    * global index is invariant to where the range partitioner happens to
    * place its bounds: positions depend only on the total order.
    *
    * @return the input columns plus `shuffle_pos` (long, 0-based) */
  def deterministicShuffle(df: DataFrame, idCol: String,
                           salt: String = ""): DataFrame = {
    val sh = Sessionize.freshName("_sh", df.columns.toSeq)
    val keyed = df.withColumn(sh,
      TextOps.md5Long(concat(lit(salt), lit("|"), col(idCol).cast("string"))))
    val sorted = keyed.orderBy(col(sh), col(idCol))
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        "shuffle_pos", org.apache.spark.sql.types.LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(rdd, schema).drop(sh)
  }

  /** Stratified sample with EXACT largest-remainder allocation: draw
    * exactly `n` rows total, each stratum getting its proportional share
    * `⌊n·c_g/N⌋` plus one of the `n − Σ⌊·⌋` leftovers, leftovers going
    * to the strata with the largest remainders `(n·c_g) mod N`
    * (ties → lexicographically smaller stratum). The workhorse behind
    * fixed-budget eval-set construction and mixture snapshots where
    * [[mixtureSample]]'s per-row Bernoulli keep (binomially distributed
    * COUNT) isn't acceptable — here the per-stratum count is exact by
    * construction. Within a stratum the picks are the `quota` smallest
    * [[hashBucket]] values (ties → smaller key): deterministic,
    * repartition-stable, and a different `salt` redraws independently.
    *
    * All-integer: `n·c_g` stays in int64 while `n·N < 2⁶³` (enforced),
    * quotas/remainders are exact floor-div/mod, no float touches any
    * allocation decision — a window-SQL oracle matches bit-for-bit.
    *
    * Shape at 100 TB: stratum counts are ONE partial-agg shuffle to a
    * strata-sized frame, collected for DRIVER-side allocation (the
    * routing-table discipline — bounded by the stratum cardinality,
    * same as the IVF centroid and telescoping collects) and broadcast
    * back as the quota table; the pick is one stratum-keyed exchange
    * with a per-stratum rank. A stratum so hot its sort spills is the
    * q103 per-group-top-k salting case; quotas ≪ stratum sizes make
    * the rank's partial TakeOrdered cheap in practice.
    *
    * @return picked rows only: (groupCol, key, rnk) with rnk in
    *         [1, quota_g] by hash order */
  def stratifiedAlloc(df: DataFrame, groupCol: String, key: String,
                      n: Long, salt: String = ""): DataFrame = {
    require(n >= 0, s"sample size must be >= 0: $n")
    val spark = df.sparkSession
    // strata-sized frame (bounded) → driver-side exact allocation
    val cs = df.groupBy(groupCol).agg(count(lit(1)).as("_c"))
      .collect().map(r => (r.get(0), r.getLong(1)))
    val bigN = cs.map(_._2).sum
    require(n <= bigN, s"stratifiedAlloc: n=$n exceeds the population $bigN")
    if (n > 0) require(bigN <= Long.MaxValue / n,
      s"stratifiedAlloc: n·N overflows int64 for n=$n, N=$bigN")
    val base = cs.map { case (g, c) => (g, n * c / bigN, n * c % bigN) }
    val extra = (n - base.map(_._2).sum).toInt
    // leftovers to the largest remainders, ties → smaller stratum label
    val bump = base.sortBy { case (g, _, rem) => (-rem, String.valueOf(g)) }
      .take(extra).map(_._1).toSet
    val gType = df.schema(groupCol).dataType
    val quotaRows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(base.map { case (g, b, _) =>
        org.apache.spark.sql.Row(g, if (bump.contains(g)) b + 1 else b)
      }: _*)
    val quotas = spark.createDataFrame(quotaRows,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(groupCol, gType),
        org.apache.spark.sql.types.StructField("_quota",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val wPick = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("_b"), col(key))
    df.select(col(groupCol), col(key))
      .withColumn("_b", hashBucket(col(key), salt))
      .withColumn("rnk", row_number().over(wPick).cast("long"))
      .join(broadcast(quotas), Seq(groupCol))
      .where(col("rnk") <= col("_quota"))
      .select(col(groupCol), col(key), col("rnk"))
  }

  /** Balanced training-shard assignment: partition the corpus into
    * `nShards` contiguous blocks of the [[deterministicShuffle]] order,
    * sizes EXACTLY ⌊N/S⌋ or ⌈N/S⌉ — the layout a training job wants for
    * its input files (reader k streams shard k in the global shuffled
    * order with no cross-file coordination; epoch re-shards by salt).
    *
    * All integer: `shard_id = ⌊pos·S / N⌋` (monotone in pos ⇒ shards are
    * contiguous; exactly balanced by the floor-division staircase) and
    * `pos_in_shard = pos − ⌈shard_id·N / S⌉` (the shard's first global
    * position). `S·N < 2⁶³` is enforced — beyond that the product wraps.
    *
    * Shape at 100 TB: everything rides the shuffle's one range exchange;
    * the two assignment columns are narrow arithmetic over `shuffle_pos`
    * (no second shuffle, no per-shard grouping). Writing shard files is
    * then `repartitionByRange(col("shard_id"))` + partitioned write. */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int,
                  salt: String = ""): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1: $nShards")
    val n = df.count()
    require(n <= Long.MaxValue / math.max(nShards, 1),
      s"shardAssign: nShards·N overflows int64 (n=$n, nShards=$nShards)")
    val nn = math.max(n, 1L) // empty input: no rows reach the expressions
    deterministicShuffle(df, idCol, salt)
      .withColumn("shard_id", expr(s"(shuffle_pos * $nShards) div $nn"))
      .withColumn("pos_in_shard",
        expr(s"shuffle_pos - (shard_id * $nn + ${nShards - 1}) div $nShards"))
  }

  /** Deterministic interleaved mixture SCHEDULE — the data-loader order
    * for multi-source training: each weighted source is internally
    * shuffled ([[hashBucket]] order, salt = epoch), then sources are
    * stride-interleaved so that any prefix of the global order contains
    * the sources in ~weight proportion (the "sample sources by ratio"
    * loop of a trainer, made deterministic and distributed). Where
    * [[mixtureSample]] decides WHICH rows survive, this decides WHEN
    * each row is seen.
    *
    * The schedule key is `ord = (pos·10⁶) div w` (source-local position
    * stretched by inverse weight): source s occupies every (10⁶/w_s)-th
    * slot, so in any prefix of length L source s holds w_s/Σw·L ± 1
    * rows. Exact integers (pos < 9.2e12 per source before 10⁶·pos
    * wraps — enforced); ties across sources at equal ord break by
    * (group, pos) — total order, bit-deterministic. Rows of sources
    * absent from `weights` are DROPPED (schedule only what you weight).
    *
    * Shape at 100 TB: weights ride the plan as a literal when-chain (no
    * join). A per-source `row_number` WINDOW would make each source ONE
    * partition — and sources are few and huge by nature, so that's the
    * single-task sort the r10 audit flagged on the quantile paths.
    * Instead: one RANGE exchange into group-major (group, bucket, key)
    * order, partition-local contiguous indices via zipWithIndex's
    * two-phase offsets (multi-partition regardless of source count),
    * and `pos_in_source = global_idx − source_start` with the
    * source-sized start-offset table BROADCAST (the Packing
    * discipline). Consumers read in (ord, group) order or
    * range-partition on ord to write schedule shards. */
  def mixtureSchedule(df: DataFrame, groupCol: String, key: String,
                      weights: Seq[(String, Long)],
                      salt: String = ""): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"weights must be positive: $weights")
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate source in weights: $weights")
    val spark = df.sparkSession
    val wcol = weights.foldLeft(lit(null).cast("long")) {
      case (acc, (g, wt)) => when(col(groupCol) === g, lit(wt)).otherwise(acc)
    }
    val keyed = df.select(col(groupCol), col(key))
      .withColumn("_w", wcol).where(col("_w").isNotNull)
      .withColumn("_b", hashBucket(col(key), salt))
    // group-major total order; orderBy = range exchange, NOT one
    // partition per source
    val sorted = keyed.orderBy(col(groupCol), col("_b"), col(key))
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        "_gidx", org.apache.spark.sql.types.LongType, nullable = false))
    val indexed = spark.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) }, schema)
    // per-source start offset in the group-major order: exclusive prefix
    // sum over the source-sized count table. Spark itself orders the
    // groups (same ordering the range exchange used), the driver only
    // folds the prefix — no cross-engine collation assumptions.
    val counts = keyed.groupBy(groupCol).agg(count(lit(1)).as("_c"))
      .orderBy(groupCol)
      .collect().map(r => (r.get(0), r.getLong(1)))
    counts.foreach { case (g, c) =>
      require(c <= Long.MaxValue / 1000000L,
        s"mixtureSchedule: source $g has $c rows — 10⁶·pos would wrap " +
          "int64; shard the source or drop the e6 stride scale")
    }
    val offs = {
      var acc = 0L
      counts.map { case (g, c) => val s = acc; acc += c; (g, s) }
    }
    val offRows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(offs.map { case (g, s) =>
        org.apache.spark.sql.Row(g, s) }: _*)
    val offDf = spark.createDataFrame(offRows,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(groupCol,
          df.schema(groupCol).dataType),
        org.apache.spark.sql.types.StructField("_start",
          org.apache.spark.sql.types.LongType, nullable = false))))
    indexed.join(broadcast(offDf), Seq(groupCol))
      .withColumn("pos_in_source", col("_gidx") - col("_start"))
      .withColumn("ord", expr("(pos_in_source * 1000000L) div _w"))
      .select(col(groupCol), col(key), col("pos_in_source"), col("ord"))
  }

  /** DSIR-style data selection (Xie et al., "Data Selection for Language
    * Models via Importance Resampling", NeurIPS'23 — the hashed-n-gram
    * shape): score every doc in a RAW pool by how target-like its hashed
    * bigram distribution is, and keep the top `n`.
    *
    * Features are hashed bigrams (`md5(tok ⊔ tok') mod buckets` — the
    * paper's feature hashing, collisions and all); each bucket gets an
    * integer weight `tgt_ppm − raw_ppm` (occurrence rates in parts per
    * million over the target resp. raw corpus — the exact-integer
    * surrogate for the paper's log-probability ratio, the [[TextOps
    * .tokenClassifier]] discipline: ranking-faithful, bit-reproducible,
    * |w| ≤ 1e6 at any corpus size so a doc's score stays int64-safe to
    * ~9e12 grams). A doc's score is the sum of its occurrences' bucket
    * weights — repeated grams count repeatedly, exactly as the
    * importance weight multiplies per-token. Selection = top `n` by
    * (score desc, doc_id): deterministic where the paper samples with
    * Gumbel noise (swap in [[weightedSample]] over the score for the
    * sampled variant).
    *
    * Shape at 100 TB: bigrams are a NARROW zip_with projection (no
    * lead-window exchange); both corpora collapse to ≤`buckets`-row
    * count frames in one partial-agg shuffle each; the weight table is
    * buckets-sized and BROADCAST back onto the raw gram stream; per-doc
    * settle is one doc_id-keyed partial-agg shuffle; the cut is
    * TakeOrdered (never a global sort). localCheckpoint pins the two
    * bucket-count frames so the total/weight actions don't rescan the
    * corpora. */
  def dsirSelect(raw: DataFrame, target: DataFrame, n: Int,
                 buckets: Int = 4096, text: String = "text"): DataFrame = {
    require(n >= 0 && buckets >= 2, s"dsirSelect(n=$n, buckets=$buckets)")
    def grams(df: DataFrame): DataFrame = {
      val tk = TextOps.tokens(col(text))
      val n1 = greatest(size(tk) - 1, lit(0))
      // narrow bigram stream: zip the token array against its own tail
      df.select(col("doc_id"),
          explode(zip_with(slice(tk, lit(1), n1), slice(tk, lit(2), n1),
            (a, b) => concat(a, lit(" "), b))).as("_bg"))
        .select(col("doc_id"),
          pmod(TextOps.md5Long(col("_bg")), lit(buckets.toLong)).as("_bkt"))
    }
    def rates(df: DataFrame): (DataFrame, Long) = {
      val c = df.groupBy("_bkt").agg(count(lit(1)).as("_c")).localCheckpoint()
      val total = c.agg(coalesce(sum("_c"), lit(0L))).head().getLong(0)
      (c, total)
    }
    val rawGrams = grams(raw)
    val (tgtCnt, tgtN) = rates(grams(target))
    val (rawCnt, rawN) = rates(rawGrams)
    require(tgtN > 0 && rawN > 0, "dsirSelect: empty gram stream")
    val weights = tgtCnt.withColumnRenamed("_c", "_ct")
      .join(rawCnt.withColumnRenamed("_c", "_cr"), Seq("_bkt"), "full_outer")
      .select(col("_bkt"),
        expr(s"(coalesce(_ct, 0L) * 1000000L) div $tgtN" +
          s" - (coalesce(_cr, 0L) * 1000000L) div $rawN").as("_w"))
    val scored = rawGrams.join(broadcast(weights), Seq("_bkt"))
      .groupBy("doc_id")
      .agg(sum("_w").as("score"), count(lit(1)).as("n_grams"))
    // docs with < 2 tokens have no grams: present with score 0, so the
    // pool is complete and the cut is well-defined
    raw.select("doc_id").join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("score"), lit(0L)).as("score"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"))
      .orderBy(col("score").desc, col("doc_id")).limit(n)
  }
}
