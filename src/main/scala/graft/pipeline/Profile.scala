package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling: the per-column summary every ingestion pipeline runs
  * before trusting a new drop — row/null/distinct counts and min/max —
  * for MANY columns in ONE corpus scan.
  *
  * The naive form (one aggregate job per column, or count(distinct c1),
  * count(distinct c2), … in one SELECT) either rescans the table per
  * column or plans one Expand row per distinct-aggregate — at 100 TB both
  * are the difference between one pass and ten. Here the table is melted
  * once with `stack` (a narrow projection: one output row per
  * column×input-row, no shuffle), grouped on (column, value) — the only
  * corpus-sized exchange, partial-aggregated map-side to the per-column
  * value histograms — and rolled up to one row per column.
  */
object Profile {

  /** Profile exact-integer columns and string columns of `df` in one
    * pass. Integer columns must cast to BIGINT losslessly (ids, flags,
    * small ints — doubles are out of scope: their min/max would need a
    * cross-engine float rendering). Distinct counts and null counts are
    * exact; min/max are typed (long columns numeric, string columns
    * binary-collation lexicographic).
    *
    * @return one row per profiled column: (column, n, n_null,
    *         n_distinct, min_long, max_long, min_str, max_str) —
    *         the non-applicable class's min/max are null */
  def profile(df: DataFrame, longCols: Seq[String],
              stringCols: Seq[String]): DataFrame = {
    require(longCols.nonEmpty || stringCols.nonEmpty, "nothing to profile")
    val arms =
      longCols.map(c =>
        s"'$c', named_struct('lv', CAST(`$c` AS BIGINT), 'sv', CAST(NULL AS STRING))") ++
      stringCols.map(c =>
        s"'$c', named_struct('lv', CAST(NULL AS BIGINT), 'sv', CAST(`$c` AS STRING))")
    val melted = df
      .selectExpr(s"stack(${arms.size}, ${arms.mkString(", ")}) AS (col_name, v)")
      .select(col("col_name"), col("v.lv").as("lv"), col("v.sv").as("sv"))
      .withColumn("vk", coalesce(col("sv"), col("lv").cast("string")))
    melted
      .groupBy("col_name", "lv", "sv", "vk")
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("col_name").as("column"))
      .agg(
        sum("cnt").as("n"),
        sum(when(col("vk").isNull, col("cnt")).otherwise(0L)).as("n_null"),
        count(col("vk")).as("n_distinct"),
        min("lv").as("min_long"), max("lv").as("max_long"),
        min("sv").as("min_str"), max("sv").as("max_str"))
  }

  /** Global cumulative counts over a value histogram WITHOUT an
    * unpartitioned window (`Window.orderBy(v)` with no partitionBy moves
    * the WHOLE histogram to one task — fine on bounded domains, a
    * scale-killer on high-cardinality columns). The Packing discipline:
    * range cut points sampled ONCE from the pre-aggregation value stream
    * (fixed per-partition seeds) and baked into the plan as literals, so
    * every histogram row's bucket is a pure function of its value;
    * per-bucket totals collect to a ≤`buckets`-row driver table whose
    * exclusive prefix broadcasts back; the cumulative window then runs
    * PARTITIONED by bucket (partition width = one range's distinct
    * values, balanced by the sampled cuts).
    *
    * @param sample frame whose `vCol` supplies the cut-point sample (the
    *               pre-groupBy corpus values — sampling the histogram
    *               would recompute its shuffle for the sample job)
    * @param hist   (vCol, cCol) distinct-value histogram
    * @return (hist + `_qb` bucket + `_qcum` inclusive global cum,
    *         per-bucket (id, exclusiveOffset, total) sorted by id, n) */
  private def bucketedCum(sample: DataFrame, hist: DataFrame, vCol: String,
                          cCol: String, buckets: Int)
      : (DataFrame, IndexedSeq[(Int, Long, Long)], Long) = {
    val spark = hist.sparkSession
    val b =
      if (buckets > 0) buckets
      else spark.sessionState.conf.numShufflePartitions
    val bounds = Packing.sampleBoundaries(sample, vCol, b)
    val bucket = Packing.bucketOf(col(vCol), bounds)
    val totals = hist.groupBy(bucket.as("_qb")).agg(sum(cCol).as("_qt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offs: IndexedSeq[(Int, Long, Long)] = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _).zip(totals.map(_._2)))
      .map { case (id, (off, t)) => (id, off, t) }.toIndexedSeq
    val n = totals.map(_._2).sum
    import spark.implicits._
    val offDf = offs.map { case (id, off, _) => (id, off) }.toDF("_qb", "_qoff")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_qb").orderBy(vCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = hist.withColumn("_qb", bucket)
      .join(broadcast(offDf), "_qb")
      .withColumn("_qcum", col("_qoff") + sum(cCol).over(w))
      .drop("_qoff")
    (cum, offs, n)
  }

  /** Equal-frequency (quantile) discretization of an integer column into
    * `k` buckets — the featurization step between profiling and model
    * input. Bucket boundaries are the k-quantiles under q54's integer
    * selection rule (`b_j` = smallest v with `k·cum ≥ n·j`), and a row's
    * bucket is the count of boundaries STRICTLY below its value — exact
    * integer arithmetic end to end, no percent_rank/ntile tie
    * nondeterminism.
    *
    * Shape at scale: one (value)-keyed groupBy with map-side combine
    * builds the distinct-value histogram (the only corpus-sized
    * exchange); cumulative ranks come from [[bucketedCum]] — range
    * buckets from literal sampled cut points, so NO unpartitioned window
    * anywhere even on a high-cardinality column — and the boundary probe
    * touches only the ≤k−1 buckets the driver-side offsets prove contain
    * a target rank; the k−1 boundaries are collected (k-row driver table,
    * the q42 literal discipline) and baked into the plan as a when-chain,
    * so the assignment pass is a NARROW projection — no join, no second
    * shuffle, deterministic under recomputation and retry.
    *
    * @param buckets range-bucket count for the histogram cum (0 = the
    *                session's shuffle partitions)
    * @return df's id and value columns plus `bin` in [0, k) */
  def quantileBins(df: DataFrame, valueCol: String, k: Int,
                   idCol: String = "doc_id", buckets: Int = 0): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    // NULLs are excluded from the distribution (quantile semantics; a
    // null histogram group would sort first and skew every boundary) and
    // get a NULL bin in the output rather than silently landing in bin 0
    val nonNull = df.where(col(valueCol).isNotNull)
      .select(col(valueCol).cast("long").as("v"))
    val hist = nonNull.groupBy("v").agg(count(lit(1)).as("c"))
    // n comes off the driver-side bucket totals — never a second corpus
    // scan just for count(*)
    val (cum, offs, n) = bucketedCum(nonNull, hist, "v", "c", buckets)
    val bounds: Seq[Long] =
      if (n == 0L) Seq.empty
      else {
        // target rank per boundary: k·cum ≥ n·j  ⟺  cum ≥ ⌈n·j/k⌉; the
        // owning bucket is known from the driver-side offsets, so the
        // probe scan filters to boundary buckets before the window runs
        val targets = (1 until k).map { j =>
          val r = (n * j + k - 1) / k
          val (qb, _, _) = offs.find { case (_, off, t) => off < r && r <= off + t }
            .getOrElse(offs.last)
          (j, r, qb)
        }
        val spark = df.sparkSession
        import spark.implicits._
        val tDf = targets.toDF("_j", "_r", "_qb")
        cum.where(col("_qb").isInCollection(targets.map(_._3).distinct))
          .join(broadcast(tDf), "_qb")
          .where(col("_qcum") >= col("_r"))
          .groupBy("_j").agg(min("v").as("bv"))
          .collect().map(_.getAs[Long]("bv")).toSeq.sorted
      }
    val bin = bounds.map(b =>
        when(col(valueCol).cast("long") > lit(b), 1L).otherwise(0L))
      .reduceOption(_ + _).getOrElse(lit(0L))
    df.select(col(idCol), col(valueCol),
      when(col(valueCol).isNull, lit(null).cast("long"))
        .otherwise(bin).as("bin"))
  }

  /** Per-group outlier flagging by EXACT order statistics: rows whose
    * value exceeds their group's p-th percentile (p = pNum/pDen), with the
    * percentile chosen by q54's integer selection rule — threshold(g) =
    * smallest v in g with `pDen·cum(v) >= n(g)·pNum`. No float aggregation
    * anywhere (mean/stddev z-scores disagree across engines on summation
    * order; a rank threshold is a pure ORDER property of the input doubles,
    * bit-reproducible on both sides of the oracle), and robust to the
    * heavy tails that make ±kσ useless on real telemetry.
    *
    * Shape at scale: one (group, value)-keyed groupBy with map-side
    * combine builds the per-group value histogram — the only corpus-sized
    * exchange; the cumulative window runs over the HISTOGRAM (partition
    * width = a group's distinct values, never its row count); thresholds
    * (one row per group) broadcast back onto the corpus scan, so the
    * flagging pass is a narrow join+filter. NULL values are excluded from
    * the distribution and never flagged (q100's rule).
    *
    * @return the input rows strictly above threshold, plus `thr` */
  def orderStatOutliers(df: DataFrame, groupCols: Seq[String],
                        valueCol: String, pNum: Int, pDen: Int): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(pNum > 0 && pDen > 0 && pNum < pDen,
      s"percentile must be in (0, 1): $pNum/$pDen")
    val gs = groupCols.map(col)
    val hist = df.where(col(valueCol).isNotNull)
      .groupBy(gs :+ col(valueCol).as("_v"): _*)
      .agg(count(lit(1)).as("_c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gs: _*).orderBy("_v")
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(gs: _*)
    val thr = hist
      .withColumn("_cum", sum("_c").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .withColumn("_n", sum("_c").over(wg))
      .where(col("_cum") * pDen >= col("_n") * pNum)
      .groupBy(gs: _*).agg(min("_v").as("thr"))
    df.join(broadcast(thr), groupCols)
      .where(col(valueCol) > col("thr"))
  }

  /** Declarative data-quality validation (the dbt-test / expectations
    * pattern): evaluate many row-level checks over a table in ONE scan
    * and return a per-check report — (check, n_rows, n_fail, pass).
    * A check is any boolean Column; NULL verdicts count as FAILURES
    * (an expectation that cannot be evaluated is not met — the
    * three-valued-logic trap where `col > 0` silently passes nulls).
    *
    * One narrow projection evaluates every check per row, then a single
    * partial-aggregated global sum — no scan-per-check, no shuffle wider
    * than one row per check. Cross-table checks (FK containment,
    * uniqueness) are their own aggregates; see [[checkUnique]] /
    * [[checkSubset]], which return rows of the same report shape to
    * union with. */
  def validate(df: DataFrame, checks: Seq[(String, org.apache.spark.sql.Column)])
      : DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    // names are spliced into the stack() SQL as literals — keep them in
    // an identifier-ish alphabet so a quote can't break the expression
    checks.foreach { case (n, _) =>
      require(n.matches("[A-Za-z0-9_. -]+"),
        s"check name must match [A-Za-z0-9_. -]+: '$n'")
    }
    // the failure sums are coalesced: on an EMPTY table sum() over zero
    // rows is NULL, which would report pass = NULL (neither true nor
    // false) and break any downstream `where(!pass)` gating — an empty
    // table has zero failures and passes every row-level check
    val agg = checks.zipWithIndex.flatMap { case ((_, c), i) =>
      Seq(count(lit(1)).as(s"_n$i"),
        coalesce(sum(when(coalesce(c, lit(false)), 0L).otherwise(1L)),
          lit(0L)).as(s"_f$i"))
    }
    val one = df.agg(agg.head, agg.tail: _*)
    val arms = checks.zipWithIndex.map { case ((name, _), i) =>
      s"'$name', _n$i, _f$i"
    }.mkString(", ")
    one.selectExpr(s"stack(${checks.size}, $arms) AS (check_name, n_rows, n_fail)")
      .withColumn("pass", col("n_fail") === 0L)
  }

  /** Functional-dependency audit as a report row (the "does A determine
    * B" question behind schema inference, key discovery and silent-
    * denormalization drift): n_rows = distinct determinant keys,
    * n_fail = keys mapping to MORE than one distinct `depCol` value.
    * NULL dependent values don't count as a second value (a key whose
    * only images are NULL is vacuously consistent — audit nullability
    * with [[validate]]). Shape: one (det-keys) partial-agg groupBy —
    * the exchange carries one row per distinct key — then a scalar
    * fold; nothing corpus-sized moves twice. */
  def checkFunctionalDep(df: DataFrame, detCols: Seq[String],
                         depCol: String, name: String): DataFrame =
    df.groupBy(detCols.map(col): _*)
      .agg(countDistinct(col(depCol)).as("_d"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("_d") > 1L, 1L).otherwise(0L)).as("n_fail"))
      .select(lit(name).as("check_name"), col("n_rows"), col("n_fail"),
        (col("n_fail") === 0L).as("pass"))

  /** Exact percentile-rank normalization (the calibration step that
    * turns raw per-group scores into comparable [0, 1] features):
    * `pct_e6 = (count-strictly-below · 10⁶) div (n − 1)` within the
    * row's group — the integer rendering of SQL `percent_rank()`, with
    * ties sharing the rank of their first element and single-row groups
    * pinned to 0. No float aggregation, no corpus-wide window.
    *
    * Shape at scale: one (group, value) partial-agg groupBy builds the
    * histogram; the rank window runs over the HISTOGRAM (partition
    * width = a group's distinct values — bounded for the quantized/
    * integer domains this contract shares with [[quantileBins]]); the
    * per-(group, value) rank table broadcasts back onto the corpus, so
    * the normalization pass is a narrow join. NULL values pass through
    * with a NULL pct (q100's rule).
    *
    * @return df's columns plus `pct_e6` */
  def rankNormalize(df: DataFrame, valueCol: String,
                    groupCols: Seq[String]): DataFrame = {
    val gs = groupCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gs: _*).orderBy("_v")
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(gs: _*)
    val ranks = df.where(col(valueCol).isNotNull)
      .groupBy(gs :+ col(valueCol).cast("long").as("_v"): _*)
      .agg(count(lit(1)).as("_c"))
      .withColumn("_cum", sum("_c").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .withColumn("_n", sum("_c").over(wg))
      .withColumn("pct_e6",
        when(col("_n") <= 1L, lit(0L))
          .otherwise(expr("((_cum - _c) * 1000000) div (_n - 1)")))
      .select(gs :+ col("_v") :+ col("pct_e6"): _*)
    df.withColumn("_v", col(valueCol).cast("long"))
      .join(broadcast(ranks), groupCols :+ "_v", "left")
      .drop("_v")
  }

  /** Cross-source quantile normalization (the batch-effect fix: one
    * source's "long" must mean the same as another's): each row's value
    * maps to the POOLED distribution's value at the row's within-source
    * percentile — sources with shifted or stretched distributions land
    * on one comparable scale. Classic quantile normalization, exact:
    * within-source rank via [[rankNormalize]], percentile coarsened to
    * the per-mille grid `g = pct_e6 div 1000`, and the pooled inverse
    * CDF evaluated at each grid point by q54's integer selection rule —
    * `Q(g) = smallest v with 10³·cum ≥ n·g` (g = 0 maps to the pooled
    * minimum).
    *
    * Shape at scale: the two histograms (per-source, pooled) are
    * domain-sized partial-agg exchanges off the SAME scan lineage; the
    * pooled cum comes from [[bucketedCum]] (range-bucketed windows, no
    * unpartitioned window on a high-cardinality column), and the 1001-row
    * inverse-CDF table is emitted by OWNERSHIP — each histogram row
    * generates exactly the grid points whose target rank falls in its
    * (cum−c, cum] slice, so exactly 1001 rows leave the scan with no
    * histogram × grid blow-up — then BROADCASTS back; the final mapping
    * pass is a narrow join. NULL values pass through with NULL pct and
    * mapped value.
    *
    * @param buckets range-bucket count for the histogram cum (0 = the
    *                session's shuffle partitions)
    * @return df's columns plus (pct_e6, pct_mille, mapped) */
  def quantileMap(df: DataFrame, valueCol: String,
                  groupCol: String, buckets: Int = 0): DataFrame = {
    val pct = rankNormalize(df, valueCol, Seq(groupCol))
    val nonNull = df.where(col(valueCol).isNotNull)
      .select(col(valueCol).cast("long").as("_v"))
    val hist = nonNull.groupBy("_v").agg(count(lit(1)).as("_c"))
    val (cum, _, n) = bucketedCum(nonNull, hist, "_v", "_c", buckets)
    // Q(g) = smallest _v with 10³·cum ≥ n·g. The smallest qualifying row
    // has 10³·(cum−c) < n·g ≤ 10³·cum, i.e. row (cum, c) OWNS exactly the
    // integer grid points in ((10³·(cum−c)) div n, (10³·cum) div n] —
    // disjoint slices covering (0, 1000], plus g = 0 on the first row
    // (the pooled minimum). Exactly 1001 rows emerge; nothing grid-sized
    // ever multiplies against the histogram. All terms ≤ 10³·n < 2⁶³.
    // named pct_mille, not a bare single letter, so the appended column
    // cannot shadow a caller's own grouping column
    val invCdf =
      if (n == 0L)
        cum.sparkSession.emptyDataFrame
          .select(lit(0L).as("pct_mille"), lit(0L).as("mapped"))
          .where(lit(false))
      else
        cum.withColumn("_prev", col("_qcum") - col("_c"))
          .withColumn("_glo",
            when(col("_prev") === 0L, lit(0L))
              .otherwise(expr(s"((_prev * 1000) div ${n}L) + 1")))
          .withColumn("_ghi", expr(s"(_qcum * 1000) div ${n}L"))
          .where(col("_ghi") >= col("_glo"))
          .select(explode(sequence(col("_glo"), col("_ghi"))).as("pct_mille"),
            col("_v").as("mapped"))
    pct
      .withColumn("pct_mille", expr("pct_e6 div 1000"))
      .join(broadcast(invCdf), Seq("pct_mille"), "left")
  }

  /** Categorical mix drift (the data-drift monitor for a label/type
    * column): per day, the L1 distance between that day's category
    * distribution and the whole-corpus distribution, plus the most
    * drifted category — "did the event mix change?" answered in EXACT
    * integers. The common-denominator trick keeps it rational: with
    * n_dt = day×category count, N_d = day total, n_t = global category
    * count, N = grand total,
    * `l1_e6 = (Σ_t |n_dt·N − n_t·N_d|) · 10⁶ div (N_d·N)` — every term
    * shares the denominator N_d·N, so the sum is exact (per-term float
    * shares would not add reproducibly). Days missing a category count
    * it at n_dt = 0, as they must.
    *
    * Shape at scale: the four marginals ((day, t), (day), (t), ()) come
    * out of ONE logical `cube` (Expand ×4, map-side combined). The
    * physical plan still replants the cube lineage once per split-out
    * marginal — the `grouping_id` filter pushes below the exchange, so
    * the four exchanges differ and cannot reuse (plan-read, the q47
    * trade): four narrow two-column scans, which a caller-side
    * `persist` of the input collapses to one; the windowed alternative
    * cannot see day-absent categories, whose deviation the L1 needs.
    * The day×category grid completes via a grid-sized cross join of the
    * tiny marginal frames. Headroom: N_d·N·10⁶ < 2^63 → N_d·N < 9·10¹²
    * — shard the day dimension (the natural partition) long before
    * that binds.
    *
    * @return per day: (day, n_day, l1_e6, top_type, top_dev_e6) */
  def mixDrift(df: DataFrame, typeCol: String, timeCol: String,
               dayNs: Long = 86400000000000L): DataFrame = {
    val cube = df
      .select(expr(s"$timeCol div ${dayNs}L").as("day"),
        col(typeCol).as("_t"))
      .cube(col("day"), col("_t"))
      .agg(count(lit(1)).as("_c"), grouping_id().as("_gid"))
    val dt = cube.where(col("_gid") === 0)
      .select(col("day"), col("_t"), col("_c").as("_ndt"))
    val days = cube.where(col("_gid") === 1)
      .select(col("day"), col("_c").as("_nd"))
    val types = cube.where(col("_gid") === 2)
      .select(col("_t"), col("_c").as("_nt"))
      .crossJoin(broadcast(cube.where(col("_gid") === 3)
        .select(col("_c").as("_n"))))
    // NULL-safe category match (<=>): a genuine NULL category is a real
    // value in both the day×type counts and the type marginal — a
    // null-unsafe USING join would score a day's NULL-category count as
    // n_dt = 0 (overstating that day's L1) while the NULL mass still
    // inflates N_d and N. The dt side is renamed first: all three frames
    // share the cube lineage, and df("col") disambiguation on a derived
    // self-join trips DetectAmbiguousSelfJoin.
    val dtR = dt.select(col("day").as("_dt_day"), col("_t").as("_dt_t"),
      col("_ndt"))
    val grid = days.crossJoin(broadcast(types))
      .join(dtR, col("day") <=> col("_dt_day") && col("_t") <=> col("_dt_t"),
        "left")
      .drop("_dt_day", "_dt_t")
      .withColumn("_c", coalesce(col("_ndt"), lit(0L)))
      .withColumn("_dev", abs(col("_c") * col("_n") - col("_nt") * col("_nd")))
    grid.groupBy("day")
      .agg(min("_nd").as("n_day"),
        expr("(sum(_dev) * 1000000) div (min(_nd) * min(_n))").as("l1_e6"),
        max_by(col("_t"), struct(col("_dev"), col("_t"))).as("top_type"),
        expr("(max_by(_dev, struct(_dev, _t)) * 1000000)" +
          " div (min(_nd) * min(_n))").as("top_dev_e6"))
  }

  /** Uniqueness check as a report row: `name, n_rows, n_fail, pass`
    * where n_fail counts the rows BEYOND the first of each duplicated
    * key (n − distinct). One map-side-combined keyed count. */
  def checkUnique(df: DataFrame, name: String, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_c"))
      .agg(sum("_c").as("n_rows"), (sum("_c") - count(lit(1))).as("n_fail"))
      .select(lit(name).as("check_name"), col("n_rows"), col("n_fail"),
        (col("n_fail") === 0L).as("pass"))

  /** Referential-integrity check as a report row: n_fail = child rows
    * whose key is absent from the parent's key set (NULL child keys
    * fail — an unresolvable reference is a violation here; model
    * optional references with an explicit filter). Left-anti join
    * against the parent's distinct keys — AQE broadcasts the dim-sized
    * side. */
  def checkSubset(child: DataFrame, childKey: String,
                  parent: DataFrame, parentKey: String,
                  name: String): DataFrame = {
    val parents = parent.select(col(parentKey).as(childKey)).distinct()
    val bad = child.select(childKey).join(parents, Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_fail"))
    child.agg(count(lit(1)).as("n_rows")).crossJoin(bad)
      .select(lit(name).as("check_name"), col("n_rows"), col("n_fail"),
        (col("n_fail") === 0L).as("pass"))
  }
}
