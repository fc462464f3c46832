package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation: the QA loop that keeps an approximate
  * tier honest. An ANN index (IVF, LSH, PQ) trades recall for probe cost;
  * "measure, don't guess" means the pipeline itself computes recall@k of
  * the approximate ranking against the exact one on a query sample —
  * continuously, as data drifts — rather than trusting the paper's curve.
  */
object Eval {

  /** Per-query recall@k of `approx` against `exact`. Both inputs are
    * rankings shaped (qid, vid, …) with at most k rows per qid (the
    * contract every graft top-k operator meets); recall@k = |approx ∩
    * exact| / min(k, |exact_q|), reported as exact integers (n_hits, k)
    * plus the e6 fixed-point ratio — no float division to disagree on.
    * The per-query denominator matters when a query's exact ranking
    * legitimately has FEWER than k rows (pool smaller than k after
    * filters): dividing by the fixed k would cap that query's recall
    * below 1e6 even when the approximate tier returns the identical set.
    *
    * Every query appears in the output, including those the approximate
    * tier returned NOTHING for (empty probe set) — a left join from the
    * exact side's qid universe, so silent per-query failures read as
    * recall 0, not as a missing row.
    *
    * Shape at scale: rankings are answer-sized (queries × k), orders of
    * magnitude below the corpus that produced them — one (qid, vid)
    * equi-join and one qid groupBy over answer-sized inputs; AQE
    * broadcasts both. */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val hits = approx.select(col("qid"), col("vid"))
      .join(exact.select(col("qid"), col("vid")), Seq("qid", "vid"))
      .groupBy("qid").agg(count(lit(1)).as("n_hits"))
    // the exact side's per-qid count IS the qid universe frame — one agg
    // serves both the left-join spine and the denominator
    exact.groupBy("qid").agg(count(lit(1)).as("_n_exact"))
      .join(hits, Seq("qid"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .select(col("qid"), col("n_hits"), lit(k.toLong).as("k"),
        expr(s"(n_hits * 1000000) div least(${k.toLong}L, _n_exact)")
          .as("recall_e6"))
  }

  /** Depth-wise agreement of two rankings (the rank-biased-overlap
    * family's exact core): for every depth d in [1, k],
    * `n_common = |A_d ∩ B_d|` and the e6 agreement `n_common/d` — how
    * fast two scorers diverge as you read down their lists. The curve is
    * what an RBO score summarizes; emitting it exactly (integers only)
    * keeps the oracle bit-for-bit and lets callers weight depths however
    * they like.
    *
    * Both inputs are rankings shaped (doc_id, rnk) with rnk = 1..k,
    * doc_id unique per list (the contract of every graft top-k). The
    * intersection join is answer-sized; a doc on both lists enters the
    * depth histogram at d = max(rnk_a, rnk_b) — its first depth of
    * CO-presence — and the cumulative window runs over k rows. Docs on
    * one list only never contribute, including beyond-k phantoms.
    *
    * @return one row per depth: (d, n_common, agree_e6) */
  def rankingAgreement(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val firstCo = a.select(col("doc_id"), col("rnk").as("_ra"))
      .where(col("_ra") <= k)
      .join(b.select(col("doc_id"), col("rnk").as("_rb"))
        .where(col("_rb") <= k), "doc_id")
      .select(greatest(col("_ra"), col("_rb")).as("_d"))
      .groupBy("_d").agg(count(lit(1)).as("_c"))
    val spark = a.sparkSession
    val depths = spark.range(1, k + 1).select(col("id").as("d"))
    // deliberate unpartitioned window: the frame is the k-row depth grid
    // (answer-sized by construction), never corpus data — one task holds
    // k rows regardless of input size
    val w = org.apache.spark.sql.expressions.Window.orderBy("d")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    depths.join(firstCo.withColumnRenamed("_d", "d"), Seq("d"), "left")
      .withColumn("n_common", sum(coalesce(col("_c"), lit(0L))).over(w))
      .select(col("d"), col("n_common"),
        expr("(n_common * 1000000) div d").as("agree_e6"))
  }
}
