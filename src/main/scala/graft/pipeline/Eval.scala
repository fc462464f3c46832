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
    * exact| / k, reported as exact integers (n_hits, k) plus the e6
    * fixed-point ratio — no float division to disagree on.
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
    exact.select("qid").distinct()
      .join(hits, Seq("qid"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .select(col("qid"), col("n_hits"), lit(k.toLong).as("k"),
        expr(s"(n_hits * 1000000) div ${k.toLong}").as("recall_e6"))
  }
}
