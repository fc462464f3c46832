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
}
