package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog compaction shapes — the warehouse-maintenance half of a
  * training-data pipeline: event streams arrive as append-only logs, but
  * downstream consumers want either "the current row per key" (CDC
  * latest-record merge, SCD type-1) or "the validity history per key"
  * (SCD type-2 intervals). Both are one-pass distributed shapes; neither
  * needs a mutable table format.
  */
object Cdc {

  /** Latest-record compaction: ONE surviving row per key — the row with the
    * lexicographically greatest `order` tuple. The order tuple must be
    * unique within a key (pass a log-sequence/event-id column last) or the
    * survivor is undefined; with a unique tuple the result is deterministic
    * under any partitioning.
    *
    * Scale shape: `max_by(struct(cols), struct(order))` is an ordinary
    * aggregate, so it PARTIALLY aggregates map-side — each task reduces its
    * slice to one candidate row per key before the exchange, and the one
    * shuffle moves at most (#keys × #tasks) rows regardless of how many
    * updates each key accumulated. The window-function formulation
    * (`row_number() = 1`) would shuffle the ENTIRE changelog and sort each
    * partition; on a 100 TB log of hot keys that is the difference between
    * a combiner-sized exchange and a full-log sort.
    */
  def latestByKey(df: DataFrame, keys: Seq[String], order: Seq[String]): DataFrame = {
    require(keys.nonEmpty && order.nonEmpty, "need keys and an order tuple")
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    val ord = struct(order.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, ord).as("_r"))
      .select(col("_r.*"))
  }

  /** Snapshot diff — dataset versioning's primitive: classify every key
    * across two snapshots as `added` (new only), `removed` (old only),
    * `changed` (both, different content) or `same` (null-safe content
    * compare). One full-outer equi-join = one shuffle per side on the
    * key; at scale, co-locate both snapshots with [[graft.store.Bucketed]]
    * on the key and the join runs exchange-free.
    *
    * @param content the column compared for change detection (precompute
    *                a content hash column for wide rows)
    * @return keys…, old_<content>, new_<content>, status */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   content: String): DataFrame = {
    require(keys.nonEmpty, "need join keys")
    val o = oldDf.select(keys.map(col) :+ col(content).as(s"old_$content"): _*)
      .withColumn("_in_old", lit(true))
    val n = newDf.select(keys.map(col) :+ col(content).as(s"new_$content"): _*)
      .withColumn("_in_new", lit(true))
    o.join(n, keys, "full_outer")
      .withColumn("status",
        when(col("_in_old").isNull, "added")
          .when(col("_in_new").isNull, "removed")
          .when(col(s"old_$content") <=> col(s"new_$content"), "same")
          .otherwise("changed"))
      .drop("_in_old", "_in_new")
  }

  /** SCD type-2 history: every change row becomes a validity interval
    * `[valid_from, valid_to)`, with `valid_to` NULL on each key's current
    * row. One per-key lead window — a single keyed shuffle whose partition
    * width is one key's history (bounded by update rate, not corpus size).
    * `order` columns must be unique per key, as in [[latestByKey]].
    */
  def scd2(df: DataFrame, keys: Seq[String], order: Seq[String],
           validFrom: String): DataFrame = {
    require(keys.nonEmpty && order.nonEmpty, "need keys and an order tuple")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order.map(col): _*)
    df.withColumn("valid_from", col(validFrom))
      .withColumn("valid_to", lead(col(validFrom), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Deletion-propagation impact for one table: how many of `df`'s rows
    * reference a subject key — the per-table row of a right-to-be-
    * forgotten audit (run the report BEFORE the destructive pass; the
    * counts are the evidence trail). One scan, one scalar fold; the
    * subject key set is broadcast (deletion lists are small by nature).
    * NULL keys never match — an unowned row is not deletable by subject.
    *
    * @param subjects single-column frame of subject keys
    * @return one report row: (table_name, n_rows, n_delete) */
  def deletionImpact(df: DataFrame, keyCol: String, subjects: DataFrame,
                     name: String): DataFrame = {
    val subj = broadcast(subjects
      .select(col(subjects.columns.head).as("_k")).distinct()
      .withColumn("_hit", lit(1L)))
    df.select(col(keyCol).as("_k"))
      .join(subj, Seq("_k"), "left")
      .agg(count(lit(1)).as("n_rows"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_delete"))
      .select(lit(name).as("table_name"), col("n_rows"), col("n_delete"))
  }

  /** The cascade step: keys of `df` rows owned by a subject — e.g.
    * order ids of deleted customers, which then drive the lineitem
    * impact. Broadcast semi-join, distinct projection of `outCol`. */
  def impactedKeys(df: DataFrame, matchCol: String, subjects: DataFrame,
                   outCol: String): DataFrame = {
    val subj = broadcast(subjects
      .select(col(subjects.columns.head).as(matchCol)).distinct())
    df.join(subj, Seq(matchCol), "left_semi").select(outCol).distinct()
  }
}
