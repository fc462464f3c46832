package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-safe per-group top-k selection.
  *
  * The textbook `row_number() OVER (PARTITION BY key ORDER BY score)` puts
  * every row of a group in ONE reducer partition and sorts it — when one
  * group carries half the corpus (one dominant source/domain/language,
  * the norm in web-scale data), that stage runs at the speed of a single
  * straggler, the same failure mode [[Joins.saltedJoin]] exists for. The
  * monoid fix: top-k is associative — top-k of a union is the top-k of
  * the per-part top-ks — so select locally first, then settle globally on
  * k·salts survivors per group.
  */
object TopK {

  /** Top `k` rows per `keys` group by `order` (descending-first tuple,
    * e.g. (score desc, id asc) — pass explicit asc/desc columns). The
    * order tuple must be unique within a group (include an id column) so
    * the selection is deterministic under any partitioning.
    *
    * Two phases: a deterministic salt from `saltBy` splits each group
    * `salts` ways, a local window keeps each shard's top k (partition
    * width = group/salts), then the global window ranks only the
    * ≤ k·salts survivors per group. The second exchange moves k·salts
    * rows per group — bounded by the ANSWER size, not the group size.
    * With salts = 1 this degrades to the textbook single window.
    *
    * @param order  ordering columns, best-first (use `desc(...)`/`asc(...)`)
    * @param saltBy non-null per-row discriminator (an id column)
    * @return input rows of the winners plus their 1-based `rnk` */
  def perKeyTopK(df: DataFrame, keys: Seq[String], order: Seq[Column],
                 k: Int, saltBy: Column, salts: Int = 16): DataFrame = {
    require(k >= 1 && salts >= 1, s"need k >= 1 and salts >= 1")
    require(keys.nonEmpty && order.nonEmpty, "need keys and an order tuple")
    val salted = df.withColumn("_salt",
      pmod(TextOps.md5Long(saltBy.cast("string")), lit(salts.toLong)))
    val wLocal = Window.partitionBy((keys :+ "_salt").map(col): _*)
      .orderBy(order: _*)
    val local = salted
      .withColumn("_lr", row_number().over(wLocal))
      .where(col("_lr") <= k)
    val wGlobal = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    local
      .withColumn("rnk", row_number().over(wGlobal).cast("long"))
      .where(col("rnk") <= k)
      .drop("_salt", "_lr")
  }
}
