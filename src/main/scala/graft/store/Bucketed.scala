package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Hash-bucketed, in-bucket-sorted table layout — the storage-side answer
  * to repeated equi-joins and aggregations on a stable key (doc_id,
  * vec_id, user_id). Writing both sides of a recurring join with the SAME
  * bucket count on the SAME key lets every later join/groupBy on that key
  * run with ZERO exchanges: each task reads matching bucket files from
  * both tables and (with `sortBy`) merge-joins them without even a sort.
  * At 100 TB this converts the single most expensive recurring shuffle —
  * corpus re-keyed per pipeline stage — into a one-time layout cost,
  * exactly the `interval=`-partition discipline the warehouse applies to
  * time, applied to hash keys.
  *
  * Spark only persists bucket metadata through the catalog (plain
  * `.parquet(path)` writes lose it), so tables register under a name with
  * an explicit data `path`; an in-memory catalog (this project's default)
  * keeps the registration session-scoped while the files persist.
  */
object Bucketed {

  /** Write `df` bucketed by `key` into `buckets` files per partition and
    * register it as catalog table `name` at `path`. In-bucket `sortBy` on
    * the same key makes later merge-joins sort-free too. */
  def write(df: DataFrame, name: String, path: String, key: String,
            buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(name)

  /** The registered bucketed table (scan carries the bucket spec —
    * `select * from name` in SQL loses nothing, this is a convenience). */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)

  /** Drop the catalog registration (files at `path` survive). */
  def drop(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $name")
}
