package graft.store

import graft.pipeline.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted text index — the warehouse `interval=` discipline
  * applied to keyword search: postings and dictionary live as
  * `bucket=`-partitioned parquet (bucket = 60-bit token hash mod
  * `buckets`), so a query probes ONLY its terms' buckets through a
  * LITERAL partition filter (statically pruned, plan-asserted in
  * PlanAudit) instead of scanning the corpus the way the on-the-fly
  * q65 scorer must. Build once per corpus snapshot; at 100 TB the
  * postings build is one (doc, token) partial-agg shuffle + a
  * partitioned write, and every later query touches
  * `|query terms| / buckets` of the index bytes.
  *
  * Search semantics are EXACTLY [[TextOps.searchTopK]] (same integer
  * `(N·10⁶) div df` idf, same tf·idf sum, same (score desc, doc_id)
  * top-k) — spec-pinned bit-equal, so the q65 oracle SQL is also this
  * tier's oracle. df is precomputed at build time (corpus stats are
  * static per snapshot), shipped in the bucket-partitioned `dict`
  * table; `n_docs` rides meta.json and enters the plan as a literal. */
object TextIndex {

  final case class Handle(path: String, nDocs: Long, buckets: Int)

  /** Driver-side replica of [[TextOps.md5Long]] for bucket routing. */
  def md5Long60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.take(15), 16)
  }

  def write(docs: DataFrame, path: String, buckets: Int = 64,
            text: String = "text"): Handle = {
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    val tf = docs
      .select(col("doc_id"), explode(TextOps.tokens(col(text))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .withColumn("bucket",
        pmod(TextOps.md5Long(col("token")), lit(buckets.toLong)))
    tf.write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/postings")
    // df = docs-per-token over the postings just written (re-read: the
    // written files are the one materialization; no second corpus scan)
    val spark = docs.sparkSession
    spark.read.parquet(s"$path/postings")
      .groupBy("bucket", "token").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/dict")
    val nDocs = docs.count()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "text_index.json"),
      s"""{"n_docs":$nDocs,"buckets":$buckets}""")
    Handle(path, nDocs, buckets)
  }

  def open(path: String): Handle = {
    val s = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "text_index.json")), "UTF-8")
    def field(k: String): Long =
      s.split(s""""$k":""")(1).takeWhile(c => c.isDigit || c == '-').toLong
    Handle(path, field("n_docs"), field("buckets").toInt)
  }

  /** Top-k docs for a term bag — [[TextOps.searchTopK]] over the index.
    * Both scans carry the literal `bucket IN (...)` partition filter of
    * the query's own buckets plus the term filter; everything after is
    * query-term-sized. */
  def searchTopK(spark: SparkSession, h: Handle, query: Seq[String],
                 k: Int): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    require(k >= 1, s"k must be >= 1, got $k")
    val bs = query.map(t => md5Long60(t) % h.buckets).distinct
    val post = spark.read.parquet(s"${h.path}/postings")
      .where(col("bucket").isin(bs: _*) &&
        col("token").isInCollection(query))
    val idf = spark.read.parquet(s"${h.path}/dict")
      .where(col("bucket").isin(bs: _*) &&
        col("token").isInCollection(query))
      .select(col("token"),
        expr(s"(${h.nDocs}L * 1000000L) div df").as("idf_scaled"))
    post.join(broadcast(idf), "token")
      .groupBy("doc_id").agg(sum(col("tf") * col("idf_scaled")).as("score"))
      .orderBy(desc("score"), asc("doc_id")).limit(k)
  }
}
