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

  private def postingsOf(docs: DataFrame, buckets: Int,
                         text: String): DataFrame =
    docs
      .select(col("doc_id"), explode(TextOps.tokens(col(text))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .withColumn("bucket",
        pmod(TextOps.md5Long(col("token")), lit(buckets.toLong)))

  def write(docs: DataFrame, path: String, buckets: Int = 64,
            text: String = "text"): Handle = {
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    val tf = postingsOf(docs, buckets, text)
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
    // heal an interrupted append's dict swap (crash between delete and
    // rename leaves only dict.next — the Warehouse compact discipline)
    val dict = new java.io.File(path, "dict")
    val next = new java.io.File(path, "dict.next")
    if (!dict.exists && next.exists) next.renameTo(dict)
    Handle(path, field("n_docs"), field("buckets").toInt)
  }

  /** Incremental maintenance: index a batch of NEW documents into an
    * existing index — postings APPEND into the same `bucket=` layout
    * (file-level append, no rewrite of existing postings), the
    * vocabulary-sized dict is merged (`df` sums) and swapped in
    * write-next/delete/rename order, and `n_docs` bumps in meta. A
    * crash between delete and rename leaves `dict.next` only;
    * [[open]] heals it (spec-pinned). The doc_ids MUST be new — this
    * is append, not upsert; re-adding an id double-counts it exactly
    * as appending the same rows twice to any log would.
    *
    * Search results after append are BIT-EQUAL to a fresh [[write]] of
    * the union corpus (spec-pinned): postings/df/n_docs are all
    * additive. At 100 TB this is the point — the nightly crawl delta
    * indexes in time ∝ delta, never corpus. */
  def append(newDocs: DataFrame, h: Handle,
             text: String = "text"): Handle = {
    val spark = newDocs.sparkSession
    val tf = postingsOf(newDocs, h.buckets, text)
    tf.write.mode("append").partitionBy("bucket")
      .parquet(s"${h.path}/postings")
    val add = tf.groupBy("bucket", "token").agg(count(lit(1)).as("df"))
    val merged = spark.read.parquet(s"${h.path}/dict")
      .select("bucket", "token", "df").unionByName(add)
      .groupBy("bucket", "token").agg(sum("df").as("df"))
    merged.write.mode("overwrite").partitionBy("bucket")
      .parquet(s"${h.path}/dict.next")
    val conf = spark.sparkContext.hadoopConfiguration
    val dictP = new org.apache.hadoop.fs.Path(s"${h.path}/dict")
    val nextP = new org.apache.hadoop.fs.Path(s"${h.path}/dict.next")
    val fs = dictP.getFileSystem(conf)
    fs.delete(dictP, true)
    fs.rename(nextP, dictP)
    val n = h.nDocs + newDocs.count()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(h.path, "text_index.json"),
      s"""{"n_docs":$n,"buckets":${h.buckets}}""")
    Handle(h.path, n, h.buckets)
  }

  /** The POSITIONAL tier: per-occurrence postings (bucket, token,
    * doc_id, pos) alongside the tf index — what indexed PHRASE search
    * needs. One row per token occurrence (corpus-token-sized; the
    * documented cost of positional retrieval — build it only when
    * phrase/proximity queries matter). Same bucket routing, so a
    * phrase probes only its terms' buckets. */
  def writePositional(docs: DataFrame, h: Handle,
                      text: String = "text"): Unit =
    docs
      .select(col("doc_id"),
        posexplode(TextOps.tokens(col(text))).as(Seq("pos", "token")))
      .withColumn("bucket",
        pmod(TextOps.md5Long(col("token")), lit(h.buckets.toLong)))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"${h.path}/positions")

  /** Exact phrase search over the positional tier — [[TextOps
    * .phraseSearch]] semantics (consecutive tokens, overlapping matches
    * counted) with the corpus never scanned: every phrase term's
    * postings come from its bucket partition (literal bucket IN
    * filter), then the |phrase|−1 equi-join chain on (doc_id, pos − i)
    * runs over term-sized frames. */
  def phraseSearch(spark: SparkSession, h: Handle,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "phrase needs at least two tokens")
    val bs = phrase.map(t => md5Long60(t) % h.buckets).distinct
    val post = spark.read.parquet(s"${h.path}/positions")
      .where(col("bucket").isin(bs: _*) &&
        col("token").isInCollection(phrase.distinct))
    val anchor = post.where(col("token") === phrase.head)
      .select(col("doc_id"), col("pos"))
    phrase.zipWithIndex.tail
      .foldLeft(anchor) { case (acc, (t, i)) =>
        acc.join(
          post.where(col("token") === t)
            .select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
      }
      .groupBy("doc_id").agg(count(lit(1)).as("n_matches"))
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
