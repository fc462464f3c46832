package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization/statistics, quality scoring, language identification,
  * SimHash document fingerprints, winnowing-style min-fingerprints.
  *
  * Everything is pure narrow column expressions (no shuffle except final
  * aggregations callers add) — at 100 TB these run map-side at scan speed
  * inside whole-stage codegen.
  *
  * Determinism contract: every hash is derived from md5 hex (first 15 hex
  * chars = 60 bits), so the DuckDB oracle can reproduce values bit-exactly
  * (`('0x' || substr(md5(s),1,15))::BIGINT`).
  */
object TextOps {

  /** 60-bit deterministic token hash from md5 (parity with DuckDB oracle). */
  /** Repartition compact per-doc rows to the session's configured shuffle
    * parallelism BEFORE a token explode whose consumer needs a doc_id
    * distribution anyway (lead/lag windows, per-doc aggregates): the
    * downstream exchange moves EARLIER and carries text bytes instead of
    * exploded token rows (4-5x fewer bytes), and the tokenize/hash fan-out
    * parallelizes out of the scan stage — which is a single task whenever
    * the input is one parquet row group (every sf file here; at cluster
    * scale, scan splits parallelize and the moved exchange is the one the
    * window required regardless). Numbered repartition: AQE must not
    * coalesce it back to one partition on text-byte estimates. */
  private def byDoc(docs: DataFrame): DataFrame =
    docs.repartition(docs.sparkSession.sessionState.conf.numShufflePartitions,
      col("doc_id"))

  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace tokenization; documents are single-space separated (verified
    * on testdata), so a plain split keeps oracle parity with string_split. */
  def tokens(text: Column): Column = split(text, " ")

  val EnStop: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for")
  val DeStop: Seq[String] =
    Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den")
  val FrStop: Seq[String] =
    Seq("le", "la", "les", "des", "et", "est", "un", "une", "dans", "pour")

  private[pipeline] def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words))).cast("long")

  /** BPE-ish subword segmentation regex: letter runs, digit runs, and single
    * punctuation marks — the pre-tokenization split GPT-style BPE applies
    * before merges. Plain character classes only, so Java regex (Spark) and
    * RE2 (DuckDB) agree exactly. */
  val BpeSplit: String = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  /** Per-document token statistics: token count, distinct tokens, char
    * length, total token chars, English stopword count, BPE-ish counts —
    * `tok_est` (chars/4, the ~4-chars-per-token heuristic) and `tok_bpe`
    * (pre-tokenization segments under [[BpeSplit]]). All exact integers —
    * oracle-safe. */
  def tokenStats(docs: DataFrame, text: String = "text"): DataFrame = {
    val tk = tokens(col(text))
    docs.select(
      col("doc_id"),
      size(tk).cast("long").as("n_tokens"),
      size(array_distinct(tk)).cast("long").as("n_uniq"),
      length(col(text)).cast("long").as("len_chars"),
      (length(col(text)) - size(tk) + 1).cast("long").as("tok_chars"),
      countIn(tk, EnStop).as("stop_cnt"),
      ((length(col(text)) + 3) / 4).cast("long").as("tok_est"),
      size(expr(s"regexp_extract_all($text, '${BpeSplit.replace("\\", "\\\\")}', 0)"))
        .cast("long").as("tok_bpe"))
  }

  /** Quality scoring: stopword ratio, uniqueness ratio, mean token length.
    * Ratios are divisions of exact integers — bit-identical across engines. */
  def qualityScore(docs: DataFrame, text: String = "text"): DataFrame =
    tokenStats(docs, text).select(
      col("doc_id"),
      (col("stop_cnt").cast("double") / col("n_tokens")).as("stop_ratio"),
      (col("n_uniq").cast("double") / col("n_tokens")).as("uniq_ratio"),
      (col("tok_chars").cast("double") / col("n_tokens")).as("mean_tok_len"),
      (col("stop_cnt") >= 1 && col("n_tokens") >= 10).as("quality_ok"))

  /** Language ID by stopword-list voting (n-gram-free heuristic tier; ties
    * resolve en > de > fr deterministically). */
  def langId(docs: DataFrame, text: String = "text"): DataFrame = {
    val tk = tokens(col(text))
    docs.select(col("doc_id"), countIn(tk, EnStop).as("en_hits"),
        countIn(tk, DeStop).as("de_hits"), countIn(tk, FrStop).as("fr_hits"))
      .withColumn("lang_pred",
        when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("fr_hits"), "en")
          .when(col("de_hits") >= col("fr_hits"), "de")
          .otherwise("fr"))
  }

  /** Corpus vocabulary: token → total frequency (`tf`) and document
    * frequency (`df`), top-k by (tf desc, token asc) — a TOTAL order, so
    * the k-cut is deterministic. The input to tokenizer/BPE training and
    * data-driven stopword lists. One token-groupBy shuffle with map-side
    * partial aggregation; the result is vocabulary-sized (not corpus-
    * sized) and the top-k runs as TakeOrdered, never a full global sort
    * materialization. */
  def vocabulary(docs: DataFrame, topK: Int, text: String = "text"): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col(text))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("tf"), countDistinct("doc_id").as("df"))
      .orderBy(col("tf").desc, col("token"))
      .limit(topK)

  /** Vocabulary coverage curve — the tokenizer-size sweep: for each
    * candidate vocabulary size k, the fraction of corpus token
    * OCCURRENCES covered by the top-k tokens (tf desc, token asc — the
    * [[vocabulary]] order, so "the top-k tokens" here IS the table
    * [[vocabularyWithIds]] would ship). The curve is what picks a
    * tokenizer budget: coverage_e6 at k answers "what OOV rate do I buy
    * at vocab size k".
    *
    * Exact integers: covered = cumulative tf at rank min(k, V),
    * coverage_e6 = covered·10⁶ div N. One corpus-token partial-agg
    * shuffle builds the count table; the rank/cum windows then run
    * over ONLY the top-max(ks) rows (a distributed TakeOrdered cut —
    * the frame is bounded by the CALLER'S largest candidate budget,
    * never by the raw type count, which at web scale is billions of
    * typo/URL singletons and would make an unpartitioned full-vocab
    * window a single-task sort); V and N are a 1-row driver collect
    * off the localCheckpointed counts, and each requested k becomes a
    * LITERAL rank lookup. */
  def vocabCoverage(docs: DataFrame, ks: Seq[Int],
                    text: String = "text"): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"ks must be >= 1: $ks")
    val spark = docs.sparkSession
    val counts = docs.select(explode(tokens(col(text))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("tf"))
      .localCheckpoint() // vocabulary-sized; 3 consumers below
    val Row2 = counts.agg(count(lit(1)), coalesce(sum("tf"), lit(0L))).head()
    val (v, n) = (Row2.getLong(0), Row2.getLong(1))
    require(n > 0, "vocabCoverage: empty token stream")
    // cum·10⁶ must stay in int64: past ~9.2e12 occurrences (≈ 50 TB of
    // text) run per-shard and combine, or drop the e6 scale
    require(n <= Long.MaxValue / 1000000L,
      s"vocabCoverage: $n occurrences overflow the e6 fixed point — " +
        "shard the corpus or rescale")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("tf").desc, col("token")) // ≤ max(ks) rows (bounded)
    val ranked = counts
      .orderBy(col("tf").desc, col("token")).limit(ks.max)
      .withColumn("_rank", row_number().over(w).cast("long"))
      .withColumn("_cum", sum("tf").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
    val lookups = ks.distinct.sorted.map { k =>
      val kk = math.min(k.toLong, v)
      ranked.where(col("_rank") === kk)
        .select(lit(k.toLong).as("k"), lit(v).as("n_types"),
          col("_cum").as("covered"), lit(n).as("n_occurrences"),
          expr(s"(_cum * 1000000L) div ${n}L").as("coverage_e6"))
    }
    lookups.reduce(_ unionByName _)
  }

  /** [[vocabulary]] with dense integer ids assigned by rank (tf desc, token
    * asc — the same TOTAL order, so ids are deterministic): id 0 is the most
    * frequent token. The id window runs unpartitioned over the top-k table —
    * vocabulary-sized by construction (k rows), never corpus-sized. */
  def vocabularyWithIds(docs: DataFrame, topK: Int,
                        text: String = "text"): DataFrame =
    vocabulary(docs, topK, text).withColumn("tok_id",
      (row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("tf").desc, col("token"))) - 1).cast("long"))

  /** Vocabulary encoding — the tokenization step between curation and
    * sequence packing: each document becomes its (pos, tok_id) rows under
    * a fixed vocabulary, out-of-vocabulary tokens mapping to -1 (the UNK
    * id). Emitted exploded (doc_id, pos, tok_id) — the shape packing and
    * any id-level analytics consume, and the shape that keeps every row a
    * fixed-width triple at 100 TB.
    *
    * Shape at scale: the vocabulary is topK-sized and BROADCAST — encoding
    * is a map-side hash-join on the exploded token stream, zero corpus
    * shuffles; order survives in `pos` so consumers needing arrays
    * re-assemble exactly like [[lineDedup]] does. */
  def encodeDocs(docs: DataFrame, vocab: DataFrame,
                 text: String = "text"): DataFrame =
    docs.select(col("doc_id"), posexplode(tokens(col(text))).as(Seq("pos", "token")))
      .join(broadcast(vocab.select("token", "tok_id")), Seq("token"), "left")
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        coalesce(col("tok_id"), lit(-1L)).as("tok_id"))

  /** Feature-hashed document vectors (hashing trick, Weinberger et al.
    * 2009): each document becomes a dense `dim`-wide float vector of
    * token counts bucketed by `md5Long(token) mod dim` — the bridge from
    * raw text into the embedding tier ([[Ann]] cosine dedup / ANN run on
    * the output unchanged, no external model needed; counts are raw, the
    * consumers normalize).
    *
    * Shape at scale: token explode → (doc, bucket) partial-agg count →
    * one doc-keyed map assembly; both shuffle keys are (doc_id, 8-byte
    * bucket). The map→dense-array projection is narrow and the map's
    * internal entry order (collect_list is partition-order-dependent)
    * cannot reach the output — only `m[j]` lookups do, so the vector is
    * deterministic under any partitioning. Integer counts cast to float32
    * exactly, keeping the DuckDB oracle bit-comparable. */
  def hashVectorize(docs: DataFrame, dim: Int = 64,
                    text: String = "text"): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    docs.select(col("doc_id"), explode(tokens(col(text))).as("tok"))
      .select(col("doc_id"), pmod(md5Long(col("tok")), lit(dim.toLong)).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("b"), col("c")))).as("m"))
      .select(col("doc_id"), expr(
        s"transform(sequence(CAST(0 AS BIGINT), CAST(${dim - 1} AS BIGINT)), " +
          "j -> CAST(coalesce(m[j], CAST(0 AS BIGINT)) AS FLOAT))").as("vec"))
  }

  /** Keyword search: top-k documents for a bag of query terms by an
    * exact-integer tf·idf score — the retrieval surface over a corpus
    * (idf here is the q47 keywords scaling, `(N·1e6) div df`, because a
    * log-based idf loses cross-engine bit parity to libm ulps; ranking
    * order matches the log form whenever df ratios exceed one ulp).
    *
    * Shape at scale: the exploded token stream is filtered to QUERY terms
    * before anything wide happens — only matching (doc, term) rows (a
    * vanishing fraction) reach the tf groupBy; df and the corpus size
    * come off the tf lineage and a scalar count, and the per-term idf
    * table (≤ |query| rows) is broadcast back. Final top-k is a
    * TakeOrdered with the deterministic (score desc, doc_id) tie-break.
    *
    * @return (doc_id, score) — the k best-scoring matching docs */
  def searchTopK(docs: DataFrame, query: Seq[String], k: Int,
                 text: String = "text"): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    require(k >= 1, s"k must be >= 1, got $k")
    val tf = docs
      .select(col("doc_id"), explode(tokens(col(text))).as("token"))
      .where(col("token").isInCollection(query))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy("token").agg(count(lit(1)).as("df"))
      .crossJoin(docs.agg(count(lit(1)).as("n_docs")))
      .select(col("token"), expr("(n_docs * 1000000) div df").as("idf_scaled"))
    tf.join(broadcast(idf), "token")
      .groupBy("doc_id").agg(sum(col("tf") * col("idf_scaled")).as("score"))
      .orderBy(desc("score"), asc("doc_id")).limit(k)
  }

  /** Exact positional phrase search: docs containing `phrase` as
    * CONSECUTIVE tokens, with the match count — the precision tier above
    * [[searchTopK]]'s bag-of-words scoring (q65), and the operator form
    * of a positional inverted index probe. Matches may overlap
    * (`a a a` matches `a a` twice) — occurrence semantics, unlike the
    * non-overlapping substring count of [[dictTag]].
    *
    * Shape at scale: the posting stream is filtered to the phrase's
    * tokens BEFORE anything wide happens (a vanishing fraction of the
    * corpus); the match is a chain of |phrase|−1 equi-joins on
    * (doc_id, pos − i) — co-partitioned after the first exchange, and
    * each side is query-term-sized, never corpus-sized. Long phrases
    * intersect rarest-first in a real index; at the typical 2-4 token
    * operational phrase the chain IS the plan you'd want.
    *
    * @return (doc_id, n_matches), matching docs only */
  def phraseSearch(docs: DataFrame, phrase: Seq[String],
                   text: String = "text"): DataFrame =
    phraseMatches(docs, phrase, text)
      .groupBy("doc_id").agg(count(lit(1)).as("n_matches"))

  /** The positional core of [[phraseSearch]]: one row per match,
    * `pos` = 0-based token index of the phrase's first token. */
  def phraseMatches(docs: DataFrame, phrase: Seq[String],
                    text: String = "text"): DataFrame = {
    require(phrase.size >= 2, "phrase needs at least two tokens")
    val post = docs
      .select(col("doc_id"), posexplode(tokens(col(text))).as(Seq("pos", "tok")))
      .where(col("tok").isInCollection(phrase.distinct))
    val anchor = post.where(col("tok") === phrase.head)
      .select(col("doc_id"), col("pos"))
    phrase.zipWithIndex.tail
      .foldLeft(anchor) { case (acc, (t, i)) =>
        acc.join(
          post.where(col("tok") === t)
            .select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
      }
  }

  /** Keyword-in-context concordance (the corpus linguist's KWIC view,
    * and the retrieval UI's snippet): every phrase match with `context`
    * tokens either side, clamped at document edges. The match set comes
    * from [[phraseMatches]] (term-filtered before any exchange); the
    * snippet pass joins the match rows — a vanishing fraction of the
    * corpus, AQE broadcasts them — back onto the token arrays and
    * slices, a narrow projection per matched document.
    *
    * @return (doc_id, pos, snippet), one row per match */
  def concordance(docs: DataFrame, phrase: Seq[String], context: Int,
                  text: String = "text"): DataFrame = {
    require(context >= 0, s"context must be >= 0, got $context")
    val toks = docs.select(col("doc_id"), tokens(col(text)).as("_s"))
      .withColumn("_n", size(col("_s")))
    phraseMatches(docs, phrase, text)
      .join(toks, "doc_id")
      .withColumn("_a", greatest(lit(0), col("pos") - context))
      .withColumn("_b",
        least(col("_n"), col("pos") + phrase.size + context))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        concat_ws(" ",
          slice(col("_s"), col("_a") + 1, col("_b") - col("_a")))
          .as("snippet"))
  }

  /** Overlapping token-window chunking — the retrieval (RAG) sibling of
    * sequence packing (q42 packs documents INTO fixed budgets; this
    * splits documents into windows): chunk k of a doc covers tokens
    * `[k·stride, k·stride + window)`, chunks emitted while their start
    * is inside the doc (the last may be short). A pure NARROW projection
    * — explode + slice per row, no shuffle, no state — so it
    * parallelizes embarrassingly and pushes through any upstream filter.
    *
    * @return (doc_id, chunk_id, start_tok, n_tok, chunk) */
  def chunkDocs(docs: DataFrame, window: Int, stride: Int,
                text: String = "text"): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    docs.select(col("doc_id"), tokens(col(text)).as("_t"))
      .withColumn("_n", size(col("_t")))
      .where(col("_n") > 0)
      .select(col("doc_id"), col("_t"), col("_n"),
        explode(sequence(lit(0), expr(s"(_n - 1) div $stride"))).as("_k"))
      .select(col("doc_id"),
        col("_k").cast("long").as("chunk_id"),
        (col("_k") * stride).cast("long").as("start_tok"),
        least(lit(window), col("_n") - col("_k") * stride).cast("long")
          .as("n_tok"),
        array_join(slice(col("_t"), col("_k") * stride + 1, lit(window)), " ")
          .as("chunk"))
  }

  /** Collocation (phrase) detection by integer LIFT — the
    * phrase-vocabulary step of tokenizer/embedding pipelines (the
    * word2vec phrase pass, Mikolov et al. 2013, with the log dropped):
    * adjacent token pairs scored by
    *
    *   lift_e6 = (c_xy · N · 1e6) div (c_x · c_y)
    *
    * — proportional to p(xy)/(p(x)p(y)) with the corpus-constant bigram/
    * unigram total ratio folded in, so the RANKING equals PMI's (log is
    * monotone) while every operation stays an exact integer (libm log
    * would cost cross-engine bit parity, the q47/q99 rule). `minCount`
    * suppresses the low-frequency noise PMI is notorious for.
    *
    * Shape at scale: bigrams from a doc-keyed lead window (one corpus
    * exchange, partition width = one document), one (w1, w2) partial-agg
    * shuffle already reduced to the bigram vocabulary, unigram counts
    * joined back (vocabulary-sized, AQE-broadcast), TakeOrdered cut.
    * Headroom: c_xy·N·1e6 under 2⁶³ to ~3e6-token corpora per run —
    * beyond that, drop the scale or pre-aggregate per shard.
    *
    * @return top `k` by (lift_e6 desc, w1, w2):
    *         (w1, w2, c_xy, c_x, c_y, lift_e6) */
  def collocations(docs: DataFrame, minCount: Long = 5L, k: Int = 50,
                   text: String = "text"): DataFrame = {
    require(minCount >= 1 && k >= 1, "need minCount >= 1 and k >= 1")
    val tok = docs.select(col("doc_id"),
      posexplode(tokens(col(text))).as(Seq("_pos", "_w")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("_pos")
    val big = tok.withColumn("_w2", lead("_w", 1).over(w))
      .where(col("_w2").isNotNull)
      .groupBy(col("_w").as("w1"), col("_w2").as("w2"))
      .agg(count(lit(1)).as("c_xy"))
      .where(col("c_xy") >= minCount)
    val uni = tok.groupBy(col("_w").as("_t")).agg(count(lit(1)).as("_c"))
    big
      .join(uni.select(col("_t").as("w1"), col("_c").as("c_x")), "w1")
      .join(uni.select(col("_t").as("w2"), col("_c").as("c_y")), "w2")
      // N off the unigram table (Σ counts), not a third corpus pass
      .crossJoin(broadcast(uni.agg(sum("_c").as("_n"))))
      .withColumn("lift_e6", expr("(c_xy * _n * 1000000) div (c_x * c_y)"))
      .orderBy(desc("lift_e6"), asc("w1"), asc("w2")).limit(k)
      .select("w1", "w2", "c_xy", "c_x", "c_y", "lift_e6")
  }

  /** Bigram-fluency scoring — the language-model quality signal without a
    * language model: each document is scored by the mean corpus-wide
    * conditional bigram probability of its transitions,
    *
    *   p_e6(w2|w1) = (c_xy · 1e6) div c_x,   fluency_e6 = Σ p_e6 div n_bi
    *
    * — gibberish and boilerplate-shuffled text have rare transitions and
    * score low; natural text rides the corpus's own statistics. The
    * integer fixed point keeps it hash-oracle-checkable where a
    * log-probability (perplexity) would hit libm parity (the q47/q99
    * rule); ranking behavior is the same direction, linear rather than
    * log scale. Self-counting bias (a doc's own bigrams are in the
    * corpus counts) vanishes at corpus scale and keeps the operator
    * one-pass — callers needing held-out scoring pass a reference corpus
    * via `counts`.
    *
    * Shape at scale: bigrams off the doc-keyed lead window (one corpus
    * exchange); the (w1, w2) count table is bigram-vocabulary-sized and
    * the probability join runs on it (AQE broadcasts when it fits); one
    * doc-keyed partial-agg shuffle settles the mean.
    *
    * @param counts optional reference corpus for the statistics
    *               (defaults to `docs` itself)
    * @return (doc_id, n_bigrams, fluency_e6) for docs with ≥ 1 bigram */
  def bigramFluency(docs: DataFrame, counts: Option[DataFrame] = None,
                    text: String = "text"): DataFrame = {
    def bigrams(df: DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("_pos")
      df.select(col("doc_id"), posexplode(tokens(col(text))).as(Seq("_pos", "w1")))
        .withColumn("w2", lead("w1", 1).over(w))
        .where(col("w2").isNotNull)
    }
    val ref = bigrams(counts.getOrElse(docs))
    val cxy = ref.groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
    // c_x off the bigram-vocabulary frame, not a second corpus pass —
    // Σ_w2 c_xy counts exactly the same bigram rows
    val cx = cxy.groupBy("w1").agg(sum("c_xy").as("c_x"))
    // self-scoring reuses the reference lineage outright (one tokenize +
    // one window exchange total, not three)
    val scoring = if (counts.isEmpty) ref else bigrams(docs)
    scoring
      .join(cxy, Seq("w1", "w2"), "left")
      .join(cx, Seq("w1"), "left")
      .withColumn("_p", expr("(coalesce(c_xy, 0L) * 1000000) div coalesce(c_x, 1L)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("_p").as("_sp"))
      .withColumn("fluency_e6", expr("_sp div n_bigrams"))
      .select("doc_id", "n_bigrams", "fluency_e6")
  }

  /** BM25 top-k retrieval (Robertson & Walker SIGIR'94 tf saturation) in
    * EXACT integer arithmetic. With the standard k1 = 1.2, b = 0.75 the
    * per-(doc, term) saturation term
    *
    *   tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl/avgdl)
    *
    * is a rational in (tf, dl, L = Σdl, N = #docs); multiplying through by
    * 10·L makes it `22·tf·L / (10·tf·L + 3·L + 9·dl·N)`, held at fixed
    * point 1e6 with floor-div — bit-identical on any engine, which a
    * float BM25 (non-associative sums, libm log) can never be. The idf is
    * q65's log-free `(N·1e6) div df` (ln would cost cross-engine bit
    * parity for ulp-level gain); score = Σ idf_scaled·sat_e6.
    *
    * Headroom: `22·tf·L·1e6` must stay under 2⁶³ — fine to L·tf ≈ 4e11
    * (every test SF and any per-shard run); a corpus beyond that drops
    * the saturation scale to 1e3, trading 3 fixed-point digits.
    *
    * Shape at scale: the q65 discipline — the exploded stream is filtered
    * to query terms before anything wide; dl needs the FULL per-doc token
    * count, so the corpus is scanned twice narrow (the documented q47
    * trade); (L, N) are scalar aggs crossed in as one broadcast row;
    * per-term idf broadcasts; final cut is TakeOrdered, never a global
    * sort.
    *
    * @return (doc_id, score) — the k best by (score desc, doc_id) */
  def bm25TopK(docs: DataFrame, query: Seq[String], k: Int,
               text: String = "text"): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    require(k >= 1, s"k must be >= 1, got $k")
    val tok = docs.select(col("doc_id"), explode(tokens(col(text))).as("token"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val tf = tok.where(col("token").isInCollection(query))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy("token").agg(count(lit(1)).as("df"))
      .crossJoin(docs.agg(count(lit(1)).as("n_docs")))
      .select(col("token"), expr("(n_docs * 1000000) div df").as("idf_scaled"))
    val totals = dl.agg(sum(col("dl")).as("big_l"))
      .crossJoin(docs.agg(count(lit(1)).as("n_docs")))
    tf.join(broadcast(idf), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(totals))
      .withColumn("_sat_e6", expr(
        "(22 * tf * big_l * 1000000) div (10 * tf * big_l + 3 * big_l + 9 * dl * n_docs)"))
      .groupBy("doc_id")
      .agg(sum(col("idf_scaled") * col("_sat_e6")).as("score"))
      .orderBy(desc("score"), asc("doc_id")).limit(k)
  }

  /** Reciprocal rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * combine any number of rankings of the same id space by summing
    * scale div (kConst + rank) per list — the standard way to merge a
    * lexical ranking (tf-idf / BM25) with a semantic one (ANN) without
    * score calibration, since only RANKS enter. The classic k = 60.
    *
    * Fixed-point integer contributions (floor-div) keep the fusion
    * hash-oracle-checkable and engine-portable where 1/(k+r) floats
    * would drift. Shape: each ranking is already top-N-sized; the union
    * + groupBy moves ranking rows only, and the final cut is a
    * TakeOrdered (never a global sort).
    *
    * @param rankings frames each carrying (idCol, rankCol) with rank
    *                 1-based within that list
    * @return (idCol, rrf, n_lists) — topK by (rrf desc, id) */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String = "doc_id",
              rankCol: String = "rnk", kConst: Long = 60L, topK: Int = 20,
              scale: Long = 1000000000000L): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(kConst >= 0 && topK >= 1 && scale >= 1, "bad RRF parameters")
    val scored = rankings
      .map(_.select(col(idCol),
        expr(s"${scale}L div (${kConst}L + $rankCol)").as("_c")))
      .reduce(_ unionByName _)
    scored.groupBy(idCol)
      .agg(sum("_c").as("rrf"), count(lit(1)).as("n_lists"))
      .orderBy(desc("rrf"), asc(idCol)).limit(topK)
  }

  /** Distributed BPE merge learning (Sennrich et al. 2016, "Neural Machine
    * Translation of Rare Words with Subword Units"): learn `numMerges`
    * merge rules from the corpus, returned as the ordered merge table
    * (rank, a, b, pair_count) — the model artifact a tokenizer trainer
    * ships.
    *
    * The corpus is touched ONCE, to build the word-frequency table (one
    * token shuffle) — the classic observation that BPE statistics factor
    * through word counts. Every learning iteration then runs on the
    * VOCABULARY-sized frame (words as symbol arrays + terminal `</w>`):
    * adjacent-pair counts via a transform lambda, one freq-weighted
    * partial-agg shuffle of pair rows, and a driver argmax of ONE row.
    * The winning merge is applied with a greedy left-to-right
    * `aggregate()` fold (non-overlapping occurrences, the reference
    * semantics) and the result locally checkpointed — numMerges nested
    * folds would otherwise stack in one plan (the pageRank lesson).
    * Ties break on (count desc, a, b) so the learned table is
    * bit-deterministic across partitionings and engines.
    *
    * At 100 TB the vocab frame is ~millions of rows regardless of corpus
    * size — iteration cost is independent of the corpus after the first
    * pass. Driver holds only the numMerges-row merge table.
    *
    * @param minCount stop early when no pair reaches this weighted count
    *                 (2 = merge while anything repeats at all) */
  def learnBpeMerges(docs: DataFrame, numMerges: Int, minCount: Long = 2L,
                     text: String = "text"): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    val words = docs.select(explode(tokens(col(text))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
    var vocab = words.select(col("freq"),
        concat(filter(split(col("w"), ""), s => s =!= ""),
          array(lit("</w>"))).as("syms"))
      .localCheckpoint()
    val merges = List.newBuilder[(Long, String, String, Long)]
    var rank = 0L
    var done = false
    while (rank < numMerges && !done) {
      val top = vocab.where(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, CAST(i AS INT)) AS a, " +
            "element_at(syms, CAST(i + 1 AS INT)) AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .where(col("cnt") >= minCount)
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((rank, a, b, cnt))
        rank += 1
        // checkpoint blocks of the superseded iterate free on GC.
        // (r16 optimization note: batching checkpoints every 8 rounds was
        // MEASURED SLOWER — 3.3 -> 4.5 s at sf0.1 — because aggregate()
        // folds are interpreted, not codegen'd, so the argmax job re-paid
        // up to 7 stacked folds per round; the per-round eager
        // materialization is the cheaper trade on both sides.)
        vocab = vocab.withColumn("syms",
          aggregate(col("syms"), array().cast("array<string>"), (acc, x) =>
            when(size(acc) > 0 &&
                element_at(acc, -1) === lit(a) && x === lit(b),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
              .otherwise(concat(acc, array(x)))))
          .localCheckpoint()
      }
    }
    import spark.implicits._
    merges.result().toDF("rank", "a", "b", "pair_count")
  }

  /** Tokenizer application — the other half of [[learnBpeMerges]]: segment
    * every document into subword tokens under a learned merge table,
    * producing `(doc_id, pos, spos, token)` rows (word position in the doc,
    * subword position in the word).
    *
    * Scale shape: the merge table is tokenizer-sized by construction →
    * collected once (rank order) and BAKED INTO THE PLAN; segmentation runs
    * over the DISTINCT word table (vocabulary-sized — Heaps' law, millions
    * of rows at 100 TB, never corpus-sized), and the corpus token stream
    * joins back on the word (AQE broadcasts the segmented-vocab side at
    * tokenizer scales). Tokenizing cost is therefore ∝ vocabulary, not
    * corpus — the same economics as [[learnBpeMerges]].
    *
    * Each merge is ONE codegen'd `replace` call, not a lambda fold: a word
    * is encoded as its symbols each wrapped in unit-separator (U+001F, "|"
    * below) characters (`|s1||s2|…`), so the search string `|a||b|` can
    * only match two whole
    * ADJACENT symbols (a symbol ending in "a" never matches — the wrap
    * demands a separator before the match) and the replacement `|ab|`
    * restores the invariant. String replace scans left-to-right
    * non-overlapping — exactly the greedy semantics of the learner's
    * `aggregate()` fold (spec-pinned equal). Merges chain in rank order;
    * every `batch` merges the vocab frame is locally checkpointed so plan
    * depth stays bounded at tokenizer-scale merge counts.
    *
    * The U+001F character itself is dropped from word symbols (the wrap
    * separator must never occur inside one); real tokenizers pre-filter
    * control characters anyway.
    *
    * @param merges (rank, a, b) rows from [[learnBpeMerges]] (extra columns
    *               ignored); applied in ascending rank order */
  def applyBpe(docs: DataFrame, merges: DataFrame, text: String = "text",
               batch: Int = 200): DataFrame = {
    val SEP = "\u001f"
    val ms = merges.select("rank", "a", "b").collect()
      .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2)))
    val words = docs.select(explode(tokens(col(text))).as("w"))
      .where(col("w") =!= "").distinct()
    // |c1||c2|…|</w>| — every symbol wrapped; chars + the end-of-word mark
    val seq0 = concat(lit(SEP),
      array_join(concat(
        filter(split(col("w"), ""), s => s =!= "" && s =!= SEP),
        array(lit("</w>"))), SEP + SEP),
      lit(SEP))
    var seg = words.select(col("w"), seq0.as("seq"))
    ms.grouped(math.max(batch, 1)).foreach { grp =>
      val chained = grp.foldLeft(col("seq")) { case (c, (a, b)) =>
        replace(c, lit(SEP + a + SEP + SEP + b + SEP), lit(SEP + a + b + SEP))
      }
      // checkpoint between batches: bounded plan/codegen depth, superseded
      // blocks free on GC (vocab-sized frame — cheap)
      seg = seg.withColumn("seq", chained)
      if (ms.length > batch) seg = seg.localCheckpoint()
    }
    val toks = split(btrim(col("seq"), lit(SEP)), SEP + SEP)
    seg.select(col("w"), posexplode(toks).as(Seq("spos", "token")))
      .join(docs.select(col("doc_id"),
          posexplode(tokens(col(text))).as(Seq("pos", "w")))
        .where(col("w") =!= ""), "w")
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("spos").cast("long").as("spos"), col("token"))
  }

  /** Gopher-style repetition quality signals (Rae et al. 2021 §A1.1.3, the
    * published repetition filters): per document,
    *   - `top_token_cnt` / `top_token_frac`  — occurrences of the most
    *     frequent token, and its fraction of all tokens;
    *   - `top_bigram_cnt` / `top_bigram_frac` — same for word 2-grams
    *     (fraction of the n-1 bigram instances; NULL when n < 2);
    *   - `dup_trigram_cnt` / `dup_trigram_frac` — trigram instances whose
    *     trigram occurs ≥ 2 times in the doc, over the n-2 instances
    *     (NULL when n < 3).
    * High values flag boilerplate/spam for corpus filtering.
    *
    * Shape at scale: ONE pos-exploded pass builds token/bigram/trigram
    * hashes off the same lead window (tokens md5-hashed once; gram keys are
    * 8-byte rot-XOR combines, never strings), the three gram kinds union
    * into one (doc, kind, gram) groupBy, and a final doc-keyed aggregate
    * picks maxima. ONE corpus shuffle total: the lead window's doc_id
    * exchange already clusters every downstream grouping key (doc_id is a
    * subset of both groupings), so Catalyst inserts no further exchange —
    * plan-verified. No partition is ever wider than one document. Counts are
    * hash-invariant (injective-enough 60-bit grams), so the DuckDB oracle
    * counts TEXTUAL grams and must agree exactly — q15's argument. */
  def repetitionStats(docs: DataFrame, text: String = "text"): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    // byDoc: see minFingerprint — the lead window needed this exchange
    // anyway; moving it before the explode shuffles text, not token rows
    val tok = byDoc(docs).select(col("doc_id"), size(tokens(col(text))).as("n"),
        posexplode(tokens(col(text))).as(Seq("pos", "tok")))
      .withColumn("th", md5Long(col("tok")))
      // leads materialize BEFORE the explode below — window functions are
      // not allowed inside a generator expression
      .withColumn("th1", lead(col("th"), 1).over(win))
      .withColumn("th2", lead(col("th"), 2).over(win))
    def gram(hs: Seq[Column]): Column =
      hs.zipWithIndex.map { case (h, i) => rot60(h, (7 * i) % 60) }
        .reduce(_ bitwiseXOR _)
    val grams = tok
      .select(col("doc_id"), col("n"), explode(array(
        struct(lit(0).as("kind"), col("th").as("g")),
        struct(lit(1).as("kind"),
          when(col("pos") <= col("n") - 2,
            gram(Seq(col("th"), col("th1")))).as("g")),
        struct(lit(2).as("kind"),
          when(col("pos") <= col("n") - 3,
            gram(Seq(col("th"), col("th1"), col("th2")))).as("g")))).as("kg"))
      .select(col("doc_id"), col("n"), col("kg.kind").as("kind"), col("kg.g").as("g"))
      .where(col("g").isNotNull)
    val counts = grams.groupBy("doc_id", "n", "kind", "g")
      .agg(count(lit(1)).as("c"))
    counts.groupBy("doc_id", "n")
      .agg(
        max(when(col("kind") === 0, col("c"))).as("top_token_cnt"),
        max(when(col("kind") === 1, col("c"))).as("top_bigram_cnt"),
        coalesce(sum(when(col("kind") === 2 && col("c") >= 2, col("c"))), lit(0L))
          .as("dup_trigram_cnt"))
      .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
        col("top_token_cnt"), col("top_bigram_cnt"), col("dup_trigram_cnt"),
        (col("top_token_cnt").cast("double") / col("n")).as("top_token_frac"),
        (col("top_bigram_cnt").cast("double") / (col("n") - 1))
          .as("top_bigram_frac"),
        when(col("n") >= 3, col("dup_trigram_cnt").cast("double") / (col("n") - 2))
          .as("dup_trigram_frac"))
  }

  /** Per-document top-k keywords by a tf-idf-STYLE score kept in exact
    * integer arithmetic: `score = tf * 1e6 div df` — monotone in the same
    * directions as tf·idf (more occurrences up, more common across the
    * corpus down) but bit-reproducible in any engine, where `ln`-based idf
    * is at the mercy of each libm's last-ulp rounding (a tie flipped by one
    * ulp reorders a rank — unacceptable for a hash-compared gate). Ties
    * break (score desc, token asc): a TOTAL order, so the k-cut is
    * deterministic.
    *
    * Shape at scale: tf = one (doc, token) groupBy; df = a token groupBy
    * over the tf rows (exactly the distinct (doc, token) pairs). Expressed
    * as lineage, Spark recomputes the tf branch for df (pruned to distinct
    * pairs — the pruning is also why exchange reuse cannot fire: the two
    * subtrees differ), so the corpus is exploded twice, both passes
    * map-side combined; a caller for whom the second scan dominates can
    * persist/checkpoint tf and build df from it — the operator itself
    * stays unpinned (corpus-scale default caches are the worse trade).
    * A per-token df WINDOW would avoid the recompute but puts every
    * occurrence of a stopword in one partition — the banned skew shape.
    * The df join is token-keyed on a vocabulary-sized table (AQE
    * broadcasts it when small); top-k is a doc-keyed window — partition
    * width = one document's vocabulary. */
  def keywords(docs: DataFrame, k: Int, text: String = "text"): DataFrame = {
    val tf = docs.select(col("doc_id"), explode(tokens(col(text))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("token"))
    tf.join(df, "token")
      .withColumn("score", expr("(tf * 1000000) div df"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("doc_id", "token", "tf", "df", "score", "rnk")
  }

  /** Corpus-level line deduplication — boilerplate removal (the line-level
    * filter of CCNet/RefinedWeb-style pipelines): a line whose trimmed
    * content is non-empty and appears in >= `minDocs` DISTINCT documents is
    * removed from every document; everything else (including blank lines)
    * is kept in original order. Per document: `clean_text` (surviving lines
    * re-joined with \n; "" when nothing survives), `n_lines` (original
    * count), `n_removed`.
    *
    * Shape at scale: lines are keyed by their 60-bit md5 hash, so the
    * frequency groupBy and the anti join shuffle 8-byte keys, never line
    * text (the oracle matches textual lines and must agree — q15's
    * injectivity argument). The frequent set is boilerplate-sized (lines
    * crossing a cross-document threshold), orders of magnitude below
    * corpus line count — AQE broadcasts the anti join. Reassembly is one
    * doc_id shuffle whose partition width is a single document's lines. */
  def lineDedup(docs: DataFrame, minDocs: Int, text: String = "text"): DataFrame = {
    val ls = docs.select(col("doc_id"), split(col(text), "\n", -1).as("ls"))
    val ex = ls.select(col("doc_id"),
        posexplode(col("ls")).as(Seq("pos", "line")))
      .withColumn("lh", md5Long(col("line")))
    val frequent = ex.where(trim(col("line")) =!= "")
      .groupBy("lh").agg(countDistinct("doc_id").as("ndocs"))
      .where(col("ndocs") >= minDocs)
      .select("lh")
    val rebuilt = ex.join(frequent, Seq("lh"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")), "\n").as("clean_text"))
    ls.select(col("doc_id"), size(col("ls")).cast("long").as("n_lines"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** Readability scoring in exact fixed point — the Flesch reading-ease
    * shape (206.835 − 1.015·words/sentence − 84.6·syllables/word) with
    * the classic cheap proxies: sentences = runs of [.!?] (floored at 1),
    * syllables = vowel-group runs in the lowercased text ([aeiouy]+, the
    * standard one-liner estimator). Every ratio is an e3 fixed-point
    * integer division, so the oracle reproduces the score bit for bit —
    * a float pipeline would disagree in the last ulp across engines.
    *
    * Pure narrow column expressions: two regexp scans and integer
    * arithmetic, no shuffle — rides the corpus scan like the other
    * quality signals (q16/q24), and composes with them in one pass. */
  def readability(docs: DataFrame, text: String = "text"): DataFrame = {
    val t = col(text)
    docs.select(
        col("doc_id"),
        size(tokens(t)).cast("long").as("n_words"),
        greatest(lit(1L),
          size(regexp_extract_all(t, lit("[.!?]+"), lit(0))).cast("long"))
          .as("n_sentences"),
        size(regexp_extract_all(lower(t), lit("[aeiouy]+"), lit(0)))
          .cast("long").as("n_syllables"))
      .withColumn("wps_e3",
        expr("n_words * 1000 div n_sentences"))
      .withColumn("spw_e3",
        expr("n_syllables * 1000 div greatest(1L, n_words)"))
      .withColumn("flesch_e3",
        expr("206835 - (1015 * wps_e3) div 1000 - (84600 * spw_e3) div 1000"))
  }

  /** Canonical text form for robust exact dedup: lowercase, every
    * non-[a-z0-9] run collapsed to ONE space, ends trimmed. Catches the
    * trivially-perturbed duplicates plain md5(text) misses (case flips,
    * punctuation swaps, whitespace churn — the bulk of boilerplate
    * re-crawls) while staying a pure narrow expression: the regex subset
    * is shared Java/RE2 (plain character class, greedy `+`, no
    * alternation), so the oracle computes the identical string.
    * Unicode canonicalization (NFC/NFKC) is deliberately out of scope —
    * Java and RE2/DuckDB disagree on normalization tables, so it belongs
    * in a caller-supplied pass, not under the oracle gate. */
  def canonicalize(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Canonical-form exact dedup: group documents by the md5 of
    * [[canonicalize]]d text; one row per document with its canonical group
    * id (the group's smallest doc_id), group size, and survivor flag
    * (smallest doc_id wins — q14's deterministic survivorship rule).
    *
    * Same 100 TB shape as exact dedup: canonicalization rides the scan
    * (narrow, codegen'd), then ONE groupBy on a 16-byte digest whose
    * partial aggregate collapses duplicates map-side; the group table
    * (distinct canonical forms) joins back hash-to-hash. Text never
    * shuffles — only (doc_id, digest) pairs do. */
  def canonDedup(docs: DataFrame, text: String = "text"): DataFrame = {
    val keyed = docs.select(col("doc_id"),
      md5(canonicalize(col(text))).as("_ch"))
    val groups = keyed.groupBy("_ch")
      .agg(min("doc_id").as("canon_id"), count(lit(1)).as("group_size"))
    keyed.join(groups, "_ch")
      .select(col("doc_id"), col("canon_id"), col("group_size"),
        (col("doc_id") === col("canon_id")).as("is_survivor"))
  }

  /** PII patterns, written in the subset where Java regex (Spark) and RE2
    * (DuckDB) agree exactly: plain character classes, bounded repetition,
    * ASCII `\d` and `\b` — no backreferences, no lookaround (RE2 has
    * neither), no alternation whose leftmost-first/leftmost-longest
    * difference could matter. */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe: String = "\\b\\d{3}-\\d{4}\\b"

  /** PII redaction + text normalization — the scrub pass a training corpus
    * runs before anything else sees the text. Per document: match counts
    * for emails / IPv4 addresses / phone-shaped numbers (counted on the
    * ORIGINAL text), `red_text` with the three patterns replaced by typed
    * placeholders (email first — its matches can contain digits and dots
    * that the narrower patterns would otherwise bite into — then IP, then
    * phone), and `norm_text` = the redacted text lowercased with runs of
    * spaces collapsed.
    *
    * Pure narrow column expressions — no shuffle, runs map-side at scan
    * speed inside whole-stage codegen; at 100 TB this is a free rider on
    * whatever pass reads the text anyway. */
  def redactPii(docs: DataFrame, text: String = "text"): DataFrame = {
    val t = col(text)
    docs.select(
        col("doc_id"),
        size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long").as("n_email"),
        size(regexp_extract_all(t, lit(Ipv4Re), lit(0))).cast("long").as("n_ip"),
        size(regexp_extract_all(t, lit(PhoneRe), lit(0))).cast("long").as("n_phone"),
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "<EMAIL>"),
            Ipv4Re, "<IP>"),
          PhoneRe, "<PHONE>").as("red_text"))
      .withColumn("norm_text",
        lower(regexp_replace(col("red_text"), " +", " ")))
  }

  /** 60-bit SimHash over the document's token multiset (Charikar 2002,
    * "Similarity estimation techniques from rounding algorithms"):
    * bit j of the fingerprint is 1 iff sum over tokens of ±1 (sign of bit j
    * of the token hash) is positive.
    *
    * Computed as 60 codegen'd conditional sums over one exploded token pass —
    * at scale this is one narrow map + one partial-aggregated groupBy(doc). */
  def simhash(docs: DataFrame, text: String = "text", bits: Int = 60): DataFrame = {
    // byDoc: the 60-column signed-bit aggregation groups by doc_id, so
    // the exchange it needs moves ahead of the explode (text bytes, and
    // the md5-per-token + 60 partial sums leave the single-task scan)
    val tok = byDoc(docs).select(col("doc_id"), explode(tokens(col(text))).as("tok"))
      .withColumn("h", md5Long(col("tok")))
    val sums = (0 until bits).map { j =>
      sum(shiftright(col("h"), j).bitwiseAND(1) * 2 - 1).as(s"s$j")
    }
    val agg = tok.groupBy("doc_id").agg(sums.head, sums.tail: _*)
    val fp = (0 until bits).map { j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)
    agg.select(col("doc_id"), fp.as("simhash"))
  }

  /** SimHash near-dup pairs: hamming distance of fingerprints <= maxDist.
    * Correctness tier does all-pairs (fine at test SF); the 100 TB path
    * buckets fingerprints by band (see [[Dedup.simhashBandPairs]]). */
  def simhashPairs(sims: DataFrame, maxDist: Int): DataFrame = {
    // the stream side of the all-pairs nested-loop join is pinned to the
    // configured shuffle parallelism: the fingerprint frame is tiny in
    // BYTES (16 B/doc — AQE coalesces it to one partition) but the join
    // computes O(n²/2) hamming distances over it — single-task without
    // the pin. One 16-byte-per-row exchange buys full parallelism.
    val a = sims.select(col("doc_id").as("doc_a"), col("simhash").as("fp_a"))
      .repartition(sims.sparkSession.sessionState.conf.numShufflePartitions,
        col("doc_a"))
    val b = sims.select(col("doc_id").as("doc_b"), col("simhash").as("fp_b"))
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long"))
      .where(col("hamming") <= maxDist)
      .select("doc_a", "doc_b", "hamming")
  }

  /** 60-bit left-rotation of a 60-bit value. Exact in Long arithmetic:
    * (h << s) wraps mod 2^64 but the mask keeps only bits < 60, which are
    * unaffected by the wrap; h >= 0 so the arithmetic >> is a logical one. */
  private[pipeline] def rot60(h: Column, s: Int): Column =
    if (s == 0) h
    else shiftleft(h, s).bitwiseAND(lit((1L << 60) - 1))
      .bitwiseOR(shiftright(h, 60 - s))

  /** DuckDB rendering of the same rotation via overflow-free div/mod
    * (DuckDB BIGINT ops are overflow-checked, so no raw shifts). */
  def rot60Sql(h: String, s: Int): String =
    if (s == 0) h
    else { val lm = 1L << (60 - s); s"(($h % $lm) * ${1L << s} + ($h // $lm))" }

  /** Winnowing-style document fingerprint (Schleimer et al., SIGMOD'03
    * simplified): the minimum hash over all w-token windows. Collision of
    * fingerprints is a cheap near-dup blocking key.
    *
    * Each token is md5-hashed ONCE to a 60-bit long; a window's hash is the
    * XOR of its token hashes rotated by 7·position bits (positional, so
    * permuted windows differ). That's ~w× less hashing than md5 per gram and
    * keeps the whole pipeline in whole-stage codegen: one explode, one
    * doc_id shuffle for the lead window, one partial-aggregated min. */
  def minFingerprint(docs: DataFrame, w: Int = 8, text: String = "text"): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    // byDoc: shuffle compact text rows ahead of the explode — the lead
    // window reuses the doc_id partitioning (same exchange count, fewer
    // bytes) and tokenize+md5 leaves the single-row-group scan stage
    val tok = byDoc(docs).select(col("doc_id"), size(tokens(col(text))).as("n"),
        posexplode(tokens(col(text))).as(Seq("pos", "tok")))
      .withColumn("th", md5Long(col("tok"))) // one md5 per token, not per gram
    val gram = (0 until w).map { i =>
      val h = if (i == 0) col("th") else lead(col("th"), i).over(win)
      rot60(h, (7 * i) % 60)
    }.reduce(_ bitwiseXOR _)
    val grams = tok
      .withColumn("g", gram)
      .where(col("pos") <= col("n") - w) // only full windows
      .groupBy("doc_id").agg(min("g").as("fp_grams"))
    docs.select(col("doc_id"), size(tokens(col(text))).as("n"),
        md5Long(col(text)).as("fp_whole"))
      .join(grams, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("n") >= w, col("fp_grams")).otherwise(col("fp_whole"))
          .as("fingerprint"))
  }

  /** Full positional winnowing (Schleimer, Wilkerson, Aiken — SIGMOD'03):
    * the guaranteed-density document fingerprint SET behind MOSS-style
    * plagiarism/overlap detection. Where [[minFingerprint]] keeps ONE
    * global minimum per document, this keeps, for every window of `w`
    * consecutive n-gram hashes, the window's minimum — the union of those
    * picks is the fingerprint set: any shared substring of
    * `n + w - 1` tokens between two documents is GUARANTEED to surface as
    * a shared fingerprint, while expected density stays ~2/(w+1).
    *
    * Selection rule (tie handling): a gram at position p is selected iff
    * its hash is ≤ every other hash in SOME full window containing it —
    * i.e. the run of immediately-preceding grams with hash ≥ h plus the
    * run of immediately-following grams with hash ≥ h spans a window:
    * `a + b >= w - 1`. Equal hashes (only possible for textually repeated
    * grams under the 60-bit md5 family) are ALL selected — deterministic,
    * order-free, and exactly replicable in SQL. Documents with fewer than
    * `w` grams keep their global minimum; documents shorter than `n`
    * tokens fall back to the whole-text hash at pos 0 (the shingle tier's
    * convention).
    *
    * Shape at 100 TB: one doc_id exchange; the lag/lead chain (2(w-1)
    * columns) and run arithmetic are narrow on top of that single sort —
    * no self-join against the gram stream, no per-window explode (a naive
    * windows×w explode would move w× the corpus). Downstream overlap
    * detection joins fingerprint sets — answer-sized frames. */
  def winnowFingerprints(docs: DataFrame, n: Int = 8, w: Int = 4,
                         text: String = "text"): DataFrame = {
    require(w >= 2, s"winnow window must span at least 2 grams, got $w")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val whole = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val tk = tokens(col(text))
    // byDoc: see minFingerprint — text shuffles before the explode, the
    // lag/lead window chain reuses the partitioning
    val tok = byDoc(docs.where(size(tk) >= n))
      .select(col("doc_id"), size(tk).as("_n"),
        posexplode(tk).as(Seq("pos", "tok")))
      .withColumn("th", md5Long(col("tok"))) // one md5 per token, not per gram
    val gram = (0 until n).map { i =>
      val h = if (i == 0) col("th") else lead(col("th"), i).over(win)
      rot60(h, (7 * i) % 60)
    }.reduce(_ bitwiseXOR _)
    val grams = tok.withColumn("g", gram)
      .where(col("pos") <= col("_n") - n)
      .select("doc_id", "pos", "g")
    // run of consecutive neighbours whose hash stays >= h: sum of
    // prefix-AND indicators over the lag (resp. lead) chain
    def runLen(neighbour: Int => Column): Column =
      (1 until w).foldLeft((lit(0), lit(true))) { case ((acc, pref), j) =>
        val cond = pref && neighbour(j).isNotNull && neighbour(j) >= col("g")
        (acc + cond.cast("int"), cond)
      }._1
    val a = runLen(j => lag(col("g"), j).over(win))
    val b = runLen(j => lead(col("g"), j).over(win))
    // whole-partition frame: evaluated once per partition (NOT the
    // O(rows^2) unboundedFollowing sliding frame — see verify skill)
    val cnt = count(lit(1)).over(whole)
    val mn = min(col("g")).over(whole)
    val selected = grams
      .withColumn("_sel", a + b >= w - 1 || (cnt < w && col("g") === mn))
      .where(col("_sel"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("g").as("fp"))
    val short = docs.where(size(tk) < n)
      .select(col("doc_id"), lit(0L).as("pos"), md5Long(col(text)).as("fp"))
    selected.unionByName(short)
  }

  /** Dictionary tagging (domain/topic classification by phrase list):
    * count occurrences of each dictionary phrase in each document and
    * roll up to per-(doc, tag) hit counts — the broadcast-lexicon
    * labeling pass behind source routing, topic mixing and blocklist
    * filtering in curation pipelines. Occurrences are counted by
    * substring split (`size(split(text, phrase)) − 1`), identical to a
    * literal (non-regex) scan on both engines; overlapping occurrences
    * are not double-counted, matching split semantics everywhere.
    *
    * Shape at 100 TB: the dictionary rides into the plan as a LITERAL
    * array (the q42 discipline — no join, deterministic under retry);
    * exploding it is a narrow K×N projection, per-row work O(K·len).
    * The only exchange is the final (doc, tag) partial-agg groupBy —
    * at most K rows per document. Dictionaries big enough to hurt
    * (≫10³ phrases) belong in an automaton UDF; this vectorized form
    * is for the operational lexicons (topic seeds, blocklists) that
    * are small by nature.
    *
    * @param dict (phrase, tag) pairs; phrases are LITERAL strings
    *        restricted to `[A-Za-z0-9 ]+` so the split pattern cannot
    *        be misread as a regex on the Spark side
    * @return (doc_id, tag, n_hits) for tags with n_hits > 0 */
  def dictTag(docs: DataFrame, dict: Seq[(String, String)],
              text: String = "text"): DataFrame = {
    require(dict.nonEmpty, "empty dictionary")
    dict.foreach { case (p, _) =>
      require(p.matches("[A-Za-z0-9 ]+"),
        s"phrase must match [A-Za-z0-9 ]+ (literal, not regex): '$p'")
    }
    val entries = array(dict.map { case (p, t) =>
      struct(lit(p).as("phrase"), lit(t).as("tag"))
    }: _*)
    docs
      .select(col("doc_id"), col(text).as("_t"), explode(entries).as("_d"))
      .select(col("doc_id"), col("_d.tag").as("tag"),
        (expr("size(split(_t, _d.phrase))") - 1).cast("long").as("_h"))
      .groupBy("doc_id", "tag").agg(sum("_h").as("n_hits"))
      .where(col("n_hits") > 0L)
  }

  /** Train-and-apply linear token classifier — the quality/source-filter
    * pattern (fastText-style gating à la CCNet/LLaMA data prep) reduced
    * to its deterministic core: learn per-token weights from labeled
    * docs, score held-out docs by summing weights, gate on the sign.
    *
    * All-integer, oracle-exact: the weight of token t is the difference
    * of its per-class occurrence RATES in parts-per-million,
    * `w(t) = ⌊cntA(t)·10⁶ / NA⌋ − ⌊cntB(t)·10⁶ / NB⌋` (N = total train
    * tokens of the class — the floor-div keeps everything BIGINT and
    * bounds |w| ≤ 10⁶ independent of corpus size, so a doc's score is
    * ≤ 10⁶·len and int64-safe at any scale). A test doc's score sums
    * w over its token OCCURRENCES (multiplicity counts; unseen tokens
    * weigh 0); `score ≥ 0` predicts class A. Split: `doc_id % testMod
    * == 0` is the held-out test fold, the rest trains — same fold
    * convention as q139's leak-safe split.
    *
    * Shape at 100 TB: one token-keyed partial-agg shuffle builds the
    * vocab-sized weight table (train side read once); the two class
    * totals ride a broadcast 1-row cross join; apply is explode →
    * broadcast-hash join against the weight table → per-doc partial-agg
    * sum. The test docs are never shuffled except by doc_id for their
    * own score sum; output is the 2×2 confusion matrix.
    *
    * @return (true_class, pred_class, n_docs, sum_score) */
  def tokenClassifier(docs: DataFrame, classCol: String,
                      classA: String, classB: String,
                      testMod: Int = 5, text: String = "text"): DataFrame = {
    require(classA != classB, "classes must differ")
    require(testMod >= 2, s"testMod must be >= 2: $testMod")
    val two = docs.where(col(classCol).isin(classA, classB))
      .select(col("doc_id"), col(classCol).as("_cls"), col(text).as("_t"))
    val train = two.where(pmod(col("doc_id"), lit(testMod.toLong)) =!= 0L)
    val test = two.where(pmod(col("doc_id"), lit(testMod.toLong)) === 0L)
    val w = tokenWeights(train, "_cls", classA, classB, text = "_t")
    val scored = scoreDocs(test.select(col("doc_id"), col("_cls"), col("_t")),
      w, text = "_t")
    scored
      .select(col("_cls").as("true_class"),
        when(col("score") >= 0L, classA).otherwise(classB).as("pred_class"),
        col("score"))
      .groupBy("true_class", "pred_class")
      .agg(count(lit(1)).as("n_docs"), sum("score").as("sum_score"))
  }

  /** The classifier's weight table alone: per-token ppm-rate difference
    * `⌊cntA·10⁶/NA⌋ − ⌊cntB·10⁶/NB⌋` over `train` (rows of both classes;
    * see [[tokenClassifier]] for the contract). Vocab-sized — broadcast
    * it into apply joins, or collect it for a streaming gate. */
  def tokenWeights(train: DataFrame, classCol: String,
                   classA: String, classB: String,
                   text: String = "text"): DataFrame = {
    val tok = train.select(col(classCol).as("_kcls"),
      explode(tokens(col(text))).as("term"))
    val cnt = tok.groupBy("term").agg(
      sum(when(col("_kcls") === classA, 1L).otherwise(0L)).as("_ca"),
      sum(when(col("_kcls") === classB, 1L).otherwise(0L)).as("_cb"))
      .localCheckpoint() // one materialization feeds both totals and weights
    // class totals fold the VOCAB-sized frame — no second corpus scan
    val tot = cnt.groupBy().agg(sum("_ca").as("_na"), sum("_cb").as("_nb"))
    cnt.crossJoin(broadcast(tot)) // 1-row scalar join
      .select(col("term"),
        (expr("_ca * 1000000 div _na") - expr("_cb * 1000000 div _nb"))
          .as("weight"))
  }

  /** Score documents under a (term, weight) table: per-doc sum of the
    * weights of its token occurrences (unseen tokens weigh 0). Appends
    * `score`; weights broadcast, one doc_id partial-agg exchange. */
  def scoreDocs(docs: DataFrame, weights: DataFrame,
                text: String = "text"): DataFrame = {
    require(!docs.columns.contains("term") && !docs.columns.contains("weight"),
      "scoreDocs appends internal columns term/weight — rename the clash")
    val keep = docs.columns.filterNot(_ == text).map(col).toSeq
    docs
      .select(keep :+ explode(tokens(col(text))).as("term"): _*)
      .join(broadcast(weights), Seq("term"), "left")
      .groupBy(keep: _*)
      .agg(sum(coalesce(col("weight"), lit(0L))).as("score"))
  }

  /** Classifier calibration: confusion counts + precision/recall at a
    * LITERAL threshold grid over any labeled, scored frame — the report
    * that picks a quality gate's operating point ("what survives, and
    * how clean, if I cut at t"). Predict positive iff score ≥ t.
    *
    * Exact integers throughout (`x·10⁶ div max(denominator, 1)` — the
    * empty-denominator rows read 0, never NULL/NaN, so downstream
    * gating composes). The grid rides the plan as a literal array: ONE
    * narrow ×|thresholds| fan-out over the scored frame, one
    * threshold-keyed partial-agg shuffle — never a scan per threshold.
    * The scored frame is typically [[scoreDocs]]' output (answer-sized
    * relative to the corpus), so the sweep is nearly free. */
  def thresholdSweep(scored: DataFrame, classCol: String, positive: String,
                     scoreCol: String, thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    require(thresholds.distinct.size == thresholds.size,
      s"duplicate thresholds: $thresholds")
    val pos = col(classCol) === positive
    val hit = col("_s") >= col("threshold")
    // a NULL score or class would satisfy NEITHER branch of a cell's
    // when() and silently shrink tp+fp+fn+tn below the row count —
    // exclude them EXPLICITLY (coalesce upstream if they must count;
    // scoreDocs never emits NULL scores)
    scored
      .where(col(scoreCol).isNotNull && col(classCol).isNotNull)
      .select(col(classCol), col(scoreCol).as("_s"),
        explode(array(thresholds.map(lit): _*)).as("threshold"))
      .groupBy("threshold")
      .agg(
        sum(when(hit && pos, 1L).otherwise(0L)).as("tp"),
        sum(when(hit && !pos, 1L).otherwise(0L)).as("fp"),
        sum(when(!hit && pos, 1L).otherwise(0L)).as("fn"),
        sum(when(!hit && !pos, 1L).otherwise(0L)).as("tn"))
      .withColumn("precision_e6",
        expr("(tp * 1000000) div greatest(tp + fp, 1L)"))
      .withColumn("recall_e6",
        expr("(tp * 1000000) div greatest(tp + fn, 1L)"))
  }
}
