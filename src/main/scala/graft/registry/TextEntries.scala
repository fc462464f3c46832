package graft.registry

import graft.hta.{AggOps, Queries, Scoped, Series, Throttle}
import graft.model.{IntervalScope, Scope}
import graft.pipeline.{Ann, Cdc, Curate, Dedup, Eval, Joins, Multimodal, Packing, Profile, Sampling, Sketches, TextOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Shared._

/** Text analysis and training-data curation: quality signals,
  * tokenization, sampling/selection, fingerprinting, mixtures, shards. */
private[registry] object TextEntries {
  val entries: Seq[Entry] = Seq(

    // ---- text fingerprinting (winnowing-style min-hash of 8-gram windows) ----
    Entry("q23_fingerprint",
      (s, d) => TextOps.minFingerprint(docs(s, d), w = 8).orderBy("doc_id"),
      Some {
        // window hash = XOR of positionally-rotated 60-bit token hashes;
        // rotation rendered as overflow-free div/mod (TextOps.rot60Sql)
        val combine = (0 until 8)
          .map(i => TextOps.rot60Sql(s"hs[i+$i]", (7 * i) % 60))
          .reduce((a, b) => s"xor($a, $b)")
        s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS s FROM documents),
           |h AS (SELECT doc_id, text,
           |        [CAST('0x' || substr(md5(x), 1, 15) AS BIGINT) for x in s] AS hs
           |      FROM t),
           |g AS (SELECT doc_id, text,
           |        CASE WHEN len(hs) >= 8 THEN
           |          [$combine for i in range(1, len(hs) - 6)]
           |        ELSE NULL END AS gs
           |      FROM h)
           |SELECT doc_id,
           |  CASE WHEN gs IS NOT NULL THEN list_min(gs)
           |       ELSE CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) END AS fingerprint
           |FROM g ORDER BY 1""".stripMargin
      }),

    // ---- quality scoring (ratios of exact integers → deterministic doubles) ----
    Entry("q24_quality",
      (s, d) => TextOps.qualityScore(docs(s, d)).orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS s FROM documents),
              |v AS (SELECT doc_id,
              |  CAST(len(s) AS BIGINT) AS n_tokens,
              |  CAST(len(list_distinct(s)) AS BIGINT) AS n_uniq,
              |  CAST(length(text) - len(s) + 1 AS BIGINT) AS tok_chars,
              |  CAST(len(list_filter(s, x -> x IN (${TextOps.EnStop.map(w => s"'$w'").mkString(",")}))) AS BIGINT) AS stop_cnt
              |  FROM t)
              |SELECT doc_id,
              |  CAST(stop_cnt AS DOUBLE) / n_tokens AS stop_ratio,
              |  CAST(n_uniq AS DOUBLE) / n_tokens AS uniq_ratio,
              |  CAST(tok_chars AS DOUBLE) / n_tokens AS mean_tok_len,
              |  (stop_cnt >= 1 AND n_tokens >= 10) AS quality_ok
              |FROM v ORDER BY 1""".stripMargin)),

    // ---- LLM pipeline: text analysis ----
    Entry("q16_text_stats",
      (s, d) => TextOps.tokenStats(docs(s, d)).orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS s FROM documents)
              |SELECT doc_id, CAST(len(s) AS BIGINT) AS n_tokens,
              |  CAST(len(list_distinct(s)) AS BIGINT) AS n_uniq,
              |  CAST(length(text) AS BIGINT) AS len_chars,
              |  CAST(length(text) - len(s) + 1 AS BIGINT) AS tok_chars,
              |  CAST(len(list_filter(s, x -> x IN (${TextOps.EnStop.map(w => s"'$w'").mkString(",")}))) AS BIGINT) AS stop_cnt,
              |  CAST((length(text) + 3) // 4 AS BIGINT) AS tok_est,
              |  CAST(len(regexp_extract_all(text, '${TextOps.BpeSplit}')) AS BIGINT) AS tok_bpe
              |FROM t ORDER BY 1""".stripMargin)),

    Entry("q17_lang_id",
      (s, d) => TextOps.langId(docs(s, d)).orderBy("doc_id"),
      Some {
        def hits(ws: Seq[String]) =
          s"CAST(len(list_filter(s, x -> x IN (${ws.map(w => s"'$w'").mkString(",")}))) AS BIGINT)"
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
           |v AS (SELECT doc_id, ${hits(TextOps.EnStop)} AS en_hits,
           |  ${hits(TextOps.DeStop)} AS de_hits, ${hits(TextOps.FrStop)} AS fr_hits FROM t)
           |SELECT doc_id, en_hits, de_hits, fr_hits,
           |  CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
           |       WHEN de_hits >= fr_hits THEN 'de' ELSE 'fr' END AS lang_pred
           |FROM v ORDER BY 1""".stripMargin
      }),

    // deterministic corpus splitting: content-hash buckets, not rand() —
    // reproducible run-to-run and stable under corpus refresh. The oracle
    // renders the identical 60-bit md5-prefix arithmetic.
    Entry("q39_hash_split",
      (s, d) => Sampling.hashSplit(docs(s, d).select("doc_id"), "doc_id",
          weights = Seq(0.9, 0.05, 0.05), labels = Seq("train", "val", "test"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CASE WHEN b < 900000 THEN 'train'
             |       WHEN b < 950000 THEN 'val' ELSE 'test' END AS split
             |FROM (SELECT doc_id,
             |        CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
             |          % 1000000 AS b
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // per-key quota (the per-domain/source cap of corpus curation): first
    // 50 events per metric by time. Time is strictly increasing per metric
    // (F5 contract), so the row_number order is total and deterministic.
    Entry("q40_per_key_cap",
      (s, d) => Sampling.perKeyCap(ev(s, d).select("metric", "time", "cents"),
          "metric", Seq(col("time")), k = 50)
        .orderBy("metric", "time"),
      Some(s"""WITH $ptsCte
              |SELECT metric, time, cents
              |FROM (SELECT metric, time, cents,
              |        row_number() OVER (PARTITION BY metric ORDER BY time) AS rn
              |      FROM pts)
              |WHERE rn <= 50 ORDER BY metric, time""".stripMargin)),

    // sequence packing: global prefix sum computed WITHOUT a global window
    // (range partition + local windows + broadcast offsets); the result is
    // partition-invariant, so the single-window SQL is an exact oracle
    Entry("q42_pack_sequences",
      (s, d) => Packing.packSequences(docs(s, d), budget = 512)
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id,
             |            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |          FROM documents),
             |c AS (SELECT doc_id, n_tokens,
             |        sum(n_tokens) OVER (ORDER BY doc_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS cb
             |      FROM t)
             |SELECT doc_id, n_tokens,
             |       CAST(cb // 512 AS BIGINT) AS seq_id,
             |       CAST(cb % 512 AS BIGINT) AS seq_offset
             |FROM c ORDER BY doc_id""".stripMargin)),

    // corpus vocabulary: the (tf desc, token) order is total, so the
    // top-100 cut is deterministic in both engines
    Entry("q41_vocabulary",
      (s, d) => TextOps.vocabulary(docs(s, d), topK = 100),
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |            FROM documents)
             |SELECT token, CAST(count(*) AS BIGINT) AS tf,
             |       CAST(count(DISTINCT doc_id) AS BIGINT) AS df
             |FROM tok GROUP BY token
             |ORDER BY tf DESC, token LIMIT 100""".stripMargin)),

    // ---- Gopher-style repetition quality signals: Spark counts 60-bit
    //      gram hashes, the oracle counts textual grams — counts agree by
    //      gram-hash injectivity (q15's argument) ----
    Entry("q44_repetition",
      (s, d) => TextOps.repetitionStats(docs(s, d)).orderBy("doc_id"),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
             |t AS (SELECT doc_id, unnest(s) AS g FROM d),
             |b AS (SELECT doc_id, unnest([s[i] || ' ' || s[i+1] for i in range(1, len(s))]) AS g
             |      FROM d WHERE len(s) >= 2),
             |tr AS (SELECT doc_id, unnest([s[i] || ' ' || s[i+1] || ' ' || s[i+2] for i in range(1, len(s)-1)]) AS g
             |       FROM d WHERE len(s) >= 3),
             |tc AS (SELECT doc_id, max(c) AS top_token_cnt
             |       FROM (SELECT doc_id, g, count(*) AS c FROM t GROUP BY 1, 2) GROUP BY 1),
             |bc AS (SELECT doc_id, max(c) AS top_bigram_cnt
             |       FROM (SELECT doc_id, g, count(*) AS c FROM b GROUP BY 1, 2) GROUP BY 1),
             |dc AS (SELECT doc_id, sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup3
             |       FROM (SELECT doc_id, g, count(*) AS c FROM tr GROUP BY 1, 2) GROUP BY 1)
             |SELECT d.doc_id, CAST(len(d.s) AS BIGINT) AS n_tokens,
             |  tc.top_token_cnt, bc.top_bigram_cnt,
             |  CAST(coalesce(dc.dup3, 0) AS BIGINT) AS dup_trigram_cnt,
             |  CAST(tc.top_token_cnt AS DOUBLE) / len(d.s) AS top_token_frac,
             |  CAST(bc.top_bigram_cnt AS DOUBLE) / (len(d.s) - 1) AS top_bigram_frac,
             |  CASE WHEN len(d.s) >= 3
             |    THEN CAST(coalesce(dc.dup3, 0) AS DOUBLE) / (len(d.s) - 2) END AS dup_trigram_frac
             |FROM d LEFT JOIN tc USING (doc_id) LEFT JOIN bc USING (doc_id)
             |  LEFT JOIN dc USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // ---- per-doc top-k keywords; integer tf-idf-style score so both
    //      engines rank identically (ln-based idf differs by libm ulps) ----
    Entry("q47_keywords",
      (s, d) => TextOps.keywords(docs(s, d), k = 5).orderBy("doc_id", "rnk"),
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |             FROM documents),
             |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
             |       FROM tok GROUP BY 1, 2),
             |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
             |sc AS (SELECT doc_id, token, tf, df, tf * 1000000 // df AS score
             |       FROM tf JOIN df USING (token)),
             |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
             |         ORDER BY score DESC, token) AS BIGINT) AS rnk
             |      FROM sc)
             |SELECT doc_id, token, tf, df, score, rnk FROM r
             |WHERE rnk <= 5 ORDER BY doc_id, rnk""".stripMargin)),

    // ---- deterministic mixture resampling: per-source keep fractions over
    //      the same md5 bucket arithmetic as q39 ----
    Entry("q45_mixture_sample",
      (s, d) => Sampling.mixtureSample(docs(s, d).select("doc_id", "source"),
          "source", "doc_id", Map("src0" -> 0.5, "src1" -> 0.25), default = 0.1)
        .orderBy("doc_id"),
      Some("""SELECT doc_id, source
             |FROM (SELECT doc_id, source,
             |        CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
             |          % 1000000 AS b
             |      FROM documents)
             |WHERE b < CASE source WHEN 'src0' THEN 500000
             |                      WHEN 'src1' THEN 250000 ELSE 100000 END
             |ORDER BY doc_id""".stripMargin)),

    // ---- PII scrub: counts + ordered regexp_replace parity. The corpus
    //      text has no PII shapes, so deterministic PII is woven in from
    //      doc_id IDENTICALLY on both sides (docs with doc_id % 3 = 0 stay
    //      clean — the zero-count path is exercised too). Patterns live in
    //      the Java/RE2-agreeing regex subset (TextOps.EmailRe notes). ----
    Entry("q50_redact_pii",
      (s, d) => {
        val seeded = docs(s, d).select(col("doc_id"),
          when(col("doc_id") % 3 === 0, col("text")).otherwise(concat(
            col("text"), lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com via 10.0."), (col("doc_id") % 256).cast("string"),
            lit(".7 ext 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).as("text"))
        TextOps.redactPii(seeded).orderBy("doc_id")
      },
      Some(s"""WITH p AS (SELECT doc_id,
              |  CASE WHEN doc_id % 3 = 0 THEN text
              |       ELSE text || ' contact user' || CAST(doc_id AS VARCHAR) ||
              |            '@example.com via 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
              |            '.7 ext 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              |  END AS text FROM documents),
              |r AS (SELECT doc_id,
              |  CAST(len(regexp_extract_all(text, '${TextOps.EmailRe}')) AS BIGINT) AS n_email,
              |  CAST(len(regexp_extract_all(text, '${TextOps.Ipv4Re}')) AS BIGINT) AS n_ip,
              |  CAST(len(regexp_extract_all(text, '${TextOps.PhoneRe}')) AS BIGINT) AS n_phone,
              |  regexp_replace(regexp_replace(regexp_replace(text,
              |    '${TextOps.EmailRe}', '<EMAIL>', 'g'),
              |    '${TextOps.Ipv4Re}', '<IP>', 'g'),
              |    '${TextOps.PhoneRe}', '<PHONE>', 'g') AS red_text
              |  FROM p)
              |SELECT doc_id, n_email, n_ip, n_phone, red_text,
              |       lower(regexp_replace(red_text, ' +', ' ', 'g')) AS norm_text
              |FROM r ORDER BY doc_id""".stripMargin)),

    // ---- one-call corpus curation verdict: exact-dup survivor + quality +
    //      Gopher repetition gates (integer-arithmetic comparisons), reason
    //      = first failing gate, lang_pred as routing metadata ----
    Entry("q53_curate",
      (s, d) => Curate.curate(docs(s, d), topTokenPctMax = 15,
          dupTrigramPctMax = 10)
        .orderBy("doc_id"),
      Some {
        def hits(ws: Seq[String]) =
          s"len(list_filter(s, x -> x IN (${ws.map(w => s"'$w'").mkString(",")})))"
        s"""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS s FROM documents),
           |fl AS (SELECT doc_id,
           |  (${hits(TextOps.EnStop)} >= 1 AND len(s) >= 10) AS quality_ok,
           |  CASE WHEN ${hits(TextOps.EnStop)} >= ${hits(TextOps.DeStop)}
           |         AND ${hits(TextOps.EnStop)} >= ${hits(TextOps.FrStop)} THEN 'en'
           |       WHEN ${hits(TextOps.DeStop)} >= ${hits(TextOps.FrStop)} THEN 'de'
           |       ELSE 'fr' END AS lang_pred FROM d),
           |cn AS (SELECT doc_id,
           |  (doc_id = min(doc_id) OVER (PARTITION BY md5(text))) AS canonical FROM d),
           |tc AS (SELECT doc_id, max(c) AS topc
           |       FROM (SELECT doc_id, g, count(*) AS c
           |             FROM (SELECT doc_id, unnest(s) AS g FROM d) GROUP BY 1, 2)
           |       GROUP BY 1),
           |dc AS (SELECT doc_id, sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup3
           |       FROM (SELECT doc_id, g, count(*) AS c
           |             FROM (SELECT doc_id, unnest([s[i] || ' ' || s[i+1] || ' ' || s[i+2]
           |                                          for i in range(1, len(s)-1)]) AS g
           |                   FROM d WHERE len(s) >= 3) GROUP BY 1, 2)
           |       GROUP BY 1),
           |j AS (SELECT d.doc_id, len(d.s) AS n, fl.quality_ok, fl.lang_pred,
           |             cn.canonical, tc.topc, coalesce(dc.dup3, 0) AS dup3
           |      FROM d JOIN fl USING (doc_id) JOIN cn USING (doc_id)
           |        JOIN tc USING (doc_id) LEFT JOIN dc USING (doc_id)),
           |r AS (SELECT doc_id, lang_pred, canonical, quality_ok,
           |        (topc * 100 <= n * 15 AND (n < 3 OR dup3 * 100 <= (n - 2) * 10))
           |          AS rep_ok FROM j)
           |SELECT doc_id, lang_pred, canonical, quality_ok, rep_ok,
           |  (CASE WHEN NOT canonical THEN 'dup'
           |        WHEN NOT quality_ok THEN 'quality'
           |        WHEN NOT rep_ok THEN 'repetition' ELSE 'ok' END = 'ok') AS keep,
           |  CASE WHEN NOT canonical THEN 'dup'
           |       WHEN NOT quality_ok THEN 'quality'
           |       WHEN NOT rep_ok THEN 'repetition' ELSE 'ok' END AS reason
           |FROM r ORDER BY doc_id""".stripMargin
      }),

    // ---- vocabulary encoding: docs -> (pos, tok_id) rows under the
    //      rank-ordered top-20 vocabulary, OOV -> -1. topK=20 < corpus
    //      vocab so the UNK path is exercised on real data ----
    Entry("q55_encode",
      (s, d) => TextOps.encodeDocs(docs(s, d),
          TextOps.vocabularyWithIds(docs(s, d), topK = 20))
        .orderBy("doc_id", "pos"),
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token,
             |                    unnest(range(0, len(string_split(text, ' ')))) AS pos
             |             FROM documents),
             |v AS (SELECT token, count(*) AS tf FROM tok GROUP BY token),
             |vr AS (SELECT token,
             |         CAST(row_number() OVER (ORDER BY tf DESC, token) - 1 AS BIGINT)
             |           AS tok_id
             |       FROM (SELECT token, tf FROM v ORDER BY tf DESC, token LIMIT 20))
             |SELECT t.doc_id, CAST(t.pos AS BIGINT) AS pos,
             |       coalesce(vr.tok_id, -1) AS tok_id
             |FROM tok t LEFT JOIN vr USING (token)
             |ORDER BY doc_id, pos""".stripMargin)),

    // ---- exact token heavy hitters via per-partition Misra-Gries
    //      candidates + exact recount: the sketch prunes, SQL-identical
    //      exact counts decide, so the plain GROUP BY oracle matches ----
    Entry("q62_heavy_hitters",
      (s, d) => Sketches.heavyHitters(
          docs(s, d).select(explode(TextOps.tokens(col("text"))).as("token")),
          "token", k = 40)
        .orderBy(desc("cnt"), asc("value")),
      Some("""WITH t AS (SELECT unnest(string_split(text, ' ')) AS v
             |           FROM documents),
             |n AS (SELECT count(*) AS c FROM t)
             |SELECT v AS value, CAST(count(*) AS BIGINT) AS cnt
             |FROM t, n GROUP BY v, n.c HAVING count(*) * 40 > c
             |ORDER BY cnt DESC, value""".stripMargin)),

    // ---- BPE merge learning: the tokenizer-training step upstream of
    //      q55's encode. The iterative corpus-wide argmax isn't expressible
    //      as a single-reference recursive CTE, but the iteration count is
    //      a LITERAL — so the oracle unrolls all 30 (argmax, apply) steps
    //      as a generated materialized-CTE chain (see bpeLearnOracleSql;
    //      testdata is all-ASCII at every SF, so Spark's UTF-16 char split
    //      and DuckDB's byte split agree exactly). BpeSpec additionally
    //      pins the learner against a reference single-machine trainer ----
    Entry("q63_bpe_merges",
      (s, d) => TextOps.learnBpeMerges(docs(s, d), numMerges = 30)
        .orderBy("rank"),
      Some(bpeLearnOracleSql(numMerges = 30, minCount = 2L))),

    // ---- keyword search: exact-integer tf-idf top-k (the q47 scaling) ----
    Entry("q65_search",
      (s, d) => TextOps.searchTopK(docs(s, d),
        Seq("join", "filter", "vector"), k = 10),
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |           FROM documents),
             |f AS (SELECT doc_id, token, count(*) AS tf FROM t
             |      WHERE token IN ('join', 'filter', 'vector') GROUP BY 1, 2),
             |i AS (SELECT token,
             |        ((SELECT count(*) FROM documents) * 1000000) // count(*) AS idf_scaled
             |      FROM f GROUP BY token)
             |SELECT doc_id, CAST(sum(f.tf * i.idf_scaled) AS BIGINT) AS score
             |FROM f JOIN i USING (token) GROUP BY doc_id
             |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)),

    // ---- feature-hashed doc vectors: text -> the embedding tier with no
    //      external model. The operator returns dense float arrays (what
    //      Ann consumes); the registered query EXPLODES them to scalar
    //      (doc_id, j, cnt) rows because the driver's hash compare (and
    //      localcheck) cannot hash array cells — the integral float
    //      elements cast back to BIGINT exactly, so the explode loses
    //      nothing ----
    Entry("q66_hash_vectorize",
      (s, d) => TextOps.hashVectorize(docs(s, d), dim = 64)
        .select(col("doc_id"), posexplode(col("vec")).as(Seq("j", "cnt")))
        .select(col("doc_id"), col("j").cast("long").as("j"),
          col("cnt").cast("long").as("cnt"))
        .orderBy("doc_id", "j"),
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |           FROM documents),
             |b AS (SELECT doc_id,
             |        CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 64 AS b
             |      FROM t),
             |c AS (SELECT doc_id, b, count(*) AS c FROM b GROUP BY 1, 2),
             |j AS (SELECT range AS j FROM range(0, 64))
             |SELECT d.doc_id, j.j, CAST(coalesce(c.c, 0) AS BIGINT) AS cnt
             |FROM (SELECT DISTINCT doc_id FROM documents) d
             |CROSS JOIN j
             |LEFT JOIN c ON c.doc_id = d.doc_id AND c.b = j.j
             |ORDER BY 1, 2""".stripMargin)),

    // ---- tokenizer APPLY (the other half of q63's learner): segment every
    //      English doc into subword tokens under a fixed merge table. The
    //      merge table is literal in BOTH plans (a learned table would need
    //      the learner inside the oracle — q63's non-expressible part);
    //      the apply semantics themselves get a full hash oracle via the
    //      boundary-anchored replace chain, mirrored as a DuckDB recursive
    //      CTE stepping rank-by-rank through the same replaces ----
    Entry("q73_bpe_apply",
      (s, d) => {
        import s.implicits._
        val merges = bpeApplyMerges.zipWithIndex
          .map { case ((a, b), r) => (r.toLong, a, b) }
          .toDF("rank", "a", "b")
        // ASCII-sanitized like q61: Spark chars are code points, DuckDB
        // bytes — identical on printable ASCII
        val en = docs(s, d).where(col("lang") === "en")
          .select(col("doc_id"),
            regexp_replace(col("text"), "[^ -~]", "").as("text"))
        TextOps.applyBpe(en, merges).orderBy("doc_id", "pos", "spos")
      },
      Some(s"""WITH RECURSIVE
              |en AS (SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS text
              |       FROM documents WHERE lang = 'en'),
              |m AS (SELECT * FROM (VALUES ${bpeApplyMerges.zipWithIndex
                 .map { case ((a, b), r) => s"($r,'$a','$b')" }
                 .mkString(",")}) t(rank, a, b)),
              |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
              |               unnest(range(0, len(string_split(text, ' ')))) AS pos
              |        FROM en),
              |tokf AS (SELECT * FROM tok WHERE w != ''),
              |w0 AS (SELECT DISTINCT w FROM tokf),
              |seq0 AS (SELECT w, chr(31) || array_to_string(
              |           list_append(regexp_split_to_array(w, ''), '</w>'),
              |           chr(31) || chr(31)) || chr(31) AS seq FROM w0),
              |rec AS (SELECT w, seq, 0 AS step FROM seq0
              |        UNION ALL
              |        SELECT r.w, replace(r.seq,
              |            chr(31) || m.a || chr(31) || chr(31) || m.b || chr(31),
              |            chr(31) || m.a || m.b || chr(31)) AS seq,
              |          r.step + 1 AS step
              |        FROM rec r JOIN m ON m.rank = r.step),
              |fin AS (SELECT w, seq FROM rec WHERE step = ${bpeApplyMerges.size}),
              |segs AS (SELECT w, string_split(trim(seq, chr(31)),
              |                 chr(31) || chr(31)) AS toks FROM fin),
              |ex AS (SELECT w, unnest(toks) AS token,
              |              unnest(range(0, len(toks))) AS spos FROM segs)
              |SELECT t.doc_id, CAST(t.pos AS BIGINT) AS pos,
              |       CAST(e.spos AS BIGINT) AS spos, e.token
              |FROM tokf t JOIN ex e USING (w)
              |ORDER BY doc_id, pos, spos""".stripMargin)),

    // ---- collocations by exact-integer lift: the word2vec phrase pass
    //      with the log dropped (ranking-equivalent to PMI); bigrams off
    //      a doc-keyed lead window, unigram joins vocabulary-sized ----
    Entry("q105_collocations",
      (s, d) => TextOps.collocations(docs(s, d), minCount = 5L, k = 50),
      Some("""WITH tt AS (SELECT doc_id, string_split(text, ' ') AS s
             |            FROM documents),
             |bgx AS (SELECT unnest([{'w1': s[i], 'w2': s[i+1]}
             |                      for i in range(1, len(s))]) AS b
             |        FROM tt),
             |bg AS (SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS c_xy
             |       FROM bgx GROUP BY 1, 2 HAVING count(*) >= 5),
             |un AS (SELECT unnest(s) AS t FROM tt),
             |uc AS (SELECT t, count(*) AS c FROM un GROUP BY 1),
             |nt AS (SELECT count(*) AS n FROM un)
             |SELECT w1, w2, c_xy, x.c AS c_x, y.c AS c_y,
             |  CAST((c_xy * nt.n * 1000000) // (x.c * y.c) AS BIGINT) AS lift_e6
             |FROM bg JOIN uc x ON bg.w1 = x.t
             |        JOIN uc y ON bg.w2 = y.t, nt
             |ORDER BY lift_e6 DESC, w1, w2 LIMIT 50""".stripMargin)),

    // ---- retrieval chunking: overlapping 40-token windows at stride 30
    //      — a narrow projection (explode + slice), zero shuffles ----
    Entry("q107_chunk_docs",
      (s, d) => TextOps.chunkDocs(docs(s, d), window = 40, stride = 30)
        .orderBy("doc_id", "chunk_id"),
      Some("""WITH tt AS (SELECT doc_id, string_split(text, ' ') AS s
             |            FROM documents),
             |c AS (SELECT doc_id, len(s) AS n,
             |        unnest([{'k': k, 'c': array_to_string(s[k*30+1 : k*30+40], ' ')}
             |                for k in range(0, (len(s)-1)//30 + 1)]) AS u
             |      FROM tt WHERE len(s) > 0)
             |SELECT doc_id, CAST(u.k AS BIGINT) AS chunk_id,
             |  CAST(u.k*30 AS BIGINT) AS start_tok,
             |  CAST(least(40, n - u.k*30) AS BIGINT) AS n_tok,
             |  u.c AS chunk
             |FROM c ORDER BY doc_id, chunk_id""".stripMargin)),

    // ---- bigram-fluency quality scoring: mean corpus-wide conditional
    //      bigram probability per doc in fixed point — the LM-style
    //      fluency signal without a model or a log ----
    Entry("q111_fluency",
      (s, d) => TextOps.bigramFluency(docs(s, d)).orderBy("doc_id"),
      Some("""WITH tt AS (SELECT doc_id, string_split(text, ' ') AS s
             |            FROM documents),
             |bgx AS (SELECT doc_id, unnest([{'w1': s[i], 'w2': s[i+1]}
             |                              for i in range(1, len(s))]) AS b
             |        FROM tt),
             |bg AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bgx),
             |cxy AS (SELECT w1, w2, count(*) AS c_xy FROM bg GROUP BY 1, 2),
             |cx AS (SELECT w1, count(*) AS c_x FROM bg GROUP BY 1),
             |p AS (SELECT bg.doc_id, (cxy.c_xy * 1000000) // cx.c_x AS p
             |      FROM bg JOIN cxy USING (w1, w2) JOIN cx USING (w1))
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             |  CAST(sum(p) // count(*) AS BIGINT) AS fluency_e6
             |FROM p GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- importance sampling: per-ROW keep probability (here a length
    //      prior) over the same content-hash buckets as q39 — the
    //      quality-weighted corpus construction step ----
    Entry("q112_weighted_sample",
      (s, d) => {
        val w = least(lit(1000000L), col("n_chars").cast("long") * 1500L)
        Sampling.weightedSample(
            docs(s, d).select(col("doc_id"), col("n_chars")), "doc_id", w)
          .withColumn("weight_e6", w)
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, n_chars,
             |  least(1000000, n_chars * 1500) AS weight_e6
             |FROM (SELECT doc_id, n_chars,
             |        CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
             |          % 1000000 AS b
             |      FROM documents)
             |WHERE b < least(1000000, n_chars * 1500)
             |ORDER BY doc_id""".stripMargin)),

    // ---- capstone corpus pipeline: exact-dup survivorship → bigram
    //      fluency over the SURVIVOR corpus → fluency floor → importance
    //      sample weighted by the fluency margin — four verified operators
    //      composed end-to-end in one plan, one oracle ----
    Entry("q113_corpus_pipeline",
      (s, d) => {
        val all = docs(s, d)
        val sur = all.groupBy(md5(col("text")).as("_h"))
          .agg(min("doc_id").as("doc_id"))
        val corpus = all.join(sur.select("doc_id"), "doc_id")
        val fl = TextOps.bigramFluency(corpus)
        val weighted = fl.where(col("fluency_e6") >= 34000L)
          .withColumn("weight_e6",
            least(lit(1000000L),
              greatest(lit(0L), (col("fluency_e6") - 30000L) * 50L)))
        Sampling.weightedSample(weighted, "doc_id", col("weight_e6"))
          .orderBy("doc_id")
      },
      Some("""WITH sur AS (SELECT min(doc_id) AS doc_id FROM documents
             |             GROUP BY md5(text)),
             |d2 AS (SELECT d.doc_id, d.text FROM documents d
             |       JOIN sur USING (doc_id)),
             |tt AS (SELECT doc_id, string_split(text, ' ') AS s FROM d2),
             |bgx AS (SELECT doc_id, unnest([{'w1': s[i], 'w2': s[i+1]}
             |                              for i in range(1, len(s))]) AS b
             |        FROM tt),
             |bg AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bgx),
             |cxy AS (SELECT w1, w2, count(*) AS c_xy FROM bg GROUP BY 1, 2),
             |cx AS (SELECT w1, count(*) AS c_x FROM bg GROUP BY 1),
             |p AS (SELECT bg.doc_id, (cxy.c_xy * 1000000) // cx.c_x AS p
             |      FROM bg JOIN cxy USING (w1, w2) JOIN cx USING (w1)),
             |fl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             |         CAST(sum(p) // count(*) AS BIGINT) AS fluency_e6
             |       FROM p GROUP BY 1),
             |g AS (SELECT *, least(1000000,
             |        greatest(0, (fluency_e6 - 30000) * 50)) AS w
             |      FROM fl WHERE fluency_e6 >= 34000)
             |SELECT doc_id, n_bigrams, fluency_e6, CAST(w AS BIGINT) AS weight_e6
             |FROM g
             |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
             |      % 1000000 < w
             |ORDER BY doc_id""".stripMargin)),

    // ---- readability: Flesch reading-ease in e3 fixed point over the
    //      standard cheap proxies (sentence = [.!?] run, syllable =
    //      vowel-group run) — narrow, shuffle-free, bit-reproducible ----
    Entry("q123_readability",
      (s, d) => TextOps.readability(docs(s, d)).orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS s
             |           FROM documents),
             |v AS (SELECT doc_id,
             |        CAST(len(s) AS BIGINT) AS n_words,
             |        greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS n_sentences,
             |        CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
             |      FROM t)
             |SELECT doc_id, n_words, n_sentences, n_syllables,
             |  CAST(n_words * 1000 // n_sentences AS BIGINT) AS wps_e3,
             |  CAST(n_syllables * 1000 // greatest(1, n_words) AS BIGINT) AS spw_e3,
             |  CAST(206835
             |    - (1015 * (n_words * 1000 // n_sentences)) // 1000
             |    - (84600 * (n_syllables * 1000 // greatest(1, n_words))) // 1000
             |    AS BIGINT) AS flesch_e3
             |FROM v ORDER BY 1""".stripMargin)),

    // ---- deterministic epoch shuffle: reproducible training-order
    //      permutation as contiguous positions — range-partitioned sort +
    //      zipWithIndex two-phase offsets, never a row_number() OVER ()
    //      single-reducer window ----
    Entry("q126_epoch_shuffle",
      (s, d) => Sampling.deterministicShuffle(
          docs(s, d).select("doc_id", "n_chars"), "doc_id", salt = "ep1")
        .orderBy("shuffle_pos"),
      Some("""SELECT doc_id, n_chars,
             |  CAST(row_number() OVER (ORDER BY
             |    CAST('0x' || substr(md5('ep1|' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT),
             |    doc_id) - 1 AS BIGINT) AS shuffle_pos
             |FROM documents ORDER BY 3""".stripMargin)),

    // ---- dictionary tagging: broadcast-lexicon topic labeling — the
    //      dictionary is a plan LITERAL (narrow K×N explode, no join),
    //      one (doc, tag) partial-agg shuffle ----
    Entry("q129_dict_tags",
      (s, d) => TextOps.dictTag(docs(s, d), dictTagLexicon)
        .orderBy("doc_id", "tag"),
      Some {
        val values = dictTagLexicon
          .map { case (p, t) => s"('$p', '$t')" }.mkString(", ")
        s"""WITH dict(phrase, tag) AS (VALUES $values),
           |h AS (SELECT d.doc_id, dict.tag,
           |        CAST(len(string_split(d.text, dict.phrase)) - 1 AS BIGINT) AS h
           |      FROM documents d, dict)
           |SELECT doc_id, tag, CAST(sum(h) AS BIGINT) AS n_hits
           |FROM h GROUP BY 1, 2 HAVING sum(h) > 0
           |ORDER BY 1, 2""".stripMargin
      }),

    // ---- positional phrase search: consecutive-token match via a
    //      postings chain join — precision tier over q65's bag-of-words;
    //      postings filtered to phrase terms before any exchange ----
    Entry("q131_phrase_search",
      (s, d) => TextOps.phraseSearch(docs(s, d), Seq("hash", "join"))
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS s
             |           FROM documents),
             |m AS (SELECT doc_id,
             |        len([i for i in range(1, len(s))
             |             if s[i] = 'hash' AND s[i+1] = 'join']) AS n_matches
             |      FROM t)
             |SELECT doc_id, CAST(n_matches AS BIGINT) AS n_matches
             |FROM m WHERE n_matches > 0 ORDER BY doc_id""".stripMargin)),

    // ---- temperature-scaled mixture shares: sqrt weights over source
    //      counts, normalizer as an ORDERED cumulative sum (defined
    //      summation order → cross-engine bit parity) ----
    Entry("q142_temperature_mix",
      (s, d) => Sampling.temperatureShares(docs(s, d), "source")
        .orderBy("source"),
      Some("""WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n
             |           FROM documents GROUP BY 1),
             |w AS (SELECT source, n, sqrt(CAST(n AS DOUBLE)) AS w FROM c),
             |x AS (SELECT source, n, w,
             |        sum(w) OVER (ORDER BY source
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |      FROM w),
             |y AS (SELECT source, n, w, max(cum) OVER () AS tot FROM x)
             |SELECT source, n, w,
             |  CAST(floor(w * 1000000 / tot) AS BIGINT) AS share_e6
             |FROM y ORDER BY source""".stripMargin)),

    // ---- keyword-in-context concordance: q131's matches with ±3
    //      tokens of context, edge-clamped slices ----
    Entry("q152_concordance",
      (s, d) => TextOps.concordance(docs(s, d), Seq("hash", "join"),
          context = 3)
        .orderBy("doc_id", "pos"),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS s
             |           FROM documents),
             |mm AS (SELECT doc_id,
             |         unnest([i for i in range(1, len(s))
             |                 if s[i] = 'hash' AND s[i+1] = 'join']) AS p
             |       FROM t)
             |SELECT mm.doc_id, CAST(mm.p - 1 AS BIGINT) AS pos,
             |  array_to_string(
             |    t.s[greatest(1, mm.p - 3):least(len(t.s), mm.p + 4)], ' ')
             |    AS snippet
             |FROM mm JOIN t USING (doc_id)
             |ORDER BY 1, 2""".stripMargin)),

    // ---- linear token classifier (fastText-style quality/source gate):
    //      ppm-rate difference weights from the train fold, sign-gated
    //      test predictions, 2×2 confusion output. All-integer (floor-div
    //      rates), so the SQL replay is bit-exact. ----
    Entry("q158_token_classifier",
      (s, d) => TextOps.tokenClassifier(docs(s, d), "lang", "en", "de")
        .orderBy("true_class", "pred_class"),
      Some("""WITH two AS (SELECT doc_id, lang AS cls, text
             |             FROM documents WHERE lang IN ('en', 'de')),
             |tok AS (SELECT cls, unnest(string_split(text, ' ')) AS term
             |        FROM two WHERE doc_id % 5 <> 0),
             |cnt AS (SELECT term,
             |          count(*) FILTER (cls = 'en') AS ca,
             |          count(*) FILTER (cls = 'de') AS cb
             |        FROM tok GROUP BY 1),
             |tot AS (SELECT count(*) FILTER (cls = 'en') AS na,
             |               count(*) FILTER (cls = 'de') AS nb FROM tok),
             |w AS (SELECT term,
             |        (ca * 1000000) // na - (cb * 1000000) // nb AS w
             |      FROM cnt, tot),
             |sc AS (SELECT t.doc_id, t.cls,
             |         CAST(coalesce(sum(w.w), 0) AS BIGINT) AS score
             |       FROM (SELECT doc_id, cls,
             |               unnest(string_split(text, ' ')) AS term
             |             FROM two WHERE doc_id % 5 = 0) t
             |       LEFT JOIN w ON t.term = w.term
             |       GROUP BY 1, 2),
             |pr AS (SELECT cls AS true_class,
             |         CASE WHEN score >= 0 THEN 'en' ELSE 'de' END AS pred_class,
             |         score FROM sc)
             |SELECT true_class, pred_class, count(*) AS n_docs,
             |  CAST(sum(score) AS BIGINT) AS sum_score
             |FROM pr GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- stratified sample, EXACT largest-remainder allocation: 100
    //      docs apportioned over langs, picks = smallest hash buckets
    //      per stratum. Driver-side allocation over the strata-sized
    //      counts frame (routing-table discipline), window SQL replay. ----
    Entry("q159_stratified_alloc",
      (s, d) => Sampling.stratifiedAlloc(docs(s, d), "lang", "doc_id", n = 100L)
        .orderBy("lang", "rnk"),
      Some("""WITH c AS (SELECT lang, count(*) AS c FROM documents GROUP BY 1),
             |t AS (SELECT CAST(sum(c) AS BIGINT) AS N FROM c),
             |b AS (SELECT lang, c, (100 * c) // N AS base, (100 * c) % N AS rem
             |      FROM c, t),
             |r AS (SELECT lang, base,
             |        row_number() OVER (ORDER BY rem DESC, lang) AS rr FROM b),
             |e AS (SELECT 100 - CAST(sum(base) AS BIGINT) AS extra FROM b),
             |q AS (SELECT lang,
             |        base + CASE WHEN rr <= extra THEN 1 ELSE 0 END AS quota
             |      FROM r, e),
             |p AS (SELECT lang, doc_id,
             |        row_number() OVER (PARTITION BY lang ORDER BY
             |          CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
             |            AS BIGINT) % 1000000, doc_id) AS rnk
             |      FROM documents)
             |SELECT p.lang, p.doc_id, CAST(p.rnk AS BIGINT) AS rnk
             |FROM p JOIN q ON p.lang = q.lang
             |WHERE p.rnk <= q.quota
             |ORDER BY p.lang, p.rnk""".stripMargin)),

    // ---- full positional winnowing (Schleimer et al. SIGMOD'03): the
    //      MOSS fingerprint SET — per-window minima over w=4 windows of
    //      8-gram hashes, guaranteed density. Selection depends on hash
    //      ORDER, so the oracle recomputes the identical 60-bit md5/rot60
    //      gram hashes (q23's rendering) and replays the same lag/lead
    //      run-length rule. ----
    Entry("q161_winnow",
      (s, d) => TextOps.winnowFingerprints(docs(s, d), n = 8, w = 4)
        .orderBy("doc_id", "pos"),
      Some(s"""WITH $winnowFpCtes
              |SELECT doc_id, pos, fp
              |FROM (SELECT * FROM sel UNION ALL SELECT * FROM sh)
              |ORDER BY doc_id, pos""".stripMargin)),

    // ---- DSIR-style data selection (Xie et al. NeurIPS'23 shape):
    //      hashed-bigram ppm-rate weights (target='de' vs the raw rest),
    //      per-doc occurrence-weighted scores, deterministic top-50 cut.
    //      All-integer (floor-div rates, nonneg operands → // == div),
    //      so the SQL replay is bit-exact. ----
    Entry("q162_dsir_select",
      (s, d) => {
        val dd = docs(s, d)
        Sampling.dsirSelect(dd.where(col("lang") =!= "de"),
            dd.where(col("lang") === "de"), n = 50)
          .orderBy(col("score").desc, col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS s
             |           FROM documents),
             |bg AS (SELECT doc_id, lang,
             |         unnest([s[i] || ' ' || s[i+1] for i in range(1, len(s))]) AS b
             |       FROM d),
             |bk AS (SELECT doc_id, lang,
             |         CAST('0x' || substr(md5(b), 1, 15) AS BIGINT) % 4096 AS bkt
             |       FROM bg),
             |tc AS (SELECT bkt, count(*) AS ct FROM bk WHERE lang = 'de' GROUP BY 1),
             |rc AS (SELECT bkt, count(*) AS cr FROM bk WHERE lang <> 'de' GROUP BY 1),
             |tn AS (SELECT CAST(sum(ct) AS BIGINT) AS nt FROM tc),
             |rn AS (SELECT CAST(sum(cr) AS BIGINT) AS nr FROM rc),
             |w AS (SELECT coalesce(tc.bkt, rc.bkt) AS bkt,
             |        (coalesce(ct, 0) * 1000000) // nt
             |          - (coalesce(cr, 0) * 1000000) // nr AS w
             |      FROM tc FULL OUTER JOIN rc ON tc.bkt = rc.bkt, tn, rn),
             |sc AS (SELECT bk.doc_id, CAST(sum(w.w) AS BIGINT) AS score,
             |         count(*) AS n_grams
             |       FROM bk JOIN w ON bk.bkt = w.bkt
             |       WHERE bk.lang <> 'de' GROUP BY 1),
             |pool AS (SELECT doc_id FROM documents WHERE lang <> 'de')
             |SELECT p.doc_id, coalesce(sc.score, 0) AS score,
             |  CAST(coalesce(sc.n_grams, 0) AS BIGINT) AS n_grams
             |FROM pool p LEFT JOIN sc ON p.doc_id = sc.doc_id
             |ORDER BY score DESC, p.doc_id LIMIT 50""".stripMargin)),

    // ---- balanced training-shard assignment: contiguous blocks of the
    //      deterministic shuffle order, sizes exactly ⌊N/7⌋/⌈N/7⌉ by the
    //      floor-division staircase; window SQL replay (all operands
    //      nonneg → // == div) ----
    Entry("q164_shard_assign",
      (s, d) => Sampling.shardAssign(docs(s, d).select("doc_id"), "doc_id",
          nShards = 7, salt = "ep1")
        .orderBy("shuffle_pos"),
      Some("""WITH p AS (SELECT doc_id,
             |    CAST(row_number() OVER (ORDER BY
             |      CAST('0x' || substr(md5('ep1|' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT),
             |      doc_id) - 1 AS BIGINT) AS shuffle_pos
             |  FROM documents),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM p)
             |SELECT doc_id, shuffle_pos,
             |  (shuffle_pos * 7) // n AS shard_id,
             |  shuffle_pos - (((shuffle_pos * 7) // n) * n + 6) // 7 AS pos_in_shard
             |FROM p, t ORDER BY shuffle_pos""".stripMargin)),

    // ---- MOSS-style overlap report over the q161 fingerprints: pairs
    //      sharing winnow picks, exact-integer containment. maxDf=1000
    //      is a no-op on testdata (max fp df is 4), so the exact SQL
    //      replay is the oracle; the cap behavior is spec-pinned ----
    Entry("q166_winnow_overlap",
      (s, d) => Dedup.winnowOverlapPairs(docs(s, d), n = 8, w = 4,
          minShared = 1L)
        .orderBy("doc_a", "doc_b"),
      Some(s"""WITH $winnowFpCtes,
              |f AS (SELECT DISTINCT doc_id, fp FROM
              |        (SELECT doc_id, fp FROM sel
              |         UNION ALL SELECT doc_id, fp FROM sh)),
              |nf AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nf
              |       FROM f GROUP BY 1),
              |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |         CAST(count(*) AS BIGINT) AS n_shared
              |       FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
              |       GROUP BY 1, 2)
              |SELECT doc_a, doc_b, n_shared, na.nf AS n_a, nb.nf AS n_b,
              |  (n_shared * 1000000) // least(na.nf, nb.nf) AS overlap_e6
              |FROM pr JOIN nf na ON doc_a = na.doc_id
              |        JOIN nf nb ON doc_b = nb.doc_id
              |ORDER BY doc_a, doc_b""".stripMargin)),

    // ---- vocabulary coverage curve (tokenizer-size sweep): occurrence
    //      coverage of the top-k vocabulary at literal k grid; rank/cum
    //      windows over the vocab-sized frame only ----
    Entry("q167_vocab_coverage",
      (s, d) => TextOps.vocabCoverage(docs(s, d),
          ks = Seq(10, 100, 1000, 10000))
        .orderBy("k"),
      Some("""WITH c AS (SELECT unnest(string_split(text, ' ')) AS token
             |           FROM documents),
             |ct AS (SELECT token, CAST(count(*) AS BIGINT) AS tf
             |       FROM c GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS v,
             |               CAST(sum(tf) AS BIGINT) AS n FROM ct),
             |r AS (SELECT tf,
             |        row_number() OVER (ORDER BY tf DESC, token) AS rnk,
             |        sum(tf) OVER (ORDER BY tf DESC, token
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |      FROM ct),
             |ks AS (SELECT unnest([10, 100, 1000, 10000]) AS k)
             |SELECT CAST(k AS BIGINT) AS k, v AS n_types,
             |  CAST(cum AS BIGINT) AS covered, n AS n_occurrences,
             |  (CAST(cum AS BIGINT) * 1000000) // n AS coverage_e6
             |FROM ks, tot, r WHERE r.rnk = least(k, v)
             |ORDER BY k""".stripMargin)),

    // ---- deterministic interleaved mixture schedule: en:de:fr = 4:2:1
    //      (es/zh unweighted → dropped); per-source hash-shuffle rank,
    //      ord = pos·1e6 div w. Window SQL replay with the q126 md5
    //      arithmetic ----
    Entry("q168_mixture_schedule",
      (s, d) => Sampling.mixtureSchedule(docs(s, d), "lang", "doc_id",
          weights = Seq("en" -> 4L, "de" -> 2L, "fr" -> 1L), salt = "ep1")
        .orderBy("ord", "lang", "pos_in_source"),
      Some("""WITH w AS (SELECT * FROM (VALUES ('en', 4), ('de', 2),
             |                                 ('fr', 1)) AS t(lang, w)),
             |p AS (SELECT d.lang, d.doc_id, w.w,
             |        CAST(row_number() OVER (PARTITION BY d.lang ORDER BY
             |          CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || 'ep1'), 1, 15) AS BIGINT) % 1000000,
             |          d.doc_id) - 1 AS BIGINT) AS pos_in_source
             |      FROM documents d JOIN w ON d.lang = w.lang)
             |SELECT lang, doc_id, pos_in_source,
             |  (pos_in_source * 1000000) // w AS ord
             |FROM p ORDER BY ord, lang, pos_in_source""".stripMargin)),

    // ---- classifier calibration: the q158 weights/scores swept over a
    //      literal threshold grid — confusion + exact-integer
    //      precision/recall per operating point ----
    Entry("q170_threshold_sweep",
      (s, d) => {
        val two = docs(s, d).where(col("lang").isin("en", "de"))
        val w = TextOps.tokenWeights(
          two.where(pmod(col("doc_id"), lit(5)) =!= 0), "lang", "en", "de")
        val scored = TextOps.scoreDocs(
          two.where(pmod(col("doc_id"), lit(5)) === 0)
            .select("doc_id", "lang", "text"), w)
        TextOps.thresholdSweep(scored, "lang", "en", "score",
            thresholds = Seq(-2000000L, -500000L, 0L, 500000L, 2000000L))
          .orderBy("threshold")
      },
      Some("""WITH two AS (SELECT doc_id, lang AS cls, text
             |             FROM documents WHERE lang IN ('en', 'de')),
             |tok AS (SELECT cls, unnest(string_split(text, ' ')) AS term
             |        FROM two WHERE doc_id % 5 <> 0),
             |cnt AS (SELECT term,
             |          count(*) FILTER (cls = 'en') AS ca,
             |          count(*) FILTER (cls = 'de') AS cb
             |        FROM tok GROUP BY 1),
             |tot AS (SELECT count(*) FILTER (cls = 'en') AS na,
             |               count(*) FILTER (cls = 'de') AS nb FROM tok),
             |w AS (SELECT term,
             |        (ca * 1000000) // na - (cb * 1000000) // nb AS w
             |      FROM cnt, tot),
             |sc AS (SELECT t.doc_id, t.cls,
             |         CAST(coalesce(sum(w.w), 0) AS BIGINT) AS score
             |       FROM (SELECT doc_id, cls,
             |               unnest(string_split(text, ' ')) AS term
             |             FROM two WHERE doc_id % 5 = 0) t
             |       LEFT JOIN w ON t.term = w.term
             |       GROUP BY 1, 2),
             |ks AS (SELECT unnest([-2000000, -500000, 0,
             |                      500000, 2000000]) AS threshold),
             |cf AS (SELECT k.threshold,
             |         count(*) FILTER (score >= k.threshold AND cls = 'en') AS tp,
             |         count(*) FILTER (score >= k.threshold AND cls <> 'en') AS fp,
             |         count(*) FILTER (score < k.threshold AND cls = 'en') AS fn,
             |         count(*) FILTER (score < k.threshold AND cls <> 'en') AS tn
             |       FROM sc, ks k GROUP BY 1)
             |SELECT CAST(threshold AS BIGINT) AS threshold,
             |  CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
             |  CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
             |  (tp * 1000000) // greatest(tp + fp, 1) AS precision_e6,
             |  (tp * 1000000) // greatest(tp + fn, 1) AS recall_e6
             |FROM cf ORDER BY threshold""".stripMargin))
  )
}
