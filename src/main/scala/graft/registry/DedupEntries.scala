package graft.registry

import graft.hta.{AggOps, Queries, Scoped, Series, Throttle}
import graft.model.{IntervalScope, Scope}
import graft.pipeline.{Ann, Cdc, Curate, Dedup, Eval, Joins, Multimodal, Packing, Profile, Sampling, Sketches, TextOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Shared._

/** Dedup and pair-similarity tier: exact/minhash/simhash/edit-distance/
  * cosine/containment joins, clustering, decontamination. */
private[registry] object DedupEntries {
  val entries: Seq[Entry] = Seq(

    // ---- LLM pipeline: dedup ----
    Entry("q14_dedup_exact",
      (s, d) => Dedup.exactDupGroups(docs(s, d)).orderBy("doc_id"),
      Some("""WITH h AS (SELECT doc_id, md5(text) AS content_hash,
             |  count(*) OVER (PARTITION BY md5(text)) AS group_size FROM documents)
             |SELECT doc_id, content_hash, CAST(group_size AS BIGINT) AS group_size
             |FROM h WHERE group_size > 1 ORDER BY 1""".stripMargin)),

    Entry("q15_dedup_neardup",
      // geometry pinned to the registered family (the API default now
      // derives from the threshold via the knee rule — q187 exercises it)
      (s, d) => Dedup.nearDupPairs(docs(s, d), threshold = 0.8,
          numHashes = 32, bands = 16)
        .orderBy("doc_a", "doc_b"),
      Some(s"""WITH $shCte
              |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |  CAST(len(list_intersect(a.st, b.st)) AS BIGINT) AS inter,
              |  CAST(len(a.st) + len(b.st) - len(list_intersect(a.st, b.st)) AS BIGINT) AS uni,
              |  CAST(len(list_intersect(a.st, b.st)) AS DOUBLE) /
              |    (len(a.st) + len(b.st) - len(list_intersect(a.st, b.st))) AS jaccard
              |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              |WHERE CAST(len(list_intersect(a.st, b.st)) AS DOUBLE) /
              |    (len(a.st) + len(b.st) - len(list_intersect(a.st, b.st))) >= 0.8
              |ORDER BY 1, 2""".stripMargin)),

    Entry("q18_simhash_pairs",
      (s, d) => TextOps.simhashPairs(TextOps.simhash(docs(s, d)), maxDist = 4)
        .orderBy("doc_a", "doc_b"),
      Some(simhashSql(4))),

    // the 100 TB path for the same operator: capped band blocking instead
    // of all-pairs. maxDist=3 < bands=4 → pigeonhole recall 1, so the
    // brute-force SQL is an exact oracle for the banded plan.
    Entry("q38_simhash_banded",
      (s, d) => Dedup.simhashBandPairs(TextOps.simhash(docs(s, d)),
          bands = 4, bits = 60, maxDist = 3)
        .orderBy("doc_a", "doc_b"),
      Some(simhashSql(3))),

    // ---- benchmark decontamination: corpus docs sharing any 8-gram with
    //      the benchmark subset (doc_id % 11 = 0); Spark joins broadcast
    //      gram hashes, the oracle joins textual grams ----
    Entry("q46_decontaminate",
      (s, d) => {
        val all = docs(s, d)
        Dedup.decontaminate(
            all.where(pmod(col("doc_id"), lit(11)) =!= 0),
            all.where(pmod(col("doc_id"), lit(11)) === 0), n = 8)
          .orderBy("doc_id")
      },
      Some(decontamOracleSql)),

    // ---- the Bloom-probed scale tier of q46: same contract, same oracle —
    //      the filter only prunes the gram join's input, the left-semi
    //      verify removes every false positive (spec-pinned bit equality) ----
    Entry("q59_decontaminate_bloom",
      (s, d) => {
        val all = docs(s, d)
        Dedup.decontaminateBloom(
            all.where(pmod(col("doc_id"), lit(11)) =!= 0),
            all.where(pmod(col("doc_id"), lit(11)) === 0), n = 8)
          .orderBy("doc_id")
      },
      Some(decontamOracleSql)),

    // ---- EXACT Jaccard self-join via prefix filtering (PPJoin-style): the
    //      operator is exact, so the brute-force all-pairs SQL is an exact
    //      oracle — the recall-1 claim of the prefix filter becomes a
    //      checked fact, not an argument. Counts are over hashed grams on
    //      the Spark side and textual grams in SQL (q15's injectivity
    //      argument). tau=0.5 keeps prefixes long enough to matter. ----
    Entry("q48_jaccard_join",
      (s, d) => Dedup.jaccardJoin(docs(s, d), tau = 0.5).orderBy("doc_a", "doc_b"),
      Some(s"""WITH $shCte
              |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |  CAST(len(list_intersect(a.st, b.st)) AS BIGINT) AS inter,
              |  CAST(len(a.st) + len(b.st) - len(list_intersect(a.st, b.st)) AS BIGINT) AS uni,
              |  CAST(len(list_intersect(a.st, b.st)) AS DOUBLE) /
              |    (len(a.st) + len(b.st) - len(list_intersect(a.st, b.st))) AS jaccard
              |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              |WHERE CAST(len(list_intersect(a.st, b.st)) AS DOUBLE) /
              |    (len(a.st) + len(b.st) - len(list_intersect(a.st, b.st))) >= 0.5
              |ORDER BY 1, 2""".stripMargin)),

    // ---- the dedup pipeline's END: verified pairs → connected components
    //      → one survivor per cluster. The oracle recomputes components
    //      EXACTLY via a recursive transitive closure over the brute-force
    //      pair set (q15's oracle is exact for the pair tier, so the
    //      composition is exact too); component label = min reachable id,
    //      matching min-label propagation's fixpoint. ----
    Entry("q49_neardup_clusters",
      (s, d) => Dedup.nearDupClusters(docs(s, d), threshold = 0.8,
          numHashes = 32, bands = 16)
        .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE $shCte,
              |pr AS (SELECT a.doc_id AS u, b.doc_id AS v
              |       FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              |       WHERE CAST(len(list_intersect(a.st, b.st)) AS DOUBLE) /
              |         (len(a.st) + len(b.st) - len(list_intersect(a.st, b.st))) >= 0.8),
              |e AS (SELECT u, v FROM pr UNION SELECT v, u FROM pr),
              |reach(s, t) AS (
              |  SELECT u, u FROM e
              |  UNION
              |  SELECT r.s, e.v FROM reach r JOIN e ON r.t = e.u),
              |cc AS (SELECT s AS doc_id, min(t) AS cluster_id FROM reach GROUP BY s)
              |SELECT d.doc_id,
              |  coalesce(cc.cluster_id, d.doc_id) AS cluster_id,
              |  (d.doc_id = coalesce(cc.cluster_id, d.doc_id)) AS keep
              |FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id
              |ORDER BY d.doc_id""".stripMargin)),

    // ---- survivorship policy: same clusters as q49, but the kept copy
    //      is the LONGEST variant (n_chars desc, ties to smaller id) —
    //      the production rule when near-copies differ in quality.
    //      cluster_id stays the component minimum (policy-independent) ----
    Entry("q186_neardup_survivor",
      (s, d) => Dedup.nearDupClustersBy(docs(s, d), col("n_chars"),
          threshold = 0.8, numHashes = 32, bands = 16)
        .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE $shCte,
              |pr AS (SELECT a.doc_id AS u, b.doc_id AS v
              |       FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              |       WHERE CAST(len(list_intersect(a.st, b.st)) AS DOUBLE) /
              |         (len(a.st) + len(b.st) - len(list_intersect(a.st, b.st))) >= 0.8),
              |e AS (SELECT u, v FROM pr UNION SELECT v, u FROM pr),
              |reach(s, t) AS (
              |  SELECT u, u FROM e
              |  UNION
              |  SELECT r.s, e.v FROM reach r JOIN e ON r.t = e.u),
              |cc AS (SELECT s AS doc_id, min(t) AS cluster_id FROM reach GROUP BY s),
              |rk AS (SELECT cc.doc_id, cc.cluster_id,
              |         row_number() OVER (PARTITION BY cc.cluster_id
              |           ORDER BY d.n_chars DESC, cc.doc_id) AS rn
              |       FROM cc JOIN documents d ON d.doc_id = cc.doc_id)
              |SELECT d.doc_id,
              |  coalesce(rk.cluster_id, d.doc_id) AS cluster_id,
              |  coalesce(rk.rn = 1, TRUE) AS keep
              |FROM documents d LEFT JOIN rk ON d.doc_id = rk.doc_id
              |ORDER BY d.doc_id""".stripMargin)),

    // ---- q15 under the KNEE-RULE default geometry (numHashes/bands
    //      omitted → bandGeometryFor(0.9) = 128 hashes / 16 bands, r=8,
    //      knee 0.707): the auto path the round-13 bench measured, under
    //      the driver gate. Oracle is the brute-force exact Jaccard at
    //      0.9 — the hash check IS a recall-1 claim for the derived
    //      geometry at this SF ----
    Entry("q187_neardup_auto",
      (s, d) => Dedup.nearDupPairs(docs(s, d), threshold = 0.9)
        .orderBy("doc_a", "doc_b"),
      Some(s"""WITH $shCte
              |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |  CAST(len(list_intersect(a.st, b.st)) AS BIGINT) AS inter,
              |  CAST(len(a.st) + len(b.st) - len(list_intersect(a.st, b.st)) AS BIGINT) AS uni,
              |  CAST(len(list_intersect(a.st, b.st)) AS DOUBLE) /
              |    (len(a.st) + len(b.st) - len(list_intersect(a.st, b.st))) AS jaccard
              |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              |WHERE CAST(len(list_intersect(a.st, b.st)) AS DOUBLE) /
              |    (len(a.st) + len(b.st) - len(list_intersect(a.st, b.st))) >= 0.9
              |ORDER BY 1, 2""".stripMargin)),

    // ---- q184's index with doc_id%7==0 RETIRED (takedown path): the
    //      tombstone anti-join must exclude retired docs from probe
    //      answers immediately — oracle is q101's brute force with the
    //      retired ids removed from the corpus side ----
    Entry("q188_neardup_retired",
      (s, d) => Dedup.nearDupPairsAgainstIndex(
          Shared.bandIndexRetiredFor(s, d),
          docs(s, d).where(pmod(col("doc_id"), lit(5)) === 0),
          threshold = 0.8)
        .orderBy("batch_id", "corpus_id"),
      Some(s"""WITH $shCte
              |SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
              |  CAST(len(list_intersect(b.st, c.st)) AS BIGINT) AS inter,
              |  CAST(len(b.st) + len(c.st) - len(list_intersect(b.st, c.st)) AS BIGINT) AS uni,
              |  CAST(len(list_intersect(b.st, c.st)) AS DOUBLE) /
              |    (len(b.st) + len(c.st) - len(list_intersect(b.st, c.st))) AS jaccard
              |FROM sh b JOIN sh c
              |  ON b.doc_id % 5 = 0 AND c.doc_id % 5 != 0 AND c.doc_id % 7 != 0
              |WHERE CAST(len(list_intersect(b.st, c.st)) AS DOUBLE) /
              |    (len(b.st) + len(c.st) - len(list_intersect(b.st, c.st))) >= 0.8
              |ORDER BY 1, 2""".stripMargin)),

    // ---- corpus line dedup (boilerplate removal): testdata text is
    //      single-line, so the query seeds deterministic multi-line docs —
    //      two shared footers (frequent, removed) + a per-doc note line and
    //      a blank line every 7th doc (kept) — q50's seeding pattern ----
    Entry("q52_line_dedup",
      (s, d) => {
        val seeded = docs(s, d).select(col("doc_id"), concat(
          col("text"), lit("\n"),
          when(col("doc_id") % 7 === 0, lit("\n")).otherwise(lit("")),
          when(col("doc_id") % 3 === 0,
              lit("copyright footer all rights reserved"))
            .when(col("doc_id") % 3 === 1, lit("subscribe to our newsletter"))
            .otherwise(concat(lit("note "), col("doc_id").cast("string"))))
          .as("text"))
        TextOps.lineDedup(seeded, minDocs = 5).orderBy("doc_id")
      },
      Some(s"""WITH p AS (SELECT doc_id,
              |  text || chr(10) ||
              |  CASE WHEN doc_id % 7 = 0 THEN chr(10) ELSE '' END ||
              |  CASE WHEN doc_id % 3 = 0 THEN 'copyright footer all rights reserved'
              |       WHEN doc_id % 3 = 1 THEN 'subscribe to our newsletter'
              |       ELSE 'note ' || CAST(doc_id AS VARCHAR) END AS text
              |  FROM documents),
              |ls AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM p),
              |ex AS (SELECT doc_id, unnest(l) AS line,
              |              unnest(range(1, len(l)+1)) AS pos FROM ls),
              |freq AS (SELECT line FROM ex WHERE trim(line) <> ''
              |         GROUP BY line HAVING count(DISTINCT doc_id) >= 5),
              |rb AS (SELECT doc_id,
              |              string_agg(line, chr(10) ORDER BY pos) AS clean_text,
              |              count(*) AS n_kept
              |       FROM ex WHERE line NOT IN (SELECT line FROM freq)
              |       GROUP BY doc_id)
              |SELECT ls.doc_id, coalesce(rb.clean_text, '') AS clean_text,
              |       CAST(len(ls.l) AS BIGINT) AS n_lines,
              |       CAST(len(ls.l) - coalesce(rb.n_kept, 0) AS BIGINT) AS n_removed
              |FROM ls LEFT JOIN rb ON ls.doc_id = rb.doc_id
              |ORDER BY ls.doc_id""".stripMargin)),

    // ---- edit-distance near-dup over en docs. ASCII-sanitize first
    //      (regex in the Java/RE2-agreeing subset, the q50 discipline):
    //      Spark's levenshtein counts unicode code points, DuckDB's counts
    //      BYTES — on pure ASCII the two agree exactly. Language blocking
    //      is part of the query's contract (cross-language edit distance
    //      is meaningless), not a recall loss ----
    Entry("q61_edit_neardup",
      (s, d) => {
        val en = docs(s, d).where(col("lang") === "en")
          .select(col("doc_id"),
            regexp_replace(col("text"), "[^ -~]", "").as("text"))
        // uncapped: the oracle's brute join has no bucket cap, and a
        // silently-dropped dense band would hash-diverge; production
        // callers pick a finite maxBucket for the recall/cost trade
        Dedup.editDistancePairs(en, maxDist = 6, maxBucket = Int.MaxValue)
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH en AS (SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS t
             |            FROM documents WHERE lang = 'en'),
             |l AS (SELECT doc_id, t, length(t) AS len FROM en),
             |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |             CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
             |      FROM l a JOIN l b
             |        ON a.doc_id < b.doc_id AND abs(a.len - b.len) <= 6)
             |SELECT doc_a, doc_b, dist FROM p WHERE dist <= 6
             |ORDER BY 1, 2""".stripMargin)),

    // ---- cross-document duplicated spans (gram-granular exact-substring
    //      dedup). Spark marks 60-bit positional gram hashes, the oracle
    //      marks textual grams — membership agrees by q15's injectivity
    //      argument ----
    Entry("q64_dup_spans",
      (s, d) => Dedup.duplicatedSpans(docs(s, d), n = 8)
        .orderBy("doc_id", "span_start"),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
             |g AS (SELECT doc_id, unnest([{'pos': i - 1,
             |          'gram': array_to_string(s[i:i+7], ' ')}
             |        for i in range(1, len(s) - 6)]) AS pg
             |      FROM d WHERE len(s) >= 8),
             |h AS (SELECT doc_id, pg.pos AS pos, pg.gram AS gram FROM g),
             |dup AS (SELECT gram FROM (SELECT gram, count(DISTINCT doc_id) AS c
             |                          FROM h GROUP BY 1) WHERE c >= 2),
             |hit AS (SELECT doc_id, pos FROM h WHERE gram IN (SELECT gram FROM dup)),
             |m AS (SELECT doc_id, pos, CASE WHEN pos > coalesce(lag(pos) OVER
             |        (PARTITION BY doc_id ORDER BY pos) + 8, -1) THEN 1 ELSE 0 END AS nw
             |      FROM hit),
             |sid AS (SELECT *, sum(nw) OVER (PARTITION BY doc_id ORDER BY pos
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s FROM m)
             |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
             |       CAST(max(pos) + 8 AS BIGINT) AS span_end,
             |       CAST(count(*) AS BIGINT) AS n_grams
             |FROM sid GROUP BY doc_id, s ORDER BY 1, 2""".stripMargin)),

    // ---- record linkage: cross-TABLE edit-distance join (entity
    //      resolution between two catalogs) — q61's length-band blocking
    //      with a 3-band probe on the left side so each pair is emitted
    //      exactly once without an ownership rule. Same ASCII
    //      sanitization: DuckDB's levenshtein is byte-based, Spark's
    //      counts code points; on pure ASCII they agree exactly ----
    Entry("q97_entity_link",
      (s, d) => {
        // the second catalog is derived deterministically (the q50/q52
        // pattern): id-shifted rows whose 80-char ASCII prefix has every
        // 'a' replaced — docs with few 'a's link back to their original
        // VARIABLE-length prefixes (40 + doc_id % 60): a constant cut
        // would put every doc at one length — one degenerate band, an
        // accidental all-pairs; the id-spread keeps ~12 bands populated
        val en = docs(s, d).where(col("lang") === "en")
          .select(col("doc_id"),
            expr("substring(regexp_replace(text, '[^ -~]', ''), 1, " +
              "40 + cast(doc_id % 60 as int))").as("text"))
        val catalog = en.select((col("doc_id") + 1000000L).as("doc_id"),
          regexp_replace(col("text"), "a", "q").as("text"))
        Dedup.editDistanceJoin(en, catalog, maxDist = 4,
            maxBucket = Int.MaxValue)
          .orderBy("left_id", "right_id")
      },
      Some("""WITH en AS (SELECT doc_id,
             |              substr(regexp_replace(text, '[^ -~]', '', 'g'),
             |                     1, 40 + CAST(doc_id % 60 AS INT)) AS t
             |            FROM documents WHERE lang = 'en'),
             |l AS (SELECT doc_id, t, length(t) AS len FROM en),
             |r AS (SELECT doc_id + 1000000 AS doc_id, replace(t, 'a', 'q') AS t,
             |             length(t) AS len FROM en),
             |p AS (SELECT l.doc_id AS left_id, r.doc_id AS right_id,
             |             CAST(levenshtein(l.t, r.t) AS BIGINT) AS dist
             |      FROM l JOIN r ON abs(l.len - r.len) <= 4)
             |SELECT left_id, right_id, dist FROM p WHERE dist <= 4
             |ORDER BY 1, 2""".stripMargin)),

    // ---- incremental near-dup: a NEW batch (doc_id % 5 = 0) against the
    //      EXISTING corpus (the rest) — the R-S LSH join; oracle is the
    //      cross-set brute-force Jaccard (q15's argument) ----
    Entry("q101_neardup_delta",
      (s, d) => {
        val all = docs(s, d)
        Dedup.nearDupPairsAgainst(
            all.where(pmod(col("doc_id"), lit(5)) =!= 0),
            all.where(pmod(col("doc_id"), lit(5)) === 0),
            threshold = 0.8, numHashes = 32, bands = 16)
          .orderBy("batch_id", "corpus_id")
      },
      Some(s"""WITH $shCte
              |SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
              |  CAST(len(list_intersect(b.st, c.st)) AS BIGINT) AS inter,
              |  CAST(len(b.st) + len(c.st) - len(list_intersect(b.st, c.st)) AS BIGINT) AS uni,
              |  CAST(len(list_intersect(b.st, c.st)) AS DOUBLE) /
              |    (len(b.st) + len(c.st) - len(list_intersect(b.st, c.st))) AS jaccard
              |FROM sh b JOIN sh c
              |  ON b.doc_id % 5 = 0 AND c.doc_id % 5 != 0
              |WHERE CAST(len(list_intersect(b.st, c.st)) AS DOUBLE) /
              |    (len(b.st) + len(c.st) - len(list_intersect(b.st, c.st))) >= 0.8
              |ORDER BY 1, 2""".stripMargin)),

    // ---- q101 against a PERSISTED band index (write + append drops,
    //      memoized like every other store): corpus signatures come from
    //      stored (band, bkey, doc_id) rows and the verify from stored
    //      (doc_id, gram) rows — corpus text is never read. Same oracle
    //      as q101: the index path is spec-pinned equal to the live one ----
    Entry("q184_neardup_index",
      (s, d) => Dedup.nearDupPairsAgainstIndex(Shared.bandIndexFor(s, d),
          docs(s, d).where(pmod(col("doc_id"), lit(5)) === 0),
          threshold = 0.8)
        .orderBy("batch_id", "corpus_id"),
      Some(s"""WITH $shCte
              |SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
              |  CAST(len(list_intersect(b.st, c.st)) AS BIGINT) AS inter,
              |  CAST(len(b.st) + len(c.st) - len(list_intersect(b.st, c.st)) AS BIGINT) AS uni,
              |  CAST(len(list_intersect(b.st, c.st)) AS DOUBLE) /
              |    (len(b.st) + len(c.st) - len(list_intersect(b.st, c.st))) AS jaccard
              |FROM sh b JOIN sh c
              |  ON b.doc_id % 5 = 0 AND c.doc_id % 5 != 0
              |WHERE CAST(len(list_intersect(b.st, c.st)) AS DOUBLE) /
              |    (len(b.st) + len(c.st) - len(list_intersect(b.st, c.st))) >= 0.8
              |ORDER BY 1, 2""".stripMargin)),

    // ---- EXACT cosine-threshold similarity join (Bayardo all-pairs,
    //      WWW'07): tf-vector cosine ≥ 4/5 with every decision an integer
    //      comparison (index: psum·25 ≥ 16·n2; accept: dot²·25 ≥
    //      16·na2·nb2) — so the brute-force SQL is an exact oracle and
    //      the prefix filter's recall-1 claim is a checked fact ----
    Entry("q102_cosine_join",
      // every 5th doc: tf-vector cosine join output grows ~quadratically in
      // corpus density (21k pairs even on the subset at sf0.1) — the bench
      // budget wants the exactness demonstrated, not the biggest join
      (s, d) => Dedup.cosineJoin(
          docs(s, d).where(pmod(col("doc_id"), lit(5)) === 0),
          tauNum = 4L, tauDen = 5L)
        .orderBy("doc_a", "doc_b"),
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |           FROM documents WHERE doc_id % 5 = 0),
             |f AS (SELECT doc_id, term, count(*) AS w FROM t GROUP BY 1, 2),
             |n2 AS (SELECT doc_id, CAST(sum(w*w) AS BIGINT) AS nn FROM f GROUP BY 1),
             |dt AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |         CAST(sum(a.w * b.w) AS BIGINT) AS dot
             |       FROM f a JOIN f b ON a.term = b.term AND a.doc_id < b.doc_id
             |       GROUP BY 1, 2)
             |SELECT doc_a, doc_b, dot, x.nn AS na2, y.nn AS nb2,
             |  CAST(dot AS DOUBLE) /
             |    sqrt(CAST(x.nn AS DOUBLE) * CAST(y.nn AS DOUBLE)) AS cosine
             |FROM dt JOIN n2 x ON dt.doc_a = x.doc_id
             |        JOIN n2 y ON dt.doc_b = y.doc_id
             |WHERE dot * dot * 25 >= 16 * x.nn * y.nn
             |ORDER BY 1, 2""".stripMargin)),

    // ---- semantic dedup (SemDeDup): cluster in the 64-dim hash-count
    //      space with the q114 seeded quantizer, then near-dup ONLY
    //      within a cluster — exact-integer cosine rule (tau 19/20),
    //      dominated-by-smaller survivorship. The oracle recomputes the
    //      whole loop: dense-grid assignment + sparse-count dot pairs ----
    Entry("q115_semantic_dedup",
      (s, d) => Dedup.semanticDedup(docs(s, d), tauNum = 19L, tauDen = 20L,
          dim = 64, nlist = 8)
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |           FROM documents),
             |cnt AS (SELECT doc_id,
             |          CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 64 AS b,
             |          count(*) AS c
             |        FROM t GROUP BY 1, 2),
             |grid AS (SELECT g.doc_id, g.j, coalesce(cnt.c, 0) AS c
             |         FROM (SELECT d.doc_id, j.j
             |               FROM (SELECT DISTINCT doc_id FROM documents) d,
             |                    range(0, 64) j(j)) g
             |         LEFT JOIN cnt ON cnt.doc_id = g.doc_id AND cnt.b = g.j),
             |cents AS (SELECT row_number() OVER (ORDER BY doc_id) - 1 AS list_id,
             |            doc_id AS cdoc
             |          FROM (SELECT DISTINCT doc_id FROM documents
             |                ORDER BY doc_id LIMIT 8)),
             |cg AS (SELECT cents.list_id, grid.j, grid.c AS cc
             |       FROM cents JOIN grid ON grid.doc_id = cents.cdoc),
             |dist AS (SELECT g.doc_id, cg.list_id,
             |           sum((g.c - cg.cc) * (g.c - cg.cc)) AS d2
             |         FROM grid g JOIN cg ON g.j = cg.j GROUP BY 1, 2),
             |asg AS (SELECT doc_id, list_id FROM (
             |          SELECT doc_id, list_id,
             |            row_number() OVER (PARTITION BY doc_id
             |              ORDER BY d2, list_id) AS rn
             |          FROM dist) WHERE rn = 1),
             |n2 AS (SELECT doc_id, CAST(sum(c*c) AS BIGINT) AS nn
             |       FROM cnt GROUP BY 1),
             |pr AS (SELECT a1.doc_id AS da, a2.doc_id AS db
             |       FROM asg a1 JOIN asg a2
             |         ON a1.list_id = a2.list_id AND a1.doc_id < a2.doc_id),
             |dt AS (SELECT pr.da, pr.db, CAST(sum(x.c * y.c) AS BIGINT) AS dot
             |       FROM pr JOIN cnt x ON x.doc_id = pr.da
             |               JOIN cnt y ON y.doc_id = pr.db AND y.b = x.b
             |       GROUP BY 1, 2),
             |dom AS (SELECT DISTINCT dt.db AS doc_id FROM dt
             |        JOIN n2 xa ON dt.da = xa.doc_id
             |        JOIN n2 yb ON dt.db = yb.doc_id
             |        WHERE dot * dot * 400 >= xa.nn * yb.nn * 361)
             |SELECT a.doc_id, CAST(a.list_id AS BIGINT) AS list_id,
             |  (dom.doc_id IS NULL) AS is_kept
             |FROM asg a LEFT JOIN dom ON dom.doc_id = a.doc_id
             |ORDER BY 1""".stripMargin)),

    // ---- canonical-form exact dedup: case/punctuation/whitespace-robust
    //      duplicate groups via the shared Java/RE2 normalization regex;
    //      min-id survivorship ----
    Entry("q120_canon_dedup",
      (s, d) => TextOps.canonDedup(docs(s, d)).orderBy("doc_id"),
      Some("""WITH k AS (SELECT doc_id,
             |  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS ch
             |  FROM documents),
             |g AS (SELECT ch, min(doc_id) AS canon_id, count(*) AS group_size
             |      FROM k GROUP BY 1)
             |SELECT k.doc_id, g.canon_id, CAST(g.group_size AS BIGINT) AS group_size,
             |  (k.doc_id = g.canon_id) AS is_survivor
             |FROM k JOIN g USING (ch) ORDER BY 1""".stripMargin)),

    // ---- containment join: near-SUBSET pairs (quote/excerpt detection)
    //      — the asymmetric Jaccard C(A,B) = |A∩B|/|A| at tau 9/10,
    //      exact-integer rule over distinct-token sets ----
    Entry("q122_containment",
      // every 11th doc, tau 24/25: this corpus's docs draw on one shared
      // vocabulary, so distinct-token containment pairs are DENSE (79k
      // pairs at tau 0.9 over all 500 sf0.01 docs; quadratic growth with
      // corpus density) — the q102 right-sizing precedent: demonstrate
      // the exactness, not the biggest join
      (s, d) => Dedup.containmentJoin(
          docs(s, d).where(pmod(col("doc_id"), lit(11)) === 0),
          tauNum = 24L, tauDen = 25L)
        .orderBy("doc_sub", "doc_sup"),
      Some("""WITH f AS (SELECT DISTINCT doc_id, tok FROM
             |  (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |   FROM documents WHERE doc_id % 11 = 0)),
             |na AS (SELECT doc_id, count(*) AS n_sub FROM f GROUP BY 1),
             |it AS (SELECT a.doc_id AS doc_sub, b.doc_id AS doc_sup,
             |         count(*) AS inter
             |       FROM f a JOIN f b ON a.tok = b.tok AND a.doc_id != b.doc_id
             |       GROUP BY 1, 2)
             |SELECT doc_sub, doc_sup, CAST(inter AS BIGINT) AS inter,
             |  CAST(n_sub AS BIGINT) AS n_sub,
             |  CAST(inter * 1000000 // n_sub AS BIGINT) AS cont_e6
             |FROM it JOIN na ON na.doc_id = it.doc_sub
             |WHERE inter * 25 >= n_sub * 24
             |ORDER BY 1, 2""".stripMargin)),

    // ---- the BandIndex drift monitor's observable (round 16): per-doc
    //      DISTINCT shingle count, exactly the quantity whose per-drop
    //      sum rides the gram staging write into band_drift.json
    //      (BandIndex.driftStats aggregates these counts; BandDriftSpec
    //      pins the statistic and the advisory, this row pins the
    //      ingredient — q196's discipline for the LSH tier). Hashed
    //      distinct count == textual distinct count by q15's 60-bit
    //      injectivity; short docs (< 3 tokens) contribute their single
    //      whole-text fallback gram on both sides ----
    Entry("q197_shingle_stats",
      (s, d) => Dedup.shingleHashRows(docs(s, d), n = 3)
        .groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
        .orderBy("doc_id"),
      Some(s"""WITH $shCte
              |SELECT doc_id, CAST(len(st) AS BIGINT) AS n_shingles
              |FROM sh ORDER BY 1""".stripMargin)),

    // ---- per-doc n-gram novelty: fraction of a doc's distinct shingles
    //      first seen in THIS doc (smallest owning doc_id) — the
    //      crawl-saturation / originality signal ----
    Entry("q125_novelty",
      (s, d) => Dedup.gramNovelty(docs(s, d)).orderBy("doc_id"),
      Some(s"""WITH $shCte,
              |g AS (SELECT doc_id, unnest(st) AS gram FROM sh),
              |fo AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY 1)
              |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
              |  CAST(sum(CASE WHEN fo.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
              |  CAST(sum(CASE WHEN fo.first_doc = g.doc_id THEN 1 ELSE 0 END)
              |       * 1000000 // count(*) AS BIGINT) AS novelty_e6
              |FROM g JOIN fo USING (gram) GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- embedding-space decontamination: exact epsilon-ball R-S join
    //      (eval fold = vec_id % 10 == 0) with integer triangle-inequality
    //      IVF pruning; flagged train vectors only. Brute-force replay on
    //      the quantized grid — recall-1 is part of what's checked. ----
    Entry("q160_semantic_decontaminate",
      (s, d) => {
        val e = emb(s, d)
        Ann.epsilonJoin(
            e.where(pmod(col("vec_id"), lit(10L)) =!= 0L),
            e.where(pmod(col("vec_id"), lit(10L)) === 0L),
            d2max = 120000000L, nlist = 8)
          .orderBy("vec_id")
      },
      Some("""WITH e AS (SELECT vec_id,
             |    list_transform(embedding,
             |      x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS v
             |  FROM embeddings),
             |p AS (SELECT vec_id, v FROM e WHERE vec_id % 10 = 0),
             |c AS (SELECT vec_id, v FROM e WHERE vec_id % 10 <> 0),
             |d AS (SELECT c.vec_id AS vec_id,
             |        CAST(list_sum([(c.v[i] - p.v[i]) * (c.v[i] - p.v[i])
             |                       for i in range(1, len(c.v) + 1)])
             |          AS BIGINT) AS d2
             |      FROM c, p)
             |SELECT vec_id, count(*) AS n_hits, min(d2) AS min_d2
             |FROM d WHERE d2 <= 120000000
             |GROUP BY 1 ORDER BY vec_id""".stripMargin)),

    // ---- multi-benchmark decontamination: per-(doc, suite) overlap
    //      attribution in ONE corpus pass (two synthetic suites from
    //      doc_id residues; a doc divisible by both lands in both).
    //      Spark marks 60-bit gram hashes, the oracle textual grams —
    //      q15's injectivity argument ----
    Entry("q163_decontaminate_multi",
      (s, d) => {
        val all = docs(s, d)
        val bench = all.where(pmod(col("doc_id"), lit(13)) === 0)
          .withColumn("suite", lit("sA"))
          .unionByName(all.where(pmod(col("doc_id"), lit(17)) === 0)
            .withColumn("suite", lit("sB")))
        Dedup.decontaminateMulti(
            all.where(pmod(col("doc_id"), lit(13)) =!= 0 &&
              pmod(col("doc_id"), lit(17)) =!= 0),
            bench, n = 8)
          .orderBy("doc_id", "suite")
      },
      Some("""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS s FROM documents),
             |g8 AS (SELECT doc_id, CASE WHEN len(s) >= 8
             |         THEN list_distinct([s[i]||' '||s[i+1]||' '||s[i+2]||' '||s[i+3]||' '||s[i+4]||' '||s[i+5]||' '||s[i+6]||' '||s[i+7]
             |                             for i in range(1, len(s)-6)])
             |         ELSE [text] END AS st
             |       FROM d),
             |bench AS (SELECT DISTINCT 'sA' AS suite, unnest(st) AS g
             |          FROM g8 WHERE doc_id % 13 = 0
             |          UNION
             |          SELECT DISTINCT 'sB' AS suite, unnest(st) AS g
             |          FROM g8 WHERE doc_id % 17 = 0),
             |corp AS (SELECT doc_id, st FROM g8
             |         WHERE doc_id % 13 != 0 AND doc_id % 17 != 0),
             |cg AS (SELECT doc_id, unnest(st) AS g FROM corp),
             |hits AS (SELECT doc_id, suite, CAST(count(*) AS BIGINT) AS n_overlap
             |         FROM cg JOIN bench USING (g) GROUP BY 1, 2)
             |SELECT h.doc_id, h.suite, CAST(len(c.st) AS BIGINT) AS n_grams,
             |  h.n_overlap,
             |  CAST(h.n_overlap AS DOUBLE) / len(c.st) AS contam_frac
             |FROM hits h JOIN corp c USING (doc_id)
             |ORDER BY doc_id, suite""".stripMargin)),

    // ---- LSH-prescreened exact cosine join: minhash-band candidates over
    //      the token set, decided by q102's exact-integer accept rule. The
    //      oracle REPRODUCES THE BANDING in SQL (the Carter-Wegman family
    //      is deterministic md5 arithmetic, the q18 precedent), so the hash
    //      check pins the implementation, not a recall claim — the xxhash64
    //      band key on the Spark side can only MERGE buckets (adds
    //      candidates the exact verify discards), never split them, so raw
    //      (band, m_2b, m_2b+1) equality is the same candidate set ----
    Entry("q180_cosine_join_lsh",
      (s, d) => Dedup.cosineJoinBucketed(
          docs(s, d).where(pmod(col("doc_id"), lit(5)) === 0),
          tauNum = 4L, tauDen = 5L, numHashes = 32, bands = 16,
          maxBucket = Int.MaxValue)
        .orderBy("doc_a", "doc_b"),
      Some(cosineLshOracleSql(numHashes = 32, bands = 16,
        tauNum = 4L, tauDen = 5L))),

    // ---- segment-signature edit-distance pairs (PASS-JOIN pigeonhole):
    //      q61's output contract and brute-force oracle, content-keyed
    //      blocking — the hash check IS the recall-1 claim at this SF ----
    Entry("q181_edit_neardup_seg",
      (s, d) => {
        val en = docs(s, d).where(col("lang") === "en")
          .select(col("doc_id"),
            regexp_replace(col("text"), "[^ -~]", "").as("text"))
        Dedup.editDistancePairsSegmented(en, maxDist = 6,
            maxBucket = Int.MaxValue)
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH en AS (SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS t
             |            FROM documents WHERE lang = 'en'),
             |l AS (SELECT doc_id, t, length(t) AS len FROM en),
             |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |             CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
             |      FROM l a JOIN l b
             |        ON a.doc_id < b.doc_id AND abs(a.len - b.len) <= 6)
             |SELECT doc_a, doc_b, dist FROM p WHERE dist <= 6
             |ORDER BY 1, 2""".stripMargin)),

    // ---- q115's semanticDedup at a WIDE coarse quantizer (nlist = 64):
    //      the in-cluster exact-verify pair count scales with n²/nlist, so
    //      the nlist knob IS the scale path — this geometry keeps the
    //      brute oracle feasible on a ×10 corpus where q115's nlist = 8
    //      all-pairs truth (~156 M in-cluster pairs at 50 k docs) is
    //      structurally out of DuckDB's reach regardless of duplicate
    //      density. Same code path, same accept rule, second geometry ----
    Entry("q183_semantic_dedup_wide",
      (s, d) => Dedup.semanticDedup(docs(s, d), tauNum = 19L, tauDen = 20L,
          dim = 64, nlist = 64)
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |           FROM documents),
             |cnt AS (SELECT doc_id,
             |          CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 64 AS b,
             |          count(*) AS c
             |        FROM t GROUP BY 1, 2),
             |grid AS (SELECT g.doc_id, g.j, coalesce(cnt.c, 0) AS c
             |         FROM (SELECT d.doc_id, j.j
             |               FROM (SELECT DISTINCT doc_id FROM documents) d,
             |                    range(0, 64) j(j)) g
             |         LEFT JOIN cnt ON cnt.doc_id = g.doc_id AND cnt.b = g.j),
             |cents AS (SELECT row_number() OVER (ORDER BY doc_id) - 1 AS list_id,
             |            doc_id AS cdoc
             |          FROM (SELECT DISTINCT doc_id FROM documents
             |                ORDER BY doc_id LIMIT 64)),
             |cg AS (SELECT cents.list_id, grid.j, grid.c AS cc
             |       FROM cents JOIN grid ON grid.doc_id = cents.cdoc),
             |dist AS (SELECT g.doc_id, cg.list_id,
             |           sum((g.c - cg.cc) * (g.c - cg.cc)) AS d2
             |         FROM grid g JOIN cg ON g.j = cg.j GROUP BY 1, 2),
             |asg AS (SELECT doc_id, list_id FROM (
             |          SELECT doc_id, list_id,
             |            row_number() OVER (PARTITION BY doc_id
             |              ORDER BY d2, list_id) AS rn
             |          FROM dist) WHERE rn = 1),
             |n2 AS (SELECT doc_id, CAST(sum(c*c) AS BIGINT) AS nn
             |       FROM cnt GROUP BY 1),
             |pr AS (SELECT a1.doc_id AS da, a2.doc_id AS db
             |       FROM asg a1 JOIN asg a2
             |         ON a1.list_id = a2.list_id AND a1.doc_id < a2.doc_id),
             |dt AS (SELECT pr.da, pr.db, CAST(sum(x.c * y.c) AS BIGINT) AS dot
             |       FROM pr JOIN cnt x ON x.doc_id = pr.da
             |               JOIN cnt y ON y.doc_id = pr.db AND y.b = x.b
             |       GROUP BY 1, 2),
             |dom AS (SELECT DISTINCT dt.db AS doc_id FROM dt
             |        JOIN n2 xa ON dt.da = xa.doc_id
             |        JOIN n2 yb ON dt.db = yb.doc_id
             |        WHERE dot * dot * 400 >= xa.nn * yb.nn * 361)
             |SELECT a.doc_id, CAST(a.list_id AS BIGINT) AS list_id,
             |  (dom.doc_id IS NULL) AS is_kept
             |FROM asg a LEFT JOIN dom ON dom.doc_id = a.doc_id
             |ORDER BY 1""".stripMargin)),

    // ---- q115 under the AUTO nlist default (nlist omitted -> one cheap
    //      count, max(8, ceil(n/1000)) - the geometry that keeps the
    //      in-cluster verify LINEAR in corpus size; round-13 measured the
    //      fixed demo geometry quadratically infeasible at x100). Every
    //      driver SF has n <= 5000 docs, so the derived nlist is 8 and
    //      q115's oracle applies verbatim; the x100 ScaleProbe leg pins
    //      the derived geometry at 500k docs (IMPLEMENTATION.md) ----
    Entry("q190_semantic_dedup_auto",
      (s, d) => Dedup.semanticDedup(docs(s, d), tauNum = 19L, tauDen = 20L,
          dim = 64)
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |           FROM documents),
             |cnt AS (SELECT doc_id,
             |          CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 64 AS b,
             |          count(*) AS c
             |        FROM t GROUP BY 1, 2),
             |grid AS (SELECT g.doc_id, g.j, coalesce(cnt.c, 0) AS c
             |         FROM (SELECT d.doc_id, j.j
             |               FROM (SELECT DISTINCT doc_id FROM documents) d,
             |                    range(0, 64) j(j)) g
             |         LEFT JOIN cnt ON cnt.doc_id = g.doc_id AND cnt.b = g.j),
             |cents AS (SELECT row_number() OVER (ORDER BY doc_id) - 1 AS list_id,
             |            doc_id AS cdoc
             |          FROM (SELECT DISTINCT doc_id FROM documents
             |                ORDER BY doc_id LIMIT 8)),
             |cg AS (SELECT cents.list_id, grid.j, grid.c AS cc
             |       FROM cents JOIN grid ON grid.doc_id = cents.cdoc),
             |dist AS (SELECT g.doc_id, cg.list_id,
             |           sum((g.c - cg.cc) * (g.c - cg.cc)) AS d2
             |         FROM grid g JOIN cg ON g.j = cg.j GROUP BY 1, 2),
             |asg AS (SELECT doc_id, list_id FROM (
             |          SELECT doc_id, list_id,
             |            row_number() OVER (PARTITION BY doc_id
             |              ORDER BY d2, list_id) AS rn
             |          FROM dist) WHERE rn = 1),
             |n2 AS (SELECT doc_id, CAST(sum(c*c) AS BIGINT) AS nn
             |       FROM cnt GROUP BY 1),
             |pr AS (SELECT a1.doc_id AS da, a2.doc_id AS db
             |       FROM asg a1 JOIN asg a2
             |         ON a1.list_id = a2.list_id AND a1.doc_id < a2.doc_id),
             |dt AS (SELECT pr.da, pr.db, CAST(sum(x.c * y.c) AS BIGINT) AS dot
             |       FROM pr JOIN cnt x ON x.doc_id = pr.da
             |               JOIN cnt y ON y.doc_id = pr.db AND y.b = x.b
             |       GROUP BY 1, 2),
             |dom AS (SELECT DISTINCT dt.db AS doc_id FROM dt
             |        JOIN n2 xa ON dt.da = xa.doc_id
             |        JOIN n2 yb ON dt.db = yb.doc_id
             |        WHERE dot * dot * 400 >= xa.nn * yb.nn * 361)
             |SELECT a.doc_id, CAST(a.list_id AS BIGINT) AS list_id,
             |  (dom.doc_id IS NULL) AS is_kept
             |FROM asg a LEFT JOIN dom ON dom.doc_id = a.doc_id
             |ORDER BY 1""".stripMargin))
  )
}
