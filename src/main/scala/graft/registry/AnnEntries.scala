package graft.registry

import graft.hta.{AggOps, Queries, Scoped, Series, Throttle}
import graft.model.{IntervalScope, Scope}
import graft.pipeline.{Ann, Cdc, Curate, Dedup, Eval, Joins, Multimodal, Packing, Profile, Sampling, Sketches, TextOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Shared._

/** Embedding/ANN and retrieval tier: brute/LSH/IVF/PQ top-k, persisted
  * indexes, BM25/hybrid search, ranking evaluation. */
private[registry] object AnnEntries {
  val entries: Seq[Entry] = Seq(

    // ---- LLM pipeline: similarity search ----
    Entry("q19_ann_top5",
      (s, d) => {
        val e = emb(s, d)
        Ann.bruteForceTopK(e.where(col("vec_id") < 3), e, k = 5)
          .orderBy("qid", "rnk")
      },
      Some(s"""WITH $quantCte,
              |p AS (SELECT q.vec_id AS qid, v.vec_id AS vid,
              |        CAST(list_sum(list_transform(list_zip(q.e, v.e), t -> t[1]*t[2])) AS DOUBLE)
              |          / (q.n * v.n) AS cosine
              |      FROM nrm q JOIN nrm v ON q.vec_id < 3 AND v.vec_id != q.vec_id),
              |r AS (SELECT qid, vid, cosine,
              |        CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS BIGINT) AS rnk
              |      FROM p)
              |SELECT qid, vid, rnk, cosine FROM r WHERE rnk <= 5 ORDER BY 1, 3""".stripMargin)),

    // ---- persisted IVF index: write-once (memoized per sfDir), then a
    //      partition-pruned probe. kmeansIters=0 → centroids are the first
    //      nlist vectors by vec_id, which DuckDB can recompute, so the whole
    //      assign→probe→rank path gets an exact SQL oracle; the kmeans
    //      variant of the same probe plan is pinned Spark-vs-Spark in
    //      PipelineSpec ----
    Entry("q43_ivf_probe",
      (s, d) => {
        val e = emb(s, d)
        Ann.ivfProbeTopK(e.where(col("vec_id") < 3), ivfIndexFor(s, d),
            k = 5, nprobe = 4)
          .orderBy("qid", "rnk")
      },
      Some(s"""WITH $quantCte,
              |cent AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS list_id,
              |           e AS ce
              |         FROM nrm ORDER BY vec_id LIMIT 16),
              |asg AS (SELECT vec_id, list_id FROM (
              |          SELECT v.vec_id, c.list_id,
              |            row_number() OVER (PARTITION BY v.vec_id ORDER BY
              |              list_sum(list_transform(list_zip(v.e, c.ce), t -> (t[1]-t[2])*(t[1]-t[2]))),
              |              c.list_id) AS rn
              |          FROM nrm v, cent c)
              |        WHERE rn = 1),
              |probe AS (SELECT qid, list_id FROM (
              |           SELECT q.vec_id AS qid, c.list_id,
              |             row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |               list_sum(list_transform(list_zip(q.e, c.ce), t -> (t[1]-t[2])*(t[1]-t[2]))),
              |               c.list_id) AS rn
              |           FROM nrm q, cent c WHERE q.vec_id < 3)
              |         WHERE rn <= 4),
              |p AS (SELECT pr.qid, a.vec_id AS vid,
              |        CAST(list_sum(list_transform(list_zip(q.e, v.e), t -> t[1]*t[2])) AS DOUBLE)
              |          / (q.n * v.n) AS cosine
              |      FROM probe pr
              |        JOIN asg a ON a.list_id = pr.list_id
              |        JOIN nrm q ON q.vec_id = pr.qid
              |        JOIN nrm v ON v.vec_id = a.vec_id
              |      WHERE v.vec_id != pr.qid),
              |r AS (SELECT qid, vid, cosine,
              |        CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS BIGINT) AS rnk
              |      FROM p)
              |SELECT qid, vid, rnk, cosine FROM r WHERE rnk <= 5 ORDER BY 1, 3""".stripMargin)),

    // ---- q43's index built INCREMENTALLY: odd vec_ids written, evens
    //      landed through the frozen-quantizer staged append (IvfStore) —
    //      the oracle's centroids therefore come from the ODD subset only,
    //      and the hash match pins the delta path end-to-end ----
    Entry("q193_ivf_delta",
      (s, d) => {
        val e = emb(s, d)
        graft.store.IvfStore.probeTopK(e.where(col("vec_id") < 3),
            ivfDeltaIndexFor(s, d), k = 5, nprobe = 4)
          .orderBy("qid", "rnk")
      },
      Some(s"""WITH $quantCte,
              |cent AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS list_id,
              |           e AS ce
              |         FROM nrm WHERE vec_id % 2 = 1 ORDER BY vec_id LIMIT 16),
              |asg AS (SELECT vec_id, list_id FROM (
              |          SELECT v.vec_id, c.list_id,
              |            row_number() OVER (PARTITION BY v.vec_id ORDER BY
              |              list_sum(list_transform(list_zip(v.e, c.ce), t -> (t[1]-t[2])*(t[1]-t[2]))),
              |              c.list_id) AS rn
              |          FROM nrm v, cent c)
              |        WHERE rn = 1),
              |probe AS (SELECT qid, list_id FROM (
              |           SELECT q.vec_id AS qid, c.list_id,
              |             row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |               list_sum(list_transform(list_zip(q.e, c.ce), t -> (t[1]-t[2])*(t[1]-t[2]))),
              |               c.list_id) AS rn
              |           FROM nrm q, cent c WHERE q.vec_id < 3)
              |         WHERE rn <= 4),
              |p AS (SELECT pr.qid, a.vec_id AS vid,
              |        CAST(list_sum(list_transform(list_zip(q.e, v.e), t -> t[1]*t[2])) AS DOUBLE)
              |          / (q.n * v.n) AS cosine
              |      FROM probe pr
              |        JOIN asg a ON a.list_id = pr.list_id
              |        JOIN nrm q ON q.vec_id = pr.qid
              |        JOIN nrm v ON v.vec_id = a.vec_id
              |      WHERE v.vec_id != pr.qid),
              |r AS (SELECT qid, vid, cosine,
              |        CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS BIGINT) AS rnk
              |      FROM p)
              |SELECT qid, vid, rnk, cosine FROM r WHERE rnk <= 5 ORDER BY 1, 3""".stripMargin)),

    // ---- q193's index with vec_id%7==0 RETIRED (embedding takedowns):
    //      the tombstone anti-join excludes them BEFORE ranking, so the
    //      top-k backfills from live vectors; the quantizer stays frozen
    //      (retired seeds keep shaping geometry), which the oracle
    //      mirrors by filtering ONLY the candidate side ----
    Entry("q194_ivf_retired",
      (s, d) => {
        val e = emb(s, d)
        graft.store.IvfStore.probeTopK(e.where(col("vec_id") < 3),
            ivfRetiredIndexFor(s, d), k = 5, nprobe = 4)
          .orderBy("qid", "rnk")
      },
      Some(s"""WITH $quantCte,
              |cent AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS list_id,
              |           e AS ce
              |         FROM nrm WHERE vec_id % 2 = 1 ORDER BY vec_id LIMIT 16),
              |asg AS (SELECT vec_id, list_id FROM (
              |          SELECT v.vec_id, c.list_id,
              |            row_number() OVER (PARTITION BY v.vec_id ORDER BY
              |              list_sum(list_transform(list_zip(v.e, c.ce), t -> (t[1]-t[2])*(t[1]-t[2]))),
              |              c.list_id) AS rn
              |          FROM nrm v, cent c)
              |        WHERE rn = 1),
              |probe AS (SELECT qid, list_id FROM (
              |           SELECT q.vec_id AS qid, c.list_id,
              |             row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |               list_sum(list_transform(list_zip(q.e, c.ce), t -> (t[1]-t[2])*(t[1]-t[2]))),
              |               c.list_id) AS rn
              |           FROM nrm q, cent c WHERE q.vec_id < 3)
              |         WHERE rn <= 4),
              |p AS (SELECT pr.qid, a.vec_id AS vid,
              |        CAST(list_sum(list_transform(list_zip(q.e, v.e), t -> t[1]*t[2])) AS DOUBLE)
              |          / (q.n * v.n) AS cosine
              |      FROM probe pr
              |        JOIN asg a ON a.list_id = pr.list_id
              |        JOIN nrm q ON q.vec_id = pr.qid
              |        JOIN nrm v ON v.vec_id = a.vec_id
              |      WHERE v.vec_id != pr.qid AND a.vec_id % 7 != 0),
              |r AS (SELECT qid, vid, cosine,
              |        CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS BIGINT) AS rnk
              |      FROM p)
              |SELECT qid, vid, rnk, cosine FROM r WHERE rnk <= 5 ORDER BY 1, 3""".stripMargin)),

    // ---- the IVF drift monitor's observable (round 15): per-vector
    //      SQUARED assignment distance (quantization residual) under the
    //      q193 delta index's frozen odd-seeded quantizer, plus the
    //      vector's quantized norm² — all-integer, so DuckDB recomputes
    //      centroids, argmin assignment and both distances exactly.
    //      IvfStore.driftStats aggregates exactly these residuals
    //      (in-distribution drops track the build baseline; drifted drops
    //      inflate it → rebuild advisory); IvfDriftSpec pins the
    //      statistic and the advisory, this row pins the ingredient ----
    Entry("q196_ivf_assign_dist",
      (s, d) => {
        val idx = ivfDeltaIndexFor(s, d)
        Ann.ivfAssignWithDist(emb(s, d), idx.centroids)
          .select(col("vid").as("vec_id"), col("list_id"), col("adist"),
            aggregate(transform(col("ve"), x => x * x), lit(0L),
              (acc, x) => acc + x).as("norm2"))
          .orderBy("vec_id")
      },
      Some(s"""WITH $quantCte,
              |cent AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS list_id,
              |           e AS ce
              |         FROM nrm WHERE vec_id % 2 = 1 ORDER BY vec_id LIMIT 16),
              |asg AS (SELECT vec_id, list_id, adist FROM (
              |          SELECT v.vec_id, c.list_id,
              |            CAST(list_sum(list_transform(list_zip(v.e, c.ce), t -> (t[1]-t[2])*(t[1]-t[2]))) AS BIGINT) AS adist,
              |            row_number() OVER (PARTITION BY v.vec_id ORDER BY
              |              list_sum(list_transform(list_zip(v.e, c.ce), t -> (t[1]-t[2])*(t[1]-t[2]))),
              |              c.list_id) AS rn
              |          FROM nrm v, cent c)
              |        WHERE rn = 1)
              |SELECT a.vec_id, a.list_id, a.adist,
              |  CAST(list_sum(list_transform(n.e, x -> x*x)) AS BIGINT) AS norm2
              |FROM asg a JOIN nrm n ON a.vec_id = n.vec_id
              |ORDER BY 1""".stripMargin)),

    Entry("q20_cosine_pairs",
      (s, d) => Ann.cosinePairsFast(emb(s, d), threshold = 0.5).orderBy("vid_a", "vid_b"),
      Some(s"""WITH $quantCte
              |SELECT a.vec_id AS vid_a, b.vec_id AS vid_b,
              |  CAST(list_sum(list_transform(list_zip(a.e, b.e), t -> t[1]*t[2])) AS DOUBLE)
              |    / (a.n * b.n) AS cosine
              |FROM nrm a JOIN nrm b ON a.vec_id < b.vec_id
              |WHERE CAST(list_sum(list_transform(list_zip(a.e, b.e), t -> t[1]*t[2])) AS DOUBLE)
              |    / (a.n * b.n) >= 0.5
              |ORDER BY 1, 2""".stripMargin)),

    // ---- LLM pipeline: embedding near-dup, the distributed (no-collect)
    //      tier — hyperplane-LSH buckets, within-bucket pairs only ----
    Entry("q32_lsh_cosine_pairs",
      (s, d) => Ann.lshCosinePairs(emb(s, d), threshold = 0.3, h = 4, dim = 64)
        .orderBy("vid_a", "vid_b"),
      Some {
        s"""WITH $quantCte,
           |bk AS (SELECT vec_id, e, n, $lshBucketSql AS bucket FROM nrm)
           |SELECT a.vec_id AS vid_a, b.vec_id AS vid_b,
           |  CAST(list_sum(list_transform(list_zip(a.e, b.e), t -> t[1]*t[2])) AS DOUBLE)
           |    / (a.n * b.n) AS cosine
           |FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
           |WHERE CAST(list_sum(list_transform(list_zip(a.e, b.e), t -> t[1]*t[2])) AS DOUBLE)
           |    / (a.n * b.n) >= 0.3
           |ORDER BY 1, 2""".stripMargin
      }),

    // ---- embedding dup clustering end-to-end: LSH cosine pairs (q32's
    //      exact oracle tier) → recursive transitive closure → min-id
    //      survivor, the embedding sibling of q49 ----
    Entry("q51_embedding_clusters",
      (s, d) => Ann.embeddingDupClusters(emb(s, d), threshold = 0.3,
          h = 4, dim = 64)
        .orderBy("vec_id"),
      Some {
        s"""WITH RECURSIVE $quantCte,
           |bk AS (SELECT vec_id, e, n, $lshBucketSql AS bucket FROM nrm),
           |pr AS (SELECT a.vec_id AS u, b.vec_id AS v
           |       FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
           |       WHERE CAST(list_sum(list_transform(list_zip(a.e, b.e), t -> t[1]*t[2])) AS DOUBLE)
           |         / (a.n * b.n) >= 0.3),
           |e2 AS (SELECT u, v FROM pr UNION SELECT v, u FROM pr),
           |reach(s, t) AS (
           |  SELECT u, u FROM e2
           |  UNION
           |  SELECT r.s, e2.v FROM reach r JOIN e2 ON r.t = e2.u),
           |cc AS (SELECT s AS vec_id, min(t) AS cluster_id FROM reach GROUP BY s)
           |SELECT em.vec_id,
           |  coalesce(cc.cluster_id, em.vec_id) AS cluster_id,
           |  (em.vec_id = coalesce(cc.cluster_id, em.vec_id)) AS keep
           |FROM embeddings em LEFT JOIN cc ON em.vec_id = cc.vec_id
           |ORDER BY em.vec_id""".stripMargin
      }),

    // ---- compressed-domain ANN: sign-bit binary quantization (32 bits
    //      per int64 word) + exact Hamming top-5. Pure sign tests and
    //      integer XOR/popcount — an ANN tier whose ranks are
    //      hash-oracle-checkable, and whose corpus scan touches 32× fewer
    //      bytes than the float tier ----
    Entry("q79_hamming_topk",
      (s, d) => {
        val e = emb(s, d)
        Ann.hammingTopK(e.where(col("vec_id") < 3), e, k = 5, dim = 64)
          .orderBy("qid", "rnk")
      },
      Some("""WITH sb AS (SELECT vec_id,
             |        list_transform(range(0, 2), w ->
             |          CAST(list_sum([CASE WHEN embedding[w*32+i+1] > 0
             |                         THEN (1::BIGINT << i) ELSE 0::BIGINT END
             |                         for i in range(0, 32)]) AS BIGINT)) AS b
             |      FROM embeddings),
             |p AS (SELECT q.vec_id AS qid, v.vec_id AS vid,
             |        CAST(list_sum([CAST(bit_count(xor(q.b[i+1], v.b[i+1])) AS BIGINT)
             |                       for i in range(0, 2)]) AS BIGINT) AS hamming
             |      FROM sb q JOIN sb v ON q.vec_id < 3 AND v.vec_id != q.vec_id),
             |r AS (SELECT qid, vid, hamming,
             |        CAST(row_number() OVER (PARTITION BY qid
             |          ORDER BY hamming, vid) AS BIGINT) AS rnk
             |      FROM p)
             |SELECT qid, vid, hamming, rnk FROM r WHERE rnk <= 5
             |ORDER BY 1, 4""".stripMargin)),

    // ---- product-quantization ANN: 4 subspaces × 16 sampled codebook
    //      entries (first-16-by-vec_id, oracle-recomputable), exact
    //      integer sub-distances → codes and ADC ranks hash-match. The
    //      oracle unrolls assign + table-lookup as relational joins ----
    Entry("q89_pq_topk",
      (s, d) => {
        val e = emb(s, d)
        Ann.pqTopK(e.where(col("vec_id") < 3), e, k = 5, m = 4, ksub = 16)
          .orderBy("qid", "rnk")
      },
      Some(s"""WITH $quantCte,
              |cent AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
              |           AS BIGINT) AS c, e
              |         FROM (SELECT vec_id, e FROM emb ORDER BY vec_id LIMIT 16)),
              |cd AS (SELECT v.vec_id, t.j, ct.c,
              |         CAST(list_sum([(v.e[t.j*16+i+1] - ct.e[t.j*16+i+1])
              |                        * (v.e[t.j*16+i+1] - ct.e[t.j*16+i+1])
              |                        for i in range(0, 16)]) AS BIGINT) AS dist
              |       FROM emb v, range(0, 4) t(j), cent ct),
              |cmin AS (SELECT vec_id, j, min(dist) AS md FROM cd GROUP BY 1, 2),
              |codes AS (SELECT cd.vec_id, cd.j, min(cd.c) AS code
              |          FROM cd JOIN cmin ON cd.vec_id = cmin.vec_id
              |            AND cd.j = cmin.j AND cd.dist = cmin.md
              |          GROUP BY 1, 2),
              |qd AS (SELECT vec_id AS qid, j, c, dist FROM cd WHERE vec_id < 3),
              |ad AS (SELECT qd.qid, co.vec_id AS vid,
              |         CAST(sum(qd.dist) AS BIGINT) AS adist
              |       FROM codes co JOIN qd ON qd.j = co.j AND qd.c = co.code
              |       WHERE co.vec_id != qd.qid
              |       GROUP BY 1, 2),
              |r AS (SELECT qid, vid, adist,
              |        CAST(row_number() OVER (PARTITION BY qid
              |          ORDER BY adist, vid) AS BIGINT) AS rnk
              |      FROM ad)
              |SELECT qid, vid, adist, rnk FROM r WHERE rnk <= 5
              |ORDER BY 1, 4""".stripMargin)),

    // ---- reciprocal rank fusion: tf-idf search ranking (q65's scorer,
    //      top 100) fused with a length-prior ranking by n_chars — rank
    //      arithmetic only, fixed-point contributions, k = 60 ----
    Entry("q92_rrf_fuse",
      (s, d) => {
        val wSearch = Window.orderBy(desc("score"), asc("doc_id"))
        val a = TextOps.searchTopK(docs(s, d),
            Seq("join", "filter", "vector"), k = 100)
          .withColumn("rnk", row_number().over(wSearch).cast("long"))
        // TakeOrdered cut FIRST, then rank the 100-row frame — a global
        // row_number over the full corpus would be a global sort
        val wLen = Window.orderBy(desc("n_chars"), asc("doc_id"))
        val b = docs(s, d).select(col("doc_id"), col("n_chars"))
          .orderBy(desc("n_chars"), asc("doc_id")).limit(100)
          .withColumn("rnk", row_number().over(wLen).cast("long"))
        TextOps.rrfFuse(Seq(a.select("doc_id", "rnk"),
          b.select("doc_id", "rnk")), topK = 20)
      },
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |           FROM documents),
             |f AS (SELECT doc_id, token, count(*) AS tf FROM t
             |      WHERE token IN ('join', 'filter', 'vector') GROUP BY 1, 2),
             |i AS (SELECT token,
             |        ((SELECT count(*) FROM documents) * 1000000) // count(*) AS idf_scaled
             |      FROM f GROUP BY token),
             |sc AS (SELECT doc_id, CAST(sum(f.tf * i.idf_scaled) AS BIGINT) AS score
             |       FROM f JOIN i USING (token) GROUP BY doc_id
             |       ORDER BY score DESC, doc_id LIMIT 100),
             |ra AS (SELECT doc_id, CAST(row_number() OVER
             |         (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk FROM sc),
             |rb AS (SELECT doc_id, rnk FROM (
             |         SELECT doc_id, CAST(row_number() OVER
             |           (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rnk
             |         FROM documents) WHERE rnk <= 100),
             |u AS (SELECT doc_id, 1000000000000 // (60 + rnk) AS c FROM ra
             |      UNION ALL
             |      SELECT doc_id, 1000000000000 // (60 + rnk) AS c FROM rb)
             |SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf,
             |       count(*) AS n_lists
             |FROM u GROUP BY 1 ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin)),

    // ---- BM25 retrieval in exact integer arithmetic: Robertson tf
    //      saturation as the rational 22·tf·L / (10·tf·L + 3·L + 9·dl·N)
    //      at fixed point 1e6 (k1=1.2, b=0.75 multiplied through by 10·L),
    //      q65's log-free integer idf — bit-identical across engines ----
    Entry("q99_bm25",
      (s, d) => TextOps.bm25TopK(docs(s, d),
          Seq("join", "filter", "vector"), k = 20),
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |           FROM documents),
             |dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
             |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS L FROM dl),
             |nn AS (SELECT count(*) AS N FROM documents),
             |f AS (SELECT doc_id, token, count(*) AS tf FROM t
             |      WHERE token IN ('join', 'filter', 'vector') GROUP BY 1, 2),
             |i AS (SELECT token, (nn.N * 1000000) // count(*) AS idf_scaled
             |      FROM f, nn GROUP BY token, nn.N),
             |sc AS (SELECT f.doc_id,
             |         CAST(sum(i.idf_scaled *
             |           ((22 * f.tf * tot.L * 1000000)
             |            // (10 * f.tf * tot.L + 3 * tot.L + 9 * dl.dl * nn.N)))
             |           AS BIGINT) AS score
             |       FROM f JOIN i USING (token) JOIN dl USING (doc_id), tot, nn
             |       GROUP BY 1)
             |SELECT doc_id, score FROM sc
             |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)),

    // ---- embedding QA: each label's farthest-from-centroid member in
    //      exact integers (n²·‖v−mean‖² = Σ(n·q − S)², no mean division)
    //      — mislabel/contamination flagging over the embeddings table ----
    Entry("q106_label_outliers",
      (s, d) => Ann.labelOutliers(emb(s, d)).orderBy("label"),
      Some("""WITH e0 AS (SELECT vec_id, label,
             |    list_transform(embedding,
             |      x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS e
             |  FROM embeddings),
             |t AS (SELECT vec_id, label,
             |        unnest([{'d': i, 'q': e[i]} for i in range(1, len(e)+1)]) AS u
             |      FROM e0),
             |x AS (SELECT vec_id, label, u.d AS d, u.q AS q FROM t),
             |sd AS (SELECT label, d, CAST(sum(q) AS BIGINT) AS s
             |       FROM x GROUP BY 1, 2),
             |n AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1),
             |dd AS (SELECT x.label, x.vec_id,
             |         CAST(sum((n.n*x.q - sd.s)*(n.n*x.q - sd.s)) AS BIGINT) AS d2_num
             |       FROM x JOIN sd ON x.label = sd.label AND x.d = sd.d
             |              JOIN n ON x.label = n.label
             |       GROUP BY 1, 2),
             |r AS (SELECT label, vec_id, d2_num,
             |        row_number() OVER (PARTITION BY label
             |          ORDER BY d2_num DESC, vec_id) AS rn
             |      FROM dd)
             |SELECT r.label, n.n, r.vec_id AS outlier_id, r.d2_num
             |FROM r JOIN n ON r.label = n.label
             |WHERE rn = 1 ORDER BY r.label""".stripMargin)),

    // ---- document clustering end-to-end: hashVectorize (16-dim token
    //      count vectors) → deterministic seeded centroids (8 smallest
    //      doc_ids, the q43 discipline) → min-L2 assignment. The 1e4
    //      quantization is a PURE SCALING of integer counts, so the
    //      oracle assigns on raw counts — identical argmin, same ties ----
    Entry("q114_doc_clusters",
      (s, d) => {
        val v = TextOps.hashVectorize(docs(s, d), dim = 16)
          .select(col("doc_id").as("vec_id"), col("vec").as("embedding"))
        val cents = Ann.ivfCentroids(v, nlist = 8)
        Ann.ivfAssign(v, cents)
          .select(col("vid").as("doc_id"), col("list_id"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |           FROM documents),
             |cnt AS (SELECT doc_id,
             |          CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 16 AS b,
             |          count(*) AS c
             |        FROM t GROUP BY 1, 2),
             |grid AS (SELECT g.doc_id, g.j, coalesce(cnt.c, 0) AS c
             |         FROM (SELECT d.doc_id, j.j
             |               FROM (SELECT DISTINCT doc_id FROM documents) d,
             |                    range(0, 16) j(j)) g
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
             |asg AS (SELECT doc_id, list_id,
             |          row_number() OVER (PARTITION BY doc_id
             |            ORDER BY d2, list_id) AS rn
             |        FROM dist)
             |SELECT doc_id, CAST(list_id AS BIGINT) AS list_id
             |FROM asg WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // ---- ANN quality evaluation: recall@5 of the IVF probe tier
    //      (nlist=16, nprobe=4, seeded centroids) against the exact
    //      brute-force ranking, per query — the continuous QA loop that
    //      keeps an approximate index honest as data drifts ----
    Entry("q116_ann_recall",
      (s, d) => {
        val e = emb(s, d)
        val qs = e.where(col("vec_id") < 10)
        Eval.recallAtK(
            Ann.ivfTopK(qs, e, k = 5, nlist = 16, nprobe = 4, kmeansIters = 0),
            Ann.bruteForceTopK(qs, e, k = 5), k = 5)
          .orderBy("qid")
      },
      Some(s"""WITH $quantCte,
              |cent AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS list_id,
              |           e AS ce
              |         FROM nrm ORDER BY vec_id LIMIT 16),
              |asg AS (SELECT vec_id, list_id FROM (
              |          SELECT v.vec_id, c.list_id,
              |            row_number() OVER (PARTITION BY v.vec_id ORDER BY
              |              list_sum(list_transform(list_zip(v.e, c.ce), t -> (t[1]-t[2])*(t[1]-t[2]))),
              |              c.list_id) AS rn
              |          FROM nrm v, cent c)
              |        WHERE rn = 1),
              |probe AS (SELECT qid, list_id FROM (
              |           SELECT q.vec_id AS qid, c.list_id,
              |             row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |               list_sum(list_transform(list_zip(q.e, c.ce), t -> (t[1]-t[2])*(t[1]-t[2]))),
              |               c.list_id) AS rn
              |           FROM nrm q, cent c WHERE q.vec_id < 10)
              |         WHERE rn <= 4),
              |ap AS (SELECT qid, vid FROM (
              |         SELECT pr.qid, a.vec_id AS vid,
              |           row_number() OVER (PARTITION BY pr.qid ORDER BY
              |             CAST(list_sum(list_transform(list_zip(q.e, v.e), t -> t[1]*t[2])) AS DOUBLE)
              |               / (q.n * v.n) DESC, a.vec_id) AS rnk
              |         FROM probe pr
              |           JOIN asg a ON a.list_id = pr.list_id
              |           JOIN nrm q ON q.vec_id = pr.qid
              |           JOIN nrm v ON v.vec_id = a.vec_id
              |         WHERE v.vec_id != pr.qid)
              |       WHERE rnk <= 5),
              |bp AS (SELECT qid, vid FROM (
              |         SELECT q.vec_id AS qid, v.vec_id AS vid,
              |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |             CAST(list_sum(list_transform(list_zip(q.e, v.e), t -> t[1]*t[2])) AS DOUBLE)
              |               / (q.n * v.n) DESC, v.vec_id) AS rnk
              |         FROM nrm q JOIN nrm v
              |           ON q.vec_id < 10 AND v.vec_id != q.vec_id)
              |       WHERE rnk <= 5),
              |hits AS (SELECT bp.qid, count(*) AS c
              |         FROM bp JOIN ap ON ap.qid = bp.qid AND ap.vid = bp.vid
              |         GROUP BY 1)
              |SELECT u.qid, CAST(coalesce(c, 0) AS BIGINT) AS n_hits,
              |  CAST(5 AS BIGINT) AS k,
              |  CAST(coalesce(c, 0) * 1000000 // least(5, u.ne) AS BIGINT) AS recall_e6
              |FROM (SELECT qid, count(*) AS ne FROM bp GROUP BY 1) u
              |LEFT JOIN hits ON hits.qid = u.qid
              |ORDER BY 1""".stripMargin)),

    // ---- per-dimension embedding statistics: the whitening/encoder-QA
    //      prep — exact BIGINT moments on the quantized grid, one
    //      narrow posexplode + one dim-keyed partial-agg shuffle ----
    Entry("q128_embedding_stats",
      (s, d) => Ann.embeddingStats(emb(s, d)).orderBy("dim"),
      Some("""WITH q AS (
             |  SELECT unnest([{'dim': CAST(i - 1 AS BIGINT),
             |                  'q': CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT)}
             |                 for i in range(1, len(embedding) + 1)]) AS u
             |  FROM embeddings)
             |SELECT u.dim AS dim, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(u.q) AS BIGINT) AS sum_q,
             |  CAST(sum(u.q * u.q) AS BIGINT) AS sumsq_q,
             |  CAST(min(u.q) AS BIGINT) AS min_q,
             |  CAST(max(u.q) AS BIGINT) AS max_q,
             |  CAST((sum(u.q) - (((sum(u.q) % count(*)) + count(*)) % count(*)))
             |       // count(*) AS BIGINT) AS mean_q
             |FROM q GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- percentile-rank normalization: histogram-windowed exact
    //      percent_rank per source, broadcast back — the score
    //      calibration pass before mixing/filtering ----
    Entry("q134_rank_normalize",
      (s, d) => Profile.rankNormalize(
          docs(s, d).select("doc_id", "source", "n_chars"),
          "n_chars", Seq("source"))
        .orderBy("doc_id"),
      Some("""WITH h AS (SELECT source, n_chars AS v, count(*) AS c
             |           FROM documents GROUP BY 1, 2),
             |r AS (SELECT source, v,
             |        sum(c) OVER (PARTITION BY source ORDER BY v) - c AS lt,
             |        sum(c) OVER (PARTITION BY source) AS n
             |      FROM h)
             |SELECT d.doc_id, d.source, d.n_chars,
             |  CAST(CASE WHEN r.n <= 1 THEN 0
             |       ELSE (r.lt * 1000000) // (r.n - 1) END AS BIGINT) AS pct_e6
             |FROM documents d
             |JOIN r ON d.source = r.source AND d.n_chars = r.v
             |ORDER BY d.doc_id""".stripMargin)),

    // ---- depth-wise ranking agreement: the exact RBO core — two
    //      100-deep scorer rankings, co-presence histogram, k-row
    //      cumulative window ----
    Entry("q135_ranking_agreement",
      (s, d) => {
        val base = docs(s, d)
        val k = 100
        def top(ord: Seq[org.apache.spark.sql.Column]) = base
          .orderBy(ord: _*).limit(k)
          .withColumn("rnk", row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy(ord: _*)))
          .select("doc_id", "rnk")
        val a = top(Seq(desc("n_chars"), asc("doc_id")))
        val b = top(Seq(TextOps.md5Long(col("text")).asc, asc("doc_id")))
        Eval.rankingAgreement(a, b, k).orderBy("d")
      },
      Some("""WITH a AS (SELECT doc_id,
             |        CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id)
             |             AS BIGINT) AS ra
             |      FROM documents ORDER BY n_chars DESC, doc_id LIMIT 100),
             |b AS (SELECT doc_id,
             |        CAST(row_number() OVER (ORDER BY
             |          CAST('0x' || substr(md5(text), 1, 15) AS BIGINT), doc_id)
             |             AS BIGINT) AS rb
             |      FROM documents
             |      ORDER BY CAST('0x' || substr(md5(text), 1, 15) AS BIGINT),
             |        doc_id
             |      LIMIT 100),
             |co AS (SELECT greatest(ra, rb) AS d, count(*) AS c
             |       FROM a JOIN b USING (doc_id) GROUP BY 1),
             |ds AS (SELECT unnest(range(1, 101)) AS d)
             |SELECT ds.d,
             |  CAST(sum(coalesce(co.c, 0)) OVER (ORDER BY ds.d) AS BIGINT)
             |    AS n_common,
             |  CAST((sum(coalesce(co.c, 0)) OVER (ORDER BY ds.d) * 1000000)
             |       // ds.d AS BIGINT) AS agree_e6
             |FROM ds LEFT JOIN co USING (d)
             |ORDER BY ds.d""".stripMargin)),

    // ---- hard-negative mining: per-query top-k nearest with a
    //      DIFFERENT label — q19's broadcast shape with the mismatch
    //      predicate inside the join ----
    Entry("q137_hard_negatives",
      (s, d) => {
        val e = emb(s, d)
        Ann.hardNegatives(e.where(col("vec_id") < 3), e, k = 5)
          .orderBy("qid", "rnk")
      },
      Some(s"""WITH $quantCte,
              |lb AS (SELECT vec_id, label FROM embeddings),
              |p AS (SELECT q.vec_id AS qid, ql.label AS q_label,
              |        v.vec_id AS vid, vl.label AS neg_label,
              |        CAST(list_sum(list_transform(list_zip(q.e, v.e), t -> t[1]*t[2])) AS DOUBLE)
              |          / (q.n * v.n) AS cosine
              |      FROM nrm q, lb ql, nrm v, lb vl
              |      WHERE q.vec_id < 3 AND ql.vec_id = q.vec_id
              |        AND vl.vec_id = v.vec_id AND ql.label != vl.label),
              |r AS (SELECT qid, q_label, vid, neg_label, cosine,
              |        CAST(row_number() OVER (PARTITION BY qid
              |          ORDER BY cosine DESC, vid) AS BIGINT) AS rnk
              |      FROM p)
              |SELECT qid, q_label, vid, neg_label, rnk, cosine
              |FROM r WHERE rnk <= 5 ORDER BY 1, 5""".stripMargin)),

    // ---- RAG-ingestion capstone: chunk → hash-vectorize → seeded IVF →
    //      probe top-5 (chunk retrieval end-to-end through the verified
    //      ANN tier; composition — the parts own the specs: q107 chunking,
    //      q66 vectorize, q43/q114 IVF). Assignment/probe argmins run on
    //      raw counts in SQL (the ×1e8 quantization scale is ordering-
    //      invariant); cosine mirrors the quantized-int path exactly ----
    Entry("q169_rag_probe",
      (s, d) => {
        val ch = TextOps.chunkDocs(docs(s, d), window = 30, stride = 30)
          .select((col("doc_id") * 1000000L + col("chunk_id")).as("doc_id"),
            col("chunk").as("text"))
        val v = TextOps.hashVectorize(ch, dim = 16)
          .select(col("doc_id").as("vec_id"), col("vec").as("embedding"))
        val q = v.orderBy("vec_id").limit(3)
        Ann.ivfTopK(q, v, k = 5, nlist = 8, nprobe = 2, kmeansIters = 0)
          .orderBy("qid", "rnk")
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
             |ck AS (SELECT doc_id,
             |         unnest([{'k': k, 'c': array_to_string(s[k*30+1 : k*30+30], ' ')}
             |           for k in range(0, (len(s)-1)//30 + 1)]) AS u
             |       FROM d WHERE len(s) > 0),
             |cv AS (SELECT doc_id*1000000 + u.k AS vec_id, u.c AS chunk FROM ck),
             |t AS (SELECT vec_id, unnest(string_split(chunk, ' ')) AS tok FROM cv),
             |cnt AS (SELECT vec_id,
             |          CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 16 AS b,
             |          count(*) AS c
             |        FROM t GROUP BY 1, 2),
             |grid AS (SELECT g.vec_id, g.j, coalesce(cnt.c, 0) AS c
             |         FROM (SELECT v.vec_id, j.j
             |               FROM (SELECT DISTINCT vec_id FROM cv) v,
             |                    range(0, 16) j(j)) g
             |         LEFT JOIN cnt ON cnt.vec_id = g.vec_id AND cnt.b = g.j),
             |nrm AS (SELECT vec_id,
             |          sqrt(CAST(sum((c*10000)*(c*10000)) AS DOUBLE)) AS n
             |        FROM grid GROUP BY 1),
             |cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list_id,
             |            vec_id AS cvec
             |          FROM (SELECT DISTINCT vec_id FROM cv ORDER BY vec_id LIMIT 8)),
             |cg AS (SELECT cents.list_id, grid.j, grid.c AS cc
             |       FROM cents JOIN grid ON grid.vec_id = cents.cvec),
             |dist AS (SELECT g.vec_id, cg.list_id,
             |           sum((g.c - cg.cc) * (g.c - cg.cc)) AS d2
             |         FROM grid g JOIN cg ON g.j = cg.j GROUP BY 1, 2),
             |asg AS (SELECT vec_id, list_id FROM (
             |          SELECT vec_id, list_id,
             |            row_number() OVER (PARTITION BY vec_id
             |              ORDER BY d2, list_id) AS rn
             |          FROM dist) WHERE rn = 1),
             |qs AS (SELECT vec_id FROM cv ORDER BY vec_id LIMIT 3),
             |probe AS (SELECT qid, list_id FROM (
             |            SELECT dd.vec_id AS qid, dd.list_id,
             |              row_number() OVER (PARTITION BY dd.vec_id
             |                ORDER BY dd.d2, dd.list_id) AS rn
             |            FROM dist dd JOIN qs ON dd.vec_id = qs.vec_id)
             |          WHERE rn <= 2),
             |dotr AS (SELECT p.qid, a.vec_id AS vid,
             |           CAST(sum(gq.c * gv.c) AS BIGINT) AS dot_raw
             |         FROM probe p JOIN asg a ON a.list_id = p.list_id
             |           JOIN grid gq ON gq.vec_id = p.qid
             |           JOIN grid gv ON gv.vec_id = a.vec_id AND gv.j = gq.j
             |         WHERE a.vec_id != p.qid GROUP BY 1, 2),
             |sc AS (SELECT dotr.qid, dotr.vid,
             |         CAST(dot_raw * 100000000 AS DOUBLE) / (nq.n * nv.n) AS cosine
             |       FROM dotr JOIN nrm nq ON nq.vec_id = dotr.qid
             |                 JOIN nrm nv ON nv.vec_id = dotr.vid),
             |r AS (SELECT qid, vid, cosine,
             |        CAST(row_number() OVER (PARTITION BY qid
             |          ORDER BY cosine DESC, vid) AS BIGINT) AS rnk
             |      FROM sc)
             |SELECT qid, vid, rnk, cosine FROM r WHERE rnk <= 5
             |ORDER BY 1, 3""".stripMargin)),

    // ---- persisted inverted text index: bucket=-partitioned postings +
    //      dict, search probes ONLY the query terms' buckets (literal
    //      partition filter — the q43 persisted-IVF discipline for
    //      keyword search). Scores identical to the on-the-fly q65
    //      scorer, so the oracle is the same shape over the raw table ----
    Entry("q171_indexed_search",
      (s, d) => graft.store.TextIndex.searchTopK(s, textIndexFor(s, d),
        Seq("query", "index", "merge"), k = 10),
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |           FROM documents),
             |f AS (SELECT doc_id, token, count(*) AS tf FROM t
             |      WHERE token IN ('query', 'index', 'merge') GROUP BY 1, 2),
             |i AS (SELECT token,
             |        ((SELECT count(*) FROM documents) * 1000000) // count(*) AS idf_scaled
             |      FROM f GROUP BY token)
             |SELECT doc_id, CAST(sum(f.tf * i.idf_scaled) AS BIGINT) AS score
             |FROM f JOIN i USING (token) GROUP BY doc_id
             |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)),

    // ---- the q171 index built INCREMENTALLY (2/3 written, 1/3
    //      appended): postings/df/n_docs are additive, so the delta
    //      index must search identically to a full build — the oracle
    //      is the same q65 shape over the whole raw table ----
    Entry("q172_indexed_search_delta",
      (s, d) => graft.store.TextIndex.searchTopK(s, textIndexDeltaFor(s, d),
        Seq("scan", "filter"), k = 10),
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |           FROM documents),
             |f AS (SELECT doc_id, token, count(*) AS tf FROM t
             |      WHERE token IN ('scan', 'filter') GROUP BY 1, 2),
             |i AS (SELECT token,
             |        ((SELECT count(*) FROM documents) * 1000000) // count(*) AS idf_scaled
             |      FROM f GROUP BY token)
             |SELECT doc_id, CAST(sum(f.tf * i.idf_scaled) AS BIGINT) AS score
             |FROM f JOIN i USING (token) GROUP BY doc_id
             |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)),

    // ---- indexed phrase search: q131's semantics over the persisted
    //      POSITIONAL tier — the corpus is never scanned at query time
    //      (bucket-pruned positional postings + the (doc, pos−i) chain).
    //      Same oracle shape as q131 with a different phrase ----
    Entry("q174_indexed_phrase",
      (s, d) => graft.store.TextIndex.phraseSearch(s,
          textIndexPosFor(s, d), Seq("table", "scan"))
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS s
             |           FROM documents),
             |m AS (SELECT doc_id,
             |        len([i for i in range(1, len(s))
             |             if s[i] = 'table' AND s[i+1] = 'scan']) AS n_matches
             |      FROM t)
             |SELECT doc_id, CAST(n_matches AS BIGINT) AS n_matches
             |FROM m WHERE n_matches > 0 ORDER BY doc_id""".stripMargin)),

    // ---- BM25 over the persisted index: q99's exact rational with tf
    //      from bucket-pruned postings, df from the dict, dl from the
    //      doclen table, L/N as meta literals — same oracle shape ----
    Entry("q175_indexed_bm25",
      (s, d) => graft.store.TextIndex.bm25TopK(s, textIndexFor(s, d),
        Seq("query", "merge", "stream"), k = 20),
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |           FROM documents),
             |dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
             |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS L FROM dl),
             |nn AS (SELECT count(*) AS N FROM documents),
             |f AS (SELECT doc_id, token, count(*) AS tf FROM t
             |      WHERE token IN ('query', 'merge', 'stream') GROUP BY 1, 2),
             |i AS (SELECT token, (nn.N * 1000000) // count(*) AS idf_scaled
             |      FROM f, nn GROUP BY token, nn.N),
             |sc AS (SELECT f.doc_id,
             |         CAST(sum(i.idf_scaled *
             |           ((22 * f.tf * tot.L * 1000000)
             |            // (10 * f.tf * tot.L + 3 * tot.L + 9 * dl.dl * nn.N)))
             |           AS BIGINT) AS score
             |       FROM f JOIN i USING (token) JOIN dl USING (doc_id), tot, nn
             |       GROUP BY 1)
             |SELECT doc_id, score FROM sc
             |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)),

    // ---- hybrid retrieval capstone: BM25 lexical ranking fused with an
    //      embedding ANN ranking (query = doc 0's hash-count vector) by
    //      reciprocal rank — the modern retrieval stack end-to-end over
    //      three verified tiers (q99 scorer, q66/q19 cosine path, q92
    //      fusion). Assignment-free: both rankings are answer-sized ----
    Entry("q176_hybrid_search",
      (s, d) => {
        val dd = docs(s, d)
        val wLex = Window.orderBy(desc("score"), asc("doc_id"))
        val lex = TextOps.bm25TopK(dd, Seq("hash", "join", "scan"), k = 20)
          // rank AFTER the TakeOrdered cut: a 20-row frame (bounded)
          .withColumn("rnk", row_number().over(wLex).cast("long"))
          .select("doc_id", "rnk")
        val v = TextOps.hashVectorize(dd, dim = 16)
          .select(col("doc_id").as("vec_id"), col("vec").as("embedding"))
        val sem = Ann.bruteForceTopK(v.where(col("vec_id") === 0L), v,
            k = 20)
          .select(col("vid").as("doc_id"), col("rnk"))
        TextOps.rrfFuse(Seq(lex, sem), topK = 10)
      },
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |           FROM documents),
             |dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
             |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS L FROM dl),
             |nn AS (SELECT count(*) AS N FROM documents),
             |f AS (SELECT doc_id, token, count(*) AS tf FROM t
             |      WHERE token IN ('hash', 'join', 'scan') GROUP BY 1, 2),
             |i AS (SELECT token, (nn.N * 1000000) // count(*) AS idf_scaled
             |      FROM f, nn GROUP BY token, nn.N),
             |bm AS (SELECT f.doc_id,
             |         CAST(sum(i.idf_scaled *
             |           ((22 * f.tf * tot.L * 1000000)
             |            // (10 * f.tf * tot.L + 3 * tot.L + 9 * dl.dl * nn.N)))
             |           AS BIGINT) AS score
             |       FROM f JOIN i USING (token) JOIN dl USING (doc_id), tot, nn
             |       GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 20),
             |ra AS (SELECT doc_id, CAST(row_number() OVER
             |         (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk FROM bm),
             |cnt AS (SELECT doc_id,
             |          CAST('0x' || substr(md5(token), 1, 15) AS BIGINT) % 16 AS b,
             |          count(*) AS c
             |        FROM t GROUP BY 1, 2),
             |grid AS (SELECT g.doc_id, g.j, coalesce(cnt.c, 0) AS c
             |         FROM (SELECT dd.doc_id, j.j
             |               FROM (SELECT DISTINCT doc_id FROM documents) dd,
             |                    range(0, 16) j(j)) g
             |         LEFT JOIN cnt ON cnt.doc_id = g.doc_id AND cnt.b = g.j),
             |nrm AS (SELECT doc_id,
             |          sqrt(CAST(sum((c*10000)*(c*10000)) AS DOUBLE)) AS n
             |        FROM grid GROUP BY 1),
             |q0 AS (SELECT j, c FROM grid WHERE doc_id = 0),
             |dotr AS (SELECT g.doc_id AS vid,
             |           CAST(sum(g.c * q0.c) AS BIGINT) AS dot_raw
             |         FROM grid g JOIN q0 ON g.j = q0.j
             |         WHERE g.doc_id <> 0 GROUP BY 1),
             |cosv AS (SELECT dotr.vid,
             |           CAST(dot_raw * 100000000 AS DOUBLE)
             |             / (nq.n * nv.n) AS cosine
             |         FROM dotr
             |           CROSS JOIN (SELECT n FROM nrm WHERE doc_id = 0) nq
             |           JOIN nrm nv ON nv.doc_id = dotr.vid),
             |rb AS (SELECT vid AS doc_id, rnk FROM (
             |         SELECT vid, CAST(row_number() OVER
             |           (ORDER BY cosine DESC, vid) AS BIGINT) AS rnk
             |         FROM cosv) WHERE rnk <= 20),
             |u AS (SELECT doc_id, 1000000000000 // (60 + rnk) AS rc FROM ra
             |      UNION ALL
             |      SELECT doc_id, 1000000000000 // (60 + rnk) AS rc FROM rb)
             |SELECT doc_id, CAST(sum(rc) AS BIGINT) AS rrf,
             |       count(*) AS n_lists
             |FROM u GROUP BY 1 ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin))
  )
}
