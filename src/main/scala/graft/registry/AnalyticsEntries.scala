package graft.registry

import graft.hta.{AggOps, Queries, Scoped, Series, Throttle}
import graft.model.{IntervalScope, Scope}
import graft.pipeline.{Ann, Cdc, Curate, Dedup, Eval, Joins, Multimodal, Packing, Profile, Sampling, Sketches, TextOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Shared._

/** Event analytics and sketches: funnels, retention, graphs,
  * HLL/Count-Min/HDR, session overlap, path mining. */
private[registry] object AnalyticsEntries {
  val entries: Seq[Entry] = Seq(

    // ---- exact per-metric percentiles over a range via histogram
    //      selection — no global sort; all-integer rank arithmetic
    //      (100*cum >= n*p <=> cum >= ceil(n*p/100)), percentile_disc
    //      semantics. DuckDB's sum() OVER is HUGEINT — comparisons are
    //      fine, but every emitted sum must CAST to BIGINT (q42 lesson) ----
    Entry("q54_quantiles",
      (s, d) => graft.hta.Queries.valueQuantiles(ev(s, d), B, E,
          ps = Seq(50, 95, 99))
        .orderBy("metric", "p"),
      Some(s"""WITH $ptsCte,
              |h AS (SELECT metric, cents, count(*) AS c FROM pts
              |      WHERE time >= $B AND time < $E GROUP BY 1, 2),
              |w AS (SELECT metric, cents,
              |        sum(c) OVER (PARTITION BY metric ORDER BY cents) AS cum,
              |        sum(c) OVER (PARTITION BY metric) AS n FROM h),
              |x AS (SELECT metric, cents, cum, n, unnest([50, 95, 99]) AS p FROM w)
              |SELECT metric, CAST(p AS BIGINT) AS p, min(cents) AS q_cents,
              |       CAST(min(n) AS BIGINT) AS n
              |FROM x WHERE 100 * cum >= n * p
              |GROUP BY metric, p ORDER BY metric, p""".stripMargin)),

    // ---- graph centrality: integer-arithmetic PageRank over the
    //      undirected supplier<->customer graph from lineitem x orders
    //      (customers offset by 1e6 to disjoin the key spaces). 5 power
    //      iterations; the oracle UNROLLS them as chained CTEs — every
    //      operation is BIGINT floor-div/sum, so both engines agree
    //      bit-for-bit regardless of shuffle order ----
    Entry("q56_pagerank",
      (s, d) => {
        val li = s.read.parquet(s"$d/lineitem.parquet")
        val ord = s.read.parquet(s"$d/orders.parquet")
        val fwd = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey").cast("long").as("src"),
            (col("o_custkey").cast("long") + 1000000L).as("dst"))
        val edges = fwd.unionByName(
          fwd.select(col("dst").as("src"), col("src").as("dst")))
        graft.pipeline.Graph.pageRank(edges, iters = 5).orderBy("node")
      },
      Some(pageRankOracleSql(5))),

    // ---- event funnel: users completing signup -> view -> click ->
    //      purchase in strict time order (earliest-completion reach) ----
    Entry("q57_funnel",
      (s, d) => {
        val raw = s.read.parquet(s"$d/events.parquet")
        val ev = raw.select(
          col("event_type").as("metric"), Tables.tsNs(raw).as("time"),
          col("user_id"))
        graft.pipeline.Sessionize.funnel(ev, Seq("signup", "view", "click", "purchase"))
          .orderBy("step")
      },
      Some("""WITH ev AS (SELECT user_id, event_type,
             |              epoch_us(ts)*1000 AS t FROM events),
             |s1 AS (SELECT user_id, min(t) AS t FROM ev
             |       WHERE event_type = 'signup' GROUP BY 1),
             |s2 AS (SELECT e.user_id, min(e.t) AS t FROM ev e
             |       JOIN s1 ON e.user_id = s1.user_id
             |       WHERE e.event_type = 'view' AND e.t > s1.t GROUP BY 1),
             |s3 AS (SELECT e.user_id, min(e.t) AS t FROM ev e
             |       JOIN s2 ON e.user_id = s2.user_id
             |       WHERE e.event_type = 'click' AND e.t > s2.t GROUP BY 1),
             |s4 AS (SELECT e.user_id, min(e.t) AS t FROM ev e
             |       JOIN s3 ON e.user_id = s3.user_id
             |       WHERE e.event_type = 'purchase' AND e.t > s3.t GROUP BY 1)
             |SELECT * FROM (
             |  SELECT CAST(1 AS BIGINT) AS step, 'signup' AS event_type,
             |         CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
             |  UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
             |  UNION ALL SELECT 3, 'click', (SELECT count(*) FROM s3)
             |  UNION ALL SELECT 4, 'purchase', (SELECT count(*) FROM s4))
             |ORDER BY step""".stripMargin)),

    // ---- cohort retention triangle: first-event day cohorts x active-day
    //      offsets, distinct users per cell. Day index by integer floor-div
    //      of the us-grid ns time — exact on both engines ----
    Entry("q58_retention",
      (s, d) => {
        val raw = s.read.parquet(s"$d/events.parquet")
        val ev = raw.select(
          Tables.tsNs(raw).as("time"),
          col("user_id"))
        graft.pipeline.Sessionize.retention(ev).orderBy("cohort_day", "day_offset")
      },
      Some("""WITH d AS (SELECT user_id,
             |             (epoch_us(ts)*1000) // 86400000000000 AS day
             |           FROM events),
             |c AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY 1)
             |SELECT c.cohort AS cohort_day, d.day - c.cohort AS day_offset,
             |       CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_users
             |FROM d JOIN c ON d.user_id = c.user_id
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- HyperLogLog approximate distinct users per metric: the register
    //      table and scaled harmonic sum are exact integers, so even an
    //      APPROXIMATE sketch is hash-oracle-checkable ----
    Entry("q77_hll_distinct",
      (s, d) => Sketches.approxDistinct(
          s.read.parquet(s"$d/events.parquet")
            .select(col("event_type").as("metric"), col("user_id")),
          keys = Seq("metric"), valueCol = "user_id", p = hllP)
        .orderBy("metric"),
      Some(s"""WITH ev AS (SELECT event_type AS metric,
              |              CAST(user_id AS VARCHAR) AS v
              |            FROM events WHERE user_id IS NOT NULL),
              |h AS (SELECT metric,
              |        CAST('0x' || substr(md5(v), 1, 15) AS BIGINT) AS h
              |      FROM ev),
              |r AS (SELECT metric, h // $hllWMod AS j, h % $hllWMod AS w
              |      FROM h),
              |rk AS (SELECT metric, j,
              |         CASE WHEN w = 0 THEN $hllMaxRank
              |              ELSE $hllMaxRank - length(printf('%b', w)) END AS rank
              |       FROM r),
              |regs AS (SELECT metric, j, max(rank) AS mj FROM rk GROUP BY 1, 2),
              |z AS (SELECT metric,
              |        CAST(sum(1::BIGINT << ($hllMaxRank - mj))
              |          + ($hllM - count(*)) * ${1L << hllMaxRank} AS BIGINT) AS zi,
              |        CAST($hllM - count(*) AS BIGINT) AS zero_regs
              |      FROM regs GROUP BY 1)
              |SELECT metric, zi, zero_regs,
              |  CAST('$hllAlpha' AS DOUBLE) *
              |    (CAST('$hllScale' AS DOUBLE) / CAST(zi AS DOUBLE)) AS est_raw
              |FROM z ORDER BY metric""".stripMargin)),

    // ---- exact triangle counting over the co-purchase graph (parts that
    //      share an order): degree-ordered orientation makes each triangle
    //      a single DAG path + closing edge — one wedge join, no /3
    //      dedup. The oracle runs the identical orientation in SQL; all
    //      integers, so hash parity is exact ----
    Entry("q78_triangles",
      (s, d) => {
        val li = s.read.parquet(s"$d/lineitem.parquet")
          .where(col("l_orderkey") % 4 === 0)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val edges = li.select(col("ok"), col("pk").as("src"))
          .join(li.select(col("ok"), col("pk").as("dst")), "ok")
          .where(col("src") < col("dst"))
          .select("src", "dst")
        graft.pipeline.Graph.triangleCounts(edges).orderBy("node")
      },
      Some("""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
             |            WHERE l_orderkey % 4 = 0),
             |e0 AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
             |       FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             |        AND a.l_partkey < b.l_partkey),
             |deg AS (SELECT node, count(*) AS dg
             |        FROM (SELECT u AS node FROM e0
             |              UNION ALL SELECT v FROM e0) GROUP BY 1),
             |o AS (SELECT
             |        CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND u < v)
             |             THEN u ELSE v END AS a,
             |        CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND u < v)
             |             THEN v ELSE u END AS b
             |      FROM e0 JOIN deg du ON du.node = u
             |              JOIN deg dv ON dv.node = v),
             |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
             |        FROM o e1 JOIN o e2 ON e1.b = e2.a
             |        JOIN o e3 ON e3.a = e1.a AND e3.b = e2.b),
             |n AS (SELECT unnest([x, y, z]) AS node FROM tri)
             |SELECT node, CAST(count(*) AS BIGINT) AS n_tri
             |FROM n GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- Count-Min sketch point estimates vs exact recount: width 64
    //      forces collisions over the 150 distinct user_ids, so the
    //      overestimate path is really exercised; probes 120-179 cover
    //      present AND absent values. All integers (q77's md5 hash
    //      family), full hash oracle despite being an approximate
    //      structure ----
    Entry("q85_count_min",
      (s, d) => Sketches.countMinEstimates(
          s.read.parquet(s"$d/events.parquet").select(col("user_id")),
          "user_id", probes = (120L to 179L).map(_.toString),
          depth = 4, width = 64)
        .orderBy("value"),
      Some("""WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS v FROM events
             |            WHERE user_id IS NOT NULL),
             |rws AS (SELECT v, j FROM ev, range(0, 4) t(j)),
             |regs AS (SELECT j,
             |          CAST('0x' || substr(md5(v || '#' || j), 1, 15) AS BIGINT)
             |            % 64 AS cell,
             |          count(*) AS cnt
             |        FROM rws GROUP BY 1, 2),
             |pr AS (SELECT CAST(p AS VARCHAR) AS value
             |       FROM range(120, 180) t(p)),
             |pc AS (SELECT value, j,
             |         CAST('0x' || substr(md5(value || '#' || j), 1, 15) AS BIGINT)
             |           % 64 AS cell
             |       FROM pr, range(0, 4) t2(j)),
             |est AS (SELECT value, CAST(min(coalesce(r.cnt, 0)) AS BIGINT) AS est
             |        FROM pc LEFT JOIN regs r USING (j, cell) GROUP BY 1),
             |ex AS (SELECT v AS value, count(*) AS exact_cnt FROM ev GROUP BY 1)
             |SELECT e.value, e.est,
             |       CAST(coalesce(x.exact_cnt, 0) AS BIGINT) AS exact_cnt
             |FROM est e LEFT JOIN ex x USING (value)
             |ORDER BY value""".stripMargin)),

    // ---- one-pass data profiling over lineitem: stack-melt (narrow),
    //      ONE (column, value) shuffle, column-sized rollup — vs one
    //      scan per column or an Expand per distinct-agg ----
    Entry("q93_profile",
      (s, d) => graft.pipeline.Profile.profile(
          s.read.parquet(s"$d/lineitem.parquet"),
          longCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
            "l_linenumber"),
          stringCols = Seq("l_returnflag", "l_linestatus"))
        .orderBy("column"),
      Some("""WITH m AS (
             |  SELECT 'l_orderkey' AS c, CAST(l_orderkey AS BIGINT) lv,
             |         CAST(NULL AS VARCHAR) sv FROM lineitem
             |  UNION ALL SELECT 'l_partkey', l_partkey, NULL FROM lineitem
             |  UNION ALL SELECT 'l_suppkey', l_suppkey, NULL FROM lineitem
             |  UNION ALL SELECT 'l_linenumber', l_linenumber, NULL FROM lineitem
             |  UNION ALL SELECT 'l_returnflag', NULL, l_returnflag FROM lineitem
             |  UNION ALL SELECT 'l_linestatus', NULL, l_linestatus FROM lineitem),
             |g AS (SELECT c, lv, sv, coalesce(sv, CAST(lv AS VARCHAR)) AS vk,
             |        count(*) AS cnt
             |      FROM m GROUP BY 1, 2, 3, 4)
             |SELECT c AS column, CAST(sum(cnt) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN vk IS NULL THEN cnt ELSE 0 END) AS BIGINT)
             |    AS n_null,
             |  CAST(count(vk) AS BIGINT) AS n_distinct,
             |  min(lv) AS min_long, max(lv) AS max_long,
             |  min(sv) AS min_str, max(sv) AS max_str
             |FROM g GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- multi-source BFS shortest paths on the q56 supplier↔customer
    //      bipartite graph: frontier expansion, each round touching only
    //      the frontier's out-edges + a visited-set anti join; oracle is
    //      a DuckDB recursive CTE taking min(dist) over walk levels ----
    Entry("q98_bfs_distances",
      (s, d) => {
        val li = s.read.parquet(s"$d/lineitem.parquet")
        val ord = s.read.parquet(s"$d/orders.parquet")
        val fwd = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey").cast("long").as("src"),
            (col("o_custkey").cast("long") + 1000000L).as("dst"))
        val edges = fwd.unionByName(
          fwd.select(col("dst").as("src"), col("src").as("dst")))
        graft.pipeline.Graph.bfsDistances(edges, Seq(1L, 2L), maxDepth = 6)
          .orderBy("node")
      },
      Some("""WITH RECURSIVE e AS (
             |  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
             |         CAST(o_custkey + 1000000 AS BIGINT) AS dst
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  UNION
             |  SELECT DISTINCT CAST(o_custkey + 1000000 AS BIGINT),
             |         CAST(l_suppkey AS BIGINT)
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |v AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
             |walk(node, dist) AS (
             |  SELECT node, 0 FROM v WHERE node IN (1, 2)
             |  UNION
             |  SELECT e.dst, walk.dist + 1 FROM walk
             |  JOIN e ON e.src = walk.node
             |  WHERE walk.dist < 6)
             |SELECT node, CAST(min(dist) AS BIGINT) AS dist
             |FROM walk GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- mergeable HDR quantile sketch: per-source n_chars percentiles
    //      from leading-(1+m)-bit buckets — pure integer (bit length via
    //      bin/printf('%b')), order-independent, q54's selection rule on
    //      register rows; answer = the chosen bucket's true min value ----
    Entry("q104_hdr_quantiles",
      (s, d) => Sketches.hdrQuantiles(
          docs(s, d).select(col("source"), col("n_chars")),
          Seq("source"), "n_chars", ps = Seq(50, 90, 99), m = 5)
        .orderBy("source", "p"),
      Some("""WITH v AS (SELECT source, n_chars AS v FROM documents
             |           WHERE n_chars IS NOT NULL AND n_chars >= 0),
             |bk AS (SELECT source, v,
             |         CASE WHEN v < 64 THEN v
             |              ELSE (length(printf('%b', v)) - 1 - 5) * 32
             |                   + (v // (1::BIGINT << (length(printf('%b', v)) - 1 - 5)))
             |         END AS b
             |       FROM v),
             |r AS (SELECT source, b, count(*) AS c, min(v) AS vmin
             |      FROM bk GROUP BY 1, 2),
             |cw AS (SELECT source, b, vmin,
             |         sum(c) OVER (PARTITION BY source ORDER BY b) AS cum,
             |         sum(c) OVER (PARTITION BY source) AS n
             |       FROM r),
             |q AS (SELECT cw.source, p.p, cw.vmin, cw.n,
             |        row_number() OVER (PARTITION BY cw.source, p.p
             |          ORDER BY cw.b) AS rn
             |      FROM cw, (VALUES (50), (90), (99)) p(p)
             |      WHERE cum * 100 >= n * p.p)
             |SELECT source, CAST(p AS BIGINT) AS p, vmin AS q_approx,
             |  CAST(n AS BIGINT) AS n
             |FROM q WHERE rn = 1 ORDER BY source, p""".stripMargin)),

    // ---- interval-overlap self-join over activity sessions: which
    //      sessions were live at the same time — Joins.overlapJoin's
    //      banded equi-join (1 h bands), never a nested loop; the oracle
    //      is the plain theta-join the banding provably equals ----
    Entry("q117_session_overlap",
      (s, d) => {
        val raw = s.read.parquet(s"$d/events.parquet")
        val base = raw.select(col("user_id"), Tables.tsNs(raw).as("time"))
        // pinCkpt: the session frame feeds BOTH overlap-join sides — one
        // checkpoint stops the sessionize window re-running per side and
        // un-serializes the band explode (1-partition AQE coalesce)
        val sess = Shared.pinCkpt(graft.pipeline.Sessionize.sessionize(
            base, "user_id", "time", gapNs = 300000000000L) // 5 min
          .withColumn("en", col("session_end") + 120000000000L), // +120 s pad
          col("user_id"))
        val a = sess.select(col("user_id").as("ua"),
          col("session_start").as("sa"), col("en").as("ea"))
        val b = sess.select(col("user_id").as("ub"),
          col("session_start").as("sb"), col("en").as("eb"))
        Joins.overlapJoin(a, "sa", "ea", b, "sb", "eb",
            band = 3600000000000L, // 1 h
            cond = col("ua") < col("ub") ||
              (col("ua") === col("ub") && col("sa") < col("sb")))
          .select(col("ua"), col("sa"), col("ub"), col("sb"),
            (least(col("ea"), col("eb")) -
              greatest(col("sa"), col("sb"))).as("overlap_ns"))
          .orderBy("ua", "sa", "ub", "sb")
      },
      Some("""WITH ev AS (SELECT user_id, epoch_us(ts)*1000 AS time FROM events),
             |m AS (SELECT *, CASE WHEN coalesce(lag(time) OVER (PARTITION BY user_id ORDER BY time),
             |                -9223372036854775808) < time - 300000000000 THEN 1 ELSE 0 END AS nw
             |      FROM ev),
             |sid AS (SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY time
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
             |        FROM m),
             |iv AS (SELECT user_id, min(time) AS st, max(time) + 120000000000 AS en
             |       FROM sid GROUP BY user_id, s)
             |SELECT a.user_id AS ua, a.st AS sa, b.user_id AS ub, b.st AS sb,
             |  least(a.en, b.en) - greatest(a.st, b.st) AS overlap_ns
             |FROM iv a JOIN iv b
             |  ON a.st <= b.en AND b.st <= a.en
             |  AND (a.user_id < b.user_id
             |       OR (a.user_id = b.user_id AND a.st < b.st))
             |ORDER BY 1, 2, 3, 4""".stripMargin)),

    // ---- dataset-to-dataset similarity: per-source k-MinHash sketches
    //      (the LSH tier's Carter-Wegman family) + the exact Jaccard the
    //      estimate is judged against, one row per source pair ----
    Entry("q124_source_similarity",
      (s, d) => Sketches.setSimilarityMatrix(docs(s, d), "source",
          TextOps.md5Long(col("text")), k = 32)
        .orderBy("key_a", "key_b"),
      Some {
        val coeffs = (0 until 32).map { i =>
          val (a, b) = Dedup.hashCoef(i); s"($i, ${a}, ${b})"
        }.mkString(", ")
        s"""WITH co(i, a, b) AS (VALUES $coeffs),
           |ds AS (SELECT DISTINCT source,
           |         CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS e
           |       FROM documents),
           |hx AS (SELECT source, e, e % 2147483647 AS hx FROM ds),
           |mh AS (SELECT source, i, min((hx * a + b) % 2147483647) AS m
           |       FROM hx, co GROUP BY 1, 2),
           |est AS (SELECT x.source AS key_a, y.source AS key_b,
           |          CAST(sum(CASE WHEN x.m = y.m THEN 1 ELSE 0 END) AS BIGINT) AS est_matches
           |        FROM mh x JOIN mh y ON x.i = y.i AND x.source < y.source
           |        GROUP BY 1, 2),
           |sz AS (SELECT source, count(*) AS n FROM ds GROUP BY 1),
           |it AS (SELECT a.source AS key_a, b.source AS key_b, count(*) AS inter
           |       FROM ds a JOIN ds b ON a.e = b.e AND a.source < b.source
           |       GROUP BY 1, 2)
           |SELECT est.key_a, est.key_b, est_matches, CAST(32 AS BIGINT) AS k,
           |  CAST(est_matches * 1000000 // 32 AS BIGINT) AS est_jaccard_e6,
           |  CAST(coalesce(inter, 0) AS BIGINT) AS inter,
           |  CAST(na.n + nb.n - coalesce(inter, 0) AS BIGINT) AS uni,
           |  CAST(coalesce(inter, 0) * 1000000
           |       // (na.n + nb.n - coalesce(inter, 0)) AS BIGINT) AS jaccard_e6
           |FROM est
           |LEFT JOIN it ON it.key_a = est.key_a AND it.key_b = est.key_b
           |JOIN sz na ON na.source = est.key_a
           |JOIN sz nb ON nb.source = est.key_b
           |ORDER BY 1, 2""".stripMargin
      }),

    // ---- cross-source quantile normalization: within-source rank →
    //      pooled inverse CDF at the per-mille grid, all exact
    //      integers; inverse-CDF table broadcast back ----
    Entry("q143_quantile_map",
      (s, d) => Profile.quantileMap(
          docs(s, d).select("doc_id", "source", "n_chars"),
          "n_chars", "source")
        .orderBy("doc_id"),
      Some("""WITH h AS (SELECT source, n_chars AS v, count(*) AS c
             |           FROM documents GROUP BY 1, 2),
             |r AS (SELECT source, v,
             |        sum(c) OVER (PARTITION BY source ORDER BY v) - c AS lt,
             |        sum(c) OVER (PARTITION BY source) AS n
             |      FROM h),
             |pc AS (SELECT d.doc_id, d.source, d.n_chars,
             |         CAST(CASE WHEN r.n <= 1 THEN 0
             |              ELSE (r.lt * 1000000) // (r.n - 1) END AS BIGINT)
             |           AS pct_e6
             |       FROM documents d
             |       JOIN r ON d.source = r.source AND d.n_chars = r.v),
             |ph AS (SELECT n_chars AS v, count(*) AS c
             |       FROM documents GROUP BY 1),
             |pcum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum,
             |           sum(c) OVER () AS n
             |         FROM ph),
             |gr AS (SELECT unnest(range(0, 1001)) AS g),
             |inv AS (SELECT g, CAST(min(v) AS BIGINT) AS mapped
             |        FROM pcum, gr WHERE cum * 1000 >= n * g GROUP BY 1)
             |SELECT pc.doc_id, pc.source, pc.n_chars, pc.pct_e6,
             |  CAST(pc.pct_e6 // 1000 AS BIGINT) AS pct_mille, inv.mapped
             |FROM pc JOIN inv ON inv.g = pc.pct_e6 // 1000
             |ORDER BY pc.doc_id""".stripMargin)),

    // ---- frequent 3-step event paths: two leads over ONE user-keyed
    //      window exchange, |types|³-bounded groupBy, TakeOrdered cut ----
    Entry("q146_frequent_paths",
      (s, d) => {
        val raw = s.read.parquet(s"$d/events.parquet")
        val f = raw.select(col("event_type").as("metric"),
          Tables.tsNs(raw).as("time"), col("user_id"), col("event_id"))
        graft.pipeline.Sessionize.frequentPaths(f, k = 20)
      },
      Some("""WITH ev AS (SELECT user_id, event_id, event_type,
             |              epoch_us(ts)*1000 AS t FROM events),
             |l AS (SELECT event_type AS e1,
             |        lead(event_type, 1) OVER (PARTITION BY user_id
             |          ORDER BY t, event_id) AS e2,
             |        lead(event_type, 2) OVER (PARTITION BY user_id
             |          ORDER BY t, event_id) AS e3
             |      FROM ev)
             |SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
             |FROM l WHERE e3 IS NOT NULL
             |GROUP BY 1, 2, 3
             |ORDER BY n DESC, e1, e2, e3 LIMIT 20""".stripMargin))
  )
}
