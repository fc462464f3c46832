package graft.registry

import graft.hta.{AggOps, Queries, Scoped, Series, Throttle}
import graft.model.{IntervalScope, Scope}
import graft.pipeline.{Ann, Cdc, Curate, Dedup, Eval, Joins, Multimodal, Packing, Profile, Sampling, Sketches, TextOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Shared._

/** Relational/OLAP surface: TPC-H shapes, rollups, pivots, CDC,
  * data-quality audits, join probes. */
private[registry] object RelationalEntries {
  val entries: Seq[Entry] = Seq(

    // ---- relational surface (SURVEY §2.7: engine-provided via Spark;
    //      exercised on the TPC-H-ish testdata; exact-integer aggregates) ----
    Entry("q25_tpch_pricing",
      (s, d) => {
        val li = s.read.parquet(s"$d/lineitem.parquet")
          .where(col("l_shipdate") <= lit("2024-06-30").cast("timestamp"))
        li.groupBy("l_returnflag", "l_linestatus").agg(
            sum(round(col("l_quantity"), 0).cast("long")).as("sum_qty"),
            sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("sum_base_cents"),
            sum(round(col("l_extendedprice") * 100, 0).cast("long") *
              (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))).as("sum_disc_e4"),
            count(lit(1)).as("cnt"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
             |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
             |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) *
             |       (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_e4,
             |  count(*) AS cnt
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '2024-06-30 00:00:00'
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Entry("q26_tpch_top_orders",
      (s, d) => {
        val cust = s.read.parquet(s"$d/customer.parquet")
          .where(col("c_mktsegment") === "BUILDING")
        val ord = s.read.parquet(s"$d/orders.parquet")
        val li = s.read.parquet(s"$d/lineitem.parquet")
        // broadcast the customer filter onto orders FIRST: only the
        // BUILDING-segment orders (~1/5) enter the fact-fact orderkey
        // shuffle — joining li⋈ord before filtering would shuffle the
        // full orders table and then discard 4/5 of it
        ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
          .join(li, li("l_orderkey") === ord("o_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long") *
            (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))).as("revenue_e4"))
          .orderBy(col("revenue_e4").desc, col("l_orderkey"))
          .limit(10)
          .select(col("l_orderkey"), col("revenue_e4"))
      },
      Some("""SELECT l_orderkey,
             |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) *
             |       (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_e4
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |GROUP BY l_orderkey, o_orderdate
             |ORDER BY revenue_e4 DESC, l_orderkey LIMIT 10""".stripMargin)),

    Entry("q27_region_acctbal",
      (s, d) => {
        val cust = s.read.parquet(s"$d/customer.parquet")
        val nat = s.read.parquet(s"$d/nation.parquet")
        val reg = s.read.parquet(s"$d/region.parquet")
        cust.join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
          .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_cust"),
            sum(round(col("c_acctbal") * 100, 0).cast("long")).as("acctbal_cents"))
          .orderBy("r_name")
      },
      Some("""SELECT r_name, count(*) AS n_cust,
             |  CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS acctbal_cents
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- as-of join + sessionization (SURVEY §2.7 natural extensions) ----
    Entry("q30_asof_join",
      (s, d) => {
        val raw = s.read.parquet(s"$d/events.parquet")
        val base = raw.select(
          col("user_id"), Tables.tsNs(raw).as("time"),
          col("value"), col("event_type"))
        Queries.asofJoin(
            base.where(col("event_type") === "click"),
            base.where(col("event_type") === "view"),
            keys = Seq("user_id"), valueName = "last_view_value")
          .orderBy("user_id", "time")
      },
      Some("""WITH ev AS (SELECT user_id, epoch_us(ts)*1000 AS time, value, event_type
             |            FROM events)
             |SELECT c.user_id, c.time, c.value, v.value AS last_view_value
             |FROM (SELECT * FROM ev WHERE event_type = 'click') c
             |ASOF LEFT JOIN (
             |  -- dedupe ties: max value per timestamp, matching the Spark
             |  -- side's deterministic (time, value) carry order
             |  SELECT user_id, time, max(value) AS value
             |  FROM ev WHERE event_type = 'view' GROUP BY 1, 2) v
             |  ON c.user_id = v.user_id AND v.time <= c.time
             |ORDER BY 1, 2""".stripMargin)),

    Entry("q31_sessionize",
      (s, d) => {
        val raw = s.read.parquet(s"$d/events.parquet")
        val base = raw.select(
          col("user_id"), Tables.tsNs(raw).as("time"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        graft.pipeline.Sessionize.sessionize(base, "user_id", "time",
            gapNs = 1800000000000L, // 30 min
            aggs = Seq(sum("cents").as("sum_cents")))
          .orderBy("user_id", "session_start")
      },
      Some("""WITH ev AS (SELECT user_id, epoch_us(ts)*1000 AS time,
             |              CAST(round(value*100) AS BIGINT) AS cents FROM events),
             |m AS (SELECT *, CASE WHEN coalesce(lag(time) OVER (PARTITION BY user_id ORDER BY time),
             |                -9223372036854775808) < time - 1800000000000 THEN 1 ELSE 0 END AS nw
             |      FROM ev),
             |sid AS (SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY time
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
             |        FROM m)
             |SELECT user_id, min(time) AS session_start, max(time) AS session_end,
             |  count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS sum_cents
             |FROM sid GROUP BY user_id, s ORDER BY 1, 2""".stripMargin)),

    // ---- OLAP hierarchy rollup (GROUPING SETS): revenue by
    //      region > nation > order-year with all three supertotal levels
    //      in one pass — Spark's rollup() lowers to a single Expand +
    //      partial-agg, so the 4 grouping levels cost ONE shuffle, not
    //      four scans. Exact cents; NULLS FIRST pinned in the oracle
    //      (DuckDB defaults NULLS LAST, Spark FIRST) ----
    Entry("q80_rollup_revenue",
      // spark.sql, not Dataset.rollup: the DSL path trips Spark's
      // DetectAmbiguousSelfJoin false positive (rollup's Expand duplicates
      // the grouping attrs; a later sort-by-name then sees two dataset-id-
      // tagged candidates). The SQL resolver carries no dataset-id
      // metadata, and the plan is the identical single Expand + one
      // partial-agg shuffle.
      (s, d) => s.sql(
        s"""WITH o AS (SELECT r_name, n_name,
           |    CAST(year(o_orderdate) AS BIGINT) AS oyear,
           |    CAST(round(o_totalprice*100) AS BIGINT) AS cents
           |  FROM parquet.`$d/orders.parquet`
           |  JOIN parquet.`$d/customer.parquet` ON o_custkey = c_custkey
           |  JOIN parquet.`$d/nation.parquet` ON c_nationkey = n_nationkey
           |  JOIN parquet.`$d/region.parquet` ON n_regionkey = r_regionkey)
           |SELECT r_name, n_name, oyear, sum(cents) AS rev_cents,
           |  count(*) AS n_orders
           |FROM o GROUP BY ROLLUP (r_name, n_name, oyear)
           |ORDER BY r_name, n_name, oyear""".stripMargin),
      Some("""WITH o AS (SELECT r_name, n_name,
             |    CAST(year(o_orderdate) AS BIGINT) AS oyear,
             |    CAST(round(o_totalprice*100) AS BIGINT) AS cents
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey)
             |SELECT r_name, n_name, oyear,
             |  CAST(sum(cents) AS BIGINT) AS rev_cents,
             |  count(*) AS n_orders
             |FROM o GROUP BY ROLLUP (r_name, n_name, oyear)
             |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST,
             |  oyear NULLS FIRST""".stripMargin)),

    // ---- salted skew join: events (≈5 metrics over the whole corpus —
    //      maximal key skew) joined to a per-metric dim through
    //      Joins.saltedJoin, which splits each hot key across 8 reducer
    //      partitions by an event_id-hashed salt. The result relation is
    //      exactly the plain join, so the oracle is the unsalted SQL ----
    Entry("q81_salted_join",
      (s, d) => {
        val e = ev(s, d).select("metric", "time", "cents", "event_id")
        val dim = e.groupBy("metric")
          .agg(sum("cents").as("metric_sum_cents"),
            count(lit(1)).as("metric_cnt"))
        graft.pipeline.Joins.saltedJoin(e, dim, Seq("metric"),
            salts = 8, saltBy = col("event_id"))
          .orderBy("metric", "time", "event_id")
      },
      Some(s"""WITH $ptsCte,
              |dim AS (SELECT metric, CAST(sum(cents) AS BIGINT) AS metric_sum_cents,
              |          count(*) AS metric_cnt
              |        FROM pts GROUP BY 1)
              |SELECT p.metric, p.time, p.cents, p.event_id,
              |       d.metric_sum_cents, d.metric_cnt
              |FROM pts p JOIN dim d USING (metric)
              |ORDER BY 1, 2, 4""".stripMargin)),

    // ---- semi-structured extraction: the events.props JSON column,
    //      schema-on-read via get_json_object (Jackson path eval inside
    //      codegen — a narrow projection, no UDF), aggregated exactly.
    //      DuckDB's json_extract is the oracle's parser ----
    Entry("q86_json_props",
      (s, d) => {
        val raw = s.read.parquet(s"$d/events.parquet")
        raw.select(col("event_type").as("metric"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy("metric", "k").agg(count(lit(1)).as("n"))
          .orderBy("metric", "k")
      },
      Some("""SELECT event_type AS metric,
             |  CAST(json_extract(props, '$.k') AS BIGINT) AS k,
             |  count(*) AS n
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- pivot to wide form: per-metric bucket counts as COLUMNS.
    //      Spark's pivot with an explicit value list lowers to one
    //      conditional partial agg (no extra distinct job, one shuffle);
    //      the oracle writes the lowering out as CASE sums ----
    Entry("q87_pivot_props",
      (s, d) => {
        val raw = s.read.parquet(s"$d/events.parquet")
        val base = raw.select(col("event_type").as("metric"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .withColumn("kb", expr("k div 25"))
        val piv = base.groupBy("metric")
          .pivot("kb", Seq(0L, 1L, 2L, 3L)).agg(count(lit(1)))
          .select(col("metric"), col("0").as("b0"), col("1").as("b1"),
            col("2").as("b2"), col("3").as("b3"))
        val tot = base.groupBy("metric")
          .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
        piv.join(tot, "metric").orderBy("metric")
      },
      Some("""WITH b AS (SELECT event_type AS metric,
             |    CAST(json_extract(props, '$.k') AS BIGINT) AS k,
             |    CAST(json_extract(props, '$.k') AS BIGINT) // 25 AS kb
             |  FROM events)
             |SELECT metric,
             |  CAST(sum(CASE WHEN kb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b0,
             |  CAST(sum(CASE WHEN kb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b1,
             |  CAST(sum(CASE WHEN kb = 2 THEN 1 ELSE 0 END) AS BIGINT) AS b2,
             |  CAST(sum(CASE WHEN kb = 3 THEN 1 ELSE 0 END) AS BIGINT) AS b3,
             |  count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
             |FROM b GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- CDC latest-record compaction: one surviving event per user via
    //      max_by(payload, (time, event_id)) — an ordinary aggregate, so
    //      the exchange carries one map-side candidate per (key, task)
    //      instead of the whole changelog a row_number window would sort ----
    Entry("q94_cdc_latest",
      (s, d) => {
        val raw = s.read.parquet(s"$d/events.parquet")
        val f = raw.select(col("user_id"), col("event_id"),
          Tables.tsNs(raw).as("time"), col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        graft.pipeline.Cdc.latestByKey(f, Seq("user_id"),
            Seq("time", "event_id"))
          .orderBy("user_id")
      },
      Some("""WITH ev AS (SELECT user_id, event_id, epoch_us(ts)*1000 AS time,
             |              event_type, CAST(round(value*100) AS BIGINT) AS cents
             |            FROM events),
             |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
             |        ORDER BY time DESC, event_id DESC) AS rn FROM ev)
             |SELECT user_id, event_id, time, event_type, cents
             |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // ---- SCD type-2 history: each change row becomes a [valid_from,
    //      valid_to) interval, NULL-open on the current row; one per-key
    //      lead window, partition width = one user's history ----
    Entry("q95_scd2",
      (s, d) => {
        val raw = s.read.parquet(s"$d/events.parquet")
        val f = raw.select(col("user_id"), col("event_id"),
          Tables.tsNs(raw).as("time"), col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        graft.pipeline.Cdc.scd2(f, Seq("user_id"), Seq("time", "event_id"),
            validFrom = "time")
          .orderBy("user_id", "time", "event_id")
      },
      Some("""WITH ev AS (SELECT user_id, event_id, epoch_us(ts)*1000 AS time,
             |              event_type, CAST(round(value*100) AS BIGINT) AS cents
             |            FROM events)
             |SELECT user_id, event_id, time, event_type, cents,
             |  time AS valid_from,
             |  lead(time) OVER (PARTITION BY user_id
             |    ORDER BY time, event_id) AS valid_to,
             |  lead(time) OVER (PARTITION BY user_id
             |    ORDER BY time, event_id) IS NULL AS is_current
             |FROM ev ORDER BY user_id, time, event_id""".stripMargin)),

    // ---- skew-safe per-group top-k: local top-k per (key, salt) shard,
    //      then a global settle over k·salts survivors — the second
    //      exchange is bounded by the ANSWER size, not the group size;
    //      result equals the textbook single window (the oracle) ----
    Entry("q103_per_source_topk",
      (s, d) => graft.pipeline.TopK.perKeyTopK(
          docs(s, d).select("doc_id", "source", "n_chars"),
          Seq("source"), Seq(desc("n_chars"), asc("doc_id")), k = 5,
          saltBy = col("doc_id"))
        .orderBy("source", "rnk"),
      Some("""WITH r AS (SELECT doc_id, source, n_chars,
             |  CAST(row_number() OVER (PARTITION BY source
             |    ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rnk
             |FROM documents)
             |SELECT doc_id, source, n_chars, rnk FROM r WHERE rnk <= 5
             |ORDER BY source, rnk""".stripMargin)),

    // ---- snapshot diff: the second snapshot is derived deterministically
    //      (q97's pattern) — drops every 17th event, bumps cents on every
    //      13th — so added/removed/changed/same classes all occur ----
    Entry("q108_snapshot_diff",
      (s, d) => {
        val raw = s.read.parquet(s"$d/events.parquet")
        val ev = raw.select(col("event_id"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        val neu = ev.where(pmod(col("event_id"), lit(17)) =!= 0)
          .withColumn("cents",
            when(pmod(col("event_id"), lit(13)) === 0, col("cents") + 1)
              .otherwise(col("cents")))
        graft.pipeline.Cdc.snapshotDiff(ev, neu, Seq("event_id"), "cents")
          .orderBy("event_id")
      },
      Some("""WITH ev AS (SELECT event_id,
             |              CAST(round(value*100) AS BIGINT) AS cents
             |            FROM events),
             |neu AS (SELECT event_id,
             |          CASE WHEN event_id % 13 = 0 THEN cents + 1
             |               ELSE cents END AS cents
             |        FROM ev WHERE event_id % 17 != 0)
             |SELECT coalesce(o.event_id, n.event_id) AS event_id,
             |  o.cents AS old_cents, n.cents AS new_cents,
             |  CASE WHEN o.event_id IS NULL THEN 'added'
             |       WHEN n.event_id IS NULL THEN 'removed'
             |       WHEN o.cents IS NOT DISTINCT FROM n.cents THEN 'same'
             |       ELSE 'changed' END AS status
             |FROM ev o FULL OUTER JOIN neu n ON o.event_id = n.event_id
             |ORDER BY 1""".stripMargin)),

    // ---- market-basket affinity: q105's exact-integer lift on the
    //      (order, part) bipartite frame — pairs within a basket via an
    //      orderkey self-join (quadratic only in basket width), part
    //      frequencies joined back, TakeOrdered cut ----
    Entry("q109_basket_lift",
      (s, d) => {
        val b = s.read.parquet(s"$d/lineitem.parquet")
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val pairs = b.select(col("l_orderkey"), col("l_partkey").as("pa"))
          .join(b.select(col("l_orderkey"), col("l_partkey").as("pb")),
            "l_orderkey")
          .where(col("pa") < col("pb"))
          .groupBy("pa", "pb").agg(count(lit(1)).as("c_xy"))
          .where(col("c_xy") >= 3)
        val pc = b.groupBy("l_partkey").agg(count(lit(1)).as("c"))
        val n = b.select("l_orderkey").distinct()
          .agg(count(lit(1)).as("n_ord"))
        pairs
          .join(pc.select(col("l_partkey").as("pa"), col("c").as("c_a")), "pa")
          .join(pc.select(col("l_partkey").as("pb"), col("c").as("c_b")), "pb")
          .crossJoin(broadcast(n))
          .withColumn("lift_e6", expr("(c_xy * n_ord * 1000000) div (c_a * c_b)"))
          .orderBy(desc("lift_e6"), asc("pa"), asc("pb")).limit(50)
          .select("pa", "pb", "c_xy", "c_a", "c_b", "lift_e6")
      },
      Some("""WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |p AS (SELECT a.l_partkey AS pa, b2.l_partkey AS pb,
             |        count(*) AS c_xy
             |      FROM b a JOIN b b2 ON a.l_orderkey = b2.l_orderkey
             |        AND a.l_partkey < b2.l_partkey
             |      GROUP BY 1, 2 HAVING count(*) >= 3),
             |pc AS (SELECT l_partkey, count(*) AS c FROM b GROUP BY 1),
             |n AS (SELECT count(DISTINCT l_orderkey) AS n_ord FROM b)
             |SELECT pa, pb, c_xy, x.c AS c_a, y.c AS c_b,
             |  CAST((c_xy * n.n_ord * 1000000) // (x.c * y.c) AS BIGINT) AS lift_e6
             |FROM p JOIN pc x ON p.pa = x.l_partkey
             |       JOIN pc y ON p.pb = y.l_partkey, n
             |ORDER BY lift_e6 DESC, pa, pb LIMIT 50""".stripMargin)),

    // ---- TPC-H Q5 shape: local-supplier volume per nation in one region
    //      and year — the multi-dim star join with every dim broadcast and
    //      the fact-fact join shuffling once on orderkey; exact cents·e4 ----
    Entry("q110_local_volume",
      (s, d) => {
        val li = s.read.parquet(s"$d/lineitem.parquet")
        val ord = s.read.parquet(s"$d/orders.parquet")
          .where(year(col("o_orderdate")) === 1997)
        val cust = s.read.parquet(s"$d/customer.parquet")
        val supp = s.read.parquet(s"$d/supplier.parquet")
        val nat = s.read.parquet(s"$d/nation.parquet")
        val reg = s.read.parquet(s"$d/region.parquet")
          .where(col("r_name") === "ASIA")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .where(col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long") *
            (lit(100L) - round(col("l_discount") * 100, 0).cast("long")))
            .as("revenue_e4"),
            count(lit(1)).as("cnt"))
          .orderBy(desc("revenue_e4"), asc("n_name"))
      },
      Some("""SELECT n_name,
             |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) *
             |       (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
             |    AS revenue_e4,
             |  count(*) AS cnt
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE year(o_orderdate) = 1997
             |  AND c_nationkey = s_nationkey
             |  AND r_name = 'ASIA'
             |GROUP BY 1 ORDER BY revenue_e4 DESC, n_name""".stripMargin)),

    // ---- crosstab: per-source language mix as a pivoted count grid —
    //      Spark's pivot plans ONE aggregate with a when-chain per pivot
    //      value (no per-language scan); empty cells filled 0 to match
    //      the oracle's FILTER counts ----
    Entry("q118_lang_pivot",
      (s, d) => docs(s, d).groupBy("source")
        .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("de", "en", "es", "fr", "zh"))
        .orderBy("source"),
      Some("""SELECT source,
             |  count(*) FILTER (WHERE lang = 'de') AS de,
             |  count(*) FILTER (WHERE lang = 'en') AS en,
             |  count(*) FILTER (WHERE lang = 'es') AS es,
             |  count(*) FILTER (WHERE lang = 'fr') AS fr,
             |  count(*) FILTER (WHERE lang = 'zh') AS zh
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- grouping sets: the pricing rollup at every granularity in ONE
    //      pass (Spark expands grouping sets map-side; no re-scan per
    //      level) — exact cents, NULL group markers ordered FIRST on
    //      both engines ----
    Entry("q119_pricing_rollup",
      (s, d) => s.read.parquet(s"$d/lineitem.parquet")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          sum(round(col("l_quantity"), 0).cast("long")).as("sum_qty"),
          sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("sum_cents"),
          count(lit(1)).as("cnt"))
        .orderBy(asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
             |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_cents,
             |  count(*) AS cnt
             |FROM lineitem
             |GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin)),

    // ---- declarative data-quality validation: range/null row checks in
    //      ONE lineitem scan + PK-uniqueness + FK-containment aggregates,
    //      unioned into one report (the dbt-test / expectations pattern;
    //      NULL check verdicts count as failures) ----
    Entry("q127_data_checks",
      (s, d) => {
        val li = s.read.parquet(s"$d/lineitem.parquet")
        val o = s.read.parquet(s"$d/orders.parquet")
        val c = s.read.parquet(s"$d/customer.parquet")
        val rowChecks = Profile.validate(li, Seq(
          "li_discount_range" ->
            (col("l_discount") >= 0.0 && col("l_discount") <= 0.1),
          "li_quantity_range" ->
            (col("l_quantity") >= 1.0 && col("l_quantity") <= 30.0),
          "li_shipdate_not_null" -> col("l_shipdate").isNotNull))
        rowChecks
          .unionByName(Profile.checkUnique(o, "orders_pk_unique",
            Seq("o_orderkey")))
          .unionByName(Profile.checkSubset(o, "o_custkey", c, "c_custkey",
            "orders_custkey_fk"))
          .unionByName(Profile.checkSubset(li, "l_orderkey", o, "o_orderkey",
            "lineitem_orderkey_fk"))
          .orderBy("check_name")
      },
      Some("""WITH r AS (
             |  SELECT 'li_discount_range' AS check_name, count(*) AS n_rows,
             |    sum(CASE WHEN coalesce(l_discount >= 0 AND l_discount <= 0.1, false)
             |        THEN 0 ELSE 1 END) AS n_fail
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'li_quantity_range', count(*),
             |    sum(CASE WHEN coalesce(l_quantity >= 1 AND l_quantity <= 30, false)
             |        THEN 0 ELSE 1 END)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'li_shipdate_not_null', count(*),
             |    sum(CASE WHEN l_shipdate IS NOT NULL THEN 0 ELSE 1 END)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'orders_pk_unique', sum(c),
             |    sum(c) - count(*)
             |  FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
             |  UNION ALL
             |  SELECT 'orders_custkey_fk',
             |    (SELECT count(*) FROM orders),
             |    (SELECT count(*) FROM orders o
             |     LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
             |       ON o.o_custkey = c.c_custkey
             |     WHERE c.c_custkey IS NULL)
             |  UNION ALL
             |  SELECT 'lineitem_orderkey_fk',
             |    (SELECT count(*) FROM lineitem),
             |    (SELECT count(*) FROM lineitem l
             |     LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
             |       ON l.l_orderkey = o.o_orderkey
             |     WHERE o.o_orderkey IS NULL))
             |SELECT check_name, CAST(n_rows AS BIGINT) AS n_rows,
             |  CAST(n_fail AS BIGINT) AS n_fail, n_fail = 0 AS pass
             |FROM r ORDER BY check_name""".stripMargin)),

    // ---- pre-join output-size probe: exact per-key pair counts from
    //      per-key aggregates (the join never runs) — the skew
    //      diagnostic and salt-factor input for q81's salted join ----
    Entry("q132_join_probe",
      (s, d) => {
        val e = s.read.parquet(s"$d/events.parquet")
        Joins.joinSizeProbe(e, e, "user_id", k = 20)
      },
      Some("""WITH l AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_left
             |           FROM events GROUP BY 1),
             |r AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_right
             |      FROM events GROUP BY 1)
             |SELECT user_id, n_left, n_right,
             |  CAST(n_left * n_right AS BIGINT) AS n_pairs
             |FROM l JOIN r USING (user_id)
             |ORDER BY n_pairs DESC, user_id LIMIT 20""".stripMargin)),

    // ---- functional-dependency audit: one keyed partial-agg per
    //      dependency, report rows in the q127 validation shape ----
    Entry("q136_fd_check",
      (s, d) => {
        val nation = s.read.parquet(s"$d/nation.parquet")
        val e = s.read.parquet(s"$d/events.parquet")
        Profile.checkFunctionalDep(nation, Seq("n_nationkey"),
            "n_regionkey", "nation_region_fd")
          .unionByName(Profile.checkFunctionalDep(e, Seq("user_id"),
            "event_type", "user_event_type_fd"))
          .orderBy("check_name")
      },
      Some("""WITH f1 AS (SELECT count(DISTINCT n_regionkey) AS dc
             |            FROM nation GROUP BY n_nationkey),
             |f2 AS (SELECT count(DISTINCT event_type) AS dc
             |       FROM events GROUP BY user_id),
             |r AS (
             |  SELECT 'nation_region_fd' AS check_name,
             |    count(*) AS n_rows,
             |    sum(CASE WHEN dc > 1 THEN 1 ELSE 0 END) AS n_fail
             |  FROM f1
             |  UNION ALL
             |  SELECT 'user_event_type_fd', count(*),
             |    sum(CASE WHEN dc > 1 THEN 1 ELSE 0 END)
             |  FROM f2)
             |SELECT check_name, CAST(n_rows AS BIGINT) AS n_rows,
             |  CAST(n_fail AS BIGINT) AS n_fail, n_fail = 0 AS pass
             |FROM r ORDER BY check_name""".stripMargin)),

    // ---- leakage-safe train/test split: the split key is the CONTENT
    //      fingerprint (q23), not the doc id — byte-identical documents
    //      (and their 8-gram winnowing near-twins) can never straddle
    //      the split boundary and leak eval into train ----
    Entry("q139_leak_safe_split",
      (s, d) => Sampling.hashSplit(
          TextOps.minFingerprint(docs(s, d), w = 8), "fingerprint",
          weights = Seq(0.9, 0.1), labels = Seq("train", "test"),
          salt = "lk1")
        .orderBy("doc_id"),
      Some {
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
           |      FROM h),
           |fp AS (SELECT doc_id,
           |         CASE WHEN gs IS NOT NULL THEN list_min(gs)
           |              ELSE CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) END
           |           AS fingerprint
           |       FROM g)
           |SELECT doc_id, fingerprint,
           |  CASE WHEN CAST('0x' ||
           |         substr(md5(CAST(fingerprint AS VARCHAR) || 'lk1'), 1, 15)
           |         AS BIGINT) % 1000000 < 900000
           |       THEN 'train' ELSE 'test' END AS split
           |FROM fp ORDER BY doc_id""".stripMargin
      }),

    // ---- deletion-propagation audit: subject keys broadcast, FK
    //      cascade via impactedKeys, one report row per table — the
    //      pre-delete evidence trail ----
    Entry("q140_deletion_audit",
      (s, d) => {
        val cust = s.read.parquet(s"$d/customer.parquet")
        val ord = s.read.parquet(s"$d/orders.parquet")
        val li = s.read.parquet(s"$d/lineitem.parquet")
        val subjects = cust.where(pmod(col("c_custkey"), lit(97L)) === 0L)
          .select("c_custkey")
        val deadOrders = Cdc.impactedKeys(ord, "o_custkey",
          subjects.withColumnRenamed("c_custkey", "o_custkey"), "o_orderkey")
        Cdc.deletionImpact(cust, "c_custkey", subjects, "customer")
          .unionByName(Cdc.deletionImpact(ord, "o_custkey",
            subjects, "orders"))
          .unionByName(Cdc.deletionImpact(li, "l_orderkey",
            deadOrders, "lineitem"))
          .orderBy("table_name")
      },
      Some("""WITH subj AS (SELECT c_custkey AS k FROM customer
             |              WHERE c_custkey % 97 = 0),
             |dead_o AS (SELECT DISTINCT o_orderkey FROM orders
             |           WHERE o_custkey IN (SELECT k FROM subj)),
             |r AS (
             |  SELECT 'customer' AS table_name, count(*) AS n_rows,
             |    sum(CASE WHEN c_custkey IN (SELECT k FROM subj)
             |        THEN 1 ELSE 0 END) AS n_delete
             |  FROM customer
             |  UNION ALL
             |  SELECT 'orders', count(*),
             |    sum(CASE WHEN o_custkey IN (SELECT k FROM subj)
             |        THEN 1 ELSE 0 END)
             |  FROM orders
             |  UNION ALL
             |  SELECT 'lineitem', count(*),
             |    sum(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM dead_o)
             |        THEN 1 ELSE 0 END)
             |  FROM lineitem)
             |SELECT table_name, CAST(n_rows AS BIGINT) AS n_rows,
             |  CAST(n_delete AS BIGINT) AS n_delete
             |FROM r ORDER BY table_name""".stripMargin)),

    // ---- partition-balance forecast: per-partition counts of the
    //      md5-bucket layout BEFORE any write — q132's sibling for
    //      layout (vs join) skew ----
    Entry("q144_partition_balance",
      (s, d) => Joins.partitionBalance(
          s.read.parquet(s"$d/events.parquet"), "user_id", nParts = 32)
        .orderBy("part"),
      Some("""WITH p AS (SELECT CAST('0x' ||
             |          substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT)
             |          % 32 AS part
             |        FROM events),
             |c AS (SELECT part, CAST(count(*) AS BIGINT) AS n_rows
             |      FROM p GROUP BY 1),
             |t AS (SELECT sum(n_rows) AS t FROM c)
             |SELECT part, n_rows,
             |  CAST((n_rows * 32 * 1000000) // t.t AS BIGINT) AS skew_e6
             |FROM c, t ORDER BY part""".stripMargin)),

    // ---- TPC-H Q22 shape: customers above their segment's positive-
    //      balance average (scalar-subquery-as-broadcast-join, exact by
    //      integer cross-multiply — no avg division) with NO urgent
    //      orders (anti join; the priority filter pushes into the scan
    //      before the anti join builds). The semi/anti relational
    //      surface. ----
    Entry("q165_antijoin_balance",
      (s, d) => {
        val c = s.read.parquet(s"$d/customer.parquet")
          .withColumn("bal_cents",
            round(col("c_acctbal") * 100, 0).cast("long"))
        val o = s.read.parquet(s"$d/orders.parquet")
        val seg = c.where(col("bal_cents") > 0L)
          .groupBy("c_mktsegment")
          .agg(sum("bal_cents").as("_s"), count(lit(1)).as("_n"))
        c.join(broadcast(seg), Seq("c_mktsegment"))
          .where(col("bal_cents") * col("_n") > col("_s"))
          .join(o.where(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_cust"),
            sum("bal_cents").as("sum_bal_cents"))
          .orderBy("c_mktsegment")
      },
      Some("""WITH c AS (SELECT c_custkey, c_mktsegment,
             |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
             |  FROM customer),
             |seg AS (SELECT c_mktsegment, CAST(sum(bal_cents) AS BIGINT) AS s,
             |          CAST(count(*) AS BIGINT) AS n
             |        FROM c WHERE bal_cents > 0 GROUP BY 1)
             |SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust,
             |  CAST(sum(bal_cents) AS BIGINT) AS sum_bal_cents
             |FROM c JOIN seg ON c.c_mktsegment = seg.c_mktsegment
             |WHERE bal_cents * n > s
             |  AND NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey
             |                    AND o.o_orderpriority = '1-URGENT')
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- TPC-H Q13 shape: customer order-count distribution through a
    //      LEFT OUTER join (zero-order customers must appear at
    //      c_count = 0 — count(o_orderkey) ignores the null-extended
    //      rows), non-urgent orders only. The outer-aggregate
    //      relational shape q165's anti join doesn't cover ----
    Entry("q173_order_distribution",
      (s, d) => {
        val c = s.read.parquet(s"$d/customer.parquet")
        val o = s.read.parquet(s"$d/orders.parquet")
          .where(col("o_orderpriority") =!= "1-URGENT")
        c.join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count").agg(count(lit(1)).as("n_cust"))
          .orderBy(desc("n_cust"), desc("c_count"))
      },
      Some("""WITH oc AS (SELECT c_custkey,
             |    CAST(count(o_orderkey) AS BIGINT) AS c_count
             |  FROM customer LEFT JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             |  GROUP BY 1)
             |SELECT c_count, CAST(count(*) AS BIGINT) AS n_cust
             |FROM oc GROUP BY 1
             |ORDER BY n_cust DESC, c_count DESC""".stripMargin)),

    // ---- TPC-H Q4 shape: per-priority count of orders with at least
    //      one lineitem shipped > 60 days after the order date — the
    //      EXISTS/left-semi relational shape with a non-equi residual
    //      on the join condition ----
    Entry("q177_late_ship_priority",
      (s, d) => {
        val o = s.read.parquet(s"$d/orders.parquet")
        val l = s.read.parquet(s"$d/lineitem.parquet")
        o.join(l,
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") >
                col("o_orderdate") + expr("INTERVAL 60 DAYS"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_orders"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
             |FROM orders o
             |WHERE EXISTS (SELECT 1 FROM lineitem l
             |  WHERE l.l_orderkey = o.o_orderkey
             |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- TPC-H Q17 shape: small-quantity revenue per brand — rows
    //      below 20% of their PART's average quantity (the correlated
    //      scalar-aggregate subquery class), decided by the exact
    //      integer cross-multiply qty·5·cnt < sum (no avg division).
    //      One partkey partial agg + the co-keyed fact self-join; the
    //      part dim broadcast ----
    Entry("q178_small_qty_revenue",
      (s, d) => {
        val l = s.read.parquet(s"$d/lineitem.parquet")
          .select(col("l_partkey"),
            col("l_quantity").cast("long").as("qty"),
            round(col("l_extendedprice") * 100, 0).cast("long")
              .as("price_cents"))
        val pq = l.groupBy("l_partkey")
          .agg(sum("qty").as("_s"), count(lit(1)).as("_c"))
        val p = s.read.parquet(s"$d/part.parquet")
          .select(col("p_partkey").as("l_partkey"), col("p_brand"))
        l.join(pq, "l_partkey")
          .where(col("qty") * 5 * col("_c") < col("_s"))
          .join(broadcast(p), "l_partkey")
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_rows"),
            sum("price_cents").as("revenue_cents"))
          .orderBy("p_brand")
      },
      Some("""WITH l AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
             |  FROM lineitem),
             |pq AS (SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS s,
             |         CAST(count(*) AS BIGINT) AS c
             |       FROM l GROUP BY 1)
             |SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(l.price_cents) AS BIGINT) AS revenue_cents
             |FROM l JOIN pq USING (l_partkey)
             |  JOIN part p ON p.p_partkey = l.l_partkey
             |WHERE l.qty * 5 * pq.c < pq.s
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- TPC-H Q18 shape: large-volume orders — HAVING-filtered fact
    //      aggregate joined back through orders to the broadcast
    //      customer dim, TakeOrdered cut (never a global sort) ----
    Entry("q179_large_volume_orders",
      (s, d) => {
        val l = s.read.parquet(s"$d/lineitem.parquet")
          .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
        val oq = l.groupBy("l_orderkey")
          .agg(sum("qty").as("total_qty"))
          .where(col("total_qty") > 250L)
        val o = s.read.parquet(s"$d/orders.parquet")
          .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"),
            round(col("o_totalprice") * 100, 0).cast("long")
              .as("price_cents"))
        val c = s.read.parquet(s"$d/customer.parquet")
          .select(col("c_custkey").as("o_custkey"), col("c_name"))
        oq.join(o, "l_orderkey").join(broadcast(c), "o_custkey")
          .select(col("c_name"), col("o_custkey"),
            col("l_orderkey").as("orderkey"), col("total_qty"),
            col("price_cents"))
          .orderBy(desc("total_qty"), asc("orderkey")).limit(100)
      },
      Some("""WITH oq AS (SELECT l_orderkey,
             |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
             |  FROM lineitem GROUP BY 1 HAVING total_qty > 250)
             |SELECT c.c_name, o.o_custkey, o.o_orderkey AS orderkey,
             |  oq.total_qty,
             |  CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_cents
             |FROM oq JOIN orders o ON o.o_orderkey = oq.l_orderkey
             |  JOIN customer c ON c.c_custkey = o.o_custkey
             |ORDER BY total_qty DESC, orderkey LIMIT 100""".stripMargin))
  )
}
