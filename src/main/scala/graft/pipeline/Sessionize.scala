package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive rows of one key belong to the same
  * session while the time gap between them is <= `gapNs`; a strictly larger
  * gap starts a new session.
  *
  * One shuffle (by key): a lag-based new-session flag, a running sum to
  * assign session ids, then the per-session aggregate — the classic
  * gaps-and-islands plan. The windows partition by the session key (user,
  * device, …), whose cardinality scales with the data, so no partition
  * grows with total volume — this is NOT the whole-metric window pattern
  * banned in the HTA hot paths.
  */
object Sessionize {

  /** Helper-column name guaranteed absent from `taken` — public library
    * API, so a caller's own `_new`/`_sid` column must never be clobbered.
    * Case-insensitive: Spark resolves column names case-insensitively by
    * default, so a caller's `_New` would collide with `_new` too. */
  private[pipeline] def freshName(base: String, taken: Seq[String]): String = {
    val t = taken.map(_.toLowerCase)
    Iterator.from(0)
      .map(i => if (i == 0) base else s"$base$i")
      .find(n => !t.contains(n.toLowerCase)).get
  }

  /** Tag each row with its session ordinal per key (1-based within key,
    * ordered by time — the first row always opens session 1). */
  def withSessionId(df: DataFrame, key: String, time: String, gapNs: Long,
                    idCol: String = "session_id"): DataFrame = {
    val flag = freshName("_new", df.columns.toSeq :+ idCol)
    val w = Window.partitionBy(key).orderBy(time)
    df.withColumn(flag,
        when(coalesce(lag(col(time), 1).over(w), lit(Long.MinValue))
          < col(time) - gapNs, 1L).otherwise(0L))
      .withColumn(idCol, sum(flag).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop(flag)
  }

  /** STREAMING sessionization: one row per CLOSED session, emitted once the
    * event-time watermark passes the session's end + gap — Spark's native
    * `session_window` state store does the merging, so state is bounded by
    * open sessions inside the watermark horizon, never total history.
    *
    * `time` must be a timestamp column; `gap`/`delay` are duration strings.
    * Boundary semantics vs batch [[sessionize]]: the batch rule keeps a gap
    * EQUAL to gapNs in one session (`<=`), while `session_window`'s
    * half-open interval starts a new session at exactly `gap` — on
    * microsecond-precision data, `gap = gapNs + 1 microsecond` makes the
    * tiers agree exactly (pinned by SessionizeSpec). */
  def streamingSessionize(df: DataFrame, key: String, time: String,
                          gap: String, delay: String,
                          aggs: Seq[Column] = Nil): DataFrame = {
    val all = Seq(
      min(col(time)).as("session_start"),
      max(col(time)).as("session_end"),
      count(lit(1)).as("n_events")) ++ aggs
    df.withWatermark(time, delay)
      .groupBy(col(key), session_window(col(time), gap))
      .agg(all.head, all.tail: _*)
      .drop("session_window")
  }

  /** One row per session: (key, session_start, session_end, n_events,
    * custom aggregates…). */
  def sessionize(df: DataFrame, key: String, time: String, gapNs: Long,
                 aggs: Seq[Column] = Nil): DataFrame = {
    val all = Seq(
      min(col(time)).as("session_start"),
      max(col(time)).as("session_end"),
      count(lit(1)).as("n_events")) ++ aggs
    val sid = freshName("_sid", df.columns.toSeq)
    withSessionId(df, key, time, gapNs, sid)
      .groupBy(col(key), col(sid))
      .agg(all.head, all.tail: _*)
      .drop(sid)
  }

  /** Ordered funnel: how many users complete each prefix of `steps`, where
    * completing step i means an event of type steps(i) STRICTLY after the
    * user's completion time of step i-1 (earliest-completion semantics: the
    * reach time of a step is the minimum valid event time, which maximizes
    * who can reach later steps — the standard funnel definition). Returns
    * one row per step: (step 1-based, event_type, n_users), monotone
    * non-increasing in n_users.
    *
    * Shape at scale: one pass per step over the TYPE-FILTERED event slice
    * (the `metric = steps(i)` filter pushes to the scan; each slice is a
    * fraction of the corpus), joined to the previous reach frame — which is
    * USER-sized, so AQE broadcasts it whenever the user dimension is small
    * — then a user-keyed min aggregate. The per-step counts are scalar
    * aggregates unioned driver-side; no corpus-wide shuffle anywhere. */
  def funnel(events: DataFrame, steps: Seq[String], user: String = "user_id",
             metric: String = "metric", time: String = "time"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    var reach = events.where(col(metric) === steps.head)
      .groupBy(col(user)).agg(min(col(time)).as("_t"))
    var counts = Vector(reach.count())
    for (st <- steps.tail) {
      reach = events.where(col(metric) === st)
        .join(reach.select(col(user), col("_t").as("_prev")), user)
        .where(col(time) > col("_prev"))
        .groupBy(col(user)).agg(min(col(time)).as("_t"))
      counts :+= reach.count()
    }
    import spark.implicits._
    steps.zipWithIndex
      .map { case (st, i) => ((i + 1).toLong, st, counts(i)) }
      .toDF("step", "event_type", "n_users")
  }

  /** First-order transition counts (the Markov-chain view of user
    * journeys): per user in (time, tiebreak) order, each consecutive
    * event pair contributes one (from_type, to_type) transition; output
    * is the global transition matrix in sparse form with an exact
    * fixed-point row probability `p_e6 = n·10⁶ div Σ_to n`.
    *
    * Shape at scale: ONE user-keyed window exchange (the lead), then a
    * transition-matrix-sized groupBy (|types|² rows max) whose partials
    * combine map-side; the row-total join is matrix-sized. The tiebreak
    * column makes the lead deterministic even if a data vintage ever
    * carries equal timestamps for one user.
    *
    * @return (from_type, to_type, n, from_n, p_e6) */
  def transitions(events: DataFrame, user: String = "user_id",
                  time: String = "time", typeCol: String = "metric",
                  tiebreak: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(user).orderBy(col(time), col(tiebreak))
    val t = events.select(col(user), col(time), col(tiebreak), col(typeCol))
      .withColumn("_next", lead(typeCol, 1).over(w))
      .where(col("_next").isNotNull)
    val counts = t.groupBy(col(typeCol).as("from_type"),
        col("_next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = counts.groupBy("from_type").agg(sum("n").as("from_n"))
    counts.join(tot, "from_type")
      .withColumn("p_e6", expr("n * 1000000L div from_n"))
  }

  /** Frequent event paths (the 3-step generalization of [[transitions]]):
    * top-k (e₁→e₂→e₃) trigrams over per-user event order — the pattern-
    * discovery read behind funnel design (which 3-step journeys actually
    * happen?). Two deterministic leads over the same user-keyed window
    * exchange, one trigram-sized groupBy (|types|³ rows max, map-side
    * combined), TakeOrdered cut with the (n desc, path asc) tie-break.
    *
    * @return top-k rows (e1, e2, e3, n) */
  def frequentPaths(events: DataFrame, k: Int, user: String = "user_id",
                    time: String = "time", typeCol: String = "metric",
                    tiebreak: String = "event_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(user).orderBy(col(time), col(tiebreak))
    events.select(col(user), col(time), col(tiebreak),
        col(typeCol).as("e1"))
      .withColumn("e2", lead("e1", 1).over(w))
      .withColumn("e3", lead("e1", 2).over(w))
      .where(col("e3").isNotNull)
      .groupBy("e1", "e2", "e3").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("e1"), asc("e2"), asc("e3")).limit(k)
  }

  /** Cohort retention: users are cohorted by the day of their FIRST event
    * (integer day index since epoch, from the ns time column), and each
    * (cohort_day, day_offset) cell counts the distinct users of that cohort
    * active `day_offset` days after their first day. The classic retention
    * triangle; day_offset 0 always equals cohort size.
    *
    * Shape at scale: cohort assignment is one user-keyed min aggregate;
    * the join back is user-keyed against a USER-sized frame (AQE
    * broadcasts it when small); the cell count is one (cohort, offset)
    * distinct-user aggregate — partial-aggregated on (cohort, offset,
    * user), so the shuffle carries one row per user-day, already the
    * output grain. No corpus-scale window, no skew (cells partition by
    * cohort×offset, not by a global key). */
  def retention(events: DataFrame, user: String = "user_id",
                time: String = "time",
                dayNs: Long = 86400000000000L): DataFrame = {
    val days = events.select(col(user),
      expr(s"$time div $dayNs").as("_day"))
    val cohorts = days.groupBy(col(user)).agg(min(col("_day")).as("_cohort"))
    days.join(cohorts, user)
      .groupBy(col("_cohort").as("cohort_day"),
        (col("_day") - col("_cohort")).as("day_offset"))
      .agg(countDistinct(col(user)).as("n_users"))
  }
}
