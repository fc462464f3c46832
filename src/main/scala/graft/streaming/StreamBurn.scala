package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming tier of the multi-window SLO burn rate
  * ([[graft.hta.Series.sloBurn]], q148): the LIVE pager — "are we
  * burning error budget NOW, and is it material?" answered per
  * micro-batch instead of at the nightly roll-up. Identical
  * arithmetic: hourly wall-clock buckets over [b, e), trailing 1h/6h
  * error shares scaled by the budget, page = BOTH windows above 1 —
  * so streamed rows are BIT-EQUAL to the batch operator for every
  * bucket the stream has touched (spec-pinned; buckets no event ever
  * reached are the batch grid's NULL-burn rows, which a stream has no
  * occasion to emit).
  *
  * State is ONE hour-bucket count map under a single key — bounded by
  * the window's hour count (278 for the standard range), which is why
  * a constant grouping key is correct here rather than a scale smell:
  * the state IS the grid, not the corpus. A touched bucket re-emits
  * itself and the ≤ 5 later buckets whose trailing windows it feeds
  * (late events therefore retro-correct downstream pages, exactly as
  * a batch re-run would). */
object StreamBurn {

  final case class Ev(metric: String, time: Long)
  // public: the state encoder's generated code instantiates it
  final case class Cnt(tot: Long, err: Long)
  final case class Grid(m: Map[Long, Cnt])
  final case class Out(bucket: Long, time: Long, n_tot: Long, n_err: Long,
                       burn1_e6: Option[Long], n_tot_6h: Long,
                       n_err_6h: Long, burn6_e6: Option[Long],
                       page: Boolean)

  def burn(events: Dataset[Ev], b: Long, e: Long, errType: String,
           budgetDen: Long): Dataset[Out] = {
    require(e > b && budgetDen >= 1, s"bad args [$b,$e) budgetDen=$budgetDen")
    val hourNs = 3600000000000L
    val nSteps = (e - b + hourNs - 1) / hourNs
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(ev => ev.time >= b && ev.time < e)
      .groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (_: Int, it: Iterator[Ev], state: GroupState[Grid]) =>
          var m = state.getOption.map(_.m).getOrElse(Map.empty[Long, Cnt])
          val touched = scala.collection.mutable.Set.empty[Long]
          for (ev <- it) {
            val bk = (ev.time - b) / hourNs
            val c = m.getOrElse(bk, Cnt(0L, 0L))
            m = m.updated(bk,
              Cnt(c.tot + 1, c.err + (if (ev.metric == errType) 1L else 0L)))
            touched += bk
          }
          if (touched.isEmpty) Iterator.empty
          else {
            state.update(Grid(m))
            val dirty = touched.flatMap(t => t to math.min(t + 5, nSteps - 1))
              .toSeq.sorted
            dirty.iterator.map { bk =>
              val c = m.getOrElse(bk, Cnt(0L, 0L))
              var t6 = 0L; var e6 = 0L
              for (j <- math.max(0L, bk - 5) to bk) {
                val cj = m.getOrElse(j, Cnt(0L, 0L))
                t6 += cj.tot; e6 += cj.err
              }
              val b1 = if (c.tot == 0) None
                else Some(c.err * 1000000L * budgetDen / c.tot)
              val b6 = if (t6 == 0) None
                else Some(e6 * 1000000L * budgetDen / t6)
              Out(bk, b + bk * hourNs, c.tot, c.err, b1, t6, e6, b6,
                b1.exists(_ > 1000000L) && b6.exists(_ > 1000000L))
            }
          }
      }
  }
}
