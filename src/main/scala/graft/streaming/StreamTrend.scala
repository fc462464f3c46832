package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming tier of the per-metric OLS trend
  * ([[graft.hta.Series.linearTrend]], q130): the live drift-slope
  * monitor — an alert on "error rate has been climbing for an hour"
  * needs the slope NOW, not at the nightly batch. Same window
  * [b, e), same `step` grid, same literal midpoint centering, so the
  * streamed rows are BIT-EQUAL to the batch operator over the same
  * samples whatever the micro-batch slicing (spec-pinned).
  *
  * State per metric is FIVE exact longs (n, Σx, Σy, Σxy, Σx²) — the
  * normal equations are their own bounded state; the key space is the
  * metric universe, the same boundedness contract as the warehouse
  * catalog. Update-mode emission: one settled row per metric per
  * micro-batch that touched it, NULL slope for a still-degenerate
  * (single-bucket) metric. Samples outside [b, e) are dropped exactly
  * as the batch filter drops them. */
object StreamTrend {

  final case class Pt(metric: String, time: Long, cents: Long)
  final case class Acc(n: Long, sx: Long, sy: Long, sxy: Long, sxx: Long)
  final case class Out(metric: String, n: Long, sum_x: Long, sum_y: Long,
                       sxy_num: Long, sxx_num: Long,
                       slope_cents_per_step: Option[Double])

  def trend(points: Dataset[Pt], b: Long, e: Long, step: Long): Dataset[Out] = {
    require(e > b && step >= 1, s"bad args [$b,$e) step=$step")
    val mid = ((e - b) / step) / 2
    val spark = points.sparkSession
    import spark.implicits._
    points
      .filter(p => p.time >= b && p.time < e)
      .groupByKey(_.metric)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (metric: String, it: Iterator[Pt],
         state: org.apache.spark.sql.streaming.GroupState[Acc]) =>
          var a = state.getOption.getOrElse(Acc(0L, 0L, 0L, 0L, 0L))
          var touched = false
          for (p <- it) {
            val x = (p.time - b) / step - mid // time ≥ b: / is floor here
            a = Acc(a.n + 1, a.sx + x, a.sy + p.cents,
              a.sxy + x * p.cents, a.sxx + x * x)
            touched = true
          }
          if (!touched) Iterator.empty
          else {
            state.update(a)
            val num = a.n * a.sxy - a.sx * a.sy
            val den = a.n * a.sxx - a.sx * a.sx
            Iterator.single(Out(metric, a.n, a.sx, a.sy, num, den,
              if (den == 0L) None else Some(num.toDouble / den.toDouble)))
          }
      }
  }
}
