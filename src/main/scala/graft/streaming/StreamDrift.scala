package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming tier of the categorical mix-drift monitor
  * ([[graft.pipeline.Profile.mixDrift]], q150): live per-day L1
  * distance of the event-type mix against a FIXED reference
  * distribution — the production drift alarm ("today's traffic no
  * longer looks like the training mix"), which by nature compares to a
  * frozen reference rather than the evolving global the batch monitor
  * derives. Same exact common-denominator rational:
  * `l1_e6 = (Σ_t |n_dt·R − r_t·N_d|) · 10⁶ div (N_d·R)` with (r_t, R)
  * the reference counts — so with the reference set to the corpus's own
  * global counts, streamed rows are BIT-EQUAL to the batch operator
  * (spec-pinned).
  *
  * State per day is the type→count map (bounded by category
  * cardinality); update-mode emission re-scores a day whenever it
  * receives events. Categories in the reference but silent today count
  * at n_dt = 0; live categories missing from the reference count their
  * full mass as drift (r_t = 0) — both as the L1 demands. */
object StreamDrift {

  final case class Ev(t: String, time: Long)
  // public: the state encoder's generated code instantiates it
  final case class Counts(m: Map[String, Long])
  final case class Out(day: Long, n_day: Long, l1_e6: Long,
                       top_type: String, top_dev_e6: Long)

  def mixDrift(events: Dataset[Ev], reference: Map[String, Long],
               dayNs: Long = 86400000000000L): Dataset[Out] = {
    require(reference.nonEmpty && reference.values.forall(_ > 0),
      "reference needs positive counts")
    val refTotal = reference.values.sum
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(e => e.time / dayNs)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (day: Long, it: Iterator[Ev], state: GroupState[Counts]) =>
          var m = state.getOption.map(_.m).getOrElse(Map.empty[String, Long])
          var touched = false
          for (e <- it) {
            m = m.updated(e.t, m.getOrElse(e.t, 0L) + 1L)
            touched = true
          }
          if (!touched) Iterator.empty
          else {
            state.update(Counts(m))
            val nd = m.values.sum
            val types = (m.keySet ++ reference.keySet).toSeq.sorted
            val devs = types.map { t =>
              t -> math.abs(m.getOrElse(t, 0L) * refTotal -
                reference.getOrElse(t, 0L) * nd)
            }
            val l1 = devs.map(_._2).sum * 1000000L / (nd * refTotal)
            // max dev, ties to the LARGER type name — the batch rule
            val (topT, topD) = devs.maxBy { case (t, d) => (d, t) }
            Iterator.single(Out(day, nd, l1,
              topT, topD * 1000000L / (nd * refTotal)))
          }
      }
  }
}
