package graft.streaming

import graft.streaming.StreamIngest.Sample
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** F4 streaming tier — throttle/cooldown over a live sample stream
  * (reference src/tools/throttle.cpp:57-92 semantics, same keep rule as the
  * batch fold in [[graft.hta.Throttle]]): keep a sample iff it is the
  * metric's first, or `last_kept_time + cooldown < time`.
  *
  * State is ONE long per metric (the last kept timestamp) in
  * flatMapGroupsWithState — O(#metrics) bytes total, checkpoint-recovered,
  * so a restarted query continues the cooldown exactly where it left off.
  * The stream shuffles once on `metric`. Micro-batch iterators are
  * unordered, so each batch sorts its group ([[StreamIngest.closedRows]]'s
  * contract): ordered per-metric arrival across batches is assumed, as in
  * every streaming tier here — an out-of-order stream should pass through
  * the ingest watermark first. */
object StreamThrottle {

  final case class ThrottleState(lastKept: Long)

  def throttled(samples: Dataset[Sample], cooldown: Long): Dataset[Sample] = {
    val spark = samples.sparkSession
    import spark.implicits._
    val cd = cooldown
    samples.groupByKey(_.metric)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[Sample], state: GroupState[ThrottleState]) =>
          var lastKept = state.getOption.map(_.lastKept).getOrElse(Long.MinValue)
          val out = Seq.newBuilder[Sample]
          for (s <- it.toSeq.sortBy(_.time))
            if (lastKept == Long.MinValue || lastKept + cd < s.time) {
              lastKept = s.time
              out += s
            }
          state.update(ThrottleState(lastKept))
          out.result().iterator
      }
  }
}
