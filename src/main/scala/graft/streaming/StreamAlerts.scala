package graft.streaming

import graft.streaming.StreamIngest.Sample
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming tier of [[graft.hta.Series.hysteresisAlerts]] — the alerting
  * read where it actually lives, on the live stream: ON at cents ≥ hi,
  * OFF at ≤ lo, hold between, emit only the state edges a notifier pages
  * on.
  *
  * State is ONE long per metric (the current alert bit) in
  * flatMapGroupsWithState — O(#metrics) bytes, checkpoint-recovered, so a
  * restarted query resumes mid-dead-band without re-paging. Same
  * contracts as [[StreamThrottle]]: one metric shuffle, per-batch sort
  * (micro-batch iterators are unordered), ordered per-metric arrival
  * across batches (route out-of-order streams through the ingest
  * watermark first). Emitted edges equal the batch operator's rows
  * exactly (spec-pinned across micro-batch slicings). */
object StreamAlerts {

  final case class AlertState(alert: Long)
  final case class AlertEdge(metric: String, time: Long, cents: Long,
                             alert: Long)

  def alerts(samples: Dataset[Sample], hiCents: Long,
             loCents: Long): Dataset[AlertEdge] = {
    require(hiCents > loCents, s"need hiCents > loCents, got $hiCents/$loCents")
    val spark = samples.sparkSession
    import spark.implicits._
    val (hi, lo) = (hiCents, loCents)
    samples.groupByKey(_.metric)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (m: String, it: Iterator[Sample], state: GroupState[AlertState]) =>
          var alert = state.getOption.map(_.alert).getOrElse(0L)
          val out = Seq.newBuilder[AlertEdge]
          for (s <- it.toSeq.sortBy(_.time)) {
            // same integer encoding as Tables.events' cents column —
            // HALF_UP like Spark's round() (math.round half-toward-+inf
            // disagrees on negative .5 halves)
            val cents = BigDecimal(s.value * 100)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
            val next =
              if (cents >= hi) 1L else if (cents <= lo) 0L else alert
            if (next != alert) {
              alert = next
              out += AlertEdge(m, s.time, cents, alert)
            }
          }
          state.update(AlertState(alert))
          out.result().iterator
      }
  }
}
