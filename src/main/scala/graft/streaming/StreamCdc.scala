package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming tier of [[graft.pipeline.Cdc.latestByKey]]: a live changelog
  * compacted to "the current row per key" as it arrives.
  *
  * State is ONE row per key — the best (t, seq) change seen so far —
  * checkpoint-recovered, so a restarted query resumes the compaction
  * exactly. Each micro-batch emits a key's row only when its latest
  * CHANGED in that batch (update-mode semantics; a replayed batch
  * re-derives the same state and emits nothing new — emissions are
  * monotone in (t, seq) per key, so downstream upserts converge). The
  * stream shuffles once on the key; state size is #keys × one row,
  * independent of changelog length.
  *
  * Late data needs no watermark here: a change older than the held best
  * simply loses the max and is dropped, which is exactly SCD-1 semantics
  * (latest by ORDER, not by arrival).
  */
object StreamCdc {

  final case class Change(key: String, t: Long, seq: Long, payload: String)

  def latest(changes: Dataset[Change]): Dataset[Change] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[Change], state: GroupState[Change]) =>
          val held = state.getOption
          val candidates = held.toSeq ++ it
          val best = candidates.maxBy(c => (c.t, c.seq))
          if (held.contains(best)) Iterator.empty
          else { state.update(best); Iterator.single(best) }
      }
  }
}
