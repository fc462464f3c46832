package graft.streaming

import org.apache.spark.sql.Dataset

/** Streaming tier of the linear token classifier
  * ([[graft.pipeline.TextOps.tokenClassifier]], q158): gate INCOMING
  * documents on a frozen weight table at ingest time — the live
  * quality/source filter in front of a training corpus (the CCNet
  * deployment shape: train offline, gate online).
  *
  * Stateless by construction: the vocab-sized (term → ppm weight) map
  * is broadcast, each arriving doc is tokenized in-row and scored by
  * summing weights over its token occurrences (unseen tokens weigh 0,
  * same whitespace split as the batch tier), and the row is emitted
  * with its score and keep flag. No watermark, no state store,
  * exactly-once for free in append mode. Scores are BIT-EQUAL to the
  * batch [[graft.pipeline.TextOps.scoreDocs]] on the same rows
  * (spec-pinned across micro-batch slicings) — |w| ≤ 10⁶ keeps any
  * realistic document's sum far inside int64. */
object StreamClassify {

  final case class Doc(doc_id: Long, text: String)
  final case class Scored(doc_id: Long, score: Long, keep: Boolean)

  def gate(docs: Dataset[Doc], weights: Map[String, Long],
           minScore: Long = 0L): Dataset[Scored] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(weights)
    docs.map { d =>
      val w = bc.value
      // same tokenization as TextOps.tokens: split on single spaces,
      // empty text yields one empty token (weight 0 unless trained)
      val toks = d.text.split(" ", -1)
      var s = 0L; var i = 0
      while (i < toks.length) { s += w.getOrElse(toks(i), 0L); i += 1 }
      Scored(d.doc_id, s, s >= minScore)
    }
  }
}
