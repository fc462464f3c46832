package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Linear token classifier: ppm-rate difference weights, sign gate,
  * fold discipline, determinism. */
class ClassifierSpec extends SparkSpec {

  private def mkDocs(rows: (Long, String, String)*) = spark.createDataFrame(
    java.util.Arrays.asList(rows.map { case (i, c, t) => Row(i, c, t) }: _*),
    StructType(Seq(StructField("doc_id", LongType, nullable = false),
      StructField("cls", StringType), StructField("text", StringType))))

  // train fold (doc_id % 5 != 0): A = 5×"aa" (NA=5), B = 3×"bb" (NB=3)
  // → w(aa) = 5·1e6/5 − 0 = 1e6;  w(bb) = 0 − 3·1e6/3 = −1e6
  private val toy = mkDocs(
    (1L, "A", "aa aa aa"), (2L, "A", "aa aa"),
    (3L, "B", "bb bb"), (4L, "B", "bb"),
    // test fold (doc_id % 5 == 0)
    (5L, "A", "aa aa"),      // score 2e6 → A (true positive)
    (10L, "B", "bb bb aa"),  // score −2e6 + 1e6 = −1e6 → B
    (15L, "A", "zz"),        // unseen token → score 0 → ties to A
    (20L, "B", "zz"))        // score 0 → A (misclassified)

  test("weights, scores, and confusion matrix are exact on a toy corpus") {
    val got = TextOps.tokenClassifier(toy, "cls", "A", "B")
      .orderBy("true_class", "pred_class").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("A", "A", 2L, 2000000L),   // docs 5 (2e6) and 15 (0)
      ("B", "A", 1L, 0L),         // doc 20, zero-score tie → A
      ("B", "B", 1L, -1000000L))) // doc 10
  }

  test("deterministic under repartitioning; other labels are excluded") {
    val extra = mkDocs((6L, "C", "aa bb"), (30L, "C", "aa")) // third class
    val both = toy.unionByName(extra)
    val a = TextOps.tokenClassifier(both, "cls", "A", "B").collect().toSet
    val b = TextOps.tokenClassifier(both.repartition(7), "cls", "A", "B")
      .collect().toSet
    assert(a === b)
    // class C neither trains nor scores: same confusion as without it
    val base = TextOps.tokenClassifier(toy, "cls", "A", "B").collect().toSet
    assert(a === base)
  }

  test("real documents table: folds cover the two classes, counts add up") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextOps.tokenClassifier(docs, "lang", "en", "de").collect()
    val nTest = docs.where("lang IN ('en','de') AND doc_id % 5 = 0").count()
    assert(out.map(_.getLong(2)).sum === nTest,
      "every test-fold doc lands in exactly one confusion cell")
    assert(out.forall(r => Set("en", "de")(r.getString(0)) &&
      Set("en", "de")(r.getString(1))))
  }

  test("thresholdSweep: exact confusion and fractions per operating point") {
    // test-fold scores (from the toy weights): doc 5 = 2e6 (A),
    // doc 10 = -1e6 (B), doc 15 = 0 (A), doc 20 = 0 (B)
    val w = TextOps.tokenWeights(toy.where("doc_id % 5 <> 0"),
      "cls", "A", "B")
    val scored = TextOps.scoreDocs(
      toy.where("doc_id % 5 = 0").select("doc_id", "cls", "text"), w)
    val got = TextOps.thresholdSweep(scored, "cls", "A", "score",
        thresholds = Seq(-2000000L, 0L, 1L, 3000000L))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    // t=-2e6: everything positive → tp=2 fp=2; prec 0.5, recall 1
    assert(got(-2000000L) == (2L, 2L, 0L, 0L, 500000L, 1000000L))
    // t=0: docs 5,15,20 positive → tp=2 fp=1 fn=0 tn=1
    assert(got(0L) == (2L, 1L, 0L, 1L, 666666L, 1000000L))
    // t=1: only doc 5 → tp=1 fp=0 fn=1 tn=2; prec 1, recall 0.5
    assert(got(1L) == (1L, 0L, 1L, 2L, 1000000L, 500000L))
    // t=3e6: nothing positive → zero denominators read 0, never NULL
    assert(got(3000000L) == (0L, 0L, 2L, 2L, 0L, 0L))
    intercept[IllegalArgumentException] {
      TextOps.thresholdSweep(scored, "cls", "A", "score", Seq(1L, 1L))
    }
  }
}
