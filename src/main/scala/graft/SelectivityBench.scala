package graft

import graft.pipeline.{Dedup, TextOps}
import org.apache.spark.sql.functions._

/** Measures the LSH-prescreen SELECTIVITY claim of the cosine-join tier
  * on a given documents corpus (round-13 VERDICT item 3): the driver
  * testdata's 31-word vocabulary makes token-SET banding degenerate to
  * ~all-pairs, so the claim needs a realistic-vocabulary corpus
  * (`tools/synth_zipf.py`) to be demonstrable. Prints one JSON line:
  * docs, all-pairs, the banded prescreen's candidate count, both tiers'
  * wall times and their (equal) accepted-pair counts.
  *
  * tau defaults to 9/10, not q180's 4/5: tf-weighted cosine over a Zipf
  * vocabulary is stopword-flattened (measured: random pairs on the
  * synth_zipf corpus have mean cosine 0.625 and 3% of them clear 0.8),
  * so at 4/5 the OUTPUT itself is quadratic and no candidate generator
  * can be selective — the threshold must sit above the random-pair
  * ceiling (p99 0.824) for "near-duplicate" to be a sparse relation.
  * That is a property of raw-tf cosine on realistic vocabulary worth
  * recording, not a tuning trick.
  *
  * Run: sbt "runMain graft.SelectivityBench /tmp/testdata_zipf [9 10]"
  */
object SelectivityBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/testdata_zipf")
    val tauN = args.lift(1).map(_.toLong).getOrElse(9L)
    val tauD = args.lift(2).map(_.toLong).getOrElse(10L)
    // band geometry must MATCH the threshold: the b-band/r-row S-curve
    // knee sits at (1/b)^(1/r), and unigram token sets on a Zipf corpus
    // have a stopword floor of J ~ 0.3 between RANDOM pairs - the old
    // fixed default (b=16, r=2, knee 0.25) admits nearly all pairs here.
    // Since round 14 the API DEFAULT derives the geometry from the
    // threshold (Dedup.bandGeometryFor — this bench's round-13 finding
    // encoded as code), so the default run now measures exactly what a
    // caller gets with no geometry knobs at all; explicit bands/hashes
    // remain available to reproduce the degenerate geometries
    val (autoHashes, autoBands) =
      graft.pipeline.Dedup.bandGeometryFor(tauN.toDouble / tauD)
    val bands = args.lift(3).map(_.toInt).getOrElse(autoBands)
    val numHashes = args.lift(4).map(_.toInt).getOrElse(autoHashes)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").cache()
    val n = docs.count()

    // the q180 family: 32 hashes, 16 bands; tau from the command line
    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // candidate accounting: the prescreen cosineJoinBucketed runs, stated
    // in pairs BEFORE the exact-integer verify
    val f = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("w"))
    val sigs = Dedup.minhashSignatures(
      f.select(col("doc_id"), col("term").as("gram")), numHashes = numHashes)
    val (cands, tCand) =
      time(Dedup.lshCandidates(sigs, bands = bands, rowsPerBand = numHashes / bands).count())
    val (nLsh, tLsh) = time(
      Dedup.cosineJoinBucketed(docs, tauNum = tauN, tauDen = tauD, numHashes = numHashes, bands = bands).count())
    // the exact tier is the 38-minute side of the comparison — skip it
    // when a prior run already measured it (SPARK_GRAFT_SKIP_EXACT=1)
    val (nExact, tExact) =
      if (sys.env.get("SPARK_GRAFT_SKIP_EXACT").contains("1")) (-1L, -1.0)
      else time(Dedup.cosineJoin(docs, tauNum = tauN, tauDen = tauD).count())
    val allPairs = n * (n - 1) / 2
    println(
      s"""{"docs":$n,"tau":"$tauN/$tauD","bands":$bands,"num_hashes":$numHashes,"all_pairs":$allPairs,"lsh_candidates":$cands,""" +
        s""""cand_frac":${cands.toDouble / allPairs},""" +
        s""""pairs_lsh":$nLsh,"pairs_exact":$nExact,""" +
        s""""t_candidates_s":$tCand,"t_q180_lsh_s":$tLsh,""" +
        s""""t_q102_exact_s":$tExact}""")
    require(nExact < 0 || nLsh <= nExact,
      "LSH tier accepted pairs must be a subset of the exact tier's")
    spark.stop()
  }
}
