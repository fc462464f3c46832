package graft.pipeline

import graft.SparkSpec

/** The knee-rule band geometry derivation (round-13 SelectivityBench
  * encoded as the API default): chosen geometry per threshold, the
  * recall law it guarantees, and the resolve contract (sentinel (0,0)
  * derives; explicit values are honored; mismatched sentinels reject). */
class BandGeometrySpec extends SparkSpec {

  private def recall(t: Double, numHashes: Int, bands: Int): Double = {
    val r = numHashes / bands
    1.0 - math.pow(1.0 - math.pow(t, r), bands)
  }

  test("chosen geometry per threshold: the knee ladder") {
    // high thresholds get the most selective geometry the 128-hash
    // budget can recall at; each step down trades knee for recall
    assert(Dedup.bandGeometryFor(0.95) === ((128, 8)))  // r=16, knee 0.88
    assert(Dedup.bandGeometryFor(0.92) === ((128, 8)))
    assert(Dedup.bandGeometryFor(0.90) === ((128, 16))) // r=8, knee 0.707
    assert(Dedup.bandGeometryFor(0.80) === ((128, 16)))
    assert(Dedup.bandGeometryFor(0.70) === ((128, 32))) // r=4, knee 0.42
    assert(Dedup.bandGeometryFor(0.55) === ((128, 32)))
    assert(Dedup.bandGeometryFor(0.40) === ((128, 64))) // r=2, knee 0.125
    assert(Dedup.bandGeometryFor(0.10) === ((128, 128))) // r=1 floor
  }

  test("every chosen geometry recalls >= 0.9 at its threshold") {
    for (t <- Seq(0.10, 0.25, 0.40, 0.55, 0.70, 0.80, 0.90, 0.95, 0.99)) {
      val (nh, b) = Dedup.bandGeometryFor(t)
      assert(nh % b === 0, s"bands must divide numHashes at t=$t")
      assert(nh <= 128, s"hashCoef budget at t=$t")
      assert(recall(t, nh, b) >= 0.9,
        s"derived geometry ($nh, $b) must recall >= 0.9 at t=$t")
      // and the next-more-selective geometry would NOT (maximality),
      // unless we are already at the r=16 ceiling
      val r = nh / b
      if (r < 16) {
        val r2 = r * 2
        assert(recall(t, (128 / r2) * r2, 128 / r2) < 0.9,
          s"r=$r2 should have been rejected at t=$t")
      }
    }
  }

  test("knee values match the closed form") {
    assert(math.abs(Dedup.bandKnee(128, 16) - math.pow(1.0 / 16, 1.0 / 8)) < 1e-12)
    assert(math.abs(Dedup.bandKnee(32, 16) - 0.25) < 1e-12)
  }

  test("resolve: sentinel derives, explicit is honored, half-sentinel rejects") {
    assert(Dedup.resolveBandGeometry(0, 0, 0.8, "spec") ===
      Dedup.bandGeometryFor(0.8))
    assert(Dedup.resolveBandGeometry(32, 16, 0.8, "spec") === ((32, 16)))
    intercept[IllegalArgumentException] {
      Dedup.resolveBandGeometry(32, 0, 0.8, "spec")
    }
    intercept[IllegalArgumentException] {
      Dedup.resolveBandGeometry(0, 16, 0.8, "spec")
    }
    intercept[IllegalArgumentException] {
      Dedup.resolveBandGeometry(33, 16, 0.8, "spec") // bands must divide
    }
  }

  test("hash budget bound and threshold domain are enforced") {
    intercept[IllegalArgumentException] { Dedup.bandGeometryFor(0.8, 256) }
    intercept[IllegalArgumentException] { Dedup.bandGeometryFor(0.0) }
    intercept[IllegalArgumentException] { Dedup.bandGeometryFor(1.1) }
    // a smaller budget still yields a dividing geometry
    val (nh, b) = Dedup.bandGeometryFor(0.9, 32)
    assert(nh <= 32 && nh % b === 0)
  }

  test("auto-geometry nearDupPairs matches the pinned-geometry output " +
    "on planted near-dups (verify tier is exact either way)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val auto = Dedup.nearDupPairs(docs, threshold = 0.9)
      .select("doc_a", "doc_b").collect().map(_.toSeq).toSet
    val pinned = Dedup.nearDupPairs(docs, threshold = 0.9,
        numHashes = 32, bands = 16)
      .select("doc_a", "doc_b").collect().map(_.toSeq).toSet
    assert(auto.nonEmpty, "planted near-dups expected")
    assert(auto === pinned,
      "at this SF both geometries must recall every planted pair")
  }
}
