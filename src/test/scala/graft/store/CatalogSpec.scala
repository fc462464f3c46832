package graft.store

import graft.SparkSpec
import graft.model.Meta
import graft.store.Warehouse

/** Ports of tests/prefix.cpp:45-107 and tests/read_write.cpp:46-131. */
class CatalogSpec extends SparkSpec {

  private val cat = new Catalog(Seq(
    "prefix" -> MetricConfig(Meta(13370000000000L, 1337000000000000L, 20), "RW", isPrefix = true),
    "foo" -> MetricConfig(),
    "bar" -> MetricConfig(),
    "wonly" -> MetricConfig(mode = "W"),
    "ronly" -> MetricConfig(mode = "R")))

  test("prefix config resolution with inherited Meta (prefix.cpp:113-118)") {
    val m = cat.resolve("prefix.metric").meta
    assert(m.intervalMin === 13370000000000L)
    assert(m.intervalMax === 1337000000000000L)
    assert(m.intervalFactor === 20)
    cat.resolve("prefix.")    // technically allowed (prefix.cpp:126)
    cat.resolve("prefix.other")
    cat.resolve("foo")
    cat.resolve("bar")
  }

  test("unconfigured names throw MissingMetricConfig (prefix.cpp:120-124)") {
    intercept[MissingMetricConfig](cat.resolve("invalid.metric"))
    intercept[MissingMetricConfig](cat.resolve("foo.metric"))
    intercept[MissingMetricConfig](cat.resolve("bar.metric"))
  }

  test("metric pre-creation from config params alone (meta.cpp:42-71)") {
    // the reference creates the store files from config with no data;
    // our analogue: Meta validates and persists before any ingest
    val meta = Meta(1337000028L, 365L * 24 * 3600 * 1000000000L, 42L)
    val root = tmpDir("meta")
    Warehouse.writeMetaPublic(meta, root, spark)
    assert(Warehouse.readMeta(spark, root) === meta)
    intercept[IllegalArgumentException](Meta(1337000029L, 1L << 60, 42L)) // not divisible
    intercept[IllegalArgumentException](Meta(10L, 1L << 60, 1L))          // factor < 2
  }

  test("R/W/RW mode enforcement (read_write.cpp:46-131)") {
    cat.checkRead("ronly"); cat.checkWrite("wonly")
    cat.checkRead("foo"); cat.checkWrite("foo")
    intercept[IllegalStateException](cat.checkWrite("ronly"))
    intercept[IllegalStateException](cat.checkRead("wonly"))
  }
}
