package graft.store

import graft.SparkSpec
import graft.model.Meta

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

  test("R/W/RW mode enforcement (read_write.cpp:46-131)") {
    cat.checkRead("ronly"); cat.checkWrite("wonly")
    cat.checkRead("foo"); cat.checkWrite("foo")
    intercept[IllegalStateException](cat.checkWrite("ronly"))
    intercept[IllegalStateException](cat.checkRead("wonly"))
  }
}
