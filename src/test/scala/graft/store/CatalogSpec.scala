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

  test("reference-shape config.json loads into the resolution path " +
       "(directory.cpp:86-123, meta.cpp:40-67)") {
    val json =
      """{"type": "file", "path": "/data/hta",
        | "metrics": {
        |   "cpu.total": {"interval_min": 20000000000, "interval_factor": 10,
        |                 "interval_max": 2000000000000, "mode": "R"},
        |   "web": {"prefix": true, "interval_min": 13370000000000,
        |           "interval_factor": 20, "interval_max": 1337000000000000},
        |   "plain": {}
        | }}""".stripMargin
    val (path, jc) = Catalog.fromJson(json)
    assert(path === "/data/hta")
    // exact entry with explicit Meta + mode
    val cpu = jc.resolve("cpu.total")
    assert(cpu.meta === Meta(20000000000L, 2000000000000L, 10L) &&
      cpu.mode === "R")
    intercept[IllegalStateException](jc.checkWrite("cpu.total"))
    // prefix entry: the reference appends '.' (directory.cpp:108-110) —
    // web.cpu resolves, webserver must NOT
    assert(jc.resolve("web.cpu").meta.intervalFactor === 20L)
    intercept[MissingMetricConfig](jc.resolve("webserver"))
    // empty metric config inherits every reference default (meta.hpp:51-53)
    assert(jc.resolve("plain").meta === Meta())
    intercept[MissingMetricConfig](jc.resolve("absent"))
    // malformed inputs fail like the reference's throws
    intercept[IllegalArgumentException](
      Catalog.fromJson("""{"type": "http", "path": "/x", "metrics": {}}"""))
    intercept[IllegalArgumentException](Catalog.fromJson(
      """{"type": "file", "path": "/x",
        | "metrics": {"m": {"mode": "RWX"}}}""".stripMargin))
    intercept[IllegalArgumentException](Catalog.fromJson(
      """{"type": "file", "path": "/x",
        | "metrics": {"m": {"interval_min": 15, "interval_factor": 10}}}""".stripMargin))
    // round-trip through a file on the Hadoop-visible local FS
    val dir = tmpDir("jsoncfg")
    val f = new java.io.File(dir, "config.json")
    val w = new java.io.FileWriter(f)
    try w.write(json) finally w.close()
    val (p2, jc2) = Catalog.fromJsonFile(spark, f.getAbsolutePath)
    assert(p2 === path && jc2.resolve("web.x").mode === "RW")
  }
}
