package graft.store

import graft.model.Meta

/** S7 — metric catalog with prefix-pattern configs and R/W/RW mode
  * enforcement (reference Directory::operator[] src/directory.cpp:150-171,
  * make_metric :59-84, mode checks src/metric.cpp:73-95).
  *
  * Resolution: exact config name wins; otherwise any config registered as a
  * prefix matches every metric name it string-prefixes (insertion order,
  * like the reference's map iteration). No match → MissingMetricConfig.
  */
final case class MetricConfig(meta: Meta = Meta(), mode: String = "RW",
                              isPrefix: Boolean = false) {
  require(Set("R", "W", "RW").contains(mode), s"invalid mode $mode")
}

final class MissingMetricConfig(name: String)
  extends RuntimeException(s"no settings found to create metric $name")

final class Catalog(configs: Seq[(String, MetricConfig)]) {

  private val exact = configs.filterNot(_._2.isPrefix).toMap
  private val prefixes = configs.filter(_._2.isPrefix)

  /** Resolve a metric name to its config (Directory::operator[]). */
  def resolve(name: String): MetricConfig =
    exact.get(name).orElse(
      prefixes.collectFirst { case (p, c) if name.startsWith(p) => c })
      .getOrElse(throw new MissingMetricConfig(name))

  /** Mode enforcement (src/metric.cpp:73-95). */
  def checkRead(name: String): Unit = {
    val m = resolve(name).mode
    if (!m.contains("R")) throw new IllegalStateException(s"metric $name not readable (mode $m)")
  }
  def checkWrite(name: String): Unit = {
    val m = resolve(name).mode
    if (!m.contains("W")) throw new IllegalStateException(s"metric $name not writable (mode $m)")
  }

  /** All exactly-configured metric names, sorted (O5 flavor). */
  def names: Seq[String] = exact.keys.toSeq.sorted
}

/** Reference-shape JSON config ingestion (read_json_from_file
  * src/directory.cpp:49-57, the Directory constructor :86-123, Meta(json)
  * src/meta.cpp:40-67): the on-disk `config.json` a reference deployment
  * already has loads straight into the existing [[Catalog]] resolution
  * path. Jackson (on Spark's own classpath) preserves the object's field
  * order, so prefix entries keep the reference's insertion-order match
  * semantics. */
object Catalog {

  /** Parse a reference-style config JSON string →
    * (warehouse path, catalog). `type` must be "file" (directory.cpp:89-96);
    * `metrics` maps name → {interval_min, interval_factor, interval_max
    * (ns integers, meta.cpp), mode ("RW"|"R"|"W", directory.cpp:61-81),
    * prefix (bool)}. A `"prefix": true` entry is stored with the appended
    * dot (directory.cpp:106-110), so `web` matches `web.cpu` but never
    * `webserver`. Missing Meta fields take the reference defaults
    * (hta/meta.hpp:51-53); Meta's own validation (divisibility,
    * positivity, ordering) applies as in Meta(json). */
  def fromJson(json: String): (String, Catalog) = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(json)
    def textOf(n: com.fasterxml.jackson.databind.JsonNode, f: String): Option[String] =
      Option(n.get(f)).map(_.asText)
    val tpe = textOf(root, "type").getOrElse(
      throw new IllegalArgumentException("config missing 'type'"))
    require(tpe == "file", s"Unknown directory type: $tpe")
    val path = textOf(root, "path").getOrElse(
      throw new IllegalArgumentException("config missing 'path'"))
    val dflt = Meta()
    val configs = Option(root.get("metrics")).toSeq.flatMap { ms =>
      val it = ms.fields()
      val out = Seq.newBuilder[(String, MetricConfig)]
      while (it.hasNext) {
        val e = it.next()
        val name = e.getKey
        val mc = e.getValue
        def longOf(f: String, d: Long): Long =
          Option(mc.get(f)).map(_.asLong).getOrElse(d)
        val meta = Meta(
          intervalMin = longOf("interval_min", dflt.intervalMin),
          intervalMax = longOf("interval_max", dflt.intervalMax),
          intervalFactor = longOf("interval_factor", dflt.intervalFactor))
        val mode = textOf(mc, "mode").getOrElse("RW")
        require(Set("RW", "R", "W").contains(mode),
          s"unknown metric mode $mode supported modes are RW,R,W")
        val isPrefix = Option(mc.get("prefix")).exists(_.asBoolean)
        out += ((if (isPrefix) name + "." else name,
          MetricConfig(meta, mode, isPrefix)))
      }
      out.result()
    }
    val names = configs.filterNot(_._2.isPrefix).map(_._1)
    require(names.distinct.length == names.length,
      "duplicated metric name in initial configuration")
    (path, new Catalog(configs))
  }

  /** Load a reference-style `config.json` from disk (any Hadoop-visible
    * path — local file, HDFS, object store). */
  def fromJsonFile(spark: org.apache.spark.sql.SparkSession,
                   path: String): (String, Catalog) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      fromJson(new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
    } finally in.close()
  }
}
