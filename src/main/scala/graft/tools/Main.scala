package graft.tools

import graft.model.Meta
import graft.store.{Catalog, Warehouse}
import org.apache.spark.sql.SparkSession

/** Subcommand CLI over warehouse paths — the user-facing face of the six
  * reference executables (src/tools/: check.cpp, dump.cpp, repair.cpp,
  * clone.cpp, throttle.cpp, dummy.cpp) plus graft's retention extension.
  * Each subcommand parses reference-shaped arguments and drives the
  * corresponding [[Tools]] job on one shared SparkSession:
  *
  * {{{
  * graft.tools.Main check [--fast] <dir>...
  * graft.tools.Main dump <dir>
  * graft.tools.Main repair [--abs] [--drop-above V] [--drop-below V]
  *                         [--drop-interval FROM-TO]... <dir>     (in place,
  *                         original renamed <dir>.backup-<ts> like repair.cpp)
  * graft.tools.Main clone <config.json> <src-name> <dst-name>       |
  *                  clone [--interval-min N] [--interval-factor N]
  *                        [--interval-max N] <src-dir> <dst-dir>
  * graft.tools.Main throttle <config.json> <src> <dst> <cooldown_ms> |
  *                  throttle <src-dir> <dst-dir> <cooldown_ms>
  * graft.tools.Main generate [config.json] [count]   (dummy.cpp: constant
  *                  42.0 at 50 ms spacing into metric "dummy")
  * graft.tools.Main retire <dir> <horizon-ns>
  * }}}
  *
  * The config forms resolve metric names through the reference-shape JSON
  * catalog ([[Catalog.fromJson]]): store root = `<path>/<name>`, dst Meta
  * from the catalog entry, R/W modes enforced (checkRead on the source,
  * checkWrite on the destination — read_write.cpp semantics at the CLI).
  *
  * Exit codes: 0 success (check: no issues), 1 argument/IO error,
  * 2 check found issues. [[run]] is the testable core — it never calls
  * System.exit. */
object Main {

  private val usage: String =
    """usage: graft.tools.Main <command> [options]
      |  check [--fast] <dir>...
      |  dump <dir>
      |  repair [--abs] [--drop-above V] [--drop-below V] [--drop-interval FROM-TO]... <dir>
      |  clone <config.json> <src-name> <dst-name>
      |  clone [--interval-min N] [--interval-factor N] [--interval-max N] <src-dir> <dst-dir>
      |  throttle <config.json> <src-name> <dst-name> <cooldown_ms>
      |  throttle <src-dir> <dst-dir> <cooldown_ms>
      |  generate [config.json] [count]
      |  retire <dir> <horizon-ns>
      |  index [--buckets N] [--append] <docs.parquet> <index-dir>
      |  search [--k N] [--bm25] <index-dir> <term>...
      |  neardup-index build [--ngram N] [--hashes N] [--bands N] [--threshold T] <docs.parquet> <index-dir>
      |  neardup-index append <docs.parquet> <index-dir>
      |  neardup-index probe [--threshold T] [--max-bucket N] <index-dir> <batch.parquet>
      |  neardup-index retire <ids.parquet> <index-dir>
      |  neardup-index compact [--files N] <index-dir>
      |  neardup-index drift <index-dir>
      |  ann-index build [--nlist N] [--kmeans-iters N] <embeddings.parquet> <index-dir>
      |  ann-index append <embeddings.parquet> <index-dir>
      |  ann-index probe [--k N] [--nprobe N] <index-dir> <queries.parquet>
      |  ann-index retire <ids.parquet> <index-dir>
      |  ann-index compact [--files N] <index-dir>
      |  ann-index drift <index-dir>""".stripMargin

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val code =
      try run(args, spark)
      finally spark.stop()
    if (code != 0) sys.exit(code)
  }

  /** Parse + dispatch; returns the process exit code. Separated from
    * [[main]] so ToolsSpec can drive the real arg-parse path in-JVM. */
  def run(args: Array[String], spark: SparkSession): Int =
    try {
      args.toList match {
        case "check" :: rest     => cmdCheck(rest, spark)
        case "dump" :: dir :: Nil => cmdDump(dir, spark)
        case "repair" :: rest    => cmdRepair(rest, spark)
        case "clone" :: rest     => cmdClone(rest, spark)
        case "throttle" :: rest  => cmdThrottle(rest, spark)
        case "generate" :: rest  => cmdGenerate(rest, spark)
        case "retire" :: dir :: h :: Nil =>
          Tools.retire(spark, dir, parseLong("horizon-ns", h)); 0
        case "index" :: rest    => cmdIndex(rest, spark)
        case "neardup-index" :: rest => cmdNeardupIndex(rest, spark)
        case "ann-index" :: rest => cmdAnnIndex(rest, spark)
        case "search" :: rest   => cmdSearch(rest, spark)
        case ("--help" | "-h") :: _ | Nil => println(usage); 0
        case other =>
          System.err.println(s"unknown command: ${other.mkString(" ")}\n$usage"); 1
      }
    } catch {
      case e: CliError => System.err.println(s"${e.getMessage}\n$usage"); 1
      case e: Exception => System.err.println(s"error: ${e.getMessage}"); 1
    }

  private final class CliError(msg: String) extends RuntimeException(msg)
  private def fail(msg: String): Nothing = throw new CliError(msg)
  private def parseLong(name: String, v: String): Long =
    try v.toLong catch { case _: NumberFormatException =>
      fail(s"cannot parse $name: $v") }
  private def parseDouble(name: String, v: String): Double =
    try v.toDouble catch { case _: NumberFormatException =>
      fail(s"cannot parse $name: $v") }

  /** check.cpp:259-291 — any number of positional directories, `--fast`
    * checks only the most recent data. Issues print per directory; a
    * failing directory is reported and the walk continues (the reference's
    * per-directory try/catch). */
  private def cmdCheck(rest: List[String], spark: SparkSession): Int = {
    val fast = rest.contains("--fast")
    val dirs = rest.filterNot(_ == "--fast")
    if (dirs.isEmpty) fail("check: at least one directory required")
    var issues = 0L
    for (dir <- dirs) {
      try {
        val hta = Warehouse.open(spark, dir)
        val bad = Tools.check(hta, now = System.currentTimeMillis() * 1000000L,
          fast = fast).collect()
        for (r <- bad)
          println(s"[$dir] ${r.getAs[String]("metric")} " +
            s"${r.getAs[String]("layer")}: ${r.getAs[String]("issue")} " +
            s"x${r.getAs[Long]("n")}")
        issues += bad.length
      } catch {
        case e: Exception =>
          System.err.println(s"[$dir] Error: exception thrown: ${e.getMessage}")
          issues += 1
      }
    }
    if (issues == 0) 0 else 2
  }

  /** dump.cpp:81-88 — one directory, per-metric summary to stdout. */
  private def cmdDump(dir: String, spark: SparkSession): Int = {
    val hta = Warehouse.open(spark, dir)
    for (r <- Tools.dump(hta).orderBy("metric").collect())
      println(s"${r.getAs[String]("metric")} n=${r.getAs[Long]("n_rows")} " +
        s"first=${r.getAs[Long]("first_time")} last=${r.getAs[Long]("last_time")}")
    0
  }

  /** repair.cpp:138-251 — flags `--abs`, `--drop-above`, `--drop-below`,
    * repeatable `--drop-interval FROM-TO` (closed interval of timestamps),
    * ONE positional metric directory, repaired IN PLACE: the original
    * moves to `<dir>.backup-<ts>` and the rebuilt store lands at `<dir>`. */
  private def cmdRepair(rest: List[String], spark: SparkSession): Int = {
    var useAbs = false
    var dropAbove = Double.PositiveInfinity
    var dropBelow = Double.NegativeInfinity
    val dropRanges = List.newBuilder[(Long, Long)]
    val pos = List.newBuilder[String]
    var r = rest
    while (r.nonEmpty) {
      r = r match {
        case "--abs" :: t => useAbs = true; t
        case "--drop-above" :: v :: t =>
          dropAbove = parseDouble("drop-above", v); t
        case "--drop-below" :: v :: t =>
          dropBelow = parseDouble("drop-below", v); t
        case "--drop-interval" :: v :: t =>
          v.split("-") match {
            case Array(f, to) =>
              // repair.cpp drops the CLOSED interval [from, to]; repairFilter
              // takes half-open [b, e), so pass to+1
              dropRanges += ((parseLong("drop-interval from", f),
                parseLong("drop-interval to", to) + 1L))
            case _ => fail(s"cannot parse drop-interval: $v")
          }
          t
        case (f @ ("--drop-above" | "--drop-below" | "--drop-interval")) :: Nil =>
          fail(s"$f requires a value")
        case p :: t => pos += p; t
        case Nil => Nil
      }
    }
    pos.result() match {
      case dir :: Nil =>
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val src = new org.apache.hadoop.fs.Path(dir)
        if (!fs.exists(src))
          fail(s"The given input hta metric doesn't exist: $dir")
        val backup = new org.apache.hadoop.fs.Path(
          dir + ".backup-" + System.nanoTime())
        if (fs.exists(backup))
          fail(s"The backup folder already exists: $backup")
        require(fs.rename(src, backup), s"repair: rename $src -> $backup failed")
        val hta = Warehouse.open(spark, backup.toString)
        Tools.repair(hta, dir, dropBelow, dropAbove, dropRanges.result(), useAbs)
        0
      case _ => fail("repair: exactly one metric directory is required")
    }
  }

  /** clone.cpp:83-104 — config form `clone config.json src dst` (dst Meta
    * and R/W modes from the catalog) or the explicit-dir form with
    * `--interval-*` overrides (defaults: the source's Meta). */
  private def cmdClone(rest: List[String], spark: SparkSession): Int = {
    val (flags, pos) = partitionFlags(rest,
      Set("--interval-min", "--interval-factor", "--interval-max"))
    pos match {
      case cfg :: srcName :: dstName :: Nil =>
        if (flags.nonEmpty) fail("clone: --interval-* flags only apply to the dir form")
        val (path, cat) = Catalog.fromJsonFile(spark, cfg)
        cat.checkRead(srcName); cat.checkWrite(dstName)
        val hta = Warehouse.open(spark, s"$path/$srcName")
        Tools.clone(hta, cat.resolve(dstName).meta, s"$path/$dstName")
        0
      case src :: dst :: Nil =>
        val hta = Warehouse.open(spark, src)
        val m = hta.meta
        val newMeta = Meta(
          flags.get("--interval-min").map(parseLong("interval-min", _))
            .getOrElse(m.intervalMin),
          flags.get("--interval-max").map(parseLong("interval-max", _))
            .getOrElse(m.intervalMax),
          flags.get("--interval-factor").map(parseLong("interval-factor", _))
            .getOrElse(m.intervalFactor))
        Tools.clone(hta, newMeta, dst)
        0
      case _ => fail("clone: expected <config.json> <src> <dst> or <src-dir> <dst-dir>")
    }
  }

  /** throttle.cpp:94-122 — `config.json source destination cooldown_ms`
    * (reference arity) or the explicit-dir triple. */
  private def cmdThrottle(rest: List[String], spark: SparkSession): Int =
    rest match {
      case cfg :: srcName :: dstName :: cd :: Nil =>
        val (path, cat) = Catalog.fromJsonFile(spark, cfg)
        cat.checkRead(srcName); cat.checkWrite(dstName)
        val hta = Warehouse.open(spark, s"$path/$srcName")
        Tools.throttleClone(hta,
          parseLong("cooldown_ms", cd) * 1000000L, s"$path/$dstName")
        0
      case src :: dst :: cd :: Nil =>
        val hta = Warehouse.open(spark, src)
        Tools.throttleClone(hta, parseLong("cooldown_ms", cd) * 1000000L, dst)
        0
      case _ => fail("throttle: expected [config.json] <src> <dst> <cooldown_ms>")
    }

  /** dummy.cpp:53-79 — `[config.json] [count]`: `count` constant-42.0
    * samples at 50 ms spacing from t = 1 ms into metric "dummy", whose
    * store root and Meta come from the config (MissingMetricConfig if the
    * config lacks a "dummy"-matching entry, as the reference would). */
  private def cmdGenerate(rest: List[String], spark: SparkSession): Int = {
    val (cfg, count) = rest match {
      case Nil => ("config.json", 600000000L)
      case c :: Nil => (c, 600000000L)
      case c :: n :: Nil => (c, parseLong("count", n))
      case _ => fail("generate: expected [config.json] [count]")
    }
    val (path, cat) = Catalog.fromJsonFile(spark, cfg)
    cat.checkWrite("dummy")
    val points = Tools.generate(spark, "dummy", count, startTime = 1000000L)
    Warehouse.ingest(points, cat.resolve("dummy").meta, s"$path/dummy")
    0
  }

  private def partitionFlags(args: List[String], valued: Set[String])
      : (Map[String, String], List[String]) = {
    var flags = Map.empty[String, String]
    val pos = List.newBuilder[String]
    var r = args
    while (r.nonEmpty) {
      r = r match {
        case f :: v :: t if valued(f) => flags += (f -> v); t
        case f :: Nil if valued(f) => fail(s"$f requires a value")
        case p :: t => pos += p; t
        case Nil => Nil
      }
    }
    (flags, pos.result())
  }

  private def cmdIndex(rest: List[String], spark: SparkSession): Int = {
    var buckets: Option[Int] = None
    var append = false
    def opts(l: List[String]): List[String] = l match {
      case "--buckets" :: v :: t =>
        buckets = Some(parseLong("buckets", v).toInt); opts(t)
      case "--append" :: t => append = true; opts(t)
      case other => other
    }
    opts(rest) match {
      case docsPath :: idxDir :: Nil =>
        if (append && buckets.isDefined)
          fail("index: --buckets applies only to a fresh build; an " +
            "appended index keeps its existing bucket geometry")
        val docs = spark.read.parquet(docsPath)
        val h =
          if (append)
            graft.store.TextIndex.append(docs,
              graft.store.TextIndex.open(idxDir))
          else graft.store.TextIndex.write(docs, idxDir,
            buckets.getOrElse(64))
        println(s"indexed ${h.nDocs} docs into ${h.path} " +
          s"(${h.buckets} buckets)")
        0
      case _ => fail("index: expected [--buckets N] [--append] " +
        "<docs.parquet> <index-dir>")
    }
  }

  /** The persisted LSH band index as a maintenance tool: build once,
    * append accepted drops, probe a batch for near-copies of the stored
    * corpus (O(drop), corpus text never read), compact small files. */
  private def cmdNeardupIndex(rest: List[String], spark: SparkSession): Int = {
    import graft.store.BandIndex
    rest match {
      case "build" :: r =>
        // hashes/bands 0 = derive from --threshold via the knee rule
        var ngram = 3; var hashes = 0; var bands = 0; var threshold = 0.8
        def opts(l: List[String]): List[String] = l match {
          case "--ngram" :: v :: t => ngram = parseLong("ngram", v).toInt; opts(t)
          case "--hashes" :: v :: t => hashes = parseLong("hashes", v).toInt; opts(t)
          case "--bands" :: v :: t => bands = parseLong("bands", v).toInt; opts(t)
          case "--threshold" :: v :: t =>
            threshold = parseDouble("threshold", v); opts(t)
          case other => other
        }
        opts(r) match {
          case docsPath :: idxDir :: Nil =>
            if ((hashes == 0) != (bands == 0))
              fail("neardup-index build: pass BOTH --hashes and --bands, " +
                "or neither (the geometry then derives from --threshold " +
                "via the knee rule)")
            val h = BandIndex.write(spark.read.parquet(docsPath), idxDir,
              ngram, hashes, bands, threshold = threshold)
            println(s"indexed ${h.nDocs} docs into ${h.path} " +
              s"(ngram=${h.ngram}, hashes=${h.numHashes}, bands=${h.bands})")
            0
          case _ => fail("neardup-index build: expected [--ngram N] " +
            "[--hashes N] [--bands N] [--threshold T] <docs.parquet> <index-dir>")
        }
      case "append" :: docsPath :: idxDir :: Nil =>
        val h = BandIndex.append(spark.read.parquet(docsPath),
          BandIndex.open(idxDir))
        val note = BandIndex.driftStats(idxDir) match {
          case Some(d) if d.rebuildAdvised() =>
            f"; DRIFT ratio ${d.ratio}%.2f over ${d.appendedN} appended " +
              "docs — REBUILD ADVISED (neardup-index build re-derives the " +
              "geometry and resets the baseline)"
          case Some(d) => f"; drift ratio ${d.ratio}%.2f"
          case None => ""
        }
        println(s"index now holds ${h.nDocs} docs$note"); 0
      case "drift" :: idxDir :: Nil =>
        BandIndex.driftStats(idxDir) match {
          case Some(d) =>
            println(f"build: n=${d.buildN} " +
              f"mean_shingles=${d.buildMeanShingles}%.1f")
            println(f"appended: n=${d.appendedN} " +
              f"mean_shingles=${d.appendedMeanShingles}%.1f " +
              f"(last drop: n=${d.lastDropN} mean=${d.lastDropMean}%.1f)")
            println(f"ratio=${d.ratio}%.3f rebuild_advised=" +
              s"${d.rebuildAdvised()}")
            if (d.rebuildAdvised())
              println("appended docs no longer resemble the corpus the " +
                "knee-rule geometry was derived from — probe recall on " +
                "them is degrading; rebuild with `neardup-index build` " +
                "(re-derives the geometry, resets the baseline)")
            0
          case None =>
            println(s"no drift baseline at $idxDir (index predates the " +
              "monitor) — rebuild to start monitoring"); 0
        }
      case "probe" :: r =>
        var threshold = 0.8; var maxBucket = 1000
        def opts(l: List[String]): List[String] = l match {
          case "--threshold" :: v :: t =>
            threshold = parseDouble("threshold", v); opts(t)
          case "--max-bucket" :: v :: t =>
            maxBucket = parseLong("max-bucket", v).toInt; opts(t)
          case other => other
        }
        opts(r) match {
          case idxDir :: batchPath :: Nil =>
            val raw = spark.read.parquet(batchPath)
            // user-supplied parquet: doc_id may be int32/string — fail
            // HERE with the schema, not after the probe with an opaque
            // ClassCastException from the printer
            val idType = raw.schema.fields.find(_.name == "doc_id")
              .getOrElse(fail(s"$batchPath has no doc_id column " +
                s"(schema: ${raw.schema.simpleString})")).dataType
            val integral = {
              import org.apache.spark.sql.types._
              idType == ByteType || idType == ShortType ||
                idType == IntegerType || idType == LongType
            }
            if (!integral)
              fail(s"doc_id must be an integer type, got " +
                s"${idType.simpleString} (schema: ${raw.schema.simpleString})")
            val batch = raw.withColumn("doc_id",
              org.apache.spark.sql.functions.col("doc_id").cast("long"))
            graft.pipeline.Dedup.nearDupPairsAgainstIndex(
                BandIndex.open(idxDir), batch, threshold, maxBucket)
              .orderBy("batch_id", "corpus_id").collect()
              .foreach(row => println(s"${row.get(0)}	${row.get(1)}	" +
                f"${row.getDouble(4)}%.4f"))
            0
          case _ => fail("neardup-index probe: expected [--threshold T] " +
            "[--max-bucket N] <index-dir> <batch.parquet>")
        }
      case "retire" :: idsPath :: idxDir :: Nil =>
        val h = BandIndex.open(idxDir)
        BandIndex.retire(spark.read.parquet(idsPath), h)
        println(s"retired ids from $idsPath (probes exclude them now; " +
          "run compact to drop the rows)"); 0
      case "compact" :: r =>
        var files = 1
        def opts(l: List[String]): List[String] = l match {
          case "--files" :: v :: t => files = parseLong("files", v).toInt; opts(t)
          case other => other
        }
        opts(r) match {
          case idxDir :: Nil =>
            val h = BandIndex.compact(spark, BandIndex.open(idxDir), files)
            println(s"compacted $idxDir (${h.nDocs} live docs)"); 0
          case _ => fail("neardup-index compact: expected [--files N] <index-dir>")
        }
      case _ => fail("neardup-index: expected build|append|probe|retire|" +
        "compact|drift ...")
    }
  }

  /** The persisted IVF ANN index as a maintenance tool: build once,
    * append drops under the frozen quantizer, probe top-k, retire
    * (tombstones), compact. */
  private def cmdAnnIndex(rest: List[String], spark: SparkSession): Int = {
    import graft.pipeline.Ann
    import graft.store.IvfStore
    rest match {
      case "build" :: r =>
        var nlist = 16; var iters = 3
        def opts(l: List[String]): List[String] = l match {
          case "--nlist" :: v :: t => nlist = parseLong("nlist", v).toInt; opts(t)
          case "--kmeans-iters" :: v :: t =>
            iters = parseLong("kmeans-iters", v).toInt; opts(t)
          case other => other
        }
        opts(r) match {
          case embPath :: idxDir :: Nil =>
            val h = Ann.writeIvfIndex(spark.read.parquet(embPath), idxDir,
              nlist, iters)
            println(s"indexed into ${h.root} (nlist=${h.centroids.length})")
            0
          case _ => fail("ann-index build: expected [--nlist N] " +
            "[--kmeans-iters N] <embeddings.parquet> <index-dir>")
        }
      case "append" :: embPath :: idxDir :: Nil =>
        IvfStore.append(spark.read.parquet(embPath),
          IvfStore.open(spark, idxDir))
        val note = IvfStore.driftStats(spark, idxDir) match {
          case Some(d) if d.rebuildAdvised() =>
            f"; DRIFT ratio ${d.ratio}%.2f over ${d.appendedN} appended " +
              "vectors — REBUILD ADVISED (ann-index build refreshes the " +
              "geometry and resets the baseline)"
          case Some(d) => f"; drift ratio ${d.ratio}%.2f"
          case None => ""
        }
        println(s"appended into $idxDir (quantizer frozen)$note"); 0
      case "drift" :: idxDir :: Nil =>
        IvfStore.driftStats(spark, idxDir) match {
          case Some(d) =>
            println(f"build: n=${d.buildN} mean=${d.buildMean}%.1f " +
              f"std=${d.buildStd}%.1f")
            println(f"appended: n=${d.appendedN} mean=${d.appendedMean}%.1f " +
              f"(last drop: n=${d.lastDropN} mean=${d.lastDropMean}%.1f)")
            println(f"ratio=${d.ratio}%.3f rebuild_advised=" +
              s"${d.rebuildAdvised()}")
            if (d.rebuildAdvised())
              println("appends have drifted off the frozen quantizer — " +
                "probe recall is degrading; rebuild with `ann-index build` " +
                "(re-derives centroids over the union, resets the baseline)")
            0
          case None =>
            println(s"no drift baseline at $idxDir (index predates the " +
              "monitor) — rebuild to start monitoring"); 0
        }
      case "probe" :: r =>
        var k = 5; var nprobe = 4
        def opts(l: List[String]): List[String] = l match {
          case "--k" :: v :: t => k = parseLong("k", v).toInt; opts(t)
          case "--nprobe" :: v :: t =>
            nprobe = parseLong("nprobe", v).toInt; opts(t)
          case other => other
        }
        opts(r) match {
          case idxDir :: qPath :: Nil =>
            IvfStore.probeTopK(spark.read.parquet(qPath),
                IvfStore.open(spark, idxDir), k, nprobe)
              .orderBy("qid", "rnk").collect()
              .foreach(row => println(s"${row.get(0)}\t${row.get(1)}\t" +
                s"${row.get(2)}\t" + f"${row.getDouble(3)}%.6f"))
            0
          case _ => fail("ann-index probe: expected [--k N] [--nprobe N] " +
            "<index-dir> <queries.parquet>")
        }
      case "retire" :: idsPath :: idxDir :: Nil =>
        IvfStore.retire(spark.read.parquet(idsPath),
          IvfStore.open(spark, idxDir))
        println(s"retired ids from $idsPath (probes exclude them now; " +
          "run compact to drop the rows)"); 0
      case "compact" :: r =>
        var files = 1
        def opts(l: List[String]): List[String] = l match {
          case "--files" :: v :: t => files = parseLong("files", v).toInt; opts(t)
          case other => other
        }
        opts(r) match {
          case idxDir :: Nil =>
            IvfStore.compact(spark, IvfStore.open(spark, idxDir), files)
            println(s"compacted $idxDir"); 0
          case _ => fail("ann-index compact: expected [--files N] <index-dir>")
        }
      case _ =>
        fail("ann-index: expected build|append|probe|retire|compact|drift ...")
    }
  }

  private def cmdSearch(rest: List[String], spark: SparkSession): Int = {
    var k = 10
    var bm25 = false
    def opts(l: List[String]): List[String] = l match {
      case "--k" :: v :: t => k = parseLong("k", v).toInt; opts(t)
      case "--bm25" :: t => bm25 = true; opts(t)
      case other => other
    }
    opts(rest) match {
      case idxDir :: terms if terms.nonEmpty =>
        val h = graft.store.TextIndex.open(idxDir)
        val ranked =
          if (bm25) graft.store.TextIndex.bm25TopK(spark, h, terms, k)
          else graft.store.TextIndex.searchTopK(spark, h, terms, k)
        ranked.collect()
          .foreach(r => println(s"${r.getLong(0)}\t${r.getLong(1)}"))
        0
      case _ => fail("search: expected [--k N] [--bm25] <index-dir> <term>...")
    }
  }
}
