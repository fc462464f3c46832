package graft.sources

import graft.SparkSpec
import graft.model.Meta
import java.nio.file.{Files, Paths}

/** S5 converter: byte-exact .hta file roundtrip through the binary reader. */
class HtaFormatSpec extends SparkSpec {

  test(".hta raw file parses back to the exact samples") {
    val meta = Meta(10 * S, 1000 * S, 10)
    val bytes = HtaFormat.writeRawFile(meta, fixture110)
    val dir = tmpDir("htafmt")
    Files.createDirectories(Paths.get(s"$dir/foo"))
    Files.write(Paths.get(s"$dir/foo/raw.hta"), bytes)

    val df = HtaFormat.readRaw(spark, s"$dir/*/raw.hta")
    val got = df.orderBy("time").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(got === fixture110)
    assert(df.select("metric").distinct().collect().head.getString(0) === "foo")
  }

  test("preamble validation rejects corrupt files") {
    val good = HtaFormat.writeRawFile(Meta(10 * S, 1000 * S, 10), Seq(tp(1) -> 1.0))
    intercept[IllegalArgumentException] {
      HtaFormat.parsePreamble("JUNKJUNK".getBytes ++ good.drop(8))
    }
    val badVersion = good.clone()
    badVersion(24) = 9 // version little-endian first byte
    intercept[IllegalArgumentException](HtaFormat.parsePreamble(badVersion))
  }

  test("converted raw ingests into a warehouse matching direct ingest") {
    val meta = Meta(10 * S, 1000 * S, 10)
    val dir = tmpDir("htaconv")
    Files.createDirectories(Paths.get(s"$dir/foo"))
    Files.write(Paths.get(s"$dir/foo/raw.hta"),
      HtaFormat.writeRawFile(meta, fixture110))
    val converted = graft.store.Warehouse.ingest(
      HtaFormat.readRaw(spark, s"$dir/*/raw.hta"), meta, tmpDir("convwh"))
    val direct = graft.store.Warehouse.ingest(fixtureDf, meta, tmpDir("directwh"))
    val a = converted.levels.orderBy("interval", "time").collect()
    val b = direct.levels.orderBy("interval", "time").collect()
    assert(a.toSeq === b.toSeq)
  }
}
