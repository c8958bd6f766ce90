package graft

import graft.table.{FileEntry, MetaJson}
import org.scalatest.funsuite.AnyFunSuite

/** The driver-side JSON codec behind manifests and sidecars must
  * round-trip EVERY value bit-exactly — a lossy double or a mangled path
  * string would corrupt pruning bounds or orphan data files silently.
  * (NaN/Infinity never reach these files by contract: footer stats fail
  * open to ±Double.MaxValue instead.) */
class MetaJsonSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(42)

  /** Hostile strings: quotes, backslashes, control chars, unicode, JSON
    * metacharacters — everything a path or lineage id could ever carry. */
  private def randStr(): String = {
    val specials = Seq("\"", "\\", "\n", "\t", "\r", "{", "}", "[", "]", ",",
      ":", "日本語", "\u0000", "\u001f", "snap-", "€", "a b/c.d-e_f")
    (0 until rng.nextInt(8)).map(_ =>
      if (rng.nextBoolean()) specials(rng.nextInt(specials.size))
      else rng.alphanumeric.take(rng.nextInt(12)).mkString).mkString
  }

  private def randDouble(): Double = rng.nextInt(6) match {
    case 0 => -Double.MaxValue
    case 1 => Double.MaxValue
    case 2 => Double.MinPositiveValue
    case 3 => -0.0
    case 4 => rng.nextDouble() * 360 - 180
    case _ => java.lang.Double.longBitsToDouble(rng.nextLong()) match {
      case d if d.isNaN || d.isInfinite => 1.5 // excluded by contract
      case d => d
    }
  }

  private def randLong(): Long = rng.nextInt(4) match {
    case 0 => Long.MinValue
    case 1 => Long.MaxValue
    case _ => rng.nextLong()
  }

  test("manifest JSON round-trips 500 hostile FileEntry values exactly") {
    val entries = (0 until 500).map { _ =>
      FileEntry(randStr(), randLong(), randLong(), randLong(),
        randDouble(), randDouble(), randDouble(), randDouble(),
        randStr(), randLong(), if (rng.nextBoolean()) "data" else "delete",
        randLong())
    }
    val back = MetaJson.parseManifest(MetaJson.manifestJson(entries))
    assert(back.size == entries.size)
    back.zip(entries).foreach { case (b, e) =>
      // compare via raw bits so -0.0 vs 0.0 or any repr drift is caught
      def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)
      assert(b.path == e.path && b.lineageId == e.lineageId &&
        b.rows == e.rows && b.minZ == e.minZ && b.maxZ == e.maxZ &&
        b.wallMs == e.wallMs && b.kind == e.kind && b.seq == e.seq)
      assert(bits(b.minLat) == bits(e.minLat) && bits(b.maxLat) == bits(e.maxLat) &&
        bits(b.minLon) == bits(e.minLon) && bits(b.maxLon) == bits(e.maxLon),
        s"double drift: $e -> $b")
    }
  }

  test("hist / bloom / index / table-meta sidecar JSON round-trips exactly") {
    val cells = (0 until 300).map(_ => (randLong(), randLong()))
    assert(MetaJson.parseHist(MetaJson.histJson(cells)) == cells)

    val blooms = (0 until 5).map(_ =>
      (randStr(), Array.fill(rng.nextInt(64) + 1)(rng.nextLong())))
    val (kc, k, back) = MetaJson.parseBloom(MetaJson.bloomJson("id", 7, blooms))
    assert(kc == "id" && k == 7)
    assert(back.map(_._1) == blooms.map(_._1))
    back.zip(blooms).foreach { case ((_, a), (_, b)) => assert(a.sameElements(b)) }

    val files = (0 until 4).map(_ => (randStr(), (0 until rng.nextInt(20)).map(_ =>
      (randLong(), randLong(), randDouble(), randDouble(), randDouble(), randDouble()))))
    val (res, iBack) = MetaJson.parseIndex(MetaJson.indexJson(8, files))
    assert(res == 8 && iBack == files)

    assert(MetaJson.parseTableMeta(MetaJson.tableMetaJson("hilbert", 12, 8)) ==
      (("hilbert", 12, 8)))
  }

  test("manifest JSON is additively evolvable: old manifests missing new fields parse with safe defaults") {
    // round-4 ADVICE: a manifest written BEFORE a FileEntry field existed
    // must still parse after the field is added — same contract the legacy
    // parquet path gives kind/seq. Geometric stats default to the
    // fail-open full range (a pruner may only skip a file it can PROVE
    // disjoint; unknown stats must never skip).
    val minimal =
      """{"entries":[{"path":"data/u-0/part-0.parquet","rows":42}]}"""
    val Seq(e) = MetaJson.parseManifest(minimal)
    assert(e.path == "data/u-0/part-0.parquet" && e.rows == 42L)
    assert(e.minZ == Long.MinValue && e.maxZ == Long.MaxValue)
    assert(e.minLat == -Double.MaxValue && e.maxLat == Double.MaxValue)
    assert(e.minLon == -Double.MaxValue && e.maxLon == Double.MaxValue)
    assert(e.kind == "data" && e.seq == 0L && e.lineageId == "" && e.wallMs == 0L)
    // unknown EXTRA fields from a future writer are ignored, not fatal
    val future =
      """{"entries":[{"path":"p","rows":1,"kind":"delete","seq":9,"futureField":{"x":1}}]}"""
    val Seq(f) = MetaJson.parseManifest(future)
    assert(f.kind == "delete" && f.seq == 9L)
  }

  test("manifest-list shard rows round-trip lineage summaries; absent summaries stay UNKNOWN, not empty") {
    import graft.table.ShardMeta
    val withLin = ShardMeta("snap-3-shard-0-ab.json", 7, -5L, 9L,
      -10.0, 20.0, -30.0, 40.0, lineages = Some(Seq("u-0", "del-0")))
    val noLin = ShardMeta("snap-3-shard-1-ab.json", 2, 10L, 99L,
      21.0, 50.0, 41.0, 80.0, lineages = None)
    val json = MetaJson.manifestListJson(Seq(withLin, noLin), Seq.empty)
    val (back, _) = MetaJson.parseManifestRoot(json)
    assert(back == Seq(withLin, noLin))
    // the distinction matters downstream: Some(xs) is authoritative
    // (committedLineage reads the root alone), None forces a full parse —
    // a default-to-empty would silently claim "no lineages here" and
    // re-append committed streaming units as duplicates
    assert(back.head.lineages.contains(Seq("u-0", "del-0")))
    assert(back(1).lineages.isEmpty)
  }
}
