package graft

import graft.geo.{CellId, MBR, Poly}
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Pure-Scala geo-core tests. Property-style checks use a fixed-seed RNG
  * (deterministic, no scalatestplus bridge needed offline). */
class GeoSpec extends AnyFunSuite {

  private def rng = new Random(42)

  test("MBR algebra matches hand computations (MBR.java:27-100 semantics)") {
    val m = MBR(0.0, 0.0, 2.0, 3.0)
    assert(m.area == 6.0)
    assert(m.margin == 5.0)
    assert(m.contains(0.0, 0.0) && m.contains(2.0, 3.0)) // inclusive bounds
    assert(!m.contains(2.0000001, 3.0))
    assert(m.overlaps(MBR(2.0, 3.0, 5.0, 5.0)))  // edge touch counts
    assert(!m.overlaps(MBR(2.1, 3.1, 5.0, 5.0)))
    assert(m.union(MBR(-1.0, 1.0, 1.0, 4.0)) == MBR(-1.0, 0.0, 2.0, 4.0))
    assert(m.enlargement(MBR(-1.0, 0.0, 2.0, 3.0)) == 3.0)
    assert(m.minDistSq(0.0, 5.0) == 4.0)  // outside in lon only
    assert(m.minDistSq(1.0, 1.0) == 0.0)  // inside
    assert(m.minDistSq(4.0, 5.0) == 8.0)  // corner
  }

  test("cell codec round-trips; parent/children consistent") {
    val r0 = rng
    for (_ <- 1 to 2000) {
      val lat = r0.nextDouble() * 179.998 - 89.999
      val lon = r0.nextDouble() * 359.998 - 179.999
      val r = r0.nextInt(13)
      val c = CellId.grid(lat, lon, r)
      assert(c >= 0 && c < CellId.n(r) * CellId.n(r))
      assert(CellId.mbr(c, r).contains(lat, lon))
      if (r > 0) assert(CellId.children(CellId.parent(c, r), r - 1).contains(c))
    }
  }

  test("covering set is exact: point in box => cell in cover") {
    val r0 = rng
    for (_ <- 1 to 300) {
      val a = r0.nextDouble() * 178 - 89; val c = r0.nextDouble() * 178 - 89
      val b = r0.nextDouble() * 358 - 179; val d = r0.nextDouble() * 358 - 179
      val box = MBR(math.min(a, c), math.min(b, d), math.max(a, c), math.max(b, d))
      val r = 1 + r0.nextInt(6)
      val cover = CellId.cover(box, r).toSet
      for (_ <- 1 to 20) {
        val pla = box.minLat + r0.nextDouble() * (box.maxLat - box.minLat)
        val plo = box.minLon + r0.nextDouble() * (box.maxLon - box.minLon)
        assert(cover.contains(CellId.grid(pla, plo, r)))
      }
    }
  }

  test("morton round-trip (full 32-bit inputs, spread/squash documented range)") {
    val r0 = rng
    for (_ <- 1 to 5000) {
      val y = r0.nextLong() & 0xFFFFFFFFL
      val x = r0.nextLong() & 0xFFFFFFFFL
      val z = CellId.morton(y, x)
      assert(CellId.mortonY(z) == y && CellId.mortonX(z) == x, s"y=$y x=$x")
    }
    // the exact boundary the old squash mask corrupted: bits 16-31 set
    val y = 0xFFFF0000L; val x = 0x00010000L
    assert(CellId.mortonY(CellId.morton(y, x)) == y)
    assert(CellId.mortonX(CellId.morton(y, x)) == x)
  }

  test("zRangesForBox covers exactly the box's cells (ascending, disjoint)") {
    val r0 = rng
    for (r <- Seq(3, 5); _ <- 1 to 20) {
      val hi = CellId.n(r) - 1
      val y0 = math.abs(r0.nextLong()) % (hi + 1); val y1 = math.min(hi, y0 + math.abs(r0.nextLong()) % 7)
      val x0 = math.abs(r0.nextLong()) % (hi + 1); val x1 = math.min(hi, x0 + math.abs(r0.nextLong()) % 7)
      // (r=8 exhaustive check below would be 65k cells × 20 reps — r≤5 keeps it fast)
      val ranges = CellId.zRangesForBox(y0, y1, x0, x1, r)
      // ascending + disjoint (no adjacent-mergeable seams)
      ranges.sliding(2).foreach { case Seq((_, h), (l, _)) => assert(h + 1 < l) case _ => () }
      val inRanges = (z: Long) => ranges.exists { case (lo, hiR) => z >= lo && z <= hiR }
      for (y <- 0L to hi; x <- 0L to hi) {
        val inBox = y >= y0 && y <= y1 && x >= x0 && x <= x1
        assert(inRanges(CellId.morton(y, x)) == inBox, s"r=$r box=($y0..$y1,$x0..$x1) cell=($y,$x)")
      }
    }
  }

  test("zRangesForBox maxRanges coalesce stays a superset covering") {
    val r = 8
    val ranges = CellId.zRangesForBox(10, 200, 17, 230, r, maxRanges = 16)
    assert(ranges.size <= 16)
    val r0 = rng
    for (_ <- 1 to 2000) {
      val y = 10 + math.abs(r0.nextLong()) % 191
      val x = 17 + math.abs(r0.nextLong()) % 214
      val z = CellId.morton(y, x)
      assert(ranges.exists { case (lo, hi) => z >= lo && z <= hi })
    }
  }

  test("ring cells are exactly the Chebyshev-distance-k cells") {
    val r = 4
    val c = CellId.grid(10.0, 20.0, r)
    val cy = CellId.gridY(c, r); val cx = CellId.gridX(c, r)
    for (k <- 0L to 3L) {
      val ring = CellId.ring(c, r, k).toSet
      val expect = (for {
        y <- (cy - k) to (cy + k); x <- (cx - k) to (cx + k)
        if math.max(math.abs(y - cy), math.abs(x - cx)) == k
        if y >= 0 && y < CellId.n(r) && x >= 0 && x < CellId.n(r)
      } yield y * CellId.n(r) + x).toSet
      assert(ring == expect, s"k=$k")
    }
  }

  test("ring near grid edge clips out-of-grid cells") {
    val r = 3
    val corner = CellId.grid(-89.9, -179.9, r) // cell (0,0)
    assert(CellId.ring(corner, r, 1).size == 3)
    assert(CellId.ring(corner, r, 2).size == 5)
  }

  test("polygon containment: convex fixture agrees with half-plane test") {
    val poly = graft.data.Fixtures.polyConvex._2
    def halfPlane(lat: Double, lon: Double): Boolean =
      poly.ring.indices.forall { i =>
        val (y1, x1) = poly.ring(i)
        val (y2, x2) = poly.ring((i + 1) % poly.ring.length)
        (x2 - x1) * (lat - y1) - (y2 - y1) * (lon - x1) >= 0
      }
    val r0 = rng
    for (_ <- 1 to 5000) {
      val lat = r0.nextDouble() * 80 - 25
      val lon = r0.nextDouble() * 75 - 25
      assert(poly.contains(lat, lon) == halfPlane(lat, lon), s"($lat,$lon)")
    }
  }

  test("concave polygon: known inside/outside points") {
    val p = graft.data.Fixtures.polyConcave._2
    assert(p.contains(-50.0, 100.0))   // in the bottom bar
    assert(p.contains(-55.0, 70.0))    // in the bottom bar
    assert(p.contains(-30.0, 70.0))    // in the left column
    assert(!p.contains(-30.0, 100.0))  // in the notch (bbox yes, poly no)
    assert(!p.contains(0.0, 0.0))
    assert(p.bbox == MBR(-60.0, 60.0, -20.0, 120.0))
  }

  test("coverPoly: exact (point in poly => cell covered) and tighter than bbox") {
    val r0 = rng
    for ((_, p) <- graft.data.Fixtures.polys) {
      for (res <- 3 to 7) {
        val exact = CellId.coverPoly(p, res).toSet
        val bbox = CellId.cover(p.bbox, res).toSet
        assert(exact.subsetOf(bbox))
        // exactness: random points inside the polygon land in covered cells
        var found = 0
        for (_ <- 1 to 20000 if found < 500) {
          val la = p.bbox.minLat + r0.nextDouble() * (p.bbox.maxLat - p.bbox.minLat)
          val lo = p.bbox.minLon + r0.nextDouble() * (p.bbox.maxLon - p.bbox.minLon)
          if (p.contains(la, lo)) {
            found += 1
            assert(exact.contains(CellId.grid(la, lo, res)), s"($la,$lo) res=$res")
          }
        }
        assert(found > 100)
      }
      // the L-polygon's notch must actually prune at fine resolution
      if (p == graft.data.Fixtures.polyConcave._2) {
        val exact = CellId.coverPoly(p, 7).toSet
        val bbox = CellId.cover(p.bbox, 7).toSet
        assert(exact.size < bbox.size, "concave cover should beat bbox cover")
      }
    }
  }

  test("segment intersection basics") {
    import graft.geo.Poly.segmentsIntersect
    assert(segmentsIntersect((0, 0), (2, 2), (0, 2), (2, 0)))   // X cross
    assert(!segmentsIntersect((0, 0), (1, 0), (2, 0), (3, 0)))  // collinear apart
    assert(segmentsIntersect((0, 0), (2, 0), (1, 0), (3, 0)))   // collinear overlap
    assert(segmentsIntersect((0, 0), (2, 0), (2, 0), (2, 2)))   // endpoint touch
    assert(!segmentsIntersect((0, 0), (1, 1), (0, 1), (0.4, 0.6))) // near miss
  }

  test("pickResolution targets rows-per-cell") {
    assert(CellId.pickResolution(1000000000000L, 100000L) >= 10)
    assert(CellId.pickResolution(60000L, 100L) <= 6)
  }

  test("hilbertD: bijection, and consecutive positions are always grid-adjacent") {
    for (r <- Seq(2, 3, 5)) {
      val hi = CellId.n(r) - 1
      val cells = for (y <- 0L to hi; x <- 0L to hi) yield (CellId.hilbertD(y, x, r), (y, x))
      val byD = cells.toMap
      assert(byD.size == (hi + 1) * (hi + 1))                  // bijective
      assert(byD.keys.min == 0L && byD.keys.max == (hi + 1) * (hi + 1) - 1)
      // THE Hilbert property Morton lacks: curve step == one grid step
      for (d <- 0L until byD.keys.max) {
        val (y1, x1) = byD(d); val (y2, x2) = byD(d + 1)
        assert(math.abs(y1 - y2) + math.abs(x1 - x2) == 1, s"r=$r d=$d")
      }
    }
    // Morton violates adjacency at quadrant seams (documents why Hilbert
    // clusters tighter): count the violations to prove the contrast
    val r = 5; val hi = CellId.n(r) - 1
    val mByD = (for (y <- 0L to hi; x <- 0L to hi) yield (CellId.morton(y, x), (y, x))).toMap
    val mortonJumps = (0L until mByD.keys.max).count { d =>
      val (y1, x1) = mByD(d); val (y2, x2) = mByD(d + 1)
      math.abs(y1 - y2) + math.abs(x1 - x2) > 1
    }
    assert(mortonJumps > 300) // 1023 steps, ~1/3 jump
  }

  test("hilbertRangesForBox covers exactly the box's cells (ascending, disjoint)") {
    val r0 = rng
    for (r <- Seq(3, 5); _ <- 1 to 20) {
      val hi = CellId.n(r) - 1
      val y0 = math.abs(r0.nextLong()) % (hi + 1); val y1 = math.min(hi, y0 + math.abs(r0.nextLong()) % 7)
      val x0 = math.abs(r0.nextLong()) % (hi + 1); val x1 = math.min(hi, x0 + math.abs(r0.nextLong()) % 7)
      val ranges = CellId.hilbertRangesForBox(y0, y1, x0, x1, r)
      ranges.sliding(2).foreach { case Seq((_, h), (l, _)) => assert(h + 1 < l) case _ => () }
      val inRanges = (d: Long) => ranges.exists { case (lo, hiR) => d >= lo && d <= hiR }
      for (y <- 0L to hi; x <- 0L to hi) {
        val inBox = y >= y0 && y <= y1 && x >= x0 && x <= x1
        assert(inRanges(CellId.hilbertD(y, x, r)) == inBox,
          s"r=$r box=($y0..$y1,$x0..$x1) cell=($y,$x)")
      }
    }
  }

  test("hilbertRangesForBox maxRanges coalesce stays a superset covering") {
    val r = 8
    val ranges = CellId.hilbertRangesForBox(10, 200, 17, 230, r, maxRanges = 16)
    assert(ranges.size <= 16)
    val r0 = rng
    for (_ <- 1 to 2000) {
      val y = 10 + math.abs(r0.nextLong()) % 191
      val x = 17 + math.abs(r0.nextLong()) % 214
      val d = CellId.hilbertD(y, x, r)
      assert(ranges.exists { case (lo, hi) => d >= lo && d <= hi })
    }
  }

  test("hilbert needs fewer covering ranges than morton (the clustering win)") {
    val r = 10
    val r0 = rng
    var hTotal = 0L; var zTotal = 0L
    for (_ <- 1 to 30) {
      val hi = CellId.n(r) - 1
      val y0 = math.abs(r0.nextLong()) % (hi - 100)
      val x0 = math.abs(r0.nextLong()) % (hi - 100)
      val (y1, x1) = (y0 + 60 + math.abs(r0.nextLong()) % 40,
        x0 + 60 + math.abs(r0.nextLong()) % 40)
      hTotal += CellId.hilbertRangesForBox(y0, y1, x0, x1, r, maxRanges = 1 << 20).size
      zTotal += CellId.zRangesForBox(y0, y1, x0, x1, r, maxRanges = 1 << 20).size
    }
    assert(hTotal < zTotal, s"hilbert $hTotal vs morton $zTotal")
  }

  test("mergeRanges: covers the input union, sorted+disjoint, cap respected") {
    val rng = new scala.util.Random(7)
    for (trial <- 0 until 50) {
      val ranges = (0 until rng.nextInt(40) + 1).map { _ =>
        val lo = rng.nextLong(1000000)
        (lo, lo + rng.nextLong(5000))
      }
      val cap = rng.nextInt(8) + 2
      val merged = CellId.mergeRanges(ranges, cap)
      assert(merged.size <= cap, s"trial $trial: ${merged.size} > cap $cap")
      // sorted and disjoint (no overlap, not even adjacency)
      merged.sliding(2).foreach { w =>
        if (w.size == 2) assert(w(0)._2 + 1 < w(1)._1, s"trial $trial: $w")
      }
      // superset covering: every input value is inside some merged range
      ranges.foreach { case (lo, hi) =>
        Seq(lo, hi, (lo + hi) / 2).foreach { v =>
          assert(merged.exists(m => m._1 <= v && v <= m._2),
            s"trial $trial: $v from ($lo,$hi) uncovered")
        }
      }
    }
    assert(CellId.mergeRanges(Seq.empty) == Seq.empty)
    // adjacent ranges fold even under no pressure
    assert(CellId.mergeRanges(Seq((0L, 4L), (5L, 9L), (20L, 30L)), 512) ==
      Seq((0L, 9L), (20L, 30L)))
  }
}
