package graft.data

import graft.geo.{MBR, Poly}

/** Deterministic query fixtures (FIXTURES.md §3). Shared by the engine
  * queries in [[graft.SparkEntry]], the oracle SQL in
  * [[graft.oracle.OracleSql]], and the test suites — one definition, three
  * consumers, zero drift.
  *
  * The derived point cloud (see [[graft.oracle.OracleSql.pointsCte]])
  * spreads over the full lat ∈ [−90, 90) × lon ∈ [−180, 180) range, so
  * fixtures are sized in whole degrees.
  */
object Fixtures {

  /** Grid resolution for tile assignment (64×64 cells → ~15 rows/cell at
    * sf0.01; [[graft.geo.CellId.pickResolution]] picks the scale-out value). */
  val TileRes = 6

  /** Oracle-pinned covering resolution: the operators now pick r
    * adaptively by default ([[graft.ops.SpatialOps.resolveRes]]); this
    * constant remains the value the generated oracle SQL and the pinned-r
    * spec legs use. */
  val JoinRes = 5

  /** Multi-box spatial-join fixture — radius sweep in the spirit of
    * Benchmark.java:126 (R ∈ {0.002..0.1} scaled to the global point cloud). */
  val boxes: Seq[(Int, MBR)] = Seq(
    1 -> MBR(10.0, 30.0, 25.0, 60.0),
    2 -> MBR(-45.5, -120.25, -30.0, -90.0),
    3 -> MBR(60.0, 150.0, 75.5, 179.0),
    4 -> MBR(-5.0, -10.0, 5.0, 10.0),
    5 -> MBR(40.5979960, 22.9641400, 40.6029480, 22.9759960), // reference map.osm bounds
    6 -> MBR(-89.0, -179.0, -70.0, -150.0),
    7 -> MBR(33.125, -45.0, 33.5, -44.0),
    8 -> MBR(-20.0, 100.0, 30.0, 140.0))

  /** Demo.java:11-12's fixed range box (inclusive bounds). */
  val demoBox: MBR = MBR(40.5979960, 22.9641400, 40.6, 22.97)

  /** Rectangle-set derivation for the MBR-intersection join (q53, the
    * R-tree spatial join — MBR.java:47's overlaps test as a distributed
    * operator). Sparse id-modulus slices keep the oracle's rect × rect
    * inequality join tractable at sf0.01; half-extents are integer
    * arithmetic + ONE double division so the SQL twin is bit-identical.
    * hlat = (id % 97)/100.0 + 0.5 ∈ [0.5, 1.46]°, hlon likewise with 89. */
  val RectMod = 50
  val RectClassA = 0
  val RectClassB = 1
  val RectHalfLatMod = 97
  val RectHalfLonMod = 89

  /** Fallback grid resolution for the MBR-join cell cover (empty-input
    * case only — the live pick is [[graft.ops.SpatialOps.resolveRectRes]],
    * which matches cell edge to the measured mean rect edge). */
  val MbrJoinRes = 7

  /** Single-point kNN fixture (Demo.java:13-14 generalized to the global
    * cloud; k=25 exercises multi-ring expansion). */
  val knnPoint: (Double, Double) = (12.345, -67.89)
  val knnK: Int = 25

  /** kNN-join fixture: 12 query points, k=5 each. */
  val knnJoinK = 5
  val knnQueries: Seq[(Int, Double, Double)] =
    (0 until 12).map { i =>
      // deterministic integer arithmetic → exact doubles, same in SQL literals
      val lat = ((i * 37 + 11) % 160) - 80 + 0.5
      val lon = ((i * 83 + 29) % 340) - 170 + 0.25
      (i, lat, lon)
    }

  /** Radius sweep (Benchmark.java:126 R ∈ {0.002..0.1} scaled to the
    * global cloud) around the kNN fixture point. */
  val sweepRadii: Seq[Double] = Seq(0.5, 1.0, 2.0, 4.0, 8.0, 16.0)

  /** Convex pentagon (CCW) — PIP via half-planes or ray-crossing. */
  val polyConvex: (Int, Poly) = 1 -> Poly(Vector(
    (0.0, 0.0), (10.0, 40.0), (35.0, 45.0), (50.0, 15.0), (30.0, -20.0)))

  /** Concave (L-shaped) polygon — defeats bbox/half-plane shortcuts, needs
    * true even–odd crossing. */
  val polyConcave: (Int, Poly) = 2 -> Poly(Vector(
    (-60.0, 60.0), (-60.0, 120.0), (-40.0, 120.0), (-40.0, 90.0),
    (-20.0, 90.0), (-20.0, 60.0)))

  val polys: Seq[(Int, Poly)] = Seq(polyConvex, polyConcave)

  /** Raster resolution for polygon rasterization (vector→raster): 128×128
    * cells keeps the fixture polygons' coverings in the hundreds — enough
    * cells to exercise interior/edge/notch cases without an oracle blowup. */
  val RasterRes = 7

  /** Reference bulk-load fan-out (RStarTree.java:8 M=50). */
  val PackFanout = 50

  /** English stopword list for the text-quality / language-ID heuristics. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** n-gram Jaccard near-dup threshold (word 3-grams). */
  val jaccardThreshold = 0.2

  /** Repetition-ratio window (word trigrams — the Gopher dup-ngram size). */
  val repetitionK = 3

  /** Contamination check: docs with doc_id % benchMod == 0 stand in for
    * the benchmark corpus; overlap measured on word 5-gram shingles. */
  val benchMod = 97L
  val contamK = 5

  /** MinHash parameters: 32 hashes, 8 bands × 4 rows. */
  val minhashNum = 32
  val minhashBands = 8

  /** ε-distance-join fixture: probe subset id % 50, radius 0.5°. */
  val distEps = 0.5
  val distProbeMod = 50

  /** ANN fixtures: query vectors = embeddings with vec_id < 4, top-k. */
  val annQueryIds: Seq[Int] = Seq(0, 1, 2, 3)
  val annK = 10
}
