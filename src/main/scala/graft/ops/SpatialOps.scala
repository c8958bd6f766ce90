package graft.ops

import graft.data.Fixtures
import graft.geo.{CellId, GeoCols, MBR, Poly}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spatial operators over a point DataFrame with columns (id, lat, lon).
  *
  * Design (SURVEY.md §2 ops #9–#14, §4.3): all paths are declarative
  * Column expressions Catalyst can push down and codegen; the grid cell id
  * is the global pruning/partitioning key (the distributed replacement for
  * the reference's MBR subtree prune, RStarTree.java:426). At 100 TB the
  * input is a stored table whose files carry cell-range stats (see
  * [[graft.table.SnapshotStore]]) so the same cell conjuncts prune files;
  * here points are derived on the fly and the conjuncts prune row groups
  * after scan.
  */
object SpatialOps {

  /** Sentinel for "resolve the resolution adaptively" — every pruning-only
    * op defaults to it. Callers with an oracle-pinned or stored-layout r
    * pass it explicitly. */
  val AutoRes: Int = -1

  /** Expected rows per covering cell the adaptive pick aims for: the
    * candidate-join granularity knob. 64 keeps refine fan-in small while
    * the covering-budget guard bounds broadcast/enumeration size. At 10¹²
    * rows this resolves to the MaxRes-capped fine grid — the distributed
    * analog of the reference growing tree depth with data
    * (RStarTree.java:205-222). */
  val TargetRowsPerCell: Long = 64L

  /** Upper bound on the total covering-cell count a single query's
    * geometry may enumerate/broadcast (matches pipJoin's isin budget). */
  val MaxCoverCells: Long = 4096L

  /** Plan-time row estimate with ZERO scans or actions: Catalyst's
    * size-in-bytes statistic over the optimized plan, divided by the
    * schema's default row width. Order-of-magnitude accuracy is enough —
    * the adaptive resolution moves one level per 4× row change. Stored
    * tables have an exact manifest count ([[graft.table.SnapshotStore
    * .totalRows]]); callers holding one pass r (or a hint) explicitly. */
  def estimateRows(df: DataFrame): Long = {
    // streaming frames cannot be planned as a batch (optimizedPlan would
    // throw) and their size is unbounded anyway: treat them as infinite —
    // the covering budget alone then picks the resolution
    if (df.isStreaming) return Long.MaxValue
    val width = math.max(1, df.schema.map(_.dataType.defaultSize).sum)
    val stats = df.queryExecution.optimizedPlan.stats
    // Catalyst stats are BigInt and exceed Long.MaxValue for join plans of
    // stat-less relations; a raw .toLong WRAPS, clamping the estimate to 1
    // and giving the COARSEST grid to exactly the largest inputs — cap
    // instead of truncating
    def capped(b: BigInt): Long = b.min(BigInt(Long.MaxValue)).toLong
    stats.rowCount.map(capped)
      .getOrElse(capped(stats.sizeInBytes / width))
      .max(1L)
  }

  /** Resolve the covering resolution for a query: refine with data size
    * (rows-per-cell target), then coarsen until the query geometry's total
    * covering stays inside the enumeration budget. Results are r-invariant
    * for every op that uses this (pruning + exact refine), proven in spec;
    * only the plan shape changes. */
  def resolveRes(points: DataFrame, geoms: Seq[MBR], rOverride: Int,
                 target: Long = TargetRowsPerCell,
                 coverBudget: Long = MaxCoverCells): Int =
    if (rOverride >= 0) rOverride
    else pickRes(estimateRows(points), geoms, target, coverBudget)

  /** Stored-table resolution pick: the snapshot manifest carries an EXACT
    * live-row count (zero scans — [[graft.table.SnapshotStore.totalRows]]),
    * so queries over a stored table skip the size-in-bytes estimate:
    * {{{
    * val r = SpatialOps.resolveRes(store, boxes.map(_._2))
    * SpatialOps.boxJoin(store.read(Some(box))._1, boxes, r)
    * }}} */
  def resolveRes(store: graft.table.SnapshotStore, geoms: Seq[MBR]): Int =
    pickRes(store.totalRows, geoms)

  /** Pure core of [[resolveRes]] — unit-testable without a SparkSession. */
  def pickRes(rowEstimate: Long, geoms: Seq[MBR],
              target: Long = TargetRowsPerCell,
              coverBudget: Long = MaxCoverCells): Int = {
    var r = CellId.pickResolution(rowEstimate, target)
    while (r > 0 && geoms.map(CellId.coverCount(_, r)).sum > coverBudget) r -= 1
    r
  }

  def withCell(points: DataFrame, r: Int): DataFrame =
    points.withColumn("cell", GeoCols.cellCol(col("lat"), col("lon"), r))

  /** Box range query (op #9): exact inclusive predicate + covering-cell
    * conjunct. The cell conjunct is redundant for correctness but is the
    * scale path: on a cell-clustered stored table it prunes files/row
    * groups before the scan. */
  def rangeBox(points: DataFrame, b: MBR, r: Int = AutoRes): DataFrame = {
    val rr = resolveRes(points, Seq(b), r)
    points.filter(GeoCols.cellBoxPredicate(col("lat"), col("lon"), rr,
        CellId.cellY(b.minLat, rr), CellId.cellY(b.maxLat, rr),
        CellId.cellX(b.minLon, rr), CellId.cellX(b.maxLon, rr)))
      .filter(GeoCols.inBox(col("lat"), col("lon"), b))
      .select(col("id"), col("lat"), col("lon"))
  }

  /** Serial-baseline range scan (op #12): the same predicate with pruning
    * disabled — the degenerate plan the reference times in
    * Benchmark.java:331-380. */
  def rangeBoxSerial(points: DataFrame, b: MBR): DataFrame =
    points.filter(GeoCols.inBox(col("lat"), col("lon"), b))
      .select(col("id"), col("lat"), col("lon"))

  /** Point lookup by id range (op #3): Catalyst pushes the id predicate to
    * the scan — the engine analog of DataFile.readRecord. */
  def pointLookup(points: DataFrame, lo: Long, hi: Long): DataFrame =
    points.filter(col("id") >= lo && col("id") <= hi)
      .select(col("id"), col("lat"), col("lon"))

  /** Tile assignment (north-rule raster↔vector op): every row → exactly one
    * cell at resolution r. Deterministic, partitioning-independent. */
  def tileAssign(points: DataFrame, r: Int = Fixtures.TileRes): DataFrame =
    withCell(points, r).select(col("id"), col("cell"))

  /** Per-tile histogram: partial+final hash aggregate (map-side combine is
    * free from Spark); the skew-detection input for salting decisions. */
  def tileHistogram(points: DataFrame, r: Int = Fixtures.TileRes): DataFrame =
    withCell(points, r).groupBy("cell").agg(count(lit(1)).as("cnt"))

  /** Tile pyramid: per-cell counts at EVERY resolution 0..rMax — the
    * multi-resolution raster rollup a tile server precomputes. ONE pass
    * over the data builds the finest histogram; each coarser level rolls
    * up the previous HISTOGRAM (≤ 4^r rows) via parent-cell arithmetic,
    * so the data is scanned once and the rollups touch aggregates only.
    * Output: (r, cell, cnt). */
  def tilePyramid(points: DataFrame, rMax: Int = Fixtures.TileRes): DataFrame = {
    val base = tileHistogram(points, rMax).withColumn("r", lit(rMax))
    val levels = Iterator.iterate((base, rMax)) { case (child, rc) =>
      // parent of row-major cell at rc: (y>>1)·n(rc−1) + (x>>1)
      val y = floor(col("cell") / lit(CellId.n(rc))).cast("long")
      val x = pmod(col("cell"), lit(CellId.n(rc)))
      val parent = child
        .select((floor(y / 2).cast("long") * lit(CellId.n(rc - 1)) +
          floor(x / 2).cast("long")).as("cell"), col("cnt"))
        .groupBy("cell").agg(sum(col("cnt")).as("cnt"))
        .withColumn("r", lit(rc - 1))
      (parent, rc - 1)
    }.take(rMax + 1).map(_._1).toSeq
    levels.reduce(_ unionAll _).select(col("r"), col("cell"), col("cnt"))
  }

  /** Brute-force kNN (op #13): d² sort + limit — Spark plans
    * TakeOrderedAndProject (per-partition top-k, driver merge), already the
    * scalable plan. Deterministic (d², id) tie-break (the reference's PQ
    * tie order is nondeterministic, so parity compares distance multisets). */
  def knnSerial(points: DataFrame, qLat: Double, qLon: Double, k: Int): DataFrame = {
    val d2 = GeoCols.d2(col("lat"), col("lon"), qLat, qLon)
    val ranked = points.withColumn("d2", d2)
      .orderBy(col("d2"), col("id"))
      .limit(k)
    // rank assigned after the top-k so the window sees only k rows
    ranked.withColumn("rank",
      row_number().over(Window.orderBy(col("d2"), col("id"))).cast("long"))
      .select(col("rank"), col("id"), col("lat"), col("lon"), col("d2"))
  }

  /** Expanding-ring kNN (op #10): the distributed Hjaltason–Samet
    * equivalent. Probe growing square rings of cells around the query until
    * the kth candidate distance is provably below the unprobed-region lower
    * bound (ring guarantee), then emit the exact top-k from the probed set.
    * Driver-side iteration over plain Catalyst plans — no custom Strategy;
    * each probe is a cell-pruned filter + TakeOrderedAndProject.
    */
  def knnRing(points: DataFrame, qLat: Double, qLon: Double, k: Int,
              rOverride: Int = AutoRes): DataFrame = {
    val r = resolveRes(points, Seq.empty, rOverride)
    val zPts = points
      .withColumn("d2", GeoCols.d2(col("lat"), col("lon"), qLat, qLon))
    val qy = CellId.cellY(qLat, r); val qx = CellId.cellX(qLon, r)
    val hi = CellId.n(r) - 1
    val minStep = math.min(CellId.latStep(r), CellId.lonStep(r))
    // predicate for the cell box of half-width w around the query cell —
    // a four-comparison rectangle check, never an O(w²) IN list
    def boxPred(w: Long): Column = GeoCols.cellBoxPredicate(col("lat"), col("lon"), r,
      math.max(0L, qy - w), math.min(hi, qy + w),
      math.max(0L, qx - w), math.min(hi, qx + w))

    // geometric half-width growth: ≤ log2(2^r) probe jobs total (vs one
    // job per ring), each a cell-pruned filter + TakeOrderedAndProject
    var w = 1L
    var done = false
    while (!done && w < hi) {
      val top = zPts.filter(boxPred(w)).orderBy(col("d2"), col("id")).limit(k)
        .agg(count(lit(1)).as("n"), max(col("d2")).as("dk")).collect()(0)
      val n = top.getLong(0)
      val dk = if (top.isNullAt(1)) Double.MaxValue else top.getDouble(1)
      // unprobed points sit ≥ w cell-steps away from the query point
      val guarantee = w * minStep
      if (n >= k && dk < guarantee * guarantee) done = true
      else w *= 2
    }
    val cand = if (w >= hi) zPts else zPts.filter(boxPred(w))
    cand.orderBy(col("d2"), col("id")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("d2"), col("id"))).cast("long"))
      .select(col("rank"), col("id"), col("lat"), col("lon"), col("d2"))
  }

  /** Default single-point kNN (op #10): index-seeded one-job path when a
    * [[graft.index.GlobalIndex]] exists (one driver-side radius bound from
    * broadcast summaries → one pruned Spark job), expanding-ring probe
    * otherwise. */
  def knn(points: DataFrame, index: Option[graft.index.GlobalIndex],
          qLat: Double, qLon: Double, k: Int,
          r: Int = AutoRes): DataFrame = index match {
    case Some(gi) => graft.index.GlobalIndex.knnIndexed(points, gi, qLat, qLon, k,
      if (r >= 0) r else resolveRes(points, Seq.empty, r))
    case None     => knnRing(points, qLat, qLon, k, r)
  }

  /** Radius sweep (Benchmark.java:126-154 as a query): counts of points
    * inside square boxes of growing half-width around a center — ONE scan,
    * conditional aggregates (the reference re-scans per radius × 100 reps).
    * Output: a single row, one count per radius. */
  def radiusSweep(points: DataFrame, cLat: Double, cLon: Double,
                  radii: Seq[Double]): DataFrame = {
    val aggs = radii.zipWithIndex.map { case (rr, i) =>
      sum(when(GeoCols.inBox(col("lat"), col("lon"),
        MBR(cLat - rr, cLon - rr, cLat + rr, cLon + rr)), 1L).otherwise(0L))
        .as(s"cnt_$i")
    }
    points.agg(aggs.head, aggs.tail: _*)
  }

  /** 2-D skyline, minimize (lat, lon) (op #11/#14). Two-phase
    * skyline-of-skylines: a PER-PARTITION local sweep prunes to a small
    * candidate set with ZERO shuffles of the input (each partition sorts
    * and sweeps its own rows — any point dominated within a partition is
    * dominated globally), then the exact sweep runs on the few survivors.
    * The sweep-vs-dominance equivalence mirrors RStarTree.java:527-543.
    *
    * r6 optimization (measured): the round-1 formulation paid a distinct
    * (full shuffle) plus a hash-bucketed window (second full shuffle)
    * before any pruning. Both are redundant: the sweep itself drops
    * duplicates (an equal (lat, lon) never satisfies the strict
    * lon < min-so-far test), and a storage partition prunes at least as
    * well as a random hash bucket — so the local phase is a
    * sortWithinPartitions + per-partition running-min kernel with no
    * exchange at all. */
  def skyline(points: DataFrame): DataFrame = {
    import points.sparkSession.implicits._
    def sweep(df: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec): DataFrame =
      df.withColumn("__m", min(col("lon")).over(
          w.orderBy(col("lat"), col("lon"))
            .rowsBetween(Window.unboundedPreceding, -1)))
        .filter(col("__m").isNull || col("lon") < col("__m"))
        .drop("__m")
    val local = points.select(col("lat"), col("lon"))
      .sortWithinPartitions(col("lat"), col("lon"))
      .as[(Double, Double)]
      .mapPartitions { it =>
        // running strict-min sweep over (lat, lon)-sorted rows: keep a row
        // iff its lon is strictly below every earlier lon — the exact
        // per-bucket window filter of the old formulation, kernel-form
        var m = Double.MaxValue
        var first = true
        it.filter { case (_, lon) =>
          val keep = first || lon < m
          first = false
          if (lon < m) m = lon
          keep
        }
      }
      .toDF("lat", "lon")
    sweep(local, Window.partitionBy()) // survivors are few → single task is fine
  }

  /** Multi-box spatial join (the de-facto join in Benchmark.java:101-118):
    * boxes → covering cells, broadcast hash join on the point's cell, exact
    * refine. Each point has exactly one cell and covering cells are
    * distinct, so no post-join dedup is needed. Scale path: the probe side
    * never shuffles (broadcast), and the cell conjunct prunes files on a
    * stored cell-clustered table. */
  def boxJoin(points: DataFrame, boxes: Seq[(Int, MBR)],
              rOverride: Int = AutoRes): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val r = resolveRes(points, boxes.map(_._2), rOverride)
    val cells = boxes.flatMap { case (bid, b) =>
      CellId.cover(b, r).map(c => (bid, c, b.minLat, b.minLon, b.maxLat, b.maxLon))
    }.toDF("box_id", "bcell", "minlat", "minlon", "maxlat", "maxlon")
    withCell(points, r)
      .join(broadcast(cells), col("cell") === col("bcell"))
      .filter(col("lat") >= col("minlat") && col("lat") <= col("maxlat") &&
              col("lon") >= col("minlon") && col("lon") <= col("maxlon"))
      .select(col("box_id"), col("id"))
  }

  /** MBR-intersection join — the R-tree SPATIAL JOIN, with RECTANGLE sets
    * on BOTH sides: the reference's `MBR.overlaps` test (MBR.java:47, the
    * predicate its range query applies per index node, RStarTree.java:426)
    * lifted to a first-class distributed operator. PBSM shape: each
    * rectangle replicates to every grid cell its box overlaps (a 2-D
    * `sequence` explode — bounded, since [[resolveRectRes]] matches the
    * cell edge to the larger side's MEAN rect edge and caps the sampled
    * max rect at [[MaxCoverCells]]), the two sides EQUI-join on the cell (a
    * hash-partitioned shuffle join — never a cartesian), the exact
    * closed-box overlap predicate refines, and the REFERENCE-POINT rule
    * deduplicates with zero extra shuffles: a qualifying pair is emitted
    * only in the one cell containing the intersection's lower-left corner
    * (that corner lies inside both rects, so its cell is in both covers —
    * each pair meets there exactly once). Scale: shuffle volume =
    * replication factor × input, and [[resolveRectRes]] keeps the factor
    * single-digit by matching cell edge to the measured mean rect edge;
    * output ∝ true result size; hot cells split by AQE skew-join on the
    * equi-key. */
  def mbrJoin(a: DataFrame, b: DataFrame,
              rOverride: Int = AutoRes): DataFrame = {
    require(rOverride == AutoRes ||
      (rOverride >= 0 && rOverride <= CellId.MaxRes),
      s"rOverride must be AutoRes or in [0, ${CellId.MaxRes}], got $rOverride")
    val r = if (rOverride != AutoRes) rOverride else resolveRectRes(a, b)
    rectCover(a, "a", r).join(rectCover(b, "b", r),
        col("a_cell") === col("b_cell"))
      .filter(rectOverlapAndRef(r))
      .select(col("a_id"), col("b_id"))
  }

  /** Grid-cell cover of a rect side for the PBSM joins: prefix the columns,
    * 2-D `sequence` explode over the clamped cell-index ranges, cell id. */
  private def rectCover(df: DataFrame, p: String, r: Int): DataFrame =
    df.select(col("id").as(s"${p}_id"),
        col("minlat").as(s"${p}_minlat"), col("minlon").as(s"${p}_minlon"),
        col("maxlat").as(s"${p}_maxlat"), col("maxlon").as(s"${p}_maxlon"))
      .select(col("*"), explode(sequence(
        GeoCols.cellYIdx(col(s"${p}_minlat"), r),
        GeoCols.cellYIdx(col(s"${p}_maxlat"), r))).as(s"${p}_y"))
      .select(col("*"), explode(sequence(
        GeoCols.cellXIdx(col(s"${p}_minlon"), r),
        GeoCols.cellXIdx(col(s"${p}_maxlon"), r))).as(s"${p}_x"))
      .withColumn(s"${p}_cell",
        col(s"${p}_y") * lit(CellId.n(r)) + col(s"${p}_x"))

  /** Post-cell-join refine for the PBSM joins: exact closed-box overlap +
    * the reference-point rule (emit only in the cell holding the
    * intersection's lower-left corner). */
  private def rectOverlapAndRef(r: Int): Column = {
    val refCell =
      GeoCols.cellYIdx(greatest(col("a_minlat"), col("b_minlat")), r) *
        lit(CellId.n(r)) +
        GeoCols.cellXIdx(greatest(col("a_minlon"), col("b_minlon")), r)
    col("a_minlat") <= col("b_maxlat") &&
      col("b_minlat") <= col("a_maxlat") &&
      col("a_minlon") <= col("b_maxlon") &&
      col("b_minlon") <= col("a_maxlon") &&
      col("a_cell") === refCell
  }

  /** Skew-aware MBR-intersection join — [[boxJoinSalted]]'s treatment for
    * the rect×rect family, where BOTH sides are row-borne so the hot-cell
    * replication must itself be a plan (a conditional `explode`, not a
    * driver-side Seq). Side a's hot-cell cover rows get a deterministic
    * salt (xxhash64(a_id) — reproducible), side b's hot-cell cover rows
    * replicate across all salts; cold cells keep salt 0, so there is NO
    * blowup off the hot set. Exactly-once survives salting: a pair's
    * reference cell is unique, and within it the a-row carries exactly one
    * salt, which side b's replication is guaranteed to cover. Output is
    * identical to [[mbrJoin]] (spec-proven on a hotspot cloud); AQE's
    * skew split handles residual imbalance. Hot cells come from the hint
    * (write-time stats — zero extra scans) or one histogram pass over EACH
    * side's cover (a b-only hot cell is real skew too). Mechanism
    * asymmetry to know: salting splits a hot cell's a×b work product
    * F ways, but the effective parallelism in a cell is bounded by the
    * number of a rows there — pass the heavier side as `a`. */
  def mbrJoinSalted(a: DataFrame, b: DataFrame,
                    rOverride: Int = AutoRes, saltFactor: Int = 8,
                    hotThreshold: Double = 0.05,
                    hotCells: Option[(Int, Set[Long])] = None): DataFrame = {
    validateSaltArgs(rOverride, saltFactor, hotCells)
    val r = hotCells.map(_._1).getOrElse(
      if (rOverride != AutoRes) rOverride else resolveRectRes(a, b))
    val ca = rectCover(a, "a", r)
    val cb = rectCover(b, "b", r)
    // Hint-free skew detection in ONE action (r6 optimization; the
    // round-5 ADVICE flagged this path at ~3 cover scans per side):
    // both sides' cover histograms ride one side-tagged union, each
    // side's total joins back as a broadcast 2-row aggregate, and only
    // the hot cells reach the driver. The per-side thresholds are
    // exactly [[hotCellsFromHistogram]]'s semantics — a b-only hot cell
    // is real skew too.
    val hot: Set[Long] = hotCells.map(_._2).getOrElse {
      val histBoth = ca.select(col("a_cell").as("cell"), lit(0).as("side"))
        .unionAll(cb.select(col("b_cell").as("cell"), lit(1).as("side")))
        .groupBy(col("side"), col("cell")).agg(count(lit(1)).as("cnt"))
      // per-side totals as a broadcast 2-row aggregate joined back —
      // distributed at any histogram size (no single-task window)
      val tots = histBoth.groupBy(col("side")).agg(sum(col("cnt")).as("tot"))
      histBoth.join(broadcast(tots), "side")
        .filter(col("cnt") > col("tot") * lit(hotThreshold))
        .select(col("cell")).distinct()
        .collect().map(_.getLong(0)).toSet
    }
    val saltedA = ca.withColumn("a_salt",
      saltCol(col("a_id"), col("a_cell"), hot, saltFactor))
    val saltedB =
      if (hot.isEmpty) cb.withColumn("b_salt", lit(0))
      else cb.select(col("*"), explode(
        when(col("b_cell").isInCollection(hot),
          sequence(lit(0), lit(saltFactor - 1)))
          .otherwise(array(lit(0)))).as("b_salt"))
    saltedA.join(saltedB,
        col("a_cell") === col("b_cell") && col("a_salt") === col("b_salt"))
      .filter(rectOverlapAndRef(r))
      .select(col("a_id"), col("b_id"))
  }

  /** Shared argument guard for the salted joins. A write-time hot-cell
    * hint carries the resolution it was keyed at — cell ids from different
    * resolutions coincide numerically, so a mismatched hint would salt
    * random cells and skip the genuinely hot one: the hint's r WINS and
    * must agree with an explicit rOverride. saltFactor < 1 would NULL the
    * salt key (non-ANSI pmod) and silently drop every hot-cell pair; an
    * out-of-range rOverride would feed CellId bit-shifts garbage. */
  private def validateSaltArgs(rOverride: Int, saltFactor: Int,
                               hotCells: Option[(Int, Set[Long])]): Unit = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    require(rOverride == AutoRes ||
      (rOverride >= 0 && rOverride <= CellId.MaxRes),
      s"rOverride must be AutoRes or in [0, ${CellId.MaxRes}], got $rOverride")
    require(hotCells.forall(h => rOverride < 0 || h._1 == rOverride),
      s"hot-cell hint keyed at r=${hotCells.get._1} but rOverride=$rOverride")
  }

  /** Deterministic per-row salt for the salted joins: hash bucket in hot
    * cells, 0 in cold ones (no blowup off the hot set). */
  private def saltCol(idCol: Column, cellCol: Column, hot: Set[Long],
                      saltFactor: Int): Column =
    if (hot.isEmpty) lit(0)
    else when(cellCol.isInCollection(hot),
      pmod(xxhash64(idCol), lit(saltFactor)).cast("int")).otherwise(lit(0))

  /** Adaptive grid pick for RECTANGLE-valued sides — the [[resolveRes]]
    * analog when the geometry lives in rows rather than plan literals.
    * Because the edge distribution is data, the pick deliberately runs
    * ONE narrow aggregate over a side-tagged union at plan-construction
    * time (one tiny job — the one place the zero-action pick convention
    * of [[estimateRows]] cannot apply; the join itself rescans
    * everything, so the stats pass is negligible). Stats stay PER SIDE
    * (grouped by the tag): a pooled sample would let one side's
    * distribution mask the other's. The pick is the finest r whose cell edge still covers the
    * LARGER side's mean edge — replication blows up only when cell edge ≪
    * rect edge, so the coarser of the two per-side picks bounds
    * replication to ~4 cells/rect on BOTH sides (the smaller side's rects
    * land in ~1 cell; selectivity coarsens, exactness never — results are
    * r-invariant, spec-pinned). An outlier guard then coarsens until the
    * observed MAX edge covers ≤ [[MaxCoverCells]] cells, so one
    * near-world-spanning rect cannot explode the cover. */
  private[graft] def resolveRectRes(a: DataFrame, b: DataFrame): Int = {
    // per-side (meanLat, meanLon, maxLat, maxLon) edge stats from ONE
    // action: a side-tagged union aggregated by side. One narrow
    // aggregate replaces the two per-side jobs of round 5 (each action's
    // driver planning cost matched its execution at bench scale), and the
    // max is now computed over the FULL side rather than a 65536-row
    // partition-order prefix — the round-5 ADVICE blind spot where a
    // world-spanning rect beyond the prefix escaped the outlier guard
    // and exploded the 2-D sequence cover. Full-side narrow aggregates
    // are negligible next to the join's own rescan (method doc above).
    def edges(df: DataFrame, side: Int): DataFrame =
      df.select(lit(side).as("side"),
        (col("maxlat") - col("minlat")).as("elat"),
        (col("maxlon") - col("minlon")).as("elon"))
    val stats = edges(a, 0).unionAll(edges(b, 1))
      .groupBy(col("side"))
      .agg(avg(col("elat")), avg(col("elon")),
        max(col("elat")), max(col("elon")))
      .collect().toSeq
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    if (stats.isEmpty) return Fixtures.MbrJoinRes // both sides empty
    val eLat = math.max(stats.map(_._1).max, 1e-9)
    val eLon = math.max(stats.map(_._2).max, 1e-9)
    var r = 0
    while (r < CellId.MaxRes &&
      CellId.latStep(r + 1) >= eLat && CellId.lonStep(r + 1) >= eLon) r += 1
    // outlier guard: a span of length L crosses at most floor(L/step)+2
    // cells per axis — coarsen until the sampled max rect stays inside the
    // pickRes cover budget
    val mLat = stats.map(_._3).max
    val mLon = stats.map(_._4).max
    def worstCover(rr: Int): Long =
      (math.floor(mLat / CellId.latStep(rr)).toLong + 2L) *
        (math.floor(mLon / CellId.lonStep(rr)).toLong + 2L)
    while (r > 0 && worstCover(r) > MaxCoverCells) r -= 1
    r
  }


  /** Point-in-polygon join (north-rule op): per-polygon covering-cell prune
    * + even–odd ray-crossing refine, all as codegen'd Column predicates
    * (GeoCols.stContains). Polygons are plan literals → zero shuffles,
    * zero broadcast state, and — r6 optimization — ONE scan of the corpus
    * regardless of polygon count: each row evaluates every polygon's
    * (cover-membership AND ray-crossing) test lazily inside one
    * projection and explodes to the matching poly ids (guide §1.2: the
    * round-1 union-of-branches form re-scanned the corpus once PER
    * polygon — same per-row predicate work, p× the I/O). Row sets are
    * identical (spec + shared oracle); plans with MANY literal polygons
    * belong on [[pipJoinBroadcast]] either way (also the codegen-size
    * story: one projection carries all polys' edge tests). */
  def pipJoin(points: DataFrame, polys: Seq[(Int, Poly)],
              rOverride: Int = AutoRes): DataFrame = {
    val r = resolveRes(points, polys.map(_._2.bbox), rOverride)
    val cellPts = withCell(points, r)
    val hits = polys.map { case (pid, p) =>
      val cover = CellId.coverPoly(p, r) // exact cover: notch cells pruned
      val pruned =
        if (cover.size <= MaxCoverCells) col("cell").isin(cover: _*)
        else lit(true)
      when(pruned && GeoCols.stContains(p, col("lat"), col("lon")), lit(pid))
    }
    cellPts
      .select(explode(array(hits: _*)).as("poly_id"), col("id"))
      .filter(col("poly_id").isNotNull)
      .select(col("poly_id"), col("id"))
  }

  /** Polygon rasterization (vector→raster — the inverse of [[tileAssign]],
    * closing the north rule's raster↔vector pair in both directions):
    * every cell at resolution r whose CENTER lies inside the polygon.
    * Runs as a distributed `spark.range` over the polygon's bbox cell box
    * (candidate count = bbox area in cells — independent of any data
    * table's size) filtered by the same codegen'd even–odd ray-crossing
    * predicate the PIP join refines with, evaluated at cell centers:
    * zero shuffles, zero scans, no driver-side enumeration. At a fine
    * target raster (r=15 → up to 10⁹ candidates for a continent-sized
    * polygon) the range stage partitions across executors like any other
    * narrow pipeline. Output: (poly_id, cell) with row-major cell ids. */
  def rasterize(spark: org.apache.spark.sql.SparkSession,
                polys: Seq[(Int, Poly)],
                r: Int = Fixtures.RasterRes): DataFrame = {
    polys.map { case (pid, p) =>
      val b = p.bbox
      val y0 = CellId.cellY(b.minLat, r); val y1 = CellId.cellY(b.maxLat, r)
      val x0 = CellId.cellX(b.minLon, r); val x1 = CellId.cellX(b.maxLon, r)
      val nx = x1 - x0 + 1
      val cand = spark.range((y1 - y0 + 1) * nx)
        .select((lit(y0) + floor(col("id") / lit(nx)).cast("long")).as("y"),
                (lit(x0) + pmod(col("id"), lit(nx))).as("x"))
      // cell-center arithmetic — identical IEEE op order to the oracle SQL
      val cLat = (col("y").cast("double") + lit(0.5)) * lit(CellId.latStep(r)) - lit(90.0)
      val cLon = (col("x").cast("double") + lit(0.5)) * lit(CellId.lonStep(r)) - lit(180.0)
      cand.filter(GeoCols.stContains(p, cLat, cLon))
        .select(lit(pid).as("poly_id"),
          (col("y") * lit(CellId.n(r)) + col("x")).as("cell"))
    }.reduce(_ unionAll _)
  }

  /** Many-polygon rasterization (the scale path when polygons number in
    * the thousands — the [[pipJoinBroadcast]] twin of [[rasterize]]):
    * polygons as DATA rows (poly_id, ring array, bbox cell bounds),
    * candidate cells generated data-side with two explode(sequence(...))
    * levels (rows then cols — fan-out per intermediate row stays one bbox
    * edge, never the full area), refined by the same even–odd crossing
    * test over the ring ARRAY as the broadcast PIP join. One narrow
    * pipeline regardless of polygon count; at scale the polygon table
    * arrives partitioned and the raster parallelizes with it. Exact same
    * output as [[rasterize]] (spec + shared oracle). */
  def rasterizeMany(spark: org.apache.spark.sql.SparkSession,
                    polys: Seq[(Int, Poly)],
                    r: Int = Fixtures.RasterRes): DataFrame = {
    import spark.implicits._
    val polyRows = polys.map { case (pid, p) =>
      val b = p.bbox
      (pid, p.ring.map { case (la, lo) => (la, lo) },
        CellId.cellY(b.minLat, r), CellId.cellY(b.maxLat, r),
        CellId.cellX(b.minLon, r), CellId.cellX(b.maxLon, r))
    }
    val polysDf = polyRows.toDF("poly_id", "ring", "y0", "y1", "x0", "x1")
      .repartition(spark.sparkContext.defaultParallelism, col("poly_id"))
    val cLat = (col("y").cast("double") + lit(0.5)) * lit(CellId.latStep(r)) - lit(90.0)
    val cLon = (col("x").cast("double") + lit(0.5)) * lit(CellId.lonStep(r)) - lit(180.0)
    polysDf
      .withColumn("y", explode(sequence(col("y0"), col("y1"))))
      .withColumn("x", explode(sequence(col("x0"), col("x1"))))
      .filter(ringCrossings(cLat, cLon) % 2 === 1)
      .select(col("poly_id"), (col("y") * lit(CellId.n(r)) + col("x")).as("cell"))
  }

  /** Even–odd crossing count of a data-side polygon `ring` column
    * (array<struct<lat,lon>>) against a point expression — shared by the
    * broadcast PIP join and many-polygon rasterization. HOF lambdas run
    * interpreted; acceptable here because the candidate row count is
    * already pruned (covering cells / bbox area), never the corpus. */
  private def ringCrossings(latC: Column, lonC: Column): Column = {
    val n = size(col("ring"))
    def vy(i: Column) = element_at(col("ring"), i).getField("_1")
    def vx(i: Column) = element_at(col("ring"), i).getField("_2")
    size(filter(sequence(lit(1), n), i => {
      val j = when(i === 1, n).otherwise(i - 1)
      ((vy(i) > latC) =!= (vy(j) > latC)) &&
        (lonC < (vx(j) - vx(i)) * (latC - vy(i)) / (vy(j) - vy(i)) + vx(i))
    }))
  }

  /** Zonal statistics (raster↔vector analytics): per-polygon aggregates of
    * the points inside — count, exact integer id-sum, and the bounding
    * range of matched coordinates. Same covering-cell prune + ray-crossing
    * refine as [[pipJoin]], but each polygon's rows collapse map-side into
    * a single partial-aggregate row (Spark's partial+final hash agg), so
    * the shuffle carries ONE row per polygon per partition regardless of
    * data size. Exactly one output row per polygon (empty zones surface
    * with cnt=0 and null extrema, matching the SQL aggregate contract). */
  def zonalStats(points: DataFrame, polys: Seq[(Int, Poly)],
                 rOverride: Int = AutoRes): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val r = resolveRes(points, polys.map(_._2.bbox), rOverride)
    val cellPts = withCell(points, r)
    // ONE scan for every polygon (r6, same fusion as [[pipJoin]]): the
    // matching poly ids explode out of one lazily-evaluated projection
    // and collapse in a partial+final hash aggregate — the exchange still
    // carries one row per polygon per partition. The tiny literal polygon
    // list left-joins back so empty zones keep their cnt=0/null-extrema
    // row (the SQL aggregate contract the per-branch form gave for free).
    val hits = polys.map { case (pid, p) =>
      val cover = CellId.coverPoly(p, r)
      val pruned =
        if (cover.size <= MaxCoverCells) col("cell").isin(cover: _*)
        else lit(true)
      when(pruned && GeoCols.stContains(p, col("lat"), col("lon")), lit(pid))
    }
    val agged = cellPts
      .select(explode(array(hits: _*)).as("poly_id"), col("id"),
        col("lat"), col("lon"))
      .filter(col("poly_id").isNotNull)
      .groupBy(col("poly_id"))
      .agg(count(lit(1)).as("cnt"), sum(col("id")).as("sum_id"),
        min(col("lat")).as("min_lat"), max(col("lat")).as("max_lat"),
        min(col("lon")).as("min_lon"), max(col("lon")).as("max_lon"))
    polys.map(_._1).toDF("poly_id")
      .join(broadcast(agged), Seq("poly_id"), "left")
      .select(col("poly_id"), coalesce(col("cnt"), lit(0L)).as("cnt"),
        col("sum_id"), col("min_lat"), col("max_lat"),
        col("min_lon"), col("max_lon"))
  }

  /** Many-polygon zonal statistics (the [[pipJoinBroadcast]]-shaped scale
    * path of [[zonalStats]]): polygons as broadcast DATA, one corpus scan,
    * partial aggregation on the poly_id key — the exchange carries one row
    * per polygon per partition. Unlike the literal-plan variant, empty
    * zones produce NO row (a join cannot manufacture them); callers
    * needing the every-polygon contract outer-join the polygon table. */
  def zonalStatsMany(points: DataFrame, polys: Seq[(Int, Poly)],
                     rOverride: Int = AutoRes): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val r = resolveRes(points, polys.map(_._2.bbox), rOverride)
    val polyRows = polys.flatMap { case (pid, p) =>
      val ring = p.ring.map { case (la, lo) => (la, lo) }
      CellId.coverPoly(p, r).map(c => (pid, c, ring))
    }
    val polysDf = polyRows.toDF("poly_id", "pcell", "ring")
    withCell(points, r)
      .join(broadcast(polysDf), col("cell") === col("pcell"))
      .filter(ringCrossings(col("lat"), col("lon")) % 2 === 1)
      .groupBy(col("poly_id"))
      .agg(count(lit(1)).as("cnt"), sum(col("id")).as("sum_id"),
        min(col("lat")).as("min_lat"), max(col("lat")).as("max_lat"),
        min(col("lon")).as("min_lon"), max(col("lon")).as("max_lon"))
  }

  /** Skew-aware box join for shuffle-partitioned execution: when the small
    * side does NOT fit in a broadcast (huge box/polygon sets), the join
    * shuffles both sides on the cell key and hot cells (a Zipf point cloud,
    * or the planted-hotspot image table) overload single reducers. This
    * variant measures the cell histogram, picks cells holding more than
    * `hotThreshold` of the rows, and salts them: the point side gets a
    * deterministic salt in [0, saltFactor) (xxhash64(id) — reproducible),
    * the box side replicates hot-cell entries across all salts. Cold cells
    * keep salt 0 — no blowup. Output is identical to [[boxJoin]] (proven in
    * spec); AQE's skew-join split handles residual imbalance.
    */
  def boxJoinSalted(points: DataFrame, boxes: Seq[(Int, MBR)],
                    rOverride: Int = AutoRes, saltFactor: Int = 8,
                    hotThreshold: Double = 0.05,
                    hotCells: Option[(Int, Set[Long])] = None): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    validateSaltArgs(rOverride, saltFactor, hotCells)
    val r = hotCells.map(_._1)
      .getOrElse(resolveRes(points, boxes.map(_._2), rOverride))
    val pts = withCell(points, r)
    // Hot-cell stats belong at WRITE time (SnapshotStore manifests /
    // tileHistogram persisted with the table — see hotCellsFromHistogram);
    // callers pass them in and the join plan adds ZERO extra scans. The
    // fallback computes them here with ONE aggregate pass (histogram →
    // driver; total derived from the histogram, not a second count scan).
    val hot: Set[Long] = hotCells.map(_._2).getOrElse(hotCellsFromHistogram(
      pts.groupBy("cell").agg(count(lit(1)).as("cnt")), hotThreshold))
    val cells = boxes.flatMap { case (bid, b) =>
      CellId.cover(b, r).flatMap { c =>
        val salts = if (hot.contains(c)) 0 until saltFactor else Seq(0)
        salts.map(s => (bid, c, s, b.minLat, b.minLon, b.maxLat, b.maxLon))
      }
    }.toDF("box_id", "bcell", "bsalt", "minlat", "minlon", "maxlat", "maxlon")
    val salted = pts.withColumn("salt",
      saltCol(col("id"), col("cell"), hot, saltFactor))
    salted.join(cells,
        col("cell") === col("bcell") && col("salt") === col("bsalt"))
      .filter(col("lat") >= col("minlat") && col("lat") <= col("maxlat") &&
              col("lon") >= col("minlon") && col("lon") <= col("maxlon"))
      .select(col("box_id"), col("id"))
  }

  /** Derive the salted-join hot-cell set from a per-cell histogram (a
    * persisted [[tileHistogram]] output, or a cover histogram built in the
    * hint-free salted-join paths). Schema contract: `cell` must be LongType
    * and `cnt` any numeric type (explicitly cast to long for the total, so
    * a double-counted histogram degrades to truncation, never a cast
    * error). The threshold filter runs IN SPARK — only the ≤ 1/hotThreshold
    * hot cells ever reach the driver, never the full histogram (at fine
    * resolutions that is up to 4^MaxRes rows) — and the total joins back
    * as a broadcast 1-row aggregate, so the whole derivation is ONE
    * action (it was two narrow aggregates through round 5; each action's
    * driver-side planning cost matched its execution at bench scale). */
  def hotCellsFromHistogram(hist: DataFrame, hotThreshold: Double = 0.05): Set[Long] = {
    val h = hist.select(col("cell"), col("cnt").cast("long").as("cnt"))
    // total as a broadcast 1-row aggregate joined back — distributed at
    // any histogram size (a global window would funnel the histogram
    // through one task); an empty histogram yields tot = null, the
    // comparison is null ⇒ no row survives ⇒ empty set
    val tot = h.agg(sum(col("cnt")).as("tot"))
    h.crossJoin(broadcast(tot))
      .filter(col("cnt") > col("tot") * lit(hotThreshold))
      .select(col("cell")).collect().map(_.getLong(0)).toSet
  }

  /** kNN join (op #10 batched): small query set broadcast against the point
    * cloud; per-query top-k via window. The cross join is map-side only
    * (broadcast nested loop); the window shuffles |Q|·N candidate rows —
    * acceptable for small Q. Scale path for large Q: cell-ring candidate
    * pruning before the window (see KnnJoinPruned below). */
  def knnJoin(points: DataFrame, queries: Seq[(Int, Double, Double)],
              k: Int): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val q = queries.toDF("q_id", "qlat", "qlon")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(GeoCols.d2Cols(col("lat"), col("lon"), col("qlat"), col("qlon")), col("id"))
    points.crossJoin(broadcast(q))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("id"))
  }

  /** Many-polygon PIP join (the scale path when polygons number in the
    * thousands and per-polygon literal plans stop making sense): polygons
    * as DATA — (poly_id, ring array<struct<lat,lon>>) exploded to covering
    * cells, broadcast, hash-joined on the point's cell, then refined with
    * an even–odd crossing test over the ring ARRAY via HOF expressions
    * (size(filter(sequence...))) — still UDF-free and codegen-eligible,
    * one scan regardless of polygon count. Exact same semantics as
    * [[pipJoin]] (proven in spec). */
  def pipJoinBroadcast(points: DataFrame, polys: Seq[(Int, Poly)],
                       rOverride: Int = AutoRes): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val r = resolveRes(points, polys.map(_._2.bbox), rOverride)
    val polyRows = polys.flatMap { case (pid, p) =>
      val ring = p.ring.map { case (la, lo) => (la, lo) }
      CellId.coverPoly(p, r).map(c => (pid, c, ring))
    }
    val polysDf = polyRows.toDF("poly_id", "pcell", "ring")
    // edge i pairs ring[i+1] with ring[i] (1-based element_at), wrapping
    // the last edge to ring[1]; identical arithmetic to Poly.contains
    // (ringCrossings — shared with rasterizeMany).
    withCell(points, r)
      .join(broadcast(polysDf), col("cell") === col("pcell"))
      .filter(ringCrossings(col("lat"), col("lon")) % 2 === 1)
      .select(col("poly_id"), col("id"))
  }

  /** Dense kNN join (the documented baseline): every |Q|·N distance is
    * computed, reduced to k candidates per query per partition BEFORE the
    * exchange, exact global top-k after — the shuffle carries at most
    * |Q|·k·partitions rows.
    *
    * Kernel form (r6 optimization, measured): the round-4 bounded-heap Aggregator
    * formulation materialized the |Q|·N crossJoin and pushed every pair
    * through the Dataset encoder into a typed ObjectHashAggregate —
    * 4.2 s for 7.2M pairs at sf0.1. This per-partition primitive loop
    * computes the same distances over decoded (id, lat, lon) rows into
    * flat per-query bounded arrays (the partial top-k), then ranks the
    * ≤ |Q|·k·partitions survivors with one tiny window — identical
    * output (same (d2, id) ordering; spec-pinned vs the window plan). */
  def knnJoinAgg(points: DataFrame, queries: Seq[(Int, Double, Double)],
                 k: Int): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val qIds = queries.map(_._1).toArray
    val qLat = queries.map(_._2).toArray
    val qLon = queries.map(_._3).toArray
    val partials = points.select(col("id"), col("lat"), col("lon"))
      .as[(Long, Double, Double)]
      .mapPartitions { it =>
        val nq = qIds.length
        // per-query k slots, flat: candidate replaces the cached worst
        // only when strictly better by (d2, id) — O(1) reject, O(k)
        // worst-rescan only on accept (accepts are O(k·log N) per query)
        val d2s = Array.fill(nq * k)(Double.MaxValue)
        val ids = Array.fill(nq * k)(Long.MaxValue)
        val size = new Array[Int](nq)
        val worst = new Array[Int](nq)
        def recomputeWorst(q: Int): Unit = {
          var w = q * k
          var i = w + 1
          while (i < q * k + k) {
            if (d2s(i) > d2s(w) || (d2s(i) == d2s(w) && ids(i) > ids(w))) w = i
            i += 1
          }
          worst(q) = w
        }
        it.foreach { case (id, la, lo) =>
          var q = 0
          while (q < nq) {
            val dla = la - qLat(q)
            val dlo = lo - qLon(q)
            val d2 = dla * dla + dlo * dlo
            if (size(q) < k) {
              val slot = q * k + size(q)
              d2s(slot) = d2; ids(slot) = id
              size(q) += 1
              if (size(q) == k) recomputeWorst(q)
            } else {
              val w = worst(q)
              if (d2 < d2s(w) || (d2 == d2s(w) && id < ids(w))) {
                d2s(w) = d2; ids(w) = id
                recomputeWorst(q)
              }
            }
            q += 1
          }
        }
        (0 until nq).iterator.flatMap { q =>
          (0 until size(q)).iterator.map { i =>
            (qIds(q), d2s(q * k + i), ids(q * k + i))
          }
        }
      }
      .toDF("q_id", "d2", "id")
    val w = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("id"))
    partials
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("id"))
  }

  /** Ring-pruned kNN join (the scale path for large query sets): instead
    * of |Q|·N candidate pairs, each query joins only points whose cell
    * falls within `rings` Chebyshev rings of the query's cell, then takes
    * per-query top-k. EXACT when every query finds >= k candidates whose
    * kth distance is below the probed-region guarantee — the operator
    * verifies that invariant and falls back to the dense join for the few
    * queries that fail it (none, on non-degenerate data at sane `rings`). */
  def knnJoinPruned(points: DataFrame, queries: Seq[(Int, Double, Double)],
                    k: Int, rOverride: Int = AutoRes, rings: Int = 2): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val r = resolveRes(points, Seq.empty, rOverride)
    val qcells = queries.flatMap { case (qid, qla, qlo) =>
      (0L to rings.toLong).flatMap(CellId.ring(CellId.grid(qla, qlo, r), r, _))
        .map(c => (qid, qla, qlo, c))
    }.toDF("q_id", "qlat", "qlon", "qc")
    val d2 = GeoCols.d2Cols(col("lat"), col("lon"), col("qlat"), col("qlon"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("id"))
    // materialize the pruned top-k once (≤ |Q|·k rows, lineage kept so a
    // lost block recomputes): the exactness audit and the final output
    // both read it without re-running the join
    val pruned = withCell(points, r)
      .join(broadcast(qcells), col("cell") === col("qc"))
      .withColumn("d2", d2)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exactness check against the FULL query list (not just queries that
    // found candidates): a query whose ring cells are empty never appears
    // in `pruned` at all and must fall back to the dense join too
    val guarantee = rings * math.min(CellId.latStep(r), CellId.lonStep(r))
    val perQ = pruned.groupBy("q_id")
      .agg(count(lit(1)).as("n"), max(col("d2")).as("dk"))
      .collect().map(row => row.getInt(0) -> (row.getLong(1), row.getDouble(2))).toMap
    val bad = queries.map(_._1).filter { qid =>
      perQ.get(qid) match {
        case None           => true // zero candidates in the probed rings
        case Some((n, dk))  => n < k || dk >= guarantee * guarantee
      }
    }.toSet
    val exactPart = pruned.filter(!col("q_id").isin(bad.toSeq: _*))
      .select(col("q_id"), col("rank"), col("id"))
    val out =
      if (bad.isEmpty) exactPart
      else exactPart.unionAll(
        knnJoin(points, queries.filter(q => bad.contains(q._1)), k))
    // materialize the ≤|Q|·k output, then release the pruned cache —
    // repeated invocations in a long session must not accrue storage
    OpUtil.finish(out, pruned)
  }

  /** ε-distance join: all (probe, point) pairs within planar distance
    * `eps` — the spatial self-join the grid makes feasible at scale.
    * Resolution is chosen so one cell step ≥ eps, hence every partner of
    * a probe lies in the probe's 3×3 cell neighborhood: the probe side
    * explodes to ≤ 9 (cell, probe) rows, equi-joins the point side on its
    * single cell (one shuffle on a compact key, never all-pairs), then
    * the exact d² ≤ eps² refine runs on neighbors only. The probe subset
    * (id % probeMod == 0) is the oracle-checkable slice, as in
    * [[graft.ops.AnnOps.nearDupPairs]]; self-pairs are excluded. */
  def distanceJoin(points: DataFrame, eps: Double, probeMod: Int,
                   rOverride: Int = -1,
                   broadcastProbes: Boolean = true): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    // FINEST r whose cell step still covers eps in one ring (the
    // descending scan returns the largest qualifying r): maximum pruning
    // while the 3x3 neighborhood still guarantees every eps-pair
    val r =
      if (rOverride >= 0) rOverride
      else (CellId.MaxRes to 0 by -1).find(rr =>
        math.min(CellId.latStep(rr), CellId.lonStep(rr)) >= eps).getOrElse(0)
    val pts = withCell(points, r)
    val probes = pts.filter(pmod(col("id"), lit(probeMod)) === 0)
      .select(col("id").as("a_id"), col("lat").as("alat"), col("lon").as("alon"),
        col("cell").as("acell"))
    val hi = CellId.n(r) - 1
    // 3×3 neighborhood as cell ids: cell + {-1,0,1}·(n, 1) offsets, clipped
    // (SQL `/` is fractional — floor-cast for integer row index)
    val y = floor(col("acell") / lit(CellId.n(r))).cast("long")
    val x = pmod(col("acell"), lit(CellId.n(r)))
    val neighbors = array((for (dy <- -1 to 1; dx <- -1 to 1) yield {
      val ny = y + lit(dy.toLong); val nx = x + lit(dx.toLong)
      when(ny >= 0 && ny <= hi && nx >= 0 && nx <= hi, ny * lit(CellId.n(r)) + nx)
        .otherwise(lit(-1L))
    }): _*)
    val exploded = probes.withColumn("ncell", explode(neighbors))
      .filter(col("ncell") >= 0)
    val d2 = GeoCols.d2Cols(col("lat"), col("lon"), col("alat"), col("alon"))
    // default: hint the probe side (a slice × 9 — small by contract) so
    // the corpus never becomes the build side at real scale; callers with
    // a LARGE probe slice pass broadcastProbes=false and get a shuffle
    // join on the cell key instead of a forced over-limit broadcast
    val probeSide = if (broadcastProbes) broadcast(exploded) else exploded
    probeSide.join(pts, col("cell") === col("ncell"))
      .filter(col("a_id") =!= col("id"))
      .withColumn("d2", d2)
      .filter(col("d2") <= lit(eps * eps))
      .select(col("a_id"), col("id").as("b_id"), col("d2"))
  }

  /** Reference bulk-load packing (ops #7/#8): global sort by first
    * coordinate only (RStarTree.java:177 — deliberately NOT STR, to match
    * the reference), slabs of exactly `fanout` (RStarTree.java:189-200),
    * per-leaf MBR + count.
    *
    * PARITY-ONLY, single-task by construction: the unpartitioned
    * `Window.orderBy` below funnels every row through one task — the
    * exact price of the reference's global 1-D sort semantics, pinned
    * here so the oracle can check them. NEVER the production bulk load:
    * the engine path is [[graft.index.GlobalIndex.build]]'s
    * range-partitioned Z/Hilbert/STR pack (one distributed exchange,
    * per-partition packing), which scales with partitions. Run this op
    * only at oracle-fixture sizes. */
  def bulkloadLeaves(points: DataFrame, fanout: Int = Fixtures.PackFanout): DataFrame = {
    val w = Window.orderBy(col("lat"), col("id"))
    points.withColumn("leaf", ((row_number().over(w) - 1) / fanout).cast("long"))
      .groupBy("leaf").agg(
        count(lit(1)).as("cnt"),
        min(col("lat")).as("minlat"), max(col("lat")).as("maxlat"),
        min(col("lon")).as("minlon"), max(col("lon")).as("maxlon"))
  }

  /** Distributed index summary (op #4): per-coarse-cell root MBR +
    * cardinality — the broadcastable global-index payload
    * ([[graft.index.GlobalIndex]]), computed as one hash aggregate. */
  def indexSummary(points: DataFrame, r: Int): DataFrame =
    points.withColumn("grp", GeoCols.cellCol(col("lat"), col("lon"), r))
      .groupBy("grp").agg(
        count(lit(1)).as("cnt"),
        min(col("lat")).as("minlat"), max(col("lat")).as("maxlat"),
        min(col("lon")).as("minlon"), max(col("lon")).as("maxlon"))
}
