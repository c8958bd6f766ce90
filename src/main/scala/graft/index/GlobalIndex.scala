package graft.index

import graft.geo.{CellId, GeoCols, MBR}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-level distributed index (SURVEY.md §1.5): the *global* level is
  * this driver-side/broadcast structure — per-partition packed MBR
  * hierarchies ([[PartitionIndex]]) over a Z-order-clustered Dataset; the
  * *local* level is the clustering itself (parquet row-group min/max on a
  * stored table). Together they replace the reference's single-machine
  * IndexFile page tree.
  */
final case class GlobalIndex(resolution: Int, parts: Array[PartitionIndex]) {

  def totalRows: Long = parts.map(_.count).sum

  /** Partitions whose root MBR overlaps the box — the distributed subtree
    * prune (RStarTree.java:426). */
  def prunePartitions(box: MBR): Array[Int] =
    parts.filter(p => p.count > 0 && p.root.mbr.overlaps(box)).map(_.partitionId)

  /** Branch-and-bound kNN seed: walk leaf slabs in ascending max-distance
    * order, accumulate counts until >= k. Every point in a visited slab is
    * within that slab's maxDist, so the returned radius provably contains
    * >= k points — one driver-side pass over the broadcastable summary,
    * no Spark job (the distributed analog of the reference's PQ descent,
    * RStarTree.java:450-481). */
  // live leaf slabs, extracted ONCE: kNN JOINs call knnSeedRadius once
  // per query, and rebuilding this array per call is O(|Q| * slabs) driver
  // work at the 10^6-file design point (only the per-query distance keying
  // and sort genuinely depend on the query point)
  private lazy val liveSlabs: Array[(MBR, Long)] =
    parts.iterator.flatMap(_.leaves).filter(_.count > 0)
      .map(l => (l.mbr, l.count)).toArray

  def knnSeedRadius(qLat: Double, qLon: Double, k: Int): Double = {
    val slabs = liveSlabs.map { case (m, c) => (m.maxDistSq(qLat, qLon), c) }
      .sortBy(_._1)
    var acc = 0L
    var i = 0
    while (i < slabs.length) {
      acc += slabs(i)._2
      // nextUp: sqrt rounds to NEAREST, so an unpadded radius can sit half
      // an ulp BELOW the true bound — a point exactly at the slab's
      // maxDistSq then falls outside the ball box (missed candidate) and
      // rad*rad undershoots its d2 (measured: dk 39.21061000000006 vs rad²
      // 39.21060992…, a spurious audit fallback that read every file). One
      // ulp up guarantees rad ≥ √bound; the bound only widens, never wrong.
      if (acc >= k) return math.nextUp(math.sqrt(slabs(i)._1))
      i += 1
    }
    Double.MaxValue // fewer than k points exist: caller scans everything
  }
}

object GlobalIndex {

  /** Cluster the point DataFrame by Z-order cell (ONE shuffle — the same
    * single exchange the reference's bulkLoad sort is, RStarTree.java:177,
    * but 2-D-locality-preserving instead of lat-strips) and build the
    * per-partition index summaries in a single mapPartitions pass.
    * Returns (clustered-and-cached df, index). At 10^12 rows the clustered
    * df is the stored table ([[graft.table.SnapshotStore]] persists it and
    * the summaries ride in the snapshot manifest). */
  def build(points: DataFrame, r: Int = 10, numPartitions: Int = 0,
            fanout: Int = LocalRTree.DefaultFanout,
            curve: String = "z"): (DataFrame, GlobalIndex) = {
    val spark = points.sparkSession
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    // packing key — all three modes the north star names ("STR/Hilbert-
    // curve bulk-load packing"): Morton (default), Hilbert (consecutive
    // curve positions always grid-adjacent → tightest root MBRs), and STR
    // (lat strips at ~sqrt granularity, lon-ordered within — the classic
    // packed-R-tree layout; 2^(r/2) strips plays the role of its
    // √(n/fanout) strip count). The index works identically under any of
    // them — summaries are built from the clustered rows, not the key.
    val keyed = curve match {
      case "hilbert" => GeoCols.withHilbert(points, col("lat"), col("lon"), r, "__z")
      case "str" => points.withColumn("__z",
        GeoCols.strCol(col("lat"), col("lon"), math.max(1, r / 2), CellId.MaxRes))
      case "z" => points.withColumn("__z", GeoCols.zCol(col("lat"), col("lon"), r))
      case other => throw new IllegalArgumentException(
        s"unknown packing curve '$other' (want z | hilbert | str)")
    }
    val clustered = keyed
      .repartitionByRange(parts, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .cache()
    val summaries = clustered.select(col("lat"), col("lon"))
      .as[(Double, Double)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        Iterator.single(LocalRTree.pack(pid, it, fanout))
      }(org.apache.spark.sql.Encoders.kryo[PartitionIndex])
      .collect()
      .sortBy(_.partitionId)
    (clustered, GlobalIndex(r, summaries))
  }

  /** Rebuild the global index from a stored table's PERSISTED per-file
    * summaries — zero Spark jobs, no re-clustering: the leaf slabs were
    * computed by the write-time stats pass and ride next to the manifest
    * (SURVEY §1.5's "summaries ride in the snapshot manifest", the
    * distributed analog of the reference persisting its tree pages in
    * IndexFile.java:37-95 instead of rebuilding per process). Each live
    * data FILE becomes one PartitionIndex whose leaves are its per-cell
    * slabs at the store's stats resolution; a file written before the
    * sidecar existed falls back to its manifest MBR as a single leaf —
    * a coarser bound, never a wrong one.
    *
    * Caveat for count-based bounds ([[GlobalIndex.knnSeedRadius]]):
    * pending equality-delete tombstones make slab counts an OVERcount of
    * live rows, so [[knnStored]] re-audits its radius against the live
    * data before trusting it. */
  def fromStore(store: graft.table.SnapshotStore,
                fanout: Int = LocalRTree.DefaultFanout): GlobalIndex = {
    val live = store.manifest().filter(e => e.path.nonEmpty && e.kind == "data")
    val leavesByFile = store.indexLeaves()
    val parts = live.sortBy(_.path).zipWithIndex.map { case (e, i) =>
      val leaves = leavesByFile.get(
          graft.table.SnapshotStore.normalizePath(e.path)) match {
        case Some(ls) if ls.nonEmpty =>
          ls.sortBy(_._1).map { case (_, n, la0, la1, lo0, lo1) =>
            IndexNode(0, la0, lo0, la1, lo1, n)
          }.toArray
        case _ =>
          Array(IndexNode(0, e.minLat, e.minLon, e.maxLat, e.maxLon, e.rows))
      }
      LocalRTree.fromLeaves(i, leaves, fanout)
    }.toArray
    GlobalIndex(store.statsRes, parts)
  }

  /** Exact kNN over a STORED table, planned from the persisted index
    * summaries: one driver-side radius bound ([[GlobalIndex.knnSeedRadius]]
    * over [[fromStore]]'s zero-scan index) → a manifest-pruned box read
    * (files wholly outside the radius never open — the file-level subtree
    * prune, RStarTree.java:426) → exact top-k. The index build cost is
    * amortized to WRITE time; the query pays only the pruned scan.
    *
    * Exactness audit: sidecar counts may overcount live rows under pending
    * tombstones, so the bound is re-verified against the candidates
    * (count ≥ k and kth distance ≤ radius²); a failed audit falls back to
    * the full-table scan — superset-then-refine, never a wrong answer. */
  def knnStored(store: graft.table.SnapshotStore,
                qLat: Double, qLon: Double, k: Int): DataFrame =
    knnStoredPruned(store, qLat, qLon, k)._1

  /** [[knnStored]] + the observed (files read, total files) of the read
    * that actually produced the result, so specs can assert file skipping
    * on the query path (a fallback reports the full read's counts, never
    * the pruned read it abandoned). */
  private[graft] def knnStoredPruned(store: graft.table.SnapshotStore,
                                     qLat: Double, qLon: Double,
                                     k: Int): (DataFrame, Int, Int) = {
    val gi = fromStore(store)
    val radius = gi.knnSeedRadius(qLat, qLon, k)
    val (cand, kept, total) =
      if (radius == Double.MaxValue) store.read()
      else store.read(Some(MBR(qLat - radius, qLon - radius,
        qLat + radius, qLon + radius)))
    val spark = cand.sparkSession
    import spark.implicits._
    val d2c = GeoCols.d2(col("lat"), col("lon"), qLat, qLon)
    // ONE scan of the pruned files: collect the k candidate rows (k is
    // small by contract) and audit them driver-side — re-running the
    // top-k as a second job would double the query's cost
    val topk = cand.withColumn("d2", d2c)
      .orderBy(col("d2"), col("id")).limit(k)
      .select(col("id"), col("lat"), col("lon"), col("d2"))
      .as[(Long, Double, Double, Double)].collect()
    // an unbounded radius means `cand` was the FULL table — the collected
    // top-k is exact even with fewer than k live rows (the audit's
    // topk.length >= k would otherwise reject an already-exact answer and
    // pay the full scan a second time)
    val sound = topk.nonEmpty && (radius == Double.MaxValue ||
      (topk.length >= k && topk.last._4 <= radius * radius))
    if (sound)
      (topk.zipWithIndex.toSeq
        .map { case ((id, la, lo, d2), i) => ((i + 1).toLong, id, la, lo, d2) }
        .toDF("rank", "id", "lat", "lon", "d2"), kept, total)
    else {
      // tombstone overcounts shrank the radius below provability: pay the
      // full scan (superset-then-refine, never a wrong answer)
      val (full, fullKept, fullTotal) = store.read()
      (graft.ops.SpatialOps.knnSerial(full, qLat, qLon, k), fullKept, fullTotal)
    }
  }

  /** Exact kNN JOIN over a STORED table, planned from the persisted index
    * summaries (round-4 verdict ask #5 — [[knnStored]] generalized to a
    * query SET): one driver-side radius bound PER QUERY from the zero-scan
    * [[fromStore]] index → ONE multi-box manifest-pruned read over the
    * union of the query balls ([[graft.table.SnapshotStore.readBoxes]] —
    * files disjoint from every ball never open) → broadcast the tiny
    * (q_id, center, radius) set, join candidates to the queries whose box
    * contains them, per-query top-k window. Same output as
    * [[graft.ops.SpatialOps.knnJoinAgg]] (q_id, rank, id).
    *
    * Exactness: each query's candidates are a superset of its radius box,
    * and the seed radius provably bounds the kth distance — re-audited per
    * query against the live rows (count ≥ k, kth distance ≤ radius²)
    * because tombstones make sidecar counts an overcount; failed queries
    * fall back to the dense join over the full table, never a wrong
    * answer. */
  def knnJoinStored(store: graft.table.SnapshotStore,
                    queries: Seq[(Int, Double, Double)], k: Int): DataFrame =
    knnJoinStoredPruned(store, queries, k)._1

  /** The executed candidate plan of [[knnJoinStored]], pre-audit:
    * broadcast nested-loop on the box containment predicate (the query
    * side is tiny by contract; the candidate side is already pruned to the
    * union of the balls — the |Q|-scale equi-join twin is
    * SpatialOps.knnJoinPruned, this operator's point is the FILE skip),
    * then the per-query top-k window. ONE definition shared with
    * PlanDump's plan evidence, so docs/PLANS.md can never silently
    * describe a plan the operator no longer executes.
    * `bounds` = (q_id, qLat, qLon, radius). */
  private[graft] def knnJoinCandidatePlan(cand: DataFrame,
      bounds: Seq[(Int, Double, Double, Double)], k: Int): DataFrame = {
    val spark = cand.sparkSession
    import spark.implicits._
    val q = bounds.toDF("q_id", "qlat", "qlon", "rad")
    val w = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("id"))
    cand.join(broadcast(q),
        col("lat") >= col("qlat") - col("rad") &&
        col("lat") <= col("qlat") + col("rad") &&
        col("lon") >= col("qlon") - col("rad") &&
        col("lon") <= col("qlon") + col("rad"))
      .withColumn("d2", GeoCols.d2Cols(col("lat"), col("lon"),
        col("qlat"), col("qlon")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** [[knnJoinStored]] + the observed (files read, total files) so specs
    * can assert file skipping on the join path. */
  private[graft] def knnJoinStoredPruned(store: graft.table.SnapshotStore,
                                         queries: Seq[(Int, Double, Double)],
                                         k: Int): (DataFrame, Int, Int) = {
    require(queries.nonEmpty, "knnJoinStored needs at least one query")
    val gi = fromStore(store)
    val bounds = queries.map { case (qid, qla, qlo) =>
      (qid, qla, qlo, gi.knnSeedRadius(qla, qlo, k))
    }
    if (bounds.exists(_._4 == Double.MaxValue)) {
      // fewer than k rows in the summaries: no ball bounds anything —
      // the dense join over the full table IS the plan
      val (full, kept, total) = store.read()
      return (graft.ops.SpatialOps.knnJoinAgg(full, queries, k), kept, total)
    }
    val boxes = bounds.map { case (_, qla, qlo, rad) =>
      MBR(qla - rad, qlo - rad, qla + rad, qlo + rad)
    }
    val (cand, kept, total) = store.readBoxes(boxes)
    val pruned = knnJoinCandidatePlan(cand, bounds, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perQ = pruned.groupBy("q_id")
      .agg(count(lit(1)).as("n"), max(col("d2")).as("dk"),
        first(col("rad")).as("rad"))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val bad = queries.map(_._1).filter { qid =>
      perQ.get(qid) match {
        case None                => true // ball held zero live rows
        case Some((n, dk, rad))  => n < k || dk > rad * rad
      }
    }.toSet
    val exactPart = pruned.filter(!col("q_id").isin(bad.toSeq: _*))
      .select(col("q_id"), col("rank"), col("id"))
    // on fallback the reported counts must describe the EXECUTED plan, not
    // the pruned read the audit abandoned (knnStoredPruned's contract): a
    // prune assert against a tombstone-degraded store would otherwise pass
    // while the query scanned every file
    val (out, keptOut, totalOut) =
      if (bad.isEmpty) (exactPart, kept, total)
      else {
        val (full, fKept, fTotal) = store.read()
        (exactPart.unionAll(graft.ops.SpatialOps.knnJoinAgg(
          full, queries.filter(qq => bad.contains(qq._1)), k)), fKept, fTotal)
      }
    (graft.ops.OpUtil.finish(out, pruned), keptOut, totalOut)
  }

  /** Index-seeded exact kNN: one driver-side bound from the summary, ONE
    * Spark job over the pruned cell ring (vs. the iterative probe loop of
    * SpatialOps.knnRing). Exact: the seed radius provably contains >= k
    * points and every cell within it is probed. */
  def knnIndexed(clustered: DataFrame, gi: GlobalIndex,
                 qLat: Double, qLon: Double, k: Int,
                 r: Int = graft.data.Fixtures.JoinRes): DataFrame = {
    val radius = gi.knnSeedRadius(qLat, qLon, k)
    val d2 = GeoCols.d2(col("lat"), col("lon"), qLat, qLon)
    val cand =
      if (radius == Double.MaxValue) clustered
      else {
        val minStep = math.min(CellId.latStep(r), CellId.lonStep(r))
        val w = math.ceil(radius / minStep).toLong + 1
        val qy = CellId.cellY(qLat, r); val qx = CellId.cellX(qLon, r)
        val hi = CellId.n(r) - 1
        // seed box as a rectangle predicate (4 comparisons) — never an
        // O(w²) IN list, planner-cheap at any radius/resolution; on a
        // stored table the same box prunes files via manifest Z ranges
        clustered.filter(GeoCols.cellBoxPredicate(col("lat"), col("lon"), r,
          math.max(0L, qy - w), math.min(hi, qy + w),
          math.max(0L, qx - w), math.min(hi, qx + w)))
      }
    cand.withColumn("d2", d2)
      .orderBy(col("d2"), col("id"))
      .limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(col("d2"), col("id"))).cast("long"))
      .select(col("rank"), col("id"), col("lat"), col("lon"), col("d2"))
  }
}
