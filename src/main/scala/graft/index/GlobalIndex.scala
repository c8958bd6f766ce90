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
  def knnSeedRadius(qLat: Double, qLon: Double, k: Int): Double = {
    val slabs = parts.iterator.flatMap(_.leaves).filter(_.count > 0)
      .map(l => (l.mbr.maxDistSq(qLat, qLon), l.count)).toArray.sortBy(_._1)
    var acc = 0L
    var i = 0
    while (i < slabs.length) {
      acc += slabs(i)._2
      if (acc >= k) return math.sqrt(slabs(i)._1)
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
    // packing key: Morton by default; Hilbert (north star: "STR/Hilbert-
    // curve bulk-load packing") yields tighter per-partition root MBRs
    // since consecutive curve positions are always grid-adjacent. The
    // index works identically either way — summaries are built from the
    // clustered rows, not from the key.
    val keyed = curve match {
      case "hilbert" => GeoCols.withHilbert(points, col("lat"), col("lon"), r, "__z")
      case _ => points.withColumn("__z", GeoCols.zCol(col("lat"), col("lon"), r))
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
