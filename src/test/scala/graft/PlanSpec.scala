package graft

import graft.data.{Fixtures, Points, Synth}
import graft.ops.SpatialOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions: the physical plans the scale story depends on.
  * These pin the *mechanism*, not just the result — a regression that
  * swaps a broadcast for a shuffle or un-pushes a filter fails here even
  * though results stay correct. */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("merge-on-read plan: tombstone scans bounded by applicable groups, data never duplicated") {
    import graft.table.SnapshotStore
    val st = new SnapshotStore(spark,
      java.nio.file.Files.createTempDirectory("graft_planspec").toString)
    val pts = Points(spark, dir)
    // 3 appends interleaved with 2 deletes → 3 sequence groups. Catalyst
    // pushes the anti-joins through the union, so a tombstone may be
    // scanned once per group it APPLIES to (d-0 → group 0 only; d-1 →
    // groups 0 and 1) — never more, and data files exactly once.
    st.append(pts.filter(col("id") % 3 === 0), "u-0", 1)
    st.deleteWhere(col("id") % 10 === 0, "d-0")
    st.append(pts.filter(col("id") % 3 === 1), "u-1", 1)
    st.deleteWhere(col("id") % 10 === 1, "d-1")
    st.append(pts.filter(col("id") % 3 === 2), "u-2", 1)
    val m = st.manifest()
    val delPaths = m.filter(_.kind == "delete").sortBy(_.seq).map(_.path)
    assert(delPaths.size == 2)
    val lp = st.read()._1.queryExecution.optimizedPlan
    val scannedDirs = lp.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
    }.flatten
    def hits(p: String): Int = {
      val parent = p.substring(0, p.lastIndexOf('/'))
      scannedDirs.count(s => s.contains(parent) || parent.contains(s))
    }
    assert(hits(delPaths(0)) >= 1 && hits(delPaths(0)) <= 1,
      s"d-0 applies to one group: ${scannedDirs}")
    assert(hits(delPaths(1)) >= 1 && hits(delPaths(1)) <= 2,
      s"d-1 applies to two groups: ${scannedDirs}")
    for (dp <- m.filter(_.kind == "data").map(_.path))
      assert(hits(dp) == 1, s"data file duplicated in plan: $scannedDirs")
  }

  test("boxJoin broadcasts the box side (no shuffle on the probe side)") {
    val p = plan(SpatialOps.boxJoin(Points(spark, dir), Fixtures.boxes))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p.take(500))
    assert(!p.contains("SortMergeJoin"), "box join must not sort-merge")
  }

  test("pipJoin is one fused scan: no join, no exchange, single source read") {
    val p = plan(SpatialOps.pipJoin(Points(spark, dir), Fixtures.polys))
    assert(!p.toLowerCase.contains("join"), "PIP with literal polygons must be pure predicates")
    assert(!p.contains("Exchange"), "PIP must not shuffle")
    // r6: the union-of-branches form re-scanned the corpus once per
    // polygon; the fused explode form must read it exactly once
    assert(p.split("Scan parquet").length - 1 == 1,
      s"PIP must scan the corpus once, not per polygon: ${p.take(400)}")
  }

  test("tileAssign is shuffle-free; histogram has exactly one exchange") {
    val pa = plan(SpatialOps.tileAssign(Points(spark, dir)))
    assert(!pa.contains("Exchange"), "tile assignment must not shuffle")
    val ph = plan(SpatialOps.tileHistogram(Points(spark, dir)))
    assert(ph.split("Exchange").length - 1 == 1, "histogram = partial agg + ONE exchange + final agg")
    assert(ph.contains("partial_count") || ph.contains("HashAggregate"), ph.take(300))
  }

  test("id-filter pushes to the parquet scan") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_orderkey") === 42L).select("l_orderkey", "l_quantity")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)]"), p)
  }

  test("image pipeline prunes the bytes column at the scan") {
    val images = Synth.table(spark, 8).toDF()
    val path = java.nio.file.Files.createTempDirectory("plan_img").toString + "/t"
    images.write.parquet(path)
    val pts = Synth.imagePoints(
      spark.read.parquet(path).select(col("image_id"), col("phash")))
      .withColumn("id", xxhash64(col("image_id")))
    val p = plan(SpatialOps.tileHistogram(pts, Fixtures.TileRes))
    assert(p.contains("ReadSchema") && !p.contains("bytes"),
      "bytes must never reach the tile pipeline's scan:\n" + p.take(800))
  }

  test("knnSerial plans TakeOrderedAndProject (per-partition top-k + merge)") {
    val df = Points(spark, dir)
      .withColumn("d2", graft.geo.GeoCols.d2(col("lat"), col("lon"), 1.0, 2.0))
      .orderBy(col("d2"), col("id")).limit(25)
    assert(plan(df).contains("TakeOrderedAndProject"), plan(df).take(400))
  }

  test("whole-stage codegen covers the spatial predicates") {
    // "*(n)" is the WholeStageCodegen stage marker in the compact plan form
    val p = plan(SpatialOps.rangeBox(Points(spark, dir), Fixtures.boxes.head._2))
    assert(p.contains("*(1)") || p.contains("WholeStageCodegen"),
      "spatial filter fell out of codegen")
    assert(p.contains("*(1) Filter"), "the box predicate must be inside the codegen stage")
  }
}
