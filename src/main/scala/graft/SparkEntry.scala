package graft

import graft.data.{Fixtures, Points}
import graft.ops.SpatialOps
import graft.oracle.OracleSql
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every oracle-checked operator has a `queries` entry (Spark plan) and an
  * `oracleSql` entry (DuckDB twin generated from the same fixtures by
  * [[graft.oracle.OracleSql]]). Column names and value arithmetic match
  * bit-for-bit between the two.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: multi-box spatial join
    * (covering-cell broadcast join + exact refine) — the metric-bearing
    * operator from BASELINE.json. */
  def entry(spark: SparkSession): DataFrame =
    SpatialOps.boxJoin(Points(spark, "/root/testdata/sf0.001"), Fixtures.boxes)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q03_point_lookup" -> ((s, dir) => SpatialOps.pointLookup(Points(s, dir), 8L, 256L)),
    "q04_index_summary" -> ((s, dir) => SpatialOps.indexSummary(Points(s, dir), 3)),
    "q07_bulkload_leaves" -> ((s, dir) => SpatialOps.bulkloadLeaves(Points(s, dir))),
    "q09_range_box" -> ((s, dir) => SpatialOps.rangeBox(Points(s, dir), Fixtures.boxes.head._2)),
    "q09b_range_join" -> ((s, dir) => SpatialOps.boxJoin(Points(s, dir), Fixtures.boxes)),
    "q10_knn_ring" -> ((s, dir) => SpatialOps.knnRing(Points(s, dir),
      Fixtures.knnPoint._1, Fixtures.knnPoint._2, Fixtures.knnK)),
    "q10b_knn_join" -> ((s, dir) => SpatialOps.knnJoin(Points(s, dir),
      Fixtures.knnQueries, Fixtures.knnJoinK)),
    "q11_skyline" -> ((s, dir) => SpatialOps.skyline(Points(s, dir))),
    "q12_range_serial" -> ((s, dir) => SpatialOps.rangeBoxSerial(Points(s, dir), Fixtures.boxes.head._2)),
    "q13_knn_serial" -> ((s, dir) => SpatialOps.knnSerial(Points(s, dir),
      Fixtures.knnPoint._1, Fixtures.knnPoint._2, Fixtures.knnK)),
    "q15_tile_assign" -> ((s, dir) => SpatialOps.tileAssign(Points(s, dir))),
    "q16_tile_histogram" -> ((s, dir) => SpatialOps.tileHistogram(Points(s, dir))),
    "q17_pip_join" -> ((s, dir) => SpatialOps.pipJoin(Points(s, dir), Fixtures.polys)),
  )

  def oracleSql: Map[String, String] = Map(
    "q03_point_lookup" -> OracleSql.pointLookup(8L, 256L),
    "q04_index_summary" -> OracleSql.indexSummary(3),
    "q07_bulkload_leaves" -> OracleSql.bulkloadLeaves(Fixtures.PackFanout),
    "q09_range_box" -> OracleSql.rangeBox(Fixtures.boxes.head._2),
    "q09b_range_join" -> OracleSql.boxJoin(Fixtures.boxes),
    "q10_knn_ring" -> OracleSql.knn(Fixtures.knnPoint._1, Fixtures.knnPoint._2, Fixtures.knnK),
    "q10b_knn_join" -> OracleSql.knnJoin(Fixtures.knnQueries, Fixtures.knnJoinK),
    "q11_skyline" -> OracleSql.skyline,
    "q12_range_serial" -> OracleSql.rangeBox(Fixtures.boxes.head._2),
    "q13_knn_serial" -> OracleSql.knn(Fixtures.knnPoint._1, Fixtures.knnPoint._2, Fixtures.knnK),
    "q15_tile_assign" -> OracleSql.tileAssign(Fixtures.TileRes),
    "q16_tile_histogram" -> OracleSql.tileHistogram(Fixtures.TileRes),
    "q17_pip_join" -> OracleSql.pipJoin(Fixtures.polys),
  )
}
