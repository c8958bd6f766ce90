package graft

import graft.data.Osm
import graft.geo.MBR
import graft.ops.SpatialOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Parity against the reference's literal input (map.osm, read by
  * OSMParser.java:27-94): node count, bounds, and a range query over the
  * parsed nodes — the day-one workflow of a user porting from the
  * reference. */
class OsmSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val path = "/root/reference/map.osm"
  // <bounds .../> line of map.osm (SURVEY.md §5); nodes may sit slightly
  // outside the requested bbox in OSM extracts (way-completeness padding)
  val declared = MBR(40.5979960, 22.9641400, 40.6029480, 22.9759960)

  lazy val nodes = Osm.nodes(spark, path).cache()

  test("parses all 5,689 nodes of the reference's map.osm") {
    assert(nodes.count() == 5689L)
    val ids = nodes.select("id").collect().map(_.getLong(0))
    assert(ids.distinct.length == 5689, "node ids must be unique")
  }

  test("parsed coordinates sit near the declared bounds") {
    import org.apache.spark.sql.functions._
    val r = nodes.agg(min("lat"), max("lat"), min("lon"), max("lon")).collect()(0)
    val (lo1, hi1, lo2, hi2) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    // extracts include way-completing nodes outside the requested bbox
    // (measured ~0.02° on map.osm) — allow that margin, and require the
    // bulk of nodes strictly inside the declared bounds
    val pad = 0.05
    assert(lo1 >= declared.minLat - pad && hi1 <= declared.maxLat + pad, s"lat [$lo1,$hi1]")
    assert(lo2 >= declared.minLon - pad && hi2 <= declared.maxLon + pad, s"lon [$lo2,$hi2]")
    val inside = nodes.filter(GeoColsBox).count()
    assert(inside >= 5000, s"only $inside nodes inside declared bounds")
  }

  private def GeoColsBox = graft.geo.GeoCols.inBox(
    org.apache.spark.sql.functions.col("lat"),
    org.apache.spark.sql.functions.col("lon"), declared)

  test("rangeBox over OSM nodes == brute-force filter (Demo.java:11-14 box)") {
    val b = graft.data.Fixtures.demoBox
    val all = nodes.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val exp = all.filter { case (_, la, lo) => b.contains(la, lo) }.map(_._1).toSet
    val got = SpatialOps.rangeBox(nodes, b, r = 12)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == exp)
    assert(got.nonEmpty, "demo box should match some nodes")
  }
}
