package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic point→rectangle derivation for the MBR-intersection join:
  * each selected point becomes a closed box centered on it with
  * id-derived half-extents. Twin of the `ra`/`rb` CTEs in
  * [[graft.oracle.OracleSql.mbrJoin]] — integer arithmetic, one double
  * division, then IEEE add/subtract, so corners are bit-identical in both
  * engines. The id-modulus slice keeps the oracle's rect × rect
  * inequality join tractable; the operator itself never goes all-pairs.
  */
object Rects {

  private def halfLat(id: Column): Column =
    (id % Fixtures.RectHalfLatMod) / lit(100.0) + lit(0.5)
  private def halfLon(id: Column): Column =
    (id % Fixtures.RectHalfLonMod) / lit(100.0) + lit(0.5)

  /** Rectangle set `cls` (mod-class slice of the derived point cloud) with
    * schema (id, minlat, minlon, maxlat, maxlon). */
  def derive(points: DataFrame, cls: Int, mod: Int = Fixtures.RectMod): DataFrame =
    points.filter(col("id") % mod === cls).select(
      col("id"),
      (col("lat") - halfLat(col("id"))).as("minlat"),
      (col("lon") - halfLon(col("id"))).as("minlon"),
      (col("lat") + halfLat(col("id"))).as("maxlat"),
      (col("lon") + halfLon(col("id"))).as("maxlon"))
}
