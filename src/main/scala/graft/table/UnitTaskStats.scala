package graft.table

import graft.geo.CellId
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.XXH64

/** Per-file statistics computed INSIDE the direct-write task
  * ([[org.apache.spark.sql.GraftParquetDirect.writeStats]]): the writer
  * already sees every row, so the sidecar stats pass and the footer
  * min/max read cost no second job over the unit.
  *
  * Semantics replicate the relational sidecar aggregate and the
  * footer-stats read exactly (spec-pinned in DirectWriteSpec):
  *
  *  - `leaves` — per-cell `(cell, cnt, minLat, maxLat, minLon, maxLon)`
  *    at the store's `histRes`, rows with null/NaN coordinates excluded,
  *    sorted by cell; the cell id is [[CellId.grid]], the scalar twin of
  *    `GeoCols.cellCol` (identical clamped floor arithmetic).
  *  - `hashes` — `xxhash64(key)` of EVERY row (null key hashes to the
  *    seed, exactly Spark's `xxhash64`): dropping a row would be a Bloom
  *    false negative. Collection caps at `hashCap` per task
  *    (`hashOverflow` set) so an unexpectedly large unit degrades to the
  *    distributed [[UnitStatsAgg]] pass instead of ballooning task
  *    results.
  *  - file min/max for `__z`/lat/lon — exact over non-null values; a
  *    column with no usable values (all null, or any NaN for doubles)
  *    FAILS OPEN to the full range, mirroring the footer-stats contract
  *    ("usable stats in every chunk or fail open").
  */
final case class UnitFileStats(
    minZ: Long, maxZ: Long,
    minLat: Double, maxLat: Double,
    minLon: Double, maxLon: Double,
    leaves: Array[(Long, Long, Double, Double, Double, Double)],
    hashes: Array[Long], hashOverflow: Boolean)

object UnitTaskStats {

  /** Observer factory for `writeStats`. Ordinals index the written plan's
    * output schema; `keyOrd < 0` disables hash collection (no Bloom key,
    * or a non-long key that stays on the relational path). */
  def observer(latOrd: Int, lonOrd: Int, zOrd: Int, keyOrd: Int,
               histRes: Int, hashCap: Int)
      : () => (InternalRow => Unit, () => UnitFileStats) = () => {
    var zSeen = false
    var minZ = 0L; var maxZ = 0L
    var latSeen = false; var latNaN = false
    var minLat = 0.0; var maxLat = 0.0
    var lonSeen = false; var lonNaN = false
    var minLon = 0.0; var maxLon = 0.0
    // cell → [cnt, minLat, maxLat, minLon, maxLon] (same shape as
    // FileStatsBuf.cells)
    val cells = scala.collection.mutable.HashMap.empty[Long, Array[Double]]
    var hashes: scala.collection.mutable.ArrayBuilder.ofLong =
      if (keyOrd >= 0) new scala.collection.mutable.ArrayBuilder.ofLong else null
    var hashCount = 0
    var overflow = false

    val row: InternalRow => Unit = { r =>
      if (keyOrd >= 0 && !overflow) {
        if (hashCount >= hashCap) { overflow = true; hashes.clear(); hashes = null }
        else {
          hashes += (if (r.isNullAt(keyOrd)) 42L
                     else XXH64.hashLong(r.getLong(keyOrd), 42L))
          hashCount += 1
        }
      }
      if (!r.isNullAt(zOrd)) {
        val z = r.getLong(zOrd)
        if (!zSeen) { zSeen = true; minZ = z; maxZ = z }
        else { if (z < minZ) minZ = z; if (z > maxZ) maxZ = z }
      }
      val latNull = r.isNullAt(latOrd)
      val lonNull = r.isNullAt(lonOrd)
      val lat = if (latNull) 0.0 else r.getDouble(latOrd)
      val lon = if (lonNull) 0.0 else r.getDouble(lonOrd)
      if (!latNull) {
        if (lat.isNaN) latNaN = true
        else if (!latSeen) { latSeen = true; minLat = lat; maxLat = lat }
        else { if (lat < minLat) minLat = lat; if (lat > maxLat) maxLat = lat }
      }
      if (!lonNull) {
        if (lon.isNaN) lonNaN = true
        else if (!lonSeen) { lonSeen = true; minLon = lon; maxLon = lon }
        else { if (lon < minLon) minLon = lon; if (lon > maxLon) maxLon = lon }
      }
      if (!latNull && !lonNull && !lat.isNaN && !lon.isNaN) {
        val cell = CellId.grid(lat, lon, histRes)
        val acc = cells.getOrElseUpdate(cell, Array(0.0, lat, lat, lon, lon))
        acc(0) += 1.0
        if (lat < acc(1)) acc(1) = lat
        if (lat > acc(2)) acc(2) = lat
        if (lon < acc(3)) acc(3) = lon
        if (lon > acc(4)) acc(4) = lon
      }
    }

    val finish: () => UnitFileStats = () => {
      val leaves = cells.toArray
        .map { case (c, a) => (c, a(0).toLong, a(1), a(2), a(3), a(4)) }
        .sortBy(_._1)
      UnitFileStats(
        if (zSeen) minZ else Long.MinValue,
        if (zSeen) maxZ else Long.MaxValue,
        if (latSeen && !latNaN) minLat else -Double.MaxValue,
        if (latSeen && !latNaN) maxLat else Double.MaxValue,
        if (lonSeen && !lonNaN) minLon else -Double.MaxValue,
        if (lonSeen && !lonNaN) maxLon else Double.MaxValue,
        leaves,
        if (overflow || hashes == null) Array.emptyLongArray else hashes.result(),
        overflow)
    }
    (row, finish)
  }
}
