package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OSM XML node source — the reference's literal input format
  * (OSMParser.java:27-94 reads `map.osm` and keeps one (id, lat, lon)
  * record per `<node …>` element; tags/ways/relations are ignored).
  *
  * Distributed shape: `spark.read.text` splits the file across tasks and
  * the attribute pulls are codegen'd regexp_extract Columns — no XML
  * library, no driver-side parse. OSM extracts put every node's id/lat/lon
  * attributes on the node's opening line (tags follow on child lines), so
  * a line-oriented scan is lossless for nodes.
  */
object Osm {

  def nodes(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(col("value").rlike("""<node\s"""))
      .select(
        regexp_extract(col("value"), """\bid="(-?\d+)"""", 1).cast("long").as("id"),
        regexp_extract(col("value"), """\blat="(-?[0-9.]+)"""", 1).cast("double").as("lat"),
        regexp_extract(col("value"), """\blon="(-?[0-9.]+)"""", 1).cast("double").as("lon"))
      .filter(col("id").isNotNull && col("lat").isNotNull && col("lon").isNotNull)
}
