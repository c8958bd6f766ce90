package graft.bench

import graft.data.{Fixtures, Synth}
import graft.ops.SpatialOps
import org.apache.spark.sql.functions._

/** Diagnostic: per-operator scaling over the arithmetic point cloud. */
object BenchProbe3 {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "100000000").toLong
    val s = Headline.session(cpus)
    s.sparkContext.setLogLevel("WARN")
    val mult = args.drop(1).headOption.getOrElse("8").toInt
    val pts = Synth.pointCloud(s, n, partitions = cpus * mult)
    def t(name: String)(f: => Any): Unit = {
      f; val t1 = System.nanoTime(); f; val t2 = System.nanoTime()
      println(f"$name cpus=$cpus warm=${(t2 - t1) / 1e9}%.2fs")
    }
    t("range_sum")(pts.agg(sum(col("id"))).collect())
    t("derive_sum")(pts.agg(sum(col("lat") + col("lon"))).collect())
    t("tile_hist")(SpatialOps.tileHistogram(pts, Fixtures.TileRes).agg(sum("cnt")).collect())
    t("box_join")(SpatialOps.boxJoin(pts, Fixtures.boxes).count())
    t("pip_join")(SpatialOps.pipJoin(pts, Fixtures.polys).count())
    s.stop()
  }
}
