package graft.bench

import graft.data.{Fixtures, Synth}
import graft.ops.SpatialOps
import org.apache.spark.sql.functions._

/** Diagnostic: per-operator wall times for the headline pass at one
  * parallelism level. Not part of the driver contract. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32").toInt
    val s = Headline.session(cpus)
    s.sparkContext.setLogLevel("WARN")
    val path = Headline.stage(s, Headline.defaultRows)
    val pts = Headline.imagePoints(s, path)
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      val t1 = System.nanoTime(); f
      val t2 = System.nanoTime()
      println(f"$name cold=${(t1 - t0) / 1e9}%.2fs warm=${(t2 - t1) / 1e9}%.2fs")
    }
    t("scan_count")(pts.count())
    t("tile_hist")(SpatialOps.tileHistogram(pts, Fixtures.TileRes).agg(sum("cnt")).collect())
    t("box_join")(SpatialOps.boxJoin(pts, Fixtures.boxes).count())
    t("pip_join")(SpatialOps.pipJoin(pts, Fixtures.polys).count())
    println(s"defaultParallelism=${s.sparkContext.defaultParallelism} " +
      s"shufflePartitions=${s.conf.get("spark.sql.shuffle.partitions")}")
    s.stop()
  }
}
