package graft.bench

import graft.data.Points
import graft.geo.GeoCols
import org.apache.spark.sql.{GraftParquetDirect, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic (guide §1): is the ~0.2 s fixed per-invocation cost of
  * `df.write.parquet` (committer + write-command machinery) recoverable by
  * the manifest-committed direct writer? Interleaved A/B — builtin vs
  * [[org.apache.spark.sql.GraftParquetDirect]] — at a tiny (100-row) and a
  * bench-scale (600 k-row clustered) write, medians over reps. Also
  * verifies in-JVM that both writers produce byte-equivalent readable
  * units (same multiset of rows, same per-file row counts). Not part of
  * the driver contract. */
object WriteFloorProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "7").toInt
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val pts = Points(s, sfDir)
    pts.count() // warm
    val keyed = pts.withColumn("__z", GeoCols.zCol(col("lat"), col("lon"), 12))
    val tiny = pts.limit(100).coalesce(1)
    tiny.count()

    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      acc(name) = ((System.nanoTime() - t0) / 1e9) :: acc.getOrElse(name, Nil)
      r
    }
    val roots = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
    (1 to reps).foreach { i =>
      val base = java.nio.file.Files.createTempDirectory("graft_wfloor_")
      roots += base
      def clustered = keyed.repartitionByRange(8, col("__z"))
        .sortWithinPartitions(col("__z"))
      t("tiny_builtin") {
        tiny.write.mode(SaveMode.ErrorIfExists).parquet(s"$base/tb")
      }
      t("tiny_direct") { GraftParquetDirect.write(tiny, s"$base/td") }
      t("unit_builtin") {
        clustered.write.mode(SaveMode.ErrorIfExists).parquet(s"$base/ub")
      }
      t("unit_direct") { GraftParquetDirect.write(clustered, s"$base/ud") }
      if (i == 1) {
        // equivalence: same rows back, same per-file counts
        val a = s.read.parquet(s"$base/ub")
        val b = s.read.parquet(s"$base/ud")
        val cntA = a.groupBy().count().head().getLong(0)
        val cntB = b.groupBy().count().head().getLong(0)
        val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        println(s"[wf] equivalence rows=$cntA/$cntB exceptAll=$diff " +
          s"filesA=${a.inputFiles.length} filesB=${b.inputFiles.length}")
      }
    }
    acc.toSeq.sortBy(_._1).foreach { case (k, vs) =>
      val sorted = vs.sorted
      println(f"[wf] $k%-14s med=${sorted(sorted.size / 2)}%.3f  min=${sorted.head}%.3f  all=${vs.reverse.map(v => f"$v%.2f").mkString(",")}")
    }
    roots.foreach(graft.ops.OpUtil.deleteTree)
    s.stop()
  }
}
