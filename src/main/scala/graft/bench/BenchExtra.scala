package graft.bench

import org.apache.spark.sql.SparkSession

/** Extra benchmark main for optimization work (guide §1): times an
  * arbitrary subset of the declared queries with the SAME methodology as
  * [[graft.Bench]] (fixed q03 warmup, streaming warmup, cache/temp-view
  * cleanup between reps, median of 3 / min-of-2 past the slow cutoff,
  * same count() action) so subset numbers are comparable to the driver
  * sweep. Subset via SPARK_GRAFT_QUERIES (comma-separated names or a
  * substring prefix match); default = all. Not part of the driver
  * contract — the frozen [[graft.Bench]] stays the round artifact.
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val wanted = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.catalog.listTables().collect()
        .filter(_.isTemporary).foreach(t => spark.catalog.dropTempView(t.name))
    }
    try graft.SparkEntry.queries("q03_point_lookup")(spark, sfDir).count()
    catch { case _: Throwable => () }
    val streamWarmDir =
      if (new java.io.File("/root/testdata/sf0.001").isDirectory)
        "/root/testdata/sf0.001" else sfDir
    try graft.SparkEntry.queries("q31_stream_window")(spark, streamWarmDir).count()
    catch { case _: Throwable => () }
    cleanup()
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      wanted.forall(_.exists(w => n == w || n.startsWith(w)))
    }
    val results = qs.map { case (name, fn) =>
      spark.sparkContext.setJobDescription(name)
      def rep(): Double = {
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable => System.err.println(s"$name: $e"); false }
        val dt = (System.nanoTime() - t0) / 1e9
        cleanup()
        if (ok) dt else -1.0
      }
      val first = rep()
      val times =
        if (first >= graft.Bench.SlowCutoffS) Seq(first, rep())
        else first +: (2 to graft.Bench.Reps).map(_ => rep())
      val med =
        if (times.contains(-1.0)) -1.0
        else if (times.size == 2) times.min
        else times.sorted.apply(times.size / 2)
      println(f"[extra] $name%-28s ${med}%.3f  (${times.map(t => f"$t%.2f").mkString(",")})")
      (name, med)
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    val qJson = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"metric":"subset_total","value":$total,"unit":"sec","queries":$qJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
