package graft.bench

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Diagnostic (guide §1/§7): per-Spark-job wall times for one declared
  * query, with job descriptions, so the sweep cost decomposes into its
  * actual jobs (scan, sample, write, stats, streaming batches...). Runs
  * the query `SPARK_GRAFT_REPS` times (default 2) and prints every job of
  * the LAST rep plus the total. Not part of the driver contract. */
object JobProbe {

  def main(args: Array[String]): Unit = {
    val qname = args.headOption.getOrElse("q02_snapshot_scan")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Long)]()
    val order = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.put(js.jobId, (desc, js.time, 0L))
        order.add(js.jobId)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val cur = jobs.get(je.jobId)
        if (cur != null) jobs.put(je.jobId, (cur._1, cur._2, je.time))
      }
    })
    try graft.SparkEntry.queries("q03_point_lookup")(spark, sfDir).count()
    catch { case _: Throwable => () }
    try graft.SparkEntry.queries("q31_stream_window")(spark,
      if (new java.io.File("/root/testdata/sf0.001").isDirectory)
        "/root/testdata/sf0.001" else sfDir).count()
    catch { case _: Throwable => () }
    val fn = graft.SparkEntry.queries(qname)
    var total = 0.0
    (1 to reps).foreach { i =>
      jobs.clear(); order.clear()
      spark.catalog.clearCache()
      spark.catalog.listTables().collect()
        .filter(_.isTemporary).foreach(t => spark.catalog.dropTempView(t.name))
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      total = (System.nanoTime() - t0) / 1e9
      println(f"[probe] rep $i $qname total=${total}%.3f s")
    }
    Thread.sleep(500) // let listener drain
    import scala.jdk.CollectionConverters._
    var sum = 0.0
    order.asScala.foreach { id =>
      val (desc, t0, t1) = jobs.get(id)
      val dt = if (t1 > 0) (t1 - t0) / 1e3 else -1.0
      sum += math.max(0, dt)
      println(f"[probe]   job $id%3d ${dt}%7.3f s  ${desc.take(110)}")
    }
    println(f"[probe] job-sum=${sum}%.3f s of total=${total}%.3f s (gap = driver/meta time)")
    spark.stop()
  }
}
