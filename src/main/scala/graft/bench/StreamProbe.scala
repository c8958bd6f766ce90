package graft.bench

import graft.ops.EventOps
import org.apache.spark.sql.SparkSession

/** Diagnostic for the round-4 streaming-sweep regression (q31/q32/q33
  * read 2.9-4.3× slower in the r4 builder-local sweep than the r3 driver
  * artifact, with zero code change): wall time per op across reps in a
  * fresh session, plus ONE instrumented run that attributes the
  * micro-batch time via StreamingQueryProgress.durationMs — separating
  * engine work (addBatch) from harness machinery (query start/stop,
  * planning, WAL, source discovery). Not part of the driver contract. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-streamprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    def t(name: String)(f: => Any): Unit = {
      val xs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      s.catalog.clearCache()
      s.catalog.listTables().collect()
        .filter(_.isTemporary).foreach(tb => s.catalog.dropTempView(tb.name))
      println(f"$name reps=${xs.map(x => f"$x%.2f").mkString(",")}")
    }
    t("q31_stream_window")(EventOps.streamWindowAgg(s, dir).count())
    t("q33_stream_tiles")(EventOps.streamTileHistogram(s, dir).count())
    t("q32_stream_dedup")(graft.ops.Dedup.streamDedup(s, dir).count())

    // instrumented q31: where inside the trigger does the time go?
    import org.apache.spark.sql.functions._
    val name = "graft_probe_sink"
    val src = s.readStream.schema(EventOps.eventsSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val wall0 = System.nanoTime()
    val q = EventOps.windowAgg(src).writeStream
      .format("memory").queryName(name).outputMode("complete").start()
    val started = (System.nanoTime() - wall0) / 1e9
    q.processAllAvailable()
    val drained = (System.nanoTime() - wall0) / 1e9
    q.recentProgress.foreach { p =>
      import scala.jdk.CollectionConverters._
      println(s"batch=${p.batchId} rows=${p.numInputRows} " +
        p.durationMs.asScala.toSeq.sortBy(-_._2)
          .map { case (k, v) => s"$k=${v}ms" }.mkString(" "))
    }
    q.stop()
    val stopped = (System.nanoTime() - wall0) / 1e9
    println(f"q31 instrumented: start=$started%.2f drained=$drained%.2f stopped=$stopped%.2f")
    println(s"checkpointDir=${s.conf.getOption("spark.sql.streaming.checkpointLocation")}")
    s.stop()
  }
}
