package graft.bench

import graft.data.Points
import graft.geo.GeoCols
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic (guide §1): per-phase wall times of the snapshot-store
  * append path — the staging cost ~14 sweep queries pay. Replicates the
  * phases of [[graft.table.SnapshotStore.append]] side by side with the
  * real thing so the phase sum can be checked against the true total.
  * Not part of the driver contract.
  */
object AppendProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", args.headOption.getOrElse("32"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._

    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      val t1 = System.nanoTime(); f
      val t2 = System.nanoTime()
      println(f"$name cold=${(t1 - t0) / 1e9}%.3fs warm=${(t2 - t1) / 1e9}%.3fs")
    }

    val pts = Points(s, sfDir)
    t("derive_noop") {
      pts.write.format("noop").mode("overwrite").save()
    }
    val keyed = pts.withColumn("__z", GeoCols.zCol(col("lat"), col("lon"), 12))
    t("keyed_noop") {
      keyed.write.format("noop").mode("overwrite").save()
    }
    // phase: the clustered write exactly as append does it
    def freshDir(): String =
      java.nio.file.Files.createTempDirectory("graft_probe_").toString + "/unit"
    var unitDir = ""
    t("cluster_write") {
      unitDir = freshDir()
      keyed.repartitionByRange(8, col("__z"))
        .sortWithinPartitions(col("__z"))
        .write.mode(SaveMode.ErrorIfExists).parquet(unitDir)
    }
    // phase: the one-pass stats aggregation exactly as writeSidecars does
    val agg = new graft.table.UnitStatsAgg(0)
    t("stats_typed_agg") {
      val raw = s.read.schema(keyed.schema).parquet(unitDir)
      raw.select(
          input_file_name().as("f"),
          coalesce(GeoCols.cellCol(col("lat"), col("lon"), 8), lit(0L)).as("cell"),
          coalesce(col("lat"), lit(Double.NaN)).as("lat"),
          coalesce(col("lon"), lit(Double.NaN)).as("lon"),
          lit(0L).as("h"))
        .as[(String, Long, Double, Double, Long)]
        .groupByKey(_._1)
        .mapValues(x => (x._2, x._3, x._4, x._5))
        .agg(agg.toColumn.name("stats"))
        .collect()
    }
    // candidate replacement: relational groupBy with partial aggregation
    t("stats_relational") {
      val raw = s.read.schema(keyed.schema).parquet(unitDir)
      raw.select(
          input_file_name().as("f"),
          coalesce(GeoCols.cellCol(col("lat"), col("lon"), 8), lit(0L)).as("cell"),
          col("lat"), col("lon"))
        .groupBy(col("f"), col("cell"))
        .agg(count(lit(1)).as("cnt"), min("lat").as("minLat"), max("lat").as("maxLat"),
          min("lon").as("minLon"), max("lon").as("maxLon"))
        .collect()
    }
    // phase: footer stats (driver-side metadata read)
    t("footer_stats") {
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      val conf = s.sessionState.newHadoopConf()
      val dir = new org.apache.hadoop.fs.Path(unitDir)
      val fs = dir.getFileSystem(conf)
      fs.listStatus(dir).filter(_.getPath.getName.startsWith("part-")).foreach { f =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
        try reader.getFooter.getBlocks.size() finally reader.close()
      }
    }
    // ground truth: the real append (+ read-back count = q02's shape)
    t("real_append") {
      val root = java.nio.file.Files.createTempDirectory("graft_probe_store_").toString
      val store = new graft.table.SnapshotStore(s, root)
      store.append(pts, "unit-all", numPartitions = 8)
      graft.ops.OpUtil.deleteTree(java.nio.file.Paths.get(root))
    }
    t("q02_full") {
      val root = java.nio.file.Files.createTempDirectory("graft_probe_store_").toString
      val store = new graft.table.SnapshotStore(s, root)
      store.append(pts, "unit-all", numPartitions = 8)
      store.read()._1.select(col("id"), col("lat"), col("lon")).count()
      graft.ops.OpUtil.deleteTree(java.nio.file.Paths.get(root))
    }
    println(s"""{"metric":"append_probe","value":0,"unit":"sec"}""")
    s.stop()
  }
}
