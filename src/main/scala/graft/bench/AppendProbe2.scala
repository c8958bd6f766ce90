package graft.bench

import graft.data.Points
import graft.geo.GeoCols
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic (guide §1): statement-level decomposition of one append —
  * write / footer / stats / commit-remainder — with medians over reps, so
  * driver-side overhead is attributed. Not part of the driver contract. */
object AppendProbe2 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    // ad-hoc conf experiments: SPARK_GRAFT_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b.config(k, v)
    })
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val pts = Points(s, sfDir)
    pts.count() // warm
    val keyed = pts.withColumn("__z", GeoCols.zCol(col("lat"), col("lon"), 12))
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      acc(name) = dt :: acc.getOrElse(name, Nil)
      r
    }
    val roots = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
    (1 to reps).foreach { _ =>
      val base = java.nio.file.Files.createTempDirectory("graft_probe2_")
      roots += base
      val unitDir = base.toString + "/unit"
      t("plan_write") {
        // planning only: force analysis+optimization+physical plan of the
        // projection (write planning itself is inside write_exec)
        keyed.repartitionByRange(8, col("__z"))
          .sortWithinPartitions(col("__z")).queryExecution.executedPlan
      }
      t("write_exec") {
        keyed.repartitionByRange(8, col("__z"))
          .sortWithinPartitions(col("__z"))
          .write.mode(SaveMode.ErrorIfExists).parquet(unitDir)
      }
      t("footer") {
        import org.apache.parquet.hadoop.ParquetFileReader
        import org.apache.parquet.hadoop.util.HadoopInputFile
        val conf = s.sessionState.newHadoopConf()
        val dir = new org.apache.hadoop.fs.Path(unitDir)
        val fs = dir.getFileSystem(conf)
        fs.listStatus(dir).filter(_.getPath.getName.startsWith("part-")).foreach { f =>
          val r = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
          try r.getFooter.getBlocks.size() finally r.close()
        }
      }
      val raw = t("stats_relation") { s.read.schema(keyed.schema).parquet(unitDir) }
      t("stats_exec") {
        raw.select(
            input_file_name().as("f"),
            coalesce(GeoCols.cellCol(col("lat"), col("lon"), 8), lit(0L)).as("cell"),
            col("lat"), col("lon"))
          .filter(col("lat").isNotNull && col("lon").isNotNull &&
            !isnan(col("lat")) && !isnan(col("lon")))
          .groupBy(col("f"), col("cell"))
          .agg(count(lit(1)).as("cnt"), min("lat"), max("lat"), min("lon"), max("lon"))
          .collect()
      }
      val storeRoot = base.toString + "/store"
      val store = t("store_ctor") { new graft.table.SnapshotStore(s, storeRoot) }
      t("real_append") { store.append(pts, "unit-all", numPartitions = 8) }
      t("read_count") {
        store.read()._1.select(col("id"), col("lat"), col("lon")).count()
      }
    }
    acc.toSeq.sortBy(_._1).foreach { case (k, vs) =>
      val sorted = vs.sorted
      println(f"[p2] $k%-16s med=${sorted(sorted.size / 2)}%.3f  min=${sorted.head}%.3f  all=${vs.reverse.map(v => f"$v%.2f").mkString(",")}")
    }
    roots.foreach(graft.ops.OpUtil.deleteTree)
    s.stop()
  }
}
