package graft.bench

import graft.data.{Fixtures, Synth}
import graft.ops.SpatialOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The BASELINE.json headline: spatial-join + tile-assignment throughput
  * (rows/sec) over the Iceberg-shaped image+caption table, plus the
  * N-vs-4N scaling-efficiency protocol (local[8] vs local[32] in this
  * sandbox, per BASELINE.md).
  *
  * Two measurements, one pipeline shape:
  *  - **image-table throughput**: the staged 2M-row real table (bytes
  *    included); the timed pass reads ONLY phash (column pruning — the
  *    bytes never leave the parquet footprint) → tile histogram +
  *    multi-box join + polygon join.
  *  - **scaling efficiency**: the same operator pipeline over a
  *    pure-arithmetic deterministic point cloud at 300M rows (no staging;
  *    spark.range + codegen arithmetic) — enough real CPU per pass that
  *    Spark's fixed per-job overhead (~0.3 s) is noise, which is what the
  *    two-parallelism comparison needs to be meaningful.
  */
object Headline {

  def defaultRows: Long =
    sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "400000").toLong

  def scaleRows: Long =
    sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "300000000").toLong

  /** Generate-once staging (reused across rounds if already present).
    * Lives under /tmp (not target/) so sbt clean can't force a costly
    * regeneration; regenerating 400k rows costs ~2 min worst-case. */
  def stage(spark: SparkSession, n: Long): String = {
    val path = s"/tmp/graft_bench_images_n$n"
    if (!new java.io.File(s"$path/_SUCCESS").exists()) {
      Synth.table(spark, n, partitions = 128).toDF()
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** One full pass of the metric pipeline; returns rows processed. */
  def pass(pts: DataFrame): Long = {
    val a = SpatialOps.tileHistogram(pts, Fixtures.TileRes)
      .agg(sum(col("cnt"))).collect()(0).getLong(0)
    val b = SpatialOps.boxJoin(pts, Fixtures.boxes).count()
    val c = SpatialOps.pipJoin(pts, Fixtures.polys).count()
    require(a > 0 && b > 0 && c > 0, s"degenerate pass: $a/$b/$c")
    a
  }

  def imagePoints(spark: SparkSession, path: String): DataFrame =
    Synth.imagePoints(
        spark.read.parquet(path).select(col("image_id"), col("phash")))
      .withColumn("id", xxhash64(col("image_id")))

  /** Median-of-iters throughput after `warmups` warmup passes. One
    * warmup suffices in a long-lived session; a FRESH JVM needs several —
    * for a sub-second steady-state pass, C2 compilation dominates the
    * first few iterations and a single-warmup measurement reports the
    * JIT, not the operator (measured: 400k-row pass 6.8 s cold vs 0.9 s
    * after 5 warmups in the same child). */
  def measure(pts: DataFrame, iters: Int = 3, warmups: Int = 1): (Long, Double) = {
    val (rows, times) = timedPasses(pts, iters, warmups)
    val med = times.sorted.apply(iters / 2)
    (rows, rows / med)
  }

  /** Shared timing loop: `warmups` unmeasured passes (codegen + page
    * cache), then `iters` timed ones. The statistic applied on top is the
    * caller's — median for the in-session headline, min for scaling legs. */
  private def timedPasses(pts: DataFrame, iters: Int,
                          warmups: Int): (Long, Seq[Double]) = {
    (1 to warmups).foreach(_ => pass(pts))
    val times = (1 to iters).map { _ =>
      val t0 = System.nanoTime()
      val rows = pass(pts)
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    (times.head._1, times.map(_._2))
  }

  /** Per-leg variant for the scaling protocol: throughput from the MIN
    * pass time, all pass times returned for publication. Host noise is
    * strictly ADDITIVE (steal, cache eviction, writeback can only slow a
    * pass), so the min estimates the uncontended pass; the cross-JVM
    * median over pairs — where the real variance lives — still guards
    * against a systematically hot leg. (The old 2-iter median reported
    * the SLOWER of two passes: the most noise-exposed statistic
    * available, and the r5 pair spread 0.70-0.81 at <1% steal was mostly
    * that.) */
  def measureBest(pts: DataFrame, iters: Int = 3,
                  warmups: Int = 1): (Long, Double, Seq[Double]) = {
    val (rows, times) = timedPasses(pts, iters, warmups)
    (rows, rows / times.min, times)
  }

  def session(cpus: Int): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .appName(s"graft-headline-$cpus")
    .config("spark.sql.shuffle.partitions", cpus.toString)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
}

/** Image-table headline leg, run in a FRESH child JVM by graft.Bench:
  * measuring it inside the bench session double-polluted the number —
  * the 100M-row scale pass left the JVM full of garbage (round 2's
  * phantom 55k-rows/s regression), and the headline's own page-cache/JIT
  * state then taxed the query sweep that followed (a 93 s q05 outlier,
  * measured this round). The parent stages the table first, so this leg
  * only reads it. */
object ImageHeadlineBench {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("4").toInt
    val s = Headline.session(cpus)
    s.sparkContext.setLogLevel("WARN")
    val path = Headline.stage(s, Headline.defaultRows)
    val (rows, rps) = Headline.measure(Headline.imagePoints(s, path),
      iters = 5, warmups = 5)
    s.stop()
    println(f"""{"metric":"image_table_rows_per_sec","value":$rps%.1f,"unit":"rows/sec","cpus":$cpus,"rows":$rows}""")
  }
}

/** One leg of the N-vs-4N scaling protocol: measure the pipeline at a
  * single parallelism level in THIS JVM over the deterministic point
  * cloud. Run each leg in a fresh JVM (tools/scaling.sh) so JIT warmup
  * and GC state cannot bleed between legs — a single-JVM back-to-back
  * comparison showed a multi-x ordering bias. */
object ScalingBench {

  /** (total, steal) jiffies from the aggregate /proc/stat cpu line — the
    * hypervisor-steal share measured ACROSS a leg turns "the host was
    * noisy" from a guess into a published number. (-1, -1) off-Linux. */
  private def cpuStat(): (Long, Long) =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      val parts = try src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        finally src.close()
      (parts.sum, parts(7))
    } catch { case _: Throwable => (-1L, -1L) }

  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.orElse(sys.env.get("SPARK_GRAFT_SCALE_CPUS"))
      .getOrElse("32").toInt
    val n = Headline.scaleRows
    val s = Headline.session(cpus)
    s.sparkContext.setLogLevel("WARN")
    val pts = Synth.pointCloud(s, n, partitions = cpus * 8)
    // iters override: the multi-pair in-bench protocol medians ACROSS leg
    // JVMs (where the variance lives), so it trims the in-JVM reps
    val iters = sys.env.getOrElse("SPARK_GRAFT_SCALE_ITERS", "3").toInt
    val (t0, s0) = cpuStat()
    val (rows, rps, times) = Headline.measureBest(pts, iters)
    val (t1, s1) = cpuStat()
    val stealPct =
      if (t1 > t0 && s0 >= 0) 100.0 * (s1 - s0) / (t1 - t0) else -1.0
    s.stop()
    val ts = times.map(t => f"$t%.2f").mkString("[", ",", "]")
    println(f"""{"metric":"headline_rows_per_sec","value":$rps%.1f,"unit":"rows/sec","cpus":$cpus,"rows":$rows,"iters_sec":$ts,"steal_pct":$stealPct%.2f}""")
  }
}
