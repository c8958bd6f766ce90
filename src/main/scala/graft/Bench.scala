package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: one JSON line on stdout.
  *
  * Protocol (kept stable so round-over-round deltas are trustworthy):
  *  1. warm up with a FIXED cheap query (q03) — warming `queries.head` of
  *     an unordered Map made the absorbed JIT/codegen warmup differ
  *     between rounds;
  *  2. measure the image-table and synthetic-cloud headlines in FRESH
  *     child JVMs (childLeg) — in-session measurement biased the numbers
  *     in both directions (round 2: headline understated ~2× by accrued
  *     session state; round 3: the 100M-row pass taxed the sweep that
  *     followed it, one q05 median hit 93 s at 4 cores);
  *  3. run every driver query `Reps` times and report the per-query
  *     MEDIAN, clearing session caches and temp views between queries so
  *     one query's leftovers never tax the next. Queries whose first rep
  *     is ≥ `SlowCutoffS` get one fewer rep and report the MIN of the two
  *     (a one-time cold cost in the first rep would otherwise inflate the
  *     published number; the artifact declares this via slow_reps /
  *     slow_stat so no reader mistakes those entries for 3-rep medians) —
  *     round 4's 5-pair scaling protocol overran the driver's harness
  *     timeout and the all-at-the-end artifact line lost even the
  *     completed sweep, so round 5 trades a rep on the slow storage /
  *     streaming queries for scaling headroom;
  *  4. WALL-CLOCK BUDGET (`SPARK_GRAFT_BENCH_BUDGET_S`, default 1800 s):
  *     the artifact JSON line is printed TWICE — once right after the
  *     sweep + headlines (scaling fields empty, `scaling_truncated`
  *     true), once as the final superset after scaling. The driver
  *     parses the LAST `"metric"` line, so a harness timeout mid-scaling
  *     now yields the completed sweep instead of rc=124 with nothing
  *     (round 4's failure mode). Scaling pairs and retries stop when the
  *     remaining budget can't fit another pair (estimated from the last
  *     measured pair), flagged `scaling_truncated`.
  */
object Bench {

  val Reps = 3
  /** First-rep threshold above which a query runs Reps-1 reps (step 3). */
  val SlowCutoffS = 3.0

  private def cleanup(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.catalog.listTables().collect()
      .filter(_.isTemporary).foreach(t => spark.catalog.dropTempView(t.name))
  }

  /** Run a one-JSON-line benchmark main in a FRESH child JVM and return
    * its reported `value`, or -1 if the child failed. Fresh JVMs are the
    * protocol for every headline number: in-session measurements carry
    * multi-× JIT/GC/page-cache ordering bias in BOTH directions — they
    * mis-measure themselves (round 2's phantom image-headline regression)
    * and tax the queries that run after them (a 93 s q05 outlier when the
    * 100M-row pass preceded the sweep in one 4-core session). */
  private def childLeg(mainClass: String, cpus: Int,
                       env: Map[String, String]): Double = {
    val classes =
      try new java.io.File(graft.bench.ScalingBench.getClass
        .getProtectionDomain.getCodeSource.getLocation.toURI).getPath
      catch { case _: Throwable => "target/scala-2.13/classes" }
    val javaBin = sys.props("java.home") + "/bin/java"
    val moduleOpts = org.apache.spark.launcher.JavaModuleOptions
      .defaultModuleOptions().split("\\s+").toSeq
    val cmd = Seq(javaBin) ++ moduleOpts ++ Seq(
      "-Xmx16g", "-cp", s"$classes:/opt/spark/jars/*",
      mainClass, cpus.toString)
    val pb = new ProcessBuilder(cmd: _*)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    pb.redirectErrorStream(false)
    val p = pb.start()
    // drain stderr (Spark logs) so the child can't block on a full pipe
    new Thread(() => {
      val buf = new Array[Byte](8192)
      while (p.getErrorStream.read(buf) >= 0) ()
    }).start()
    // stdout drained on a thread too, so the TIMEOUT below can fire even
    // while the child is quiet: a wedged child (hung shuffle, dead
    // executor thread) otherwise blocks readAllBytes forever, and a single
    // stuck leg reproduces round 4's total artifact loss past any budget
    val outRef = new java.util.concurrent.atomic.AtomicReference[String]("")
    val reader = new Thread(() => outRef.set(
      new String(p.getInputStream.readAllBytes(), "UTF-8")))
    reader.start()
    val done = p.waitFor(ChildTimeoutS, java.util.concurrent.TimeUnit.SECONDS)
    if (!done) p.destroyForcibly().waitFor()
    reader.join(10000)
    val code = if (done) p.exitValue() else -1
    val out = outRef.get()
    val line = out.linesIterator.filter(_.contains("\"metric\"")).mkString("\n")
    val m = """"value":([0-9.]+)""".r.findAllMatchIn(line).toSeq
    val st = """"steal_pct":([0-9.-]+)""".r.findAllMatchIn(line).toSeq
    lastSteal = if (st.nonEmpty) st.last.group(1).toDouble else -1.0
    if (code == 0 && m.nonEmpty) m.last.group(1).toDouble else -1.0
  }

  /** Hard per-child timeout: no single leg may silently eat the whole
    * harness budget (a killed child reports -1 and the retry/reject
    * machinery publishes it like any other failed leg). */
  val ChildTimeoutS: Long =
    sys.env.getOrElse("SPARK_GRAFT_CHILD_TIMEOUT_S", "600").toLong

  /** Hypervisor-steal share reported by the most recent child leg — the
    * apparatus evidence published next to each scaling pair. */
  private var lastSteal: Double = -1.0

  private def scalingLeg(cpus: Int, rows: Long, iters: Int = 3): Double =
    childLeg("graft.bench.ScalingBench", cpus, Map(
      "SPARK_GRAFT_SCALE_ROWS" -> rows.toString,
      "SPARK_GRAFT_SCALE_ITERS" -> iters.toString))

  def main(args: Array[String]): Unit = {
    val wallStart = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - wallStart) / 1e9
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "1800").toDouble
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // fixed warmup: absorb JVM/codegen startup with the same query every round
    try SparkEntry.queries("q03_point_lookup")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // streaming warmup (round-4 streaming-sweep investigation): the FIRST
    // Structured Streaming query in a JVM pays ~20+ s of one-time class
    // loading + JIT for the micro-batch machinery (StreamProbe: q31 cold
    // 27.0 s vs 2.3 s steady-state). Without this, whichever streaming
    // query the sweep hits first carries that tax into its median —
    // the r4 q31/q32/q33 "regression" shape. Pay it once, unmeasured.
    // prefer the tiny fixture (cheapest warmup) but fall back to the
    // bench's own sfDir — on a host without /root/testdata the silent
    // catch would otherwise skip the warmup and the first streaming query
    // in the sweep would re-absorb the cold-JVM tax into its number
    val streamWarmDir =
      if (new java.io.File("/root/testdata/sf0.001").isDirectory)
        "/root/testdata/sf0.001" else sfDir
    try SparkEntry.queries("q31_stream_window")(spark, streamWarmDir).count()
    catch { case _: Throwable => () }
    cleanup(spark)
    // headline: spatial-join + tile-assignment rows/sec over the staged
    // image table (BASELINE.json metric); rows overridable via
    // SPARK_GRAFT_BENCH_ROWS. The parent only STAGES the table; the
    // measurement runs in a fresh child JVM (childLeg docstring: in-
    // session headline measurements bias both themselves and the sweep)
    // childLeg returns -1 on any child failure; rows must read 0 then so
    // a consumer can't mistake a failed measurement for an N-row run
    val (hRows, hRps) = {
      try graft.bench.Headline.stage(spark, graft.bench.Headline.defaultRows)
      catch { case _: Throwable => () }
      val v = childLeg("graft.bench.ImageHeadlineBench", cpus.toInt, Map(
        "SPARK_GRAFT_BENCH_ROWS" -> graft.bench.Headline.defaultRows.toString))
      if (v > 0) (graft.bench.Headline.defaultRows, v) else (0L, -1.0)
    }
    // storage-free scale measurement: the same pipeline over a 300M-row
    // deterministic point cloud — also a fresh child JVM (the N-vs-4N
    // efficiency protocol below / tools/scaling.sh is the authoritative
    // scaling number; this is the single-level throughput headline).
    // 3e8 rows: a fresh JVM needs multi-second passes or the first-pass
    // JIT tax leaks into the median (1e8 at 32 threads is ~1 s/pass)
    val (sRows, sRps) = {
      val headlineRows = 300000000L
      val v = scalingLeg(cpus.toInt, headlineRows)
      if (v > 0) (headlineRows, v) else (0L, -1.0)
    }
    // the sweep is budget-gated too (finding of the round-5 review: the
    // wall-clock budget only gated scaling, so a pre-checkpoint overrun
    // still lost everything): past 60% of budget the remaining queries are
    // skipped — absent from `queries`, flagged sweep_truncated — so the
    // checkpoint emit is always reached with whatever was measured
    var sweepTruncated = false
    val results = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (elapsedS > budgetS * 0.6) { sweepTruncated = true; None }
      else Some {
      def rep(): Double = {
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        cleanup(spark)
        if (ok) dt else -1.0
      }
      // adaptive rep count (protocol step 3): a ≥3 s first rep buys one
      // fewer rep — the slow set is storage/streaming queries whose cost
      // is a data rewrite or micro-batch machinery, not JIT noise. The
      // 2-rep value is the MIN, not the mean: a one-time cold cost in the
      // first rep (first-touch JIT, page cache) would otherwise inflate
      // the published number by up to 2× (sub-cutoff queries keep the
      // median of 3).
      val first = rep()
      val times =
        if (first >= SlowCutoffS) Seq(first, rep())
        else first +: (2 to Reps).map(_ => rep())
      val med =
        if (times.contains(-1.0)) -1.0
        else if (times.size == 2) times.min
        else times.sorted.apply(times.size / 2)
      (name, med, times.size == 2)
      }
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // which queries published a 2-rep MIN (their first rep tripped the
    // cutoff even if the published value is below it) — without the list a
    // reader cannot tell a min-of-2 from a median-of-3 entry, and
    // round-over-round deltas would silently compare the two statistics
    val slowQs = results.filter(_._3).map(r => "\"" + r._1 + "\"")
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // decompositions are extras: past 75% of budget they publish -1
    // rather than risk the checkpoint emit (each stages a full table copy)
    def decompFits: Boolean = elapsedS < budgetS * 0.75
    // q10d decomposition: the in-query GlobalIndex.build is a write-time
    // cost at scale (the index rides in snapshot manifests) — report the
    // build and the seeded query separately so the query number isn't
    // overstated by amortizable work
    val (tBuild, tQuery) =
      try {
        if (!decompFits) throw new RuntimeException("budget")
        val pts = graft.data.Points(spark, sfDir)
        val t0 = System.nanoTime()
        val (clustered, gi) = graft.index.GlobalIndex.build(pts, r = 8, numPartitions = 8)
        val t1 = System.nanoTime()
        graft.index.GlobalIndex.knnIndexed(clustered, gi,
          graft.data.Fixtures.knnPoint._1, graft.data.Fixtures.knnPoint._2,
          graft.data.Fixtures.knnK).count()
        val t2 = System.nanoTime()
        clustered.unpersist(false)
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      } catch { case _: Throwable => (-1.0, -1.0) }
    // q10e decomposition: with PERSISTED index summaries the build cost is
    // paid at WRITE time — this measures the query alone (driver-side
    // sidecar read + manifest-pruned box read + top-k) over a pre-written
    // store, the number the in-sweep q10e (append + query) obscures
    val tStored =
      try {
        if (!decompFits) throw new RuntimeException("budget")
        val root = java.nio.file.Files.createTempDirectory("graft_bench_q10e_")
        try {
          val store = new graft.table.SnapshotStore(spark, root.toString)
          store.append(graft.data.Points(spark, sfDir), "unit-all", numPartitions = 8)
          val t0 = System.nanoTime()
          graft.index.GlobalIndex.knnStored(store,
            graft.data.Fixtures.knnPoint._1, graft.data.Fixtures.knnPoint._2,
            graft.data.Fixtures.knnK).count()
          (System.nanoTime() - t0) / 1e9
        } finally {
          // delete the staged table — repeated bench loops must not
          // accumulate full dataset copies under /tmp (the same hazard
          // SparkEntry.tempStore's TTL purge exists for)
          graft.ops.OpUtil.deleteTree(root)
        }
      } catch { case _: Throwable => -1.0 }
    // q09e/q10f decomposition, same rationale: their sweep medians carry a
    // 600k-row staging append each — these are the JOIN-query-only costs
    // over one pre-written store (multi-box pruned read + broadcast join;
    // per-ball pruned read + per-query top-k)
    val (tBoxJoinStored, tKnnJoinStored) =
      try {
        if (!decompFits) throw new RuntimeException("budget")
        val root = java.nio.file.Files.createTempDirectory("graft_bench_q09e_")
        try {
          val store = new graft.table.SnapshotStore(spark, root.toString)
          store.append(graft.data.Points(spark, sfDir), "unit-all", numPartitions = 8)
          // independent try per measurement: a knnJoinStored failure must
          // not discard the boxJoin timing already captured (and vice
          // versa — each publishes -1 alone)
          val bj =
            try {
              val t0 = System.nanoTime()
              graft.ops.SpatialOps.boxJoin(
                store.readBoxes(graft.data.Fixtures.boxes.map(_._2))._1,
                graft.data.Fixtures.boxes,
                graft.ops.SpatialOps.resolveRes(store,
                  graft.data.Fixtures.boxes.map(_._2))).count()
              (System.nanoTime() - t0) / 1e9
            } catch { case _: Throwable => -1.0 }
          val kj =
            try {
              val t1 = System.nanoTime()
              graft.index.GlobalIndex.knnJoinStored(store,
                graft.data.Fixtures.knnQueries, graft.data.Fixtures.knnJoinK).count()
              (System.nanoTime() - t1) / 1e9
            } catch { case _: Throwable => -1.0 }
          (bj, kj)
        } finally {
          graft.ops.OpUtil.deleteTree(root)
        }
      } catch { case _: Throwable => (-1.0, -1.0) }
    cleanup(spark)
    // the north rule's two-cluster-size criterion, evidenced in the bench
    // artifact itself: the SAME pipeline at two parallelism levels (N=4 vs
    // 4N=16 — the faithful cluster analog per BASELINE.md; 32 threads
    // saturate this box's shared memory bandwidth), each leg a FRESH child
    // JVM over an identical deterministic 1e9-row input (the same size as
    // tools/scaling.sh: a 4e8-row probe understated efficiency as 0.62
    // because fixed per-pass overhead amortizes at 4 cores but not at 16).
    // `pairs` interleaved JVM pairs; the efficiency estimator is the
    // MEDIAN OF PER-PAIR EFFICIENCIES, not the ratio of per-level
    // medians: host (hypervisor-neighbor) throughput varies on a
    // minutes timescale, a pair's two legs run back-to-back inside one
    // noise regime, and mixing levels ACROSS pairs can ratio a
    // fast-window 4c leg against a slow-window 16c leg (measured: pair
    // efficiencies 0.88/0.84/0.61 while the cross-pair level-median
    // ratio read 0.62). Raw legs are published alongside.
    val scRows = sys.env.getOrElse("SPARK_GRAFT_SCALING_ROWS", "1000000000").toLong
    // 3 pairs by default (round-4 ADVICE: 5 pairs + 2 retries each at 1e9
    // rows predictably overran the driver's harness timeout — rc=124,
    // artifact lost); raise via env for publication runs
    val scPairs = sys.env.getOrElse("SPARK_GRAFT_SCALING_PAIRS", "3").toInt
    def med(xs: Seq[Double]): Double =
      if (xs.isEmpty) -1.0 else xs.sorted.apply(xs.size / 2)
    // Cleanliness test, two independent criteria (both published):
    //
    //  1. SPEEDUP WINDOW [1.6, 4.4]: every clean measurement of this
    //     shuffle-free map pipeline scales 2.8-4.0x; the engine cannot
    //     make 16 threads slower than 4 (speedup < 1.6 ⇔ the hypervisor
    //     starved the 16c leg) nor scale superlinearly past noise
    //     (speedup > 4.4 ⇔ the 4c leg was starved). SYMMETRIC — rejecting
    //     only the unfavorable tail would bias the median upward.
    //  2. ABSOLUTE-THROUGHPUT FLOOR per leg (round-3 verdict: a pair whose
    //     legs are BOTH degraded passes the window — r3's 0.44-efficiency
    //     pair ran its 4c leg at 9.5M rows/s, half the clean 19-21M, with
    //     only 1.7% steal, and sailed through). Clean-leg medians on this
    //     host are stable across rounds (4c 19-21M, 16c 74-78M rows/s at
    //     the default 1e9-row input); a leg below 0.6× that clean median
    //     is apparatus (page-cache eviction, neighbor load, thermal),
    //     not this engine — the engine's own code cannot run 40%+ slower
    //     on identical input without the host changing underneath it.
    //     Floors apply only at the default input size (throughput depends
    //     on rows/pass) and are env-overridable; 0 disables.
    //
    // Degenerate pairs are retried (bounded) and every reject is published
    // WITH its measured hypervisor-steal share — the apparatus evidence
    // for exactly the filtered pairs (round-3 ADVICE: rejects shipped
    // without their steal values were unverifiable).
    val defFloor4 = if (scRows == 1000000000L) 12.0e6 else 0.0
    val defFloor16 = if (scRows == 1000000000L) 45.0e6 else 0.0
    val floor4 = sys.env.get("SPARK_GRAFT_FLOOR_4C").map(_.toDouble).getOrElse(defFloor4)
    val floor16 = sys.env.get("SPARK_GRAFT_FLOOR_16C").map(_.toDouble).getOrElse(defFloor16)
    val rejected = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Double)]
    val steals = scala.collection.mutable.ArrayBuffer.empty[Double]
    def inWindow(p: (Double, Double)): Boolean =
      p._1 > 0 && p._2 > 0 && { val sp = p._2 / p._1; sp >= 1.6 && sp <= 4.4 }
    def aboveFloor(p: (Double, Double)): Boolean =
      p._1 >= floor4 && p._2 >= floor16
    def clean(p: (Double, Double)): Boolean = inWindow(p) && aboveFloor(p)

    /** The artifact line — printed after the sweep (scaling empty,
      * truncated=true) and again as the final superset after scaling.
      * The driver takes the LAST `"metric"` line, so a harness timeout
      * between the two prints still lands the sweep + headlines. */
    def emit(legs4: Seq[Double], legs16: Seq[Double], truncated: Boolean): Unit = {
      val (effN, eff4N) = (med(legs4.filter(_ > 0)), med(legs16.filter(_ > 0)))
      val allPairs = legs4.zip(legs16).filter { case (a, b) => a > 0 && b > 0 }
      val pairEffs = allPairs.map { case (a, b) => (b / a) / 4.0 }
      // the estimator uses only clean pairs: a pair still degenerate AFTER
      // its retries means the starvation outlasted the retry budget —
      // apparatus state, not engine scaling (measured: a minutes-long
      // window where every 16c leg ran at 4c speed). If NO pair survives,
      // the whole sample is contended: report the best-effort median and
      // FLAG it, with per-pair hypervisor steal published, so apparatus
      // failure cannot read as an engine number.
      val cleanPairs = allPairs.filter(clean)
      val contended = cleanPairs.isEmpty && allPairs.nonEmpty
      val eff = med((if (contended) allPairs else cleanPairs)
        .map { case (a, b) => (b / a) / 4.0 })
      def arr(xs: Seq[Double]) = xs.map("%.1f".format(_)).mkString("[", ",", "]")
      def arr4(xs: Seq[Double]) = xs.map("%.4f".format(_)).mkString("[", ",", "]")
      val rejStr = rejected.map(p =>
        s"[${"%.1f".format(p._1)},${"%.1f".format(p._2)},${"%.4f".format(p._3)}]")
        .mkString("[", ",", "]")
      println(s"""{"metric":"total","value":$total,"unit":"sec","reps":$Reps,"slow_cutoff_s":$SlowCutoffS,"slow_reps":2,"slow_stat":"min","slow_queries":$slowQs,"sweep_truncated":$sweepTruncated,"queries":$qs,"sf":"$sfDir","elapsed_sec":${"%.1f".format(elapsedS)},"budget_sec":${"%.1f".format(budgetS)},"image_table_rows":$hRows,"image_table_rows_per_sec":${"%.1f".format(hRps)},"scale_rows":$sRows,"scale_rows_per_sec":${"%.1f".format(sRps)},"knn_index_build_sec":${"%.3f".format(tBuild)},"knn_indexed_query_sec":${"%.3f".format(tQuery)},"knn_stored_query_sec":${"%.3f".format(tStored)},"boxjoin_stored_query_sec":${"%.3f".format(tBoxJoinStored)},"knnjoin_stored_query_sec":${"%.3f".format(tKnnJoinStored)},"scaling_rows":$scRows,"scaling_pairs":$scPairs,"scaling_floor_4c":${"%.1f".format(floor4)},"scaling_floor_16c":${"%.1f".format(floor16)},"scaling_legs_4c":${arr(legs4)},"scaling_legs_16c":${arr(legs16)},"scaling_rows_per_sec_4c":${"%.1f".format(effN)},"scaling_rows_per_sec_16c":${"%.1f".format(eff4N)},"scaling_pair_efficiencies":${arr4(pairEffs)},"scaling_rejected_pairs":$rejStr,"scaling_clean_pairs":${cleanPairs.size},"scaling_contended":$contended,"scaling_truncated":$truncated,"scaling_pair_steal_pct":${arr4(steals.toSeq)},"scaling_efficiency_4_to_16":${"%.4f".format(eff)}}""")
      System.out.flush()
    }

    // checkpoint artifact: everything measured so far survives a timeout
    emit(Seq.empty, Seq.empty, truncated = true)

    // QUIESCE the parent before the scaling legs: after the sweep the
    // session's leftover thread pools (streaming state-store maintenance,
    // executor pools, cleanup) kept burning 2-4 cores in this JVM —
    // measured during the r5 local run at 190-390% CPU alongside the
    // child legs, dragging the 16c leg proportionally more than the 4c
    // leg (pair efficiencies 0.70-0.71 at <1% hypervisor steal; the same
    // box read 0.83 when quiet). The legs are FRESH child JVMs; the
    // parent needs no Spark from here on.
    spark.stop()

    // budget-aware scaling: a pair (or retry) only starts if the remaining
    // wall budget fits it, estimated from the slowest pair measured so far
    // (round-4 "what's wrong" #3: retries recursing on the same count with
    // no global stopwatch is exactly the shape that ate the driver budget)
    var lastPairS = 0.0
    def fits(): Boolean = budgetS - elapsedS > math.max(lastPairS * 1.2, 120.0)
    def cleanPair(retriesLeft: Int): Option[(Double, Double)] =
      if (!fits()) None
      else {
        val t0 = System.nanoTime()
        val a = scalingLeg(4, scRows); val sa = lastSteal
        val b = scalingLeg(16, scRows); val sb = lastSteal
        lastPairS = math.max(lastPairS, (System.nanoTime() - t0) / 1e9)
        val p = (a, b)
        if (!clean(p) && retriesLeft > 0 && fits()) {
          // degenerate AND crashed (-1 leg) pairs both retry — a crashed
          // child consuming a slot unretried would shrink the published
          // sample with truncated:false
          rejected += ((a, b, math.max(sa, sb))); cleanPair(retriesLeft - 1)
        } else if (p._1 > 0 && p._2 > 0) {
          steals += math.max(sa, sb); Some(p)
        } else {
          // child crashed and retries/budget exhausted: publish the reject
          // and give the slot up — the pairs-run shortfall flips
          // scaling_truncated so the artifact can't pass as a full sample
          rejected += ((a, b, math.max(sa, sb))); None
        }
      }
    val pairsRun =
      if (sys.env.get("SPARK_GRAFT_SKIP_SCALING").contains("1")) Seq.empty
      else (1 to scPairs).flatMap(_ => cleanPair(retriesLeft = 2))
    val (legs4, legs16) = pairsRun.unzip
    emit(legs4, legs16, truncated = legs4.size < scPairs &&
      !sys.env.get("SPARK_GRAFT_SKIP_SCALING").contains("1"))
  }
}
