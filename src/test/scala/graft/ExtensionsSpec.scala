package graft

import graft.data.Fixtures
import graft.geo.CellId
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL surface via SparkSessionExtensions: graft_* functions usable from
  * plain SQL, matching the Scala Column API and the pure codec exactly. */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // getOrCreate may return another suite's session (builder extensions
    // only apply to a session this builder creates) — install() covers
    // both paths and is itself the API a live REPL/session would use
    val s = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.plans.GraftExtensions.install(s)
    s
  }

  test("graft_cell / graft_d2 / graft_lat / graft_lon from plain SQL") {
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .createOrReplaceTempView("li")
    val rows = spark.sql(s"""
      SELECT CAST((l_orderkey * 7919 + l_linenumber * 104729) % 180000 AS DOUBLE) / 1000.0 - 90.0 AS lat,
             CAST((l_partkey * 7919 + l_suppkey * 337 + l_orderkey) % 360000 AS DOUBLE) / 1000.0 - 180.0 AS lon,
             graft_cell(CAST((l_orderkey * 7919 + l_linenumber * 104729) % 180000 AS DOUBLE) / 1000.0 - 90.0,
                        CAST((l_partkey * 7919 + l_suppkey * 337 + l_orderkey) % 360000 AS DOUBLE) / 1000.0 - 180.0,
                        ${Fixtures.TileRes}) AS cell,
             graft_d2(0.0, 0.0, 1.0, 2.0) AS d,
             graft_lat(1234567890123456789) AS gla,
             graft_lon(1234567890123456789) AS glo
      FROM li LIMIT 200""").collect()
    for (r <- rows) {
      assert(r.getLong(2) == CellId.grid(r.getDouble(0), r.getDouble(1), Fixtures.TileRes))
      assert(r.getDouble(3) == 5.0)
      val ph = 1234567890123456789L
      assert(r.getDouble(4) == ((ph >>> 32) % 180000L) / 1000.0 - 90.0)
      assert(r.getDouble(5) == ((ph & 0xFFFFFFFFL) % 360000L) / 1000.0 - 180.0)
    }
    // built-in-expression trees: the whole SQL projection stays codegen'd
    val plan = spark.sql(s"SELECT graft_cell(1.0, 2.0, 4) AS c").queryExecution
      .executedPlan.toString
    assert(!plan.toLowerCase.contains("udf"))
  }

  test("graft_dot: codegen'd VecDot == interpreted HOF formulation, from SQL and Column") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(64)(d => ((i * 131 + d * 17) % 97 - 48) / 7.0f))
    }.toDF("vid", "v")
    vecs.createOrReplaceTempView("vecs")
    // reference: the interpreted HOF left-fold this expression replaces
    val hof = vecs.select(col("vid"),
      aggregate(zip_with(col("v").cast("array<double>"), col("v").cast("array<double>"),
        (x, y) => x * y), lit(0.0), (acc, x) => acc + x).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaSql = spark.sql(
      "SELECT vid, graft_dot(CAST(v AS ARRAY<DOUBLE>), CAST(v AS ARRAY<DOUBLE>)) AS d FROM vecs")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaCol = vecs.select(col("vid"),
      call_function("graft_dot", col("v").cast("array<double>"),
        col("v").cast("array<double>")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaSql == hof, "SQL graft_dot must be bit-identical to the HOF left-fold")
    assert(viaCol == hof)
    // implicit float->double array cast path
    val viaImplicit = spark.sql("SELECT vid, graft_dot(v, v) AS d FROM vecs")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaImplicit == hof)
    // mismatched lengths bound the loop; stays inside whole-stage codegen
    val short = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(10.0d, 20.0d)) AS d").collect()(0).getDouble(0)
    assert(short == 50.0)
    // plan check needs a non-local relation (ConvertToLocalRelation folds
    // projections over a LocalTableScan at optimize time)
    val q = vecs.repartition(2)
      .select(call_function("graft_dot", col("v").cast("array<double>"),
        col("v").cast("array<double>")))
    q.collect() // finalize the adaptive plan
    val plan = q.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in plan toString
    assert(plan.contains("*(1) Project [graft_dot"), plan)
  }

  test("graft_z_in_ranges: binary search == the BETWEEN-disjunction covering, codegen'd") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // deterministic adversarial ranges: mixed widths, touching-but-not-
    // adjacent neighbors, singletons, extremes of the key domain
    val rng = new scala.util.Random(42)
    val raw = (0 until 400).map { _ =>
      val lo = rng.nextLong(1L << 40); lo -> (lo + rng.nextLong(1L << 20))
    } ++ Seq(0L -> 0L, (1L << 40) -> (1L << 40)) // singletons at the edges
    val merged = CellId.mergeRanges(raw, maxRanges = 10000)
    // probe keys: every boundary, its neighbors, and uniform misses
    val probes = (merged.flatMap(r => Seq(r._1 - 1, r._1, r._1 + 1,
      r._2 - 1, r._2, r._2 + 1)) ++
      (0 until 2000).map(_ => rng.nextLong(1L << 41))).distinct
    // pure-function ground truth: linear scan over the merged ranges
    val expect = probes.map(z => z -> merged.exists(r => z >= r._1 && z <= r._2)).toMap
    // interpreted twin
    probes.foreach { z =>
      val bounds = merged.iterator.flatMap(r => Iterator(r._1, r._2)).toArray
      assert(graft.functions.ZRangeContains.contains(bounds, z) == expect(z),
        s"interpreted mismatch at z=$z")
    }
    // codegen path through a real (non-local) scan, via the hybrid
    // covering predicate the stored reads use
    val df = probes.toDF("z").repartition(2)
    val got = df.filter(graft.geo.GeoCols.zCoveringPredicate(col("z"), merged))
      .collect().map(_.getLong(0)).toSet
    assert(got == expect.collect { case (z, true) => z }.toSet)
    // under the push cap the predicate IS the plain pushable disjunction
    val few = merged.take(8)
    val gotFew = df.filter(graft.geo.GeoCols.zCoveringPredicate(col("z"), few))
      .collect().map(_.getLong(0)).toSet
    val gotFewRef = df.filter(graft.geo.GeoCols.zRangePredicate(col("z"), few))
      .collect().map(_.getLong(0)).toSet
    assert(gotFew == gotFewRef)
    // empty bounds: contains() is total and false
    assert(!graft.functions.ZRangeContains.contains(Array.empty[Long], 7L))
    // SQL surface: an int-array literal must cast, not throw a raw CCE
    // (the registered signature advertises array<bigint>)
    val sqlRow = spark.sql(
      "SELECT graft_z_in_ranges(5L, array(1, 9)), graft_z_in_ranges(10L, array(1, 9))")
      .collect().head
    assert(sqlRow.getBoolean(0) && !sqlRow.getBoolean(1))
    // unsorted/overlapping bounds must be a loud error, not a silent
    // false negative (the binary search assumes sorted disjoint pairs)
    val bad = intercept[Exception] {
      spark.sql("SELECT graft_z_in_ranges(5L, array(10L, 20L, 1L, 6L))").collect()
    }
    assert(bad.getMessage.contains("ascending disjoint"), bad.getMessage)
    // equality is value-based over the bounds (identity-equals arrays
    // would defeat canonicalization reuse — two probes over the same
    // covering must compare equal)
    val b1 = Array(1L, 5L, 9L, 12L)
    val e1 = graft.functions.ZRangeContains(
      org.apache.spark.sql.catalyst.expressions.Literal(3L), b1)
    val e2 = graft.functions.ZRangeContains(
      org.apache.spark.sql.catalyst.expressions.Literal(3L), b1.clone())
    assert(e1 == e2 && e1.hashCode == e2.hashCode)
    assert(e1.canonicalized semanticEquals e2.canonicalized)
  }

  test("stored box read keeps a pushable coarse disjunction AND the probe in-plan") {
    // the hybrid's point: parquet row-group skipping still sees plain
    // comparisons (PushedFilters non-empty) while the row-level covering
    // is the O(log n) probe — both must appear in the executed plan
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_zr_push").toString
    val st = new graft.table.SnapshotStore(spark, root)
    st.append(graft.data.Points(spark, "/root/testdata/sf0.001"), "u0",
      numPartitions = 4)
    // many scattered boxes so the fine covering exceeds the push cap
    val boxes = (0 until 24).map { i =>
      val la = -80.0 + i * 6.5; val lo = -170.0 + i * 13.7
      graft.geo.MBR(la, lo, la + 4.0, lo + 9.0)
    }
    val (df, _, _) = st.readBoxes(boxes)
    df.collect() // finalize adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_z_in_ranges"), plan.take(800))
    val pushed = plan.linesIterator.find(_.contains("PushedFilters:"))
      .getOrElse("")
    assert(pushed.contains("GreaterThanOrEqual(__z") ||
      pushed.contains("Or("), pushed)
    // and the read is still the exact superset contract: refine == truth
    val got = df.filter(boxes.map(b =>
        graft.geo.GeoCols.inBox(col("lat"), col("lon"), b)).reduce(_ || _))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val pts = graft.data.Points(spark, "/root/testdata/sf0.001")
    val exp = pts.filter(boxes.map(b =>
        graft.geo.GeoCols.inBox(col("lat"), col("lon"), b)).reduce(_ || _))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == exp && got.nonEmpty)
  }
}
