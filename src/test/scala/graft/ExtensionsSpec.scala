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
}
