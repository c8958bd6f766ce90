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
}
