package graft

import graft.data.Fixtures
import graft.geo.MBR
import graft.ops.SpatialOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.net.URLClassLoader
import java.nio.file.{Files, Paths}
import scala.util.Random

/** Reference-parity harness (SURVEY.md §5): compiles the untouched
  * reference sources from /root/reference/src (javac, zero deps), drives
  * the real R*-tree via reflection on synthesized points through BOTH
  * build paths (insertPointer — exercising splits/forced-reinserts at
  * M=50 — and bulkLoad), and asserts result parity with this engine:
  * range-query id sets identical, kNN distance multisets identical
  * (reference PQ tie order is nondeterministic), skyline coordinate sets
  * identical.
  */
class RefParitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---- compile + reflect the reference once ----
  lazy val loader: ClassLoader = {
    val out = Paths.get("target/ref-classes")
    Files.createDirectories(out)
    val srcs = Files.list(Paths.get("/root/reference/src")).toArray.map(_.toString)
      .filter(_.endsWith(".java"))
    val rc = new ProcessBuilder(
      (Seq("javac", "-encoding", "UTF-8", "-d", out.toString) ++ srcs): _*)
      .inheritIO().start().waitFor()
    assert(rc == 0, "javac failed on reference sources")
    new URLClassLoader(Array(out.toUri.toURL), getClass.getClassLoader)
  }

  /** A reference tree instance over the given points (insert or bulk). */
  class RefTree(points: Seq[(Long, Double, Double)], bulk: Boolean) {
    private val dir = Files.createTempDirectory("ref").toString
    private val recordC = loader.loadClass("Record")
    private val dataFileC = loader.loadClass("DataFile")
    private val indexFileC = loader.loadClass("IndexFile")
    private val treeC = loader.loadClass("RStarTree")
    private val rpC = loader.loadClass("RecordPointer")

    private val df = dataFileC.getConstructor(classOf[String], classOf[Int])
      .newInstance(s"$dir/datafile.bin", Integer.valueOf(2)).asInstanceOf[AnyRef]
    private val idx = indexFileC.getConstructor(classOf[String], classOf[Int])
      .newInstance(s"$dir/indexfile.bin", Integer.valueOf(2)).asInstanceOf[AnyRef]
    val tree: AnyRef = treeC.getConstructor(classOf[Int], dataFileC, indexFileC)
      .newInstance(Integer.valueOf(2), df, idx).asInstanceOf[AnyRef]

    private def mkRecord(id: Long, la: Double, lo: Double): AnyRef =
      recordC.getConstructor(classOf[Long], classOf[String], classOf[Array[Double]])
        .newInstance(java.lang.Long.valueOf(id), s"n$id", Array(la, lo))
        .asInstanceOf[AnyRef]

    // REFERENCE DEFECT WORKAROUND (SURVEY.md §8): on a fresh heap file the
    // first block-overflow resets currentBlockId to 1 (DataFile.java:190-193
    // with totalBlocks initialized to 1, DataFile.java:46), so records
    // 118..234 silently OVERWRITE records 1..117 — every materialized query
    // in the reference loses the first 117 inserts and duplicates the next
    // 117. Burn in exactly slotsPerBlock dummy records (id = -1, never
    // indexed; readers skip id <= 0, RStarTree.java:511) so the one buggy
    // transition destroys only dummies and all real pointers stay unique.
    {
      val slots = dataFileC.getMethod("getSlotsPerBlock").invoke(df)
        .asInstanceOf[Int]
      val ins = dataFileC.getMethod("insertRecord", recordC)
      (0 until slots).foreach(_ => ins.invoke(df, mkRecord(-1L, 0.0, 0.0)))
    }

    if (bulk) {
      val list = new java.util.ArrayList[AnyRef]()
      points.foreach { case (id, la, lo) => list.add(mkRecord(id, la, lo)) }
      treeC.getMethod("bulkLoad", classOf[java.util.List[_]]).invoke(tree, list)
    } else {
      val insRec = dataFileC.getMethod("insertRecord", recordC)
      val insPtr = treeC.getMethod("insertPointer", rpC, classOf[Array[Double]])
      points.foreach { case (id, la, lo) =>
        val rp = insRec.invoke(df, mkRecord(id, la, lo))
        insPtr.invoke(tree, rp, Array(la, lo))
      }
    }

    private val readRec = dataFileC.getMethod("readRecord", rpC)
    private val getId = recordC.getMethod("getId")

    private def ids(rps: java.util.List[_]): Seq[Long] = {
      val b = Seq.newBuilder[Long]
      rps.forEach(rp => b += getId.invoke(readRec.invoke(df, rp.asInstanceOf[AnyRef]))
        .asInstanceOf[Long])
      b.result()
    }

    def range(b: MBR): Seq[Long] = ids(
      treeC.getMethod("rangeQuery", classOf[Array[Double]], classOf[Array[Double]])
        .invoke(tree, Array(b.minLat, b.minLon), Array(b.maxLat, b.maxLon))
        .asInstanceOf[java.util.List[_]])

    def knn(qLat: Double, qLon: Double, k: Int): Seq[Long] = ids(
      treeC.getMethod("kNNQuery", classOf[Array[Double]], classOf[Int])
        .invoke(tree, Array(qLat, qLon), Integer.valueOf(k))
        .asInstanceOf[java.util.List[_]])

    def skyline(): Seq[Long] = ids(
      treeC.getMethod("skylineQuery").invoke(tree).asInstanceOf[java.util.List[_]])
  }

  /** OSM-bounds-shaped cloud (map.osm extent) + a global scatter. */
  def mkPoints(n: Int, seed: Long): Seq[(Long, Double, Double)] = {
    val rng = new Random(seed)
    (1L to n.toLong).map { id =>
      if (id % 3 == 0)
        (id, rng.nextDouble() * 170 - 85, rng.nextDouble() * 350 - 175)
      else // dense cluster in the reference's map bounds → deep tree locally
        (id, 40.5979960 + rng.nextDouble() * 0.0049520,
             22.9641400 + rng.nextDouble() * 0.0118560)
    }
  }

  def toDf(points: Seq[(Long, Double, Double)]) = {
    import spark.implicits._
    points.toDF("id", "lat", "lon")
  }

  def d2(p: (Double, Double), la: Double, lo: Double): Double =
    (p._1 - la) * (p._1 - la) + (p._2 - lo) * (p._2 - lo)

  val boxes: Seq[MBR] = Seq(
    MBR(40.5979960, 22.9641400, 40.6, 22.97),              // Demo.java:11-12
    MBR(40.598, 22.9700, 40.601, 22.9760),
    MBR(-85, -175, 85, 175),
    MBR(0.0, 0.0, 40.0, 40.0),
    MBR(40.5990, 22.9680, 40.5991, 22.9681))               // near-empty

  for (bulk <- Seq(false, true)) {
    val label = if (bulk) "bulkLoad" else "insertPointer (splits+reinserts)"

    test(s"range parity vs reference [$label]") {
      val points = mkPoints(if (bulk) 4000 else 1500, seed = 11L)
      val ref = new RefTree(points, bulk)
      val ours = toDf(points)
      for (b <- boxes) {
        val refIds = ref.range(b).sorted
        val ourIds = SpatialOps.rangeBox(ours, b).select("id")
          .collect().map(_.getLong(0)).sorted.toSeq
        assert(ourIds == refIds, s"box $b")
      }
    }

    test(s"kNN parity vs reference [$label] (distance multisets)") {
      val points = mkPoints(if (bulk) 4000 else 1500, seed = 23L)
      val byId = points.map(p => p._1 -> (p._2, p._3)).toMap
      val ref = new RefTree(points, bulk)
      val ours = toDf(points)
      for ((qla, qlo, k) <- Seq((40.5979, 22.9645, 5), (40.5979, 22.9645, 60),
                                (0.0, 0.0, 10), (-80.0, 170.0, 3))) {
        val refD = ref.knn(qla, qlo, k).map(id => d2(byId(id), qla, qlo)).sorted
        val ourD = SpatialOps.knnRing(ours, qla, qlo, k)
          .select("id").collect().map(r => d2(byId(r.getLong(0)), qla, qlo)).sorted.toSeq
        assert(ourD == refD, s"q=($qla,$qlo) k=$k")
      }
    }

    test(s"skyline parity vs reference [$label]") {
      val points = mkPoints(if (bulk) 4000 else 1500, seed = 37L)
      val byId = points.map(p => p._1 -> (p._2, p._3)).toMap
      val ref = new RefTree(points, bulk)
      val refCoords = ref.skyline().map(byId).toSet
      val ourCoords = SpatialOps.skyline(toDf(points))
        .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
      assert(ourCoords == refCoords)
    }
  }

  test("stored-table parity vs reference: manifest-pruned range + persisted-summary kNN") {
    // the round-4 stored-table operators against the compiled reference
    // itself: range through store.read(Some(box)) (file pruning + Z-range
    // skip — the file-level analog of RStarTree.java:426's subtree cut)
    // and kNN planned from the write-time index sidecars
    val points = mkPoints(4000, seed = 41L)
    val byId = points.map(p => p._1 -> (p._2, p._3)).toMap
    val ref = new RefTree(points, bulk = true)
    val root = java.nio.file.Files.createTempDirectory("graft_refparity_store").toString
    val store = new graft.table.SnapshotStore(spark, root)
    store.append(toDf(points), "unit-all", numPartitions = 8)
    for (b <- boxes) {
      val refIds = ref.range(b).sorted
      val got = SpatialOps.rangeBox(store.read(Some(b))._1, b,
          SpatialOps.resolveRes(store, Seq(b)))
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == refIds, s"box $b")
    }
    for ((qla, qlo, k) <- Seq((40.5979, 22.9645, 5), (40.5979, 22.9645, 60),
                              (0.0, 0.0, 10))) {
      val refD = ref.knn(qla, qlo, k).map(id => d2(byId(id), qla, qlo)).sorted
      val ourD = graft.index.GlobalIndex.knnStored(store, qla, qlo, k)
        .select("id").collect().map(r => d2(byId(r.getLong(0)), qla, qlo)).sorted.toSeq
      assert(ourD == refD, s"q=($qla,$qlo) k=$k")
    }
  }
}
