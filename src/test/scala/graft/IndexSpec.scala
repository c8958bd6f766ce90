package graft

import graft.data.Points
import graft.geo.MBR
import graft.index.{GlobalIndex, LocalRTree}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class IndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"
  lazy val pts = Points(spark, dir)
  lazy val built = GlobalIndex.build(pts, r = 10, numPartitions = 8)
  lazy val rows: Array[(Long, Double, Double)] =
    built._1.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))

  test("pack builds a complete fanout hierarchy with exact counts") {
    val rng = new Random(1)
    val n = 12345
    val data = Array.fill(n)((rng.nextDouble() * 170 - 85, rng.nextDouble() * 350 - 175))
    val idx = LocalRTree.pack(0, data.sortBy(_._1).iterator, fanout = 50)
    assert(idx.count == n)
    assert(idx.leaves.map(_.count).sum == n)
    assert(idx.leaves.length == math.ceil(n / 50.0).toInt)
    assert(idx.levels.last.length == 1)
    // every level's MBR union == root MBR
    for (lvl <- idx.levels) {
      val u = lvl.map(_.mbr).reduce(_ union _)
      assert(u == idx.root.mbr)
      assert(lvl.map(_.count).sum == n.toLong)
    }
    // candidateCount is a sound upper bound and exact on full box
    val all = MBR(-90, -180, 90, 180)
    assert(LocalRTree.candidateCount(idx, all) == n)
    val box = MBR(0, 0, 10, 10)
    val exact = data.count { case (la, lo) => box.contains(la, lo) }
    assert(LocalRTree.candidateCount(idx, box) >= exact)
  }

  test("empty partition packs to a zero-count index") {
    val idx = LocalRTree.pack(3, Iterator.empty)
    assert(idx.count == 0)
    assert(LocalRTree.candidateCount(idx, MBR(-90, -180, 90, 180)) == 0)
  }

  test("global index counts match and partition prune is sound") {
    val (clustered, gi) = built
    assert(gi.totalRows == rows.length)
    for (box <- Seq(MBR(0, 0, 20, 40), MBR(-60, -100, -20, -10), MBR(80, 160, 89, 179))) {
      val keep = gi.prunePartitions(box).toSet
      // every matching row lives in a kept partition
      import org.apache.spark.sql.functions._
      val matches = clustered
        .withColumn("pid", spark_partition_id())
        .filter(col("lat") >= box.minLat && col("lat") <= box.maxLat &&
                col("lon") >= box.minLon && col("lon") <= box.maxLon)
        .select("pid").distinct().collect().map(_.getInt(0)).toSet
      assert(matches.subsetOf(keep), s"box $box: $matches not in $keep")
      assert(keep.size < gi.parts.length, s"box $box pruned nothing")
    }
  }

  test("knnSeedRadius provably contains >= k points; knnIndexed == brute force") {
    val (clustered, gi) = built
    for ((qla, qlo, k) <- Seq((12.345, -67.89, 25), (0.0, 0.0, 1), (-80.0, 170.0, 100))) {
      val radius = gi.knnSeedRadius(qla, qlo, k)
      val within = rows.count { case (_, la, lo) =>
        (la - qla) * (la - qla) + (lo - qlo) * (lo - qlo) <= radius * radius
      }
      assert(within >= k, s"seed radius $radius holds $within < $k points")
      val exp = rows.map { case (id, la, lo) =>
        (id, (la - qla) * (la - qla) + (lo - qlo) * (lo - qlo))
      }.sortBy { case (id, d2) => (d2, id) }.take(k).map(_._1).toSeq
      val got = GlobalIndex.knnIndexed(clustered, gi, qla, qlo, k)
        .orderBy("rank").collect().map(_.getLong(1)).toSeq
      assert(got == exp, s"q=($qla,$qlo) k=$k")
    }
  }

  test("hilbert-packed index: same content, exact kNN, root MBRs no wider than morton") {
    val (hClustered, hGi) = GlobalIndex.build(pts, r = 10, numPartitions = 8,
      curve = "hilbert")
    // identical multiset of rows through the alternative packing
    val hRows = hClustered.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(hRows.sorted.toSeq == rows.sorted.toSeq)
    // exact kNN through the hilbert-packed index
    val (qla, qlo, k) = (12.345, -67.89, 25)
    val exp = rows.map { case (id, la, lo) =>
      (id, (la - qla) * (la - qla) + (lo - qlo) * (lo - qlo))
    }.sortBy { case (id, d2) => (d2, id) }.take(k).map(_._1).toSeq
    val got = GlobalIndex.knnIndexed(hClustered, hGi, qla, qlo, k)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(got == exp)
    // the clustering-quality claim, measured: total root-MBR area of the
    // hilbert packing is no worse than the morton packing on this cloud
    def area(gi: GlobalIndex) = gi.parts.filter(_.count > 0).map { p =>
      (p.root.mbr.maxLat - p.root.mbr.minLat) * (p.root.mbr.maxLon - p.root.mbr.minLon)
    }.sum
    assert(area(hGi) <= area(built._2) * 1.05,
      s"hilbert root area ${area(hGi)} vs morton ${area(built._2)}")
    hClustered.unpersist(false)
  }

  test("str-packed index: same content, sound hierarchy, exact kNN") {
    // the third packing mode the north star names — lat strips with
    // lon order within (the classic STR layout, i.e. the reference's 1-D
    // bulk-load sort plus the secondary order it lacks)
    val (sClustered, sGi) = GlobalIndex.build(pts, r = 10, numPartitions = 8,
      curve = "str")
    val sRows = sClustered.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(sRows.sorted.toSeq == rows.sorted.toSeq)
    assert(sGi.totalRows == rows.length)
    for (p <- sGi.parts.filter(_.count > 0); lvl <- p.levels) {
      assert(lvl.map(_.count).sum == p.count)
      assert(lvl.map(_.mbr).reduce(_ union _) == p.root.mbr)
    }
    val (qla, qlo, k) = (12.345, -67.89, 25)
    val exp = rows.map { case (id, la, lo) =>
      (id, (la - qla) * (la - qla) + (lo - qlo) * (lo - qlo))
    }.sortBy { case (id, d2) => (d2, id) }.take(k).map(_._1).toSeq
    val got = GlobalIndex.knnIndexed(sClustered, sGi, qla, qlo, k)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(got == exp)
    intercept[IllegalArgumentException] {
      GlobalIndex.build(pts, r = 10, numPartitions = 8, curve = "peano")
    }
    sClustered.unpersist(false)
  }
}
