package graft

import graft.data.Synth
import graft.geo.CellId
import graft.img.Codec
import graft.ops.SpatialOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Image-table generator + codec invariants (input_hint):
  * decoded-pixel PSNR >= 40 dB for lossy formats, exact caption equality,
  * phash reproducibility, cross-parallelism determinism — including after
  * a join/shuffle (BinaryType payload must survive untouched). */
class SynthSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("per-row invariant: PNG exact, JPEG PSNR >= 40 dB, caption recomputable, phash stable") {
    val rows = Synth.table(spark, 64, seed = 42L).collect()
    assert(rows.length == 64)
    for (r <- rows) {
      val i = r.image_id.drop(3).toLong
      val h0 = Codec.mix(42L ^ i)
      assert(r.caption == Synth.caption(r.image_id, h0), "caption invariant")
      val decoded = Codec.decode(r.bytes)
      assert(decoded.getWidth == r.w && decoded.getHeight == r.h)
      val source = Codec.raster(Codec.mix(h0), r.w, r.h)
      if (r.fmt == "png") {
        assert(Codec.psnr(decoded, source).isPosInfinity, "png must be lossless")
      } else {
        val p = Codec.psnr(decoded, source)
        assert(p >= 40.0, s"jpeg PSNR $p < 40 dB for ${r.image_id}")
      }
      assert(Codec.pHash64(decoded) == r.phash, "phash recomputation")
    }
  }

  test("generator is deterministic and partitioning-invariant") {
    val a = Synth.table(spark, 128, partitions = 2).collect().sortBy(_.image_id)
    val b = Synth.table(spark, 128, partitions = 7).collect().sortBy(_.image_id)
    assert(a.length == b.length)
    for ((x, y) <- a.zip(b)) {
      assert(x.image_id == y.image_id && x.phash == y.phash &&
        x.caption == y.caption && java.util.Arrays.equals(x.bytes, y.bytes))
    }
  }

  test("payload survives shuffle + join untouched (PSNR/caption after repartition)") {
    import spark.implicits._
    val t = Synth.table(spark, 48, seed = 7L).toDF()
    val shuffled = t.repartition(5, col("phash"))
      .join(t.select(col("image_id"), col("phash").as("p2")), "image_id")
    val rows = shuffled.as[(String, Array[Byte], Int, Int, String, String, Long, Long)].collect()
    assert(rows.length == 48)
    for ((id, bytes, w, h, fmt, caption, phash, p2) <- rows) {
      assert(phash == p2)
      val dec = Codec.decode(bytes)
      assert(Codec.pHash64(dec) == phash, s"$id payload corrupted in shuffle")
      val i = id.drop(3).toLong
      assert(caption == Synth.caption(id, Codec.mix(7L ^ i)))
    }
  }

  test("hotspot variant plants a hot cell (skew stress input)") {
    val pts = Synth.imagePoints(Synth.table(spark, 400, seed = 42L, hotspotFrac = 0.3).toDF())
    val hist = SpatialOps.tileHistogram(pts.withColumn("id", monotonically_increasing_id()), 6)
      .orderBy(desc("cnt")).limit(1).collect()(0)
    assert(hist.getLong(1) >= 100, s"expected a hot cell, top count = ${hist.getLong(1)}")
  }

  test("derived points are in range and consistent with the phash arithmetic") {
    val rows = Synth.imagePoints(Synth.table(spark, 64).toDF())
      .select("phash", "lat", "lon").collect()
    for (r <- rows) {
      val ph = r.getLong(0); val lat = r.getDouble(1); val lon = r.getDouble(2)
      assert(lat >= -90 && lat < 90 && lon >= -180 && lon < 180)
      assert(lat == ((ph >>> 32) % 180000L) / 1000.0 - 90.0)
      assert(lon == ((ph & 0xFFFFFFFFL) % 360000L) / 1000.0 - 180.0)
    }
  }
}
