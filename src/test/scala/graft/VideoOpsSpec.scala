package graft

import graft.img.Codec
import graft.ops.VideoOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Frame-sampling over the opaque video container: container round-trip,
  * sampling arithmetic, decoded-frame invariants, and the handoff into the
  * image pipeline. */
class VideoOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val vids = VideoOps.table(spark, 40).toDF().cache()

  test("container round-trips frames byte-exactly") {
    for (r <- vids.collect().take(10)) {
      val fs = VideoOps.frames(r.getAs[Array[Byte]](1))
      assert(fs.length == r.getInt(2))
      fs.foreach { png =>
        val img = Codec.decode(png)
        assert(img.getWidth == r.getInt(3) && img.getHeight == r.getInt(4))
      }
    }
  }

  test("frameSample keeps exactly every k-th frame; phash matches direct decode") {
    val byId = vids.collect().map(r =>
      r.getString(0) -> (r.getAs[Array[Byte]](1), r.getInt(2))).toMap
    for (k <- Seq(1, 2, 3)) {
      val got = VideoOps.frameSample(vids, k).collect()
        .groupBy(_.video_id).view.mapValues(_.sortBy(_.frame_idx)).toMap
      assert(got.keySet == byId.keySet)
      for ((id, (container, nf)) <- byId) {
        val sampled = got(id)
        assert(sampled.map(_.frame_idx).toSeq == (0 until nf by k).toSeq, s"$id k=$k")
        val all = VideoOps.frames(container)
        sampled.foreach { f =>
          assert(java.util.Arrays.equals(f.bytes, all(f.frame_idx)))
          assert(f.phash == Codec.pHash64(Codec.decode(all(f.frame_idx))))
        }
      }
    }
  }

  test("sampled frames feed the image pipeline (near-dup consecutive frames)") {
    // consecutive frames share a raster seed in blocks of 4 → phash
    // near-dups within a clip; the image near-dup operator finds them
    val frames = VideoOps.frameSample(vids, 1).toDF()
      .selectExpr("concat(video_id, '#', frame_idx) AS image_id", "phash")
    val pairs = graft.ops.ImageOps.phashNearDup(frames, maxHamming = 3)
      .collect().map(r => (r.getString(0), r.getString(1)))
    // same-clip pairs from the same 4-frame block must surface
    val sameClip = pairs.filter { case (a, b) =>
      a.split("#")(0) == b.split("#")(0)
    }
    assert(sameClip.nonEmpty, "expected intra-clip near-duplicate frames")
  }
}
