package graft.ops

import graft.img.Codec
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Video-payload operators (the frame-sample bullet of the multimodal
  * family). No video codec ships in this environment, so the container is
  * a self-describing in-repo format — length-prefixed PNG frames:
  *
  * {{{  [int32 nFrames] ([int32 byteLen][PNG bytes]) * nFrames  }}}
  *
  * The part that matters at 100 TB is the Spark plumbing and it is REAL:
  * the container is an opaque BinaryType column, frame decode runs
  * partition-wise (one executor pass, no driver round-trips), sampled
  * frames re-enter the image pipeline as ordinary ImageRow-shaped rows
  * (decode/embed/resize/phash all apply). Swapping the container codec
  * for a libav-backed one changes only [[frames]]. */
object VideoOps {

  case class VideoRow(video_id: String, bytes: Array[Byte], n_frames: Int,
                      w: Int, h: Int, caption: String)

  case class Frame(video_id: String, frame_idx: Int, bytes: Array[Byte],
                   w: Int, h: Int, phash: Long)

  /** Encode PNG frames into the length-prefixed container. */
  def pack(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(frames.length)
    frames.foreach { f => out.writeInt(f.length); out.write(f) }
    out.flush()
    bos.toByteArray
  }

  /** Decode the container into its PNG frame payloads. */
  def frames(container: Array[Byte]): Seq[Array[Byte]] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(container))
    val n = in.readInt()
    (0 until n).map { _ =>
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      buf
    }
  }

  /** Deterministic video table: video i has 4–8 frames, each a seeded
    * raster that drifts with the frame index (consecutive frames are
    * near-duplicates — the temporal redundancy frame sampling exploits). */
  def table(spark: SparkSession, n: Long, seed: Long = 77L,
            partitions: Int = 0): Dataset[VideoRow] = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, parts).mapPartitions(_.map { i =>
      val h0 = Codec.mix(seed ^ i)
      val nf = 4 + ((h0 & Long.MaxValue) % 5).toInt
      val w = 32; val h = 32
      val fs = (0 until nf).map { f =>
        // frame f reuses the video's base raster seed, nudged per frame
        Codec.encodePng(Codec.raster(Codec.mix(seed ^ i) + f / 4, w, h))
      }
      VideoRow(f"vid$i%010d", pack(fs), nf, w, h,
        s"synthetic clip vid$i%010d frames $nf")
    })
  }

  /** Frame sampling: keep every `everyK`-th frame of each clip, emit them
    * as image-shaped rows (bytes + dims + phash) ready for the image
    * operators. Partition-wise decode of ONLY the sampled frames — the
    * container is sliced by the length prefixes, unsampled frame bytes
    * are never PNG-decoded. */
  def frameSample(videos: DataFrame, everyK: Int): Dataset[Frame] = {
    import videos.sparkSession.implicits._
    videos.select(col("video_id"), col("bytes")).as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, container) =>
        frames(container).zipWithIndex.collect {
          case (png, idx) if idx % everyK == 0 =>
            val img = Codec.decode(png)
            Frame(id, idx, png, img.getWidth, img.getHeight,
              Codec.pHash64(img))
        }
      })
  }
}
