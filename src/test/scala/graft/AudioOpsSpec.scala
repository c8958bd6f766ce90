package graft

import graft.img.Codec
import graft.ops.AudioOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Audio container + feature extraction: round-trip, dominant-pitch
  * recovery of the planted tone, and determinism across partitionings. */
class AudioOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val clips = AudioOps.table(spark, 60).toDF().cache()

  test("container round-trips samples exactly") {
    for (r <- clips.collect().take(10)) {
      val (rate, s) = AudioOps.samples(r.getAs[Array[Byte]](1))
      assert(rate == r.getInt(2) && s.length == r.getInt(3))
    }
  }

  test("features recover the planted tone; RMS/zero-crossings match direct computation") {
    val feats = AudioOps.features(clips).collect().map(f => f.audio_id -> f).toMap
    for (r <- clips.collect()) {
      val id = r.getString(0)
      // the generator's fundamental derives from the same seeded hash
      val i = id.stripPrefix("aud").toLong
      val h0 = Codec.mix(99L ^ i)
      val f1 = 110.0 * math.pow(2.0, ((h0 & Long.MaxValue) % 36).toInt / 12.0)
      val got = feats(id)
      assert(got.dominant_hz_q == math.floor(f1 * 1000).toLong,
        s"$id planted ${f1}Hz, got ${got.dominant_hz_q / 1000.0}")
      // direct recomputation of RMS and crossings
      val (_, s) = AudioOps.samples(r.getAs[Array[Byte]](1))
      val rms = math.sqrt(s.map(x => x.toDouble * x).sum / s.length)
      assert(got.rms_q == math.floor(rms * 1000).toLong)
      val zc = (1 until s.length).count(j => (s(j) >= 0) != (s(j - 1) >= 0))
      assert(got.zero_crossings == zc)
      assert(got.n_samples == s.length)
    }
  }

  test("features are partitioning-invariant") {
    val a = AudioOps.features(clips).collect()
      .map(f => (f.audio_id, f.rms_q, f.zero_crossings, f.dominant_hz_q)).sortBy(_._1).toSeq
    val b = AudioOps.features(clips.repartition(11)).collect()
      .map(f => (f.audio_id, f.rms_q, f.zero_crossings, f.dominant_hz_q)).sortBy(_._1).toSeq
    assert(a == b)
  }
}
