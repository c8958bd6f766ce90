package graft.ops

import graft.img.Codec
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Audio-payload operators (the audio leg of the multimodal family).
  * The container is self-describing raw PCM — `[int32 sampleRate]
  * [int32 nSamples] [int16 samples…]` (a WAV body without the RIFF
  * ceremony; no audio libs ship in this environment, and the decode seam
  * is this one [[samples]] function).
  *
  * Feature extraction is REAL signal processing, not a stub: RMS energy,
  * zero-crossing count, and dominant pitch via a Goertzel sweep over
  * semitone bins — all integer/deterministic or quantized before output
  * so results are engine-order-independent. One partition-wise pass;
  * bytes never leave the executor. */
object AudioOps {

  case class AudioRow(audio_id: String, bytes: Array[Byte], sample_rate: Int,
                      n_samples: Int, caption: String)

  case class AudioFeatures(audio_id: String, n_samples: Int, rms_q: Long,
                           zero_crossings: Long, dominant_hz_q: Long)

  def pack(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(8 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(sampleRate).putInt(samples.length)
    samples.foreach(buf.putShort)
    buf.array()
  }

  def samples(container: Array[Byte]): (Int, Array[Short]) = {
    val buf = java.nio.ByteBuffer.wrap(container)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val rate = buf.getInt()
    val n = buf.getInt()
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = buf.getShort(); i += 1 }
    (rate, out)
  }

  /** Deterministic clip table: row i is a two-tone sine mixture whose
    * frequencies/amplitudes derive from the seeded hash — every feature
    * below is predictable from (seed, i). */
  def table(spark: SparkSession, n: Long, seed: Long = 99L,
            partitions: Int = 0): Dataset[AudioRow] = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, parts).mapPartitions(_.map { i =>
      val h0 = Codec.mix(seed ^ i)
      val rate = 8000
      val nSamp = 2048 + ((h0 & Long.MaxValue) % 3).toInt * 1024
      val f1 = 110.0 * math.pow(2.0, ((h0 & Long.MaxValue) % 36).toInt / 12.0) // A2..A5 semitones
      val f2 = f1 * 2.0 // octave overtone at lower amplitude
      val s = Array.tabulate(nSamp) { t =>
        val x = 0.6 * math.sin(2 * math.Pi * f1 * t / rate) +
          0.25 * math.sin(2 * math.Pi * f2 * t / rate)
        (x * 12000).toShort
      }
      AudioRow(f"aud$i%010d", pack(rate, s), rate, nSamp,
        s"synthetic clip aud$i%010d tone ${math.round(f1)}")
    })
  }

  /** Goertzel power of frequency `hz` over the samples. */
  private def goertzel(s: Array[Short], rate: Int, hz: Double): Double = {
    val w = 2 * math.Pi * hz / rate
    val coeff = 2 * math.cos(w)
    var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
    var i = 0
    while (i < s.length) {
      s0 = s(i) + coeff * s1 - s2
      s2 = s1; s1 = s0
      i += 1
    }
    s1 * s1 + s2 * s2 - coeff * s1 * s2
  }

  /** Feature extraction: one typed pass per partition. Quantization
    * (floor ×1000) keeps outputs stable under any summation order the
    * JVM picks. */
  def features(audio: DataFrame): Dataset[AudioFeatures] = {
    import audio.sparkSession.implicits._
    // the semitone grid the generator draws from (A2=110 Hz, 36 steps)
    val bins = (0 until 36).map(k => 110.0 * math.pow(2.0, k / 12.0))
    audio.select(col("audio_id"), col("bytes")).as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, container) =>
        val (rate, s) = samples(container)
        var sumSq = 0.0
        var zc = 0L
        var i = 0
        while (i < s.length) {
          sumSq += s(i).toDouble * s(i)
          if (i > 0 && (s(i) >= 0) != (s(i - 1) >= 0)) zc += 1
          i += 1
        }
        val rms = math.sqrt(sumSq / s.length)
        val dom = bins.maxBy(hz => goertzel(s, rate, hz))
        AudioFeatures(id, s.length,
          math.floor(rms * 1000).toLong, zc,
          math.floor(dom * 1000).toLong)
      })
  }
}
