package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: SparkEntry.entry returns rows. */
class EntrySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("entry produces rows on sf0.001 (driver smoke)") {
    val n = SparkEntry.entry(spark).count()
    assert(n > 0, s"entry returned $n rows")
  }

  test("entry output is independent of the input partition layout") {
    // the flagship (box_id, id) rows must be identical however the image
    // table is partitioned — ids derive from xxhash64(image_id), never
    // from monotonically_increasing_id (SURVEY §7.5 determinism)
    import org.apache.spark.sql.functions._
    def run(parts: Int) = {
      val pts = graft.data.Synth.imagePoints(
          graft.data.Synth.table(spark, 2000, partitions = parts).toDF())
        .withColumn("id", xxhash64(col("image_id")))
      graft.ops.SpatialOps.boxJoin(pts, graft.data.Fixtures.boxes)
        .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    }
    val a = run(3)
    val b = run(17)
    assert(a.nonEmpty && a == b, "entry rows changed with partition count")
  }

  test("every query has either an oracle or a documented rows-only status") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracle without query: ${os -- qs}")
    val rowsOnly = qs -- os
    // the intentional rows-only set: PURE per-row kernels only (every
    // multi-operator dataflow — joins, banding, routing, ranking — is
    // oracle-checked, via staged tables where the kernel output is the
    // dataflow's input)
    assert(rowsOnly == Set("q26_simhash", "q27_fingerprint",
      "q40_image_decode", "q41_image_embed", "q42_image_resize",
      "q44_frame_sample", "q45_audio_features",
      "q47_image_crop", "q48_image_augment",
      // integrity checks: the kernels (decode, phash, PSNR) ARE the whole
      // dataflow — q51b's only join is the trivial image_id equality that
      // feeds the PSNR kernel; planted-corruption exactness is spec-pinned
      "q51_pair_integrity", "q51b_transcode_qa"),
      s"unexpected rows-only queries: $rowsOnly")
  }
}
