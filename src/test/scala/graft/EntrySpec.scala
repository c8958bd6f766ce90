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

  test("every query has either an oracle or a documented rows-only status") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracle without query: ${os -- qs}")
    val rowsOnly = qs -- os
    // the intentional rows-only set (hash-based / image ops)
    assert(rowsOnly == Set("q25_minhash_lsh", "q26_simhash", "q26b_simhash_pairs",
      "q27_fingerprint", "q28b_ann_ivf", "q28c_ann_lsh", "q28d_ann_ivf_kmeans",
      "q40_image_decode", "q41_image_embed", "q42_image_resize", "q43_image_neardup",
      "q44_frame_sample", "q45_audio_features"),
      s"unexpected rows-only queries: $rowsOnly")
  }
}
