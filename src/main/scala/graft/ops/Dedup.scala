package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale ladder: exact (one hash aggregate) → MinHash+LSH (band-bucketed
  * candidate join, near-linear) → exact n-gram Jaccard (shingle-inverted-
  * index self-join, the verification primitive LSH candidates are refined
  * with). At 100 TB the LSH path is the only all-pairs-feasible one; the
  * exact path runs per-bucket on LSH candidates (as `minhashLsh` does).
  */
object Dedup {

  /** Exact dedup: group identical texts, keep min doc_id. One partial+final
    * hash aggregate; at scale, group on xxhash64(text) first and compare
    * texts only within hash buckets (collision-free in practice). */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select(col("keeper_id"), col("n_copies"))

  /** Exact n-gram Jaccard near-dup pairs via a shingle inverted index:
    * explode distinct k-gram shingles, self-join on shingle (equi-join —
    * shuffles on the shingle key, skew-safe because shingles are
    * high-cardinality), count intersections, compute |A∩B| / |A∪B|.
    */
  def ngramJaccard(docs: DataFrame, k: Int, threshold: Double): DataFrame = {
    val base = docs
      .filter(size(TextOps.tokens(col("text"))) >= k)
      .select(col("doc_id"), TextOps.shingles(TextOps.tokens(col("text")), k).as("sh"))
    val ex = base.select(col("doc_id"), explode(col("sh")).as("s"))
    val cnts = base.select(col("doc_id"), size(col("sh")).cast("long").as("n"))
    val inter = ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    inter
      .join(cnts.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n", "na"), "a_id")
      .join(cnts.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n", "nb"), "b_id")
      .withColumn("jacc", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jacc") >= threshold)
      .select(col("a_id"), col("b_id"), col("inter"), col("na"), col("nb"), col("jacc"))
  }

  /** MinHash signature: numHashes mins of xxhash64(shingle, seed). The hash
    * family is xxhash64 over (shingle, seed) pairs — one pass over the
    * shingle array per row, all HOF expressions. */
  private def minhashSig(sh: org.apache.spark.sql.Column, numHashes: Int) =
    transform(sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(sh, x => xxhash64(x, s))))

  /** MinHash + LSH banding near-dup detection (the 100 TB dedup path):
    * signature → `bands` band-hashes → explode → group by (band, hash) →
    * intra-bucket candidate pairs → exact Jaccard refine on the candidate
    * set only. Output: verified pairs (a_id, b_id, jacc >= threshold).
    * Candidate generation is a single shuffle on band-hash; refinement
    * joins back the (distinct-shingle) arrays for exact verification.
    */
  def minhashLsh(docs: DataFrame, k: Int = 5, numHashes: Int = 32,
                 bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    val base = docs
      .filter(size(TextOps.tokens(col("text"))) >= k)
      .select(col("doc_id"), TextOps.shingles(TextOps.tokens(col("text")), k).as("sh"))
    val sig = base.withColumn("sig", minhashSig(col("sh"), numHashes))
    val banded = sig.select(col("doc_id"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(slice(col("sig"), b * rows + 1, rows))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandhash")
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bandhash") === col("b.bandhash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    cand
      .join(base.select(col("doc_id").as("a_id"), col("sh").as("sha")), "a_id")
      .join(base.select(col("doc_id").as("b_id"), col("sh").as("shb")), "b_id")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("jacc", col("inter") /
        (size(col("sha")).cast("long") + size(col("shb")).cast("long") - col("inter")))
      .filter(col("jacc") >= threshold)
      .select(col("a_id"), col("b_id"), col("jacc"))
  }

  /** 64-bit SimHash over token xxhash64 values: per bit, sum ±1 across
    * tokens (with multiplicity), set bit if positive. Bit loop statically
    * unrolled (shift amounts are compile-time); token loop is an HOF
    * aggregate — one pass per bit over the hash array, all codegen'd. */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val hashes = transform(toks, t => xxhash64(t))
    val sim = (0 until 64).map { b =>
      val bitSum = aggregate(hashes, lit(0L),
        (s, h) => s + shiftrightunsigned(h, b).bitwiseAND(lit(1L)) * 2 - 1)
      shiftleft(when(bitSum > 0, lit(1L)).otherwise(lit(0L)), b)
    }.reduce(_ bitwiseOR _)
    docs.select(col("doc_id"), sim.as("simhash"))
  }

  /** SimHash near-dup pairs: block on 16-bit quarters (a pair within
    * Hamming distance 3 shares at least one exact quarter), then refine
    * with bit_count(xor) <= maxHamming. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simhash(docs)
    val blocked = sh.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(q =>
        shiftrightunsigned(col("simhash"), q * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "q").withColumnRenamed("col", "qh")
    blocked.as("a").join(blocked.as("b"),
        col("a.q") === col("b.q") && col("a.qh") === col("b.qh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
