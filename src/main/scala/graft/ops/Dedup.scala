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
    * hash aggregate whose shuffle key is a 128-bit content hash (two
    * independent xxhash64 derivations — the second seeds the stream with a
    * distinct literal), NOT the document text: at 100 TB the exchange
    * carries 16 bytes per row instead of the corpus. Two colliding 64-bit
    * hashes on distinct texts (~2⁻¹²⁸ per pair) is the only divergence
    * from byte-compare semantics — the q23 oracle (GROUP BY text) pins
    * output identity. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(xxhash64(col("text")).as("__h1"),
        xxhash64(lit("graft-dedup-2"), col("text")).as("__h2"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select(col("keeper_id"), col("n_copies"))

  /** Exact n-gram Jaccard near-dup pairs via a shingle inverted index:
    * explode distinct k-gram shingles, self-join on shingle (equi-join),
    * count intersections, compute |A∩B| / |A∪B|.
    *
    * Skew guard: a natural corpus has stop-phrases — ONE shingle shared by
    * f documents contributes f² join rows, so the inverted index drops
    * shingles whose document frequency exceeds `maxShingleDf` (they carry
    * ~zero discriminative Jaccard signal at quadratic cost). Union sizes
    * still count dropped shingles, so affected pairs get a jacc LOWER
    * bound — exact for every pair when no shingle crosses the cap, which
    * holds for the oracle fixtures (cap ≫ fixture max df). */
  def ngramJaccard(docs: DataFrame, k: Int, threshold: Double,
                   maxShingleDf: Long = 100000L): DataFrame = {
    import docs.sparkSession.implicits._
    // shingling as a typed kernel (identical strings to the SQL twin's
    // list_transform: k-token windows joined by single spaces, first-
    // occurrence-distinct), persisted because the inverted-index self-join
    // and the two count joins would otherwise recompute it 4x
    val base = docs
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val toks = text.split(" ")
        if (toks.length < k) Iterator.empty
        else Iterator.single((id, toks.sliding(k).map(_.mkString(" ")).toVector.distinct))
      })
      .toDF("doc_id", "sh")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exAll = base.select(col("doc_id"), explode(col("sh")).as("s"))
    // hot-shingle set as a broadcast anti-join (tiny by construction: only
    // stop-phrases cross the cap) — the f² fan-out never reaches the join
    val hot = exAll.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxShingleDf).select("s")
    val ex = exAll.join(broadcast(hot), Seq("s"), "left_anti")
    val cnts = base.select(col("doc_id"), size(col("sh")).cast("long").as("n"))
    val inter = ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    val out = inter
      .join(cnts.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n", "na"), "a_id")
      .join(cnts.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n", "nb"), "b_id")
      .withColumn("jacc", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jacc") >= threshold)
      .select(col("a_id"), col("b_id"), col("inter"), col("na"), col("nb"), col("jacc"))
    OpUtil.finish(out, base)
  }

  /** Stable 64-bit string hash (splitmix64 over a 31-polynomial prefix) —
    * plain JVM arithmetic, deterministic across runs and partitions. */
  def hash64(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = h * 31 + s.charAt(i); i += 1 }
    graft.img.Codec.mix(h)
  }

  /** MinHash signature kernel: hash each shingle once, then derive the
    * numHashes family members by seed-mixing the 64-bit value (splitmix of
    * h ^ seedConst). Runs as a typed mapPartitions loop: Catalyst's
    * higher-order functions execute interpreted (~3 µs per lambda call),
    * which measured 35 ms/doc for 32×|shingles| evals — the per-partition
    * kernel is ~1000× cheaper and this op needs no SQL-oracle parity. */
  private def withSignatures(docs: DataFrame, k: Int, numHashes: Int): DataFrame = {
    import docs.sparkSession.implicits._
    val seeds = (0 until numHashes).map(s => graft.img.Codec.mix(0xC0FFEEL + s)).toArray
    docs
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val toks = text.split(" ")
        if (toks.length < k) Iterator.empty
        else Iterator.single((id,
          toks.sliding(k).map(_.mkString(" ")).toVector.distinct))
      })
      .map { case (id, sh) =>
        val hs = sh.map(hash64).toArray
        val sig = seeds.map { seed =>
          var m = Long.MaxValue
          var i = 0
          while (i < hs.length) {
            val v = graft.img.Codec.mix(hs(i) ^ seed)
            if (v < m) m = v
            i += 1
          }
          m
        }
        (id, sh, sig)
      }
      .toDF("doc_id", "sh", "sig")
  }

  /** MinHash + LSH banding near-dup detection (the 100 TB dedup path):
    * signature → `bands` band-hashes → explode → group by (band, hash) →
    * intra-bucket candidate pairs → exact Jaccard refine on the candidate
    * set only. Output: verified pairs (a_id, b_id, jacc >= threshold).
    * Candidate generation is a single shuffle on band-hash; refinement
    * joins back the (distinct-shingle) arrays for exact verification.
    */
  /** `stagePath`: when set, the signature stage is WRITTEN to parquet and
    * read back, so the banding+bucket-join+refine dataflow downstream runs
    * over bits an external engine can also read — that is how the q25
    * driver check oracle-verifies the LSH dataflow in DuckDB even though
    * the signature kernel itself is not SQL-expressible. (At warehouse
    * scale this is exactly the production shape: signatures are a
    * checkpointed table, not a transient cache.) */
  def minhashLsh(docs: DataFrame, k: Int = 5, numHashes: Int = 32,
                 bands: Int = 8, threshold: Double = 0.5,
                 stagePath: Option[String] = None): DataFrame = {
    // rows-per-band must be a positive exact division: rows=0 makes every
    // band key the hash of an empty slice (one global bucket = all-pairs
    // join), and a remainder silently drops signature values from the
    // banding, weakening recall below the configured (bands, rows) math
    require(bands >= 1 && numHashes % bands == 0 && numHashes / bands >= 1,
      s"bands ($bands) must divide numHashes ($numHashes) with >= 1 row per band")
    val rows = numHashes / bands
    // Persist the signature stage: without a materialization barrier the
    // signature kernel would rerun for every band projection and both
    // sides of the candidate self-join (CollapseProject inlining measured
    // at ~20× recompute before the barrier + kernel fix: 312 s → ~2 s on
    // 5k docs). At warehouse scale this stage is a checkpoint into the
    // snapshot store; here MEMORY_AND_DISK is the same barrier.
    val sigs = withSignatures(docs, k, numHashes)
    val base = OpUtil.stageOrPersist(sigs, stagePath)
    val banded = base.select(col("doc_id"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(slice(col("sig"), b * rows + 1, rows))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandhash")
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bandhash") === col("b.bandhash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    val out = cand
      .join(base.select(col("doc_id").as("a_id"), col("sh").as("sha")), "a_id")
      .join(base.select(col("doc_id").as("b_id"), col("sh").as("shb")), "b_id")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("jacc", col("inter") /
        (size(col("sha")).cast("long") + size(col("shb")).cast("long") - col("inter")))
      .filter(col("jacc") >= threshold)
      .select(col("a_id"), col("b_id"), col("jacc"))
    // staged path: the parquet write IS the materialization barrier and
    // there is no cache to release
    if (stagePath.isDefined) out else OpUtil.finish(out, base)
  }

  /** Streaming exact dedup (ingestion-time): the Structured Streaming form
    * of [[exact]]. Keyed by the same 128-bit content hash; per key a
    * [[org.apache.spark.sql.streaming.GroupState]] holds the keeper doc_id
    * (16-byte key + 8-byte value — state stays tiny no matter the corpus).
    * Each arriving document emits one assignment row
    * `(doc_id, keeper_id, is_first)`: the downstream pipeline keeps
    * is_first rows and routes duplicates to their keeper. Keeper = min
    * doc_id seen so far (within a micro-batch the min is taken across the
    * batch, so intra-batch arrival order never matters; across batches it
    * is first-wins, the ingestion-time contract).
    *
    * State bound at 10¹² docs: the keeper map grows with distinct keys;
    * `ttlMs` is the production bound — a ProcessingTimeTimeout per key,
    * re-armed on every arrival, with `state.remove()` on expiry: exact
    * dedup within the TTL window, a fresh window (new keeper) after. The
    * timeout is registered ONLY when a TTL is configured: an armed
    * processing-time timeout makes the micro-batch engine self-trigger
    * to fire expiries, which the drain-synchronously harness
    * (processAllAvailable) cannot quiesce — TTL deployments run on real
    * triggers (the spec uses checkpointed AvailableNow restarts with a
    * real clock), while the default NoTimeout path drains cleanly. */
  def streamDedupAssign(docs: DataFrame, ttlMs: Option[Long] = None): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val timeoutConf = if (ttlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    docs
      .select(col("doc_id"), xxhash64(col("text")).as("h1"),
        xxhash64(lit("graft-dedup-2"), col("text")).as("h2"))
      .as[(Long, Long, Long)]
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (_: (Long, Long), rows: Iterator[(Long, Long, Long)], state: GroupState[Long]) => {
          if (state.hasTimedOut) {
            // TTL expiry (invoked with no rows): evict the keeper — the
            // next arrival of this content hash opens a fresh window
            state.remove()
            Iterator.empty
          } else {
            val ids = rows.map(_._1).toArray.sorted
            val known = state.getOption
            // first-wins: the keeper assigned when the key first appears is
            // stable forever (already-emitted assignments can't be revised
            // in append mode) — min over the first batch makes intra-batch
            // order irrelevant
            val keeper = known.getOrElse(ids.head)
            state.update(keeper)
            // re-arm per arrival: the window is TTL-since-last-seen
            ttlMs.foreach(state.setTimeoutDuration)
            ids.iterator.map(id => (id, keeper, known.isEmpty && id == keeper))
          }
        })
      .toDF("doc_id", "keeper_id", "is_first")
  }

  /** Drain [[streamDedupAssign]] over a parquet file source and reduce the
    * assignments to the batch [[exact]] shape (keeper_id, n_copies) — the
    * driver-facing stream==batch check (same pattern as
    * [[EventOps.streamWindowAgg]]). */
  def streamDedup(spark: org.apache.spark.sql.SparkSession, dir: String,
                  glob: String = "documents.parquet"): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val name = s"graft_dedup_stream_${System.nanoTime()}"
    val src = spark.readStream.schema(schema).option("pathGlobFilter", glob).parquet(dir)
    val q = streamDedupAssign(src).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
      .groupBy(col("keeper_id")).agg(count(lit(1)).as("n_copies"))
      .select(col("keeper_id"), col("n_copies"))
  }

  /** 64-bit SimHash over token hashes: per bit, sum ±1 across tokens
    * (with multiplicity), set bit if positive. Typed kernel (the 64-bit ×
    * |tokens| loop is interpreter-hostile as Column HOFs — same finding as
    * the MinHash signature); deterministic [[hash64]] token hashing. */
  def simhash(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val counts = new Array[Int](64)
        for (t <- text.split(" ")) {
          val h = hash64(t)
          var b = 0
          while (b < 64) {
            counts(b) += (((h >>> b) & 1L).toInt * 2) - 1
            b += 1
          }
        }
        var sim = 0L
        var b = 0
        while (b < 64) { if (counts(b) > 0) sim |= (1L << b); b += 1 }
        (id, sim)
      })
      .toDF("doc_id", "simhash")
  }

  /** Generalized Hamming blocking (Manku et al., WWW'07 shape), shared by
    * SimHash (doc_id, simhash) and the image phash twin
    * ([[ImageOps.phashNearDup]]): split the 64-bit hash into `blocks`
    * equal-width blocks and key each row by every combination of
    * (blocks − maxHamming) block values. Pigeonhole soundness: ≤ maxHamming
    * differing bits touch ≤ maxHamming blocks, so some (blocks − maxHamming)
    * blocks are all bit-equal, and that exact combination collides.
    * Candidates refine with bit_count(xor) ≤ maxHamming — no recall loss.
    *
    * `blocks` tunes bucket population against replication:
    *  - blocks=4, d≤3 (default): 4 single-16-bit-block keys — the classic
    *    quarter blocking; candidate set identical to it. Key space 2¹⁸:
    *    right for ≤10⁸-row corpora, quadratic intra-bucket blowup past it.
    *  - blocks=8, d≤3: C(8,5)=56 keys/row of 40 meaningful bits. At the
    *    10¹²-row design point: 5.6·10¹³ keyed rows over ~2⁴⁶ (combo, key)
    *    buckets ≈ 1 row/bucket expected (≈51/bucket if hashes concentrated
    *    into one combo) — intra-bucket pairs stay linear, the replication
    *    is a constant 56×. This is the 100 TB setting.
    */
  private[graft] def hammingBlockPairs(df: DataFrame, idCol: String,
                                       hashCol: String, maxHamming: Int,
                                       blocks: Int = 4): DataFrame = {
    require(blocks > maxHamming,
      s"need more blocks than differing bits for pigeonhole recall: blocks=$blocks maxHamming=$maxHamming")
    require(64 % blocks == 0 && blocks >= 2 && blocks <= 32,
      s"blocks must divide 64 (2..32), got $blocks")
    val width = 64 / blocks
    val mask = (1L << width) - 1
    val keep = blocks - maxHamming
    val combos = (0 until blocks).combinations(keep).toSeq
    // C(blocks, maxHamming) is the per-row replication factor AND the key
    // expression count; past ~64 the generated key array also exceeds
    // whole-stage codegen's 64KB method limit — reject configs no deployment
    // should run instead of silently dropping to interpreted execution
    require(combos.size <= 64,
      s"C($blocks,$keep)=${combos.size} key combinations — replication too high; " +
        "use fewer blocks (blocks=maxHamming+1 minimizes replication)")
    // one 64-bit key per combination: xxhash64(comboId, block values...) —
    // combo id in the key keeps different combos in disjoint buckets
    val keys = combos.zipWithIndex.map { case (combo, ci) =>
      xxhash64((lit(ci.toLong) +: combo.map(b =>
        shiftrightunsigned(col(hashCol), b * width).bitwiseAND(lit(mask)))): _*)
    }
    val blocked = df.select(col(idCol).as("__id"), col(hashCol).as("__h"),
      explode(array(keys: _*)).as("bk"))
    blocked.as("a").join(blocked.as("b"),
        col("a.bk") === col("b.bk") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("a_id"), col("b.__id").as("b_id"),
        bit_count(col("a.__h").bitwiseXOR(col("b.__h"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** SimHash near-dup pairs: Hamming blocking ([[hammingBlockPairs]] —
    * quarter keys by default, more/narrower blocks at corpus scale), then
    * refine with bit_count(xor) <= maxHamming. With `stagePath` the
    * (doc_id, simhash) table is checkpointed to parquet so the blocking
    * join + refine dataflow is DuckDB-oracle-checked (q26b). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3, blocks: Int = 4,
                   stagePath: Option[String] = None): DataFrame = {
    val shRaw = simhash(docs)
    val sh = OpUtil.stageOrPersist(shRaw, stagePath)
    val out = hammingBlockPairs(sh, "doc_id", "simhash", maxHamming, blocks)
    if (stagePath.isDefined) out else OpUtil.finish(out, sh)
  }
}
