package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}

private[ops] object OpUtil {

  /** Materialize a small final result eagerly (localCheckpoint truncates
    * its lineage into executor-local blocks) and release the heavy
    * upstream caches. Operators that persist a wide intermediate (minhash
    * signatures, LSH buckets, shingle arrays) call this so repeated
    * operator invocations in a long-lived session do not accrue
    * MEMORY_AND_DISK storage: the caller gets a self-contained DataFrame
    * it can act on any number of times. */
  def finish(result: DataFrame, upstream: Dataset[_]*): DataFrame = {
    val out = result.localCheckpoint(true)
    upstream.foreach(_.unpersist(false))
    out
  }
}
