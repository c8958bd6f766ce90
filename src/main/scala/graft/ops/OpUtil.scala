package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}

private[graft] object OpUtil {

  /** Materialize a small final result eagerly and release the heavy
    * upstream caches. Operators that persist a wide intermediate (minhash
    * signatures, LSH buckets, shingle arrays) call this so repeated
    * operator invocations in a long-lived session do not accrue
    * MEMORY_AND_DISK storage. persist+count (NOT localCheckpoint): the
    * result's lineage is kept, so an executor loss after the upstream
    * unpersist recomputes from source instead of failing on missing
    * checkpoint blocks — correctness over speed on the rare-loss path.
    * The returned tiny cache is the caller's to unpersist (bounded:
    * pair/top-k row counts). */
  private[graft] def finish(result: DataFrame, upstream: Dataset[_]*): DataFrame = {
    val out = result.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    upstream.foreach(_.unpersist(false))
    out
  }

  /** Stage-or-persist barrier behind every staged-oracle operator: with a
    * `stagePath` the intermediate is checkpointed to parquet and read back
    * (the generated DuckDB oracle reads the SAME bits); without one it is
    * persisted MEMORY_AND_DISK — the CollapseProject recompute barrier
    * either way. The one copy of an idiom that was hand-rolled across five
    * call sites (minhash/simhash/LSH signatures, curation metadata,
    * fingerprints) and would have drifted. */
  private[graft] def stageOrPersist(df: DataFrame,
                                    stagePath: Option[String]): DataFrame =
    stagePath match {
      case Some(p) =>
        // committer-free write (same parquet bits, ~0.2 s less fixed
        // driver cost per staging checkpoint — measured, WriteFloorProbe);
        // the staging dir is transient and re-read immediately, so the
        // Hadoop commit protocol's directory atomicity buys nothing
        org.apache.spark.sql.GraftParquetDirect.write(df, p, overwrite = true)
        df.sparkSession.read.parquet(p)
      case None =>
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** Best-effort recursive delete of a temp tree, with the walk stream
    * CLOSED (Files.walk leaks a directory fd until GC otherwise). The
    * one copy of an idiom that had drifted across three call sites
    * (SparkEntry.tempStore and two Bench staging blocks). */
  private[graft] def deleteTree(root: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    val w = java.nio.file.Files.walk(root)
    val all = try w.iterator().asScala.toSeq finally w.close()
    all.reverse.foreach(p =>
      try java.nio.file.Files.delete(p) catch { case _: Throwable => () })
  }
}
