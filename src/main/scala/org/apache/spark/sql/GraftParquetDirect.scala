package org.apache.spark.sql

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.parquet.hadoop.ParquetOutputFormat
import org.apache.spark.TaskContext
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.util.SerializableConfiguration

/** Committer-free parquet write for [[graft.table.SnapshotStore]]'s data
  * units.
  *
  * `df.write.parquet` routes through `InsertIntoHadoopFsRelationCommand` /
  * `FileFormatWriter`: job-level committer setup, per-task temp dirs +
  * commit renames, write-stats trackers and a post-write catalog refresh —
  * measured at ~0.2 s of fixed driver cost per invocation on this host
  * (a 100-row write costs ~0.25 s vs ~0.05 s for the noop sink), paid by
  * every append/delete/compact of every store in the bench sweep. That
  * protocol exists to make THE DIRECTORY the atomic unit. The snapshot
  * store never relies on directory atomicity: its manifest commit is the
  * atomicity point (readers only ever open manifest-listed paths), which
  * is exactly why real table formats (Iceberg's write path) have tasks
  * write uniquely-named immutable files directly and commit via metadata.
  *
  * So: run the clustered plan as a plain RDD job; each non-empty partition
  * opens ONE parquet file under a unique, attempt-qualified name via
  * Spark's own `ParquetWriteSupport` (same bits, same encodings, same
  * column statistics as the built-in writer — this is the identical
  * `WriteSupport` class `ParquetFileFormat.prepareWrite` installs) and the
  * driver gets back the (name, rows) of every SUCCESSFUL task's file. A
  * failed or speculatively re-run attempt may orphan a partial file in the
  * unit dir; callers pass the returned names to `footerStats(only = …)` so
  * such orphans never reach the manifest, and readers never list dirs.
  *
  * Lives in `org.apache.spark.sql` for the same reason as
  * [[GraftColumnBridge]]: `classic.Dataset.queryExecution` and
  * `SerializableConfiguration` sit behind `private[sql]`/`private[spark]`.
  */
object GraftParquetDirect {

  /** Write `df` as one parquet file per non-empty partition into `dir`
    * (created; must not already exist — `SaveMode.ErrorIfExists`
    * semantics, unless `overwrite`, which deletes an existing target
    * first like `SaveMode.Overwrite`). Returns the written
    * (fileName, rowCount) pairs in partition order; writes one empty
    * schema-bearing file when every partition is empty, like the
    * built-in writer, so the dir stays readable. */
  def write(df: Dataset[Row], dir: String,
            overwrite: Boolean = false): Seq[(String, Long)] = {
    val spark = df.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    conf.set(ParquetOutputFormat.WRITE_SUPPORT_CLASS,
      classOf[ParquetWriteSupport].getName)
    ParquetWriteSupport.setSchema(df.schema, conf)
    // ParquetWriteSupport.init ASSERTS these keys are present; the session
    // conf copy in newHadoopConf() only carries explicitly-set entries, so
    // mirror ParquetFileFormat.prepareWrite and pin the effective values.
    val sqlConf = spark.sessionState.conf
    Seq(internal.SQLConf.PARQUET_WRITE_LEGACY_FORMAT,
        internal.SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE,
        internal.SQLConf.PARQUET_REBASE_MODE_IN_WRITE,
        internal.SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE,
        internal.SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED,
        internal.SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE,
        internal.SQLConf.SESSION_LOCAL_TIMEZONE)
      .foreach(e => conf.set(e.key, sqlConf.getConfString(e.key, e.defaultValueString)))
    val codec = spark.conf
      .get("spark.sql.parquet.compression.codec", "snappy")
      .toLowerCase match {
        case "none" | "uncompressed" => "UNCOMPRESSED"
        case c                       => c.toUpperCase
      }
    conf.set(ParquetOutputFormat.COMPRESSION, codec)
    val fsPath = new Path(dir)
    val fs = fsPath.getFileSystem(conf)
    if (fs.exists(fsPath)) {
      if (overwrite) fs.delete(fsPath, true)
      else throw new AnalysisException(
        errorClass = "PATH_ALREADY_EXISTS",
        messageParameters = Map("outputPath" -> dir))
    }
    fs.mkdirs(fsPath)
    val ser = new SerializableConfiguration(conf)
    val uuid = java.util.UUID.randomUUID().toString.take(8)
    val ext =
      if (codec == "UNCOMPRESSED") ".parquet"
      else "." + codec.toLowerCase + ".parquet"
    val rdd = df.asInstanceOf[classic.Dataset[Row]].queryExecution.toRdd
    val written: Seq[(String, Long)] =
      if (rdd.getNumPartitions == 0) Seq.empty
      else spark.sparkContext
        .runJob(rdd, (tc: TaskContext, it: Iterator[InternalRow]) =>
          writeOne(ser, dir, uuid, ext, tc.partitionId(), tc.attemptNumber(),
            it, force = false))
        .flatten.toSeq
    if (written.nonEmpty) written
    else writeOne(ser, dir, uuid, ext, 0, 0,
      Iterator.empty, force = true).toSeq
  }

  /** One task's (or the driver's empty-fallback) file. The attempt number
    * is part of the name: a re-run attempt can never collide with — or
    * half-overwrite — a prior attempt's file. */
  private def writeOne(ser: SerializableConfiguration, dir: String,
                       uuid: String, ext: String, pid: Int, attempt: Int,
                       it: Iterator[InternalRow],
                       force: Boolean): Option[(String, Long)] = {
    if (!force && !it.hasNext) return None
    val name = f"part-$pid%05d-$uuid-a$attempt$ext"
    val out = new Path(dir, name)
    val tac = new TaskAttemptContextImpl(ser.value,
      new TaskAttemptID(new TaskID(new JobID(uuid, 0), TaskType.MAP, pid),
        attempt))
    val fmt = new ParquetOutputFormat[InternalRow]() {
      override def getDefaultWorkFile(
          c: org.apache.hadoop.mapreduce.TaskAttemptContext,
          e: String): Path = out
    }
    val w = fmt.getRecordWriter(tac)
    var rows = 0L
    try {
      while (it.hasNext) { w.write(null, it.next()); rows += 1 }
    } finally w.close(tac)
    Some((name, rows))
  }
}
