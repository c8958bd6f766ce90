package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Windowed event aggregation over the `events` table — batch and
  * Structured Streaming forms of the SAME transform (the streaming graph is
  * the batch graph under incremental execution; both are oracle-checked
  * against the same SQL).
  *
  * Money-style values are aggregated as exact integer cents
  * (floor(value*100)) — double sums are order-dependent across engines and
  * would break bit-exact comparison; integer sums are associative.
  */
object EventOps {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Tumbling 1-hour window per event_type: count + exact integer sum. */
  def windowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hr_ts"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(floor(col("value") * 100).cast("long")).as("sum_cents"))
      .select(unix_timestamp(col("hr_ts")).as("hr"), col("event_type"),
        col("cnt"), col("sum_cents"))

  private val sinkCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The same aggregation as a Structured Streaming query: file source →
    * stateful windowed agg → memory sink (complete mode), drained
    * synchronously. In production this is readStream from the table
    * location with a watermark; the memory sink keeps the driver's
    * batch-verify contract runnable. */
  def streamWindowAgg(spark: SparkSession, dir: String, glob: String = "events.parquet"): DataFrame = {
    val name = s"graft_stream_${sinkCounter.incrementAndGet()}"
    val src = spark.readStream.schema(eventsSchema)
      .option("pathGlobFilter", glob).parquet(dir)
    val q = windowAgg(src).writeStream
      .format("memory").queryName(name).outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  /** Streaming spatial ingestion: the tile-histogram pipeline as a
    * Structured Streaming query — file source over the raw table, the
    * SAME derive-points + cell aggregation as the batch op, complete-mode
    * memory sink drained synchronously. Proves the spatial path runs
    * incrementally (new files → updated per-tile counts) under the batch
    * oracle. In production the sink is the snapshot store and the
    * trigger is per-drop. */
  def streamTileHistogram(spark: SparkSession, dir: String,
                          r: Int = graft.data.Fixtures.TileRes): DataFrame = {
    val name = s"graft_streamtiles_${sinkCounter.incrementAndGet()}"
    val schema = spark.read.parquet(s"$dir/lineitem.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("pathGlobFilter", "lineitem.parquet").parquet(dir)
    val pts = graft.data.Points.derive(src) // one definition, batch + stream
    val agg = pts
      .groupBy(graft.geo.GeoCols.cellCol(col("lat"), col("lon"), r).as("cell"))
      .agg(count(lit(1)).as("cnt"))
    val q = agg.writeStream
      .format("memory").queryName(name).outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  /** Stateless streaming spatial join — the multi-box join under
    * incremental execution: each micro-batch's derived points hash-join
    * the broadcast covering cells (stream-static join, static side built
    * once) and refine exactly; append mode, no state, no watermark. This
    * is the "point entered zone" alerting shape at ingest latency, under
    * the SAME oracle as the batch join (stateless ⇒ stream == batch). */
  def streamBoxJoin(spark: SparkSession, dir: String,
                    boxes: Seq[(Int, graft.geo.MBR)] = graft.data.Fixtures.boxes,
                    r: Int = graft.data.Fixtures.JoinRes): DataFrame = {
    val name = s"graft_streambox_${sinkCounter.incrementAndGet()}"
    val schema = spark.read.parquet(s"$dir/lineitem.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("pathGlobFilter", "lineitem.parquet").parquet(dir)
    val out = graft.ops.SpatialOps.boxJoin(graft.data.Points.derive(src), boxes, r)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  /** Watermarked sliding-window variant (streaming-only semantics: late
    * rows beyond the watermark are dropped) — exercised by the streaming
    * spec; batch data arrives in one micro-batch so nothing is late. */
  def streamWindowAggWatermarked(spark: SparkSession, dir: String,
                                 glob: String = "events.parquet"): DataFrame = {
    val name = s"graft_streamw_${sinkCounter.incrementAndGet()}"
    val src = spark.readStream.schema(eventsSchema)
      .option("pathGlobFilter", glob).parquet(dir)
    val agg = src.withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("window.start")).as("hr"), col("event_type"), col("cnt"))
    val q = agg.writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}
