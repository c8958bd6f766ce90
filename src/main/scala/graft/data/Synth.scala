package graft.data

import graft.img.Codec
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** The engine's primary input row — exactly the `input_hint` shape:
  * (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
  * caption:string, phash:int64). Points are never stored: they derive
  * from phash via [[graft.geo.GeoCols.geoFromPhashLat]]/Lon.
  */
case class ImageRow(image_id: String, bytes: Array[Byte], w: Int, h: Int,
                    fmt: String, caption: String, phash: Long)

/** Deterministic distributed generator for the ImageRow table (FIXTURES.md
  * §1). Fully seeded: row i is a pure function of (seed, i) — no wall
  * clock, no RNG state shared across partitions — so any slice of the
  * table is reproducible on any cluster size (the determinism the
  * resumability story leans on).
  *
  * Replaces the reference's OSM ingest (OSMParser.java:27-94) as the
  * source operator: at 10¹² rows this is `spark.range(n)` → mapPartitions,
  * embarrassingly parallel, no shuffle.
  */
object Synth {

  /** Deterministic caption: 6 base tokens + 0..3 extra tag tokens derived
    * from the same hash — variable length so caption-quality filters have
    * a real distribution to cut (exact-recompute invariant unchanged). */
  def caption(imageId: String, h: Long): String = {
    val base = s"synthetic image $imageId tile scene ${(h & Long.MaxValue) % 1000}"
    val extra = (((h >>> 10) & Long.MaxValue) % 4).toInt
    base + (1 to extra).map(i => s" tag${(h >>> (i * 8)) & 15}").mkString
  }

  /** Generate row i. `hotspotFrac > 0` plants near-identical rasters: hot
    * rows share ONE 64×64 source raster, and the format split below (every
    * 4th row JPEG, the rest PNG) makes the JPEG rows' decoded pixels
    * lossy-perturbed copies of the PNG rows' — perturbations that survive
    * average-hash, so all hot rows share one phash → one hot cell: the
    * skew/salting stress variant. */
  def row(seed: Long, i: Long, hotspotFrac: Double = 0.0): ImageRow = {
    val h0 = Codec.mix(seed ^ i)
    val imageId = f"img$i%012d"
    val hot = hotspotFrac > 0 && ((h0 & Long.MaxValue) % 1000000) < (hotspotFrac * 1000000).toLong
    val w = 32 + ((h0 & Long.MaxValue) % 4).toInt * 16
    val ht = 32 + ((Codec.mix(seed ^ (i + 1)) & Long.MaxValue) % 4).toInt * 16
    val rasterSeed = if (hot) seed else Codec.mix(h0)
    val img = Codec.raster(rasterSeed, if (hot) 64 else w, if (hot) 64 else ht)
    val fmt = if (i % 4 == 0) "jpeg" else "png"
    val bytes = if (fmt == "png") Codec.encodePng(img) else Codec.encodeJpeg(img)
    // phash over the DECODED bytes → self-consistent for lossy formats too
    val phash = Codec.pHash64(Codec.decode(bytes))
    ImageRow(imageId, bytes, img.getWidth, img.getHeight, fmt,
      caption(imageId, h0), phash)
  }

  /** Distributed table: one narrow `spark.range` stage, no shuffle. */
  def table(spark: SparkSession, n: Long, seed: Long = 42L,
            hotspotFrac: Double = 0.0,
            partitions: Int = 0): Dataset[ImageRow] = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, parts).mapPartitions(_.map(i => row(seed, i, hotspotFrac)))
  }

  /** Points-with-payload view: the stored 7 columns plus the derived
    * (lat, lon) — the engine's canonical query input at scale. */
  def imagePoints(images: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.geo.GeoCols
    images.withColumn("lat", GeoCols.geoFromPhashLat(col("phash")))
      .withColumn("lon", GeoCols.geoFromPhashLon(col("phash")))
  }

  /** Pure-arithmetic deterministic point cloud: spark.range + splitmix64
    * Column expressions — no storage, no JVM lambdas, fully codegen'd.
    * Same derivation shape as geoFromPhash (the id hash stands in for the
    * phash). Used to exercise the spatial pipeline at row counts far past
    * what ImageIO generation can stage (the scaling-efficiency input). */
  def pointCloud(spark: SparkSession, n: Long, partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.functions._
    val parts = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism * 4
    spark.range(0, n, 1, parts)
      .withColumn("__h", xxhash64(col("id"))) // wrap-free 64-bit id hash

      .select(col("id"),
        graft.geo.GeoCols.geoFromPhashLat(col("__h")).as("lat"),
        graft.geo.GeoCols.geoFromPhashLon(col("__h")).as("lon"))
  }
}
