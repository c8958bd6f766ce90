package graft.table

import graft.geo.{CellId, GeoCols, MBR}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}

/** One file tracked by a snapshot, with its pruning stats and the
  * lineage unit that produced it — the manifest-entry analog of an Iceberg
  * DataFile (per-file cell-range stats replace the reference's per-node
  * MBRs, IndexFile.java:37-95, at file granularity).
  *
  * `kind` is "data" for data files, "delete" for equality-delete
  * tombstone files (Iceberg-v2-shaped: a parquet of key rows whose exact
  * matches are dead in every data file committed BEFORE the tombstone —
  * sequence-scoped, so later re-inserts stay live — until a compaction
  * folds the deletes in and purges them).
  *
  * `seq` is the Iceberg-style sequence number: the snapshot id of the
  * commit that introduced the entry, PERSISTED so delete scoping never
  * depends on the physical row order of the manifest (manifests written
  * before the field existed get their row index as the sequence — the
  * exact ordering semantics they were written under). */
final case class FileEntry(path: String, rows: Long, minZ: Long, maxZ: Long,
                           minLat: Double, maxLat: Double,
                           minLon: Double, maxLon: Double,
                           lineageId: String, wallMs: Long,
                           kind: String = "data", seq: Long = 0L)

/** Minimal Iceberg-shaped table format (SURVEY.md §7.4). Real Iceberg jars
  * aren't in this environment, so the same semantics are implemented
  * in-repo with a seam to swap the real thing:
  *
  * {{{
  * <root>/data/<lineage>-<uuid>/part-*.parquet        immutable data files
  * <root>/meta/snap-<n>                               manifest (JSON of FileEntry;
  *                                                    legacy parquet DIRS still read)
  * <root>/meta/current                                atomic pointer "n"
  * <root>/meta/table.json                             pinned layout (curve, zRes)
  * <root>/meta/{hist,bloom,index}/<lineage>-<id>.json write-time sidecars
  * }}}
  *
  * Commits append a new manifest = parent's entries + new entries, then
  * atomically swing `current` (write-temp + ATOMIC_MOVE). Readers plan
  * from a snapshot: file pruning by Z-range against a query box's covering
  * cells — the distributed analog of the reference's subtree prune
  * (RStarTree.java:426) at file granularity. Per-append lineage ids +
  * wall-clock metrics make multi-unit jobs resumable: a rerun skips units
  * already present in the current snapshot ([[resumableRun]]).
  *
  * Scale note — manifest size: a flat manifest is O(file count); at the
  * 10¹²-row design point (~10⁶ files of ~100 MB) that is a few hundred MB
  * of driver-side JSON per read. Past `manifestShardRows` data entries a
  * commit therefore writes Iceberg's TWO-LEVEL shape — a manifest LIST
  * whose rows carry per-shard Z/lat-lon union bounds, data entries
  * chunked into shard files — and box reads download only the shards
  * overlapping the query ([[manifestPartial]]); flat and legacy
  * manifests still read through the same parser. Commits onto a sharded
  * parent REUSE its shard files by reference and write only their own
  * entries as a new shard, so the commit path is O(commit size), not
  * O(table) ([[writeManifestFile]]); [[compact]] re-chunks globally
  * (Iceberg's rewrite-manifests analog). Key lookups ([[lookupByKey]])
  * prune shards through the lineage summaries: the per-unit Bloom
  * sidecars name the units that might hold a probed key, and only
  * shards carrying those units (or units with no consulted sidecar —
  * fail open) are parsed. The remaining O(table) term on the lookup
  * path is the Bloom sidecar read itself — the index being consulted.
  * Compaction bounds entry-count growth between appends either way.
  */
/** What a commit wrote, for read-back verification: `fullExpect` is the
  * complete expected entry list when the root was written whole (flat
  * root, first sharding conversion, or a replacing commit); on the
  * shard-REUSE path it is None and verification checks the root's shard
  * list + inline entries + only the newly created shards. */
private[table] final case class CommitLayout(
    fullExpect: Option[Seq[FileEntry]],
    rootShardPaths: Seq[String],
    newShards: Seq[(String, Seq[FileEntry])],
    inline: Seq[FileEntry])

final class SnapshotStore(spark: SparkSession, root: String, zRes: Int = 12,
                          histRes: Int = SnapshotStore.DefaultHistRes,
                          bloomKey: Option[String] = None,
                          curve: String = "z",
                          manifestShardRows: Int = SnapshotStore.DefaultManifestShardRows) {

  require(manifestShardRows >= 1, "manifestShardRows must be positive")

  require(SnapshotStore.ValidCurves(curve),
    s"unknown clustering curve '$curve' " +
      s"(want ${SnapshotStore.ValidCurves.mkString(" | ")})")

  /** Strip resolution of the STR key (2^(zRes/2) lat strips — the
    * fixed-key stand-in for STR's √(n/fanout) strip count); the fine
    * within-strip lon index runs at [[CellId.MaxRes]]. Must match
    * [[graft.geo.GeoCols.strCol]]'s layout bit-for-bit or the covering
    * ranges stop covering. */
  private val strStripRes = math.max(1, zRes / 2)

  /** Materialize the clustering key for this store's curve — all three
    * modes the north star names ("STR/Hilbert-curve bulk-load packing"):
    * Morton (default), Hilbert (consecutive key values grid-adjacent →
    * tightest file bounds, fewest covering ranges), STR (lat strips,
    * lon-ordered within — the classic packed-R-tree layout). The curve is
    * a WRITE-TIME property of the table, pinned in meta/table.json and
    * validated on open (the key and its pruning ranges must agree;
    * content correctness is curve-independent, spec-pinned). */
  private def withCurveKey(df: DataFrame): DataFrame = curve match {
    case "hilbert" => GeoCols.withHilbert(df, col("lat"), col("lon"), zRes, "__z")
    case "str" => df.withColumn("__z",
      GeoCols.strCol(col("lat"), col("lon"), strStripRes, CellId.MaxRes))
    case _         => df.withColumn("__z", GeoCols.zCol(col("lat"), col("lon"), zRes))
  }

  // per-box fine-covering cap 1024 (was 64, a size chosen for the old
  // O(n)-per-row BETWEEN refine): the row-level membership test is now the
  // O(log n) probe ([[GeoCols.zCoveringPredicate]]) and the decomposition
  // cost is cap-independent (full quadtree descent, then coalesce), so a
  // finer covering only SHRINKS the read superset. The ≤16-term pushable
  // disjunction parquet sees is capped separately inside the predicate.
  private def curveRangesForMbr(b: MBR): Seq[(Long, Long)] = curve match {
    case "hilbert" => CellId.hilbertRangesForMbr(b, zRes, maxRanges = 1024)
    case "str" => CellId.strRangesForMbr(b, strStripRes, CellId.MaxRes, maxRanges = 1024)
    case _         => CellId.zRangesForMbr(b, zRes, maxRanges = 1024)
  }

  private val metaDir = Paths.get(root, "meta")
  private val currentPtr = metaDir.resolve("current")
  private val histDir = metaDir.resolve("hist")
  private val bloomDir = metaDir.resolve("bloom")
  private val indexDir = metaDir.resolve("index")
  private val tableMetaPath = metaDir.resolve("table.json")
  Files.createDirectories(metaDir)
  Files.createDirectories(Paths.get(root, "data"))
  // stored reads refine through graft_z_in_ranges (the binary-search
  // covering probe) — register the graft_* functions on whatever session
  // owns this store (idempotent; same pattern as AnnOps)
  graft.plans.GraftExtensions.install(spark)

  // The curve and key resolution are WRITE-TIME table properties: opening
  // a hilbert-written table as z (or vice versa) makes curveRangesForMbr
  // non-covering over the stored __z values and read(box) would silently
  // drop in-box rows. They are persisted in meta/table.json on first
  // commit and validated here — fail fast, never a docstring hazard
  // (Iceberg persists its partition spec in table metadata for the same
  // reason).
  private def tableMetaIfExists(): Option[(String, Int, Int)] =
    if (Files.isRegularFile(tableMetaPath))
      Some(MetaJson.parseTableMeta(Files.readString(tableMetaPath)))
    else None

  private def validateTableMeta(): Unit =
    tableMetaIfExists().foreach { case (storedCurve, storedZRes, storedHistRes) =>
      require(storedCurve == curve && storedZRes == zRes && storedHistRes == histRes,
        s"table at $root was written with curve=$storedCurve zRes=$storedZRes " +
          s"histRes=$storedHistRes but opened with curve=$curve zRes=$zRes " +
          s"histRes=$histRes — the clustering key, its pruning ranges, and " +
          "the sidecar stats grid must agree; open with the written values")
    }

  validateTableMeta()

  // Legacy-open hazard (round-4 ADVICE): a table written by the pre-pin
  // format has committed snapshots but no meta/table.json. Auto-pinning at
  // the next commit would enshrine the OPENER's possibly-wrong curve as
  // authoritative — after which the CORRECT spelling fails validation
  // forever, and reads meanwhile silently drop rows. Refuse the implicit
  // migration: the owner must assert the written layout explicitly via
  // SnapshotStore.pinLegacyLayout before this table is usable again.
  if (currentSnapshotId > 0 && tableMetaIfExists().isEmpty)
    throw new IllegalStateException(
      s"table at $root has committed snapshots but no meta/table.json " +
        "(pre-pin legacy format). Opening it would pin THIS session's " +
        s"layout (curve=$curve zRes=$zRes histRes=$histRes) as " +
        "authoritative even if the data was written differently. Run " +
        "SnapshotStore.pinLegacyLayout(root, curve, zRes, histRes) with " +
        "the layout the table was WRITTEN with, then reopen.")

  /** Pin-or-validate, called from EVERY commit (not just the constructor):
    * two stores constructed on the same empty root both pass the ctor
    * check (no meta yet); whichever commits second must fail against the
    * winner's pinned layout instead of landing mixed-curve files whose
    * covering ranges silently stop covering. CREATE_NEW + re-validate
    * closes the write-write race either way. */
  private def writeTableMeta(): Unit = {
    if (!Files.exists(tableMetaPath)) {
      try Files.writeString(tableMetaPath,
        MetaJson.tableMetaJson(curve, zRes, histRes),
        StandardOpenOption.CREATE_NEW)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
    validateTableMeta()
  }

  def currentSnapshotId: Long =
    if (Files.exists(currentPtr)) Files.readString(currentPtr).trim.toLong else 0L

  /** Per-file manifest stats from parquet FOOTERS — a driver-side
    * metadata read (KBs per file), NOT a second scan of the data just
    * written. This is the Iceberg stats contract: the writer's row-group
    * min/max aggregates become the manifest entry.
    *
    * Stats FAIL OPEN: if ANY chunk of a column lacks min/max (parquet
    * omits double stats when a page holds NaN; a column can be absent
    * entirely), the entry records the full domain range so the file is
    * never pruned — a narrowed range would silently drop rows from
    * read(box), violating the superset contract. */
  /** `only`: the file names a direct write ([[org.apache.spark.sql.GraftParquetDirect]])
    * reported from its SUCCESSFUL tasks — a failed or speculatively re-run
    * attempt may orphan a partial file in the unit dir, and filtering the
    * listing to the reported names keeps such orphans out of the manifest
    * (readers never list dirs; they open manifest paths). */
  private def footerStats(unitDir: String, lineageId: String, wallMs: Long,
                          withZ: Boolean, kind: String = "data",
                          only: Option[Set[String]] = None): Seq[FileEntry] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(unitDir)
    val fs = dir.getFileSystem(conf)
    fs.listStatus(dir).filter(f => f.getPath.getName.startsWith("part-"))
      .filter(f => only.forall(_.contains(f.getPath.getName)))
      .sortBy(_.getPath.getName).toSeq.map { f =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
        try {
          val blocks = reader.getFooter.getBlocks
          import scala.jdk.CollectionConverters._
          val rows = blocks.asScala.map(_.getRowCount).sum
          // (failLo, failHi) is the fail-open full range, returned unless
          // EVERY chunk of the column carried usable stats
          def minMax[T](col: String, failLo: T, failHi: T)(
              cmp: Ordering[T])(get: org.apache.parquet.column.statistics.Statistics[_] => (T, T)): (T, T) = {
            var mn = failHi; var mx = failLo
            var matched = 0; var withStats = 0
            blocks.asScala.foreach(_.getColumns.asScala.foreach { c =>
              if (c.getPath.toDotString == col) {
                matched += 1
                if (c.getStatistics != null && !c.getStatistics.isEmpty &&
                    c.getStatistics.hasNonNullValue) {
                  val (a, b) = get(c.getStatistics)
                  if (withStats == 0 || cmp.lt(a, mn)) mn = a
                  if (withStats == 0 || cmp.gt(b, mx)) mx = b
                  withStats += 1
                }
              }
            })
            if (matched > 0 && withStats == matched) (mn, mx) else (failLo, failHi)
          }
          def dbl(col: String): (Double, Double) =
            minMax(col, -Double.MaxValue, Double.MaxValue)(Ordering.Double.TotalOrdering)(s =>
              (s.genericGetMin.asInstanceOf[Number].doubleValue(),
               s.genericGetMax.asInstanceOf[Number].doubleValue()))
          val (zLo, zHi) =
            if (withZ) minMax("__z", Long.MinValue, Long.MaxValue)(Ordering.Long)(s =>
              (s.genericGetMin.asInstanceOf[Number].longValue(),
               s.genericGetMax.asInstanceOf[Number].longValue()))
            else (0L, 0L)
          val (latLo, latHi) = dbl("lat")
          val (lonLo, lonHi) = dbl("lon")
          FileEntry(f.getPath.toString, rows, zLo, zHi,
            latLo, latHi, lonLo, lonHi, lineageId, wallMs, kind)
        } finally reader.close()
      }
      // range-partitioning can leave empty part files: no stats, no rows —
      // keep them out of the manifest (the old scan-based stats pass
      // skipped them implicitly)
      .filter(_.rows > 0)
  }

  /** Manifest read. Current format: a driver-written JSON FILE — KBs of
    * metadata, zero Spark jobs (a parquet manifest cost one job to write
    * and one per read, and commits run once per micro-batch under
    * streaming ingestion; real Iceberg's manifests are likewise
    * driver-readable, never a cluster job). Snapshots written by the old
    * parquet-dataset format still read through the legacy path below. */
  def manifest(snapshotId: Long = currentSnapshotId): Seq[FileEntry] =
    manifestPartial(snapshotId, None)._1

  /** Manifest read with optional SHARD pruning: when the snapshot is a
    * two-level manifest list and `boxes` is given, only shards whose
    * union bounds overlap some box are downloaded and parsed — at the
    * 10⁶-file design point a box read touches a handful of shard files
    * instead of a few hundred MB of driver-side JSON. Inline entries
    * (delete manifests, lineage markers) always load. Returns the loaded
    * entries plus the TOTAL data-file count of the snapshot (known from
    * the shard rows without reading them) so pruning stays observable. */
  private[graft] def manifestPartial(snapshotId: Long,
                                     boxes: Option[Seq[MBR]],
                                     lineageHint: Option[String => Boolean] = None,
                                     rangesHint: Option[Seq[(Long, Long)]] = None)
      : (Seq[FileEntry], Int) = {
    def dataCount(es: Seq[FileEntry]): Int =
      es.count(e => e.kind == "data" && e.path.nonEmpty)
    if (snapshotId == 0) (Seq.empty, 0)
    else {
      val p = metaDir.resolve(s"snap-$snapshotId")
      if (!Files.exists(p))
        throw new IllegalStateException(
          s"snapshot $snapshotId is expired or was never committed")
      if (Files.isRegularFile(p)) {
        val (shards, inline) = MetaJson.parseManifestRoot(Files.readString(p))
        if (shards.isEmpty) (inline, dataCount(inline))
        else {
          // all three prunes are fail-open: a shard with unknown bounds or
          // an unknown lineage summary always loads — a pruner may only
          // skip what it can PROVE irrelevant. The curve-range test rides
          // the query's own merged covering (rangesHint — shards are
          // chunked by minZ, so their [minZ, maxZ] intervals partition the
          // key axis after compaction): a shard whose interval meets no
          // covering range holds no row of any query box, even when its
          // lat/lon union still overlaps one (per-append shards span wide
          // boxes). Sound because shards carry ONLY data entries —
          // tombstones and markers stay inline in the root.
          val wanted = shards.filter { sm =>
            boxes.forall(bs => bs.exists(b =>
              MBR(sm.minLat, sm.minLon, sm.maxLat, sm.maxLon).overlaps(b))) &&
            rangesHint.forall(_.exists(r =>
              r._1 <= sm.maxZ && sm.minZ <= r._2)) &&
            lineageHint.forall(want => sm.lineages.forall(_.exists(want)))
          }
          val loaded = inline ++ wanted.flatMap(sm =>
            MetaJson.parseManifest(Files.readString(metaDir.resolve(sm.path))))
          (loaded, shards.map(_.entries).sum + dataCount(inline))
        }
      } else {
        val es = legacyManifest(p.toString)
        (es, dataCount(es))
      }
    }
  }

  /** Legacy parquet-dataset manifest decode with ADDITIVE schema evolution
    * (the Iceberg manifest contract): columns added to FileEntry after a
    * snapshot was written are defaulted, not AnalysisException'd — Spark
    * does not apply Scala default parameters for a column missing from
    * parquet, so snapshots written before `kind` existed must be patched
    * before `.as[FileEntry]`. */
  private def legacyManifest(dir: String): Seq[FileEntry] = {
    import spark.implicits._
    val raw = spark.read.parquet(dir)
    val hasSeq = raw.columns.contains("seq")
    var patched = raw
    if (!patched.columns.contains("kind"))
      patched = patched.withColumn("kind", lit("data"))
    if (!hasSeq) patched = patched.withColumn("seq", lit(0L))
    val rows = patched.as[FileEntry].collect().toSeq
    // pre-seq manifests: row order WAS the sequence (single coalesced
    // file) — materialize it so scoping semantics carry over unchanged
    if (hasSeq) rows
    else rows.zipWithIndex.map { case (e, i) => e.copy(seq = i.toLong) }
  }

  /** Lineage ids present in the current snapshot — the idempotence check
    * streaming ingestion runs per MICRO-BATCH ([[resumableRun]] /
    * StreamIngest). On a two-level manifest whose shard rows all carry
    * the `lineages` summary this reads the ROOT alone (KBs at the
    * 10⁶-file design point); a root with any pre-summary shard row, a
    * flat manifest, or a legacy table falls back to the full parse —
    * an UNKNOWN summary must widen the read, never shrink the set (a
    * missed lineage would re-append a committed unit: duplicate rows). */
  def committedLineage: Set[String] = {
    val cur = currentSnapshotId
    if (cur == 0) Set.empty
    else {
      val p = metaDir.resolve(s"snap-$cur")
      if (Files.isRegularFile(p)) {
        val (shards, inline) = MetaJson.parseManifestRoot(Files.readString(p))
        if (shards.nonEmpty && shards.forall(_.lineages.isDefined))
          inline.map(_.lineageId).toSet ++ shards.flatMap(_.lineages.get)
        else inline.map(_.lineageId).toSet ++
          (if (shards.isEmpty) Set.empty[String]
           else manifest(cur).map(_.lineageId).toSet)
      } else manifest(cur).map(_.lineageId).toSet
    }
  }

  /** Live-row count from manifest stats alone — the plan-time input to
    * [[graft.geo.CellId.pickResolution]] (adaptive covering resolution
    * with ZERO data scans; tombstone rows are subtracted as an upper
    * bound on dead rows). */
  def totalRows: Long = {
    val m = manifest().filter(_.path.nonEmpty)
    m.filter(_.kind == "data").map(_.rows).sum -
      m.filter(_.kind == "delete").map(_.rows).sum
  }

  /** Append a (lat, lon, …) DataFrame as one lineage unit: Z-cluster it
    * (repartitionByRange + sortWithinPartitions — the bulk-load pack),
    * write immutable parquet, derive per-file stats from the written files
    * themselves, and commit parent-manifest + new entries atomically.
    * Exactly TWO Spark queries: the clustered write and ONE stats pass
    * ([[writeSidecars]]) that yields the per-cell histogram, the per-file
    * Bloom filters, and the persisted index summaries together (the
    * round-3 protocol re-read the unit once per sidecar, and every
    * commit/manifest op was itself a Spark job; AQE may split each query
    * into a few stage-jobs — the budget is pinned in spec). */
  def append(df: DataFrame, lineageId: String, numPartitions: Int = 0): Long = {
    val t0 = System.nanoTime()
    val parts = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val unitDir = s"$root/data/$lineageId-${java.util.UUID.randomUUID().toString.take(8)}"
    val keyed = withCurveKey(df)
    // NOTE (r6 optimization round, measured): repartitionByRange executes
    // the child plan twice (range-sampling pass + shuffle map). Persisting
    // `keyed` to cut the second derive was tried and REGRESSED every
    // storage query ~1.5 s/append (the columnar cache encode/decode costs
    // far more than the cheap scan+derive it saves) — the double scan is
    // the right trade at every scale, exactly as Spark's own sort pays it.
    // Committer-free direct write (same ParquetWriteSupport bits) with
    // the unit stats computed IN the write tasks — one job where the
    // round-5 protocol ran write + footer read + a relational stats
    // pass. The manifest commit below is the atomicity point, so the
    // Hadoop commit protocol's ~0.2 s/invocation driver floor buys
    // nothing here.
    val uw = writeUnitFiles(
      keyed
        .repartitionByRange(parts, col("__z"))
        .sortWithinPartitions(col("__z")),
      unitDir, lineageId, t0, parts)
    val t2 = System.nanoTime()
    writeUnitSidecars(uw, unitDir, lineageId)
    SnapshotStore.trace("append.sidecars", t2)
    val t3 = System.nanoTime()
    val snap = commitAppend(uw.entries)
    SnapshotStore.trace("append.commit", t3)
    snap
  }

  /** One clustered-unit write: the direct parquet job with
    * [[UnitTaskStats]] observers threaded through each task, yielding
    * manifest entries (exact per-file `__z`/lat/lon bounds, fail-open on
    * NaN or all-null like the footer-stats contract) and the sidecar
    * inputs with ZERO further passes over the unit. Schemas outside the
    * observer's preconditions (non-double coords, non-long `__z` or Bloom
    * key) and Bloom units past [[SnapshotStore.BloomCollectRowsCutoff]]
    * fall back to the round-5 two-pass protocol (footer read + relational
    * stats aggregate — `byFile = None` routes [[writeUnitSidecars]]
    * there), so the scale path for huge Bloom-keyed units is unchanged. */
  private case class UnitWrite(entries: Seq[FileEntry],
                               byFile: Option[Seq[(String, FileStats)]],
                               bloomCol: Option[String],
                               schema: org.apache.spark.sql.types.StructType)

  private def writeUnitFiles(clustered: DataFrame, unitDir: String,
                             lineageId: String, t0: Long,
                             parts: Int): UnitWrite = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val schema = clustered.schema
    val names = schema.fieldNames
    val latOrd = names.indexOf("lat")
    val lonOrd = names.indexOf("lon")
    val zOrd = names.indexOf("__z")
    val keyOrd = bloomKey.map(names.indexOf(_)).getOrElse(-1)
    val fastOk =
      latOrd >= 0 && schema(latOrd).dataType == DoubleType &&
      lonOrd >= 0 && schema(lonOrd).dataType == DoubleType &&
      zOrd >= 0 && schema(zOrd).dataType == LongType &&
      (keyOrd < 0 || schema(keyOrd).dataType == LongType)
    if (!fastOk) {
      val written = org.apache.spark.sql.GraftParquetDirect.write(clustered, unitDir)
      val wallMs = (System.nanoTime() - t0) / 1000000
      SnapshotStore.trace("append.write", t0)
      val entries = footerStats(unitDir, lineageId, wallMs, withZ = true,
        only = Some(written.map(_._1).toSet))
      return UnitWrite(entries, None, None, schema)
    }
    // per-task share of the unit-level cutoff: every task under its
    // share ⇒ the unit is under the cutoff, and the driver receives at
    // most cutoff × 8 B of hashes TOTAL — the same bound the round-5
    // collect_list path documented. A task past its share overflows and
    // the Bloom work degrades to the distributed UnitStatsAgg pass
    // (correct either way; a skewed small unit merely loses the
    // single-pass shortcut).
    val hashCap =
      if (keyOrd >= 0)
        math.max(1L, SnapshotStore.BloomCollectRowsCutoff / math.max(1, parts)).toInt
      else 0
    val res = org.apache.spark.sql.GraftParquetDirect.writeStats(clustered,
      unitDir, UnitTaskStats.observer(latOrd, lonOrd, zOrd, keyOrd,
        histRes, hashCap))
    val wallMs = (System.nanoTime() - t0) / 1000000
    SnapshotStore.trace("append.write", t0)
    val conf = spark.sessionState.newHadoopConf()
    val dirPath = new org.apache.hadoop.fs.Path(unitDir)
    val fs = dirPath.getFileSystem(conf)
    val nonEmpty = res.filter(_._2 > 0)
    val entries = nonEmpty.map { case (name, rows, s) =>
      FileEntry(
        fs.makeQualified(new org.apache.hadoop.fs.Path(dirPath, name)).toString,
        rows, s.minZ, s.maxZ, s.minLat, s.maxLat, s.minLon, s.maxLon,
        lineageId, wallMs)
    }
    val totalRows = nonEmpty.map(_._2).sum
    val taskHashesOk = keyOrd < 0 ||
      (totalRows <= SnapshotStore.BloomCollectRowsCutoff &&
        nonEmpty.forall(!_._3.hashOverflow))
    val byFile =
      if (!taskHashesOk) None // relational UnitStatsAgg pass sizes the unit's bitsets
      else Some {
        val bits =
          if (keyOrd >= 0 && nonEmpty.nonEmpty)
            Bloom.bitsFor(nonEmpty.map(_._2).max)
          else 0
        nonEmpty.zip(entries).map { case ((_, _, s), e) =>
          val bs =
            if (keyOrd < 0) Array.emptyLongArray
            else {
              val b = new Array[Long](bits / 64)
              s.hashes.foreach(Bloom.add(b, _))
              b
            }
          (SnapshotStore.normalizePath(e.path), FileStats(bs, s.leaves))
        }.sortBy(_._1)
      }
    UnitWrite(entries, byFile,
      if (keyOrd >= 0) bloomKey else None, schema)
  }

  /** Sidecar JSON for a just-written unit: from the in-task stats when
    * available, else the round-5 relational pass over the written files. */
  private def writeUnitSidecars(uw: UnitWrite, unitDir: String,
                                lineageId: String): Seq[java.nio.file.Path] =
    if (uw.entries.isEmpty) Seq.empty
    else uw.byFile match {
      case Some(bf) => writeSidecarJson(lineageId, bf, uw.bloomCol)
      case None => writeSidecars(unitDir, lineageId, uw.entries, uw.schema)
    }

  /** Appends COMMUTE: the unit's data files and sidecars are already on
    * disk under unique names and the manifest merge is purely additive, so
    * a commit that loses the optimistic-concurrency race rebases onto the
    * winner's manifest and retries with nothing rewritten — Iceberg's
    * fast-append retry, bounded. Replacing/delete commits never come
    * through here: a compaction PLANS against a pinned parent (rebasing
    * would silently drop the racer's unit from the replacing manifest),
    * and a tombstone rebased past a racer's data would widen its sequence
    * scope onto rows it never saw — both still fail loudly for the caller
    * to re-plan. */
  private def commitAppend(entries: Seq[FileEntry], retries: Int = 5): Long = {
    val seen = currentSnapshotId
    try commit(entries)
    catch {
      case _: java.util.ConcurrentModificationException if retries > 0 =>
        // wait for the winner's pointer swing before consuming a retry: a
        // losing attempt fails while the winner is still mid-commit (its
        // snap-N exists, pointer not yet swung), so an immediate re-entry
        // would recompute the same `next`, hit the same tripwire, and burn
        // every attempt inside the winner's commit tail. Bounded: a winner
        // that CRASHED mid-commit never swings the pointer — its stale
        // snap-N is reclaimed by the next commit's age-gated sweep, not by
        // spinning here.
        val deadline = System.currentTimeMillis() + 2000
        while (currentSnapshotId == seen &&
               System.currentTimeMillis() < deadline) Thread.sleep(10)
        commitAppend(entries, retries - 1)
    }
  }

  /** ONE stats pass over the unit just written → three driver-written JSON
    * sidecars (hist / bloom / index), via [[UnitStatsAgg]] grouped by file:
    *
    *  - `meta/hist/<lineage>-<uuid>.json` — the unit's per-cell histogram
    *    at `histRes` ([[hotCells]]'s write-time skew hint);
    *  - `meta/bloom/<lineage>-<uuid>.json` — per-file Bloom bitsets over
    *    `bloomKey` (skipped when the store has none or the table lacks the
    *    column) — [[lookupByKey]]'s file-skipping input;
    *  - `meta/index/<lineage>-<uuid>.json` — per-file leaf slabs
    *    (cell, cnt, MBR): the PERSISTED index summaries
    *    [[graft.index.GlobalIndex.fromStore]] rebuilds the broadcastable
    *    index from with zero scans (the reference persists its tree the
    *    same way, IndexFile.java:37-95).
    *
    * Written BEFORE the commit, under UNIQUE names: an aborted commit or a
    * repeated lineage id leaves orphan sidecars, which only OVERCOUNT the
    * histogram hint (safe direction) and are never consulted by
    * path-keyed readers (lookups/index key by manifest paths). */
  private def writeSidecars(unitDir: String, lineageId: String,
                            entries: Seq[FileEntry],
                            schema: org.apache.spark.sql.types.StructType): Seq[java.nio.file.Path] = {
    if (entries.isEmpty) return Seq.empty
    import spark.implicits._
    val tSc = System.nanoTime()
    // the writer's schema is passed in — inferring it would cost a
    // footer-sampling Spark job per append; the read targets the ENTRIES'
    // paths, not the dir listing, so an orphan partial file from a failed
    // direct-write attempt can never leak into the stats
    val raw = spark.read.schema(schema).parquet(entries.map(_.path): _*)
    val key = bloomKey.filter(raw.columns.contains)
    val byFile: Seq[(String, FileStats)] = key match {
      case Some(kc) if entries.map(_.rows).sum <= SnapshotStore.BloomCollectRowsCutoff =>
        // Small-unit Bloom path (micro-batch commits, bench-scale units):
        // ONE relational pass — the per-(file, cell) leaf aggregate also
        // collects the group's key hashes, and the driver folds them into
        // per-file bitsets (bounded: ≤ cutoff × 8 B of hashes total). The
        // cell is NULLed for NaN/null coords so those rows' hashes still
        // reach the filter (dropping one would be a false negative) while
        // their group is excluded from the leaf stats, exactly the typed
        // aggregator's semantics.
        val bits = Bloom.bitsFor(entries.map(_.rows).max)
        val cellOrNull = when(col("lat").isNull || col("lon").isNull ||
            isnan(col("lat")) || isnan(col("lon")), lit(null))
          .otherwise(coalesce(GeoCols.cellCol(col("lat"), col("lon"), histRes), lit(0L)))
        val grouped = raw.select(
            input_file_name().as("f"), cellOrNull.as("cell"),
            col("lat"), col("lon"), xxhash64(col(kc)).as("h"))
          .groupBy(col("f"), col("cell"))
          .agg(count(lit(1)).as("cnt"),
            min(col("lat")).as("la0"), max(col("lat")).as("la1"),
            min(col("lon")).as("lo0"), max(col("lon")).as("lo1"),
            collect_list(col("h")).as("hs"))
          .collect()
        grouped.groupBy(r => SnapshotStore.normalizePath(r.getString(0)))
          .view.mapValues { rows =>
            val bs = new Array[Long](bits / 64)
            rows.foreach(_.getSeq[Long](7).foreach(Bloom.add(bs, _)))
            FileStats(bs,
              rows.filter(!_.isNullAt(1))
                .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
                  r.getDouble(4), r.getDouble(5), r.getDouble(6)))
                .sortBy(_._1))
          }
          .toSeq.sortBy(_._1)
      case Some(_) =>
        // Large-unit Bloom path: the per-file bitsets need a distributed
        // bitwise-OR aggregation whose buffers (512 KB bitsets, never row
        // keys) cross the exchange — [[UnitStatsAgg]] is the scale-right
        // shape for that and stays.
        val bits = Bloom.bitsFor(entries.map(_.rows).max)
        val agg = new UnitStatsAgg(bits)
        // nulls → NaN: the typed encoder would throw on a null primitive,
        // and the aggregator must still Bloom the row's key (skipping it
        // would be a false negative); NaN coords excluded from cell stats
        val latN = coalesce(col("lat"), lit(Double.NaN))
        val lonN = coalesce(col("lon"), lit(Double.NaN))
        raw.select(
            input_file_name().as("f"),
            coalesce(GeoCols.cellCol(col("lat"), col("lon"), histRes), lit(0L)).as("cell"),
            latN.as("lat"), lonN.as("lon"),
            xxhash64(col(key.get)).as("h"))
          .as[(String, Long, Double, Double, Long)]
          .groupByKey(_._1)
          .mapValues(t => (t._2, t._3, t._4, t._5))
          .agg(agg.toColumn.name("stats"))
          .collect()
          .sortBy(_._1)
          .map { case (f, fs) => (SnapshotStore.normalizePath(f), fs) }.toSeq
      case None =>
        // No Bloom key (the common case): the stats are a plain per-(file,
        // cell) count + min/max — a relational hash aggregate with
        // map-side partial aggregation and whole-stage codegen, ~2× the
        // typed groupByKey kernel's speed (every row previously crossed
        // the Dataset encoder). NaN/null coords are excluded from leaf
        // stats exactly as the typed path excluded them.
        val grouped = raw.select(
            input_file_name().as("f"),
            coalesce(GeoCols.cellCol(col("lat"), col("lon"), histRes), lit(0L)).as("cell"),
            col("lat"), col("lon"))
          .filter(col("lat").isNotNull && col("lon").isNotNull &&
            !isnan(col("lat")) && !isnan(col("lon")))
          .groupBy(col("f"), col("cell"))
          .agg(count(lit(1)).as("cnt"),
            min(col("lat")).as("la0"), max(col("lat")).as("la1"),
            min(col("lon")).as("lo0"), max(col("lon")).as("lo1"))
          .collect()
        grouped.groupBy(r => SnapshotStore.normalizePath(r.getString(0)))
          .view.mapValues { rows =>
            FileStats(Array.emptyLongArray,
              rows.map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
                r.getDouble(4), r.getDouble(5), r.getDouble(6)))
                .sortBy(_._1))
          }
          .toSeq.sortBy(_._1)
    }
    SnapshotStore.trace("sidecars.stats", tSc)
    writeSidecarJson(lineageId, byFile, key)
  }

  /** Driver-side sidecar JSON from assembled per-file stats (shared by
    * the relational pass above and the in-task [[UnitTaskStats]] path —
    * same documents either way). */
  private def writeSidecarJson(lineageId: String,
                               byFile: Seq[(String, FileStats)],
                               bloomCol: Option[String])
      : Seq[java.nio.file.Path] = {
    val tJson = System.nanoTime()
    val uuid = java.util.UUID.randomUUID().toString.take(8)
    val written = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
    def put(dir: java.nio.file.Path, json: String): Unit = {
      Files.createDirectories(dir)
      val p = dir.resolve(s"$lineageId-$uuid.json")
      Files.writeString(p, json, StandardOpenOption.CREATE_NEW)
      written += p
    }
    val cellTotals = scala.collection.mutable.HashMap.empty[Long, Long]
    byFile.foreach { case (_, fs) => fs.leaves.foreach { l =>
      cellTotals.update(l._1, cellTotals.getOrElse(l._1, 0L) + l._2) } }
    put(histDir, MetaJson.histJson(cellTotals.toSeq.sortBy(_._1)))
    put(indexDir, MetaJson.indexJson(histRes,
      byFile.map { case (f, fs) => (f, fs.leaves.toSeq) }))
    bloomCol.foreach { kc =>
      put(bloomDir, MetaJson.bloomJson(kc, Bloom.K,
        byFile.map { case (f, fs) => (f, fs.bits) }))
    }
    SnapshotStore.trace("sidecars.json", tJson)
    written.toSeq
  }

  private def normPath(p: String): String = SnapshotStore.normalizePath(p)

  /** Key point lookup planned through the manifest Bloom sidecars: only
    * files whose filter says a probed key MIGHT be present are opened
    * (plus any file with no filter — fail open, e.g. units written before
    * the store had a bloom key). The result applies the same
    * sequence-scoped tombstone chain as [[read]], then refines exactly
    * with a pushed `IN` predicate, so `lookupByKey(vs)` ==
    * `read()._1.filter(key IN vs)` always — the Bloom only changes how
    * many files the plan opens. Returns (rows, files read, total files).
    * Sidecars are driver-read JSON (KBs) — planning costs no Spark job.
    * Sidecars written by the pre-JSON format (parquet dirs) are NOT
    * consulted: they carried pruning hints only, so reads stay correct
    * (fail open, every unhinted file opens); one compact() regenerates
    * current-format sidecars for the whole table.
    *
    * On a two-level manifest the Bloom verdict also prunes SHARDS: a
    * sidecar is per-unit (lineage), shard rows carry their lineage
    * summaries, so only shards holding a bloom-HIT unit — or a unit with
    * no consulted sidecar (fail open) — are parsed at all
    * ([[lookupShardFilter]]). A point lookup then costs one root parse +
    * the hit units' shards, not the full manifest. */
  def lookupByKey(values: Seq[Any], keyCol: String = ""): (DataFrame, Int, Int) = {
    val key = if (keyCol.nonEmpty) keyCol
      else bloomKey.getOrElse(throw new IllegalArgumentException(
        "store has no bloomKey: pass keyCol explicitly"))
    val (filters, hashes, shardFilter) = lookupShardFilter(values, key)
    planAt(currentSnapshotId,
      keep = e => filters.get(normPath(e.path))
        .forall(bits => hashes.exists(Bloom.mightContain(bits, _))),
      refine = df => df.filter(col(key).isin(values: _*)),
      lineageHint = Some(shardFilter))
  }

  /** The per-file Bloom map, probe hashes, and the shard-level lineage
    * predicate a key lookup plans with: a lineage passes iff some of its
    * files' filters MIGHT contain a probed key, or no sidecar for it was
    * consulted (unknown coverage must fail open — skipping it could drop
    * live rows). The lineage is recovered from the sidecar file name
    * ([[sidecarLineage]]); orphan sidecars from a crashed duplicate
    * append can only WIDEN the hit set, never shrink it. */
  private[graft] def lookupShardFilter(values: Seq[Any], key: String)
      : (Map[String, Array[Long]], Seq[Long], String => Boolean) = {
    val hashes = values.map(Bloom.hashLiteral)
    val perUnit: Seq[(String, Seq[(String, Array[Long])])] =
      sidecarFiles(bloomDir).flatMap { f =>
        val (kc, k, perFile) = MetaJson.parseBloom(Files.readString(f))
        if (kc == key && k == Bloom.K) Some(sidecarLineage(f) -> perFile.toSeq)
        else None
      }
    val covered = perUnit.map(_._1).toSet
    val hit = perUnit.collect { case (lin, pf)
      if pf.exists { case (_, bits) =>
        hashes.exists(Bloom.mightContain(bits, _)) } => lin }.toSet
    (perUnit.flatMap(_._2).toMap, hashes, l => hit(l) || !covered(l))
  }

  /** JSON sidecar files under a meta subdirectory (empty if absent). */
  private def sidecarFiles(dir: java.nio.file.Path): Seq[java.nio.file.Path] =
    if (!Files.exists(dir)) Seq.empty
    else listDir(dir).filter(_.getFileName.toString.endsWith(".json"))

  /** Resolution the write-time stats (hist + index leaves) are keyed at. */
  def statsRes: Int = histRes

  /** Persisted per-file index summaries (leaf slabs keyed by normalized
    * file path) — written by [[writeSidecars]], consumed by
    * [[graft.index.GlobalIndex.fromStore]] with zero Spark jobs. Orphan
    * sidecars from crashed appends are harmless: consumers key by the
    * manifest's file paths, which never reference them. */
  def indexLeaves(): Map[String, Seq[(Long, Long, Double, Double, Double, Double)]] =
    sidecarFiles(indexDir)
      .flatMap(f => MetaJson.parseIndex(Files.readString(f))._2)
      .toMap

  /** Write-time hot-cell set at resolution `r` — the zero-query-time-scan
    * input to [[graft.ops.SpatialOps.boxJoinSalted]]. Counts come from the
    * persisted per-unit histograms (kept at `histRes`): rolled up through
    * parent cells for coarser r, expanded to descendants for finer r.
    * Both directions yield a SUPERSET of the truly-hot set (deletes are
    * not subtracted either) — exactly the safe side for a salting hint.
    * Histograms from the pre-JSON sidecar format are not consulted (the
    * hint weakens to empty — joins stay correct, just unsalted); one
    * compact() regenerates them in the current format. */
  def hotCells(r: Int, hotThreshold: Double = 0.05): Set[Long] = {
    val files = sidecarFiles(histDir)
    if (files.isEmpty) return Set.empty
    val merged = scala.collection.mutable.HashMap.empty[Long, Long]
    files.foreach(f => MetaJson.parseHist(Files.readString(f)).foreach {
      case (c, n) => merged.update(c, merged.getOrElse(c, 0L) + n)
    })
    val cells = merged.toArray
    val total = cells.map(_._2).sum
    val hotAtHist = cells.filter(_._2 > total * hotThreshold).map(_._1)
    if (r == histRes) hotAtHist.toSet
    else if (r < histRes)
      // roll counts up to r first — children of one hot parent may each
      // sit below the threshold individually
      cells.map { case (c, n) =>
        (Iterator.iterate((c, histRes)) { case (cc, rr) =>
          (CellId.parent(cc, rr), rr - 1) }.drop(histRes - r).next()._1, n)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
        .filter(_._2 > total * hotThreshold).map(_._1).toSet
    else
      // finer r: a hot cell's descendants (superset hint)
      hotAtHist.flatMap(c =>
        (histRes until r).foldLeft(Seq(c)) { case (cs, rr) =>
          cs.flatMap(CellId.children(_, rr)) }).toSet
  }

  /** Test seam, production no-op: runs in EVERY commit right after the
    * parent snapshot is captured — the exact window a racing committer
    * can win in. The fast-append race spec plants a racer here to prove
    * [[commitAppend]]'s rebase-retry deterministically (a thread-timing
    * race only exercises it probabilistically). */
  private[graft] var afterParentCapture: () => Unit = () => ()

  /** Manifest-append commit: parent entries + new entries → snap-(n+1),
    * atomic pointer swing. Single-writer (the driver) — matching the
    * reference's single-threaded writer; multi-writer needs a CAS on
    * `current`, which real Iceberg's catalog provides at the seam.
    *
    * Crash/abort safety: any snap-k with k > current and any current.tmp.*
    * is UNREFERENCED (the pointer never reached it) — a leftover from a
    * crash between manifest write and pointer swing, or from an aborted
    * commit. Such orphans are swept before writing and on the tripwire
    * path, so one failed commit can never wedge the table permanently.
    *
    * `expectedParent`: the snapshot the caller PLANNED against (compaction
    * reads the table, rewrites it, then commits — possibly seconds later).
    * If the table advanced past it, this commit would silently drop the
    * interleaved units from a replacing manifest while their lineage ids
    * stay marked committed (permanent, re-delivery-proof data loss under
    * streaming ingestion) — so it fails loudly instead. */
  private def commit(newEntries: Seq[FileEntry],
                     replaceParent: Boolean = false,
                     expectedParent: Long = -1L): Long = {
    val parent = if (expectedParent >= 0) expectedParent else currentSnapshotId
    afterParentCapture()
    def assertUnmoved(): Unit =
      if (currentSnapshotId != parent)
        throw new java.util.ConcurrentModificationException(
          s"snapshot advanced past $parent during commit — retry from the new manifest")
    assertUnmoved()
    val next = parent + 1
    // sequence number = the committing snapshot id (Iceberg semantics);
    // parent entries keep the seq of the commit that introduced them
    val stamped = newEntries.map(_.copy(seq = next))
    sweepOrphans()
    writeTableMeta()
    // snap-N+1 (CREATE_NEW) and current.tmp.N+1 (CREATE_NEW) are the
    // optimistic-concurrency tripwires: a concurrent committer that won
    // the race leaves one of them in place and this commit FAILS instead
    // of silently replacing a snapshot it never read (real Iceberg moves
    // this CAS into the catalog; the seam is identical)
    val layout =
      try writeManifestFile(next, parent, stamped, replaceParent)
      catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          throw new java.util.ConcurrentModificationException(
            s"snap-$next already exists — another writer won the race ($e)")
      }
    if (currentSnapshotId != parent) {
      // undo our own (still unreferenced) manifest before failing so the
      // next committer's ErrorIfExists write is not blocked forever
      if (currentSnapshotId < next)
        deleteSnapshotArtifacts(next)
      throw new java.util.ConcurrentModificationException(
        s"snapshot advanced past $parent during commit — retry from the new manifest")
    }
    // read-back verification: the manifest the pointer is about to
    // reference must contain exactly the entries THIS commit wrote. A
    // stalled writer whose stale snap dir was swept and recreated by a
    // racer would otherwise swing the pointer onto the racer's manifest
    // and silently lose its own entries while reporting success. The
    // shard-reuse path verifies WITHOUT a full manifest parse (commits
    // must stay O(commit), not O(table)): the root's shard list and
    // inline entries must be exactly what this commit wrote, and only
    // the shards this commit CREATED are re-parsed — carried shards are
    // immutable files a racer cannot have produced under our uid names.
    def tup(e: FileEntry) = (e.lineageId, e.path, e.rows, e.seq)
    def mismatch(): Nothing =
      throw new java.util.ConcurrentModificationException(
        s"snap-$next does not contain this commit's entries — replaced by another writer")
    layout.fullExpect match {
      case Some(all) =>
        if (manifest(next).map(tup).sorted != all.map(tup).sorted) mismatch()
      case None =>
        val (shards2, inline2) =
          MetaJson.parseManifestRoot(Files.readString(metaDir.resolve(s"snap-$next")))
        if (shards2.map(_.path) != layout.rootShardPaths) mismatch()
        if (inline2.map(tup).sorted != layout.inline.map(tup).sorted) mismatch()
        layout.newShards.foreach { case (name, ents) =>
          val got = MetaJson.parseManifest(Files.readString(metaDir.resolve(name)))
          if (got.map(tup).sorted != ents.map(tup).sorted) mismatch()
        }
    }
    val tmp = metaDir.resolve(s"current.tmp.$next")
    Files.writeString(tmp, next.toString, StandardOpenOption.CREATE_NEW)
    Files.move(tmp, currentPtr, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Write the snap-`next` manifest. Small manifests stay FLAT (one JSON
    * file); past `manifestShardRows` data entries the manifest becomes a
    * two-level LIST — data entries chunked into shard files whose union
    * bounds ride in the root, so a box read downloads only overlapping
    * shards ([[manifestPartial]]). A commit onto an already-sharded
    * parent REUSES the parent's shard files by reference (the Iceberg
    * manifest-list contract: manifests are immutable and carried forward,
    * not rewritten) and chunks only ITS OWN new data entries into new
    * shard file(s) — commits are O(commit size) driver JSON, not O(table
    * file count). Per-append shards overlap in Z (each append spans its
    * own key range), so their union bounds are looser than a global
    * re-sort; [[compact]]'s replacing commit re-chunks globally by minZ,
    * exactly like Iceberg's rewrite-manifests maintenance. Shards are
    * written FIRST under commit-unique names; the root file write is the
    * CREATE_NEW tripwire either way, so concurrency semantics are
    * unchanged. Non-data entries (delete manifests, lineage markers)
    * stay inline in the root — every plan needs them. */
  private def writeManifestFile(next: Long, parent: Long,
                                stamped: Seq[FileEntry],
                                replaceParent: Boolean): CommitLayout = {
    def isData(e: FileEntry) = e.kind == "data" && e.path.nonEmpty
    val rootPath = metaDir.resolve(s"snap-$next")
    val (pShards, pInline) =
      if (replaceParent || parent == 0) (Seq.empty[ShardMeta], Seq.empty[FileEntry])
      else {
        val p = metaDir.resolve(s"snap-$parent")
        if (Files.isRegularFile(p)) MetaJson.parseManifestRoot(Files.readString(p))
        else (Seq.empty[ShardMeta], legacyManifest(p.toString))
      }
    val newData = stamped.filter(isData)
    val uid = java.util.UUID.randomUUID().toString.take(8)
    val written = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
    def writeShards(data: Seq[FileEntry]): Seq[(ShardMeta, Seq[FileEntry])] =
      data.sortBy(_.minZ).grouped(manifestShardRows)
        .zipWithIndex.map { case (g, k) =>
          val name = s"snap-$next-shard-$k-$uid.json"
          val p = metaDir.resolve(name)
          Files.writeString(p, MetaJson.manifestJson(g),
            StandardOpenOption.CREATE_NEW)
          written += p
          (ShardMeta(name, g.size,
            g.map(_.minZ).min, g.map(_.maxZ).max,
            g.map(_.minLat).min, g.map(_.maxLat).max,
            g.map(_.minLon).min, g.map(_.maxLon).max,
            lineages = Some(g.map(_.lineageId).distinct)), g)
        }.toSeq
    try {
      if (pShards.isEmpty) {
        // flat parent (or empty/replacing commit): all parent entries are
        // inline in its root, already in hand — no shard files to carry
        val flatData = pInline.filter(isData) ++ newData
        if (flatData.size <= manifestShardRows) {
          val all = pInline ++ stamped
          Files.writeString(rootPath, MetaJson.manifestJson(all),
            StandardOpenOption.CREATE_NEW)
          CommitLayout(Some(all), Seq.empty, Seq.empty, Seq.empty)
        } else {
          // one-time conversion to the two-level shape: global minZ chunk
          val inline = pInline.filterNot(isData) ++ stamped.filterNot(isData)
          val shards = writeShards(flatData).map(_._1)
          Files.writeString(rootPath, MetaJson.manifestListJson(shards, inline),
            StandardOpenOption.CREATE_NEW)
          CommitLayout(Some(inline ++ flatData), Seq.empty, Seq.empty, Seq.empty)
        }
      } else {
        // sharded parent: carry its shards BY REFERENCE, chunk only the
        // new data entries (usually one small shard per append). A
        // sharded root normally holds no inline data entries, but the
        // format admits them (one parser reads both layouts) — fold any
        // into the new shard rather than silently dropping them
        val inline = pInline.filterNot(isData) ++ stamped.filterNot(isData)
        val fresh = writeShards(pInline.filter(isData) ++ newData)
        val shards = pShards ++ fresh.map(_._1)
        Files.writeString(rootPath, MetaJson.manifestListJson(shards, inline),
          StandardOpenOption.CREATE_NEW)
        CommitLayout(None, shards.map(_.path),
          fresh.map { case (sm, g) => sm.path -> g }, inline)
      }
    } catch {
      case e: Throwable =>
        // a failed root write (lost race / crash mid-commit) must not
        // leave this commit's shards as permanent debris
        written.foreach(p => try Files.deleteIfExists(p)
          catch { case _: Throwable => () })
        throw e
    }
  }

  /** snap-<digits> root-name classifier shared by EVERY reclamation path
    * (the commit-time sweeper, the reference-set scanner, vacuum): the
    * rules for "what is a root" and "what is a shard" must have exactly
    * one spelling, or a future widening applied to one copy would make the
    * sweeper and the reference scanner disagree — the live-shard-deletion
    * hazard these functions guard against. Guarded parse: debris like
    * "snap-" or an overlong id yields None, never an exception. */
  private def snapRootId(name: String): Option[Long] = {
    val digits = name.drop(5)
    if (name.startsWith("snap-") && digits.nonEmpty && digits.length <= 18 &&
        digits.forall(_.isDigit)) Some(digits.toLong) else None
  }

  /** Shard-file name twin of [[snapRootId]] — one compiled copy. */
  private val shardNameRe = "^snap-([0-9]{1,18})-shard-.*\\.json$".r

  /** Shard paths referenced by every existing snapshot root except
    * `excludeIds`. Under shard reuse a shard written at snap-k is
    * referenced by k and every descendant until a replacing commit —
    * deletion must check the whole root set, not just the snapshot being
    * dropped. Roots of sharded tables are KBs (shard list + inline
    * non-data rows), so this scan is cheap even at the 10⁶-file design
    * point. Returns None if ANY root is unreadable: an unknown reference
    * set must FAIL CLOSED — callers delete nothing rather than treat
    * "couldn't read the root" as "references nothing" and destroy live
    * shards on a transient IO error. */
  private def referencedShardPaths(excludeIds: Set[Long]): Option[Set[String]] = {
    val acc = Set.newBuilder[String]
    val allReadable = listDir(metaDir).forall { p =>
      snapRootId(p.getFileName.toString) match {
        case Some(id) if !excludeIds.contains(id) && Files.isRegularFile(p) =>
          try {
            acc ++= MetaJson.parseManifestRoot(Files.readString(p))._1.map(_.path)
            true
          } catch { case _: Throwable => false }
        case _ => true
      }
    }
    if (allReadable) Some(acc.result()) else None
  }

  /** Delete a snapshot's manifest root AND the shard files only IT
    * references (if the snapshot is a two-level list) — shards carried
    * forward into retained snapshots must survive, and the shard names
    * are only recorded in roots, so the root must be read before it is
    * removed. */
  private def deleteSnapshotArtifacts(k: Long): Unit =
    deleteSnapshotArtifacts(k, referencedShardPaths(Set(k)))

  /** Batch form: `keep` is the (possibly precomputed) reference set of
    * the roots that SURVIVE — None means it could not be established, in
    * which case no shard file is deleted (fail closed; [[vacuum]] will
    * reclaim the debris once the roots read cleanly again). */
  private def deleteSnapshotArtifacts(k: Long,
                                      keep: Option[Set[String]]): Unit = {
    val p = metaDir.resolve(s"snap-$k")
    if (Files.isRegularFile(p)) {
      try {
        val (shards, _) = MetaJson.parseManifestRoot(Files.readString(p))
        keep match {
          case Some(ks) if shards.nonEmpty =>
            shards.filterNot(sm => ks.contains(sm.path))
              .foreach(sm => try Files.deleteIfExists(metaDir.resolve(sm.path))
                catch { case _: Throwable => () })
          case _ => () // unknown reference set: leave every shard in place
        }
      } catch { case _: Throwable => () }
    }
    deleteRecursive(p)
  }

  /** Remove unreferenced commit leftovers: snap-k directories past the
    * current pointer and stale current.tmp.* files. Nothing past the
    * pointer is readable, BUT a fresh snap-(cur+1) may belong to a
    * concurrent committer that has not swung the pointer yet — deleting it
    * would reintroduce the silent lost-update the ErrorIfExists tripwire
    * exists to catch. Only leftovers older than `orphanAgeMs` are swept:
    * a live commit writes its manifest and swings the pointer within
    * milliseconds, while crash debris is minutes old by the next commit. */
  private val orphanAgeMs = 60000L

  /** One data-file path of the snapshot, parsing at most one shard
    * (every shard holds only data entries, so the first suffices). */
  private def anyDataPath(snapshotId: Long): Option[String] = {
    def firstData(es: Seq[FileEntry]): Option[String] =
      es.find(e => e.kind == "data" && e.path.nonEmpty).map(_.path)
    val p = metaDir.resolve(s"snap-$snapshotId")
    if (!Files.exists(p)) None
    else if (Files.isRegularFile(p)) {
      val (shards, inline) = MetaJson.parseManifestRoot(Files.readString(p))
      firstData(inline).orElse(shards.headOption.flatMap(sm =>
        firstData(MetaJson.parseManifest(
          Files.readString(metaDir.resolve(sm.path))))))
    } else firstData(legacyManifest(p.toString))
  }

  private def sweepOrphans(): Unit = {
    val cur = currentSnapshotId
    val cutoff = System.currentTimeMillis() - orphanAgeMs
    def stale(p: java.nio.file.Path): Boolean =
      try Files.getLastModifiedTime(p).toMillis < cutoff
      catch { case _: Throwable => false }
    listDir(metaDir).foreach { p =>
      val name = p.getFileName.toString
      val orphan =
        name.startsWith("current.tmp.") ||
          snapRootId(name).exists(_ > cur) ||
          (name match { // shard files of an uncommitted (crashed) snapshot.
            // Same-id debris — a crashed writer whose snapshot id a
            // retrying racer later committed — needs the full
            // reference-check sweep, which is [[vacuum]]'s job: live
            // carried shards are old files too, so the id rule alone
            // can't tell them apart, and parsing every root here would
            // put an O(roots) JSON cost on EVERY commit.
            case shardNameRe(d) => d.toLong > cur
            case _              => false
          })
      if (orphan && stale(p)) deleteRecursive(p)
    }
  }

  /** Directory listing with the stream CLOSED (Files.list leaks a
    * directory fd until GC otherwise — and commits run per micro-batch
    * under streaming ingestion). */
  private def listDir(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = Files.list(p)
    try { import scala.jdk.CollectionConverters._; s.iterator().asScala.toSeq }
    finally s.close()
  }

  private def deleteRecursive(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      val all =
        try { import scala.jdk.CollectionConverters._; s.iterator().asScala.toSeq }
        finally s.close()
      all.reverse.foreach(f => try Files.delete(f) catch { case _: Throwable => () })
    }

  /** Plan a read from the current snapshot; `box` prunes manifest entries
    * whose lat/lon range cannot intersect it AND pushes a Z-range
    * disjunction over the materialized `__z` sort key, so parquet min/max
    * row-group stats skip within the surviving files too (the file- and
    * page-level halves of the reference's subtree prune). The returned
    * frame is a SUPERSET of the box's rows — callers refine exactly.
    * Returns (files read, total files) alongside the DataFrame so
    * callers/tests can observe pruning. */
  def read(box: Option[MBR] = None): (DataFrame, Int, Int) =
    readAt(currentSnapshotId, box)

  /** Multi-geometry planned read — the JOIN-side analog of [[read]]
    * (round-4 verdict ask #3: the metric-bearing join operators need the
    * same file skip the single-box path has). A file disjoint from EVERY
    * box never opens, and the surviving rows are refined by ONE merged
    * curve-range disjunction over the union of the boxes' coverings
    * ([[CellId.mergeRanges]] caps it at a few hundred BETWEENs regardless
    * of geometry count). Superset contract as [[read]] — the join
    * operator's exact predicate refines. */
  def readBoxes(boxes: Seq[MBR]): (DataFrame, Int, Int) = {
    require(boxes.nonEmpty, "readBoxes needs at least one box")
    // covering computed ONCE per read, OUTSIDE the refine closure: planAt
    // invokes `refine` once per tombstone sequence group, and the quadtree
    // descents + 4096-range merge are driver work proportional to geometry
    // count — they must not multiply by delete-chain length.
    //
    // fine covering cap 4096: the row-level membership test is an
    // O(log n) binary search ([[GeoCols.zCoveringPredicate]]), so a
    // finer covering only SHRINKS the superset — the old 256 cap
    // existed because the covering rode in an O(n)-per-row BETWEEN
    // disjunction (measured 4.1 s at 256 ranges over 600k rows; the
    // disjunction that parquet row-group skipping sees is now capped
    // separately at 16 pushable terms inside zCoveringPredicate)
    val ranges = CellId.mergeRanges(boxes.flatMap(curveRangesForMbr),
      maxRanges = 4096)
    // selectivity cutoff: when the merged covering spans most of the
    // key domain (e.g. globe-scattered join boxes), the predicate
    // excludes almost nothing — skip it entirely rather than pay even
    // the cheap probe. The read stays a superset either way; the
    // operator's exact predicate refines.
    val covered = ranges.map(r => (r._2 - r._1 + 1).toDouble).sum
    val skipRefine = covered / curveKeySpan > 0.5
    planAt(currentSnapshotId,
      keep = e => boxes.exists(b =>
        MBR(e.minLat, e.minLon, e.maxLat, e.maxLon).overlaps(b)),
      refine = df =>
        if (skipRefine) df
        else df.filter(GeoCols.zCoveringPredicate(col("__z"), ranges)),
      boxesHint = Some(boxes),
      rangesHint = Some(ranges))
  }

  /** Size of this store's curve-key domain (for covering-selectivity
    * estimates): quadtree curves index 4^zRes cells; the STR key places
    * strips at bit 32 ([[GeoCols.strCol]]), so its numeric domain is
    * 2^(strips+32) — STR coverings (≤ one range per strip) always look
    * highly selective under this ratio and keep their refine, which is
    * the right call: they cost at most `strips` comparisons. */
  private def curveKeySpan: Double = curve match {
    case "str" => math.pow(2.0, strStripRes + 32)
    case _     => math.pow(4.0, zRes)
  }

  /** Time travel: the same planned read against ANY committed snapshot —
    * vacuum() keeps every snapshot's files, so pre-compaction history
    * stays queryable until snapshots are expired out-of-band. */
  def readAt(snapshotId: Long, box: Option[MBR] = None): (DataFrame, Int, Int) = {
    // hoisted for the same reason as [[readBoxes]]: one covering per read,
    // not one per tombstone sequence group
    val ranges = box.map(curveRangesForMbr)
    planAt(snapshotId,
      keep = e => box.forall(b =>
        MBR(e.minLat, e.minLon, e.maxLat, e.maxLon).overlaps(b)),
      refine = df => ranges match {
        case Some(rs) => df.filter(GeoCols.zCoveringPredicate(col("__z"), rs))
        case None     => df
      },
      boxesHint = box.map(Seq(_)),
      rangesHint = ranges)
  }

  /** Shared snapshot planner: `keep` prunes manifest data entries (file
    * skipping — MBR overlap for box reads, Bloom probes for key lookups),
    * `refine` narrows the surviving files' rows (Z-range disjunction /
    * pushed key predicate). Both read paths share the sequence-scoped
    * tombstone chain below. */
  private def planAt(snapshotId: Long, keep: FileEntry => Boolean,
                     refine: DataFrame => DataFrame,
                     boxesHint: Option[Seq[MBR]] = None,
                     lineageHint: Option[String => Boolean] = None,
                     rangesHint: Option[Seq[(Long, Long)]] = None)
      : (DataFrame, Int, Int) = {
    // drop compaction lineage markers (zero-file entries kept only so
    // resumableRun still recognizes pre-compaction units as committed).
    // boxesHint / lineageHint prune manifest SHARDS before any entry is
    // even parsed (two-level list, [[manifestPartial]]) — entries in a
    // skipped shard are provably disjoint from every box / bloom-clear
    // for every probed key, so `keep` would reject them anyway;
    // totalData stays the snapshot's true file count.
    val (loaded, totalData) =
      manifestPartial(snapshotId, boxesHint, lineageHint, rangesHint)
    val all = loaded.filter(_.path.nonEmpty)
    val entries = all.filter(_.kind == "data")
    require(totalData > 0, "empty table: nothing committed yet")
    // SEQUENCE-SCOPED merge-on-read deletes (the Iceberg sequence-number
    // contract, via the PERSISTED per-entry seq): a tombstone applies only
    // to data entries with a smaller sequence number, so a row
    // legitimately re-inserted after its delete stays live. Data entries
    // are grouped by how many deletes precede them (group g's applicable
    // deletes are the sequence-suffix dels[g..D)), and the plan is built
    // by SUFFIX FOLDING — A_k = antiJoin(A_(k-1), del_(k-1)) ∪ group_k —
    // one authored anti-join per delete FILE. (Catalyst's
    // PushdownLeftSemiOrAntiJoin may re-expand an anti-join through the
    // union, duplicating a TOMBSTONE broadcast per group it applies to —
    // bounded and tiny: tombstones are key slivers and compact() resets
    // the group count; the data side is never duplicated. Pinned in
    // PlanSpec.) Each anti-join is per delete file on that file's OWN
    // columns — key sets may differ between tombstones (an old-format
    // (id, lat, lon) file next to a schema-derived full-key one); a
    // combined read would resolve to one footer's schema and either
    // resurrect rows (missing key cols read NULL, never match) or
    // over-delete (narrowed key). compact() folds deletes in and purges
    // the tombstones, bounding the chain length.
    val dels = all.filter(_.kind == "delete").sortBy(e => (e.seq, e.path))
    var keptCount = 0
    def groupDf(g: Int): Option[DataFrame] = {
      val ents = entries.filter(e => dels.count(_.seq <= e.seq) == g)
      val kept = ents.filter(keep)
      keptCount += kept.size
      if (kept.isEmpty) None
      else Some(refine(spark.read.parquet(kept.map(_.path): _*)))
    }
    var acc: Option[DataFrame] = groupDf(0)
    for (k <- 1 to dels.size) {
      val cut = acc.map { a =>
        val delDf = spark.read.parquet(dels(k - 1).path)
        a.join(broadcast(delDf), delDf.columns.toSeq, "left_anti")
      }
      acc = (cut, groupDf(k)) match {
        case (Some(a), Some(b)) => Some(a unionByName b)
        case (a, b) => a.orElse(b)
      }
    }
    val live = acc.getOrElse {
      // empty plan (every file pruned — possibly every SHARD, leaving no
      // loaded entry to take a schema from): read one file's footer for
      // the schema, rows limited to zero. anyDataPath parses at most ONE
      // shard — the cheapest possible query must not pay a full manifest
      // parse just to recover the schema.
      val anyPath = entries.headOption.map(_.path).getOrElse(
        anyDataPath(snapshotId).getOrElse(throw new IllegalStateException(
          s"snapshot $snapshotId has no data files")))
      spark.read.parquet(anyPath).limit(0)
    }
    (live.drop("__z"), keptCount, totalData)
  }

  /** Row-level delete (Iceberg-v2 equality-delete shape): materialize the
    * CURRENT snapshot's rows matching `cond` as equality tombstones and
    * commit them as a `kind="delete"` manifest entry. Readers apply
    * tombstones merge-on-read ([[read]]); [[compact]] rewrites the data
    * with deletes applied and purges the tombstones (copy-on-write repair).
    *
    * The equality key is SCHEMA-DERIVED, not hardcoded: all non-binary
    * columns of the table unless the caller passes `keyCols` (binary
    * payloads are excluded — comparing megabyte blobs in the anti-join
    * would ship them through the broadcast; the scalar columns already
    * identify rows in every table shape this store hosts). Distinct rows
    * sharing an id therefore delete independently. */
  def deleteWhere(cond: org.apache.spark.sql.Column, lineageId: String,
                  keyCols: Seq[String] = Seq.empty): Long = {
    val t0 = System.nanoTime()
    val (df, _, _) = read()
    val keys =
      if (keyCols.nonEmpty) keyCols
      else df.schema.fields
        .filterNot(_.dataType == org.apache.spark.sql.types.BinaryType)
        .map(_.name).toSeq
    require(keys.nonEmpty, "equality delete needs at least one non-binary key column")
    val unitDir = s"$root/data/$lineageId-${java.util.UUID.randomUUID().toString.take(8)}"
    val written = org.apache.spark.sql.GraftParquetDirect.write(
      df.filter(cond).select(keys.map(col): _*).coalesce(1),
      unitDir)
    val wallMs = (System.nanoTime() - t0) / 1000000
    commit(footerStats(unitDir, lineageId, wallMs, withZ = false, kind = "delete",
      only = Some(written.map(_._1).toSet)))
  }

  /** Compaction — the distributed analog of the reference's forced-
    * reinsert "layout repair" (RStarTree.java:126-172, SURVEY §4.1): read
    * the full current snapshot, re-cluster by Z order into `numPartitions`
    * files, commit a snapshot whose manifest REPLACES the old entries
    * (not appends). Query results are unaffected (proven in spec); file
    * counts drop and Z-ranges tighten, which is what makes manifest and
    * row-group pruning effective after many small appends. */
  def compact(numPartitions: Int = 0): Long =
    compactHooked(numPartitions, () => ())

  /** Test seam: `beforeCommit` runs between the rewrite and the commit —
    * the window a concurrent append can land in. Production uses the
    * no-op; the race spec injects an append here to prove the replacing
    * commit fails loudly instead of silently dropping the racer's unit. */
  private[graft] def compactHooked(numPartitions: Int,
                                   beforeCommit: () => Unit): Long = {
    val t0 = System.nanoTime()
    val parts = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    // pin the snapshot this compaction PLANS against: the replacing commit
    // below passes it as expectedParent, so a unit committed while the
    // rewrite runs (streaming ingestion!) fails the compaction loudly
    // instead of being silently dropped from the replacing manifest while
    // its lineage id stays marked committed
    val base = currentSnapshotId
    val (df, _, _) = read()
    // UUID-suffixed like append's units: a compaction that crashes before
    // its commit must not wedge every retry on ErrorIfExists
    val unitDir = s"$root/data/compact-${base + 1}-" +
      java.util.UUID.randomUUID().toString.take(8)
    val keyed = withCurveKey(df)
    val lineage = s"compact-${base + 1}"
    val uw = writeUnitFiles(
      keyed
        .repartitionByRange(parts, col("__z"))
        .sortWithinPartitions(col("__z")),
      unitDir, lineage, t0, parts)
    val stats = uw.entries
    // replacing commit: new manifest = compacted entries + the BASE
    // manifest's lineage ids as zero-file markers so resumableRun still
    // skips them (read from `base`, not the live pointer — a racer's
    // lineage must fail the commit, not get absorbed as an empty marker)
    val lineageMarkers = manifest(base).map(_.lineageId).toSet.toSeq.sorted.map(l =>
      FileEntry(path = "", rows = 0L, minZ = 0L, maxZ = 0L,
        minLat = 0.0, maxLat = 0.0, minLon = 0.0, maxLon = 0.0,
        lineageId = l, wallMs = 0L))
    beforeCommit()
    val next = commit(stats ++ lineageMarkers, replaceParent = true,
      expectedParent = base)
    // refresh the write-time histograms only AFTER the commit is durable,
    // write-then-delete, so EVERY crash window leaves hotCells an upper
    // bound of the live snapshot: before the swap, the old unit hists
    // overcount the compacted table (deletes not yet folded); mid-swap,
    // old + new coexist (≈2× superset); after, exact. A pre-commit swap
    // would leave the still-live pre-compact snapshot UNDERCOUNTED if the
    // commit never lands — the one unsafe direction. Only histograms of
    // lineage FOLDED INTO this compaction are removed: a concurrent
    // append's freshly written histogram (its unit is not in `base`) must
    // survive or its hot cells vanish from the hint.
    val folded = lineageMarkers.map(_.lineageId).toSet + lineage
    val fresh = writeUnitSidecars(uw, unitDir, lineage).toSet
    Seq(histDir, bloomDir, indexDir).foreach { dir =>
      if (Files.exists(dir))
        listDir(dir).filterNot(fresh.contains).foreach { d =>
          if (folded.contains(sidecarLineage(d))) deleteRecursive(d)
        }
    }
    next
  }

  /** Lineage id encoded in a sidecar file/dir name
    * (`<lineage>-<uuid8>[.json]`). */
  private def sidecarLineage(p: java.nio.file.Path): String = {
    val name = p.getFileName.toString
    val base = if (name.endsWith(".json")) name.dropRight(5) else name
    base.dropRight(9) // strip "-<uuid8>"
  }

  /** Incremental consumption (the CDC primitive a downstream pipeline
    * uses to process ONLY data that arrived since its last checkpointed
    * snapshot): rows of data units with sequence number in
    * (`sinceSnapshot`, `toSnapshot`]. Tombstones are never applied —
    * sequence scoping means a delete cannot affect rows appended after
    * it, and deletes inside the window only affect PRIOR data (consumers
    * reconciling deletions read the `kind="delete"` manifest entries).
    * Refuses windows that cross a compaction: rewritten files carry the
    * compaction's sequence number, so the increment would replay the
    * whole table as if new — the caller must re-baseline instead
    * (Iceberg's incremental scan rejects replace snapshots identically). */
  def appendedSince(sinceSnapshot: Long, toSnapshot: Long = -1L): DataFrame = {
    val to = if (toSnapshot >= 0) toSnapshot else currentSnapshotId
    val m = manifest(to)
    require(!m.exists(e => e.path.nonEmpty && e.seq > sinceSnapshot &&
        e.lineageId.startsWith("compact-")),
      s"window ($sinceSnapshot, $to] crosses a compaction — increments are " +
        "append-only; re-baseline from the compacted snapshot")
    val ents = m.filter(e =>
      e.path.nonEmpty && e.kind == "data" && e.seq > sinceSnapshot && e.seq <= to)
    if (ents.isEmpty) readAt(to)._1.limit(0)
    else spark.read.parquet(ents.map(_.path): _*).drop("__z")
  }

  /** Remove data directories no snapshot references — debris from appends
    * that crashed after writing their unit but before committing it (the
    * UUID-suffixed dir is unreachable: reads only ever plan from manifest
    * paths). Iceberg's remove-orphan-files analog. The reference set spans
    * ALL snapshots, not just the current one, so time-travel reads of
    * pre-compaction manifests stay valid; age-gating keeps an in-flight
    * append's freshly written unit safe. Also reclaims manifest-shard
    * JSONs no root references (crashed-commit debris the per-commit
    * sweep's id rule cannot distinguish from live carried shards).
    * Returns the dirs and shard files removed. */
  def vacuum(olderThanMs: Long = 3600000L): Seq[String] = {
    // manifest paths are Hadoop URIs (file:/tmp/...); the filesystem walk
    // yields plain (possibly relative/symlinked) paths — canonicalize BOTH
    // sides before comparing or everything looks unreferenced and vacuum
    // destroys live data
    def canon(p: java.nio.file.Path): String =
      try p.toRealPath().toString
      catch { case _: Throwable => p.toAbsolutePath.normalize.toString }
    def dirOf(e: FileEntry): String =
      canon(Paths.get(e.path.stripPrefix("file:")).getParent)
    // shards are immutable and shared across roots (shard reuse): parse
    // each unique shard file ONCE for the whole loop — going through
    // manifest(k) would re-download and re-parse the same carried shards
    // per snapshot, O(snapshots × table) driver JSON on a long streaming
    // history
    val shardDirs = scala.collection.mutable.HashMap.empty[String, Seq[String]]
    val referenced = (1L to currentSnapshotId)
      // expired snapshots no longer pin their files — that is the point
      // of expireSnapshots; their dirs become reclaimable here
      .filter(k => Files.exists(metaDir.resolve(s"snap-$k")))
      .flatMap { k =>
        val p = metaDir.resolve(s"snap-$k")
        if (Files.isRegularFile(p)) {
          val (shards, inline) = MetaJson.parseManifestRoot(Files.readString(p))
          inline.filter(_.path.nonEmpty).map(dirOf) ++
            shards.flatMap(sm => shardDirs.getOrElseUpdate(sm.path,
              MetaJson.parseManifest(Files.readString(metaDir.resolve(sm.path)))
                .filter(_.path.nonEmpty).map(dirOf)))
        } else manifest(k).filter(_.path.nonEmpty).map(dirOf) // legacy dir
      }
      .toSet
    val dirs = listDir(Paths.get(root, "data"))
    // backstop: a committed table's live dirs MUST appear in the listing;
    // zero overlap means the path spelling diverged some other way — refuse
    // to delete anything rather than guess
    if (referenced.nonEmpty && !dirs.exists(d => referenced.contains(canon(d))))
      return Seq.empty
    val cutoff = System.currentTimeMillis() - olderThanMs
    val removedDirs = dirs
      .filter { d =>
        !referenced.contains(canon(d)) &&
          (try Files.getLastModifiedTime(d).toMillis < cutoff
           catch { case _: Throwable => false })
      }
      .map { d => deleteRecursive(d); d.toString }
    // manifest-shard debris: shard JSONs no existing root references — a
    // writer that crashed mid-commit whose snapshot id a retrying racer
    // later committed (the commit-time sweep's id>cur rule can never
    // reclaim those; the per-commit path deliberately skips this O(roots)
    // reference check). Deleting requires a KNOWN reference set: an
    // unreadable root returns None and nothing is touched (fail closed).
    val removedShards = referencedShardPaths(Set.empty) match {
      case Some(refs) =>
        listDir(metaDir).filter { p =>
          (p.getFileName.toString match {
            case shardNameRe(_) => !refs.contains(p.getFileName.toString)
            case _              => false
          }) &&
            (try Files.getLastModifiedTime(p).toMillis < cutoff
             catch { case _: Throwable => false })
        }.map { p => deleteRecursive(p); p.toString }
      case None => Seq.empty
    }
    removedDirs ++ removedShards
  }

  /** Retire history: delete manifests of snapshots older than the newest
    * `keepLast` (Iceberg's expire-snapshots analog, completing the storage
    * lifecycle with [[vacuum]]: expiry makes pre-compaction data dirs
    * unreferenced, vacuum then reclaims them — without expiry every
    * snapshot pins its files forever). The CURRENT snapshot is always
    * kept; [[readAt]]/[[appendedSince]] against an expired snapshot fail
    * loudly (missing manifest), never silently re-resolve. Returns the
    * expired snapshot ids. */
  def expireSnapshots(keepLast: Int = 1): Seq[Long] = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val cur = currentSnapshotId
    val expired = (1L to cur - keepLast).filter(k =>
      Files.exists(metaDir.resolve(s"snap-$k")))
    // ONE reference-set computation for the whole batch, excluding every
    // to-be-expired id (they are all being dropped, so their references
    // must not pin shards) — per-snapshot recomputation made expiry
    // O(expired × remaining roots) on a long streaming history
    val keep = referencedShardPaths(expired.toSet)
    expired.foreach(k => deleteSnapshotArtifacts(k, keep))
    expired
  }

  /** Resumable multi-unit job: process only units not yet committed.
    * Returns the unit ids actually processed this run. A crash between
    * units loses nothing — completed units are durable in the snapshot
    * chain, and the rerun converges to the identical final table
    * (unit outputs are deterministic). */
  def resumableRun(units: Seq[String])(produce: String => DataFrame): Seq[String] = {
    val done = committedLineage
    val todo = units.filterNot(done.contains)
    todo.foreach(u => append(produce(u), u))
    todo
  }
}

object SnapshotStore {

  /** The clustering curves this store can write and read — the ONE list
    * both the constructor's layout require and [[pinLegacyLayout]]'s
    * pre-write validation check against (a drift between the two
    * re-opens the bricked-legacy-table hazard). */
  val ValidCurves: Set[String] = Set("z", "hilbert", "str")

  /** Data entries per manifest shard / the flat-manifest ceiling: at the
    * ~10⁶-file design point this yields ~100 shard files of ~2 MB JSON
    * each behind a ~20 KB root list — a box read parses the root plus the
    * few overlapping shards instead of the full manifest (measured in
    * ManifestScaleBench / SnapshotStoreSpec). */
  val DefaultManifestShardRows: Int = 10000

  /** Default sidecar stats grid (4^6 = 4096 cells). Was 8 (65,536 cells)
    * through round 5; the r6 optimization round measured the per-append
    * sidecar cost at histRes=8 on a globe-spanning unit — ~65k leaf slabs
    * of ~9 rows each, 0.42 s of stats aggregation + 0.32 s of sidecar
    * JSON per append, and a matching parse tax on every fromStore — and
    * dropped the default one quadtree level per 16× unit-cell blowup.
    * Correctness is res-invariant (every consumer treats the slabs as
    * fail-open bounds: hotCells rolls up/expands, kNN seed radii only
    * widen); tables that cluster tightly (files spanning few cells) can
    * pin a finer grid per store — the ctor parameter is the knob and the
    * value is validated against meta/table.json like every layout field. */
  val DefaultHistRes: Int = 6

  /** Unit-size ceiling (total rows) for the single-pass relational Bloom
    * build in [[SnapshotStore.writeSidecars]]: under it, collecting the
    * raw key hashes to the driver (≤ 16 MB at the cutoff) beats a typed
    * bitset aggregation per measured append; over it, the distributed
    * [[UnitStatsAgg]] bitwise-OR keeps driver traffic at 512 KB/file. */
  val BloomCollectRowsCutoff: Long = 1L << 21

  /** Opt-in phase tracing for the write path (guide §1 instrumentation):
    * SPARK_GRAFT_TRACE=1 prints per-phase wall times to stderr. Zero cost
    * when off. */
  private val Tracing: Boolean = sys.env.get("SPARK_GRAFT_TRACE").contains("1")

  private[table] def trace(name: String, t0: Long): Unit =
    if (Tracing)
      System.err.println(f"[trace] $name%-18s ${(System.nanoTime() - t0) / 1e9}%.3f s")

  /** `file:`-URI and plain-path spellings of the same file must compare
    * equal: manifest paths are Hadoop URIs (`file:/x`), `input_file_name`
    * yields `file:///x`. Sidecars persist the normalized form. */
  def normalizePath(p: String): String =
    if (p.startsWith("file:")) "/" + p.stripPrefix("file:").dropWhile(_ == '/')
    else p

  /** Explicit migration for a pre-pin legacy table (committed snapshots,
    * no meta/table.json): the OWNER asserts the layout the data was
    * written with, and only then does the table open again. This is the
    * only path that pins a layout onto existing data — the constructor
    * refuses to, because auto-pinning the opener's possibly-wrong curve
    * would make the correct spelling fail validation forever while reads
    * silently drop rows. Refuses to overwrite an existing pin. */
  def pinLegacyLayout(root: String, curve: String, zRes: Int = 12,
                      histRes: Int = SnapshotStore.DefaultHistRes): Unit = {
    // validate BEFORE writing: pinning a typo'd curve would brick the
    // table (every open fails layout validation, and this method refuses
    // to overwrite) with no API-level recovery path
    require(ValidCurves(curve),
      s"unknown curve '$curve' (expected ${ValidCurves.mkString(" | ")}); " +
        "refusing to pin a layout no reader can open")
    val metaPath = Paths.get(root, "meta", "table.json")
    require(!Files.exists(metaPath),
      s"table at $root already has a pinned layout; refusing to overwrite")
    require(Files.exists(Paths.get(root, "meta", "current")),
      s"table at $root has no committed snapshots; just open it normally " +
        "and the first commit will pin the layout")
    Files.createDirectories(metaPath.getParent)
    Files.writeString(metaPath, MetaJson.tableMetaJson(curve, zRes, histRes),
      StandardOpenOption.CREATE_NEW)
  }
}
