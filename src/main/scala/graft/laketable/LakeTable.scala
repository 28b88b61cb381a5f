package graft.laketable

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType}

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.UUID
import scala.jdk.CollectionConverters._

/** One immutable data file of a snapshot. `bucket` is the hash-bucket of the
  * merge key (`repo`) the file belongs to — the unit of copy-on-write MERGE.
  * `schemaVersion` records which column mapping the file was written under
  * (Iceberg-style field-id rename support).
  */
final case class DataFileEntry(path: String, bucket: Int, rows: Long, schemaVersion: Int)

/** A named, typed column with a stable field id. Renames keep the id. */
final case class FieldDef(id: Int, name: String, dataType: String)

/** One immutable manifest file covering the bucket range [loBucket, hiBucket):
  * the snapshot references manifests, manifests list data files (Iceberg's
  * manifest-list / manifest split). A commit rewrites ONLY the manifests of
  * bucket groups it touches; untouched groups reuse the previous snapshot's
  * manifest file byte-for-byte — commit metadata cost is O(affected buckets),
  * never O(total files).
  */
final case class ManifestEntry(path: String, loBucket: Int, hiBucket: Int, fileCount: Int)

final case class Snapshot(
    version: Long,
    schemaVersion: Int,
    schemas: Map[Int, Seq[FieldDef]],
    numBuckets: Int,
    bucketsPerManifest: Int,
    manifests: Seq[ManifestEntry],
    summary: Map[String, String]) {

  def currentSchema: Seq[FieldDef] = schemas(schemaVersion)

  def sparkSchema: StructType =
    StructType(currentSchema.map(f => StructField(f.name, DataType.fromDDL(f.dataType))))

  /** Total data-file count — from manifest-list counts, no manifest reads. */
  def fileCount: Int = manifests.map(_.fileCount).sum

  /** Bucket-group id of a bucket (one manifest per group). */
  def groupOf(bucket: Int): Int = bucket / bucketsPerManifest
}

/** Iceberg-style snapshot table, built from scratch (no Iceberg/Delta runtime
  * exists in this environment): immutable Parquet data files + JSON snapshot
  * metadata + an atomic version-pointer swap. Per-shard VGTID cursors, lineage
  * and metrics live in the snapshot `summary`, so data and cursor commit in
  * the SAME atomic operation — the exactly-once mechanism the reference only
  * approximates by emitting STATE after RECORD batches
  * (`cmd/airbyte-source/read.go:131-137`).
  *
  * Layout (works on any Hadoop FileSystem — local, HDFS, S3A):
  *   <root>/data/<uuid>.parquet          immutable data files
  *   <root>/meta/m-<uuid>.json           immutable manifest (files of one bucket group)
  *   <root>/meta/v<N>.json               snapshot N (schemas + manifest list + summary)
  *   <root>/meta/version-hint.txt        current version (atomic rename swap)
  *
  * Scale design: data files are bucketed by `pmod(xxhash64(repo), numBuckets)`
  * so a MERGE touches only the buckets present in the incoming batch; at
  * 100 TB with numBuckets sized so a bucket ≈ a few GB, a micro-batch rewrite
  * is O(affected buckets), never a full-table rewrite. Snapshot metadata is a
  * two-level manifest tree (Iceberg's manifest-list/manifest design): v<N>.json
  * holds only the manifest LIST (one tiny entry per bucket group); the file
  * entries live in immutable per-group manifests that unaffected commits reuse
  * by reference — so each micro-batch commit serializes O(affected buckets)
  * metadata, not O(total files), even at 10⁴–10⁵ data files.
  */
final class LakeTable(val root: String, spark: SparkSession) {
  import LakeTable._

  private val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
  private def fs: FileSystem = new Path(root).getFileSystem(conf)

  private val metaDir = new Path(root, "meta")
  private val dataDir = new Path(root, "data")
  private val hintFile = new Path(metaDir, "version-hint.txt")

  // ---- snapshot IO -------------------------------------------------------

  def currentVersion: Option[Long] = observedVersion(ignore = None)

  /** Current version as [[currentVersion]], except the crash-recovery
    * listing fallback can IGNORE one version — the snapshot json a write in
    * progress has already renamed into place must not satisfy (or trip) the
    * single-writer guard's reads during that same write.
    */
  private def observedVersion(ignore: Option[Long]): Option[Long] = {
    val f = fs
    if (f.exists(hintFile)) {
      val in = new BufferedReader(new InputStreamReader(f.open(hintFile), StandardCharsets.UTF_8))
      try Some(in.readLine().trim.toLong) finally in.close()
    } else if (!f.exists(metaDir)) None
    else {
      // crash recovery: a failure between hint delete and rename leaves no
      // version-hint — the table is NOT gone; recover from the snapshot
      // listing (max committed v<N>.json)
      val versions = f.listStatus(metaDir).toSeq
        .map(_.getPath.getName)
        .collect { case VersionJsonRe(v) => v.toLong }
        .filterNot(v => ignore.contains(v))
      if (versions.isEmpty) None else Some(versions.max)
    }
  }

  def snapshot(version: Long): Snapshot = {
    val f = fs
    val p = new Path(metaDir, s"v$version.json")
    val in = f.open(p)
    val bytes = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in) finally in.close()
    snapshotFromJson(new String(bytes, StandardCharsets.UTF_8))
  }

  def currentSnapshot: Option[Snapshot] = currentVersion.map(snapshot)

  // ---- manifest IO -------------------------------------------------------

  /** Write one immutable manifest for bucket group [lo, hi). Temp-write +
    * rename so a referenced manifest is never partially written; the UUID
    * name makes replayed commits write fresh files (stale orphans are GC'd
    * by [[expireSnapshots]]).
    */
  private def writeManifest(lo: Int, hi: Int, files: Seq[DataFileEntry]): ManifestEntry = {
    val f = fs
    f.mkdirs(metaDir)
    val name = s"m-${UUID.randomUUID()}.json"
    val tmp = new Path(metaDir, s".$name.tmp")
    val out = f.create(tmp, true)
    try out.write(manifestToJson(files).getBytes(StandardCharsets.UTF_8)) finally out.close()
    val dest = new Path(metaDir, name)
    if (!f.rename(tmp, dest))
      throw new IllegalStateException(s"failed to write manifest $name")
    ManifestEntry(s"meta/$name", lo, hi, files.size)
  }

  private def readManifest(m: ManifestEntry): Seq[DataFileEntry] = {
    val in = fs.open(new Path(root, m.path))
    val bytes = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in) finally in.close()
    manifestFromJson(new String(bytes, StandardCharsets.UTF_8))
  }

  /** All data files of a snapshot (reads every manifest — full-scan and
    * maintenance paths only; the commit path never calls this).
    */
  def allFiles(snap: Snapshot): Seq[DataFileEntry] = snap.manifests.flatMap(readManifest)

  private[laketable] def writeSnapshot(s: Snapshot): Unit = {
    val f = fs
    f.mkdirs(metaDir)
    // ---- single-writer guard -------------------------------------------
    // The table contract is single-writer (the streaming driver); a
    // MISCONFIGURED duplicate stream pointed at the same root would
    // otherwise silently interleave last-writer-wins commits and lose data.
    // Every commit expects the observed version to be exactly the one it
    // built on (s.version - 1); the check runs before writing, again right
    // before the pointer swap, and the hint is verified to be OURS after —
    // steady interleaving by a second writer trips one of the three within
    // a commit or two. (A plain-filesystem rename is not a conditional put,
    // so a sub-millisecond photo-finish can still race — this guard detects
    // the practical failure mode, it is not a distributed lock.)
    val expectedPrev: Option[Long] = if (s.version == 0L) None else Some(s.version - 1)
    def guard(stage: String): Unit = {
      val cur = observedVersion(ignore = Some(s.version))
      if (cur != expectedPrev)
        throw new graft.core.GraftValidationException(
          s"concurrent writer detected at $root ($stage): committing " +
            s"v${s.version} expects current version " +
            s"${expectedPrev.map(_.toString).getOrElse("<none>")} but found " +
            s"${cur.map(_.toString).getOrElse("<none>")} — is a second stream " +
            "pointed at this table root?")
    }
    guard("pre-write")
    // snapshot json lands via temp-write + rename: a crash after v<N>.json
    // but before the hint swap leaves a stale orphan that the REPLAYED batch
    // (same content, single writer) simply renames over — no
    // FileAlreadyExists crash-loop on restart
    val p = new Path(metaDir, s"v${s.version}.json")
    val tmpJson = new Path(metaDir, s".v${s.version}.${UUID.randomUUID()}.tmp")
    val out = f.create(tmpJson, true)
    try out.write(snapshotToJson(s).getBytes(StandardCharsets.UTF_8)) finally out.close()
    if (f.exists(p)) f.delete(p, false)
    if (!f.rename(tmpJson, p))
      throw new IllegalStateException(s"failed to write snapshot v${s.version}")
    guard("pre-swap")
    // atomic pointer swap: write tmp hint then rename over the old one
    val tmp = new Path(metaDir, s".version-hint.${UUID.randomUUID()}.tmp")
    val o2 = f.create(tmp, true)
    try o2.write(s.version.toString.getBytes(StandardCharsets.UTF_8)) finally o2.close()
    if (f.exists(hintFile)) f.delete(hintFile, false)
    if (!f.rename(tmp, hintFile))
      throw new IllegalStateException(s"atomic commit failed for v${s.version}")
    // post-swap verification: the hint must still be OURS — if it is not, a
    // concurrent writer swapped in between and one of the two commits has
    // been silently superseded; fail loud so the operator untangles it NOW
    val after = observedVersion(ignore = None)
    if (!after.contains(s.version))
      throw new graft.core.GraftValidationException(
        s"concurrent writer detected at $root (post-swap): committed " +
          s"v${s.version} but the version hint reads " +
          s"${after.map(_.toString).getOrElse("<none>")} — a second writer " +
          "overwrote the commit pointer")
  }

  // ---- create / read -----------------------------------------------------

  def create(schema: StructType, numBuckets: Int, props: Map[String, String] = Map.empty,
      bucketsPerManifest: Int = 0): Snapshot = {
    require(currentVersion.isEmpty, s"table already exists at $root")
    val bpm =
      if (bucketsPerManifest > 0) bucketsPerManifest
      else LakeTable.defaultBucketsPerManifest(numBuckets)
    val fields = schema.fields.zipWithIndex.map { case (f, i) => FieldDef(i + 1, f.name, f.dataType.sql) }
    val snap = Snapshot(0L, 0, Map(0 -> fields.toSeq), numBuckets, bpm, Nil, props)
    fs.mkdirs(dataDir)
    writeSnapshot(snap)
    snap
  }

  /** Read the table at a snapshot (default: current). Files written under an
    * older schema version are re-mapped to current column names by field id
    * (rename = metadata only, Iceberg-style) and missing columns filled null.
    */
  def read(version: Option[Long] = None): DataFrame = {
    val snap = version.map(snapshot).getOrElse(
      currentSnapshot.getOrElse(throw new IllegalStateException(s"no table at $root")))
    readFiles(snap, allFiles(snap))
  }

  private[graft] def readFiles(snap: Snapshot, files: Seq[DataFileEntry]): DataFrame = {
    val cur = snap.currentSchema
    if (files.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.sparkSchema)
    } else {
      files.groupBy(_.schemaVersion).map { case (sv, group) =>
        val written = snap.schemas(sv)
        val byId = written.map(f => f.id -> f).toMap
        var df = spark.read.parquet(group.map(f => new Path(root, f.path).toString): _*)
        // project written-name → current-name by field id; missing → null
        val cols = cur.map { c =>
          byId.get(c.id) match {
            case Some(w) => col(w.name).cast(DataType.fromDDL(c.dataType)).as(c.name)
            case None    => lit(null).cast(DataType.fromDDL(c.dataType)).as(c.name)
          }
        }
        df.select(cols: _*)
      }.reduce(_.unionByName(_))
    }
  }

  /** Files of the snapshot belonging to the given buckets — reads ONLY the
    * manifests whose bucket range intersects `buckets` (partition pruning at
    * the metadata level: a merge of k buckets opens ~k/bucketsPerManifest
    * manifests, never the whole tree).
    */
  def filesInBuckets(snap: Snapshot, buckets: Set[Int]): Seq[DataFileEntry] =
    snap.manifests
      .filter(m => buckets.exists(b => b >= m.loBucket && b < m.hiBucket))
      .flatMap(readManifest)
      .filter(f => buckets.contains(f.bucket))

  // ---- write / commit ----------------------------------------------------

  /** Write `df` (must match current schema + a `_bucket` int column) as new
    * data files, one parquet directory write partitioned by bucket, then
    * moved into data/ with stable names. Returns the manifest entries.
    */
  private[graft] def writeDataFiles(df: DataFrame, schemaVersion: Int): Seq[DataFileEntry] = {
    val stage = new Path(root, s"stage-${UUID.randomUUID()}")
    df.write.partitionBy("_bucket").parquet(stage.toString)
    val f = fs
    val entries = f.listStatus(stage).toSeq.filter(_.isDirectory).flatMap { dir =>
      val bucket = dir.getPath.getName.stripPrefix("_bucket=").toInt
      f.listStatus(dir.getPath).toSeq.filter(_.getPath.getName.endsWith(".parquet")).map { st =>
        val name = s"${UUID.randomUUID()}.parquet"
        val dest = new Path(dataDir, name)
        if (!f.rename(st.getPath, dest))
          throw new IllegalStateException(s"failed to move ${st.getPath}")
        DataFileEntry(s"data/$name", bucket, -1L, schemaVersion)
      }
    }
    f.delete(stage, true)
    entries
  }

  /** Stage a deduped batch: rows carry `_kind` ('u' upsert / 'd' delete-key)
    * and `_bucket`; written as one parquet job partitioned by both. Upsert
    * files are later *adopted* as final data files without a rewrite (the
    * heavy content bytes are written exactly once per batch); delete/upsert
    * keys drive the pruning rewrite of existing files.
    */
  private[graft] def stageWrite(df: DataFrame): Path = {
    val stage = new Path(root, s"stage-${UUID.randomUUID()}")
    df.write.partitionBy("_kind", "_bucket").parquet(stage.toString)
    stage
  }

  /** The staged files of one `_kind` partition, if any were written. */
  private[graft] def stagedKindDf(spark2: SparkSession, stage: Path,
      kind: String): Option[DataFrame] = {
    val p = new Path(stage, s"_kind=$kind")
    if (!fs.exists(p)) None else Some(spark2.read.parquet(p.toString))
  }

  /** BOTH staged kinds in one read, `_kind`/`_bucket` recovered as partition
    * columns from the directory layout — lets the apply derive upsert/delete
    * counts AND per-shard cursor stats in ONE Spark job instead of three
    * (two footer-count jobs + a stats aggregation). None when the batch
    * staged nothing. `stagedSchema` (the schema of the DataFrame that was
    * just written, WITH `_kind`/`_bucket`) skips the per-batch footer read +
    * schema inference — the writer knows exactly what it wrote.
    */
  private[graft] def stagedAllDf(spark2: SparkSession, stage: Path,
      stagedSchema: Option[StructType] = None): Option[DataFrame] = {
    val f = fs
    val hasAny = Seq("u", "d").exists(k => f.exists(new Path(stage, s"_kind=$k")))
    if (!hasAny) None
    else {
      val reader = stagedSchema match {
        case Some(s) =>
          // partition columns (_kind/_bucket) go last — the order Spark's
          // partition discovery appends them in
          val parts = Set("_kind", "_bucket")
          val reordered = StructType(
            s.fields.filterNot(f2 => parts.contains(f2.name)) ++
              s.fields.filter(f2 => parts.contains(f2.name)))
          spark2.read.schema(reordered)
        case None => spark2.read
      }
      Some(reader.parquet(stage.toString))
    }
  }

  /** Parquet-footer row count of one staged kind (no data scan). */
  private[graft] def stagedCount(spark2: SparkSession, stage: Path, kind: String): Long =
    stagedKindDf(spark2, stage, kind).map(_.count()).getOrElse(0L)

  /** Merge keys present in the staged batch (both `u` and `d` kinds; the
    * per-shard stats provenance rides as `_s_*` columns ON the winner rows,
    * pruned away here) — column-pruned read.
    */
  private[graft] def stagedKeys(spark2: SparkSession, stage: Path,
      keyCols: Seq[String]): DataFrame =
    Seq("u", "d").flatMap(stagedKindDf(spark2, stage, _))
      .map(_.select(keyCols.map(col): _*))
      .reduce(_.unionByName(_))

  /** Adopt staged upsert files as final data files (move, no rewrite). */
  private[graft] def adoptStagedUpserts(stage: Path, schemaVersion: Int): Seq[DataFileEntry] = {
    val f = fs
    val uDir = new Path(stage, "_kind=u")
    if (!f.exists(uDir)) Nil
    else f.listStatus(uDir).toSeq.filter(_.isDirectory).flatMap { dir =>
      val bucket = dir.getPath.getName.stripPrefix("_bucket=").toInt
      f.listStatus(dir.getPath).toSeq.filter(_.getPath.getName.endsWith(".parquet")).map { st =>
        val name = s"${UUID.randomUUID()}.parquet"
        if (!f.rename(st.getPath, new Path(dataDir, name)))
          throw new IllegalStateException(s"failed to adopt ${st.getPath}")
        DataFileEntry(s"data/$name", bucket, -1L, schemaVersion)
      }
    }
  }

  /** Buckets present in the staged batch (from the directory layout). */
  private[graft] def stagedBuckets(stage: Path): Set[Int] = {
    val f = fs
    Seq("u", "d").flatMap { kind =>
      val p = new Path(stage, s"_kind=$kind")
      if (!f.exists(p)) Nil
      else f.listStatus(p).toSeq.filter(_.isDirectory)
        .map(_.getPath.getName.stripPrefix("_bucket=").toInt)
    }.toSet
  }

  private[graft] def dropStage(stage: Path): Unit = fs.delete(stage, true)

  /** Commit a new snapshot replacing all files in `replacedBuckets` with
    * `newFiles`, merging `summaryUpdates` into the previous summary (keys in
    * `dropSummaryKeys` are removed — bounded-lineage pruning).
    * Single-writer (the streaming driver); the version-hint swap is atomic.
    *
    * Metadata cost: only manifests of bucket GROUPS touched by
    * `replacedBuckets`/`newFiles` are read + rewritten; every other group's
    * manifest is carried into the new snapshot by reference. At 10⁵ files a
    * small batch commits a few KB of manifests + the manifest list, not the
    * full file inventory.
    */
  def commit(
      replacedBuckets: Set[Int],
      newFiles: Seq[DataFileEntry],
      summaryUpdates: Map[String, String],
      dropSummaryKeys: Set[String] = Set.empty): Snapshot = {
    val prev = currentSnapshot.getOrElse(throw new IllegalStateException("create() first"))
    val touchedGroups =
      (replacedBuckets.iterator ++ newFiles.iterator.map(_.bucket)).map(prev.groupOf).toSet
    val newByGroup = newFiles.groupBy(f => prev.groupOf(f.bucket))
    val prevByGroup = prev.manifests.map(m => m.loBucket / prev.bucketsPerManifest -> m).toMap
    val untouched = prev.manifests.filterNot(m =>
      touchedGroups.contains(m.loBucket / prev.bucketsPerManifest))
    val rewritten = touchedGroups.toSeq.sorted.flatMap { g =>
      val kept = prevByGroup.get(g).map(readManifest).getOrElse(Nil)
        .filterNot(f => replacedBuckets.contains(f.bucket))
      val files = kept ++ newByGroup.getOrElse(g, Nil)
      if (files.isEmpty) None
      else Some(writeManifest(g * prev.bucketsPerManifest, (g + 1) * prev.bucketsPerManifest, files))
    }
    val snap = prev.copy(
      version = prev.version + 1,
      manifests = (untouched ++ rewritten).sortBy(_.loBucket),
      summary = (prev.summary ++ summaryUpdates) -- dropSummaryKeys)
    writeSnapshot(snap)
    snap
  }

  // ---- maintenance ---------------------------------------------------------

  /** Compact buckets whose file count exceeds `maxFilesPerBucket`: their rows
    * are rewritten into fresh files (one parquet job over only those buckets)
    * and the snapshot replaces them atomically. Steady-state micro-batching
    * otherwise accretes one file per bucket per commit.
    */
  def compact(maxFilesPerBucket: Int = 4): Snapshot = {
    val snap = currentSnapshot.getOrElse(throw new IllegalStateException("create() first"))
    // manifest-list file counts prune the scan: only manifests that could
    // hold a crowded bucket (count > max possible if evenly spread) are read
    val candidates = snap.manifests.filter(_.fileCount > maxFilesPerBucket)
    val crowded = candidates.flatMap(readManifest)
      .groupBy(_.bucket).filter(_._2.size > maxFilesPerBucket).keySet
    if (crowded.isEmpty) return snap
    val keyCol = snap.currentSchema.head.name // field id 1 = bucket key
    val df = readFiles(snap, filesInBuckets(snap, crowded))
      .withColumn("_bucket", pmod(xxhash64(col(keyCol)), lit(snap.numBuckets)).cast("int"))
    val newFiles = writeDataFiles(df.repartition(col("_bucket")), snap.schemaVersion)
    commit(crowded, newFiles, Map("compacted" -> s"v${snap.version}:${crowded.size} buckets"))
  }

  /** Drop snapshot metadata older than the last `keepLast` versions and
    * delete data files AND manifest files no kept snapshot references (time
    * travel window + GC of orphans from crashed commits).
    */
  def expireSnapshots(keepLast: Int = 3): Unit = {
    val cur = currentVersion.getOrElse(return)
    val f = fs
    val keepFrom = math.max(0L, cur - keepLast + 1)
    // ONE metaDir listing drives everything: which snapshot jsons actually
    // exist (earlier expiries with a smaller window may have deleted part of
    // the keep range — never assume the range is contiguous), which
    // manifests are on disk, and which temp leftovers to sweep. No
    // per-version fs.exists probes — a long-lived table at version 10⁶ must
    // not pay O(lifetime versions) RPCs per maintenance tick.
    val metaListing = f.listStatus(metaDir).toSeq.map(_.getPath)
    val versionsOnDisk = metaListing.map(_.getName)
      .collect { case VersionJsonRe(v) => v.toLong }
    // fail LOUD before deleting anything if the current snapshot json is
    // not in the listing (partial copy, external deletion, inconsistent
    // object-store listing): an empty kept set would otherwise compute an
    // empty referenced set and silently delete every data file
    require(versionsOnDisk.contains(cur),
      s"expireSnapshots: current snapshot v$cur.json missing from $metaDir — refusing to GC")
    val kept = versionsOnDisk.filter(_ >= keepFrom).sorted.map(snapshot)
    val keptManifests = kept.flatMap(_.manifests).distinctBy(_.path)
    val referenced = keptManifests.flatMap(readManifest).map(_.path).toSet
    // delete unreferenced data files
    f.listStatus(dataDir).foreach { st =>
      val rel = s"data/${st.getPath.getName}"
      if (!referenced.contains(rel)) f.delete(st.getPath, false)
    }
    // delete unreferenced manifests (expired snapshots' and crash orphans)
    // and temp-write leftovers a crash between create and rename strands
    // (.m-*.tmp / .v*.tmp / .version-hint.*.tmp — single-writer, so no
    // in-flight commit can own one while this maintenance pass runs)
    val keptManifestNames = keptManifests.map(m => new Path(root, m.path).getName).toSet
    metaListing.foreach { p =>
      val name = p.getName
      if (name.startsWith("m-") && !keptManifestNames.contains(name))
        f.delete(p, false)
      else if (name.startsWith(".") && name.endsWith(".tmp"))
        f.delete(p, false)
    }
    // delete expired snapshot json (only those actually on disk)
    versionsOnDisk.filter(_ < keepFrom).foreach { v =>
      f.delete(new Path(metaDir, s"v$v.json"), false)
    }
  }

  // ---- schema evolution ---------------------------------------------------

  /** Avro-diff-driven evolution: `renames` map old→new name (field id kept),
    * `adds` append new fields with fresh ids. Metadata-only commit — no data
    * files rewritten (old files re-mapped at read time by field id).
    */
  def evolveSchema(renames: Map[String, String], adds: Seq[(String, String)]): Snapshot = {
    val prev = currentSnapshot.getOrElse(throw new IllegalStateException("create() first"))
    val cur = prev.currentSchema
    renames.keys.foreach { o => require(cur.exists(_.name == o), s"rename source missing: $o") }
    adds.foreach { case (n, _) => require(!cur.exists(_.name == n), s"add duplicates column: $n") }
    val renamed = cur.map(f => renames.get(f.name).map(n => f.copy(name = n)).getOrElse(f))
    val maxId = prev.schemas.values.flatten.map(_.id).max
    val added = adds.zipWithIndex.map { case ((n, t), i) => FieldDef(maxId + 1 + i, n, t) }
    val sv = prev.schemaVersion + 1
    val snap = prev.copy(
      version = prev.version + 1,
      schemaVersion = sv,
      schemas = prev.schemas.updated(sv, renamed ++ added))
    writeSnapshot(snap)
    snap
  }

  // ---- convenience --------------------------------------------------------

  def summaryValue(key: String): Option[String] =
    currentSnapshot.flatMap(_.summary.get(key))

  def drop(): Unit = { val f = fs; if (f.exists(new Path(root))) f.delete(new Path(root), true) }
}

object LakeTable {
  private val mapper = new ObjectMapper()
  private val VersionJsonRe = """v(\d+)\.json""".r

  def bucketExpr(numBuckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(col("repo")), lit(numBuckets)).cast("int")

  /** Default bucket-group width of one manifest: small tables get multiple
    * groups (so the manifest machinery is exercised everywhere), huge tables
    * cap at 64 buckets per manifest — 65,536 buckets → 1,024 manifest-list
    * entries (~100 KB snapshot json), each manifest a few KB.
    */
  def defaultBucketsPerManifest(numBuckets: Int): Int =
    math.max(1, math.min(64, numBuckets / 8))

  def manifestToJson(files: Seq[DataFileEntry]): String = {
    val n = mapper.createObjectNode()
    val arr = n.putArray("files")
    files.foreach { f =>
      val fn = arr.addObject()
      fn.put("path", f.path); fn.put("bucket", f.bucket)
      fn.put("rows", f.rows); fn.put("schemaVersion", f.schemaVersion)
    }
    mapper.writeValueAsString(n)
  }

  def manifestFromJson(json: String): Seq[DataFileEntry] =
    mapper.readTree(json).get("files").asInstanceOf[ArrayNode].asScala.map { fn =>
      DataFileEntry(fn.get("path").asText(), fn.get("bucket").asInt(),
        fn.get("rows").asLong(), fn.get("schemaVersion").asInt())
    }.toSeq

  def snapshotToJson(s: Snapshot): String = {
    val n = mapper.createObjectNode()
    n.put("formatVersion", 2)
    n.put("version", s.version)
    n.put("schemaVersion", s.schemaVersion)
    n.put("numBuckets", s.numBuckets)
    n.put("bucketsPerManifest", s.bucketsPerManifest)
    val schemas = n.putObject("schemas")
    s.schemas.toSeq.sortBy(_._1).foreach { case (sv, fields) =>
      val arr = schemas.putArray(sv.toString)
      fields.foreach { f =>
        val fn = arr.addObject()
        fn.put("id", f.id); fn.put("name", f.name); fn.put("type", f.dataType)
      }
    }
    val manifests = n.putArray("manifests")
    s.manifests.foreach { m =>
      val mn = manifests.addObject()
      mn.put("path", m.path); mn.put("lo", m.loBucket)
      mn.put("hi", m.hiBucket); mn.put("fileCount", m.fileCount)
    }
    val sum = n.putObject("summary")
    s.summary.toSeq.sortBy(_._1).foreach { case (k, v) => sum.put(k, v) }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(n)
  }

  def snapshotFromJson(json: String): Snapshot = {
    val n = mapper.readTree(json)
    // fail LOUD on pre-manifest-tree metadata, never NPE: formatVersion 1
    // kept the full file inventory inline in v<N>.json
    if (n.get("manifests") == null)
      throw new IllegalStateException(
        "unsupported snapshot format: no 'manifests' list (formatVersion 1, " +
          "pre-manifest-tree inline file inventory). Rebuild the table, or " +
          "migrate by wrapping the legacy 'files' array in one manifest per " +
          "bucket group.")
    val schemas = n.get("schemas").properties().asScala.map { e =>
      val fields = e.getValue.asInstanceOf[ArrayNode].asScala.map { fn =>
        FieldDef(fn.get("id").asInt(), fn.get("name").asText(), fn.get("type").asText())
      }.toSeq
      e.getKey.toInt -> fields
    }.toMap
    val manifests = n.get("manifests").asInstanceOf[ArrayNode].asScala.map { mn =>
      ManifestEntry(mn.get("path").asText(), mn.get("lo").asInt(),
        mn.get("hi").asInt(), mn.get("fileCount").asInt())
    }.toSeq
    val summary = n.get("summary").properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    Snapshot(n.get("version").asLong(), n.get("schemaVersion").asInt(), schemas,
      n.get("numBuckets").asInt(), n.get("bucketsPerManifest").asInt(), manifests, summary)
  }
}
